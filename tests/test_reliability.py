"""Invariants for the CDC reliability/operability queries.

These check internal consistency properties the oracle hash can't express
directly: compaction conserves records, every detected offset gap is exactly
a run of dropped events, DLQ routing matches the deterministic injection,
liveness gaps respect the tick intervals, and snapshot chunks tile the key
space without overlap.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lets_talk_cdc_change_feed_playground_spark.operators import playground as pg
from lets_talk_cdc_change_feed_playground_spark.operators.capture import log_capture
from lets_talk_cdc_change_feed_playground_spark.operators.ops_feed import ops_feed
from lets_talk_cdc_change_feed_playground_spark.operators.reliability_queries import (
    CHUNK_ROWS,
    RETENTION_MS,
    cdc_dlq_routing,
    cdc_heartbeat_liveness,
    cdc_offset_gaps,
    cdc_snapshot_chunking,
    cdc_wal_compaction,
)


def test_wal_compaction_conserves_keys(spark, sf_dir):
    wal = log_capture(spark, sf_dir)
    compacted = cdc_wal_compaction(spark, sf_dir)
    rows = compacted.collect()
    # at most one record per key, and n_superseded accounts for every other
    # WAL record of the surviving keys
    assert len({r.pk for r in rows}) == len(rows)
    head = wal.agg(F.max("ts_ms")).first()[0]
    latest = (
        wal.groupBy("pk")
        .agg(F.max(F.struct("ts_ms", "lsn", "op")).alias("s"), F.count("*").alias("n"))
        .collect()
    )
    expected_keys = {
        r.pk
        for r in latest
        if r.s.op != "d" or head - r.s.ts_ms <= RETENTION_MS
    }
    assert {r.pk for r in rows} == expected_keys
    per_key = {r.pk: r.n for r in latest}
    for r in rows:
        assert r.n_superseded == per_key[r.pk] - 1
        assert r.is_tombstone == (r.op == "d")


def test_offset_gaps_are_exactly_the_drops(spark, sf_dir):
    bus = pg.bus_feed(spark, sf_dir)
    gaps = cdc_offset_gaps(spark, sf_dir).collect()
    dropped = {
        (r["partition"], r["offset"])
        for r in bus.filter(F.col("dropped")).select("partition", "offset").collect()
    }
    covered = {
        (r["partition"], o)
        for r in gaps
        for o in range(r.gap_start, r.gap_end + 1)
    }
    # every offset inside a gap was dropped
    assert covered <= dropped
    # every dropped offset below its partition's last delivery is detected
    last_delivered = {
        r["partition"]: r["m"]
        for r in bus.filter(~F.col("dropped"))
        .groupBy("partition")
        .agg(F.max("offset").alias("m"))
        .collect()
    }
    detectable = {
        (p, o) for (p, o) in dropped if o < last_delivered.get(p, -1)
    }
    assert covered == detectable


def test_dlq_routing_matches_injection(spark, sf_dir):
    from lets_talk_cdc_change_feed_playground_spark.operators.ops_feed import hash31

    ops = ops_feed(spark, sf_dir)
    m = hash31(F.concat(F.col("pk"), F.lit(":"), F.col("seq").cast("string"))) % 40
    injected = ops.select("seq", m.alias("m")).filter(F.col("m") < 3).collect()
    dlq = {r.seq: r.reason for r in cdc_dlq_routing(spark, sf_dir).collect()}
    expected_reason = {0: "bad_timestamp", 1: "missing_event_type", 2: "negative_value"}
    assert dlq == {r.seq: expected_reason[r.m] for r in injected}


def test_heartbeat_liveness_shape(spark, sf_dir):
    rows = {r.method: r for r in cdc_heartbeat_liveness(spark, sf_dir).collect()}
    assert set(rows) == {"log", "polling", "trigger"}
    for r in rows.values():
        assert r.n_ticks >= 1
        assert r.n_events >= r.n_ticks
        assert r.end_silence_ms >= 0
        if r.max_gap_ms is not None:
            assert r.max_gap_ms > 0
    # the log lane emits at least as many distinct ticks as the rarer polling
    assert rows["log"].n_ticks >= rows["polling"].n_ticks


def test_retention_expiry_bounds(spark, sf_dir):
    from lets_talk_cdc_change_feed_playground_spark.operators.reliability_queries import (
        cdc_retention_expiry,
    )

    rows = cdc_retention_expiry(spark, sf_dir).collect()
    assert len(rows) == pg.PARTITIONS
    for r in rows:
        assert r.safe_offset == min(r.committed_dedup, r.committed_rate)
        assert r.committed_rate <= r.committed_dedup
        assert 0 <= r.n_reclaimable <= r.n_segments
        assert r.n_retained == r.n_segments - r.n_reclaimable
        assert r.blocked_by == (
            "rate" if r.committed_rate < r.committed_dedup else "none"
        )


def test_rebalance_strategies(spark, sf_dir):
    from lets_talk_cdc_change_feed_playground_spark.operators.reliability_queries import (
        REB_NEW_CONSUMERS,
        REB_OLD_CONSUMERS,
        REB_PARTITIONS,
        cdc_consumer_rebalance,
    )

    rows = cdc_consumer_rebalance(spark, sf_dir).collect()
    assert len(rows) == REB_PARTITIONS
    # every strategy's new assignment is balanced (floor/ceil of P/N)
    for col in ("rr_new", "range_new", "sticky_new"):
        sizes = {}
        for r in rows:
            sizes[r[col]] = sizes.get(r[col], 0) + 1
        assert set(sizes) == set(range(REB_NEW_CONSUMERS))
        assert max(sizes.values()) - min(sizes.values()) <= 1
    # sticky moves exactly the surplus (one per old consumer), never more
    # than round-robin does
    n_sticky = sum(r.moved_sticky for r in rows)
    n_rr = sum(r.moved_rr for r in rows)
    assert n_sticky == REB_OLD_CONSUMERS
    assert n_sticky <= n_rr


def test_snapshot_chunks_tile_key_space(spark, sf_dir):
    chunks = cdc_snapshot_chunking(spark, sf_dir).collect()
    n_keys = ops_feed(spark, sf_dir).select("pk").distinct().count()
    assert sum(r.n_rows for r in chunks) == n_keys
    # bounded, ordered, non-overlapping pk ranges
    prev_high = None
    for r in sorted(chunks, key=lambda r: r.chunk_id):
        assert r.n_rows <= CHUNK_ROWS
        assert r.low_pk <= r.high_pk
        if prev_high is not None:
            assert r.low_pk > prev_high
        prev_high = r.high_pk


def test_dblog_snapshot_converges(spark, sf_dir):
    from lets_talk_cdc_change_feed_playground_spark.operators.reliability_queries import (
        DBLOG_CHUNK_KEYS,
        cdc_dblog_snapshot,
    )

    rows = cdc_dblog_snapshot(spark, sf_dir).collect()
    n_keys = ops_feed(spark, sf_dir).select("pk").distinct().count()
    assert sum(r.n_keys for r in rows) == n_keys
    prev_high = None
    for r in sorted(rows, key=lambda r: r.chunk_id):
        # the DBLog proof obligation: every key's merged replay equals the
        # source's final state
        assert r.converged_keys == r.n_keys
        assert r.n_keys <= DBLOG_CHUNK_KEYS
        # a chunk never emits a snapshot row it observed a concurrent change
        # for, and never emits more rows than were alive at the high watermark
        assert r.emitted_rows <= r.snapshot_alive
        assert r.snapshot_alive - r.emitted_rows <= r.superseded_keys
        assert r.hw_ms - r.lw_ms == 1_800_000
        if prev_high is not None:
            assert r.low_pk > prev_high
        prev_high = r.high_pk


def test_mirror_maker_handoff(spark):
    from lets_talk_cdc_change_feed_playground_spark.operators.reliability_queries import (
        cdc_mirror_maker,
    )

    rows = cdc_mirror_maker(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        # B re-publishes densely: high watermark = replicated count - 1,
        # while A's log keeps offset gaps where the broker dropped
        assert r["b_high"] == r["replicated_n"] - 1
        assert r["a_high"] >= r["b_high"]
        assert r["committed_a"] >= r["committed_b"]
        assert r["resume_b"] == r["committed_b"] + 1
        assert r["handoff_ok"] is True  # failover loses/replays nothing
        assert r["remaining_a"] == r["remaining_b"]
