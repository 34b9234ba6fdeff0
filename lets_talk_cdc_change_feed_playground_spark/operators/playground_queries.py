"""Judged playground query surface: event bus, apply policies, dedup, search.

Drop probability per entry: the bus/drops/dedup/atomicity queries run with
the default 5% deterministic drop rate; the apply-on-commit and consumer
timeline run drop-free — a dropped event blocks its transaction forever under
the commit-floor barrier (exactly the reference's lesson), which would reduce
those outputs to "nothing ever applies".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lets_talk_cdc_change_feed_playground_spark.operators import playground as pg
from lets_talk_cdc_change_feed_playground_spark.operators.cdc_queries import WAL_SQL
from lets_talk_cdc_change_feed_playground_spark.operators.ops_feed import (
    OPS_SQL,
    hash31_sql,
)

# ---------------------------------------------------------------------------
# DuckDB fragments
# ---------------------------------------------------------------------------


def _bus_sql(drop_pct: int) -> str:
    h_pk = hash31_sql("pk")
    h_drift = hash31_sql("tx_id || ':' || tx_idx")
    h_drop = hash31_sql("CAST(lsn AS VARCHAR)")
    return f"""
b0 AS (
  SELECT src.*, row_number() OVER (ORDER BY t, seq) AS lsn,
         seq // {pg.TXN_SIZE} AS txn_id
  FROM src
),
b1 AS (
  SELECT b0.*,
         'tx' || txn_id AS tx_id,
         seq - min(seq) OVER wt AS tx_idx,
         count(*) OVER wt AS tx_total,
         max(t) OVER wt AS enq_t
  FROM b0 WINDOW wt AS (PARTITION BY txn_id)
),
b2 AS (
  SELECT b1.*,
         enq_t + {pg.COMMIT_DELAY_MS} AS commit_ts,
         ({h_pk}) % {pg.PARTITIONS} AS "partition",
         enq_t + (({h_drift}) % 2) * 50 AS available_at
  FROM b1
),
bus AS (
  SELECT lsn, txn_id, tx_id, tx_idx, tx_total, op, pk, "partition",
         row_number() OVER (PARTITION BY "partition" ORDER BY enq_t, lsn) - 1 AS "offset",
         commit_ts, available_at,
         ({h_drop}) % 100 < {drop_pct} AS dropped,
         ((available_at + {pg.TICK_MS} - 1) // {pg.TICK_MS}) * {pg.TICK_MS} AS delivery_ts,
         event_type, value, props
  FROM b2
)
"""


LEDGER_SQL = """
txns AS (
  SELECT txn_id, max(commit_ts) AS commit_ts, count(*) AS n_events,
         CAST(sum(CASE WHEN dropped THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
         min(lsn) AS lsn_min,
         CASE WHEN sum(CASE WHEN dropped THEN 1 ELSE 0 END) = 0
              THEN max(delivery_ts) END AS complete_tick
  FROM bus GROUP BY txn_id
),
l1 AS (
  SELECT t.*,
         t.complete_tick IS NOT NULL
           AND (f.floor_ts IS NULL OR t.commit_ts <= f.floor_ts) AS applied
  FROM txns t,
       (SELECT min(commit_ts) AS floor_ts FROM txns WHERE complete_tick IS NULL) f
),
ledger AS (
  SELECT txn_id, commit_ts, n_events, n_dropped, complete_tick, applied,
         CASE WHEN applied THEN
           max(CASE WHEN applied THEN complete_tick END)
             OVER (ORDER BY commit_ts, lsn_min ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         END AS apply_tick
  FROM l1
)
"""


def _with(*fragments: str) -> str:
    return "WITH " + ",".join([OPS_SQL, *fragments])


# ---------------------------------------------------------------------------
# Query entries
# ---------------------------------------------------------------------------


def cdc_bus_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1/B3/B4/B5/B6 — the full broker state: partition assignment, offsets,
    drift-delayed availability, deterministic drops, delivery ticks."""
    return pg.bus_feed(spark, sf_dir)


def cdc_bus_drops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5 — per-partition enqueue/drop/delivery accounting."""
    bus = pg.bus_feed(spark, sf_dir)
    return (
        bus.groupBy("partition")
        .agg(
            F.count(F.lit(1)).alias("enqueued"),
            F.sum(F.col("dropped").cast("int")).alias("dropped"),
            F.sum((~F.col("dropped")).cast("int")).alias("delivered"),
        )
        .orderBy("partition")
    )


def _ledger(spark: SparkSession, sf_dir: str, drop_p: float) -> DataFrame:
    """Txn ledger over the bus variant, materialized once per session (the
    apply schedule, atomicity check, and consumer timeline all fold it)."""
    from lets_talk_cdc_change_feed_playground_spark.operators.shared import shared_df

    return shared_df(
        spark,
        ("txn_ledger", sf_dir, drop_p),
        lambda: pg.txn_ledger(pg.bus_feed(spark, sf_dir, drop_p=drop_p)),
    )


def cdc_apply_on_commit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 — commit-floor transactional apply schedule (drop-free run)."""
    return _ledger(spark, sf_dir, 0.0).orderBy("txn_id")


def cdc_atomicity_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 vs A4 — which transactions tear under apply-as-polled and which
    never apply under apply-on-commit (5% drops)."""
    bus = pg.bus_feed(spark, sf_dir)
    return pg.atomicity_check(bus, _ledger(spark, sf_dir, pg.DROP_P)).orderBy("txn_id")


def cdc_consumer_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M7 — delivered/applied/backlog/lag per tick (drop-free run).

    Session-shared: the SLO budget audit folds this exact frame (one row
    per delivery tick — bounded), so the tick expansion runs once."""
    from lets_talk_cdc_change_feed_playground_spark.operators.shared import shared_df

    return shared_df(
        spark,
        ("consumer_timeline", sf_dir),
        lambda: pg.consumer_timeline(
            pg.bus_feed(spark, sf_dir, drop_p=0.0), _ledger(spark, sf_dir, 0.0)
        ),
    )


def cdc_offset_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 — exactly-once consumption under deterministic redelivery."""
    return pg.offset_dedup(pg.bus_feed(spark, sf_dir))


def cdc_rate_limited_consume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 — per-event consume tick under the token-bucket rate limit."""
    return pg.rate_limited_frame(spark, sf_dir).orderBy(
        "partition", "consume_tick", "lsn"
    )


def cdc_event_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F2 — op-kind filter + token search over the log lane's event log
    (``assets/app.js:2725-2948``): creates/updates whose haystack matches
    every search token."""
    from lets_talk_cdc_change_feed_playground_spark.operators.capture import log_capture

    ev = log_capture(spark, sf_dir)
    hay = F.lower(
        F.concat_ws(
            " ",
            F.col("pk"),
            F.coalesce(F.col("after_event_type"), F.lit("")),
            F.col("tx_id"),
        )
    )
    return ev.filter(F.col("op").isin("c", "u") & hay.like("%purchase%")).select(
        "lsn", "op", "pk", "after_event_type", "after_value", "ts_ms"
    )


def cdc_txn_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 batch — assemble transactions from delivered bus events
    (``web/App.tsx:2115-2156`` buffers by txnId until index/total complete).

    Per transaction: expected vs received counts under the 5% deterministic
    drop rate, completeness, first/last delivery tick, and assembly wait
    (last delivery tick minus commit). Incomplete (torn) transactions are
    exactly the ones the apply-on-commit barrier must hold back — this query
    is the batch spec the streaming ``streaming/txn.py`` state op replays."""
    bus = pg.bus_feed(spark, sf_dir)
    delivered = bus.filter(~F.col("dropped"))
    return (
        delivered.groupBy("tx_id")
        .agg(
            F.max("tx_total").alias("expected"),
            F.count(F.lit(1)).alias("received"),
            F.min("delivery_ts").alias("first_tick"),
            F.max("delivery_ts").alias("last_tick"),
            F.max("commit_ts").alias("commit_ts"),
        )
        .select(
            "tx_id",
            "expected",
            "received",
            (F.col("received") == F.col("expected")).alias("complete"),
            "first_tick",
            "last_tick",
            F.when(
                F.col("received") == F.col("expected"),
                F.col("last_tick") - F.col("commit_ts"),
            ).alias("assembly_wait_ms"),
        )
        .orderBy("tx_id")
    )


def cdc_late_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 observability — per-partition late-data accounting under a
    continuous watermark: the watermark after each arrival is the running
    max ``commit_ts`` in (delivery_ts, lsn) arrival order (the tightest —
    per-event — watermark; a micro-batch watermark is never stricter), and
    an event is late when its commit time is already behind it.

    ``n_late_strict`` counts lateness under zero allowed delay;
    ``n_late_tick`` under one delivery tick of slack — the two numbers
    bracket how much drift tolerance the A3 floor needs.

    Scale: the running max is the two-phase bucketed prefix pattern (the
    only unpartitioned window runs over one row per hour bucket)."""
    from lets_talk_cdc_change_feed_playground_spark.functions.sequence import (
        with_prefix_aggs,
    )

    bus = pg.bus_feed(spark, sf_dir, drop_p=0.0)
    ev = with_prefix_aggs(
        bus,
        F.expr("delivery_ts div 3600000"),
        ["delivery_ts", "lsn"],
        maxes={"wm": "commit_ts"},
    )
    return (
        ev.groupBy("partition")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum((F.col("commit_ts") < F.col("wm")).cast("int")).alias(
                "n_late_strict"
            ),
            F.sum(
                (F.col("commit_ts") < F.col("wm") - pg.TICK_MS).cast("int")
            ).alias("n_late_tick"),
            F.max(F.col("wm") - F.col("commit_ts")).alias("max_lateness_ms"),
        )
        .orderBy("partition")
    )


QUERIES = {
    "cdc_txn_assembly": cdc_txn_assembly,
    "cdc_late_events": cdc_late_events,
    "cdc_bus_partitions": cdc_bus_partitions,
    "cdc_bus_drops": cdc_bus_drops,
    "cdc_apply_on_commit": cdc_apply_on_commit,
    "cdc_atomicity_check": cdc_atomicity_check,
    "cdc_consumer_timeline": cdc_consumer_timeline,
    "cdc_offset_dedup": cdc_offset_dedup,
    "cdc_rate_limited_consume": cdc_rate_limited_consume,
    "cdc_event_search": cdc_event_search,
}

_PCT = int(pg.DROP_P * 100)

_LATE_SQL = f"""
SELECT "partition",
       count(*) AS n_events,
       CAST(sum(CASE WHEN commit_ts < wm THEN 1 ELSE 0 END) AS BIGINT) AS n_late_strict,
       CAST(sum(CASE WHEN commit_ts < wm - {pg.TICK_MS} THEN 1 ELSE 0 END) AS BIGINT) AS n_late_tick,
       max(wm - commit_ts) AS max_lateness_ms
FROM (
  SELECT bus.*,
         max(commit_ts) OVER (ORDER BY delivery_ts, lsn
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS wm
  FROM bus
)
GROUP BY "partition"
ORDER BY "partition"
"""

ORACLE = {
    "cdc_late_events": _with(_bus_sql(0)) + _LATE_SQL,
    "cdc_txn_assembly": _with(_bus_sql(_PCT))
    + """
SELECT tx_id,
       max(tx_total) AS expected,
       count(*) AS received,
       count(*) = max(tx_total) AS complete,
       min(delivery_ts) AS first_tick,
       max(delivery_ts) AS last_tick,
       CASE WHEN count(*) = max(tx_total)
            THEN max(delivery_ts) - max(commit_ts) END AS assembly_wait_ms
FROM bus WHERE NOT dropped
GROUP BY tx_id ORDER BY tx_id
""",
    "cdc_bus_partitions": _with(_bus_sql(_PCT)) + "SELECT * FROM bus",
    "cdc_bus_drops": _with(_bus_sql(_PCT))
    + """
SELECT "partition",
       count(*) AS enqueued,
       CAST(sum(CASE WHEN dropped THEN 1 ELSE 0 END) AS BIGINT) AS dropped,
       CAST(sum(CASE WHEN dropped THEN 0 ELSE 1 END) AS BIGINT) AS delivered
FROM bus GROUP BY "partition" ORDER BY "partition"
""",
    "cdc_apply_on_commit": _with(_bus_sql(0), LEDGER_SQL)
    + "SELECT * FROM ledger ORDER BY txn_id",
    "cdc_atomicity_check": _with(_bus_sql(_PCT), LEDGER_SQL)
    + """
SELECT l.txn_id, l.commit_ts, l.n_events, l.n_dropped,
       CAST(p.as_polled_first_tick AS BIGINT) AS as_polled_first_tick,
       CAST(p.as_polled_last_tick AS BIGINT) AS as_polled_last_tick,
       (l.n_dropped > 0 OR p.as_polled_first_tick <> p.as_polled_last_tick) AS torn_as_polled,
       CAST(l.apply_tick AS BIGINT) AS on_commit_apply_tick,
       l.applied AS applied_on_commit
FROM ledger l
LEFT JOIN (
  SELECT txn_id, min(delivery_ts) AS as_polled_first_tick,
         max(delivery_ts) AS as_polled_last_tick
  FROM bus WHERE NOT dropped GROUP BY txn_id
) p ON l.txn_id = p.txn_id
ORDER BY l.txn_id
""",
    "cdc_consumer_timeline": _with(_bus_sql(0), LEDGER_SQL)
    + """
, d AS (
  SELECT delivery_ts AS tick_ms, count(*) AS n_delivered, max(commit_ts) AS max_commit
  FROM bus WHERE NOT dropped GROUP BY 1
),
a AS (
  SELECT apply_tick AS tick_ms, sum(n_events) - sum(n_dropped) AS n_applied,
         max(commit_ts) AS max_applied_commit
  FROM ledger WHERE applied GROUP BY 1
),
ticks AS (SELECT DISTINCT tick_ms FROM (SELECT tick_ms FROM d UNION ALL SELECT tick_ms FROM a))
SELECT t.tick_ms,
       CAST(COALESCE(sum(d.n_delivered) OVER w, 0) AS BIGINT) AS delivered,
       CAST(COALESCE(sum(a.n_applied) OVER w, 0) AS BIGINT) AS applied,
       CAST(COALESCE(sum(d.n_delivered) OVER w, 0) - COALESCE(sum(a.n_applied) OVER w, 0) AS BIGINT) AS backlog,
       max(d.max_commit) OVER w - COALESCE(max(a.max_applied_commit) OVER w, 0) AS lag_ms
FROM ticks t
LEFT JOIN d ON d.tick_ms = t.tick_ms
LEFT JOIN a ON a.tick_ms = t.tick_ms
WINDOW w AS (ORDER BY t.tick_ms ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY t.tick_ms
""",
    "cdc_offset_dedup": _with(_bus_sql(_PCT))
    + f"""
, delivered AS (SELECT * FROM bus WHERE NOT dropped),
received AS (
  SELECT * FROM delivered
  UNION ALL
  SELECT * FROM delivered WHERE ({hash31_sql("CAST(lsn AS VARCHAR)")}) % 10 = 0
)
SELECT "partition",
       count(*) AS received,
       count(DISTINCT "offset") AS distinct_offsets,
       count(*) - count(DISTINCT "offset") AS duplicates_dropped
FROM received GROUP BY "partition" ORDER BY "partition"
""",
    "cdc_rate_limited_consume": _with(_bus_sql(_PCT))
    + f"""
, delivered AS (SELECT * FROM bus WHERE NOT dropped),
d AS (
  SELECT *,
         row_number() OVER (PARTITION BY "partition" ORDER BY delivery_ts, lsn) - 1 AS i,
         (delivery_ts // {pg.TICK_MS}) * {8} - (row_number() OVER (PARTITION BY "partition" ORDER BY delivery_ts, lsn) - 1) AS key
  FROM delivered
),
r AS (
  SELECT *,
         max(key) OVER (PARTITION BY "partition" ORDER BY delivery_ts, lsn
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + i AS slot
  FROM d
)
SELECT lsn, txn_id, pk, "partition", delivery_ts,
       (slot // {8}) * {pg.TICK_MS} AS consume_tick,
       (slot // {8}) * {pg.TICK_MS} - delivery_ts AS queue_delay_ms
FROM r
ORDER BY "partition", consume_tick, lsn
""",
    "cdc_event_search": _with(WAL_SQL)
    + """
SELECT lsn, op, pk, after_event_type, after_value, ts_ms
FROM wal
WHERE op IN ('c', 'u')
  AND lower(concat_ws(' ', pk, COALESCE(after_event_type, ''), tx_id)) LIKE '%purchase%'
""",
}


# registered here (not in cdc_queries) to avoid a circular import at module
# init: the SLO oracle wraps this module's consumer-timeline SQL
from lets_talk_cdc_change_feed_playground_spark.operators.cdc_queries import _slo_sql  # noqa: E402

ORACLE["cdc_slo_budget"] = _slo_sql(ORACLE["cdc_consumer_timeline"])
