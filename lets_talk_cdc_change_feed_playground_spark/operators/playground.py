"""Atomicity-playground pipeline: source → broker → consumer as batch specs.

The reference's second core (``src/changefeed/model.ts``) is a pure reducer
simulating a partitioned event bus with commit drift, deterministic drops and
two apply policies.  Re-expressed here as deterministic column logic over the
derived ops feed:

- **txn grouping**: consecutive ops form transactions of ``txn_size``
  (the reference's order+items generator emits multi-event txns —
  ``model.ts:348-373``); every event in a txn shares ``commit_ts =
  action clock + 100`` (``createEvent``, ``model.ts:283``).
- **B3 partitioning**: ``partition = hash31(pk) % partitions``
  (``model.ts:106-109``) — the same 31-multiplier mod-9973 hash, evaluated
  as pure integer arithmetic on both engines.
- **B4 commit drift**: ``available_at = enqueue_clock + (hash31(txId:idx) %
  2) * 50`` (``model.ts:141-149``) — the head-insertion is modelled through
  the availability delay alone; delivery order below is availability order.
- **B5 deterministic drops**: drop iff ``hash31(str(lsn)) % 100 < p*100``
  (``model.ts:100-104``) — reproducible fault injection, no RNG.
- **B6 delivery**: events become visible at the first tick ≥
  ``available_at`` (``pollBroker``, ``model.ts:246-274``).  The per-tick
  ``maxApplyPerTick`` delivery caps are a pacing concern (Spark streaming's
  ``maxOffsetsPerTrigger``) and are not modelled in the batch spec.
- **A3 apply-on-commit** (``applyReadyTransactions``, ``model.ts:169-244``):
  a txn is *complete* when all its events are delivered (a dropped event
  blocks it forever); the commit floor is the min ``commit_ts`` over
  everything still in flight, so a complete txn applies iff no incomplete
  txn has a smaller commit_ts, and its apply tick is the running max of
  completion ticks in ``(commit_ts, lsn)`` apply order — the floor-barrier
  expressed as one window.
- **A4 apply-as-polled** (``model.ts:182-190``): every delivered event
  applies immediately — transactions whose events span ticks are visible
  *torn*.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from lets_talk_cdc_change_feed_playground_spark.functions.sequence import (
    with_global_seq,
    with_prefix_aggs,
)
from lets_talk_cdc_change_feed_playground_spark.operators.ops_feed import hash31, ops_feed

TXN_SIZE = 3
PARTITIONS = 3
DROP_P = 0.05
TICK_MS = 60_000
COMMIT_DELAY_MS = 100  # createEvent: commitTs = clock + 100 (model.ts:283)


def bus_feed(
    spark: SparkSession,
    sf_dir: str,
    txn_size: int = TXN_SIZE,
    partitions: int = PARTITIONS,
    drift: bool = True,
    drop_p: float = DROP_P,
    tick_ms: int = TICK_MS,
) -> DataFrame:
    """One row per change event on the bus, with partition/offset/availability/
    drop/delivery columns — the playground's broker state as data.

    Materialized once per session per parameterization (see :mod:`.shared`);
    five judged queries consume the same two bus variants."""
    from lets_talk_cdc_change_feed_playground_spark.operators.shared import shared_df

    return shared_df(
        spark,
        ("bus_feed", sf_dir, txn_size, partitions, drift, drop_p, tick_ms),
        lambda: _bus_feed(spark, sf_dir, txn_size, partitions, drift, drop_p, tick_ms),
    )


def _bus_feed(
    spark: SparkSession,
    sf_dir: str,
    txn_size: int,
    partitions: int,
    drift: bool,
    drop_p: float,
    tick_ms: int,
) -> DataFrame:
    ops = ops_feed(spark, sf_dir)
    ops = with_global_seq(ops, F.expr("t div 3600000"), ["t", "seq"], "lsn")
    wtxn = W.partitionBy("txn_id")

    df = (
        ops.withColumn("txn_id", F.expr(f"seq div {txn_size}"))
        .withColumn("tx_id", F.concat(F.lit("tx"), F.col("txn_id")))
        .withColumn("tx_idx", F.col("seq") - F.min("seq").over(wtxn))
        .withColumn("tx_total", F.count(F.lit(1)).over(wtxn))
        .withColumn("enq_t", F.max("t").over(wtxn))
        .withColumn("commit_ts", F.col("enq_t") + COMMIT_DELAY_MS)
        .withColumn("partition", hash31("pk") % partitions)
    )
    drift_ms = (
        (hash31(F.concat(F.col("tx_id"), F.lit(":"), F.col("tx_idx"))) % 2) * 50
        if drift
        else F.lit(0)
    )
    # B1 dense per-partition offsets: two-phase sequence (hour buckets of
    # enqueue time) — a per-partition row_number would single-task each bus
    # partition's full stream.
    df = df.withColumn("available_at", F.col("enq_t") + drift_ms)
    df = with_global_seq(
        df,
        F.expr("enq_t div 3600000"),
        ["enq_t", "lsn"],
        out_col="offset",
        start=0,
        partition_cols=("partition",),
    )
    df = (
        df
        .withColumn(
            "dropped",
            (hash31(F.col("lsn").cast("string")) % 100) < int(drop_p * 100),
        )
        .withColumn(
            "delivery_ts",
            F.expr(f"((available_at + {tick_ms} - 1) div {tick_ms}) * {tick_ms}"),
        )
    )
    return df.select(
        "lsn",
        "txn_id",
        "tx_id",
        "tx_idx",
        "tx_total",
        "op",
        "pk",
        "partition",
        "offset",
        "commit_ts",
        "available_at",
        "dropped",
        "delivery_ts",
        "event_type",
        "value",
        "props",
    )


def txn_ledger(bus: DataFrame) -> DataFrame:
    """Per-transaction completion/floor/apply schedule (A3 batch spec)."""
    txns = bus.groupBy("txn_id").agg(
        F.max("commit_ts").alias("commit_ts"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("dropped").cast("int")).alias("n_dropped"),
        F.min("lsn").alias("lsn_min"),
        F.when(
            F.sum(F.col("dropped").cast("int")) == 0, F.max("delivery_ts")
        ).alias("complete_tick"),
    )
    floor = txns.filter(F.col("complete_tick").isNull()).agg(
        F.min("commit_ts").alias("floor_ts")
    )
    j = txns.crossJoin(F.broadcast(floor))
    applied = F.col("complete_tick").isNotNull() & (
        F.col("floor_ts").isNull() | (F.col("commit_ts") <= F.col("floor_ts"))
    )
    j = j.withColumn("applied", applied)
    # apply_tick = running max of completion ticks in (commit_ts, lsn) order
    # over applied txns — two-phase bucketed running max (per-bucket window +
    # broadcast prefix over bucket maxima) instead of a single-task global
    # window over every applied transaction.
    ap = j.filter(F.col("applied")).withColumn(
        "__bucket", F.expr(f"commit_ts div {3_600_000}")
    )
    win = (
        W.partitionBy("__bucket")
        .orderBy("commit_ts", "lsn_min")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    local = ap.withColumn("__local_max", F.max("complete_tick").over(win))
    bmax = ap.groupBy("__bucket").agg(F.max("complete_tick").alias("__bmax"))
    prefix_w = W.orderBy("__bucket").rowsBetween(W.unboundedPreceding, -1)
    prefix = bmax.select(
        "__bucket", F.max("__bmax").over(prefix_w).alias("__prefix_max")
    )
    ap = (
        local.join(F.broadcast(prefix), "__bucket")
        .withColumn(
            "apply_tick",
            F.greatest(
                F.col("__local_max"),
                F.coalesce(F.col("__prefix_max"), F.col("__local_max")),
            ),
        )
        .select("txn_id", "apply_tick")
    )
    return j.join(ap, "txn_id", "left").select(
        "txn_id",
        "commit_ts",
        "n_events",
        "n_dropped",
        "complete_tick",
        "applied",
        F.when(F.col("applied"), F.col("apply_tick")).alias("apply_tick"),
    )


def atomicity_check(bus: DataFrame, ledger: DataFrame) -> DataFrame:
    """A3 vs A4 — per txn: when each policy makes the txn (partially) visible
    and whether apply-as-polled tears it."""
    polled = bus.filter(~F.col("dropped")).groupBy("txn_id").agg(
        F.min("delivery_ts").alias("as_polled_first_tick"),
        F.max("delivery_ts").alias("as_polled_last_tick"),
    )
    j = ledger.join(polled, "txn_id", "left")
    return j.select(
        "txn_id",
        "commit_ts",
        "n_events",
        "n_dropped",
        "as_polled_first_tick",
        "as_polled_last_tick",
        (
            (F.col("n_dropped") > 0)
            | (F.col("as_polled_first_tick") != F.col("as_polled_last_tick"))
        ).alias("torn_as_polled"),
        F.col("apply_tick").alias("on_commit_apply_tick"),
        F.col("applied").alias("applied_on_commit"),
    )


def consumer_timeline(bus: DataFrame, ledger: DataFrame) -> DataFrame:
    """M7 — delivered/applied/backlog/lag progression per delivery tick
    (``selectLanes``, ``model.ts:375-381``): lag = latest delivered commit_ts
    minus last applied commit_ts (0 before anything applies)."""
    d = (
        bus.filter(~F.col("dropped"))
        .groupBy(F.col("delivery_ts").alias("tick_ms"))
        .agg(F.count(F.lit(1)).alias("n_delivered"), F.max("commit_ts").alias("max_commit"))
    )
    a = (
        ledger.filter(F.col("applied"))
        .groupBy(F.col("apply_tick").alias("tick_ms"))
        .agg(
            (F.sum("n_events") - F.sum("n_dropped")).alias("n_applied"),
            F.max("commit_ts").alias("max_applied_commit"),
        )
    )
    j = d.join(a, "tick_ms", "full")
    # cumulative delivered/applied/commit maxima via the two-phase bucketed
    # running aggregate — the timeline is one row per tick, which still grows
    # with capture duration, so no unpartitioned data-sized window.
    j = with_prefix_aggs(
        j,
        F.expr(f"tick_ms div {3_600_000}"),
        ["tick_ms"],
        sums={"__delivered": "n_delivered", "__applied": "n_applied"},
        maxes={"__max_commit": "max_commit", "__max_applied": "max_applied_commit"},
    )
    return j.select(
        "tick_ms",
        F.coalesce("__delivered", F.lit(0)).alias("delivered"),
        F.coalesce("__applied", F.lit(0)).alias("applied"),
        (
            F.coalesce("__delivered", F.lit(0)) - F.coalesce("__applied", F.lit(0))
        ).alias("backlog"),
        (
            F.col("__max_commit") - F.coalesce("__max_applied", F.lit(0))
        ).alias("lag_ms"),
    ).orderBy("tick_ms")


def rate_limited_consume(
    bus: DataFrame, per_tick: int = 8, tick_ms: int = TICK_MS
) -> DataFrame:
    """A6 — deterministic consumer rate limit (token bucket at sustained
    rate, ``web/App.tsx:2106-2113``): the consumer drains at most
    ``per_tick`` events per tick per partition, FIFO in delivery order.

    The classic service-queue recurrence ``c_i = max(d_i, c_{i-1} + 1/R)``
    has the closed form ``c_i = max_{j<=i}(d_j - j/R) + i/R`` — a running
    max, computed here per partition (0-based ``i`` in delivery order,
    ``d`` the tick-aligned delivery time). ``consume_tick`` is that value
    rounded up to the next tick; queue_delay = consume - delivery."""
    delivered = bus.filter(~F.col("dropped"))
    # exact integer arithmetic in service-slot units (each tick has per_tick
    # slots): slot_i = i + max_{j<=i}(tick_number_j * per_tick - j).
    # Both the per-partition index i and the running max are two-phase
    # bucketed (hour buckets of delivery time) so no bus partition funnels
    # through a single task.
    d = with_global_seq(
        delivered,
        F.expr(f"delivery_ts div {3_600_000}"),
        ["delivery_ts", "lsn"],
        out_col="__i",
        start=0,
        partition_cols=("partition",),
    ).withColumn(
        "__key",
        F.expr(f"delivery_ts div {tick_ms}") * per_tick - F.col("__i"),
    )
    d = with_prefix_aggs(
        d,
        F.expr(f"delivery_ts div {3_600_000}"),
        ["delivery_ts", "lsn"],
        maxes={"__runmax": "__key"},
        partition_cols=("partition",),
    )
    consume_units = F.col("__runmax") + F.col("__i")  # the event's service slot index
    consume_tick = F.floor(consume_units / per_tick).cast("long") * tick_ms
    return d.select(
        "lsn",
        "txn_id",
        "pk",
        "partition",
        "delivery_ts",
        consume_tick.cast("long").alias("consume_tick"),
        (consume_tick.cast("long") - F.col("delivery_ts")).alias("queue_delay_ms"),
    )


def rate_limited_frame(
    spark: SparkSession, sf_dir: str, per_tick: int = 8, tick_ms: int = TICK_MS
) -> DataFrame:
    """Session-shared :func:`rate_limited_consume` over the default bus.

    The A6 closed form costs two two-phase bucketed passes over the bus;
    both judged consumers of it (``cdc_rate_limited_consume`` and the
    retention-expiry GC audit) ask for the identical parameterization, so
    stage it once per session like the bus itself (see :mod:`.shared`)."""
    from lets_talk_cdc_change_feed_playground_spark.operators.shared import shared_df

    return shared_df(
        spark,
        ("rate_limited", sf_dir, per_tick, tick_ms),
        lambda: rate_limited_consume(
            bus_feed(spark, sf_dir), per_tick=per_tick, tick_ms=tick_ms
        ),
    )


def offset_dedup(bus: DataFrame) -> DataFrame:
    """A8 — exactly-once consumption: deterministic redelivery (every event
    whose ``hash31(lsn) % 10 == 0`` arrives twice) deduped on
    ``(partition, offset)`` (``consumer.mjs:122-143``)."""
    delivered = bus.filter(~F.col("dropped"))
    dups = delivered.filter((hash31(F.col("lsn").cast("string")) % 10) == 0)
    received = delivered.unionByName(dups)
    return (
        received.groupBy("partition")
        .agg(
            F.count(F.lit(1)).alias("received"),
            F.countDistinct("partition", "offset").alias("distinct_offsets"),
            (F.count(F.lit(1)) - F.countDistinct("partition", "offset")).alias(
                "duplicates_dropped"
            ),
        )
        .orderBy("partition")
    )
