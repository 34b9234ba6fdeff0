"""Referential-integrity ordering of a multi-table CDC feed.

A change feed that splits parent and child tables across bus partitions
(B3 hash partitioning, ``src/changefeed/model.ts:92-167``) can deliver a
child row before the parent it references — the classic foreign-key
hazard every CDC sink hits when it fans a transactional source out by
table.  The reference's playground shows the same failure as commit
drift; this query quantifies it on the driver's REAL parent/child pair
(``orders`` <- ``lineitem``) and proves the standard fix:

- Both rows of a (order, lineitem) pair commit together at order time;
  each then arrives with an independent deterministic bus delay
  (``hash31`` of its own key, mod ``DRIFT_MS`` — the reference's hash,
  so both engines replay the identical schedule).
- A violation is a child arriving before its parent exists at the sink.
- The fix is the FK-aware hold-back buffer: a child applies at
  ``max(child_arrival, parent_arrival)``.  The query re-counts
  violations under that schedule (provably zero) and prices the fix —
  total and max hold time per order priority class.

Scale shape: one shuffle join of lineitem to orders on the FK itself
(the co-partitioned join key any warehouse already buckets by), then a
5-row aggregation.  No windows, no driver loops; at 100 TB this is a
single co-located join + map-side-combinable aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lets_talk_cdc_change_feed_playground_spark.operators.ops_feed import (
    OPS_SQL,
    hash31,
    hash31_sql,
)
from lets_talk_cdc_change_feed_playground_spark.sources.testdata import load_table

#: Max per-event bus delivery drift (ms) — 30 s of partition lag.
DRIFT_MS = 30_000


def cdc_fk_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FK violations under drifted arrival + the hold-back fix, per priority."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.expr("unix_micros(cast(o_orderdate as timestamp)) div 1000").alias("commit_ms"),
    )
    parent = orders.select(
        "o_orderkey",
        "o_orderpriority",
        "commit_ms",
        (
            F.col("commit_ms")
            + hash31(F.concat(F.lit("O"), F.col("o_orderkey").cast("string")), DRIFT_MS)
        ).alias("parent_arrival"),
    )
    child = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        hash31(
            F.concat(
                F.lit("L"),
                F.col("l_orderkey").cast("string"),
                F.lit(":"),
                F.col("l_linenumber").cast("string"),
            ),
            DRIFT_MS,
        ).alias("child_drift"),
    )
    j = child.join(parent, child.l_orderkey == parent.o_orderkey).select(
        "o_orderpriority",
        "parent_arrival",
        (F.col("commit_ms") + F.col("child_drift")).alias("child_arrival"),
    )
    hold = F.greatest(F.lit(0).cast("long"), F.col("parent_arrival") - F.col("child_arrival"))
    fixed_arrival = F.greatest(F.col("child_arrival"), F.col("parent_arrival"))
    return (
        j.withColumn("hold_ms", hold)
        .withColumn("fixed_arrival", fixed_arrival)
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_children"),
            F.sum(F.when(F.col("child_arrival") < F.col("parent_arrival"), 1).otherwise(0)).alias("n_violations"),
            F.sum("hold_ms").alias("sum_hold_ms"),
            F.max("hold_ms").alias("max_hold_ms"),
            F.sum(F.when(F.col("fixed_arrival") < F.col("parent_arrival"), 1).otherwise(0)).alias("n_violations_after_holdback"),
        )
        .withColumn(
            "viol_bp",
            F.expr("n_violations * 10000 div n_children"),
        )
        .select(
            "priority", "n_children", "n_violations", "viol_bp",
            "sum_hold_ms", "max_hold_ms", "n_violations_after_holdback",
        )
        .orderBy("priority")
    )


_FK_SQL = f"""
WITH parent AS (
  SELECT o_orderkey, o_orderpriority,
         epoch_ms(CAST(o_orderdate AS TIMESTAMP)) AS commit_ms,
         epoch_ms(CAST(o_orderdate AS TIMESTAMP))
           + {hash31_sql("'O' || CAST(o_orderkey AS VARCHAR)", DRIFT_MS)} AS parent_arrival
  FROM orders
),
j AS (
  SELECT p.o_orderpriority AS priority,
         p.parent_arrival,
         p.commit_ms
           + {hash31_sql("'L' || CAST(l.l_orderkey AS VARCHAR) || ':' || CAST(l.l_linenumber AS VARCHAR)", DRIFT_MS)}
           AS child_arrival
  FROM lineitem l JOIN parent p ON l.l_orderkey = p.o_orderkey
),
h AS (
  SELECT priority, parent_arrival, child_arrival,
         greatest(0, parent_arrival - child_arrival) AS hold_ms,
         greatest(child_arrival, parent_arrival) AS fixed_arrival
  FROM j
)
SELECT priority,
       CAST(count(*) AS BIGINT) AS n_children,
       CAST(sum(CASE WHEN child_arrival < parent_arrival THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
       CAST(sum(CASE WHEN child_arrival < parent_arrival THEN 1 ELSE 0 END) * 10000
            // count(*) AS BIGINT) AS viol_bp,
       CAST(sum(hold_ms) AS BIGINT) AS sum_hold_ms,
       CAST(max(hold_ms) AS BIGINT) AS max_hold_ms,
       CAST(sum(CASE WHEN fixed_arrival < parent_arrival THEN 1 ELSE 0 END) AS BIGINT) AS n_violations_after_holdback
FROM h
GROUP BY priority
ORDER BY priority
"""

#: Offset-commit batch size (positions) for the delivery-guarantee model.
COMMIT_BATCH = 100
#: Number of deterministic consumer crashes injected into the replay.
N_CRASHES = 3


def cdc_delivery_guarantees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At-least-once vs at-most-once vs exactly-once, priced per strategy.

    The reference's playground teaches delivery guarantees by letting the
    consumer crash (deterministic fault injection,
    ``src/changefeed/model.ts:149-167``); this query replays the SAME WAL
    under the three textbook offset-commit strategies and accounts for
    every delivery:

    - positions are a dense global sequence over the ops feed (two-phase
      bucketed assignment, no data-sized global window);
    - ``N_CRASHES`` crashes hit at deterministic positions ``i*N/4``;
      offsets commit in batches of ``COMMIT_BATCH``;
    - **at_least_once** commits AFTER processing: a crash replays the
      window since the last commit — the replayed segments are built as a
      real broadcast range join (the redelivery audit you'd run on a real
      sink), so duplicates are counted per event, not assumed;
    - **at_most_once** commits BEFORE processing: a crash loses the rest
      of the committed batch;
    - **exactly_once** commits offsets and output in one transaction (the
      A8/2PC path, ``cdc_offset_dedup`` / ``cdc_epoch_2pc``).

    The verdict columns show the standard recovery claim: offset dedup
    restores exactly-once semantics from at-least-once delivery
    (``converges_after_dedup``) but can NEVER recover at-most-once's
    losses."""
    from lets_talk_cdc_change_feed_playground_spark.functions.sequence import (
        with_global_seq,
    )
    from lets_talk_cdc_change_feed_playground_spark.operators.ops_feed import ops_feed

    ops = ops_feed(spark, sf_dir).select("seq", "t")
    pos = with_global_seq(
        ops, F.expr("t div 86400000"), ["t", "seq"], out_col="pos"
    ).select("seq", "pos")
    n = pos.agg(F.count(F.lit(1)).alias("n"))
    B = COMMIT_BATCH
    crashes = (
        spark.range(1, N_CRASHES + 1)
        .crossJoin(F.broadcast(n))
        .select(
            F.col("id").alias("crash_id"),
            F.expr("n * id div 4").alias("crash_pos"),
            F.expr(f"(n * id div 4) div {B} * {B}").alias("alo_floor"),
            F.expr(f"((n * id div 4 - 1) div {B} + 1) * {B}").alias("amo_hi"),
            F.col("n"),
        )
    )
    # at-least-once: base pass + one replayed row per (event, containing crash)
    replays = pos.join(
        F.broadcast(crashes),
        (F.col("pos") > F.col("alo_floor")) & (F.col("pos") <= F.col("crash_pos")),
    ).select("seq", "pos")
    alo = pos.unionByName(replays)
    # at-most-once: events inside a lost tail never process
    amo = pos.join(
        F.broadcast(crashes.select("crash_pos", "amo_hi", "n")),
        (F.col("pos") > F.col("crash_pos"))
        & (F.col("pos") <= F.least(F.col("amo_hi"), F.col("n"))),
        "left_anti",
    )

    def account(strategy: str, delivered: DataFrame):
        return (
            delivered.crossJoin(F.broadcast(n))
            .groupBy(F.lit(strategy).alias("strategy"))
            .agg(
                F.max("n").alias("n_events"),
                F.count(F.lit(1)).alias("n_deliveries"),
                (F.count(F.lit(1)) - F.countDistinct("seq")).alias("n_duplicates"),
                (F.max("n") - F.countDistinct("seq")).alias("n_lost"),
                F.countDistinct("seq").alias("n_unique_delivered"),
            )
        )

    out = (
        account("at_least_once", alo)
        .unionByName(account("at_most_once", amo))
        .unionByName(account("exactly_once", pos))
        .withColumn(
            "exactly_once",
            (F.col("n_duplicates") == 0) & (F.col("n_lost") == 0),
        )
        .withColumn("converges_after_dedup", F.col("n_lost") == 0)
        .orderBy("strategy")
    )
    return out


def _delivery_sql() -> str:
    B = COMMIT_BATCH
    return (
        "WITH "
        + OPS_SQL.strip().rstrip()
        + f""",
pos AS (
  SELECT seq, row_number() OVER (ORDER BY t, seq) AS pos FROM src
),
nn AS (SELECT count(*) AS n FROM pos),
crashes AS (
  SELECT i AS crash_id,
         n * i // 4 AS crash_pos,
         (n * i // 4) // {B} * {B} AS alo_floor,
         ((n * i // 4 - 1) // {B} + 1) * {B} AS amo_hi,
         n
  FROM nn, UNNEST(range(1, {N_CRASHES + 1})) AS t(i)
),
alo AS (
  SELECT seq FROM pos
  UNION ALL
  SELECT p.seq FROM pos p JOIN crashes c
    ON p.pos > c.alo_floor AND p.pos <= c.crash_pos
),
amo AS (
  SELECT seq FROM pos p
  WHERE NOT EXISTS (
    SELECT 1 FROM crashes c
    WHERE p.pos > c.crash_pos AND p.pos <= least(c.amo_hi, c.n)
  )
),
acct AS (
  SELECT 'at_least_once' AS strategy,
         (SELECT n FROM nn) AS n_events,
         count(*) AS n_deliveries,
         count(*) - count(DISTINCT seq) AS n_duplicates,
         (SELECT n FROM nn) - count(DISTINCT seq) AS n_lost,
         count(DISTINCT seq) AS n_unique_delivered
  FROM alo
  UNION ALL
  SELECT 'at_most_once',
         (SELECT n FROM nn), count(*),
         count(*) - count(DISTINCT seq),
         (SELECT n FROM nn) - count(DISTINCT seq),
         count(DISTINCT seq)
  FROM amo
  UNION ALL
  SELECT 'exactly_once',
         (SELECT n FROM nn), count(*),
         count(*) - count(DISTINCT seq),
         (SELECT n FROM nn) - count(DISTINCT seq),
         count(DISTINCT seq)
  FROM pos
)
SELECT strategy,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(n_deliveries AS BIGINT) AS n_deliveries,
       CAST(n_duplicates AS BIGINT) AS n_duplicates,
       CAST(n_lost AS BIGINT) AS n_lost,
       CAST(n_unique_delivered AS BIGINT) AS n_unique_delivered,
       n_duplicates = 0 AND n_lost = 0 AS exactly_once,
       n_lost = 0 AS converges_after_dedup
FROM acct
ORDER BY strategy
"""
    )


QUERIES = {
    "cdc_fk_ordering": cdc_fk_ordering,
    "cdc_delivery_guarantees": cdc_delivery_guarantees,
}
ORACLE = {
    "cdc_fk_ordering": _FK_SQL,
    "cdc_delivery_guarantees": _delivery_sql(),
}
