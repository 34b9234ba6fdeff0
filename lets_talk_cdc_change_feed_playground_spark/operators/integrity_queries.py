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

from lets_talk_cdc_change_feed_playground_spark.operators.playground_queries import (
    _PCT,
    _bus_sql,
)
from lets_talk_cdc_change_feed_playground_spark.functions.sequence import with_global_seq
from lets_talk_cdc_change_feed_playground_spark.operators.cdc_queries import _with
from lets_talk_cdc_change_feed_playground_spark.operators import playground as pg2
from lets_talk_cdc_change_feed_playground_spark.operators.ops_feed import (
    OPS_SQL,
    hash31,
    hash31_sql,
    ops_feed,
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

    from lets_talk_cdc_change_feed_playground_spark.operators.shared import shared_df

    # five consumers below (base pass, replays, amo anti-join, and the three
    # accountings) re-scan this 2-column frame — persist the one two-phase
    # sequence assignment instead of re-deriving it per branch
    pos = shared_df(
        spark,
        ("delivery_pos", sf_dir),
        lambda: with_global_seq(
            ops_feed(spark, sf_dir).select("seq", "t"),
            F.expr("t div 86400000"),
            ["t", "seq"],
            out_col="pos",
        ).select("seq", "pos"),
    )
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


# ---------------------------------------------------------------------------
# Optimistic-concurrency conflict detection (first-committer-wins)
# ---------------------------------------------------------------------------

OCC_WORKERS = 4  # concurrent writers (hash-assigned, deterministic)
OCC_TXN = 3  # ops per transaction (per worker)
OCC_PAGES = 32  # lock granularity: page = hash31(pk) % OCC_PAGES
OCC_COMMIT_MS = 100  # commit latency appended to each txn interval


def cdc_txn_conflicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-write conflict audit under optimistic concurrency with
    page-granularity validation: the feed is split across ``OCC_WORKERS``
    deterministic concurrent writers (hash of seq — the events of one
    logical timeline interleave across workers, so transactions genuinely
    overlap in time); each worker groups its ops into ``OCC_TXN``-op
    transactions; conflicts are overlapping [start, commit+latency]
    intervals touching a common **page** (``hash31(pk) % OCC_PAGES`` —
    page-level locks, the classic coarse-granularity OCC validation);
    first-committer-wins aborts the later committer of each conflicting
    pair (snapshot-isolation write rule, no SSI cascade).

    Scale shape: per-worker dense sequence via the two-phase bucketed
    pattern (never a data-sized single-task window); pair generation is
    keyed on page — candidate pairs are Σ per-page |txns|², bounded by the
    page fan-out, never all-txn-pairs."""
    from lets_talk_cdc_change_feed_playground_spark.operators.shared import shared_df

    def build_occ_ops() -> DataFrame:
        o = ops_feed(spark, sf_dir).withColumn(
            "worker",
            hash31(F.concat(F.lit("w:"), F.col("seq").cast("string"))) % OCC_WORKERS,
        )
        return (
            with_global_seq(
                o,
                F.expr("t div 3600000"),
                ["t", "seq"],
                out_col="wseq",
                start=0,
                partition_cols=("worker",),
            )
            .withColumn("txn_id", F.expr(f"worker * 1000000 + wseq div {OCC_TXN}"))
            .select("txn_id", "t", "pk")
        )

    # the per-worker sequence assignment feeds two aggregations (tx
    # intervals, key pages) — persist the 3-column projection once
    ops = shared_df(spark, ("occ_ops", sf_dir), build_occ_ops)
    tx = ops.groupBy("txn_id").agg(
        F.min("t").alias("start_ts"),
        (F.max("t") + OCC_COMMIT_MS).alias("commit_ts"),
        F.count_distinct("pk").cast("long").alias("n_keys"),
    )
    keys = ops.select(
        "txn_id", (hash31(F.col("pk")) % OCC_PAGES).alias("page")
    ).distinct()
    # candidate pairs keyed on (page, hour-bucket): a transaction interval
    # spans few hour buckets, so per-key lists stay short — joining on the
    # page alone generates |txns-per-page|² pairs BEFORE the overlap filter
    # (measured 128M candidates at sf0.1)
    buck = shared_df(
        spark,
        ("occ_buck", sf_dir),
        lambda: keys.join(tx, "txn_id").select(
            F.col("txn_id").alias("txn_a"), "page",
            F.col("start_ts").alias("sa"), F.col("commit_ts").alias("ca"),
            F.explode(
                F.expr("sequence(start_ts div 3600000, commit_ts div 3600000)")
            ).alias("bkt"),
        ),
    )
    b = buck.select(
        F.col("txn_a").alias("txn_b"), F.col("page"), F.col("bkt"),
        F.col("sa").alias("sb"), F.col("ca").alias("cb"),
    )
    pairs = (
        buck.join(b, ["page", "bkt"])
        .filter(
            (F.col("txn_a") != F.col("txn_b"))
            & (F.col("sa") <= F.col("cb"))
            & (F.col("sb") <= F.col("ca"))
        )
        .select("txn_a", "txn_b", "ca", "cb")
        .distinct()
    )
    agg = pairs.groupBy("txn_a", "ca").agg(
        F.count(F.lit(1)).cast("long").alias("n_conflicts"),
        F.min("txn_b").alias("first_partner"),
        F.max(
            F.when(
                (F.col("cb") < F.col("ca"))
                | ((F.col("cb") == F.col("ca")) & (F.col("txn_b") < F.col("txn_a"))),
                1,
            ).otherwise(0)
        ).alias("loses"),
    )
    return (
        tx.join(agg.select("txn_a", "n_conflicts", "first_partner", "loses"),
                tx.txn_id == agg.txn_a, "left")
        .select(
            "txn_id",
            "start_ts",
            "commit_ts",
            "n_keys",
            F.coalesce("n_conflicts", F.lit(0)).alias("n_conflicts"),
            "first_partner",
            (F.coalesce("loses", F.lit(0)) == 1).alias("aborted"),
        )
        .orderBy("txn_id")
    )


_OCC_WHASH = hash31_sql("'w:' || CAST(seq AS VARCHAR)")
_OCC_PHASH = hash31_sql("pk")

_OCC_SQL = (
    _with()
    + f"""
, w AS (
  SELECT src.*, ({_OCC_WHASH}) % {OCC_WORKERS} AS worker FROM src
),
ws AS (
  SELECT w.*, row_number() OVER (PARTITION BY worker ORDER BY t, seq) - 1 AS wseq
  FROM w
),
opst AS (SELECT ws.*, worker * 1000000 + wseq // {OCC_TXN} AS txn_id FROM ws),
tx AS (
  SELECT txn_id, min(t) AS start_ts, max(t) + {OCC_COMMIT_MS} AS commit_ts,
         CAST(count(DISTINCT pk) AS BIGINT) AS n_keys
  FROM opst GROUP BY txn_id
),
keys AS (SELECT DISTINCT txn_id, ({_OCC_PHASH}) % {OCC_PAGES} AS page FROM opst),
ek AS (
  SELECT k.txn_id, k.page, t.start_ts, t.commit_ts, g.bkt
  FROM keys k JOIN tx t USING (txn_id),
       UNNEST(range(t.start_ts // 3600000, t.commit_ts // 3600000 + 1)) AS g(bkt)
),
pairs AS (
  SELECT DISTINCT a.txn_id AS txn_a, b.txn_id AS txn_b,
         a.commit_ts AS ca, b.commit_ts AS cb
  FROM ek a JOIN ek b ON a.page = b.page AND a.bkt = b.bkt AND a.txn_id <> b.txn_id
  WHERE a.start_ts <= b.commit_ts AND b.start_ts <= a.commit_ts
),
agg AS (
  SELECT txn_a,
         CAST(count(*) AS BIGINT) AS n_conflicts,
         min(txn_b) AS first_partner,
         max(CASE WHEN cb < ca OR (cb = ca AND txn_b < txn_a) THEN 1 ELSE 0 END) AS loses
  FROM pairs GROUP BY txn_a
)
SELECT t.txn_id, t.start_ts, t.commit_ts, t.n_keys,
       COALESCE(a.n_conflicts, 0) AS n_conflicts,
       a.first_partner,
       COALESCE(a.loses, 0) = 1 AS aborted
FROM tx t LEFT JOIN agg a ON t.txn_id = a.txn_a
ORDER BY t.txn_id
"""
)

QUERIES["cdc_txn_conflicts"] = cdc_txn_conflicts
ORACLE["cdc_txn_conflicts"] = _OCC_SQL
