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

QUERIES = {"cdc_fk_ordering": cdc_fk_ordering}
ORACLE = {"cdc_fk_ordering": _FK_SQL}
