"""Schema-registry compatibility classification over the evolving feed.

``cdc_schema_evolution`` captures the reference's C4 ADD COLUMN control
stream (`src/modes/logBased.ts:238-260`); this module closes the loop a real
deployment needs next: classify every schema transition the way a schema
registry would (Confluent compatibility levels):

- column ADDED after the table's first op    → consumers on the old schema
  still read new records (extra field ignored) → **BACKWARD**-compatible
  transition;
- column DROPPED (absent from every later op) → old records still parse
  under the new schema (missing field null)   → **FORWARD**-compatible;
- a table whose history contains both kinds   → registry mode **NONE**
  (only FULL-transitive schemas survive both directions);
- no post-baseline changes                    → **FULL**.

The evolving feed extends the C4 derivation with a *disappearing* column:
``legacy`` is present only while ``event_id <= max_event_id/2`` (the first
half of the stream), so every table genuinely drops it mid-stream; ``k``
(every 3rd event) keeps appearing intermittently and must NOT be classified
as dropped — the drop rule is therefore "absent from the table's last
``DROP_MIN``+ ops", exact integer counting, not a recency heuristic.

Scale shape: one explode + two keyed aggregations (per (table, column) and
per table), then sketch-sized joins; the per-table version numbering windows
run over schema events (a handful of rows per table), never data rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from lets_talk_cdc_change_feed_playground_spark.sources.testdata import load_events

DROP_MIN = 10  # ops that must follow a column's last sighting to call it dropped


def _evolving_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-format (table, t, seq, column) presence rows of the evolving feed."""
    ev = load_events(spark, sf_dir)
    half = ev.agg(F.expr("max(event_id) div 2").alias("mid"))
    base = ev.crossJoin(F.broadcast(half)).select(
        F.col("event_type").alias("table"),
        F.expr("unix_micros(cast(ts as timestamp)) div 1000").alias("t"),
        F.col("event_id").alias("seq"),
        F.array(
            F.lit("value"),
            F.lit("event_type"),
            F.when(F.col("event_id") % 3 == 0, F.lit("k")),
            F.when(F.col("event_id") <= F.col("mid"), F.lit("legacy")),
        ).alias("cols"),
    )
    return base.select(
        "table", "t", "seq", F.explode(F.filter("cols", lambda c: c.isNotNull())).alias("column")
    )


def cdc_schema_compat(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lets_talk_cdc_change_feed_playground_spark.operators.shared import shared_df

    cols = _evolving_cols(spark, sf_dir)
    # (table, column) grain — tiny — but its lineage is the exploded presence
    # frame; two consumers below (the after-join and the add/drop classify)
    spans = shared_df(
        spark,
        ("compat_spans", sf_dir),
        lambda: cols.groupBy("table", "column").agg(
            F.min(F.struct("t", "seq")).alias("first"),
            F.max(F.struct("t", "seq")).alias("last"),
        ),
    )
    # every event carries the two always-present columns, so the distinct
    # (table, t, seq) op set IS the events projection (event_id is unique) —
    # a plain scan instead of a distinct shuffle over the exploded frame
    ev = load_events(spark, sf_dir)
    ops = ev.select(
        F.col("event_type").alias("table"),
        F.expr("unix_micros(cast(ts as timestamp)) div 1000").alias("t"),
        F.col("event_id").alias("seq"),
    )
    tbl = ops.groupBy("table").agg(
        F.min(F.struct("t", "seq")).alias("t0"), F.count(F.lit(1)).alias("n_ops")
    )
    # ops after the column's last sighting — per-key aggregate join, exact
    after = (
        spans.join(ops, "table")
        .filter(F.struct("t", "seq") > F.col("last"))
        .groupBy("table", "column")
        .agg(F.count(F.lit(1)).alias("n_after"))
    )
    sp = (
        spans.join(after, ["table", "column"], "left")
        .na.fill({"n_after": 0})
        .join(F.broadcast(tbl), "table")
    )
    # one pass over sp emits BOTH event kinds: the add/baseline row always,
    # the drop row behind its threshold — the earlier adds/drops union
    # re-executed the spans⋈after⋈tbl chain once per branch (guide §2.4)
    ev_add = F.struct(
        F.col("first.t").alias("t"),
        F.col("first.seq").alias("seq"),
        F.when(F.col("first") == F.col("t0"), F.lit("baseline"))
        .otherwise(F.lit("add"))
        .alias("action"),
    )
    ev_drop = F.when(
        F.col("n_after") >= DROP_MIN,
        F.struct(
            F.col("last.t").alias("t"),
            F.col("last.seq").alias("seq"),
            F.lit("drop").alias("action"),
        ),
    )
    events = (
        sp.select(
            "table",
            "column",
            "n_after",
            F.explode(F.array(ev_add, ev_drop)).alias("ev"),
        )
        .filter(F.col("ev").isNotNull())
        .select(
            "table",
            "column",
            F.col("ev.t").alias("t"),
            F.col("ev.seq").alias("seq"),
            F.col("ev.action").alias("action"),
            "n_after",
        )
    )
    wv = W.partitionBy("table").orderBy("t", "seq", "action", "column")
    classified = events.withColumn("version", F.row_number().over(wv)).withColumn(
        "compat",
        F.when(F.col("action") == "baseline", F.lit("N/A"))
        .when(F.col("action") == "add", F.lit("BACKWARD"))
        .otherwise(F.lit("FORWARD")),
    )
    modes = classified.groupBy("table").agg(
        F.max((F.col("action") == "add").cast("int")).alias("has_add"),
        F.max((F.col("action") == "drop").cast("int")).alias("has_drop"),
    )
    mode = (
        F.when((F.col("has_add") == 1) & (F.col("has_drop") == 1), F.lit("NONE"))
        .when(F.col("has_add") == 1, F.lit("BACKWARD"))
        .when(F.col("has_drop") == 1, F.lit("FORWARD"))
        .otherwise(F.lit("FULL"))
    )
    return (
        classified.join(F.broadcast(modes.withColumn("table_mode", mode)), "table")
        .select(
            "table", "version", "action", "column", "t", "seq", "n_after", "compat", "table_mode"
        )
        .orderBy("table", "version")
    )


_COMPAT_SQL = f"""
WITH ev AS (
  SELECT event_type AS tbl, epoch_ms(ts) AS t, event_id AS seq, event_id,
         (SELECT max(event_id) // 2 FROM events) AS mid
  FROM events
),
cols AS (
  SELECT tbl, t, seq, 'value' AS col FROM ev
  UNION ALL SELECT tbl, t, seq, 'event_type' FROM ev
  UNION ALL SELECT tbl, t, seq, 'k' FROM ev WHERE event_id % 3 = 0
  UNION ALL SELECT tbl, t, seq, 'legacy' FROM ev WHERE event_id <= mid
),
spans AS (
  SELECT tbl, col,
         min(CAST(t AS HUGEINT) * 100000000 + seq) AS first_k,
         max(CAST(t AS HUGEINT) * 100000000 + seq) AS last_k
  FROM cols GROUP BY tbl, col
),
ops AS (SELECT DISTINCT tbl, t, seq FROM cols),
tblagg AS (SELECT tbl, min(CAST(t AS HUGEINT) * 100000000 + seq) AS t0_k, count(*) AS n_ops FROM ops GROUP BY tbl),
aft AS (
  SELECT s.tbl, s.col, count(*) AS n_after
  FROM spans s JOIN ops o ON s.tbl = o.tbl AND CAST(o.t AS HUGEINT) * 100000000 + o.seq > s.last_k
  GROUP BY s.tbl, s.col
),
sp AS (
  SELECT s.tbl, s.col, s.first_k, s.last_k, COALESCE(a.n_after, 0) AS n_after, g.t0_k
  FROM spans s LEFT JOIN aft a ON s.tbl = a.tbl AND s.col = a.col
  JOIN tblagg g ON s.tbl = g.tbl
),
ev2 AS (
  SELECT tbl, col, CAST(first_k // 100000000 AS BIGINT) AS t, CAST(first_k % 100000000 AS BIGINT) AS seq,
         CASE WHEN first_k = t0_k THEN 'baseline' ELSE 'add' END AS action, n_after
  FROM sp
  UNION ALL
  SELECT tbl, col, CAST(last_k // 100000000 AS BIGINT), CAST(last_k % 100000000 AS BIGINT), 'drop', n_after
  FROM sp WHERE n_after >= {DROP_MIN}
),
classified AS (
  SELECT tbl, col, t, seq, action, n_after,
         row_number() OVER (PARTITION BY tbl ORDER BY t, seq, action, col) AS version,
         CASE action WHEN 'baseline' THEN 'N/A' WHEN 'add' THEN 'BACKWARD' ELSE 'FORWARD' END AS compat
  FROM ev2
),
modes AS (
  SELECT tbl,
         CASE WHEN max(CASE WHEN action = 'add' THEN 1 ELSE 0 END) = 1
                   AND max(CASE WHEN action = 'drop' THEN 1 ELSE 0 END) = 1 THEN 'NONE'
              WHEN max(CASE WHEN action = 'add' THEN 1 ELSE 0 END) = 1 THEN 'BACKWARD'
              WHEN max(CASE WHEN action = 'drop' THEN 1 ELSE 0 END) = 1 THEN 'FORWARD'
              ELSE 'FULL' END AS table_mode
  FROM classified GROUP BY tbl
)
SELECT c.tbl AS "table", CAST(c.version AS INT) AS version, c.action, c.col AS "column",
       c.t, c.seq, CAST(c.n_after AS BIGINT) AS n_after, c.compat, m.table_mode
FROM classified c JOIN modes m ON c.tbl = m.tbl
ORDER BY "table", version
"""


QUERIES = {"cdc_schema_compat": cdc_schema_compat}
ORACLE = {"cdc_schema_compat": _COMPAT_SQL}
