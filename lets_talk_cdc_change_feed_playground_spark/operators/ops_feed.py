"""Deterministic SourceOp feed derived from the driver ``events`` table.

The reference replays scenario-defined source operations (insert/update/delete
with a logical ms clock) into its capture engines — ``SourceOp`` in
``sim/core/types.ts:10-33``, released in time order by
``sim/scenario/ScenarioRunner.ts:41-55``.  Our correctness gate runs on the
driver's parquet tables only, so the engine derives an equivalent deterministic
workload from ``events``:

    seq  = event_id                       (global, unique, time-ordered)
    t    = epoch milliseconds of ts       (the logical clock)
    pk   = CAST(user_id AS STRING)        (row key of the simulated table)
    op   = 'insert'  for a user's first event,
           'delete'  when event_type = 'error',
           'update'  otherwise
    after payload = (event_type, value, props)  — always a FULL row image,
           so the reference's merge ``{...cur.data, ...op.after}`` degenerates
           to replacement and stays expressible as pure column logic.

Both sides of the oracle gate build this feed identically: `ops_feed()` is the
DataFrame builder, `OPS_SQL` the DuckDB CTE used inside every oracle query.

Scale note: everything below is per-user-partitioned window work over a single
scan — at 100 TB the feed shuffles once on ``user_id`` and every downstream
capture transformation reuses that partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from lets_talk_cdc_change_feed_playground_spark.sources.testdata import load_events

# Logical-clock intervals (ms). The reference defaults (fetch 100 ms, poll
# 1000 ms, extract 500 ms — sim/engines/*.ts) are sized for a browser sim
# clock; the derived feed spans 30 days of event time, so the same ratios are
# scaled up: frequent fetch, rare poll, extract in between.
FETCH_MS = 60_000  # C1 log fetch interval      (1 min)
POLL_MS = 3_600_000  # C2 poll interval          (1 h — collapses real updates)
EXTRACT_MS = 300_000  # C3 audit extract interval (5 min)
OVERHEAD_MS = 5  # C3 trigger write overhead (sim/engines/TriggerEngine.ts:13)

#: DuckDB CTE defining the identical feed (``src`` relation).
OPS_SQL = """
src AS (
  SELECT event_id AS seq,
         epoch_ms(ts) AS t,
         CAST(user_id AS VARCHAR) AS pk,
         CASE WHEN row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) = 1
              THEN 'insert'
              WHEN event_type = 'error' THEN 'delete'
              ELSE 'update' END AS op,
         event_type, value, props
  FROM events
)
"""


def ops_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The derived SourceOp DataFrame: (seq, t, pk, op, event_type, value, props).

    Materialized once per session (see :mod:`.shared`) — every capture lane,
    bus feed, and diff query starts from this frame.
    """
    from lets_talk_cdc_change_feed_playground_spark.operators.shared import shared_df

    return shared_df(spark, ("ops_feed", sf_dir), lambda: _ops_feed(spark, sf_dir))


def _ops_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        F.col("event_id").alias("seq"),
        F.expr("unix_micros(cast(ts as timestamp)) div 1000").alias("t"),
        F.col("user_id").cast("string").alias("pk"),
        F.when(F.row_number().over(w) == 1, F.lit("insert"))
        .when(F.col("event_type") == "error", F.lit("delete"))
        .otherwise(F.lit("update"))
        .alias("op"),
        "event_type",
        "value",
        "props",
    )


def hash31(col, mod: int = 9973):
    """The reference's deterministic 31-multiplier string hash
    (``src/changefeed/model.ts:92-98``): fold ``acc*31 + charCode`` mod 9973
    over the characters.  Pure integer arithmetic so Spark and DuckDB agree.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.aggregate(
        F.split(c, ""),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * 31 + F.ascii(ch)) % mod,
    )


def hash31_sql(expr: str, mod: int = 9973) -> str:
    """DuckDB twin of :func:`hash31`."""
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT),"
        f" [CAST(ascii(c) AS BIGINT) for c in string_split({expr}, '')]),"
        f" (acc, c) -> (acc*31 + c) % {mod})"
    )
