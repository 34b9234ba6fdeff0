"""Sink-side event transformation queries: SMT chain and 2PC epoch sink.

Two judged operators that model what sits between a CDC feed and its
consumers in a production deployment:

- ``cdc_smt_chain`` — a Kafka-Connect-style single-message-transform chain
  (route / unwrap / mask / insert-metadata / timestamp-convert) applied to
  the C1 WAL.  The reference's sink consumer performs the same class of
  payload shaping before applying events
  (``scenarios/01-canonical-reference/sink/consumer.mjs`` flattens the
  envelope, drops/flags deletes, and rewrites fields); the chain here is
  the declarative Spark equivalent — one projection, no shuffle, applied
  per-record exactly like Connect applies SMTs per message.
- ``cdc_epoch_2pc`` — an epoch-based two-phase-commit sink ledger (the
  transactional exactly-once pattern of streaming sinks: prepare a staged
  epoch, commit atomically; on crash, uncommitted epochs are replayed and
  their duplicate prepares discarded).  The reference proves the same
  exactly-once property through offset dedup on restart
  (``src/changefeed/model.ts`` drops already-seen offsets after a
  reconnect); here the unit of atomicity is a whole epoch instead of a
  single offset, which is how high-throughput sinks amortize the
  coordination cost at 100 TB.

Scale notes: the SMT chain is a pure row-local projection (it fuses into
the WAL scan's whole-stage codegen — zero extra shuffles).  The 2PC ledger
is one aggregation keyed on the epoch id; epochs are dense ``lsn``-ranges so
the groupBy key count is ``|WAL| / EPOCH_N`` and there is no skew by
construction.  The only unpartitioned window (crash-epoch pick) runs over
the already-aggregated per-epoch frame — ``|WAL| / EPOCH_N`` rows, never
data-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from lets_talk_cdc_change_feed_playground_spark.operators.capture import log_capture
from lets_talk_cdc_change_feed_playground_spark.operators.cdc_queries import (
    WAL_SQL,
    _with,
)

#: Events per sink epoch (the prepare/commit unit).
EPOCH_N = 512

#: Regex router: ``cdc.<method>.events`` -> ``warehouse.<method>_events``.
_ROUTE_RE = r"^cdc\.(.+)\.events$"
_ROUTE_SUB_SPARK = r"warehouse.$1_events"  # Java backref syntax
_ROUTE_SUB_DUCK = r"warehouse.\1_events"  # RE2 backref syntax


def cdc_smt_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the Connect SMT chain route -> unwrap -> mask -> insert ->
    timestamp-convert to the C1 WAL, one declarative projection."""
    wal = log_capture(spark, sf_dir)
    source_topic = F.concat(F.lit("cdc."), F.col("method"), F.lit(".events"))
    is_del = F.col("op") == "d"

    def unwrap(c):
        # ExtractNewRecordState: deletes carry their before image + a flag.
        return F.when(is_del, F.col(f"before_{c}")).otherwise(F.col(f"after_{c}"))

    return wal.select(
        F.regexp_replace(source_topic, F.lit(_ROUTE_RE), F.lit(_ROUTE_SUB_SPARK)).alias(
            "topic"
        ),
        "pk",
        "op",
        F.when(is_del, F.lit("true")).otherwise(F.lit("false")).alias("__deleted"),
        unwrap("event_type").alias("event_type"),
        unwrap("value").alias("value"),
        # MaskField: props is PII-ish free text -> same-length mask
        # (NULL props stays NULL: repeat of a NULL length is NULL).
        F.expr(
            "repeat('*', length(CASE WHEN op = 'd' THEN before_props"
            " ELSE after_props END))"
        ).alias("props"),
        # TimestampConverter: epoch-ms -> ISO second string (UTC session tz).
        F.date_format(
            F.timestamp_micros((F.col("ts_ms") * F.lit(1000)).cast("long")),
            "yyyy-MM-dd HH:mm:ss",
        ).alias("ts_iso"),
        # InsertField: source coordinates for downstream lineage.
        F.col("lsn").alias("__lsn"),
        F.col("ts_ms").alias("__ts_ms"),
        source_topic.alias("__source_topic"),
    ).orderBy("__lsn")


_SMT_SQL = (
    _with(WAL_SQL)
    + f"""
SELECT regexp_replace('cdc.' || method || '.events', '{_ROUTE_RE}', '{_ROUTE_SUB_DUCK}') AS topic,
       pk,
       op,
       CASE WHEN op = 'd' THEN 'true' ELSE 'false' END AS __deleted,
       CASE WHEN op = 'd' THEN before_event_type ELSE after_event_type END AS event_type,
       CASE WHEN op = 'd' THEN before_value ELSE after_value END AS value,
       repeat('*', length(CASE WHEN op = 'd' THEN before_props ELSE after_props END)) AS props,
       strftime(make_timestamp(ts_ms * 1000), '%Y-%m-%d %H:%M:%S') AS ts_iso,
       lsn AS __lsn,
       ts_ms AS __ts_ms,
       'cdc.' || method || '.events' AS __source_topic
FROM wal
ORDER BY __lsn
"""
)


def cdc_epoch_2pc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase-commit epoch ledger with a deterministic mid-stream crash.

    The WAL is cut into dense ``EPOCH_N``-event epochs.  The first run
    prepares and commits epochs ``0 .. crash-1``, prepares epoch ``crash``,
    then dies before its commit.  Restart resumes from the last committed
    checkpoint: it re-prepares every epoch ``>= crash`` (so the crash epoch
    is prepared twice — its first staged write is discarded) and commits the
    rest.  The ledger proves exactly-once: every epoch ends with exactly one
    commit and ``applied_rows`` equals the epoch's WAL row count, with the
    crash epoch's duplicate prepare accounted as discarded rows.
    """
    wal = log_capture(spark, sf_dir).select("lsn")
    epochs = wal.groupBy(
        ((F.col("lsn") - 1) / EPOCH_N).cast("long").alias("epoch")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("lsn").alias("first_lsn"),
        F.max("lsn").alias("last_lsn"),
    )
    # crash after preparing the middle epoch; the unpartitioned window runs
    # over |WAL|/EPOCH_N pre-aggregated rows only
    e = epochs.withColumn(
        "crash_epoch",
        ((F.max("epoch").over(W.partitionBy()) + 1) / 2).cast("long"),
    )
    return e.select(
        "epoch",
        "n_events",
        "first_lsn",
        "last_lsn",
        F.when(F.col("epoch") == F.col("crash_epoch"), F.lit(2))
        .otherwise(F.lit(1))
        .alias("prepares"),
        F.lit(1).alias("commits"),
        F.when(F.col("epoch") < F.col("crash_epoch"), F.lit(1))
        .otherwise(F.lit(2))
        .alias("committed_in_run"),
        F.when(F.col("epoch") == F.col("crash_epoch"), F.col("n_events"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("discarded_rows"),
        F.col("n_events").alias("applied_rows"),
    ).orderBy("epoch")


_2PC_SQL = (
    _with(WAL_SQL)
    + f"""
, epochs AS (
  SELECT (lsn - 1) // {EPOCH_N} AS epoch,
         count(*) AS n_events,
         min(lsn) AS first_lsn,
         max(lsn) AS last_lsn
  FROM wal GROUP BY 1
),
e AS (SELECT *, (max(epoch) OVER () + 1) // 2 AS crash_epoch FROM epochs)
SELECT epoch,
       n_events,
       first_lsn,
       last_lsn,
       CASE WHEN epoch = crash_epoch THEN 2 ELSE 1 END AS prepares,
       1 AS commits,
       CASE WHEN epoch < crash_epoch THEN 1 ELSE 2 END AS committed_in_run,
       CAST(CASE WHEN epoch = crash_epoch THEN n_events ELSE 0 END AS BIGINT) AS discarded_rows,
       n_events AS applied_rows
FROM e
ORDER BY epoch
"""
)


QUERIES = {
    "cdc_smt_chain": cdc_smt_chain,
    "cdc_epoch_2pc": cdc_epoch_2pc,
}

ORACLE = {
    "cdc_smt_chain": _SMT_SQL,
    "cdc_epoch_2pc": _2PC_SQL,
}
