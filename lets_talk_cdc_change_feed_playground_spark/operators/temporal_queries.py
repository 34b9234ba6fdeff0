"""Temporal CDC queries: time-travel reads and idempotent-producer dedup.

Two capabilities every long-lived change-feed deployment grows into, derived
from the same C1 WAL every other judged CDC query uses:

- ``cdc_time_travel`` — AS-OF state reconstruction: the reference replays its
  event log up to a chosen point to inspect intermediate table states
  (``src/domain/storage.ts:245-259`` replayEventsToTables is exactly an
  as-of fold when stopped early; the playground's scrubbable timeline does
  this interactively).  Here the WAL is folded to the table state at three
  deterministic cut timestamps (25/50/75% of the WAL's time range) and each
  snapshot is summarized (row count, decimal-exact value total, an integer
  key checksum) — the lakehouse "SELECT ... TIMESTAMP AS OF" path.
- ``cdc_idempotent_producer`` — exactly-once *produce* semantics (the dual of
  A8's consumer-side offset dedup): every WAL record becomes a send on a
  key-hashed bus partition; a deterministic subset is retried (same producer
  id / epoch / sequence — must dedup), and after a mid-stream producer
  restart bumps the epoch, a deterministic subset of old-epoch "zombie"
  sends must be fenced.  This is Kafka's PID/epoch/sequence protocol
  (public Kafka docs, KIP-98) re-expressed as batch classification; the
  reference's bus dedups the consumer side only
  (``src/changefeed/model.ts:92-167``), so the producer side completes the
  end-to-end exactly-once story.

Scale shape: the as-of fold is the replay fold with a 3-row broadcast cut
join — one keyed shuffle on (cut, pk); the producer classification is
row-local hash arithmetic plus one keyed window per (partition, epoch) for
dense sequence numbers, then a 6-row aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from lets_talk_cdc_change_feed_playground_spark.operators import capture
from lets_talk_cdc_change_feed_playground_spark.operators.cdc_queries import WAL_SQL, _with
from lets_talk_cdc_change_feed_playground_spark.operators.ops_feed import hash31, hash31_sql

#: As-of cut points, in percent of the WAL's [min ts, max ts] span.
TT_CUTS = (25, 50, 75)

N_PARTITIONS = 3  # bus partitions for the producer sends
RETRY_MOD = 10  # send retried (duplicate (pid, epoch, seq)) iff h('r:'||lsn) % 10 == 0
ZOMBIE_MOD = 20  # post-restart send stuck on the old epoch iff h('z:'||lsn) % 20 == 0


def cdc_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fold the WAL to its AS-OF state at each TT_CUTS timestamp and
    summarize every snapshot: events applied, live keys, decimal-exact value
    total, and an order-independent integer key checksum."""
    wal = capture.log_capture(spark, sf_dir)
    bounds = wal.agg(F.min("ts_ms").alias("t0"), F.max("ts_ms").alias("t1"))
    cuts = (
        bounds.select(
            F.explode(F.array(*[F.lit(p) for p in TT_CUTS])).alias("pct"), "t0", "t1"
        )
        .select("pct", F.expr("t0 + ((t1 - t0) * pct) div 100").alias("cut_ts_ms"))
    )
    upto = wal.join(F.broadcast(cuts), F.col("ts_ms") <= F.col("cut_ts_ms"))
    w = W.partitionBy("pct", "pk").orderBy(F.desc("ts_ms"), F.desc("lsn"))
    state = (
        upto.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col("op") != "d"))
    )
    snap = state.groupBy("pct", "cut_ts_ms").agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.round(F.sum(F.col("after_value").cast("decimal(38,6)")), 2)
        .cast("double")
        .alias("total_value"),
        F.sum(hash31(F.concat_ws("|", F.col("pk"), F.col("after_event_type"))))
        .cast("long")
        .alias("key_checksum"),
    )
    applied = upto.groupBy("pct").agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    return (
        snap.join(applied, "pct")
        .select("pct", "cut_ts_ms", "n_events", "n_keys", "total_value", "key_checksum")
        .orderBy("pct")
    )


_TT_CHECK = hash31_sql("pk || '|' || after_event_type")

_TIME_TRAVEL_SQL = _with(
    WAL_SQL,
    f"""
bounds AS (SELECT min(ts_ms) AS t0, max(ts_ms) AS t1 FROM wal),
cuts AS (
  SELECT pct, t0 + ((t1 - t0) * pct) // 100 AS cut_ts_ms
  FROM bounds, (SELECT UNNEST([{", ".join(str(p) for p in TT_CUTS)}]) AS pct)
),
upto AS (
  SELECT c.pct, c.cut_ts_ms, w.*
  FROM wal w JOIN cuts c ON w.ts_ms <= c.cut_ts_ms
),
st AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY pct, pk ORDER BY ts_ms DESC, lsn DESC) AS rn
    FROM upto
  ) WHERE rn = 1 AND op <> 'd'
),
snap AS (
  SELECT pct, cut_ts_ms,
         count(*) AS n_keys,
         CAST(round(sum(CAST(after_value AS DECIMAL(38,6))), 2) AS DOUBLE) AS total_value,
         CAST(sum({_TT_CHECK}) AS BIGINT) AS key_checksum
  FROM st GROUP BY pct, cut_ts_ms
),
applied AS (SELECT pct, count(*) AS n_events FROM upto GROUP BY pct)
SELECT s.pct, s.cut_ts_ms, CAST(a.n_events AS BIGINT) AS n_events,
       CAST(s.n_keys AS BIGINT) AS n_keys, s.total_value, s.key_checksum
FROM snap s JOIN applied a ON s.pct = a.pct
ORDER BY s.pct
""",
)


def cdc_idempotent_producer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classify every producer send as accepted / duplicate / fenced under
    Kafka-style PID/epoch/sequence rules and prove the accepted stream is
    gapless per (partition, epoch)."""
    wal = capture.log_capture(spark, sf_dir)
    mid = wal.agg(F.expr("max(lsn) div 2").alias("mid"))
    sends = wal.join(F.broadcast(mid)).select(
        "lsn",
        "pk",
        (hash31(F.col("pk")) % N_PARTITIONS).alias("part"),
        # epoch 1 after the mid-stream producer restart, except zombies: the
        # pre-restart instance keeps sending a deterministic subset on epoch 0
        (hash31(F.concat(F.lit("z:"), F.col("lsn"))) % ZOMBIE_MOD == 0).alias("is_zombie_pick"),
        (hash31(F.concat(F.lit("r:"), F.col("lsn"))) % RETRY_MOD == 0).alias("retried"),
        (F.col("lsn") > F.col("mid")).alias("post_restart"),
    )
    sends = sends.withColumn(
        "zombie", F.col("post_restart") & F.col("is_zombie_pick")
    ).withColumn(
        "epoch",
        F.when(F.col("post_restart") & ~F.col("zombie"), F.lit(1)).otherwise(F.lit(0)),
    )
    # dense per-(partition, epoch) sequence over live (non-zombie) originals —
    # the number the producer stamps on the batch
    wseq = W.partitionBy("part", "epoch").orderBy("lsn")
    live = sends.filter(~F.col("zombie")).withColumn("seq", F.row_number().over(wseq))
    zombies = sends.filter(F.col("zombie")).withColumn("seq", F.lit(None).cast("int"))
    attempts = live.unionByName(zombies).select(
        "lsn",
        "part",
        "epoch",
        "seq",
        "zombie",
        "retried",
        F.expr("explode(sequence(0, if(retried, 1, 0)))").alias("attempt"),
    )
    classified = attempts.withColumn(
        "status",
        F.when(F.col("zombie"), F.lit("fenced"))
        .when(F.col("attempt") > 0, F.lit("duplicate"))
        .otherwise(F.lit("accepted")),
    )
    return (
        classified.groupBy("part", "epoch")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sends"),
            F.sum((F.col("status") == "accepted").cast("int")).cast("long").alias("n_accepted"),
            F.sum((F.col("status") == "duplicate").cast("int")).cast("long").alias("n_duplicate"),
            F.sum((F.col("status") == "fenced").cast("int")).cast("long").alias("n_fenced"),
            F.max(F.when(F.col("status") == "accepted", F.col("seq"))).alias("max_seq"),
            F.sum(
                F.when(
                    F.col("status") == "accepted",
                    hash31(F.concat(F.lit("a:"), F.col("lsn"))),
                )
            )
            .cast("long")
            .alias("accepted_checksum"),
        )
        .withColumn("gapless", F.col("max_seq") == F.col("n_accepted"))
        .orderBy("part", "epoch")
    )


_IDEM_SQL = _with(
    WAL_SQL,
    f"""
mid AS (SELECT max(lsn) // 2 AS mid FROM wal),
sends AS (
  SELECT lsn, pk,
         {hash31_sql("pk")} % {N_PARTITIONS} AS part,
         lsn > mid AS post_restart,
         (lsn > mid) AND ({hash31_sql("'z:' || lsn")} % {ZOMBIE_MOD} = 0) AS zombie,
         {hash31_sql("'r:' || lsn")} % {RETRY_MOD} = 0 AS retried
  FROM wal, mid
),
epochs AS (
  SELECT *, CASE WHEN post_restart AND NOT zombie THEN 1 ELSE 0 END AS epoch
  FROM sends
),
seqd AS (
  SELECT *, CASE WHEN zombie THEN NULL
                 ELSE row_number() OVER (
                        PARTITION BY part, epoch,
                                     CASE WHEN zombie THEN 1 ELSE 0 END
                        ORDER BY lsn) END AS seq
  FROM epochs
),
attempts AS (
  SELECT s.*, a.attempt
  FROM seqd s, (SELECT UNNEST([0, 1]) AS attempt) a
  WHERE a.attempt = 0 OR s.retried
),
classified AS (
  SELECT *, CASE WHEN zombie THEN 'fenced'
                 WHEN attempt > 0 THEN 'duplicate'
                 ELSE 'accepted' END AS status
  FROM attempts
)
SELECT part, epoch,
       count(*) AS n_sends,
       CAST(sum(CASE WHEN status = 'accepted' THEN 1 ELSE 0 END) AS BIGINT) AS n_accepted,
       CAST(sum(CASE WHEN status = 'duplicate' THEN 1 ELSE 0 END) AS BIGINT) AS n_duplicate,
       CAST(sum(CASE WHEN status = 'fenced' THEN 1 ELSE 0 END) AS BIGINT) AS n_fenced,
       CAST(max(CASE WHEN status = 'accepted' THEN seq END) AS INT) AS max_seq,
       CAST(sum(CASE WHEN status = 'accepted' THEN {hash31_sql("'a:' || lsn")} END) AS BIGINT)
         AS accepted_checksum,
       max(CASE WHEN status = 'accepted' THEN seq END)
         = sum(CASE WHEN status = 'accepted' THEN 1 ELSE 0 END) AS gapless
FROM classified
GROUP BY part, epoch
ORDER BY part, epoch
""",
)


QUERIES = {
    "cdc_time_travel": cdc_time_travel,
    "cdc_idempotent_producer": cdc_idempotent_producer,
}

ORACLE = {
    "cdc_time_travel": _TIME_TRAVEL_SQL,
    "cdc_idempotent_producer": _IDEM_SQL,
}


# ---------------------------------------------------------------------------
# Bitemporal as-of reads (valid time × transaction time)
# ---------------------------------------------------------------------------

BT_CUTS = (50, 75, 100)  # pct cuts applied to BOTH time axes (9 snapshots)


def cdc_bitemporal_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitemporal as-of grid over the WAL: **transaction time** is when the
    pipeline learned a change (``emitted_at_ms`` — the fetch-boundary emit),
    **valid time** is when it happened at the source (``ts_ms``).  For each
    (tt_pct × vt_pct) cut pair the snapshot folds only records *known by*
    the tx cut with *validity* at or before the vt cut — the standard
    bitemporal read (Snodgrass): "what did we believe at T about the state
    as of V".  Off-diagonal cells differ from the valid-time-only
    ``cdc_time_travel`` exactly where emit lag (fetch interval) holds
    records back; the (100, 100) cell equals the full replay state.

    Scale: one broadcast of the 9-row cut grid, one (cut, pk) shuffle for
    the per-snapshot argmax fold — same shape as ``cdc_time_travel``.
    """
    wal = capture.log_capture(spark, sf_dir)
    bounds = wal.agg(
        F.min("emitted_at_ms").alias("e0"),
        F.max("emitted_at_ms").alias("e1"),
        F.min("ts_ms").alias("v0"),
        F.max("ts_ms").alias("v1"),
    )
    cuts = (
        bounds.select(
            F.explode(F.array(*[F.lit(p) for p in BT_CUTS])).alias("tt_pct"),
            "e0", "e1", "v0", "v1",
        )
        .select(
            "tt_pct",
            F.explode(F.array(*[F.lit(p) for p in BT_CUTS])).alias("vt_pct"),
            "e0", "e1", "v0", "v1",
        )
        .select(
            "tt_pct",
            "vt_pct",
            F.expr("e0 + ((e1 - e0) * tt_pct) div 100").alias("tt_cut_ms"),
            F.expr("v0 + ((v1 - v0) * vt_pct) div 100").alias("vt_cut_ms"),
        )
    )
    known = wal.join(
        F.broadcast(cuts),
        (F.col("emitted_at_ms") <= F.col("tt_cut_ms"))
        & (F.col("ts_ms") <= F.col("vt_cut_ms")),
    )
    w = W.partitionBy("tt_pct", "vt_pct", "pk").orderBy(F.desc("ts_ms"), F.desc("lsn"))
    state = known.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1)
    snap = state.groupBy("tt_pct", "vt_pct", "tt_cut_ms", "vt_cut_ms").agg(
        F.count(F.lit(1)).cast("long").alias("n_versions"),
        F.sum(F.when(F.col("op") != "d", 1).otherwise(0)).cast("long").alias("n_resident"),
        F.round(
            F.sum(F.when(F.col("op") != "d", F.col("after_value")).cast("decimal(38,6)")), 2
        )
        .cast("double")
        .alias("total_value"),
    )
    return snap.orderBy("tt_pct", "vt_pct")


_BT_LIST = ", ".join(str(p) for p in BT_CUTS)

_BITEMPORAL_SQL = _with(
    WAL_SQL,
    f"""
bounds AS (
  SELECT min(emitted_at_ms) AS e0, max(emitted_at_ms) AS e1,
         min(ts_ms) AS v0, max(ts_ms) AS v1
  FROM wal
),
cuts AS (
  SELECT tt_pct, vt_pct,
         e0 + ((e1 - e0) * tt_pct) // 100 AS tt_cut_ms,
         v0 + ((v1 - v0) * vt_pct) // 100 AS vt_cut_ms
  FROM bounds,
       (SELECT UNNEST([{_BT_LIST}]) AS tt_pct),
       (SELECT UNNEST([{_BT_LIST}]) AS vt_pct)
),
known AS (
  SELECT c.tt_pct, c.vt_pct, c.tt_cut_ms, c.vt_cut_ms, w.*
  FROM wal w JOIN cuts c
    ON w.emitted_at_ms <= c.tt_cut_ms AND w.ts_ms <= c.vt_cut_ms
),
st AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY tt_pct, vt_pct, pk
                                 ORDER BY ts_ms DESC, lsn DESC) AS rn
    FROM known
  ) WHERE rn = 1
)
SELECT tt_pct, vt_pct, tt_cut_ms, vt_cut_ms,
       CAST(count(*) AS BIGINT) AS n_versions,
       CAST(sum(CASE WHEN op <> 'd' THEN 1 ELSE 0 END) AS BIGINT) AS n_resident,
       CAST(round(sum(CASE WHEN op <> 'd'
                           THEN CAST(after_value AS DECIMAL(38,6)) END), 2) AS DOUBLE)
         AS total_value
FROM st
GROUP BY tt_pct, vt_pct, tt_cut_ms, vt_cut_ms
ORDER BY tt_pct, vt_pct
""",
)

QUERIES["cdc_bitemporal_asof"] = cdc_bitemporal_asof
ORACLE["cdc_bitemporal_asof"] = _BITEMPORAL_SQL
