"""Multi-region replication semantics: LWW conflict resolution, CRDT merge.

Active-active CDC deployments replicate each region's change feed to the
others and need deterministic conflict semantics.  Two judged queries model
the standard answers over the derived ops feed
(:mod:`.ops_feed` — the same feed every capture lane uses):

- ``cdc_geo_lww`` — two regions accept writes concurrently (op origin =
  ``seq`` parity) and ship them cross-region with a fixed replication
  delay.  A NAIVE apply-in-arrival-order sink diverges between regions for
  keys with concurrent writes; a last-writer-wins register (resolve by
  origin timestamp, region rank, seq) converges regardless of arrival
  order — the query shows both folds side by side and counts the
  conflict windows per key.  This is the register-CRDT argument the
  reference's playground demonstrates with commit drift
  (``src/changefeed/model.ts`` availability delays): ordering noise must
  not change the converged state.
- ``cdc_crdt_counter`` — a PN-counter per event_type across three replicas
  (op origin = ``seq`` mod 3).  Each replica snapshot knows its OWN
  increments fully but only a stale prefix of the others; merging the
  three snapshots with the CRDT join (element-wise max per origin) still
  recovers the exact global counter, because every origin contributes its
  own complete row — the join-semilattice property that makes state-based
  CRDTs delivery-order-proof.

Scale shape: everything is per-key windows and (origin, type) aggregations
— no unpartitioned window touches event-sized data; the snapshot union in
the PN-counter carries replicas×origins×types rows only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from lets_talk_cdc_change_feed_playground_spark.operators.cdc_queries import WAL_SQL, _with
from lets_talk_cdc_change_feed_playground_spark.operators.ops_feed import (
    OPS_SQL,
    hash31,
    hash31_sql,
    ops_feed,
)

#: Cross-region replication delay (ms): a remote write arrives this late.
REPL_MS = 120_000


def cdc_geo_lww(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-region LWW register vs naive arrival-order apply, per key."""
    ops = ops_feed(spark, sf_dir).select(
        "seq",
        "t",
        "pk",
        "op",
        "event_type",
        "value",
        F.when(F.col("seq") % 2 == 0, F.lit("east")).otherwise(F.lit("west")).alias(
            "region"
        ),
    )
    r = ops.withColumn("rrank", F.when(F.col("region") == "east", 0).otherwise(1))
    # ONE pass (r09 fusion): the conflict counters, the LWW register and
    # both naive arrival-order sinks are all per-pk aggregates over the
    # same rows — the r08 form ran four aggregations over four scans of the
    # feed and glued them with three joins.  The lag window establishes the
    # pk partitioning once; the groupBy reuses it (no second exchange).
    # Each region's naive apply resolves by (arrival, seq): local writes
    # arrive at t, remote at t + REPL_MS — per-row columns, so the
    # last-applied winner is a conditional struct max, not a separate pass.
    wk = W.partitionBy("pk").orderBy("t", "seq")
    conf = (
        r.withColumn("prev_region", F.lag("region").over(wk))
        .withColumn("prev_t", F.lag("t").over(wk))
        .withColumn(
            "arr_e",
            F.when(F.col("rrank") == 0, F.col("t")).otherwise(F.col("t") + REPL_MS),
        )
        .withColumn(
            "arr_w",
            F.when(F.col("rrank") == 1, F.col("t")).otherwise(F.col("t") + REPL_MS),
        )
    )
    out = (
        conf.groupBy("pk")
        .agg(
            F.sum(F.when(F.col("region") == "east", 1).otherwise(0)).alias("n_east"),
            F.sum(F.when(F.col("region") == "west", 1).otherwise(0)).alias("n_west"),
            F.sum(
                F.when(
                    (F.col("prev_region").isNotNull())
                    & (F.col("prev_region") != F.col("region"))
                    & (F.col("t") - F.col("prev_t") < REPL_MS),
                    1,
                ).otherwise(0)
            ).alias("n_conflicts"),
            # LWW register: resolve by (origin t, region rank, seq) —
            # arrival-order independent by construction
            F.max(
                F.struct("t", "rrank", "seq", "region", "event_type", "value")
            ).alias("w"),
            F.max(F.struct(F.col("arr_e").alias("a"), "seq", "value")).alias("we"),
            F.max(F.struct(F.col("arr_w").alias("a"), "seq", "value")).alias("ww"),
        )
        .select(
            "pk",
            "n_east",
            "n_west",
            "n_conflicts",
            F.col("w.region").alias("winner_region"),
            F.col("w.event_type").alias("lww_event_type"),
            F.col("w.value").alias("lww_value"),
            F.col("we.value").alias("naive_east_value"),
            F.col("ww.value").alias("naive_west_value"),
        )
        .withColumn(
            "naive_diverged",
            ~F.col("naive_east_value").eqNullSafe(F.col("naive_west_value")),
        )
    )
    # only keys with cross-region activity are interesting
    return out.filter((F.col("n_east") > 0) & (F.col("n_west") > 0)).orderBy("pk")


_GEO_SQL = (
    "WITH "
    + OPS_SQL.strip().rstrip()
    + f"""
, r AS (
  SELECT seq, t, pk, op, event_type, value,
         CASE WHEN seq % 2 = 0 THEN 'east' ELSE 'west' END AS region,
         CASE WHEN seq % 2 = 0 THEN 0 ELSE 1 END AS rrank
  FROM src
),
conf AS (
  SELECT *, lag(region) OVER wk AS prev_region, lag(t) OVER wk AS prev_t
  FROM r WINDOW wk AS (PARTITION BY pk ORDER BY t, seq)
),
conflicts AS (
  SELECT pk,
         CAST(sum(CASE WHEN region = 'east' THEN 1 ELSE 0 END) AS BIGINT) AS n_east,
         CAST(sum(CASE WHEN region = 'west' THEN 1 ELSE 0 END) AS BIGINT) AS n_west,
         CAST(sum(CASE WHEN prev_region IS NOT NULL AND prev_region <> region
                        AND t - prev_t < {REPL_MS} THEN 1 ELSE 0 END) AS BIGINT) AS n_conflicts
  FROM conf GROUP BY pk
),
lww AS (
  SELECT pk, region AS winner_region, event_type AS lww_event_type, value AS lww_value
  FROM (
    SELECT *, row_number() OVER (PARTITION BY pk ORDER BY t DESC, rrank DESC, seq DESC) AS rn
    FROM r
  ) WHERE rn = 1
),
naive_east AS (
  SELECT pk, value AS naive_east_value FROM (
    SELECT *, row_number() OVER (
      PARTITION BY pk
      ORDER BY (CASE WHEN rrank = 0 THEN t ELSE t + {REPL_MS} END) DESC, seq DESC
    ) AS rn FROM r
  ) WHERE rn = 1
),
naive_west AS (
  SELECT pk, value AS naive_west_value FROM (
    SELECT *, row_number() OVER (
      PARTITION BY pk
      ORDER BY (CASE WHEN rrank = 1 THEN t ELSE t + {REPL_MS} END) DESC, seq DESC
    ) AS rn FROM r
  ) WHERE rn = 1
)
SELECT c.pk, c.n_east, c.n_west, c.n_conflicts,
       l.winner_region, l.lww_event_type, l.lww_value,
       ne.naive_east_value, nw.naive_west_value,
       ne.naive_east_value IS DISTINCT FROM nw.naive_west_value AS naive_diverged
FROM conflicts c
JOIN lww l USING (pk) JOIN naive_east ne USING (pk) JOIN naive_west nw USING (pk)
WHERE c.n_east > 0 AND c.n_west > 0
ORDER BY pk
"""
)


def cdc_crdt_counter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PN-counter CRDT: three replica snapshots merge to the exact totals."""
    ops = ops_feed(spark, sf_dir).select(
        "seq",
        "t",
        "event_type",
        (F.col("seq") % 3).alias("origin"),
        F.when(F.col("op") == "delete", F.lit(0)).otherwise(F.lit(1)).alias("is_inc"),
    )
    bounds = ops.agg(
        ((F.min("t") + F.max("t")) / 2).cast("long").alias("t_stale")
    )
    o = ops.crossJoin(F.broadcast(bounds))
    # observer r's snapshot: full history of its own origin, stale prefix of
    # the others (t <= t_stale)
    snapshots = []
    for obs in range(3):
        vis = o.filter((F.col("origin") == obs) | (F.col("t") <= F.col("t_stale")))
        snapshots.append(
            vis.groupBy("event_type", "origin").agg(
                F.sum("is_inc").alias("inc"),
                F.sum(1 - F.col("is_inc")).alias("dec"),
            )
        )
    snap = snapshots[0].unionByName(snapshots[1]).unionByName(snapshots[2])
    # CRDT join: element-wise max per (origin, type) across snapshots
    merged = snap.groupBy("event_type", "origin").agg(
        F.max("inc").alias("inc"), F.max("dec").alias("dec")
    )
    counter = merged.groupBy("event_type").agg(
        F.sum("inc").alias("inc_total"),
        F.sum("dec").alias("dec_total"),
        (F.sum("inc") - F.sum("dec")).alias("pn_value"),
    )
    truth = ops.groupBy("event_type").agg(
        F.sum("is_inc").alias("true_inc"),
        F.sum(1 - F.col("is_inc")).alias("true_dec"),
    )
    return (
        counter.join(truth, "event_type")
        .withColumn(
            "converged",
            (F.col("inc_total") == F.col("true_inc"))
            & (F.col("dec_total") == F.col("true_dec")),
        )
        .orderBy("event_type")
    )


_CRDT_SQL = (
    "WITH "
    + OPS_SQL.strip().rstrip()
    + """
, ops AS (
  SELECT seq, t, event_type, seq % 3 AS origin,
         CASE WHEN op = 'delete' THEN 0 ELSE 1 END AS is_inc
  FROM src
),
bounds AS (SELECT (min(t) + max(t)) // 2 AS t_stale FROM ops),
snap AS (
  SELECT g.obs AS obs, event_type, origin,
         CAST(sum(is_inc) AS BIGINT) AS inc,
         CAST(sum(1 - is_inc) AS BIGINT) AS dec
  FROM ops, bounds, generate_series(0, 2) g(obs)
  WHERE origin = g.obs OR t <= t_stale
  GROUP BY 1, 2, 3
),
merged AS (
  SELECT event_type, origin, max(inc) AS inc, max(dec) AS dec
  FROM snap GROUP BY 1, 2
),
counter AS (
  SELECT event_type,
         CAST(sum(inc) AS BIGINT) AS inc_total,
         CAST(sum(dec) AS BIGINT) AS dec_total,
         CAST(sum(inc) - sum(dec) AS BIGINT) AS pn_value
  FROM merged GROUP BY 1
),
truth AS (
  SELECT event_type,
         CAST(sum(is_inc) AS BIGINT) AS true_inc,
         CAST(sum(1 - is_inc) AS BIGINT) AS true_dec
  FROM ops GROUP BY 1
)
SELECT c.event_type, c.inc_total, c.dec_total, c.pn_value,
       t.true_inc, t.true_dec,
       (c.inc_total = t.true_inc AND c.dec_total = t.true_dec) AS converged
FROM counter c JOIN truth t USING (event_type)
ORDER BY c.event_type
"""
)


QUERIES = {
    "cdc_geo_lww": cdc_geo_lww,
    "cdc_crdt_counter": cdc_crdt_counter,
}

ORACLE = {
    "cdc_geo_lww": _GEO_SQL,
    "cdc_crdt_counter": _CRDT_SQL,
}


# ---------------------------------------------------------------------------
# Replica promotion: RPO audit at failover
# ---------------------------------------------------------------------------

RPO_BASE_MS = 60_000  # replication base latency (congested async link)
RPO_JITTER_MS = 3_600_000  # per-record deterministic jitter span (up to 1 h)
RPO_FAIL_NUM, RPO_FAIL_DEN = 9, 10  # primary fails at 90% of the timeline


def cdc_replica_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Failover audit for an asynchronous replica: each WAL record ships
    with a deterministic replication delay; the replica applies strictly
    in LSN order, so its applied position at the failure instant is the
    longest prefix fully arrived (one late record holds back everything
    after it — the classic async-replication gotcha).  The audit reports
    RPO in both units (committed-but-unreplicated events and the time
    window they span), the lost-key count, and the promoted replica's
    final applied LSN — the numbers a failover runbook needs.

    Scale shape: the prefix position is a min-aggregate over late
    records (no ordered scan); loss accounting is two conditional
    aggregates over the WAL."""
    from lets_talk_cdc_change_feed_playground_spark.operators import capture

    wal = capture.log_capture(spark, sf_dir)
    rec = wal.select(
        "lsn",
        "pk",
        "ts_ms",
        (
            F.col("ts_ms")
            + RPO_BASE_MS
            + hash31(F.concat(F.lit("rep:"), F.col("lsn").cast("string")), mod=2_147_483_647)
            % RPO_JITTER_MS
        ).alias("arrival_ms"),
    )
    tf = rec.agg(
        F.expr(
            f"min(ts_ms) + ((max(ts_ms) - min(ts_ms)) * {RPO_FAIL_NUM}) div {RPO_FAIL_DEN}"
        ).alias("t_fail")
    )
    r = rec.crossJoin(F.broadcast(tf))
    # replica applied position: longest prefix with every arrival <= t_fail
    gap = r.filter(F.col("arrival_ms") > F.col("t_fail")).agg(
        F.min("lsn").alias("first_missing")
    )
    audit = (
        r.crossJoin(F.broadcast(gap))
        .withColumn(
            "applied_upto",
            F.coalesce(F.col("first_missing") - 1, F.expr("9223372036854775807")),
        )
        .groupBy("t_fail", "applied_upto")
        .agg(
            F.max(F.when(F.col("ts_ms") <= F.col("t_fail"), F.col("lsn"))).alias(
                "primary_lsn"
            ),
            F.sum(
                F.when(
                    (F.col("ts_ms") <= F.col("t_fail"))
                    & (F.col("lsn") > F.col("applied_upto")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("rpo_events"),
            F.count_distinct(
                F.when(
                    (F.col("ts_ms") <= F.col("t_fail"))
                    & (F.col("lsn") > F.col("applied_upto")),
                    F.col("pk"),
                )
            )
            .cast("long")
            .alias("rpo_keys"),
            F.max(
                F.when(F.col("lsn") <= F.col("applied_upto"), F.col("ts_ms"))
            ).alias("replica_ts"),
            F.max(F.when(F.col("ts_ms") <= F.col("t_fail"), F.col("ts_ms"))).alias(
                "primary_ts"
            ),
        )
    )
    return audit.select(
        "t_fail",
        "primary_lsn",
        F.col("applied_upto").alias("replica_lsn"),
        "rpo_events",
        "rpo_keys",
        (F.col("primary_ts") - F.col("replica_ts")).alias("rpo_ms"),
        (F.col("rpo_events") == 0).alias("zero_loss"),
    )


# BIGINT-safe 31-fold at the wide modulus (jitter needs more entropy than the
# reference's 9973-mod hash can give; INT32 accumulators would overflow)
_RPO_HASH = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), [CAST(ascii(c) AS BIGINT) "
    "for c in string_split('rep:' || CAST(lsn AS VARCHAR), '')]), "
    "(a, c) -> (a*31 + c) % 2147483647)"
)

_RPO_SQL = (
    _with(
        WAL_SQL,
        f"""
rec AS (
  SELECT lsn, pk, ts_ms,
         ts_ms + {RPO_BASE_MS} + ({_RPO_HASH}) % {RPO_JITTER_MS} AS arrival_ms
  FROM wal
),
tf AS (
  SELECT min(ts_ms) + ((max(ts_ms) - min(ts_ms)) * {RPO_FAIL_NUM}) // {RPO_FAIL_DEN} AS t_fail
  FROM rec
),
gap AS (
  SELECT COALESCE(min(lsn) - 1, 9223372036854775807) AS applied_upto
  FROM rec, tf WHERE arrival_ms > t_fail
)
""",
    )
    + """
SELECT t_fail,
       max(CASE WHEN ts_ms <= t_fail THEN lsn END) AS primary_lsn,
       applied_upto AS replica_lsn,
       CAST(sum(CASE WHEN ts_ms <= t_fail AND lsn > applied_upto THEN 1 ELSE 0 END) AS BIGINT) AS rpo_events,
       CAST(count(DISTINCT CASE WHEN ts_ms <= t_fail AND lsn > applied_upto THEN pk END) AS BIGINT) AS rpo_keys,
       max(CASE WHEN ts_ms <= t_fail THEN ts_ms END)
         - max(CASE WHEN lsn <= applied_upto THEN ts_ms END) AS rpo_ms,
       sum(CASE WHEN ts_ms <= t_fail AND lsn > applied_upto THEN 1 ELSE 0 END) = 0 AS zero_loss
FROM rec, tf, gap
GROUP BY t_fail, applied_upto
"""
)

QUERIES["cdc_replica_promotion"] = cdc_replica_promotion
ORACLE["cdc_replica_promotion"] = _RPO_SQL


# ---------------------------------------------------------------------------
# Quorum reads: R+W>N intersection audit + read-repair backlog
# ---------------------------------------------------------------------------

QR_N = 3  # replicas per key
#: fraction of writes that also reach the third replica (the async straggler)
QR_FULL_NUM, QR_FULL_DEN = 7, 10


def cdc_quorum_reads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamo-style quorum consistency audit over the change feed.

    Every write lands synchronously on W = 2 of N = 3 replicas (primary =
    ``hash(pk) mod 3`` and its successor); the third replica receives it
    asynchronously and only ``QR_FULL_NUM/QR_FULL_DEN`` of writes have
    arrived there.  Reads pick a deterministic per-key read set and the
    audit counts stale answers at two read sizes:

    - ``stale_reads_r1`` (R = 1): reads that hit the straggler replica
      while it is behind — R + W = 3 = N does NOT guarantee intersection;
    - ``stale_reads_r2`` (R = 2): any 2-subset of 3 replicas intersects any
      write quorum, so the max version visible across the read set is
      always current — ``quorum_holds`` asserts zero stale reads, the
      R + W > N theorem as a data test.

    Per-replica rows report hosting counts and the read-repair backlog
    (keys where the replica's version trails the key's latest) — what an
    anti-entropy pass (see ``cdc_anti_entropy``) must reconcile.

    Scale: one fan-out to (replica, write) rows (bounded x3), two keyed
    aggregations and pk-equi-joins; no data-sized windows, no RNG
    (replica choice and async arrival are hash-derived, reproducible).
    """
    ops = ops_feed(spark, sf_dir)
    writes = ops.select(
        "pk",
        "seq",
        (hash31(F.col("pk")) % QR_N).alias("p0"),
        (
            hash31(F.concat(F.lit("w:"), F.col("seq").cast("string"))) % QR_FULL_DEN
            < QR_FULL_NUM
        ).alias("full_rep"),
    )
    landed = (
        writes.select("pk", "seq", F.col("p0").alias("replica"))
        .unionByName(writes.select("pk", "seq", ((F.col("p0") + 1) % QR_N).alias("replica")))
        .unionByName(
            writes.filter("full_rep").select(
                "pk", "seq", ((F.col("p0") + 2) % QR_N).alias("replica")
            )
        )
    )
    from lets_talk_cdc_change_feed_playground_spark.operators.shared import shared_df

    # the per-replica version state is probed by BOTH read-set joins (and the
    # backlog audit below) — stage the 3x fan-out + groupBy once per session
    rstate = shared_df(
        spark,
        ("quorum_rstate", sf_dir),
        lambda: landed.groupBy("replica", "pk").agg(F.max("seq").alias("rv")),
    )
    # r09 fusion: the r08 form computed ``latest`` (a full ops aggregation)
    # THREE times — once per read-set join probe and once per backlog join —
    # and probed the replica state with two separate pk joins.  Now: one
    # ops aggregation, ONE rstate ⋈ latest join; the read-set versions come
    # from a per-pk pivot of the joined rows (replica is 0..QR_N-1, so
    # "version at replica r1" is a conditional max, not a join), and the
    # total backlog is the sum of the per-replica backlog rows (3 rows)
    # instead of a third scan+join.
    latest = ops.groupBy("pk").agg(F.max("seq").alias("latest")).select(
        "pk",
        "latest",
        (hash31(F.concat(F.lit("r:"), F.col("pk"))) % QR_N).alias("r1"),
    )
    rj = rstate.join(latest, "pk")
    pr_base = rj.groupBy(F.col("replica").cast("long").alias("replica")).agg(
        F.count(F.lit(1)).cast("long").alias("keys_hosted"),
        F.coalesce(F.sum(F.when(F.col("rv") < F.col("latest"), 1)), F.lit(0))
        .cast("long")
        .alias("keys_behind"),
    )
    per_replica = pr_base.select(
        "replica",
        "keys_hosted",
        "keys_behind",
        F.lit(None).cast("long").alias("stale_reads_r1"),
        F.lit(None).cast("long").alias("stale_reads_r2"),
        F.lit(None).cast("boolean").alias("quorum_holds"),
    )
    behind_total = pr_base.agg(F.sum("keys_behind").alias("keys_behind"))
    pvt = rj.groupBy("pk").agg(
        F.first("latest").alias("latest"),
        F.first("r1").alias("r1"),
        *[
            F.max(F.when(F.col("replica") == i, F.col("rv"))).alias(f"rv{i}")
            for i in range(QR_N)
        ],
    )

    def rv_at(idx_col):
        expr = F.lit(None).cast("long")
        for i in range(QR_N):
            expr = F.when(idx_col == i, F.col(f"rv{i}")).otherwise(expr)
        return expr

    v1 = F.coalesce(rv_at(F.col("r1")), F.lit(-1))
    v12 = F.greatest(v1, F.coalesce(rv_at((F.col("r1") + 1) % QR_N), F.lit(-1)))
    stale = pvt.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.coalesce(F.sum(F.when(v1 < F.col("latest"), 1)), F.lit(0))
        .cast("long")
        .alias("stale_reads_r1"),
        F.coalesce(F.sum(F.when(v12 < F.col("latest"), 1)), F.lit(0))
        .cast("long")
        .alias("stale_reads_r2"),
    )
    verdict = stale.crossJoin(behind_total).select(
        F.lit(-1).cast("long").alias("replica"),
        F.col("n_keys").alias("keys_hosted"),
        "keys_behind",
        "stale_reads_r1",
        "stale_reads_r2",
        (F.col("stale_reads_r2") == 0).alias("quorum_holds"),
    )
    return per_replica.unionByName(verdict).orderBy("replica")


_H_W = hash31_sql("'w:' || CAST(seq AS VARCHAR)")
_H_R = hash31_sql("'r:' || pk")
_H_PK = hash31_sql("pk")

_QUORUM_SQL = (
    _with()
    + f"""
, writes AS (
  SELECT pk, seq, ({_H_PK}) % {QR_N} AS p0,
         ({_H_W}) % {QR_FULL_DEN} < {QR_FULL_NUM} AS full_rep
  FROM src
),
landed AS (
  SELECT pk, seq, p0 AS replica FROM writes
  UNION ALL SELECT pk, seq, (p0 + 1) % {QR_N} FROM writes
  UNION ALL SELECT pk, seq, (p0 + 2) % {QR_N} FROM writes WHERE full_rep
),
rstate AS (SELECT replica, pk, max(seq) AS rv FROM landed GROUP BY 1, 2),
latest AS (
  SELECT pk, max(seq) AS latest, ({_H_R}) % {QR_N} AS r1
  FROM src GROUP BY pk
),
reads AS (
  SELECT l.pk, l.latest,
         COALESCE(a.rv, -1) AS v1,
         greatest(COALESCE(a.rv, -1), COALESCE(b.rv, -1)) AS v12
  FROM latest l
  LEFT JOIN rstate a ON a.pk = l.pk AND a.replica = l.r1
  LEFT JOIN rstate b ON b.pk = l.pk AND b.replica = (l.r1 + 1) % {QR_N}
),
stale AS (
  SELECT CAST(count(*) AS BIGINT) AS n_keys,
         CAST(count(*) FILTER (WHERE v1 < latest) AS BIGINT) AS stale_reads_r1,
         CAST(count(*) FILTER (WHERE v12 < latest) AS BIGINT) AS stale_reads_r2
  FROM reads
),
joined AS (
  SELECT r.replica, r.rv, l.latest
  FROM rstate r JOIN latest l ON r.pk = l.pk
),
per_replica AS (
  SELECT CAST(replica AS BIGINT) AS replica,
         CAST(count(*) AS BIGINT) AS keys_hosted,
         CAST(count(*) FILTER (WHERE rv < latest) AS BIGINT) AS keys_behind
  FROM joined GROUP BY 1
),
behind AS (
  SELECT CAST(count(*) FILTER (WHERE rv < latest) AS BIGINT) AS keys_behind
  FROM joined
)
SELECT replica, keys_hosted, keys_behind,
       CAST(NULL AS BIGINT) AS stale_reads_r1,
       CAST(NULL AS BIGINT) AS stale_reads_r2,
       CAST(NULL AS BOOLEAN) AS quorum_holds
FROM per_replica
UNION ALL
SELECT CAST(-1 AS BIGINT), n_keys, behind.keys_behind,
       stale_reads_r1, stale_reads_r2, stale_reads_r2 = 0
FROM stale, behind
ORDER BY replica
"""
)

QUERIES["cdc_quorum_reads"] = cdc_quorum_reads
ORACLE["cdc_quorum_reads"] = _QUORUM_SQL
