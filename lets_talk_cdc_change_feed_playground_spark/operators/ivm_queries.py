"""Incremental view maintenance (IVM) of a join view from CDC deltas.

The reference's whole pitch is that a change feed lets a consumer keep a
derived table current without re-reading the source (``SURVEY.md §2.4``,
apply/merge in ``src/domain/storage.ts:133-164``).  This module takes the
next step every production CDC consumer eventually needs: maintaining a
**join view** incrementally with the classic counting / Z-set delta rule

    V_new = (R_old + dR) join (S_old + dS)
          = V_old  +  dR join S_old  +  R_old join dS  +  dR join dS

where deltas are weighted multisets (insert = +1, delete = -1, update =
-1 old + +1 new).  The epoch-0 view falls out of the same rule (both
"old" sides empty, so V_0 = dR_0 join dS_0) — no special initialisation.

Setup, derived purely from the driver ``events`` table:

- Time is split into 5-day **epochs** (6 per 30-day feed) — each epoch is
  one maintenance batch of CDC deltas.
- ``R`` (fact side) — the simulated user table maintained by the capture
  feed: key ``pk``, attributes ``(event_type, value)``, alive unless the
  last op was a delete.  Its per-epoch delta is extracted from the raw
  ops with one ``groupBy(pk, epoch)`` + per-pk ``lag`` window (identical
  +1/-1 pairs for no-op updates cancel, exactly as a recompute diff
  would).
- ``S`` (dim side) — "hot event types of the epoch": a type is present
  iff it drew >= 1/5 of the epoch's ops; its attribute is the per-mille
  share.  Presence flips across epochs, so the dim exercises both the
  insert AND delete delta paths.
- ``V = R join S`` on ``event_type`` — "users whose current state points
  at a currently-hot type".

The query applies the delta rule epoch by epoch (set-based: every epoch's
three delta-join terms are computed in one pass, no driver loop) and
emits, per epoch: the gross R/S delta sizes, the net view delta from the
delta RULE, the cumulative view size it implies, an independent
**recomputed** view size, and a convergence flag.  The DuckDB oracle
knows nothing of the delta rule — it recomputes the view per epoch and
diffs counts, so a hash match proves the incremental maintenance exact.

Scale shape: the only event-sized shuffle is ``groupBy(pk)`` (shared with
every capture lane); the dim side is bounded by types x epochs rows and
is broadcast into both asymmetric delta-join terms — the textbook IVM
cost model (|dR| x 1 lookup + |dS| x matching-fact rows), never a
recompute of V.  At 100 TB the recompute column is the audit you run
once; the delta rule is the steady-state path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from lets_talk_cdc_change_feed_playground_spark.operators.ops_feed import (
    OPS_SQL,
    ops_feed,
)
from lets_talk_cdc_change_feed_playground_spark.operators.shared import shared_df

#: Maintenance-batch width (ms): 5 days -> 6 epochs over the 30-day feed.
EPOCH_MS = 432_000_000

#: A type is "hot" in an epoch iff its op count * HOT_DEN >= epoch total.
HOT_DEN = 5


def cdc_ivm_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-rule maintenance of R join S vs per-epoch recompute."""
    ops = ops_feed(spark, sf_dir)
    t0 = ops.agg(F.min("t").alias("t0"))
    ops = ops.crossJoin(F.broadcast(t0)).withColumn(
        "epoch", F.expr(f"(t - t0) div {EPOCH_MS}")
    )

    # epoch chain: the ordered list of maintenance batches (tiny frame; the
    # single-partition window below runs over ~6 rows).  ``+0`` aliases mint
    # fresh attribute ids so the many small self-descended joins below stay
    # unambiguous.
    echain = (
        ops.select((F.col("epoch") + F.lit(0)).alias("be"))
        .distinct()
        .withColumn("pe", F.lag("be").over(W.orderBy("be")))
    )

    # ---- R deltas: per (pk, epoch) last op -> +1/-1 vs previous state ----
    r_epoch = ops.groupBy("pk", "epoch").agg(
        F.max_by(
            F.struct(
                (F.col("op") != "delete").alias("alive"),
                F.col("event_type").alias("et"),
                F.col("value").alias("val"),
            ),
            F.col("seq"),
        ).alias("st")
    )
    wpk = W.partitionBy("pk").orderBy("epoch")
    r_chain = r_epoch.withColumn("prev", F.lag("st").over(wpk))
    same = (
        F.col("prev").isNotNull()
        & F.col("prev.alive")
        & F.col("st.alive")
        & (F.col("prev.et") == F.col("st.et"))
        & F.col("prev.val").eqNullSafe(F.col("st.val"))
    )
    d_r = r_chain.filter(~same).select(
        "pk",
        "epoch",
        F.when(F.col("st.alive"), F.struct(F.lit(1).alias("w"), F.col("st.et").alias("et"), F.col("st.val").alias("val"))).alias("ins"),
        F.when(
            F.col("prev").isNotNull() & F.col("prev.alive"),
            F.struct(F.lit(-1).alias("w"), F.col("prev.et").alias("et"), F.col("prev.val").alias("val")),
        ).alias("del"),
    )
    d_r_plan = (
        d_r.select("pk", "epoch", F.explode(F.array("ins", "del")).alias("d"))
        .filter(F.col("d").isNotNull())
        .select("pk", "epoch", F.col("d.w").alias("w"), F.col("d.et").alias("et"), F.col("d.val").alias("val"))
    )
    # session-persisted via the shared registry: three consumers (term1,
    # term3, gross counters) would otherwise re-derive the per-(pk, epoch)
    # fold from the scan, and repeated invocations (bench reps) reuse ONE
    # cache entry instead of stacking a new persist per call
    d_r = shared_df(spark, ("ivm_d_r", sf_dir), lambda: d_r_plan)

    # R state versions with validity [epoch, next active epoch) — feeds the
    # R_old join dS term and the per-epoch recompute audit
    r_versions_plan = (
        r_chain.withColumn("valid_to", F.lead("epoch").over(wpk))
        .filter(F.col("st.alive"))
        .select("pk", F.col("epoch").alias("valid_from"), "valid_to", F.col("st.et").alias("et"))
    )
    # consumed by term2 and the recompute audit
    r_versions = shared_df(spark, ("ivm_r_versions", sf_dir), lambda: r_versions_plan)

    # ---- S state per (epoch, type), DENSE over the epoch x type grid ----
    type_counts = ops.groupBy("epoch", "event_type").agg(F.count("*").alias("cnt"))
    totals = type_counts.groupBy("epoch").agg(
        F.sum("cnt").alias("total")
    ).select((F.col("epoch") + F.lit(0)).alias("te"), "total")
    grid = (
        ops.select((F.col("epoch") + F.lit(0)).alias("sbe"))
        .distinct()
        .crossJoin(F.broadcast(ops.select(F.col("event_type").alias("et")).distinct()))
    )
    s_state = (
        grid.join(
            type_counts,
            (F.col("sbe") == type_counts.epoch) & (F.col("et") == type_counts.event_type),
            "left",
        )
        .drop("epoch", "event_type")
        .join(totals, F.col("sbe") == F.col("te"))
        .select(
            "sbe",
            "et",
            (F.coalesce(F.col("cnt"), F.lit(0)) * HOT_DEN >= F.col("total")).alias("present"),
            F.expr("coalesce(cnt, 0) * 1000 div total").alias("bucket"),
        )
    )
    # epochs x types rows; consumed by s_chain, s_asof and the audit's
    # hot set — shared-persisting avoids re-deriving from the ops scan thrice
    s_state_plan = s_state
    s_state = shared_df(spark, ("ivm_s_state", sf_dir), lambda: s_state_plan)
    wet = W.partitionBy("et").orderBy("sbe")
    s_chain = (
        s_state.withColumn("p_present", F.lag("present").over(wet))
        .withColumn("p_bucket", F.lag("bucket").over(wet))
    )
    s_same = (
        F.coalesce(F.col("p_present"), F.lit(False))
        & F.col("present")
        & (F.col("p_bucket") == F.col("bucket"))
    )
    d_s = (
        s_chain.filter(~s_same)
        .select(
            "sbe",
            "et",
            F.when(F.col("present"), F.struct(F.lit(1).alias("w"), F.col("bucket").alias("bucket"))).alias("ins"),
            F.when(F.coalesce(F.col("p_present"), F.lit(False)), F.struct(F.lit(-1).alias("w"), F.col("p_bucket").alias("bucket"))).alias("del"),
        )
        .select("sbe", "et", F.explode(F.array("ins", "del")).alias("d"))
        .filter(F.col("d").isNotNull())
        .select("sbe", "et", F.col("d.w").alias("w"), F.col("d.bucket").alias("bucket"))
    )
    # consumed by ds_prev/term3 and the gross counters
    d_s_plan = d_s
    d_s = shared_df(spark, ("ivm_d_s", sf_dir), lambda: d_s_plan)

    # S state as-of the PREVIOUS maintenance batch, per (echain epoch, type)
    s_asof = (
        echain.join(s_state.filter("present"), F.col("sbe") == F.col("pe"))
        .select("be", F.col("et").alias("aet"))
    )

    # ---- the three delta-rule terms (dim side always broadcast) ----
    ds_prev = (
        d_s.join(echain, F.col("sbe") == F.col("be"))
        .filter(F.col("pe").isNotNull())
        .select("be", "pe", F.col("et").alias("det"), "w")
    )
    term1 = d_r.join(
        F.broadcast(s_asof),
        (F.col("epoch") == F.col("be")) & (F.col("et") == F.col("aet")),
    ).select("epoch", "w")
    term2 = (
        r_versions.join(
            F.broadcast(ds_prev),
            (F.col("et") == F.col("det"))
            & (F.col("valid_from") <= F.col("pe"))
            & (F.col("valid_to").isNull() | (F.col("valid_to") > F.col("pe"))),
        )
        .select(F.col("be").alias("epoch"), "w")
    )
    term3 = (
        d_r.withColumnRenamed("w", "rw")
        .join(
            F.broadcast(d_s.withColumnRenamed("w", "sw").withColumnRenamed("et", "det")),
            (F.col("epoch") == F.col("sbe")) & (F.col("et") == F.col("det")),
        )
        .select("epoch", (F.col("rw") * F.col("sw")).alias("w"))
    )
    dv = (
        term1.unionByName(term2)
        .unionByName(term3)
        .groupBy("epoch")
        .agg(F.sum("w").alias("dv_net"))
    )

    # ---- independent recompute audit: |R_e join S_e| per epoch ----
    alive_counts = r_versions.groupBy(
        F.col("et").alias("ret"), "valid_from", "valid_to"
    ).agg(F.count("*").alias("n"))
    hot = s_state.filter("present").select("sbe", "et")
    direct = (
        alive_counts.join(
            F.broadcast(hot),
            (F.col("ret") == F.col("et"))
            & (F.col("valid_from") <= F.col("sbe"))
            & (F.col("valid_to").isNull() | (F.col("valid_to") > F.col("sbe"))),
        )
        .groupBy("sbe")
        .agg(F.sum("n").alias("view_rows_direct"))
    )

    gross_r = d_r.groupBy("epoch").agg(
        F.sum(F.when(F.col("w") == 1, 1).otherwise(0)).alias("d_r_ins"),
        F.sum(F.when(F.col("w") == -1, 1).otherwise(0)).alias("d_r_del"),
    )
    gross_s = d_s.groupBy("sbe").agg(
        F.sum(F.when(F.col("w") == 1, 1).otherwise(0)).alias("d_s_ins"),
        F.sum(F.when(F.col("w") == -1, 1).otherwise(0)).alias("d_s_del"),
    )

    out = (
        echain.select("be")
        .join(gross_r, F.col("be") == gross_r.epoch, "left")
        .drop("epoch")
        .join(gross_s, F.col("be") == gross_s.sbe, "left")
        .drop("sbe")
        .join(dv, F.col("be") == dv.epoch, "left")
        .drop("epoch")
        .join(direct, F.col("be") == direct.sbe, "left")
        .drop("sbe")
        .select(
            F.col("be").alias("epoch"),
            *[
                F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c)
                for c in ("d_r_ins", "d_r_del", "d_s_ins", "d_s_del", "dv_net")
            ],
            F.coalesce(F.col("view_rows_direct"), F.lit(0)).cast("long").alias("view_rows_direct"),
        )
        .withColumn(
            "view_rows",
            F.sum("dv_net").over(W.orderBy("epoch").rowsBetween(W.unboundedPreceding, 0)),
        )
        .withColumn("converged", F.col("view_rows") == F.col("view_rows_direct"))
        .select(
            "epoch", "d_r_ins", "d_r_del", "d_s_ins", "d_s_del",
            "dv_net", "view_rows", "view_rows_direct", "converged",
        )
        .orderBy("epoch")
    )
    return out


def _ivm_oracle() -> str:
    # The oracle never sees the delta rule: it recomputes R_e, S_e, and the
    # view per epoch and diffs neighbouring epochs.  Hash equality with the
    # Spark side therefore certifies the incremental path.
    return (
        "WITH "
        + OPS_SQL.strip().rstrip()
        + f""",
base AS (SELECT min(t) AS t0 FROM src),
ops AS (
  SELECT s.*, (s.t - b.t0) // {EPOCH_MS} AS epoch FROM src s, base b
),
echain AS (
  SELECT epoch, lag(epoch) OVER (ORDER BY epoch) AS pe
  FROM (SELECT DISTINCT epoch FROM ops)
),
r_state AS (
  SELECT e.epoch, o.pk,
         arg_max(o.op, o.seq) <> 'delete' AS alive,
         arg_max(o.event_type, o.seq) AS et,
         arg_max(o.value, o.seq) AS val
  FROM echain e JOIN ops o ON o.epoch <= e.epoch
  GROUP BY e.epoch, o.pk
),
r_alive AS (SELECT epoch, pk, et, val FROM r_state WHERE alive),
type_counts AS (
  SELECT epoch, event_type AS et, count(*) AS cnt FROM ops GROUP BY 1, 2
),
totals AS (SELECT epoch, sum(cnt) AS total FROM type_counts GROUP BY 1),
s_alive AS (
  SELECT g.epoch, g.et, COALESCE(c.cnt, 0) * 1000 // t.total AS bucket
  FROM (SELECT e.epoch, et FROM echain e, (SELECT DISTINCT event_type AS et FROM ops)) g
  LEFT JOIN type_counts c ON c.epoch = g.epoch AND c.et = g.et
  JOIN totals t ON t.epoch = g.epoch
  WHERE COALESCE(c.cnt, 0) * {HOT_DEN} >= t.total
),
view_e AS (
  SELECT r.epoch, count(*) AS n
  FROM r_alive r JOIN s_alive s ON s.epoch = r.epoch AND s.et = r.et
  GROUP BY r.epoch
),
d_r_ins_t AS (
  SELECT e.epoch, count(*) AS n
  FROM echain e
  JOIN r_alive c ON c.epoch = e.epoch
  LEFT JOIN r_alive p ON p.epoch = e.pe AND p.pk = c.pk
       AND p.et = c.et AND p.val IS NOT DISTINCT FROM c.val
  WHERE p.pk IS NULL
  GROUP BY e.epoch
),
d_r_del_t AS (
  SELECT e.epoch, count(*) AS n
  FROM echain e
  JOIN r_alive p ON p.epoch = e.pe
  LEFT JOIN r_alive c ON c.epoch = e.epoch AND c.pk = p.pk
       AND c.et = p.et AND c.val IS NOT DISTINCT FROM p.val
  WHERE c.pk IS NULL
  GROUP BY e.epoch
),
d_s_ins_t AS (
  SELECT e.epoch, count(*) AS n
  FROM echain e
  JOIN s_alive c ON c.epoch = e.epoch
  LEFT JOIN s_alive p ON p.epoch = e.pe AND p.et = c.et AND p.bucket = c.bucket
  WHERE p.et IS NULL
  GROUP BY e.epoch
),
d_s_del_t AS (
  SELECT e.epoch, count(*) AS n
  FROM echain e
  JOIN s_alive p ON p.epoch = e.pe
  LEFT JOIN s_alive c ON c.epoch = e.epoch AND c.et = p.et AND c.bucket = p.bucket
  WHERE c.et IS NULL
  GROUP BY e.epoch
)
SELECT e.epoch,
       CAST(COALESCE(ri.n, 0) AS BIGINT) AS d_r_ins,
       CAST(COALESCE(rd.n, 0) AS BIGINT) AS d_r_del,
       CAST(COALESCE(si.n, 0) AS BIGINT) AS d_s_ins,
       CAST(COALESCE(sd.n, 0) AS BIGINT) AS d_s_del,
       CAST(COALESCE(v.n, 0) - COALESCE(vp.n, 0) AS BIGINT) AS dv_net,
       CAST(COALESCE(v.n, 0) AS BIGINT) AS view_rows,
       CAST(COALESCE(v.n, 0) AS BIGINT) AS view_rows_direct,
       TRUE AS converged
FROM echain e
LEFT JOIN d_r_ins_t ri ON ri.epoch = e.epoch
LEFT JOIN d_r_del_t rd ON rd.epoch = e.epoch
LEFT JOIN d_s_ins_t si ON si.epoch = e.epoch
LEFT JOIN d_s_del_t sd ON sd.epoch = e.epoch
LEFT JOIN view_e v ON v.epoch = e.epoch
LEFT JOIN view_e vp ON vp.epoch = e.pe
ORDER BY e.epoch
"""
    )


QUERIES = {"cdc_ivm_join": cdc_ivm_join}
ORACLE = {"cdc_ivm_join": _ivm_oracle()}
