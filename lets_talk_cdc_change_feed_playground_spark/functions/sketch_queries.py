"""Mergeable-sketch suite: the summaries a 100 TB fleet actually ships.

At cluster scale you rarely move raw rows to answer "how many distinct",
"what's p95", "who are the heavy hitters" — you compute a small *mergeable
summary* per shard (per file, per partition, per day), union the summaries,
and answer from the merged sketch.  The reference's metrics layer keeps
bounded in-memory summaries for exactly this reason (its 2000-sample lag
buffer, `src/engine/metrics.ts:42-44`); these queries are the distributed,
shard-mergeable generalisation.

Every sketch here is **deterministic** (the reference's 31-multiplier string
hash widened to a 2^31-1 modulus, never ``rand()``) and built from exact
integer arithmetic, so each query has a value-exact DuckDB oracle twin:

- ``events_kmv_distinct``   — K-Minimum-Values distinct sketch per day-shard
  + the *merged* global sketch (union of the per-shard K-mins — the global
  K smallest hashes are each among their shard's K smallest, so merging
  sketches is lossless).  Estimate = (K-1)·P // kth_min when the sketch is
  full, the exact seen-hash count when not.
- ``events_hist_quantiles`` — fixed-bin histogram per event_type; p50/p95/p99
  read off the cumulative bin counts (ceil-rank rule).  Histograms merge by
  adding bin counts; the cumulative window runs over ≤ ~50 bin rows per
  type, never per event row.
- ``lineitem_heavy_hitters`` — SpaceSaving-style mergeable top-k: each shard
  keeps its local top-``SS_KEEP`` part keys plus its largest *dropped* count
  (the error bound).  Merging sums the kept counts (a lower bound) and adds
  each absent shard's dropped-max to form the upper bound — the classic
  mergeable-summaries guarantee (Agarwal et al., PODS'12).

Scale shape: one shuffle on (shard, key) for the per-shard summaries; the
merge operates on sketch rows only (K·shards, bins·types, KEEP·shards), all
broadcastable at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from lets_talk_cdc_change_feed_playground_spark.operators.ops_feed import hash31
from lets_talk_cdc_change_feed_playground_spark.sources.testdata import load_events, load_table

KMV_K = 24  # minima kept per sketch
KMV_P = 2_147_483_647  # hash modulus (2^31 - 1): wide, overflow-safe in BIGINT
DAY_MS = 86_400_000

HIST_BIN = 10  # value-histogram bin width
HIST_QS = (50, 95, 99)

SS_SHARDS = 8  # heavy-hitter summary shards (l_orderkey % SS_SHARDS)
SS_KEEP = 64  # keys kept per shard summary
HH_TOP = 20  # merged heavy hitters reported


def _kmv_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    return ev.select(
        F.expr(f"(unix_micros(cast(ts as timestamp)) div 1000) div {DAY_MS}").alias("day"),
        hash31(
            F.concat(F.col("user_id").cast("string"), F.lit(":"), F.col("event_type")),
            mod=KMV_P,
        ).alias("h"),
    )


def events_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-count sketch of (user_id, event_type) per day + merged.

    Per day-shard: the K smallest distinct hash values.  The global row
    (day = -1) is built **from the shard sketches only** — the union of the
    per-day K-mins provably contains the global K-mins, so the merge is
    exact.  ``est_distinct`` uses pure integer arithmetic: (K-1)·P // kth
    when the sketch saturated, else the seen-hash count."""
    keyed = _kmv_keyed(spark, sf_dir)
    day_h = keyed.groupBy("day", "h").agg(F.count(F.lit(1)).alias("_n")).drop("_n")
    rk = W.partitionBy("day").orderBy("h")
    shard_sketch = (
        day_h.withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") <= KMV_K)
        .drop("rk")
    )
    # Merge: distinct hashes across shard sketches, keep the K smallest.
    # The sketch union is tiny (K rows per shard) — the unpartitioned
    # window runs over sketch rows, not data rows.
    merged = (
        shard_sketch.select("h")
        .distinct()
        .withColumn("rk", F.row_number().over(W.orderBy("h")))
        .filter(F.col("rk") <= KMV_K)
        .select(F.lit(-1).cast("long").alias("day"), "h")
    )
    union = shard_sketch.select("day", "h").unionByName(merged)
    est = union.groupBy("day").agg(
        F.count(F.lit(1)).alias("kmv_n"),
        F.max("h").alias("kth_min"),
    )
    return est.select(
        "day",
        "kmv_n",
        "kth_min",
        F.when(
            F.col("kmv_n") >= KMV_K,
            F.expr(f"{(KMV_K - 1) * KMV_P}L div kth_min"),
        )
        .otherwise(F.col("kmv_n").cast("long"))
        .alias("est_distinct"),
    ).orderBy("day")


# BIGINT-safe DuckDB twin of hash31 at the wide modulus (the shared
# hash31_sql accumulates in INT32, which overflows once acc*31 can pass 2^31).
_WIDE_HASH_SQL = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), [CAST(ascii(c) AS BIGINT) "
    "for c in string_split(CAST(user_id AS VARCHAR) || ':' || event_type, '')]), "
    f"(a, c) -> (a*31 + c) % {KMV_P})"
)

_KMV_SQL = f"""
WITH keyed AS (
  SELECT epoch_ms(ts) // {DAY_MS} AS day,
         {_WIDE_HASH_SQL} AS h
  FROM events
),
day_h AS (SELECT DISTINCT day, h FROM keyed),
shard_sketch AS (
  SELECT day, h FROM (
    SELECT day, h, row_number() OVER (PARTITION BY day ORDER BY h) AS rk FROM day_h
  ) WHERE rk <= {KMV_K}
),
merged AS (
  SELECT CAST(-1 AS BIGINT) AS day, h FROM (
    SELECT h, row_number() OVER (ORDER BY h) AS rk
    FROM (SELECT DISTINCT h FROM shard_sketch)
  ) WHERE rk <= {KMV_K}
),
un AS (SELECT day, h FROM shard_sketch UNION ALL SELECT day, h FROM merged)
SELECT day, count(*) AS kmv_n, max(h) AS kth_min,
       CAST(CASE WHEN count(*) >= {KMV_K}
                 THEN {(KMV_K - 1) * KMV_P} // max(h)
                 ELSE count(*) END AS BIGINT) AS est_distinct
FROM un GROUP BY day ORDER BY day
"""


def events_hist_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-sketch quantiles of ``value`` per event_type.

    The per-(type, bin) counts are the mergeable summary (histograms merge by
    addition); p50/p95/p99 are the lower edge of the first bin whose
    cumulative count reaches ``ceil(q·n/100)`` — exact integer rank rule, and
    the cumulative window scans bin rows (≤ ~50 per type), never events."""
    ev = load_events(spark, sf_dir)
    bins = ev.groupBy(
        "event_type",
        F.expr(f"cast(floor(value / {HIST_BIN}) as bigint)").alias("bin"),
    ).agg(F.count(F.lit(1)).alias("bin_n"))
    cum = bins.withColumn(
        "cum_n",
        F.sum("bin_n").over(
            W.partitionBy("event_type").orderBy("bin").rowsBetween(W.unboundedPreceding, 0)
        ),
    ).withColumn("n", F.sum("bin_n").over(W.partitionBy("event_type")))
    qcols = [
        F.min(
            F.when(
                F.col("cum_n") * 100 >= F.col("n") * q, F.col("bin") * HIST_BIN
            )
        ).alias(f"p{q}_lo")
        for q in HIST_QS
    ]
    return (
        cum.groupBy("event_type")
        .agg(F.max("n").alias("n"), F.count(F.lit(1)).alias("n_bins"), *qcols)
        .orderBy("event_type")
    )


_HIST_QCOLS = ",\n       ".join(
    f"min(CASE WHEN cum_n * 100 >= n * {q} THEN bin * {HIST_BIN} END) AS p{q}_lo"
    for q in HIST_QS
)
_HIST_SQL = f"""
WITH bins AS (
  SELECT event_type, CAST(floor(value / {HIST_BIN}) AS BIGINT) AS bin, count(*) AS bin_n
  FROM events GROUP BY 1, 2
),
cum AS (
  SELECT event_type, bin, bin_n,
         sum(bin_n) OVER (PARTITION BY event_type ORDER BY bin
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n,
         sum(bin_n) OVER (PARTITION BY event_type) AS n
  FROM bins
)
SELECT event_type, CAST(max(n) AS BIGINT) AS n, count(*) AS n_bins,
       {_HIST_QCOLS}
FROM cum GROUP BY event_type ORDER BY event_type
"""


def lineitem_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable heavy-hitter summaries over lineitem part keys.

    Each of ``SS_SHARDS`` shards (l_orderkey % shards — the natural "one
    summary per data partition" layout) keeps its local top-``SS_KEEP`` keys
    by count plus the largest count it *dropped*.  The merge sums kept counts
    (``lo`` — guaranteed undercount) and, for every shard where the key was
    not kept, adds that shard's dropped-max (``hi`` — guaranteed overcount):
    the standard mergeable-summary bound.  Reports the merged top-``HH_TOP``
    by ``lo`` with both bounds so the consumer sees the error interval.

    Execution shape (r09): ONE scan+aggregation pass builds the per-shard
    summaries; the dropped-max is the count at rank ``SS_KEEP``+1 (counts
    are rank-ordered, so the first dropped row carries the max dropped
    count) read by a second window over the SAME shard partitioning — no
    re-aggregation, no join back.  The r08 form planned the scan+groupBy+
    rank subtree three times (kept branch, dropped-max branch, error total).
    The kept summary (≤ shards × (keep+1) rows — sketch-sized by
    construction) is session-staged like the other summary frames; the
    merge and report stay per-call work."""
    from lets_talk_cdc_change_feed_playground_spark.operators.shared import shared_df

    def build() -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem")
        per_shard = li.groupBy(
            (F.col("l_orderkey") % SS_SHARDS).alias("shard"), "l_partkey"
        ).agg(F.count(F.lit(1)).alias("cnt"))
        rk = W.partitionBy("shard").orderBy(F.desc("cnt"), "l_partkey")
        wsh = W.partitionBy("shard")
        return (
            per_shard.withColumn("rk", F.row_number().over(rk))
            .withColumn(
                "dmax",
                F.max(F.when(F.col("rk") == SS_KEEP + 1, F.col("cnt"))).over(wsh),
            )
            .filter(F.col("rk") <= SS_KEEP)
            .select("shard", "l_partkey", "cnt", "dmax")
        )

    kept = shared_df(spark, ("hh_kept", sf_dir), build)
    # err_total = sum over shards of dropped-max; a key's hi bound adds the
    # dropped-max of every shard that did NOT keep it: hi = lo + err_total -
    # sum(dmax of shards that kept it).  Sketch-sized frames throughout.
    err_total = (
        kept.groupBy("shard")
        .agg(F.first("dmax").alias("dmax"))
        .agg(F.sum("dmax").alias("err_total"))
    )
    merged = (
        kept.groupBy("l_partkey")
        .agg(
            F.sum("cnt").alias("lo"),
            F.count(F.lit(1)).alias("n_shards_kept"),
            F.sum(F.coalesce("dmax", F.lit(0))).alias("kept_dmax"),
        )
        .crossJoin(F.broadcast(err_total))
        .select(
            "l_partkey",
            "lo",
            "n_shards_kept",
            (F.col("lo") + F.coalesce(F.col("err_total"), F.lit(0)) - F.col("kept_dmax")).alias("hi"),
        )
    )
    return (
        merged.orderBy(F.desc("lo"), "l_partkey")
        .limit(HH_TOP)
        .withColumn("rank", F.row_number().over(W.orderBy(F.desc("lo"), "l_partkey")))
        .select("rank", "l_partkey", "lo", "hi", "n_shards_kept")
    )


_HH_SQL = f"""
WITH per_shard AS (
  SELECT l_orderkey % {SS_SHARDS} AS shard, l_partkey, count(*) AS cnt
  FROM lineitem GROUP BY 1, 2
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY shard ORDER BY cnt DESC, l_partkey) AS rk
  FROM per_shard
),
kept AS (SELECT shard, l_partkey, cnt FROM ranked WHERE rk <= {SS_KEEP}),
dropped_max AS (SELECT shard, max(cnt) AS dmax FROM ranked WHERE rk > {SS_KEEP} GROUP BY shard),
err AS (SELECT coalesce(sum(dmax), 0) AS err_total FROM dropped_max),
merged AS (
  SELECT k.l_partkey, sum(k.cnt) AS lo, count(*) AS n_shards_kept,
         sum(coalesce(d.dmax, 0)) AS kept_dmax
  FROM kept k LEFT JOIN dropped_max d ON k.shard = d.shard
  GROUP BY k.l_partkey
),
top AS (
  SELECT l_partkey, lo, n_shards_kept, lo + e.err_total - kept_dmax AS hi
  FROM merged, err e
  ORDER BY lo DESC, l_partkey LIMIT {HH_TOP}
)
SELECT CAST(row_number() OVER (ORDER BY lo DESC, l_partkey) AS INT) AS rank,
       l_partkey, CAST(lo AS BIGINT) AS lo, CAST(hi AS BIGINT) AS hi, n_shards_kept
FROM top ORDER BY rank
"""


QUERIES = {
    "events_kmv_distinct": events_kmv_distinct,
    "events_hist_quantiles": events_hist_quantiles,
    "lineitem_heavy_hitters": lineitem_heavy_hitters,
}

ORACLE = {
    "events_kmv_distinct": _KMV_SQL,
    "events_hist_quantiles": _HIST_SQL,
    "lineitem_heavy_hitters": _HH_SQL,
}


# ---------------------------------------------------------------------------
# Count-Min sketch (point-frequency estimates from mergeable counters)
# ---------------------------------------------------------------------------

CMS_D = 4  # hash rows (depth)
CMS_W = 64  # counters per row (width)
CMS_QUERY_KEYS = 10  # heaviest users whose estimates we audit


def _cms_buckets(col, prefix_d: int):
    """Row ``prefix_d``'s counter index for a key: wide 31-hash of
    ``"<d>:<key>"`` folded into ``CMS_W`` buckets."""
    return (
        hash31(F.concat(F.lit(f"{prefix_d}:"), col), mod=KMV_P) % CMS_W
    ).cast("long")


def events_cms_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch over per-user event counts: build ``CMS_D``×``CMS_W``
    counters per day-shard, merge shards by summing counters (CMS rows are
    sums, so the merge is exact by construction — the mergeable-summaries
    property), then answer point queries for the heaviest users and audit
    the classic guarantee: estimate >= true count, overshoot bounded by
    colliding mass.

    Scale shape: the sketch build is one map-side-combinable groupBy on
    (day, d, bucket) — the shuffle carries at most days×D×W counter rows,
    not events; the merged sketch (D×W rows) broadcasts to the query join
    at any corpus size."""
    ev = load_events(spark, sf_dir)
    keyed = ev.select(
        F.expr(f"(unix_micros(cast(ts as timestamp)) div 1000) div {DAY_MS}").alias(
            "day"
        ),
        F.col("user_id").cast("string").alias("k"),
        F.col("user_id").alias("user_id"),
    )
    rows = keyed.select(
        "day",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"), _cms_buckets(F.col("k"), d).alias("b")
                    )
                    for d in range(CMS_D)
                ]
            )
        ).alias("s"),
    ).select("day", F.col("s.d").alias("d"), F.col("s.b").alias("b"))
    shard_cms = rows.groupBy("day", "d", "b").agg(F.count(F.lit(1)).alias("c"))
    merged_cms = shard_cms.groupBy("d", "b").agg(F.sum("c").alias("c"))
    true_counts = keyed.groupBy("user_id", "k").agg(
        F.count(F.lit(1)).alias("true_count")
    )
    queried = true_counts.orderBy(F.desc("true_count"), F.asc("user_id")).limit(
        CMS_QUERY_KEYS
    )
    qb = queried.select(
        "user_id",
        "true_count",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"), _cms_buckets(F.col("k"), d).alias("b")
                    )
                    for d in range(CMS_D)
                ]
            )
        ).alias("s"),
    ).select("user_id", "true_count", F.col("s.d").alias("d"), F.col("s.b").alias("b"))
    est = (
        qb.join(F.broadcast(merged_cms), ["d", "b"])
        .groupBy("user_id", "true_count")
        .agg(F.min("c").alias("cms_est"))
    )
    return est.select(
        "user_id",
        "true_count",
        "cms_est",
        (F.col("cms_est") - F.col("true_count")).alias("overcount"),
        (F.col("cms_est") >= F.col("true_count")).alias("bound_ok"),
    ).orderBy(F.desc("true_count"), F.asc("user_id"))


QUERIES["events_cms_counts"] = events_cms_counts


def _cms_hash_sql(dexpr: str) -> str:
    return (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), [CAST(ascii(c) AS BIGINT) "
        f"for c in string_split({dexpr} || ':' || CAST(user_id AS VARCHAR), '')]), "
        f"(a, c) -> (a*31 + c) % {KMV_P}) % {CMS_W}"
    )


ORACLE["events_cms_counts"] = f"""
WITH keyed AS (
  SELECT epoch_ms(ts) // {DAY_MS} AS day, user_id FROM events
),
rows_ AS (
  SELECT day, g.d AS d, {_cms_hash_sql("CAST(g.d AS VARCHAR)")} AS b
  FROM keyed, generate_series(0, {CMS_D - 1}) g(d)
),
shard_cms AS (SELECT day, d, b, count(*) AS c FROM rows_ GROUP BY 1, 2, 3),
merged_cms AS (SELECT d, b, CAST(sum(c) AS BIGINT) AS c FROM shard_cms GROUP BY 1, 2),
true_counts AS (SELECT user_id, count(*) AS true_count FROM keyed GROUP BY 1),
queried AS (
  SELECT user_id, true_count FROM true_counts
  ORDER BY true_count DESC, user_id ASC LIMIT {CMS_QUERY_KEYS}
),
qb AS (
  SELECT user_id, true_count, g.d AS d, {_cms_hash_sql("CAST(g.d AS VARCHAR)")} AS b
  FROM queried, generate_series(0, {CMS_D - 1}) g(d)
),
est AS (
  SELECT qb.user_id, qb.true_count, min(m.c) AS cms_est
  FROM qb JOIN merged_cms m ON qb.d = m.d AND qb.b = m.b
  GROUP BY 1, 2
)
SELECT user_id, true_count, cms_est,
       cms_est - true_count AS overcount,
       cms_est >= true_count AS bound_ok
FROM est
ORDER BY true_count DESC, user_id ASC
"""


# ---------------------------------------------------------------------------
# ANALYZE-style mergeable column statistics
# ---------------------------------------------------------------------------

STATS_SHARDS = 8  # per-shard summaries (l_orderkey % STATS_SHARDS)


def lineitem_shard_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable per-shard column statistics + lossless merge — the ANALYZE
    TABLE path: each shard ships (count, min, max, Σx, Σx²) for quantity and
    price; the global row (shard = -1) is computed **from the shard
    summaries only** and must equal the direct full-table aggregation,
    proven in-query (``merge_ok``).  This is what a 1000-executor ANALYZE
    actually does: per-file-group moments, merged on the driver — raw rows
    never move.

    Exactness: prices are DECIMAL(18,2) (Σ and Σx² accumulate in decimal —
    partition-order independent); the population-variance numerator
    ``n·Σx² − (Σx)²`` and the variance in micro-units use integer
    arithmetic with one division at the very end, identical in both
    engines.
    """
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.min("qty").alias("qty_min"),
        F.max("qty").alias("qty_max"),
        F.sum("qty").cast("decimal(38,2)").alias("qty_sum"),
        F.min("price").alias("price_min"),
        F.max("price").alias("price_max"),
        F.sum("price").cast("decimal(38,2)").alias("price_sum"),
        F.sum(F.expr("price * price")).cast("decimal(38,4)").alias("price_sumsq"),
    ]
    # ONE pass: ROLLUP computes the 8 per-shard summaries AND the direct
    # full-table row (grouping-set ()) from the raw rows in a single
    # scan+aggregation — the direct row is still aggregated from raw rows
    # (via Expand), not from the summaries, so the merge audit below keeps
    # auditing a genuinely independent aggregation.  The r08 form planned
    # the scaled lineitem scan three times (shard branch ×2, direct).  The
    # 9-row result is session-staged like the other summary frames.
    from lets_talk_cdc_change_feed_playground_spark.operators.shared import shared_df

    def build() -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem").select(
            F.expr(f"l_orderkey % {STATS_SHARDS}").alias("shard"),
            F.col("l_quantity").cast("decimal(18,2)").alias("qty"),
            F.col("l_extendedprice").cast("decimal(18,2)").alias("price"),
        )
        return li.rollup("shard").agg(*aggs, F.grouping_id().alias("_g"))

    rolled = shared_df(spark, ("li_shard_rollup", sf_dir), build)
    # The rest is arithmetic over ≤ STATS_SHARDS+1 summary rows — assemble
    # driver-side into one LocalRelation (the cdc_verdict/dq_scorecard
    # pattern: bounded by the shard count, never by data) instead of a
    # 6-branch union+audit plan that cost 8 AQE jobs per run.
    import decimal

    from lets_talk_cdc_change_feed_playground_spark.operators.shared import local_df

    rows = rolled.collect()
    shard_rows = sorted((r for r in rows if r["_g"] == 0), key=lambda r: r["shard"])
    direct_row = next(r for r in rows if r["_g"] == 1)

    fields = ("n", "qty_min", "qty_max", "qty_sum",
              "price_min", "price_max", "price_sum", "price_sumsq")
    with decimal.localcontext() as ctx:
        ctx.prec = 60  # exact decimal merge arithmetic (values ≪ 38 digits)
        # Merge of the shard summaries: the whole point — count/min/max/sums
        # compose losslessly, so the merged row is built from the 8 rows.
        merged = {
            "n": sum(r["n"] for r in shard_rows),
            "qty_min": min(r["qty_min"] for r in shard_rows),
            "qty_max": max(r["qty_max"] for r in shard_rows),
            "qty_sum": sum((r["qty_sum"] for r in shard_rows), decimal.Decimal(0)),
            "price_min": min(r["price_min"] for r in shard_rows),
            "price_max": max(r["price_max"] for r in shard_rows),
            "price_sum": sum((r["price_sum"] for r in shard_rows), decimal.Decimal(0)),
            "price_sumsq": sum(
                (r["price_sumsq"] for r in shard_rows), decimal.Decimal(0)
            ),
        }
        # audit: the merged row must equal the direct (raw-row) aggregation
        # field-for-field — numeric equality, same as count_distinct(struct)
        merge_ok = all(merged[f] == direct_row[f] for f in fields)

        def var_micro(n: int, price_sum, price_sumsq) -> int:
            # (n·Σx²·1e4 − (Σx·1e2)²)·1e6 div (1e4·n²) in exact integers —
            # numerator ≥ 0 (Cauchy-Schwarz), so // equals SQL's
            # truncate-toward-zero div
            a = int(price_sumsq * 10000)  # scale-4 decimal → exact int
            b = int(price_sum * 100)  # scale-2 decimal → exact int
            return (1000000 * (n * a - b * b)) // (10000 * n * n)

        out_rows = [
            (
                int(r["shard"]), int(r["n"]),
                float(r["qty_min"]), float(r["qty_max"]), str(r["qty_sum"]),
                float(r["price_min"]), float(r["price_max"]), str(r["price_sum"]),
                var_micro(int(r["n"]), r["price_sum"], r["price_sumsq"]),
                merge_ok,
            )
            for r in shard_rows
        ] + [
            (
                -1, int(merged["n"]),
                float(merged["qty_min"]), float(merged["qty_max"]), str(merged["qty_sum"]),
                float(merged["price_min"]), float(merged["price_max"]), str(merged["price_sum"]),
                var_micro(int(merged["n"]), merged["price_sum"], merged["price_sumsq"]),
                merge_ok,
            )
        ]
    return local_df(
        spark,
        out_rows,
        "shard long, n long, qty_min double, qty_max double, qty_sum string,"
        " price_min double, price_max double, price_sum string,"
        " price_var_micro long, merge_ok boolean",
    ).orderBy("shard")


ORACLE["lineitem_shard_stats"] = f"""
WITH li AS (
  SELECT l_orderkey % {STATS_SHARDS} AS shard,
         CAST(l_quantity AS DECIMAL(18,2)) AS qty,
         CAST(l_extendedprice AS DECIMAL(18,2)) AS price
  FROM lineitem
),
shard AS (
  SELECT shard, count(*) AS n,
         min(qty) AS qty_min, max(qty) AS qty_max,
         CAST(sum(qty) AS DECIMAL(38,2)) AS qty_sum,
         min(price) AS price_min, max(price) AS price_max,
         CAST(sum(price) AS DECIMAL(38,2)) AS price_sum,
         CAST(sum(price * price) AS DECIMAL(38,4)) AS price_sumsq
  FROM li GROUP BY shard
),
merged AS (
  SELECT CAST(-1 AS BIGINT) AS shard, sum(n) AS n,
         min(qty_min) AS qty_min, max(qty_max) AS qty_max,
         CAST(sum(qty_sum) AS DECIMAL(38,2)) AS qty_sum,
         min(price_min) AS price_min, max(price_max) AS price_max,
         CAST(sum(price_sum) AS DECIMAL(38,2)) AS price_sum,
         CAST(sum(price_sumsq) AS DECIMAL(38,4)) AS price_sumsq
  FROM shard
),
direct AS (
  SELECT CAST(-2 AS BIGINT) AS shard, count(*) AS n,
         min(qty) AS qty_min, max(qty) AS qty_max,
         CAST(sum(qty) AS DECIMAL(38,2)) AS qty_sum,
         min(price) AS price_min, max(price) AS price_max,
         CAST(sum(price) AS DECIMAL(38,2)) AS price_sum,
         CAST(sum(price * price) AS DECIMAL(38,4)) AS price_sumsq
  FROM li
),
audit AS (
  SELECT count(DISTINCT (n, qty_min, qty_max, qty_sum,
                         price_min, price_max, price_sum, price_sumsq)) = 1
           AS merge_ok
  FROM (SELECT * FROM merged UNION ALL SELECT * FROM direct)
),
rows_ AS (
  SELECT CAST(shard AS BIGINT) AS shard, n, qty_min, qty_max, qty_sum,
         price_min, price_max, price_sum, price_sumsq
  FROM shard
  UNION ALL
  SELECT shard, n, qty_min, qty_max, qty_sum,
         price_min, price_max, price_sum, price_sumsq
  FROM merged
)
SELECT r.shard, CAST(r.n AS BIGINT) AS n,
       CAST(r.qty_min AS DOUBLE) AS qty_min,
       CAST(r.qty_max AS DOUBLE) AS qty_max,
       CAST(r.qty_sum AS VARCHAR) AS qty_sum,
       CAST(r.price_min AS DOUBLE) AS price_min,
       CAST(r.price_max AS DOUBLE) AS price_max,
       CAST(r.price_sum AS VARCHAR) AS price_sum,
       CAST((1000000 * (r.n * CAST(r.price_sumsq * 10000 AS HUGEINT)
              - CAST(r.price_sum * 100 AS HUGEINT) * CAST(r.price_sum * 100 AS HUGEINT)))
            // (CAST(10000 AS HUGEINT) * r.n * r.n) AS BIGINT) AS price_var_micro,
       a.merge_ok
FROM rows_ r CROSS JOIN audit a
ORDER BY shard
"""

QUERIES["lineitem_shard_stats"] = lineitem_shard_stats


# ---------------------------------------------------------------------------
# Theta-sketch set operations (KMV union / intersection estimates)
# ---------------------------------------------------------------------------

THETA_K = 64  # minima kept per population sketch
THETA_MIX = 2654435761  # Knuth 2^32/phi multiplier (re-mix finisher)
THETA_BKTS = 16  # two-phase K-min buckets (no data-sized global window)


def events_theta_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operation cardinality estimates from mergeable KMV/theta sketches.

    Populations: A = (user, day) pairs with a ``click`` that day, B = same
    for ``purchase``.  Each population ships only its ``THETA_K`` smallest
    distinct hashes; union cardinality comes from the merged sketch's k-th
    minimum and intersection from the theta rule — matching hashes below
    the union threshold, scaled by 1/θ (Dasgupta et al., the DataSketches
    theta sketch).  Exact counts computed alongside audit the estimates —
    at 100 TB only the two 64-row sketches move, the exact twin is the
    full shuffle you are avoiding.

    Determinism: the reference's 31-multiplier hash at the wide 2³¹-1
    modulus, exact integer estimate arithmetic — value-identical on both
    engines (no float, no RNG)."""
    ev = load_events(spark, sf_dir)
    from lets_talk_cdc_change_feed_playground_spark.operators.shared import shared_df

    # ONE heavy pass over events (guide §2.4): groupBy(h) with per-side
    # presence flags replaces distinct((side, h)) — the same shuffle count
    # but every downstream branch (per-side sketches, union sketch,
    # intersection, exact audit) now derives from this one-row-per-hash
    # frame.  Staged per session because AQE runs each broadcast build as
    # its own job, where exchange reuse never applies — unstaged, the
    # events scan + hash re-executed once per broadcast branch (measured:
    # six ~10 s stages per run at sf0.1, all recomputing this subtree).
    def build_g() -> DataFrame:
        return (
            ev.filter(F.col("event_type").isin("click", "purchase"))
            .select(
                F.when(F.col("event_type") == "click", "A").otherwise("B").alias("side"),
                (
                    hash31(
                        F.concat(
                            F.col("user_id").cast("string"),
                            F.lit(":"),
                            F.expr(f"(unix_micros(cast(ts as timestamp)) div 1000) div {DAY_MS}").cast("string"),
                        ),
                        mod=KMV_P,
                    )
                    # Knuth multiplicative finisher: the bare 31-fold is
                    # locally arithmetic (near-identical strings ->
                    # near-identical hashes), which skews K-min densities;
                    # one multiply re-mixes it.  Exact integer, identical
                    # in both engines.
                    * THETA_MIX
                    % KMV_P
                ).alias("h"),
            )
            .groupBy("h")
            .agg(
                F.max(F.when(F.col("side") == "A", 1).otherwise(0)).alias("inA"),
                F.max(F.when(F.col("side") == "B", 1).otherwise(0)).alias("inB"),
            )
        )

    g = shared_df(spark, ("theta_g", sf_dir), build_g)
    # melt the flags back to the distinct (side, h) element set — row-local
    # over the cached frame, value-identical to distinct((side, h))
    elems = g.select(
        "h",
        F.explode(
            F.expr(
                "filter(array(CASE WHEN inA = 1 THEN 'A' END,"
                " CASE WHEN inB = 1 THEN 'B' END), x -> x IS NOT NULL)"
            )
        ).alias("side"),
    ).select("side", "h")
    # two-phase per-side K smallest: per-bucket rank, then rank over <= BKTS*K survivors
    b = elems.withColumn("bkt", F.col("h") % THETA_BKTS)
    w1 = W.partitionBy("side", "bkt").orderBy("h")
    w2 = W.partitionBy("side").orderBy("h")
    sk = (
        b.withColumn("r1", F.row_number().over(w1))
        .filter(F.col("r1") <= THETA_K)
        .withColumn("r2", F.row_number().over(w2))
        .filter(F.col("r2") <= THETA_K)
        .select("side", "h")
    )
    side_stats = sk.groupBy("side").agg(
        F.count(F.lit(1)).alias("sk_n"), F.max("h").alias("kth")
    )
    # union sketch: K smallest of the merged (<= 2K rows) sketch union
    u = (
        sk.select("h")
        .distinct()
        .withColumn("r", F.row_number().over(W.orderBy("h")))
        .filter(F.col("r") <= THETA_K)
    )
    u_stats = u.agg(F.count(F.lit(1)).alias("u_n"), F.max("h").alias("kth_u"))
    inter = (
        sk.groupBy("h")
        .agg(F.count(F.lit(1)).alias("sides"))
        .filter(F.col("sides") == 2)
        .crossJoin(F.broadcast(u_stats))
        .filter(F.col("h") < F.col("kth_u"))
        .agg(F.count(F.lit(1)).alias("n_match"))
    )
    exact = (
        g.agg(
            F.sum("inA").cast("long").alias("na_exact"),
            F.sum("inB").cast("long").alias("nb_exact"),
            F.count(F.lit(1)).cast("long").alias("union_exact"),
            F.sum(F.expr("inA * inB")).cast("long").alias("inter_exact"),
        )
    )
    a_stats = side_stats.filter(F.col("side") == "A").select(
        F.col("sk_n").alias("a_n"), F.col("kth").alias("kth_a")
    )
    b_stats = side_stats.filter(F.col("side") == "B").select(
        F.col("sk_n").alias("b_n"), F.col("kth").alias("kth_b")
    )
    est = (
        exact.crossJoin(F.broadcast(a_stats))
        .crossJoin(F.broadcast(b_stats))
        .crossJoin(F.broadcast(u_stats))
        .crossJoin(F.broadcast(inter))
    )
    K, P = THETA_K, KMV_P
    return est.select(
        F.lit(K).cast("long").alias("k"),
        "na_exact",
        "nb_exact",
        "union_exact",
        "inter_exact",
        F.expr(f"CASE WHEN a_n >= {K} THEN {(K - 1) * P}L div kth_a ELSE a_n END").alias("est_a"),
        F.expr(f"CASE WHEN b_n >= {K} THEN {(K - 1) * P}L div kth_b ELSE b_n END").alias("est_b"),
        F.expr(f"CASE WHEN u_n >= {K} THEN {(K - 1) * P}L div kth_u ELSE u_n END").alias("est_union"),
        F.expr(
            f"CASE WHEN u_n >= {K} THEN CAST(n_match AS BIGINT) * {P} div kth_u"
            " ELSE CAST(n_match AS BIGINT) END"
        ).alias("est_inter"),
    )


# DuckDB twin: data-sized windows are fine for the oracle — semantics, not
# plan shape, is what the hash compares.
_THETA_HASH = (
    "(list_reduce(list_prepend(CAST(0 AS BIGINT), [CAST(ascii(c) AS BIGINT) "
    "for c in string_split(CAST(user_id AS VARCHAR) || ':' || "
    f"CAST(epoch_ms(ts) // {DAY_MS} AS VARCHAR), '')]), "
    f"(a, c) -> (a*31 + c) % {KMV_P}) * {{mix}}) % {KMV_P}".format(mix=2654435761)
)

ORACLE["events_theta_ops"] = f"""
WITH elems AS (
  SELECT DISTINCT CASE WHEN event_type = 'click' THEN 'A' ELSE 'B' END AS side,
         {_THETA_HASH} AS h
  FROM events WHERE event_type IN ('click', 'purchase')
),
sk AS (
  SELECT side, h FROM (
    SELECT side, h, row_number() OVER (PARTITION BY side ORDER BY h) AS r
    FROM elems
  ) WHERE r <= {THETA_K}
),
side_stats AS (
  SELECT side, count(*) AS sk_n, max(h) AS kth FROM sk GROUP BY side
),
u AS (
  SELECT h FROM (
    SELECT h, row_number() OVER (ORDER BY h) AS r
    FROM (SELECT DISTINCT h FROM sk)
  ) WHERE r <= {THETA_K}
),
u_stats AS (SELECT count(*) AS u_n, max(h) AS kth_u FROM u),
inter AS (
  SELECT count(*) AS n_match FROM (
    SELECT h FROM sk GROUP BY h HAVING count(*) = 2
  ) m, u_stats WHERE m.h < kth_u
),
exact AS (
  SELECT CAST(sum(inA) AS BIGINT) AS na_exact,
         CAST(sum(inB) AS BIGINT) AS nb_exact,
         CAST(count(*) AS BIGINT) AS union_exact,
         CAST(sum(inA * inB) AS BIGINT) AS inter_exact
  FROM (
    SELECT h, max(CASE WHEN side = 'A' THEN 1 ELSE 0 END) AS inA,
           max(CASE WHEN side = 'B' THEN 1 ELSE 0 END) AS inB
    FROM elems GROUP BY h
  )
),
a_stats AS (SELECT sk_n AS a_n, kth AS kth_a FROM side_stats WHERE side = 'A'),
b_stats AS (SELECT sk_n AS b_n, kth AS kth_b FROM side_stats WHERE side = 'B')
SELECT CAST({THETA_K} AS BIGINT) AS k,
       na_exact, nb_exact, union_exact, inter_exact,
       CASE WHEN a_n >= {THETA_K} THEN {(THETA_K - 1) * KMV_P} // kth_a ELSE a_n END AS est_a,
       CASE WHEN b_n >= {THETA_K} THEN {(THETA_K - 1) * KMV_P} // kth_b ELSE b_n END AS est_b,
       CASE WHEN u_n >= {THETA_K} THEN {(THETA_K - 1) * KMV_P} // kth_u ELSE u_n END AS est_union,
       CASE WHEN u_n >= {THETA_K} THEN CAST(n_match AS BIGINT) * {KMV_P} // kth_u
            ELSE CAST(n_match AS BIGINT) END AS est_inter
FROM exact, a_stats, b_stats, u_stats, inter
"""

QUERIES["events_theta_ops"] = events_theta_ops


# ---------------------------------------------------------------------------
# EWMA smoothing + burst/drop alerting over hourly event-type series
# ---------------------------------------------------------------------------

EWMA_NUM, EWMA_DEN = 1, 8  # alpha = 1/8 as an exact rational
EWMA_HI_NUM, EWMA_HI_DEN = 2, 1  # burst: count > 2x smoothed level
EWMA_LO_NUM, EWMA_LO_DEN = 1, 2  # drop:  count < level/2
HOUR_MS = 3_600_000


def events_ewma_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA-smoothed hourly rate per event type with burst/drop alerts — the
    metrics-smoothing layer an alerting pipeline runs over lane counters
    (the reference's dashboards smooth exactly these counts).

    The recurrence ``e_t = (n_t·M + (DEN-NUM)·e_{t-1}) div DEN`` runs in
    exact integer micro-units, so both engines produce bit-identical
    levels.  EWMA is inherently sequential, but only over the **bounded
    hourly aggregate** (≤ hours×types rows): the raw scan reduces
    map-side to hourly counts; the fold happens per type over a collected,
    sorted array of its hours (a few hundred elements), then explodes
    back to rows.  Alerts compare each hour against the PRIOR hour's
    level: burst when ``n > 2·level``, drop when ``2·n < level``."""
    ev = load_events(spark, sf_dir)
    hourly = (
        ev.select(
            "event_type",
            F.expr(f"(unix_micros(cast(ts as timestamp)) div 1000) div {HOUR_MS}").alias("hour"),
        )
        .groupBy("event_type", "hour")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    M = 1_000_000
    folded = hourly.groupBy("event_type").agg(
        F.expr(
            f"""
            aggregate(
              array_sort(collect_list(struct(hour, n))),
              struct(
                cast(array() as array<struct<hour:bigint,n:bigint,prev_level:bigint,level:bigint>>) as acc,
                cast(-1 as bigint) as lvl
              ),
              (s, x) -> struct(
                array_append(
                  s.acc,
                  struct(
                    x.hour as hour, x.n as n,
                    s.lvl as prev_level,
                    CASE WHEN s.lvl < 0 THEN x.n * {M}
                         ELSE (x.n * {M} * {EWMA_NUM} + {EWMA_DEN - EWMA_NUM} * s.lvl) div {EWMA_DEN}
                    END as level
                  )
                ) as acc,
                CASE WHEN s.lvl < 0 THEN x.n * {M}
                     ELSE (x.n * {M} * {EWMA_NUM} + {EWMA_DEN - EWMA_NUM} * s.lvl) div {EWMA_DEN}
                END as lvl
              ),
              s -> s.acc
            )
            """
        ).alias("series")
    )
    rows = folded.select("event_type", F.explode("series").alias("s")).select(
        "event_type",
        F.col("s.hour").alias("hour"),
        F.col("s.n").alias("n"),
        F.col("s.level").alias("level_micro"),
        F.when(
            (F.col("s.prev_level") >= 0)
            & (F.col("s.n") * M * EWMA_HI_DEN > EWMA_HI_NUM * F.col("s.prev_level")),
            F.lit("burst"),
        )
        .when(
            (F.col("s.prev_level") >= 0)
            & (F.col("s.n") * M * EWMA_LO_DEN < EWMA_LO_NUM * F.col("s.prev_level")),
            F.lit("drop"),
        )
        .otherwise(F.lit("ok"))
        .alias("alert"),
    )
    return (
        rows.groupBy("event_type", "alert")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hours"),
            F.min("hour").alias("first_hour"),
            F.max("level_micro").alias("level_hi"),
            F.min("level_micro").alias("level_lo"),
        )
        .orderBy("event_type", "alert")
    )


_EWMA_M = 1_000_000

ORACLE["events_ewma_alerts"] = f"""
WITH hourly AS (
  SELECT event_type, epoch_ms(ts) // {HOUR_MS} AS hour, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
folded AS (
  SELECT event_type,
         list_reduce(
           list_prepend(
             [STRUCT_PACK(hour := CAST(-1 AS BIGINT), n := CAST(0 AS BIGINT),
                          prev_level := CAST(-1 AS BIGINT), level := CAST(-1 AS BIGINT))],
             list_transform(
               list_sort(list(STRUCT_PACK(hour := hour, n := n))),
               x -> [STRUCT_PACK(hour := x.hour, n := x.n,
                                 prev_level := CAST(-1 AS BIGINT), level := CAST(-1 AS BIGINT))]
             )
           ),
           (acc, x) -> list_append(
             acc,
             STRUCT_PACK(
               hour := x[1].hour, n := x[1].n,
               prev_level := acc[-1].level,
               level := CASE WHEN acc[-1].level < 0 THEN x[1].n * {_EWMA_M}
                             ELSE (x[1].n * {_EWMA_M} * {EWMA_NUM} + {EWMA_DEN - EWMA_NUM} * acc[-1].level) // {EWMA_DEN}
                        END
             )
           )
         ) AS series
  FROM hourly GROUP BY event_type
),
rows_ AS (
  SELECT event_type, s.hour, s.n, s.level AS level_micro,
         CASE WHEN s.prev_level >= 0 AND s.n * {_EWMA_M} * {EWMA_HI_DEN} > {EWMA_HI_NUM} * s.prev_level THEN 'burst'
              WHEN s.prev_level >= 0 AND s.n * {_EWMA_M} * {EWMA_LO_DEN} < {EWMA_LO_NUM} * s.prev_level THEN 'drop'
              ELSE 'ok' END AS alert
  FROM folded, UNNEST(series) AS t(s)
  WHERE s.hour >= 0
)
SELECT event_type, alert,
       CAST(count(*) AS BIGINT) AS n_hours,
       min(hour) AS first_hour,
       max(level_micro) AS level_hi,
       min(level_micro) AS level_lo
FROM rows_ GROUP BY event_type, alert
ORDER BY event_type, alert
"""

QUERIES["events_ewma_alerts"] = events_ewma_alerts


# ---------------------------------------------------------------------------
# HLL-style register sketch (register-max mergeable distinct count)
# ---------------------------------------------------------------------------

HLL_M = 64  # registers (6 index bits)
HLL_W = 25  # value bits left of the index at the 2^31-1 hash modulus
HLL_RMAX = HLL_W + 1  # register ceiling: rho(0-valued remainder)
#: alpha_64 = 0.709 (Flajolet et al. 2007, m = 64) as an exact rational so
#: the bias-corrected estimate is pure integer arithmetic on both engines.
HLL_ALPHA_NUM = 709
HLL_ALPHA_DEN = 1000
#: alpha*m^2*2^RMAX — the estimate numerator, precomputed exactly in Python.
_HLL_EST_NUM = HLL_ALPHA_NUM * HLL_M * HLL_M * (1 << HLL_RMAX)


def events_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily distinct users via an HLL-style register sketch + exact merge.

    The third mergeable-sketch family next to KMV (k-min order statistics)
    and theta (threshold sampling): HLL keeps, per register ``j = h mod 64``,
    the MAX leading-zero rank ``rho`` of the remaining hash bits — so the
    per-day shard sketches merge into the global sketch by register-wise
    ``max``, the same lossless-merge contract a 1000-executor fleet needs
    (ship 64 small ints per shard, never re-scan).  The day = -1 row is
    built **only** from the per-day registers, proving the merge.

    Determinism: the reference's 31-fold hash re-mixed by the Knuth
    multiplier (both exact integers), ``rho`` from the binary-string length
    (no float log2), and the alpha_64 bias correction applied as an exact
    rational — value-identical on Spark and DuckDB.  The float-free price:
    no small-range linear-counting correction (reported ``abs_err_pm``
    audits the raw estimator against the exact distinct count).

    Scale: one groupBy(day, j) over the events scan, then all arithmetic on
    <= 64 rows per shard; the exact audit twin is the full count_distinct
    shuffle the sketch path avoids at 100 TB.
    """
    ev = load_events(spark, sf_dir)
    keyed = ev.select(
        F.expr(f"(unix_micros(cast(ts as timestamp)) div 1000) div {DAY_MS}").alias("day"),
        (
            (hash31(F.col("user_id").cast("string"), mod=KMV_P) * THETA_MIX) % KMV_P
        ).alias("h"),
        F.col("user_id"),
    )
    regs = keyed.select(
        "day",
        (F.col("h") % HLL_M).alias("j"),
        F.expr(f"h div {HLL_M}").alias("w"),
    ).select(
        "day",
        "j",
        F.when(F.col("w") == 0, F.lit(HLL_RMAX))
        .otherwise(F.lit(HLL_RMAX) - F.length(F.expr("bin(w)")))
        .alias("rho"),
    )
    day_regs = regs.groupBy("day", "j").agg(F.max("rho").alias("m"))
    # global sketch from the shard sketches only (register-wise max)
    merged = (
        day_regs.groupBy("j")
        .agg(F.max("m").alias("m"))
        .select(F.lit(-1).cast("long").alias("day"), "j", "m")
    )
    allregs = day_regs.unionByName(merged)
    # S = sum over all 64 registers of 2^(RMAX - M[j]); absent registers
    # carry M = 0. Exact BIGINT: S <= 64 * 2^26.
    est = (
        allregs.groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("nonzero_registers"),
            F.sum(F.expr(f"shiftleft(cast(1 as bigint), {HLL_RMAX} - m)")).alias("s_present"),
        )
        .select(
            "day",
            "nonzero_registers",
            (
                F.col("s_present")
                + (F.lit(HLL_M) - F.col("nonzero_registers")) * F.lit(1 << HLL_RMAX)
            ).alias("s_scaled"),
        )
        .select(
            "day",
            "nonzero_registers",
            "s_scaled",
            F.expr(f"cast({_HLL_EST_NUM} as bigint) div ({HLL_ALPHA_DEN} * s_scaled)").alias("hll_est"),
        )
    )
    exact_day = keyed.groupBy("day").agg(
        F.count_distinct(F.col("user_id")).cast("long").alias("exact_distinct")
    )
    exact_all = keyed.agg(
        F.count_distinct(F.col("user_id")).cast("long").alias("exact_distinct")
    ).select(F.lit(-1).cast("long").alias("day"), "exact_distinct")
    exact = exact_day.unionByName(exact_all)
    return (
        est.join(exact, "day")
        .select(
            "day",
            "nonzero_registers",
            "s_scaled",
            "hll_est",
            "exact_distinct",
            F.expr("abs(hll_est - exact_distinct) * 1000 div exact_distinct").alias("abs_err_pm"),
        )
        .orderBy("day")
    )


_HLL_HASH = (
    "(list_reduce(list_prepend(CAST(0 AS BIGINT), [CAST(ascii(c) AS BIGINT) "
    "for c in string_split(CAST(user_id AS VARCHAR), '')]), "
    f"(a, c) -> (a*31 + c) % {KMV_P}) * {THETA_MIX}) % {KMV_P}"
)

ORACLE["events_hll_distinct"] = f"""
WITH keyed AS (
  SELECT epoch_ms(ts) // {DAY_MS} AS day, {_HLL_HASH} AS h, user_id
  FROM events
),
regs AS (
  SELECT day, h % {HLL_M} AS j,
         CASE WHEN h // {HLL_M} = 0 THEN {HLL_RMAX}
              ELSE {HLL_RMAX} - length(bin(h // {HLL_M})) END AS rho
  FROM keyed
),
day_regs AS (SELECT day, j, max(rho) AS m FROM regs GROUP BY day, j),
merged AS (
  SELECT CAST(-1 AS BIGINT) AS day, j, max(m) AS m FROM day_regs GROUP BY j
),
allregs AS (
  SELECT day, j, m FROM day_regs UNION ALL SELECT day, j, m FROM merged
),
est AS (
  SELECT day, CAST(count(*) AS BIGINT) AS nonzero_registers,
         sum(1::BIGINT << ({HLL_RMAX} - m))
           + ({HLL_M} - count(*)) * {1 << HLL_RMAX} AS s_scaled
  FROM allregs GROUP BY day
),
est2 AS (
  SELECT day, nonzero_registers, CAST(s_scaled AS BIGINT) AS s_scaled,
         CAST({_HLL_EST_NUM} AS BIGINT) // ({HLL_ALPHA_DEN} * CAST(s_scaled AS BIGINT)) AS hll_est
  FROM est
),
exact_day AS (
  SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
  FROM keyed GROUP BY day
),
exact AS (
  SELECT day, exact_distinct FROM exact_day
  UNION ALL
  SELECT CAST(-1 AS BIGINT), CAST(count(DISTINCT user_id) AS BIGINT) FROM keyed
)
SELECT e.day, nonzero_registers, s_scaled, hll_est, exact_distinct,
       abs(hll_est - exact_distinct) * 1000 // exact_distinct AS abs_err_pm
FROM est2 e JOIN exact x ON e.day = x.day
ORDER BY e.day
"""

QUERIES["events_hll_distinct"] = events_hll_distinct
