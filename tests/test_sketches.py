"""Invariant tests for the mergeable-sketch suite (functions/sketch_queries).

Beyond the oracle hash gate, these pin the *sketch guarantees*: the KMV merge
is lossless, histogram quantile ranks bracket the exact quantiles, and the
heavy-hitter bounds genuinely bracket the exact counts.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lets_talk_cdc_change_feed_playground_spark.functions import sketch_queries as S
from lets_talk_cdc_change_feed_playground_spark.sources.testdata import load_events, load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def kmv(spark):
    return {r["day"]: r.asDict() for r in S.events_kmv_distinct(spark, SF).collect()}


def test_kmv_global_row_is_exact_merge(spark, kmv):
    # The global sketch (day = -1) must equal the KMV of the union of the
    # shard sketches: its kth_min can never exceed any shard's kth_min.
    glob = kmv[-1]
    shards = [v for d, v in kmv.items() if d != -1]
    assert glob["kmv_n"] <= S.KMV_K
    if glob["kmv_n"] == S.KMV_K:
        assert glob["kth_min"] <= min(s["kth_min"] for s in shards if s["kmv_n"] == S.KMV_K)


def test_kmv_estimate_vs_exact(spark, kmv):
    ev = load_events(spark, SF)
    exact = (
        ev.select(F.concat(F.col("user_id").cast("string"), F.lit(":"), "event_type").alias("k"))
        .distinct()
        .count()
    )
    est = kmv[-1]["est_distinct"]
    # KMV with K=24 has ~1/sqrt(K-2) ≈ 21% relative error; allow 3 sigma.
    assert est == pytest.approx(exact, rel=0.65)


def test_hist_quantiles_bracket_exact(spark):
    rows = S.events_hist_quantiles(spark, SF).collect()
    ev = load_events(spark, SF)
    for r in rows:
        exact = ev.filter(F.col("event_type") == r["event_type"]).agg(
            F.expr("percentile(value, 0.95)").alias("p")
        ).collect()[0]["p"]
        # p95 bin lower edge is within one bin of the exact percentile.
        assert r["p95_lo"] - S.HIST_BIN <= exact <= r["p95_lo"] + S.HIST_BIN
        assert r["p50_lo"] <= r["p95_lo"] <= r["p99_lo"]


def test_heavy_hitter_bounds_bracket_exact(spark):
    got = S.lineitem_heavy_hitters(spark, SF).collect()
    li = load_table(spark, SF, "lineitem")
    exact = {
        r["l_partkey"]: r["n"]
        for r in li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert len(got) == S.HH_TOP
    for r in got:
        assert r["lo"] <= exact[r["l_partkey"]] <= r["hi"]


def test_shard_stats_merge_is_lossless(spark):
    rows = {r["shard"]: r for r in S.lineitem_shard_stats(spark, SF).collect()}
    assert set(rows) == set(range(S.STATS_SHARDS)) | {-1}
    m = rows[-1]
    assert m["merge_ok"] is True
    # merged counters equal the recomposition of the shard rows
    shards = [rows[s] for s in range(S.STATS_SHARDS)]
    assert m["n"] == sum(r["n"] for r in shards)
    assert m["qty_min"] == min(r["qty_min"] for r in shards)
    assert m["price_max"] == max(r["price_max"] for r in shards)
    # population variance is non-negative and bounded by (max-min)^2 / 4 * 1e6... loose sanity
    assert m["price_var_micro"] >= 0


def test_theta_ops_estimates_and_audit(spark):
    r = S.events_theta_ops(spark, SF).collect()[0]
    assert r["union_exact"] <= r["na_exact"] + r["nb_exact"]
    assert r["inter_exact"] == r["na_exact"] + r["nb_exact"] - r["union_exact"]
    # estimates are either exact (unsaturated sketch) or within the 3-sigma
    # KMV envelope ~ 3/sqrt(K)
    for est, exact in (
        (r["est_a"], r["na_exact"]),
        (r["est_b"], r["nb_exact"]),
        (r["est_union"], r["union_exact"]),
    ):
        assert abs(est - exact) <= max(3 * exact // 8, 2), (est, exact)
    assert r["est_inter"] >= 0


def test_ewma_alert_classes_partition_hours(spark):
    rows = S.events_ewma_alerts(spark, SF).collect()
    assert rows
    from lets_talk_cdc_change_feed_playground_spark.sources.testdata import load_events
    from pyspark.sql import functions as F

    ev = load_events(spark, SF)
    hours = (
        ev.select(
            "event_type",
            F.expr(f"(unix_micros(cast(ts as timestamp)) div 1000) div {S.HOUR_MS}").alias("h"),
        )
        .distinct()
        .groupBy("event_type")
        .count()
        .collect()
    )
    per_type = {r["event_type"]: r["count"] for r in hours}
    got = {}
    for r in rows:
        got[r["event_type"]] = got.get(r["event_type"], 0) + r["n_hours"]
        assert r["level_lo"] <= r["level_hi"]
        assert r["alert"] in ("burst", "drop", "ok")
    assert got == per_type  # every (type, hour) classified exactly once
