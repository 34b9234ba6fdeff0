"""Relational surface unit checks (values verified vs DuckDB separately in
tools/oracle_check.py; these pin basic invariants and plan shape)."""

from __future__ import annotations

from lets_talk_cdc_change_feed_playground_spark.plans import relational as R


def test_q1_groups(spark, sf_dir):
    rows = R.q1_pricing_summary(spark, sf_dir).collect()
    assert 0 < len(rows) <= 6  # at most |returnflag| x |linestatus|
    for r in rows:
        assert r["sum_qty"] > 0
        assert r["count_order"] > 0


def test_q3_topk_is_sorted(spark, sf_dir):
    rows = R.q3_shipping_priority(spark, sf_dir).collect()
    assert len(rows) <= 10
    revs = [r["revenue"] for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_broadcast_join_in_q5_plan(spark, sf_dir):
    plan = R.q5_local_supplier_volume(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    # nation/region are broadcast; no forced broadcast of SF-scaling tables.
    assert "BroadcastHashJoin" in plan


def test_q3_topk_is_take_ordered(spark, sf_dir):
    """Global top-k must be a distributed TakeOrderedAndProject, not a
    single-task unpartitioned row_number window."""
    plan = R.q3_shipping_priority(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_q1_pushes_filter_to_scan(spark, sf_dir):
    plan = R.q1_pricing_summary(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan


def test_sessionize_sessions_are_positive(spark, sf_dir):
    rows = R.events_sessionize(spark, sf_dir).collect()
    assert all(r["n_events"] >= 1 for r in rows)
    assert all(r["session_id"] >= 1 for r in rows)


def test_q4_exists_is_semi_join(spark, sf_dir):
    """EXISTS must compile to a left-semi hash join (no payload duplication,
    no cartesian product) with the orders date filter pushed to the scan."""
    plan = R.q4_priority_late_ship(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    assert "Cartesian" not in plan
    assert "PushedFilters: [IsNotNull(o_orderdate)" in plan


def test_q7_broadcasts_only_fixed_dims(spark, sf_dir):
    """nation is hint-broadcast; supplier/customer joins are left to AQE so
    they shuffle (not OOM) once the dims outgrow the threshold at scale."""
    plan = R.q7_volume_shipping(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Cartesian" not in plan


def test_q15_max_is_single_row_broadcast(spark, sf_dir):
    """The max-revenue join-back must broadcast the 1-row aggregate, never
    shuffle the revenue frame against it."""
    plan = R.q15_top_supplier(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_q21_no_unpartitioned_window(spark, sf_dir):
    """Sole-latest-shipper folds out of one (order, supplier) pair aggregate:
    lineitem is scanned exactly once, and the order-level stats window is
    PARTITIONED by l_orderkey — a global (unpartitioned) window over lineitem
    would single-task at scale."""
    plan = R.q21_waiting_suppliers(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("lineitem.parquet") == 1
    assert "windowspecdefinition(l_orderkey" in plan
    assert "windowspecdefinition()" not in plan  # no partition-less window
    assert "TakeOrderedAndProject" in plan


def test_q19_part_prefilter_reaches_scan(spark, sf_dir):
    """The brand union pre-filter must reach the part scan so the OR residual
    only runs on surviving rows."""
    plan = R.q19_banded_revenue(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(p_brand)" in plan or "In(p_brand" in plan


def test_q11_threshold_is_broadcast_not_reagg(spark, sf_dir):
    """The grand-total compare joins a 1-row aggregate back via broadcast;
    lineitem is scanned once (no second scan for the total)."""
    plan = R.q11_important_supply(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert plan.count("lineitem.parquet") <= 2  # per-part vals + total reuse


def test_q20_part_prefilter_broadcasts(spark, sf_dir):
    """The selective cold-part prefilter broadcasts at test SF via the size
    threshold (no hard hint — it scales with SF, so the choice belongs to
    AQE) with the shipdate range pushed to the scan."""
    plan = R.q20_promo_suppliers(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan


def test_asof_join_is_single_window_pass(spark, sf_dir):
    """The point-in-time join must be the union-timeline single window —
    no range join, no cartesian product."""
    plan = R.events_asof_features(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Window") >= 1


def test_anomaly_windows_no_cartesian(spark, sf_dir):
    """The interval join goes through exploded hour buckets (equi-join),
    never an inequality-only join."""
    plan = R.events_anomaly_windows(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan
    assert "Generate explode" in plan or "Generate" in plan


def test_rfm_quartiles_partition_customers(spark):
    from lets_talk_cdc_change_feed_playground_spark.plans.relational import (
        customers_rfm_segments,
    )
    from lets_talk_cdc_change_feed_playground_spark.sources.testdata import load_table

    rows = customers_rfm_segments(spark, "/root/testdata/sf0.001").collect()
    n_customers = sum(r["n_customers"] for r in rows)
    active = (
        load_table(spark, "/root/testdata/sf0.001", "orders")
        .select("o_custkey").distinct().count()
    )
    assert n_customers == active
    for r in rows:
        assert 1 <= r["r"] <= 4 and 1 <= r["f"] <= 4 and 1 <= r["m"] <= 4
        assert r["rfm_code"] == r["r"] * 100 + r["f"] * 10 + r["m"]


def test_abc_classes_follow_pareto(spark):
    from lets_talk_cdc_change_feed_playground_spark.plans.relational import (
        parts_abc_classes,
    )

    rows = {r["abc_class"]: r for r in parts_abc_classes(spark, "/root/testdata/sf0.001").collect()}
    assert set(rows) <= {"A", "B", "C"}
    # Pareto shape: A holds >= B's and C's per-part revenue density
    if {"A", "C"} <= set(rows):
        a, c = rows["A"], rows["C"]
        dens_a = float(a["class_revenue"]) / a["n_parts"]
        dens_c = float(c["class_revenue"]) / c["n_parts"]
        assert dens_a > dens_c


def test_gapfill_spine_is_dense_and_locf_total(spark, sf_dir):
    """Every type's hour spine is contiguous; gaps carry the previous hour's
    value (LOCF) and are flagged; the first spine hour is a data hour, so
    the filled value is never null."""
    rows = R.events_gapfill_locf(spark, sf_dir).collect()
    assert rows
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for et, rs in by_type.items():
        rs.sort(key=lambda r: r["hour"])
        hours = [r["hour"] for r in rs]
        assert hours == list(range(hours[0], hours[-1] + 1)), et
        prev = None
        for r in rs:
            assert r["sum_value_filled"] is not None
            if r["gap_filled"]:
                assert r["n_events"] == 0
                assert r["sum_value_filled"] == prev
            prev = r["sum_value_filled"]


def test_session_concurrency_matches_sessionize_keys(spark, sf_dir):
    """Same session definition as events_sessionize (2h gap): the session key
    sets agree, overlap counters respect distinct-user <= event bounds."""
    conc = R.events_session_concurrency(spark, sf_dir).collect()
    base = R.events_sessionize(spark, sf_dir).collect()
    assert {(r["user_id"], r["session_id"]) for r in conc} == {
        (r["user_id"], r["session_id"]) for r in base
    }
    for r in conc:
        assert 0 <= r["n_concurrent_users"] <= r["n_overlap_events"]


def test_session_concurrency_no_cartesian(spark, sf_dir):
    plan = (
        R.events_session_concurrency(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Cartesian" not in plan
