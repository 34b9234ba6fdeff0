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
