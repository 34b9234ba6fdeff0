"""Invariants for the outbox relay and compacted-topic bootstrap queries."""

from __future__ import annotations

from lets_talk_cdc_change_feed_playground_spark.operators import reliability_queries as R

SF = "/root/testdata/sf0.001"


def test_outbox_relay_converges_everywhere(spark):
    rows = R.cdc_outbox_relay(spark, SF).collect()
    assert rows
    # exactly-once after dedup: every key converges with the WAL...
    assert all(r["converged"] for r in rows)
    # ...even though the relay genuinely duplicated some deliveries.
    assert sum(r["n_dup_deliveries"] for r in rows) > 0
    assert all(r["n_relayed"] >= r["n_outbox"] == r["n_delivered"] for r in rows)


def test_compacted_bootstrap_converges_everywhere(spark):
    rows = R.cdc_compacted_bootstrap(spark, SF).collect()
    assert rows
    assert all(r["converged"] for r in rows)
    # every key in this feed stays active past the 60% boundary, so the tail
    # path must dominate; from_compacted-only keys are data-dependent.
    assert any(r["from_compacted"] is False for r in rows)
    assert all(r["boot_present"] == r["full_present"] for r in rows)
