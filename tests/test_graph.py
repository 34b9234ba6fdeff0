"""Invariants for the graph analytics queries."""

from __future__ import annotations

from lets_talk_cdc_change_feed_playground_spark.functions import graph_queries as G

SF = "/root/testdata/sf0.001"


def test_pagerank_mass_and_shape(spark):
    rows = G.nations_trade_pagerank(spark, SF).collect()
    assert len(rows) == 25
    total = sum(r["rank_micro"] for r in rows)
    # integer division drops remainders and dangling mass is not
    # redistributed, so total mass can only shrink — and never by much.
    assert total <= G.PR_MASS
    assert total >= G.PR_MASS * 0.5
    ranks = [r["rank_micro"] for r in rows]
    assert ranks == sorted(ranks, reverse=True)
    # a nation nobody buys from keeps only the teleport share
    base = G.PR_MASS // 25
    floor = (G.PR_D_DEN - G.PR_D_NUM) * base // G.PR_D_DEN
    assert all(r["rank_micro"] >= floor for r in rows)


def test_markov_rows_normalize(spark):
    rows = G.events_markov_transitions(spark, SF).collect()
    assert rows
    by_prev: dict[str, list] = {}
    for r in rows:
        by_prev.setdefault(r["prev_type"], []).append(r)
    for prev, rs in by_prev.items():
        bp = sum(r["p_bp"] for r in rs)
        # integer floors: sum of shares is <= 10000, within len(rs) of exact
        assert 10000 - len(rs) < bp <= 10000
