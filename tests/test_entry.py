"""Smoke tests for the driver contract (__spark_entry__)."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["l_orderkey", "o_orderdate", "o_orderpriority", "revenue"]


def test_queries_and_oracle_aligned():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert q, "queries() must not be empty"
    # every oracle entry must have a matching query
    assert set(o) <= set(q)


def test_all_queries_run_and_match_columns(spark, sf_dir):
    """Every declared query runs at smoke sf and returns named columns."""
    for name, fn in entry_mod.queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        assert df.count() >= 0, name
