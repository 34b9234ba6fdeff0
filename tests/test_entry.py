"""Smoke tests for the driver contract (__spark_entry__)."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    rows = {r["method"]: r for r in df.collect()}
    assert df.columns == [
        "method", "missing", "extra", "ordering_issues", "max_lag_ms", "pass",
    ]
    # one verdict per lane; lossless lanes pass, polling is lossy
    assert set(rows) == {"log", "polling", "trigger"}
    assert rows["log"]["pass"] and rows["trigger"]["pass"]
    assert rows["log"]["missing"] == rows["log"]["extra"] == 0
    assert not rows["polling"]["pass"] and rows["polling"]["missing"] > 0


def test_queries_and_oracle_aligned():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert q, "queries() must not be empty"
    # every oracle entry must have a matching query
    assert set(o) <= set(q)


def test_all_queries_run_and_return_rows(spark, sf_dir):
    """Every declared query runs at smoke sf, returns named columns and rows.

    Empty results would make the driver's hash gate vacuous — every judged
    query is designed to produce rows at every scale factor.
    """
    empty_ok: set[str] = {"customers_without_orders"}  # genuinely 0 at tiny sf
    for name, fn in entry_mod.queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        n = df.count()
        if name not in empty_ok:
            assert n > 0, f"{name} returned 0 rows"
