"""Sweeping physical-plan guard over the whole judged batch surface.

A cartesian product anywhere in the 100+-query surface is a scale bug no
matter how small the testdata — this sweep builds (without executing) the
executed-plan string of every batch query and fails on any
``CartesianProduct`` operator. Broadcast nested-loop joins of single-row
scalar frames are fine (and common: grand totals, floors, cuts); an
unkeyed shuffled product is not. Targeted per-query plan assertions
(broadcast choice, pushdown, TakeOrderedAndProject, window partitioning)
live in ``test_relational.py`` / ``test_pipeline.py``.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry


def _batch_queries():
    return sorted(n for n in entry.queries() if not n.startswith("stream_"))


@pytest.mark.parametrize("name", _batch_queries())
def test_no_cartesian_product(spark, sf_dir, name):
    fn = entry.queries()[name]
    plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
