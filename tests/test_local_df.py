"""local_df — the VALUES-form LocalRelation twin of createDataFrame(list).

Pins (a) value/schema equivalence with createDataFrame across the scalar
types the query paths use (ints, strings incl. quotes/backslashes, bools,
NULLs), and (b) the plan property the helper exists for: a constant
LocalRelation, no RDD scan, no Python workers.
"""

from __future__ import annotations

from lets_talk_cdc_change_feed_playground_spark.operators.shared import local_df


def test_local_df_matches_createdataframe(spark):
    rows = [
        (1, "plain", True, 7),
        (2, "qu'ote", False, None),
        (3, "back\\slash", True, -5),
        (4, "", False, 0),
    ]
    schema = "id INT, name STRING, flag BOOLEAN, n BIGINT"
    a = local_df(spark, rows, schema)
    b = spark.createDataFrame(rows, schema)
    # dtypes (names + types) must match; nullability may be TIGHTER on the
    # VALUES form (an all-non-null literal column infers non-nullable)
    assert a.dtypes == b.dtypes
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_local_df_is_local_relation(spark):
    plan = (
        local_df(spark, [(1, "x")], "a INT, b STRING")
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "LocalRelation" in plan
    assert "Scan ExistingRDD" not in plan


def test_local_df_empty_falls_back(spark):
    df = local_df(spark, [], "a INT, b STRING")
    assert df.collect() == []
    assert [f.name for f in df.schema.fields] == ["a", "b"]


def test_local_df_rejects_nonfinite_floats(spark):
    import pytest

    for bad in (float("inf"), float("-inf"), float("nan")):
        with pytest.raises(ValueError, match="non-finite"):
            local_df(spark, [(bad,)], "x DOUBLE").collect()


def test_local_df_rejects_parameterised_types(spark):
    import pytest

    with pytest.raises(ValueError, match="parameterised"):
        local_df(spark, [(1.5, "a")], "x DECIMAL(38,2), y STRING")
