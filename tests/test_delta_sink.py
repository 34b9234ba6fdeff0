"""Delta-backed S9 sink — skip-marked where ``delta-spark`` is absent.

The parquet stand-in (:class:`streaming.apply.UpsertSink`) is the env
default; this suite proves the gated real-Delta path
(:class:`streaming.apply.DeltaUpsertSink`, ``MERGE`` with ``WHEN MATCHED AND
op='d' THEN DELETE``) implements the SAME fold wherever the dependency
exists (reference apply semantics:
``scenarios/01-canonical-reference/sink/consumer.mjs:292-356``).
"""

from __future__ import annotations

import pytest

from lets_talk_cdc_change_feed_playground_spark.streaming.apply import (
    DeltaUpsertSink,
    UpsertSink,
    has_delta,
)

pytestmark = pytest.mark.skipif(
    not has_delta(), reason="delta-spark not installed in this environment"
)


def _batches(spark):
    """Three micro-batches: create, update+delete, re-create after delete."""
    schema = (
        "pk string, op string, after_event_type string, after_value double, "
        "after_props string, ts_ms long, seq long"
    )
    return [
        spark.createDataFrame(
            [("p1", "c", "click", 1.0, None, 100, 1), ("p2", "c", "view", 2.0, None, 100, 2)],
            schema,
        ),
        spark.createDataFrame(
            [("p1", "u", "click", 9.0, None, 200, 3), ("p2", "d", None, None, None, 200, 4)],
            schema,
        ),
        spark.createDataFrame([("p2", "c", "view", 5.0, None, 300, 5)], schema),
    ]


def test_delta_merge_matches_parquet_standin(spark, tmp_path):
    delta_sink = DeltaUpsertSink(spark, str(tmp_path / "delta"))
    parquet_sink = UpsertSink(spark, str(tmp_path / "parquet"))
    for i, b in enumerate(_batches(spark)):
        delta_sink(b, i)
        parquet_sink(b, i)
    cols = ["pk", "event_type", "value", "props", "ts_ms", "seq"]
    got = delta_sink.current().select(*cols)
    want = parquet_sink.current().select(*cols)
    assert got.count() == want.count() == 2
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_delta_delete_removes_key(spark, tmp_path):
    sink = DeltaUpsertSink(spark, str(tmp_path / "delta2"))
    b1, b2, _ = _batches(spark)
    sink(b1, 0)
    sink(b2, 1)
    rows = {r["pk"]: r for r in sink.current().collect()}
    assert set(rows) == {"p1"}
    assert rows["p1"]["value"] == 9.0


def test_delta_requires_dependency_loudly():
    # runs only when delta IS installed; the constructor contract (loud
    # ImportError when absent) is covered by the guard in apply.py itself
    assert has_delta()
