"""merge_payload mode: engine row-store semantics for MAP patch payloads.

Pins the reference's per-engine image rules on the cases that differ
between engines (``sim/engines/{Log,Trigger,Polling}Engine.ts``): insert
replaces, update merges, LogEngine's delete clears while TriggerEngine
keeps data and revives on update, PollingEngine no-ops updates on
deleted/missing rows and deletes on missing rows, and re-insert revives
with version 1 (emits 'c' again).
"""

from __future__ import annotations

import pytest

from lets_talk_cdc_change_feed_playground_spark.operators import capture


@pytest.fixture(scope="module")
def feed(spark):
    return spark.createDataFrame(
        [
            (0, 100, "k1", "insert", {"a": "1", "b": "2"}),
            (1, 200, "k1", "update", {"b": "3"}),
            (2, 300, "k1", "delete", None),
            (3, 400, "k1", "update", {"c": "4"}),
            (4, 500, "k1", "insert", {"z": "9"}),
            (5, 600, "k2", "delete", None),
        ],
        "seq long, t long, pk string, op string, data map<string,string>",
    )


def test_log_merge_images(spark, feed):
    rows = {
        r["lsn"]: r
        for r in capture.log_capture_ops(
            feed, 25, payload=("data",), merge_payload=True
        ).collect()
    }
    assert dict(rows[2]["before_data"]) == {"a": "1", "b": "2"}
    assert dict(rows[2]["after_data"]) == {"a": "1", "b": "3"}
    # delete clears; update-on-missing creates from the patch (cur undefined)
    assert dict(rows[3]["before_data"]) == {"a": "1", "b": "3"}
    assert rows[3]["after_data"] is None
    assert rows[4]["before_data"] is None
    assert dict(rows[4]["after_data"]) == {"c": "4"}
    # insert REPLACES (z only, no a/b/c); delete-on-missing has null before
    assert dict(rows[5]["after_data"]) == {"z": "9"}
    assert rows[6]["before_data"] is None


def test_trigger_merge_images(spark, feed):
    rows = {
        r["audit_seq"]: r
        for r in capture.trigger_capture_ops(
            feed, 150, 6, payload=("data",), merge_payload=True
        ).collect()
    }
    # deleted rows keep data; the next update revives and merges into it
    assert dict(rows[4]["before_data"]) == {"a": "1", "b": "3"}
    assert dict(rows[4]["after_data"]) == {"a": "1", "b": "3", "c": "4"}
    # delete on a never-seen key audits an empty before image
    assert dict(rows[6]["before_data"]) == {}


def test_polling_merge_no_ops(spark, feed):
    polled = capture.polling_capture_ops(
        feed, 200, include_soft_deletes=True, payload=("data",), merge_payload=True
    ).collect()
    by_window = {(r["pk"], r["poll_ts_ms"]): r for r in polled}
    # k2's delete-on-missing emits nothing; k1's post-delete update is a no-op
    assert all(r["pk"] == "k1" for r in polled)
    assert len(polled) == 3
    # re-insert revives with version 1 → 'c' again, replaced image
    last = by_window[("k1", 600)]
    assert last["op"] == "c" and dict(last["after_data"]) == {"z": "9"}
    # the delete window emits 'd' with a null image
    assert by_window[("k1", 400)]["op"] == "d"
    assert by_window[("k1", 400)]["after_data"] is None


def test_merges_work_under_exception_dedup_policy(spark, feed):
    """The conf-independence contract: the merge lanes and the replay fold
    must produce identical results when the session's mapKeyDedupPolicy is
    EXCEPTION (Spark's default for bare sessions)."""
    from pyspark.sql import functions as F

    from lets_talk_cdc_change_feed_playground_spark.operators import schema_evolution as SE

    prev = spark.conf.get("spark.sql.mapKeyDedupPolicy")
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "EXCEPTION")
    try:
        log = capture.log_capture_ops(
            feed, 25, payload=("data",), merge_payload=True
        ).collect()
        assert len(log) == 6
        row2 = next(r for r in log if r["lsn"] == 2)
        assert dict(row2["after_data"]) == {"a": "1", "b": "3"}
        ops = feed.select(
            F.lit("t").alias("table"), "pk", "seq", "t", "op",
            F.col("data").alias("after"),
        )
        folded = {r["pk"]: dict(r["data"]) for r in SE.replay_fold(ops).collect()}
        # sink-side fold (storage.applyEvent): insert MERGES into existing,
        # so k1 keeps the post-delete update's field alongside the re-insert
        assert folded["k1"] == {"c": "4", "z": "9"}
    finally:
        spark.conf.set("spark.sql.mapKeyDedupPolicy", prev)


def test_merge_batch_null_pk_routes_through_fold(spark):
    """A NULL pk must behave like any other key in the incremental store
    merge: the stored null-key row enters the fold with the batch's null-key
    events (last-writer wins) instead of passing through next to a separately
    folded batch row — the plain-equality semi/anti split would emit BOTH
    (advisor finding, round 7; fixed with a null-safe <=> join key)."""
    from pyspark.sql import functions as F

    from lets_talk_cdc_change_feed_playground_spark.streaming.apply import merge_batch

    cols = (
        "pk string, op string, after_event_type string, after_value double,"
        " after_props string, ts_ms long, seq long"
    )
    store = merge_batch(
        None,
        spark.createDataFrame(
            [(None, "c", "old", 1.0, "{}", 100, 1), ("k1", "c", "x", 2.0, "{}", 100, 2)],
            cols,
        ),
    )
    assert store.count() == 2

    merged = merge_batch(
        store,
        spark.createDataFrame([(None, "u", "new", 9.0, "{}", 200, 3)], cols),
    ).collect()
    rows = {r["pk"]: r for r in merged}
    assert len(merged) == 2, f"null key duplicated: {merged}"
    assert rows[None]["event_type"] == "new" and rows[None]["ts_ms"] == 200
    assert rows["k1"]["event_type"] == "x"  # untouched key passes through

    # and a null-key delete removes the row
    after_del = merge_batch(
        merge_batch(None, spark.createDataFrame([(None, "c", "a", 1.0, "{}", 1, 1)], cols)),
        spark.createDataFrame([(None, "d", None, None, None, 2, 2)], cols),
    )
    assert after_del.filter(F.col("pk").isNull()).count() == 0
