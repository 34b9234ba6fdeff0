"""Scenario replay runner — the reference playground's core loop as one call.

``replay_scenario`` does what the reference UI does when a user loads a
scenario and presses play (``web/App.tsx`` comparator loop): seed rows
snapshot, feed the ops to all three capture engines, diff each lane
against the expected op stream, fold the log lane back into a table, and
summarize per-lane verdicts and metrics. ``python -m
lets_talk_cdc_change_feed_playground_spark.cli <scenario.json>`` prints the same as JSON.

Every stage is the already-judged operator — this module only composes:
:mod:`.sources.scenario` (S1/S3), :mod:`.operators.capture` (C1-C3 with the
open-schema MAP payload), :mod:`.operators.diffs` (V1-V3), and the A2 merge
fold. Scenario definitions are tiny — patch-merged images fold each key's
event prefix (quadratic per key, fine at fixture size); a high-volume ops
table carries full row images, where the engines' linear column path
applies (``capture.PAYLOAD`` mode).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lets_talk_cdc_change_feed_playground_spark.operators import capture, diffs
from lets_talk_cdc_change_feed_playground_spark.sources import scenario as SC

DEFAULT_FETCH_MS = 25
DEFAULT_POLL_MS = 200
DEFAULT_EXTRACT_MS = 150
DEFAULT_OVERHEAD_MS = 6


def scenario_feed(spark: SparkSession, path: str, snapshot_t: int = 0) -> DataFrame:
    """Load a scenario fixture into the capture-engine feed shape:
    ``(seq, t, pk, op, data MAP)`` with the snapshot seed rows first and a
    composite ``table|pk`` key (multi-table scenarios share one feed)."""
    sc = SC.load_scenario(path)
    snap = SC.snapshot_ops(sc, spark, t=snapshot_t)
    ops = sc.ops_df(spark)
    full = snap.unionByName(ops)
    key = F.concat_ws("|", "table", "pk")
    # deterministic total order: snapshot rows (seq = -1) precede same-t ops;
    # re-sequenced so every row has a unique (t, seq)
    from lets_talk_cdc_change_feed_playground_spark.functions.sequence import with_global_seq

    seqd = with_global_seq(
        full.select(
            F.col("t"),
            F.col("seq").alias("__src_seq"),
            key.alias("pk"),
            "op",
            F.col("after").alias("data"),
        ),
        F.expr("t div 3600000"),
        ["t", "__src_seq", "pk"],
        out_col="seq",
        start=0,
    )
    return seqd.select("seq", "t", "pk", "op", "data")


def _lane_verdict(expected: DataFrame, actual: DataFrame) -> dict[str, Any]:
    d = diffs.lane_diff(expected, actual).cache()
    try:
        agg = d.agg(
            F.sum((F.col("status") == "missing").cast("int")).alias("missing"),
            F.sum((F.col("status") == "extra").cast("int")).alias("extra"),
            F.coalesce(F.max("lag_ms"), F.lit(0)).alias("max_lag"),
        ).first()
        inv = int(diffs.ordering_inversions(d).first()["ordering_issues"])
    finally:
        d.unpersist()
    missing, extra = int(agg["missing"] or 0), int(agg["extra"] or 0)
    return {
        "missing": missing,
        "extra": extra,
        "ordering_issues": inv,
        "max_lag_ms": int(agg["max_lag"]),
        "pass": missing == 0 and extra == 0 and inv == 0,
    }


def replay_scenario(
    spark: SparkSession,
    path: str,
    fetch_ms: int = DEFAULT_FETCH_MS,
    poll_ms: int = DEFAULT_POLL_MS,
    extract_ms: int = DEFAULT_EXTRACT_MS,
    overhead_ms: int = DEFAULT_OVERHEAD_MS,
    include_soft_deletes: bool = True,
) -> dict[str, Any]:
    """Replay one scenario through all three engines; return the summary the
    reference's comparator panel shows (per-lane verdicts + final state).

    Scenario ops carry *patch* payloads, so the engines run in
    ``merge_payload`` mode and emit the reference's merged row images
    (conf-independent — works under any caller's session)."""
    feed = scenario_feed(spark, path).cache()
    n_ops = feed.count()
    n_deletes = feed.filter(F.col("op") == "delete").count()

    log = capture.log_capture_ops(
        feed, fetch_ms, payload=("data",), merge_payload=True
    ).cache()
    trig = capture.trigger_capture_ops(
        feed, extract_ms, overhead_ms, payload=("data",), merge_payload=True
    ).cache()
    poll = capture.polling_capture_ops(
        feed,
        poll_ms,
        include_soft_deletes=include_soft_deletes,
        payload=("data",),
        merge_payload=True,
    ).cache()

    expected = diffs.expected_entries(feed).cache()
    lanes = {
        "log": _lane_verdict(
            expected, diffs.actual_entries(log, "ts_ms", ["ts_ms", "lsn"])
        ),
        "trigger": _lane_verdict(
            expected,
            diffs.actual_entries(trig, "commit_ts_ms", ["commit_ts_ms", "audit_seq"]),
        ),
        "polling": _lane_verdict(
            expected,
            diffs.actual_entries(poll, "poll_ts_ms", ["poll_ts_ms", "ts_ms", "pk"]),
        ),
    }
    for name, lane_df in (("log", log), ("trigger", trig), ("polling", poll)):
        lanes[name]["events"] = lane_df.count()
        lanes[name]["deletes"] = lane_df.filter(F.col("op") == "d").count()

    # A2: the WAL's merged images make replay a last-image-wins reduction
    # (the LogEngine row store state — deleted keys carry a NULL last image)
    from pyspark.sql import Window as W

    wlast = W.partitionBy("pk").orderBy(F.desc("lsn"))
    state = (
        log.withColumn("__rn", F.row_number().over(wlast))
        .filter((F.col("__rn") == 1) & (F.col("op") != "d"))
        .select("pk", F.col("after_data").alias("data"))
    )
    final_state = {
        r["pk"]: dict(r["data"]) for r in state.orderBy("pk").collect()
    }

    for df in (feed, log, trig, poll, expected):
        df.unpersist()

    return {
        "scenario": path,
        "ops": int(n_ops),
        "deletes": int(n_deletes),
        "lanes": lanes,
        "missed_deletes_polling": int(n_deletes - lanes["polling"]["deletes"]),
        "final_state_rows": len(final_state),
        "final_state": final_state,
    }
