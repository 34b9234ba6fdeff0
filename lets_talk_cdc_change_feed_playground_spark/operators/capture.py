"""The three CDC capture engines as deterministic batch transformations.

Reference semantics (all single-threaded tick loops over a ``Map<pk,Row>``
store) re-expressed as per-key window transformations over the derived ops
feed (:mod:`..operators.ops_feed`):

- **C1 log** (``sim/engines/LogEngine.ts:25-131``): every op appends a WAL
  record with a monotonic LSN, before/after images and ``commit_ts = t``;
  the tail is drained every fetch interval — complete, ordered, lossless.
- **C2 polling** (``sim/engines/PollingEngine.ts:23-84``): ops mutate a soft-
  delete row store (update on a deleted/missing row is a NO-OP; delete just
  flags), and each poll emits one event per row changed since the last poll —
  intermediate updates collapse, hard deletes are invisible unless
  ``include_soft_deletes``.
- **C3 trigger** (``sim/engines/TriggerEngine.ts:27-148``): every op appends
  an audit row synchronously with ``commit_ts = t + overhead_ms``; updates
  *revive* soft-deleted rows and deleted rows keep their data, so the before
  image is the last non-delete payload regardless of deletes in between.

Every transformation is per-``pk`` window work (one shuffle on the key, which
all three lanes share) except the log LSN, which uses the bucketed global
sequence from :mod:`..functions.sequence` instead of a single-task sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from lets_talk_cdc_change_feed_playground_spark.functions.sequence import with_global_seq
from lets_talk_cdc_change_feed_playground_spark.operators.ops_feed import (
    EXTRACT_MS,
    FETCH_MS,
    OVERHEAD_MS,
    POLL_MS,
    ops_feed,
)

PAYLOAD = ("event_type", "value", "props")

_OP_CODE = {"insert": "c", "update": "u", "delete": "d"}


def _op_code() -> Column:
    return (
        F.when(F.col("op") == "insert", F.lit("c"))
        .when(F.col("op") == "update", F.lit("u"))
        .otherwise(F.lit("d"))
    )


def _with_after(ops: DataFrame, payload: tuple[str, ...]) -> DataFrame:
    """after image = full payload for insert/update, NULL for delete."""
    cols = [
        F.when(F.col("op") != "delete", F.col(c)).alias(f"after_{c}") for c in payload
    ]
    return ops.select("seq", "t", "pk", "op", *cols)


from lets_talk_cdc_change_feed_playground_spark.functions.maps import (  # noqa: E402
    empty_map as _empty_map,
    merge_maps as _merge_maps,
    null_map as _null_map,
)


def _merged_state(payload_col: str, keep_on_delete: bool):
    """Per-event post-image of the engine's row store when the payload is an
    open-schema MAP of *patches* (scenario ops): insert REPLACES the row,
    update MERGES the patch (``{...cur.data, ...op.after}``), delete removes
    the row (``keep_on_delete=False``, LogEngine) or keeps its data under a
    soft-delete flag (``True``, TriggerEngine/PollingEngine).

    Catalyst prefix-fold formulation: folds the key's event prefix per row —
    O(k²) work per key. Kept ONLY as the cross-check twin for
    :func:`_merged_state_frame` (the linear production path); a hot key with
    10⁵ patch events makes this 10¹⁰ struct copies.
    """
    wpk = W.partitionBy("pk").orderBy("t", "seq").rowsBetween(W.unboundedPreceding, 0)
    prefix = F.collect_list(F.struct(F.col("op"), F.col(payload_col).alias("d"))).over(
        wpk
    )

    def step(acc, e):
        on_delete = F.coalesce(acc, _empty_map()) if keep_on_delete else _null_map()
        return (
            F.when(e["op"] == "delete", on_delete)
            .when(e["op"] == "insert", e["d"])
            .otherwise(_merge_maps(acc, e["d"]))
        )

    return F.aggregate(prefix, _null_map(), step)


def _merged_state_frame(
    ops: DataFrame, payload_col: str, keep_on_delete: bool
) -> DataFrame:
    """Linear per-key row-store fold: ``(seq, t, pk, op, __st)`` where ``__st``
    is the engine's post-image map after each event (same semantics as
    :func:`_merged_state`, O(k) per key instead of O(k²)).

    One ``applyInPandas`` pass grouped on pk — the same shuffle the window
    formulation needs, but each key's slice is walked once with dict merges
    instead of materializing every event prefix. Key order inside each merged
    map reproduces ``merge_maps`` exactly: acc keys not in the patch (acc
    order) then patch keys (patch order) — the JS ``{...cur, ...patch}``
    spread with overridden keys repositioned (`sim/engines/LogEngine.ts:25-131`).
    """
    import pandas as pd  # noqa: F401 — applyInPandas contract

    src = ops.select("seq", "t", "pk", "op", F.col(payload_col).alias("__d"))

    def fold(pdf):
        pdf = pdf.sort_values(["t", "seq"], ignore_index=True)
        cur = None  # None = key absent from the row store
        states = []
        for op, d in zip(pdf["op"], pdf["__d"]):
            if op == "insert":
                cur = None if d is None else dict(d)
            elif op == "update":
                base = (
                    {}
                    if cur is None
                    else {k: v for k, v in cur.items() if d is None or k not in d}
                )
                if d:
                    base.update(d)
                cur = base
            else:  # delete
                if keep_on_delete:
                    cur = {} if cur is None else dict(cur)
                else:
                    cur = None
            states.append(cur if cur is None else dict(cur))
        out = pdf.drop(columns=["__d"])
        out["__st"] = states
        return out

    return src.groupBy("pk").applyInPandas(
        fold, "seq long, t long, pk string, op string, __st map<string,string>"
    )


def log_capture(spark: SparkSession, sf_dir: str, fetch_ms: int = FETCH_MS) -> DataFrame:
    """C1 over the driver-testdata ops feed (materialized once per session)."""
    from lets_talk_cdc_change_feed_playground_spark.operators.shared import shared_df

    return shared_df(
        spark,
        ("lane_log", sf_dir, fetch_ms),
        lambda: log_capture_ops(ops_feed(spark, sf_dir), fetch_ms),
    )


def log_replay_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final materialized state of the C1 log lane (the A2 replay fold over
    the full WAL), session-shared: at least four judged audits consume this
    exact frame (replay-state, incremental-agg convergence, savepoint
    restore, anti-entropy), and it is final-state-sized (one row per live
    pk), so one persist amortizes the per-pk fold across all of them."""
    from lets_talk_cdc_change_feed_playground_spark.operators import diffs
    from lets_talk_cdc_change_feed_playground_spark.operators.shared import shared_df

    return shared_df(
        spark,
        ("log_replay_state", sf_dir),
        lambda: diffs.replay_state(log_capture(spark, sf_dir), ["ts_ms", "lsn"]),
    )


def log_capture_ops(
    ops: DataFrame,
    fetch_ms: int = FETCH_MS,
    payload: tuple[str, ...] = PAYLOAD,
    merge_payload: bool = False,
) -> DataFrame:
    """C1 — WAL-tail capture: ordered, lossless, with before images.

    ``before`` is the previous WAL record's ``after`` for the key (NULL after a
    delete, NULL for inserts) — exactly ``LogEngine.applySourceOp``'s
    ``cur.data`` since the feed carries full row images.

    ``payload`` names the row-image columns: the driver-table trio by default,
    or e.g. ``("data",)`` with a ``MAP<STRING,STRING>`` column for
    open-schema scenario ops. When those map payloads are *patches* (partial
    updates), pass ``merge_payload=True`` to emit the engine's merged row
    images — insert replaces, update merges, delete clears
    (``LogEngine.applySourceOp``) — instead of the raw patches.
    """
    wpk = W.partitionBy("pk").orderBy("t", "seq")
    if merge_payload:
        (c,) = payload
        st = _merged_state_frame(ops, c, keep_on_delete=False)
        df = st.select(
            "seq",
            "t",
            "pk",
            "op",
            F.col("__st").alias(f"after_{c}"),
            F.when(F.col("op") == "insert", _null_map())
            .otherwise(F.lag("__st").over(wpk))
            .alias(f"before_{c}"),
        )
    else:
        df = _with_after(ops, payload)
        df = df.select(
            "*",
            *[
                F.when(F.col("op") == "insert", F.lit(None))
                .otherwise(F.lag(f"after_{c}").over(wpk))
                .alias(f"before_{c}")
                for c in payload
            ],
        )
    df = with_global_seq(df, F.expr(f"t div {fetch_ms}"), ["t", "seq"], "lsn")
    return df.select(
        "lsn",
        _op_code().alias("op"),
        "pk",
        *[f"before_{c}" for c in payload],
        *[f"after_{c}" for c in payload],
        F.col("t").alias("ts_ms"),
        F.concat(F.lit("tx-"), F.col("t")).alias("tx_id"),
        ((F.expr(f"t div {fetch_ms}") + 1) * fetch_ms).alias("emitted_at_ms"),
        F.lit("log").alias("method"),
    )


def polling_capture(
    spark: SparkSession,
    sf_dir: str,
    poll_ms: int = POLL_MS,
    include_soft_deletes: bool = False,
) -> DataFrame:
    """C2 over the driver-testdata ops feed (materialized once per session)."""
    from lets_talk_cdc_change_feed_playground_spark.operators.shared import shared_df

    return shared_df(
        spark,
        ("lane_polling", sf_dir, poll_ms, include_soft_deletes),
        lambda: polling_capture_ops(ops_feed(spark, sf_dir), poll_ms, include_soft_deletes),
    )


def _polling_capture_merge(
    ops: DataFrame, poll_ms: int, include_soft_deletes: bool, c: str
) -> DataFrame:
    """C2 with MAP patch payloads — the PollingEngine row store as a per-key
    fold (``PollingEngine.ts:23-52`` exactly): insert replaces and revives
    (version back to 1), update is a NO-OP on missing/deleted rows else a
    merge, delete is a NO-OP on missing rows else a soft-delete flag that
    keeps the data. Only ops that changed the store (``updated_at_ms`` moved)
    surface; each poll window then emits the key's latest changed state.

    Linear per-key fold (one ``applyInPandas`` pass over each key's slice in
    event order) — same shuffle as the window formulation it replaced, O(k)
    per key instead of the O(k²) per-row prefix materialization."""
    src = ops.select("seq", "t", "pk", "op", F.col(c).alias("__d"))

    def fold(pdf):
        pdf = pdf.sort_values(["t", "seq"], ignore_index=True)
        exists, deleted, version, data = False, False, 0, None
        rows = []
        for seq, t, op, d in zip(pdf["seq"], pdf["t"], pdf["op"], pdf["__d"]):
            if op == "insert":
                exists, deleted, version = True, False, 1
                data = None if d is None else dict(d)
            elif op == "update":
                if not exists or deleted:
                    continue  # NO-OP on missing/deleted rows (updated_at unmoved)
                version += 1
                base = (
                    {}
                    if data is None
                    else {k: v for k, v in data.items() if d is None or k not in d}
                )
                if d:
                    base.update(d)
                data = base
            else:  # delete
                if not exists:
                    continue  # NO-OP on missing rows
                deleted = True  # keeps version + data (soft-delete flag)
            rows.append(
                (
                    pdf["pk"].iloc[0],
                    t,
                    seq,
                    deleted,
                    version,
                    None if data is None else dict(data),
                )
            )
        import pandas as pd

        return pd.DataFrame(
            rows, columns=["pk", "t", "seq", "deleted", "version", "data"]
        )

    eff = (
        src.groupBy("pk")
        .applyInPandas(
            fold,
            "pk string, t long, seq long, deleted boolean, version long,"
            " data map<string,string>",
        )
        .withColumn("poll_id", F.expr(f"t div {poll_ms}"))
    )
    wpoll = W.partitionBy("pk", "poll_id").orderBy(F.desc("t"), F.desc("seq"))
    latest = eff.withColumn("__rn", F.row_number().over(wpoll)).filter(F.col("__rn") == 1)
    if not include_soft_deletes:
        latest = latest.filter(~F.col("deleted"))
    return latest.select(
        ((F.col("poll_id") + 1) * poll_ms).alias("poll_ts_ms"),
        F.when(F.col("deleted"), F.lit("d"))
        .when(F.col("version") > 1, F.lit("u"))
        .otherwise(F.lit("c"))
        .alias("op"),
        "pk",
        F.when(~F.col("deleted"), F.col("data")).alias(f"after_{c}"),
        F.col("t").alias("ts_ms"),
        F.concat(F.lit("tx-"), F.col("t")).alias("tx_id"),
        F.lit("polling").alias("method"),
    )


def polling_capture_ops(
    ops: DataFrame,
    poll_ms: int = POLL_MS,
    include_soft_deletes: bool = False,
    payload: tuple[str, ...] = PAYLOAD,
    merge_payload: bool = False,
) -> DataFrame:
    """C2 — query-based capture: per-poll last-write-wins over a soft-delete store.

    Effective ops (the ones that touch the row store / its ``updated_at``):
    inserts, updates *before* the key's first delete, and every delete
    (re-deleting a soft-deleted row refreshes ``updated_at`` —
    ``PollingEngine.ts:43-52``).  Each poll window then emits the key's state
    at its last effective op: ``d`` if soft-deleted (dropped entirely unless
    ``include_soft_deletes``), else ``u`` when version > 1, ``c`` for fresh
    inserts. Version counts applied insert/updates only.

    ``merge_payload=True`` (single MAP patch payload) switches to the exact
    PollingEngine row-store fold, which additionally honours
    insert-after-delete revival and delete-on-missing no-ops — cases the
    driver feed never produces but scenario fixtures can.
    """
    if merge_payload:
        (c,) = payload
        return _polling_capture_merge(ops, poll_ms, include_soft_deletes, c)
    wall = W.partitionBy("pk")
    wordered = W.partitionBy("pk").orderBy("t", "seq")

    first_del = F.min(F.when(F.col("op") == "delete", F.col("seq"))).over(wall)
    eff = ops.withColumn("__first_del", first_del).filter(
        (F.col("op") != "update")
        | F.col("__first_del").isNull()
        | (F.col("seq") < F.col("__first_del"))
    )

    state = eff.select(
        "seq",
        "t",
        "pk",
        F.expr(f"t div {poll_ms}").alias("poll_id"),
        F.max(F.when(F.col("op") == "delete", 1).otherwise(0))
        .over(wordered)
        .alias("deleted"),
        F.sum(F.when(F.col("op") != "delete", 1).otherwise(0))
        .over(wordered)
        .alias("version"),
        *[
            F.last(F.when(F.col("op") != "delete", F.col(c)), ignorenulls=True)
            .over(wordered)
            .alias(f"data_{c}")
            for c in payload
        ],
    )

    wpoll = W.partitionBy("pk", "poll_id").orderBy(F.desc("t"), F.desc("seq"))
    latest = state.withColumn("__rn", F.row_number().over(wpoll)).filter(F.col("__rn") == 1)
    if not include_soft_deletes:
        latest = latest.filter(F.col("deleted") == 0)
    return latest.select(
        ((F.col("poll_id") + 1) * poll_ms).alias("poll_ts_ms"),
        F.when(F.col("deleted") == 1, F.lit("d"))
        .when(F.col("version") > 1, F.lit("u"))
        .otherwise(F.lit("c"))
        .alias("op"),
        "pk",
        *[
            F.when(F.col("deleted") == 0, F.col(f"data_{c}")).alias(f"after_{c}")
            for c in payload
        ],
        F.col("t").alias("ts_ms"),
        F.concat(F.lit("tx-"), F.col("t")).alias("tx_id"),
        F.lit("polling").alias("method"),
    )


def trigger_capture(
    spark: SparkSession,
    sf_dir: str,
    extract_ms: int = EXTRACT_MS,
    overhead_ms: int = OVERHEAD_MS,
) -> DataFrame:
    """C3 over the driver-testdata ops feed (materialized once per session)."""
    from lets_talk_cdc_change_feed_playground_spark.operators.shared import shared_df

    return shared_df(
        spark,
        ("lane_trigger", sf_dir, extract_ms, overhead_ms),
        lambda: trigger_capture_ops(ops_feed(spark, sf_dir), extract_ms, overhead_ms),
    )


def trigger_capture_ops(
    ops: DataFrame,
    extract_ms: int = EXTRACT_MS,
    overhead_ms: int = OVERHEAD_MS,
    payload: tuple[str, ...] = PAYLOAD,
    merge_payload: bool = False,
) -> DataFrame:
    """C3 — audit-table capture: synchronous append with write-path overhead.

    Complete and ordered like the log, but ``commit_ts = t + overhead_ms``
    models the trigger write cost, and the before image is the last non-delete
    payload for the key (deleted rows keep their data; updates revive them —
    ``TriggerEngine.ts:62-100``). ``audit_seq`` stands in for the reference's
    random ``audit_id`` (``TriggerEngine.ts:148`` — randomness would break the
    deterministic replay contract).

    With ``merge_payload=True`` (single MAP payload of patches) the images
    are the trigger row store's merged states: insert replaces, update
    merges and revives, delete keeps data under the flag, and a delete on a
    never-seen key audits an empty ``{}`` before image
    (``TriggerEngine.ts:87-105``).
    """
    wpk = W.partitionBy("pk").orderBy("t", "seq")
    if merge_payload:
        (c,) = payload
        st = _merged_state_frame(ops, c, keep_on_delete=True)
        prev = F.lag("__st").over(wpk)
        df = st.select(
            "seq",
            "t",
            "pk",
            "op",
            F.when(F.col("op") != "delete", F.col("__st")).alias(f"after_{c}"),
            F.when(F.col("op") == "insert", _null_map())
            .when(F.col("op") == "delete", F.coalesce(prev, _empty_map()))
            .otherwise(prev)
            .alias(f"before_{c}"),
        )
    else:
        wprev = wpk.rowsBetween(W.unboundedPreceding, -1)
        df = _with_after(ops, payload)
        df = df.select(
            "*",
            *[
                F.when(F.col("op") == "insert", F.lit(None))
                .otherwise(
                    F.last(F.when(F.col("op") != "delete", F.col(f"after_{c}")), ignorenulls=True).over(wprev)
                )
                .alias(f"before_{c}")
                for c in payload
            ],
        )
    df = with_global_seq(df, F.expr(f"t div {extract_ms}"), ["t", "seq"], "audit_seq")
    return df.select(
        "audit_seq",
        _op_code().alias("op"),
        "pk",
        *[f"before_{c}" for c in payload],
        *[f"after_{c}" for c in payload],
        (F.col("t") + overhead_ms).alias("commit_ts_ms"),
        F.concat(F.lit("tx-"), F.col("t") + overhead_ms).alias("tx_id"),
        ((F.expr(f"t div {extract_ms}") + 1) * extract_ms).alias("emitted_at_ms"),
        F.lit("trigger").alias("method"),
    )
