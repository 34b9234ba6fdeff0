"""A5 — transaction assembly on consume, as a stateful streaming operator.

The reference buffers events per ``txId`` until the transaction is complete
(``index >= total-1`` / ``last``), then releases the whole group in index
order (``web/App.tsx:2115-2156``; same buffering as apply-on-commit,
``src/changefeed/model.ts:176-205``).  Streaming form: keyed state per
``tx_id`` holds the partial buffer across micro-batches; a transaction's
events are emitted (with ``assembled_at_batch`` tagging) only once complete —
partial transactions are never visible downstream.
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

TXN_EVENT_SCHEMA = StructType(
    [
        StructField("tx_id", StringType()),
        StructField("tx_index", IntegerType()),
        StructField("tx_total", IntegerType()),
        StructField("t", LongType()),
        StructField("pk", StringType()),
        StructField("op", StringType()),
        StructField("payload", StringType()),
    ]
)

ASSEMBLED_SCHEMA = StructType(
    [
        StructField("tx_id", StringType()),
        StructField("tx_index", IntegerType()),
        StructField("tx_total", IntegerType()),
        StructField("t", LongType()),
        StructField("pk", StringType()),
        StructField("op", StringType()),
        StructField("payload", StringType()),
        StructField("n_events", IntegerType()),
    ]
)

# buffered partial txn: events as a JSON array string (state must be flat)
STATE_SCHEMA = StructType(
    [
        StructField("total", IntegerType()),
        StructField("events_json", StringType()),
    ]
)


def _assemble_group(
    key: tuple[Any, ...], pdf_iter: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (tx_id,) = key
    pdfs = list(pdf_iter)
    if not pdfs:  # timeout invocations deliver an empty iterator
        return
    new = pdfs[0] if len(pdfs) == 1 else pd.concat(pdfs, ignore_index=True)

    # Fast path — the overwhelmingly common case at volume: the transaction
    # has no buffered history and completes inside this batch. Emit the
    # batch rows vectorized; no per-row python, no state churn.
    if not state.exists and len(new) >= int(new["tx_total"].iloc[0]):
        out = new.sort_values("tx_index", ignore_index=True)
        out["tx_id"] = tx_id  # grouping column: already present, keep exact
        out["n_events"] = len(out)
        yield out[[f.name for f in ASSEMBLED_SCHEMA.fields]]
        return

    # Slow path — the txn straddles micro-batches: buffer rows in state.
    if state.exists:
        total, events_json = state.get
        buffered: list[dict] = json.loads(events_json)
    else:
        total, buffered = None, []
    for row in new.sort_values(["t", "tx_index"]).itertuples(index=False):
        buffered.append(
            {
                "tx_index": int(row.tx_index),
                "t": int(row.t),
                "pk": row.pk,
                "op": row.op,
                "payload": row.payload,
            }
        )
        total = int(row.tx_total)

    if total is not None and len(buffered) >= total:
        ordered = sorted(buffered, key=lambda e: e["tx_index"])
        out = pd.DataFrame(
            [
                {
                    "tx_id": tx_id,
                    "tx_index": e["tx_index"],
                    "tx_total": total,
                    "t": e["t"],
                    "pk": e["pk"],
                    "op": e["op"],
                    "payload": e["payload"],
                    "n_events": len(ordered),
                }
                for e in ordered
            ],
            columns=[f.name for f in ASSEMBLED_SCHEMA.fields],
        )
        state.remove()
        yield out
    else:
        state.update((total, json.dumps(buffered)))


def assemble_transactions(events: DataFrame) -> DataFrame:
    """Complete transactions only, events in index order within each txn."""
    return events.groupBy("tx_id").applyInPandasWithState(
        _assemble_group,
        outputStructType=ASSEMBLED_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# Bucketed variant: state keyed per txn is semantically cleanest, but a
# high-cardinality key space pays one state-store lookup + one python/Arrow
# round trip PER TXN PER BATCH.  Keying the state by a hash bucket of the
# txn id instead trades key cardinality for value size: each call handles a
# whole bucket vectorized in pandas, and the buffered residue (only txns
# straddling a batch boundary) rides in one JSON state value per bucket.
# Same released set, same columns — the standard state-store tuning move
# when transactions are short-lived and plentiful.

_BUCKET_STATE_SCHEMA = StructType([StructField("pending_json", StringType())])

_EVENT_COLS = ["tx_id", "tx_index", "tx_total", "t", "pk", "op", "payload"]


def _assemble_bucket(
    key: tuple[Any, ...], pdf_iter: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    pdfs = list(pdf_iter)
    new = pdfs[0] if len(pdfs) == 1 else pd.concat(pdfs, ignore_index=True)
    new = new[_EVENT_COLS]
    if state.exists:
        pending = pd.DataFrame(json.loads(state.get[0]), columns=_EVENT_COLS)
        new = pd.concat([pending, new], ignore_index=True)

    sizes = new.groupby("tx_id")["tx_index"].transform("size")
    complete = sizes >= new["tx_total"]
    done = new[complete]
    if len(done):
        out = done.sort_values(["tx_id", "tx_index"], ignore_index=True)
        out["n_events"] = out.groupby("tx_id")["tx_index"].transform("size")
        yield out[[f.name for f in ASSEMBLED_SCHEMA.fields]]

    rest = new[~complete]
    if len(rest):
        state.update((json.dumps(rest.values.tolist()),))
    elif state.exists:
        state.remove()


def assemble_transactions_bucketed(events: DataFrame, buckets: int = 64) -> DataFrame:
    """A5 with bucket-keyed state (see above): identical released set and
    columns as :func:`assemble_transactions`, ``buckets`` state keys total."""
    from pyspark.sql import functions as F

    ev = events.withColumn("bucket", F.pmod(F.xxhash64("tx_id"), F.lit(buckets)))
    return ev.groupBy("bucket").applyInPandasWithState(
        _assemble_bucket,
        outputStructType=ASSEMBLED_SCHEMA,
        stateStructType=_BUCKET_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
