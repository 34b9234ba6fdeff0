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
    if state.exists:
        total, events_json = state.get
        buffered: list[dict] = json.loads(events_json)
    else:
        total, buffered = None, []

    for pdf in pdf_iter:
        for row in pdf.sort_values(["t", "tx_index"]).itertuples(index=False):
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
        yield pd.DataFrame(columns=[f.name for f in ASSEMBLED_SCHEMA.fields])


def assemble_transactions(events: DataFrame) -> DataFrame:
    """Complete transactions only, events in index order within each txn."""
    return events.groupBy("tx_id").applyInPandasWithState(
        _assemble_group,
        outputStructType=ASSEMBLED_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
