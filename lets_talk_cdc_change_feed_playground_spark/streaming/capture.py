"""Structured Streaming capture: incremental log-mode CDC with keyed state.

The batch engines (:mod:`..operators.capture`) replay a complete ops feed;
this module runs the same LogEngine semantics (``sim/engines/LogEngine.ts:
25-131``) *incrementally* over a streaming ops source: per-key state holds
the current row image so each micro-batch emits change events with correct
before images, across batch boundaries.

Mapping notes:
- the reference's global ``lsn`` comes from the sink's offsets in a real
  deployment (Kafka partition offsets / Delta commit versions); the streamed
  events carry ``seq`` so tests can align them with the batch WAL;
- a micro-batch trigger plays the role of the fetch interval;
- per-key ordering across micro-batches relies on the source delivering a
  key's rows in time order batch-over-batch (true for time-split files and
  for Kafka per-partition order with keyed produce).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OPS_SCHEMA = StructType(
    [
        StructField("seq", LongType()),
        StructField("t", LongType()),
        StructField("pk", StringType()),
        StructField("op", StringType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

EVENT_SCHEMA = StructType(
    [
        StructField("seq", LongType()),
        StructField("op", StringType()),
        StructField("pk", StringType()),
        StructField("before_event_type", StringType()),
        StructField("before_value", DoubleType()),
        StructField("before_props", StringType()),
        StructField("after_event_type", StringType()),
        StructField("after_value", DoubleType()),
        StructField("after_props", StringType()),
        StructField("ts_ms", LongType()),
        StructField("tx_id", StringType()),
        StructField("method", StringType()),
    ]
)

# per-key row image: (exists, event_type, value, props)
STATE_SCHEMA = StructType(
    [
        StructField("exists", BooleanType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

_OP_CODE = {"insert": "c", "update": "u", "delete": "d"}


def _capture_group(
    key: tuple[Any, ...], pdf_iter: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """LogEngine.applySourceOp over one key's micro-batch slice."""
    (pk,) = key
    if state.exists:
        exists, ev, val, props = state.get
    else:
        exists, ev, val, props = False, None, None, None

    out: list[dict] = []
    # a key's batch slice can arrive as multiple Arrow frames — sort the
    # concatenated slice, never per frame (the fold is order-sensitive)
    pdfs = list(pdf_iter)
    # <=1 guard: a timeout invocation delivers an EMPTY iterator, and
    # pd.concat([]) raises — unreachable under NoTimeout but latent
    for pdf in pdfs if len(pdfs) <= 1 else [pd.concat(pdfs, ignore_index=True)]:
        pdf = pdf.sort_values(["t", "seq"])
        for row in pdf.itertuples(index=False):
            op = row.op
            before = (ev, val, props) if exists else (None, None, None)
            if op == "delete":
                after = (None, None, None)
                exists = False
            else:
                after = (row.event_type, row.value, row.props)
                # insert overwrites unconditionally; update merges — full row
                # images make both a replacement (LogEngine.ts:33-80)
                exists, (ev, val, props) = True, after
            out.append(
                {
                    "seq": row.seq,
                    "op": _OP_CODE[op],
                    "pk": pk,
                    "before_event_type": None if op == "insert" else before[0],
                    "before_value": None if op == "insert" else before[1],
                    "before_props": None if op == "insert" else before[2],
                    "after_event_type": after[0],
                    "after_value": after[1],
                    "after_props": after[2],
                    "ts_ms": row.t,
                    "tx_id": f"tx-{row.t}",
                    "method": "log",
                }
            )

    state.update((exists, ev, val, props))
    yield pd.DataFrame(out, columns=[f.name for f in EVENT_SCHEMA.fields])


def log_capture_stream(ops_stream: DataFrame) -> DataFrame:
    """Streaming C1: ops stream → change-event stream with before images."""
    return ops_stream.groupBy("pk").applyInPandasWithState(
        _capture_group,
        outputStructType=EVENT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
