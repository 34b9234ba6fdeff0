"""Streaming consumer apply: idempotent upsert sink via ``foreachBatch``.

A1/S9 in streaming form (``src/domain/storage.ts:133-164``,
``scenarios/01-canonical-reference/sink/consumer.mjs:292-356``): every
micro-batch of change events is merged into a keyed table — deletes remove
the key, creates/updates replace the row (full row images).  In a Delta
deployment this is ``MERGE INTO target USING batch ON pk WHEN MATCHED AND
op='d' THEN DELETE WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED AND
op<>'d' THEN INSERT *``; this dependency-free stand-in keeps identical
semantics with a read-union-reduce-overwrite cycle per batch, which is the
same idempotent last-write-wins merge (re-delivered batches converge).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

STORE_ORDER = ["ts_ms", "seq"]


def merge_batch(store_df: DataFrame | None, batch_df: DataFrame) -> DataFrame:
    """Fold a batch of change events into the current store state."""
    events = batch_df.select(
        "pk",
        "op",
        "after_event_type",
        "after_value",
        "after_props",
        "ts_ms",
        "seq",
    )
    if store_df is not None:
        # stored rows replay as creates at their materialized (ts, seq)
        events = store_df.select(
            "pk",
            F.lit("c").alias("op"),
            F.col("event_type").alias("after_event_type"),
            F.col("value").alias("after_value"),
            F.col("props").alias("after_props"),
            "ts_ms",
            "seq",
        ).unionByName(events)
    w = W.partitionBy("pk").orderBy(*[F.desc(c) for c in STORE_ORDER])
    return (
        events.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col("op") != "d"))
        .select(
            "pk",
            F.col("after_event_type").alias("event_type"),
            F.col("after_value").alias("value"),
            F.col("after_props").alias("props"),
            "ts_ms",
            "seq",
        )
    )


class UpsertSink:
    """``foreachBatch`` target maintaining a keyed table as versioned parquet.

    Each batch reads the latest version directory and writes the merged state
    as the next one (a miniature of Delta's commit versioning) — no
    driver-side collects, and re-running a batch just rewrites the same
    deterministic state (idempotent)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def _versions(self) -> list[int]:
        if not os.path.isdir(self.path):
            return []
        return sorted(
            int(d.split("=")[1])
            for d in os.listdir(self.path)
            if d.startswith("v=") and d.split("=")[1].isdigit()
        )

    def current(self) -> DataFrame | None:
        vs = self._versions()
        if not vs:
            return None
        return self.spark.read.parquet(os.path.join(self.path, f"v={vs[-1]}"))

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        vs = self._versions()
        merged = merge_batch(self.current(), batch_df)
        nxt = (vs[-1] + 1) if vs else 0
        merged.write.mode("overwrite").parquet(os.path.join(self.path, f"v={nxt}"))
