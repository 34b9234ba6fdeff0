"""Scalable global sequence assignment.

A bare ``row_number() OVER (ORDER BY ...)`` forces every row through one task —
the classic single-node bottleneck this engine must avoid at 100 TB.  The WAL
LSN (``sim/engines/LogEngine.ts:42`` ``lsn: ++this.lsn``) needs exactly that: a
dense, contiguous, globally ordered sequence.

``with_global_seq`` assigns it in two distributed steps instead:

1. aggregate row counts per coarse *bucket* of the ordering key (e.g. a time
   window) and turn them into cumulative offsets — the only unpartitioned
   window runs over **one row per bucket**, not per data row;
2. broadcast-join the offsets back and add a per-bucket ``row_number``, which
   is partitioned window work.

Requirements: ``bucket_col`` must be coarse enough that the offsets frame is
tiny (minutes/hours/days of event time) and the full ordering ``(bucket,
*order_cols)`` must be total for determinism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def with_global_seq(
    df: DataFrame,
    bucket_col: str | Column,
    order_cols: list[str],
    out_col: str = "lsn",
    start: int = 1,
) -> DataFrame:
    """Add ``out_col`` = dense global rank of rows ordered by (bucket, *order_cols)."""
    bucket = F.col(bucket_col) if isinstance(bucket_col, str) else bucket_col
    src = df.withColumn("__bucket", bucket)

    counts = src.groupBy("__bucket").agg(F.count(F.lit(1)).alias("__n"))
    off_w = W.orderBy("__bucket").rowsBetween(W.unboundedPreceding, -1)
    offsets = counts.select(
        "__bucket",
        F.coalesce(F.sum("__n").over(off_w), F.lit(0)).alias("__off"),
    )

    in_bucket = F.row_number().over(W.partitionBy("__bucket").orderBy(*order_cols))
    return (
        src.join(F.broadcast(offsets), "__bucket")
        .withColumn(out_col, (F.col("__off") + in_bucket + F.lit(start - 1)).cast("long"))
        .drop("__bucket", "__off")
    )
