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
    partition_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Add ``out_col`` = dense rank of rows ordered by (bucket, *order_cols),
    computed independently per ``partition_cols`` group (global when empty)."""
    bucket = F.col(bucket_col) if isinstance(bucket_col, str) else bucket_col
    src = df.withColumn("__bucket", bucket)
    pc = list(partition_cols)

    counts = src.groupBy(*pc, "__bucket").agg(F.count(F.lit(1)).alias("__n"))
    off_w = W.partitionBy(*pc).orderBy("__bucket").rowsBetween(W.unboundedPreceding, -1)
    offsets = counts.select(
        *pc,
        "__bucket",
        F.coalesce(F.sum("__n").over(off_w), F.lit(0)).alias("__off"),
    )

    in_bucket = F.row_number().over(
        W.partitionBy(*pc, "__bucket").orderBy(*order_cols)
    )
    return (
        src.join(F.broadcast(offsets), [*pc, "__bucket"])
        .withColumn(out_col, (F.col("__off") + in_bucket + F.lit(start - 1)).cast("long"))
        .drop("__bucket", "__off")
    )


def grouped_exact_percentiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str | Column,
    qs: dict[float, str],
) -> DataFrame:
    """EXACT linear-interpolation percentiles per group without a data-sized
    aggregation buffer, for DISCRETE value domains.

    ``percentile(col, q)`` is exact but buffers every group value in ONE
    aggregation state and sorts it there — at 100 TB a group's full value
    vector in a single task is the textbook unbounded-state aggregation (it
    is how the reference computes lane lag p50/p95 on an in-memory array,
    ``src/engine/metrics.ts:97-139``).  This computes the identical result
    as a *weighted percentile over the value histogram*:

    1. one map-side-combinable aggregation: row count per (group, value) —
       the only pass over the data;
    2. cumulative counts over the histogram (windows partitioned by group,
       one row per DISTINCT value — bounded by the value domain, not the
       data volume);
    3. the two order statistics each quantile needs (``p = q·(n-1)``, ranks
       ``⌊p⌋+1`` / ``⌈p⌉+1``) picked as conditional mins over the histogram,
       interpolated exactly as Spark's ``Percentile`` does:
       ``(⌈p⌉-p)·v_lo + (p-⌊p⌋)·v_hi`` (``v_lo`` when ``⌈p⌉=⌊p⌋``).

    Contract: ``value_col`` must have bounded distinct cardinality per group
    (integer milliseconds, bucketed doubles, enum codes…) — the histogram is
    the scale knob.  Lag values are integer ms deltas whose spread is bounded
    by the delivery delay, so the histogram stays small at any row count.
    ``qs`` maps quantile → output column name.  Nulls are ignored, like
    ``percentile``; a group of only nulls is absent (left-join it back to
    preserve such groups).
    """
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    hist = (
        df.select(*group_cols, v.cast("double").alias("__v"))
        .filter(F.col("__v").isNotNull())
        .groupBy(*group_cols, "__v")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    return percentiles_from_hist(hist, group_cols, qs)


def percentiles_from_hist(
    hist: DataFrame,
    group_cols: list[str],
    qs: dict[float, str],
) -> DataFrame:
    """Steps 2-3 of :func:`grouped_exact_percentiles` over a prebuilt value
    histogram — ``hist`` must carry ``(*group_cols, __v double, __n long)``
    with one row per (group, distinct value).  Callers that stage one
    histogram per session (several metric queries percentile the same lag
    column) skip re-running the data pass entirely."""
    w_cum = (
        W.partitionBy(*group_cols).orderBy("__v").rowsBetween(W.unboundedPreceding, 0)
    )
    w_all = W.partitionBy(*group_cols)
    h = hist.withColumn("__cum", F.sum("__n").over(w_cum)).withColumn(
        "__total", F.sum("__n").over(w_all)
    )
    aggs, posts = [], {}
    for q, name in qs.items():
        p = F.lit(float(q)) * (F.col("__total") - 1).cast("double")
        rlo = F.floor(p) + 1
        rhi = F.ceil(p) + 1
        aggs.append(F.min(F.when(F.col("__cum") >= rlo, F.col("__v"))).alias(f"__lo_{name}"))
        aggs.append(F.min(F.when(F.col("__cum") >= rhi, F.col("__v"))).alias(f"__hi_{name}"))
        posts[name] = float(q)
    out = h.groupBy(*group_cols).agg(F.max("__total").alias("__total"), *aggs)
    for name, q in posts.items():
        p = F.lit(q) * (F.col("__total") - 1).cast("double")
        out = out.withColumn(
            name,
            F.when(F.ceil(p) == F.floor(p), F.col(f"__lo_{name}")).otherwise(
                (F.ceil(p) - p) * F.col(f"__lo_{name}")
                + (p - F.floor(p)) * F.col(f"__hi_{name}")
            ),
        )
    return out.select(*group_cols, *qs.values())


def with_prefix_aggs(
    df: DataFrame,
    bucket_col: str | Column,
    order_cols: list[str],
    sums: dict[str, str] | None = None,
    maxes: dict[str, str] | None = None,
    partition_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Running aggregates in (bucket, *order_cols) order without a single-task
    window.

    ``sums`` / ``maxes`` map output column → input column; each output is the
    cumulative SUM / MAX (nulls ignored, like the window functions) of its
    input over all rows up to and including the current one, ordered by
    ``(bucket, *order_cols)`` within each ``partition_cols`` group.

    Decomposition (exact for sum and max): per-bucket running agg via a
    *partitioned* window + a broadcast prefix over per-bucket totals — the only
    unpartitioned window runs over one row per bucket. ``bucket_col`` must be a
    monotone coarsening of the ordering (e.g. ``ts div 3_600_000``)."""
    sums = sums or {}
    maxes = maxes or {}
    bucket = F.col(bucket_col) if isinstance(bucket_col, str) else bucket_col
    src = df.withColumn("__bucket", bucket)
    pc = list(partition_cols)

    local_w = (
        W.partitionBy(*pc, "__bucket")
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    for out, col in sums.items():
        src = src.withColumn(f"__l_{out}", F.sum(col).over(local_w))
    for out, col in maxes.items():
        src = src.withColumn(f"__l_{out}", F.max(col).over(local_w))

    totals = src.groupBy(*pc, "__bucket").agg(
        *[F.sum(c).alias(f"__b_{o}") for o, c in sums.items()],
        *[F.max(c).alias(f"__b_{o}") for o, c in maxes.items()],
    )
    prefix_w = (
        W.partitionBy(*pc).orderBy("__bucket").rowsBetween(W.unboundedPreceding, -1)
    )
    prefix = totals.select(
        *pc,
        "__bucket",
        *[F.sum(f"__b_{o}").over(prefix_w).alias(f"__p_{o}") for o in sums],
        *[F.max(f"__b_{o}").over(prefix_w).alias(f"__p_{o}") for o in maxes],
    )

    out_df = src.join(F.broadcast(prefix), [*pc, "__bucket"])
    for out in sums:
        out_df = out_df.withColumn(
            out,
            F.when(
                F.col(f"__l_{out}").isNull() & F.col(f"__p_{out}").isNull(), F.lit(None)
            ).otherwise(
                F.coalesce(f"__l_{out}", F.lit(0)) + F.coalesce(f"__p_{out}", F.lit(0))
            ),
        )
    for out in maxes:
        out_df = out_df.withColumn(out, F.greatest(f"__l_{out}", f"__p_{out}"))
    drop = ["__bucket"] + [f"__l_{o}" for o in (*sums, *maxes)] + [
        f"__p_{o}" for o in (*sums, *maxes)
    ]
    return out_df.drop(*drop)
