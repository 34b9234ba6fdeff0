"""S4 — deterministic workload generator for the streaming pipeline.

The reference generates live ops from a cycle counter with a fixed op mix
(``src/ui/generator.ts:171-254``: ``opCounter % 6`` → 4 inserts : 1 update :
1 delete against a bounded key space) paced by a token bucket.  The Spark
form: any monotonically increasing ``value`` column (``readStream.format
("rate")``'s schema, or ``spark.range`` in batch tests) is mapped through
pure column functions — zero RNG at execution time, so replays are identical.
Rate limiting maps to the source's own ``rowsPerSecond`` /
``maxOffsetsPerTrigger`` instead of a driver-side token bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KEYSPACE = 50
OP_CYCLE = 6  # 0-3 insert, 4 update, 5 delete — generator.ts:181-193


def ops_from_counter(df: DataFrame, counter: str = "value", t0_ms: int = 0, step_ms: int = 10) -> DataFrame:
    """Map a counter column to a deterministic SourceOp stream.

    Output schema matches the batch ops feed: (seq, t, pk, op, event_type,
    value, props)."""
    # rename the counter so the emitted ``value`` alias can't lateral-bind
    # into later expressions of the same select
    df = df.withColumnRenamed(counter, "__ctr")
    c: Column = F.col("__ctr")
    cycle = c % OP_CYCLE
    op = (
        F.when(cycle <= 3, F.lit("insert"))
        .when(cycle == 4, F.lit("update"))
        .otherwise(F.lit("delete"))
    )
    etype = F.element_at(
        F.array(F.lit("signup"), F.lit("click"), F.lit("view"), F.lit("purchase")),
        (c % 4 + 1).cast("int"),
    )
    return df.select(
        c.alias("seq"),
        (F.lit(t0_ms) + c * step_ms).alias("t"),
        F.pmod(c * 7, F.lit(KEYSPACE)).cast("string").alias("pk"),
        op.alias("op"),
        etype.alias("event_type"),
        F.round((F.pmod(c * 131, F.lit(10000))) / 100.0, 2).alias("value"),
        F.concat(F.lit('{"k": '), F.pmod(c, F.lit(100)), F.lit("}")).alias("props"),
    )
