"""Loaders for the driver-provided parquet testdata.

Tables (TPC-H-ish star schema + an ``events`` stream table + LLM-pipeline
``documents``/``embeddings``) live at ``{sf_dir}/{name}.parquet``.
Parquet scans get predicate pushdown + column pruning from Catalyst for free;
at 100 TB the same reads apply with partition pruning if the lake is
date-partitioned — nothing here assumes local mode.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor: only
# region/nation are fixed-size. customer/supplier/part scale linearly with SF
# (tens of GB at the 100 TB design point) — their joins are AQE-planned, never
# hint-forced.
BROADCAST_TABLES = frozenset({"region", "nation"})


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load the ``events`` table, normalizing its nanosecond timestamps.

    The driver writes ``events.parquet`` with INT64 TIMESTAMP(NANOS), which
    Spark's parquet reader rejects; read it as long (legacy conf) and truncate
    ns → µs with integer division (``div``, not ``/`` — ns epoch values exceed
    double's 2^53 exact-integer range), matching DuckDB's TIMESTAMP_NS → µs
    truncation so oracle comparisons line up.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every testdata table present under ``sf_dir``."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            out[name] = load_table(spark, sf_dir, name)
    return out


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load tables and register them as temp views for the SQL surface."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
