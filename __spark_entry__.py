"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` is the smoke check; ``queries()`` / ``oracle_sql()`` are the
correctness gate (each query runs on Spark at sf=0.01 and is hash-compared to
its DuckDB oracle over the same parquet tables).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from lets_talk_cdc_change_feed_playground_spark import registry  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the pipeline verdict — all three capture lanes diffed
    against the source ops (missing/extra/ordering/lag + pass per lane), the
    reference's headline comparison."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return registry.queries()["cdc_verdict"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each SQL-expressible query."""
    return registry.oracle_sql()
