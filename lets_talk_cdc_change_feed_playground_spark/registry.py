"""Central registry of judged queries and their DuckDB oracle SQL.

Every operator from SURVEY.md §2 that is implemented gets a ``queries()``
entry here (``name -> (spark, sf_dir) -> DataFrame``) and, when the semantics
are SQL-expressible, a matching ``oracle_sql()`` string for the DuckDB gate.
Column names/aliases match exactly between the two sides.
"""

from __future__ import annotations

import importlib
import importlib.util
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def _collect() -> tuple[dict[str, QueryFn], dict[str, str]]:
    queries: dict[str, QueryFn] = {}
    oracle: dict[str, str] = {}

    from lets_talk_cdc_change_feed_playground_spark.plans import relational

    modules = [relational]
    # Optional query modules: skip only when the module file genuinely does
    # not exist — an ImportError raised INSIDE an existing module (typo,
    # missing dependency) must propagate, not silently shrink coverage.
    for mod_name in (
        "lets_talk_cdc_change_feed_playground_spark.plans.layout_queries",
        "lets_talk_cdc_change_feed_playground_spark.operators.cdc_queries",
        "lets_talk_cdc_change_feed_playground_spark.operators.playground_queries",
        "lets_talk_cdc_change_feed_playground_spark.operators.reliability_queries",
        "lets_talk_cdc_change_feed_playground_spark.operators.compat_queries",
        "lets_talk_cdc_change_feed_playground_spark.operators.temporal_queries",
        "lets_talk_cdc_change_feed_playground_spark.operators.transform_queries",
        "lets_talk_cdc_change_feed_playground_spark.operators.replication_queries",
        "lets_talk_cdc_change_feed_playground_spark.operators.ivm_queries",
        "lets_talk_cdc_change_feed_playground_spark.operators.integrity_queries",
        "lets_talk_cdc_change_feed_playground_spark.operators.governance_queries",
        "lets_talk_cdc_change_feed_playground_spark.functions.pipeline_queries",
        "lets_talk_cdc_change_feed_playground_spark.functions.sketch_queries",
        "lets_talk_cdc_change_feed_playground_spark.functions.ann_queries",
        "lets_talk_cdc_change_feed_playground_spark.functions.retrieval_queries",
        "lets_talk_cdc_change_feed_playground_spark.functions.lm_queries",
        "lets_talk_cdc_change_feed_playground_spark.functions.graph_queries",
        "lets_talk_cdc_change_feed_playground_spark.functions.training_queries",
        "lets_talk_cdc_change_feed_playground_spark.functions.multimodal",
        "lets_talk_cdc_change_feed_playground_spark.streaming.stream_queries",
    ):
        if importlib.util.find_spec(mod_name) is not None:
            modules.append(importlib.import_module(mod_name))

    for mod in modules:
        for name, fn in mod.QUERIES.items():
            if name in queries:
                raise ValueError(f"duplicate query name: {name}")
            queries[name] = fn
        oracle.update(getattr(mod, "ORACLE", {}))
    return queries, oracle


# Runtime SQL confs the judged queries depend on; pinned per call so the
# queries behave identically under ANY caller's session (the driver gate
# builds its own bare SparkSession), not just our get_spark().
_REQUIRED_CONF = {
    "spark.sql.session.timeZone": "UTC",  # epoch math on the NTZ ts column
    "spark.sql.mapKeyDedupPolicy": "LAST_WIN",  # JS object-spread merge folds
    "spark.sql.legacy.parquet.nanosAsLong": "true",  # events TIMESTAMP(NANOS)
}


def _with_conf(fn: QueryFn) -> QueryFn:
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        for k, v in _REQUIRED_CONF.items():
            spark.conf.set(k, v)
        return fn(spark, sf_dir)

    wrapped.__name__ = getattr(fn, "__name__", "query")
    wrapped.__doc__ = fn.__doc__
    return wrapped


def queries() -> dict[str, QueryFn]:
    return {name: _with_conf(fn) for name, fn in _collect()[0].items()}


def oracle_sql() -> dict[str, str]:
    return _collect()[1]
