"""Central registry of judged queries and their DuckDB oracle SQL.

Every operator from SURVEY.md §2 that is implemented gets a ``queries()``
entry here (``name -> (spark, sf_dir) -> DataFrame``) and, when the semantics
are SQL-expressible, a matching ``oracle_sql()`` string for the DuckDB gate.
Column names/aliases match exactly between the two sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def _collect() -> tuple[dict[str, QueryFn], dict[str, str]]:
    queries: dict[str, QueryFn] = {}
    oracle: dict[str, str] = {}

    from lets_talk_cdc_change_feed_playground_spark.plans import relational

    modules = [relational]
    try:
        from lets_talk_cdc_change_feed_playground_spark.operators import cdc_queries

        modules.append(cdc_queries)
    except ImportError:
        pass
    try:
        from lets_talk_cdc_change_feed_playground_spark.functions import pipeline_queries

        modules.append(pipeline_queries)
    except ImportError:
        pass

    for mod in modules:
        for name, fn in mod.QUERIES.items():
            if name in queries:
                raise ValueError(f"duplicate query name: {name}")
            queries[name] = fn
        oracle.update(getattr(mod, "ORACLE", {}))
    return queries, oracle


def queries() -> dict[str, QueryFn]:
    return _collect()[0]


def oracle_sql() -> dict[str, str]:
    return _collect()[1]
