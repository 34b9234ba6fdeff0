"""Session-scoped materialized frames shared across judged queries.

Nearly every CDC query consumes one of a handful of intermediate frames —
the derived ops feed, the three capture lanes, the broker bus.  Rebuilding
them per query repeats the same scan + per-key shuffle dozens of times in a
bench run.  Materializing each once per session is the classic shared-scan
trade: the lane/bus frames are the same order of size as their input and are
consumed by many downstream aggregations, so one persist amortizes across
~20 queries.  The 100 TB analogue is staging the capture lane to a table
once and pointing every verification/metric query at it (exactly what the
reference's harness does with its ``received[]`` event log,
``harness/verifier/index.js:248-285``).

Staged frames are handed to consumers as **cache-anchored** DataFrames: the
frame is persisted as usual (compressed columnar InMemoryRelation), but the
DataFrame returned is rebuilt over the cache-substituted logical plan, so
its plan is the ``InMemoryRelation`` LEAF rather than the frame's full
lineage.  Why: with plain persist every downstream query re-runs analysis
over the staged frame's whole builder pipeline (and every AQE broadcast-
build job re-plans it again) — measured as the dominant steady-state cost
of the short metric queries (job walls summed to <1 s of a 2.3 s query; the
rest was driver-side planning gaps — see OPTIMIZATION_r08.md).  Anchoring
shrinks every consumer's plan tree to a leaf while KEEPING what the cache
gives the planner: accurate size statistics (auto-broadcast decisions) and
the cached output partitioning (exchange reuse) — the two things a
``localCheckpoint`` lineage cut was measured to lose (SortMergeJoins and
re-shuffles reappeared; events_session_concurrency 0.9 → 4.8 s).
"""

from __future__ import annotations

import math
import threading
from collections.abc import Callable

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession

_CACHE: dict[tuple, DataFrame] = {}
# the as-built persisted frames (full lineage) — unpersist must run against
# these, because the cache manager matches registered plans, not the
# anchored InMemoryRelation leaves handed to consumers
_ORIG: dict[tuple, DataFrame] = {}
# bench.py submits materializing writes from a ThreadPoolExecutor; two
# threads racing a first-touch build would double-stage the frame and leak
# the loser.  One driver-side lock serializes build+register.  Builders are
# plan construction only (localCheckpoint(eager=False) is lazy), so holding
# the lock across the build is cheap; REENTRANT because builders routinely
# call shared_df for their own upstream frames (e.g. capture lanes ->
# ops_feed).
_LOCK = threading.RLock()


def shared_df(
    spark: SparkSession, key: tuple, builder: Callable[[], DataFrame]
) -> DataFrame:
    """Return the frame for ``key``, building + staging it on first use.

    Keys are scoped by Spark applicationId so a fresh session (driver gate,
    tests, bench) never sees another session's plans; entries from dead
    sessions are dropped eagerly to keep the registry bounded.
    """
    app = spark.sparkContext.applicationId
    full = (app, *key)
    with _LOCK:
        df = _CACHE.get(full)
        if df is None:
            for stale in [k for k in _CACHE if k[0] != app]:
                _CACHE.pop(stale)
                _ORIG.pop(stale, None)
            built = builder().persist(StorageLevel.MEMORY_AND_DISK)
            df = _anchor_to_cache(spark, built)
            _CACHE[full] = df
            _ORIG[full] = built
    return df


def _anchor_to_cache(spark: SparkSession, built: DataFrame) -> DataFrame:
    """Rebuild ``built`` over its cache-substituted logical plan.

    ``QueryExecution.withCachedData`` is the plan the planner would execute
    anyway (the registered persist entry replaces the lineage with an
    ``InMemoryRelation``); materializing a DataFrame directly over it makes
    that substitution the consumer-visible LEAF, so downstream plans stop
    carrying — and re-analyzing — the builder pipeline.  Falls back to the
    plain persisted frame if the internal Dataset hook is unavailable."""
    try:
        rel = built._jdf.queryExecution().withCachedData()
        # Drop the relation's outputOrdering before handing it out:
        # InMemoryRelation.withOutput (run during canonicalization and
        # after DeduplicateRelations newInstance's a self-joined leaf)
        # rewrites ordering attributes through an AttributeMap built ONLY
        # from the current output — a stale ordering reference throws
        # "key not found: <attr>" deep in plan canonicalization (hit by
        # every query composing two docs-derived staged frames).  The
        # ordering is a planner hint, not a correctness property; losing
        # it costs at most a re-sort on frames consumers re-sort anyway.
        rel = rel.copy(
            rel.output(), rel.cacheBuilder(), spark._jvm.PythonUtils.toSeq([])
        )
        getattr(rel, "statsOfPlanToCache_$eq")(
            built._jdf.queryExecution().withCachedData().statsOfPlanToCache()
        )
        # fresh output attribute ids: sibling staged frames built from the
        # same base frame inherit ITS expression ids; two anchored leaves
        # with colliding ids in one query would break attribute resolution
        rel = rel.newInstance()
        jdf = spark._jvm.org.apache.spark.sql.classic.Dataset.ofRows(
            spark._jsparkSession, rel
        )
        return DataFrame(jdf, spark)
    except Exception as e:
        # LOUD fallback: anchoring rides Spark-internal hooks
        # (withCachedData, statsOfPlanToCache_$eq, classic.Dataset.ofRows) —
        # on a Spark upgrade the whole optimization would otherwise vanish
        # silently with zero test failure (the plain persisted frame is
        # still correct, just slow).  tests/test_plan_sweep.py additionally
        # pins that an anchored frame plans as an InMemoryRelation leaf.
        global _ANCHOR_FALLBACKS
        _ANCHOR_FALLBACKS += 1
        import warnings

        warnings.warn(
            f"shared_df anchoring fell back to plain persist ({type(e).__name__}: {e}); "
            "consumer plans will re-carry full builder lineage",
            RuntimeWarning,
            stacklevel=2,
        )
        return built


#: count of _anchor_to_cache failures this process — observable from tests
#: and ops tooling (non-zero means the Spark-internal anchoring hook broke)
_ANCHOR_FALLBACKS = 0


def local_df(spark: SparkSession, rows: list[tuple], schema: str) -> DataFrame:
    """Small driver-literal frame as a constant LocalRelation (VALUES form).

    ``spark.createDataFrame(list)`` parallelizes the rows into
    ``defaultParallelism`` pickled slices and spawns a Python worker PER
    SLICE on first compute — measured 0.5-0.8 s per call in a 32-core
    session for a 25-row frame, paid again on every re-execution (and once
    more inside any broadcast build of the frame).  The VALUES form plans
    as a constant-folded ``LocalRelation``: zero RDD, zero Python workers,
    exact schema via per-column casts.  Scalars only (finite int/float/str/
    bool/None); ``schema`` is the same DDL string ``createDataFrame`` takes
    (simple types only — a parenthesised type carrying a comma, e.g.
    ``decimal(38,2)``, would break the split, so those are rejected).
    """
    if not rows:  # VALUES needs >= 1 tuple; empty stays on the classic path
        return spark.createDataFrame([], schema)
    if "(" in schema:
        # a parenthesised type carrying a comma (decimal(38,2), char(n)…)
        # would silently mis-split the DDL into garbage columns — fail fast
        raise ValueError(
            f"local_df: parameterised types are unsupported (schema {schema!r}); "
            "use a simple type and cast downstream"
        )
    cols = [c.strip() for c in schema.split(",")]
    names = [c.split(None, 1)[0] for c in cols]
    types = [c.split(None, 1)[1] for c in cols]

    def lit(v) -> str:
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, str):
            return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
        if isinstance(v, float) and not math.isfinite(v):
            # repr(inf/nan) is not valid SQL — a future caller would get a
            # parse error (or silently wrong literals), so fail loudly here
            raise ValueError(f"local_df: non-finite float {v!r} is not renderable")
        return repr(v)

    vals = ",".join("(" + ",".join(lit(v) for v in row) + ")" for row in rows)
    inner = ",".join(f"c{i}" for i in range(len(names)))
    sel = ",".join(
        f"CAST(c{i} AS {t}) AS `{nm}`" for i, (nm, t) in enumerate(zip(names, types))
    )
    return spark.sql(f"SELECT {sel} FROM (VALUES {vals}) AS t({inner})")


def clear_shared() -> int:
    """Unpersist and drop every registered frame; returns the count dropped.

    A long-lived driver (notebook, service) otherwise accumulates staged
    storage bounded only by MEMORY_AND_DISK spill: entries are evicted when
    their *session* dies, never within one.  Call between workloads (the
    bench/sweep tools do after a full pass) to return executor storage.
    Subsequent ``shared_df`` calls simply rebuild on first use.

    Unpersist runs against the as-built frames (``_ORIG``): the cache
    manager matches the registered lineage plans, not the anchored
    InMemoryRelation leaves handed to consumers."""
    n = 0
    with _LOCK:
        for df in _ORIG.values():
            try:
                df.unpersist()
                n += 1
            except Exception:
                pass  # session already gone — nothing held
        _CACHE.clear()
        _ORIG.clear()
    return n
