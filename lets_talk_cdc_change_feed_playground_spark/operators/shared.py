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
"""

from __future__ import annotations

import threading
from collections.abc import Callable

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession

_CACHE: dict[tuple, DataFrame] = {}
# bench.py submits materializing writes from a ThreadPoolExecutor; two
# threads racing a first-touch build would double-persist the frame and leak
# the loser.  One driver-side lock serializes build+register.  Builders are
# plan construction only (persist() is lazy), so holding the lock across the
# build is cheap; REENTRANT because builders routinely call shared_df for
# their own upstream frames (e.g. capture lanes -> ops_feed).
_LOCK = threading.RLock()


def shared_df(
    spark: SparkSession, key: tuple, builder: Callable[[], DataFrame]
) -> DataFrame:
    """Return the frame for ``key``, building + persisting it on first use.

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
            df = builder().persist(StorageLevel.MEMORY_AND_DISK)
            _CACHE[full] = df
    return df


def clear_shared() -> int:
    """Unpersist and drop every registered frame; returns the count dropped.

    A long-lived driver (notebook, service) otherwise accumulates persisted
    storage bounded only by MEMORY_AND_DISK spill: entries are evicted when
    their *session* dies, never within one.  Call between workloads (the
    bench/sweep tools do after a full pass) to return executor storage.
    Subsequent ``shared_df`` calls simply rebuild on first use."""
    n = 0
    with _LOCK:
        for df in _CACHE.values():
            try:
                df.unpersist()
                n += 1
            except Exception:
                pass  # session already gone — nothing held
        _CACHE.clear()
    return n
