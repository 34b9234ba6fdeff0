"""SparkSession factory with scale-oriented defaults.

Local test runs use ``local[$SPARK_GRAFT_CPUS]``; on a real cluster the same
configs apply (AQE, skew-join handling, broadcast threshold) — nothing here is
local-mode specific except the master URL fallback.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_driver_memory(target_gb: int = 48) -> str:
    """min(target, 70% of system RAM), floor 2g — the bench wants 48g for its
    shared-frame pool, but a blind 48g default fails JVM startup or thrashes
    on smaller hosts. SPARK_DRIVER_MEMORY overrides unconditionally."""
    try:
        total_b = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
        cap_gb = max(2, int(total_b * 0.7 / (1 << 30)))
    except (ValueError, OSError, AttributeError):
        cap_gb = target_gb
    return f"{min(target_gb, cap_gb)}g"


def get_spark(
    app_name: str = "lets-talk-cdc-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    - UTC session timezone (oracle comparisons are tz-naive),
    - AQE on (runtime coalesce, skew-join splitting),
    - Arrow on (pandas UDF fast path),
    - shuffle partitions sized to cores locally (caller overrides at scale).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    parts = shuffle_partitions or int(os.environ.get("SPARK_GRAFT_SHUFFLE", cpus))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(parts))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Size-based coalescing (not parallelism-first): AQE picks the
        # post-shuffle partition count from actual bytes — thousands of
        # partitions at 100 TB, a handful for small intermediates — instead
        # of pinning every tiny shuffle to defaultParallelism tasks.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.shuffle.spill.compress", "true")
        .config("spark.ui.enabled", os.environ.get("SPARK_UI", "false"))
        # Target 48g: a full 209-query bench run keeps dozens of session-shared
        # frames persisted; at 24g the storage pool evicts them mid-run and
        # late queries pay rebuild + GC pressure (measured: total 372s -> 326s
        # at sf0.1). Clamped to ~70% of detected system RAM so the default
        # doesn't OOM-kill smaller hosts; SPARK_DRIVER_MEMORY overrides both.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", _default_driver_memory()))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # Driver testdata writes events.parquet with TIMESTAMP(NANOS); read as
        # long and convert explicitly (sources/testdata.py). Set here once so
        # queries never flip session conf mid-plan.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # map_concat(existing, after) must be the JS object-spread merge:
        # later keys win (src/domain/storage.ts:133-164 semantics)
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        # Bound the plan-description strings generated per query execution
        # (SQLExecutionStart + every AQE plan-update event rebuilds one).
        # Session-staged frames are handed out as InMemoryRelation leaves
        # whose string form embeds the full builder plan — and a staged
        # frame built over another staged frame embeds ITS string too, so
        # the text grows multiplicatively while the actual plan tree stays
        # tiny (measured: a 20-node triangle-count plan printed 9.7 MB and
        # burned ~0.8 s of driver CPU per execution on strings nothing
        # consumes — the UI is off).  128 KiB keeps explain() useful; full
        # dumps for the plan-evidence files raise it per-session
        # (tools/dump_plan.py).
        .config(
            "spark.sql.maxPlanStringLength",
            os.environ.get("SPARK_GRAFT_MAX_PLAN_STR", str(128 * 1024)),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
