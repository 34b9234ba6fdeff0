"""Per-query job/stage profiler (guide §1.1/§7.1 empirical loop, headless).

Runs one registered query end-to-end through the noop sink a few times in a
warmed session, then attributes wall to Spark jobs/stages via the status
API: per run, every job triggered by the query action with its duration,
stage task-time, shuffle read/write bytes, and GC time.  This is the
UI-stage-page discipline for a sandbox with no browsable UI.

Usage:  python tools/query_profile.py [--sf-dir DIR] [--runs 3] name [name ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CACHE_BASE", "1")
os.environ.setdefault("SPARK_UI", "true")


def _get(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--no-warm", action="store_true", help="skip the shared-frame staging")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from lets_talk_cdc_change_feed_playground_spark import get_spark

    spark = get_spark("query-profile")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    qs = entry_mod.queries()

    if not args.no_warm:
        # same unified staging the bench performs, so walls are steady-state
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        import bench as bench_mod  # noqa: F401  (reuse its staging would run main; inline instead)
        from lets_talk_cdc_change_feed_playground_spark.operators import capture
        for df in (
            capture.log_capture(spark, args.sf_dir),
            capture.polling_capture(spark, args.sf_dir),
            capture.polling_capture(spark, args.sf_dir, include_soft_deletes=True),
            capture.trigger_capture(spark, args.sf_dir),
        ):
            df.write.format("noop").mode("overwrite").save()

    for name in args.names:
        fn = qs[name]
        for run in range(args.runs):
            jobs_before = {j["jobId"] for j in _get(f"{ui}/api/v1/applications/{app_id}/jobs")}
            spark.sparkContext.setJobDescription(f"{name}#run{run}")
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            spark.sparkContext.setJobDescription(None)
            jobs = [
                j
                for j in _get(f"{ui}/api/v1/applications/{app_id}/jobs")
                if j["jobId"] not in jobs_before
            ]
            jobs.sort(key=lambda j: j["jobId"])
            print(f"\n=== {name} run{run}: wall {wall:.3f}s, {len(jobs)} jobs ===")
            for j in jobs:
                sub = j.get("submissionTime", "")
                dur = ""
                try:
                    from datetime import datetime

                    st = datetime.strptime(j["submissionTime"][:23], "%Y-%m-%dT%H:%M:%S.%f")
                    en = datetime.strptime(j["completionTime"][:23], "%Y-%m-%dT%H:%M:%S.%f")
                    dur = f"{(en - st).total_seconds():7.3f}s"
                except Exception:
                    dur = "      ?"
                print(
                    f"  job {j['jobId']:>4} {dur} tasks={j['numCompletedTasks']:>5} "
                    f"stages={len(j['stageIds'])} {j.get('description','')[:60]}"
                )
            # per-stage attribution for this run's jobs, slowest first
            stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
            stages = []
            for sid in stage_ids:
                try:
                    for att in _get(f"{ui}/api/v1/applications/{app_id}/stages/{sid}"):
                        stages.append(att)
                except Exception:
                    pass
            stages.sort(key=lambda s: -(s.get("executorRunTime") or 0))
            for s in stages[:12]:
                print(
                    f"  stage {s['stageId']:>4} run={s.get('executorRunTime',0)/1e3:7.2f}s "
                    f"cpu={s.get('executorCpuTime',0)/1e9:7.2f}s gc={s.get('jvmGcTime',0)/1e3:6.2f}s "
                    f"tasks={s.get('numCompleteTasks',0):>4} "
                    f"shR={s.get('shuffleReadBytes',0)>>20}M shW={s.get('shuffleWriteBytes',0)>>20}M "
                    f"in={s.get('inputBytes',0)>>20}M {s.get('name','')[:40]}"
                )
    return 0


if __name__ == "__main__":
    sys.exit(main())
