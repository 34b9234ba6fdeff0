"""Dump `.explain("formatted")` for named queries to plans/r08/<name>_<tag>.txt.

Usage:  python tools/dump_plan.py --tag before name1 name2 ...
        python tools/dump_plan.py --tag after --sf-dir /root/testdata/sf0.01 name1

Evidence convention for the round-8 deliverable: `before` = plan at the tree
preceding the change, `after` = plan with the change applied, both at sf0.01.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CACHE_BASE", "1")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--tag", required=True)
    ap.add_argument("--out-dir", default=os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r08"))
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from lets_talk_cdc_change_feed_playground_spark import get_spark

    # evidence dumps want the FULL plan text — lift the session's bounded
    # plan-string cap (sessions default to 128 KiB; see session.py)
    os.environ.setdefault("SPARK_GRAFT_MAX_PLAN_STR", str(64 * 1024 * 1024))
    spark = get_spark("plan-dump")
    qs = entry_mod.queries()
    os.makedirs(args.out_dir, exist_ok=True)
    for name in args.names:
        df = qs[name](spark, args.sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(args.out_dir, f"{name}_{args.tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
