"""Give the bench gate a measurable denominator: time every DuckDB oracle.

BASELINE.md carries no reference query timings (the reference publishes UI
latency budgets only), so "within 2x of baseline" had no number to compare
against.  This tool produces one: each ``oracle_sql()`` entry is itself a
complete single-node implementation of the query (DuckDB over the same
parquet), so its wall time is an honest local baseline for the Spark
implementation at the same scale factor.

Writes ``BASELINE_LOCAL.json``:
  {"sf_dir": ..., "duck_total_sec": N, "spark_total_sec": N,
   "queries": {name: {"duck_sec": d, "spark_sec": s, "ratio": s/d}},
   "flagged_over_2x": [names...]}

``spark_sec`` comes from ``BENCH_DETAIL.json`` (run ``python bench.py``
first, same sf dir).  Ratios read: <1 Spark is faster; >2 flagged.  Caveats
recorded in the artifact: DuckDB runs the BATCH semantics (a streaming
query's oracle has no trigger/state machinery, so stream_* ratios price
Spark's streaming runtime against a batch twin), and both engines use all
local cores.

Usage: python tools/duck_baseline.py [--sf-dir /root/testdata/sf0.1] [--repeat 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from oracle_check import TABLES  # noqa: E402  (same view registration)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--out", default=os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BASELINE_LOCAL.json"))
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod

    oracles = entry_mod.oracle_sql()
    names = args.names or list(oracles)

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    spark_secs: dict[str, float] = {}
    detail_path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_DETAIL.json")
    if os.path.exists(detail_path):
        with open(detail_path) as f:
            spark_secs = json.load(f).get("queries", {})

    record: dict[str, dict] = {}
    for name in names:
        sql = oracles.get(name)
        if sql is None:
            continue
        best = None
        err = None
        for _ in range(max(args.repeat, 1)):
            t0 = time.perf_counter()
            try:
                con.execute(sql).fetchall()
            except Exception as e:  # keep timing the rest
                err = str(e).split("\n")[0][:200]
                break
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        if err:
            record[name] = {"error": err}
            print(f"# {name}: DUCK FAIL {err}", file=sys.stderr, flush=True)
            continue
        entry = {"duck_sec": round(best, 3)}
        if name in spark_secs:
            entry["spark_sec"] = spark_secs[name]
            entry["ratio"] = round(spark_secs[name] / best, 2) if best > 0 else None
        record[name] = entry
        print(f"# {name}: duck={entry['duck_sec']} spark={entry.get('spark_sec', '?')}", file=sys.stderr, flush=True)

    flagged = sorted(
        n for n, e in record.items()
        if isinstance(e.get("ratio"), (int, float)) and e["ratio"] > 2.0 and not n.startswith("stream_")
    )
    flagged_stream = sorted(
        n for n, e in record.items()
        if isinstance(e.get("ratio"), (int, float)) and e["ratio"] > 2.0 and n.startswith("stream_")
    )
    out = {
        "sf_dir": args.sf_dir,
        "repeat": args.repeat,
        "duck_total_sec": round(sum(e["duck_sec"] for e in record.values() if "duck_sec" in e), 3),
        "spark_total_sec": round(sum(e["spark_sec"] for e in record.values() if "spark_sec" in e), 3),
        "n_queries": len(record),
        "flagged_over_2x": flagged,
        "flagged_over_2x_stream": flagged_stream,
        "note": (
            "duck_sec times the DuckDB oracle (batch semantics, all cores); "
            "stream_* ratios price Spark's micro-batch/state machinery against "
            "a batch twin and are reported separately"
        ),
        "queries": record,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({k: out[k] for k in ("duck_total_sec", "spark_total_sec", "n_queries", "flagged_over_2x", "flagged_over_2x_stream")}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
