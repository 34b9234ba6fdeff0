"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and the matching
``oracle_sql()`` on DuckDB (same parquet tables registered as views), then
compares row count, column names, and order-insensitive cell values.

Usage:  python tools/oracle_check.py [--sf-dir /root/testdata/sf0.001] [name ...]
        python tools/oracle_check.py --artifact ORACLE_SWEEP_r04.json   # full sweep + JSON record

``--artifact PATH`` writes a machine-readable per-query record of the sweep
so each round's full builder-run correctness (every query, not just the
driver's sample) is a committed, diffable artifact.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

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


def canon_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "inf" if v > 0 else "-inf"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def _sort_key_cell(c: str) -> str:
    # float-jitter-stable sort key: rounding to 6 significant digits keeps
    # near-equal Spark/DuckDB rows aligned when each side sorts itself
    try:
        return format(float(c), ".6g")
    except (ValueError, TypeError):
        return c


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda row: tuple(_sort_key_cell(c) for c in row))
    return [cols[i] for i in order], out


def near(a: str, b: str) -> bool:
    try:
        fa, fb = float(a), float(b)
        return math.isclose(fa, fb, rel_tol=1e-7, abs_tol=1e-7)
    except (ValueError, TypeError):
        return False


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    ap.add_argument("--artifact", help="write per-query sweep results to this JSON file")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from lets_talk_cdc_change_feed_playground_spark import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = args.names or list(queries)
    n_pass = n_fail = n_weak = 0
    record: dict[str, dict] = {}
    for name in names:
        t0 = time.time()
        try:
            sdf = queries[name](spark, args.sf_dir)
            s_cols = list(sdf.columns)
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            record[name] = {"status": "FAIL", "err": str(e).split("\n")[0][:300]}
            n_fail += 1
            continue
        if name not in oracles:
            print(f"WEAK {name}: rows-only ({len(s_rows)} rows, {time.time()-t0:.1f}s)")
            record[name] = {"status": "WEAK", "rows": len(s_rows), "sec": round(time.time() - t0, 1)}
            n_weak += 1
            continue
        try:
            res = con.execute(oracles[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
            # second execution only reads dtypes (fetchall consumed the
            # cursor; pandas conversion would also retype cells)
            d_dtypes = dict(con.execute(oracles[name]).df().dtypes.astype(str))
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            record[name] = {"status": "FAIL", "err": str(e).split("\n")[0][:300]}
            n_fail += 1
            continue
        ok = True
        msgs = []
        # Driver-hash hazard: DuckDB HUGEINT (e.g. SUM of ints) becomes float64
        # in pandas while Spark bigint stays int64 -> "3334" vs "3334.0".
        s_types = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
        for c, st in s_types.items():
            if st in ("bigint", "int", "smallint", "tinyint") and d_dtypes.get(c) == "float64":
                ci = d_cols.index(c)
                if not any(r[ci] is None for r in d_rows):
                    ok = False
                    msgs.append(f"dtype hazard: {c} duck=float64 (HUGEINT?) vs spark={st}; CAST AS BIGINT in oracle SQL")
        if sorted(s_cols) != sorted(d_cols):
            ok = False
            msgs.append(f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            ok = False
            msgs.append(f"rowcount differs: spark={len(s_rows)} duck={len(d_rows)}")
        if ok:
            _, cs = canon_rows(s_cols, s_rows)
            _, cd = canon_rows(d_cols, d_rows)
            n_diff = n_near = 0
            first = None
            for a, b in zip(cs, cd):
                if a != b:
                    if all(x == y or near(x, y) for x, y in zip(a, b)):
                        n_near += 1
                    else:
                        n_diff += 1
                        if first is None:
                            first = (a, b)
            if n_diff:
                ok = False
                msgs.append(f"{n_diff} rows differ; first: spark={first[0]} duck={first[1]}")
            elif n_near:
                msgs.append(f"WARN {n_near} rows only float-near (risk at other sf)")
        status = "PASS" if ok else "FAIL"
        n_pass += ok
        n_fail += not ok
        record[name] = {"status": status, "rows": len(s_rows), "sec": round(time.time() - t0, 1)}
        if msgs:
            record[name]["msgs"] = msgs
        print(f"{status} {name} ({len(s_rows)} rows, {time.time()-t0:.1f}s)" + ("  " + "; ".join(msgs) if msgs else ""))
    print(f"\n{n_pass} pass, {n_fail} fail, {n_weak} rows-only of {len(names)}")
    if args.artifact:
        with open(args.artifact, "w") as f:
            json.dump(
                {
                    "sf_dir": args.sf_dir,
                    "n_pass": n_pass,
                    "n_fail": n_fail,
                    "n_weak": n_weak,
                    "n_queries": len(names),
                    "queries": record,
                },
                f,
                indent=1,
                sort_keys=True,
            )
        print(f"wrote {args.artifact}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
