"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs each registered query on Spark and its oracle SQL on DuckDB over the
same parquet dir, then compares row count, column names, and exact values
(order-insensitive, columns sorted by name).  Stricter than a hash: shows
the first differing rows and the max float delta, so mismatches are
debuggable.

Usage: python tools/check_oracle.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import math
import pathlib
import sys
import time
import traceback

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                vals.append(f"{v!r}")
            else:
                vals.append(str(v))
        out.append("\x1f".join(vals))
    out.sort()
    return out


def _max_float_delta(ns: list[str], nd: list[str]) -> float | None:
    """Max abs per-field float difference between the two normalized
    row lists, paired positionally after the sort — distinguishes
    1e-12 summation noise from a real value bug at a glance.  None
    when the lists differ structurally (lengths, non-float fields)."""
    if len(ns) != len(nd):
        return None
    worst = 0.0
    saw_float = False
    for a, b in zip(ns, nd):
        if a == b:
            continue
        fa, fb = a.split("\x1f"), b.split("\x1f")
        if len(fa) != len(fb):
            return None
        for x, y in zip(fa, fb):
            if x == y:
                continue
            try:
                worst = max(worst, abs(float(x) - float(y)))
                saw_float = True
            except ValueError:
                pass
    return worst if saw_float else None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--json", default=None,
                    help="write driver-style per-query rows to this path")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import duckdb

    from remove_na_lgbtiq_queer_knowledge_graph_spark.registry import all_specs
    from remove_na_lgbtiq_queer_knowledge_graph_spark.session import get_spark

    from remove_na_lgbtiq_queer_knowledge_graph_spark.sources.io import TABLES

    spark = get_spark("oracle_check")
    con = duckdb.connect()
    for tbl in TABLES:
        con.sql(f"CREATE VIEW {tbl} AS SELECT * FROM '{args.sf}/{tbl}.parquet'")

    specs = all_specs()
    names = args.names or list(specs)
    unknown = [n for n in names if n not in specs]
    if unknown:
        # fail BEFORE spending minutes of Spark work that a mid-run
        # KeyError would throw away (incl. the --json output)
        print(f"unknown query name(s): {unknown}", file=sys.stderr)
        return 2
    n_pass = n_fail = n_rows_only = 0
    results: dict[str, dict] = {}
    for name in names:
        spec = specs[name]
        t0 = time.time()
        try:
            sdf = spec.fn(spark, args.sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            print(f"FAIL {name}: spark error")
            traceback.print_exc()
            n_fail += 1
            results[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "err": f"spark: {exc}"[:300]}
            continue
        if spec.oracle is None:
            print(f"ROWS {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            results[name] = {"rows_only": True, "spark_rows": len(srows),
                             "err": None}
            continue
        try:
            res = con.sql(spec.oracle)
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as exc:
            print(f"FAIL {name}: duckdb error")
            traceback.print_exc()
            n_fail += 1
            results[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "err": f"duckdb: {exc}"[:300]}
            continue

        problems = []
        rows_match = len(srows) == len(drows)
        schema_match = sorted(scols) == sorted(dcols)
        hash_match = False
        if not rows_match:
            problems.append(f"rowcount spark={len(srows)} duckdb={len(drows)}")
        if not schema_match:
            problems.append(f"cols spark={sorted(scols)} duckdb={sorted(dcols)}")
        if not problems:
            ns, nd = normalize(srows, scols), normalize(drows, dcols)
            hash_match = ns == nd
            if not hash_match:
                snd, sns = set(nd), set(ns)  # hoisted: O(n+m), not O(n*m)
                diff_s = [r for r in ns if r not in snd][:3]
                diff_d = [r for r in nd if r not in sns][:3]
                problems.append(
                    f"values differ; spark-only={diff_s} duckdb-only={diff_d}"
                    f"; max_float_delta={_max_float_delta(ns, nd)}")
        results[name] = {
            "rows_match": rows_match, "schema_match": schema_match,
            "hash_match": hash_match, "spark_rows": len(srows),
            "oracle_rows": len(drows),
            "err": "; ".join(problems) or None,
            # wall seconds for BOTH sides of this query — lets a later
            # round spot a pathological oracle (a 10-minute DuckDB CTE
            # at sf0.1 once looked like a hang) without re-running
            "sec": round(time.time() - t0, 2),
        }
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    if args.json:
        import json

        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {args.json}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
