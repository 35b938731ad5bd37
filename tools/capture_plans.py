"""Capture `.explain("formatted")` for headline (or named) queries into
plans/r13/<name>_<tag>.txt — the optimization round's before/after
evidence files.

Usage: python tools/capture_plans.py --tag before [--sf DIR] [names...]
"""

from __future__ import annotations

import argparse
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--out", default="plans/r13")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from bench import HEADLINE
    from remove_na_lgbtiq_queer_knowledge_graph_spark.registry import all_specs
    from remove_na_lgbtiq_queer_knowledge_graph_spark.session import get_spark

    names = args.names or HEADLINE
    specs = all_specs()
    spark = get_spark("capture_plans")
    outdir = pathlib.Path(__file__).resolve().parents[1] / args.out
    outdir.mkdir(parents=True, exist_ok=True)

    for name in names:
        if name not in specs:
            print(f"SKIP {name}: not in registry", file=sys.stderr)
            continue
        try:
            df = specs[name].fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: {type(exc).__name__}: {exc}", file=sys.stderr)
            continue
        path = outdir / f"{name}_{args.tag}.txt"
        path.write_text(f"# {name} @ {args.sf} ({args.tag})\n{plan}\n")
        print(f"wrote {path} ({plan.count(chr(10))} lines)")


if __name__ == "__main__":
    main()
