"""Scale-stress the round-8 SPARQL path algebra on a planted graph.

Builds a layered forest (every node has exactly one parent in the next
layer, edge predicates alternating p/q by layer, plus label-noise
triples), so the transitive closure is exactly the ancestor relation —
small enough to verify EXACTLY against a driver-side BFS, large enough
to measure.

Measures at 1× and S× node count (default 4×):

- ``p_plus``    — ``?s p+ ?o``: single-predicate closure (the
                  pre-round-8 machinery, the baseline);
- ``alt_plus``  — ``?s (p|q)+ ?o``: closure over an alternation — the
                  round-8 composed-relation path;
- ``nps_scan``  — ``?s !(lbl) ?o``: negated-property-set scan.

For each, asserts the result EQUALS the BFS/python reference (pair set
for closures, edge multiset for the NPS scan), then reports wall time
and output size.  The claim under test: alternation closure costs the
same as closing the pre-unioned edge set (it IS that plan), and NPS is
one scan — growth in wall time should track growth in OUTPUT, not
explode.

Usage: python tools/stress_paths.py [--scale 4] [--width 1500]
"""

from __future__ import annotations

import argparse
import pathlib
import random
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

EX = "http://ex.org/"
RQ_PREFIX = f"PREFIX ex: <{EX}>\n"


def build_graph(width: int, layers: int, seed: int = 13):
    """Layered forest: node (l, i) has one parent in layer l+1; edge
    predicate is p for even l, q for odd l.  Every node also gets a
    label triple (the NPS noise)."""
    rng = random.Random(seed)
    triples = []
    for l in range(layers):
        for i in range(width):
            child = f"n{l}_{i}"
            if l + 1 < layers:
                parent = f"n{l + 1}_{rng.randrange(width)}"
                pred = "p" if l % 2 == 0 else "q"
                triples.append((child, pred, parent))
            triples.append((child, "lbl", f"L{i % 97}"))
    return triples


def bfs_closure(triples, preds):
    """Exact ancestor pairs over edges whose predicate is in preds."""
    adj: dict[str, list[str]] = {}
    for s, p, o in triples:
        if p in preds:
            adj.setdefault(s, []).append(o)
    pairs = set()
    for start in list(adj):
        stack = list(adj[start])
        seen = set()
        while stack:
            n = stack.pop()
            if n in seen:
                continue
            seen.add(n)
            pairs.add((start, n))
            stack.extend(adj.get(n, ()))
    return pairs


def run_case(spark, triples, name, rq, reference, is_bag):
    from pyspark.sql import functions as F  # noqa: F401

    from remove_na_lgbtiq_queer_knowledge_graph_spark.plans.sparql import (
        compile_sparql,
    )

    t = spark.createDataFrame(
        [(EX + s, EX + p, EX + o if not o.startswith("L") else o, None, None)
         for s, p, o in triples],
        "subject string, predicate string, object string, "
        "lang string, dtype string")
    t0 = time.time()
    df = compile_sparql(RQ_PREFIX + rq, t)
    rows = df.collect()
    wall = time.time() - t0
    strip = len(EX)

    def norm(v):
        return v[strip:] if v.startswith(EX) else v

    if is_bag:
        from collections import Counter

        got = Counter((norm(r[0]), norm(r[1])) for r in rows)
        assert got == reference, (
            f"{name}: bag mismatch ({len(got)} vs {len(reference)})")
    else:
        got = {(norm(r[0]), norm(r[1])) for r in rows}
        assert len(rows) == len(got), f"{name}: closure emitted duplicates"
        assert got == reference, (
            f"{name}: pair-set mismatch ({len(got)} vs {len(reference)})")
    return wall, len(rows)


def measure(spark, width: int, layers: int):
    from collections import Counter

    triples = build_graph(width, layers)
    out = {}
    out["p_plus"] = run_case(
        spark, triples, "p_plus", "SELECT ?s ?o WHERE { ?s ex:p+ ?o . }",
        bfs_closure(triples, {"p"}), is_bag=False)
    out["alt_plus"] = run_case(
        spark, triples, "alt_plus",
        "SELECT ?s ?o WHERE { ?s (ex:p|ex:q)+ ?o . }",
        bfs_closure(triples, {"p", "q"}), is_bag=False)
    nps_ref = Counter(
        (s, o) for s, p, o in triples if p != "lbl")
    out["nps_scan"] = run_case(
        spark, triples, "nps_scan",
        "SELECT ?s ?o WHERE { ?s !ex:lbl ?o . }", nps_ref, is_bag=True)
    return len(triples), out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1500)
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--scale", type=int, default=4)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    n1, r1 = measure(spark, args.width, args.layers)
    n2, r2 = measure(spark, args.width * args.scale, args.layers)
    print(f"\n{'case':<10} {'triples':>9} {'rows':>9} {'sec':>7}   "
          f"{'triples×':>8} {'rows×':>7} {'sec×':>6}")
    for case in r1:
        w1, c1 = r1[case]
        w2, c2 = r2[case]
        print(f"{case:<10} {n1:>9} {c1:>9} {w1:>7.2f}   "
              f"{n2 / n1:>7.1f}x {c2 / max(c1, 1):>6.1f}x "
              f"{w2 / max(w1, 1e-9):>5.1f}x")
    print("\nall cases verified exactly against the BFS/python reference")


if __name__ == "__main__":
    main()
