"""Sampled-Brandes quality ladder on a planted scale-free graph
(VERDICT r6 task 7).

`graph_betweenness_sampled` has exact-parity tests on small graphs;
this records what the SAMPLE buys at size: a deterministic
Barabási–Albert graph (preferential attachment — the degree
distribution real KGs and social graphs have), exact edge betweenness
computed on the driver (pure-Python Brandes, all sources), and the
Spark operator run at increasing pivot counts.  For each k it prints
Spearman rank correlation of edge scores vs exact, top-100 edge
overlap, and wall time — the number the "approximate at scale" claim
was missing.

Pivots are the md5-order prefix of the node set (hash-random but
deterministic).  The estimate is unscaled (rank metrics are
scale-invariant; Brandes & Pich 2007's n/k factor would not change
either column).

Usage: python tools/stress_betweenness.py [--nodes 10000] [--m 2]
       [--pivots 25,100,400] [--depth 30]
"""

from __future__ import annotations

import argparse
import hashlib
import random
import pathlib
import sys
import time
from collections import deque

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def ba_graph(n: int, m: int, seed: int = 11) -> list[tuple[int, int]]:
    """Deterministic Barabási–Albert preferential attachment: each new
    node attaches to m distinct existing nodes sampled ∝ degree (the
    repeated-endpoints trick)."""
    rng = random.Random(seed)
    edges: list[tuple[int, int]] = []
    targets = list(range(m))          # initial star into node m
    repeated: list[int] = []
    for v in range(m, n):
        chosen = set()
        for t in targets:
            edges.append((v, t))
            chosen.add(t)
            repeated.extend((v, t))
        # next node's targets: m distinct degree-proportional picks
        chosen = set()
        while len(chosen) < m:
            chosen.add(rng.choice(repeated))
        targets = list(chosen)
    return edges


def exact_edge_betweenness(n: int, edges: list[tuple[int, int]]):
    """Brandes 2001 (edge variant), all sources, undirected unweighted.
    Returns dict {(min,max): score}.  O(n·m) — minutes at n=10k in
    CPython; this is the one-off reference, not the operator."""
    adj: list[list[int]] = [[] for _ in range(n)]
    for u, v in edges:
        adj[u].append(v)
        adj[v].append(u)
    score: dict[tuple[int, int], float] = {}
    t0 = time.monotonic()
    for s in range(n):
        if s and s % 2000 == 0:
            print(f"  exact: {s}/{n} sources "
                  f"[{time.monotonic()-t0:.0f}s]", flush=True)
        dist = [-1] * n
        sigma = [0.0] * n
        dist[s] = 0
        sigma[s] = 1.0
        order: list[int] = []
        q = deque([s])
        while q:
            v = q.popleft()
            order.append(v)
            dv1 = dist[v] + 1
            sv = sigma[v]
            for w in adj[v]:
                if dist[w] < 0:
                    dist[w] = dv1
                    q.append(w)
                if dist[w] == dv1:
                    sigma[w] += sv
        delta = [0.0] * n
        for w in reversed(order):
            dw1 = dist[w] - 1
            coef = (1.0 + delta[w]) / sigma[w]
            for v in adj[w]:
                if dist[v] == dw1:
                    c = sigma[v] * coef
                    key = (v, w) if v < w else (w, v)
                    score[key] = score.get(key, 0.0) + c
                    delta[v] += c
    return score


def rank_avg(x):
    import numpy as np

    order = np.argsort(x, kind="mergesort")
    r = np.empty(len(x))
    r[order] = np.arange(1, len(x) + 1, dtype=float)
    _, inv = np.unique(x, return_inverse=True)
    sums = np.bincount(inv, weights=r)
    cnts = np.bincount(inv)
    return (sums / cnts)[inv]


def spearman(a, b) -> float:
    import numpy as np

    ra, rb = rank_avg(np.asarray(a)), rank_avg(np.asarray(b))
    ra -= ra.mean()
    rb -= rb.mean()
    denom = (ra @ ra) ** 0.5 * (rb @ rb) ** 0.5
    return float(ra @ rb / denom) if denom else float("nan")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=10000)
    ap.add_argument("--m", type=int, default=2)
    ap.add_argument("--pivots", default="25,100,400")
    ap.add_argument("--depth", type=int, default=30)
    args = ap.parse_args()

    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.graph import (
        sampled_edge_betweenness,
    )
    from remove_na_lgbtiq_queer_knowledge_graph_spark.session import get_spark

    n = args.nodes
    edges = ba_graph(n, args.m)
    print({"nodes": n, "edges": len(edges)}, flush=True)

    t0 = time.monotonic()
    exact = exact_edge_betweenness(n, edges)
    print({"exact_sec": round(time.monotonic() - t0, 1),
           "scored_edges": len(exact)}, flush=True)
    edge_keys = sorted(exact)
    exact_vec = [exact[k] for k in edge_keys]
    top100 = set(sorted(exact, key=exact.get, reverse=True)[:100])

    spark = get_spark("stress_betweenness")
    edf = spark.createDataFrame(
        [(str(u), str(v)) for u, v in edges], ["src", "dst"])
    node_order = sorted(
        range(n), key=lambda v: hashlib.md5(str(v).encode()).hexdigest())
    for k in [int(x) for x in args.pivots.split(",")]:
        pdf = spark.createDataFrame(
            [(str(v),) for v in node_order[:k]], ["p"])
        t0 = time.monotonic()
        # the operator canonicalizes (a,b) with least/greatest over
        # STRINGS ("10" < "2"); re-canonicalize numerically to line up
        # with the exact dict's integer keys
        got = {(min(int(r.a), int(r.b)), max(int(r.a), int(r.b))):
               r.betweenness
               for r in sampled_edge_betweenness(
                   edf, pdf, max_depth=args.depth).collect()}
        wall = time.monotonic() - t0
        est_vec = [got.get(key, 0.0) for key in edge_keys]
        gtop = set(sorted(got, key=got.get, reverse=True)[:100])
        print({"pivots": k,
               "spearman": round(spearman(exact_vec, est_vec), 4),
               "top100_overlap": len(top100 & gtop),
               "sec": round(wall, 1)}, flush=True)


if __name__ == "__main__":
    main()
