"""BGP (basic graph pattern) planner over a triples DataFrame
(SURVEY.md §2.11 G1-G13, §3.2).

The reference runs SPARQL against Blazegraph/Wikidata endpoints (20+
``.rq`` files).  Internally we plan the SPARQL-algebra subset those
queries use directly onto DataFrame operations:

- triple pattern → filtered scan of the triples DF (bound terms become
  equality predicates — pushed into the parquet scan by Catalyst);
- pattern conjunction → joins on shared variables;
- OPTIONAL → left join (G2); UNION → unionByName (G3); FILTER → filter
  (G4); FILTER NOT EXISTS / MINUS → left_anti (G5/G6); VALUES → isin
  (G7); BIND → withColumn (G8); property path ``p1/p2`` → chained
  patterns, ``p*`` → iterative fixpoint (G9, see ``transitive_closure``).

Join order: patterns are planned most-bound-first (§4 rewrite 3 —
selective patterns like ``BIND(fg:Q225307...)`` become point filters
before joins); beyond that Catalyst + AQE reorder freely.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _is_var(term: str) -> bool:
    return term.startswith("?")


@dataclass(frozen=True)
class Pattern:
    s: str
    p: str
    o: str

    def bound_count(self) -> int:
        return sum(0 if _is_var(x) else 1 for x in (self.s, self.p, self.o))


def _scan(triples: DataFrame, pat: Pattern) -> DataFrame:
    """One triple pattern → filtered scan with var-named columns.

    Bound terms become equality filters (pushed to the scan); a variable
    repeated within one pattern (``?x p ?x``) becomes a self-equality
    filter.
    """
    df = triples
    sel: dict[str, object] = {}
    for term, col in ((pat.s, "subject"), (pat.p, "predicate"), (pat.o, "object")):
        if not _is_var(term):
            df = df.filter(F.col(col) == term)
        elif term[1:] in sel:
            df = df.filter(F.col(col) == F.col(sel[term[1:]]))
        else:
            sel[term[1:]] = col
    return df.select(*[F.col(c).alias(v) for v, c in sel.items()])


def _join_vars(left: DataFrame, right: DataFrame) -> list[str]:
    return [c for c in left.columns if c in right.columns]


class BGPQuery:
    """Composable BGP query builder.

    >>> q = (BGPQuery(triples)
    ...      .where(("?c", "inNation", "?n"), ("?n", "name", "?nname"))
    ...      .optional(("?c", "segment", "?seg"))
    ...      .values("nname", ["NATION_1"])
    ...      .select("c", "nname", "seg"))
    """

    def __init__(self, triples: DataFrame):
        self._triples = triples
        self._df: DataFrame | None = None

    def _merge(self, df: DataFrame, how: str = "inner") -> "BGPQuery":
        if self._df is None:
            if how != "inner":
                raise ValueError("first pattern group must be required")
            self._df = df
        else:
            on = _join_vars(self._df, df)
            if on:
                self._df = self._df.join(df, on, how)
            elif how == "inner":
                self._df = self._df.crossJoin(df)
            else:
                # disjoint-vars OPTIONAL: crossJoin would discard the
                # left-join semantics (an empty optional group must
                # keep every left row with the new vars unbound)
                self._df = self._df.join(df, F.lit(True), how)
        return self

    def _group(self, patterns: tuple[tuple[str, str, str], ...]) -> DataFrame:
        # most-bound-first seeds the frame with the most selective
        # pattern; after that, prefer a pattern SHARING a variable with
        # the accumulated frame (round-13 review: the pure greedy order
        # cross-joined two connected patterns whenever their link
        # pattern sorted later — correct result, quadratic
        # intermediate; same rule the SPARQL compiler uses)
        remaining = sorted((Pattern(*p) for p in patterns),
                           key=lambda p: -p.bound_count())
        df = _scan(self._triples, remaining.pop(0))
        while remaining:
            idx = 0
            for i, p in enumerate(remaining):
                cand = {t[1:] for t in (p.s, p.p, p.o) if _is_var(t)}
                if cand & set(df.columns):
                    idx = i
                    break
            nxt = _scan(self._triples, remaining.pop(idx))
            on = _join_vars(df, nxt)
            df = df.join(nxt, on) if on else df.crossJoin(nxt)
        return df

    def where(self, *patterns: tuple[str, str, str]) -> "BGPQuery":
        return self._merge(self._group(patterns))

    def optional(self, *patterns: tuple[str, str, str]) -> "BGPQuery":
        """G2: OPTIONAL group → left join on the shared variables."""
        return self._merge(self._group(patterns), "left")

    def not_exists(self, *patterns: tuple[str, str, str],
                    minus: bool = False) -> "BGPQuery":
        """G5/G6: FILTER NOT EXISTS (default) / MINUS (``minus=True``)
        → anti join on the shared variables.  The two differ ONLY with
        disjoint domains (SPARQL 1.1 §8.3.3): MINUS removes NOTHING
        (no compatible bindings to subtract), while NOT EXISTS is
        all-or-nothing — any sub-pattern match removes every row
        (round-13 review: this builder silently applied NOT EXISTS
        semantics to both; the text front-end already distinguished
        them)."""
        assert self._df is not None
        sub = self._group(patterns)
        on = _join_vars(self._df, sub)
        if on:
            self._df = self._df.join(sub, on, "left_anti")
        elif not minus:
            # all-or-nothing needs only sub-pattern NON-EMPTINESS: a
            # 1-row broadcast probe, not an anti join against the
            # fully evaluated sub-group (the front-end's shape)
            self._df = self._df.join(
                F.broadcast(sub.limit(1).select(F.lit(1).alias("__ne"))),
                F.lit(True), "left_anti")
        # disjoint-domain MINUS: no-op by spec
        return self

    def union(self, other: "BGPQuery") -> "BGPQuery":
        """G3: UNION of pattern groups (columns aligned by name)."""
        assert self._df is not None and other._df is not None
        self._df = self._df.unionByName(other._df, allowMissingColumns=True)
        return self

    def values(self, var: str, allowed: list[str]) -> "BGPQuery":
        """G7: VALUES inline table → isin."""
        assert self._df is not None
        self._df = self._df.filter(F.col(var).isin(allowed))
        return self

    def filter(self, cond: Column) -> "BGPQuery":
        """G4: FILTER expression."""
        assert self._df is not None
        self._df = self._df.filter(cond)
        return self

    def bind(self, var: str, expr: Column) -> "BGPQuery":
        """G8: BIND(expr AS ?var)."""
        assert self._df is not None
        self._df = self._df.withColumn(var, expr)
        return self

    def select(self, *vars: str, distinct: bool = False) -> DataFrame:
        assert self._df is not None
        out = self._df.select(*vars)
        return out.distinct() if distinct else out


def path_seq(triples: DataFrame, preds: list[str]) -> DataFrame:
    """G9 sequence path ``p1/p2/...`` → chained joins; returns (src, dst)."""
    if not preds:
        raise ValueError("path_seq requires at least one predicate")
    df = None
    for i, p in enumerate(preds):
        step = triples.filter(F.col("predicate") == p).select(
            F.col("subject").alias(f"h{i}"), F.col("object").alias(f"h{i+1}")
        )
        df = step if df is None else df.join(step, f"h{i}")
    return df.select(F.col("h0").alias("src"), F.col(f"h{len(preds)}").alias("dst"))


def _driver_closure(closure: DataFrame, reflexive: bool, spark,
                    pair_cap: int, rows: list | None = None
                    ) -> DataFrame | None:
    """Driver BFS for ontology-sized edge sets (subclass/part-of
    hierarchies stay ~10³ even when the instance data is 100 TB): one
    pass beats 3 Spark jobs per squaring round.  Returns ``None`` when
    the output pair count crosses ``pair_cap`` — the caller falls back
    to the distributed fixpoint.  NULL endpoints (possible from a left
    join upstream) ride through like the distributed branch: they join
    to nothing but stay in the output edge set."""
    adj: dict[str, set[str]] = {}
    null_rows: list[tuple] = []
    if rows is None:
        rows = closure.collect()
    for r in rows:
        sv, dv = r["src"], r["dst"]
        if sv is None or dv is None:
            # None is not orderable/joinable — keep the row, skip BFS
            null_rows.append((sv, dv))
            continue
        adj.setdefault(sv, set()).add(dv)
    out: set[tuple[str, str]] = set()
    for s in adj:
        seen: set[str] = set()
        stack = list(adj[s])
        while stack:
            d = stack.pop()
            if d in seen:
                continue
            seen.add(d)
            stack.extend(adj.get(d, ()))
        out.update((s, d) for d in seen)
        if len(out) > pair_cap:
            return None
    if reflexive:
        nodes = set(adj)
        nodes.update(d for ds in adj.values() for d in ds)
        out.update((x, x) for x in nodes)
        if len(out) > pair_cap:
            return None
    # preserve the input column TYPES — the distributed branch does,
    # and a hardcoded string schema would make behavior depend on
    # whether the edge count crossed the driver-BFS gate.  Sort key
    # tolerates None (NULLs first, like Spark's default ordering).
    rows = sorted(out) + sorted(
        null_rows, key=lambda t: tuple((v is not None, v or "") for v in t))
    schema = closure.schema
    if rows:
        return spark.createDataFrame(rows, schema)
    return spark.createDataFrame([], schema)


def transitive_closure(
    edges: DataFrame, src: str = "src", dst: str = "dst",
    max_iter: int = 20, reflexive: bool = False,
) -> DataFrame:
    """G9 ``p*``/``p+`` — iterative join to fixpoint with lineage
    truncation per round (``checkpoint`` pattern, SURVEY §4).

    Doubles path length each iteration (repeated squaring), so 20
    iterations cover diameter 2^20 — termination is by fixpoint, and the
    per-round ``localCheckpoint`` keeps the plan from growing.  Returns
    distinct (src, dst) pairs; ``reflexive=True`` adds the zero-length
    paths (``p*`` vs ``p+`` semantics).
    """
    closure = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    closure = closure.localCheckpoint()
    # Gate probe: one bounded take instead of count-then-collect (same
    # r13 optimization as connected_components) — when the edge set is
    # ontology-sized the fetched rows ARE the BFS input; the count the
    # distributed fixpoint needs is only computed when the gate fails
    # (or the driver BFS aborts on the pair cap).
    #
    # Output cap for the driver path: closure size is O(V²) — a 2k-edge
    # LINEAR CHAIN yields ~2M pairs, and the old 10k-edge gate admitted
    # ~50M-tuple driver heaps (round-13 review).  The edge gate bounds
    # the INPUT; _PAIR_CAP aborts mid-BFS the moment the OUTPUT
    # explodes and falls through to the distributed loop.
    probe = closure.take(2_001)
    if len(probe) <= 2_000:
        result = _driver_closure(closure, reflexive,
                                 edges.sparkSession, pair_cap=500_000,
                                 rows=probe)
        if result is not None:
            # Driver-built and bounded by pair_cap (≤500k pairs), but an
            # ExistingRDD has no size stats, so the path-algebra joins
            # that fold this relation against the (at scale TB-sized)
            # triples frame planned SortMergeJoins shuffling the triples
            # side.  Hint it broadcastable — same bounded-build-side
            # argument as the connected_components fast path (guide
            # §3.1).  The distributed fixpoint below stays unhinted.
            # The cap is in PAIRS, not bytes (r13 ADVICE): 500k pairs of
            # ~100-byte IRIs ≈ 100 MB framed — fine for a broadcast,
            # but ontologies with multi-KB terms would need a byte-aware
            # cap.  The rows were already driver-resident (the BFS ran
            # on them), so the hint adds executor copies, not a new
            # driver collect.
            return F.broadcast(result)
        n = len(probe)
    else:
        n = closure.count()
    for _ in range(max_iter):
        hop = (
            closure.alias("a")
            .join(closure.alias("b"), F.col("a.dst") == F.col("b.src"))
            .select(F.col("a.src").alias("src"), F.col("b.dst").alias("dst"))
        )
        new = closure.union(hop).distinct().localCheckpoint()
        m = new.count()
        if m == n:
            closure = new
            break
        closure, n = new, m
    if reflexive:
        nodes = (
            closure.select("src").union(closure.select(F.col("dst").alias("src")))
            .distinct()
        )
        closure = closure.union(
            nodes.select(F.col("src"), F.col("src").alias("dst"))
        ).distinct()
    return closure
