"""Property-based differential test of the SPARQL property-path
compiler (round 8).

For random small graphs and random path expressions drawn from the full
§18.2 algebra (link, inverse, sequence, alternation, negated property
set, * / + / ? — including modifiers over groups), compare the engine's
result for ``?s PATH ?o`` against an INDEPENDENT driver-side evaluator
of SPARQL 1.1 §18.4 semantics:

- plain links / inverse / sequence / alternation / NPS evaluate as BAGS
  (sequence multiplicities multiply along join chains, alternation is a
  bag union);
- * / + / ? evaluate as SETS (the ALP-based forms yield distinct
  pairs); '*' and '?' include the zero-length identity over the graph's
  terms (subject ∪ object position).

The generator sticks to var-var queries, so the constant-anchor
zero-length corners (covered by dedicated unit tests in
tests/test_sparql.py) don't enter; what this sweep stresses is the
COMPOSITION: modifiers over groups, NPS direction splits, bag/set
mixing along sequences.
"""

from __future__ import annotations

import random
from collections import Counter

from remove_na_lgbtiq_queer_knowledge_graph_spark.plans.sparql import (
    compile_sparql,
)

PREDS = ["p", "q", "r"]
EX = "http://ex.org/"


# ---------------------------------------------------------------------------
# independent §18.4 evaluator over a python edge list
# ---------------------------------------------------------------------------


def _edges(graph, pred):
    return [(s, o) for s, pp, o in graph if pp == pred]


def _terms(graph):
    ts = set()
    for s, _, o in graph:
        ts.add(s)
        ts.add(o)
    return ts


def ref_eval(ast, graph) -> Counter:
    kind = ast[0]
    if kind == "link":
        return Counter(_edges(graph, ast[1]))
    if kind == "inv":
        return Counter({(b, a): n for (a, b), n in ref_eval(ast[1], graph).items()})
    if kind == "seq":
        acc = ref_eval(ast[1][0], graph)
        for sub in ast[1][1:]:
            step = ref_eval(sub, graph)
            nxt: Counter = Counter()
            for (a, b), n1 in acc.items():
                for (b2, c), n2 in step.items():
                    if b == b2:
                        nxt[(a, c)] += n1 * n2
            acc = nxt
        return acc
    if kind == "alt":
        acc: Counter = Counter()
        for sub in ast[1]:
            acc += ref_eval(sub, graph)
        return acc
    if kind == "nps":
        fwd, rev = ast[1], ast[2]
        acc = Counter()
        if fwd:
            for s, pp, o in graph:
                if pp not in fwd:
                    acc[(s, o)] += 1
        if rev:
            for s, pp, o in graph:
                if pp not in rev:
                    acc[(o, s)] += 1
        return acc
    if kind == "mod":
        inner = set(ref_eval(ast[1], graph))
        m = ast[2]
        if m == "?":
            out = inner | {(t, t) for t in _terms(graph)}
            return Counter({p: 1 for p in out})
        # transitive closure (sets)
        closure = set(inner)
        changed = True
        while changed:
            changed = False
            for (a, b) in list(closure):
                for (b2, c) in list(closure):
                    if b == b2 and (a, c) not in closure:
                        closure.add((a, c))
                        changed = True
        if m == "*":
            closure |= {(t, t) for t in _terms(graph)}
        return Counter({p: 1 for p in closure})
    raise AssertionError(ast)


# ---------------------------------------------------------------------------
# render an AST to SPARQL path syntax
# ---------------------------------------------------------------------------


def render(ast) -> str:
    kind = ast[0]
    if kind == "link":
        return f"ex:{ast[1]}"
    if kind == "inv":
        return f"^({render(ast[1])})"
    if kind == "seq":
        return "/".join(f"({render(s)})" for s in ast[1])
    if kind == "alt":
        return "(" + "|".join(render(s) for s in ast[1]) + ")"
    if kind == "nps":
        members = [f"ex:{p}" for p in ast[1]] + [f"^ex:{p}" for p in ast[2]]
        return "!(" + "|".join(members) + ")"
    if kind == "mod":
        return f"({render(ast[1])}){ast[2]}"
    raise AssertionError(ast)


def gen_ast(rng: random.Random, depth: int):
    kinds = ["link", "link", "inv", "nps"]
    if depth > 0:
        kinds += ["seq", "alt", "mod"]
    kind = rng.choice(kinds)
    if kind == "link":
        return ("link", rng.choice(PREDS))
    if kind == "inv":
        return ("inv", gen_ast(rng, depth - 1))
    if kind == "nps":
        n_f = rng.randint(0, 2)
        n_r = rng.randint(0 if n_f else 1, 1)
        return ("nps", tuple(rng.sample(PREDS, n_f)),
                tuple(rng.sample(PREDS, n_r)))
    if kind == "seq":
        return ("seq", tuple(gen_ast(rng, depth - 1)
                             for _ in range(rng.randint(2, 3))))
    if kind == "alt":
        return ("alt", tuple(gen_ast(rng, depth - 1)
                             for _ in range(rng.randint(2, 3))))
    return ("mod", gen_ast(rng, depth - 1), rng.choice("*+?"))


def gen_graph(rng: random.Random):
    nodes = [f"n{i}" for i in range(rng.randint(4, 7))]
    graph = set()
    for _ in range(rng.randint(6, 14)):
        graph.add((rng.choice(nodes), rng.choice(PREDS), rng.choice(nodes)))
    return sorted(graph)


def test_path_algebra_matches_reference_evaluator(spark):
    rng = random.Random(20260815)
    checked = 0
    for case in range(24):
        graph = gen_graph(rng)
        ast = gen_ast(rng, depth=2)
        path = render(ast)
        want = Counter({
            (EX + a, EX + b): n
            for (a, b), n in ref_eval(ast, graph).items()})
        t = spark.createDataFrame(
            [(EX + s, EX + p, EX + o, None, None) for s, p, o in graph],
            "subject string, predicate string, object string, "
            "lang string, dtype string")
        df = compile_sparql(
            f"PREFIX ex: <{EX}>\n"
            f"SELECT ?s ?o WHERE {{ ?s {path} ?o . }}", t)
        got = Counter((r["s"], r["o"]) for r in df.collect())
        assert got == want, (
            f"case {case}: path {path}\ngraph {graph}\n"
            f"missing {want - got}\nextra {got - want}")
        checked += 1
    assert checked == 24


def eps_count(ast) -> int:
    """Bag multiplicity of the zero-length derivation of a path, per
    the engine's §18.4 semantics: ?/*/+ closures are SETS (ε counts
    once when admitted), sequence derivations multiply, alternation
    branches add, links/NPS never admit ε."""
    kind = ast[0]
    if kind in ("link", "nps"):
        return 0
    if kind == "inv":
        return eps_count(ast[1])
    if kind == "seq":
        n = 1
        for sub in ast[1]:
            n *= eps_count(sub)
        return n
    if kind == "alt":
        return sum(eps_count(sub) for sub in ast[1])
    if kind == "mod":
        if ast[2] == "+":
            return 1 if eps_count(ast[1]) else 0
        return 1  # ? and * admit ε with set multiplicity
    raise AssertionError(ast)


def test_absent_anchor_paths_yield_epsilon_solutions(spark):
    """Round 9: a constant anchor ABSENT from the graph can only
    produce zero-length solutions — (ghost, ghost) with multiplicity
    eps_count(path) — because no edge touches the anchor.  This sweeps
    the WHOLE random algebra (alternation branches, nested groups,
    inverses, sequences) against the closed-form ε-derivation count,
    both subject- and object-anchored; before the round-9 seeding fix,
    every eps-admitting alternation/multi-step case returned empty."""
    rng = random.Random(20260817)
    checked_nonzero = 0
    for case in range(30):
        graph = gen_graph(rng)
        ast = gen_ast(rng, depth=2)
        path = render(ast)
        n_eps = eps_count(ast)
        t = spark.createDataFrame(
            [(EX + s, EX + p, EX + o, None, None) for s, p, o in graph],
            "subject string, predicate string, object string, "
            "lang string, dtype string")
        ghost = EX + "ghost"
        want = Counter({(ghost,): n_eps}) if n_eps else Counter()
        df = compile_sparql(
            f"PREFIX ex: <{EX}>\n"
            f"SELECT ?o WHERE {{ ex:ghost {path} ?o . }}", t)
        got = Counter((r["o"],) for r in df.collect())
        assert got == want, f"case {case} subj-anchored: {path}\n" \
                            f"eps={n_eps} got {got}"
        df = compile_sparql(
            f"PREFIX ex: <{EX}>\n"
            f"SELECT ?s WHERE {{ ?s {path} ex:ghost . }}", t)
        got = Counter((r["s"],) for r in df.collect())
        assert got == want, f"case {case} obj-anchored: {path}\n" \
                            f"eps={n_eps} got {got}"
        if n_eps:
            checked_nonzero += 1
    # the sweep must actually exercise ε-admitting shapes (this seed
    # draws 6 among the 30 cases)
    assert checked_nonzero >= 5, checked_nonzero


def test_anchored_paths_match_reference_evaluator(spark):
    """Same sweep with a CONSTANT subject anchor drawn from the graph's
    terms: `<c> PATH ?o` must equal the reference relation filtered to
    src == c (for graph-member anchors the zero-length identity is part
    of the full relation, so filtering is the spec semantics; the
    absent-anchor corners have dedicated unit tests)."""
    rng = random.Random(20260816)
    for case in range(12):
        graph = gen_graph(rng)
        ast = gen_ast(rng, depth=2)
        path = render(ast)
        terms = sorted(_terms(graph))
        anchor = rng.choice(terms)
        want = Counter({
            (EX + a, EX + b): n
            for (a, b), n in ref_eval(ast, graph).items() if a == anchor})
        t = spark.createDataFrame(
            [(EX + s, EX + p, EX + o, None, None) for s, p, o in graph],
            "subject string, predicate string, object string, "
            "lang string, dtype string")
        df = compile_sparql(
            f"PREFIX ex: <{EX}>\n"
            f"SELECT ?o WHERE {{ ex:{anchor} {path} ?o . }}", t)
        got = Counter((EX + anchor, r["o"]) for r in df.collect())
        assert got == want, (
            f"case {case}: anchor {anchor} path {path}\ngraph {graph}\n"
            f"missing {want - got}\nextra {got - want}")
