"""Differential fuzz of the SPARQL scalar-expression surface (round 8).

Random expression trees are generated as PAIRS — a SPARQL rendering for
the engine and a semantically-identical SQL rendering for DuckDB — and
evaluated over the same rows: the engine computes
``SELECT ?s (EXPR AS ?e)`` over a two-predicate BGP, DuckDB computes
``SELECT s, EXPR_SQL AS e`` over the equivalent relational table.
Numeric results compare after 9-decimal rounding (the engine evaluates
arithmetic in double per §17.3; integer-typed results like STRLEN/CEIL
coerce before comparing).

Known deliberate pairings (semantics, not syntax):
- REPLACE is global → DuckDB ``regexp_replace(..., 'g')``;
- arithmetic casts both operands to double on both sides;
- division keeps a non-zero literal denominator (cross-engine
  ±inf/NaN conventions differ and SPARQL calls it an error anyway).
"""

from __future__ import annotations

import random
from collections import Counter

import duckdb

from remove_na_lgbtiq_queer_knowledge_graph_spark.plans.sparql import (
    compile_sparql,
)

EX = "http://ex.org/"

WORDS = ["alpha", "Beta", "GAMMA delta", "x", "Queer Knowledge", "remove-na"]
NUMS = ["3", "17", "4.5", "0", "100"]


def gen_rows(rng: random.Random, n: int = 12):
    return [(f"s{i:02d}", rng.choice(WORDS), rng.choice(NUMS))
            for i in range(n)]


# each generator returns (sparql, sql, kind) where kind ∈ {"str", "num",
# "bool"}


def _lit(rng):
    w = rng.choice(WORDS)
    return f'"{w}"', f"'{w}'"


def _gen_str(rng, depth):
    opts = ["var", "lit"]
    if depth > 0:
        opts += ["ucase", "lcase", "concat", "substr", "replace", "if",
                 "strbefore", "strafter"]
    k = rng.choice(opts)
    if k == "var":
        return "?v", "v"
    if k == "lit":
        sp, sq = _lit(rng)
        return sp, sq
    if k == "ucase":
        sp, sq = _gen_str(rng, depth - 1)
        return f"UCASE({sp})", f"upper({sq})"
    if k == "lcase":
        sp, sq = _gen_str(rng, depth - 1)
        return f"LCASE({sp})", f"lower({sq})"
    if k == "concat":
        a = _gen_str(rng, depth - 1)
        b = _gen_str(rng, depth - 1)
        return f"CONCAT({a[0]}, {b[0]})", f"({a[1]} || {b[1]})"
    if k == "substr":
        sp, sq = _gen_str(rng, depth - 1)
        start = rng.randint(1, 3)
        if rng.random() < 0.5:
            ln = rng.randint(0, 4)
            return (f"SUBSTR({sp}, {start}, {ln})",
                    f"substr({sq}, {start}, {ln})")
        # engine's no-length form passes length(s) explicitly
        return (f"SUBSTR({sp}, {start})",
                f"substr({sq}, {start}, length({sq}))")
    if k == "strbefore":
        sp, sq = _gen_str(rng, depth - 1)
        sep = rng.choice(["a", "e", " ", "-"])
        # §17.4.3.15: empty string when the separator is absent
        return (f'STRBEFORE({sp}, "{sep}")',
                f"(CASE WHEN position('{sep}' IN {sq}) > 0 THEN "
                f"substr({sq}, 1, position('{sep}' IN {sq}) - 1) "
                f"ELSE '' END)")
    if k == "strafter":
        sp, sq = _gen_str(rng, depth - 1)
        sep = rng.choice(["a", "e", " ", "-"])
        return (f'STRAFTER({sp}, "{sep}")',
                f"(CASE WHEN position('{sep}' IN {sq}) > 0 THEN "
                f"substr({sq}, position('{sep}' IN {sq}) + {len(sep)}) "
                f"ELSE '' END)")
    if k == "replace":
        sp, sq = _gen_str(rng, depth - 1)
        pat, rep = rng.choice([("a", "_"), ("e", "3"), (" ", "+")])
        # SPARQL REPLACE is regex and GLOBAL → DuckDB needs the 'g'
        # flag (its default replaces the first match only)
        return (f'REPLACE({sp}, "{pat}", "{rep}")',
                f"regexp_replace({sq}, '{pat}', '{rep}', 'g')")
    cond = _gen_bool(rng, depth - 1)
    a = _gen_str(rng, depth - 1)
    b = _gen_str(rng, depth - 1)
    return (f"IF({cond[0]}, {a[0]}, {b[0]})",
            f"(CASE WHEN {cond[1]} THEN {a[1]} ELSE {b[1]} END)")


def _gen_num(rng, depth):
    opts = ["nvar", "nlit", "strlen"]
    if depth > 0:
        opts += ["arith", "round", "abs", "floor", "ceil"]
    k = rng.choice(opts)
    if k == "nvar":
        # a BARE var projects its RDF lexical form (a string) in the
        # engine — numeric atoms therefore coerce through arithmetic
        # (+ 0), which both engines evaluate in double
        return "(?n + 0)", "(CAST(n AS DOUBLE) + 0)"
    if k == "nlit":
        v = rng.choice(NUMS)
        return f"({v} + 0)", f"(CAST({v} AS DOUBLE) + 0)"
    if k == "strlen":
        sp, sq = _gen_str(rng, depth - 1)
        return f"STRLEN({sp})", f"length({sq})"
    if k == "arith":
        a = _gen_num(rng, depth - 1)
        b = _gen_num(rng, depth - 1)
        op = rng.choice(["+", "-", "*", "/"])
        if op == "/":
            d = rng.choice(["7", "4.5", "100"])
            return (f"({a[0]} / {d})",
                    f"(CAST({a[1]} AS DOUBLE) / CAST({d} AS DOUBLE))")
        return (f"({a[0]} {op} {b[0]})",
                f"(CAST({a[1]} AS DOUBLE) {op} CAST({b[1]} AS DOUBLE))")
    sp, sq = _gen_num(rng, depth - 1)
    fn = {"round": "round", "abs": "abs", "floor": "floor",
          "ceil": "ceil"}[k]
    return (f"{k.upper()}({sp})", f"{fn}(CAST({sq} AS DOUBLE))")


def _gen_bool(rng, depth):
    k = rng.choice(["cmp", "contains", "starts", "ends", "inlist"]
                   + (["and", "or", "not"] if depth > 0 else []))
    if k == "cmp":
        a = _gen_num(rng, depth - 1)
        b = _gen_num(rng, depth - 1)
        op = rng.choice(["=", "!=", "<", ">", "<=", ">="])
        return (f"({a[0]} {op} {b[0]})",
                f"(CAST({a[1]} AS DOUBLE) {op} CAST({b[1]} AS DOUBLE))")
    if k == "contains":
        a = _gen_str(rng, depth - 1)
        sub = rng.choice(["a", "e", "x", "Z"])
        return (f'CONTAINS({a[0]}, "{sub}")',
                f"contains({a[1]}, '{sub}')")
    if k == "starts":
        a = _gen_str(rng, depth - 1)
        pre = rng.choice(["a", "B", "Q"])
        return (f'STRSTARTS({a[0]}, "{pre}")',
                f"starts_with({a[1]}, '{pre}')")
    if k == "ends":
        a = _gen_str(rng, depth - 1)
        suf = rng.choice(["a", "x", "na"])
        return (f'STRENDS({a[0]}, "{suf}")',
                f"(CASE WHEN length({a[1]}) >= length('{suf}') THEN "
                f"substr({a[1]}, length({a[1]}) - length('{suf}') + 1) "
                f"= '{suf}' ELSE FALSE END)")
    if k == "inlist":
        a = _gen_str(rng, depth - 1)
        items = rng.sample(WORDS, 2)
        sp = ", ".join(f'"{w}"' for w in items)
        sq = ", ".join(f"'{w}'" for w in items)
        neg = rng.random() < 0.4
        if neg:
            return (f"({a[0]} NOT IN ({sp}))",
                    f"({a[1]} NOT IN ({sq}))")
        return f"({a[0]} IN ({sp}))", f"({a[1]} IN ({sq}))"
    if k == "not":
        a = _gen_bool(rng, depth - 1)
        return f"(!{a[0]})", f"(NOT {a[1]})"
    a = _gen_bool(rng, depth - 1)
    b = _gen_bool(rng, depth - 1)
    if k == "and":
        return f"({a[0]} && {b[0]})", f"({a[1]} AND {b[1]})"
    return f"({a[0]} || {b[0]})", f"({a[1]} OR {b[1]})"


def _norm(x):
    if isinstance(x, bool):
        return x
    if isinstance(x, (int, float)):
        return round(float(x), 9)
    return x


def test_expression_surface_differential_vs_duckdb(spark):
    rng = random.Random(20260817)
    con = duckdb.connect()
    con.sql("CREATE TABLE r(s VARCHAR, v VARCHAR, n VARCHAR)")
    for case in range(40):
        rows = gen_rows(rng)
        con.sql("DELETE FROM r")
        con.executemany("INSERT INTO r VALUES (?, ?, ?)", rows)
        sp, sq, kind = None, None, rng.choice(["str", "num", "bool"])
        sp, sq = {"str": _gen_str, "num": _gen_num,
                  "bool": _gen_bool}[kind](rng, 2)
        t = spark.createDataFrame(
            [(EX + s, EX + "val", v, None, None) for s, v, _ in rows]
            + [(EX + s, EX + "num", n, None, None) for s, _, n in rows],
            "subject string, predicate string, object string, "
            "lang string, dtype string")
        df = compile_sparql(
            f"PREFIX ex: <{EX}>\n"
            f"SELECT ?s ({sp} AS ?e) WHERE {{ "
            f"?s ex:val ?v . ?s ex:num ?n . }}", t)
        got = Counter((r["s"][len(EX):], _norm(r["e"]))
                      for r in df.collect())
        want = Counter((s, _norm(e)) for s, e in con.sql(
            f"SELECT s, {sq} AS e FROM r").fetchall())
        assert got == want, (
            f"case {case} ({kind}):\nSPARQL {sp}\nSQL    {sq}\n"
            f"rows {rows}\nmissing {want - got}\nextra {got - want}")
