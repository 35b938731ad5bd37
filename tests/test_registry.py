"""Registry contract locks.

Round 3's lesson: a silent environment change (testdata format) can turn
green queries red without any code change.  These locks make the
registry's *shape* part of the test contract so a refactor that drops a
query, loses an oracle, or breaks a callable import fails fast and
locally — before the driver's 50-query rotation finds it.
"""

from __future__ import annotations


def test_every_spec_has_an_oracle():
    """Since round 4 every registered query is oracle-checkable — the
    two historical rows-only entries (er_lsh_pairs, agg_sketch_distinct)
    were re-expressed in oracle-matchable form.  A new rows-only entry
    must be a deliberate, documented decision, not a regression."""
    from remove_na_lgbtiq_queer_knowledge_graph_spark.registry import all_specs

    missing = [n for n, s in all_specs().items() if s.oracle is None]
    assert missing == [], f"queries without oracle SQL: {missing}"


def test_registry_does_not_shrink():
    """205 queries registered in round 8 (195 end of round 7 + the
    path-algebra entries sparql_alt_path/sparql_negated_path/
    sparql_group_closure/sparql_alt_closure, sparql_langmatches,
    sparql_ask_members, sparql_construct_members,
    sparql_describe_nations, ann_pq_topk, ann_ivf_pq_topk)."""
    from remove_na_lgbtiq_queer_knowledge_graph_spark.registry import all_specs

    assert len(all_specs()) >= 205


def test_rotation_orders_by_staleness():
    """The driver verifies a window from the registry head each round,
    so ordering must be least-recently-verified first: never-verified
    queries lead, then ascending last-green driver round."""
    from remove_na_lgbtiq_queer_knowledge_graph_spark.registry import (
        _last_green_round,
        all_specs,
    )

    last = _last_green_round()
    assert last, "driver CORRECTNESS_r*.json rows should exist"
    names = list(all_specs())
    rounds = [last.get(n, 0) for n in names]
    # The real invariant: ascending last-green driver round along the
    # registry walk.  (Round 5's version also asserted that that round's
    # two new queries led — true only until the driver verified them, so
    # it asserted transient artifact state, not a code invariant.)
    assert rounds == sorted(rounds)
    # Never-verified entries (round 0), when any exist, form a prefix.
    # (default=len(rounds): all-unverified is a valid state — e.g.
    # after a mass rename — not an opaque StopIteration)
    if 0 in rounds:
        first_verified = next(
            (i for i, r in enumerate(rounds) if r > 0), len(rounds))
        assert all(r == 0 for r in rounds[:first_verified])
    # And a name absent from every artifact would sort before any
    # verified name — the staleness key treats unknown as round 0.
    assert last.get("__never_verified_synthetic__", 0) == 0 < max(rounds)


def test_docs_cite_only_real_registry_names():
    """Drift guard (VERDICT r6): COVERAGE.md / PLANS.md claims are big
    enough to rot silently when a query is renamed or dropped.  Every
    backticked registry-shaped name in those docs must resolve to a
    registry key (names only — existence, not prose)."""
    import pathlib
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    from tools.check_docs import find_drift

    assert find_drift() == {}


def test_driver_entry_surface():
    """The driver contract: queries() and oracle_sql() agree on keys and
    every callable is importable."""
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__",
        str(pathlib.Path(__file__).resolve().parents[1]
            / "__spark_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    qs = mod.queries()
    os_ = mod.oracle_sql()
    # exact key agreement, not subset: every spec carries an oracle by
    # contract, and `<=` would hold trivially if oracle_sql() regressed
    # to {} — silently downgrading the whole gate to rows-only checks
    assert set(os_) == set(qs)
    assert all(callable(fn) for fn in qs.values())
