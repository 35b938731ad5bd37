"""Merged query registry — the driver contract surface.

Aggregates every domain module's SPECS into one dict.  Base import order
is the SURVEY.md §2 walk: relational core, ER/similarity, graph/triples,
LLM-pipeline (dedup/text/ANN), linking, external, streaming twins.

Ordering contract: the driver's correctness gate checks registry entries
in insertion order and may cap how many it verifies per round (round 1
recorded exactly the first 50).  To guarantee every query eventually gets
a driver-green CORRECTNESS row, :func:`all_specs` rotates queries that
already have a green row in a prior ``CORRECTNESS_r*.json`` to the back,
so never-verified queries always lead.
"""

from __future__ import annotations

import glob
import json
import os

from .spec import QuerySpec

# Modules are mandatory: a broken import must fail loudly here rather
# than silently shrinking the verified surface (a swallowed ImportError
# would make every query in the module vanish from the driver contract
# while the correctness gate still passes).
_MODULES = (
    "queries_relational",
    "queries_er",
    "queries_graph",
    "queries_sparql",
    "queries_llm",
    "queries_linking",
    "queries_external",
    "queries_streaming",
    # round-2 additions go last so queries that have been waiting for a
    # driver-green row since round 1 keep their place at the head of the
    # never-verified ordering
    "queries_sparql2",
    "queries_llm2",
    # round-8 continuation: training-tier LLM ops (BPE, logreg,
    # SemDeDup) — appended last per the rotation ordering contract
    "queries_llm3",
    # round-11: curation tier (upsampling, blocklist, survivorship,
    # inter-arrival QA)
    "queries_curation",
    # round-12: unigram-LM tokenizer trainer + encoder
    "queries_ulm",
    # round-13b: URL-canonical dedup + k-center diversity coreset
    "queries_selection",
)


def _last_green_round() -> dict[str, int]:
    """Latest driver round with a fully-green row, per query name, from
    CORRECTNESS_r*.json (repo root; the local all-query runs are named
    CORRECTNESS_local_* and deliberately not matched — rotation tracks
    DRIVER verification staleness).  Missing/unreadable files → empty
    dict (base order stands)."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        try:
            rnd = int(os.path.basename(path)[len("CORRECTNESS_r"):-len(".json")])
        except ValueError:
            continue
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                last[name] = max(last.get(name, 0), rnd)
    return last


def all_specs() -> dict[str, QuerySpec]:
    base: dict[str, QuerySpec] = {}
    for mod_name in _MODULES:
        mod = __import__(f"{__package__}.{mod_name}", fromlist=["SPECS"])
        dup = base.keys() & mod.SPECS.keys()
        if dup:
            # dict.update would silently shadow the earlier spec: the
            # driver's green rows would keep the name alive while the
            # shadowed query is never verified again — the exact
            # silent-shrink failure the mandatory-import rule exists for
            raise ValueError(
                f"duplicate query name(s) {sorted(dup)} in {mod_name}")
        base.update(mod.SPECS)

    # Least-recently-verified first: never-verified queries lead (base
    # module order), then ascending by the last driver round that
    # re-checked them — the driver verifies a window from the head each
    # round, so stale greens (whose shared fixtures may have been
    # refactored since) cycle back through driver verification instead
    # of keeping their round-1 row forever.
    last = _last_green_round()
    order = sorted(
        enumerate(base.items()),
        key=lambda e: (last.get(e[1][0], 0), e[0]),
    )
    return {name: spec for _, (name, spec) in order}
