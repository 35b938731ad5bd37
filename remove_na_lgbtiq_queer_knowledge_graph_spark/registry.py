"""Merged query registry — the driver contract surface.

Aggregates every domain module's SPECS into one dict.  Import order is
the SURVEY.md §2 walk: relational core, ER/similarity, graph/triples,
LLM-pipeline (dedup/text/ANN), streaming twins.
"""

from __future__ import annotations

from .spec import QuerySpec


def all_specs() -> dict[str, QuerySpec]:
    specs: dict[str, QuerySpec] = {}
    from . import queries_relational

    specs.update(queries_relational.SPECS)

    for mod_name in ("queries_er", "queries_graph", "queries_llm",
                     "queries_linking", "queries_external",
                     "queries_streaming"):
        try:
            mod = __import__(f"{__package__}.{mod_name}", fromlist=["SPECS"])
        except ImportError:
            continue
        specs.update(mod.SPECS)
    return specs
