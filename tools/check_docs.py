"""Registry↔doc drift guard (VERDICT r6 task 8).

COVERAGE.md and PLANS.md cite registry query names in backticks; those
claims are now large enough to rot silently when a query is renamed or
removed (the r6 "+0.2 s" case).  This tool extracts every backticked
token that *looks like* a registry name — all [a-z0-9_] with an
underscore, whose first segment matches a prefix some real registry key
uses — and asserts it exists in the registry.  Names only: existence,
not prose.

Deliberately one-directional: docs may legitimately omit registry
entries (PLANS.md only audits the expensive ones), but a doc that
names a nonexistent query is always a rot bug.

Usage: python tools/check_docs.py   (exit 1 on drift)
Also wired into the test suite (tests/test_registry.py).
"""

from __future__ import annotations

import re
import pathlib
import sys

REPO = str(pathlib.Path(__file__).resolve().parents[1])
sys.path.insert(0, REPO)

DOCS = [REPO + "/COVERAGE.md", REPO + "/PLANS.md"]

# backticked identifiers that share a registry prefix but are not (and
# should not be) registry entries: operator/function names, bench
# fields, config knobs.  Currently EMPTY — both docs resolve fully;
# only add names a reviewer has confirmed are intentional
# non-registry mentions.
ALLOW: set[str] = set()


def candidate_names(text: str, prefixes: set[str]) -> set[str]:
    out = set()
    for tok in re.findall(r"`([^`]+)`", text):
        if not re.fullmatch(r"[a-z][a-z0-9_]*", tok) or "_" not in tok:
            continue
        if tok.split("_", 1)[0] in prefixes:
            out.add(tok)
    return out


def find_drift() -> dict[str, list[str]]:
    """Per-doc list of backticked registry-shaped names that don't
    resolve to a registry key (after the allowlist)."""
    from remove_na_lgbtiq_queer_knowledge_graph_spark.registry import all_specs

    keys = set(all_specs())
    prefixes = {k.split("_", 1)[0] for k in keys}
    drift: dict[str, list[str]] = {}
    for path in DOCS:
        with open(path) as f:
            text = f.read()
        bad = sorted(candidate_names(text, prefixes) - keys - ALLOW)
        if bad:
            drift[path] = bad
    return drift


def main() -> int:
    drift = find_drift()
    for path, names in drift.items():
        print(f"DRIFT {path}: {names}")
    if not drift:
        print("docs clean: every registry-shaped name resolves")
    return 1 if drift else 0


if __name__ == "__main__":
    sys.exit(main())
