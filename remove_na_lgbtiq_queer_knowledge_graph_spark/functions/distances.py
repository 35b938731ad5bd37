"""String-distance functions beyond the builtin levenshtein
(SURVEY.md §2.9 F8: the reference uses stringdist methods ``lv``,
``osa``, ``dl``, ``jw`` — `find-duplicates-authors.R:133-137`,
`entities/03:68`).

``levenshtein`` is a Spark builtin (JVM, codegen).  OSA (optimal string
alignment) and Jaro-Winkler have no builtin — implemented as Arrow-
batched pandas UDFs (the sanctioned slow path).  Always join on a
blocking key first; these run per candidate pair, never all-pairs.

Jaro-Winkler follows the standard definition (prefix ≤ 4, p = 0.1,
boost threshold 0.7) so it agrees with DuckDB's
``jaro_winkler_similarity`` — keeping even the UDF path oracle-checkable.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _osa(s1: str, s2: str) -> int:
    """Optimal string alignment (restricted Damerau-Levenshtein):
    levenshtein + adjacent transposition, no substring re-edit."""
    n, m = len(s1), len(s2)
    d = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(n + 1):
        d[i][0] = i
    for j in range(m + 1):
        d[0][j] = j
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            cost = 0 if s1[i - 1] == s2[j - 1] else 1
            d[i][j] = min(d[i - 1][j] + 1, d[i][j - 1] + 1, d[i - 1][j - 1] + cost)
            if i > 1 and j > 1 and s1[i - 1] == s2[j - 2] and s1[i - 2] == s2[j - 1]:
                d[i][j] = min(d[i][j], d[i - 2][j - 2] + 1)
    return d[n][m]


def _jaro(s1: str, s2: str) -> float:
    n, m = len(s1), len(s2)
    # empty-vs-anything (incl. empty-vs-empty) is 0 — DuckDB's
    # convention, kept so the UDF stays oracle-checkable
    if n == 0 or m == 0:
        return 0.0
    if s1 == s2:
        return 1.0
    window = max(n, m) // 2 - 1
    match1 = [False] * n
    match2 = [False] * m
    matches = 0
    for i in range(n):
        lo, hi = max(0, i - window), min(m, i + window + 1)
        for j in range(lo, hi):
            if not match2[j] and s1[i] == s2[j]:
                match1[i] = match2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(n):
        if match1[i]:
            while not match2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (matches / n + matches / m + (matches - t) / matches) / 3.0


def _jaro_winkler(s1: str, s2: str, p: float = 0.1, threshold: float = 0.7) -> float:
    j = _jaro(s1, s2)
    if j > threshold:
        prefix = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a != b:
                break
            prefix += 1
        j += prefix * p * (1.0 - j)
    return j


# NULL inputs propagate NULL, matching DuckDB's distance functions and
# Spark's builtin levenshtein — the old `x or ""` coercion returned
# 0/0.0 for NULL names, silently diverging from both (round-13 review).
# The coercion survives only for the empty STRING, where `x or ""` is
# the identity.
@F.pandas_udf(T.IntegerType())
def osa_distance(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series([
        None if x is None or y is None else _osa(x, y)
        for x, y in zip(a, b)], dtype="Int32")


@F.pandas_udf(T.DoubleType())
def jaro_winkler_sim(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series([
        None if x is None or y is None else _jaro_winkler(x, y)
        for x, y in zip(a, b)], dtype="float64")
