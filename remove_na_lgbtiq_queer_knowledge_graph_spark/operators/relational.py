"""Named relational idioms (SURVEY.md §2.2-2.8).

Each function is a thin DataFrame→DataFrame operator mirroring a tidyverse
pattern the reference uses pervasively.  They are deliberately *plans*,
not actions: Catalyst sees the whole composed query, so pushdown, pruning
and join selection work across operator boundaries.

Determinism note: every window is ordered by a *total* key (ties broken
by a unique column) so results are stable across partitionings — required
for oracle comparison and for reproducible runs on a 1000-executor
cluster.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def keep_first_per_group(
    df: DataFrame, keys: Sequence[str], order: Sequence[Column]
) -> DataFrame:
    """W2: ``group_by(...) %>% filter(row_number()==1)`` dedupe.

    Reference: ``chronik/02-distinct-entities-from-chronik.R:36-38``,
    ``apps/entity-resolver/index.Rmd:296-299``.
    """
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def argmax_per_group(
    df: DataFrame, keys: Sequence[str], score: Column, tiebreak: Sequence[Column] = ()
) -> DataFrame:
    """A4/J12: keep row(s) with the max score per group (best-match join
    tail).  Reference: ``data-linking/book-authors-viaf.R:52-58``."""
    w = Window.partitionBy(*keys).orderBy(score.desc(), *tiebreak)
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .drop("__rk")
    )


def elect_first_per_group(
    df: DataFrame, keys: Sequence[str], order: Sequence[Column], col: str, out: str
) -> DataFrame:
    """W3: canonical-value election — ``arrange(...) %>% mutate(x =
    first(x))``.  Reference: ``chronik/02:250-254``."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return df.withColumn(out, F.first(col).over(w))


def fill_down(df: DataFrame, col: str, order: Sequence[Column]) -> DataFrame:
    """W7: tidyr ``fill(.direction="down")`` — last non-null so far.

    Reference: ``data-gathering/from-pdf/themengeschichtspfad.R:68``.
    Note: a global ordered fill serializes into one partition; at scale,
    partition by a document/section key first (pass it via ``order`` on a
    pre-partitioned frame or use fill_down_grouped).
    """
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(col, F.last(col, ignorenulls=True).over(w))


def fill_down_grouped(
    df: DataFrame, col: str, keys: Sequence[str], order: Sequence[Column]
) -> DataFrame:
    """Partitioned fill-down — the scale-safe variant."""
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn(col, F.last(col, ignorenulls=True).over(w))


def string_agg(
    df: DataFrame, keys: Sequence[str], col: str, out: str, sep: str = ", "
) -> DataFrame:
    """A1: per-key ordered string aggregation (``glue_collapse`` per group,
    reference ``from-citavi/books.R:55-57``).

    ``collect_list`` order is partition-dependent, so we sort the array —
    deterministic at any scale.
    """
    return df.groupBy(*keys).agg(
        F.array_join(F.array_sort(F.collect_list(col)), sep).alias(out)
    )


def explode_delimited(df: DataFrame, col: str, sep: str, out: str | None = None) -> DataFrame:
    """R1: ``separate_rows`` — split a delimited string into rows, trimmed.

    Reference: ``books.R:131-134``.
    """
    out = out or col
    return df.withColumn(out, F.explode(F.transform(F.split(F.col(col), sep), F.trim)))


def melt(df: DataFrame, ids: Sequence[str], value_cols: Sequence[str],
         var_name: str = "variable", value_name: str = "value") -> DataFrame:
    """R3: wide→long (``pivot_longer``, 67 uses in the reference)."""
    pairs = ", ".join(f"'{c}', `{c}`" for c in value_cols)
    stack_expr = f"stack({len(value_cols)}, {pairs}) as (`{var_name}`, `{value_name}`)"
    return df.selectExpr(*ids, stack_expr)


def pivot_wide(
    df: DataFrame, keys: Sequence[str], name_col: str, value_col: str,
    names: Sequence[str],
) -> DataFrame:
    """R4: long→wide (``pivot_wider``).  Passing explicit ``names`` avoids
    the extra distinct-scan Spark needs to discover pivot values — the
    same reason ``pivot_wider`` wants ``names_expected`` at scale."""
    return df.groupBy(*keys).pivot(name_col, list(names)).agg(F.first(value_col))


def anti_incremental(df: DataFrame, done: DataFrame, on: Sequence[str]) -> DataFrame:
    """J4: the incremental idiom — exclude already-processed keys before
    expensive work.  Reference: ``lobid/02-search-via-author-title.R:36-49``."""
    return df.join(done.select(*on).dropDuplicates(list(on)), list(on), "left_anti")


def assert_unique(df: DataFrame, keys: Sequence[str]) -> None:
    """§5 assertion op: fail fast when a key is not unique.

    Reference: ``testdat::expect_unique`` inline assertions
    (``poster-books/01:112-115``, ``books.R:171-179``).
    """
    dup = df.groupBy(*keys).count().filter(F.col("count") > 1)
    offenders = dup.limit(5).collect()
    if offenders:
        raise AssertionError(f"keys {list(keys)} not unique; sample dupes: {offenders}")


def assert_no_null(df: DataFrame, cols: Sequence[str]) -> None:
    """§5 completeness assertion (``12-events.R:112-115``)."""
    pred = None
    for c in cols:
        p = F.col(c).isNull()
        pred = p if pred is None else (pred | p)
    bad = df.filter(pred).limit(5).collect()
    if bad:
        raise AssertionError(f"null values in {list(cols)}; sample: {bad}")


def salted_join(
    fact: DataFrame, dim: DataFrame, key: str, n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: split each fact key into ``n_salts``
    sub-partitions via a deterministic salt, replicate the (small) dim
    side across all salts, join on (key, salt).

    Semantically identical to ``fact.join(dim, key, how)`` — the salt is
    an execution detail that never reaches the output.  Use when a few
    hot keys (a viral document id, a null-bucket fk) would pin one
    reducer: the hot key's rows now spread over ``n_salts`` tasks.  AQE's
    skew-join handles *sorted-shuffle* skew automatically; salting is the
    explicit form that also covers aggregations-after-join and works with
    AQE off.  Dim-side cost is ×n_salts rows — keep the dim the small
    side (it is usually broadcastable anyway; salting matters when the
    dim is too big to broadcast but far smaller than the fact).
    """
    salt = F.pmod(F.xxhash64(*[c for c in fact.columns]), F.lit(n_salts))
    f = fact.withColumn("__salt", salt.cast("int"))
    d = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return f.join(d, [key, "__salt"], how).drop("__salt")


def asof_join(
    left: DataFrame, right: DataFrame, key: str, ts: str,
    value_cols: Sequence[str], tie_break: str | None = None,
) -> DataFrame:
    """As-of join: each left row picks the latest right row with
    ``right.ts <= left.ts`` per key (time-series enrichment; Spark has
    no native asof).

    Implemented the scale-correct way: tag both sides, union, one
    window sorted by (ts, side[, tie]) per key, fill the right values
    down, keep left rows.  ONE shuffle on the key and no range-join
    blowup — the naive ``ON r.ts <= l.ts`` join explodes to the full
    per-key cross product before aggregation.  Ties at equal ts are
    resolved right-row-first (so an exact-ts match is visible) and by
    ``tie_break`` among simultaneous right rows (keep the max) — total
    order, deterministic.
    """
    lcols = [c for c in left.columns]
    sel_l = [F.col(c) for c in lcols] + [F.lit(None).cast(d).alias(v)
             for v, d in zip(value_cols, [dict(right.dtypes)[v] for v in value_cols])]
    tagged_l = left.select(*sel_l, F.lit(1).alias("__side"))
    sel_r = (
        [F.col(key), F.col(ts)]
        + [F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
           for c in lcols if c not in (key, ts)]
        + [F.col(v) for v in value_cols]
    )
    tagged_r = right.select(*sel_r, F.lit(0).alias("__side")).select(
        *[F.col(c) for c in tagged_l.columns if c != "__side"], F.col("__side")
    )
    order = [F.col(ts), F.col("__side")]
    if tie_break:
        order.append(F.col(tie_break))
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = tagged_l.unionByName(tagged_r)
    for v in value_cols:
        filled = filled.withColumn(v, F.last(v, ignorenulls=True).over(w))
    return filled.filter(F.col("__side") == 1).drop("__side")
