"""Entity-linking + publishing operators (SURVEY.md §2 Phase 4, FIXTURES §4).

The reference links entities to external authorities (Wikidata/GND/VIAF)
into an ``el_matches`` table with confidence tiers (``hierarchy``,
`04-persons.R:627`), keeps the best match per entity
(`book-authors-viaf.R:52-58`), builds label cascades across languages
(`04-persons.R:478-483`), and publishes via long-format QuickStatements
in 20-item batches (`04-persons.R:521-533`).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def best_match_per_entity(
    matches: DataFrame, entity_col: str,
    order: Sequence[Column],
) -> DataFrame:
    """J12 with confidence tiers: keep the single best external match per
    entity, ranked by (hierarchy, score, stable tie-break)."""
    w = Window.partitionBy(entity_col).orderBy(*order)
    return (
        matches.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .drop("__rk")
    )


def label_cascade(df: DataFrame, out: str, *candidates: Column) -> DataFrame:
    """P4 label/description fallback cascade — first non-null of the
    per-language label columns (Lde/Len/... fallbacks,
    `04-persons.R:478-483`)."""
    return df.withColumn(out, F.coalesce(*candidates))


def quickstatements_long(
    df: DataFrame, item_col: str, statements: dict[str, Column],
    batch_size: int = 20, eager: bool = True,
) -> DataFrame:
    """S12+R3: wide entity rows → long (item, property, value) statement
    rows with a 20-item upload batch number (`04-persons.R:521-533`).

    The batch number is assigned per distinct item over a total order —
    the publishing chunking the reference does with group_split.  The
    numbering uses the two-pass :func:`dense_ids` plan (range partition +
    per-partition offsets), not ``ROW_NUMBER() OVER (ORDER BY item)`` —
    a global window would pull every distinct item through one task.

    The melt is a union of one projection per property, and the batch
    numbering + final join reference the frame again — Spark shares no
    identical subplans across DataFrame branches, so an expensive
    upstream (the persons multi-join) would re-execute once per branch
    per job (~18× observed).  So: project the wide frame down to
    (item, value…) FIRST, materialize it once (``eager=True``,
    :func:`..spec.materialize`), and derive the melt, the distinct item
    list, and the batch join all from the checkpointed narrow frame.
    ``eager=False`` keeps the op fully lazy for callers that already
    persist their input.
    """
    from ..spec import materialize
    from .relational import dense_ids

    if not statements:
        raise ValueError(
            "quickstatements_long: statements must be non-empty")
    if batch_size <= 0:
        # non-ANSI Spark turns /0 into NULL batch numbers — silent
        # corruption of the upload chunking (round-13 review)
        raise ValueError(
            f"quickstatements_long: batch_size must be > 0, "
            f"got {batch_size}")
    props = list(statements)
    wide = df.select(
        F.col(item_col).cast("string").alias("item"),
        *[
            expr.cast("string").alias(f"__v{i}")
            for i, expr in enumerate(statements.values())
        ],
    )
    if eager:
        wide = materialize(wide)
    parts = [
        wide.select(
            "item",
            F.lit(prop).alias("property"),
            F.col(f"__v{i}").alias("value"),
        )
        for i, prop in enumerate(props)
    ]
    long = parts[0]
    for p in parts[1:]:
        long = long.unionByName(p)
    long = long.filter(F.col("value").isNotNull())
    items = wide.select("item").distinct()
    # dense_ids ALWAYS materializes its internal range-partitioned
    # frame: that is its two-pass correctness requirement (divergent
    # range-boundary sampling between passes gaps/overlaps ids), and a
    # caller persisting the *input* does not stabilize the *internal*
    # shuffle — `eager` governs only the wide-frame checkpoint above.
    batches = dense_ids(items, ["item"], out="__rn").withColumn(
        "batch", ((F.col("__rn") - 1) / batch_size).cast("long")
    ).drop("__rn")
    return long.join(batches, "item")


def add_statement(
    df: DataFrame, rules: DataFrame, on: str | list[str]
) -> DataFrame:
    """X2 ``add_statement``: attach statements from a rules table by key
    join (the reference builds statements row-wise; here it is one
    broadcast join, `01-addresses.R:50-102`)."""
    return df.join(F.broadcast(rules), on, "left")
