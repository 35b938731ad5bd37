"""Entity-resolution operators (SURVEY.md §2.10 T9/T10).

The reference resolves duplicates by a fragile 2-round manual id remap
(``update_ids`` at ``chronik/03-create-clean-chronik-entities.R:79-127``,
with a known bug in round 2).  We replace it with connected components
over the positive-pair graph + canonical-id election — the principled
fixpoint of what the reference iterates by hand.

``connected_components`` is a pure-DataFrame min-label propagation with
per-iteration ``localCheckpoint`` (lineage truncation).  Iterations ~
graph diameter; ER similarity graphs are shallow (duplicate clusters are
cliques-ish), so convergence is fast.  At extreme scale swap in the
large-star/small-star algorithm (Kiveris et al., "Connected Components
in MapReduce") — same DataFrame-only contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 50
) -> DataFrame:
    """(node, component) where component = min node id reachable.

    Deterministic (min over the component), so oracle-comparable.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = e.union(e.select(F.col("v"), F.col("u"))).distinct()
    sym = sym.localCheckpoint()
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr = sym.join(
            labels.withColumnRenamed("node", "v"), "v"
        ).select(F.col("u").alias("node"), "comp")
        new = (
            labels.union(nbr)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint()
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new
        if changed == 0:
            break
    return labels


def resolve_entities(
    entities: DataFrame,
    positive_pairs: DataFrame,
    id_col: str = "id",
    name_col: str = "name",
) -> DataFrame:
    """T9/T10: positive pairs → components → canonical id + label election.

    Returns (id, name, id_new, name_new): every entity mapped to its
    component representative; canonical label = the label of the highest
    member id (the reference's ``arrange(desc(id)) %>% mutate(id_new =
    first(id))`` election, ``chronik/02:250-254``).  Singletons map to
    themselves.
    """
    cc = connected_components(positive_pairs, "id_1", "id_2")
    mapped = entities.join(
        cc.withColumnRenamed("node", id_col), id_col, "left"
    ).withColumn("comp", F.coalesce(F.col("comp"), F.col(id_col)))
    w = (
        Window.partitionBy("comp")
        .orderBy(F.col(id_col).desc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return mapped.select(
        F.col(id_col),
        F.col(name_col),
        F.first(id_col).over(w).alias("id_new"),
        F.first(name_col).over(w).alias("name_new"),
    )


def update_ids(df: DataFrame, mapping: DataFrame, id_col: str) -> DataFrame:
    """X2: apply an id_mapping (id → id_new) to a table — the reference's
    ``update_ids`` join (``chronik/03:79-88``), one join instead of its
    two manual rounds (transitivity already collapsed by
    connected_components)."""
    m = mapping.select(
        F.col("id").alias("__old"), F.col("id_new").alias("__new")
    )
    return (
        df.join(m, df[id_col] == F.col("__old"), "left")
        .withColumn(id_col, F.coalesce(F.col("__new"), F.col(id_col)))
        .drop("__old", "__new")
    )
