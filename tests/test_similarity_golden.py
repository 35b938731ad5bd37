"""Golden ER cases from the reference
(`analysis/find-duplicates-authors.R:6-9,199-227`): the fuzzy-match
pipeline must find Armistad↔Armistead Maupin, Gustl Angstmann↔Angstmann
Gustl, and August Graf/von Platen at the reference thresholds
(cosine ≥ 0.5, jaccard ≥ 0.3, lev < 3, meta_sim ≥ 1)."""

from pyspark.sql import functions as F

from remove_na_lgbtiq_queer_knowledge_graph_spark.functions.strings import fingerprint
from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.similarity import (
    candidate_pairs,
    candidate_pairs_lsh,
    meta_ensemble,
)

NAMES = [
    (1, "Armistad Maupin"),
    (2, "Armistead Maupin"),
    (3, "Gustl Angstmann"),
    (4, "Angstmann Gustl"),
    (5, "August Graf Platen"),
    (6, "August von Platen"),
    (7, "Rosa von Praunheim"),
    (8, "Audre Lorde"),
    (9, "Completely Different"),
]


def _names_df(spark):
    return spark.createDataFrame(NAMES, ["id", "name"])


def _pairs(df, metric, min_sim):
    return candidate_pairs(df, "id", "name", metric=metric, min_sim=min_sim)


def test_cosine_finds_golden_pairs(spark):
    got = {
        (r.id_1, r.id_2)
        for r in _pairs(_names_df(spark), "cosine", 0.5).collect()
    }
    assert (1, 2) in got  # Maupin typo
    assert (3, 4) in got  # token swap
    assert (5, 6) in got  # Graf/von
    assert not any(9 in p for p in got)  # decoy stays out


def test_jaccard_finds_golden_pairs(spark):
    got = {
        (r.id_1, r.id_2)
        for r in _pairs(_names_df(spark), "jaccard", 0.3).collect()
    }
    assert (1, 2) in got and (3, 4) in got and (5, 6) in got


def test_meta_ensemble_relevance(spark):
    df = _names_df(spark)
    cos = _pairs(df, "cosine", 0.5).withColumnRenamed("value", "cosine")
    jac = _pairs(df, "jaccard", 0.3).withColumnRenamed("value", "jaccard")
    names = df.select(F.col("id").alias("id_1"), F.col("name").alias("name_1"))
    names2 = df.select(F.col("id").alias("id_2"), F.col("name").alias("name_2"))
    both = cos.join(jac, ["id_1", "id_2"]).join(names, "id_1").join(names2, "id_2")
    scored = meta_ensemble(both)
    relevant = {
        (r.id_1, r.id_2): r.meta_sim
        for r in scored.filter(F.col("meta_sim") >= 1).collect()
    }
    # The Maupin typo pair has lev=1 → 2/lev dominates; must be relevant.
    assert (1, 2) in relevant
    assert relevant[(1, 2)] > 2.0


def test_token_swap_same_fingerprint(spark):
    df = _names_df(spark).withColumn("fp", fingerprint(F.col("name")))
    fps = {r.id: r.fp for r in df.collect()}
    assert fps[3] == fps[4]  # Gustl Angstmann ↔ Angstmann Gustl
    assert fps[1] != fps[2]  # typo changes the fingerprint (not a swap)


def test_lsh_agrees_with_exact_jaccard(spark):
    """The approximate path must recover the exact pairs at a loose
    threshold (LSH recall on tiny data with 8 tables is ~1)."""
    df = _names_df(spark)
    exact = {
        (r.id_1, r.id_2) for r in _pairs(df, "jaccard", 0.4).collect()
    }
    approx = {
        (r.id_1, r.id_2)
        for r in candidate_pairs_lsh(df, "id", "name", min_sim=0.4).collect()
    }
    assert exact <= approx
