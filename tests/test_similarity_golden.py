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


def test_candidate_pairs_null_block_and_duplicate_ids(spark):
    """Round-13 review (both verified live before the fix): (a) two
    NULL-block rows with identical text fabricated a similarity-1.0
    pair although a NULL block matches NO row; (b) an id with two name
    variants fabricated a SELF-pair through least/greatest, and
    duplicated input rows duplicated pair rows."""
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.similarity import (
        candidate_pairs,
    )

    df = spark.createDataFrame(
        [(1, "abcd", None), (2, "abcd", None), (3, "abce", None)],
        "id long, txt string, blk string")
    got = candidate_pairs(df, "id", "txt", min_sim=0.1,
                          block_cols=["blk"]).collect()
    assert got == []

    df2 = spark.createDataFrame(
        [(7, "abcdef", "B"), (7, "abcdeg", "B"),
         (1, "zzzz", "B"), (1, "zzzz", "B"), (2, "zzzz", "B")],
        "id long, txt string, blk string")
    rows = sorted((r.id_1, r.id_2, r.value) for r in candidate_pairs(
        df2, "id", "txt", min_sim=0.1, block_cols=["blk"]).collect())
    assert all(a < b for a, b, _ in rows)          # no self-pairs
    assert len(rows) == len(set(rows))             # no duplicate rows
    assert (1, 2, 1.0) in rows


def test_candidate_pairs_validates_before_work(spark):
    import pytest

    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.similarity import (
        candidate_pairs,
    )

    df = spark.createDataFrame([(1, "ab")], "id long, txt string")
    with pytest.raises(ValueError, match="unknown metric"):
        candidate_pairs(df, "id", "txt", metric="cosinee")
    with pytest.raises(ValueError, match="min_cosine"):
        candidate_pairs(df, "id", "txt", metric="both", min_sim=0.5)


def test_single_metric_best_pair_hash_aggregates(spark):
    """r13 optimization: the single-metric best-variant-pair agg is a
    plain ``max(value)`` (lexicographic struct max of one field), so
    the final aggregation stays HASH-based — ``max(struct(...))``
    planned a SortAggregate with a per-partition sort on both sides of
    the exchange.  Pins BOTH the plan shape and the best-variant
    semantics (an id pairing the same partner through variants scoring
    1.0 and <1.0 must keep the 1.0)."""
    df = spark.createDataFrame(
        [(1, "abcdef", "B"), (1, "abcdeg", "B"), (2, "abcdef", "B")],
        "id long, txt string, blk string")
    out = candidate_pairs(df, "id", "txt", min_sim=0.1, block_cols=["blk"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortAggregate" not in plan
    rows = {(r.id_1, r.id_2): r.value for r in out.collect()}
    assert rows[(1, 2)] == 1.0
    # metric='both' keeps the struct max (two fields must travel from
    # the SAME variant pair) — semantics unchanged there
    both = candidate_pairs(df, "id", "txt", min_sim=(0.1, 0.1),
                           metric="both", block_cols=["blk"])
    brows = {(r.id_1, r.id_2): (r.cosine, r.jaccard) for r in both.collect()}
    assert brows[(1, 2)] == (1.0, 1.0)
