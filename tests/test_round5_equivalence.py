"""Equivalence tests locking in the round-5 plan optimizations.

Each optimization claims bit-identical results to the formulation it
replaced; these tests pin that claim against independent reference
computations on randomized (fixed-seed) data, so a future refactor
can't silently trade correctness for the speed.
"""

import random

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# fixedpoint_sums vs the DECIMAL(18,6)-style reference
# ---------------------------------------------------------------------------

def test_fixedpoint_sums_matches_quantized_reference(spark):
    """The long-micro partial path must equal a direct exact computation
    of sum(floor(x*1e6+0.5))/1e6 per group, independent of partitioning."""
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.relational import (
        fixedpoint_sums,
    )

    rng = random.Random(7)
    rows = [
        (rng.choice("abcd"), rng.uniform(0, 1e5), rng.uniform(-50, 50))
        for _ in range(5000)
    ]
    df = spark.createDataFrame(rows, ["k", "x", "y"]).repartition(7)
    got = {
        r["k"]: (r["sx"], r["sy"], r["n"])
        for r in fixedpoint_sums(
            df, ["k"],
            [(F.col("x"), "sx"), (F.col("x") * F.col("y"), "sy")],
            count_alias="n",
        ).collect()
    }

    import math

    ref: dict[str, list] = {}
    for k, x, y in rows:
        acc = ref.setdefault(k, [0, 0, 0])
        acc[0] += math.floor(x * 1_000_000.0 + 0.5)
        acc[1] += math.floor((x * y) * 1_000_000.0 + 0.5)
        acc[2] += 1
    for k, (mx, my, n) in ref.items():
        assert got[k][0] == float(mx) / 1_000_000.0, k
        assert got[k][1] == float(my) / 1_000_000.0, k
        assert got[k][2] == n, k


def test_fixedpoint_sums_partition_invariance(spark):
    """Same data, different partition counts → bit-identical sums (the
    determinism contract the decimal path guaranteed)."""
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.relational import (
        fixedpoint_sums,
    )

    rng = random.Random(13)
    rows = [("g", rng.uniform(0, 1e4)) for _ in range(4000)]
    outs = []
    for parts in (1, 3, 16):
        df = spark.createDataFrame(rows, ["k", "x"]).repartition(parts)
        r = fixedpoint_sums(df, ["k"], [(F.col("x"), "s")]).collect()[0]
        outs.append(r["s"])
    assert outs[0] == outs[1] == outs[2]


# ---------------------------------------------------------------------------
# pandas-UDF cosine vs the Catalyst higher-order-function fold
# ---------------------------------------------------------------------------

def _hof_cosine(a, b):
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.ann import dot, norm

    return F.round(dot(a, b) / (norm(a) * norm(b)), 6)


def test_pandas_cosine_bit_equal_to_hof_fold(spark):
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.ann import cosine

    rng = random.Random(3)
    rows = [
        (
            i,
            [rng.uniform(-1, 1) for _ in range(64)],
            [rng.uniform(-1, 1) for _ in range(64)],
        )
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, ["i", "a", "b"])
    both = df.select(
        "i",
        cosine(F.col("a"), F.col("b")).alias("np_cos"),
        _hof_cosine(F.col("a"), F.col("b")).alias("hof_cos"),
    ).collect()
    for r in both:
        assert r["np_cos"] == r["hof_cos"], r["i"]


def test_pandas_cosine_ragged_fallback(spark):
    """Mixed-length vectors in one batch take the per-row fold path and
    still match the expression fold."""
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.ann import cosine

    rng = random.Random(5)
    rows = []
    for i in range(60):
        d = 8 if i % 2 == 0 else 16
        rows.append(
            (i, [rng.uniform(-1, 1) for _ in range(d)],
             [rng.uniform(-1, 1) for _ in range(d)])
        )
    df = spark.createDataFrame(rows, ["i", "a", "b"]).coalesce(1)
    both = df.select(
        "i",
        cosine(F.col("a"), F.col("b")).alias("np_cos"),
        _hof_cosine(F.col("a"), F.col("b")).alias("hof_cos"),
    ).collect()
    for r in both:
        assert r["np_cos"] == r["hof_cos"], r["i"]


# ---------------------------------------------------------------------------
# MinHash-LSH duplicate collapse vs direct id-level banding
# ---------------------------------------------------------------------------

def _id_level_lsh(df, id_col, text_col, *, min_sim, num_hashes, band_size):
    """The pre-collapse formulation: banding and refine per id."""
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.similarity import (
        band_candidates,
        char_ngrams,
        minhash_signature_grams,
    )
    from remove_na_lgbtiq_queer_knowledge_graph_spark.spec import materialize

    gset = materialize(
        df.select(
            F.col(id_col).alias("id"),
            F.explode(char_ngrams(F.col(text_col), 2)).alias("gram"),
        ).distinct()
    )
    sig = minhash_signature_grams(gset, num_hashes)
    cand = band_candidates(sig, num_hashes, band_size)
    cards = gset.groupBy("id").agg(F.count("*").alias("card"))
    g1 = gset.select(F.col("id").alias("id_1"), "gram")
    g2 = gset.select(F.col("id").alias("id_2"), "gram")
    inter = (
        cand.join(g1, "id_1").join(g2, ["id_2", "gram"])
        .groupBy("id_1", "id_2").agg(F.count("*").alias("inter"))
    )
    c1 = cards.select(F.col("id").alias("id_1"), F.col("card").alias("card_1"))
    c2 = cards.select(F.col("id").alias("id_2"), F.col("card").alias("card_2"))
    value = F.round(
        F.col("inter") / (F.col("card_1") + F.col("card_2") - F.col("inter")), 6
    )
    return (
        inter.join(c1, "id_1").join(c2, "id_2")
        .withColumn("value", value)
        .filter(F.col("value") >= min_sim)
        .select("id_1", "id_2", "value")
    )


def test_lsh_collapse_equals_id_level_banding(spark):
    """Heavy duplication + near-misses: the class-collapsed pipeline must
    emit exactly the id-level pipeline's pairs (same ids, same values)."""
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.similarity import (
        candidate_pairs_minhash,
    )

    rng = random.Random(11)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    rows = []
    for i in range(120):
        base = " ".join(rng.sample(vocab, 3))
        if rng.random() < 0.3:  # perturb: near-duplicate, not exact
            base += rng.choice(["x", "yz", "q"])
        rows.append((i, base))
    df = spark.createDataFrame(rows, ["pid", "name"])

    got = {
        (r["id_1"], r["id_2"]): r["value"]
        for r in candidate_pairs_minhash(
            df, "pid", "name", min_sim=0.4, num_hashes=12, band_size=3
        ).collect()
    }
    ref = {
        (r["id_1"], r["id_2"]): r["value"]
        for r in _id_level_lsh(
            df, "pid", "name", min_sim=0.4, num_hashes=12, band_size=3
        ).collect()
    }
    assert got == ref


# ---------------------------------------------------------------------------
# CC pointer jumping on a deep chain
# ---------------------------------------------------------------------------

def test_cc_pointer_jump_deep_chain(spark):
    """A 200-node path graph (diameter 199) must fully converge to the
    min label — pointer jumping makes this O(log d) rounds, and the
    Σ-label convergence test must not exit early."""
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.er import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(199)] + [(500, 501)], ["src", "dst"]
    )
    out = {r["node"]: r["comp"] for r in connected_components(edges).collect()}
    assert all(out[i] == 0 for i in range(200))
    assert out[500] == 500 and out[501] == 500
