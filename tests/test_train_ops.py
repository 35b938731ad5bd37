"""Unit tests for the training-tier ops (queries_llm3): BPE merge
training vs an independent pure-Python reference, the logistic-GD
trainer's determinism and learning, and SemDeDup's keep-rule
invariants vs a brute-force check."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# --- independent reference BPE (dict-of-tuples, no string tricks) ---------


def _ref_bpe(word_counts: dict[str, int], n_merges: int):
    """Textbook BPE (Sennrich et al. 2016): symbol tuples, greedy
    left-to-right merge, ties on (count desc, pair asc).  Shares no
    code or representation with operators/bpe.py."""
    vocab = {tuple(w) + ("</w>",): c for w, c in word_counts.items()}
    merges = []
    for step in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                counts[syms[i], syms[i + 1]] = (
                    counts.get((syms[i], syms[i + 1]), 0) + c
                )
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), c = best
        merges.append((step, l, r, l + r, c))
        new_vocab: dict[tuple, int] = {}
        for syms, cnt in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + cnt
        vocab = new_vocab
    return vocab, merges


WORDS = {
    "lower": 8, "low": 7, "newest": 6, "widest": 3,
    "new": 5, "aaa": 4, "abab": 4, "banana": 2,
}


def test_bpe_fit_matches_reference(spark):
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.bpe import bpe_fit

    words = spark.createDataFrame(
        list(WORDS.items()), "word string, cnt long")
    final, merges = bpe_fit(words, 6)
    _, ref_merges = _ref_bpe(WORDS, 6)
    assert merges == ref_merges
    # final symbol table must equal the reference vocabulary
    got = {
        tuple(r["s"].split(" ")): r["cnt"] for r in final.collect()
    }
    ref_vocab, _ = _ref_bpe(WORDS, 6)
    assert got == ref_vocab


def test_bpe_apply_merge_overlap_and_boundaries(spark):
    """The delimiter-doubling replace must be exactly greedy
    left-to-right: shared-separator runs merge like textbook BPE and
    symbol substrings never false-match."""
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.bpe import apply_merge

    ab_cases = [
        ("a b a b", "ab ab"),      # consecutive matches share a space
        ("xa b", "xa b"),          # 'a b' inside symbol 'xa' must not match
        ("a b c", "ab c"),
        ("c a b", "c ab"),
        ("a b", "ab"),
    ]
    aa_cases = [
        ("a a a", "aa a"),         # greedy non-overlapping on a run
        ("a a a a", "aa aa"),
        ("a a", "aa"),
    ]
    for lsym, rsym, cases in [("a", "b", ab_cases), ("a", "a", aa_cases)]:
        df = spark.createDataFrame(
            [(f"w{i}", s, 1) for i, (s, _) in enumerate(cases)],
            "word string, s string, cnt long")
        got = [r["s"] for r in apply_merge(df, lsym, rsym).collect()]
        assert got == [want for _, want in cases], (lsym, rsym)


def test_bpe_fit_exhaustion_raises(spark):
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.bpe import bpe_fit

    words = spark.createDataFrame([("ab", 1)], "word string, cnt long")
    # "a b </w>" admits exactly 2 merges before it is one symbol
    with pytest.raises(ValueError, match="vocabulary exhausted"):
        bpe_fit(words, 5)


def test_round_half_away_matches_duckdb():
    import random

    import duckdb

    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.linear import (
        round_half_away,
    )

    rng = random.Random(11)
    vals = [rng.uniform(-3, 3) for _ in range(5000)] + [0.5e-12, -0.5e-12]
    con = duckdb.connect()
    got = [
        r[0] for r in con.execute(
            "SELECT round(x, 12) FROM (SELECT unnest(?) AS x)", [vals]
        ).fetchall()
    ]
    assert got == [round_half_away(v, 12) for v in vals]


def test_logreg_learns_and_is_partition_invariant(spark):
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.linear import (
        logreg_train_rounds,
    )

    # separable-ish: y = 1 when x1 > 0.5 (plus a distractor feature)
    rows = [
        (1 if i % 7 > 3 else 0, (i % 7) / 7.0, ((i * 13) % 10) / 10.0)
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "y int, x1 double, x2 double")
    out1, w1 = logreg_train_rounds(df.repartition(1), ["x1", "x2"], steps=4)
    out32, w32 = logreg_train_rounds(
        df.repartition(32), ["x1", "x2"], steps=4)
    # decimal-sum discipline: bit-identical across partitionings
    assert out1 == out32 and w1 == w32
    # GD on a separable feature must beat the all-zero model
    assert out1[-1][2] > out1[0][2]


def test_semantic_keep_invariants(spark, sf_dir):
    """Brute-force check of the keep rule on the test-SF embeddings:
    dropped ⇔ a lower-id cell-mate with rounded cosine ≥ τ exists, and
    the witness is the smallest such id."""
    import os

    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.ann import (
        _round_half_away,
        _seq_cosine,
    )
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.dedup import (
        semantic_keep,
    )

    import numpy as np

    vecs = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    out = semantic_keep(vecs, min_sim=0.3, n_centroids=8, iters=2,
                        sample_mod=2)
    rows = {r["vec_id"]: r for r in out.collect()}
    raw = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in vecs.collect()
    }
    assert set(rows) == set(raw)
    by_cell: dict[int, list[int]] = {}
    for vid, r in rows.items():
        by_cell.setdefault(r["cell"], []).append(vid)
    for cell, ids in by_cell.items():
        ids.sort()
        A = np.array([raw[i] for i in ids], dtype="float64")
        cos = _round_half_away(_seq_cosine(A, A), 6)
        for bi, vid in enumerate(ids):
            wits = [
                ids[ai] for ai in range(bi) if cos[ai, bi] >= 0.3
            ]
            r = rows[vid]
            if wits:
                assert not r["kept"] and r["witness"] == min(wits)
                ai = ids.index(r["witness"])
                assert r["witness_cos"] == pytest.approx(
                    cos[ai, bi], abs=1e-12)
            else:
                assert r["kept"] and r["witness"] is None


def test_bpe_fit_matches_reference_property(spark):
    """Property form of the reference-equivalence test: random tiny-
    alphabet vocabularies maximize tie-breaks, overlapping runs
    ("aaa"), and shared-separator merges ("abab") — the cases where a
    wrong replace strategy diverges from textbook BPE.  Spark examples
    are expensive, so the example count stays small; the fixed-seed
    derandomized run is deterministic in CI."""
    from hypothesis import HealthCheck, given, settings, strategies as st

    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.bpe import bpe_fit

    words_strategy = st.dictionaries(
        st.text(alphabet="ab", min_size=1, max_size=5),
        st.integers(min_value=1, max_value=9),
        min_size=2, max_size=8,
    )

    @settings(max_examples=12, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(words_strategy)
    def check(word_counts):
        n_merges = 4
        ref_vocab, ref_merges = _ref_bpe(word_counts, n_merges)
        df = spark.createDataFrame(
            list(word_counts.items()), "word string, cnt long")
        if len(ref_merges) < n_merges:
            with pytest.raises(ValueError, match="vocabulary exhausted"):
                bpe_fit(df, n_merges)
            return
        final, merges = bpe_fit(df, n_merges)
        assert merges == ref_merges
        got = {tuple(r["s"].split(" ")): r["cnt"] for r in final.collect()}
        assert got == ref_vocab

    check()


def test_semantic_keep_exact_prepass_equivalence(spark):
    """Round-9 (verdict item 2): the exact-duplicate collapse must be
    a pure optimization — on a duplication-heavy fixture with planted
    exact classes, singletons, AND all-zero vectors (NULL cosine → no
    collapse, everything kept), exact_prepass=True and False produce
    identical row sets."""
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.dedup import (
        semantic_keep,
    )

    rows = []
    # three exact classes around distinct directions + noise singletons
    base = {0: [1.0, 0.0, 0.0], 1: [0.0, 1.0, 0.0], 2: [0.7, 0.7, 0.1]}
    vid = 0
    for b in range(3):
        for _ in range(5):  # 5 identical copies each
            rows.append((vid, base[b]))
            vid += 1
    for i in range(6):  # singletons, some similar to the classes
        rows.append((vid, [1.0, 0.1 * i, 0.2]))
        vid += 1
    for _ in range(3):  # zero vectors: cosine NULL, never dropped
        rows.append((vid, [0.0, 0.0, 0.0]))
        vid += 1
    vecs = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")
    kw = dict(min_sim=0.3, n_centroids=2, iters=2, sample_mod=2)
    fast = sorted(map(tuple, semantic_keep(
        vecs, exact_prepass=True, **kw).collect()))
    slow = sorted(map(tuple, semantic_keep(
        vecs, exact_prepass=False, **kw).collect()))
    assert fast == slow
    # sanity: zero vectors all kept, non-rep class members all dropped
    out = {r[0]: r for r in fast}
    assert all(out[v][2] for v in range(vid - 3, vid))
    for b in range(3):
        ids = list(range(5 * b, 5 * b + 5))
        for m in ids[1:]:
            assert not out[m][2]          # collapsed members dropped
            assert out[m][3] < m          # with a lower-id witness
            assert out[m][4] is not None


def test_semantic_keep_pair_guard(spark, sf_dir):
    """max_cell_pairs: under the bound → identical output; over →
    ValueError naming the hot cells, before any pair join runs."""
    import os

    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.dedup import (
        semantic_keep,
    )

    vecs = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    ok = semantic_keep(vecs, min_sim=0.3, n_centroids=8, iters=2,
                       sample_mod=2, max_cell_pairs=10 ** 9).collect()
    assert len(ok) == vecs.count()
    with pytest.raises(ValueError, match="max_cell_pairs"):
        semantic_keep(vecs, min_sim=0.3, n_centroids=8, iters=2,
                      sample_mod=2, max_cell_pairs=10)


def test_nb_model_is_a_proper_distribution(spark, sf_dir):
    """Laplace smoothing over the full vocabulary must make each
    lang's word distribution sum to EXACTLY 1 (Σ_w (c_lw+1) = c_l+V),
    and every observed pair must out-probability the smoothing floor."""
    import math

    from remove_na_lgbtiq_queer_knowledge_graph_spark.queries_llm3 import (
        _nb_model,
    )

    _, _, model = _nb_model(spark, sf_dir)
    rows = model.groupBy("lang").agg(
        F.sum(F.exp("logp")).alias("mass"),
        F.min("logp").alias("floor_lp"),
        F.max(F.when(F.col("c_lw") == 0, F.col("logp"))).alias("smooth_lp"),
    ).collect()
    assert rows
    for r in rows:
        assert math.isclose(r.mass, 1.0, abs_tol=1e-6), r
        # the smoothing floor is the minimum log-prob in the lang
        assert r.smooth_lp is None or r.floor_lp == r.smooth_lp


def test_nb_score_covers_docs_and_stays_in_lang_set(spark, sf_dir):
    from remove_na_lgbtiq_queer_knowledge_graph_spark.queries_llm3 import (
        nb_lang_score,
    )
    from remove_na_lgbtiq_queer_knowledge_graph_spark.spec import t

    out = nb_lang_score(spark, sf_dir)
    docs = t(spark, sf_dir, "documents")
    langs = {r.lang for r in docs.select("lang").distinct().collect()}
    rows = out.collect()
    # one prediction per doc with ≥1 word; predictions from the corpus
    # lang set; log-posteriors strictly negative
    assert len(rows) == len({r.doc_id for r in rows})
    assert {r.pred_lang for r in rows} <= langs
    assert all(r.score < 0 for r in rows)


def test_novelty_score_brute_force(spark, sf_dir):
    """Independent pandas recomputation of the 3-shingle novelty on
    the test SF — different code path (python dicts), same regex."""
    import collections
    import re

    from remove_na_lgbtiq_queer_knowledge_graph_spark.queries_llm3 import (
        text_novelty_score,
    )
    from remove_na_lgbtiq_queer_knowledge_graph_spark.spec import t

    docs = t(spark, sf_dir, "documents").select("doc_id", "text").collect()
    sh = {}
    for r in docs:
        ws = [w for w in re.sub(r"[^a-zA-Z ]", " ", r.text).split(" ") if w]
        if len(ws) >= 3:
            sh[r.doc_id] = {" ".join(ws[j:j + 3])
                            for j in range(len(ws) - 2)}
    df = collections.Counter(s for v in sh.values() for s in v)
    got = {r.doc_id: (r.n_shingles, r.n_novel, r.novelty)
           for r in text_novelty_score(spark, sf_dir).collect()}
    assert set(got) == set(sh)
    for d, shs in sh.items():
        novel = sum(1 for s in shs if df[s] == 1)
        assert got[d][0] == len(shs) and got[d][1] == novel
        # novelty is reported 6-dp-rounded
        assert abs(got[d][2] - novel / len(shs)) <= 5e-7


def test_round_half_away_col_matches_duckdb_at_repr_boundary(spark):
    """Round-9 fuzz regression: doubles whose exact binary value sits
    just below a decimal midpoint but whose SHORTEST REPR is the
    midpoint (F.round rounds the repr UP; DuckDB rounds the binary
    value DOWN).  The JVM float-scaled form must match DuckDB on the
    caught value and on a seeded adversarial batch."""
    import random

    import duckdb

    from remove_na_lgbtiq_queer_knowledge_graph_spark.functions.numeric import (
        round_half_away_col,
    )

    vals = [(13.0 + 1.1195624999999998) + 2.2789879999999996]  # the catch
    rng = random.Random(99)
    for _ in range(500):
        if rng.random() < 0.5:
            vals.append((rng.randint(-10**9, 10**9) * 10 + 5) / 1e7)
        else:
            vals.append(sum(rng.randint(-10**10, 10**10) / 1e9
                            for _ in range(rng.randint(2, 4))))
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [r.y for r in df.select(
        round_half_away_col(F.col("x"), 6).alias("y")).collect()]
    duck = [r[0] for r in duckdb.connect().execute(
        "SELECT round(x, 6) FROM (SELECT unnest($1) AS x)", [vals]
    ).fetchall()]
    assert got == duck
    assert got[0] == 16.398550  # F.round would give 16.398551


def test_stream_nb_classify_equals_batch(spark, sf_dir):
    """Streaming the corpus through the trained NB model must produce
    EXACTLY the batch classification (same rows, same scores)."""
    from remove_na_lgbtiq_queer_knowledge_graph_spark.queries_llm3 import (
        nb_lang_score,
        stream_nb_classify,
    )

    batch = {(r.doc_id, r.pred_lang, r.score)
             for r in nb_lang_score(spark, sf_dir).collect()}
    streamed = {(r.doc_id, r.pred_lang, r.score)
                for r in stream_nb_classify(spark, sf_dir).collect()}
    assert streamed == batch and len(batch) > 0
