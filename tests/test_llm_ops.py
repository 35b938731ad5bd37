"""Dedup / ANN / text / multimodal operator tests (scale-extension ops)."""

import pytest
from pyspark.sql import functions as F

from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.ann import (
    brute_force_topk,
    bucketed_topk,
    cosine_dup_pairs,
)
from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.dedup import (
    exact_dup_groups,
    jaccard_pairs,
    minhash_band_pairs,
    minhash_signature,
    shingles,
    simhash,
    simhash_pairs,
)
from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.multimodal import (
    decode_metadata,
    to_binary_payload,
)
from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.text import lang_id, pii_mask

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2, "the quick brown fox jumps over the lazy dog near the river bank now"),
    (3, "completely different content about spark engines and shuffle partitions"),
    (4, "the quick brown fox jumps over the lazy dog near the river bank today"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_exact_dup_groups(spark):
    got = exact_dup_groups(_docs(spark), "doc_id", "text").collect()
    assert len(got) == 1 and got[0].n == 2 and got[0].keep_id == 1  # 1 & 4


def test_minhash_catches_near_dup(spark):
    sh = shingles(_docs(spark), "doc_id", "text", 3)
    pairs = {
        (r.id_1, r.id_2)
        for r in minhash_band_pairs(minhash_signature(sh)).collect()
    }
    assert (1, 2) in pairs and (1, 4) in pairs
    assert not any(3 in p for p in pairs)


def test_jaccard_pairs_threshold(spark):
    sh = shingles(_docs(spark), "doc_id", "text", 3)
    pairs = {(r.id_1, r.id_2): r.jaccard for r in jaccard_pairs(sh, 0.5).collect()}
    assert pairs[(1, 4)] == 1.0
    assert 0.5 <= pairs[(1, 2)] < 1.0
    assert (1, 3) not in pairs


def test_simhash_identical_docs_equal(spark):
    sh = shingles(_docs(spark), "doc_id", "text", 3)
    sigs = {r.id: r.simhash for r in simhash(sh).collect()}
    assert sigs[1] == sigs[4]
    hamming_12 = sum(a != b for a, b in zip(sigs[1], sigs[2]))
    hamming_13 = sum(a != b for a, b in zip(sigs[1], sigs[3]))
    assert hamming_12 < hamming_13  # near-dup closer than unrelated


def test_pii_mask_replaces_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "contact me at jo.doe+x@mail.example.org or on the phone"),
            (2, "see https://example.org/a?b=1 and http://x.io twice"),
            (3, "mail inside url https://example.org/u/a@b.co stays one URL"),
            (4, "nothing sensitive here"),
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in pii_mask(df, "doc_id", "text").collect()}
    assert got[1].masked_text == "contact me at <EMAIL> or on the phone"
    assert (got[1].n_email, got[1].n_url) == (1, 0)
    assert got[2].masked_text == "see <URL> and <URL> twice"
    assert got[2].n_url == 2
    # email is masked first, then the whole URL collapses to one token
    assert got[3].masked_text == "mail inside url <URL> stays one URL"
    assert got[4].masked_text == "nothing sensitive here"
    assert (got[4].n_email, got[4].n_url) == (0, 0)


def test_simhash_pairs_banding_recall(spark):
    """Banded join must find EVERY pair within max_dist (pigeonhole) —
    compare against brute-force hamming over all signature pairs."""
    sh = shingles(_docs(spark), "doc_id", "text", 3)
    sig = simhash(sh, 16)
    got = {
        (r.id_1, r.id_2): r.hamming
        for r in simhash_pairs(sig, 16, max_dist=3).collect()
    }
    sigs = {r.id: r.simhash for r in sig.collect()}
    ids = sorted(sigs)
    want = {
        (i, j): sum(a != b for a, b in zip(sigs[i], sigs[j]))
        for i in ids
        for j in ids
        if i < j and sum(a != b for a, b in zip(sigs[i], sigs[j])) <= 3
    }
    assert got == want
    assert got[(1, 4)] == 0  # identical docs


VECS = [
    (0, [1.0, 0.0, 0.0, 0.0], 0),
    (1, [0.99, 0.1, 0.0, 0.0], 0),
    (2, [0.0, 1.0, 0.0, 0.0], 1),
    (3, [-1.0, 0.0, 0.0, 0.0], 1),
]


def _vecs(spark):
    return spark.createDataFrame(VECS, ["vec_id", "embedding", "label"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )


def test_brute_topk_order_and_exclusion(spark):
    emb = _vecs(spark)
    got = brute_force_topk(emb, emb.filter(F.col("vec_id") == 0), k=3).collect()
    ranked = [r.cand_id for r in sorted(got, key=lambda r: r.rk)]
    assert ranked == [1, 2, 3]  # nearest→farthest, self excluded
    assert all(r.query_id == 0 for r in got)


def test_bucketed_topk_subset_of_brute(spark):
    emb = _vecs(spark)
    q = emb.filter(F.col("vec_id") == 0)
    brute = {(r.query_id, r.cand_id): r.cos_sim for r in brute_force_topk(emb, q, k=4).collect()}
    bucketed = bucketed_topk(emb, q, k=4, n_bits=2).collect()
    # the same-bucket survivors MUST be present — an operator returning
    # zero rows would pass every loop/all() below vacuously
    assert {r.cand_id for r in bucketed} == {1, 2}
    for r in bucketed:
        assert brute[(r.query_id, r.cand_id)] == r.cos_sim  # same scores
    # vec 3 has opposite sign bucket → pruned by LSH
    assert all(r.cand_id != 3 for r in bucketed)


def test_cosine_dup_pairs_blocked(spark):
    pairs = cosine_dup_pairs(_vecs(spark), 0.9, block_col="label").collect()
    assert {(r.id_1, r.id_2) for r in pairs} == {(0, 1)}


def test_lang_id_heuristic(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the dog of a house"),
         (2, "der hund und die katze ist hier"),
         (3, "xyzzy plugh")],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r.predicted_lang for r in lang_id(df, "text").collect()}
    assert got == {1: "en", 2: "de", 3: "unknown"}


def test_multimodal_decode_schema_and_determinism(spark):
    df = spark.createDataFrame([(1, "abcd"), (2, "abcde")], ["doc_id", "text"])
    out = decode_metadata(to_binary_payload(df, "doc_id", "text"))
    assert out.schema.simpleString() == (
        "struct<doc_id:bigint,n_bytes:bigint,width:bigint,height:bigint,fmt:string>"
    )
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[1].n_bytes == 4 and rows[1].fmt == "png"
    assert rows[2].n_bytes == 5 and rows[2].fmt == "jpeg"


def test_sketch_distinct_error_bounds(spark, sf_dir):
    """The sketch query's in-plan error contract: exact counts match an
    independent aggregation and every per-group sketch (HLL distinct,
    approx median) landed within the 10% envelope the query asserts.
    The raw HLL value is additionally bounded here against its published
    rsd so the boolean can't silently degrade to a looser check."""
    from remove_na_lgbtiq_queer_knowledge_graph_spark.queries_linking import (
        agg_sketch_distinct,
    )
    from remove_na_lgbtiq_queer_knowledge_graph_spark.spec import t
    from pyspark.sql import functions as F

    got = {r.event_type: r for r in agg_sketch_distinct(spark, sf_dir).collect()}
    e = t(spark, sf_dir, "events")
    exact = {
        r.event_type: r.u
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("u"))
        .collect()
    }
    assert set(got) == set(exact)
    raw = {
        r.event_type: r.h
        for r in e.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id").alias("h"))
        .collect()
    }
    for et, row in got.items():
        assert row.n_users == exact[et]
        # median claim is the RANK guarantee now (round-13 review: a
        # value-10% claim was unfounded for sparse/bimodal groups)
        assert row.hll_within_10pct and row.median_rank_ok
        assert abs(raw[et] - exact[et]) <= max(3, 0.1 * exact[et])


def test_ann_variants_recall_vs_brute(spark, sf_dir):
    """Quantify the recall/cost trade: IVF(16 cells, 4 probes) and the
    8-bit sign-LSH both retrieve a reasonable share of the exact top-3;
    IVF with 4/16 probing should clearly beat random cell assignment."""
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators import ann as ann_ops
    from remove_na_lgbtiq_queer_knowledge_graph_spark.spec import t
    from pyspark.sql import functions as F

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)

    def topsets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r.query_id, set()).add(r.cand_id)
        return out

    exact = topsets(ann_ops.brute_force_topk(emb, queries, k=3))
    ivf = topsets(ann_ops.ivf_topk(emb, queries, k=3, n_centroids=16, n_probe=4))
    # n_bits must track corpus size: 2^bits ≪ n or buckets go
    # singleton and recall collapses — 4 bits for this tiny fixture
    lsh = topsets(ann_ops.bucketed_topk(emb, queries, k=3, n_bits=4))

    def recall(approx):
        hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
        return hits / sum(len(v) for v in exact.values())

    kcents = ann_ops.kmeans_centroids(emb, n_centroids=16, iters=2)
    ivf_km = topsets(ann_ops.ivf_topk(emb, queries, k=3, n_probe=4,
                                      centroids=kcents))

    r_ivf, r_lsh, r_km = recall(ivf), recall(lsh), recall(ivf_km)
    # floors chosen loosely: these are smoke floors for the plumbing,
    # not quality guarantees — the dials are n_probe / n_bits
    assert r_ivf >= 0.3, r_ivf
    assert r_lsh >= 0.05, r_lsh
    # fitted cells should not be materially worse than the arbitrary
    # lowest-id quantizer on the same probe budget
    assert r_km >= r_ivf - 0.15, (r_km, r_ivf)


def test_kmeans_centroids_deterministic_and_partitioned(spark, sf_dir):
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators import ann as ann_ops
    from remove_na_lgbtiq_queer_knowledge_graph_spark.spec import t

    emb = t(spark, sf_dir, "embeddings")
    a = ann_ops.kmeans_cells(emb, n_centroids=4, iters=2).collect()
    b = ann_ops.kmeans_cells(emb.repartition(7), n_centroids=4,
                             iters=2).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert sum(r.n_members for r in a if r.dim == 0) == emb.count()


def test_model_ner_injection_seam(spark):
    """A 'real model' (any batches→batches function) drops into the
    model_ner seam with no plan change — the swap VERDICT r1 flagged as
    needing a dependency-injection test."""
    import pandas as pd

    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.ner import (
        model_ner,
    )

    docs = spark.createDataFrame(
        [(1, "ACME hired Jo"), (2, "nothing here")], "doc_id long, text string")

    def fake_model(batches):
        for pdf in batches:
            rows = [(d, w, "ORG") for d, t in zip(pdf["doc_id"], pdf["text"])
                    for w in str(t).split() if w.isupper()]
            yield pd.DataFrame(rows, columns=["doc_id", "entity", "label"])

    out = {tuple(r) for r in model_ner(docs, "doc_id", "text",
                                       infer_fn=fake_model).collect()}
    assert out == {(1, "ACME", "ORG")}


def test_model_ner_seam_runs_trained_weights(spark, tmp_path, sf_dir):
    """End-to-end proof the mapInPandas seam takes a REAL model: a
    multinomial naive-Bayes token classifier is trained here (numpy,
    hashed char-trigram features), its weights serialized to disk, and
    the infer_fn loads the artifact once per worker and runs vectorized
    inference over the documents table.  Spark output must equal the
    same model applied driver-side.  (torch/transformers don't ship in
    this container; an HF pipeline differs only in the load + forward
    lines inside infer_fn — the artifact-load/batch/emit plumbing
    proven here is identical.)"""
    import numpy as np

    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.ner import (
        model_ner,
    )

    DIM, CLASSES = 64, ["TOOL", "ROLE", "O"]
    train = {
        "TOOL": ["spark", "flink", "duckdb", "kafka", "presto", "trino"],
        "ROLE": ["customer", "supplier", "clerk", "manager", "analyst"],
        "O": ["the", "quick", "brown", "fox", "jumps", "over", "lazy",
              "dogs", "and", "cats", "run", "fast", "data", "window"],
    }

    def featurize(tok):
        import zlib
        v = np.zeros(DIM)
        s = f"^{tok}$"
        for i in range(len(s) - 2):
            v[zlib.crc32(s[i:i + 3].encode()) % DIM] += 1
        return v

    # multinomial NB: W[f,c] = log P(f|c) (Laplace), b[c] = log P(c)
    counts = np.ones((DIM, len(CLASSES)))
    priors = np.zeros(len(CLASSES))
    for ci, cls in enumerate(CLASSES):
        for tok in train[cls]:
            counts[:, ci] += featurize(tok)
            priors[ci] += 1
    W = np.log(counts / counts.sum(axis=0))
    b = np.log(priors / priors.sum())
    path = str(tmp_path / "nb_ner.npz")
    np.savez(path, W=W, b=b, classes=np.array(CLASSES))

    def make_infer(model_path):
        def infer(batches):
            import zlib

            import numpy as np
            import pandas as pd

            art = np.load(model_path)      # once per worker-partition
            W, b = art["W"], art["b"]
            classes = [c for c in art["classes"]]
            dim = W.shape[0]

            def feat(tok):
                v = np.zeros(dim)
                s = f"^{tok}$"
                for i in range(len(s) - 2):
                    v[zlib.crc32(s[i:i + 3].encode()) % dim] += 1
                return v

            for pdf in batches:
                rows = []
                for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                    for tok in str(text).split():
                        cls = classes[int(np.argmax(feat(tok) @ W + b))]
                        if cls != "O":
                            rows.append((doc_id, tok, cls))
                yield pd.DataFrame(rows,
                                   columns=["doc_id", "entity", "label"])
        return infer

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text").limit(60)
    got = {tuple(r) for r in model_ner(
        docs, "doc_id", "text", infer_fn=make_infer(path)).collect()}

    want = set()
    for r in docs.collect():
        for tok in str(r.text).split():
            cls = CLASSES[int(np.argmax(featurize(tok) @ W + b))]
            if cls != "O":
                want.add((r.doc_id, tok, cls))
    assert got == want and len(got) > 0


def test_multimodal_decode_injection_seam(spark):
    """A custom decoder with its own schema drops into decode_metadata."""
    import pandas as pd

    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.multimodal import (
        decode_metadata,
        to_binary_payload,
    )

    docs = spark.createDataFrame([(7, "abc")], "doc_id long, text string")
    payloads = to_binary_payload(docs, "doc_id", "text")

    def fake_decoder(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "mime": ["image/fake"] * len(pdf),
                "n": pdf["payload"].map(len),
            })

    rows = decode_metadata(
        payloads, decode_fn=fake_decoder,
        schema="doc_id long, mime string, n long").collect()
    assert [tuple(r) for r in rows] == [(7, "image/fake", 3)]


def test_remove_frequent_ngrams_cuts_shared_spans(spark):
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.dedup import (
        remove_frequent_ngrams)

    rows = [
        (1, "common header line one alpha unique tail for doc one"),
        (2, "common header line one alpha second document body text here"),
        (3, "common header line one alpha third doc remainder words go"),
        (4, "entirely distinct content with no shared five gram span"),
        (5, "tiny doc"),  # shorter than n — must survive untouched
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in remove_frequent_ngrams(
        df, "doc_id", "text", n=5, min_doc_freq=3).collect()}
    # the shared 5-gram "common header line one alpha" (and the 5-grams
    # it overlaps) appears in docs 1-3 → those words are removed there
    assert got[1]["clean_text"] == "unique tail for doc one"
    assert got[2]["clean_text"] == "second document body text here"
    assert got[3]["clean_text"] == "third doc remainder words go"
    assert got[4]["clean_text"] == rows[3][1]
    assert got[5]["clean_text"] == "tiny doc"
    assert got[5]["n_words_before"] == 2 and got[5]["n_words_after"] == 2
    assert got[1]["n_words_before"] == 10 and got[1]["n_words_after"] == 5


def test_remove_frequent_ngrams_plan_no_cartesian(spark):
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.dedup import (
        remove_frequent_ngrams)

    df = spark.createDataFrame([(1, "a b c d e f")], ["doc_id", "text"])
    plan = remove_frequent_ngrams(df, "doc_id", "text")._jdf \
        .queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "Exchange SinglePartition" not in plan


def test_grouped_running_sum_matches_window(spark):
    """Two-pass per-group running sum == the window formulation,
    regardless of input partitioning."""
    from pyspark.sql import Window
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.relational import (
        grouped_running_sum)

    rows = [(g, i, (i * 7 + ord(g)) % 5 + 1) for g in ("a", "b", "c")
            for i in range(40)]
    df = spark.createDataFrame(rows, ["g", "i", "v"]).repartition(9)
    got = {(r.g, r.i): r.run for r in grouped_running_sum(
        df, ["g"], ["i"], "v", out="run").collect()}
    w = Window.partitionBy("g").orderBy("i") \
        .rowsBetween(Window.unboundedPreceding, 0)
    import pyspark.sql.functions as F
    want = {(r.g, r.i): r.run for r in df.withColumn(
        "run", F.sum("v").over(w)).collect()}
    assert got == want


def test_grouped_running_sum_many_groups_falls_back_to_window(spark):
    """High-cardinality groups: the (partition × group) driver metadata
    would explode, so the op must take the window plan — asserted via
    the physical plan (Window node, no mapInPandas Arrow pass) — and
    still produce the right sums."""
    import pyspark.sql.functions as F
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.relational import (
        grouped_running_sum)

    rows = [(g, i, 1) for g in range(400) for i in range(3)]
    df = spark.createDataFrame(rows, ["g", "i", "v"])
    out = grouped_running_sum(df, ["g"], ["i"], "v", out="run",
                              num_partitions=8, max_meta_rows=100)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan and "MapInPandas" not in plan
    got = {(r.g, r.i): r.run for r in out.collect()}
    assert got[(7, 0)] == 1 and got[(7, 2)] == 3
    # ... and the two-pass path stays available when forced
    forced = grouped_running_sum(df, ["g"], ["i"], "v", out="run",
                                 num_partitions=8, max_meta_rows=None)
    assert {(r.g, r.i): r.run for r in forced.collect()} == got


def test_bloom_prefilter_superset_of_exact(spark, sf_dir):
    """The Bloom pre-pass must flag every doc the exact n-gram overlap
    join finds (no false negatives — only false positives allowed)."""
    from remove_na_lgbtiq_queer_knowledge_graph_spark.queries_llm2 import (
        decon_bloom_prefilter,
        decon_ngram_overlap,
    )

    exact = {r.doc_id for r in decon_ngram_overlap(spark, sf_dir)
             .select("doc_id").distinct().collect()}
    bloom = {r.doc_id for r in decon_bloom_prefilter(spark, sf_dir).collect()}
    assert exact <= bloom


def test_wav_real_codec_round_trip(spark):
    """The REAL WAV path: encode genuine RIFF/WAVE bytes, decode with
    the stdlib parser, and match the analytically-known metadata."""
    import io
    import wave

    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.multimodal import (
        decode_wav_real,
        encode_wav_square,
        wav_payload_builder,
    )

    # driver-side sanity: the bytes really are a WAV file
    raw = encode_wav_square(3, 1280, 2000)
    with wave.open(io.BytesIO(raw), "rb") as w:
        assert (w.getframerate(), w.getnchannels(), w.getnframes()) == (8000, 1, 1280)

    ids = spark.createDataFrame([(i,) for i in range(25)], ["doc_id"])
    payloads = ids.mapInPandas(
        wav_payload_builder, schema="doc_id bigint, payload binary")
    out = {
        r["doc_id"]: r
        for r in payloads.mapInPandas(
            decode_wav_real,
            schema="doc_id bigint, sample_rate bigint, n_channels bigint, "
                   "n_samples bigint, duration_ms double, rms double",
        ).collect()
    }
    for d in range(25):
        r = out[d]
        assert r["sample_rate"] == 8000 and r["n_channels"] == 1
        assert r["n_samples"] == 800 + (d % 10) * 160
        # even-length ±A square wave: RMS is exactly A
        assert r["rms"] == float(1000 + (d % 5) * 500)


def test_ppm_real_codec_round_trip_and_corrupt(spark):
    import pandas as pd
    import pytest as _pytest

    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.multimodal import (
        decode_ppm_real,
        encode_ppm_gradient,
        ppm_payload_builder,
    )

    raw = encode_ppm_gradient(7, 5, 4)
    assert raw.startswith(b"P6\n5 4\n255\n")
    assert len(raw) == len(b"P6\n5 4\n255\n") + 5 * 4 * 3

    ids = spark.createDataFrame([(i,) for i in range(20)], ["doc_id"])
    payloads = ids.mapInPandas(
        ppm_payload_builder, schema="doc_id bigint, payload binary")
    out = {
        r["doc_id"]: r
        for r in payloads.mapInPandas(
            decode_ppm_real,
            schema="doc_id bigint, width bigint, height bigint, "
                   "maxval bigint, mean_px double",
        ).collect()
    }
    for d in range(20):
        w, h = 16 + d % 16, 12 + d % 8
        r = out[d]
        assert (r["width"], r["height"], r["maxval"]) == (w, h, 255)
        exact = sum((i + j + d) % 256 for i in range(h) for j in range(w))
        assert r["mean_px"] == round(3 * exact / (3 * w * h), 6)

    # corrupt payloads fail loudly, like a real decoder
    def batches():
        yield pd.DataFrame({"doc_id": [1], "payload": [b"JFIF not a ppm"]})

    with _pytest.raises(ValueError, match="netpbm"):
        list(decode_ppm_real(batches()))

    def truncated():
        yield pd.DataFrame({"doc_id": [1], "payload": [raw[:-10]]})

    with _pytest.raises(ValueError, match="truncated"):
        list(decode_ppm_real(truncated()))


def test_netpbm_header_comments_and_truncation():
    """The shared header parser (round 11): '#' comment lines are
    legal netpbm header content and skipped; truncated or malformed
    headers raise ValueError — never IndexError."""
    import pytest as _pytest

    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.multimodal import (
        _parse_netpbm_header,
    )

    raw = b"P6\n# made with tool\n5 4\n# another note\n255\n" + bytes(60)
    assert _parse_netpbm_header(raw)[:4] == (b"P6", 5, 4, 255)
    for bad in (b"P6", b"P6\n5", b"P6\n5 4\n", b"P6\n5 4\n255",
                b"P6\n# only a comment"):
        with _pytest.raises(ValueError):
            _parse_netpbm_header(bad)
    with _pytest.raises(ValueError, match="netpbm"):
        _parse_netpbm_header(b"JFIF whatever")


def test_mm_phash_cluster_keep_planted_twins(spark, sf_dir):
    """The planted near-dup family must actually merge: every ODD doc
    (the +40-bump twin) surrenders to a smaller keeper, and the bit
    flips genuinely cross band boundaries for some pair (so the merge
    exercises the multi-band pigeonhole path, not just one band)."""
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators import (
        multimodal as mm_ops,
    )
    from remove_na_lgbtiq_queer_knowledge_graph_spark.queries_llm import (
        mm_phash_cluster_keep_q,
    )

    out = {r.doc_id: r.keep_doc
           for r in mm_phash_cluster_keep_q(spark, sf_dir).collect()}
    assert out, "empty result"
    assert all(keep < d for d, keep in out.items() if d % 2 == 1), \
        "an odd twin failed to merge with its smaller near-duplicate"
    assert any(keep == d for d, keep in out.items() if d % 2 == 0)

    # band-boundary crossing: some twin pair differs in >= 2 bands
    ids = spark.createDataFrame([(i,) for i in range(40)], ["doc_id"])
    payloads = ids.mapInPandas(
        mm_ops.ppm_near_dup_payload_builder,
        schema="doc_id bigint, payload binary")
    hashes = {r.doc_id: r.dhash for r in payloads.mapInPandas(
        mm_ops.dhash_ppm, schema=mm_ops.DHASH_SCHEMA).collect()}
    crossing = 0
    for d in range(1, 40, 2):
        a, b = hashes[d - 1], hashes[d]
        flipped_bands = {i // 8 for i in range(64) if a[i] != b[i]}
        assert 1 <= len([i for i in range(64) if a[i] != b[i]]) <= 6
        if len(flipped_bands) >= 2:
            crossing += 1
    assert crossing >= 1


def test_brute_topk_rounded_tie_at_k_boundary(spark):
    """The mapInPandas scorer prunes per BATCH on (rounded cos DESC,
    cand_id ASC); the global rank must agree even when candidates from
    DIFFERENT partitions tie at 6 decimals on the k boundary — the case
    that breaks if pruning happened on unrounded scores.  Candidates 1
    and 2 are both exactly cos=1 with the query (same direction, scaled)
    and sit in different partitions; k=1 must keep cand_id=1."""
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [2.0, 0.0], 0),   # cos(q,·)=1, lower id → global rank 1
        (2, [3.0, 0.0], 0),   # cos(q,·)=1, higher id → pruned
        (3, [0.0, 1.0], 0),   # orthogonal
    ]
    emb = (
        spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
        .withColumn("embedding", F.col("embedding").cast("array<float>"))
        .repartition(4, "vec_id")  # spread ties across partitions
    )
    q = emb.filter(F.col("vec_id") == 0)
    got = brute_force_topk(emb, q, k=1).collect()
    assert len(got) == 1
    assert (got[0].cand_id, got[0].rk, got[0].cos_sim) == (1, 1, 1.0)


def test_kmeans_degenerate_cell_drops_out(spark):
    """A centroid that attracts no members disappears (k shrinks)
    instead of producing NaN coordinates — the Lloyd's degeneracy rule
    the driver-side fit must preserve."""
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators import ann as ann_ops

    # ids 0,1 seed the two initial centroids with the SAME direction —
    # every vector ties between them and the tie breaks to the lower
    # cent_id, so cell 1 empties on the first iteration
    rows = [
        (0, [1.0, 0.0]),
        (1, [2.0, 0.0]),
        (2, [1.0, 0.001]),
        (3, [1.0, 0.002]),
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>"))
    cells = ann_ops.kmeans_cells(emb, n_centroids=2, iters=2).collect()
    assert {r.cell for r in cells} == {0}  # cell 1 dropped, k shrank
    assert all(r.coord == r.coord for r in cells)  # no NaN survives
    assert sum(r.n_members for r in cells if r.dim == 0) == 4


def test_jaccard_prefix_filter_matches_direct_join(spark):
    """PPJoin prefix filtering is an exactness-preserving candidate
    generator: identical (id_1, id_2, jaccard) sets as the
    inverted-index self-join, including under a planted hot gram that
    every document shares (the case the prefix filter exists for —
    hot grams sort last in the df-order and fall out of every
    prefix)."""
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.dedup import (
        jaccard_pairs_direct,
        jaccard_pairs_prefix,
        shingles,
    )

    hot = "the end of every document is the same boilerplate sentence"
    docs = spark.createDataFrame(
        [(i, f"{t} {hot}") for i, (_, t) in enumerate(DOCS)]
        + [(99, "an unrelated document about completely different things "
                + hot)],
        ["doc_id", "text"],
    )
    sh = shingles(docs, "doc_id", "text", 3)
    for t_ in (0.5, 0.8):
        a = {tuple(r) for r in jaccard_pairs_direct(sh, t_).collect()}
        b = {tuple(r) for r in jaccard_pairs_prefix(sh, t_).collect()}
        assert a == b, (t_, a ^ b)
    assert a  # non-vacuous: the hot boilerplate creates real pairs


def test_jaccard_prefix_equivalence_property(spark):
    """Property check of the prefix-filter lemma over random corpora
    with a tiny vocabulary (maximally hot grams, heavy ties in the
    global df-order): for random documents and thresholds, the PPJoin
    candidate generator yields exactly the direct join's pairs."""
    import random

    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.dedup import (
        jaccard_pairs_direct,
        jaccard_pairs_prefix,
        shingles,
    )

    rng = random.Random(20260814)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon"]
    for trial in range(4):
        docs = spark.createDataFrame(
            [(i, " ".join(rng.choice(vocab)
                          for _ in range(rng.randint(3, 12))))
             for i in range(14)],
            ["doc_id", "text"],
        )
        sh = shingles(docs, "doc_id", "text", 2)
        t_ = [0.3, 0.5, 0.8, 0.9][trial]
        a = {tuple(r) for r in jaccard_pairs_direct(sh, t_).collect()}
        b = {tuple(r) for r in jaccard_pairs_prefix(sh, t_).collect()}
        assert a == b, (trial, t_, a ^ b)


def test_driver_union_find_matches_star_cc_property(spark):
    """The gated driver union-find and the distributed large-star/
    small-star algorithm agree on random graphs (self-loops, isolated
    pairs, chains, multi-edges)."""
    import random

    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.er import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(99)
    for trial in range(3):
        n = 30
        edges = [(rng.randint(0, n), rng.randint(0, n))
                 for _ in range(rng.randint(5, 40))]
        df = spark.createDataFrame(edges, ["src", "dst"])
        uf = {(r.node, r.comp)
              for r in connected_components(df).collect()}  # driver path
        star = {(r.node, r.comp)
                for r in connected_components_star(df).collect()}
        assert uf == star, (trial, uf ^ star)


def test_jaccard_prefix_boundary_card_multiple_of_five(spark):
    """Regression: float (1-0.8)*10 = 1.9999... floored one short shrank
    the prefix and silently dropped an exact-boundary pair.  Doc y's 8
    shingles are a subset of doc x's 10 → jaccard exactly 0.8; x's two
    non-shared grams have df=1 so the rarest-first order fills a
    too-short prefix with them, and only the epsilon-corrected length
    keeps the pair."""
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.dedup import (
        jaccard_pairs_direct,
        jaccard_pairs_prefix,
    )

    shared = [f"s{i}" for i in range(8)]
    rows = [(1, g) for g in shared + ["only-x-1", "only-x-2"]] + \
           [(2, g) for g in shared]
    sh = spark.createDataFrame(rows, ["id", "shingle"])
    direct = {tuple(r) for r in jaccard_pairs_direct(sh, 0.8).collect()}
    pref = {tuple(r) for r in jaccard_pairs_prefix(sh, 0.8).collect()}
    assert direct == {(1, 2, 0.8)}
    assert pref == direct


def test_jaccard_pairs_default_plan_is_prefix(spark):
    """Round-6 contract: the operator's default routes through PPJoin
    prefix filtering (hot-gram-immune), the direct inverted-index join
    is opt-in, and an unknown plan name fails loudly."""
    import pytest

    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.dedup import (
        jaccard_pairs,
        shingles,
    )

    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    sh = shingles(docs, "doc_id", "text", 3)
    default = {tuple(r) for r in jaccard_pairs(sh, 0.5).collect()}
    direct = {tuple(r) for r in jaccard_pairs(sh, 0.5, plan="direct").collect()}
    assert default == direct and default
    # the default plan's candidate join must touch only prefix grams —
    # lock it structurally: the prefix path verifies by gram-array
    # intersection (array_intersect), which the direct inverted-index
    # join never does; the slice/array_sort prefix build itself hides
    # behind the materialize() lineage cut
    plan = jaccard_pairs(sh, 0.5)._jdf.queryExecution().optimizedPlan().toString()
    assert "array_intersect" in plan.lower()
    direct_plan = jaccard_pairs(sh, 0.5, plan="direct") \
        ._jdf.queryExecution().optimizedPlan().toString()
    assert "array_intersect" not in direct_plan.lower()
    with pytest.raises(ValueError, match="plan"):
        jaccard_pairs(sh, 0.5, plan="banded")


def test_ivf_topk_preserves_string_centroid_ids(spark):
    """Regression (round-6 advice): the matrix-scored path cast centroid
    ids through int(), so a caller-supplied centroid frame with string
    ids raised.  Ids must keep their native type end to end — the
    assignment/probe argmax is index-based and maps back."""
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators import ann as ann_ops

    emb = spark.createDataFrame(
        [(i, [float(i % 3 == 0), float(i % 3 == 1), float(i % 3 == 2)])
         for i in range(9)],
        ["vec_id", "embedding"],
    )
    cents = spark.createDataFrame(
        [("axis-x", [1.0, 0.0, 0.0]), ("axis-y", [0.0, 1.0, 0.0]),
         ("axis-z", [0.0, 0.0, 1.0])],
        ["cent_id", "cent_v"],
    )
    out = ann_ops.ivf_topk(emb, emb.limit(2), k=2, n_probe=2,
                           centroids=cents)
    rows = out.collect()
    assert rows, "string-centroid path must produce candidates"
    assert all(isinstance(r.rk, int) for r in rows)
    # the actual contract: candidates come from the right CELLS, which
    # requires the string ids to survive assignment + probe mapback —
    # queries 0 (x-axis) and 1 (y-axis) must each rank their own-cell
    # corpus vectors first
    got = {(r.query_id, r.rk): r.cand_id for r in rows}
    assert got[(0, 1)] in (3, 6)   # other multiples of 3 = x-cell
    assert got[(1, 1)] in (4, 7)   # 1 mod 3 = y-cell


def test_brute_force_topk_collects_query_side_only(spark, monkeypatch):
    """Size-contract lock: brute_force_topk may collect ONLY the query
    set (broadcast-build-side budget); the corpus must stream through
    mapInPandas uncollected."""
    from pyspark.sql.classic.dataframe import DataFrame

    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators import ann as ann_ops

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(20)], ["vec_id", "embedding"])
    collected = []
    orig = DataFrame.collect

    def spy(self):
        collected.append(tuple(self.columns))
        return orig(self)

    monkeypatch.setattr(DataFrame, "collect", spy)
    ann_ops.brute_force_topk(emb, emb.limit(3), k=2).count()
    assert collected == [("i", "v")], collected


def test_overlap_spans_exact_boundaries(spark):
    """overlap_spans reports exact maximal spans: a planted 10-token
    shared run with k=4 anchors merges to one span with the right
    start positions and length; a doc repeating the phrase twice
    yields two diagonals; no span crosses a mismatch."""
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.dedup import (
        overlap_spans,
    )

    shared = "one two three four five six seven eight nine ten"
    docs = spark.createDataFrame(
        [(1, f"aa bb {shared} cc dd"),
         (2, f"xx {shared} yy zz ww"),
         # doc 3 contains the shared run TWICE -> two diagonals vs doc 1
         (3, f"{shared} qq {shared}"),
         (4, "totally different words with no anchor overlap here")],
        ["doc_id", "text"],
    )
    rows = overlap_spans(docs, "doc_id", "text", k=4).collect()
    got = {(r.id_1, r.id_2, r.start_1, r.start_2, r.length) for r in rows}
    # doc1 tokens: aa bb one...ten cc dd -> shared starts at 2, len 10
    # doc2 tokens: xx one...ten yy zz ww -> starts at 1
    assert (1, 2, 2, 1, 10) in got
    # doc3: run at 0 and at 11 -> two spans vs doc1's single run
    assert (1, 3, 2, 0, 10) in got and (1, 3, 2, 11, 10) in got
    # doc2 vs doc3 similarly two spans
    assert (2, 3, 1, 0, 10) in got and (2, 3, 1, 11, 10) in got
    assert not any(4 in (a, b) for (a, b, *_) in got)
    # min_len filters; max_df=1 kills every anchor (each 4-gram of the
    # shared run appears in 3 docs)
    assert overlap_spans(docs, "doc_id", "text", k=4, min_len=11).count() == 0
    assert overlap_spans(docs, "doc_id", "text", k=4, max_df=1).count() == 0


def test_overlap_spans_matches_brute_force_property(spark):
    """Property check over random tiny-vocabulary corpora (maximal
    repetition pressure): overlap_spans == a brute-force O(n²·L²)
    reference that extends every matching diagonal maximally."""
    import random

    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.dedup import (
        norm_tokens,  # noqa: F401 — same tokenizer contract
        overlap_spans,
    )

    rng = random.Random(20260814)
    vocab = ["a", "b", "c"]
    k = 3
    for trial in range(3):
        docs = [(i, " ".join(rng.choice(vocab)
                             for _ in range(rng.randint(k, 14))))
                for i in range(6)]
        toks = {i: t.split() for i, t in docs}

        def brute():
            out = set()
            for i, ti in toks.items():
                for j, tj in toks.items():
                    if i >= j:
                        continue
                    for d in range(-(len(tj) - k), len(ti) - k + 1):
                        # maximal runs along diagonal d (pos_i - pos_j = d)
                        run = 0
                        start = None
                        lo = max(0, d)
                        hi = min(len(ti), len(tj) + d)
                        for p in range(lo, hi + 1):
                            ok = p < hi and ti[p] == tj[p - d]
                            if ok:
                                if start is None:
                                    start = p
                                run += 1
                            else:
                                if run >= k:
                                    out.add((i, j, start, start - d, run))
                                run, start = 0, None
                    # note: runs shorter than k produce no anchors
            return out

        df = spark.createDataFrame(docs, ["doc_id", "text"])
        got = {(r.id_1, r.id_2, r.start_1, r.start_2, r.length)
               for r in overlap_spans(df, "doc_id", "text", k=k).collect()}
        assert got == brute(), (trial, got ^ brute())


def test_excise_overlap_spans_keep_first(spark):
    """Keep-first excision: the higher-id doc loses each shared span,
    the lower-id doc keeps its copy verbatim, untouched docs pass
    through with n_cut_tokens = 0, and a fully-duplicated doc excises
    to empty text (not NULL)."""
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.dedup import (
        excise_overlap_spans,
    )

    shared = "one two three four five six seven eight nine ten"
    docs = spark.createDataFrame(
        [(1, f"aa bb {shared} cc dd"),
         (2, f"xx {shared} yy"),
         (3, shared),  # exactly the shared run -> excised to empty
         (4, "no overlap with anything else at all")],
        ["doc_id", "text"],
    )
    got = {r.id: r for r in excise_overlap_spans(
        docs, "doc_id", "text", k=4).collect()}
    assert got[1].text == f"aa bb {shared} cc dd" and got[1].n_cut_tokens == 0
    assert got[2].text == "xx yy" and got[2].n_cut_tokens == 10
    assert got[3].text == "" and got[3].n_cut_tokens == 10
    assert got[4].text == "no overlap with anything else at all"
    assert got[4].n_cut_tokens == 0


def test_excise_preserves_case_matches_case_insensitively(spark):
    """Excision must not lowercase the corpus (round-6 review finding):
    detection matches case-INsensitively (like the rest of the dedup
    stack) but the rebuilt text keeps original casing — including in
    documents that lose no span at all."""
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.dedup import (
        excise_overlap_spans,
    )

    shared = "One Two Three Four Five Six Seven Eight Nine Ten"
    docs = spark.createDataFrame(
        [(1, f"Aa Bb {shared} Cc"),
         (2, f"Xx {shared.upper()} Yy"),  # case-variant copy still matches
         (3, "Untouched Doc With Mixed CASE kept Exactly")],
        ["doc_id", "text"],
    )
    got = {r.id: r for r in excise_overlap_spans(
        docs, "doc_id", "text", k=4).collect()}
    assert got[1].text == f"Aa Bb {shared} Cc" and got[1].n_cut_tokens == 0
    assert got[2].text == "Xx Yy" and got[2].n_cut_tokens == 10
    assert got[3].text == "Untouched Doc With Mixed CASE kept Exactly"


def test_overlap_spans_cross_corpus_mode(spark):
    """other= runs train-vs-eval: no id-order filter (an eval doc with
    a HIGHER id still matches), ids stay on their own sides, and
    within-corpus pairs are NOT reported."""
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.dedup import (
        overlap_spans,
    )

    shared = "one two three four five six seven eight"
    train = spark.createDataFrame(
        [(10, f"aa {shared} bb"), (11, f"cc {shared} dd")],
        ["doc_id", "text"])
    ev = spark.createDataFrame(
        [(2, shared), (99, f"zz {shared}")], ["doc_id", "text"])
    got = {(r.id_1, r.id_2, r.start_1, r.start_2, r.length)
           for r in overlap_spans(train, "doc_id", "text", k=4,
                                  other=ev).collect()}
    # every train doc matches both eval docs — including eval id 2 < 10
    # (order-free) and 99 > 11
    assert got == {
        (10, 2, 1, 0, 8), (10, 99, 1, 1, 8),
        (11, 2, 1, 0, 8), (11, 99, 1, 1, 8),
    }
    # within-corpus pair (10, 11) must NOT appear in cross mode
    assert not any(a == 10 and b == 11 for (a, b, *_) in got)


def test_grouped_running_sum_null_values_match_window(spark):
    """NULL values: both regimes must agree with SQL window semantics —
    nulls contribute nothing (no NaN poisoning of later rows) and the
    running value stays NULL until a group's first non-null (round-6
    review finding; includes an all-null leading partition slice)."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.relational import (
        grouped_running_sum)

    rows = []
    for g in ("a", "b"):
        for i in range(30):
            # group a: nulls sprinkled mid-stream; group b: leading
            # nulls across what will be several range partitions
            v = None if (g == "a" and i % 5 == 2) or (g == "b" and i < 12) \
                else float(i + 1)
            rows.append((g, i, v))
    df = spark.createDataFrame(rows, "g string, i long, v double") \
        .repartition(7)
    got = {(r.g, r.i): r.run for r in grouped_running_sum(
        df, ["g"], ["i"], "v", out="run", num_partitions=6,
        max_meta_rows=None).collect()}
    w = Window.partitionBy("g").orderBy("i") \
        .rowsBetween(Window.unboundedPreceding, 0)
    want = {(r.g, r.i): r.run for r in df.withColumn(
        "run", F.sum("v").over(w)).collect()}
    assert got == want
    assert want[("b", 0)] is None and got[("b", 0)] is None  # leading nulls


def test_audio_energy_oracle_matches_on_non_ascii(spark):
    """The audio-energy oracle must expand code points to UTF-8 BYTES
    like the stub's text.encode() — a character-based oracle diverges
    on the first umlaut (round-6 review finding).  Compared directly
    against DuckDB on docs containing 2-, 3- and 4-byte characters."""
    import duckdb

    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.multimodal import (
        audio_energy,
        to_binary_payload,
    )
    from remove_na_lgbtiq_queer_knowledge_graph_spark.queries_llm import (
        _MM_AUDIO_SQL,
    )

    rows = [(1, "plain ascii text here"),
            (2, "umlauts äöü in the middle"),
            (3, "cjk 中文 and emoji \U0001f600 tail")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = sorted(
        (r.doc_id, r.window_idx, r.n_samples, r.rms)
        for r in audio_energy(to_binary_payload(docs, "doc_id", "text"))
        .collect())
    con = duckdb.connect()
    con.sql("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = sorted(tuple(r) for r in con.sql(_MM_AUDIO_SQL).fetchall())
    assert got == want


def _boiler_span_corpus(spark):
    """30 near-dup pairs: docs (2p, 2p+1) share a unique 24-token body
    run; EVERY doc also opens with the same 16-token boilerplate block
    (df = 60 for its anchors), separated from the body by 6 doc-unique
    tokens so the two shared runs stay distinct islands."""
    boiler = " ".join(f"boiler{i}" for i in range(16))
    rows = []
    for p in range(30):
        body = " ".join(f"body{p}w{j}" for j in range(24))
        for side in (0, 1):
            did = 2 * p + side
            uniq = " ".join(f"u{did}x{j}" for j in range(6))
            rows.append((did, f"{boiler} {uniq} {body}"))
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_overlap_spans_max_df_recall_bound(spark):
    """Quantitative pin of the `max_df` docstring claim ("a capped gram
    can only split a reported span, never invent one") — VERDICT r6
    task 3.  On the planted corpus:

    1. CONTAINMENT: every span returned WITH the cut lies inside a span
       returned without it (same pair, same diagonal) — the cut never
       invents or extends.
    2. RARE-MASS RECALL = 1.0: spans all of whose k-gram anchors have
       df <= max_df (the 30 planted 24-token body runs, anchor df = 2)
       come back EXACTLY — same start positions, full 24-token length.
    3. The trade is only ever the hot mass: the dropped spans are
       precisely the boilerplate-block spans (anchor df = 60 > max_df),
       here 1770 of 1800 truth spans = C(60,2) boilerplate pairs.
    """
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.dedup import (
        overlap_spans,
    )

    docs = _boiler_span_corpus(spark)
    truth = overlap_spans(docs, "doc_id", "text", k=8, min_len=12).collect()
    cut = overlap_spans(docs, "doc_id", "text", k=8, min_len=12,
                        max_df=2).collect()

    # 3. the full-space result: 1770 boilerplate spans + 30 body spans
    assert len(truth) == 1800
    assert sum(r.length for r in truth) == 1770 * 16 + 30 * 24

    # 1. containment
    tspans = {}
    for r in truth:
        tspans.setdefault((r.id_1, r.id_2, r.start_1 - r.start_2), []).append(
            (r.start_1, r.start_1 + r.length))
    for r in cut:
        key = (r.id_1, r.id_2, r.start_1 - r.start_2)
        assert any(s <= r.start_1 and r.start_1 + r.length <= e
                   for s, e in tspans.get(key, [])), f"invented span {r}"

    # 2. rare-anchor spans return exactly: recall of rare mass = 1.0
    body_start = 16 + 6  # boiler block + unique separator
    want = {(2 * p, 2 * p + 1, body_start, body_start, 24)
            for p in range(30)}
    got = {(r.id_1, r.id_2, r.start_1, r.start_2, r.length) for r in cut}
    assert got == want


def test_candidate_pairs_max_df_recall_bound(spark):
    """Quantitative pin of the `max_df` postings-cut recall trade in
    `operators/similarity.candidate_pairs` (VERDICT r6 task 3).

    Fixture: 40 random 12-char distinct base names, every name carrying
    the same boilerplate suffix (hot char-2-grams, df ~ 55); 15 planted
    near-dup pairs (one mid-base typo, rare-gram jaccard ~ 0.7).

    Measured bounds pinned here:
    - RECALL of rare-gram near-dups = 1.0: every planted pair survives
      the cut at max_df = 20, 10 and 5 — a pair whose qualifying
      similarity rests on grams with df <= max_df is unaffected.
    - NO INVENTED PAIRS on this fixture: cut results are a subset of
      the full-space truth (a hot gram present in only one side of a
      pair can in general raise jaccard by shrinking the union; with
      boilerplate shared by every doc this cannot happen, and the test
      shape documents exactly when the precision direction is safe).
    - The dropped truth pairs are all boilerplate-driven (qualify at
      min_sim = 0.5 only through suffix mass) — the pairs an ER
      pipeline wants dropped; with the cut the result is exactly the
      15 planted pairs.
    """
    import random

    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.similarity import (
        candidate_pairs,
    )

    rng = random.Random(7)
    suffix = "eingetragener verein berlin"
    names, planted, seen, nid = [], [], set(), 0
    for i in range(40):
        while True:
            base = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz")
                           for _ in range(12))
            if base not in seen:
                seen.add(base)
                break
        names.append((nid, f"{base} {suffix}"))
        a = nid
        nid += 1
        if i < 15:
            typo = base[:6] + rng.choice("abcdefghijklmnopqrstuvwxyz") + base[7:]
            names.append((nid, f"{typo} {suffix}"))
            planted.append((a, nid))
            nid += 1
    ndf = spark.createDataFrame(names, ["eid", "name"])

    def pairs(max_df):
        got = candidate_pairs(ndf, "eid", "name", n=2, min_sim=0.5,
                              metric="jaccard", max_df=max_df)
        return {(r.id_1, r.id_2) for r in got.collect()}

    truth = pairs(None)
    assert set(planted) <= truth
    for m in (20, 10, 5):
        cut = pairs(m)
        assert set(planted) <= cut, f"planted pair lost at max_df={m}"
        assert cut <= truth, f"invented pair at max_df={m}"
        assert cut == set(planted)


def test_png_real_codec_round_trip_and_corrupt(spark):
    """Round-7 REAL PNG codec: spec-conformant bytes (signature, CRCs,
    zlib IDAT, filters cycling through all five types) decode back to
    the exact analytic gradient through the Spark seam; corruption and
    unsupported variants fail loudly like a real decoder."""
    import pandas as pd
    import pytest as _pytest

    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.multimodal import (
        decode_png_real,
        encode_png_gradient,
        png_payload_builder,
    )

    raw = encode_png_gradient(7, 6, 10)  # 10 rows → every filter twice
    assert raw.startswith(b"\x89PNG\r\n\x1a\n")
    assert b"IHDR" in raw and b"IDAT" in raw and raw.endswith(
        b"IEND" + raw[-4:])

    ids = spark.createDataFrame([(i,) for i in range(20)], ["doc_id"])
    payloads = ids.mapInPandas(
        png_payload_builder, schema="doc_id bigint, payload binary")
    out = {
        r["doc_id"]: r
        for r in payloads.mapInPandas(
            decode_png_real,
            schema="doc_id bigint, width bigint, height bigint, "
                   "bit_depth bigint, color_type bigint, mean_px double",
        ).collect()
    }
    for d in range(20):
        w, h = 16 + d % 16, 12 + d % 8
        r = out[d]
        assert (r["width"], r["height"], r["bit_depth"],
                r["color_type"]) == (w, h, 8, 0)
        exact = sum((i + j + d) % 256 for i in range(h) for j in range(w))
        assert r["mean_px"] == round(exact / (w * h), 6)

    def corrupt():
        b = bytearray(raw)
        b[30] ^= 0xFF  # inside IHDR data → CRC must catch it
        yield pd.DataFrame({"doc_id": [1], "payload": [bytes(b)]})

    with _pytest.raises(ValueError, match="CRC"):
        list(decode_png_real(corrupt()))

    def not_png():
        yield pd.DataFrame({"doc_id": [1], "payload": [b"JFIF whatever"]})

    with _pytest.raises(ValueError, match="signature"):
        list(decode_png_real(not_png()))

    # truncation anywhere in the chunk walk must surface as the
    # documented ValueError, never struct.error (round-7 ADVICE):
    # mid-chunk-header, mid-data, and mid-CRC cuts all checked
    for cut in (10, 20, len(raw) - 2):
        def truncated(n=cut):
            yield pd.DataFrame({"doc_id": [1], "payload": [raw[:n]]})

        with _pytest.raises(ValueError, match="truncated chunk"):
            list(decode_png_real(truncated()))


def test_pq_adc_exact_when_codebook_is_lossless(spark):
    """ADC correctness kernel: when every corpus vector IS its own
    sub-centroid (corpus == fit sample == k_sub vectors, iters=0 keeps
    the init codebook), encoding is lossless and the PQ approximate
    dot must equal the exact dot for every pair."""
    import numpy as np
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators import ann as ann_ops

    rng = np.random.RandomState(7)
    X = rng.randn(8, 6).round(3)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(8)],
        "vec_id long, embedding array<float>")
    out = ann_ops.pq_topk(emb, emb, k=7, n_sub=3, k_sub=8, iters=0,
                          sample_mod=1)
    got = {(r.query_id, r.cand_id): r.approx_dot for r in out.collect()}
    assert len(got) == 8 * 7
    Xd = np.array([[np.float64(np.float32(v)) for v in row] for row in X])
    for (q, c), ad in got.items():
        exact = 0.0
        for d in range(6):
            exact += Xd[q, d] * Xd[c, d]
        assert abs(ad - round(exact, 6)) < 1e-9, (q, c, ad, exact)


def test_pq_cluster_precision_on_clustered_data(spark):
    """On well-separated clusters every PQ top-3 candidate must come
    from the QUERY'S cluster — the quantization error (within-cluster
    spread) is small next to the between-cluster margin, so the coarse
    codes rank any same-cluster member above every foreign one.
    (Recall@3 against the exact top-3 is the WRONG metric here: all
    members of a tight cluster encode to the same codes, so ADC ties
    them — PQ's resolution is the cell, not the member.)"""
    import numpy as np
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators import ann as ann_ops

    rng = np.random.RandomState(11)
    centers = rng.randn(4, 16) * 8
    rows = []
    for i in range(160):
        v = centers[i % 4] + rng.randn(16) * 0.2
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = emb.filter("vec_id % 40 = 0")
    pq = ann_ops.pq_topk(emb, queries, k=3, n_sub=4, k_sub=8,
                         iters=2, sample_mod=1).collect()
    assert len(pq) == 4 * 3
    for r in pq:
        assert r.cand_id % 4 == r.query_id % 4, (r.query_id, r.cand_id)


def test_pq_codebooks_deterministic_and_shaped(spark, sf_dir):
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators import ann as ann_ops
    from remove_na_lgbtiq_queer_knowledge_graph_spark.spec import t

    emb = t(spark, sf_dir, "embeddings")
    a = ann_ops.pq_codebooks(emb, n_sub=2, k_sub=8, iters=2,
                             sample_mod=2).collect()
    b = ann_ops.pq_codebooks(emb.repartition(7), n_sub=2, k_sub=8,
                             iters=2, sample_mod=2).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert {r.sub for r in a} == {0, 1}
    assert all(len(r.cent_v) == 32 for r in a)
    assert len(a) <= 16


def test_ivf_pq_equals_pq_when_probing_all_cells(spark):
    """With n_probe == n_centroids the coarse quantizer restricts
    nothing, so IVF-PQ must reproduce pure PQ-ADC exactly — the
    candidate cut is the ONLY thing the IVF side adds."""
    import numpy as np
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators import ann as ann_ops

    rng = np.random.RandomState(3)
    X = rng.randn(60, 8).round(3)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(60)],
        "vec_id long, embedding array<float>")
    queries = emb.filter("vec_id % 20 = 0")
    pq = sorted(map(tuple, ann_ops.pq_topk(
        emb, queries, k=4, n_sub=2, k_sub=4, iters=1,
        sample_mod=1).collect()))
    ivfpq = sorted(map(tuple, ann_ops.ivf_pq_topk(
        emb, queries, k=4, n_centroids=6, n_probe=6, n_sub=2, k_sub=4,
        iters=1, sample_mod=1).collect()))
    assert pq == ivfpq


def test_ivf_pq_cluster_precision(spark):
    """Same separated-cluster property as pure PQ, through the coarse
    restriction: every top-3 candidate comes from the query's cluster
    (the probed cells contain it, and ADC ranks it on top)."""
    import numpy as np
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators import ann as ann_ops

    rng = np.random.RandomState(17)
    centers = rng.randn(4, 16) * 8
    rows = []
    for i in range(160):
        v = centers[i % 4] + rng.randn(16) * 0.2
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = emb.filter("vec_id % 40 = 0")
    out = ann_ops.ivf_pq_topk(emb, queries, k=3, n_centroids=8,
                              n_probe=3, n_sub=4, k_sub=8, iters=2,
                              sample_mod=1).collect()
    assert len(out) == 4 * 3
    for r in out:
        assert r.cand_id % 4 == r.query_id % 4, (r.query_id, r.cand_id)


def test_weighted_sample_favors_heavy_docs(spark, sf_dir):
    """A-ES property: E[key] grows with weight, so over a corpus the
    kept set's mean token count must exceed the corpus mean (weight =
    token count), and the per-source cap holds exactly."""
    from remove_na_lgbtiq_queer_knowledge_graph_spark.registry import all_specs
    from pyspark.sql import functions as F

    out = all_specs()["select_weighted_sample"].fn(spark, sf_dir)
    rows = out.collect()
    per_src = {}
    for r in rows:
        per_src.setdefault(r.source, []).append(r.rk)
    for src, rks in per_src.items():
        assert sorted(rks) == list(range(1, len(rks) + 1)), src
        assert len(rks) <= 20
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus_mean = docs.select(
        F.avg(F.size(F.split("text", " ")))).collect()[0][0]
    sample_mean = sum(r.n_tokens for r in rows) / len(rows)
    assert sample_mean > corpus_mean, (sample_mean, corpus_mean)


def test_kl_divergence_properties(spark, sf_dir):
    """KL ≥ 0 per source (Gibbs), 0 for a single-source corpus (p = q
    identically), and invariant under repartitioning (decimal sums)."""
    from remove_na_lgbtiq_queer_knowledge_graph_spark.queries_llm2 import (
        mix_kl_divergence,
    )
    from remove_na_lgbtiq_queer_knowledge_graph_spark.registry import all_specs

    out = {r.source: r.kl
           for r in all_specs()["mix_kl_divergence"].fn(spark, sf_dir)
           .collect()}
    assert out and all(kl >= 0 for kl in out.values()), out
    one = spark.createDataFrame(
        [(1, "s", "a b b c"), (2, "s", "b c d")],
        "doc_id long, source string, text string")
    import unittest.mock as um
    with um.patch(
            "remove_na_lgbtiq_queer_knowledge_graph_spark.queries_llm2.t",
            lambda spark_, sf_, name: one):
        got = mix_kl_divergence(spark, "ignored").collect()
    assert [(r.source, r.kl) for r in got] == [("s", 0.0)]


def test_ivf_pq_residual_beats_non_residual(spark):
    """The round-9 recall point (verdict item 3): on many separated
    clusters with k_sub ≪ n_clusters, non-residual sub-codebooks must
    spend their 8 cells covering 32 cluster centers while residual
    codebooks only cover the within-cell spread — at the SAME 4×8 code
    budget the residual variant's recall@10 against exact brute force
    is materially higher.  Fixed seed, deterministic operators."""
    import numpy as np
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators import ann as ann_ops

    rng = np.random.RandomState(2)
    K, n, dim = 32, 640, 16
    centers = rng.randn(K, dim) * 8
    X = np.stack([centers[i % K] + rng.randn(dim) * 2.0
                  for i in range(n)]).round(6)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(n)],
        "vec_id long, embedding array<float>")
    queries = emb.filter("vec_id % 16 = 1")

    def topsets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r.query_id, set()).add(r.cand_id)
        return out

    exact = topsets(ann_ops.brute_force_topk(emb, queries, k=10))

    def recall(a):
        return sum(len(exact[q] & a.get(q, set())) for q in exact) \
            / sum(len(v) for v in exact.values())

    kw = dict(k=10, n_centroids=K, n_probe=4, n_sub=4, k_sub=8,
              iters=3, sample_mod=1)
    r_plain = recall(topsets(ann_ops.ivf_pq_topk(emb, queries, **kw)))
    r_resid = recall(topsets(ann_ops.ivf_pq_topk(emb, queries,
                                                 residual=True, **kw)))
    # measured on this fixture: 0.365 vs 0.490 — assert with margin
    assert r_resid >= r_plain + 0.05, (r_plain, r_resid)
    assert r_resid >= 0.45, r_resid


def test_pq_rejects_codebook_vector_width_mismatch(spark):
    """An explicitly-passed codebook narrower than the vectors must
    fail loud, not silently quantize a prefix of every vector."""
    import numpy as np
    import pytest as _pytest
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators import ann as ann_ops

    rng = np.random.RandomState(5)
    X = rng.randn(10, 8).round(3)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(10)],
        "vec_id long, embedding array<float>")
    narrow = emb.withColumn(
        "embedding", F.slice("embedding", 1, 4).cast("array<float>"))
    cb = ann_ops.pq_codebooks(narrow, n_sub=2, k_sub=4, iters=1,
                              sample_mod=1)
    # surfaces as a captured PythonException from the Arrow worker;
    # match on the message, not the wrapper type
    with _pytest.raises(Exception, match="8-dim but the codebooks"):
        ann_ops.pq_topk(emb, emb.limit(1), k=2, codebooks=cb).collect()


def _py_words(text):
    import re

    return [w for w in re.sub(r"[^a-zA-Z ]", " ", text).split(" ") if w]


def test_containment_pairs_brute_force(spark, sf_dir):
    """Exactness of the one-sided prefix filter: the reported pair set
    must EQUAL the all-pairs brute force over python shingle sets
    (any pruning bug shows as a missing pair)."""
    from remove_na_lgbtiq_queer_knowledge_graph_spark.queries_llm import (
        dedup_containment_pairs_q,
    )
    from remove_na_lgbtiq_queer_knowledge_graph_spark.spec import t

    docs = t(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text").collect()
    sh = {}
    for r in docs:
        ws = _py_words(r.text)
        # norm_tokens lower-cases; mirror it
        ws = [w.lower() for w in ws]
        if len(ws) >= 3:
            sh[r.doc_id] = (r.lang,
                            {" ".join(ws[j:j + 3])
                             for j in range(len(ws) - 2)})
    want = {}
    ids = sorted(sh)
    for a in ids:
        for b in ids:
            if a == b or sh[a][0] != sh[b][0]:
                continue
            c = len(sh[a][1] & sh[b][1]) / len(sh[a][1])
            if c >= 0.8:  # unrounded threshold, matching the operator
                want[(a, b)] = round(c, 6)
    got = {(r.id_1, r.id_2): r.containment
           for r in dedup_containment_pairs_q(spark, sf_dir).collect()}
    assert set(got) == set(want)
    for k in got:
        assert abs(got[k] - want[k]) <= 1e-6, k


def test_kn_bigram_score_brute_force(spark, sf_dir):
    """Independent python recomputation of the interpolated KN NLL
    (unrounded intermediates) — the engine's 9-dp term rounding keeps
    it within a tight tolerance."""
    import collections
    import math

    from remove_na_lgbtiq_queer_knowledge_graph_spark.queries_llm3 import (
        lm_kn_bigram_score,
    )
    from remove_na_lgbtiq_queer_knowledge_graph_spark.spec import t

    docs = t(spark, sf_dir, "documents").select("doc_id", "text").collect()
    bgs = {}
    for r in docs:
        ws = _py_words(r.text)
        if len(ws) >= 2:
            bgs[r.doc_id] = list(zip(ws, ws[1:]))
    c12 = collections.Counter(b for v in bgs.values() for b in v)
    c1 = collections.Counter()
    n1f = collections.Counter()
    n1b = collections.Counter()
    for (w1, w2), c in c12.items():
        c1[w1] += c
        n1f[w1] += 1
        n1b[w2] += 1
    nbg = len(c12)
    D = 0.75

    def p(w1, w2):
        return ((c12[w1, w2] - D) / c1[w1]
                + (D * n1f[w1] / c1[w1]) * (n1b[w2] / nbg))

    got = {r.doc_id: (r.n_bigrams, r.avg_nll_kn)
           for r in lm_kn_bigram_score(spark, sf_dir).collect()}
    assert set(got) == set(bgs)
    for d, pairs in bgs.items():
        nll = -sum(math.log(p(w1, w2)) for w1, w2 in pairs) / len(pairs)
        assert got[d][0] == len(pairs)
        assert abs(got[d][1] - nll) <= 1e-5, d
    # probabilities are proper: for a few w1, the clamped sum over the
    # continuation vocabulary is exactly 1
    vocab = set(n1b)
    for w1 in list(c1)[:3]:
        s = sum(max(c12.get((w1, w2), 0) - D, 0.0) / c1[w1]
                + (D * n1f[w1] / c1[w1]) * (n1b[w2] / nbg)
                for w2 in vocab)
        assert abs(s - 1.0) < 1e-9


def test_entropy_score_brute_force(spark, sf_dir):
    import collections
    import math

    from remove_na_lgbtiq_queer_knowledge_graph_spark.queries_llm3 import (
        text_entropy_score,
    )
    from remove_na_lgbtiq_queer_knowledge_graph_spark.spec import t

    docs = t(spark, sf_dir, "documents").select("doc_id", "text").collect()
    got = {r.doc_id: (r.n_tokens, r.entropy)
           for r in text_entropy_score(spark, sf_dir).collect()}
    want_ids = {r.doc_id for r in docs if _py_words(r.text)}
    assert set(got) == want_ids
    for r in docs:
        ws = _py_words(r.text)
        if not ws:
            continue
        n = len(ws)
        h = -sum((c / n) * math.log(c / n)
                 for c in collections.Counter(ws).values())
        assert got[r.doc_id][0] == n
        assert abs(got[r.doc_id][1] - h) <= 1e-5
        assert got[r.doc_id][1] >= 0


def test_ewma_decay_brute_force(spark, sf_dir):
    """Independent python recomputation of the closed-form decayed
    total (unrounded intermediates; whole-second epochs mirror
    unix_timestamp truncation)."""
    import math

    from remove_na_lgbtiq_queer_knowledge_graph_spark.queries_relational import (
        ts_ewma_decay,
    )
    from remove_na_lgbtiq_queer_knowledge_graph_spark.spec import t

    ev = t(spark, sf_dir, "events").select("user_id", "ts", "value").collect()
    by_user = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(
            (int(r.ts.timestamp()), r.value))
    got = {r.user_id: (r.n_events, r.last_epoch, r.decayed_value)
           for r in ts_ewma_decay(spark, sf_dir).collect()}
    assert set(got) == set(by_user)
    for u, rows in by_user.items():
        last = max(e for e, _ in rows)
        dv = sum(v * math.exp(-0.01 * ((last - e) / 3600.0))
                 for e, v in rows)
        assert got[u][0] == len(rows) and got[u][1] == last
        assert abs(got[u][2] - dv) <= 1e-4  # 9-dp terms x |events|


def test_km_b_reduction_excludes_degenerate_member():
    """Round-11 re-fix: the b -> (b mod (P-1)) + 1 reduction must map
    EVERY raw 32-bit b into [1, P-1] — no multiple of P reachable (the
    earlier b|1 odd-forcing still admitted b|1 = P itself, a no-op fix
    caught in review)."""
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.dedup import (
        KM_PRIME,
    )

    edge = [0, 1, KM_PRIME - 2, KM_PRIME - 1, KM_PRIME, KM_PRIME + 1,
            2**32 - 2, 2**32 - 1]
    for raw in edge:
        b = (raw % (KM_PRIME - 1)) + 1
        assert 1 <= b <= KM_PRIME - 1
        assert b % KM_PRIME != 0
    # the old b|1 rule demonstrably failed exactly here:
    assert ((KM_PRIME - 1) | 1) % KM_PRIME == 0


def test_ivf_topk_default_centroids_string_ids(spark):
    """Review fix: the default centroid seeding must work on STRING ids
    (the `id < n_centroids` filter implicit-cast string ids to NULL and
    crashed the scorer on an empty centroid matrix) and on numeric ids
    that don't start at 0 (it silently under-filled the centroid set)."""
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.ann import (
        ivf_topk,
    )

    rows = [(f"v{i:02d}", [float(i % 3 + 1), float((i * 7) % 5 + 1)])
            for i in range(12)]
    v = spark.createDataFrame(rows, "vec_id string, embedding array<float>")
    q = spark.createDataFrame(rows[:2], "vec_id string, embedding array<float>")
    got = ivf_topk(v, q, k=2, n_centroids=4, n_probe=4).collect()
    assert len(got) == 4                       # 2 queries x top-2
    assert all(r.query_id != r.cand_id for r in got)

    # offset dense ids: seeding takes the 4 LOWEST ids, not ids < 4
    rows2 = [(1000 + i, [float(i % 3 + 1), float((i * 7) % 5 + 1)])
             for i in range(12)]
    v2 = spark.createDataFrame(rows2, "vec_id long, embedding array<float>")
    q2 = spark.createDataFrame(rows2[:1], "vec_id long, embedding array<float>")
    got2 = ivf_topk(v2, q2, k=2, n_centroids=4, n_probe=4).collect()
    assert len(got2) == 2


def test_kmeans_centroids_empty_sample_raises(spark):
    import pytest

    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.ann import (
        kmeans_centroids,
    )

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="empty fit sample"):
        kmeans_centroids(empty, n_centroids=4)


def test_prefix_windows_are_block_scoped(spark):
    """Review fix: an id whose shingle rows appear under TWO block
    values must get a per-block prefix — id-only windows interleaved
    blocks in the rarest-first ranking and could starve one block's
    prefix, dropping a qualifying pair that the direct plan reports."""
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.dedup import (
        jaccard_pairs,
    )

    rows = []
    # block B: ids 1 and 2 share 9 of 10 shingles (J = 9/11 ≈ 0.818)
    for i in range(9):
        rows += [(1, "B", f"s{i}"), (2, "B", f"s{i}")]
    rows += [(1, "B", "only1"), (2, "B", "only2")]
    # block A: id 1 carries 10 RARER shingles (df=1 each) — in an
    # id-global ranking these hog the prefix ranks
    for i in range(10):
        rows.append((1, "A", f"a{i}"))
    sh = spark.createDataFrame(rows, "id long, blk string, shingle string")
    for plan in ("prefix", "direct"):
        got = {(r.id_1, r.id_2)
               for r in jaccard_pairs(sh, min_sim=0.8, block_col="blk",
                                      plan=plan).collect()}
        assert got == {(1, 2)}, plan


def test_semantic_keep_zero_vectors_ride_through(spark):
    """Review fix: cosine of a zero vector is NaN, and Spark orders NaN
    above every double — the bare >= used to COLLAPSE zero-vector
    classes and match zero vectors to everything.  They must ride
    through kept, like the oracle's NULL-fails-the-filter."""
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.dedup import (
        semantic_keep,
    )

    rows = [
        (1, [1.0, 0.0], 0),
        (2, [0.0, 0.0], 0),     # zero vector
        (3, [0.0, 0.0], 0),     # exact-duplicate zero vector
    ]
    v = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = {r.vec_id: r for r in semantic_keep(
        v, n_centroids=1, min_sim=0.3).collect()}
    assert got[1].kept
    # zero vectors neither collapse onto each other nor match id 1
    assert got[2].kept and got[3].kept
    assert got[2].witness is None and got[3].witness is None


def test_minhash_bands_guards_divisibility(spark):
    import pytest

    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.dedup import (
        minhash_bands,
        minhash_signature,
        shingles,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d e f")], ["doc_id", "text"])
    sig = minhash_signature(shingles(docs, "doc_id", "text", 2), 12)
    with pytest.raises(ValueError, match="not divisible"):
        minhash_bands(sig, num_hashes=12, band_size=5)


def test_whitespace_class_portable_across_engines(spark):
    """Review fix: Java \\s includes vertical tab, RE2 \\s does not —
    tokenization now uses the explicit class [ \\t\\n\\x0b\\f\\r]+ on
    BOTH engines, so a \\x0b document tokenizes identically."""
    import duckdb

    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.dedup import (
        norm_tokens,
    )

    txt = "foo\x0bbar  baz\tqux"
    df = spark.createDataFrame([(1, txt)], "doc_id long, text string")
    spark_toks = df.select(norm_tokens(F.col("text")).alias("w")) \
        .collect()[0].w
    duck_toks = duckdb.connect().execute(
        "SELECT string_split(trim(regexp_replace(lower(?), "
        "'[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')), ' ')", [txt]).fetchone()[0]
    assert spark_toks == duck_toks == ["foo", "bar", "baz", "qux"]


def test_real_decoders_fail_loud_on_malformed_payloads(spark):
    """Round-13 review: spec-legal-but-unsupported payloads must raise
    ValueError, never silently decode garbage or escape with
    struct/zlib/ZeroDivision errors — (a) netpbm maxval > 255 (2-byte
    samples would frombuffer(uint8) to nonsense), (b) zero dims,
    (c) non-16-bit WAV, (d) PNG with a wrong-length-but-CRC-valid IHDR,
    (e) PNG with no IDAT."""
    import io
    import struct
    import wave
    import zlib

    import numpy as np
    import pandas as pd
    import pytest

    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators import (
        multimodal as mm,
    )

    def run(fn, payload):
        pdf = pd.DataFrame({"doc_id": [1], "payload": [payload]})
        return list(fn(iter([pdf])))

    # (a) 2-byte-sample netpbm: enough bytes to pass the length check
    deep = b"P6\n2 2\n65535\n" + bytes(24)
    with pytest.raises(ValueError, match="maxval"):
        run(mm.decode_ppm_real, deep)
    # (b) zero dimensions
    with pytest.raises(ValueError, match="dimensions"):
        run(mm.decode_ppm_real, b"P6\n0 0\n255\n\n")
    # (c) 8-bit WAV decodes to garbage under a hardcoded int16 read
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(8000)
        w.writeframes(np.full(4, 130, dtype=np.uint8).tobytes())
    with pytest.raises(ValueError, match="16-bit"):
        run(mm.decode_wav_real, buf.getvalue())
    # (d) wrong-length IHDR with a VALID CRC escaped as struct.error
    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))
    sig = b"\x89PNG\r\n\x1a\n"
    bad_ihdr = sig + chunk(b"IHDR", b"\x00" * 5) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="IHDR length"):
        run(mm.decode_png_real, bad_ihdr)
    # (e) IHDR but no IDAT escaped as zlib.error
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    no_idat = sig + chunk(b"IHDR", ihdr) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="IDAT"):
        run(mm.decode_png_real, no_idat)


def test_ulm_substring_counts_skips_empty_words(spark):
    """Round-13 review: Spark's sequence(1, 0) is DESCENDING [1, 0]
    (DuckDB's range(1,1) is empty) — an empty word must contribute no
    pieces, not spurious empty strings."""
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.ulm import (
        substring_counts,
    )

    words = spark.createDataFrame(
        [("", 5), ("ab", 2)], "word string, cnt long")
    got = {r.piece: r.n for r in substring_counts(words).collect()}
    assert got == {"a": 2, "b": 2, "ab": 2}


def test_mean_token_len_ignores_whitespace_runs(spark):
    """Round-13 review fix: mean token length is Σ token chars /
    n_tokens, not (n_chars − n_tokens + 1) / n_tokens — the old
    formula assumed single-space separators and inflated the feature
    on tab runs or trailing whitespace ('a\\t\\tb' scored 1.5)."""
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.text import (
        quality_features,
    )

    df = spark.createDataFrame(
        [(1, "a\t\tb"), (2, "ab cd  \n"), (3, "one two three")],
        "doc_id long, text string")
    got = {r.doc_id: r.mean_token_len
           for r in quality_features(df, "doc_id", "text").collect()}
    assert got[1] == 1.0, got          # was 1.5 under the old formula
    assert got[2] == 2.0, got          # trailing whitespace ignored
    assert abs(got[3] - 3.666667) < 1e-9, got  # 11 chars / 3 tokens


def test_curation_filter_equivalence(spark):
    """Pins the lemma the r13 corpus_curation restructure relies on:
    over ANY input, (quality_tier != 'low' AND predicted_lang !=
    'unknown') selects exactly the rows with (n_tokens >= 20 AND
    union-stopword hits > 0) — 'high' implies n_tokens >= 50 ⊂ >= 20,
    'medium' IS n_tokens >= 20, the argmax is non-'unknown' iff any
    per-language list hits (i.e. the union list hits), and NULL/blank
    text fails both forms identically."""
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.dedup import (
        norm_tokens,
    )
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.text import (
        STOPWORDS,
        lang_id,
        quality_features,
    )

    docs = [
        (1, None),                                   # NULL text
        (2, ""),                                     # blank
        (3, "the " + "x " * 18),                     # 19 toks, stop hit
        (4, "the " + "x " * 19),                     # 20 toks, stop hit
        (5, "x " * 25),                              # 25 toks, no stop
        (6, "the and of " + "x " * 47),              # 50 toks, high tier
        (7, "x " * 60),                              # 60 toks, no stop
        (8, "la " + "x " * 30),                      # fr/es tie word
        (9, "der die le la el y " + "x " * 20),      # multi-lang hits
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    declared = {
        r.doc_id
        for r in quality_features(lang_id(df, "text"), "doc_id", "text",
                                  keep=["predicted_lang"])
        .filter((F.col("quality_tier") != "low")
                & (F.col("predicted_lang") != "unknown")).collect()
    }
    all_stop = [w for ws in STOPWORDS.values() for w in ws]
    toks = norm_tokens(F.col("text"))
    n_tokens = (F.size(toks)
                - F.when(F.trim(F.col("text")) == "", F.lit(1))
                .otherwise(F.lit(0)))
    stop_hits = F.size(F.filter(toks, lambda tk: tk.isin(all_stop)))
    rewritten = {
        r.doc_id
        for r in df.filter((n_tokens >= 20) & (stop_hits > 0)).collect()
    }
    assert declared == rewritten == {4, 6, 8, 9}


def test_unicode_lowercase_portable_across_engines(spark):
    """Round-13 review fix (same class as the \\x0b finding): Java's
    FULL lowercase mapping (contextual final sigma, İ → i+U+0307)
    diverges from DuckDB's utf8proc 1:1 mapping — lower_simple
    pre-translates exactly those two codepoints so tokens, shingle
    hashes, and fingerprints agree on multilingual text."""
    import duckdb

    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.dedup import (
        norm_tokens,
    )

    cases = [
        "ΟΔΟΣ ΕΛΛΑΣ",          # word-final capital sigma (contextual)
        "İstanbul VE İZMİR",    # dotted capital I (expansion mapping)
        "Σ İ mixed ΑΣΦΑΛΩΣ",
        "straße GROẞ Ärger",    # ß/ẞ + umlauts: 1:1 on both engines
        "déjà vu naïve Ñandú",
    ]
    con = duckdb.connect()
    for txt in cases:
        df = spark.createDataFrame([(1, txt)], "doc_id long, text string")
        spark_toks = df.select(norm_tokens(F.col("text")).alias("w")) \
            .collect()[0].w
        duck_toks = con.execute(
            "SELECT string_split(trim(regexp_replace(lower(?), "
            "'[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')), ' ')", [txt]).fetchone()[0]
        assert spark_toks == duck_toks, (txt, spark_toks, duck_toks)


def test_cosine_dup_pairs_zero_vectors_excluded(spark):
    """Review fix: zero-vector cosine is NaN and Spark's NaN >= x is
    TRUE — pairs must exclude them like the oracle's NULL."""
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.ann import (
        cosine_dup_pairs,
    )

    rows = [(1, [1.0, 0.0], 0), (2, [1.0, 0.0], 0), (3, [0.0, 0.0], 0)]
    v = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = {(r.id_1, r.id_2) for r in cosine_dup_pairs(
        v, 0.3, block_col="label").collect()}
    assert got == {(1, 2)}


def test_exact_dedup_null_text_rows_all_kept(spark):
    """NULL text means content UNKNOWN, not content EQUAL: md5(NULL) is
    NULL for every such row, and the old window silently kept only one
    of N missing-extraction documents (review batch)."""
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.dedup import (
        exact_dup_groups,
        exact_keep_first,
    )

    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "same"), (4, "same"), (5, None)],
        "doc_id long, text string")
    kept = {r.doc_id for r in exact_keep_first(df, "doc_id", "text").collect()}
    assert kept == {1, 2, 3, 5}
    groups = exact_dup_groups(df, "doc_id", "text").collect()
    assert len(groups) == 1 and groups[0].keep_id == 3


def test_semantic_keep_string_ids_still_pair(spark):
    """String-keyed corpora: the cell id keeps its native type — the
    old unconditional cast('bigint') NULLed every string cell, the pair
    join matched nothing, and every near-duplicate was silently kept
    (review batch)."""
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.dedup import (
        semantic_keep,
    )

    rows = [("doc_a", [1.0, 0.0]), ("doc_b", [1.0, 0.01]),
            ("doc_c", [0.0, 1.0])]
    v = spark.createDataFrame(rows, "vec_id string, embedding array<float>")
    out = {r.vec_id: r for r in
           semantic_keep(v, min_sim=0.99, n_centroids=2, iters=1,
                         sample_mod=1).collect()}
    # doc_a and doc_b are near-identical: exactly one of them dropped
    assert not out["doc_b"].kept and out["doc_a"].kept
    assert out["doc_b"].witness == "doc_a"
    assert out["doc_c"].kept


def test_candidate_pairs_multi_variant_one_row_per_pair(spark):
    """An id with several name variants reaching the same partner must
    yield ONE (id_1, id_2) row scored by the BEST variant pair — the
    old distinct() let conflicting scores coexist (review batch)."""
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.similarity import (
        candidate_pairs,
    )

    df = spark.createDataFrame(
        [(1, "abcd"), (1, "abce"), (2, "abcd")],
        "id long, name string")
    out = candidate_pairs(df, "id", "name", metric="cosine", min_sim=0.1)
    rows = out.collect()
    pairs = [(r.id_1, r.id_2) for r in rows]
    assert pairs == [(1, 2)]
    # the shared variant 'abcd' scores exactly 1.0 — the best pair wins
    assert rows[0].value == 1.0


def test_boilerplate_whitespace_class_tokenization(spark):
    """The same blurb separated by tab vs space must produce the same
    grams (review batch: raw split(' ') missed tab/newline variants and
    counted empty-string tokens)."""
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.dedup import (
        remove_frequent_ngrams,
    )

    blurb = "all rights reserved"
    docs = spark.createDataFrame(
        [(1, f"alpha {blurb}"), (2, f"beta\t{blurb}"),
         (3, f"gamma  {blurb}\n"), (4, "unrelated text entirely here")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in remove_frequent_ngrams(
        docs, "doc_id", "text", n=3, min_doc_freq=3).collect()}
    for d in (1, 2, 3):
        assert blurb not in out[d].clean_text
        assert out[d].n_words_before == 4  # no empty-token inflation
    assert out[4].clean_text == "unrelated text entirely here"


def test_pii_counts_match_placeholders_in_masked_text(spark):
    """Sequential masking can consume an email inside a URL: counts are
    of placeholders PRESENT in masked_text, so audits reconcile
    (review batch)."""
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.text import (
        pii_mask,
    )

    df = spark.createDataFrame(
        [(1, "see https://host/user@foo.com/x then mail a@b.co"),
         (2, "plain text")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in pii_mask(df, "doc_id", "text").collect()}
    r1 = out[1]
    assert r1.masked_text.count("<URL>") == r1.n_url == 1
    assert r1.masked_text.count("<EMAIL>") == r1.n_email == 1  # only a@b.co
    assert out[2].n_email == 0 and out[2].n_url == 0


def test_text_features_unicode_and_blank(spark):
    """Unicode letters are letters (not punctuation / 2 bpe tokens) and
    blank text is 0 tokens, matched live against the DuckDB oracle
    mirror (review batch)."""
    import duckdb
    from pyspark.sql import functions as F

    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.text import (
        quality_features,
        token_counts,
    )

    texts = ["über café ß straße", "", "   ", "naïve — dash… 你好 1 a_b"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    qf = {r.doc_id: r for r in
          quality_features(df, "doc_id", "text").collect()}
    assert qf[0].n_punct == 0          # umlauts are NOT punctuation
    assert qf[1].n_tokens == 0 and qf[2].n_tokens == 0
    assert qf[1].mean_token_len is None  # 0/0 -> NULL, not phantom 0
    ws, bpe = token_counts(F.col("text"))
    tc = {r.doc_id: (r.w, r.b) for r in
          df.select("doc_id", ws.alias("w"), bpe.alias("b")).collect()}
    assert tc[0] == (4, 4)             # 'über' is ONE letter run
    assert tc[1] == (0, 0) and tc[2] == (0, 0)
    # live oracle-mirror parity on the same strings
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)",
                    [(i, t) for i, t in enumerate(texts)])
    from remove_na_lgbtiq_queer_knowledge_graph_spark.queries_llm import (
        _QUALITY_SQL,
        _TOKEN_SQL,
    )
    duck_tc = {r[0]: (r[1], r[2]) for r in con.sql(_TOKEN_SQL).fetchall()}
    assert duck_tc == tc
    duck_q = {r[0]: r for r in con.sql(_QUALITY_SQL).fetchall()}
    for i in range(len(texts)):
        assert duck_q[i][2] == qf[i].n_tokens
        assert duck_q[i][3] == qf[i].n_punct


def test_topk_zero_vector_ranks_last_as_null(spark):
    """A zero-vector candidate (cosine 0/0) must rank LAST with a NULL
    score — Spark orders NaN ABOVE every double, so the raw UDF output
    would give it rk=1 where the oracle's NULL sorts last (review
    batch).  Checked on all three top-k paths."""
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.ann import (
        brute_force_topk,
        bucketed_topk,
    )

    rows = [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 0.0]),
            (4, [0.5, 0.5])]
    v = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = v.filter("vec_id = 1")
    got = brute_force_topk(v, q, k=3).orderBy("rk").collect()
    assert [r.cand_id for r in got][:2] == [2, 4]
    last = got[-1]
    assert last.cand_id == 3 and last.cos_sim is None and last.rk == 3
    # bucketed path: same bucket for all (first dim sign), same contract
    got_b = bucketed_topk(v, q, k=3, n_bits=1).orderBy("rk").collect()
    assert got_b[-1].cand_id == 3 and got_b[-1].cos_sim is None


def test_fit_sample_refuses_fractional_id_type(spark):
    """A double id column would silently truncate through the long cast
    (ids 1.2 and 1.7 collapse onto key 1) — refused loudly, the
    connected_components allowlist fix class (review batch)."""
    import pytest

    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.ann import (
        kcenter_coreset,
        kmeans_centroids,
    )

    v = spark.createDataFrame(
        [(1.2, [1.0]), (1.7, [2.0])], "vec_id double, embedding array<float>")
    with pytest.raises(ValueError, match="not supported"):
        kcenter_coreset(v, k=2, sample_mod=1)
    with pytest.raises(ValueError, match="not supported"):
        kmeans_centroids(v, n_centroids=2, iters=1, sample_mod=1)


def test_pair_cosine_ragged_fallback(spark):
    """Ragged Arrow batches take the per-row fold: a zero vector yields
    NaN (filtered downstream), and a MISMATCHED-dims pair raises
    instead of silently scoring a prefix (review batch)."""
    import pytest
    from pyspark.sql import functions as F

    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.ann import (
        cosine,
    )

    # ragged batch, equal dims WITHIN each pair, one zero vector; the
    # fallback's NaN surfaces as NULL at the Arrow boundary (pandas
    # float64 NaN == null sentinel), same as the vectorized path
    ok = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 1.0]), ([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])],
        "a array<double>, b array<double>").coalesce(1)
    vals = [r.c for r in ok.select(cosine(F.col("a"), F.col("b"))
                                   .alias("c")).collect()]
    assert None in vals
    assert any(v is not None for v in vals)
    # mismatched dims raise in BOTH shapes: across uniform columns
    # (vectorized path) and within a ragged batch (fallback path)
    bad_uniform = spark.createDataFrame(
        [([1.0, 2.0], [1.0, 2.0, 3.0])],
        "a array<double>, b array<double>").coalesce(1)
    with pytest.raises(Exception, match="mismatched vector dims"):
        bad_uniform.select(cosine(F.col("a"), F.col("b"))
                           .alias("c")).collect()
    bad_ragged = spark.createDataFrame(
        [([1.0, 2.0], [1.0, 2.0, 3.0]), ([1.0], [1.0])],
        "a array<double>, b array<double>").coalesce(1)
    with pytest.raises(Exception, match="mismatched vector dims"):
        bad_ragged.select(cosine(F.col("a"), F.col("b"))
                          .alias("c")).collect()
