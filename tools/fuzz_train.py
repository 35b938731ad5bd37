"""Differential fuzz for the training-tier queries (queries_llm3).

The three-SF sweeps prove Spark↔DuckDB parity on three fixed corpora;
the training ops' parity additionally rests on transcendental rounding
discipline (exp in the LR sigmoid, ln in the LM/DSIR/TF-IDF scores)
and on filter/edge agreement (wordless docs, 1-word docs, exhausted
vocabularies).  This harness generates random synthetic `documents`
corpora — small alphabets to force tie-breaks and hash-bucket
collisions, deliberate numeric-only and single-word docs to exercise
the len(w) filters — and runs each training query against its
registered DuckDB oracle on every corpus, comparing with the exact
check_oracle normalization (row count + columns + sorted values).

BPE trials whose random vocabulary exhausts before 8 merges are
SKIPPED for the bpe_* queries with a log line (the Spark side fails
loud by contract; the unrolled oracle would compute garbage — that
asymmetry is documented, not a bug).

Usage: python tools/fuzz_train.py [--trials 8] [--seed 0]
Exit code 0 = every comparison on every trial matched.
"""

from __future__ import annotations

import argparse
import os
import pathlib
import random
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

QUERIES = [
    "bpe_train_merges", "bpe_vocab_tokens", "bpe_encode_docs",
    "lr_quality_train", "lr_quality_score", "lm_bigram_score",
    "dsir_importance_weights", "text_tfidf_terms", "doc_cluster_assign",
    # round 9: A-ES weighted sample (ln/md5-uniform discipline) and
    # KL divergence (ln + decimal-sum discipline)
    "select_weighted_sample", "mix_kl_divergence",
    # round 9 second half: NB classifier (smoothed-model ln grid +
    # decimal sums + argmax tie-breaks), shingle novelty (integer
    # ratio rounding), KN bigram LM (mixed-term ln grid), word
    # entropy (ratio·ln grid), asymmetric containment (one-sided
    # prefix filter exactness under random corpora)
    "nb_lang_train", "nb_lang_score", "text_novelty_score",
    "lm_kn_bigram_score", "text_entropy_score", "dedup_containment_pairs",
    # round 10: BM25 (idf ln grid + rounded-score rank determinism —
    # random small alphabets force score ties at the top-10 boundary),
    # CCNet perplexity terciles (ntile boundary determinism on the
    # rounded KN score), and the unrounded-threshold jaccard twins
    # (boundary pairs must agree with the all-pairs oracle exactly)
    "text_bm25_topk", "lm_ppl_buckets",
    "dedup_jaccard_pairs", "dedup_jaccard_prefix",
    # round 11: curation tier — epoch replication (source-number
    # parsing + sequence/generate_series parity) and the deny-list
    # gate (case-fold + 2%-boundary integer arithmetic; gen_corpus
    # plants literal blocklist words so n_blocked > 0 actually
    # exercises the keep cut)
    "mix_upsample_epochs", "text_blocklist_filter",
]

# embeddings-driven queries, fuzzed with adversarial vector tables
# (exact duplicates to force assignment tie-breaks; all vectors
# non-zero per the documented k-means precondition).  Round 9 adds the
# PQ family — duplicate vectors stress the sub-quantizer tie-breaks,
# and the residual variant additionally exercises the
# zip_with-subtraction / qc-seeded-fold parity.
# dim-agnostic ops fuzz at random small dims (denser tie collisions);
# the PQ family needs dim=64 (oracle slice bounds) — see gen_embeddings
EMB_QUERIES_ANYDIM = ["dedup_semantic_keep", "ann_kmeans_cells"]
EMB_QUERIES_DIM64 = ["ann_pq_topk", "ann_ivf_pq_topk",
                     "ann_ivf_pq_residual_topk"]


def gen_corpus(rng: random.Random):
    """Random documents rows: (doc_id, text, lang, source, n_chars)."""
    n_docs = rng.randint(50, 200)
    alpha = "abcdefgh"[: rng.randint(2, 5)]
    vocab = list({
        "".join(rng.choice(alpha) for _ in range(rng.randint(1, 5)))
        for _ in range(rng.randint(8, 40))
    })
    langs = ["en", "de", "fr", "zh"]
    rows = []
    for i in range(n_docs):
        kind = rng.random()
        if kind < 0.03:
            text = str(rng.randint(0, 10 ** 6))       # wordless after regex
        elif kind < 0.08:
            text = rng.choice(vocab)                  # single-word doc
        else:
            text = " ".join(
                rng.choice(vocab)
                for _ in range(rng.randint(15, 80)))  # BPE-viable length
        if kind >= 0.08 and rng.random() < 0.10:
            # exotic-whitespace joiners (round 11): \x0b is where Java
            # \s and RE2 \s disagreed — the portable
            # [ \t\n\x0b\f\r]+ class must tokenize these identically
            # on both engines (norm_tokens-based dedup/jaccard paths)
            ws = ["\t", "\x0b", "\n", "  "]
            words = text.split(" ")
            text = words[0] + "".join(
                rng.choice(ws + [" ", " ", " "]) + w for w in words[1:])
        if kind >= 0.08 and rng.random() < 0.15:
            # plant 1-3 deny-list words (round 11) — random vocab over
            # a tiny alphabet would never hit the literal blocklist,
            # leaving text_blocklist_filter's keep cut unexercised;
            # mixed case exercises the fold, 1-3 of ~15-80 tokens puts
            # docs on both sides of the 2% boundary
            words = text.split(" ")
            for _ in range(rng.randint(1, 3)):
                planted = rng.choice(["slow", "Slow", "BROKEN", "stale"])
                words.insert(rng.randrange(len(words) + 1), planted)
            text = " ".join(words)
        rows.append((i, text, rng.choice(langs),
                     f"src{rng.randint(0, 5)}", len(text)))
    # planted near-duplicates (round 10): ~10% of docs get a same-lang
    # copy with 0-2 words perturbed — puts jaccard/containment pairs
    # right at the 0.8 threshold boundary, where the unrounded-filter
    # vs prefix-pruning agreement is actually exercised (pure random
    # corpora almost never produce a ≥ 0.8 pair)
    base = list(rows)
    for j, (i, text, lang, src, _nc) in enumerate(base):
        if rng.random() < 0.10 and " " in text:
            words = text.split(" ")
            for _ in range(rng.randint(0, 2)):
                words[rng.randrange(len(words))] = rng.choice(vocab)
            dup = " ".join(words)
            rows.append((len(rows), dup, lang, src, len(dup)))
    return rows


def gen_embeddings(rng: random.Random, dim: int):
    """Random (vec_id, embedding float[], label) rows: vectors with
    coarse coordinates (ties likely), ~20% exact duplicates of
    earlier rows, no zero vectors (documented precondition — cosine of
    the zero vector is undefined and the engines NaN/NULL-diverge).

    dim is per QUERY FAMILY (round-9 review): the PQ-family oracles
    mirror the testdata embeddings schema with literal subspace slice
    bounds (dim=64 baked into `_pq_oracle_sql(..., dim=64, ...)`) — a
    narrower fuzz vector silently empties the mirror's upper slices —
    while dedup_semantic_keep / ann_kmeans_cells are dim-agnostic and
    small dims (4/8/16) give far denser coarse-coordinate tie
    collisions, which is the regime that catches tie-break bugs."""
    n = rng.randint(40, 150)
    rows = []
    for i in range(n):
        if rows and rng.random() < 0.2:
            v = rows[rng.randrange(len(rows))][1]
        else:
            while True:
                v = [float(rng.randint(-3, 3)) / 2 for _ in range(dim)]
                if any(x != 0.0 for x in v):
                    break
        rows.append((i, v, rng.randint(0, 4)))
    return rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from check_oracle import normalize  # same comparison basis
    from remove_na_lgbtiq_queer_knowledge_graph_spark.registry import all_specs
    from remove_na_lgbtiq_queer_knowledge_graph_spark.session import get_spark
    from remove_na_lgbtiq_queer_knowledge_graph_spark.spec import scratch_dir

    spark = get_spark("fuzz-train")
    specs = all_specs()
    failures = []
    for trial in range(args.trials):
        rng = random.Random(args.seed + trial)
        rows = gen_corpus(rng)
        d = scratch_dir(f"fuzztrain{trial}_")
        tbl = pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": [r[1] for r in rows],
            "lang": [r[2] for r in rows],
            "source": [r[3] for r in rows],
            "n_chars": pa.array([r[4] for r in rows], pa.int64()),
        })
        pq.write_table(tbl, os.path.join(d, "documents.parquet"))
        # the training queries only read documents; link the rest so
        # spec.t() can resolve any table it's asked for
        for f in os.listdir("/root/testdata/sf0.001"):
            dst = os.path.join(d, f)
            if f.endswith(".parquet") and not os.path.exists(dst):
                os.symlink(os.path.join("/root/testdata/sf0.001", f), dst)
        def write_embeddings(dest: str, dim: int) -> None:
            erows = gen_embeddings(rng, dim)
            etbl = pa.table({
                "vec_id": pa.array([r[0] for r in erows], pa.int64()),
                "embedding": pa.array([r[1] for r in erows],
                                      pa.list_(pa.float32())),
                "label": pa.array([r[2] for r in erows], pa.int32()),
            })
            pq.write_table(etbl, os.path.join(dest, "embeddings.parquet"))

        os.unlink(os.path.join(d, "embeddings.parquet"))
        write_embeddings(d, 64)
        # second fixture dir for the dim-agnostic ops: same documents,
        # small-dim embeddings
        d2 = scratch_dir(f"fuzztrain{trial}s_")
        for f in os.listdir(d):
            if f.endswith(".parquet") and f != "embeddings.parquet":
                os.symlink(os.path.join(d, f), os.path.join(d2, f))
        write_embeddings(d2, rng.choice([4, 8, 16]))
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{d}/documents.parquet'")
        con.sql(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"'{d}/embeddings.parquet'")
        con2 = duckdb.connect()
        con2.sql(f"CREATE VIEW documents AS SELECT * FROM "
                 f"'{d2}/documents.parquet'")
        con2.sql(f"CREATE VIEW embeddings AS SELECT * FROM "
                 f"'{d2}/embeddings.parquet'")
        runs = ([(n, d, con) for n in QUERIES + EMB_QUERIES_DIM64]
                + [(n, d2, con2) for n in EMB_QUERIES_ANYDIM])
        for name, sfd, ccon in runs:
            spec = specs[name]
            try:
                sdf = spec.fn(spark, sfd)
                scols = sdf.columns
                srows = [tuple(r) for r in sdf.collect()]
            except ValueError as exc:
                if name.startswith("bpe_") and "exhausted" in str(exc):
                    print(f"trial {trial} {name}: SKIP ({exc})")
                    continue
                failures.append((trial, name, f"spark: {exc}"))
                print(f"trial {trial} {name}: SPARK-FAIL {exc}")
                continue
            except Exception as exc:  # noqa: BLE001 — record, keep fuzzing
                failures.append((trial, name, f"spark: {exc}"))
                print(f"trial {trial} {name}: SPARK-FAIL {exc}")
                continue
            try:
                res = ccon.sql(spec.oracle)
                dcols = [x[0] for x in res.description]
                drows = res.fetchall()
            except Exception as exc:  # noqa: BLE001
                failures.append((trial, name, f"duckdb: {exc}"))
                print(f"trial {trial} {name}: DUCKDB-FAIL {exc}")
                continue
            ok = (len(srows) == len(drows)
                  and sorted(scols) == sorted(dcols)
                  and normalize(srows, scols) == normalize(drows, dcols))
            if not ok:
                ns, nd = normalize(srows, scols), normalize(drows, dcols)
                only_s = [r for r in ns if r not in set(nd)][:2]
                only_d = [r for r in nd if r not in set(ns)][:2]
                failures.append((trial, name, f"mismatch {only_s} {only_d}"))
                print(f"trial {trial} {name}: MISMATCH "
                      f"spark={len(srows)} duck={len(drows)} "
                      f"s-only={only_s} d-only={only_d}")
            else:
                print(f"trial {trial} {name}: ok ({len(srows)} rows)")
        con.close()
        con2.close()
    print(f"\n{args.trials} trials, {len(failures)} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
