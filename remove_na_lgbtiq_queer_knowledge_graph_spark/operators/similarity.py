"""Similarity-join operators — the ER core (SURVEY.md §2.10, J8/J9/T1-T8).

The reference builds char-2-gram document-feature matrices with quanteda
and takes all-pairs cosine/jaccard above a threshold
(``entity-resolution/entities/01-within-entities.R:40-49``,
``analysis/find-duplicates-authors.R:49-61``), always *blocked* first
(same first letter / same NER label — ``entities/03:67``) because the
unblocked problem is quadratic.

Spark-first design, two physical paths behind one API:

- **exact path** (default): explode n-grams → inverted-index self-join on
  (block, gram) → per-pair dot product; cosine = dot/(|a||b|), jaccard =
  |∩|/|∪|.  All JVM-side; the join key (block, gram) keeps the shuffle
  proportional to the inverted-index postings, not n².  A document-
  frequency cut (``max_df``) drops stop-grams whose postings lists would
  otherwise dominate the join — the standard scale lever.
- **LSH path**: ``ml.feature.MinHashLSH.approxSimilarityJoin`` over
  hashed gram sets for jaccard at 100 TB scale (threshold pushed into the
  LSH join, SURVEY §4).

Scores are rounded to 6 decimals so float association order can never
flip a threshold comparison across engines/partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.numeric import round_half_away_col

from ..functions.strings import char_ngrams, char_ngrams_clean, clean_letters


def gram_counts(
    df: DataFrame, id_col: str, text_col: str, n: int = 2,
    block_cols: list[str] | None = None,
) -> DataFrame:
    """(id, block…, gram, cnt) char-n-gram term counts (quanteda dfm)."""
    block_cols = block_cols or []
    # bind the cleaned string ONCE before gramming — the inline
    # char_ngrams form re-evaluated the regexp clean per gram inside
    # the transform lambda (r13; see functions/strings.clean_letters)
    return (
        df.select(
            F.col(id_col).alias("id"),
            *[F.col(c) for c in block_cols],
            clean_letters(F.col(text_col)).alias("__s"),
        )
        .select(
            "id", *block_cols,
            F.explode(char_ngrams_clean(F.col("__s"), n)).alias("gram"),
        )
        .groupBy("id", *block_cols, "gram")
        .agg(F.count("*").alias("cnt"))
    )


def candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 2,
    min_sim: float = 0.75,
    metric: str = "cosine",
    block_cols: list[str] | None = None,
    max_df: int | None = None,
) -> DataFrame:
    """All-pairs similarity ≥ ``min_sim`` via blocked inverted-index join.

    Returns (id_1, id_2, value) with id_1 < id_2, value rounded to 6dp.
    ``metric``: 'cosine' over gram counts, 'jaccard' over gram sets, or
    'both' — one inverted-index join producing BOTH scores (grams are
    one row per (id, gram), so the matched-row count is the set
    intersection while the cnt product sums the cosine dot); takes
    ``min_sim=(min_cosine, min_jaccard)`` (pairs must meet both) and
    returns (id_1, id_2, cosine, jaccard).  The ensemble path runs at
    half the cost of two single-metric calls.
    ``max_df`` drops grams occurring in more than that many DISTINCT
    NAME CLASSES — not raw documents: the quadratic join runs over
    distinct (block, name) strings (below), so class-level df is
    exactly the posting length the join pays, and that is what the cut
    bounds (a gram in 10⁴ duplicated rows collapsing to 3 names has
    df = 3 and is correctly NOT cut — its postings are 3).  The recall
    trade
    is one-sided and measured: a pair whose qualifying similarity rests
    on grams with df ≤ max_df is unaffected (planted near-dup recall
    1.0 at max_df ∈ {5,10,20}); pairs qualifying only through hotter
    grams may drop — which for ER is the boilerplate-suffix false-match
    class.  Cutting can in principle RAISE a pair's jaccard (a hot gram
    on one side only shrinks the union); when the hot grams are shared
    corpus-wide it cannot.  Pinned in ``tests/test_llm_ops.py::
    test_candidate_pairs_max_df_recall_bound``.

    Physical strategy: the quadratic gram join runs over the *distinct
    (block, name) strings*, not over row ids — entity-name columns are
    heavily repeated (Zipfian), so this shrinks the pair-generation
    problem by the duplication factor squared.  Id-level pairs are then
    recovered by expansion joins: cross-name pairs from the surviving
    name pairs, same-name pairs (similarity exactly 1.0) from the
    name→ids mapping.  Matches the reference's ``distinct(id, name)``
    pre-step (`chronik/02:236`).

    Reference: ``calc_similarity(..., min_sim)``
    ``01-within-entities.R:48-49``; jaccard ``find-duplicates-authors.R:49``.
    """
    from ..spec import materialize

    # argument validation BEFORE any eager Spark work: an invalid
    # metric used to surface only after two corpus-scale
    # localCheckpoints (round-13 review)
    if metric not in ("cosine", "jaccard", "both"):
        raise ValueError(f"unknown metric {metric!r}")
    if metric == "both" and not (isinstance(min_sim, (tuple, list))
                                 and len(min_sim) == 2):
        raise ValueError(
            "metric='both' takes min_sim=(min_cosine, min_jaccard)")
    block_cols = block_cols or []
    base = df.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("txt"),
        *[F.col(c) for c in block_cols],
    )
    # name-class key over a JSON array, not concat_ws: concat_ws SKIPS
    # NULL fields, so (blk=NULL, txt='ab') and (blk='ab', txt=NULL)
    # collided on one nk and could fabricate a similarity-1.0 pair
    # between unrelated rows (review fix); JSON keeps nulls as `null`
    # and escapes separators inside values
    nk = F.md5(F.to_json(F.array(
        *[F.col(c).cast("string") for c in block_cols],
        F.col("txt").cast("string"))))
    # NOT materialized (r13): a narrow scan-fused projection — its
    # consumers (name distinct, the two id-expansion sides, the
    # same-name path) recompute it for less than a checkpoint costs
    ids = base.withColumn("nk", nk)
    names = ids.select("nk", "txt", *block_cols).distinct()

    grams = gram_counts(names, "nk", "txt", n, block_cols)
    if metric == "jaccard":
        grams = grams.withColumn("cnt", F.lit(1))
    if max_df is not None:
        # df per (block, gram): the join is keyed on (block, gram), so
        # the posting length the join pays is BLOCK-local — a global
        # count cut grams whose per-block lists were all tiny
        # (round-13 review)
        gkeys = block_cols + ["gram"]
        heavy = grams.groupBy(*gkeys).agg(F.count("*").alias("df")).filter(
            F.col("df") > max_df
        )
        grams = grams.join(F.broadcast(heavy.select(*gkeys)),
                           gkeys, "left_anti")
    # referenced by the self-join (twice) and the norm aggregation —
    # materialize once instead of re-shingling three times
    grams = materialize(grams)

    # card semantics per metric: for 'jaccard' cnt was just set to 1,
    # so Σcnt IS the distinct-gram count; for 'both' the counts must
    # stay intact for the cosine dot, so the set cardinality is the
    # row count instead — identical values, different route
    norms = grams.groupBy("id").agg(
        F.sqrt(F.sum(F.col("cnt") * F.col("cnt"))).alias("norm"),
        (F.count(F.lit(1)) if metric == "both"
         else F.sum("cnt")).alias("card"),
    )

    a = grams.select(
        *[F.col(c).alias(f"{c}__b") for c in block_cols],
        F.col("id").alias("nk_1"), F.col("gram").alias("gram"),
        F.col("cnt").alias("cnt_1"),
    )
    b = grams.select(
        *[F.col(c).alias(f"{c}__b") for c in block_cols],
        F.col("id").alias("nk_2"), F.col("gram").alias("gram"),
        F.col("cnt").alias("cnt_2"),
    )
    join_keys = [f"{c}__b" for c in block_cols] + ["gram"]
    # ONE self-join serves both metrics: grams are one row per
    # (id, gram), so the matched-row COUNT is exactly the set
    # intersection while the cnt product sums to the cosine dot —
    # metric='both' (the meta-ensemble path) gets both numbers for the
    # price of one inverted-index join instead of two full pipelines
    pair_aggs = [F.sum(F.col("cnt_1") * F.col("cnt_2")).alias("dot")]
    if metric == "both":
        pair_aggs.append(F.count(F.lit(1)).alias("inter"))
    dots = (
        a.join(b, join_keys)
        .filter(F.col("nk_1") < F.col("nk_2"))
        .groupBy("nk_1", "nk_2")
        .agg(*pair_aggs)
    )

    n1 = norms.select(F.col("id").alias("nk_1"), F.col("norm").alias("norm_1"),
                      F.col("card").alias("card_1"))
    n2 = norms.select(F.col("id").alias("nk_2"), F.col("norm").alias("norm_2"),
                      F.col("card").alias("card_2"))
    paired = dots.join(n1, "nk_1").join(n2, "nk_2")

    if metric == "cosine":
        value = F.col("dot") / (F.col("norm_1") * F.col("norm_2"))
    elif metric == "jaccard":
        value = F.col("dot") / (F.col("card_1") + F.col("card_2") - F.col("dot"))
    elif metric == "both":
        cos_v = F.col("dot") / (F.col("norm_1") * F.col("norm_2"))
        jac_v = F.col("inter") / (
            F.col("card_1") + F.col("card_2") - F.col("inter"))
        min_cos, min_jac = float(min_sim[0]), float(min_sim[1])
        name_pairs = (
            paired.withColumn("cosine", round_half_away_col(cos_v, 6))
            .withColumn("jaccard", round_half_away_col(jac_v, 6))
            .filter((F.col("cosine") >= min_cos)
                    & (F.col("jaccard") >= min_jac))
            .select("nk_1", "nk_2", "cosine", "jaccard")
        )
        value = None
    else:  # unreachable: validated at entry
        raise AssertionError(metric)

    if metric != "both":
        name_pairs = (
            paired.withColumn("value", round_half_away_col(value, 6))
            .filter(F.col("value") >= min_sim)
            .select("nk_1", "nk_2", "value")
        )

    # expansion back to id level --------------------------------------
    val_cols = ["cosine", "jaccard"] if metric == "both" else ["value"]
    ids1 = ids.select(F.col("nk").alias("nk_1"), F.col("id").alias("id_a"))
    ids2 = ids.select(F.col("nk").alias("nk_2"), F.col("id").alias("id_b"))
    cross = (
        name_pairs.join(ids1, "nk_1")
        .join(ids2, "nk_2")
        .select(
            F.least("id_a", "id_b").alias("id_1"),
            F.greatest("id_a", "id_b").alias("id_2"),
            *val_cols,
        )
        # an id carrying TWO name variants that pair with each other
        # would fabricate a self-pair through least/greatest
        # (round-13 review, verified live)
        .filter(F.col("id_1") < F.col("id_2"))
    )
    # same-name id pairs score exactly 1.0 (identical gram vectors);
    # names whose gram set is empty (letters-only strip) never pair,
    # matching the id-level formulation — hence the semi join on norms.
    same_qualifies = (max(min_sim) if metric == "both" else min_sim) <= 1.0
    if same_qualifies:
        grammed = names.join(
            norms.select(F.col("id").alias("nk")), "nk", "left_semi"
        ).select("nk")
        s1 = ids.join(grammed, "nk", "left_semi")
        # blocked semantics: a NULL block value matches NO row — the
        # gram join's equi-keys already enforce that for cross-name
        # pairs, but the nk equality here would pair two NULL-block
        # rows with identical text (round-13 review, verified live)
        for c in block_cols:
            s1 = s1.filter(F.col(c).isNotNull())
        s2 = s1.select(F.col("nk"), F.col("id").alias("id_b"))
        same = (
            s1.select("nk", F.col("id").alias("id_a"))
            .join(s2, "nk")
            .filter(F.col("id_a") < F.col("id_b"))
            .select(
                F.col("id_a").alias("id_1"), F.col("id_b").alias("id_2"),
                *[F.lit(1.0).alias(c) for c in val_cols],
            )
        )
        cross = cross.unionByName(same)
    # ONE row per (id_1, id_2): an id carrying several name VARIANTS can
    # reach the same partner through different variant pairs with
    # DIFFERENT scores (e.g. 1.0 via a shared variant plus <1.0 via a
    # near-variant), and a bare distinct() only removed exact-duplicate
    # rows — downstream per-pair joins would fan out (review batch,
    # the duplicate-pair sibling of the round-13 self-pair fix).  The
    # pair's score is its BEST variant pair — the standard ER blocking
    # semantics — taken as one lexicographic max struct so multi-metric
    # values stay from the SAME variant pair; also collapses duplicated
    # input rows, which the old distinct() handled.
    if len(val_cols) == 1:
        # single metric: max over the bare value IS the lexicographic
        # struct max, and a non-struct agg buffer keeps the final
        # aggregation hash-based (max(struct) plans a SortAggregate —
        # an extra per-partition sort on both sides of the exchange;
        # r13 optimization, plan-verified HashAggregate after)
        return cross.groupBy("id_1", "id_2").agg(
            F.max(val_cols[0]).alias(val_cols[0]))
    return (
        cross.groupBy("id_1", "id_2")
        .agg(F.max(F.struct(*val_cols)).alias("__best"))
        .select("id_1", "id_2",
                *[F.col(f"__best.{c}").alias(c) for c in val_cols])
    )


def candidate_pairs_lsh(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 2,
    min_sim: float = 0.5,
    num_hash_tables: int = 8,
    vocab_size: int = 1 << 18,
) -> DataFrame:
    """Approximate jaccard pairs via MinHash LSH — the 100 TB path.

    ``approxSimilarityJoin`` prunes to bucket-colliding pairs, so cost
    follows the number of near-duplicates, not n².  Reference thresholds
    map directly: jaccard distance threshold = 1 - min_sim.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    feats = df.select(
        F.col(id_col).alias("id"),
        clean_letters(F.col(text_col)).alias("__s"),
    ).select(
        "id", char_ngrams_clean(F.col("__s"), n).alias("grams"),
    ).filter(F.size("grams") > 0)
    tf = HashingTF(inputCol="grams", outputCol="features", numFeatures=vocab_size, binary=True)
    fdf = tf.transform(feats)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=num_hash_tables)
    model = lsh.fit(fdf)
    # +1e-9: approxSimilarityJoin filters dist < threshold STRICTLY, so
    # a pair at exactly jaccard == min_sim would be excluded — breaking
    # the inclusive >= min_sim contract every sibling operator keeps
    # (and the float form of 1-0.8 is already 0.19999...96, which
    # dropped boundary pairs one ulp early; review fix).  The epsilon
    # only ever ADMITS extra candidates, never loses one.
    pairs = model.approxSimilarityJoin(
        fdf, fdf, 1.0 - min_sim + 1e-9, distCol="dist")
    return (
        pairs.select(
            F.col("datasetA.id").alias("id_1"),
            F.col("datasetB.id").alias("id_2"),
            round_half_away_col(1.0 - F.col("dist"), 6).alias("value"),
        )
        .filter(F.col("id_1") < F.col("id_2"))
        # the widened threshold above can ADMIT a pair whose true
        # jaccard lies inside (min_sim - 1e-9, min_sim); this exact
        # post-filter on the reported value restores the inclusive
        # ``value >= min_sim`` contract every sibling operator keeps
        .filter(F.col("value") >= F.lit(float(min_sim)))
    )


def candidate_pairs_minhash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 2,
    min_sim: float = 0.5,
    num_hashes: int = 12,
    band_size: int = 3,
) -> DataFrame:
    """Engine-portable MinHash-LSH jaccard pairs — the oracle-checkable
    twin of :func:`candidate_pairs_lsh` (same ``approxSimilarityJoin``
    shape: candidate generation by banded signature collision, exact
    refine on candidates only).

    Deterministic by construction: signatures are ``min(md5(seed|gram))``
    (identical in any engine — min over hex strings is min over the
    uniform hash order; a one-md5 Kirsch-Mitzenmacher family is
    available via ``dedup.minhash_signature(family="km")`` for the
    100 TB regime), banding is a (band, bucket) equi-join, and the
    reported ``value`` is the *exact* jaccard of the candidate pair, so
    a plain-SQL oracle reproduces it bit-for-bit.  Cost follows the
    banding collisions, not n²; the refine join touches candidate grams
    only.  Reference semantics: ``calc_similarity(..., min_sim)``
    `entity-resolution/entities/01-within-entities.R:48-49`.

    Exact-duplicate collapse: ids with identical gram SETS are grouped
    into one equivalence class first; banding and refine run per CLASS
    (the minhash signature is a pure function of the gram set, so
    class-level banding collides exactly when id-level banding would),
    and pairs are expanded back at the end — within-class pairs at
    jaccard 1.0, cross-class pairs at the class pair's exact jaccard.
    On a mostly-unique corpus the collapse is one extra map-side
    aggregation; under heavy duplication (web crawls, template text —
    or TPC-H's 92-word name vocabulary) it turns O(dup²) clique refine
    work into O(classes²), which is the standard trick production
    MinHash dedup pipelines use before LSH.
    """
    from ..spec import materialize
    from .dedup import repartition_unsplittable

    # Per-row set semantics (r13 optimization): every id's grams come
    # from its single text row, so array_distinct IS the distinct
    # (id, gram) set — the old explode().distinct() paid a full
    # shuffle for it.  The cleaned string is bound once before
    # gramming (see functions/strings.clean_letters), and the
    # parallelism gate distributes the narrow md5-heavy chain when the
    # scan cannot split.  Precondition (holds for every caller —
    # keyed entity tables): ids are unique in ``df``; duplicated id
    # rows would union their gram sets under the old distinct and no
    # longer do.
    # gset NOT materialized (r13): the narrow per-row form is a
    # shuffle-free projection, so its two consumers (the class
    # aggregation and the representative join) recompute it for less
    # than the old checkpoint cost
    gset = (
        repartition_unsplittable(df, id_col)
        .select(
            F.col(id_col).alias("id"),
            clean_letters(F.col(text_col)).alias("__s"),
        )
        .select(
            "id",
            F.explode(
                F.array_distinct(char_ngrams_clean(F.col("__s"), n))
            ).alias("gram"),
        )
    )
    # Equivalence classes of identical gram sets: cls = hash of the
    # sorted gram set (map-side combinable collect_set, one shuffle).
    members = materialize(
        gset.groupBy("id").agg(
            F.md5(
                F.concat_ws("", F.sort_array(F.collect_set("gram")))
            ).alias("cls")
        )
    )
    reps = members.groupBy("cls").agg(F.min("id").alias("id"))
    rep_gset = materialize(
        gset.join(reps, "id").select(F.col("cls").alias("id"), "gram")
    )

    sig = minhash_signature_grams(rep_gset, num_hashes)
    cand = band_candidates(sig, num_hashes, band_size)

    cards = rep_gset.groupBy("id").agg(F.count("*").alias("card"))
    g1 = rep_gset.select(F.col("id").alias("id_1"), "gram")
    g2 = rep_gset.select(F.col("id").alias("id_2"), "gram")
    inter = (
        cand.join(g1, "id_1").join(g2, ["id_2", "gram"])
        .groupBy("id_1", "id_2")
        .agg(F.count("*").alias("inter"))
    )
    c1 = cards.select(F.col("id").alias("id_1"), F.col("card").alias("card_1"))
    c2 = cards.select(F.col("id").alias("id_2"), F.col("card").alias("card_2"))
    value = round_half_away_col(
        F.col("inter") / (F.col("card_1") + F.col("card_2") - F.col("inter")), 6
    )
    cls_pairs = (
        inter.join(c1, "id_1").join(c2, "id_2")
        .withColumn("value", value)
        .filter(F.col("value") >= min_sim)
        .select(
            F.col("id_1").alias("cls_1"),
            F.col("id_2").alias("cls_2"),
            "value",
        )
    )

    # Expand class pairs back to id pairs.  Cross-class: every member
    # of one class against every member of the other, re-canonicalized
    # to id_1 < id_2 (class order is hash order, not id order).
    m1 = members.select(F.col("cls").alias("cls_1"), F.col("id").alias("ida"))
    m2 = members.select(F.col("cls").alias("cls_2"), F.col("id").alias("idb"))
    cross = (
        cls_pairs.join(m1, "cls_1").join(m2, "cls_2")
        .select(
            F.least("ida", "idb").alias("id_1"),
            F.greatest("ida", "idb").alias("id_2"),
            "value",
        )
    )
    # Within-class: identical gram sets ⇒ identical signatures ⇒ always
    # band-collide, exact jaccard 1.0 ≥ any threshold.
    w1 = members.select("cls", F.col("id").alias("id_1"))
    w2 = members.select("cls", F.col("id").alias("id_2"))
    within = (
        w1.join(w2, "cls")
        .filter(F.col("id_1") < F.col("id_2"))
        .select("id_1", "id_2", F.lit(1.0).alias("value"))
    )
    return cross.unionByName(within)


def minhash_signature_grams(gset: DataFrame, num_hashes: int) -> DataFrame:
    """k md5-minhash signature columns over a distinct (id, gram) set —
    the char-gram instantiation of :func:`dedup.minhash_signature`
    (one implementation; a banding fix reaches both stacks)."""
    from .dedup import minhash_signature

    return minhash_signature(gset, num_hashes, feature_col="gram")


def band_candidates(sig: DataFrame, num_hashes: int, band_size: int) -> DataFrame:
    """(id_1, id_2) candidates whose signatures collide in ≥1 band —
    delegates to :func:`dedup.minhash_band_pairs` (identical plan:
    one exploded array projection, equi-join on (band, bucket))."""
    from .dedup import minhash_band_pairs

    return minhash_band_pairs(sig, num_hashes, band_size)


def string_distance_join(
    left: DataFrame, right: DataFrame, left_col: str, right_col: str,
    *, max_dist: int = 2, block_cols: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """J8: blocked fuzzy join on levenshtein distance
    (``fuzzyjoin::stringdist_inner_join`` max_dist 2-3,
    ``lobid/01-search-via-isbn.R:97``)."""
    conds = [F.col(f"l.{a}") == F.col(f"r.{b}") for a, b in (block_cols or [])]
    joined = left.alias("l").join(right.alias("r"), conds if conds else None)
    return joined.withColumn(
        "dist", F.levenshtein(F.col(f"l.{left_col}"), F.col(f"r.{right_col}"))
    ).filter(F.col("dist") <= max_dist)


def meta_ensemble(pairs_with_names: DataFrame, name_1: str = "name_1",
                  name_2: str = "name_2") -> DataFrame:
    """T8: multi-metric ensemble — cosine + jaccard + 2/levenshtein.

    Reference: ``meta_sim = cosine + jaccard + 2/lv``
    (``find-duplicates-authors.R:204-210``) with relevance cutoffs
    cosine ≥ 0.5, jaccard ≥ 0.3, lev < 3.

    DELIBERATE deviation from the reference at lev == 0: R's ``2/0``
    is ``Inf`` (exact name matches sort above everything); this
    operator caps the term at 2.0 so ``meta_sim`` stays finite,
    summable, and oracle-hashable.  Consequence: an exact match and a
    one-edit match with equal cosine/jaccard score the SAME — callers
    ranking candidates should tie-break on the returned ``lev`` ASC,
    which restores the reference's exact-first ordering without
    infinities."""
    lev = F.levenshtein(F.col(name_1), F.col(name_2))
    lev_term = F.when(lev == 0, F.lit(2.0)).otherwise(F.lit(2.0) / lev)
    return pairs_with_names.withColumn("lev", lev.cast("long")).withColumn(
        "meta_sim", round_half_away_col(F.col("cosine") + F.col("jaccard") + lev_term, 6)
    )
