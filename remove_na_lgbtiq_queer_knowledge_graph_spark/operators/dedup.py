"""Deduplication operators for training-data pipelines (BASELINE.json
scale extensions; streaming twin of the reference's batch dedupe W2/J4).

All signatures are engine-independent by construction: hashes are md5
over explicit strings (not engine-native hash functions), so every
operator here is checkable against an external SQL oracle and stable
across Spark versions/partitionings.

Scale notes: exact dedup is a hash groupBy (map-side combinable);
MinHash/SimHash signatures are per-row (embarrassingly parallel); the
LSH band join shuffles on (band, bucket) — cardinality follows the
number of *near-duplicate candidates*, not n².
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.numeric import round_half_away_col


def repartition_unsplittable(df: DataFrame, key_col: str) -> DataFrame:
    """Scale-adaptive parallelism repair for heavy narrow pipelines
    (r13 optimization, guide §2: derive partitioning from the input,
    never a constant).

    The shingle/signature passes are embarrassingly parallel per-row
    work that fuses into the scan — which is exactly wrong when the
    source cannot split (the driver testdata ships ONE parquet row
    group per table, so the whole tokenize+md5 pipeline lands on one
    core; a gzip'd crawl shard does the same in production).  Gate on
    the ACTUAL scan partition count: only when it is below half the
    cluster's parallelism do we pay one hash repartition of the narrow
    input rows.  At real scale the scan splits naturally (thousands of
    tasks ≥ parallelism), the gate never fires, and the pipeline stays
    shuffle-free — this is NOT the round-5 "unconditional post-scan
    repartition" that taxed every query (see PLANS.md: measured and
    rejected); the gate makes it free where it isn't needed.

    Hash-partitions on ``key_col`` (deterministic — a keyless
    round-robin would pay the sort-before-repartition pass), which
    downstream per-key aggregations can then reuse.
    """
    sc = df.sparkSession.sparkContext
    want = sc.defaultParallelism
    try:
        have = df.rdd.getNumPartitions()
    except Exception:  # noqa: BLE001 — probe only, never break the plan
        return df
    if have * 2 <= want:
        return df.repartition(want, F.col(key_col))
    return df


def norm_tokens(col: Column) -> Column:
    # explicit whitespace class, NOT \s: Java's \s is [ \t\n\x0b\f\r]
    # but DuckDB's RE2 \s lacks \x0b, so a vertical tab tokenized
    # differently across engines (review fix) — the literal class is
    # value-identical to Java \s on the Spark side and portable.
    # lower_simple, not F.lower: Java's FULL case mapping diverges
    # from DuckDB's 1:1 on Σ/İ (round-13 review — same class)
    from ..functions.strings import lower_simple

    return F.split(F.trim(F.regexp_replace(lower_simple(col), r"[ \t\n\x0b\f\r]+", " ")), " ")


def ws_tokens(col: Column) -> Column:
    """Case-PRESERVING whitespace tokens.  Lowercasing commutes with
    whitespace splitting, so positions align 1:1 with
    :func:`norm_tokens` — detection can match case-insensitively while
    reconstruction keeps the original text."""
    return F.split(F.trim(F.regexp_replace(col, r"[ \t\n\x0b\f\r]+", " ")), " ")


def exact_dup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup: md5 groupBy; groups with >1 member are duplicates.

    NULL text never forms a duplicate group: ``md5(NULL)`` is NULL for
    every such row, so without the filter a corpus with many
    missing-extraction documents would report them as ONE group and
    keep-first would silently drop all but one — NULL means "content
    unknown", not "content equal" (review batch)."""
    return (
        df.filter(F.col(text_col).isNotNull())
        .groupBy(F.md5(F.col(text_col)).alias("hash"))
        .agg(F.count("*").alias("n"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n") > 1)
    )


def exact_keep_first(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup keeping the min-id representative per hash.  Rows
    with NULL text are ALL kept (same rationale as
    :func:`exact_dup_groups` — unknown content is not equal content)."""
    from pyspark.sql import Window

    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(id_col)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) | F.col(text_col).isNull())
        .drop("__rn")
    )


def shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3,
             extra_cols: list[str] | None = None,
             distinct: bool = True) -> DataFrame:
    """Word-n-gram shingles per document (distinct by default; pass
    ``distinct=False`` for multiset consumers like repetition scoring).

    Implemented as ONE NARROW per-row projection (r13 optimization):
    tokenize once, index the token array with ``element_at`` over a
    ``sequence`` of start positions (O(1) per access — no O(tokens·n)
    ``slice`` copies, the reason the old `word_ngrams` array shape
    lost to a window), and dedupe per row with ``array_distinct``.
    All of a document's shingles come from its single text row, so the
    per-row dedupe IS the set semantics — the old formulation
    (posexplode → window ``lead`` over a hashpartitioning(id) exchange
    → global ``distinct`` over a second exchange) shuffled the entire
    token stream twice for what a map-side expression computes in
    place.  At 100 TB those were two full-corpus shuffles; here the
    shingle pass fuses into the scan (zero exchanges), and downstream
    aggregations get map-side combine on co-located doc rows.
    Measured at sf0.1: the materialized shingle pass of
    dedup_jaccard_pairs fell 0.93 s → ~0.4 s and every consumer keeps
    byte-identical output (oracle-checked across the dedup family).
    """
    extra_cols = extra_cols or []
    base = repartition_unsplittable(df, id_col).select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in extra_cols],
        # bind the token array ONCE in its own projection: the n
        # element_at references below each carry their own copy of the
        # expression tree, and higher-order-function bodies evaluate
        # outside whole-stage codegen where subexpression elimination
        # would have deduplicated them
        norm_tokens(F.col(text_col)).alias("__toks"),
    )
    toks = F.col("__toks")
    cnt = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    # sequence(1, 0) yields a DESCENDING [1, 0] — guard short docs to
    # an empty index array instead
    idx = F.when(cnt >= 1, F.sequence(F.lit(1), cnt)) \
        .otherwise(F.array().cast("array<int>"))
    arr = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(n)]),
    )
    if distinct:
        arr = F.array_distinct(arr)
    return base.select(
        "id", *extra_cols, F.explode(arr).alias("shingle"))


# modulus for the Kirsch-Mitzenmacher hash family: largest prime < 2^32
KM_PRIME = 4294967291


def minhash_signature(
    sh: DataFrame, num_hashes: int = 12, feature_col: str = "shingle",
    family: str = "seeded",
) -> DataFrame:
    """MinHash signature columns h0..h{k-1}: min over features of
    md5(seed|feature).  md5-based so the signature is identical in any
    engine; min over hex strings = min over the uniform hash order.
    ``feature_col`` names the set-element column (word shingles here;
    ``similarity.minhash_signature_grams`` passes char grams).

    ``family="km"`` switches to the Kirsch-Mitzenmacher two-hash
    construction: ONE md5 per feature, k LONG components derived as
    h_s = (a + s·b) mod P with a, b the two 32-bit md5 halves and P
    the largest prime < 2^32 (Kirsch & Mitzenmacher 2006) — k hash
    functions for the price of one.  b is reduced into [1, P-1] via
    ``(b mod (P-1)) + 1`` (round 11, reviewed twice): the standard KM
    caveat is that a feature whose b ≡ 0 (mod P) collapses all k
    components to the constant a — negligible per feature (~2^-32) but
    certain over trillions of shingles at the 100 TB target, and a
    collapsed feature correlates the k minima of every document
    containing it.  The first round-11 attempt forced b odd (``b | 1``)
    on the argument that an odd b can't be ≡ 0 (mod odd P) — wrong,
    because b|1 can land on P ITSELF (raw b ∈ {P-1, P} both map there),
    so the degenerate set merely shifted.  The mod-(P-1)+1 reduction is
    total: every raw b lands in [1, P-1], which contains no multiple of
    P; the oracle applies the same reduction.  (a values in [P, 2^32)
    still alias into [0, 5) — a ~1e-9 bias both
    engines share, documented rather than corrected.)  At 100 TB the md5 over trillions
    of shingle rows dominates the signature pass, and the km family
    halves its measured wall at sf0.1 (0.85 s → 0.42 s for k=12); the
    registry keeps the seeded default for round-over-round bench
    comparability and exposes the scale path as ``dedup_minhash_km``
    (oracle-checked, same banding machinery — buckets join on
    '|'-separated decimals instead of fixed-width hex)."""
    if family == "km":
        m = F.md5(F.col(feature_col))
        a = F.conv(F.substring(m, 1, 8), 16, 10).cast("long")
        b = F.pmod(F.conv(F.substring(m, 9, 8), 16, 10).cast("long"),
                   F.lit(KM_PRIME - 1)) + F.lit(1)
        aggs = [
            F.min(((a + F.lit(s) * b) % F.lit(KM_PRIME)).cast("long"))
             .alias(f"h{s}")
            for s in range(num_hashes)
        ]
    elif family == "seeded":
        aggs = [
            F.min(F.md5(F.concat(F.lit(f"{s}|"), F.col(feature_col))))
             .alias(f"h{s}")
            for s in range(num_hashes)
        ]
    else:
        raise ValueError(f"family must be 'seeded' or 'km', got {family!r}")
    return sh.groupBy("id").agg(*aggs)


def _bucket_pair_structs(ids_col: str = "__ids"):
    """Ordered (id_1 < id_2) combination structs over a SORTED id array
    — the one copy of in-bucket pair explosion shared by the LSH
    banding and prefix-filter candidate generators (both replaced a
    bucket-keyed self-join with groupBy + explode; r13).  The array
    must be sorted and duplicate-free: sortedness makes i < j imply
    id_1 < id_2 with no post-filter, and a duplicate id would fabricate
    a self-pair."""
    c = F.col(ids_col)
    return F.flatten(F.transform(
        c,
        lambda x, i: F.transform(
            F.slice(c, i + 2, F.greatest(F.size(c) - i - 1, F.lit(0))),
            lambda y: F.struct(x.alias("id_1"), y.alias("id_2")),
        ),
    ))


def minhash_bands(
    sig: DataFrame, num_hashes: int = 12, band_size: int = 3,
    id_col: str = "id",
) -> DataFrame:
    """Exploded ``(id, band, bucket)`` view of a signature frame — ONE
    array projection, not a per-band union that would recompute the
    signature aggregation once per band.  The single definition of the
    banding scheme: the batch pair join and the incremental
    new-vs-corpus join both read it, so a band-size or bucket-concat
    change cannot silently desynchronize the dedup family."""
    if num_hashes % band_size:
        # silently banding a PREFIX of the signature would compute a
        # different (r, b) collision curve than the caller asked for —
        # same guard class as simhash_pairs' band check (review finding)
        raise ValueError(
            f"minhash_bands: num_hashes {num_hashes} not divisible by "
            f"band_size {band_size}")
    # '|'-separated: the h columns are decimal longs of varying width,
    # so a bare concat would make ("1","23") and ("12","3") collide
    band_structs = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws("|", *[
                F.col(f"h{b * band_size + i}").cast("string")
                for i in range(band_size)
            ]).alias("bucket"),
        )
        for b in range(num_hashes // band_size)
    ])
    return sig.select(
        F.col(id_col).alias("id"), F.explode(band_structs).alias("bb")
    ).select("id", F.col("bb.band").alias("band"),
             F.col("bb.bucket").alias("bucket"))


def minhash_band_pairs(
    sig: DataFrame, num_hashes: int = 12, band_size: int = 3
) -> DataFrame:
    """LSH banding: docs sharing any band bucket become candidate pairs.

    With k=12, r=3 the collision curve ~ s^3 per band: jaccard 0.9 pairs
    collide w.p. ≥ 95%, jaccard 0.3 pairs w.p. ~10% — the standard
    near-dup operating point.

    Bands come from :func:`minhash_bands` (one array projection).
    Pairs are generated by grouping ids per (band, bucket) and
    exploding in-bucket combinations — NOT a bucket-keyed self-join
    (r13 optimization).  The self-join shape shuffled the band table
    twice (or paid an eager localCheckpoint: without it Catalyst
    re-computed the whole shingle→signature chain for the second join
    side, since a broadcast build side shares no exchange), and the
    join's output is exactly the per-bucket pair cliques this explode
    produces in place.  Same skew envelope: a hot bucket's B² pairs
    landed in ONE join task before and land in one explode task now —
    bucket size is the thing LSH banding keeps small by design; the
    sort_array guarantees id_1 < id_2 without a filter.
    """
    bands = minhash_bands(sig, num_hashes, band_size)
    return (
        bands.groupBy("band", "bucket")
        .agg(F.sort_array(F.collect_list("id")).alias("__ids"))
        .filter(F.size("__ids") >= 2)
        .select(F.explode(_bucket_pair_structs("__ids")).alias("__p"))
        .select(F.col("__p.id_1").alias("id_1"),
                F.col("__p.id_2").alias("id_2"))
        .distinct()
    )


def simhash(sh: DataFrame, bits: int = 64) -> DataFrame:
    """SimHash signature as a bit string.  Default 64 bits matches
    :func:`simhash_pairs`' default (a narrower signature fed to a wider
    pairs call would silently degrade banding — see the width guard
    there); 16 keeps oracle SQL small at test SF.

    Bit b of a shingle = whether md5(b|shingle) starts with a hex digit
    in 0-7 (an unbiased hash-derived coin, no hex→int conversion needed —
    keeps the oracle expressible in plain SQL).  Document bit b = sign of
    the sum of ±1 votes over its shingles.
    """
    votes = [
        F.sum(
            F.when(
                F.substring(F.md5(F.concat(F.lit(f"{b}|"), F.col("shingle"))), 1, 1)
                .isin(*"01234567"),
                1,
            ).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(bits)
    ]
    agg = sh.groupBy("id").agg(*votes)
    bit_cols = [
        F.when(F.col(f"v{b}") > 0, F.lit("1")).otherwise(F.lit("0"))
        for b in range(bits)
    ]
    return agg.select("id", F.concat(*bit_cols).alias("simhash"))


def simhash_pairs(
    sig: DataFrame, bits: int = 64, max_dist: int = 3
) -> DataFrame:
    """Near-dup pairs from SimHash signatures via banded Hamming join.

    The ``bits``-char bit string is split into ``max_dist + 1`` equal
    bands; by pigeonhole, any pair within Hamming distance ``max_dist``
    agrees *exactly* on at least one band, so candidates come from an
    equi-join on (band, chunk) — never a cross join.  Exact Hamming
    distance is then computed on candidates only and filtered.

    Scale: candidate cardinality is sum over buckets of C(bucket_size,2),
    so ``bits`` must track corpus size (64-bit/4×16 for real corpora;
    16-bit keeps the oracle SQL small at test SF).  The shuffle key is
    (band, chunk) — uniform by construction since chunks are hash bits.
    """
    from ..spec import materialize

    nb = max_dist + 1
    if bits % nb:
        raise ValueError("bits must split into max_dist+1 equal bands")
    width = bits // nb
    sig = materialize(sig)  # band explode + two hamming-refine sides
    # width guard: signatures narrower than `bits` make the trailing
    # bands empty strings — every doc collides on (band, "") and the
    # "never a cross join" candidate join silently becomes all-pairs.
    # One tiny agg over the already-materialized frame catches it.
    wid = sig.agg(F.min(F.length("simhash")).alias("lo"),
                  F.max(F.length("simhash")).alias("hi")).first()
    if wid["lo"] is not None and (wid["lo"] != bits or wid["hi"] != bits):
        raise ValueError(
            f"simhash signatures are {wid['lo']}..{wid['hi']} chars but "
            f"bits={bits}; pass the width the signatures were built with")
    band_structs = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.substring("simhash", b * width + 1, width).alias("chunk"),
        )
        for b in range(nb)
    ])
    bands = sig.select("id", F.explode(band_structs).alias("bc")).select(
        "id", F.col("bc.band").alias("band"), F.col("bc.chunk").alias("chunk")
    )
    a = bands.select(F.col("id").alias("id_1"), "band", "chunk")
    b2 = bands.select(F.col("id").alias("id_2"), "band", "chunk")
    cand = (
        a.join(b2, ["band", "chunk"])
        .filter(F.col("id_1") < F.col("id_2"))
        .select("id_1", "id_2")
        .distinct()
    )
    s1 = sig.select(F.col("id").alias("id_1"), F.col("simhash").alias("sh_1"))
    s2 = sig.select(F.col("id").alias("id_2"), F.col("simhash").alias("sh_2"))
    ham = sum(
        F.when(
            F.substring("sh_1", i, 1) != F.substring("sh_2", i, 1), 1
        ).otherwise(0)
        for i in range(1, bits + 1)
    ).cast("long")
    return (
        cand.join(s1, "id_1")
        .join(s2, "id_2")
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_dist)
        .select("id_1", "id_2", "hamming")
    )


def jaccard_pairs(
    sh: DataFrame, min_sim: float = 0.8, block_col: str | None = None,
    plan: str = "prefix",
) -> DataFrame:
    """Exact n-gram jaccard pairs ≥ min_sim (optionally blocked).
    ``sh`` from :func:`shingles`.

    Default plan is PPJoin prefix filtering (:func:`jaccard_pairs_prefix`)
    — the scale-safe candidate generator.  The direct inverted-index
    self-join (``plan="direct"``) shuffles Σ df(gram)² rows, quadratic
    in gram hotness: a 10×-duplicated corpus grew its wall time 9.4×
    (PLANS.md duplication-stress table) where prefix grew 2.6×, and on
    a crawl corpus with real duplication the direct shuffle is a
    skewed-key bomb.  Prefix costs one extra df-ranking pass — ~0.1 s
    over the direct join at sf0.1 where nothing is hot (1.35 s vs
    1.25 s same-session min-of-4, after the r7 plan work: df as a
    COUNT window on the gram key, no checkpoint before the candidate
    self-join) — and degrades gracefully: hot grams sort
    last in the df-order and drop out of every prefix automatically, so
    no routing heuristic is needed.  Auto-routing on a sampled max-df
    estimate (the ``salted_join`` gate pattern) was considered and
    rejected: the regime that blows up the direct join is BROAD
    moderate hotness (df≈10 across most grams, per-gram share ~2e-5),
    which a bounded driver-side sample cannot resolve — estimating
    Σ df² needs a full gram-frequency pass, which is exactly the pass
    the prefix plan already runs as its first step.

    Both plans are equality-tested against each other (sf0.1, the 10×
    stress corpus, a planted every-doc hot gram, and the 8-of-10 float
    boundary — ``tests/test_llm_ops.py``).
    """
    if plan == "prefix":
        return jaccard_pairs_prefix(sh, min_sim, block_col)
    if plan != "direct":
        raise ValueError(f"plan must be 'prefix' or 'direct', got {plan!r}")
    return jaccard_pairs_direct(sh, min_sim, block_col)


def jaccard_pairs_direct(
    sh: DataFrame, min_sim: float = 0.8, block_col: str | None = None
) -> DataFrame:
    """Exact n-gram jaccard pairs ≥ min_sim via inverted-index self-join
    (optionally blocked).  ``sh`` from :func:`shingles`.

    Tiny-data fast path: shuffle is Σ df(gram)², so ONLY safe when no
    gram is hot — prefer :func:`jaccard_pairs` (prefix default)."""
    # NOT materialized (r13): with the narrow shingles() rewrite the
    # per-consumer recompute is a shuffle-free projection, measured
    # cheaper than the eager checkpoint it used to amortize
    blk = [block_col] if block_col else []
    keys = blk + ["shingle"]
    # block-scoped cardinalities, matching jaccard_pairs_prefix: an id
    # under several block values verifies against per-block gram sets
    cards = sh.groupBy(*blk, "id").agg(F.count("*").alias("card"))
    a = sh.select(*blk, F.col("id").alias("id_1"), "shingle")
    b = sh.select(*blk, F.col("id").alias("id_2"), "shingle")
    inter = (
        a.join(b, keys)
        .filter(F.col("id_1") < F.col("id_2"))
        .groupBy(*blk, "id_1", "id_2")
        .agg(F.count("*").alias("inter"))
    )
    c1 = cards.select(*blk, F.col("id").alias("id_1"),
                      F.col("card").alias("card_1"))
    c2 = cards.select(*blk, F.col("id").alias("id_2"),
                      F.col("card").alias("card_2"))
    # unrounded-ratio threshold, matching jaccard_pairs_prefix (the two
    # plans must report the identical pair set at the float boundary)
    return (
        inter.join(c1, blk + ["id_1"])
        .join(c2, blk + ["id_2"])
        .withColumn(
            "__j",
            F.col("inter")
            / (F.col("card_1") + F.col("card_2") - F.col("inter")),
        )
        .filter(F.col("__j") >= min_sim)
        .select("id_1", "id_2",
                round_half_away_col(F.col("__j"), 6).alias("jaccard"))
    )



def _rarest_first_prefix(sh: DataFrame, blk: list, threshold: float):
    """Rarest-first prefix rows (id's first ⌊(1-t)·card⌋+1 grams in
    global-df order) — the ONE copy of the prefix construction shared
    by :func:`jaccard_pairs_prefix` and :func:`containment_pairs`
    (review finding: two drifting copies, both with the same bug).

    ALL windows are block-scoped (``(*blk, ...)``): the rank and the
    cardinality must be computed within the id's rows UNDER THAT BLOCK
    VALUE — partitioning by id alone interleaved blocks in the ranking
    and used a cross-block cardinality, which could starve one block's
    prefix to zero rows for an id appearing under several block values
    and silently drop a qualifying pair (the verify side was already
    block-scoped; review fix).

    +1e-9 before the floor: (1 - t) is already inexact in float
    ((1-0.8)*10 = 1.9999999999999996), and flooring it one short
    SHRINKS the prefix — which silently drops qualifying pairs.  The
    epsilon can only ever LENGTHEN the prefix, which costs candidates,
    never correctness."""
    from pyspark.sql import Window

    wdf = Window.partitionBy(*blk, "shingle")
    w = Window.partitionBy(*blk, "id").orderBy("__df", "shingle")
    wc = Window.partitionBy(*blk, "id")
    return (
        sh.withColumn("__df", F.count("*").over(wdf))
        .select(*blk, "id", "shingle",
                F.row_number().over(w).alias("__rn"),
                F.count("*").over(wc).alias("__card"))
        .filter(F.col("__rn") <=
                F.floor((1.0 - threshold) * F.col("__card") + 1e-9) + 1)
        .select(*blk, "id", "shingle")
    )


def jaccard_pairs_prefix(
    sh: DataFrame, min_sim: float = 0.8, block_col: str | None = None
) -> DataFrame:
    """Exact n-gram jaccard pairs ≥ min_sim via PREFIX FILTERING
    (SSJoin/PPJoin, Chaudhuri et al. / Xiao et al.) — same contract and
    results as :func:`jaccard_pairs`, different candidate generator.

    The inverted-index self-join's shuffle is Σ df(gram)² — quadratic
    in how hot the hottest gram is, which is what blows up on a corpus
    with heavy duplication or stop-phrases.  Prefix filtering restores
    exactness-preserving pruning: under a global gram order (document
    frequency ASC, gram ASC — rarest first), two sets with jaccard ≥ t
    MUST share a gram within both of their first ``⌊(1-t)·|x|⌋ + 1``
    grams.  Proof of the one-sided bound: if the intersection avoids
    x's prefix, then o ≤ |x| - (⌊(1-t)|x|⌋+1) < t·|x| ≤ t·(|x|+|y|-o),
    so J < t; the both-sided form is the standard prefix-filter lemma
    with α = max(⌈t|x|⌉, ⌈t|y|⌉), of which each per-doc prefix is a
    superset.  Hot grams are frequent, so they sort LAST and fall out
    of every prefix — the candidate join touches only rare grams.

    Verification joins each candidate pair to its two sorted gram
    arrays and counts the intersection per row (hash intersect,
    O(card)), so post-filter cost ∝ candidates, not Σ df².
    ``sh`` must be a (id, shingle) SET (the :func:`shingles` default).
    """
    # sh is NOT materialized (r13): the narrow shingles() rewrite made
    # the per-consumer recompute a shuffle-free projection — the eager
    # checkpoint that amortized the old window+distinct chain now costs
    # more than it saves (interleaved A/B at sf0.1: 2.29/3.15 →
    # 1.76/2.41 min/med for the full prefix-jaccard plan)
    blk = [block_col] if block_col else []
    # document frequency is a COUNT window over the gram key inside
    # _rarest_first_prefix, not a groupBy + join back: both shapes
    # shuffle sh once on (block, gram), but the join additionally pays
    # the dfreq aggregation exchange and the join itself — measured
    # 0.92 s vs 0.59 s for this pass at sf0.1.
    prefix = _rarest_first_prefix(sh, blk, min_sim)
    # deliberately NOT materialized before the self-join: the two
    # candidate sides canonicalize to the same exchanges, so Spark's
    # ReusedExchange computes the df/rank windows once — a
    # localCheckpoint here was A/B-measured STRICTLY worse (sf0.1
    # 1.78 s vs 1.35 s; 10x-duplication corpus 10.7 s vs 5.2 s): it
    # pays serialization plus per-scan block deserialization and saves
    # nothing the shuffle reuse wasn't already saving.  (This differs
    # from `sh`, whose consumers sit in SEPARATE queries/branches where
    # no exchange reuse applies.)  The minhash_band_pairs in-bucket
    # pair EXPLOSION was also tried here and rejected by interleaved
    # A/B (sf0.1: join 1.20/1.27 vs explode 1.50/1.76 min/med): prefix
    # postings run longer than LSH buckets and the per-element
    # transform/slice pair build evaluates interpreted, outside
    # codegen, where the join's sorted merge stays vectorized.
    cand = (
        prefix.select(*blk, F.col("id").alias("id_1"), "shingle")
        .join(prefix.select(*blk, F.col("id").alias("id_2"), "shingle"),
              blk + ["shingle"])
        .filter(F.col("id_1") < F.col("id_2"))
        .select(*blk, "id_1", "id_2")
        .distinct()
    )
    # gram sets are BLOCK-SCOPED (grouped on block + id, verify joins
    # carry the block key): candidate generation and __df are
    # block-local, so an id that appears under several block values
    # must verify against its per-block gram set — grouping on id
    # alone would merge cardinalities/intersections across blocks
    # gsets NOT materialized (r13): its two consumers are branches of
    # ONE final plan whose subtrees canonicalize to the same exchange
    # (ReusedExchange), and the upstream sh is now a shuffle-free
    # projection — part of the same measured A/B as the sh checkpoint
    gsets = sh.groupBy(*blk, "id").agg(
        F.sort_array(F.collect_list("shingle")).alias("__g"),
        F.count("*").alias("__card"))
    g1 = gsets.select(*blk, F.col("id").alias("id_1"),
                      F.col("__g").alias("__g1"),
                      F.col("__card").alias("__c1"))
    g2 = gsets.select(*blk, F.col("id").alias("id_2"),
                      F.col("__g").alias("__g2"),
                      F.col("__card").alias("__c2"))
    inter = F.size(F.array_intersect("__g1", "__g2"))
    # threshold on the UNROUNDED ratio (same reasoning as
    # containment_pairs): the prefix-filter proof bounds exact J, so
    # admitting round(J,6) >= t would accept a pair with exact
    # J ∈ [t−5e-7, t) that the candidate generator may legitimately
    # have pruned — the rounded filter and the exact pruning disagree
    # on that boundary sliver.  The reported column stays 6-dp rounded.
    return (
        cand.join(g1, blk + ["id_1"]).join(g2, blk + ["id_2"])
        .withColumn("__j", inter / (F.col("__c1") + F.col("__c2") - inter))
        .filter(F.col("__j") >= min_sim)
        .select("id_1", "id_2",
                round_half_away_col(F.col("__j"), 6).alias("jaccard"))
    )


def containment_pairs(
    sh: DataFrame, min_cont: float = 0.8, block_col: str | None = None,
) -> DataFrame:
    """Asymmetric n-gram CONTAINMENT pairs: all ordered (id_1, id_2)
    with C(1→2) = |g(1) ∩ g(2)| / |g(1)| ≥ ``min_cont`` — the
    sub-document near-dup detector (a short doc pasted inside a long
    one has low jaccard but containment ≈ 1; quote/boilerplate
    inclusion, the Lee et al. 2022 motivation for substring-level
    dedup at corpus granularity).  ``sh`` from :func:`shingles`
    (a (id, shingle) SET).

    Candidate generation is one-sided prefix filtering on the
    CONTAINED side (the same global rarest-first gram order as
    :func:`jaccard_pairs_prefix`): if the intersection avoids id_1's
    first ``⌊(1-t)·|g(1)|⌋ + 1`` grams then
    o ≤ |g(1)| − (⌊(1-t)|g(1)|⌋+1) < t·|g(1)|, so C < t — exactness
    preserved.  The container side joins with its FULL posting list
    (containment admits no pruning there: a huge container is a valid
    match), so the candidate shuffle is Σ_g df_prefix(g)·df(g) — hot
    grams still fall out of every PREFIX, which caps the quadratic
    term at hot-gram df × rare-prefix df instead of df².
    Verification is the same per-pair sorted-array intersect, cost ∝
    candidates."""
    # sh / gsets NOT materialized (r13): same reasoning and A/B as
    # jaccard_pairs_prefix — the narrow shingles() recompute is cheaper
    # than the eager checkpoints it used to amortize
    blk = [block_col] if block_col else []
    prefix = _rarest_first_prefix(sh, blk, min_cont)
    cand = (
        prefix.select(*blk, F.col("id").alias("id_1"), "shingle")
        .join(sh.select(*blk, F.col("id").alias("id_2"), "shingle"),
              blk + ["shingle"])
        .filter(F.col("id_1") != F.col("id_2"))
        .select(*blk, "id_1", "id_2")
        .distinct()
    )
    # BLOCK-SCOPED gram sets (grouped on block + id, verify joins on
    # block + id): candidates and __df are block-local, so grouping on
    # id alone would merge cardinalities and intersections across
    # blocks for any id appearing under several block values
    gsets = sh.groupBy(*blk, "id").agg(
        F.sort_array(F.collect_list("shingle")).alias("__g"),
        F.count("*").alias("__card"))
    g1 = gsets.select(*blk, F.col("id").alias("id_1"),
                      F.col("__g").alias("__g1"),
                      F.col("__card").alias("__c1"))
    g2 = gsets.select(*blk, F.col("id").alias("id_2"),
                      F.col("__g").alias("__g2"))
    inter = F.size(F.array_intersect("__g1", "__g2"))
    # threshold on the UNROUNDED ratio: the prefix-filter proof bounds
    # exact C, so admitting round(C,6) >= t would let a pair with
    # C ∈ [t−5e-7, t) pass the filter while (legitimately) having been
    # pruned from the candidates — reported value stays 6-dp rounded
    return (
        cand.join(g1, blk + ["id_1"]).join(g2, blk + ["id_2"])
        .withColumn("__c", inter / F.col("__c1"))
        .filter(F.col("__c") >= min_cont)
        .select("id_1", "id_2",
                round_half_away_col(F.col("__c"), 6).alias("containment"))
    )


def overlap_spans(
    df: DataFrame, id_col: str, text_col: str, k: int = 8,
    min_len: int | None = None, max_df: int | None = None,
    other: DataFrame | None = None,
) -> DataFrame:
    """Exact k-token overlap spans between document pairs — the
    exact-substring dedup of Lee et al. ("Deduplicating Training Data
    Makes Language Models Better", which builds a suffix array)
    re-expressed relationally: a match of L ≥ k consecutive shared
    tokens produces k-gram hash anchors at every offset, so maximal
    spans are the classic gaps-and-islands grouping of anchors along
    each (id_1, id_2, diagonal) where diagonal = pos_1 − pos_2.

    Returns (id_1, id_2, start_1, start_2, length) with id_1 < id_2,
    token positions 0-based, ``length`` in tokens (≥ k; ≥ ``min_len``
    if given).  A span means tokens[start_1 : start_1+length] of doc 1
    == tokens[start_2 : start_2+length] of doc 2 exactly.

    Scale: one token explode + one windowed k-gram projection per
    document (both ∝ tokens), an equi-join on the k-gram hash whose
    shuffle is Σ df(gram)² — for EXACT k-token grams df ≈ 1 except on
    true duplication/boilerplate, which is the pair mass the operator
    exists to surface.  ``max_df`` caps pathological boilerplate grams
    (a df-capped gram can only split a reported span, never invent
    one — and a span ALL of whose anchors have df ≤ max_df returns
    exactly, so recall of rare-anchor mass is 1.0; both pinned
    quantitatively in ``tests/test_llm_ops.py::
    test_overlap_spans_max_df_recall_bound``).  The islands merge is a per-(pair, diagonal) window over
    anchor counts — rows ∝ matching anchors, not corpus size.

    ``other``: cross-corpus mode — spans between ``df`` documents
    (``id_1`` side) and ``other`` documents (``id_2`` side, same
    id/text column names), with no id-order filter.  This is exact
    decontamination WITH EVIDENCE: each benchmark document's verbatim
    occurrences in the training corpus, located to the token.  The
    ``max_df`` cut then applies per side.
    """
    from pyspark.sql import Window

    from ..spec import materialize

    def kgrams(frame: DataFrame, reused: bool) -> DataFrame:
        # narrow bound-array k-gram stream (r13 — the shingles()
        # rewrite): the old posexplode + window ``lead`` shape shuffled
        # the whole token stream on id before hashing
        base = repartition_unsplittable(frame, id_col).select(
            F.col(id_col).alias("id"),
            norm_tokens(F.col(text_col)).alias("__tk"),
        )
        tk = F.col("__tk")
        cnt = F.greatest(F.size(tk) - (k - 1), F.lit(0))
        idx = F.when(cnt >= 1, F.sequence(F.lit(0), cnt - 1)) \
            .otherwise(F.array().cast("array<int>"))
        garr = F.transform(
            idx,
            lambda i: F.struct(
                i.alias("pos"),
                F.md5(F.concat_ws(
                    " ", *[F.element_at(tk, i + j + 1) for j in range(k)]
                )).alias("h"),
            ),
        )
        kg = (
            base.select("id", F.explode(garr).alias("__g"))
            .select("id", F.col("__g.pos").alias("pos"),
                    F.col("__g.h").alias("h"))
        )
        # materialize BEFORE the heavy-gram cut, but only when something
        # actually consumes kg twice (the df aggregation + anti-join
        # probe when max_df is set, or both sides of the self-join) —
        # an eager corpus-sized pin buys nothing in single-consumer
        # cross-corpus mode and risks storage eviction at scale.
        if max_df is not None:
            kg = materialize(kg)
            heavy = kg.groupBy("h").agg(F.count("*").alias("df")) \
                      .filter(F.col("df") > max_df)
            # no broadcast hint: heavy is tiny for sane max_df, but its
            # size is corpus-dependent (up to total_grams/max_df rows on
            # boilerplate-dominated corpora); let AQE pick broadcast vs
            # shuffle from the measured size instead of forcing a
            # driver collect that can blow the broadcast limit.
            kg = kg.join(heavy.select("h"), "h", "left_anti")
        elif reused:
            kg = materialize(kg)
        return kg

    kg = kgrams(df, reused=other is None)
    kg2 = kg if other is None else kgrams(other, reused=False)
    anchors = (
        kg.select(F.col("id").alias("id_1"), F.col("pos").alias("pos_1"), "h")
        .join(kg2.select(F.col("id").alias("id_2"),
                         F.col("pos").alias("pos_2"), "h"), "h")
    )
    if other is None:
        anchors = anchors.filter(F.col("id_1") < F.col("id_2"))
    anchors = anchors.select("id_1", "id_2", "pos_1", "pos_2")
    diag = (F.col("pos_1") - F.col("pos_2")).alias("diag")
    wrun = Window.partitionBy("id_1", "id_2", diag).orderBy("pos_1")
    spans = (
        anchors.withColumn("__rn", F.row_number().over(wrun))
        .groupBy("id_1", "id_2", diag,
                 (F.col("pos_1") - F.col("__rn")).alias("__grp"))
        .agg(F.min("pos_1").alias("start_1"), F.max("pos_1").alias("__end"))
        .select(
            "id_1", "id_2",
            F.col("start_1").cast("long").alias("start_1"),
            (F.col("start_1") - F.col("diag")).cast("long").alias("start_2"),
            (F.col("__end") - F.col("start_1") + k).cast("long")
             .alias("length"))
    )
    if min_len is not None:
        spans = spans.filter(F.col("length") >= min_len)
    return spans


def excise_overlap_spans(
    df: DataFrame, id_col: str, text_col: str, k: int = 8,
    min_len: int | None = None, max_df: int | None = None,
) -> DataFrame:
    """Cross-document exact-duplicate span EXCISION (the second half of
    Lee et al.'s exact-substring dedup): every span reported by
    :func:`overlap_spans` is cut from the HIGHER-id document of its
    pair, so the lowest-id occurrence of any duplicated run survives —
    deterministic keep-first semantics, the same rule the exact-dup
    collapse uses.

    Returns (id, text, n_cut_tokens) for EVERY input document
    (untouched docs carry n_cut_tokens = 0 and their normalized text).
    Text is rebuilt from the kept tokens, whitespace-normalized but
    CASE-PRESERVING: detection matches on lowercased k-grams (like the
    rest of the dedup stack), but token positions are identical either
    way, so reconstruction reads the original-case token at each kept
    position — excision must not destroy the corpus's casing.

    Plan: spans aggregate to one interval array per losing doc (rows ∝
    docs that lose a span), joined back to the corpus on doc id — left
    to AQE, which broadcasts the interval side while it fits the 64 MB
    threshold and falls back to a shuffle join on a pathologically
    duplicated corpus.  The cut itself is a higher-order-function
    filter over the token array INSIDE codegen — position ∉ any
    interval — so there is no per-token shuffle anywhere.
    """
    spans = overlap_spans(df, id_col, text_col, k, min_len, max_df)
    cuts = (
        spans.groupBy(F.col("id_2").alias("__cut_id"))
        .agg(F.collect_list(
            F.struct(F.col("start_2").alias("s"),
                     (F.col("start_2") + F.col("length") - 1).alias("e"))
        ).alias("__iv"))
    )
    toks = df.select(
        F.col(id_col).alias("id"),
        ws_tokens(F.col(text_col)).alias("__t"),
    )
    pos_structs = F.expr(
        "transform(__t, (x, i) -> struct(x as tok, i as pos))")
    kept = F.expr(
        "filter(__pt, p -> __iv is null or "
        "not exists(__iv, iv -> p.pos >= iv.s and p.pos <= iv.e))")
    return (
        toks.join(cuts, F.col("id") == F.col("__cut_id"), "left")
        .withColumn("__pt", pos_structs)
        .withColumn("__kept", kept)
        .select(
            "id",
            F.array_join(F.expr("transform(__kept, p -> p.tok)"), " ")
             .alias("text"),
            (F.size("__pt") - F.size("__kept")).cast("long")
             .alias("n_cut_tokens"))
    )


def remove_frequent_ngrams(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    min_doc_freq: int = 3,
) -> DataFrame:
    """Boilerplate removal, CCNet-style but at word n-gram granularity:
    drop every word covered by an ``n``-gram that occurs in at least
    ``min_doc_freq`` distinct documents (headers, footers, license
    blurbs — any span the corpus repeats verbatim).

    Plan (all JVM codegen, no UDFs):

    1. per-doc ``(start, gram)`` pairs via ``transform(sequence)`` +
       ``slice`` — no shuffle;
    2. doc-frequency per gram: one shuffle on ``xxhash64(gram)``,
       map-side partial distinct;
    3. frequent grams (df ≥ threshold) semi-join back — shuffle keyed
       on the same gram hash, typically tiny right side (AQE broadcasts
       it when it is);
    4. covered word positions collapse to ONE array row per document
       (``collect_set`` — the only remaining token-scale shuffle);
    5. reassembly is pure per-row array algebra: kept positions =
       ``array_except(sequence(0, nw-1), covered)`` (hash-set
       difference, order-preserving, O(tokens)), words re-looked-up by
       ``element_at`` — no word explode, no positional anti-join, no
       ``collect_list`` re-sort.

    Three token-scale shuffles total (the gram window sort, the
    doc-frequency aggregation, the frequent-gram semi-join probe) plus
    a coverage-scale collapse — the join-based formulation additionally
    paid a positional anti-join and a collect_list re-sort, both token-
    scale; the per-document rebuild stays linear in tokens.  The 64-bit
    gram hash trades a ~1e-11 collision chance for not shuffling raw
    gram strings at 100 TB.
    """
    from pyspark.sql import Window

    from ..spec import materialize

    # whitespace-CLASS tokenization (the stack-wide ws_tokens kernel),
    # not a raw single-space split: the same license blurb repeated
    # with a tab or newline where another copy has a space must produce
    # the same grams, and 'a  b' must be two words, not
    # ['a', '', 'b'] — raw split both missed boilerplate and inflated
    # n_words_before with empty-string tokens (review batch).
    # Case-preserving (not norm_tokens): the docstring's contract is
    # VERBATIM repetition, and the kept words rebuild clean_text.
    toks = ws_tokens(F.col(text_col))
    # gram stream as ONE NARROW per-row projection over the BOUND token
    # array (r13 — the shingles() rewrite): the old posexplode + window
    # ``lead`` shape shuffled the whole token stream on id first.  (The
    # earlier "transform is ~2x slower" measurement was the UNBOUND
    # lambda re-evaluating the tokenizer chain per element — binding
    # __tk in its own projection fixes that; see shingles().)
    # grams feed BOTH the doc-frequency aggregation and the coverage
    # semi-join — materialize the explode once instead of running the
    # token-scale pass per consumer (Spark shares no identical subplans
    # across branches).
    gbase = repartition_unsplittable(df, id_col).select(
        F.col(id_col), toks.alias("__tk"))
    tk = F.col("__tk")
    gcnt = F.greatest(F.size(tk) - (n - 1), F.lit(0))
    gidx = F.when(gcnt >= 1, F.sequence(F.lit(0), gcnt - 1)) \
        .otherwise(F.array().cast("array<int>"))
    garr = F.transform(
        gidx,
        lambda i: F.struct(
            i.alias("pos"),
            F.concat_ws(
                " ", *[F.element_at(tk, i + j + 1) for j in range(n)]
            ).alias("gram"),
        ),
    )
    grams = materialize(
        gbase.select(id_col, F.explode(garr).alias("__g"))
        .select(id_col, F.col("__g.pos").alias("pos"),
                F.xxhash64("__g.gram").alias("gram_hash"))
    )
    frequent = (
        grams.groupBy("gram_hash")
        .agg(F.countDistinct(id_col).alias("doc_freq"))
        .filter(F.col("doc_freq") >= min_doc_freq)
        .select("gram_hash")
    )
    # collect_set dedupes overlapping-gram positions as part of the
    # same (map-side combinable) shuffle that collapses coverage to one
    # row per document
    covered = (
        grams.join(frequent, "gram_hash", "left_semi")
        .select(id_col,
                F.explode(F.sequence(F.col("pos"),
                                     F.col("pos") + (n - 1))).alias("wpos"))
        .groupBy(id_col)
        .agg(F.collect_set("wpos").alias("__cov"))
    )
    # split() never yields an empty array (splitting "" gives [""]), but
    # guard anyway: sequence(0, -1) would count DOWN, not produce []
    kept = F.array_except(
        F.when(F.size("__toks") > 0,
               F.sequence(F.lit(0), F.size("__toks") - 1))
         .otherwise(F.array().cast("array<int>")),
        F.coalesce(F.col("__cov"), F.array().cast("array<int>")),
    )
    return (
        df.select(F.col(id_col), toks.alias("__toks"))
        .join(covered, id_col, "left")
        .select(
            id_col,
            F.array_join(
                F.transform(kept, lambda p: F.element_at(
                    F.col("__toks"), p + 1)), " ").alias("clean_text"),
            F.size("__toks").cast("bigint").alias("n_words_before"),
            F.size(kept)
             .cast("bigint").alias("n_words_after"),
        )
    )


def semantic_keep(
    vectors: DataFrame,
    min_sim: float = 0.3,
    n_centroids: int = 8,
    iters: int = 2,
    sample_mod: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cell_pairs: int | None = None,
    exact_prepass: bool = True,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by clustering embeddings with k-means and removing
    near-duplicates WITHIN each cluster — the cluster assignment is the
    blocking key, so the pair join is |cell|²·k instead of n².

    Keep rule (greedy, same convention as the LSH dedup paths here): a
    vector is dropped when a LOWER-id vector in its cell has cosine
    ≥ ``min_sim`` to it; the witness reported is the smallest such id.
    This is the neighbor-graph keep-first rule, not a transitive
    closure — a chain a~b~c with a≁c keeps a AND c (each dropped row
    has a direct witness; pair it with connected components when
    ball-collapse semantics are wanted).

    Scale: the k-means fit trains on a bounded sample and iterates
    driver-side (see :func:`..ann.kmeans_centroids`); the full corpus
    is assigned in ONE shuffle-free pass against the closure-held
    centroid matrix; the self-join shuffles on the cell id — at 100 TB
    raise ``n_centroids`` so cells stay bounded (SemDeDup's own
    production setting: tens of thousands of clusters).  Cosines round
    to 6 dp before thresholding (cross-engine float discipline).

    Output: one row per vector — (vec_id, cell, kept, witness,
    witness_cos) — so the oracle checks the full decision, not just
    the survivor count.

    ``exact_prepass`` (default True, round-8 verdict item): identical
    vectors collapse to their min-id class representative BEFORE the
    quadratic in-cell pair join — exact/near-exact copies co-locate by
    construction, and the measured pathology (tools/stress_semdedup.py:
    10× duplication ⇒ 41.9× wall without the pre-pass) is quadratic in
    the duplicate-class size.  The collapse is exact, not approximate:
    a non-rep member of a class is always dropped with witness
    ``coalesce(rep's witness, rep)`` — the rep is the smallest id in
    the class, so the original rule's smallest qualifying witness for
    any member is the rep's own witness when the rep is dropped, else
    the rep itself; and the reps-only pair join loses no witnesses
    because the smallest qualifying id for any rep is itself a rep
    (a non-rep qualifier's class rep has the same vector and a smaller
    id).  Classes whose self-cosine fails the threshold (zero vectors →
    NaN cosine, excluded by the NaN-safe comparisons below, or
    min_sim > 1) don't collapse and ride through as individual rows,
    preserving the keep-everything outcome — matching the oracle,
    where the zero-vector cosine is NULL and fails the filter.

    ``max_cell_pairs``: fail-loud guard against residual in-cell
    blow-up AFTER the exact collapse (distinct-vector mass in one
    cell).  When set, one cheap cell-count aggregate runs first and a
    ``ValueError`` names the hot cells if Σ n·(n−1)/2 over cells
    exceeds the bound — the counted-before-joined discipline; the fix
    is more centroids or a higher τ.  None (default) adds no extra job.
    """
    from ..spec import materialize
    from .ann import assign_cells, cosine, kmeans_centroids

    cents = kmeans_centroids(
        vectors, n_centroids, iters, id_col, vec_col, sample_mod=sample_mod)
    # assigned feeds both pair-join sides AND the final left join —
    # materialize so the corpus is scanned + UDF-assigned once, not 3×.
    # The bigint cast applies ONLY to numeric cell ids: assign_cells
    # keeps the corpus id's native type, and casting a STRING-keyed
    # corpus's cells would NULL every one of them — NULL join keys
    # never match, so zero candidate pairs and every near-duplicate
    # silently reported kept (review batch).
    numeric_cell = dict(cents.dtypes)["cent_id"] not in ("string", "binary")
    assigned = assign_cells(vectors, cents, id_col, vec_col)
    if numeric_cell:
        assigned = assigned.withColumn("cell", F.col("cell").cast("bigint"))
    assigned = materialize(assigned)
    member = None
    if exact_prepass:
        cls = (assigned.groupBy("cell", "cv")
               .agg(F.min("vec_id").alias("rep_id")))
        member = materialize(
            assigned.join(cls, ["cell", "cv"])
            .withColumn("self_cos", cosine(F.col("cv"), F.col("cv")))
            .withColumn(
                "collapsed",
                # NaN-SAFE: cosine() yields numpy NaN (not NULL) for a
                # zero vector, and Spark orders NaN ABOVE every double,
                # so a bare >= would collapse zero-vector classes — the
                # inverse of the documented keep-everything outcome and
                # of the oracle's NULL-fails-the-filter (review fix)
                (F.col("vec_id") != F.col("rep_id"))
                & F.coalesce(
                    ~F.isnan("self_cos")
                    & (F.col("self_cos") >= F.lit(min_sim)),
                    F.lit(False)))
        )
        reps = member.filter(~F.col("collapsed")) \
            .select("vec_id", "cell", "cv")
    else:
        reps = assigned
    if max_cell_pairs is not None:
        sizes = reps.groupBy("cell").agg(F.count("*").alias("n"))
        total = sizes.agg(F.sum(
            F.col("n") * (F.col("n") - 1) / 2).alias("p")).collect()[0]["p"]
        if total and total > max_cell_pairs:
            hot = [
                (r["cell"], r["n"])
                for r in sizes.orderBy(F.col("n").desc()).limit(3).collect()
            ]
            raise ValueError(
                f"semantic_keep: {int(total)} in-cell pairs exceeds "
                f"max_cell_pairs={max_cell_pairs}; hottest cells "
                f"(cell, members)={hot} — raise n_centroids or raise "
                f"min_sim")
    a = reps.select(F.col("vec_id").alias("id_a"), "cell",
                    F.col("cv").alias("va"))
    b = reps.select(F.col("vec_id").alias("id_b"), "cell",
                    F.col("cv").alias("vb"))
    # pairs feeds the witness argmin AND its cosine lookup join
    pairs = materialize(
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_b", "id_a", cosine(F.col("va"), F.col("vb")).alias("cos"))
        # NaN-safe for the same reason as `collapsed` above
        .filter(~F.isnan("cos") & (F.col("cos") >= min_sim))
    )
    wit = (pairs.groupBy("id_b").agg(F.min("id_a").alias("witness"))
           .alias("w"))
    witc = (
        wit.join(pairs.alias("p"),
                 (F.col("w.id_b") == F.col("p.id_b"))
                 & (F.col("p.id_a") == F.col("w.witness")))
        .select(F.col("w.id_b").alias("id_b"), F.col("w.witness")
                .alias("witness"), F.col("p.cos").alias("witness_cos"))
    )
    if not exact_prepass:
        return (
            assigned.join(witc, assigned["vec_id"] == witc["id_b"], "left")
            .select(
                "vec_id", "cell",
                F.col("witness").isNull().alias("kept"),
                "witness", "witness_cos",
            )
        )
    # re-attach every member to its verdict row: a collapsed member
    # follows its class representative's verdict (witness = the rep's
    # witness when the rep is itself dropped, else the rep; cos = the
    # rep's witness cosine, else the class self-cosine), a non-collapsed
    # row follows its own
    rep_verdict = witc.select(
        F.col("id_b").alias("v_key"),
        F.col("witness").alias("v_witness"),
        F.col("witness_cos").alias("v_cos"),
    )
    keyed = member.withColumn(
        "v_key",
        F.when(F.col("collapsed"), F.col("rep_id")).otherwise(
            F.col("vec_id")))
    return (
        keyed.join(rep_verdict, "v_key", "left")
        .select(
            "vec_id", "cell",
            F.when(F.col("collapsed"), F.lit(False))
            .otherwise(F.col("v_witness").isNull()).alias("kept"),
            F.when(F.col("collapsed"),
                   F.coalesce(F.col("v_witness"), F.col("rep_id")))
            .otherwise(F.col("v_witness")).alias("witness"),
            F.when(F.col("collapsed"),
                   F.coalesce(F.col("v_cos"), F.col("self_cos")))
            .otherwise(F.col("v_cos")).alias("witness_cos"),
        )
    )
