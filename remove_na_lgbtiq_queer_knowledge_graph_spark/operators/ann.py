"""Approximate-nearest-neighbor operators over embedding columns
(BASELINE.json scale extensions: similarity search).

Embeddings are ``array<float>`` columns.  All arithmetic casts to double
*before* multiplying (float math differs across engines; double products
of float inputs are exact), folds in index order, and rounds the final
cosine to 6 decimals — so results are bit-stable and oracle-checkable.

- ``brute_force_topk``: exact baseline — queries × corpus join, cosine,
  window top-k.  Fine when |queries| is modest; at 100 TB corpus scale
  broadcast the queries and the scan stays one pass, no shuffle of the
  corpus.
- ``bucketed_topk``: sign-bit (axis-aligned LSH) bucketing — candidates
  share the leading-dimension sign pattern, top-k within bucket.  The
  recall/cost dial is ``n_bits``; an IVF-style coarse quantizer would
  slot in the same shape (bucket id = nearest centroid).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dvec(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Index-ordered fold of elementwise double products."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def _pair_cosine_np():
    """Arrow-batched cosine over (vec, vec) pairs.

    Catalyst's higher-order functions (``zip_with`` + ``aggregate``)
    evaluate interpreted, one boxed element at a time — measured ~1 s
    per 5M element-ops on the ANN paths.  This pandas UDF computes the
    SAME fold: vectorized across the pair batch, sequential over
    dimensions, so per pair the additions run in index order —
    ``acc_d = acc_{d-1} + x_d·y_d`` — bit-identical to the expression
    fold and to DuckDB's sequential ``list_dot_product``.  The rounding
    that pins cross-engine drift stays OUTSIDE in JVM ``F.round``, so
    swapping the transport layer cannot move a score.

    Requires equal-length vectors within a batch (any real embedding
    column is fixed-dim); falls back to a per-row fold on ragged input.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # No type hints: `from __future__ import annotations` stringifies
    # them and pandas_udf can't resolve locals; hint-less defaults to
    # the scalar eval type, which is what this is.
    def pair_cosine(a, b):
        import numpy as np

        if len(a) == 0:
            return pd.Series([], dtype="float64")
        try:
            A = np.stack(a.to_numpy())
            B = np.stack(b.to_numpy())
        except ValueError:  # ragged — per-row index-order fold
            out = []
            for va, vb in zip(a, b):
                # zip would silently TRUNCATE to the shorter vector (a
                # cosine over a prefix, no error) where the oracle's
                # list_dot_product errors on unequal lengths — loud
                # matches loud (review batch)
                if len(va) != len(vb):
                    raise ValueError(
                        f"_pair_cosine_np: mismatched vector dims "
                        f"{len(va)} vs {len(vb)}")
                acc = na = nb = 0.0
                for x, y in zip(va, vb):
                    acc += x * y
                    na += x * x
                    nb += y * y
                denom = (na ** 0.5) * (nb ** 0.5)
                # pure-Python 0.0/0.0 RAISES where the vectorized path
                # yields the NaN every downstream ~isnan guard expects
                out.append(acc / denom if denom != 0.0 else float("nan"))
            return pd.Series(out, dtype="float64")
        if A.shape[1] != B.shape[1]:
            # uniform-within-column but mismatched ACROSS columns: the
            # d-loop below would silently score a prefix (found while
            # pinning the ragged-path guard — same defect, vectorized)
            raise ValueError(
                f"_pair_cosine_np: mismatched vector dims "
                f"{A.shape[1]} vs {B.shape[1]}")
        dots = np.zeros(len(A))
        na = np.zeros(len(A))
        nb = np.zeros(len(A))
        for d in range(A.shape[1]):
            x = A[:, d]
            y = B[:, d]
            dots = dots + x * y
            na = na + x * x
            nb = nb + y * y
        return pd.Series(dots / (np.sqrt(na) * np.sqrt(nb)))

    return pandas_udf(pair_cosine, "double")


_PAIR_COSINE = None


# Canonical JVM-side half-away rounding (matches DuckDB's round and
# the numpy/scalar forms below; see functions/numeric.py for the
# F.round shortest-repr hazard this exists to close — round-9 fuzz
# caught the divergence on this module's coarse-valued ADC sums).
from ..functions.numeric import round_half_away_col  # noqa: E402


def cosine(a: Column, b: Column) -> Column:
    global _PAIR_COSINE
    if _PAIR_COSINE is None:
        _PAIR_COSINE = _pair_cosine_np()
    return round_half_away_col(_PAIR_COSINE(a, b), 6)


# NOTE (r13, measured and REJECTED): marking the pair-cosine UDF
# non-deterministic at the filter-on-score sites (the guide-§4.4 fix
# for the duplicated ArrowEvalPython visible in cosine_dup_pairs'
# plan) made the query SLOWER on Spark 4.1.2 — interleaved A/B at
# sf0.1: 1.42/1.51 min/med duplicated vs 2.04/2.23 fenced.  Plan
# reading: with the marker, the filter's copy and the projection's
# copy of the expression can no longer be CSE'd and land as TWO udf
# slots in ONE ArrowEvalPython node BELOW the filter — every pair
# pays the kernel twice — while the "duplicated" plan's second eval
# runs only on filter SURVIVORS (N + K·selectivity < 2N whenever the
# score filter prunes).  The duplicated shape is the cheaper one at
# every scale here; do not re-apply the marker blindly.


def _nan_score_to_null(c: Column) -> Column:
    """NaN score (zero vector: cosine 0/0) → NULL before any rank/emit.

    Spark's ``DESC`` orders NaN ABOVE every double while the oracle's
    ``0/0`` is NULL and sorts LAST (DuckDB default NULLS LAST, same as
    Spark's ``desc``) — a NaN reaching the rank window would take rk=1
    and displace genuinely better candidates.  In practice the pandas→
    Arrow boundary already surfaces the scorers' NaN as NULL (pandas
    float64 uses NaN as its null sentinel — verified live), so this is
    DEFENSE IN DEPTH: the NULLS-LAST contract must not silently depend
    on a transport-layer conversion detail, and any future JVM-side
    score expression gets the same semantics (review batch; the
    filter-path twins ``cosine_dup_pairs``/``semantic_keep`` guard
    their comparisons the same way)."""
    return F.when(F.isnan(c), F.lit(None).cast("double")).otherwise(c)


def brute_force_topk(
    vectors: DataFrame, queries: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: for each query vector, the k nearest corpus
    vectors (excluding itself).

    The scale shape: the query set ships in the scorer's closure
    (bounded — same contract as a broadcast join build side), the corpus
    streams through ONE ``mapInPandas`` pass that scores a whole Arrow
    batch against all queries as a matrix and emits only its LOCAL
    top-k per query, and the final merge ranks |batches|·|q|·k rows —
    never the |corpus|·|q| cross product.  Dot/norms accumulate
    sequentially over dimensions (index-order fold, bit-identical to
    ``list_dot_product``); rounding to 6 decimals happens half-away-
    from-zero INSIDE the scorer so the local prune uses exactly the
    (cos_sim DESC, cand_id) total order the global rank uses — pruning
    on unrounded scores could drop a row that re-ties after rounding.

    SIZE CONTRACT: the QUERY set (and only the query set) is collected
    to the driver and shipped in every task's closure — it must fit the
    same budget as a broadcast join build side (rule of thumb ≤ ~10 MB
    / low-millions of floats; |q|·dim·8 bytes).  The CORPUS side is
    never collected.  A query set that outgrows broadcast belongs on
    the cogrouped path instead: :func:`ivf_topk` shuffles queries to
    their probed cells and scores them cogrouped, with no driver-side
    query materialization beyond the centroid table.
    """
    import numpy as np
    import pandas as pd

    c = vectors.select(
        F.col(id_col).alias("cand_id"), _dvec(vec_col).alias("cv"))
    id_type = c.schema["cand_id"].dataType.simpleString()
    out_schema = f"query_id {id_type}, cand_id {id_type}, cos_sim double"
    # ids keep their NATIVE type end to end (no long cast) — string or
    # numeric ids compare apples-to-apples in the self-exclusion test
    # and in the output schema
    q_rows = sorted(
        (r["i"], [float(x) for x in r["v"]])
        for r in queries.select(
            F.col(id_col).alias("i"), _dvec(vec_col).alias("v")).collect()
    )
    if not q_rows:
        return vectors.sparkSession.createDataFrame(
            [], out_schema + ", rk long")
    qids = np.array([r[0] for r in q_rows])
    Q = np.array([r[1] for r in q_rows], dtype="float64")

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            A = np.stack(pdf["cv"].to_numpy()).astype("float64")
            cids = pdf["cand_id"].to_numpy()
            sims = _round_half_away(_seq_cosine(A, Q))
            out_q, out_c, out_s = [], [], []
            for j in range(len(Q)):
                s = sims[:, j]
                keep = cids != qids[j]
                order = np.lexsort((cids[keep], -s[keep]))[:k]
                kc = cids[keep][order]
                out_q.extend([qids[j]] * len(kc))
                out_c.extend(kc)
                out_s.extend(s[keep][order])
            yield pd.DataFrame({
                "query_id": pd.Series(np.array(out_q, dtype=qids.dtype)),
                "cand_id": pd.Series(np.array(out_c, dtype=cids.dtype)),
                "cos_sim": pd.Series(out_s, dtype="float64"),
            })

    local = c.mapInPandas(score, out_schema) \
        .withColumn("cos_sim", _nan_score_to_null(F.col("cos_sim")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("cand_id")
    )
    return (
        local.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select("query_id", "cand_id", "cos_sim", "rk")
    )


def sign_bucket(vec_col: str | Column, n_bits: int = 8) -> Column:
    """Axis-aligned LSH bucket: sign bits of the first ``n_bits`` dims."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    bits = [
        F.when(F.element_at(c, i + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(n_bits)
    ]
    return F.concat(*bits)


def bucketed_topk(
    vectors: DataFrame, queries: DataFrame, k: int = 3, n_bits: int = 8,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k among same-bucket candidates.  The bucket equi-join
    replaces the cross join — cost scales with bucket occupancy (n/2^bits
    expected), the classic recall-for-throughput trade."""
    q = queries.select(
        F.col(id_col).alias("query_id"), _dvec(vec_col).alias("qv"),
        sign_bucket(vec_col, n_bits).alias("bucket"),
    )
    c = vectors.select(
        F.col(id_col).alias("cand_id"), _dvec(vec_col).alias("cv"),
        sign_bucket(vec_col, n_bits).alias("bucket"),
    )
    scored = (
        c.join(q, "bucket")
        .filter(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id",
                _nan_score_to_null(
                    cosine(F.col("qv"), F.col("cv"))).alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("cand_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select("query_id", "cand_id", "cos_sim", "rk")
    )


def ivf_topk(
    vectors: DataFrame, queries: DataFrame, k: int = 3,
    n_centroids: int = 16, n_probe: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-style ANN: coarse-quantize the corpus into centroid cells,
    probe the ``n_probe`` nearest cells per query, exact top-k within
    the candidate union.

    ``centroids`` is any small ``(cent_id, cent_v)`` frame with
    ORDERABLE ids (string or numeric — ids keep their native type end
    to end; assignment and probing argmax over INDICES and map back) —
    :func:`kmeans_centroids` fits one distributed and deterministically;
    the default (the ``n_centroids`` lowest-id corpus vectors) keeps the
    zero-fit path oracle-checkable.  Every other step is identical.

    Scale notes: the centroid matrix rides in the UDF closures, so cell
    assignment is one corpus pass with no shuffle and probe selection is
    one query pass with no crossJoin and no window; the probe join
    replaces the cross join with an equi-join on cell id — cost
    ~ n·n_probe/n_centroids candidates per query, the IVF
    recall/throughput dial.

    One rounding kernel governs the whole operator: probe ranking, cell
    assignment, and candidate scoring all round half-away-from-zero in
    numpy (:func:`_round_half_away`) before any argmax/ordering, so a
    near-tie cannot resolve differently between probe choice and
    assignment (JVM ``F.round`` goes through BigDecimal and can differ
    from the float-scaled form by one ulp on adversarial inputs).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # default seeding = the n_centroids LOWEST-id vectors (TakeOrdered,
    # no full sort) — the previous `id < n_centroids` filter assumed
    # dense numeric ids starting at 0: on string ids the implicit cast
    # NULLed every row (empty centroid matrix -> IndexError in the
    # scorer) and on sparse/offset ids it silently under-filled the
    # centroid set (review finding; mirrors the fit-path oracles'
    # ORDER BY vec_id LIMIT k)
    cents = centroids if centroids is not None else \
        vectors.select(
            F.col(id_col).alias("cent_id"), _dvec(vec_col).alias("cent_v")
        ).orderBy("cent_id").limit(n_centroids)
    # Centroid frame is small by contract — collect once, sort by id so
    # index order == the (sim DESC, cent_id ASC) tie-break order, and
    # keep ids in their NATIVE type (mapped back via an array literal).
    cent_rows = sorted(
        ((r["cent_id"], [float(x) for x in r["cent_v"]])
         for r in cents.collect()),
        key=lambda r: r[0])
    Cm = np.array([r[1] for r in cent_rows], dtype="float64")
    id_arr = F.array(*[F.lit(i) for (i, _) in cent_rows])

    # Corpus cell assignment: ONE shuffle-free corpus pass instead of a
    # k-way crossJoin + row_number window.  decimals=6 mirrors the
    # rounded cosine the window formulation ordered by (and the
    # oracle's ORDER BY round(..., 6)).
    assigned = (
        vectors.select(F.col(id_col).alias("vec_id"), _dvec(vec_col).alias("cv"))
        .withColumn("__ci", _nearest_index_udf(Cm, decimals=6)(F.col("cv")))
        .select("vec_id", F.element_at(id_arr, (F.col("__ci") + 1).cast("int")).alias("cell"),
                "cv")
    )

    probe_indices = _probe_indices_udf(Cm, n_probe)

    probes = (
        queries.select(F.col(id_col).alias("query_id"), _dvec(vec_col).alias("qv"))
        .withColumn("__pi", F.explode(probe_indices(F.col("qv"))))
        .select("query_id", "qv",
                F.element_at(id_arr, (F.col("__pi") + 1).cast("int")).alias("cell"))
    )
    # Per-cell scoring: cogroup the corpus cell with the probes that
    # chose it and score as one matrix — candidates never materialize as
    # per-pair (vector, vector) rows, and each (query, cell) emits only
    # its local top-k under the SAME (rounded cos DESC, cand_id) total
    # order the global rank uses, so the prune is lossless.  Shuffle =
    # corpus keyed by cell + |q|·n_probe probe rows; the final rank sees
    # ≤ |q|·n_probe·k rows.
    id_type = assigned.schema["vec_id"].dataType.simpleString()

    def cell_topk(corp, prb):
        if not len(corp) or not len(prb):
            return pd.DataFrame(
                {"query_id": pd.Series([], dtype="object"),
                 "cand_id": pd.Series([], dtype="object"),
                 "cos_sim": pd.Series([], dtype="float64")})
        A = np.stack(corp["cv"].to_numpy()).astype("float64")
        cids = corp["vec_id"].to_numpy()
        Q = np.stack(prb["qv"].to_numpy()).astype("float64")
        qids = prb["query_id"].to_numpy()
        sims = _round_half_away(_seq_cosine(A, Q))
        out_q, out_c, out_s = [], [], []
        for j in range(len(Q)):
            s = sims[:, j]
            keep = cids != qids[j]
            order = np.lexsort((cids[keep], -s[keep]))[:k]
            out_q.extend([qids[j]] * len(order))
            out_c.extend(cids[keep][order])
            out_s.extend(s[keep][order])
        return pd.DataFrame({
            "query_id": pd.Series(np.array(out_q, dtype=qids.dtype)),
            "cand_id": pd.Series(np.array(out_c, dtype=cids.dtype)),
            "cos_sim": pd.Series(out_s, dtype="float64")})

    local = (
        assigned.groupBy("cell")
        .cogroup(probes.groupBy("cell"))
        .applyInPandas(
            cell_topk,
            f"query_id {id_type}, cand_id {id_type}, cos_sim double")
        .withColumn("cos_sim", _nan_score_to_null(F.col("cos_sim")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("cand_id")
    )
    return (
        local.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select("query_id", "cand_id", "cos_sim", "rk")
    )


def cosine_dup_pairs(
    vectors: DataFrame, min_sim: float, block_col: str | None = None,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs ≥ min_sim (semantic dedupe),
    optionally blocked (same label/cluster) to avoid the full n²."""
    sel = [F.col(id_col).alias("id"), _dvec(vec_col).alias("v")]
    if block_col:
        sel.append(F.col(block_col).alias("blk"))
    base = vectors.select(*sel)
    a = base.select(
        *( [F.col("blk")] if block_col else [] ),
        F.col("id").alias("id_1"), F.col("v").alias("v1"),
    )
    b = base.select(
        *( [F.col("blk")] if block_col else [] ),
        F.col("id").alias("id_2"), F.col("v").alias("v2"),
    )
    joined = a.join(b, "blk") if block_col else a.crossJoin(b)
    return (
        joined.filter(F.col("id_1") < F.col("id_2"))
        # the score filter duplicates this Arrow eval in the plan (one
        # node below the filter + one for survivors) — measured CHEAPER
        # than the §4.4 non-deterministic fence on Spark 4.1.2; see the
        # rejection note above cosine()
        .select("id_1", "id_2", cosine(F.col("v1"), F.col("v2")).alias("cos_sim"))
        # NaN-safe: a zero vector's cosine is numpy NaN and Spark
        # orders NaN ABOVE every double, so a bare >= would emit
        # NaN-scored pairs the oracle (0/0 → NULL, fails the filter)
        # drops — the semantic_keep review fix, applied here too
        .filter(~F.isnan("cos_sim") & (F.col("cos_sim") >= min_sim))
    )


def _round_half_away(x, decimals: int = 6):
    """Half-away-from-zero rounding (SQL ``round`` / Spark ``F.round``
    semantics) — numpy's ``round`` is half-EVEN and must never touch a
    score that feeds an oracle-compared order."""
    import numpy as np

    scale = 10.0 ** decimals
    return np.floor(np.abs(x) * scale + 0.5) / scale * np.sign(x)


def _seq_cosine(A, B):
    """|A|×|B| cosine matrix with SEQUENTIAL index-order accumulation
    over dimensions (``acc_d = acc_{d-1} + x_d·y_d``) — bit-identical
    to the expression fold and DuckDB's ``list_dot_product``, unlike a
    BLAS ``A @ B.T`` whose pairwise summation drifts in the last ulp.
    The single numeric kernel behind every ANN scorer here; bit parity
    lives in exactly one place."""
    import numpy as np

    dots = np.zeros((len(A), len(B)))
    na = np.zeros(len(A))
    nb = np.zeros(len(B))
    for d in range(A.shape[1]):
        dots = dots + A[:, d:d + 1] * B[:, d]
        na = na + A[:, d] * A[:, d]
        nb = nb + B[:, d] * B[:, d]
    # a zero vector divides 0/0 → NaN, which downstream filters drop
    # DELIBERATELY (two tests pin it); suppress numpy's RuntimeWarning
    # so real warnings stay visible in worker logs
    with np.errstate(invalid="ignore", divide="ignore"):
        return dots / (np.sqrt(na)[:, None] * np.sqrt(nb)[None, :])


def _nearest_index_udf(C, decimals: int | None = None,
                       metric: str = "cosine", with_score: bool = False):
    """Vectorized nearest-centroid ARG-EXTREME INDEX against a
    driver-held k×dim matrix whose rows are already in tie-break order
    (ties go to the lowest index; callers sort by centroid id before
    building ``C``).  Returning the index instead of an id keeps the
    caller free to map back to ids of ANY orderable type — string
    centroid ids work the same as numeric ones.  Same sequential-fold
    kernels and half-away-from-zero rounding as every other scorer
    here.

    ``metric``: ``"cosine"`` (argmax similarity) or ``"l2"`` (argmin
    squared distance — the PQ/k-center metric).  ``with_score=True``
    returns ``struct<idx, score>`` with the winning score alongside
    the index — the ONE parity-critical nearest kernel, shared so a
    rounding or tie-break fix can't miss a private copy (review
    batch: kcenter_coreset had hand-rolled the l2+score variant)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def assign(v):
        if len(v) == 0:
            if with_score:
                return pd.DataFrame(
                    {"idx": pd.Series([], dtype="int64"),
                     "score": pd.Series([], dtype="float64")})
            return pd.Series([], dtype="int64")
        A = np.stack(v.to_numpy()).astype("float64")
        if metric == "cosine":
            s = _seq_cosine(A, C)
            if decimals is not None:
                s = _round_half_away(s, decimals)
            best = np.argmax(s, axis=1)
        else:
            s = _seq_sqdist(A, C)
            if decimals is not None:
                s = _round_half_away(s, decimals)
            best = np.argmin(s, axis=1)
        if with_score:
            return pd.DataFrame({
                "idx": best.astype("int64"),
                "score": s[np.arange(len(A)), best],
            })
        return pd.Series(best.astype("int64"))

    return pandas_udf(
        assign, "struct<idx: long, score: double>" if with_score else "long")


def _seq_sqdist(A, B):
    """|A|×|B| squared-L2 matrix assembled from the SAME three
    sequential index-order folds a DuckDB mirror computes —
    ``dot(x,x) − 2·dot(x,c) + dot(c,c)`` with each dot accumulating
    ``acc_d = acc_{d-1} + x_d·y_d`` — NOT ``Σ(x_d−y_d)²``, whose
    different operation order could drift in the last ulp."""
    import numpy as np

    dots = np.zeros((len(A), len(B)))
    na = np.zeros(len(A))
    nb = np.zeros(len(B))
    for d in range(A.shape[1]):
        dots = dots + A[:, d:d + 1] * B[:, d]
        na = na + A[:, d] * A[:, d]
        nb = nb + B[:, d] * B[:, d]
    return na[:, None] - 2.0 * dots + nb[None, :]


def _fit_rows(
    rows: list, n_centroids: int, iters: int, decimals: int,
    metric: str = "cosine",
) -> list:
    """Driver-side Lloyd's over an already-collected (id, vec) sample.

    Oracle parity: cosine dot/norms accumulate sequentially over
    dimensions (index-order fold, same as ``list_dot_product``);
    assignment ties break to the lowest centroid id (argmax-first over
    id-sorted centroids); per-(cell, dim) means accumulate as a
    SEQUENTIAL sum over members in sorted-row order then divide (the
    accumulate-then-divide shape of SQL ``avg`` — numpy's pairwise
    ``mean`` is deliberately avoided) and round half-away-from-zero to
    ``decimals`` (SQL ``round``; numpy's is half-even).  Residual
    caveat: a mean within one ulp of a rounding boundary could still
    differ if the engine's own accumulation order differs — the
    6-decimal round absorbs everything observed in practice."""
    import numpy as np

    rows = sorted(rows, key=lambda r: r[0])
    X = np.array([r[1] for r in rows], dtype="float64")
    # ids stay in their NATIVE type (plain list, no int64 coercion) —
    # string-keyed corpora fit the same way; only ordering is required
    xid = [r[0] for r in rows]
    # init = the n_centroids LOWEST ids present in the sample — NOT
    # `id < n_centroids`, which under a sampled fit (sample_mod > 1)
    # keeps only the sampled ids below k and silently shrinks the
    # requested k before the first iteration
    ids = xid[:n_centroids]
    C = X[:n_centroids]
    for _ in range(iters):
        # cosine: argmax similarity; l2 (the PQ sub-quantizer metric):
        # argmin squared distance — both tie-break to the lowest
        # centroid id (first index over id-sorted centroids)
        best = (np.argmax(_seq_cosine(X, C), axis=1) if metric == "cosine"
                else np.argmin(_seq_sqdist(X, C), axis=1))
        keep, new_c = [], []
        for j in range(len(C)):
            m = X[best == j]
            if len(m):
                keep.append(ids[j])
                # sequential member-order fold, then divide — not the
                # pairwise np.mean
                acc = np.zeros(m.shape[1])
                for row in m:
                    acc = acc + row
                new_c.append(_round_half_away(acc / len(m), decimals))
        ids = keep
        C = np.array(new_c)
    return [(i, [float(x) for x in v]) for i, v in zip(ids, C)]



def _collect_fit_sample(
    vectors: DataFrame, id_col: str, vec_col: str,
    sample_mod: int | None, max_sample_rows: int, caller: str,
) -> tuple[list, bool]:
    """Hash-capped fit sample, collected once — the ONE copy of the
    sample-derivation + id-type-sniffing block that kmeans_centroids
    and pq_codebooks used to duplicate verbatim (review finding).
    Returns (rows, numeric_id); raises a named ValueError on an empty
    sample instead of letting the numpy kernels die on a 0-row
    matrix."""
    if sample_mod is None:
        n = vectors.count()
        mod = -(-n // max_sample_rows)  # ceil; 1 when n fits
        sample = vectors if mod <= 1 else \
            vectors.filter(F.pmod(F.xxhash64(F.col(id_col)), F.lit(mod)) == 0)
    else:
        sample = vectors if sample_mod <= 1 else \
            vectors.filter(F.col(id_col) % sample_mod == 0)
    id_type = vectors.schema[id_col].dataType.simpleString()
    # integral ALLOWLIST, not a string/binary denylist (the
    # connected_components review-fix class): a double/decimal(p,s>0)
    # id would silently TRUNCATE through the long cast below — two
    # distinct ids 1.2 and 1.7 collapse onto key 1 — and a decimal
    # beyond long range casts to NULL and dies on int(None).  Anything
    # not exactly-representable as long and not a string is refused
    # loudly (review batch).
    import re

    numeric_id = bool(
        id_type in ("tinyint", "smallint", "int", "bigint")
        or re.fullmatch(r"decimal\((\d|1[0-8]),0\)", id_type))
    if not numeric_id and id_type not in ("string",):
        raise ValueError(
            f"{caller}: id column type {id_type} is not supported — "
            "use an integral (≤ decimal(18,0)) or string id; a "
            "fractional id would silently truncate through the long "
            "cast")
    rows = [
        ((int(r["i"]) if numeric_id else r["i"]),
         [float(x) for x in r["v"]])
        for r in sample.select(
            (F.col(id_col).cast("long") if numeric_id else F.col(id_col))
            .alias("i"),
            _dvec(vec_col).alias("v"),
        ).collect()
    ]
    if not rows:
        raise ValueError(f"{caller}: empty fit sample")
    return rows, numeric_id


def _probe_indices_udf(Cm, n_probe: int):
    """(rounded cosine DESC, index ASC) top-n_probe centroid indices —
    the probe UDF shared by ivf_topk and ivf_pq_topk (was byte-identical
    in both, review finding)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def probe_indices(v):
        if len(v) == 0:
            return pd.Series([], dtype="object")
        A = np.stack(v.to_numpy()).astype("float64")
        sims = _round_half_away(_seq_cosine(A, Cm))
        idx = np.arange(Cm.shape[0])
        return pd.Series([
            np.lexsort((idx, -sims[i]))[:n_probe].tolist()
            for i in range(len(A))
        ])

    return probe_indices


def _pq_encode_udf(Cs, ds: int, name: str):
    """Per-subspace nearest-codeword encoder shared by pq_topk and
    ivf_pq_topk (parameterized on the codebook matrices and the error
    prefix — the two copies had already drifted textually)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    want_dim = ds * len(Cs)

    @pandas_udf("array<int>")
    def encode(v):
        if len(v) == 0:
            return pd.Series([], dtype="object")
        A = np.stack(v.to_numpy()).astype("float64")
        if A.shape[1] != want_dim:
            # a codebook narrower than the vectors would otherwise
            # silently quantize a PREFIX and drop the tail dims from
            # every score
            raise ValueError(
                f"{name}: vectors are {A.shape[1]}-dim but the "
                f"codebooks cover {want_dim} ({len(Cs)} × {ds})")
        codes = [
            np.argmin(_round_half_away(
                _seq_sqdist(A[:, m * ds:(m + 1) * ds], Cs[m])), axis=1)
            for m in range(len(Cs))
        ]
        return pd.Series(list(np.stack(codes, axis=1).astype("int32")))

    return encode


def _pq_lut_udf(Cs, ds: int, name: str):
    """Per-query ADC lookup-table builder shared by pq_topk and
    ivf_pq_topk; partial dots stay UNROUNDED — only the final ADC sum
    rounds."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    want_dim = ds * len(Cs)

    @pandas_udf("array<array<double>>")
    def lut(v):
        if len(v) == 0:
            return pd.Series([], dtype="object")
        A = np.stack(v.to_numpy()).astype("float64")
        if A.shape[1] != want_dim:
            raise ValueError(
                f"{name}: query vectors are {A.shape[1]}-dim but the "
                f"codebooks cover {want_dim} ({len(Cs)} × {ds})")
        return pd.Series([
            [_seq_dot_vec(A[i, m * ds:(m + 1) * ds], Cs[m])
             for m in range(len(Cs))]
            for i in range(len(A))
        ])

    return lut


def kmeans_centroids(
    vectors: DataFrame,
    n_centroids: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 6,
    sample_mod: int | None = None,
    max_sample_rows: int = 1_000_000,
) -> DataFrame:
    """Lloyd's k-means quantizer over an embedding column — the fit
    behind :func:`ivf_topk` (which accepts any small ``(cent_id,
    cent_v)`` frame).

    PRECONDITION: vectors must be non-zero (cosine of the zero vector
    is undefined; numpy propagates NaN where SQL yields NULL, and a
    zero CENTROID would order differently in the two engines —
    probed and documented rather than silently divergent).

    Deterministic by construction so the whole fit is oracle-checkable:
    init = the ``n_centroids`` lowest-id sample vectors; assignment
    tie-breaks on centroid id; each iteration's re-averaged centroid
    components round to ``decimals`` places, pinning cross-engine float
    drift before it can flip a later assignment.

    Scale (the FAISS-IVF training design): the quantizer trains on a
    BOUNDED deterministic sample (``sample_mod`` keeps every m-th id —
    size the sample to the driver, e.g. ≤1M rows, regardless of corpus
    size), iterates entirely driver-side in numpy with zero Spark jobs
    per iteration, and only the final cell ASSIGNMENT touches the full
    corpus — one shuffle-free pass with the k·dim centroid matrix in
    the UDF closure (:func:`_nearest_index_udf`).  The corpus is never
    collected, never crossJoined, never windowed.  A cell that loses
    all members drops out (standard Lloyd's degeneracy) — k shrinks
    rather than producing NaN centroids.

    The driver-side collect is BOUNDED BY DEFAULT: with
    ``sample_mod=None`` the modulus is derived from one corpus count so
    the collected sample never exceeds ~``max_sample_rows`` — a caller
    who forgets the parameter cannot OOM the driver on a large corpus
    (the round-5 default of ``sample_mod=1`` collected everything
    unless every caller remembered to sample).  The derived path
    samples on a HASH of the id (``xxhash64(id) % m``), not the id
    itself — an id-modulus bound silently fails on non-dense ids (a
    corpus keyed ``doc_id * 10`` keeps every row under ``% 2``) and
    errors on string ids.  Pass an explicit ``sample_mod`` when the
    oracle must mirror the sample with a fixed ``vec_id % m = 0``
    predicate (that path keeps the id-modulus semantics and is only
    sound for dense integer ids).
    """
    spark = vectors.sparkSession
    rows, numeric_id = _collect_fit_sample(
        vectors, id_col, vec_col, sample_mod, max_sample_rows,
        "kmeans_centroids")
    cent_rows = _fit_rows(rows, n_centroids, iters, decimals)
    # centroid ids keep the corpus id's kind: long for numeric ids,
    # the native string otherwise (a string-keyed corpus used to crash
    # here on int(None) after the silent cast-to-long)
    return spark.createDataFrame(
        [(cid, v) for cid, v in cent_rows],
        f"cent_id {'long' if numeric_id else 'string'}, "
        "cent_v array<double>",
    )


def assign_cells(
    vectors: DataFrame,
    cents: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Full-corpus cell assignment against a fitted (cent_id, cent_v)
    frame: ONE shuffle-free pass with the k×dim centroid matrix in the
    UDF closure — the shared kernel behind :func:`kmeans_cells`,
    SemDeDup's blocking, and hashed-TF document clustering.  Returns
    (vec_id, cv, cell) with the cell id in its native type; ties break
    to the lowest cent_id (rows sorted before the matrix is built),
    matching the oracle's (cos DESC, cent_id) row_number."""
    import numpy as np

    cent_rows = sorted(
        ((r["cent_id"], [float(x) for x in r["cent_v"]])
         for r in cents.collect()),
        key=lambda r: r[0])
    Cm = np.array([r[1] for r in cent_rows], dtype="float64")
    id_arr = F.array(*[F.lit(i) for (i, _) in cent_rows])
    return (
        vectors.select(F.col(id_col).alias("vec_id"),
                       _dvec(vec_col).alias("cv"))
        .withColumn("__ci", _nearest_index_udf(Cm)(F.col("cv")))
        .withColumn("cell", F.element_at(
            id_arr, (F.col("__ci") + 1).cast("int")))
        .drop("__ci")
    )


def kmeans_cells(
    vectors: DataFrame,
    n_centroids: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_mod: int | None = None,
) -> DataFrame:
    """Fitted centroids exploded to scalar rows (cell, dim, coord) plus
    the final member count per cell — the oracle-comparable view of
    :func:`kmeans_centroids`.  The member count is the one full-corpus
    pass: :func:`assign_cells` (the shared shuffle-free assignment
    kernel), then a map-side-combinable count per cell."""
    cents = kmeans_centroids(vectors, n_centroids, iters, id_col, vec_col,
                             sample_mod=sample_mod)
    members = (
        assign_cells(vectors, cents, id_col, vec_col)
        .select(F.col("cell").alias("cent_id"))
        .groupBy("cent_id")
        .agg(F.count("*").alias("n_members"))
    )
    numeric_cell = dict(cents.dtypes)["cent_id"] not in ("string", "binary")
    cell = (F.col("cent_id").cast("bigint") if numeric_cell
            else F.col("cent_id"))
    return (
        cents.select("cent_id", F.posexplode("cent_v").alias("dim", "coord"))
        .join(members, "cent_id", "left")
        .select(cell.alias("cell"),
                F.col("dim").cast("bigint").alias("dim"),
                F.col("coord"),
                F.coalesce(F.col("n_members"), F.lit(0))
                 .cast("bigint").alias("n_members"))
    )


def pq_codebooks(
    vectors: DataFrame,
    n_sub: int = 2,
    k_sub: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 6,
    sample_mod: int | None = None,
    max_sample_rows: int = 1_000_000,
) -> DataFrame:
    """Product-quantization codebooks (Jégou et al., "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011): split the
    d-dim space into ``n_sub`` contiguous subspaces and fit an
    independent ``k_sub``-cell L2 Lloyd's quantizer per subspace —
    compressing each vector to ``n_sub`` small codes (d floats →
    n_sub bytes at k_sub ≤ 256).

    Same determinism contract as :func:`kmeans_centroids` (init = the
    lowest-id sample subvectors, ties to the lowest centroid id,
    centroid components rounded to ``decimals``), so the whole fit is
    oracle-checkable; same bounded-sample scale design (the fit
    collects a hash-capped sample once and iterates driver-side in
    numpy — the corpus is never collected and the fit never shuffles).
    Returns ``(sub, cent_id, cent_v)`` — one small frame holding all
    ``n_sub`` codebooks.
    """
    spark = vectors.sparkSession
    rows, numeric_id = _collect_fit_sample(
        vectors, id_col, vec_col, sample_mod, max_sample_rows,
        "pq_codebooks")
    dim = len(rows[0][1])
    if dim % n_sub:
        raise ValueError(
            f"pq_codebooks: dim {dim} not divisible by n_sub {n_sub}")
    ds = dim // n_sub
    out = []
    for m in range(n_sub):
        sub_rows = [(i, v[m * ds:(m + 1) * ds]) for i, v in rows]
        for cid, cv in _fit_rows(sub_rows, k_sub, iters, decimals,
                                 metric="l2"):
            out.append((m, cid, cv))
    return spark.createDataFrame(
        out,
        f"sub int, cent_id {'long' if numeric_id else 'string'}, "
        "cent_v array<double>",
    )


def pq_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_sub: int = 2,
    k_sub: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks: DataFrame | None = None,
    sample_mod: int | None = None,
) -> DataFrame:
    """PQ-compressed top-k by asymmetric distance computation (ADC):
    approx dot(q, x) = Σ_m dot(q_m, codebook_m[code_m(x)]) — the
    decomposition is exact given the encoding, only the residual
    x_m − centroid is lost.

    Spark shape (the 100 TB design):

    - ENCODE: one shuffle-free corpus pass — the n_sub codebook
      matrices ride in an Arrow-batched UDF closure, each vector maps
      to ``codes: array<int>`` (sub-centroid INDEX per subspace,
      argmin of the 6-decimal-rounded squared distance, ties to the
      lowest centroid id).  The full-width embedding column is dropped
      immediately after — everything downstream moves codes only.
    - LUT: one query pass builds each query's n_sub×k_sub table of
      subspace partial dots (one row per query, nested array).
    - ADC: broadcast the query LUTs over the encoded corpus and gather
      with ``zip_with(codes, lut, (c, row) → row[c])`` folded by
      ``aggregate`` in subspace order — whole-stage-codegen JVM
      expressions, no Python, no shuffle, no per-pair vector
      materialization; per pair the cost is n_sub array lookups + adds
      instead of a d-dim fold.  The only shuffle in the operator is
      the final top-k window keyed by query.

    Parity: partials accumulate in subspace order (index-ordered
    ``aggregate`` fold = left-associated SQL ``p0 + p1 + ...``) and
    only the final sum rounds to 6 decimals; ordering ties break on
    candidate id.  Self-matches are excluded like the exact scorer.
    Returns ``(query_id, cand_id, approx_dot, rk)``.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    cb = codebooks if codebooks is not None else pq_codebooks(
        vectors, n_sub=n_sub, k_sub=k_sub, iters=iters, id_col=id_col,
        vec_col=vec_col, sample_mod=sample_mod)
    # codebooks are small by contract (n_sub × k_sub × ds doubles) —
    # collect once, sort each subspace by centroid id so matrix index
    # order == the (dist ASC, cent_id ASC) tie-break order
    by_sub: dict[int, list] = {}
    for r in cb.collect():
        by_sub.setdefault(int(r["sub"]), []).append(
            (r["cent_id"], [float(x) for x in r["cent_v"]]))
    subs = sorted(by_sub)
    Cs = [np.array([v for _, v in sorted(by_sub[m], key=lambda t: t[0])],
                   dtype="float64") for m in subs]
    ds = Cs[0].shape[1]

    encode = _pq_encode_udf(Cs, ds, "pq")
    lut = _pq_lut_udf(Cs, ds, "pq")

    enc = vectors.select(
        F.col(id_col).alias("cand_id"),
        encode(_dvec(vec_col)).alias("codes"))
    qlut = queries.select(
        F.col(id_col).alias("query_id"),
        lut(_dvec(vec_col)).alias("lut"))
    approx = round_half_away_col(
        F.aggregate(
            F.zip_with(
                F.col("codes"), F.col("lut"),
                lambda c, row: F.element_at(row, (c + F.lit(1)).cast("int"))),
            F.lit(0.0), lambda acc, x: acc + x),
        6)
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_dot").desc(), F.col("cand_id"))
    return (
        enc.join(F.broadcast(qlut),
                 F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id", approx.alias("approx_dot"))
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
    )


def _seq_dot_vec(q, C):
    """Sequential index-order dots of one vector against the rows of a
    matrix — the LUT kernel (same fold discipline as _seq_cosine)."""
    import numpy as np

    acc = np.zeros(len(C))
    for d in range(len(q)):
        acc = acc + q[d] * C[:, d]
    return [float(x) for x in acc]


def ivf_pq_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_centroids: int = 16,
    n_probe: int = 4,
    n_sub: int = 2,
    k_sub: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    codebooks: DataFrame | None = None,
    sample_mod: int | None = None,
    residual: bool = False,
) -> DataFrame:
    """IVF-PQ (the FAISS IVFADC production shape): a coarse quantizer
    restricts each query to its ``n_probe`` nearest cells, and PQ-ADC
    scores ONLY those cells' members in the compressed domain.

    ``residual=True`` is the actual IVFADC of Jégou et al. 2011 §IV:
    the PQ codebooks are trained on (and codes encode) the RESIDUAL
    ``x − centroid(cell(x))`` instead of the raw vector — the residual
    distribution is the within-cell spread, far tighter than the whole
    corpus, so the same n_sub × k_sub code budget buys materially more
    resolution.  Scoring decomposes exactly:
    ``dot(q, x) ≈ dot(q, c_cell) + Σ_m dot(q_m, codebook_m[code_m])``
    — the first term is one per-(query, probed cell) scalar carried on
    the broadcast probe frame (computed once per query against the
    bounded centroid matrix), the second is the same cell-independent
    LUT gather as the non-residual path, and the fold seeds the ADC
    accumulation with the cell dot so the float addition order is the
    left-associated ``(qc + p0) + p1 ...`` the oracle mirrors.  The
    residual subtraction itself is JVM ``zip_with`` against the
    centroid matrix as a plan literal — one extra projection on the
    encode pass, no extra shuffle, same plan shape as non-residual.
    An explicitly-passed ``codebooks`` frame must have been trained on
    residuals when ``residual=True``.

    Composition of the two operators' plans, which is the point:

    - coarse side = :func:`ivf_topk`'s machinery (default lowest-id
      centroids, cosine cell assignment, per-query probe list);
    - compressed side = :func:`pq_topk`'s machinery (per-subspace L2
      codebooks on the bounded sample, one-pass encode, per-query
      LUTs);
    - the join that was a Broadcast NESTED-LOOP in pure PQ becomes a
      broadcast HASH join ON CELL: probes × LUTs (both query-sized)
      broadcast, the encoded corpus equi-joins on its cell id — each
      corpus row meets only the queries that probed its cell,
      ~n_probe/n_centroids of them, and ADC still costs n_sub lookups
      per surviving pair.  No corpus-sized shuffle anywhere; the final
      top-k window is the only exchange.

    Returns ``(query_id, cand_id, approx_dot, rk)``.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # ---- coarse quantizer (ivf_topk's default + assignment) -------------
    # lowest-id default seeding (see ivf_topk: the `id < k` filter was
    # the dense-numeric-id assumption, review finding)
    cents = centroids if centroids is not None else \
        vectors.select(
            F.col(id_col).alias("cent_id"), _dvec(vec_col).alias("cent_v")
        ).orderBy("cent_id").limit(n_centroids)
    cent_rows = sorted(
        ((r["cent_id"], [float(x) for x in r["cent_v"]])
         for r in cents.collect()),
        key=lambda r: r[0])
    Cm = np.array([r[1] for r in cent_rows], dtype="float64")
    id_arr = F.array(*[F.lit(i) for (i, _) in cent_rows])

    # the coarse assignment runs ONCE; `ev` is what the PQ side sees —
    # the raw vector, or (residual=True) the JVM zip_with subtraction
    # against the centroid matrix as a plan literal
    base = (
        vectors.select(F.col(id_col).alias("cand_id"),
                       _dvec(vec_col).alias("cv"))
        .withColumn("__ci", _nearest_index_udf(Cm, decimals=6)(F.col("cv")))
    )
    if residual:
        cent_mat = F.array(*[
            F.array(*[F.lit(float(x)) for x in vrow])
            for _, vrow in cent_rows])
        base = base.withColumn(
            "ev",
            F.zip_with(
                "cv",
                F.element_at(cent_mat, (F.col("__ci") + 1).cast("int")),
                lambda a, b: a - b))
    else:
        base = base.withColumn("ev", F.col("cv"))

    # ---- PQ codebooks ----------------------------------------------------
    if codebooks is not None:
        cb = codebooks
    elif residual:
        # the residual frame feeds THREE consumers (pq_codebooks'
        # corpus count, its fit-sample collect, and the encode pass
        # below) — materialize so the coarse-assignment pandas UDF runs
        # over the corpus once, not 3× (review finding; the same
        # scanned-once pattern as dedup.semantic_keep)
        from .. import spec as _spec

        base = _spec.materialize(base)
        cb = pq_codebooks(
            base.select("cand_id", "ev"), n_sub=n_sub, k_sub=k_sub,
            iters=iters, id_col="cand_id", vec_col="ev",
            sample_mod=sample_mod)
    else:
        cb = pq_codebooks(
            vectors, n_sub=n_sub, k_sub=k_sub, iters=iters, id_col=id_col,
            vec_col=vec_col, sample_mod=sample_mod)
    by_sub: dict[int, list] = {}
    for r in cb.collect():
        by_sub.setdefault(int(r["sub"]), []).append(
            (r["cent_id"], [float(x) for x in r["cent_v"]]))
    Cs = [np.array([v for _, v in sorted(by_sub[m], key=lambda t: t[0])],
                   dtype="float64") for m in sorted(by_sub)]
    ds = Cs[0].shape[1]

    encode = _pq_encode_udf(Cs, ds, "ivf_pq")
    lut = _pq_lut_udf(Cs, ds, "ivf_pq")

    probe_indices = _probe_indices_udf(Cm, n_probe)

    # one corpus pass computes BOTH the coarse cell and the PQ codes
    enc = base.select(
        "cand_id",
        F.element_at(id_arr, (F.col("__ci") + 1).cast("int")).alias("cell"),
        encode(F.col("ev")).alias("codes"))
    probes = (
        queries.select(F.col(id_col).alias("query_id"),
                       _dvec(vec_col).alias("qv"))
        .withColumn("lut", lut(F.col("qv")))
    )
    if residual:
        # dot(q, centroid) per cell, computed once per query against
        # the bounded centroid matrix; the probed cell's entry rides
        # the broadcast probe frame as one scalar
        @pandas_udf("array<double>")
        def cell_dots(v):
            if len(v) == 0:
                return pd.Series([], dtype="object")
            A = np.stack(v.to_numpy()).astype("float64")
            return pd.Series(
                [_seq_dot_vec(A[i], Cm) for i in range(len(A))])

        probes = probes.withColumn("cds", cell_dots(F.col("qv")))
    probes = probes.withColumn(
        "__pi", F.explode(probe_indices(F.col("qv"))))
    pcols = [
        "query_id", "lut",
        F.element_at(id_arr, (F.col("__pi") + 1).cast("int")).alias("cell"),
    ]
    if residual:
        pcols.append(
            F.element_at("cds", (F.col("__pi") + 1).cast("int"))
            .alias("qc_dot"))
    probes = probes.select(*pcols)
    # residual seeds the fold with the cell dot so the float addition
    # stays left-associated ((qc + p0) + p1 ...), matching the oracle
    approx = round_half_away_col(
        F.aggregate(
            F.zip_with(
                F.col("codes"), F.col("lut"),
                lambda c, row: F.element_at(row, (c + F.lit(1)).cast("int"))),
            F.col("qc_dot") if residual else F.lit(0.0),
            lambda acc, x: acc + x),
        6)
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_dot").desc(), F.col("cand_id"))
    return (
        enc.join(F.broadcast(probes), "cell")
        .filter(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id", approx.alias("approx_dot"))
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
    )


def _kcenter_fit(rows: list, k: int, decimals: int) -> list:
    """Driver-side greedy farthest-point selection (Gonzalez, "Clustering
    to minimize the maximum intercluster distance", TCS 1985) over an
    already-collected (id, vec) sample — the 2-approximation every
    coreset / diversity-selection pipeline starts from.

    Oracle parity mirrors :func:`_fit_rows`: squared-L2 assembled from
    the three sequential index-order dot folds (:func:`_seq_sqdist`),
    each PAIRWISE distance rounded half-away to ``decimals`` BEFORE the
    running min (the oracle's ``min(round(d2, 6))``), argmax ties to the
    lowest id (rows pre-sorted by id, ``np.argmax`` takes the first
    max).  Seed = the lowest sample id — deterministic, like the
    k-means lowest-id init.

    Selection stops EARLY when every sample vector sits at rounded
    distance 0 from the selected set (all-duplicate tail): the argmax
    would otherwise re-pick an already-selected index and return
    duplicate exemplars (review finding).  The oracle's unrolled CTEs
    keep unioning in that regime, but the row they add is the identical
    (cent_id, cent_v) of the seed — the DISTINCT exemplar set, and
    therefore the assignment, agree between the engines either way."""
    import numpy as np

    if k < 1:
        raise ValueError(f"_kcenter_fit: k must be >= 1, got {k}")
    rows = sorted(rows, key=lambda r: r[0])
    X = np.array([r[1] for r in rows], dtype="float64")
    xid = [r[0] for r in rows]
    sel = [0]
    mind = _round_half_away(_seq_sqdist(X, X[0:1]), decimals)[:, 0]
    while len(sel) < min(k, len(rows)):
        nxt = int(np.argmax(mind))
        if mind[nxt] == 0.0:
            break  # remaining sample fully covered — no new exemplar
        sel.append(nxt)
        d = _round_half_away(_seq_sqdist(X, X[nxt:nxt + 1]), decimals)[:, 0]
        mind = np.minimum(mind, d)
    return [(xid[i], [float(x) for x in X[i]]) for i in sel]


def kcenter_coreset(
    vectors: DataFrame,
    k: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 6,
    sample_mod: int | None = None,
    max_sample_rows: int = 1_000_000,
) -> DataFrame:
    """Greedy k-center coreset selection + full-corpus coverage
    assignment — the diversity-sampling primitive (pick k maximally
    spread exemplars, then attribute every vector to its nearest
    exemplar; SemDeDup keeps ONE doc per near-dup cluster, k-center
    keeps the SPREAD of the space — both are curation selectors).

    Scale contract (the kmeans_centroids design, shared plumbing): the
    selection runs driver-side over a BOUNDED deterministic sample
    (:func:`_collect_fit_sample` hash-caps at ``max_sample_rows`` when
    ``sample_mod`` is None); greedy k-center is inherently sequential
    in k, so k tiny driver steps beat k full-corpus jobs.  Only the
    final coverage assignment touches the full corpus — ONE shuffle-free
    mapInPandas-shaped pass with the k×dim exemplar matrix in the UDF
    closure.  The corpus is never collected, never self-joined.

    Determinism: squared-L2 distances rounded half-away to ``decimals``
    before every min/argmax/argmin; selection ties → lowest id;
    assignment ties → lowest exemplar id.  Returns (vec_id, center_id,
    d2_r) — exemplar ids in the corpus id's native type."""
    import numpy as np

    rows, numeric_id = _collect_fit_sample(
        vectors, id_col, vec_col, sample_mod, max_sample_rows,
        "kcenter_coreset")
    cent_rows = sorted(_kcenter_fit(rows, k, decimals), key=lambda r: r[0])
    Cm = np.array([r[1] for r in cent_rows], dtype="float64")
    id_arr = F.array(*[F.lit(i) for (i, _) in cent_rows])
    nearest = _nearest_index_udf(Cm, decimals=decimals, metric="l2",
                                 with_score=True)
    idt = "long" if numeric_id else "string"
    return (
        vectors.select(
            (F.col(id_col).cast("long") if numeric_id
             else F.col(id_col)).alias("vec_id"),
            nearest(_dvec(vec_col)).alias("n"))
        .select(
            "vec_id",
            F.element_at(id_arr, (F.col("n.idx") + 1).cast("int"))
             .cast(idt).alias("center_id"),
            F.col("n.score").alias("d2_r"))
    )
