"""ER / similarity queries (SURVEY.md §2.10) with DuckDB oracles.

The oracles replicate the gram pipeline in pure SQL (lateral unnest over
character positions), so the engine's inverted-index plan is checked
value-for-value against a straightforward relational formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.er import connected_components, resolve_entities
from .operators.relational import dense_ids
from .operators.similarity import (
    candidate_pairs,
    candidate_pairs_minhash,
    meta_ensemble,
    string_distance_join,
)
from .functions.strings import strip_markers
from .spec import QuerySpec, t
from .spec import materialize as _cache

# Shared oracle CTE: char-2-gram counts of letters-only part names.
_GRAM_CTE = """
names AS (
  SELECT p_partkey AS id, p_brand AS blk,
         regexp_replace(lower(p_name), '[^a-z]', '', 'g') AS s
  FROM part
),
grams AS (
  SELECT id, blk, substring(s, CAST(i AS INTEGER), 2) AS gram, count(*) AS cnt
  FROM names, unnest(range(1, length(s))) AS t(i)
  WHERE length(s) >= 2
  GROUP BY 1, 2, 3
)
"""


def er_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9/T6: blocked char-2-gram cosine similarity join on part names,
    cosine ≥ 0.75 (the reference's cross-source threshold,
    `poster-books/01:14`), blocked by brand (T7 blocking,
    `entities/03:67`)."""
    p = t(spark, sf_dir, "part")
    return candidate_pairs(
        p, "p_partkey", "p_name", min_sim=0.75, metric="cosine",
        block_cols=["p_brand"],
    )


_COSINE_SQL = f"""
WITH {_GRAM_CTE},
norms AS (SELECT id, sqrt(sum(cnt*cnt)) AS nrm FROM grams GROUP BY id),
dots AS (
  SELECT a.id AS id_1, b.id AS id_2, sum(a.cnt * b.cnt) AS dot
  FROM grams a JOIN grams b ON a.blk = b.blk AND a.gram = b.gram AND a.id < b.id
  GROUP BY 1, 2
)
SELECT id_1, id_2, round(dot / (n1.nrm * n2.nrm), 6) AS value
FROM dots JOIN norms n1 ON id_1 = n1.id JOIN norms n2 ON id_2 = n2.id
WHERE round(dot / (n1.nrm * n2.nrm), 6) >= 0.75
"""


def er_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6 jaccard variant over distinct grams, ≥ 0.5
    (`find-duplicates-authors.R:49`)."""
    p = t(spark, sf_dir, "part")
    return candidate_pairs(
        p, "p_partkey", "p_name", min_sim=0.5, metric="jaccard",
        block_cols=["p_brand"],
    )


_JACCARD_SQL = f"""
WITH {_GRAM_CTE},
gset AS (SELECT DISTINCT id, blk, gram FROM grams),
cards AS (SELECT id, count(*) AS card FROM gset GROUP BY id),
dots AS (
  SELECT a.id AS id_1, b.id AS id_2, count(*) AS inter
  FROM gset a JOIN gset b ON a.blk = b.blk AND a.gram = b.gram AND a.id < b.id
  GROUP BY 1, 2
)
SELECT id_1, id_2,
       round(inter / (c1.card + c2.card - inter), 6) AS value
FROM dots JOIN cards c1 ON id_1 = c1.id JOIN cards c2 ON id_2 = c2.id
WHERE round(inter / (c1.card + c2.card - inter), 6) >= 0.5
"""


def er_candidate_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """er_candidates table shape: pairs + dense_rank(desc(value))
    (`entities/03:76`, FIXTURES §2).

    Scale-safe global dense rank: ``DENSE_RANK() OVER (ORDER BY value)``
    would funnel every pair through one window task.  Dense rank depends
    only on the *distinct* score values (a tiny set here — scores are
    rounded to 6 dp), so rank the distinct values with the two-pass
    :func:`dense_ids` plan and broadcast-join the rank dimension back —
    no single-partition exchange at any pair count."""
    pairs = _cache(er_cosine_pairs(spark, sf_dir))
    vals = pairs.select("value").distinct().withColumn(
        "__neg", -F.col("value"))
    ranks = dense_ids(vals, ["__neg"], out="rank").drop("__neg")
    return pairs.join(F.broadcast(ranks), "value").select(
        "id_1", "id_2", "value", F.col("rank").cast("long").alias("rank"))


_RANK_SQL = f"""
WITH base AS ({_COSINE_SQL})
SELECT id_1, id_2, value, CAST(DENSE_RANK() OVER (ORDER BY value DESC) AS BIGINT) AS rank
FROM base
"""


def er_meta_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T8: cosine+jaccard+levenshtein ensemble with the reference's
    relevance cutoffs — cosine ≥ 0.5, jaccard ≥ 0.3, lev < 3, meta_sim =
    cosine + jaccard + 2/lev ≥ 1 (`find-duplicates-authors.R:199-222`)."""
    p = t(spark, sf_dir, "part")
    # ONE fused inverted-index pass for both metrics (review fix: two
    # full candidate_pairs pipelines — two scans, two shingle passes,
    # two blocked self-joins — fed an inner join that a single join's
    # (Σcnt·cnt, matched-row count) aggregates replace outright)
    pairs = candidate_pairs(p, "p_partkey", "p_name", min_sim=(0.5, 0.3),
                            metric="both", block_cols=["p_brand"])
    names = p.select("p_partkey", "p_name")
    both = (
        pairs
        .join(names.select(F.col("p_partkey").alias("id_1"),
                           F.col("p_name").alias("name_1")), "id_1")
        .join(names.select(F.col("p_partkey").alias("id_2"),
                           F.col("p_name").alias("name_2")), "id_2")
    )
    # scoring delegates to the golden-tested operator (one copy of the
    # lev==0 guard and rounding rule); the cutoffs stay here
    return (
        meta_ensemble(both)
        .filter(F.col("lev") < 3)
        .filter(F.col("meta_sim") >= 1)
        .select("id_1", "id_2", "cosine", "jaccard", "lev", "meta_sim")
    )


_META_SQL = f"""
WITH {_GRAM_CTE},
norms AS (SELECT id, sqrt(sum(cnt*cnt)) AS nrm FROM grams GROUP BY id),
dots AS (
  SELECT a.id AS id_1, b.id AS id_2, sum(a.cnt * b.cnt) AS dot
  FROM grams a JOIN grams b ON a.blk = b.blk AND a.gram = b.gram AND a.id < b.id
  GROUP BY 1, 2
),
cos AS (
  SELECT id_1, id_2, round(dot / (n1.nrm * n2.nrm), 6) AS cosine
  FROM dots JOIN norms n1 ON id_1 = n1.id JOIN norms n2 ON id_2 = n2.id
  WHERE round(dot / (n1.nrm * n2.nrm), 6) >= 0.5
),
gset AS (SELECT DISTINCT id, blk, gram FROM grams),
cards AS (SELECT id, count(*) AS card FROM gset GROUP BY id),
jdots AS (
  SELECT a.id AS id_1, b.id AS id_2, count(*) AS inter
  FROM gset a JOIN gset b ON a.blk = b.blk AND a.gram = b.gram AND a.id < b.id
  GROUP BY 1, 2
),
jac AS (
  SELECT id_1, id_2, round(inter / (c1.card + c2.card - inter), 6) AS jaccard
  FROM jdots JOIN cards c1 ON id_1 = c1.id JOIN cards c2 ON id_2 = c2.id
  WHERE round(inter / (c1.card + c2.card - inter), 6) >= 0.3
),
paired AS (
  SELECT c.id_1, c.id_2, c.cosine, j.jaccard,
         CAST(levenshtein(p1.p_name, p2.p_name) AS BIGINT) AS lev
  FROM cos c JOIN jac j USING (id_1, id_2)
  JOIN part p1 ON c.id_1 = p1.p_partkey
  JOIN part p2 ON c.id_2 = p2.p_partkey
)
SELECT id_1, id_2, cosine, jaccard, lev,
       round(cosine + jaccard + (CASE WHEN lev = 0 THEN 2.0 ELSE 2.0 / lev END), 6) AS meta_sim
FROM paired
WHERE lev < 3
  AND round(cosine + jaccard + (CASE WHEN lev = 0 THEN 2.0 ELSE 2.0 / lev END), 6) >= 1
"""


# Supplier near-duplicate graph: lev ≤ 2 within a nation block.
def _supplier_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # routes through the SHARED blocked fuzzy join (review fix: this
    # was a hand-rolled copy of string_distance_join's plan — a
    # null-handling or blocking fix there would have missed it)
    s = t(spark, sf_dir, "supplier")
    left = s.select(F.col("s_suppkey").alias("id_1"), F.col("s_name").alias("n1"),
                    F.col("s_nationkey").alias("blk"))
    right = s.select(F.col("s_suppkey").alias("id_2"), F.col("s_name").alias("n2"),
                     F.col("s_nationkey").alias("blk2"))
    return (
        string_distance_join(left, right, "n1", "n2", max_dist=2,
                             block_cols=[("blk", "blk2")])
        .filter(F.col("id_1") < F.col("id_2"))
        .select("id_1", "id_2")
    )


_PAIR_CTE = """
pairs AS (
  SELECT a.s_suppkey AS u, b.s_suppkey AS v
  FROM supplier a JOIN supplier b
    ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey
  WHERE levenshtein(a.s_name, b.s_name) <= 2
),
edges AS (SELECT u, v FROM pairs UNION SELECT v, u FROM pairs),
nodes AS (SELECT DISTINCT u AS n FROM edges),
reach(src, dst) AS (
  SELECT n, n FROM nodes
  UNION
  SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u
),
comp AS (SELECT src AS id, min(dst) AS component FROM reach GROUP BY src)
"""


def er_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T10: connected components over the near-duplicate pair graph —
    the engine's replacement for the reference's manual 2-round
    ``update_ids`` remap (`chronik/03:79-127`)."""
    pairs = _supplier_pairs(spark, sf_dir)
    cc = connected_components(pairs, "id_1", "id_2")
    return cc.select(F.col("node"), F.col("comp").alias("component"))


_CC_SQL = f"WITH RECURSIVE {_PAIR_CTE} SELECT id AS node, component FROM comp"


def er_resolve_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T9+T10 end-to-end: entities + positive pairs → canonical id and
    elected label (max-id member's name, `chronik/02:250-254`)."""
    s = t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("id"), F.col("s_name").alias("name")
    )
    pairs = _supplier_pairs(spark, sf_dir)
    return resolve_entities(s, pairs)


_RESOLVE_SQL = f"""
WITH RECURSIVE {_PAIR_CTE},
ents AS (SELECT s_suppkey AS id, s_name AS name FROM supplier),
mapped AS (
  SELECT e.id, e.name, COALESCE(c.component, e.id) AS comp
  FROM ents e LEFT JOIN comp c USING (id)
)
SELECT id, name,
       first_value(id) OVER w AS id_new,
       first_value(name) OVER w AS name_new
FROM mapped
WINDOW w AS (PARTITION BY comp ORDER BY id DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def er_clean_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged clean-entity registry: distinct canonical (id_new,
    name_new) after resolution — the `lgbtiq_kg_clean.entities` analogue
    (`chronik/03-create-clean-chronik-entities.R`)."""
    return (
        er_resolve_entities(spark, sf_dir)
        .select("id_new", "name_new")
        .distinct()
    )


_CLEAN_SQL = f"""
WITH RECURSIVE {_PAIR_CTE},
ents AS (SELECT s_suppkey AS id, s_name AS name FROM supplier),
mapped AS (
  SELECT e.id, e.name, COALESCE(c.component, e.id) AS comp
  FROM ents e LEFT JOIN comp c USING (id)
),
resolved AS (
  SELECT first_value(id) OVER w AS id_new, first_value(name) OVER w AS name_new
  FROM mapped
  WINDOW w AS (PARTITION BY comp ORDER BY id DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
)
SELECT DISTINCT id_new, name_new FROM resolved
"""


def er_update_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2: propagate canonical supplier ids into lineitem and
    re-aggregate — the update_ids join applied to a fact table
    (`chronik/03:79-88`)."""
    from .operators.er import update_ids

    li = t(spark, sf_dir, "lineitem").select("l_suppkey", "l_quantity")
    mapping = er_resolve_entities(spark, sf_dir).select(
        F.col("id"), F.col("id_new")
    )
    updated = update_ids(li, mapping, "l_suppkey")
    return updated.groupBy("l_suppkey").agg(
        F.count("*").alias("n_items"),
        F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double").alias("qty"),
    )


_UPDATE_SQL = f"""
WITH RECURSIVE {_PAIR_CTE},
ents AS (SELECT s_suppkey AS id, s_name AS name FROM supplier),
mapped AS (
  SELECT e.id, COALESCE(c.component, e.id) AS comp FROM ents e LEFT JOIN comp c USING (id)
),
resolved AS (
  SELECT id, first_value(id) OVER (PARTITION BY comp ORDER BY id DESC
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS id_new
  FROM mapped
)
SELECT COALESCE(r.id_new, l.l_suppkey) AS l_suppkey,
       count(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS qty
FROM lineitem l LEFT JOIN resolved r ON l.l_suppkey = r.id
GROUP BY 1
"""


def fn_strip_markers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3: org-marker strip — remove size/color qualifier words from part
    names and count the collapsed base forms (`entities/03:32-34` with
    `string-mapping.yml:82-96`)."""
    p = t(spark, sf_dir, "part")
    markers = ["small", "large", "red", "blue", "green", "yellow", "shiny", "heavy"]
    base = strip_markers(F.lower(F.col("p_name")), markers)
    return p.groupBy(base.alias("base_name")).agg(F.count("*").alias("n"))


_STRIP_SQL = """
SELECT trim(regexp_replace(
         regexp_replace(lower(p_name),
           '\\b(small|large|red|blue|green|yellow|shiny|heavy)\\b', '', 'g'),
         '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')) AS base_name,
       count(*) AS n
FROM part GROUP BY 1
"""


def er_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9 at-scale path: MinHash-LSH approximate jaccard pairs on part
    names — engine-portable md5-minhash banding (12 hashes, 4 bands of
    3) with exact-jaccard refine on candidates, so the whole pipeline is
    oracle-checkable value-for-value.  The ``ml.feature.MinHashLSH``
    variant (`candidate_pairs_lsh`) keeps the same API and is
    recall-tested against the exact path in tests."""
    p = t(spark, sf_dir, "part")
    return candidate_pairs_minhash(
        p, "p_partkey", "p_name", min_sim=0.5, num_hashes=12, band_size=3
    )


def er_lsh_pairs_sparse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9 bench-scale LSH: same md5-minhash banding pipeline at
    jaccard ≥ 0.8 with bands tuned for the high threshold (2 bands of
    6 — s-curve midpoint (1/b)^(1/r) ≈ 0.89), so the candidate set is
    SPARSE.  ``er_lsh_pairs`` at 0.5 over TPC-H color-word names is
    inherently candidate-dense (~5M pairs at sf0.1 on both engines) and
    measures refine throughput, not plan quality; this variant is the
    headline entry that measures the banding join itself."""
    p = t(spark, sf_dir, "part")
    return candidate_pairs_minhash(
        p, "p_partkey", "p_name", min_sim=0.8, num_hashes=12, band_size=6
    )


def _lsh_sql(k: int, r: int, min_sim: float) -> str:
    # seeded family (operators/dedup.minhash_signature default);
    # '|'-separated buckets matching minhash_bands
    mins = ",\n       ".join(
        f"min(md5('{s}|' || gram)) AS h{s}" for s in range(k))
    bands = "\n  UNION ALL ".join(
        "SELECT id, {b} AS band, {cat} AS bucket FROM sig".format(
            b=b, cat=" || '|' || ".join(
                f"CAST(h{r*b+j} AS VARCHAR)" for j in range(r)))
        for b in range(k // r))
    return f"""
WITH nms AS (
  SELECT p_partkey AS id,
         regexp_replace(lower(p_name), '[^a-z]', '', 'g') AS s
  FROM part
),
gset AS MATERIALIZED (
  SELECT DISTINCT id, substring(s, CAST(i AS INTEGER), 2) AS gram
  FROM nms, unnest(range(1, length(s))) AS t(i)
  WHERE length(s) >= 2
),
sig AS MATERIALIZED (SELECT id, {mins} FROM gset GROUP BY id),
bands AS MATERIALIZED ({bands}),
cand AS (
  SELECT DISTINCT a.id AS id_1, b.id AS id_2
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
),
cards AS (SELECT id, count(*) AS card FROM gset GROUP BY id),
inter AS (
  SELECT c.id_1, c.id_2, count(*) AS i
  FROM cand c
  JOIN gset g1 ON c.id_1 = g1.id
  JOIN gset g2 ON c.id_2 = g2.id AND g1.gram = g2.gram
  GROUP BY 1, 2
)
SELECT id_1, id_2, round(i / (c1.card + c2.card - i), 6) AS value
FROM inter JOIN cards c1 ON id_1 = c1.id JOIN cards c2 ON id_2 = c2.id
WHERE round(i / (c1.card + c2.card - i), 6) >= {min_sim}
"""


# one SQL generator serves both LSH oracles — a hand-maintained static
# twin of the k=12/r=3 text would silently drift on any banding fix
_LSH_SQL = _lsh_sql(12, 3, 0.5)
_LSH_SPARSE_SQL = _lsh_sql(12, 6, 0.8)


def er_string_distance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8 as a two-table fuzzy join: link customers to suppliers whose
    name digits nearly match (max_dist 3, `lobid/02:118`), blocked by
    nation."""
    c = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("cid"),
        F.regexp_replace("c_name", "Customer", "X").alias("cn"),
        F.col("c_nationkey").alias("nk"),
    )
    s = t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("sid"),
        F.regexp_replace("s_name", "Supplier", "X").alias("sn"),
        F.col("s_nationkey").alias("nk"),
    )
    joined = string_distance_join(c, s, "cn", "sn", max_dist=3,
                                  block_cols=[("nk", "nk")])
    return joined.select(
        F.col("cid"), F.col("sid"), F.col("dist").cast("long").alias("dist")
    )


_SDJ_SQL = """
SELECT c_custkey AS cid, s_suppkey AS sid,
       CAST(levenshtein(replace(c_name, 'Customer', 'X'),
                        replace(s_name, 'Supplier', 'X')) AS BIGINT) AS dist
FROM customer JOIN supplier ON c_nationkey = s_nationkey
WHERE levenshtein(replace(c_name, 'Customer', 'X'),
                  replace(s_name, 'Supplier', 'X')) <= 3
"""


SPECS: dict[str, QuerySpec] = {
    "er_cosine_pairs": QuerySpec(er_cosine_pairs, _COSINE_SQL),
    "er_jaccard_pairs": QuerySpec(er_jaccard_pairs, _JACCARD_SQL),
    "er_candidate_rank": QuerySpec(er_candidate_rank, _RANK_SQL),
    "er_meta_ensemble": QuerySpec(er_meta_ensemble, _META_SQL),
    "er_connected_components": QuerySpec(er_connected_components, _CC_SQL),
    "er_resolve_entities": QuerySpec(er_resolve_entities, _RESOLVE_SQL),
    "er_clean_entities": QuerySpec(er_clean_entities, _CLEAN_SQL),
    "er_update_ids": QuerySpec(er_update_ids, _UPDATE_SQL),
    "er_string_distance_join": QuerySpec(er_string_distance_join, _SDJ_SQL),
    "er_lsh_pairs": QuerySpec(er_lsh_pairs, _LSH_SQL),
    "er_lsh_pairs_sparse": QuerySpec(
        er_lsh_pairs_sparse, _LSH_SPARSE_SQL,
        "high-threshold LSH (2 bands of 6, jaccard ≥ 0.8) — sparse "
        "candidates, measures the banding join not the refine"),
    "fn_strip_markers": QuerySpec(fn_strip_markers, _STRIP_SQL),
}
