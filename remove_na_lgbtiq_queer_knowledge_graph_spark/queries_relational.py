"""Relational operator queries (SURVEY.md §2.2-2.9) with DuckDB oracles.

Each entry exercises one operator family from the reference inventory on
the driver's star schema.  Spark side is declarative DataFrame API —
Catalyst handles pushdown/pruning/join selection; `.explain` on any of
these shows PushedFilters on the parquet scans and broadcast joins for
the dim tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions.numeric import round_half_away_col

from .spec import QuerySpec, dsum, t


def _dec_sum(col, alias: str):
    return F.sum(col.cast("decimal(18,6)")).cast("double").alias(alias)


# ---------------------------------------------------------------------------
# Flagship: A1 string_agg + J1 joins + W2 window dedupe (SURVEY §7 phase 0)
# ---------------------------------------------------------------------------

def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers per nation by order revenue, with an ordered
    string_agg of their order priorities — mirrors the reference's
    books-per-author aggregation (`from-citavi/books.R:55-57`) + left
    join + keep-first window (`chronik/02:36-38`).

    Scale notes: per-customer agg is a map-side-combinable shuffle on
    o_custkey; customer/nation/region are broadcast dims; the window
    partitions by nation (25 keys here; at 100 TB partition count follows
    the dim cardinality, no global sort).
    """
    orders = t(spark, sf_dir, "orders")
    customer = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")

    co = orders.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        _dec_sum(F.col("o_totalprice"), "revenue"),
        F.array_join(
            F.array_sort(F.collect_set("o_orderpriority")), ","
        ).alias("priorities"),
    )
    joined = (
        co.join(customer, co.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    w = Window.partitionBy("n_nationkey").orderBy(
        F.col("revenue").desc(), F.col("c_custkey")
    )
    return (
        joined.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select("n_name", "r_name", "c_custkey", "c_name", "n_orders", "revenue", "priorities", "rk")
    )


_FLAGSHIP_SQL = f"""
WITH co AS (
  SELECT o_custkey,
         count(*) AS n_orders,
         {dsum('o_totalprice', 'revenue')},
         array_to_string(list_sort(list_distinct(list(o_orderpriority))), ',') AS priorities
  FROM orders GROUP BY o_custkey
)
SELECT n_name, r_name, c_custkey, c_name, n_orders, revenue, priorities, rk
FROM (
  SELECT n.n_name, r.r_name, c.c_custkey, c.c_name, co.n_orders, co.revenue, co.priorities,
         CAST(ROW_NUMBER() OVER (PARTITION BY n.n_nationkey ORDER BY co.revenue DESC, c.c_custkey) AS BIGINT) AS rk
  FROM co JOIN customer c ON co.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
) WHERE rk <= 3
"""


# ---------------------------------------------------------------------------
# A-family aggregations
# ---------------------------------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped groupBy+multi-agg (A-family stress; 8-agg scan).

    Uses :func:`fixedpoint_sums` — 6 groups × 4 double sums is exactly
    the low-cardinality regime where per-row DECIMAL aggregation
    dominates the scan stage (measured 1.6 s → 0.4 s at sf0.1); the
    long-micro partials keep the bit-exact determinism contract."""
    from .operators.relational import fixedpoint_sums

    li = t(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    return fixedpoint_sums(
        li.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit("2000-09-02"))),
        ["l_returnflag", "l_linestatus"],
        [
            (F.col("l_quantity"), "sum_qty"),
            (F.col("l_extendedprice"), "sum_base_price"),
            (disc, "sum_disc_price"),
            (charge, "sum_charge"),
        ],
        count_alias="count_order",
    )


def _fsum(expr: str, alias: str) -> str:
    from .operators.relational import fsum_sql

    return fsum_sql(expr, alias)


_Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {_fsum('l_quantity', 'sum_qty')},
       {_fsum('l_extendedprice', 'sum_base_price')},
       {_fsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
       {_fsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def string_agg_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: glue_collapse per key (`books.R:55-57`) — ordered, so
    deterministic under any partitioning."""
    from .operators.relational import string_agg

    li = t(spark, sf_dir, "lineitem")
    return string_agg(
        li.withColumn("__ln", F.col("l_linenumber").cast("string")),
        ["l_orderkey"], "__ln", "lines", sep=",",
    ).select("l_orderkey", "lines")


_STRING_AGG_SQL = """
SELECT l_orderkey,
       array_to_string(list_sort(list(CAST(l_linenumber AS VARCHAR))), ',') AS lines
FROM lineitem GROUP BY l_orderkey
"""


def freq_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: count(name, sort=T) %>% filter(n>1) (`chronik/02:126-129`).
    The threshold here is >10, not the reference's >1 — a deliberate
    scale adjustment: on TPC-H brands (25 values over 10k+ parts) >1
    keeps every group and the 'frequent' filter would test nothing."""
    part = t(spark, sf_dir, "part")
    return (
        part.groupBy("p_brand")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 10)
    )


_FREQ_SQL = "SELECT p_brand, count(*) AS n FROM part GROUP BY p_brand HAVING count(*) > 10"


def groupby_max_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: summarise_all(max) flag-merge (`chronik/02:389-391`)."""
    c = t(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.max("c_acctbal").alias("max_acctbal"),
        F.max("c_custkey").alias("max_custkey"),
        F.max("c_nationkey").alias("max_nationkey"),
    )


_GBMAX_SQL = """
SELECT c_mktsegment, max(c_acctbal) AS max_acctbal, max(c_custkey) AS max_custkey,
       max(c_nationkey) AS max_nationkey
FROM customer GROUP BY c_mktsegment
"""


def distinct_count_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: distinct counts + totals (`analyse-number-of-items.R:27-38`)."""
    li = t(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        _dec_sum(F.col("l_quantity"), "total_qty"),
    )


_DCOUNT_SQL = f"""
SELECT count(DISTINCT l_partkey) AS n_parts, count(DISTINCT l_suppkey) AS n_supps,
       {dsum('l_quantity', 'total_qty')}
FROM lineitem
"""


def horizontal_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: row-wise horizontal aggregate (rowSums, `04-persons.R:298-299`)."""
    li = t(spark, sf_dir, "lineitem")
    zero_flags = (
        F.when(F.col("l_discount") == 0, 1).otherwise(0)
        + F.when(F.col("l_tax") == 0, 1).otherwise(0)
        + F.when(F.col("l_quantity") == 0, 1).otherwise(0)
    )
    return li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        zero_flags.cast("long").alias("n_zero_fields"),
    )


_HORIZ_SQL = """
SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
       CAST((CASE WHEN l_discount = 0 THEN 1 ELSE 0 END)
          + (CASE WHEN l_tax = 0 THEN 1 ELSE 0 END)
          + (CASE WHEN l_quantity = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_fields
FROM lineitem
"""


def year_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: SPARQL-style COUNT(DISTINCT) per year
    (`plot-full-network.qmd:171-177`)."""
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy(F.year("o_orderdate").cast("long").alias("order_year"))
        .agg(F.countDistinct("o_custkey").alias("n_customers"))
    )


_YEAR_SQL = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
       count(DISTINCT o_custkey) AS n_customers
FROM orders GROUP BY 1
"""


def histogram_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: histogram via explicit bucketing (`plot-full-network.qmd:130-139`)."""
    o = t(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 50000).cast("long")
    return o.groupBy(bucket.alias("bucket")).agg(F.count("*").alias("n"))


_HIST_SQL = """
SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket, count(*) AS n
FROM orders GROUP BY 1
"""


# ---------------------------------------------------------------------------
# P-family: projections / filters / predicates
# ---------------------------------------------------------------------------

def filter_project_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1-P4: select/rename + isin + regex + null-handling
    (`chronik/01-within-chronik-ner.R:16-21`, 349 regex uses)."""
    c = t(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .filter(F.col("c_name").rlike("00[0-9]$"))
        .filter(F.col("c_acctbal").isNotNull())
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.coalesce(F.col("c_acctbal"), F.lit(0.0)).alias("acctbal"),
        )
    )


_FILTER_SQL = """
SELECT c_custkey AS custkey, c_name AS name, COALESCE(c_acctbal, 0.0) AS acctbal
FROM customer
WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
  AND regexp_matches(c_name, '00[0-9]$')
  AND c_acctbal IS NOT NULL
"""


def distinct_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: distinct on a key subset (`chronik/02:236`, 432 uses)."""
    c = t(spark, sf_dir, "customer")
    return c.select("c_nationkey", "c_mktsegment").distinct()


_DISTINCT_SQL = "SELECT DISTINCT c_nationkey, c_mktsegment FROM customer"


def time_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: created_at-style time-range filter
    (`entities/02-other-duplicates.R:12`).  Uses the pushdown-friendly
    ranged loader — the predicate lands on the raw int64 ns column so
    parquet row-group pruning applies (see spec.events_in_range)."""
    from .spec import events_in_range

    e = events_in_range(
        spark, sf_dir, "2024-01-02 00:00:00", "2024-01-03 00:00:00"
    )
    return e.select("event_id", "user_id", "event_type", "value")


_TIMERANGE_SQL = """
SELECT event_id, user_id, event_type, value FROM events
WHERE ts >= TIMESTAMP '2024-01-02 00:00:00' AND ts < TIMESTAMP '2024-01-03 00:00:00'
"""


def deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4: sample — expressed as a deterministic hash-mod filter so it is
    reproducible across engines and cluster sizes (`sample_n`,
    `get-data-from-wikidata.R:13`)."""
    o = t(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") % 97 == 0).select("o_orderkey", "o_custkey", "o_totalprice")


_SAMPLE_SQL = "SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey % 97 = 0"


# ---------------------------------------------------------------------------
# J-family joins
# ---------------------------------------------------------------------------

def join_left_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: the workhorse equi left join (353 uses) — order enriched with
    customer attrs; dim side broadcast."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return o.join(
        F.broadcast(c.select("c_custkey", "c_name", "c_mktsegment")),
        o.o_custkey == F.col("c_custkey"),
        "left",
    ).select("o_orderkey", "o_custkey", "c_name", "c_mktsegment", "o_totalprice")


_JOIN_LEFT_SQL = """
SELECT o_orderkey, o_custkey, c_name, c_mktsegment, o_totalprice
FROM orders LEFT JOIN customer ON o_custkey = c_custkey
"""


def join_right_preserve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: right join (`book-authors-viaf.R:59`) — every customer kept,
    order columns null when no order exists.

    Kept as a genuine right join to cover the operator; at scale the
    equivalent flip (dim LEFT JOIN fact) is preferred when the preserved
    side is the small one, since Spark can only broadcast the
    non-preserved side of an outer join.
    """
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "right").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


_JOIN_RIGHT_SQL = """
SELECT c_custkey, c_name, o_orderkey, o_totalprice
FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
"""


def anti_join_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: anti-join exclusion — customers with no orders
    (`lobid/02-search-via-author-title.R:36-49` idiom)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


_ANTI_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def semi_join_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: semi join — customers having a pending ('P') order
    (`chronik/02:244-248` inner_join+distinct idiom)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return c.join(
        o.filter(F.col("o_orderstatus") == "P"), c.c_custkey == o.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


_SEMI_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
"""


def multi_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J10/J11: multi-column and renamed-key joins
    (`02-other-duplicates.R:63`).  The supply-lines frame is keyed by
    the COMPOSITE renamed key (pk, sk) so a genuine multi-column join
    condition is exercised — two independent single-column joins would
    leave the J10 family untested.

    Plan: EAGER AGGREGATION below the join (Yan & Larson 1995).  Every
    output measure distributes over the composite-key join — n = Σ cnt,
    qty = Σ per-key decimal sums, supply_line_sum = Σ cnt·supply_lines
    — so the 600k-row fact side is aggregated to (pk, sk) grain FIRST
    and the composite join runs agg ↔ supply-lines at distinct-key
    cardinality: no fact ROW ever crosses a join, only pre-aggregated
    (cnt, qty) partials (plan-asserted in tests/test_plans.py::
    test_multi_key_join_preaggregates_fact — no join operator carries
    l_quantity).  Both shuffles move map-side-combined partials; the
    dim joins broadcast; the final rollup shuffles only group rows.
    At 100 TB the row-level alternative re-shuffles the whole fact
    table on (pk, sk) a second time after already shuffling it for the
    supply-lines aggregate — this shape's shuffles are both capped at
    |distinct (pk, sk)| after map-side combine."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    s = t(spark, sf_dir, "supplier")
    fact = (
        li.groupBy(F.col("l_partkey").alias("pk"),
                   F.col("l_suppkey").alias("sk"))
        .agg(F.count("*").cast("long").alias("cnt"),
             F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("qty_dec"))
    )
    # the supply-lines frame IS the same aggregate — derive it from
    # `fact` (one definition).  MERGE hint (round 13): the unhinted
    # plan broadcast this side — a hashed relation of |distinct
    # (pk, sk)| rows, which is UNBOUNDED in the corpus (at 100 TB it
    # cannot broadcast, and even at sf0.1 building the 600k-row
    # relation cost more than the join it saved — measured 2.1s vs
    # 1.2s total).  Sort-merge reuses each aggregate's own (pk, sk)
    # shuffle as the join partitioning: zero extra exchanges, both
    # sides already co-located.
    ps = fact.select(F.col("pk").alias("pk2"), F.col("sk").alias("sk2"),
                     F.col("cnt").alias("supply_lines"))
    return (
        fact.join(ps.hint("merge"), (fact.pk == ps.pk2) & (fact.sk == ps.sk2))
        .join(F.broadcast(p), fact.pk == p.p_partkey)
        .join(F.broadcast(s), fact.sk == s.s_suppkey)
        .groupBy("p_brand", "s_nationkey")
        .agg(F.sum("cnt").cast("long").alias("n"),
             F.sum("qty_dec").cast("double").alias("qty"),
             F.sum(F.col("cnt") * F.col("supply_lines"))
             .cast("long").alias("supply_line_sum"))
    )


_MULTIKEY_SQL = f"""
WITH ps AS (
  SELECT l_partkey AS pk, l_suppkey AS sk, count(*) AS supply_lines
  FROM lineitem GROUP BY 1, 2
)
SELECT p_brand, s_nationkey, count(*) AS n, {dsum('l_quantity', 'qty')},
       CAST(sum(supply_lines) AS BIGINT) AS supply_line_sum
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN ps ON l_partkey = ps.pk AND l_suppkey = ps.sk
GROUP BY p_brand, s_nationkey
"""


def argmax_best_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J12/A4: best-match-per-group after a join — richest customer per
    nation (`book-authors-viaf.R:52-58` keep-max-score)."""
    from .operators.relational import argmax_per_group

    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    best = argmax_per_group(
        c, ["c_nationkey"], F.col("c_acctbal"), [F.col("c_custkey")]
    )
    return best.join(F.broadcast(n), best.c_nationkey == n.n_nationkey).select(
        "n_name", "c_custkey", "c_name", "c_acctbal"
    )


_ARGMAX_SQL = """
SELECT n_name, c_custkey, c_name, c_acctbal
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rk
  FROM customer
) c JOIN nation ON c_nationkey = n_nationkey
WHERE rk = 1
"""


def _blocked_supplier_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE copy of the nation-blocked supplier pair construction
    (block, id_1 < id_2, both names) shared by
    ``self_join_blocked_pairs`` and ``levenshtein_blocked_join`` —
    the bodies were verbatim duplicates, so a blocking-key change to
    one entry would silently leave the other joining a different pair
    set (review batch; the `_membership_coorder_edges` fix class)."""
    s = t(spark, sf_dir, "supplier")
    a = s.select(
        F.col("s_suppkey").alias("id_1"),
        F.col("s_name").alias("name_1"),
        F.col("s_nationkey").alias("block"),
    )
    b = s.select(
        F.col("s_suppkey").alias("id_2"),
        F.col("s_name").alias("name_2"),
        F.col("s_nationkey").alias("block"),
    )
    return a.join(b, "block").filter(F.col("id_1") < F.col("id_2"))


def self_join_blocked_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6/J7: self-join candidate pairs with a blocking key — suppliers
    paired within a nation, id_1 < id_2 (`expand_grid` + first-letter
    block at `entities/03:64-78`).  The equi-join on the block key is
    what keeps this from being a cross join at scale."""
    return _blocked_supplier_pairs(spark, sf_dir).select(
        "block", "id_1", "id_2", "name_1", "name_2"
    )


_SELFJOIN_SQL = """
SELECT a.s_nationkey AS block, a.s_suppkey AS id_1, b.s_suppkey AS id_2,
       a.s_name AS name_1, b.s_name AS name_2
FROM supplier a JOIN supplier b
  ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey
"""


def levenshtein_blocked_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8/F8: fuzzy string-distance join, blocked — pairs of supplier
    names within edit distance 2, same nation block
    (`stringdist_inner_join` max_dist=2 at `lobid/01:97`).  Blocking +
    the builtin `levenshtein` keeps it JVM-side and sub-quadratic.
    Pair construction shared with ``self_join_blocked_pairs`` via
    :func:`_blocked_supplier_pairs` (one copy, review batch)."""
    return (
        _blocked_supplier_pairs(spark, sf_dir)
        .withColumn("dist", F.levenshtein("name_1", "name_2").cast("long"))
        .filter(F.col("dist") <= 2)
        .select("id_1", "id_2", "name_1", "name_2", "dist")
    )


_LEV_SQL = """
SELECT a.s_suppkey AS id_1, b.s_suppkey AS id_2, a.s_name AS name_1, b.s_name AS name_2,
       CAST(levenshtein(a.s_name, b.s_name) AS BIGINT) AS dist
FROM supplier a JOIN supplier b
  ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey
WHERE levenshtein(a.s_name, b.s_name) <= 2
"""


# ---------------------------------------------------------------------------
# W-family windows
# ---------------------------------------------------------------------------

def surrogate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: dense surrogate keys in name order (`books.R:160-163`),
    via the two-pass range-partitioned plan in
    operators/relational.dense_ids — same dense 1..N result as
    ``row_number() OVER (ORDER BY c_name)`` but with no
    single-partition global sort (plan-asserted in tests/test_plans.py)."""
    from .operators.relational import dense_ids

    c = t(spark, sf_dir, "customer")
    return dense_ids(c.select("c_name"), ["c_name"], out="name_id")


_SURR_SQL = """
SELECT c_name, CAST(ROW_NUMBER() OVER (ORDER BY c_name) AS BIGINT) AS name_id
FROM customer
"""


def keep_first_dedupe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: keep-first-per-group dedupe — first order per customer by
    date (`chronik/02:36-38`)."""
    from .operators.relational import keep_first_per_group

    o = t(spark, sf_dir, "orders")
    return keep_first_per_group(
        o, ["o_custkey"], [F.col("o_orderdate"), F.col("o_orderkey")]
    ).select("o_custkey", "o_orderkey", "o_totalprice")


_KEEPFIRST_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders
) WHERE rn = 1
"""


def elect_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: ordered-first election — per nation, elect the max-custkey
    customer name as canonical (`chronik/02:250-254` id_new = first(id)
    after arrange(desc(id)))."""
    from .operators.relational import elect_first_per_group

    c = t(spark, sf_dir, "customer")
    return elect_first_per_group(
        c, ["c_nationkey"], [F.col("c_custkey").desc()],
        "c_name", "canonical_name",
    ).select("c_custkey", "c_nationkey", "canonical_name")


_ELECT_SQL = """
SELECT c_custkey, c_nationkey,
       first_value(c_name) OVER (PARTITION BY c_nationkey ORDER BY c_custkey DESC
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS canonical_name
FROM customer
"""


def dense_rank_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4: dense_rank(desc(value)) (`entities/03:76`)."""
    s = t(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(F.col("s_acctbal").desc())
    return s.select(
        "s_suppkey", "s_nationkey", "s_acctbal",
        F.dense_rank().over(w).cast("long").alias("rank"),
    )


_DENSE_SQL = """
SELECT s_suppkey, s_nationkey, s_acctbal,
       CAST(DENSE_RANK() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC) AS BIGINT) AS rank
FROM supplier
"""


def longest_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6: longest-string-per-group selection (`04-persons.R:289-295`)."""
    p = t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.length("p_name").desc(), F.col("p_partkey")
    )
    return (
        p.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("p_brand", F.col("p_name").alias("longest_name"))
    )


_LONGEST_SQL = """
SELECT p_brand, p_name AS longest_name
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY length(p_name) DESC, p_partkey) AS rn
  FROM part
) WHERE rn = 1
"""


def fill_down_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7: tidyr fill-down — carry the last non-null value forward
    (`themengeschichtspfad.R:68`).  Partitioned by user so the window
    parallelizes (the global variant serializes — see
    operators.relational.fill_down)."""
    from .operators.relational import fill_down_grouped

    e = t(spark, sf_dir, "events")
    nulled = e.withColumn(
        "v", F.when(F.col("event_type") == "error", None).otherwise(F.col("value"))
    )
    return fill_down_grouped(
        nulled, "v", ["user_id"], [F.col("event_id")]
    ).select("event_id", "user_id", F.col("v").alias("filled_value"))


_FILLDOWN_SQL = """
SELECT event_id, user_id,
       last_value(CASE WHEN event_type = 'error' THEN NULL ELSE value END IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
FROM events
"""


# ---------------------------------------------------------------------------
# O-family sorts / limits
# ---------------------------------------------------------------------------

def top_k_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1/O2: global sort + limit (top-20 orders).  Spark plans this as
    TakeOrderedAndProject — no full global sort materialized."""
    o = t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
        .select("o_orderkey", "o_totalprice")
    )


_TOPK_SQL = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
"""


# ---------------------------------------------------------------------------
# U-family set ops
# ---------------------------------------------------------------------------

def union_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: bind_rows with column alignment (`poster-books/01:34`)."""
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    cc = c.select(
        F.col("c_custkey").alias("id"), F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("kind"),
    )
    ss = s.select(
        F.col("s_suppkey").alias("id"), F.col("s_name").alias("name"),
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("kind"),
    )
    return cc.unionByName(ss)


_UNION_SQL = """
SELECT c_custkey AS id, c_name AS name, c_nationkey AS nationkey, 'customer' AS kind FROM customer
UNION ALL
SELECT s_suppkey, s_name, s_nationkey, 'supplier' FROM supplier
"""


def set_minus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3: set-minus — nations with customers but no suppliers."""
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    return c.select(F.col("c_nationkey").alias("nationkey")).subtract(
        s.select(F.col("s_nationkey").alias("nationkey"))
    )


_MINUS_SQL = """
SELECT DISTINCT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT DISTINCT s_nationkey FROM supplier
"""


def bind_cols_rowid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: ``bind_cols`` — horizontally concatenate two key-less frames
    by generated row position (the reference aligns an API result frame
    back to its input rows, `lobid/01-search-via-isbn.R:192`).

    Spark-first: positional ids come from :func:`dense_ids` (the
    two-pass zipWithIndex plan) on BOTH sides — a
    ``row_number() OVER (ORDER BY ...)`` id would funnel each frame
    through one task, the classic 100 TB killer; the equi-join on the
    dense id is an ordinary shuffle join.  Alignment is well-defined
    because each side carries a total order (repo determinism rule)."""
    from .operators.relational import dense_ids

    c = t(spark, sf_dir, "customer")
    left = dense_ids(
        c.select("c_custkey", "c_name"), ["c_custkey"], out="rid"
    )
    # stand-in for the API-result frame: a key-less fingerprint column
    # with its own (total, unique) order
    right = dense_ids(
        c.select(F.md5(F.col("c_name")).alias("fp")), ["fp"], out="rid"
    )
    return (
        left.join(right, "rid")
        .select(
            F.col("rid").cast("bigint").alias("rid"),
            "c_custkey", "c_name",
            F.col("fp").alias("fp_aligned"),
        )
    )


_BIND_COLS_SQL = """
WITH a AS (
  SELECT ROW_NUMBER() OVER (ORDER BY c_custkey) AS rid, c_custkey, c_name
  FROM customer
), b AS (
  SELECT ROW_NUMBER() OVER (ORDER BY md5(c_name)) AS rid, md5(c_name) AS fp
  FROM customer
)
SELECT CAST(a.rid AS BIGINT) AS rid, a.c_custkey, a.c_name,
       b.fp AS fp_aligned
FROM a JOIN b USING (rid)
"""


# ---------------------------------------------------------------------------
# R-family reshape
# ---------------------------------------------------------------------------

def explode_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1: separate_rows — explode part names into words
    (`books.R:131-134`)."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey", F.explode(F.split("p_name", " ")).alias("word")
    )


_EXPLODE_SQL = """
SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word FROM part
"""


def split_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2: separate one column into several (`books.R:47`) —
    '5-LOW' → (5, 'LOW')."""
    o = t(spark, sf_dir, "orders")
    parts = F.split("o_orderpriority", "-")
    return o.select(
        "o_orderkey",
        parts.getItem(0).cast("long").alias("priority_num"),
        parts.getItem(1).alias("priority_label"),
    )


_SPLIT_SQL = """
SELECT o_orderkey,
       CAST(string_split(o_orderpriority, '-')[1] AS BIGINT) AS priority_num,
       string_split(o_orderpriority, '-')[2] AS priority_label
FROM orders
"""


def melt_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R3: pivot_longer — numeric customer attrs to (variable, value)
    (67 uses, e.g. `04-persons.R:528-533`)."""
    c = t(spark, sf_dir, "customer")
    return c.selectExpr(
        "c_custkey",
        "stack(2, 'acctbal', CAST(c_acctbal AS DOUBLE), 'nationkey', CAST(c_nationkey AS DOUBLE)) AS (variable, value)",
    )


_MELT_SQL = """
SELECT c_custkey, 'acctbal' AS variable, CAST(c_acctbal AS DOUBLE) AS value FROM customer
UNION ALL
SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE) FROM customer
"""


def pivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R4: pivot_wider — order-status counts per customer
    (`12-events.R:48`).  Explicit pivot values skip the discovery scan."""
    o = t(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_custkey")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "o_custkey",
        F.coalesce(F.col("O"), F.lit(0)).cast("long").alias("n_open"),
        F.coalesce(F.col("F"), F.lit(0)).cast("long").alias("n_finished"),
        F.coalesce(F.col("P"), F.lit(0)).cast("long").alias("n_pending"),
    )


_PIVOT_SQL = """
SELECT o_custkey,
       count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
       count(*) FILTER (WHERE o_orderstatus = 'P') AS n_pending
FROM orders GROUP BY o_custkey
"""


# ---------------------------------------------------------------------------
# F-family scalar functions
# ---------------------------------------------------------------------------

def case_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: case_when cascade (152 uses, `04-persons.R:147-158`)."""
    c = t(spark, sf_dir, "customer")
    tier = (
        F.when(F.col("c_acctbal") >= 7500, "platinum")
        .when(F.col("c_acctbal") >= 5000, "gold")
        .when(F.col("c_acctbal") >= 2500, "silver")
        .otherwise("bronze")
    )
    return c.groupBy(tier.alias("tier")).agg(F.count("*").alias("n"))


_CASE_SQL = """
SELECT CASE WHEN c_acctbal >= 7500 THEN 'platinum'
            WHEN c_acctbal >= 5000 THEN 'gold'
            WHEN c_acctbal >= 2500 THEN 'silver'
            ELSE 'bronze' END AS tier,
       count(*) AS n
FROM customer GROUP BY 1
"""


def iri_template(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4/G19 prelude: IRI building by template (`kg_v1.yml:31`)."""
    c = t(spark, sf_dir, "customer")
    return c.select(
        F.concat(F.lit("http://example.com/customer/"), F.col("c_custkey")).alias("iri"),
        F.col("c_name").alias("label"),
    )


_IRI_SQL = """
SELECT 'http://example.com/customer/' || CAST(c_custkey AS VARCHAR) AS iri,
       c_name AS label
FROM customer
"""


def regex_extract_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9: extract_id — numeric id out of a formatted name
    (`network/01-get-data.R:22`)."""
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_name",
        F.regexp_extract("c_name", r"([0-9]+)$", 1).cast("long").alias("extracted_id"),
    )


_REGEX_ID_SQL = """
SELECT c_name, TRY_CAST(regexp_extract(c_name, '([0-9]+)$', 1) AS BIGINT) AS extracted_id
FROM customer
"""


def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10: JSON field extraction (`lobid/01:44-46` jq filters)."""
    e = t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


_JSON_SQL = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events
"""


def fingerprint_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: OpenRefine fingerprint key-collision grouping
    (`open-refine-fingerprint.R:15-23`) over part names."""
    from .functions.strings import fingerprint

    p = t(spark, sf_dir, "part")
    return (
        p.select(fingerprint(F.col("p_name")).alias("fp"))
        .groupBy("fp")
        .agg(F.count("*").alias("n"))
    )


_FP_SQL = """
SELECT fp, count(*) AS n FROM (
  SELECT array_to_string(
           list_sort(list_distinct(
             list_filter(string_split(trim(regexp_replace(
               regexp_replace(lower(trim(p_name)), '[^a-z ]', '', 'g'),
               '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')), ' '), x -> x <> ''))), ' ') AS fp
  FROM part
) GROUP BY fp
"""


def salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant fact⋈dim join via ADAPTIVE salting
    (operators/relational.salted_join): lineitem⋈orders on l_orderkey,
    revenue per order priority.  Semantically identical to the plain
    join — the oracle IS the plain join.  ``hot_keys="auto"`` samples
    the fact side and salts only keys owning >2% of it; TPC-H orderkeys
    are uniform, so the estimator correctly finds none and the plan
    degrades to the plain join — paying one bounded sampling job
    instead of the ×16 dim replication the unconditional form cost.
    The salted path itself is exercised (and equality-tested against
    the plain join) on a skewed frame in tests/test_er.py."""
    from .operators.relational import salted_join

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    o = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    return (
        salted_join(li, o, "l_orderkey", n_salts=16, hot_keys="auto")
        .groupBy("o_orderpriority")
        .agg(
            _dec_sum(F.col("l_extendedprice"), "revenue"),
            F.count("*").alias("n_items"),
        )
    )


_SALTED_SQL = f"""
SELECT o_orderpriority, {dsum('l_extendedprice', 'revenue')},
       count(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


def window_trailing_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour per-user aggregates via a RANGE window frame
    (rolling feature engineering).  The frame is defined on event-time
    seconds, not row counts — ties and gaps are handled by value, and
    the whole thing is one shuffle on user_id + a single sorted pass per
    partition (no self-join on a time predicate)."""
    e = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, 0)
    )
    return e.select(
        "event_id", "user_id",
        F.count("*").over(w).alias("n_1h"),
        F.sum(F.col("value").cast("decimal(18,6)")).over(w)
        .cast("double").alias("sum_1h"),
    )


_TRAILING_SQL = """
SELECT event_id, user_id,
       count(*) OVER w AS n_1h,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
"""


def asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: every view event enriched with the user's most recent
    purchase value at-or-before the view (time-series enrichment — the
    union+window implementation in operators/relational.asof_join; one
    shuffle, no range-join blowup)."""
    from .operators.relational import asof_join

    e = t(spark, sf_dir, "events")
    left = e.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    right = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    out = asof_join(left, right, "user_id", "ts", ["value"], tie_break="value")
    return out.select(
        "event_id", "user_id", F.col("value").alias("last_purchase_value")
    )


_ASOF_SQL = """
SELECT e.event_id, e.user_id, p.value AS last_purchase_value
FROM events e LEFT JOIN LATERAL (
  SELECT value FROM events p
  WHERE p.user_id = e.user_id AND p.event_type = 'purchase' AND p.ts <= e.ts
  ORDER BY p.ts DESC, p.value DESC LIMIT 1
) p ON true
WHERE e.event_type = 'view'
"""


def asof_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: every view event enriched with the user's
    next purchase value at-or-after the view — the conversion-
    attribution lookup (time-to-next-purchase).  Same union+window
    implementation as the backward twin, ts sorted descending
    (`operators/relational.asof_join(direction="forward")`): one
    shuffle on user_id, no range-join blowup; among simultaneous
    purchases the max value wins (same tie contract as backward)."""
    from .operators.relational import asof_join

    e = t(spark, sf_dir, "events")
    left = e.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    right = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    out = asof_join(left, right, "user_id", "ts", ["value"],
                    tie_break="value", direction="forward")
    return out.select(
        "event_id", "user_id", F.col("value").alias("next_purchase_value")
    )


_ASOF_FWD_SQL = """
SELECT e.event_id, e.user_id, p.value AS next_purchase_value
FROM events e LEFT JOIN LATERAL (
  SELECT value FROM events p
  WHERE p.user_id = e.user_id AND p.event_type = 'purchase' AND p.ts >= e.ts
  ORDER BY p.ts ASC, p.value DESC LIMIT 1
) p ON true
WHERE e.event_type = 'view'
"""


# ---------------------------------------------------------------------------
# S8/S9 sinks, oracle-visible: write → read-back round trips.  The sink
# helpers were previously pytest-verified only (a bare sink has no
# oracle-comparable result set); routing a read-back THROUGH the sink
# puts the whole write path under the driver's value-hash gate.
# ---------------------------------------------------------------------------

def sink_partitioned_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9 overwrite sink, Hive-partitioned, then a pruned read-back:
    orders written ``partitionBy(o_orderstatus)`` to a scratch dir, read
    back filtered to one status — the filter resolves as a
    `PartitionFilters` directory prune, no data files of other statuses
    are opened — and aggregated per priority.  Values flow through the
    sink's parquet round trip, so the oracle hash checks the WRITE path
    (encoders, partition layout) end to end, not just the query."""
    from .sources.io import write_partitioned
    from .spec import scratch_dir

    d = scratch_dir("sink_part_") + "/orders"
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")
    write_partitioned(orders, d, ["o_orderstatus"])
    back = spark.read.parquet(d).filter(F.col("o_orderstatus") == "F")
    return back.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n"),
        F.min("o_orderkey").cast("long").alias("min_key"),
        _dec_sum(F.col("o_totalprice"), "total"),
    )


_SINK_PART_SQL = """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n,
       CAST(min(o_orderkey) AS BIGINT) AS min_key,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
FROM orders WHERE o_orderstatus = 'F'
GROUP BY o_orderpriority
"""


def sink_append_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8 append sink: two incremental batches (the reference's
    ``dbAppendTable`` pattern — odd custkeys land first, evens appended
    after) into one scratch dir, read back and aggregated per segment.
    The counts only reconcile if BOTH appends landed and neither
    clobbered the other."""
    from .sources.io import append_sink
    from .spec import scratch_dir

    d = scratch_dir("sink_app_") + "/customer"
    c = t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal")
    append_sink(c.filter(F.col("c_custkey") % 2 == 1), d)
    append_sink(c.filter(F.col("c_custkey") % 2 == 0), d)
    return spark.read.parquet(d).groupBy("c_mktsegment").agg(
        F.count("*").cast("long").alias("n"),
        _dec_sum(F.col("c_acctbal"), "bal"),
    )


_SINK_APPEND_SQL = """
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS bal
FROM customer
GROUP BY c_mktsegment
"""


def sink_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5/S12's literal CSV letter: the QuickStatements long format
    (the reference's bulk-upload file, `04-persons.R:528-533`) written
    as a real CSV sink and read back with an explicit schema — the
    export surface a Wikibase batch upload or any spreadsheet consumer
    reads.  Values are deliberately salted with commas and double
    quotes (``, "de"`` appended to every label row) so the round trip
    exercises RFC-4180 quoting/escaping, not just happy-path tokens —
    a sink that silently mangles quoted fields would shift rows and
    fail the oracle.  Distributed on both legs: parallel part-file
    write, parallel schema'd read, no driver materialization."""
    from .queries_linking import publish_quickstatements
    from .spec import scratch_dir

    d = scratch_dir("sink_csv_") + "/qs"
    qs = publish_quickstatements(spark, sf_dir).withColumn(
        "value",
        F.when(F.col("property") == "Lde",
               F.concat(F.col("value"), F.lit(', "de"')))
        .otherwise(F.col("value")),
    )
    qs.write.mode("overwrite").option("header", True).csv(d)
    return spark.read.schema(
        "item string, property string, value string, batch long"
    ).option("header", True).csv(d)


_SINK_CSV_SQL = """
WITH wide AS (
  SELECT 'item:' || CAST(s_suppkey AS VARCHAR) AS item, s_name AS lde,
         'Q_nation_' || CAST(s_nationkey AS VARCHAR) AS p17,
         CAST(s_acctbal AS VARCHAR) AS p2218
  FROM supplier
),
long AS (
  SELECT item, 'Lde' AS property, lde || ', "de"' AS value FROM wide
  UNION ALL SELECT item, 'P17', p17 FROM wide
  UNION ALL SELECT item, 'P2218', p2218 FROM wide
),
batches AS (
  SELECT item,
         CAST((ROW_NUMBER() OVER (ORDER BY item) - 1) // 20 AS BIGINT)
           AS batch
  FROM (SELECT DISTINCT item FROM long)
)
SELECT l.item, l.property, l.value, b.batch
FROM long l JOIN batches b ON l.item = b.item
WHERE l.value IS NOT NULL
"""


# ---------------------------------------------------------------------------
# OLAP grouping extensions: ROLLUP / CUBE.  Spark compiles both to ONE
# Expand + partial-aggregated groupBy — every grouping set shares the
# single fact scan and map-side combine, which is the 100 TB-correct
# plan (k grouping sets ≠ k passes).
# ---------------------------------------------------------------------------

def agg_rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over the region → nation hierarchy: per-nation rows,
    per-region subtotals, and the grand total in one pass, tagged with
    ``grouping_id`` so consumers can tell a real NULL from a rolled-up
    level."""
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    c = t(spark, sf_dir, "customer")
    base = (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("r_name", "n_name", "c_acctbal")
    )
    return (
        base.rollup("r_name", "n_name")
        .agg(
            F.count("*").cast("long").alias("n_cust"),
            _dec_sum(F.col("c_acctbal"), "total_bal"),
            F.grouping_id().cast("long").alias("gid"),
        )
    )


_ROLLUP_SQL = """
SELECT r_name, n_name,
       CAST(count(*) AS BIGINT) AS n_cust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_bal,
       CAST(GROUPING(r_name) * 2 + GROUPING(n_name) AS BIGINT) AS gid
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


def agg_cube_two_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all four grouping sets — the
    cross-tab, both marginals, and the grand total — from one Expand
    pass over orders."""
    o = t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").cast("long").alias("n"),
            _dec_sum(F.col("o_totalprice"), "total"),
            F.grouping_id().cast("long").alias("gid"),
        )
    )


_CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total,
       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT)
         AS gid
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general form ROLLUP and CUBE are
    sugar for: exactly the (status, priority), (status), and ()
    aggregation levels, skipping the (priority)-only marginal a CUBE
    would compute (the report that wants per-status breakdowns plus a
    grand total but no priority marginal).  One Expand pass, same
    single-shuffle plan as the rollup/cube entries, gid disambiguates
    rolled-up NULLs."""
    o = t(spark, sf_dir, "orders")
    return o.groupingSets(
        [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
        "o_orderstatus", "o_orderpriority",
    ).agg(
        F.count("*").cast("long").alias("n"),
        _dec_sum(F.col("o_totalprice"), "total"),
        F.grouping_id().cast("long").alias("gid"),
    )


_GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total,
       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT)
         AS gid
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                        (o_orderstatus), ())
"""


_EWMA_LAMBDA = 0.01  # per-hour decay rate


def ts_ewma_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially time-decayed value total, evaluated at
    each user's LAST event: Σ_i value_i·exp(−λ·Δh_i) with Δh the age
    in hours — the recency-weighted engagement/activity score of
    event analytics (closed-form, not the recursive EWMA update, so
    it is order-free and partition-order-proof).

    One shuffle: the per-user max-timestamp window and the final
    per-user aggregate share the user_id partitioning.  Epochs
    truncate to whole seconds on both engines (`unix_timestamp` /
    `floor(epoch())`, the file's established idiom — events carry
    microseconds); per-event terms round to 9 dp before the
    DECIMAL(28,14) sum; exp() cross-engine bit-parity is already
    load-bearing in the LR sigmoid oracles."""
    e = t(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id")
    ue = F.unix_timestamp("ts")
    last = F.max(ue).over(wu)
    dh = (last - ue).cast("double") / F.lit(3600.0)
    term = round_half_away_col(
        F.col("value") * F.exp(-F.lit(_EWMA_LAMBDA) * dh), 9)
    return (
        e.select("user_id", last.alias("le"), term.alias("tm"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.max("le").cast("long").alias("last_epoch"),
            round_half_away_col(
                F.sum(F.col("tm").cast("decimal(28,14)")).cast("double"), 6
            ).alias("decayed_value"),
        )
    )


_EWMA_SQL = """
WITH ev AS (
  SELECT user_id, value,
         CAST(floor(epoch(ts)) AS BIGINT) AS ue,
         max(CAST(floor(epoch(ts)) AS BIGINT))
           OVER (PARTITION BY user_id) AS le
  FROM events
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(max(le) AS BIGINT) AS last_epoch,
       round(CAST(SUM(CAST(round(value * exp(-CAST(0.01 AS DOUBLE)
                 * (CAST(le - ue AS DOUBLE) / CAST(3600.0 AS DOUBLE))), 9)
             AS DECIMAL(28,14))) AS DOUBLE), 6) AS decayed_value
FROM ev GROUP BY user_id
"""


def ts_resample_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling with gap filling: hourly event counts per
    type INCLUDING empty hours — the hypertable/`time_bucket_gapfill`
    operation.  The spine is ``sequence(min_hour, max_hour)`` exploded
    from a one-row bounds aggregate crossed with the distinct types —
    |types|·|hours| rows, broadcast-sized regardless of event volume —
    left-joined to the map-side-combinable hourly aggregate and
    zero-filled.  Hours emit as epoch seconds so the oracle hash is
    timezone-proof."""
    e = t(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    counts = e.groupBy(
        F.col("event_type"), hour.alias("h")
    ).agg(F.count("*").cast("long").alias("n"),
          _dec_sum(F.col("value"), "total"))
    bounds = e.agg(F.min(hour).alias("lo"), F.max(hour).alias("hi"))
    spine = (
        bounds.select(F.explode(F.sequence(
            "lo", "hi", F.expr("interval 1 hour"))).alias("h"))
        .crossJoin(e.select("event_type").distinct())
    )
    return (
        spine.join(counts, ["event_type", "h"], "left")
        .select(
            "event_type",
            F.unix_timestamp("h").cast("long").alias("hour_epoch"),
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
            F.coalesce("total", F.lit(0.0)).alias("total"),
        )
    )


_RESAMPLE_SQL = """
WITH bounds AS (
  SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
  FROM events
),
spine AS (
  SELECT t.event_type,
         unnest(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS h
  FROM (SELECT DISTINCT event_type FROM events) t, bounds b
),
counts AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
  FROM events GROUP BY 1, 2
)
SELECT s.event_type,
       CAST(epoch(s.h) AS BIGINT) AS hour_epoch,
       COALESCE(c.n, 0) AS n,
       COALESCE(c.total, 0.0) AS total
FROM spine s LEFT JOIN counts c USING (event_type, h)
"""


def _gap_session_ids(e: DataFrame, gap_s: float = 1800.0) -> DataFrame:
    """Gap-sessionization core: events of the same user more than
    ``gap_s`` seconds apart start a new session — ``lag`` marks
    boundaries, a running sum numbers sessions; ties break on event_id
    for a total order.  Exact fractional-second gaps
    (timestamp→double keeps microseconds) so the boundary test is
    bit-identical to the oracles' epoch() arithmetic.

    ONE copy of the boundary semantics, shared by ``ts_sessionize``
    and ``_engagement_sessions`` (review fix: these were near-verbatim
    twins — the same drift hazard the z-score epilogue already
    documented and fixed once).  Returns
    (user_id, ts, event_id, session_idx)."""
    sec = F.col("ts").cast("double")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = sec - F.lag(sec).over(w)
    flagged = e.select(
        "user_id", "ts", "event_id",
        F.when(gap.isNull() | (gap > F.lit(float(gap_s))), 1)
         .otherwise(0).alias("new_s"),
    )
    return flagged.withColumn(
        "session_idx",
        F.sum("new_s").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    ).drop("new_s")


def ts_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (the batch twin of the streaming session
    windows): the shared 30-min-gap core (:func:`_gap_session_ids`)
    plus one groupBy of per-session stats.  Two sorted passes over the
    same (user, time) partitioning; Catalyst reuses the sort.  Output
    epochs floor explicitly on both sides."""
    sessions = _gap_session_ids(t(spark, sf_dir, "events"))
    return sessions.groupBy("user_id", "session_idx").agg(
        F.count("*").cast("long").alias("n_events"),
        F.floor(F.min(F.col("ts").cast("double"))).cast("long")
         .alias("start_epoch"),
        F.floor(F.max(F.col("ts").cast("double"))).cast("long")
         .alias("end_epoch"),
    ).withColumn("session_idx", F.col("session_idx").cast("long"))


_SESSIONIZE_SQL = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM flagged
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(floor(epoch(min(ts))) AS BIGINT) AS start_epoch,
       CAST(floor(epoch(max(ts))) AS BIGINT) AS end_epoch
FROM numbered GROUP BY user_id, session_idx
"""


def _engagement_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click/view engagement sessions (ts_sessionize's 30-min-gap
    construction) extended by the 1-hour attribution window:
    (user_id, session_idx, start_s, end_s) with exact fractional-
    second epoch doubles.  ONE copy of the construction — the shared
    :func:`_gap_session_ids` core plus the engagement filter and the
    attribution-window epilogue; consumed by ``join_range_interval``,
    ``stream_interval_join`` (whose stream ≡ batch contract depends on
    byte-identical interval construction), and
    ``tools/stress_interval.py``."""
    e = t(spark, sf_dir, "events")
    sec = F.col("ts").cast("double")
    eng = e.filter(F.col("event_type").isin("click", "view"))
    return (
        _gap_session_ids(eng)
        .groupBy("user_id",
                 F.col("session_idx").cast("long").alias("session_idx"))
        .agg(F.min(sec).alias("start_s"),
             (F.max(sec) + F.lit(3600.0)).alias("end_s"))
    )


def range_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase-to-session attribution — the RANGE JOIN family member
    (each purchase event lands in the engagement session whose
    [start, end] interval contains it, per user).  Spark has no native
    interval join and the naive ``ON p BETWEEN start AND end`` degrades
    to a per-key nested loop; this routes through
    ``operators.relational.interval_join``, the binned equi-join:
    intervals explode to their covered bins — width SELF-TUNED to the
    p95 interval length since round 11 (``bin_width=None``), so
    bins-per-interval stays O(1) on any span regime and the operator's
    in-plan guard fails loud on degenerate spans —
    points map to their single bin, and the join is an equi-join on
    (user_id, bin) with the exact range predicate as a post-filter —
    shuffle ∝ events, never the per-user cross product.

    Engagement sessions come from click/view events with the
    ts_sessionize 30-min-gap construction (exact fractional-second
    epoch doubles on both engines), extended by a 1-hour attribution
    window past the last engagement event — so consecutive sessions'
    intervals genuinely OVERLAP and a purchase can (correctly) credit
    several sessions: the many-to-many case a range join exists for.
    Purchases join by containment; value sums as DECIMAL(18,6) (the
    _dec_sum grid)."""
    from .operators.relational import interval_join

    e = t(spark, sf_dir, "events")
    sec = F.col("ts").cast("double")
    sess = _engagement_sessions(spark, sf_dir)
    purch = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", sec.alias("p_s"), "value")
    joined = interval_join(
        purch, sess, "p_s", "start_s", "end_s", keys=["user_id"],
        bin_width=None)
    return joined.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).cast("long").alias("n_purchases"),
        _dec_sum(F.col("value"), "purchase_value"),
        F.floor(F.min("start_s")).cast("long").alias("start_epoch"),
    )


# engagement-session CTEs — the SQL twin of _engagement_sessions, ONE
# copy shared by _RANGE_INTERVAL_SQL and the streaming twin's oracle
# (queries_streaming._STREAM_INTERVAL_SQL — review fix: that module
# carried a verbatim copy of these CTEs, the exact drift class the
# Spark side's shared _gap_session_ids exists to prevent)
_ENG_SESSIONS_CTES = """flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_s
  FROM events WHERE event_type IN ('click', 'view')
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
         min(epoch(ts)) AS start_s, max(epoch(ts)) + 3600.0 AS end_s
  FROM (SELECT user_id, ts,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_idx
        FROM flagged)
  GROUP BY 1, 2
)"""

_RANGE_INTERVAL_SQL = f"""
WITH {_ENG_SESSIONS_CTES}
SELECT p.user_id, s.session_idx,
       CAST(count(*) AS BIGINT) AS n_purchases,
       CAST(sum(CAST(p.value AS DECIMAL(18,6))) AS DOUBLE) AS purchase_value,
       CAST(floor(min(s.start_s)) AS BIGINT) AS start_epoch
FROM events p JOIN sess s
  ON p.user_id = s.user_id AND epoch(p.ts) BETWEEN s.start_s AND s.end_s
WHERE p.event_type = 'purchase'
GROUP BY 1, 2
"""



def _zscore_epilogue(hourly: DataFrame) -> DataFrame:
    """|z| > 2 anomaly epilogue over an (event_type, h, n) hourly frame
    — ONE copy shared by ``ts_anomaly_zscore`` and
    ``stream_anomaly_zscore`` (review finding: the stream twin carried
    a verbatim copy that a fix here would have missed).

    The σ radicand clamps at 0 (``greatest``): the integer moments make
    Σx²/n − μ² exact at shipped scales, but once k·c² ≳ 2⁵¹ (the 100 TB
    regime) the double expression can dip to −1e-4 by fp error — Spark
    would then produce σ = NaN, and NaN-is-greater ordering passes NaN
    z-scores through BOTH filters while the DuckDB oracle hard-errors
    on sqrt of a negative.  Clamped, both engines see σ = 0 → the
    hour is filtered, deterministically."""
    stats = hourly.groupBy("event_type").agg(
        F.sum("n").cast("long").alias("sx"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("sx2"),
        F.count(F.lit(1)).cast("long").alias("cnt"),
    )
    mu = F.col("sx") / F.col("cnt")
    sigma = F.sqrt(F.greatest(
        F.col("sx2") / F.col("cnt") - mu * mu, F.lit(0.0)))
    z = (F.col("n") - mu) / sigma
    return (
        hourly.join(F.broadcast(stats), "event_type")
        .filter((sigma > 0) & (F.abs(z) > 2))
        .select("event_type", F.col("h").cast("timestamp").alias("hour"),
                "n", round_half_away_col(z, 6).alias("z"))
    )


def ts_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection per event-type series: hourly event
    counts, z-scored against that type's own monthly distribution,
    reporting hours with |z| > 2 — the basic data-quality/incident
    monitor over an event stream.

    Float discipline: the moments come from INTEGER sums (Σx, Σx² as
    longs over long hourly counts), so μ = Σx/n and
    σ = sqrt(Σx²/n − μ²) are single fixed double expressions over
    identical integer operands on both engines — NOT the engines' own
    stddev aggregates, whose streaming update orders differ in the
    last ulp.  The |z| > 2 cut therefore filters identical doubles;
    the reported z rounds to 6.  Shapes: one map-side-combinable
    (type, hour) count, a ≤|types|-row stats table broadcast back,
    one codegen filter."""
    e = t(spark, sf_dir, "events")
    hourly = (
        e.groupBy("event_type",
                  F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return _zscore_epilogue(hourly)


_ANOMALY_SQL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type, CAST(sum(n) AS BIGINT) AS sx,
         CAST(sum(n * n) AS BIGINT) AS sx2,
         CAST(count(*) AS BIGINT) AS cnt
  FROM hourly GROUP BY 1
)
SELECT event_type, CAST(h AS TIMESTAMP) AS hour, n,
       round((n - sx / cnt)
             / sqrt(greatest(sx2 / cnt - (sx / cnt) * (sx / cnt), 0)), 6) AS z
FROM hourly JOIN stats USING (event_type)
WHERE sqrt(greatest(sx2 / cnt - (sx / cnt) * (sx / cnt), 0)) > 0
  AND abs((n - sx / cnt)
          / sqrt(greatest(sx2 / cnt - (sx / cnt) * (sx / cnt), 0))) > 2
"""


def ts_active_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ACTIVE TIME: each event opens a 10-minute activity
    interval [ts, ts+600]; overlapping intervals merge and the union
    length is the user's genuinely-covered seconds — the interval-union
    aggregate (billing/engagement coverage), where naive Σ durations
    double-counts every overlap.

    The classic sweep as ONE sorted window pass per user (no
    self-join): running max of interval ends over the preceding rows;
    a row whose start exceeds that max opens a new island; islands sum
    (max end − min start).  Float discipline: interval ends are
    ts + 600.0 on microsecond-grain doubles (exact — 51 bits needed,
    53 available), island lengths are exact differences, and the
    per-user sum goes through DECIMAL(18,6) so it is
    partition-order-proof."""
    e = t(spark, sf_dir, "events")
    sec = F.col("ts").cast("double")
    base = e.select("user_id", "event_id", sec.alias("s"),
                    (sec + F.lit(600.0)).alias("en"))
    w = Window.partitionBy("user_id").orderBy("s", "event_id")
    prev_max = F.max("en").over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = base.withColumn(
        "new_i",
        F.when(prev_max.isNull() | (F.col("s") > prev_max), 1).otherwise(0))
    islands = flagged.withColumn(
        "island",
        F.sum("new_i").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    per_island = islands.groupBy("user_id", "island").agg(
        (F.max("en") - F.min("s")).alias("len"))
    return per_island.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_islands"),
        F.sum(F.col("len").cast("decimal(18,6)")).cast("double")
        .alias("active_secs"),
    )


_ACTIVE_TIME_SQL = """
WITH base AS (
  SELECT user_id, event_id, epoch(ts) AS s, epoch(ts) + 600.0 AS en
  FROM events
),
flagged AS (
  SELECT user_id, s, en,
         CASE WHEN max(en) OVER (PARTITION BY user_id ORDER BY s, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING) IS NULL
                OR s > max(en) OVER (PARTITION BY user_id
                                     ORDER BY s, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS new_i,
         event_id
  FROM base
),
islands AS (
  SELECT user_id, s, en,
         SUM(new_i) OVER (PARTITION BY user_id ORDER BY s, event_id
                          ROWS UNBOUNDED PRECEDING) AS island
  FROM flagged
),
per_island AS (
  SELECT user_id, island, max(en) - min(s) AS len
  FROM islands GROUP BY 1, 2
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_islands,
       CAST(sum(CAST(len AS DECIMAL(18,6))) AS DOUBLE) AS active_secs
FROM per_island GROUP BY 1
"""


def ts_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis over the event stream: per user, the earliest
    view, the earliest click within ONE HOUR after that view, and the
    earliest purchase within ONE HOUR after that click.  Emits the
    funnel report: users per reached depth.

    Bounded-state shape (review batch): each step is a user-keyed join
    of the raw step events against the PREVIOUS step's one-row-per-user
    aggregate, windowed filter, then a map-side-combinable ``min`` —
    per-key state is O(1).  The first version collected every click and
    purchase timestamp into per-user ``collect_list`` arrays, which a
    single hot user (bot account with millions of events) turns into a
    multi-hundred-MB row at the 100 TB regime this module targets —
    exactly the unbounded-state shape the oracle's join formulation
    avoids."""
    e = t(spark, sf_dir, "events")
    sec = F.col("ts").cast("double")
    base = e.select("user_id", "event_type", sec.alias("s"))
    v = base.filter(F.col("event_type") == "view") \
        .groupBy("user_id").agg(F.min("s").alias("t_view"))
    c = (
        base.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter((F.col("s") >= F.col("t_view"))
                & (F.col("s") <= F.col("t_view") + 3600))
        .groupBy("user_id").agg(F.min("s").alias("t_click"))
    )
    p = (
        base.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter((F.col("s") >= F.col("t_click"))
                & (F.col("s") <= F.col("t_click") + 3600))
        .groupBy("user_id").agg(F.min("s").alias("t_purchase"))
    )
    stepped = v.join(c, "user_id", "left").join(p, "user_id", "left")
    depth = (
        F.when(F.col("t_purchase").isNotNull(), 3)
        .when(F.col("t_click").isNotNull(), 2)
        .otherwise(1)
    )
    return stepped.select(depth.alias("depth")).groupBy("depth").agg(
        F.count("*").cast("long").alias("n_users")
    ).withColumn("depth", F.col("depth").cast("long"))


_FUNNEL_SQL = """
WITH v AS (
  SELECT user_id, min(epoch(ts)) AS t_view
  FROM events WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT v.user_id, min(epoch(e.ts)) AS t_click
  FROM v JOIN events e ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND epoch(e.ts) >= v.t_view
    AND epoch(e.ts) <= v.t_view + 3600
  GROUP BY v.user_id
),
p AS (
  SELECT c.user_id, min(epoch(e.ts)) AS t_purchase
  FROM c JOIN events e ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND epoch(e.ts) >= c.t_click
    AND epoch(e.ts) <= c.t_click + 3600
  GROUP BY c.user_id
)
SELECT CAST(depth AS BIGINT) AS depth,
       CAST(count(*) AS BIGINT) AS n_users
FROM (
  SELECT CASE WHEN p.user_id IS NOT NULL THEN 3
              WHEN c.user_id IS NOT NULL THEN 2 ELSE 1 END AS depth
  FROM v LEFT JOIN c ON v.user_id = c.user_id
  LEFT JOIN p ON v.user_id = p.user_id
) GROUP BY depth
"""


def ts_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity day (cohort),
    counted as active per day-offset from that cohort day — the
    product-analytics staple.  Two map-side-combinable aggregations
    (first-activity per user, distinct activity days per user) and one
    broadcast-sized report; the event table is never self-joined."""
    e = t(spark, sf_dir, "events")
    day = F.floor(F.col("ts").cast("double") / 86400).cast("long")
    per_user_day = e.select("user_id", day.alias("d")).distinct()
    first = per_user_day.groupBy("user_id").agg(F.min("d").alias("cohort_d"))
    return (
        per_user_day.join(first, "user_id")
        .groupBy("cohort_d", (F.col("d") - F.col("cohort_d")).alias("offset"))
        .agg(F.countDistinct("user_id").cast("long").alias("n_active"))
        .withColumn("cohort_d", F.col("cohort_d").cast("long"))
        .withColumn("offset", F.col("offset").cast("long"))
    )


_COHORT_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d
  FROM events
),
first AS (SELECT user_id, min(d) AS cohort_d FROM ud GROUP BY user_id)
SELECT f.cohort_d, ud.d - f.cohort_d AS "offset",
       CAST(count(DISTINCT ud.user_id) AS BIGINT) AS n_active
FROM ud JOIN first f ON ud.user_id = f.user_id
GROUP BY 1, 2
"""


def _merge_delta(c: DataFrame, include_noop: bool = False) -> DataFrame:
    """The deterministic MERGE delta batch shared by
    ``sink_merge_upsert`` and ``sink_scd2_merge`` (the two entries are
    documented siblings over the SAME batch; their near-verbatim copies
    could silently drift on the update modulus or insert key-offset —
    review batch, one-copy rule): every 3rd custkey changes balance
    (+100); keys ≡ 7 (mod 1000) shifted by 2⁴⁰ (far above any real
    custkey) are brand new.  ``include_noop`` adds the
    arrived-but-UNCHANGED rows (custkey ≡ 7 mod 5, excluding the
    changed set) that SCD2 must suppress."""
    changed = (
        c.filter(F.col("c_custkey") % 3 == 0)
        .select("c_custkey", "c_name",
                (F.col("c_acctbal") + 100).alias("c_acctbal"))
    )
    inserts = c.filter(F.col("c_custkey") % 1000 == 7).select(
        (F.col("c_custkey") + (1 << 40)).alias("c_custkey"),
        F.concat(F.lit("new-"), F.col("c_name")).alias("c_name"),
        F.lit(0.0).alias("c_acctbal"),
    )
    if include_noop:
        noop = c.filter((F.col("c_custkey") % 5 == 7 % 5)
                        & (F.col("c_custkey") % 3 != 0))
        return changed.unionByName(noop).unionByName(inserts)
    return changed.unionByName(inserts)


def sink_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE / upsert (S10's set-level sibling — the lakehouse staple)
    re-expressed as ONE full outer join + per-column coalesce: a delta
    of modified balances (every 3rd customer, +100) plus brand-new keys
    (beyond the current max) merges into the base — matched rows take
    the delta's values, unmatched-source rows insert, unmatched-target
    rows persist.  No read-modify-write loop, no driver state; at scale
    this is the shuffle-on-key plan Delta/Iceberg MERGE compiles to."""
    c = t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal")
    delta = _merge_delta(c)
    return (
        c.alias("t").join(delta.alias("s"), "c_custkey", "full_outer")
        .select(
            "c_custkey",
            F.coalesce(F.col("s.c_name"), F.col("t.c_name")).alias("c_name"),
            F.round(F.coalesce(F.col("s.c_acctbal"), F.col("t.c_acctbal"))
                    .cast("decimal(18,6)"), 2).cast("double")
             .alias("c_acctbal"),
            F.when(F.col("t.c_custkey").isNull(), "inserted")
             .when(F.col("s.c_custkey").isNull(), "kept")
             .otherwise("updated").alias("action"),
        )
    )


_MERGE_SQL = """
WITH base AS (SELECT c_custkey, c_name, c_acctbal FROM customer),
delta AS (
  SELECT c_custkey, c_name, c_acctbal + 100 AS c_acctbal
  FROM base WHERE c_custkey % 3 = 0
  UNION ALL
  SELECT c_custkey + (1::BIGINT << 40), 'new-' || c_name, 0.0
  FROM base WHERE c_custkey % 1000 = 7
),
merged AS (
  SELECT COALESCE(s.c_custkey, t.c_custkey) AS c_custkey,
         COALESCE(s.c_name, t.c_name) AS c_name,
         CAST(round(CAST(COALESCE(s.c_acctbal, t.c_acctbal)
                         AS DECIMAL(18,6)), 2) AS DOUBLE) AS c_acctbal,
         CASE WHEN t.c_custkey IS NULL THEN 'inserted'
              WHEN s.c_custkey IS NULL THEN 'kept'
              ELSE 'updated' END AS action
  FROM base t FULL OUTER JOIN delta s ON t.c_custkey = s.c_custkey
)
SELECT c_custkey, c_name, c_acctbal, action FROM merged
"""


def sink_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 merge — the HISTORY-keeping sibling of
    ``sink_merge_upsert``: instead of overwriting matched rows, close
    the old version (``valid_to`` = batch date) and open a new one, so
    every past state stays queryable (the dimension-versioning staple
    Delta/Iceberg users hand-roll on top of MERGE).

    Delta batch (deterministic): every 3rd custkey changes balance
    (+100); every custkey ≡ 7 (mod 5) arrives with UNCHANGED values —
    the no-op-update case SCD2 must suppress (a naive MERGE would mint
    a spurious version); keys ≡ 7 (mod 1000) shifted by 2⁴⁰ are brand
    new.  One full-outer join on the key; each joined row then emits
    its 1–2 output versions from a conditional array + ``explode`` —
    ONE join execution, one pass (the union-of-two-projections
    formulation re-executes the join per branch: measured 2 joins /
    2 exchanges in the executed plan, so it was rewritten).  At 100 TB
    this is exactly the shuffle-on-key MERGE plan plus a narrow
    in-task fan-out; no read-modify-write, no driver state."""
    base_date, batch_date = "2020-01-01", "2024-06-01"
    c = t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal")
    delta = _merge_delta(c, include_noop=True)
    j = c.alias("t").join(delta.alias("s"), "c_custkey", "full_outer")
    # value comparison on cents (exact integers) — a double != would
    # hinge on representation bits; half-AWAY-from-zero like
    # round_half_away_col (plain floor(x*100+0.5) is half-up, which
    # forks the repo's rounding convention on negative sub-cent values)
    cents = lambda col: (F.floor(F.abs(col) * 100 + F.lit(0.5))  # noqa: E731
                         * F.signum(col)).cast("long")
    is_change = (
        F.col("t.c_custkey").isNotNull() & F.col("s.c_custkey").isNotNull()
        & ((cents(F.col("s.c_acctbal")) != cents(F.col("t.c_acctbal")))
           | (F.col("s.c_name") != F.col("t.c_name")))
    )
    closed_row = F.struct(
        F.col("t.c_name").alias("c_name"),
        F.col("t.c_acctbal").alias("c_acctbal"),
        F.lit(base_date).cast("date").alias("valid_from"),
        F.lit(batch_date).cast("date").alias("valid_to"),
        F.lit(0).cast("long").alias("is_current"),
    )
    current_row = F.struct(
        F.coalesce(F.col("s.c_name"), F.col("t.c_name")).alias("c_name"),
        F.coalesce(F.col("s.c_acctbal"), F.col("t.c_acctbal"))
         .alias("c_acctbal"),
        F.when(F.col("t.c_custkey").isNull() | is_change, batch_date)
         .otherwise(base_date).cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(1).cast("long").alias("is_current"),
    )
    versions = F.when(is_change, F.array(closed_row, current_row)) \
                .otherwise(F.array(current_row))
    return (
        j.select("c_custkey", F.explode(versions).alias("v"))
        .select("c_custkey", "v.*")
    )


_SCD2_SQL = """
WITH base AS (SELECT c_custkey, c_name, c_acctbal FROM customer),
delta AS (
  SELECT c_custkey, c_name, c_acctbal + 100 AS c_acctbal
  FROM base WHERE c_custkey % 3 = 0
  UNION ALL
  SELECT c_custkey, c_name, c_acctbal
  FROM base WHERE c_custkey % 5 = 2 AND c_custkey % 3 <> 0
  UNION ALL
  SELECT c_custkey + (1::BIGINT << 40), 'new-' || c_name, 0.0
  FROM base WHERE c_custkey % 1000 = 7
),
j AS (
  SELECT COALESCE(s.c_custkey, t.c_custkey) AS c_custkey,
         t.c_custkey AS tk, s.c_custkey AS sk,
         t.c_name AS tn, s.c_name AS sn,
         t.c_acctbal AS tb, s.c_acctbal AS sb,
         (t.c_custkey IS NOT NULL AND s.c_custkey IS NOT NULL AND
          (CAST(floor(abs(s.c_acctbal) * 100 + 0.5)
                * sign(s.c_acctbal) AS BIGINT)
             <> CAST(floor(abs(t.c_acctbal) * 100 + 0.5)
                     * sign(t.c_acctbal) AS BIGINT)
           OR s.c_name <> t.c_name)) AS is_change
  FROM base t FULL OUTER JOIN delta s ON t.c_custkey = s.c_custkey
)
SELECT c_custkey, tn AS c_name, tb AS c_acctbal,
       DATE '2020-01-01' AS valid_from, DATE '2024-06-01' AS valid_to,
       CAST(0 AS BIGINT) AS is_current
FROM j WHERE is_change
UNION ALL
SELECT c_custkey, COALESCE(sn, tn) AS c_name,
       COALESCE(sb, tb) AS c_acctbal,
       CASE WHEN tk IS NULL OR is_change THEN DATE '2024-06-01'
            ELSE DATE '2020-01-01' END AS valid_from,
       CAST(NULL AS DATE) AS valid_to,
       CAST(1 AS BIGINT) AS is_current
FROM j
"""


SPECS: dict[str, QuerySpec] = {
    "sink_scd2_merge": QuerySpec(
        sink_scd2_merge, _SCD2_SQL,
        "SCD type-2 versioning merge: close-old + open-new from ONE "
        "full-outer join (exchange reused), no-op updates suppressed"),
    "sink_merge_upsert": QuerySpec(
        sink_merge_upsert, _MERGE_SQL,
        "MERGE/upsert as one full-outer join + coalesce — the "
        "Delta/Iceberg MERGE plan, no read-modify-write loop"),
    "flagship_top_customers": QuerySpec(flagship, _FLAGSHIP_SQL),
    "join_salted_skew": QuerySpec(salted_skew_join, _SALTED_SQL),
    "join_asof_last_value": QuerySpec(asof_last_purchase, _ASOF_SQL),
    "join_asof_next_value": QuerySpec(
        asof_next_purchase, _ASOF_FWD_SQL,
        "forward as-of join (next purchase at-or-after each view) — "
        "ts-descending union+window, one shuffle"),
    "window_trailing_hour": QuerySpec(window_trailing_hour, _TRAILING_SQL),
    "sink_partitioned_roundtrip": QuerySpec(
        sink_partitioned_roundtrip, _SINK_PART_SQL,
        "S9 overwrite sink + Hive partitioning + pruned read-back — "
        "the write path under the value-hash gate"),
    "sink_csv_roundtrip": QuerySpec(
        sink_csv_roundtrip, _SINK_CSV_SQL,
        "QuickStatements long format through a real CSV sink and "
        "back — RFC-4180 quoting exercised with salted commas/quotes"),
    "sink_append_roundtrip": QuerySpec(
        sink_append_roundtrip, _SINK_APPEND_SQL,
        "S8 append sink, two incremental batches reconciled on "
        "read-back"),
    "agg_rollup_hierarchy": QuerySpec(
        agg_rollup_hierarchy, _ROLLUP_SQL,
        "ROLLUP region→nation with grouping_id — one Expand pass, "
        "map-side combinable"),
    "agg_cube_two_dim": QuerySpec(
        agg_cube_two_dim, _CUBE_SQL,
        "CUBE (status, priority): all four grouping sets from one "
        "Expand pass"),
    "agg_grouping_sets": QuerySpec(
        agg_grouping_sets, _GROUPING_SETS_SQL,
        "explicit GROUPING SETS (the general form): chosen levels "
        "only, one Expand pass, gid-tagged"),
    "ts_ewma_decay": QuerySpec(
        ts_ewma_decay, _EWMA_SQL,
        "per-user exponentially time-decayed value total at the last "
        "event (closed-form, order-free) — one shared-partitioning "
        "shuffle"),
    "ts_resample_hourly": QuerySpec(
        ts_resample_hourly, _RESAMPLE_SQL,
        "gap-filled hourly resampling (time_bucket_gapfill): "
        "broadcast spine ⋈ map-side-combined counts, zero-filled"),
    "ts_sessionize": QuerySpec(
        ts_sessionize, _SESSIONIZE_SQL,
        "batch gap-sessionization: lag boundary flags + running-sum "
        "session numbering, one reused sort"),
    "join_range_interval": QuerySpec(
        range_interval_join, _RANGE_INTERVAL_SQL,
        "point-in-interval range join (purchase→session attribution) "
        "via the binned equi-join — shuffle ∝ events, never the "
        "per-key cross product"),
    "ts_active_time": QuerySpec(
        ts_active_time, _ACTIVE_TIME_SQL,
        "per-user interval-union coverage (merged 10-min activity "
        "windows): one sorted window sweep, no self-join"),
    "ts_anomaly_zscore": QuerySpec(
        ts_anomaly_zscore, _ANOMALY_SQL,
        "hourly volume anomalies per event type: integer-moment "
        "z-scores (no engine stddev), broadcast stats join"),
    "ts_funnel_steps": QuerySpec(
        ts_funnel_steps, _FUNNEL_SQL,
        "view→click→purchase funnel: ordered conditional-min steps, "
        "no event-table self-joins"),
    "ts_cohort_retention": QuerySpec(
        ts_cohort_retention, _COHORT_SQL,
        "first-activity-day cohorts × day-offset active counts"),
    "agg_pricing_summary": QuerySpec(q1_pricing_summary, _Q1_SQL),
    "agg_string_agg_per_key": QuerySpec(string_agg_per_key, _STRING_AGG_SQL),
    "agg_freq_count": QuerySpec(freq_count, _FREQ_SQL),
    "agg_groupby_max_all": QuerySpec(groupby_max_all, _GBMAX_SQL),
    "agg_distinct_count_totals": QuerySpec(distinct_count_totals, _DCOUNT_SQL),
    "agg_horizontal_rowwise": QuerySpec(horizontal_agg, _HORIZ_SQL),
    "agg_year_distinct": QuerySpec(year_distinct_agg, _YEAR_SQL),
    "agg_histogram_buckets": QuerySpec(histogram_buckets, _HIST_SQL),
    "filter_project_regex": QuerySpec(filter_project_regex, _FILTER_SQL),
    "filter_distinct_keyed": QuerySpec(distinct_keyed, _DISTINCT_SQL),
    "filter_time_range": QuerySpec(time_range_filter, _TIMERANGE_SQL),
    "filter_deterministic_sample": QuerySpec(deterministic_sample, _SAMPLE_SQL),
    "join_left_enrich": QuerySpec(join_left_enrich, _JOIN_LEFT_SQL),
    "join_right_preserve": QuerySpec(join_right_preserve, _JOIN_RIGHT_SQL),
    "join_anti_incremental": QuerySpec(anti_join_incremental, _ANTI_SQL),
    "join_semi_active": QuerySpec(semi_join_active, _SEMI_SQL),
    "join_multi_key": QuerySpec(multi_key_join, _MULTIKEY_SQL),
    "join_argmax_best_match": QuerySpec(argmax_best_match, _ARGMAX_SQL),
    "join_self_blocked_pairs": QuerySpec(self_join_blocked_pairs, _SELFJOIN_SQL),
    "join_levenshtein_blocked": QuerySpec(levenshtein_blocked_join, _LEV_SQL),
    "window_surrogate_keys": QuerySpec(surrogate_keys, _SURR_SQL),
    "window_keep_first_dedupe": QuerySpec(keep_first_dedupe, _KEEPFIRST_SQL),
    "window_elect_canonical": QuerySpec(elect_canonical, _ELECT_SQL),
    "window_dense_rank": QuerySpec(dense_rank_scores, _DENSE_SQL),
    "window_longest_per_group": QuerySpec(longest_per_group, _LONGEST_SQL),
    "window_fill_down": QuerySpec(fill_down_events, _FILLDOWN_SQL),
    "sort_top_k_global": QuerySpec(top_k_global, _TOPK_SQL),
    "setop_union_align": QuerySpec(union_align, _UNION_SQL),
    "setop_minus": QuerySpec(set_minus, _MINUS_SQL),
    "setop_bind_cols": QuerySpec(
        bind_cols_rowid, _BIND_COLS_SQL,
        "U2 bind_cols: positional concat via two-pass dense ids on "
        "both sides — no single-partition row_number"),
    "reshape_explode_words": QuerySpec(explode_words, _EXPLODE_SQL),
    "reshape_split_columns": QuerySpec(split_columns, _SPLIT_SQL),
    "reshape_melt_long": QuerySpec(melt_long, _MELT_SQL),
    "reshape_pivot_status": QuerySpec(pivot_status_counts, _PIVOT_SQL),
    "fn_case_cascade": QuerySpec(case_cascade, _CASE_SQL),
    "fn_iri_template": QuerySpec(iri_template, _IRI_SQL),
    "fn_regex_extract_id": QuerySpec(regex_extract_ids, _REGEX_ID_SQL),
    "fn_json_extract": QuerySpec(json_extract_props, _JSON_SQL),
    "fn_fingerprint_keys": QuerySpec(fingerprint_keys, _FP_SQL),
}
