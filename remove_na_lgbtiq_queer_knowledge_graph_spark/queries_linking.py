"""Entity-linking / publishing / NER / date-precision / QA queries
(SURVEY.md §2 Phase 4 + §5 assertion ops) with DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.dates import parse_date_multi, wikibase_time
from .operators.linking import (
    best_match_per_entity,
    label_cascade,
    quickstatements_long,
)
from .operators.ner import extract_span, gazetteer_match, model_ner
from .spec import QuerySpec, t


# ---------------------------------------------------------------------------
# Entity linking (FIXTURES §4 el_matches shape)
# ---------------------------------------------------------------------------

def el_best_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """el_matches best-match selection: candidate links (blocked fuzzy
    join) ranked by confidence hierarchy then distance, best per entity
    (`book-authors-viaf.R:52-58`; hierarchy tiers `04-persons.R:627`)."""
    c = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_id"),
        F.regexp_replace("c_name", "Customer", "X").alias("cn"),
        F.col("c_nationkey").alias("nk"),
    )
    s = t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("external_id"),
        F.regexp_replace("s_name", "Supplier", "X").alias("sn"),
        F.col("s_nationkey").alias("nk"),
    )
    cand = (
        c.join(s, "nk")
        .withColumn("dist", F.levenshtein("cn", "sn").cast("long"))
        .filter(F.col("dist") <= 3)
        .withColumn(
            "hierarchy",
            F.when(F.col("dist") == 0, 1)
            .when(F.col("dist") <= 2, 2)
            .otherwise(3)
            .cast("long"),
        )
    )
    best = best_match_per_entity(
        cand, "entity_id",
        [F.col("hierarchy"), F.col("dist"), F.col("external_id")],
    )
    return best.select("entity_id", "external_id", "dist", "hierarchy")


_EL_BEST_SQL = """
WITH cand AS (
  SELECT c_custkey AS entity_id, s_suppkey AS external_id,
         CAST(levenshtein(replace(c_name, 'Customer', 'X'),
                          replace(s_name, 'Supplier', 'X')) AS BIGINT) AS dist
  FROM customer JOIN supplier ON c_nationkey = s_nationkey
  WHERE levenshtein(replace(c_name, 'Customer', 'X'),
                    replace(s_name, 'Supplier', 'X')) <= 3
),
tiered AS (
  SELECT *, CAST(CASE WHEN dist = 0 THEN 1 WHEN dist <= 2 THEN 2 ELSE 3 END AS BIGINT) AS hierarchy
  FROM cand
)
SELECT entity_id, external_id, dist, hierarchy FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY entity_id
    ORDER BY hierarchy, dist, external_id) AS rk
  FROM tiered
) WHERE rk = 1
"""


def el_label_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: per-language label fallback — display label = first non-null
    of Lde/Len (`04-persons.R:478-483` label columns)."""
    p = t(spark, sf_dir, "part")
    with_langs = p.select(
        "p_partkey",
        F.when(F.col("p_size") % 3 == 0, None)
        .otherwise(F.upper("p_name"))
        .alias("label_de"),
        F.col("p_name").alias("label_en"),
    )
    return label_cascade(
        with_langs, "display_label", F.col("label_de"), F.col("label_en")
    )


_EL_CASCADE_SQL = """
SELECT p_partkey,
       CASE WHEN p_size % 3 = 0 THEN NULL ELSE upper(p_name) END AS label_de,
       p_name AS label_en,
       COALESCE(CASE WHEN p_size % 3 = 0 THEN NULL ELSE upper(p_name) END, p_name) AS display_label
FROM part
"""


def publish_quickstatements(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S12+R3+W1: wide supplier rows → long (item, property, value)
    QuickStatements with 20-item batch numbers (`04-persons.R:521-533`)."""
    s = t(spark, sf_dir, "supplier")
    wide = s.select(
        F.concat(F.lit("item:"), F.col("s_suppkey")).alias("item"),
        F.col("s_name").alias("Lde"),
        F.concat(F.lit("Q_nation_"), F.col("s_nationkey")).alias("P17"),
        F.col("s_acctbal").alias("P2218"),
    )
    return quickstatements_long(
        wide, "item",
        {"Lde": F.col("Lde"), "P17": F.col("P17"), "P2218": F.col("P2218")},
    )


_QS_SQL = """
WITH wide AS (
  SELECT 'item:' || CAST(s_suppkey AS VARCHAR) AS item, s_name AS lde,
         'Q_nation_' || CAST(s_nationkey AS VARCHAR) AS p17,
         CAST(s_acctbal AS VARCHAR) AS p2218
  FROM supplier
),
long AS (
  SELECT item, 'Lde' AS property, lde AS value FROM wide
  UNION ALL SELECT item, 'P17', p17 FROM wide
  UNION ALL SELECT item, 'P2218', p2218 FROM wide
),
batches AS (
  SELECT item, CAST((ROW_NUMBER() OVER (ORDER BY item) - 1) // 20 AS BIGINT) AS batch
  FROM (SELECT DISTINCT item FROM long)
)
SELECT l.item, l.property, l.value, b.batch
FROM long l JOIN batches b ON l.item = b.item
WHERE l.value IS NOT NULL
"""



def publish_persons_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S12 end-to-end: the 04-persons publishing flow as ONE Catalyst
    plan (`04-persons.R:52-75,521-533`) — entity-type flags from an
    aggregated semi-source (book/poster authorship), mint-or-CREATE item
    ids from the el_matches analog (existing FactGrid QID wins, else
    ``CREATE_<id>``), Wikidata gender enrichment coalesced in, then the
    wide row melts into QuickStatements long format with 20-item upload
    batches.

    Scale: the flags aggregation is map-side combinable on the FK; the
    el/wd match joins are FK equi-joins (AQE broadcasts the thin match
    dims); the melt is a union of projections (no shuffle); batch
    numbering reuses the two-pass dense_ids plan — no global window."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    ck = F.col("c_custkey")
    flags = o.groupBy("o_custkey").agg(
        F.max(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
         .alias("book_author"),
        F.max(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0))
         .alias("poster_author"),
    )
    # el_matches analog: every even entity already has a FactGrid QID,
    # every 3rd a Wikidata match carrying sex_or_gender
    el = c.filter(ck % 2 == 0).select(
        ck.alias("el_id"),
        F.concat(F.lit("Q"), (F.lit(500000) + ck).cast("string"))
         .alias("external_id"),
    )
    wd = c.filter(ck % 3 == 0).select(
        ck.alias("wd_id"),
        F.when(ck % 6 == 0, F.lit("Q6581097")).otherwise(F.lit("Q6581072"))
         .alias("gender"),
    )
    persons = (
        c.join(flags, ck == F.col("o_custkey"), "left")
        .join(el, ck == F.col("el_id"), "left")
        .join(wd, ck == F.col("wd_id"), "left")
        .withColumn(
            "item",
            F.coalesce(F.col("external_id"),
                       F.concat(F.lit("CREATE_"), ck.cast("string"))),
        )
    )
    return quickstatements_long(
        persons, "item",
        {
            "Lde": F.col("c_name"),
            "P2": F.lit("Q7"),
            "P131": F.lit("Q400012"),
            "P17": F.concat(F.lit("Q"),
                            (F.lit(225300) + F.col("c_nationkey"))
                            .cast("string")),
            "P97": F.col("gender"),
            "P106": F.when(F.col("book_author") == 1, F.lit("Q482980"))
                     .when(F.col("poster_author") == 1, F.lit("Q1028181")),
        },
    )


_PUBLISH_PERSONS_SQL = """
WITH flags AS (
  SELECT o_custkey,
         max(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS book_author,
         max(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS poster_author
  FROM orders GROUP BY o_custkey
), wide AS (
  SELECT CASE WHEN c_custkey % 2 = 0
              THEN 'Q' || CAST(500000 + c_custkey AS VARCHAR)
              ELSE 'CREATE_' || CAST(c_custkey AS VARCHAR) END AS item,
         c_name AS lde,
         'Q' || CAST(225300 + c_nationkey AS VARCHAR) AS p17,
         CASE WHEN c_custkey % 3 = 0 THEN
              CASE WHEN c_custkey % 6 = 0 THEN 'Q6581097'
                   ELSE 'Q6581072' END END AS p97,
         CASE WHEN coalesce(f.book_author, 0) = 1 THEN 'Q482980'
              WHEN coalesce(f.poster_author, 0) = 1 THEN 'Q1028181'
              END AS p106
  FROM customer LEFT JOIN flags f ON c_custkey = f.o_custkey
), long AS (
  SELECT item, 'Lde' AS property, lde AS value FROM wide
  UNION ALL SELECT item, 'P2', 'Q7' FROM wide
  UNION ALL SELECT item, 'P131', 'Q400012' FROM wide
  UNION ALL SELECT item, 'P17', p17 FROM wide
  UNION ALL SELECT item, 'P97', p97 FROM wide
  UNION ALL SELECT item, 'P106', p106 FROM wide
), batches AS (
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
# Date parsing with precision (F6)
# ---------------------------------------------------------------------------

_GERMAN = {1: "Januar", 2: "Februar", 3: "März", 4: "April", 5: "Mai", 6: "Juni",
           7: "Juli", 8: "August", 9: "September", 10: "Oktober", 11: "November",
           12: "Dezember"}


def fn_date_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: messy-archival-date parsing with precision — orders dates are
    rendered into the reference's seven formats (day 'd.M.yyyy', German
    day 'd. Monat yyyy', day RANGE 'd. – d. Monat yyyy', German
    month-name 'Monat yyyy', bare year, circa 'um yyyy', decade
    'yyyyer') and parsed back into struct(instant, precision) + the
    Wikibase time literal (`15-chronik-events.R:56-123`; the
    German-day/range/circa arms are round-13 additions covering the
    formats the parser used to drop)."""
    o = t(spark, sf_dir, "orders")
    month_name = F.lit("?")
    for m, name in _GERMAN.items():
        month_name = F.when(F.month("o_orderdate") == m, name).otherwise(month_name)
    k = F.col("o_orderkey") % 7
    raw = (
        F.when(
            k == 0,
            F.concat(F.dayofmonth("o_orderdate"), F.lit("."),
                     F.month("o_orderdate"), F.lit("."), F.year("o_orderdate")),
        )
        .when(k == 1,
              F.concat(month_name, F.lit(" "), F.year("o_orderdate")))
        .when(k == 2, F.year("o_orderdate").cast("string"))
        .when(k == 4,
              F.concat(F.dayofmonth("o_orderdate"), F.lit(". "),
                       month_name, F.lit(" "), F.year("o_orderdate")))
        .when(k == 5,
              F.concat(F.dayofmonth("o_orderdate"), F.lit(". – "),
                       F.least(F.dayofmonth("o_orderdate") + 2, F.lit(28)),
                       F.lit(". "), month_name, F.lit(" "),
                       F.year("o_orderdate")))
        .when(k == 6, F.concat(F.lit("um "),
                               F.year("o_orderdate").cast("string")))
        .otherwise(
            F.concat((F.floor(F.year("o_orderdate") / 10) * 10).cast("int"), F.lit("er"))
        )
    )
    parsed = parse_date_multi(raw)
    return o.select(
        "o_orderkey",
        raw.alias("raw_date"),
        parsed["instant"].alias("instant"),
        parsed["precision"].cast("long").alias("precision"),
        wikibase_time(parsed).alias("wikibase_literal"),
    )


_MONTH_DE = "CASE month(o_orderdate) " + " ".join(
    f"WHEN {m} THEN '{name}'" for m, name in _GERMAN.items()
) + " END"
_DATE_PRECISION_SQL = f"""
WITH cls AS (
  SELECT o_orderkey, o_orderdate, o_orderkey % 7 AS m,
         {_MONTH_DE} AS mname
  FROM orders
), shaped AS (
  SELECT o_orderkey, o_orderdate, m, mname,
       CASE WHEN m = 0 THEN CAST(day(o_orderdate) AS VARCHAR) || '.' || CAST(month(o_orderdate) AS VARCHAR) || '.' || CAST(year(o_orderdate) AS VARCHAR)
            WHEN m = 1 THEN mname || ' ' || CAST(year(o_orderdate) AS VARCHAR)
            WHEN m = 2 THEN CAST(year(o_orderdate) AS VARCHAR)
            WHEN m = 4 THEN CAST(day(o_orderdate) AS VARCHAR) || '. ' || mname || ' ' || CAST(year(o_orderdate) AS VARCHAR)
            WHEN m = 5 THEN CAST(day(o_orderdate) AS VARCHAR) || '. – ' || CAST(least(day(o_orderdate) + 2, 28) AS VARCHAR) || '. ' || mname || ' ' || CAST(year(o_orderdate) AS VARCHAR)
            WHEN m = 6 THEN 'um ' || CAST(year(o_orderdate) AS VARCHAR)
            ELSE CAST(CAST(floor(year(o_orderdate) / 10) * 10 AS INTEGER) AS VARCHAR) || 'er' END AS raw_date,
       CASE WHEN m IN (0, 4, 5) THEN CAST(o_orderdate AS DATE)
            WHEN m = 1 THEN CAST(date_trunc('month', o_orderdate) AS DATE)
            WHEN m IN (2, 6) THEN CAST(date_trunc('year', o_orderdate) AS DATE)
            ELSE CAST(make_date(CAST(floor(year(o_orderdate) / 10) * 10 AS INTEGER), 1, 1) AS DATE) END AS instant,
       CAST(CASE WHEN m IN (0, 4, 5) THEN 11 WHEN m = 1 THEN 10
                 WHEN m IN (2, 6) THEN 9 ELSE 8 END AS BIGINT) AS precision
  FROM cls
)
SELECT o_orderkey, raw_date, instant, precision,
       '+' || strftime(instant, '%Y-%m-%d')
         || 'T00:00:00Z/' || CAST(precision AS VARCHAR) AS wikibase_literal
FROM shaped
"""


# ---------------------------------------------------------------------------
# NER (T11-T14)
# ---------------------------------------------------------------------------

_GAZ = {"spark": "TOOL", "customer": "ROLE", "window": "CONCEPT", "batch": "CONCEPT"}


def ner_gazetteer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T13: gazetteer NER — broadcast term list over documents, hit
    counts + first offset (`spacy_ner.py:146-176`)."""
    return gazetteer_match(t(spark, sf_dir, "documents"), "doc_id", "text", _GAZ)


_GAZ_VALUES = ", ".join(f"('{t_}', '{l}')" for t_, l in _GAZ.items())
_NER_GAZ_SQL = f"""
WITH gaz(term, label) AS (VALUES {_GAZ_VALUES})
SELECT doc_id, term, label,
       CAST(len(string_split(text, term)) - 1 AS BIGINT) AS n_hits,
       CAST(strpos(text, term) AS BIGINT) AS start
FROM documents CROSS JOIN gaz
WHERE len(string_split(text, term)) - 1 > 0
"""


def ner_span_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T14: span → surface re-extraction by (start, length) offsets from
    the gazetteer spans (`chronik-after-ner.R:39-49`)."""
    spans = gazetteer_match(
        t(spark, sf_dir, "documents"), "doc_id", "text", _GAZ
    ).withColumn("length", F.length("term").cast("long"))
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    joined = spans.join(docs, "doc_id")
    return extract_span(joined, "text", "start", "length").select(
        "doc_id", "term", "label", "start", "surface"
    )


_NER_SPAN_SQL = f"""
WITH gaz(term, label) AS (VALUES {_GAZ_VALUES}),
spans AS (
  SELECT doc_id, term, label,
         CAST(strpos(text, term) AS BIGINT) AS start, length(term) AS len
  FROM documents CROSS JOIN gaz
  WHERE len(string_split(text, term)) - 1 > 0
)
SELECT s.doc_id, s.term, s.label, s.start,
       trim(substring(d.text, CAST(s.start AS INTEGER), CAST(s.len AS INTEGER))) AS surface
FROM spans s JOIN documents d ON s.doc_id = d.doc_id
"""


def ner_rule_years(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T11: regex rule NER — numeric-literal shapes in event props
    (`spacy_ner.py:32-134` DATE_*/shape patterns)."""
    e = t(spark, sf_dir, "events")
    return (
        e.select(
            "event_id",
            F.explode(
                F.regexp_extract_all(F.col("props"), F.lit(r"[0-9]+"), 0)
            ).alias("surface"),
        )
        .withColumn("label", F.lit("NUM"))
    )


_NER_RULE_SQL = """
SELECT event_id, unnest(regexp_extract_all(props, '[0-9]+')) AS surface, 'NUM' AS label
FROM events
"""


def ner_model_stub_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T12: batched 'model' NER over mapInPandas — deterministic stub
    standing in for HF token-classification inference
    (`flair_ner.py:23-53`)."""
    return model_ner(t(spark, sf_dir, "documents"), "doc_id", "text")


_NER_MODEL_SQL = """
WITH toks AS (
  -- regex split on ANY whitespace run, matching the model stub's
  -- Python str.split(); a single-space split would diverge on the
  -- first document with a newline/tab/double space
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '[ \\t\\n\\x0b\\f\\r]+')) AS tok
  FROM documents
)
SELECT doc_id, tok AS entity,
       CASE tok WHEN 'spark' THEN 'TOOL' WHEN 'customer' THEN 'ROLE'
                WHEN 'window' THEN 'CONCEPT' END AS label
FROM toks WHERE tok IN ('spark', 'customer', 'window')
"""


# ---------------------------------------------------------------------------
# Reified statements (G18), summary stats (A8), QA assertions (§5)
# ---------------------------------------------------------------------------

def graph_reified_best_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G18: Wikibase-style reified statements — statement nodes with
    rank; select amounts of best-rank ('O' status) order statements
    (`time-items.rq:57-60`, `network-02-starting-point.rq:33-35`)."""
    o = t(spark, sf_dir, "orders")
    stmt = F.concat(F.lit("stmt:"), F.col("o_orderkey").cast("string"))
    tri = (
        o.select(stmt.alias("subject"), F.lit("subj").alias("predicate"),
                 F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).alias("object"))
        .unionByName(o.select(stmt.alias("subject"), F.lit("rank").alias("predicate"),
                              F.when(F.col("o_orderstatus") == "O", "BestRank")
                              .otherwise("NormalRank").alias("object")))
        .unionByName(o.select(stmt.alias("subject"), F.lit("amount").alias("predicate"),
                              F.col("o_totalprice").cast("string").alias("object")))
    )
    best = tri.filter((F.col("predicate") == "rank") & (F.col("object") == "BestRank")) \
        .select(F.col("subject").alias("stmt"))
    subj = tri.filter(F.col("predicate") == "subj").select(
        F.col("subject").alias("stmt"), F.col("object").alias("entity"))
    amt = tri.filter(F.col("predicate") == "amount").select(
        F.col("subject").alias("stmt"), F.col("object").alias("amount"))
    return best.join(subj, "stmt").join(amt, "stmt").select("stmt", "entity", "amount")


_REIFIED_SQL = """
SELECT 'stmt:' || CAST(o_orderkey AS VARCHAR) AS stmt,
       'c:' || CAST(o_custkey AS VARCHAR) AS entity,
       CAST(o_totalprice AS VARCHAR) AS amount
FROM orders WHERE o_orderstatus = 'O'
"""


def agg_sketch_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregations — the 100 TB form of distinct-count/quantile:
    HLL ``approx_count_distinct`` (mergeable registers, one pass, O(kB)
    state vs a full shuffle of distinct keys) and ``percentile_approx``.

    Raw sketch values are engine-specific, so they can't hash-match a
    DuckDB oracle; instead the *error contract* is made oracle-checkable:
    exact values ride along, plus booleans asserting what the sketches
    actually GUARANTEE — HLL within 10% of the exact distinct count
    (rsd 5%; HLL register merge is commutative, so the value is
    deterministic per dataset), and the quantile sketch's returned
    element having a feasible RANK within ``n/accuracy + 1`` of the
    median rank (the ``agg_quantile_sketch`` audit — a VALUE-closeness
    claim was unfounded: GK rank accuracy bounds rank, not value, and a
    2-row group with values {1, 100} returns the element 1 against an
    interpolated exact median of 50.5; round-13 review).  The oracle
    states the exact values and literal TRUE, so a sketch regression
    breaks the hash.
    """
    e = t(spark, sf_dir, "events")
    acc = 10000
    sk = e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("hll_users"),
        F.countDistinct("user_id").alias("n_users"),
        F.percentile_approx("value", F.lit(0.5), F.lit(acc))
         .alias("approx_median"),
        F.count("*").alias("n"),
    )
    j = e.select("event_type", "value").join(F.broadcast(sk), "event_type")
    g = j.groupBy("event_type").agg(
        F.first("n_users").alias("n_users"),
        F.first("n").alias("n"),
        F.first("hll_users").alias("hll_users"),
        F.sum(F.when(F.col("value") < F.col("approx_median"), 1)
              .otherwise(0)).cast("long").alias("__lt"),
        F.sum(F.when(F.col("value") <= F.col("approx_median"), 1)
              .otherwise(0)).cast("long").alias("__le"),
    )
    n = F.col("n").cast("double")
    tol = n / F.lit(float(acc)) + F.lit(1.0)
    rank_ok = (
        (F.col("__lt").cast("double") + F.lit(1.0)
         <= F.lit(0.5) * n + tol)
        & (F.col("__le").cast("double") >= F.lit(0.5) * n - tol)
    )
    hll_ok = (
        F.abs(F.col("hll_users") - F.col("n_users"))
        <= 0.1 * F.abs(F.col("n_users"))
    )
    return g.select(
        "event_type",
        "n_users",
        "n",
        hll_ok.alias("hll_within_10pct"),
        rank_ok.alias("median_rank_ok"),
    )


_SKETCH_SQL = """
SELECT event_type,
       count(DISTINCT user_id) AS n_users,
       count(*) AS n,
       true AS hll_within_10pct,
       true AS median_rank_ok
FROM events GROUP BY 1
"""


_CMS_D, _CMS_K = 4, 20


def cms_bucket_structs(key, d: int = _CMS_D):
    """The CMS hash scheme — bucket(r, key) = first 2 hex chars of
    ``md5('{r}|' || key)`` — as an array of (r, bucket) structs to
    explode.  ONE copy shared by the batch sketch
    (:func:`agg_count_min_topk`) and the streaming twin
    (``streaming.windows.streaming_cms_buckets``): a change to d, the
    salt format, or the bucket width must reach both or the twins stop
    being comparable.  SQL twin: ``_CMS_BUCKETS`` below."""
    return F.array(*[
        F.struct(
            F.lit(r).alias("r"),
            F.substring(
                F.md5(F.concat(F.lit(f"{r}|"), key.cast("string"))), 1, 2)
             .alias("bucket"),
        )
        for r in range(d)
    ])


def agg_count_min_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters — the streaming/100 TB form of
    "top users by event count".

    The sketch is d=4 rows × 256 buckets; bucket(r, key) = first 2 hex
    chars of ``md5(r|key)``, so it is identical in any engine and the
    whole pipeline is oracle-checkable (same trick as the md5-minhash
    banding).  Bucket totals are plain partial-aggregated sums — the
    sketch state is O(d·256) and mergeable, vs O(distinct keys) for the
    exact count; estimate(key) = min over rows of its bucket total
    (overestimates only, by colliding keys).  Top-k by estimate with a
    total-order tie-break; the exact count rides along as the oracle
    anchor — at 100 TB you would drop it and keep only the sketch.
    """
    from .spec import materialize

    e = t(spark, sf_dir, "events")
    exact = e.groupBy("user_id").agg(F.count("*").alias("exact"))
    rows_arr = cms_bucket_structs(F.col("user_id"))
    # materialized: keyed feeds both the bucket-total aggregate and the
    # estimate join, and Spark re-executes identical subplans per
    # branch (the er_blocking_stats rule; round-13 review — the events
    # scan + user shuffle + explode ran twice)
    keyed = materialize(exact.select(
        "user_id", "exact", F.explode(rows_arr).alias("b")
    ).select("user_id", "exact", "b.r", "b.bucket"))
    cms = keyed.groupBy("r", "bucket").agg(F.sum("exact").alias("total"))
    est = (
        keyed.join(cms, ["r", "bucket"])
        .groupBy("user_id", "exact")
        .agg(F.min("total").alias("cms_estimate"))
    )
    return (
        est.orderBy(F.col("cms_estimate").desc(), F.col("user_id"))
        .limit(_CMS_K)
        .select("user_id", "cms_estimate", "exact")
    )


_CMS_BUCKETS = " , ".join(
    f"({r}, substring(md5('{r}|' || CAST(user_id AS VARCHAR)), 1, 2))"
    for r in range(_CMS_D)
)
_CMS_SQL = f"""
WITH exact AS (
  SELECT user_id, count(*) AS exact FROM events GROUP BY 1
),
keyed AS (
  SELECT user_id, exact, b.r, b.bucket
  FROM exact, LATERAL (VALUES {_CMS_BUCKETS}) AS b(r, bucket)
),
cms AS (
  SELECT r, bucket, sum(exact) AS total FROM keyed GROUP BY 1, 2
),
est AS (
  SELECT k.user_id, k.exact, min(c.total) AS cms_estimate
  FROM keyed k JOIN cms c ON k.r = c.r AND k.bucket = c.bucket
  GROUP BY 1, 2
)
SELECT user_id, CAST(cms_estimate AS BIGINT) AS cms_estimate, exact
FROM est ORDER BY cms_estimate DESC, user_id LIMIT {_CMS_K}
"""


def stats_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: per-group summary statistics (count/min/max/exact mean)
    (`plot-full-network.qmd:130-139` summary())."""
    c = t(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"),
        F.min("c_acctbal").alias("min_bal"),
        F.max("c_acctbal").alias("max_bal"),
        (F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double") / F.count("*"))
        .alias("mean_bal"),
    )


_SUMMARY_SQL = """
SELECT c_mktsegment, count(*) AS n, min(c_acctbal) AS min_bal, max(c_acctbal) AS max_bal,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS mean_bal
FROM customer GROUP BY 1
"""


def qa_unique_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§5 uniqueness assertion as a query: key groups violating a
    uniqueness expectation (testdat::expect_unique,
    `poster-books/01:112-115`) — customers sharing (nation, segment,
    acctbal) would collide as ER candidates."""
    c = t(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey", "c_mktsegment", "c_acctbal")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
    )


_QA_UNIQUE_SQL = """
SELECT c_nationkey, c_mktsegment, c_acctbal, count(*) AS n
FROM customer GROUP BY 1, 2, 3 HAVING count(*) > 1
"""


def qa_fk_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FK-constraint examination report (`books.R:380`
    ``dm_examine_constraints``): one row per declared FK with the number
    of checked rows and of orphans — left-anti joins, so at scale each
    check is one shuffle on the key (genuine dims broadcast; the
    orders parent side is NOT hinted — round-13 review: force-
    broadcasting the second-largest table's distinct keys is exactly
    the driver-OOM regime at scale, so that check lets AQE pick).
    All-zero orphan
    counts on the driver's star schema, like the reference's passing
    constraints."""
    checks = [
        ("orders.o_custkey→customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem.l_orderkey→orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("supplier.s_nationkey→nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
        ("nation.n_regionkey→region", "nation", "n_regionkey", "region", "r_regionkey"),
    ]
    out = None
    for name, child, ck, parent, pk in checks:
        c = t(spark, sf_dir, child)
        # single pass, no driver-side action: left join against the
        # (unique) PK side, count rows and null-hits together
        p = t(spark, sf_dir, parent).select(
            F.col(pk).alias(ck), F.lit(1).alias("__hit")
        )
        if parent != "orders":  # bounded dims only; facts go to AQE
            p = F.broadcast(p)
        row = (
            c.select(ck)
            .join(p, ck, "left")
            .agg(
                F.count("*").alias("n_rows"),
                F.sum(F.when(F.col("__hit").isNull(), 1).otherwise(0)).alias(
                    "n_orphans"
                ),
            )
            .select(
                F.lit(name).alias("fk"),
                F.col("n_rows").cast("long"),
                F.col("n_orphans").cast("long"),
            )
        )
        out = row if out is None else out.unionAll(row)
    return out


_QA_FK_SQL = """
SELECT 'orders.o_custkey→customer' AS fk, (SELECT count(*) FROM orders) AS n_rows,
       (SELECT count(*) FROM orders o WHERE NOT EXISTS
          (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS n_orphans
UNION ALL
SELECT 'lineitem.l_orderkey→orders', (SELECT count(*) FROM lineitem),
       (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
          (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
UNION ALL
SELECT 'supplier.s_nationkey→nation', (SELECT count(*) FROM supplier),
       (SELECT count(*) FROM supplier s WHERE NOT EXISTS
          (SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey))
UNION ALL
SELECT 'nation.n_regionkey→region', (SELECT count(*) FROM nation),
       (SELECT count(*) FROM nation n WHERE NOT EXISTS
          (SELECT 1 FROM region r WHERE r.r_regionkey = n.n_regionkey))
"""


def qa_mapping_totality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§5 domain-mapping totality: rows whose domain value fell through
    the mapping cascade — the \"I need a translation\" sentinel must
    surface, not vanish (`04-persons.R:190-193`)."""
    o = t(spark, sf_dir, "orders")
    mapped = F.when(F.col("o_orderpriority") == "1-URGENT", "now") \
        .when(F.col("o_orderpriority") == "2-HIGH", "soon") \
        .when(F.col("o_orderpriority") == "3-MEDIUM", "later") \
        .otherwise("NEEDS MAPPING")
    return (
        o.withColumn("mapped", mapped)
        .filter(F.col("mapped") == "NEEDS MAPPING")
        .groupBy("o_orderpriority", "mapped")
        .agg(F.count("*").alias("n"))
    )


_QA_TOTALITY_SQL = """
SELECT o_orderpriority, 'NEEDS MAPPING' AS mapped, count(*) AS n
FROM orders
-- NOT IN alone evaluates to NULL for a NULL priority and silently
-- drops the row the Spark side (correctly) maps to the sentinel —
-- the totality contract says unmapped values must SURFACE
WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH', '3-MEDIUM')
   OR o_orderpriority IS NULL
GROUP BY 1, 2
"""


SPECS: dict[str, QuerySpec] = {
    "el_best_match": QuerySpec(el_best_match, _EL_BEST_SQL),
    "el_label_cascade": QuerySpec(el_label_cascade, _EL_CASCADE_SQL),
    "publish_quickstatements": QuerySpec(publish_quickstatements, _QS_SQL),
    "publish_persons_pipeline": QuerySpec(
        publish_persons_pipeline, _PUBLISH_PERSONS_SQL,
        "04-persons.R end-to-end: flags, mint-or-CREATE ids, wikidata\n"
        "enrichment, QuickStatements long with batches"),
    "fn_date_precision": QuerySpec(fn_date_precision, _DATE_PRECISION_SQL),
    "ner_gazetteer": QuerySpec(ner_gazetteer, _NER_GAZ_SQL),
    "ner_span_extract": QuerySpec(ner_span_extract, _NER_SPAN_SQL),
    "ner_rule_years": QuerySpec(ner_rule_years, _NER_RULE_SQL),
    "ner_model_stub": QuerySpec(ner_model_stub_q, _NER_MODEL_SQL),
    "graph_reified_best_rank": QuerySpec(graph_reified_best_rank, _REIFIED_SQL),
    "stats_summary": QuerySpec(stats_summary, _SUMMARY_SQL),
    "agg_sketch_distinct": QuerySpec(agg_sketch_distinct, _SKETCH_SQL),
    "agg_count_min_topk": QuerySpec(agg_count_min_topk, _CMS_SQL),
    "qa_unique_violations": QuerySpec(qa_unique_violations, _QA_UNIQUE_SQL),
    "qa_mapping_totality": QuerySpec(qa_mapping_totality, _QA_TOTALITY_SQL),
    "qa_fk_constraints": QuerySpec(qa_fk_constraints, _QA_FK_SQL),
}
