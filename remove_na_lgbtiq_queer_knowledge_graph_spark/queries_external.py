"""External-service patterns (F11 geocode / F12 translate as mockable
DataFrame sources), extra string distances (F8 jw/osa), and the
reference's first-letter blocking rule — with DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.distances import jaro_winkler_sim
from .operators.similarity import candidate_pairs
from .spec import QuerySpec, t


def external_geocode_mock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11: geocoding as an external-service source.  The OSM geocoder
    (`tidygeocoder::geocode`, `01-addresses.R:157-162`) is external; the
    engine models it as a DataFrame-returning source — here a
    deterministic mock keyed on the address — and builds the
    ``"@lat/lon"`` literal the reference constructs (`01-addresses.R:77`).
    A real deployment swaps the mock for a REST-backed mapInPandas
    fetch with identical schema."""
    n = t(spark, sf_dir, "nation")
    geocoded = n.select(
        F.col("n_name").alias("address"),
        ((F.col("n_nationkey") * 7) % 180 - 90 + 0.5).cast("double").alias("lat"),
        ((F.col("n_nationkey") * 13) % 360 - 180 + 0.25).cast("double").alias("lon"),
    )
    return geocoded.withColumn(
        "coordinate_literal",
        F.concat(F.lit("@"), F.col("lat").cast("string"), F.lit("/"),
                 F.col("lon").cast("string")),
    )


_GEOCODE_SQL = """
SELECT n_name AS address,
       CAST((n_nationkey * 7) % 180 - 90 + 0.5 AS DOUBLE) AS lat,
       CAST((n_nationkey * 13) % 360 - 180 + 0.25 AS DOUBLE) AS lon,
       '@' || CAST(CAST((n_nationkey * 7) % 180 - 90 + 0.5 AS DOUBLE) AS VARCHAR)
           || '/' || CAST(CAST((n_nationkey * 13) % 360 - 180 + 0.25 AS DOUBLE) AS VARCHAR)
         AS coordinate_literal
FROM nation
"""


def external_translate_mock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12: translation as a broadcast lookup with an untranslated
    sentinel (the DeepL flow `04-persons.R:333-335` + the totality check
    `04-persons.R:190-193`)."""
    r = t(spark, sf_dir, "region")
    translations = spark.createDataFrame(
        [("AFRICA", "Afrika"), ("AMERICA", "Amerika"), ("ASIA", "Asien"),
         ("EUROPE", "Europa")],
        ["r_name", "name_de"],
    )
    return (
        r.join(F.broadcast(translations), "r_name", "left")
        .select(
            "r_regionkey", "r_name",
            F.coalesce("name_de", F.lit("I need a translation")).alias("name_de"),
        )
    )


_TRANSLATE_SQL = """
WITH tr(r_name, name_de) AS (VALUES
  ('AFRICA', 'Afrika'), ('AMERICA', 'Amerika'), ('ASIA', 'Asien'), ('EUROPE', 'Europa'))
SELECT r_regionkey, r.r_name,
       COALESCE(tr.name_de, 'I need a translation') AS name_de
FROM region r LEFT JOIN tr ON r.r_name = tr.r_name
"""


def er_first_letter_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7/J7: the reference's exact blocking rule — candidate pairs only
    within the same first letter of the (lowered) name
    (`entities/03-within-entities-v2-incl-chronik.R:64-78`)."""
    p = t(spark, sf_dir, "part")
    blocked = p.withColumn("first_letter", F.substring(F.lower("p_name"), 1, 1))
    return candidate_pairs(
        blocked, "p_partkey", "p_name", min_sim=0.75, metric="cosine",
        block_cols=["first_letter"],
    )


_FIRST_LETTER_SQL = """
WITH names AS (
  SELECT p_partkey AS id, substring(lower(p_name), 1, 1) AS blk,
         regexp_replace(lower(p_name), '[^a-z]', '', 'g') AS s
  FROM part
),
grams AS (
  SELECT id, blk, substring(s, CAST(i AS INTEGER), 2) AS gram, count(*) AS cnt
  FROM names, unnest(range(1, length(s))) t(i)
  WHERE length(s) >= 2
  GROUP BY 1, 2, 3
),
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


def fn_jaro_winkler_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 ``jw``: Jaro-Winkler scored pairs via the Arrow-batched pandas
    UDF, blocked by nation (`entities/03:68` uses jw in the v2 ER flow).
    The UDF follows the standard JW definition, so DuckDB's builtin
    ``jaro_winkler_similarity`` serves as the oracle — the UDF path
    itself is differentially checked."""
    s = t(spark, sf_dir, "supplier")
    a = s.select(F.col("s_suppkey").alias("id_1"), F.col("s_name").alias("n1"),
                 F.col("s_nationkey").alias("blk"))
    b = s.select(F.col("s_suppkey").alias("id_2"), F.col("s_name").alias("n2"),
                 F.col("s_nationkey").alias("blk"))
    return (
        a.join(b, "blk")
        .filter(F.col("id_1") < F.col("id_2"))
        .withColumn("jw", F.round(jaro_winkler_sim(F.col("n1"), F.col("n2")), 6))
        .filter(F.col("jw") >= 0.9)
        .select("id_1", "id_2", "jw")
    )


_JW_SQL = """
SELECT a.s_suppkey AS id_1, b.s_suppkey AS id_2,
       round(jaro_winkler_similarity(a.s_name, b.s_name), 6) AS jw
FROM supplier a JOIN supplier b
  ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey
WHERE round(jaro_winkler_similarity(a.s_name, b.s_name), 6) >= 0.9
"""


def fn_html_table_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3: HTML-table ingestion as an in-engine parse (the reference
    scrapes chronik tables with rvest, `data-gathering/chronik` flow).
    The HTML arrives as a string column (fetcher is the external part);
    cell extraction is a JVM-side regexp_extract_all — no UDF.  Here the
    HTML column is synthesized from part rows so the whole parse path is
    oracle-checkable."""
    p = t(spark, sf_dir, "part")
    html = F.concat(
        F.lit("<tr><td>"), F.col("p_name"), F.lit("</td><td>"),
        F.col("p_brand"), F.lit("</td><td>"), F.col("p_type"),
        F.lit("</td></tr>"),
    )
    cells = F.expr(r"regexp_extract_all(html, '<td>([^<]*)</td>', 1)")
    return (
        p.select(F.col("p_partkey").alias("row_id"), html.alias("html"))
        .select("row_id", F.posexplode(cells).alias("cell_idx", "cell"))
        .withColumn("cell_idx", F.col("cell_idx").cast("long"))
    )


_HTML_SQL = """
SELECT row_id, CAST(i - 1 AS BIGINT) AS cell_idx, cells[CAST(i AS INTEGER)] AS cell
FROM (
  SELECT p_partkey AS row_id,
         regexp_extract_all(
           '<tr><td>' || p_name || '</td><td>' || p_brand || '</td><td>'
             || p_type || '</td></tr>',
           '<td>([^<]*)</td>', 1) AS cells
  FROM part
), unnest(range(1, len(cells) + 1)) u(i)
"""


SPECS: dict[str, QuerySpec] = {
    "fn_html_table_extract": QuerySpec(fn_html_table_extract, _HTML_SQL),
    "external_geocode_mock": QuerySpec(external_geocode_mock, _GEOCODE_SQL),
    "external_translate_mock": QuerySpec(external_translate_mock, _TRANSLATE_SQL),
    "er_first_letter_block": QuerySpec(er_first_letter_block, _FIRST_LETTER_SQL),
    "fn_jaro_winkler_join": QuerySpec(fn_jaro_winkler_join, _JW_SQL),
}
