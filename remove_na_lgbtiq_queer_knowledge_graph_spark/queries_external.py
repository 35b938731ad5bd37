"""External-service patterns (F11 geocode / F12 translate as mockable
DataFrame sources), extra string distances (F8 jw/osa), and the
reference's first-letter blocking rule — with DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.numeric import round_half_away_col

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


def er_blocking_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-quality diagnostics for the reference's first-letter
    scheme — the numbers an ER engineer reads BEFORE running the
    quadratic step: per block, its size, its candidate-pair mass
    C(s,2), and its share of the scheme's total pair mass (6 dp).
    A single outsized block dominating pair share is the signal to
    re-block (the skewed-key bomb `join_salted_skew` exists for);
    total-pair share vs the unblocked C(n,2) is the reduction ratio.
    One count aggregate + a one-row total broadcast back — pure
    map-side-combinable arithmetic, no pair is ever generated."""
    from .spec import materialize

    p = t(spark, sf_dir, "part")
    # materialized: the aggregation subtree feeds BOTH the total and
    # the final select, and Spark re-executes identical subplans per
    # branch — without this the part scan + groupBy runs twice
    blocks = materialize(
        p.withColumn("blk", F.substring(F.lower("p_name"), 1, 1))
        .groupBy("blk")
        .agg(F.count(F.lit(1)).cast("long").alias("n_items"))
        # integer division (div), mirroring the oracle's `// 2`: the
        # double-division form rounds n·(n−1) above 2^53 — exactly the
        # huge-block regime this diagnostic exists to expose
        .withColumn(
            "n_pairs",
            F.expr("n_items * (n_items - 1) div 2").cast("long"))
    )
    tot = blocks.agg(F.sum("n_pairs").cast("long").alias("total_pairs"))
    return (
        blocks.crossJoin(F.broadcast(tot))
        .select(
            "blk", "n_items", "n_pairs",
            round_half_away_col(
                F.col("n_pairs") / F.col("total_pairs"), 6
            ).alias("pair_share"))
    )


_BLOCKING_STATS_SQL = """
WITH blocks AS (
  SELECT substring(lower(p_name), 1, 1) AS blk,
         CAST(count(*) AS BIGINT) AS n_items,
         CAST(count(*) * (count(*) - 1) // 2 AS BIGINT) AS n_pairs
  FROM part GROUP BY 1
),
tot AS (SELECT CAST(sum(n_pairs) AS BIGINT) AS total_pairs FROM blocks)
SELECT blk, n_items, n_pairs,
       round(n_pairs / total_pairs, 6) AS pair_share
FROM blocks CROSS JOIN tot
"""


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
        # the jw >= 0.9 filter duplicates the Arrow eval in the plan
        # (below-filter + survivors-only copies).  The §4.4
        # non-deterministic fence was tried and REJECTED: on Spark
        # 4.1.2 it fuses BOTH expression copies into one pre-filter
        # ArrowEvalPython node (2 evals on every pair; A/B was a wash
        # here only because the block sizes are small) — see the
        # rejection note at operators/ann.py::cosine.
        .withColumn("jw", round_half_away_col(jaro_winkler_sim(F.col("n1"), F.col("n2")), 6))
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


# ---------------------------------------------------------------------------
# S4: PDF layout ingestion (themengeschichtspfad.R:13-68)
# ---------------------------------------------------------------------------

def _pdf_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic per-word PDF layout table in the exact shape pdftools
    ``pdf_data(font_info=TRUE)`` emits — (page, pos, word, font_name,
    font_size).  No PDF codec ships in this container, so the layout
    metadata is derived deterministically from the documents corpus:
    first word = heading (12.0), second = bold location header (8.8),
    every 13th a caption (7.0), every 7th a source line (7.0), the rest
    body text (8.8 light)."""
    d = t(spark, sf_dir, "documents")
    words = d.select(
        F.col("doc_id").alias("page"),
        F.posexplode(
            F.split(F.trim(F.regexp_replace("text", r"[ \t\n\x0b\f\r]+", " ")), " ")
        ).alias("pos0", "word"),
    ).select(
        "page", (F.col("pos0") + 1).cast("long").alias("pos"), "word"
    )
    pos = F.col("pos")
    return words.select(
        "page", "pos", "word",
        F.when(pos == 1, F.lit(12.0))
         .when(pos == 2, F.lit(8.8))
         .when(pos % 13 == 0, F.lit(7.0))
         .when(pos % 7 == 0, F.lit(7.0))
         .otherwise(F.lit(8.8)).alias("font_size"),
        F.when(pos == 1, F.lit("AAAAAC+Univers"))
         .when(pos == 2, F.lit("AAAAAB+Univers-Bold"))
         .when(pos % 13 == 0, F.lit("AAAAAC+Univers"))
         .when(pos % 7 == 0, F.lit("AAAAAD+Univers-Light"))
         .otherwise(F.lit("AAAAAD+Univers-Light")).alias("font_name"),
    )


_PDF_WORDS_CTE = """
pdf_words AS (
  SELECT d.doc_id AS page, t.i AS pos, d.w[t.i] AS word,
         CASE WHEN t.i = 1 THEN 12.0 WHEN t.i = 2 THEN 8.8
              WHEN t.i % 13 = 0 THEN 7.0 WHEN t.i % 7 = 0 THEN 7.0
              ELSE 8.8 END AS font_size,
         CASE WHEN t.i = 1 THEN 'AAAAAC+Univers'
              WHEN t.i = 2 THEN 'AAAAAB+Univers-Bold'
              WHEN t.i % 13 = 0 THEN 'AAAAAC+Univers'
              WHEN t.i % 7 = 0 THEN 'AAAAAD+Univers-Light'
              ELSE 'AAAAAD+Univers-Light' END AS font_name
  FROM (SELECT doc_id,
               string_split(trim(regexp_replace(text, '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')), ' ') AS w
        FROM documents) d,
       unnest(range(1, len(d.w) + 1)) t(i)
)
"""

_CLASSIFY_CASE = """
  CASE WHEN regexp_matches(word, '^[0-9]{1,3}$') THEN 'page'
       WHEN font_size = 12.0 THEN 'heading'
       WHEN font_size = 8.8 AND font_name = 'AAAAAB+Univers-Bold' THEN 'location_header'
       WHEN font_size = 8.8 AND font_name = 'AAAAAD+Univers-Light' THEN 'p'
       WHEN font_size = 8.8 AND font_name = 'AAAAAC+Univers' THEN 'chapter_intro'
       WHEN font_size = 7.0 AND font_name = 'AAAAAB+Univers-Bold' THEN 'location_roof_line'
       WHEN font_size = 7.0 AND font_name = 'AAAAAC+Univers' THEN 'image_caption'
       WHEN font_size = 7.0 AND font_name = 'AAAAAD+Univers-Light' THEN 'source'
       ELSE 'none' END AS format
"""


# the book's content-page range — ONE copy feeding both Spark entry
# points AND both SQL twins (review fix: classify inlined the literals
# while the pipeline parameterized them; an adjustment could silently
# leave the two entries covering different page sets)
_CONTENT_PAGES = (14, 149)


def pdf_layout_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4: word-level format classification over the content pages —
    the reference's font/size/shape case_when
    (`themengeschichtspfad.R:36-49`) as a codegen when() cascade."""
    from .operators.pdf_layout import classify_layout

    lo, hi = _CONTENT_PAGES
    words = _pdf_words(spark, sf_dir).filter(
        (F.col("page") >= lo) & (F.col("page") < hi))
    return classify_layout(words).select("page", "pos", "word", "format")


_CONTENT_PAGES_PRED = (f"page >= {_CONTENT_PAGES[0]} "
                       f"AND page < {_CONTENT_PAGES[1]}")
_PDF_CLASSIFY_SQL = f"""
WITH {_PDF_WORDS_CTE}
SELECT page, pos, word, {_CLASSIFY_CASE}
FROM pdf_words WHERE {_CONTENT_PAGES_PRED}
"""


def pdf_layout_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 end-to-end: classify → per-(page, format) ordered collapse →
    de-hyphenate → location election + fill-down
    (`themengeschichtspfad.R:13-68`, composing the W7 fill-down)."""
    from .operators.pdf_layout import pdf_layout_pipeline

    return pdf_layout_pipeline(_pdf_words(spark, sf_dir),
                               content_pages=_CONTENT_PAGES)


_PDF_TEXT_SQL = f"""
WITH {_PDF_WORDS_CTE},
classified AS (
  SELECT page, pos, word, {_CLASSIFY_CASE}
  FROM pdf_words WHERE {_CONTENT_PAGES_PRED}
),
runs AS (
  SELECT page, format,
         regexp_replace(string_agg(word, ' ' ORDER BY pos),
                        '\\s-\\s|-\\s', '', 'g') AS text
  FROM classified GROUP BY page, format
),
located AS (
  SELECT page, format, text,
         CASE WHEN format = 'location_header' THEN text
              WHEN format = 'heading'
                THEN nullif(regexp_extract(text, '(.+):', 1), '')
              ELSE 'München' END AS loc
  FROM runs WHERE format <> 'page'
)
SELECT page, format, text,
       last_value(loc IGNORE NULLS) OVER (
         ORDER BY page, format
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS location
FROM located
"""


def fetch_json_source(df: DataFrame, url_col: str, out_schema: str,
                      parse, fetcher=None, timeout: float = 30.0,
                      retries: int = 2, max_bytes: int = 64 << 20,
                      on_error: str = "raise") -> DataFrame:
    """S7 REST-fetch seam: one ``mapInPandas`` pass that opens every
    URL in ``url_col`` with a REAL ``urllib.request.urlopen`` (or an
    injected fetcher), feeds the decoded JSON to ``parse(row_dict)``,
    and emits ``out_schema`` rows.  Workers fetch their own partitions
    — the driver never touches a payload, so the pattern holds at any
    fan-out; rate limits are the partition count.  Offline tests and
    the oracle entry exercise the exact same code over ``file://``
    URLs — a REST deployment is the same seam with an ``https://``
    scheme.

    Failure semantics (a hung or broken endpoint must not stall the
    job indefinitely or kill a task undiagnosably):

    - every default fetch carries an explicit ``timeout`` (seconds);
      transient failures (timeouts, connection resets, HTTP 5xx) retry
      ``retries`` times with linear backoff, while deterministic ones
      (HTTP 4xx, malformed URLs, oversized payloads) fail immediately —
      one slow endpoint costs bounded wall time, and a crawl over dead
      links doesn't burn executor time re-downloading known failures;
    - responses are read through a ``max_bytes`` cap so a runaway
      payload cannot OOM a worker (exceeding it is an error, not a
      silent truncation);
    - ``on_error="raise"`` (default) fails the task with the URL in
      the exception message; ``on_error="null"`` emits a row of NULLs
      for the failed URL instead (``parse`` receives ``__json=None``
      and ``__error=<message>`` and may build the diagnostic row
      itself; if ``parse`` RAISES — e.g. a parse written for the
      happy path indexing into ``__json`` — the row degrades to all
      NULLs instead of killing the task, which round-13 review found
      was the gap that defeated the per-row-diagnostics contract).
    """
    import json as _json

    from pyspark.sql.types import StructType

    # field names for the all-NULL fallback row (driver-side parse of
    # the DDL handles nested types a naive comma-split would break on)
    _fallback_fields = [f.name for f in StructType.fromDDL(out_schema)]

    if on_error not in ("raise", "null"):
        raise ValueError(f"on_error must be 'raise' or 'null', got {on_error!r}")
    # validate numeric knobs DRIVER-side like on_error: retries=-1 would
    # make default_get's final `raise last` fire with last=None (a
    # masking TypeError deep inside a task)
    if retries < 0:
        raise ValueError(f"retries must be >= 0, got {retries}")
    if timeout <= 0 or max_bytes <= 0:
        raise ValueError(
            f"timeout and max_bytes must be positive, got {timeout}/{max_bytes}")

    def run(batches):
        import time as _time
        import urllib.error
        import urllib.request

        import pandas as pd

        def default_get(u):
            last = None
            for attempt in range(retries + 1):
                try:
                    with urllib.request.urlopen(u, timeout=timeout) as resp:
                        data = resp.read(max_bytes + 1)
                except urllib.error.HTTPError as e:
                    # 4xx responses are deterministic (dead link, auth,
                    # bad request) — retrying re-downloads the same
                    # failure; only server-side 5xx is worth a retry.
                    if e.code < 500:
                        raise
                    last = e
                    if attempt < retries:
                        _time.sleep(0.5 * (attempt + 1))
                    continue
                except ValueError:
                    # malformed URL — deterministic, never retries
                    raise
                except urllib.error.URLError as e:
                    # URLError wraps BOTH deterministic failures (DNS
                    # NXDOMAIN = socket.gaierror, missing file:// path
                    # = FileNotFoundError) and transient ones (conn
                    # refused/reset).  Dead links must fail FAST — the
                    # docstring's no-re-download promise; only the
                    # transient reasons earn backoff.
                    import socket as _socket

                    if isinstance(e.reason,
                                  (_socket.gaierror, FileNotFoundError)):
                        raise
                    last = e
                    if attempt < retries:
                        _time.sleep(0.5 * (attempt + 1))
                    continue
                except Exception as e:  # noqa: BLE001 — re-raised below
                    # transient (network) errors retry with backoff
                    last = e
                    if attempt < retries:
                        _time.sleep(0.5 * (attempt + 1))
                    continue
                if len(data) > max_bytes:
                    # deterministic failure — re-downloading an
                    # oversized payload `retries` more times only
                    # multiplies the wasted transfer
                    raise ValueError(
                        f"payload exceeds max_bytes={max_bytes}")
                return data
            raise last

        # the max_bytes cap applies to ANY fetcher — the docstring's
        # OOM guarantee is unconditional, so an injected fetcher's
        # response is length-checked too (default_get already caps
        # during the read, before the payload fully materializes)
        if fetcher is not None:
            def get(u, _raw=fetcher):
                data = _raw(u)
                if len(data) > max_bytes:
                    raise ValueError(
                        f"payload exceeds max_bytes={max_bytes}")
                return data
        else:
            get = default_get
        for pdf in batches:
            if not len(pdf):  # empty Arrow batch: a zero-column frame
                continue      # would fail schema coercion
            out = []
            for _, row in pdf.iterrows():
                url = row[url_col]
                try:
                    payload = _json.loads(get(url).decode("utf-8"))
                    err = None
                except Exception as e:  # noqa: BLE001
                    if on_error == "raise":
                        raise RuntimeError(
                            f"fetch_json_source failed for {url!r}: {e}"
                        ) from e
                    payload, err = None, str(e)
                try:
                    out.append(parse(
                        {**row.to_dict(), "__json": payload,
                         "__error": err}))
                except Exception as e:  # noqa: BLE001
                    if on_error == "raise":
                        raise RuntimeError(
                            f"fetch_json_source parse failed for "
                            f"{url!r}: {e}") from e
                    out.append({k: None for k in _fallback_fields})
            yield pd.DataFrame(out)

    return df.mapInPandas(run, out_schema)


def external_rest_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 end-to-end: per-nation JSON documents land in a scratch dir
    (the mock endpoint), a frame of ``file://`` URLs streams through
    :func:`fetch_json_source`, and the parsed fields are returned —
    the whole urlopen → json → schema path is under the value-hash
    gate.  Deterministic payloads derive from the nation key, so the
    oracle recomputes them relationally."""
    import json as _json
    import os

    from .spec import scratch_dir

    n = t(spark, sf_dir, "nation")
    d = scratch_dir("rest_mock_")
    for r in n.select("n_nationkey", "n_name").collect():
        with open(os.path.join(d, f"{r.n_nationkey}.json"), "w") as f:
            _json.dump({"key": r.n_nationkey, "name": r.n_name,
                        "population": r.n_nationkey * 1000 + 17}, f)
    urls = n.select(
        "n_nationkey",
        F.concat(F.lit(f"file://{d}/"), F.col("n_nationkey").cast("string"),
                 F.lit(".json")).alias("url"),
    )
    return fetch_json_source(
        urls, "url",
        "n_nationkey long, api_name string, population long",
        lambda row: {"n_nationkey": row["n_nationkey"],
                     "api_name": row["__json"]["name"],
                     "population": row["__json"]["population"]},
    )


_REST_FETCH_SQL = """
SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
       n_name AS api_name,
       CAST(n_nationkey * 1000 + 17 AS BIGINT) AS population
FROM nation
"""


SPECS: dict[str, QuerySpec] = {
    "external_rest_fetch": QuerySpec(
        external_rest_fetch, _REST_FETCH_SQL,
        "S7 REST-fetch seam: real urlopen over file:// mock endpoint, "
        "mapInPandas, parsed fields value-checked"),
    "pdf_layout_classify": QuerySpec(pdf_layout_classify, _PDF_CLASSIFY_SQL),
    "pdf_layout_text": QuerySpec(pdf_layout_text, _PDF_TEXT_SQL),
    "fn_html_table_extract": QuerySpec(fn_html_table_extract, _HTML_SQL),
    "external_geocode_mock": QuerySpec(external_geocode_mock, _GEOCODE_SQL),
    "external_translate_mock": QuerySpec(external_translate_mock, _TRANSLATE_SQL),
    "er_first_letter_block": QuerySpec(er_first_letter_block, _FIRST_LETTER_SQL),
    "er_blocking_stats": QuerySpec(
        er_blocking_stats, _BLOCKING_STATS_SQL,
        "blocking-quality diagnostics (block sizes, C(s,2) pair mass, "
        "skew share) — read before any quadratic step, no pair "
        "generated"),
    "fn_jaro_winkler_join": QuerySpec(fn_jaro_winkler_join, _JW_SQL),
}
