"""Round-13b selection tier: canonical_url kernel edges + k-center
coreset properties (seed, spread, coverage, determinism)."""

import pytest
from pyspark.sql import functions as F


def _canon(spark, urls):
    from remove_na_lgbtiq_queer_knowledge_graph_spark.functions.strings import (
        canonical_url,
    )

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r["c"] for r in
            df.select(canonical_url(F.col("url")).alias("c")).collect()]


def test_canonical_url_edges(spark):
    cases = {
        # scheme+host lowercase, default https port stripped, fragment
        # dropped, tracking params dropped, params sorted
        "HTTPS://WWW.Ex.COM:443/a/b/?b=2&utm_source=x&a=1#frag":
            "https://www.ex.com/a/b?a=1&b=2",
        # http default port stripped too
        "http://ex.com:80/": "http://ex.com/",
        # NON-default port kept
        "https://ex.com:8443/x": "https://ex.com:8443/x",
        # empty path -> "/", query absent
        "https://ex.com": "https://ex.com/",
        # tracking-only query vanishes entirely (no dangling "?")
        "https://ex.com/p?utm_medium=a&gclid=zz&fbclid=y&ref=r":
            "https://ex.com/p",
        # multiple trailing slashes collapse; root stays "/"
        "https://ex.com///": "https://ex.com/",
        # utm_ prefix only at param START is stripped; "xutm_a" kept
        "https://ex.com/p?xutm_a=1&utm_a=2": "https://ex.com/p?xutm_a=1",
        # fragment-internal '?' is NOT a query (SPA routes)
        "https://ex.com/p#/view?tab=1": "https://ex.com/p",
        # tracking params match case-insensitively and valueless
        "https://ex.com/p?UTM_SOURCE=mail&a=1&Fbclid": "https://ex.com/p?a=1",
        # userinfo keeps its case; host still lowers, port still strips
        "https://TokenA@API.Ex.COM:443/x": "https://TokenA@api.ex.com/x",
    }
    got = _canon(spark, list(cases))
    for (url, want), g in zip(cases.items(), got):
        assert g == want, f"{url}: {g!r} != {want!r}"


def test_canonical_url_null_propagates(spark):
    # NULL in -> NULL out; scheme-less/relative inputs -> NULL too
    # (NOT a shared degenerate ':///...' key that would falsely merge
    # unrelated docs under keep-first dedup)
    assert _canon(spark, [None, "www.a.com/x?a=1", "/rel/path"]) \
        == [None, None, None]


def test_canonical_url_matches_duckdb_kernel(spark):
    """Live parity of the Spark kernel vs the oracle's SQL mirror on
    adversarial URLs (beyond the synthesized corpus shapes)."""
    import duckdb

    urls = [
        "HTTPS://A.B:443/x//?z=1&a=2&utm_x=3#f",
        "http://A.B:80?id=9",
        "https://a.b:444/p/?ref=r&b=1",
        "https://a.b/p?a=1&a=0",
        "https://User@A.B/p#/route?x=1",
        "https://a.b/p?GCLID=9&a=1",
    ]
    spark_out = _canon(spark, urls)
    duck_sql = r"""
SELECT CASE WHEN sch = '' THEN NULL ELSE sch || '://' || uinfo
  || (CASE WHEN (sch = 'https' AND hp LIKE '%:443')
            OR (sch = 'http' AND hp LIKE '%:80')
      THEN regexp_replace(hp, ':[0-9]+$', '') ELSE hp END)
  || (CASE WHEN pth = '' THEN '/' ELSE pth END)
  || (CASE WHEN q = '' THEN '' ELSE '?' || q END) END
FROM (
  SELECT lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS sch,
    regexp_extract(regexp_extract(url,
        '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1), '^([^@]*@)', 1) AS uinfo,
    lower(regexp_replace(regexp_extract(url,
        '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1), '^[^@]*@', '')) AS hp,
    regexp_replace(regexp_extract(url,
        '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1), '/+$', '') AS pth,
    coalesce(array_to_string(list_sort(list_filter(
        string_split(regexp_extract(url, '^[^#]*\?([^#]*)', 1), '&'),
        p -> p != '' AND NOT regexp_matches(
               p, '(?i)^(utm_[^=]*|fbclid|gclid|ref)(=|$)'))), '&'), '') AS q
  FROM u
)"""
    con = duckdb.connect()
    con.execute("CREATE TABLE u (url VARCHAR)")
    con.executemany("INSERT INTO u VALUES (?)", [(u,) for u in urls])
    duck_out = [r[0] for r in con.sql(duck_sql).fetchall()]
    assert spark_out == duck_out


def _toy_vectors(spark):
    # 1-D embeddings with an obvious farthest-point order:
    # ids 0..5 at coords 0, 100, 10, 55, 1, 99 (sample = even ids)
    rows = [(0, [0.0]), (1, [100.0]), (2, [10.0]), (3, [55.0]),
            (4, [1.0]), (5, [99.0])]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_kcenter_greedy_order_and_coverage(spark):
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.ann import (
        kcenter_coreset,
    )

    v = _toy_vectors(spark)
    # sample = even ids {0:0.0, 2:10.0, 4:1.0}; seed = id 0 (lowest);
    # next = farthest from 0 -> id 2 (d2=100); next = id 4 (d2 to
    # nearest of {0,10} is 1)
    out = kcenter_coreset(v, k=3, sample_mod=2).collect()
    centers = {r["center_id"] for r in out}
    assert centers <= {0, 2, 4}
    by_id = {r["vec_id"]: r for r in out}
    # full corpus (odd ids too) covered, nearest exemplar + squared L2
    assert len(by_id) == 6
    assert by_id[1]["center_id"] == 2 and by_id[1]["d2_r"] == 8100.0
    assert by_id[3]["center_id"] == 2 and by_id[3]["d2_r"] == 2025.0
    assert by_id[0]["center_id"] == 0 and by_id[0]["d2_r"] == 0.0
    # assignment tie-break: id 5 at 99 -> center 2 (only option)
    assert by_id[5]["center_id"] == 2


def test_kcenter_k_exceeding_sample_caps(spark):
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.ann import (
        kcenter_coreset,
    )

    v = _toy_vectors(spark)
    out = kcenter_coreset(v, k=10, sample_mod=2).collect()
    # only 3 sample vectors exist; selection caps there, all 6 covered
    assert {r["center_id"] for r in out} == {0, 2, 4}
    assert len(out) == 6


def test_kcenter_assignment_tiebreak_lowest_center(spark):
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.ann import (
        kcenter_coreset,
    )

    # two exemplar candidates equidistant from id 1 (coord 5.0):
    # centers at 0.0 (id 0) and 10.0 (id 2) -> tie, lowest center wins
    rows = [(0, [0.0]), (1, [5.0]), (2, [10.0])]
    v = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in
           kcenter_coreset(v, k=2, sample_mod=2).collect()}
    assert out[1]["center_id"] == 0 and out[1]["d2_r"] == 25.0


def test_kcenter_duplicate_sample_no_duplicate_exemplars(spark):
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.ann import (
        kcenter_coreset,
    )

    # sample (even ids) = two coincident points + one distinct: the
    # greedy loop must STOP once min-distances are all 0 rather than
    # re-pick the seed (review finding: duplicate exemplars)
    rows = [(0, [0.0]), (2, [0.0]), (4, [10.0]), (1, [3.0])]
    v = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kcenter_coreset(v, k=3, sample_mod=2).collect()
    assert {r["center_id"] for r in out} == {0, 4}
    assert len(out) == 4  # full corpus still covered


def test_kcenter_k_below_one_raises(spark):
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.ann import (
        kcenter_coreset,
    )

    with pytest.raises(ValueError, match="k must be >= 1"):
        kcenter_coreset(_toy_vectors(spark), k=0, sample_mod=2)


def test_registry_has_selection_entries():
    from remove_na_lgbtiq_queer_knowledge_graph_spark.registry import all_specs

    specs = all_specs()
    for name in ("dedup_url_canonical", "select_kcenter_coreset"):
        assert name in specs and specs[name].oracle is not None


def test_stream_url_dedupe_equals_batch(spark, tmp_path):
    """First-seen-wins URL dedupe must be identical whether documents
    arrive as one batch or as id-ordered micro-batches with duplicate
    canonical URLs CROSSING batch boundaries (the accumulated canonical
    store suppresses a later batch's copy) and inside one batch (the
    lower-id window suppresses the sibling)."""
    import glob
    import os

    from pyspark.sql import functions as F

    from remove_na_lgbtiq_queer_knowledge_graph_spark.queries_selection import (
        _url_dedupe_stream,
    )

    # doc_ids chosen so the synthesized canonical key (doc_id mod 300
    # for same source-class; here mod lcm(3,25,4)=300) collides for
    # (0, 300) across batches and (1, 301) inside one batch
    ids = [0, 1, 5, 7, 301, 300, 310, 601]
    rows = [(i, f"text {i}", "en", f"src{i % 3}", 10) for i in ids]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")

    src = str(tmp_path / "docs_src")
    for j, batch_ids in enumerate(([0, 1, 5, 7], [301, 300, 310], [601])):
        before = set(glob.glob(os.path.join(src, "*.parquet")))
        df.filter(F.col("doc_id").isin(batch_ids)) \
          .coalesce(1).write.mode("append").parquet(src)
        for p in set(glob.glob(os.path.join(src, "*.parquet"))) - before:
            os.utime(p, (1_700_000_000 + j * 10, 1_700_000_000 + j * 10))
    schema = spark.read.parquet(src).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    got = {r.doc_id for r in
           _url_dedupe_stream(stream, str(tmp_path / "url_dd")).collect()}
    # batch semantics: min doc_id per canonical key
    from remove_na_lgbtiq_queer_knowledge_graph_spark.functions.strings import (
        canonical_url,
    )
    from remove_na_lgbtiq_queer_knowledge_graph_spark.queries_selection import (
        _synth_messy_url,
    )

    want = {r.k for r in
            df.select(canonical_url(_synth_messy_url()).alias("c"), "doc_id")
              .groupBy("c").agg(F.min("doc_id").alias("k")).collect()}
    assert got == want
    # the cross-batch duplicate 300 and within-run later ids were dropped
    assert 0 in got and 300 not in got
