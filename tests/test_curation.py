"""Round-11 curation-tier tests (queries_curation.py)."""

from pyspark.sql import functions as F

from remove_na_lgbtiq_queer_knowledge_graph_spark.queries_curation import (
    er_survivorship_merge,
    mix_upsample_epochs,
    text_blocklist_filter,
    ts_interarrival_stats,
)


def test_upsample_epochs_replication(spark, sf_dir):
    out = mix_upsample_epochs(spark, sf_dir)
    per = (out.groupBy("source")
              .agg(F.max("epoch").alias("mx"),
                   F.count("*").alias("n"),
                   F.countDistinct("doc_id").alias("nd"))
              .collect())
    for r in per:
        src_num = int(r.source[3:])
        want = 1 + src_num % 3
        assert r.mx == want, (r.source, r.mx, want)
        # every doc of the source is repeated exactly `want` times
        assert r.n == r.nd * want


def test_upsample_epochs_dense_from_one(spark, sf_dir):
    out = mix_upsample_epochs(spark, sf_dir)
    one = out.filter("doc_id = 0").orderBy("epoch").collect()
    assert [r.epoch for r in one] == list(range(1, len(one) + 1))
    assert one[0].epoch == 1


def test_blocklist_counts_and_keep(spark):
    from remove_na_lgbtiq_queer_knowledge_graph_spark import queries_curation as qc

    df = spark.createDataFrame(
        [
            (1, "a Slow sLOW stale day", "en", "src1", 0),
            (2, "all clean words here", "en", "src1", 0),
            (3, "slow " * 30 + "ok", "en", "src1", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "documents.parquet"))
        rows = {r.doc_id: r for r in text_blocklist_filter(spark, d).collect()}
    # case-insensitive matching, 3 of 5 tokens blocked -> >2% -> dropped
    assert rows[1].n_blocked == 3 and rows[1].keep == 0
    assert rows[2].n_blocked == 0 and rows[2].keep == 1
    # 30/31 blocked
    assert rows[3].n_blocked == 30 and rows[3].keep == 0
    assert qc._BLOCKLIST == ("slow", "broken", "stale")


def test_survivorship_rules(spark):
    import tempfile, os

    df = spark.createDataFrame(
        [
            # one entity: (7, 'SEG') — latest is custkey 30; acctbal
            # ties 20/30 at 900.0, custkey tie-break picks 30 (Cara)
            (10, "Alice", 7, 50.0, "SEG"),
            (20, "Bob", 7, 900.0, "SEG"),
            (30, "Cara", 7, 900.0, "SEG"),   # acctbal tie -> custkey break
            (40, "Dan", 8, 10.0, "SEG"),
        ],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "customer.parquet"))
        rows = {(r.c_nationkey, r.c_mktsegment): r
                for r in er_survivorship_merge(spark, d).collect()}
    g = rows[(7, "SEG")]
    assert g.n_records == 3
    assert g.survivor_custkey == 30
    assert g.latest_name == "Cara"
    # richest: acctbal tie between 20/30 resolved by HIGHER custkey
    assert g.richest_name == "Cara"
    assert g.best_acctbal == 900.0
    assert rows[(8, "SEG")].richest_name == "Dan"


def test_interarrival_gaps_per_user_not_global(spark):
    import datetime as dt
    import tempfile, os

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # user 1: gaps 10s then 20s, types a/b/b
        (1, t0, 1, "a", 0.0, "{}"),
        (2, t0 + dt.timedelta(seconds=10), 1, "b", 0.0, "{}"),
        (3, t0 + dt.timedelta(seconds=30), 1, "b", 0.0, "{}"),
        # user 2: single event -> no gap
        (4, t0 + dt.timedelta(seconds=1), 2, "b", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "events.parquet"))
        got = {r.event_type: r for r in ts_interarrival_stats(spark, d).collect()}
    assert set(got) == {"b"}          # first-of-user rows carry no gap
    b = got["b"]
    assert b.n_gaps == 2
    assert b.p50_gap_us == 15_000_000.0      # median of {10s, 20s}
    assert b.max_gap_us == 20_000_000.0
    assert b.mean_gap_us == 15_000_000.0


def test_survivorship_property_vs_brute(spark):
    """Random customer tables: the one-pass groupBy survivorship must
    equal a pure-python per-group scan (latest / richest / max rules,
    custkey tie-breaks)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    import os
    import tempfile

    row = st.tuples(
        st.integers(1, 60),                       # custkey (unique-ified below)
        st.sampled_from(["A", "B", "C"]),         # name
        st.integers(0, 2),                        # nationkey
        st.integers(-500, 500),                   # acctbal cents
        st.sampled_from(["S1", "S2"]),            # segment
    )

    @settings(max_examples=6, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(st.lists(row, min_size=1, max_size=20))
    def check(raw):
        # unique custkeys: survivorship assumes a record identity
        seen, recs = set(), []
        for ck, nm, nk, cents, seg in raw:
            if ck in seen:
                continue
            seen.add(ck)
            recs.append((ck, f"{nm}{ck}", nk, cents / 100.0, seg))
        df = spark.createDataFrame(
            recs,
            "c_custkey long, c_name string, c_nationkey int,"
            " c_acctbal double, c_mktsegment string",
        )
        with tempfile.TemporaryDirectory() as d:
            df.write.parquet(os.path.join(d, "customer.parquet"))
            got = {(r.c_nationkey, r.c_mktsegment): r
                   for r in er_survivorship_merge(spark, d).collect()}
        groups = {}
        for ck, nm, nk, bal, seg in recs:
            groups.setdefault((nk, seg), []).append((ck, nm, bal))
        assert set(got) == set(groups)
        for key, members in groups.items():
            g = got[key]
            assert g.n_records == len(members)
            latest = max(members, key=lambda m: m[0])
            assert g.survivor_custkey == latest[0]
            assert g.latest_name == latest[1]
            richest = max(members,
                          key=lambda m: (round(m[2] * 100), m[0]))
            assert g.richest_name == richest[1]
            assert g.best_acctbal == max(m[2] for m in members)

    check()


def test_scd2_invariants(spark, sf_dir):
    """SCD2 output contract: exactly one current row per key; changed
    keys carry a closed prior version; no-op delta keys mint NO new
    version; inserts open at the batch date."""
    import datetime as dt

    from remove_na_lgbtiq_queer_knowledge_graph_spark.queries_relational import (
        sink_scd2_merge,
    )

    rows = sink_scd2_merge(spark, sf_dir).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r.c_custkey, []).append(r)
    batch = dt.date(2024, 6, 1)
    base = dt.date(2020, 1, 1)
    for key, vs in by_key.items():
        current = [v for v in vs if v.is_current == 1]
        closed = [v for v in vs if v.is_current == 0]
        assert len(current) == 1, key
        assert current[0].valid_to is None
        if key >= (1 << 40):                       # insert
            assert not closed and current[0].valid_from == batch
            assert current[0].c_name.startswith("new-")
        elif key % 3 == 0:                         # changed
            assert len(closed) == 1
            assert closed[0].valid_to == batch
            assert closed[0].valid_from == base
            assert current[0].valid_from == batch
            # +100 balance actually applied
            assert abs(current[0].c_acctbal
                       - closed[0].c_acctbal - 100) < 1e-6
        else:                                      # untouched or no-op
            assert not closed
            assert current[0].valid_from == base


def test_upsample_epochs_malformed_source_fails_loud(spark):
    """A non-numeric source suffix must RAISE, not silently drop the
    document (cast→NULL would make sequence(1, NULL) NULL and explode
    eat the row — silent data loss on corrupt config; the DuckDB
    oracle's hard CAST errors, so fail-loud also keeps the engines
    symmetric)."""
    import os
    import tempfile

    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    df = spark.createDataFrame(
        [(1, "hello", "en", "src2", 5), (2, "world", "en", "srcX", 5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "documents.parquet"))
        with pytest.raises(SparkRuntimeException,
                           match="non-numeric source id"):
            mix_upsample_epochs(spark, d).collect()
    # NEGATIVE suffixes are malformed too: Spark pmod(-2, 3) = 1 would
    # replicate while the oracle's sign-keeping % drops — the guard
    # must reject them before the engines can diverge silently
    neg = spark.createDataFrame(
        [(1, "hello", "en", "src-2", 5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with tempfile.TemporaryDirectory() as d:
        neg.write.parquet(os.path.join(d, "documents.parquet"))
        with pytest.raises(SparkRuntimeException,
                           match="non-numeric source id"):
            mix_upsample_epochs(spark, d).collect()


def test_survivorship_cents_half_away_on_negative_subcent(spark):
    """The packed arg-max key's cents must round half-AWAY-from-zero
    (the repo's one rounding kernel): -100.555 → -10056 cents, so the
    -100.55 (= -10055 cents) record is strictly richer.  The old
    floor(x*100+0.5) half-up form made them TIE at -10055 and let the
    higher custkey (the poorer -100.555 record) win."""
    import os
    import tempfile

    df = spark.createDataFrame(
        [
            (2, "Poorer", 7, -100.555, "SEG"),   # higher custkey, poorer
            (1, "Richer", 7, -100.55, "SEG"),
        ],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "customer.parquet"))
        g = er_survivorship_merge(spark, d).collect()[0]
    assert g.richest_name == "Richer"
    assert g.best_acctbal == -100.55


def test_quantile_sketch_bounds_and_exact_anchors(spark):
    """agg_quantile_sketch: exact interpolated quantiles match the
    closed form, and the sketch's rank-error booleans hold (the
    guarantee percentile_approx ships: returned element's rank within
    n/accuracy of q·n)."""
    import os
    import tempfile

    from remove_na_lgbtiq_queer_knowledge_graph_spark.queries_curation import (
        agg_quantile_sketch,
    )

    rows = [(i, " ".join(["w"] * i), "en", "srcA", i) for i in range(1, 101)]
    rows += [(200 + i, " ".join(["w"] * 7), "en", "srcB", 7)
             for i in range(10)]
    df = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "documents.parquet"))
        got = {r.source: r for r in agg_quantile_sketch(spark, d).collect()}
    a = got["srcA"]
    # interpolated: pos = 1 + (n-1)*q over lengths 1..100
    assert a.n_docs == 100
    assert a.p50_exact == 50.5
    assert a.p90_exact == 90.1
    assert a.p99_exact == 99.01
    b = got["srcB"]
    assert (b.p50_exact, b.p90_exact, b.p99_exact) == (7.0, 7.0, 7.0)
    for r in got.values():
        assert r.p50_rank_ok and r.p90_rank_ok and r.p99_rank_ok, r


def test_rrf_fusion_formula_order_and_tie_breaks(spark):
    """retrieval_rrf_fusion: the fused score is exactly
    Σ 1/(60+rank) over the lists the doc appears in; the output rank is
    the (rrf desc, doc_id) total order; and rank-boundary ties (a
    lex-only doc and a dense-only doc at the SAME list rank → equal
    rrf) break on doc_id — pinned by construction: docs 1-5 appear only
    in the BM25 list, docs 6-14 only in the dense list."""
    import math
    import os
    import tempfile

    from remove_na_lgbtiq_queer_knowledge_graph_spark.queries_curation import (
        retrieval_rrf_fusion,
    )

    q_words = "alpha beta gamma delta epsilon zeta".split()
    docs = [(0, " ".join(q_words), "en", "src1", 0)]
    # docs 1-5: share a descending number of query terms (lex-only)
    for i in range(1, 6):
        text = " ".join(q_words[: 7 - i]) + " filler" + str(i)
        docs.append((i, text, "en", "src1", 0))
    # docs 6-15: disjoint vocabulary (dense-only candidates)
    for i in range(6, 16):
        docs.append((i, f"foo bar baz qux{i}", "en", "src1", 0))
    embs = [(0, [1.0, 0.0], 0)]
    embs += [(i, [-1.0, 0.0], 0) for i in range(1, 6)]     # far from query
    embs += [(i, [1.0, 0.001 * (i - 5)], 0) for i in range(6, 15)]  # near
    embs.append((15, [0.0, -1.0], 0))                      # out of top-10
    ddf = spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string, n_chars long")
    edf = spark.createDataFrame(
        embs, "vec_id long, embedding array<float>, label int")
    with tempfile.TemporaryDirectory() as d:
        ddf.write.parquet(os.path.join(d, "documents.parquet"))
        edf.write.parquet(os.path.join(d, "embeddings.parquet"))
        rows = sorted(retrieval_rrf_fusion(spark, d).collect(),
                      key=lambda r: r.rk)
    assert [r.rk for r in rows] == list(range(1, len(rows) + 1))
    # query doc tops both lists → fused #1
    assert rows[0].doc_id == 0 and rows[0].lex_rk == 1 \
        and rows[0].dense_rk == 1
    got_sets = {r.doc_id: (r.lex_rk, r.dense_rk) for r in rows}
    for i in range(1, 6):
        lex_rk, dense_rk = got_sets[i]
        assert lex_rk is not None and dense_rk is None, (i, got_sets[i])
    for i in range(6, 15):
        if i in got_sets:
            lex_rk, dense_rk = got_sets[i]
            assert lex_rk is None and dense_rk is not None
    assert 15 not in got_sets
    # score formula + total order
    def expect(r):
        s = 0.0
        if r.lex_rk is not None:
            s += 1.0 / (60.0 + r.lex_rk)
        if r.dense_rk is not None:
            s += 1.0 / (60.0 + r.dense_rk)
        return math.floor(abs(s) * 1e9 + 0.5) / 1e9 * (1 if s > 0 else 0)
    for r in rows:
        assert r.rrf_score == expect(r), r
    keys = [(-r.rrf_score, r.doc_id) for r in rows]
    assert keys == sorted(keys)
    # rank-boundary ties exist and break on doc_id: a lex-only and a
    # dense-only doc at the same list rank carry identical rrf
    ties = [
        (a, b) for a, b in zip(rows, rows[1:])
        if a.rrf_score == b.rrf_score
    ]
    assert len(ties) >= 3
    for a, b in ties:
        assert a.doc_id < b.doc_id
