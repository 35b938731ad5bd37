"""F8 string-distance UDFs: OSA and Jaro-Winkler known-value tests
(reference method set `find-duplicates-authors.R:133-137`)."""

from pyspark.sql import functions as F

from remove_na_lgbtiq_queer_knowledge_graph_spark.functions.distances import (
    jaro_winkler_sim,
    osa_distance,
)


def test_osa_transposition_counts_one(spark):
    df = spark.createDataFrame(
        [("ca", "ac"), ("kitten", "sitting"), ("abc", "abc"), ("", "ab")],
        ["a", "b"],
    )
    got = [r.d for r in df.select(osa_distance("a", "b").alias("d")).collect()]
    # transposition = 1 edit under OSA (levenshtein would say 2)
    assert got == [1, 3, 0, 2]


def test_jaro_winkler_known_values(spark):
    df = spark.createDataFrame(
        [("MARTHA", "MARHTA"), ("DWAYNE", "DUANE"), ("same", "same"), ("abc", "xyz")],
        ["a", "b"],
    )
    got = [
        round(r.j, 4)
        for r in df.select(jaro_winkler_sim("a", "b").alias("j")).collect()
    ]
    assert got == [0.9611, 0.84, 1.0, 0.0]


def test_jaro_winkler_matches_duckdb(spark):
    """The UDF must agree with DuckDB's builtin (the oracle for
    fn_jaro_winkler_join)."""
    import duckdb

    pairs = [("Armistad Maupin", "Armistead Maupin"),
             ("Supplier#000000001", "Supplier#000000010"),
             ("abcdef", "abcfed")]
    df = spark.createDataFrame(pairs, ["a", "b"])
    ours = [r.j for r in df.select(F.round(jaro_winkler_sim("a", "b"), 6).alias("j")).collect()]
    con = duckdb.connect()
    theirs = [
        con.sql(f"SELECT round(jaro_winkler_similarity('{a}', '{b}'), 6)").fetchone()[0]
        for a, b in pairs
    ]
    assert ours == theirs


def test_jaro_winkler_matches_duckdb_property():
    """Property check: the Python JW (inside the pandas UDF) agrees with
    DuckDB's jaro_winkler_similarity on random strings — the same
    agreement the fn_jaro_winkler_join oracle depends on."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from remove_na_lgbtiq_queer_knowledge_graph_spark.functions.distances import (
        _jaro_winkler,
    )

    con = duckdb.connect()

    @settings(max_examples=200, deadline=None)
    @given(
        st.text(alphabet="abcdef ", max_size=12),
        st.text(alphabet="abcdef ", max_size=12),
    )
    def check(a, b):
        want = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert abs(_jaro_winkler(a, b) - want) < 1e-9

    check()


def test_osa_properties():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from remove_na_lgbtiq_queer_knowledge_graph_spark.functions.distances import _osa

    @settings(max_examples=200, deadline=None)
    @given(
        st.text(alphabet="abc", max_size=10),
        st.text(alphabet="abc", max_size=10),
    )
    def check(a, b):
        d = _osa(a, b)
        assert d == _osa(b, a)                    # symmetric
        assert (d == 0) == (a == b)               # identity
        assert d <= max(len(a), len(b))           # bounded
        if a and b:
            # one adjacent transposition costs exactly 1
            t = b[1] + b[0] + b[2:] if len(b) >= 2 and b[0] != b[1] else None
            if t is not None:
                assert _osa(b, t) == 1

    check()


def test_distance_udfs_propagate_null(spark):
    """Round-13 review: NULL input must yield NULL (DuckDB/builtin
    levenshtein semantics), not 0/0.0 from an ''-coercion."""
    from pyspark.sql import functions as F

    from remove_na_lgbtiq_queer_knowledge_graph_spark.functions.distances import (
        jaro_winkler_sim,
        osa_distance,
    )

    df = spark.createDataFrame(
        [("abc", None), (None, "abc"), ("", ""), ("ab", "ba")],
        "a string, b string")
    rows = df.select(osa_distance("a", "b").alias("d"),
                     jaro_winkler_sim("a", "b").alias("j")).collect()
    assert rows[0].d is None and rows[0].j is None
    assert rows[1].d is None and rows[1].j is None
    assert rows[2].d == 0 and rows[2].j == 0.0
    assert rows[3].d == 1  # one transposition under OSA
