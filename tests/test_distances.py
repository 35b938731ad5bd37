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
