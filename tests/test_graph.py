"""BGP planner / property-path / graph-analytics unit tests (SURVEY §2.11)."""

from pyspark.sql import functions as F

from remove_na_lgbtiq_queer_knowledge_graph_spark.plans.bgp import (
    BGPQuery,
    path_seq,
    transitive_closure,
)
from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.graph import (
    degrees,
    in_out_degrees,
    neighborhood,
)

TRIPLES = [
    ("a", "knows", "b"),
    ("b", "knows", "c"),
    ("c", "knows", "d"),
    ("a", "name", "Alice"),
    ("b", "name", "Bob"),
    ("c", "name", "Carol"),
    ("a", "type", "Person"),
    ("b", "type", "Person"),
    ("x", "type", "Org"),
    ("x", "name", "Xorg"),
]


def _tri(spark):
    return spark.createDataFrame(TRIPLES, ["subject", "predicate", "object"])


def test_bgp_conjunction_and_union(spark):
    tri = _tri(spark)
    people = BGPQuery(tri).where(("?e", "type", "Person"), ("?e", "name", "?n"))
    orgs = BGPQuery(tri).where(("?e", "type", "Org"), ("?e", "name", "?n"))
    got = {(r.e, r.n) for r in people.union(orgs).select("e", "n").collect()}
    assert got == {("a", "Alice"), ("b", "Bob"), ("x", "Xorg")}


def test_bgp_optional_null(spark):
    q = BGPQuery(_tri(spark)).where(("?e", "type", "?t")).optional(("?e", "name", "?n"))
    rows = {r.e: r.n for r in q.select("e", "n").collect()}
    assert rows["a"] == "Alice" and rows["x"] == "Xorg"


def test_bgp_not_exists(spark):
    # entities never appearing as the object of `knows`
    q = (
        BGPQuery(_tri(spark))
        .where(("?e", "type", "?t"))
        .not_exists(("?z", "knows", "?e"))
    )
    assert {r.e for r in q.select("e").collect()} == {"a", "x"}


def test_bgp_repeated_var_self_equality(spark):
    tri = spark.createDataFrame(
        [("s", "p", "s"), ("s", "p", "o")], ["subject", "predicate", "object"]
    )
    got = BGPQuery(tri).where(("?x", "p", "?x")).select("x").collect()
    assert [r.x for r in got] == ["s"]


def test_path_seq_and_closure(spark):
    tri = _tri(spark)
    two = {(r.src, r.dst) for r in path_seq(tri, ["knows", "knows"]).collect()}
    assert two == {("a", "c"), ("b", "d")}
    edges = tri.filter(F.col("predicate") == "knows").select(
        F.col("subject").alias("src"), F.col("object").alias("dst")
    )
    closure = {(r.src, r.dst) for r in transitive_closure(edges).collect()}
    assert closure == {
        ("a", "b"), ("a", "c"), ("a", "d"),
        ("b", "c"), ("b", "d"), ("c", "d"),
    }
    reflexive = transitive_closure(edges, reflexive=True).count()
    assert reflexive == 6 + 4  # + zero-length paths


def test_degrees_and_neighborhood(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], ["src", "dst"]
    )
    deg = {r.node: r.degree for r in degrees(edges).collect()}
    assert deg == {"a": 1, "b": 2, "c": 2, "d": 1}
    io = {r.node: (r.out_degree, r.in_degree) for r in in_out_degrees(edges).collect()}
    assert io["a"] == (1, 0) and io["d"] == (0, 1)
    nb = {r.node: r.dist for r in neighborhood(edges, "a", 2).collect()}
    assert nb == {"a": 0, "b": 1, "c": 2}
