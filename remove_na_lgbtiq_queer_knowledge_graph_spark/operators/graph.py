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

from ..functions.numeric import round_half_away_col


def degrees(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """G15: undirected degree per node (GraphFrames ``.degrees``
    semantics: each incident edge end counts once)."""
    ends = edges.select(F.col(src).alias("node")).unionAll(
        edges.select(F.col(dst).alias("node"))
    )
    return ends.groupBy("node").agg(F.count("*").alias("degree"))


def in_out_degrees(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    # null-safe full join: a plain equi-join never matches NULL keys, so
    # a graph with NULLs in both src and dst would emit TWO node=NULL
    # rows (one per side) where degrees() merges them into one — the two
    # degree views of the same graph must agree (review finding)
    out_d = edges.groupBy(F.col(src).alias("__on")).agg(
        F.count("*").alias("out_degree"))
    in_d = edges.groupBy(F.col(dst).alias("__in")).agg(
        F.count("*").alias("in_degree"))
    return (
        out_d.join(in_d, F.col("__on").eqNullSafe(F.col("__in")), "full")
        .select(
            F.coalesce("__on", F.col("__in")).alias("node"),
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
    )


def triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst",
    assume_canonical: bool = False,
) -> DataFrame:
    """Per-node triangle participation over an undirected graph —
    (node, n_triangles) for every node in ≥1 triangle.

    The scalable formulation (node-iterator with DEGREE ORIENTATION):
    symmetrize + dedup, then orient every edge from the (degree, id)-
    smaller endpoint to the larger.  Each triangle survives as exactly
    one oriented wedge u→v→w closed by u→w, and the orientation bounds
    every out-degree by O(√m) — so the wedge join is Σ outdeg² ≤ O(m^1.5)
    instead of Σ deg² (which a hub node makes quadratic).  Two
    equi-joins, one explode, one groupBy; no collect.

    ``assume_canonical``: the input is already a canonical
    (least, greatest)-oriented, deduped, MATERIALIZED edge set — skip
    re-canonicalizing it (clustering_coefficient builds exactly that
    frame for its degree aggregate and used to pay the full
    shuffle + executor-storage copy a second time here — review batch).
    """
    from ..spec import materialize

    if assume_canonical:
        und = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    else:
        e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")) \
            .filter(F.col("a") != F.col("b"))
        # materialize the deduped edge set: the oriented-edge plan below
        # references it ~6× (twice in sym's union, deg from sym, two deg
        # joins) and Spark does not share identical subplans across
        # DataFrame branches — for the co-occurrence callers the input is
        # itself a self-join + distinct that would re-run per reference
        und = materialize(
            e.select(F.least("a", "b").alias("a"),
                     F.greatest("a", "b").alias("b")).distinct())
    sym = und.unionByName(und.select(F.col("b").alias("a"),
                                     F.col("a").alias("b")))
    deg = sym.groupBy("a").agg(F.count("*").alias("d"))
    withd = (
        sym.join(deg, "a")
        .join(deg.select(F.col("a").alias("b"), F.col("d").alias("d2")), "b")
    )
    o = withd.filter(
        (F.col("d") < F.col("d2"))
        | ((F.col("d") == F.col("d2")) & (F.col("a") < F.col("b")))
    ).select(F.col("a").alias("u"), F.col("b").alias("v"))
    o = materialize(o)  # three join sides, one token of work
    wedges = (
        o.select(F.col("u"), F.col("v"))
        .join(o.select(F.col("u").alias("v"), F.col("v").alias("w")), "v")
    )
    tris = wedges.join(
        o.select(F.col("u"), F.col("v").alias("w")), ["u", "w"]
    )
    return (
        tris.select(F.explode(F.array("u", "v", "w")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("n_triangles"))
    )


def two_hop(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """G14: 2-hop neighborhood — (a)-[]->(b)-[]->(c) motif
    (``network-00-starting-point.rq:11-16``)."""
    e1 = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    e2 = edges.select(F.col(src).alias("b"), F.col(dst).alias("c"))
    return e1.join(e2, "b").select("a", "b", "c")


def tree_edge_betweenness(
    child_parent: DataFrame, max_depth: int,
    child: str = "child", parent: str = "parent",
    check_convergence: bool = True,
) -> DataFrame:
    """G16: exact edge betweenness for forests.

    In a tree every pair has one shortest path, so the betweenness of an
    edge is ``below × (component_size − below)`` where ``below`` is the
    subtree size under the child — computable with aggregations instead
    of Brandes' per-source BFS (`02-look-into-data.R:49`
    ``centrality_edge_betweenness``; the reference's KG edge tables are
    hierarchy-shaped).  For general graphs the path is sampled Brandes
    over Pregel — out of scope here and flagged in COVERAGE.md.

    ``max_depth`` bounds both the subtree-size and root-finding
    iterations; each round is one join + aggregation.

    ``check_convergence`` (default on — the silent-wrongness guard this
    file applies to every bounded iteration): raises when (a) any child
    has MULTIPLE parents — the input is not a forest, subtree sizes
    double-count and the output duplicates rows — or (b) one extra
    size round would still change a size, i.e. ``max_depth`` is below
    the tree height (or the "tree" has a cycle, whose sizes never
    reach fixpoint).  Size fixpoint at depth d implies every
    node-to-root chain is ≤ d hops, so the root-chase loop is covered
    by the same probe.  Two extra counts, both forest-table-sized.
    """
    # dedupe rows first: a duplicated (child, parent) row is ONE edge,
    # not two parents — without the distinct the multi-parent guard
    # misdiagnoses it as "not a forest", and with the guard off the
    # duplicate multiplies through the size-sum join and the final edge
    # join (double-counted subtrees, duplicated output rows — review
    # finding).  After distinct, rows-per-child == distinct parents, so
    # the guard below is exact.
    e = child_parent.select(F.col(child).alias("c"), F.col(parent).alias("p"))
    e = e.distinct().localCheckpoint(eager=True)
    if check_convergence:
        multi = e.groupBy("c").agg(F.count(F.lit(1)).alias("n")) \
                 .filter(F.col("n") > 1).count()
        if multi:
            raise ValueError(
                f"tree_edge_betweenness: {multi} child(ren) with multiple "
                "parents — input is not a forest; subtree sizes would "
                "double-count (use sampled/exact Brandes instead)")
    nodes = e.select(F.col("c").alias("node")).union(
        e.select(F.col("p").alias("node"))
    ).distinct().localCheckpoint(eager=True)

    # bottom-up subtree sizes: size = 1 + Σ child sizes, fixpoint ≤ depth
    sizes = nodes.withColumn("size", F.lit(1).cast("long"))
    for _ in range(max_depth):
        child_sum = (
            e.join(sizes.withColumnRenamed("node", "c"), "c")
            .groupBy(F.col("p").alias("node"))
            .agg(F.sum("size").alias("csum"))
        )
        sizes = (
            nodes.join(child_sum, "node", "left")
            .select("node", (F.lit(1) + F.coalesce("csum", F.lit(0))).cast("long").alias("size"))
            .localCheckpoint(eager=True)
        )
    if check_convergence:
        # one probe round: any size still moving means max_depth is
        # below the tree height (or a cycle) — fail loud, don't return
        # wrong betweenness
        probe_sum = (
            e.join(sizes.withColumnRenamed("node", "c"), "c")
            .groupBy(F.col("p").alias("node"))
            .agg(F.sum("size").alias("csum"))
        )
        probe = (
            nodes.join(probe_sum, "node", "left")
            .select("node", (F.lit(1) + F.coalesce("csum", F.lit(0)))
                    .cast("long").alias("size2"))
        )
        moved = (sizes.join(probe, "node")
                 .filter(F.col("size") != F.col("size2")).count())
        if moved:
            raise ValueError(
                f"tree_edge_betweenness: subtree sizes not at fixpoint "
                f"after max_depth={max_depth} rounds ({moved} still "
                "changing) — raise max_depth (tree deeper than assumed) "
                "or the input contains a cycle")

    # root per node by parent-pointer chasing (≤ depth hops)
    parents = e.select(F.col("c").alias("node"), F.col("p").alias("up"))
    roots = nodes.join(parents, "node", "left").select(
        "node", F.coalesce("up", F.col("node")).alias("root")
    )
    for _ in range(max_depth):
        roots = (
            roots.join(
                parents.select(F.col("node").alias("root"), F.col("up").alias("up2")),
                "root", "left",
            )
            .select("node", F.coalesce("up2", F.col("root")).alias("root"))
            .localCheckpoint(eager=True)
        )

    comp_size = roots.join(
        sizes.select(F.col("node").alias("root"), F.col("size").alias("comp_size")),
        "root",
    ).select("node", "comp_size")

    return (
        e.join(sizes.withColumnRenamed("node", "c"), "c")
        .join(comp_size.withColumnRenamed("node", "c"), "c")
        .select(
            F.col("c").alias("src"), F.col("p").alias("dst"),
            (F.col("size") * (F.col("comp_size") - F.col("size"))).cast("long")
            .alias("betweenness"),
        )
    )


def sampled_edge_betweenness(
    edges: DataFrame, pivots: DataFrame, max_depth: int,
    src: str = "src", dst: str = "dst", pivot: str = "p",
    state_partitions: int | None = None,
    require_exhausted: bool = False,
) -> DataFrame:
    """G16 on GENERAL graphs: Brandes edge betweenness from a
    deterministic pivot set, depth-bounded (`02-look-into-data.R:49`
    ``centrality_edge_betweenness``; this closes the forest-only gap of
    :func:`tree_edge_betweenness`).

    Forward phase: multi-source BFS carrying shortest-path counts σ —
    one join + partial-aggregated groupBy per level, keyed (pivot, node).
    Backward phase: pair-dependency accumulation δ(v) = Σ_w σv/σw ·
    (1 + δ(w)) over BFS-DAG edges, one level at a time.  Output is the
    per-edge dependency summed over pivots (canonical undirected edge),
    i.e. exact Brandes restricted to the pivot sample — scale by n/k for
    the unbiased estimate (Brandes & Pich 2007).

    Scale notes: state is (pivot × reached-node), linear in the pivot
    count — k is the sampling knob.  Every step is a hash join on the
    frontier key plus a map-side-combinable aggregation; no driver-side
    graph state.  σ values are integer-valued doubles (exact under 2^53,
    order-independent); δ sums go through DECIMAL(38,12) so partial-agg
    order can't change bits (spec.py determinism rules).  Levels are
    localCheckpoint-ed: each is consumed by 2+ downstream branches and
    lineage would otherwise grow per iteration.

    ``require_exhausted=True`` (the exactness mode
    :func:`exact_edge_betweenness` runs in) raises ``ValueError`` when
    ``max_depth`` rounds end with reachable nodes still unvisited —
    depth truncation is part of the SAMPLED estimator's contract, but
    for an exact computation it would silently undercount, the same
    silent-wrongness shape the round-11 SSSP guard closes.
    """
    from .. import spec as _spec

    # Pivot-sample state frames are small relative to cluster width;
    # fewer partitions cut per-iteration task overhead (the same 2.6x
    # effect measured on the KG fixtures).  The count should track
    # |pivots| × |frontier|: default to 1/4 of the cluster parallelism
    # (state is a sample, not the full graph), overridable via
    # ``state_partitions`` when the pivot set is large.
    nparts = state_partitions or max(
        2, edges.sparkSession.sparkContext.defaultParallelism // 4
    )
    sym = _spec.materialize(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionAll(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .coalesce(nparts)
    )
    lvl0 = _spec.materialize(
        pivots.select(
            F.col(pivot).alias("p"), F.col(pivot).alias("node"),
            F.lit(1.0).alias("sigma"),
        )
    )
    levels = [lvl0]
    seen = lvl0.select("p", "node")
    exhausted = False
    for _ in range(max_depth):
        frontier = levels[-1]
        nxt = _spec.materialize(
            frontier.join(sym, frontier.node == sym.u)
            .select("p", F.col("v").alias("node"), "sigma")
            .join(seen, ["p", "node"], "left_anti")
            .groupBy("p", "node")
            .agg(F.sum("sigma").alias("sigma"))
            .coalesce(nparts)
        )
        if nxt.isEmpty():
            exhausted = True
            break
        seen = _spec.materialize(
            seen.unionAll(nxt.select("p", "node")).coalesce(nparts))
        levels.append(nxt)

    if require_exhausted and not exhausted:
        probe = (
            levels[-1].join(sym, levels[-1].node == sym.u)
            .select("p", F.col("v").alias("node"))
            .join(seen, ["p", "node"], "left_anti")
        )
        if not probe.isEmpty():
            raise ValueError(
                f"sampled_edge_betweenness: max_depth={max_depth} rounds "
                "left reachable nodes unvisited — exact betweenness needs "
                "the BFS to exhaust every component (raise max_depth, or "
                "drop require_exhausted for the depth-truncated estimate).")

    # Intentionally F.round, not round_half_away_col: at d=12 the
    # float-scaled form leaves its validity regime once |x| reaches
    # ~4e3 (|x|·10^12 nears 2^53), where BOTH engines' rounds
    # degenerate to near-no-ops that F.round matches better — see
    # functions/numeric.py "VALIDITY REGIME".
    dec_sum = F.round(
        F.sum(F.col("c").cast("decimal(38,12)")).cast("double"), 12
    )
    delta = None
    contribs = []
    for lv in range(len(levels) - 1, 0, -1):
        upper = levels[lv - 1].select(
            "p", F.col("node").alias("vn"), F.col("sigma").alias("sv")
        )
        lower = levels[lv].select(
            "p", F.col("node").alias("wn"), F.col("sigma").alias("sw")
        )
        if delta is None:
            lower = lower.withColumn("delta", F.lit(0.0))
        else:
            lower = lower.join(
                delta.withColumnRenamed("node", "wn"), ["p", "wn"], "left"
            ).withColumn("delta", F.coalesce("delta", F.lit(0.0)))
        con = _spec.materialize(
            upper.join(sym, upper.vn == sym.u)
            .select("p", "vn", F.col("v").alias("wn"), "sv")
            .join(lower, ["p", "wn"])
            .select(
                "p", "vn", "wn",
                (F.col("sv") / F.col("sw") * (F.lit(1.0) + F.col("delta")))
                .alias("c"),
            )
            .coalesce(nparts)
        )
        contribs.append(con)
        delta = _spec.materialize(
            con.groupBy("p", F.col("vn").alias("node"))
            .agg(dec_sum.alias("delta"))
            .coalesce(nparts)
        )

    if not contribs:
        # schema must come from the INPUT id type, not a hardcoded
        # string — otherwise output types flip with the data shape
        # (max_depth=0 / disjoint pivots), the exact hazard pinned by
        # test_transitive_closure_preserves_numeric_id_types
        id_type = edges.schema[src].dataType.simpleString()
        return edges.sparkSession.createDataFrame(
            [], f"a {id_type}, b {id_type}, betweenness double"
        )
    allc = contribs[0]
    for c in contribs[1:]:
        allc = allc.unionAll(c)
    return (
        allc.select(
            F.least("vn", "wn").alias("a"), F.greatest("vn", "wn").alias("b"),
            "c",
        )
        .groupBy("a", "b")
        .agg(
            round_half_away_col(
                F.sum(F.col("c").cast("decimal(38,12)")).cast("double"), 6
            ).alias("betweenness")
        )
    )


def exact_edge_betweenness(
    edges: DataFrame, max_depth: int, max_nodes: int = 20000,
    src: str = "src", dst: str = "dst",
    state_partitions: int | None = None,
) -> DataFrame:
    """EXACT Brandes edge betweenness on a general (cyclic, undirected)
    graph: :func:`sampled_edge_betweenness` with the pivot set = EVERY
    node, plus two loud guards — the one approximation left against
    the reference (igraph's ``centrality_edge_betweenness`` on its
    ~10³-node statement graph, `analysis/network/02-look-into-data.R:49`)
    closed at the scale the reference actually runs it.

    Value convention: the sum of pair dependencies over ALL ordered
    sources, i.e. each unordered pair {s, t} contributes from both
    endpoints — exactly 2× igraph's per-pair edge betweenness on an
    undirected graph.  The factor is left in (dividing after the
    decimal-rounded aggregation would round twice; the parity test
    pins ``engine == 2 × brandes``).

    Guards (both fail loud, never approximate silently):

    - ``max_nodes``: all-sources Brandes state is |V| × |V| rows per
      BFS level — tractable at reference scale, a deliberate refusal
      at 100 TB scale where the SAMPLED estimator with ``n/k`` scaling
      is the correct tool (Brandes & Pich 2007).  The node count is
      one aggregate over the edge list, counted BEFORE any quadratic
      state is built.
    - ``require_exhausted``: exactness needs the forward BFS to visit
      every reachable node; an undersized ``max_depth`` raises instead
      of returning a truncated count.
    """
    sym_nodes = (
        edges.select(F.col(src).alias("n"))
        .unionAll(edges.select(F.col(dst).alias("n")))
        .filter(F.col("n").isNotNull())
        .distinct()
    )
    from ..spec import materialize

    pivots = materialize(sym_nodes)
    n = pivots.count()
    if n > max_nodes:
        raise ValueError(
            f"exact_edge_betweenness: {n} nodes exceeds max_nodes="
            f"{max_nodes} — all-sources Brandes is quadratic in state; "
            "use sampled_edge_betweenness with a pivot sample at this "
            "scale (scale by n/k for the unbiased estimate).")
    return sampled_edge_betweenness(
        edges, pivots.withColumnRenamed("n", "p"), max_depth,
        src=src, dst=dst, pivot="p",
        state_partitions=state_partitions, require_exhausted=True)


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
        # checkpoint the frontier itself, not just `seen`: the next
        # round (and the union) otherwise re-executes this round's join
        # from its lazy plan (review batch)
        nxt = (
            frontier.join(sym, frontier.node == sym.u)
            .select(F.col("v").alias("node"), F.lit(h).alias("dist"))
            .join(seen.select("node"), "node", "left_anti")
            .distinct()
            .localCheckpoint()
        )
        seen = seen.unionByName(nxt).localCheckpoint()
        if nxt.isEmpty():
            break  # frontier exhausted — further rounds add nothing
        frontier = nxt
    return seen


def pagerank(
    edges: DataFrame, n_iter: int = 10, damping: float = 0.85,
    src: str = "src", dst: str = "dst",
) -> DataFrame:
    """PageRank by fixed-iteration power method (G15-adjacent analytics;
    the reference computes degree/betweenness centrality — PageRank is
    the standard third centrality at scale).

    rank_{i+1}(v) = (1−d)/n + d·( Σ_{u→v} rank_i(u)/outdeg(u)
                                  + dangling_mass/n )

    Fixed iteration count (not convergence-tested) keeps the result a
    pure function of the input — oracle-checkable by unrolling the same
    iterations in SQL.  Per iteration: one join on src + one partial
    aggregation; contributions and the dangling sum go through
    DECIMAL(38,18) so partial-agg order can't change bits.  Ranks sum to
    1 (up to rounding) — asserted in tests.
    """
    from .. import spec as _spec

    e = _spec.materialize(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).distinct()
    )
    nodes = _spec.materialize(
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy(F.col("u").alias("node")).agg(
        F.count("*").alias("outdeg")
    )
    base = _spec.materialize(
        nodes.join(outdeg, "node", "left")
        .select("node", F.coalesce("outdeg", F.lit(0)).alias("outdeg"))
        .crossJoin(nodes.agg(F.count("*").alias("n")))
    )

    dec = "decimal(38,18)"
    rank = base.withColumn("rank", F.lit(1.0) / F.col("n"))
    for _ in range(n_iter):
        contrib = (
            rank.filter(F.col("outdeg") > 0)
            .join(e, rank.node == e.u)
            .groupBy(F.col("v").alias("node"))
            .agg(
                F.sum((F.col("rank") / F.col("outdeg")).cast(dec))
                .cast("double")
                .alias("inflow")
            )
        )
        dangling = (
            rank.filter(F.col("outdeg") == 0)
            .agg(F.sum(F.col("rank").cast(dec)).cast("double").alias("dmass"))
            .select(F.coalesce("dmass", F.lit(0.0)).alias("dmass"))
        )
        rank = _spec.materialize(
            base.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node", "outdeg", "n",
                (
                    (F.lit(1.0) - F.lit(damping)) / F.col("n")
                    + F.lit(damping)
                    * (
                        F.coalesce("inflow", F.lit(0.0))
                        + F.col("dmass") / F.col("n")
                    )
                ).alias("rank"),
            )
        )
    return rank.select("node", round_half_away_col(F.col("rank"), 9).alias("pagerank"))


def personalized_pagerank(
    edges: DataFrame, seeds: DataFrame, n_iter: int = 10,
    damping: float = 0.85, src: str = "src", dst: str = "dst",
    node: str = "node",
) -> DataFrame:
    """Personalized PageRank: the power method with the teleport mass
    concentrated on a SEED SET instead of spread uniformly — the
    standard graph-proximity score ("how related is every entity to
    these seeds"), which is what a KG actually asks (related entities
    for a curated list; candidate ranking for entity linking).

        rank_{i+1}(v) = (1−d)·rv(v) + d·( Σ_{u→v} rank_i(u)/outdeg(u)
                                          + dangling_mass·rv(v) )

    with rv uniform over the seeds (1/|S| on seeds, 0 elsewhere) —
    dangling mass teleports back to the seeds, so ranks stay a
    probability distribution (Σ rank = 1, asserted in tests) and nodes
    unreachable from the seed set score exactly 0.

    Same plan shape and determinism discipline as :func:`pagerank`
    (fixed iterations → unrollable SQL oracle; DECIMAL(38,18) partial
    sums; one join + one aggregate per iteration; the seed dim and the
    one-row dangling mass are broadcast).  Seeds not present in the
    edge set still receive their restart mass — they are real nodes of
    the computation (matching the SQL oracle's FULL set = graph nodes
    ∪ seeds)."""
    from .. import spec as _spec

    e = _spec.materialize(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).distinct()
    )
    s = seeds.select(F.col(node).alias("node")).distinct()
    nodes = _spec.materialize(
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .unionAll(s)
        .distinct()
    )
    outdeg = e.groupBy(F.col("u").alias("node")).agg(
        F.count("*").alias("outdeg")
    )
    base = _spec.materialize(
        nodes.join(outdeg, "node", "left")
        .select("node", F.coalesce("outdeg", F.lit(0)).alias("outdeg"))
        .join(F.broadcast(s.withColumn("__seed", F.lit(1))), "node", "left")
        .crossJoin(F.broadcast(s.agg(F.count("*").alias("ns"))))
        .select(
            "node", "outdeg",
            F.when(F.col("__seed").isNotNull(),
                   F.lit(1.0) / F.col("ns")).otherwise(F.lit(0.0))
            .alias("rv"),
        )
    )

    dec = "decimal(38,18)"
    rank = base.withColumn("rank", F.col("rv"))
    for _ in range(n_iter):
        contrib = (
            rank.filter(F.col("outdeg") > 0)
            .join(e, rank.node == e.u)
            .groupBy(F.col("v").alias("node"))
            .agg(
                F.sum((F.col("rank") / F.col("outdeg")).cast(dec))
                .cast("double")
                .alias("inflow")
            )
        )
        dangling = (
            rank.filter(F.col("outdeg") == 0)
            .agg(F.sum(F.col("rank").cast(dec)).cast("double").alias("dmass"))
            .select(F.coalesce("dmass", F.lit(0.0)).alias("dmass"))
        )
        rank = _spec.materialize(
            base.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node", "outdeg", "rv",
                (
                    (F.lit(1.0) - F.lit(damping)) * F.col("rv")
                    + F.lit(damping)
                    * (
                        F.coalesce("inflow", F.lit(0.0))
                        + F.col("dmass") * F.col("rv")
                    )
                ).alias("rank"),
            )
        )
    return rank.select("node", round_half_away_col(F.col("rank"), 9).alias("ppr"))


def label_propagation(
    edges: DataFrame, n_iter: int = 4, src: str = "src", dst: str = "dst",
) -> DataFrame:
    """Synchronous label-propagation community detection (G15-adjacent
    analytics next to CC / PageRank / betweenness; the reference's
    network study clusters the statement graph visually —
    ``analysis/plot-full-network.qmd:73-91``).

    Deterministic variant (Raghavan et al. 2007 with a total-order
    tie-break so the fixed-point is a pure function of the input):

        label_{i+1}(v) = argmax_L |{u ∈ N(v) ∪ {v} : label_i(u) = L}|,
                         ties broken by lexicographically smallest L

    over the UNDIRECTED edge set, every node seeded with its own id.
    The vote INCLUDES the node's own current label — the standard
    damping that kills synchronous LPA's two-coloring oscillation on
    (near-)bipartite structures (a bare 2-node component flip-flops
    forever under neighbor-only voting).  Fixed iteration count (not
    convergence-tested) keeps the result oracle-checkable by unrolling
    the same rounds in SQL.

    Scale shape: per iteration ONE equi-join of the label frame to the
    symmetrized edge list (shuffle ~ |E|), one partial-aggregated
    (node, label) count, and a per-node top-1 window (WindowGroupLimit
    prunes to one row per node before the final exchange) — no global
    funnel, no driver state.  The label frame is materialized each
    round so lineage stays flat across iterations.
    """
    from .. import spec as _spec

    sym = _spec.materialize(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionAll(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    labels = sym.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    from pyspark.sql import Window

    top1 = Window.partitionBy("node").orderBy(
        F.col("c").desc(), F.col("label").asc()
    )
    for _ in range(n_iter):
        votes = labels.join(sym, labels.node == sym.u).select(
            F.col("v").alias("node"), "label"
        ).unionAll(labels.select("node", "label"))  # self-vote
        cnt = votes.groupBy("node", "label").agg(
            F.count(F.lit(1)).alias("c"))
        # sym is symmetric, so every node occurs as a v — the top-1
        # pick re-covers the full node set each round
        labels = _spec.materialize(
            cnt.withColumn("rn", F.row_number().over(top1))
            .filter(F.col("rn") == 1)
            .select("node", "label")
        )
    return labels.select("node", F.col("label").alias("community"))


def clustering_coefficient(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Local clustering coefficient per node (deg ≥ 2):
    cc(v) = 2·T(v) / (deg(v)·(deg(v)−1)) — how close each node's
    neighborhood is to a clique, the standard companion statistic to
    the triangle count it reuses.  Zero-triangle nodes of degree ≥ 2
    are kept (cc = 0): they're the signal the metric exists for.

    Cost = :func:`triangle_counts` (O(m^1.5) oriented wedge join) plus
    one degree aggregate and a left join."""
    from ..spec import materialize

    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")) \
        .filter(F.col("a") != F.col("b"))
    # one materialized dedup shared by the degree aggregate AND the
    # triangle pass (which would otherwise re-run the caller's
    # self-join-distinct input per internal reference)
    und = materialize(
        e.select(F.least("a", "b").alias("a"),
                 F.greatest("a", "b").alias("b")).distinct())
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node").agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    tris = triangle_counts(und, "a", "b", assume_canonical=True)
    return (
        deg.filter(F.col("degree") >= 2)
        .join(tris, "node", "left")
        .select(
            "node", "degree",
            F.coalesce("n_triangles", F.lit(0)).cast("long")
            .alias("n_triangles"),
            round_half_away_col(
                (F.lit(2) * F.coalesce("n_triangles", F.lit(0)))
                .cast("double")
                / (F.col("degree") * (F.col("degree") - F.lit(1))),
                6,
            ).alias("clustering"),
        )
    )


def kcore(
    edges: DataFrame, k: int, rounds: int,
    src: str = "src", dst: str = "dst",
) -> DataFrame:
    """Bounded k-core peeling: ``rounds`` synchronous rounds of
    "drop every node whose degree in the SURVIVING subgraph is < k",
    returning the survivors with their within-subgraph degree.  With
    enough rounds this is the k-core (the maximal subgraph of min
    degree ≥ k, Seidman 1983); the FIXED round count keeps the result
    a pure function of the input, oracle-checkable by unrolling the
    same rounds in SQL — the same contract as pagerank/LPA.  Tests
    assert the fixpoint was actually reached on the registry graph
    (every survivor's final degree ≥ k), so the bound is validated,
    not assumed.

    Per round: one degree aggregate over surviving edges + two semi
    joins to drop edges touching peeled nodes — all edge-linear, the
    label frame localCheckpointed so lineage stays flat."""
    from .. import spec as _spec

    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")) \
        .filter(F.col("a") != F.col("b"))
    und = e.select(F.least("a", "b").alias("a"),
                   F.greatest("a", "b").alias("b")).distinct()
    sym = _spec.materialize(
        und.unionAll(und.select(F.col("b").alias("a"), F.col("a").alias("b"))))
    for _ in range(rounds):
        deg = sym.groupBy("a").agg(F.count(F.lit(1)).alias("d"))
        keep = deg.filter(F.col("d") >= k).select("a")
        sym = _spec.materialize(
            sym.join(keep, "a", "semi")
            .join(keep.select(F.col("a").alias("b")), "b", "semi")
        )
    return sym.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("core_degree"))


def bfs_distances(
    edges: DataFrame, sources: DataFrame, max_depth: int,
    src: str = "src", dst: str = "dst", node: str = "node",
) -> DataFrame:
    """Multi-source BFS: the minimum hop distance from ANY source node,
    bounded at ``max_depth`` levels — the reachability-with-evidence
    primitive (how far is every item from a seed set: curated entities,
    contaminated documents, trusted records).  Returns (node, dist)
    for every node within reach; sources themselves report 0.

    Level-synchronous frontier expansion (the Pregel/GraphX BFS shape):
    each round joins the CURRENT frontier — only the nodes first seen
    last round, not the whole visited set — against the edge table,
    anti-joins out already-visited nodes, and localCheckpoints the new
    frontier so lineage stays flat.  Work per round is
    ∝ edges(frontier), total ∝ edges within ``max_depth`` of a source;
    the visited set only ever GROWS by append, never recomputes.  The
    bounded depth keeps the result a pure function of the input and
    oracle-checkable by a depth-capped recursive CTE — the same fixed-
    iteration contract as pagerank/LPA/kcore."""
    from .. import spec as _spec

    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")) \
        .filter(F.col("a") != F.col("b"))
    sym = _spec.materialize(
        e.unionAll(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct())
    frontier = _spec.materialize(
        sources.select(F.col(node).alias("n")).distinct())
    visited = frontier.withColumn("dist", F.lit(0).cast("long"))
    for depth in range(1, max_depth + 1):
        nxt = _spec.materialize(
            frontier.join(sym, frontier.n == sym.a)
            .select(F.col("b").alias("n"))
            .distinct()
            .join(visited.select("n"), "n", "anti")
        )
        if nxt.isEmpty():
            break  # empty frontier: remaining rounds are dead work
            # (byte-identical output — nothing left to append)
        frontier = nxt
        visited = _spec.materialize(visited.unionAll(
            nxt.withColumn("dist", F.lit(depth).cast("long"))))
    return visited.select(F.col("n").alias("node"), "dist")


def sssp_weighted(
    edges: DataFrame, sources: DataFrame, rounds: int,
    src: str = "src", dst: str = "dst", weight: str = "w",
    node: str = "node", check_convergence: bool = True,
) -> DataFrame:
    """Multi-source WEIGHTED shortest paths: minimum total edge weight
    from any source, computed as ``rounds`` synchronous Bellman-Ford
    relaxations — hop-count BFS's weighted sibling (a 2-hop path of
    cheap strong ties can beat a 1-hop weak tie, which is what makes
    tie-strength routing different from reachability).  Returns
    (node, dist) for nodes reached within ``rounds`` relaxations;
    sources report 0.

    Weights must be non-negative LONGS (integer micro-costs — keeps
    every candidate distance exact integer arithmetic, so engines
    cannot drift and min() is total).  Per round: one frontier?-free
    relaxation join (current dists × edges) + a min aggregate over the
    union with the standing dists, localCheckpointed flat.  Work per
    round ∝ |dist| + |edges touched|; with non-negative weights dists
    reach the true fixpoint within graph-diameter rounds — the FIXED
    round count keeps the result a pure function of the input
    (oracle-checkable by unrolling, same contract as kcore/pagerank),
    and tests assert the fixpoint actually holds on the shipped graph.

    CONVERGENCE GUARD (round 11): a ``rounds`` value below the
    weighted diameter of some future input would silently return
    too-short distances — the one latent silent-wrongness shape the
    round-10 audit flagged.  With ``check_convergence=True`` (the
    default) the operator runs ONE extra relaxation after the loop and
    raises ``ValueError`` if any distance would still improve (a new
    node reached, or a shorter path found) — converting under-
    provisioned rounds into a loud, named failure at the cost of one
    join + aggregate action.  Pass ``check_convergence=False`` only
    when truncation-at-``rounds`` is the INTENDED semantics (e.g.
    bounded-horizon scoring; the property tests exercise that mode
    explicitly).  The guard never changes the returned distances, so
    the unrolled oracle is unaffected.  ``bfs_distances``/``bfs_
    distances_per_source`` need no guard: depth-bounded BFS is DEFINED
    as bounded (``max_depth`` is part of the contract, not a
    convergence knob)."""
    from .. import spec as _spec

    # The documented non-negative-LONG contract, ENFORCED in-plan (zero
    # extra jobs, active in BOTH check modes — review finding: the old
    # bare cast('long') silently TRUNCATED fractional weights to wrong
    # shortest paths, a NULL weight propagated NULL distances, and the
    # negative check cost a separate aggregate and only ran under
    # check_convergence).  A negative weight forms a negative cycle on
    # the symmetrized graph; a fractional or NULL weight is malformed
    # input — all three raise with the offending value named.
    wc = F.col(weight)
    wl = wc.cast("long")
    checked_w = F.when(
        wc.isNotNull() & (wl >= 0) & (wl.cast("double") == wc.cast("double")),
        wl,
    ).otherwise(F.raise_error(F.concat(
        F.lit("sssp_weighted: weight must be a non-negative integral "
              "value (exact integer arithmetic keeps min() total across "
              "engines), got "),
        F.coalesce(wc.cast("string"), F.lit("NULL")))).cast("long"))
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"),
                     checked_w.alias("w")) \
        .filter(F.col("a") != F.col("b"))
    sym = _spec.materialize(
        e.unionAll(e.select(F.col("b").alias("a"), F.col("a").alias("b"),
                            "w")))
    dist = _spec.materialize(
        sources.select(F.col(node).alias("n")).distinct()
        .withColumn("d", F.lit(0).cast("long")))
    for _ in range(rounds):
        relaxed = (
            dist.join(sym, dist.n == sym.a)
            .select(F.col("b").alias("n"), (F.col("d") + F.col("w")).alias("d"))
        )
        dist = _spec.materialize(
            dist.unionAll(relaxed).groupBy("n").agg(F.min("d").alias("d")))
    if check_convergence:
        probe = (
            dist.join(sym, dist.n == sym.a)
            .select(F.col("b").alias("n"), (F.col("d") + F.col("w")).alias("cand"))
            .groupBy("n").agg(F.min("cand").alias("cand"))
            .join(dist, "n", "left")
            .filter(F.col("d").isNull() | (F.col("cand") < F.col("d")))
        )
        if not probe.isEmpty():
            raise ValueError(
                f"sssp_weighted: rounds={rounds} is below the weighted "
                "diameter — distances are not at fixpoint (an extra "
                "relaxation still improves them).  Raise rounds, or pass "
                "check_convergence=False if truncation at this horizon "
                "is the intended semantics.")
    return dist.select(F.col("n").alias("node"), F.col("d").alias("dist"))


def link_prediction_jaccard(
    edges: DataFrame, src: str = "src", dst: str = "dst",
    min_common: int = 1, max_middle_degree: int | None = None,
) -> DataFrame:
    """Link prediction by neighborhood jaccard (Liben-Nowell & Kleinberg
    2003): for every NON-adjacent pair within two hops, the common-
    neighbor count and J = |N(u)∩N(w)| / |N(u)∪N(w)| — the missing-edge
    suggester (which entities should probably be related but aren't:
    ER reviewer queues, KG completion candidates).

    Relational shape: candidates are exactly the open wedges — the
    symmetric neighbor table self-joined on the MIDDLE node (each
    common neighbor m produces the (u, w) pair once, so the wedge
    count IS the intersection size), anti-joined against the edge set,
    then one degree join for the union denominator.  The wedge join's
    mass is Σ_m deg(m)² — inherent to the definition (a hub's
    neighborhood really does pairwise co-occur), so ``max_middle_
    degree`` optionally drops super-hub middles first: standard
    practice at web scale, because a celebrity neighbor carries ~zero
    link signal while contributing deg² candidate mass.  The cut is a
    documented RECALL trade (pairs whose only common neighbors are
    hubs disappear), applied before the quadratic step, and its effect
    is pinned in tests.

    CONSISTENCY (round-11 advice): with the cut active, the degree
    denominators are computed from the SAME hub-cut neighbor table as
    the wedge numerator — i.e. the reported score is exactly the
    jaccard of the hub-REMOVED graph, |N'(u)∩N'(w)| / |N'(u)∪N'(w)|
    with N'(x) = non-hub neighbors of x.  (The previous mix — cut
    intersection over UNCUT union — was the jaccard of no consistent
    graph and biased every hub-adjacent pair low.)  With no cut the
    two tables coincide and nothing changes."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")) \
        .filter(F.col("a") != F.col("b"))
    und = e.select(F.least("a", "b").alias("a"),
                   F.greatest("a", "b").alias("b")).distinct()
    from ..spec import materialize

    nb = materialize(
        und.select(F.col("a").alias("m"), F.col("b").alias("x"))
        .unionAll(und.select(F.col("b").alias("m"), F.col("a").alias("x"))))
    mid = nb
    if max_middle_degree is not None:
        mdeg = nb.groupBy("m").agg(F.count(F.lit(1)).alias("md"))
        mid = materialize(nb.join(
            mdeg.filter(F.col("md") <= max_middle_degree).select("m"), "m"))
    # degrees over the (possibly cut) table mid, NOT nb — numerator and
    # denominator must describe the same graph (see docstring)
    deg = mid.groupBy("x").agg(F.count(F.lit(1)).cast("long").alias("d"))
    wedges = (
        mid.select("m", F.col("x").alias("u"))
        .join(mid.select("m", F.col("x").alias("w")), "m")
        .filter(F.col("u") < F.col("w"))
        .groupBy("u", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("common"))
        .filter(F.col("common") >= min_common)
    )
    cand = wedges.join(
        und.select(F.col("a").alias("u"), F.col("b").alias("w")),
        ["u", "w"], "anti")
    du = deg.select(F.col("x").alias("u"), F.col("d").alias("du"))
    dw = deg.select(F.col("x").alias("w"), F.col("d").alias("dw"))
    return (
        cand.join(du, "u").join(dw, "w")
        .select(
            "u", "w", "common",
            round_half_away_col(
                F.col("common")
                / (F.col("du") + F.col("dw") - F.col("common")), 6
            ).alias("jaccard"))
    )


def bfs_distances_per_source(
    edges: DataFrame, sources: DataFrame, max_depth: int,
    src: str = "src", dst: str = "dst", node: str = "node",
) -> DataFrame:
    """PER-SOURCE bounded BFS: (source, node, dist) for every source in
    the sample and every node within ``max_depth`` of it — the
    distance table sampled centrality estimators consume
    (:func:`bfs_distances` collapses to min-over-sources; this keeps
    each source's distances separate).  Same level-synchronous
    frontier shape, with the source id carried through the frontier:
    state is |sources| × reach rows, so callers sample sources — the
    standard Eppstein-Wang trade (centrality error ~ 1/√|S|) rather
    than all-pairs BFS."""
    from .. import spec as _spec

    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")) \
        .filter(F.col("a") != F.col("b"))
    sym = _spec.materialize(
        e.unionAll(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct())
    frontier = _spec.materialize(
        sources.select(F.col(node).alias("s")).distinct()
        .select("s", F.col("s").alias("n")))
    visited = frontier.withColumn("dist", F.lit(0).cast("long"))
    for depth in range(1, max_depth + 1):
        nxt = _spec.materialize(
            frontier.join(sym, frontier.n == sym.a)
            .select("s", F.col("b").alias("n"))
            .distinct()
            .join(visited.select("s", "n"), ["s", "n"], "anti")
        )
        if nxt.isEmpty():
            break  # every source's frontier exhausted — dead rounds
        frontier = nxt
        visited = _spec.materialize(visited.unionAll(
            nxt.withColumn("dist", F.lit(depth).cast("long"))))
    return visited.select(F.col("s").alias("source"),
                          F.col("n").alias("node"), "dist")
