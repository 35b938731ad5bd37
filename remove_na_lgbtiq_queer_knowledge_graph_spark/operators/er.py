"""Entity-resolution operators (SURVEY.md §2.10 T9/T10).

The reference resolves duplicates by a fragile 2-round manual id remap
(``update_ids`` at ``chronik/03-create-clean-chronik-entities.R:79-127``,
with a known bug in round 2).  We replace it with connected components
over the positive-pair graph + canonical-id election — the principled
fixpoint of what the reference iterates by hand.

``connected_components`` is a pure-DataFrame min-label propagation with
per-iteration ``localCheckpoint`` (lineage truncation).  Iterations ~
graph diameter; ER similarity graphs are shallow (duplicate clusters are
cliques-ish), so convergence is fast.  For extreme scale / high-diameter graphs,
``connected_components_star`` implements the large-star/small-star
algorithm (Kiveris et al.) — O(log²n) rounds regardless of diameter,
same (node, comp) contract, equality-tested against propagation.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


# Driver fast-path gate: ER/dedup pair graphs are usually a tiny
# fraction of the corpus (dup clusters), and the iterative fixpoint
# pays ~0.5 s of job overhead per round regardless of size.  Below
# this many symmetrized edges the component structure fits trivially
# on the driver and a union-find answers in microseconds — same
# counted-before-collected gate as the BGP driver-BFS path.  Above it
# the distributed fixpoint (or the star algorithm) stands.
_DRIVER_CC_EDGES = 100_000


def _driver_union_find(sym: DataFrame, rows: list | None = None) -> DataFrame:
    """Union-find over an already-bounded collected edge list; returns
    the same (node, comp = min reachable id) contract with the input's
    id type preserved.  ``rows`` lets the caller hand over edges it has
    already fetched (the take-probe gate) so they are not collected a
    second time."""
    from pyspark.sql.types import StructField, StructType

    if rows is None:
        rows = sym.collect()
    parent: dict = {}
    saw_null = False
    null_neighbors: list = []

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for r in rows:
        u, v = r["u"], r["v"]
        # NULL endpoints mirror the distributed propagation exactly
        # (review fix — unioning None used to raise TypeError in min(),
        # making behavior flip with the edge-count gate): a NULL join
        # key never MATCHES, so NULL never donates its label and can
        # never bridge two components; but the symmetrized edge
        # (NULL, x) feeds x's label INTO the NULL node, so NULL ends
        # with the min over its neighbors' final components (or NULL
        # when it has no non-null neighbor).
        if u is None or v is None:
            saw_null = True
            other = v if u is None else u
            if other is not None:
                null_neighbors.append(other)
                parent.setdefault(other, other)
            continue
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
    groups: dict = {}
    for node in parent:
        groups.setdefault(find(node), []).append(node)
    comp_of = {}
    out = []
    for members in groups.values():
        c = min(members)
        for n in members:
            comp_of[n] = c
            out.append((n, c))
    if saw_null:
        out.append((None,
                    min((comp_of[n] for n in null_neighbors), default=None)))
    utype = sym.schema["u"].dataType
    schema = StructType([StructField("node", utype),
                         StructField("comp", utype)])
    return sym.sparkSession.createDataFrame(out, schema)


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 50
) -> DataFrame:
    """(node, component) where component = min node id reachable.

    Deterministic (min over the component), so oracle-comparable.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = e.union(e.select(F.col("v"), F.col("u"))).distinct()
    sym = sym.localCheckpoint()
    # gate probe: ONE bounded fetch instead of count-then-collect — the
    # take reads the checkpointed blocks only until it has gate+1 rows,
    # and when the graph is small (the common ER case) the fetched rows
    # ARE the union-find input, so the small path runs one cheap job
    # where it ran two (r13 optimization).  The large path is
    # unchanged: the fixpoint keeps iterating over the same checkpoint.
    probe = sym.take(_DRIVER_CC_EDGES + 1)
    if len(probe) <= _DRIVER_CC_EDGES:
        # The fast-path mapping is a driver-built local relation bounded
        # by the gate (≤ 2×_DRIVER_CC_EDGES nodes — a few MB), but an
        # ExistingRDD carries NO size stats, so consumers joining it
        # against corpus-sized tables (docs/entities/hashes, all LEFT
        # joins with this mapping on the build side) planned a
        # SortMergeJoin that shuffled the CORPUS side.  The hint makes
        # those joins BroadcastHashJoin — the corpus side stays
        # unshuffled (guide §3.1).  The distributed path below stays
        # unhinted: its label table is corpus-sized by definition.
        # Bound is ROW-count, not bytes (r13 ADVICE): worst case is
        # 2×100k nodes × 2 wide-string ids — e.g. 200-byte URL ids give
        # a ~80 MB relation, i.e. tens-to-low-hundreds of MB held on
        # the driver and every executor where the SMJ only shuffled.
        # Acceptable because the rows were ALREADY driver-resident
        # (the union-find ran on them); corpora with multi-KB ids
        # should lower the gate or derive it from probed key width.
        return F.broadcast(_driver_union_find(sym, rows=probe))
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint()
    )
    # Convergence detection is fused into the materializing action:
    # labels move monotonically downward (min over self ∪ neighbors),
    # so Σcomp strictly decreases every round until the fixpoint — the
    # lazy localCheckpoint materializes inside the same job that
    # computes the sum, one job per round instead of checkpoint +
    # join-based changed-count (2× fewer jobs; iteration overhead, not
    # data volume, dominates small-diameter graphs).
    #
    # The Σcomp test only exists for INTEGRAL node ids (an explicit
    # ALLOWLIST — review fix: the old 'not string/binary' denylist
    # routed double/decimal(p,s>0) ids here, where the decimal(38,0)
    # cast rounds fractional distinctions away and Σ can look constant
    # while labels are still moving — premature 'convergence' that
    # silently splits components; a non-castable type would make the
    # sum NULL every round and None == None ends the loop after one).
    # Everything else uses the per-round changed-label count (one extra
    # node-keyed join, still a single action per round).
    ctype = dict(labels.dtypes)["comp"]
    numeric_ids = bool(
        ctype in ("tinyint", "smallint", "int", "bigint")
        or re.fullmatch(r"decimal\(\d+,0\)", ctype))
    prev_total = None
    converged = False
    for _ in range(max_iter):
        nbr = sym.join(
            labels.withColumnRenamed("node", "v"), "v"
        ).select(F.col("u").alias("node"), "comp")
        stepped = (
            labels.union(nbr)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
        )
        # pointer jump (comp ← comp[comp]): labels are node ids, so the
        # freshly stepped frame doubles as its own lookup table; one
        # extra small join per round turns O(diameter) rounds into
        # O(log diameter) — comp[comp] ≤ comp keeps monotonicity, so
        # the Σcomp convergence test still holds.
        jump = stepped.select(
            F.col("node").alias("__c"), F.col("comp").alias("__cc")
        )
        new = (
            stepped.join(jump, stepped["comp"] == jump["__c"], "left")
            .select(
                "node",
                F.coalesce(F.col("__cc"), F.col("comp")).alias("comp"),
            )
            .localCheckpoint(eager=False)
        )
        if numeric_ids:
            # decimal(38,0) keeps the sum exact where Σ(long ids) could
            # overflow (ANSI would raise) and double would round away a
            # single-label change
            total = new.agg(
                F.sum(F.col("comp").cast("decimal(38,0)"))
            ).collect()[0][0]
            converged = total == prev_total
            prev_total = total
        else:
            changed = (
                new.join(
                    labels.select("node", F.col("comp").alias("__prev")),
                    "node",
                )
                .filter(F.col("comp") != F.col("__prev"))
                .count()
            )
            converged = changed == 0
        labels = new
        if converged:
            break
    if not converged:
        # partially-merged labels are silently wrong components —
        # fail loud like every other bounded iteration in this repo
        # (review finding; the driver union-find path is exact and
        # never hits this)
        raise ValueError(
            f"connected_components: labels still moving after "
            f"max_iter={max_iter} rounds — raise max_iter")
    return labels


def resolve_entities(
    entities: DataFrame,
    positive_pairs: DataFrame,
    id_col: str = "id",
    name_col: str = "name",
) -> DataFrame:
    """T9/T10: positive pairs → components → canonical id + label election.

    Returns (id, name, id_new, name_new): every entity mapped to its
    component representative; canonical label = the label of the highest
    member id (the reference's ``arrange(desc(id)) %>% mutate(id_new =
    first(id))`` election, ``chronik/02:250-254``).  Singletons map to
    themselves.
    """
    cc = connected_components(positive_pairs, "id_1", "id_2")
    mapped = entities.join(
        cc.withColumnRenamed("node", id_col), id_col, "left"
    ).withColumn("comp", F.coalesce(F.col("comp"), F.col(id_col)))
    w = (
        Window.partitionBy("comp")
        .orderBy(F.col(id_col).desc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return mapped.select(
        F.col(id_col),
        F.col(name_col),
        F.first(id_col).over(w).alias("id_new"),
        F.first(name_col).over(w).alias("name_new"),
    )


def update_ids(df: DataFrame, mapping: DataFrame, id_col: str) -> DataFrame:
    """X2: apply an id_mapping (id → id_new) to a table — the reference's
    ``update_ids`` join (``chronik/03:79-88``), one join instead of its
    two manual rounds (transitivity already collapsed by
    connected_components)."""
    m = mapping.select(
        F.col("id").alias("__old"), F.col("id_new").alias("__new")
    )
    return (
        df.join(m, df[id_col] == F.col("__old"), "left")
        .withColumn(id_col, F.coalesce(F.col("__new"), F.col(id_col)))
        .drop("__old", "__new")
    )


def connected_components_star(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 50
) -> DataFrame:
    """Connected components by alternating large-star/small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    the extreme-scale alternative to min-label propagation: converges in
    O(log²(n)) rounds on any graph shape, vs diameter rounds for
    propagation, and every round is two groupBy/join passes over the
    edge list.  Same contract as :func:`connected_components`:
    (node, comp = min reachable id).

    large-star: every node attaches its strictly-larger neighbors to its
    smallest neighbor-or-self; small-star: attaches itself and its
    smaller neighbors likewise.  Both shrink star height monotonically;
    fixpoint = forest of depth-1 stars rooted at component minima.

    NULL node ids are REFUSED loudly (in-plan raise, zero extra jobs):
    the star rounds route everything through equi-joins and </> filters,
    where a NULL endpoint silently drops its edge — which would diverge
    from :func:`connected_components` (whose driver union-find treats
    NULL as a node) in exactly the "same contract" the docstring
    promises (review finding).  Use propagation for graphs that may
    carry NULL ids.
    """
    null_guard = F.when(
        F.col("a").isNull() | F.col("b").isNull(),
        F.raise_error(F.lit(
            "connected_components_star: NULL node ids are not supported "
            "(equi-join rounds would silently drop their edges) — use "
            "connected_components instead")).cast("boolean"),
    ).otherwise(F.col("a") != F.col("b"))
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(null_guard)
        .distinct()
        .localCheckpoint(eager=True)
    )
    def _round(cur: DataFrame, keep_larger: bool) -> DataFrame:
        sym = cur.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
            cur.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        mins = sym.groupBy("u").agg(F.min("v").alias("mv"))
        mins = mins.select("u", F.least("mv", "u").alias("m"))
        j = sym.join(mins, "u")
        if keep_larger:      # large-star: larger neighbors → m
            out = j.filter(F.col("v") > F.col("u")).select(
                F.col("v").alias("a"), F.col("m").alias("b")
            )
        else:                # small-star: self + smaller neighbors → m
            out = j.filter(F.col("v") <= F.col("u")).select(
                F.col("v").alias("a"), F.col("m").alias("b")
            ).unionAll(mins.select(F.col("u").alias("a"), F.col("m").alias("b")))
        return (
            out.filter(F.col("a") != F.col("b")).distinct()
            .localCheckpoint(eager=True)
        )

    def _sig(cur: DataFrame):
        return cur.agg(
            F.count("*").alias("n"),
            F.coalesce(
                F.sum(F.xxhash64("a", "b").cast("decimal(38,0)")),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("h"),
        ).first()

    prev = _sig(e)
    converged = False
    for _ in range(max_iter):
        e = _round(_round(e, keep_larger=True), keep_larger=False)
        cur = _sig(e)
        if (cur.n, cur.h) == (prev.n, prev.h):
            converged = True
            break
        prev = cur
    if not converged:
        # the star extraction below ASSUMES a depth-1 star forest, which
        # only holds at fixpoint — falling out of the loop would return
        # silently wrong components (review finding; same fail-loud
        # contract as tree_edge_betweenness/sssp_weighted)
        raise ValueError(
            f"connected_components_star: not at fixpoint after "
            f"max_iter={max_iter} rounds — raise max_iter")

    # fixpoint edges are (member, root) stars; roots map to themselves
    members = e.select(
        F.greatest("a", "b").alias("node"), F.least("a", "b").alias("comp")
    )
    roots = e.select(F.least("a", "b").alias("node")).distinct().withColumn(
        "comp", F.col("node")
    )
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionAll(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    labels = members.unionAll(roots).groupBy("node").agg(
        F.min("comp").alias("comp")
    )
    return nodes.join(labels, "node", "left").select(
        "node", F.coalesce("comp", F.col("node")).alias("comp")
    )
