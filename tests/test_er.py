"""Connected-components / resolve_entities unit tests (SURVEY §2.10 T9-T10).

Replaces the reference's regression pins on manually-merged ids
(`chronik/02:187-205,410-428`) with explicit component fixtures,
including the transitive case its 2-round update_ids got wrong
(`chronik/03:113-121`)."""

from pyspark.sql import functions as F

from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.er import (
    connected_components,
    resolve_entities,
    update_ids,
)


def test_connected_components_basic(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["src", "dst"]
    )
    got = {r.node: r.comp for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_connected_components_chain_transitivity(spark):
    # A 6-node chain needs >2 propagation rounds — the exact case the
    # reference's manual 2-round remap mishandled.
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 6)], ["src", "dst"]
    )
    got = {r.node: r.comp for r in connected_components(edges).collect()}
    assert set(got.values()) == {1}


def test_resolve_entities_election_and_singletons(spark):
    ents = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (9, "solo")], ["id", "name"]
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], ["id_1", "id_2"])
    got = {r.id: (r.id_new, r.name_new) for r in resolve_entities(ents, pairs).collect()}
    # canonical = max id member (3, 'c'); singleton maps to itself
    assert got[1] == (3, "c") and got[2] == (3, "c") and got[3] == (3, "c")
    assert got[9] == (9, "solo")


def test_update_ids(spark):
    facts = spark.createDataFrame([(1, 10.0), (2, 20.0), (9, 5.0)], ["eid", "v"])
    mapping = spark.createDataFrame([(1, 3), (2, 3)], ["id", "id_new"])
    got = update_ids(facts, mapping, "eid")
    agg = {r.eid: r.total for r in got.groupBy("eid").agg(F.sum("v").alias("total")).collect()}
    assert agg == {3: 30.0, 9: 5.0}


def test_salted_join_matches_plain_join(spark):
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.relational import (
        salted_join,
    )

    fact = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (3, "d")], ["k", "payload"]
    )
    dim = spark.createDataFrame([(1, "one"), (2, "two")], ["k", "name"])
    inner = salted_join(fact, dim, "k", n_salts=4)
    want = fact.join(dim, "k")
    assert sorted(map(tuple, inner.collect())) == sorted(map(tuple, want.collect()))
    left = salted_join(fact, dim, "k", n_salts=4, how="left")
    want_left = fact.join(dim, "k", "left")
    assert sorted(map(tuple, left.select("k", "payload", "name").collect())) == \
        sorted(map(tuple, want_left.select("k", "payload", "name").collect()))


def test_salted_join_hot_key_split(spark):
    """Explicit hot keys: salted branch + cold plain branch together
    reproduce the plain join exactly, inner and left, including
    unmatched hot fact rows and null keys."""
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.relational import (
        salted_join,
    )

    rows = [(1, f"hot{i}") for i in range(50)] + [
        (2, "c"), (3, "d"), (7, "miss"), (None, "nul")
    ]
    fact = spark.createDataFrame(rows, "k int, payload string")
    dim = spark.createDataFrame(
        [(1, "one"), (2, "two"), (3, "three")], ["k", "name"]
    )
    skey = lambda row: tuple(str(v) for v in row)  # None-safe total order
    for how in ("inner", "left"):
        got = salted_join(fact, dim, "k", n_salts=4, how=how, hot_keys=[1])
        want = fact.join(dim, "k", how)
        assert sorted(
            map(tuple, got.select("k", "payload", "name").collect()), key=skey
        ) == sorted(
            map(tuple, want.select("k", "payload", "name").collect()), key=skey
        )


def test_salted_join_auto_detects_skew(spark):
    """'auto' finds a key owning most of the fact side and salts only
    it: the exploded dim branch carries the hot key, and results still
    match the plain join."""
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.relational import (
        salted_join,
    )

    rows = [(42, i) for i in range(2000)] + [(k, 0) for k in range(100)]
    fact = spark.createDataFrame(rows, "k int, payload int")
    dim = spark.createDataFrame([(k, f"d{k}") for k in range(100)] + [(42, "hot")],
                                ["k", "name"])
    got = salted_join(fact, dim, "k", n_salts=4, hot_keys="auto",
                      sample_rows=500)
    want = fact.join(dim, "k")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # the union+explode shape is present for the genuinely skewed frame
    plan = got._jdf.queryExecution().optimizedPlan().toString()
    assert "Union" in plan and ("Generate" in plan or "explode" in plan)


def test_salted_join_uniform_plan_has_no_explode(spark):
    """With no hot keys (uniform data / hot_keys=None) the plan is the
    plain join: no Generate/explode, no ×n_salts dim replication."""
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.relational import (
        salted_join,
    )

    fact = spark.createDataFrame([(i % 50, i) for i in range(500)],
                                 "k int, payload int")
    dim = spark.createDataFrame([(k, f"d{k}") for k in range(50)], ["k", "name"])
    plan = salted_join(fact, dim, "k", hot_keys=None)._jdf.queryExecution() \
        .optimizedPlan().toString()
    assert "Generate" not in plan and "explode" not in plan


def test_star_cc_matches_label_propagation(spark):
    """large-star/small-star CC agrees with min-label propagation on
    chains, cliques, forests and a pseudo-random graph."""
    import random

    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.er import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(7)
    graphs = {
        "chain": [(i, i + 1) for i in range(20)],
        "cliques": [(b + i, b + j) for b in (100, 200) for i in range(5)
                    for j in range(i + 1, 5)],
        "forest": [(i, i // 2) for i in range(1, 30)],
        "random": [(rng.randrange(40), rng.randrange(40)) for _ in range(45)],
    }
    for name, raw in graphs.items():
        raw = [(a, b) for a, b in raw if a != b]
        edges = spark.createDataFrame(raw, ["src", "dst"])
        want = {r.node: r.comp for r in connected_components(edges).collect()}
        got = {r.node: r.comp for r in connected_components_star(edges).collect()}
        assert got == want, name


def test_asof_join_semantics(spark):
    """Exact-ts match visible; no prior right row → null; simultaneous
    right rows resolved by tie_break (max)."""
    import datetime as dt

    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.relational import (
        asof_join,
    )

    def ts(m):
        return dt.datetime(2024, 1, 1, 0, m)

    left = spark.createDataFrame(
        [(1, "k", ts(5)), (2, "k", ts(10)), (3, "k", ts(2)), (4, "z", ts(9))],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("k", ts(5), 50.0), ("k", ts(5), 70.0), ("k", ts(3), 30.0)],
        "user_id string, ts timestamp, value double",
    )
    got = {
        r.event_id: r.value
        for r in asof_join(
            left, right, "user_id", "ts", ["value"], tie_break="value"
        ).collect()
    }
    # id1: exact-ts 00:05 sees both simultaneous purchases → max 70;
    # id2: latest ≤ 00:10 is 00:05 → 70; id3: nothing ≤ 00:02 → None;
    # id4: other key, no rights → None
    assert got == {1: 70.0, 2: 70.0, 3: None, 4: None}

    fwd = {
        r.event_id: r.value
        for r in asof_join(
            left, right, "user_id", "ts", ["value"], tie_break="value",
            direction="forward",
        ).collect()
    }
    # id1: exact-ts 00:05 visible forward too → max 70; id2: nothing
    # ≥ 00:10 → None; id3: earliest ≥ 00:02 is 00:03 → 30; id4: None
    assert fwd == {1: 70.0, 2: None, 3: 30.0, 4: None}


def test_interval_join_semantics(spark):
    """Containment is inclusive on both bounds, keys isolate users,
    overlapping intervals each match (many-to-many), and bin-boundary
    points (point exactly on a bin edge inside the interval) are not
    lost."""
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.relational import (
        interval_join,
    )

    intervals = spark.createDataFrame(
        [(1, 10, 1000.0, 2000.0),   # u1: base interval
         (1, 11, 1900.0, 3700.0),   # u1: overlaps the first
         (2, 20, 1000.0, 2000.0)],  # other key, same range
        "user long, iid long, s double, e double")
    points = spark.createDataFrame(
        [(1, 100, 1000.0),   # == start (inclusive)
         (1, 101, 2000.0),   # == end of i10, inside i11 → 2 matches
         (1, 102, 3600.0),   # bin-width boundary (3600/1800 exact edge)
         (1, 103, 999.999),  # just outside
         (2, 200, 1500.0)],  # matches only u2's interval
        "user long, pid long, p double")
    got = sorted(
        (r.pid, r.iid)
        for r in interval_join(points, intervals, "p", "s", "e",
                               keys=["user"], bin_width=1800.0).collect())
    assert got == [(100, 10), (101, 10), (101, 11), (102, 11), (200, 20)]


def test_interval_join_guard_raises_on_degenerate_span(spark):
    """An interval spanning more bins than the guard allows must fail
    loud in-plan, not explode the bin list."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.relational import (
        interval_join,
    )

    intervals = spark.createDataFrame(
        [(1, 10, 0.0, 1800.0 * 50)], "user long, iid long, s double, e double")
    points = spark.createDataFrame(
        [(1, 100, 10.0)], "user long, pid long, p double")
    with pytest.raises(SparkRuntimeException, match="interval_join"):
        interval_join(points, intervals, "p", "s", "e", keys=["user"],
                      bin_width=1800.0, max_bins_per_interval=8).collect()
    # INVERTED interval (end < start — corrupt upstream data) must also
    # fail loud: a one-sided guard would let the negative span through
    # and F.sequence would explode |nbins|+1 descending bins silently
    inverted = spark.createDataFrame(
        [(1, 11, 1800.0 * 50, 0.0)], "user long, iid long, s double, e double")
    with pytest.raises(SparkRuntimeException, match="interval_join"):
        interval_join(points, inverted, "p", "s", "e", keys=["user"],
                      bin_width=1800.0, max_bins_per_interval=8).collect()


def test_interval_join_auto_mode_validates_tiny_guard(spark):
    """Auto width divides by (max_bins_per_interval - 2); below 3 the
    docstring's 'guard unreachable' claim breaks (w = max_len, and a
    max-length interval straddling a bin boundary needs 2 bins, which
    the strict `< 2` guard rejects on WELL-FORMED data).  Auto mode
    must refuse such settings at entry — and at the minimum legal
    setting (3) the straddling shape must pass."""
    import pytest

    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.relational import (
        interval_join,
    )

    # max-length interval NOT aligned to a bin edge → straddles one
    intervals = spark.createDataFrame(
        [(1, 10, 50.0, 150.0)], "user long, iid long, s double, e double")
    points = spark.createDataFrame(
        [(1, 100, 60.0)], "user long, pid long, p double")
    for bad in (0, 1, 2):
        with pytest.raises(ValueError, match="max_bins_per_interval >= 3"):
            interval_join(points, intervals, "p", "s", "e", keys=["user"],
                          bin_width=None, max_bins_per_interval=bad)
    got = interval_join(points, intervals, "p", "s", "e", keys=["user"],
                        bin_width=None, max_bins_per_interval=3).collect()
    assert [(r.pid, r.iid) for r in got] == [(100, 10)]


def test_interval_join_property_vs_brute_force(spark):
    """Random keyed points/intervals: the binned equi-join must return
    exactly the brute-force containment set — including intervals that
    span many bins, zero-length intervals, and negative coordinates
    (floor-division bin mapping must stay consistent below zero)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.relational import (
        interval_join,
    )

    coord = st.floats(min_value=-50.0, max_value=50.0,
                      allow_nan=False, allow_infinity=False, width=32)
    ivl = st.tuples(st.integers(0, 2), coord,
                    st.floats(min_value=0.0, max_value=40.0, width=32))
    pts = st.tuples(st.integers(0, 2), coord)

    @settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(st.lists(ivl, min_size=1, max_size=12),
           st.lists(pts, min_size=1, max_size=15))
    def check(ivls, points):
        ivl_rows = [(k, i, float(s), float(s + ln))
                    for i, (k, s, ln) in enumerate(ivls)]
        pt_rows = [(k, i, float(p)) for i, (k, p) in enumerate(points)]
        expect = sorted(
            (p[1], v[1])
            for p in pt_rows for v in ivl_rows
            if p[0] == v[0] and v[2] <= p[2] <= v[3])
        got = sorted(
            (r.pid, r.iid)
            for r in interval_join(
                spark.createDataFrame(pt_rows, "k long, pid long, p double"),
                spark.createDataFrame(
                    ivl_rows, "k long, iid long, s double, e double"),
                "p", "s", "e", keys=["k"], bin_width=7.0).collect())
        assert got == expect

    check()


def test_asof_forward_property_vs_brute_force(spark):
    """Random keyed time series: forward as-of must pick exactly the
    earliest right row at-or-after each left ts (max value among
    simultaneous rights), null when none follows."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.relational import (
        asof_join,
    )

    t_int = st.integers(0, 20)

    @settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(st.lists(st.tuples(st.integers(0, 1), t_int),
                    min_size=1, max_size=10),
           st.lists(st.tuples(st.integers(0, 1), t_int,
                              st.integers(0, 9)),
                    min_size=0, max_size=10))
    def check(lefts, rights):
        l_rows = [(i, k, float(ts)) for i, (k, ts) in enumerate(lefts)]
        r_rows = [(k, float(ts), float(v)) for k, ts, v in rights]

        def brute(k, ts):
            after = [(rts, v) for rk, rts, v in r_rows
                     if rk == k and rts >= ts]
            if not after:
                return None
            mn = min(rts for rts, _ in after)
            return max(v for rts, v in after if rts == mn)

        expect = {i: brute(k, ts) for i, k, ts in l_rows}
        got = {r.event_id: r.value for r in asof_join(
            spark.createDataFrame(
                l_rows, "event_id long, user_id long, ts double"),
            spark.createDataFrame(
                r_rows, "user_id long, ts double, value double"),
            "user_id", "ts", ["value"], tie_break="value",
            direction="forward").collect()}
        assert got == expect

    check()


def test_interval_join_auto_width_survives_skewed_lengths(spark):
    """Review fix (round 11): auto width (bin_width=None) must NOT
    raise on a skewed length distribution — p95 ≈ 1 s plus one
    legitimate 2000 s interval previously picked w = 1 s, and the
    2000-bin outlier tripped the in-plan guard that the fixed 1800 s
    default never hit.  The exact-max floor makes the guard
    unreachable for well-formed intervals in auto mode."""
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.relational import (
        interval_join,
    )

    rows = [(1, i, 1000.0 + 3 * i, 1001.0 + 3 * i) for i in range(60)]
    rows.append((1, 999, 0.0, 2000.0))          # the legitimate outlier
    intervals = spark.createDataFrame(
        rows, "user long, iid long, s double, e double")
    points = spark.createDataFrame(
        [(1, 100, 1000.5), (1, 101, 500.0)],
        "user long, pid long, p double")
    got = sorted(
        (r.pid, r.iid)
        for r in interval_join(points, intervals, "p", "s", "e",
                               keys=["user"], bin_width=None,
                               max_bins_per_interval=64).collect())
    # pid 100 hits interval 0 (1000..1001) AND the outlier; pid 101
    # hits only the outlier
    assert got == [(100, 0), (100, 999), (101, 999)]


def test_candidate_pairs_null_fields_do_not_collide(spark):
    """Review fix: concat_ws SKIPS NULLs, so (blk=NULL, txt='ab') and
    (blk='ab', txt=NULL) used to collide on one name-class key and
    could fabricate a similarity-1.0 pair between unrelated rows; the
    JSON-array key keeps nulls distinct."""
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.similarity import (
        candidate_pairs,
    )

    df = spark.createDataFrame(
        [(1, "ab", None), (2, None, "ab"), (3, "ab", "ab")],
        "id long, txt string, blk string")
    got = candidate_pairs(df, "id", "txt", min_sim=0.1,
                          block_cols=["blk"]).collect()
    # row 2 has NULL txt, row 1 NULL blk — neither can pair with
    # anything (no shared block / no grams); row 3 is alone in blk 'ab'
    assert got == []


def test_asof_join_null_timestamps_and_collisions(spark):
    """NULL-ts rows must behave like the LATERAL-join semantics: a
    NULL-ts RIGHT row matches nothing (not 'everything early' via
    NULLS FIRST), a NULL-ts LEFT row gets NULL values in BOTH
    directions (not the min-ts right row via NULLS LAST), and a
    value_cols name shadowing a left column refuses loudly instead of
    silently overwriting left data."""
    import pytest

    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.relational import (
        asof_join,
    )

    left = spark.createDataFrame(
        [(1, 100.0, 7.0), (1, 200.0, 8.0), (1, None, 9.0)],
        "k long, ts double, keepme double")
    right = spark.createDataFrame(
        [(1, 150.0, 50.0), (1, None, 99.0)],
        "k long, ts double, value double")
    for direction, want in (
        ("backward", {100.0: None, 200.0: 50.0, None: None}),
        ("forward", {100.0: 50.0, 200.0: None, None: None}),
    ):
        got = {r.ts: r.value
               for r in asof_join(left, right, "k", "ts", ["value"],
                                  direction=direction).collect()}
        assert got == want, (direction, got)
        # left columns untouched
    with pytest.raises(ValueError, match="collide with left"):
        asof_join(left, right.withColumnRenamed("value", "keepme"),
                  "k", "ts", ["keepme"])
    # value_cols naming the join key or the ts column would clobber the
    # left frame's key/timestamp (NULL for unmatched rows) — refused too
    with pytest.raises(ValueError, match="collide with left"):
        asof_join(left, right, "k", "ts", ["ts"])
    with pytest.raises(ValueError, match="collide with left"):
        asof_join(left, right, "k", "ts", ["k"])


def test_grouped_running_sum_null_group_keys_and_decimal_guard(spark):
    """(a) A NULL in a numeric GROUP column must produce the same
    running sums on the two-pass path as on the window fallback (the
    pandas NaN-tuple key used to miss the driver offsets and reset at
    every partition boundary).  (b) A decimal value column must refuse
    loudly, not truncate."""
    import pytest

    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.relational import (
        grouped_running_sum,
    )

    rows = [(None, i, 1) for i in range(1, 21)]
    rows += [(5, i, 10) for i in range(1, 6)]
    df = spark.createDataFrame(rows, "g int, o int, v long")
    two_pass = {(r.g, r.o): r.rs
                for r in grouped_running_sum(
                    df, ["g"], ["o"], "v", "rs",
                    num_partitions=4, max_meta_rows=None).collect()}
    fallback = {(r.g, r.o): r.rs
                for r in grouped_running_sum(
                    df, ["g"], ["o"], "v", "rs",
                    num_partitions=4, max_meta_rows=0).collect()}
    assert two_pass == fallback
    assert two_pass[(None, 20)] == 20 and two_pass[(5, 5)] == 50

    dec = df.select("g", "o", F.col("v").cast("decimal(18,6)").alias("v"))
    with pytest.raises(ValueError, match="unsupported value_col type"):
        grouped_running_sum(dec, ["g"], ["o"], "v", "rs")


def test_explode_delimited_literal_separator(spark):
    """'|' and '.' are LITERAL delimiters (separate_rows semantics),
    not regexes — unescaped, '|' split 'a|b' into one row per
    character."""
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.relational import (
        explode_delimited,
    )

    df = spark.createDataFrame([("a|b|c",), ("x.y",)], "s string")
    pipe = [r.s for r in explode_delimited(
        df.filter(F.col("s").contains("|")), "s", "|").collect()]
    assert pipe == ["a", "b", "c"]
    dot = [r.s for r in explode_delimited(
        df.filter(F.col("s").contains(".")), "s", ".").collect()]
    assert dot == ["x", "y"]


def test_cc_fractional_ids_and_nulls_path_independent(spark, monkeypatch):
    """Review-fix pins for connected_components: (a) DOUBLE node ids on
    the distributed path must not converge prematurely (the decimal-
    cast Σcomp rounded fractional label moves away — ids clustered in
    one integer bucket looked 'converged' after a single round); (b) a
    NULL edge endpoint must behave identically on the driver union-find
    and the distributed path (it used to TypeError in min() only below
    the edge-count gate)."""
    import remove_na_lgbtiq_queer_knowledge_graph_spark.operators.er as er_mod
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.er import (
        connected_components,
    )

    # 7-node chain of doubles inside ONE integer rounding bucket: needs
    # several propagate+jump rounds, Σ(decimal(38,0)) is constant
    # (node list built once — recomputing 2.01+i/100 per edge yields
    # different doubles for the "same" node and breaks the chain)
    nodes = [2.0 + (i + 1) / 100 for i in range(7)]
    chain = list(zip(nodes, nodes[1:]))
    edges = spark.createDataFrame(chain, "src double, dst double")
    want = {r.node: r.comp for r in connected_components(edges).collect()}
    assert set(want.values()) == {nodes[0]}  # driver path ground truth
    monkeypatch.setattr(er_mod, "_DRIVER_CC_EDGES", -1)  # force distributed
    got = {r.node: r.comp for r in connected_components(edges).collect()}
    assert got == want

    # NULL semantics (shared by both paths): NULL never donates its
    # label (a NULL join key matches nothing) so it cannot BRIDGE
    # components, but it receives the min over its neighbors' comps
    monkeypatch.setattr(er_mod, "_DRIVER_CC_EDGES", 100_000)
    nul = spark.createDataFrame(
        [(1, 2), (3, None), (None, 5)], "src long, dst long")
    by_node = {r.node: r.comp for r in connected_components(nul).collect()}
    assert by_node[1] == 1 and by_node[2] == 1
    assert by_node[3] == 3 and by_node[5] == 5   # NULL bridges nothing
    assert by_node[None] == 3                    # min neighbor comp
    monkeypatch.setattr(er_mod, "_DRIVER_CC_EDGES", -1)
    dist = {r.node: r.comp for r in connected_components(nul).collect()}
    assert dist == by_node


def test_candidate_pairs_both_equals_two_single_calls(spark):
    """metric='both' (one fused inverted-index join) must return
    exactly the inner join of the two single-metric calls."""
    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.similarity import (
        candidate_pairs,
    )

    rows = [(1, "alpha beta", "B"), (2, "alpha bett", "B"),
            (3, "alpha beta", "B"), (4, "gamma", "B"),
            (5, "alpha beta", "C"), (6, "alphaX betaY", "B")]
    df = spark.createDataFrame(rows, "id long, name string, blk string")
    cos = {(r.id_1, r.id_2): r.value for r in candidate_pairs(
        df, "id", "name", min_sim=0.5, metric="cosine",
        block_cols=["blk"]).collect()}
    jac = {(r.id_1, r.id_2): r.value for r in candidate_pairs(
        df, "id", "name", min_sim=0.3, metric="jaccard",
        block_cols=["blk"]).collect()}
    fused = {(r.id_1, r.id_2): (r.cosine, r.jaccard)
             for r in candidate_pairs(
                 df, "id", "name", min_sim=(0.5, 0.3), metric="both",
                 block_cols=["blk"]).collect()}
    want = {k: (cos[k], jac[k]) for k in cos if k in jac}
    assert fused == want and len(fused) >= 2


def test_star_cc_refuses_null_node_ids(spark):
    """Star's equi-join rounds silently DROP NULL-endpoint edges where
    propagation treats NULL as a node — the 'same contract' promise
    requires refusing rather than diverging (review batch)."""
    import pytest

    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.er import (
        connected_components_star,
    )

    edges = spark.createDataFrame(
        [(1, 2), (3, None)], "src int, dst int")
    with pytest.raises(Exception, match="NULL node ids"):
        connected_components_star(edges).collect()


def test_cc_max_iter_exhaustion_fails_loud(spark):
    """Falling out of the round loop before fixpoint must raise, not
    return partially-merged components (review batch).  Star's
    extraction assumes a depth-1 star forest; propagation's labels are
    mid-merge.  The driver union-find path is exact, so propagation is
    forced distributed via a tiny gate monkeypatch."""
    import pytest

    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators import er

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "src long, dst long")
    with pytest.raises(ValueError, match="not at fixpoint"):
        er.connected_components_star(chain, max_iter=1)
    old = er._DRIVER_CC_EDGES
    try:
        er._DRIVER_CC_EDGES = 0  # force the distributed loop
        with pytest.raises(ValueError, match="still moving"):
            er.connected_components(chain, max_iter=1)
    finally:
        er._DRIVER_CC_EDGES = old
