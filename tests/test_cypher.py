"""Pattern engine tests: direction matrix (test/Spec.hs:151-178), the
issue-tracker golden query (app/Main.hs:20-31, README.md:150-163), and
variable-length paths (test/examples/SortNodes.hs:63-99)."""

import pytest
from pyspark.sql import functions as F

from judy_graph_db_spark import E, N, table, temp, flat_table
from judy_graph_db_spark.plans.compiler import nested_layers, graph_query
from tests.fixtures import f1_left, f1_right, f2_issue_tracker, f3_package_graph


def rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


# ------------------------------------------------------- direction matrix

@pytest.fixture(scope="module")
def right(spark):
    return f1_right(spark)


@pytest.fixture(scope="module")
def left(spark):
    return f1_left(spark)


def q(g, direction, attr=None):
    pat = N(ids=[0]) >> E(attr, direction=direction) >> N()
    return table(g, pat)


def test_spec2_right_edge_query_left_empty(right):
    assert q(right, "l").count() == 0


def test_spec3_right_edge_query_right(right):
    assert rows(q(right, "r"), "n0", "n1") == [(0, 1)]


def test_spec4_right_edge_query_undirected(right):
    assert rows(q(right, None), "n0", "n1") == [(0, 1)]


def test_spec5_left_edge_query_right_empty(left):
    assert q(left, "r").count() == 0


def test_spec6_left_edge_query_left(left):
    assert rows(q(left, "l"), "n0", "n1") == [(0, 1)]


def test_spec8_labeled_right_edge_query_left_empty(right):
    assert q(right, "l", "E0").count() == 0


def test_spec9_labeled_right_edge_query_right(right):
    assert rows(q(right, "r", "E0"), "n0", "n1") == [(0, 1)]


def test_spec10_labeled_left_edge_query_right_empty(left):
    assert q(left, "r", "E0").count() == 0


def test_spec11_labeled_left_edge_query_left(left):
    assert rows(q(left, "l", "E0"), "n0", "n1") == [(0, 1)]


def test_undirected_superset_property(right, left):
    # the reference wanted this (commented out, Spec.hs:179-187)
    for g in (right, left):
        und = q(g, None).count()
        assert q(g, "r").count() <= und and q(g, "l").count() <= und


# --------------------------------------------------- issue-tracker golden

def test_issue_tracker_two_hop(spark):
    g = f2_issue_tracker(spark)
    pat = (
        N(ids=[0])
        >> E("Raises")
        >> N(labels=["ISSUE"])
        >> E("References")
        >> N(labels=["ISSUE"])
    )
    b = table(g, pat)
    got = rows(b, "n0", "n1", "n2")
    # undirected hops: 3~{4,5}, 4~{3,6}, 5~{3}, 6~{4}
    assert got == [(0, 3, 4), (0, 3, 5), (0, 4, 3), (0, 4, 6), (0, 5, 3), (0, 6, 4)]


def test_issue_tracker_nested_layers(spark):
    g = f2_issue_tracker(spark)
    pat = N(ids=[0]) >> E("Raises") >> N(labels=["ISSUE"]) >> E("References") >> N(labels=["ISSUE"])
    nested = nested_layers(table(g, pat))
    got = {(r.n0, r.n1): r.layer for r in nested.collect()}
    assert got == {(0, 3): [4, 5], (0, 4): [3, 6], (0, 5): [3], (0, 6): [4]}


def test_flat_table(spark):
    g = f2_issue_tracker(spark)
    pat = N(ids=[0]) >> E("Raises") >> N(labels=["ISSUE"])
    ft = {r.position: r.node_set for r in flat_table(g, pat).collect()}
    assert ft == {0: [0], 1: [3, 4, 5, 6]}


def test_directed_hop(spark):
    g = f2_issue_tracker(spark)
    pat = N(ids=[4]) >> E("References", direction="r") >> N()
    assert rows(table(g, pat), "n1") == [(3,), (6,)]
    pat_l = N(ids=[4]) >> E("References", direction="l") >> N()
    assert rows(table(g, pat_l), "n1") == []  # nothing references 4


def test_unlabeled_any_edge(spark):
    g = f2_issue_tracker(spark)
    pat = N(ids=[0]) >> E(direction="r") >> N()
    assert rows(table(g, pat), "n1") == [(2,), (3,), (3,), (4,), (5,), (6,)]


def test_implicit_edge_sugar(spark):
    g = f2_issue_tracker(spark)
    pat = N(ids=[1]) >> N()  # n >> m  == ~~
    assert rows(table(g, pat), "n1") == [(7,)]


def test_edge_where_predicate(spark):
    g = f2_issue_tracker(spark)
    pat = N(ids=[0]) >> E("Raises", where=lambda c: c["edge_seq"] <= 2) >> N()
    assert rows(table(g, pat), "n1") == [(3,), (4,)]


def test_orth_multilabel(spark):
    from judy_graph_db_spark.graph import Graph
    g = Graph.from_lists(
        spark, nodes=[(0, "A"), (1, "A"), (2, "A")],
        directed_edges=[(0, 1, ["X", "Y"]), (0, 2, ["Z"])], add_back_edges=False,
    )
    pat = N(ids=[0]) >> E(orth=["Y"]) >> N()
    assert rows(table(g, pat), "n1") == [(1,)]
    pat2 = N(ids=[0]) >> E(orth=["Y", "Z"]) >> N()
    assert rows(table(g, pat2), "n1") == [(1,), (2,)]


def test_cost_strategy_matches_quick(spark):
    g = f2_issue_tracker(spark)
    pat = N() >> E("Raises", direction="r") >> N(ids=[3])
    quick = rows(table(g, pat, quick=True), "n0", "n1")
    cost = rows(table(g, pat, quick=False), "n0", "n1")
    assert quick == cost == [(0, 3)]


def test_graph_query_subgraph(spark):
    g = f2_issue_tracker(spark)
    pat = N(ids=[0]) >> E("Raises", direction="r") >> N()
    sub = graph_query(g, pat)
    assert sub.node_count() == 5
    assert sub.edges.count() == 4


# ------------------------------------------------------ var-length paths

def test_several_1_3(spark):
    g = f3_package_graph(spark)
    pat = N(ids=[7]) >> E("NextVer", several=(1, 3), direction="r") >> N()
    b = table(g, pat)
    assert rows(b, "n1", "e0_depth") == [(8, 1), (9, 2), (10, 3)]


def test_several_bounded_below(spark):
    g = f3_package_graph(spark)
    pat = N(ids=[7]) >> E("NextVer", several=(2, 3), direction="r") >> N()
    assert rows(table(g, pat), "n1") == [(9,), (10,)]


def test_star_unbounded(spark):
    g = f3_package_graph(spark)
    pat = N(ids=[1]) >> E("NextVer", several=(1, None), direction="r") >> N()
    assert rows(table(g, pat), "n1") == [(2,), (3,)]


def test_several_cycle_termination(spark):
    from judy_graph_db_spark.graph import Graph
    g = Graph.from_lists(
        spark, nodes=[(0, "A"), (1, "A"), (2, "A")],
        directed_edges=[(0, 1, "E"), (1, 2, "E"), (2, 0, "E")], add_back_edges=False,
    )
    pat = N(ids=[0]) >> E("E", several=(1, None), direction="r") >> N()
    assert rows(table(g, pat), "n1") == [(0,), (1,), (2,)]


def test_several_then_restrict(spark):
    g = f3_package_graph(spark)
    pat = N(ids=[0]) >> E("PartOf", direction="r") >> N(labels=["PACKAGEVER"]) \
        >> E("NextVer", several=(1, 2), direction="r") >> N()
    got = rows(table(g, pat), "n1", "n2")
    assert got == [(1, 2), (1, 3), (2, 3)]


def test_shortest_paths_chain(spark):
    from judy_graph_db_spark import shortest_paths
    from tests.fixtures import f3_package_graph

    g = f3_package_graph(spark)
    # NextVer chain 7→8→9→10
    got = {(r.n0, r.n1): r.hops for r in
           shortest_paths(g, N(ids=[7]), label="NextVer").collect()}
    assert got == {(7, 8): 1, (7, 9): 2, (7, 10): 3}


def test_cost_strategy_seeds_from_interior_min(spark, monkeypatch):
    """A selective MID-pattern spec drives the join order: quick=False
    splits the chain at the interior minimum and compiles outward both
    ways, each sub-chain seeded at the selective node."""
    import judy_graph_db_spark.plans.compiler as C
    from judy_graph_db_spark.graph import Graph

    # BIG(6) -HIT-> MID(1 explicit id) -HIT-> BIG2(6): both endpoints cost
    # 6, the middle explicit id costs 1
    g = Graph.from_lists(
        spark,
        nodes=[(i, "BIG") for i in range(6)]
        + [(10, "MID")]
        + [(20 + i, "BIG2") for i in range(6)],
        directed_edges=[(i, 10, "HIT") for i in range(6)]
        + [(10, 20 + i, "HIT") for i in range(6)],
        add_back_edges=True,
    )
    pat = (
        N(labels=["BIG"]) >> E("HIT", direction="r") >> N(ids=[10])
        >> E("HIT", direction="r") >> N(labels=["BIG2"])
    )
    compiled = []
    orig = C.compile_pattern
    monkeypatch.setattr(
        C, "compile_pattern",
        lambda g2, p: compiled.append(p) or orig(g2, p),
    )
    cost = C.table(g, pat, quick=False)
    # two sub-chains, both seeded at the selective interior node
    assert len(compiled) == 2
    assert all(p.node_specs[0].ids == [10] for p in compiled)
    # canonical column layout and identical answer to the LtoR plan
    assert cost.columns[:4] == ["n0", "e0_label", "e0_seq", "n1"]
    quick = rows(table(g, pat), "n0", "n1", "n2")
    assert rows(cost, "n0", "n1", "n2") == quick
    assert len(quick) == 36


def test_shortest_paths_strategy_branches_agree_on_cycle(spark):
    """The unbounded walk dispatches BFS (selective frontier) or min-plus
    closure (broad frontier) by runtime stats; both must return identical
    min-depth rows on a cyclic graph."""
    from judy_graph_db_spark import shortest_paths
    from judy_graph_db_spark.graph import Graph

    n = 10  # directed 10-cycle 0→1→…→9→0
    g = Graph.from_lists(
        spark,
        nodes=[(i, "NODE") for i in range(n)],
        directed_edges=[(i, (i + 1) % n, "NEXT") for i in range(n)],
    )
    # broad frontier (all 10 srcs): 4*10 >= 10 -> min-plus branch
    broad = {(r.n0, r.n1): r.hops for r in
             shortest_paths(g, N(), label="NEXT").collect()}
    # selective frontier (1 src vs 10): 4*1 < 10 -> BFS visited-set branch
    sel = {(r.n0, r.n1): r.hops for r in
           shortest_paths(g, N(ids=[0]), label="NEXT").collect()}
    assert sel == {k: v for k, v in broad.items() if k[0] == 0}
    # min depth on the cycle: (0,j) = j hops, (0,0) = full loop
    assert sel[(0, 5)] == 5 and sel[(0, 0)] == n


def test_shortest_paths_bounded(spark):
    from judy_graph_db_spark import shortest_paths
    from tests.fixtures import f3_package_graph

    g = f3_package_graph(spark)
    got = {(r.n0, r.n1): r.hops for r in
           shortest_paths(g, N(ids=[7]), label="NextVer", max_hops=2).collect()}
    assert got == {(7, 8): 1, (7, 9): 2}


def test_cost_strategy_uses_real_label_counts(spark):
    """quick=False seeds from the genuinely smaller end by cached label
    cardinalities — where the reference's 3-bucket model (label-count, not
    row-count) would pick the wrong side."""
    from judy_graph_db_spark.graph import Graph

    # 6 BIG nodes (one label) vs 2 nodes across TWO labels: the bucket
    # model scores the two-label end as costlier (2 > 1); real stats say
    # it is 3x cheaper (2 rows vs 6)
    g = Graph.from_lists(
        spark,
        nodes=[(i, "BIG") for i in range(6)] + [(10, "S1"), (11, "S2")],
        directed_edges=[(i, 10, "HIT") for i in range(6)],
        add_back_edges=True,
    )
    assert g.label_counts() == {"BIG": 6, "S1": 1, "S2": 1}
    pat = N(labels=["BIG"]) >> E("HIT", direction="r") >> N(labels=["S1", "S2"])
    quick = rows(table(g, pat, quick=True), "n0", "n1")
    cost = rows(table(g, pat, quick=False), "n0", "n1")
    assert quick == cost == [(i, 10) for i in range(6)]


def test_cost_strategy_penalizes_hub_labels(spark, monkeypatch):
    """Seed cost ranks by expected first-join fan-out (nodes + incident
    edges), not node counts alone: a 2-node hub label with 12 outgoing
    edges must LOSE the seed position to a 5-node leaf label with 5."""
    import judy_graph_db_spark.plans.compiler as C
    from judy_graph_db_spark.graph import Graph

    # HUB: 2 nodes fanning out to 12 LEAF nodes; LEAF2: 5 nodes hanging
    # off 5 of the leaves. Node counts alone would seed at HUB (2 < 5).
    g = Graph.from_lists(
        spark,
        nodes=[(0, "HUB"), (1, "HUB")]
        + [(10 + i, "LEAF") for i in range(12)]
        + [(30 + i, "LEAF2") for i in range(5)],
        directed_edges=[(j, 10 + i, "HIT") for j in (0, 1) for i in range(6)]
        + [(10 + i, 30 + i, "NEXT") for i in range(5)],
    )
    # back edges count from their own src side: LEAF carries 5 fwd + 12
    # reciprocal, LEAF2 the 5 reciprocal NEXT rows
    assert g.label_edge_counts() == {"HUB": 12, "LEAF": 17, "LEAF2": 5}
    # costs: HUB = 2 + 12 = 14, LEAF = 12 + 17 = 29, LEAF2 = 5 + 5 = 10
    pat = (N(labels=["HUB"]) >> E("HIT", direction="r") >> N(labels=["LEAF"])
           >> E("NEXT", direction="r") >> N(labels=["LEAF2"]))
    compiled = []
    orig = C.compile_pattern
    monkeypatch.setattr(
        C, "compile_pattern",
        lambda g2, p: compiled.append(p) or orig(g2, p),
    )
    cost = rows(C.table(g, pat, quick=False), "n0", "n1", "n2")
    # seeded at the far end (LEAF2): one reversed compile, starting there
    assert len(compiled) == 1
    assert compiled[0].node_specs[0].labels == ["LEAF2"]
    assert cost == rows(table(g, pat), "n0", "n1", "n2")
    assert len(cost) == 10  # 2 hubs x 5 leaf-with-tail chains
