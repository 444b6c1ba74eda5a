from pyspark.sql import functions as F

from judy_graph_db_spark import E, N
from judy_graph_db_spark.graph import Graph
from judy_graph_db_spark.operators import mutation as mut
from judy_graph_db_spark.plans.compiler import create_mem
from tests.fixtures import f2_issue_tracker


def edge_set(g):
    return {(r.src, r.dst, r.label, r.is_back, r.edge_seq) for r in g.edges.collect()}


def test_insert_nodes_upsert(spark):
    g = Graph.from_lists(spark, nodes=[(0, "A"), (1, "A")])
    g2 = mut.insert_nodes(g, [(1, "B"), (2, "C")])
    got = {(r.id, r.label) for r in g2.nodes.collect()}
    assert got == {(0, "A"), (1, "B"), (2, "C")}


def test_insert_node_edges_counter_append(spark):
    g = Graph.from_lists(spark, nodes=[(0, "A"), (1, "A"), (2, "A")],
                         directed_edges=[(0, 1, "E")], add_back_edges=False)
    g2 = mut.insert_node_edges(g, [(0, 2, "E"), (0, 1, "E")])
    got = sorted((r.dst, r.edge_seq) for r in g2.edges.collect())
    # existing (0,1,seq1); batch continues the counter: 2→seq2, 1→seq3
    assert got == [(1, 1), (1, 3), (2, 2)]


def test_insert_node_edges_overwrite(spark):
    g = Graph.from_lists(spark, nodes=[(0, "A"), (1, "A"), (2, "A")],
                         directed_edges=[(0, 1, "E")], add_back_edges=False)
    g2 = mut.insert_node_edges(g, [(0, 2, "E")], overwrite=True)
    assert edge_set(g2) == {(0, 2, "E", False, 1)}


def test_update_node_edges(spark):
    g = f2_issue_tracker(spark)
    g2 = mut.update_node_edges(g, [(0, "Raises", 1, 6)])
    got = [r.dst for r in g2.edges.filter(
        (F.col("src") == 0) & (F.col("label") == "Raises") & (F.col("edge_seq") == 1)).collect()]
    assert got == [6]


def test_delete_nodes(spark):
    g = f2_issue_tracker(spark)
    g2 = mut.delete_nodes(g, [3])
    assert g2.node_count() == 7
    assert g2.edges.filter((F.col("src") == 3) | (F.col("dst") == 3)).count() == 0


def test_delete_edges(spark):
    g = f2_issue_tracker(spark)
    g2 = mut.delete_edges(g, [(0, 3)])
    # both labels 0→3 (Raises, Closes) and their back rows removed
    remaining = g2.edges.filter(
        ((F.col("src") == 0) & (F.col("dst") == 3)) | ((F.col("src") == 3) & (F.col("dst") == 0))
    )
    assert remaining.count() == 0


def test_delete_edges_keeps_independent_reciprocal(spark):
    # two INDEPENDENT forward edges 1→2 and 2→1, each with its back row:
    # deleting (1,2) must keep the forward 2→1 row and its back row 1→2
    # (reference deleteEdge removes only n0→n1, FastAccess.hs:364-369)
    g = Graph.from_lists(spark, nodes=[(1, "A"), (2, "A")],
                         directed_edges=[(1, 2, "E"), (2, 1, "E")], add_back_edges=True)
    g2 = mut.delete_edges(g, [(1, 2)])
    assert edge_set(g2) == {(2, 1, "E", False, 1), (1, 2, "E", True, 1)}


def test_delete_edge_keys(spark):
    g = f2_issue_tracker(spark)
    g2 = mut.delete_edge_keys(g, [(0, "Raises", 2)])
    got = sorted(r.edge_seq for r in g2.edges.filter(
        (F.col("src") == 0) & (F.col("label") == "Raises") & (~F.col("is_back"))).collect())
    assert got == [1, 3, 4]


def test_map_nodes(spark):
    g = Graph.from_lists(spark, nodes=[(0, "a"), (1, "b")])
    g2 = mut.map_nodes(g, lambda lbl: F.upper(lbl))
    assert {r.label for r in g2.nodes.collect()} == {"A", "B"}


def test_create_mem_diff(spark):
    g = Graph.from_lists(spark, nodes=[(0, "A"), (1, "A"), (2, "A")],
                         directed_edges=[(0, 1, "E")], add_back_edges=False)
    pat = N(ids=[0]) >> E("E") >> N(ids=[2])
    g2, diff = create_mem(g, pat)
    assert {(r.src, r.dst) for r in diff.edges_added.collect()} == {(0, 2)}
    assert {(r.src, r.dst) for r in diff.edges_deleted.collect()} == {(0, 1)}
    assert {(r.src, r.dst, r.edge_seq) for r in g2.edges.collect()} == {(0, 2, 1)}


def test_create_mem_frontier_restricted(spark):
    # hop 1 candidates start from hop 0's WRITTEN targets (walked paths,
    # Cypher.hs:804-812) — node 1 matched spec 1 but was not written to,
    # so it must not gain a Y edge
    g = Graph.from_lists(spark, nodes=[(0, "A"), (1, "A"), (2, "A"), (3, "A")])
    pat = N(ids=[0]) >> E("X") >> N(ids=[1, 2]) >> E("Y") >> N(ids=[3])
    g2, diff = create_mem(g, pat)
    assert {(r.src, r.label, r.dst) for r in diff.edges_added.collect()} == {
        (0, "X", 2), (2, "Y", 3)}
    assert g2.edges.filter((F.col("src") == 1) & (F.col("label") == "Y")).count() == 0


def test_create_mem_node_diffs(spark):
    g = Graph.from_lists(spark, nodes=[(0, "A"), (1, "A")])
    pat = N(ids=[0]) >> E("X") >> N(ids=[9])
    _, diff = create_mem(g, pat)
    assert {r.id for r in diff.nodes_added.collect()} == {9}
    assert diff.nodes_deleted.count() == 0


def test_create_mem_noop_when_present(spark):
    g = Graph.from_lists(spark, nodes=[(0, "A"), (1, "A")],
                         directed_edges=[(0, 1, "E")], add_back_edges=False)
    pat = N(ids=[0]) >> E("E") >> N(ids=[1])
    g2, diff = create_mem(g, pat)
    assert diff.edges_added.count() == 0
    assert diff.edges_deleted.count() == 0
    assert edge_set(g2) == edge_set(g)


def test_create_mem_no_cross_product_plan(spark):
    # the per-hop winner is the scalar max(dst) of the right spec, so even a
    # label-wide right side must not plan the frontier × spec cross product:
    # no CartesianProduct, and the only nested-loop join allowed is the
    # degenerate attach-a-scalar one (1-row aggregated build side)
    g = Graph.from_lists(
        spark,
        nodes=[(i, "A") for i in range(50)] + [(i, "B") for i in range(50, 100)],
    )
    pat = N(labels=["A"]) >> E("X") >> N(labels=["B"])
    g2, diff = create_mem(g, pat)
    plan = g2.edges._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the winner subtree appears twice (anti-join + union), so allow the
    # scalar-attach join per occurrence — but its build side must be the
    # global max(dst) aggregate, which only exists if the collapse happened
    if "BroadcastNestedLoopJoin" in plan:
        assert "functions=[max(dst" in plan or "functions=[partial_max(dst" in plan
    # every A-node gains one X edge to the max B id
    assert {(r.src, r.dst) for r in diff.edges_added.collect()} == {
        (i, 99) for i in range(50)}


def test_create_mem_empty_right_spec(spark):
    # an empty right spec produces no candidates (not null-dst edges)
    g = Graph.from_lists(spark, nodes=[(0, "A"), (1, "A")])
    pat = N(ids=[0]) >> E("X") >> N(labels=["NOPE"])
    g2, diff = create_mem(g, pat)
    assert diff.edges_added.count() == 0
    assert g2.edges.count() == 0
