"""appl post-processing + LSH bucket-size skew guard."""

from pyspark.sql import functions as F

from judy_graph_db_spark import E, Graph, N, appl, flat_table
from judy_graph_db_spark.operators import dedup as D


def test_appl_sort_nodes_example(spark):
    """The SortNodes post-processing shape (SortNodes.hs:38-43): sort a
    result layer descending."""
    g = Graph.from_lists(
        spark,
        nodes=[(i, "N") for i in range(4)],
        directed_edges=[(0, 1, "A"), (0, 2, "A"), (0, 3, "A")],
    )
    ft = flat_table(g, N(ids=[0]) >> E("A", direction="r") >> N())
    out = appl(ft, "node_set", lambda c: F.sort_array(c, asc=False))
    rows = {r.position: r.node_set for r in out.collect()}
    assert rows[1] == [3, 2, 1]
    assert rows[0] == [0]


def test_lsh_bucket_cap_drops_boilerplate(spark):
    boiler = "exactly identical boilerplate text repeated across many docs forever"
    rows = [(i, boiler) for i in range(20)] + [
        (100, "a unique document about graph engines and spark plans"),
        (101, "a unique document about graph engines and spark plan"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = D.minhash_lsh_candidates(df)
    capped = D.minhash_lsh_candidates(df, max_bucket_size=5)
    un = {(r.doc_a, r.doc_b) for r in uncapped.collect()}
    cp = {(r.doc_a, r.doc_b) for r in capped.collect()}
    # boilerplate family (20 docs → 190 pairs) is dropped by the cap…
    assert (0, 1) in un and (0, 1) not in cp
    # …while the small near-dup pair survives
    assert (100, 101) in un and (100, 101) in cp
