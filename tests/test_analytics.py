"""Whole-graph analytics operators (operators/analytics.py) on hand-checked
tiny graphs — the parity-plus surface the reference leaves TODO
(``doc/Neo4j.md:179-197``, SURVEY.md §2.7)."""

import duckdb
from pyspark.sql import functions as F

from judy_graph_db_spark.operators import analytics as AN


def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src BIGINT, dst BIGINT"
    )


def test_connected_components_two_components(spark):
    # chain 1-2-3-4 plus pair 10-11; direction must not matter
    e = edges_df(spark, [(2, 1), (2, 3), (4, 3), (10, 11)])
    got = {
        (r["id"], r["component"])
        for r in AN.connected_components(e).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10)}


def test_connected_components_long_chain_converges_fast(spark):
    # pointer jumping: a 64-node path must converge well under 64 rounds
    n = 64
    e = edges_df(spark, [(i, i + 1) for i in range(n - 1)])
    cc = AN.connected_components(e, max_iter=12)
    assert {r["component"] for r in cc.collect()} == {0}


def test_connected_components_self_loop_and_parallel(spark):
    e = edges_df(spark, [(5, 5), (6, 7), (7, 6), (6, 7)])
    got = {(r["id"], r["component"]) for r in AN.connected_components(e).collect()}
    # self-loop-only node is dropped from sym (no neighbors); 6-7 merge
    assert got == {(6, 6), (7, 6)}


def test_triangle_count_k4(spark):
    # K4 has C(4,3)=4 triangles; add reversed + parallel rows to prove
    # canonicalization dedups them
    base = [(a, b) for a in range(4) for b in range(4) if a < b]
    e = edges_df(spark, base + [(b, a) for a, b in base] + base)
    assert AN.triangle_count(e).collect()[0]["triangles"] == 4


def test_triangle_count_triangle_free(spark):
    e = edges_df(spark, [(0, 1), (1, 2), (2, 3)])
    assert AN.triangle_count(e).collect()[0]["triangles"] == 0


def test_pagerank_star_matches_hand_computation(spark):
    # star: 1,2,3 -> 0; one iteration from rank 1.0:
    #   rank(0) = 0.15 + 0.85 * 3 = 2.70 ; leaves: 0.15 (no in-edges)
    e = edges_df(spark, [(1, 0), (2, 0), (3, 0)])
    pr = {r["id"]: r["rank"] for r in AN.pagerank(e, iters=1).collect()}
    assert abs(pr[0] - 2.70) < 1e-9
    for leaf in (1, 2, 3):
        assert abs(pr[leaf] - 0.15) < 1e-9


def test_pagerank_matches_unrolled_sql_oracle(spark):
    # cycle + chord, 3 iterations: Spark loop vs the DuckDB unrolled twin
    pairs = [(0, 1), (1, 2), (2, 3), (3, 0), (1, 3), (4, 1)]
    e = edges_df(spark, pairs)
    got = {
        r["id"]: r["rank_e4"]
        for r in AN.pagerank(e, iters=3)
        .select("id", F.round(F.col("rank") * 10000).cast("long").alias("rank_e4"))
        .collect()
    }
    con = duckdb.connect()
    values = ", ".join(f"({a}, {b})" for a, b in pairs)
    sql = AN.pagerank_oracle_sql(
        f"SELECT * FROM (VALUES {values}) AS t(src, dst)", iters=3
    )
    want = {row[0]: row[1] for row in con.sql(sql).fetchall()}
    assert got == want
