"""Deterministic graph sampling: neighbor fanout caps and random walks."""

from pyspark.sql import functions as F

from judy_graph_db_spark.operators import sampling as SA


def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src BIGINT, dst BIGINT"
    )


def test_sample_neighbors_caps_fanout(spark):
    e = edges_df(spark, [(1, d) for d in range(10, 20)] + [(2, 99)])
    out = SA.sample_neighbors(e, k=3, seed=42)
    per_src = {r.src: r.n for r in out.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert per_src == {1: 3, 2: 1}
    ranks = sorted(r.sample_rank for r in out.filter(F.col("src") == 1).collect())
    assert ranks == [1, 2, 3]


def test_sample_neighbors_reproducible_and_seed_sensitive(spark):
    e = edges_df(spark, [(1, d) for d in range(10, 30)])
    a = {(r.src, r.dst) for r in SA.sample_neighbors(e, 5, seed=1).collect()}
    b = {(r.src, r.dst) for r in SA.sample_neighbors(e, 5, seed=1).collect()}
    c = {(r.src, r.dst) for r in SA.sample_neighbors(e, 5, seed=2).collect()}
    assert a == b
    assert a != c  # 20-choose-5 collision across seeds is ~impossible


def test_random_walks_follow_edges(spark):
    # chain 1->2->3->4: the only walk from 1 is deterministic regardless of hash
    e = edges_df(spark, [(1, 2), (2, 3), (3, 4)])
    out = {(r.walk_id, r.step): r.node for r in SA.random_walks(e, length=3).collect()}
    assert out[(1, 0)] == 1 and out[(1, 1)] == 2 and out[(1, 2)] == 3 and out[(1, 3)] == 4
    # walker from 3 stops at the sink (no step-3 row)
    assert out[(3, 1)] == 4
    assert (3, 2) not in out


def test_random_walks_starts_and_reproducibility(spark):
    e = edges_df(spark, [(1, d) for d in range(2, 8)] + [(d, 1) for d in range(2, 8)])
    starts = spark.createDataFrame([(1,)], "id long")
    w1 = {(r.step): r.node for r in SA.random_walks(e, length=4, seed=9, starts=starts).collect()}
    w2 = {(r.step): r.node for r in SA.random_walks(e, length=4, seed=9, starts=starts).collect()}
    assert w1 == w2 and len(w1) == 5
    # each step moves along a real edge
    for s in range(4):
        a, b = w1[s], w1[s + 1]
        assert (a == 1 and 2 <= b <= 7) or (2 <= a <= 7 and b == 1)


def test_walks_match_unrolled_sql_oracle(spark):
    import duckdb

    e = [(a, b) for a in range(5) for b in range(5) if a != b and (a + b) % 3 != 0]
    df = edges_df(spark, e)
    got = {(r.walk_id, r.step, r.node)
           for r in SA.random_walks(df, length=3, seed=5).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE ed (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO ed VALUES (?, ?)", e)
    sql = SA.random_walks_oracle_sql("SELECT src, dst FROM ed", length=3, seed=5)
    want = set(map(tuple, con.execute(sql).fetchall()))
    assert got == want


def test_walk_skipgram_pairs(spark):
    """Hand-checked window-2 co-occurrence counts plus the DuckDB twin;
    symmetric counts, no self-pair at the same step, no cross-walk pair."""
    import duckdb

    rows = [(1, 0, 10), (1, 1, 20), (1, 2, 30), (1, 3, 10),
            (2, 0, 20), (2, 1, 10),
            (3, 0, 7)]
    walks = spark.createDataFrame(rows, "walk_id long, step long, node long")
    got = sorted(tuple(r)
                 for r in SA.walk_skipgram_pairs(walks, window=2).collect())
    d = {(a, b): c for a, b, c in got}
    # walk1 [10,20,30,10]: (10,20) at steps (0,1),(3,1); walk2 [20,10]: (1,0)
    assert d[(10, 20)] == 3 and d[(20, 10)] == 3
    assert d[(10, 30)] == 2          # steps (0,2) and (3,2)
    assert (7, 7) not in d           # singleton walk emits nothing
    assert (10, 10) not in d         # steps 0 and 3 are outside window 2
    con = duckdb.connect()
    con.execute("CREATE TABLE w (walk_id BIGINT, step BIGINT, node BIGINT)")
    con.executemany("INSERT INTO w VALUES (?, ?, ?)", rows)
    twin = sorted(con.execute(
        SA.walk_skipgram_oracle_sql("SELECT * FROM w", window=2)).fetchall())
    assert got == [tuple(t) for t in twin]
