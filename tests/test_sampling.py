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


def test_sampled_negatives(spark):
    """Deterministic word2vec negatives: one draw per (pair, slot), drawn
    ∝ freq (aggregate ratio sanity), bit-identical to the DuckDB twin,
    and invariant to the bin count (n_bins only shapes the join)."""
    import duckdb
    from collections import Counter

    pairs = [(a, b) for a in range(10, 30) for b in range(10, 30)
             if a != b][:150]
    freqs = [(n, (n % 7) + 1) for n in range(10, 40)]
    pdf = spark.createDataFrame(pairs, "center long, context long")
    fdf = spark.createDataFrame(freqs, "node long, freq long")
    got = sorted(tuple(r) for r in SA.sampled_negatives(
        pdf, fdf, k=3, seed=5, n_bins=8).collect())
    assert len(got) == len(pairs) * 3
    got_fine = sorted(tuple(r) for r in SA.sampled_negatives(
        pdf, fdf, k=3, seed=5, n_bins=1024).collect())
    assert got == got_fine  # bin granularity must not change the draws
    con = duckdb.connect()
    con.execute("CREATE TABLE p (center BIGINT, context BIGINT)")
    con.executemany("INSERT INTO p VALUES (?, ?)", pairs)
    con.execute("CREATE TABLE f (node BIGINT, freq BIGINT)")
    con.executemany("INSERT INTO f VALUES (?, ?)", freqs)
    twin = sorted(tuple(t) for t in con.execute(
        SA.sampled_negatives_oracle_sql(
            "SELECT center, context FROM p", "SELECT node, freq FROM f",
            k=3, seed=5, n_bins=8)).fetchall())
    assert got == twin
    c = Counter(neg for *_, neg in got)
    hi = sum(c[n] for n, fq in freqs if fq == 7) / 5
    lo = sum(c[n] for n, fq in freqs if fq == 1) / 4
    assert 4 < hi / max(lo, 0.01) < 11   # ∝ freq: expect ~7×


def test_neighbor_feature_agg(spark):
    """1-hop means, 2-hop path multiplicity, fanout cap, DuckDB twin."""
    import duckdb

    # diamond with a tail: 1->2, 1->3, 2->4, 3->4, 4->5
    edges = [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5)]
    feats = [(2, 10), (3, 20), (4, 7), (5, 100)]
    e = spark.createDataFrame(edges, "src long, dst long")
    f = spark.createDataFrame(feats, "node long, f long")
    one = {r.id: (r.n_paths, r.sum_f, r.mean_micro)
           for r in SA.neighbor_feature_agg(e, f, hops=1).collect()}
    assert one[1] == (2, 30, 15_000_000)
    assert one[4] == (1, 100, 100_000_000)
    # 2 hops: node 1 reaches 4 via BOTH 2 and 3 -> path count 2
    two = {r.id: (r.n_paths, r.sum_f)
           for r in SA.neighbor_feature_agg(e, f, hops=2).collect()}
    assert two[1] == (2, 14)
    assert two[2] == (1, 100) and two[3] == (1, 100)
    # fanout cap 1 keeps one md5-chosen child of node 1
    capped = {r.id: r.n_paths for r in SA.neighbor_feature_agg(
        e, f, hops=1, max_fanout=1).collect()}
    assert capped[1] == 1
    con = duckdb.connect()
    con.execute("CREATE TABLE e (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?)", edges)
    con.execute("CREATE TABLE f (node BIGINT, f BIGINT)")
    con.executemany("INSERT INTO f VALUES (?, ?)", feats)
    for hops in (1, 2):
        got = sorted(tuple(r) for r in SA.neighbor_feature_agg(
            e, f, hops=hops).collect())
        twin = sorted(tuple(t) for t in con.execute(
            SA.neighbor_feature_agg_oracle_sql(
                "SELECT src, dst FROM e", "SELECT node, f FROM f",
                hops=hops)).fetchall())
        assert got == twin, hops


def test_metapath_walks(spark):
    """Label constraints hold per step, walkers stop where the path's
    label is absent, and the DuckDB twin agrees."""
    import duckdb

    # A -uses-> B -owns-> C, plus a 'uses' distractor from B
    rows = [(1, 10, "uses"), (1, 11, "uses"), (10, 20, "owns"),
            (11, 21, "owns"), (10, 99, "uses"), (5, 6, "owns")]
    e = spark.createDataFrame(rows, "src long, dst long, label string")
    got = sorted(tuple(r) for r in SA.metapath_walks(
        e, ["uses", "owns"], seed=4).collect())
    by_walk = {}
    for wid, step, node in got:
        by_walk.setdefault(wid, {})[step] = node
    # starts = sources of 'uses' edges only (1 and 10)
    assert set(by_walk) == {1, 10}
    # step1 must be a 'uses' target, step2 an 'owns' target
    assert by_walk[1][1] in {10, 11} and by_walk[1][2] in {20, 21}
    # walker 10: step1 goes 10->99 ('uses'); 99 has no 'owns' edge -> stops
    assert by_walk[10] == {0: 10, 1: 99}
    con = duckdb.connect()
    con.execute("CREATE TABLE me (src BIGINT, dst BIGINT, label VARCHAR)")
    con.executemany("INSERT INTO me VALUES (?, ?, ?)", rows)
    twin = sorted(tuple(t) for t in con.execute(
        SA.metapath_walks_oracle_sql(
            "SELECT src, dst, label FROM me", ["uses", "owns"],
            seed=4)).fetchall())
    assert got == twin
    # cycling: length 4 repeats the 2-label path twice
    got4 = sorted(tuple(r) for r in SA.metapath_walks(
        e, ["uses", "owns"], length=4, seed=4).collect())
    twin4 = sorted(tuple(t) for t in con.execute(
        SA.metapath_walks_oracle_sql(
            "SELECT src, dst, label FROM me", ["uses", "owns"],
            length=4, seed=4)).fetchall())
    assert got4 == twin4


def test_weighted_random_walks(spark):
    """Weight-proportional transitions: twin-identical draws, ~w ratio
    across walkers, loud rejection of bad weights."""
    import duckdb
    from collections import Counter

    import pytest as _pt

    # many walkers (distinct starts) all at node 0 with two out-edges
    # weighted 9:1 -> step-1 choices split ~9:1
    rows = [(i, 0, 1) for i in range(200)] + [(0, 1, 9), (0, 2, 1)]
    e = spark.createDataFrame(rows, "src long, dst long, weight long")
    walks = SA.weighted_random_walks(e, length=2, seed=6)
    got = sorted(tuple(r) for r in walks.collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE we (src BIGINT, dst BIGINT, weight BIGINT)")
    con.executemany("INSERT INTO we VALUES (?, ?, ?)", rows)
    twin = sorted(tuple(t) for t in con.execute(
        SA.weighted_walks_oracle_sql(
            "SELECT src, dst, weight FROM we", length=2, seed=6)
    ).fetchall())
    assert got == twin
    c = Counter(n for w, s, n in got if s == 2 and n in (1, 2))
    assert c[1] / max(c[2], 1) > 4     # ~9x expected, loose bound
    with _pt.raises(ValueError, match="positive"):
        SA.weighted_random_walks(spark.createDataFrame(
            [(0, 1, 0)], "src long, dst long, weight long")).count()


def test_sample_non_edges(spark):
    """Negatives are never real edges or self-pairs, at most k per
    source, and the DuckDB twin agrees draw-for-draw."""
    import duckdb

    edges = [(a, b) for a in range(12) for b in range(12)
             if a < b and (a * 7 + b) % 3 == 0]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = sorted(tuple(r) for r in SA.sample_non_edges(
        e, k=4, seed=9, n_buckets=8).collect())
    und = {(a, b) for a, b in edges} | {(b, a) for a, b in edges}
    per_src = {}
    for s, slot, d in got:
        assert (s, d) not in und and s != d
        per_src[s] = per_src.get(s, 0) + 1
    assert all(v <= 4 for v in per_src.values())
    assert len(got) > 0
    con = duckdb.connect()
    con.execute("CREATE TABLE ne (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO ne VALUES (?, ?)", edges)
    twin = sorted(tuple(t) for t in con.execute(
        SA.sample_non_edges_oracle_sql(
            "SELECT src, dst FROM ne", k=4, seed=9, n_buckets=8)
    ).fetchall())
    assert got == twin


def test_node2vec_walks_bias_and_twin(spark):
    """Second-order bias: with a huge return weight the walker bounces
    back to prev; with a huge far weight it prefers the non-adjacent
    candidate; the DuckDB twin agrees draw-for-draw in both regimes."""
    import duckdb

    # 0->1; from 1: back to 0 (return), 2 (2 shares edge 0->2: common),
    # 3 (far).  Start only at 0 so step-2 exercises the bias classes.
    edges = [(0, 1), (1, 0), (1, 2), (1, 3), (0, 2)]
    e = edges_df(spark, edges)
    starts = spark.createDataFrame([(0,)], "id long")
    con = duckdb.connect()
    con.execute("CREATE TABLE nv (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO nv VALUES (?, ?)", edges)
    # seed 4: the (uniform) step-1 draw picks dst=1, so step 2 exercises
    # the bias classes from prev=0, cur=1
    for wr, wc, wf in ((1000, 1, 1), (1, 1, 1000), (1, 4, 2)):
        walks = SA.node2vec_walks(e, length=2, seed=4, w_return=wr,
                                  w_common=wc, w_far=wf, starts=starts)
        got = sorted(tuple(r) for r in walks.collect())
        twin = sorted(tuple(t) for t in con.execute(
            SA.node2vec_walks_oracle_sql(
                "SELECT src, dst FROM nv", length=2, seed=4, w_return=wr,
                w_common=wc, w_far=wf, starts_sql="SELECT 0 AS id")
        ).fetchall())
        assert got == twin
        step2 = {n for w, s, n in got if s == 2}
        if wr == 1000:
            assert step2 == {0}        # returns to prev
        elif wf == 1000:
            assert step2 == {3}        # prefers the non-adjacent hop
    with __import__("pytest").raises(ValueError, match="positive"):
        SA.node2vec_walks(e, w_far=0)


def test_node2vec_walks_statistical_split(spark):
    """Many walkers at a 3-way junction split ~w_return:w_common:w_far
    after the first step establishes prev (loose ratio bounds)."""
    from collections import Counter

    # every walker i: i -> 0 -> {i (return), 1 (common via 0->1... )}
    # junction: from 0 candidates are 1, 2, 3; walkers arrive from 9000+i
    # with no edges to 1/2/3 -> all candidates 'far' except none common;
    # instead make prev node 900 adjacent to 1 only: 900->1 edge.
    rows = ([(i, 900) for i in range(1000, 1200)]
            + [(900, 0), (0, 1), (0, 2), (0, 3), (900, 1)])
    e = edges_df(spark, rows)
    starts = spark.createDataFrame(
        [(i,) for i in range(1000, 1200)], "id long")
    walks = SA.node2vec_walks(e, length=3, seed=11, w_return=1,
                              w_common=8, w_far=1, starts=starts)
    got = walks.collect()
    c = Counter(n for r in got for s, n in [(r["step"], r["node"])]
                if s == 3 and n in (1, 2, 3))
    # from 0 with prev=900: 1 is common (900->1), 900 return, 2/3 far;
    # among {1,2,3}: expect 8 : 1 : 1
    assert c[1] / max(c[2] + c[3], 1) > 2.0


def test_random_walks_one_materialization_job(spark):
    # r15: the per-hop checkpoints are non-eager — the adjacency count is
    # one job and the final result checkpoint materializes every hop in
    # ONE more job (the r14 form paid an eager-checkpoint job per hop).
    sc = spark.sparkContext
    edges = edges_df(spark, [(i, i + 1) for i in range(20)])
    saved = {k: spark.conf.get(k) for k in (
        "spark.sql.adaptive.enabled", "spark.sql.autoBroadcastJoinThreshold")}
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    sc.setJobGroup("walk-jobs", "r15 walk job-count assertion")
    try:
        n = SA.random_walks(edges, length=3, seed=1).count()
    finally:
        sc.setJobGroup(None, None)
        for k, v in saved.items():
            spark.conf.set(k, v)
    jobs = sc._jsc.sc().statusTracker().getJobIdsForGroup("walk-jobs")
    assert n > 0
    # adj count + result checkpoint + the caller's count = 3; the r14
    # form ran 3 more (one eager checkpoint per hop)
    assert len(jobs) <= 4, f"random_walks ran {len(jobs)} jobs"
