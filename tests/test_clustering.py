"""Unit tests for k-means clustering and SemDeDup semantic dedup —
behavioral checks beyond the oracle-twin gate (test_entry_oracle covers the
hash equivalence)."""

from pyspark.sql import functions as F

from judy_graph_db_spark.operators import clustering as CL


def _embs(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


def test_kmeans_separates_obvious_clusters(spark):
    # two tight groups on opposite axes; k=2 must split them exactly
    rows = [(i, [10.0 + i * 0.01, 0.0, 0.0]) for i in range(5)]
    rows += [(10 + i, [0.0, 10.0 + i * 0.01, 0.0]) for i in range(5)]
    out = CL.kmeans_assign(_embs(spark, rows), k=2, iters=3, dim=3).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["cluster"], set()).add(r["vec_id"])
    assert len(by_cluster) == 2
    groups = sorted(frozenset(v) for v in by_cluster.values())
    assert groups == sorted(
        [frozenset(range(5)), frozenset(range(10, 15))]
    )


def test_kmeans_deterministic(spark):
    rows = [(i, [float((i * 7 + j * 3) % 11) for j in range(4)]) for i in range(20)]
    df = _embs(spark, rows)
    a = sorted((r["vec_id"], r["cluster"]) for r in
               CL.kmeans_assign(df, k=3, iters=2, dim=4).collect())
    b = sorted((r["vec_id"], r["cluster"]) for r in
               CL.kmeans_assign(df, k=3, iters=2, dim=4).collect())
    assert a == b


def test_kmeans_empty_cluster_keeps_centroid(spark):
    # seed 2 is an extreme outlier nothing assigns to after round 1; k must
    # not shrink — every point still gets a cluster in 0..k-1
    rows = [(0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [100.0, 100.0]),
            (3, [0.5, 0.1]), (4, [0.4, 0.0]), (5, [0.9, 0.1])]
    out = CL.kmeans_assign(_embs(spark, rows), k=3, iters=3, dim=2).collect()
    assert len(out) == 6
    assert all(0 <= r["cluster"] <= 2 for r in out)


def test_semantic_dedup_drops_higher_id_twin(spark):
    # 20 and 21 are exact duplicates (cosine = 1.0): the higher id drops,
    # the lower survives; a far-off vector is untouched
    rows = [(20, [1.0, 2.0, 3.0]), (21, [1.0, 2.0, 3.0]),
            (22, [-3.0, 1.0, 0.5])]
    out = {r["vec_id"]: r["kept"] for r in
           CL.semantic_dedup(_embs(spark, rows), k=1, iters=1, dim=3,
                             threshold_micro=999000).collect()}
    assert out == {20: True, 21: False, 22: True}


def test_semantic_dedup_cross_cluster_pair_not_scored(spark):
    # duplicates that land in DIFFERENT clusters are not candidates — the
    # documented O(n²/k) trade (recall bounded by cluster assignment)
    rows = [(0, [10.0, 0.0]), (1, [0.0, 10.0]),  # seeds → 2 clusters
            (2, [10.0, 0.1]), (3, [0.1, 10.0])]
    clusters = CL.kmeans_assign(_embs(spark, rows), k=2, iters=1, dim=2)
    out = CL.semantic_dedup(_embs(spark, rows), clusters=clusters,
                            dim=2, threshold_micro=500000)
    kept = {r["vec_id"]: r["kept"] for r in out.collect()}
    # within-cluster near-dups drop (2 dups onto 0, 3 onto 1) but nothing
    # is compared across the two clusters
    assert kept[0] and kept[1]
    assert not kept[2] and not kept[3]


def test_kmeans_sizes_sum_to_input(spark):
    rows = [(i, [float(i % 5), float(i % 3)]) for i in range(30)]
    sizes = CL.kmeans_sizes(_embs(spark, rows), k=4, iters=2, dim=2)
    assert sizes.agg(F.sum("n")).collect()[0][0] == 30


def test_kmeans_target_cluster_size_derives_k(spark):
    """target_cluster_size derives k from the corpus count: with n rows
    and target t, clusters number ~n//t — the SemDeDup scaling rule
    (k ~ 0.1% of n) instead of a fixed small k."""
    rows = [(i, [float((i * 7 + j * 3) % 11) for j in range(4)])
            for i in range(20)]
    df = _embs(spark, rows)
    out = CL.kmeans_assign(df, dim=4, target_cluster_size=4)  # k = 20//4
    k_seen = out.select("cluster").distinct().count()
    assert 2 <= k_seen <= 5

    import pytest as _pytest
    with _pytest.raises(ValueError, match="positive"):
        CL.kmeans_assign(df, dim=4, target_cluster_size=0)


def test_pq_pipeline_matches_twin_and_recalls_query(spark):
    """PQ codes + codebooks + ADC top-k: codes agree with the m-chain
    kmeans twin, the ADC ranking agrees with the SQL twin, and a corpus
    vector used as its own query comes back at rank 1 (its quantized
    distance is the minimum by construction)."""
    import random

    import duckdb

    from judy_graph_db_spark.oracle import pq_adc_topk_sql, pq_codes_sql

    random.seed(3)
    DIM, M, K = 16, 4, 4
    rows = [(i, [round(random.uniform(-1, 1), 3) for _ in range(DIM)])
            for i in range(40)]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    codes = pq_codes = CL.pq_train_encode(embs, m=M, k=K, iters=2, dim=DIM)
    flat = sorted((r.vec_id, s, c) for r in codes.collect()
                  for s, c in enumerate(r.codes))
    cbs = CL.pq_codebooks(embs, pq_codes, m=M, dim=DIM)
    top = sorted(tuple(r) for r in CL.pq_adc_topk(
        pq_codes, cbs, embs.orderBy("vec_id").limit(1).select("embedding"),
        m=M, dim=DIM, topk=5).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE embeddings (vec_id BIGINT, embedding FLOAT[])")
    con.executemany("INSERT INTO embeddings VALUES (?, ?)", rows)
    assert flat == sorted(tuple(t) for t in con.execute(
        pq_codes_sql(m=M, k=K, iters=2, dim=DIM)).fetchall())
    assert top == sorted(tuple(t) for t in con.execute(
        pq_adc_topk_sql(m=M, k=K, iters=2, dim=DIM, topk=5)).fetchall())
    by_rank = {r: v for v, _, r in top}
    assert by_rank[1] == 0  # the query vector itself wins
    import pytest as _pytest
    with _pytest.raises(ValueError, match="divisible"):
        CL.pq_train_encode(embs, m=5, dim=DIM)
