"""Deterministic synthetic graph generators — scale-testing sources.

The reference ships one benchmark edge list (`benchmark/data.txt`,
367k edges); testing a 100 TB engine needs graphs of ARBITRARY size with
controlled degree structure, generated inside the cluster rather than
downloaded. Both generators here are hash-driven (no RNG state), so the
same (n, m, seed) triple materializes the identical graph on any
partitioning, executor count, or engine — generation is one
``spark.range`` scan, embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def uniform_random_graph(spark, n_nodes: int, n_edges: int, seed: int = 0,
                         simple: bool = True) -> DataFrame:
    """G(n, m)-style uniform random graph: edge e draws both endpoints
    uniformly via seeded md5 — O(m) work, no pair enumeration, no RNG
    sequence. ``simple`` drops self-loops and parallel edges (so the
    realized edge count is slightly under ``n_edges`` — the standard
    G(n,m)-with-replacement concession that keeps generation one narrow
    pass). Returns ``(src, dst)``."""
    from judy_graph_db_spark.operators.sketch import _h60

    if n_nodes < 1 or n_edges < 0:
        raise ValueError("n_nodes must be >= 1, n_edges >= 0")
    e = spark.range(n_edges).select(
        (_h60(F.col("id"), f"er{int(seed)}s") % n_nodes).alias("src"),
        (_h60(F.col("id"), f"er{int(seed)}d") % n_nodes).alias("dst"))
    if simple:
        e = e.filter(F.col("src") != F.col("dst")).distinct()
    return e


def chung_lu_zipf_graph(spark, n_nodes: int, n_edges: int, seed: int = 0,
                        simple: bool = True) -> DataFrame:
    """Chung-Lu random graph with Zipf(1) expected degrees: endpoint i is
    drawn with probability ∝ ``max(n div (i+1), 1)``, so node 0 is the
    heaviest hub and the degree sequence follows the power law real
    corpus graphs (domains, vocabularies, citation networks) exhibit —
    the right null model for stress-testing skew guards (`salted_join`,
    hub caps, AQE skew handling) at any scale.

    Implementation is a REUSE of the word2vec negative-sampler: each
    edge id plays a skip-gram pair and draws its two endpoints as "slot
    1 / slot 2 negatives" through the same two-pass cumulative-interval +
    bin-bucketed range join — O(m) probes against O(n) intervals, never
    an n×m comparison, scalars broadcast. Same (n, m, seed) ⇒ identical
    graph everywhere. Returns ``(src, dst)``.
    """
    from judy_graph_db_spark.operators.sampling import sampled_negatives

    if n_nodes < 1 or n_edges < 0:
        raise ValueError("n_nodes must be >= 1, n_edges >= 0")
    freqs = spark.range(n_nodes).select(
        F.col("id").alias("node"),
        F.greatest(F.expr(f"{int(n_nodes)} div (id + 1)"),
                   F.lit(1)).alias("freq"))
    pairs = spark.range(n_edges).select(
        F.col("id").alias("center"), F.lit(0).alias("context"))
    draws = sampled_negatives(pairs, freqs, k=2, seed=seed)
    e = draws.groupBy("center").agg(
        F.max(F.when(F.col("slot") == 1, F.col("negative"))).alias("src"),
        F.max(F.when(F.col("slot") == 2, F.col("negative"))).alias("dst"),
    ).select("src", "dst")
    if simple:
        e = e.filter(F.col("src") != F.col("dst")).distinct()
    return e
