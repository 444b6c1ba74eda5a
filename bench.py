#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Workload mirrors the reference's benchmark suite (benchmark/Bench.hs:29-58):
- miw_load  = MIW massive-insertion (build + materialize the edges table)
- cw_1hop   = CW (1-hop label query) — adjacentNodesByAttr
plus the engine's headline operators: multi-hop pattern, variable-length
path, degree rollup, dedup (exact + MinHash-LSH), similarity top-k, text
quality, windowed events aggregation.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import Window
from pyspark.sql import functions as F  # noqa: E402

from judy_graph_db_spark import N, E, table  # noqa: E402
from judy_graph_db_spark.functions import text as T  # noqa: E402
from judy_graph_db_spark.operators import adjacency as A  # noqa: E402
from judy_graph_db_spark.operators import dedup as D  # noqa: E402
from judy_graph_db_spark.operators import similarity as S  # noqa: E402
from judy_graph_db_spark.session import get_spark  # noqa: E402
from judy_graph_db_spark.sources.tpch_graph import B, load_tpch_views, tpch_graph  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    load_tpch_views(spark, sf_dir)
    # the sf* fixtures are single parquet files → 1 input split; real corpora
    # arrive in many splits, so spread them across the local cores up front
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    docs = spark.table("documents").repartition(cpus).cache()
    embs = spark.table("embeddings").repartition(cpus).cache()
    events = spark.table("events")
    docs.count(), embs.count()

    timings: dict[str, float] = {}

    def run(name: str, fn, repeats: int = 3) -> None:
        """criterion-style steady-state timing (the reference benchmarks with
        criterion, benchmark/Bench.hs): best of ``repeats`` runs — first-run
        whole-stage-codegen JIT cost amortizes away on a long-lived cluster.

        Round-7 cross-round calibration: the r5→r6 swings on miw_load
        (+73%) / connected_components (+46%) / pagerank_3it (+35%) were
        A/B'd by running the r5 checkout and HEAD alternately in 6 fresh
        JVMs (3 pairs) on the same day. r5 CODE measured 7.4-8.1 / 7.5-8.7
        / 6.1-7.7s — i.e. at r6-recorded speeds, nowhere near its own
        r5-recorded 4.5 / 5.8 / 4.6s, with the two distributions
        overlapping. The swing is VM-generation speed, not code; compare
        entries ACROSS rounds only via a same-day interleaved A/B."""
        best = None
        for _ in range(repeats):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 3)

    # MIW: build + fully materialize the graph (cached for the query suite,
    # like the reference's in-RAM judy arrays)
    g = tpch_graph(spark, sf_dir)

    def load():
        g.edges = g.edges.cache()
        g.edges.count()

    run("miw_load", load, repeats=1)  # a load is one-shot by definition

    run("cw_1hop", lambda: A.adjacent_nodes_by_attr(g, 3 * B + 1, "PLACED", backwards=False).count())

    # the reference's OWN benchmark workloads (benchmark/Bench.hs:29-58,
    # BASELINE.md micro-targets): MIW = bulk-load data.txt (367,662 edges),
    # CW = load + 1-hop label query on node 128
    ref_data = "/root/reference/benchmark/data.txt"
    if os.path.exists(ref_data):
        from judy_graph_db_spark import E, N
        from judy_graph_db_spark import table as q_table
        from judy_graph_db_spark.sources.edge_list import read_edge_list

        def miw_ref():
            read_edge_list(spark, ref_data, label="MAILED").edges.count()

        # best-of-2 (nothing is cached inside — each repeat re-reads and
        # re-builds): single-shot timing of a sub-second load swung 0.91 →
        # 1.28s across rounds on identical code; an interleaved 8-sample
        # A/B measured 0.53–0.76s steady-state with a 3.7s first-run
        # outlier, i.e. the swing was VM + JIT noise, not a regression
        run("miw_ref_data_txt", miw_ref, repeats=2)

        gref = read_edge_list(spark, ref_data, label="MAILED")
        gref.edges = gref.edges.cache()
        gref.edges.count()
        run("cw_ref_node128", lambda: q_table(
            gref, N(ids=[128]) >> E("MAILED", direction="r") >> N()).count())

    # the deploy path: materialized edges table, distributed+sorted by src —
    # point lookups then hit parquet row-group stats instead of recomputing
    # the graph from source tables
    import shutil
    import tempfile

    from judy_graph_db_spark.graph import Graph

    mat_dir = tempfile.mkdtemp(prefix="bench_graph_")
    try:
        g.save(mat_dir, bucket_by_src=True)
        gm = Graph.load(spark, mat_dir)
        run("cw_1hop_materialized",
            lambda: A.adjacent_nodes_by_attr(gm, 3 * B + 1, "PLACED", backwards=False).count())
    finally:
        shutil.rmtree(mat_dir, ignore_errors=True)

    pat2 = (
        N(labels=["CUSTOMER"]) >> E("PLACED", direction="r") >> N()
        >> E("CONTAINS", direction="r") >> N(labels=["PART"])
    )
    run("pattern_2hop", lambda: table(g, pat2).count())

    patv = N(labels=["ORDER"]) >> E("NEXT_ORDER", direction="r", several=(1, 3)) >> N()
    run("var_length_3hop", lambda: table(g, patv).count())

    run("degree_table", lambda: A.degree_table(g).count())

    # whole-graph analytics (iterative operators run once — their cost is
    # dominated by per-round shuffles + checkpoints, not codegen warmup)
    from judy_graph_db_spark.operators import analytics as AN

    fwd = g.edges.filter(~F.col("is_back"))
    run(
        "connected_components",
        lambda: AN.connected_components(
            fwd.filter(F.col("label") == "NEXT_ORDER")
        ).count(),
        repeats=2,
    )
    run("triangle_count", lambda: AN.triangle_count(fwd).collect())
    run(
        "closure_doubling",
        lambda: AN.transitive_closure(
            fwd.filter(F.col("label") == "NEXT_ORDER")
        ).count(),
        repeats=2,
    )
    run("pagerank_3it", lambda: AN.pagerank(fwd, iters=3).count(), repeats=2)
    run(
        "label_propagation_3it",
        lambda: AN.label_propagation(
            fwd.filter(F.col("label") == "NEXT_ORDER"), iters=3
        ).count(),
        repeats=2,
    )

    run("exact_dedup", lambda: D.exact_dedup(docs).count())
    run("minhash_lsh", lambda: D.minhash_lsh_candidates(docs).count())
    run("simhash_neardup", lambda: D.simhash_neardup_pairs(docs).count())
    run("ppjoin_exact", lambda: D.jaccard_similarity_join(docs, 800).count())
    run("cosine_topk", lambda: S.cosine_topk_bruteforce(embs, query_id=0, k=10, dim=64).count())
    run("embedding_neardup", lambda: S.cosine_neardup_pairs(embs, dim=64).count())

    from judy_graph_db_spark.operators import curation as CU

    run("doc_chunks", lambda: CU.chunk_documents(docs).count())
    run("token_chunks", lambda: CU.chunk_by_tokens(docs).count())
    run("token_shards", lambda: CU.shard_by_token_budget(docs, 100000).count())

    from judy_graph_db_spark.operators import multimodal as MM

    media = MM.as_media_table(docs)
    run("media_decode", lambda: MM.decode_features(media).count())
    run("image_ahash", lambda: MM.image_ahash(media).count())
    run(
        "doc_quality",
        lambda: docs.select(
            T.quality_score(F.col("text")).alias("q"), T.lang_id(F.col("text")).alias("l")
        ).groupBy("l").agg(F.sum("q")).count(),
    )
    run(
        "events_hourly",
        lambda: events.withColumn("h", F.floor(F.unix_timestamp("ts") / 3600))
        .groupBy("h", "event_type").agg(F.count(F.lit(1)), F.sum("value")).count(),
    )

    # temporal / stats / sampling (round-5 surface)
    from judy_graph_db_spark.operators import sampling as SA
    from judy_graph_db_spark.operators import stats as ST
    from judy_graph_db_spark.operators import temporal as TP

    clicks = events.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    buys = events.filter(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    run("asof_join", lambda: TP.asof_join(clicks, buys, on="user_id").count())
    run("funnel", lambda: TP.funnel_completions(events, "view", "purchase", 3600).count())
    run("term_stats", lambda: ST.term_stats(docs).count())
    run(
        "neighbor_sample",
        lambda: SA.sample_neighbors(
            g.edges.filter((F.col("label") == "CONTAINS") & ~F.col("is_back")), k=2
        ).count(),
    )
    # walk corpus from a 1/16 hash sample of customers over their order
    # chains — representative fan-out without dominating the suite
    walk_starts = (
        spark.table("orders")
        .select((F.col("o_orderkey") + 5 * B).alias("id"))
        .filter(F.substring(F.md5(F.col("id").cast("string")), 1, 1) == "0")
    )
    run(
        "random_walks",
        lambda: SA.random_walks(
            g.edges.filter((F.col("label") == "NEXT_ORDER") & ~F.col("is_back")),
            length=3,
            starts=walk_starts,
        ).count(),
        repeats=1,
    )

    # clustering / semantic dedup / SCC (round-6 surface)
    from judy_graph_db_spark.operators import clustering as CL

    run("semantic_dedup", lambda: CL.semantic_dedup(embs, k=8, iters=2, dim=64).count())
    run("quantize_embs", lambda: S.quantize_embeddings(embs).count())
    run("pack_sequences", lambda: CU.pack_sequences(docs, 512).count())
    run("funnel3", lambda: TP.funnel_steps(
        events, ["view", "click", "purchase"], 86400).count())
    run("resample_hourly", lambda: TP.resample_counts(events, 3600).count())
    run("token_commonness", lambda: ST.token_commonness(docs).count())
    # directed SCC input: each even-custkey customer's order chain closed
    # into a cycle (the same construction the correctness gate hashes)
    orders = spark.table("orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.struct("o_orderdate", "o_orderkey")).alias("_fst"),
        F.max(F.struct("o_orderdate", "o_orderkey")).alias("_lst"),
    )
    closing = per_cust.filter((F.col("o_custkey") % 2 == 0) & (F.col("n") >= 2)).select(
        (F.col("_lst.o_orderkey") + 5 * B).alias("src"),
        (F.col("_fst.o_orderkey") + 5 * B).alias("dst"),
    )
    directed = (
        fwd.filter(F.col("label") == "NEXT_ORDER").select("src", "dst")
        .unionByName(closing)
    )
    # best-of-2: single-shot SCC swung 12.5 -> 25.6s across same-code runs
    # (cold whole-stage-codegen per entry + VM noise)
    run("scc", lambda: AN.strongly_connected_components(directed).count(), repeats=2)

    # sketches (round-6 surface): corpus summaries that broadcast at 100 TB
    from judy_graph_db_spark.functions.text import WORD_TOKEN_RE
    from judy_graph_db_spark.operators import sketch as SK

    toks = docs.select(
        F.explode(F.regexp_extract_all(
            F.lower(F.col("text")), F.lit(WORD_TOKEN_RE), F.lit(0)
        )).alias("tok"))
    run("gram_matrix", lambda: SK.gram_matrix(embs, dim=64).count())

    def _sketches():
        SK.count_min(toks, "tok", width=256, depth=4).count()
        SK.hll_registers(events.select("user_id"), "user_id", p=8).count()
        SK.bloom_probe(
            docs.select("doc_id", "text"), "text",
            SK.bloom_build(docs, "text"), id_col="doc_id",
        ).count()

    run("bloom_cms_hll", _sketches)

    # Borůvka MSF over day-gap-weighted order chains + even-custkey cycles
    wnd = __import__("pyspark.sql.window", fromlist=["Window"]).Window \
        .partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wch = orders.select(
        (F.col("o_orderkey") + 5 * B).alias("src"),
        (F.lead("o_orderkey").over(wnd) + 5 * B).alias("dst"),
        (F.datediff(F.lead("o_orderdate").over(wnd), F.col("o_orderdate"))
         .cast("long") * 10_000_000
         + F.col("o_orderkey") % 10_000_000).alias("weight"),
    ).filter(F.col("dst").isNotNull())
    wcl = closing.select("src", "dst",
                         (F.col("src") % 10_000_000).alias("weight"))
    run("min_spanning_forest",
        lambda: AN.minimum_spanning_forest(wch.unionByName(wcl)).count(),
        repeats=2)

    # round-7 surface: matching/coarsening, WL fingerprints, time-
    # respecting closure — iterative ops, best-of-2 like scc/msf
    chains_b = directed  # chains + closing cycles, already built above
    run("maximal_matching",
        lambda: AN.maximal_matching(chains_b, seed=7).count(), repeats=2)
    run("wl_colors_2r",
        lambda: AN.wl_colors(chains_b, rounds=2).count(), repeats=2)
    from judy_graph_db_spark.operators import temporal as TMP

    wtr = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc())
    trans_b = events.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(wtr).alias("dst"),
        F.lead(F.expr("unix_timestamp(ts)")).over(wtr).alias("t"),
    ).filter(F.col("dst").isNotNull())
    run("time_respecting_reach",
        lambda: TMP.time_respecting_reachability(
            trans_b, ts_col="t", min_wait=1).count(), repeats=2)

    # round-8 surface
    run("hyperball_r3",
        lambda: AN.hyperball_registers(chains_b, rounds=3, p=4).count(),
        repeats=2)
    run("triangle_census",
        lambda: AN.directed_triangle_census(chains_b).collect(), repeats=2)
    run("pps_sample",
        lambda: CU.pps_systematic_sample(
            docs.select("doc_id", "n_chars"), 1000, "n_chars").count())
    run("dedup_paragraphs",
        lambda: CU.dedup_paragraphs(
            docs.withColumn(
                "text",
                F.concat_ws("\n\n", F.col("text"),
                            F.substring("text", 1, 40)))).count())
    lw_b = spark.range(1024).select(
        F.col("id").alias("bucket"), (F.col("id") % 19 - 9).alias("w"))
    run("linear_score",
        lambda: ST.linear_score(
            ST.hashed_tf(docs, n_features=1024), lw_b).count())
    run("token_drift",
        lambda: ST.token_dist_divergence(
            docs.filter(F.col("doc_id") % 2 == 0),
            docs.filter(F.col("doc_id") % 2 == 1)).collect())
    run("sliding_windows",
        lambda: TP.sliding_window_counts(events, 7200, 3600).count())
    run("bigram_backoff",
        lambda: ST.score_bigrams(
            docs.filter(F.col("doc_id") % 4 == 1),
            docs.filter(F.col("doc_id") % 4 != 1)).count())
    run("onion_layers",
        lambda: AN.onion_layers(
            fwd.filter(F.col("label") == "NEXT_ORDER")).count(), repeats=1)
    run("filter_paragraphs",
        lambda: CU.filter_paragraphs(
            docs.withColumn("text", F.concat_ws(
                "\n\n", F.lit("menu"), F.col("text"), F.lit("ok"))),
            min_words=3).count())
    run("distance_histogram",
        lambda: S.distance_histogram(embs, sample_buckets=16).count())
    run("epoch_shuffle",
        lambda: CU.epoch_shuffle(docs.select("doc_id"), seed=1).count())
    run("rate_anomalies",
        lambda: TP.rate_anomalies(events, 86400).count())
    run("concurrency",
        lambda: TP.concurrency_profile(
            events.groupBy("user_id").agg(
                F.min("ts").alias("start_ts"),
                F.max("ts").alias("end_ts")),
            period_seconds=3600).count())
    from judy_graph_db_spark.sources.synthetic import chung_lu_zipf_graph
    run("synth_graph_100k",
        lambda: chung_lu_zipf_graph(spark, 10000, 100000, seed=1).count(),
        repeats=1)
    run("trussness",
        lambda: AN.trussness(chains_b, k_max=3).count(), repeats=1)
    run("median_mad",
        lambda: ST.grouped_median_mad(
            spark.table("orders").select(
                "o_orderpriority",
                F.round(F.col("o_totalprice") * 100).cast("long")
                .alias("cents")),
            ["o_orderpriority"], "cents").count())

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_suite_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
