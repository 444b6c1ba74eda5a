#!/usr/bin/env python
"""Capture .explain('formatted') for the r15-touched queries/operators,
writing plans/r15/<name>_<tag>.txt. Tag comes from argv[1] (before/after);
optional argv[2] = comma-separated subset of names.

Covers the operator output whose materialization the bench times for every
entry this round touches: the similarity family (embedding_neardup /
semantic_dedup / simhash_neardup / bitext_mine), the fused-window
connected_components, the single-explode sft_pack, and the sampled
betweenness pair (self-contained checkpoint form).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from judy_graph_db_spark.session import get_spark
from judy_graph_db_spark.sources.tpch_graph import load_tpch_views

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TAG = sys.argv[1] if len(sys.argv) > 1 else "before"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r15")
ONLY = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None


def dump(name, df):
    if ONLY is not None and name not in ONLY:
        return
    path = os.path.join(OUT, f"{name}_{TAG}.txt")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    with open(path, "w") as f:
        f.write(plan)
    print(f"wrote {path} ({len(plan)} bytes)")


def main():
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("plans-r15")
    spark.sparkContext.setLogLevel("ERROR")
    load_tpch_views(spark, SF)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from judy_graph_db_spark.operators import analytics as AN
    from judy_graph_db_spark.operators import clustering as CL
    from judy_graph_db_spark.operators import dedup as D
    from judy_graph_db_spark.operators import similarity as S
    from judy_graph_db_spark.sources.tpch_graph import tpch_graph

    g = tpch_graph(spark, SF)
    g.edges = g.edges.cache()
    g.edges.count()
    chains = g.edges.filter(~F.col("is_back")).filter(
        F.col("label") == "NEXT_ORDER")
    dump("connected_components", AN.connected_components(chains))
    dump("sampled_betweenness",
         AN.betweenness_centrality(
             chains,
             sources=chains.select(F.col("src").alias("id"))
             .filter(F.col("id") % 20 == 0).distinct(),
             max_iter=8))

    docs = spark.table("documents").repartition(cpus).cache()
    docs.count()
    embs = spark.table("embeddings").repartition(cpus).cache()
    embs.count()

    dump("embedding_neardup", S.cosine_neardup_pairs(embs, dim=64))
    dump("semantic_dedup", CL.semantic_dedup(embs, k=8, iters=2, dim=64))
    dump("simhash_neardup", D.simhash_neardup_pairs(docs))
    dump("bitext_mine", S.bitext_mine(
        embs.filter(F.col("vec_id") % 2 == 0),
        embs.filter(F.col("vec_id") % 2 == 1),
        k=4, threshold_milli=1000, dim=64, n_planes="auto"))

    from judy_graph_db_spark.operators import curation as CU

    sft_pairs = docs.select(
        F.col("doc_id").alias("example_id"),
        F.expr("transform(sequence(1, 8 + CAST(doc_id % 9 AS INT)), "
               "j -> CAST((doc_id * 31 + j) % 997 AS BIGINT))")
        .alias("prompt_ids"),
        F.expr("transform(sequence(1, 16 + CAST(doc_id % 17 AS INT)), "
               "j -> CAST((doc_id * 17 + j) % 991 AS BIGINT))")
        .alias("response_ids"))
    dump("sft_pack", CU.emit_sft_sequences(sft_pairs, seq_len=1024))

    print("done")


if __name__ == "__main__":
    main()
