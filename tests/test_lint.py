"""The plan linter itself, then the linter turned on the engine's own
headline operators — the per-round manual plan audit made executable."""

import pandas as pd
import pytest
from pyspark.sql import Window, functions as F
from pyspark.sql.functions import pandas_udf, udf

from judy_graph_db_spark.plans.lint import (
    Finding, assert_scale_safe, lint_plan)

SF_DIR = "/root/testdata/sf0.001"


def rules_of(df, allow=()):
    return sorted({f.rule for f in lint_plan(df, allow)})


# ---------------------------------------------------------------- offenders

def test_flags_unpartitioned_window(spark):
    df = spark.range(100).withColumn(
        "rn", F.row_number().over(Window.orderBy("id")))
    assert rules_of(df) == ["unpartitioned-window"]
    with pytest.raises(AssertionError, match="unpartitioned-window"):
        assert_scale_safe(df)


def test_flags_big_cross_join(spark):
    """A big×big cross join must flag — as CartesianProduct or as a
    non-scalar BroadcastNestedLoopJoin, whichever Catalyst picks."""
    a, b = spark.range(3_000_000), spark.range(3_000_000).withColumnRenamed(
        "id", "id2")
    assert set(rules_of(a.crossJoin(b))) & {
        "cartesian-product", "nested-loop-join"}


def test_flags_cartesian_product_node():
    plan = ("AdaptiveSparkPlan isFinalPlan=false\n"
            "+- CartesianProduct\n"
            "   :- Range (0, 100, step=1, splits=4)\n"
            "   +- Range (0, 100, step=1, splits=4)\n")
    assert [f.rule for f in lint_plan(plan)] == ["cartesian-product"]


def test_flags_nonscalar_nested_loop_join(spark):
    a = spark.range(1000)
    b = spark.range(50).withColumnRenamed("id", "id2")
    df = a.crossJoin(F.broadcast(b))  # build side: a raw 50-row table
    assert "nested-loop-join" in rules_of(df)


def test_flags_row_at_a_time_python_udf(spark):
    inc = udf(lambda x: x + 1, "long")
    assert rules_of(spark.range(10).select(inc("id").alias("x"))) \
        == ["python-row-udf"]


def test_flags_repartition_to_one(spark):
    df = spark.range(100).repartition(1)
    assert "single-partition-exchange" in rules_of(df)


def test_allow_suppresses(spark):
    df = spark.range(100).withColumn(
        "rn", F.row_number().over(Window.orderBy("id")))
    assert lint_plan(df, allow=("unpartitioned-window",)) == []
    assert_scale_safe(df, allow=("unpartitioned-window",))


# ------------------------------------------------------------- clean shapes

def test_scalar_agg_crossjoin_is_clean(spark):
    df = spark.range(1000)
    assert_scale_safe(df.crossJoin(df.agg(F.sum("id").alias("s"))))


def test_partitioned_window_is_clean(spark):
    df = spark.range(1000).withColumn(
        "rn", F.row_number().over(
            Window.partitionBy(F.col("id") % 7).orderBy("id")))
    assert_scale_safe(df)


def test_global_agg_is_clean(spark):
    assert_scale_safe(spark.range(1000).agg(F.sum("id")))


def test_take_ordered_is_clean(spark):
    assert_scale_safe(spark.range(1000).orderBy("id").limit(5))


def test_rank_over_k_survivors_is_clean(spark):
    """The house top-k pattern: sort+limit (TakeOrdered), THEN a global
    window over the k survivors — bounded input, must not flag."""
    top = spark.range(1000).orderBy(F.col("id").desc()).limit(7)
    ranked = top.withColumn(
        "rank", F.row_number().over(Window.orderBy(F.col("id").desc())))
    assert_scale_safe(ranked)


def test_pandas_udf_is_clean(spark):
    @pandas_udf("long")
    def inc(s: pd.Series) -> pd.Series:
        return s + 1

    assert_scale_safe(spark.range(10).select(inc("id").alias("x")))


def test_finding_carries_location(spark):
    df = spark.range(100).withColumn(
        "rn", F.row_number().over(Window.orderBy("id")))
    (f,) = lint_plan(df)
    assert isinstance(f, Finding)
    assert f.node.startswith("Exchange SinglePartition")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.splitlines()[f.line].lstrip(" :+-").startswith(
        "Exchange SinglePartition")


# ------------------------------------- the engine's own plans, linted

def test_engine_headline_plans_are_scale_safe(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    from judy_graph_db_spark.operators import dedup as D
    from judy_graph_db_spark.operators import similarity as S
    from judy_graph_db_spark.operators import sketch as SKT
    from judy_graph_db_spark.operators import stats as STT

    toks = docs.select(F.explode(F.split(F.lower("text"), r"\s+"))
                       .alias("tok"))
    for df in (
        D.exact_dedup(docs),
        D.exact_substring_spans(docs, k=8),
        D.minhash_signatures(docs),
        S.cosine_topk_bruteforce(embs, query_id=1, k=5),
        SKT.misra_gries(toks, "tok", m=16),
        STT.bm25_scores(docs, ["join", "scan"]),
        STT.tfidf(docs),
    ):
        assert_scale_safe(df)


def test_pattern_and_adjacency_plans_are_scale_safe(spark):
    from judy_graph_db_spark import E, N, table
    from judy_graph_db_spark.operators import adjacency as A
    from judy_graph_db_spark.sources.tpch_graph import B, tpch_graph

    g = tpch_graph(spark, SF_DIR)
    assert_scale_safe(
        A.adjacent_nodes_by_attr(g, 3 * B + 1, "PLACED", backwards=False))
    pat = (N(labels=["CUSTOMER"]) >> E("PLACED", direction="r") >> N()
           >> E("CONTAINS", direction="r") >> N(labels=["PART"]))
    assert_scale_safe(table(g, pat))
    # optional hop compiles to a LEFT hash join, not a loop join, and
    # still prunes the union to the one producing table
    opt = table(g, N(labels=["CUSTOMER"])
                >> E("PLACED", direction="r", optional=True) >> N())
    assert_scale_safe(opt)
    opt_plan = opt._jdf.queryExecution().executedPlan().toString()
    assert "LeftOuter" in opt_plan and "lineitem.parquet" not in opt_plan
    # negation compiles to a LEFT ANTI hash join on the composite key
    neg = table(g, N(labels=["CUSTOMER"]) >> E("PLACED", direction="r")
                >> N(),
                not_edges=[(0, E("PLACED", direction="r",
                                 where=lambda c: c["edge_seq"] >= 3), 1)])
    assert_scale_safe(neg)
    assert "LeftAnti" in neg._jdf.queryExecution().executedPlan().toString()


def test_edge_betweenness_sampled_plan_is_scale_safe(spark):
    """The k-pivot edge Brandes pass (the 100 TB edge-betweenness path)
    must keep the shapes the linter bans out of its plan: no
    unpartitioned window, no cartesian/non-scalar BNLJ, no row UDF."""
    from judy_graph_db_spark.operators import analytics as AN

    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0), (1, 3)], "src long, dst long")
    df = AN.edge_betweenness_sampled(e, n_pivots=2)
    assert_scale_safe(df)
