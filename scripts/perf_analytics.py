#!/usr/bin/env python
"""Focused timing harness for the iterative analytics operators at sf0.1.

Not part of the driver contract — a scratch tool for optimizing the
per-round cost of connected_components / transitive_closure / pagerank /
triangle_count without paying for the whole bench suite.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from judy_graph_db_spark.operators import analytics as AN  # noqa: E402
from judy_graph_db_spark.session import get_spark  # noqa: E402
from judy_graph_db_spark.sources.tpch_graph import load_tpch_views, tpch_graph  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("perf_analytics")
    spark.sparkContext.setLogLevel("ERROR")
    load_tpch_views(spark, sf_dir)
    g = tpch_graph(spark, sf_dir)
    g.edges = g.edges.cache()
    g.edges.count()
    fwd = g.edges.filter(~F.col("is_back"))
    chains = fwd.filter(F.col("label") == "NEXT_ORDER")

    which = set(sys.argv[1:]) or {"cc", "closure", "pagerank", "triangles"}

    def run(name, fn):
        if name not in which:
            return
        t0 = time.time()
        n = fn()
        print(f"{name:14s} {time.time() - t0:7.3f}s  ({n})", flush=True)

    run("cc", lambda: AN.connected_components(chains).count())
    run("closure", lambda: AN.transitive_closure(chains).count())
    run("pagerank", lambda: AN.pagerank(fwd, iters=3).count())
    run("triangles", lambda: AN.triangle_count(fwd).collect()[0][0])


if __name__ == "__main__":
    main()
