#!/usr/bin/env python
"""Interleaved A/B for the minhash_lsh bench entry (r08 verdict follow-up).

The r06→r08 recording swung 1.32s → 3.46s on a code path `git diff` proves
unchanged, so the candidate mechanisms are (a) VM-generation speed and
(b) suite position — in r08 the entry runs after the new ppjoin_exact entry
in the same JVM. Each invocation of this script is ONE fresh JVM that runs
minhash_lsh best-of-3 either in isolation (`iso`) or immediately after a
ppjoin_exact run (`pos`), mirroring bench.py's measurement exactly
(same repartition+cache warmup, same best-of-N).

Drive it interleaved from the shell:
    for i in 1 2 3; do
        python scripts/ab_minhash.py iso; python scripts/ab_minhash.py pos
    done
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from judy_graph_db_spark.operators import dedup as D
from judy_graph_db_spark.session import get_spark
from judy_graph_db_spark.sources.tpch_graph import load_tpch_views


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "iso"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-minhash")
    spark.sparkContext.setLogLevel("ERROR")
    load_tpch_views(spark, sf_dir)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    docs = spark.table("documents").repartition(cpus).cache()
    docs.count()

    if mode == "pos":
        t0 = time.time()
        D.jaccard_similarity_join(docs, 800).count()
        print(f"ppjoin_warm {time.time() - t0:.3f}s")

    best = None
    for _ in range(3):
        t0 = time.time()
        D.minhash_lsh_candidates(docs).count()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    print(f"minhash_lsh[{mode}] best-of-3 = {best:.3f}s")


if __name__ == "__main__":
    main()
