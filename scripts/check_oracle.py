#!/usr/bin/env python
"""Replicate the driver's correctness gate at sf0.01 (or $SPARK_GRAFT_SF_DIR):
run every __spark_entry__.queries() entry on Spark and its oracle_sql() twin
on DuckDB, print per-query PASS/FAIL."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from judy_graph_db_spark.session import get_spark
from tests.oracle_utils import compare, duck_connection


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("check-oracle")
    spark.sparkContext.setLogLevel("ERROR")
    duck = duck_connection(sf_dir)

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failed = []
    for name in sorted(queries):
        t0 = time.time()
        try:
            if name not in oracles:
                n = queries[name](spark, sf_dir).count()
                ok, msg = True, f"rows-only ({n} rows, no oracle)"
            else:
                ok, msg = compare(queries[name](spark, sf_dir), duck, oracles[name])
        except Exception as exc:  # noqa: BLE001
            ok, msg = False, f"EXCEPTION: {exc}"
        dt = time.time() - t0
        print(f"{'PASS' if ok else 'FAIL'} {name:26s} {dt:6.1f}s  {msg}")
        if not ok:
            failed.append(name)
    print(f"\n{len(queries) - len(failed)}/{len(queries)} queries match at {sf_dir}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
