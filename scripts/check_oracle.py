#!/usr/bin/env python
"""Replicate the driver's correctness gate at sf0.01 (or $SPARK_GRAFT_SF_DIR):
run every __spark_entry__.queries() entry on Spark and its oracle_sql() twin
on DuckDB, print per-query PASS/FAIL.

``--lint`` additionally runs ``plans.lint.lint_plan`` over every gate's
physical plan and prints the findings next to the verdict — one command
for both "is it right" and "is the plan the 100 TB shape". Known-benign
findings (documented aggregate-sized windows, the broadcast ranges
BETWEEN join, gate-pinned exact paths — see CHANGELOG item 48) print as
informational; lint findings never change the exit code."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from judy_graph_db_spark.session import get_spark
from tests.oracle_utils import compare, duck_connection


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    do_lint = "--lint" in sys.argv[1:]
    spark = get_spark("check-oracle")
    spark.sparkContext.setLogLevel("ERROR")
    duck = duck_connection(sf_dir)
    if do_lint:
        from judy_graph_db_spark.plans.lint import lint_plan

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failed = []
    n_lint_clean = 0
    for name in sorted(queries):
        t0 = time.time()
        lint_msg = ""
        try:
            df = queries[name](spark, sf_dir)
            if do_lint:
                fs = lint_plan(df)
                lint_msg = "  lint:clean" if not fs else \
                    "  lint:" + ",".join(sorted({f.rule for f in fs}))
                n_lint_clean += not fs
            if name not in oracles:
                n = df.count()
                ok, msg = True, f"rows-only ({n} rows, no oracle)"
            else:
                ok, msg = compare(df, duck, oracles[name])
        except Exception as exc:  # noqa: BLE001
            ok, msg = False, f"EXCEPTION: {exc}"
        dt = time.time() - t0
        print(f"{'PASS' if ok else 'FAIL'} {name:26s} {dt:6.1f}s  "
              f"{msg}{lint_msg}")
        if not ok:
            failed.append(name)
    print(f"\n{len(queries) - len(failed)}/{len(queries)} queries match at {sf_dir}")
    if do_lint:
        print(f"{n_lint_clean}/{len(queries)} gate plans lint clean "
              "(findings are informational; see CHANGELOG item 48)")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
