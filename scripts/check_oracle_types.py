#!/usr/bin/env python
"""Type-level sweep of oracle_sql(): run each oracle on DuckDB at sf0.001 and
flag any result column whose DuckDB type is HUGEINT/UHUGEINT (or otherwise
diverges from the Spark twin's type family).

The driver's hash canonicalization distinguishes integer encodings, so a
SUM(BIGINT) that DuckDB silently widens to HUGEINT turns a value-identical
result into a red hash (the r08 `chunk_shard_ops` row). The value-level
compare() in oracle_utils normalizes Python ints and cannot catch this —
this script checks the declared relation types instead.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from tests.oracle_utils import duck_connection

SUSPECT = {"HUGEINT", "UHUGEINT", "INT128", "UINT128"}


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    duck = duck_connection(sf_dir)
    oracles = entry_mod.oracle_sql()
    bad = []
    for name in sorted(oracles):
        try:
            rel = duck.sql(oracles[name])
            types = {c: str(t).upper() for c, t in zip(rel.columns, rel.types)}
        except Exception as exc:  # noqa: BLE001
            print(f"ERR  {name}: {exc}")
            bad.append(name)
            continue
        hits = {c: t for c, t in types.items() if t in SUSPECT}
        if hits:
            print(f"WIDE {name}: {hits}")
            bad.append(name)
        else:
            print(f"ok   {name}: {types}")
    print(f"\n{len(oracles) - len(bad)}/{len(oracles)} oracles type-clean")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
