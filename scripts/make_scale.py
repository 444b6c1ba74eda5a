#!/usr/bin/env python
"""Build a synthetic sf1.0 dataset for the scale probe by replicating the
driver's sf0.1 parquet 10x with consistent key offsets (+r*10^7 per
replica — far below the graph id-space band width B=10^12) and
deterministic CONTENT mutation so data-dependent output sizes scale
linearly instead of exploding:

* documents.text: per-replica vowel permutation via translate() — token
  count, lengths and n_chars are preserved, but most word shingles
  change, so replicas are NOT near-duplicates of each other and the
  dedup entries (minhash/simhash/ppjoin) see a realistic 10x corpus
  rather than 5k duplicate-clusters of size 10 (which would inflate
  pair outputs ~45x and poison the scaling exponent).
* embeddings.embedding: rotate the vector by r positions — replicas are
  mutually near-orthogonal instead of identical, keeping the near-dup
  pair count linear.
* foreign keys (o_custkey, l_orderkey/partkey/suppkey, user_id) shift
  with their parents; nation/region stay shared dims.

Output defaults to /root/repo/.scale/sf1.0 (gitignored, ~170 MB).
Usage: python scripts/make_scale.py [dst_dir]
"""

import os
import sys

import duckdb

SRC = os.environ.get("SPARK_GRAFT_SRC_SF", "/root/testdata/sf0.1")
DST = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf1.0"
REPS = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "10"))
# second-level application (sf1 → sf10) must widen the stride past the
# first level's whole key span: SPARK_GRAFT_SCALE_OFF=100000000
OFF = int(os.environ.get("SPARK_GRAFT_SCALE_OFF", "10000000"))

# r=0 is the identity permutation: replica 0 IS the sf0.1 corpus
VOWELS = ["aeiou", "eioua", "iouae", "ouaei", "uaeio",
          "aiueo", "eoaiu", "iaoeu", "oeuai", "ueoia"][:REPS]


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"PRAGMA threads={os.cpu_count()}")

    def rep(table: str, select_fmt: str) -> None:
        parts = [select_fmt.format(r=r, off=r * OFF,
                                   vow=VOWELS[r % len(VOWELS)],
                                   src=f"'{SRC}/{table}.parquet'")
                 for r in range(REPS)]
        sql = " UNION ALL ".join(parts)
        con.execute(
            f"COPY ({sql}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
        n = con.sql(
            f"SELECT count(*) FROM '{DST}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")

    rep("orders",
        "SELECT o_orderkey + {off} AS o_orderkey, "
        "o_custkey + {off} AS o_custkey, o_orderstatus, o_totalprice, "
        "o_orderdate, o_orderpriority FROM {src}")
    rep("customer",
        "SELECT c_custkey + {off} AS c_custkey, c_name, c_nationkey, "
        "c_acctbal, c_mktsegment FROM {src}")
    rep("lineitem",
        "SELECT l_orderkey + {off} AS l_orderkey, "
        "l_partkey + {off} AS l_partkey, l_suppkey + {off} AS l_suppkey, "
        "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
        "l_returnflag, l_linestatus, l_shipdate FROM {src}")
    rep("part",
        "SELECT p_partkey + {off} AS p_partkey, p_name, p_brand, p_type, "
        "p_size, p_retailprice FROM {src}")
    rep("supplier",
        "SELECT s_suppkey + {off} AS s_suppkey, s_name, s_nationkey, "
        "s_acctbal FROM {src}")
    rep("events",
        "SELECT event_id + {off} AS event_id, ts, "
        "user_id + {off} AS user_id, event_type, value, props FROM {src}")
    rep("documents",
        "SELECT doc_id + {off} AS doc_id, "
        "translate(text, 'aeiou', '{vow}') AS text, lang, source, "
        "n_chars FROM {src}")
    rep("embeddings",
        "SELECT vec_id + {off} AS vec_id, "
        "CASE WHEN {r} = 0 THEN embedding ELSE "
        "embedding[{r}+1:] || embedding[1:{r}] END AS embedding, "
        "label FROM {src}")
    for dim in ("nation", "region"):
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{dim}.parquet') "
            f"TO '{DST}/{dim}.parquet' (FORMAT PARQUET)")
        print(f"{dim}: copied")


if __name__ == "__main__":
    main()
