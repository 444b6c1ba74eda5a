"""Local replica of the driver's correctness gate: run a queries() entry on
Spark and its oracle_sql() twin on DuckDB over the same parquet tables,
compare row count + order-insensitive values (columns sorted by name)."""

from __future__ import annotations

import math
import os

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings",
]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _norm(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def normalized_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name, normalize values, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def compare(spark_df, con, sql: str) -> tuple[bool, str]:
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.sql(sql)
    d_cols = list(rel.columns)
    d_rows = rel.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duck={len(d_rows)}"
    a = normalized_rows(s_cols, s_rows)
    b = normalized_rows(d_cols, d_rows)
    if a != b:
        diff_i = next(i for i, (x, y) in enumerate(zip(a, b)) if x != y)
        return False, (
            f"value mismatch at sorted row {diff_i}:\n"
            f"  spark: {a[diff_i]}\n  duck:  {b[diff_i]}\n"
            f"  (cols sorted: {sorted(s_cols)})"
        )
    return True, f"OK ({len(s_rows)} rows)"
