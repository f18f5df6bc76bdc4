"""Local replica of the driver's correctness gate: run each registered
Spark query and its DuckDB oracle on the same parquet dir, compare
row-count, column names, and an order-insensitive value multiset."""

from __future__ import annotations

import math
from collections import Counter

import duckdb

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _norm(v):
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):  # datetime/date
        return v.isoformat()
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return float(v)
    except ImportError:
        pass
    return v


def compare(spark_df, con, sql: str) -> tuple[bool, str]:
    """Returns (match, detail)."""
    sp_cols = list(spark_df.columns)
    sp_rows = [tuple(_norm(v) for v in row) for row in spark_df.collect()]

    res = con.execute(sql)
    du_cols = [d[0] for d in res.description]
    du_rows = [tuple(_norm(v) for v in row) for row in res.fetchall()]

    if sorted(sp_cols) != sorted(du_cols):
        return False, f"column mismatch: spark={sp_cols} duck={du_cols}"
    if len(sp_rows) != len(du_rows):
        return False, f"rowcount mismatch: spark={len(sp_rows)} duck={len(du_rows)}"

    # align column order by name, then compare as multisets
    sp_idx = [sp_cols.index(c) for c in sorted(sp_cols)]
    du_idx = [du_cols.index(c) for c in sorted(du_cols)]
    sp_set = Counter(tuple(r[i] for i in sp_idx) for r in sp_rows)
    du_set = Counter(tuple(r[i] for i in du_idx) for r in du_rows)
    if sp_set != du_set:
        only_sp = list((sp_set - du_set).items())[:3]
        only_du = list((du_set - sp_set).items())[:3]
        return False, f"value mismatch: spark-only={only_sp} duck-only={only_du}"
    return True, "ok"
