"""Deterministic dataset scale-up for stress benchmarking.

Replicates the sf0.1 test tables ``factor``× with consistent key
remapping — TPC-H-style: every replica shifts each primary key AND every
foreign key referencing it by the same ``replica * (max_key + 1)``
offset, so join fan-outs, group cardinalities, and selectivities scale
linearly instead of degenerating into key collisions. This is the local
stand-in for "would the plan survive 100 TB": constant factors that hide
at sf0.1 (driver fast-path thresholds, LSH bucket skew, sort spill)
surface at 10× before they surface at 1000×.

Document text is replicated in a mix the dedup tier actually faces at
corpus scale: half the replicas are byte-identical (exact-dup load on
the fingerprint groupBy and connected components) and half carry a
replica-suffix (near-dup load on MinHash/SimHash banding). Embeddings
are perturbed by a tiny per-replica epsilon so ANN buckets grow without
collapsing into exact ties.

Everything is pure Catalyst (crossJoin against a literal replica range +
column arithmetic) — no Python in the loop; writing sf1 from sf0.1 takes
seconds on local[32] and the same call scales any sf to any factor.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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

# table -> columns remapped by the key-space of (table, key_col)
_KEYED: dict[str, list[tuple[str, str, str]]] = {
    # (column, key-space table, key-space column)
    "customer": [("c_custkey", "customer", "c_custkey")],
    "supplier": [("s_suppkey", "supplier", "s_suppkey")],
    "part": [("p_partkey", "part", "p_partkey")],
    "orders": [
        ("o_orderkey", "orders", "o_orderkey"),
        ("o_custkey", "customer", "c_custkey"),
    ],
    "lineitem": [
        ("l_orderkey", "orders", "o_orderkey"),
        ("l_partkey", "part", "p_partkey"),
        ("l_suppkey", "supplier", "s_suppkey"),
    ],
    "events": [
        ("event_id", "events", "event_id"),
        ("user_id", "events", "user_id"),
    ],
    "documents": [("doc_id", "documents", "doc_id")],
    "embeddings": [("vec_id", "embeddings", "vec_id")],
}

# tiny dimension tables replicated as-is (nationkey/regionkey stay shared
# so every replica's customers still join the same 25 nations — exactly
# how TPC-H scale factors behave)
_COPY = {"region", "nation"}


def _key_offsets(spark: SparkSession, src_dir: str) -> dict[tuple[str, str], int]:
    """max(key)+1 per remapped key space, one tiny agg per source table."""
    spaces = sorted({(t, c) for cols in _KEYED.values() for _, t, c in cols})
    out: dict[tuple[str, str], int] = {}
    for t, c in spaces:
        df = spark.read.parquet(os.path.join(src_dir, f"{t}.parquet"))
        out[(t, c)] = int(df.agg(F.max(c)).first()[0]) + 1
    return out


def scale_table(
    spark: SparkSession,
    src_dir: str,
    table: str,
    factor: int,
    offsets: dict[tuple[str, str], int],
) -> DataFrame:
    df = spark.read.parquet(os.path.join(src_dir, f"{table}.parquet"))
    if table in _COPY or factor <= 1:
        return df
    replicas = spark.range(factor).withColumnRenamed("id", "__r")
    wide = df.crossJoin(F.broadcast(replicas))
    r = F.col("__r")
    for col, kt, kc in _KEYED.get(table, []):
        wide = wide.withColumn(col, (F.col(col) + r * F.lit(offsets[(kt, kc)])).cast("long"))
    if table == "documents":
        # odd replicas byte-identical (exact dups), even replicas>0 get a
        # near-dup suffix — both dedup load shapes, deterministically
        wide = wide.withColumn(
            "text",
            F.when(
                (r > 0) & (r % 2 == 0),
                F.concat(F.col("text"), F.lit(" shard-"), r.cast("string")),
            ).otherwise(F.col("text")),
        ).withColumn("n_chars", F.length("text").cast("long"))
    if table == "embeddings":
        eps = (r.cast("float") * F.lit(1e-3)).cast("float")
        wide = wide.withColumn(
            "embedding", F.transform("embedding", lambda x: (x + eps).cast("float"))
        )
    return wide.drop("__r")


def scale_dataset(
    spark: SparkSession, src_dir: str, dst_dir: str, factor: int = 10
) -> None:
    """Materialize a ``factor``×-scaled copy of every test table under
    ``dst_dir`` (same ``{table}.parquet`` layout the query registry
    reads). Output partition count scales with the factor so downstream
    scans see realistic parallelism, not one fat file."""
    offsets = _key_offsets(spark, src_dir)
    for t in TABLES:
        out = os.path.join(dst_dir, f"{t}.parquet")
        df = scale_table(spark, src_dir, t, factor, offsets)
        parts = 1 if t in _COPY else min(64, max(4, factor * 2))
        df.repartition(parts).write.mode("overwrite").parquet(out)
