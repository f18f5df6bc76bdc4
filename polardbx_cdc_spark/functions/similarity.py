"""Similarity search over the ``embeddings`` table (array<float> column).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Query set × corpus join with a JVM-side dot product (zip_with +
  aggregate, whole-stage codegen; no Python). At scale the query side is
  broadcast (it is small by construction) so the corpus is scanned once
  with no shuffle; top-k per query is a partial `min_by`-style aggregation.
- ``lsh_bucket_topk``: the scale path — random-hyperplane LSH buckets
  (deterministic seed-derived planes), candidates only within a bucket.
  At 100 TB this turns scan×queries into bucketed joins.

Float handling: inputs cast float→double (exact), accumulation in double,
output rounded — keeps the DuckDB oracle bit-compatible.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-order dot product in double precision (matches the
    oracle's list_dot_product evaluation order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    da, db = _as_double(a), _as_double(b)
    return dot(da, db) / (norm(da) * norm(db))


def cosine_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query id. The query side is a
    filtered (tiny) broadcast; ranking ties break on neighbor id so results
    are fully deterministic."""
    corpus = df.select(F.col(id_col).alias("nbr_id"), F.col(vec_col).alias("nbr_vec"))
    queries = df.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    scored = (
        corpus.join(F.broadcast(queries), F.col("nbr_id") != F.col("query_id"))
        .select(
            "query_id",
            "nbr_id",
            F.round(cosine(F.col("q_vec"), F.col("nbr_vec")), 6).alias("cos_sim"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "nbr_id", "cos_sim")
    )


def _hyperplanes(num_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: components in [-1, 1) derived
    from md5(plane, dim) — reproducible everywhere, no RNG state."""
    planes = []
    for p in range(num_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:8]
            row.append((int(h, 16) / 2**31) - 1.0)
        planes.append(row)
    return planes


def lsh_buckets(
    df: DataFrame,
    num_planes: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH: bucket id = sign-bit string of ``num_planes``
    projections. One projection pass; bucketing key for ANN joins."""
    planes = _hyperplanes(num_planes, dim)
    v = _as_double(F.col(vec_col))
    bits = []
    for row in planes:
        plane = F.array(*[F.lit(c) for c in row])
        bits.append(F.when(dot(v, plane) >= 0, F.lit("1")).otherwise(F.lit("0")))
    return df.withColumn("bucket", F.concat(*bits))


def lsh_bucket_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 5,
    num_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.
    Same output shape as ``cosine_topk`` (may differ in recall — that is the
    accuracy/throughput dial)."""
    bucketed = lsh_buckets(df, num_planes, dim, vec_col)
    corpus = bucketed.select(
        F.col(id_col).alias("nbr_id"), F.col(vec_col).alias("nbr_vec"), F.col("bucket")
    )
    queries = bucketed.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"), F.col("bucket").alias("q_bucket")
    )
    scored = corpus.join(
        F.broadcast(queries),
        (F.col("bucket") == F.col("q_bucket")) & (F.col("nbr_id") != F.col("query_id")),
    ).select(
        "query_id",
        "nbr_id",
        F.round(cosine(F.col("q_vec"), F.col("nbr_vec")), 6).alias("cos_sim"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "nbr_id", "cos_sim")
    )
