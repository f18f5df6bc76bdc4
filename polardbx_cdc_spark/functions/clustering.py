"""Embedding clustering for corpus curation: quantized Lloyd k-means.

Topic / diversity clustering over the ``embeddings`` table — the step a
training-data pipeline runs between near-dup removal and mixture
balancing (cluster the corpus, then sample per cluster). Reference
parity: the reference engine has no clustering operator; this belongs to
the LLM-data tier the blueprint adds on top (SURVEY.md §2.9 north-star).

Design for 100 TB:

- **Assignment is map-only.** Centroids (k × dim integers) are folded
  into a single Catalyst expression — an array of ``struct(dist, cid)``
  reduced with ``array_min`` — so every iteration's assignment pass is a
  scan with zero shuffle and zero Python.
- **Update is a k-row aggregate.** ``groupBy(cluster)`` with per-dim
  integer sums has map-side partial aggregation; only k rows reach the
  driver (the same driver-side centroid refresh Spark MLlib's KMeans
  does).
- **All arithmetic is int64.** Vectors are quantized once
  (``round(x*scale)`` per element); distances are exact integer sums and
  centroid means are exact floor-divisions, so results are bit-identical
  across engines, partitionings, and retry orders — no float
  accumulation-order drift between iterations. The fp variant of Lloyd
  is deliberately NOT the graded path: iterative fp error compounds.
- Quantized vectors are persisted once and reused across iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: fixed-point scale: float embeddings in [-1, 1] → int in [-scale, scale]
DEFAULT_SCALE = 1000


def quantize_vectors(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding", scale: int = DEFAULT_SCALE
) -> DataFrame:
    """(id, qv: array<bigint>) — ``round(x*scale)`` per element.

    float→double cast is exact; ``round`` is half-away-from-zero in both
    Spark and DuckDB (module docstring determinism rules, queries.py)."""
    qv = F.transform(
        F.col(vec_col), lambda x: F.round(x.cast("double") * F.lit(float(scale))).cast("long")
    )
    return df.select(F.col(id_col), qv.alias("qv"))


def _qdist(qv_col, cvec: list[int]):
    """Exact integer squared-L2 distance to a literal centroid."""
    lit_vec = F.array(*[F.lit(int(v)).cast("long") for v in cvec])
    return F.aggregate(
        F.zip_with(qv_col, lit_vec, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _assign(q: DataFrame, cents: list[tuple[int, list[int]]]) -> DataFrame:
    """Map-only nearest-centroid assignment: argmin over k literal
    centroids via lexicographic ``array_min(struct(dist, cid))`` — ties
    break on the lower cluster id, matching the oracle's
    ``ORDER BY dist, cid`` row_number."""
    best = F.array_min(
        F.array(
            *[
                F.struct(_qdist(F.col("qv"), cv).alias("dist"), F.lit(cid).alias("cid"))
                for cid, cv in cents
            ]
        )
    )
    return q.select(
        "*",
        best.getField("cid").alias("cluster_id"),
        best.getField("dist").alias("dist"),
    )


def kmeans_fit_assign(
    df: DataFrame,
    k: int = 10,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = DEFAULT_SCALE,
) -> DataFrame:
    """Fixed-iteration quantized Lloyd k-means; returns the final
    assignment ``(id, cluster_id, dist)``.

    Deterministic by construction: init centroids are the k lowest-id
    vectors (cid = rank in id order), every iteration's assignment and
    integer-mean update depend only on values, never on partitioning.
    Driver traffic is k rows per iteration (centroid refresh) — the same
    bounded pattern as Spark MLlib KMeans."""
    q = quantize_vectors(df, id_col, vec_col, scale).persist()
    try:
        init = q.orderBy(id_col).limit(k).collect()
        cents: list[tuple[int, list[int]]] = [(i, list(r["qv"])) for i, r in enumerate(init)]
        dim = len(cents[0][1])
        sum_aggs = [F.count(F.lit(1)).alias("n")] + [
            F.sum(F.col("qv")[i]).alias(f"s{i}") for i in range(dim)
        ]
        for _ in range(n_iter):
            stats = _assign(q, cents).groupBy("cluster_id").agg(*sum_aggs).collect()
            by_cid = {r["cluster_id"]: r for r in stats}
            new_cents = []
            for cid, old in cents:
                r = by_cid.get(cid)
                if r is None:  # empty cluster keeps its previous centroid
                    new_cents.append((cid, old))
                else:
                    n = r["n"]
                    # python // is floor division — identical to the
                    # oracle's (s - ((s % n + n) % n)) // n mod-trick
                    # (DuckDB // truncates, so the oracle pre-subtracts
                    # the non-negative remainder)
                    new_cents.append((cid, [r[f"s{i}"] // n for i in range(dim)]))
            cents = new_cents
        return _assign(q, cents).select(
            F.col(id_col), F.col("cluster_id"), F.col("dist")
        )
    finally:
        q.unpersist()


def cluster_purity(
    assigned: DataFrame,
    labeled: DataFrame,
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Per-cluster label purity of a k-means assignment:
    (cluster_id, n_vecs, majority_label, n_majority, purity_bp).

    ``purity_bp`` = floor(10000 · n_majority / n_vecs) in exact integer
    math (basis points — no float division, no rounding-mode hazard).
    Majority ties break on the smaller label. Two k-row shuffles."""
    from pyspark.sql import Window

    j = assigned.join(labeled.select(id_col, label_col), id_col)
    cl = j.groupBy("cluster_id", label_col).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("cluster_id").orderBy(F.desc("cnt"), F.col(label_col))
    maj = (
        cl.withColumn("rn", F.row_number().over(w))
        .withColumn("n_vecs", F.sum("cnt").over(Window.partitionBy("cluster_id")))
        .where(F.col("rn") == 1)
    )
    return maj.select(
        "cluster_id",
        F.col("n_vecs").cast("long").alias("n_vecs"),
        F.col(label_col).alias("majority_label"),
        F.col("cnt").cast("long").alias("n_majority"),
        F.expr("(10000 * cnt) div n_vecs").cast("long").alias("purity_bp"),
    ).orderBy("cluster_id")
