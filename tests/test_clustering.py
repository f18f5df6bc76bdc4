"""Laws and plan gates for quantized Lloyd k-means (functions/clustering)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from polardbx_cdc_spark.functions import clustering


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_assignment_is_map_only(spark):
    """The per-iteration assignment pass must be a pure scan: no shuffle,
    no Python — the centroids live inside one Catalyst expression."""
    q = clustering.quantize_vectors(
        _vecs(spark, [(i, [float(i), 1.0 - i]) for i in range(6)])
    )
    cents = [(0, [0, 1000]), (1, [5000, -4000])]
    plan = _plan_of(clustering._assign(q, cents))
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan and "ArrowEval" not in plan, plan


def test_kmeans_recovers_separated_clusters(spark):
    """Two well-separated blobs → exactly the 2-blob partition, any seed."""
    rows = [(i, [0.1 + 0.001 * i, 0.1]) for i in range(5)]
    rows += [(10 + i, [0.9, 0.9 - 0.001 * i]) for i in range(5)]
    out = clustering.kmeans_fit_assign(_vecs(spark, rows), k=2, n_iter=3).collect()
    by_cluster: dict[int, set[int]] = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["vec_id"])
    assert sorted(map(sorted, by_cluster.values())) == [
        [0, 1, 2, 3, 4],
        [10, 11, 12, 13, 14],
    ]
    assert all(r["dist"] >= 0 for r in out)


def test_kmeans_deterministic_across_runs(spark):
    rows = [(i, [((i * 37) % 19) / 19.0, ((i * 11) % 23) / 23.0]) for i in range(40)]
    a = sorted(map(tuple, clustering.kmeans_fit_assign(_vecs(spark, rows), k=4).collect()))
    b = sorted(map(tuple, clustering.kmeans_fit_assign(_vecs(spark, rows), k=4).collect()))
    assert a == b


def test_empty_cluster_keeps_previous_centroid(spark):
    """k=3 over 2 tight blobs: one centroid goes memberless mid-iteration
    and must survive (not NaN/crash); every point still gets assigned."""
    rows = [(i, [0.0, 0.0]) for i in range(3)] + [(10 + i, [1.0, 1.0]) for i in range(3)]
    out = clustering.kmeans_fit_assign(_vecs(spark, rows), k=3, n_iter=3)
    assert out.count() == 6
    assert out.where(F.col("cluster_id").isNull()).count() == 0


def test_quantize_matches_negative_floor_division():
    """Driver-side integer mean must floor (Python //), matching the
    oracle's mod-trick — lock the negative-sum case."""
    s, n = -7, 2
    assert s // n == (s - ((s % n + n) % n)) // n == -4


def test_purity_bounds_and_tiebreak(spark):
    assigned = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0), (4, 1), (5, 1)], "vec_id long, cluster_id int"
    ).select("vec_id", "cluster_id", F.lit(0).cast("long").alias("dist"))
    labeled = spark.createDataFrame(
        # cluster 0: labels 7,7,3 → majority 7; cluster 1: tie 2 vs 5 → smaller label 2
        [(1, 7), (2, 7), (3, 3), (4, 2), (5, 5)],
        "vec_id long, label int",
    )
    rows = {r["cluster_id"]: r for r in clustering.cluster_purity(assigned, labeled).collect()}
    assert rows[0]["majority_label"] == 7 and rows[0]["purity_bp"] == 6666
    assert rows[1]["majority_label"] == 2 and rows[1]["purity_bp"] == 5000
    assert all(0 <= r["purity_bp"] <= 10000 for r in rows.values())


def _blob_vecs(spark, n_blobs=4, per_blob=12, dim=8):
    """Well-separated blobs: blob b lives at corner b with ±0.01 jitter."""
    rows = []
    for b in range(n_blobs):
        base = [1.0 if (b >> d) & 1 else -1.0 for d in range(dim)]
        for j in range(per_blob):
            rows.append(
                (b * 100 + j, [v + 0.01 * ((j + d) % 3 - 1) for d, v in enumerate(base)])
            )
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_pq_encode_is_map_only(spark):
    from polardbx_cdc_spark.functions import clustering

    vecs = _blob_vecs(spark)
    books = clustering.pq_train(vecs, m=2, k=4, n_iter=1, train_limit=32)
    plan = _plan_of(clustering.pq_encode(vecs, books))
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan and "ArrowEval" not in plan, plan


def test_pq_codes_in_range_and_deterministic(spark):
    from polardbx_cdc_spark.functions import clustering

    vecs = _blob_vecs(spark)
    books = clustering.pq_train(vecs, m=4, k=4, n_iter=2, train_limit=48)
    a = sorted((r["vec_id"], tuple(r["codes"])) for r in clustering.pq_encode(vecs, books).collect())
    b = sorted((r["vec_id"], tuple(r["codes"])) for r in clustering.pq_encode(vecs, books).collect())
    assert a == b
    assert all(len(codes) == 4 and all(0 <= c < 4 for c in codes) for _, codes in a)


def test_pq_topk_recalls_same_blob(spark):
    """On separated blobs every ADC top-1 neighbor must come from the
    query's own blob — the recall law PQ compression must preserve."""
    from polardbx_cdc_spark.functions import clustering

    vecs = _blob_vecs(spark)
    books = clustering.pq_train(vecs, m=2, k=8, n_iter=3, train_limit=48)
    qids = [0, 100, 200, 300]
    top = clustering.pq_topk(vecs, books, qids, k=3).collect()
    assert {r["query_id"] for r in top} == set(qids)
    for r in top:
        assert r["nbr_id"] // 100 == r["query_id"] // 100, r


def test_pq_and_kmeans_input_guards(spark):
    import pytest

    from polardbx_cdc_spark.functions import clustering

    vecs = _blob_vecs(spark, dim=8)
    with pytest.raises(ValueError, match="not divisible"):
        clustering.pq_train(vecs, m=3)
    with pytest.raises(ValueError, match="exceeds corpus"):
        clustering.kmeans_fit_assign(vecs.limit(2), k=5)


def test_arrow_assignment_bit_identical_to_expr(spark):
    """The large-k broadcast+matmul path must produce exactly the same
    (cluster_id, dist) as the Catalyst Literal path — integer math both
    ways, ties on the lowest cid."""
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(120)
    ]
    df = _vecs(spark, rows)
    a = sorted(map(tuple, clustering.kmeans_fit_assign(
        df, k=8, n_iter=2, assign_mode="expr").collect()))
    b = sorted(map(tuple, clustering.kmeans_fit_assign(
        df, k=8, n_iter=2, assign_mode="arrow").collect()))
    assert a == b


def test_arrow_assignment_handles_ties_and_nulls_free_path(spark):
    """Duplicate centroids (exact tie) → lowest cluster id wins on both
    paths."""
    q = clustering.quantize_vectors(_vecs(spark, [(1, [0.5, 0.5])]))
    cents = [(3, [500, 500]), (1, [500, 500]), (2, [0, 0])]
    expr_row = clustering._assign(q, cents).collect()[0]
    arrow_row = clustering._assign_arrow(q, cents).collect()[0]
    assert expr_row["cluster_id"] == arrow_row["cluster_id"] == 1
    assert expr_row["dist"] == arrow_row["dist"] == 0


def test_large_k_auto_switches_to_arrow(spark):
    """k ≥ LARGE_K_THRESHOLD runs the broadcast path end-to-end (smoke:
    80 clusters over 200 vectors, plan stays O(1) in k)."""
    import random

    rng = random.Random(11)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(4)]) for i in range(200)]
    out = clustering.kmeans_fit_assign(_vecs(spark, rows), k=80, n_iter=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEval" in plan or "MapInPandas" in plan, plan
    rows_out = out.collect()
    assert len(rows_out) == 200
    assert len({r["cluster_id"] for r in rows_out}) > 40
