"""Similarity-search internal consistency: the three ANN paths against the
exact baseline, and the Arrow/NumPy path against the expression path."""

from __future__ import annotations

from polardbx_cdc_spark.functions import similarity
from polardbx_cdc_spark.session import load_table

SF = "/root/testdata/sf0.01"
QIDS = list(range(10))


def _pairs(rows):
    return {(r["query_id"], r["rank"], r["nbr_id"]) for r in rows}


def test_pandas_matmul_path_equals_expression_path(spark):
    """Same exact algorithm, two engines (Catalyst expr vs NumPy BLAS):
    identical ranked neighbors; sims equal to 1e-6 (rounding grain)."""
    e = load_table(spark, SF, "embeddings")
    expr = similarity.cosine_topk(e, QIDS, k=5).collect()
    pnd = similarity.cosine_topk_pandas(e, QIDS, k=5).collect()
    assert _pairs(expr) == _pairs(pnd)
    sims_e = {(r["query_id"], r["nbr_id"]): r["cos_sim"] for r in expr}
    sims_p = {(r["query_id"], r["nbr_id"]): r["cos_sim"] for r in pnd}
    for key in sims_e:
        assert abs(sims_e[key] - sims_p[key]) <= 1e-6, key


def test_lsh_bucket_impls_agree(spark):
    """Arrow (BLAS matmul) and Catalyst-expression bucket assignment must
    match exactly — the oracle replays the expression form, so a sign
    divergence (only possible if some |dot| < ~1e-13) would silently break
    the hash check. Bit-equality here is the tripwire."""
    e = load_table(spark, SF, "embeddings")
    arrow = {
        (r["vec_id"], r["bucket"])
        for r in similarity.lsh_buckets(e, 4, 64, "embedding", 8, impl="arrow")
        .select("vec_id", "bucket")
        .collect()
    }
    expr = {
        (r["vec_id"], r["bucket"])
        for r in similarity.lsh_buckets(e, 4, 64, "embedding", 8, impl="expr")
        .select("vec_id", "bucket")
        .collect()
    }
    assert arrow == expr and len(arrow) > 0


def test_int8_quantization_bounds_and_fidelity(spark):
    """Quantized values must fit int8 ([-127, 127]) and the dequantized
    vectors must keep cosine ≈ 1 against the originals (int8 symmetric
    quantization of 64-dim unit-ish vectors loses <0.5% cosine)."""
    from pyspark.sql import functions as F

    e = load_table(spark, SF, "embeddings")
    q = similarity.quantize_int8(e)
    stats = q.select(
        F.max(F.array_max(F.transform("qvec", lambda x: F.abs(x)))).alias("q_abs_max"),
    ).collect()[0]
    assert stats["q_abs_max"] <= 127
    d = similarity.dequantize(q)  # appends dvec; original embedding rides the row
    worst = (
        d.select(similarity.cosine(F.col("embedding"), F.col("dvec")).alias("c"))
        .agg(F.min("c"))
        .collect()[0][0]
    )
    assert worst >= 0.995, f"quantization lost too much fidelity: {worst}"


def test_ann_paths_recall_floor(spark):
    """IVF and multi-table LSH must each keep recall@5 above a floor on the
    real embeddings (guards against silently broken bucketing)."""
    e = load_table(spark, SF, "embeddings")
    exact = {(r["query_id"], r["nbr_id"]) for r in similarity.cosine_topk(e, QIDS, k=5).collect()}
    ivf = {(r["query_id"], r["nbr_id"]) for r in similarity.ivf_topk(e, QIDS, k=5).collect()}
    lsh = {(r["query_id"], r["nbr_id"]) for r in similarity.lsh_bucket_topk(e, QIDS, k=5).collect()}
    assert len(exact & ivf) / len(exact) >= 0.4, "IVF recall collapsed"
    assert len(exact & lsh) / len(exact) >= 0.4, "LSH recall collapsed"


def test_near_dup_default_is_lsh_with_recall_floor(spark):
    """The DEFAULT near-dup path must be LSH-bucketed (no all-pairs join
    reachable by accident) and keep recall >= 0.9 vs the exact form on a
    bounded corpus."""
    from polardbx_cdc_spark.functions import similarity
    from polardbx_cdc_spark.session import load_table

    e = load_table(spark, SF, "embeddings")
    exact = {
        (r["id_a"], r["id_b"])
        for r in similarity.embed_near_dup_pairs(
            e, threshold=0.3, max_id=300, exact=True
        ).collect()
    }
    # dial matched to the low test threshold (near-orthogonal synthetic
    # corpus): p(cos .3) ≈ 0.60/plane → 2 planes × 10 tables ≈ 0.99 recall
    approx = {
        (r["id_a"], r["id_b"])
        for r in similarity.embed_near_dup_pairs(
            e, threshold=0.3, max_id=300, num_planes=2, num_tables=10
        ).collect()
    }
    assert exact, "fixture produced no exact near-dup pairs"
    assert approx <= exact  # LSH candidates are a subset, same cosine filter
    assert len(approx & exact) / len(exact) >= 0.9, (len(approx), len(exact))


def test_lsh_buckets_null_embedding_parity(spark):
    """Null vectors: both impls emit a NULL bucket (never the all-zeros
    cell, never a ragged-array crash), single- and multi-table."""
    from polardbx_cdc_spark.functions import similarity

    df = spark.createDataFrame(
        [(1, [0.5] * 64), (2, None), (3, [-0.25] * 64)],
        "vec_id long, embedding array<double>",
    )
    for tables in (1, 2):
        got = {}
        for impl in ("expr", "arrow"):
            got[impl] = sorted(
                (r["vec_id"], r["bucket"])
                for r in similarity.lsh_buckets(df, impl=impl, num_tables=tables).select(
                    "vec_id", "bucket"
                ).collect()
            )
        assert got["expr"] == got["arrow"]
        null_buckets = [b for v, b in got["expr"] if v == 2]
        assert null_buckets == [None] * tables
