"""Laws for the stress scale-up (scaleup.py): replication must preserve
referential integrity and scale cardinalities linearly — otherwise the
sf1 stress numbers measure a degenerate dataset, not the engine."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polardbx_cdc_spark import scaleup

FACTOR = 3


@pytest.fixture(scope="module")
def scaled(spark, sf_dir, tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("scaled"))
    scaleup.scale_dataset(spark, sf_dir, dst, FACTOR)
    return dst


def _cnt(spark, d, t):
    return spark.read.parquet(f"{d}/{t}.parquet").count()


def test_cardinalities_scale_linearly(spark, sf_dir, scaled):
    for t in ["customer", "orders", "lineitem", "events", "documents", "embeddings"]:
        assert _cnt(spark, scaled, t) == FACTOR * _cnt(spark, sf_dir, t), t
    # dims are shared, not replicated
    for t in ["region", "nation"]:
        assert _cnt(spark, scaled, t) == _cnt(spark, sf_dir, t), t


def test_keys_stay_unique(spark, scaled):
    for t, k in [
        ("customer", "c_custkey"),
        ("orders", "o_orderkey"),
        ("part", "p_partkey"),
        ("events", "event_id"),
        ("documents", "doc_id"),
        ("embeddings", "vec_id"),
    ]:
        df = spark.read.parquet(f"{scaled}/{t}.parquet")
        assert df.count() == df.select(k).distinct().count(), t


def test_foreign_keys_resolve(spark, sf_dir, scaled):
    """Every scaled lineitem still joins an order, every order a customer
    — and the join result scales by exactly FACTOR (no fan-out change)."""
    o = spark.read.parquet(f"{scaled}/orders.parquet")
    li = spark.read.parquet(f"{scaled}/lineitem.parquet")
    c = spark.read.parquet(f"{scaled}/customer.parquet")
    base_li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    joined = li.join(o, li.l_orderkey == o.o_orderkey).join(c, o.o_custkey == c.c_custkey)
    assert joined.count() == FACTOR * base_li
    # nation dim still covers every customer
    n = spark.read.parquet(f"{scaled}/nation.parquet")
    uncovered = c.join(n, c.c_nationkey == n.n_nationkey, "left_anti").count()
    assert uncovered == 0


def test_document_dup_mix(spark, sf_dir, scaled):
    """Odd replicas are byte-identical (exact-dup load); even replicas>0
    carry a near-dup suffix — so distinct texts = base * (1 + evens>0)."""
    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs = spark.read.parquet(f"{scaled}/documents.parquet")
    n_even_gt0 = len([r for r in range(1, FACTOR) if r % 2 == 0])
    base_distinct = base.select("text").distinct().count()
    assert docs.select("text").distinct().count() == base_distinct * (1 + n_even_gt0)
    assert docs.filter(F.length("text") != F.col("n_chars")).count() == 0


def test_embeddings_perturbed_not_tied(spark, scaled):
    emb = spark.read.parquet(f"{scaled}/embeddings.parquet")
    # per-replica epsilon => no two replicas share an identical vector
    assert emb.select("embedding").distinct().count() == emb.count()
