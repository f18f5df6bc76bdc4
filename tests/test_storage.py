"""Bucketed-layout tests: the co-located join must run with NO exchange on
the bucketed sides — the 100 TB snapshot⋈batch strategy."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from polardbx_cdc_spark.operators import storage
from polardbx_cdc_spark.session import load_table

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark):
    o = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey")
    storage.write_bucketed(o, "b_orders", ["o_orderkey"], num_buckets=8)
    storage.write_bucketed(li, "b_lineitem", ["o_orderkey"], num_buckets=8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # force the big-table path: at 100 TB neither side broadcasts —
    # bucketing must carry the join with zero shuffle exchange
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = storage.co_located_join(spark, "b_orders", "b_lineitem", ["o_orderkey"])
        plan = _plan(j)
        tree = plan.split("\n\n")[0]
        assert "Exchange" not in tree, "bucketed join still shuffles:\n" + tree
        assert "SortMergeJoin" in tree
        # and it is actually correct
        assert j.count() == 6000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_cluster_conf_shapes():
    from polardbx_cdc_spark.conf import EXAMPLE_100TB, cluster_conf

    c = cluster_conf(data_tb=100, executor_cores_total=4000)
    # 100 TB / 256 MB ≈ 400k partitions (far above the 2×cores floor)
    assert int(c["spark.sql.shuffle.partitions"]) == (100 * 1024 * 1024) // 256
    assert c["spark.sql.adaptive.skewJoin.enabled"] == "true"
    small = cluster_conf(data_tb=0.001, executor_cores_total=32)
    assert int(small["spark.sql.shuffle.partitions"]) == 64  # cores floor
    assert EXAMPLE_100TB == c


def test_zorder_interleave_and_bucket_envelopes(spark):
    """Morton-code laws: (1) the SQL interleave matches a pure-Python
    bit interleave; (2) bucketing the z-range by 2^22 fixes the top 5
    bits of each 16-bit dimension, so every bucket's (a, b) envelope is
    at most 2^11 wide per dimension — the bounded rectangles file
    skipping relies on."""
    from pyspark.sql import functions as F

    from polardbx_cdc_spark.operators.storage import zorder_expr

    df = spark.createDataFrame(
        [(a, b) for a in (0, 1, 5, 255, 1023, 65535) for b in (0, 2, 77, 4095, 65535)],
        "a long, b long",
    )
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.withColumn("z", F.expr(zorder_expr("a", "b"))).collect()
    }

    def morton(a, b):
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    assert got == {(a, b): morton(a, b) for a, b in got}

    from polardbx_cdc_spark import queries as Q

    rows = Q.queries()["layout_zorder_orders"](spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r["ck_max"] - r["ck_min"] < (1 << 11)
        assert r["dd_max"] - r["dd_min"] < (1 << 11)
