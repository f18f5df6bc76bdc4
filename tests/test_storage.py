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
