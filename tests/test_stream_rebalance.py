"""Binlog-X rebalance execution: cut-over routing semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from polardbx_cdc_spark.model import derive_cdc_stream
from polardbx_cdc_spark.operators import routing

SF = "/root/testdata/sf0.001"
_SWITCH = "0001705276800000000" + "0" * 29  # mid-stream (Jan 15)


def test_rebalance_cutover_alignment_and_no_double_delivery(spark):
    cdc = derive_cdc_stream(spark, SF)
    old_cfg = routing.StreamRoutingConfig(stream_count=2)
    new_cfg = routing.StreamRoutingConfig(stream_count=4)
    out = routing.apply_rebalance(cdc, old_cfg, new_cfg, _SWITCH).persist()
    try:
        # phases partition exactly at the switch TSO
        assert out.filter((F.col("phase") == "pre") & (F.col("tso") >= _SWITCH)).count() == 0
        assert out.filter((F.col("phase") == "post") & (F.col("tso") < _SWITCH)).count() == 0
        # per key and phase: exactly ONE stream (no double delivery)
        multi = (
            out.groupBy("db", "tbl", "pk", "phase")
            .agg(F.countDistinct("stream_id").alias("n"))
            .filter(F.col("n") > 1)
        )
        assert multi.count() == 0
        # phase routing agrees with the phase's own config applied alone
        pre_alone = routing.assign_stream(cdc.filter(F.col("tso") < _SWITCH), old_cfg)
        post_alone = routing.assign_stream(cdc.filter(F.col("tso") >= _SWITCH), new_cfg)
        for alone, phase in ((pre_alone, "pre"), (post_alone, "post")):
            a = alone.select("tso", "stream_id")
            b = out.filter(F.col("phase") == phase).select("tso", "stream_id")
            assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
        # the migration actually moves traffic (2 → 4 streams)
        assert out.filter(F.col("migrated") & (F.col("phase") == "post")).count() > 0
        # every event routed exactly once overall
        assert out.count() == cdc.count()
    finally:
        out.unpersist()


def test_rebalance_plan_matches_execution_census(spark):
    """The reviewed plan's per-cell event counts must equal what the
    execution actually migrates post-switch (plan computed over the
    post-switch slice)."""
    cdc = derive_cdc_stream(spark, SF)
    old_cfg = routing.StreamRoutingConfig(stream_count=2)
    new_cfg = routing.StreamRoutingConfig(stream_count=4)
    post = cdc.filter(F.col("tso") >= _SWITCH)
    plan = {
        (r["old_stream"], r["new_stream"]): r["n_events"]
        for r in routing.rebalance_plan(post, old_cfg, new_cfg).collect()
    }
    ex = routing.apply_rebalance(cdc, old_cfg, new_cfg, _SWITCH)
    got = {
        (r["old_stream"], r["new_stream"]): r["n"]
        for r in routing.assign_stream(post, old_cfg)
        .withColumnRenamed("stream_id", "old_stream")
        .join(
            ex.filter(F.col("phase") == "post").select("tso", "stream_id"),
            "tso",
        )
        .groupBy("old_stream", F.col("stream_id").alias("new_stream"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == {k: v for k, v in plan.items() if v > 0}
