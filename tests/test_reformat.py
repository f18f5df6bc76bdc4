"""Row-event reformation: charset fallback/repair and topology-record
repair (RowEventReformator.java:344-370; JsonRepairUtil.java)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polardbx_cdc_spark.operators import reformat


def test_resolve_charset_fallback_chain():
    assert reformat.resolve_charset("latin1", "utf8mb4") == "latin1"
    assert reformat.resolve_charset(None, "utf8mb4") == "utf8mb4"
    assert reformat.resolve_charset("", "  ", "ascii") == "ascii"


def test_recode_fixes_latin1_mojibake(spark):
    """UTF-8 bytes mis-decoded as latin1 → recode restores the true text."""
    original = "中文café"
    mojibake = original.encode("utf-8").decode("latin-1")
    df = spark.createDataFrame([(mojibake,)], "v string")
    got = df.select(reformat.recode(F.col("v"), "latin1", "utf8mb4").alias("v")).collect()[0]["v"]
    assert got == original


def test_repair_type_mismatch_redecodes_and_casts(spark):
    """Physical bytes + logical INT declaration → decoded text cast to int
    (the makField4TypeMisMatch path)."""
    df = spark.createDataFrame([(b"12345",), (b"-7",)], "raw binary")
    got = sorted(
        r["v"]
        for r in df.select(
            reformat.repair_type_mismatch(F.col("raw"), "int", "utf8").alias("v")
        ).collect()
    )
    assert got == [-7, 12345]


def test_undecodable_charset_raises():
    with pytest.raises(ValueError, match="undecodable"):
        reformat.jvm_charset("gb18030")


def test_repair_topology_record_rebuilds_from_registry():
    from polardbx_cdc_spark.ddl import parse_ddl
    from polardbx_cdc_spark.meta import LogicalTopology, SchemaRegistry

    reg = SchemaRegistry()
    reg.apply_sql("0" * 48, "CREATE TABLE app.orders (id BIGINT PRIMARY KEY, v DOUBLE)")
    topo = LogicalTopology()
    topo.add_shards("app", "orders", ["db0.orders_00", "db1.orders_01"])

    out = reformat.repair_topology_record(
        {"table_name": "orders"}, reg, topo, "app", "orders"
    )
    assert out["phy_tables"] == ["db0.orders_00", "db1.orders_01"]
    # the rendered CREATE round-trips through the DDL parser
    ops = parse_ddl(out["create_sql"])
    assert ops[0]["columns"] == ["id", "v"] and ops[0]["pks"] == ["id"]

    with pytest.raises(KeyError, match="cannot repair"):
        reformat.repair_topology_record(None, reg, topo, "app", "missing")
