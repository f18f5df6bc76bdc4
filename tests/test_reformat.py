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
        reformat.jvm_charset("no_such_charset")


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


# One representable sample per MySQL charset the table covers
# (CharsetConversion.java:38-110 surface). Samples chosen so the charset's
# own repertoire is exercised, not just ASCII.
_CHARSET_SAMPLES = {
    "utf8": "héllo 世界", "utf8mb3": "héllo", "utf8mb4": "héllo 世界 🤖",
    "ucs2": "héllo 世界", "utf16": "héllo 世界", "utf16le": "héllo 世界",
    "utf32": "héllo 世界",
    "latin1": "café", "dec8": "café", "hp8": "café", "swe7": "abc123",
    "armscii8": "abc123", "latin2": "příliš žluťoučký",
    "latin5": "ğüşıö", "latin7": "ąčęėįš", "greek": "αβγδε", "hebrew": "שלום",
    "ascii": "abc123", "koi8r": "Привет", "koi8u": "Привіт", "tis620": "ไทย",
    "cp850": "café", "cp852": "příliš", "cp866": "Привет",
    "cp1250": "příliš", "cp1251": "Привет", "cp1256": "مرحبا", "cp1257": "ąčę",
    "macce": "příliš", "macroman": "café",
    "gbk": "中文测试", "gb2312": "中文测试", "gb18030": "中文测试€",
    "big5": "中文測試", "sjis": "日本語テスト", "cp932": "日本語テスト",
    "ujis": "日本語テスト", "euckr": "한국어",
    "binary": "caf\u00e9",
}


def test_full_charset_table_round_trips(spark):
    """Every charset in MYSQL_TO_JVM_CHARSET must exist in the JVM and
    round-trip its own sample text (encode→decode identity), matching the
    reference's CharsetConversion surface."""
    assert set(_CHARSET_SAMPLES) == set(reformat.MYSQL_TO_JVM_CHARSET)
    reformat.ensure_charsets(spark)
    cols = []
    for cs, sample in _CHARSET_SAMPLES.items():
        jvm = reformat.jvm_charset(cs)
        cols.append(
            (F.decode(F.encode(F.lit(sample), jvm), jvm) == F.lit(sample)).alias(cs)
        )
    row = spark.range(1).select(*cols).collect()[0]
    bad = [cs for cs in _CHARSET_SAMPLES if not row[cs]]
    assert not bad, f"charsets failed round-trip: {bad}"


def test_recode_gbk_mojibake(spark):
    """The classic repair: GBK bytes mis-decoded as latin1 → recode
    recovers the original Chinese text."""
    reformat.ensure_charsets(spark)
    original = "中文测试"
    mojibake = original.encode("gbk").decode("latin-1")
    got = (
        spark.createDataFrame([(mojibake,)], "v string")
        .select(reformat.recode(F.col("v"), "latin1", "gbk").alias("fixed"))
        .collect()[0]["fixed"]
    )
    assert got == original
