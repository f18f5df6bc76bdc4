"""MySQL → Spark type fidelity (SURVEY §1.2).

Decode surface in the reference: RowsLogBuffer.java:88-195 (typed fetch
293-392); encode: one class per type under polardbx-cdc-format/.../field/
with MakeFieldFactory.java; full-surface test table:
polardbx-cdc-test/.../random/SqlConstants.java:24-239.

The CDC frame transports values as strings (the reference transports
MySQL-serialized bytes and types them at apply time —
rpl/extractor/LogEventConvert.java:180-226); ``mysql_cast`` types a string
column per MySQL column type with the semantics the oracle checks:
unsigned widening, bigint-unsigned → decimal(20,0), zone-less DATETIME,
TIME that may exceed 24h, ENUM/SET as labels, BIT ≤ 64 as long.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_INT_SIZES = {"tinyint": 1, "smallint": 2, "mediumint": 3, "int": 4, "integer": 4, "bigint": 8}

_SIGNED = {1: T.ByteType(), 2: T.ShortType(), 3: T.IntegerType(), 4: T.IntegerType(), 8: T.LongType()}
#: unsigned: widen one size up; unsigned bigint exceeds long → decimal(20,0)
_UNSIGNED = {1: T.ShortType(), 2: T.IntegerType(), 3: T.IntegerType(), 4: T.LongType(), 8: T.DecimalType(20, 0)}


def spark_type_for(mysql_type: str) -> T.DataType:
    """Map a MySQL column type declaration to the Spark type (§1.2 table)."""
    t = mysql_type.strip().lower()
    # ZEROFILL implies UNSIGNED in MySQL even when not spelled out
    unsigned = "unsigned" in t or "zerofill" in t
    base = re.split(r"[(\s]", t, 1)[0]

    if base in _INT_SIZES:
        if base == "tinyint" and t.startswith("tinyint(1)") and not unsigned:
            return T.BooleanType()
        return (_UNSIGNED if unsigned else _SIGNED)[_INT_SIZES[base]]
    if base in ("decimal", "numeric"):
        m = re.search(r"\((\d+)\s*,\s*(\d+)\)", t)
        p, s = (int(m.group(1)), int(m.group(2))) if m else (10, 0)
        return T.DecimalType(p, s)
    if base == "float":
        return T.FloatType()
    if base in ("double", "real"):
        return T.DoubleType()
    if base == "bit":
        return T.LongType()  # BIT(<=64) — format/field/BitField.java
    if base == "timestamp":
        return T.TimestampType()
    if base == "datetime":
        return T.TimestampNTZType()  # zone-less — Datetime2Field.java
    if base == "date":
        return T.DateType()
    if base == "time":
        return T.StringType()  # may exceed 24h / be negative — RowsLogBuffer.java:135-139
    if base == "year":
        return T.ShortType()
    if base in ("enum", "set"):
        return T.StringType()  # resolved label — EnumField/SetField.java
    if base in ("binary", "varbinary", "blob", "tinyblob", "mediumblob", "longblob",
                "geometry", "point", "linestring", "polygon", "multipoint",
                "multilinestring", "multipolygon", "geometrycollection",
                "geomcollection"):
        # every spatial subtype is GEOMETRY on the wire = WKB bytes
        # (GeometryField.java; MySQL stores the subtype only in metadata)
        return T.BinaryType()
    if base in ("char", "varchar", "text", "tinytext", "mediumtext", "longtext", "json"):
        return T.StringType()
    raise ValueError(f"unmapped MySQL type: {mysql_type}")


def mysql_cast(col: Column, mysql_type: str) -> Column:
    """Cast a string-transported value to its faithful Spark type."""
    target = spark_type_for(mysql_type)
    t = mysql_type.strip().lower()
    if isinstance(target, T.BooleanType):
        return (col.cast("int") != 0).cast("boolean")
    if isinstance(target, T.BinaryType):
        # hex-transported binary payloads
        return F.unhex(col)
    if isinstance(target, T.LongType) and t.startswith("bit"):
        return col.cast("long")
    if isinstance(target, T.TimestampNTZType):
        return col.cast("timestamp_ntz")
    return col.cast(target)


#: the condensed all-types surface (FIXTURES.md §4) — column name → MySQL type
ALL_TYPES_COLUMNS: dict[str, str] = {
    "id": "bigint",
    "c_bool": "tinyint(1)",
    "c_tinyint": "tinyint",
    "c_smallint": "smallint",
    "c_int": "int",
    "c_bigint": "bigint",
    "c_utinyint": "tinyint unsigned",
    "c_usmallint": "smallint unsigned",
    "c_uint": "int unsigned",
    "c_ubigint": "bigint unsigned",
    "c_bit": "bit(64)",
    "c_decimal": "decimal(10,3)",
    "c_float": "float",
    "c_double": "double",
    "c_date": "date",
    "c_datetime": "datetime(3)",
    "c_timestamp": "timestamp(3)",
    "c_time": "time(3)",
    "c_year": "year",
    "c_char": "char(32)",
    "c_varchar": "varchar(255)",
    "c_text": "text",
    "c_enum": "enum('a','b','c')",
    "c_set": "set('x','y','z')",
    "c_binary": "binary(16)",
    "c_blob": "blob",
    "c_json": "json",
}
