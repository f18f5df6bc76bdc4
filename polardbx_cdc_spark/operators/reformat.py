"""Row-event reformation: charset resolution, mis-decode repair, and
topology-record repair.

Reference:
- charset fallback chain + physical/logical type-mismatch re-decode:
  RowEventReformator.getCharset / resolveDataTypeNotMatch
  (polardbx-cdc-task/.../reformat/RowEventReformator.java:344-370) — a
  column's charset falls back column → table → default, and a value whose
  physical type disagrees with the logical declaration is re-decoded from
  its raw bytes under the resolved charset, then re-made as the logical
  type (MakeFieldFactory.makField4TypeMisMatch).
- broken topology-record repair: JsonRepairUtil.repair
  (polardbx-cdc-rpl/.../filter/JsonRepairUtil.java) — a CREATE_TABLE DDL
  record with damaged/missing topology JSON is rebuilt from authoritative
  metadata (live topology + SHOW CREATE TABLE). Here the authoritative
  sources are the SchemaRegistry and LogicalTopology.

All column-level transforms are pure Catalyst expressions (encode/decode
are JVM built-ins) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: MySQL charset name → JVM charset name, covering the charset surface the
#: reference enumerates (CharsetConversion.java:38-110, CollationCharset).
#: Spark's non-legacy encode/decode only accept the UTF/ASCII/8859-1 core;
#: everything else needs ``spark.sql.legacy.javaCharsets=true`` — set by
#: ``session.get_spark`` and runtime-settable via ``ensure_charsets``.
#: Deliberate divergences from the reference's table (documented, not
#: copied): MySQL latin5 is Turkish → ISO-8859-9 and latin7 is Baltic →
#: ISO-8859-13 (the reference maps them to 8859-5/8859-7, which are
#: Cyrillic/Greek — a bug we don't reproduce); ``binary`` maps to
#: ISO-8859-1 because it is byte-preserving (reference uses US-ASCII,
#: which corrupts high bytes on round-trip).
MYSQL_TO_JVM_CHARSET = {
    # unicode
    "utf8": "UTF-8",
    "utf8mb3": "UTF-8",
    "utf8mb4": "UTF-8",
    "ucs2": "UTF-16BE",
    "utf16": "UTF-16BE",
    "utf16le": "UTF-16LE",
    "utf32": "UTF-32BE",
    # western / single-byte
    "latin1": "ISO-8859-1",
    "dec8": "ISO-8859-1",
    "hp8": "ISO-8859-1",
    "swe7": "ISO-8859-1",
    "armscii8": "ISO-8859-1",
    "latin2": "ISO-8859-2",
    "latin5": "ISO-8859-9",
    "latin7": "ISO-8859-13",
    "greek": "ISO-8859-7",
    "hebrew": "ISO-8859-8",
    "ascii": "US-ASCII",
    "koi8r": "KOI8-R",
    "koi8u": "KOI8-U",
    "tis620": "TIS-620",
    "cp850": "IBM850",
    "cp852": "IBM852",
    "cp866": "IBM866",
    "cp1250": "windows-1250",
    "cp1251": "windows-1251",
    "cp1256": "windows-1256",
    "cp1257": "windows-1257",
    "macce": "x-MacCentralEurope",
    "macroman": "x-MacRoman",
    # CJK multi-byte
    "gbk": "GBK",
    "gb2312": "GB2312",
    "gb18030": "GB18030",
    "big5": "Big5",
    "sjis": "Shift_JIS",
    "cp932": "windows-31j",
    "ujis": "EUC-JP",
    "euckr": "EUC-KR",
    # bytes-as-stored (no text semantics; 8859-1 round-trips every byte)
    "binary": "ISO-8859-1",
}


def ensure_charsets(spark) -> None:
    """Make the full charset table usable on ANY session: Spark 4 rejects
    non-core charsets in encode()/decode() unless the legacy-javaCharsets
    flag is on (runtime-settable)."""
    try:
        spark.conf.set("spark.sql.legacy.javaCharsets", "true")
    except Exception:
        pass


def jvm_charset(mysql_charset: str) -> str:
    cs = MYSQL_TO_JVM_CHARSET.get(mysql_charset.strip().lower())
    if cs is None:
        raise ValueError(f"undecodable MySQL charset: {mysql_charset}")
    return cs


def resolve_charset(
    column_charset: str | None,
    table_charset: str | None,
    default_charset: str = "utf8mb4",
) -> str:
    """getCharset:344-353 — column charset, else table charset, else the
    configured default."""
    for c in (column_charset, table_charset, default_charset):
        if c and c.strip():
            return c
    return default_charset


def recode(col: Column, stored_as: str, actual: str) -> Column:
    """Undo a mis-decode: a string that was decoded under ``stored_as``
    (e.g. latin1 mojibake) but whose bytes are really ``actual`` (e.g.
    utf8). encode() under the wrong charset recovers the original bytes;
    decode() under the right one yields the true text."""
    return F.decode(F.encode(col, jvm_charset(stored_as)), jvm_charset(actual))


def repair_type_mismatch(raw_bytes: Column, logical_type: str, charset: str) -> Column:
    """resolveDataTypeNotMatch:355-370 — physical value re-decoded from raw
    bytes under the resolved charset, then cast to the LOGICAL column type
    (the declaration the registry holds), regardless of what the physical
    shard declared."""
    from polardbx_cdc_spark.types import mysql_cast, spark_type_for
    from pyspark.sql import types as T

    if isinstance(spark_type_for(logical_type), T.BinaryType):
        return raw_bytes
    return mysql_cast(F.decode(raw_bytes, jvm_charset(charset)), logical_type)


def render_create_sql(db: str, tbl: str, schema) -> str:
    """SHOW CREATE TABLE equivalent rendered from a registry TableSchema
    (round-trips through ddl.parse_ddl)."""
    types = schema.types if schema.types else ("TEXT",) * len(schema.columns)
    cols = ", ".join(f"`{c}` {t}" for c, t in zip(schema.columns, types))
    prefixes = dict(getattr(schema, "pk_prefixes", ()) or ())
    parts = ", ".join(
        f"`{c}`({prefixes[c]})" if c in prefixes else f"`{c}`"
        for c in schema.pks
    )
    pk = f", PRIMARY KEY ({parts})" if schema.pks else ""
    uks = "".join(
        f", UNIQUE KEY `{n}` ({', '.join(f'`{c}`' for c in cs)})"
        for n, cs in getattr(schema, "uniques", ()) or ()
    )
    return f"CREATE TABLE `{db}`.`{tbl}` ({cols}{pk}{uks})"


def repair_topology_record(
    record: dict | None,
    registry,
    topology,
    db: str,
    tbl: str,
) -> dict:
    """JsonRepairUtil.repair parity: rebuild a damaged/missing CREATE_TABLE
    topology record from the authoritative registry + logical topology.
    Fields already present in ``record`` are kept; missing ones are filled:
    ``create_sql`` from the registry schema, ``phy_tables`` from the
    topology's physical→logical mapping."""
    out = dict(record or {})
    out.setdefault("table_name", tbl)
    if not out.get("create_sql"):
        schema = registry.find(db, tbl, "9" * 48)
        if schema is None:
            raise KeyError(f"{db}.{tbl} unknown to the registry — cannot repair")
        out["create_sql"] = render_create_sql(db, tbl, schema)
    if not out.get("phy_tables"):
        out["phy_tables"] = sorted(
            phys for phys, logic in topology.phys_to_logic.items() if logic == (db, tbl)
        )
    return out
