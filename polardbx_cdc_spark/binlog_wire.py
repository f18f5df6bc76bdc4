"""Minimal MySQL binlog wire format (v4) — encode + decode slice.

Retires the byte-format carve-out: the rotated-parquet sink is the engine's
scale path, but a downstream that expects REAL binlog bytes (TABLE_MAP +
ROWS events, CRC32-checksummed, FDE-prefixed files) can attach to this
serializer. The format implemented here is the public MySQL replication
protocol (binlog v4, row-based events v2); reference parity targets are
the decoder polardbx-cdc-canal/.../binlog/LogDecoder.java +
event/TableMapLogEvent.java + event/RowsLogEvent.java (event type codes
LogEvent.java:121-157 — TABLE_MAP=19, WRITE/UPDATE/DELETE_ROWS v2=30/31/32;
CRC32 checksum alg LogEvent.java:226) and the writer
polardbx-cdc-dumper/.../logfile/LogFileGenerator.java:624-757.

Scope (honest slice, round-trip-tested byte-for-byte):
- file layout: 4-byte magic, FORMAT_DESCRIPTION, events, ROTATE chain
- events: FORMAT_DESCRIPTION, TABLE_MAP (incl. MySQL-8 optional-metadata
  TLVs — SIGNEDNESS always; with ``binlog_row_metadata=FULL`` also
  COLUMN_NAME, ENUM/SET string values, and PRIMARY_KEY, enabling the
  registry-free ``decode_named_rows`` attach), WRITE/UPDATE/DELETE_ROWS
  v2 AND v1 (codes 23–25, no var-header), QUERY, XID, ROTATE,
  XA_PREPARE, ROWS_QUERY (per-txn ::TRACE:: markers,
  RowsQueryEventBuilder.java), the GTID family (GTID / ANONYMOUS_GTID /
  PREVIOUS_GTIDS, codes 33–35, plus HEARTBEAT — LogEvent.java:161-171),
  and the PolarDB-X SEQUENCE/GCN carriers — each with trailing CRC32;
  torn-tail tolerant decode + file recovery
- column types (the RowsLogBuffer.java surface): TINY/SHORT/INT24/LONG/
  LONGLONG signed+unsigned, FLOAT/DOUBLE, NEWDECIMAL (packed 9-digit
  groups, negative inversion — LogBuffer.getDecimal /
  format/field/DecimalField.java), BIT, YEAR, DATE, DATETIME2/
  TIMESTAMP2/TIME2 with fractional seconds (signed TIME2 incl. the
  negative complement encoding) AND the pre-5.6 legacy DATETIME/
  TIMESTAMP/TIME (``from_mysql_types`` " legacy" decl marker), VARCHAR
  (1/2-byte length per metadata), BLOB family (1–4 byte length prefix),
  NULL bitmaps, ENUM/SET (via TYPE_STRING metadata), GEOMETRY (opaque
  WKB-with-SRID blob), and JSON columns carrying the server's BINARY
  json document (json_binary.h small/large objects+arrays, inlined
  scalars, varlen strings — decode parity JsonConversion.java),
  round-tripped to Python values, and TRANSACTION_PAYLOAD
  (MySQL 8.0.20+ binlog transaction compression — TLV header, checksum-
  off inner events re-framed on decode; NONE natively, ZSTD when the
  zstandard package is present). Out of scope: encrypted binlog.

Spark-side plumbing is in ``events_to_binlog`` / ``binlog_to_events``:
Arrow-batched ``mapInPandas`` over the CDC frame — serialization is
embarrassingly parallel per partition (the reference serializes
per-stream on one thread; Spark gets the same per-file ordering from the
sink's offset assignment while encoding all files concurrently).
"""

from __future__ import annotations

import struct
import zlib

MAGIC = b"\xfebin"

# event type codes (public protocol; LogEvent.java:121-157; PolarDB-X
# extension events LogEvent.java:181,184)
QUERY_EVENT = 2
FORMAT_DESCRIPTION_EVENT = 15
XID_EVENT = 16
TABLE_MAP_EVENT = 19
WRITE_ROWS_EVENT = 30
UPDATE_ROWS_EVENT = 31
DELETE_ROWS_EVENT = 32
# ROWS v1 (5.1/5.5-era, LogEvent.java:133-135): same body as v2 minus the
# var-header (extra-data) field. Decode-only — the writer always emits v2,
# but archived binlogs from older servers arrive as v1.
WRITE_ROWS_EVENT_V1 = 23
UPDATE_ROWS_EVENT_V1 = 24
DELETE_ROWS_EVENT_V1 = 25
#: MySQL 8.0.3+ binlog_row_value_options=PARTIAL_JSON (reference enum
#: BinlogEventType.java:39): UPDATEs carry JSON columns as DIFF VECTORS,
#: not full documents. Body = UPDATE_ROWS v2 plus, per after-image row,
#: a value_options lenenc int and (when bit 0 set) a partial_bits bitmap
#: over the JSON columns present in the after image (rows_event.h
#: "partial_columns"; diff format json_diff.h: op, path, value).
PARTIAL_UPDATE_ROWS_EVENT = 39
ROWS_EVENTS = frozenset(
    (WRITE_ROWS_EVENT, UPDATE_ROWS_EVENT, DELETE_ROWS_EVENT,
     WRITE_ROWS_EVENT_V1, UPDATE_ROWS_EVENT_V1, DELETE_ROWS_EVENT_V1,
     PARTIAL_UPDATE_ROWS_EVENT)
)
UPDATE_EVENTS = frozenset(
    (UPDATE_ROWS_EVENT, UPDATE_ROWS_EVENT_V1, PARTIAL_UPDATE_ROWS_EVENT)
)
#: json_diff.h enum_json_diff_operation
JSON_DIFF_REPLACE = 0
JSON_DIFF_INSERT = 1
JSON_DIFF_REMOVE = 2
ROTATE_EVENT = 4
#: statement-era session-context carriers (LogEvent.java:121-157 lists
#: them; archived 5.x mixed-mode binlogs interleave these with QUERY
#: events) — decode-only: the row-based pipeline never emits them
INTVAR_EVENT = 5
RAND_EVENT = 13
USER_VAR_EVENT = 14
#: server-lifecycle / LOAD DATA / incident markers the reference's
#: LogDecoder.java:294-330 constructs as first-class events —
#: decode-only here as well
STOP_EVENT = 3
BEGIN_LOAD_QUERY_EVENT = 17
EXECUTE_LOAD_QUERY_EVENT = 18
INCIDENT_EVENT = 26
IGNORABLE_LOG_EVENT = 28
#: MariaDB event family (LogEvent.java:188-206 enumerates them; the
#: reference decodes them as ignorables — here the GTID carriers decode
#: typed so a MariaDB archive's txn boundaries survive)
MARIA_ANNOTATE_ROWS_EVENT = 160
MARIA_BINLOG_CHECKPOINT_EVENT = 161
MARIA_GTID_EVENT = 162
MARIA_GTID_LIST_EVENT = 163
#: MariaDB binlog encryption marker (LogEvent.java:206): every event
#: AFTER it in the file is AES-encrypted — undecodable without the key
MARIA_START_ENCRYPTION_EVENT = 164
XA_PREPARE_EVENT = 38  # XA branch prepare (XaPrepareLogEvent.java)
SEQUENCE_EVENT = 80  # PolarDB-X sequence/TSO carrier (SequenceLogEvent.java)
GCN_EVENT = 105  # PolarDB-X DN 8.0 commit-GCN carrier (GcnLogEvent.java)
ROWS_QUERY_EVENT = 29  # original-SQL / ::TRACE:: marker (RowsQueryEventBuilder.java)
# GTID family (5.6+; LogEvent.java:161-171) — every real archived binlog
# carries PREVIOUS_GTIDS after the FDE and a GTID before each txn
GTID_LOG_EVENT = 33
ANONYMOUS_GTID_LOG_EVENT = 34
PREVIOUS_GTIDS_LOG_EVENT = 35
HEARTBEAT_LOG_EVENT = 27  # connection-liveness filler, no payload semantics
#: MySQL 8.0.20+ binlog transaction compression: the transaction's whole
#: event stream rides inside ONE payload event (TLV header + compressed
#: body; inner events carry no per-event checksum)
TRANSACTION_PAYLOAD_EVENT = 40
#: payload compression algorithms (public protocol values)
COMPRESS_ZSTD = 0
COMPRESS_NONE = 255
#: fixed server UUID for GTID framing of exported files (any stable 16 bytes)
_ENGINE_SID = bytes.fromhex("c0ffee00c0ffee00c0ffee00c0ffee00")

# column type codes (public protocol)
TYPE_TINY = 1
TYPE_SHORT = 2
TYPE_LONG = 3
TYPE_FLOAT = 4
TYPE_DOUBLE = 5
TYPE_TIMESTAMP = 7  # pre-5.6 legacy: 4-byte LE epoch secs (RowsLogBuffer.java:128)
TYPE_LONGLONG = 8
TYPE_TIME = 11  # pre-5.6 legacy: int24 HHMMSS decimal (RowsLogBuffer.java:133)
TYPE_DATETIME = 12  # pre-5.6 legacy: u64 YYYYMMDDHHMMSS decimal (RowsLogBuffer.java:139)
TYPE_INT24 = 9
TYPE_DATE = 10
TYPE_YEAR = 13
TYPE_VARCHAR = 15
TYPE_BIT = 16
TYPE_TIMESTAMP2 = 17
TYPE_DATETIME2 = 18
TYPE_TIME2 = 19
TYPE_NEWDECIMAL = 246
TYPE_ENUM = 247  # "real type"; never appears raw in a binlog column list
TYPE_SET = 248  # same — both travel as TYPE_STRING + 2-byte metadata
TYPE_JSON = 245  # binary JSON document, BLOB-style length prefix
TYPE_BLOB = 252
TYPE_STRING = 254
TYPE_GEOMETRY = 255  # opaque WKB bytes, BLOB-style length prefix

HEADER_LEN = 19  # timestamp(4) type(1) server_id(4) event_len(4) next_pos(4) flags(2)
CHECKSUM_LEN = 4
BINLOG_CHECKSUM_ALG_OFF = 0  # LogEvent.java:224 (binlog_checksum=NONE)
BINLOG_CHECKSUM_ALG_CRC32 = 1  # LogEvent.java:226
#: first server version whose FDE carries the checksum-alg byte
#: (LogHeader.java's checksum_version_product = 5.6.1)
_CHECKSUM_VERSION = (5, 6, 1)

#: post-header lengths for the FDE's per-type table (indexes are
#: type_code-1; only the types we emit need truthful values)
_POST_HEADER_LEN = {
    QUERY_EVENT: 13,
    ROTATE_EVENT: 8,
    FORMAT_DESCRIPTION_EVENT: 84,
    XID_EVENT: 0,
    TABLE_MAP_EVENT: 8,
    WRITE_ROWS_EVENT: 10,
    UPDATE_ROWS_EVENT: 10,
    DELETE_ROWS_EVENT: 10,
    WRITE_ROWS_EVENT_V1: 8,
    UPDATE_ROWS_EVENT_V1: 8,
    DELETE_ROWS_EVENT_V1: 8,
    PARTIAL_UPDATE_ROWS_EVENT: 10,
    BEGIN_LOAD_QUERY_EVENT: 4,
    EXECUTE_LOAD_QUERY_EVENT: 26,
    INCIDENT_EVENT: 2,
}
_LAST_EVENT_TYPE = 42  # table covers types 1..42 (5.7-era layout)


def _lenenc(n: int) -> bytes:
    """length-encoded integer (public wire format)."""
    if n < 251:
        return bytes([n])
    if n < 1 << 16:
        return b"\xfc" + struct.pack("<H", n)
    if n < 1 << 24:
        return b"\xfd" + struct.pack("<I", n)[:3]
    return b"\xfe" + struct.pack("<Q", n)


def _read_lenenc(buf: bytes, pos: int) -> tuple[int, int]:
    first = buf[pos]
    if first < 251:
        return first, pos + 1
    if first == 0xFC:
        return struct.unpack_from("<H", buf, pos + 1)[0], pos + 3
    if first == 0xFD:
        return int.from_bytes(buf[pos + 1 : pos + 4], "little"), pos + 4
    return struct.unpack_from("<Q", buf, pos + 1)[0], pos + 9


def _bitmap(bits: list[bool]) -> bytes:
    out = bytearray((len(bits) + 7) // 8)
    for i, b in enumerate(bits):
        if b:
            out[i // 8] |= 1 << (i % 8)
    return bytes(out)


def _bit_at(bm: bytes, i: int) -> bool:
    return bool(bm[i // 8] & (1 << (i % 8)))


#: numeric wire types whose signedness travels in the TABLE_MAP optional
#: metadata SIGNEDNESS TLV (MySQL 8 optional metadata field type 1)
_NUMERIC_TYPES = frozenset(
    [TYPE_TINY, TYPE_SHORT, TYPE_INT24, TYPE_LONG, TYPE_LONGLONG,
     TYPE_FLOAT, TYPE_DOUBLE, TYPE_NEWDECIMAL]
)
_SIGNEDNESS_TLV = 1
#: binlog_row_metadata=FULL TLVs (MySQL 8 optional metadata field types,
#: public libbinlogevents rows_event.h Optional_metadata_field_type) —
#: lets a consumer decode fully-NAMED, label-resolved rows from the wire
#: alone, no external schema registry (TableMapLogEvent.java reads the
#: same fields for the reference's column-aware processing)
#: rows_event.h Optional_metadata_field_type — the PUBLIC 8.0 numbering.
#: (Round-8 conformance fix: SET/ENUM label TLVs previously used 3/5,
#: which are COLUMN_CHARSET/SET_STR_VALUE on a real server — an
#: interop-only bug the self-roundtrip tests could not see.)
_DEFAULT_CHARSET_TLV = 2
_COLUMN_CHARSET_TLV = 3
_COLUMN_NAME_TLV = 4
_SET_STR_VALUE_TLV = 5
_ENUM_STR_VALUE_TLV = 6
_GEOMETRY_TYPE_TLV = 7
_SIMPLE_PRIMARY_KEY_TLV = 8
_PRIMARY_KEY_WITH_PREFIX_TLV = 9
_ENUM_SET_DEFAULT_CHARSET_TLV = 10
_ENUM_SET_COLUMN_CHARSET_TLV = 11
_COLUMN_VISIBILITY_TLV = 12

#: MySQL collation id → Python codec for CHAR/VARCHAR/TEXT value bytes.
#: Covers the collations a real DN emits (collation ids are public
#: protocol constants); utf8/utf8mb4 collation blocks and unknown ids
#: fall back to utf-8; id 63 (binary pseudo-charset) decodes latin-1
#: (byte-transparent).
_COLLATION_CODECS: dict[int, str] = {
    5: "latin-1", 8: "latin-1", 15: "latin-1", 31: "latin-1",
    47: "latin-1", 48: "latin-1", 49: "latin-1", 94: "latin-1",
    11: "ascii", 65: "ascii",
    28: "gbk", 87: "gbk",
    24: "gb2312", 86: "gb2312",
    95: "cp932", 96: "cp932",
    63: "latin-1",
}


import re as _re_mod

_CHARSET_DECL_RE = _re_mod.compile(
    r"(?:charset|character\s+set)\s+([a-z0-9_]+)"
)
#: COLLATE latin1_swedish_ci → charset latin1 (collation names always
#: prefix their charset, SHOW COLLATION invariant)
_COLLATE_DECL_RE = _re_mod.compile(r"collate\s+([a-z0-9]+?)_[a-z0-9_]+")

#: charset NAME → default collation id (the ids SHOW COLLATION lists)
_CHARSET_NAME_IDS: dict[str, int] = {
    "latin1": 8, "ascii": 11, "gbk": 28, "gb2312": 24, "cp932": 95,
    "utf8": 33, "utf8mb3": 33, "utf8mb4": 255, "binary": 63,
}


def _codec_for(collation: int | None) -> str:
    if collation is None:
        return "utf-8"
    return _COLLATION_CODECS.get(collation, "utf-8")


def _character_columns(types: list[tuple[int, object]]) -> list[int]:
    """Column indexes the charset TLVs cover, in column order — the
    server's is_character_type set (rows_event.cc): CHAR, VARCHAR, and
    BLOB (TEXT travels as MYSQL_TYPE_BLOB and occupies an ordinal even
    though this slice keeps its VALUE bytes opaque). ENUM/SET ride their
    own ENUM_AND_SET_* charset TLVs and are excluded. Getting the
    ordinal space right is what keeps a real server's COLUMN_CHARSET
    list aligned to the right columns."""
    out = []
    for i, (tc, m) in enumerate(types):
        if tc in (TYPE_VARCHAR, TYPE_BLOB):
            out.append(i)
        elif tc == TYPE_STRING and isinstance(m, tuple) \
                and m[0] not in (TYPE_ENUM, TYPE_SET):
            out.append(i)
    return out

#: fsp → fractional-second byte count (DATETIME2/TIMESTAMP2/TIME2 tail)
def _frac_bytes(fsp: int) -> int:
    return (fsp + 1) // 2


def _parse_fsp(t: str) -> int:
    if "(" in t:
        return int(t[t.find("(") + 1 : t.find(")")])
    return 0


class TableDef:
    """Column layout for one table — the schema side of TABLE_MAP.

    ``types``: list of (type_code, metadata); metadata per type:
    VARCHAR max byte length; FLOAT/DOUBLE size; NEWDECIMAL (precision,
    scale); BIT bit count; BLOB length-prefix width; DATETIME2/
    TIMESTAMP2/TIME2 fsp; else None. ``unsigned``: set of column indexes
    whose integer values decode unsigned (carried on the wire in the
    SIGNEDNESS optional-metadata TLV)."""

    def __init__(self, db: str, tbl: str, types: list[tuple[int, object]],
                 unsigned: set[int] | None = None,
                 col_names: list[str] | None = None,
                 pk: list[int] | None = None,
                 enum_labels: dict[int, list[str]] | None = None,
                 set_labels: dict[int, list[str]] | None = None,
                 charsets: dict[int, int] | None = None,
                 default_charset: int | None = None,
                 geometry_types: dict[int, int] | None = None,
                 invisible: set[int] | None = None,
                 pk_prefixes: dict[int, int] | None = None,
                 enum_set_charsets: dict[int, int] | None = None,
                 enum_set_default_charset: int | None = None):
        self.db = db
        self.tbl = tbl
        self.types = types
        self.unsigned = unsigned or set()
        #: binlog_row_metadata=FULL surface (optional): column names,
        #: simple-PK column indexes, ENUM/SET label lists per column index
        self.col_names = col_names
        self.pk = pk
        self.enum_labels = enum_labels or {}
        self.set_labels = set_labels or {}
        #: per-column MySQL collation id for character columns (the
        #: DEFAULT_CHARSET/COLUMN_CHARSET TLVs); value bytes of CHAR/
        #: VARCHAR columns encode/decode with the mapped codec —
        #: None = utf-8 (the modern server default)
        self.charsets = charsets or {}
        self.default_charset = default_charset
        #: GEOMETRY_TYPE TLV: geometry column index → geometry type code
        self.geometry_types = geometry_types or {}
        #: COLUMN_VISIBILITY TLV: indexes of INVISIBLE columns (8.0.23) —
        #: row images still carry their values; metadata only
        self.invisible = invisible or set()
        #: PRIMARY_KEY_WITH_PREFIX TLV (9): pk column index → prefix
        #: length in CHARACTERS for prefix-indexed key parts (0 = whole
        #: column). Any non-zero prefix switches the PK TLV from 8 to 9,
        #: exactly like the server (rows_event.cc).
        self.pk_prefixes = pk_prefixes or {}
        #: ENUM_AND_SET_{DEFAULT,COLUMN}_CHARSET TLVs (10/11): collation
        #: of the ENUM/SET LABEL text — the label bytes in TLVs 5/6
        #: encode with this charset, not the table default
        self.enum_set_charsets = enum_set_charsets or {}
        self.enum_set_default_charset = enum_set_default_charset

    def charset_of(self, i: int) -> int | None:
        return self.charsets.get(i, self.default_charset)

    def enum_set_charset_of(self, i: int) -> int | None:
        return self.enum_set_charsets.get(i, self.enum_set_default_charset)

    @classmethod
    def from_mysql_types(cls, db: str, tbl: str, decls: list[str],
                         col_names: list[str] | None = None,
                         pk: list[int] | None = None) -> "TableDef":
        """Map MySQL type declarations (the registry's ``types``) onto the
        wire types — the same surface RowsLogBuffer.java decodes.
        ENUM/SET label lists are captured from the declarations so
        ``encode_table_map`` can emit the FULL row-metadata TLVs."""
        types: list[tuple[int, object]] = []
        unsigned: set[int] = set()
        enum_labels: dict[int, list[str]] = {}
        set_labels: dict[int, list[str]] = {}
        charsets: dict[int, int] = {}
        for i, d in enumerate(decls):
            t = d.strip().lower()
            if "unsigned" in t:
                unsigned.add(i)
            # "varchar(64) charset latin1" / canonical SHOW CREATE TABLE
            # "CHARACTER SET latin1" / "COLLATE latin1_swedish_ci" →
            # per-column collation carried in the charset TLVs and used
            # for the value bytes
            cm = _CHARSET_DECL_RE.search(t) or _COLLATE_DECL_RE.search(t)
            if cm:
                cs = _CHARSET_NAME_IDS.get(cm.group(1))
                if cs is not None:
                    charsets[i] = cs
            if t.startswith("enum("):
                enum_labels[i] = _decl_labels(d)
            elif t.startswith("set("):
                set_labels[i] = _decl_labels(d)
            if t.startswith(("bool", "boolean")):
                types.append((TYPE_TINY, None))
            elif t.startswith("tinyint"):
                types.append((TYPE_TINY, None))
            elif t.startswith("smallint"):
                types.append((TYPE_SHORT, None))
            elif t.startswith("mediumint"):
                types.append((TYPE_INT24, None))
            elif t.startswith("bigint"):
                types.append((TYPE_LONGLONG, None))
            elif t.startswith(("int", "integer")):
                types.append((TYPE_LONG, None))
            elif t.startswith("float"):
                types.append((TYPE_FLOAT, 4))
            elif t.startswith("double"):
                types.append((TYPE_DOUBLE, 8))
            elif t.startswith(("decimal", "numeric")):
                if "(" in t:
                    inner = t[t.find("(") + 1 : t.find(")")]
                    p, _, s = inner.partition(",")
                    prec, scale = int(p), int(s or 0)
                else:
                    prec, scale = 10, 0
                types.append((TYPE_NEWDECIMAL, (prec, scale)))
            elif t.startswith("bit"):
                bits = int(t[t.find("(") + 1 : t.find(")")]) if "(" in t else 1
                types.append((TYPE_BIT, bits))
            elif t.startswith("char") and not t.startswith("character varying"):
                # real CHAR(n): MYSQL_TYPE_STRING with the bit-packed
                # 2-byte metadata (Field_string::do_save_field_metadata:
                # byte0 = type ^ ((len & 0x300) >> 4), byte1 = len & 0xff)
                inner = t[t.find("(") + 1 : t.find(")")] if "(" in t else "1"
                maxlen = min(int(inner) * 4, 1023)  # utf8mb4 bytes; 10-bit cap
                types.append((TYPE_STRING, (TYPE_STRING, maxlen)))
            elif t.startswith(("enum(", "set(")):
                # ENUM('a','b',…) / SET('a','b',…): the binlog carries the
                # INDEX (1-based) / member BITMASK, typed on the wire as
                # MYSQL_TYPE_STRING with metadata (real_type, pack_len) —
                # real ENUM/SET codes never appear in the column-type
                # array (RowsLogBuffer.java:833 "cannot exist in a
                # binlog"; TableMapLogEvent meta convention)
                n_labels = t.count("'") // 2
                if t.startswith("enum("):
                    packlen = 1 if n_labels < 256 else 2
                    types.append((TYPE_STRING, (TYPE_ENUM, packlen)))
                else:
                    types.append((TYPE_STRING, (TYPE_SET, min((n_labels + 7) // 8, 8))))
            elif t.startswith("year"):
                types.append((TYPE_YEAR, None))
            elif t.startswith("datetime"):
                # " legacy" marker = pre-5.6 packed-decimal wire form
                # (RowsLogBuffer.java:139) — archived-binlog fixtures
                types.append(
                    (TYPE_DATETIME, None) if "legacy" in t
                    else (TYPE_DATETIME2, _parse_fsp(t))
                )
            elif t.startswith("timestamp"):
                types.append(
                    (TYPE_TIMESTAMP, None) if "legacy" in t
                    else (TYPE_TIMESTAMP2, _parse_fsp(t))
                )
            elif t.startswith("time"):
                types.append(
                    (TYPE_TIME, None) if "legacy" in t
                    else (TYPE_TIME2, _parse_fsp(t))
                )
            elif t.startswith("date"):
                types.append((TYPE_DATE, None))
            elif t.startswith(("varchar", "char", "text", "tinytext",
                               "mediumtext", "longtext")):
                if t.startswith(("text", "tinytext", "mediumtext", "longtext")):
                    m = 65535
                else:
                    inner = t[t.find("(") + 1 : t.find(")")] if "(" in t else "255"
                    # VARCHAR(n) metadata is the max BYTE length (utf8mb4 ≤ 4n)
                    m = min(int(inner) * 4, 65535)
                types.append((TYPE_VARCHAR, m))
            elif t.startswith("json"):
                types.append((TYPE_JSON, 4))  # 4-byte length prefix
            elif t.startswith(("geometry", "point", "linestring", "polygon",
                               "multipoint", "multilinestring",
                               "multipolygon", "geometrycollection",
                               "geomcollection")):
                # SRID+WKB payload passes through opaque (GeometryField.java
                # treats it as bytes; types.py maps it to BinaryType).
                # Spatial subtypes are GEOMETRY on the wire — MySQL keeps
                # the subtype only in table metadata (the GEOMETRY_TYPE
                # TLV carries it under FULL row metadata).
                types.append((TYPE_GEOMETRY, 4))
            elif t.startswith(("blob", "tinyblob", "mediumblob", "longblob",
                               "binary", "varbinary")):
                prefix = {"tinyblob": 1, "mediumblob": 3, "longblob": 4}.get(
                    t.split("(")[0], 2
                )
                types.append((TYPE_BLOB, prefix))
            else:
                raise ValueError(f"wire slice does not cover type {d!r}")
        return cls(db, tbl, types, unsigned, col_names=col_names, pk=pk,
                   enum_labels=enum_labels, set_labels=set_labels,
                   charsets=charsets or None)


def _encode_header(type_code: int, payload_len: int, timestamp: int,
                   server_id: int, next_pos: int, flags: int = 0) -> bytes:
    event_len = HEADER_LEN + payload_len + CHECKSUM_LEN
    return struct.pack(
        "<IBIIIH", timestamp, type_code, server_id, event_len, next_pos, flags
    )


def _finish(header_payload: bytes) -> bytes:
    return header_payload + struct.pack("<I", zlib.crc32(header_payload) & 0xFFFFFFFF)


def encode_event(type_code: int, payload: bytes, timestamp: int = 0,
                 server_id: int = 1, next_pos: int = 0) -> bytes:
    """One checksummed event: 19-byte header + payload + CRC32 over both."""
    return _finish(
        _encode_header(type_code, len(payload), timestamp, server_id, next_pos)
        + payload
    )


def encode_fde(server_version: str = "5.7.0-polardbx-spark",
               checksum_alg: int = BINLOG_CHECKSUM_ALG_CRC32) -> bytes:
    """FORMAT_DESCRIPTION: binlog_version(2)=4, server_version(50,
    NUL-padded), create_ts(4), header_len(1)=19, post-header-length table,
    checksum_alg(1). The FDE frame itself ALWAYS carries a CRC32 footer —
    a real master stamps the FDE even under binlog_checksum=NONE (the
    reader learns the alg FROM this event, so it must be verifiable;
    LogHeader.java:191 reads checksumAlg at event_len-5)."""
    if _server_version_tuple(server_version) < _CHECKSUM_VERSION:
        # Writer/reader symmetry (ADVICE r12): decode_events treats a
        # pre-5.6.1 FDE as having NO alg byte and NO CRC footer, but
        # this encoder always appends both — it would produce a stream
        # its own decoder misparses (5 stray bytes absorbed into the
        # FDE body, every later event keeping its CRC unverified).
        # Pre-checksum wire emission is not a supported encode target;
        # pre-5.6 *column payloads* (legacy temporals) remain encodable
        # under a modern FDE via encode_table_map's legacy type codes.
        raise ValueError(
            f"encode_fde: server_version {server_version!r} predates the "
            f"checksum-alg descriptor (5.6.1) — the encoder always stamps "
            f"a CRC32 footer, so such a stream would misparse on read"
        )
    sv = server_version.encode()[:50].ljust(50, b"\x00")
    table = bytes(
        _POST_HEADER_LEN.get(t, 0) for t in range(1, _LAST_EVENT_TYPE + 1)
    )
    payload = (
        struct.pack("<H", 4) + sv + struct.pack("<I", 0)
        + bytes([HEADER_LEN]) + table + bytes([checksum_alg])
    )
    return encode_event(FORMAT_DESCRIPTION_EVENT, payload)


def _server_version_tuple(sv: str) -> tuple[int, int, int]:
    """Leading-numeric (major, minor, patch) of a server-version string,
    '5.7.0-polardbx-spark' → (5, 7, 0) — LogHeader.java's version_product
    decomposition."""
    nums = []
    for part in sv.split(".", 2):
        digits = ""
        for ch in part:
            if ch.isdigit():
                digits += ch
            else:
                break
        nums.append(int(digits) if digits else 0)
    while len(nums) < 3:
        nums.append(0)
    return tuple(nums[:3])


def _fde_has_checksum_alg(body: bytes) -> bool:
    """Whether a v4 FDE's server_version (body[2:52]) is >= 5.6.1, i.e.
    the event's last pre-footer byte is the checksum-alg descriptor
    (LogHeader.java's version_product >= checksum_version_product)."""
    sv = body[2:52].rstrip(b"\x00").decode(errors="replace")
    return _server_version_tuple(sv) >= _CHECKSUM_VERSION


def _encode_col_meta(types: list[tuple[int, object]]) -> bytes:
    """Per-type TABLE_MAP metadata bytes (TableMapLogEvent.java decode
    side lists the same widths)."""
    meta = bytearray()
    for tc, m in types:
        if tc == TYPE_VARCHAR:
            meta += struct.pack("<H", m)
        elif tc in (TYPE_FLOAT, TYPE_DOUBLE, TYPE_BLOB, TYPE_JSON, TYPE_GEOMETRY):
            meta += bytes([m])
        elif tc == TYPE_NEWDECIMAL:
            meta += bytes([m[0], m[1]])  # precision, scale
        elif tc == TYPE_BIT:
            meta += bytes([m % 8, m // 8])
        elif tc in (TYPE_DATETIME2, TYPE_TIMESTAMP2, TYPE_TIME2):
            meta += bytes([m])
        elif tc == TYPE_STRING:
            real, arg = m
            if real == TYPE_STRING:  # CHAR(n): bit-packed length
                meta += bytes([real ^ ((arg & 0x300) >> 4), arg & 0xFF])
            else:  # ENUM/SET: (real_type, pack_len) verbatim
                meta += bytes([real, arg])
    return bytes(meta)


def _decode_col_meta(raw_types: list[int], meta_buf: bytes) -> list[tuple[int, object]]:
    types: list[tuple[int, object]] = []
    mp = 0
    for rt in raw_types:
        if rt == TYPE_VARCHAR:
            types.append((rt, struct.unpack_from("<H", meta_buf, mp)[0]))
            mp += 2
        elif rt in (TYPE_FLOAT, TYPE_DOUBLE, TYPE_BLOB, TYPE_JSON, TYPE_GEOMETRY):
            types.append((rt, meta_buf[mp]))
            mp += 1
        elif rt == TYPE_NEWDECIMAL:
            types.append((rt, (meta_buf[mp], meta_buf[mp + 1])))
            mp += 2
        elif rt == TYPE_BIT:
            types.append((rt, meta_buf[mp] + meta_buf[mp + 1] * 8))
            mp += 2
        elif rt in (TYPE_DATETIME2, TYPE_TIMESTAMP2, TYPE_TIME2):
            types.append((rt, meta_buf[mp]))
            mp += 1
        elif rt == TYPE_STRING:
            b0, b1 = meta_buf[mp], meta_buf[mp + 1]
            mp += 2
            if b0 in (TYPE_ENUM, TYPE_SET):
                types.append((rt, (b0, b1)))
            elif (b0 & 0x30) != 0x30:  # CHAR with length bits folded in
                types.append((rt, (b0 | 0x30, b1 | (((b0 & 0x30) ^ 0x30) << 4))))
            else:  # CHAR < 256 bytes: type byte untouched
                types.append((rt, (b0, b1)))
        else:
            types.append((rt, None))
    return types


def encode_table_map(table_id: int, td: TableDef, timestamp: int = 0) -> bytes:
    """TABLE_MAP: table_id(6) flags(2) | db tbl col-count col-types
    metadata null-bitmap [optional-metadata TLVs] (TableMapLogEvent.java
    read side). The SIGNEDNESS TLV (MySQL 8 optional metadata, field type
    1) carries one bit per NUMERIC column, MSB-first — how a real
    replica learns unsigned-ness, since the value bytes alone don't."""
    db_b, tbl_b = td.db.encode(), td.tbl.encode()
    meta = _encode_col_meta(td.types)
    numeric_idx = [i for i, (tc, _) in enumerate(td.types) if tc in _NUMERIC_TYPES]
    opt = b""
    if numeric_idx:
        bits = bytearray((len(numeric_idx) + 7) // 8)
        for pos, col in enumerate(numeric_idx):
            if col in td.unsigned:
                bits[pos // 8] |= 0x80 >> (pos % 8)  # MSB-first
        opt = bytes([_SIGNEDNESS_TLV]) + _lenenc(len(bits)) + bytes(bits)
    # binlog_row_metadata=FULL TLVs (rows_event.h write order) — emitted
    # only when the TableDef carries them, so default output is unchanged
    if td.col_names:
        blob = b"".join(
            _lenenc(len(n.encode())) + n.encode() for n in td.col_names
        )
        opt += bytes([_COLUMN_NAME_TLV]) + _lenenc(len(blob)) + blob
    if td.set_labels:
        blob = b""
        for i in sorted(td.set_labels):  # column order
            labels = td.set_labels[i]
            codec = _codec_for(td.enum_set_charset_of(i))
            blob += _lenenc(len(labels))
            for s in labels:
                raw = s.encode(codec)
                blob += _lenenc(len(raw)) + raw
        opt += bytes([_SET_STR_VALUE_TLV]) + _lenenc(len(blob)) + blob
    if td.enum_labels:
        blob = b""
        for i in sorted(td.enum_labels):
            labels = td.enum_labels[i]
            codec = _codec_for(td.enum_set_charset_of(i))
            blob += _lenenc(len(labels))
            for s in labels:
                raw = s.encode(codec)
                blob += _lenenc(len(raw)) + raw
        opt += bytes([_ENUM_STR_VALUE_TLV]) + _lenenc(len(blob)) + blob
    if td.pk:
        if td.pk_prefixes:
            # any prefix key part switches the TLV to 9 — (column,
            # prefix-chars) pairs, 0 = whole column (rows_event.cc)
            blob = b"".join(
                _lenenc(i) + _lenenc(td.pk_prefixes.get(i, 0))
                for i in td.pk
            )
            opt += (bytes([_PRIMARY_KEY_WITH_PREFIX_TLV])
                    + _lenenc(len(blob)) + blob)
        else:
            blob = b"".join(_lenenc(i) for i in td.pk)
            opt += (bytes([_SIMPLE_PRIMARY_KEY_TLV])
                    + _lenenc(len(blob)) + blob)
    # ENUM/SET label-text charset TLVs (10/11) — parallel to 2/3 but
    # over the ENUM/SET column ordinal space
    es_cols = [
        i for i, (tc, m) in enumerate(td.types)
        if tc == TYPE_STRING and isinstance(m, tuple)
        and m[0] in (TYPE_ENUM, TYPE_SET)
    ]
    if td.enum_set_default_charset is not None:
        blob = _lenenc(td.enum_set_default_charset)
        for ordinal, col in enumerate(es_cols):
            cs = td.enum_set_charsets.get(col)
            if cs is not None and cs != td.enum_set_default_charset:
                blob += _lenenc(ordinal) + _lenenc(cs)
        opt += (bytes([_ENUM_SET_DEFAULT_CHARSET_TLV])
                + _lenenc(len(blob)) + blob)
    elif td.enum_set_charsets:
        blob = b"".join(
            _lenenc(td.enum_set_charsets.get(c, 255)) for c in es_cols
        )
        opt += (bytes([_ENUM_SET_COLUMN_CHARSET_TLV])
                + _lenenc(len(blob)) + blob)
    # charset TLVs (rows_event.h): DEFAULT_CHARSET = default collation +
    # (char-column-ordinal, collation) overrides; COLUMN_CHARSET = one
    # collation per character column. Character columns here = CHAR/
    # VARCHAR (TEXT travels as BLOB and is byte-addressed on this slice).
    char_cols = _character_columns(td.types)
    if td.default_charset is not None:
        blob = _lenenc(td.default_charset)
        for ordinal, col in enumerate(char_cols):
            cs = td.charsets.get(col)
            if cs is not None and cs != td.default_charset:
                blob += _lenenc(ordinal) + _lenenc(cs)
        opt += bytes([_DEFAULT_CHARSET_TLV]) + _lenenc(len(blob)) + blob
    elif td.charsets:
        blob = b"".join(
            _lenenc(td.charsets.get(c, 255)) for c in char_cols
        )
        opt += bytes([_COLUMN_CHARSET_TLV]) + _lenenc(len(blob)) + blob
    if td.geometry_types:
        geo_cols = [i for i, (tc, _) in enumerate(td.types) if tc == TYPE_GEOMETRY]
        blob = b"".join(_lenenc(td.geometry_types.get(c, 0)) for c in geo_cols)
        opt += bytes([_GEOMETRY_TYPE_TLV]) + _lenenc(len(blob)) + blob
    if td.invisible:
        bits = bytearray((len(td.types) + 7) // 8)
        for i in range(len(td.types)):
            if i not in td.invisible:  # bit SET = visible
                bits[i // 8] |= 0x80 >> (i % 8)
        opt += bytes([_COLUMN_VISIBILITY_TLV]) + _lenenc(len(bits)) + bytes(bits)
    payload = (
        struct.pack("<Q", table_id)[:6] + struct.pack("<H", 1)
        + bytes([len(db_b)]) + db_b + b"\x00"
        + bytes([len(tbl_b)]) + tbl_b + b"\x00"
        + _lenenc(len(td.types))
        + bytes(tc for tc, _ in td.types)
        + _lenenc(len(meta)) + meta
        + _bitmap([True] * len(td.types))  # all columns nullable
        + opt
    )
    return encode_event(TABLE_MAP_EVENT, payload, timestamp)


# -- NEWDECIMAL packed format (LogBuffer.getDecimal / DecimalField.java) ----
#: bytes needed for n leftover decimal digits (DIG_PER_DEC1 = 9)
_DIG2BYTES = [0, 1, 1, 2, 2, 3, 3, 4, 4, 4]


def _encode_decimal(v, precision: int, scale: int) -> bytes:
    """MySQL packed decimal: big-endian 9-digit groups, partial groups in
    minimal bytes, negative = all bytes inverted, first byte MSB flipped.
    All digit manipulation is C-int arithmetic (divmod by powers of ten),
    not string slicing — this runs per value in the Arrow encode path."""
    import decimal

    with decimal.localcontext() as ctx:
        ctx.prec = 65  # MySQL's max decimal precision — exact throughout
        d = decimal.Decimal(v if isinstance(v, decimal.Decimal) else str(v)).quantize(
            decimal.Decimal(1).scaleb(-scale), rounding=decimal.ROUND_HALF_UP
        )
        unscaled = int(d.copy_abs().scaleb(scale))  # exact at prec=65
    neg = d < 0
    intg = precision - scale
    int_part, frac_part = divmod(unscaled, 10**scale) if scale else (unscaled, 0)
    int_part %= 10**intg if intg else 1  # overflow guard: keep intg digits
    out = bytearray()
    # leading partial int group, then full 9-digit groups (big-endian)
    part = intg % 9
    full = intg // 9
    if part or full:
        hi, lo = divmod(int_part, 10 ** (9 * full))
        if part:
            out += hi.to_bytes(_DIG2BYTES[part], "big")
        for k in range(full - 1, -1, -1):
            g, lo = divmod(lo, 10 ** (9 * k))
            out += g.to_bytes(4, "big")
    # full frac groups, then trailing partial
    part = scale % 9
    full = scale // 9
    if full or part:
        lo = frac_part
        rem_digits = scale
        for _ in range(full):
            rem_digits -= 9
            g, lo = divmod(lo, 10**rem_digits)
            out += g.to_bytes(4, "big")
        if part:
            out += lo.to_bytes(_DIG2BYTES[part], "big")
    if not out:
        out = bytearray(1)
    if neg:
        for i in range(len(out)):
            out[i] ^= 0xFF
    out[0] ^= 0x80
    return bytes(out)


def _decimal_byte_len(precision: int, scale: int) -> int:
    intg = precision - scale
    return (intg // 9) * 4 + _DIG2BYTES[intg % 9] + (scale // 9) * 4 + _DIG2BYTES[scale % 9]


def _decode_decimal(buf, pos: int, precision: int, scale: int):
    """Decode at ``buf[pos:]`` WITHOUT slicing the remaining buffer (a
    per-value tail slice made large multi-row events quadratic)."""
    import decimal

    n = _decimal_byte_len(precision, scale)
    raw = bytearray(buf[pos : pos + n]) or bytearray(1)
    neg = not (raw[0] & 0x80)
    raw[0] ^= 0x80
    if neg:
        for i in range(len(raw)):
            raw[i] ^= 0xFF
    intg = precision - scale
    p = 0
    int_v = 0
    part = intg % 9
    if part:
        w = _DIG2BYTES[part]
        int_v = int.from_bytes(raw[p : p + w], "big")
        p += w
    for _ in range(intg // 9):
        int_v = int_v * 1_000_000_000 + int.from_bytes(raw[p : p + 4], "big")
        p += 4
    frac_v = 0
    for _ in range(scale // 9):
        frac_v = frac_v * 1_000_000_000 + int.from_bytes(raw[p : p + 4], "big")
        p += 4
    part = scale % 9
    if part:
        w = _DIG2BYTES[part]
        frac_v = frac_v * 10**part + int.from_bytes(raw[p : p + w], "big")
        p += w
    if scale:
        text = f"-{int_v}.{frac_v:0{scale}d}" if neg else f"{int_v}.{frac_v:0{scale}d}"
    else:
        text = f"-{int_v}" if neg else f"{int_v}"
    return decimal.Decimal(text), n


# -- temporal packed formats (RowsLogBuffer.java DATETIME2/TIMESTAMP2) ------


def _encode_frac(micros: int, fsp: int) -> bytes:
    nb = _frac_bytes(fsp)
    if nb == 0:
        return b""
    return (micros // 10 ** (6 - 2 * nb)).to_bytes(nb, "big")


def _decode_frac(buf: bytes, pos: int, fsp: int) -> tuple[int, int]:
    nb = _frac_bytes(fsp)
    if nb == 0:
        return 0, pos
    v = int.from_bytes(buf[pos : pos + nb], "big")
    return v * 10 ** (6 - 2 * nb), pos + nb


def _encode_datetime2(v, fsp: int) -> bytes:
    packed = (
        (1 << 39)
        | ((v.year * 13 + v.month) << 22)
        | (v.day << 17)
        | (v.hour << 12)
        | (v.minute << 6)
        | v.second
    )
    return packed.to_bytes(5, "big") + _encode_frac(v.microsecond, fsp)


def _decode_datetime2(buf: bytes, pos: int, fsp: int):
    import datetime

    packed = int.from_bytes(buf[pos : pos + 5], "big")
    pos += 5
    ym = (packed >> 22) & 0x1FFFF
    micros, pos = _decode_frac(buf, pos, fsp)
    return (
        datetime.datetime(
            ym // 13, ym % 13, (packed >> 17) & 0x1F,
            (packed >> 12) & 0x1F, (packed >> 6) & 0x3F, packed & 0x3F, micros,
        ),
        pos,
    )


def _sub_def(td: TableDef, present: list[bool]) -> tuple[TableDef, list[int]]:
    """Project a TableDef onto the PRESENT columns of a partial row image
    (binlog_row_image=MINIMAL/NOBLOB): the image's null bitmap and value
    stream cover present columns only, in ordinal order."""
    idx = [i for i, p in enumerate(present) if p]
    sub = TableDef(
        td.db, td.tbl, [td.types[i] for i in idx],
        unsigned={j for j, i in enumerate(idx) if i in td.unsigned},
        charsets={
            j: td.charsets[i] for j, i in enumerate(idx) if i in td.charsets
        },
        default_charset=td.default_charset,
    )
    return sub, idx


def _encode_image(td: TableDef, values: list,
                  present: list[bool] | None = None) -> bytes:
    """One row image: null bitmap + packed non-null values — the write
    twin of RowsLogBuffer.fetchValue's per-type decode. ``present``
    restricts the image to those columns (partial row images)."""
    if present is not None and not all(present):
        sub, idx = _sub_def(td, present)
        return _encode_image(sub, [values[i] for i in idx])
    out = bytearray(_bitmap([v is None for v in values]))
    for i, ((tc, m), v) in enumerate(zip(td.types, values)):
        if v is None:
            continue
        _encode_cell_into(out, td, i, tc, m, v)
    return bytes(out)


def _encode_cell_into(out: bytearray, td: TableDef, i: int, tc: int, m,
                      v) -> None:
    """Append ONE non-null wire cell to ``out`` — the per-value body of
    ``_encode_image``, split out so the vectorized encode fast path
    (``_vector_cells`` fallback columns) and the row-at-a-time path share
    byte-identical cell encoding."""
    u = i in td.unsigned
    if tc == TYPE_TINY:
        out += struct.pack("<B" if u else "<b", int(v))
    elif tc == TYPE_SHORT:
        out += struct.pack("<H" if u else "<h", int(v))
    elif tc == TYPE_INT24:
        out += (int(v) & 0xFFFFFF).to_bytes(3, "little")
    elif tc == TYPE_LONG:
        out += struct.pack("<I" if u else "<i", int(v))
    elif tc == TYPE_LONGLONG:
        out += struct.pack("<Q" if u else "<q", int(v))
    elif tc == TYPE_FLOAT:
        out += struct.pack("<f", float(v))
    elif tc == TYPE_DOUBLE:
        out += struct.pack("<d", float(v))
    elif tc == TYPE_NEWDECIMAL:
        out += _encode_decimal(v, m[0], m[1])
    elif tc == TYPE_BIT:
        out += int(v).to_bytes((m + 7) // 8, "big")
    elif tc == TYPE_YEAR:
        out += bytes([0 if int(v) == 0 else int(v) - 1900])
    elif tc == TYPE_DATE:
        out += (v.day | (v.month << 5) | (v.year << 9)).to_bytes(3, "little")
    elif tc == TYPE_DATETIME2:
        out += _encode_datetime2(v, m)
    elif tc == TYPE_DATETIME:
        # legacy packed-decimal: YYYYMMDDHHMMSS as one u64 LE
        num = (
            ((v.year * 100 + v.month) * 100 + v.day) * 1_000_000
            + (v.hour * 100 + v.minute) * 100 + v.second
        )
        out += struct.pack("<Q", num)
    elif tc == TYPE_TIMESTAMP:
        if isinstance(v, (int, float)):
            secs = int(v)
        else:
            import calendar

            secs = calendar.timegm(v.timetuple())
        out += struct.pack("<I", secs)
    elif tc == TYPE_TIME:
        # legacy signed int24 of HHMMSS decimal
        total = v.days * 86400 + v.seconds
        neg, a = total < 0, abs(v.days * 86400 + v.seconds)
        h, rem = divmod(a, 3600)
        mi, se = divmod(rem, 60)
        num = h * 10_000 + mi * 100 + se
        if neg:
            num = (1 << 24) - num
        out += num.to_bytes(3, "little")
    elif tc == TYPE_TIMESTAMP2:
        # v: aware/naive datetime treated as UTC, or raw epoch seconds
        if isinstance(v, (int, float)):
            secs, micros = int(v), 0
        else:
            import calendar

            secs = calendar.timegm(v.timetuple())
            micros = v.microsecond
        out += secs.to_bytes(4, "big") + _encode_frac(micros, m)
    elif tc == TYPE_TIME2:
        # full signed TIME2 (RowsLogBuffer.java:665-760 decode,
        # mirrored): 3-byte big-endian intpart biased by 0x800000;
        # negative values with a fraction store intpart-1 and the
        # fraction's complement; fsp 5-6 is ONE 48-bit biased
        # quantity (TIMEF_OFS) — bit-identical to the 3+3 split for
        # positives, diverging only on negatives (the borrow).
        total_us = (v.days * 86400 + v.seconds) * 1_000_000 + v.microseconds
        neg, a = total_us < 0, abs(total_us)
        a_sec, frac_us = divmod(a, 1_000_000)
        h, rem = divmod(a_sec, 3600)
        mi, se = divmod(rem, 60)
        intpart = (h << 12) | (mi << 6) | se
        nb = _frac_bytes(m)
        if nb == 3:
            packed = (intpart << 24) | frac_us
            out += ((-packed if neg else packed) + 0x800000000000).to_bytes(6, "big")
        else:
            frac_units = frac_us // (10 ** (6 - 2 * nb)) if nb else 0
            si = -intpart if neg else intpart
            if neg and frac_units > 0:
                si -= 1
                frac_units = (1 << (8 * nb)) - frac_units
            out += (si + 0x800000).to_bytes(3, "big")
            if nb:
                out += frac_units.to_bytes(nb, "big")
    elif tc == TYPE_VARCHAR:
        b = v if isinstance(v, bytes) else str(v).encode(
            _codec_for(td.charset_of(i))
        )
        out += (bytes([len(b)]) if m < 256 else struct.pack("<H", len(b))) + b
    elif tc == TYPE_BLOB:
        b = bytes(v)
        out += len(b).to_bytes(m, "little") + b
    elif tc == TYPE_JSON:
        # Python value (or pre-serialized document bytes) → binary
        # JSON blob, BLOB-style length prefix; a JsonDiffVector is a
        # partial-format value (type-39 after images only)
        if isinstance(v, JsonDiffVector):
            b: bytes | bytearray = encode_json_diffs(v)
        elif isinstance(v, (bytes, bytearray)):
            b = v
        else:
            b = json_serialize(v)
        out += len(b).to_bytes(m, "little") + bytes(b)
    elif tc == TYPE_GEOMETRY:
        b = bytes(v)
        out += len(b).to_bytes(m, "little") + b
    elif tc == TYPE_STRING and m[0] in (TYPE_ENUM, TYPE_SET):
        # ENUM index / SET bitmask: pack_len-byte little-endian
        # unsigned (RowsLogBuffer.java:833-886 getUint8/16…48)
        out += int(v).to_bytes(m[1], "little")
    elif tc == TYPE_STRING:
        # CHAR(n): stored unpadded with a length prefix sized by the
        # declared max bytes (RowsLogBuffer STRING == VAR_STRING path)
        b = v if isinstance(v, bytes) else str(v).encode(
            _codec_for(td.charset_of(i))
        )
        out += (bytes([len(b)]) if m[1] < 256 else struct.pack("<H", len(b))) + b
    else:
        raise ValueError(f"unsupported wire type {tc}")


def _compile_cell_decoders(td: TableDef):
    """Per-column decoder closures for one TableDef — the r13 decode fast
    path. ``_decode_image`` previously re-dispatched a ~20-branch elif
    chain (plus per-value charset/signedness lookups) for EVERY value;
    compiling the dispatch once per table cuts the row walk to a tuple
    unpack + one call per cell. Each entry is ``(null_byte, null_mask,
    fn)`` with ``fn(buf, pos, json_partial) -> (value, new_pos)`` —
    byte/semantics-identical to the old chain (pinned by the wire test
    suite and the oracle-parity replica)."""
    import datetime

    epoch = datetime.datetime(1970, 1, 1)
    timedelta = datetime.timedelta
    date = datetime.date
    dtdt = datetime.datetime
    decoders = []
    for i, (tc, m) in enumerate(td.types):
        u = i in td.unsigned
        if tc == TYPE_TINY:
            s = struct.Struct("<B" if u else "<b").unpack_from

            def fn(buf, pos, jp, s=s):
                return s(buf, pos)[0], pos + 1
        elif tc == TYPE_SHORT:
            s = struct.Struct("<H" if u else "<h").unpack_from

            def fn(buf, pos, jp, s=s):
                return s(buf, pos)[0], pos + 2
        elif tc == TYPE_INT24:
            if u:
                def fn(buf, pos, jp):
                    return int.from_bytes(buf[pos:pos + 3], "little"), pos + 3
            else:
                def fn(buf, pos, jp):
                    v = int.from_bytes(buf[pos:pos + 3], "little")
                    if v >= 1 << 23:
                        v -= 1 << 24
                    return v, pos + 3
        elif tc == TYPE_LONG:
            s = struct.Struct("<I" if u else "<i").unpack_from

            def fn(buf, pos, jp, s=s):
                return s(buf, pos)[0], pos + 4
        elif tc == TYPE_LONGLONG:
            s = struct.Struct("<Q" if u else "<q").unpack_from

            def fn(buf, pos, jp, s=s):
                return s(buf, pos)[0], pos + 8
        elif tc == TYPE_FLOAT:
            s = struct.Struct("<f").unpack_from

            def fn(buf, pos, jp, s=s):
                return s(buf, pos)[0], pos + 4
        elif tc == TYPE_DOUBLE:
            s = struct.Struct("<d").unpack_from

            def fn(buf, pos, jp, s=s):
                return s(buf, pos)[0], pos + 8
        elif tc == TYPE_NEWDECIMAL:
            prec, scale = m
            w = _decimal_byte_len(prec, scale)
            if prec <= 18 and w > 0:
                # integer-arithmetic fast path: one from_bytes + masked
                # group extraction; Decimal(unscaled).scaleb(-scale) is
                # exact below the 28-digit context and value/exponent-
                # identical to the text form the generic path parses
                intg = prec - scale
                segs: list[tuple[int, int, int]] = []
                off = 0
                for digs, cnt in ((intg % 9, 1), (9, intg // 9)):
                    for _ in range(cnt):
                        if digs:
                            wd = _DIG2BYTES[digs] if digs < 9 else 4
                            segs.append((off, wd, digs))
                            off += wd
                for digs, cnt in ((9, scale // 9), (scale % 9, 1)):
                    for _ in range(cnt):
                        if digs:
                            wd = _DIG2BYTES[digs] if digs < 9 else 4
                            segs.append((off, wd, digs))
                            off += wd
                shifts = tuple(
                    (8 * (w - o - wd), (1 << (8 * wd)) - 1, 10 ** digs)
                    for o, wd, digs in segs
                )
                top_flip = 0x80 << (8 * (w - 1))
                allmask = (1 << (8 * w)) - 1

                def fn(buf, pos, jp, w=w, shifts=shifts, top_flip=top_flip,
                       allmask=allmask, scale=scale, D=_Decimal):
                    iv = int.from_bytes(buf[pos:pos + w], "big")
                    neg = not (iv & top_flip)
                    iv ^= top_flip
                    if neg:
                        iv ^= allmask
                    uns = 0
                    for sh, mk, mul in shifts:
                        uns = uns * mul + ((iv >> sh) & mk)
                    d = D(uns).scaleb(-scale) if scale else D(uns)
                    return (-d if neg else d), pos + w
            else:
                def fn(buf, pos, jp, p=prec, sc=scale):
                    v, ln = _decode_decimal(buf, pos, p, sc)
                    return v, pos + ln
        elif tc == TYPE_BIT:
            w = (m + 7) // 8

            def fn(buf, pos, jp, w=w):
                return int.from_bytes(buf[pos:pos + w], "big"), pos + w
        elif tc == TYPE_YEAR:
            def fn(buf, pos, jp):
                b = buf[pos]
                return (0 if b == 0 else b + 1900), pos + 1
        elif tc == TYPE_DATE:
            def fn(buf, pos, jp, date=date):
                v = int.from_bytes(buf[pos:pos + 3], "little")
                return date(v >> 9, (v >> 5) & 0xF, v & 0x1F), pos + 3
        elif tc == TYPE_DATETIME2:
            def fn(buf, pos, jp, m=m):
                return _decode_datetime2(buf, pos, m)
        elif tc == TYPE_DATETIME:
            s = struct.Struct("<Q").unpack_from

            def fn(buf, pos, jp, s=s, dtdt=dtdt):
                num = s(buf, pos)[0]
                d, t = divmod(num, 1_000_000)
                return dtdt(
                    d // 10_000, (d // 100) % 100, d % 100,
                    t // 10_000, (t // 100) % 100, t % 100,
                ), pos + 8
        elif tc == TYPE_TIMESTAMP:
            s = struct.Struct("<I").unpack_from

            def fn(buf, pos, jp, s=s, epoch=epoch, timedelta=timedelta):
                return epoch + timedelta(seconds=s(buf, pos)[0]), pos + 4
        elif tc == TYPE_TIME:
            def fn(buf, pos, jp, timedelta=timedelta):
                num = int.from_bytes(buf[pos:pos + 3], "little")
                neg = num >= 1 << 23
                if neg:
                    num = (1 << 24) - num
                delta = timedelta(
                    hours=num // 10_000, minutes=(num // 100) % 100,
                    seconds=num % 100,
                )
                return (-delta if neg else delta), pos + 3
        elif tc == TYPE_TIMESTAMP2:
            def fn(buf, pos, jp, m=m, epoch=epoch, timedelta=timedelta):
                secs = int.from_bytes(buf[pos:pos + 4], "big")
                micros, pos2 = _decode_frac(buf, pos + 4, m)
                return epoch + timedelta(seconds=secs, microseconds=micros), pos2
        elif tc == TYPE_TIME2:
            nbf = _frac_bytes(m)

            def fn(buf, pos, jp, nbf=nbf, timedelta=timedelta):
                if nbf == 3:
                    stored = int.from_bytes(buf[pos:pos + 6], "big")
                    pos += 6
                    packed = stored - 0x800000000000
                    neg, a = packed < 0, abs(packed)
                    intpart, frac_us = a >> 24, a & 0xFFFFFF
                else:
                    si = int.from_bytes(buf[pos:pos + 3], "big") - 0x800000
                    pos += 3
                    frac_units = int.from_bytes(buf[pos:pos + nbf], "big") \
                        if nbf else 0
                    pos += nbf
                    if si < 0 and frac_units > 0:
                        si += 1
                        frac_units -= 1 << (8 * nbf)
                    total_frac = frac_units * (10 ** (6 - 2 * nbf)) if nbf else 0
                    neg = si < 0 or total_frac < 0
                    intpart, frac_us = abs(si), abs(total_frac)
                delta = timedelta(
                    hours=(intpart >> 12) & 0x3FF,
                    minutes=(intpart >> 6) & 0x3F,
                    seconds=intpart & 0x3F,
                    microseconds=frac_us,
                )
                return (-delta if neg else delta), pos
        elif tc == TYPE_VARCHAR or (
            tc == TYPE_STRING
            and not (isinstance(m, tuple) and m[0] in (TYPE_ENUM, TYPE_SET))
        ):
            maxlen = m if tc == TYPE_VARCHAR else m[1]
            codec = _codec_for(td.charset_of(i))
            if maxlen < 256:
                def fn(buf, pos, jp, codec=codec):
                    ln = buf[pos]
                    pos += 1
                    return buf[pos:pos + ln].decode(codec), pos + ln
            else:
                s = struct.Struct("<H").unpack_from

                def fn(buf, pos, jp, codec=codec, s=s):
                    ln = s(buf, pos)[0]
                    pos += 2
                    return buf[pos:pos + ln].decode(codec), pos + ln
        elif tc in (TYPE_BLOB, TYPE_GEOMETRY):
            def fn(buf, pos, jp, m=m):
                ln = int.from_bytes(buf[pos:pos + m], "little")
                pos += m
                return bytes(buf[pos:pos + ln]), pos + ln
        elif tc == TYPE_JSON:
            def fn(buf, pos, jp, m=m, i=i):
                ln = int.from_bytes(buf[pos:pos + m], "little")
                pos += m
                raw = bytes(buf[pos:pos + ln])
                return (
                    decode_json_diffs(raw) if i in jp else json_parse(raw)
                ), pos + ln
        elif tc == TYPE_STRING:  # ENUM index / SET bitmask
            def fn(buf, pos, jp, w=m[1]):
                return int.from_bytes(buf[pos:pos + w], "little"), pos + w
        else:
            raise ValueError(f"unsupported wire type {tc}")
        decoders.append((i >> 3, 1 << (i & 7), fn))
    return decoders


def _decode_image(td: TableDef, buf: bytes, pos: int,
                  present: list[bool] | None = None,
                  json_partial: frozenset | set = frozenset()
                  ) -> tuple[list, int]:
    if present is not None and not all(present):
        # cache the projected TableDef per present-mask: building it per
        # ROW would also recompile the sub-def's cell decoders per row
        cache = td.__dict__.setdefault("_sub_cache", {})
        key = tuple(present)
        entry = cache.get(key)
        if entry is None:
            entry = cache[key] = _sub_def(td, present)
        sub, idx = entry
        sub_partial = {j for j, i in enumerate(idx) if i in json_partial}
        compact, pos = _decode_image(sub, buf, pos, json_partial=sub_partial)
        full: list = [None] * len(td.types)
        for j, i in enumerate(idx):
            full[i] = compact[j]
        return full, pos
    decs = td.__dict__.get("_cell_decoders")
    if decs is None:
        decs = td._cell_decoders = _compile_cell_decoders(td)
    nb = (len(td.types) + 7) // 8
    nulls = buf[pos:pos + nb]
    pos += nb
    values: list = []
    ap = values.append
    for bi, mask, fn in decs:
        if nulls[bi] & mask:
            ap(None)
        else:
            v, pos = fn(buf, pos, json_partial)
            ap(v)
    return values, pos


def encode_rows_event(type_code: int, table_id: int, td: TableDef,
                      rows: list, timestamp: int = 0,
                      present: list[bool] | None = None,
                      present_after: list[bool] | None = None) -> bytes:
    """ROWS v2 event. ``rows``: list of value-lists (WRITE/DELETE) or
    (before, after) pairs (UPDATE). Post-header: table_id(6) flags(2)
    extra_len(2)=2; body: col-count, present-bitmap(s), images
    (RowsLogEvent.java read side).

    ``present`` / ``present_after`` restrict the (before / after) images
    to those columns — the binlog_row_image=MINIMAL/NOBLOB shape, where
    an UPDATE's before-image carries only the PK and its after-image only
    the changed columns. Value lists stay full-length; absent positions
    are ignored."""
    n = len(td.types)
    pb = present if present is not None else [True] * n
    pa = present_after if present_after is not None else [True] * n
    body = bytearray(struct.pack("<Q", table_id)[:6] + struct.pack("<H", 0))
    if type_code in (WRITE_ROWS_EVENT, UPDATE_ROWS_EVENT, DELETE_ROWS_EVENT,
                     PARTIAL_UPDATE_ROWS_EVENT):
        body += struct.pack("<H", 2)  # v2 extra-data length (just itself)
    # else ROWS v1: no var-header — fixture-building path only; the
    # production writer always emits v2
    body += _lenenc(n) + _bitmap(pb)
    if type_code == PARTIAL_UPDATE_ROWS_EVENT:
        # after-image rows carry value_options (+ partial_bits over the
        # JSON columns present in the after image): a JSON value given as
        # a JsonDiffVector is stored in partial (diff) format
        body += _bitmap(pa)
        jcols = [
            i for i in range(n) if pa[i] and td.types[i][0] == TYPE_JSON
        ]
        for before, after in rows:
            body += _encode_image(td, before, pb)
            partial = [isinstance(after[c], JsonDiffVector) for c in jcols]
            if any(partial):
                body += _lenenc(1)  # value_options: PARTIAL_JSON bit
                body += _bitmap(partial)
            else:
                body += _lenenc(0)
            body += _encode_image(td, after, pa)
    elif type_code in UPDATE_EVENTS:
        body += _bitmap(pa)  # after-image present bitmap
        for before, after in rows:
            body += _encode_image(td, before, pb) + _encode_image(td, after, pa)
    else:
        for values in rows:
            body += _encode_image(td, values, pb)
    return encode_event(type_code, bytes(body), timestamp)


def encode_intvar(intvar_type: int, value: int, timestamp: int = 0) -> bytes:
    """INTVAR (type 5): session INSERT_ID / LAST_INSERT_ID carrier for
    statement-based replay — fixture builder for the decode path."""
    return encode_event(
        INTVAR_EVENT, bytes([intvar_type]) + struct.pack("<Q", value),
        timestamp,
    )


def encode_rand(seed1: int, seed2: int, timestamp: int = 0) -> bytes:
    """RAND (type 13): the session RAND() seeds."""
    return encode_event(
        RAND_EVENT, struct.pack("<QQ", seed1, seed2), timestamp
    )


def encode_user_var(name: str, value, timestamp: int = 0) -> bytes:
    """USER_VAR (type 14): @name = value; value None/str/float/int map to
    is_null / STRING_RESULT / REAL_RESULT / INT_RESULT."""
    nb = name.encode()
    body = struct.pack("<I", len(nb)) + nb
    if value is None:
        body += b"\x01"
    else:
        if isinstance(value, bool) or isinstance(value, int):
            vtype, raw = 2, int(value).to_bytes(8, "little", signed=True)
        elif isinstance(value, float):
            vtype, raw = 1, struct.pack("<d", value)
        else:
            vtype, raw = 0, str(value).encode()
        body += b"\x00" + bytes([vtype]) + struct.pack("<I", 33)
        body += struct.pack("<I", len(raw)) + raw
    return encode_event(USER_VAR_EVENT, body, timestamp)


def encode_xid(xid: int, timestamp: int = 0) -> bytes:
    return encode_event(XID_EVENT, struct.pack("<Q", xid), timestamp)


def encode_gtid(sid: bytes, gno: int, last_committed: int = 0,
                sequence_number: int = 0, anonymous: bool = False,
                timestamp: int = 0) -> bytes:
    """GTID_LOG_EVENT (public layout, 5.7+): commit_flag(1) sid(16)
    gno(8 LE) lt_type(1=G_COMMIT_TS2) last_committed(8) sequence_number(8)
    — the per-txn global id + the logical clock MTS schedulers use
    (LogEvent.java:161-165 event codes)."""
    if len(sid) != 16:
        raise ValueError("GTID sid must be 16 bytes")
    payload = (
        b"\x01" + sid + struct.pack("<q", gno)
        + b"\x02" + struct.pack("<qq", last_committed, sequence_number)
    )
    tc = ANONYMOUS_GTID_LOG_EVENT if anonymous else GTID_LOG_EVENT
    return encode_event(tc, payload, timestamp)


def encode_previous_gtids(gtid_set: dict[bytes, list[tuple[int, int]]],
                          timestamp: int = 0) -> bytes:
    """PREVIOUS_GTIDS_LOG_EVENT: n_sids(8) then per sid 16-byte uuid +
    n_intervals(8) + (start, end)×8 LE pairs — end is EXCLUSIVE, matching
    the server's Gtid_set encoding."""
    payload = bytearray(struct.pack("<Q", len(gtid_set)))
    for sid, intervals in gtid_set.items():
        if len(sid) != 16:
            raise ValueError("GTID sid must be 16 bytes")
        payload += sid + struct.pack("<Q", len(intervals))
        for start, end in intervals:
            payload += struct.pack("<QQ", start, end)
    return encode_event(PREVIOUS_GTIDS_LOG_EVENT, bytes(payload), timestamp)


# -- transaction payload (MySQL 8.0.20+ binlog transaction compression) -----
# Retires the "compressed binlog out of scope" carve-out: the server with
# binlog_transaction_compression=ON wraps each transaction's event stream
# in ONE TRANSACTION_PAYLOAD event — TLV header fields, then the (zstd-
# compressed or raw) concatenation of the inner events, which carry NO
# per-event checksum. Public format: libbinlogevents' Transaction_payload
# _event (control events); the reference's decoder consumes the expanded
# stream the same way (LogDecoder.java handles the post-expansion events).

_OTW_HEADER_END = 0
_OTW_PAYLOAD_SIZE = 1
_OTW_COMPRESSION_TYPE = 2
_OTW_UNCOMPRESSED_SIZE = 3


def _zstd_compress(raw: bytes) -> bytes:
    """ZSTD-compress a payload with the best codec on the machine:
    the ``zstandard`` package, else the system ``libzstd`` via ctypes
    (:mod:`polardbx_cdc_spark.zstd_ffi` — real entropy coding, zero
    Python dependencies), else a spec-valid raw-block frame from the
    vendored :mod:`polardbx_cdc_spark.zstd_mini` codec (legal Zstandard
    any conforming decoder reads — just without size reduction)."""
    try:
        import zstandard  # type: ignore[import-not-found]

        return zstandard.ZstdCompressor().compress(raw)
    except ImportError:
        pass
    from polardbx_cdc_spark import zstd_ffi, zstd_mini

    if zstd_ffi.available():
        return zstd_ffi.compress(raw)
    return zstd_mini.compress(raw)


def _zstd_decompress(blob: bytes, usize: int | None) -> bytes:
    """Decode a ZSTD payload body. The vendored frame codec handles
    raw/RLE-block frames with zero dependencies; entropy-coded frames
    (a real 8.0.20+ server's output) decode through the system libzstd
    (ctypes) or the ``zstandard`` package. ``usize`` (the payload TLV's
    UNCOMPRESSED_SIZE) is optional on the wire — when absent the codecs
    use the frame's own content size or stream."""
    from polardbx_cdc_spark import zstd_ffi, zstd_mini

    try:
        raw = zstd_mini.decompress(blob)
    except zstd_mini.UnsupportedFrame:
        if zstd_ffi.available():
            return zstd_ffi.decompress(blob, usize)
        try:
            import zstandard  # type: ignore[import-not-found]
        except ImportError as exc:  # pragma: no cover - env-dependent
            raise NotImplementedError(
                "entropy-coded ZSTD TRANSACTION_PAYLOAD needs libzstd or "
                "the 'zstandard' package; raw-block frames decode natively"
            ) from exc
        if usize:
            return zstandard.ZstdDecompressor().decompress(
                blob, max_output_size=usize
            )
        return zstandard.ZstdDecompressor().decompressobj().decompress(blob)
    if usize is not None and len(raw) != usize:
        raise ValueError(
            f"payload UNCOMPRESSED_SIZE mismatch: TLV {usize}, frame {len(raw)}"
        )
    return raw


def strip_event_checksums(stream: bytes) -> bytes:
    """Rewrite a checksummed event stream to checksum-off form: each
    header's event_len shrinks by CHECKSUM_LEN and the trailing CRC32
    drops — the serialization of events INSIDE a TRANSACTION_PAYLOAD."""
    out, pos = bytearray(), 0
    while pos + HEADER_LEN <= len(stream):
        elen = struct.unpack_from("<I", stream, pos + 9)[0]
        if elen < HEADER_LEN + CHECKSUM_LEN or pos + elen > len(stream):
            raise ValueError("torn event in payload input")
        ev = bytearray(stream[pos : pos + elen - CHECKSUM_LEN])
        struct.pack_into("<I", ev, 9, elen - CHECKSUM_LEN)
        out += ev
        pos += elen
    return bytes(out)


def add_event_checksums(stream: bytes) -> bytes:
    """Inverse of :func:`strip_event_checksums`: re-frame a checksum-off
    inner stream as standard checksummed events so the normal decoder
    (and every downstream consumer) digests it unchanged."""
    out, pos = bytearray(), 0
    while pos + HEADER_LEN <= len(stream):
        elen = struct.unpack_from("<I", stream, pos + 9)[0]
        if elen < HEADER_LEN or pos + elen > len(stream):
            raise ValueError("torn event in payload")
        ev = bytearray(stream[pos : pos + elen])
        struct.pack_into("<I", ev, 9, elen + CHECKSUM_LEN)
        out += _finish(bytes(ev))
        pos += elen
    return bytes(out)


def encode_transaction_payload(events: list[bytes] | bytes,
                               compression: int = COMPRESS_NONE,
                               timestamp: int = 0) -> bytes:
    """One TRANSACTION_PAYLOAD event wrapping a transaction's events.
    ``events``: list of standard checksummed event byte strings (what
    every ``encode_*`` here produces) or one concatenated stream. TLV
    fields (each: type, length, value as length-encoded ints): payload
    size, compression type, uncompressed size, then the header-end mark
    and the payload bytes."""
    stream = b"".join(events) if isinstance(events, (list, tuple)) else events
    raw = strip_event_checksums(stream)
    if compression == COMPRESS_ZSTD:
        body = _zstd_compress(raw)
    elif compression == COMPRESS_NONE:
        body = raw
    else:
        raise ValueError(f"unknown payload compression type {compression}")

    def field(ftype: int, value: int) -> bytes:
        v = _lenenc(value)
        return _lenenc(ftype) + _lenenc(len(v)) + v

    hdr = (
        field(_OTW_COMPRESSION_TYPE, compression)
        + field(_OTW_UNCOMPRESSED_SIZE, len(raw))
        + field(_OTW_PAYLOAD_SIZE, len(body))
        + _lenenc(_OTW_HEADER_END)
    )
    return encode_event(TRANSACTION_PAYLOAD_EVENT, hdr + body, timestamp)


def encode_xa_prepare(gtrid: bytes, bqual: bytes, format_id: int = 1,
                      one_phase: bool = False, timestamp: int = 0) -> bytes:
    """XA_PREPARE event — one_phase(1) format_id(4) gtrid_len(4)
    bqual_len(4) xid-data (XaPrepareLogEvent.java:44-55); gtrid/bqual
    each ≤ 64 bytes (MY_XIDDATASIZE guard)."""
    if len(gtrid) > 64 or len(bqual) > 64:
        raise ValueError("XA gtrid/bqual exceed 64 bytes")
    payload = (
        bytes([1 if one_phase else 0])
        + struct.pack("<iii", format_id, len(gtrid), len(bqual))
        + gtrid + bqual
    )
    return encode_event(XA_PREPARE_EVENT, payload, timestamp)


def encode_sequence(seq_type: int, seq_num: int, timestamp: int = 0) -> bytes:
    """SEQUENCE event — sequence_type(1) sequence_num(8)
    (SequenceLogEvent.java:54-56): PolarDB-X's snapshot/commit sequence
    carrier in the DN binlog."""
    return encode_event(
        SEQUENCE_EVENT, bytes([seq_type]) + struct.pack("<q", seq_num), timestamp
    )


def encode_gcn(gcn: int, flag: int = 0, timestamp: int = 0) -> bytes:
    """GCN event — flag(1) gcn(8) (GcnLogEvent.java:29-31). The global
    binlog uses it to carry the commit timestamp; the exporter stores the
    TSO's 19-digit physical-time prefix so consumers can seek by time."""
    return encode_event(GCN_EVENT, bytes([flag]) + struct.pack("<q", gcn), timestamp)


def encode_query(db: str, query: str, timestamp: int = 0) -> bytes:
    """QUERY event (BEGIN / DDL text): post-header thread_id(4)
    exec_time(4) db_len(1) error_code(2) status_vars_len(2); body:
    status-vars db NUL query."""
    db_b, q_b = db.encode(), query.encode()
    payload = (
        struct.pack("<IIBHH", 0, 0, len(db_b), 0, 0) + db_b + b"\x00" + q_b
    )
    return encode_event(QUERY_EVENT, payload, timestamp)


def encode_heartbeat(log_ident: str, timestamp: int = 0) -> bytes:
    """HEARTBEAT_LOG_EVENT — the master's connection-liveness filler sent
    while a blocking dump has nothing new; payload is the current binlog
    file name (the replica uses it to advance its relay position)."""
    return encode_event(HEARTBEAT_LOG_EVENT, log_ident.encode(), timestamp)


def encode_rows_query(text: str, timestamp: int = 0) -> bytes:
    """ROWS_QUERY event — the original SQL (or PolarDB-X ::TRACE:: marker)
    attached to the row events that follow
    (RowsQueryEventBuilder.java:20-39: 1-byte length prefix, readers take
    the text to event end, so >255-byte statements survive — the length
    byte is vestigial in MySQL too)."""
    data = text.encode()
    return encode_event(
        ROWS_QUERY_EVENT, struct.pack("<B", min(len(data), 255)) + data, timestamp
    )


def encode_rotate(next_file: str, position: int = 4) -> bytes:
    return encode_event(
        ROTATE_EVENT, struct.pack("<Q", position) + next_file.encode()
    )


def decode_events(buf: bytes, verify_crc: bool = True,
                  tolerate_truncation: bool = False) -> list[dict]:
    """Parse a byte stream of events (no file magic) into dicts:
    {type, timestamp, ...per-type fields}. Maintains the TABLE_MAP
    table_id → TableDef registry exactly like LogDecoder's context.

    ``tolerate_truncation``: stop cleanly at a torn tail (header cut
    short, body shorter than event_length, or CRC mismatch ON THE LAST
    event) instead of raising — the crash-recovery read mode
    (BinlogFile.seekLastTso walks a possibly-torn file the same way).

    Checksum algorithm follows the stream's FDE (the real reader
    contract, LogHeader.java:191): the alg byte sits at the FIXED offset
    event_len-5 — the FDE frame itself is ALWAYS CRC32-stamped (a real
    master writes the FDE checksummed even under binlog_checksum=NONE,
    since the reader learns the alg from it). alg=CRC32 (the default,
    and what every in-repo writer logs) verifies and trims a 4-byte
    trailer per FOLLOWING event; alg=NONE/OFF (a ``binlog_checksum=NONE``
    master — e.g. a NONE-negotiated MySQLDumpServer stream) means the
    following events carry no trailer at all. Pre-5.6.1 FDEs (per their
    server_version field) have no alg byte and imply no checksums."""
    events: list[dict] = []
    tables: dict[int, TableDef] = {}
    pos = 0
    csum = CHECKSUM_LEN  # per-stream trailer width, set by each FDE
    while pos < len(buf):
        if tolerate_truncation and pos + HEADER_LEN > len(buf):
            break
        ts, tc, sid, elen, npos, flags = struct.unpack_from("<IBIIIH", buf, pos)
        if elen < HEADER_LEN + csum:
            if tolerate_truncation:
                break  # garbage header (e.g. zeroed tail from a crash)
            raise ValueError(f"invalid event length {elen} at offset {pos}")
        if tolerate_truncation and pos + elen > len(buf):
            break
        frame = buf[pos : pos + elen]
        trail = csum  # this event's own trailer width
        fde_has_alg = False
        if tc == FORMAT_DESCRIPTION_EVENT and elen > HEADER_LEN + CHECKSUM_LEN:
            if _fde_has_checksum_alg(frame[HEADER_LEN:]):
                # fixed offset, exactly like the reference reader
                alg = frame[elen - CHECKSUM_LEN - 1]
                if alg not in (BINLOG_CHECKSUM_ALG_OFF, BINLOG_CHECKSUM_ALG_CRC32):
                    if tolerate_truncation and pos + elen >= len(buf):
                        # a crashed file's garbage tail can parse as an
                        # in-bounds "FDE" with a nonsense alg byte — the
                        # torn-tail walk must break, not raise
                        break
                    raise ValueError(
                        f"unsupported FDE checksum_alg {alg} at offset {pos}")
                fde_has_alg = True
                trail = CHECKSUM_LEN  # the FDE itself is always stamped
                csum = CHECKSUM_LEN if alg == BINLOG_CHECKSUM_ALG_CRC32 else 0
            else:
                trail = csum = 0  # pre-checksum server: no alg byte, no trailers
        if verify_crc and trail:
            want = struct.unpack_from("<I", frame, elen - trail)[0]
            got = zlib.crc32(frame[: elen - trail]) & 0xFFFFFFFF
            if want != got:
                if tolerate_truncation and pos + elen >= len(buf):
                    break  # torn last event: garbage bytes under a "valid" length
                raise ValueError(f"CRC mismatch at offset {pos}: {want:#x} != {got:#x}")
        body = frame[HEADER_LEN : elen - trail]
        ev: dict = {"type": tc, "timestamp": ts, "server_id": sid}
        if tc == FORMAT_DESCRIPTION_EVENT:
            ev["binlog_version"] = struct.unpack_from("<H", body, 0)[0]
            ev["server_version"] = body[2:52].rstrip(b"\x00").decode()
            # pre-5.6.1 FDEs have NO alg byte — body[-1] would be a
            # post-header-table width, not an algorithm
            ev["checksum_alg"] = body[-1] if fde_has_alg else None
        elif tc == TABLE_MAP_EVENT:
            tid = int.from_bytes(body[0:6], "little")
            p = 8
            dlen = body[p]
            db = body[p + 1 : p + 1 + dlen].decode()
            p += 1 + dlen + 1
            tlen = body[p]
            tbl = body[p + 1 : p + 1 + tlen].decode()
            p += 1 + tlen + 1
            ncols, p = _read_lenenc(body, p)
            raw_types = list(body[p : p + ncols])
            p += ncols
            mlen, p = _read_lenenc(body, p)
            types = _decode_col_meta(raw_types, body[p : p + mlen])
            p += mlen
            p += (ncols + 7) // 8  # null bitmap
            # optional-metadata TLVs (MySQL 8): SIGNEDNESS carries the
            # unsigned bits for numeric columns, MSB-first; with
            # binlog_row_metadata=FULL the stream also self-describes
            # column names, ENUM/SET labels, and the simple primary key
            unsigned: set[int] = set()
            col_names: list[str] | None = None
            pk: list[int] | None = None
            enum_labels: dict[int, list[str]] = {}
            set_labels: dict[int, list[str]] = {}
            charsets: dict[int, int] = {}
            default_cs: int | None = None
            geometry_types: dict[int, int] = {}
            invisible: set[int] = set()

            pk_prefixes: dict[int, int] = {}
            es_charsets: dict[int, int] = {}
            es_default_cs: int | None = None
            raw_enum_labels: bytes | None = None
            raw_set_labels: bytes | None = None

            def _read_label_lists(val: bytes, targets: list[int],
                                  codec_of) -> dict:
                out: dict[int, list[str]] = {}
                vp = 0
                for col in targets:
                    if vp >= len(val):
                        break
                    cnt, vp = _read_lenenc(val, vp)
                    labels = []
                    for _ in range(cnt):
                        ln, vp = _read_lenenc(val, vp)
                        labels.append(
                            val[vp : vp + ln].decode(codec_of(col))
                        )
                        vp += ln
                    out[col] = labels
                return out

            while p < len(body):
                tlv_type = body[p]
                tlv_len, q = _read_lenenc(body, p + 1)
                val = body[q : q + tlv_len]
                p = q + tlv_len
                if tlv_type == _SIGNEDNESS_TLV:
                    numeric_idx = [
                        i for i, rt in enumerate(raw_types) if rt in _NUMERIC_TYPES
                    ]
                    for bit, col in enumerate(numeric_idx):
                        if val[bit // 8] & (0x80 >> (bit % 8)):
                            unsigned.add(col)
                elif tlv_type == _COLUMN_NAME_TLV:
                    col_names = []
                    vp = 0
                    while vp < len(val):
                        ln, vp = _read_lenenc(val, vp)
                        col_names.append(val[vp : vp + ln].decode())
                        vp += ln
                elif tlv_type == _ENUM_STR_VALUE_TLV:
                    # label TEXT charset rides TLV 10/11, which the
                    # server writes AFTER this one — defer the decode
                    raw_enum_labels = val
                elif tlv_type == _SET_STR_VALUE_TLV:
                    raw_set_labels = val
                elif tlv_type == _SIMPLE_PRIMARY_KEY_TLV:
                    pk = []
                    vp = 0
                    while vp < len(val):
                        idx, vp = _read_lenenc(val, vp)
                        pk.append(idx)
                elif tlv_type == _PRIMARY_KEY_WITH_PREFIX_TLV:
                    pk = []
                    vp = 0
                    while vp < len(val):
                        idx, vp = _read_lenenc(val, vp)
                        plen, vp = _read_lenenc(val, vp)
                        pk.append(idx)
                        if plen:
                            pk_prefixes[idx] = plen
                elif tlv_type == _ENUM_SET_DEFAULT_CHARSET_TLV:
                    vp = 0
                    es_default_cs, vp = _read_lenenc(val, vp)
                    es_cols_d = [
                        i for i, (rt, m) in enumerate(types)
                        if rt == TYPE_STRING and isinstance(m, tuple)
                        and m[0] in (TYPE_ENUM, TYPE_SET)
                    ]
                    while vp < len(val):
                        ordinal, vp = _read_lenenc(val, vp)
                        cs, vp = _read_lenenc(val, vp)
                        if ordinal < len(es_cols_d):
                            es_charsets[es_cols_d[ordinal]] = cs
                elif tlv_type == _ENUM_SET_COLUMN_CHARSET_TLV:
                    vp = 0
                    for col in (
                        i for i, (rt, m) in enumerate(types)
                        if rt == TYPE_STRING and isinstance(m, tuple)
                        and m[0] in (TYPE_ENUM, TYPE_SET)
                    ):
                        if vp >= len(val):
                            break
                        cs, vp = _read_lenenc(val, vp)
                        es_charsets[col] = cs
                elif tlv_type == _DEFAULT_CHARSET_TLV:
                    # default collation + (char-column-ordinal, collation)
                    # override pairs
                    vp = 0
                    default_cs, vp = _read_lenenc(val, vp)
                    char_cols = _character_columns(types)
                    while vp < len(val):
                        ordinal, vp = _read_lenenc(val, vp)
                        cs, vp = _read_lenenc(val, vp)
                        if ordinal < len(char_cols):
                            charsets[char_cols[ordinal]] = cs
                elif tlv_type == _COLUMN_CHARSET_TLV:
                    vp = 0
                    for col in _character_columns(types):
                        if vp >= len(val):
                            break
                        cs, vp = _read_lenenc(val, vp)
                        charsets[col] = cs
                elif tlv_type == _GEOMETRY_TYPE_TLV:
                    vp = 0
                    for col in (
                        i for i, (rt, _) in enumerate(types)
                        if rt == TYPE_GEOMETRY
                    ):
                        if vp >= len(val):
                            break
                        gt, vp = _read_lenenc(val, vp)
                        geometry_types[col] = gt
                elif tlv_type == _COLUMN_VISIBILITY_TLV:
                    for i in range(len(types)):
                        if i // 8 < len(val) and not (
                            val[i // 8] & (0x80 >> (i % 8))
                        ):
                            invisible.add(i)
            def _es_codec(col: int) -> str:
                return _codec_for(es_charsets.get(col, es_default_cs))

            if raw_enum_labels is not None:
                enum_labels = _read_label_lists(
                    raw_enum_labels,
                    [
                        i for i, (rt, m) in enumerate(types)
                        if rt == TYPE_STRING and isinstance(m, tuple)
                        and m[0] == TYPE_ENUM
                    ],
                    _es_codec,
                )
            if raw_set_labels is not None:
                set_labels = _read_label_lists(
                    raw_set_labels,
                    [
                        i for i, (rt, m) in enumerate(types)
                        if rt == TYPE_STRING and isinstance(m, tuple)
                        and m[0] == TYPE_SET
                    ],
                    _es_codec,
                )
            tables[tid] = TableDef(
                db, tbl, types, unsigned, col_names=col_names, pk=pk,
                enum_labels=enum_labels, set_labels=set_labels,
                charsets=charsets, default_charset=default_cs,
                geometry_types=geometry_types, invisible=invisible,
                pk_prefixes=pk_prefixes, enum_set_charsets=es_charsets,
                enum_set_default_charset=es_default_cs,
            )
            ev.update(table_id=tid, db=db, tbl=tbl, types=types, unsigned=unsigned)
            if charsets or default_cs is not None:
                ev["charsets"] = dict(charsets)
                if default_cs is not None:
                    ev["default_charset"] = default_cs
            if geometry_types:
                ev["geometry_types"] = dict(geometry_types)
            if invisible:
                ev["invisible_columns"] = sorted(invisible)
            if col_names is not None:
                ev["col_names"] = col_names
            if pk is not None:
                ev["pk_columns"] = pk
            if pk_prefixes:
                ev["pk_prefixes"] = dict(pk_prefixes)
            if enum_labels:
                ev["enum_labels"] = enum_labels
            if set_labels:
                ev["set_labels"] = set_labels
            if es_charsets or es_default_cs is not None:
                ev["enum_set_charsets"] = dict(es_charsets)
                if es_default_cs is not None:
                    ev["enum_set_default_charset"] = es_default_cs
        elif tc in ROWS_EVENTS:
            tid = int.from_bytes(body[0:6], "little")
            td = tables[tid]
            if tc in (WRITE_ROWS_EVENT, UPDATE_ROWS_EVENT, DELETE_ROWS_EVENT,
                      PARTIAL_UPDATE_ROWS_EVENT):
                extra_len = struct.unpack_from("<H", body, 8)[0]
                p = 8 + extra_len  # extra_len counts its own 2 bytes
            else:
                p = 8  # ROWS v1: post-header ends after flags, no var-header
            ncols, p = _read_lenenc(body, p)
            nb = (ncols + 7) // 8
            # present bitmap(s): all-set for binlog_row_image=FULL; a
            # partial bitmap (MINIMAL: PK-only before-images, changed-only
            # after-images; NOBLOB) restricts the per-row value streams
            pb = [_bit_at(body[p : p + nb], i) for i in range(ncols)]
            p += nb
            pa = pb
            if tc in UPDATE_EVENTS:
                pa = [_bit_at(body[p : p + nb], i) for i in range(ncols)]
                p += nb
            jcols = [
                i for i in range(ncols)
                if pa[i] and td.types[i][0] == TYPE_JSON
            ] if tc == PARTIAL_UPDATE_ROWS_EVENT else []
            rows = []
            while p < len(body):
                if tc == PARTIAL_UPDATE_ROWS_EVENT:
                    before, p = _decode_image(td, body, p, pb)
                    # value_options lenenc precedes each after image;
                    # bit 0 = PARTIAL_JSON → partial_bits over the JSON
                    # columns present in the after image
                    vopt, p = _read_lenenc(body, p)
                    partial: set[int] = set()
                    if vopt & 1:
                        jb = (len(jcols) + 7) // 8
                        bits = body[p : p + jb]
                        p += jb
                        partial = {
                            c for k, c in enumerate(jcols) if _bit_at(bits, k)
                        }
                    after, p = _decode_image(td, body, p, pa,
                                             json_partial=partial)
                    rows.append((before, after))
                elif tc in UPDATE_EVENTS:
                    before, p = _decode_image(td, body, p, pb)
                    after, p = _decode_image(td, body, p, pa)
                    rows.append((before, after))
                else:
                    img, p = _decode_image(td, body, p, pb)
                    rows.append(img)
            ev.update(table_id=tid, db=td.db, tbl=td.tbl, rows=rows)
            if not all(pb):
                ev["present_columns"] = [i for i, x in enumerate(pb) if x]
            if tc in UPDATE_EVENTS and not all(pa):
                ev["present_columns_after"] = [i for i, x in enumerate(pa) if x]
            if td.col_names is not None:
                ev["col_names"] = td.col_names
                if td.pk is not None:
                    ev["pk_columns"] = td.pk
        elif tc == QUERY_EVENT:
            _tid, _et, dlen, _ec, svlen = struct.unpack_from("<IIBHH", body, 0)
            p = 13 + svlen
            ev["db"] = body[p : p + dlen].decode()
            ev["query"] = body[p + dlen + 1 :].decode()
        elif tc == GCN_EVENT:
            ev["flag"] = body[0]
            ev["gcn"] = struct.unpack_from("<q", body, 1)[0]
        elif tc == XA_PREPARE_EVENT:
            ev["one_phase"] = bool(body[0])
            fmt, glen, blen = struct.unpack_from("<iii", body, 1)
            ev["format_id"] = fmt
            ev["gtrid"] = body[13 : 13 + glen]
            ev["bqual"] = body[13 + glen : 13 + glen + blen]
        elif tc == SEQUENCE_EVENT:
            ev["sequence_type"] = body[0]
            ev["sequence_num"] = struct.unpack_from("<q", body, 1)[0]
        elif tc == ROWS_QUERY_EVENT:
            ev["rows_query"] = body[1:].decode()  # skip vestigial len byte
        elif tc == XID_EVENT:
            ev["xid"] = struct.unpack_from("<Q", body, 0)[0]
        elif tc in (GTID_LOG_EVENT, ANONYMOUS_GTID_LOG_EVENT):
            ev["commit_flag"] = bool(body[0])
            ev["sid"] = bytes(body[1:17])
            ev["gno"] = struct.unpack_from("<q", body, 17)[0]
            if len(body) >= 42:  # 5.7+ logical timestamps present
                ev["last_committed"], ev["sequence_number"] = struct.unpack_from(
                    "<qq", body, 26
                )
        elif tc == PREVIOUS_GTIDS_LOG_EVENT:
            n_sids = struct.unpack_from("<Q", body, 0)[0]
            gtid_set: dict[bytes, list[tuple[int, int]]] = {}
            p2 = 8
            for _ in range(n_sids):
                sid = bytes(body[p2 : p2 + 16])
                n_iv = struct.unpack_from("<Q", body, p2 + 16)[0]
                p2 += 24
                ivs = []
                for _ in range(n_iv):
                    s0, e0 = struct.unpack_from("<QQ", body, p2)
                    ivs.append((s0, e0))
                    p2 += 16
                gtid_set[sid] = ivs
            ev["gtid_set"] = gtid_set
        elif tc == TRANSACTION_PAYLOAD_EVENT:
            p2, comp, usize, psize = 0, COMPRESS_NONE, None, None
            while True:
                # bound the TLV walk by the event body: a truncated or
                # malformed header is a ValueError (torn-frame class),
                # never an IndexError out of _read_lenenc
                if p2 >= len(body):
                    raise ValueError(
                        "truncated TRANSACTION_PAYLOAD header (no end mark)"
                    )
                ftype, p2 = _read_lenenc(body, p2)
                if ftype == _OTW_HEADER_END:
                    break
                if p2 >= len(body):
                    raise ValueError(
                        "truncated TRANSACTION_PAYLOAD header field"
                    )
                flen, p2 = _read_lenenc(body, p2)
                if p2 + flen > len(body):
                    raise ValueError(
                        "TRANSACTION_PAYLOAD header field overruns event body"
                    )
                if ftype == _OTW_COMPRESSION_TYPE:
                    comp, _ = _read_lenenc(body, p2)
                elif ftype == _OTW_UNCOMPRESSED_SIZE:
                    usize, _ = _read_lenenc(body, p2)
                elif ftype == _OTW_PAYLOAD_SIZE:
                    psize, _ = _read_lenenc(body, p2)
                p2 += flen  # unknown fields skip by length (forward compat)
            blob = bytes(body[p2 : p2 + psize] if psize is not None else body[p2:])
            if comp == COMPRESS_ZSTD:
                raw = _zstd_decompress(blob, usize)
            elif comp == COMPRESS_NONE:
                raw = blob
            else:
                raise ValueError(f"unknown payload compression type {comp}")
            ev["compression_type"] = comp
            ev["uncompressed_size"] = len(raw)
            # re-frame checksum-off inner events and decode them with the
            # SAME decoder — a payload is self-contained (its TABLE_MAPs
            # ride inside), so the fresh inner registry is correct
            ev["events"] = decode_events(
                add_event_checksums(raw), verify_crc=verify_crc
            )
        elif tc == INCIDENT_EVENT:
            # incident number(2) | msg_len(1) msg — LOST_EVENTS marker; a
            # replica must treat the gap as unrecoverable
            ev["incident_number"] = struct.unpack_from("<H", body, 0)[0]
            mlen = body[2] if len(body) > 2 else 0
            ev["incident_message"] = bytes(body[3 : 3 + mlen]).decode(
                errors="replace"
            )
        elif tc == BEGIN_LOAD_QUERY_EVENT:
            # file_id(4) | raw block bytes (LOAD DATA LOCAL INFILE chunk)
            ev["file_id"] = struct.unpack_from("<I", body, 0)[0]
            ev["block"] = bytes(body[4:])
        elif tc == EXECUTE_LOAD_QUERY_EVENT:
            # QUERY post-header + file_id(4) start(4) end(4) dup(1),
            # then status-vars / db / query text like QUERY_EVENT
            _tid, _et, dlen, _ec, svlen = struct.unpack_from("<IIBHH", body, 0)
            ev["file_id"], ev["fn_pos_start"], ev["fn_pos_end"] = (
                struct.unpack_from("<III", body, 13)
            )
            ev["dup_handling"] = body[25]
            p2 = 26 + svlen
            ev["db"] = bytes(body[p2 : p2 + dlen]).decode()
            ev["query"] = bytes(body[p2 + dlen + 1 :]).decode(
                errors="replace"
            )
        elif tc in (STOP_EVENT, IGNORABLE_LOG_EVENT):
            pass  # typed marker, no payload semantics (LogDecoder parity)
        elif tc == MARIA_GTID_EVENT:
            # seq_no(8) domain_id(4) flags(1) — mariadb replication doc
            if len(body) < 12:
                raise ValueError("truncated MariaDB GTID event body")
            ev["gtid_seq_no"] = struct.unpack_from("<Q", body, 0)[0]
            ev["gtid_domain_id"] = struct.unpack_from("<I", body, 8)[0]
            ev["gtid_flags"] = body[12] if len(body) > 12 else 0
        elif tc == MARIA_GTID_LIST_EVENT:
            if len(body) < 4:
                raise ValueError("truncated MariaDB GTID_LIST event body")
            cnt = struct.unpack_from("<I", body, 0)[0] & 0x0FFFFFFF
            if 4 + 16 * cnt > len(body):
                raise ValueError("MariaDB GTID_LIST overruns event body")
            lst = []
            p2 = 4
            for _ in range(cnt):
                dom, srv_id, seq = struct.unpack_from("<IIQ", body, p2)
                lst.append((dom, srv_id, seq))
                p2 += 16
            ev["gtid_list"] = lst
        elif tc == MARIA_BINLOG_CHECKPOINT_EVENT:
            if len(body) < 4:
                raise ValueError("truncated MariaDB checkpoint event body")
            flen = struct.unpack_from("<I", body, 0)[0]
            if 4 + flen > len(body):
                raise ValueError(
                    "MariaDB checkpoint filename overruns event body"
                )
            ev["checkpoint_file"] = bytes(body[4 : 4 + flen]).decode(
                errors="replace"
            )
        elif tc == MARIA_ANNOTATE_ROWS_EVENT:
            # the original statement text, like ROWS_QUERY
            ev["rows_query"] = bytes(body).decode(errors="replace")
        elif tc == MARIA_START_ENCRYPTION_EVENT:
            # scheme(1) key_version(4) nonce(12) — everything after this
            # event is AES-CTR ciphertext (MariaDB encrypt_binlog=ON).
            # Decode the marker, then REFUSE the rest: parsing ciphertext
            # as frames would surface garbage rows, not an error.
            if len(body) < 17:
                raise ValueError("truncated START_ENCRYPTION event body")
            ev["crypto_scheme"] = body[0]
            ev["key_version"] = struct.unpack_from("<I", body, 1)[0]
            ev["nonce"] = bytes(body[5:17])
            events.append(ev)
            if pos + elen < len(buf):
                raise ValueError(
                    "encrypted binlog: events after START_ENCRYPTION "
                    f"(scheme={body[0]}, key_version={ev['key_version']}) "
                    "are AES ciphertext — decryption requires the server "
                    "key file; re-dump with binlog encryption off"
                )
            pos += elen
            continue
        elif tc == INTVAR_EVENT:
            # type(1): 1 = LAST_INSERT_ID, 2 = INSERT_ID; value(8)
            ev["intvar_type"] = body[0]
            ev["intvar_value"] = struct.unpack_from("<Q", body, 1)[0]
        elif tc == RAND_EVENT:
            ev["rand_seed1"], ev["rand_seed2"] = struct.unpack_from(
                "<QQ", body, 0
            )
        elif tc == USER_VAR_EVENT:
            nlen = struct.unpack_from("<I", body, 0)[0]
            ev["var_name"] = bytes(body[4 : 4 + nlen]).decode(
                errors="replace"
            )
            p2 = 4 + nlen
            if body[p2]:  # is_null
                ev["var_value"] = None
            else:
                vtype = body[p2 + 1]
                vlen = struct.unpack_from("<I", body, p2 + 6)[0]
                raw = bytes(body[p2 + 10 : p2 + 10 + vlen])
                if vtype == 0:  # STRING_RESULT
                    ev["var_value"] = raw.decode(errors="replace")
                elif vtype == 1:  # REAL_RESULT
                    ev["var_value"] = struct.unpack("<d", raw)[0]
                elif vtype == 2:  # INT_RESULT
                    ev["var_value"] = int.from_bytes(
                        raw, "little", signed=True
                    )
                else:  # DECIMAL_RESULT (4): packed; surface raw bytes
                    ev["var_value"] = raw
        elif tc == HEARTBEAT_LOG_EVENT:
            ev["log_ident"] = body.decode(errors="replace")
        elif tc == ROTATE_EVENT:
            ev["position"] = struct.unpack_from("<Q", body, 0)[0]
            ev["next_file"] = body[8:].decode()
        events.append(ev)
        pos += elen
    return events



def expand_payload_events(events: list[dict]) -> list[dict]:
    """Flatten TRANSACTION_PAYLOAD wrappers: a compressed transaction's
    inner events surface inline, in order, exactly where the payload
    event sat — consumers see the same stream the server would have
    written with transaction compression OFF."""
    out: list[dict] = []
    for ev in events:
        if ev["type"] == TRANSACTION_PAYLOAD_EVENT and "events" in ev:
            out.extend(ev["events"])
        else:
            out.append(ev)
    return out


def decode_named_rows(buf: bytes, verify_crc: bool = True) -> list[dict]:
    """Registry-FREE attach: decode a binlog_row_metadata=FULL byte stream
    into named row changes — ``{db, tbl, action, pk, values: {col: v}}``
    with ENUM indexes / SET bitmasks resolved to labels from the wire's
    own TLVs. This is what lets a downstream consume a stream it has
    never seen a schema for (the reference's column-aware processing
    reads the same TABLE_MAP fields, TableMapLogEvent.java)."""
    _ACTION = {
        WRITE_ROWS_EVENT: "INSERT", UPDATE_ROWS_EVENT: "UPDATE",
        DELETE_ROWS_EVENT: "DELETE", WRITE_ROWS_EVENT_V1: "INSERT",
        UPDATE_ROWS_EVENT_V1: "UPDATE", DELETE_ROWS_EVENT_V1: "DELETE",
        PARTIAL_UPDATE_ROWS_EVENT: "UPDATE",
    }
    out: list[dict] = []
    defs: dict[tuple[str, str], dict] = {}
    for ev in expand_payload_events(decode_events(buf, verify_crc=verify_crc)):
        if ev["type"] == TABLE_MAP_EVENT and "col_names" in ev:
            defs[(ev["db"], ev["tbl"])] = ev
        elif ev["type"] in _ACTION:
            dmap = defs.get((ev["db"], ev["tbl"]))
            names = ev.get("col_names") or (dmap or {}).get("col_names")
            if names is None:
                raise ValueError(
                    f"{ev['db']}.{ev['tbl']}: stream carries no COLUMN_NAME "
                    "metadata (binlog_row_metadata=FULL required)"
                )
            enum_l = (dmap or {}).get("enum_labels", {})
            set_l = (dmap or {}).get("set_labels", {})
            pk_cols = ev.get("pk_columns") or (dmap or {}).get("pk_columns") or []
            # partial row images (binlog_row_image=MINIMAL/NOBLOB): the
            # named dicts carry PRESENT columns only — an absent column is
            # "not in the image", which is different from NULL
            pres_b = ev.get("present_columns")
            pres_a = ev.get("present_columns_after")

            def named(img, present=None):
                vals = {}
                for i in (present if present is not None else range(len(names))):
                    v = img[i]
                    if v is not None and i in enum_l:
                        v = enum_l[i][v - 1] if v else ""
                    elif v is not None and i in set_l:
                        v = ",".join(
                            s for b, s in enumerate(set_l[i]) if v >> b & 1
                        )
                    vals[names[i]] = v
                return vals

            for row in ev["rows"]:
                if ev["type"] in UPDATE_EVENTS:
                    before, after = named(row[0], pres_b), named(row[1], pres_a)
                    # partial JSON (type 39): materialize the diff vector
                    # against the before-image document when it rides the
                    # same event; otherwise surface the diffs themselves
                    for k, v in list(after.items()):
                        if isinstance(v, JsonDiffVector) and k in before:
                            after[k] = apply_json_diffs(before[k], v)
                    img = after
                    # MINIMAL updates identify the row by the BEFORE image
                    # (PK-only); fall back to the after image when the PK
                    # column only rides there
                    pkd = {
                        names[i]: before.get(names[i], after.get(names[i]))
                        for i in pk_cols
                    }
                else:
                    before, after = None, None
                    img = named(row, pres_b)
                    pkd = {names[i]: img.get(names[i]) for i in pk_cols}
                out.append({
                    "db": ev["db"], "tbl": ev["tbl"],
                    "action": _ACTION[ev["type"]],
                    "pk": pkd,
                    "values": img,
                    **({"before": before, "after": after}
                       if before is not None else {}),
                })
    return out


def write_binlog_file(path: str, events: list[bytes],
                      next_file: str | None = None) -> None:
    """magic + FDE + events [+ ROTATE] — LogFileGenerator's file layout."""
    with open(path, "wb") as fh:
        fh.write(MAGIC)
        fh.write(encode_fde())
        for e in events:
            fh.write(e)
        if next_file:
            fh.write(encode_rotate(next_file))


def read_binlog_file(path: str) -> list[dict]:
    with open(path, "rb") as fh:
        buf = fh.read()
    if buf[:4] != MAGIC:
        raise ValueError(f"{path}: not a binlog file (bad magic)")
    return decode_events(buf[4:])


def recover_wire_file(path: str) -> tuple[int, int]:
    """Truncate a torn wire file back to its last COMPLETE event — the
    crash-recovery pass a writer runs before resuming append
    (BinlogFile.seekLastTso / LogFileGenerator.java:510-545 walk-and-
    truncate semantics). Returns (events_kept, bytes_dropped); 0 dropped
    means the file was already clean."""
    import os

    with open(path, "rb") as fh:
        buf = fh.read()
    if buf[:4] != MAGIC:
        raise ValueError(f"{path}: not a binlog file (bad magic)")
    body = buf[4:]
    # walk complete, CRC-valid events; stop at the tear
    pos = 0
    kept = 0
    while pos + HEADER_LEN <= len(body):
        elen = struct.unpack_from("<I", body, pos + 9)[0]
        if elen < HEADER_LEN + CHECKSUM_LEN or pos + elen > len(body):
            break
        frame = body[pos : pos + elen]
        want = struct.unpack_from("<I", frame, elen - CHECKSUM_LEN)[0]
        if want != (zlib.crc32(frame[: elen - CHECKSUM_LEN]) & 0xFFFFFFFF):
            break
        pos += elen
        kept += 1
    dropped = len(body) - pos
    if dropped:
        with open(path, "r+b") as fh:
            fh.truncate(4 + pos)
    return kept, dropped


# ---------------------------------------------------------------------------
# Spark plumbing: DataFrame of CDC events ⟷ wire bytes, Arrow-batched
# ---------------------------------------------------------------------------

#: canonical wire layout for the engine's CDC frame (pk VARCHAR(64),
#: value DOUBLE) — what ``derive_cdc_stream`` transports
CDC_TABLE_TYPES = ["varchar(64)", "double"]


def events_to_binlog(df, out_schema: str = "db string, tbl string, n_events int, payload binary"):
    """Serialize a CDC frame (db, tbl, action, pk, value, tso) into binlog
    wire bytes — one blob per (partition × table run), each blob a
    TABLE_MAP + one ROWS event per change, CRC32-checksummed.

    Scale shape: ``mapInPandas`` (Arrow batches; zero row-at-a-time
    Python); each partition encodes independently, so 1000 executors
    serialize 1000 ways in parallel — the per-file ORDER is whatever the
    caller partitioned/sorted by (the sink's offset assignment), exactly
    like the per-stream dumper thread, but across all streams at once."""
    _ROW_TYPE = {
        "INSERT": WRITE_ROWS_EVENT,
        "UPDATE": UPDATE_ROWS_EVENT,
        "DELETE": DELETE_ROWS_EVENT,
    }

    def encode_partition(batches):
        import numpy as np
        import pandas as pd

        no_codec = [None, None]
        off2 = [False, False]
        post = struct.pack("<H", 0) + struct.pack("<H", 2)
        head2 = _lenenc(2) + _bitmap([True, True])
        for pdf in batches:
            if pdf.empty:
                continue
            out_rows = []
            for (db, tbl), grp in pdf.groupby(["db", "tbl"], sort=False):
                td = TableDef.from_mysql_types(db, tbl, CDC_TABLE_TYPES)
                tid = zlib.crc32(f"{db}.{tbl}".encode()) & 0x7FFFFFFF
                blob = bytearray(encode_table_map(tid, td))
                # vectorized path: every image of the group in one numpy
                # pass (UPDATE rows carry identical before/after images —
                # duplicated by a ragged scatter), then one multi-row
                # event per consecutive same-action run, exactly the old
                # framing (header+CRC per run, not per row)
                enc = _encode_write_images(
                    td, grp, ["pk", "value"], no_codec, off2, off2, None,
                    np, pd,
                )
                if enc is not None:
                    buf, off = enc
                    ev_head = struct.pack("<Q", tid)[:6] + post + head2
                    acts = grp["action"].to_numpy()
                    bnd = np.flatnonzero(acts[1:] != acts[:-1]) + 1
                    starts = np.concatenate(([0], bnd))
                    ends = np.concatenate((bnd, [len(acts)]))
                    for i0, i1 in zip(starts, ends):
                        tc = _ROW_TYPE[acts[i0]]
                        seg = buf[off[i0]:off[i1]]
                        if tc == UPDATE_ROWS_EVENT:
                            L = np.diff(off[i0:i1 + 1])
                            src = off[i0:i1] - off[i0]
                            base = np.concatenate(
                                ([0], np.cumsum(2 * L)))[:-1]
                            dup = np.empty(2 * seg.size, np.uint8)
                            idx = (np.repeat(base - src, L)
                                   + np.arange(seg.size))
                            dup[idx] = seg
                            dup[idx + np.repeat(L, L)] = seg
                            body = (ev_head + _bitmap([True, True])
                                    + dup.tobytes())
                        else:
                            body = ev_head + seg.tobytes()
                        blob += encode_event(tc, body)
                    out_rows.append((db, tbl, len(grp), bytes(blob)))
                    continue
                # row-path fallback (kept monkeypatch-reachable for the
                # byte-identity A/B test)
                run_type, run_rows = None, []
                for r in grp.itertuples(index=False):
                    tc = _ROW_TYPE[r.action]
                    if tc != run_type and run_rows:
                        blob += encode_rows_event(run_type, tid, td, run_rows)
                        run_rows = []
                    run_type = tc
                    vals = [r.pk, None if pd.isna(r.value) else float(r.value)]
                    run_rows.append(
                        (vals, vals) if tc == UPDATE_ROWS_EVENT else vals
                    )
                if run_rows:
                    blob += encode_rows_event(run_type, tid, td, run_rows)
                out_rows.append((db, tbl, len(grp), bytes(blob)))
            yield pd.DataFrame(
                out_rows, columns=["db", "tbl", "n_events", "payload"]
            )

    return df.mapInPandas(encode_partition, out_schema)


def binlog_to_events(df, payload_col: str = "payload",
                     out_schema: str = "db string, tbl string, action string, pk string, value double"):
    """Decode wire-byte blobs back into a CDC frame — the attach path a
    binlog consumer runs, as a distributed scan (one decode per blob,
    Arrow-batched)."""
    _ACTION = {
        WRITE_ROWS_EVENT: "INSERT",
        UPDATE_ROWS_EVENT: "UPDATE",
        DELETE_ROWS_EVENT: "DELETE",
        WRITE_ROWS_EVENT_V1: "INSERT",
        UPDATE_ROWS_EVENT_V1: "UPDATE",
        DELETE_ROWS_EVENT_V1: "DELETE",
        PARTIAL_UPDATE_ROWS_EVENT: "UPDATE",
    }

    def decode_partition(batches):
        import pandas as pd

        for pdf in batches:
            # columnar build (r14, guide §4.2): constant-per-event
            # db/tbl/action extend by list multiplication; pk/value via
            # one comprehension per event — no per-row 5-tuple +
            # row→column transpose in pandas
            dbs: list = []
            tbls: list = []
            acts: list = []
            pks: list = []
            vals: list = []
            for blob in pdf[payload_col]:
                for ev in expand_payload_events(decode_events(bytes(blob))):
                    tc = ev["type"]
                    if tc not in _ACTION:
                        continue
                    rows = ev["rows"]
                    if tc in UPDATE_EVENTS:
                        imgs = [r[1] for r in rows]
                        if tc == PARTIAL_UPDATE_ROWS_EVENT:
                            # partial JSON (type 39): never surface raw
                            # JsonDiff objects into the double column —
                            # materialize against the before image and
                            # keep only a numeric result
                            for r, img in zip(rows, imgs):
                                v = img[1]
                                if isinstance(v, JsonDiffVector):
                                    doc = apply_json_diffs(r[0][1], v)
                                    v = (float(doc) if isinstance(
                                        doc, (int, float)) else None)
                                vals.append(v)
                        else:
                            vals.extend(i[1] for i in imgs)
                    else:
                        imgs = rows
                        vals.extend(i[1] for i in imgs)
                    pks.extend(i[0] for i in imgs)
                    n = len(rows)
                    dbs.extend([ev["db"]] * n)
                    tbls.extend([ev["tbl"]] * n)
                    acts.extend([_ACTION[tc]] * n)
            yield pd.DataFrame(
                {"db": dbs, "tbl": tbls, "action": acts,
                 "pk": pks, "value": vals}
            )

    return df.mapInPandas(decode_partition, out_schema)


def export_wire_files(spark, sink_dir: str, wire_dir: str,
                      incremental: bool = False,
                      trace_markers: bool = False,
                      emit_gtid: bool = False,
                      compress_txns: bool = False,
                      row_metadata_full: bool = False):
    """Materialize a BinlogSink parquet directory as REAL MySQL binlog
    files — the attach surface for a downstream that speaks the wire
    format (LogFileGenerator.java:624-757 writes these natively; here the
    rotated-parquet sink stays the scale path and this exporter renders it
    on demand).

    One wire file per ``file_seq`` partition (``binlog.000001``, ...),
    events in offset order; BEGIN frame rows become QUERY("BEGIN") events
    (writeBegin:624), COMMIT rows become XID events keyed by txn_id
    (writeCommit:713), each file ends with a ROTATE to its successor.

    ``compress_txns`` (requires a txn-framed sink): each transaction's
    body (BEGIN through XID) renders as ONE TRANSACTION_PAYLOAD event —
    binlog_transaction_compression=ON framing; GCN/GTID carriers stay
    outside the payload exactly like the server leaves the GTID event
    uncompressed. Decoders expand payloads transparently
    (``expand_payload_events``).

    ``row_metadata_full``: TABLE_MAPs carry the binlog_row_metadata=FULL
    TLVs (COLUMN_NAME + PRIMARY_KEY), so a consumer that has never seen a
    schema attaches registry-free via ``decode_named_rows``.

    ``incremental=True`` is the CONTINUOUS-operation mode (schedule after
    each micro-batch or on a timer): a ``_manifest.json`` in ``wire_dir``
    records per-file event counts, and only files whose partition grew,
    appeared, or just gained a successor (→ needs its ROTATE appended)
    are re-rendered — steady state re-renders exactly one tail file per
    cycle regardless of history length.

    Scale shape: ``applyInPandas`` grouped by file_seq — every file
    encodes AND writes inside its own task (the manifest, one row per
    file, is the only thing that comes back), so a 10k-file binlog
    directory renders with 10k-way parallelism and zero driver data
    motion. ``wire_dir`` must be a shared filesystem/object-store path.

    EAGER: rendering executes inside this call on BOTH paths — the wire
    files exist on disk the moment it returns, and the returned manifest
    DataFrame (file_seq, file_name, n_events, n_bytes — the files
    rendered THIS call) is materialized, so re-consuming it never
    re-renders."""
    import json
    import os

    from pyspark.sql import functions as F

    df = spark.read.parquet(sink_dir)
    framed = "txn_commit_tso" in df.columns
    max_seq = df.agg(F.max("file_seq")).collect()[0][0]
    os.makedirs(wire_dir, exist_ok=True)
    cols = ["file_seq", "offset", "action", "db", "tbl", "pk", "value"] + (
        ["txn_id", "txn_commit_tso"] if framed else []
    )

    full_df = df  # GTID bookkeeping below always folds over the FULL sink
    manifest_path = os.path.join(wire_dir, "_manifest.json")
    if incremental:
        try:
            with open(manifest_path) as fh:
                prev = {int(k): v for k, v in json.load(fh).items()}
        except FileNotFoundError:
            prev = {}
        counts = {
            r["file_seq"]: r["n"]
            for r in df.groupBy("file_seq").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        old_max = max(prev) if prev else -1
        changed = {
            seq for seq, n in counts.items()
            if prev.get(seq) != n
            # previous tail gained a successor → re-render for its ROTATE
            or (seq == old_max and max_seq > old_max)
        }
        if not changed:
            return spark.createDataFrame(
                [], "file_seq bigint, file_name string, n_events bigint, n_bytes bigint"
            )
        df = df.filter(F.col("file_seq").isin([int(s) for s in changed]))

    # GTID bookkeeping: each file opens with PREVIOUS_GTIDS carrying the
    # gno (= txn_id) intervals of every txn in PRECEDING files — what a
    # COM_BINLOG_DUMP_GTID attach resolves its start file against.
    # Interval compression happens executor-side (per-file applyInPandas);
    # only the compressed intervals — near-sequential txn ids collapse to
    # a handful per file — reach the driver for the cumulative fold. This
    # runs AFTER the incremental no-change early-return so a caught-up
    # export cycle costs zero extra jobs.
    prev_by_seq: dict[int, list[tuple[int, int]]] = {}
    if emit_gtid and framed:
        import pandas as _pd

        def _file_intervals(key, pdf):
            ids = sorted({int(t) for t in pdf["txn_id"]})
            ivs: list[list[int]] = []
            for i in ids:
                if ivs and i <= ivs[-1][1]:
                    ivs[-1][1] = max(ivs[-1][1], i + 1)
                else:
                    ivs.append([i, i + 1])
            return _pd.DataFrame(
                {"file_seq": [int(key[0])] * len(ivs),
                 "s": [a for a, _ in ivs], "e": [b for _, b in ivs]}
            )

        iv_rows = (
            full_df.filter(F.col("action") == "COMMIT")
            .select("file_seq", "txn_id")
            .groupBy("file_seq")
            .applyInPandas(_file_intervals, "file_seq bigint, s bigint, e bigint")
            .collect()
        )
        by_seq: dict[int, list[tuple[int, int]]] = {}
        for r in iv_rows:
            by_seq.setdefault(int(r["file_seq"]), []).append((int(r["s"]), int(r["e"])))
        cum: list[tuple[int, int]] = []
        for seq in range(int(max_seq) + 1):
            prev_by_seq[seq] = list(cum)
            merged: list[tuple[int, int]] = []
            for s, e in sorted(cum + by_seq.get(seq, [])):
                if merged and s <= merged[-1][1]:
                    merged[-1] = (merged[-1][0], max(merged[-1][1], e))
                else:
                    merged.append((s, e))
            cum = merged

    _ROW_TYPE = {
        "INSERT": WRITE_ROWS_EVENT,
        "UPDATE": UPDATE_ROWS_EVENT,
        "DELETE": DELETE_ROWS_EVENT,
    }

    def render_file(key, pdf):
        import numpy as np
        import pandas as pd

        seq = int(key[0])
        pdf = pdf.sort_values("offset")
        events: list[bytes] = []
        if emit_gtid and framed:
            ivs = prev_by_seq.get(seq, [])
            events.append(
                encode_previous_gtids({_ENGINE_SID: ivs} if ivs else {})
            )
        current_table: tuple[str, str] | None = None
        # txn buffer: with compress_txns the BEGIN..XID body collects here
        # and lands as ONE TRANSACTION_PAYLOAD event at commit
        txn_buf: list[bytes] | None = None
        # run buffer: consecutive same-(action, table) rows share ONE
        # multi-row event — a header+CRC per run instead of per row (the
        # reference's dumper also packs row batches per event)
        run_type: int | None = None
        run_rows: list = []

        def sink_list() -> list[bytes]:
            return events if txn_buf is None else txn_buf

        meta_kw = (
            {"col_names": ["pk", "value"], "pk": [0]}
            if row_metadata_full else {}
        )

        # vectorized image pass (r14, guide §4.2): ALL row images of the
        # file in one numpy pass up front — image bytes depend only on
        # CDC_TABLE_TYPES, not on (db,tbl)/meta_kw (those shape the
        # TABLE_MAP, emitted separately below) — then each run flush
        # slices its rows from the shared buffer. UPDATE rows duplicate
        # their identical before/after image with the same ragged
        # scatter as events_to_binlog. Byte identity vs the row path is
        # pinned by test_export_wire_files_vectorized_byte_identical.
        row_mask = pdf["action"].isin(_ROW_TYPE).to_numpy()
        img_enc = None
        if row_mask.any():
            img_enc = _encode_write_images(
                TableDef.from_mysql_types("x", "x", CDC_TABLE_TYPES),
                pdf[row_mask], ["pk", "value"], [None, None],
                [False, False], [False, False], None, np, pd,
            )
        img_pos = row_mask.cumsum() - 1  # image index per sorted position
        run_i0 = run_n = 0

        if img_enc is not None:
            buf_img, off_img = img_enc
            post2 = struct.pack("<H", 0) + struct.pack("<H", 2)
            head2 = _lenenc(2) + _bitmap([True, True])

            def flush_run():
                nonlocal run_type, run_n
                if run_n:
                    tid = zlib.crc32(
                        ".".join(current_table).encode()) & 0x7FFFFFFF
                    i0, i1 = run_i0, run_i0 + run_n
                    seg = buf_img[off_img[i0]:off_img[i1]]
                    ev_head = struct.pack("<Q", tid)[:6] + post2 + head2
                    if run_type == UPDATE_ROWS_EVENT:
                        L = np.diff(off_img[i0:i1 + 1])
                        src = off_img[i0:i1] - off_img[i0]
                        base = np.concatenate(([0], np.cumsum(2 * L)))[:-1]
                        dup = np.empty(2 * seg.size, np.uint8)
                        idx = np.repeat(base - src, L) + np.arange(seg.size)
                        dup[idx] = seg
                        dup[idx + np.repeat(L, L)] = seg
                        body = (ev_head + _bitmap([True, True])
                                + dup.tobytes())
                    else:
                        body = ev_head + seg.tobytes()
                    sink_list().append(encode_event(run_type, body))
                    run_n = 0
                run_type = None
        else:
            def flush_run():
                nonlocal run_type, run_rows
                if run_rows:
                    td = TableDef.from_mysql_types(
                        *current_table, CDC_TABLE_TYPES, **meta_kw
                    )
                    tid = zlib.crc32(
                        ".".join(current_table).encode()) & 0x7FFFFFFF
                    sink_list().append(
                        encode_rows_event(run_type, tid, td, run_rows))
                    run_rows = []
                run_type = None

        for p, r in enumerate(pdf.itertuples(index=False)):
            if r.action == "BEGIN":
                flush_run()
                if framed and isinstance(r.txn_commit_tso, str):
                    # commit TSO physical prefix as the txn's GCN event —
                    # seek-by-time works on the rendered files
                    events.append(encode_gcn(int(r.txn_commit_tso[:19])))
                    if emit_gtid:
                        # 5.6+-replica-shaped framing: a GTID event per
                        # txn (fixed engine sid, gno = txn id) so a
                        # GTID-aware consumer tracks positions natively
                        events.append(encode_gtid(_ENGINE_SID, int(r.txn_id)))
                if compress_txns and framed:
                    txn_buf = []
                sink_list().append(encode_query("", "BEGIN"))
                if trace_markers and framed:
                    # per-txn ROWS_QUERY trace marker, the PolarDB-X
                    # ::TRACE:: convention (RowsQueryEventBuilder.java;
                    # LogFileGenerator writes one per txn) — consumers
                    # correlate downstream rows back to the origin txn
                    sink_list().append(
                        encode_rows_query(f"/*DRDS /txn/{int(r.txn_id)}/ */")
                    )
                continue
            if r.action == "COMMIT":
                flush_run()
                sink_list().append(encode_xid(int(r.txn_id)))
                if txn_buf is not None:
                    events.append(encode_transaction_payload(txn_buf))
                    txn_buf = None
                current_table = None  # next txn re-announces its table
                continue
            tc = _ROW_TYPE[r.action]
            if current_table != (r.db, r.tbl):
                flush_run()
                current_table = (r.db, r.tbl)
                td = TableDef.from_mysql_types(
                    r.db, r.tbl, CDC_TABLE_TYPES, **meta_kw
                )
                tid = zlib.crc32(f"{r.db}.{r.tbl}".encode()) & 0x7FFFFFFF
                sink_list().append(encode_table_map(tid, td))
            elif tc != run_type:
                flush_run()
            if img_enc is not None:
                if run_n == 0:
                    run_i0 = img_pos[p]
                run_type = tc
                run_n += 1
            else:
                vals = [r.pk, None if pd.isna(r.value) else float(r.value)]
                run_type = tc
                run_rows.append(
                    (vals, vals) if tc == UPDATE_ROWS_EVENT else vals)
        if txn_buf is not None:  # torn tail: flush an open txn uncompressed
            flush_run()
            events.extend(txn_buf)
            txn_buf = None
        flush_run()
        name = f"binlog.{seq + 1:06d}"
        nxt = f"binlog.{seq + 2:06d}" if seq < max_seq else None
        path = os.path.join(wire_dir, name)
        write_binlog_file(path, events, next_file=nxt)
        return pd.DataFrame(
            [(seq, name, len(pdf), os.path.getsize(path))],
            columns=["file_seq", "file_name", "n_events", "n_bytes"],
        )

    out_schema = "file_seq bigint, file_name string, n_events bigint, n_bytes bigint"
    result = df.select(*cols).groupBy("file_seq").applyInPandas(render_file, out_schema)
    if not incremental:
        # EAGER by contract: the files must exist the moment this call
        # returns (rendering rides the applyInPandas execution — a lazy
        # return writes nothing until some later action, and a double
        # action double-renders). One row per file comes back; bounded.
        rows = result.collect()
        return spark.createDataFrame(rows, out_schema)
    rows = result.collect()  # bounded: one row per re-rendered file
    merged = dict(prev)
    for r in rows:
        merged[int(r["file_seq"])] = r["n_events"]
    tmp = manifest_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({str(k): v for k, v in merged.items()}, fh)
    os.replace(tmp, manifest_path)
    return spark.createDataFrame(rows, out_schema)


_FRAME_ACTION = {
    WRITE_ROWS_EVENT: "INSERT",
    UPDATE_ROWS_EVENT: "UPDATE",
    DELETE_ROWS_EVENT: "DELETE",
    WRITE_ROWS_EVENT_V1: "INSERT",
    UPDATE_ROWS_EVENT_V1: "UPDATE",
    DELETE_ROWS_EVENT_V1: "DELETE",
    PARTIAL_UPDATE_ROWS_EVENT: "UPDATE",
}


def wire_frame_cols(name: str, buf: bytes,
                    tolerate_truncation: bool = False) -> dict[str, list]:
    """Columnar twin of ``wire_frame_rows(include_values=False)``: the
    SAME event walk and position assignment, materialized as a dict of 8
    equal-length column lists (file_name, pos, kind, db, tbl, pk, value,
    xid). The batch attach and the streaming attach build their Arrow
    batches straight from these columns — the per-row 8-tuple build plus
    pandas' row→column transpose was the stream-tail family's biggest
    remaining Python-boundary cost after the compiled decoders (guide
    §4.2; r14). Constant-per-event columns (kind/db/tbl) extend by list
    multiplication instead of one append per row.

    ``wire_frame_rows(include_values=False)`` delegates here, so batch,
    stream and registry consumers keep ONE position recipe; parity with
    the ``include_values=True`` walk is pinned by
    test_binlog_wire.test_wire_frame_cols_matches_rows."""
    if buf[:4] == MAGIC:
        buf = buf[4:]
    elif not tolerate_truncation:
        raise ValueError(f"{name}: not a binlog file (bad magic)")
    kinds: list = []
    dbs: list = []
    tbls: list = []
    pks: list = []
    vals: list = []
    xids: list = []
    for ev in expand_payload_events(
        decode_events(buf, tolerate_truncation=tolerate_truncation)
    ):
        tc = ev["type"]
        if tc in _FRAME_ACTION:
            rows = ev["rows"]
            n = len(rows)
            if tc in UPDATE_EVENTS:
                for row in rows:
                    img = row[1]
                    # MINIMAL after-images omit the unchanged pk — the
                    # before-image carries it (same rule as the row walk)
                    pk_img = img if img and img[0] is not None else row[0]
                    pks.append(
                        str(pk_img[0])
                        if pk_img and pk_img[0] is not None
                        else None
                    )
                    v = img[1] if len(img) > 1 else None
                    vals.append(v if isinstance(v, float) else None)
            else:
                for img in rows:
                    pks.append(
                        str(img[0])
                        if img and img[0] is not None
                        else None
                    )
                    v = img[1] if len(img) > 1 else None
                    vals.append(v if isinstance(v, float) else None)
            kinds.extend([_FRAME_ACTION[tc]] * n)
            dbs.extend([ev["db"]] * n)
            tbls.extend([ev["tbl"]] * n)
            xids.extend([None] * n)
        elif tc == QUERY_EVENT:
            q = ev.get("query", "")
            if q.strip().upper() == "BEGIN":
                kinds.append("BEGIN")
                dbs.append(None)
                pks.append(None)
            else:
                kinds.append("DDL")
                dbs.append(ev.get("db"))
                pks.append(q)
            tbls.append(None)
            vals.append(None)
            xids.append(None)
        elif tc == XID_EVENT:
            kinds.append("COMMIT")
            dbs.append(None)
            tbls.append(None)
            pks.append(None)
            vals.append(None)
            xids.append(ev["xid"])
        elif tc == ROWS_QUERY_EVENT:
            kinds.append("TRACE")
            dbs.append(None)
            tbls.append(None)
            pks.append(ev["rows_query"])
            vals.append(None)
            xids.append(None)
        elif tc == GCN_EVENT:
            kinds.append("GCN")
            dbs.append(None)
            tbls.append(None)
            pks.append(None)
            vals.append(None)
            xids.append(ev["gcn"])
        elif tc == INCIDENT_EVENT:
            kinds.append("INCIDENT")
            dbs.append(None)
            tbls.append(None)
            pks.append(ev.get("incident_message") or "")
            vals.append(None)
            xids.append(ev.get("incident_number"))
    n_total = len(kinds)
    return {
        "file_name": [name] * n_total,
        "pos": list(range(n_total)),
        "kind": kinds,
        "db": dbs,
        "tbl": tbls,
        "pk": pks,
        "value": vals,
        "xid": xids,
    }


def wire_frame_rows(name: str, buf: bytes,
                    tolerate_truncation: bool = False,
                    include_values: bool = False) -> list[tuple]:
    """Decode ONE wire file's bytes (magic optional) into the consumer
    frame rows — (file_name, pos, kind, db, tbl, pk, value, xid). The
    SINGLE implementation behind the batch attach (`read_wire_binlog`),
    the streaming attach (`streaming.source.wire_stream`) AND the
    registry-typed attach (`decode_wire_with_registry`): ``pos``
    is the row index within the file counting EVERY surfaced row (rows,
    BEGIN/COMMIT, DDL, TRACE, GCN, and — since round 8 — INCIDENT
    markers), so all paths assign identical replication positions and
    an applier can move between them. Offsets persisted BEFORE incident
    surfacing remain valid for incident-free files (no in-repo exporter
    ever emits INCIDENT; the row exists for externally produced
    streams, where a replica must stop at the gap anyway).

    ``include_values=True`` appends TWO elements to every tuple: [8] the
    row's full decoded image values (AFTER image for UPDATEs, with
    type-39 JSON diff vectors materialized; BEFORE image for DELETEs),
    and [9] the surfaced image's present-column index list when the
    image is PARTIAL (binlog_row_image=MINIMAL/NOBLOB — absent columns
    were PADDED to None by the decoder, indistinguishable from real
    NULLs by value alone) or ``None`` for full images. Both are ``None``
    on non-row kinds — keeping position assignment and typed decode in
    ONE implementation so they can never drift. (The value-free form
    delegates to the columnar walk — zip of its columns — so the hot
    consumers and this surface share one recipe there too.)"""
    if not include_values:
        c = wire_frame_cols(name, buf, tolerate_truncation)
        return list(zip(c["file_name"], c["pos"], c["kind"], c["db"],
                        c["tbl"], c["pk"], c["value"], c["xid"]))
    _ACTION = _FRAME_ACTION
    if buf[:4] == MAGIC:
        buf = buf[4:]
    elif not tolerate_truncation:
        raise ValueError(f"{name}: not a binlog file (bad magic)")
    out: list[tuple] = []
    pos = 0
    for ev in expand_payload_events(
        decode_events(buf, tolerate_truncation=tolerate_truncation)
    ):
        tc = ev["type"]
        if tc in _ACTION:
            for row in ev["rows"]:
                img = row[1] if tc in UPDATE_EVENTS else row
                # frame contract is (pk, value); narrower or
                # differently-typed tables surface what they
                # have (typed decode uses binlog_to_table)
                pk_img = img
                if tc in UPDATE_EVENTS and (not img or img[0] is None):
                    # MINIMAL after-images omit the unchanged pk — the
                    # before-image carries it; never render the literal
                    # string "None" as a key
                    pk_img = row[0]
                pk = (
                    str(pk_img[0])
                    if pk_img and pk_img[0] is not None
                    else None
                )
                val = img[1] if len(img) > 1 else None
                rec = (name, pos, _ACTION[tc], ev["db"], ev["tbl"],
                       pk, val if isinstance(val, float) else None,
                       None)
                if include_values:
                    vals = img
                    if tc == PARTIAL_UPDATE_ROWS_EVENT:
                        vals = [
                            apply_json_diffs(b, v)
                            if isinstance(v, JsonDiffVector) else v
                            for b, v in zip(row[0], vals)
                        ]
                    present = (
                        ev.get("present_columns_after")
                        if tc in UPDATE_EVENTS
                        else ev.get("present_columns")
                    )
                    rec = rec + (list(vals), present)
                out.append(rec)
                pos += 1
        elif tc == QUERY_EVENT:
            q = ev.get("query", "")
            if q.strip().upper() == "BEGIN":
                out.append(
                    (name, pos, "BEGIN", None, None, None, None, None)
                )
            else:
                # DDL statement travelling as a QUERY event
                # (QueryEventReformator path): text surfaces
                # in the pk slot, like TRACE markers
                out.append(
                    (name, pos, "DDL", ev.get("db"), None, q,
                     None, None)
                )
            pos += 1
        elif tc == XID_EVENT:
            out.append(
                (name, pos, "COMMIT", None, None, None, None, ev["xid"])
            )
            pos += 1
        elif tc == ROWS_QUERY_EVENT:
            # trace marker: text surfaces in the pk slot
            out.append(
                (name, pos, "TRACE", None, None,
                 ev["rows_query"], None, None)
            )
            pos += 1
        elif tc == GCN_EVENT:
            # txn commit-time carrier: gcn surfaces in the xid
            # column (both are the txn-scope bigint slot)
            out.append(
                (name, pos, "GCN", None, None, None, None, ev["gcn"])
            )
            pos += 1
        elif tc == INCIDENT_EVENT:
            # LOST_EVENTS marker: appliers must see the gap as a typed
            # row (a real replica stops with ER_SLAVE_INCIDENT) — the
            # message travels in the pk slot like TRACE markers
            out.append(
                (name, pos, "INCIDENT", None, None,
                 ev.get("incident_message") or "", None,
                 ev.get("incident_number"))
            )
            pos += 1
    if include_values:
        return [t if len(t) == 10 else t + (None, None) for t in out]
    return out


WIRE_FRAME_SCHEMA = (
    "file_name string, pos long, kind string, db string, tbl string, "
    "pk string, value double, xid bigint"
)


def read_wire_binlog(spark, wire_dir: str, glob: str = "binlog.*"):
    """Decode a directory of wire binlog files back into an event frame
    (file_name, pos, kind, db, tbl, pk, value, xid) — the consumer attach
    path, distributed: ``binaryFile`` scan + per-file decode in
    ``mapInPandas`` (one Arrow batch per file; files are rotation-bounded
    so a batch is at most rotate_rows events). ``pos`` is the row's index
    within its file: (file_name, pos) is the real binlog consumer's
    replication position, totally ordering the stream across the rotated
    chain (files sort by name) — appliers replay by it."""

    def decode_files(batches):
        import os

        import pandas as pd

        cols = ["file_name", "pos", "kind", "db", "tbl", "pk",
                "value", "xid"]
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in cols}
            for path, content in zip(pdf["path"], pdf["content"]):
                c = wire_frame_cols(os.path.basename(path), bytes(content))
                for k in cols:
                    out[k].extend(c[k])
            yield pd.DataFrame(out)

    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)  # default skips _manifest.json + X chains
        .load(wire_dir)
        .select("path", "content")
        .mapInPandas(decode_files, WIRE_FRAME_SCHEMA)
    )


# ---------------------------------------------------------------------------
# Generic typed-table wire path: ANY DataFrame ⟷ binlog bytes
# ---------------------------------------------------------------------------


def _parse_time_str(s: str):
    """'[-]H:MM:SS[.ffffff]' → timedelta (MySQL TIME text form)."""
    import datetime

    neg = s.startswith("-")
    body = s[1:] if neg else s
    hh, mm, rest = body.split(":")
    if "." in rest:
        ss, frac = rest.split(".")
        micros = int(frac.ljust(6, "0")[:6])
    else:
        ss, micros = rest, 0
    td = datetime.timedelta(
        hours=int(hh), minutes=int(mm), seconds=int(ss), microseconds=micros
    )
    return -td if neg else td


def _format_time(td) -> str:
    total = td.days * 86400 + td.seconds
    h, rem = divmod(total, 3600)
    m, s = divmod(rem, 60)
    out = f"{h:02d}:{m:02d}:{s:02d}"
    if td.microseconds:
        out += f".{td.microseconds:06d}".rstrip("0")
    return out




def _decl_labels(decl: str) -> list[str]:
    import re as _re

    return _re.findall(r"'([^']*)'", decl)


def _label_codecs(mysql_types: list[str]):
    """Per-column (to_wire, from_wire) for ENUM/SET/JSON label resolution —
    the Spark tier speaks labels / JSON text (types.spark_type_for), the
    wire speaks 1-based indexes / bitmasks / binary documents
    (EnumField/SetField.java resolve the same way on the reference side).
    Identity for every other type."""
    import json as _json

    codecs = []
    for decl in mysql_types:
        t = decl.strip().lower()
        if t.startswith("enum("):
            labels = _decl_labels(decl)
            idx = {s: i + 1 for i, s in enumerate(labels)}
            codecs.append((
                lambda v, idx=idx: v if isinstance(v, int) else idx[v],
                lambda v, labels=labels: labels[v - 1] if v else "",
            ))
        elif t.startswith("set("):
            labels = _decl_labels(decl)
            bit = {s: 1 << i for i, s in enumerate(labels)}

            def to_mask(v, bit=bit):
                if isinstance(v, int):
                    return v
                return sum(bit[s] for s in v.split(",") if s)

            def from_mask(v, labels=labels):
                return ",".join(s for i, s in enumerate(labels) if v >> i & 1)

            codecs.append((to_mask, from_mask))
        elif t.startswith("json"):
            codecs.append((
                lambda v: v if isinstance(v, (bytes, bytearray, dict, list)) else _json.loads(v),
                # canonical text form (sorted keys, no spaces) — documented:
                # original text spacing is not preserved through the binary form
                lambda v: _json.dumps(v, separators=(",", ":"), sort_keys=True),
            ))
        else:
            codecs.append(None)
    return codecs


def fan_out_key(df, par: int, key_cols: list[str] | None = None):
    """Deterministic synthetic shuffle key for a fan-out exchange (guide
    §2.5): ``pmod(xxhash64(all hashable cols), 50*par)`` — retry-safe
    (same row → same partition on task re-run, unlike rand()-derived
    keys, SPARK-38388) and sort-free (keyless round-robin pays a full
    local sort first, SPARK-23207). 50×par distinct values keep the hash
    spread even. Returns None when no column is hashable (maps). Works
    for BATCH and STREAMING frames — it only reads the schema.

    ``key_cols``: hash only these columns — for frames carrying a wide
    payload (documents, blobs) next to a high-cardinality id, hashing
    the id alone costs O(8 bytes/row) instead of O(payload); callers
    must pick columns whose combination is near-unique or the 50×par
    spread collapses (guide §2.5 synthetic-key pitfall)."""
    from pyspark.sql import functions as _F
    from pyspark.sql import types as _T

    hashable = key_cols if key_cols is not None else [
        f.name for f in df.schema.fields
        if not isinstance(f.dataType, _T.MapType)  # hash() rejects maps
    ]
    if not hashable:
        return None
    return _F.pmod(_F.xxhash64(*[_F.col(c) for c in hashable]),
                   _F.lit(50 * par))


def fan_out(df, par: int | None = None, key_cols: list[str] | None = None):
    """Spread a narrow frame across the cluster ahead of a heavy Python
    stage. The driver testdata parquet is ONE row group per file, so the
    scan can never exceed one task per file — an exchange is the only
    fan-out. A keyless ``repartition(n)`` would pay a full local sort of
    its input first (``spark.sql.execution.sortBeforeRepartition``, kept
    ON for retry safety — SPARK-23207/38388); hashing a DETERMINISTIC
    synthetic key is retry-safe without the sort and measured 0.88s vs
    1.28s on the sf0.1 lineitem exchange. 50×par distinct key values keep
    the hash spread even (guide §2.5). No-op when the input is already at
    cluster parallelism (the 100 TB case — wide scans never re-shuffle)."""
    if par is None:
        par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= par:
        return df
    key = fan_out_key(df, par, key_cols)
    if key is None:
        return df.repartition(par)
    return df.repartition(par, key)


# ---------------------------------------------------------------------------
# Vectorized WRITE-rows encode (optimization round 13, guide §4.2)
#
# ``table_to_binlog`` is the hot half of every wire query: profiled at sf0.1
# lineitem, the per-row/per-value Python encode was 1.34s of the 2.18s query
# (scan 0.14s, decode 0.47s). The fast path below computes each COLUMN's wire
# cells as one numpy pass (int views, packed-decimal group arithmetic,
# pandas ``str.encode``), then assembles all row images of an Arrow batch
# into a single uint8 buffer with two vectorized ragged scatters. Columns
# with no vectorized encoder fall back PER COLUMN to ``_encode_cell_into`` —
# the same bytes the row path produces — so mixed tables still gain.
# ---------------------------------------------------------------------------


def _vec_fixed_le(vals, w, np):
    """(n, w) little-endian low-byte matrix of an int64 array — matches
    ``struct.pack('<q/<i/<h/<b', v)`` (two's complement) and the int24
    ``(v & 0xFFFFFF).to_bytes(3, 'little')`` masks."""
    m = np.ascontiguousarray(vals.astype("<i8", copy=False))
    return m.view(np.uint8).reshape(-1, 8)[:, :w]


def _vec_fixed_be(vals, w, np):
    """(n, w) big-endian low-byte matrix (``v.to_bytes(w, 'big')``)."""
    m = np.ascontiguousarray(vals.astype(">u8"))
    return m.view(np.uint8).reshape(-1, 8)[:, 8 - w:]


def _vec_decimal_cells(col_nn, prec, scale, np, pd, prescaled=False):
    """NEWDECIMAL packed cells. ``prescaled``: the column already carries
    the unscaled int64 (``table_to_binlog`` shifts decimals JVM-side —
    exact, and it halves the exchange bytes vs decimal128). Otherwise
    non-null Decimal values at uniform scale. BOTH paths require prec ≤ 15:
    (a) each side (intg, scale) then has at most ONE full 9-digit group,
    which is what the group assembly below emits; (b) the unscaled integer
    < 10^15 < 2^50, so the float64 hops are exact — the non-prescaled
    round trip (value → ×10^scale → rint, abs error < 0.5, rint's tie mode
    never fires) AND the prescaled path's Arrow int64+null → pandas
    float64 promotion. Returns an (n, width) byte matrix or None
    (per-row fallback — identical bytes)."""
    if prec > 15 or prec - scale > 15:
        return None  # 2 full groups a side / float64-inexact: row path
    if prescaled:
        unscaled = col_nn.to_numpy(np.int64)
    else:
        first = col_nn.iloc[0]
        if not isinstance(first, _Decimal) or first.as_tuple().exponent != -scale:
            return None  # non-uniform scale: the row path's quantize matters
        if not all(
            isinstance(v, _Decimal) and v.as_tuple().exponent == -scale
            for v in col_nn
        ):
            # a mixed-exponent column whose FIRST element matches must not
            # slip onto the float path (rint half-to-even vs the row
            # path's ROUND_HALF_UP quantize on ties)
            return None
        vals = pd.to_numeric(col_nn, errors="coerce").to_numpy(np.float64)
        if np.isnan(vals).any():
            return None
        unscaled = np.rint(vals * float(10 ** scale)).astype(np.int64)
    neg = unscaled < 0
    a = np.abs(unscaled)
    intg = prec - scale
    int_part = a // (10 ** scale) if scale else a
    frac = a % (10 ** scale) if scale else np.zeros_like(a)
    if intg:
        int_part = int_part % (10 ** intg)
    cols = []
    part, full = intg % 9, intg // 9  # full ≤ 1 under the prec ≤ 15 guard
    if part or full:
        if full:
            hi, lo = np.divmod(int_part, np.int64(10 ** (9 * full)))
        else:
            hi, lo = int_part, None
        if part:
            cols.append(_vec_fixed_be(hi, _DIG2BYTES[part], np))
        if full:
            cols.append(_vec_fixed_be(lo, 4, np))
    part, full = scale % 9, scale // 9
    if full or part:
        lo = frac
        if full:  # ≤ 1 full group under the guard
            g, lo = np.divmod(lo, np.int64(10 ** (scale - 9)))
            cols.append(_vec_fixed_be(g, 4, np))
        if part:
            cols.append(_vec_fixed_be(lo, _DIG2BYTES[part], np))
    if not cols:
        cols.append(np.zeros((len(a), 1), np.uint8))
    mat = np.hstack(cols)
    mat[neg] ^= 0xFF
    mat[:, 0] ^= 0x80
    return mat


def _vec_datetime_index(col_nn, pd):
    """DatetimeIndex over non-null datetime/date values, or None when the
    values do not fit pandas' ns range (year > 2262 → per-row path)."""
    try:
        idx = pd.DatetimeIndex(pd.to_datetime(col_nn.to_numpy()))
    except Exception:  # noqa: BLE001 — out-of-range / mixed types
        return None
    if idx.tz is not None:
        return None
    return idx


def _vec_frac_cols(us, fsp, np):
    """Fractional-second tail columns (``_encode_frac``): big-endian
    ``_frac_bytes(fsp)`` bytes of micros // 10^(6-2nb)."""
    nbf = _frac_bytes(fsp)
    if nbf == 0:
        return None
    units = (us // (10 ** (6 - 2 * nbf))).astype(np.int64)
    return _vec_fixed_be(units, nbf, np)


def _vector_cells(td, i, tc, m, col, np, pd, prescaled=False):
    """One column's wire cells, vectorized: returns ``(data, lens,
    nulls)`` — ``data`` the uint8 concatenation of the non-null cells in
    row order, ``lens`` per-row byte lengths (0 at nulls) — or None when
    this column shape has no vectorized encoder (caller falls back to
    ``_encode_cell_into`` per row, same interface, same bytes)."""
    nulls = pd.isna(col).to_numpy()
    nn = ~nulls
    col_nn = col[nn]
    n = len(col)

    def fixed(mat, w):
        lens = np.where(nulls, 0, w).astype(np.int64)
        return np.ascontiguousarray(mat).reshape(-1), lens, nulls

    def ragged(payloads, prefix_w, np=np):
        """Length-prefixed cells (VARCHAR/CHAR/BLOB/JSON/GEOMETRY):
        little-endian prefix + payload bytes, two vectorized scatters.
        Returns None (→ row path) when a payload is longer than the
        prefix can express — masking low bytes there would silently
        corrupt the stream where the row path raises."""
        P = np.fromiter((len(b) for b in payloads), np.int64, len(payloads))
        if len(P) and int(P.max()) >= 1 << (8 * prefix_w):
            return None  # fail-loud path: _encode_cell_into raises
        cell = prefix_w + P
        starts = np.concatenate(([0], np.cumsum(cell)))
        buf = np.zeros(int(starts[-1]), np.uint8)
        for b in range(prefix_w):
            buf[starts[:-1] + b] = ((P >> (8 * b)) & 0xFF).astype(np.uint8)
        data = np.frombuffer(b"".join(payloads), np.uint8)
        if len(data):
            pay_starts = starts[:-1] + prefix_w
            src_breaks = np.cumsum(P) - P
            idx = np.repeat(pay_starts - src_breaks, P) + np.arange(len(data))
            buf[idx] = data
        lens = np.zeros(n, np.int64)
        lens[nn] = cell
        return buf, lens, nulls

    def ints_nn():
        if pd.api.types.is_integer_dtype(col_nn):
            return col_nn.to_numpy(np.int64)  # no to_numeric pass needed
        return pd.to_numeric(col_nn, errors="raise").to_numpy(np.int64)

    u = i in td.unsigned
    if tc == TYPE_LONGLONG:
        return fixed(_vec_fixed_le(ints_nn(), 8, np), 8)
    if tc in (TYPE_TINY, TYPE_SHORT, TYPE_INT24, TYPE_LONG):
        w = {TYPE_TINY: 1, TYPE_SHORT: 2, TYPE_INT24: 3, TYPE_LONG: 4}[tc]
        v = ints_nn()
        if tc != TYPE_INT24 and len(v):  # struct.pack raises out-of-range
            lo = 0 if u else -(1 << (8 * w - 1))
            hi = (1 << (8 * w)) - 1 if u else (1 << (8 * w - 1)) - 1
            if v.min() < lo or v.max() > hi:
                return None
        return fixed(_vec_fixed_le(v, w, np), w)
    if tc == TYPE_YEAR:
        v = ints_nn()
        adj = np.where(v == 0, 0, v - 1900)
        if len(adj) and (adj.min() < 0 or adj.max() > 255):
            return None
        return fixed(_vec_fixed_le(adj, 1, np), 1)
    if tc == TYPE_FLOAT:
        vals = pd.to_numeric(col_nn, errors="raise").to_numpy(np.float64)
        mat = np.ascontiguousarray(vals.astype("<f4")).view(np.uint8)
        return fixed(mat.reshape(-1, 4), 4)
    if tc == TYPE_DOUBLE:
        vals = pd.to_numeric(col_nn, errors="raise").to_numpy(np.float64)
        mat = np.ascontiguousarray(vals.astype("<f8")).view(np.uint8)
        return fixed(mat.reshape(-1, 8), 8)
    if tc == TYPE_NEWDECIMAL:
        mat = _vec_decimal_cells(col_nn, m[0], m[1], np, pd, prescaled) \
            if len(col_nn) else np.zeros((0, _decimal_byte_len(m[0], m[1])),
                                         np.uint8)
        if mat is None:
            return None
        return fixed(mat, _decimal_byte_len(m[0], m[1]))
    if tc == TYPE_DATE:
        idx = _vec_datetime_index(col_nn, pd) if len(col_nn) else None
        if idx is None and len(col_nn):
            return None
        if idx is None:
            return fixed(np.zeros((0, 3), np.uint8), 3)
        packed = (idx.day.to_numpy(np.int64)
                  | (idx.month.to_numpy(np.int64) << 5)
                  | (idx.year.to_numpy(np.int64) << 9))
        return fixed(_vec_fixed_le(packed, 3, np), 3)
    if tc in (TYPE_DATETIME2, TYPE_DATETIME, TYPE_TIMESTAMP2, TYPE_TIMESTAMP):
        if len(col_nn) == 0:
            w = {TYPE_DATETIME: 8, TYPE_TIMESTAMP: 4,
                 TYPE_DATETIME2: 5 + _frac_bytes(m or 0),
                 TYPE_TIMESTAMP2: 4 + _frac_bytes(m or 0)}[tc]
            return fixed(np.zeros((0, w), np.uint8), w)
        if pd.api.types.is_numeric_dtype(col_nn) and tc in (
                TYPE_TIMESTAMP, TYPE_TIMESTAMP2):
            secs = pd.to_numeric(col_nn).to_numpy(np.int64)
            us = np.zeros_like(secs)
        else:
            idx = _vec_datetime_index(col_nn, pd)
            if idx is None:
                return None
            ns = idx.asi8
            secs = np.floor_divide(ns, 1_000_000_000)
            us = (ns - secs * 1_000_000_000) // 1000
        if tc == TYPE_TIMESTAMP2:
            if secs.min() < 0 or secs.max() >= 1 << 32:
                return None
            head = _vec_fixed_be(secs, 4, np)
            tail = _vec_frac_cols(us, m, np)
            mat = np.hstack([head, tail]) if tail is not None else head
            return fixed(mat, mat.shape[1])
        if tc == TYPE_TIMESTAMP:
            if secs.min() < 0 or secs.max() >= 1 << 32:
                return None
            return fixed(_vec_fixed_le(secs, 4, np), 4)
        y = idx.year.to_numpy(np.int64)
        mo = idx.month.to_numpy(np.int64)
        d = idx.day.to_numpy(np.int64)
        h = idx.hour.to_numpy(np.int64)
        mi = idx.minute.to_numpy(np.int64)
        s = idx.second.to_numpy(np.int64)
        if tc == TYPE_DATETIME:
            num = (((y * 100 + mo) * 100 + d) * 1_000_000
                   + (h * 100 + mi) * 100 + s)
            return fixed(_vec_fixed_le(num, 8, np), 8)
        packed = ((1 << 39) | ((y * 13 + mo) << 22) | (d << 17)
                  | (h << 12) | (mi << 6) | s)
        head = _vec_fixed_be(packed, 5, np)
        tail = _vec_frac_cols(us, m, np)
        mat = np.hstack([head, tail]) if tail is not None else head
        return fixed(mat, mat.shape[1])
    if tc == TYPE_TIME:
        # legacy TIME from the MySQL text form — the table_to_binlog
        # pre-transform parses strings; non-negative HH:MM:SS vectorizes
        it = pd.api.types.infer_dtype(col_nn, skipna=True) \
            if len(col_nn) else "string"
        if it != "string" or (len(col_nn)
                              and not col_nn.str.fullmatch(
                                  r"\d{1,3}:\d{2}:\d{2}").all()):
            return None
        parts = col_nn.str.split(":", expand=True) if len(col_nn) else None
        if parts is None:
            return fixed(np.zeros((0, 3), np.uint8), 3)
        h = parts[0].astype(np.int64).to_numpy()
        mi = parts[1].astype(np.int64).to_numpy()
        se = parts[2].astype(np.int64).to_numpy()
        num = h * 10_000 + mi * 100 + se
        return fixed(_vec_fixed_le(num, 3, np), 3)
    if tc == TYPE_STRING and isinstance(m, tuple) and m[0] in (
            TYPE_ENUM, TYPE_SET):
        return fixed(_vec_fixed_le(ints_nn(), m[1], np), m[1])
    if tc == TYPE_BIT:
        w = (m + 7) // 8
        if w > 8:
            return None
        v = ints_nn()
        if len(v) and (v.min() < 0 or (w < 8 and v.max() >= 1 << (8 * w))):
            return None
        return fixed(_vec_fixed_be(v, w, np), w)
    if tc in (TYPE_VARCHAR, TYPE_STRING, TYPE_BLOB, TYPE_JSON, TYPE_GEOMETRY):
        it = pd.api.types.infer_dtype(col_nn, skipna=True) \
            if len(col_nn) else "bytes"
        if tc in (TYPE_VARCHAR, TYPE_STRING):
            maxlen = m if tc == TYPE_VARCHAR else m[1]
            prefix_w = 1 if maxlen < 256 else 2
            if it == "string":
                payloads = col_nn.str.encode(
                    _codec_for(td.charset_of(i))).to_numpy()
            elif it == "bytes":
                payloads = col_nn.to_numpy()
            else:
                return None
        else:
            if it != "bytes":
                return None  # JSON documents / diff vectors: row path
            prefix_w = m
            payloads = col_nn.to_numpy()
        return ragged(payloads, prefix_w)
    return None


def _fallback_cells(td, i, tc, m, col, pre, np, pd):
    """Per-row cells for one column the vector path does not cover —
    identical bytes via ``_encode_cell_into``; feeds the same vectorized
    image assembly. ``pre`` is the row-path pre-transform."""
    nulls = pd.isna(col).to_numpy()
    lens = np.zeros(len(col), np.int64)
    chunks = []
    for r, v in enumerate(col):
        if nulls[r]:
            continue
        ba = bytearray()
        _encode_cell_into(ba, td, i, tc, m, pre(v))
        lens[r] = len(ba)
        chunks.append(bytes(ba))
    data = np.frombuffer(b"".join(chunks), np.uint8)
    return data, lens, nulls


def _encode_write_images(td, pdf, cols, codecs, is_bool, is_time, present,
                         np, pd, prescaled=frozenset()):
    """All row images of one Arrow batch as ``(buf, row_off)`` — buf the
    uint8 concatenation of every image, ``row_off`` the n+1 row-boundary
    offsets. Byte-identical to ``_encode_image`` over the same rows.
    ``prescaled``: NEWDECIMAL columns already shifted to unscaled int64
    JVM-side (see ``table_to_binlog``)."""
    if present is not None and not all(present):
        keep = [j for j, p in enumerate(present) if p]
    else:
        keep = list(range(len(td.types)))
    if len(keep) > 64:
        return None  # bitmap packing below assumes ≤ 64 image columns
    n = len(pdf)
    datas, lens_l, nulls_l = [], [], []
    for j in keep:
        tc, m = td.types[j]
        col = pdf[cols[j]]
        if is_bool[j]:
            nulls = pd.isna(col).to_numpy()
            vals = col.where(~nulls, other=False).astype(bool)
            cells = _vector_cells(
                td, j, tc, m, vals.astype(np.int64).where(~nulls), np, pd)
        elif is_time[j] or (codecs[j] is not None and tc == TYPE_JSON):
            cells = _vector_cells(td, j, tc, m, col, np, pd) \
                if is_time[j] else None
        elif codecs[j] is not None:
            # ENUM/SET label→index/mask: map over the distinct labels
            nulls = pd.isna(col).to_numpy()
            it = pd.api.types.infer_dtype(col, skipna=True)
            if it == "integer":
                cells = _vector_cells(td, j, tc, m, col, np, pd)
            elif it == "string":
                uniq = col.dropna().unique()
                to_wire = codecs[j][0]
                mapping = {s: to_wire(s) for s in uniq}  # raises like row path
                cells = _vector_cells(td, j, tc, m, col.map(mapping), np, pd)
            else:
                cells = None
        else:
            cells = _vector_cells(td, j, tc, m, col, np, pd,
                                  prescaled=j in prescaled)
        if cells is None:
            if is_bool[j]:
                pre = lambda v: int(bool(v))  # noqa: E731
            elif is_time[j]:
                pre = lambda v: _parse_time_str(v) if isinstance(v, str) else v  # noqa: E731
            elif codecs[j] is not None:
                pre = codecs[j][0]
            elif j in prescaled:
                # unscaled int64 → Decimal at declared scale (exact)
                pre = lambda v, s=td.types[j][1][1]: _Decimal(int(v)).scaleb(-s)  # noqa: E731
            else:
                pre = lambda v: v  # noqa: E731
            cells = _fallback_cells(td, j, tc, m, col, pre, np, pd)
        data_j, lens_j, nulls_j = cells
        datas.append(np.ascontiguousarray(data_j, dtype=np.uint8).reshape(-1))
        lens_l.append(lens_j)
        nulls_l.append(nulls_j)
    nb = (len(keep) + 7) // 8
    W = np.stack(lens_l, axis=1) if keep else np.zeros((n, 0), np.int64)
    bits = np.zeros(n, np.uint64)
    for j, nulls_j in enumerate(nulls_l):
        bits |= nulls_j.astype(np.uint64) << np.uint64(j)
    row_len = nb + W.sum(axis=1)
    row_off = np.zeros(n + 1, np.int64)
    np.cumsum(row_len, out=row_off[1:])
    buf = np.zeros(int(row_off[-1]), np.uint8)
    for b in range(nb):
        buf[row_off[:-1] + b] = ((bits >> np.uint64(8 * b))
                                 & np.uint64(0xFF)).astype(np.uint8)
    cum = np.cumsum(W, axis=1)
    ar = np.arange(max((len(d) for d in datas), default=0), dtype=np.int64)
    for j, data_j in enumerate(datas):
        L = W[:, j]
        if not len(data_j):
            continue
        starts = row_off[:-1] + nb + (cum[:, j] - L)
        src_breaks = np.cumsum(L) - L
        idx = np.repeat(starts - src_breaks, L) + ar[:len(data_j)]
        buf[idx] = data_j
    return buf, row_off


def table_to_binlog(df, db: str, tbl: str, mysql_types: list[str],
                    rows_per_event: int = 256,
                    rows_event_type: int = WRITE_ROWS_EVENT,
                    present: list[bool] | None = None):
    """Serialize ANY typed DataFrame as binlog WRITE_ROWS wire bytes —
    one blob per partition (TABLE_MAP + chunked multi-row events). The
    column declarations come from the schema registry (`TableSchema.types`),
    so a binlog downstream can attach to any replicated table, not just
    the harness CDC frame. Arrow-batched; partitions encode in parallel.
    Returns (n_rows, payload binary).

    The Python byte encoder is the heavy per-row path, and small parquet
    inputs arrive as ONE partition — left alone, the whole table would
    encode on a single core (16.8s for sf0.1 lineitem in the r5 bench).
    Fan out to the cluster's parallelism first: one shuffle of the typed
    columns buys an n_cores speedup on the codec, and downstream decode
    inherits the same fan-out (one blob row per encode partition).

    ``present``: partial-row-image column mask (binlog_row_image=NOBLOB
    omits blob/text columns from every image; MINIMAL trims further) —
    masked columns never hit the wire and decode as NULL."""
    cols = list(df.columns)
    is_bool = [t.strip().lower().startswith(("bool", "tinyint(1)")) and
               "unsigned" not in t.lower() for t in mysql_types]
    is_time = [t.strip().lower().startswith("time") and
               not t.strip().lower().startswith("timestamp")
               for t in mysql_types]
    codecs = _label_codecs(mysql_types)
    use_vec = rows_event_type in (WRITE_ROWS_EVENT, WRITE_ROWS_EVENT_V1)
    # pre-shift NEWDECIMAL columns to their unscaled int64 JVM-side
    # (exact: Spark decimal(p,s) × 10^s is integral, and p ≤ 15 keeps the
    # unscaled value < 2^50 — exact through the float64 that Arrow
    # int64+null batches become in pandas): the exchange and the Arrow
    # hop carry 8-byte ints instead of decimal128 + per-object
    # Decimal→bytes work in the Python encoder. p of 16..18 stays
    # decimal128 end-to-end: prescaling those would (a) need TWO full
    # 9-digit groups per side in the vector encoder and (b) round
    # unscaled values above 2^53 in the float64 hop.
    prescaled: set[int] = set()
    if use_vec:
        from pyspark.sql import functions as _F
        from pyspark.sql import types as _T

        sch = df.schema
        for j, decl in enumerate(mysql_types):
            t = decl.strip().lower()
            if not t.startswith(("decimal", "numeric")):
                continue
            if "(" in t:
                inner = t[t.find("(") + 1 : t.find(")")]
                p, _, s = inner.partition(",")
                prec, scale = int(p), int(s or 0)
            else:
                prec, scale = 10, 0
            if prec > 15 or not isinstance(sch[j].dataType, _T.DecimalType):
                continue
            dt = sch[j].dataType
            if dt.scale != scale or dt.precision > 15:
                continue  # row path would quantize; keep its semantics
            df = df.withColumn(
                cols[j],
                (_F.col(cols[j]) * _F.lit(10 ** scale)).cast("long"),
            )
            prescaled.add(j)
    df = fan_out(df)

    def encode_partition(batches):
        import numpy as np
        import pandas as pd

        td = TableDef.from_mysql_types(db, tbl, mysql_types)
        tid = zlib.crc32(f"{db}.{tbl}".encode()) & 0x7FFFFFFF
        # vectorized fast path (WRITE framing only — the shape this
        # function emits in production; UPDATE pairs keep the row path)
        post = struct.pack("<Q", tid)[:6] + struct.pack("<H", 0)
        if rows_event_type == WRITE_ROWS_EVENT:
            post += struct.pack("<H", 2)  # v2 extra-data length
        pb = present if present is not None else [True] * len(td.types)
        ev_head = post + _lenenc(len(td.types)) + _bitmap(pb)
        for pdf in batches:
            if pdf.empty:
                continue
            blob = bytearray(encode_table_map(tid, td))
            if use_vec:
                enc = _encode_write_images(
                    td, pdf, cols, codecs, is_bool, is_time, present, np, pd,
                    prescaled=prescaled,
                )
                if enc is not None:
                    buf, row_off = enc
                    nb_rows = len(pdf)
                    for k0 in range(0, nb_rows, rows_per_event):
                        k1 = min(k0 + rows_per_event, nb_rows)
                        body = ev_head + buf[row_off[k0]:row_off[k1]].tobytes()
                        blob += encode_event(rows_event_type, body)
                    yield pd.DataFrame(
                        [(nb_rows, bytes(blob))], columns=["n_rows", "payload"]
                    )
                    continue
            rows = []
            for rec in pdf[cols].itertuples(index=False):
                vals = []
                for i, v in enumerate(rec):
                    if v is None or (isinstance(v, float) and v != v):
                        vals.append(None)
                    elif is_bool[i]:
                        vals.append(int(bool(v)))
                    elif is_time[i] and isinstance(v, str):
                        vals.append(_parse_time_str(v))
                    elif codecs[i] is not None:
                        vals.append(codecs[i][0](v))
                    elif i in prescaled:
                        # >64-column batch fallback: undo the JVM-side
                        # unscaled-int shift (exact)
                        vals.append(
                            _Decimal(int(v)).scaleb(-td.types[i][1][1])
                        )
                    else:
                        vals.append(v)
                rows.append(vals)
                if len(rows) >= rows_per_event:
                    blob += encode_rows_event(rows_event_type, tid, td, rows,
                                              present=present)
                    rows = []
            if rows:
                blob += encode_rows_event(rows_event_type, tid, td, rows,
                                          present=present)
            yield pd.DataFrame(
                [(len(pdf), bytes(blob))], columns=["n_rows", "payload"]
            )

    return df.mapInPandas(encode_partition, "n_rows long, payload binary")


import datetime as _datetime_mod
from decimal import Decimal as _Decimal


def _coerce_typed(v, field, codec):
    """One decoded wire value → its Spark-schema Python form (shared by
    `binlog_to_table` and `decode_wire_with_registry`): label codecs
    (ENUM/SET/charset) first, then bool/Decimal widening, MySQL TIME
    text form for timedeltas, everything else passes through. Module-
    level imports — this runs once per VALUE on the decode hot path."""
    if v is None:
        return None
    if codec is not None:
        return codec[1](v)
    tn = field.dataType.typeName()
    if tn == "boolean":
        return bool(v)
    if tn.startswith("decimal") and not isinstance(v, _Decimal):
        return _Decimal(v)
    if isinstance(v, _datetime_mod.timedelta):
        return _format_time(v)
    return v


def _compile_coercer(field, codec, decl):
    """Per-COLUMN compiled form of `_coerce_typed` (r13): the per-value
    call (codec test + typeName() string compares + timedelta isinstance)
    cost as much as the wire decode itself. Identity columns (ints,
    strings, dates, datetimes — everything but label codecs, booleans,
    decimals and TIME) return None so callers skip coercion entirely;
    semantics are `_coerce_typed`'s exactly (timedeltas only ever come
    from the TIME decoders, so keying the text-form branch on the decl
    is equivalent)."""
    tn = field.dataType.typeName()
    t = decl.strip().lower()
    if codec is not None:
        return lambda v, c=codec[1]: None if v is None else c(v)
    if tn == "boolean":
        return lambda v: None if v is None else bool(v)
    if tn.startswith("decimal"):
        return lambda v: v if v is None or isinstance(v, _Decimal) \
            else _Decimal(v)
    if t.startswith("time") and not t.startswith("timestamp"):
        return lambda v: _format_time(v) \
            if isinstance(v, _datetime_mod.timedelta) else v
    return None  # identity


def binlog_to_table(blobs, mysql_types: list[str], columns: list[str],
                    payload_col: str = "payload",
                    include_action: bool = False):
    """Decode typed wire blobs back into a Spark frame with faithful
    types (``types.spark_type_for`` per declaration; DATETIME2 and
    TIMESTAMP2 both surface as TIMESTAMP_NTZ — the wire carries zone-less
    fields / UTC epochs; TIME as MySQL text form).

    Default reads WRITE_ROWS only (the snapshot/export shape).
    ``include_action=True`` decodes the full change stream —
    WRITE/UPDATE/DELETE in both v1 and v2 framing — prepending an
    ``action`` column; UPDATE rows surface their AFTER image (the REPLACE
    model — pair the flag with the registry/last-image machinery when the
    before image matters)."""
    from pyspark.sql import types as T

    from polardbx_cdc_spark.types import spark_type_for

    fields = []
    if include_action:
        fields.append(T.StructField("action", T.StringType(), False))
    for name, decl in zip(columns, mysql_types):
        st = spark_type_for(decl)
        if isinstance(st, (T.TimestampType, T.TimestampNTZType)):
            st = T.TimestampNTZType()
        fields.append(T.StructField(name, st, True))
    out_schema = T.StructType(fields)
    # value fields only — out_schema's leading ``action`` field must not
    # shift the per-value zip
    vfields = fields[1:] if include_action else fields
    codecs = _label_codecs(mysql_types)

    coercers = [
        _compile_coercer(f, c, d)
        for f, c, d in zip(vfields, codecs, mysql_types)
    ]

    def decode_partition(batches):
        import pandas as pd

        out_cols = (["action"] + columns) if include_action else columns
        for pdf in batches:
            out = []
            acts = [] if include_action else None
            for blob in pdf[payload_col]:
                for ev in expand_payload_events(decode_events(bytes(blob))):
                    if include_action:
                        if ev["type"] not in ROWS_EVENTS:
                            continue
                        act = {
                            WRITE_ROWS_EVENT: "INSERT", WRITE_ROWS_EVENT_V1: "INSERT",
                            UPDATE_ROWS_EVENT: "UPDATE", UPDATE_ROWS_EVENT_V1: "UPDATE",
                            DELETE_ROWS_EVENT: "DELETE", DELETE_ROWS_EVENT_V1: "DELETE",
                            PARTIAL_UPDATE_ROWS_EVENT: "UPDATE",
                        }[ev["type"]]
                    elif ev["type"] not in (WRITE_ROWS_EVENT, WRITE_ROWS_EVENT_V1):
                        continue
                    for row in ev["rows"]:
                        if include_action and ev["type"] in UPDATE_EVENTS:
                            before = row[0]
                            row = row[1]  # after image (REPLACE model)
                            # partial JSON (type 39): materialize diff
                            # vectors against the before image — typed
                            # columns must carry documents, never
                            # JsonDiff objects
                            if ev["type"] == PARTIAL_UPDATE_ROWS_EVENT:
                                row = [
                                    apply_json_diffs(b, v)
                                    if isinstance(v, JsonDiffVector) else v
                                    for b, v in zip(before, row)
                                ]
                        out.append(row)
                        if include_action:
                            acts.append(act)
            data: dict = {}
            if include_action:
                data["action"] = acts
            cols_t = list(zip(*out)) if out else [[]] * len(columns)
            for name, colvals, co in zip(columns, cols_t, coercers):
                data[name] = [co(v) for v in colvals] if co else list(colvals)
            yield pd.DataFrame(data, columns=out_cols)

    return blobs.mapInPandas(decode_partition, out_schema)


def decode_wire_with_registry(spark, wire_dir: str, registry, db: str, tbl: str,
                              glob: str = "binlog.*",
                              include_action: bool = False):
    """Registry-resolved TYPED decode of real wire files — the
    ``binlog_row_metadata=MINIMAL`` attach, which is the MySQL DEFAULT:
    the wire carries physical column types but no names/labels, so the
    consumer resolves every row event against the schema version in
    effect at its own replication position. This is the LogDecoder ↔
    TableMetaTSDB pairing (polardbx-cdc-canal MemoryTableMeta.find per
    position; PolarDbXTableMetaManager.java) and the counterpart of
    :func:`decode_named_rows`, which needs ``binlog_row_metadata=FULL``
    TLVs on the wire.

    Output columns follow the registry's LATEST schema for ``(db,
    tbl)``: rows logged under an older version surface NULL for columns
    that did not exist yet, values of since-dropped columns are not
    carried, and a MODIFY COLUMN retype casts older rows forward to the
    final type (int → str for BIGINT→VARCHAR, etc.; retypes with no
    lossless forward cast raise at PLAN time) — the
    materialize-current-schema contract every CDC consumer applies.

    **Row selection: the default (``include_action=False``) decodes
    WRITE_ROWS (INSERT images) ONLY — the snapshot/export shape.
    UPDATE and DELETE events are silently skipped**; a consumer
    attaching to a live CHANGE stream must pass
    ``include_action=True`` to surface all three actions (UPDATEs as
    their AFTER image, the REPLACE model), or it will lose rows.

    A row whose wire width disagrees with its governing version raises
    (registry drift is corruption, never a silent mis-zip). Full row
    images are REQUIRED and enforced: a MINIMAL/NOBLOB partial image
    reaching this decode raises (absent columns were padded to NULL by
    the byte decoder — materializing them would be indistinguishable
    from real NULLs); pair partial-image streams with the last-image
    machinery first.

    Distributed: binaryFile scan + per-file ``mapInPandas`` (positions
    come from :func:`wire_frame_rows` ``include_values=True`` — the same
    counter as every other attach). The version timeline is one row per
    DDL, shipped to executors as a closure constant the way the
    reference broadcasts its meta snapshot."""
    decode_files, out_schema = _registry_decode_plan(
        registry, db, tbl, include_action
    )
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(wire_dir)
        .select("path", "content")
        .mapInPandas(decode_files, out_schema)
    )


#: MySQL temporal literal: date part with -, /, . or no separator; time
#: part optional; fractional seconds optional (rounded to micros)
_MYSQL_DT_RE = _re_mod.compile(
    r"^\s*(\d{4})[-/.](\d{1,2})[-/.](\d{1,2})"
    r"(?:[ T](\d{1,2}):(\d{1,2})(?::(\d{1,2})(?:\.(\d+))?)?)?\s*$"
)


def _round_micros(frac_digits: str) -> tuple[int, int]:
    """Fractional-second digits → (microseconds, carry_seconds) with
    MySQL's ROUND-HALF-UP at the 6th digit (a DATETIME(6) column stores
    micros; '…59.9999995' carries into the next second exactly like the
    server — WL#946 rounding rules)."""
    if len(frac_digits) <= 6:
        return int(frac_digits.ljust(6, "0")), 0
    micros = int(frac_digits[:6])
    if frac_digits[6] >= "5":
        micros += 1
    if micros >= 1_000_000:
        return 0, 1
    return micros, 0


def _mysql_cast_datetime(v):
    """MySQL forward cast → DATETIME (the ALTER TABLE … MODIFY value
    conversion, strict mode: unconvertible values raise — the non-strict
    zero-date '0000-00-00' has no Python/Arrow form, so replay refuses
    rather than fabricating NULLs). Accepts datetime/date passthrough,
    MySQL string literals ('YYYY-MM-DD[ HH:MM:SS[.f]]', separators
    - / . and compact digits), and MySQL's numeric interpretation
    (YYYYMMDDHHMMSS / YYMMDDHHMMSS / YYYYMMDD / YYMMDD, 2-digit years
    pivoting at 70 like the server)."""
    if isinstance(v, _datetime_mod.datetime):
        return v
    if isinstance(v, _datetime_mod.date):
        return _datetime_mod.datetime(v.year, v.month, v.day)
    if isinstance(v, str):
        m = _MYSQL_DT_RE.match(v)
        if m:
            y, mo, d, hh, mm, ss, frac = m.groups()
            micros, carry = _round_micros(frac or "0")
            dt = _datetime_mod.datetime(
                int(y), int(mo), int(d),
                int(hh or 0), int(mm or 0), int(ss or 0), micros,
            )
            return dt + _datetime_mod.timedelta(seconds=carry)
        digits = v.strip()
        if digits.isdigit():
            return _mysql_cast_datetime(int(digits))
        raise ValueError(f"cannot cast {v!r} to DATETIME")
    if isinstance(v, bool):
        raise ValueError(f"cannot cast {v!r} to DATETIME")
    if isinstance(v, int):
        # MySQL's numeric interpretation follows number_to_datetime's
        # ACCEPTANCE BANDS (my_time.cc) — NOT a naive zero-pad (ADVICE
        # r12: 1010101 must error, it falls in the 991231 < nr <
        # 10000101 rejection band):
        #   nr ≤ 691231                 → YYMMDD, year 20YY
        #   691231 < nr < 700101        → error
        #   700101 ≤ nr ≤ 991231        → YYMMDD, year 19YY
        #   991231 < nr < 10000101      → error
        #   10000101 ≤ nr ≤ 99991231    → YYYYMMDD
        #   99991231 < nr < 101000000   → error
        #   101000000 ≤ nr ≤ 691231235959   → YYMMDDHHMMSS, year 20YY
        #   691231235959 < nr < 700101000000 → error
        #   700101000000 ≤ nr ≤ 991231235959 → YYMMDDHHMMSS, year 19YY
        #   else                        → YYYYMMDDHHMMSS (≤ 99991231235959)
        nr = v
        if nr <= 0:
            # 0 is MySQL's zero date — strict mode rejects it, and the
            # repo refuses to fabricate it (no Python/Arrow form)
            raise ValueError(f"cannot cast numeric {v!r} to DATETIME")
        if nr <= 691231:
            nr = (nr + 20000000) * 1000000
        elif nr < 700101:
            raise ValueError(f"cannot cast numeric {v!r} to DATETIME")
        elif nr <= 991231:
            nr = (nr + 19000000) * 1000000
        elif nr < 10000101:
            raise ValueError(f"cannot cast numeric {v!r} to DATETIME")
        elif nr <= 99991231:
            nr = nr * 1000000
        elif nr < 101000000:
            raise ValueError(f"cannot cast numeric {v!r} to DATETIME")
        elif nr <= 691231235959:
            nr = nr + 20000000000000
        elif nr < 700101000000:
            raise ValueError(f"cannot cast numeric {v!r} to DATETIME")
        elif nr <= 991231235959:
            nr = nr + 19000000000000
        elif nr > 99991231235959:
            raise ValueError(f"cannot cast numeric {v!r} to DATETIME")
        s = f"{nr:014d}"
        try:
            return _datetime_mod.datetime(
                int(s[:4]), int(s[4:6]), int(s[6:8]),
                int(s[8:10]), int(s[10:12]), int(s[12:14]),
            )
        except ValueError:
            raise ValueError(
                f"cannot cast numeric {v!r} to DATETIME") from None
    if isinstance(v, (float, _Decimal)):
        # DECIMAL/DOUBLE → DATETIME (my_time.cc double_to_datetime): the
        # integer part runs the acceptance bands above, the fraction
        # becomes microseconds (half-up; a full carry rolls into the
        # next second via timedelta)
        d = _Decimal(str(v)) if isinstance(v, float) else v
        if d < 0:
            raise ValueError(f"cannot cast numeric {v!r} to DATETIME")
        whole = int(d)
        micros = int(((d - whole) * 1_000_000).to_integral_value(
            rounding="ROUND_HALF_UP"))
        return (_mysql_cast_datetime(whole)
                + _datetime_mod.timedelta(microseconds=micros))
    raise ValueError(
        f"cannot cast {type(v).__name__} value {v!r} to DATETIME")


def _mysql_cast_time_str(v) -> str:
    """MySQL forward cast → TIME, rendered as the canonical 'HH:MM:SS[.f]'
    string (the repo's Spark type for TIME — may exceed 24h). Numbers use
    the server's right-anchored grouping: 123 → '00:01:23', 12345 →
    '01:23:45'; minutes/seconds must be < 60; |hours| ≤ 838 like the
    server's TIME range."""
    if isinstance(v, str):
        s = v.strip()
        m = _re_mod.match(
            r"^(-?)(\d{1,3}):(\d{1,2})(?::(\d{1,2})(?:\.(\d+))?)?$", s)
        if m:
            sign, hh, mm, ss, frac = m.groups()
            hh, mm, ss = int(hh), int(mm), int(ss or 0)
            if mm >= 60 or ss >= 60 or hh > 838:
                raise ValueError(f"cannot cast {v!r} to TIME")
            micros, carry = _round_micros(frac or "0")
            # fraction rounding can carry ':59.9999995' into the next
            # second — renormalize the whole triple
            ss += carry
            mm += ss // 60
            hh += mm // 60
            ss, mm = ss % 60, mm % 60
            if hh > 838:
                raise ValueError(f"cannot cast {v!r} to TIME")
            out = f"{sign}{hh:02d}:{mm:02d}:{ss:02d}"
            if micros:
                out += f".{micros:06d}".rstrip("0")
            return out
        if _re_mod.match(r"^-?\d+$", s):
            return _mysql_cast_time_str(int(s))
        raise ValueError(f"cannot cast {v!r} to TIME")
    if isinstance(v, _datetime_mod.datetime):
        out = v.strftime("%H:%M:%S")
        return out + (f".{v.microsecond:06d}" if v.microsecond else "")
    if isinstance(v, bool):
        raise ValueError(f"cannot cast {v!r} to TIME")
    if isinstance(v, int):
        sign, n = ("-", -v) if v < 0 else ("", v)
        ss, n = n % 100, n // 100
        mm, hh = n % 100, n // 100
        if ss >= 60 or mm >= 60 or hh > 838:
            raise ValueError(f"cannot cast numeric {v!r} to TIME")
        return f"{sign}{hh:02d}:{mm:02d}:{ss:02d}"
    if isinstance(v, (float, _Decimal)):
        # DECIMAL/DOUBLE → TIME: integer part takes the right-anchored
        # HHMMSS grouping, the fraction becomes micros (half-up, carry
        # renormalized through the triple) — my_time.cc double_to_time
        d = _Decimal(str(v)) if isinstance(v, float) else v
        sign = "-" if d < 0 else ""
        d = d.copy_abs()
        whole = int(d)
        micros = int(((d - whole) * 1_000_000).to_integral_value(
            rounding="ROUND_HALF_UP"))
        carry, micros = divmod(micros, 1_000_000)
        base = _mysql_cast_time_str(whole + carry)
        out = sign + base
        if micros:
            out += f".{micros:06d}".rstrip("0")
        return out
    raise ValueError(f"cannot cast {type(v).__name__} value {v!r} to TIME")


def _temporal_fsp(decl: str) -> int:
    """Fractional-seconds precision of a temporal decl: 'datetime(6)' →
    6, bare 'time'/'datetime' → 0 (MySQL's default fsp)."""
    m = _re_mod.search(r"\((\d+)\)", decl)
    return int(m.group(1)) if m else 0


def _round_dt_fsp(v, fsp: int):
    """Round a datetime's microseconds to *fsp* fractional digits,
    half-up with carry into the next second — MySQL's stored-value
    rewrite when a MODIFY narrows DATETIME(p) precision (WL#946
    my_datetime_round)."""
    q = 10 ** (6 - fsp)
    rounded = (v.microsecond + q // 2) // q * q
    return (v.replace(microsecond=0)
            + _datetime_mod.timedelta(microseconds=rounded))


def _round_time_str_fsp(s: str, fsp: int) -> str:
    """Round a canonical TIME string's fraction to *fsp* digits (the
    TIME(p)-narrowing MODIFY rewrite), renormalizing carry through the
    H:M:S triple; output stays in the repo's trimmed canonical form."""
    m = _re_mod.match(r"^(-?)(\d+):(\d{2}):(\d{2})(?:\.(\d+))?$", s.strip())
    if not m:
        raise ValueError(f"cannot re-round TIME value {s!r}")
    sign, hh, mm, ss, frac = m.groups()
    micros = int((frac or "").ljust(6, "0")[:6] or "0")
    q = 10 ** (6 - fsp)
    rounded = (micros + q // 2) // q * q
    carry, rounded = divmod(rounded, 1_000_000)
    hh, mm, ss = int(hh), int(mm), int(ss) + carry
    mm += ss // 60
    hh += mm // 60
    ss, mm = ss % 60, mm % 60
    if hh > 838:
        raise ValueError(f"TIME value {s!r} out of range after rounding")
    out = f"{sign}{hh:02d}:{mm:02d}:{ss:02d}"
    if rounded:
        out += f".{rounded:06d}".rstrip("0")
    return out


def _temporal_numeric(v, src_base: str):
    """MySQL's numeric image of a temporal value (Field_temporal
    val_decimal): DATETIME → YYYYMMDDHHMMSS.ffffff, DATE → YYYYMMDD,
    TIME → ±HHMMSS.ffffff. Returns a Decimal, or None when *v* is not a
    temporal form (caller falls through to the plain numeric path)."""
    if isinstance(v, _datetime_mod.datetime):
        whole = (((v.year * 100 + v.month) * 100 + v.day) * 1_000_000
                 + v.hour * 10_000 + v.minute * 100 + v.second)
        return _Decimal(whole) + _Decimal(v.microsecond).scaleb(-6)
    if isinstance(v, _datetime_mod.date):
        return _Decimal(v.year * 10_000 + v.month * 100 + v.day)
    if src_base == "time" and isinstance(v, str):
        m = _re_mod.match(
            r"^(-?)(\d+):(\d{2}):(\d{2})(?:\.(\d+))?$", v.strip())
        if m:
            sign, hh, mm, ss, frac = m.groups()
            d = _Decimal(int(hh) * 10_000 + int(mm) * 100 + int(ss))
            if frac:
                d += _Decimal(int(frac.ljust(6, "0")[:6])).scaleb(-6)
            return -d if sign else d
    return None


def _retype_converter(src_decl: str, fin_decl: str, src_st, fin_st, col: str):
    """Cross-version MODIFY COLUMN retype: a row logged under *src_decl*
    decodes to that version's Python form, but the materialized output
    column carries the FINAL version's Spark type — convert the way a
    MySQL ``ALTER TABLE ... MODIFY`` converts the stored values
    (LogDecoder types by the version at the row's position; the
    current-schema view then casts forward). Returns ``None`` when the
    Spark types already agree (e.g. VARCHAR(8)→VARCHAR(64)), a
    value-converter otherwise, and raises a CLEAR plan-time error for
    retypes with no lossless forward cast (never an opaque Arrow
    serialization crash — ADVICE r10)."""
    from pyspark.sql import types as T

    def _ctx(fn):
        # EVERY converter goes through here (ADVICE r12): the numeric
        # paths use Decimal(str(v)), whose failure mode is
        # decimal.InvalidOperation (an ArithmeticError, NOT a
        # ValueError) — and multi-hop composition makes those paths
        # reachable from arbitrary upstream values, so an unwrapped
        # converter would surface as an opaque in-executor crash.
        def conv(v):
            try:
                return fn(v)
            except (ValueError, ArithmeticError, TypeError) as exc:
                raise ValueError(
                    f"column {col}: {exc} ({src_decl} -> {fin_decl})"
                ) from None
        return conv

    src_base = src_decl.strip().lower().split("(")[0].split()[0]
    fin_base = fin_decl.strip().lower().split("(")[0].split()[0]
    # ENUM/SET MODIFY retypes (r13, verdict ask #3): MySQL converts by
    # LABEL, not by stored index (Field_enum::store re-resolves the
    # string against the NEW definition — RowsLogBuffer.java:149-156
    # decodes indexes against the row's own version, so label identity
    # is the only cross-version invariant). A label absent from the new
    # set is a strict-mode conversion error; SET members additionally
    # re-canonicalize (dedupe + definition order, like the bitmask
    # round trip through Field_set::store).
    if fin_base == "enum":
        fin_labels = _decl_labels(fin_decl)
        if src_base == "enum" and _decl_labels(src_decl) == fin_labels:
            return None
        allowed = frozenset(fin_labels)

        def conv(v, _allowed=allowed):
            if not isinstance(v, str):
                raise ValueError(
                    f"cannot retype {type(v).__name__} value to ENUM")
            if v and v not in _allowed:
                raise ValueError(f"label {v!r} absent from target ENUM")
            return v
        return _ctx(conv)
    if fin_base == "set":
        fin_labels = _decl_labels(fin_decl)
        if src_base == "set" and _decl_labels(src_decl) == fin_labels:
            return None
        order = {s: i for i, s in enumerate(fin_labels)}

        def conv(v, _order=order):
            if not isinstance(v, str):
                raise ValueError(
                    f"cannot retype {type(v).__name__} value to SET")
            if not v:
                return v
            members = v.split(",")
            for mbr in members:
                if mbr not in _order:
                    raise ValueError(f"member {mbr!r} absent from target SET")
            return ",".join(
                sorted(dict.fromkeys(members), key=_order.get))
        return _ctx(conv)
    if src_st == fin_st and fin_base != "time":
        # same Spark type, but a DATETIME(p)-family fsp NARROWING still
        # rewrites stored values (rounding, not truncation — WL#946)
        if (src_base in ("datetime", "timestamp")
                and fin_base in ("datetime", "timestamp")):
            sfsp, ffsp = _temporal_fsp(src_decl), _temporal_fsp(fin_decl)
            if ffsp < sfsp:
                return _ctx(lambda v: _round_dt_fsp(v, ffsp))
        if src_base != "time" or _temporal_fsp(src_decl) == 0:
            return None
        # TIME(p>0) → VARCHAR falls through to the string target so the
        # canonical trimmed form picks up its fsp-exact zero padding
    tn = fin_st.typeName()
    # temporal targets (r12, verdict ask #3): MySQL's ALTER … MODIFY
    # forward-casts VARCHAR/INT/DECIMAL → DATE/DATETIME/TIMESTAMP/TIME
    # with defined parse/rounding semantics (RowsLogBuffer.java:128-144
    # type lattice; strict-mode: unconvertible raises, never a
    # fabricated zero-date)
    if fin_base == "time":
        # TIME's Spark type is string, so an all-string chain can reach
        # here with src_st == fin_st; normalize digits ('123' → '00:01:23')
        if src_base == "time":
            sfsp, ffsp = _temporal_fsp(src_decl), _temporal_fsp(fin_decl)
            if ffsp < sfsp:
                return _ctx(lambda v: _round_time_str_fsp(v, ffsp))
            return None
        return _ctx(_mysql_cast_time_str)
    if tn == "date":
        def _to_date(v):
            if isinstance(v, _datetime_mod.datetime):
                return v.date()  # MySQL truncates the time part
            if isinstance(v, _datetime_mod.date):
                return v
            return _mysql_cast_datetime(v).date()
        return _ctx(_to_date)
    if tn in ("timestamp", "timestamp_ntz"):
        return _ctx(_mysql_cast_datetime)
    if tn == "string":
        # DATETIME(p)/TIME(p) sources render their column's EXACT fsp
        # (r13, verdict ask #3): MySQL's temporal→VARCHAR MODIFY writes
        # 'YYYY-MM-DD HH:MM:SS.ffffff' with p fractional digits, zeros
        # included — not the trimmed canonical form
        sfsp = (_temporal_fsp(src_decl)
                if src_base in ("datetime", "timestamp", "time") else 0)

        def conv(v, _sfsp=sfsp, _src_base=src_base):
            if isinstance(v, str):
                if _src_base == "time" and _sfsp:
                    m = _re_mod.match(
                        r"^(-?\d+:\d{2}:\d{2})(?:\.(\d+))?$", v.strip())
                    if m:
                        base, frac = m.groups()
                        return base + "." + (frac or "").ljust(_sfsp,
                                                               "0")[:_sfsp]
                return v
            if isinstance(v, bool):
                return "1" if v else "0"
            if isinstance(v, (bytes, bytearray)):
                return bytes(v).decode("utf-8", "replace")
            if isinstance(v, _datetime_mod.datetime):
                s = v.strftime("%Y-%m-%d %H:%M:%S")
                if _src_base in ("datetime", "timestamp"):
                    if _sfsp:
                        s += "." + f"{v.microsecond:06d}"[:_sfsp]
                    return s
                return s + (f".{v.microsecond:06d}" if v.microsecond else "")
            if isinstance(v, _datetime_mod.date):
                return v.isoformat()
            return str(v)
        return _ctx(conv)
    if tn in ("long", "integer", "short", "byte"):
        def conv(v, _src_base=src_base):
            if isinstance(v, (int, bool)):
                return int(v)
            # temporal fractions round in the TEMPORAL domain first
            # (TIME_to_ulonglong_round: 12:34:59.6 → 12:35:00 → 123500,
            # never the numeric 123460) — then take the integer image
            if isinstance(v, _datetime_mod.datetime):
                v = _round_dt_fsp(v, 0)
            elif _src_base == "time" and isinstance(v, str):
                v = _round_time_str_fsp(v, 0)
            d = _temporal_numeric(v, _src_base)
            if d is None:
                d = _Decimal(str(v))
            # MySQL integer cast rounds half away from zero
            return int(d.to_integral_value(rounding="ROUND_HALF_UP"))
        return _ctx(conv)
    if tn in ("double", "float"):
        def conv(v, _src_base=src_base):
            d = _temporal_numeric(v, _src_base)
            return float(d) if d is not None else float(v)
        return _ctx(conv)
    if tn == "decimal":
        scale = fin_st.scale
        q = _Decimal(1).scaleb(-scale)

        def conv(v, _src_base=src_base, _q=q, _scale=scale):
            # same temporal-domain rounding as the integer image, at the
            # target scale (my_time_round before the decimal conversion)
            if isinstance(v, _datetime_mod.datetime):
                v = _round_dt_fsp(v, min(_scale, 6))
            elif _src_base == "time" and isinstance(v, str):
                v = _round_time_str_fsp(v, min(_scale, 6))
            d = _temporal_numeric(v, _src_base)
            if d is None:
                d = _Decimal(str(v))
            return d.quantize(_q, rounding="ROUND_HALF_UP")
        return _ctx(conv)
    if tn == "boolean":
        return _ctx(
            lambda v: bool(int(v)) if not isinstance(v, bool) else v)
    if tn == "binary":
        def conv(v):
            if isinstance(v, (bytes, bytearray)):
                return bytes(v)
            if isinstance(v, str):
                return v.encode("utf-8")
            raise ValueError(
                f"cannot retype {type(v).__name__} value to binary"
            )
        return _ctx(conv)
    _ = T  # imported for symmetry with callers; no other targets supported
    raise ValueError(
        f"column {col}: retype {src_decl} -> {fin_decl} has no supported "
        f"forward cast ({src_st.simpleString()} -> {fin_st.simpleString()}) "
        f"— re-snapshot the table instead of replaying across this ALTER"
    )


def _registry_decode_plan(registry, db: str, tbl: str,
                          include_action: bool = False,
                          tolerate_truncation: bool = False):
    """Shared plan behind the batch (`decode_wire_with_registry`) and
    streaming (`streaming.source.wire_typed_stream`) registry-typed
    attaches: returns the per-file ``mapInPandas`` generator and its
    output schema, built from the registry's version timeline.
    ``tolerate_truncation`` is for tailed relay directories, where a
    file can land torn — decode stops cleanly at the tear instead of
    failing the stream (`wire_stream` semantics)."""
    import bisect

    from pyspark.sql import types as T

    from polardbx_cdc_spark.types import spark_type_for

    starts = sorted(
        from_tso
        for (d, t, from_tso, _to, _cols) in registry.version_intervals()
        if (d, t) == (db, tbl)
    )
    versions = []  # (from_key, origin ids, decls, width) — live only
    timeline = []  # (from_key, state): plan index | "GONE" (dropped)
    fin_schema = None
    for from_tso in starts:
        s = registry.find(db, tbl, from_tso)
        if s is None:
            timeline.append((from_tso, "GONE"))
        else:
            versions.append(
                (from_tso, s.origin_names(), tuple(s.types), len(s.columns))
            )
            timeline.append((from_tso, len(versions) - 1))
            fin_schema = s
    if not versions:
        raise ValueError(f"registry has no live schema for {db}.{tbl}")
    if timeline[-1][1] == "GONE":
        raise ValueError(
            f"{db}.{tbl} is dropped at the registry head "
            f"({timeline[-1][0]}) — nothing to materialize"
        )
    # DROP TABLE + re-CREATE resets the table's GENERATION: rows logged
    # before the last drop belong to an erased generation sharing no
    # lineage with the current schema — skip them (they are not part of
    # any current-state view), never project them to all-NULL noise
    last_gone = max(
        (i for i, (_k, st) in enumerate(timeline) if st == "GONE"),
        default=-1,
    )
    for i in range(last_gone):
        timeline[i] = (timeline[i][0], "STALE")
    # output = the latest VISIBLE schema: implicit-PK columns
    # (hidden_pks) are decoded for width/position but dropped from the
    # logical surface, like every other logical image (DDLConverter
    # hidden-PK handling; version_intervals filters the same way).
    # Cross-version matching is by ORIGIN identity (birth name@tso,
    # stable across RENAME COLUMN), so a renamed column's earlier values
    # carry into its current name — name fallback on legacy snapshots.
    fin_all = list(zip(fin_schema.columns, fin_schema.origin_names(),
                       fin_schema.types))
    fin_cols, fin_origins, fin_decls = map(tuple, zip(*[
        (c, o, ty) for c, o, ty in fin_all
        if c not in fin_schema.hidden_pks
    ]))

    fields = []
    if include_action:
        fields.append(T.StructField("action", T.StringType(), False))
    for name, decl in zip(fin_cols, fin_decls):
        st = spark_type_for(decl)
        if isinstance(st, (T.TimestampType, T.TimestampNTZType)):
            st = T.TimestampNTZType()
        fields.append(T.StructField(name, st, True))
    out_schema = T.StructType(fields)
    vfields = fields[1:] if include_action else fields

    # per version: source index + source decl for each FINAL column
    tkeys = [k for k, _st in timeline]
    tstates = [st for _k, st in timeline]
    vidx = [
        {o: i for i, o in enumerate(origs)} for _t, origs, _d, _w in versions
    ]

    def _norm_st(decl: str):
        st = spark_type_for(decl)
        if isinstance(st, (T.TimestampType, T.TimestampNTZType)):
            st = T.TimestampNTZType()
        return st

    vplans = []
    for vi, (vtso, origs, decls, width) in enumerate(versions):
        idx = vidx[vi]
        src = [idx.get(o) for o in fin_origins]
        src_decls = [
            decls[idx[o]] if o in idx else fd
            for o, fd in zip(fin_origins, fin_decls)
        ]
        # per-column SOURCE-version Spark field (coercion must follow the
        # type the row was LOGGED under) + forward retype converters to
        # the FINAL field when MODIFY COLUMNs changed the type between
        # this version and the head (ADVICE r10: without them, an int
        # logged under BIGINT reaching a VARCHAR output column dies as
        # an opaque ArrowTypeError inside mapInPandas). r12: converters
        # COMPOSE through every intermediate retype, exactly like
        # MySQL's sequential ALTER rewrites — BIGINT→DECIMAL(12,2)→
        # VARCHAR materializes 123 as '123.00' (the decimal rewrite
        # happened first), not '123'.
        sfields, convs = [], []
        for sd, fd, f, col, o in zip(
            src_decls, fin_decls, vfields, fin_cols, fin_origins
        ):
            st = _norm_st(sd)
            sfields.append(T.StructField(col, st, True))
            # decl chain for this origin across the later versions
            chain = [sd]
            for vj in range(vi + 1, len(versions)):
                j = vidx[vj].get(o)
                if j is not None and versions[vj][2][j] != chain[-1]:
                    chain.append(versions[vj][2][j])
            if chain[-1] != fd:
                chain.append(fd)
            steps = []
            cur_decl, cur_st = chain[0], st
            try:
                for hop_i, nxt in enumerate(chain[1:], start=1):
                    nst = (f.dataType if hop_i == len(chain) - 1
                           else _norm_st(nxt))
                    c = _retype_converter(cur_decl, nxt, cur_st, nst, col)
                    if c is not None:
                        steps.append(c)
                    cur_decl, cur_st = nxt, nst
            except ValueError as exc:
                raise ValueError(
                    f"{db}.{tbl} version @{vtso}: {exc}"
                ) from None
            if not steps:
                convs.append(None)
            elif len(steps) == 1:
                convs.append(steps[0])
            else:
                def _composed(v, _steps=tuple(steps)):
                    for c in _steps:
                        v = c(v)
                    return v
                convs.append(_composed)
        v_codecs = _label_codecs(src_decls)
        v_coerce = [
            _compile_coercer(sf, c, sd)
            for sf, c, sd in zip(sfields, v_codecs, src_decls)
        ]
        vplans.append((width, src, v_coerce, convs))

    def decode_files(batches):
        import os

        import pandas as pd

        # ONE position-key recipe repo-wide: the registry was versioned
        # by replay_wire_ddl with this exact helper
        from polardbx_cdc_spark.meta import wire_position_key

        for pdf in batches:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                name = os.path.basename(path)
                for rec in wire_frame_rows(name, bytes(content),
                                           include_values=True,
                                           tolerate_truncation=tolerate_truncation):
                    kind, edb, etbl, values = rec[2], rec[3], rec[4], rec[8]
                    if values is None or (edb, etbl) != (db, tbl):
                        continue
                    if kind != "INSERT" and not include_action:
                        continue
                    key = wire_position_key(name, rec[1])
                    ti = bisect.bisect_right(tkeys, key) - 1
                    if ti < 0:
                        raise ValueError(
                            f"{name} pos {rec[1]}: row event precedes every "
                            f"registry version of {db}.{tbl}"
                        )
                    state = tstates[ti]
                    if state == "STALE" or state == "GONE":
                        # an erased previous generation (rows before the
                        # last DROP TABLE) — not part of the current view
                        continue
                    if rec[9] is not None:
                        # MINIMAL/NOBLOB image: absent columns were padded
                        # to None by the decoder — materializing them would
                        # emit NULLs indistinguishable from real NULLs.
                        # Registry decode requires FULL row images; pair
                        # partial-image streams with the last-image
                        # machinery first (ADVICE r10).
                        raise ValueError(
                            f"{name} pos {rec[1]}: PARTIAL row image "
                            f"(present columns {rec[9]}) reached registry "
                            f"decode of {db}.{tbl} — full images required "
                            f"(binlog_row_image=FULL); apply last-image "
                            f"merge before materializing"
                        )
                    width, src, coercers, convs = vplans[state]
                    if len(values) != width:
                        raise ValueError(
                            f"{name} pos {rec[1]}: wire row width "
                            f"{len(values)} != registry version width "
                            f"{width} for {db}.{tbl} (registry drift)"
                        )
                    row = [None] * len(fin_cols)
                    for o, (si, co, conv) in enumerate(
                        zip(src, coercers, convs)
                    ):
                        if si is not None:
                            v = values[si]
                            if co is not None:
                                v = co(v)
                            if conv is not None and v is not None:
                                v = conv(v)
                            row[o] = v
                    out.append(([kind] + row) if include_action else row)
            yield pd.DataFrame(
                out,
                columns=(["action"] + list(fin_cols)) if include_action
                else list(fin_cols),
            )

    return decode_files, out_schema


def seek_wire_position(spark, wire_dir: str, tso: str):
    """Find the replication position of the first transaction whose
    commit TSO is at or past ``tso`` — SearchTsoEventHandleV2 semantics
    (polardbx-cdc-canal/.../handle/SearchTsoEventHandleV2.java:41-67)
    executed against REAL wire files: the per-txn GCN events carry the
    commit TSO's physical prefix, so the seek is a filter over the
    decoded GCN rows (Catalyst prunes; no driver-side file walk).
    Returns {"file_name", "pos", "gcn"} of the txn's GCN event, or None
    when every transaction commits before ``tso``."""
    from pyspark.sql import functions as F

    # clamp to int64: a 19-digit physical prefix can exceed Long.MAX
    # (9.22e18); anything above it is past every representable GCN
    target = min(int(str(tso)[:19].ljust(19, "0")), (1 << 63) - 1)
    rows = (
        read_wire_binlog(spark, wire_dir)
        .filter((F.col("kind") == "GCN") & (F.col("xid") >= target))
        .orderBy("file_name", "pos")
        .limit(1)
        .collect()
    )
    if not rows:
        return None
    r = rows[0]
    return {"file_name": r["file_name"], "pos": r["pos"], "gcn": r["xid"]}


# ---------------------------------------------------------------------------
# MySQL binary JSON (TYPE_JSON) — the json_binary.h layout
# ---------------------------------------------------------------------------
#
# Retires the JSON carve-out: a JSON column's row-image bytes are the
# server's binary JSON document (NOT text), length-prefixed like a BLOB.
# Layout (public mysql/sql/json_binary.h; decode parity:
# polardbx-cdc-canal/.../binlog/JsonConversion.java):
#   doc        ::= type(1) payload
#   object     ::= count size key-entry* value-entry* keys values
#   array      ::= count size value-entry* values
#   small/large: 2- vs 4-byte count/size/offsets (small iff size ≤ 0xFFFF)
#   value-entry: type(1) + inlined-value-or-offset (offset from payload
#                start); literals/int16/uint16 inline in small docs,
#                int32/uint32 additionally inline in large docs
#   string     ::= varlen(7-bits-per-byte, high-bit continuation) utf8

JSON_SMALL_OBJECT = 0x00
JSON_LARGE_OBJECT = 0x01
JSON_SMALL_ARRAY = 0x02
JSON_LARGE_ARRAY = 0x03
JSON_LITERAL = 0x04
JSON_INT16 = 0x05
JSON_UINT16 = 0x06
JSON_INT32 = 0x07
JSON_UINT32 = 0x08
JSON_INT64 = 0x09
JSON_UINT64 = 0x0A
JSON_DOUBLE = 0x0B
JSON_STRING = 0x0C

_JSON_LIT = {None: 0x00, True: 0x01, False: 0x02}
_JSON_LIT_INV = {0x00: None, 0x01: True, 0x02: False}


def _json_varlen(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _json_read_varlen(buf: bytes, pos: int) -> tuple[int, int]:
    n = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, pos
        shift += 7


def _json_scalar(v) -> tuple[int, bytes]:
    """(type, payload) for a non-container value."""
    if isinstance(v, bool) or v is None:
        return JSON_LITERAL, bytes([_JSON_LIT[v]])
    if isinstance(v, int):
        if -(1 << 15) <= v < (1 << 15):
            return JSON_INT16, struct.pack("<h", v)
        if -(1 << 31) <= v < (1 << 31):
            return JSON_INT32, struct.pack("<i", v)
        if -(1 << 63) <= v < (1 << 63):
            return JSON_INT64, struct.pack("<q", v)
        return JSON_UINT64, struct.pack("<Q", v)
    if isinstance(v, float):
        return JSON_DOUBLE, struct.pack("<d", v)
    if isinstance(v, str):
        b = v.encode()
        return JSON_STRING, _json_varlen(len(b)) + b
    raise ValueError(f"JSON slice cannot serialize {type(v).__name__}")


def _json_value(v) -> tuple[int, bytes]:
    """(type, payload) for any value, containers included."""
    if isinstance(v, dict):
        return _json_container(v, is_object=True)
    if isinstance(v, (list, tuple)):
        return _json_container(v, is_object=False)
    return _json_scalar(v)


def _json_container(v, is_object: bool) -> tuple[int, bytes]:
    items = sorted(v.items()) if is_object else [(None, x) for x in v]
    children = [(k, _json_value(x)) for k, x in items]
    keys = [k.encode() for k, _ in children] if is_object else []

    def build(large: bool) -> bytes:
        w, fmt = (4, "<I") if large else (2, "<H")
        inline = {JSON_LITERAL, JSON_INT16, JSON_UINT16} | (
            {JSON_INT32, JSON_UINT32} if large else set()
        )
        n = len(children)
        header = 2 * w  # count + size
        key_entries = (w + 2) * n if is_object else 0
        value_entries = (1 + w) * n
        pos = header + key_entries + value_entries
        key_off = []
        for kb in keys:
            key_off.append(pos)
            pos += len(kb)
        out_vals = bytearray()
        entries = bytearray()
        for _, (t, payload) in children:
            if t in inline:
                slot = payload.ljust(w, b"\x00")
                entries += bytes([t]) + slot
            else:
                entries += bytes([t]) + struct.pack(fmt, pos + len(out_vals))
                out_vals += payload
        size = pos + len(out_vals)
        buf = bytearray(struct.pack(fmt, n) + struct.pack(fmt, size))
        for off, kb in zip(key_off, keys):
            buf += struct.pack(fmt, off) + struct.pack("<H", len(kb))
        buf += entries
        for kb in keys:
            buf += kb
        buf += out_vals
        return bytes(buf)

    try:
        small = build(False)
    except struct.error:  # an offset/size overflowed the 2-byte form
        small = None
    if small is not None and len(small) <= 0xFFFF:
        return (JSON_SMALL_OBJECT if is_object else JSON_SMALL_ARRAY), small
    return (JSON_LARGE_OBJECT if is_object else JSON_LARGE_ARRAY), build(True)


def json_serialize(v) -> bytes:
    """Python value → MySQL binary JSON document (type byte + payload)."""
    t, payload = _json_value(v)
    return bytes([t]) + payload


def _json_parse_value(t: int, buf: bytes, pos: int):
    if t in (JSON_SMALL_OBJECT, JSON_LARGE_OBJECT, JSON_SMALL_ARRAY, JSON_LARGE_ARRAY):
        large = t in (JSON_LARGE_OBJECT, JSON_LARGE_ARRAY)
        is_object = t in (JSON_SMALL_OBJECT, JSON_LARGE_OBJECT)
        w, fmt = (4, "<I") if large else (2, "<H")
        base = pos
        n = struct.unpack_from(fmt, buf, pos)[0]
        p = pos + 2 * w
        keys = []
        if is_object:
            for _ in range(n):
                koff = struct.unpack_from(fmt, buf, p)[0]
                klen = struct.unpack_from("<H", buf, p + w)[0]
                keys.append(buf[base + koff : base + koff + klen].decode())
                p += w + 2
        inline = {JSON_LITERAL, JSON_INT16, JSON_UINT16} | (
            {JSON_INT32, JSON_UINT32} if large else set()
        )
        vals = []
        for _ in range(n):
            vt = buf[p]
            if vt in inline:
                vals.append(_json_parse_inline(vt, buf, p + 1, w))
            else:
                # the TYPE lives in the entry; the offset points straight
                # at the payload (json_binary.h value-entry layout)
                off = struct.unpack_from(fmt, buf, p + 1)[0]
                vals.append(_json_parse_value(vt, buf, base + off))
            p += 1 + w
        return dict(zip(keys, vals)) if is_object else vals
    if t == JSON_LITERAL:
        return _JSON_LIT_INV[buf[pos]]
    if t == JSON_INT16:
        return struct.unpack_from("<h", buf, pos)[0]
    if t == JSON_UINT16:
        return struct.unpack_from("<H", buf, pos)[0]
    if t == JSON_INT32:
        return struct.unpack_from("<i", buf, pos)[0]
    if t == JSON_UINT32:
        return struct.unpack_from("<I", buf, pos)[0]
    if t == JSON_INT64:
        return struct.unpack_from("<q", buf, pos)[0]
    if t == JSON_UINT64:
        return struct.unpack_from("<Q", buf, pos)[0]
    if t == JSON_DOUBLE:
        return struct.unpack_from("<d", buf, pos)[0]
    if t == JSON_STRING:
        ln, p = _json_read_varlen(buf, pos)
        return buf[p : p + ln].decode()
    raise ValueError(f"unsupported binary-JSON type {t:#x}")


def _json_parse_inline(vt: int, buf: bytes, pos: int, w: int):
    if vt == JSON_LITERAL:
        return _JSON_LIT_INV[buf[pos]]
    if vt == JSON_INT16:
        return struct.unpack_from("<h", buf, pos)[0]
    if vt == JSON_UINT16:
        return struct.unpack_from("<H", buf, pos)[0]
    if vt == JSON_INT32:
        return struct.unpack_from("<i", buf, pos)[0]
    return struct.unpack_from("<I", buf, pos)[0]  # JSON_UINT32


def json_parse(doc: bytes):
    """MySQL binary JSON document → Python value."""
    if not doc:
        return None
    return _json_parse_value(doc[0], doc, 1)


# ---------------------------------------------------------------------------
# Partial JSON (PARTIAL_UPDATE_ROWS_EVENT, type 39) — JSON diff vectors.
# Wire format per diff (json_diff.h Json_diff_vector::read_binary):
#   operation(1)  path_len(lenenc)  path_bytes
#   [ value_len(lenenc)  value_bytes(binary JSON) ]   -- absent for REMOVE
# Paths are MySQL JSON path expressions ($.member, $[N], $."quoted").
# ---------------------------------------------------------------------------

class JsonDiff:
    """One JSON diff: (op, path, value). ``value`` is a decoded Python
    JSON value for REPLACE/INSERT, None for REMOVE."""

    __slots__ = ("op", "path", "value")

    def __init__(self, op: int, path: str, value=None):
        self.op, self.path, self.value = op, path, value

    def __eq__(self, other):
        return (
            isinstance(other, JsonDiff)
            and (self.op, self.path, self.value)
            == (other.op, other.path, other.value)
        )

    def __repr__(self):
        name = {0: "REPLACE", 1: "INSERT", 2: "REMOVE"}.get(self.op, self.op)
        return f"JsonDiff({name}, {self.path!r}, {self.value!r})"


class JsonDiffVector(list):
    """After-image value of a partial-format JSON column: a list of
    :class:`JsonDiff` applied in order to the before-image document."""


def encode_json_diffs(diffs: JsonDiffVector | list) -> bytes:
    out = bytearray()
    for d in diffs:
        out.append(d.op)
        pb = d.path.encode()
        out += _lenenc(len(pb)) + pb
        if d.op != JSON_DIFF_REMOVE:
            vb = json_serialize(d.value)
            out += _lenenc(len(vb)) + vb
    return bytes(out)


def decode_json_diffs(buf: bytes) -> JsonDiffVector:
    diffs = JsonDiffVector()
    pos = 0
    while pos < len(buf):
        op = buf[pos]
        pos += 1
        if op not in (JSON_DIFF_REPLACE, JSON_DIFF_INSERT, JSON_DIFF_REMOVE):
            raise ValueError(f"unknown JSON diff operation {op}")
        plen, pos = _read_lenenc(buf, pos)
        if pos + plen > len(buf):
            raise ValueError("JSON diff path overruns buffer")
        path = buf[pos : pos + plen].decode()
        pos += plen
        value = None
        if op != JSON_DIFF_REMOVE:
            vlen, pos = _read_lenenc(buf, pos)
            if pos + vlen > len(buf):
                raise ValueError("JSON diff value overruns buffer")
            value = json_parse(bytes(buf[pos : pos + vlen]))
            pos += vlen
        diffs.append(JsonDiff(op, path, value))
    return diffs


def _parse_json_path(path: str) -> list:
    """MySQL JSON path → legs: ('member', name) | ('index', n).
    Supports $, .name, ."quoted name", [N] — the shapes the server emits
    in diffs (wildcards never appear in Json_diff paths)."""
    s = path.strip()
    if not s.startswith("$"):
        raise ValueError(f"JSON path must start with $: {path!r}")
    legs: list = []
    i = 1
    while i < len(s):
        c = s[i]
        if c == ".":
            i += 1
            if i < len(s) and s[i] == '"':
                j = i + 1
                name = []
                while j < len(s) and s[j] != '"':
                    if s[j] == "\\" and j + 1 < len(s):
                        j += 1
                    name.append(s[j])
                    j += 1
                if j >= len(s):
                    raise ValueError(f"unterminated quoted member: {path!r}")
                legs.append(("member", "".join(name)))
                i = j + 1
            else:
                j = i
                while j < len(s) and s[j] not in ".[":
                    j += 1
                if j == i:
                    raise ValueError(f"empty member name in {path!r}")
                legs.append(("member", s[i:j]))
                i = j
        elif c == "[":
            j = s.index("]", i)
            legs.append(("index", int(s[i + 1 : j])))
            i = j + 1
        else:
            raise ValueError(f"bad JSON path syntax at {i}: {path!r}")
    return legs


_NEEDS_QUOTE = _re_mod.compile(r"[^A-Za-z0-9_]|^$|^\d")


def _json_eq(a, b) -> bool:
    """JSON-semantics equality: MySQL distinguishes what Python ``==``
    conflates — true/1, false/0, 1/1.0 serialize to DIFFERENT binary
    JSON (JSON_LITERAL vs JSON_INT vs JSON_DOUBLE) and must diff."""
    if isinstance(a, bool) or isinstance(b, bool):
        return type(a) is type(b) and a == b
    if isinstance(a, float) and isinstance(b, float):
        # bit-level: 0.0 and -0.0 compare == in Python but serialize to
        # DIFFERENT JSON_DOUBLE bytes (sign bit) — they must diff
        return struct.pack("<d", a) == struct.pack("<d", b)
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return type(a) is type(b) and a == b
    if isinstance(a, dict) and isinstance(b, dict):
        return a.keys() == b.keys() and all(
            _json_eq(a[k], b[k]) for k in a
        )
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(map(_json_eq, a, b))
    return type(a) is type(b) and a == b


def _path_member(p: str, k: str) -> str:
    if _NEEDS_QUOTE.search(k):
        esc = k.replace("\\", "\\\\").replace('"', '\\"')
        return f'{p}."{esc}"'
    return f"{p}.{k}"


def compute_json_diffs(before, after,
                       path: str = "$") -> JsonDiffVector | None:
    """The server side of partial JSON: derive a MINIMAL diff vector
    turning *before* into *after* (what the optimizer's
    Json_diff_vector collection does before logging a type-39 event).
    Returns None when replacing the whole document is no smaller than
    diffing — mirroring the server's fall-back-to-full-value behavior
    (it logs the full value when the binary diff would be larger).

    Law (property-tested): ``apply_json_diffs(before,
    compute_json_diffs(before, after)) == after`` whenever a vector is
    returned. Objects diff member-wise (REPLACE changed, REMOVE absent,
    INSERT new); arrays diff by a common-prefix/suffix splice (the
    server's log_array_diff heuristic class): element REPLACEs inside
    the window, INSERTs/REMOVEs at one splice point."""
    diffs = JsonDiffVector()

    def walk(b, a, p: str) -> bool:
        """Append diffs turning b→a under path p; False = must REPLACE
        at p (types differ or scalar change)."""
        if type(b) is not type(a):
            return False
        if isinstance(b, dict):
            for k in b:
                child = _path_member(p, k)
                if k not in a:
                    diffs.append(JsonDiff(JSON_DIFF_REMOVE, child))
                elif not _json_eq(b[k], a[k]):
                    if not walk(b[k], a[k], child):
                        diffs.append(JsonDiff(JSON_DIFF_REPLACE, child, a[k]))
            for k in a:
                if k not in b:
                    diffs.append(
                        JsonDiff(JSON_DIFF_INSERT, _path_member(p, k), a[k])
                    )
            return True
        if isinstance(b, list):
            # common prefix / suffix, one splice in the middle
            pre = 0
            while pre < len(b) and pre < len(a) and _json_eq(b[pre], a[pre]):
                pre += 1
            suf = 0
            while (
                suf < len(b) - pre and suf < len(a) - pre
                and _json_eq(b[len(b) - 1 - suf], a[len(a) - 1 - suf])
            ):
                suf += 1
            mid_b, mid_a = len(b) - pre - suf, len(a) - pre - suf
            for i in range(min(mid_b, mid_a)):
                bi, ai = b[pre + i], a[pre + i]
                if not walk(bi, ai, f"{p}[{pre + i}]"):
                    diffs.append(
                        JsonDiff(JSON_DIFF_REPLACE, f"{p}[{pre + i}]", ai)
                    )
            if mid_b > mid_a:  # remove extras — indexes shift, remove at
                for _ in range(mid_b - mid_a):  # the same splice point
                    diffs.append(
                        JsonDiff(JSON_DIFF_REMOVE, f"{p}[{pre + mid_a}]")
                    )
            elif mid_a > mid_b:  # insert extras in order
                for i in range(mid_b, mid_a):
                    diffs.append(
                        JsonDiff(JSON_DIFF_INSERT, f"{p}[{pre + i}]",
                                 a[pre + i])
                    )
            return True
        return _json_eq(b, a)  # scalars: equal = no-op, else REPLACE

    if _json_eq(before, after):
        return JsonDiffVector()
    if not walk(before, after, path):
        return None  # whole-document type/scalar change: log full value
    return diffs


def apply_json_diffs(doc, diffs: list):
    """Materialize a partial JSON update: apply the diff vector to the
    before-image document (the server's apply_json_diff semantics:
    REPLACE sets an existing member/element, INSERT adds a new member or
    splices an array element at the index, REMOVE deletes). Returns the
    new document; the input is not mutated."""
    import copy

    out = copy.deepcopy(doc)
    for d in diffs:
        legs = _parse_json_path(d.path)
        if not legs:
            if d.op == JSON_DIFF_REPLACE:
                out = d.value
                continue
            raise ValueError(f"cannot {d.op} at root path $")
        parent = out
        for _kind, key in legs[:-1]:
            try:
                parent = parent[key]
            except (KeyError, IndexError, TypeError) as exc:
                raise ValueError(
                    f"JSON diff path missing intermediate: {d.path}"
                ) from exc
        kind, key = legs[-1]
        if d.op == JSON_DIFF_REPLACE:
            if kind == "member":
                if not isinstance(parent, dict) or key not in parent:
                    raise ValueError(f"REPLACE path missing: {d.path}")
                parent[key] = d.value
            else:
                if not isinstance(parent, list) or not 0 <= key < len(parent):
                    raise ValueError(f"REPLACE path missing: {d.path}")
                parent[key] = d.value
        elif d.op == JSON_DIFF_INSERT:
            if kind == "member":
                if not isinstance(parent, dict):
                    raise ValueError(f"INSERT into non-object: {d.path}")
                parent[key] = d.value
            else:
                if not isinstance(parent, list):
                    raise ValueError(f"INSERT into non-array: {d.path}")
                parent.insert(key, d.value)
        else:  # REMOVE
            if kind == "member":
                parent.pop(key, None)
            else:
                if isinstance(parent, list) and 0 <= key < len(parent):
                    parent.pop(key)
    return out


def export_wire_files_x(spark, sink_dir: str, wire_dir: str,
                        incremental: bool = False):
    """Binlog-X attach surface: render a BinlogXSink directory
    (partitioned stream_id/file_seq) as per-stream REAL wire file chains
    ``binlog-x-<stream>.NNNNNN`` — each stream an independent rotated
    sequence, exactly the multi-stream layout the reference's Binlog-X
    dumpers serve (stream name convention from the Binlog-X task model;
    per-stream writer streaming/pipeline.py:BinlogXSink).

    ``incremental=True`` mirrors the single-stream mode: an
    ``_manifest_x.json`` records per-(stream, seq) event counts; only
    files whose partition grew, appeared, or whose stream-tail just
    gained a successor re-render — steady state re-renders one tail
    file PER STREAM per cycle.

    Same scale shape as ``export_wire_files``: applyInPandas grouped by
    (stream_id, file_seq) — every file renders in its own task; only the
    one-row-per-file manifest returns. ROTATE chains link files WITHIN a
    stream and never across streams. EAGER like ``export_wire_files``:
    files land before this returns; the manifest frame is materialized."""
    import os

    from pyspark.sql import functions as F

    _ROW_TYPE = {
        "INSERT": WRITE_ROWS_EVENT,
        "UPDATE": UPDATE_ROWS_EVENT,
        "DELETE": DELETE_ROWS_EVENT,
    }
    import json

    df = spark.read.parquet(sink_dir)
    os.makedirs(wire_dir, exist_ok=True)
    max_seq = {
        r["stream_id"]: r["mx"]
        for r in df.groupBy("stream_id").agg(F.max("file_seq").alias("mx")).collect()
    }
    manifest_path = os.path.join(wire_dir, "_manifest_x.json")
    out_schema = (
        "stream_id int, file_seq bigint, file_name string, "
        "n_events bigint, n_bytes bigint"
    )
    prev: dict[tuple[int, int], int] = {}
    if incremental:
        try:
            with open(manifest_path) as fh:
                prev = {
                    (int(k.split(":")[0]), int(k.split(":")[1])): v
                    for k, v in json.load(fh).items()
                }
        except FileNotFoundError:
            prev = {}
        counts = {
            (r["stream_id"], r["file_seq"]): r["n"]
            for r in df.groupBy("stream_id", "file_seq")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        old_max = {}
        for (sid, seq) in prev:
            old_max[sid] = max(old_max.get(sid, -1), seq)
        changed = {
            (sid, seq)
            for (sid, seq), n in counts.items()
            if prev.get((sid, seq)) != n
            or (seq == old_max.get(sid, -1) and max_seq[sid] > old_max.get(sid, -1))
        }
        if not changed:
            return spark.createDataFrame([], out_schema)
        cond = F.concat_ws(":", F.col("stream_id"), F.col("file_seq")).isin(
            [f"{s}:{q}" for s, q in changed]
        )
        df = df.filter(cond)

    def render_file(key, pdf):
        import numpy as np
        import pandas as pd

        sid, seq = int(key[0]), int(key[1])
        pdf = pdf.sort_values("offset")
        events: list[bytes] = []
        current_table = None
        run_type, run_rows = None, []

        # vectorized image pass (r14) — same shape as export_wire_files:
        # all images up front (independent of db/tbl), run flushes slice
        # the shared buffer; per-stream frames are rows-only so the whole
        # frame vectorizes
        row_mask = pdf["action"].isin(_ROW_TYPE).to_numpy()
        img_enc = None
        if row_mask.any():
            img_enc = _encode_write_images(
                TableDef.from_mysql_types("x", "x", CDC_TABLE_TYPES),
                pdf[row_mask], ["pk", "value"], [None, None],
                [False, False], [False, False], None, np, pd,
            )
        img_pos = row_mask.cumsum() - 1
        run_i0 = run_n = 0

        if img_enc is not None:
            buf_img, off_img = img_enc
            post2 = struct.pack("<H", 0) + struct.pack("<H", 2)
            head2 = _lenenc(2) + _bitmap([True, True])

            def flush_run():
                nonlocal run_type, run_n
                if run_n:
                    tid = zlib.crc32(
                        ".".join(current_table).encode()) & 0x7FFFFFFF
                    i0, i1 = run_i0, run_i0 + run_n
                    seg = buf_img[off_img[i0]:off_img[i1]]
                    ev_head = struct.pack("<Q", tid)[:6] + post2 + head2
                    if run_type == UPDATE_ROWS_EVENT:
                        L = np.diff(off_img[i0:i1 + 1])
                        src = off_img[i0:i1] - off_img[i0]
                        base = np.concatenate(([0], np.cumsum(2 * L)))[:-1]
                        dup = np.empty(2 * seg.size, np.uint8)
                        idx = np.repeat(base - src, L) + np.arange(seg.size)
                        dup[idx] = seg
                        dup[idx + np.repeat(L, L)] = seg
                        body = (ev_head + _bitmap([True, True])
                                + dup.tobytes())
                    else:
                        body = ev_head + seg.tobytes()
                    events.append(encode_event(run_type, body))
                    run_n = 0
                run_type = None
        else:
            def flush_run():
                nonlocal run_type, run_rows
                if run_rows:
                    td = TableDef.from_mysql_types(
                        *current_table, CDC_TABLE_TYPES)
                    tid = zlib.crc32(
                        ".".join(current_table).encode()) & 0x7FFFFFFF
                    events.append(
                        encode_rows_event(run_type, tid, td, run_rows))
                    run_rows = []
                run_type = None

        for p, r in enumerate(pdf.itertuples(index=False)):
            tc = _ROW_TYPE[r.action]
            if current_table != (r.db, r.tbl):
                flush_run()
                current_table = (r.db, r.tbl)
                td = TableDef.from_mysql_types(r.db, r.tbl, CDC_TABLE_TYPES)
                tid = zlib.crc32(f"{r.db}.{r.tbl}".encode()) & 0x7FFFFFFF
                events.append(encode_table_map(tid, td))
            elif tc != run_type:
                flush_run()
            if img_enc is not None:
                if run_n == 0:
                    run_i0 = img_pos[p]
                run_type = tc
                run_n += 1
            else:
                vals = [r.pk, None if pd.isna(r.value) else float(r.value)]
                run_type = tc
                run_rows.append(
                    (vals, vals) if tc == UPDATE_ROWS_EVENT else vals)
        flush_run()
        name = f"binlog-x-{sid}.{seq + 1:06d}"
        nxt = f"binlog-x-{sid}.{seq + 2:06d}" if seq < max_seq[sid] else None
        path = os.path.join(wire_dir, name)
        write_binlog_file(path, events, next_file=nxt)
        return pd.DataFrame(
            [(sid, seq, name, len(pdf), os.path.getsize(path))],
            columns=["stream_id", "file_seq", "file_name", "n_events", "n_bytes"],
        )

    result = (
        df.select("stream_id", "file_seq", "offset", "action", "db", "tbl", "pk", "value")
        .groupBy("stream_id", "file_seq")
        .applyInPandas(render_file, out_schema)
    )
    if not incremental:
        # EAGER by contract (same as export_wire_files): render now,
        # return the materialized one-row-per-file manifest.
        rows = result.collect()
        return spark.createDataFrame(rows, out_schema)
    rows = result.collect()  # bounded: one row per re-rendered file
    merged = dict(prev)
    for r in rows:
        merged[(int(r["stream_id"]), int(r["file_seq"]))] = r["n_events"]
    tmp = manifest_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({f"{s}:{q}": v for (s, q), v in merged.items()}, fh)
    os.replace(tmp, manifest_path)
    return spark.createDataFrame(rows, out_schema)
