"""Round-8 wire fidelity: charset TLVs (DEFAULT_CHARSET/COLUMN_CHARSET),
GEOMETRY_TYPE, COLUMN_VISIBILITY, the spec-conformant TLV numbering, and
the statement-era INTVAR/RAND/USER_VAR carriers.

Layouts are the public rows_event.h Optional_metadata_field_type ones;
the reference decodes the same statement events (LogDecoder.java)."""

from __future__ import annotations

import pytest

from polardbx_cdc_spark import binlog_wire as W


def test_tlv_numbering_matches_public_spec():
    """SET=5/ENUM=6/COLUMN_CHARSET=3/DEFAULT_CHARSET=2 — the 8.0
    rows_event.h numbering. (Regression: 3/5 were previously swapped in
    as SET/ENUM, which only self-roundtrips could tolerate.)"""
    assert W._DEFAULT_CHARSET_TLV == 2
    assert W._COLUMN_CHARSET_TLV == 3
    assert W._COLUMN_NAME_TLV == 4
    assert W._SET_STR_VALUE_TLV == 5
    assert W._ENUM_STR_VALUE_TLV == 6
    assert W._GEOMETRY_TYPE_TLV == 7
    assert W._SIMPLE_PRIMARY_KEY_TLV == 8
    assert W._COLUMN_VISIBILITY_TLV == 12


def _roundtrip_table(td, rows, rows_type=W.WRITE_ROWS_EVENT):
    ev = W.encode_table_map(9, td) + W.encode_rows_event(rows_type, 9, td, rows)
    out = W.decode_events(W.encode_fde() + ev)
    tm = [e for e in out if e["type"] == W.TABLE_MAP_EVENT][0]
    rws = [e for e in out if e["type"] == rows_type][0]["rows"]
    return ev, tm, rws


def test_latin1_and_gbk_columns_roundtrip_with_true_wire_bytes():
    td = W.TableDef(
        "d", "t",
        [(W.TYPE_LONGLONG, None), (W.TYPE_VARCHAR, 64),
         (W.TYPE_STRING, (W.TYPE_STRING, 40))],
        charsets={1: 8, 2: 28},  # latin1_swedish_ci, gbk_chinese_ci
        default_charset=8,
    )
    rows = [[1, "café", "中文"], [2, "naïve", "汉字"]]
    ev, tm, rws = _roundtrip_table(td, rows)
    assert rws == rows
    # override pair only (col 1 == default) + default collation
    assert tm["default_charset"] == 8
    assert tm["charsets"] == {2: 28}
    # the VALUE BYTES are the declared charsets, not utf-8
    assert "café".encode("latin-1") in bytes(ev)
    assert "café".encode("utf-8") not in bytes(ev)
    assert "中文".encode("gbk") in bytes(ev)


def test_column_charset_tlv_without_default():
    td = W.TableDef(
        "d", "t", [(W.TYPE_VARCHAR, 32), (W.TYPE_VARCHAR, 32)],
        charsets={0: 8, 1: 45},
    )
    _, tm, rws = _roundtrip_table(td, [["ü", "ü"]])
    assert tm["charsets"] == {0: 8, 1: 45}
    assert rws == [["ü", "ü"]]


def test_charset_survives_partial_row_images():
    """_sub_def projection must carry the charset map (present-column
    re-indexing included) — MINIMAL images of latin1 columns."""
    td = W.TableDef(
        "d", "t",
        [(W.TYPE_LONGLONG, None), (W.TYPE_VARCHAR, 64), (W.TYPE_VARCHAR, 64)],
        charsets={2: 8}, default_charset=45,
    )
    ev = W.encode_table_map(5, td) + W.encode_rows_event(
        W.WRITE_ROWS_EVENT, 5, td, [[None, None, "née"]],
        present=[False, False, True],
    )
    out = W.decode_events(W.encode_fde() + ev)
    rows = [e for e in out if e["type"] == W.WRITE_ROWS_EVENT][0]["rows"]
    assert rows == [[None, None, "née"]]
    assert "née".encode("latin-1") in bytes(ev)


def test_geometry_type_and_column_visibility_tlvs():
    td = W.TableDef(
        "d", "t2", [(W.TYPE_LONGLONG, None), (W.TYPE_GEOMETRY, 4)],
        geometry_types={1: 1},  # LINESTRING
        invisible={1},
    )
    out = W.decode_events(W.encode_fde() + W.encode_table_map(10, td))
    tm = out[-1]
    assert tm["geometry_types"] == {1: 1}
    assert tm["invisible_columns"] == [1]


def test_unknown_collation_falls_back_to_utf8():
    assert W._codec_for(9999) == "utf-8"
    assert W._codec_for(None) == "utf-8"
    assert W._codec_for(63) == "latin-1"  # binary: byte-transparent


def test_statement_era_events_decode():
    evs = W.decode_events(
        W.encode_intvar(2, 12345)
        + W.encode_rand(7, 9)
        + W.encode_user_var("v1", "txt")
        + W.encode_user_var("v2", -5)
        + W.encode_user_var("v3", 2.5)
        + W.encode_user_var("v4", None)
    )
    assert evs[0]["type"] == W.INTVAR_EVENT
    assert (evs[0]["intvar_type"], evs[0]["intvar_value"]) == (2, 12345)
    assert (evs[1]["rand_seed1"], evs[1]["rand_seed2"]) == (7, 9)
    assert [(e["var_name"], e.get("var_value")) for e in evs[2:]] == [
        ("v1", "txt"), ("v2", -5), ("v3", 2.5), ("v4", None)
    ]


def test_named_attach_resolves_charset_strings():
    td = W.TableDef(
        "d", "t", [(W.TYPE_LONGLONG, None), (W.TYPE_VARCHAR, 64)],
        col_names=["id", "name"], pk=[0],
        charsets={1: 8}, default_charset=8,
    )
    ev = W.encode_table_map(6, td) + W.encode_rows_event(
        W.WRITE_ROWS_EVENT, 6, td, [[1, "Ångström"]]
    )
    named = W.decode_named_rows(W.encode_fde() + ev)
    assert named[0]["values"] == {"id": 1, "name": "Ångström"}


def test_lifecycle_and_load_query_events_decode():
    """STOP / INCIDENT / IGNORABLE / BEGIN+EXECUTE_LOAD_QUERY — the
    events LogDecoder.java:294-330 constructs as first-class objects."""
    import struct

    stop = W.encode_event(W.STOP_EVENT, b"", 0)
    ign = W.encode_event(W.IGNORABLE_LOG_EVENT, b"\x00\x01", 0)
    inc = W.encode_event(
        W.INCIDENT_EVENT,
        struct.pack("<H", 1) + bytes([10]) + b"lost-bytes",
        0,
    )
    blq = W.encode_event(
        W.BEGIN_LOAD_QUERY_EVENT, struct.pack("<I", 77) + b"csv,chunk", 0
    )
    db, q = b"d1", b"LOAD DATA LOCAL INFILE 'x.csv' INTO TABLE t"
    elq = W.encode_event(
        W.EXECUTE_LOAD_QUERY_EVENT,
        struct.pack("<IIBHH", 9, 0, len(db), 0, 0)
        + struct.pack("<III", 77, 12, 30) + bytes([2])
        + db + b"\x00" + q,
        0,
    )
    evs = W.decode_events(stop + ign + inc + blq + elq)
    assert [e["type"] for e in evs] == [
        W.STOP_EVENT, W.IGNORABLE_LOG_EVENT, W.INCIDENT_EVENT,
        W.BEGIN_LOAD_QUERY_EVENT, W.EXECUTE_LOAD_QUERY_EVENT,
    ]
    assert evs[2]["incident_number"] == 1
    assert evs[2]["incident_message"] == "lost-bytes"
    assert evs[3]["file_id"] == 77 and evs[3]["block"] == b"csv,chunk"
    assert evs[4]["file_id"] == 77
    assert (evs[4]["fn_pos_start"], evs[4]["fn_pos_end"]) == (12, 30)
    assert evs[4]["dup_handling"] == 2
    assert evs[4]["db"] == "d1" and evs[4]["query"].startswith("LOAD DATA")


def test_blob_text_columns_occupy_charset_ordinals():
    """rows_event.cc is_character_type includes BLOB/TEXT: a real
    server's COLUMN_CHARSET list covers them, so the ordinal space must
    too — else collations land on the wrong columns (round-8 review)."""
    td = W.TableDef(
        "d", "t",
        [(W.TYPE_BLOB, 2), (W.TYPE_VARCHAR, 32)],  # TEXT first, like a
        charsets={0: 45, 1: 8},                     # real table layout
    )
    out = W.decode_events(W.encode_fde() + W.encode_table_map(4, td))
    tm = out[-1]
    # the VARCHAR got ITS latin1, not the TEXT column's utf8mb4
    assert tm["charsets"] == {0: 45, 1: 8}


def test_truncated_create_is_rejected_not_misparsed():
    """A torn CREATE (truncated QUERY event) must parse to NOTHING, not
    to a table with a corrupted last column (round-8 review: the
    unbalanced guard was dead code)."""
    from polardbx_cdc_spark.ddl import parse_ddl

    assert parse_ddl("CREATE TABLE t (a int, b varchar(10") == []
    assert parse_ddl("CREATE TABLE t (a int, b f(1)") == []


def test_typed_decode_materializes_partial_json(spark):
    """binlog_to_table(include_action=True) over a type-39 stream must
    surface the MATERIALIZED document, never raw JsonDiff objects."""
    td = W.TableDef("d", "t", [(W.TYPE_LONGLONG, None), (W.TYPE_JSON, 4)])
    diffs = W.JsonDiffVector([W.JsonDiff(W.JSON_DIFF_REPLACE, "$.a", 9)])
    ev = W.encode_table_map(5, td) + W.encode_rows_event(
        W.PARTIAL_UPDATE_ROWS_EVENT, 5, td, [([1, {"a": 1}], [1, diffs])]
    )
    blobs = spark.createDataFrame(
        [(bytearray(W.encode_fde() + ev),)], "payload binary"
    )
    back = W.binlog_to_table(
        blobs, ["bigint", "json"], ["id", "doc"], include_action=True
    )
    rows = back.collect()
    assert rows[0]["action"] == "UPDATE"
    import json as _json

    assert _json.loads(rows[0]["doc"]) == {"a": 9}


def test_mariadb_gtid_family_decodes_typed():
    """MariaDB GTID/GTID_LIST/BINLOG_CHECKPOINT/ANNOTATE_ROWS (types
    160-163): the reference enumerates and ignores them; here the txn
    carriers decode typed so a MariaDB archive's boundaries survive."""
    import struct

    g = W.encode_event(
        W.MARIA_GTID_EVENT,
        struct.pack("<QIB", 42, 3, 1), 0,
    )
    gl = W.encode_event(
        W.MARIA_GTID_LIST_EVENT,
        struct.pack("<I", 2)
        + struct.pack("<IIQ", 0, 1, 10) + struct.pack("<IIQ", 3, 1, 42),
        0,
    )
    cp = W.encode_event(
        W.MARIA_BINLOG_CHECKPOINT_EVENT,
        struct.pack("<I", 13) + b"binlog.000007", 0,
    )
    an = W.encode_event(
        W.MARIA_ANNOTATE_ROWS_EVENT, b"INSERT INTO t VALUES (1)", 0
    )
    evs = W.decode_events(g + gl + cp + an)
    assert (evs[0]["gtid_seq_no"], evs[0]["gtid_domain_id"]) == (42, 3)
    assert evs[1]["gtid_list"] == [(0, 1, 10), (3, 1, 42)]
    assert evs[2]["checkpoint_file"] == "binlog.000007"
    assert evs[3]["rows_query"].startswith("INSERT INTO")


def test_incident_surfaces_in_consumer_frame():
    """An INCIDENT (LOST_EVENTS) must reach appliers as a typed frame
    row, not vanish — a real replica stops on it."""
    import struct

    td = W.TableDef("d", "t", [(W.TYPE_LONGLONG, None)])
    blob = (
        W.MAGIC + W.encode_fde()
        + W.encode_table_map(3, td)
        + W.encode_rows_event(W.WRITE_ROWS_EVENT, 3, td, [[1]])
        + W.encode_event(
            W.INCIDENT_EVENT,
            struct.pack("<H", 1) + bytes([4]) + b"gap!", 0,
        )
        + W.encode_rows_event(W.WRITE_ROWS_EVENT, 3, td, [[2]])
    )
    rows = W.wire_frame_rows("f", blob)
    kinds = [r[2] for r in rows]
    assert kinds == ["INSERT", "INCIDENT", "INSERT"]
    inc = rows[1]
    assert inc[5] == "gap!" and inc[7] == 1


def test_canonical_character_set_and_collate_decls_map_charsets():
    """ADVICE r8: the canonical SHOW CREATE TABLE spellings — 'CHARACTER
    SET latin1' and bare 'COLLATE latin1_swedish_ci' — must map to the
    charset TLV exactly like the shorthand 'charset latin1'."""
    td = W.TableDef.from_mysql_types(
        "d", "t",
        ["bigint", "varchar(64) CHARACTER SET latin1",
         "varchar(32) COLLATE latin1_swedish_ci",
         "varchar(16) CHARACTER SET gbk COLLATE gbk_chinese_ci",
         "varchar(8) COLLATE utf8mb4_general_ci"],
    )
    assert td.charsets == {1: 8, 2: 8, 3: 28, 4: 255}
    rows = [[1, "café", "naïve", "中文", "ok"]]
    ev, tm, rws = _roundtrip_table(td, rows)
    assert rws == rows
    # latin1 value bytes really are latin-1 on the wire (1 byte per char)
    assert "café".encode("latin-1") in ev
