"""PARTIAL_UPDATE_ROWS_EVENT (type 39) — partial JSON diff vectors.

Round-8 closure of the last enumerated event type neither side decoded
(reference enum BinlogEventType.java:39; wire format rows_event.h
value_options/partial_columns + json_diff.h read_binary)."""

from __future__ import annotations

import pytest

from polardbx_cdc_spark import binlog_wire as W

TD = W.TableDef(
    "d", "t",
    [(W.TYPE_LONGLONG, None), (W.TYPE_JSON, 4), (W.TYPE_VARCHAR, 32)],
)


def _roundtrip(rows, **kw):
    ev = W.encode_table_map(5, TD) + W.encode_rows_event(
        W.PARTIAL_UPDATE_ROWS_EVENT, 5, TD, rows, **kw
    )
    out = W.decode_events(W.encode_fde() + ev)
    return [e for e in out if e["type"] == W.PARTIAL_UPDATE_ROWS_EVENT][0]


def test_diff_vector_survives_the_wire():
    before = [1, {"a": 1, "b": [1, 2, 3]}, "x"]
    diffs = W.JsonDiffVector([
        W.JsonDiff(W.JSON_DIFF_REPLACE, "$.a", {"deep": [True, None]}),
        W.JsonDiff(W.JSON_DIFF_INSERT, "$.b[0]", -7),
        W.JsonDiff(W.JSON_DIFF_REMOVE, "$.b[2]"),
    ])
    ev = _roundtrip([(before, [1, diffs, "y"])])
    b, a = ev["rows"][0]
    assert b == before
    assert isinstance(a[1], W.JsonDiffVector) and a[1] == diffs
    assert a[2] == "y"


def test_mixed_partial_and_full_rows_in_one_event():
    """Per-row value_options: a full-document after-image (options=0)
    and a diff-vector one (options=1) coexist in the same event."""
    d1 = W.JsonDiffVector([W.JsonDiff(W.JSON_DIFF_REPLACE, "$", 42)])
    rows = [
        ([1, {"k": 1}, "a"], [1, {"k": 2}, "a"]),       # full after-image
        ([2, {"k": 1}, "b"], [2, d1, "b"]),             # partial
    ]
    ev = _roundtrip(rows)
    (b0, a0), (b1, a1) = ev["rows"]
    assert a0[1] == {"k": 2} and not isinstance(a0[1], W.JsonDiffVector)
    assert a1[1] == d1


def test_partial_json_composes_with_minimal_after_image():
    """binlog_row_image=MINIMAL composes with PARTIAL_JSON: the after
    image omits unchanged columns AND the JSON column rides as diffs —
    partial_bits covers the JSON columns PRESENT in the after image."""
    diffs = W.JsonDiffVector([W.JsonDiff(W.JSON_DIFF_INSERT, "$.n", 5)])
    ev = _roundtrip(
        [([7, None, None], [None, diffs, None])],
        present=[True, False, False],          # before: pk only
        present_after=[False, True, False],    # after: JSON col only
    )
    b, a = ev["rows"][0]
    assert b == [7, None, None]
    assert a == [None, diffs, None]
    assert ev["present_columns"] == [0]
    assert ev["present_columns_after"] == [1]


def test_apply_json_diffs_semantics():
    doc = {"a": {"b": [10, 20]}, "keep": 1}
    out = W.apply_json_diffs(doc, [
        W.JsonDiff(W.JSON_DIFF_REPLACE, "$.a.b[1]", 99),
        W.JsonDiff(W.JSON_DIFF_INSERT, "$.a.b[0]", 0),
        W.JsonDiff(W.JSON_DIFF_REMOVE, "$.keep"),
        W.JsonDiff(W.JSON_DIFF_INSERT, '$."spaced key"', "v"),
    ])
    assert out == {"a": {"b": [0, 10, 99]}, "spaced key": "v"}
    assert doc == {"a": {"b": [10, 20]}, "keep": 1}  # input not mutated
    # root replace
    assert W.apply_json_diffs({"x": 1},
                              [W.JsonDiff(W.JSON_DIFF_REPLACE, "$", [1])]) == [1]
    # REPLACE of a missing member is an error (server refuses too)
    with pytest.raises(ValueError, match="REPLACE path missing"):
        W.apply_json_diffs({}, [W.JsonDiff(W.JSON_DIFF_REPLACE, "$.nope", 1)])


def test_json_path_parser_rejects_garbage():
    for bad in ("a.b", "$..x", "$.", "$[x]", '$."unterminated'):
        with pytest.raises(ValueError):
            W._parse_json_path(bad)


def test_named_attach_materializes_partial_json():
    td = W.TableDef(
        "d", "t", [(W.TYPE_LONGLONG, None), (W.TYPE_JSON, 4)],
        col_names=["id", "doc"], pk=[0],
    )
    before = [3, {"s": "old", "drop": True}]
    diffs = W.JsonDiffVector([
        W.JsonDiff(W.JSON_DIFF_REPLACE, "$.s", "new"),
        W.JsonDiff(W.JSON_DIFF_REMOVE, "$.drop"),
    ])
    evn = W.encode_table_map(6, td) + W.encode_rows_event(
        W.PARTIAL_UPDATE_ROWS_EVENT, 6, td, [(before, [3, diffs])]
    )
    named = W.decode_named_rows(W.encode_fde() + evn)
    assert named[0]["action"] == "UPDATE"
    assert named[0]["values"]["doc"] == {"s": "new"}
    assert named[0]["pk"] == {"id": 3}


def test_type39_rides_inside_transaction_payload():
    """Composability: a partial-JSON update compressed inside a
    TRANSACTION_PAYLOAD expands through the standard consumer path."""
    diffs = W.JsonDiffVector([W.JsonDiff(W.JSON_DIFF_REPLACE, "$.v", 2)])
    inner = (
        W.encode_table_map(5, TD)
        + W.encode_rows_event(
            W.PARTIAL_UPDATE_ROWS_EVENT, 5, TD,
            [([1, {"v": 1}, "x"], [1, diffs, "x"])],
        )
        + W.encode_xid(11)
    )
    payload = W.encode_transaction_payload(
        inner, compression=W.COMPRESS_ZSTD
    )
    flat = W.expand_payload_events(W.decode_events(payload))
    rows_ev = [e for e in flat if e["type"] == W.PARTIAL_UPDATE_ROWS_EVENT][0]
    assert rows_ev["rows"][0][1][1] == diffs


def test_diff_decode_rejects_malformed():
    with pytest.raises(ValueError, match="unknown JSON diff"):
        W.decode_json_diffs(b"\x09\x01$")
    good = W.encode_json_diffs(
        [W.JsonDiff(W.JSON_DIFF_REPLACE, "$.a", "xyz")]
    )
    with pytest.raises(ValueError):
        W.decode_json_diffs(good[:-2])  # truncated value


# -- server-side diff computation (round-8 extension) -------------------------

def _json_values(depth=3):
    from hypothesis import strategies as st

    scal = st.one_of(
        st.none(), st.booleans(), st.integers(-2**40, 2**40),
        st.floats(allow_nan=False, allow_infinity=False, width=32),
        st.text(max_size=8),
    )
    return st.recursive(
        scal,
        lambda ch: st.one_of(
            st.lists(ch, max_size=5),
            st.dictionaries(st.text(max_size=6), ch, max_size=5),
        ),
        max_leaves=12,
    )


def test_compute_apply_roundtrip_property():
    """Law: apply(before, compute(before, after)) == after whenever a
    diff vector is returned (None = server logs the full value)."""
    from hypothesis import given, settings

    @given(_json_values(), _json_values())
    @settings(max_examples=250, deadline=None)
    def check(before, after):
        diffs = W.compute_json_diffs(before, after)
        if diffs is None:
            return  # whole-value replace: full-format logging path
        got = W.apply_json_diffs(before, diffs)
        assert got == after, (before, after, diffs)
        # Python == conflates bool/int/float — the BINARY serialization
        # is the true wire-level equality (round-8 review)
        assert W.json_serialize(got) == W.json_serialize(after), (
            before, after, diffs
        )

    check()


def test_compute_json_diffs_is_minimal_on_member_changes():
    before = {"a": 1, "b": [1, 2, 3], "drop": True, "keep": "x"}
    after = {"a": 2, "b": [1, 9, 3], "new": None, "keep": "x"}
    diffs = W.compute_json_diffs(before, after)
    ops = {(d.op, d.path) for d in diffs}
    assert ops == {
        (W.JSON_DIFF_REPLACE, "$.a"),
        (W.JSON_DIFF_REPLACE, "$.b[1]"),
        (W.JSON_DIFF_REMOVE, "$.drop"),
        (W.JSON_DIFF_INSERT, "$.new"),
    }
    # untouched members generate NO diffs
    assert not any("keep" in d.path for d in diffs)


def test_compute_json_diffs_array_splice():
    # middle insert and removal splice against common prefix/suffix
    assert W.apply_json_diffs(
        [1, 2, 3, 4], W.compute_json_diffs([1, 2, 3, 4], [1, 9, 9, 9, 4])
    ) == [1, 9, 9, 9, 4]
    assert W.apply_json_diffs(
        [1, 2, 3, 4, 5], W.compute_json_diffs([1, 2, 3, 4, 5], [1, 5])
    ) == [1, 5]


def test_computed_diffs_travel_the_wire_as_type39():
    """End-to-end symmetry: compute → encode type 39 → decode → apply."""
    td = W.TableDef("d", "t", [(W.TYPE_LONGLONG, None), (W.TYPE_JSON, 4)])
    before = {"user": {"name": "a b", "tags": ["x", "y"]}, "v": 1}
    after = {"user": {"name": "a b", "tags": ["x", "z", "y"]}, "v": 2}
    diffs = W.compute_json_diffs(before, after)
    assert diffs is not None and len(diffs) >= 2
    ev = W.encode_table_map(5, td) + W.encode_rows_event(
        W.PARTIAL_UPDATE_ROWS_EVENT, 5, td, [([1, before], [1, diffs])]
    )
    out = W.decode_events(W.encode_fde() + ev)
    b, a = [e for e in out if e["type"] == W.PARTIAL_UPDATE_ROWS_EVENT][0]["rows"][0]
    assert W.apply_json_diffs(b[1], a[1]) == after


def test_quoted_member_paths_roundtrip():
    before = {"weird key": 1, 'q"uote': {"x\\y": [1]}}
    after = {"weird key": 2, 'q"uote': {"x\\y": [1, 2]}}
    diffs = W.compute_json_diffs(before, after)
    assert W.apply_json_diffs(before, diffs) == after


def test_compute_diffs_distinguishes_bool_int_float():
    """Round-8 review: MySQL JSON distinguishes true/1, false/0, 1/1.0
    (different binary serializations) — Python == conflates them, so the
    diff computation must use JSON-semantics equality."""
    d = W.compute_json_diffs({"x": 1}, {"x": True})
    assert d == W.JsonDiffVector(
        [W.JsonDiff(W.JSON_DIFF_REPLACE, "$.x", True)]
    )
    assert W.apply_json_diffs({"x": 1}, d) == {"x": True}
    assert W.compute_json_diffs({"x": 0}, {"x": False}) != W.JsonDiffVector()
    # int→float inside an array replaces the element
    d2 = W.compute_json_diffs([1], [1.0])
    assert W.apply_json_diffs([1], d2) == [1.0] and isinstance(
        W.apply_json_diffs([1], d2)[0], float
    )
    # whole-scalar type change → None (full-value logging path)
    assert W.compute_json_diffs(1.0, 1) is None
    # serialized twins really differ on the wire
    assert W.json_serialize(1) != W.json_serialize(True)


def test_json_table_delta_materializes_back(spark):
    """The changefeed is sufficient: applying each UPDATE's ops to the
    before-doc reproduces the after-doc; unchanged docs emit nothing."""
    import json

    from polardbx_cdc_spark.operators import apply as apply_ops

    before = spark.createDataFrame(
        [(1, '{"a": 1, "b": [1, 2]}'),
         (2, '{"same": true}'),
         (3, '{"gone": 1}')],
        "k long, doc string",
    )
    after = spark.createDataFrame(
        [(1, '{"a": 2, "b": [1, 2, 3]}'),
         (2, '{"same": true}'),
         (4, '{"new": 1}')],
        "k long, doc string",
    )
    rows = {r["key"]: r for r in
            apply_ops.json_table_delta(before, after, "k", "doc").collect()}
    assert set(rows) == {1, 3, 4}  # key 2 unchanged → suppressed
    assert rows[3]["action"] == "DELETE"
    assert rows[4]["action"] == "INSERT"
    assert json.loads(rows[4]["ops"]) == {"new": 1}
    upd = rows[1]
    assert upd["action"] == "UPDATE" and upd["n_ops"] == 2
    diffs = W.JsonDiffVector([
        W.JsonDiff(d["op"], d["path"], d.get("value"))
        for d in json.loads(upd["ops"])
    ])
    assert W.apply_json_diffs({"a": 1, "b": [1, 2]}, diffs) == {
        "a": 2, "b": [1, 2, 3]
    }


def test_replace_out_of_range_array_index_raises_valueerror():
    """ADVICE r8: REPLACE on an out-of-range array element must raise the
    documented ValueError, not IndexError — malformed external diff
    vectors take the handled-error path."""
    doc = {"a": [1, 2, 3]}
    bad = W.JsonDiff(W.JSON_DIFF_REPLACE, "$.a[9]", 99)
    with pytest.raises(ValueError):
        W.apply_json_diffs(doc, [bad])
    neg = W.JsonDiff(W.JSON_DIFF_REPLACE, "$.a[2]", 99)
    assert W.apply_json_diffs(doc, [neg]) == {"a": [1, 2, 99]}


def test_compute_diffs_distinguishes_signed_zero():
    """-0.0 and 0.0 are Python-equal but serialize to different
    JSON_DOUBLE bytes (sign bit) — compute must emit a REPLACE, and the
    law apply∘compute == identity holds at the byte level (hypothesis
    find, round 9)."""
    before, after = {"v": 0.0}, {"v": -0.0}
    diffs = W.compute_json_diffs(before, after)
    assert diffs is not None and len(diffs) == 1
    got = W.apply_json_diffs(before, diffs)
    assert W.json_serialize(got) == W.json_serialize(after)
    assert W.compute_json_diffs(after, dict(after)) == W.JsonDiffVector()
