"""Property-based tests (hypothesis) for the pure-logic components: TSO
codec laws, wildcard translation, registry invariants."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from polardbx_cdc_spark.meta import SchemaRegistry
from polardbx_cdc_spark.operators.filters import _mysql_wildcard_to_regex
from polardbx_cdc_spark.types import spark_type_for

import re

micros = st.integers(min_value=0, max_value=10**19 - 1)
txns = st.integers(min_value=0, max_value=10**19 - 1)
seqs = st.integers(min_value=0, max_value=10**10 - 1)


@given(micros, txns, seqs, micros, txns, seqs)
@settings(max_examples=300, deadline=None)
def test_tso_string_order_equals_tuple_order(m1, t1, s1, m2, t2, s2):
    """Lexicographic order of the 48-char key == numeric order of the
    (physical, txn, seq) tuple — the property the whole engine sorts on."""
    k1 = f"{m1:019d}{t1:019d}{s1:010d}"
    k2 = f"{m2:019d}{t2:019d}{s2:010d}"
    assert (k1 < k2) == ((m1, t1, s1) < (m2, t2, s2))
    assert len(k1) == 48


@given(st.text(alphabet="abc_%.x[](){}$^|*+?\\", max_size=12), st.text(alphabet="abc_x.", max_size=12))
@settings(max_examples=300, deadline=None)
def test_wildcard_regex_safe_and_correct(pattern, candidate):
    """MySQL wildcard → regex translation never throws, and matches the
    reference semantics computed independently (% = any run, _ = one char,
    everything else literal)."""
    rx = _mysql_wildcard_to_regex(pattern)
    got = re.fullmatch(rx[1:-1], candidate) is not None  # strip ^$

    def wild_match(p: str, s: str) -> bool:
        # classic two-pointer wildcard matcher (independent oracle)
        dp = [[False] * (len(s) + 1) for _ in range(len(p) + 1)]
        dp[0][0] = True
        for i in range(1, len(p) + 1):
            if p[i - 1] == "%":
                dp[i][0] = dp[i - 1][0]
        for i in range(1, len(p) + 1):
            for j in range(1, len(s) + 1):
                if p[i - 1] == "%":
                    dp[i][j] = dp[i - 1][j] or dp[i][j - 1]
                elif p[i - 1] == "_":
                    dp[i][j] = dp[i - 1][j - 1]
                else:
                    dp[i][j] = dp[i - 1][j - 1] and p[i - 1] == s[j - 1]
        return dp[len(p)][len(s)]

    assert got == wild_match(pattern, candidate), (pattern, candidate, rx)


_ddl_ops = st.lists(
    st.sampled_from(["add", "rename", "drop_add"]), min_size=0, max_size=8
)


@given(_ddl_ops)
@settings(max_examples=100, deadline=None)
def test_registry_find_is_version_at_or_before(ops):
    """find(tso) always returns the schema created by the last apply ≤ tso,
    and rollback(t) makes history identical to never applying after t."""
    reg = SchemaRegistry()
    reg.apply(f"{0:048d}", "d", "t", {"op": "create", "columns": ["c0"]})
    cols_at = {0: ("c0",)}
    cols = ["c0"]
    for i, op in enumerate(ops, start=1):
        tso = f"{i * 10:048d}"
        if op == "add":
            cols.append(f"c{i}")
            reg.apply(tso, "d", "t", {"op": "add_column", "column": f"c{i}"})
        elif op == "rename":
            old = cols[-1]
            cols[-1] = old + "r"
            reg.apply(tso, "d", "t", {"op": "rename_column", "from": old, "to": cols[-1]})
        else:
            reg.apply(tso, "d", "t", {"op": "add_column", "column": f"x{i}"})
            cols.append(f"x{i}")
        cols_at[i * 10] = tuple(cols)
    # find at every point in time returns the right version
    for t, expected in cols_at.items():
        assert reg.find("d", "t", f"{t + 5:048d}").columns == expected
    # rollback to the midpoint erases later versions
    if len(ops) >= 2:
        mid = (len(ops) // 2) * 10
        reg.rollback(f"{mid:048d}")
        assert reg.find("d", "t", f"{10**6:048d}").columns == cols_at[mid]


def test_type_mapping_total_over_fixture():
    """Every column in the condensed all-types fixture maps (no raises)."""
    from polardbx_cdc_spark.types import ALL_TYPES_COLUMNS

    for _, mysql_t in ALL_TYPES_COLUMNS.items():
        spark_type_for(mysql_t)


_ident_st = st.from_regex(r"[a-z][a-z0-9_]{0,10}", fullmatch=True)
_type_st = st.sampled_from(
    ["BIGINT", "INT UNSIGNED", "VARCHAR(32)", "DECIMAL(12,2)", "DOUBLE",
     "DATETIME(3)", "TEXT", "TINYINT(1)", "BIT(64)", "ENUM('a','b')"]
)


@given(
    st.lists(st.tuples(_ident_st, _type_st), min_size=1, max_size=8, unique_by=lambda t: t[0]),
    st.data(),
)
@settings(max_examples=40, deadline=None)
def test_create_sql_render_parse_roundtrip(cols, data):
    """render_create_sql ∘ parse_ddl is the identity on registry schemas:
    columns, types, and pks survive the round trip."""
    from polardbx_cdc_spark.ddl import parse_ddl
    from polardbx_cdc_spark.meta import TableSchema
    from polardbx_cdc_spark.operators.reformat import render_create_sql

    names = [c for c, _ in cols]
    pks = tuple(data.draw(st.sets(st.sampled_from(names), max_size=2)))
    schema = TableSchema(
        tuple(names), pks, (), tuple(t for _, t in cols)
    )
    sql = render_create_sql("d1", "t1", schema)
    (op,) = parse_ddl(sql)
    assert op["op"] == "create" and op["db"] == "d1" and op["tbl"] == "t1"
    assert op["columns"] == names
    # type declarations are case-preserved except enum labels stay quoted
    assert [t.lower() for t in op["types"]] == [t.lower() for _, t in cols]
    assert sorted(op["pks"]) == sorted(pks)


def test_connected_components_edge_cases(spark):
    from polardbx_cdc_spark.functions.dedupe import connected_components

    # empty pair set → empty labels
    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(empty).count() == 0

    # chain 1-2-3 + isolated pair 7-8 → two components with min labels
    pairs = spark.createDataFrame([(1, 2), (2, 3), (7, 8)], "id_a long, id_b long")
    got = {r["id"]: r["cluster_id"] for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7}


def test_align_stream_start_single_source_keeps_all(spark):
    from polardbx_cdc_spark.operators.merge import align_stream_start

    df = spark.createDataFrame(
        [("a", "t1"), ("a", "t2"), ("a", "t3")], "source_id string, tso string"
    )
    assert align_stream_start(df).count() == 3


# ---------------------------------------------------------------------------
# RPL admin command grammar (replica_admin.py)
# ---------------------------------------------------------------------------

_chan_names = st.text(alphabet="abcdefgh0123456789_-.", min_size=1, max_size=12)
_hosts = st.text(alphabet="abcdefghij0123456789.-", min_size=1, max_size=20)
_tsos = st.integers(min_value=0, max_value=10**18).map(lambda i: str(i).zfill(48))


@given(_chan_names, _hosts, st.integers(min_value=1, max_value=65535), _tsos)
@settings(max_examples=200, deadline=None)
def test_change_master_round_trips_through_show(chan, host, port, tso):
    from polardbx_cdc_spark.replica_admin import ReplicaAdmin

    a = ReplicaAdmin()
    a.execute(f"CHANGE MASTER TO MASTER_HOST='{host}', MASTER_PORT={port} FOR CHANNEL '{chan}'")
    a.execute(f"CHANGE MASTER TO MASTER_TSO='{tso}' FOR CHANNEL '{chan}'")
    (row,) = a.execute(f"SHOW SLAVE STATUS FOR CHANNEL '{chan}'")
    assert row[0] == chan and row[2] == host and row[3] == port and row[4] == tso
    # start -> change refused -> stop -> reset all removes the channel
    a.execute(f"START SLAVE FOR CHANNEL '{chan}'")
    try:
        a.execute(f"CHANGE MASTER TO MASTER_TSO='{tso}' FOR CHANNEL '{chan}'")
        raise AssertionError("running-slave guard did not fire")
    except ValueError:
        pass
    a.execute(f"STOP SLAVE FOR CHANNEL '{chan}'")
    a.execute(f"RESET SLAVE ALL FOR CHANNEL '{chan}'")
    assert a.execute(f"SHOW SLAVE STATUS FOR CHANNEL '{chan}'") == []


@given(st.lists(st.sampled_from(["db0", "db1", "d_x", "a9"]), min_size=1, max_size=4, unique=True))
@settings(max_examples=100, deadline=None)
def test_replication_filter_do_db_list_round_trip(dbs):
    from polardbx_cdc_spark.replica_admin import ReplicaAdmin

    a = ReplicaAdmin()
    a.execute(f"CHANGE REPLICATION FILTER REPLICATE_DO_DB=({','.join(dbs)}) FOR CHANNEL 'c'")
    assert a.channels["c"].filter.do_dbs == dbs


# ---------------------------------------------------------------------------
# incremental checksum: XOR-telescoping algebra (pure model) + Spark bridge
# ---------------------------------------------------------------------------

def _h_img(pk: str, img: str | None) -> int:
    import hashlib

    if img is None:
        return 0
    return int(hashlib.md5(f"{pk},{img}".encode()).hexdigest()[:8], 16)


_actions = st.lists(
    st.tuples(st.sampled_from(["INSERT", "UPDATE", "DELETE"]), st.integers(0, 999)),
    min_size=1,
    max_size=8,
)


@given(st.dictionaries(st.integers(0, 200).map(str), _actions, min_size=1, max_size=20))
@settings(max_examples=200, deadline=None)
def test_incremental_checksum_telescoping_algebra(histories):
    """For ANY per-pk action history, folding h(before)⊕h(after) over the
    events (before := previous event's after, h(None)=0) equals the hash
    of the final live image — per chunk, independent of action semantics."""
    folded: dict[int, int] = {}
    final: dict[int, int] = {}
    for pk, evs in histories.items():
        chunk = int(pk) // 64
        prev: str | None = None
        for action, v in evs:
            after = None if action == "DELETE" else f"{float(v):.6f}"
            folded[chunk] = folded.get(chunk, 0) ^ _h_img(pk, prev) ^ _h_img(pk, after)
            prev = after
        if prev is not None:
            final[chunk] = final.get(chunk, 0) ^ _h_img(pk, prev)
    assert {k: v for k, v in folded.items() if v} == {k: v for k, v in final.items() if v}


def test_incremental_checksum_spark_matches_python_model(spark):
    """Seeded random history through the Spark operator vs the Python
    model: identical per-chunk checksums (the bridge that pins the Spark
    implementation — %.6f imaging, md5-prefix, chunking — to the algebra)."""
    import random

    from polardbx_cdc_spark.operators import validation

    rng = random.Random(42)
    rows, model_fold, model_live = [], {}, {}
    i = 0
    for pk in (str(p) for p in rng.sample(range(300), 40)):
        prev = None
        chunk = int(pk) // 64
        for action, v in [
            (rng.choice(["INSERT", "UPDATE", "DELETE"]), rng.randint(0, 999))
            for _ in range(rng.randint(1, 6))
        ]:
            rows.append((pk, f"{i:019d}", action, float(v)))
            i += 1
            after = None if action == "DELETE" else f"{float(v):.6f}"
            model_fold[chunk] = model_fold.get(chunk, 0) ^ _h_img(pk, prev) ^ _h_img(pk, after)
            prev = after
        if prev is not None:
            model_live[chunk] = model_live.get(chunk, 0) ^ 0  # marker: chunk has a live row

    cdc = spark.createDataFrame(rows, "pk string, tso string, action string, value double")
    got = {r["chunk_id"]: r for r in validation.incremental_checksum(cdc, 64).collect()}
    for chunk, want in model_fold.items():
        assert got[chunk]["inc_checksum"] == want
        assert got[chunk]["direct_checksum"] == want
