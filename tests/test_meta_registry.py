"""TableMetaTSDB semantics: apply / find / rollback / snapshot + the
physical→logical rebuild projection."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polardbx_cdc_spark.meta import LogicalTopology, SchemaRegistry, TableSchema, rebuild_events


def _tso(n: int) -> str:
    return str(n).zfill(48)


@pytest.fixture()
def registry() -> SchemaRegistry:
    r = SchemaRegistry()
    r.apply(_tso(10), "app", "orders", {"op": "create", "columns": ["id", "amount", "_drds_pk"], "pks": ["id"], "hidden_pks": ["_drds_pk"]})
    r.apply(_tso(20), "app", "orders", {"op": "add_column", "column": "status"})
    r.apply(_tso(30), "app", "orders", {"op": "rename_column", "from": "amount", "to": "total"})
    return r


def test_find_time_travel(registry):
    assert registry.find("app", "orders", _tso(9)) is None
    assert registry.find("app", "orders", _tso(10)).columns == ("id", "amount", "_drds_pk")
    assert registry.find("app", "orders", _tso(25)).columns == ("id", "amount", "_drds_pk", "status")
    assert registry.find("app", "orders", _tso(99)).columns == ("id", "total", "_drds_pk", "status")


def test_rollback(registry):
    registry.rollback(_tso(20))
    assert registry.find("app", "orders", _tso(99)).columns == ("id", "amount", "_drds_pk", "status")
    registry.rollback(_tso(5))
    assert registry.find("app", "orders", _tso(99)) is None


def test_ddl_barrier_ordering(registry):
    with pytest.raises(ValueError):
        registry.apply(_tso(30), "app", "orders", {"op": "add_column", "column": "x"})
    with pytest.raises(ValueError):
        registry.apply(_tso(25), "app", "orders", {"op": "add_column", "column": "x"})


def test_drop_and_snapshot(registry):
    registry.apply(_tso(40), "app", "tmp", {"op": "create", "columns": ["a"]})
    registry.apply(_tso(50), "app", "tmp", {"op": "drop"})
    snap = registry.snapshot()
    assert ("app", "tmp") not in snap
    assert ("app", "orders") in snap
    snap45 = registry.snapshot(_tso(45))
    assert ("app", "tmp") in snap45


def test_rebuild_projection(spark, registry):
    topo = LogicalTopology()
    topo.add_shards("app", "orders", ["phy0.orders_00", "phy0.orders_01", "phy1.orders_02"])
    rows = [
        ("phy0", "orders_00", {"id": "1", "amount": "5", "_drds_pk": "x1", "status": "OK"}),
        ("phy1", "orders_02", {"id": "2", "amount": "7", "_drds_pk": "x2", "status": "NO"}),
        ("other", "t", {"id": "3", "junk": "z"}),
    ]
    df = spark.createDataFrame(rows, "db string, tbl string, after map<string,string>")
    out = rebuild_events(df, topo, registry, at_tso=_tso(25)).collect()
    by_pk = {r["after"]["id"]: r for r in out}
    assert by_pk["1"]["logical_db"] == "app" and by_pk["1"]["logical_tbl"] == "orders"
    # hidden PK dropped, registry columns kept (schema at tso 25 has amount+status)
    assert set(by_pk["1"]["after"].keys()) == {"id", "amount", "status"}
    # non-topology table untouched
    assert by_pk["3"]["logical_db"] == "other" and set(by_pk["3"]["after"]) == {"id", "junk"}


# -- DDL-text path (QueryEventReformator/DDLConverter parity) ---------------


def test_apply_sql_create_alter_chain():
    r = SchemaRegistry()
    r.apply_sql(_tso(10), "CREATE TABLE `app`.`t` (id BIGINT PRIMARY KEY, a VARCHAR(10), _drds_implicit_id_ BIGINT)")
    s = r.find("app", "t", _tso(15))
    assert s.columns == ("id", "a", "_drds_implicit_id_")
    assert s.pks == ("id",) and s.hidden_pks == ("_drds_implicit_id_",)
    assert s.column_types()["a"] == "VARCHAR(10)"

    r.apply_sql(_tso(20), "ALTER TABLE app.t ADD COLUMN b INT UNSIGNED, DROP COLUMN a")
    s = r.find("app", "t", _tso(25))
    assert s.columns == ("id", "_drds_implicit_id_", "b")
    assert s.column_types()["b"] == "INT UNSIGNED"

    r.apply_sql(_tso(30), "ALTER TABLE app.t CHANGE COLUMN b c BIGINT")
    assert r.find("app", "t", _tso(35)).columns == ("id", "_drds_implicit_id_", "c")
    # time travel still sees the old shape
    assert r.find("app", "t", _tso(15)).columns == ("id", "a", "_drds_implicit_id_")


def test_apply_sql_rename_and_drop_table():
    r = SchemaRegistry()
    r.apply_sql(_tso(10), "CREATE TABLE a.x (id BIGINT PRIMARY KEY)")
    r.apply_sql(_tso(20), "RENAME TABLE a.x TO a.y")
    assert r.find("a", "x", _tso(25)) is None
    assert r.find("a", "y", _tso(25)).columns == ("id",)
    r.apply_sql(_tso(30), "DROP TABLE IF EXISTS a.y")
    assert r.find("a", "y", _tso(35)) is None


def test_apply_sql_rejects_unknown_ddl():
    r = SchemaRegistry()
    with pytest.raises(ValueError, match="unsupported DDL"):
        r.apply_sql(_tso(10), "GRANT ALL ON *.* TO admin")


_INDEX_DDL_ACTIONS = [
    "ADD INDEX idx_a (a)",
    "ADD KEY k_a (a)",
    "ADD UNIQUE KEY uk_a (a)",
    "ADD UNIQUE INDEX ui_a (a)",
    "ADD UNIQUE (a)",
    "ADD FULLTEXT INDEX ft_a (a)",
    "ADD FULLTEXT KEY ft_a (a)",
    "ADD SPATIAL INDEX sp_a (a)",
    "ADD CONSTRAINT fk_x FOREIGN KEY (a) REFERENCES o (id)",
    "ADD FOREIGN KEY (a) REFERENCES o (id)",
    "ADD CONSTRAINT chk CHECK (a > 0)",
    "ADD GLOBAL INDEX gidx (a) COVERING (id)",
    "ADD CLUSTERED INDEX cidx (a)",
    "ADD LOCAL INDEX lidx (a)",
    "ADD UNIQUE GLOBAL INDEX ugidx (a)",
    "DROP INDEX idx_a",
    "DROP KEY k_a",
    "DROP FOREIGN KEY fk_x",
    "DROP CONSTRAINT chk",
    "RENAME INDEX idx_a TO idx_b",
    "ALTER INDEX idx_a INVISIBLE",
    "ALGORITHM=INPLACE",
    "LOCK=NONE",
    "ENGINE=InnoDB",
    "AUTO_INCREMENT=100",
    "COMMENT='resharded'",
    "CONVERT TO CHARACTER SET utf8mb4",
    "DEFAULT CHARACTER SET utf8mb4",
    "ALTER COLUMN a SET DEFAULT 0",
    "ALTER COLUMN a DROP DEFAULT",
    "DISABLE KEYS",
    "FORCE",
]


@pytest.mark.parametrize("action", _INDEX_DDL_ACTIONS)
def test_index_ddl_is_registry_noop(action):
    """Index/constraint/table-option DDL must NOT change the visible column
    set (reference CINDEX/DINDEX, DBMSAction.java:23-27) — round-2 verdict
    found ``ADD INDEX idx (v)`` injecting a phantom column named 'index'."""
    r = SchemaRegistry()
    r.apply_sql(_tso(10), "CREATE TABLE d.t (id BIGINT PRIMARY KEY, a INT)")
    before = r.find("d", "t", _tso(15))
    r.apply_sql(_tso(20), f"ALTER TABLE d.t {action}")
    after = r.find("d", "t", _tso(25))
    assert after.columns == before.columns == ("id", "a")
    assert after.pks == before.pks


def test_mixed_alter_column_and_index():
    """One ALTER mixing a real column change with index DDL applies only
    the column change."""
    r = SchemaRegistry()
    r.apply_sql(_tso(10), "CREATE TABLE d.t (id BIGINT PRIMARY KEY, a INT)")
    r.apply_sql(
        _tso(20),
        "ALTER TABLE d.t ADD COLUMN b VARCHAR(10), ADD INDEX idx_b (b), "
        "DROP INDEX idx_old, ALGORITHM=INPLACE",
    )
    s = r.find("d", "t", _tso(25))
    assert s.columns == ("id", "a", "b")
    assert s.column_types()["b"] == "VARCHAR(10)"


def test_add_column_named_like_keyword_still_works():
    """Columns whose names merely START with 'index'/'key' must still parse
    as column DDL — the guard matches the keyword, not the prefix."""
    r = SchemaRegistry()
    r.apply_sql(_tso(10), "CREATE TABLE d.t (id BIGINT PRIMARY KEY)")
    r.apply_sql(_tso(20), "ALTER TABLE d.t ADD COLUMN index_name VARCHAR(10)")
    r.apply_sql(_tso(30), "ALTER TABLE d.t ADD keyring INT")
    assert r.find("d", "t", _tso(35)).columns == ("id", "index_name", "keyring")


def test_versioned_rebuild_per_event_schema(spark):
    """Events before/after a mid-stream DROP COLUMN see different visible
    column sets — per-event resolution, not a single snapshot."""
    from polardbx_cdc_spark.meta import rebuild_events_versioned

    rows = [
        (_tso(15), "app", "t", {"id": "1", "a": "x", "b": "y"}),
        (_tso(25), "app", "t", {"id": "2", "a": "x", "b": "y"}),
        (_tso(35), "app", "t", {"id": "3", "a": "x", "b": "y"}),
    ]
    df = spark.createDataFrame(rows, "tso string, db string, tbl string, after map<string,string>")
    r = SchemaRegistry()
    r.apply_sql(_tso(10), "CREATE TABLE app.t (id BIGINT PRIMARY KEY, a TEXT, b TEXT)")
    r.apply_sql(_tso(20), "ALTER TABLE app.t DROP COLUMN a")
    r.apply_sql(_tso(30), "ALTER TABLE app.t ADD COLUMN a TEXT")
    got = {
        r_["tso"]: sorted(r_["after"].keys())
        for r_ in rebuild_events_versioned(df, r).collect()
    }
    assert got[_tso(15)] == ["a", "b", "id"]
    assert got[_tso(25)] == ["b", "id"]
    assert got[_tso(35)] == ["a", "b", "id"]


def test_registry_save_load_round_trip_and_resume(tmp_path):
    """Durable meta store (TableMetaTSDB persistence): save → load
    reproduces the registry bit-for-bit (version intervals, snapshots,
    per-TSO finds), and a loaded registry keeps accepting DDL from the
    saved high-water mark — restart without binlog replay."""
    from polardbx_cdc_spark.meta import SchemaRegistry

    reg = SchemaRegistry()
    reg.apply_sql("0" * 19 + "0" * 29, "CREATE DATABASE app")
    reg.apply_sql(f"{1:019d}" + "0" * 29, "CREATE TABLE app.t1 (id BIGINT PRIMARY KEY, v DOUBLE)")
    reg.apply_sql(f"{2:019d}" + "0" * 29, "ALTER TABLE app.t1 ADD COLUMN note VARCHAR(64)")
    reg.apply_sql(f"{3:019d}" + "0" * 29, "CREATE TABLE app.t2 (pk INT, x DECIMAL(10,2))")
    reg.apply_sql(f"{4:019d}" + "0" * 29, "ALTER TABLE app.t1 DROP COLUMN v")

    path = str(tmp_path / "meta.json")
    reg.save(path)
    back = SchemaRegistry.load(path)

    assert back.version_intervals() == reg.version_intervals()
    assert back.databases() == reg.databases()
    assert back.high_water() == reg.high_water() == f"{4:019d}" + "0" * 29
    for t in range(1, 5):
        tso = f"{t:019d}" + "9" * 29
        assert back.find("app", "t1", tso) == reg.find("app", "t1", tso)
    assert back.snapshot() == reg.snapshot()

    # resume applying on the loaded registry
    back.apply_sql(f"{5:019d}" + "0" * 29, "ALTER TABLE app.t2 ADD COLUMN y INT")
    assert back.find("app", "t2", f"{5:019d}" + "9" * 29).columns == ("pk", "x", "y")
    # original untouched
    assert reg.find("app", "t2", f"{5:019d}" + "9" * 29).columns == ("pk", "x")


def test_add_drop_primary_key_tracks_key_metadata():
    """ALTER … ADD/DROP PRIMARY KEY updates the registry's pk set
    (MemoryTableMeta digests them — they were registry NO-OPS until
    round 13) while the column set, types and origins survive; prefix
    key parts strip to bare columns; a dropped pk time-travels back."""
    r = SchemaRegistry()
    r.apply_sql(_tso(10), "CREATE TABLE d.t (id BIGINT, a VARCHAR(32))")
    assert r.find("d", "t", _tso(15)).pks == ()
    r.apply_sql(_tso(20), "ALTER TABLE d.t ADD PRIMARY KEY (id, a(8))")
    s = r.find("d", "t", _tso(25))
    assert s.pks == ("id", "a")
    assert s.columns == ("id", "a")
    r.apply_sql(_tso(30), "ALTER TABLE d.t DROP PRIMARY KEY")
    assert r.find("d", "t", _tso(35)).pks == ()
    # time travel: the pk exists between its ADD and DROP
    assert r.find("d", "t", _tso(25)).pks == ("id", "a")
    # unknown column raises (strict, like the server)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="unknown columns"):
        r.apply_sql(_tso(40), "ALTER TABLE d.t ADD PRIMARY KEY (zz)")


def test_drop_then_add_pk_in_one_composed_alter():
    r = SchemaRegistry()
    r.apply_sql(_tso(10), "CREATE TABLE d.t (id BIGINT PRIMARY KEY, b INT)")
    r.apply_sql(
        _tso(20),
        "ALTER TABLE d.t DROP PRIMARY KEY, ADD PRIMARY KEY (b) USING BTREE",
    )
    assert r.find("d", "t", _tso(25)).pks == ("b",)


def test_pk_prefixes_survive_registry_lifecycle(tmp_path):
    """Prefix lengths from CREATE / ADD PRIMARY KEY key parts live in
    TableSchema.pk_prefixes, survive save/load and rename, clear on
    DROP PRIMARY KEY, and render back into the CREATE SQL (the SHOW
    CREATE TABLE round trip keeps `name(10)`)."""
    from polardbx_cdc_spark.meta import SchemaRegistry
    from polardbx_cdc_spark.operators.reformat import render_create_sql

    r = SchemaRegistry()
    r.apply_sql(
        _tso(10),
        "CREATE TABLE d.t (id BIGINT, name VARCHAR(64), "
        "PRIMARY KEY (id, name(10)))",
    )
    s = r.find("d", "t", _tso(15))
    assert s.pks == ("id", "name")
    assert s.pk_prefixes == (("name", 10),)
    sql = render_create_sql("d", "t", s)
    assert "PRIMARY KEY (`id`, `name`(10))" in sql
    # ... and the rendered SQL parses back to the same key metadata
    r2 = SchemaRegistry()
    r2.apply_sql(_tso(10), sql)
    s2 = r2.find("d", "t", _tso(15))
    assert s2.pks == s.pks and s2.pk_prefixes == s.pk_prefixes
    # column DDL preserves prefixes; DROP PRIMARY KEY clears them
    r.apply_sql(_tso(20), "ALTER TABLE d.t ADD COLUMN v INT")
    assert r.find("d", "t", _tso(25)).pk_prefixes == (("name", 10),)
    r.apply_sql(_tso(30), "RENAME TABLE d.t TO d.t2")
    assert r.find("d", "t2", _tso(35)).pk_prefixes == (("name", 10),)
    r.apply_sql(_tso(40), "ALTER TABLE d.t2 DROP PRIMARY KEY")
    assert r.find("d", "t2", _tso(45)).pk_prefixes == ()
    # save/load round trip keeps the history intact
    p = str(tmp_path / "reg.json")
    r.save(p)
    r3 = SchemaRegistry.load(p)
    assert r3.find("d", "t2", _tso(35)).pk_prefixes == (("name", 10),)
    assert r3.find("d", "t2", _tso(45)).pk_prefixes == ()


def test_unique_keys_track_through_registry_and_identify_list():
    """Unique-key metadata (DbMetaManager.getTableUks surface) and the
    applier identity selection (TableInfo.getIdentifyKeyList:52-100):
    pk-less tables identify by ALL columns; otherwise pks + unique-key
    columns; ADD UNIQUE / DROP INDEX / RENAME INDEX maintain the set;
    keys follow column renames and lose dropped columns."""
    from polardbx_cdc_spark.meta import SchemaRegistry

    r = SchemaRegistry()
    r.apply_sql(
        _tso(10),
        "CREATE TABLE d.t (id BIGINT PRIMARY KEY, a INT, b VARCHAR(32), "
        "c INT UNIQUE, UNIQUE KEY uk_ab (a, b(8)))",
    )
    s = r.find("d", "t", _tso(15))
    assert s.uniques == (("c", ("c",)), ("uk_ab", ("a", "b")))
    assert s.identify_key_list() == ("id", "c", "a", "b")
    # ALTER maintenance
    r.apply_sql(_tso(20), "ALTER TABLE d.t ADD UNIQUE INDEX uk_b (b)")
    r.apply_sql(_tso(30), "ALTER TABLE d.t DROP INDEX uk_ab")
    r.apply_sql(_tso(40), "ALTER TABLE d.t RENAME INDEX uk_b TO uk_bb")
    s = r.find("d", "t", _tso(45))
    assert s.uniques == (("c", ("c",)), ("uk_bb", ("b",)))
    # column rename/drop rewrite key definitions
    r.apply_sql(_tso(50), "ALTER TABLE d.t CHANGE COLUMN b b2 VARCHAR(32)")
    assert r.find("d", "t", _tso(55)).uniques == (
        ("c", ("c",)), ("uk_bb", ("b2",)))
    r.apply_sql(_tso(60), "ALTER TABLE d.t DROP COLUMN b2")
    assert r.find("d", "t", _tso(65)).uniques == (("c", ("c",)),)
    # DROP of a NON-unique index stays a no-op version
    r.apply_sql(_tso(70), "ALTER TABLE d.t DROP INDEX some_plain_idx")
    assert r.find("d", "t", _tso(75)).uniques == (("c", ("c",)),)


def test_identify_key_list_pkless_table_and_pk_rename():
    from polardbx_cdc_spark.meta import SchemaRegistry

    r = SchemaRegistry()
    r.apply_sql(_tso(10), "CREATE TABLE d.n (x INT, y INT)")
    assert r.find("d", "n", _tso(15)).identify_key_list() == ("x", "y")
    # pk follows a CHANGE COLUMN rename now (was a dead name before)
    r2 = SchemaRegistry()
    r2.apply_sql(_tso(10), "CREATE TABLE d.p (id BIGINT PRIMARY KEY, v INT)")
    r2.apply_sql(_tso(20), "ALTER TABLE d.p CHANGE COLUMN id id2 BIGINT")
    assert r2.find("d", "p", _tso(25)).pks == ("id2",)


def test_render_create_sql_round_trips_unique_keys():
    from polardbx_cdc_spark.meta import SchemaRegistry
    from polardbx_cdc_spark.operators.reformat import render_create_sql

    r = SchemaRegistry()
    r.apply_sql(
        _tso(10),
        "CREATE TABLE d.t (id BIGINT PRIMARY KEY, a INT, b VARCHAR(16), "
        "UNIQUE KEY uk_ab (a, b))",
    )
    sql = render_create_sql("d", "t", r.find("d", "t", _tso(15)))
    assert "UNIQUE KEY `uk_ab` (`a`, `b`)" in sql
    r2 = SchemaRegistry()
    r2.apply_sql(_tso(10), sql)
    assert r2.find("d", "t", _tso(15)).uniques == (("uk_ab", ("a", "b")),)


@pytest.mark.parametrize("seed", range(6))
def test_unique_key_metadata_random_walk(seed):
    """Key-metadata model fuzz (round-13 uniques tracking): a random
    interleave of ADD UNIQUE / DROP INDEX / RENAME INDEX / column
    ADD-RENAME-DROP must keep the registry's uniques equal to an
    analytic dict model applying the same rewrite rules (keys follow
    renames, lose dropped columns, vanish when empty)."""
    import random

    from polardbx_cdc_spark.meta import SchemaRegistry

    rng = random.Random(400 + seed)
    r = SchemaRegistry()
    cols = [f"c{i}" for i in range(5)]
    r.apply_sql(
        _tso(1),
        "CREATE TABLE f.t (" + ", ".join(f"{c} INT" for c in cols) + ")",
    )
    model: dict[str, tuple[str, ...]] = {}
    order: list[str] = []  # registry keeps insertion order
    next_col, tso = 5, 2
    for _ in range(60):
        roll = rng.random()
        if roll < 0.30 and cols:
            n = rng.randint(1, min(3, len(cols)))
            kcols = rng.sample(cols, n)
            name = f"uk{rng.randint(0, 9)}"
            sql = (f"ALTER TABLE f.t ADD UNIQUE KEY {name} "
                   f"({', '.join(kcols)})")
            if name in model:  # ER_DUP_KEYNAME
                with pytest.raises(ValueError, match="duplicate key"):
                    r.apply_sql(_tso(tso), sql)
            else:
                r.apply_sql(_tso(tso), sql)
                model[name] = tuple(kcols)
                order.append(name)
        elif roll < 0.45:
            name = f"uk{rng.randint(0, 9)}"
            r.apply_sql(_tso(tso), f"ALTER TABLE f.t DROP INDEX {name}")
            if name in model:
                del model[name]
                order.remove(name)
        elif roll < 0.55 and model:
            src = rng.choice(order)
            dst = f"uk{rng.randint(0, 9)}"
            sql = f"ALTER TABLE f.t RENAME INDEX {src} TO {dst}"
            if dst != src and dst in model:  # ER_DUP_KEYNAME
                with pytest.raises(ValueError, match="duplicate key"):
                    r.apply_sql(_tso(tso), sql)
            else:
                r.apply_sql(_tso(tso), sql)
                if src != dst:
                    model[dst] = model.pop(src)
                    order[order.index(src)] = dst
        elif roll < 0.70:
            c = f"c{next_col}"
            next_col += 1
            r.apply_sql(_tso(tso), f"ALTER TABLE f.t ADD COLUMN {c} INT")
            cols.append(c)
        elif roll < 0.85 and len(cols) > 1:
            src = rng.choice(cols)
            dst = f"c{next_col}"
            next_col += 1
            r.apply_sql(
                _tso(tso),
                f"ALTER TABLE f.t CHANGE COLUMN {src} {dst} INT")
            cols[cols.index(src)] = dst
            for k in list(model):
                model[k] = tuple(dst if c == src else c for c in model[k])
        elif len(cols) > 1:
            c = rng.choice(cols)
            r.apply_sql(_tso(tso), f"ALTER TABLE f.t DROP COLUMN {c}")
            cols.remove(c)
            for k in list(model):
                left = tuple(x for x in model[k] if x != c)
                if left:
                    model[k] = left
                else:
                    del model[k]
                    order.remove(k)
        tso += 1
        got = r.find("f", "t", _tso(tso))
        assert got.uniques == tuple((k, model[k]) for k in order), (
            f"seed {seed} step tso {tso}"
        )
        assert got.columns == tuple(cols)
