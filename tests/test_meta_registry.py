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
