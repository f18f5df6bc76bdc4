"""RPL admin command surface (replica_admin.py ⟷ RplServiceManager.java):
channel FSM transitions, running-slave guards, RESET [ALL] semantics, and
the data plane (position seek + replication filters on the CDC frame)."""

from __future__ import annotations

import pytest

from polardbx_cdc_spark.model import derive_cdc_stream
from polardbx_cdc_spark.operators.filters import min_tso_filter, replica_filter
from polardbx_cdc_spark.replica_admin import (
    DOWN,
    RUNNING,
    RUNNING_SLAVE_ERROR,
    STOPPED,
    ReplicaAdmin,
)

SF = "/root/testdata/sf0.001"


def test_channel_lifecycle_and_show_status():
    a = ReplicaAdmin()
    a.execute("CHANGE MASTER TO MASTER_HOST='m1', MASTER_PORT=3307 FOR CHANNEL 'ch1'")
    assert a.channels["ch1"].state == DOWN
    a.execute("START SLAVE FOR CHANNEL 'ch1'")
    assert a.channels["ch1"].state == RUNNING
    a.execute("STOP SLAVE FOR CHANNEL 'ch1'")
    assert a.channels["ch1"].state == STOPPED
    rows = a.execute("SHOW SLAVE STATUS FOR CHANNEL 'ch1'")
    assert len(rows) == 1 and rows[0][0] == "ch1" and rows[0][2] == "m1" and rows[0][3] == 3307


def test_change_master_refused_while_running():
    a = ReplicaAdmin()
    a.execute("START SLAVE FOR CHANNEL 'c'")
    with pytest.raises(ValueError, match=RUNNING_SLAVE_ERROR[:20]):
        a.execute("CHANGE MASTER TO MASTER_TSO='000123' FOR CHANNEL 'c'")
    a.execute("STOP SLAVE FOR CHANNEL 'c'")
    a.execute("CHANGE MASTER TO MASTER_TSO='000123' FOR CHANNEL 'c'")
    assert a.channels["c"].position == "000123"


def test_new_master_resets_saved_position():
    a = ReplicaAdmin()
    a.execute("CHANGE MASTER TO MASTER_TSO='000999' FOR CHANNEL 'c'")
    a.execute("CHANGE MASTER TO MASTER_HOST='other' FOR CHANNEL 'c'")
    assert a.channels["c"].position == ""  # changeMaster:291-296 semantics
    a.execute("CHANGE MASTER TO MASTER_LOG_FILE='binlog.000004', MASTER_LOG_POS=4 FOR CHANNEL 'c'")
    assert a.channels["c"].position == "binlog.000004:4"


def test_reset_slave_all_vs_history():
    a = ReplicaAdmin()
    a.execute("CHANGE MASTER TO MASTER_TSO='000123' FOR CHANNEL 'x'")
    a.execute("CHANGE MASTER TO MASTER_TSO='000456' FOR CHANNEL 'y'")
    a.execute("RESET SLAVE FOR CHANNEL 'x'")  # history only
    assert "x" in a.channels and a.channels["x"].position == ""
    a.execute("RESET SLAVE ALL FOR CHANNEL 'y'")  # remove the fsm itself
    assert "y" not in a.channels


def test_replication_filter_wiring():
    a = ReplicaAdmin()
    a.execute(
        "CHANGE REPLICATION FILTER REPLICATE_DO_DB=(db0,db1), "
        "REPLICATE_WILD_IGNORE_TABLE=('db0.tmp%'), "
        "REPLICATE_REWRITE_DB=(db0,dbz) FOR CHANNEL 'c'"
    )
    f = a.channels["c"].filter
    assert f.do_dbs == ["db0", "db1"]
    assert f.wild_ignore_tables == ["db0.tmp%"]
    assert f.rewrite_dbs == {"db0": "dbz"}


def test_apply_matches_manual_filter_composition(spark):
    cdc = derive_cdc_stream(spark, SF).persist()
    tso = sorted(r.tso for r in cdc.select("tso").distinct().limit(50).collect())[25]
    a = ReplicaAdmin()
    a.execute(f"CHANGE MASTER TO MASTER_TSO='{tso}' FOR CHANNEL 'c'")
    a.execute(
        "CHANGE REPLICATION FILTER REPLICATE_DO_DB=(db0,db1), "
        "REPLICATE_REWRITE_DB=(db1,db9) FOR CHANNEL 'c'"
    )
    with pytest.raises(ValueError, match="not running"):
        a.apply(cdc, "c")
    a.execute("START SLAVE FOR CHANNEL 'c'")
    got = a.apply(cdc, "c")

    expect = replica_filter(min_tso_filter(cdc, tso), a.channels["c"].filter)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expect.collect()))
    assert got.filter(got.db == "db1").count() == 0  # rewrite applied
    cdc.unpersist()


def test_unnamed_default_channel_and_show_df(spark):
    a = ReplicaAdmin()
    a.execute("CHANGE MASTER TO MASTER_TSO='000042'")
    a.execute("START SLAVE")
    df = a.show_status_df(spark)
    rows = df.collect()
    assert len(rows) == 1 and rows[0].channel == "" and rows[0].state == RUNNING
    assert rows[0].position == "000042"
