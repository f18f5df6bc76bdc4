"""JDBC connectivity, exercised LIVE against the embedded Apache Derby
engine that ships in Spark's jars/ (no external database needed).

Layers covered:
- planning probe (min/max/count pushdown, empty-table short-circuit,
  identifier validation) — MysqlFullProcessor.java:162-244 parity
- chunked parallel full load (spark.read.jdbc partitionColumn ranges)
- rendered-DML apply in commit order through a driver-side connection
  with bounded memory (toLocalIterator streaming) —
  ApplyHelper.java:553-601 parity
- replica-state write (MergeApplier REPLACE endpoint)

``SPARK_GRAFT_JDBC_URL`` still selects an external database for the
round-trip test when set (e.g. a real MySQL); Derby is the default so
the suite has no environment-dependent skip.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from polardbx_cdc_spark.operators import jdbc

_COUNTER = {"n": 0}


def _mem_url() -> str:
    """Fresh in-memory Derby database per test (isolated namespaces)."""
    _COUNTER["n"] += 1
    return f"jdbc:derby:memory:graft{os.getpid()}_{_COUNTER['n']};create=true"


def _exec(spark, url: str, *stmts: str) -> None:
    conn = spark._jvm.java.sql.DriverManager.getConnection(url)  # noqa: SLF001
    try:
        st = conn.createStatement()
        for s in stmts:
            st.executeUpdate(s)
        conn.commit()
    finally:
        conn.close()


def test_jdbc_available_false_without_driver(spark):
    """No MySQL driver jar ships in this container — the probe must say so
    instead of raising (that is what gates driver-specific paths)."""
    assert jdbc.jdbc_available(spark, "jdbc:mysql://localhost:3306/x") is False


def test_jdbc_available_true_for_embedded_derby(spark):
    assert jdbc.jdbc_available(spark, "jdbc:derby:memory:probe;create=true") is True


def test_apply_rendered_dml_empty_frame_short_circuits(spark):
    """Zero statements → zero executed, and no connection is ever opened
    (a bogus URL would raise on connect)."""
    rendered = spark.createDataFrame([], "sql_text string, tso string")
    assert jdbc.apply_rendered_dml(spark, rendered, "jdbc:mysql://nowhere/x") == 0


def test_plan_full_load_probe_and_empty_table(spark):
    url = _mem_url()
    _exec(
        spark,
        url,
        "CREATE TABLE t (pk BIGINT PRIMARY KEY, value BIGINT)",
        "INSERT INTO t VALUES (10, 1), (20, 2), (30, 3)",
        "CREATE TABLE empty_t (pk BIGINT)",
    )
    assert jdbc.plan_full_load(spark, url, "t", "pk") == (10, 30, 3)
    # empty table: sentinel instead of int(None) TypeError
    assert jdbc.plan_full_load(spark, url, "empty_t", "pk") == (0, -1, 0)


def test_plan_full_load_rejects_hostile_identifiers(spark):
    url = _mem_url()
    with pytest.raises(ValueError, match="invalid SQL identifier"):
        jdbc.plan_full_load(spark, url, "t; DROP TABLE t", "pk")
    with pytest.raises(ValueError, match="invalid SQL identifier"):
        jdbc.plan_full_load(spark, url, "t", "pk) FROM t--")


def test_chunked_full_load_round_trip(spark):
    """write_replica_jdbc → read_full_jdbc with real range partitioning:
    every row comes back exactly once across chunk boundaries."""
    url = _mem_url()
    # uppercase names: Spark's JDBC writer CREATEs quoted column names, and
    # Derby folds unquoted probe identifiers to uppercase — match them
    seed = spark.range(100).select(
        F.col("id").cast("long").alias("PK"), (F.col("id") * 2).alias("VALUE")
    )
    jdbc.write_replica_jdbc(seed, url, "full_t", mode="overwrite")

    loaded = jdbc.read_full_jdbc(spark, url, "full_t", pk="PK", num_chunks=8)
    assert loaded.rdd.getNumPartitions() == 8
    assert loaded.count() == 100
    assert loaded.agg(F.sum("VALUE")).collect()[0][0] == 99 * 100  # sum 0..198 step 2


def test_apply_rendered_dml_streams_in_commit_order(spark):
    """Rendered UPDATEs applied through the streaming (toLocalIterator)
    lane land in tso order — later statements win, matching the serial
    commit-order semantics of ApplyHelper.execUpdate."""
    url = _mem_url()
    _exec(
        spark,
        url,
        "CREATE TABLE apply_t (pk BIGINT PRIMARY KEY, value BIGINT)",
        "INSERT INTO apply_t VALUES (1, 0), (2, 0), (3, 0)",
    )
    # two writes to pk=2 with different tso: the larger tso must win
    rows = [
        ("UPDATE apply_t SET value = 111 WHERE pk = 1", "001"),
        ("UPDATE apply_t SET value = 500 WHERE pk = 2", "003"),
        ("UPDATE apply_t SET value = 222 WHERE pk = 2", "002"),
        ("UPDATE apply_t SET value = 333 WHERE pk = 3", "004"),
    ]
    rendered = spark.createDataFrame(rows, "sql_text string, tso string")
    # small batch_size forces multiple executeBatch flushes mid-stream
    assert jdbc.apply_rendered_dml(spark, rendered, url, batch_size=2) == 4
    after = {
        r["PK"]: r["VALUE"]
        for r in jdbc.read_full_jdbc(spark, url, "apply_t", pk="pk", num_chunks=2).collect()
    }
    assert after == {1: 111, 2: 500, 3: 333}


def test_full_copy_to_inc_round_trip_embedded(spark):
    """FULL_COPY → INC over a live connection: seed, chunk-load, render
    DML from an ops frame, apply, re-read — the RPL state machine's happy
    path against a real (embedded) database."""
    from polardbx_cdc_spark.operators import appliers

    url = _mem_url()
    seed = spark.range(50).select(
        F.col("id").cast("long").alias("PK"), (F.col("id") * 2).alias("VALUE")
    )
    jdbc.write_replica_jdbc(seed, url, "rt", mode="overwrite")

    loaded = jdbc.read_full_jdbc(spark, url, "rt", pk="PK", num_chunks=4)
    assert loaded.count() == 50

    ops = spark.range(10).select(
        F.lit("UPDATE").alias("op"),
        F.lit("").alias("db"),
        F.lit("rt").alias("tbl"),
        F.col("id").cast("string").alias("pk"),
        F.lit(999).alias("value"),
        F.col("id").cast("string").alias("tso"),
    )
    # dialect adaptation: drop the empty-db "." prefix, and unquote the
    # numeric pk literal (MySQL implicit-casts VARCHAR→BIGINT, Derby won't)
    rendered = (
        appliers.render_dml(ops)
        .withColumn("sql_text", F.regexp_replace("sql_text", r"^UPDATE \.", "UPDATE "))
        .withColumn("sql_text", F.regexp_replace("sql_text", r"pk = '(\d+)'", r"pk = $1"))
    )
    n = jdbc.apply_rendered_dml(spark, rendered, url)
    assert n == 10
    after = jdbc.read_full_jdbc(spark, url, "rt", pk="PK", num_chunks=4)
    assert after.filter(F.col("VALUE") == 999).count() == 10


LIVE = os.environ.get(jdbc.JDBC_URL_ENV)


@pytest.mark.skipif(not LIVE, reason=f"{jdbc.JDBC_URL_ENV} not set — no external database")
def test_live_external_round_trip(spark):
    """Same round trip against an operator-supplied external database."""
    url = LIVE
    assert jdbc.jdbc_available(spark, url), "url set but no driver on classpath"
    seed = spark.range(100).select(
        F.col("id").cast("long").alias("pk"), (F.col("id") * 2).alias("value")
    )
    jdbc.write_replica_jdbc(seed, url, "spark_graft_smoke", mode="overwrite")
    loaded = jdbc.read_full_jdbc(spark, url, "spark_graft_smoke", pk="pk", num_chunks=8)
    assert loaded.count() == 100


def test_apply_rendered_dml_parallel_lanes(spark):
    """PK-parallel apply (SplitTransactionApplier parity): per-key chains
    stay in tso order inside one lane while distinct keys go down
    independent connections; totals and final state match the serial
    lane's result exactly."""
    url = _mem_url()
    _exec(
        spark,
        url,
        "CREATE TABLE par_t (pk BIGINT PRIMARY KEY, value BIGINT)",
        "INSERT INTO par_t VALUES " + ", ".join(f"({i}, 0)" for i in range(40)),
    )
    rows = []
    tso = 0
    # 3 tso-ordered writes per key; the LAST write per key must win
    for rnd in range(3):
        for k in range(40):
            tso += 1
            rows.append(
                ("db0", "t0", str(k), f"{tso:05d}",
                 f"UPDATE par_t SET value = {rnd * 1000 + k} WHERE pk = {k}")
            )
    rendered = spark.createDataFrame(
        rows, "db string, tbl string, pk string, tso string, sql_text string"
    )
    n = jdbc.apply_rendered_dml_parallel(
        spark, rendered, url, num_lanes=4, batch_size=7
    )
    assert n == 120
    after = {
        r["PK"]: r["VALUE"]
        for r in jdbc.read_full_jdbc(spark, url, "par_t", pk="pk", num_chunks=2).collect()
    }
    assert after == {k: 2000 + k for k in range(40)}


def test_apply_rendered_dml_parallel_serial_barrier(spark):
    """A serial event (PK-identity change) barriers all lanes: everything
    before it is applied first, it runs alone, and later statements see
    its effect — order proven by value arithmetic that only works in that
    order."""
    url = _mem_url()
    _exec(
        spark,
        url,
        "CREATE TABLE bar_t (pk BIGINT PRIMARY KEY, value BIGINT)",
        "INSERT INTO bar_t VALUES (1, 10), (2, 20)",
    )
    rows = [
        # before the barrier: set values
        ("db0", "t0", "1", "001", "UPDATE bar_t SET value = 100 WHERE pk = 1", False),
        ("db0", "t0", "2", "002", "UPDATE bar_t SET value = 200 WHERE pk = 2", False),
        # serial event: move pk 1 → 3 (touches two lanes → must run alone)
        ("db0", "t0", "1", "003", "UPDATE bar_t SET pk = 3 WHERE pk = 1", True),
        # after: write through the NEW identity; fails silently (0 rows) if
        # the barrier did not apply the move first
        ("db0", "t0", "3", "004", "UPDATE bar_t SET value = value + 1 WHERE pk = 3", False),
    ]
    rendered = spark.createDataFrame(
        rows,
        "db string, tbl string, pk string, tso string, sql_text string, is_serial boolean",
    )
    n = jdbc.apply_rendered_dml_parallel(
        spark, rendered, url, num_lanes=3, serial_col="is_serial"
    )
    assert n == 4
    after = {
        r["PK"]: r["VALUE"]
        for r in jdbc.read_full_jdbc(spark, url, "bar_t", pk="pk", num_chunks=1).collect()
    }
    assert after == {2: 200, 3: 101}


def test_apply_rendered_dml_parallel_propagates_errors(spark):
    """A failing statement in any lane aborts the whole apply with the
    underlying error; no deadlock, no silent partial success report."""
    url = _mem_url()
    _exec(spark, url, "CREATE TABLE err_t (pk BIGINT PRIMARY KEY, value BIGINT)")
    rows = [
        ("db0", "t0", "1", "001", "INSERT INTO err_t VALUES (1, 1)"),
        ("db0", "t0", "2", "002", "INSERT INTO no_such_table VALUES (2, 2)"),
    ]
    rendered = spark.createDataFrame(
        rows, "db string, tbl string, pk string, tso string, sql_text string"
    )
    with pytest.raises(Exception):
        jdbc.apply_rendered_dml_parallel(spark, rendered, url, num_lanes=2, batch_size=1)
