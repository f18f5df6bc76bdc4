"""JDBC connectivity: env-guarded live round-trip plus always-on unit
coverage of the planning/probe surface (no database in this sandbox →
the live test self-skips; on a machine with a reachable database set
SPARK_GRAFT_JDBC_URL and it runs for real)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from polardbx_cdc_spark.operators import jdbc

LIVE = os.environ.get(jdbc.JDBC_URL_ENV)


def test_jdbc_available_false_without_driver(spark):
    """This container ships no JDBC driver jar — the probe must say so
    instead of raising (that is what gates the live path)."""
    assert jdbc.jdbc_available(spark, "jdbc:mysql://localhost:3306/x") is False


def test_apply_rendered_dml_empty_frame_short_circuits(spark):
    """Zero statements → zero executed, and no connection is ever opened
    (would raise here: no driver exists)."""
    rendered = spark.createDataFrame([], "sql_text string, tso string")
    assert jdbc.apply_rendered_dml(spark, rendered, "jdbc:mysql://nowhere/x") == 0


@pytest.mark.skipif(not LIVE, reason=f"{jdbc.JDBC_URL_ENV} not set — no live database")
def test_live_full_load_and_apply_round_trip(spark, tmpdir):
    """Real database: chunked full load → render INSERT DML from a CDC
    frame → apply over JDBC → re-read and compare. Mirrors the RPL
    FULL_COPY→INC path end-to-end over a live connection."""
    from polardbx_cdc_spark.operators import appliers

    url = LIVE
    assert jdbc.jdbc_available(spark, url), "url set but no driver on classpath"
    tbl = "spark_graft_smoke"
    seed = spark.range(100).select(
        F.col("id").cast("long").alias("pk"), (F.col("id") * 2).alias("value")
    )
    jdbc.write_replica_jdbc(seed, url, tbl, mode="overwrite")

    # chunked parallel full load reads back exactly what was written
    loaded = jdbc.read_full_jdbc(spark, url, tbl, pk="pk", num_chunks=8)
    assert loaded.count() == 100
    assert loaded.agg(F.sum("value")).collect()[0][0] == seed.agg(F.sum("value")).collect()[0][0]

    # rendered-DML apply: 10 updates through a live connection
    ops = spark.range(10).select(
        F.lit("UPDATE").alias("op"),
        F.lit("").alias("db"),
        F.lit(tbl).alias("tbl"),
        F.col("id").cast("string").alias("pk"),
        F.lit(999).alias("value"),
        F.col("id").cast("string").alias("tso"),
    )
    rendered = appliers.render_dml(ops).withColumn(
        "sql_text", F.regexp_replace("sql_text", r"^UPDATE \.", "UPDATE ")
    )
    n = jdbc.apply_rendered_dml(spark, rendered, url)
    assert n == 10
    after = jdbc.read_full_jdbc(spark, url, tbl, pk="pk", num_chunks=4)
    assert after.filter(F.col("value") == 999).count() == 10
