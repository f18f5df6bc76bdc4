"""Stress-harness parity (stress.py ⟷ the reference's per-stage
simulators): deterministic synthetic token stream at rate, driven through
the real binlog sink, with EPS readout and order preserved under load."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from polardbx_cdc_spark import stress
from polardbx_cdc_spark.streaming.pipeline import BinlogSink


def test_synthetic_stream_drives_binlog_sink_in_order(spark, tmp_path):
    sink = BinlogSink(str(tmp_path / "binlog"), rotate_rows=5_000)
    stats = stress.run_stress(
        spark,
        sink,
        checkpoint_dir=str(tmp_path / "ckpt"),
        batches=3,
        rows_per_batch=2_000,
    )
    assert stats["events"] >= 6_000 and stats["eps"] > 0
    out = spark.read.parquet(str(tmp_path / "binlog"))
    n = out.count()
    assert n >= 6_000
    # global order law: offset rank == tso rank (sink's ordering contract)
    disorder = (
        out.select(
            F.row_number().over(__import__("pyspark").sql.Window.orderBy("offset")).alias("r_off"),
            F.row_number().over(__import__("pyspark").sql.Window.orderBy("tso", "offset")).alias("r_tso"),
        )
        .filter(F.col("r_off") != F.col("r_tso"))
        .count()
    )
    assert disorder == 0
    # synthetic TSOs are unique and monotone with the row index
    assert out.select("tso").distinct().count() == n


def test_hot_key_dial_skews_routing(spark, tmp_path):
    df_stream = stress.synthetic_cdc_stream(spark, rows_per_batch=5_000, hot_key_pct=40)
    counts = {}

    def grab(batch_df, _id):
        for r in batch_df.groupBy("db", "tbl", "pk").count().collect():
            counts[(r.db, r.tbl, r.pk)] = counts.get((r.db, r.tbl, r.pk), 0) + r["count"]

    q = (
        df_stream.writeStream.foreachBatch(grab)
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    import time

    t0 = time.time()
    while sum(counts.values()) < 5_000 and time.time() - t0 < 120:
        time.sleep(0.2)
    q.stop()
    q.awaitTermination(30)
    total = sum(counts.values())
    hot = counts.get(("db0", "t0", "hot"), 0)
    assert total >= 5_000
    assert abs(hot / total - 0.4) < 0.02  # the skew dial is exact-ish by construction
