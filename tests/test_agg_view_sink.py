"""AggViewSink: durable materialized-view maintenance across micro-batches
must equal the one-shot batch IVM (apply.maintain_agg_view) for ANY batch
split, and replaying a batch after a simulated crash must be idempotent."""

from __future__ import annotations

from pyspark.sql import functions as F

from polardbx_cdc_spark.model import derive_cdc_stream
from polardbx_cdc_spark.operators import apply as apply_ops
from polardbx_cdc_spark.streaming.pipeline import AggViewSink

SF = "/root/testdata/sf0.001"


def _ground_truth(spark):
    cdc = derive_cdc_stream(spark, SF)
    return (
        apply_ops.maintain_agg_view(cdc)
        .filter(F.col("n_rows") > 0)
        .orderBy("db", "tbl")
        .collect()
    )


def _run_batched(spark, tmp_path, n_batches):
    cdc = derive_cdc_stream(spark, SF).select(
        "db", "tbl", "pk", "tso", "action", "value"
    )
    sink = AggViewSink(str(tmp_path / f"mv{n_batches}"))
    # deterministic split along the TSO order — exactly what micro-batches
    # of an ordered CDC stream deliver
    rows = cdc.orderBy("tso").collect()
    per = (len(rows) + n_batches - 1) // n_batches
    for i in range(n_batches):
        chunk = rows[i * per : (i + 1) * per]
        if not chunk:
            continue
        batch = spark.createDataFrame(chunk, cdc.schema)
        sink(batch, batch_id=i)
    return sink


def test_single_batch_equals_batch_ivm(spark, tmp_path):
    sink = _run_batched(spark, tmp_path, 1)
    got = sink.view(spark).orderBy("db", "tbl").collect()
    assert got == _ground_truth(spark)


def test_multi_batch_equals_batch_ivm(spark, tmp_path):
    for n in (3, 7):
        sink = _run_batched(spark, tmp_path, n)
        got = sink.view(spark).orderBy("db", "tbl").collect()
        assert got == _ground_truth(spark), f"split into {n} batches diverged"


def test_crash_replay_is_idempotent(spark, tmp_path):
    cdc = derive_cdc_stream(spark, SF).select(
        "db", "tbl", "pk", "tso", "action", "value"
    )
    rows = cdc.orderBy("tso").collect()
    half = len(rows) // 2
    sink = AggViewSink(str(tmp_path / "mv_crash"))
    b0 = spark.createDataFrame(rows[:half], cdc.schema)
    b1 = spark.createDataFrame(rows[half:], cdc.schema)
    sink(b0, batch_id=0)
    sink(b1, batch_id=1)
    # crash-after-commit → the runner redelivers the last batch
    sink(b1, batch_id=1)
    got = sink.view(spark).orderBy("db", "tbl").collect()
    assert got == _ground_truth(spark)
