"""Direct checks for the SURVEY §2 rows that previously rode along on
other operators' tests: the recovery-window filter, TableParallelApplier's
co-location law, and the flow/TPS limiter (maxFilesPerTrigger throttling).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from polardbx_cdc_spark.model import derive_cdc_stream
from polardbx_cdc_spark.operators import appliers, filters

SF = "/root/testdata/sf0.001"


def test_tso_window_filter_inclusive_bounds(spark):
    cdc = derive_cdc_stream(spark, SF).select("tso").persist()
    tsos = sorted(r.tso for r in cdc.distinct().collect())
    lo, hi = tsos[10], tsos[min(len(tsos) - 1, 200)]
    kept = sorted(r.tso for r in filters.tso_window_filter(cdc, lo, hi).distinct().collect())
    assert kept == [t for t in tsos if lo <= t <= hi]
    assert lo in kept and hi in kept  # RecoveryFilter window is inclusive
    cdc.unpersist()


def test_table_parallel_co_locates_each_table(spark):
    cdc = derive_cdc_stream(spark, SF)
    parted = appliers.table_parallel(cdc, num_partitions=8)
    spread = (
        parted.withColumn("pid", F.spark_partition_id())
        .groupBy("db", "tbl")
        .agg(F.countDistinct("pid").alias("n_pids"))
        .collect()
    )
    assert spread and all(r.n_pids == 1 for r in spread)  # one serial lane per table
    assert parted.rdd.getNumPartitions() == 8


def test_flow_limiter_throttles_micro_batches(spark, tmp_path):
    """maxFilesPerTrigger=1 over an N-file source must produce ~N
    micro-batches (the reference's TPS limiter role: bound per-apply-cycle
    intake, polardbx-cdc-rpl flow control)."""
    src = tmp_path / "src"
    os.makedirs(src, exist_ok=True)
    base = spark.range(0, 400).withColumn("v", F.col("id") * 2)
    for i in range(4):
        base.filter((F.col("id") % 4) == i).coalesce(1).write.mode("append").parquet(
            str(src)
        )
    stream = spark.readStream.schema(base.schema).option("maxFilesPerTrigger", "1").parquet(
        str(src)
    )
    batch_sizes: list[int] = []
    q = (
        stream.writeStream.foreachBatch(lambda df, _id: batch_sizes.append(df.count()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sum(batch_sizes) == 400
    # parquet append writes one file per call (+_SUCCESS); 4 data files ->
    # at least 4 triggers when limited to 1 file each
    assert len([b for b in batch_sizes if b > 0]) >= 4
