"""Cluster configuration presets for running this engine at scale.

Local tests use session.get_spark(); on a real cluster apply
``cluster_conf(...)`` on top. Values follow public Spark tuning guidance
(spark.apache.org/docs/latest/sql-performance-tuning.html) sized for the
target data volume — the rationale is inline so operators can re-derive.
"""

from __future__ import annotations


def cluster_conf(
    data_tb: float,
    executor_cores_total: int,
    target_partition_mb: int = 256,
) -> dict[str, str]:
    """Config dict for a batch/streaming deployment over ``data_tb`` TB.

    - shuffle partitions: data / target partition size, floored at 2×
      total cores so every core has work and AQE can coalesce downward.
    - maxPartitionBytes: scan granularity — bigger = fewer tasks, bounded
      by executor memory per core.
    - AQE on with skew-join splitting: zipf keys (hot PKs, hot tables)
      are the norm in CDC streams.
    - broadcast threshold: dims up to 64 MB broadcast (region/nation/
      supplier-class tables); fact-fact joins never broadcast.
    """
    data_mb = int(data_tb * 1024 * 1024)
    shuffle_parts = max(2 * executor_cores_total, data_mb // target_partition_mb)
    return {
        "spark.sql.shuffle.partitions": str(shuffle_parts),
        "spark.sql.files.maxPartitionBytes": str(target_partition_mb * 1024 * 1024),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(target_partition_mb * 1024 * 1024),
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # streaming state: RocksDB keeps large keyed state off-heap
        "spark.sql.streaming.stateStore.providerClass": (
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
        ),
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
        # wide-row CDC events: keep Arrow batches bounded
        "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
        "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
        "spark.speculation": "true",
    }


#: worked example: 100 TB corpus on 1000 executors × 4 cores
EXAMPLE_100TB = cluster_conf(data_tb=100, executor_cores_total=4000)
