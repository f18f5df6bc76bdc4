"""SQL command surface over the binlog sink — metadata DataFrames.

Reference: the dumper serves `SHOW MASTER STATUS`, `SHOW BINARY LOGS`,
`SHOW BINLOG EVENTS`, `SHOW BINARY STREAMS` over gRPC
(docs/zh_CN/binlog-commands-intro.md:7,53,103,169; CdcServer.java:154-286).
Here the "files" are the sink's ``file_seq`` partitions; the commands are
small aggregations over sink metadata — consumers that would speak the
MySQL wire protocol instead read these frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def show_binary_logs(spark: SparkSession, sink_dir: str) -> DataFrame:
    """One row per binlog 'file' (file_seq partition): name, event count,
    TSO range — `SHOW BINARY LOGS` (binlog-commands-intro.md:53)."""
    df = spark.read.parquet(sink_dir)
    return (
        df.groupBy("file_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("tso").alias("min_tso"),
            F.max("tso").alias("max_tso"),
            F.min("offset").alias("start_offset"),
            F.max("offset").alias("end_offset"),
        )
        .withColumn("log_name", F.format_string("binlog.%06d", F.col("file_seq")))
        .orderBy("file_seq")
    )


def show_binary_logs_wire(spark: SparkSession, wire_dir: str) -> DataFrame:
    """`SHOW BINARY LOGS` over REAL wire files (binlog_wire.export_wire_
    files output): one row per file with its on-disk size and decoded
    event count — what a MySQL client sees when pointed at the rendered
    directory. Distributed: size from the binaryFile listing, counts from
    the per-file wire decode (no driver-side file reads)."""
    from polardbx_cdc_spark.binlog_wire import read_wire_binlog

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "binlog.*")
        .load(wire_dir)
        .select(
            F.element_at(F.split(F.col("path"), "/"), -1).alias("log_name"),
            F.col("length").alias("file_size"),
        )
    )
    counts = (
        read_wire_binlog(spark, wire_dir)
        .groupBy("file_name")
        .agg(
            F.count(F.lit(1)).alias("n_entries"),
            F.sum((~F.col("kind").isin("BEGIN", "COMMIT")).cast("long")).alias("n_events"),
        )
    )
    return (
        files.join(counts, files.log_name == counts.file_name, "left")
        .drop("file_name")
        .orderBy("log_name")
    )


def show_master_status(spark: SparkSession, sink_dir: str) -> DataFrame:
    """Current head position: latest file + offset + TSO —
    `SHOW MASTER STATUS` (binlog-commands-intro.md:7)."""
    df = spark.read.parquet(sink_dir)
    return df.agg(
        F.max("file_seq").alias("file_seq"),
        F.max("offset").alias("position"),
        F.max("tso").alias("last_tso"),
    ).withColumn("log_name", F.format_string("binlog.%06d", F.col("file_seq")))


def show_binlog_events(
    spark: SparkSession, sink_dir: str, file_seq: int, limit: int = 100
) -> DataFrame:
    """Events of one 'file' in offset order — `SHOW BINLOG EVENTS IN ...`
    (binlog-commands-intro.md:103). Partition pruning serves this from one
    directory."""
    df = spark.read.parquet(sink_dir)
    return (
        df.filter(F.col("file_seq") == file_seq)
        .orderBy("offset")
        .select("offset", "tso", "txn_id", "seq", "action", "db", "tbl", "pk")
        .limit(limit)
    )


def purge_binary_logs(spark: SparkSession, sink_dir: str, keep_from_seq: int) -> int:
    """`PURGE BINARY LOGS TO 'binlog.N'` — drop file_seq partitions below
    ``keep_from_seq`` (the reference purges consumed/backed-up files;
    binlog-commands-intro.md command surface). Returns files removed.
    Partition-dir removal: no rewrite of retained data."""
    import os
    import shutil

    removed = 0
    if not os.path.isdir(sink_dir):
        return 0
    for entry in os.listdir(sink_dir):
        if entry.startswith("file_seq="):
            seq = int(entry.split("=", 1)[1])
            if seq < keep_from_seq:
                shutil.rmtree(os.path.join(sink_dir, entry))
                removed += 1
    return removed


def show_binary_streams(spark: SparkSession, routed: DataFrame) -> DataFrame:
    """Per-stream summary of a Binlog-X routed frame —
    `SHOW BINARY STREAMS` (binlog-commands-intro.md:169)."""
    return (
        routed.groupBy("stream_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct(F.concat_ws(".", "db", "tbl")).alias("n_tables"),
            F.max("tso").alias("head_tso"),
        )
        .orderBy("stream_id")
    )
