"""Streaming CDC sources.

Reference: BinlogExtractor tails MySQL binlogs per DN
(polardbx-cdc-task/.../extractor/BinlogExtractor.java:63,161-236); the RPL
side subscribes to the merged stream from a TSO (CdcExtractor.java:87,225).

Here the source is a file-based Structured Streaming reader over the
driver's ``events`` parquet (Trigger.AvailableNow in tests = bounded
replay); in production the same frame comes from Kafka/Debezium — only this
module changes, every downstream operator is source-agnostic.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from polardbx_cdc_spark.model import derive_cdc_stream


def _as_stream_dir(sf_dir: str, name: str) -> str:
    """Spark's file streaming source only accepts directories; the driver
    testdata is one parquet file per table. Stage a symlink dir (testdata
    itself is read-only)."""
    d = os.path.join(tempfile.gettempdir(), "cdc_stream_src", sf_dir.strip("/").replace("/", "_"), name)
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, f"{name}.parquet")
    target = os.path.join(sf_dir, f"{name}.parquet")
    if not os.path.islink(link):
        os.symlink(target, link)
    return d


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events parquet as an unbounded stream (schema pinned from the batch
    read; nanos ts handled identically to session.load_table)."""
    from polardbx_cdc_spark.session import ensure_nanos_readable, normalize_event_ts

    ensure_nanos_readable(spark)
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    stream = spark.readStream.schema(batch.schema).parquet(_as_stream_dir(sf_dir, "events"))
    return normalize_event_ts(stream)


def read_binlog(spark: SparkSession, sink_dir: str, from_tso: str = "") -> DataFrame:
    """Consume a BinlogSink output as a CDC frame — the downstream
    subscriber path (CdcExtractor.java:87,225: subscribe to the global
    binlog from a TSO). Frame rows (BEGIN/COMMIT) are stripped; ``from_tso``
    is the starting position (partition/row-group pruned)."""
    df = spark.read.parquet(sink_dir)
    events = df.filter(~F.col("action").isin("BEGIN", "COMMIT"))
    if from_tso:
        events = events.filter(F.col("tso") > from_tso)
    drop = [c for c in ("offset", "file_seq", "frame_rank", "txn_commit_tso") if c in df.columns]
    return events.drop(*drop)


def cdc_stream(spark: SparkSession, sf_dir: str, watermark: str = "10 minutes") -> DataFrame:
    """The canonical CDC stream with an event-time watermark on the TSO
    physical time — the Spark-native HeartBeatWindow: the global watermark
    is min over all source partitions, exactly the reference's
    all-sources-reached-T emission gate (HeartBeatWindow.java:30-71)."""
    ev = read_events_stream(spark, sf_dir)
    return derive_cdc_stream(spark, sf_dir, events=ev).withWatermark("ts", watermark)
