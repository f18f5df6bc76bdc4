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


def show_binlog_events_wire(
    spark: SparkSession,
    wire_dir: str,
    log_name: str | None = None,
    from_pos: int = 4,
    limit: int | None = None,
) -> DataFrame:
    """``SHOW BINLOG EVENTS [IN 'file'] [FROM pos] [LIMIT n]`` over REAL
    wire files — one row per event with its BYTE position (Log_name, Pos,
    Event_type, Server_id, End_log_pos, Info), the exact surface a MySQL
    client gets from the reference's dump server (CdcServer.java:154-286
    serves the same files). Distributed: binaryFile scan + per-file
    header walk in mapInPandas; only headers are parsed, so Info is the
    event-type summary, not a row decode."""
    from polardbx_cdc_spark import binlog_wire as BW

    _NAMES = {
        BW.QUERY_EVENT: "Query", BW.FORMAT_DESCRIPTION_EVENT: "Format_desc",
        BW.XID_EVENT: "Xid", BW.TABLE_MAP_EVENT: "Table_map",
        BW.WRITE_ROWS_EVENT: "Write_rows", BW.UPDATE_ROWS_EVENT: "Update_rows",
        BW.DELETE_ROWS_EVENT: "Delete_rows",
        BW.WRITE_ROWS_EVENT_V1: "Write_rows_v1",
        BW.UPDATE_ROWS_EVENT_V1: "Update_rows_v1",
        BW.DELETE_ROWS_EVENT_V1: "Delete_rows_v1",
        BW.PARTIAL_UPDATE_ROWS_EVENT: "Update_rows_partial",
        BW.ROTATE_EVENT: "Rotate", BW.XA_PREPARE_EVENT: "XA_prepare",
        BW.SEQUENCE_EVENT: "Sequence", BW.GCN_EVENT: "Gcn",
        BW.ROWS_QUERY_EVENT: "Rows_query", BW.GTID_LOG_EVENT: "Gtid",
        BW.ANONYMOUS_GTID_LOG_EVENT: "Anonymous_Gtid",
        BW.PREVIOUS_GTIDS_LOG_EVENT: "Previous_gtids",
        BW.HEARTBEAT_LOG_EVENT: "Heartbeat",
    }

    def walk_files(batches):
        import os as _os
        import struct as _struct

        import pandas as pd

        for pdf in batches:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                name = _os.path.basename(path)
                buf = bytes(content)
                if buf[:4] != BW.MAGIC:
                    continue
                pos = 4
                body = buf
                while pos + BW.HEADER_LEN <= len(body):
                    ts, tc, sid, elen, npos, _fl = _struct.unpack_from(
                        "<IBIIIH", body, pos
                    )
                    if elen < BW.HEADER_LEN + BW.CHECKSUM_LEN or pos + elen > len(body):
                        break
                    out.append(
                        (name, pos, _NAMES.get(tc, f"Unknown({tc})"), sid,
                         pos + elen, ts)
                    )
                    pos += elen
            yield pd.DataFrame(
                out,
                columns=["log_name", "pos", "event_type", "server_id",
                         "end_log_pos", "ts"],
            )

    glob = log_name if log_name else "binlog.*"
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(wire_dir)
        .select("path", "content")
        .mapInPandas(
            walk_files,
            "log_name string, pos long, event_type string, server_id long, "
            "end_log_pos long, ts long",
        )
        .filter(F.col("pos") >= from_pos)
        .orderBy("log_name", "pos")
    )
    return df.limit(limit) if limit else df


def gtid_set_text(gtid_set: dict[bytes, list[tuple[int, int]]]) -> str:
    """Canonical Executed_Gtid_Set rendering — re-exported from the
    Spark-free implementation (``mysql_dump.gtid_set_text``), which
    merges overlapping/adjacent intervals first so this always agrees
    with SHOW MASTER STATUS output."""
    from polardbx_cdc_spark.mysql_dump import gtid_set_text as _impl

    return _impl(gtid_set)


def show_master_status_wire(spark: SparkSession, wire_dir: str) -> DataFrame:
    """`SHOW MASTER STATUS` over REAL wire files, with the
    Executed_Gtid_Set column a GTID-aware client reads: the last file's
    PREVIOUS_GTIDS merged with the GTID events inside it (exactly the set
    the server would report; binlog-commands-intro.md:7). Driver-side:
    one header walk of the LAST file only — O(tail file bytes); the walk
    itself lives Spark-free in ``mysql_dump.master_status`` (the MySQL
    COM_QUERY surface answers from the same function)."""
    from polardbx_cdc_spark.mysql_dump import master_status

    schema = "log_name string, position bigint, executed_gtid_set string"
    hit = master_status(wire_dir)
    if hit is None:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame([hit], schema)
