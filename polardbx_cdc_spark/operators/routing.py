"""Binlog-X multi-stream hash routing.

Reference: HashConfig.getHashLevel/getStreamSeq
(polardbx-cdc-task/.../transmit/relay/HashConfig.java:64-264), HashLevel enum
(polardbx-cdc-common/.../relay/HashLevel.java:20), record-level row split +
PK extraction (RowEventReformator.java:100-135).

Routing granularity per (db, table): DATABASE (all of a db on one stream),
TABLE (default; a table pinned to one stream), RECORD (rows of a table
spread across streams by PK hash), plus explicit table→stream pinning.

The hash here is md5-prefix→uint32 rather than Spark's murmur3 so the DuckDB
oracle can reproduce stream assignment bit-for-bit; at scale the hash choice
is irrelevant (one projection, no extra shuffle — the routed write is
``.writeStream.partitionBy('stream_id')`` / ``repartition(N, 'stream_id')``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class StreamRoutingConfig:
    """Mirrors the HashConfig knobs (HashConfig.java:208-255)."""

    stream_count: int = 4
    default_level: str = "TABLE"  # DATABASE | TABLE | RECORD
    record_level_tables: list[str] = field(default_factory=list)  # "db.tbl"
    db_level_dbs: list[str] = field(default_factory=list)
    table_stream_pinning: dict[str, int] = field(default_factory=dict)  # "db.tbl" -> stream


def _hash32(col: Column) -> Column:
    """Deterministic cross-engine 32-bit hash: first 8 hex chars of md5."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def routing_key(cfg: StreamRoutingConfig) -> Column:
    """The per-row routing expression (getHashLevel :208-237)."""
    full = F.concat_ws(".", F.col("db"), F.col("tbl"))
    key = (
        F.when(full.isin(cfg.record_level_tables), F.concat_ws(".", full, F.col("pk")))
        if cfg.record_level_tables
        else None
    )
    db_key = F.col("db")
    tbl_key = full
    default_key = {
        "DATABASE": db_key,
        "TABLE": tbl_key,
        "RECORD": F.concat_ws(".", full, F.col("pk")),
    }[cfg.default_level]
    expr = default_key
    if cfg.db_level_dbs:
        expr = F.when(F.col("db").isin(cfg.db_level_dbs), db_key).otherwise(expr)
    if cfg.record_level_tables:
        expr = F.when(
            full.isin(cfg.record_level_tables), F.concat_ws(".", full, F.col("pk"))
        ).otherwise(expr)
    return expr


def assign_stream(df: DataFrame, cfg: StreamRoutingConfig) -> DataFrame:
    """Add ``stream_id`` (getStreamSeq :238-255): explicit pin wins, else
    pmod(hash32(routing_key), stream_count)."""
    full = F.concat_ws(".", F.col("db"), F.col("tbl"))
    sid = F.pmod(_hash32(routing_key(cfg)), F.lit(cfg.stream_count))
    for tbl, stream in cfg.table_stream_pinning.items():
        sid = F.when(full == tbl, F.lit(stream)).otherwise(sid)
    return df.withColumn("stream_id", sid.cast("int"))


def oracle_hash32(sql_expr: str) -> str:
    """DuckDB fragment computing the identical 32-bit hash."""
    return f"CAST(('0x' || substr(md5({sql_expr}), 1, 8)) AS BIGINT)"
