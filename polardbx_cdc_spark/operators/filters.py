"""Filter-chain operators.

Reference chain (installed at polardbx-cdc-task/.../extractor/BinlogExtractor.java:189-236):
EventAcceptFilter → TransactionBufferEventFilter → RebuildEventLogFilter → MinTSOFilter.
Plus the RPL-side replication filter (rpl/filter/ReplicaFilter.java:38-208), the table
blacklist (extractor/log/processor/FilterBlacklistTableFilter.java), and the
flashback/recovery window filters (rpl/filter/FlashBackFilter.java:35-98,
rpl/filter/RecoveryFilter.java).

All are plain Catalyst predicates: they push down to the parquet scan, so at
100 TB the filtered columns/row-groups are never read.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def accept_filter(
    df: DataFrame,
    actions: list[str] | None = None,
    dbs: list[str] | None = None,
    tbls: list[str] | None = None,
) -> DataFrame:
    """Event-type + schema whitelist (EventAcceptFilter.java; whitelist built
    at BinlogExtractor.java:203-224). ``isin`` predicates push to the scan."""
    out = df
    if actions:
        out = out.filter(F.col("action").isin(actions))
    if dbs:
        out = out.filter(F.col("db").isin(dbs))
    if tbls:
        out = out.filter(F.col("tbl").isin(tbls))
    return out


def blacklist_filter(df: DataFrame, patterns: list[str]) -> DataFrame:
    """Drop rows whose ``db.tbl`` matches any regex (FilterBlacklistTableFilter;
    also the system-table drop in extractor/log/Transaction.java:497-515)."""
    if not patterns:
        return df
    full = F.concat_ws(".", F.col("db"), F.col("tbl"))
    pred = None
    for p in patterns:
        m = full.rlike(p)
        pred = m if pred is None else (pred | m)
    return df.filter(~pred)


def min_tso_filter(df: DataFrame, start_tso: str) -> DataFrame:
    """Drop events before the start position (extractor/filter/MinTSOFilter.java:135).
    TSO is lexicographically ordered, so this is a plain range predicate."""
    return df.filter(F.col("tso") >= F.lit(start_tso))


def seek_tso_by_timestamp(df: DataFrame, ts_utc: str) -> DataFrame:
    """Start-position seek by WALL-CLOCK time, using the physical-time
    component embedded in the TSO itself (SearchTsoEventHandleV2.java:41-67
    and the processors under core/handle/processor/ — the reference binary-
    searches binlog files for the first event whose TSO physical time >= the
    requested timestamp).

    Scale shape: rather than filtering on ``substr(tso,1,19)`` (not
    sargable), we build the virtual TSO for the timestamp — physical micros
    zero-padded, txn/seq all-zero, the lexicographic FLOOR of that instant —
    driver-side, and emit ``tso >= '<cutoff>'``: a plain range predicate on
    the sort key that parquet answers with row-group min/max pruning, same
    as the reference's file-header binary search skips whole binlog files."""
    return df.filter(F.col("tso") >= F.lit(tso_floor_for_timestamp(ts_utc)))


def tso_floor_for_timestamp(ts_utc: str) -> str:
    """Lexicographic TSO floor of a wall-clock instant: physical micros
    zero-padded, txn/seq all-zero (VirtualTSO comparator semantics)."""
    from datetime import datetime, timezone

    from polardbx_cdc_spark.tso import PHYSICAL_DIGITS, SEQ_DIGITS, TXN_DIGITS

    dt = datetime.fromisoformat(ts_utc).replace(tzinfo=timezone.utc)
    micros = int(dt.timestamp()) * 1_000_000 + dt.microsecond
    return str(micros).zfill(PHYSICAL_DIGITS) + "0" * (TXN_DIGITS + SEQ_DIGITS)


def timestamp_window_filter(df: DataFrame, start_ts: str, end_ts: str) -> DataFrame:
    """Wall-clock window [start, end): both bounds become TSO floors, so
    the predicate is a sargable range on the sort key (row-group prunable)
    — the window form of ``seek_tso_by_timestamp``, used by time-bounded
    flashback (RecoveryExtractor's start/end search positions)."""
    lo = tso_floor_for_timestamp(start_ts)
    hi = tso_floor_for_timestamp(end_ts)
    return df.filter((F.col("tso") >= F.lit(lo)) & (F.col("tso") < F.lit(hi)))


def tso_window_filter(df: DataFrame, start_tso: str, end_tso: str) -> DataFrame:
    """Recovery/flashback window [start, end] (rpl/filter/RecoveryFilter.java)."""
    return df.filter(F.col("tso").between(F.lit(start_tso), F.lit(end_tso)))


def _mysql_wildcard_to_regex(pattern: str) -> str:
    """MySQL replication wildcards: ``%`` = any run, ``_`` = one char."""
    out = []
    for ch in pattern:
        if ch == "%":
            out.append(".*")
        elif ch == "_":
            out.append(".")
        elif ch in r"\.^$*+?{}[]|()":
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "^" + "".join(out) + "$"


@dataclass
class ReplicaFilterConfig:
    """MySQL-compatible replication filter config (Rpl_filter port —
    rpl/filter/ReplicaFilter.java:38-208)."""

    do_dbs: list[str] = field(default_factory=list)
    ignore_dbs: list[str] = field(default_factory=list)
    do_tables: list[str] = field(default_factory=list)  # "db.tbl" exact
    ignore_tables: list[str] = field(default_factory=list)
    wild_do_tables: list[str] = field(default_factory=list)  # "db.t%" wildcards
    wild_ignore_tables: list[str] = field(default_factory=list)
    rewrite_dbs: dict[str, str] = field(default_factory=dict)  # src db -> dst db


def _any_wild_match(col: Column, patterns: list[str]) -> Column:
    pred = F.lit(False)
    for p in patterns:
        pred = pred | col.rlike(_mysql_wildcard_to_regex(p))
    return pred


def replica_filter(df: DataFrame, cfg: ReplicaFilterConfig) -> DataFrame:
    """Apply do/ignore db+table rules (MySQL precedence: do-lists win when
    non-empty, else ignore-lists; ReplicaFilter.java:79-105), then the db
    rewrite map (getRewriteDb). All broadcast-free literal predicates."""
    out = df
    if cfg.do_dbs:
        out = out.filter(F.col("db").isin(cfg.do_dbs))
    elif cfg.ignore_dbs:
        out = out.filter(~F.col("db").isin(cfg.ignore_dbs))

    full = F.concat_ws(".", F.col("db"), F.col("tbl"))
    if cfg.do_tables or cfg.wild_do_tables:
        keep = F.lit(False)
        if cfg.do_tables:
            keep = keep | full.isin(cfg.do_tables)
        if cfg.wild_do_tables:
            keep = keep | _any_wild_match(full, cfg.wild_do_tables)
        out = out.filter(keep)
    else:
        if cfg.ignore_tables:
            out = out.filter(~full.isin(cfg.ignore_tables))
        if cfg.wild_ignore_tables:
            out = out.filter(~_any_wild_match(full, cfg.wild_ignore_tables))

    if cfg.rewrite_dbs:
        mapping = F.create_map(*[F.lit(x) for kv in cfg.rewrite_dbs.items() for x in kv])
        out = out.withColumn("db", F.coalesce(mapping[F.col("db")], F.col("db")))
    return out


def flashback_filter(df: DataFrame, db: str, tbl: str) -> DataFrame:
    """Keep only the recovery-target table (rpl/filter/FlashBackFilter.java:35-98)."""
    return df.filter((F.col("db") == db) & (F.col("tbl") == tbl))


def data_import_filter(df: DataFrame, import_map: dict[str, tuple[str, str]]) -> DataFrame:
    """Data-import routing filter (rpl/filter/DataImportFilter.java:126):
    keep only tables in the import map and rewrite each to its target
    (db, tbl). ``import_map``: "src_db.src_tbl" -> (dst_db, dst_tbl)."""
    full = F.concat_ws(".", F.col("db"), F.col("tbl"))
    kept = df.filter(full.isin(list(import_map)))
    dst_db, dst_tbl = F.col("db"), F.col("tbl")
    for src, (ddb, dtbl) in import_map.items():
        dst_db = F.when(full == src, F.lit(ddb)).otherwise(dst_db)
        dst_tbl = F.when(full == src, F.lit(dtbl)).otherwise(dst_tbl)
    # single projection: both rewrites must see the ORIGINAL db/tbl
    cols = [
        dst_db.alias("db") if c == "db" else dst_tbl.alias("tbl") if c == "tbl" else F.col(c)
        for c in df.columns
    ]
    return kept.select(*cols)
