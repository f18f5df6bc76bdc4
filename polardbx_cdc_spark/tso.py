"""TSO (timestamp-oracle) sort-key utilities.

The reference orders the global stream by a TSO string: a 19-digit
physical timestamp, a 19-digit transaction id, and a 10-digit sequence,
concatenated into one lexicographically sortable key
(reference: polardbx-cdc-common/.../CommonUtils.java:86-96, and the
``tso|transactionId|seq`` comparator in extractor/log/VirtualTSO.java:21-44).

We keep the same encoding: zero-padded decimal digits make string order ==
numeric order, so a single string column is a total order that survives
shuffles, range-partitions cleanly (sort/merge on it is a byte compare),
and doubles as the event-time source for watermarks
(getTsoPhysicalTime — CommonUtils.java:68).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PHYSICAL_DIGITS = 19
TXN_DIGITS = 19
SEQ_DIGITS = 10


def make_tso(physical_micros: Column, txn_id: Column, seq: Column) -> Column:
    """Encode (physical_time_micros, txn_id, seq) into the 48-char sortable key."""
    return F.concat(
        F.lpad(physical_micros.cast("string"), PHYSICAL_DIGITS, "0"),
        F.lpad(txn_id.cast("string"), TXN_DIGITS, "0"),
        F.lpad(seq.cast("string"), SEQ_DIGITS, "0"),
    )


def tso_physical_micros(tso: Column) -> Column:
    """Extract the physical-time component (micros since epoch) of a TSO."""
    return F.substring(tso, 1, PHYSICAL_DIGITS).cast("long")


def tso_physical_time(tso: Column) -> Column:
    """Physical component as a timestamp — the watermark/event-time column."""
    return F.timestamp_micros(tso_physical_micros(tso))


def tso_txn_id(tso: Column) -> Column:
    return F.substring(tso, PHYSICAL_DIGITS + 1, TXN_DIGITS).cast("long")


def tso_seq(tso: Column) -> Column:
    return F.substring(tso, PHYSICAL_DIGITS + TXN_DIGITS + 1, SEQ_DIGITS).cast("long")


# DuckDB-oracle SQL fragment producing the identical key from the same parts.
def oracle_make_tso(physical_micros_sql: str, txn_id_sql: str, seq_sql: str) -> str:
    return (
        f"lpad(CAST({physical_micros_sql} AS VARCHAR), {PHYSICAL_DIGITS}, '0') || "
        f"lpad(CAST({txn_id_sql} AS VARCHAR), {TXN_DIGITS}, '0') || "
        f"lpad(CAST({seq_sql} AS VARCHAR), {SEQ_DIGITS}, '0')"
    )
