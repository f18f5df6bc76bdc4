"""Global TSO merge, transaction reassembly, heartbeat epochs.

Reference: the k-way TSO merge tree (merge/LogEventMerger.java:54-391,
MergeSource.java:34-120, MergeGroupFactory.java:28-87), disorder detection
(LogEventMerger.java:136-141), XA reassembly (merge/MergeBarrier.java:30-142,
XaTransaction.java:30-123), and the heartbeat window gate
(merge/HeartBeatWindow.java:30-102).

Spark disposition: the merge tree, its bounded queues and PriorityQueue
controller are replaced by a shuffle + range-partitioned sort on the TSO key
— Tungsten sort, whole-stage codegen, spill-safe. At 100 TB the global sort
is `orderBy(tso)`: Spark samples range bounds so no single node sorts the
world; within a streaming epoch the per-batch sort is small by construction.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def k_way_merge(*sources: DataFrame) -> DataFrame:
    """Union N per-source streams and order by TSO (LogEventMerger.java:122-168).

    The reference's merge-group tree with bounded fan-in exists to avoid an
    O(N) peek per poll; Spark's shuffle exchange + sort gives the same
    result with range partitioning (no driver-side bottleneck).
    """
    merged = reduce(lambda a, b: a.unionByName(b), sources)
    return merged.orderBy("tso")


def disorder_report(df: DataFrame) -> DataFrame:
    """Per-source TSO monotonicity audit (disorder ⇒ hard error in the
    reference, LogEventMerger.java:136-141). Returns one row per source with
    the count of inversions (must be 0) — usable as a foreachBatch assertion."""
    w = Window.partitionBy("source_id").orderBy("tso", "seq")
    lagged = df.withColumn("prev_tso", F.lag("tso").over(w))
    return (
        lagged.groupBy("source_id")
        .agg(
            F.sum(
                F.when(F.col("prev_tso").isNotNull() & (F.col("tso") < F.col("prev_tso")), 1).otherwise(0)
            ).alias("inversions"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("source_id")
    )


def assemble_transactions(df: DataFrame) -> DataFrame:
    """Reassemble events into transaction tokens (TxnToken — TxnStream.proto:95-135;
    XA merge MergeBarrier.java:30-142).

    groupBy(txn_id) with purely associative aggregates → map-side partial
    aggregation, single shuffle. ``complete`` checks seq contiguity FROM
    ZERO (0..n-1), the reference's allParties-complete condition — a
    head-truncated chain (seq 0.. dropped by an upstream filter) is
    incomplete even if the surviving seqs are contiguous, matching the
    stateful twin in streaming/pipeline.py.
    """
    return (
        df.groupBy("txn_id")
        .agg(
            F.min("tso").alias("start_tso"),
            F.max("tso").alias("commit_tso"),
            F.count(F.lit(1)).alias("txn_size"),
            F.min("seq").alias("min_seq"),
            F.max("seq").alias("max_seq"),
            F.countDistinct("source_id").alias("n_parties"),
            (
                (F.min("seq") == 0)
                & ((F.max("seq") - F.min("seq") + 1) == F.count(F.lit(1)))
            ).alias("complete"),
        )
    )


def frame_transactions(df: DataFrame) -> DataFrame:
    """Add BEGIN/COMMIT framing rows around each transaction
    (LogFileGenerator.writeBegin :624 / writeCommit :713 — the binlog's
    txn envelope). Output = events ∪ frames with ``frame_rank``
    (0=BEGIN, 1=event, 2=COMMIT) and ``txn_commit_tso`` columns.

    Transactions are emitted WHOLE, ordered by commit TSO — interleaved
    event times across concurrent transactions do not interleave the output
    (the reference's Sorter releases txns in commit order, Sorter.java:43-130,
    and the dumper writes them contiguously). Sort key for the file layout:
    ``(txn_commit_tso, frame_rank, tso)``. One groupBy for the boundaries
    (map-side combinable) + one join; no per-row state.
    """
    bounds = df.groupBy("txn_id").agg(
        F.min("tso").alias("begin_tso"), F.max("tso").alias("txn_commit_tso")
    )
    ev_cols = [c for c in df.columns if c != "txn_id"]

    def frame_rows(kind: str, tso_col: str, rank: int) -> DataFrame:
        row = bounds.select(
            F.col(tso_col).alias("tso"),
            F.col("txn_id"),
            F.col("txn_commit_tso"),
            *[F.lit(None).cast(df.schema[c].dataType).alias(c) for c in ev_cols if c != "tso"],
        )
        return row.withColumn("action", F.lit(kind)).withColumn(
            "frame_rank", F.lit(rank).cast("int")
        )

    events = df.join(bounds.select("txn_id", "txn_commit_tso"), "txn_id").withColumn(
        "frame_rank", F.lit(1).cast("int")
    )
    begins = frame_rows("BEGIN", "begin_tso", 0)
    commits = frame_rows("COMMIT", "txn_commit_tso", 2)
    return events.unionByName(begins.select(events.columns)).unionByName(
        commits.select(events.columns)
    )


def align_stream_start(df: DataFrame) -> DataFrame:
    """Multi-stream start alignment (extractor/MultiStreamStartTsoWindow.java):
    when N source streams come up, each reports the first TSO it can serve;
    consumption starts at the MAX over sources of those start TSOs (the
    ``getFilterTSO`` semantics), so every source is guaranteed to cover the
    merged range — events below the aligned start are dropped.

    One aggregation producing a single-row frame, broadcast back as a
    filter — no driver collect, no second scan shuffle.
    """
    starts = df.groupBy("source_id").agg(F.min("tso").alias("_start_tso"))
    aligned = starts.agg(F.max("_start_tso").alias("_aligned_tso"))
    return (
        df.join(F.broadcast(aligned))
        .filter(F.col("tso") >= F.col("_aligned_tso"))
        .drop("_aligned_tso")
    )


def heartbeat_epochs(df: DataFrame, epoch: str = "1 hour") -> DataFrame:
    """Epoch alignment report (HeartBeatWindow.java:30-71; emission gated on
    all sources reaching the epoch — LogEventMerger.checkHeartbeatWindow:203-236).

    Batch form: tumbling window per epoch × source; ``sources_seen`` per epoch
    is the completeness condition (streaming form = the watermark itself:
    Spark's global watermark is min over sources, exactly the reference's
    gate)."""
    epoch_col = F.window(F.col("ts"), epoch).start.alias("epoch_start")
    per_epoch = df.groupBy(F.window(F.col("ts"), epoch)).agg(
        F.countDistinct("source_id").alias("sources_seen"),
        F.count(F.lit(1)).alias("n_events"),
        F.min("tso").alias("min_tso"),
        F.max("tso").alias("max_tso"),
    )
    return per_epoch.select(
        F.col("window.start").alias("epoch_start"),
        "sources_seen",
        "n_events",
        "min_tso",
        "max_tso",
    )


def txn_integrity_report(df: DataFrame, expected: int = 5) -> DataFrame:
    """Transaction-integrity audit of a (possibly filtered) stream: per db,
    how many transactions survive complete vs with holes, and how many
    member events are missing overall.

    The reference's dumper refuses to emit a transaction whose event
    sequence has holes (TxnBuffer completeness — polardbx-cdc-storage/
    .../TxnBufferIterator.java iterates 0..n-1 in order; a miss is fatal),
    and every filter stage must preserve per-txn contiguity. This audit is
    the batch form of that guard: group by txn, compare the observed
    member count against the span implied by min/max seq and against the
    ``expected`` full size. One map-side-combined shuffle on txn_id, then
    a tiny re-agg on the size bucket — no windows, no joins, scan-shaped
    at 100 TB.

    Output: the distribution of surviving transaction sizes —
    ``(n_present, n_txns, n_with_internal_holes, n_missing_events)``."""
    per_txn = df.groupBy("txn_id").agg(
        F.count(F.lit(1)).alias("n_present"),
        F.min("seq").alias("min_seq"),
        F.max("seq").alias("max_seq"),
    )
    holes = F.col("max_seq") - F.col("min_seq") + 1 - F.col("n_present")
    return (
        per_txn.select(
            "n_present",
            F.when(holes > 0, 1).otherwise(0).alias("has_hole"),
            (F.lit(expected) - F.col("n_present")).alias("n_missing"),
        )
        .groupBy("n_present")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_txns"),
            F.sum("has_hole").cast("long").alias("n_with_internal_holes"),
            F.sum("n_missing").cast("long").alias("n_missing_events"),
        )
        .orderBy("n_present")
    )
