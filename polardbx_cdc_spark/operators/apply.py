"""Appliers: last-image merge (dedup) and replay-to-state.

Reference: MergeTransactionApplier.java:21-107 / MergeApplier.java:46-94
(per-PK chain collapse before batched REPLACE/DELETE), RowKey semantics
(rpl/applier/RowKey.java), and the split/parallel applier family (§2.11).

Spark disposition: per-PK "last image" is a keyed aggregation with
``max_by(struct(...), order_key)`` — ONE shuffle with map-side partial
aggregation. That beats the row_number()-window formulation at scale
(window requires a full sort of every partition; max_by is a hash agg).
Per-key ordering for parallel apply is `repartition(pk)` — Spark guarantees
all rows of a key land in one partition, the reference's PK-disjoint queues
(SplitApplier.java:52-92) for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: the deterministic per-PK chain order (TSO is globally unique per event)
_ORD = "tso"


def last_image(df: DataFrame, keys: tuple[str, ...] = ("db", "tbl", "pk")) -> DataFrame:
    """Collapse each per-PK chain to its final image + action
    (MergeTransactionApplier.mergeSend :50-105).

    Output: keys + last_tso, last_action, first_action, n_changes, value
    (the final ``value`` payload). ``first_action`` lets the caller rewrite
    the collapsed op: INSERT-then-UPDATEs → INSERT(last image), chain ending
    in DELETE → DELETE.
    """
    ord_col = F.col(_ORD)
    return (
        df.groupBy(*[F.col(k) for k in keys])
        .agg(
            F.max(_ORD).alias("last_tso"),
            F.max_by("action", ord_col).alias("last_action"),
            F.min_by("action", ord_col).alias("first_action"),
            F.count(F.lit(1)).alias("n_changes"),
            F.max_by("value", ord_col).alias("value"),
        )
    )


def last_image_salted(
    df: DataFrame,
    keys: tuple[str, ...] = ("db", "tbl", "pk"),
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-resistant last-image collapse for zipf-hot PKs.

    The plain groupBy sends every event of a hot key to ONE reducer. The
    collapse is associative (max/max_by/min_by/count all are), so it splits
    into two stages: stage 1 groups by (keys, salt) — a hot key fans out
    across ``salt_buckets`` reducers — stage 2 merges the tiny per-salt
    partials. Same result as ``last_image`` (asserted in tests), bounded
    reducer load at any skew.
    """
    ord_col = F.col(_ORD)
    # salt must be DETERMINISTIC per row: a nondeterministic salt (e.g. from
    # monotonically_increasing_id) re-buckets rows when a failed stage is
    # recomputed, duplicating/losing partials. tso is unique per event, so
    # hashing it spreads a hot key evenly AND is stable across task retries.
    salt = F.pmod(F.xxhash64(F.col(_ORD)), F.lit(salt_buckets))
    stage1 = (
        df.withColumn("_salt", salt)
        .groupBy(*[F.col(k) for k in keys], F.col("_salt"))
        .agg(
            F.max(_ORD).alias("p_last_tso"),
            F.max_by("action", ord_col).alias("p_last_action"),
            F.min_by("action", ord_col).alias("p_first_action"),
            F.min(_ORD).alias("p_first_tso"),
            F.count(F.lit(1)).alias("p_n"),
            F.max_by("value", ord_col).alias("p_value"),
        )
    )
    p_ord = F.col("p_last_tso")
    return (
        stage1.groupBy(*[F.col(k) for k in keys])
        .agg(
            F.max("p_last_tso").alias("last_tso"),
            F.max_by("p_last_action", p_ord).alias("last_action"),
            F.min_by("p_first_action", F.col("p_first_tso")).alias("first_action"),
            F.sum("p_n").alias("n_changes"),
            F.max_by("p_value", p_ord).alias("value"),
        )
    )


def collapse_ops(df: DataFrame, keys: tuple[str, ...] = ("db", "tbl", "pk")) -> DataFrame:
    """Last-image merge with action rewrite (MergeTransactionApplier.java:50-105):
    chain ends in DELETE → one DELETE; chain started with INSERT → one
    INSERT carrying the final image; otherwise one UPDATE (final image)."""
    li = last_image(df, keys)
    op = (
        F.when(F.col("last_action") == "DELETE", F.lit("DELETE"))
        .when(F.col("first_action") == "INSERT", F.lit("INSERT"))
        .otherwise(F.lit("UPDATE"))
    )
    return li.select(*keys, F.col("last_tso"), op.alias("op"), "value", "n_changes")


def replay_to_state(df: DataFrame, keys: tuple[str, ...] = ("db", "tbl", "pk")) -> DataFrame:
    """Replay the full chain per PK → surviving final state
    (the semantics a downstream MERGE INTO / REPLACE applier produces —
    ApplyHelper.java:553-601). Rows whose final action is DELETE vanish."""
    li = last_image(df, keys)
    return li.filter(F.col("last_action") != "DELETE").select(
        *keys, F.col("last_tso"), F.col("value")
    )


def apply_to_snapshot(
    snapshot: DataFrame,
    cdc: DataFrame,
    keys: tuple[str, ...] = ("pk",),
) -> DataFrame:
    """Initial snapshot + CDC stream → final table state (full-copy then
    incremental apply — the FULL_COPY → INC_COPY FSM,
    rpl/common/fsmutil/DataImportTransitions.java:34-94).

    The snapshot is unioned in as epoch-0 INSERTs (tso below any event), then
    a single last-image replay resolves everything — one shuffle total.
    ``snapshot`` must carry the key columns + ``value``.
    """
    snap_as_events = snapshot.select(
        *keys,
        F.lit("0" * 48).alias(_ORD),
        F.lit("INSERT").alias("action"),
        F.col("value"),
    )
    events = cdc.select(*keys, _ORD, "action", "value")
    return replay_to_state(snap_as_events.unionByName(events), keys)


def split_for_parallel_apply(df: DataFrame, num_partitions: int) -> DataFrame:
    """SplitApplier semantics (SplitApplier.java:36-95): partition by PK so
    each key's chain is applied serially within one partition while distinct
    keys apply in parallel. Rows whose identity columns changed (pk in
    ``changed``) must stay serial → routed to partition 0."""
    pk_changed = F.array_contains(F.coalesce(F.col("changed"), F.array()), "pk")
    part = F.when(pk_changed, F.lit(0)).otherwise(
        F.pmod(F.xxhash64("db", "tbl", "pk"), F.lit(num_partitions))
    )
    return df.withColumn("apply_partition", part.cast("int")).repartition(
        num_partitions, "apply_partition"
    )
