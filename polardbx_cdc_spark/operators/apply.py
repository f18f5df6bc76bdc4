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


def estimate_top_key_share(
    df: DataFrame,
    keys: tuple[str, ...] = ("db", "tbl", "pk"),
    fraction: float = 0.02,
    seed: int = 7,
) -> tuple[int, int]:
    """One sampled pass → (est_total_rows, est_max_key_rows). The skew
    probe behind the adaptive collapse: a 2% Bernoulli sample, keyed
    count, tiny max — cost is one narrow map + one small agg, no full
    shuffle of the input."""
    row = (
        df.sample(fraction=fraction, seed=seed)
        .groupBy(*[F.col(k) for k in keys])
        .count()
        .agg(F.sum("count").alias("n"), F.max("count").alias("mx"))
        .collect()[0]
    )
    n = int((row["n"] or 0) / fraction)
    mx = int((row["mx"] or 0) / fraction)
    return n, mx


def last_image_adaptive(
    df: DataFrame,
    keys: tuple[str, ...] = ("db", "tbl", "pk"),
    salt_buckets: int = 16,
    hot_rows_threshold: int = 4_000_000,
    sample_fraction: float = 0.02,
    size_floor_bytes: int = 1 << 30,
) -> DataFrame:
    """Skew-GATED last-image collapse (r10 verdict #6): the salt's
    second shuffle stopped paying at the measured floor (bench skew
    probe r10: salted/unsalted = 1.07 even on a 90%-hot input — the
    hash agg absorbs that much skew map-side), so engage it only when a
    sampled probe estimates some key's chain exceeds
    ``hot_rows_threshold`` — the regime where one reducer would hold a
    straggler's worth of rows at cluster scale. Below the threshold the
    plain one-shuffle ``last_image`` runs, so the adaptive path costs
    the probe (one sampled map + tiny agg) and nothing else. Mirrors
    the reference's CONDITIONAL fallback shape (SplitApplier.java:52-92
    drops to serial apply only when PK conflicts demand it). Both
    branches produce identical results (pytest-asserted), so the gate
    is purely a physical-plan decision — exactly what AQE's skew-join
    handling does for joins, applied to the agg the optimizer can't
    rewrite itself.

    The gate is TWO-tier so small batches pay nothing at all: first a
    FREE Catalyst plan-stats check (``optimizedPlan().stats()
    .sizeInBytes`` — no job) skips even the probe when the input is
    under ``size_floor_bytes`` (an input too small to hold a
    straggler-scale chain can't need the salt, and on such inputs the
    probe pass itself would cost more than the collapse — r11 bench:
    probe ≈ 0.2-0.3s on a 2M-row frame whose plain collapse is 0.45s);
    the sampled probe runs only above the floor, where its relative
    cost is negligible. Unknown plan stats surface as Long.MAX and
    conservatively probe."""
    try:
        stats_bytes = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:  # plan stats unavailable → probe (conservative)
        stats_bytes = size_floor_bytes
    if stats_bytes < size_floor_bytes:
        return last_image(df, keys)
    _n, mx = estimate_top_key_share(df, keys, fraction=sample_fraction)
    if mx > hot_rows_threshold:
        return last_image_salted(df, keys, salt_buckets)
    return last_image(df, keys)


def collapse_ops(df: DataFrame, keys: tuple[str, ...] = ("db", "tbl", "pk")) -> DataFrame:
    """Last-image merge with action rewrite (MergeTransactionApplier.java:50-105):
    chain ends in DELETE → one DELETE; chain started with INSERT → one
    INSERT carrying the final image; otherwise one UPDATE (final image).

    Deliberately UNGATED: inside a composed analytical pipeline the skew
    probe would re-execute the whole unmaterialized upstream (r12 A/B:
    +2.5s on cdc_watermark_snapshot — join-inflated plan stats clear the
    floor, then the sampled probe recomputes the derive). Partial
    aggregation already absorbs moderate skew map-side; the adaptive
    gate lives at the applier/sink layer, where batches are
    MATERIALIZED and a probe re-scan is cheap (``replay_to_state(
    adaptive=True)`` — ReplicaTableSink's per-batch replay)."""
    li = last_image(df, keys)
    op = (
        F.when(F.col("last_action") == "DELETE", F.lit("DELETE"))
        .when(F.col("first_action") == "INSERT", F.lit("INSERT"))
        .otherwise(F.lit("UPDATE"))
    )
    return li.select(*keys, F.col("last_tso"), op.alias("op"), "value", "n_changes")


def replay_to_state(df: DataFrame, keys: tuple[str, ...] = ("db", "tbl", "pk"),
                    adaptive: bool = False) -> DataFrame:
    """Replay the full chain per PK → surviving final state
    (the semantics a downstream MERGE INTO / REPLACE applier produces —
    ApplyHelper.java:553-601). Rows whose final action is DELETE vanish.

    ``adaptive=True`` routes the collapse through the skew gate
    (``last_image_adaptive``) — for MATERIALIZED inputs only (persisted
    foreachBatch batches + parquet state, where the probe's re-scan is
    cheap and plan stats are honest); composed analytical pipelines must
    leave it off or the probe re-executes their whole upstream (r12 A/B
    on cdc_watermark_snapshot: 2.3s plain vs 4.9s gated)."""
    li = (last_image_adaptive if adaptive else last_image)(df, keys)
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


def asof_state(
    changes: DataFrame,
    probes: DataFrame,
    keys: tuple[str, ...] = ("db", "tbl", "pk"),
    probe_ord: str = "probe_tso",
    strict: bool = True,
) -> DataFrame:
    """Per-key AS-OF join: for each probe row, the change-stream image in
    effect at ``probe_tso`` (the row a point-in-time reader at that TSO
    would have seen — the reference's flashback/time-travel read primitive,
    RecoveryApplier + polardbx-cdc-rpl flashback task, re-expressed as a
    relational operator Spark lacks natively).

    Spark disposition: NOT a range join (quadratic candidate blowup) and
    NOT a per-probe correlated subquery (re-scans the stream per probe).
    Changes and probes are union-tagged and sorted ONCE per key; a
    last-non-null window carries each change's image forward to the probe
    rows that follow it. One shuffle of (changes + probes), linear work,
    any number of probes per key — the plan that survives 100 TB.

    ``strict`` probes see state from changes with tso < probe_tso
    (pre-image semantics — "what did the row look like just before this
    TSO"); non-strict includes a change at exactly probe_tso. Probe rows
    with no prior change surface NULL action/value (key never existed yet).

    Output: probe keys + probe_tso + asof_tso/asof_action/asof_value of
    the latest qualifying change.
    """
    key_cols = [F.col(k) for k in keys]
    # tag orders a probe BEFORE (strict) or AFTER (non-strict) a change at
    # the identical TSO inside the per-key sort
    probe_tag = 0 if strict else 1
    ch = changes.select(
        *key_cols,
        F.col(_ORD).alias("_ord"),
        F.lit(1 - probe_tag).alias("_tag"),
        F.col(_ORD).alias("_c_tso"),
        F.col("action").alias("_c_action"),
        F.col("value").alias("_c_value"),
    )
    ch_types = dict(changes.dtypes)
    pr = probes.select(
        *key_cols,
        F.col(probe_ord).alias("_ord"),
        F.lit(probe_tag).alias("_tag"),
        F.lit(None).cast(ch_types[_ORD]).alias("_c_tso"),
        F.lit(None).cast(ch_types["action"]).alias("_c_action"),
        F.lit(None).cast(ch_types["value"]).alias("_c_value"),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*key_cols)
        .orderBy("_ord", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = ch.unionByName(pr).select(
        *key_cols,
        "_ord",
        "_tag",
        F.last("_c_tso", ignorenulls=True).over(w).alias("asof_tso"),
        F.last("_c_action", ignorenulls=True).over(w).alias("asof_action"),
        F.last("_c_value", ignorenulls=True).over(w).alias("asof_value"),
    )
    return merged.where(F.col("_tag") == probe_tag).select(
        *keys,
        F.col("_ord").alias(probe_ord),
        "asof_tso",
        "asof_action",
        "asof_value",
    )


def simulate_chunk_reads(
    base: DataFrame,
    cdc: DataFrame,
    watermarks: DataFrame,
    chunk_expr,
    keys: tuple[str, ...] = ("db", "tbl", "pk"),
    read_at: str = "lo_tso",
) -> DataFrame:
    """Materialize what a chunked full-copy reader WOULD see: for every key,
    the surviving row image as of its own chunk's read instant
    (``watermarks[read_at]``), over ``base`` (pre-existing rows, modeled as
    epoch-0 INSERTs) overlaid by the log.

    This stands in for the per-chunk JDBC range ``SELECT`` the reference's
    full extractor issues (MysqlFullProcessor.java:162-244) — in production
    each chunk is one range scan; here the read is reconstructed from
    base + log so tests and oracles can replay it bit-exactly.

    ONE distributed pass for ALL chunks: the per-key read cutoff is resolved
    by computing ``chunk_expr`` per row and broadcast-joining the (tiny)
    watermark table — no per-chunk loop, no repeated replays. Output:
    keys + chunk_id + value (rows alive at the read instant only).
    """
    base_ev = base.select(
        *keys,
        F.lit("0" * 48).alias(_ORD),
        F.lit("INSERT").alias("action"),
        F.col("value"),
    )
    ev = base_ev.unionByName(cdc.select(*keys, _ORD, "action", "value"))
    ev = ev.withColumn("chunk_id", chunk_expr).join(
        F.broadcast(watermarks.select("chunk_id", read_at)), "chunk_id"
    )
    seen = ev.filter(F.col(_ORD) <= F.col(read_at))
    return (
        replay_to_state(seen, keys)
        .withColumn("chunk_id", chunk_expr)
        .select(*keys, "chunk_id", "value")
    )


def watermark_interleave(
    chunk_rows: DataFrame,
    cdc: DataFrame,
    watermarks: DataFrame,
    chunk_expr,
    keys: tuple[str, ...] = ("db", "tbl", "pk"),
) -> DataFrame:
    """DBLog watermark-based chunk selection (Andreadis et al.,
    "DBLog: A Watermark Based Change-Data-Capture Framework",
    arXiv:2010.12597 §4.2) — the algorithm that lets a chunked full copy run
    CONCURRENTLY with the live change stream and still converge to the exact
    final state. The reference runs FULL_COPY and INC_COPY as separate FSM
    stages with validation/reconciliation afterwards
    (DataImportTransitions.java:34-94, MysqlFullExtractor.java); the
    watermark rule removes the need for a quiesced snapshot: it is the
    scale path for 100 TB initial loads, where the copy takes days and the
    stream cannot be paused.

    Rule: chunk ``i`` was read at some instant inside its watermark window
    ``(lo_tso_i, hi_tso_i]``. Any key with a log event in that window is
    UNDECIDABLE against the chunk image (the read may have been before or
    after the event) — drop it; the log is authoritative and replays it.
    Surviving rows are stamped ``hi_tso_i`` so a single last-image replay
    orders them correctly: events ≤ lo lose (already reflected in the
    image), events > hi win (observed after the copy).

    All chunks are resolved in ONE distributed anti-join: the watermark
    table (num_chunks rows) broadcasts; only (keys, tso) shuffles.
    ``chunk_rows``: keys + chunk_id + value (e.g. ``simulate_chunk_reads``
    or a real per-chunk JDBC scan); ``chunk_expr``: Column mapping key
    columns → chunk_id (chunks partition the keyspace).
    Output: surviving chunk rows as INSERT events, unionable with the log.
    """
    wm = F.broadcast(watermarks.select("chunk_id", "lo_tso", "hi_tso"))
    ev = cdc.select(*keys, _ORD).withColumn("chunk_id", chunk_expr).join(wm, "chunk_id")
    touched = (
        ev.filter((F.col(_ORD) > F.col("lo_tso")) & (F.col(_ORD) <= F.col("hi_tso")))
        .select(*keys)
        .distinct()
    )
    surv = chunk_rows.join(touched, list(keys), "left_anti")
    return surv.join(wm, "chunk_id").select(
        *keys,
        F.col("hi_tso").alias(_ORD),
        F.lit("INSERT").alias("action"),
        F.col("value"),
    )


def snapshot_via_watermarks(
    chunk_rows: DataFrame,
    cdc: DataFrame,
    watermarks: DataFrame,
    chunk_expr,
    keys: tuple[str, ...] = ("db", "tbl", "pk"),
) -> DataFrame:
    """Chunked-copy + concurrent log → exact final state, in one replay.

    Convergence law (DBLog §4.2; pinned by tests/test_invariants.py): the
    result equals a straight replay of (pre-existing rows ∪ full log), for
    ANY chunk read instants inside their watermark windows — i.e. the copy
    never has to pause the stream and never needs a reconciliation pass.
    """
    surv = watermark_interleave(chunk_rows, cdc, watermarks, chunk_expr, keys)
    ev = cdc.select(*keys, _ORD, "action", "value")
    return replay_to_state(surv.unionByName(ev), keys)


def maintain_agg_view(cdc: DataFrame, keys: tuple[str, ...] = ("db", "tbl")) -> DataFrame:
    """Incremental view maintenance of per-group COUNT/SUM(value) from
    the change stream alone — no base-table rescan: each event becomes a
    SIGNED delta against the key's reconstructed prior live state, and
    one partial-aggregating groupBy folds the deltas. The per-key deltas
    TELESCOPE, so the maintained view equals the aggregate over the
    replayed final state for ANY stream shape (upsert semantics:
    UPDATE-without-prior creates, DELETE-without-prior is a no-op — the
    MergeApplier REPLACE model, §2.11). Money stays in integer cents per
    the repo's cross-engine rule, so no float accumulation can drift.

    On a real binlog the prior value rides in the event's before-image;
    the harness stream's envelope copies the current value there
    (model.py), so the prior state is reconstructed with ONE per-key
    window — the shuffle a true before-image would avoid.
    Output: keys + n_rows + value_cents."""
    from pyspark.sql import Window

    w = Window.partitionBy("db", "tbl", "pk").orderBy(_ORD)
    cents = F.round(F.col("value") * 100).cast("long")
    post = F.when(F.col("action") != "DELETE", cents)  # live value after event
    sel = list(dict.fromkeys([*keys, "db", "tbl", "pk"]))  # dedup, stable order
    ev = cdc.select(*sel, _ORD, "action", post.alias("_post"))
    ev = ev.withColumn("_prev", F.lag("_post").over(w))
    existed = F.col("_prev").isNotNull()
    d_rows = (
        F.when((F.col("action") != "DELETE") & ~existed, F.lit(1))
        .when((F.col("action") == "DELETE") & existed, F.lit(-1))
        .otherwise(F.lit(0))
    )
    d_cents = F.when(
        F.col("action") == "DELETE", -F.coalesce(F.col("_prev"), F.lit(0))
    ).otherwise(F.col("_post") - F.coalesce(F.col("_prev"), F.lit(0)))
    return ev.groupBy(*keys).agg(
        F.sum(d_rows).cast("long").alias("n_rows"),
        F.sum(d_cents).cast("long").alias("value_cents"),
    )


def maintain_pk_state(cdc: DataFrame) -> DataFrame:
    """Per-PK telescoped deltas from the change stream: (db, tbl, pk,
    n_rows, value_cents) where n_rows ∈ {0, 1} (0 = key ended deleted)
    and value_cents is the live value. Same signed-delta machinery as
    ``maintain_agg_view`` grouped at the PK grain — the fact-side state
    a join-view maintainer needs (one row per touched key, NOT the base
    table)."""
    return maintain_agg_view(cdc, keys=("db", "tbl", "pk"))


def maintain_join_agg_view(
    cdc: DataFrame,
    dim: DataFrame,
    dim_key: str = "dim_key",
    attrs: tuple[str, ...] = ("grp",),
) -> DataFrame:
    """Incremental view maintenance for a JOIN view — the materialized
    downstream table V = SELECT d.attrs, COUNT(*), SUM(cents) FROM
    live(fact) f JOIN dim d ON f.pk = d.key GROUP BY d.attrs — from the
    change stream alone (ΔF ⋈ D: classic delta rule, fact side).

    Plan shape: the per-event signed deltas telescope to ONE row per
    touched PK (``maintain_pk_state``); that delta frame — proportional
    to touched keys, not fact history — joins the dimension. The dim
    side is broadcast when small (plan-gated in tests/test_plans.py);
    at 100 TB with a huge dim the same plan becomes a shuffled hash
    join keyed on pk, still delta-sized on the probe side. Keys with no
    dim match drop (inner-join view semantics); groups that telescope
    to zero live rows are kept (0-row groups) for the caller to filter.

    Reference parity: the maintained downstream table a replica keeps
    per MergeApplier REPLACE semantics, extended to the joined rollup
    (polardbx-cdc-rpl applier family, SURVEY §2.11)."""
    pk_state = maintain_pk_state(cdc)
    joined = pk_state.join(
        F.broadcast(dim), pk_state["pk"] == dim[dim_key], "inner"
    )
    return joined.groupBy(*[dim[a] for a in attrs]).agg(
        F.sum("n_rows").cast("long").alias("n_rows"),
        F.sum("value_cents").cast("long").alias("value_cents"),
    )


def apply_dim_delta_to_join_view(
    view: DataFrame,
    pk_state: DataFrame,
    dim_delta: DataFrame,
    attr: str = "grp",
) -> DataFrame:
    """The OTHER half of join-view maintenance (F ⋈ ΔD): a dimension
    update (key, old_attr, new_attr) moves every live fact row of that
    key from the old group to the new one — without touching the fact
    side's history. ``dim_delta`` is the (small) set of changed dim rows,
    so the correction join BROADCASTS the dim delta against the per-PK
    state (plan-gated); the output is the updated view.

    Columns: ``view`` = (attr, n_rows, value_cents);
    ``dim_delta`` = (dim_key, old_<attr>, new_<attr>)."""
    moved = pk_state.join(
        F.broadcast(dim_delta), pk_state["pk"] == dim_delta["dim_key"], "inner"
    )
    minus = moved.select(
        F.col(f"old_{attr}").alias(attr),
        (-F.col("n_rows")).alias("n_rows"),
        (-F.col("value_cents")).alias("value_cents"),
    )
    plus = moved.select(
        F.col(f"new_{attr}").alias(attr),
        F.col("n_rows"),
        F.col("value_cents"),
    )
    return (
        view.select(attr, "n_rows", "value_cents")
        .unionByName(minus)
        .unionByName(plus)
        .groupBy(attr)
        .agg(
            F.sum("n_rows").cast("long").alias("n_rows"),
            F.sum("value_cents").cast("long").alias("value_cents"),
        )
    )


def json_table_delta(before: DataFrame, after: DataFrame,
                     key: str, doc: str) -> DataFrame:
    """Compact JSON changefeed between two versions of a document table
    — the operator form of PARTIAL_JSON logging (binlog_row_value_options;
    reference surface: the type-39 event family BinlogEventType.java:39):
    per key, INSERT (new), DELETE (gone), or UPDATE with the MINIMAL
    diff-vector `binlog_wire.compute_json_diffs` derives. Unchanged
    documents produce NO row, so the output is the true delta.

    Input ``doc`` columns are JSON text; output:
    ``(key, action, n_ops, ops)`` where ``ops`` is the diff vector as
    JSON text ([{op, path, value}...]) — feed it back through
    `binlog_wire.apply_json_diffs` (ops REPLACE=0/INSERT=1/REMOVE=2) to
    materialize.

    Scale shape: ONE full-outer shuffle join on the key co-locates the
    document pairs; the diff computation is Arrow-batched mapInPandas
    over the joined frame (pure per-row Python on two local documents,
    no state, no driver materialization) — the same posture as the wire
    codec tier. 100 TB = key-partitioned join + embarrassingly parallel
    diffing."""
    import json as _json

    from polardbx_cdc_spark import binlog_wire as BW

    b = before.select(F.col(key).alias("k"), F.col(doc).alias("b_doc"))
    a = after.select(F.col(key).alias("k"), F.col(doc).alias("a_doc"))
    joined = b.join(a, "k", "full_outer")
    key_type = dict(before.dtypes)[key]  # key keeps its input type

    def diff_part(batches):
        import pandas as pd

        for pdf in batches:
            outs = {"key": [], "action": [], "n_ops": [], "ops": []}
            for r in pdf.itertuples():
                b_doc = None if r.b_doc is None else _json.loads(r.b_doc)
                has_b = r.b_doc is not None
                has_a = r.a_doc is not None
                if has_b and not has_a:
                    outs["key"].append(r.k)
                    outs["action"].append("DELETE")
                    outs["n_ops"].append(0)
                    outs["ops"].append(None)
                    continue
                a_doc = _json.loads(r.a_doc)
                if not has_b:
                    outs["key"].append(r.k)
                    outs["action"].append("INSERT")
                    outs["n_ops"].append(0)
                    outs["ops"].append(_json.dumps(a_doc, sort_keys=True))
                    continue
                diffs = BW.compute_json_diffs(b_doc, a_doc)
                if diffs is None:
                    # whole-value replace (type change): one synthetic
                    # root REPLACE — still apply_json_diffs-compatible
                    diffs = BW.JsonDiffVector(
                        [BW.JsonDiff(BW.JSON_DIFF_REPLACE, "$", a_doc)]
                    )
                if not diffs:
                    continue  # unchanged: no delta row
                outs["key"].append(r.k)
                outs["action"].append("UPDATE")
                outs["n_ops"].append(len(diffs))
                outs["ops"].append(_json.dumps(
                    [
                        {"op": d.op, "path": d.path, "value": d.value}
                        for d in diffs
                    ],
                    sort_keys=True,
                ))
            yield pd.DataFrame(outs)

    return joined.mapInPandas(
        diff_part, f"key {key_type}, action string, n_ops int, ops string"
    )
