#!/usr/bin/env python
"""Headline benchmark: run the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
{"metric": "...", "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from polardbx_cdc_spark import queries as Q  # noqa: E402
from polardbx_cdc_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "cdc_full_pipeline",
    "cdc_replay_state",
    "cdc_last_image",
    "cdc_txn_assemble",
    "cdc_stream_routing",
    "cdc_ddl_replay",
    "cdc_kway_merge_head",
    "checksum_all_types",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_nation_revenue",
    "checksum_lineitem",
    "events_sessionize",
    "events_daily_rollup",
    "text_stats",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_cluster_groups",
    "embed_cosine_topk",
    "media_features",
    "cdc_seek_by_timestamp",
    "curation_quality_filter",
    "curation_pack_sequences",
    # round 4 additions
    "cdc_txn_integrity",
    "cdc_incremental_checksum",
    "rpl_reconcile_repair",
    "curation_mixture_weights",
    "embed_kmeans_assign",
    "embed_pq_codes",
    "q6_forecast_revenue",
    "q13_customer_distribution",
    "q16_supplier_part_count",
    "q19_disjunctive_revenue",
    "curation_chunk_documents",
    # round 5 additions
    "cdc_binlog_wire_roundtrip",
    "lineitem_wire_typed",
    "media_real_decode",
    "q8_market_share",
    "q10_returned_items",
    "q21_waiting_suppliers",
    "cdc_asof_enrich",
    "dedup_lsh_bucket_stats",
    "cdc_watermark_snapshot",
    "sketch_hll_estimate",
    "sketch_cm_heavy_hitters",
    "sketch_hist_quantiles",
    "sketch_bloom_decontaminate",
    "q2_min_cost_supplier",
    "text_bm25_scores",
    "cdc_ivm_agg_view",
    "layout_zorder_orders",
    "stats_analyze_orders",
    "events_json_wire_roundtrip",
    "orders_wire_enum_typed",
    "cdc_replica_lag_report",
    # round 6 additions
    "cdc_ivm_join_view",
    "lineitem_wire_v1_typed",
    "orders_wire_legacy_temporal",
    "text_bpe_pair_stats",
    "events_wire_gtid_stream",
    "dedup_minhash_lsh_xxhash",
    "orders_wire_change_stream_typed",
    # round 7 additions
    "cdc_ivm_join_view_stream",
    "cdc_binlog_wire_compressed",
    "orders_wire_noblob_typed",
    # round 8 additions
    "cdc_binlog_wire_zstd",
    "orders_wire_partial_json",
    "orders_wire_latin1_typed",
    "orders_wire_named_attach",
    "orders_wire_json_diff_computed",
    "orders_json_table_delta",
    # round 9 additions
    "cdc_wire_stream_tail",
    "text_bpe_encode_corpus",
    "cdc_wire_stream_x_tail",
    # round 10 additions
    "cdc_dump_attach_decode",
    "orders_wire_ddl_evolution",
    # round 11 additions
    "orders_wire_typed_stream_evo",
    "cdc_dump_none_checksum_decode",
    # round 12 additions
    "orders_wire_temporal_retype",
    # round 13 additions
    "orders_wire_retype_reverse",
    "orders_wire_gbk_typed",
    "orders_wire_geometry_typed",
    "spatial_cell_join",
    "dedup_chunk_rewrite",
]


def _bench_streaming_pipeline(spark, sf_dir: str) -> tuple[float, int]:
    """End-to-end streaming CDC pipeline throughput: events parquet →
    watermarked CDC stream → ordered rotated binlog sink (AvailableNow)."""
    import shutil
    import tempfile

    from polardbx_cdc_spark.streaming import pipeline, source

    work = tempfile.mkdtemp(prefix="bench_binlog_")
    try:
        t0 = time.perf_counter()
        q, sink = pipeline.run_binlog_pipeline(
            source.cdc_stream(spark, sf_dir), work + "/out", work + "/ckpt"
        )
        q.awaitTermination(400)
        dt = time.perf_counter() - t0
        n = spark.read.parquet(work + "/out").count()
        return dt, n
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _bench_streaming_x_pipeline(spark, sf_dir: str) -> tuple[float, int]:
    """Binlog-X multi-stream pipeline throughput: CDC stream → hash-route
    to 4 streams → per-stream ordered rotated sinks. Tracks the X-sink's
    per-batch cost (the windowed frame is persisted once — stats + write
    share one materialization)."""
    import shutil
    import tempfile

    from polardbx_cdc_spark.operators import routing
    from polardbx_cdc_spark.streaming import pipeline, source

    cfg = routing.StreamRoutingConfig(stream_count=4, default_level="TABLE")
    work = tempfile.mkdtemp(prefix="bench_binlog_x_")
    try:
        t0 = time.perf_counter()
        q, sink = pipeline.run_binlog_x_pipeline(
            source.cdc_stream(spark, sf_dir), cfg, work + "/out", work + "/ckpt"
        )
        q.awaitTermination(400)
        dt = time.perf_counter() - t0
        n = spark.read.parquet(work + "/out").count()
        return dt, n
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _bench_streaming_steady(spark, sf_dir: str, copies: int = 36,
                            files_per_trigger: int = 6) -> dict:
    """Steady-state streaming throughput — the stream_events_per_sec
    source since round 11.

    The single-run pipeline timing above drives ONE availableNow batch,
    so its implied events/sec carries the whole fixed cost of a stream
    START (checkpoint init, state recovery, streaming-plan codegen)
    inside the denominator — r10's official eps read 40.4k from one
    cold batch while the same sink sustained 776–1028 ms per steady
    batch in the multi-batch drive. A production pipeline runs
    UNBOUNDED and amortizes start cost to zero; the honest throughput
    number is the steady-state per-batch rate.

    Method: stage `copies` sequential arrival files — the events table,
    event_id/ts shifted per copy so event time and TSOs stay strictly
    monotone (batch k arrives after batch k-1, like a live tail) — and
    drive them through the SAME run_binlog_pipeline in ONE availableNow
    attach with maxFilesPerTrigger=`files_per_trigger` (a SOURCE option)
    → copies/files_per_trigger micro-batches. eps derives from Spark's
    own StreamingQueryProgress over batches 2..N (batch 1 carries the
    start cost).

    Batch sizing: the sink's per-BATCH fixed cost (range-bounds
    sampling, stats collect, persist bookkeeping, scheduling) measured
    ~1.5 s regardless of rows — a 100k-row batch and a 200k-row batch
    cost the same wall (r11 A/B: 100k/batch → 40-59k eps; 200k/batch →
    101-129k; 300k/batch → 132k; r12 A/B: 600k/batch → 215k median on a
    fresh JVM — the fixed cost keeps amortizing). Six source files per
    trigger (600k rows) is the catch-up batch shape a backlogged
    production tail actually runs; six batches also make the MEDIAN
    estimator robust to the 1-2 GC-spike batches a mid-bench drive
    inherits from the preceding 80 queries. Per-batch row counts and
    durations are recorded in the payload so the number is auditable."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from polardbx_cdc_spark.session import ensure_nanos_readable, normalize_event_ts
    from polardbx_cdc_spark.streaming import pipeline, source

    ensure_nanos_readable(spark)
    work = tempfile.mkdtemp(prefix="bench_steady_")
    try:
        ev = normalize_event_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))
        b = ev.agg(
            F.max(F.unix_micros("ts")).alias("mx"),
            F.min(F.unix_micros("ts")).alias("mn"),
            F.max("event_id").alias("mid"),
        ).collect()[0]
        span_us = int(b["mx"]) - int(b["mn"]) + 1_000_000
        id_span = int(b["mid"]) + 1
        staged = os.path.join(work, "staged")
        ev_dir = os.path.join(staged, "events.parquet")
        os.makedirs(ev_dir)
        now = time.time()
        # stage all copies in ONE Spark job (r13 bench hygiene): the
        # previous per-copy coalesce(1) loop ran 36 sequential
        # single-file writes (~20s of untimed wall that pushed the sf1
        # stress tranche out of the driver's 580s budget). The staged
        # bytes are identical — same rows per file, same file
        # boundaries, same mtime-pinned arrival order — only the write
        # parallelizes. (`_copy` is repartition-keyed so each copy
        # lands as exactly one file under its partition dir.)
        copies_df = spark.range(copies).select(F.col("id").cast("int").alias("_copy"))
        shifted = (
            ev.crossJoin(F.broadcast(copies_df))
            .withColumn("event_id",
                        F.col("event_id") + F.col("_copy") * F.lit(id_span))
            # exact integer-microsecond shift (same math as the old
            # per-copy INTERVAL ... MICROSECOND loop)
            .withColumn("ts", F.timestamp_micros(
                F.unix_micros("ts") + F.col("_copy") * F.lit(span_us)))
        )
        part = os.path.join(work, "parts")
        shifted.repartition(copies, "_copy").write.partitionBy("_copy").parquet(part)
        for i in range(copies):
            pdir = os.path.join(part, f"_copy={i}")
            srcs = [f for f in os.listdir(pdir) if f.endswith(".parquet")]
            assert len(srcs) == 1, f"copy {i}: expected 1 file, got {srcs}"
            dst = os.path.join(ev_dir, f"copy_{i:02d}.parquet")
            os.rename(os.path.join(pdir, srcs[0]), dst)
            # the file source picks files oldest-mtime-first: pin arrival order
            os.utime(dst, (now + i, now + i))

        # drain the PRECEDING workload's garbage before measuring: ~75
        # queries of accumulated old-gen otherwise lands one 8-12s full
        # GC pause inside a random drive batch (observed at <0.7% steal —
        # not interference, OUR heap). A steady-state production pipeline
        # doesn't inherit another workload's garbage; this is measurement
        # hygiene, and the per-batch trace stays in the payload either way.
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:  # noqa: BLE001
            pass
        t0 = time.perf_counter()
        q, sink = pipeline.run_binlog_pipeline(
            source.cdc_stream(spark, staged,
                              max_files_per_trigger=files_per_trigger),
            os.path.join(work, "out"),
            os.path.join(work, "ckpt"),
        )
        finished = q.awaitTermination(600)
        if not finished:
            # timed out mid-drive: stop the query BEFORE reading progress
            # or tearing down its checkpoint/sink dirs (a still-running
            # stream would error against deleted paths), and flag the run
            q.stop()
            raise RuntimeError("steady drive exceeded 600s; timings invalid")
        wall = time.perf_counter() - t0

        progs = []
        for p in q.recentProgress:
            if not isinstance(p, dict):
                p = json.loads(p.json)
            progs.append(p)
        batches = [p for p in progs if p.get("numInputRows", 0) > 0]
        steady = batches[1:] or batches
        rows = sum(p["numInputRows"] for p in steady)
        ms = sum(p["durationMs"].get("triggerExecution", 0) for p in steady)
        n_out = spark.read.parquet(os.path.join(work, "out")).count()
        # HEADLINE rate = MEDIAN steady batch (r12, advisor ask): the
        # best-of-N doctrine fits repeated runs of one identical query,
        # not one pass of heterogeneous micro-batches — taking the single
        # fastest of 4-5 batches systematically overstates SUSTAINED
        # throughput. The median damps both co-tenant bursts (slow
        # outliers) and lucky batches (fast outliers); best/mean ride
        # alongside and the full per-batch trace is in the payload, so
        # the estimator is auditable.
        import statistics

        durs = [p["durationMs"].get("triggerExecution", 0) for p in steady]
        best_ms = min(durs) if durs else 0
        med_ms = statistics.median(durs) if durs else 0
        rpb = rows / len(steady) if steady else 0
        return {
            "events_per_sec": round(rpb / (med_ms / 1000.0), 1) if med_ms else None,
            "events_per_sec_best": round(rpb / (best_ms / 1000.0), 1) if best_ms else None,
            "events_per_sec_mean": round(rows / (ms / 1000.0), 1) if ms else None,
            "batches": len(batches),
            "steady_batches": len(steady),
            "rows_per_batch": int(rows / len(steady)) if steady else 0,
            "steady_ms_per_batch": round(ms / len(steady), 1) if steady else None,
            "first_batch_ms": (
                batches[0]["durationMs"].get("triggerExecution") if batches else None
            ),
            "batch_trace": [
                [p["numInputRows"], p["durationMs"].get("triggerExecution")]
                for p in batches
            ],
            "wall_sec": round(wall, 3),
            "rows_sunk": n_out,
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _section_gc(spark) -> None:
    """Untimed old-gen cleanup at section boundaries (r13 backlog #6 /
    guide §1 hygiene): ~80 queries of accumulated garbage otherwise
    inflates late-section timings with GC pauses charged to whichever
    query runs next. Called strictly BETWEEN sections, never inside a
    timed region — the steady drive already does its own."""
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:  # noqa: BLE001 — hygiene only, never break the bench
        pass


def main() -> None:
    # global wall budget: the driver runs `timeout 580 python bench.py` —
    # every optional section must yield before the hard kill or the JSON
    # line never prints (r11: a clean-JVM stress re-measure overran it)
    t_start = time.perf_counter()
    wall_budget = float(os.environ.get("SPARK_GRAFT_WALL_BUDGET", "560"))

    def wall_left() -> float:
        return wall_budget - (time.perf_counter() - t_start)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("polardbx_cdc_spark-bench")
    registry = Q.queries()

    # warm-up pass: JVM JIT + codegen caches + parquet footers (standard
    # steady-state benchmarking; disable with SPARK_GRAFT_NO_WARMUP=1)
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    if os.environ.get("SPARK_GRAFT_NO_WARMUP", "") != "1":
        for name in HEADLINE:
            try:
                registry[name](spark, sf_dir).count()
            except Exception:
                pass  # reported in the timed loop below

    # one broken query must not zero the whole bench (the round-2 failure
    # class): each query is isolated, failures land in "errors" and the
    # JSON line still prints with every healthy timing
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    total = 0.0
    for name in HEADLINE:
        fn = registry[name]
        # best-of-2: local[32] shares the box with whatever else runs; the
        # min is the steady-state capability, the mean is scheduler noise
        best, n = float("inf"), 0
        try:
            for _ in range(2):
                t0 = time.perf_counter()
                n = fn(spark, sf_dir).count()  # force full execution
                best = min(best, time.perf_counter() - t0)
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"# {name}: FAILED {errors[name]}", file=sys.stderr)
            continue
        timings[name] = round(best, 3)
        total += best
        print(f"# {name}: {best:.3f}s ({n} rows)", file=sys.stderr)

    _section_gc(spark)  # headline loop's garbage must not bill streaming

    # same steady-state methodology as the batch queries: one warm-up run
    # (streaming-plan codegen + state-store init are first-run costs, ~5x
    # the steady rate), then best-of-2 timed runs
    stream_eps = None
    try:
        if os.environ.get("SPARK_GRAFT_NO_WARMUP", "") != "1":
            _bench_streaming_pipeline(spark, sf_dir)
        dt, n = _bench_streaming_pipeline(spark, sf_dir)
        dt2, _ = _bench_streaming_pipeline(spark, sf_dir)
        dt = min(dt, dt2)
        timings["stream_binlog_pipeline"] = round(dt, 3)
        total += dt
        stream_eps = round(n / dt, 1) if dt > 0 else 0.0
        print(f"# stream_binlog_pipeline: {dt:.3f}s ({n} events sunk, {stream_eps} ev/s)", file=sys.stderr)
    except Exception as exc:  # noqa: BLE001
        errors["stream_binlog_pipeline"] = f"{type(exc).__name__}: {exc}"[:300]
        print(f"# stream_binlog_pipeline: FAILED {errors['stream_binlog_pipeline']}", file=sys.stderr)

    # steady-state eps: ONE multi-batch drive, self-warming (batch 1 is
    # excluded from the rate) — this is the official stream_events_per_sec
    steady = None
    try:
        steady = _bench_streaming_steady(spark, sf_dir)
        if steady.get("events_per_sec"):
            stream_eps = steady["events_per_sec"]
        print(
            f"# stream_steady: {steady['events_per_sec']} ev/s over "
            f"{steady['steady_batches']} steady batches "
            f"({steady['rows_per_batch']} rows @ {steady['steady_ms_per_batch']} ms; "
            f"first batch {steady['first_batch_ms']} ms; wall {steady['wall_sec']}s)",
            file=sys.stderr,
        )
    except Exception as exc:  # noqa: BLE001
        print(f"# stream_steady: FAILED {type(exc).__name__}: {exc}", file=sys.stderr)

    try:
        if os.environ.get("SPARK_GRAFT_NO_WARMUP", "") != "1":
            _bench_streaming_x_pipeline(spark, sf_dir)
        dtx, nx = _bench_streaming_x_pipeline(spark, sf_dir)
        dtx2, _ = _bench_streaming_x_pipeline(spark, sf_dir)
        dtx = min(dtx, dtx2)
        timings["stream_binlog_x_pipeline"] = round(dtx, 3)
        total += dtx
        print(
            f"# stream_binlog_x_pipeline: {dtx:.3f}s ({nx} events over 4 streams, "
            f"{round(nx / dtx, 1) if dtx > 0 else 0} ev/s)",
            file=sys.stderr,
        )
    except Exception as exc:  # noqa: BLE001
        errors["stream_binlog_x_pipeline"] = f"{type(exc).__name__}: {exc}"[:300]
        print(f"# stream_binlog_x_pipeline: FAILED {errors['stream_binlog_x_pipeline']}", file=sys.stderr)

    _section_gc(spark)  # streaming sections' garbage must not bill stress

    # ---- sf1 stress section (scale-sensitivity check) -------------------
    # If tools/build_stress_sf1.py has materialized the 10x-scaled dataset,
    # run the scale-sensitive subset once each against it and report the
    # observed time alongside the ratio vs this run's sf0.1 time. Linear
    # operators should land near the scale factor; anything far above it is
    # a constant-factor cliff that would also bite at 100 TB. Never allowed
    # to break the official line: fully wrapped, wall-budgeted, opt-out via
    # SPARK_GRAFT_NO_STRESS=1.
    stress_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".stress_sf1")
    stress: dict | None = None
    if not os.path.isdir(stress_dir) and os.environ.get("SPARK_GRAFT_NO_STRESS", "") != "1":
        # first run on a fresh checkout: materialize the 10x dataset once
        # (~45s on local[32]); subsequent runs reuse it from disk
        try:
            from polardbx_cdc_spark.scaleup import scale_dataset

            t0 = time.perf_counter()
            scale_dataset(spark, sf_dir, stress_dir, 10)
            with open(os.path.join(stress_dir, "MANIFEST"), "w") as f:
                f.write(f"factor=10\nsrc={sf_dir}\n")
            print(f"# stress: built 10x dataset in {time.perf_counter() - t0:.1f}s", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001
            print(f"# stress: dataset build failed: {exc}", file=sys.stderr)
    # ---- section ordering (r12, verdict ask #1): the skew probe and the
    # sf1 stress tranche are the official record's 10x-scale evidence —
    # they run BEFORE the clean-JVM re-measures, which are corroboration
    # and clip first when wall runs short (r11: the old order clipped the
    # stress tranche to 2 of 14 queries inside the driver's 580s).
    # ---- skew block (hot-key dial) --------------------------------------
    # Does the salted two-stage last-image collapse actually protect against
    # a zipf head, and how hot do the LSH band buckets run on real text?
    # synthetic_cdc_batch routes 90% of 2M events onto ONE (db,tbl,pk);
    # worst reducer of the plain groupBy sees 1.8M rows, the salted path
    # caps it at hot/16. lsh_bucket_stats measures the band shuffle the
    # dedup actually performs (sf1 documents when the stress dataset
    # exists, else sf0.1).
    skew: dict | None = None
    if os.environ.get("SPARK_GRAFT_NO_SKEW", "") != "1" and wall_left() > 45:
        try:
            from polardbx_cdc_spark.functions.dedupe import lsh_bucket_stats
            from polardbx_cdc_spark.operators import apply as apply_ops
            from polardbx_cdc_spark.stress import synthetic_cdc_batch

            hot_pct, n_rows = 90, 2_000_000
            hot_df = synthetic_cdc_batch(spark, n_rows, hot_key_pct=hot_pct)
            uniform_df = synthetic_cdc_batch(spark, n_rows, hot_key_pct=0)
            labels = (
                ("last_image_unsalted", apply_ops.last_image, hot_df),
                ("last_image_salted", apply_ops.last_image_salted, hot_df),
                # the PRODUCTION path since r12: ReplicaTableSink's
                # per-batch replay routes through this gate (plan-stats
                # floor → sampled probe → salt only at straggler-scale
                # chains) at the applier layer, where batches are
                # MATERIALIZED; analytical pipelines stay ungated (the
                # probe would re-execute their upstream — PERF_R12).
                # Must sit at ratio ≤~1.0 on BOTH inputs (r10 verdict #6)
                ("last_image_adaptive", apply_ops.last_image_adaptive, hot_df),
                ("uniform_unsalted", apply_ops.last_image, uniform_df),
                ("uniform_adaptive", apply_ops.last_image_adaptive, uniform_df),
            )
            # PAIRED interleave (r12): the A/B ratios compare ~0.5s
            # timings whose 50ms box drift flips a ≤1.0 bar when each
            # side is measured in its own window — run every label once
            # per repetition so drift hits both sides of each ratio
            # equally, then take the per-label best of 3
            best_t = {label: float("inf") for label, _f, _d in labels}
            for _rep in range(3):
                for label, fn, df_in in labels:
                    t0 = time.perf_counter()
                    fn(df_in).count()
                    best_t[label] = min(
                        best_t[label], time.perf_counter() - t0)
            skew_t = {k: round(v, 3) for k, v in best_t.items()}
            ratio = (
                round(skew_t["last_image_salted"] / skew_t["last_image_unsalted"], 2)
                if skew_t["last_image_unsalted"] > 0
                else None
            )
            adaptive_ratio = (
                round(skew_t["last_image_adaptive"] / skew_t["last_image_unsalted"], 2)
                if skew_t["last_image_unsalted"] > 0
                else None
            )
            adaptive_ratio_uniform = (
                round(skew_t["uniform_adaptive"] / skew_t["uniform_unsalted"], 2)
                if skew_t["uniform_unsalted"] > 0
                else None
            )
            docs_dir = stress_dir if os.path.isdir(stress_dir) else sf_dir
            docs = spark.read.parquet(os.path.join(docs_dir, "documents.parquet"))
            lsh_row = lsh_bucket_stats(docs).collect()[0].asDict()
            lsh_row = {k: (float(v) if v is not None else None) for k, v in lsh_row.items()}
            skew = {
                "hot_key_pct": hot_pct,
                "rows": n_rows,
                "timings": skew_t,
                "salted_over_unsalted": ratio,
                "adaptive_over_unsalted": adaptive_ratio,
                "adaptive_over_unsalted_uniform": adaptive_ratio_uniform,
                "lsh_buckets": {"sf_dir": os.path.basename(docs_dir), **lsh_row},
            }
            print(
                f"# skew: last_image unsalted={skew_t['last_image_unsalted']}s "
                f"salted={skew_t['last_image_salted']}s (ratio {ratio}) | "
                f"lsh worst_ratio_milli={lsh_row['worst_ratio_milli']} "
                f"max={lsh_row['max_bucket']}",
                file=sys.stderr,
            )
        except Exception as exc:  # noqa: BLE001
            print(f"# skew block failed: {exc}", file=sys.stderr)

    if os.path.isdir(stress_dir) and os.environ.get("SPARK_GRAFT_NO_STRESS", "") != "1":
        # MUST-HAVE tranche first (r11 verdict #1's minimum official
        # 10x evidence): the TPC-H anchors, both dedup rows, and the
        # skew-relevant collapse — if the wall clips, these survived
        STRESS_SET = [
            "q1_pricing_summary",
            "q3_shipping_priority",
            "dedup_minhash_lsh",
            "dedup_exact",
            "cdc_last_image",
            "dedup_cluster_groups",
            # -- the rest, cheapest-information-first ----------------
            "q5_nation_revenue",
            "cdc_full_pipeline",
            "cdc_txn_assemble",
            "events_sessionize",
            "text_stats",
            "embed_cosine_topk",
            "curation_quality_filter",
            # round 4: kmeans is driver-planning-dominated at sf0.1 — the
            # stress ratio proves the cost is flat in data size
            "embed_kmeans_assign",
            "cdc_incremental_checksum",
            "curation_chunk_documents",
            "q19_disjunctive_revenue",
            # round 7: join-view IVM — one fact fold + broadcast dim
            # delta; the ratio proves the fold is linear in data size
            "cdc_ivm_join_view",
            # round 9: the JSON changefeed's full-outer-join shape gets
            # the same 10x-data scrutiny as the dedup tier
            "orders_json_table_delta",
            # round 13: the grid-cell spatial join (big side must stay
            # one scan — a hidden rejoin would blow up at 10x) and the
            # chunk-dedup rewrite (agg + semi join, linear in chunks)
            "spatial_cell_join",
            "dedup_chunk_rewrite",
        ]
        try:
            factor = 10.0
            try:
                with open(os.path.join(stress_dir, "MANIFEST")) as f:
                    for line in f:
                        if line.startswith("factor="):
                            factor = float(line.strip().split("=", 1)[1])
            except OSError:
                pass
            _section_gc(spark)  # skew probe's 2M-row garbage, untimed
            s_timings: dict[str, float] = {}
            s_ratio: dict[str, float] = {}
            # skew already ran; only JSON emission (~0s) and the clean
            # re-measures (which clip FIRST) remain — reserve 30s
            budget_s, t_sec0 = min(300.0, max(0.0, wall_left() - 30.0)), time.perf_counter()
            for name in STRESS_SET:
                if time.perf_counter() - t_sec0 > budget_s:
                    print(f"# stress: wall budget hit, skipping from {name}", file=sys.stderr)
                    break
                try:
                    t0 = time.perf_counter()
                    registry[name](spark, stress_dir).count()
                    dt = time.perf_counter() - t0
                except Exception as exc:  # noqa: BLE001
                    print(f"# stress {name}: FAILED {exc}", file=sys.stderr)
                    continue
                s_timings[name] = round(dt, 3)
                if name in timings and timings[name] > 0:
                    s_ratio[name] = round(dt / timings[name], 1)
                print(
                    f"# stress {name}: {dt:.3f}s ({s_ratio.get(name, '?')}x sf0.1)",
                    file=sys.stderr,
                )
            if time.perf_counter() - t_sec0 <= budget_s:
                try:
                    dt, n = _bench_streaming_pipeline(spark, stress_dir)
                    s_timings["stream_binlog_pipeline"] = round(dt, 3)
                    if timings.get("stream_binlog_pipeline", 0) > 0:
                        s_ratio["stream_binlog_pipeline"] = round(
                            dt / timings["stream_binlog_pipeline"], 1
                        )
                    print(
                        f"# stress stream_binlog_pipeline: {dt:.3f}s ({n} events)",
                        file=sys.stderr,
                    )
                except Exception as exc:  # noqa: BLE001
                    print(f"# stress stream_binlog_pipeline: FAILED {exc}", file=sys.stderr)
            stress = {
                "factor": factor,
                "queries": s_timings,
                "ratio_vs_base": s_ratio,
                "total": round(sum(s_timings.values()), 3),
            }
            # ---- clean-JVM re-measure (self-proving stress numbers) -----
            # Shared-JVM stress timings drift ±35% round-over-round from GC/
            # JIT state accumulated across the 60+ preceding queries (the
            # r5→r6 "regressions" PERF_BISECT_r6.md debunked were exactly
            # this). Re-measure the worst-ratio queries in FRESH
            # subprocess JVMs (tools/bisect_stress.py methodology: warm-up
            # + best-of-2) and record them beside the shared numbers so a
            # cross-round perf claim never needs a manual bisect again.
            if os.environ.get("SPARK_GRAFT_NO_CLEAN", "") != "1":
                import subprocess

                tool = os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "tools", "bisect_stress.py",
                )
                # registry queries only: the pipeline stress names have no
                # bisect_stress entry point (their clean twin is the
                # fresh-JVM pipeline run itself)
                # paired probes cost ~2× a single-sided one (both scales
                # in the JVM), so the tranche is 3 deep — depth lives in
                # the standalone adjudications (PERF_R13.md), the bench
                # record carries the like-for-like corroboration
                worst = [
                    n for n in sorted(s_ratio, key=lambda k: -s_ratio[k])
                    if n in registry
                ][:3]
                # round-9 newcomer: always clean-measure the delta
                # operator until it has a cross-round clean baseline
                if "orders_json_table_delta" in s_timings \
                        and "orders_json_table_delta" not in worst:
                    worst.append("orders_json_table_delta")
                clean_t: dict[str, float] = {}
                clean_base: dict[str, float] = {}
                clean_ratio: dict[str, float] = {}
                # the clean re-measures are corroboration, not primary
                # evidence — they take whatever wall is left (minus JSON
                # emission headroom) and are the FIRST section to clip
                # the subprocess must ALSO respect the remaining wall:
                # a cap exceeding the wall overruns the driver's hard
                # kill and loses the whole JSON line (r12 attempt-1
                # rc=124 was exactly this)
                sub_timeout = min(240.0, max(5.0, wall_left() - 15.0))
                try:
                    # PAIRED clean/clean probes (r12 verdict ask #2): the
                    # base dir rides along so the subprocess measures
                    # both scales interleaved — clean_ratio_vs_base now
                    # divides like-JVM by like-JVM (the mixed clean-sf1 /
                    # shared-sf0.1 arithmetic manufactured the 8.7/7.8
                    # outliers PERF_R12/R13 adjudicated). ALL probes
                    # share ONE fresh JVM (comma-joined names): per-query
                    # subprocesses spent ~15s/query on session start and
                    # clipped against the wall. On timeout, already-
                    # flushed per-query lines are still parsed.
                    out = subprocess.run(
                        [sys.executable, tool, ",".join(worst), stress_dir,
                         "1", sf_dir],
                        capture_output=True, text=True, timeout=sub_timeout,
                    )
                    lines = out.stdout.strip().splitlines()
                except subprocess.TimeoutExpired as exc:
                    lines = (exc.stdout or "").strip().splitlines()
                    print("# stress clean: wall budget hit mid-batch",
                          file=sys.stderr)
                except Exception as exc:  # noqa: BLE001
                    lines = []
                    print(f"# stress clean: FAILED {exc}", file=sys.stderr)
                for line in lines:
                    try:
                        rec = json.loads(line)
                        name = rec["query"]
                        clean_t[name] = rec["best"]
                        clean_base[name] = rec["base_best"]
                        clean_ratio[name] = rec["ratio_best"]
                        print(
                            f"# stress clean {name}: {rec['best']:.3f}s "
                            f"(clean base {rec['base_best']}s, shared "
                            f"{s_timings.get(name)}s, {rec['ratio_best']}x "
                            f"clean/clean, steal {rec.get('steal_ticks')})",
                            file=sys.stderr,
                        )
                    except (ValueError, KeyError):
                        continue
                if clean_t:
                    stress["clean"] = clean_t
                    stress["clean_base"] = clean_base
                    stress["clean_ratio_vs_base"] = clean_ratio
        except Exception as exc:  # noqa: BLE001
            print(f"# stress section failed: {exc}", file=sys.stderr)

    if skew is not None:
        if stress is not None:
            stress["skew"] = skew
        else:
            stress = {"skew": skew}

    families_full: dict[str, float] = {}
    for _fn, _ft in timings.items():
        _fam = "tpch" if _fn[0] == "q" and _fn[1].isdigit() else _fn.split("_", 1)[0]
        families_full[_fam] = round(families_full.get(_fam, 0.0) + _ft, 3)
    payload = {
        "metric": "headline_queries_total_time",
        # per-family sums moved here from the summary line (r14): the
        # summary's budget now carries per-query timings instead
        "families": families_full,
        # end-to-end streaming throughput (events/sec through the full
        # watermarked merge + ordered rotated binlog sink) — the axis the
        # reference is judged on (throughput/delay, BASELINE.md)
        "stream_events_per_sec": stream_eps,
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # a failed query's time is excluded from "value", so the headline
        # total would silently IMPROVE exactly when coverage regresses —
        # cross-round comparisons must check equal n_queries_timed first
        "n_queries_timed": len(timings),
        "n_queries_expected": len(HEADLINE) + 2,  # +2: stream_binlog{,_x}_pipeline
    }
    if steady:
        payload["stream_steady"] = steady
    if stress:
        payload["stress"] = stress
    if errors:
        payload["errors"] = errors
        # make regressed coverage impossible to miss: a penalty entry per
        # failure (10s each) in a separate field, NOT mixed into "value"
        payload["value_with_failure_penalty"] = round(total + 10.0 * len(errors), 3)

    # Full payload: printed (for whole-stdout parsers) AND persisted in-repo.
    # The driver artifact keeps only the LAST 2000 chars of output, which in
    # round 5 truncated the (long) payload line into unparseable JSON and
    # lost 40 of 57 base timings. Defense: write the complete JSON to
    # BENCH_full.json, then print a compact (<1500 char) summary as the
    # FINAL line so the 2000-char tail always carries parseable headline
    # numbers — totals, per-family sums, worst-5, stress/skew headlines.
    print(json.dumps(payload))
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_full.json")
    try:
        with open(full_path, "w") as fh:
            json.dump(payload, fh, indent=1, sort_keys=True)
    except OSError as exc:
        print(f"# BENCH_full.json write failed: {exc}", file=sys.stderr)

    summary = {
        "metric": payload["metric"],
        "value": payload["value"],
        "unit": "sec",
        "sf": payload["sf"],
        "n_queries_timed": len(timings),
        "n_queries_expected": payload["n_queries_expected"],
        "stream_events_per_sec": stream_eps,
        "full_payload": "BENCH_full.json",
    }
    if stress and stress.get("queries"):
        summary["stress_total"] = stress["total"]
        summary["stress_worst_ratio"] = max(stress["ratio_vs_base"].values(), default=None)
        if stress.get("clean_ratio_vs_base"):
            summary["stress_worst_clean_ratio"] = max(
                stress["clean_ratio_vs_base"].values(), default=None
            )
    if stress and stress.get("skew"):
        summary["skew_salted_over_unsalted"] = stress["skew"].get("salted_over_unsalted")
        summary["skew_adaptive_over_unsalted"] = stress["skew"].get("adaptive_over_unsalted")
        summary["skew_adaptive_over_unsalted_uniform"] = stress["skew"].get(
            "adaptive_over_unsalted_uniform"
        )
    if steady:
        summary["stream_steady_ms_per_batch"] = steady.get("steady_ms_per_batch")
    if errors:
        summary["errors_n"] = len(errors)
        summary["value_with_failure_penalty"] = payload["value_with_failure_penalty"]
        # failed-query names + truncated messages in the parsed line so
        # the driver's comparator can list newly-failing queries without
        # the full payload
        summary["errors"] = {k: str(v)[:60] for k, v in errors.items()}

    # Per-query timings IN the final (parsed) line — r13 harness-contract
    # gap: the driver parses JSON only from the last 2000 chars of stdout
    # (round-5 artifact: a >2000-char line truncates head-first and parses
    # as nothing), and the 86 full query names alone cost 2129 chars, so
    # the COMPLETE dict cannot fit by arithmetic. Include as many entries
    # as fit a 1950-char line, largest time first (deterministic
    # tie-break by name) — covering >90% of total seconds — and make the
    # omission explicit so the totals still reconcile. The complete dict
    # is in the full-payload line above and in BENCH_full.json.
    ordered = sorted(timings.items(), key=lambda kv: (-kv[1], kv[0]))
    included: dict[str, float] = {}
    omitted_n, omitted_sec = len(ordered), sum(t for _, t in ordered)
    summary["queries"] = included
    summary["queries_omitted_n"] = omitted_n
    summary["queries_omitted_sec"] = round(omitted_sec, 2)
    for name, t in ordered:
        trial = dict(summary)
        trial["queries"] = {**included, name: round(t, 2)}
        trial["queries_omitted_n"] = omitted_n - 1
        trial["queries_omitted_sec"] = round(omitted_sec - t, 2)
        if len(json.dumps(trial, separators=(",", ":"))) > 1950:
            break
        included[name] = round(t, 2)
        omitted_n -= 1
        omitted_sec -= t
    summary["queries_omitted_n"] = omitted_n
    summary["queries_omitted_sec"] = round(omitted_sec, 2)

    line = json.dumps(summary, separators=(",", ":"))
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
