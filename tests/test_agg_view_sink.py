"""AggViewSink: durable materialized-view maintenance across micro-batches
must equal the one-shot batch IVM (apply.maintain_agg_view) for ANY batch
split, and replaying a batch after a simulated crash must be idempotent."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from polardbx_cdc_spark.model import derive_cdc_stream
from polardbx_cdc_spark.operators import apply as apply_ops
from polardbx_cdc_spark.streaming.pipeline import AggViewSink

SF = "/root/testdata/sf0.001"


def _ground_truth(spark):
    cdc = derive_cdc_stream(spark, SF)
    return (
        apply_ops.maintain_agg_view(cdc)
        .filter(F.col("n_rows") > 0)
        .orderBy("db", "tbl")
        .collect()
    )


def _run_batched(spark, tmp_path, n_batches):
    cdc = derive_cdc_stream(spark, SF).select(
        "db", "tbl", "pk", "tso", "action", "value"
    )
    sink = AggViewSink(str(tmp_path / f"mv{n_batches}"))
    # deterministic split along the TSO order — exactly what micro-batches
    # of an ordered CDC stream deliver
    rows = cdc.orderBy("tso").collect()
    per = (len(rows) + n_batches - 1) // n_batches
    for i in range(n_batches):
        chunk = rows[i * per : (i + 1) * per]
        if not chunk:
            continue
        batch = spark.createDataFrame(chunk, cdc.schema)
        sink(batch, batch_id=i)
    return sink


def test_single_batch_equals_batch_ivm(spark, tmp_path):
    sink = _run_batched(spark, tmp_path, 1)
    got = sink.view(spark).orderBy("db", "tbl").collect()
    assert got == _ground_truth(spark)


def test_multi_batch_equals_batch_ivm(spark, tmp_path):
    for n in (3, 7):
        sink = _run_batched(spark, tmp_path, n)
        got = sink.view(spark).orderBy("db", "tbl").collect()
        assert got == _ground_truth(spark), f"split into {n} batches diverged"


def test_crash_replay_is_idempotent(spark, tmp_path):
    cdc = derive_cdc_stream(spark, SF).select(
        "db", "tbl", "pk", "tso", "action", "value"
    )
    rows = cdc.orderBy("tso").collect()
    half = len(rows) // 2
    sink = AggViewSink(str(tmp_path / "mv_crash"))
    b0 = spark.createDataFrame(rows[:half], cdc.schema)
    b1 = spark.createDataFrame(rows[half:], cdc.schema)
    sink(b0, batch_id=0)
    sink(b1, batch_id=1)
    # crash-after-commit → the runner redelivers the last batch
    sink(b1, batch_id=1)
    got = sink.view(spark).orderBy("db", "tbl").collect()
    assert got == _ground_truth(spark)


def _dim(spark):
    from polardbx_cdc_spark.session import load_table

    return load_table(spark, SF, "customer").select(
        F.col("c_custkey").cast("string").alias("dim_key"),
        F.col("c_nationkey").cast("long").alias("grp"),
    )


def _join_ground_truth(spark, dim):
    from polardbx_cdc_spark.streaming.pipeline import JoinViewSink  # noqa: F401

    cdc = derive_cdc_stream(spark, SF)
    view = apply_ops.maintain_join_agg_view(cdc, dim, dim_key="dim_key", attrs=("grp",))
    return view.filter(F.col("n_rows") > 0).orderBy("grp").collect()


def test_join_view_sink_multi_batch_equals_batch_ivm(spark, tmp_path):
    from polardbx_cdc_spark.streaming.pipeline import JoinViewSink

    dim = _dim(spark)
    cdc = derive_cdc_stream(spark, SF).select(
        "db", "tbl", "pk", "tso", "action", "value"
    )
    rows = cdc.orderBy("tso").collect()
    for n in (1, 4):
        sink = JoinViewSink(str(tmp_path / f"jv{n}"), dim)
        per = (len(rows) + n - 1) // n
        for i in range(n):
            chunk = rows[i * per : (i + 1) * per]
            if chunk:
                sink(spark.createDataFrame(chunk, cdc.schema), batch_id=i)
        got = sink.view(spark).orderBy("grp").collect()
        assert got == _join_ground_truth(spark, dim), f"{n} batches diverged"


def test_join_view_sink_dim_update_without_fact_rescan(spark, tmp_path):
    """A dimension change folds into the maintained view via the durable
    pk-state (F⋈ΔD) and must equal a from-scratch recompute with the
    UPDATED dim; subsequent batches join the new mapping."""
    from polardbx_cdc_spark.streaming.pipeline import JoinViewSink

    dim = _dim(spark)
    cdc = derive_cdc_stream(spark, SF).select(
        "db", "tbl", "pk", "tso", "action", "value"
    )
    rows = cdc.orderBy("tso").collect()
    half = len(rows) // 2
    sink = JoinViewSink(str(tmp_path / "jvdim"), dim)
    sink(spark.createDataFrame(rows[:half], cdc.schema), batch_id=0)

    delta = dim.filter(F.col("dim_key").cast("long") % 7 == 0).select(
        "dim_key",
        F.col("grp").alias("old_grp"),
        ((F.col("grp") + 7) % 25).alias("new_grp"),
    )
    sink.apply_dim_update(spark, delta)
    sink(spark.createDataFrame(rows[half:], cdc.schema), batch_id=1)

    updated_dim = dim.join(
        delta.select("dim_key", F.col("new_grp")), "dim_key", "left"
    ).select("dim_key", F.coalesce("new_grp", "grp").alias("grp"))
    got = sink.view(spark).orderBy("grp").collect()
    assert got == _join_ground_truth(spark, updated_dim)


def test_untouched_buckets_carried_by_hardlink(spark, tmp_path):
    """Scale contract: a batch touching one key must rewrite ONLY that
    key's bucket; every other bucket directory is carried into the new
    version as hardlinks (same inode), so per-batch I/O ∝ touched keys
    and not state size."""
    import os

    from polardbx_cdc_spark.streaming.pipeline import AggViewSink

    cdc = derive_cdc_stream(spark, SF).select(
        "db", "tbl", "pk", "tso", "action", "value"
    )
    rows = cdc.orderBy("tso").collect()
    sink = AggViewSink(str(tmp_path / "mv_bkt"), n_buckets=16)
    sink(spark.createDataFrame(rows, cdc.schema), batch_id=0)
    v1_pk, _ = sink._paths(sink._current())
    inodes_before = {}
    for b in os.listdir(v1_pk):
        if b.startswith("bucket="):
            for f in os.listdir(os.path.join(v1_pk, b)):
                if f.endswith(".parquet"):
                    inodes_before[(b, f)] = os.stat(
                        os.path.join(v1_pk, b, f)
                    ).st_ino

    base = [r for r in rows if r["action"] != "DELETE"][0]
    one = base.asDict()
    one["tso"] = "9" * 48  # a NEW event past every prior TSO
    one["action"] = "UPDATE"
    one["value"] = 123.45
    batch2 = spark.createDataFrame([tuple(one[c] for c in cdc.columns)], cdc.schema)
    sink(batch2, batch_id=1)
    v2_pk, _ = sink._paths(sink._current())
    assert v2_pk != v1_pk and not os.path.isdir(v1_pk)

    touched_bucket = sink.pk_state(spark).filter(
        (F.col("db") == one["db"]) & (F.col("tbl") == one["tbl"])
        & (F.col("pk") == one["pk"])
    ).collect()[0]["bucket"]
    linked = rewritten = 0
    for (b, f), ino in inodes_before.items():
        new_path = os.path.join(v2_pk, b, f)
        if b == f"bucket={touched_bucket}":
            # touched bucket: rewritten (old files gone or new inodes)
            rewritten += 1
            assert not os.path.exists(new_path) or os.stat(new_path).st_ino != ino
        elif os.path.exists(new_path):
            assert os.stat(new_path).st_ino == ino, (b, f)
            linked += 1
    assert linked > 0, "no untouched bucket was hardlink-carried"
    # and the view stays correct after the touched-bucket-only rewrite:
    # ground truth = batch IVM over the full stream + the new event
    full = rows + [type(base)(**one)]
    cdc_all = spark.createDataFrame(
        [tuple(r[c] for c in cdc.columns) for r in full], cdc.schema
    )
    expected = (
        apply_ops.maintain_agg_view(cdc_all)
        .filter(F.col("n_rows") > 0)
        .orderBy("db", "tbl")
        .collect()
    )
    got = sink.view(spark).orderBy("db", "tbl").collect()
    assert got == expected


def test_streaming_pipeline_wrapper_end_to_end(spark, tmp_path):
    """run_materialized_view_pipeline: the real Structured Streaming
    entry (foreachBatch over the file-stream CDC source) converges to the
    batch IVM ground truth."""
    from polardbx_cdc_spark.streaming import pipeline, source

    q, sink = pipeline.run_materialized_view_pipeline(
        source.cdc_stream(spark, SF),
        str(tmp_path / "mv_stream"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    got = sink.view(spark).orderBy("db", "tbl").collect()
    assert got == _ground_truth(spark)


def test_size_state_buckets_rule():
    """r12 (verdict ask #8): the bucket count derives from observed
    batch volume — commit-cost floor below the parallelism band,
    executor-fit cap above it, write parallelism inside it."""
    from polardbx_cdc_spark.streaming.pipeline import size_state_buckets

    # tiny batch: shrink below parallelism (17ms/bucket-file commit
    # would dominate) — 100k rows / 50k floor = 2 buckets
    assert size_state_buckets(100_000, 32) == 2
    assert size_state_buckets(0, 32) == 1
    assert size_state_buckets(49_999, 32) == 1
    # inside the band: write parallelism wins (one wave of writers)
    assert size_state_buckets(32 * 50_000, 32) == 32
    assert size_state_buckets(10_000_000, 32) == 32
    # huge volume: grow past parallelism so a bucket stays executor-sized
    assert size_state_buckets(32 * 4_000_001 + 7, 32) == 33
    assert size_state_buckets(10**12, 32) == 4096  # file-count sanity cap
    # degenerate parallelism never yields zero buckets
    assert size_state_buckets(10, 0) == 1


def test_auto_bucket_layout_persisted_and_recovered(spark, tmp_path):
    """AUTO mode sizes the layout from the first batch, persists it in
    LAYOUT, and a RE-ATTACHED sink (recovery) adopts the persisted
    layout even when constructed with a different explicit count — the
    on-disk bucket hash is physical truth."""
    from polardbx_cdc_spark.streaming.pipeline import AggViewSink

    state = str(tmp_path / "state")
    sink = AggViewSink(state)  # auto
    assert sink.n_buckets is None
    rows = [("d", "t", f"pk{i}", f"{i:048d}", "INSERT", float(i))
            for i in range(500)]
    df = spark.createDataFrame(
        rows, "db string, tbl string, pk string, tso string, "
              "action string, value double")
    sink(df, batch_id=0)
    assert sink.n_buckets == 1  # 500 rows << 50k floor
    with open(os.path.join(state, "LAYOUT")) as fh:
        assert fh.read().strip() == "1"
    # recovery attach with a DIFFERENT explicit count: LAYOUT wins
    sink2 = AggViewSink(state, n_buckets=64)
    assert sink2.n_buckets == 1
    sink2(df, batch_id=1)  # idempotent refold against the same layout
    view = sink2.view(spark).collect()
    assert len(view) == 1
    assert view[0]["n_rows"] == 500


def test_legacy_state_dir_without_layout_adopts_64(spark, tmp_path):
    """r12 review: a state dir with COMMITTED state but no LAYOUT file
    predates layout persistence — it was hashed under the old 64-bucket
    constant and must keep it (AUTO re-sizing would map every stored
    row to the wrong bucket)."""
    from polardbx_cdc_spark.streaming.pipeline import AggViewSink

    state = str(tmp_path / "legacy")
    sink = AggViewSink(state, n_buckets=64)
    rows = [("d", "t", f"pk{i}", f"{i:048d}", "INSERT", float(i))
            for i in range(100)]
    df = spark.createDataFrame(
        rows, "db string, tbl string, pk string, tso string, "
              "action string, value double")
    sink(df, batch_id=0)
    os.remove(os.path.join(state, "LAYOUT"))  # simulate a pre-r12 dir
    re_attached = AggViewSink(state)  # AUTO constructor on legacy state
    assert re_attached.n_buckets == 64
    with open(os.path.join(state, "LAYOUT")) as fh:
        assert fh.read().strip() == "64"
    re_attached(df, batch_id=1)  # idempotent refold against 64 buckets
    view = re_attached.view(spark).collect()
    assert view[0]["n_rows"] == 100


def test_empty_first_batch_does_not_lock_auto_layout(spark, tmp_path):
    """r12 review: an empty batch in AUTO mode is a state no-op — it
    must NOT size the layout to 1 bucket forever."""
    from polardbx_cdc_spark.streaming.pipeline import AggViewSink

    state = str(tmp_path / "auto")
    sink = AggViewSink(state)
    empty = spark.createDataFrame(
        [], "db string, tbl string, pk string, tso string, "
            "action string, value double")
    sink(empty, batch_id=0)
    assert sink.n_buckets is None
    assert not os.path.exists(os.path.join(state, "LAYOUT"))
    rows = [("d", "t", f"pk{i}", f"{i:048d}", "INSERT", 1.0)
            for i in range(200_000)]
    df = spark.createDataFrame(
        rows, "db string, tbl string, pk string, tso string, "
              "action string, value double")
    sink(df, batch_id=1)
    assert sink.n_buckets == 4  # 200k rows / 50k floor
    assert sink.view(spark).collect()[0]["n_rows"] == 200_000
