"""Synthetic token-stream stress harness — the reference's per-stage
stress simulators (FromRpcServerStressSimulator.java:170-179 generates
synthetic TSO tokens at rate; FromMergerStressSimulator, MysqlDumpStressTest)
re-expressed over Structured Streaming's deterministic rate source.

``synthetic_cdc_stream`` turns the ``rate-micro-batch`` source (fixed
rowsPerBatch — reproducible batches, unlike the wall-clock ``rate``
source) into the engine's canonical CDC frame: monotonically increasing
48-char TSOs, txn grouping, db/tbl fan-out, and INSERT/UPDATE/DELETE mix,
all derived arithmetically from the row index — no Python in the loop,
zero data skew unless requested. Feed it to any sink/pipeline to measure
sustained EPS and exercise ordering/framing under load."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def synthetic_cdc_stream(
    spark: SparkSession,
    rows_per_batch: int = 10_000,
    n_dbs: int = 2,
    n_tables: int = 4,
    txn_size: int = 5,
    start_ts: str = "2024-01-15 00:00:00",
    hot_key_pct: int = 0,
) -> DataFrame:
    """A deterministic unbounded CDC stream at ``rows_per_batch`` events
    per micro-batch. ``hot_key_pct`` routes that percentage of events to a
    single (db, tbl, pk) — the skew dial for exercising salted paths."""
    rate = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", str(rows_per_batch))
        .option("startTimestamp", "0")
        .load()
    )
    i = F.col("value")
    # TSO: fixed epoch + index → lexicographically monotone 48-char string
    tso = F.lpad((F.lit(1705276800000000000) + i * 1000).cast("string"), 48, "0")
    hot = (i % 100) < F.lit(hot_key_pct)
    db = F.when(hot, F.lit("db0")).otherwise(F.concat(F.lit("db"), (i % n_dbs).cast("string")))
    tbl = F.when(hot, F.lit("t0")).otherwise(
        F.concat(F.lit("t"), ((i / n_dbs).cast("long") % n_tables).cast("string"))
    )
    pk = F.when(hot, F.lit("hot")).otherwise((i % 1000).cast("string"))
    action = (
        F.when(i % 10 == 0, F.lit("DELETE")).when(i % 3 == 0, F.lit("UPDATE")).otherwise(F.lit("INSERT"))
    )
    val = (i % 997).cast("string")
    return rate.select(
        tso.alias("tso"),
        F.timestamp_micros(
            (F.unix_timestamp(F.lit(start_ts)) * 1_000_000 + i * 1000).cast("long")
        ).alias("ts"),
        (i / txn_size).cast("long").alias("txn_id"),
        (i % txn_size).cast("int").alias("seq"),
        F.lit("stress").alias("source_id"),
        action.alias("action"),
        db.alias("db"),
        tbl.alias("tbl"),
        F.when(action != "INSERT", F.create_map(F.lit("pk"), pk, F.lit("value"), val)).alias(
            "before"
        ),
        F.when(action != "DELETE", F.create_map(F.lit("pk"), pk, F.lit("value"), val)).alias(
            "after"
        ),
        F.array(F.lit("value")).alias("changed"),
        pk.alias("pk"),
    )


def synthetic_cdc_batch(
    spark: SparkSession,
    n_rows: int,
    n_dbs: int = 2,
    n_tables: int = 4,
    n_pks: int = 100_000,
    hot_key_pct: int = 0,
    partitions: int | None = None,
) -> DataFrame:
    """Batch twin of ``synthetic_cdc_stream`` for skew benchmarking: the
    same arithmetic event derivation over ``spark.range``, with
    ``hot_key_pct`` percent of all rows routed onto ONE (db, tbl, pk) —
    the zipf-head dial. Columns match what the last-image appliers consume
    (tso/action/db/tbl/pk/value); no Python in the loop, fully
    reproducible, any size."""
    parts = partitions or spark.sparkContext.defaultParallelism
    i = F.col("id")
    tso = F.lpad((F.lit(1705276800000000000) + i * 1000).cast("string"), 48, "0")
    hot = (i % 100) < F.lit(hot_key_pct)
    db = F.when(hot, F.lit("db0")).otherwise(
        F.concat(F.lit("db"), (i % n_dbs).cast("string"))
    )
    tbl = F.when(hot, F.lit("t0")).otherwise(
        F.concat(F.lit("t"), ((i / n_dbs).cast("long") % n_tables).cast("string"))
    )
    pk = F.when(hot, F.lit("hot")).otherwise((i % n_pks).cast("string"))
    action = (
        F.when(i % 10 == 0, F.lit("DELETE"))
        .when(i % 3 == 0, F.lit("UPDATE"))
        .otherwise(F.lit("INSERT"))
    )
    return spark.range(0, n_rows, 1, parts).select(
        tso.alias("tso"),
        action.alias("action"),
        db.alias("db"),
        tbl.alias("tbl"),
        pk.alias("pk"),
        (i % 997).cast("string").alias("value"),
    )


def run_stress(
    spark: SparkSession,
    sink,
    checkpoint_dir: str,
    batches: int = 5,
    rows_per_batch: int = 10_000,
    timeout_s: int = 180,
    **stream_kw,
) -> dict:
    """Drive ``sink`` (a foreachBatch callable, e.g. ``BinlogSink``) with
    ``batches`` micro-batches of synthetic load; returns throughput stats
    from the query progress — the simulator's EPS readout."""
    import time

    stream = synthetic_cdc_stream(spark, rows_per_batch=rows_per_batch, **stream_kw)
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime="0 seconds")
        .start()
    )
    t0 = time.time()
    target = batches * rows_per_batch
    done = 0
    while time.time() - t0 < timeout_s:
        done = sum(int(p["numInputRows"]) for p in q.recentProgress)
        if done >= target:
            break
        time.sleep(0.2)
    q.stop()
    q.awaitTermination(30)
    wall = time.time() - t0
    return {"events": done, "wall_s": round(wall, 2), "eps": round(done / max(wall, 1e-9))}
