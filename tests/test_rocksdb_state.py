"""RocksDB state store: pin the WORKING configuration for spill-capable
streaming state on a plain local filesystem.

The reference's bounded-memory story is spill-to-disk
(polardbx-cdc-storage/.../TxnBuffer.java:113-560, persistAllThreshold=
0.95); Spark's equivalent is the RocksDB state store provider. Earlier
rounds env-gated it off citing .crc handling on bare local FS; this
suite proves the provider works here (Spark 4.x) on BOTH the stateful
applyInPandasWithState XA-assembly path and a plain streaming
aggregation with multi-batch checkpoint reload, so the gate in
session.py (SPARK_GRAFT_ROCKSDB_STATE=1) is a verified configuration,
not a hope.

The provider class is a runtime SQL conf read at stream start, so these
tests flip it per-query and restore afterwards — no separate session
needed.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from polardbx_cdc_spark.model import derive_cdc_stream
from polardbx_cdc_spark.operators import merge as merge_ops
from polardbx_cdc_spark.streaming import pipeline, source

SF = "/root/testdata/sf0.001"
ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="cdc_rocksdb_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture()
def rocksdb_state(spark):
    prev = spark.conf.get(PROVIDER_KEY, None)
    spark.conf.set(PROVIDER_KEY, ROCKSDB)
    yield
    if prev is None:
        spark.conf.unset(PROVIDER_KEY)
    else:
        spark.conf.set(PROVIDER_KEY, prev)


def _state_store_dirs(ckpt: str) -> list[str]:
    """Paths under <ckpt>/state that RocksDB materialized (zip/changelog
    files prove the provider actually ran, not the HDFS-backed default)."""
    hits = []
    for root, _dirs, files in os.walk(os.path.join(ckpt, "state")):
        for f in files:
            if f.endswith((".zip", ".changelog")):
                hits.append(os.path.join(root, f))
    return hits


def test_rocksdb_stateful_xa_assembly_matches_batch(spark, tmpdir, rocksdb_state):
    """The applyInPandasWithState XA-assembly pipeline, state in RocksDB:
    output must equal the batch twin, and the checkpoint must contain
    RocksDB snapshot/changelog artifacts."""
    ckpt = tmpdir + "/ckpt"
    stream = source.cdc_stream(spark, SF)
    tokens = pipeline.assemble_transactions_stateful(stream)
    q = (
        tokens.writeStream.format("memory")
        .queryName("rocksdb_txn_stream")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.table("rocksdb_txn_stream")
    batch = merge_ops.assemble_transactions(derive_cdc_stream(spark, SF))
    n_complete_batch = batch.filter(F.col("complete") & (F.col("min_seq") == 0)).count()
    assert got.filter(F.col("complete")).count() == n_complete_batch
    joined = got.select(
        "txn_id", F.col("txn_size").alias("got_size")
    ).join(batch, "txn_id")
    assert joined.filter(F.col("got_size") != F.col("txn_size")).count() == 0
    assert _state_store_dirs(ckpt), "no RocksDB state artifacts under checkpoint"


def test_rocksdb_state_survives_restart(spark, tmpdir, rocksdb_state):
    """Multi-batch agg with a stop/restart between batches: RocksDB must
    reload its state from the checkpoint (the exact .crc/local-FS path
    that was previously distrusted) and keep counting correctly."""
    src = tmpdir + "/src"
    ckpt = tmpdir + "/ckpt"
    os.makedirs(src)

    def write_batch(offset: int) -> None:
        spark.range(offset, offset + 100).select(
            F.col("id"), (F.col("id") % 7).alias("k")
        ).write.mode("append").parquet(src)

    def run_once() -> None:
        stream = spark.readStream.schema("id long, k long").parquet(src)
        q = (
            stream.groupBy("k")
            .agg(F.count("*").alias("n"))
            .writeStream.format("memory")
            .queryName("rocksdb_restart")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    write_batch(0)
    run_once()
    write_batch(100)
    run_once()  # second run must LOAD prior RocksDB state, then update it

    totals = {r["k"]: r["n"] for r in spark.table("rocksdb_restart").collect()}
    assert sum(totals.values()) == 200
    # 0..199 mod 7: 200 = 7*28 + 4 → keys 0..3 get 29, keys 4..6 get 28
    assert totals == {k: (29 if k < 4 else 28) for k in range(7)}
    assert _state_store_dirs(ckpt), "no RocksDB state artifacts under checkpoint"
