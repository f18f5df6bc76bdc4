"""Alarm monitor semantics (monitoring.py ⟷ LogEventMerger alarm logic):
delay gauge alarm, no-data watchdog with the 2× pre-first-token grace,
and integration with with_stream_metrics progress events."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from polardbx_cdc_spark.monitoring import (
    DELAY_EXCEEDED,
    EMPTY_LOOP,
    AlarmConfig,
    AlarmMonitor,
)


def _progress(batch_id: int, n: int, max_event_ms: int | None = None) -> dict:
    obs = {"n_events": n}
    if max_event_ms is not None:
        obs["max_event_time_ms"] = max_event_ms
    return {"batchId": batch_id, "observedMetrics": {"cdc_metrics": obs}}


def test_delay_alarm_fires_over_threshold():
    m = AlarmMonitor(cfg=AlarmConfig(delay_threshold_ms=1000))
    t0 = 1_700_000_000_000
    assert m.observe_progress(_progress(0, 10, max_event_ms=t0 - 500), t0) == []
    fired = m.observe_progress(_progress(1, 10, max_event_ms=t0 - 5000), t0)
    assert [a.kind for a in fired] == [DELAY_EXCEEDED]
    assert fired[0].value == 5000


def test_nodata_watchdog_doubles_grace_before_first_token():
    cfg = AlarmConfig(nodata_threshold_s=10)
    m = AlarmMonitor(cfg=cfg)
    t0 = 1_700_000_000_000
    # nothing has EVER flowed: limit is 2x threshold (20 s)
    assert m.observe_progress(_progress(0, 0), t0) == []
    assert m.observe_progress(_progress(1, 0), t0 + 15_000) == []
    fired = m.observe_progress(_progress(2, 0), t0 + 21_000)
    assert [a.kind for a in fired] == [EMPTY_LOOP]
    # after data flows, the plain threshold applies from the last pass
    m.observe_progress(_progress(3, 5, max_event_ms=t0 + 22_000), t0 + 22_000)
    assert m.observe_progress(_progress(4, 0), t0 + 30_000) == []
    fired = m.observe_progress(_progress(5, 0), t0 + 33_000)
    assert [a.kind for a in fired] == [EMPTY_LOOP]
    assert fired[0].value > 10


def test_monitor_consumes_real_stream_progress(spark, tmp_path):
    """End-to-end: observe() metrics from a real micro-batch feed the
    monitor and produce a delay alarm for old event times."""
    from polardbx_cdc_spark.streaming import pipeline, source

    stream = source.cdc_stream(spark, "/root/testdata/sf0.001")
    observed = pipeline.with_stream_metrics(stream)
    q = (
        observed.writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    progresses = [p.asDict(recursive=True) if hasattr(p, "asDict") else p for p in q.recentProgress]
    import json
    import time

    progresses = [json.loads(p) if isinstance(p, str) else p for p in progresses]
    m = AlarmMonitor(cfg=AlarmConfig(delay_threshold_ms=60_000))
    now_ms = int(time.time() * 1000)
    for p in progresses:
        m.observe_progress(p, now_ms)
    # events.parquet timestamps are from 2024 — delay alarm must fire
    assert any(a.kind == DELAY_EXCEEDED for a in m.alarms)


def test_metrics_collector_captures_progress(spark, sf_dir):
    """Listener-based metrics: run a bounded stream and the collector must
    surface per-batch throughput rows as a DataFrame."""
    import time

    from polardbx_cdc_spark import monitoring
    from polardbx_cdc_spark.streaming import source as src_mod

    mc = monitoring.MetricsCollector().attach(spark)
    try:
        q = (
            src_mod.cdc_stream(spark, sf_dir)
            .writeStream.format("noop")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # progress events are posted async on the listener bus
        deadline = time.time() + 20
        while time.time() < deadline and not mc.rows:
            time.sleep(0.25)
    finally:
        mc.detach(spark)
    rep = mc.report(spark)
    rows = rep.collect()
    assert rows, "no progress captured"
    assert sum(r["num_input_rows"] for r in rows) > 0
    assert all(r["process_rps"] >= 0.0 for r in rows)
    assert set(rep.columns) == {
        "query_id", "batch_id", "ts", "num_input_rows",
        "input_rps", "process_rps", "state_rows", "watermark",
    }
