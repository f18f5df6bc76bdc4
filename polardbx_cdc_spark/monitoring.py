"""Alarm evaluation over streaming progress — the reference's monitor
surface (BASELINE.md thresholds) expressed over Structured Streaming's
``StreamingQueryProgress`` + ``observe()`` metrics.

Reference semantics ported:
- merge-delay gauge + alarm: delay = now − physical time of the last
  merged TSO, alarmed over ``alarm.delay.threshold``
  (LogEventMerger.doMetricsAfter:347-350; ConfigKeys.java:795).
- no-data watchdog: if data has flowed before, alarm after
  ``alarm.nodata.threshold`` seconds without a pass; if NOTHING has ever
  flowed, the grace period is 2× the threshold
  (LogEventMerger.checkEmptyLoopThreshold:356-373).

The evaluator is pure driver-side bookkeeping over per-batch progress
dicts (constant work per micro-batch, nothing touches the data path);
pair it with ``pipeline.with_stream_metrics`` which emits the
``max_event_time`` gauge the delay alarm reads."""

from __future__ import annotations

from dataclasses import dataclass, field

#: alarm kinds (MonitorType names, reduced)
DELAY_EXCEEDED = "MERGER_STAGE_DELAY_EXCEED_THRESHOLD"
EMPTY_LOOP = "MERGER_STAGE_EMPTY_LOOP_EXCEED_THRESHOLD"


def _to_epoch_ms(v) -> int | None:
    """Accept the gauge as epoch-ms int, datetime, or ISO/Spark timestamp
    string (observe() values arrive as strings in progress JSON)."""
    import datetime as _dt

    if v is None:
        return None
    if isinstance(v, (int, float)):
        return int(v)
    if isinstance(v, _dt.datetime):
        dt = v
    else:
        s = str(v).replace("T", " ").rstrip("Z")
        dt = _dt.datetime.fromisoformat(s)
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=_dt.timezone.utc)
    return int(dt.timestamp() * 1000)


@dataclass
class AlarmConfig:
    """Thresholds; defaults mirror the reference's dynamic-config keys."""

    delay_threshold_ms: int = 60_000  # alarm.delay.threshold
    nodata_threshold_s: int = 30  # alarm.nodata.threshold


@dataclass
class Alarm:
    kind: str
    value: float  # delay ms / nodata seconds
    batch_id: int


@dataclass
class AlarmMonitor:
    """Feed one ``StreamingQueryProgress``-shaped dict per micro-batch;
    collects alarms with the reference's pass/no-pass bookkeeping."""

    cfg: AlarmConfig = field(default_factory=AlarmConfig)
    metrics_name: str = "cdc_metrics"
    start_time_ms: int | None = None
    latest_pass_time_ms: int | None = None
    seen_data: bool = False
    alarms: list[Alarm] = field(default_factory=list)

    def observe_progress(self, progress: dict, now_ms: int) -> list[Alarm]:
        """Evaluate one progress event at time ``now_ms`` (caller supplies
        the clock — keeps replay/testing deterministic). Returns alarms
        raised by THIS event (also appended to ``self.alarms``)."""
        if self.start_time_ms is None:
            self.start_time_ms = now_ms
        fresh: list[Alarm] = []
        batch_id = int(progress.get("batchId", -1))
        obs = (progress.get("observedMetrics") or {}).get(self.metrics_name) or {}
        if hasattr(obs, "asDict"):  # observe() surfaces Rows in recentProgress
            obs = obs.asDict()
        n = int(obs.get("n_events") or progress.get("numInputRows") or 0)

        if n > 0:
            # a pass: update delay gauge vs the batch's newest event time
            self.seen_data = True
            self.latest_pass_time_ms = now_ms
            max_event_ms = _to_epoch_ms(
                obs.get("max_event_time_ms") or obs.get("max_event_time")
            )
            if max_event_ms is not None:
                delay = now_ms - max_event_ms
                if delay > self.cfg.delay_threshold_ms:
                    fresh.append(Alarm(DELAY_EXCEEDED, delay, batch_id))
        else:
            # empty loop: threshold doubles until the first-ever token
            # (checkEmptyLoopThreshold:356-373)
            if self.seen_data:
                nodata_ms = now_ms - (self.latest_pass_time_ms or now_ms)
                limit_ms = self.cfg.nodata_threshold_s * 1000
            else:
                nodata_ms = now_ms - self.start_time_ms
                limit_ms = self.cfg.nodata_threshold_s * 2 * 1000
            if nodata_ms > limit_ms:
                fresh.append(Alarm(EMPTY_LOOP, nodata_ms / 1000, batch_id))

        self.alarms.extend(fresh)
        return fresh


class MetricsCollector:
    """Cluster-wide streaming metrics as a queryable surface: a
    ``StreamingQueryListener`` that captures every micro-batch's progress
    (the reference's MetricsManager reporting loop —
    polardbx-cdc-monitor/.../MetricsManager prints the same gauges from
    its own scheduler) and exposes the history as a DataFrame for the
    admin/metrics queries.

    Listener callbacks run on the driver's listener bus — constant
    bookkeeping per batch, nothing on the data path. ``report(spark)``
    materializes (query_id, batch_id, ts, num_input_rows, input_rps,
    process_rps, state_rows, watermark)."""

    SCHEMA = (
        "query_id string, batch_id long, ts string, num_input_rows long, "
        "input_rps double, process_rps double, state_rows long, watermark string"
    )

    def __init__(self) -> None:
        from pyspark.sql.streaming import StreamingQueryListener

        collector = self

        class _L(StreamingQueryListener):
            def onQueryStarted(self, event):  # noqa: N802
                pass

            def onQueryProgress(self, event):  # noqa: N802
                p = event.progress
                state_rows = sum(s.numRowsTotal for s in p.stateOperators) if p.stateOperators else 0
                collector.rows.append(
                    (
                        str(p.id),
                        int(p.batchId),
                        str(p.timestamp),
                        int(p.numInputRows),
                        float(p.inputRowsPerSecond or 0.0),
                        float(p.processedRowsPerSecond or 0.0),
                        int(state_rows),
                        str((p.eventTime or {}).get("watermark", "")),
                    )
                )

            def onQueryIdle(self, event):  # noqa: N802
                pass

            def onQueryTerminated(self, event):  # noqa: N802
                pass

        self.rows: list[tuple] = []
        self._listener = _L()

    def attach(self, spark) -> "MetricsCollector":
        spark.streams.addListener(self._listener)
        return self

    def detach(self, spark) -> None:
        spark.streams.removeListener(self._listener)

    def report(self, spark):
        return spark.createDataFrame(self.rows or [], self.SCHEMA)
