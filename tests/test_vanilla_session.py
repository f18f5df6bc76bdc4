"""Guard: queries() must work on a SparkSession this repo did NOT build.

The driver's correctness harness constructs its own vanilla
``SparkSession.builder.getOrCreate()`` — none of the tuned confs from
``session.get_spark`` (nanosAsLong, UTC timezone) exist there. Round 1
lost 31/50 queries to exactly this: ``events.parquet`` is
TIMESTAMP(NANOS) and a vanilla session dies with PARQUET_TYPE_ILLEGAL.

We simulate the driver by taking a ``newSession()`` (isolated SQL conf)
and actively *unsetting* the legacy-parquet conf, then run
events-touching queries end-to-end through the public registry.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod

SF_SMOKE = "/root/testdata/sf0.001"

EVENTS_QUERIES = [
    "cdc_accept_filter",
    "cdc_last_image",
    "events_daily_rollup",
    "cdc_full_pipeline",
    "cdc_ddl_replay",  # driver-side cut-point collects
    "cdc_multi_stream_alignment",
    "events_type_pivot",
    "checksum_all_types",  # orders-derived but registry+typed_images path
]


@pytest.fixture()
def vanilla(spark):
    s = spark.newSession()
    for key in ("spark.sql.legacy.parquet.nanosAsLong",):
        try:
            s.conf.unset(key)
        except Exception:
            pass
    return s


def test_vanilla_session_events_ts_normalizes(vanilla):
    """The driver regenerates testdata across rounds: events.ts has been
    TIMESTAMP(NANOS) (unreadable without nanosAsLong → bigint) and naive
    timestamp[us] (reads as TIMESTAMP_NTZ). load_table must yield a plain
    TIMESTAMP on a vanilla session for EVERY generation."""
    from polardbx_cdc_spark.session import load_table

    df = load_table(vanilla, SF_SMOKE, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    assert df.limit(1).collect()


@pytest.mark.parametrize("name", EVENTS_QUERIES)
def test_registry_query_runs_on_vanilla_session(vanilla, name):
    q = entry_mod.queries()[name]
    df = q(vanilla, SF_SMOKE)
    rows = df.limit(5).collect()
    assert len(rows) >= 0  # must not raise; schema must resolve
    assert df.columns


def test_streaming_source_reads_on_vanilla_session(vanilla):
    from polardbx_cdc_spark.streaming.source import read_events_stream

    stream = read_events_stream(vanilla, SF_SMOKE)
    assert stream.isStreaming
    assert "ts" in stream.columns
