"""Streaming operators: the same transformation run as a true
streaming query (availableNow + state store) must agree with its
batch execution."""

from __future__ import annotations

import pytest

from php_etl_spark.catalog import Catalog
from php_etl_spark.streaming.events import (
    events_stream,
    run_to_memory,
    tumbling_agg,
    session_agg,
    dedup_keys,
    stateful_counts,
)

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_tumbling_stream_equals_batch(spark):
    batch = tumbling_agg(Catalog(spark, SF).events)
    stream = run_to_memory(tumbling_agg(events_stream(spark, SF)), "complete")
    assert _rows(stream) == _rows(batch)


def test_stateful_stream_equals_batch(spark):
    batch = stateful_counts(Catalog(spark, SF).events)
    stream = run_to_memory(stateful_counts(events_stream(spark, SF)), "complete")
    assert _rows(stream) == _rows(batch)


def test_dedup_stream_equals_batch_distinct(spark):
    ev = Catalog(spark, SF).events
    batch = ev.select("user_id", "event_type").distinct()
    stream = run_to_memory(dedup_keys(events_stream(spark, SF)), "append")
    assert _rows(stream) == _rows(batch)


def test_session_windows_streaming_run(spark):
    """Session windows under real streaming state (update mode needs a
    watermark); counts must equal the batch plan's."""
    sdf = events_stream(spark, SF).withWatermark("ts", "1 hour")
    stream = run_to_memory(session_agg(sdf), "complete")
    batch = session_agg(Catalog(spark, SF).events)
    assert stream.count() == batch.count()


def test_stateful_custom_matches_batch_groupby(spark):
    """applyInPandasWithState final per-key state equals the batch
    aggregate (single availableNow batch → one emit per key)."""
    from pyspark.sql import functions as F

    from php_etl_spark.streaming.events import stateful_session_stats

    ev = Catalog(spark, SF).events
    batch = (
        ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    stream = run_to_memory(
        stateful_session_stats(events_stream(spark, SF)), "update"
    )
    got = {
        (r.user_id): (r.n_events, round(r.total_value, 2))
        for r in stream.collect()
    }
    want = {
        (r.user_id): (r.n_events, round(r.total_value, 2))
        for r in batch.collect()
    }
    assert got == want


def test_checkpointed_sink_exactly_once(spark, tmp_path):
    """Re-running the checkpointed stream against unchanged sources
    appends nothing — engine-level idempotent re-runs."""
    from php_etl_spark.streaming.events import stream_to_parquet

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    src = events_stream(spark, SF).select("event_id", "user_id", "value")
    stream_to_parquet(src, out, ckpt)
    n1 = spark.read.parquet(out).count()
    assert n1 == Catalog(spark, SF).events.count()
    # second run: checkpoint says everything is already consumed
    src2 = events_stream(spark, SF).select("event_id", "user_id", "value")
    stream_to_parquet(src2, out, ckpt)
    assert spark.read.parquet(out).count() == n1
