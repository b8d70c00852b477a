"""Streaming windowed aggregation: the availableNow streaming result must
equal the batch computation over the same input (Structured Streaming's
correctness contract), modulo the documented approx-distinct divergence.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet("/root/testdata/sf0.001/events.parquet")


def test_stream_matches_batch(spark, events, tmp_path_factory):
    from mahout_spark.streaming.windows import (
        run_stream_to_memory,
        windowed_event_stats,
    )

    landing = str(tmp_path_factory.mktemp("ev_landing"))
    # two files -> multiple micro-batches, out-of-order event times across
    # batches exercise the stateful window merge
    events.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode(
        "append"
    ).parquet(landing)
    events.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(landing)

    got = run_stream_to_memory(
        spark, landing, SCHEMA, "win_test", window="6 hours",
        watermark="24 hours",
    )
    exp = windowed_event_stats(events, window="6 hours")

    g = {
        (r["win_start"], r["event_type"]): (r["n_events"], r["value_micros"])
        for r in got.collect()
    }
    e = {
        (r["win_start"], r["event_type"]): (r["n_events"], r["value_micros"])
        for r in exp.collect()
    }
    assert g == e  # exact columns agree; n_users (approx on stream) excluded


def test_batch_window_values(spark, events):
    """Batch-mode sanity: window totals partition the input exactly."""
    from mahout_spark.streaming.windows import windowed_event_stats

    agg = windowed_event_stats(events, window="6 hours")
    assert agg.agg(F.sum("n_events")).first()[0] == events.count()
    total_micros = agg.agg(F.sum("value_micros")).first()[0]
    exp = events.select(
        F.sum(F.round(F.col("value") * 1_000_000).cast("long"))
    ).first()[0]
    assert total_micros == exp
