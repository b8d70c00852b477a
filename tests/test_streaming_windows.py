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


# ---------------------------------------------------------------------------
# session windows (X110)
# ---------------------------------------------------------------------------

def _py_sessions(rows, gap_sec, key="user_id"):
    """Gaps-and-islands recompute: new session when ts - prev > gap."""
    from collections import defaultdict

    by_key = defaultdict(list)
    for r in rows:
        if r["ts"] is not None:
            by_key[r[key]].append((r["ts"], round(r["value"] * 1_000_000)))
    out = {}
    for k, evs in by_key.items():
        evs.sort()
        cur = [evs[0]]
        for e in evs[1:]:
            if (e[0] - cur[-1][0]).total_seconds() > gap_sec:
                out[(k, cur[0][0])] = cur
                cur = [e]
            else:
                cur.append(e)
        out[(k, cur[0][0])] = cur
    return {
        (k, start): (len(evs), sum(m for _, m in evs),
                     max(t for t, _ in evs))
        for (k, start), evs in out.items()
    }


def test_sessions_match_gaps_and_islands(spark, events):
    from datetime import timedelta

    from mahout_spark.streaming.windows import sessionized_event_stats

    gap = 1800
    got = sessionized_event_stats(events, gap="30 minutes").collect()
    exp = _py_sessions(events.collect(), gap)
    assert len(got) == len(exp)
    for r in got:
        n, micros, last_ts = exp[(r["user_id"], r["session_start"])]
        assert r["n_events"] == n
        assert r["value_micros"] == micros
        assert r["session_end"] == last_ts + timedelta(seconds=gap)


def test_session_boundary_is_exclusive(spark):
    from datetime import datetime

    from mahout_spark.streaming.windows import sessionized_event_stats

    t0 = datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (0, t0, 1, "a", 1.0, ""),
        (1, datetime(2024, 1, 1, 0, 29, 59), 1, "a", 1.0, ""),  # merges
        (2, datetime(2024, 1, 1, 0, 59, 59), 1, "a", 1.0, ""),  # merges
        (3, datetime(2024, 1, 1, 1, 29, 59), 1, "a", 1.0, ""),  # merges
        (4, datetime(2024, 1, 1, 1, 59, 59), 1, "a", 1.0, ""),  # merges
        # exactly prev + gap: still MERGES (Spark's closed boundary)
        (5, datetime(2024, 1, 1, 2, 29, 59), 1, "a", 1.0, ""),
        # one microsecond past the gap: NEW session
        (6, datetime(2024, 1, 1, 3, 0, 0, 1), 1, "a", 1.0, ""),
        (7, None, 1, "a", 1.0, ""),                    # NULL dropped
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = sorted(
        (r["session_start"], r["n_events"])
        for r in sessionized_event_stats(df, gap="30 minutes").collect()
    )
    assert got == [(t0, 6), (datetime(2024, 1, 1, 3, 0, 0, 1), 1)]


def test_session_stream_matches_batch(spark, events, tmp_path_factory):
    from mahout_spark.streaming.windows import (
        run_sessions_to_memory,
        sessionized_event_stats,
    )

    landing = str(tmp_path_factory.mktemp("sess_landing"))
    events.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode(
        "append").parquet(landing)
    events.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode(
        "append").parquet(landing)

    got = run_sessions_to_memory(
        spark, landing, SCHEMA, "sess_test", gap="30 minutes")
    exp = sessionized_event_stats(events, gap="30 minutes")
    g = {(r["user_id"], r["session_start"]):
         (r["session_end"], r["n_events"], r["value_micros"])
         for r in got.collect()}
    e = {(r["user_id"], r["session_start"]):
         (r["session_end"], r["n_events"], r["value_micros"])
         for r in exp.collect()}
    assert g == e
