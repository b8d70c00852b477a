"""Hypertable rollup (X145, operators/rollup.py): tier fold losslessness
vs direct aggregation, avg-from-sums (never avg-of-avgs), query
filtering, bucket-targeted refresh ≡ full rebuild, and rejects."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from mahout_spark.operators.rollup import (
    rollup_build,
    rollup_query,
    rollup_refresh,
)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, value double")


@pytest.fixture(scope="module")
def ev(spark):
    rows = [
        (i, dt.datetime(2024, 1, 1 + (i % 5), (i * 7) % 24, i % 60),
         float(i % 13) + 0.25)
        for i in range(400)
    ] + [(999, None, 5.0)]  # NULL ts excluded everywhere
    return _events(spark, rows)


def _direct(ev, interval):
    return {
        r["bucket"]: (r["n"], round(r["s"], 6), round(r["mn"], 6),
                      round(r["mx"], 6), round(r["s"] / r["n"], 6))
        for r in ev.filter(F.col("ts").isNotNull())
        .groupBy(F.date_trunc(interval, "ts").alias("bucket"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"),
             F.min("value").alias("mn"), F.max("value").alias("mx"))
        .collect()
    }


def test_tier_fold_is_lossless(spark, ev, tmp_path):
    out = str(tmp_path / "ru")
    rollup_build(spark, ev, out, intervals=("hour", "day", "month"))
    for iv in ("hour", "day", "month"):
        got = {r["bucket"]: (r["n_events"], r["sum_value"], r["min_value"],
                             r["max_value"], r["avg_value"])
               for r in rollup_query(spark, out, iv).collect()}
        assert got == _direct(ev, iv), iv
    # avg is derived from sums: uneven buckets would break avg-of-avgs
    day = {r["bucket"]: r for r in rollup_query(spark, out, "day").collect()}
    b = min(day)
    assert day[b]["avg_value"] == round(
        day[b]["sum_value"] / day[b]["n_events"], 6)


def test_query_window_filter(spark, ev, tmp_path):
    out = str(tmp_path / "ru")
    rollup_build(spark, ev, out, intervals=("day",))
    lo, hi = dt.datetime(2024, 1, 2), dt.datetime(2024, 1, 4)
    got = [r["bucket"] for r in
           rollup_query(spark, out, "day", start=lo, end=hi).collect()]
    assert got == [dt.datetime(2024, 1, 2), dt.datetime(2024, 1, 3)]


def test_refresh_equals_full_rebuild(spark, ev, tmp_path):
    out = str(tmp_path / "ru")
    rollup_build(spark, ev, out, intervals=("hour", "day"))
    # late data lands mid-window: corrected rows for Jan 2-3
    late = _events(spark, [
        (1000, dt.datetime(2024, 1, 2, 5, 30), 100.0),
        (1001, dt.datetime(2024, 1, 3, 23, 59), 200.0),
    ])
    all_ev = ev.unionByName(late)
    rollup_refresh(
        spark, all_ev, out,
        start=dt.datetime(2024, 1, 2), end=dt.datetime(2024, 1, 4),
        intervals=("hour", "day"))
    out2 = str(tmp_path / "ru_full")
    rollup_build(spark, all_ev, out2, intervals=("hour", "day"))
    for iv in ("hour", "day"):
        a = [tuple(r) for r in rollup_query(spark, out, iv).collect()]
        b = [tuple(r) for r in rollup_query(spark, out2, iv).collect()]
        assert a == b, iv


def test_refresh_rebuilds_straddling_buckets_whole(spark, tmp_path):
    """An unaligned refresh window must rebuild edge buckets from ALL
    their rows, not the slice inside the window."""
    rows = [
        (1, dt.datetime(2024, 1, 1, 10, 5), 1.0),
        (2, dt.datetime(2024, 1, 1, 10, 55), 2.0),  # outside window,
        (3, dt.datetime(2024, 1, 1, 11, 5), 3.0),   # same hour bucket
    ]
    ev = _events(spark, rows)
    out = str(tmp_path / "ru")
    rollup_build(spark, ev, out, intervals=("hour",))
    rollup_refresh(
        spark, ev, out,
        start=dt.datetime(2024, 1, 1, 10, 0),
        end=dt.datetime(2024, 1, 1, 10, 30),  # mid-bucket end
        intervals=("hour",))
    got = {r["bucket"]: r["n_events"]
           for r in rollup_query(spark, out, "hour").collect()}
    assert got == {dt.datetime(2024, 1, 1, 10): 2,
                   dt.datetime(2024, 1, 1, 11): 1}


def test_rollup_rejects(spark, ev, tmp_path):
    out = str(tmp_path / "ru")
    with pytest.raises(ValueError, match="non-nestable"):
        rollup_build(spark, ev, out, intervals=("week",))
    with pytest.raises(ValueError, match="fine-to-coarse"):
        rollup_build(spark, ev, out, intervals=("day", "hour"))
    with pytest.raises(ValueError, match="at least one"):
        rollup_build(spark, ev, out, intervals=())
    rollup_build(spark, ev, out, intervals=("day",))
    with pytest.raises(ValueError, match="no materialized tier"):
        rollup_query(spark, out, "hour")
