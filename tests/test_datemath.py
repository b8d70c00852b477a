"""ES date math (X107, functions/datemath.py): resolver goldens
(offsets, chaining, rounding, calendar clamps), filter bounds
semantics, and rejects."""

from datetime import datetime

import pytest

from mahout_spark.functions.datemath import date_math_filter, parse_date_math

NOW = datetime(2024, 1, 28, 12, 30, 45, 123456)


@pytest.mark.parametrize("expr,want", [
    ("now", NOW),
    ("now-7d", datetime(2024, 1, 21, 12, 30, 45, 123456)),
    ("now-7d/d", datetime(2024, 1, 21)),
    ("now/d", datetime(2024, 1, 28)),
    ("now/w", datetime(2024, 1, 22)),              # ISO Monday
    ("now/M", datetime(2024, 1, 1)),
    ("now/y", datetime(2024, 1, 1)),
    ("now+1M", datetime(2024, 2, 28, 12, 30, 45, 123456)),
    ("now+2h-30m", datetime(2024, 1, 28, 14, 0, 45, 123456)),
    ("now+1w/d", datetime(2024, 2, 4)),
    ("now/s", datetime(2024, 1, 28, 12, 30, 45)),
    ("2024-01-31T00:00:00||+1M", datetime(2024, 2, 29)),   # leap clamp
    ("2023-01-31T00:00:00||+1M", datetime(2023, 2, 28)),   # non-leap
    ("2024-02-29T10:00:00||+1y", datetime(2025, 2, 28, 10)),
    ("2024-03-15T08:00:00||-1M/M", datetime(2024, 2, 1)),
    ("2024-06-01T12:00:00", datetime(2024, 6, 1, 12)),     # plain ISO
])
def test_parse_goldens(expr, want):
    assert parse_date_math(expr, NOW) == want


def test_rounding_applies_mid_chain():
    # ES applies ops left to right: rounding THEN offset != offset THEN
    # rounding
    assert parse_date_math("now/d+1h", NOW) == datetime(2024, 1, 28, 1)
    assert parse_date_math("now+1h/d", NOW) == datetime(2024, 1, 28)


@pytest.mark.parametrize("bad", [
    "", "nope", "now-7x", "now-7", "nowd", "now--1d", "bad||+1d",
    "now+1d junk",
])
def test_parse_rejects(bad):
    with pytest.raises(ValueError):
        parse_date_math(bad, NOW)


def test_filter_bounds(spark):
    rows = [
        (0, datetime(2024, 1, 21, 0, 0, 0)),    # == gte -> included
        (1, datetime(2024, 1, 25, 3, 0, 0)),    # inside
        (2, datetime(2024, 1, 28, 0, 0, 0)),    # == lt -> EXCLUDED
        (3, datetime(2024, 1, 10, 0, 0, 0)),    # before
        (4, None),                               # NULL never matches
    ]
    df = spark.createDataFrame(rows, "event_id bigint, ts timestamp")
    got = {r["event_id"] for r in date_math_filter(
        df, "ts", gte="now-7d/d", lt="now/d", now=NOW).collect()}
    assert got == {0, 1}
    open_lo = {r["event_id"] for r in date_math_filter(
        df, "ts", lt="now/d", now=NOW).collect()}
    assert open_lo == {0, 1, 3}
    with pytest.raises(ValueError, match="at least one"):
        date_math_filter(df, "ts")


def test_default_now_is_utc(spark, monkeypatch):
    """ADVICE r4: the wall-clock default must resolve ``now`` in UTC
    (naive, matching naive ts columns and ES) — never host-local time,
    which returns different rows per host timezone."""
    from datetime import timezone

    from mahout_spark.functions import datemath as dm

    class _FakeDT(datetime):
        @classmethod
        def now(cls, tz=None):
            assert tz is timezone.utc, \
                "date_math_filter default must ask for UTC"
            return datetime(2024, 1, 28, 12, 30, tzinfo=tz)

    monkeypatch.setattr(dm, "datetime", _FakeDT)
    rows = [(0, datetime(2024, 1, 27, 5, 0, 0)),
            (1, datetime(2024, 1, 20, 0, 0, 0))]
    df = spark.createDataFrame(rows, "event_id bigint, ts timestamp")
    got = {r["event_id"] for r in dm.date_math_filter(
        df, "ts", gte="now-1d/d").collect()}
    assert got == {0}


def test_date_math_bounds_push_to_scan(spark, tmp_path):
    """The resolved literals must reach the parquet scan as pushed
    range predicates (the operator's 100 TB claim)."""
    rows = [(i, datetime(2024, 1, 1 + i % 28)) for i in range(50)]
    df = spark.createDataFrame(rows, "event_id bigint, ts timestamp")
    p = str(tmp_path / "ev")
    df.write.parquet(p)
    out = date_math_filter(
        spark.read.parquet(p), "ts", gte="now-20d/d", lt="now-5d/d",
        now=NOW)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    pushed = [l for l in plan.split("\n") if "PushedFilters" in l][0]
    assert "GreaterThanOrEqual(ts" in pushed and "LessThan(ts" in pushed
