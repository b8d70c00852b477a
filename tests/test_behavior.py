"""Funnel + retention cohorts (X146/X147, operators/behavior.py):
hand-traced chains, greedy/window/tie conventions, triangle arithmetic,
and rejects."""

import datetime as dt

import pytest

from mahout_spark.operators.behavior import funnel, retention_cohorts


def _t(d, h=0, m=0):
    return dt.datetime(2024, 1, d, h, m)


EV = [
    # user 1 converts in order within a day
    (1, "view", _t(1, 9)), (1, "click", _t(1, 10)),
    (1, "purchase", _t(1, 11)),
    # user 2: click BEFORE view -> chain stalls at view (greedy >= t0)
    (2, "click", _t(1, 8)), (2, "view", _t(1, 9)),
    # user 3: full chain but purchase 3 days later -> window voids
    (3, "view", _t(1, 9)), (3, "click", _t(1, 10)),
    (3, "purchase", _t(4, 9)),
    # user 4: simultaneous batch -> equal timestamps chain
    (4, "view", _t(2, 12)), (4, "click", _t(2, 12)),
    (4, "purchase", _t(2, 12)),
    # user 5 never views -> absent from the funnel
    (5, "purchase", _t(1, 9)),
    # NULLs excluded
    (None, "view", _t(1, 9)), (6, "view", None),
]


@pytest.fixture(scope="module")
def ev(spark):
    return spark.createDataFrame(
        EV, "user_id long, event_type string, ts timestamp")


def test_funnel_hand_trace(spark, ev):
    rows = {r["user_id"]: r for r in funnel(
        ev, ["view", "click", "purchase"], window_s=86400).collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert (rows[1]["steps_completed"], rows[1]["converted"]) == (3, True)
    assert rows[1]["t_first"] == _t(1, 9) and rows[1]["t_last"] == _t(1, 11)
    # pre-view click doesn't count: greedy chain needs ts >= t_prev
    assert (rows[2]["steps_completed"], rows[2]["converted"]) == (1, False)
    assert rows[2]["t_last"] == _t(1, 9)
    # full chain outside the window: steps counted, conversion voided
    assert (rows[3]["steps_completed"], rows[3]["converted"]) == (3, False)
    # equal timestamps chain (atomic batch converts)
    assert (rows[4]["steps_completed"], rows[4]["converted"]) == (3, True)
    # no window -> user 3 converts
    nw = {r["user_id"]: r["converted"] for r in funnel(
        ev, ["view", "click", "purchase"]).collect()}
    assert nw[3] is True


def test_funnel_rejects(spark, ev):
    with pytest.raises(ValueError, match="at least one step"):
        funnel(ev, [])
    with pytest.raises(ValueError, match="window_s"):
        funnel(ev, ["view"], window_s=0)


def test_retention_triangle(spark, ev):
    rows = {(r["cohort"], r["offset"]):
            (r["n_active"], r["cohort_size"], r["retention"])
            for r in retention_cohorts(ev, period="day").collect()}
    # Jan-1 cohort: users 1,2,3,5 (first event Jan 1); user 3 active
    # again at offset 3; user 4 is its own Jan-2 cohort
    assert rows[(_t(1), 0)] == (4, 4, 1.0)
    assert rows[(_t(1), 3)] == (1, 4, 0.25)
    assert rows[(_t(2), 0)] == (1, 1, 1.0)
    assert set(rows) == {(_t(1), 0), (_t(1), 3), (_t(2), 0)}
    # max_offset prunes the tail
    capped = retention_cohorts(ev, period="day", max_offset=1)
    assert {(r["cohort"], r["offset"]) for r in capped.collect()} == {
        (_t(1), 0), (_t(2), 0)}
    with pytest.raises(ValueError, match="period"):
        retention_cohorts(ev, period="week")
    with pytest.raises(ValueError, match="max_offset"):
        retention_cohorts(ev, max_offset=-1)
