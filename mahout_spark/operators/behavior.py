"""Event-behavior analytics: funnels and retention cohorts (X146/X147).

The two standard product-analytics aggregations over an event stream
(the ClickHouse ``windowFunnel`` / Mixpanel-retention shapes), pinned to
RNG-free, SQL-replayable conventions so an independent engine reproduces
them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: list[str],
    window_s: float | None = None,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-funnel analysis: for every user who performed step 1,
    how far they advanced through ``steps`` in order. Returns one row
    per such user: ``(user, steps_completed, t_first, t_last,
    converted)``.

    Convention pinned (the replayable variant of ClickHouse's
    ``windowFunnel``): the chain is GREEDY-EARLIEST — ``t_1 = min ts``
    of step 1, ``t_i = min ts of step_i with ts >= t_{i-1}`` (equal
    timestamps chain — an atomic multi-step batch counts). For ``>=``
    chains greedy-earliest is maximal, so ``steps_completed`` is exact;
    ``window_s`` is checked against THIS chain only (``t_last - t_first
    <= window``, exact integer microseconds) — a sliding-anchor search
    could convert a user the greedy chain rejects, which no exact SQL
    replay reproduces; the anchor convention is documented instead.

    Plan: one conditional aggregate per step, each a single exchange on
    the user key over only that step's events — |steps| narrow shuffles,
    no window over the raw stream, no per-user state."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    if window_s is not None and window_s <= 0:
        raise ValueError(f"window_s must be > 0: {window_s}")
    base = events.filter(
        F.col(ts_col).isNotNull() & F.col(user_col).isNotNull())
    cur = (
        base.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_t0"))
    )
    prev = "_t0"
    tcols = ["_t0"]
    for i, s in enumerate(steps[1:], start=1):
        nxt = (
            base.filter(F.col(type_col) == s)
            .join(cur.select(user_col, *tcols), user_col)
            .filter(F.col(ts_col) >= F.col(prev))
            .groupBy(user_col, *tcols)
            .agg(F.min(ts_col).alias(f"_t{i}"))
        )
        cur = cur.join(
            nxt.select(user_col, f"_t{i}"), user_col, "left")
        prev = f"_t{i}"
        tcols.append(prev)
    reached = sum(
        F.col(c).isNotNull().cast("int") for c in tcols)
    t_last = F.coalesce(*[F.col(c) for c in reversed(tcols)])
    full = F.col(tcols[-1]).isNotNull()
    if window_s is not None:
        full = full & (
            F.abs(F.expr(
                f"timestampdiff(MICROSECOND, _t0, {tcols[-1]})"))
            <= F.lit(int(round(window_s * 1_000_000))))
    return cur.select(
        user_col,
        reached.cast("long").alias("steps_completed"),
        F.col("_t0").alias("t_first"),
        t_last.alias("t_last"),
        full.alias("converted"),
    )


def retention_cohorts(
    events: DataFrame,
    period: str = "day",
    max_offset: int | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention (the Mixpanel/Amplitude triangle): users cohort
    by the ``period`` bucket of their FIRST event; for every (cohort,
    period offset) the number of distinct cohort members active in that
    later period. Returns ``(cohort, offset, n_active, cohort_size,
    retention)`` with offset 0 = the cohort period itself (retention 1
    by construction) and ``retention = round(n_active / cohort_size,
    6)``.

    Plan: first-event cohorting is one user-keyed aggregate; activity
    marks are one distinct over (user, period bucket); the triangle is
    their equi-join + one (cohort, offset) aggregate — three narrow
    exchanges, nothing user-enumerated ever reaches the driver."""
    if period not in ("day", "month"):
        raise ValueError(
            f"period must be 'day' or 'month' (nesting calendar "
            f"buckets): {period!r}")
    if max_offset is not None and max_offset < 0:
        raise ValueError(f"max_offset must be >= 0: {max_offset}")
    base = events.filter(
        F.col(ts_col).isNotNull() & F.col(user_col).isNotNull())
    bucket = F.date_trunc(period, F.col(ts_col))
    first = base.groupBy(user_col).agg(
        F.min(bucket).alias("cohort"))
    active = base.select(
        user_col, bucket.alias("_p")).distinct()
    if period == "day":
        off = F.datediff(F.col("_p"), F.col("cohort"))
    else:
        off = (F.months_between(F.col("_p"), F.col("cohort"))
               .cast("long"))
    tri = (
        active.join(first, user_col)
        .withColumn("offset", off.cast("long"))
    )
    if max_offset is not None:
        tri = tri.filter(F.col("offset") <= max_offset)
    counts = tri.groupBy("cohort", "offset").agg(
        F.countDistinct(user_col).alias("n_active"))
    size = first.groupBy("cohort").agg(
        F.countDistinct(user_col).alias("cohort_size"))
    return (
        counts.join(size, "cohort")
        .select(
            "cohort", "offset", "n_active", "cohort_size",
            F.round(F.col("n_active") / F.col("cohort_size"), 6)
            .alias("retention"),
        )
        .orderBy("cohort", "offset")
    )
