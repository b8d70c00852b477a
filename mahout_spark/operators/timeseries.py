"""Calendar-interval time-series aggregation (X80: date_histogram).

The ES ``date_histogram`` bucket agg with CALENDAR intervals — hour /
day / week / month / quarter / year — over an event-time column. This
is deliberately distinct from two near neighbors already in the repo:

* ``aggs.facet_histogram`` buckets by FIXED numeric width; calendar
  buckets are variable-width (months are 28-31 days), so they need
  ``date_trunc``, not ``floor(v / w) * w``;
* ``streaming/windows.py`` does watermarked SLIDING windows for
  late-data streams; a date histogram is the tumbling batch rollup
  (and the two agree when the slide equals the width and the interval
  is fixed — that identity is what the streaming suite pins).

Plan shape: one narrow projection (``date_trunc`` is a JVM expression
inside whole-stage codegen) then one partial-aggregated count/sum keyed
by bucket — the same two-exchange rollup any warehouse runs; at 100 TB
the ts column's min/max row-group stats prune time-sliced scans before
the shuffle. Spark and DuckDB agree on ``date_trunc`` semantics for
every interval exposed here (ISO weeks start Monday), which is what
makes the oracle exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Calendar intervals Spark date_trunc and DuckDB date_trunc agree on.
INTERVALS = ("hour", "day", "week", "month", "quarter", "year")


def date_histogram(
    events: DataFrame,
    ts_col: str = "ts",
    interval: str = "day",
    value_col: str | None = None,
    group_col: str | None = None,
) -> DataFrame:
    """Tumbling calendar buckets over ``ts_col``: (bucket[, group],
    n_events[, sum_value, avg_value]) ordered by bucket (then group).
    NULL timestamps are excluded (ES missing-value default); empty
    buckets are absent (``min_doc_count=1`` semantics — a dense zero-
    filled axis is presentation, not aggregation). ``group_col`` adds
    the ES sub-bucket shape (terms-within-date-histogram) without a
    second shuffle — the one exchange keys on (bucket, group)."""
    if interval not in INTERVALS:
        raise ValueError(
            f"interval must be one of {INTERVALS}: {interval!r}"
        )
    keys = [F.date_trunc(interval, F.col(ts_col)).alias("bucket")]
    if group_col:
        keys.append(F.col(group_col))
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col:
        aggs += [
            F.round(F.sum(value_col), 6).alias("sum_value"),
            F.round(F.avg(value_col), 6).alias("avg_value"),
        ]
    out = (
        events.filter(F.col(ts_col).isNotNull())
        .groupBy(*keys)
        .agg(*aggs)
    )
    order = ["bucket"] + ([group_col] if group_col else [])
    return out.orderBy(*order)
