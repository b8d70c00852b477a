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


#: Pipeline metrics over an already-aggregated bucket relation.
PIPELINE_METRICS = ("derivative", "cumulative_sum", "moving_avg")


def bucket_pipeline(
    buckets: DataFrame,
    value_col: str,
    metrics=PIPELINE_METRICS,
    window: int = 5,
    bucket_col: str = "bucket",
) -> DataFrame:
    """ES pipeline aggregations (``derivative`` / ``cumulative_sum`` /
    ``moving_avg``, the moving_fn shape) over a date_histogram result:
    per bucket, in bucket order,

    * ``derivative``     — value minus the previous bucket's value
      (NULL for the first bucket, the ES contract);
    * ``cumulative_sum`` — running sum from the first bucket;
    * ``moving_avg``     — mean of the trailing ``window`` buckets
      INCLUDING the current one (fewer at the head — ES's partial
      windows).

    Round-6 outputs; input rows pass through unchanged. The window here
    is a SINGLE ordered partition by design: it runs over the already-
    aggregated bucket relation (thousands of rows at most — bounded by
    the time axis, not the corpus), after the heavy corpus-side shuffle
    has already reduced to one row per bucket. Sub-bucketed histograms
    (a group_col) should instead partition the window by group — pass
    the pre-grouped frame per group, or extend here when needed."""
    from pyspark.sql import Window

    bad = [m for m in metrics if m not in PIPELINE_METRICS]
    if bad or not metrics:
        raise ValueError(
            f"metrics must be non-empty, from {PIPELINE_METRICS}: {bad}")
    if window < 1:
        raise ValueError(f"window must be >= 1: {window}")
    w = Window.orderBy(F.col(bucket_col).asc())
    out = buckets
    v = F.col(value_col).cast("double")
    if "derivative" in metrics:
        out = out.withColumn(
            "derivative", F.round(v - F.lag(v, 1).over(w), 6))
    if "cumulative_sum" in metrics:
        out = out.withColumn(
            "cumulative_sum",
            F.round(F.sum(v).over(
                w.rowsBetween(Window.unboundedPreceding, 0)), 6))
    if "moving_avg" in metrics:
        out = out.withColumn(
            "moving_avg",
            F.round(F.avg(v).over(
                w.rowsBetween(-(window - 1), 0)), 6))
    return out.orderBy(F.col(bucket_col).asc())


def bucket_selector(buckets: DataFrame, condition) -> DataFrame:
    """ES ``bucket_selector`` pipeline agg: drop buckets whose metrics
    fail ``condition`` (a SQL boolean expression string over the bucket
    relation's columns, or a Column) — the aggregation-side HAVING.
    NULL evaluations drop the bucket (ES: a script returning no value
    removes it). Bucket order is preserved.

    Catalyst sees a plain Filter over the bucket relation, so when the
    selector is composed BEFORE the histogram is materialized it can
    only prune post-aggregation rows — it never reaches the corpus scan
    (correct: the condition reads aggregated metrics)."""
    cond = F.expr(condition) if isinstance(condition, str) else condition
    return buckets.filter(cond)


def bucket_sort(
    buckets: DataFrame,
    sort: list | None = None,
    size: int | None = None,
    offset: int = 0,
    bucket_col: str = "bucket",
) -> DataFrame:
    """ES ``bucket_sort`` pipeline agg: re-order the bucket list by
    metric values and truncate with ``from``/``size``. ``sort`` is a
    list of ``(column, "asc"|"desc")`` pairs; ties always break on the
    bucket key ascending (deterministic — ES leaves ties to shard
    order, which a distributed engine must not). With ``sort=None``
    the buckets stay in bucket-key order and only truncation applies,
    ES's truncate-only mode.

    The sort runs over the already-aggregated bucket relation (bounded
    by the axis cardinality, not the corpus) and ``limit`` collapses to
    a TakeOrdered when a size is given — no full-sort shuffle."""
    if size is not None and size < 1:
        raise ValueError(f"size must be >= 1: {size}")
    if offset < 0:
        raise ValueError(f"offset must be >= 0: {offset}")
    cols = []
    for col, direction in (sort or []):
        if direction not in ("asc", "desc"):
            raise ValueError(
                f"sort direction must be asc|desc: {direction!r}")
        c = F.col(col)
        cols.append(c.asc() if direction == "asc" else c.desc())
    cols.append(F.col(bucket_col).asc())
    out = buckets.orderBy(*cols)
    if offset:
        out = out.offset(offset)
    return out.limit(size) if size is not None else out


def bucket_stats(
    buckets: DataFrame,
    value_col: str,
    bucket_col: str = "bucket",
) -> DataFrame:
    """ES sibling pipeline aggs (`stats_bucket`, subsuming `min_bucket`
    / `max_bucket` / `avg_bucket` / `sum_bucket`): ONE row of statistics
    over a metric ACROSS the sibling buckets — n_buckets, min/max/avg/
    sum (1e-6 rounded), plus the bucket KEYS achieving the extremes
    (`min_bucket` / `max_bucket`; ES returns a keys array — a relation
    pins the FIRST such key in bucket order). NULL metric values are
    skipped (the ES gap policy default); all-NULL input yields the
    single row with NULL stats. One partial aggregation over the
    already-bounded bucket relation — nothing corpus-sized anywhere."""
    v = F.col(value_col).cast("double")
    key = F.col(bucket_col)
    return buckets.agg(
        F.count(v).alias("n_buckets"),
        F.round(F.min(v), 6).alias("min_value"),
        F.round(F.max(v), 6).alias("max_value"),
        F.round(F.avg(v), 6).alias("avg_value"),
        F.round(F.sum(v), 6).alias("sum_value"),
        # first bucket key (asc) achieving each extreme: min/max over
        # (value, key) structs compares value first, then key
        F.min_by(key, F.when(v.isNotNull(), F.struct(v, key)))
        .alias("min_bucket"),
        F.min_by(
            key,
            F.when(v.isNotNull(), F.struct(-v, key)),
        ).alias("max_bucket"),
    )


#: ES `normalize` pipeline-agg methods implemented here.
NORMALIZE_METHODS = ("rescale_0_1", "percent_of_sum", "z-score")


def bucket_normalize(
    buckets: DataFrame,
    value_col: str,
    method: str = "percent_of_sum",
    out_col: str = "normalized",
    bucket_col: str = "bucket",
) -> DataFrame:
    """ES ``normalize`` pipeline agg: rescale a bucket metric across
    its siblings — ``rescale_0_1`` ((v−min)/(max−min); a constant
    metric yields NULL, the ES single-value degenerate), ``percent_of_
    sum`` (v/Σv), ``z-score`` ((v−mean)/σ with POPULATION σ, the ES
    formula). Values round 1e-6; NULL inputs stay NULL and are skipped
    from the statistics (ES gap policy). One unpartitioned window over
    the already-bounded bucket relation — the same scale argument as
    bucket_pipeline; input rows pass through unchanged."""
    from pyspark.sql import Window

    if method not in NORMALIZE_METHODS:
        raise ValueError(
            f"method must be one of {NORMALIZE_METHODS}: {method!r}")
    w = Window.partitionBy()
    v = F.col(value_col).cast("double")
    if method == "rescale_0_1":
        lo, hi = F.min(v).over(w), F.max(v).over(w)
        expr = F.when(hi != lo, (v - lo) / (hi - lo))
    elif method == "percent_of_sum":
        expr = v / F.sum(v).over(w)
    else:  # z-score
        sd = F.stddev_pop(v).over(w)
        expr = F.when(sd != 0, (v - F.avg(v).over(w)) / sd)
    return (
        buckets.withColumn(out_col, F.round(expr, 6))
        .orderBy(F.col(bucket_col).asc())
    )


def bucket_serial_diff(
    buckets: DataFrame,
    value_col: str,
    lag: int = 1,
    out_col: str = "serial_diff",
    bucket_col: str = "bucket",
) -> DataFrame:
    """ES ``serial_diff`` pipeline agg: ``v[i] − v[i − lag]`` in bucket
    order (NULL for the first ``lag`` buckets — the ES gap; lag=1 is
    X93's derivative, larger lags remove seasonal components of that
    period). Same single-ordered-window scale shape as bucket_pipeline;
    input rows pass through unchanged."""
    from pyspark.sql import Window

    if lag < 1:
        raise ValueError(f"lag must be >= 1: {lag}")
    w = Window.orderBy(F.col(bucket_col).asc())
    v = F.col(value_col).cast("double")
    return (
        buckets.withColumn(
            out_col, F.round(v - F.lag(v, lag).over(w), 6))
        .orderBy(F.col(bucket_col).asc())
    )


def auto_date_histogram(
    events: DataFrame,
    ts_col: str = "ts",
    target_buckets: int = 20,
    value_col: str | None = None,
) -> DataFrame:
    """ES ``auto_date_histogram``: pick the FINEST calendar interval in
    the ``INTERVALS`` ladder whose actual bucket count stays within
    ``target_buckets`` (falling back to the coarsest when even years
    overflow), then aggregate exactly as ``date_histogram`` does. The
    chosen interval rides along as an ``interval`` column, so a replay
    can verify the choice, not just the buckets.

    Convention pinned: ES estimates counts from the time span and its
    rounding ladder; this implementation counts the ACTUAL distinct
    truncations — one aggregation row computing every ladder level at
    once (a handful of count-distincts over one pass), exact at any
    corpus size and replayable by any SQL engine. Two jobs total: the
    1-row ladder probe, then the chosen histogram."""
    if target_buckets < 1:
        raise ValueError(
            f"target_buckets must be >= 1: {target_buckets}")
    probe = events.filter(F.col(ts_col).isNotNull()).agg(*[
        F.countDistinct(F.date_trunc(iv, F.col(ts_col))).alias(iv)
        for iv in INTERVALS
    ]).first()
    chosen = INTERVALS[-1]
    for iv in INTERVALS:
        if int(probe[iv] or 0) <= target_buckets:
            chosen = iv
            break
    return date_histogram(events, ts_col, chosen, value_col).withColumn(
        "interval", F.lit(chosen))
