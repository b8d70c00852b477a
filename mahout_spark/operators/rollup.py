"""Hypertable rollup — continuous aggregates (X145).

The TimescaleDB continuous-aggregate / materialized-rollup shape: a
time-series table is pre-aggregated into a LADDER of granularity tiers
(hour → day → month → …) so dashboard queries read bucket counts, not
raw events. Two properties make it a hypertable rollup rather than a
one-off GROUP BY:

* **each coarser tier aggregates the PREVIOUS tier, never the raw
  table** — (count, sum, min, max) are reassociable, so day = fold of
  24 hour rows; avg is DERIVED at read time from sum/count (averaging
  averages would be wrong for uneven buckets, the classic mistake);
* **refresh is bucket-targeted** — late data invalidates only the
  buckets its timestamps touch; refresh recomputes exactly those rows
  in every tier and leaves the rest byte-identical.

Tiers must NEST (a coarse bucket is a union of fine ones), so the
ladder is restricted to minute/hour/day/month/quarter/year — week is
rejected (ISO weeks straddle month boundaries).

Scale shape: tier 0 is one groupBy over the raw table; every further
tier aggregates the (already tiny) previous tier. Refresh scans only
the raw rows in the invalidated window. Tier tables are bucket-sorted
parquet; a real deployment would partition them by time range — at
sandbox scale one file per tier is the honest layout.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NESTABLE = ("minute", "hour", "day", "month", "quarter", "year")

_SCHEMA = ("bucket timestamp, n_events long, sum_value double, "
           "min_value double, max_value double")


def _tier_path(out_dir: str, interval: str) -> str:
    return os.path.join(out_dir, f"rollup_{interval}")


def _validate(intervals) -> list[str]:
    ivs = list(intervals)
    if not ivs:
        raise ValueError("at least one interval required")
    bad = [i for i in ivs if i not in NESTABLE]
    if bad:
        raise ValueError(
            f"non-nestable interval(s) {bad}; allowed: {NESTABLE} "
            "(week straddles month boundaries)")
    order = [NESTABLE.index(i) for i in ivs]
    if order != sorted(order) or len(set(order)) != len(order):
        raise ValueError(
            f"intervals must be strictly fine-to-coarse: {ivs}")
    return ivs


def _raw_tier(events: DataFrame, interval: str, ts_col: str,
              value_col: str) -> DataFrame:
    return (
        events.filter(F.col(ts_col).isNotNull())
        .groupBy(F.date_trunc(interval, F.col(ts_col)).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("double")).alias("sum_value"),
            F.min(F.col(value_col).cast("double")).alias("min_value"),
            F.max(F.col(value_col).cast("double")).alias("max_value"),
        )
    )


def _fold_tier(finer: DataFrame, interval: str) -> DataFrame:
    """The reassociation step: a coarse bucket folds the finer tier's
    rows — counts and sums add, min/max fold; raw rows never re-read."""
    return (
        finer.groupBy(
            F.date_trunc(interval, F.col("bucket")).alias("bucket"))
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    )


def rollup_build(
    spark: SparkSession,
    events: DataFrame,
    out_dir: str,
    intervals=("hour", "day"),
    ts_col: str = "ts",
    value_col: str = "value",
) -> None:
    """Materialize the tier ladder under ``out_dir`` (one parquet dir
    per interval). Tier 0 aggregates the raw table once; every coarser
    tier folds the previous one."""
    ivs = _validate(intervals)
    tier = _raw_tier(events, ivs[0], ts_col, value_col)
    tier.write.mode("overwrite").parquet(_tier_path(out_dir, ivs[0]))
    for prev, cur in zip(ivs, ivs[1:]):
        finer = spark.read.parquet(_tier_path(out_dir, prev))
        _fold_tier(finer, cur).write.mode("overwrite").parquet(
            _tier_path(out_dir, cur))


def rollup_query(
    spark: SparkSession,
    out_dir: str,
    interval: str,
    start=None,
    end=None,
) -> DataFrame:
    """Answer a bucketed aggregate from the materialized tier: counts,
    sum/min/max, and avg DERIVED from sum/count (round 6). ``start`` /
    ``end`` filter buckets to ``[start, end)``. No raw-table scan."""
    path = _tier_path(out_dir, interval)
    if not os.path.isdir(path):
        raise ValueError(
            f"no materialized tier for {interval!r} under {out_dir}")
    t = spark.read.parquet(path)
    if start is not None:
        t = t.filter(F.col("bucket") >= F.lit(start))
    if end is not None:
        t = t.filter(F.col("bucket") < F.lit(end))
    return t.select(
        "bucket", "n_events",
        F.round("sum_value", 6).alias("sum_value"),
        F.round("min_value", 6).alias("min_value"),
        F.round("max_value", 6).alias("max_value"),
        F.round(F.col("sum_value") / F.col("n_events"), 6).alias(
            "avg_value"),
    ).orderBy("bucket")


def rollup_refresh(
    spark: SparkSession,
    events: DataFrame,
    out_dir: str,
    start,
    end,
    intervals=("hour", "day"),
    ts_col: str = "ts",
    value_col: str = "value",
) -> None:
    """Bucket-targeted refresh (the continuous-aggregate invalidation
    contract): recompute, in EVERY tier, exactly the buckets whose span
    intersects ``[start, end)`` from the raw table, keep every other
    row untouched. Late or corrected data therefore costs per-tier
    scans of the (widened) invalidated raw window, never a full
    rebuild."""
    import shutil

    ivs = _validate(intervals)
    for iv in ivs:
        path = _tier_path(out_dir, iv)
        if not os.path.isdir(path):
            raise ValueError(f"no materialized tier for {iv!r}")
        old = spark.read.parquet(path)
        # invalidation widens per tier to WHOLE coarse buckets: every
        # bucket b with trunc(start) <= b < end recomputes from ALL its
        # raw rows (condition on the TRUNCATED timestamp — a bucket
        # straddling either edge is rebuilt whole, never from a partial
        # slice of its rows)
        lo = F.date_trunc(iv, F.lit(start))
        keep = old.filter(
            (F.col("bucket") < lo) | (F.col("bucket") >= F.lit(end)))
        widened = events.filter(
            F.col(ts_col).isNotNull()
            & (F.date_trunc(iv, F.col(ts_col)) >= lo)
            & (F.date_trunc(iv, F.col(ts_col)) < F.lit(end))
        )
        fresh = _raw_tier(widened, iv, ts_col, value_col)
        staged = path + ".__stage"
        keep.unionByName(fresh).write.mode("overwrite").parquet(staged)
        shutil.rmtree(path)
        os.rename(staged, path)
