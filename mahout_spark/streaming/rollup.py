"""Streaming continuous aggregates — the streaming arm of
``operators.rollup`` (X148).

The TimescaleDB shape: raw events land continuously, the rollup tiers
stay query-ready, and LATE data repairs exactly the buckets it touches.
Re-expressed on Structured Streaming as a ``foreachBatch`` loop:

1. the micro-batch lands in the raw table under a ``batch=<id>`` dir
   written with overwrite — a crash-replayed batch overwrites its own
   landing dir, so the raw table is exactly-once without any log;
2. the tier ladder refreshes for the batch's OWN time span
   (``rollup_refresh`` — whole-bucket recompute from the landed raw
   table), so an out-of-order batch repairs old buckets and every other
   row stays byte-identical.

Equality with a one-shot batch ``rollup_build`` over the same landed
rows is the §2.9 stream ≡ batch gate (test-enforced, including a
planted late batch)."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mahout_spark.operators.rollup import (
    _tier_path,
    rollup_build,
    rollup_refresh,
)


def foreach_batch_rollup(
    spark: SparkSession,
    out_dir: str,
    intervals=("hour", "day"),
    ts_col: str = "ts",
    value_col: str = "value",
):
    """The foreachBatch handler: land the batch idempotently, then
    bucket-targeted-refresh the tiers for its time span."""
    raw_dir = os.path.join(out_dir, "raw")

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        part = os.path.join(raw_dir, f"batch={batch_id}")
        batch_df.write.mode("overwrite").parquet(part)
        bounds = batch_df.filter(F.col(ts_col).isNotNull()).agg(
            F.min(ts_col).alias("lo"), F.max(ts_col).alias("hi")
        ).first()
        if bounds["lo"] is None:
            return
        raw = spark.read.parquet(raw_dir)
        if not os.path.isdir(_tier_path(out_dir, list(intervals)[0])):
            rollup_build(spark, raw, out_dir, intervals,
                         ts_col, value_col)
            return
        rollup_refresh(
            spark, raw, out_dir,
            start=bounds["lo"],
            end=bounds["hi"] + dt.timedelta(microseconds=1),
            intervals=intervals, ts_col=ts_col, value_col=value_col,
        )

    return handle


def run_rollup_stream(
    spark: SparkSession,
    input_dir: str,
    schema: str,
    out_dir: str,
    intervals=("hour", "day"),
    ts_col: str = "ts",
    value_col: str = "value",
    timeout_sec: int = 180,
) -> None:
    """Drive the rollup over a parquet landing dir (availableNow, one
    file per micro-batch so out-of-order files exercise the late-data
    path). Tests/demos — production attaches ``foreach_batch_rollup``
    to its real source."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    q = (
        stream.writeStream
        .foreachBatch(foreach_batch_rollup(
            spark, out_dir, intervals, ts_col, value_col))
        .option("checkpointLocation", os.path.join(out_dir, "_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
