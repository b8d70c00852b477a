"""Ingest-time exact deduplication — the streaming arm of
``operators.dedup.exact_dedup_groups`` (X127).

A training-data feed dedups AT INGEST so duplicates never land in the
corpus (the batch operators then only handle near-dups). The streaming
regime uses Structured Streaming's watermarked duplicate state:

* key = ``sha256(content)`` — the batch exact-dedup rule: state and
  shuffle carry one 32-byte key per distinct document, never bodies
  (collisions ignored by design, 2^-128).
* ``dropDuplicatesWithinWatermark`` keeps the FIRST ARRIVAL per key and
  evicts key state older than the watermark — the knob that keeps a
  100 TB/day feed's dedup state bounded (an unbounded
  ``dropDuplicates`` would grow state forever). Duplicates separated by
  more than the watermark horizon are NOT caught at ingest — that is
  the documented contract (ES/ingest pipelines share it); the periodic
  batch ``exact_dedup_groups`` sweep is the backstop.

The batch arm of the same function is the deterministic REPLAY: the
(id)-least row per key survives (first-arrival is not well-defined in a
batch), so re-running the pipeline over landed data picks a stable
canonical — equality of the two arms' survivor CONTENT sets is
test-gated; survivor identity coincides when arrival order is id order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_stream(
    docs: DataFrame,
    watermark: str = "1 hour",
    ts_col: str = "ts",
    content_col: str = "text",
    id_cols: tuple = ("doc_id",),
) -> DataFrame:
    """First-copy-only view of ``docs`` keyed on content sha256.
    Streaming input: watermarked ``dropDuplicatesWithinWatermark``
    (state = 32-byte keys inside the horizon). Batch input: the
    deterministic (id)-least canonical per key."""
    key = F.sha2(F.col(content_col).cast("string"), 256)
    if docs.isStreaming:
        return (
            docs.withColumn("_sha", key)
            .withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["_sha"])
            .drop("_sha")
        )
    w = Window.partitionBy("_sha").orderBy(*[F.col(c) for c in id_cols])
    return (
        docs.withColumn("_sha", key)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_sha", "_rn")
    )


def run_dedup_stream_to_memory(
    spark,
    input_dir: str,
    schema: str,
    query_name: str,
    watermark: str = "1 hour",
    ts_col: str = "ts",
    content_col: str = "text",
    timeout_sec: int = 120,
) -> DataFrame:
    """Drive dedup_stream over a parquet landing dir (availableNow,
    append-mode memory sink); returns the surviving rows. Tests/demos —
    production writes to a table sink."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    survivors = dedup_stream(
        stream, watermark=watermark, ts_col=ts_col,
        content_col=content_col,
    )
    q = (
        survivors.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return spark.table(query_name)
