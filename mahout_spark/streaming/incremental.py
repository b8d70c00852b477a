"""Structured-Streaming front-end for the incremental index build.

The reference has no streaming surface (SURVEY.md §2.9); the engine's
streaming story is the incremental-batch append (index/append.py) driven
by ``foreachBatch``: each micro-batch of new documents is one idempotent
append (batch_id = the streaming epoch, so Spark's replay-on-failure
contract composes with the append's exactly-once lineage guard —
a replayed epoch is a no-op).

This is the standard production shape for "index new corpus partitions as
they land": a file-source stream (or Kafka, same code) over the landing
zone, availableNow for catch-up runs, continuous triggers for tailing.
State lives entirely in the index catalog + the stream checkpoint; the
driver holds nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mahout_spark.index.append import append_to_index
from mahout_spark.index.build import build_index
from mahout_spark.sources.catalog import ParquetCatalog


def foreach_batch_indexer(
    index_dir: str, content_col: str = "text", **build_kw
):
    """Returns the foreachBatch handler: bootstrap on first batch (no index
    yet), idempotent append afterwards."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        cat = ParquetCatalog(index_dir)
        if not cat.exists("postings"):
            build_index(
                spark, batch_df, out_dir=index_dir,
                content_col=content_col, resume=False, **build_kw
            )
            cat.lineage_append(
                "appends",
                {"batch_id": f"stream-{batch_id}", "status": "complete",
                 "bootstrap": True},
            )
        else:
            append_to_index(
                spark, cat, batch_df, content_col=content_col,
                batch_id=f"stream-{batch_id}",
            )

    return handle


def index_document_stream(
    spark: SparkSession,
    input_dir: str,
    schema: str,
    index_dir: str,
    checkpoint_dir: str,
    content_col: str = "text",
    available_now: bool = True,
    **build_kw,
):
    """Index a landing-zone directory of parquet document files as a
    stream. Returns the StreamingQuery (caller awaits termination)."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )
    writer = stream.writeStream.foreachBatch(
        foreach_batch_indexer(index_dir, content_col, **build_kw)
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
