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
    yet), idempotent append afterwards.

    Replay safety of the BOOTSTRAP branch (the append branch has its own
    per-batch lineage guard): branching on ``cat.exists("postings")`` alone
    would wedge the stream — that dir appears as soon as build stage 1
    writes ``_meta``, so a crash mid-bootstrap would send the replayed
    first epoch down the append path into a half-built index. Instead the
    bootstrap writes a durable *intent* lineage row before building and a
    *complete* row after, which also disambiguates the one case the
    postings-dir test cannot: an index pre-built OUTSIDE the stream (no
    bootstrap rows at all -> append) vs a crashed bootstrap (intent
    without complete -> re-enter the resumable build).
    """

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        import time

        spark = batch_df.sparkSession
        cat = ParquetCatalog(index_dir)
        sid = f"stream-{batch_id}"
        boot_rows = [
            r for r in cat.lineage_rows("appends") if r.get("bootstrap")
        ]
        boot_complete = any(
            r.get("status") == "complete" for r in boot_rows
        )
        if boot_complete or (not boot_rows and cat.exists("postings")):
            # bootstrapped (marker present) or pre-built externally (no
            # bootstrap lineage at all). A replayed bootstrap epoch also
            # lands here and no-ops: its complete row carries this
            # batch_id, which append_to_index's replay guard recognizes.
            append_to_index(
                spark, cat, batch_df, content_col=content_col,
                batch_id=sid,
            )
        else:
            # fresh bootstrap, or intent-without-complete (crash mid-build
            # or between build completion and the marker write): resume.
            cat.lineage_append(
                "appends",
                {"batch_id": sid, "status": "started", "bootstrap": True,
                 "started": time.time()},
            )
            build_index(
                spark, batch_df, out_dir=index_dir,
                content_col=content_col, resume=True, **build_kw
            )
            cat.lineage_append(
                "appends",
                {"batch_id": sid, "status": "complete", "bootstrap": True,
                 "finished": time.time()},
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
