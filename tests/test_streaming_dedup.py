"""Ingest-time streaming exact dedup (X127, streaming/dedup.py): the
availableNow streaming survivors must carry the same distinct-content
set as the deterministic batch replay; the batch arm's canonical is the
min-id row per content key."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SCHEMA = "doc_id long, text string, ts timestamp"


@pytest.fixture(scope="module")
def docs(spark):
    base = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )
    # plant exact duplicates: every doc_id % 7 == 0 re-arrives later
    # under a new id (sf0.001 texts are all distinct otherwise)
    dups = base.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 100_000).alias("doc_id"), "text"
    )
    return base.unionByName(dups).withColumn(
        "ts",
        F.expr(
            "timestamp'2024-01-01 00:00:00' + "
            "make_interval(0, 0, 0, 0, 0, 0, doc_id % 90000)"
        ),
    )


def test_stream_survivors_match_batch_replay(spark, docs,
                                             tmp_path_factory):
    from mahout_spark.streaming.dedup import (
        dedup_stream,
        run_dedup_stream_to_memory,
    )

    landing = str(tmp_path_factory.mktemp("dd_landing"))
    # two files -> two micro-batches; the corpus's exact duplicates are
    # spread across both, so the duplicate state must survive batch
    # boundaries (all inside the watermark horizon)
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.mode(
        "append").parquet(landing)
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode(
        "append").parquet(landing)

    got = run_dedup_stream_to_memory(
        spark, landing, SCHEMA, "dedup_stream_test", watermark="1 day"
    )
    batch = dedup_stream(docs)

    n_docs = docs.count()
    assert batch.count() == got.count() < n_docs  # corpus HAS dups
    assert {r["text"] for r in got.collect()} == \
        {r["text"] for r in batch.collect()}
    # no content key appears twice among survivors
    assert got.select("text").distinct().count() == got.count()


def test_batch_arm_keeps_min_id_per_content(spark, docs):
    from mahout_spark.streaming.dedup import dedup_stream

    batch = dedup_stream(docs)
    want = docs.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    got_ids = {r["doc_id"] for r in batch.collect()}
    want_ids = {r["doc_id"] for r in want.collect()}
    assert got_ids == want_ids
