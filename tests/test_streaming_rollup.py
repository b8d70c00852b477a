"""Streaming rollup (X148, streaming/rollup.py): stream ≡ batch over
micro-batched landings including an OUT-OF-ORDER late batch, and crash
replay idempotency of the raw landing."""

import datetime as dt
import os

import pytest

from mahout_spark.operators.rollup import rollup_build, rollup_query
from mahout_spark.streaming.rollup import run_rollup_stream

SCHEMA = "event_id long, ts timestamp, value double"


def _chunk(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "overwrite").parquet(path)


@pytest.fixture(scope="module")
def landed(spark, tmp_path_factory):
    """Three files: two in order, then a LATE file whose rows belong to
    the first file's buckets."""
    d = str(tmp_path_factory.mktemp("ru_in"))
    _chunk(spark, os.path.join(d, "a.parquet"), [
        (i, dt.datetime(2024, 1, 1, i % 24), float(i)) for i in range(50)
    ])
    _chunk(spark, os.path.join(d, "b.parquet"), [
        (100 + i, dt.datetime(2024, 1, 2, i % 24), float(i) + 0.5)
        for i in range(50)
    ])
    _chunk(spark, os.path.join(d, "c_late.parquet"), [
        (200, dt.datetime(2024, 1, 1, 3, 30), 999.0),   # repairs Jan 1
        (201, dt.datetime(2024, 1, 2, 7, 15), -5.0),    # repairs Jan 2
    ])
    return d


def test_stream_equals_batch_with_late_data(spark, landed, tmp_path):
    out = str(tmp_path / "ru_stream")
    run_rollup_stream(spark, os.path.join(landed, "*"), SCHEMA,
                      out, intervals=("hour", "day"))
    raw = spark.read.parquet(os.path.join(out, "raw"))
    out2 = str(tmp_path / "ru_batch")
    rollup_build(spark, raw, out2, intervals=("hour", "day"))
    for iv in ("hour", "day"):
        a = [tuple(r) for r in rollup_query(spark, out, iv).collect()]
        b = [tuple(r) for r in rollup_query(spark, out2, iv).collect()]
        assert a == b, iv
    # the late rows actually landed in their OLD buckets
    day = {r["bucket"]: r for r in
           rollup_query(spark, out, "day").collect()}
    assert day[dt.datetime(2024, 1, 1)]["max_value"] == 999.0
    assert day[dt.datetime(2024, 1, 2)]["min_value"] == -5.0
    assert day[dt.datetime(2024, 1, 1)]["n_events"] == 51


def test_replayed_batch_is_idempotent(spark, landed, tmp_path):
    """Re-running the handler for an already-landed batch id must
    overwrite its own landing dir, not duplicate rows."""
    from mahout_spark.streaming.rollup import foreach_batch_rollup

    out = str(tmp_path / "ru_replay")
    handle = foreach_batch_rollup(spark, out, intervals=("day",))
    batch = spark.read.parquet(os.path.join(landed, "a.parquet"))
    handle(batch, 0)
    once = [tuple(r) for r in rollup_query(spark, out, "day").collect()]
    handle(batch, 0)  # crash replay of the same micro-batch
    twice = [tuple(r) for r in rollup_query(spark, out, "day").collect()]
    assert once == twice
    n = spark.read.parquet(os.path.join(out, "raw")).count()
    assert n == batch.count()
