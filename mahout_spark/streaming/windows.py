"""Event-time windowed aggregation with watermarked late-data handling.

The reference has no streaming surface (SURVEY.md §2.9); this module is
the engine's Structured-Streaming counterpart of the batch aggregation
operators (A1/A9) for feeds like the ``events`` table: tumbling/sliding
event-time windows with a watermark bounding state, the canonical shape
for "docs-indexed-per-minute" / rolling corpus telemetry at ingest time.

The same function body serves batch and stream: pass a batch DataFrame
and it's a plain window-grouped aggregation (tested for equality against
the streaming result — Structured Streaming's semantics guarantee the
final availableNow output matches the batch computation).

Scale notes: state size = (#keys × windows inside the watermark) — the
watermark is the knob that keeps 100 TB/day feeds bounded; aggregation is
partial+final hash agg per update, shuffled by (key, window) only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_stats(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Per (event_type, window): count + exact value sum (micros — the
    engine's money/determinism rule) + distinct-user count.

    On a streaming input, apply the watermark first so window state older
    than ``watermark`` is evicted and late rows beyond it dropped;
    ``approx_count_distinct`` is used for users on streams (exact
    count_distinct isn't supported in streaming aggregation — documented
    divergence; batch callers get the exact count).
    """
    streaming = events.isStreaming
    df = events
    if streaming:
        df = df.withWatermark(ts_col, watermark)
    win = F.window(F.col(ts_col), window, slide or window)
    users = (
        F.approx_count_distinct("user_id")
        if streaming
        else F.count_distinct("user_id")
    )
    micros = F.round(F.col("value") * 1_000_000).cast("long")
    return (
        df.groupBy(win.alias("win"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(micros).alias("value_micros"),
            users.alias("n_users"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            key_col,
            "n_events",
            "value_micros",
            "n_users",
        )
    )


def run_stream_to_memory(
    spark,
    input_dir: str,
    schema: str,
    query_name: str,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    timeout_sec: int = 120,
) -> DataFrame:
    """Drive windowed_event_stats over a parquet landing dir as a stream
    (availableNow), complete-mode memory sink; returns the final result
    as a DataFrame. Used by tests and demos — production would writeStream
    to a table sink instead."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    agg = windowed_event_stats(
        stream, window=window, slide=slide, watermark=watermark
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return spark.table(query_name)


def sessionized_event_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Session windows (X110): per ``key_col``, events closer than
    ``gap`` merge into one session — (key, session_start = first event,
    session_end = last event + gap, n_events, value_micros). Spark's
    merge rule is CLOSED on the boundary: each event spans
    ``[t, t+gap]`` for merging purposes, so an event at exactly
    ``prev + gap`` still MERGES; only a strictly larger gap starts a
    new session (the boundary contract the oracle and tests pin).

    Same dual body as windowed_event_stats: batch input → plain
    ``session_window`` aggregation (relationally ≡ the gaps-and-islands
    SQL the oracle runs); streaming input → watermarked stateful
    session merge, state bounded by (keys × open sessions), evicted
    once the watermark passes a session's end — the canonical
    user-activity rollup at ingest time. NULL timestamps are excluded
    (window semantics drop them in both engines)."""
    streaming = events.isStreaming
    df = events.filter(F.col(ts_col).isNotNull())
    if streaming:
        df = df.withWatermark(ts_col, watermark)
    win = F.session_window(F.col(ts_col), gap)
    micros = F.round(F.col("value") * 1_000_000).cast("long")
    return (
        df.groupBy(win.alias("win"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(micros).alias("value_micros"),
        )
        .select(
            F.col(key_col),
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
            "value_micros",
        )
    )


def run_sessions_to_memory(
    spark,
    input_dir: str,
    schema: str,
    query_name: str,
    gap: str = "30 minutes",
    watermark: str = "24 hours",
    timeout_sec: int = 120,
) -> DataFrame:
    """Drive sessionized_event_stats over a parquet landing dir as an
    availableNow stream (complete-mode memory sink) — the session twin
    of run_stream_to_memory."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    agg = sessionized_event_stats(stream, gap=gap, watermark=watermark)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return spark.table(query_name)
