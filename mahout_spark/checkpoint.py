"""Explicit lifecycle control for ``localCheckpoint``-ed DataFrames.

The dedup/clustering operators eagerly checkpoint heavy plan subtrees
(signature UDFs, shingle explodes, CC label generations) so Catalyst never
replicates them across branches and iteration plans stay constant-depth.
The blocks behind a local checkpoint are otherwise released only when the
py4j handle is garbage-collected and Spark's ContextCleaner runs — in a
long-lived session (a bench loop, a notebook) superseded blocks pile up in
the block manager in the meantime.

``eager_checkpoint(df, cleanup)`` is ``df.localCheckpoint(eager=True)``
plus registration in a caller-owned cleanup list; ``release(cleanup)``
frees every registered frame's storage immediately. A released frame is
DEAD — local checkpoints cannot be recomputed (that is their contract) —
so callers release only after the results derived from the frame are fully
materialized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_input(df: DataFrame) -> DataFrame:
    """Repartition a FEW-SPLIT input up to cluster parallelism.

    Narrow per-doc stages (signatures, textstats, tokenize) materialize at
    input parallelism; a small corpus arriving as one parquet file would
    run them as ONE task. A real 100 TB corpus arrives in >=10^5 splits,
    so this is a no-op there (never repartitions downward — that would
    add a shuffle of the corpus for nothing)."""
    sc = df.sparkSession.sparkContext
    p = sc.defaultParallelism
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p)
    return df


def eager_checkpoint(df: DataFrame, cleanup: list | None = None) -> DataFrame:
    """``localCheckpoint(eager=True)`` that registers the checkpointed
    frame for explicit release. ``cleanup=None`` keeps the legacy
    behavior (ContextCleaner releases the blocks on GC)."""
    ck = df.localCheckpoint(eager=True)
    if cleanup is not None:
        cleanup.append(ck)
    return ck


def release(frames: list) -> None:
    """Unpersist the checkpoint blocks of every frame in ``frames`` (and
    clear the list). Best-effort: a frame whose blocks are already gone,
    or a non-checkpoint frame, is skipped silently — ContextCleaner
    remains the backstop."""
    for f in frames:
        release_one(f)
    frames.clear()


def release_one(df: DataFrame) -> None:
    """Free one checkpointed frame's RDD blocks immediately (non-blocking
    unpersist). The analyzed plan of a ``localCheckpoint`` result is a
    ``LogicalRDD`` wrapping the persisted internal-row RDD; unpersisting
    that RDD is exactly what ContextCleaner would eventually do."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass
