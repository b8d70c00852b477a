"""Deterministic dense id assignment (SURVEY.md §7.3 hard part #2).

The reference's dictionary assigns dense consecutive ints to terms
(dictionary.file-0, mahout-tfidf output; typed read at
MahoutTermFinderMwkSnptRefactoredCluster.java:374-388). Spark's
``monotonically_increasing_id`` is partition-layout-dependent, so ids would
change run to run — useless for a reproducible index. We instead derive ids
from the *data order* (global rank over the sorted key), computed scalably:

  1. range-repartition + sort within partitions on the key
     (no single-partition global sort),
  2. per-partition counts -> driver (one tiny row per partition),
  3. id = partition offset + intra-partition rank.

Range boundaries come from sampling and may vary between runs, but the
resulting id — the global rank of a unique key — is identical regardless of
where the boundaries fall. Requires the key to be unique (enforced upstream;
the reference's category-key overwrite bug, MahoutTermFinderMwkSnptRefactored
.java:728-732, is deliberately not reproduced).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PID = "__ms_pid"
_OFF = "__ms_offset"


def dense_ids(
    df: DataFrame,
    key_cols: list[str],
    id_col: str,
    num_partitions: int | None = None,
    cleanup: list | None = None,
) -> DataFrame:
    """Add ``id_col`` = dense global rank (0-based) of the unique key.

    The range-partitioned intermediate is persisted (the offsets collected
    in step 2 must describe the same partitioning step 3 reads). Callers
    that materialize the result promptly should pass a ``cleanup`` list
    and unpersist its entries afterwards — otherwise the cache lives until
    session end (acceptable for one-shot spark-submit jobs, a leak in
    long-lived sessions)."""
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    part = (
        df.repartitionByRange(num_partitions, *key_cols)
        .sortWithinPartitions(*key_cols)
        .withColumn(_PID, F.spark_partition_id())
        .persist()
    )
    if cleanup is not None:
        cleanup.append(part)
    counts = sorted(
        part.groupBy(_PID).count().collect(), key=lambda r: r[_PID]
    )
    offsets, total = [], 0
    for row in counts:
        offsets.append((row[_PID], total))
        total += row["count"]
    spark = df.sparkSession
    off_df = spark.createDataFrame(offsets, [_PID, _OFF]) if offsets else (
        spark.createDataFrame([], f"{_PID} int, {_OFF} long")
    )
    w = Window.partitionBy(_PID).orderBy(*key_cols)
    out = (
        part.join(F.broadcast(off_df), _PID)
        .withColumn(id_col, (F.row_number().over(w) - 1 + F.col(_OFF)).cast("long"))
        .drop(_PID, _OFF)
    )
    return out
