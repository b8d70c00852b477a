"""Index-time sorting with early-terminating sorted scans (X92).

Lucene's index sorting (ES ``index.sort.field``): when a table is
stored physically ordered by a field, a "sort by that field, top k"
query — the query shape behind every freshness-ranked feed and
cheapest-first export — terminates after reading ~k rows instead of
scanning and sorting the corpus. X76's ``sorted_topk`` still reads the
whole match set; this operator removes even that scan for the
sorted-field case.

Spark-first layout, mirroring write_ivf_table (similarity.py:196): the
corpus is written hive-partitioned by an ORDERED bucket id
(``sbucket=<i>/``) whose boundaries come from one
``approx_percentile`` pass (driver-side cut points; assignment is a
codegen'd count-of-cuts-below, no shuffle beyond the partitioned
write). A manifest records per-bucket row counts. A top-k scan then
choses the shortest bucket PREFIX covering k rows and reads ONLY those
directories — ``sbucket IN (...)`` lands in PartitionFilters, so at
100 TB a top-100 scan opens a few hundred MB. With a residual filter
the prefix escalates adaptively (double the bucket budget until k
matches or the table is exhausted — the same recall-trap loop as
X83's filtered ANN), so a selective predicate can never silently
truncate results.

NULL sort values are stored in bucket -1 and excluded from sorted
scans (the X76 contract: a NULL is unanswerable in a strict order).
Results are provably identical to a full ORDER BY ... LIMIT k because
bucket id is monotone in the sort value and ties never straddle a
boundary (equal values share a bucket by construction).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_sort_manifest.json"


def write_sorted_table(
    docs: DataFrame, sort_col: str, path: str, n_buckets: int = 32,
) -> None:
    """Materialize the index-sorted layout: hive ``sbucket=<i>/``
    partitions ordered by ``sort_col`` (bucket boundaries from ONE
    approx_percentile pass; assignment = count of cut points <= value,
    evaluated JVM-side), NULLs in bucket -1, plus a manifest of
    per-bucket row counts the scanner plans prefixes from."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1: {n_buckets}")
    fracs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = docs.agg(
        F.percentile_approx(sort_col, fracs, 10_000).alias("c")
    ).first()["c"] or []
    # strictly increasing cut points; duplicates (skewed values) merge
    uniq = []
    for c in cuts:
        if c is not None and (not uniq or c > uniq[-1]):
            uniq.append(c)
    v = F.col(sort_col)
    bucket = F.when(v.isNull(), F.lit(-1)).otherwise(
        F.size(F.filter(
            F.array(*[F.lit(c) for c in uniq]), lambda c: c <= v
        ))
    ) if uniq else F.when(v.isNull(), F.lit(-1)).otherwise(F.lit(0))
    (
        docs.withColumn("sbucket", bucket)
        .write.mode("overwrite").partitionBy("sbucket").parquet(path)
    )
    spark = docs.sparkSession
    counts = {
        int(r["sbucket"]): int(r["n"])
        for r in spark.read.parquet(path)
        .groupBy("sbucket").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    manifest = {
        "sort_col": sort_col,
        "buckets": sorted((b, n) for b, n in counts.items() if b >= 0),
        "n_nulls": counts.get(-1, 0),
    }
    with open(os.path.join(path, MANIFEST), "w") as f:
        json.dump(manifest, f)


def sorted_scan_topk(
    spark: SparkSession,
    path: str,
    k: int = 10,
    descending: bool = False,
    pred=None,
    id_col: str = "doc_id",
    cols: list[str] | None = None,
) -> DataFrame:
    """Early-terminating top-k over a ``write_sorted_table`` layout:
    plan the shortest bucket prefix covering ``k`` rows from the
    manifest (driver-side arithmetic, zero jobs), scan ONLY those
    partitions, ORDER BY (sort_col, id) LIMIT k. With ``pred`` (a
    Column or SQL string) the prefix escalates — count the matches in
    the current prefix with one cheap aggregate, double the bucket
    budget until k matches or every bucket is read — so selective
    filters never truncate. Identical to the full ORDER BY at any
    prefix (ties share buckets; plan-gated to prune partitions)."""
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    with open(os.path.join(path, MANIFEST)) as f:
        man = json.load(f)
    sort_col = man["sort_col"]
    buckets = [(int(b), int(n)) for b, n in man["buckets"]]
    if descending:
        buckets = buckets[::-1]
    order = [F.col(sort_col).desc() if descending
             else F.col(sort_col).asc(), F.col(id_col).asc()]
    table = spark.read.parquet(path)
    if pred is not None:
        pred = F.expr(pred) if isinstance(pred, str) else pred

    def prefix_df(n_bkts: int) -> DataFrame:
        ids = [b for b, _ in buckets[:n_bkts]]
        df = table.filter(F.col("sbucket").isin(ids))
        return df.filter(pred) if pred is not None else df

    # plan the prefix: counts are exact for the unfiltered case, a
    # starting guess under a filter
    need, n_bkts = 0, 0
    for _, n in buckets:
        n_bkts += 1
        need += n
        if need >= k:
            break
    while pred is not None and n_bkts < len(buckets):
        # one partial-agg count over the pruned prefix (limit(k) first:
        # the count can stop at k, we never need the exact total)
        if prefix_df(n_bkts).limit(k).count() >= k:
            break
        n_bkts = min(len(buckets), n_bkts * 2)
    out = prefix_df(n_bkts)
    keep = cols if cols is not None else [
        c for c in table.columns if c != "sbucket"]
    return out.select(*keep).orderBy(*order).limit(k)
