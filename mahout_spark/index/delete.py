"""Document deletion: tombstones now, purge at compaction.

The Lucene model, because it is the only one that scales: a delete is an
O(1) metadata write (the doc_id lands in a ``tombstones`` table), NOT a
postings rewrite — postings blocks are immutable between compactions.
Consequences, both deliberate and test-gated:

* **Queries exclude deleted docs immediately** — every retrieval kernel
  (WAND or/and, phrase, proximity, boolean, match-set) masks its
  candidates against the live tombstone set before top-k selection.
* **Corpus statistics (df, avgdl, N) keep their pre-delete values until
  compaction**, so surviving docs' BM25 scores do not move when a
  neighbor is deleted. This is exactly Lucene's behavior (docFreq counts
  deleted docs until merge) and it is what makes delete O(1): stats
  refresh would require re-aggregating the corpus per delete.
* **``compact_index(purge_deleted=True)`` reclaims** — tf_raw/docstats
  shed tombstoned rows, lexicon df and avgdl/N are recomputed, postings
  re-encode under the fresh stats, and the result is block-for-block the
  index a from-scratch build over the surviving docs would produce.

Pruning safety: a θ threshold seeded from a deleted doc's lower bound
could over-prune live docs (fewer than k live docs might clear it), so
the WAND kernel filters the seed BEFORE θ selection — θ is then the k-th
best LIVE lower bound and the safe-up-to-k argument goes through
unchanged.

Scale: the tombstone set rides into kernels as a sorted int64 array in
the UDF closure — fine to ~10^7-10^8 deletes (0.1-1 GB broadcast-ish
cost). Beyond that a real deployment shards the mask per docid range
(tombstones are doc_id-sorted, so a per-shard slice join is one
range-partitioned semi-join) — documented seam, same kernel signature.
"""

from __future__ import annotations

import time

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mahout_spark.sources.catalog import ParquetCatalog

_TOMB_SCHEMA = "doc_id long, deleted_at double"


def delete_docs(
    spark: SparkSession,
    cat: ParquetCatalog,
    doc_ids,
) -> dict:
    """Tombstone ``doc_ids`` (iterable of ints or a DataFrame with a
    ``doc_id`` column). Idempotent: already-deleted ids are ignored.
    Returns the updated meta. O(tombstones), never touches postings."""
    meta = cat.read_meta("postings")
    if isinstance(doc_ids, DataFrame):
        new = doc_ids.select(F.col("doc_id").cast("long")).distinct()
    else:
        ids = sorted({int(d) for d in doc_ids})
        new = spark.createDataFrame(
            [(d,) for d in ids], "doc_id long"
        )
    if cat.exists("tombstones"):
        existing = cat.read(spark, "tombstones", schema_json=None)
        new = new.join(existing.select("doc_id"), "doc_id", "left_anti")
    now = time.time()
    rows = new.withColumn("deleted_at", F.lit(now)).collect()
    if rows:
        cat.append_table(
            spark.createDataFrame(rows, _TOMB_SCHEMA), "tombstones"
        )
    n_total = int(meta.get("deletes", 0)) + len(rows)
    meta = dict(meta)
    meta["deletes"] = n_total
    cat.write_meta("postings", meta)  # bumps meta_version -> caches drop
    cat.lineage_append("postings", {
        "op": "delete", "new": len(rows), "total": n_total, "at": now,
    })
    return meta


def deleted_array(
    spark: SparkSession, cat: ParquetCatalog, meta: dict | None = None
) -> np.ndarray | None:
    """The live tombstone set as a SORTED uint64 array (kernel mask
    format), or None when nothing is deleted. One tiny scan of the
    tombstones table — callers that serve many queries (Searcher) cache
    this per meta_version epoch."""
    if meta is None:
        meta = cat.read_meta("postings")
    if not int(meta.get("deletes", 0)) or not cat.exists("tombstones"):
        return None
    rows = cat.read(spark, "tombstones").select("doc_id").collect()
    if not rows:
        return None
    return np.sort(np.asarray(
        [r["doc_id"] for r in rows], dtype=np.uint64
    ))


def live_mask(docs: np.ndarray, deleted: np.ndarray | None) -> np.ndarray:
    """Boolean mask of ``docs`` entries NOT in the sorted ``deleted``
    set. np.isin dispatches to a sort-based merge; docs arrays here are
    already block-pruned candidates, so this is linear-ish and tiny next
    to decode cost."""
    if deleted is None or len(docs) == 0:
        return np.ones(len(docs), dtype=bool)
    return ~np.isin(docs, deleted)
