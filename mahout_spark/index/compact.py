"""Postings compaction after incremental appends.

Appends (index/append.py) deliberately never rewrite existing blocks:
new docs land as NEW blocks per (term, shard), and because corpus stats
(df, avgdl) drift, queries switch from the tight build-time
``block_max_score`` bounds to the looser stats-independent
(block_max_tf, block_min_dl) bounds. Over many appends two costs
accumulate:

* block fragmentation — each append adds at least one (usually small)
  block per touched (term, shard), so block-constant costs (row
  overhead, decode calls, bound checks) grow with append count;
* pruning slack — the stats-independent bounds are valid but looser
  than fresh block maxima, so WAND decodes more blocks than a fresh
  build would.

``compact_index`` re-encodes the postings from ``tf_raw`` (which holds
the union of all appended rows) under the CURRENT corpus stats — the
same one-shuffle whole-index encode as a fresh build's stage 3 — and
resets the ``appends`` counter so queries use stored (tight) bounds
again. Deterministic: the encoder is a pure function of the sorted
(term, shard, doc_id) stream, so a compacted index is block-for-block
identical to a from-scratch rebuild over the same corpus, without
re-tokenizing a single document (tokenization dominates build cost —
compaction costs one join + shuffle + write over the tf rows only).

Operationally this is the Lucene segment-merge / LSM-compaction analog:
run it when append count or measured block fragmentation warrants, e.g.
nightly on a rolling-ingest index. Idempotent and crash-safe per bucket
(same staged atomic partition overwrite as the build).
"""

from __future__ import annotations

import time

from pyspark.sql import SparkSession

from mahout_spark.index.build import _encode_all_buckets, _make_encoder
from mahout_spark.sources.catalog import ParquetCatalog


def compact_index(
    spark: SparkSession,
    cat: ParquetCatalog,
    build_commit: str = "",
) -> dict:
    """Compact the postings table in place; returns the updated meta.

    Requires a consistent index (no in-flight append). Reads tf_raw +
    lexicon, re-encodes every bucket in one job, atomically swaps each
    bucket partition, then writes meta with fresh stats and appends=0.
    """
    meta = cat.read_meta("postings")
    encoder = _make_encoder(
        meta["n_docs"], meta["avgdl"], meta["k1"], meta["b"],
        meta["block_size"], positional=bool(meta.get("positional")),
    )
    lexicon = cat.read(
        spark, "lexicon", schema_json=meta.get("lexicon_schema")
    )
    started = time.time()
    _encode_all_buckets(
        spark, cat, lexicon, encoder, int(meta["n_buckets"]),
        build_commit or f"compact-{int(started)}",
    )
    meta = dict(meta)
    meta["appends"] = 0  # block_max_score is tight again
    meta["compacted_at"] = started
    cat.write_meta("postings", meta)
    return meta
