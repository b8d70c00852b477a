"""Inverted-index build (SURVEY.md §7.1 Phase 2).

Physical design — chosen for the 100 TB / 10^12-file target, exercised here
at sandbox scale:

* **Document-sharded postings.** Every posting row carries
  ``shard = doc_id // docs_per_shard``. All terms share the same global
  docid-range boundaries, so (a) a hot term's postings split across many
  shards — skew defused structurally, no hash-salting rebalance pass needed
  (generalizes BASELINE.json's salted repartition: the salt is the docid
  range, which keeps blocks non-overlapping and docid-sorted for free), and
  (b) at query time all query terms' blocks for one docid range co-locate in
  one task, which is exactly what top-k pruning needs.

* **Term-bucket partitioning on disk.** ``bucket = pmod(xxhash64(term),
  n_buckets)`` is the hive partition of the postings table: a query term
  maps to one directory — partition pruning is the on-disk realization of
  lexicon lookup. Buckets are also the checkpoint/resume unit: each bucket
  partition is written atomically (stage + rename) with a lineage row; a
  restarted build skips complete buckets (BASELINE.json resumable-build
  requirement).

* **Blocks.** Within (term, shard), postings sort by doc_id and cut into
  ``block_size`` blocks: delta+varint doc_ids / varint tfs / varint doclens
  (exact ints -> exact BM25 at query), with per-block
  (count, first_docid, block_max_docid, block_max_score) for block-max
  skipping.

Shuffle inventory of a full build: tokenize (narrow) -> shuffle 1
(write tf_raw by bucket) -> shuffle 2 (lexicon groupBy term) -> shuffle 3
(per-bucket groupBy (term, shard) for encoding). No driver-side corpus
state anywhere; the only collects are tiny (per-partition offset table,
lexicon rows for query terms).
"""

from __future__ import annotations

import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mahout_spark import BM25_B, BM25_K1
from mahout_spark.functions import dense_ids
from mahout_spark.index.codec import encode_doc_block
from mahout_spark.operators import stats
from mahout_spark.sources.catalog import ParquetCatalog

POSTINGS_SCHEMA = (
    "term string, term_id long, shard long, block_id int, count int, "
    "first_docid long, block_max_docid long, block_max_score double, "
    "doc_ids binary, tfs binary, doclens binary"
)


def _make_encoder(n_docs: int, avgdl: float, k1: float, b: float,
                  block_size: int):
    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        doc = pdf["doc_id"].to_numpy(np.uint64)
        tf = pdf["tf"].to_numpy(np.uint64)
        dl = pdf["doclen"].to_numpy(np.uint64)
        term = pdf["term"].iloc[0]
        term_id = int(pdf["term_id"].iloc[0])
        shard = int(pdf["shard"].iloc[0])
        dfv = int(pdf["df"].iloc[0])
        idf = np.log(1.0 + (n_docs - dfv + 0.5) / (dfv + 0.5))
        tff = tf.astype(np.float64)
        contrib = idf * (tff * (k1 + 1.0)) / (
            tff + k1 * (1.0 - b + b * dl.astype(np.float64) / avgdl)
        )
        rows = []
        for blk, i0 in enumerate(range(0, len(doc), block_size)):
            sl = slice(i0, i0 + block_size)
            d, t, l = doc[sl], tf[sl], dl[sl]
            db, tb, lb = encode_doc_block(d, t, l)
            rows.append(
                (
                    term, term_id, shard, blk, len(d),
                    int(d[0]), int(d[-1]), float(contrib[sl].max()),
                    db, tb, lb,
                )
            )
        return pd.DataFrame(
            rows,
            columns=[
                "term", "term_id", "shard", "block_id", "count",
                "first_docid", "block_max_docid", "block_max_score",
                "doc_ids", "tfs", "doclens",
            ],
        )

    return encode


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    content_col: str = "content",
    id_cols: list[str] | None = None,
    mode: str = "text",
    n_buckets: int = 8,
    docs_per_shard: int = 1 << 14,
    block_size: int = 128,
    k1: float = BM25_K1,
    b: float = BM25_B,
    resume: bool = True,
    build_commit: str = "",
    **tok_kw,
) -> ParquetCatalog:
    """Build (or resume building) the index under ``out_dir``.

    Tables written: docstats, tf_raw (bucket-partitioned intermediate),
    lexicon, postings (bucket-partitioned), plus _meta.json scalars and
    _lineage.jsonl per-bucket rows.
    """
    cat = ParquetCatalog(out_dir)
    id_cols = id_cols or ["doc_id"]

    # ---- stage 0: doc ids -------------------------------------------------
    if id_cols == ["doc_id"]:
        docs_keyed = docs
    else:
        # deterministic dense doc_id from the unique natural key
        docs_keyed = dense_ids(docs, id_cols, "doc_id")

    # ---- stage 1: tf_raw + docstats + scalars (resume unit: whole stage) --
    stage1_done = (
        resume
        and cat.exists("tf_raw")
        and cat.exists("docstats")
        and _meta_matches(cat, mode, n_buckets, docs_per_shard, block_size)
    )
    if not stage1_done:
        t0 = time.time()
        tf = stats.term_frequencies(
            docs_keyed, content_col, ["doc_id"], mode=mode, **tok_kw
        ).withColumn(
            "shard", (F.col("doc_id") / F.lit(docs_per_shard)).cast("long")
        ).withColumn(
            "bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets))
        )
        stage = cat.table_path("tf_raw") + ".__stage"
        (
            tf.repartition(F.col("bucket"))
            .write.mode("overwrite").partitionBy("bucket").parquet(stage)
        )
        import os
        import shutil

        final = cat.table_path("tf_raw")
        if os.path.isdir(final):
            shutil.rmtree(final)
        os.rename(stage, final)

        docstats = docs_keyed.select(
            "doc_id",
            *[c for c in id_cols if c != "doc_id"],
            F.sha2(F.col(content_col).cast("string"), 256).alias("content_sha"),
        )
        tf_raw = cat.read(spark, "tf_raw")
        doclens = tf_raw.groupBy("doc_id").agg(F.max("doclen").alias("doclen"))
        cat.overwrite_table(
            docstats.join(doclens, "doc_id", "left").fillna(0, ["doclen"]),
            "docstats",
        )
        n_docs = docs_keyed.count()
        row = doclens.agg(F.avg("doclen")).first()
        avgdl = float(row[0]) if row[0] is not None else 0.0
        cat.write_meta(
            "postings",
            {
                "n_docs": n_docs, "avgdl": avgdl, "mode": mode,
                "n_buckets": n_buckets, "docs_per_shard": docs_per_shard,
                "block_size": block_size, "k1": k1, "b": b,
                "build_commit": build_commit,
                "stage1_sec": round(time.time() - t0, 3),
            },
        )
    meta = cat.read_meta("postings")
    n_docs, avgdl = meta["n_docs"], meta["avgdl"]

    # ---- stage 2: lexicon ---------------------------------------------------
    if not (resume and cat.exists("lexicon")):
        tf_raw = cat.read(spark, "tf_raw")
        lex = tf_raw.groupBy("term", "bucket").agg(
            F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf")
        )
        cat.overwrite_table(dense_ids(lex, ["term"], "term_id"), "lexicon")

    # ---- stage 3: postings, per-bucket (resume unit: bucket) ---------------
    lexicon = cat.read(spark, "lexicon")
    done = {
        r["partition_id"]
        for r in cat.lineage_rows("postings")
        if r.get("status") == "complete"
    }
    encoder = _make_encoder(n_docs, avgdl, k1, b, block_size)
    for bucket in range(n_buckets):
        if resume and bucket in done and cat.partition_complete(
            "postings", "bucket", bucket
        ):
            continue
        started = time.time()
        try:
            part = cat.read_partitions(spark, "tf_raw", "bucket", [bucket])
        except FileNotFoundError:
            cat.lineage_append(
                "postings",
                {"partition_id": bucket, "status": "complete", "rows_in": 0,
                 "rows_out": 0, "sha_ok": True, "build_commit": build_commit,
                 "started": started, "finished": time.time()},
            )
            continue
        enc_in = part.join(
            lexicon.filter(F.col("bucket") == bucket).select(
                "term", "term_id", "df"
            ),
            "term",
        )
        blocks = enc_in.groupBy("term", "shard").applyInPandas(
            encoder, POSTINGS_SCHEMA
        )
        cat.overwrite_partition(blocks, "postings", "bucket", bucket)
        written = cat.read_partitions(spark, "postings", "bucket", [bucket])
        agg = written.agg(
            F.sum("count").alias("rows_in"), F.count(F.lit(1)).alias("rows_out")
        ).first()
        cat.lineage_append(
            "postings",
            {
                "partition_id": bucket, "status": "complete",
                "rows_in": int(agg["rows_in"] or 0),
                "rows_out": int(agg["rows_out"] or 0),
                "sha_ok": True, "build_commit": build_commit,
                "started": started, "finished": time.time(),
            },
        )

    # ---- stage 4: lexicon max_score (block-max global bound) ---------------
    if "max_score" not in cat.read(spark, "lexicon").columns:
        postings = cat.read(spark, "postings")
        ms = postings.groupBy("term_id").agg(
            F.max("block_max_score").alias("max_score")
        )
        cat.overwrite_table(
            cat.read(spark, "lexicon").join(ms, "term_id", "left"), "lexicon"
        )
    return cat


def _meta_matches(cat, mode, n_buckets, docs_per_shard, block_size) -> bool:
    try:
        m = cat.read_meta("postings")
    except FileNotFoundError:
        return False
    return (
        m.get("mode") == mode
        and m.get("n_buckets") == n_buckets
        and m.get("docs_per_shard") == docs_per_shard
        and m.get("block_size") == block_size
    )


def verify_sha(spark: SparkSession, docs: DataFrame, cat: ParquetCatalog,
               content_col: str = "content") -> int:
    """Per-row invariant check (BASELINE.json): sha256(content) equality
    between the source table and the built docstats. Returns mismatch count
    (anti-join — fully distributed, no collect)."""
    src = docs.select(
        "doc_id", F.sha2(F.col(content_col).cast("string"), 256).alias("sha_src")
    )
    built = cat.read(spark, "docstats").select("doc_id", "content_sha")
    return (
        src.join(built, "doc_id", "full")
        .filter(
            (F.col("sha_src") != F.col("content_sha"))
            | F.col("sha_src").isNull()
            | F.col("content_sha").isNull()
        )
        .count()
    )
