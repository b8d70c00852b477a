"""Incremental index append (BASELINE resumable/incremental-build
requirement; SURVEY.md §2.9 — incremental batch, the foreachBatch target).

Appending a new corpus partition touches only:

* **tf_raw / postings** — new rows/blocks APPENDED per bucket partition;
  existing blocks are never rewritten. New docs carry new doc_ids, so new
  blocks never overlap old ones, and the WAND kernel concatenates blocks
  of a (term, shard) group order-independently. Work is proportional to
  the new partition, not the index size — the property that makes 10^12
  files feasible as rolling appends.
* **lexicon** — incremental merge: old ∪ new term stats (df/cf summed);
  brand-new terms get term_ids continuing after the old max (old ids are
  immutable — postings already encode them).
* **docstats / meta** — appended rows; n_docs/avgdl recomputed from the
  doclen aggregate (cheap: one column of the doc table, not the corpus).

Because df/avgdl move, build-time ``block_max_score`` bounds go stale;
queries on an appended index switch to the stats-independent
(block_max_tf, block_min_dl) bounds (see index/wand.py) — slightly looser
pruning, identical exact results. Rebuild (build_index, resume=False)
restores tight bounds when drift warrants it.

Exactly-once: each append carries a ``batch_id``; a batch whose lineage
row is complete is skipped entirely (the foreachBatch replay contract).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from mahout_spark.index.build import POSTINGS_SCHEMA, _make_encoder
from mahout_spark.operators import stats
from mahout_spark.sources.catalog import ParquetCatalog


def append_to_index(
    spark: SparkSession,
    cat: ParquetCatalog,
    new_docs: DataFrame,
    content_col: str = "content",
    batch_id: str | None = None,
    **tok_kw,
) -> ParquetCatalog:
    """Append ``new_docs`` (must carry unique, previously unseen doc_id)
    to an existing index. Idempotent per batch_id."""
    meta = cat.read_meta("postings")
    if batch_id is not None and any(
        r.get("batch_id") == batch_id and r.get("status") == "complete"
        for r in cat.lineage_rows("appends")
    ):
        return cat  # replayed batch — already applied

    started = time.time()
    mode = meta["mode"]
    n_buckets = meta["n_buckets"]
    docs_per_shard = meta["docs_per_shard"]

    # -- uniqueness guard (the reference's category-key overwrite bug,
    # SURVEY.md §2.1 S4, made structurally impossible) --------------------
    existing_ids = cat.read(spark, "docstats").select("doc_id")
    n_dup = new_docs.join(existing_ids, "doc_id", "left_semi").count()
    if n_dup:
        raise ValueError(
            f"append rejected: {n_dup} doc_ids already present in the index"
        )

    # -- new term stats ----------------------------------------------------
    tf = (
        stats.term_frequencies(
            new_docs, content_col, ["doc_id"], mode=mode,
            lang_col=meta.get("lang_col"), **tok_kw
        )
        .withColumn(
            "shard", (F.col("doc_id") / F.lit(docs_per_shard)).cast("long")
        )
        .withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)))
    )
    tf.cache()
    try:
        cat.append_partitioned(tf, "tf_raw", "bucket")

        # -- docstats + scalars -------------------------------------------
        doclens = tf.groupBy("doc_id").agg(F.max("doclen").alias("doclen"))
        new_stats = (
            new_docs.select(
                "doc_id",
                F.sha2(F.col(content_col).cast("string"), 256)
                .alias("content_sha"),
            )
            .join(doclens, "doc_id", "left")
            .fillna(0, ["doclen"])
        )
        old_cols = cat.read(spark, "docstats").columns
        for c in old_cols:
            if c not in new_stats.columns:
                new_stats = new_stats.withColumn(c, F.lit(None).cast("string"))
        cat.append_table(new_stats.select(*old_cols), "docstats")

        docstats = cat.read(spark, "docstats")
        n_docs = docstats.count()
        row = docstats.filter(F.col("doclen") > 0).agg(
            F.avg("doclen")
        ).first()
        avgdl = float(row[0]) if row[0] is not None else 0.0

        # -- lexicon merge -------------------------------------------------
        new_lex = tf.groupBy("term", "bucket").agg(
            F.count(F.lit(1)).alias("df_new"), F.sum("tf").alias("cf_new")
        )
        old_lex = cat.read(spark, "lexicon")
        max_id_row = old_lex.agg(F.max("term_id")).first()
        next_id = int(max_id_row[0]) + 1 if max_id_row[0] is not None else 0
        merged = (
            old_lex.select("term", "bucket", "df", "cf", "term_id")
            .join(new_lex, ["term", "bucket"], "full")
            .fillna(0, ["df", "cf", "df_new", "cf_new"])
            .withColumn("df", F.col("df") + F.col("df_new"))
            .withColumn("cf", F.col("cf") + F.col("cf_new"))
            .drop("df_new", "cf_new")
        )
        # new terms: dense ids continuing after the old max (sorted by term
        # for determinism, same recipe as functions.dense_ids)
        w = Window.orderBy("term")
        fresh = (
            merged.filter(F.col("term_id").isNull())
            .withColumn(
                "term_id", F.row_number().over(w) + F.lit(next_id - 1)
            )
        )
        kept = merged.filter(F.col("term_id").isNotNull())
        cat.overwrite_table_partitioned(
            kept.unionByName(fresh), "lexicon", "bucket"
        )

        # -- encode + append new postings blocks --------------------------
        lexicon = cat.read(spark, "lexicon")
        encoder = _make_encoder(
            n_docs, avgdl, meta["k1"], meta["b"], meta["block_size"]
        )
        from mahout_spark.index.build import _maybe_broadcast

        enc_in = tf.join(
            _maybe_broadcast(lexicon.select("term", "term_id", "df")), "term"
        )
        blocks = (
            enc_in.repartition(
                max(spark.sparkContext.defaultParallelism, 8), "term"
            )
            .sortWithinPartitions("term", "shard", "doc_id")
            .mapInPandas(encoder, POSTINGS_SCHEMA)
            .withColumn(
                "bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets))
            )
        )
        cat.append_partitioned(blocks, "postings", "bucket")

        # -- meta + lineage ------------------------------------------------
        meta.update(
            {
                "n_docs": n_docs,
                "avgdl": avgdl,
                "appends": int(meta.get("appends", 0)) + 1,
            }
        )
        cat.write_meta("postings", meta)
        cat.lineage_append(
            "appends",
            {
                "batch_id": batch_id,
                "status": "complete",
                "rows_in": int(new_docs.count()),
                "started": started,
                "finished": time.time(),
            },
        )
    finally:
        tf.unpersist()
    return cat
