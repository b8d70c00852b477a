"""Index diagnostics (X69): summary/bucket relations consistent with
the raw tables, and fragmentation tracking the append→compact
lifecycle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def corpus(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )


def test_stats_consistent_with_tables(spark, corpus, tmp_path_factory):
    from mahout_spark.index.build import build_index
    from mahout_spark.index.diag import index_bucket_stats, index_stats

    cat = build_index(
        spark, corpus, str(tmp_path_factory.mktemp("diagidx")),
        content_col="text", id_cols=["doc_id"], mode="simple",
        n_buckets=4, docs_per_shard=64, block_size=16,
    )
    row = index_stats(spark, cat).first()
    lex = cat.read(spark, "lexicon")
    assert row["n_terms"] == lex.count()
    assert row["n_postings"] == lex.agg(F.sum("df")).first()[0]
    assert row["n_docs"] == 500
    assert row["n_blocks"] == cat.read(spark, "postings").count()
    assert row["fragmented_groups"] == \
        cat.read(spark, "postings").groupBy("term", "shard").count() \
        .filter("count > 1").count()
    assert row["appends"] == 0 and row["deletes"] == 0

    per_bucket = index_bucket_stats(spark, cat).collect()
    assert [r["bucket"] for r in per_bucket] == sorted(
        r["bucket"] for r in per_bucket)
    assert sum(r["n_terms"] for r in per_bucket) == row["n_terms"]
    assert sum(r["n_blocks"] for r in per_bucket) == row["n_blocks"]
    assert sum(r["n_postings"] for r in per_bucket) == row["n_postings"]


def test_fragmentation_tracks_append_and_compact(spark, corpus,
                                                 tmp_path_factory):
    """Appends create multi-block (term,shard) groups; compaction
    returns fragmentation to the fresh-build floor (block_size cuts
    can legitimately split big groups, so compare against a fresh
    build, not zero)."""
    from mahout_spark.index.append import append_to_index
    from mahout_spark.index.build import build_index
    from mahout_spark.index.compact import compact_index
    from mahout_spark.index.diag import index_stats

    kw = dict(content_col="text", id_cols=["doc_id"], mode="simple",
              n_buckets=4, docs_per_shard=64, block_size=16)
    # parity split: appended docs land in the SAME shards as the base
    # build, so existing (term, shard) groups gain a second block —
    # a range split would only add fresh shards and fragment nothing
    cat = build_index(
        spark, corpus.filter(F.col("doc_id") % 2 == 0),
        str(tmp_path_factory.mktemp("diag_inc")), **kw,
    )
    append_to_index(
        spark, cat, corpus.filter(F.col("doc_id") % 2 == 1),
        content_col="text", batch_id="b1",
    )
    frag_after_append = index_stats(spark, cat).first()["fragmented_groups"]

    fresh = build_index(
        spark, corpus, str(tmp_path_factory.mktemp("diag_fresh")), **kw,
    )
    floor = index_stats(spark, fresh).first()["fragmented_groups"]
    assert frag_after_append > floor  # appends fragment

    compact_index(spark, cat)
    row = index_stats(spark, cat).first()
    assert row["fragmented_groups"] == floor
    assert row["appends"] == 0


def test_content_integrity_detects_corruption(spark, corpus,
                                              tmp_path_factory):
    """Intact index -> zero violations; a mutated source row, a
    source-missing row, and an index-missing row each surface."""
    from mahout_spark.index.build import build_index
    from mahout_spark.index.diag import verify_content_integrity

    cat = build_index(
        spark, corpus, str(tmp_path_factory.mktemp("shaidx")),
        content_col="text", id_cols=["doc_id"], mode="simple",
        n_buckets=4, docs_per_shard=64, block_size=16,
    )
    assert verify_content_integrity(spark, cat, corpus).count() == 0

    mutated = corpus.withColumn(
        "text",
        F.when(F.col("doc_id") == 7, F.lit("tampered")).otherwise(
            F.col("text")),
    )
    bad = verify_content_integrity(spark, cat, mutated).collect()
    assert [r["doc_id"] for r in bad] == [7]
    assert bad[0]["stored_sha"] != bad[0]["source_sha"]

    # doc present in the index but dropped from the source
    missing = verify_content_integrity(
        spark, cat, corpus.filter(F.col("doc_id") != 3)).collect()
    assert [(r["doc_id"], r["source_sha"]) for r in missing] == [(3, None)]

    # doc present in the source but never indexed
    extra_doc = spark.createDataFrame(
        [(90001, "new unindexed doc")], ["doc_id", "text"])
    extra = verify_content_integrity(
        spark, cat, corpus.unionByName(extra_doc)).collect()
    assert [(r["doc_id"], r["stored_sha"]) for r in extra] == [(90001, None)]


def test_disk_usage_accounts_for_every_table(spark, corpus,
                                              tmp_path_factory):
    import os

    from mahout_spark.index.build import build_index
    from mahout_spark.index.diag import disk_usage

    built = build_index(
        spark, corpus, str(tmp_path_factory.mktemp("dudx")),
        content_col="text", id_cols=["doc_id"], mode="simple",
        n_buckets=4, docs_per_shard=64, block_size=16,
    )
    got = {r["table"]: r for r in disk_usage(spark, built).collect()}
    on_disk = {t for t in os.listdir(built.root)
               if os.path.isdir(built.table_path(t))}
    assert set(got) == on_disk and "postings" in got
    # row counts agree with real scans; bytes agree with the filesystem
    for t in ("postings", "lexicon"):
        assert got[t]["n_rows"] == built.read(spark, t).count()
        walked = sum(
            os.stat(os.path.join(d, f)).st_size
            for d, _, fs in os.walk(built.table_path(t)) for f in fs)
        assert got[t]["n_bytes"] == walked
        assert got[t]["n_files"] >= 1
    fracs = [r["bytes_frac"] for r in got.values()]
    assert abs(sum(fracs) - 1.0) < 1e-4
    sizes = [r["n_bytes"] for r in
             sorted(got.values(), key=lambda r: (-r["n_bytes"], r["table"]))]
    assert sizes == sorted(sizes, reverse=True)
    # round-4 VERDICT ask #5: the distributed regime (mapInPandas over
    # the shallow (table, dir) job list) must return the identical
    # relation — force it with a zero threshold
    dist = sorted(
        tuple(r) for r in
        disk_usage(spark, built, distribute_min_dirs=0).collect()
    )
    assert dist == sorted(tuple(r) for r in got.values())
