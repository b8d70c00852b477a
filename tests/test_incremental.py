"""Incremental append + streaming build tests.

Gate (SURVEY.md §5.2): an index built as initial-build + appends must
answer every query with results rank-identical (and score-identical) to a
single full build over the union — under the append-safe block bounds.
Plus exactly-once idempotency and the uniqueness guard.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

QUERIES = [
    (["spark", "query", "data"], False),
    (["spark", "query", "data"], True),
    (["window", "stream"], False),
    (["vector"], False),
    (["table", "scan", "filter"], True),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .select("doc_id", "text")
    )


def _results(spark, cat, k=10):
    from mahout_spark.index.wand import topk

    out = {}
    for terms, mode_all in QUERIES:
        rows = topk(spark, cat, terms, k=k, mode_all=mode_all).collect()
        out[(tuple(terms), mode_all)] = [
            (r["doc_id"], r["score"]) for r in rows
        ]
    return out


class TestAppend:
    def test_append_equals_full_build(self, spark, corpus, tmp_path_factory):
        from mahout_spark.index.append import append_to_index
        from mahout_spark.index.build import build_index
        from mahout_spark.sources.catalog import ParquetCatalog

        half_a = corpus.filter(F.col("doc_id") < 250)
        half_b = corpus.filter(F.col("doc_id") >= 250)

        full_dir = str(tmp_path_factory.mktemp("full"))
        inc_dir = str(tmp_path_factory.mktemp("inc"))

        full_cat = build_index(
            spark, corpus, out_dir=full_dir, content_col="text",
            id_cols=["doc_id"], mode="text", resume=False,
        )
        inc_cat = build_index(
            spark, half_a, out_dir=inc_dir, content_col="text",
            id_cols=["doc_id"], mode="text", resume=False,
        )
        append_to_index(
            spark, inc_cat, half_b, content_col="text", batch_id="b1"
        )

        # corpus stats converge exactly
        fm = full_cat.read_meta("postings")
        im = inc_cat.read_meta("postings")
        assert im["n_docs"] == fm["n_docs"]
        assert im["avgdl"] == pytest.approx(fm["avgdl"], rel=1e-12)
        assert im["appends"] == 1

        # every query rank- and score-identical
        full = _results(spark, full_cat)
        inc = _results(spark, inc_cat)
        for q in full:
            assert [d for d, _ in inc[q]] == [d for d, _ in full[q]], q
            for (_, s1), (_, s2) in zip(inc[q], full[q]):
                assert s1 == pytest.approx(s2, rel=1e-12)

        # lexicon df agrees with a direct aggregation
        from mahout_spark.operators.stats import simple_term_frequencies

        ParquetCatalog(inc_dir)  # smoke: reopen by path works
        lex = inc_cat.read(spark, "lexicon")
        got_df = {
            r["term"]: r["df"]
            for r in lex.filter(F.col("term").isin(["spark", "vector"]))
            .collect()
        }
        tf = simple_term_frequencies(
            corpus.withColumnRenamed("text", "text"), "text", "doc_id"
        )
        exp_df = {
            r["term"]: r["cnt"]
            for r in tf.filter(F.col("term").isin(["spark", "vector"]))
            .groupBy("term").agg(F.count(F.lit(1)).alias("cnt")).collect()
        }
        assert got_df == exp_df

    def test_append_idempotent_by_batch_id(self, spark, corpus, tmp_path_factory):
        from mahout_spark.index.append import append_to_index
        from mahout_spark.index.build import build_index

        d = str(tmp_path_factory.mktemp("idem"))
        half_a = corpus.filter(F.col("doc_id") < 250)
        half_b = corpus.filter(
            (F.col("doc_id") >= 250) & (F.col("doc_id") < 300)
        )
        cat = build_index(
            spark, half_a, out_dir=d, content_col="text", resume=False
        )
        append_to_index(spark, cat, half_b, content_col="text", batch_id="x")
        n1 = cat.read_meta("postings")["n_docs"]
        r1 = _results(spark, cat)
        # replay the same batch — must be a no-op
        append_to_index(spark, cat, half_b, content_col="text", batch_id="x")
        assert cat.read_meta("postings")["n_docs"] == n1
        assert _results(spark, cat) == r1

    def test_append_rejects_duplicate_ids(self, spark, corpus, tmp_path_factory):
        from mahout_spark.index.append import append_to_index
        from mahout_spark.index.build import build_index

        d = str(tmp_path_factory.mktemp("dup"))
        half_a = corpus.filter(F.col("doc_id") < 100)
        cat = build_index(
            spark, half_a, out_dir=d, content_col="text", resume=False
        )
        with pytest.raises(ValueError, match="already present"):
            append_to_index(
                spark, cat, half_a.limit(5), content_col="text"
            )


class TestCrashReplay:
    def test_replay_after_midpoint_crash_is_exactly_once(
        self, spark, corpus, tmp_path_factory, monkeypatch
    ):
        """Kill the append after the tf_raw/docstats appends but before
        the postings append and lexicon write; the replay with the same
        batch_id must roll the partial state back and converge to the
        same index as a clean build+append (df not double-counted)."""
        from mahout_spark.index import append as append_mod
        from mahout_spark.index.append import append_to_index
        from mahout_spark.index.build import build_index
        from mahout_spark.sources.catalog import ParquetCatalog

        half_a = corpus.filter(F.col("doc_id") < 250)
        half_b = corpus.filter(F.col("doc_id") >= 250)
        d = str(tmp_path_factory.mktemp("crash"))
        cat = build_index(
            spark, half_a, out_dir=d, content_col="text", resume=False
        )

        # crash injection: the first postings append dies mid-flight
        real_append = ParquetCatalog.append_partitioned
        calls = {"n": 0}

        def exploding(self, df, table, part_col, tag=None):
            out = real_append(self, df, table, part_col, tag=tag)
            if table == "tf_raw":
                calls["n"] += 1
            if table == "postings" and calls["n"] == 1:
                raise RuntimeError("simulated executor loss")
            return out

        monkeypatch.setattr(
            ParquetCatalog, "append_partitioned", exploding
        )
        with pytest.raises(RuntimeError, match="simulated"):
            append_to_index(
                spark, cat, half_b, content_col="text", batch_id="crashy"
            )
        monkeypatch.setattr(
            ParquetCatalog, "append_partitioned", real_append
        )

        # replay with the same batch_id: rollback + clean re-apply
        append_to_index(
            spark, cat, half_b, content_col="text", batch_id="crashy"
        )
        # third call is a complete no-op
        append_to_index(
            spark, cat, half_b, content_col="text", batch_id="crashy"
        )

        ref_dir = str(tmp_path_factory.mktemp("crash_ref"))
        ref = build_index(
            spark, corpus, out_dir=ref_dir, content_col="text", resume=False
        )
        assert (
            cat.read_meta("postings")["n_docs"]
            == ref.read_meta("postings")["n_docs"]
        )
        # df must not be double-counted anywhere
        got_df = {
            r["term"]: r["df"]
            for r in cat.read(spark, "lexicon").collect()
        }
        exp_df = {
            r["term"]: r["df"]
            for r in ref.read(spark, "lexicon").collect()
        }
        assert got_df == exp_df
        inc, full = _results(spark, cat), _results(spark, ref)
        for q in full:
            assert [d for d, _ in inc[q]] == [d for d, _ in full[q]], q


class TestStreaming:
    def test_stream_equals_full_build(self, spark, corpus, tmp_path_factory):
        from mahout_spark.index.build import build_index
        from mahout_spark.sources.catalog import ParquetCatalog
        from mahout_spark.streaming.incremental import index_document_stream

        landing = str(tmp_path_factory.mktemp("landing"))
        index_dir = str(tmp_path_factory.mktemp("stream_idx"))
        ckpt = str(tmp_path_factory.mktemp("ckpt"))
        full_dir = str(tmp_path_factory.mktemp("stream_full"))

        sub = corpus.filter(F.col("doc_id") < 200)
        # two landing files -> two (or more) micro-batches
        sub.filter(F.col("doc_id") < 100).coalesce(1).write.mode(
            "append"
        ).parquet(landing)
        sub.filter(F.col("doc_id") >= 100).coalesce(1).write.mode(
            "append"
        ).parquet(landing)

        q = index_document_stream(
            spark, landing, "doc_id long, text string", index_dir, ckpt,
            content_col="text", mode="text",
        )
        q.awaitTermination(120)

        full_cat = build_index(
            spark, sub, out_dir=full_dir, content_col="text", resume=False
        )
        stream_cat = ParquetCatalog(index_dir)
        assert (
            stream_cat.read_meta("postings")["n_docs"]
            == full_cat.read_meta("postings")["n_docs"]
        )
        assert _results_equal(
            _results(spark, stream_cat), _results(spark, full_cat)
        )
        assert os.path.isdir(os.path.join(index_dir, "postings"))


class TestCompaction:
    def test_compact_equals_fresh_rebuild(
        self, spark, corpus, tmp_path_factory
    ):
        """build(A) + append(B) + compact == fresh build(A∪B), block for
        block — and the appends counter resets so queries run on tight
        stored bounds again."""
        from mahout_spark.index.append import append_to_index
        from mahout_spark.index.build import build_index
        from mahout_spark.index.compact import compact_index

        half_a = corpus.filter(F.col("doc_id") < 250)
        half_b = corpus.filter(F.col("doc_id") >= 250)
        inc_dir = str(tmp_path_factory.mktemp("cmp_inc"))
        full_dir = str(tmp_path_factory.mktemp("cmp_full"))

        cat = build_index(
            spark, half_a, out_dir=inc_dir, content_col="text",
            id_cols=["doc_id"], mode="text", resume=False,
        )
        append_to_index(spark, cat, half_b, content_col="text",
                        batch_id="b1")
        assert cat.read_meta("postings")["appends"] == 1
        n_blocks_before = cat.read(spark, "postings").count()

        meta = compact_index(spark, cat)
        assert meta["appends"] == 0
        n_blocks_after = cat.read(spark, "postings").count()
        assert n_blocks_after <= n_blocks_before  # defragmented

        fresh = build_index(
            spark, corpus, out_dir=full_dir, content_col="text",
            id_cols=["doc_id"], mode="text", resume=False,
        )
        cols = ["term", "shard", "block_id", "count", "first_docid",
                "block_max_docid", "doc_ids", "tfs", "doclens"]
        a = {tuple(r) for r in cat.read(spark, "postings")
             .select(*cols).collect()}
        b = {tuple(r) for r in fresh.read(spark, "postings")
             .select(*cols).collect()}
        assert a == b
        assert _results_equal(_results(spark, cat), _results(spark, fresh))


class TestBootstrapReplay:
    """foreachBatch bootstrap durability: a replayed first epoch must
    resume a crashed bootstrap (never wedge on the append path), a
    pre-built index must take the append path, and a replayed COMPLETED
    bootstrap must no-op."""

    def test_crashed_bootstrap_resumes_not_appends(
        self, spark, corpus, tmp_path_factory
    ):
        import time

        from mahout_spark.sources.catalog import ParquetCatalog
        from mahout_spark.streaming.incremental import foreach_batch_indexer

        index_dir = str(tmp_path_factory.mktemp("boot_crash"))
        cat = ParquetCatalog(index_dir)
        # simulate the crash window: stage 1 created postings/_meta.json
        # (so the dir EXISTS) and the intent row landed, but the build
        # never finished and the completion marker was never written
        cat.lineage_append(
            "appends",
            {"batch_id": "stream-0", "status": "started",
             "bootstrap": True, "started": time.time()},
        )
        cat.write_meta("postings", {"n_docs": 0, "avgdl": 0.0})

        batch = corpus.filter(F.col("doc_id") < 150)
        handler = foreach_batch_indexer(index_dir, content_col="text",
                                        mode="text")
        handler(batch, 0)  # replayed epoch — must NOT take the append path

        assert ParquetCatalog(index_dir).read_meta("postings")["n_docs"] == 150
        assert _results(spark, cat)  # index answers queries

    def test_prebuilt_index_takes_append_path(
        self, spark, corpus, tmp_path_factory
    ):
        from mahout_spark.index.build import build_index
        from mahout_spark.sources.catalog import ParquetCatalog
        from mahout_spark.streaming.incremental import foreach_batch_indexer

        index_dir = str(tmp_path_factory.mktemp("boot_prebuilt"))
        build_index(
            spark, corpus.filter(F.col("doc_id") < 250), out_dir=index_dir,
            content_col="text", mode="text", resume=False,
        )
        handler = foreach_batch_indexer(index_dir, content_col="text",
                                        mode="text")
        handler(corpus.filter(F.col("doc_id") >= 250), 0)
        n_total = corpus.count()
        assert (
            ParquetCatalog(index_dir).read_meta("postings")["n_docs"]
            == n_total
        )

    def test_completed_bootstrap_replay_noops(
        self, spark, corpus, tmp_path_factory
    ):
        from mahout_spark.sources.catalog import ParquetCatalog
        from mahout_spark.streaming.incremental import foreach_batch_indexer

        index_dir = str(tmp_path_factory.mktemp("boot_replay"))
        batch = corpus.filter(F.col("doc_id") < 120)
        handler = foreach_batch_indexer(index_dir, content_col="text",
                                        mode="text")
        handler(batch, 0)
        before = _results(spark, ParquetCatalog(index_dir))
        handler(batch, 0)  # replayed completed epoch
        cat = ParquetCatalog(index_dir)
        assert cat.read_meta("postings")["n_docs"] == 120
        assert _results_equal(before, _results(spark, cat))


class TestEmptyCorpus:
    """A zero-doc build (or an empty first micro-batch) must produce a
    valid, queryable, appendable index — not a schema-inference crash.
    Zero-file parquet tables are the footprint of writing an empty
    DataFrame; the catalog reads them back via schemas persisted in the
    index meta."""

    def test_empty_build_then_append(self, spark, corpus, tmp_path_factory):
        from mahout_spark.index.append import append_to_index
        from mahout_spark.index.build import build_index
        from mahout_spark.index.wand import topk

        out = str(tmp_path_factory.mktemp("empty_idx"))
        empty = spark.createDataFrame([], "doc_id long, text string")
        cat = build_index(spark, empty, out, content_col="text",
                          mode="text", resume=False)
        assert cat.read_meta("postings")["n_docs"] == 0
        assert topk(spark, cat, ["spark"], k=5).count() == 0
        append_to_index(spark, cat, corpus.filter(F.col("doc_id") < 50),
                        content_col="text", batch_id="b1")
        assert cat.read_meta("postings")["n_docs"] == 50
        assert topk(spark, cat, ["spark"], k=5).count() > 0

    def test_empty_first_micro_batch_stream(
        self, spark, corpus, tmp_path_factory
    ):
        from mahout_spark.index.wand import topk
        from mahout_spark.sources.catalog import ParquetCatalog
        from mahout_spark.streaming.incremental import foreach_batch_indexer

        idx = str(tmp_path_factory.mktemp("empty_stream"))
        h = foreach_batch_indexer(idx, content_col="text", mode="text")
        h(spark.createDataFrame([], "doc_id long, text string"), 0)
        cat = ParquetCatalog(idx)
        assert cat.read_meta("postings")["n_docs"] == 0
        h(corpus.filter(F.col("doc_id") < 40), 1)
        assert cat.read_meta("postings")["n_docs"] == 40
        assert topk(spark, cat, ["spark"], k=5).count() > 0


def _results_equal(a, b):
    if set(a) != set(b):
        return False
    for q in a:
        if [d for d, _ in a[q]] != [d for d, _ in b[q]]:
            return False
        for (_, s1), (_, s2) in zip(a[q], b[q]):
            if abs(s1 - s2) > 1e-9 * max(1.0, abs(s2)):
                return False
    return True
