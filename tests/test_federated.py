"""Federated multi-index search + index merging (X59/X60).

Gate: N independently-built indexes queried through ``federated_topk``
must rank AND score exactly as one index built over the union corpus
(the dfs_query_then_fetch identity — local-stats scatter-gather would
fail this whenever df drifts across partitions), and ``merge_indexes``
must produce that union index block-for-block without re-tokenizing.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

QUERIES = [
    (["spark", "query", "data"], False),
    (["spark", "query", "data"], True),
    (["window", "stream"], False),
    (["table", "scan", "filter"], True),
    (["vector"], False),
]

_SPLITS = (170, 340)  # three uneven ranges -> real per-index df drift


@pytest.fixture(scope="module")
def corpus(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .select("doc_id", "text")
    )


def _build(spark, docs, out_dir, **kw):
    from mahout_spark.index.build import build_index

    return build_index(
        spark, docs, out_dir=str(out_dir), content_col="text",
        id_cols=["doc_id"], mode="text", resume=False, **kw,
    )


@pytest.fixture(scope="module")
def fleet(spark, corpus, tmp_path_factory):
    """Three part indexes over disjoint doc_id ranges + the union index."""
    a, b = _SPLITS
    parts = {
        "p0": corpus.filter(F.col("doc_id") < a),
        "p1": corpus.filter((F.col("doc_id") >= a) & (F.col("doc_id") < b)),
        "p2": corpus.filter(F.col("doc_id") >= b),
    }
    cats = {
        nm: _build(spark, df, tmp_path_factory.mktemp(f"fed_{nm}"))
        for nm, df in parts.items()
    }
    full = _build(spark, corpus, tmp_path_factory.mktemp("fed_full"))
    return cats, full


def _union_results(spark, full, k=10):
    from mahout_spark.index.wand import topk

    out = {}
    for terms, mode_all in QUERIES:
        rows = topk(spark, full, terms, k=k, mode_all=mode_all).collect()
        out[(tuple(terms), mode_all)] = [(r["doc_id"], r["score"]) for r in rows]
    return out


def _fed_results(spark, cats, k=10, merge="spark"):
    from mahout_spark.index.federated import federated_topk

    out = {}
    for terms, mode_all in QUERIES:
        rows = federated_topk(
            spark, cats, terms, k=k, mode_all=mode_all, merge=merge
        ).collect()
        out[(tuple(terms), mode_all)] = [(r["doc_id"], r["score"]) for r in rows]
    return out


class TestFederatedTopk:
    def test_equals_union_index(self, spark, fleet):
        cats, full = fleet
        want = _union_results(spark, full)
        got = _fed_results(spark, cats)
        assert got == want  # doc ids AND float scores bit-identical

    def test_driver_merge_identical(self, spark, fleet):
        cats, full = fleet
        assert _fed_results(spark, cats, merge="driver") == _union_results(
            spark, full
        )

    def test_index_column_names_owning_catalog(self, spark, fleet):
        from mahout_spark.index.federated import federated_topk

        cats, _ = fleet
        a, b = _SPLITS
        for r in federated_topk(spark, cats, ["data", "query"], k=10).collect():
            want = "p0" if r["doc_id"] < a else ("p1" if r["doc_id"] < b else "p2")
            assert r["index"] == want

    def test_mode_all_skips_indexes_missing_a_term(self, spark, corpus,
                                                   fleet, tmp_path_factory):
        """An AND query can only match inside an index holding ALL its
        terms; indexes missing one contribute no scan branch, and the
        result still equals the union index's AND. A one-doc index with
        a term the corpus lacks makes the skip deterministic (the
        synthetic sf0.01 splits share their whole vocabulary)."""
        from mahout_spark.index.federated import federated_topk
        from mahout_spark.index.wand import topk

        cats, _ = fleet
        extra_doc = spark.createDataFrame(
            [(90001, "zebraqux data data table scan")], ["doc_id", "text"]
        )
        extra = _build(spark, extra_doc, tmp_path_factory.mktemp("fed_x"))
        union_plus = _build(
            spark, corpus.unionByName(extra_doc),
            tmp_path_factory.mktemp("fed_full_plus"),
        )
        terms = ["zebraqux", "data"]
        got = [(r["doc_id"], r["score"]) for r in federated_topk(
            spark, {**cats, "extra": extra}, terms, k=10, mode_all=True,
        ).collect()]
        want = [(r["doc_id"], r["score"]) for r in topk(
            spark, union_plus, terms, k=10, mode_all=True).collect()]
        assert got == want
        assert got and got[0][0] == 90001

    def test_absent_term_everywhere(self, spark, fleet):
        from mahout_spark.index.federated import federated_topk

        cats, _ = fleet
        assert federated_topk(spark, cats, ["zzzqqqxxx"], k=5).count() == 0

    def test_per_index_deletes_honored(self, spark, fleet, corpus,
                                       tmp_path_factory):
        """Tombstones in ONE index of the federation mask exactly like
        the same tombstones on the union index (pre-delete stats, live
        filtering) — the single-index delete semantics, federated."""
        from mahout_spark.index.delete import delete_docs
        from mahout_spark.index.federated import federated_topk
        from mahout_spark.index.wand import topk
        from mahout_spark.sources.catalog import ParquetCatalog

        cats, full = fleet
        base = topk(spark, full, ["data", "query"], k=10).collect()
        victims = [r["doc_id"] for r in base[:3] if r["doc_id"] < _SPLITS[0]]
        if not victims:
            pytest.skip("no top hits landed in p0's range")

        p0_copy = str(tmp_path_factory.mktemp("fed_del_p0"))
        full_copy = str(tmp_path_factory.mktemp("fed_del_full"))
        shutil.rmtree(p0_copy)
        shutil.rmtree(full_copy)
        shutil.copytree(cats["p0"].root, p0_copy)
        shutil.copytree(full.root, full_copy)
        p0d, fulld = ParquetCatalog(p0_copy), ParquetCatalog(full_copy)
        delete_docs(spark, p0d, victims)
        delete_docs(spark, fulld, victims)

        fed = {**cats, "p0": p0d}
        got = [(r["doc_id"], r["score"]) for r in federated_topk(
            spark, fed, ["data", "query"], k=10).collect()]
        want = [(r["doc_id"], r["score"]) for r in topk(
            spark, fulld, ["data", "query"], k=10).collect()]
        assert got == want
        assert not set(victims) & {d for d, _ in got}

    def test_incompatible_scoring_params_raise(self, spark, fleet, tmp_path):
        import json
        import os

        from mahout_spark.index.federated import federated_topk
        from mahout_spark.sources.catalog import ParquetCatalog

        cats, _ = fleet
        bad_root = tmp_path / "bad"
        os.makedirs(bad_root / "postings")
        meta = dict(cats["p0"].read_meta("postings"))
        meta["k1"] = 9.9
        with open(bad_root / "postings" / "_meta.json", "w") as f:
            json.dump(meta, f)
        with pytest.raises(ValueError, match="disagree on 'k1'"):
            federated_topk(
                spark, {"p0": cats["p0"], "bad": ParquetCatalog(str(bad_root))},
                ["data"], k=5,
            )


_BLOCK_COLS = ["term", "shard", "block_id", "count", "first_docid",
               "block_max_docid", "doc_ids", "tfs", "doclens"]


def _blocks(spark, cat):
    return {tuple(r) for r in
            cat.read(spark, "postings").select(*_BLOCK_COLS).collect()}


class TestMergeIndexes:
    def test_merge_equals_fresh_build(self, spark, fleet, tmp_path_factory):
        """merge(p0,p1,p2) == fresh build over the union corpus, block
        for block, stats exact, queries score-identical on STORED
        (tight) bounds."""
        from mahout_spark.index.federated import merge_indexes

        cats, full = fleet
        out = merge_indexes(
            spark, cats, str(tmp_path_factory.mktemp("fed_merge"))
        )
        mm, fm = out.read_meta("postings"), full.read_meta("postings")
        assert mm["n_docs"] == fm["n_docs"]
        assert mm["avgdl"] == pytest.approx(fm["avgdl"], rel=1e-12)
        assert mm["appends"] == 0 and mm["deletes"] == 0
        assert _blocks(spark, out) == _blocks(spark, full)
        assert _union_results(spark, out) == _union_results(spark, full)

    def test_merge_mixed_layouts(self, spark, corpus, fleet,
                                 tmp_path_factory):
        """Sources with different n_buckets/docs_per_shard merge into
        the TARGET layout and still equal the fresh build in it."""
        from mahout_spark.index.federated import merge_indexes

        cats, full = fleet
        p2_alt = _build(
            spark, corpus.filter(F.col("doc_id") >= _SPLITS[1]),
            tmp_path_factory.mktemp("fed_p2alt"),
            n_buckets=4, docs_per_shard=64,
        )
        out = merge_indexes(
            spark, {"p0": cats["p0"], "p1": cats["p1"], "p2": p2_alt},
            str(tmp_path_factory.mktemp("fed_merge_mixed")),
        )
        assert int(out.read_meta("postings")["n_buckets"]) == \
            int(full.read_meta("postings")["n_buckets"])
        assert _blocks(spark, out) == _blocks(spark, full)

    def test_merge_purges_tombstones(self, spark, corpus, fleet,
                                     tmp_path_factory):
        """A deleted doc in a source index is physically absent from the
        merged index — merged == fresh build over the LIVE corpus."""
        from mahout_spark.index.delete import delete_docs
        from mahout_spark.index.federated import merge_indexes
        from mahout_spark.sources.catalog import ParquetCatalog

        cats, _ = fleet
        victim = int(
            corpus.filter(F.col("doc_id") < _SPLITS[0])
            .agg(F.min("doc_id")).first()[0]
        )
        p0_copy = str(tmp_path_factory.mktemp("fed_merge_del"))
        shutil.rmtree(p0_copy)
        shutil.copytree(cats["p0"].root, p0_copy)
        p0d = ParquetCatalog(p0_copy)
        delete_docs(spark, p0d, [victim])

        out = merge_indexes(
            spark, {**cats, "p0": p0d},
            str(tmp_path_factory.mktemp("fed_merge_live")),
        )
        live_fresh = _build(
            spark, corpus.filter(F.col("doc_id") != victim),
            tmp_path_factory.mktemp("fed_live_fresh"),
        )
        assert _blocks(spark, out) == _blocks(spark, live_fresh)

    def test_merge_detects_doc_id_collision(self, spark, fleet,
                                            tmp_path_factory):
        from mahout_spark.index.federated import merge_indexes

        cats, _ = fleet
        with pytest.raises(ValueError, match="doc_id collision"):
            merge_indexes(
                spark, {"a": cats["p0"], "b": cats["p0"]},
                str(tmp_path_factory.mktemp("fed_merge_dup")),
            )


# -- federated boolean query language (X67) ------------------------------------


@pytest.fixture(scope="module")
def bool_fleet(spark, tmp_path_factory):
    """Two positional simple-mode part indexes + the union index, over
    the sf0.001 corpus (small enough that every leaf kind exercises in
    seconds)."""
    from mahout_spark.index.build import build_index

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )

    def build(df, name):
        return build_index(
            spark, df, str(tmp_path_factory.mktemp(name)),
            content_col="text", id_cols=["doc_id"], mode="simple",
            n_buckets=4, docs_per_shard=64, block_size=16,
            positions=True,
        )

    cats = {
        "lo": build(docs.filter(F.col("doc_id") < 200), "fb_lo"),
        "hi": build(docs.filter(F.col("doc_id") >= 200), "fb_hi"),
    }
    return cats, build(docs, "fb_union")


BOOL_FED_QUERIES = [
    "table AND data",
    "table OR scan NOT stream",
    "mer* OR data",
    "slot~2 AND data",
    "/t[a-z]*le/ OR merge",
    "*can* OR data",
    '"table scan" OR data',
    "table^3 OR merge OR scan",
]


class TestFederatedBoolean:
    def test_equals_union_index_across_leaf_kinds(self, spark, bool_fleet):
        from mahout_spark.index.boolquery import boolean_topk
        from mahout_spark.index.federated import federated_boolean_topk

        cats, union = bool_fleet
        for q in BOOL_FED_QUERIES:
            got = [(r["doc_id"], r["score"]) for r in federated_boolean_topk(
                spark, cats, q, k=10).collect()]
            want = [(r["doc_id"], r["score"]) for r in boolean_topk(
                spark, union, q, k=10).collect()]
            assert got == want, q

    def test_msm_and_blended_synonyms(self, spark, bool_fleet):
        from mahout_spark.index.boolquery import boolean_topk
        from mahout_spark.index.federated import federated_boolean_topk

        cats, union = bool_fleet
        kw = dict(synonyms={"join": ["merge"]}, synonym_blend=True)
        for q, extra in [
            ("table OR scan OR merge OR data", {"minimum_should_match": 2}),
            ("join AND data", kw),
        ]:
            got = [(r["doc_id"], r["score"]) for r in federated_boolean_topk(
                spark, cats, q, k=10, **extra).collect()]
            want = [(r["doc_id"], r["score"]) for r in boolean_topk(
                spark, union, q, k=10, **extra).collect()]
            assert got == want, q

    def test_driver_merge_and_owner_column(self, spark, bool_fleet):
        from mahout_spark.index.federated import federated_boolean_topk

        cats, _ = bool_fleet
        rows = federated_boolean_topk(
            spark, cats, "table OR data", k=10, merge="driver"
        ).collect()
        assert rows
        dist = federated_boolean_topk(
            spark, cats, "table OR data", k=10
        ).collect()
        assert [(r["index"], r["doc_id"], r["score"]) for r in rows] == \
            [(r["index"], r["doc_id"], r["score"]) for r in dist]
        for r in rows:
            assert r["index"] == ("lo" if r["doc_id"] < 200 else "hi")

    def test_phrase_requires_all_positional(self, spark, bool_fleet,
                                            tmp_path_factory):
        from mahout_spark.index.build import build_index
        from mahout_spark.index.federated import federated_boolean_topk

        bcats, _ = bool_fleet
        docs = (
            spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text").filter(F.col("doc_id") >= 400)
        )
        nopos = build_index(
            spark, docs, str(tmp_path_factory.mktemp("fb_nopos")),
            content_col="text", id_cols=["doc_id"], mode="simple",
            n_buckets=4, docs_per_shard=64, block_size=16,
        )
        with pytest.raises(ValueError, match="positions=True"):
            federated_boolean_topk(
                spark, {"a": bcats["lo"], "b": nopos},
                '"table scan" OR data', k=5,
            )


def test_legacy_meta_without_doclen_totals(spark, fleet, tmp_path_factory):
    """An index whose meta predates the running doclen totals must not
    contribute 0 to the global avgdl — global_stats recomputes from its
    docstats, keeping the federation ≡ the union index."""
    import json
    import os

    from mahout_spark.sources.catalog import ParquetCatalog

    cats, full = fleet
    legacy_root = str(tmp_path_factory.mktemp("fed_legacy"))
    shutil.rmtree(legacy_root)
    shutil.copytree(cats["p0"].root, legacy_root)
    legacy = ParquetCatalog(legacy_root)
    meta = legacy.read_meta("postings")
    meta.pop("doclen_sum"), meta.pop("doclen_n")
    with open(os.path.join(legacy_root, "postings", "_meta.json"),
              "w") as f:
        json.dump(meta, f)

    from mahout_spark.index.federated import federated_topk
    from mahout_spark.index.wand import topk

    got = [(r["doc_id"], r["score"]) for r in federated_topk(
        spark, {**cats, "p0": legacy}, ["data", "query"], k=10).collect()]
    want = [(r["doc_id"], r["score"]) for r in topk(
        spark, full, ["data", "query"], k=10).collect()]
    assert got == want
