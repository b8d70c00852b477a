"""Bigram fuzzy candidate tier (X72): tier expansions must equal the
exact length-band scan across stems/distances (incl. the repetitive
vocabulary that breaks SET-dedup counting), routing must respect the
soundness domain, and retrieval results must be unchanged."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mahout_spark.index.gramindex import (
    build_gramindex,
    expand_fuzzy_rows,
    gram_tier_applies,
)

STEMS = [("mergee", 2), ("stream", 1), ("tables", 2), ("vector", 1),
         ("quary", 1)]  # all within the tier's soundness domain
SHORT = [("slot", 2), ("hat", 1)]  # below it -> must route to the scan


def test_soundness_domain():
    assert gram_tier_applies("abcd", 1)       # 4 >= 2 + 2
    assert not gram_tier_applies("abc", 1)
    assert gram_tier_applies("abcdef", 2)     # 6 >= 2 + 4
    assert not gram_tier_applies("abcde", 2)


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    from mahout_spark.index.build import build_index

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )
    # a repetitive-term doc: SET-dedup gram counting would wrongly prune
    # 'ababab' from its own d=2 neighborhood (2 distinct shared grams
    # vs the bound of 3) — multiset counts must keep it
    extra = spark.createDataFrame(
        [(90001, "ababab ababab data qqqq")], ["doc_id", "text"])
    cat = build_index(
        spark, docs.unionByName(extra),
        str(tmp_path_factory.mktemp("gidx")),
        content_col="text", id_cols=["doc_id"], mode="simple",
        n_buckets=4, docs_per_shard=64, block_size=16,
    )
    build_gramindex(spark, cat)
    assert cat.read_meta("postings")["gramindex"] is True
    return cat


def _rows4(rows):
    return [(r["term"], int(r["bucket"]), int(r["df"]), int(r["dist"]))
            for r in rows]


def test_tier_expansion_identical_to_scan(spark, built):
    from mahout_spark.index.boolquery import _fuzzy_expansion_rows

    lex = built.read(spark, "lexicon")
    probes = STEMS + SHORT + [("ababab", 2), ("abab", 1), ("qqqqq", 2)]
    hit_any = False
    for stem, n in probes:
        scan = _rows4(_fuzzy_expansion_rows(lex, stem, n, 64))
        tiered = _rows4(expand_fuzzy_rows(spark, built, lex, stem, n, 64))
        assert tiered == scan, (stem, n)
        hit_any = hit_any or bool(scan)
    assert hit_any
    # the repetitive term must survive its own d=2 neighborhood probe
    # (the case SET-dedup gram counting would wrongly prune)
    self_hit = _rows4(expand_fuzzy_rows(
        spark, built, built.read(spark, "lexicon"), "ababab", 2, 64))
    assert any(t == "ababab" and d == 0 for t, _, _, d in self_hit)


def test_fuzzy_query_results_unchanged(spark, built):
    """The tier is output-invisible for the full fuzzy query surface
    (boolean_topk + warm Searcher)."""
    from mahout_spark.index.boolquery import boolean_topk
    from mahout_spark.index.searcher import Searcher

    q = "mergee~2 AND data"
    with_tier = [(r["doc_id"], r["score"])
                 for r in boolean_topk(spark, built, q, k=10).collect()]
    # drop the tier flag via a meta rewrite -> same query, scan path
    meta = built.read_meta("postings")
    meta.pop("gramindex")
    built.write_meta("postings", meta)
    scan_path = [(r["doc_id"], r["score"])
                 for r in boolean_topk(spark, built, q, k=10).collect()]
    assert with_tier == scan_path and with_tier
    # restore + warm Searcher serves the tier
    meta["gramindex"] = True
    built.write_meta("postings", meta)
    s = Searcher(spark, built)
    assert [(r["doc_id"], r["score"])
            for r in s.query(q, k=10).collect()] == with_tier
    assert [(r["doc_id"], r["score"])
            for r in s.query(q, k=10).collect()] == with_tier  # warm


def test_append_incrementally_maintains_gram_tier(spark, tmp_path_factory):
    """Round-3 VERDICT ask #3, gram twin: an append merges the touched
    terms' grams into the live tier as an epoch delta — no drop, no full
    rebuild (base files survive byte-for-byte) — and fuzzy expansion
    stays identical to the lexicon scan over the merged vocabulary,
    including current df for df-moved existing terms."""
    import os

    from mahout_spark.index.append import append_to_index
    from mahout_spark.index.boolquery import (
        _fuzzy_expansion_rows,
        boolean_topk,
    )
    from mahout_spark.index.build import build_index

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )
    cat = build_index(
        spark, docs.filter(F.col("doc_id") < 400),
        str(tmp_path_factory.mktemp("gidx_inc")),
        content_col="text", id_cols=["doc_id"], mode="simple",
        n_buckets=4, docs_per_shard=64, block_size=16,
    )
    build_gramindex(spark, cat)
    gi_dir = cat.table_path("gramindex")
    base_files = {
        f: os.path.getmtime(os.path.join(gi_dir, f))
        for f in os.listdir(gi_dir) if f.startswith("part-")
    }
    assert base_files

    # new term + df drift on the shared vocabulary
    extra = spark.createDataFrame(
        [(90002, "mergeeq data")], ["doc_id", "text"])
    append_to_index(
        spark, cat,
        docs.filter(F.col("doc_id") >= 400).unionByName(extra),
        content_col="text", batch_id="g1",
    )
    meta = cat.read_meta("postings")
    assert meta.get("gramindex") is True  # tier still live
    for f, mt in base_files.items():
        assert os.path.getmtime(os.path.join(gi_dir, f)) == mt, f
    assert any(f.startswith("a") for f in os.listdir(gi_dir))

    # the tier (flag still set) serves the new vocabulary
    hits = boolean_topk(spark, cat, "mergeeq~1 AND data", k=5).collect()
    assert 90002 in {r["doc_id"] for r in hits}

    # expansion ≡ lexicon scan over the MERGED vocabulary, current df
    lex = cat.read(spark, "lexicon")
    for stem, n in STEMS + [("mergeeq", 2), ("mergeq", 1)]:
        scan = _rows4(_fuzzy_expansion_rows(lex, stem, n, 64))
        tiered = _rows4(expand_fuzzy_rows(spark, cat, lex, stem, n, 64))
        assert tiered == scan, (stem, n)

    # second append stacks another delta correctly
    append_to_index(
        spark, cat,
        spark.createDataFrame([(90003, "mergeeq again")],
                              ["doc_id", "text"]),
        content_col="text", batch_id="g2",
    )
    lex2 = cat.read(spark, "lexicon")
    for stem, n in [("mergeeq", 1), ("againn", 1)]:
        assert _rows4(expand_fuzzy_rows(spark, cat, lex2, stem, n, 64)) \
            == _rows4(_fuzzy_expansion_rows(lex2, stem, n, 64)), (stem, n)
