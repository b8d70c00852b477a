"""topk_batch must answer every query exactly as per-query topk does
(same docs, same scores, same order) — one job for the whole batch."""

from __future__ import annotations

import random

import pytest


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    from mahout_spark.index.build import build_index

    docs = spark.read.parquet(
        "/root/testdata/sf0.01/documents.parquet"
    ).select("doc_id", "text")
    return build_index(
        spark, docs, str(tmp_path_factory.mktemp("batchidx")),
        content_col="text", mode="text", n_buckets=8, docs_per_shard=64,
        block_size=16, resume=False,
    )


VOCAB = ["spark", "query", "data", "window", "stream", "hash", "join",
         "merge", "sort", "vector", "table", "scan", "filter", "group",
         "agg", "zzz_absent_term"]


@pytest.mark.parametrize("mode_all", [False, True])
def test_batch_equals_per_query(spark, built, mode_all):
    from mahout_spark.index.wand import topk, topk_batch

    rng = random.Random(5 if mode_all else 7)
    queries = {
        f"q{i}": rng.sample(VOCAB, rng.randint(1, 4)) for i in range(20)
    }
    batch = topk_batch(spark, built, queries, k=10, mode_all=mode_all)
    got: dict[str, list] = {}
    for r in batch.collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["score"])
        )
    for qid, terms in queries.items():
        exp = [
            (r["doc_id"], r["score"])
            for r in topk(spark, built, terms, k=10, mode_all=mode_all)
            .collect()
        ]
        rows = sorted(got.get(qid, []))
        assert [(d, s) for _, d, s in rows] == exp, (qid, terms)


def test_batch_empty_and_absent(spark, built):
    from mahout_spark.index.wand import topk_batch

    out = topk_batch(spark, built, {}, k=5)
    assert out.count() == 0
    out2 = topk_batch(
        spark, built, {"a": ["zzz_absent_term"]}, k=5, mode_all=True
    )
    assert out2.count() == 0


def test_wand_after_cursor_tiles_the_full_ranking(spark, built):
    """topk(after=...) (the plain-WAND search_after seam): consecutive
    cursor pages must tile the deep ranking exactly — no overlap, no
    skip — and agree with one deep unpaginated run."""
    from mahout_spark.index.wand import topk

    terms = ["spark", "query", "data"]
    deep = [(r["doc_id"], r["score"])
            for r in topk(spark, built, terms, k=30, prune=False).collect()]
    pages, cursor = [], None
    for _ in range(3):
        rows = topk(spark, built, terms, k=10, after=cursor).collect()
        pages.extend((r["doc_id"], r["score"]) for r in rows)
        cursor = (rows[-1]["score"], rows[-1]["doc_id"])
    assert pages == deep


def test_wand_after_matches_boolquery_cursor(spark, built):
    """The wand-level cursor and the boolquery-level cursor (X51) are
    the same contract: page 2 of an OR query must be identical."""
    from mahout_spark.index.boolquery import boolean_topk
    from mahout_spark.index.wand import topk

    terms = ["table", "scan"]
    p1 = topk(spark, built, terms, k=10).collect()
    cur = (p1[-1]["score"], p1[-1]["doc_id"])
    got = [(r["doc_id"], round(r["score"], 6))
           for r in topk(spark, built, terms, k=10, after=cur).collect()]
    b1 = boolean_topk(spark, built, "table OR scan", k=10).collect()
    bcur = (b1[-1]["score"], b1[-1]["doc_id"])
    want = [(r["doc_id"], round(r["score"], 6))
            for r in boolean_topk(
                spark, built, "table OR scan", k=10, after=bcur).collect()]
    assert got == want
