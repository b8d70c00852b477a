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
