"""Hybrid lexical+vector retrieval (X63 rescore / X64 RRF): engine vs
pure-python recomputation from the collected primitives, plus the
compose-with-filter-context seam."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

Q = "table OR data OR merge"


@pytest.fixture(scope="module")
def corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return docs.select("doc_id", F.col("text").alias("content"))


@pytest.fixture(scope="module")
def built(spark, corpus, tmp_path_factory):
    from mahout_spark.index.build import build_index

    return build_index(
        spark, corpus, str(tmp_path_factory.mktemp("hybidx")),
        content_col="content", id_cols=["doc_id"], mode="simple",
        n_buckets=4, docs_per_shard=64, block_size=16,
    )


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


@pytest.fixture(scope="module")
def emb_np(emb):
    rows = emb.collect()
    return {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
            for r in rows}


@pytest.fixture(scope="module")
def qvec(emb_np):
    return [float(x) for x in emb_np[0]]


def _cos6(a: np.ndarray, b: np.ndarray) -> float:
    return round(float(np.dot(a, b) /
                       (np.sqrt(np.dot(a, a)) * np.sqrt(np.dot(b, b)))), 6)


def test_rescore_matches_manual(spark, built, emb, emb_np, qvec):
    from mahout_spark.index.boolquery import boolean_topk
    from mahout_spark.index.hybrid import rescore_topk

    base = {r["doc_id"]: r["score"]
            for r in boolean_topk(spark, built, Q, k=20).collect()}
    qv = np.asarray(qvec)
    want = sorted(
        (
            (d, round(1.0 * s + 0.5 * _cos6(emb_np[d], qv), 6))
            for d, s in base.items()
        ),
        key=lambda e: (-e[1], e[0]),
    )[:5]
    got = [
        (r["doc_id"], r["score"])
        for r in rescore_topk(
            spark, built, Q, emb, qvec, k=5, window=20,
            query_weight=1.0, rescore_weight=0.5,
        ).collect()
    ]
    assert got == want


def test_rescore_missing_embeddings_keep_bm25(spark, built, emb, qvec):
    """Window docs with no embedding row rescore as cosine=0 (the ES
    rescore-query-miss behavior) — they stay in the ranking."""
    from mahout_spark.index.boolquery import boolean_topk
    from mahout_spark.index.hybrid import rescore_topk

    window_ids = [r["doc_id"] for r in
                  boolean_topk(spark, built, Q, k=20).collect()]
    half = emb.filter(~F.col("vec_id").isin(window_ids[: len(window_ids) // 2]))
    out = rescore_topk(spark, built, Q, half, qvec, k=20, window=20)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == set(window_ids)  # nobody dropped
    for d in window_ids[: len(window_ids) // 2]:
        assert rows[d]["cosine"] == 0.0
        assert rows[d]["score"] == pytest.approx(rows[d]["bm25"], abs=5e-7)


def test_hybrid_rrf_matches_manual(spark, built, emb, emb_np, qvec):
    from mahout_spark.index.boolquery import boolean_topk
    from mahout_spark.index.hybrid import hybrid_topk

    depth, kk = 15, 60.0
    lex = sorted(
        ((r["doc_id"], r["score"])
         for r in boolean_topk(spark, built, Q, k=depth).collect()),
        key=lambda e: (-e[1], e[0]),
    )
    qv = np.asarray(qvec)
    vec = sorted(
        ((d, _cos6(v, qv)) for d, v in emb_np.items()),
        key=lambda e: (-e[1], e[0]),
    )[:depth]
    lrank = {d: i + 1 for i, (d, _) in enumerate(lex)}
    vrank = {d: i + 1 for i, (d, _) in enumerate(vec)}
    want = sorted(
        (
            (d, round((1.0 / (kk + lrank[d]) if d in lrank else 0.0)
                      + (1.0 / (kk + vrank[d]) if d in vrank else 0.0), 6))
            for d in set(lrank) | set(vrank)
        ),
        key=lambda e: (-e[1], e[0]),
    )[:10]
    out = hybrid_topk(spark, built, Q, emb, qvec, k=10, depth=depth).collect()
    got = [(r["doc_id"], r["score"]) for r in out]
    assert got == want
    for r in out:  # rank columns faithful to the source rankings
        assert r["lex_rank"] == lrank.get(r["doc_id"])
        assert r["vec_rank"] == vrank.get(r["doc_id"])
    # both single-system and fused docs should exist at this depth
    assert any(r["lex_rank"] is None or r["vec_rank"] is None for r in out) \
        or len(set(lrank) & set(vrank)) == len(out)


def test_hybrid_composes_with_filter_context(spark, built, emb, qvec):
    from mahout_spark.index.hybrid import rescore_topk

    keep = [d for d in range(0, 500, 2)]
    out = rescore_topk(
        spark, built, Q, emb, qvec, k=10, window=20, filter_ids=keep,
    ).collect()
    assert out and all(r["doc_id"] % 2 == 0 for r in out)
