"""Rank-identity under massive score ties (regression: argpartition chose
arbitrary tie members at the k boundary; strict block pruning could drop
tied top docs). Duplicate-heavy corpora are exactly the dedup-era norm,
so ties at the top are common, not pathological."""

from __future__ import annotations

import numpy as np
import pytest

from tests.oracle import OracleIndex


def test_topk_arrays_tie_break_lowest_doc():
    from mahout_spark.index.wand import _topk_arrays

    docs = np.arange(20, dtype=np.int64)
    d, s = _topk_arrays(docs, np.ones(20), 5)
    assert d.tolist() == [0, 1, 2, 3, 4]
    # mixed: two score levels, ties inside each
    scores = np.array([2.0] * 3 + [1.0] * 17)
    d2, _ = _topk_arrays(docs, scores, 5)
    assert d2.tolist() == [0, 1, 2, 3, 4]


@pytest.mark.parametrize("mode_all", [False, True])
def test_indexed_topk_on_duplicate_corpus(spark, tmp_path_factory, mode_all):
    """30 identical docs + 20 distinct ones, all in ONE shard: every
    duplicate ties exactly; top-10 must be the lowest doc_ids among the
    best scorers, matching the python oracle."""
    from mahout_spark.index.build import build_index
    from mahout_spark.index.wand import topk

    docs = {}
    for i in range(30):
        docs[i] = "spark data engine spark index"
    for i in range(30, 50):
        docs[i] = f"filler{i} spark other words here"
    oracle = OracleIndex(docs, mode="text")
    sdf = spark.createDataFrame(list(docs.items()), ["doc_id", "content"])
    out = str(tmp_path_factory.mktemp("ties"))
    cat = build_index(
        spark, sdf, out, content_col="content", mode="text",
        n_buckets=4, docs_per_shard=1024, block_size=8, resume=False,
    )
    for terms in [["spark", "data"], ["spark"], ["data", "engine"]]:
        exp = oracle.search(terms, k=10, mode_all=mode_all)
        got = [
            (r["doc_id"], r["score"])
            for r in topk(spark, cat, terms, k=10, mode_all=mode_all)
            .collect()
        ]
        assert [d for d, _ in got] == [d for d, _ in exp], terms
        for (_, s1), (_, s2) in zip(got, exp):
            assert s1 == pytest.approx(s2, rel=1e-12)


def test_batch_topk_on_duplicate_corpus(spark, tmp_path_factory):
    from mahout_spark.index.build import build_index
    from mahout_spark.index.wand import topk_batch

    docs = {i: "tie tie tie word" for i in range(40)}
    docs.update({i: f"unique{i} word" for i in range(40, 60)})
    oracle = OracleIndex(docs, mode="text")
    sdf = spark.createDataFrame(list(docs.items()), ["doc_id", "content"])
    out = str(tmp_path_factory.mktemp("bt_ties"))
    cat = build_index(
        spark, sdf, out, content_col="content", mode="text",
        n_buckets=4, docs_per_shard=1024, block_size=8, resume=False,
    )
    res = topk_batch(spark, cat, {"q1": ["tie"], "q2": ["word"]}, k=10)
    got = {}
    for r in res.collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"]))
    for qid, terms in [("q1", ["tie"]), ("q2", ["word"])]:
        exp = [d for d, _ in oracle.search(terms, k=10)]
        assert [d for _, d in sorted(got[qid])] == exp, qid
