"""Ranking evaluation (X124, operators/rankeval.py): hand-computed
metric traces, perfect/degenerate edges, and multi-query shape."""

import math

import pytest

from mahout_spark.operators.rankeval import rank_eval


def _run(spark, results, judgments, k):
    res = spark.createDataFrame(
        results, "query_id string, doc_id long, rank long"
    )
    jud = spark.createDataFrame(
        judgments, "query_id string, doc_id long, grade long"
    )
    return {
        r["query_id"]: r for r in rank_eval(res, jud, k=k).collect()
    }


def test_hand_computed_trace(spark):
    # q1: ranks A(1) B(2) C(3); judged A=2, C=1, D=3 (D unretrieved)
    got = _run(
        spark,
        [("q1", 1, 1), ("q1", 2, 2), ("q1", 3, 3)],
        [("q1", 1, 2), ("q1", 3, 1), ("q1", 4, 3)],
        k=3,
    )["q1"]
    assert got["retrieved"] == 3 and got["relevant_retrieved"] == 2
    assert got["precision_at_k"] == round(2 / 3, 6)
    assert got["recall_at_k"] == round(2 / 3, 6)
    assert got["mrr"] == 1.0
    dcg = 3 / math.log2(2) + 1 / math.log2(4)
    idcg = 7 / math.log2(2) + 3 / math.log2(3) + 1 / math.log2(4)
    assert got["ndcg_at_k"] == pytest.approx(round(dcg / idcg, 6), abs=1e-9)


def test_perfect_ranking_is_all_ones(spark):
    got = _run(
        spark,
        [("q", 10, 1), ("q", 11, 2)],
        [("q", 10, 3), ("q", 11, 1)],
        k=2,
    )["q"]
    assert (got["precision_at_k"], got["recall_at_k"],
            got["mrr"], got["ndcg_at_k"]) == (1.0, 1.0, 1.0, 1.0)


def test_no_relevant_retrieved_and_no_judgments(spark):
    got = _run(
        spark,
        [("a", 1, 1), ("a", 2, 2), ("b", 5, 1)],
        [("a", 9, 2)],  # relevant exists but unretrieved; b unjudged
        k=5,
    )
    a, b = got["a"], got["b"]
    assert a["relevant_retrieved"] == 0 and a["mrr"] == 0.0
    assert a["precision_at_k"] == 0.0 and a["recall_at_k"] == 0.0
    assert a["ndcg_at_k"] == 0.0  # dcg 0, idcg > 0
    assert b["recall_at_k"] is None and b["ndcg_at_k"] is None
    assert b["mrr"] == 0.0 and b["precision_at_k"] == 0.0


def test_rank_cut_and_ideal_cut_at_k(spark):
    # rank 4 result ignored at k=3; ideal DCG only counts top-k grades
    got = _run(
        spark,
        [("q", 1, 1), ("q", 2, 2), ("q", 3, 3), ("q", 4, 4)],
        [("q", 4, 3), ("q", 1, 1)] + [("q", 100 + i, 2) for i in range(4)],
        k=3,
    )["q"]
    assert got["retrieved"] == 3  # the rank-4 row is cut
    assert got["relevant_retrieved"] == 1
    idcg = (7 / math.log2(2) + 3 / math.log2(3) + 3 / math.log2(4))
    dcg = 1 / math.log2(2)
    assert got["ndcg_at_k"] == pytest.approx(round(dcg / idcg, 6), abs=1e-9)
    assert got["recall_at_k"] == round(1 / 6, 6)


def test_rejects_bad_k(spark):
    with pytest.raises(ValueError, match="k must be"):
        _run(spark, [("q", 1, 1)], [("q", 1, 1)], k=0)
