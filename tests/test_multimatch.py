"""multi_match / dis_max (X97, operators/multimatch.py): combiner ≡
python recompute in both modes, boosts, tie pinning, field-local BM25
stats, rejects."""

import math

import pytest
from pyspark.sql import functions as F

from mahout_spark.operators.multimatch import (
    field_bm25_scores,
    multi_match_combine,
)


@pytest.fixture(scope="module")
def fields(spark):
    title = spark.createDataFrame(
        [(1, 2.0), (2, 5.0), (4, 1.0)], "doc_id bigint, score double")
    body = spark.createDataFrame(
        [(1, 3.0), (2, 5.0), (3, 4.0)], "doc_id bigint, score double")
    return {"title": title, "body": body}


def test_best_fields_matches_python(fields):
    got = multi_match_combine(
        fields, boosts={"title": 2.0}, tie_breaker=0.3).collect()
    # boosted: title {1: 4, 2: 10, 4: 2}, body {1: 3, 2: 5, 3: 4}
    exp = {
        1: round(4.0 + 0.3 * 3.0, 6),
        2: round(10.0 + 0.3 * 5.0, 6),
        3: 4.0,
        4: 2.0,
    }
    assert {r["doc_id"]: r["score"] for r in got} == exp
    order = [r["doc_id"] for r in got]
    assert order == sorted(exp, key=lambda d: (-exp[d], d))
    best = {r["doc_id"]: r["best_field"] for r in got}
    assert best == {1: "title", 2: "title", 3: "body", 4: "title"}


def test_tie_pins_to_field_name_asc(fields):
    got = multi_match_combine(fields, tie_breaker=0.0).collect()
    best = {r["doc_id"]: r["best_field"] for r in got}
    assert best[2] == "body"  # 5.0 == 5.0 → lexicographically first
    scores = {r["doc_id"]: r["score"] for r in got}
    assert scores == {1: 3.0, 2: 5.0, 3: 4.0, 4: 1.0}  # pure dis_max


def test_most_fields_is_the_sum(fields):
    got = multi_match_combine(fields, mode="most_fields", k=2).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [(2, 10.0), (1, 5.0)]


def test_rejects(fields):
    with pytest.raises(ValueError, match="mode"):
        multi_match_combine(fields, mode="worst_fields")
    with pytest.raises(ValueError, match="tie_breaker"):
        multi_match_combine(fields, tie_breaker=1.5)
    with pytest.raises(ValueError, match="non-empty"):
        multi_match_combine({})
    with pytest.raises(ValueError, match="unknown fields"):
        multi_match_combine(fields, boosts={"abstract": 2.0})


def test_field_bm25_uses_field_local_stats(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, "alpha alpha gamma beta"),
         (2, "delta"), (3, None)],
        "doc_id bigint, text string")
    got = {r["doc_id"]: r["score"]
           for r in field_bm25_scores(docs, ["alpha"]).collect()}
    # field-local: n_docs = 3 (docs with >= 1 token), df(alpha) = 2,
    # avgdl = (2 + 4 + 1) / 3
    nd, df_, avgdl, k1, b = 3, 2, 7.0 / 3.0, 1.2, 0.75
    idf = math.log(1.0 + (nd - df_ + 0.5) / (df_ + 0.5))

    def bm25(tf, dl):
        return idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))

    assert got.keys() == {0, 1}
    assert got[0] == pytest.approx(bm25(1, 2), rel=1e-12)
    assert got[1] == pytest.approx(bm25(2, 4), rel=1e-12)
    empty = field_bm25_scores(
        docs.filter(F.col("doc_id") < 0), ["alpha"])
    assert empty.count() == 0
