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


# ---------------------------------------------------------------------------
# combined_fields / BM25F (X106)
# ---------------------------------------------------------------------------

def test_combined_fields_matches_python_bm25f(spark):
    import math

    from mahout_spark.operators.multimatch import combined_fields_topk

    title = spark.createDataFrame(
        [(0, "alpha beta"), (1, "gamma"), (2, "alpha alpha")],
        "doc_id bigint, text string")
    body = spark.createDataFrame(
        [(0, "alpha gamma delta"), (1, "alpha alpha beta beta"),
         (3, "delta delta")],
        "doc_id bigint, text string")
    W = {"title": 2.0, "body": 1.0}
    got = {r["doc_id"]: r["score"] for r in combined_fields_topk(
        {"title": title, "body": body}, ["alpha", "beta"],
        weights=W).collect()}

    # python BM25F over the virtual field
    tf = {}   # (doc, term) -> tf'
    dl = {}   # doc -> dl'
    fields = {"title": {0: "alpha beta", 1: "gamma", 2: "alpha alpha"},
              "body": {0: "alpha gamma delta", 1: "alpha alpha beta beta",
                       3: "delta delta"}}
    for fname, docs in fields.items():
        for d, text in docs.items():
            toks = text.split()
            dl[d] = dl.get(d, 0.0) + W[fname] * len(toks)
            for t in toks:
                tf[(d, t)] = tf.get((d, t), 0.0) + W[fname]
    nd = len(dl)
    avgdl = sum(dl.values()) / nd
    df = {}
    for (d, t) in tf:
        df[t] = df.get(t, 0) + 1
    k1, b = 1.2, 0.75
    exp = {}
    for d in dl:
        s = 0.0
        for t in ("alpha", "beta"):
            tfp = tf.get((d, t), 0.0)
            if tfp == 0:
                continue
            idf = math.log(1.0 + (nd - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * tfp * (k1 + 1) / (
                tfp + k1 * (1 - b + b * dl[d] / avgdl))
        if s > 0:
            exp[d] = round(s, 6)
    assert got == pytest.approx(exp)


def test_combined_fields_equal_weight_dup_doclen(spark):
    # two fields with IDENTICAL weighted doclen for a doc must BOTH
    # count toward dl' (the collapse bug this pins)
    from mahout_spark.operators.multimatch import combined_fields_topk

    a = spark.createDataFrame([(0, "x y")], "doc_id bigint, text string")
    b = spark.createDataFrame([(0, "x z")], "doc_id bigint, text string")
    got = combined_fields_topk({"a": a, "b": b}, ["x"]).first()
    # dl' = 4 (not 2); tf'(x) = 2; one doc, df=1: idf = ln(1 + 0.5/1.5)
    import math
    idf = math.log(1.0 + 0.5 / 1.5)
    k1, bb = 1.2, 0.75
    expected = idf * 2 * (k1 + 1) / (2 + k1 * (1 - bb + bb * 4.0 / 4.0))
    assert got["score"] == pytest.approx(round(expected, 6))


def test_combined_fields_rejects(spark):
    from mahout_spark.operators.multimatch import combined_fields_topk

    a = spark.createDataFrame([(0, "x")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="non-empty"):
        combined_fields_topk({}, ["x"])
    with pytest.raises(ValueError, match="unknown"):
        combined_fields_topk({"a": a}, ["x"], weights={"zz": 1.0})


def test_multi_match_single_hash_exchange(fields):
    # the claim in the module docstring: the tie-pin window and the
    # combine groupBy hash on the same key -> Catalyst plans ONE hash
    # exchange (the trailing range partition is the final orderBy)
    import re

    out = multi_match_combine(fields, tie_breaker=0.3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan
