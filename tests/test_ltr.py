"""LTR feature extraction (X126, index/ltr.py): features vs the
brute-force python oracle's statistics, rank consistency with
topk_batch, and rejects."""

import math

import pytest
from pyspark.sql import functions as F

from mahout_spark.index.build import build_index
from mahout_spark.index.ltr import ltr_features
from tests.oracle import OracleIndex

QUERIES = {"qa": ["table", "data"], "qb": ["merge", "scan", "stream"]}


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )
    return build_index(
        spark, docs, str(tmp_path_factory.mktemp("ltridx")),
        content_col="text", id_cols=["doc_id"], mode="simple",
        n_buckets=4, docs_per_shard=64, block_size=16,
    )


@pytest.fixture(scope="module")
def oracle(spark):
    rows = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text").collect()
    )
    return OracleIndex({r["doc_id"]: r["text"] for r in rows},
                       mode="simple")


def test_features_match_python_oracle(spark, built, oracle):
    got = {
        (r["query_id"], r["doc_id"]): r
        for r in ltr_features(spark, built, QUERIES, k=10).collect()
    }
    n_docs = len(oracle.tokens)
    dls = [len(t) for t in oracle.tokens.values() if t]
    avgdl = sum(dls) / len(dls)
    for qid, terms in QUERIES.items():
        want = oracle.search(terms, k=10)  # [(doc_id, score), ...]
        rows = [got[(qid, d)] for d, _ in want]
        assert [r["rank"] for r in rows] == list(range(1, len(want) + 1))
        for (doc, score), r in zip(want, rows):
            toks = oracle.tokens[doc]
            tfs = {t: toks.count(t) for t in terms if t in toks}
            assert r["bm25"] == pytest.approx(round(score, 6), abs=2e-6)
            assert r["matched_terms"] == len(tfs)
            assert r["tf_sum"] == sum(tfs.values())
            assert r["tf_max"] == max(tfs.values())
            assert r["doclen"] == len(toks)
            idf = sum(
                math.log(1 + (n_docs - oracle.df[t] + 0.5)
                         / (oracle.df[t] + 0.5))
                for t in tfs
            )
            assert r["idf_sum"] == pytest.approx(round(idf, 6), abs=2e-6)
            assert r["dl_ratio"] == pytest.approx(
                round(len(toks) / avgdl, 6), abs=2e-6)


def test_rejects(spark, built):
    with pytest.raises(ValueError, match="k must be"):
        ltr_features(spark, built, QUERIES, k=0)
    with pytest.raises(ValueError, match="empty"):
        ltr_features(spark, built, {}, k=5)


# ---------------------------------------------------------------------------
# Linear model application (X141)
# ---------------------------------------------------------------------------

def test_rescore_matches_feature_arithmetic(spark, built):
    from mahout_spark.index.ltr import ltr_rescore

    weights = {"bm25": 1.0, "dl_ratio": -0.5, "idf_sum": 0.2,
               "tf_max": 0.05}
    feats = {(r["query_id"], r["doc_id"]): r
             for r in ltr_features(spark, built, QUERIES, k=15).collect()}
    # python replay: intercept + sorted-name fold over ROUNDED features
    scored = {}
    for (qid, did), r in feats.items():
        s = 0.1
        for name in sorted(weights):
            s = s + weights[name] * r[name]
        scored.setdefault(qid, []).append((round(s, 6), did))
    want = []
    for qid, rows in scored.items():
        rows.sort(key=lambda e: (-e[0], e[1]))
        want += [(qid, did, sc, rank + 1)
                 for rank, (sc, did) in enumerate(rows[:5])]
    got = [(r["query_id"], r["doc_id"], r["model_score"], r["rank"])
           for r in ltr_rescore(spark, built, QUERIES, weights, k=5,
                                fetch=15, intercept=0.1).collect()]
    assert sorted(got) == sorted(want)
    # a weight flip reorders: the model is actually applied
    flipped = ltr_rescore(spark, built, QUERIES,
                          {"dl_ratio": 1.0}, k=5, fetch=15).collect()
    assert [(r["query_id"], r["doc_id"]) for r in flipped] != \
        [(g[0], g[1]) for g in got]


def test_rescore_rejects(spark, built):
    from mahout_spark.index.ltr import ltr_rescore

    with pytest.raises(ValueError, match="unknown LTR feature"):
        ltr_rescore(spark, built, QUERIES, {"nope": 1.0})
    with pytest.raises(ValueError, match="empty weight"):
        ltr_rescore(spark, built, QUERIES, {})
