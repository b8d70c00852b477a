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
