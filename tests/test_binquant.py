"""Binary quantization (X95, operators/binquant.py): code packing and
centroid, asymmetric estimator fidelity, full-rerank ≡ brute force,
candidate-recall floor at the default 8·k overfetch, and rejects."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mahout_spark.operators.binquant import add_bq_codes, bq_ann_topk, \
    bq_train
from mahout_spark.operators.similarity import brute_force_cosine_topk


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


@pytest.fixture(scope="module")
def mean(emb):
    return bq_train(emb)


@pytest.fixture(scope="module")
def coded(emb, mean):
    df = add_bq_codes(emb, mean)
    df.cache().count()
    return df


def _qvec(emb, qid):
    return [float(x) for x in
            emb.filter(F.col("vec_id") == qid).first()["embedding"]]


def test_codes_are_packed_sign_bits(emb, coded, mean):
    dim = mean.shape[0]
    nbytes = (dim + 7) // 8
    for r in coded.limit(20).collect():
        v = np.asarray(r["embedding"], dtype=np.float64)
        assert len(r["bq_code"]) == nbytes  # 32x vs float32, 8x vs int8
        bits = np.unpackbits(
            np.frombuffer(r["bq_code"], dtype=np.uint8))[:dim]
        assert (bits == (v > mean).astype(np.uint8)).all()
        assert bits[dim:].sum() == 0 if dim % 8 else True
        assert r["bq_norm"] == pytest.approx(
            float(np.linalg.norm(v)), rel=1e-12)


def test_centroid_is_the_mean(emb, mean):
    X = np.asarray([r["embedding"] for r in emb.collect()],
                   dtype=np.float64)
    assert mean == pytest.approx(X.mean(axis=0), abs=1e-9)


def test_estimator_matches_python(emb, coded, mean):
    q = np.asarray(_qvec(emb, 3), dtype=np.float64)
    got = {r["vec_id"]: r["est"]
           for r in bq_ann_topk(coded, q, mean, k=500, rerank=0).collect()}
    rows = emb.limit(30).collect()
    for r in rows:
        v = np.asarray(r["embedding"], dtype=np.float64)
        signs = np.where(v > mean, 1.0, -1.0)
        assert got[r["vec_id"]] == pytest.approx(
            round(float((q - mean) @ signs), 6), abs=1e-6)


def test_full_rerank_is_brute_force(emb, coded, mean):
    for qid in (0, 5, 17):
        q = _qvec(emb, qid)
        got = bq_ann_topk(coded, q, mean, k=10, rerank=10**9).collect()
        want = brute_force_cosine_topk(emb, q, k=10).collect()
        assert [(r["vec_id"], r["cosine"]) for r in got] == \
               [(r["vec_id"], r["cosine"]) for r in want]


def test_candidate_recall_at_default_overfetch(emb, coded, mean):
    # the 1-bit tier's contract is CANDIDATE recall: the true top-10
    # must mostly survive into the 8·k binary-ranked candidate set the
    # exact rescorer then fixes (ES BBQ's oversample-then-rescore shape)
    hits = total = 0
    for qid in (0, 5, 17):
        q = _qvec(emb, qid)
        truth = {r["vec_id"] for r in
                 brute_force_cosine_topk(emb, q, k=10).collect()}
        cand = {r["vec_id"] for r in
                bq_ann_topk(coded, q, mean, k=80, rerank=0).collect()}
        hits += len(cand & truth)
        total += len(truth)
    assert hits / total >= 0.8


def test_rejects(emb, coded, mean):
    with pytest.raises(ValueError, match="does not match"):
        bq_ann_topk(coded, [0.0] * 3, mean, k=5)
    with pytest.raises(ValueError, match="empty"):
        bq_train(emb.filter(F.col("vec_id") < 0))
