"""Scalar int8 quantization (X90, operators/quant.py): trained range,
code fidelity, full-rerank ≡ brute force, quantized-only recall floor,
and rejects."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mahout_spark.operators.quant import add_sq_codes, sq_ann_topk, sq_train
from mahout_spark.operators.similarity import brute_force_cosine_topk


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


@pytest.fixture(scope="module")
def quantizer(emb):
    return sq_train(emb)


@pytest.fixture(scope="module")
def coded(emb, quantizer):
    df = add_sq_codes(emb, *quantizer)
    df.cache().count()
    return df


def _qvec(emb, qid):
    return [float(x) for x in
            emb.filter(F.col("vec_id") == qid).first()["embedding"]]


def test_trained_range_covers_corpus(emb, quantizer):
    lo, hi = quantizer
    rows = emb.limit(50).collect()
    X = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
    assert (X >= lo - 1e-12).all() and (X <= hi + 1e-12).all()
    assert lo.shape == hi.shape and (hi >= lo).all()


def test_codes_roundtrip_within_half_step(emb, coded, quantizer):
    lo, hi = quantizer
    span = np.where(hi - lo > 0, hi - lo, 1.0)
    for r in coded.limit(20).collect():
        v = np.asarray(r["embedding"], dtype=np.float64)
        c = np.frombuffer(r["sq_code"], dtype=np.uint8).astype(np.float64)
        dq = lo + c * (np.where(hi - lo > 0, hi - lo, 0.0)) / 255.0
        # dequantization error is bounded by half a quantization step
        assert (np.abs(dq - v) <= span / 255.0 / 2 + 1e-12).all()
        assert r["sq_norm"] == pytest.approx(
            float(np.linalg.norm(v)), rel=1e-12)


def test_full_rerank_is_brute_force(emb, coded, quantizer):
    lo, hi = quantizer
    for qid in (0, 5, 17):
        q = _qvec(emb, qid)
        got = sq_ann_topk(coded, q, lo, hi, k=10, rerank=10**9).collect()
        want = brute_force_cosine_topk(emb, q, k=10).collect()
        assert [(r["vec_id"], r["cosine"]) for r in got] == \
               [(r["vec_id"], r["cosine"]) for r in want]


def test_quantized_recall_beats_pq_floor(emb, coded, quantizer):
    # int8 at dim bytes/vector is the high-fidelity tier: quantized-only
    # ordering should be near-perfect on this corpus (PQ's ADC floor is
    # 0.6 at 32x compression; int8 at 4x must do far better)
    lo, hi = quantizer
    hits = total = 0
    for qid in (0, 5, 17):
        q = _qvec(emb, qid)
        truth = {r["vec_id"] for r in
                 brute_force_cosine_topk(emb, q, k=10).collect()}
        quant = {r["vec_id"] for r in
                 sq_ann_topk(coded, q, lo, hi, k=10, rerank=0).collect()}
        hits += len(quant & truth)
        total += len(truth)
    assert hits / total >= 0.9


def test_rejects(emb, coded, quantizer):
    lo, hi = quantizer
    with pytest.raises(ValueError, match="does not match"):
        sq_ann_topk(coded, [0.0] * 3, lo, hi, k=5)
    with pytest.raises(ValueError, match="empty"):
        sq_train(emb.filter(F.col("vec_id") < 0))
