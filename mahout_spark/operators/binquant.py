"""Binary vector quantization (X95 — the ES/Lucene BBQ compression tier).

Elasticsearch's newest kNN default (``bbq_hnsw``, the RaBitQ-derived
"Better Binary Quantization") compresses each vector to ONE BIT per
dimension — 32x narrower than float32, 8x narrower than X90's int8 —
and recovers accuracy with asymmetric scoring (full-precision query
against binary docs) plus exact rescoring of the top candidates. This
module is that tier's Spark expression, completing the compression
ladder: float (brute/IVF) → int8 (X90, 4x) → PQ (X84, 32x trained
codebooks) → binary (32x, training = one mean pass).

Spark-first shape, mirroring operators/quant.py:

* ``bq_train`` — the per-dimension corpus mean (RaBitQ centers before
  taking signs; an uncentered all-positive corpus would quantize to all
  ones) in ONE partial-aggregated pass: dim scalar avg exprs, JVM-side,
  only the dim-value row crosses the driver.
* ``add_bq_codes`` — one Arrow-batch numpy pass packs ``sign(v - mean)``
  into ``ceil(dim/8)`` bytes (``bq_code``) and keeps the TRUE L2 norm
  (``bq_norm``) so the exact-rescore contract matches X90's.
* ``bq_ann_topk`` — the candidate scan reads ONLY id + code + norm;
  the asymmetric estimator scores ``dot(q - mean, sign(v - mean))``
  per vector from unpacked bits (``2·(B @ qc) − sum(qc)`` — one GEMV
  per Arrow batch, no per-row Python), then exact-cosine reranks the
  top ``rerank``. ``rerank >= corpus`` is provably brute force — the
  oracle regime; binary-only candidate recall is test-gated.

Determinism: packing uses numpy's big-endian ``packbits``; ``v == mean``
quantizes to bit 0 (sign −1); ties in both phases break on id asc.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mahout_spark.checkpoint import spread_input


def bq_train(emb: DataFrame, vec_col: str = "embedding") -> np.ndarray:
    """Train the quantizer: the per-dimension mean over the FULL corpus
    in one aggregation pass (dim scalar avg exprs, JVM partial
    aggregation, a single dim-value row to the driver). Returns the
    float64 centroid of length dim."""
    first = emb.select(vec_col).first()
    if first is None:
        raise ValueError("cannot train a quantizer on an empty table")
    dim = len(first[vec_col])
    row = emb.agg(*[
        F.avg(F.element_at(vec_col, d + 1)).alias(f"m{d}")
        for d in range(dim)
    ]).first()
    return np.array([row[f"m{d}"] for d in range(dim)], dtype=np.float64)


def add_bq_codes(
    emb: DataFrame, mean: np.ndarray, vec_col: str = "embedding",
) -> DataFrame:
    """Append ``bq_code`` (``ceil(dim/8)`` bytes — sign bits of the
    centered vector, the 32x-narrower column the candidate scan reads)
    and ``bq_norm`` (the vector's TRUE L2 norm). One Arrow-batch numpy
    pass, no per-row Python."""
    mean = np.asarray(mean, dtype=np.float64)

    @F.pandas_udf(T.StructType([
        T.StructField("bq_code", T.BinaryType()),
        T.StructField("bq_norm", T.DoubleType()),
    ]))
    def encode(vecs: pd.Series) -> pd.DataFrame:
        if len(vecs) == 0:
            return pd.DataFrame({"bq_code": [], "bq_norm": []})
        X = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        bits = (X > mean)
        packed = np.packbits(bits, axis=1)  # big-endian, zero-padded
        return pd.DataFrame({
            "bq_code": [p.tobytes() for p in packed],
            "bq_norm": np.linalg.norm(X, axis=1),
        })

    # spread_input: a few-split embedding table would run the encode
    # UDF (and every downstream code scan) as one task per file
    return (
        spread_input(emb).withColumn("_bq", encode(F.col(vec_col)))
        .withColumn("bq_code", F.col("_bq.bq_code"))
        .withColumn("bq_norm", F.col("_bq.bq_norm"))
        .drop("_bq")
    )


def bq_ann_topk(
    emb: DataFrame, qvec, mean: np.ndarray,
    k: int = 10, rerank: int | None = None,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """Binary-quantized ANN with exact rescoring (ES BBQ kNN):
    asymmetric estimator ``dot(q - mean, sign(v - mean))`` from the
    sign bits (scan reads ONLY id + bq_code + bq_norm; ranking by the
    estimator equals ranking by the estimated cosine — the ±1 vector's
    norm is the constant sqrt(dim)), top-``rerank`` candidates (default
    ``8*k`` — a coarser tier overfetches more than int8's 4·k;
    tie-break estimate desc / id asc), exact cosine rerank over just
    those. ``rerank >= corpus`` is exactly brute force (the oracle
    regime); ``rerank=0`` returns the estimator itself for recall
    measurement."""
    from mahout_spark.operators.similarity import cosine_to_query_expr

    mean = np.asarray(mean, dtype=np.float64)
    dim = mean.shape[0]
    q = np.asarray(qvec, dtype=np.float64)
    if q.shape[0] != dim:
        raise ValueError(
            f"query dim {q.shape[0]} does not match quantizer dim {dim}")
    qc = q - mean
    qc_sum = float(qc.sum())
    nbytes = (dim + 7) // 8

    # dot(qc, 2B-1) over the real dims = 2*(B[:, :dim] @ qc) - sum(qc);
    # pad bits are sliced off before the GEMV so they never contribute
    @F.pandas_udf(T.DoubleType())
    def bq_est(codes: pd.Series) -> pd.Series:
        if len(codes) == 0:
            return pd.Series([], dtype="float64")
        raw = np.frombuffer(b"".join(codes.tolist()), dtype=np.uint8)
        bits = np.unpackbits(raw.reshape(len(codes), nbytes), axis=1)
        est = 2.0 * (bits[:, :dim].astype(np.float64) @ qc) - qc_sum
        return pd.Series(est)

    approx = (
        emb.select(id_col, "bq_code")
        .withColumn("est", bq_est(F.col("bq_code")))
    )
    if rerank == 0:
        return (
            approx.select(id_col, F.round("est", 6).alias("est"))
            .orderBy(F.col("est").desc(), F.col(id_col).asc())
            .limit(k)
        )
    n_cand = max(k, int(rerank) if rerank is not None else 8 * k)
    # clamp to the corpus size: TakeOrderedAndProject sizes its bounded
    # priority queue by the LIMIT literal, so an "infinite" rerank
    # sentinel (e.g. 10^9 for the brute-force oracle regime) would
    # allocate a 10^9-slot queue PER TASK -- seconds of GC on one
    # partition, OOM on many. One column-pruned count, paid only when
    # the requested depth is actually queue-hazard sized.
    if n_cand > 65536:
        n_cand = min(n_cand, emb.count())
    cand = (
        approx.orderBy(F.col("est").desc(), F.col(id_col).asc())
        .limit(n_cand)
        .select(id_col)
    )
    return (
        emb.join(F.broadcast(cand), id_col, "left_semi")
        .select(
            id_col,
            F.round(cosine_to_query_expr(F.col(vec_col), qvec), 6)
            .alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )
