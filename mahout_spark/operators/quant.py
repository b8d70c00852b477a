"""Scalar int8 vector quantization (X90 — the ES/Lucene int8 kNN model).

Elasticsearch's default kNN compression is per-dimension scalar
quantization with exact rescoring (``int8_hnsw``): each float dimension
maps to one byte inside a trained per-dimension [lo, hi] range, the
candidate scan scores quantized vectors, and the true float vectors are
only read to rescore the top candidates. The same layering as PQ (X84)
at a milder ratio: 4x narrower than float32 (dim bytes/vector) with much
higher fidelity — the standard first step before PQ's 32x.

Spark-first shape, mirroring operators/pq.py:

* ``sq_train`` — per-dimension min/max in ONE partial-aggregated pass
  (2·dim scalar aggregates, all JVM-side; nothing but the 2·dim result
  row crosses the driver at any corpus size).
* ``add_sq_codes`` — one Arrow-batch numpy pass encodes each vector to a
  ``dim``-byte ``sq_code`` binary plus ``sq_norm`` (the TRUE L2 norm, so
  approximate cosines use the exact denominator — quantization error
  stays confined to the dot product).
* ``sq_ann_topk`` — the candidate scan reads ONLY id+code+norm (floats
  stay on disk), scores the DEQUANTIZED dot against the query in a
  vectorized pandas UDF, then exactly reranks the top ``rerank``.
  ``rerank >= corpus`` is provably brute force — the oracle regime the
  driver checks; quantized-only recall is test-gated.

Accuracy contract: codes are ``round((v-lo)/(hi-lo)·255)`` clipped to
[0, 255]; a degenerate dimension (hi == lo) dequantizes to the constant
lo exactly. Encoding and scoring are deterministic (round-half-even via
numpy, fixed accumulation order).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mahout_spark.checkpoint import spread_input


def sq_train(
    emb: DataFrame, vec_col: str = "embedding",
) -> tuple[np.ndarray, np.ndarray]:
    """Train the quantizer: per-dimension (lo, hi) over the FULL corpus
    in one aggregation pass — 2·dim scalar min/max exprs, JVM partial
    aggregation, a single 2·dim-value row to the driver. Returns
    (lo, hi) float64 arrays of length dim."""
    first = emb.select(vec_col).first()
    if first is None:
        raise ValueError("cannot train a quantizer on an empty table")
    dim = len(first[vec_col])
    aggs = [F.min(F.element_at(vec_col, d + 1)).alias(f"lo{d}")
            for d in range(dim)]
    aggs += [F.max(F.element_at(vec_col, d + 1)).alias(f"hi{d}")
             for d in range(dim)]
    row = emb.agg(*aggs).first()
    lo = np.array([row[f"lo{d}"] for d in range(dim)], dtype=np.float64)
    hi = np.array([row[f"hi{d}"] for d in range(dim)], dtype=np.float64)
    return lo, hi


def add_sq_codes(
    emb: DataFrame, lo: np.ndarray, hi: np.ndarray,
    vec_col: str = "embedding",
) -> DataFrame:
    """Append ``sq_code`` (dim bytes — the 4x-narrower column the
    candidate scan reads) and ``sq_norm`` (the vector's TRUE L2 norm).
    One Arrow-batch numpy pass, no per-row Python."""
    lo = np.asarray(lo, dtype=np.float64)
    hi = np.asarray(hi, dtype=np.float64)
    span = hi - lo
    safe = np.where(span > 0, span, 1.0)

    @F.pandas_udf(T.StructType([
        T.StructField("sq_code", T.BinaryType()),
        T.StructField("sq_norm", T.DoubleType()),
    ]))
    def encode(vecs: pd.Series) -> pd.DataFrame:
        if len(vecs) == 0:
            return pd.DataFrame({"sq_code": [], "sq_norm": []})
        X = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        codes = np.clip(
            np.round((X - lo) / safe * 255.0), 0, 255
        ).astype(np.uint8)
        return pd.DataFrame({
            "sq_code": [c.tobytes() for c in codes],
            "sq_norm": np.linalg.norm(X, axis=1),
        })

    # spread_input: a few-split embedding table would run the encode
    # UDF (and every downstream code scan) as one task per file
    return (
        spread_input(emb).withColumn("_sq", encode(F.col(vec_col)))
        .withColumn("sq_code", F.col("_sq.sq_code"))
        .withColumn("sq_norm", F.col("_sq.sq_norm"))
        .drop("_sq")
    )


def sq_ann_topk(
    emb: DataFrame, qvec, lo: np.ndarray, hi: np.ndarray,
    k: int = 10, rerank: int | None = None,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """Quantized ANN with exact rescoring (ES int8 kNN): approximate
    cosine from the dequantized codes (scan reads ONLY id + sq_code +
    sq_norm), top-``rerank`` candidates (default ``4*k``; tie-break
    approx desc / id asc), exact cosine rerank over just those.
    ``rerank >= corpus`` is exactly brute force (the oracle regime);
    ``rerank=0`` returns the quantized scores themselves for recall
    measurement."""
    from mahout_spark.operators.similarity import cosine_to_query_expr

    lo = np.asarray(lo, dtype=np.float64)
    hi = np.asarray(hi, dtype=np.float64)
    dim = lo.shape[0]
    q = np.asarray(qvec, dtype=np.float64)
    if q.shape[0] != dim:
        raise ValueError(
            f"query dim {q.shape[0]} does not match quantizer dim {dim}")
    span = hi - lo
    scale = np.where(span > 0, span, 0.0) / 255.0
    qn = float(np.linalg.norm(q))
    # dot(q, dequant(c)) = dot(q, lo) + sum_d q_d * scale_d * c_d:
    # one constant plus one (dim,) weighted code sum per vector
    q_lo = float(q @ lo)
    q_scale = q * scale

    @F.pandas_udf(T.DoubleType())
    def sq_dot(codes: pd.Series, norms: pd.Series) -> pd.Series:
        if len(codes) == 0:
            return pd.Series([], dtype="float64")
        C = np.frombuffer(b"".join(codes.tolist()), dtype=np.uint8)
        C = C.reshape(len(codes), dim).astype(np.float64)
        dots = q_lo + C @ q_scale
        denom = np.asarray(norms, dtype=np.float64) * qn
        return pd.Series(np.where(denom > 0, dots / denom, -1.0))

    approx = (
        emb.select(id_col, "sq_code", "sq_norm")
        .withColumn("sqs", sq_dot(F.col("sq_code"), F.col("sq_norm")))
    )
    if rerank == 0:
        return (
            approx.select(id_col, F.round("sqs", 6).alias("cosine"))
            .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
            .limit(k)
        )
    n_cand = max(k, int(rerank) if rerank is not None else 4 * k)
    # clamp to the corpus size: TakeOrderedAndProject sizes its bounded
    # priority queue by the LIMIT literal, so an "infinite" rerank
    # sentinel (e.g. 10^9 for the brute-force oracle regime) would
    # allocate a 10^9-slot queue PER TASK -- seconds of GC on one
    # partition, OOM on many. One column-pruned count, paid only when
    # the requested depth is actually queue-hazard sized.
    if n_cand > 65536:
        n_cand = min(n_cand, emb.count())
    cand = (
        approx.orderBy(F.col("sqs").desc(), F.col(id_col).asc())
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
