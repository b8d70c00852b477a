"""Product quantization for billion-scale vector search (X84: PQ / IVF-PQ).

The FAISS-standard compression layer under ANN at 100 TB: a
``dim``-float vector (256 B at dim=64) compresses to ``m`` one-byte
codes (8 B at m=8) by splitting it into ``m`` subspaces and storing,
per subspace, the id of the nearest codeword from a small trained
codebook. Queries score compressed vectors WITHOUT decompressing via
ADC (asymmetric distance computation): one ``(m, n_codes)`` lookup
table of query-subvector · codeword dot products per query, then each
vector's approximate dot product is ``m`` table lookups — no float
vector is read until the exact rerank touches the top candidates.

Why this matters at scale: brute-force cosine reads the whole float
corpus per query (4·dim bytes/vector); IVF prunes WHICH vectors are
read but still reads floats; PQ shrinks the per-vector read to ``m``
bytes (32× at dim=64/m=8), so the ADC scan is bandwidth-bound on a
column 32× narrower — and composes with IVF cell pruning
(``ivf_pq_topk``) exactly like FAISS's IVFPQ index.

Accuracy contract mirrors the repo's other ANN paths: the exact rerank
over the ADC top-``rerank`` candidates makes results EXACT whenever
the true top-k survives candidate selection; ``rerank >= corpus`` is
provably brute force (the oracle regime — it gates encode/ADC/rerank
plumbing losslessly), and ADC-only recall is test-gated on the
synthetic embeddings. Training, encoding, and scoring are
deterministic (seeded init, argmin ties to the lowest code).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mahout_spark.checkpoint import spread_input


def pq_train(
    emb: DataFrame, m: int = 8, n_codes: int = 16,
    sample_n: int = 4096, n_iters: int = 10, seed: int = 7,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> np.ndarray:
    """Train PQ codebooks: plain k-means per subspace over the same
    bounded deterministic sample the IVF trainer draws (lowest
    ``xxhash64(id)`` — one TakeOrderedAndProject job, ~sample_n·dim·8
    bytes of driver memory at ANY corpus size). Returns a float64
    ``(m, n_codes, dim // m)`` codebook tensor. ``dim`` must divide by
    ``m``; ``n_codes <= 256`` so a code is one byte."""
    if not 1 <= n_codes <= 256:
        raise ValueError(f"n_codes must be in [1, 256]: {n_codes}")
    rows = (
        emb.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col).cast("string")), F.col(id_col))
        .limit(sample_n)
        .collect()
    )
    X = np.asarray([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
    if len(X) == 0:
        raise ValueError("cannot train PQ codebooks on an empty table")
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} is not divisible by m={m} subspaces")
    dsub = dim // m
    n_codes = min(n_codes, len(X))
    rs = np.random.RandomState(seed)
    books = np.empty((m, n_codes, dsub), dtype=np.float64)
    for s in range(m):
        Xs = X[:, s * dsub:(s + 1) * dsub]
        C = Xs[rs.choice(len(Xs), size=n_codes, replace=False)].copy()
        for _ in range(n_iters):
            # squared L2 assignment; ties -> lowest code (argmin)
            d2 = ((Xs[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(n_codes):
                members = Xs[assign == c]
                if len(members):
                    C[c] = members.mean(axis=0)
        books[s] = C
    return books


def add_pq_codes(
    emb: DataFrame, codebooks: np.ndarray, vec_col: str = "embedding",
) -> DataFrame:
    """Append the compressed representation: ``pq_code`` (binary, one
    byte per subspace — the m-byte column ADC scans instead of the
    float vector) and ``pq_norm`` (the vector's true L2 norm, needed to
    turn ADC dot products into cosines). One Arrow-batch matmul per
    subspace, no per-row Python."""
    B = np.asarray(codebooks, dtype=np.float64)
    m, n_codes, dsub = B.shape

    @F.pandas_udf(T.StructType([
        T.StructField("pq_code", T.BinaryType()),
        T.StructField("pq_norm", T.DoubleType()),
    ]))
    def encode(vecs: pd.Series) -> pd.DataFrame:
        if len(vecs) == 0:
            return pd.DataFrame({"pq_code": [], "pq_norm": []})
        X = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        codes = np.empty((len(X), m), dtype=np.uint8)
        for s in range(m):
            Xs = X[:, s * dsub:(s + 1) * dsub]
            # argmin over ||x - c||^2 = ties to the lowest code id
            d2 = (
                (Xs ** 2).sum(axis=1)[:, None]
                - 2.0 * (Xs @ B[s].T)
                + (B[s] ** 2).sum(axis=1)[None, :]
            )
            codes[:, s] = np.argmin(d2, axis=1).astype(np.uint8)
        norms = np.linalg.norm(X, axis=1)
        return pd.DataFrame({
            "pq_code": [c.tobytes() for c in codes],
            "pq_norm": norms,
        })

    # spread_input: a few-split embedding table would run the encode
    # UDF (and every downstream code scan) as one task per file
    return (
        spread_input(emb).withColumn("_pq", encode(F.col(vec_col)))
        .withColumn("pq_code", F.col("_pq.pq_code"))
        .withColumn("pq_norm", F.col("_pq.pq_norm"))
        .drop("_pq")
    )


def _adc_scores_udf(codebooks: np.ndarray, qvec) -> tuple:
    """Build the query's ADC lookup table and the pandas_udf mapping a
    pq_code column to approximate cosine: LUT[s, c] = q_sub(s) · code c,
    so sum over subspaces of LUT[s, code[s]] approximates q · v, and
    dividing by |q|·pq_norm approximates the cosine."""
    B = np.asarray(codebooks, dtype=np.float64)
    m, n_codes, dsub = B.shape
    q = np.asarray(qvec, dtype=np.float64)
    if q.shape[0] != m * dsub:
        raise ValueError(
            f"query dim {q.shape[0]} does not match codebooks "
            f"({m} x {dsub})"
        )
    qn = float(np.linalg.norm(q))
    lut = np.stack([
        B[s] @ q[s * dsub:(s + 1) * dsub] for s in range(m)
    ])  # (m, n_codes)

    @F.pandas_udf(T.DoubleType())
    def adc_dot(codes: pd.Series, norms: pd.Series) -> pd.Series:
        if len(codes) == 0:
            return pd.Series([], dtype="float64")
        C = np.frombuffer(b"".join(codes.tolist()), dtype=np.uint8)
        C = C.reshape(len(codes), m)
        # per row: sum over subspaces of LUT[s, code[s]] (fancy index)
        dots = lut[np.arange(m)[None, :], C].sum(axis=1)
        denom = np.asarray(norms, dtype=np.float64) * qn
        out = np.where(denom > 0, dots / denom, -1.0)
        return pd.Series(out)

    return adc_dot, qn


def pq_ann_topk(
    emb: DataFrame, qvec, codebooks: np.ndarray,
    k: int = 10, rerank: int | None = None,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """PQ ANN by ADC: approximate cosine from the m-byte codes (a scan
    that reads ONLY id + pq_code + pq_norm — the float column stays on
    disk), top-``rerank`` candidates (default ``4*k``; deterministic
    tie-break approx desc / id asc), then exact cosine rerank over just
    those candidates. ``rerank >= corpus size`` is exactly brute force
    (every doc is a candidate and the rerank is exact) — the oracle
    regime; ADC-only ordering (``rerank=0``) returns the approximate
    scores themselves for recall measurement."""
    from mahout_spark.operators.similarity import cosine_to_query_expr

    adc_dot, _ = _adc_scores_udf(codebooks, qvec)
    approx = (
        emb.select(id_col, "pq_code", "pq_norm")
        .withColumn("adc", adc_dot(F.col("pq_code"), F.col("pq_norm")))
    )
    if rerank == 0:
        return (
            approx.select(id_col, F.round("adc", 6).alias("cosine"))
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
        approx.orderBy(F.col("adc").desc(), F.col(id_col).asc())
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


def ivf_pq_topk(
    emb: DataFrame, qvec, centroids: np.ndarray, codebooks: np.ndarray,
    k: int = 10, n_probes: int = 4, rerank: int | None = None,
    vec_col: str = "embedding", id_col: str = "vec_id",
    cell_col: str = "cell",
) -> DataFrame:
    """IVF-PQ (the FAISS IVFPQ composition): probe the ``n_probes``
    nearest cells (partition pruning when cell-partitioned on disk),
    ADC-score only the probed cells' codes, exact-rerank the ADC
    top-``rerank``. Full probes + full rerank is exactly brute force —
    the oracle regime."""
    C = np.asarray(centroids, dtype=np.float64)
    q = np.asarray(qvec, dtype=np.float64)
    order = np.argsort(-(C @ q), kind="stable")
    probes = [int(c) for c in order[:n_probes]]
    return pq_ann_topk(
        emb.filter(F.col(cell_col).isin(probes)), qvec, codebooks,
        k=k, rerank=rerank, vec_col=vec_col, id_col=id_col,
    )
