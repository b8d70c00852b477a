"""Similarity search over an embedding column (``array<float>``).

Brute-force cosine top-k is the exact baseline (and the DuckDB-oracle-
checkable query); random-hyperplane LSH bucketing is the scale path —
at 10^9+ vectors the full scan reads everything once per query, while the
bucketed variant prunes to candidate buckets (partition-prunable when the
bucket is a write-time partition column, exactly like the postings table's
term buckets in index/build.py).

Exactness contract mirrors the text engine: brute force is exact; LSH
top-k is exact *within recalled candidates* (scores are true cosines,
double precision, fixed accumulation order) — recall measured in tests
against brute force.

Distance arithmetic: products in double, left-to-right accumulation
(zip_with + aggregate, or numpy dot in the batched UDF which for the
rerank path is then recomputed JVM-side for the final ordering), rounded
once to 6; ties broken ascending on the vector id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot_expr(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_to_query_expr(vec_col, qvec: list[float]):
    """Column expression: cosine(vec_col, qvec) in double, fixed order."""
    q = F.array(*[F.lit(float(x)) for x in qvec])
    qn = float(np.sqrt(np.sum(np.asarray(qvec, dtype=np.float64) ** 2)))
    return _dot_expr(vec_col, q) / (F.sqrt(_dot_expr(vec_col, vec_col)) * F.lit(qn))


def brute_force_cosine_topk(
    emb: DataFrame, qvec: list[float], k: int = 10,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k: one narrow scan + TakeOrderedAndProject. The
    plan Spark picks is a per-partition top-k then a driver merge of k·P
    rows — already the right distributed shape; no shuffle of the corpus."""
    return (
        emb.select(
            id_col,
            F.round(cosine_to_query_expr(F.col(vec_col), qvec), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


# ---------------------------------------------------------------------------
# random-hyperplane LSH
# ---------------------------------------------------------------------------

def _hyperplanes(dim: int, nbits: int, seed: int) -> np.ndarray:
    return np.random.RandomState(seed).normal(size=(nbits, dim))


def add_lsh_buckets(
    emb: DataFrame, dim: int, nbits: int = 12, seed: int = 7,
    vec_col: str = "embedding",
) -> DataFrame:
    """Append a ``bucket`` column: sign pattern of ``nbits`` seeded random
    hyperplanes (vectorized Arrow UDF — one matmul per Arrow batch). Write
    the result partitioned by bucket and queries become partition-pruned
    scans; 2^nbits buckets ⇒ expected corpus/2^nbits candidates/probe."""
    planes = _hyperplanes(dim, nbits, seed)

    @F.pandas_udf(T.IntegerType())
    def bucket_udf(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int32")
        m = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        bits = (m @ planes.T) > 0  # (n, nbits)
        weights = (1 << np.arange(nbits)).astype(np.int64)
        return pd.Series((bits @ weights).astype(np.int32))

    return emb.withColumn("bucket", bucket_udf(F.col(vec_col)))


def lsh_ann_topk(
    emb: DataFrame, qvec: list[float], k: int = 10, nbits: int = 12,
    seed: int = 7, n_probes: int | None = None,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """Approximate NN: probe the query's bucket plus its hamming-1
    neighbors (multi-probe: the default n_probes = 1 + nbits covers every
    single-bit flip — resolved from the ACTUAL nbits so raising nbits
    never silently drops probes), exact cosine rerank inside.

    The candidate filter is ``bucket IN (...)`` — a JVM-side predicate that
    becomes partition pruning when the table is bucket-partitioned on disk.
    """
    if n_probes is None:
        n_probes = 1 + nbits
    dim = len(qvec)
    planes = _hyperplanes(dim, nbits, seed)
    q = np.asarray(qvec, dtype=np.float64)
    qbits = (planes @ q) > 0
    weights = (1 << np.arange(nbits)).astype(np.int64)
    qbucket = int(qbits @ weights)
    probes = [qbucket] + [qbucket ^ (1 << i) for i in range(nbits)]
    probes = probes[:n_probes]
    bucketed = add_lsh_buckets(emb, dim, nbits, seed, vec_col)
    return (
        bucketed.filter(F.col("bucket").isin(probes))
        .select(
            id_col,
            F.round(cosine_to_query_expr(F.col(vec_col), qvec), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) coarse quantizer — the other standard ANN scale path
# ---------------------------------------------------------------------------

def ivf_train_centroids(
    emb: DataFrame, n_cells: int = 16, sample_n: int = 4096,
    n_iters: int = 10, seed: int = 7,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> np.ndarray:
    """Train the IVF coarse quantizer: spherical k-means over a bounded
    deterministic sample, driver-side numpy.

    The sample is the ``sample_n`` lowest ``xxhash64(id)`` vectors — a
    content-addressed pseudo-random draw (TakeOrderedAndProject: one
    bounded job, no shuffle of the corpus; same idiom as clustering.py's
    bounded canopy sample). sample_n·dim·8 bytes of driver memory
    (~2 MB at 4096×64) regardless of corpus size; at 10^9+ vectors the
    quantizer trains on exactly the same bounded sample. Returns a
    unit-norm ``(n_cells, dim)`` float64 matrix; empty cells keep their
    previous centroid (k-means standard), assignment ties go to the
    lowest cell index (numpy argmax), so training is deterministic."""
    rows = (
        emb.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col).cast("string")), F.col(id_col))
        .limit(sample_n)
        .collect()
    )
    X = np.asarray([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
    norms = np.linalg.norm(X, axis=1) if len(X) else np.empty(0)
    X = X[norms > 0] / norms[norms > 0][:, None] if len(X) else X
    if len(X) == 0:
        raise ValueError("cannot train IVF centroids without nonzero vectors")
    n_cells = min(n_cells, len(X))
    rs = np.random.RandomState(seed)
    C = X[rs.choice(len(X), size=n_cells, replace=False)].copy()
    for _ in range(n_iters):
        assign = np.argmax(X @ C.T, axis=1)  # ties -> lowest cell
        for c in range(n_cells):
            members = X[assign == c]
            if len(members) == 0:
                continue
            m = members.mean(axis=0)
            n = np.linalg.norm(m)
            if n > 0:
                C[c] = m / n
    return C


def add_ivf_cells(
    emb: DataFrame, centroids: np.ndarray, vec_col: str = "embedding",
) -> DataFrame:
    """Append a ``cell`` column: nearest centroid by cosine. Since the
    centroids are unit-norm and |v| is constant across cells, the argmax
    of the raw dot products IS the cosine argmax — one matmul per Arrow
    batch, no per-row normalization. At scale the table is written once
    ``partitionBy("cell")`` and probes become partition-pruned scans
    (the embedding analog of the postings table's term buckets)."""
    C = np.asarray(centroids, dtype=np.float64)

    @F.pandas_udf(T.IntegerType())
    def cell_udf(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int32")
        m = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        return pd.Series(np.argmax(m @ C.T, axis=1).astype(np.int32))

    return emb.withColumn("cell", cell_udf(F.col(vec_col)))


def write_ivf_table(
    emb: DataFrame, centroids: np.ndarray, path: str,
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF layout on disk: the embedding table written
    ``partitionBy("cell")`` (hive-style ``cell=<i>/`` dirs) so probes
    become PARTITION-PRUNED scans — the embedding analog of the postings
    table's term buckets. One narrow pass (the cell assignment matmul)
    plus the partitioned write; run once per (corpus, quantizer), then
    every query reads ~n_probes/n_cells of the data (plan-gated:
    the probe's scan carries the cell predicate in PartitionFilters)."""
    add_ivf_cells(emb, centroids, vec_col).write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(path)


def ivf_ann_topk_from_table(
    spark, path: str, qvec: list[float], centroids: np.ndarray,
    k: int = 10, n_probes: int = 4,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """IVF ANN over the cell-partitioned table ``write_ivf_table``
    produced: probe-cell selection is driver-side math, the ``cell IN
    (...)`` predicate prunes PARTITIONS (directories never opened, not
    just row groups), and the exact cosine rerank runs inside the
    surviving cells only. Results are identical to the in-memory
    ``ivf_ann_topk`` on the same quantizer (test-gated), and exactly
    brute force when ``n_probes >= n_cells``."""
    C = np.asarray(centroids, dtype=np.float64)
    q = np.asarray(qvec, dtype=np.float64)
    order = np.argsort(-(C @ q), kind="stable")  # ties -> lowest cell
    probes = [int(c) for c in order[:n_probes]]
    cells = spark.read.parquet(path)
    return (
        cells.filter(F.col("cell").isin(probes))
        .select(
            id_col,
            F.round(
                cosine_to_query_expr(F.col(vec_col), qvec), 6
            ).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def ivf_ann_topk(
    emb: DataFrame, qvec: list[float], centroids: np.ndarray,
    k: int = 10, n_probes: int = 4,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """IVF approximate NN: probe the ``n_probes`` cells whose centroids
    are most cosine-similar to the query (driver-side — |centroids| is
    tiny), exact cosine rerank inside. With ``n_probes >= n_cells`` the
    filter passes every vector and the result is EXACTLY brute force —
    the oracle regime: it checks assignment/probe/rerank plumbing is
    lossless; recall in the approximate regime is test-gated like LSH.

    The candidate filter is ``cell IN (...)`` — partition pruning when
    the corpus is cell-partitioned on disk, so a probe reads
    ~n_probes/n_cells of the data instead of all of it."""
    C = np.asarray(centroids, dtype=np.float64)
    q = np.asarray(qvec, dtype=np.float64)
    order = np.argsort(-(C @ q), kind="stable")  # ties -> lowest cell
    probes = [int(c) for c in order[:n_probes]]
    cells = add_ivf_cells(emb, C, vec_col)
    return (
        cells.filter(F.col("cell").isin(probes))
        .select(
            id_col,
            F.round(cosine_to_query_expr(F.col(vec_col), qvec), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def lsh_neardup_pairs(
    emb: DataFrame, threshold: float = 0.4, nbits: int = 8, seed: int = 7,
    vec_col: str = "embedding", id_col: str = "vec_id",
    dim: int | None = None,
) -> DataFrame:
    """Near-dup pairs via LSH bucket blocking + exact cosine verification.

    Candidates = pairs sharing a random-hyperplane bucket; each candidate
    is verified with the exact double-precision cosine (same fixed
    accumulation order as dedup.embedding_neardup_pairs), so precision is
    exact and only recall depends on the LSH parameters. Expected
    candidate volume ~ n²/2^nbits instead of n²/2 — the quadratic exact
    baseline's scale path.
    """
    if dim is None:
        first = emb.select(vec_col).first()
        dim = len(first[0])
    bucketed = add_lsh_buckets(emb, dim, nbits, seed, vec_col).select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("v"), "bucket"
    )
    def norm2(c):
        return F.aggregate(
            F.zip_with(c, c, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0), lambda acc, x: acc + x,
        )

    withn = bucketed.withColumn("nrm", F.sqrt(norm2(F.col("v"))))
    a, b = withn.alias("a"), withn.alias("b")
    dot = F.aggregate(
        F.zip_with(
            F.col("a.v"), F.col("b.v"),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vid") < F.col("b.vid")),
        )
        .select(
            F.col("a.vid").alias("id_a"),
            F.col("b.vid").alias("id_b"),
            F.round(dot / (F.col("a.nrm") * F.col("b.nrm")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def pairwise_topk_join(
    left: DataFrame, right: DataFrame, k: int = 5,
    vec_col: str = "embedding", left_id: str = "vec_id",
    right_id: str = "vec_id",
) -> DataFrame:
    """k-NN join: for every left vector, its top-k right vectors by cosine.
    Broadcast the smaller right side; per-left top-k via window. Exact —
    the building block for embedding-dedup 'match against canonical set'.
    """
    r = right.select(
        F.col(right_id).alias("rid"), F.col(vec_col).alias("rv")
    )
    pairs = left.select(
        F.col(left_id).alias("lid"), F.col(vec_col).alias("lv")
    ).crossJoin(F.broadcast(r))
    cos = _dot_expr(F.col("lv"), F.col("rv")) / (
        F.sqrt(_dot_expr(F.col("lv"), F.col("lv")))
        * F.sqrt(_dot_expr(F.col("rv"), F.col("rv")))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("lid").orderBy(
        F.col("cosine").desc(), F.col("rid").asc()
    )
    return (
        pairs.select(
            "lid", "rid", F.round(cos, 6).alias("cosine")
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_ann_topk_filtered(
    emb: DataFrame, qvec: list[float], centroids: np.ndarray,
    filter_pred, k: int = 10, n_probes: int = 4,
    vec_col: str = "embedding", id_col: str = "vec_id",
    cell_col: str = "cell",
) -> DataFrame:
    """Attribute-filtered ANN (the ES kNN ``filter`` model): top-k by
    exact cosine among vectors that pass ``filter_pred`` (a Column or a
    SQL string), candidates drawn from IVF probe cells with ADAPTIVE
    over-probing — a selective filter empties the first probe set, and
    silently returning fewer than k is the classic filtered-ANN recall
    trap, so the probe count doubles (one cheap ``limit(k).count()``
    per step — candidate-bounded, not corpus-bounded) until k filtered
    candidates exist or every cell is probed. At ``n_probes >=
    n_cells`` the result is EXACTLY the filtered brute force — the
    oracle regime; recall below that is test-gated on planted
    neighbors. The filter composes with cell-partition pruning: both
    predicates reach the same scan."""
    C = np.asarray(centroids, dtype=np.float64)
    q = np.asarray(qvec, dtype=np.float64)
    if isinstance(filter_pred, str):
        filter_pred = F.expr(filter_pred)
    order = np.argsort(-(C @ q), kind="stable")
    n_cells = len(C)
    probes = min(max(1, int(n_probes)), n_cells)
    while True:
        cells = [int(c) for c in order[:probes]]
        cand = emb.filter(F.col(cell_col).isin(cells)).filter(filter_pred)
        if probes >= n_cells or cand.limit(k).count() >= k:
            break
        probes = min(n_cells, probes * 2)
    return (
        cand.select(
            id_col,
            F.round(cosine_to_query_expr(F.col(vec_col), qvec), 6)
            .alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def mmr_rerank(
    emb: DataFrame, qvec, k: int = 10, fetch: int = 50,
    lambda_: float = 0.5,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """Maximal Marginal Relevance diversification (X108 — the standard
    RAG-retrieval rerank, Carbonell & Goldstein '98): fetch the exact
    cosine top-``fetch`` candidates DISTRIBUTED (one narrow scan +
    TakeOrdered — never more than ``fetch`` rows leave the cluster),
    then greedily select k maximizing
    ``λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s)``.

    The greedy loop is inherently sequential over ≤ ``fetch`` rows
    (a knob, ~50-200), so the DRIVER is the right executor for it —
    this is post-retrieval reranking, not retrieval; the corpus-sized
    work already happened in the candidate fetch. λ=1 is pure
    relevance (≡ the underlying top-k order); λ=0 pure diversity.
    Deterministic: ties (at 1e-12) break on candidate fetch order
    (cosine desc, id asc); vectors are L2-normalized once so sim is
    exact cosine. Returns (id, cosine, mmr, rank) in selection
    order."""
    import numpy as np

    if not 0.0 <= lambda_ <= 1.0:
        raise ValueError(f"lambda_ must be in [0, 1]: {lambda_}")
    if fetch < k:
        raise ValueError(f"fetch {fetch} < k {k}")
    cand = (
        emb.select(
            id_col, vec_col,
            F.round(cosine_to_query_expr(F.col(vec_col), qvec), 6)
            .alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(fetch)
        .collect()
    )
    spark = emb.sparkSession
    schema = f"{id_col} long, cosine double, mmr double, rank int"
    if not cand:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(
        _mmr_greedy(cand, k, lambda_, id_col, vec_col), schema
    )


def _mmr_greedy(cand: list, k: int, lambda_: float,
                id_col: str, vec_col: str) -> list:
    """The sequential MMR selection over one query's ≤fetch candidate
    rows (already in cosine desc / id asc order). Shared verbatim by the
    single-query and batch entry points so batch ≡ per-query is by
    construction (and identity test-gated)."""
    import numpy as np

    ids = [r[id_col] for r in cand]
    rel = np.array([r["cosine"] for r in cand])
    X = np.asarray([r[vec_col] for r in cand], dtype=np.float64)
    norms = np.linalg.norm(X, axis=1)
    X = X / np.where(norms > 0, norms, 1.0)[:, None]
    n = len(cand)
    picked: list[int] = []
    max_sim = np.full(n, -np.inf)
    out = []
    for rank in range(min(k, n)):
        if picked:
            mmr = lambda_ * rel - (1.0 - lambda_) * max_sim
        else:
            mmr = lambda_ * rel
        mmr = np.where(np.isin(np.arange(n), picked), -np.inf, mmr)
        # argmax with id-asc ties: ids are already in (cosine desc,
        # id asc) fetch order, and np.argmax takes the first maximum
        best = int(np.argmax(np.round(mmr, 12)))
        picked.append(best)
        out.append((int(ids[best]), float(rel[best]),
                    round(float(mmr[best]), 6), rank + 1))
        sims = X @ X[best]
        max_sim = np.maximum(max_sim, sims)
    return out


def mmr_rerank_batch(
    emb: DataFrame, queries: dict, k: int = 10, fetch: int = 50,
    lambda_: float = 0.5,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """Batched MMR (round-4 VERDICT ask #10): many queries answered by
    ONE candidate-fetch job instead of one TakeOrdered job per query —
    the ``topk_batch`` shape applied to vectors. Per corpus row the
    cosines against every query compute in one JVM projection (an
    exploded struct array), an Arrow-batched partial prune keeps ≤fetch
    rows per (batch, query) so the exact per-query window shuffles
    O(partitions × |Q| × fetch) rows — never O(N × |Q|) — and the
    ≤ |Q|·fetch surviving candidates reach the driver once, where each
    query runs the IDENTICAL greedy as ``mmr_rerank`` (identity
    test-gated). Returns (query_id, id, cosine, mmr, rank) in
    per-query selection order."""
    import pandas as pd
    from pyspark.sql import Window

    if not 0.0 <= lambda_ <= 1.0:
        raise ValueError(f"lambda_ must be in [0, 1]: {lambda_}")
    if fetch < k:
        raise ValueError(f"fetch {fetch} < k {k}")
    spark = emb.sparkSession
    out_schema = (f"query_id string, {id_col} long, cosine double, "
                  "mmr double, rank int")
    if not queries:
        return spark.createDataFrame([], out_schema)
    qitems = sorted(queries.items())
    structs = F.array(*[
        F.struct(
            F.lit(str(qid)).alias("query_id"),
            F.round(cosine_to_query_expr(F.col(vec_col), qv), 6)
            .alias("cosine"),
        )
        for qid, qv in qitems
    ])
    exploded = emb.select(
        id_col, vec_col, F.explode(structs).alias("_s")
    ).select("_s.query_id", F.col(id_col), "_s.cosine", vec_col)

    def prune(batches):
        for pdf in batches:
            yield (
                pdf.sort_values(["query_id", "cosine", id_col],
                                ascending=[True, False, True])
                .groupby("query_id", sort=False).head(fetch)
            )

    pruned = exploded.mapInPandas(prune, exploded.schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    cand = (
        pruned.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= fetch)
        .drop("_rn")
        .collect()
    )
    by_q: dict[str, list] = {}
    for r in cand:
        by_q.setdefault(r["query_id"], []).append(r)
    for lst in by_q.values():  # collect() order is shuffle order —
        lst.sort(key=lambda r: (-r["cosine"], r[id_col]))  # re-pin it
    rows = []
    for qid, _ in qitems:
        rows.extend(
            (str(qid),) + tuple(sel)
            for sel in _mmr_greedy(
                by_q.get(str(qid), []), k, lambda_, id_col, vec_col
            )
        )
    return spark.createDataFrame(rows, out_schema)


def semantic_dedup(
    emb: DataFrame,
    threshold: float = 0.95,
    n_cells: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_n: int = 4096,
    seed: int = 7,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023 — semantic dedup for pretraining
    data): cluster the embeddings with the IVF coarse quantizer, then
    WITHIN each cluster drop every vector that is ``>= threshold``
    cosine-similar to an already-kept one. Keep order is pinned to the
    paper's selection rule: ascending cosine-to-centroid (the LEAST
    cluster-typical member of a duplicate neighborhood survives), id
    ascending on ties — fully deterministic, re-runs bit-identical.

    Returns one row per nonzero vector: ``(id, cell, centroid_cos,
    kept, dup_of)`` — ``dup_of`` is the kept vector that suppressed a
    dropped one (the audit trail).

    Scale shape: centroid training is the bounded deterministic sample
    (driver numpy, corpus never shuffled); assignment is one Arrow
    matmul; the greedy runs per cell via ``applyInPandas`` — one
    exchange keyed on the cell id. Within a cell the cost is
    O(kept × members) vector ops; cells are corpus/n_cells sized, so
    n_cells must grow with the corpus (the paper uses 50k clusters at
    LAION scale) — same per-partition-budget contract as the positional
    kernels. Cross-cluster near-dups are out of contract (the paper's
    own approximation).
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1]: {threshold}")
    C = ivf_train_centroids(
        emb, n_cells=n_cells, sample_n=sample_n, seed=seed,
        vec_col=vec_col, id_col=id_col,
    )
    staged = add_ivf_cells(emb, C, vec_col).select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"), "cell")

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        cell = int(pdf["cell"].iloc[0])
        X = np.asarray([np.asarray(v, dtype=np.float64)
                        for v in pdf["_v"]])
        ids = pdf["_id"].to_numpy(np.int64)
        norms = np.linalg.norm(X, axis=1)
        nz = norms > 0
        X, ids, norms = X[nz], ids[nz], norms[nz]
        if len(ids) == 0:
            return pd.DataFrame({
                "vec_id": pd.Series([], dtype="int64"),
                "cell": pd.Series([], dtype="int32"),
                "centroid_cos": pd.Series([], dtype="float64"),
                "kept": pd.Series([], dtype="bool"),
                "dup_of": pd.array([], dtype="Int64"),
            })
        U = X / norms[:, None]
        ccos = U @ C[cell]
        order = np.lexsort((ids, np.round(ccos, 12)))
        kept_rows: list[int] = []
        kept = np.zeros(len(ids), dtype=bool)
        dup_of = [None] * len(ids)
        for i in order:
            if kept_rows:
                sims = U[kept_rows] @ U[i]
                j = int(np.argmax(sims))
                if sims[j] >= threshold:
                    dup_of[i] = int(ids[kept_rows[j]])
                    continue
            kept[i] = True
            kept_rows.append(i)
        return pd.DataFrame({
            "vec_id": ids,
            "cell": np.full(len(ids), cell, dtype=np.int32),
            "centroid_cos": np.round(ccos, 6),
            "kept": kept,
            "dup_of": pd.array(dup_of, dtype="Int64"),
        })

    out_schema = ("vec_id long, cell int, centroid_cos double, "
                  "kept boolean, dup_of long")
    return staged.groupBy("cell").applyInPandas(greedy, out_schema)
