"""MMR diversification (X108, operators/similarity.py): hand-computed
greedy trace, duplicate demotion, λ edge modes, determinism, rejects."""

import numpy as np
import pytest

from mahout_spark.operators.similarity import brute_force_cosine_topk, \
    mmr_rerank


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    df.cache().count()
    return df


def _qvec(emb, qid=3):
    from pyspark.sql import functions as F

    return [float(x) for x in
            emb.filter(F.col("vec_id") == qid).first()["embedding"]]


def _py_mmr(rows, lam, k):
    ids = [r[0] for r in rows]
    rel = np.array([r[1] for r in rows])
    X = np.asarray([r[2] for r in rows], dtype=np.float64)
    X = X / np.linalg.norm(X, axis=1)[:, None]
    n, picked, out = len(rows), [], []
    max_sim = np.full(n, -np.inf)
    for rank in range(k):
        mmr = lam * rel - (0 if not picked else (1 - lam) * max_sim)
        mmr = np.where(np.isin(np.arange(n), picked), -np.inf, mmr)
        best = int(np.argmax(np.round(mmr, 12)))
        picked.append(best)
        out.append((ids[best], rank + 1))
        max_sim = np.maximum(max_sim, X @ X[best])
    return out


def test_mmr_matches_python_greedy(spark, emb):
    q = _qvec(emb)
    fetch = brute_force_cosine_topk(emb, q, k=30).collect()
    full = {r["vec_id"]: r for r in emb.collect()}
    rows = [(r["vec_id"], r["cosine"], full[r["vec_id"]]["embedding"])
            for r in fetch]
    for lam in (0.3, 0.7):
        got = mmr_rerank(emb, q, k=8, fetch=30, lambda_=lam).collect()
        want = _py_mmr(rows, lam, 8)
        assert [(r["vec_id"], r["rank"]) for r in got] == want, lam


def test_mmr_lambda_one_is_pure_relevance(spark, emb):
    q = _qvec(emb)
    got = [r["vec_id"] for r in
           mmr_rerank(emb, q, k=10, fetch=40, lambda_=1.0).collect()]
    want = [r["vec_id"] for r in
            brute_force_cosine_topk(emb, q, k=10).collect()]
    assert got == want


def test_mmr_demotes_duplicates(spark):
    # two identical near-perfect matches + an orthogonal-ish doc: pure
    # relevance ranks the twin second; MMR must push the diverse doc up
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0]),     # exact duplicate of 0
        (2, [0.5, 0.86, 0.0]),    # partially relevant, diverse
    ]
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>")
    got = [r["vec_id"] for r in
           mmr_rerank(df, [1.0, 0.2, 0.0], k=3, fetch=3,
                      lambda_=0.5).collect()]
    assert got == [0, 2, 1]
    # rerun is byte-identical
    again = [r["vec_id"] for r in
             mmr_rerank(df, [1.0, 0.2, 0.0], k=3, fetch=3,
                        lambda_=0.5).collect()]
    assert again == got


def test_mmr_rejects(spark, emb):
    q = _qvec(emb)
    with pytest.raises(ValueError, match="lambda_"):
        mmr_rerank(emb, q, lambda_=1.5)
    with pytest.raises(ValueError, match="fetch"):
        mmr_rerank(emb, q, k=10, fetch=5)


def test_mmr_batch_identical_to_per_query(spark, emb):
    """Round-4 VERDICT ask #10: the one-job batch fetch + shared greedy
    must reproduce per-query mmr_rerank EXACTLY, per query, including
    tie behavior and selection order."""
    from mahout_spark.operators.similarity import mmr_rerank_batch

    queries = {f"q{i}": _qvec(emb, qid=i) for i in (1, 3, 7, 12)}
    got = {}
    for r in mmr_rerank_batch(
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"),
        queries, k=8, fetch=40, lambda_=0.4,
    ).collect():
        got.setdefault(r["query_id"], []).append(
            (r["vec_id"], r["cosine"], r["mmr"], r["rank"]))
    assert set(got) == set(queries)
    for qid, qv in queries.items():
        want = [(r["vec_id"], r["cosine"], r["mmr"], r["rank"])
                for r in mmr_rerank(emb, qv, k=8, fetch=40,
                                    lambda_=0.4).collect()]
        assert got[qid] == want, qid


def test_mmr_batch_empty_and_rejects(spark, emb):
    from mahout_spark.operators.similarity import mmr_rerank_batch

    assert mmr_rerank_batch(emb, {}, k=3).count() == 0
    with pytest.raises(ValueError, match="fetch"):
        mmr_rerank_batch(emb, {"q": _qvec(emb)}, k=10, fetch=5)
    with pytest.raises(ValueError, match="lambda"):
        mmr_rerank_batch(emb, {"q": _qvec(emb)}, lambda_=1.5)


# ---------------------------------------------------------------------------
# SemDeDup (X140)
# ---------------------------------------------------------------------------

def _sem_oracle(rows, C, threshold):
    """Python replay of the per-cell greedy: assign to argmax-dot cell,
    order by (centroid cos, id), keep unless >= threshold similar to a
    kept vector in the same cell."""
    import numpy as np

    out = {}
    X = {i: np.asarray(v, dtype=np.float64) for i, v in rows}
    cells = {}
    for i, v in X.items():
        n = np.linalg.norm(v)
        if n == 0:
            continue
        u = v / n
        c = int(np.argmax(C @ u))
        cells.setdefault(c, []).append((float(u @ C[c]), i, u))
    for c, members in cells.items():
        kept = []
        for ccos, i, u in sorted(members, key=lambda e: (e[0], e[1])):
            # the engine reports the MOST similar kept vector as dup_of
            best, bs = None, -2.0
            for _, ki, ku in kept:
                s = float(ku @ u)
                if s > bs:
                    best, bs = ki, s
            if bs >= threshold:
                out[i] = (c, False, best)
            else:
                kept.append((ccos, i, u))
                out[i] = (c, True, None)
    return out


def test_semantic_dedup_matches_python_oracle(spark):
    import numpy as np

    from mahout_spark.operators.similarity import (
        ivf_train_centroids, semantic_dedup)

    rng = np.random.RandomState(3)
    base = rng.randn(6, 16)
    rows = []
    vid = 0
    for b in base:
        for _ in range(4):  # 4 near-copies of each of 6 anchors
            rows.append((vid, (b + 0.01 * rng.randn(16)).tolist()))
            vid += 1
    rows.append((vid, [0.0] * 16))  # zero vector: excluded
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    C = ivf_train_centroids(emb, n_cells=4, sample_n=4096, seed=7)
    got = {r["vec_id"]: (r["cell"], r["kept"], r["dup_of"])
           for r in semantic_dedup(emb, threshold=0.95, n_cells=4).collect()}
    want = _sem_oracle(rows[:-1], C, 0.95)
    assert got == want
    # near-copies collapse: far fewer kept than input
    n_kept = sum(1 for _, k, _ in got.values() if k)
    assert n_kept < 24 and n_kept >= 6 - 2  # anchors survive, copies drop
    # every dup_of points at a KEPT row in the SAME cell
    for i, (c, k, d) in got.items():
        if not k:
            assert got[d][0] == c and got[d][1]


def test_semantic_dedup_threshold_one_keeps_all_nonzero(spark):
    import numpy as np

    from mahout_spark.operators.similarity import semantic_dedup

    rng = np.random.RandomState(5)
    emb = spark.createDataFrame(
        [(i, rng.randn(8).tolist()) for i in range(20)],
        "vec_id long, embedding array<double>")
    out = semantic_dedup(emb, threshold=1.0, n_cells=2).collect()
    assert all(r["kept"] for r in out) and len(out) == 20
    import pytest as pt
    with pt.raises(ValueError, match="threshold"):
        semantic_dedup(emb, threshold=0.0)
