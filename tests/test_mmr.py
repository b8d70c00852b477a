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
