"""Passage retrieval with parent rollup, whole-query spell correction,
and attribute-filtered ANN (X81-X83): pure-python oracle parity,
tie/NULL semantics, and the filtered-ANN adaptive over-probe + exact
full-probe regime."""

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from mahout_spark.index.boolquery import did_you_mean
from mahout_spark.index.build import build_index
from mahout_spark.index.queryparse import QueryParseError
from mahout_spark.operators.passage import passage_topk
from mahout_spark.operators.similarity import (
    add_ivf_cells,
    brute_force_cosine_topk,
    ivf_ann_topk_filtered,
    ivf_train_centroids,
)
from tests.oracle import OracleIndex, simple_tokenize


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


# ------------------------------------------------------------ passage

def _py_passage(texts: dict, terms, k, chunk_tokens, overlap,
                k1=1.2, b=0.75):
    """Independent pure-python MaxP oracle: same chunk arithmetic as
    chunk_documents, BM25 over the chunk corpus."""
    stride = chunk_tokens - overlap
    chunks = {}  # (doc, cid) -> Counter / len
    for d, text in texts.items():
        ts = simple_tokenize(text)
        n = len(ts)
        if n <= 0:
            continue
        n_chunks = (max(n - chunk_tokens, 0) // stride) + 1
        if n > chunk_tokens and (n - chunk_tokens) % stride > 0:
            n_chunks += 1
        for i in range(n_chunks):
            w = ts[i * stride: i * stride + chunk_tokens]
            chunks[(d, i)] = w
    N = len(chunks)
    avgdl = sum(len(w) for w in chunks.values()) / N
    df = Counter()
    for w in chunks.values():
        for t in set(w) & set(terms):
            df[t] += 1
    best = {}
    for (d, cid), w in chunks.items():
        cnt = Counter(w)
        s = 0.0
        for t in terms:
            tf = cnt.get(t, 0)
            if not tf:
                continue
            idf = math.log(1.0 + (N - df[t] + 0.5) / (df[t] + 0.5))
            sat = tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(w) / avgdl))
            s += idf * sat
        if s <= 0:
            continue
        cur = best.get(d)
        if cur is None or s > cur[1] or (s == cur[1] and cid < cur[0]):
            best[d] = (cid, s)
    ranked = sorted(((d, cid, s) for d, (cid, s) in best.items()),
                    key=lambda x: (-x[2], x[0]))
    return ranked[:k]


def test_passage_topk_matches_python_oracle(spark, docs):
    texts = {r["doc_id"]: r["text"]
             for r in docs.select("doc_id", "text").collect()}
    terms = ["spark", "data", "query"]
    got = passage_topk(docs, terms, k=10, chunk_tokens=16,
                       overlap=4).collect()
    want = _py_passage(texts, terms, 10, 16, 4)
    assert [(r["doc_id"], r["chunk_id"]) for r in got] == \
           [(d, c) for d, c, _ in want]
    for g, w in zip(got, want):
        assert g["score"] == pytest.approx(w[2], rel=1e-9)


def test_passage_string_query_and_tie_chunk(spark):
    block = " ".join(["alpha", "beta", "gamma", "delta"] * 4)  # 16 toks
    rows = [(0, block + " " + block),  # two IDENTICAL chunks -> tie
            (1, "alpha " + " ".join(["filler"] * 30))]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    got = passage_topk(d, "alpha beta", k=5, chunk_tokens=16,
                       overlap=0).collect()
    assert got[0]["doc_id"] == 0
    assert got[0]["chunk_id"] == 0  # tie -> lowest chunk id
    assert {r["doc_id"] for r in got} == {0, 1}
    # string and list query agree
    got2 = passage_topk(d, ["alpha", "beta"], k=5, chunk_tokens=16,
                        overlap=0).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in got2]


def test_passage_rejects_empty_query(spark, docs):
    with pytest.raises(ValueError, match="at least one query term"):
        passage_topk(docs, "  ", k=5)


def test_passage_prefers_focused_doc_over_long_rambler(spark):
    # MaxP point: a focused passage beats the same terms diluted across
    # a long doc with no dense window.
    focused = "spark query spark query " + " ".join(["pad"] * 12)
    diluted = " ".join(
        (["spark"] + ["pad"] * 15 + ["query"] + ["pad"] * 15) * 2
    )
    d = spark.createDataFrame(
        [(0, diluted), (1, focused)], ["doc_id", "text"]
    )
    got = passage_topk(d, "spark query", k=2, chunk_tokens=16,
                       overlap=0).collect()
    assert got[0]["doc_id"] == 1


# ------------------------------------------------------- did_you_mean

@pytest.fixture(scope="module")
def built(spark, docs, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("dymidx"))
    return build_index(
        spark, docs, out, content_col="text", id_cols=["doc_id"],
        mode="simple", n_buckets=4, docs_per_shard=64, block_size=16,
    )


@pytest.fixture(scope="module")
def oracle(docs):
    rows = docs.select("doc_id", "text").collect()
    return OracleIndex({r["doc_id"]: r["text"] for r in rows},
                       mode="simple")


def _py_best_suggestion(oracle, word, max_edits=2):
    from tests.oracle import _edit_distance

    cands = []
    for t, dfv in oracle.df.items():
        dist = _edit_distance(word, t)
        if 0 < dist <= max_edits:
            cands.append((dist, -dfv, t))
    if not cands:
        return None
    d, negdf, t = min(cands)
    return (t, d, -negdf)


def test_did_you_mean_mixed_query(spark, built, oracle):
    rows = did_you_mean(spark, built, "sparkk dtaa query zzzzqqqq").collect()
    assert [r["pos"] for r in rows] == [0, 1, 2, 3]
    by_tok = {r["token"]: r for r in rows}
    # present token keeps itself with its own df
    assert by_tok["query"]["suggestion"] == "query"
    assert by_tok["query"]["distance"] == 0
    assert by_tok["query"]["df"] == oracle.df["query"]
    # misspellings get the (distance asc, df desc, term asc) best
    for tok in ("sparkk", "dtaa"):
        want = _py_best_suggestion(oracle, tok)
        r = by_tok[tok]
        assert (r["suggestion"], r["distance"], r["df"]) == want
    # out-of-range token gets NULL suggestion
    r = by_tok["zzzzqqqq"]
    assert r["suggestion"] is None and r["df"] == 0


def test_did_you_mean_splits_compound_tokens(spark, built):
    rows = did_you_mean(spark, built, "data-query").collect()
    assert [(r["pos"], r["token"]) for r in rows] == [(0, "data"),
                                                      (1, "query")]


def test_did_you_mean_rejects_empty(spark, built):
    with pytest.raises(QueryParseError, match="normalizes to nothing"):
        did_you_mean(spark, built, "...")


# ------------------------------------------------------ filtered ANN

@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


@pytest.fixture(scope="module")
def qvec(emb):
    return list(emb.filter(F.col("vec_id") == 0)
                .select("embedding").collect()[0][0])


def test_filtered_ann_full_probe_is_filtered_brute_force(spark, emb, qvec):
    C = ivf_train_centroids(emb, n_cells=8, sample_n=256)
    cells = add_ivf_cells(emb, C)
    flt = F.col("label") == 2
    got = ivf_ann_topk_filtered(cells, qvec, C, flt, k=10,
                                n_probes=8).collect()
    want = brute_force_cosine_topk(emb.filter(flt), qvec, k=10).collect()
    assert [(r["vec_id"], r["cosine"]) for r in got] == \
           [(r["vec_id"], r["cosine"]) for r in want]


def test_filtered_ann_overprobes_selective_filter(spark, emb, qvec):
    C = ivf_train_centroids(emb, n_cells=8, sample_n=256)
    cells = add_ivf_cells(emb, C)
    # selective predicate: few survivors scattered across cells — one
    # probe cell cannot hold k of them, so the probe set must escalate
    flt = (F.col("label") == 2) & (F.col("vec_id") % 3 == 0)
    n_filtered = cells.filter(flt).count()
    k = min(10, n_filtered)
    got = ivf_ann_topk_filtered(cells, qvec, C, flt, k=k,
                                n_probes=1).collect()
    assert len(got) == k
    allowed = {r["vec_id"] for r in cells.filter(flt).collect()}
    assert {r["vec_id"] for r in got} <= allowed


def test_filtered_ann_accepts_sql_string_pred(spark, emb, qvec):
    C = ivf_train_centroids(emb, n_cells=8, sample_n=256)
    cells = add_ivf_cells(emb, C)
    a = ivf_ann_topk_filtered(cells, qvec, C, "label = 2", k=5,
                              n_probes=8).collect()
    b = ivf_ann_topk_filtered(cells, qvec, C, F.col("label") == 2, k=5,
                              n_probes=8).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
