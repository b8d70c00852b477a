"""More-like-this (index/mlt.py): term selection units + retrieval
parity vs the brute-force OracleIndex replica, doc-keyed front-end,
and the Searcher warm path."""

import pytest
from pyspark.sql import functions as F

from mahout_spark.index import mlt
from mahout_spark.index.build import build_index
from tests.oracle import OracleIndex

# -- term selection (pure) ----------------------------------------------------


def test_select_query_terms_ranking_and_cutoffs():
    tf = {"rare": 2, "common": 5, "absent": 3, "thin": 4}
    df = {"rare": 3, "common": 90, "thin": 1}  # absent: not in lexicon
    # n_docs=100: rare scores sqrt(2)*(1+ln(25)), common sqrt(5)*(1+ln(100/91))
    sel = mlt.select_query_terms(tf, df, 100, max_query_terms=25,
                                 min_doc_freq=2)
    assert sel == ["rare", "common"]  # thin: df<min_doc_freq; absent: no df
    assert mlt.select_query_terms(tf, df, 100, max_query_terms=1,
                                  min_doc_freq=2) == ["rare"]
    # equal (tf, df) -> equal score -> term asc
    sel = mlt.select_query_terms({"b": 2, "a": 2}, {"a": 5, "b": 5}, 100,
                                 max_query_terms=25, min_doc_freq=1)
    assert sel == ["a", "b"]


def test_simple_tokens_matches_sql_tokenizer():
    assert mlt.simple_tokens("Table-SCAN, merge!") == [
        "table", "scan", "merge"
    ]
    assert mlt.simple_tokens(None) == []
    assert mlt.simple_tokens("***") == []


# -- retrieval parity ---------------------------------------------------------


@pytest.fixture(scope="module")
def corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return docs.select("doc_id", F.col("text").alias("content"))


@pytest.fixture(scope="module")
def built(spark, corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("mltidx"))
    return build_index(
        spark, corpus, out, content_col="content", id_cols=["doc_id"],
        mode="simple", n_buckets=4, docs_per_shard=64, block_size=16,
    )


@pytest.fixture(scope="module")
def oracle(corpus):
    rows = corpus.collect()
    return OracleIndex(
        {r["doc_id"]: r["content"] for r in rows}, mode="simple"
    )


def _rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


LIKE_TEXTS = [
    "table scan merge data window",
    "group group group column key window join",   # repeated terms weight tf
    "stream key vector",
]


@pytest.mark.parametrize("text", LIKE_TEXTS)
def test_more_like_this_matches_oracle(spark, built, oracle, text):
    got = _rows(mlt.more_like_this(spark, built, text, k=10,
                                   max_query_terms=5))
    want = oracle.more_like(text, k=10, max_query_terms=5)
    assert [g[0] for g in got] == [w[0] for w in want], text
    for g, w in zip(got, want):
        assert g[1] == pytest.approx(w[1], abs=1e-9)


def test_more_like_this_equals_selected_or_query(spark, built, oracle):
    """MLT is exactly the OR query of its selected terms — stage 2 reuses
    the standard kernel unchanged."""
    from mahout_spark.index.wand import topk

    text = LIKE_TEXTS[0]
    tfc = {}
    for t in mlt.simple_tokens(text):
        tfc[t] = tfc.get(t, 0) + 1
    sel = mlt.select_query_terms(
        tfc, dict(oracle.df), oracle.n_docs, max_query_terms=5,
        min_doc_freq=2,
    )
    got = _rows(mlt.more_like_this(spark, built, text, k=10,
                                   max_query_terms=5))
    assert got == _rows(topk(spark, built, sel, k=10))


def test_more_like_doc_excludes_source(spark, built, corpus, oracle):
    doc_id = 42
    got = _rows(mlt.more_like_doc(spark, built, corpus, doc_id,
                                  content_col="content", k=10,
                                  max_query_terms=5))
    text = corpus.filter(F.col("doc_id") == doc_id).collect()[0]["content"]
    want = oracle.more_like(text, k=10, max_query_terms=5,
                            exclude_doc_id=doc_id)
    assert doc_id not in [g[0] for g in got]
    assert len(got) == 10  # k+1 fetch keeps the result at k after the cut
    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert g[1] == pytest.approx(w[1], abs=1e-9)
    with pytest.raises(KeyError):
        mlt.more_like_doc(spark, built, corpus, 10**9,
                          content_col="content")


def test_more_like_this_empty_and_unknown_text(spark, built):
    assert _rows(mlt.more_like_this(spark, built, "", k=5)) == []
    assert _rows(mlt.more_like_this(spark, built, "???", k=5)) == []
    assert _rows(
        mlt.more_like_this(spark, built, "zzznothere qqqneither", k=5)
    ) == []


def test_searcher_more_like_matches_direct(spark, built):
    from mahout_spark.index.searcher import Searcher

    s = Searcher(spark, built)
    text = LIKE_TEXTS[0]
    direct = _rows(mlt.more_like_this(spark, built, text, k=10,
                                      max_query_terms=5))
    assert _rows(s.more_like(text, k=10, max_query_terms=5)) == direct
    # warm repeat: candidate lookups come from the per-term cache
    assert _rows(s.more_like(text, k=10, max_query_terms=5)) == direct
