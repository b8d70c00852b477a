"""Range-filter query syntax (X75, rangequery.ranged_topk): parser
shapes and rejects, filter-context semantics vs a brute-force oracle,
regime agreement (kernel mask vs relational semi-join), NULL doc-values
behavior, and the index-only entry points' loud routing guard."""

import pytest
from pyspark.sql import functions as F

from mahout_spark.index import queryparse as qp
from mahout_spark.index.boolquery import boolean_topk
from mahout_spark.index.build import build_index
from mahout_spark.index.queryparse import (
    QueryParseError,
    parse,
    split_range_filters,
)
from mahout_spark.index.rangequery import (
    numeric_range_fields,
    ranged_matching_docs,
    ranged_topk,
)
from tests.oracle import OracleIndex

RF = frozenset({"n_chars", "quality"})


# ---------------------------------------------------------------- parser

def test_parse_range_shapes():
    n = parse("spark AND n_chars:[200 TO 450]", range_fields=RF)
    assert n == ("and", [("term", "spark"),
                         ("range", "n_chars", 200.0, 450.0, True, True)])
    n = parse("spark n_chars:{200 TO 450}", range_fields=RF)
    assert n[1][1] == ("range", "n_chars", 200.0, 450.0, False, False)
    n = parse("spark n_chars:[300 TO *]", range_fields=RF)
    assert n[1][1] == ("range", "n_chars", 300.0, None, True, True)
    n = parse("spark n_chars:[* TO 2.5}", range_fields=RF)
    assert n[1][1] == ("range", "n_chars", None, 2.5, True, False)


def test_parse_range_rejects():
    with pytest.raises(QueryParseError, match="unknown range field"):
        parse("spark AND n_chars:[1 TO 2]")  # not whitelisted
    with pytest.raises(QueryParseError, match="must be a number"):
        parse("spark n_chars:[a TO 2]", range_fields=RF)
    with pytest.raises(QueryParseError, match="at least one bound"):
        parse("spark n_chars:[* TO *]", range_fields=RF)
    with pytest.raises(QueryParseError, match="exceeds upper"):
        parse("spark n_chars:[5 TO 2]", range_fields=RF)
    with pytest.raises(QueryParseError, match="boost cannot apply"):
        parse("spark n_chars:[1 TO 2] ^2", range_fields=RF)


def test_range_position_rejects():
    # filter context: never inside OR / msm / boost
    with pytest.raises(QueryParseError, match="top-level conjuncts"):
        parse("spark OR n_chars:[1 TO 2]", range_fields=RF)
    with pytest.raises(QueryParseError, match="top-level conjuncts"):
        parse("spark AND (data OR n_chars:[1 TO 2])", range_fields=RF)
    with pytest.raises(QueryParseError, match="top-level conjuncts"):
        parse("(spark n_chars:[1 TO 2])^2", range_fields=RF)
    # nested AND keeps the conjunct property; NOT of a conjunct is fine
    parse("(spark AND n_chars:[1 TO 2]) data", range_fields=RF)
    parse("spark NOT n_chars:[1 TO 2]", range_fields=RF)


def test_split_range_filters():
    node = parse("spark NOT n_chars:[1 TO 2] data n_chars:[5 TO *]",
                 range_fields=RF)
    residual, specs = split_range_filters(node)
    assert residual == ("and", [("term", "spark"), ("term", "data")])
    assert specs == [("n_chars", 1.0, 2.0, True, True, True),
                     ("n_chars", 5.0, None, True, True, False)]
    # single leaf left after stripping collapses the AND
    residual, specs = split_range_filters(
        parse("spark n_chars:[1 TO 2]", range_fields=RF))
    assert residual == ("term", "spark")
    # a range-free tree is untouched
    residual, specs = split_range_filters(parse("spark OR data"))
    assert specs == [] and residual == ("or", [("term", "spark"),
                                               ("term", "data")])


# ---------------------------------------------------------------- engine

@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


@pytest.fixture(scope="module")
def built(spark, docs, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("rangeidx"))
    return build_index(
        spark, docs, out, content_col="text", id_cols=["doc_id"],
        mode="simple", n_buckets=4, docs_per_shard=64, block_size=16,
        positions=True,
    )


@pytest.fixture(scope="module")
def oracle(docs):
    rows = docs.select("doc_id", "text").collect()
    return OracleIndex({r["doc_id"]: r["text"] for r in rows},
                       mode="simple")


@pytest.fixture(scope="module")
def meta(docs):
    return {r["doc_id"]: r["n_chars"]
            for r in docs.select("doc_id", "n_chars").collect()}


def _oracle_ranged(oracle, meta, residual, pred, k=10):
    full = oracle.boolean_search(residual, k=10**9)
    kept = [(d, s) for d, s in full if pred(meta[d])]
    return kept[:k]


RANGE_CASES = [
    ("(spark OR data OR query) AND n_chars:[200 TO 450]",
     "spark OR data OR query", lambda v: 200 <= v <= 450),
    ("(spark OR data OR query) n_chars:{200 TO 450}",
     "spark OR data OR query", lambda v: 200 < v < 450),
    ("(spark OR data OR query) n_chars:[350 TO *]",
     "spark OR data OR query", lambda v: v >= 350),
    ("(spark OR data OR query) NOT n_chars:[200 TO 450]",
     "spark OR data OR query", lambda v: not (200 <= v <= 450)),
    ("(spark OR data OR query) n_chars:[150 TO *] n_chars:[* TO 400]",
     "spark OR data OR query", lambda v: 150 <= v <= 400),
    ('("table scan" OR merge) AND data AND n_chars:[100 TO 500]',
     '("table scan" OR merge) AND data', lambda v: 100 <= v <= 500),
]


@pytest.mark.parametrize("q,residual,pred", RANGE_CASES)
def test_ranged_topk_matches_oracle(spark, built, docs, oracle, meta,
                                    q, residual, pred):
    got = [(r["doc_id"], r["score"])
           for r in ranged_topk(spark, built, docs, q, k=10).collect()]
    want = _oracle_ranged(oracle, meta, residual, pred)
    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert g[1] == pytest.approx(w[1], abs=1e-9)


def test_both_regimes_agree(spark, built, docs):
    q = "(spark OR data OR query) AND n_chars:[150 TO 460]"
    small = ranged_topk(spark, built, docs, q, k=10).collect()
    relational = ranged_topk(spark, built, docs, q, k=10,
                             max_collect=0).collect()
    assert [(r["doc_id"], r["score"]) for r in small] == \
           [(r["doc_id"], r["score"]) for r in relational]
    assert len(small) > 0


def test_range_free_query_delegates(spark, built, docs):
    q = "spark OR data"
    got = ranged_topk(spark, built, docs, q, k=5).collect()
    want = boolean_topk(spark, built, q, k=5).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == \
           [(r["doc_id"], r["score"]) for r in want]


def test_ranged_matching_docs(spark, built, docs, oracle, meta):
    q = "(spark OR data) AND n_chars:[200 TO 450]"
    got = {r["doc_id"] for r in
           ranged_matching_docs(spark, built, docs, q).collect()}
    full = {d for d, _ in oracle.boolean_search("spark OR data", k=10**9)}
    want = {d for d in full if 200 <= meta[d] <= 450}
    assert got == want


def test_null_doc_values(spark, tmp_path):
    rows = [(0, "alpha beta", 10), (1, "alpha beta", None),
            (2, "alpha gamma", 99)]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "n_chars"])
    cat = build_index(
        spark, docs, str(tmp_path / "nullidx"), content_col="text",
        id_cols=["doc_id"], mode="simple", n_buckets=2,
        docs_per_shard=8, block_size=4,
    )
    # NULL never matches a positive range
    got = {r["doc_id"] for r in
           ranged_topk(spark, cat, docs, "alpha n_chars:[5 TO 50]").collect()}
    assert got == {0}
    # ... and always survives a negated one (must_not semantics)
    got = {r["doc_id"] for r in
           ranged_topk(spark, cat, docs,
                       "alpha NOT n_chars:[5 TO 50]").collect()}
    assert got == {1, 2}


def test_pure_range_rejected(spark, built, docs):
    with pytest.raises(QueryParseError, match="pure-range"):
        ranged_topk(spark, built, docs, "n_chars:[1 TO 2]")


def test_index_only_entry_points_route_loudly(spark, built):
    node = ("and", [("term", "spark"),
                    ("range", "n_chars", 1.0, 2.0, True, True)])
    with pytest.raises(QueryParseError, match="rangequery"):
        boolean_topk(spark, built, node)


def test_numeric_range_fields_from_schema(docs):
    fields = numeric_range_fields(docs)
    assert "n_chars" in fields and "doc_id" in fields
    assert "text" not in fields and "lang" not in fields


def test_composes_with_pagination(spark, built, docs):
    q = "(spark OR data OR query) AND n_chars:[100 TO 500]"
    deep = ranged_topk(spark, built, docs, q, k=20).collect()
    page1 = ranged_topk(spark, built, docs, q, k=10).collect()
    page2 = ranged_topk(spark, built, docs, q, k=10,
                        after=page1[-1]).collect()
    assert [(r["doc_id"], r["score"]) for r in page1 + page2] == \
           [(r["doc_id"], r["score"]) for r in deep]
