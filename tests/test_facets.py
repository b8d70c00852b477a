"""Match-set retrieval and facet aggregation (boolquery.matching_docs /
facet_counts): full-match-set parity vs the brute-force boolean oracle,
facet counts vs a driver-side pandas groupby, delete awareness, and the
facet plan shape (semi-join + partial-aggregated count, no corpus-wide
extra shuffles)."""

import pytest
from pyspark.sql import functions as F

from mahout_spark.index.boolquery import facet_counts, matching_docs
from mahout_spark.index.build import build_index
from mahout_spark.index.delete import delete_docs
from tests.oracle import OracleIndex

FACET_QUERIES = [
    "table AND scan",
    "table OR scan OR merge",
    '("table scan" OR merge) AND data NOT stream',
    "mer* AND data",
    "zzznosuchterm AND table",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


@pytest.fixture(scope="module")
def built(spark, docs, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("facetidx"))
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


def _oracle_match_set(oracle, q):
    # boolean_search with unbounded k yields every matching doc (pure-
    # negative trees are rejected at parse, so every match scores > 0
    # on at least one positive term — except phrase-only zero-idf
    # corner cases that can't occur with these corpora).
    return {d for d, _ in oracle.boolean_search(q, k=10**9)}


@pytest.mark.parametrize("q", FACET_QUERIES)
def test_matching_docs_equals_oracle_match_set(spark, built, oracle, q):
    got = {r["doc_id"] for r in matching_docs(spark, built, q).collect()}
    assert got == _oracle_match_set(oracle, q)


@pytest.mark.parametrize("q", FACET_QUERIES[:3])
def test_facet_counts_match_pandas_groupby(spark, built, docs, oracle, q):
    got = {
        (r["lang"], r["source"]): r["n_docs"]
        for r in facet_counts(spark, built, docs, q,
                              ["lang", "source"]).collect()
    }
    match = _oracle_match_set(oracle, q)
    want = {}
    for r in docs.select("doc_id", "lang", "source").collect():
        if r["doc_id"] in match:
            key = (r["lang"], r["source"])
            want[key] = want.get(key, 0) + 1
    assert got == want


def test_matching_docs_stays_distributed(spark, built):
    # The match set is a real DataFrame: composable into further plans
    # (semi-join) without a collect in the operator itself.
    m = matching_docs(spark, built, "table OR merge")
    assert m.schema.simpleString() == "struct<doc_id:bigint>"
    assert m.filter(F.col("doc_id") % 2 == 0).count() > 0


def test_facets_respect_deletes(spark, docs, tmp_path):
    out = str(tmp_path / "delidx")
    cat = build_index(
        spark, docs, out, content_col="text", id_cols=["doc_id"],
        mode="simple", n_buckets=4, docs_per_shard=64, block_size=16,
    )
    q = "table OR scan"
    before = {r["doc_id"] for r in matching_docs(spark, cat, q).collect()}
    victims = sorted(before)[: len(before) // 2]
    delete_docs(spark, cat, victims)

    after = {r["doc_id"] for r in matching_docs(spark, cat, q).collect()}
    assert after == before - set(victims)

    counts = facet_counts(spark, cat, docs, q, ["lang"]).collect()
    assert sum(r["n_docs"] for r in counts) == len(after)


def test_empty_query_yields_empty_facets(spark, built, docs):
    out = facet_counts(spark, built, docs, "zzznosuchterm", ["lang"])
    assert out.count() == 0
