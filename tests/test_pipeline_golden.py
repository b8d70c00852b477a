"""End-to-end Spark pipeline vs the reference's golden intermediate values
(report_clusters_snippets.txt:13-20) and the pure-Python oracle."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mahout_spark.query import CorpusScorer
from tests.fixtures_tiny import (
    EXPECTED_TFIDF,
    EXPECTED_TFIDF_WEB_SPOT,
    EXPECTED_TOKENS,
    TINY_DOCS,
)
from tests.oracle import OracleIndex


@pytest.fixture(scope="module")
def scorer(tiny_docs_df):
    return CorpusScorer(tiny_docs_df)


def test_term_frequencies_match_golden(scorer):
    rows = scorer.tf.collect()
    got = {}
    for r in rows:
        got.setdefault(r["doc_id"], {})[r["term"]] = r["tf"]
    for doc_id, toks in EXPECTED_TOKENS.items():
        expect = {}
        for t in toks:
            expect[t] = expect.get(t, 0) + 1
        assert got[doc_id] == expect, doc_id
    # doclen carried per row == token count
    lens = {r["doc_id"]: r["doclen"] for r in rows}
    for doc_id, toks in EXPECTED_TOKENS.items():
        assert lens[doc_id] == len(toks)


def test_tfidf_matches_reference_log(scorer):
    rows = scorer.tfidf().collect()
    got = {}
    for r in rows:
        got.setdefault(r["doc_id"], {})[r["term"]] = float(np.float32(r["score"]))
    for doc_id, expect in EXPECTED_TFIDF.items():
        assert got[doc_id] == pytest.approx(expect), doc_id
    web = got["snpt_web.mwk"]
    for term, val in EXPECTED_TFIDF_WEB_SPOT.items():
        if val is None:
            assert term.replace("_absent", "") not in web or term == "wisdom_absent"
        else:
            assert web[term] == pytest.approx(val), term


def test_bm25_matches_oracle(scorer):
    oracle = OracleIndex(TINY_DOCS)
    assert scorer.n_docs == oracle.n_docs
    assert scorer.avgdl == pytest.approx(oracle.avgdl)
    for r in scorer.bm25().collect():
        assert r["score"] == pytest.approx(
            oracle.bm25(r["doc_id"], r["term"]), abs=1e-9
        ), (r["doc_id"], r["term"])


def test_search_rank_identical_to_oracle(scorer):
    oracle = OracleIndex(TINY_DOCS)
    queries = [
        (["framework"], 10, False),
        (["http", "file"], 10, False),
        (["http", "file"], 10, True),
        (["advisor", "platform", "web"], 2, False),
        (["missingterm"], 5, False),
        (["http", "http", "file"], 10, False),  # duplicate query term
    ]
    for terms, k, mode_all in queries:
        got = [
            (r["doc_id"], r["score"])
            for r in scorer.search(terms, k, mode_all).collect()
        ]
        want = oracle.search(terms, k, mode_all)
        assert [g[0] for g in got] == [w[0] for w in want], (terms, mode_all)
        for g, w in zip(got, want):
            assert g[1] == pytest.approx(w[1], abs=1e-9)


def test_topk_terms_per_doc_matches_oracle(scorer):
    oracle = OracleIndex(TINY_DOCS)
    got = {}
    for r in scorer.topk_terms_per_doc(k=5, min_score=1.0).collect():
        got.setdefault(r["doc_id"], []).append((r["term"], r["score"], r["rank"]))
    for doc_id in TINY_DOCS:
        want = oracle.topk_terms(doc_id, 5, min_score=1.0)
        g = sorted(got.get(doc_id, []), key=lambda x: x[2])
        assert [x[0] for x in g] == [w[0] for w in want], doc_id


def test_report_format(scorer):
    from mahout_spark.report import report_lines

    lines = report_lines(
        scorer.topk_terms_per_doc(k=5, min_score=1.0)
    ).collect()
    # format: "<doc>: <3-padded int> <term>" (MahoutTermFinderMwk.java:114-116)
    import re

    pat = re.compile(r"^snpt_.+\.mwk: [ \d]{2}\d \S+$")
    assert lines and all(pat.match(r["line"]) for r in lines), lines[:3]
    # "file" scores 3.78599... -> int(37) left-padded " 37"
    assert any(":  37 file" in r["line"] for r in lines)
