"""Tokenizer + Porter stemmer vs the reference's golden token dump
(/root/reference/report_clusters_snippets.txt:9-12). Pure Python — no Spark."""

import math

import pytest

from mahout_spark.porter import stem
from mahout_spark.tokenize import count_terms, tokenize_code, tokenize_text
from tests.fixtures_tiny import EXPECTED_TOKENS, TINY_DOCS


@pytest.mark.parametrize("doc_id", list(TINY_DOCS))
def test_golden_token_streams(doc_id):
    assert tokenize_text(TINY_DOCS[doc_id]) == EXPECTED_TOKENS[doc_id]


def test_porter_vectors():
    # every stemming pair observable in the golden log
    vectors = {
        "false": "fals", "wisdom": "wisdom", "hollow": "hollow",
        "expertise": "expertis", "https": "http", "search": "search",
        "applications": "applic", "application": "applic", "notes": "note",
        "archive": "archiv", "contained": "contain", "directory": "directori",
        "served": "serv", "directly": "directli", "entry": "entri",
        "listing": "list", "extensions": "extens", "needed": "need",
        "require": "requir", "apply": "appli", "applies": "appli",
        "programming": "program", "leveraged": "leverag", "forums": "forum",
        "static": "static", "advisor": "advisor", "citizen": "citizen",
        "www.yelp.com": "www.yelp.com", "95128": "95128", "3.0": "3.0",
        "find_desc": "find_desc", "manifest.mf": "manifest.mf",
    }
    for word, expect in vectors.items():
        assert stem(word) == expect, f"{word}: {stem(word)} != {expect}"


def test_possessive_and_stopwords():
    # "else's" -> possessive strip -> "else" -> stopword -> dropped
    assert tokenize_text("someone else's platform") == ["platform"]
    # stop check happens BEFORE stemming: "containing" is a stopword even
    # though its stem "contain" is not
    assert tokenize_text("containing contained") == ["contain"]


def test_numeric_filter_variant():
    # cluster-variant numeric filter [0-9.,]+ (RefactoredCluster.java:688-704)
    assert tokenize_text("version 3.0 build 95128 x1", filter_numeric=True) == [
        "version", "build", "x1"
    ]


def test_code_tokenizer():
    toks = tokenize_code("getUserName = snake_case_id + HTTPServer2")
    assert "getusername" in toks and "get" in toks and "user" in toks
    assert "name" in toks and "snake_case_id" in toks and "snake" in toks
    assert "httpserver2" in toks and "http" in toks and "server" in toks
    assert "2" not in toks  # numeric sub-token filtered


def test_count_terms():
    tf = count_terms(EXPECTED_TOKENS["snpt_yelp.mwk"])
    assert tf["http"] == 3 and tf["www.yelp.com"] == 3 and tf["citizen"] == 1


def test_tfidf_formula_reproduces_log_constants():
    # N=4: tf=1,df=1 -> 1 + ln 2; tf=3,df=2 -> sqrt(3)*(1+ln(4/3)).
    # The reference logs float32 values (Mahout/Lucene similarity math is
    # float32) printed as doubles, so compare after a float32 round-trip.
    import numpy as np

    f = lambda tf, df, n=4: math.sqrt(tf) * (1.0 + math.log(n / (df + 1.0)))
    f32 = lambda x: float(np.float32(x))
    assert f32(f(1, 1)) == 1.6931471824645996
    assert f32(f(3, 1)) == 2.932616949081421
    assert f32(f(3, 2)) == 2.2303307056427
    assert f32(f(2, 1)) == 2.3944716453552246
    assert f32(f(5, 1)) == 3.78599214553833
    assert f32(f(1, 2)) == 1.287682056427002
