"""Boolean query language: parser unit tests + ranked-boolean execution
vs the brute-force oracle (match set AND scores), incl. phrase/slop
leaves, NOT subtraction, prefix expansion, and both index layouts."""

import pytest
from pyspark.sql import functions as F

from mahout_spark.index import queryparse as qp
from mahout_spark.index.boolquery import boolean_topk
from mahout_spark.index.build import build_index
from tests.oracle import OracleIndex

# -- parser -----------------------------------------------------------------


def test_parse_precedence_not_and_or():
    assert qp.parse("a b OR c") == (
        "or", [("and", [("term", "a"), ("term", "b")]), ("term", "c")]
    )
    assert qp.parse("a AND NOT b OR c") == (
        "or", [("and", [("term", "a"), ("not", ("term", "b"))]), ("term", "c")]
    )
    assert qp.parse("(a OR b) c") == (
        "and", [("or", [("term", "a"), ("term", "b")]), ("term", "c")]
    )


def test_parse_phrase_and_slop():
    assert qp.parse('"table scan"') == ("phrase", ("table", "scan"), None)
    assert qp.parse('"table scan"~3') == ("phrase", ("table", "scan"), 3)
    assert qp.parse('"solo"') == ("term", "solo")  # 1-word quote collapses
    with pytest.raises(qp.QueryParseError):
        qp.parse('"a b"~0')


def test_parse_prefix_and_normalization():
    assert qp.parse("mer*") == ("prefix", "mer")
    assert qp.parse("Foo-Bar") == (
        "and", [("term", "foo"), ("term", "bar")]
    )  # normalizer splits; lowercase keywords stay terms
    assert qp.parse("a or b") == (
        "and", [("term", "a"), ("term", "or"), ("term", "b")]
    )


@pytest.mark.parametrize("bad", [
    "", "NOT a", "NOT a OR b", "a OR NOT b", "(a", "a)", "AND", "a AND",
    "*", "NOT NOT a",
])
def test_parse_rejects(bad):
    with pytest.raises(qp.QueryParseError):
        qp.parse(bad)


def test_parse_not_needs_positive_sibling():
    with pytest.raises(qp.QueryParseError):
        qp.parse("NOT a NOT b")
    assert qp.parse("a NOT b") == (
        "and", [("term", "a"), ("not", ("term", "b"))]
    )


def test_parse_field_syntax():
    # whitelisted field -> synthetic tag term, raw-lowercased value
    assert qp.parse("lang:Java") == ("term", "lang:java")
    assert qp.parse("lang:C++") == ("term", "lang:c++")
    assert qp.parse("lang:java user-service") == (
        "and", [("term", "lang:java"),
                ("and", [("term", "user"), ("term", "service")])]
    )
    # field prefix expands in the tag namespace
    assert qp.parse("lang:ja*") == ("prefix", "lang:ja")
    # mid-pattern * on a field value is a wildcard in the tag namespace
    assert qp.parse("lang:j*a") == ("wildcard", "lang:j*a")
    # non-whitelisted x:y keeps pre-field behavior (colon splits)
    assert qp.parse("http://example.com") == (
        "and", [("term", "http"), ("term", "example"), ("term", "com")]
    )
    # trailing colon is not field syntax (regex needs a value)
    assert qp.parse("lang:") == ("term", "lang")
    # whitelist is configurable; empty set disables field syntax
    assert qp.parse("lang:java", fields=frozenset()) == (
        "and", [("term", "lang"), ("term", "java")]
    )
    assert qp.parse("repo:a-b", fields=frozenset({"repo"})) == (
        "term", "repo:a-b"
    )


def test_parse_fuzzy():
    assert qp.parse("slot~") == ("fuzzy", "slot", 2)   # Lucene default 2
    assert qp.parse("slot~1") == ("fuzzy", "slot", 1)
    assert qp.parse("Slot~2") == ("fuzzy", "slot", 2)  # stem normalized
    assert qp.parse("slot~0") == ("term", "slot")      # ~0 is the plain term
    assert qp.parse("slot~1 AND data") == (
        "and", [("fuzzy", "slot", 1), ("term", "data")]
    )
    for bad in ("slot~3", "slo*t~1", "slot*~1", "Foo-Bar~1", "lang:es~1"):
        with pytest.raises(qp.QueryParseError):
            qp.parse(bad)
    # mid-word tilde without a numeric tail is not fuzzy syntax: the
    # normalizer splits it like any other punctuation
    assert qp.parse("a~b") == ("and", [("term", "a"), ("term", "b")])


def test_fuzzy_tree_helpers():
    n = qp.parse("slot~1 OR (grup~2 AND data)")
    assert qp.fuzzies(n) == [("grup", 2), ("slot", 1)]
    assert qp.all_terms(n) == ["data"]  # fuzzy leaves expand later
    e = qp.expand_fuzzies(n, {("slot", 1): ["slow"],
                              ("grup", 2): ["group", "dup"]})
    assert e == (
        "or", [("term", "slow"),
               ("and", [("or", [("term", "group"), ("term", "dup")]),
                        ("term", "data")])]
    )
    assert qp.fuzzies(e) == []
    # unmatched fuzzy expands to the empty OR (matches nothing)
    assert qp.expand_fuzzies(("fuzzy", "zz", 1), {}) == ("or", [])


def test_parse_boost():
    assert qp.parse("table^3") == ("boost", ("term", "table"), 3.0)
    assert qp.parse("table^0.5") == ("boost", ("term", "table"), 0.5)
    assert qp.parse("table^1") == ("term", "table")  # identity boost
    assert qp.parse('"table scan"^2') == (
        "boost", ("phrase", ("table", "scan"), None), 2.0
    )
    assert qp.parse('"table scan"~3^2') == (
        "boost", ("phrase", ("table", "scan"), 3), 2.0
    )
    assert qp.parse("(table OR scan)^2") == (
        "boost", ("or", [("term", "table"), ("term", "scan")]), 2.0
    )
    assert qp.parse("mer*^2") == ("boost", ("prefix", "mer"), 2.0)
    assert qp.parse("slot~1^2") == ("boost", ("fuzzy", "slot", 1), 2.0)
    assert qp.parse("lang:es^2") == ("boost", ("term", "lang:es"), 2.0)
    assert qp.parse("a NOT b^2") == (
        "and", [("term", "a"), ("not", ("boost", ("term", "b"), 2.0))]
    )
    with pytest.raises(qp.QueryParseError):
        qp.parse("table^0")
    with pytest.raises(qp.QueryParseError):  # boost directly wrapping NOT
        qp.validate(("and", [("term", "a"),
                             ("boost", ("not", ("term", "b")), 2.0)]))
    # ^ with a non-numeric tail is not boost syntax: normalizer splits
    assert qp.parse("a^b") == ("and", [("term", "a"), ("term", "b")])


def test_term_weights():
    n = qp.parse("table^3 OR (scan AND data)^0.5 OR merge NOT big^9")
    assert qp.term_weights(n) == {"table": 3.0, "scan": 0.5, "data": 0.5}
    # nesting multiplies; multiple positive occurrences take the max
    n = qp.parse("(table^2 OR scan)^3 AND table")
    assert qp.term_weights(n) == {"table": 6.0, "scan": 3.0}
    n = qp.parse("table^0.5 OR table")
    assert qp.term_weights(n) == {}  # max(0.5, 1.0) = 1.0 -> unboosted
    assert qp.all_terms(qp.parse("(a AND b^2)^2")) == ["a", "b"]
    assert qp.positive_terms(qp.parse("a NOT b^2")) == ["a"]


def test_tree_helpers():
    n = qp.parse('("table scan" OR mer*) AND data NOT stream')
    assert qp.all_terms(n) == ["data", "scan", "stream", "table"]
    assert qp.positive_terms(n) == ["data", "scan", "table"]
    assert qp.prefixes(n) == ["mer"]
    assert qp.has_phrase(n)
    e = qp.expand_prefixes(n, {"mer": ["merge", "merged"]})
    assert qp.all_terms(e) == ["data", "merge", "merged", "scan", "stream", "table"]
    assert qp.prefixes(e) == []


# -- execution --------------------------------------------------------------


@pytest.fixture(scope="module")
def corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return docs.select("doc_id", F.col("text").alias("content"))


@pytest.fixture(scope="module")
def pos_built(spark, corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("boolidx"))
    return build_index(
        spark, corpus, out, content_col="content", id_cols=["doc_id"],
        mode="simple", n_buckets=4, docs_per_shard=64, block_size=16,
        positions=True,
    )


@pytest.fixture(scope="module")
def oracle(corpus):
    rows = corpus.collect()
    return OracleIndex(
        {r["doc_id"]: r["content"] for r in rows}, mode="simple"
    )


def _rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


BOOL_QUERIES = [
    "table AND scan",
    "table OR scan OR merge",
    "table scan NOT merge",
    '("table scan" OR merge) AND data NOT stream',
    '"data merge"~8 OR "table scan"',
    "data AND (merge OR window) NOT (batch OR row)",
    "zzznosuchterm OR table",
    "zzznosuchterm AND table",
    "table NOT zzznosuchterm",
]


@pytest.mark.parametrize("q", BOOL_QUERIES)
def test_boolean_matches_oracle(spark, pos_built, oracle, q):
    got = _rows(boolean_topk(spark, pos_built, q, k=10))
    want = oracle.boolean_search(q, k=10)
    assert [g[0] for g in got] == [w[0] for w in want], q
    for g, w in zip(got, want):
        assert g[1] == pytest.approx(w[1], abs=1e-9)


def test_boolean_prefix_expansion_matches_oracle(spark, pos_built, oracle):
    q = "mer* AND data"
    got = _rows(boolean_topk(spark, pos_built, q, k=10))
    want = oracle.boolean_search(q, k=10)
    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert g[1] == pytest.approx(w[1], abs=1e-9)


@pytest.mark.parametrize("q", [
    "slot~2 AND data",        # slow(d=1) + sort(d=2): distance ordering
    "grup~1 OR table",        # single expansion under the cap
    "par~2 NOT stream",       # 3-term expansion incl. shorter/longer stems
    "slot~1 AND scan",        # d=1 band only (sort excluded)
])
def test_boolean_fuzzy_matches_oracle(spark, pos_built, oracle, q):
    got = _rows(boolean_topk(spark, pos_built, q, k=10))
    want = oracle.boolean_search(q, k=10)
    assert [g[0] for g in got] == [w[0] for w in want], q
    for g, w in zip(got, want):
        assert g[1] == pytest.approx(w[1], abs=1e-9)


@pytest.mark.parametrize("q", [
    "table^3 OR scan",
    "table^0.5 AND scan",
    '("table scan" OR merge)^2 AND data',
    "mer*^2 OR table",
    "slot~2^3 AND data",
    "(table^2 OR scan)^3 AND merge NOT stream^4",
])
def test_boolean_boost_matches_oracle(spark, pos_built, oracle, q):
    got = _rows(boolean_topk(spark, pos_built, q, k=10))
    want = oracle.boolean_search(q, k=10)
    assert [g[0] for g in got] == [w[0] for w in want], q
    for g, w in zip(got, want):
        assert g[1] == pytest.approx(w[1], abs=1e-9)


def test_parse_wildcard():
    assert qp.parse("*scan*") == ("wildcard", "*scan*")
    assert qp.parse("te?le") == ("wildcard", "te?le")
    assert qp.parse("Me*GE") == ("wildcard", "me*ge")
    assert qp.parse("me*ge^2") == ("boost", ("wildcard", "me*ge"), 2.0)
    assert qp.parse("lang:j?va") == ("wildcard", "lang:j?va")
    assert qp.parse("lang:*a*") == ("wildcard", "lang:*a*")
    # trailing-only * stays the cheaper prefix leaf
    assert qp.parse("mer*") == ("prefix", "mer")
    for bad in ["*", "?", "**", "?*"]:
        with pytest.raises(qp.QueryParseError):
            qp.parse(bad)
    assert qp.wildcard_regex("me*ge") == "^me.*ge$"
    assert qp.wildcard_regex("t?") == "^t.$"
    assert qp.wildcard_regex("a.b*") == "^a\\.b.*$"
    n = qp.parse("*scan* AND data")
    assert qp.wildcards(n) == ["*scan*"]
    e = qp.expand_wildcards(n, {"*scan*": ["scan", "scanner"]})
    assert e[1][0] == ("or", [("term", "scan"), ("term", "scanner")])
    assert qp.expand_wildcards(n, {})[1][0] == ("or", [])


@pytest.mark.parametrize("q", [
    "*can* OR data",
    "t?ble AND data",
    "*ble OR merge",
    "me*e",
    "data AND NOT *can*",
])
def test_boolean_wildcard_matches_oracle(spark, pos_built, oracle, q):
    got = _rows(boolean_topk(spark, pos_built, q, k=10))
    want = oracle.boolean_search(q, k=10)
    assert [g[0] for g in got] == [w[0] for w in want], q
    for g, w in zip(got, want):
        assert g[1] == pytest.approx(w[1], abs=1e-9)


def test_wildcard_equals_explicit_or(spark, pos_built, oracle):
    """A wildcard leaf must rank exactly like the explicit OR of its
    expansion terms (plain BM25, capped df desc / term asc)."""
    from mahout_spark.index.boolquery import _wildcard_expansion_rows

    lex = pos_built.read(spark, "lexicon")
    terms = [r["term"]
             for r in _wildcard_expansion_rows(lex, "*an*", 64)]
    assert terms, "expansion should be non-empty on this corpus"
    explicit = "(" + " OR ".join(terms) + ")"
    assert _rows(boolean_topk(spark, pos_built, "*an*", k=10)) == \
        _rows(boolean_topk(spark, pos_built, explicit, k=10))


def test_searcher_query_supports_wildcard(spark, pos_built):
    from mahout_spark.index.searcher import Searcher

    s = Searcher(spark, pos_built)
    q = "*can* OR data"
    direct = _rows(boolean_topk(spark, pos_built, q, k=10))
    assert _rows(s.query(q, k=10)) == direct
    assert _rows(s.query(q, k=10)) == direct  # warm-cache repeat


def test_msm_validation():
    n = qp.parse("a OR b OR c")
    assert qp.with_minimum_should_match(n, 1) == n  # identity
    assert qp.with_minimum_should_match(n, 0) == n
    wrapped = qp.with_minimum_should_match(n, 2)
    assert wrapped[0] == "msm" and wrapped[2] == 2
    qp.validate(wrapped)
    # boost wrapper is transparent: msm lands under the boost
    b = qp.with_minimum_should_match(qp.parse("(a OR b OR c)^2"), 2)
    assert b[0] == "boost" and b[1][0] == "msm"
    with pytest.raises(qp.QueryParseError):  # m above clause count
        qp.with_minimum_should_match(n, 4)
    with pytest.raises(qp.QueryParseError):  # not a disjunction
        qp.with_minimum_should_match(qp.parse("a AND b"), 2)
    with pytest.raises(qp.QueryParseError):  # NOT can't be a clause
        qp.validate(("msm", [("term", "a"), ("not", ("term", "b"))], 1))
    with pytest.raises(qp.QueryParseError):  # m must be a valid int
        qp.validate(("msm", [("term", "a")], 2))
    # walkers see through msm
    m = ("msm", [("term", "a"), ("prefix", "me"), ("fuzzy", "slot", 1),
                 ("phrase", ("x", "y"), None)], 2)
    assert qp.all_terms(m) == ["a", "x", "y"]
    assert qp.prefixes(m) == ["me"]
    assert qp.fuzzies(m) == [("slot", 1)]
    assert qp.has_phrase(m)
    e = qp.expand_prefixes(m, {"me": ["merge", "metric"]})
    assert e[0] == "msm" and e[2] == 2
    assert e[1][1] == ("or", [("term", "merge"), ("term", "metric")])
    # single-term expansion collapses to a term node — still ONE clause
    e1 = qp.expand_prefixes(m, {"me": ["merge"]})
    assert e1[1][1] == ("term", "merge")


@pytest.mark.parametrize("q,m", [
    ("table OR scan OR merge OR data", 2),
    ("table OR scan OR merge OR data", 3),
    ("table OR scan OR merge OR data", 4),
    ('"table scan" OR merge OR data', 2),
    ("mer* OR table OR data", 2),
])
def test_boolean_msm_matches_oracle(spark, pos_built, oracle, q, m):
    got = _rows(boolean_topk(spark, pos_built, q, k=10,
                             minimum_should_match=m))
    want = oracle.boolean_search(q, k=10, minimum_should_match=m)
    assert [g[0] for g in got] == [w[0] for w in want], (q, m)
    for g, w in zip(got, want):
        assert g[1] == pytest.approx(w[1], abs=1e-9)


def test_msm_boundary_identities(spark, pos_built):
    """m=1 is the plain OR; m=n is the AND — over both the ranked and
    match-set surfaces."""
    from mahout_spark.index.boolquery import matching_docs

    q = "table OR scan OR merge"
    assert _rows(boolean_topk(spark, pos_built, q, k=50,
                              minimum_should_match=1)) == \
        _rows(boolean_topk(spark, pos_built, q, k=50))
    assert _rows(boolean_topk(spark, pos_built, q, k=50,
                              minimum_should_match=3)) == \
        _rows(boolean_topk(spark, pos_built, "table AND scan AND merge",
                           k=50))
    m2 = {r["doc_id"] for r in matching_docs(
        spark, pos_built, q, minimum_should_match=2).collect()}
    m1 = {r["doc_id"] for r in matching_docs(spark, pos_built, q).collect()}
    m3 = {r["doc_id"] for r in matching_docs(
        spark, pos_built, "table AND scan AND merge").collect()}
    assert m3 <= m2 <= m1 and m2 != m1


def test_searcher_query_supports_msm(spark, pos_built):
    from mahout_spark.index.searcher import Searcher

    s = Searcher(spark, pos_built)
    q = "table OR scan OR mer*"
    direct = _rows(boolean_topk(spark, pos_built, q, k=10,
                                minimum_should_match=2))
    assert _rows(s.query(q, k=10, minimum_should_match=2)) == direct


def test_boost_changes_scores_not_match_set(spark, pos_built):
    from mahout_spark.index.boolquery import matching_docs

    # k beyond the match-set size: the SETS must agree (boosts reorder,
    # never add/remove matches), the rankings must not
    plain = _rows(boolean_topk(spark, pos_built, "table OR scan", k=10**6))
    boosted = _rows(boolean_topk(spark, pos_built, "table^2 OR scan",
                                 k=10**6))
    assert {d for d, _ in plain} == {d for d, _ in boosted}
    assert plain != boosted  # table contributions scaled
    m1 = {r["doc_id"] for r in
          matching_docs(spark, pos_built, "table^2 OR scan").collect()}
    m2 = {r["doc_id"] for r in
          matching_docs(spark, pos_built, "table OR scan").collect()}
    assert m1 == m2


def test_boolean_fuzzy_equals_explicit_or(spark, pos_built):
    """A fuzzy leaf must rank exactly like the explicit OR of its
    expansion terms (plain BM25, no similarity downweighting)."""
    from mahout_spark.index.boolquery import _fuzzy_expansion_rows

    lex = pos_built.read(spark, "lexicon")
    terms = [r["term"] for r in _fuzzy_expansion_rows(lex, "slot", 2, 64)]
    assert terms, "expansion should be non-empty on this corpus"
    got = _rows(boolean_topk(spark, pos_built, "slot~2 AND data", k=10))
    explicit = f"({' OR '.join(terms)}) AND data"
    assert got == _rows(boolean_topk(spark, pos_built, explicit, k=10))


def test_fuzzy_expansion_order_and_cap(spark, pos_built):
    """Expansion ranks (distance asc, df desc, term asc) and honors the
    cap — closer terms survive a cap of 1."""
    from mahout_spark.index.boolquery import _fuzzy_expansion_rows

    lex = pos_built.read(spark, "lexicon")
    rows = _fuzzy_expansion_rows(lex, "slot", 2, 64)
    dists = [r["dist"] for r in rows]
    assert dists == sorted(dists)
    assert [r["term"] for r in rows][:1] == ["slow"]  # d=1 beats d=2
    capped = _fuzzy_expansion_rows(lex, "slot", 2, 1)
    assert [r["term"] for r in capped] == ["slow"]


def test_boolean_fuzzy_no_match_is_empty(spark, pos_built):
    assert _rows(
        boolean_topk(spark, pos_built, "zzzzzzzzzz~2 AND table", k=10)
    ) == []


def test_boolean_prefix_no_match_is_empty(spark, pos_built):
    assert _rows(boolean_topk(spark, pos_built, "zzzq* AND table", k=10)) == []


def test_boolean_or_equals_wand_or(spark, pos_built):
    """`a OR b` must rank exactly like the OR retrieval kernel."""
    from mahout_spark.index.wand import topk

    got = _rows(boolean_topk(spark, pos_built, "table OR scan", k=10))
    want = _rows(topk(spark, pos_built, ["table", "scan"], k=10))
    assert got == want


def test_boolean_and_equals_wand_and(spark, pos_built):
    from mahout_spark.index.wand import topk

    got = _rows(boolean_topk(spark, pos_built, "table AND scan", k=10))
    want = _rows(topk(spark, pos_built, ["table", "scan"], k=10,
                      mode_all=True))
    assert got == want


def test_boolean_phrase_only_equals_phrase_topk(spark, pos_built):
    from mahout_spark.index.phrase import phrase_topk

    got = _rows(boolean_topk(spark, pos_built, '"table scan"', k=10))
    want = _rows(phrase_topk(spark, pos_built, ["table", "scan"], k=10))
    assert got == want


def test_boolean_on_nonpositional_index(spark, corpus, tmp_path_factory,
                                        oracle):
    """Plain boolean trees run on a positionless index; phrase leaves
    raise the positional requirement."""
    out = str(tmp_path_factory.mktemp("boolnopos"))
    cat = build_index(
        spark, corpus, out, content_col="content", id_cols=["doc_id"],
        mode="simple", n_buckets=4, docs_per_shard=64, block_size=16,
    )
    q = "table scan NOT merge"
    got = _rows(boolean_topk(spark, cat, q, k=10))
    want = oracle.boolean_search(q, k=10)
    assert [g[0] for g in got] == [w[0] for w in want]
    with pytest.raises(ValueError, match="positions=True"):
        boolean_topk(spark, cat, '"table scan"')


def test_search_after_pages_reassemble_ranking(spark, pos_built):
    """Cursor pagination: consecutive pages are disjoint and concatenate
    to exactly the deep ranking."""
    q = "table OR scan OR merge"
    full = _rows(boolean_topk(spark, pos_built, q, k=30))
    pages, cursor = [], None
    for _ in range(3):
        df = boolean_topk(spark, pos_built, q, k=10, after=cursor)
        rows = df.collect()
        if not rows:
            break
        pages.extend((r["doc_id"], r["score"]) for r in rows)
        cursor = rows[-1]  # the natural usage: last Row IS the cursor
    assert pages == full
    assert len({d for d, _ in pages}) == len(pages)  # disjoint


def test_search_after_crosses_tie_bands(spark, tmp_path_factory):
    """Exact duplicate docs force tied scores across shards; the cursor
    must advance through a tie band by doc_id without skips or repeats."""
    rows = [(i, "alpha beta gamma") for i in range(7)] + [
        (100 + i, "alpha delta") for i in range(3)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "content"])
    out = str(tmp_path_factory.mktemp("afteridx"))
    cat = build_index(
        spark, docs, out, content_col="content", id_cols=["doc_id"],
        mode="simple", n_buckets=2, docs_per_shard=4, block_size=4,
    )
    full = _rows(boolean_topk(spark, cat, "alpha", k=100))
    assert len(full) == 10
    got, cursor = [], None
    while True:
        page = _rows(boolean_topk(spark, cat, "alpha", k=3, after=cursor))
        if not page:
            break
        got.extend(page)
        cursor = (page[-1][1], page[-1][0])  # explicit (score, doc_id)
    assert got == full


def test_search_after_past_end_is_empty(spark, pos_built):
    full = _rows(boolean_topk(spark, pos_built, "table", k=10**6))
    last = {"score": full[-1][1], "doc_id": full[-1][0]}
    assert _rows(
        boolean_topk(spark, pos_built, "table", k=10, after=last)
    ) == []
    with pytest.raises(ValueError):
        boolean_topk(spark, pos_built, "table", after={"doc_id": 3})
    with pytest.raises(ValueError):
        boolean_topk(spark, pos_built, "table", after=(1.0, 2, 3))


def test_searcher_query_supports_after(spark, pos_built):
    from mahout_spark.index.searcher import Searcher

    s = Searcher(spark, pos_built)
    q = "table OR scan"
    p1 = _rows(s.query(q, k=10))
    cursor = (p1[-1][1], p1[-1][0])
    direct = _rows(boolean_topk(spark, pos_built, q, k=10, after=cursor))
    assert _rows(s.query(q, k=10, after=cursor)) == direct


def test_boolean_driver_merge_matches_spark_merge(spark, pos_built):
    q = '("table scan" OR merge) AND data'
    assert _rows(boolean_topk(spark, pos_built, q, k=10)) == _rows(
        boolean_topk(spark, pos_built, q, k=10, merge="driver")
    )


def test_searcher_query_matches_boolean_topk(spark, pos_built):
    from mahout_spark.index.searcher import Searcher

    s = Searcher(spark, pos_built)
    for q in ('("table scan" OR merge) AND data NOT stream',
              "mer* OR table",
              "slot~2 AND data",
              '"data merge"~8'):
        direct = _rows(boolean_topk(spark, pos_built, q, k=10))
        assert _rows(s.query(q, k=10)) == direct, q
        # warm repeat serves from the term + prefix caches
        assert _rows(s.query(q, k=10)) == direct, q


# -- explain (X54) ------------------------------------------------------------


@pytest.mark.parametrize("q", [
    "table AND data",
    "table^3 OR scan OR merge",
    '"table scan" OR data NOT stream',
    "mer* OR table",
])
def test_explain_agrees_with_topk(spark, pos_built, q):
    """explain_topk's docs/scores must be exactly boolean_topk's, and
    each doc's contributions must sum to its score bit-identically."""
    from mahout_spark.index.boolquery import explain_topk

    top = _rows(boolean_topk(spark, pos_built, q, k=10))
    ex = explain_topk(spark, pos_built, q, k=10).collect()
    by_doc = {}
    for r in ex:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert [(d, by_doc[d][0]["score"]) for d, _ in top] == top
    assert set(by_doc) == {d for d, _ in top}
    for d, score in top:
        rows = sorted(by_doc[d], key=lambda r: r["term"])
        # contributions sum to the doc score up to summation-order ulps
        # (reduceat's SIMD fold order is not a plain left fold); the
        # SCORE column itself is bit-identical to boolean_topk above
        total = sum(r["contrib"] for r in rows)
        assert total == pytest.approx(score, rel=1e-12), (d, total, score)
        for r in rows:
            assert r["contrib"] == pytest.approx(
                r["weight"] * r["idf"] * (r["tf"] * (1.2 + 1.0)) /
                (r["tf"] + 1.2 * (1 - 0.75 + 0.75 * r["doclen"] /
                                  _avgdl(spark, pos_built))), rel=1e-12)


def _avgdl(spark, cat):
    return cat.read_meta("postings")["avgdl"]


def test_explain_boost_weights_visible(spark, pos_built):
    from mahout_spark.index.boolquery import explain_topk

    ex = explain_topk(spark, pos_built, "table^3 OR scan", k=10).collect()
    ws = {r["term"]: r["weight"] for r in ex}
    assert ws["table"] == 3.0 and ws.get("scan", 1.0) == 1.0
    # contrib = weight * idf * saturation; unboosted scan rows keep weight 1


def test_explain_empty_and_unknown(spark, pos_built):
    from mahout_spark.index.boolquery import explain_topk

    assert explain_topk(spark, pos_built, "zzzqqq").count() == 0


def test_searcher_explain_matches_direct(spark, pos_built):
    from mahout_spark.index.boolquery import explain_topk
    from mahout_spark.index.searcher import Searcher

    s = Searcher(spark, pos_built)
    q = "table^2 OR mer*"
    direct = [tuple(r) for r in explain_topk(spark, pos_built, q, k=5)
              .collect()]
    assert [tuple(r) for r in s.explain(q, k=5).collect()] == direct
    assert [tuple(r) for r in s.explain(q, k=5).collect()] == direct  # warm


# -- synonyms (X55) -----------------------------------------------------------


def test_expand_synonyms_units():
    n = qp.parse("fast AND data NOT slow")
    e = qp.expand_synonyms(n, {"fast": ["quick", "Speedy"],
                               "slow": "sluggish"})
    assert e == ("and", [
        ("or", [("term", "fast"), ("term", "quick"), ("term", "speedy")]),
        ("term", "data"),
        ("not", ("or", [("term", "slow"), ("term", "sluggish")])),
    ])
    # phrases are not rewritten; self-synonyms and dups drop
    assert qp.expand_synonyms(qp.parse('"fast lane"'), {"fast": ["quick"]}) \
        == ("phrase", ("fast", "lane"), None)
    assert qp.expand_synonyms(("term", "a"), {"a": ["a"]}) == ("term", "a")
    with pytest.raises(qp.QueryParseError):
        qp.expand_synonyms(("term", "a"), {"two words": ["b"]})
    # synonym group counts as ONE clause for minimum_should_match
    wrapped = qp.with_minimum_should_match(
        qp.expand_synonyms(qp.parse("fast OR table OR merge"),
                           {"fast": ["quick"]}), 2)
    assert wrapped[0] == "msm" and len(wrapped[1]) == 3
    assert qp.synonym_groups({"fast": ["quick"], "x": []}) == \
        [["fast", "quick"]]


@pytest.mark.parametrize("blend", [False, True])
def test_boolean_synonyms_match_oracle(spark, pos_built, oracle, blend):
    q = "join AND data"
    syn = {"join": ["merge"]}
    got = _rows(boolean_topk(spark, pos_built, q, k=10, synonyms=syn,
                             synonym_blend=blend))
    want = oracle.boolean_search(q, k=10, synonyms=syn,
                                 synonym_blend=blend)
    assert [g[0] for g in got] == [w[0] for w in want], blend
    for g, w in zip(got, want):
        assert g[1] == pytest.approx(w[1], abs=1e-9)


def test_synonym_unblended_equals_explicit_or(spark, pos_built):
    """expand=true model: a synonym group without blending ranks exactly
    like the hand-written OR."""
    got = _rows(boolean_topk(spark, pos_built, "join AND data", k=10,
                             synonyms={"join": ["merge"]}))
    assert got == _rows(
        boolean_topk(spark, pos_built, "(join OR merge) AND data", k=10))


def test_synonym_blend_changes_scores_not_matches(spark, pos_built):
    """Blending replaces member idfs with the group-max-df idf: same
    match set, generally different scores; both member terms score with
    the SAME idf in the blended explain breakdown."""
    from mahout_spark.index.boolquery import explain_topk, matching_docs

    syn = {"join": ["merge"]}
    q = "join OR merge OR data"
    m_plain = {r["doc_id"] for r in
               matching_docs(spark, pos_built, q).collect()}
    m_syn = {r["doc_id"] for r in matching_docs(
        spark, pos_built, q, synonyms=syn).collect()}
    assert m_plain == m_syn
    ex = explain_topk(spark, pos_built, "join OR merge", k=10,
                      synonyms=syn, synonym_blend=True).collect()
    idfs = {r["term"]: r["idf"] for r in ex}
    assert idfs["join"] == idfs["merge"]
    plain = {r["term"]: r["idf"] for r in explain_topk(
        spark, pos_built, "join OR merge", k=10).collect()}
    assert plain["join"] != plain["merge"]  # the dfs genuinely differ
    assert min(idfs["join"], idfs["merge"]) == min(
        plain["join"], plain["merge"])  # blended = max-df = min-idf


# -- ranked match set + collapse (X56) ---------------------------------------


def test_score_matches_equals_uncut_topk(spark, pos_built):
    from mahout_spark.index.boolquery import matching_docs, score_matches

    q = '("table scan" OR mer*) AND data'
    all_rows = sorted(_rows(score_matches(spark, pos_built, q)))
    deep = sorted(_rows(boolean_topk(spark, pos_built, q, k=10**6)))
    assert all_rows == deep  # same docs, bit-identical scores, no cut
    m = {r["doc_id"] for r in matching_docs(spark, pos_built, q).collect()}
    assert {d for d, _ in all_rows} == m


def test_collapse_topk_per_group(spark, pos_built):
    from mahout_spark.index.boolquery import collapse_topk, score_matches

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    q = "table OR scan"
    got = collapse_topk(spark, pos_built, docs, q, "lang", n=2).collect()
    # brute-force: full ranked match set -> top-2 per lang
    scores = {r["doc_id"]: r["score"]
              for r in score_matches(spark, pos_built, q).collect()}
    lang_of = {r["doc_id"]: r["lang"] for r in docs.collect()}
    want = {}
    for d, s in sorted(scores.items(), key=lambda e: (-e[1], e[0])):
        want.setdefault(lang_of[d], []).append((d, s))
    for g in want:
        want[g] = want[g][:2]
    got_by_g = {}
    for r in got:
        got_by_g.setdefault(r["lang"], []).append(
            (r["rank"], r["doc_id"], r["score"]))
    assert set(got_by_g) == set(want)
    for g, rows in got_by_g.items():
        assert [(i + 1, d, s) for i, (d, s) in enumerate(want[g])] == \
            sorted(rows)


# -- spell suggestion (X57) ---------------------------------------------------


def test_suggest_terms_ranking_and_exclusion(spark, pos_built, oracle):
    from mahout_spark.index.boolquery import suggest_terms

    # independent oracle: pure-python edit distance over the corpus df
    from tests.oracle import _edit_distance

    def want(stem, n, max_edits):
        cands = [
            (t, _edit_distance(t, stem), df)
            for t, df in oracle.df.items()
            if t != stem and _edit_distance(t, stem) <= max_edits
        ]
        cands.sort(key=lambda e: (e[1], -e[2], e[0]))
        return cands[:n]

    for w, me in [("tabel", 2), ("streem", 1), ("scan", 2), ("daat", 2)]:
        got = suggest_terms(spark, pos_built, w, n=5, max_edits=me)
        assert got == want(w, 5, me), (w, me)
    # the word itself is excluded even when it is a valid term
    assert all(t != "scan" for t, _, _ in
               suggest_terms(spark, pos_built, "scan", n=5))
    with pytest.raises(qp.QueryParseError):
        suggest_terms(spark, pos_built, "two words")
    with pytest.raises(qp.QueryParseError):
        suggest_terms(spark, pos_built, "scan", max_edits=3)


def test_searcher_suggest_matches_direct(spark, pos_built):
    from mahout_spark.index.boolquery import suggest_terms
    from mahout_spark.index.searcher import Searcher

    s = Searcher(spark, pos_built)
    direct = suggest_terms(spark, pos_built, "tabel", n=5)
    assert s.suggest("tabel", n=5) == direct
    assert s.suggest("tabel", n=5) == direct  # warm repeat, no lexicon job


# -- batched boolean retrieval (X58) ------------------------------------------


def test_boolean_batch_equals_per_query(spark, pos_built):
    """Every query in a batch must rank exactly as its per-query
    boolean_topk — across plain/boost/mm/prefix/fuzzy/wildcard/phrase
    shapes over the shared decode."""
    from mahout_spark.index.boolquery import boolean_topk_batch

    qs = {
        "plain_and": "table AND data",
        "boosted": "table^3 OR scan OR merge",
        "prefixy": "mer* OR data NOT stream",
        "fuzzy": "slot~2 AND data",
        "wild": "*can* OR merge",
        "phrase": '"table scan" OR data',
        "absent": "zzzqqq",
    }
    batch = boolean_topk_batch(spark, pos_built, qs, k=10).collect()
    by_q = {}
    for r in batch:
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["score"]))
    assert "absent" not in by_q
    for qid, q in qs.items():
        if qid == "absent":
            continue
        want = _rows(boolean_topk(spark, pos_built, q, k=10))
        got = [(d, s) for _, d, s in sorted(by_q.get(qid, []))]
        assert got == want, qid
        assert [r for r, _, _ in sorted(by_q[qid])] == \
            list(range(1, len(want) + 1))


def test_boolean_batch_msm_and_synonyms(spark, pos_built):
    from mahout_spark.index.boolquery import boolean_topk_batch

    qs = {"a": "join AND data", "b": "table OR scan OR merge"}
    batch = boolean_topk_batch(
        spark, pos_built, qs, k=10, synonyms={"join": ["merge"]},
        synonym_blend=True,
    ).collect()
    by_q = {}
    for r in batch:
        by_q.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    want_a = _rows(boolean_topk(spark, pos_built, "join AND data", k=10,
                                synonyms={"join": ["merge"]},
                                synonym_blend=True))
    assert sorted(by_q["a"], key=lambda e: (-e[1], e[0])) == want_a
    # b has no synonym KEY: its plain `merge` term must keep its own idf
    # even though query a's group also names merge (per-query blending)
    want_b = _rows(boolean_topk(spark, pos_built,
                                "table OR scan OR merge", k=10,
                                synonyms={"join": ["merge"]},
                                synonym_blend=True))
    assert sorted(by_q["b"], key=lambda e: (-e[1], e[0])) == want_b


# -- filter context (X61) -----------------------------------------------------


def test_filter_context_masks_without_rescoring(spark, pos_built):
    """Filtered top-k == the unfiltered ranked MATCH SET intersected
    with the filter, cut to k — surviving scores bit-identical (the ES
    filter-context contract: filters never perturb scores)."""
    from mahout_spark.index.boolquery import score_matches

    q = "table OR data OR merge"
    full = sorted(
        _rows(score_matches(spark, pos_built, q)),
        key=lambda e: (-e[1], e[0]),
    )
    keep = {d for d, _ in full[::2]}  # every other match
    want = [e for e in full if e[0] in keep][:5]
    got = _rows(boolean_topk(spark, pos_built, q, k=5,
                             filter_ids=sorted(keep)))
    assert got == want


def test_filtered_topk_regimes_agree(spark, pos_built, corpus):
    """The adaptive relational plan (forced via max_collect=0) returns
    exactly the kernel-mask plan's rows, for plain and phrase queries."""
    from mahout_spark.index.boolquery import filtered_topk

    flt = corpus.filter(F.col("doc_id") % 3 == 0)
    for q in ["table OR data", '"table scan" OR merge NOT stream']:
        small = _rows(filtered_topk(spark, pos_built, q, flt, k=8))
        big = _rows(filtered_topk(spark, pos_built, q, flt, k=8,
                                  max_collect=0))
        assert small == big, q
        assert all(d % 3 == 0 for d, _ in small)


def test_filter_context_empty_and_composes_with_after(spark, pos_built):
    assert boolean_topk(
        spark, pos_built, "table", k=5, filter_ids=[]
    ).count() == 0

    q = "table OR data OR scan"
    flt = [d for d, _ in _rows(boolean_topk(spark, pos_built, q, k=50))
           if d % 2 == 0]
    page1 = _rows(boolean_topk(spark, pos_built, q, k=3, filter_ids=flt))
    page2 = _rows(boolean_topk(spark, pos_built, q, k=3, filter_ids=flt,
                               after=(page1[-1][1], page1[-1][0])))
    deep = _rows(boolean_topk(spark, pos_built, q, k=6, filter_ids=flt))
    assert page1 + page2 == deep


# -- regexp leaves (X62) -------------------------------------------------------


def test_parse_regexp():
    assert qp.parse("/sc.n/") == ("regexp", "sc.n")
    assert qp.parse("/ab+/^2 AND data") == (
        "and", [("boost", ("regexp", "ab+"), 2.0), ("term", "data")]
    )
    assert qp.parse("/t[a-z]*le/ OR merge") == (
        "or", [("regexp", "t[a-z]*le"), ("term", "merge")]
    )
    assert qp.regexps(qp.parse("x OR /ab+c/ NOT /d.f/")) == ["ab+c", "d.f"]
    n = qp.parse("/sc.n/ AND data")
    e = qp.expand_regexps(n, {"sc.n": ["scan", "scen"]})
    assert e[1][0] == ("or", [("term", "scan"), ("term", "scen")])
    assert qp.expand_regexps(n, {})[1][0] == ("or", [])
    with pytest.raises(qp.QueryParseError):
        qp.parse("/[bad/")
    with pytest.raises(qp.QueryParseError):
        qp.parse("//")


@pytest.mark.parametrize("q", [
    "/t[a-z]*le/ OR data",
    "/sc.n|m.rge/ AND data",
    "data AND NOT /s(?:c|p)an/",
    "/ta.le/^3 OR merge",
])
def test_boolean_regexp_matches_oracle(spark, pos_built, oracle, q):
    got = _rows(boolean_topk(spark, pos_built, q, k=10))
    want = oracle.boolean_search(q, k=10)
    assert [g[0] for g in got] == [w[0] for w in want], q
    for g, w in zip(got, want):
        assert g[1] == pytest.approx(w[1], abs=1e-9)


def test_regexp_equals_explicit_or(spark, pos_built):
    """A regexp leaf must rank exactly like the explicit OR of its
    expansion terms (plain BM25, capped df desc / term asc)."""
    from mahout_spark.index.boolquery import _regexp_expansion_rows

    lex = pos_built.read(spark, "lexicon")
    terms = [r["term"] for r in _regexp_expansion_rows(lex, ".*an.*", 64)]
    assert terms, "expansion should be non-empty on this corpus"
    explicit = "(" + " OR ".join(terms) + ")"
    assert _rows(boolean_topk(spark, pos_built, "/.*an.*/", k=10)) == \
        _rows(boolean_topk(spark, pos_built, explicit, k=10))


def test_searcher_and_batch_support_regexp(spark, pos_built):
    from mahout_spark.index.boolquery import boolean_topk_batch
    from mahout_spark.index.searcher import Searcher

    q = "/t[a-z]*le/ OR data"
    direct = _rows(boolean_topk(spark, pos_built, q, k=10))
    s = Searcher(spark, pos_built)
    assert _rows(s.query(q, k=10)) == direct
    assert _rows(s.query(q, k=10)) == direct  # warm-cache repeat
    batch = boolean_topk_batch(spark, pos_built, {"r": q}, k=10).collect()
    assert [(r["doc_id"], r["score"]) for r in
            sorted(batch, key=lambda r: r["rank"])] == direct


def test_regexp_lexer_does_not_fuse_across_whitespace():
    """Path-like words starting with '/' must not swallow operators:
    the regex token stops at unescaped whitespace (escape a literal
    space as '\\ ')."""
    assert qp.parse("scan OR /etc NOT /usr") == (
        "or", [("term", "scan"),
               ("and", [("term", "etc"), ("not", ("term", "usr"))])]
    )
    assert qp.parse(r"/a\ b/") == ("regexp", r"a\ b")
    # python-only regex syntax rejected at parse time, not mid-job
    for bad in ["/(?P<x>ab)+/", "/(?(1)a|b)/"]:
        with pytest.raises(qp.QueryParseError, match="Python-only"):
            qp.parse(bad)


def test_filtered_topk_after_and_merge_across_regimes(spark, pos_built,
                                                      corpus):
    """Cursor pagination must behave identically in both physical
    regimes; merge= is rejected (regime choice IS the physical plan)."""
    from mahout_spark.index.boolquery import filtered_topk

    flt = corpus.filter(F.col("doc_id") % 2 == 0)
    q = "table OR data OR scan"
    p1_small = _rows(filtered_topk(spark, pos_built, q, flt, k=3))
    cursor = (p1_small[-1][1], p1_small[-1][0])
    p2_small = _rows(filtered_topk(spark, pos_built, q, flt, k=3,
                                   after=cursor))
    p2_large = _rows(filtered_topk(spark, pos_built, q, flt, k=3,
                                   after=cursor, max_collect=0))
    assert p2_small == p2_large
    deep = _rows(filtered_topk(spark, pos_built, q, flt, k=6))
    assert p1_small + p2_small == deep
    with pytest.raises(ValueError, match="merge"):
        filtered_topk(spark, pos_built, q, flt, k=3, merge="driver")


def test_suggest_min_df_overfetch_and_fastpath_cap(spark, tmp_path_factory):
    """ADVICE round 3: (a) the n+1 fetch cap only budgeted for excluding
    the stem, so a min_df>1 trim could return fewer than n suggestions
    even when the lexicon holds enough candidates — here six distance-1
    df=1 terms fill the old cap and min_df=2 used to return NOTHING
    despite five qualifying distance-2 terms; (b) Searcher.suggest's
    cached fast path silently accepted max_edits=3 that suggest_terms
    rejects."""
    from mahout_spark.index.boolquery import suggest_terms
    from mahout_spark.index.searcher import Searcher

    texts = [f"cat{c}" for c in "abcdef"]  # dist 1 from catz, df=1 each
    texts += ["carx cary carw carv caru"] * 2  # dist 2, df=2 each
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, content string"
    )
    cat = build_index(
        spark, docs, str(tmp_path_factory.mktemp("sugidx")),
        content_col="content", id_cols=["doc_id"], mode="simple",
        n_buckets=2, docs_per_shard=8, block_size=8,
    )
    want = [(t, 2, 2) for t in ["caru", "carv", "carw", "carx", "cary"]]
    assert suggest_terms(spark, cat, "catz", n=5, min_df=2) == want

    s = Searcher(spark, cat)
    assert s.suggest("catz", n=5, min_df=2) == want
    assert s.suggest("catz", n=5, min_df=2) == want  # warm repeat
    with pytest.raises(qp.QueryParseError):
        s.suggest("catz", max_edits=3)


# ---------------------------------------------------------------------------
# search templates (X119)
# ---------------------------------------------------------------------------

def test_render_template_and_injection_guard():
    from mahout_spark.index.queryparse import render_template

    out = render_template(
        '("{{p}}" OR {{a}}) AND {{m}} NOT {{x}}',
        dict(p="table scan", a="merge", m="data", x="stream"))
    assert out == '("table scan" OR merge) AND data NOT stream'
    # wildcard / fuzzy values pass
    assert render_template("{{t}}", dict(t="mer*")) == "mer*"
    assert render_template("{{t}}", dict(t="slot~2")) == "slot~2"
    import pytest as _pt
    with _pt.raises(KeyError, match="missing"):
        render_template("{{a}} {{b}}", dict(a="x"))
    with _pt.raises(ValueError, match="unused"):
        render_template("{{a}}", dict(a="x", b="y"))
    with _pt.raises(ValueError, match="unsafe"):
        render_template("{{a}}", dict(a='x" OR "y'))
    with _pt.raises(ValueError, match="unsafe"):
        render_template("{{a}}", dict(a="x) OR (y"))
    with _pt.raises(ValueError, match="operator word"):
        render_template("{{a}}", dict(a="x AND y"))
    with _pt.raises(ValueError, match="unresolved"):
        render_template("{{ bad name }}", {})


def test_rendered_template_queries_like_the_literal(spark, pos_built):
    from mahout_spark.index.boolquery import boolean_topk
    from mahout_spark.index.queryparse import render_template

    rendered = render_template(
        '("{{p}}" OR {{a}}) AND {{m}} NOT {{x}}',
        dict(p="table scan", a="merge", m="data", x="stream"))
    a = [(r["doc_id"], round(r["score"], 9)) for r in
         boolean_topk(spark, pos_built,
                      '("table scan" OR merge) AND data NOT stream',
                      k=10).collect()]
    b = [(r["doc_id"], round(r["score"], 9)) for r in
         boolean_topk(spark, pos_built, rendered, k=10).collect()]
    assert a == b and a


# -- highlight (round-4 VERDICT ask #6) -------------------------------------


def _py_highlight(oracle, match_ids, terms, context=3,
                  pre="<em>", post="</em>"):
    """Independent list-scan highlighter over the oracle's token dict."""
    out = {}
    for did in match_ids:
        toks = oracle.tokens[did]
        firsts = [i for i, t in enumerate(toks) if t in terms]
        if not firsts:
            continue
        f = firsts[0]
        lo, hi = max(f - context, 0), min(f + context + 1, len(toks))
        out[did] = (f, " ".join(
            f"{pre}{t}{post}" if t in terms else t for t in toks[lo:hi]))
    return out


def _hl_rows(df):
    return {r["doc_id"]: (r["first_pos"], r["snippet"]) for r in df.collect()}


def test_highlight_matches_python_oracle(spark, pos_built, corpus, oracle):
    from mahout_spark.index.boolquery import highlight

    q = '("table scan" OR merge) AND data NOT stream'
    match = {d for d, _ in oracle.boolean_search(q, k=10**6)}
    assert match  # non-trivial on this corpus
    want = _py_highlight(
        oracle, match, {"table", "scan", "merge", "data"})
    got = _hl_rows(highlight(
        spark, pos_built, corpus, q, content_col="content"))
    assert got == want
    # NOT-excluded docs never appear
    stream_docs = {d for d, t in oracle.tokens.items() if "stream" in t}
    assert not (set(got) & stream_docs)


def test_highlight_wraps_expanded_prefix_terms(spark, pos_built, corpus,
                                               oracle):
    """A doc matched via ``mer*`` must highlight the CONCRETE expanded
    term it contains, not the prefix."""
    from mahout_spark.index.boolquery import highlight

    q = "mer* AND data"
    vocab = {t for toks in oracle.tokens.values() for t in toks}
    expanded = {t for t in vocab if t.startswith("mer")}
    assert expanded  # corpus has mer- terms
    match = {d for d, _ in oracle.boolean_search(q, k=10**6)}
    want = _py_highlight(oracle, match, expanded | {"data"})
    got = _hl_rows(highlight(
        spark, pos_built, corpus, q, content_col="content"))
    assert got == want
    assert any("<em>mer" in snip for _, snip in got.values())


def test_highlight_custom_tags_and_context(spark, pos_built, corpus,
                                           oracle):
    from mahout_spark.index.boolquery import highlight

    q = "data AND table"
    match = {d for d, _ in oracle.boolean_search(q, k=10**6)}
    want = _py_highlight(oracle, match, {"data", "table"},
                         context=1, pre="[", post="]")
    got = _hl_rows(highlight(
        spark, pos_built, corpus, q, content_col="content",
        context=1, pre_tag="[", post_tag="]"))
    assert got == want
    # window is at most 2*context+1 tokens
    assert all(len(s.split(" ")) <= 3 for _, s in got.values())


def test_highlight_no_match_returns_empty_with_schema(spark, pos_built,
                                                      corpus):
    from mahout_spark.index.boolquery import highlight

    out = highlight(spark, pos_built, corpus,
                    "zzznosuchterm AND qqqnope", content_col="content")
    assert out.columns == ["doc_id", "first_pos", "snippet"]
    assert out.count() == 0
