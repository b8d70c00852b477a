"""Positional index + phrase retrieval correctness.

Phrase results must match a token-scan oracle exactly (doc ids AND scores):
the kernel's candidate intersection, composite-key adjacency, and BM25
reduction all reuse engine-wide deterministic order, so equality is exact.
Positions themselves are round-tripped bit-exactly against the oracle's
token indices.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mahout_spark.index.build import build_index
from mahout_spark.index.codec import decode_doc_block, decode_positions_block
from mahout_spark.index.phrase import phrase_topk
from mahout_spark.index.wand import topk
from tests.oracle import OracleIndex


@pytest.fixture(scope="module")
def corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return docs.select("doc_id", F.col("text").alias("content"))


@pytest.fixture(scope="module")
def pos_built(spark, corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("posindex"))
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


def test_positions_roundtrip_bit_exact(spark, pos_built, oracle):
    """Decode EVERY block of one bucket; reconstructed per-(doc, term)
    position lists must equal the oracle's token indices exactly."""
    blocks = pos_built.read_partitions(
        spark, "postings", "bucket", [0]
    ).collect()
    assert blocks, "bucket 0 unexpectedly empty"
    seen = 0
    for r in blocks:
        docs, tfs, _ = decode_doc_block(r["doc_ids"], r["tfs"], r["doclens"])
        counts, flat = decode_positions_block(r["pos_counts"], r["positions"])
        assert (counts == tfs).all()  # real terms: one position per hit
        starts = np.cumsum(counts) - counts
        for i, d in enumerate(docs):
            got = flat[starts[i]:starts[i] + counts[i]].tolist()
            want = oracle.positions(int(d), r["term"])
            assert got == want, (r["term"], int(d))
            seen += 1
    assert seen > 100  # the bucket covered a real slice of the corpus


PHRASES = [
    ["table", "scan"],
    ["batch", "batch"],          # duplicate term in the phrase
    ["the", "fast", "key"],
    ["data", "line"],
    ["merge", "part"],
    ["spark"],                   # 1-term phrase == single-term query
    ["spark", "zzznosuchterm"],  # absent term -> empty
]


@pytest.mark.parametrize("phrase", PHRASES)
def test_phrase_matches_token_scan_oracle(spark, pos_built, oracle, phrase):
    got = _rows(phrase_topk(spark, pos_built, phrase, k=10))
    want = oracle.phrase_search(phrase, k=10)
    assert [g[0] for g in got] == [w[0] for w in want], phrase
    for g, w in zip(got, want):
        assert g[1] == pytest.approx(w[1], abs=1e-9)


def test_single_term_phrase_equals_topk(spark, pos_built):
    a = _rows(phrase_topk(spark, pos_built, ["spark"], k=10))
    b = _rows(topk(spark, pos_built, ["spark"], k=10))
    assert a == b


def test_driver_merge_matches_spark_merge(spark, pos_built):
    a = _rows(phrase_topk(spark, pos_built, ["table", "scan"], k=10))
    b = _rows(phrase_topk(spark, pos_built, ["table", "scan"], k=10,
                          merge="driver"))
    assert a == b


def test_phrase_requires_positional_index(spark, corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("nopos"))
    cat = build_index(
        spark, corpus.limit(50), out, content_col="content",
        id_cols=["doc_id"], mode="simple", n_buckets=2,
    )
    with pytest.raises(ValueError, match="positions=True"):
        phrase_topk(spark, cat, ["table", "scan"])


def test_wand_topk_unaffected_by_positions(spark, pos_built, oracle):
    """The positional index serves plain BM25 queries identically (extra
    payload columns are ignored by the non-positional kernel)."""
    got = _rows(topk(spark, pos_built, ["table", "scan"], k=10))
    want = oracle.search(["table", "scan"], k=10)
    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert g[1] == pytest.approx(w[1], abs=1e-9)


def test_text_mode_positional_phrase(spark, tmp_path_factory):
    """Analyzer-chain positions: indices refer to the SURVIVING stream
    (stopworded tokens shift later positions left), so a phrase whose
    source words were separated by a stopword still matches."""
    docs = [
        (0, "the quick brown fox jumped over the lazy dog"),
        (1, "quick brown foxes are rare"),
        (2, "a brown quick fox"),
    ]
    spark_docs = spark.createDataFrame(docs, ["doc_id", "content"])
    out = str(tmp_path_factory.mktemp("postext"))
    cat = build_index(
        spark, spark_docs, out, content_col="content", id_cols=["doc_id"],
        mode="text", n_buckets=2, positions=True,
    )
    ora = OracleIndex({d: c for d, c in docs}, mode="text")
    # 'the' is stopworded -> stream of doc 0 is
    # [quick, brown, fox, jump, lazi, dog]; phrase adjacency holds
    got = _rows(phrase_topk(spark, cat, ["quick", "brown"], k=10))
    want = ora.phrase_search(["quick", "brown"], k=10)
    assert [g[0] for g in got] == [w[0] for w in want] == [1, 0]
    # 'foxes' stems to 'fox', so doc 1 matches too; doc 2 ('brown quick
    # fox') has the terms present but NON-adjacent and must be excluded
    got2 = _rows(phrase_topk(spark, cat, ["brown", "fox"], k=10))
    want2 = ora.phrase_search(["brown", "fox"], k=10)
    assert [g[0] for g in got2] == [w[0] for w in want2]
    assert 2 not in [g[0] for g in got2]


def test_positional_append_then_phrase(spark, corpus, tmp_path_factory,
                                       oracle):
    """Append into a positional index; phrase retrieval over old + new docs
    matches a fresh oracle over the union."""
    from mahout_spark.index.append import append_to_index

    out = str(tmp_path_factory.mktemp("posappend"))
    first = corpus.filter(F.col("doc_id") < 400)
    rest = corpus.filter(F.col("doc_id") >= 400)
    cat = build_index(
        spark, first, out, content_col="content", id_cols=["doc_id"],
        mode="simple", n_buckets=4, docs_per_shard=64, block_size=16,
        positions=True,
    )
    append_to_index(spark, cat, rest, content_col="content")
    got = _rows(phrase_topk(spark, cat, ["table", "scan"], k=10))
    want = oracle.phrase_search(["table", "scan"], k=10)
    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert g[1] == pytest.approx(w[1], abs=1e-9)


def test_term_positions_agree_with_term_frequencies(spark, corpus):
    from mahout_spark.operators import stats

    sample = corpus.filter(F.col("doc_id") < 50)
    tp = stats.term_positions(sample, "content", mode="simple")
    tf = stats.term_frequencies(sample, "content", mode="simple")
    a = {
        (r["doc_id"], r["term"]): (r["tf"], r["doclen"], r["positions"])
        for r in tp.collect()
    }
    b = {
        (r["doc_id"], r["term"]): (r["tf"], r["doclen"])
        for r in tf.collect()
    }
    assert set(a) == set(b)
    for key, (tf_a, dl_a, pos) in a.items():
        assert (tf_a, dl_a) == b[key]
        assert len(pos) == tf_a
        assert pos == sorted(pos)


# -- proximity (NEAR/W) -----------------------------------------------------

PROX_CASES = [
    (["table", "scan"], 1),     # adjacency-tight: unordered phrase
    (["table", "scan"], 4),
    (["data", "merge"], 8),
    (["the", "fast", "key"], 6),
    (["spark"], 0),             # single term: any occurrence matches
    (["spark", "zzznosuchterm"], 5),  # absent term -> empty
    (["batch", "batch"], 3),    # duplicate collapses to single term
]


@pytest.mark.parametrize("terms,window", PROX_CASES)
def test_proximity_matches_brute_force_oracle(
    spark, pos_built, oracle, terms, window
):
    from mahout_spark.index.phrase import proximity_topk

    got = _rows(proximity_topk(spark, pos_built, terms, window, k=10))
    want = oracle.proximity_search(terms, window, k=10)
    assert [g[0] for g in got] == [w[0] for w in want], (terms, window)
    for g, w in zip(got, want):
        assert g[1] == pytest.approx(w[1], abs=1e-9)


def test_proximity_huge_window_equals_and_query(spark, pos_built, oracle):
    """window >= max doclen degrades proximity to the AND query over the
    same terms (identical candidate set AND identical scores)."""
    from mahout_spark.index.phrase import proximity_topk

    terms = ["table", "scan"]
    big = max(oracle.doclen.values()) + 1
    got = _rows(proximity_topk(spark, pos_built, terms, big, k=10))
    want = oracle.search(terms, k=10, mode_all=True)
    assert got == [
        (w[0], pytest.approx(w[1], abs=1e-9)) for w in want
    ] or [g[0] for g in got] == [w[0] for w in want]


def test_proximity_window_zero_multi_term_empty(spark, pos_built):
    """Two distinct terms cannot share one position: window=0 -> empty."""
    from mahout_spark.index.phrase import proximity_topk

    assert _rows(proximity_topk(spark, pos_built, ["table", "scan"], 0)) == []


def test_proximity_rejects_negative_window(spark, pos_built):
    from mahout_spark.index.phrase import proximity_topk

    with pytest.raises(ValueError, match="window"):
        proximity_topk(spark, pos_built, ["table"], -1)


# -- Searcher phrase front-ends --------------------------------------------


def test_searcher_phrase_topk_matches_direct(spark, pos_built):
    from mahout_spark.index.searcher import Searcher

    s = Searcher(spark, pos_built)
    for phrase in (["table", "scan"], ["the", "fast", "key"]):
        direct = _rows(phrase_topk(spark, pos_built, phrase, k=10))
        via = _rows(s.phrase_topk(phrase, k=10))
        rows = [(r["doc_id"], r["score"]) for r in s.phrase_topk_rows(phrase, k=10)]
        assert via == direct, phrase
        assert [(d, pytest.approx(sc, abs=1e-12)) for d, sc in direct] == rows


def test_searcher_phrase_rows_distributed_fallback(spark, pos_built):
    """Force the over-cap regime: the distributed-kernel fallback must
    return the same rows as the driver-side query-node path."""
    import mahout_spark.index.searcher as S

    s = S.Searcher(spark, pos_built)
    want = [(r["doc_id"], r["score"]) for r in s.phrase_topk_rows(["table", "scan"])]
    old = S.DRIVER_EXEC_MAX_POSTINGS
    S.DRIVER_EXEC_MAX_POSTINGS = 1
    try:
        s2 = S.Searcher(spark, pos_built)
        got = [(r["doc_id"], r["score"]) for r in s2.phrase_topk_rows(["table", "scan"])]
    finally:
        S.DRIVER_EXEC_MAX_POSTINGS = old
    assert [(d, pytest.approx(sc, abs=1e-12)) for d, sc in want] == got


def test_searcher_phrase_absent_term_empty(spark, pos_built):
    from mahout_spark.index.searcher import Searcher

    s = Searcher(spark, pos_built)
    assert s.phrase_topk_rows(["table", "zzznosuchterm"]) == []


# -- snippets ---------------------------------------------------------------


def test_phrase_snippets_match_list_slice_oracle(spark, corpus, oracle):
    from mahout_spark.operators.snippets import phrase_snippets

    for phrase, ctx in ([(["table", "scan"], 3), (["the", "fast", "key"], 1)]):
        got = {
            r["doc_id"]: (r["first_pos"], r["snippet"])
            for r in phrase_snippets(
                corpus, phrase, content_col="content", context=ctx
            ).collect()
        }
        assert got == oracle.snippets(phrase, context=ctx), phrase


def test_phrase_snippets_edge_clipping(spark):
    from mahout_spark.operators.snippets import phrase_snippets

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "x alpha beta gamma y z"),
         (3, "no match here"), (4, None)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["first_pos"], r["snippet"])
        for r in phrase_snippets(docs, ["alpha", "beta"], context=2).collect()
    }
    assert got == {
        1: (0, "alpha beta gamma"),
        2: (1, "x alpha beta gamma y"),
    }


# ---------------------------------------------------------------------------
# span_first (X102)
# ---------------------------------------------------------------------------

def _span_first_oracle(oracle, phrase, end, k=10):
    """Token-scan recompute: docs where the phrase occurs starting at
    p with p + len(phrase) <= end, BM25-scored like phrase_search."""
    L = len(phrase)
    hits = []
    for doc_id, toks in oracle.tokens.items():
        ok = any(
            toks[p:p + L] == phrase
            for p in range(0, min(len(toks) - L, end - L) + 1)
        )
        if ok:
            score = sum(oracle.bm25(doc_id, t)
                        for t in sorted(set(phrase)))
            hits.append((doc_id, round(score, 10)))
    hits.sort(key=lambda e: (-e[1], e[0]))
    return hits[:k]


@pytest.mark.parametrize("phrase,end", [
    (["table", "scan"], 8),
    (["table", "scan"], 2),      # span must END by 2: start position 0 only
    (["data"], 1),               # single term at the very first position
    (["data"], 5),
])
def test_span_first_matches_token_scan(spark, pos_built, oracle,
                                       phrase, end):
    from mahout_spark.index.phrase import span_first_topk

    got = _rows(span_first_topk(spark, pos_built, phrase, end, k=10))
    want = _span_first_oracle(oracle, phrase, end, k=10)
    assert [g[0] for g in got] == [w[0] for w in want], (phrase, end)
    for g, w in zip(got, want):
        assert g[1] == pytest.approx(w[1], abs=1e-9)


def test_span_first_wide_end_equals_phrase(spark, pos_built):
    from mahout_spark.index.phrase import span_first_topk

    a = _rows(span_first_topk(spark, pos_built, ["table", "scan"], 10**6))
    b = _rows(phrase_topk(spark, pos_built, ["table", "scan"], k=10))
    assert a == b


def test_span_first_rejects_and_degenerate(spark, pos_built):
    from mahout_spark.index.phrase import span_first_topk

    with pytest.raises(ValueError, match="empty"):
        span_first_topk(spark, pos_built, [], 5)
    with pytest.raises(ValueError, match="end"):
        span_first_topk(spark, pos_built, ["data"], 0)
    # a 2-slot span can never fit inside the first 1 positions
    assert span_first_topk(
        spark, pos_built, ["table", "scan"], 1).count() == 0


# ---------------------------------------------------------------------------
# match_phrase_prefix (X139)
# ---------------------------------------------------------------------------

def _phrase_prefix_oracle(oracle, fixed, prefix, k=10):
    """Brute-force: expansions = dictionary terms with the prefix; a doc
    matches a variant iff the token sequence fixed+[alt] occurs; doc
    score = max over matching variants of the BM25 sum (sorted-term
    fold, like the engine)."""
    alts = sorted(t for t in oracle.df if t.startswith(prefix))
    best = {}
    for did, toks in oracle.tokens.items():
        for a in alts:
            ph = fixed + [a]
            n = len(ph)
            if not any(toks[i:i + n] == ph
                       for i in range(len(toks) - n + 1)):
                continue
            s = sum(oracle.bm25(did, t)
                    for t in sorted(dict.fromkeys(ph)))
            if did not in best or s > best[did]:
                best[did] = s
    out = sorted(best.items(), key=lambda e: (-e[1], e[0]))[:k]
    return [(d, round(s, 6)) for d, s in out]


def test_phrase_prefix_matches_brute_force(spark, pos_built, oracle):
    from mahout_spark.index.phrase import phrase_prefix_topk

    for fixed, prefix in ([["table"], "s"], [["data"], "p"],
                          [["slow", "query"], "p"]):
        got = [(d, round(s, 6)) for d, s in
               _rows(phrase_prefix_topk(spark, pos_built, fixed, prefix,
                                        k=10))]
        want = _phrase_prefix_oracle(oracle, fixed, prefix)
        assert got == want, (fixed, prefix)


def test_phrase_prefix_alt_can_equal_fixed_term(spark, pos_built, oracle):
    """'table t*' — expansions include 'table' itself; the kernel's
    merged-decode path must handle an alt that is also a fixed slot."""
    from mahout_spark.index.phrase import phrase_prefix_topk

    got = [(d, round(s, 6)) for d, s in
           _rows(phrase_prefix_topk(spark, pos_built, ["table"], "t",
                                    k=10))]
    want = _phrase_prefix_oracle(oracle, ["table"], "t")
    assert got == want


def test_phrase_prefix_edges(spark, pos_built):
    from mahout_spark.index.phrase import phrase_prefix_topk

    # a prefix matching no dictionary term -> empty
    assert _rows(phrase_prefix_topk(
        spark, pos_built, ["table"], "zzzzqq")) == []
    with pytest.raises(ValueError, match="fixed term"):
        phrase_prefix_topk(spark, pos_built, [], "s")
    with pytest.raises(ValueError, match="empty prefix"):
        phrase_prefix_topk(spark, pos_built, ["table"], "")
