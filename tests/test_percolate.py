"""Percolation (X68): stored queries vs incoming docs — engine vs a
brute-force python evaluator over the same token sets, agreement with
the index's match sets, and the streaming gate (the same call on a
readStream frame)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

QUERIES = {
    "q_and": "table AND data",
    "q_ornot": "scan OR merge NOT stream",
    "q_prefix": "mer* OR data",
    "q_fuzzy": "slot~2 AND data",
    "q_wild": "*can* OR merge",
    "q_rx": "/t[a-z]*le/ AND data",
    "q_phrase": '"table scan" OR vector',
    "q_boost": "table^3 AND scan",
}


@pytest.fixture(scope="module")
def docs_df(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )


@pytest.fixture(scope="module")
def token_lists(docs_df):
    rows = docs_df.collect()
    return {
        r["doc_id"]: [t for t in re.split(r"[^a-z0-9]+",
                                          (r["text"] or "").lower()) if t]
        for r in rows
    }


def _edit_distance(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _py_match(node, toks: list) -> bool:
    import fnmatch

    from mahout_spark.index import queryparse as qp

    kind = node[0]
    ts = set(toks)
    if kind == "term":
        return node[1] in ts
    if kind == "prefix":
        return any(t.startswith(node[1]) for t in ts)
    if kind == "wildcard":
        return any(fnmatch.fnmatchcase(t, node[1]) for t in ts)
    if kind == "regexp":
        rx = re.compile(node[1])
        return any(rx.fullmatch(t) for t in ts)
    if kind == "fuzzy":
        stem, n = node[1], node[2]
        return any(abs(len(t) - len(stem)) <= n
                   and _edit_distance(t, stem) <= n for t in ts)
    if kind == "phrase":
        seq = list(node[1])
        return any(toks[i:i + len(seq)] == seq
                   for i in range(len(toks) - len(seq) + 1))
    if kind in ("not",):
        return not _py_match(node[1], toks)
    if kind == "boost":
        return _py_match(node[1], toks)
    if kind == "and":
        return all(_py_match(c, toks) for c in node[1])
    if kind == "or":
        return any(_py_match(c, toks) for c in node[1])
    if kind == "msm":
        return sum(_py_match(c, toks) for c in node[1]) >= node[2]
    raise ValueError(kind)


def _want(queries, token_lists, **kw):
    from mahout_spark.index import queryparse as qp

    out = set()
    for qid, q in queries.items():
        node = qp.parse(q)
        if kw.get("synonyms"):
            node = qp.expand_synonyms(node, kw["synonyms"])
        if kw.get("minimum_should_match"):
            node = qp.with_minimum_should_match(
                node, kw["minimum_should_match"])
        for d, toks in token_lists.items():
            if _py_match(node, toks):
                out.add((d, qid))
    return out


def test_percolate_matches_python_oracle(spark, docs_df, token_lists):
    from mahout_spark.index.percolate import percolate

    got = {(r["doc_id"], r["query_id"])
           for r in percolate(spark, QUERIES, docs_df).collect()}
    want = _want(QUERIES, token_lists)
    assert got == want
    assert {q for _, q in got} >= {"q_and", "q_prefix"}  # non-trivial


def test_percolate_synonyms_and_msm(spark, docs_df, token_lists):
    from mahout_spark.index.percolate import percolate

    qs = {"m": "table OR scan OR merge OR data"}
    kw = dict(minimum_should_match=2)
    got = {(r["doc_id"], r["query_id"]) for r in percolate(
        spark, qs, docs_df, **kw).collect()}
    assert got == _want(qs, token_lists, **kw)

    qs2 = {"s": "join AND data"}
    kw2 = dict(synonyms={"join": ["merge"]})
    got2 = {(r["doc_id"], r["query_id"]) for r in percolate(
        spark, qs2, docs_df, **kw2).collect()}
    assert got2 == _want(qs2, token_lists, **kw2)


def test_percolate_agrees_with_index_match_set(spark, docs_df,
                                               tmp_path_factory):
    """Percolation and the simple-mode index must agree on the match
    set — same tokenizer, same boolean semantics."""
    from mahout_spark.index.boolquery import matching_docs
    from mahout_spark.index.build import build_index
    from mahout_spark.index.percolate import percolate

    cat = build_index(
        spark, docs_df, str(tmp_path_factory.mktemp("percidx")),
        content_col="text", id_cols=["doc_id"], mode="simple",
        n_buckets=4, docs_per_shard=64, block_size=16, positions=True,
    )
    for q in ["table AND data", "mer* OR data NOT stream",
              '"table scan" OR vector']:
        via_index = {r["doc_id"] for r in
                     matching_docs(spark, cat, q).collect()}
        via_perc = {r["doc_id"] for r in
                    percolate(spark, {"q": q}, docs_df).collect()}
        assert via_perc == via_index, q


def test_percolate_rejects_slop_and_empty(spark, docs_df):
    from mahout_spark.index.percolate import percolate

    with pytest.raises(ValueError, match="slop"):
        percolate(spark, {"bad": '"table scan"~3'}, docs_df)
    assert percolate(spark, {}, docs_df).count() == 0


def test_percolate_runs_under_structured_streaming(spark, docs_df,
                                                   tmp_path, token_lists):
    """The compiled plan is a stateless projection: the SAME call on a
    readStream frame percolates at ingest. Results collected through a
    memory sink must equal the batch percolation."""
    from mahout_spark.index.percolate import percolate

    src = str(tmp_path / "stream_in")
    docs_df.coalesce(2).write.parquet(src)
    stream = spark.readStream.schema(
        "doc_id long, text string"
    ).parquet(src)
    out = percolate(spark, QUERIES, stream)
    q = (
        out.writeStream.format("memory").queryName("perc_sink")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {(r["doc_id"], r["query_id"])
           for r in spark.table("perc_sink").collect()}
    assert got == _want(QUERIES, token_lists)


def test_percolate_field_tags_with_lang_col(spark, token_lists):
    """Field-tag leaves match via the synthetic lang:<x> token when
    lang_col is given (ADVICE round 3: previously they silently never
    matched). Oracle: python evaluation over tokens + the tag."""
    from mahout_spark.index.percolate import percolate

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text", "lang")
    )
    langs = {r["doc_id"]: (r["lang"] or "").lower()
             for r in docs.select("doc_id", "lang").collect()}
    qs = {"jfr": "lang:fr AND table", "pre": "lang:e* AND scan"}
    got = {(r["doc_id"], r["query_id"]) for r in percolate(
        spark, qs, docs, lang_col="lang").collect()}
    want = set()
    for d, toks in token_lists.items():
        tagged = toks + [f"lang:{langs[d]}"] if langs[d] else toks
        ts = set(tagged)
        if "lang:fr" in ts and "table" in ts:
            want.add((d, "jfr"))
        if any(t.startswith("lang:e") for t in ts) and "scan" in ts:
            want.add((d, "pre"))
    assert got == want
    assert {q for _, q in got} == {"jfr", "pre"}  # both non-trivial


def test_percolate_field_tag_rejected_without_lang_col(spark, docs_df):
    """Without the lang_col seam a field-tag leaf can never match any
    document — compile must fail loudly, not return empty silently."""
    from mahout_spark.index.percolate import percolate

    with pytest.raises(ValueError, match="field-tag"):
        percolate(spark, {"bad": "lang:java AND table"}, docs_df)


def test_percolate_lang_tag_stays_out_of_phrase_stream(spark, token_lists):
    """The synthetic tag extends the token SET only: phrase matching is
    positional over real tokens, so lang_col must not perturb it."""
    from mahout_spark.index.percolate import percolate

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text", "lang")
    )
    qs = {"ph": '"table scan" OR vector'}
    with_tag = {(r["doc_id"], r["query_id"]) for r in percolate(
        spark, qs, docs, lang_col="lang").collect()}
    assert with_tag == _want(qs, token_lists)


# -- prefilter tier (the 10^5-registry regime) --------------------------------


def test_required_cover_rules():
    from mahout_spark.index import queryparse as qp
    from mahout_spark.index.percolate import required_cover

    cov = lambda q: required_cover(qp.parse(q))
    # AND picks one child; singleton tie broken toward the LONGER term
    assert cov("table AND data") == frozenset({"table"})
    assert cov("table OR data") == frozenset({"table", "data"})
    assert cov('"table scan" OR vector') == frozenset({"table", "vector"})
    assert cov("table AND mer*") == frozenset({"table"})  # AND picks coverable
    assert cov("mer* OR table") is None  # OR poisoned by pattern branch
    assert cov("slot~2") is None
    assert cov("table NOT data") == frozenset({"table"})
    # an OR branch that is pure negation poisons the cover (tree-level;
    # the parser itself rejects this shape)
    assert required_cover(
        ("or", [("not", ("term", "data")), ("term", "table")])
    ) is None
    m = qp.with_minimum_should_match(qp.parse("a OR b OR c"), 2)
    assert required_cover(m) == frozenset({"a", "b", "c"})


def test_prefiltered_parity_small_registry(spark, docs_df, token_lists):
    """Exact parity with the compiled evaluator on every leaf kind."""
    from mahout_spark.index.percolate import percolate, percolate_prefiltered

    full = {(r["doc_id"], r["query_id"])
            for r in percolate(spark, QUERIES, docs_df).collect()}
    pre = {(r["doc_id"], r["query_id"])
           for r in percolate_prefiltered(spark, QUERIES, docs_df).collect()}
    assert pre == full == _want(QUERIES, token_lists)

    kw = dict(synonyms={"join": ["merge"]}, minimum_should_match=0)
    qs = {"s": "join AND data"}
    a = {(r["doc_id"], r["query_id"])
         for r in percolate(spark, qs, docs_df, **kw).collect()}
    b = {(r["doc_id"], r["query_id"])
         for r in percolate_prefiltered(spark, qs, docs_df, **kw).collect()}
    assert a == b


def test_prefiltered_parity_10k_registry(spark, docs_df):
    """Round-3 VERDICT ask #4 'done' gate: parity vs full evaluation on a
    10^4-rule registry (full evaluator runs in compiled chunks — same
    evaluator, bounded codegen width)."""
    from mahout_spark.index.percolate import percolate, percolate_prefiltered

    vocab = ["table", "scan", "data", "merge", "stream", "query", "filter",
             "group", "join", "sort", "vector", "hash", "key", "value",
             "batch", "row", "window", "index", "node", "graph"]
    V = len(vocab)
    qs = {}
    for i in range(10_000):
        a, b, c = vocab[i % V], vocab[(i // V) % V], vocab[(i * 7 + 3) % V]
        shape = i % 5
        if shape == 0:
            qs[f"q{i}"] = f"{a} AND {b}"
        elif shape == 1:
            qs[f"q{i}"] = f"{a} OR {b} AND {c}"
        elif shape == 2:
            qs[f"q{i}"] = f'"{a} {b}" OR {c}'
        elif shape == 3:
            qs[f"q{i}"] = f"{a} NOT {b}"
        else:
            qs[f"q{i}"] = f"{a} AND {b[:3]}*"  # pattern leaf, term cover
    # a residual-set slice: uncoverable rules must still verify
    for i in range(50):
        qs[f"r{i}"] = f"{vocab[i % V][:3]}* AND {vocab[(i + 5) % V]}~1"

    docs100 = docs_df.limit(100).cache()
    docs100.count()
    pre = {(r["doc_id"], r["query_id"])
           for r in percolate_prefiltered(spark, qs, docs100).collect()}
    full = set()
    items = sorted(qs.items())
    for lo in range(0, len(items), 500):
        chunk = dict(items[lo:lo + 500])
        full |= {(r["doc_id"], r["query_id"])
                 for r in percolate(spark, chunk, docs100).collect()}
    docs100.unpersist()
    assert pre == full
    assert len(pre) > 1000  # non-trivial match volume


def test_prefiltered_runs_under_structured_streaming(spark, docs_df,
                                                     tmp_path, token_lists):
    from mahout_spark.index.percolate import percolate_prefiltered

    src = str(tmp_path / "stream_in_pre")
    docs_df.coalesce(2).write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    out = percolate_prefiltered(spark, QUERIES, stream)
    q = (
        out.writeStream.format("memory").queryName("perc_pre_sink")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {(r["doc_id"], r["query_id"])
           for r in spark.table("perc_pre_sink").collect()}
    assert got == _want(QUERIES, token_lists)


def test_prefiltered_field_tags_and_rejections(spark, docs_df):
    from mahout_spark.index.percolate import percolate, percolate_prefiltered

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text", "lang")
    )
    qs = {"jfr": "lang:fr AND table"}
    a = {(r["doc_id"], r["query_id"]) for r in percolate(
        spark, qs, docs, lang_col="lang").collect()}
    b = {(r["doc_id"], r["query_id"]) for r in percolate_prefiltered(
        spark, qs, docs, lang_col="lang").collect()}
    assert a == b and a
    with pytest.raises(ValueError, match="field-tag"):
        percolate_prefiltered(spark, qs, docs_df)
    with pytest.raises(ValueError, match="slop"):
        percolate_prefiltered(spark, {"bad": '"table scan"~3'}, docs_df)


# -- persistent registry (X122, round-4 VERDICT ask #7) ----------------------


def _hits(df):
    return {(r["doc_id"], r["query_id"]) for r in df.collect()}


def test_registry_add_remove_epochs_and_persistence(spark, docs_df,
                                                    tmp_path):
    from mahout_spark.index.percolate import PercolatorRegistry, percolate

    reg = PercolatorRegistry(str(tmp_path / "perc"))
    assert reg.epoch() == 0 and reg.queries() == {}
    e1 = reg.add({"q_and": QUERIES["q_and"], "q_prefix": QUERIES["q_prefix"]})
    assert e1 == 1
    e2 = reg.add({"q_phrase": QUERIES["q_phrase"]})
    assert e2 == 2 and set(reg.queries()) == {"q_and", "q_prefix", "q_phrase"}

    want = _hits(percolate(spark, reg.queries(), docs_df))
    got = _hits(reg.percolate(spark, docs_df))
    assert got == want and got

    # remove drops matches; epoch moves; unknown id fails loudly
    e3 = reg.remove(["q_prefix"])
    assert e3 == 3 and set(reg.queries()) == {"q_and", "q_phrase"}
    got2 = _hits(reg.percolate(spark, docs_df))
    assert got2 == {h for h in want if h[1] != "q_prefix"}
    with pytest.raises(KeyError, match="q_prefix"):
        reg.remove(["q_prefix"])

    # a FRESH instance over the same dir sees identical state
    reg2 = PercolatorRegistry(str(tmp_path / "perc"))
    assert reg2.epoch() == 3 and reg2.queries() == reg.queries()
    assert _hits(reg2.percolate(spark, docs_df)) == got2

    # relational view carries the version stamp on every row
    pdf = reg.as_dataframe(spark).toPandas()
    assert set(pdf["query_id"]) == {"q_and", "q_phrase"}
    assert set(pdf["epoch"]) == {3}


def test_registry_validates_at_add_time(spark, tmp_path):
    from mahout_spark.index.percolate import PercolatorRegistry

    reg = PercolatorRegistry(str(tmp_path / "perc"))
    reg.add({"ok": "table AND data"})
    with pytest.raises(Exception):
        reg.add({"ok2": "scan OR merge", "bad": '"a b"~2'})  # slop leaf
    # the WHOLE batch was rejected: no partial write, epoch unchanged
    assert reg.epoch() == 1 and set(reg.queries()) == {"ok"}
    with pytest.raises(Exception):
        reg.add({"bad": "lang:java AND x"})  # field tag without lang_col
    assert reg.epoch() == 1


def test_registry_prefilter_parity_and_epoch_memo(spark, docs_df,
                                                  tmp_path):
    from mahout_spark.index import percolate as perc

    reg = perc.PercolatorRegistry(str(tmp_path / "perc"))
    reg.add(dict(QUERIES))
    a = _hits(reg.percolate(spark, docs_df, prefiltered=True))
    b = _hits(reg.percolate(spark, docs_df, prefiltered=False))
    c = _hits(perc.percolate(spark, dict(QUERIES), docs_df))
    assert a == b == c and a
    # epoch-memoized compile: a second prefiltered call reuses the
    # cached registry compile (same object), a mutation invalidates it
    first = reg._compiled
    _ = reg.percolate(spark, docs_df, prefiltered=True)
    assert reg._compiled is first
    reg.add({"extra": "vector OR stream"})
    _ = reg.percolate(spark, docs_df, prefiltered=True)
    assert reg._compiled is not first


def test_registry_replay_skips_torn_trailing_line(spark, tmp_path):
    from mahout_spark.index.percolate import PercolatorRegistry

    reg = PercolatorRegistry(str(tmp_path / "perc"))
    reg.add({"ok": "table AND data"})
    with open(reg._path, "a") as f:  # crashed writer: half a JSON row
        f.write('{"op": "add", "query_id": "half')
    assert reg.queries() == {"ok": "table AND data"}
    assert reg.add({"more": "scan OR merge"}) == 2
    assert set(reg.queries()) == {"ok", "more"}
