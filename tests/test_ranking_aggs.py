"""Sort-by-field retrieval, function_score blending, the count /
cardinality / percentiles / composite / top_hits aggregations, per-doc
term vectors, and the calendar date_histogram (X76-X81, X87-X89, X91):
parity vs brute-force/pandas oracles, cursor reassembly, NULL
semantics, and the forward-index plan gate."""

import math

import pytest
from pyspark.sql import functions as F

from mahout_spark.index.aggs import facet_cardinality, match_count
from mahout_spark.index.boolquery import score_matches
from mahout_spark.index.build import build_index
from mahout_spark.index.diag import term_vectors
from mahout_spark.index.ranking import function_score_topk, sorted_topk
from mahout_spark.operators.timeseries import date_histogram
from mahout_spark.plans.audit import capture_plan, pushed_filters
from tests.oracle import OracleIndex, simple_tokenize


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


@pytest.fixture(scope="module")
def built(spark, docs, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("rankidx"))
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
    return {r["doc_id"]: (r["n_chars"], r["lang"], r["source"])
            for r in docs.collect()}


def _match(oracle, q):
    return {d for d, _ in oracle.boolean_search(q, k=10**9)}


# ------------------------------------------------------------- sorted_topk

def test_sorted_topk_matches_python_sort(spark, built, docs, oracle, meta):
    q = "spark OR data OR query"
    got = [(r["doc_id"], r["n_chars"]) for r in
           sorted_topk(spark, built, docs, q, "-n_chars", k=15).collect()]
    want = sorted(((d, meta[d][0]) for d in _match(oracle, q)),
                  key=lambda x: (-x[1], x[0]))[:15]
    assert got == want


def test_sorted_topk_mixed_directions(spark, built, docs, oracle, meta):
    q = "table OR scan"
    rows = sorted_topk(spark, built, docs, q,
                       [("lang", "asc"), ("n_chars", "desc")], k=12).collect()
    got = [(r["doc_id"], r["lang"], r["n_chars"]) for r in rows]
    want = sorted(((d, meta[d][1], meta[d][0]) for d in _match(oracle, q)),
                  key=lambda x: (x[1], -x[2], x[0]))[:12]
    assert got == want


def test_sorted_topk_cursor_reassembles(spark, built, docs):
    q = "spark OR data OR query"
    deep = sorted_topk(spark, built, docs, q, "-n_chars", k=20).collect()
    p1 = sorted_topk(spark, built, docs, q, "-n_chars", k=10).collect()
    p2 = sorted_topk(spark, built, docs, q, "-n_chars", k=10,
                     after=p1[-1]).collect()
    assert [tuple(r) for r in p1 + p2] == [tuple(r) for r in deep]


def test_sorted_topk_null_rows_excluded(spark, tmp_path):
    rows = [(0, "alpha beta", 10), (1, "alpha beta", None),
            (2, "alpha gamma", 99)]
    d = spark.createDataFrame(rows, ["doc_id", "text", "n_chars"])
    cat = build_index(
        spark, d, str(tmp_path / "nullsort"), content_col="text",
        id_cols=["doc_id"], mode="simple", n_buckets=2,
        docs_per_shard=8, block_size=4,
    )
    got = [r["doc_id"] for r in
           sorted_topk(spark, cat, d, "alpha", "-n_chars").collect()]
    assert got == [2, 0]


def test_sorted_topk_rejects(spark, built, docs):
    with pytest.raises(ValueError, match="asc|desc"):
        sorted_topk(spark, built, docs, "spark", [("n_chars", "down")])
    with pytest.raises(ValueError, match="non-NULL"):
        sorted_topk(spark, built, docs, "spark", "-n_chars",
                    after=(None, 3))


# ------------------------------------------------------ function_score

@pytest.mark.parametrize("modifier,boost_mode,fn", [
    ("log1p", "multiply", lambda v: math.log1p(0.01 * v)),
    ("sqrt", "sum", lambda v: math.sqrt(0.01 * v)),
    ("none", "multiply", lambda v: 0.01 * v),
])
def test_function_score_manual_recompute(spark, built, docs, meta,
                                         modifier, boost_mode, fn):
    q = "spark OR data OR query"
    bm25 = {r["doc_id"]: r["score"]
            for r in score_matches(spark, built, q).collect()}
    want = []
    for d, s in bm25.items():
        v = 2.0 * fn(meta[d][0])
        want.append((d, s * v if boost_mode == "multiply" else s + v))
    want.sort(key=lambda x: (-x[1], x[0]))
    got = function_score_topk(
        spark, built, docs, q, "n_chars", k=10, factor=0.01,
        modifier=modifier, weight=2.0, boost_mode=boost_mode,
    ).collect()
    assert [r["doc_id"] for r in got] == [w[0] for w in want[:10]]
    for g, w in zip(got, want):
        assert g["score"] == pytest.approx(w[1], rel=1e-12)
        assert g["bm25"] == pytest.approx(bm25[g["doc_id"]], abs=0)


def test_function_score_missing_field_value(spark, tmp_path):
    rows = [(0, "alpha beta", 4.0), (1, "alpha beta", None)]
    d = spark.createDataFrame(rows, ["doc_id", "text", "sig"])
    cat = build_index(
        spark, d, str(tmp_path / "fsmiss"), content_col="text",
        id_cols=["doc_id"], mode="simple", n_buckets=2,
        docs_per_shard=8, block_size=4,
    )
    got = {r["doc_id"]: r["fn"] for r in function_score_topk(
        spark, cat, d, "alpha", "sig", modifier="none", missing=9.0,
    ).collect()}
    assert got[0] == pytest.approx(4.0)
    assert got[1] == pytest.approx(9.0)  # NULL -> missing, not NaN


def test_function_score_rejects(spark, built, docs):
    with pytest.raises(ValueError, match="modifier"):
        function_score_topk(spark, built, docs, "spark", "n_chars",
                            modifier="exp")
    with pytest.raises(ValueError, match="boost_mode"):
        function_score_topk(spark, built, docs, "spark", "n_chars",
                            boost_mode="max")


# ------------------------------------------------- count / cardinality

@pytest.mark.parametrize("q", [
    "spark OR data", "table AND scan", "mer* AND data",
    '("table scan" OR merge) NOT stream',
])
def test_match_count(spark, built, oracle, q):
    got = match_count(spark, built, q).collect()
    assert got[0]["n_matches"] == len(_match(oracle, q))


def test_facet_cardinality_exact(spark, built, docs, oracle, meta):
    q = "spark OR data"
    m = _match(oracle, q)
    got = facet_cardinality(
        spark, built, docs, q, ["lang", "source"]).collect()[0]
    assert got["lang_cardinality"] == len({meta[d][1] for d in m})
    assert got["source_cardinality"] == len({meta[d][2] for d in m})


def test_facet_cardinality_approx_close(spark, built, docs, oracle, meta):
    q = "spark OR data"
    m = _match(oracle, q)
    exact = len({meta[d][2] for d in m})
    got = facet_cardinality(
        spark, built, docs, q, ["source"], approx=True, rsd=0.05,
    ).collect()[0]["source_cardinality"]
    assert abs(got - exact) <= max(1, 0.15 * exact)


def test_facet_cardinality_rejects_empty(spark, built, docs):
    with pytest.raises(ValueError, match="at least one column"):
        facet_cardinality(spark, built, docs, "spark", [])


# ------------------------------------------------------- term vectors

def test_term_vectors_match_token_counts(spark, built, docs, oracle):
    from collections import Counter

    rows = docs.select("doc_id", "text").orderBy("doc_id").limit(2).collect()
    ids = [r["doc_id"] for r in rows]
    got = term_vectors(spark, built, ids).collect()
    by_doc: dict = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], {})[r["term"]] = (
            r["tf"], r["doclen"], r["df"]
        )
    for r in rows:
        toks = simple_tokenize(r["text"])
        want = Counter(toks)
        have = by_doc[r["doc_id"]]
        assert {t: tf for t, (tf, _, _) in have.items()} == dict(want)
        for t, (tf, dl, df) in have.items():
            assert dl == len(toks)
            assert df == oracle.df[t]
    # ordered (doc_id, term)
    assert [(r["doc_id"], r["term"]) for r in got] == sorted(
        (r["doc_id"], r["term"]) for r in got
    )


def test_term_vectors_plan_pushes_doc_filter(spark, built):
    tv = term_vectors(spark, built, [3, 7], include_df=False)
    plan = capture_plan(tv)
    assert any("doc_id" in p for p in pushed_filters(plan))
    with pytest.raises(ValueError, match="at least one doc_id"):
        term_vectors(spark, built, [])


# ----------------------------------------------------- date histogram

@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet("/root/testdata/sf0.001/events.parquet")


@pytest.mark.parametrize("interval,trunc", [
    ("day", lambda t: t.replace(hour=0, minute=0, second=0, microsecond=0)),
    ("month", lambda t: t.replace(day=1, hour=0, minute=0, second=0,
                                  microsecond=0)),
])
def test_date_histogram_matches_pandas(spark, events, interval, trunc):
    got = {r["bucket"]: (r["n_events"], r["sum_value"]) for r in
           date_histogram(events, "ts", interval, "value").collect()}
    rows = events.select("ts", "value").collect()
    want: dict = {}
    for r in rows:
        b = trunc(r["ts"])
        n, s = want.get(b, (0, 0.0))
        want[b] = (n + 1, s + r["value"])
    assert set(got) == set(want)
    for b, (n, s) in want.items():
        assert got[b][0] == n
        assert got[b][1] == pytest.approx(round(s, 6), abs=1e-6)


def test_date_histogram_group_col(spark, events):
    got = date_histogram(events, "ts", "month", group_col="event_type")
    rows = got.collect()
    total = sum(r["n_events"] for r in rows)
    assert total == events.count()
    # ordered (bucket, group)
    keys = [(r["bucket"], r["event_type"]) for r in rows]
    assert keys == sorted(keys)


def test_date_histogram_null_ts_excluded(spark):
    import datetime as dt

    rows = [(dt.datetime(2024, 1, 1, 5), 1.0), (None, 2.0),
            (dt.datetime(2024, 1, 1, 9), 3.0)]
    df = spark.createDataFrame(rows, ["ts", "value"])
    got = date_histogram(df, "ts", "day", "value").collect()
    assert len(got) == 1 and got[0]["n_events"] == 2


def test_date_histogram_rejects_interval(spark, events):
    with pytest.raises(ValueError, match="interval"):
        date_histogram(events, "ts", "fortnight")


# --------------------- percentiles / composite / top_hits (X87-X89)

def test_facet_percentiles_exact_matches_python(spark, built, docs,
                                                oracle, meta):
    q = "spark OR data OR query"
    vals = sorted(meta[d][0] for d in _match(oracle, q))

    def q_cont(p):  # linear interpolation (SQL quantile_cont)
        h = (len(vals) - 1) * p
        lo, hi = int(math.floor(h)), int(math.ceil(h))
        return vals[lo] + (h - lo) * (vals[hi] - vals[lo])

    from mahout_spark.index.aggs import facet_percentiles

    row = facet_percentiles(
        spark, built, docs, q, "n_chars", (0.25, 0.5, 0.75, 0.99),
    ).first()
    assert row["p25"] == pytest.approx(round(q_cont(0.25), 6), abs=1e-6)
    assert row["p50"] == pytest.approx(round(q_cont(0.5), 6), abs=1e-6)
    assert row["p75"] == pytest.approx(round(q_cont(0.75), 6), abs=1e-6)
    assert row["p99"] == pytest.approx(round(q_cont(0.99), 6), abs=1e-6)


def test_facet_percentiles_approx_regime(spark, built, docs):
    from mahout_spark.index.aggs import facet_percentiles

    q = "spark OR data OR query"
    exact = facet_percentiles(spark, built, docs, q, "n_chars",
                              (0.5,)).first()["p50"]
    approx = facet_percentiles(spark, built, docs, q, "n_chars", (0.5,),
                               approx=True).first()["p50"]
    # GK sketch at accuracy=10^4 on a few hundred rows is near-exact
    assert approx == pytest.approx(exact, rel=0.05)
    with pytest.raises(ValueError, match="percentiles"):
        facet_percentiles(spark, built, docs, q, "n_chars", (1.5,))


def _py_composite(oracle, meta, q, width):
    from collections import Counter

    c = Counter()
    for d in _match(oracle, q):
        n_chars, lang, _ = meta[d]
        c[(lang, math.floor(n_chars / width) * width)] += 1
    return c


def test_composite_pages_tile_the_bucket_space(spark, built, docs,
                                               oracle, meta):
    from mahout_spark.index.aggs import composite_agg

    q = "table OR scan OR data"
    want = _py_composite(oracle, meta, q, 100.0)
    pages, after = [], None
    while True:
        page = composite_agg(
            spark, built, docs, q, ["lang", ("n_chars", 100.0)],
            size=4, after=after,
        ).collect()
        if not page:
            break
        pages.extend(page)
        after = (page[-1]["lang"], page[-1]["n_chars"])
        if len(page) < 4:
            break
    got = {(r["lang"], r["n_chars"]): r["doc_count"] for r in pages}
    assert got == {k: v for k, v in want.items()}
    # pages arrive in strict key order with no overlap
    keys = [(r["lang"], r["n_chars"]) for r in pages]
    assert keys == sorted(keys) and len(keys) == len(set(keys))


def test_composite_rejects(spark, built, docs):
    from mahout_spark.index.aggs import composite_agg

    with pytest.raises(ValueError, match="source"):
        composite_agg(spark, built, docs, "spark", [], size=4)
    with pytest.raises(ValueError, match="size"):
        composite_agg(spark, built, docs, "spark", ["lang"], size=0)
    with pytest.raises(ValueError, match="width"):
        composite_agg(spark, built, docs, "spark", [("n_chars", 0)])


def test_top_hits_matches_python_recompute(spark, built, docs, meta):
    from mahout_spark.index.aggs import top_hits_agg

    q = "table OR scan"
    bm25 = {r["doc_id"]: r["score"]
            for r in score_matches(spark, built, q).collect()}
    by_group = {}
    for d, s in bm25.items():
        by_group.setdefault(meta[d][1], []).append((d, s))
    top = sorted(by_group, key=lambda g: (-len(by_group[g]), g))[:2]
    want = []
    for g in top:
        hits = sorted(by_group[g], key=lambda x: (-x[1], x[0]))[:3]
        want += [(g, len(by_group[g]), i + 1, d, round(s, 6))
                 for i, (d, s) in enumerate(hits)]
    got = [(r["lang"], r["doc_count"], r["rank"], r["doc_id"], r["score"])
           for r in top_hits_agg(spark, built, docs, q, "lang",
                                 n_buckets=2, size=3).collect()]
    assert got == want


def test_top_hits_null_group_skipped_and_rejects(spark, built, tmp_path):
    from mahout_spark.index.aggs import top_hits_agg

    d2 = spark.createDataFrame(
        [(1, "alpha beta", None), (2, "alpha gamma", "en")],
        "doc_id long, text string, lang string",
    )
    cat = build_index(spark, d2, str(tmp_path / "nulgrp"),
                      content_col="text", id_cols=["doc_id"],
                      mode="simple", resume=False)
    rows = top_hits_agg(spark, cat, d2, "alpha", "lang").collect()
    assert [r["doc_id"] for r in rows] == [2]  # NULL bucket skipped
    with pytest.raises(ValueError, match="n_buckets"):
        top_hits_agg(spark, cat, d2, "alpha", "lang", n_buckets=0)


def test_extended_stats_matches_python(spark, built, docs, oracle, meta):
    from mahout_spark.index.aggs import extended_stats

    q = "spark OR data OR query"
    vals = [meta[d][0] for d in _match(oracle, q)]
    n, s = len(vals), float(sum(vals))
    qq = float(sum(v * v for v in vals))
    row = extended_stats(spark, built, docs, q, "n_chars").first()
    assert row["n_values"] == n
    assert row["min_value"] == min(vals)
    assert row["max_value"] == max(vals)
    assert row["sum_value"] == pytest.approx(round(s, 6), abs=1e-6)
    assert row["avg_value"] == pytest.approx(round(s / n, 6), abs=1e-6)
    var = qq / n - (s / n) * (s / n)
    assert row["variance"] == pytest.approx(round(var, 6), abs=1e-6)
    assert row["std_deviation"] == pytest.approx(
        round(math.sqrt(var), 6), abs=1e-6)


def test_bucket_pipeline_matches_python(spark, events):
    from mahout_spark.operators.timeseries import (
        bucket_pipeline,
        date_histogram,
    )

    h = date_histogram(events, "ts", "day", "value")
    base = [(r["bucket"], r["sum_value"]) for r in h.collect()]
    base.sort()
    vals = [v for _, v in base]
    got = bucket_pipeline(h, "sum_value", window=3).collect()
    assert [r["bucket"] for r in got] == [b for b, _ in base]
    for i, r in enumerate(got):
        if i == 0:
            assert r["derivative"] is None  # ES: no derivative for bucket 0
        else:
            assert r["derivative"] == pytest.approx(
                round(vals[i] - vals[i - 1], 6), abs=1e-6)
        assert r["cumulative_sum"] == pytest.approx(
            round(sum(vals[:i + 1]), 6), abs=1e-6)
        w = vals[max(0, i - 2):i + 1]
        assert r["moving_avg"] == pytest.approx(
            round(sum(w) / len(w), 6), abs=1e-6)


def test_bucket_selector_and_sort_match_python(spark, events):
    from mahout_spark.operators.timeseries import (
        bucket_selector,
        bucket_sort,
        date_histogram,
    )

    h = date_histogram(events, "ts", "day", "value")
    rows = [(r["bucket"], r["n_events"], r["sum_value"])
            for r in h.collect()]
    thr = sorted(n for _, n, _ in rows)[len(rows) // 2]  # keeps some
    kept = [r for r in rows if r[1] >= thr]
    exp = sorted(kept, key=lambda r: (-r[2], r[0]))[1:1 + 4]
    got = bucket_sort(
        bucket_selector(h, f"n_events >= {thr}"),
        sort=[("sum_value", "desc")], size=4, offset=1,
    ).collect()
    assert [(r["bucket"], r["n_events"], r["sum_value"]) for r in got] == exp
    # truncate-only mode: no sort => bucket-key order
    got2 = bucket_sort(bucket_selector(h, f"n_events >= {thr}"),
                       size=3).collect()
    assert [r["bucket"] for r in got2] == sorted(
        b for b, _, _ in kept)[:3]


def test_bucket_sort_rejects(spark, events):
    from mahout_spark.operators.timeseries import (
        bucket_sort,
        date_histogram,
    )

    h = date_histogram(events, "ts", "day", "value")
    with pytest.raises(ValueError, match="size"):
        bucket_sort(h, size=0)
    with pytest.raises(ValueError, match="offset"):
        bucket_sort(h, offset=-1)
    with pytest.raises(ValueError, match="direction"):
        bucket_sort(h, sort=[("n_events", "down")])


def test_bucket_pipeline_rejects(spark, events):
    from mahout_spark.operators.timeseries import (
        bucket_pipeline,
        date_histogram,
    )

    h = date_histogram(events, "ts", "day", "value")
    with pytest.raises(ValueError, match="metrics"):
        bucket_pipeline(h, "sum_value", metrics=("median",))
    with pytest.raises(ValueError, match="window"):
        bucket_pipeline(h, "sum_value", window=0)


def test_bucket_stats_matches_python(spark, events):
    from mahout_spark.operators.timeseries import bucket_stats, date_histogram

    h = date_histogram(events, "ts", "day", "value")
    rows = [(r["bucket"], r["sum_value"]) for r in h.collect()]
    vals = [v for _, v in rows]
    got = bucket_stats(h, "sum_value").first()
    assert got["n_buckets"] == len(vals)
    assert got["min_value"] == pytest.approx(round(min(vals), 6))
    assert got["max_value"] == pytest.approx(round(max(vals), 6))
    assert got["avg_value"] == pytest.approx(round(sum(vals) / len(vals), 6))
    assert got["sum_value"] == pytest.approx(round(sum(vals), 6), abs=1e-6)
    assert got["min_bucket"] == min(
        (v, b) for b, v in rows)[1]
    assert got["max_bucket"] == min(
        (-v, b) for b, v in rows)[1]


def test_bucket_stats_null_handling(spark):
    from mahout_spark.operators.timeseries import bucket_stats

    df = spark.createDataFrame(
        [("a", None), ("b", 3.0), ("c", None), ("d", 3.0)],
        "bucket string, m double")
    got = bucket_stats(df, "m").first()
    assert got["n_buckets"] == 2          # NULL metrics skipped
    assert got["min_bucket"] == "b"       # tie -> first key asc
    assert got["max_bucket"] == "b"
    empty = spark.createDataFrame([("a", None)], "bucket string, m double")
    got2 = bucket_stats(empty, "m").first()
    assert got2["n_buckets"] == 0 and got2["min_value"] is None
    assert got2["min_bucket"] is None


def test_bucket_normalize_matches_python(spark, events):
    import statistics

    from mahout_spark.operators.timeseries import (
        bucket_normalize,
        date_histogram,
    )

    h = date_histogram(events, "ts", "day", "value")
    vals = {r["bucket"]: r["sum_value"] for r in h.collect()}
    vs = list(vals.values())
    lo, hi, tot = min(vs), max(vs), sum(vs)
    mu, sd = statistics.mean(vs), statistics.pstdev(vs)
    for method, fn in [
        ("rescale_0_1", lambda v: (v - lo) / (hi - lo)),
        ("percent_of_sum", lambda v: v / tot),
        ("z-score", lambda v: (v - mu) / sd),
    ]:
        got = bucket_normalize(h, "sum_value", method).collect()
        for r in got:
            assert r["normalized"] == pytest.approx(
                round(fn(vals[r["bucket"]]), 6), abs=1e-6), method


def test_bucket_normalize_degenerates(spark):
    from mahout_spark.operators.timeseries import bucket_normalize

    df = spark.createDataFrame(
        [("a", 5.0), ("b", 5.0), ("c", None)], "bucket string, m double")
    r01 = {r["bucket"]: r["normalized"] for r in
           bucket_normalize(df, "m", "rescale_0_1").collect()}
    assert r01 == {"a": None, "b": None, "c": None}  # constant + NULL
    z = {r["bucket"]: r["normalized"] for r in
         bucket_normalize(df, "m", "z-score").collect()}
    assert z == {"a": None, "b": None, "c": None}
    ps = {r["bucket"]: r["normalized"] for r in
          bucket_normalize(df, "m", "percent_of_sum").collect()}
    assert ps == {"a": 0.5, "b": 0.5, "c": None}
    with pytest.raises(ValueError, match="method"):
        bucket_normalize(df, "m", "softmax")


def test_bucket_serial_diff_matches_python(spark, events):
    from mahout_spark.operators.timeseries import (
        bucket_serial_diff,
        date_histogram,
    )

    h = date_histogram(events, "ts", "day", "value")
    base = sorted((r["bucket"], r["sum_value"]) for r in h.collect())
    vals = [v for _, v in base]
    for lag in (1, 7):
        got = bucket_serial_diff(h, "sum_value", lag=lag).collect()
        for i, r in enumerate(got):
            if i < lag:
                assert r["serial_diff"] is None
            else:
                assert r["serial_diff"] == pytest.approx(
                    round(vals[i] - vals[i - lag], 6), abs=1e-6)
    with pytest.raises(ValueError, match="lag"):
        bucket_serial_diff(h, "sum_value", lag=0)


def test_auto_date_histogram_ladder_and_buckets(spark):
    """The finest ladder interval that fits wins; buckets equal the
    fixed-interval histogram at the chosen level; target below every
    level falls back to the coarsest."""
    import datetime as dt

    from mahout_spark.operators.timeseries import (
        auto_date_histogram, date_histogram)

    rows = [(i, dt.datetime(2024, 1, 1 + i % 20, i % 24, 0, 0), float(i))
            for i in range(200)]
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    # hours = 20*...: distinct (day,hour) combos > 20; days = 20 <= 20
    out = auto_date_histogram(ev, "ts", target_buckets=20, value_col="value")
    rowsc = out.collect()
    assert {r["interval"] for r in rowsc} == {"day"}
    fixed = date_histogram(ev, "ts", "day", "value").collect()
    assert [(r["bucket"], r["n_events"], r["sum_value"]) for r in rowsc] == \
        [(r["bucket"], r["n_events"], r["sum_value"]) for r in fixed]
    # one calendar month of data: target 1 picks month, not year
    tiny = auto_date_histogram(ev, "ts", target_buckets=1).collect()
    assert {r["interval"] for r in tiny} == {"month"} and len(tiny) == 1
    # a span no ladder level can fit falls back to the coarsest (year)
    years = spark.createDataFrame(
        [(i, dt.datetime(2000 + i, 6, 1), 1.0) for i in range(5)],
        "event_id long, ts timestamp, value double")
    fb = auto_date_histogram(years, "ts", target_buckets=2).collect()
    assert {r["interval"] for r in fb} == {"year"} and len(fb) == 5
    with pytest.raises(ValueError, match="target_buckets"):
        auto_date_histogram(ev, "ts", target_buckets=0)
