"""Cross-document line dedup / boilerplate removal (X132/X133) and
DSIR importance weights (X134) — hand traces, threshold edges, and a
pure-python log2 oracle."""

import math
import re
from collections import Counter

import pytest

from mahout_spark.operators.curation import (
    boilerplate_lines,
    dedup_lines,
    dsir_sample,
    dsir_weights,
    line_dedup_stats,
    remove_boilerplate,
)

LINE_DOCS = [
    (1, "aa bb\ncommon line\naa bb"),   # intra-doc dup of "aa bb"
    (2, "common line\nunique two"),     # cross-doc dup (first is doc 1)
    (3, "\ncommon line\n\nunique three"),  # empty lines at li 0 and 2
    (4, None),                          # excluded
    (5, ""),                            # zero non-empty lines
]


def _line_df(spark):
    return spark.createDataFrame(LINE_DOCS, "doc_id long, text string")


def test_dedup_lines_hand_trace(spark):
    rows = {r["doc_id"]: r for r in dedup_lines(_line_df(spark)).collect()}
    assert set(rows) == {1, 2, 3, 5}  # NULL text excluded
    # first occurrence wins corpus-wide, ordered by (doc_id, li):
    # doc 1 keeps "aa bb"@0 and "common line"@1, drops "aa bb"@2
    assert (rows[1]["n_lines"], rows[1]["n_lines_kept"]) == (3, 2)
    assert rows[1]["clean_text"] == "aa bb\ncommon line"
    # doc 2's "common line" already seen in doc 1
    assert (rows[2]["n_lines"], rows[2]["n_lines_kept"]) == (2, 1)
    assert rows[2]["clean_text"] == "unique two"
    # empty lines don't count and don't shift positions
    assert (rows[3]["n_lines"], rows[3]["n_lines_kept"]) == (2, 1)
    assert rows[3]["clean_text"] == "unique three"
    assert (rows[5]["n_lines"], rows[5]["n_lines_kept"]) == (0, 0)
    assert rows[5]["clean_text"] == ""


def test_line_dedup_stats(spark):
    s = line_dedup_stats(dedup_lines(_line_df(spark))).collect()[0]
    assert s.asDict() == {
        "docs_in": 4, "lines_in": 7, "lines_kept": 4, "lines_dropped": 3,
    }


def test_boilerplate_threshold_edges(spark):
    docs = _line_df(spark)
    # "common line" is in 3 distinct docs; "aa bb" in 1 (twice)
    at3 = {r["line"]: r["df"] for r in
           boilerplate_lines(docs, min_df=3).collect()}
    assert at3 == {"common line": 3}
    assert boilerplate_lines(docs, min_df=4).count() == 0
    # intra-doc repetition is NOT df: "aa bb" has df 1
    at1 = {r["line"]: r["df"] for r in
           boilerplate_lines(docs, min_df=1).collect()}
    assert at1["aa bb"] == 1


def test_remove_boilerplate_drops_every_copy(spark):
    rows = {r["doc_id"]: r for r in
            remove_boilerplate(_line_df(spark), min_df=3).collect()}
    # unlike dedup_lines, doc 1's copy of the boilerplate drops too —
    # but its intra-doc "aa bb" duplicate (df 1) survives twice
    assert rows[1]["clean_text"] == "aa bb\naa bb"
    assert (rows[1]["n_lines"], rows[1]["n_lines_kept"]) == (3, 2)
    assert rows[2]["clean_text"] == "unique two"
    assert rows[3]["clean_text"] == "unique three"
    assert rows[5]["clean_text"] == ""


def test_line_ops_reject(spark):
    docs = _line_df(spark)
    with pytest.raises(ValueError, match="min_df"):
        boilerplate_lines(docs, min_df=0)
    with pytest.raises(ValueError, match="min_df"):
        remove_boilerplate(docs, min_df=0)
    with pytest.raises(ValueError, match="k must"):
        dsir_sample(docs, k=0)


# ---------------------------------------------------------------------------
# DSIR (X134)
# ---------------------------------------------------------------------------

DSIR_DOCS = [
    (10, "spark query engine spark"),      # target slice (% 10 == 0)
    (20, "query engine shuffle"),          # target slice
    (1, "spark query engine plan"),        # target-like -> high ratio
    (2, "zz yy xx ww vv"),                 # all off-target -> low ratio
    (3, "shuffle spark"),
]


def _tok(text):
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _py_dsir(docs, target_mod=10, alpha=1.0):
    def lm(subset):
        cnt = Counter(t for _, x in subset for t in _tok(x))
        tot, v = sum(cnt.values()), len(cnt)
        denom = tot + alpha * (v + 1)
        return (
            {t: math.log2((c + alpha) / denom) for t, c in cnt.items()},
            math.log2(alpha / denom),
        )

    lm_t, oov_t = lm([d for d in docs if d[0] % target_mod == 0])
    lm_r, oov_r = lm(docs)
    out = {}
    for did, text in docs:
        tf = Counter(_tok(text))
        cum = 0.0
        for term in sorted(tf):  # the engine's term-ordered fold
            cum += tf[term] * (lm_t.get(term, oov_t)
                               - lm_r.get(term, oov_r))
        out[did] = (sum(tf.values()), round(cum, 6))
    return out


def test_dsir_weights_match_python_oracle(spark):
    docs = spark.createDataFrame(DSIR_DOCS, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["logratio"])
           for r in dsir_weights(docs).collect()}
    want = _py_dsir(DSIR_DOCS)
    assert set(got) == set(want)
    for did in want:
        assert got[did][0] == want[did][0]
        assert got[did][1] == pytest.approx(want[did][1], abs=2e-6)
    # the engine's ranking agrees with the oracle's exactly
    rank = lambda d: sorted(d, key=lambda k: (-d[k][1], k))  # noqa: E731
    assert rank(got) == rank(want)
    # a target-slice member scores target-like (positive ratio)
    assert got[10][1] > 0


def test_dsir_sample_is_ordered_topk(spark):
    docs = spark.createDataFrame(DSIR_DOCS, "doc_id long, text string")
    full = sorted(
        ((r["logratio"], r["doc_id"]) for r in
         dsir_weights(docs).collect()),
        key=lambda x: (-x[0], x[1]),
    )
    got = [(r["logratio"], r["doc_id"])
           for r in dsir_sample(docs, k=3).collect()]
    assert got == full[:3]
