"""Exact-substring duplicated spans (X125, operators/dedup.py):
hand-computed span traces (cross-doc, within-doc, overlapping-run
merge, adjacency), keep_first semantics, removal action, and the
keep-one-copy property in the non-overlapping regime."""

import pytest
from pyspark.sql import functions as F

from mahout_spark.operators.dedup import (
    duplicated_spans,
    remove_duplicated_spans,
)

DOCS = [
    (1, "a b c d e f g h x1 x2 x3"),            # canonical of a..h @0
    (2, "z1 z2 a b c d e f g h z3"),            # dup of a..h @2
    (3, "u1 u2 u3 u4 u5 u6 u7 u8 u9"),          # unique filler
    (4, "p1 a b c d e f g h i p2"),             # canonical a..h? no: (1,0)<(4,1)
    (5, "a b c d e f g h i"),                   # run of 2 dup shingles
    (6, "m1 m2 m3 m4 m5 m6 m7 m8 q "            # within-doc repeat:
        "m1 m2 m3 m4 m5 m6 m7 m8"),             # canonical @0, dup @9
    (7, ""),                                    # empty doc
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _spans(df):
    return {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_shingles"])
        for r in df.collect()
    }


def test_hand_computed_spans_keep_first(spark, docs):
    got = _spans(duplicated_spans(docs, n=8))
    # a..h occurs at (1,0) (2,2) (4,1) (5,0): canonical (1,0).
    # b..i occurs at (4,2) (5,1): canonical (4,2).
    # m1..m8 occurs at (6,0) (6,9): canonical (6,0).
    # doc5's dup starts {0, 1} merge into one span [0, 9).
    assert got == {
        (2, 2, 10, 1),
        (4, 1, 9, 1),   # (4,1) is a dup of canonical (1,0)
        (5, 0, 9, 2),
        (6, 9, 17, 1),
    }


def test_keep_first_false_reports_every_occurrence(spark, docs):
    got = _spans(duplicated_spans(docs, n=8, keep_first=False))
    assert (1, 0, 8, 1) in got          # the canonical now reported too
    assert (6, 0, 8, 1) in got and (6, 9, 17, 1) in got
    assert (4, 1, 10, 2) in got         # both doc4 windows, merged
    assert not any(d == 3 or d == 7 for d, *_ in got)


def test_adjacent_runs_merge_and_gaps_split(spark):
    # two duplicated runs separated by a gap -> two spans; adjacent
    # (start == prev_end) windows -> one span
    rows = [
        (1, "a1 a2 a3 g1 g2 g3 b1 b2 b3"),
        (2, "a1 a2 a3 q1 q2 q3 b1 b2 b3"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = _spans(duplicated_spans(df, n=3))
    assert got == {(2, 0, 3, 1), (2, 6, 9, 1)}


def test_remove_spans_action_and_property(spark, docs):
    spans = duplicated_spans(docs, n=8)
    cleaned = remove_duplicated_spans(docs, spans)
    by_id = {r["doc_id"]: r for r in cleaned.collect()}
    assert by_id[2]["text_clean"] == "z1 z2 z3"
    assert by_id[2]["n_tokens_removed"] == 8
    assert by_id[5]["text_clean"] == "" and by_id[5]["n_tokens_removed"] == 9
    assert by_id[3]["n_tokens_removed"] == 0
    assert by_id[3]["text_clean"].startswith("u1 u2")
    assert by_id[7]["n_tokens"] == 0 and by_id[7]["n_tokens_removed"] == 0
    # keep-one-copy in the non-overlapping regime: every DUPLICATED
    # 8-gram of the original corpus survives somewhere in the cleaned
    # one (unique grams straddling a span boundary may die — inherent
    # to span removal, same as Lee et al.)
    from collections import Counter

    def gram_counts(texts, n=8):
        c = Counter()
        for t in texts:
            toks = [x for x in t.lower().split() if x]
            c.update(" ".join(toks[i:i + n])
                     for i in range(len(toks) - n + 1))
        return c

    orig = gram_counts([t for _, t in DOCS])
    dup_grams = {g for g, cnt in orig.items() if cnt >= 2}
    kept = set(gram_counts([r["text_clean"] for r in by_id.values()]))
    # non-overlapping duplicates keep exactly one copy:
    assert "a b c d e f g h" in kept          # canonical doc1 untouched
    assert "m1 m2 m3 m4 m5 m6 m7 m8" in kept  # within-doc first copy
    # the documented overlap-erosion caveat, demonstrated: doc4's
    # canonical "b..i" sits inside doc4's removed a..h span, and doc5's
    # copy was removed as a dup — so this one gram dies (Lee et al.'s
    # ExactSubstr has the same property in heavy-duplication regions)
    assert "b c d e f g h i" in dup_grams and "b c d e f g h i" not in kept


def test_rejects_narrow_shingle(spark, docs):
    with pytest.raises(ValueError, match="shingle width"):
        duplicated_spans(docs, n=1)
