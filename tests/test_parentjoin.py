"""Parent-child joins (X100, operators/parentjoin.py): has_child count
windows + all score modes vs python recompute, has_parent both modes
incl. duplicate-parent dedup, rejects."""

import pytest
from pyspark.sql import functions as F

from mahout_spark.operators.parentjoin import has_child, has_parent


@pytest.fixture(scope="module")
def rel(spark):
    parents = spark.createDataFrame(
        [(1, "p1"), (2, "p2"), (3, "p3"), (4, "p4")],
        "doc_id bigint, name string")
    children = spark.createDataFrame(
        [
            (1, 10, 2.0), (1, 11, 5.0), (1, 12, 1.0),   # 3 children
            (2, 20, 4.0),                                # 1 child
            (3, 30, 3.0), (3, 31, 3.0),                  # 2 children
            (9, 90, 9.0),                                # orphan parent id
        ],
        "parent_id bigint, chunk_id bigint, score double")
    return parents, children


def test_has_child_score_modes(rel):
    parents, children = rel
    for mode, exp in [
        ("sum", {1: 8.0, 2: 4.0, 3: 6.0}),
        ("max", {1: 5.0, 2: 4.0, 3: 3.0}),
        ("avg", {1: round(8.0 / 3, 6), 2: 4.0, 3: 3.0}),
    ]:
        got = has_child(parents, children, score_mode=mode).collect()
        assert {r["doc_id"]: r["score"] for r in got} == exp
        assert [r["doc_id"] for r in got] == sorted(
            exp, key=lambda d: (-exp[d], d))
    none = has_child(parents, children).collect()
    assert [r["doc_id"] for r in none] == [1, 2, 3]
    assert "score" not in none[0].asDict()
    assert {r["doc_id"]: r["n_children"] for r in none} == {1: 3, 2: 1, 3: 2}


def test_has_child_count_window(rel):
    parents, children = rel
    got = has_child(parents, children, min_children=2).collect()
    assert sorted(r["doc_id"] for r in got) == [1, 3]
    got = has_child(
        parents, children, min_children=2, max_children=2).collect()
    assert [r["doc_id"] for r in got] == [3]
    # parent keeps its own columns
    assert got[0]["name"] == "p3"


def test_has_parent_modes(rel, spark):
    parents, children = rel
    pm = parents.filter(F.col("doc_id").isin([1, 3])).withColumn(
        "score", F.col("doc_id") * 1.5)
    semi = has_parent(children, pm).collect()
    assert sorted(r["chunk_id"] for r in semi) == [10, 11, 12, 30, 31]
    assert "parent_score" not in semi[0].asDict()
    scored = has_parent(children, pm, score=True).collect()
    assert {r["chunk_id"]: r["parent_score"] for r in scored} == {
        10: 1.5, 11: 1.5, 12: 1.5, 30: 4.5, 31: 4.5}
    # duplicate parent rows must NOT fan children out (max-score dedup)
    dup = pm.unionByName(pm.withColumn("score", F.col("score") - 1.0))
    deduped = has_parent(children, dup, score=True).collect()
    assert len(deduped) == 5
    assert {r["chunk_id"]: r["parent_score"] for r in deduped} == {
        10: 1.5, 11: 1.5, 12: 1.5, 30: 4.5, 31: 4.5}


def test_rejects(rel):
    parents, children = rel
    with pytest.raises(ValueError, match="score_mode"):
        has_child(parents, children, score_mode="median")
    with pytest.raises(ValueError, match="min_children"):
        has_child(parents, children, min_children=0)
    with pytest.raises(ValueError, match="max_children"):
        has_child(parents, children, min_children=3, max_children=2)
