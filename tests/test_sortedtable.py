"""Index-time sorting (X92, operators/sortedtable.py): early-terminated
prefix ≡ full sort, adaptive escalation under filters, NULL exclusion,
and the partition-pruning plan gate."""

import pytest
from pyspark.sql import functions as F

from mahout_spark.operators.sortedtable import (
    sorted_scan_topk,
    write_sorted_table,
)
from mahout_spark.plans.audit import capture_plan


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


@pytest.fixture(scope="module")
def sorted_path(docs, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sorted") / "bychars")
    write_sorted_table(docs, "n_chars", out, n_buckets=16)
    return out


def _full_sort(docs, k, desc=False, pred=None):
    d = docs.filter(F.col("n_chars").isNotNull())
    if pred is not None:
        d = d.filter(pred)
    o = [F.col("n_chars").desc() if desc else F.col("n_chars").asc(),
         F.col("doc_id").asc()]
    return [(r["doc_id"], r["n_chars"])
            for r in d.orderBy(*o).limit(k).collect()]


def test_prefix_scan_equals_full_sort(spark, docs, sorted_path):
    for k in (5, 20, 100):
        for desc in (False, True):
            got = [(r["doc_id"], r["n_chars"]) for r in
                   sorted_scan_topk(spark, sorted_path, k=k,
                                    descending=desc).collect()]
            assert got == _full_sort(docs, k, desc), (k, desc)


def test_scan_prunes_partitions(spark, sorted_path):
    import re

    plan = capture_plan(sorted_scan_topk(spark, sorted_path, k=5))
    pf = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    # the k=5 prefix constrains sbucket to a strict subset of the 16
    # buckets (a 1-bucket prefix compiles to `=`, wider ones to IN)
    m = (re.search(r"sbucket#\d+ = (\d+)", pf)
         or re.search(r"sbucket#\d+ IN \(([^)]*)\)", pf))
    assert m, pf
    assert len(m.group(1).split(",")) < 16


def test_filtered_scan_escalates(spark, docs, sorted_path):
    # lang='zh' is ~15% of docs: the unfiltered k-prefix cannot hold
    # k matches, forcing the adaptive doubling
    pred = "lang = 'zh'"
    got = [(r["doc_id"], r["n_chars"]) for r in
           sorted_scan_topk(spark, sorted_path, k=30,
                            pred=pred).collect()]
    assert got == _full_sort(docs, 30, pred=F.col("lang") == "zh")
    assert len(got) == 30
    # Column predicate form agrees with the SQL string form
    got2 = [(r["doc_id"], r["n_chars"]) for r in
            sorted_scan_topk(spark, sorted_path, k=30,
                             pred=F.col("lang") == "zh").collect()]
    assert got2 == got


def test_filter_larger_than_table_returns_all_matches(spark, docs,
                                                      sorted_path):
    got = sorted_scan_topk(spark, sorted_path, k=10,
                           pred="lang = 'no_such'").collect()
    assert got == []


def test_nulls_excluded(spark, tmp_path):
    rows = [(0, 10), (1, None), (2, 5), (3, None), (4, 7)]
    d = spark.range(0).sparkSession.createDataFrame(
        rows, "doc_id long, n_chars long")
    out = str(tmp_path / "withnulls")
    write_sorted_table(d, "n_chars", out, n_buckets=4)
    got = [r["doc_id"] for r in
           sorted_scan_topk(spark, out, k=10).collect()]
    assert got == [2, 4, 0]  # NULL rows never surface


def test_skewed_values_share_a_bucket(spark, tmp_path):
    # one dominant value: duplicate cut points must merge, ties stay
    # inside one bucket, and the prefix scan stays exact
    rows = [(i, 42) for i in range(50)] + [(100, 1), (101, 99)]
    d = spark.createDataFrame(rows, "doc_id long, n_chars long")
    out = str(tmp_path / "skew")
    write_sorted_table(d, "n_chars", out, n_buckets=8)
    got = [(r["doc_id"], r["n_chars"]) for r in
           sorted_scan_topk(spark, out, k=3).collect()]
    assert got == [(100, 1), (0, 42), (1, 42)]


def test_rejects(spark, docs, tmp_path, sorted_path):
    with pytest.raises(ValueError, match="n_buckets"):
        write_sorted_table(docs, "n_chars", str(tmp_path / "x"),
                           n_buckets=0)
    with pytest.raises(ValueError, match="k must be"):
        sorted_scan_topk(spark, sorted_path, k=0)
