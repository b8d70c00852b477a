"""ES ingest-pipeline processors (X151, sources/ingest_pipeline.py):
per-processor semantics, ordering, failure modes, and the one-
projection plan gate."""

import pytest
from pyspark.sql import functions as F

from mahout_spark.plans.audit import capture_plan
from mahout_spark.sources.ingest_pipeline import ingest_pipeline


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(1, "  Hello World  ", "s1", 10),
         (2, None, "s2", None),
         (3, "a,b,,c", None, 7)],
        "doc_id long, text string, source string, n int")


def test_processor_semantics_and_order(spark, docs):
    out = ingest_pipeline(docs, [
        {"set": {"field": "tag", "value": "x"}},
        {"trim": {"field": "text"}},
        {"lowercase": {"field": "text", "target_field": "lc"}},
        {"gsub": {"field": "lc", "pattern": "l+", "replacement": "L"}},
        {"split": {"field": "text", "separator": ","}},
        {"join": {"field": "text", "separator": "|"}},
        {"convert": {"field": "n", "type": "double"}},
        {"rename": {"field": "source", "target_field": "src"}},
    ])
    rows = {r["doc_id"]: r for r in out.collect()}
    r1 = rows[1]
    assert r1["tag"] == "x"
    # trim ran BEFORE lowercase (order matters), gsub saw lc's output
    assert r1["lc"] == "heLo worLd"
    assert r1["text"] == "Hello World"  # split+join round-trip, trimmed
    assert r1["n"] == 10.0 and isinstance(r1["n"], float)
    assert r1["src"] == "s1" and "source" not in out.columns
    # NULLs flow through as NULL (the documented SQL convention)
    r2 = rows[2]
    assert r2["lc"] is None and r2["text"] is None and r2["n"] is None
    assert rows[3]["text"] == "a|b||c"


def test_set_override_false_keeps_values(spark, docs):
    out = ingest_pipeline(docs, [
        {"set": {"field": "source", "value": "filled",
                 "override": False}},
    ])
    got = {r["doc_id"]: r["source"] for r in out.collect()}
    assert got == {1: "s1", 2: "s2", 3: "filled"}  # only NULL filled


def test_failure_modes(spark, docs):
    with pytest.raises(ValueError, match="missing"):
        ingest_pipeline(docs, [{"lowercase": {"field": "nope"}}])
    # ignore_missing skips the processor instead
    out = ingest_pipeline(docs, [
        {"lowercase": {"field": "nope", "ignore_missing": True}}])
    assert out.columns == docs.columns
    with pytest.raises(ValueError, match="already exists"):
        ingest_pipeline(docs, [
            {"rename": {"field": "text", "target_field": "source"}}])
    with pytest.raises(ValueError, match="unknown processor"):
        ingest_pipeline(docs, [{"frobnicate": {"field": "text"}}])
    with pytest.raises(ValueError, match="unsupported type"):
        ingest_pipeline(docs, [
            {"convert": {"field": "n", "type": "decimal"}}])
    with pytest.raises(ValueError, match="removed every column"):
        ingest_pipeline(docs.select("text"), [
            {"remove": {"field": "text"}}])


def test_chain_compiles_to_one_projection(spark, docs):
    """The whole chain folds into a single narrow projection — no
    exchange, no extra scan, whatever the processor count."""
    out = ingest_pipeline(docs, [
        {"lowercase": {"field": "text"}},
        {"gsub": {"field": "text", "pattern": "a", "replacement": "b"}},
        {"trim": {"field": "text"}},
        {"set": {"field": "t", "value": 1}},
        {"convert": {"field": "n", "type": "long"}},
    ])
    p = capture_plan(out.filter(F.col("doc_id") > 0))
    assert "Exchange" not in p
    import re
    assert len(re.findall(r"\(\d+\) Scan", p)) <= 1
