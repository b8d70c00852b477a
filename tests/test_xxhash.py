"""Lock bit-equality of the pure-Python XXH64 with Spark's xxhash64
expression — the query path routes lexicon/postings bucket lookups with
it (index/wand.py), so a divergence would silently return empty results
for the affected terms."""

from __future__ import annotations

import random
import string

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mahout_spark.functions.xxhash import term_bucket, xxhash64_spark


def test_matches_spark_on_edge_and_random_cases(spark):
    rng = random.Random(1)
    cases = [
        "", "a", "spark", "hello world", "x" * 31, "y" * 32, "z" * 100,
        "naïve café 東京", "tok3x12345", "lang:java",
    ]
    cases += [
        "".join(rng.choices(string.printable, k=rng.randint(0, 200)))
        for _ in range(200)
    ]
    cases = list(dict.fromkeys(cases))
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    got = {
        r["s"]: r["h"]
        for r in df.select("s", F.xxhash64("s").alias("h")).collect()
    }
    for c in cases:
        assert got[c] == xxhash64_spark(c), repr(c)


def test_bucket_matches_spark_pmod(spark):
    terms = ["spark", "data", "the", "tok0x1", "lang:python", "東京"]
    df = spark.createDataFrame([(t,) for t in terms], "term string")
    got = {
        r["term"]: r["b"]
        for r in df.select(
            "term", F.pmod(F.xxhash64("term"), F.lit(8)).alias("b")
        ).collect()
    }
    for t in terms:
        assert got[t] == term_bucket(t, 8)


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=256))
def test_pure_python_is_total_and_64bit(data):
    from mahout_spark.functions.xxhash import xxh64

    h = xxh64(data)
    assert 0 <= h < (1 << 64)
