"""Spark-facing function wrappers: Arrow-batched tokenizer UDFs and the
scoring / id helpers. UDFs are created lazily (pandas_udf needs an active
SparkSession at decoration time on some configs, and keeping construction
explicit makes the non-UDF fast path obvious)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from mahout_spark.functions.ids import dense_ids
from mahout_spark.functions.scoring import (
    bm25_expr,
    bm25_idf,
    bm25_idf_expr,
    bm25_score,
    tfidf_expr,
)
from mahout_spark.tokenize import tf_map_batch, tokens_batch

__all__ = [
    "dense_ids",
    "tfidf_expr",
    "bm25_expr",
    "bm25_idf_expr",
    "bm25_idf",
    "bm25_score",
    "tokenize_udf",
    "tf_map_udf",
]


def tokenize_udf(mode: str = "text", **kw):
    """content:string -> array<string> tokens (document order, duplicates
    kept) — the Spark analog of the tokenized-documents stage."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _tokens(content):
        return tokens_batch(content, mode=mode, **kw)

    return _tokens


def tf_map_udf(mode: str = "text", **kw):
    """content:string -> map<string,int> doc-local term frequencies.
    Pre-aggregating inside the UDF keeps the downstream shuffle at one row
    per distinct (doc, term) instead of one per token occurrence."""

    @F.pandas_udf(T.MapType(T.StringType(), T.IntegerType()))
    def _tf(content):
        return tf_map_batch(content, mode=mode, **kw)

    return _tf
