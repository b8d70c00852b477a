"""Scoring expressions — pure Catalyst column math, no UDFs.

Two scorers:

* ``tfidf_expr`` — the reference's exact formula, derived numerically from
  its golden log (report_clusters_snippets.txt:17-20 — Lucene classic
  similarity): score = sqrt(tf) * (1 + ln(N / (df + 1))). Produced in the
  reference by TFIDFConverter.processTfIdf (MahoutTermFinderMwk.java:213-214).

* ``bm25_expr`` — the north-star ranking function (BASELINE.json: k1=1.2,
  b=0.75), Robertson/Lucene idf:
      idf  = ln(1 + (N - df + 0.5) / (df + 0.5))
      score = idf * tf*(k1+1) / (tf + k1*(1 - b + b*doclen/avgdl))

Everything stays inside whole-stage codegen — these are column expressions
over already-aggregated (doc, term, tf, df, doclen) rows.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

from mahout_spark import BM25_B, BM25_K1


def tfidf_expr(tf: Column, df: Column, n_docs: int | Column) -> Column:
    n = F.lit(float(n_docs)) if isinstance(n_docs, (int, float)) else n_docs
    return F.sqrt(tf.cast("double")) * (
        F.lit(1.0) + F.log(n / (df.cast("double") + F.lit(1.0)))
    )


def bm25_idf_expr(df: Column, n_docs: int | Column) -> Column:
    n = F.lit(float(n_docs)) if isinstance(n_docs, (int, float)) else n_docs
    d = df.cast("double")
    return F.log(F.lit(1.0) + (n - d + F.lit(0.5)) / (d + F.lit(0.5)))


def bm25_expr(
    tf: Column,
    df: Column,
    doclen: Column,
    n_docs: int | Column,
    avgdl: float | Column,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> Column:
    a = F.lit(float(avgdl)) if isinstance(avgdl, (int, float)) else avgdl
    t = tf.cast("double")
    tf_part = (t * F.lit(k1 + 1.0)) / (
        t + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * doclen.cast("double") / a)
    )
    return bm25_idf_expr(df, n_docs) * tf_part


# Python-side twins (used by the posting-block build kernel to compute
# per-block max-score metadata with the same float semantics):

def bm25_idf(df: int, n_docs: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def bm25_score(
    tf: float,
    df: int,
    doclen: float,
    n_docs: int,
    avgdl: float,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> float:
    tf_part = (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * doclen / avgdl))
    return bm25_idf(df, n_docs) * tf_part
