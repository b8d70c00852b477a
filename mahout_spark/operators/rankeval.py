"""Ranking evaluation — the ES ``_rank_eval`` API (X124).

Given a ranked result set and graded relevance judgments, compute the
standard retrieval metrics per query — precision@k, recall@k, MRR, and
NDCG@k — as ONE relational plan (two joins + two aggregations, no UDF,
no collect): the shape a relevance-engineering loop runs over millions
of (query, judgment) rows when tuning BM25 parameters, boosts, or
rerankers against a labeled set.

Conventions (pinned for cross-engine determinism, each ES-compatible):

* ``precision@k``   = relevant-retrieved / retrieved (retrieved ≤ k —
  ES divides by the actual result-set size, not k).
* ``recall@k``      = relevant-retrieved / total-relevant; NULL when the
  query has no relevant judgment (undefined, never silently 0).
* ``MRR``           = 1 / rank of the first relevant result, 0.0 when no
  relevant result is retrieved (the ES convention).
* ``NDCG@k``        = DCG/IDCG with the exponential gain
  ``(2^grade - 1) / log2(rank + 1)``; IDCG ranks the query's judgments
  by grade desc (doc_id asc tiebreak) cut at k; NULL when IDCG is 0.
* All metrics round(…, 6) — sums are ≤k doubles of O(1) magnitude, so
  6 decimals is far inside double error and hash-stable across engines.

Scale shape: both joins key on (query, doc); the judgment side of a
real eval set is per-query-bounded (10-10^3 rows/query), so AQE
broadcasts it against the ≤k×|Q| result rows — cost is judgment-set
sized, never corpus sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rank_eval(
    results: DataFrame,
    judgments: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    grade_col: str = "grade",
) -> DataFrame:
    """Per-query metrics over ``results`` (query, doc, 1-based rank) and
    ``judgments`` (query, doc, integer grade ≥ 0; grade > 0 = relevant):
    ``(query_id, retrieved, relevant_retrieved, precision_at_k,
    recall_at_k, mrr, ndcg_at_k)``. Queries appearing only in
    ``judgments`` are not emitted (no results — the caller's signal is
    the missing row, mirroring ES which reports per provided request)."""
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    q, d, r, g = query_col, id_col, rank_col, grade_col

    res = results.select(q, d, F.col(r).cast("long").alias(r)).filter(
        F.col(r) <= k
    )
    jud = judgments.select(
        q, d, F.col(g).cast("long").alias(g)
    ).filter(F.col(g) >= 0)

    rel = F.col(g) > 0
    gain = (F.pow(F.lit(2.0), F.col(g)) - 1.0)

    joined = res.join(jud, [q, d], "left").fillna(0, [g])
    per_q = joined.groupBy(q).agg(
        F.count(F.lit(1)).alias("retrieved"),
        F.sum(rel.cast("long")).alias("relevant_retrieved"),
        F.min(F.when(rel, F.col(r))).alias("_first_rel"),
        F.sum(gain / F.log2(F.col(r) + 1.0)).alias("_dcg"),
    )

    w = Window.partitionBy(q).orderBy(F.col(g).desc(), F.col(d).asc())
    ideal = (
        jud.filter(rel)
        .withColumn("_rn", F.row_number().over(w))
        .groupBy(q)
        .agg(
            F.sum(
                F.when(F.col("_rn") <= k,
                       gain / F.log2(F.col("_rn") + 1.0))
            ).alias("_idcg"),
            F.count(F.lit(1)).alias("_total_rel"),
        )
    )

    out = per_q.join(ideal, q, "left")
    return out.select(
        q,
        "retrieved",
        "relevant_retrieved",
        F.round(
            F.col("relevant_retrieved") / F.col("retrieved"), 6
        ).alias("precision_at_k"),
        F.round(
            F.when(
                F.col("_total_rel") > 0,
                F.col("relevant_retrieved") / F.col("_total_rel"),
            ),
            6,
        ).alias("recall_at_k"),
        F.round(
            F.coalesce(1.0 / F.col("_first_rel"), F.lit(0.0)), 6
        ).alias("mrr"),
        F.round(
            F.when(F.col("_idcg") > 0, F.col("_dcg") / F.col("_idcg")),
            6,
        ).alias("ndcg_at_k"),
    )
