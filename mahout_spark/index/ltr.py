"""Learning-to-rank feature extraction — the ES LTR plugin's
featureset/``sltr`` model (X126).

A relevance-model training pipeline needs, for every (query, candidate)
pair, model-ready features computed from INDEX statistics: the BM25
score, per-term match stats (tf sums, idf mass), and length signals.
The ES LTR plugin logs these via ``sltr`` queries at search time; here
the extraction is one batch plan over the index tables — the shape that
feeds `operators.rankeval` judgments on the other side of the loop.

Plan: candidates come from ``wand.topk_batch`` (union-term pruned scan,
shared per-shard decode — cost scales with distinct terms, not query
count), then ONE bucket-pruned ``tf_raw`` read restricted to the query
terms is semi-joined to the candidate doc set (≤ k·|Q| ids — broadcast)
and aggregated per (query, doc). No corpus scan: postings buckets prune
to the query terms' buckets, the tf read prunes the same way, and the
feature aggregation only ever sees candidate rows.

Determinism: ranks recompute on the 6-dp-rounded BM25 (doc_id
tiebreak), float features round(·, 6) — the same cross-engine hash
rules as the rest of the contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mahout_spark.sources.catalog import ParquetCatalog


def ltr_features(
    spark: SparkSession,
    cat: ParquetCatalog,
    queries: dict,
    k: int = 100,
) -> DataFrame:
    """Per (query_id, top-k candidate doc): ``(query_id, doc_id, rank,
    bm25, matched_terms, tf_sum, tf_max, idf_sum, doclen, dl_ratio)``.
    ``queries`` maps query_id -> term list (pre-analyzed, the
    ``topk_batch`` contract)."""
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    if not queries:
        raise ValueError("empty query set")
    from mahout_spark.functions.xxhash import term_bucket
    from mahout_spark.index.wand import topk_batch

    meta = cat.read_meta("postings")
    n_docs, avgdl = int(meta["n_docs"]), float(meta["avgdl"])
    n_buckets = int(meta["n_buckets"])

    cand = topk_batch(spark, cat, queries, k=k).drop("rank")
    w = Window.partitionBy("query_id").orderBy(
        F.round("score", 6).desc(), F.col("doc_id").asc()
    )
    cand = cand.withColumn("rank", F.row_number().over(w).cast("long"))

    qt = spark.createDataFrame(
        [(qid, t) for qid, ts in sorted(queries.items())
         for t in dict.fromkeys(ts)],
        "query_id string, term string",
    )
    terms = sorted({t for ts in queries.values() for t in ts})
    buckets = sorted({term_bucket(t, n_buckets) for t in terms})
    tf = cat.read_partitions(spark, "tf_raw", "bucket", buckets).select(
        "term", "doc_id", "tf", "doclen"
    ).filter(F.col("term").isin(terms))
    lex = cat.read_partitions(spark, "lexicon", "bucket", buckets).select(
        "term", "df"
    ).filter(F.col("term").isin(terms))

    tf_cand = tf.join(
        F.broadcast(cand.select("doc_id").distinct()), "doc_id", "leftsemi"
    )
    idf = F.log(
        1.0 + (F.lit(float(n_docs)) - F.col("df") + 0.5)
        / (F.col("df") + 0.5)
    )
    feats = (
        F.broadcast(qt).join(tf_cand, "term")
        .join(F.broadcast(lex), "term")
        .groupBy("query_id", "doc_id")
        .agg(
            F.count(F.lit(1)).alias("matched_terms"),
            F.sum("tf").cast("long").alias("tf_sum"),
            F.max("tf").cast("long").alias("tf_max"),
            F.round(F.sum(idf), 6).alias("idf_sum"),
            F.max("doclen").cast("long").alias("doclen"),
        )
    )
    return cand.join(feats, ["query_id", "doc_id"]).select(
        "query_id", "doc_id", "rank",
        F.round("score", 6).alias("bm25"),
        "matched_terms", "tf_sum", "tf_max", "idf_sum", "doclen",
        F.round(F.col("doclen") / F.lit(avgdl), 6).alias("dl_ratio"),
    )


def ltr_rescore(
    spark: SparkSession,
    cat: ParquetCatalog,
    queries: dict,
    weights: dict,
    k: int = 10,
    fetch: int = 100,
    intercept: float = 0.0,
) -> DataFrame:
    """Apply a linear LTR model (the ES ``sltr`` rescorer shape, X141):
    extract the X126 feature set for the top-``fetch`` BM25 candidates
    per query, score each as ``intercept + Σ w_f · feature_f``, and
    re-rank to the top ``k``. Returns ``(query_id, doc_id, model_score,
    rank)`` — rank by (model_score desc, doc_id asc).

    ``weights`` maps feature name → coefficient; only the X126 feature
    columns are legal (unknown names raise — a silently-ignored weight
    is a silently-wrong model). The model applies to the ROUNDED
    features in WEIGHT-NAME-SORTED fold order, so the score is
    bit-replayable by any engine reading the same feature relation —
    the model file is data, not code.

    Plan shape: everything is the X126 extraction (no corpus scan —
    bucket-pruned reads semi-joined to ≤ fetch·|Q| candidates) plus one
    projection and a per-query window over ≤ fetch rows."""
    allowed = ("bm25", "matched_terms", "tf_sum", "tf_max", "idf_sum",
               "doclen", "dl_ratio")
    bad = sorted(set(weights) - set(allowed))
    if bad:
        raise ValueError(f"unknown LTR feature(s): {bad}")
    if not weights:
        raise ValueError("empty weight map")
    feats = ltr_features(spark, cat, queries, k=fetch)
    score = F.lit(float(intercept))
    for name in sorted(weights):
        score = score + F.lit(float(weights[name])) * F.col(name)
    w = Window.partitionBy("query_id").orderBy(
        F.col("model_score").desc(), F.col("doc_id").asc())
    return (
        feats.withColumn("model_score", F.round(score, 6))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "model_score", "rank")
    )
