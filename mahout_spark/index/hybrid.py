"""Hybrid lexical + vector retrieval: rescoring and rank fusion.

Two compositions tie the BM25 index to the embedding column (the
modern search stack's RAG/semantic layer; ES/OpenSearch expose the same
two shapes):

* ``rescore_topk`` — the ES rescore / Lucene QueryRescorer model:
  retrieve a BM25 top-``window`` (cheap, pruned), then re-rank ONLY
  that window by ``query_weight * bm25 + rescore_weight *
  cosine(query_vec, doc_embedding)``. The expensive signal runs over
  ``window`` docs, never the corpus.

* ``hybrid_topk`` — reciprocal-rank fusion (RRF, the standard
  score-scale-free combiner): ``sum over systems of
  1 / (rrf_k + rank)`` across the lexical top-``depth`` and the
  vector top-``depth``; docs found by one system only keep that
  system's contribution.

Physical shape (the part that must survive 100 TB): the corpus-sized
embedding table is scanned ONCE per query with the tiny doc-id set
broadcast into the join (never the reverse), cosine is evaluated
JVM-side (zip_with/aggregate — no Python), and every join after that
touches only O(window) / O(depth) rows. Ranks and tie-breaks are
deterministic ((score desc, doc_id asc) both systems), so fused output
is reproducible run-to-run — the property every driver-oracle check in
this repo leans on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mahout_spark.index.boolquery import boolean_topk
from mahout_spark.operators.similarity import cosine_to_query_expr
from mahout_spark.sources.catalog import ParquetCatalog


def _window_cosines(
    base: DataFrame, embeddings: DataFrame, query_vec,
    vec_col: str, id_col: str,
) -> DataFrame:
    """(doc_id, _cos) for the base window's docs: ONE pass over the
    embedding table with the tiny window broadcast into it — output is
    <= window rows, reusable as a broadcast side itself."""
    return (
        embeddings.select(
            F.col(id_col).alias("doc_id"),
            F.round(
                cosine_to_query_expr(F.col(vec_col), query_vec), 6
            ).alias("_cos"),
        )
        .join(F.broadcast(base.select("doc_id")), "doc_id")
    )


def rescore_topk(
    spark: SparkSession,
    cat: ParquetCatalog,
    query,
    embeddings: DataFrame,
    query_vec,
    k: int = 10,
    window: int = 50,
    query_weight: float = 1.0,
    rescore_weight: float = 1.0,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    **kw,
) -> DataFrame:
    """Two-phase retrieval (ES rescore): BM25 top-``window`` re-ranked
    by ``query_weight * bm25 + rescore_weight * cosine`` to the final
    top-``k``: (doc_id, score, bm25, cosine). Window docs with no
    embedding row keep their BM25-weighted score (cosine treated as 0,
    the rescore-query-miss behavior). ``**kw`` passes through to
    boolean_topk (synonyms, filter_ids, minimum_should_match, ...)."""
    base = boolean_topk(spark, cat, query, k=window, **kw)
    cosd = _window_cosines(base, embeddings, query_vec, vec_col, id_col)
    combined = (
        F.lit(float(query_weight)) * F.col("score")
        + F.lit(float(rescore_weight)) * F.coalesce(F.col("_cos"), F.lit(0.0))
    )
    return (
        base.join(F.broadcast(cosd), "doc_id", "left_outer")
        .select(
            "doc_id",
            F.round(combined, 6).alias("score"),
            F.col("score").alias("bm25"),
            F.coalesce(F.col("_cos"), F.lit(0.0)).alias("cosine"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def hybrid_topk(
    spark: SparkSession,
    cat: ParquetCatalog,
    query,
    embeddings: DataFrame,
    query_vec,
    k: int = 10,
    depth: int = 50,
    rrf_k: int = 60,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    **kw,
) -> DataFrame:
    """Reciprocal-rank fusion of BM25 and cosine retrieval:
    (doc_id, score, lex_rank, vec_rank) with ``score = sum of
    1/(rrf_k + rank)`` over the systems that ranked the doc in their
    top-``depth``. Rank windows run over <= depth rows (bounded by the
    QUERY, not the corpus — the single-partition window is fine here
    and only here). RRF is scale-free, so no score normalization is
    needed across systems (the reason ES made it the default hybrid)."""
    from mahout_spark.operators.similarity import brute_force_cosine_topk

    lex = boolean_topk(spark, cat, query, k=depth, **kw)
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    lex_r = lex.select(
        "doc_id", F.row_number().over(w).alias("lex_rank")
    )
    vec = brute_force_cosine_topk(
        embeddings, query_vec, k=depth, vec_col=vec_col, id_col=id_col
    ).withColumnRenamed(id_col, "doc_id")
    wv = Window.orderBy(F.col("cosine").desc(), F.col("doc_id").asc())
    vec_r = vec.select(
        "doc_id", F.row_number().over(wv).alias("vec_rank")
    )
    kk = float(rrf_k)
    contrib = (
        F.coalesce(1.0 / (F.lit(kk) + F.col("lex_rank")), F.lit(0.0))
        + F.coalesce(1.0 / (F.lit(kk) + F.col("vec_rank")), F.lit(0.0))
    )
    return (
        lex_r.join(vec_r, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.round(contrib, 6).alias("score"),
            "lex_rank", "vec_rank",
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )
