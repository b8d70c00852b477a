"""Phase-1 query engine: full-relational scorers (no index).

These are the semantic ground truth the indexed path (mahout_spark.index)
must match exactly. Everything is one lazy DataFrame DAG; the only UDF is
the tokenizer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mahout_spark import BM25_B, BM25_K1
from mahout_spark.functions import bm25_expr, tfidf_expr
from mahout_spark.operators import stats
from mahout_spark.operators.topk import global_topk, per_group_topk


class CorpusScorer:
    """Builds the stats DAG once over a docs DataFrame and answers scoring /
    top-k queries. ``id_cols`` names the document key column(s)."""

    def __init__(
        self,
        docs: DataFrame,
        content_col: str = "content",
        id_cols: list[str] | None = None,
        mode: str = "text",
        **tok_kw,
    ) -> None:
        self.docs = docs
        self.id_cols = id_cols or ["doc_id"]
        self.tf = stats.term_frequencies(
            docs, content_col, self.id_cols, mode=mode, **tok_kw
        )
        self.dfstats = stats.document_frequency(self.tf)
        self.n_docs, self.avgdl = stats.corpus_stats(docs, self.tf, self.id_cols)

    # -- scoring tables ----------------------------------------------------

    def tfidf(self) -> DataFrame:
        """Reference TF-IDF scores per (doc, term) — the tfidf-vectors stage."""
        return self.tf.join(self.dfstats, "term").withColumn(
            "score", tfidf_expr(F.col("tf"), F.col("df"), self.n_docs)
        )

    def bm25(self, k1: float = BM25_K1, b: float = BM25_B) -> DataFrame:
        """BM25 per-(doc, term) contribution."""
        return self.tf.join(self.dfstats, "term").withColumn(
            "score",
            bm25_expr(
                F.col("tf"), F.col("df"), F.col("doclen"),
                self.n_docs, self.avgdl, k1, b,
            ),
        )

    # -- queries -----------------------------------------------------------

    def topk_terms_per_doc(
        self, k: int, min_score: float | None = None, scorer: str = "tfidf"
    ) -> DataFrame:
        """The reference's report query ("most insightful terms per doc"):
        per-doc top-k terms by score with threshold (threshold 7 whole-file /
        1 snippets, MahoutTermFinderMwk.java:54, MahoutTermFinderMwkSnpt
        .java:58)."""
        scored = self.tfidf() if scorer == "tfidf" else self.bm25()
        return per_group_topk(
            scored, self.id_cols, k, "score", ["term"], min_score
        )

    def search(
        self, terms: list[str], k: int = 10, mode_all: bool = False,
        k1: float = BM25_K1, b: float = BM25_B,
    ) -> DataFrame:
        """BM25 top-k retrieval (north-star O7/J5): score docs containing
        any (OR) or all (AND) query terms; rank by (score desc, doc asc).

        The term filter is a literal IN-list — Catalyst pushes it into the
        scan; on the indexed path the same terms prune partitions instead.
        """
        qt = [t for t in dict.fromkeys(terms)]  # dedupe, keep order
        scored = (
            self.bm25(k1, b)
            .filter(F.col("term").isin(qt))
        )
        agg = scored.groupBy(*self.id_cols).agg(
            F.sum("score").alias("score"),
            F.count(F.lit(1)).alias("matched"),
        )
        if mode_all:
            agg = agg.filter(F.col("matched") == len(qt))
        return global_topk(agg.drop("matched"), k, "score", self.id_cols)
