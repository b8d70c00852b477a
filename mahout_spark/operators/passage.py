"""Passage retrieval with parent-document rollup (X81).

Long-document retrieval standard (ES nested docs + ``inner_hits``;
the max-passage / MaxP ranking the long-doc IR literature converged
on): split each document into overlapping token-window chunks, score
CHUNKS by BM25 over the chunk corpus (chunk-level df and length
statistics — a long rambling doc must not outrank a focused passage),
then rank documents by their BEST chunk, returning the winning passage
id as the inner hit.

Fully relational on the forward path — no inverted index required
(the index analog is indexing chunks as child docs; this operator is
the one-shot/exploratory shape, and its relation doubles as the oracle
for any future chunk-indexed path). Plan: chunking is a narrow JVM map
(textstats.chunk_documents), token explode → two partial-agg shuffles
(per-chunk tf, per-term chunk-df of the QUERY terms only), one
broadcast-joined scalar row (N, avgdl), a per-doc PARTITIONED window
for the best chunk, and a global TakeOrderedAndProject for the final
cut. At 100 TB every shuffle is keyed by (doc, chunk) or term — never
a corpus-wide sort; the window is parallel by doc.

Reference analog: the snippet-mode runs score snippet FILES (category
fragments) and report per-file top terms (``MahoutTermFinderMwkSnpt*``);
this is the same move with chunks as synthetic snippets and the
parent-doc rollup the reference never had.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mahout_spark.index.queryparse import _simple_normalize
from mahout_spark.operators.textstats import chunk_documents


def passage_topk(
    docs: DataFrame,
    query,
    k: int = 10,
    chunk_tokens: int = 64,
    overlap: int = 16,
    content_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents by best-passage BM25: returns
    (doc_id, chunk_id, score) — the winning chunk per doc (ties: lowest
    chunk_id), docs ordered (score desc, doc_id asc). ``query`` is a
    string (simple-normalized) or an iterable of terms; scoring is the
    OR of the distinct query terms over the CHUNK corpus (N = number of
    chunks, df = chunks containing the term, avgdl = mean chunk
    length)."""
    if isinstance(query, str):
        terms = []
        for w in query.split():
            terms.extend(_simple_normalize(w))
    else:
        terms = [t for t in query]
    terms = sorted(set(terms))
    if not terms:
        raise ValueError("passage_topk needs at least one query term")
    chunks = chunk_documents(
        docs, chunk_tokens=chunk_tokens, overlap=overlap,
        content_col=content_col, id_col=id_col,
    ).select(
        "doc_id", "chunk_id",
        F.col("n_chunk_tokens").alias("dl"),
        # chunk_text is the space-joined normalized token stream, so a
        # plain split IS the tokenization (no second normalize pass)
        F.split("chunk_text", " ").alias("_toks"),
    )
    # chunk-corpus scalars: one partial-agg row, broadcast into the join
    scal = chunks.agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.avg("dl").alias("avgdl"),
    )
    qtf = (
        chunks.select(
            "doc_id", "chunk_id", "dl", F.explode("_toks").alias("term")
        )
        .filter(F.col("term").isin(terms))
        .groupBy("doc_id", "chunk_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    qdf = qtf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_chunks") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    sat = (
        F.col("tf") * F.lit(k1 + 1.0)
        / (F.col("tf")
           + F.lit(k1) * (F.lit(1.0 - b)
                          + F.lit(b) * F.col("dl") / F.col("avgdl")))
    )
    chunk_scores = (
        qtf.join(F.broadcast(qdf), "term")
        .crossJoin(F.broadcast(scal))
        .withColumn("c", idf * sat)
        .groupBy("doc_id", "chunk_id")
        .agg(F.sum("c").alias("score"))
    )
    best = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("chunk_id").asc()
    )
    return (
        chunk_scores.withColumn("_rn", F.row_number().over(best))
        .filter(F.col("_rn") == 1)
        .select("doc_id", "chunk_id", "score")
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )
