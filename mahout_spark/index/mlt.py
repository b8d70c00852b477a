"""More-like-this retrieval (Lucene MoreLikeThis analog, behavior
re-derived — no code shared).

Given a piece of text (or a document already in a corpus table), find
the index documents most similar to it: select the text's most
*interesting* terms, then run them as an OR query through the standard
BM25 top-k kernel. This is the classic two-stage MLT plan:

1. **Term selection — driver-side, O(one document).** Tokenize the
   like-text locally (one document's tokens never justify a Spark job),
   point-look-up the candidate terms' df in the bucket-pruned lexicon
   (the same vocabulary-partition-pruned read every query uses), and
   rank by the engine's own tf-idf — ``sqrt(tf) * (1 + ln(N/(df+1)))``
   (functions/scoring.py tfidf_expr, the reference's Lucene-classic
   formula) — keeping the ``max_query_terms`` best. Lucene's MLT ranks
   by tf·idf with min_term_freq / min_doc_freq cutoffs; we expose the
   same knobs with the engine's tf-idf so MLT agrees with the rest of
   the scoring surface. Ties break (score desc, term asc) — the
   engine-wide deterministic order.

2. **Retrieval — the optimized OR kernel.** The selected terms run
   through ``wand.topk`` (block-max pruning, bucket-pruned postings
   scan, per-shard kernels), so MLT cost is bounded by the SELECTED
   terms' postings — never corpus size. ``exclude_doc_id`` drops the
   source document from its own neighborhood (fetching k+1 then
   re-cutting, so the caller still gets k rows).

Scale: stage 1 touches one document plus |candidates| lexicon rows
(bucket-pruned point lookups; a Searcher caches them across calls);
stage 2 is exactly a user query. Nothing here scans the corpus.
"""

from __future__ import annotations

import math
import re
from collections import Counter

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mahout_spark.index import wand
from mahout_spark.sources.catalog import ParquetCatalog

_RESULT_SCHEMA = "doc_id long, score double"


def simple_tokens(text: str) -> list[str]:
    """The SQL-expressible simple tokenizer (operators/stats.py
    simple_term_frequencies: lowercase, split on [^a-z0-9]+) — the
    default MLT analyzer so selected terms hit a simple-mode index."""
    return [t for t in re.split(r"[^a-z0-9]+", (text or "").lower()) if t]


def select_query_terms(
    tf: dict,
    df_by_term: dict,
    n_docs: int,
    max_query_terms: int = 25,
    min_doc_freq: int = 2,
) -> list[str]:
    """Rank candidate terms by the engine's tf-idf and keep the best.

    ``tf``: term -> frequency in the like-text (already min_term_freq-
    filtered by the caller); ``df_by_term``: term -> corpus df (terms
    absent from the lexicon are skipped — they can't retrieve anything).
    Returns terms ordered (tfidf desc, term asc), capped."""
    scored = []
    for t, f in tf.items():
        df = df_by_term.get(t)
        if df is None or df < min_doc_freq:
            continue
        scored.append(
            (math.sqrt(f) * (1.0 + math.log(n_docs / (df + 1.0))), t)
        )
    scored.sort(key=lambda e: (-e[0], e[1]))
    return [t for _, t in scored[:max_query_terms]]


def _point_lookup(spark, cat, meta, terms: list[str]) -> list:
    """Bucket-pruned lexicon rows for ``terms`` — the same
    vocabulary-partition-pruned read wand.topk performs."""
    from mahout_spark.functions.xxhash import term_bucket

    n_buckets = int(meta["n_buckets"])
    buckets = sorted({term_bucket(t, n_buckets) for t in terms})
    lex = wand._read_query_lexicon(spark, cat, buckets)
    if lex is None:
        return []
    return (
        lex.filter(F.col("term").isin(terms))
        .select("term", "bucket", "df")
        .collect()
    )


def more_like_this(
    spark: SparkSession,
    cat: ParquetCatalog,
    like_text: str,
    k: int = 10,
    max_query_terms: int = 25,
    min_term_freq: int = 1,
    min_doc_freq: int = 2,
    exclude_doc_id: int | None = None,
    tokenizer=None,
    merge: str = "spark",
    _lex_resolver=None,
) -> DataFrame:
    """Top-k index documents most similar to ``like_text``, as
    ``DataFrame[doc_id, score]`` (BM25 over the selected terms).

    ``tokenizer`` must match the index's build mode (default:
    simple_tokens, for ``mode="simple"`` indexes). ``_lex_resolver`` is
    the Searcher seam: a callable(list[str]) -> lexicon rows serving
    from a warm cache instead of the point-lookup job."""
    tok = tokenizer or simple_tokens
    tfc = Counter(tok(like_text))
    cands = sorted(t for t, c in tfc.items() if c >= min_term_freq)
    if not cands:
        return spark.createDataFrame([], _RESULT_SCHEMA)
    meta = cat.read_meta("postings")
    rows = (
        _lex_resolver(cands) if _lex_resolver is not None
        else _point_lookup(spark, cat, meta, cands)
    )
    df_by_term = {r["term"]: int(r["df"]) for r in rows}
    sel = select_query_terms(
        {t: tfc[t] for t in cands}, df_by_term, int(meta["n_docs"]),
        max_query_terms, min_doc_freq,
    )
    if not sel:
        return spark.createDataFrame([], _RESULT_SCHEMA)
    selset = set(sel)
    sel_rows = [r for r in rows if r["term"] in selset]
    fetch = k + 1 if exclude_doc_id is not None else k
    res = wand.topk(
        spark, cat, sel, k=fetch, lex_rows=sel_rows, merge=merge,
    )
    if exclude_doc_id is not None:
        res = (
            res.filter(F.col("doc_id") != exclude_doc_id)
            .orderBy(F.col("score").desc(), F.col("doc_id").asc())
            .limit(k)
        )
    return res


def more_like_doc(
    spark: SparkSession,
    cat: ParquetCatalog,
    docs: DataFrame,
    doc_id: int,
    id_col: str = "doc_id",
    content_col: str = "text",
    **kwargs,
) -> DataFrame:
    """MLT keyed by a document already in ``docs``: one pushed-filter
    point scan fetches its text (parquet min/max stats prune row groups
    on ``id_col``), and the source doc is excluded from its own result.
    Extra kwargs flow to more_like_this."""
    row = (
        docs.filter(F.col(id_col) == doc_id)
        .select(content_col)
        .limit(1)
        .collect()
    )
    if not row:
        raise KeyError(f"doc_id {doc_id!r} not found in the corpus table")
    return more_like_this(
        spark, cat, row[0][0], exclude_doc_id=doc_id, **kwargs
    )
