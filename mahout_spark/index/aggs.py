"""Search-time aggregations over a boolean match set.

The ES aggregation surface this engine needs for data-curation work:

* ``significant_terms`` — the ES significant_terms bucket agg (JLH
  score): which index terms are OVER-represented in the docs matching a
  query, relative to the whole corpus? The workhorse for corpus forensics
  ("what else do the spam-matching docs talk about?"), topic discovery,
  and training-set leakage hunts. Foreground df comes from one semi-join
  of tf_raw onto the match set; background df is a lexicon read — both
  fully relational, no kernel work.

* ``facet_histogram`` — the ES histogram agg over a numeric corpus
  column, restricted to the match set (the numeric twin of
  boolquery.facet_counts): fixed-width buckets, empty buckets absent
  (sparse, like ES ``min_doc_count=1``).

Both compose the SAME way at 100 TB: matching_docs stays distributed,
the semi-join broadcasts whichever side AQE finds small, and the
aggregation is one partial-agg shuffle keyed by term/bucket — never by
doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mahout_spark.index.boolquery import MAX_EXPANSIONS, matching_docs
from mahout_spark.sources.catalog import ParquetCatalog


def significant_terms(
    spark: SparkSession,
    cat: ParquetCatalog,
    query,
    n: int = 10,
    min_fg_df: int = 1,
    exclude_query_terms: bool = False,
    max_expansions: int = MAX_EXPANSIONS,
    cleanup: list | None = None,
) -> DataFrame:
    """Top-``n`` terms most over-represented in ``query``'s match set
    (ES significant_terms, JLH heuristic): per term,
    ``score = (fg_rate - bg_rate) * (fg_rate / bg_rate)`` with
    ``fg_rate = fg_df / n_matched`` and ``bg_rate = df / n_docs``.
    Returns (term, fg_df, bg_df, score) ordered (score desc, term asc).

    Physical plan: match set (distributed, CHECKPOINTED so its kernel
    job runs exactly once) -> one semi-join pruning tf_raw to foreground
    rows -> count per term -> join the lexicon for background df. The
    n_matched count reads the checkpointed blocks, not a recompute.
    ``cleanup`` follows the repo's checkpoint-lifecycle convention
    (checkpoint.release): pass a list to release the match-set blocks
    after consuming the result; None leaves them to ContextCleaner GC.
    ``exclude_query_terms`` drops the query's own positive terms (they
    trivially top the ranking); ES keeps them, so the default does too.
    """
    from mahout_spark.checkpoint import eager_checkpoint

    meta = cat.read_meta("postings")
    n_docs = int(meta["n_docs"])
    m = eager_checkpoint(
        matching_docs(spark, cat, query, max_expansions=max_expansions),
        cleanup,
    )
    tf_raw = cat.read(spark, "tf_raw", schema_json=meta.get("tf_schema"))
    fg = (
        tf_raw.join(m, "doc_id", "left_semi")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("fg_df"))
    )
    # n_matched == number of fg docs; counted on the materialized
    # checkpoint blocks (tiny second action, no kernel recompute) to
    # stay exact for docs with zero terms
    n_matched = m.count()
    if n_matched == 0:
        return spark.createDataFrame(
            [], "term string, fg_df long, bg_df long, score double"
        )
    lex = cat.read(
        spark, "lexicon", schema_json=meta.get("lexicon_schema")
    ).select("term", F.col("df").alias("bg_df"))
    fg_rate = F.col("fg_df") / F.lit(float(n_matched))
    bg_rate = F.col("bg_df") / F.lit(float(n_docs))
    out = (
        fg.filter(F.col("fg_df") >= min_fg_df)
        .join(lex, "term")
        .select(
            "term", "fg_df", "bg_df",
            F.round(
                (fg_rate - bg_rate) * (fg_rate / bg_rate), 6
            ).alias("score"),
        )
    )
    if exclude_query_terms:
        from mahout_spark.index.queryparse import parse, positive_terms

        node = parse(query) if isinstance(query, str) else query
        qterms = positive_terms(node)
        if qterms:
            out = out.filter(~F.col("term").isin(qterms))
    return out.orderBy(F.col("score").desc(), F.col("term").asc()).limit(n)


def facet_histogram(
    spark: SparkSession,
    cat: ParquetCatalog,
    docs: DataFrame,
    query,
    value_col: str,
    width: float,
    id_col: str = "doc_id",
    max_expansions: int = MAX_EXPANSIONS,
) -> DataFrame:
    """Fixed-width histogram of a numeric corpus column over the FULL
    match set (ES histogram agg; the numeric twin of facet_counts):
    (bucket, n_docs) with ``bucket = floor(value / width) * width``,
    empty buckets absent, NULL values excluded (ES missing-value
    default). One semi-join + one partial-agg count keyed by bucket."""
    if width <= 0:
        raise ValueError(f"histogram width must be > 0: {width!r}")
    m = matching_docs(spark, cat, query, max_expansions=max_expansions)
    bucket = (
        F.floor(F.col(value_col) / F.lit(float(width)))
        * F.lit(float(width))
    )
    return (
        docs.join(m.withColumnRenamed("doc_id", id_col), id_col, "leftsemi")
        .filter(F.col(value_col).isNotNull())
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("bucket")
    )


def match_count(
    spark: SparkSession,
    cat: ParquetCatalog,
    query,
    max_expansions: int = MAX_EXPANSIONS,
    **kw,
) -> DataFrame:
    """The ES ``_count`` API: how many docs match ``query`` — one row
    ``(n_matches long)``, no scoring, no ranking. The cheapest possible
    plan for the question everyone asks before exporting a training
    set: the match kernel emits doc_ids, the count is one partial
    aggregation — nothing but the final scalar crosses the driver."""
    m = matching_docs(spark, cat, query, max_expansions=max_expansions, **kw)
    return m.agg(F.count(F.lit(1)).alias("n_matches"))


def facet_cardinality(
    spark: SparkSession,
    cat: ParquetCatalog,
    docs: DataFrame,
    query,
    cols: list[str],
    id_col: str = "doc_id",
    approx: bool = False,
    rsd: float = 0.05,
    max_expansions: int = MAX_EXPANSIONS,
) -> DataFrame:
    """ES ``cardinality`` agg: distinct values of corpus columns over
    the match set — one row with a ``<col>_cardinality`` count per
    requested column (NULLs excluded, SQL count-distinct semantics).

    ``approx=False`` (default) is EXACT ``count_distinct`` — one extra
    shuffle keyed by value, the oracle-checkable regime. ``approx=True``
    switches to HyperLogLog++ (``approx_count_distinct`` with relative
    error ``rsd``) — ES's own algorithm and the 100 TB regime for
    high-cardinality columns (url, user id): fixed-size sketches merge
    in partial aggregation, no value-keyed shuffle at all."""
    if not cols:
        raise ValueError("facet_cardinality needs at least one column")
    m = matching_docs(spark, cat, query, max_expansions=max_expansions)
    base = docs.select(F.col(id_col).alias("doc_id"), *cols).join(
        m, "doc_id", "left_semi"
    )
    if approx:
        aggs = [F.approx_count_distinct(c, rsd).alias(f"{c}_cardinality")
                for c in cols]
    else:
        aggs = [F.count_distinct(F.col(c)).alias(f"{c}_cardinality")
                for c in cols]
    return base.agg(*aggs)
