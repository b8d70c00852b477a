"""Multi-field search scoring (X97 — ES ``multi_match`` / ``dis_max``).

Elasticsearch's multi-field text query has two canonical combination
modes over per-field match scores:

* ``best_fields`` — the ``dis_max`` query: the best-scoring field wins
  and every other matching field contributes ``tie_breaker`` times its
  score (``max + tie_breaker · (sum − max)``; tie_breaker=0 is pure
  dis_max, 1 collapses into most_fields);
* ``most_fields`` — the plain bool-should sum across fields.

Per-field scores use FIELD-LOCAL statistics (df, avgdl, doc count of
docs that HAVE the field) — the ES/Lucene per-field index model, which
is what makes a short title field score differently from the body for
the same term.

Spark-first shape: per-field scoring is the existing relational BM25
(tokenize → tf/df/doclen → one codegen'd expression), and the combiner
is ONE union + ONE hash aggregation keyed on doc id — max and sum are
partial-aggregable, so the combine costs a single exchange regardless
of field count; no joins, no per-field shuffles. Field boosts multiply
before the max (the ES ``field^boost`` contract).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MODES = ("best_fields", "most_fields")


def field_bm25_scores(
    docs: DataFrame, terms: list, content_col: str = "text",
    id_col: str = "doc_id", k1: float = 1.2, b: float = 0.75,
) -> DataFrame:
    """BM25 over ONE field with field-local statistics: df and avgdl
    from this field's postings, n_docs = docs that have the field
    (≥ 1 token — the ES per-field docCount). Returns (id_col, score),
    score UNROUNDED (the combiner rounds once at the end)."""
    from mahout_spark.functions import bm25_expr
    from mahout_spark.operators.stats import (
        document_frequency,
        simple_term_frequencies,
    )

    tf = simple_term_frequencies(docs, content_col, id_col)
    scal = (
        tf.groupBy(id_col).agg(F.max("doclen").alias("dl"))
        .agg(F.count(F.lit(1)).alias("nd"), F.avg("dl").alias("ad"))
        .first()
    )
    if scal["nd"] == 0:
        return tf.select(id_col, F.lit(0.0).alias("score")).limit(0)
    dfreq = document_frequency(tf)
    return (
        tf.filter(F.col("term").isin(list(terms)))
        .join(dfreq, "term")
        .withColumn(
            "contrib",
            bm25_expr(F.col("tf"), F.col("df"), F.col("doclen"),
                      int(scal["nd"]), float(scal["ad"]), k1, b),
        )
        .groupBy(id_col)
        .agg(F.sum("contrib").alias("score"))
    )


def multi_match_combine(
    field_scores: dict[str, DataFrame],
    boosts: dict[str, float] | None = None,
    tie_breaker: float = 0.0,
    mode: str = "best_fields",
    k: int | None = None,
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """Combine per-field (id, score) relations into the multi_match
    result (id, score, best_field): ``best_fields`` scores
    ``max + tie_breaker · (sum − max)`` over boosted field scores,
    ``most_fields`` the plain sum (tie_breaker ignored). ``best_field``
    is the winning field name (ties break on field name asc — pinned;
    ES leaves this to evaluation order). A doc matching ANY field is
    returned; scores round to 1e-6; ordering score desc, id asc;
    ``k`` truncates (TakeOrdered)."""
    if mode not in MODES:
        raise ValueError(f"mode must be one of {MODES}: {mode!r}")
    if not field_scores:
        raise ValueError("field_scores must be non-empty")
    if not (0.0 <= tie_breaker <= 1.0):
        raise ValueError(f"tie_breaker must be in [0, 1]: {tie_breaker}")
    boosts = boosts or {}
    unknown = sorted(set(boosts) - set(field_scores))
    if unknown:
        raise ValueError(f"boosts for unknown fields: {unknown}")
    parts = [
        df.select(
            F.col(id_col),
            (F.col(score_col) * F.lit(float(boosts.get(name, 1.0))))
            .alias("s"),
            F.lit(name).alias("field"),
        )
        for name, df in sorted(field_scores.items())
    ]
    from pyspark.sql import Window

    unioned = reduce(DataFrame.unionByName, parts)
    # the window and the groupBy hash on the same key, so Catalyst
    # plans ONE exchange for both
    w = Window.partitionBy(id_col)
    agg = (
        unioned.withColumn("w_mx", F.max("s").over(w))
        .groupBy(id_col)
        .agg(
            F.max("s").alias("mx"),
            F.sum("s").alias("sm"),
            # winning field: lexicographically-first name among the
            # max scorers
            F.min(F.when(F.col("s") == F.col("w_mx"), F.col("field")))
            .alias("best_field"),
        )
    )
    combined = (
        F.col("sm") if mode == "most_fields"
        else F.col("mx") + F.lit(float(tie_breaker))
        * (F.col("sm") - F.col("mx"))
    )
    out = (
        agg.select(
            id_col,
            F.round(combined, 6).alias("score"),
            "best_field",
        )
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
    )
    return out.limit(k) if k is not None else out


def combined_fields_topk(
    field_docs: dict[str, DataFrame],
    terms: list,
    weights: dict[str, float] | None = None,
    k: int | None = None,
    content_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """ES ``combined_fields`` — the BM25F model (Robertson/Zaragoza's
    simple variant, what Lucene's CombinedFieldQuery implements): the
    fields merge into ONE virtual field before saturation, instead of
    saturating per field and combining after (multi_match's dis_max).
    Per doc and term,

    * ``tf' = Σ_f w_f · tf_f``  (weighted term freq across fields),
    * ``dl' = Σ_f w_f · dl_f``  (weighted doc length),
    * ``df`` = docs containing the term in ANY field,
    * ``score = Σ_t idf(df) · tf'·(k1+1) / (tf' + k1·(1−b+b·dl'/avgdl'))``

    with ``avgdl'`` the corpus mean of ``dl'`` and ``n_docs`` = docs
    with at least one field token. This is the principled fix for the
    dis_max failure mode where a term matching weakly in EVERY field
    outranks one matching strongly in one.

    Plan: one tokenize + tf aggregation per field (map-side combined),
    ONE union, then a single (doc, term)-keyed partial aggregation
    builds tf'/dl'; df and the scalars are two tiny aggregates off the
    same relation. Ordering (score desc, id asc); ``k`` truncates."""
    from mahout_spark.operators.stats import simple_term_frequencies

    if not field_docs:
        raise ValueError("field_docs must be non-empty")
    weights = weights or {}
    unknown = sorted(set(weights) - set(field_docs))
    if unknown:
        raise ValueError(f"weights for unknown fields: {unknown}")
    parts = [
        simple_term_frequencies(df, content_col, id_col).select(
            id_col, "term",
            F.lit(name).alias("field"),
            (F.col("tf") * F.lit(float(weights.get(name, 1.0))))
            .alias("wtf"),
            (F.col("doclen") * F.lit(float(weights.get(name, 1.0))))
            .alias("wdl"),
        )
        for name, df in sorted(field_docs.items())
    ]

    unioned = reduce(DataFrame.unionByName, parts)
    # virtual-field postings: tf' per (doc, term); dl' = each field's
    # (term-constant) weighted doclen taken ONCE per (doc, field) then
    # summed — two fields with equal wdl must both count
    tf_comb = unioned.groupBy(id_col, "term").agg(
        F.sum("wtf").alias("tfp"))
    dl_comb = (
        unioned.groupBy(id_col, "field").agg(F.max("wdl").alias("fdl"))
        .groupBy(id_col).agg(F.sum("fdl").alias("dlp"))
    )
    scal = dl_comb.agg(
        F.count(F.lit(1)).alias("nd"), F.avg("dlp").alias("ad")).first()
    if scal["nd"] == 0:
        return tf_comb.select(id_col, F.lit(0.0).alias("score")).limit(0)
    n_docs, avgdl = int(scal["nd"]), float(scal["ad"])
    dfreq = tf_comb.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tfp = F.col("tfp").cast("double")
    contrib = idf * (tfp * F.lit(k1 + 1.0)) / (
        tfp + F.lit(k1) * (F.lit(1.0 - b)
                           + F.lit(b) * F.col("dlp") / F.lit(avgdl)))
    out = (
        tf_comb.filter(F.col("term").isin(list(terms)))
        .join(dfreq, "term")
        .join(dl_comb, id_col)
        .withColumn("c", contrib)
        .groupBy(id_col)
        .agg(F.round(F.sum("c"), 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
    )
    return out.limit(k) if k is not None else out
