"""Corpus statistics pipeline (SURVEY.md §2.4, A1-A6).

The reference materialized each of these as a SequenceFile stage
(wordcount, dictionary.file-0, tf-vectors, tfidf/df-count); here each is a
lazy DataFrame, and Catalyst fuses the chain. Shuffle inventory for the full
stats build is exactly two wide stages:

  docs --(tf_map UDF, narrow)--> explode --(shuffle 1: groupBy doc,term is
  avoided entirely because the UDF pre-aggregates per doc)--> term_freqs
  term_freqs --(shuffle 2: groupBy term)--> df/wordcount

Doc length rides along as a column computed inside the same UDF row, so no
separate doclen aggregation pass over the token stream is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mahout_spark.functions import dense_ids, tf_map_udf


def term_frequencies(
    docs: DataFrame,
    content_col: str = "content",
    id_cols: list[str] | None = None,
    mode: str = "text",
    lang_col: str | None = None,
    **tok_kw,
) -> DataFrame:
    """docs -> one row per (doc, term): id_cols..., term, tf, doclen.

    Equivalent of the reference's tokenized-documents + tf-vectors stages
    (DocumentProcessor.tokenizeDocuments at MahoutTermFinderMwk.java:203-204,
    DictionaryVectorizer.createTermFrequencyVectors at :206-208) collapsed
    into one narrow map: tokenize + doc-local count in a single Arrow UDF,
    then explode the map. doclen = total surviving tokens (sum of tf),
    the BM25 length normalizer.

    ``lang_col``: language-tagged terms (north-star T4) — each doc also
    posts the synthetic term ``lang:<value>`` (tf=1, EXCLUDED from
    doclen so BM25 length normalization is unaffected). Language scoping
    then costs one posting-list intersection instead of a docstats join,
    and partition-prunes like any other term. The content tokenizer can
    never emit a ``:`` so the namespace cannot collide.
    """
    if id_cols is None:
        id_cols = ["doc_id"]
    if mode == "simple":
        # JVM-only tokenizer (split/lower, no stem/stoplist) — the stream
        # the DuckDB oracle CTE reproduces exactly. Routing it through
        # term_frequencies makes the whole INDEX pipeline (build -> block
        # encode -> WAND) oracle-checkable end-to-end.
        if id_cols != ["doc_id"]:
            raise ValueError("mode='simple' supports id_cols=['doc_id'] only")
        if tok_kw:
            raise ValueError("mode='simple' takes no tokenizer options")
        base = simple_term_frequencies(docs, content_col, "doc_id")
        if lang_col is None:
            return base
        # lang tags in simple mode: a unioned tf=1 row per doc keeps the
        # stream SQL-expressible (the oracle adds the same constant-term
        # rows); doclen recomputed by the same split expression — one
        # extra narrow pass over one row per doc, no shuffle, and tags
        # stay excluded from length normalization exactly as in the
        # analyzer modes above.
        dl = F.size(F.filter(
            F.split(F.lower(F.col(content_col)), "[^a-z0-9]+"),
            lambda t: t != "",
        ))
        tags = (
            docs.filter(
                F.col(content_col).isNotNull()
                & F.col(lang_col).isNotNull()
            )
            .select(
                F.col("doc_id"),
                F.concat(
                    F.lit("lang:"), F.lower(F.col(lang_col))
                ).alias("term"),
                F.lit(1).cast("long").alias("tf"),
                dl.cast("long").alias("doclen"),
            )
        )
        return base.unionByName(tags)
    tfm = tf_map_udf(mode=mode, **tok_kw)
    with_map = docs.withColumn("_tf_map", tfm(F.col(content_col))).withColumn(
        "_doclen",
        F.aggregate(
            F.map_values("_tf_map"), F.lit(0), lambda acc, x: acc + x
        ),
    )
    if lang_col is not None:
        tag = F.concat(F.lit("lang:"), F.lower(F.col(lang_col)))
        tag_map = F.when(
            F.col(lang_col).isNotNull(),
            F.map_from_arrays(F.array(tag), F.array(F.lit(1))),
        ).otherwise(F.map_from_arrays(
            F.array().cast("array<string>"), F.array().cast("array<int>")
        ))
        with_map = with_map.withColumn(
            "_tf_map", F.map_concat(F.col("_tf_map"), tag_map)
        )
    return (
        with_map.select(
            *id_cols,
            F.explode_outer("_tf_map").alias("term", "tf"),
            F.col("_doclen").alias("doclen"),
        )
        .filter(F.col("term").isNotNull())
    )


def simple_term_frequencies(
    docs: DataFrame, content_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """SQL-expressible tokenization variant: lowercase + split on
    ``[^a-z0-9]+`` — no stemming/stoplist, 100% JVM-side (split/explode are
    codegen'd builtins; no Python at all). This is the tokenizer used for
    DuckDB-oracle-checked queries, mirroring the reference's independent
    shell reimplementation (shell_simplification/cat_with_filename.sh:16-27)
    which also tokenizes by naive splitting.

    Returns (id_col, term, tf, doclen); doclen = total tokens in the doc.
    """
    toks = (
        docs.filter(F.col(content_col).isNotNull())
        .select(
            id_col,
            F.explode(
                F.split(F.lower(F.col(content_col)), "[^a-z0-9]+")
            ).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    from pyspark.sql import Window

    return tf.withColumn(
        "doclen", F.sum("tf").over(Window.partitionBy(id_col))
    )


def term_positions(
    docs: DataFrame,
    content_col: str = "content",
    id_cols: list[str] | None = None,
    mode: str = "text",
    lang_col: str | None = None,
    **tok_kw,
) -> DataFrame:
    """Positional variant of :func:`term_frequencies`: one row per
    (doc, term) with ``positions`` = sorted 0-based token indices of the
    term in the doc's SURVIVING token stream (post stop/stem for the
    analyzer modes; post empty-filter for ``simple``). tf == size(positions)
    for real terms; synthetic ``lang:<x>`` tags carry tf=1 and EMPTY
    positions (they have no location in the text, and phrase matching must
    never cross into the tag namespace).

    Shuffle shape: tokenize (narrow Arrow UDF / JVM split) -> posexplode
    (narrow) -> ONE groupBy (doc, term) carrying (count, collect_list(pos)).
    Unlike term_frequencies' map-side pre-aggregation this shuffles one row
    per token OCCURRENCE — the unavoidable cost of positions (every
    positional index pays it; Lucene's .pos files are the same trade).
    Positions are what make phrase/proximity queries index-resident instead
    of a post-retrieval content re-scan.
    """
    if id_cols is None:
        id_cols = ["doc_id"]
    if mode == "simple":
        if id_cols != ["doc_id"]:
            raise ValueError("mode='simple' supports id_cols=['doc_id'] only")
        if tok_kw:
            raise ValueError("mode='simple' takes no tokenizer options")
        # lang_col composes: the tag-append below is tokenizer-agnostic
        toks_col = F.filter(
            F.split(F.lower(F.col(content_col)), "[^a-z0-9]+"),
            lambda x: x != "",
        )
    else:
        from mahout_spark.functions import tokenize_udf

        toks_col = tokenize_udf(mode=mode, **tok_kw)(F.col(content_col))
    staged = docs.filter(F.col(content_col).isNotNull()).withColumn(
        "_toks", toks_col
    )
    # doclen counts CONTENT tokens only; the optional lang tag is appended
    # to the stream afterwards so one tokenizer pass serves both (the tag's
    # transient position is stripped below — _toks is referenced twice here,
    # which holds the projection barrier against CollapseProject re-running
    # the tokenizer per element; see textstats.py module docstring).
    staged = staged.withColumn("_doclen", F.size("_toks"))
    if lang_col is not None:
        tag = F.concat(F.lit("lang:"), F.lower(F.col(lang_col)))
        staged = staged.withColumn(
            "_toks",
            F.when(
                F.col(lang_col).isNotNull(),
                F.concat(F.col("_toks"), F.array(tag)),
            ).otherwise(F.col("_toks")),
        )
    out = (
        staged.select(
            *id_cols, "_doclen",
            F.posexplode("_toks").alias("pos", "term"),
        )
        .groupBy(*id_cols, "term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("tf"),
            F.sort_array(F.collect_list("pos")).alias("positions"),
            F.first("_doclen").cast("long").alias("doclen"),
        )
    )
    if lang_col is not None:
        out = out.withColumn(
            "positions",
            F.when(
                F.col("term").startswith("lang:"),
                F.array().cast("array<int>"),
            ).otherwise(F.col("positions")),
        )
    return out


def wordcount(term_freqs: DataFrame) -> DataFrame:
    """A1: corpus-wide term occurrence counts (the reference's wordcount
    artifact, sample at reference README.md:36-72)."""
    return term_freqs.groupBy("term").agg(F.sum("tf").alias("count"))


def document_frequency(term_freqs: DataFrame) -> DataFrame:
    """A4: df per term. term_freqs is already distinct per (doc, term), so
    a plain count is an exact count-distinct of docs (never approximate —
    rank-identity requires exact df)."""
    return term_freqs.groupBy("term").agg(F.count(F.lit(1)).alias("df"))


def doc_lengths(term_freqs: DataFrame, id_cols: list[str] | None = None) -> DataFrame:
    """A6: per-doc length (sum of tf == doclen column carried per row)."""
    if id_cols is None:
        id_cols = ["doc_id"]
    return term_freqs.groupBy(*id_cols).agg(F.max("doclen").alias("doclen"))


def corpus_stats(docs: DataFrame, term_freqs: DataFrame,
                 id_cols: list[str] | None = None) -> tuple[int, float]:
    """(N, avgdl). N counts all docs (a doc whose tokens are all filtered
    still counts toward N, matching the reference where every ingested doc
    reaches the vectorizer); avgdl averages over docs with >=1 term."""
    n_docs = docs.count()
    row = doc_lengths(term_freqs, id_cols).agg(F.avg("doclen")).first()
    avgdl = float(row[0]) if row[0] is not None else 0.0
    return n_docs, avgdl


def dictionary(term_freqs: DataFrame) -> DataFrame:
    """A3: the reference's dictionary.file-0 — distinct terms with dense
    deterministic ids (global rank in term sort order)."""
    return dense_ids(term_freqs.select("term").distinct(), ["term"], "term_id")
