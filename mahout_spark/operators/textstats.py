"""Text-analysis operators for large-scale training-data pipelines.

Language-ID, quality scoring, token counting, and document fingerprinting
over a ``documents(doc_id, text, ...)`` table. These generalize the
reference's corpus-statistics stage (wordcount / stop-word profiling,
``shell_simplification/cat_with_filename.sh:16-40`` and ``stopwords.txt``)
into the per-document quality/identity signals a 100 TB pretraining
pipeline computes before dedup + filtering.

Every operator here is a **pure Spark column expression** — no Python UDFs
at all, so the whole thing stays inside whole-stage codegen and scales
linearly with input splits (narrow; the only possible shuffle is
``spread_input``'s upward repartition of a pathologically few-split
source, a no-op on real multi-split corpora). Each has an
exactly-equivalent ANSI-SQL form (used as the DuckDB oracle in
``__spark_entry__``): expressions are written so both engines perform the
identical arithmetic in the identical order.

Staged-projection idiom: each operator first projects its expensive
derived value (token array, lowercased prefix) under an alias and
references that alias ≥2 times in the consuming select. Catalyst's
CollapseProject inlines single-use aliases into their consumers —
including into HOF lambda bodies, where an inlined tokenizer re-runs
once per ELEMENT (measured 3-30x re-evaluation in the round-2 shapes of
lang_id/fingerprints/chunk_documents). The double reference keeps the
projection boundary, so split/lower run exactly once per document.

Determinism rules (cross-engine hash equality):
* counts are exact integers;
* ratios are computed in double and ``round(x, 6)`` once, at the end;
* argmax tie-breaks lexicographically on the language code.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mahout_spark.checkpoint import spread_input

# Small inline stopword profile (subset of the reference's 665-word
# stopwords.txt) — inlined because the oracle SQL must embed the same list.
STOP30 = [
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "from",
    "has", "have", "in", "is", "it", "its", "of", "on", "or", "that", "the",
    "this", "to", "was", "were", "which", "will", "with", "you",
]

# Marker-word profiles for heuristic language ID (public-knowledge common
# function words per language). Deterministic: hits = |distinct tokens ∩
# markers|; argmax with lexicographic tie-break on the code.
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "ich"],
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "it"],
    "es": ["el", "los", "las", "es", "una", "por", "con", "para", "del", "como"],
    "fr": ["le", "les", "des", "est", "une", "dans", "pour", "que", "sur", "pas"],
}

FINGERPRINT_PREFIX = 256  # chars hashed by the positional fingerprint
FINGERPRINT_CYCLE = 64    # positional weight cycle length


def tokens_expr(content: Column) -> Column:
    """lower + split on ``[^a-z0-9]+`` + drop empties — the SQL-expressible
    tokenizer (same stream as operators.stats.simple_term_frequencies)."""
    return F.filter(
        F.split(F.lower(content), "[^a-z0-9]+"), lambda t: t != ""
    )


def token_counts(
    docs: DataFrame, content_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc token accounting: whitespace-ish word tokens, distinct terms,
    and a BPE-ish subword estimate (ceil(len/4) per word — the standard
    chars/4 rule of thumb applied per token so punctuation-free token
    boundaries are respected)."""
    staged = spread_input(docs).select(
        id_col,
        F.length(F.col(content_col)).cast("long").alias("n_chars"),
        tokens_expr(F.col(content_col)).alias("_toks"),
    )
    toks = F.col("_toks")  # referenced 3x -> tokenize once per doc
    return staged.select(
        id_col,
        "n_chars",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.aggregate(
            toks,
            F.lit(0).cast("long"),
            lambda acc, t: acc + F.ceil(F.length(t) / F.lit(4.0)),
        ).alias("bpe_est"),
    )


def quality_scores(
    docs: DataFrame, content_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style heuristic quality signals + one combined score.

    * ``alpha_ratio`` — fraction of characters that are [a-z0-9 ] after
      lowercasing (markup/binary junk pushes this down);
    * ``stop_ratio`` — fraction of tokens in the stopword profile (natural
      prose has a healthy share of function words; near-zero is a red flag);
    * ``len_score`` — min(1, n_tokens / 50) (too-short docs score low);
    * ``quality`` — 0.4·alpha + 0.3·min(1, 5·stop_ratio) + 0.3·len_score.

    All ratios double-precision, rounded once to 6 at the end.
    """
    staged = (
        spread_input(docs)
        .filter(F.length(F.col(content_col)) > 0)
        .select(
            id_col,
            F.lower(F.col(content_col)).alias("_c"),
            tokens_expr(F.col(content_col)).alias("_toks"),
        )
    )
    c = F.col("_c")          # referenced 2x -> lowered once per doc
    toks = F.col("_toks")    # referenced 2x -> tokenized once per doc
    n_tokens = F.size(toks)
    n_stop = F.size(
        F.filter(toks, lambda t: t.isin(STOP30))
    )
    alpha_chars = F.length(F.regexp_replace(c, "[^a-z0-9 ]", ""))
    # try_divide, not /: the length(>0) filter above guarantees a nonzero
    # divisor HERE, but a caller's downstream filter (e.g. the X131
    # funnel's quality gate) can be conjunction-merged with it and
    # evaluate this division on an empty doc first — ANSI mode then
    # fails the whole job on a row the filter was about to drop
    alpha_ratio = F.try_divide(alpha_chars, F.length(c))
    stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0))
    len_score = F.least(F.lit(1.0), n_tokens / F.lit(50.0))
    quality = (
        F.lit(0.4) * alpha_ratio
        + F.lit(0.3) * F.least(F.lit(1.0), F.lit(5.0) * stop_ratio)
        + F.lit(0.3) * len_score
    )
    return staged.select(
        id_col,
        n_tokens.cast("long").alias("n_tokens"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(quality, 6).alias("quality"),
    )


def lang_id(
    docs: DataFrame, content_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Heuristic language ID: per-language marker-word hit count over the
    distinct token set; prediction = argmax hits with lexicographic
    tie-break among nonzero scores, and ``'und'`` (undetermined) when NO
    marker matched — zero evidence is reported as such, not as whichever
    language sorts first. Returns (doc_id, pred_lang, hits).
    """
    s_toks = spread_input(docs).select(
        id_col,
        F.array_distinct(tokens_expr(F.col(content_col))).alias("_toks"),
    )
    toks = F.col("_toks")  # referenced once per language -> tokenize once
    s_hits = s_toks.select(
        id_col,
        F.array(*[
            F.struct(
                F.size(
                    F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))
                ).alias("hits"),
                F.lit(code).alias("lang"),
            )
            for code, words in sorted(LANG_MARKERS.items())
        ]).alias("_hits"),
    )
    # argmax by (hits desc, lang asc), staged so neither the hits array
    # nor max_hits is recomputed inside lambda bodies: project max_hits
    # first, then filter to it and take the min lang among ties.
    s_max = s_hits.select(
        id_col,
        "_hits",
        F.array_max(
            F.transform(F.col("_hits"), lambda s: s["hits"])
        ).alias("_mx"),
    )
    winner = F.array_min(
        F.transform(
            F.filter(F.col("_hits"), lambda s: s["hits"] == F.col("_mx")),
            lambda s: s["lang"],
        )
    )
    return s_max.select(
        id_col,
        F.when(F.col("_mx") > 0, winner).otherwise(F.lit("und"))
        .alias("pred_lang"),
        F.col("_mx").cast("long").alias("hits"),
    )


def chunk_documents(
    docs: DataFrame, chunk_tokens: int = 64, overlap: int = 16,
    content_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into overlapping token windows — the training-data
    prep step that turns long documents into model-sized samples.

    Chunk i covers tokens [i·stride, i·stride + chunk_tokens) with
    stride = chunk_tokens − overlap; the last window is emitted iff it
    contains new tokens. Pure JVM (split / sequence / transform /
    posexplode-shaped) — a narrow map, no shuffle, no Python.

    Returns (doc_id, chunk_id, n_chunk_tokens, chunk_text).
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    staged = spread_input(docs).select(
        F.col(id_col).alias("doc_id"),
        tokens_expr(F.col(content_col)).alias("_toks"),
    )
    toks = F.col("_toks")  # referenced in n_chunks AND slice-per-chunk:
    # without the staged projection the tokenizer would be inlined into
    # the per-chunk lambda and re-run once per chunk (~n/stride times)
    n = F.size(toks)
    n_chunks = F.when(
        n <= 0, F.lit(0)
    ).otherwise(
        F.floor((F.greatest(n - F.lit(chunk_tokens), F.lit(0)))
                / F.lit(stride)) + 1
        + F.when(
            (n > chunk_tokens)
            & (F.pmod(n - F.lit(chunk_tokens), F.lit(stride)) > 0),
            F.lit(1),
        ).otherwise(F.lit(0))
    )
    # guard: Spark's sequence(0, -1) yields a DESCENDING sequence, so the
    # empty-doc case must short-circuit before it
    chunks = F.when(
        n_chunks > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.struct(
                i.cast("int").alias("chunk_id"),
                F.slice(toks, i * stride + 1, chunk_tokens).alias("ctoks"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<chunk_id:int,ctoks:array<string>>>"))
    exploded = staged.select("doc_id", F.explode(chunks).alias("c"))
    return exploded.select(
        "doc_id",
        F.col("c.chunk_id").alias("chunk_id"),
        F.size("c.ctoks").cast("long").alias("n_chunk_tokens"),
        F.concat_ws(" ", F.col("c.ctoks")).alias("chunk_text"),
    )


def fingerprints(
    docs: DataFrame, content_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic positional document fingerprint: over the first
    ``FINGERPRINT_PREFIX`` chars, sum codepoint(c_j) · (((j-1) mod 64) + 1)
    (j 1-based). Order-sensitive (unlike a bag-of-chars sum), bounded
    arithmetic (fits bigint), and exactly expressible in ANSI SQL — the
    cross-engine-checkable stand-in for a rolling Rabin hash, which the
    pipeline uses for cheap first-pass identity blocking before MinHash.
    """
    staged = spread_input(docs).select(
        id_col,
        F.substring(F.col(content_col), 1, FINGERPRINT_PREFIX).alias("_c"),
    )
    c = F.col("_c")  # referenced 2x (length + per-char lambda) -> the
    # prefix is materialized once per doc, not re-substringed per char
    n = F.length(c)
    fp = F.when(n > 0, F.aggregate(
        F.sequence(F.lit(1), n),
        F.lit(0).cast("long"),
        lambda acc, i: acc
        + F.ascii(F.substring(c, i, F.lit(1)))
        * (F.pmod(i - 1, F.lit(FINGERPRINT_CYCLE)) + 1),
    )).otherwise(F.lit(0).cast("long"))
    return staged.select(id_col, fp.alias("fp"))
