"""Phrase snippets over the documents table — pure JVM expressions.

The reference's flagship human-facing artifact is the snippet report
(`MahoutTermFinderMwkSnpt*.java`, report_clusters_snippets.txt): matched
docs are rendered as the matching REGION, not the whole doc. This is the
engine's analog for phrase hits: for every doc whose simple-tokenized
stream contains the phrase contiguously, emit the first occurrence's
0-based token index and a ±context-token window.

Implementation notes:

* The token stream re-joined with single spaces turns contiguous-token
  matching into one ``locate`` — the same relation the DuckDB oracle
  uses (LIKE / strpos), so the operator is hash-checkable end-to-end.
* The first occurrence's token index = (spaces in the stream prefix up
  to the match) - 1; the snippet is an ``slice``/``array_join`` over the
  already-computed token array. Everything stays inside whole-stage
  codegen — no UDF, no shuffle, one narrow scan.
* CollapseProject staging rule (textstats.py module docstring): ``_toks``
  and ``_stream`` are each referenced >= 2 times downstream, so Catalyst
  cannot inline the tokenizer into per-element lambdas; gated by the
  plan-audit test asserting the tokenizer appears exactly once.

Scale shape: map-only over the corpus — at 100 TB run it on
``phrase_topk``'s ≤k results (semi-join the ids first) rather than the
full table; standalone full-corpus mode exists for report jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def first_match_snippets(
    docs: DataFrame,
    terms: list[str],
    content_col: str = "text",
    id_cols: list[str] | None = None,
    context: int = 3,
    pre_tag: str = "<em>",
    post_tag: str = "</em>",
) -> DataFrame:
    """Per doc containing ANY of ``terms`` (simple tokenizer):
    ``(*id_cols, first_pos, snippet)`` — ``first_pos`` is the 0-based
    token index of the FIRST occurrence of any term, and ``snippet``
    re-joins the ``2*context+1`` token window centered there (clipped to
    the doc) with every ``terms`` token wrapped in ``pre_tag``/
    ``post_tag`` (the ES highlight fragment shape). Pure JVM expressions
    — one ``array_position`` per term over the staged token array, no
    UDF, no shuffle; the index-integrated entry point is
    ``boolquery.highlight``, which semi-joins the corpus to the match
    set first so this pass only ever reads matching docs."""
    if not terms:
        raise ValueError("empty term list")
    if id_cols is None:
        id_cols = ["doc_id"]
    toks = F.filter(
        F.split(F.lower(F.col(content_col)), "[^a-z0-9]+"),
        lambda x: x != "",
    )
    # 1-based first positions per term; 0 = absent
    pos_arr = F.array(*[F.array_position("_toks", F.lit(t)) for t in terms])
    term_arr = F.array(*[F.lit(t) for t in terms])
    staged = (
        docs.filter(F.col(content_col).isNotNull())
        .withColumn("_toks", toks)
        .withColumn("_hits", F.filter(pos_arr, lambda x: x > 0))
        .filter(F.size("_hits") > 0)
        .withColumn("_first", (F.array_min("_hits") - 1).cast("long"))
    )
    start0 = F.greatest(F.col("_first") - F.lit(context), F.lit(0))
    end0 = F.least(
        F.col("_first") + F.lit(context + 1), F.size("_toks").cast("long")
    )
    wrapped = F.transform(
        F.slice("_toks", (start0 + 1).cast("int"),
                (end0 - start0).cast("int")),
        lambda t: F.when(
            F.array_contains(term_arr, t),
            F.concat(F.lit(pre_tag), t, F.lit(post_tag)),
        ).otherwise(t),
    )
    return staged.select(
        *id_cols,
        F.col("_first").alias("first_pos"),
        F.array_join(wrapped, " ").alias("snippet"),
    )


def phrase_snippets(
    docs: DataFrame,
    phrase: list[str],
    content_col: str = "text",
    id_cols: list[str] | None = None,
    context: int = 3,
) -> DataFrame:
    """One row per doc containing ``phrase`` as a contiguous token
    sequence (simple tokenizer): ``(*id_cols, first_pos, snippet)`` where
    ``first_pos`` is the 0-based token index of the FIRST occurrence and
    ``snippet`` re-joins tokens ``[first_pos - context, first_pos +
    len(phrase) + context)`` clipped to the doc."""
    if not phrase:
        raise ValueError("empty phrase")
    if id_cols is None:
        id_cols = ["doc_id"]
    needle = " " + " ".join(phrase) + " "
    span = len(phrase) + context

    toks = F.filter(
        F.split(F.lower(F.col(content_col)), "[^a-z0-9]+"),
        lambda x: x != "",
    )
    staged = (
        docs.filter(F.col(content_col).isNotNull())
        .withColumn("_toks", toks)
        .withColumn(
            "_stream",
            F.concat(F.lit(" "), F.array_join("_toks", " "), F.lit(" ")),
        )
        .withColumn("_loc", F.locate(needle, "_stream"))
        .filter(F.col("_loc") > 0)
    )
    # token index of the match = spaces in stream[1.._loc] - 1 (the stream
    # leads with a space, and the match starts ON a space)
    prefix = F.col("_stream").substr(F.lit(1), F.col("_loc"))
    first_pos = (
        F.length(prefix) - F.length(F.regexp_replace(prefix, " ", "")) - 1
    ).cast("long")
    staged = staged.withColumn("_first", first_pos)
    start0 = F.greatest(F.col("_first") - F.lit(context), F.lit(0))
    end0 = F.least(
        F.col("_first") + F.lit(span), F.size("_toks").cast("long")
    )
    return staged.select(
        *id_cols,
        F.col("_first").alias("first_pos"),
        F.array_join(
            F.slice(
                "_toks",
                (start0 + 1).cast("int"),
                (end0 - start0).cast("int"),
            ),
            " ",
        ).alias("snippet"),
    )
