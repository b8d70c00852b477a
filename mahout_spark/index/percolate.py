"""Percolation: stored queries evaluated against incoming documents.

The ES percolator model, inverted retrieval: instead of a query
searching an index of documents, a DOCUMENT is matched against a
registry of stored queries — the ingest-time shape for routing, alert
rules, taxonomy tagging, and training-data labeling ("every doc
matching rule R gets tag T"). Reference analog: the mwk pipeline's
per-category keyword screens, generalized to the full query language.

Spark-first design: each stored query compiles to a pure JVM BOOLEAN
COLUMN over the document's token array — term leaves are
``array_contains``, prefix/wildcard/regexp leaves are ``exists`` with
the same anchored patterns the index expansions use, fuzzy leaves the
threshold ``levenshtein``, adjacent phrases a padded token-stream
``contains`` (the same trick the DuckDB phrase oracle uses) — and the
whole registry evaluates in ONE narrow projection: no index, no
shuffle, no Python, cost linear in docs x registry size with
whole-stage codegen across the query set. Because the plan is a
stateless projection it runs UNCHANGED under Structured Streaming
(gated by a streaming test): percolation at ingest is the same call on
a readStream frame.

Matching semantics mirror boolquery exactly (same parser, same
synonym/minimum_should_match preprocessing, NOT as filter, boosts
ignored — percolation is match-only), with one deliberate difference:
prefix/fuzzy/wildcard/regexp leaves here are the PURE predicate over
the doc's own tokens — no max_expansions cap, because there is no
lexicon expansion step to cap. Retrieval and percolation therefore
agree exactly until a pattern matches more than ``max_expansions``
lexicon terms (where retrieval's capped expansion is the documented
approximation, not this). Slop phrases are rejected: token positions
are not materialized here (use the positional index + phrase_topk for
proximity retrieval).

Scale note: this evaluates EVERY stored query per doc — right up to
registries of a few thousand rules (codegen handles wide boolean
projections well). At 10^5+ stored queries the standard trick is a
prefilter index OVER THE QUERIES (index query terms, candidate-select
rules whose required terms appear in the doc) — that tier slots in
front of this same compiled evaluator.
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mahout_spark.index import queryparse as qp


def _leaf_patterns_ok(node, allow_fields: bool = False) -> None:
    kind = node[0]
    if kind == "phrase" and node[2] is not None:
        raise ValueError(
            "slop phrases are not supported in percolation (no positions "
            "materialized); use the positional index for proximity"
        )
    # Field-tag leaves (e.g. lang:java) only exist as SYNTHETIC tokens the
    # indexer posts from a lang column — the simple tokenizer can never
    # emit ':'. Without a lang_col seam here they would silently never
    # match any document; reject loudly instead (ADVICE round 3).
    if (not allow_fields and kind in ("term", "prefix", "wildcard", "regexp")
            and ":" in node[1]):
        raise ValueError(
            f"field-tag leaf {node[1]!r} can never match: the tokenizer "
            "never emits ':'; pass lang_col= to percolate() so the "
            "synthetic 'lang:<x>' tag is appended to each doc's tokens"
        )
    if kind in ("not", "boost"):
        _leaf_patterns_ok(node[1], allow_fields)
    elif kind in ("and", "or", "msm"):
        for c in node[1]:
            _leaf_patterns_ok(c, allow_fields)


def _compile_node(node, toks: Column, stream: Column) -> Column:
    """Query tree -> boolean Column over (token array, padded stream)."""
    kind = node[0]
    if kind == "term":
        return F.array_contains(toks, node[1])
    if kind == "prefix":
        p = node[1]
        return F.exists(toks, lambda t: t.startswith(p))
    if kind == "wildcard":
        rx = qp.wildcard_regex(node[1])
        return F.exists(toks, lambda t: t.rlike(rx))
    if kind == "regexp":
        rx = f"^(?:{node[1]})$"
        return F.exists(toks, lambda t: t.rlike(rx))
    if kind == "fuzzy":
        stem, n = node[1], node[2]
        return F.exists(
            toks, lambda t: F.levenshtein(t, F.lit(stem), n) >= 0
        )
    if kind == "phrase":
        seq = " ".join(node[1])
        return stream.contains(f" {seq} ")
    if kind == "boost":
        return _compile_node(node[1], toks, stream)
    if kind == "not":
        return ~_compile_node(node[1], toks, stream)
    if kind == "and":
        return functools.reduce(
            lambda a, b: a & b,
            (_compile_node(c, toks, stream) for c in node[1]),
        )
    if kind == "or":
        return functools.reduce(
            lambda a, b: a | b,
            (_compile_node(c, toks, stream) for c in node[1]),
        )
    if kind == "msm":
        count = functools.reduce(
            lambda a, b: a + b,
            (_compile_node(c, toks, stream).cast("int") for c in node[1]),
        )
        return count >= node[2]
    raise ValueError(f"unexpected node kind in percolation: {kind!r}")


def percolate(
    spark,
    queries: dict,
    docs: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    normalize=None,
    synonyms: dict | None = None,
    minimum_should_match: int = 0,
    lang_col: str | None = None,
) -> DataFrame:
    """Match every doc in ``docs`` against every stored query:
    ``DataFrame[<id_col>, query_id]``, one row per (doc, matching
    query). ``queries`` maps query_id -> query string (queryparse
    grammar) or pre-built node tree. Tokenization is the SQL-expressible
    simple tokenizer (split/lower — the mode='simple' index stream), so
    percolation decisions agree with a simple-mode index's match sets
    (and with the DuckDB oracle). With ``lang_col`` the synthetic
    ``lang:<lowercased value>`` tag is appended to each doc's token set
    (exactly the tf=1 row stats.term_frequencies posts), so field-tag
    query leaves match; without it such leaves are rejected at compile
    time rather than silently never matching. Tags stay OUT of the
    phrase stream, mirroring the indexer's empty-positions contract.
    The compiled plan is one narrow stateless projection — it accepts a
    Structured Streaming frame unchanged."""
    norm = qp._simple_normalize if normalize is None else normalize
    if not queries:
        return spark.createDataFrame(
            [], f"{id_col} long, query_id string"
        )
    nodes = {}
    for qid, q in sorted(queries.items()):
        if isinstance(q, str):
            node = qp.parse(q) if normalize is None else qp.parse(q, norm)
        else:
            qp.validate(q)
            node = q
        if synonyms:
            node = qp.expand_synonyms(node, synonyms, norm)
        if minimum_should_match:
            node = qp.with_minimum_should_match(node, minimum_should_match)
        _leaf_patterns_ok(node, allow_fields=lang_col is not None)
        nodes[qid] = node

    # staged projection: the token array is aliased once and referenced
    # by every leaf — the >=2-reference barrier that keeps Catalyst's
    # CollapseProject from inlining the tokenizer into each leaf expr
    # (the round-3 lesson; see textstats.py)
    from mahout_spark.operators.textstats import tokens_expr

    staged = docs.select(
        F.col(id_col),
        tokens_expr(F.col(content_col)).alias("_raw"),
        *([F.lower(F.col(lang_col)).alias("_lang")] if lang_col else []),
    ).select(
        id_col,
        # token set for leaf matching: raw tokens + the synthetic lang
        # tag (when present); the phrase stream is built from raw tokens
        # ONLY — tags carry no positions in the indexer either
        (
            F.when(
                F.col("_lang").isNotNull(),
                F.concat(
                    F.col("_raw"),
                    F.array(F.concat(F.lit("lang:"), F.col("_lang"))),
                ),
            ).otherwise(F.col("_raw"))
            if lang_col else F.col("_raw")
        ).alias("_toks"),
        F.concat(
            F.lit(" "), F.array_join("_raw", " "), F.lit(" ")
        ).alias("_stream"),
    )
    toks, stream = F.col("_toks"), F.col("_stream")
    hits = F.array(*[
        F.when(_compile_node(node, toks, stream), F.lit(qid))
        for qid, node in nodes.items()
    ])
    return staged.select(
        id_col,
        F.explode(F.filter(hits, lambda x: x.isNotNull())).alias("query_id"),
    )
