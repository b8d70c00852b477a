"""Numeric range filters in the query language (X75).

Lucene/ES expose range predicates over doc-values fields inside the
query string — ``n_chars:[200 TO 450]``, ``{.. ..}`` exclusive, ``*``
open — evaluated as FILTER CONTEXT: they restrict the match set and
never contribute to the BM25 score (ES puts ranges in ``bool.filter``;
Lucene's query-context constant-score-1 is deliberately not reproduced —
a constant additive term would break the SQL-expressible score relation
for zero user value). Reference analog: the score-threshold filters
(F5/F9, ``MahoutTermFinderMwk.java:131-139``) are fixed-function range
predicates over a computed column; this generalizes them to user-named
corpus columns inside the query grammar.

Architecture: the inverted index stores terms, not corpus columns, so a
range leaf compiles to a predicate over the DOCS TABLE and rides the
adaptive filter-context seam (boolquery.filtered_topk — X61): small
filter sets ship to the shard kernels, large ones stay relational as a
LEFT SEMI join. At 100 TB the predicate is a pushed parquet/Iceberg
filter over a two-column projection (id + field) — min/max row-group
stats prune it like any warehouse scan; nothing corpus-shaped crosses
the driver in the relational regime.

Semantics pinned by tests:
* validation (queryparse.validate) allows range leaves only in
  top-conjunct position — the root, conjuncts of the root AND, or
  directly under such a conjunct's NOT;
* a NULL field value never matches a range; under NOT the doc SURVIVES
  (must_not excludes only docs the range matched — ES semantics);
* the query must keep at least one positive scoring leaf after the
  range conjuncts are stripped (a pure-filter query has no ranking).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mahout_spark.index.boolquery import boolean_topk, filtered_topk, matching_docs
from mahout_spark.index.queryparse import (
    DEFAULT_FIELDS,
    QueryParseError,
    parse,
    split_range_filters,
    validate,
)
from mahout_spark.sources.catalog import ParquetCatalog

_NUMERIC_TYPES = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def numeric_range_fields(docs: DataFrame) -> frozenset:
    """The docs table's rangeable columns — every numeric column (the
    ES-mapping analog: numeric doc values accept range queries)."""
    return frozenset(
        f.name.lower() for f in docs.schema.fields
        if isinstance(f.dataType, _NUMERIC_TYPES)
    )


def range_predicate(specs: list) -> F.Column:
    """One Column predicate ANDing the range specs
    (``(field, lo, hi, lo_inc, hi_inc, negated)`` from
    queryparse.split_range_filters). NULL field values never match a
    positive range and always survive a negated one (must_not excludes
    only matched docs), so each spec's match test is coalesced to False
    before any negation."""
    if not specs:
        raise ValueError("no range specs")
    pred = None
    for field, lo, hi, lo_inc, hi_inc, negated in specs:
        col = F.col(field)
        parts = []
        if lo is not None:
            parts.append(col >= F.lit(lo) if lo_inc else col > F.lit(lo))
        if hi is not None:
            parts.append(col <= F.lit(hi) if hi_inc else col < F.lit(hi))
        matched = parts[0]
        for p in parts[1:]:
            matched = matched & p
        matched = F.coalesce(matched, F.lit(False))
        if negated:
            matched = ~matched
        pred = matched if pred is None else (pred & matched)
    return pred


def _split(query, docs, range_fields, normalize):
    fields = (
        numeric_range_fields(docs) if range_fields is None
        else frozenset(x.lower() for x in range_fields)
    )
    if isinstance(query, str):
        kw = {"range_fields": fields}
        if normalize is not None:
            kw["normalize"] = normalize
        node = parse(query, fields=DEFAULT_FIELDS, **kw)
    else:
        validate(query)
        node = query
    residual, specs = split_range_filters(node)
    if specs and residual is None:
        raise QueryParseError(
            "pure-range queries have no ranking: add at least one "
            "scoring leaf (term/phrase/prefix/...) beside the range "
            "filters, or evaluate the predicate directly on the docs "
            "table"
        )
    return residual, specs


def ranged_topk(
    spark: SparkSession,
    cat: ParquetCatalog,
    docs: DataFrame,
    query,
    k: int = 10,
    id_col: str = "doc_id",
    range_fields=None,
    max_collect: int = 1 << 20,
    normalize=None,
    **kw,
) -> DataFrame:
    """Top-k retrieval for a query carrying ``field:[lo TO hi]`` range
    conjuncts: the ranges strip into one docs-table predicate, the
    boolean residual runs through the adaptive filter-context plan
    (filtered_topk — kernel mask below ``max_collect`` distinct ids,
    relational semi-join above), scores untouched by the filter.
    ``range_fields=None`` whitelists every numeric docs column; a
    range-free query delegates straight to boolean_topk. ``**kw``
    passes through (after/minimum_should_match/synonyms/...)."""
    residual, specs = _split(query, docs, range_fields, normalize)
    if not specs:
        return boolean_topk(spark, cat, residual, k=k,
                            normalize=normalize, **kw)
    flt = docs.filter(range_predicate(specs)).select(
        F.col(id_col).alias("doc_id")
    )
    return filtered_topk(spark, cat, residual, flt, k=k,
                         max_collect=max_collect, normalize=normalize, **kw)


def ranged_matching_docs(
    spark: SparkSession,
    cat: ParquetCatalog,
    docs: DataFrame,
    query,
    id_col: str = "doc_id",
    range_fields=None,
    normalize=None,
    **kw,
) -> DataFrame:
    """The unranked match set under range conjuncts — matching_docs'
    distributed ``DataFrame[doc_id]`` semi-joined to the range
    predicate; composes into facet_counts / manifests like any match
    set. Always relational (a match set has no interactive regime)."""
    residual, specs = _split(query, docs, range_fields, normalize)
    matched = matching_docs(spark, cat, residual, normalize=normalize, **kw)
    if not specs:
        return matched
    flt = docs.filter(range_predicate(specs)).select(
        F.col(id_col).alias("doc_id")
    )
    return matched.join(flt, "doc_id", "left_semi")
