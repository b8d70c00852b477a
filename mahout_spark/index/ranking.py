"""Alternative result orderings over the boolean match set (X76/X78).

Two ES surfaces the ranked-retrieval entry points don't cover:

* ``sorted_topk`` — the ES ``sort`` parameter: order matching docs by
  CORPUS COLUMNS instead of relevance (newest-first feeds, shortest-doc
  triage, numeric leaderboards). BM25 never runs — the match set is
  unranked (matching_docs) and the ordering is a docs-table sort.
* ``function_score_topk`` — ES ``function_score`` with a
  ``field_value_factor``: blend the BM25 score with a per-doc signal
  column (popularity, freshness, quality) as
  ``bm25 (*|+) weight * modifier(factor * field)``.

Physical shape at 100 TB: both are (distributed match set) ⋈ (docs
projection of id + the named columns) — AQE broadcasts whichever side
is small — followed by ``TakeOrderedAndProject`` for the global top-k
(never a full sort; Spark keeps k rows per partition then merges).
Cursor pagination on ``sorted_topk`` filters BEFORE the cut, so page N
costs page 1, mirroring boolquery's search_after contract.

Reference analog: the report stage's global ``sort`` over output lines
(``run.sh:25``) and the awk reorder/threshold filters
(``mwkSnippetCommands.awk:2-5``) are fixed-function sort-by-field; this
generalizes them behind the query language.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mahout_spark.index.boolquery import matching_docs, score_matches
from mahout_spark.sources.catalog import ParquetCatalog

#: field_value_factor modifiers (the useful ES subset; all JVM exprs).
_MODIFIERS = {
    "none": lambda c: c,
    "log1p": F.log1p,
    "sqrt": F.sqrt,
}


def _sort_spec(sort) -> list[tuple[str, bool]]:
    """Normalize a sort argument to [(col, ascending)]: entries are
    ``"col"`` (asc), ``"-col"`` (desc), or ``(col, "asc"|"desc")``."""
    if isinstance(sort, (str, tuple)):
        sort = [sort]
    out = []
    for s in sort:
        if isinstance(s, str):
            out.append((s[1:], False) if s.startswith("-") else (s, True))
        else:
            col, d = s
            if d not in ("asc", "desc"):
                raise ValueError(f"sort direction must be asc|desc: {d!r}")
            out.append((col, d == "asc"))
    if not out:
        raise ValueError("empty sort spec")
    return out


def _after_predicate(spec: list[tuple[str, bool]], id_col: str, after):
    """Strict lexicographic 'after the cursor' predicate for a mixed
    asc/desc sort. ``after`` is the previous page's last Row (or a dict
    with the sort columns + doc_id, or a values tuple in sort order with
    doc_id last). NULL cursor values are rejected — NULL-sorted rows are
    excluded from sorted retrieval entirely (see sorted_topk)."""
    if hasattr(after, "asDict"):
        after = after.asDict()
    keys = [c for c, _ in spec] + [id_col]
    if isinstance(after, dict):
        try:
            vals = [after[c] for c in keys]
        except KeyError as e:
            raise ValueError(
                f"after row/dict must carry the sort columns + {id_col}"
            ) from e
    else:
        vals = list(after)
        if len(vals) != len(keys):
            raise ValueError(
                f"after tuple must have {len(keys)} values "
                f"(sort columns + {id_col}), got {len(vals)}"
            )
    if any(v is None for v in vals):
        raise ValueError("after cursor values must be non-NULL")
    dirs = [asc for _, asc in spec] + [True]
    pred = None
    for i in range(len(keys)):
        strict = (F.col(keys[i]) > F.lit(vals[i]) if dirs[i]
                  else F.col(keys[i]) < F.lit(vals[i]))
        for j in range(i):
            strict = strict & (F.col(keys[j]) == F.lit(vals[j]))
        pred = strict if pred is None else (pred | strict)
    return pred


def sorted_topk(
    spark: SparkSession,
    cat: ParquetCatalog,
    docs: DataFrame,
    query,
    sort,
    k: int = 10,
    id_col: str = "doc_id",
    after=None,
    **kw,
) -> DataFrame:
    """Top-``k`` docs matching ``query`` ordered by corpus columns (the
    ES ``sort`` parameter): ``sort`` is ``"col"`` / ``"-col"`` / a list
    of those / ``(col, "asc"|"desc")`` tuples; ``doc_id`` asc is always
    the final tiebreak, so the order is total and pages are stable.
    Rows with a NULL in any sort column are EXCLUDED (ES requires doc
    values or an explicit ``missing`` sentinel; a NULL inside a strict
    cursor predicate is unanswerable) — project a ``coalesce`` column
    into ``docs`` to keep them with a sentinel. Output columns:
    ``doc_id`` + the sort columns (exactly what the ``after`` cursor
    needs). ``**kw`` passes to matching_docs (synonyms, mm, ...)."""
    spec = _sort_spec(sort)
    matched = matching_docs(spark, cat, query, **kw)
    cols = [c for c, _ in spec]
    base = (
        docs.select(F.col(id_col).alias("doc_id"), *cols)
        .join(matched, "doc_id", "left_semi")
    )
    for c in cols:
        base = base.filter(F.col(c).isNotNull())
    if after is not None:
        base = base.filter(_after_predicate(spec, "doc_id", after))
    order = [F.col(c).asc() if asc else F.col(c).desc() for c, asc in spec]
    return (
        base.orderBy(*order, F.col("doc_id").asc())
        .limit(k)
        .select("doc_id", *cols)
    )


def function_score_topk(
    spark: SparkSession,
    cat: ParquetCatalog,
    docs: DataFrame,
    query,
    field: str,
    k: int = 10,
    factor: float = 1.0,
    modifier: str = "log1p",
    missing: float = 1.0,
    weight: float = 1.0,
    boost_mode: str = "multiply",
    id_col: str = "doc_id",
    **kw,
) -> DataFrame:
    """ES ``function_score`` + ``field_value_factor``: re-rank the FULL
    ranked match set by blending BM25 with a per-doc signal column —
    ``fn = weight * modifier(factor * coalesce(field, missing))`` and
    ``score = bm25 * fn`` (``boost_mode='multiply'``) or ``bm25 + fn``
    (``'sum'``). Modifiers: ``none`` / ``log1p`` / ``sqrt`` (all JVM
    expressions — ``sqrt``/``log1p`` of a negative input poisons that
    doc's score to NaN exactly as ES errors there; keep signal columns
    non-negative). Returns (doc_id, score, bm25, fn) ordered
    (score desc, doc_id asc) — the components make the blend auditable
    (the explain-style contract every scorer in this repo follows)."""
    if modifier not in _MODIFIERS:
        raise ValueError(
            f"modifier must be one of {sorted(_MODIFIERS)}: {modifier!r}"
        )
    if boost_mode not in ("multiply", "sum"):
        raise ValueError(f"boost_mode must be multiply|sum: {boost_mode!r}")
    bm25 = score_matches(spark, cat, query, **kw).withColumnRenamed(
        "score", "bm25"
    )
    sig = docs.select(
        F.col(id_col).alias("doc_id"),
        F.coalesce(F.col(field).cast("double"), F.lit(float(missing)))
        .alias("_raw"),
    )
    # the outer coalesce covers docs ABSENT from the docs table (left-join
    # miss), the inner one covers NULL field values on present docs
    fn = (F.lit(float(weight))
          * _MODIFIERS[modifier](
              F.lit(float(factor))
              * F.coalesce(F.col("_raw"), F.lit(float(missing)))))
    combined = (F.col("bm25") * F.col("fn") if boost_mode == "multiply"
                else F.col("bm25") + F.col("fn"))
    return (
        bm25.join(sig, "doc_id", "left")
        .withColumn("fn", fn)
        .withColumn("score", combined)
        .select("doc_id", "score", "bm25", "fn")
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )
