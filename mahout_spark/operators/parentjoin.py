"""Parent-child join queries (X100 — the ES ``join`` field family).

Elasticsearch's parent/child model (`has_child` / `has_parent`) lets a
query on one side of a 1:N relation return the OTHER side: "parents
with ≥ 2 matching children, scored by the children" and "children
whose parent matches". ES restricts the relation to co-located shards
(parent and children must share a routing key) precisely because its
execution is a per-shard in-memory join; the relational form has no
such restriction — it is a plain distributed hash join/aggregation,
which is the point of doing this on Spark.

Shapes:

* ``has_child`` — ONE partial-aggregated exchange collapses the child
  match set to (parent, n_children, combined score) — the corpus-sized
  side aggregates BEFORE the join — then one hash join attaches the
  parent rows. ``score_mode`` none/max/sum/avg per ES; ``min_children``
  / ``max_children`` filter on the aggregated count (cheap — post-agg).
* ``has_parent`` — the parent match set (usually tiny: it is a filter
  on the parent table) joins onto the children; AQE broadcasts it when
  it fits. ``score=True`` copies the parent's score to every child
  (the ES ``score`` mode), else filter-only.

Determinism: combined scores round to 1e-6; ``has_child`` output is
ordered (score desc where scored, parent id asc); ``has_parent``
leaves child ordering to the caller (children keep their own schema).

The MaxP passage rollup (X81) is the specialization of ``has_child``
to score_mode=max over BM25 chunk scores; this operator is the general
contract (count windows + all four score modes + both directions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCORE_MODES = ("none", "max", "sum", "avg")


def has_child(
    parents: DataFrame,
    child_matches: DataFrame,
    score_mode: str = "none",
    min_children: int = 1,
    max_children: int | None = None,
    parent_id_col: str = "doc_id",
    child_parent_col: str = "parent_id",
    child_score_col: str = "score",
) -> DataFrame:
    """Parents with between ``min_children`` and ``max_children``
    matching children: parent columns + ``n_children`` (+ ``score``
    combined per ``score_mode`` unless 'none'). Ordered score desc
    (when scored) then parent id asc."""
    if score_mode not in SCORE_MODES:
        raise ValueError(f"score_mode must be one of {SCORE_MODES}:"
                         f" {score_mode!r}")
    if min_children < 1:
        raise ValueError(f"min_children must be >= 1: {min_children}")
    if max_children is not None and max_children < min_children:
        raise ValueError(
            f"max_children {max_children} < min_children {min_children}")
    aggs = [F.count(F.lit(1)).alias("n_children")]
    if score_mode != "none":
        combiner = {"max": F.max, "sum": F.sum, "avg": F.avg}[score_mode]
        aggs.append(
            F.round(combiner(F.col(child_score_col).cast("double")), 6)
            .alias("score"))
    per_parent = (
        child_matches.groupBy(
            F.col(child_parent_col).alias(parent_id_col))
        .agg(*aggs)
        .filter(F.col("n_children") >= min_children)
    )
    if max_children is not None:
        per_parent = per_parent.filter(
            F.col("n_children") <= max_children)
    out = parents.join(per_parent, parent_id_col)
    order = ([F.col("score").desc()] if score_mode != "none" else []) + [
        F.col(parent_id_col).asc()]
    return out.orderBy(*order)


def has_parent(
    children: DataFrame,
    parent_matches: DataFrame,
    score: bool = False,
    parent_id_col: str = "doc_id",
    child_parent_col: str = "parent_id",
    parent_score_col: str = "score",
) -> DataFrame:
    """Children whose parent is in ``parent_matches``: the child rows,
    plus ``parent_score`` (the parent's score copied to every child —
    ES ``score`` mode) when ``score=True``. The parent side is
    typically a filter's output — small — so AQE broadcasts it;
    duplicate parent rows would fan children out, so the match set is
    reduced to one row per parent first (max score, the ES dedup)."""
    if score:
        pm = parent_matches.groupBy(
            F.col(parent_id_col).alias(child_parent_col)
        ).agg(
            F.round(F.max(F.col(parent_score_col).cast("double")), 6)
            .alias("parent_score"))
    else:
        pm = parent_matches.select(
            F.col(parent_id_col).alias(child_parent_col)).distinct()
    how = "inner" if score else "left_semi"
    return children.join(pm, child_parent_col, how)
