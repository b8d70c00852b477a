"""Top-k / threshold operators (SURVEY.md §2.6, O1-O7 and filter F5).

All are window + filter compositions; rank determinism everywhere is
(score desc, tiebreak asc) — the engine-wide rank-identity rule."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def per_group_topk(
    df: DataFrame,
    group_cols: list[str],
    k: int,
    score_col: str = "score",
    tiebreak_cols: list[str] | None = None,
    min_score: float | None = None,
) -> DataFrame:
    """O1-O3 + F5: per-group top-k by score with optional score floor.

    Reproduces the well-defined form of the reference's report stage:
    threshold filter (MahoutTermFinderMwk.java:131-139), sort by score,
    keep k best (skip-to-last-k of the ascending sort at
    MahoutTermFinderMwkSnptPiped.java:303-306). The reference's
    "subList(0,20) before sorting" quirk is HashMap-order-dependent and not
    reproducible in principle (SURVEY.md §7.3); we apply threshold -> sort
    -> top-k.
    """
    if tiebreak_cols is None:
        tiebreak_cols = ["term"] if "term" in df.columns else []
    out = df
    if min_score is not None:
        out = out.filter(F.col(score_col) > F.lit(min_score))
    w = Window.partitionBy(*group_cols).orderBy(
        F.col(score_col).desc(), *[F.col(c).asc() for c in tiebreak_cols]
    )
    return (
        out.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def adaptive_topk(
    df: DataFrame,
    group_cols: list[str],
    k: int = 5,
    floor: float = 4.0,
    score_col: str = "score",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """O6: the cluster-report variant — top-k but dropping entries whose
    score is below the floor (the reference shrinks its display window until
    min >= 4, MahoutTermFinderMwkSnptRefactoredCluster.java:735-777, which is
    equivalent to top-k ∧ score >= floor)."""
    return per_group_topk(
        df, group_cols, k, score_col, tiebreak_cols
    ).filter(F.col(score_col) >= F.lit(floor))


def global_topk(
    df: DataFrame, k: int, score_col: str = "score",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """O7 baseline: global top-k -> Spark plans TakeOrderedAndProject
    (per-partition heap + driver merge; no global sort)."""
    if tiebreak_cols is None:
        tiebreak_cols = ["doc_id"] if "doc_id" in df.columns else []
    return df.orderBy(
        F.col(score_col).desc(), *[F.col(c).asc() for c in tiebreak_cols]
    ).limit(k)
