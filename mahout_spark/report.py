"""Reference-format report lines (SURVEY.md §2.8 / FIXTURES.md §5).

Format string from MahoutTermFinderMwk.java:114-116:
``<docId>: <int(score*10) left-padded to 3> <term>`` — e.g. report.txt:8-15.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def report_lines(scored: DataFrame, doc_col: str = "doc_id") -> DataFrame:
    """(doc, term, score) -> single-column 'line' DataFrame in the exact
    reference format, globally sorted like the shell `| sort` at run.sh:25."""
    line = F.concat(
        F.col(doc_col).cast("string"),
        F.lit(": "),
        F.lpad((F.col("score") * 10).cast("int").cast("string"), 3, " "),
        F.lit(" "),
        F.col("term"),
    ).alias("line")
    return scored.select(line).orderBy("line")
