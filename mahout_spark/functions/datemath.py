"""ES date-math expressions for range filters (X107).

Elasticsearch range queries on date fields accept date-math strings —
``now-7d/d``, ``now+1M``, ``2024-01-01||+1w/d`` — an anchor (``now`` or
an ISO date followed by ``||``) with a left-to-right chain of
``±N<unit>`` offsets and ``/<unit>`` roundings (truncate to unit
start; weeks round to ISO Monday, the ES contract). Month/year steps
are CALENDAR steps with end-of-month clamping (Jan 31 + 1M = Feb 29 in
a leap year), not fixed intervals.

The resolver runs entirely driver-side to a concrete timestamp, so the
emitted predicate is a plain literal range comparison — at 100 TB this
matters: the scan prunes on parquet row-group min/max stats (and
partition values) exactly as with hand-written timestamps; no
expression evaluation anywhere near the data. ``now`` must be passed
explicitly by pipelines that need replayability (the default wall-clock
``now`` is a convenience for interactive use).
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta, timezone

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_OP = re.compile(r"([+-]\d+[yMwdhHms])|(/[yMwdhHms])")
_UNIT_DAYS = {"w": 7, "d": 1}
_MONTH_LEN = [31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31]


def _days_in_month(y: int, m: int) -> int:
    if m == 2 and (y % 4 == 0 and (y % 100 != 0 or y % 400 == 0)):
        return 29
    return _MONTH_LEN[m - 1]


def _add_months(dt: datetime, n: int) -> datetime:
    """Calendar month step with ES's end-of-month clamp."""
    y, m = divmod(dt.year * 12 + (dt.month - 1) + n, 12)
    m += 1
    return dt.replace(year=y, month=m,
                      day=min(dt.day, _days_in_month(y, m)))


def _round_down(dt: datetime, unit: str) -> datetime:
    if unit == "y":
        return dt.replace(month=1, day=1, hour=0, minute=0, second=0,
                          microsecond=0)
    if unit == "M":
        return dt.replace(day=1, hour=0, minute=0, second=0,
                          microsecond=0)
    if unit == "w":  # ISO week: Monday 00:00
        start = dt.replace(hour=0, minute=0, second=0, microsecond=0)
        return start - timedelta(days=dt.weekday())
    if unit == "d":
        return dt.replace(hour=0, minute=0, second=0, microsecond=0)
    if unit in ("h", "H"):
        return dt.replace(minute=0, second=0, microsecond=0)
    if unit == "m":
        return dt.replace(second=0, microsecond=0)
    return dt.replace(microsecond=0)  # "s"


def parse_date_math(expr: str, now: datetime) -> datetime:
    """Resolve an ES date-math string against an explicit ``now``.
    Anchor: ``now`` or ``<ISO>||``; then ``±N<unit>`` / ``/<unit>`` ops
    applied LEFT TO RIGHT. Units y M w d h H m s (M = month, m =
    minute — the ES case distinction)."""
    if not isinstance(expr, str) or not expr:
        raise ValueError(f"empty date-math expression: {expr!r}")
    if expr.startswith("now"):
        cur, rest = now, expr[3:]
    elif "||" in expr:
        anchor, rest = expr.split("||", 1)
        try:
            cur = datetime.fromisoformat(anchor)
        except ValueError as e:
            raise ValueError(f"bad date-math anchor {anchor!r}") from e
    else:  # a plain ISO timestamp is a complete expression
        try:
            return datetime.fromisoformat(expr)
        except ValueError as e:
            raise ValueError(
                f"date-math must start with 'now', '<iso>||', or be a "
                f"plain ISO timestamp: {expr!r}") from e
    pos = 0
    for m in _OP.finditer(rest):
        if m.start() != pos:
            raise ValueError(
                f"bad date-math op at {rest[pos:]!r} in {expr!r}")
        pos = m.end()
        tok = m.group(0)
        if tok.startswith("/"):
            cur = _round_down(cur, tok[1])
        else:
            n = int(tok[:-1])
            unit = tok[-1]
            if unit == "y":
                cur = _add_months(cur, 12 * n)
            elif unit == "M":
                cur = _add_months(cur, n)
            elif unit in _UNIT_DAYS:
                cur = cur + timedelta(days=_UNIT_DAYS[unit] * n)
            elif unit in ("h", "H"):
                cur = cur + timedelta(hours=n)
            elif unit == "m":
                cur = cur + timedelta(minutes=n)
            else:
                cur = cur + timedelta(seconds=n)
    if pos != len(rest):
        raise ValueError(f"bad date-math op at {rest[pos:]!r} in {expr!r}")
    return cur


def date_math_filter(
    df: DataFrame,
    ts_col: str,
    gte: str | None = None,
    lt: str | None = None,
    now: datetime | None = None,
) -> DataFrame:
    """ES date range query with date-math bounds: ``gte`` inclusive,
    ``lt`` exclusive (the ES gte/lt contract), either side open. The
    bounds resolve to TIMESTAMP LITERALS driver-side, so the filter
    reaches the scan as two plain range predicates (row-group stats /
    partition pruning intact).

    Default ``now`` is naive UTC (matching naive ts columns and ES,
    which resolves ``now`` in UTC) — never host-local wall clock, which
    would return different rows per host timezone. Pass ``now``
    explicitly for replayable pipelines."""
    if gte is None and lt is None:
        raise ValueError("at least one of gte/lt is required")
    now = now if now is not None else datetime.now(timezone.utc).replace(
        tzinfo=None
    )
    c: Column = F.col(ts_col)
    out = df
    if gte is not None:
        out = out.filter(c >= F.lit(parse_date_math(gte, now)))
    if lt is not None:
        out = out.filter(c < F.lit(parse_date_math(lt, now)))
    return out
