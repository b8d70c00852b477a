"""Plan-audit helpers (PLANS.md is generated from these).

``capture_plan`` returns the formatted physical plan as a string;
``assert_plan`` turns the load-bearing optimizations into checkable
predicates — the same assertions tests/test_plans.py gates on, exposed as
a library so pipelines can self-audit (e.g. fail a deploy when a filter
stopped reaching the scan after a refactor).
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def capture_plan(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def scan_count(plan: str) -> int:
    return len(re.findall(r"\(\d+\) Scan parquet", plan))


def pushed_filters(plan: str) -> list[str]:
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def read_schemas(plan: str) -> list[str]:
    return re.findall(r"ReadSchema: struct<([^>]*)>", plan)


def assert_plan(
    df: DataFrame,
    *,
    broadcast_joins: int | None = None,
    no_sort_merge_join: bool = False,
    no_exchange: bool = False,
    allow_spread: bool = False,
    pushed: list[str] | None = None,
    absent_columns: list[str] | None = None,
) -> str:
    """Raise AssertionError (with the plan attached) unless the compiled
    plan has the requested shape. Returns the plan text on success.

    ``allow_spread``: with ``no_exchange``, tolerate round-robin
    repartitions (the deliberate few-split-input spread of
    ``checkpoint.spread_input``) while still rejecting any KEYED shuffle
    — hash/range exchanges move data by key and are the scale cost the
    audit exists to catch; a round-robin spread moves each row once and
    is a no-op on real multi-split inputs."""
    plan = capture_plan(df)
    problems = []
    if broadcast_joins is not None:
        got = plan.count("BroadcastHashJoin")
        if got < broadcast_joins:
            problems.append(
                f"expected >= {broadcast_joins} BroadcastHashJoin, got {got}"
            )
    if no_sort_merge_join and "SortMergeJoin" in plan:
        problems.append("unexpected SortMergeJoin")
    if no_exchange:
        # only SHUFFLE exchanges count: BroadcastExchange/ReusedExchange
        # move no partitioned data and would false-fail any broadcast plan
        if allow_spread:
            # reject KEYED shuffles only (hash/range partitioning moves
            # data by key); round-robin spreads pass
            if re.search(r"(?i)(hash|range)partitioning\(", plan):
                problems.append("unexpected keyed Exchange (shuffle)")
        elif any(
            m == "Exchange"
            for m in re.findall(r"[A-Za-z]*Exchange", plan)
        ):
            problems.append("unexpected Exchange (shuffle)")
    pf = " ; ".join(pushed_filters(plan))
    for frag in pushed or []:
        if frag not in pf:
            problems.append(f"filter not pushed: {frag!r}")
    scan_cols = {
        f.split(":")[0].strip()
        for sch in read_schemas(plan)
        for f in sch.split(",")
        if f.strip()
    }
    for col in absent_columns or []:
        if col in scan_cols:
            problems.append(f"column not pruned from scan: {col!r}")
    if problems:
        raise AssertionError("; ".join(problems) + "\n---- plan ----\n" + plan)
    return plan
