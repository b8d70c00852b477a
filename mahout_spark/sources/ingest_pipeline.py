"""ES ingest pipelines (X151) — the ``_ingest`` processor chain.

An ES cluster transforms documents BEFORE indexing through a declared
pipeline of processors; the pipeline is data (JSON), not code, so ops
teams version and review it. This module compiles the same processor
declarations to pure Spark column expressions — one narrow projection
per processor, zero Python on the data path, and the whole chain
collapses into a single whole-stage-codegen projection under Catalyst.

Supported processors (the ES core set; each entry mirrors the ES
option names):

* ``set``       — {"field", "value", "override"=True}: assign a
  constant; ``override=False`` keeps existing non-NULL values.
* ``rename``    — {"field", "target_field", "ignore_missing"=False}.
* ``remove``    — {"field", "ignore_missing"=False}.
* ``lowercase`` / ``uppercase`` / ``trim`` — {"field",
  "target_field"=field, "ignore_missing"=False}.
* ``gsub``      — {"field", "pattern", "replacement",
  "target_field"=field}: regex replace-all.
* ``split``     — {"field", "separator", "target_field"=field}:
  regex split to an array.
* ``join``      — {"field", "separator", "target_field"=field}:
  array → string.
* ``convert``   — {"field", "type" ∈ integer|long|double|string|
  boolean, "target_field"=field}: SQL cast.

Failure semantics pinned (the SQL-columnar rendering of ES's
per-document failures): a MISSING FIELD is a missing COLUMN — detected
at compile time and raised unless ``ignore_missing`` (ES raises per
document; a relational schema makes it a static error, which is
stricter, never looser). A NULL value flows through transforms as NULL
(SQL semantics; ES's null-equals-missing per-doc abort does not
translate to a columnar plan and is documented out of contract —
filter NULLs up front when that matters).

Processors apply IN ORDER and later processors see earlier outputs —
the ES contract; compilation folds the chain left-to-right over a
column map, so the emitted plan is still one projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CONVERT = {"integer": "int", "long": "long", "double": "double",
            "string": "string", "boolean": "boolean"}


def ingest_pipeline(docs: DataFrame, processors: list[dict]) -> DataFrame:
    """Apply the processor chain to ``docs``; returns the transformed
    frame with columns in first-appearance order."""
    cols: dict = {c: F.col(c) for c in docs.columns}

    def need(p: dict, kind: str, field: str):
        if field in cols:
            return cols[field]
        if p.get("ignore_missing"):
            return None
        raise ValueError(
            f"{kind}: field {field!r} is missing (pass "
            "ignore_missing=True to skip)")

    for i, proc in enumerate(processors):
        if not isinstance(proc, dict) or len(proc) != 1:
            raise ValueError(
                f"processor #{i} must be a single-key dict: {proc!r}")
        kind, p = next(iter(proc.items()))
        if kind == "set":
            tgt = p["field"]
            val = F.lit(p["value"])
            if p.get("override", True) or tgt not in cols:
                cols[tgt] = val
            else:
                cols[tgt] = F.coalesce(cols[tgt], val)
        elif kind == "rename":
            src = need(p, kind, p["field"])
            if src is None:
                continue
            tgt = p["target_field"]
            if tgt in cols:
                raise ValueError(
                    f"rename: target {tgt!r} already exists")
            cols[tgt] = src
            del cols[p["field"]]
        elif kind == "remove":
            if p["field"] not in cols and not p.get("ignore_missing"):
                raise ValueError(
                    f"remove: field {p['field']!r} is missing")
            cols.pop(p["field"], None)
        elif kind in ("lowercase", "uppercase", "trim"):
            src = need(p, kind, p["field"])
            if src is None:
                continue
            fn = {"lowercase": F.lower, "uppercase": F.upper,
                  "trim": F.trim}[kind]
            cols[p.get("target_field", p["field"])] = fn(src)
        elif kind == "gsub":
            src = need(p, kind, p["field"])
            if src is None:
                continue
            cols[p.get("target_field", p["field"])] = F.regexp_replace(
                src, p["pattern"], p["replacement"])
        elif kind == "split":
            src = need(p, kind, p["field"])
            if src is None:
                continue
            cols[p.get("target_field", p["field"])] = F.split(
                src, p["separator"])
        elif kind == "join":
            src = need(p, kind, p["field"])
            if src is None:
                continue
            cols[p.get("target_field", p["field"])] = F.array_join(
                src, p["separator"])
        elif kind == "convert":
            src = need(p, kind, p["field"])
            if src is None:
                continue
            ty = p["type"]
            if ty not in _CONVERT:
                raise ValueError(
                    f"convert: unsupported type {ty!r} "
                    f"(one of {sorted(_CONVERT)})")
            cols[p.get("target_field", p["field"])] = src.cast(
                _CONVERT[ty])
        else:
            raise ValueError(f"unknown processor {kind!r}")
    if not cols:
        raise ValueError("pipeline removed every column")
    return docs.select(*[expr.alias(name) for name, expr in cols.items()])
