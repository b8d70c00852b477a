"""Index aliases with atomic swap (X109 — the ES alias / rollover ops
model).

Elasticsearch decouples logical index names from physical indices with
aliases: queries hit ``logs``, which points at ``logs-000007``; a
reindex builds ``logs-000008`` offline and ONE atomic aliases-update
cuts traffic over — the zero-downtime reindex/rollover pattern. The
same decoupling matters for this engine's catalogs: a compaction or a
full rebuild writes a NEW catalog root, and readers must repoint
without a window where the name resolves to a half-built index.

``AliasRegistry`` stores the name → catalog-root map in one JSON file,
updated write-aside + ``os.rename`` — atomic on POSIX, so a reader
loading the file sees the old map or the new map, never a torn one
(the same crash-tag discipline the catalog's own writes use).
``should_rollover`` is the ES rollover condition check (``max_docs``)
against the index's own meta — the caller builds the successor and
``set_alias`` cuts over.

Driver-side by design: alias resolution is control-plane metadata (one
tiny file), never touched by executors; queries receive the resolved
``ParquetCatalog`` exactly as before, so every kernel and plan is
alias-agnostic.
"""

from __future__ import annotations

import json
import os
import uuid

from mahout_spark.sources.catalog import ParquetCatalog

ALIASES_FILE = "aliases.json"


class AliasRegistry:
    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._path = os.path.join(root, ALIASES_FILE)

    def _load(self) -> dict:
        if not os.path.isfile(self._path):
            return {}
        with open(self._path) as f:
            return json.load(f)

    def _store(self, aliases: dict) -> None:
        tmp = self._path + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(aliases, f, sort_keys=True)
        os.rename(tmp, self._path)  # atomic: old map or new, never torn

    def set_alias(self, name: str, index_root: str) -> None:
        """Point ``name`` at a catalog root (create or repoint — the
        repoint IS the atomic cutover). The target must look like a
        catalog (exists and is a directory) — aliasing a missing path
        fails loudly now, not at query time."""
        if not name or "/" in name:
            raise ValueError(f"invalid alias name: {name!r}")
        if not os.path.isdir(index_root):
            raise ValueError(f"alias target is not a directory: "
                             f"{index_root}")
        aliases = self._load()
        aliases[name] = os.path.abspath(index_root)
        self._store(aliases)

    def resolve(self, name: str) -> ParquetCatalog:
        """The catalog ``name`` currently points at."""
        aliases = self._load()
        if name not in aliases:
            raise KeyError(f"unknown alias: {name!r}")
        return ParquetCatalog(aliases[name])

    def delete_alias(self, name: str) -> None:
        aliases = self._load()
        if name not in aliases:
            raise KeyError(f"unknown alias: {name!r}")
        del aliases[name]
        self._store(aliases)

    def list_aliases(self) -> dict:
        """name → resolved root, sorted by name."""
        return dict(sorted(self._load().items()))


def should_rollover(cat: ParquetCatalog, max_docs: int) -> bool:
    """The ES rollover condition: has the index grown past
    ``max_docs``? Reads the postings meta (one tiny JSON) — no jobs.
    The caller builds the successor index and ``set_alias`` cuts the
    write alias over."""
    if max_docs < 1:
        raise ValueError(f"max_docs must be >= 1: {max_docs}")
    meta = cat.read_meta("postings")
    return int(meta["n_docs"]) >= max_docs
