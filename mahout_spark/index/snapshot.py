"""Index snapshot / restore (X105 — the ES `_snapshot` filesystem
repository).

Elasticsearch's snapshot API copies an index's immutable segment files
into a repository, reusing files already present from earlier snapshots
(incremental by construction, because segments never change in place),
and restore copies them back with a manifest check. This catalog has the
same property — parquet part files and tier deltas are immutable; only
manifests (_meta.json) and tombstones mutate — so the same design maps
directly:

* ``snapshot_index`` — walk the catalog root, HARDLINK every file whose
  (relative path, size, mtime_ns) already exists identically in the
  previous snapshot of the same repository (byte-copy otherwise), into
  a crash-tagged staging dir renamed into place last. The manifest
  records every file with its size, so a torn snapshot is never
  visible under its final name, and the incremental reuse is exactly
  ES's segment-level dedup (an unchanged 100 TB index re-snapshots in
  metadata time).
* ``restore_index`` — verify the manifest (every file present, size
  AND content sha256 equal) BEFORE copying into a fresh catalog root;
  refuse loudly on any mismatch. Restores never touch the repository.
* ``list_snapshots`` — the repository's manifest inventory, newest
  last (lexicographic on the caller-chosen names).

Driver-side file walking is deliberate: snapshots move CATALOG files,
not rows — no Spark job is the right plan (the data plane is the
filesystem/object store, exactly as in ES). On an object store the
hardlink branch becomes a server-side copy; the seam is `_place_file`.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import uuid

from mahout_spark.sources.catalog import ParquetCatalog

MANIFEST = "_snapshot.json"


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _walk_files(root: str) -> list[tuple[str, int, int]]:
    """(relpath, size, mtime_ns) for every regular file under root,
    sorted by relpath — the manifest's deterministic order."""
    out = []
    for dirpath, _, names in os.walk(root):
        for n in names:
            p = os.path.join(dirpath, n)
            st = os.stat(p)
            out.append((os.path.relpath(p, root), st.st_size,
                        st.st_mtime_ns))
    return sorted(out)


def _place_file(src: str, dst: str, link_from: str | None) -> bool:
    """Stage one file: hardlink from the previous snapshot when
    possible (the incremental branch), else copy from the live index.
    Returns True when the file was reused."""
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    if link_from is not None:
        try:
            os.link(link_from, dst)
            return True
        except OSError:  # cross-device / FS without hardlinks: copy
            pass
    shutil.copy2(src, dst)
    return False


def snapshot_index(
    cat: ParquetCatalog, repo_dir: str, name: str,
) -> dict:
    """Snapshot the catalog into ``repo_dir/name``. Returns the
    manifest (also written as ``_snapshot.json`` inside the snapshot):
    ``{name, files: [[relpath, size], ...], n_files, n_bytes,
    n_reused}``. Incremental against the repository's latest previous
    snapshot; crash-tagged staging + final rename, so a torn snapshot
    never appears under ``name``."""
    if not name or "/" in name or name.startswith("_"):
        raise ValueError(f"invalid snapshot name: {name!r}")
    final = os.path.join(repo_dir, name)
    if os.path.exists(final):
        raise ValueError(f"snapshot already exists: {name}")
    prev = None
    prev_sha: dict = {}
    existing = list_snapshots(repo_dir)
    if existing:
        prev = os.path.join(repo_dir, existing[-1]["name"])
        prev_files = {
            (r, s): m for r, s, m in _walk_files(prev)
            if r != MANIFEST
        }
        prev_sha = existing[-1].get("sha256", {})
    else:
        prev_files = {}
    files = _walk_files(cat.root)
    stage = os.path.join(repo_dir, f"_tmp-{name}-{uuid.uuid4().hex[:8]}")
    n_reused = 0
    try:
        os.makedirs(stage)
        shas: dict = {}
        for rel, size, mtime in files:
            link = None
            if prev is not None and prev_files.get((rel, size)) == mtime:
                link = os.path.join(prev, rel)
            dst = os.path.join(stage, rel)
            reused = _place_file(os.path.join(cat.root, rel), dst, link)
            n_reused += reused
            # per-file content checksum (the ES per-segment checksum
            # analog): hashing the STAGED file also verifies the copy;
            # incremental reuse inherits the previous manifest's hash
            # so unchanged files stay metadata-time
            if reused and rel in prev_sha:
                shas[rel] = prev_sha[rel]
            else:
                shas[rel] = _sha256(dst)
        manifest = {
            "name": name,
            "files": [[r, s] for r, s, _ in files],
            "sha256": shas,
            "n_files": len(files),
            "n_bytes": sum(s for _, s, _ in files),
            "n_reused": n_reused,
        }
        with open(os.path.join(stage, MANIFEST), "w") as f:
            json.dump(manifest, f)
        os.rename(stage, final)
        return manifest
    except Exception:
        shutil.rmtree(stage, ignore_errors=True)
        raise


def restore_index(
    repo_dir: str, name: str, dest: str,
) -> ParquetCatalog:
    """Restore ``repo_dir/name`` into the fresh directory ``dest`` and
    return its catalog. The manifest is verified BEFORE anything is
    copied — every file present, size equal, AND content sha256 equal
    to the recorded checksum (size-preserving corruption — bit rot,
    partial overwrite — fails loudly instead of restoring silently;
    pre-checksum manifests fall back to the size check)."""
    src = os.path.join(repo_dir, name)
    mf_path = os.path.join(src, MANIFEST)
    if not os.path.isfile(mf_path):
        raise ValueError(f"no snapshot {name!r} in {repo_dir}")
    with open(mf_path) as f:
        manifest = json.load(f)
    shas = manifest.get("sha256", {})
    bad = []
    for rel, size in manifest["files"]:
        p = os.path.join(src, rel)
        if (not os.path.isfile(p) or os.stat(p).st_size != size
                or (rel in shas and _sha256(p) != shas[rel])):
            bad.append(rel)
    if bad:
        raise ValueError(
            f"snapshot {name!r} fails verification; damaged files: "
            f"{bad[:5]}{'...' if len(bad) > 5 else ''}")
    if os.path.exists(dest) and os.listdir(dest):
        raise ValueError(f"restore destination not empty: {dest}")
    os.makedirs(dest, exist_ok=True)
    for rel, _ in manifest["files"]:
        dst = os.path.join(dest, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.copy2(os.path.join(src, rel), dst)
    return ParquetCatalog(dest)


def list_snapshots(repo_dir: str) -> list[dict]:
    """Manifests of every completed snapshot in the repository, sorted
    by name (staging dirs and foreign files ignored)."""
    if not os.path.isdir(repo_dir):
        return []
    out = []
    for n in sorted(os.listdir(repo_dir)):
        mf = os.path.join(repo_dir, n, MANIFEST)
        if not n.startswith("_") and os.path.isfile(mf):
            with open(mf) as f:
                out.append(json.load(f))
    return out
