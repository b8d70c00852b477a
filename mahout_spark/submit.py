"""``spark-submit --py-files`` packaging (SURVEY.md §7.1 Phase 4).

The engine ships to a cluster as a single zip of the ``mahout_spark``
package passed via ``--py-files`` — no wheel build, no cluster-side pip,
no container rebuild per code change. spark-submit places the zip on the
driver's and every executor's ``sys.path``, which is exactly the seam
``session.get_spark`` documents for local-cluster mode (executor python
workers must be able to ``import mahout_spark``).

``make_pyfiles_zip`` is deterministic: entries are added in sorted order
with a fixed timestamp and no filesystem metadata, so the same tree
always yields a byte-identical archive. That matters operationally —
schedulers and object stores dedupe artifacts by content hash, and a
byte-stable zip means "no code change" is checkable without unzipping.

Usage on a real cluster::

    python -m mahout_spark.submit --out dist/mahout_spark.zip
    spark-submit --master yarn --deploy-mode cluster \
        --py-files dist/mahout_spark.zip \
        jobs/index_job.py build --input s3://corpus --out s3://index

The same invocation is exercised end-to-end (local[2] master, clean
interpreter, no repo on PYTHONPATH) by ``tests/test_submit.py``.
"""

from __future__ import annotations

import os
import zipfile

# Fixed DOS timestamp for deterministic archives (zipfile requires
# year >= 1980): 2020-01-01 00:00:00.
_ZIP_DATE = (2020, 1, 1, 0, 0, 0)


def package_root() -> str:
    """Directory containing the ``mahout_spark`` package."""
    return os.path.dirname(os.path.abspath(__file__))


def make_pyfiles_zip(out_path: str | None = None) -> str:
    """Zip the ``mahout_spark`` package for ``--py-files``; returns the
    archive path. Deterministic: sorted entries, fixed timestamps, stored
    relative to the package parent so the archive root is the importable
    package itself. Only ``.py`` sources are shipped (the engine has no
    data files; stopwords are embedded in code)."""
    pkg = package_root()
    if out_path is None:
        out_path = os.path.join(
            os.path.dirname(pkg), "dist", "mahout_spark.zip"
        )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    entries = []
    for dirpath, dirnames, filenames in os.walk(pkg):
        dirnames[:] = sorted(
            d for d in dirnames if d != "__pycache__"
        )
        for fn in sorted(filenames):
            if not fn.endswith(".py"):
                continue
            full = os.path.join(dirpath, fn)
            rel = os.path.join(
                "mahout_spark", os.path.relpath(full, pkg)
            )
            entries.append((full, rel))
    tmp = out_path + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
        for full, rel in entries:
            info = zipfile.ZipInfo(rel.replace(os.sep, "/"), _ZIP_DATE)
            info.external_attr = 0o644 << 16
            info.compress_type = zipfile.ZIP_DEFLATED
            with open(full, "rb") as f:
                zf.writestr(info, f.read())
    os.replace(tmp, out_path)  # atomic publish, same pattern as catalog
    return out_path


def main(argv: list[str] | None = None) -> None:
    import argparse

    ap = argparse.ArgumentParser(
        description="Package mahout_spark for spark-submit --py-files"
    )
    ap.add_argument("--out", default=None, help="output zip path")
    ns = ap.parse_args(argv)
    print(make_pyfiles_zip(ns.out))


if __name__ == "__main__":
    main()
