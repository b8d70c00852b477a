"""Snapshot/restore (X105, index/snapshot.py): lossless restore after
destructive mutation, incremental hardlink reuse, torn-snapshot
invisibility, verification failure, rejects."""

import os

import pytest
from pyspark.sql import functions as F

from mahout_spark.index.build import build_index
from mahout_spark.index.snapshot import (
    list_snapshots,
    restore_index,
    snapshot_index,
)
from mahout_spark.index.wand import topk


@pytest.fixture(scope="module")
def corpus(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )


@pytest.fixture()
def built(spark, corpus, tmp_path):
    return build_index(
        spark, corpus, str(tmp_path / "idx"), content_col="text",
        id_cols=["doc_id"], mode="simple", n_buckets=4,
        docs_per_shard=64, block_size=16,
    )


def _search(spark, cat):
    return [(r["doc_id"], round(r["score"], 6))
            for r in topk(spark, cat, ["spark", "data"], k=10).collect()]


def test_restore_is_lossless_after_mutation(spark, built, tmp_path):
    from mahout_spark.index.delete import delete_docs

    repo = str(tmp_path / "repo")
    before = _search(spark, built)
    mf = snapshot_index(built, repo, "snap1")
    assert mf["n_files"] > 0 and mf["n_reused"] == 0
    # mutate the LIVE index destructively
    delete_docs(spark, built, [d for d, _ in before[:3]])
    assert _search(spark, built) != before
    restored = restore_index(repo, "snap1", str(tmp_path / "rst"))
    assert _search(spark, restored) == before


def test_second_snapshot_reuses_unchanged_files(spark, built, tmp_path):
    repo = str(tmp_path / "repo")
    m1 = snapshot_index(built, repo, "a1")
    m2 = snapshot_index(built, repo, "a2")
    # nothing changed: every file reused (hardlinked, same inode)
    assert m2["n_reused"] == m2["n_files"] == m1["n_files"]
    probe = next(r for r, _ in m2["files"] if r.endswith(".parquet"))
    i1 = os.stat(os.path.join(repo, "a1", probe)).st_ino
    i2 = os.stat(os.path.join(repo, "a2", probe)).st_ino
    assert i1 == i2
    assert [s["name"] for s in list_snapshots(repo)] == ["a1", "a2"]


def test_restore_verifies_before_copying(spark, built, tmp_path):
    repo = str(tmp_path / "repo")
    m = snapshot_index(built, repo, "s")
    victim = next(r for r, _ in m["files"] if r.endswith(".parquet"))
    os.truncate(os.path.join(repo, "s", victim), 1)
    dest = str(tmp_path / "rst2")
    with pytest.raises(ValueError, match="verification"):
        restore_index(repo, "s", dest)
    # nothing was written: the failed restore leaves no partial index
    assert not os.path.exists(dest) or os.listdir(dest) == []


def test_restore_catches_size_preserving_corruption(spark, built, tmp_path):
    """ADVICE r4: size-equal bit rot / partial overwrite must fail the
    manifest's per-file sha256 check, not restore silently."""
    repo = str(tmp_path / "repo")
    m = snapshot_index(built, repo, "s")
    victim = next(r for r, _ in m["files"] if r.endswith(".parquet"))
    p = os.path.join(repo, "s", victim)
    size = os.stat(p).st_size
    with open(p, "r+b") as f:  # flip one byte, keep the size
        f.seek(size // 2)
        b = f.read(1)
        f.seek(size // 2)
        f.write(bytes([b[0] ^ 0xFF]))
    assert os.stat(p).st_size == size
    with pytest.raises(ValueError, match="verification"):
        restore_index(repo, "s", str(tmp_path / "rstc"))


def test_incremental_snapshot_inherits_checksums(spark, built, tmp_path):
    """Reused (hardlinked) files must inherit the previous manifest's
    sha256 instead of being re-hashed — and the inherited hash must be
    the true content hash."""
    import hashlib

    repo = str(tmp_path / "repo")
    m1 = snapshot_index(built, repo, "a1")
    m2 = snapshot_index(built, repo, "a2")
    assert m2["sha256"] == m1["sha256"]
    probe = next(r for r, _ in m2["files"] if r.endswith(".parquet"))
    with open(os.path.join(repo, "a2", probe), "rb") as f:
        assert hashlib.sha256(f.read()).hexdigest() == m2["sha256"][probe]


def test_rejects(spark, built, tmp_path):
    repo = str(tmp_path / "repo")
    snapshot_index(built, repo, "x")
    with pytest.raises(ValueError, match="already exists"):
        snapshot_index(built, repo, "x")
    with pytest.raises(ValueError, match="invalid"):
        snapshot_index(built, repo, "_bad")
    with pytest.raises(ValueError, match="invalid"):
        snapshot_index(built, repo, "a/b")
    with pytest.raises(ValueError, match="no snapshot"):
        restore_index(repo, "ghost", str(tmp_path / "r3"))
    d = tmp_path / "nonempty"
    d.mkdir()
    (d / "junk").write_text("x")
    with pytest.raises(ValueError, match="not empty"):
        restore_index(repo, "x", str(d))
