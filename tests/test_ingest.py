"""File-ingestion sources (SURVEY.md §2.1 S1-S3): whole-file reads into
the canonical docs table, language tagging by extension, key-uniqueness
enforcement, and the sampled path feed."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus_files")
    (root / "a").mkdir()
    (root / "b").mkdir()
    (root / "a" / "src" / "main").mkdir(parents=True)
    (root / "a" / "Service.java").write_text(
        "class Service { int getPort() { return 8080; } }"
    )
    (root / "a" / "util.py").write_text("def helper():\n    return 42\n")
    (root / "a" / "src" / "main" / "Deep File.java").write_text(
        "class DeepFile { }"
    )
    (root / "b" / "notes.mwk").write_text("false wisdom of the hollow")
    (root / "b" / "README.md").write_text("# readme\nusage notes")
    return str(root)


def test_glob_ingest_shapes_and_langs(spark, tree):
    from mahout_spark.sources.files import ingest_files

    docs = ingest_files(
        spark, [f"{tree}/a", f"{tree}/b"], repo="r1", commit="c1"
    )
    rows = {r["path"].rsplit("/", 1)[-1]: r for r in docs.collect()}
    # recursion reaches src/main/, spaces survive URI decoding, and the
    # path column is a clean absolute filesystem path (no file:///, no %20)
    assert set(rows) == {
        "Service.java", "util.py", "notes.mwk", "README.md", "Deep File.java",
    }
    deep = rows["Deep File.java"]["path"]
    assert deep == f"{tree}/a/src/main/Deep File.java"
    assert "%" not in deep and not deep.startswith("//")
    assert rows["Service.java"]["lang"] == "java"
    assert rows["Deep File.java"]["lang"] == "java"
    assert rows["util.py"]["lang"] == "python"
    assert rows["notes.mwk"]["lang"] == "text"
    assert rows["README.md"]["lang"] == "markdown"
    assert rows["util.py"]["content"].startswith("def helper")
    assert rows["Service.java"]["repo"] == "r1"
    assert [f.name for f in docs.schema.fields] == [
        "repo", "path", "commit", "lang", "content",
    ]


def test_ingest_feeds_the_index(spark, tree, tmp_path_factory):
    """End-to-end S2→index: the reference's whole pipeline entry."""
    from mahout_spark.index.build import build_index
    from mahout_spark.index.wand import topk
    from mahout_spark.sources.files import ingest_files

    docs = ingest_files(spark, [f"{tree}/a", f"{tree}/b"])
    cat = build_index(
        spark, docs, str(tmp_path_factory.mktemp("ing_idx")),
        content_col="content", id_cols=["repo", "path", "commit"],
        mode="code", lang_col="lang", n_buckets=4, resume=False,
    )
    hits = topk(spark, cat, ["getport"], k=5).collect()
    assert len(hits) == 1
    java_docs = topk(
        spark, cat, ["lang:java"], k=10, mode_all=True
    ).collect()
    assert len(java_docs) == 2  # Service.java + the deep-nested file


def test_path_feed_sampling(spark, tree, tmp_path_factory):
    from mahout_spark.sources.files import list_files

    all_paths = list_files(spark, tree)
    assert all_paths.count() == 5
    only_py = list_files(spark, tree, suffix=".py")
    assert only_py.count() == 1
    # deterministic sampling over a large synthetic listing: fixed seed,
    # the fraction must actually apply (not be a no-op)
    big = tmp_path_factory.mktemp("many")
    for i in range(40):
        (big / f"f{i:02d}.txt").write_text("x")
    n1 = list_files(spark, str(big), sample_fraction=0.5, seed=3).count()
    n2 = list_files(spark, str(big), sample_fraction=0.5, seed=3).count()
    assert n1 == n2  # seed-deterministic
    assert 0 < n1 < 40  # fraction applied
    # ingest of paths matches the listing's path values exactly (the
    # join-key contract between S3 listing and ingestion)
    from mahout_spark.sources.files import ingest_files

    ing = ingest_files(spark, [r["path"] for r in only_py.collect()])
    assert [r["path"] for r in ing.collect()] == [
        r["path"] for r in only_py.collect()
    ]


def test_distributed_listing_matches_driver_walk(spark, tree, tmp_path):
    """The executor-side subtree walk must enumerate exactly the same
    path set as the driver walk (incl. suffix filtering and files sitting
    directly in the root), and feed ingestion identically."""
    from mahout_spark.sources.files import ingest_files, list_files

    for suffix in (None, ".java", ".py"):
        a = {r["path"] for r in list_files(spark, tree, suffix=suffix).collect()}
        b = {
            r["path"]
            for r in list_files(
                spark, tree, suffix=suffix, distributed=True
            ).collect()
        }
        assert a == b, suffix
    # root-level files (no subdirs at all)
    flat = tmp_path / "flat"
    flat.mkdir()
    (flat / "x.txt").write_text("x")
    (flat / "y.txt").write_text("y")
    got = {
        r["path"]
        for r in list_files(spark, str(flat), distributed=True).collect()
    }
    assert got == {str(flat / "x.txt"), str(flat / "y.txt")}
    # the distributed listing feeds ingestion the same as the driver walk
    paths = sorted(
        r["path"]
        for r in list_files(
            spark, tree, suffix=".java", distributed=True
        ).collect()
    )
    ing = ingest_files(spark, paths)
    assert ing.count() == 2
    # symlinks at the root: →file lists (like os.walk), →dir is neither
    # listed nor traversed (followlinks=False semantics) in BOTH modes
    import os

    sym = tmp_path / "sym"
    sym.mkdir()
    (sym / "real.txt").write_text("r")
    (sym / "sub").mkdir()
    (sym / "sub" / "inner.txt").write_text("i")
    os.symlink(str(sym / "real.txt"), str(sym / "flink.txt"))
    os.symlink(str(sym / "sub"), str(sym / "dlink"))
    a = {r["path"] for r in list_files(spark, str(sym)).collect()}
    b = {
        r["path"]
        for r in list_files(spark, str(sym), distributed=True).collect()
    }
    assert a == b
    assert str(sym / "flink.txt") in a
    assert not any("dlink" in p for p in a)


def test_plan_audit_helpers(spark):
    import __spark_entry__ as e
    from mahout_spark.plans.audit import assert_plan, capture_plan, scan_count

    df = e.q_quality_scores(spark, "/root/testdata/sf0.001")
    plan = assert_plan(df, no_exchange=True, allow_spread=True,
                       absent_columns=["source"])
    assert scan_count(plan) == 1
    q3 = e.q_tpch_q3_topk(spark, "/root/testdata/sf0.001")
    assert_plan(
        q3, broadcast_joins=1, no_sort_merge_join=True,
        pushed=["EqualTo(c_mktsegment,BUILDING)"],
    )
    with pytest.raises(AssertionError, match="unexpected Exchange"):
        assert_plan(q3, no_exchange=True)
    assert "Physical Plan" in capture_plan(df, "simple")
