"""spark-submit --py-files packaging (SURVEY §7.1 Phase 4, north rule).

The cluster-ship seam must actually work: a REAL ``spark-submit``
subprocess, a clean interpreter (PYTHONPATH stripped, cwd outside the
repo) so the ONLY way ``jobs/index_job.py`` can import ``mahout_spark``
is the ``--py-files`` zip — exactly the situation on a cluster node.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import zipfile

from mahout_spark.submit import make_pyfiles_zip, package_root

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
JOB = os.path.join(REPO, "jobs", "index_job.py")
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def test_pyfiles_zip_deterministic_and_complete(tmp_path):
    z1 = make_pyfiles_zip(str(tmp_path / "a.zip"))
    z2 = make_pyfiles_zip(str(tmp_path / "b.zip"))
    with open(z1, "rb") as f1, open(z2, "rb") as f2:
        assert f1.read() == f2.read(), "zip not byte-deterministic"
    with zipfile.ZipFile(z1) as zf:
        names = set(zf.namelist())
    # every .py in the package ships; nothing else does
    expected = set()
    for dirpath, dirnames, filenames in os.walk(package_root()):
        dirnames[:] = [d for d in dirnames if d != "__pycache__"]
        for fn in filenames:
            if fn.endswith(".py"):
                rel = os.path.relpath(os.path.join(dirpath, fn),
                                      package_root())
                expected.add("mahout_spark/" + rel.replace(os.sep, "/"))
    assert names == expected
    assert "mahout_spark/index/wand.py" in names


def _run_submit(args, pyfiles, cwd):
    """spark-submit with the repo NOT importable: cwd outside the repo
    and PYTHONPATH removed — the zip is the only source of the package."""
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    cmd = [
        SPARK_SUBMIT, "--master", "local[2]",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.driver.memory=2g",
        "--py-files", pyfiles,
        JOB, *args,
    ]
    proc = subprocess.run(
        cmd, cwd=cwd, env=env, capture_output=True, text=True,
        timeout=600,
    )
    assert proc.returncode == 0, (
        f"spark-submit failed\nSTDOUT:\n{proc.stdout[-4000:]}\n"
        f"STDERR:\n{proc.stderr[-4000:]}"
    )
    json_lines = [
        ln for ln in proc.stdout.splitlines()
        if ln.startswith("{") and ln.endswith("}")
    ]
    assert len(json_lines) == 1, proc.stdout[-2000:]
    return json.loads(json_lines[0])


def test_spark_submit_build_and_query_roundtrip(spark, tmp_path):
    """build + query through real spark-submit; results must be
    rank-identical to the in-process engine querying the same index."""
    docs_in = os.path.join(SF_DIR, "documents.parquet")
    idx = str(tmp_path / "idx")
    zip_path = make_pyfiles_zip(str(tmp_path / "mahout_spark.zip"))
    workdir = tmp_path / "clean_cwd"
    workdir.mkdir()

    built = _run_submit(
        ["build", "--input", docs_in, "--out", idx,
         "--content-col", "text", "--id-cols", "doc_id",
         "--mode", "simple", "--no-resume"],
        zip_path, str(workdir),
    )
    assert built["job"] == "build" and built["n_docs"] > 0

    queried = _run_submit(
        ["query", "--out", idx, "--terms", "data,merge", "--k", "5"],
        zip_path, str(workdir),
    )
    assert queried["job"] == "query"
    got = [(r["doc_id"], r["score"]) for r in queried["results"]]

    # parity: the in-process engine over the submit-built index
    from pyspark.sql import functions as F

    from mahout_spark.index.wand import topk
    from mahout_spark.sources.catalog import ParquetCatalog

    exp = [
        (r["doc_id"], r["score"])
        for r in topk(spark, ParquetCatalog(idx), ["data", "merge"], k=5)
        .select("doc_id", F.round("score", 6).alias("score"))
        .collect()
    ]
    assert got == exp

    # delete the top hit through the CLI; the next query (scores still
    # pre-delete — Lucene semantics) must serve the remaining ranks
    dead = got[0][0]
    deleted = _run_submit(
        ["delete", "--out", idx, "--ids", str(dead)],
        zip_path, str(workdir),
    )
    assert deleted["job"] == "delete" and deleted["deletes"] == 1

    requeried = _run_submit(
        ["query", "--out", idx, "--terms", "data,merge", "--k", "4"],
        zip_path, str(workdir),
    )
    got2 = [(r["doc_id"], r["score"]) for r in requeried["results"]]
    assert got2 == exp[1:5]


def test_entrypoint_search_tiers_stats(spark, tmp_path, monkeypatch):
    """The new subcommands through main() in-process (the zip/import
    mechanics are already gated by the real-subprocess test above):
    tiers builds both dictionary tables, search answers the boolean
    grammar, stats emits the diagnostics row."""
    import contextlib
    import io
    import json
    import os

    from jobs.index_job import main
    from mahout_spark.index.build import build_index

    # main() stops its session on exit (correct under spark-submit);
    # in-process it must not kill the shared test session
    monkeypatch.setattr(type(spark), "stop", lambda self: None)

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )
    out = str(tmp_path / "ep_idx")
    build_index(spark, docs, out, content_col="text",
                id_cols=["doc_id"], mode="simple", n_buckets=4,
                docs_per_shard=64, block_size=16)

    def run(argv):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            main(argv)
        return json.loads(buf.getvalue().strip().splitlines()[-1])

    t = run(["tiers", "--out", out])
    assert t["permuterm"] and t["gramindex"]
    assert os.path.isdir(os.path.join(out, "permuterm"))

    s = run(["search", "--out", out, "--query", "*ble OR merge",
             "--k", "5"])
    assert s["results"] and all("doc_id" in r for r in s["results"])

    st = run(["stats", "--out", out])
    assert st["n_docs"] == 500 and st["n_terms"] > 0


def test_entrypoint_percolate(spark, tmp_path, monkeypatch):
    """The percolate subcommand: registry JSON file in, one metrics line
    out, and --prefilter routes through the candidate tier with the same
    match count."""
    import contextlib
    import io
    import json

    from jobs.index_job import main

    monkeypatch.setattr(type(spark), "stop", lambda self: None)

    src = str(tmp_path / "perc_docs")
    (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text").write.parquet(src)
    )
    qfile = tmp_path / "rules.json"
    qfile.write_text(json.dumps({
        "q_and": "table AND data",
        "q_phrase": '"table scan" OR vector',
    }))

    def run(argv):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            main(argv)
        return json.loads(buf.getvalue().strip().splitlines()[-1])

    full = run(["percolate", "--input", src, "--queries", str(qfile)])
    pre = run(["percolate", "--input", src, "--queries", str(qfile),
               "--prefilter"])
    assert full["matches"] == pre["matches"] > 0
    assert full["rules"] == 2 and pre["prefilter"] is True

    outdir = str(tmp_path / "perc_out")
    w = run(["percolate", "--input", src, "--queries", str(qfile),
             "--matches-out", outdir])
    assert w["matches"] == full["matches"]
    assert spark.read.parquet(outdir).count() == full["matches"]
