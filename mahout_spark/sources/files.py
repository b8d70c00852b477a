"""Raw-file ingestion (SURVEY.md §2.1 S1-S3) — the reference's
document-ingestion stage, Spark-first.

The reference walked directories / read stdin path lists and wrote
``SequenceFile<Text docId, Text content>`` pairs
(``MahoutTermFinderMwk.java:183-196``, directory scan
``MahoutTermFinderMwkSnpt.java:73-112``, stdin feed
``MahoutTermFinderMwkSnptPiped.java:83-104``). Here the same three intake
shapes produce one ``docs(repo, path, commit, lang, content)`` DataFrame
— the engine's canonical input (BASELINE input_hint) — using
``spark.read.text(wholetext=True)`` + ``input_file_name()``: the listing
and the reads are distributed (one task per file group), never
driver-side loops.

Key-uniqueness is part of the contract: the reference's category-key
variant silently overwrote documents sharing a key (acknowledged bug,
``MahoutTermFinderMwkSnptRefactored.java:728-732``); ``ingest_files``
asserts path uniqueness instead.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# naive extension -> language tag for the code-aware pipeline
EXT_LANG = {
    ".py": "python", ".java": "java", ".scala": "scala", ".go": "go",
    ".rs": "rust", ".c": "c", ".h": "c", ".cpp": "cpp", ".js": "javascript",
    ".ts": "typescript", ".rb": "ruby", ".sh": "shell", ".sql": "sql",
    ".md": "markdown", ".txt": "text", ".mwk": "text",
}


def ingest_files(
    spark: SparkSession,
    paths: str | list[str],
    repo: str = "",
    commit: str = "",
    assert_unique: bool = False,
) -> DataFrame:
    """Whole-file ingestion: path glob(s) / explicit path list →
    ``(repo, path, commit, lang, content)``.

    * S1 (named file list): pass the list;
    * S2 (directory scan): pass the directory — recursiveFileLookup
      walks it to ANY depth distributedly (Hadoop globs treat ``**``
      like ``*``, so globs alone silently miss deep files);
    * S3 (sampled path feed): sample the *list* first (``df.sample`` on a
      path DataFrame or shell ``shuf`` upstream), then pass it here.
    """
    if isinstance(paths, str):
        paths = [paths]
    df = (
        spark.read.option("recursiveFileLookup", "true")
        .text(paths, wholetext=True)
        .select(
            F.input_file_name().alias("uri"),
            F.col("value").alias("content"),
        )
        .select(
            F.lit(repo).alias("repo"),
            # input_file_name() is a URI: strip the file:// scheme and
            # percent-decode so doc keys are real filesystem paths that
            # join against list_files / git metadata ("my file.py", not
            # "///my%20file.py")
            F.url_decode(
                F.regexp_replace(F.col("uri"), "^file:(//)?", "")
            ).alias("path"),
            F.lit(commit).alias("commit"),
            F.col("content"),
        )
    )
    ext = F.lower(F.regexp_extract(F.col("path"), r"(\.[A-Za-z0-9]+)$", 1))
    lang = F.coalesce(
        *[
            F.when(ext == e, F.lit(tag))
            for e, tag in sorted(EXT_LANG.items())
        ],
        F.lit("unknown"),
    )
    df = df.select("repo", "path", "commit", lang.alias("lang"), "content")
    if assert_unique:
        # NOTE: this check is an extra full pass over the corpus (text
        # rows can't be produced without reading content) — enable for
        # small/one-off ingests; at scale keep input path lists disjoint
        # upstream and rely on the index build's key handling instead.
        dups = df.groupBy("path").count().filter(F.col("count") > 1).count()
        if dups:
            raise ValueError(
                f"{dups} duplicate paths in ingest — doc keys must be "
                "unique (the reference's category-key overwrite bug is "
                "rejected, not reproduced)"
            )
    return df


def list_files(
    spark: SparkSession, root: str, suffix: str | None = None,
    sample_fraction: float | None = None, seed: int = 7,
    distributed: bool = False,
) -> DataFrame:
    """S3's path-feed as a DataFrame: listing kept to PATH STRINGS only
    (no content I/O), returned as a DataFrame so sampling/limits compose
    relationally before any file is read — the Spark analog of
    ``find | shuf | head`` (run.sh:25).

    ``distributed=False`` (default) walks on the driver — the small-tree
    convenience. ``distributed=True`` scans only the root's first level
    on the driver and walks each subtree in an executor task — the shape
    that survives the 10^12-file ambition, where the listing itself is
    the job (on object stores the same split-by-prefix pattern applies,
    with the manifest/inventory table as the preferred source)."""
    if distributed:
        top_files, subdirs = [], []
        for entry in os.scandir(root):
            if entry.is_dir(follow_symlinks=False):
                subdirs.append(entry.path)
            elif entry.is_file() and (
                suffix is None or entry.name.endswith(suffix)
            ):
                # is_file() FOLLOWS symlinks: a symlink→file lists (as in
                # os.walk's files), a symlink→dir is skipped entirely —
                # matching the driver walk, which neither lists nor
                # recurses into dir symlinks (followlinks=False)
                top_files.append((entry.path,))
        sc = spark.sparkContext
        parts = []
        if subdirs:
            sfx = suffix

            def walk_subtrees(paths):
                import os as _os

                for p in paths:
                    for dirpath, _dirs, files in _os.walk(p):
                        for fn in sorted(files):
                            if sfx is None or fn.endswith(sfx):
                                yield (_os.path.join(dirpath, fn),)

            rdd = sc.parallelize(
                sorted(subdirs),
                max(1, min(len(subdirs), sc.defaultParallelism)),
            ).mapPartitions(walk_subtrees)
            parts.append(spark.createDataFrame(rdd, "path string"))
        if top_files or not parts:
            parts.append(spark.createDataFrame(top_files, "path string"))
        df = parts[0]
        for p in parts[1:]:
            df = df.union(p)
    else:
        out = []
        for dirpath, _dirs, files in os.walk(root):
            for fn in files:
                if suffix is None or fn.endswith(suffix):
                    out.append((os.path.join(dirpath, fn),))
        df = spark.createDataFrame(out, "path string")
    if sample_fraction is not None:
        df = df.sample(fraction=sample_fraction, seed=seed)
    return df
