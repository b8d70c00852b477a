"""Table catalog with an Iceberg-like contract over plain parquet dirs.

BASELINE.json mandates Iceberg tables; this sandbox has no Iceberg runtime
jar, so the engine talks to tables through this thin wrapper implementing
the operations the build/query paths need — atomic overwrite-of-a-partition,
append, snapshot-read, table-level metadata — with a parquet-directory
implementation (staging dir + atomic rename). With the Iceberg jar on the
classpath, ``IcebergCatalog`` (same interface, ``writeTo(...).
overwritePartitions()`` / ``spark.read.format("iceberg")``) drops in; all
engine logic is format-agnostic behind this seam (SURVEY.md §7.3 #6).

Layout:
    root/<table>/<part_col>=<value>/*.parquet     hive-style partitions
    root/<table>/_meta.json                       table metadata (scalars)
    root/<table>/_lineage.jsonl                   append-only lineage rows
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


class ParquetCatalog:
    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- paths --------------------------------------------------------------

    def table_path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def partition_path(self, table: str, part_col: str, value) -> str:
        return os.path.join(self.table_path(table), f"{part_col}={value}")

    def exists(self, table: str) -> bool:
        return os.path.isdir(self.table_path(table))

    # -- writes -------------------------------------------------------------

    def overwrite_table(self, df: DataFrame, table: str) -> None:
        """Atomic full-table replace (stage + swap)."""
        final = self.table_path(table)
        stage = final + f".__stage_{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").parquet(stage)
        old = final + f".__old_{uuid.uuid4().hex[:8]}"
        if os.path.isdir(final):
            os.rename(final, old)
        os.rename(stage, final)
        shutil.rmtree(old, ignore_errors=True)

    def overwrite_table_partitioned(
        self, df: DataFrame, table: str, part_col: str
    ) -> None:
        """Atomic full replace of a hive-partitioned table (stage + swap).
        Readers via read_partitions() then prune to the named dirs."""
        final = self.table_path(table)
        stage = final + f".__stage_{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").partitionBy(part_col).parquet(stage)
        old = final + f".__old_{uuid.uuid4().hex[:8]}"
        if os.path.isdir(final):
            os.rename(final, old)
        os.rename(stage, final)
        shutil.rmtree(old, ignore_errors=True)

    def overwrite_partition(
        self, df: DataFrame, table: str, part_col: str, value
    ) -> None:
        """Idempotent exactly-once partition write: write to a staging dir,
        atomically rename into place (the parquet analog of Iceberg's
        overwrite-by-partition, which makes checkpoint resume safe)."""
        final = self.partition_path(table, part_col, value)
        stage = final + f".__stage_{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").parquet(stage)
        if os.path.isdir(final):
            shutil.rmtree(final)
        os.rename(stage, final)

    def append_partitioned(
        self, df: DataFrame, table: str, part_col: str, tag: str | None = None
    ) -> list:
        """Append rows into an existing hive-partitioned table: one staged
        partitioned write, then per-file renames into the live partition
        dirs (unique names — concurrent readers never see partial files;
        Iceberg's snapshot append is the transactional version of this).
        ``tag`` marks every appended file so a failed multi-table append
        can be rolled back file-by-file (remove_tagged). Returns the
        partition values appended to."""
        final = self.table_path(table)
        stage = final + f".__append_{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").partitionBy(part_col).parquet(stage)
        tag = tag or uuid.uuid4().hex[:8]
        touched = []
        for d in sorted(os.listdir(stage)):
            if not d.startswith(f"{part_col}="):
                continue
            src = os.path.join(stage, d)
            dst = os.path.join(final, d)
            os.makedirs(dst, exist_ok=True)
            for fn in os.listdir(src):
                if fn.startswith("part-"):
                    os.rename(
                        os.path.join(src, fn), os.path.join(dst, f"a{tag}-{fn}")
                    )
            open(os.path.join(dst, "_SUCCESS"), "a").close()
            touched.append(d.split("=", 1)[1])
        shutil.rmtree(stage, ignore_errors=True)
        return touched

    def append_table(
        self, df: DataFrame, table: str, tag: str | None = None
    ) -> None:
        """Append rows to an unpartitioned table (staged write + renames)."""
        final = self.table_path(table)
        stage = final + f".__append_{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").parquet(stage)
        tag = tag or uuid.uuid4().hex[:8]
        os.makedirs(final, exist_ok=True)
        for fn in os.listdir(stage):
            if fn.startswith("part-"):
                os.rename(
                    os.path.join(stage, fn), os.path.join(final, f"a{tag}-{fn}")
                )
        shutil.rmtree(stage, ignore_errors=True)

    def remove_tagged(self, table: str, tag: str) -> int:
        """Roll back a tagged append: delete every ``a{tag}-*`` file under
        the table (including partition subdirs). Returns files removed."""
        root = self.table_path(table)
        if not os.path.isdir(root):
            return 0
        prefix = f"a{tag}-"
        removed = 0
        for dirpath, _dirnames, filenames in os.walk(root):
            for fn in filenames:
                if fn.startswith(prefix):
                    os.remove(os.path.join(dirpath, fn))
                    removed += 1
        return removed

    def partition_complete(self, table: str, part_col: str, value) -> bool:
        p = self.partition_path(table, part_col, value)
        return os.path.isdir(p) and os.path.exists(os.path.join(p, "_SUCCESS"))

    # -- reads --------------------------------------------------------------

    def _has_data_files(self, table: str) -> bool:
        """True iff any parquet data file exists under the table dir
        (including partition subdirs). The structural form of the
        \"zero-file table\" check — a dir holding only _SUCCESS/_meta is
        the footprint of writing an empty DataFrame."""
        for _dirpath, _dirnames, filenames in os.walk(self.table_path(table)):
            if any(fn.endswith(".parquet") for fn in filenames):
                return True
        return False

    def read(
        self, spark: SparkSession, table: str, schema_json: str | None = None
    ) -> DataFrame:
        """Read a table; ``schema_json`` (a StructType.json() string) makes
        the read robust to ZERO-FILE tables — a parquet dir holding only
        _SUCCESS (the footprint of writing an empty DataFrame) cannot
        infer a schema, but an empty corpus partition / empty first
        micro-batch is a legitimate state the index lifecycle must
        survive. The zero-file state is detected STRUCTURALLY (no data
        files on disk) rather than by matching Spark's version-specific
        UNABLE_TO_INFER_SCHEMA message, so any other read failure
        (corrupt footers, permissions) surfaces immediately."""
        reader = spark.read.option("basePath", self.table_path(table))
        if schema_json is not None and not self._has_data_files(table):
            import json as _json

            from pyspark.sql.types import StructType

            return (
                spark.read.schema(StructType.fromJson(_json.loads(schema_json)))
                .option("basePath", self.table_path(table))
                .parquet(self.table_path(table))
            )
        return reader.parquet(self.table_path(table))

    def read_partitions(
        self, spark: SparkSession, table: str, part_col: str, values: list
    ) -> DataFrame:
        """Partition-pruned read: only the named partition dirs are listed —
        the on-disk realization of inverted-index term lookup."""
        paths = [
            self.partition_path(table, part_col, v)
            for v in values
            if os.path.isdir(self.partition_path(table, part_col, v))
        ]
        if not paths:
            raise FileNotFoundError(
                f"no partitions {values} in table {table}"
            )
        return (
            spark.read.option("basePath", self.table_path(table))
            .parquet(*paths)
        )

    # -- metadata / lineage ---------------------------------------------------

    def write_meta(self, table: str, meta: dict) -> None:
        """Atomic metadata write. Every write stamps a fresh
        ``meta_version`` (uuid): readers that cache derived state (e.g.
        Searcher's term->df map) key their cache on it — file stat
        (mtime, size) is NOT a safe epoch on coarse-timestamp filesystems,
        where two same-length rewrites within one tick would serve a
        stale cache."""
        os.makedirs(self.table_path(table), exist_ok=True)
        meta = dict(meta)
        meta["meta_version"] = uuid.uuid4().hex
        tmp = os.path.join(self.table_path(table), f"._meta_{uuid.uuid4().hex[:8]}")
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=1)
        os.replace(tmp, os.path.join(self.table_path(table), "_meta.json"))

    def read_meta(self, table: str) -> dict:
        with open(os.path.join(self.table_path(table), "_meta.json")) as f:
            return json.load(f)

    def lineage_append(self, table: str, row: dict) -> None:
        os.makedirs(self.table_path(table), exist_ok=True)
        with open(os.path.join(self.table_path(table), "_lineage.jsonl"), "a") as f:
            f.write(json.dumps(row) + "\n")

    def lineage_rows(self, table: str) -> list[dict]:
        p = os.path.join(self.table_path(table), "_lineage.jsonl")
        if not os.path.exists(p):
            return []
        with open(p) as f:
            return [json.loads(line) for line in f if line.strip()]
