"""SparkSession factory tuned for this engine.

Local-mode defaults match the sandbox (local[32], one JVM); all settings are
the ones that matter identically on a real multi-executor cluster: AQE on
(runtime re-plan + skew-join splitting), Arrow on (every hot-path UDF is a
pandas UDF), shuffle partitions sized to cores rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    cpus: int | None = None,
    app_name: str = "mahout_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    master: str | None = None,
) -> SparkSession:
    """``master`` overrides the default ``local[cpus]`` — e.g.
    ``local-cluster[4,4,4096]`` for a real multi-executor (multi-JVM)
    topology; ``cpus`` then still sizes shuffle partitions and should be
    the TOTAL core count across executors."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)
    # executor python workers must find this package: local[*] workers
    # inherit the driver's sys.path, but local-cluster / standalone
    # executors spawn their own interpreters (on a real cluster this is
    # the --py-files / container-image seam)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    exec_pythonpath = ":".join(
        p for p in [repo_root, os.environ.get("PYTHONPATH")] if p
    )
    builder = (
        SparkSession.builder.master(master or f"local[{cpus}]")
        .appName(app_name)
        .config("spark.executorEnv.PYTHONPATH", exec_pythonpath)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
