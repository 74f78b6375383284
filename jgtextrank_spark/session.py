"""SparkSession factory with scale-oriented defaults.

All engine entry points accept an externally-created session; this helper
exists so tests, ``bench.py`` and the CLI agree on configuration. The
defaults are the ones that matter at 100 TB:

* AQE on (runtime re-plan, skew-join splitting, partition coalescing),
* Arrow on (every Python-side UDF in this engine is a vectorized
  pandas/Arrow UDF — there are no row-at-a-time Python UDFs),
* shuffle partitions sized to the core count by default (callers running
  on a real cluster should size to 2-3x total cores).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

__all__ = ["get_spark", "ship_package"]


def ship_package(spark: SparkSession) -> str:
    """Ship this package to the executors' Python workers — the
    ``spark-submit --py-files`` story, automated. Zips ``jgtextrank_spark``
    and registers it with ``addPyFile`` so pandas-UDF closures that
    reference the package resolve on every worker regardless of the
    driver's cwd/sys.path."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join(
        tempfile.gettempdir(), "jgtextrank_spark_pyfiles.zip"
    )
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for fname in files:
                if not fname.endswith(".py"):
                    continue
                full = os.path.join(root, fname)
                rel = os.path.join(
                    "jgtextrank_spark", os.path.relpath(full, pkg_dir)
                )
                zf.write(full, rel)
    spark.sparkContext.addPyFile(zip_path)
    return zip_path


def get_spark(
    master: str | None = None,
    app_name: str = "jgtextrank-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``)
    for the sandbox; on a cluster pass ``None`` and let spark-submit decide.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        if master.startswith("local["):
            inner = master[len("local[") : -1]
            shuffle_partitions = 32 if inner == "*" else max(8, int(inner))
        else:
            shuffle_partitions = 200

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # local mode: the driver JVM IS the executor, so its heap must be
        # sized for executor-style work (cached adjacencies + shuffle +
        # broadcast churn across hundreds of supersteps). 8g forced tight
        # GC cycles on the 30M-edge bench graphs; 32g is right for a
        # 128 GiB box and is still overridable per deployment
        # (SPARK_DRIVER_MEM). On a real cluster the driver does no data
        # work and can stay small — size executors instead.
        .config(
            "spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "32g")
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    ship_package(spark)
    return spark
