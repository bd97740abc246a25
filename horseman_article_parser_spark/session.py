"""SparkSession factory with scale-oriented defaults.

The defaults mirror what we would ship in spark-defaults.conf on a
1000-executor cluster: AQE on (runtime re-plan + skew-join splitting),
Arrow on (every per-row computation in this engine is a vectorized
pandas UDF — never per-row Python, per BASELINE.json input_hint), and
bounded Arrow batch sizes so large `bytes` (image) rows never blow up a
single Arrow record batch.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

# Number of shuffle partitions for local testing. On a real cluster this
# would be ~2-3x total cores (or left to AQE coalescing, which we enable).
_DEFAULT_SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_SHUFFLE", "32")


def get_spark(
    app_name: str = "horseman-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or reuse) a SparkSession tuned for this engine.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (driver contract)
    falling back to ``local[*]``.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # --- declarative-plan hygiene: let Catalyst/AQE do its job ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", _DEFAULT_SHUFFLE_PARTITIONS)
        # --- Arrow: all Python work is vectorized pandas UDFs ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # image `bytes` rows can be ~100KB-1MB; cap records per Arrow batch
        # so a batch stays well under executor memory (SURVEY §7.3).
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        # --- parquet scan sizing ---
        # Local default 16 MB so multi-row-group test files (~20 MB row
        # groups) scan with one task per row group instead of one task
        # for the whole file — a row group is the minimum split unit,
        # so a 128 MB split swallows a 126 MB/6-row-group file whole
        # and serializes the scan (guide §6). Production deployments
        # with 128 MB-1 GB row groups should set
        # SPARK_GRAFT_MAX_PARTITION_BYTES to 128 MB+ (larger splits cut
        # task-scheduling overhead and the map-task count feeding
        # shuffles, guide §2.2); the value is env-parameterised, not a
        # local-only constant baked into the plan.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "16777216"),
        )
        # deterministic session timezone for timestamp parity with DuckDB
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Ship this package to executor Python workers (the local-mode
    equivalent of `spark-submit --py-files pkg.zip`, north rule). Without
    it, pandas-UDF closures referencing package modules fail to unpickle
    on workers whenever the driver's CWD isn't the repo root."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(pkg_dir)
    sources: list[tuple[str, str]] = []
    newest = 0.0
    for root, _dirs, files in os.walk(pkg_dir):
        for fname in files:
            if fname.endswith(".py"):
                full = os.path.join(root, fname)
                rel = os.path.join(pkg_name, os.path.relpath(full, pkg_dir))
                sources.append((full, rel))
                newest = max(newest, os.path.getmtime(full))
    # cache key = newest source mtime across the WHOLE tree (the package
    # dir's own mtime misses edits inside subpackages → stale executors)
    zip_path = os.path.join(tempfile.gettempdir(), f"{pkg_name}-{newest:.0f}.zip")
    if not os.path.exists(zip_path):
        tmp = zip_path + ".tmp"
        with zipfile.ZipFile(tmp, "w") as zf:
            for full, rel in sorted(sources):
                zf.write(full, rel)
        os.replace(tmp, zip_path)
    spark.sparkContext.addPyFile(zip_path)
