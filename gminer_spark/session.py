"""SparkSession factory tuned for the engine.

The reference system's runtime knobs live in gminer-conf.ini
(/root/reference/gminer-conf.ini:17-31 — cache size, thread counts,
pipeline batch sizes). Our analog is a small set of Spark confs: AQE
on (dynamic load balance, the analog of GMiner's master-coordinated
task stealing, /root/reference/core/master.tpp:140-177), shuffle
partitions sized to cores, and Arrow enabled for the vectorized
kernel path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "gminer_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or all cores).
    On a real cluster the same code ships via ``spark-submit --py-files``
    and ``master`` is provided by the submitter.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE", DEFAULT_SHUFFLE_PARTITIONS)
        )
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        # Cap per-action plan-description strings: nested cached-plan
        # trees print as trees (not DAGs), and a deep iterative chain
        # can make the explain string exponential even when the plan
        # object graph is small — the default cap is ~2^31 chars,
        # which is a driver OOM, not a cap (seen in the SCC trim loop
        # before its flat-rebuild fix; this guard keeps ANY such
        # regression a truncated string instead of a crash).
        .config("spark.sql.maxPlanStringLength", "8388608")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    # Shuffle through tmpfs when available — on a single box the local
    # shuffle is disk-latency-bound; a real cluster gets this from the
    # external shuffle service + page cache instead.
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir is None and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/spark-tmp"
    if local_dir:
        os.makedirs(local_dir, exist_ok=True)
        builder = builder.config("spark.local.dir", local_dir)
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Ship this package to the python workers (--py-files semantics).

    Arrow-kernel closures (mapInPandas/applyInPandas) are pickled BY
    REFERENCE to their defining module, so every worker must be able
    to ``import gminer_spark`` — true on a cluster only because
    spark-submit ships a zip.  Local sessions get the same guarantee
    here: zip the live package source once per process and addPyFile
    it, so a driver running from any cwd (or a notebook) works.
    """
    if getattr(spark, "_gminer_pyfiles_shipped", False):
        return
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join(
        tempfile.gettempdir(), f"gminer_spark_pyfiles_{os.getpid()}.zip"
    )
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                if "__pycache__" in root:
                    continue
                for fn in sorted(files):
                    if fn.endswith(".py"):
                        full = os.path.join(root, fn)
                        arc = os.path.join(
                            "gminer_spark", os.path.relpath(full, pkg_dir)
                        )
                        zf.write(full, arc)
    spark.sparkContext.addPyFile(zip_path)
    spark._gminer_pyfiles_shipped = True
