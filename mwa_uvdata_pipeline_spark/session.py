"""SparkSession factory with scale-aware defaults.

Local-mode testing uses ``local[$SPARK_GRAFT_CPUS]``; the same settings
(AQE on, skew-join handling, UTC session time) are the ones we would
ship on a 1000-executor cluster — only master/memory change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "mwa-uvdata-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    AQE handles runtime coalescing and skew joins so the static
    ``spark.sql.shuffle.partitions`` only needs to be a sane upper bound
    (local: ~cores; cluster: 2-3x total cores).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or 32))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 16g, not the box's full headroom: in local mode the driver
        # JVM hosts every executor thread, and an oversized G1 heap
        # trades frequent short collections for rare multi-second ones
        # (measured on the 46-query bench: 48g heap -> 2.65s Full-GC
        # pauses and 1-2 queries per run with all-warm-runs stalls;
        # 16g -> total 43.2s with zero warm>cold anomalies, vs
        # 45.9-54.7s at 48g). On a cluster the driver does no task
        # work and this knob is sized to plan/broadcast needs instead;
        # override via SPARK_DRIVER_MEM either way (guide §5).
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # the generated-class cache defaults to 100 entries; a session
        # that runs the whole 46-query roster (bench, oracle sweep)
        # compiles far more codegen units than that, and an evicted
        # unit is re-janino-compiled ON THE DRIVER at next use —
        # showing up as random queries whose every repeat stalls.
        # Sizing the cache to the workload is scale-neutral (same
        # per-executor benefit on a cluster).
        .config("spark.sql.codegen.cache.maxEntries", "2000")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ship_package(spark: SparkSession) -> None:
    """Zip this package and addPyFile it so python workers can import
    it regardless of the driver's working directory — the local-mode
    equivalent of ``spark-submit --py-files``. Needed by code that
    pickles classes by reference (the mwa_vis DataSource); idempotent.
    """
    import pathlib
    import zipfile

    pkg = pathlib.Path(__file__).resolve().parent
    zpath = f"/tmp/{pkg.name}_pyfiles.zip"
    marker = f"_shipped_{pkg.name}"
    if getattr(spark, marker, False):
        return
    with zipfile.ZipFile(zpath, "w") as z:
        for p in sorted(pkg.rglob("*.py")):
            z.write(p, f"{pkg.name}/{p.relative_to(pkg)}")
    spark.sparkContext.addPyFile(zpath)
    setattr(spark, marker, True)
