"""Bisect the BENCH_r15 ev_funnel regression (0.63 -> 1.37 s at 32
cores; 0.56 s at 8 cores): A/B the two round-15 config changes —
driver heap 48g->16g (ef282c8) and codegen cache 100->2000 (5790888) —
with the bench's own methodology (sf0.001 warmup, cold + min-of-3-warm,
noop sink), one fresh JVM per (heap, cache) cell per repeat.

Usage: python tools/funnel_bisect.py [query ...]   (default: ev_funnel)
Each cell is printed as one JSON line; run it 3x for repeats.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

CELLS = [
    ("16g", "2000"),  # round-15 HEAD defaults
    ("48g", "2000"),  # pre-ef282c8 heap
    ("16g", "100"),   # pre-5790888 codegen cache (Spark default)
    ("48g", "100"),   # round-14 configuration
]

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

heap = os.environ["PROBE_HEAP"]
cache = os.environ["PROBE_CACHE"]
names = json.loads(os.environ["PROBE_QUERIES"])
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

spark = (
    SparkSession.builder.appName("funnel-bisect")
    .master(f"local[{cpus}]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.driver.memory", heap)
    .config("spark.ui.enabled", "false")
    .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    .config("spark.sql.python.filterPushdown.enabled", "true")
    .config("spark.sql.codegen.cache.maxEntries", cache)
    .getOrCreate()
)
spark.sparkContext.setLogLevel("WARN")

from mwa_uvdata_pipeline_spark.plans import load_all
plans = load_all()
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
out = {}
for name in names:
    p = plans[name]
    p.spark(spark, "/root/testdata/sf0.001").write.mode("overwrite").format("noop").save()
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()
    t0 = time.perf_counter()
    p.spark(spark, sf_dir).write.mode("overwrite").format("noop").save()
    cold = time.perf_counter() - t0
    warm = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        p.spark(spark, sf_dir).write.mode("overwrite").format("noop").save()
        warm = min(warm, time.perf_counter() - t0)
    out[name] = {"cold": round(cold, 3), "warm": round(warm, 3)}
print("CELL_RESULT " + json.dumps({"heap": heap, "cache": cache, "q": out}))
"""


def main() -> None:
    names = sys.argv[1:] or ["ev_funnel"]
    for heap, cache in CELLS:
        env = dict(os.environ)
        env["PROBE_HEAP"] = heap
        env["PROBE_CACHE"] = cache
        env["PROBE_QUERIES"] = json.dumps(names)
        r = subprocess.run(
            [sys.executable, "-c", CHILD], env=env,
            capture_output=True, text=True, cwd="/root/repo",
        )
        for ln in r.stdout.splitlines():
            if ln.startswith("CELL_RESULT "):
                print(ln[len("CELL_RESULT "):], flush=True)
                break
        else:
            print(json.dumps({"heap": heap, "cache": cache,
                              "error": r.stderr[-500:]}), flush=True)


if __name__ == "__main__":
    main()
