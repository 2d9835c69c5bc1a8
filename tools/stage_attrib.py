"""Attribute a query's WARM-run wall time to physical stages.

Runs the query twice untimed (cold + caches), then once under a job
description marker with the Spark event log enabled, and prints each
stage of that run with its duration, task count and submission order —
the ground truth for "where do the seconds go" that a formatted plan
cannot give (guide §1: measure first).

Usage: python tools/stage_attrib.py <query> [sf_dir]
"""

from __future__ import annotations

import glob
import io
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    if len(sys.argv) < 2:
        print(__doc__)
        raise SystemExit(2)
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    evdir = f"/tmp/evlog_{os.getpid()}"
    os.makedirs(evdir, exist_ok=True)

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.appName(f"attrib-{name}")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.codegen.cache.maxEntries", "2000")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", evdir)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from mwa_uvdata_pipeline_spark.plans import load_all

    df = load_all()[name].spark(spark, sf_dir)

    def noop(d) -> None:
        d.write.format("noop").mode("overwrite").save()

    noop(df)  # cold + cache builds
    noop(df)  # settle
    spark.sparkContext.setJobDescription("ATTRIB")
    t0 = time.time()
    noop(df)
    wall = time.time() - t0
    spark.sparkContext.setJobDescription(None)
    appid = spark.sparkContext.applicationId
    spark.stop()

    stages: dict[int, dict] = {}
    props: dict[int, str] = {}
    for p in glob.glob(f"{evdir}/*{appid}*/events_*") + glob.glob(
        f"{evdir}/{appid}*"
    ):
        if p.endswith(".zstd"):
            try:
                import zstandard as zstd

                fh = io.TextIOWrapper(
                    zstd.ZstdDecompressor().stream_reader(open(p, "rb")),
                    encoding="utf-8",
                )
            except ImportError:
                import subprocess

                out = subprocess.run(
                    ["zstd", "-dc", p], capture_output=True, check=True
                )
                fh = io.StringIO(out.stdout.decode())
        elif os.path.isfile(p):
            fh = open(p, encoding="utf-8")
        else:
            continue
        for line in fh:
            try:
                e = json.loads(line)
            except ValueError:
                continue
            ev = e.get("Event", "")
            if ev == "SparkListenerJobStart":
                props[e["Job ID"]] = e.get("Properties", {}).get(
                    "spark.job.description", ""
                )
                for s in e.get("Stage Infos", []):
                    stages.setdefault(s["Stage ID"], {})["job"] = e["Job ID"]
            elif ev == "SparkListenerStageCompleted":
                s = e["Stage Info"]
                d = stages.setdefault(s["Stage ID"], {})
                d["dur"] = s.get("Completion Time", 0) - s.get(
                    "Submission Time", 0
                )
                d["sub"] = s.get("Submission Time", 0)
                d["tasks"] = s["Number of Tasks"]

    marked = {j for j, pr in props.items() if pr == "ATTRIB"}
    rows = sorted(
        (v["sub"], v["dur"], k, v.get("tasks"), v["job"])
        for k, v in stages.items()
        if v.get("job") in marked and "dur" in v
    )
    print(
        json.dumps(
            {
                "query": name,
                "wall_sec": round(wall, 3),
                "n_jobs": len(marked),
                "n_stages": len(rows),
                "sum_stage_ms": sum(r[1] for r in rows),
            }
        )
    )
    for sub, dur, sid, nt, j in rows:
        print(f"stage {sid:4d} job {j:3d} dur={dur:5d}ms tasks={nt}")


if __name__ == "__main__":
    main()
