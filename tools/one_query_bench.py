"""Bench ONE query with bench.py's exact methodology in a fresh JVM:
sf0.001 warmup, clearCache + System.gc, cold run, min-of-3 warm, noop
sink. Prints one JSON line. Usage:

    python tools/one_query_bench.py <query> [repeats]

Env: SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as for bench.py. Each
repeat is a fresh subprocess (cold JVM), so numbers are comparable to
the driver's per-query bench values.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
from mwa_uvdata_pipeline_spark.plans import load_all
from mwa_uvdata_pipeline_spark.session import get_spark
name = os.environ["PROBE_QUERY"]
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("one-query-bench")
p = load_all()[name]
p.spark(spark, "/root/testdata/sf0.001").write.mode("overwrite").format("noop").save()
spark.catalog.clearCache()
spark.sparkContext._jvm.System.gc()
t0 = time.perf_counter()
p.spark(spark, sf_dir).write.mode("overwrite").format("noop").save()
cold = time.perf_counter() - t0
warm = float("inf"); cons = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    df = p.spark(spark, sf_dir)
    t1 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    warm = min(warm, time.perf_counter() - t0)
    cons = min(cons, t1 - t0)
print("ONE_RESULT " + json.dumps(
    {"query": name, "cold": round(cold, 3), "warm": round(warm, 3),
     "construct": round(cons, 3)}))
"""


def main() -> None:
    if len(sys.argv) < 2:
        print(__doc__)
        raise SystemExit(2)
    name = sys.argv[1]
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    for _ in range(repeats):
        env = dict(os.environ)
        env["PROBE_QUERY"] = name
        r = subprocess.run(
            [sys.executable, "-c", CHILD], env=env,
            capture_output=True, text=True, cwd="/root/repo",
        )
        for ln in r.stdout.splitlines():
            if ln.startswith("ONE_RESULT "):
                print(ln[len("ONE_RESULT "):], flush=True)
                break
        else:
            print(json.dumps({"query": name, "error": r.stderr[-400:]}),
                  flush=True)


if __name__ == "__main__":
    main()
