"""Benchmark harness: runs the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line.

Execution uses the noop sink so results are fully materialized without
driver-collect overhead — the measured time is scan + shuffle + agg,
i.e. what a cluster would do.

Each query runs four times at the target SF: one cold run (reported
under "queries_cold" — local[32] pays 3-10s of JIT per novel codegen
path; measured: identical plans, 8.7s first run vs 2.5s thereafter)
then three repeats whose MIN is the headline "queries" value, matching
long-running-executor behavior on a real cluster where HotSpot has
compiled the codegen'd loops. The cold run is never folded into the
warm min; queries whose steady state is SLOWER than cold are called
out under "warm_slower_than_cold" so warm-path regressions surface.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from mwa_uvdata_pipeline_spark.plans import load_all
    from mwa_uvdata_pipeline_spark.session import get_spark

    spark = get_spark("bench")
    plans = load_all()
    bench_plans = {n: p for n, p in plans.items() if p.bench}

    # JVM/codegen warmup on the smallest SF (not timed)
    for p in bench_plans.values():
        p.spark(spark, "/root/testdata/sf0.001").write.mode("overwrite").format(
            "noop"
        ).save()
    spark.catalog.clearCache()

    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    total = 0.0
    for name, p in bench_plans.items():
        # drop blocks persisted by earlier runs of this or other plans:
        # re-persisting an identical lineage warns ("already cached") and
        # leftover blocks distort later queries' memory/GC (BENCH_r01's
        # j1 warm>cold anomaly)
        spark.catalog.clearCache()
        # pay accumulated GC debt outside the measured window — back-to-back
        # queries otherwise bill the previous query's garbage to this one
        # (BENCH_r02: q20 warm 2.1s vs cold 0.8s, all three warm runs slow)
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        p.spark(spark, sf_dir).write.mode("overwrite").format("noop").save()
        cold[name] = round(time.perf_counter() - t0, 3)
        # warm = min of the three REPEAT runs only — the cold run is
        # deliberately NOT folded in, so a genuine warm-path regression
        # (e.g. cache substitution making repeats slower) surfaces as
        # warm > cold instead of being masked by construction
        dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            p.spark(spark, sf_dir).write.mode("overwrite").format("noop").save()
            dt = min(dt, time.perf_counter() - t0)
        timings[name] = round(dt, 3)
        total += dt
    slower_warm = {
        n: {"warm": timings[n], "cold": cold[n]}
        for n in timings
        if timings[n] > cold[n]
    }

    # cold timings and warm-regression callouts go on their OWN line:
    # the driver records only the last ~2000 chars of output and
    # parses the FINAL line as the result. With 40+ headliners the
    # combined line outgrew that window (BENCH_r07 recorded
    # parsed: null) — so the final line stays compact and the
    # diagnostics line precedes it.
    print(
        json.dumps(
            {
                "diagnostics": "cold-run timings and warm>cold callouts",
                "queries_cold": cold,
                "warm_slower_than_cold": slower_warm,
            }
        )
    )
    print(final_line(total, timings, len(slower_warm), sf))


def final_line(
    total: float,
    timings: dict[str, float],
    warm_slower_count: int,
    sf: float,
    budget: int = 1800,
) -> str:
    """The ONE driver-parsed result line, kept under ``budget`` chars.

    The driver records only the tail of bench output and parses the
    final line; BENCH_r07 was lost to truncation when the combined
    line outgrew that ~2000-char window. Per-query warm times are
    rounded to 2 dp here (full 3-dp precision stays on the preceding
    diagnostics line), and if the roster still doesn't fit, the
    SLOWEST queries are kept — they're the ones a perf reader needs —
    with "queries_omitted" counting the fast tail that was dropped.
    """

    def line(t: dict[str, float], omitted: int) -> str:
        payload = {
            "metric": "headline_queries_total",
            "value": round(total, 3),
            "unit": "sec",
            "queries": {n: round(v, 2) for n, v in t.items()},
            "warm_slower_count": warm_slower_count,
            "sf": sf,
        }
        if omitted:
            payload["queries_omitted"] = omitted
        return json.dumps(payload)

    out = line(timings, 0)
    keep = len(timings)
    by_cost = sorted(timings, key=timings.get, reverse=True)
    while len(out) > budget and keep > 1:
        keep -= 1
        out = line(
            {n: timings[n] for n in by_cost[:keep]}, len(timings) - keep
        )
    return out


if __name__ == "__main__":
    main()
