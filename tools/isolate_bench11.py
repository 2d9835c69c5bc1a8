"""Round-11 isolation re-bench (r10 verdict #5): j10_bucketed_join
and ev_forecast_holt moved >1.25x in the r10 bench (0.18 -> 0.24 s,
0.40 -> 0.55 s — both sub-second, both with unchanged plans/hashes).
Run each alone in one JVM — warmup at sf0.001, then N timed runs at
sf0.1 with the bench harness's clearCache + System.gc discipline —
to separate a real stage regression from roster/JIT/concurrency
noise, like the r9 sim_pq_adc_topk trace (SCALE.md r10).

Usage: python tools/isolate_bench11.py [name ...] [--runs N]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

DEFAULT = ["j10_bucketed_join", "ev_forecast_holt"]


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 10
    for a in sys.argv[1:]:
        if a.startswith("--runs"):
            runs = int(a.split("=", 1)[1])
    names = args or DEFAULT

    from mwa_uvdata_pipeline_spark.plans import load_all
    from mwa_uvdata_pipeline_spark.session import get_spark

    spark = get_spark("isolate-bench")
    plans = load_all()
    for name in names:
        p = plans[name]
        # same warmup + hygiene as bench.py
        p.spark(spark, "/root/testdata/sf0.001").write.mode(
            "overwrite"
        ).format("noop").save()
        times = []
        for _ in range(runs):
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            p.spark(spark, "/root/testdata/sf0.1").write.mode(
                "overwrite"
            ).format("noop").save()
            times.append(round(time.perf_counter() - t0, 3))
        print(
            f"{name}: min={min(times)} median={sorted(times)[len(times)//2]}"
            f" all={times}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
