"""Measure how headline plans scale when facts grow 10x.

Builds a synthetic 10x dataset from sf0.1: fact tables (lineitem,
orders, events) are unioned 10 times with key offsets so join keys
stay consistent and cardinalities grow linearly; dimensions are kept
as-is (the realistic growth mode — facts grow, dims don't). Then
times a headline subset at both scales (best of 2 warm runs) and
prints the time ratio per query. A plan whose ratio is near the data
ratio (or below it, since fixed overhead amortizes) scales linearly;
a super-linear ratio exposes a hidden all-pairs/skew problem.

Usage: python tools/scale_probe.py [n_copies]   (default 10)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

SRC = "/root/testdata/sf0.1"
DST = "/tmp/scale_probe"

QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q18_large_orders",
    "j1_broadcast_lookup",
    "dedup_exact",
    "ev_funnel",
    "ev_retention",
    "x_unpivot",
]

KEY_OFFSETS = {
    "lineitem": {"l_orderkey": 1_000_000_000},
    "orders": {"o_orderkey": 1_000_000_000},
    "events": {"event_id": 1_000_000_000},
}


def build(spark, n_copies: int) -> None:
    from pyspark.sql import functions as F

    from mwa_uvdata_pipeline_spark.plans import table

    os.makedirs(DST, exist_ok=True)
    tables = "region nation customer supplier part orders lineitem events documents embeddings".split()
    for t in tables:
        df = table(spark, SRC, t)
        if t in KEY_OFFSETS:
            copies = []
            for i in range(n_copies):
                c = df
                for col, step in KEY_OFFSETS[t].items():
                    c = c.withColumn(col, F.col(col) + F.lit(i * step))
                copies.append(c)
            out = copies[0]
            for c in copies[1:]:
                out = out.unionByName(c)
        else:
            out = df
        out.write.mode("overwrite").parquet(f"{DST}/{t}.parquet")


def run(spark, plans, sf_dir: str) -> dict[str, float]:
    times = {}
    for name in QUERIES:
        p = plans[name]
        p.spark(spark, sf_dir).write.mode("overwrite").format("noop").save()
        best = float("inf")
        for _ in range(2):
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            p.spark(spark, sf_dir).write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        times[name] = best
    return times


def main() -> None:
    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10

    from mwa_uvdata_pipeline_spark.plans import load_all
    from mwa_uvdata_pipeline_spark.session import get_spark

    spark = get_spark("scale-probe")
    plans = load_all()
    print(f"building {n_copies}x facts at {DST} ...", flush=True)
    build(spark, n_copies)
    base = run(spark, plans, SRC)
    big = run(spark, plans, DST)
    print(f"\n{'query':<24}{'sf0.1':>9}{'10x':>9}{'ratio':>8}")
    for name in QUERIES:
        print(
            f"{name:<24}{base[name]:>9.2f}{big[name]:>9.2f}"
            f"{big[name] / base[name]:>8.1f}"
        )


if __name__ == "__main__":
    main()
