"""Domain-pipeline throughput probe: generate a large synthetic
visibility hypercube (executor-side, no driver loops), run the full
SSINS pipeline (diff → INS → z → match filter), report cells/second.

Usage: python tools/bench_domain.py [n_times n_ants n_chans]
Defaults give ~19.4M cells (50 x C(64,2)+64 x 96 x 2) — about the
payload of one MWA coarse-channel file set.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from mwa_uvdata_pipeline_spark.pipeline import PipelineConfig, ssins_pipeline
from mwa_uvdata_pipeline_spark.operators.select import SelectOptions
from mwa_uvdata_pipeline_spark.session import get_spark


def synth_vis(spark, n_times: int, n_ants: int, n_chans: int, n_pols: int = 2):
    """Hypercube rows generated on executors from spark.range — the
    baseline dim is the only driver-built piece (n_ants^2/2 rows)."""
    baselines = [
        (i, a1, a2)
        for i, (a1, a2) in enumerate(
            (a1, a2) for a1 in range(n_ants) for a2 in range(a1, n_ants)
        )
    ]
    bl = spark.createDataFrame(baselines, "bl_idx int, ant1 int, ant2 int")
    n_bl = len(baselines)
    pols = F.array(*[F.lit(p) for p in ("XX", "YY", "XY", "YX")[:n_pols]])
    base = (
        spark.range(n_times * n_bl * n_chans)
        .select(
            F.expr(f"CAST(id DIV {n_bl * n_chans} AS INT)").alias("time_idx"),
            F.expr(f"CAST((id DIV {n_chans}) % {n_bl} AS INT)").alias("bl_idx"),
            F.expr(f"CAST(id % {n_chans} AS INT)").alias("chan"),
            F.col("id").alias("id"),
        )
        .join(F.broadcast(bl), "bl_idx")
        .select(
            "time_idx", "ant1", "ant2", "chan",
            F.explode(pols).alias("pol"),
            (1.3e8 + F.col("chan") * 4e4).alias("freq_hz"),
            F.struct(
                ((F.xxhash64("id") % 1000) / 500.0).alias("re"),
                ((F.xxhash64(F.col("id") + 1) % 1000) / 500.0).alias("im"),
            ).cast("struct<re: double, im: double>").alias("vis"),
            F.lit(False).alias("flag"),
            F.lit(1.0).cast("float").alias("nsample"),
        )
    )
    return base


def main() -> None:
    args = [int(a) for a in sys.argv[1:4]] or [50, 64, 96]
    n_times, n_ants, n_chans = (args + [50, 64, 96])[:3]
    spark = get_spark("bench-domain")
    vis = synth_vis(spark, n_times, n_ants, n_chans)
    path = "/tmp/scale_vis.parquet"
    vis.write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path)
    n_cells = df.count()

    cfg = PipelineConfig(
        select=SelectOptions(spectrum_type="cross", remove_flagged_ants=False)
    )
    t0 = time.time()
    mf = ssins_pipeline(df, cfg)
    n_out = mf.count()
    dt = time.time() - t0
    print(json.dumps({
        "metric": "ssins_pipeline_cells_per_sec",
        "value": round(n_cells / dt),
        "unit": "cells/sec",
        "n_cells": n_cells,
        "wall_sec": round(dt, 2),
        "mf_rows": n_out,
    }))


if __name__ == "__main__":
    main()
