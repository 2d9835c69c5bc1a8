"""Hot-obsid skew probe for the d_e2e_lifecycle chain (VERDICT r9 #6).

The r9 growth probes grew the observation grid UNIFORMLY (8.8x cells
-> 1.38x wall); this probe concentrates the growth instead: one
observation gets 10x the integrations of its peers — the
one-pathological-observation archive (a long deep-field track among
ordinary snapshots). It answers: do the per-obsid INS/MF windows
SERIALIZE on the hot observation?

Design: three runs over the diff -> INS -> z(window) -> MF(window) ->
occupancy chain (the MWAB pack/scan is fixture IO shared by every
variant, not the operator under test, so the probe feeds the
synthetic hypercube straight to time_diff):

  base    — 3 obsids x nt=36          (the bench grid)
  hot     — obsid 1 at nt=360, others 36  (10x one obsid; 4x total)
  uniform — 3 obsids x nt=144         (SAME total cells as hot)

The serialization question is answered by hot/uniform, not hot/base:
both hold identical total work, only its distribution differs. A
chain that serializes on the hot observation's windows shows
hot >> uniform; a chain whose window partitions split past obsid
(z: (obsid, chan, pol); MF streak/tb: (obsid, chan|time, pol)) keeps
hot ~ uniform because even the hot obsid spreads over nc x npol = 48+
partitions.

Usage: python tools/skew_probe10.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

NA, NC = 16, 24
BASE_OBSID = 1_300_000_000


def synth(spark, nt_for_o):
    """_e2e_synth with a per-obsid integration count (CASE over o)."""
    nt_case = (
        "CASE o "
        + " ".join(f"WHEN {o} THEN {nt - 1}" for o, nt in enumerate(nt_for_o))
        + " END"
    )
    mid = NC // 2
    base = (
        spark.range(len(nt_for_o))
        .selectExpr("CAST(id AS INT) AS o")
        .selectExpr("o", f"explode(sequence(0, {nt_case})) AS time_idx")
    )
    # redistribute at the (o, time) grain BEFORE the heavy per-row
    # explode: the real plan reads one MWAB file PER TIME BLOCK, so
    # the hot obsid's 360 blocks arrive as 360 scan splits — without
    # this, the probe would serialize each obsid's GENERATION in one
    # task and measure fixture construction, not the operator chain
    sc = spark.sparkSession.sparkContext if hasattr(spark, "sparkSession") else spark.sparkContext
    base = base.repartition(sc.defaultParallelism, "o", "time_idx")
    return (
        base
        .selectExpr("*", f"explode(sequence(0, {NA - 1})) AS ant1")
        .selectExpr("*", f"explode(sequence(ant1, {NA - 1})) AS ant2")
        .selectExpr("*", f"explode(sequence(0, {NC - 1})) AS chan")
        .selectExpr("*", "explode(array('xx', 'yy')) AS pol")
        .selectExpr("*", "CASE WHEN pol = 'xx' THEN 0 ELSE 1 END AS p")
        .selectExpr(
            f"CAST({BASE_OBSID} + o AS BIGINT) AS obsid",
            "CAST(time_idx AS INT) AS time_idx",
            "2460000.0 + CAST(time_idx AS DOUBLE) / 86400.0 AS time_jd",
            "CAST(ant1 AS INT) AS ant1",
            "CAST(ant2 AS INT) AS ant2",
            "CAST(chan AS INT) AS chan",
            "150000000.0 + CAST(chan AS DOUBLE) * 40000.0 AS freq_hz",
            "pol",
            "struct("
            " CAST((o*37 + time_idx*13 + ant1*7 + ant2*11 + chan*5 + p*3)"
            "      % 256 - 128 AS DOUBLE) / 32.0"
            f" + CASE WHEN o = 1 AND chan = {mid} AND time_idx % 5 = 0"
            "        THEN 8.0 ELSE 0.0 END AS re,"
            " CAST((o*53 + time_idx*17 + ant1*3 + ant2*5 + chan*7 + p*13)"
            "      % 256 - 128 AS DOUBLE) / 32.0 AS im) AS vis",
            "(o + time_idx + ant1 + ant2 + chan + p) % 97 = 0 AS flag",
            "CAST(1.0 AS FLOAT) AS nsample",
        )
    )


def run_chain(spark, nt_for_o) -> float:
    from pyspark.sql import functions as F

    from mwa_uvdata_pipeline_spark.operators.diff import time_diff
    from mwa_uvdata_pipeline_spark.operators.ins import (
        incoherent_noise_spectrum,
        zscore,
    )
    from mwa_uvdata_pipeline_spark.operators.matchfilter import (
        MatchFilterConfig,
        match_filter,
    )

    t0 = time.time()
    d = time_diff(synth(spark, nt_for_o))
    ins = (
        incoherent_noise_spectrum(
            d, spectrum_type="cross",
            group_keys=("obsid", "time_idx", "chan", "pol"),
        )
        .withColumn("ins", F.round("ins", 9))
        .persist()
    )
    z = zscore(ins, part_keys=("obsid", "chan", "pol"), strategy="window")
    mf = match_filter(
        z, MatchFilterConfig(), obs_keys=("obsid",), strategy="window"
    )
    out = mf.groupBy("obsid", "pol").agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum(F.col("mf_flag").cast("int")).alias("n_mf"),
    ).collect()
    wall = time.time() - t0
    ins.unpersist()
    assert out
    return wall


def main() -> None:
    from mwa_uvdata_pipeline_spark.session import get_spark

    spark = get_spark("skew-probe10", shuffle_partitions=32)
    variants = {
        "base": [36, 36, 36],
        "hot": [36, 360, 36],
        "uniform": [144, 144, 144],
    }
    run_chain(spark, variants["base"])  # warmup
    res = {}
    for name, nts in variants.items():
        res[name] = round(min(run_chain(spark, nts) for _ in range(2)), 3)
    cells = {k: sum(v) * NC * 2 for k, v in variants.items()}
    out = {
        "probe": "d_e2e_lifecycle_hot_obsid",
        "wall_sec": res,
        "ins_cells": cells,
        "hot_vs_uniform": round(res["hot"] / res["uniform"], 2),
        "hot_vs_base": round(res["hot"] / res["base"], 2),
        "cells_ratio_vs_base": round(cells["hot"] / cells["base"], 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
