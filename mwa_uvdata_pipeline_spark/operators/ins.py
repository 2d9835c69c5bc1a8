"""A5/A6 — incoherent noise spectrum and its z-score (SURVEY.md §2.4).

INS = sample-weighted mean of |V| over the baseline axis per
(time, freq, pol), restricted by spectrum_type (the SSINS core
statistic; config surface reference configurators.py:86-97, math in the
pinned SSINS dependency). Flagged cells are excluded from the mean.

z-score (SSINS ``metric_ms``) standardizes INS across time per
(chan, pol) — computed as group-agg + broadcast rejoin rather than a
window so the per-group stats are one hash aggregation (the group count
Nchan x Npol is tiny; the rejoin broadcasts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mwa_uvdata_pipeline_spark.functions.complexnum import c_abs
from mwa_uvdata_pipeline_spark.operators.select import SpectrumType, spectrum_predicate


def incoherent_noise_spectrum(
    vis: DataFrame,
    spectrum_type: SpectrumType = "cross",
    group_keys: tuple[str, ...] = ("time_idx", "chan", "pol"),
) -> DataFrame:
    """Per-(time, chan, pol): mean |V| over unflagged baselines, the
    summed sample weight, and flag occupancy.

    One hash aggregation; Catalyst does map-side partial aggregation so
    the shuffle carries only Ntimes x Nchan x Npol groups regardless of
    baseline count — this is the operator that collapses 100 TB to MBs.
    """
    df = vis.where(spectrum_predicate(spectrum_type))
    mag = c_abs(F.col("vis"))
    ok = ~F.col("flag")
    w = F.col("nsample")
    wsum = F.sum(F.when(ok, w).otherwise(F.lit(0.0)))
    return df.groupBy(*group_keys).agg(
        # NULL (not 0/0=NaN) when every contributing cell is flagged
        F.when(wsum > 0, F.sum(F.when(ok, mag * w).otherwise(F.lit(0.0))) / wsum)
        .alias("ins"),
        F.sum(F.when(ok, w).otherwise(F.lit(0.0))).alias("nsample_sum"),
        F.avg(F.col("flag").cast("double")).alias("flag_occupancy"),
        F.count(F.lit(1)).alias("n_baselines"),
    )


_MAD_TO_SIGMA = 1.4826022185056018  # 1/Phi^-1(3/4): MAD → sigma for a Gaussian


def zscore(
    ins: DataFrame,
    value_col: str = "ins",
    part_keys: tuple[str, ...] = ("chan", "pol"),
    method: str = "mad",
    strategy: str = "join",
) -> DataFrame:
    """A6: per-(chan, pol) standardization of INS across time.

    Default is the robust median/MAD estimator: SSINS applies its match
    filter iteratively precisely because a bright RFI spike contaminates
    the plain mean/stddev of its own channel; median/MAD gives the
    one-shot equivalent (the spike cannot drag the location/scale
    estimate). ``method="std"`` keeps the classic mean/stddev z.
    Degenerate groups (zero scale) get z=0 so thresholds stay defined.

    Two physical strategies, identical results (pinned by
    test_round9.py): ``"join"`` runs hash aggs + broadcast rejoins —
    each stats pass is its own broadcast-build job, fine when the INS
    table is consumed once; ``"window"`` computes the same stats as
    window aggregates over one partitioning — ONE exchange, no
    broadcast builds, the latency-light shape for chained pipelines
    (the E2E lifecycle entry: 6 broadcast builds over a 5k-row table
    cost more than the 705k-row archive scan).
    """
    keys = list(part_keys)
    if strategy == "window":
        from pyspark.sql import Window

        w = Window.partitionBy(*part_keys)
        if method == "std":
            out = ins.withColumn("_loc", F.avg(value_col).over(w)).withColumn(
                "_scale", F.stddev_samp(value_col).over(w)
            )
        else:
            out = ins.withColumn(
                "_loc", F.median(value_col).over(w)
            ).withColumn(
                "_scale",
                F.median(F.abs(F.col(value_col) - F.col("_loc"))).over(w)
                * F.lit(_MAD_TO_SIGMA),
            )
        z = F.when(
            F.col("_scale").isNull() | (F.col("_scale") == 0.0), F.lit(0.0)
        ).otherwise((F.col(value_col) - F.col("_loc")) / F.col("_scale"))
        z = F.when(
            F.col(value_col).isNull(), F.lit(None).cast("double")
        ).otherwise(z)
        return out.withColumn("z", z).drop("_loc", "_scale")
    if method == "std":
        stats = ins.groupBy(*part_keys).agg(
            F.avg(value_col).alias("_loc"),
            F.stddev_samp(value_col).alias("_scale"),
        )
        joined = ins.join(F.broadcast(stats), keys, "left")
    else:
        med = ins.groupBy(*part_keys).agg(F.median(value_col).alias("_loc"))
        with_med = ins.join(F.broadcast(med), keys, "left")
        mad = (
            with_med.groupBy(*part_keys)
            .agg(F.median(F.abs(F.col(value_col) - F.col("_loc"))).alias("_mad"))
            .withColumn("_scale", F.col("_mad") * F.lit(_MAD_TO_SIGMA))
            .drop("_mad")
        )
        joined = with_med.join(F.broadcast(mad), keys, "left")
    z = F.when(
        F.col("_scale").isNull() | (F.col("_scale") == 0.0), F.lit(0.0)
    ).otherwise((F.col(value_col) - F.col("_loc")) / F.col("_scale"))
    # fully-flagged cells have NULL ins → NULL z (flows through as "no evidence")
    z = F.when(F.col(value_col).isNull(), F.lit(None).cast("double")).otherwise(z)
    return joined.withColumn("z", z).drop("_loc", "_scale")
