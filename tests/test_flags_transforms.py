"""SS.read correction transforms (SURVEY.md §2.9): seed_flags,
remove_coarse_band gain division, correct_van_vleck scaling."""

from __future__ import annotations

from pyspark.sql import functions as F

from mwa_uvdata_pipeline_spark.operators.flags import (
    correct_van_vleck,
    remove_coarse_band,
    seed_flags,
)


def test_seed_flags_clean_start(spark, vis):
    cleared = seed_flags(vis, flag_choice=None)
    assert cleared.where(F.col("flag")).count() == 0


def test_seed_flags_original_keeps_file_flags(spark, vis):
    kept = seed_flags(vis, flag_choice="original")
    assert kept.where(F.col("flag")).count() == vis.where(F.col("flag")).count()


def test_remove_coarse_band_identity_default(spark, vis):
    assert remove_coarse_band(vis).exceptAll(vis).isEmpty()


def test_remove_coarse_band_divides_by_gain(spark, vis):
    # dyadic gains → division is bit-exact
    gains = spark.createDataFrame(
        [(i, 2.0 if i % 2 == 0 else 0.5) for i in range(8)],
        "fine_offset int, gain double",
    )
    out = remove_coarse_band(vis, gains)
    joined = (
        out.select("time_idx", "ant1", "ant2", "chan", "pol",
                   F.col("vis")["re"].alias("re_c"))
        .join(
            vis.select("time_idx", "ant1", "ant2", "chan", "pol",
                       F.col("vis")["re"].alias("re_o")),
            ["time_idx", "ant1", "ant2", "chan", "pol"],
        )
    )
    even = joined.where(F.col("chan") % 2 == 0)
    odd = joined.where(F.col("chan") % 2 == 1)
    assert even.where(F.col("re_c") * 2.0 != F.col("re_o")).count() == 0
    assert odd.where(F.col("re_c") * 0.5 != F.col("re_o")).count() == 0


def test_van_vleck_scales_components(spark, vis):
    out = correct_van_vleck(vis, sigma_scale=2.0)
    j = (
        out.select("time_idx", "ant1", "ant2", "chan", "pol",
                   F.col("vis")["re"].alias("re_c"), F.col("vis")["im"].alias("im_c"))
        .join(
            vis.select("time_idx", "ant1", "ant2", "chan", "pol",
                       F.col("vis")["re"].alias("re_o"), F.col("vis")["im"].alias("im_o")),
            ["time_idx", "ant1", "ant2", "chan", "pol"],
        )
    )
    assert j.where(
        (F.col("re_c") != F.col("re_o") * 2.0) | (F.col("im_c") != F.col("im_o") * 2.0)
    ).count() == 0
