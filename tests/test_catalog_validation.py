"""Catalog builder + V1-V8 validation rules (SURVEY.md §2.1, §2.8)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mwa_uvdata_pipeline_spark.catalog import (
    group_by_extension,
    group_by_obsid_and_extension,
    observations,
    resolve_channels,
    total_input_size,
    with_derived_columns,
)
from mwa_uvdata_pipeline_spark.operators.select import SelectOptions
from mwa_uvdata_pipeline_spark.validation import assert_valid, validation_report


@pytest.fixture(scope="module")
def catalog(spark, fixtures_dir):
    files = spark.read.parquet(str(fixtures_dir / "file_catalog.parquet"))
    cat = with_derived_columns(files.select("file_path", "size_bytes"))
    channels = spark.read.parquet(str(fixtures_dir / "channels.parquet"))
    return resolve_channels(cat, channels).cache()


def test_derived_columns(catalog):
    row = catalog.where(F.col("file_name").contains("gpubox01")).first()
    assert row["obsid"] == "1234567890"
    assert row["file_type"] == "fits"
    assert row["chan_kind"] == "gpubox"
    assert row["channel"] == 109  # gpubox 1 → rec_chan 109 via J1 lookup


def test_ch_branch(catalog):
    row = catalog.where(F.col("file_name").contains("_ch110")).first()
    assert row["channel"] == 110  # chNNN → direct int, no lookup


def test_grouping(catalog):
    by_ext = {r["file_type"]: r["n_files"] for r in group_by_extension(catalog).collect()}
    assert by_ext["metafits"] == 2
    assert by_ext["fits"] == 50  # 2x24 + malformed + orphan
    two_level = group_by_obsid_and_extension(catalog)
    assert two_level.where(
        (F.col("obsid") == "1234567890") & (F.col("file_type") == "fits")
    ).first()["n_files"] == 25


def test_observations_rollup(catalog):
    obs = {r["obsid"]: r for r in observations(catalog).collect()}
    assert len(obs["1234567890"]["metafits"]) == 1
    assert len(obs["1234568490"]["metafits"]) == 0  # the V3 orphan


def test_total_size(catalog):
    row = total_input_size(catalog).first()
    assert row["total_bytes"] > 0
    assert row["total_mib_blocks"] > 0


def test_validation_flags_planted_offenders(spark, catalog):
    report = validation_report(spark, catalog)
    rules = {r["rule"] for r in report.collect()}
    assert "V3" in rules  # obsid without metafits
    assert "V8" in rules  # _nochan.fits has no derivable channel
    with pytest.raises(ValueError, match="V3"):
        assert_valid(report)


def test_validation_clean_catalog(spark, catalog):
    clean = catalog.where(
        ~F.col("file_name").contains("nochan") & (F.col("obsid") != "1234568490")
    )
    report = validation_report(spark, clean)
    assert report.count() == 0
    assert_valid(report)  # no raise


def test_v6_option_exclusivity():
    with pytest.raises(ValueError, match="mutually exclusive"):
        SelectOptions(sel_ants=[1], skip_ants=[2])


def test_suffix_rule():
    # X9 (reference configurators.py:125-134)
    assert SelectOptions(spectrum_type="cross", sel_pols=["XX", "YY"]).suffix() == ".cross.XXYY"
    assert SelectOptions().suffix() == ""


def test_fileset_accessors_and_validation(spark, tmp_path):
    from mwa_uvdata_pipeline_spark.catalog import FileSet

    for name in ("1094480888_gpubox01_00.fits", "1094480888.metafits",
                 "1094480888_gpubox02_00.fits"):
        (tmp_path / name).write_bytes(b"x" * 100)
    fs = FileSet(spark, [str(tmp_path / n) for n in (
        "1094480888_gpubox01_00.fits", "1094480888.metafits",
        "1094480888_gpubox02_00.fits")])
    assert fs.has_fits and fs.has_metafits and not fs.has_uvh5
    assert len(fs.fits) == 2 and fs.fits == sorted(fs.fits)
    assert fs.total_size() == 300
    obs = fs.observations().collect()
    assert len(obs) == 1 and obs[0]["obsid"] == "1094480888"


def test_fileset_raises_aggregated_errors(spark, tmp_path):
    import pytest as _pytest

    from mwa_uvdata_pipeline_spark.catalog import FileSet

    # fits without any metafits → V2 and V3 both fire in ONE error
    (tmp_path / "123_gpubox01_00.fits").write_bytes(b"x")
    with _pytest.raises(ValueError, match="V2") as ei:
        FileSet(spark, [str(tmp_path / "123_gpubox01_00.fits")])
    assert "V3" in str(ei.value)
