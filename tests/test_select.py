"""Select-surface semantics against brute-force pandas (SURVEY.md §2.2)."""

from __future__ import annotations

import pytest

from mwa_uvdata_pipeline_spark.operators.select import SelectOptions, apply_select


@pytest.fixture(scope="module")
def vis_pdf(vis):
    return vis.select("time_idx", "ant1", "ant2", "chan", "freq_hz", "pol").toPandas()


def test_sel_ants(vis, vis_pdf):
    got = apply_select(vis, SelectOptions(sel_ants=[0, 1, 2], remove_flagged_ants=False)).count()
    want = vis_pdf[vis_pdf.ant1.isin([0, 1, 2]) & vis_pdf.ant2.isin([0, 1, 2])].shape[0]
    assert got == want


def test_skip_ants(vis, vis_pdf):
    got = apply_select(vis, SelectOptions(skip_ants=[3], remove_flagged_ants=False)).count()
    want = vis_pdf[(vis_pdf.ant1 != 3) & (vis_pdf.ant2 != 3)].shape[0]
    assert got == want


def test_pols_freq_spectrum(vis, vis_pdf):
    opts = SelectOptions(
        sel_pols=["XX"],
        freq_range=(138_900_000.0, 138_980_000.0),
        spectrum_type="cross",
        remove_flagged_ants=False,
    )
    got = apply_select(vis, opts).count()
    m = vis_pdf[
        (vis_pdf.pol == "XX")
        & vis_pdf.freq_hz.between(138_900_000.0, 138_980_000.0)
        & (vis_pdf.ant1 != vis_pdf.ant2)
    ]
    assert got == m.shape[0]


def test_time_limit(vis):
    out = apply_select(vis, SelectOptions(time_limit=3, remove_flagged_ants=False))
    assert sorted(r["time_idx"] for r in out.select("time_idx").distinct().collect()) == [0, 1, 2]


def test_remove_flagged_ants(spark, vis, fixtures_dir):
    ants = spark.read.parquet(str(fixtures_dir / "antennas.parquet"))
    out = apply_select(vis, SelectOptions(remove_flagged_ants=True), antenna_dim=ants)
    # fixture ants 10/20/30/40 are flagged but the vis grid only has 0-7
    assert out.count() == vis.count()
