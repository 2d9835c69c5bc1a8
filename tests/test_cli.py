"""The __main__ CLI: list filters the registry, run executes an entry."""

from __future__ import annotations

from mwa_uvdata_pipeline_spark.__main__ import main
from tests.conftest import SF_SMALL


def test_cli_list_filters(capsys):
    assert main(["list", "dedup"]) == 0
    out = capsys.readouterr().out
    assert "dedup_exact" in out
    assert "q1_pricing_summary" not in out


def test_cli_run_prints_rows(spark, capsys):
    assert main(["run", "q6_forecast_revenue", "--sf-dir", SF_SMALL]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0] == "revenue"
    assert len(out) == 2


def test_cli_unknown_entry(capsys):
    assert main(["run", "nope"]) == 2


def test_cli_run_prints_conf_residues(spark, capsys, monkeypatch):
    """run surfaces session confs a loader left set (nanos-as-long)
    on stderr after execution, instead of leaving the behavior change
    silent (round-7 verdict item 8)."""
    from mwa_uvdata_pipeline_spark import plans

    monkeypatch.setitem(
        plans._SESSION_CONF_RESIDUES,
        "spark.sql.legacy.parquet.nanosAsLong",
        "events footer carries TIMESTAMP(NANOS)",
    )
    assert main(["run", "q6_forecast_revenue", "--sf-dir", SF_SMALL]) == 0
    err = capsys.readouterr().err
    assert "session conf residue" in err
    assert "nanosAsLong" in err


def test_cli_run_no_residue_line_when_clean(spark, capsys):
    from mwa_uvdata_pipeline_spark import plans

    saved = dict(plans._SESSION_CONF_RESIDUES)
    plans._SESSION_CONF_RESIDUES.clear()
    try:
        assert main(
            ["run", "q6_forecast_revenue", "--sf-dir", SF_SMALL]
        ) == 0
        assert "session conf residue" not in capsys.readouterr().err
    finally:
        plans._SESSION_CONF_RESIDUES.update(saved)


def test_cli_ingest_uvh5_summary(spark, vis, tmp_path, capsys):
    """ingest dispatches by extension through the format registry —
    a native-codec uvh5 file summarizes to the fixture's cell counts."""
    import pyarrow.parquet as pq
    import pandas as pd

    from mwa_uvdata_pipeline_spark.__main__ import main
    from mwa_uvdata_pipeline_spark.sources_hdf5 import write_uvh5

    raw = pq.read_table("fixtures/visibilities.parquet").to_pandas()
    pdf = pd.DataFrame(
        {
            "time_jd": raw["time_jd"],
            "ant1": raw["ant1"],
            "ant2": raw["ant2"],
            "chan": raw["chan"],
            "pol": raw["pol"],
            "freq_hz": raw["freq_hz"],
            "re": raw["vis"].map(lambda v: v["re"]),
            "im": raw["vis"].map(lambda v: v["im"]),
            "nsample": raw["nsample"].astype("f8"),
            "flag": raw["flag"],
            "uu": 0.25 * raw["ant1"],
            "vv": 0.5 * raw["ant2"],
            "ww": 0.125 * (raw["ant1"] + raw["ant2"]),
        }
    )
    path = str(tmp_path / "obs.uvh5")
    write_uvh5(pdf, path)
    assert main(["ingest", path, "--summary", "--limit", "5"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0].split("\t") == ["chan", "pol", "n", "n_flag"]
    # 10 times x 36 baselines = 360 rows per (chan, pol) cell
    assert out[1].split("\t")[:3] == ["0", "XX", "360"]
