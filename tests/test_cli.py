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
