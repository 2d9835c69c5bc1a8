from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from mwa_uvdata_pipeline_spark.session import get_spark

    s = get_spark("tests", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def fixtures_dir():
    d = REPO / "fixtures"
    if not (d / "visibilities.parquet").exists():
        import subprocess

        subprocess.run(
            [sys.executable, str(REPO / "tools" / "make_fixtures.py")], check=True
        )
    return d


@pytest.fixture(scope="session")
def vis(spark, fixtures_dir):
    return spark.read.parquet(str(fixtures_dir / "visibilities.parquet"))
