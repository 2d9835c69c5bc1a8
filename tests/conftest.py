from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import os

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"
# bench-scale fixture for recall-floor tests; same env knob bench.py
# honors, skip-gated by the tests when the directory is absent
SF_BENCH = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


@pytest.fixture(scope="session")
def sf_bench():
    """Bench-scale data dir for recall-floor tests; skips (rather than
    errors) on machines without the generated sf0.1 fixture set."""
    if not Path(SF_BENCH, "embeddings.parquet").exists():
        pytest.skip(f"bench fixture set absent: {SF_BENCH}")
    return SF_BENCH


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
