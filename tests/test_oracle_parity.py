"""DuckDB-oracle equality for every registered plan at sf0.001 —
the same comparison the driver runs at sf0.01 (SURVEY.md §5.1)."""

from __future__ import annotations

import duckdb
import pytest

from tests.conftest import SF_SMALL

from mwa_uvdata_pipeline_spark.plans import load_all

PLANS = load_all()
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_SMALL}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(PLANS))
def test_plan_matches_oracle(spark, duck, name):
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from check_oracle import canonicalize

    plan = PLANS[name]
    sdf = plan.spark(spark, SF_SMALL).toPandas()
    if plan.sql is None:
        assert len(sdf) >= 0  # rows-only smoke for non-SQL-expressible ops
        return
    ddf = duck.sql(plan.sql).df()
    assert len(sdf) == len(ddf), f"row count {len(sdf)} != {len(ddf)}"
    assert sorted(sdf.columns) == sorted(ddf.columns)
    cs, cd = canonicalize(sdf), canonicalize(ddf)
    if not cs.equals(cd):
        neq = (cs != cd).any(axis=1)
        raise AssertionError(
            f"{int(neq.sum())} differing rows, e.g.\n"
            f"spark:\n{cs[neq].head(3)}\nduckdb:\n{cd[neq].head(3)}"
        )
