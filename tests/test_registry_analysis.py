"""Every registered plan must ANALYZE against the real driver testdata.

Round-2 regression this guards: the driver regenerated events.parquet
with plain-micros timestamps, which Spark 4 reads as TIMESTAMP_NTZ —
and ``unix_micros`` / ``cast(ts as double)`` call sites that were green
against the old TIMESTAMP(NANOS) data started throwing
AnalysisException (CORRECTNESS_r02: j7_asof_join, j8_range_join; plus
w6_range_frame / x6_time_representations / ev_sessionize outside the
driver's 50-entry window). Catalyst analysis (``df.schema``) resolves
every expression against the actual parquet schema without executing,
so this whole sweep runs in seconds and fails on type drift.

Streaming-exec entries execute eagerly inside the plan function; they
are exercised at sf0.001 which keeps them cheap.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL

from mwa_uvdata_pipeline_spark.plans import load_all


def _plan_names():
    return sorted(load_all())


@pytest.mark.parametrize("name", _plan_names())
def test_plan_analyzes_on_testdata(spark, name):
    plan = load_all()[name]
    df = plan.spark(spark, SF_SMALL)
    # forces full Catalyst analysis (schema resolution) but no execution
    assert len(df.schema.fields) > 0
