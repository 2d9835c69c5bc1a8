"""s_partition_pruning must actually prune at planning time: the date
predicate resolves against directory names (PartitionFilters), and the
scan's selected partition count is the 3 requested days, not all ~30.
"""

from __future__ import annotations

import re

from tests.conftest import SF_SMALL

from mwa_uvdata_pipeline_spark.plans import load_all


def test_partition_filters_prune_directories(spark):
    df = load_all()["s_partition_pruning"].spark(spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "event_date" in m.group(1), plan[:2000]
    # FileSourceScanExec reports "N files, M paths" style partition
    # counts differently across versions; assert via the data filter
    # NOT containing the date band (it was consumed by partitioning)
    dfilters = re.search(r"DataFilters: \[([^\]]*)\]", plan)
    assert dfilters is None or "event_date" not in dfilters.group(1)
