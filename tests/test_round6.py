"""Round-6 fixes: loader session-conf residue tracking (ADVICE r5)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from mwa_uvdata_pipeline_spark.plans import (
    load_events,
    session_conf_residues,
)


def _events_frame() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "event_id": np.arange(4, dtype="i8"),
            "user_id": np.array([1, 1, 2, 2], dtype="i8"),
            "event_type": ["view", "click", "view", "purchase"],
            "ts": pd.to_datetime(
                ["2025-01-01 00:00:00", "2025-01-01 00:01:00",
                 "2025-01-01 00:02:00", "2025-01-01 00:03:30"]
            ),
        }
    )


def _write_events(path: str, unit: str) -> None:
    tbl = pa.Table.from_pandas(_events_frame(), preserve_index=False)
    ts_type = pa.timestamp(unit)
    tbl = tbl.set_column(
        tbl.schema.get_field_index("ts"),
        "ts",
        tbl.column("ts").cast(ts_type),
    )
    pq.write_table(tbl, f"{path}/events.parquet")


def test_micros_events_leave_session_conf_untouched(spark, tmp_path):
    """The common micros path must not set the legacy nanos conf —
    a table loader must not globally change unrelated parquet reads."""
    d = tmp_path / "micros"
    d.mkdir()
    _write_events(str(d), "us")
    before = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
    assert load_events(spark, str(d)).count() == 4
    after = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
    assert before == after


def test_nanos_events_record_conf_residue(spark, tmp_path):
    """When the footer physically carries TIMESTAMP(NANOS) the conf has
    to stay set for the lazy scan's lifetime — but the residue must be
    TRACKED and queryable, not a silent global side effect."""
    d = tmp_path / "nanos"
    d.mkdir()
    _write_events(str(d), "ns")
    df = load_events(spark, str(d))
    assert df.count() == 4
    assert dict(df.dtypes)["ts"].startswith("timestamp")
    residues = session_conf_residues()
    assert "spark.sql.legacy.parquet.nanosAsLong" in residues
    assert "TIMESTAMP(NANOS)" in residues[
        "spark.sql.legacy.parquet.nanosAsLong"
    ]


SF_SMALL = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_join_exchange(spark):
    """j10_bucketed_join's contract: bucketBy(8, key) on both tables
    makes the merge join co-located — zero Exchange on either join
    input; the plan's single Exchange is the 5-group final agg."""
    from mwa_uvdata_pipeline_spark.plans import load_all

    df = load_all()["j10_bucketed_join"].spark(spark, SF_SMALL)
    s = df._jdf.queryExecution().executedPlan().toString()
    assert s.count("SortMergeJoin") == 1
    assert s.count("Bucketed: true") == 2  # both scans read bucketed
    assert s.count("Exchange") == 1  # final agg only, none at the join


def test_bucketed_pair_reuses_session_tables(spark):
    """Second construction must reuse the session catalog tables, not
    rewrite the bucketed layout per run (bench builds entries 4x)."""
    from mwa_uvdata_pipeline_spark.plans.tpch import _bucketed_pair

    o1, l1 = _bucketed_pair(spark, SF_SMALL)
    tabs = {t.name for t in spark.catalog.listTables()}
    o2, l2 = _bucketed_pair(spark, SF_SMALL)
    assert {t.name for t in spark.catalog.listTables()} == tabs
    assert o1.count() == o2.count()
