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
