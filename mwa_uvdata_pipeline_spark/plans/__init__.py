"""Query-plan registry: every entry is one operator family from
SURVEY.md §2 expressed over the driver test tables, with a DuckDB
oracle twin where SQL-expressible.

``PLANS`` maps name → Plan(spark_fn, oracle_sql, bench flag).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Plan:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    sql: str | None = None
    bench: bool = False
    doc: str = ""


PLANS: dict[str, Plan] = {}


def register(name: str, sql: str | None = None, bench: bool = False, doc: str = ""):
    """Decorator registering a (spark_fn, oracle_sql) pair."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        PLANS[name] = Plan(name=name, spark=fn, sql=sql, bench=bench, doc=doc or (fn.__doc__ or ""))
        return fn

    return wrap


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load events with ``ts`` tolerant of parquet timestamp drift.

    The driver has shipped events.parquet both as TIMESTAMP(NANOS)
    (which Spark's vectorized reader rejects — read nanos as long and
    truncate to micros, exactly DuckDB's nanos→micros cast) and as
    plain micros (which Spark 4 reads as TIMESTAMP_NTZ). Plans must
    work over either, so epoch arithmetic goes through ``epoch_us``.
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes)["ts"] == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def epoch_us(df: DataFrame, colname: str = "ts"):
    """NTZ-safe epoch microseconds for a timestamp column.

    ``F.unix_micros`` only accepts TIMESTAMP (with local time zone);
    the test tables carry TIMESTAMP_NTZ, where the naive wall time IS
    the UTC instant (DuckDB's ``epoch_us`` convention). The NTZ path
    is a pure wall-clock difference from the NTZ epoch literal —
    genuinely session-tz independent (``to_utc_timestamp`` would first
    implicitly cast NTZ→LTZ through the session zone, which is only
    correct under a pinned UTC session).
    """
    from pyspark.sql import functions as F

    if dict(df.dtypes).get(colname) == "timestamp_ntz":
        return F.expr(
            f"timestampdiff(MICROSECOND, "
            f"TIMESTAMP_NTZ '1970-01-01 00:00:00', {colname})"
        )
    return F.unix_micros(F.col(colname))


def _last_verified_round() -> dict[str, int]:
    """name → latest round whose CORRECTNESS_r*.json has a green
    hash_match row for it (absent = never driver-verified)."""
    import json
    import re
    from pathlib import Path

    last: dict[str, int] = {}
    root = Path(__file__).resolve().parents[2]
    for path in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", path.stem)
        rnd = int(m.group(1)) if m else 0
        try:
            rows = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if isinstance(row, dict) and row.get("hash_match"):
                last[name] = max(last.get(name, 0), rnd)
    return last


def load_all() -> dict[str, Plan]:
    """Import every plan module (side effect: registry population).

    Returned order is STALEST-FIRST: entries the driver has never
    hash-verified, then by the round they were last verified
    (oldest first). The correctness harness checks a bounded prefix of
    the registry (round 1 stopped at 50 of 82), so this rotation keeps
    every operator under recent driver coverage across rounds — code
    edited since an entry's last check gets it re-verified soonest.
    """
    from mwa_uvdata_pipeline_spark.plans import (  # noqa: F401
        domain,
        events,
        relational,
        text,
        tpch,
    )

    last = _last_verified_round()
    ordered = sorted(PLANS, key=lambda n: (last.get(n, 0), n))
    return {name: PLANS[name] for name in ordered}
