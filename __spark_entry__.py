"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query at sf0.001; ``queries`` exposes every
implemented operator from SURVEY.md §2 (plus the north-star dedup /
similarity / text / streaming-twin operators); ``oracle_sql`` gives the
DuckDB twin for each SQL-expressible entry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mwa_uvdata_pipeline_spark.plans import load_all

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    plans = load_all()
    return plans["q1_pricing_summary"].spark(spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: plan.spark for name, plan in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins; entries without SQL get the weaker rows-only check."""
    return {
        name: plan.sql for name, plan in load_all().items() if plan.sql is not None
    }
