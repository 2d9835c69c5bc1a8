"""Scalar function goldens (SURVEY.md §2.7)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mwa_uvdata_pipeline_spark.functions.complexnum import c_abs, c_mul, c_struct, c_sub
from mwa_uvdata_pipeline_spark.functions.times import (
    gps_from_unix,
    jd_from_unix,
    unix_from_gps,
)


def test_gps_epoch_and_gw150914(spark):
    # anchors: GPS 0 = 1980-01-06T00:00Z; GW150914 published GPS time
    # 1126259462 = 2015-09-14T09:50:45Z (17 leap seconds after GPS epoch)
    df = spark.createDataFrame(
        [(315964800.0,), (1442224245.0,)], "unix double"
    ).select(gps_from_unix(F.col("unix")).alias("gps"))
    assert [r["gps"] for r in df.collect()] == [0.0, 1126259462.0]


def test_gps_roundtrip(spark):
    df = spark.createDataFrame(
        [(float(u),) for u in (315964800, 1000000000, 1442224245, 1704067200)],
        "unix double",
    ).select(
        "unix", unix_from_gps(gps_from_unix(F.col("unix"))).alias("back")
    )
    for r in df.collect():
        assert r["unix"] == r["back"]


def test_jd_epoch(spark):
    # 2000-01-01T12:00Z = JD 2451545.0 (J2000 epoch)
    df = spark.createDataFrame([(946728000.0,)], "unix double").select(
        jd_from_unix(F.col("unix")).alias("jd")
    )
    assert df.first()["jd"] == 2451545.0


def test_complex_algebra(spark):
    df = spark.createDataFrame([(3.0, 4.0, 1.0, -2.0)], "ar double, ai double, br double, bi double")
    a = c_struct(F.col("ar"), F.col("ai"))
    b = c_struct(F.col("br"), F.col("bi"))
    row = df.select(
        c_abs(a).alias("mag"),
        c_sub(a, b).alias("sub"),
        c_mul(a, b).alias("mul"),
    ).first()
    assert row["mag"] == 5.0
    assert (row["sub"]["re"], row["sub"]["im"]) == (2.0, 6.0)
    # (3+4i)(1-2i) = 3-6i+4i+8 = 11-2i
    assert (row["mul"]["re"], row["mul"]["im"]) == (11.0, -2.0)
