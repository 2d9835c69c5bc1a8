"""Time-scale conversions (SURVEY.md §2.7 X6).

The reference displays every instant in four representations —
ISO-T, GPS seconds, Unix seconds, Julian Date (reference
utils.py:191-193, via astropy.time.Time). JD and Unix are pure
arithmetic; GPS needs the leap-second table, shipped here as a static
broadcast-joinable lookup derived from the public IERS bulletin (same
data astropy uses) — no UDF required.

MWA obsids are GPS-second timestamps (reference utils.py:82-87).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# (utc_unix_effective, cumulative TAI-UTC seconds) — public IERS data.
# GPS-UTC offset = (TAI-UTC) - 19 (GPS epoch 1980-01-06 had TAI-UTC=19).
_LEAP_SECONDS: list[tuple[int, int]] = [
    (315964800, 19),   # 1980-01-06 (GPS epoch)
    (362793600, 20),   # 1981-07-01
    (394329600, 21),   # 1982-07-01
    (425865600, 22),   # 1983-07-01
    (489024000, 23),   # 1985-07-01
    (567993600, 24),   # 1988-01-01
    (631152000, 25),   # 1990-01-01
    (662688000, 26),   # 1991-01-01
    (709948800, 27),   # 1992-07-01
    (741484800, 28),   # 1993-07-01
    (773020800, 29),   # 1994-07-01
    (820454400, 30),   # 1996-01-01
    (867715200, 31),   # 1997-07-01
    (915148800, 32),   # 1999-01-01
    (1136073600, 33),  # 2006-01-01
    (1230768000, 34),  # 2009-01-01
    (1341100800, 35),  # 2012-07-01
    (1435708800, 36),  # 2015-07-01
    (1483228800, 37),  # 2017-01-01
]

_UNIX_JD_EPOCH = 2440587.5
_GPS_EPOCH_UNIX = 315964800


def jd_from_unix(unix_sec: Column) -> Column:
    """Julian Date from Unix seconds — pure math, codegen-friendly."""
    return unix_sec / F.lit(86400.0) + F.lit(_UNIX_JD_EPOCH)


def unix_from_jd(jd: Column) -> Column:
    return (jd - F.lit(_UNIX_JD_EPOCH)) * F.lit(86400.0)


def _gps_offset_expr(unix_sec: Column) -> Column:
    """Cumulative leap seconds since GPS epoch as a CASE chain.

    19 entries → a constant-folded expression; cheaper than a join or a
    UDF and identical on every executor.
    """
    expr = F.lit(0)
    for boundary, tai_utc in _LEAP_SECONDS:
        expr = F.when(unix_sec >= F.lit(boundary), F.lit(tai_utc - 19)).otherwise(expr)
    return expr


def gps_from_unix(unix_sec: Column) -> Column:
    """GPS seconds = unix - gps_epoch + leap-seconds-since-1980."""
    return unix_sec - F.lit(_GPS_EPOCH_UNIX) + _gps_offset_expr(unix_sec).cast("double")


def unix_from_gps(gps_sec: Column) -> Column:
    """Inverse of gps_from_unix (leap offset looked up at the naive unix)."""
    naive_unix = gps_sec + F.lit(_GPS_EPOCH_UNIX)
    return naive_unix - _gps_offset_expr(naive_unix).cast("double")


def time_representations(df: DataFrame, ts_col: str) -> DataFrame:
    """display_time analog (reference utils.py:191-193): add isot, unix,
    jd, gps columns derived from a timestamp column."""
    unix = F.col(ts_col).cast("double")
    return (
        df.withColumn("isot", F.date_format(ts_col, "yyyy-MM-dd'T'HH:mm:ss.SSS"))
        .withColumn("unix", unix)
        .withColumn("jd", jd_from_unix(unix))
        .withColumn("gps", gps_from_unix(unix))
    )


def leap_second_dim(spark: SparkSession) -> DataFrame:
    """The leap-second table as a broadcastable dimension, for SQL users."""
    return spark.createDataFrame(
        [(u, t, t - 19) for u, t in _LEAP_SECONDS],
        "unix_effective long, tai_utc int, gps_utc int",
    )
