"""Scalar function library (SURVEY.md §2.7)."""

from mwa_uvdata_pipeline_spark.functions.complexnum import (  # noqa: F401
    c_abs,
    c_add,
    c_conj,
    c_mul,
    c_scale,
    c_struct,
    c_sub,
)
from mwa_uvdata_pipeline_spark.functions.times import (  # noqa: F401
    gps_from_unix,
    jd_from_unix,
    time_representations,
    unix_from_gps,
)
