"""Engine operators (SURVEY.md §2)."""

from mwa_uvdata_pipeline_spark.operators.select import SelectOptions, apply_select  # noqa: F401
from mwa_uvdata_pipeline_spark.operators.diff import time_diff  # noqa: F401
from mwa_uvdata_pipeline_spark.operators.ins import incoherent_noise_spectrum, zscore  # noqa: F401
from mwa_uvdata_pipeline_spark.operators.matchfilter import MatchFilterConfig, match_filter  # noqa: F401
