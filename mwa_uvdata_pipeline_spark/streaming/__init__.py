"""Structured Streaming over the events table (SURVEY.md §2.12).

The reference is strictly batch; these are the engine's streaming
capabilities per the north-star: windowed aggregations with watermarks,
late-data policy, stateful dedup, sessionization. Each streaming query
has a batch twin in ``plans.events`` that the driver oracle checks.
"""

from mwa_uvdata_pipeline_spark.streaming.events import (  # noqa: F401
    replay_events,
    stream_dedup,
    stream_session_windows,
    stream_tumbling_counts,
)
