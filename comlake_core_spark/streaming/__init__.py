from comlake_core_spark.streaming.windows import (
    read_events_stream,
    sessionize,
    windowed_agg,
)

__all__ = ["read_events_stream", "sessionize", "windowed_agg"]
