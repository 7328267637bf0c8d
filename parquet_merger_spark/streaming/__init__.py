from parquet_merger_spark.streaming.events import (
    sessionize_batch,
    windowed_event_counts_batch,
    windowed_event_counts_stream,
)

__all__ = [
    "windowed_event_counts_stream",
    "windowed_event_counts_batch",
    "sessionize_batch",
]
