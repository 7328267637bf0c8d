from parquet_merger_spark.streaming.events import (
    read_near_dedup_survivors,
    sessionize_batch,
    stream_near_dedup_to_table,
    stream_upsert_to_table,
    windowed_event_counts_batch,
    windowed_event_counts_stream,
)

__all__ = [
    "read_near_dedup_survivors",
    "sessionize_batch",
    "stream_near_dedup_to_table",
    "stream_upsert_to_table",
    "windowed_event_counts_batch",
    "windowed_event_counts_stream",
]
