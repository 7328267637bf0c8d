from parquet_merger_spark.operators.merge import (
    BatchResult,
    merge_batches,
    merge_dataframes,
    merged_df,
    write_parquet,
)

__all__ = [
    "merged_df",
    "merge_dataframes",
    "merge_batches",
    "write_parquet",
    "BatchResult",
]
