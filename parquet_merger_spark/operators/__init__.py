from parquet_merger_spark.operators.merge import (
    BatchResult,
    merge_batches,
    merged_df,
    write_parquet,
)

__all__ = ["merged_df", "merge_batches", "write_parquet", "BatchResult"]
