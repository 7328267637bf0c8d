from parquet_merger_spark.functions.naming import (
    find_common_prefix,
    find_common_substring,
    find_common_suffix,
    generate_batch_name,
    sanitize_filename,
)
from parquet_merger_spark.functions.strings import (
    basename_col,
    sanitize_filename_col,
    stem_col,
)

__all__ = [
    "find_common_prefix",
    "find_common_suffix",
    "find_common_substring",
    "generate_batch_name",
    "sanitize_filename",
    "sanitize_filename_col",
    "basename_col",
    "stem_col",
]
