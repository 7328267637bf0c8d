from parquet_merger_spark.plans.schema import (
    check_schema_mismatch,
    find_common_columns,
    schemas_compatible,
)
from parquet_merger_spark.plans.planner import (
    MergePlan,
    SelectionSet,
    plan_batch,
    remove_completed,
    smart_batch,
)
from parquet_merger_spark.plans.audit import assert_scalable, plan_digest

__all__ = [
    "schemas_compatible",
    "find_common_columns",
    "check_schema_mismatch",
    "MergePlan",
    "SelectionSet",
    "assert_scalable",
    "plan_batch",
    "plan_digest",
    "remove_completed",
    "smart_batch",
]
