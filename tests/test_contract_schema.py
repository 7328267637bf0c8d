"""Every contract output column must be atomic (no Array/Map/Struct).

The driver's correctness canonicalizer sorts result cells with pandas
``sort_values``, which crashes on unhashable container cells — that cost the
r04 ``map_functions`` row.  The local oracle canon (``oracle.py``) stringifies
cells and cannot catch that crash class, so a new key returning an
``array<...>`` column would pass the local sweep and fail at the driver.
This pin makes the whole 211-key contract fail loudly instead.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"


def test_contract_output_columns_atomic(spark):
    from pyspark.sql.types import ArrayType, MapType, StructType

    from parquet_merger_spark.queries import QUERIES

    offenders: dict[str, list[str]] = {}
    for key, fn in QUERIES.items():
        schema = fn(spark, SF_SMOKE).schema
        bad = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if bad:
            offenders[key] = bad
    assert not offenders, f"non-atomic contract output columns: {offenders}"
