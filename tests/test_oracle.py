"""Differential tests: every oracle-backed query in the driver contract,
Spark vs DuckDB at sf0.01 — replicating the driver's compare (row count +
schema + order-insensitive value comparison) so CORRECTNESS regressions are
caught locally before a round ends.

Comparison is EXACT (string equality after canonicalization) — the driver
hashes values, so near-equality is not good enough.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parquet_merger_spark.oracle import canon_rows, register_views  # noqa: E402
from parquet_merger_spark.queries import ORACLE_SQL, QUERIES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    register_views(con, SF_DIR)
    yield con
    con.close()


def _canon(df: pd.DataFrame) -> list[tuple]:
    # shared with tools/correctness_local.py via parquet_merger_spark.oracle
    return canon_rows(df)


ORACLE_KEYS = sorted(ORACLE_SQL)


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_oracle_match(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR).toPandas()
    ddf = duck.execute(ORACLE_SQL[name]).df()

    assert sorted(sdf.columns) == sorted(ddf.columns), (
        f"{name}: column mismatch spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}"
    )
    assert len(sdf) == len(ddf), f"{name}: row count {len(sdf)} vs {len(ddf)}"

    s_rows, d_rows = _canon(sdf), _canon(ddf)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} differing rows; first 3: {mismatches[:3]}"
    )


def test_rows_only_queries_run_and_are_deterministic(spark):
    """Queries without an oracle must still run and return identical rows
    across two executions (the driver's weaker check)."""
    for name in sorted(set(QUERIES) - set(ORACLE_SQL)):
        df1 = QUERIES[name](spark, SF_DIR).toPandas()
        df2 = QUERIES[name](spark, SF_DIR).toPandas()
        assert _canon(df1) == _canon(df2), f"{name}: nondeterministic result"
        assert len(df1.columns) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_partitioning_invariance_battery(spark):
    """Determinism under re-partitioning, asserted across the contract:
    every 4th oracle query (by sorted key — a rotating quarter of the
    surface) must return identical rows at sf0.001 with shuffle
    parallelism forced to 3.  Catches any operator whose output order
    dependence leaks into VALUES (window ties, collect_list without
    sort, first() without ordering)."""
    sf = "/root/testdata/sf0.001"
    keys = sorted(ORACLE_SQL)[::4]
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        baseline = {k: _canon(QUERIES[k](spark, sf).toPandas()) for k in keys}
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        for k in keys:
            again = _canon(QUERIES[k](spark, sf).toPandas())
            assert again == baseline[k], f"{k}: result depends on partitioning"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
