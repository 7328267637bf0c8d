"""ORC round-trip and partition-pruned-scan keys: the plan-shape claims
behind the oracles (the oracle certifies VALUES; these tests certify the
scan actually prunes / the format actually round-trips types)."""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parquet_merger_spark.queries import QUERIES  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"


def _formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_partition_pruned_scan_plan(spark):
    """The re-scan must carry the partition predicate as a PARTITION
    filter (directory-level pruning), not a row-level PushedFilter: at
    100 TB this is what keeps the scan to one partition's share."""
    df = QUERIES["partition_pruned_scan"](spark, SF_DIR)
    plan = _formatted_plan(df)
    part_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert part_lines, "scan node must expose PartitionFilters"
    assert any("purchase" in ln for ln in part_lines), (
        "the event_type = purchase predicate must prune at partition level: "
        + "\n".join(part_lines)
    )
    row = df.collect()[0]
    assert row.event_type == "purchase" and row.n_events > 0


def test_orc_roundtrip_schema_and_types(spark):
    """ORC must round-trip the exact Spark types (long/string/double) —
    a lossy type mapping would still hash-match on lucky values."""
    df = QUERIES["orc_roundtrip"](spark, SF_DIR)
    assert dict(df.dtypes) == {
        "o_orderkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "order_epoch": "bigint",
    }
    assert df.count() == df.select("o_orderkey").distinct().count()
