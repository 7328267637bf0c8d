"""Catalog + planner tests (SURVEY §2.1 S1-S3, §2.5 A2, EP2)."""

import pandas as pd

from parquet_merger_spark.plans.planner import plan_batch, smart_batch
from parquet_merger_spark.sources.catalog import (
    file_catalog_df,
    probe_schema,
    scan_folders,
)


def _write(path, cols):
    path.parent.mkdir(parents=True, exist_ok=True)
    pd.DataFrame(cols).to_parquet(path, index=False)
    return str(path)


def _name_groups_tree(tmp_path):
    """FIXTURES §B `name_groups`: 3× part_001 in different dirs,
    2× daily_2024, 1 orphan."""
    base = {"key": pd.Series(range(10), dtype="int64")}
    for sub in ["d1", "d2", "d3"]:
        _write(tmp_path / sub / "part_001.parquet", base)
    for sub in ["d1", "d2"]:
        _write(tmp_path / sub / "daily_2024.parquet", base)
    _write(tmp_path / "d3" / "orphan.parquet", base)
    (tmp_path / "d3" / "not_parquet.txt").write_text("ignore me")
    return tmp_path


def test_scan_folders_recursive_filtered_sorted(tmp_path):
    root = _name_groups_tree(tmp_path)
    entries = scan_folders([str(root)])
    assert len(entries) == 6
    assert [e.display_path for e in entries] == sorted(e.display_path for e in entries)
    assert all(e.full_path.endswith(".parquet") for e in entries)


def test_scan_folders_dedups_registered_folders(tmp_path):
    root = _name_groups_tree(tmp_path)
    once = scan_folders([str(root)])
    twice = scan_folders([str(root), str(root)])
    assert len(once) == len(twice)


def test_probe_schema_footer_only(spark, tmp_path):
    p = _write(tmp_path / "t.parquet", {"a": pd.Series([1], dtype="int64")})
    schema = probe_schema(spark, p)
    assert [f.name for f in schema.fields] == ["a"]
    assert probe_schema(spark, str(tmp_path / "missing.parquet")) is None


def test_file_catalog_df(spark, tmp_path):
    root = _name_groups_tree(tmp_path)
    df = file_catalog_df(spark, [str(root)])
    rows = {(r.file_name, r.file_stem) for r in df.collect()}
    assert ("part_001.parquet", "part_001") in rows
    assert df.count() == 6


def test_smart_batch_group_by_filename_having_count_gt_1(spark, tmp_path):
    root = _name_groups_tree(tmp_path)
    plans, singletons = smart_batch(spark, scan_folders([str(root)]))
    assert [p.name for p in plans] == ["daily_2024", "part_001"]
    assert {len(p.paths) for p in plans} == {2, 3}
    assert singletons == 1
    assert all(not p.schema_mismatch for p in plans)


def test_plan_batch_manual(spark, tmp_path):
    a = _write(tmp_path / "part_001.parquet", {"k": pd.Series([1], dtype="int64")})
    b = _write(tmp_path / "part_002.parquet", {"k": pd.Series([2], dtype="int64")})
    plan = plan_batch(spark, [b, a], batch_number=5)
    assert plan.paths == sorted([a, b])
    assert plan.name == "part"  # common prefix 'part_00' trimmed
    assert not plan.schema_mismatch


def test_plan_batch_flags_mismatch(spark, tmp_path):
    a = _write(tmp_path / "x_1.parquet", {"k": pd.Series([1], dtype="int64")})
    b = _write(tmp_path / "x_2.parquet", {"k": pd.Series([2], dtype="int32")})
    plan = plan_batch(spark, [a, b])
    assert plan.schema_mismatch


def test_selection_set_filtered_semantics():
    """O3: select/deselect-all act only on the VISIBLE (filtered) subset;
    hidden selections survive (reference src/main.rs:1046-1058)."""
    from parquet_merger_spark.plans.planner import SelectionSet

    s = SelectionSet()
    s.toggle(0)
    s.toggle(7)          # will be hidden by the filter below
    s.select_all([1, 2, 3])
    assert s.selected == {0, 1, 2, 3, 7}
    s.deselect_all([0, 1, 2, 3])  # 7 not visible -> stays selected
    assert s.selected == {7}
    s.toggle(7)
    assert s.selected == set()
    s.select_all([4, 5])
    s.clear()
    assert s.selected == set()


def test_remove_completed_keeps_failures():
    """R3: successful batches leave the plan list, failures stay."""
    from parquet_merger_spark.operators.merge import BatchResult
    from parquet_merger_spark.plans.planner import MergePlan, remove_completed

    plans = [MergePlan(name=n) for n in ("a", "b", "c")]
    results = [
        BatchResult(name="a", output_path="/x/a", rows=10),
        BatchResult(name="b", output_path=None, rows=None, error="boom"),
        BatchResult(name="c", output_path="/x/c", rows=5),
    ]
    remaining = remove_completed(plans, results)
    assert [p.name for p in remaining] == ["b"]
