"""CLI (python -m parquet_merger_spark): the reference's GUI workflow
(scan -> plan -> merge) driven headless, in-process via main(argv).
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

from parquet_merger_spark.__main__ import main


@pytest.fixture()
def tree(tmp_path):
    for day in ("day1", "day2"):
        os.makedirs(tmp_path / day)
    pd.DataFrame({"a": [1, 2], "b": ["x", "y"]}).to_parquet(
        tmp_path / "day1" / "metrics.parquet"
    )
    pd.DataFrame({"a": [3], "b": ["z"], "extra": [1.5]}).to_parquet(
        tmp_path / "day2" / "metrics.parquet"
    )
    pd.DataFrame({"c": [9.0]}).to_parquet(tmp_path / "day1" / "solo.parquet")
    return str(tmp_path)


def test_cli_scan_lists_files(tree, capsys):
    assert main(["scan", tree]) == 0
    out = capsys.readouterr().out
    assert "day1/metrics.parquet" in out and "day2/metrics.parquet" in out
    assert "solo.parquet" in out


def test_cli_plan_shows_batches_and_mismatch(tree, capsys, spark):
    assert main(["plan", tree, "--cpus", "2"]) == 0
    out = capsys.readouterr().out
    assert "metrics: 2 files" in out
    assert "schema-mismatch" in out  # day2 has the extra column
    assert "solo" not in out  # singleton, not batched


def test_cli_merge_end_to_end(tree, tmp_path_factory, capsys, spark):
    out_dir = str(tmp_path_factory.mktemp("cli_out"))
    rc = main(["merge", tree, "--out", out_dir, "--csv", "--cpus", "2"])
    assert rc == 0
    merged = pd.read_parquet(os.path.join(out_dir, "merged", "metrics.parquet"))
    # intersection semantics: 'extra' dropped, all 3 rows present
    assert sorted(merged.columns) == ["a", "b"]
    assert sorted(merged["a"]) == [1, 2, 3]
    assert os.path.exists(os.path.join(out_dir, "merged", "metrics.csv"))
    assert "OK   metrics: 3 rows" in capsys.readouterr().out


def test_cli_merge_reports_batch_failure_nonzero_exit(tree, tmp_path_factory, spark):
    # corrupt one member of a same-named pair -> that batch fails, exit 1
    bad_dir = os.path.join(tree, "day3")
    os.makedirs(bad_dir)
    with open(os.path.join(bad_dir, "metrics.parquet"), "wb") as fh:
        fh.write(b"not a parquet file")
    out_dir = str(tmp_path_factory.mktemp("cli_out_bad"))
    rc = main(["merge", tree, "--out", out_dir, "--cpus", "2"])
    assert rc == 1
