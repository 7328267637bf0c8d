"""Footer-statistics catalog + file-skipping scan (sources/stats.py)."""

from __future__ import annotations

import glob
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parquet_merger_spark.sources.stats import (  # noqa: E402
    parquet_footer_stats,
    prune_files,
    skipping_scan,
)

SF_DIR = "/root/testdata/sf0.01"


def _write_ranged(spark, tmp_path, n_files=8):
    o = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet")).select(
        "o_orderkey", "o_totalprice"
    )
    out = str(tmp_path / "ranged")
    (
        o.repartitionByRange(n_files, "o_orderkey")
        .sortWithinPartitions("o_orderkey")
        .write.mode("overwrite")
        .parquet(out)
    )
    return sorted(glob.glob(out + "/*.parquet"))


def test_footer_stats_match_data(spark, tmp_path):
    paths = _write_ranged(spark, tmp_path)
    stats = {r["file"]: r for r in parquet_footer_stats(spark, paths, "o_orderkey").collect()}
    assert set(stats) == set(paths)
    for p in paths:
        pdf = pq.read_table(p, columns=["o_orderkey"]).to_pandas()
        r = stats[p]
        assert r["n_rows"] == len(pdf)
        assert r["n_nulls"] == int(pdf["o_orderkey"].isna().sum())
        assert r["vmin"] == pdf["o_orderkey"].min()
        assert r["vmax"] == pdf["o_orderkey"].max()


def test_skipping_scan_prunes_and_is_exact(spark, tmp_path):
    paths = _write_ranged(spark, tmp_path)
    df, kept = skipping_scan(spark, paths, "o_orderkey", 100, 1500)
    assert 0 < len(kept) < len(paths)  # actually pruned something
    full = (
        spark.read.parquet(*paths)
        .filter(F.col("o_orderkey").between(100, 1500))
        .collect()
    )
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, full))


def test_skipping_scan_empty_range(spark, tmp_path):
    paths = _write_ranged(spark, tmp_path)
    df, kept = skipping_scan(spark, paths, "o_orderkey", -500, -1)
    assert kept == [] and df.count() == 0


def test_file_without_stats_is_conservatively_kept(spark, tmp_path):
    # a writer that omits column statistics must not be pruned away
    p_stats = str(tmp_path / "with_stats.parquet")
    p_nostats = str(tmp_path / "no_stats.parquet")
    pq.write_table(pa.table({"k": [1, 2, 3]}), p_stats)
    pq.write_table(pa.table({"k": [100, 200]}), p_nostats, write_statistics=False)
    stats = parquet_footer_stats(spark, [p_stats, p_nostats], "k")
    rows = {r["file"]: r for r in stats.collect()}
    assert rows[p_nostats]["vmin"] is None and rows[p_nostats]["vmax"] is None
    # range [150, 250] overlaps only the stats-less file's actual data
    kept = prune_files(stats, 150, 250)
    assert p_nostats in kept and p_stats not in kept
    df, kept2 = skipping_scan(spark, [p_stats, p_nostats], "k", 150, 250)
    assert sorted(r["k"] for r in df.collect()) == [200]
