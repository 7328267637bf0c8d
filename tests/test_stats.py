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


def test_compaction_reduces_files_and_preserves_content(spark, tmp_path):
    from parquet_merger_spark.operators.compaction import compact_files, plan_compaction

    d = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text"
    )
    shattered = str(tmp_path / "shattered")
    d.repartition(16).write.mode("overwrite").parquet(shattered)
    paths = sorted(glob.glob(shattered + "/*.parquet"))
    assert len(paths) == 16
    total = sum(os.stat(p).st_size for p in paths)
    target = max(1, total // 3)
    assert plan_compaction(paths, target) in (3, 4)
    res = compact_files(spark, paths, str(tmp_path / "out"), target_bytes=target)
    assert res.n_output_files == plan_compaction(paths, target)
    back = spark.read.parquet(res.out_dir)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, d.collect()))


def test_compaction_size_calibration(spark, tmp_path):
    """size_tolerance: when inputs are overhead-dominated tiny files, the
    manifest-based file count overshoots (mean output far below target);
    the calibration pass re-slices the PASS-1 OUTPUT so the mean lands
    within tolerance of the byte target, and rows are preserved."""
    import pandas as pd

    from parquet_merger_spark.operators.compaction import compact_files

    import numpy as np

    shattered = tmp_path / "tiny"
    shattered.mkdir()
    # 200 small files whose per-file footer is a large FRACTION of the
    # file but small vs the target (the real compaction regime: targets
    # are MBs+, footers ~KB — a target below the footer size has no
    # fixed point and is a caller error, per the docstring)
    rng = np.random.default_rng(7)
    for i in range(200):
        pd.DataFrame(
            {
                "k": range(i * 300, i * 300 + 300),
                # incompressible payload so parquet can't shrink it away
                "s": ["%0100x" % int(x) for x in rng.integers(0, 2**63, 300)],
            }
        ).to_parquet(shattered / f"f{i:03d}.parquet", index=False)
    paths = sorted(str(p) for p in shattered.glob("*.parquet"))

    # ~6 calibrated files: 1/(2n) quantization floor ~8%, inside the 20%
    probe = compact_files(
        spark, paths, str(tmp_path / "probe"), target_bytes=10**9
    )  # one file: measures true compacted bytes
    target = max(1, probe.output_bytes // 6)

    res = compact_files(
        spark,
        paths,
        str(tmp_path / "out"),
        target_bytes=target,
        size_tolerance=0.2,
    )
    sizes = [
        os.stat(p).st_size for p in glob.glob(str(tmp_path / "out/*.parquet"))
    ]
    mean = sum(sizes) / len(sizes)
    assert abs(mean - target) <= 0.2 * target, (mean, target, res)
    assert res.n_passes == 2  # manifest overshoot forced the calibration
    back = spark.read.parquet(res.out_dir)
    assert back.count() == 200 * 300


def test_compaction_coalesce_mode_no_shuffle(spark, tmp_path):
    from parquet_merger_spark.operators.compaction import compact_files

    d = spark.range(10_000).withColumn("v", F.col("id") * 2)
    shattered = str(tmp_path / "shards")
    d.repartition(12).write.mode("overwrite").parquet(shattered)
    paths = sorted(glob.glob(shattered + "/*.parquet"))
    total = sum(os.stat(p).st_size for p in paths)
    # plan should contain no Exchange: coalesce merges co-located splits
    df = spark.read.parquet(*paths).coalesce(2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    res = compact_files(
        spark, paths, str(tmp_path / "out2"), target_bytes=max(1, total // 2),
        shuffle=False,
    )
    back = spark.read.parquet(res.out_dir)
    assert back.count() == 10_000
    assert res.n_output_files <= len(paths)


def test_cluster_write_produces_disjoint_envelopes(spark, tmp_path):
    from parquet_merger_spark.operators.compaction import cluster_write

    o = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet")).select(
        "o_orderkey", "o_totalprice"
    )
    paths = cluster_write(o, str(tmp_path / "clustered"), ["o_totalprice"], 6)
    assert len(paths) == 6
    envs = sorted(
        (r["vmin"], r["vmax"])
        for r in parquet_footer_stats(spark, paths, "o_totalprice").collect()
    )
    for (lo1, hi1), (lo2, hi2) in zip(envs, envs[1:]):
        assert hi1 <= lo2  # contiguous, non-overlapping key slices
    # a narrow range predicate prunes to few files
    lo = envs[2][0]
    df, kept = skipping_scan(spark, paths, "o_totalprice", lo, lo + 1.0)
    assert len(kept) <= 2


def test_zorder_write_prunes_on_every_dimension(spark, tmp_path):
    from parquet_merger_spark.operators.compaction import cluster_write, zorder_write

    o = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet")).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    ck_lo, ck_hi, pr_lo, pr_hi = o.agg(
        F.min("o_custkey"), F.max("o_custkey"),
        F.min("o_totalprice"), F.max("o_totalprice"),
    ).collect()[0]

    n_files = 16
    zpaths = zorder_write(
        o,
        str(tmp_path / "zorder"),
        {"o_custkey": (float(ck_lo), float(ck_hi)),
         "o_totalprice": (float(pr_lo), float(pr_hi))},
        n_files=n_files,
    )
    lpaths = cluster_write(o, str(tmp_path / "linear"), ["o_custkey"], n_files)

    # a narrow range on EACH dimension must prune z-ordered files
    ck_mid = (ck_lo + ck_hi) / 2
    pr_mid = (pr_lo + pr_hi) / 2
    _, z_by_ck = skipping_scan(spark, zpaths, "o_custkey", ck_mid, ck_mid + (ck_hi - ck_lo) * 0.05)
    _, z_by_pr = skipping_scan(spark, zpaths, "o_totalprice", pr_mid, pr_mid + (pr_hi - pr_lo) * 0.05)
    assert len(z_by_ck) < n_files
    assert len(z_by_pr) < n_files

    # linear clustering prunes its sort key but NOT the other dimension
    _, l_by_ck = skipping_scan(spark, lpaths, "o_custkey", ck_mid, ck_mid + (ck_hi - ck_lo) * 0.05)
    _, l_by_pr = skipping_scan(spark, lpaths, "o_totalprice", pr_mid, pr_mid + (pr_hi - pr_lo) * 0.05)
    assert len(l_by_ck) <= len(z_by_ck)       # linear is best on its own key
    assert len(l_by_pr) == n_files            # and useless on the second
    # and the z-ordered table still returns exactly the right rows
    df, _ = skipping_scan(spark, zpaths, "o_totalprice", pr_mid, pr_mid + (pr_hi - pr_lo) * 0.05)
    want = o.filter(F.col("o_totalprice").between(pr_mid, pr_mid + (pr_hi - pr_lo) * 0.05))
    assert sorted(r["o_orderkey"] for r in df.collect()) == sorted(
        r["o_orderkey"] for r in want.collect()
    )


def test_zorder_key_locality(spark):
    from parquet_merger_spark.operators.compaction import zorder_key

    df = spark.createDataFrame(
        [(x, y) for x in range(8) for y in range(8)], "x long, y long"
    )
    z = df.select("x", "y", zorder_key([F.col("x"), F.col("y")], bits=3).alias("z"))
    rows = {(r["x"], r["y"]): r["z"] for r in z.collect()}
    assert len(set(rows.values())) == 64          # bijective on the grid
    assert rows[(0, 0)] == 0 and rows[(7, 7)] == 63
    # interleave: x bits at even positions, y at odd
    assert rows[(1, 0)] == 1 and rows[(0, 1)] == 2 and rows[(1, 1)] == 3
