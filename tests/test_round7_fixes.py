"""Round-7 advice fixes, pinned.

The r06 advisor proved that an oracle-pass can certify nothing when the
Spark query and the DuckDB SQL mirror the SAME wrong expression
(`embedding_centroid_drift` divided counts by 64 and the drift
denominator by 4096 on both sides).  These tests pin the fixed keys
against a THIRD implementation (numpy over the raw parquet), so a
shared-formula bug can never again hide behind a green hash compare.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from parquet_merger_spark.queries import QUERIES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


def test_embedding_centroid_drift_matches_numpy(spark):
    """n_even/n_odd are TRUE per-half vector counts and the drift equals
    the directly-computed L2 distance between the quantized half
    centroids — an independent float implementation, no shared integer
    folds with the query under test."""
    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(SF_DIR, "embeddings.parquet"))
    vec_id = np.asarray(t.column("vec_id"))
    label = np.asarray(t.column("label"))
    emb = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    # mirror the row-level quantization contract (1e-4 grid), then plain
    # float centroids — everything downstream is independent arithmetic
    q = np.round(emb.astype(np.float32).astype(np.float64) * 10000.0)

    rows = QUERIES["embedding_centroid_drift"](spark, SF_DIR).collect()
    assert rows
    seen = set()
    for r in rows:
        lab = r["label"]
        seen.add(lab)
        m = label == lab
        even = q[m & (vec_id % 2 == 0)]
        odd = q[m & (vec_id % 2 == 1)]
        assert r["n_even"] == even.shape[0]
        assert r["n_odd"] == odd.shape[0]
        assert r["n_even"] > 0 and r["n_odd"] > 0
        drift = float(
            np.sqrt(((even.mean(axis=0) - odd.mean(axis=0)) ** 2).sum())
        ) / 10000.0
        assert abs(r["centroid_l2_drift"] - drift) < 1e-5, (lab, drift)
    assert len(seen) == len(rows)


def test_skewness_decimal38_ceiling_documented(spark):
    """The decimal(38,0) bound |A| <= 6*n^3*cmax^3 claimed in
    q_value_skewness_by_type's docstring: verify the formula bounds the
    actual |A| on the fixture, and that the documented per-type ceiling
    (2.5e7 rows at cmax=1e5 cents) respects 10^38 with margin."""
    from parquet_merger_spark.queries import _events

    e = _events(spark, SF_DIR)
    c = F.round(F.col("value") * 100, 0).cast("long")
    rows = (
        e.select("event_type", c.alias("c"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("c").alias("s1"),
            F.sum(F.col("c") * F.col("c")).alias("s2"),
            F.sum(F.col("c").cast("decimal(38,0)") * F.col("c") * F.col("c")).alias("s3"),
            F.max(F.abs(F.col("c"))).alias("cmax"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        n, s1, s2, s3 = int(r["n"]), int(r["s1"]), int(r["s2"]), int(r["s3"])
        a = n * n * s3 - 3 * n * s1 * s2 + 2 * s1**3
        bound = 6 * n**3 * int(r["cmax"]) ** 3
        assert abs(a) <= bound
        assert bound < 10**38  # fixture well inside the exactness regime
    # the documented ceiling itself: 2.5e7 rows/type at $1000 values
    assert 6 * (25_000_000**3) * (100_000**3) < 10**38


def test_embedding_centroid_drift_magnitude_sane(spark):
    """Unit-ish embeddings drawn from the same distribution: half-centroid
    drift must be well under 1 (the pre-fix bug reported ~1159)."""
    for r in QUERIES["embedding_centroid_drift"](spark, SF_DIR).collect():
        assert 0.0 < r["centroid_l2_drift"] < 1.0
