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


def test_bounded_jaccard_subset_and_recall(spark):
    """The candidates-bounded exact-Jaccard key (the 100 TB arm) against
    the full-corpus tier: every bounded pair must appear in the full
    output WITH THE SAME jaccard value (the bounding can only ever drop
    pairs, never alter a value), and LSH recall on this fixture must
    meet the b=6/r=2 design bound (>0.99 expected; assert >=0.95 to
    absorb fixture drift)."""
    full = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in QUERIES["dedup_ngram_jaccard"](spark, SF_DIR).collect()
    }
    bounded = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in QUERIES["dedup_ngram_jaccard_bounded"](spark, SF_DIR).collect()
    }
    assert bounded, "bounded tier found no pairs at all"
    for pair, j in bounded.items():
        assert pair in full and full[pair] == j, pair
    assert len(bounded) / len(full) >= 0.95


def test_semdedup_tier_cutoff():
    """The documented size cutoff is a pure function: exact at or under
    exact_max_rows, ann above, None disables switching."""
    from parquet_merger_spark.operators.dedup import semdedup_tier

    assert semdedup_tier(100_000) == "exact"
    assert semdedup_tier(100_001) == "ann"
    assert semdedup_tier(10**12, None) == "exact"
    assert semdedup_tier(500, 100) == "ann"


def test_semdedup_auto_ann_arm_contract_and_recall(spark):
    """Force the auto cutoff below the fixture size so the ANN arm
    (IVF semantic blocks) runs: the per-row contract must hold (one row
    per vector, survivor iff cluster_id == own id) and duplicate recall
    vs the exact tier must beat the random-block floor by a wide margin
    (semantic blocks put near-dups in the same bucket by construction —
    the test_recall.py vec_id%2 baseline only manages ~0.3)."""
    from parquet_merger_spark.operators.dedup import semdedup
    from parquet_merger_spark.queries import _t

    e = _t(spark, SF_DIR, "embeddings")
    n = e.count()
    exact = semdedup(e, threshold=0.4, k=5, exact_max_rows=None).collect()
    ann = semdedup(e, threshold=0.4, k=5, exact_max_rows=n - 1).collect()
    assert len(ann) == n == len(exact)
    assert all((r.cluster_id == r.vec_id) == r.is_survivor for r in ann)
    exact_dups = {r.vec_id for r in exact if not r.is_survivor}
    ann_dups = {r.vec_id for r in ann if not r.is_survivor}
    assert exact_dups, "fixture must contain semantic duplicates"
    recall = len(ann_dups & exact_dups) / len(exact_dups)
    assert recall >= 0.60, f"semantic-block duplicate recall {recall:.3f}"
    # over-merge side: flagged-but-not-exact-dup rows stay a minority
    assert len(ann_dups - exact_dups) <= max(3, len(exact_dups))


def test_assign_buckets_gemm_path_matches_expression_path(spark, monkeypatch):
    """The Arrow-GEMM nearest-centroid path (chosen for bigger models)
    must produce EXACTLY the literal-expression path's assignments —
    same quantized-grid cosine, same (sim desc, cid asc) tie-break —
    checked for n_assign 1 and 2 on the fixture."""
    from parquet_merger_spark.operators import simsearch as ss
    from parquet_merger_spark.queries import _t

    e = _t(spark, SF_DIR, "embeddings")
    cen = ss.build_ivf_centroids(e, nlist=16)
    for n_assign in (1, 2):
        expr = {
            (r["vec_id"], r["bucket"])
            for r in ss.assign_buckets(e, cen, n_assign=n_assign).collect()
        }
        monkeypatch.setattr(ss, "_VECTORIZED_ASSIGN_MIN_ELEMS", 0)
        gemm = {
            (r["vec_id"], r["bucket"])
            for r in ss.assign_buckets(e, cen, n_assign=n_assign).collect()
        }
        monkeypatch.undo()
        assert gemm == expr and len(expr) == e.count() * n_assign


def test_embedding_centroid_drift_magnitude_sane(spark):
    """Unit-ish embeddings drawn from the same distribution: half-centroid
    drift must be well under 1 (the pre-fix bug reported ~1159)."""
    for r in QUERIES["embedding_centroid_drift"](spark, SF_DIR).collect():
        assert 0.0 < r["centroid_l2_drift"] < 1.0


def _degenerate_embeddings(spark):
    """4 valid rows + a NULL vector, a zero vector, and a mis-sized
    vector — the rows the EXPRESSION paths tolerate (NULL cosine ->
    coalesced below any real score / filtered) and the r07 numpy GEMM
    rewrites initially crashed on (bare np.stack raises on None and
    ragged input)."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.9, 0.1, 0.0]),
        (4, None),
        (5, [0.0, 0.0, 0.0, 0.0]),
        (6, [1.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_assign_buckets_gemm_tolerates_degenerate_vectors(spark, monkeypatch):
    """The mid-size Arrow-GEMM assignment must not crash on NULL / zero /
    mis-sized vectors AND must assign them the exact buckets the literal
    expression path does (all sims -2.0 -> smallest centroid ids)."""
    from parquet_merger_spark.operators import simsearch as ss

    df = _degenerate_embeddings(spark)
    cen = ss.build_ivf_centroids(df.filter("vec_id < 4"), nlist=2)
    for n_assign in (1, 2):
        expr = {
            (r["vec_id"], r["bucket"])
            for r in ss.assign_buckets(df, cen, n_assign=n_assign).collect()
        }
        monkeypatch.setattr(ss, "_VECTORIZED_ASSIGN_MIN_ELEMS", 0)
        gemm = {
            (r["vec_id"], r["bucket"])
            for r in ss.assign_buckets(df, cen, n_assign=n_assign).collect()
        }
        monkeypatch.undo()
        assert gemm == expr and len(gemm) == 7 * n_assign


def test_knn_graph_tolerates_degenerate_vectors(spark):
    """Both knn_graph GEMM tiers (exact tiled, within-block) must not
    crash on degenerate vectors; degenerate rows emit no pairs and never
    appear as neighbors (NaN cosine = the expression path's NULL), and
    the valid rows' neighbor sets are unaffected."""
    from parquet_merger_spark.operators.simsearch import knn_graph

    df = _degenerate_embeddings(spark)
    for kwargs in ({"n_blocks": 2}, {"block_col": "blk"}):
        d = df.withColumn("blk", F.lit(0)) if "block_col" in kwargs else df
        got = knn_graph(d, k=2, **kwargs).collect()
        ids_out = {r["id"] for r in got}
        neighbors = {r["neighbor_id"] for r in got}
        assert ids_out == {0, 1, 2, 3}, got
        assert neighbors <= {0, 1, 2, 3}, got
        # nearest neighbor of 0 is 1 (cos ~0.994) in both tiers
        top = {r["id"]: r["neighbor_id"] for r in got if r["rank"] == 1}
        assert top[0] == 1 and top[1] == 0 and top[2] == 3 and top[3] == 2


def test_cosine_near_dup_tolerates_degenerate_vectors(spark):
    """cosine_near_dup_pairs' tiled GEMM: degenerate rows produce no
    candidate pairs instead of killing the task."""
    from parquet_merger_spark.operators.simsearch import cosine_near_dup_pairs

    df = _degenerate_embeddings(spark)
    got = cosine_near_dup_pairs(df, threshold=0.9, n_blocks=2).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in got}
    assert pairs == {(0, 1), (2, 3)}, got


def test_stack_quantized_dim_inference_is_order_independent():
    """A corrupt mis-sized row arriving FIRST in an applyInPandas group
    (row order is shuffle-arrival order) must not poison the tile: dim
    is the modal valid length, so the valid rows stack intact and only
    the corrupt row gets q2=NaN."""
    import math

    import pandas as pd

    from parquet_merger_spark.operators.simsearch import (
        _infer_dim,
        _stack_quantized,
    )

    short_first = pd.Series([[1, 2], [1, 2, 3, 4], [5, 6, 7, 8], None])
    assert _infer_dim(short_first) == 4
    qm, q2 = _stack_quantized(short_first, pd.Series([5.0, 30.0, 174.0, None]))
    assert qm.shape == (4, 4)
    assert list(qm[1]) == [1, 2, 3, 4] and list(qm[2]) == [5, 6, 7, 8]
    assert list(qm[0]) == [0, 0, 0, 0] and math.isnan(q2[0])
    assert q2[1] == 30.0 and math.isnan(q2[3])
    # all-invalid and empty columns degrade to dim 0, never a crash
    assert _infer_dim(pd.Series([None, None])) == 0
    assert _infer_dim(pd.Series([], dtype=object)) == 0
