"""Unit tests for near-dup cluster resolution (connected components)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parquet_merger_spark.operators.dedup import (  # noqa: E402
    dup_clusters,
    near_dedup_survivors,
)


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "id_a long, id_b long")


def test_chain_collapses_to_one_cluster(spark):
    """1-2, 2-3, 3-4 is a diameter-3 chain: propagation must carry the min
    label across multiple rounds, not just one hop."""
    clusters = dup_clusters(_pairs(spark, [(1, 2), (2, 3), (3, 4)]))
    got = {(r.doc_id, r.cluster_id) for r in clusters.collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1)}


def test_separate_components_keep_separate_ids(spark):
    clusters = dup_clusters(_pairs(spark, [(1, 2), (10, 11), (11, 12)]))
    got = {(r.doc_id, r.cluster_id) for r in clusters.collect()}
    assert got == {(1, 1), (2, 1), (10, 10), (11, 10), (12, 10)}


def test_survivors_keep_canonical_and_untouched(spark):
    docs = spark.createDataFrame(
        [(i, f"doc{i}") for i in range(1, 8)], "doc_id long, text string"
    )
    pairs = _pairs(spark, [(2, 3), (3, 4), (6, 7)])
    kept = sorted(
        r.doc_id for r in near_dedup_survivors(docs, pairs).select("doc_id").collect()
    )
    # clusters {2,3,4} -> keep 2; {6,7} -> keep 6; 1 and 5 untouched
    assert kept == [1, 2, 5, 6]
