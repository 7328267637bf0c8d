"""Portable (cross-engine) near-dup twins: determinism, recall vs the
exact ground truth, and the arithmetic bounds that make the DuckDB oracle
bit-exact.

The production MinHash/SimHash keys are rows-only in the driver contract
(xxhash64 + mod-2^64 wrap has no cross-engine twin); the *_portable keys
certify the same banded-LSH / bit-vote algebra with engine-portable
arithmetic.  Oracle equality itself is covered by test_oracle.py's
parameterization; these tests pin the operator-level claims.
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parquet_merger_spark.operators.dedup import (  # noqa: E402
    PORTABLE_HASH_AC,
    PORTABLE_MOD,
    minhash_lsh_pairs_portable,
    ngram_jaccard_pairs,
    portable_vocab,
    simhash_signatures_portable,
)

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))


def test_portable_constants_bound_exact_int64():
    """Every intermediate stays < 2^61: a, c < 2^30 and the reduced gram
    id < p, so a*x + c < 2^30 * 2^30 + 2^30 — exact in int64 (and in
    DuckDB's BIGINT) with no overflow-wrap semantics in play."""
    for a, c in PORTABLE_HASH_AC:
        assert 0 < a < 2**30 and a % 2 == 1, "a must be odd and < 2^30"
        assert 0 <= c < 2**30
        assert a * (PORTABLE_MOD - 1) + c < 2**61


def test_portable_vocab_is_rank_permutation(documents):
    """term_id must equal row_number() over (code, term) exactly — the
    distributed two-phase rank must be indistinguishable from the
    single-task sort the oracle runs."""
    rows = portable_vocab(documents).collect()
    ids = sorted(r.term_id for r in rows)
    assert ids == list(range(1, len(rows) + 1)), "ids must be a 1..V permutation"
    # recompute the reference rank driver-side (vocab is model-sized here)
    def code(t: str) -> int:
        c1 = min(ord(t[0]), 127) if len(t) >= 1 else 0
        c2 = min(ord(t[1]), 127) if len(t) >= 2 else 0
        return c1 * 128 + c2

    ref = {
        t: i + 1
        for i, t in enumerate(
            sorted((r.term for r in rows), key=lambda t: (code(t), t))
        )
    }
    assert {r.term: r.term_id for r in rows} == ref


def test_portable_lsh_deterministic_under_repartition(documents):
    p1 = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs_portable(documents).collect()
    }
    p2 = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs_portable(documents.repartition(13)).collect()
    }
    assert p1 == p2
    assert all(a < b for a, b in p1)


def test_portable_lsh_recall_vs_exact_jaccard(documents):
    """b=6, r=2 puts the LSH threshold near 0.41; on J >= 0.8 true pairs
    the analytic recall is 1-(1-s^2)^6 > 0.99 — assert the documented
    0.90 floor against the exact oracle-verified ground truth."""
    exact = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(documents, threshold=0.8).collect()
    }
    assert exact, "ground truth must be non-empty for a meaningful recall"
    cand = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs_portable(documents).collect()
    }
    recall = len(cand & exact) / len(exact)
    assert recall >= 0.90, f"portable LSH recall {recall:.3f} below floor"


def test_portable_simhash_deterministic_and_16bit(documents):
    s1 = {r.doc_id: r.simhash for r in simhash_signatures_portable(documents).collect()}
    s2 = {
        r.doc_id: r.simhash
        for r in simhash_signatures_portable(documents.repartition(7)).collect()
    }
    assert s1 == s2
    assert len(s1) == documents.count()
    assert all(0 <= v < 2**16 for v in s1.values())


def test_portable_simhash_near_dups_collide(documents, spark):
    """Exact duplicates must get identical signatures (the operator's
    point): duplicate a doc under a new id and check the pair collides."""
    dup = documents.limit(1).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    both = documents.limit(1).select("doc_id", "text").unionByName(dup)
    sigs = [r.simhash for r in simhash_signatures_portable(both).collect()]
    assert len(sigs) == 2 and sigs[0] == sigs[1]


def test_new_r05b_operator_plans_pass_scale_review(spark):
    """Scale review for the r05-continuation keys (not headline keys, so
    the blanket headline review does not cover them).

    - portable twins: nested-loop / single-partition nodes are the
      vouched global-scalar family — the 1-row vocab-size broadcast and
      assign_row_ids' quantile-boundary + count-table offset frames
      (model-sized: <= n_buckets rows, never data) — and the candidate
      join itself stays a bucket EQUI-join (no cartesian).
    - orc_roundtrip: plain scan->sink->scan, no join at all.
    - partition_pruned_scan: one aggregate exchange over one partition's
      rows; the partition predicate prunes at directory level.
    """
    from parquet_merger_spark.plans.audit import assert_scalable
    from parquet_merger_spark.queries import QUERIES

    sf = SF_DIR
    for name in ("dedup_minhash_lsh_portable", "dedup_simhash_portable"):
        dig = assert_scalable(
            QUERIES[name](spark, sf),
            allow_nested_loop=True,
            allow_single_partition=True,
        )
        assert dig["cartesian_products"] == 0
    assert_scalable(QUERIES["orc_roundtrip"](spark, sf))
    assert_scalable(QUERIES["partition_pruned_scan"](spark, sf))


def test_portable_kmeans_deterministic_and_converging(spark):
    """Lloyd must be partition-invariant (pure integer/exactly-rounded
    arithmetic — no RNG, no FP accumulation order) and its total inertia
    must be non-increasing with more iterations (the Lloyd guarantee;
    a violation would mean the update step is not the true mean)."""
    from parquet_merger_spark.operators.simsearch import kmeans_lloyd_portable

    e = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    a2 = kmeans_lloyd_portable(e, k=8, iters=2).collect()
    b2 = kmeans_lloyd_portable(e.repartition(11), k=8, iters=2).collect()
    assert {tuple(r) for r in a2} == {tuple(r) for r in b2}
    inertia1 = sum(r.dist for r in kmeans_lloyd_portable(e, k=8, iters=1).collect())
    inertia2 = sum(r.dist for r in a2)
    assert inertia2 <= inertia1
    assert len({r.cid for r in a2}) == 8


def test_portable_ivf_exact_when_probing_all_buckets(spark):
    """nprobe = n_clusters degrades IVF to exact search: results must
    equal an independent numpy top-k on the same quantized grid — the
    strongest identity available for an ANN operator."""
    import numpy as np

    from parquet_merger_spark.operators.simsearch import (
        QUANT_SCALE,
        ivf_topk_portable,
    )

    e = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    got = {
        (r.query_id, r.rank): (r.vec_id, r.score)
        for r in ivf_topk_portable(e, nprobe=8).collect()
    }
    rows = e.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    q = np.rint(np.array([r.embedding for r in rows], dtype=np.float64) * QUANT_SCALE).astype(np.int64)
    order = np.argsort(ids)
    ids, q = ids[order], q[order]
    for qi in range(5):
        scores = q @ q[qi]
        cand = [(int(-scores[j]), int(ids[j])) for j in range(len(ids)) if ids[j] != qi]
        cand.sort()
        for rank in range(1, 11):
            neg_s, vid = cand[rank - 1]
            assert got[(qi, rank)] == (vid, -neg_s), (qi, rank)


def test_portable_ivf_recall_and_determinism(spark):
    from parquet_merger_spark.operators.simsearch import ivf_topk_portable

    e = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    exact = {
        (r.query_id, r.vec_id) for r in ivf_topk_portable(e, nprobe=8).collect()
    }
    approx = {
        (r.query_id, r.vec_id) for r in ivf_topk_portable(e, nprobe=2).collect()
    }
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.60, f"portable IVF recall {recall:.2f} below floor"
    again = {
        (r.query_id, r.vec_id)
        for r in ivf_topk_portable(e.repartition(9), nprobe=2).collect()
    }
    assert approx == again


def test_portable_pq_structure_recall_and_determinism(spark):
    """The PQ twin certifies the ADC *algebra* (codebook train -> encode
    -> LUT -> summed-parts ranking), not retrieval quality: with only
    4 subspaces x 8 codes on 64-dim near-random embeddings the quantizer
    is deliberately lossy (oracle tractability), so the recall floor is
    a chance-baseline bound (top-10 of 499 by chance ~= 0.02), while the
    structural and determinism properties are exact."""
    from parquet_merger_spark.operators.simsearch import (
        ivf_topk_portable,
        pq_topk_portable,
    )

    e = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    rows = pq_topk_portable(e).collect()
    # 5 queries x dense ranks 1..10, never the query itself
    assert {(r.query_id, r.rank) for r in rows} == {
        (q, k) for q in range(5) for k in range(1, 11)
    }
    assert all(r.vec_id != r.query_id for r in rows)
    approx = {(r.query_id, r.vec_id) for r in rows}
    exact = {
        (r.query_id, r.vec_id) for r in ivf_topk_portable(e, nprobe=8).collect()
    }
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.10, f"portable PQ recall {recall:.2f} at chance level"
    again = {
        (r.query_id, r.vec_id) for r in pq_topk_portable(e.repartition(9)).collect()
    }
    assert approx == again


def test_portable_pq_plan_passes_scale_review(spark):
    """Every crossJoin in the PQ twin is against a broadcast model-sized
    frame (8-row codebooks, 5-row query set, m*k-row LUT); the corpus is
    touched only to quantize and encode.  No cartesian product may
    survive in the physical plan."""
    from parquet_merger_spark.plans.audit import assert_scalable
    from parquet_merger_spark.queries import QUERIES

    dig = assert_scalable(
        QUERIES["pq_topk_portable"](spark, SF_DIR),
        allow_nested_loop=True,
        allow_single_partition=True,
    )
    assert dig["cartesian_products"] == 0
