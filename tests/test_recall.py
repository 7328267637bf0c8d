"""Recall bounds for the approximate operators, measured against their
exact oracle-verified ground truths at sf0.01.

The approximate paths (MinHash-LSH, IVF top-k, IVF-bucketed near-dup) are
`no_oracle` in the driver contract — these tests convert them from
"trusted" to "bounded": every run asserts a documented recall floor
against the exact computation on the same data.  Everything here is
deterministic (xxhash64 seeds, integer-sum kmeans), so the measured recall
is a constant of (algorithm, parameters, dataset), not a flaky sample.

Measured values at sf0.01 (documented so regressions are visible):
- minhash_lsh (64 hashes / 16 bands, t=0.5): recall 1.00  -> floor 0.90
- ivf_topk (nlist=16, nprobe=4, corpus_assign=2): recall 0.74 -> floor 0.60
- ivf_topk (nprobe = nlist, corpus_assign=1): exactness restored -> == brute force
- cosine near-dup ANN tier (sqrt-n centroids, 2-assign): recall 0.75 -> floor 0.60
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parquet_merger_spark.operators.dedup import (  # noqa: E402
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)
from parquet_merger_spark.operators.simsearch import (  # noqa: E402
    brute_force_topk,
    cosine_near_dup_pairs,
    ivf_topk,
)

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))


@pytest.fixture(scope="module")
def exact_jaccard_pairs(documents):
    return {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(documents, threshold=0.5).collect()
    }


@pytest.fixture(scope="module")
def brute_force_neighbors(embeddings):
    q = embeddings.filter(F.col("vec_id") < 5).withColumnRenamed("vec_id", "query_id")
    return {
        (r.query_id, r.vec_id)
        for r in brute_force_topk(embeddings, q, k=10).collect()
    }


def test_minhash_lsh_recall_vs_exact_jaccard(documents, exact_jaccard_pairs):
    lsh = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(
            documents, num_hashes=64, bands=16, threshold=0.5
        ).collect()
    }
    # precision is exact by construction: every emitted pair is
    # Jaccard-verified against the same threshold
    assert lsh <= exact_jaccard_pairs
    recall = len(lsh & exact_jaccard_pairs) / len(exact_jaccard_pairs)
    assert recall >= 0.90, f"LSH recall {recall:.3f} below documented 0.90 floor"


def test_ivf_topk_recall_vs_brute_force(embeddings, brute_force_neighbors):
    q = embeddings.filter(F.col("vec_id") < 5).withColumnRenamed("vec_id", "query_id")
    approx = {
        (r.query_id, r.vec_id)
        for r in ivf_topk(
            embeddings, q, k=10, nlist=16, nprobe=4, corpus_assign=2
        ).collect()
    }
    recall = len(approx & brute_force_neighbors) / len(brute_force_neighbors)
    assert recall >= 0.60, f"IVF recall {recall:.3f} below documented 0.60 floor"


def test_ivf_topk_exact_when_probing_all_buckets(embeddings, brute_force_neighbors):
    """nprobe == nlist restores exactness: every bucket is probed, so the
    candidate set is the full corpus."""
    q = embeddings.filter(F.col("vec_id") < 5).withColumnRenamed("vec_id", "query_id")
    full = {
        (r.query_id, r.vec_id)
        for r in ivf_topk(embeddings, q, k=10, nlist=16, nprobe=16).collect()
    }
    assert full == brute_force_neighbors


def test_cosine_ann_tier_recall_and_precision(embeddings):
    exact = {
        (r.id_a, r.id_b) for r in cosine_near_dup_pairs(embeddings, 0.4).collect()
    }
    # ann_threshold=0 forces the IVF-bucketed tier regardless of corpus size
    ann = {
        (r.id_a, r.id_b)
        for r in cosine_near_dup_pairs(embeddings, 0.4, ann_threshold=0).collect()
    }
    assert ann <= exact, "ANN tier emitted a pair the exact computation rejects"
    recall = len(ann & exact) / len(exact)
    assert recall >= 0.60, f"ANN near-dup recall {recall:.3f} below 0.60 floor"


def test_gemm_blocking_invariance(embeddings):
    """The exact all-pairs result must be identical for any block count —
    tiny rows_per_block forces many tiles, exercising the adaptive path."""
    default = {
        (r.id_a, r.id_b, r.cosine)
        for r in cosine_near_dup_pairs(embeddings, 0.4).collect()
    }
    many_blocks = {
        (r.id_a, r.id_b, r.cosine)
        for r in cosine_near_dup_pairs(embeddings, 0.4, rows_per_block=64).collect()
    }
    assert default == many_blocks
    assert len(default) > 0


def test_deterministic_sample_is_stable_and_nested(documents):
    """Hash-gate sampling: reproducible across runs, independent of
    repartitioning, and nested across fractions at the same salt."""
    from parquet_merger_spark.operators.sampling import deterministic_sample

    s20 = {r.doc_id for r in deterministic_sample(documents, 0.2).select("doc_id").collect()}
    s20_again = {
        r.doc_id
        for r in deterministic_sample(documents.repartition(13), 0.2)
        .select("doc_id")
        .collect()
    }
    assert s20 == s20_again, "sample must not depend on partitioning"
    s50 = {r.doc_id for r in deterministic_sample(documents, 0.5).select("doc_id").collect()}
    assert s20 <= s50, "same-salt samples must be nested"
    s20_other_salt = {
        r.doc_id
        for r in deterministic_sample(documents, 0.2, salt=99).select("doc_id").collect()
    }
    assert s20 != s20_other_salt
    # fraction lands in a sane band (xxhash64 is uniform)
    n = documents.count()
    assert 0.1 * n < len(s20) < 0.3 * n


def test_persisted_ivf_index_roundtrip(spark, embeddings, tmp_path):
    """write_ivf_index -> load_ivf_index -> ivf_topk(index=...) returns
    exactly what the direct (in-memory) computation returns, and the
    probe read is partition-pruned on bucket."""
    from parquet_merger_spark.operators.simsearch import (
        ivf_topk,
        load_ivf_index,
        write_ivf_index,
    )

    q = embeddings.filter(F.col("vec_id") < 5).withColumnRenamed("vec_id", "query_id")
    direct = {
        (r.query_id, r.vec_id, r.rank)
        for r in ivf_topk(
            embeddings, q, k=10, nlist=16, nprobe=4, corpus_assign=2
        ).collect()
    }

    path = str(tmp_path / "ivf_index")
    write_ivf_index(embeddings, path, nlist=16, corpus_assign=2)
    index = load_ivf_index(spark, path)
    from_index = {
        (r.query_id, r.vec_id, r.rank)
        for r in ivf_topk(
            embeddings, q, k=10, nlist=16, nprobe=4, index=index
        ).collect()
    }
    assert from_index == direct

    # bucket filters on the persisted layout prune partitions
    probe = index[1].filter("bucket IN (0, 1)")
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = probe._jdf.queryExecution().explainString(jmode)
    pf = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "bucket" in pf


def test_knn_graph_blocking_invariance_and_contract(embeddings):
    """knn_graph exact tier: identical for any block count (per-tile top-k
    selection uses the same total order as the final window, so candidate
    pruning is lossless), self never a neighbor, exactly k ranks per id."""
    from parquet_merger_spark.operators.simsearch import knn_graph

    default = {
        (r.id, r.neighbor_id, r.cosine, r.rank)
        for r in knn_graph(embeddings, k=5).collect()
    }
    many_blocks = {
        (r.id, r.neighbor_id, r.cosine, r.rank)
        for r in knn_graph(embeddings, k=5, rows_per_block=64).collect()
    }
    assert default == many_blocks
    ids = {i for (i, _, _, _) in default}
    assert all(i != nb for (i, nb, _, _) in default), "self-neighbor leaked"
    n = embeddings.count()
    assert len(default) == len(ids) * min(5, n - 1)


def test_knn_graph_block_tier_is_within_block(embeddings):
    """With block_col, neighbors come only from the same block and the
    within-block ranking matches an exact knn_graph run on that block."""
    from pyspark.sql import functions as F

    from parquet_merger_spark.operators.simsearch import knn_graph

    blocked = embeddings.withColumn("blk", F.pmod(F.col("vec_id"), F.lit(3)))
    out = knn_graph(blocked, k=3, block_col="blk").collect()
    blk_of = {r.vec_id: r.vec_id % 3 for r in embeddings.collect()}
    assert all(blk_of[r.id] == blk_of[r.neighbor_id] for r in out)
    one_block = blocked.filter(F.col("blk") == 0).drop("blk")
    exact = {
        (r.id, r.neighbor_id, r.cosine, r.rank)
        for r in knn_graph(one_block, k=3).collect()
    }
    within = {
        (r.id, r.neighbor_id, r.cosine, r.rank)
        for r in out
        if blk_of[r.id] == 0
    }
    assert within == exact


def test_sketch_stats_error_bounds(spark):
    """The sketch aggregates (rows-only in CORRECTNESS) are bounded here
    against the exact answers: HLL++ distinct within 3x its configured
    1% rsd; approx p50 within 1% of the exact percentile."""
    from parquet_merger_spark.queries import QUERIES

    from pyspark.sql import functions as F

    sketch = {r.event_type: r for r in QUERIES["sketch_stats"](spark, SF_DIR).collect()}
    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    exact = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("users"),
            F.percentile("value", F.lit(0.5)).alias("p50"),
        )
        .collect()
    }
    assert set(sketch) == set(exact) and len(sketch) > 0
    for et, s in sketch.items():
        x = exact[et]
        assert abs(s.approx_users - x.users) <= max(3, 0.03 * x.users), (
            f"{et}: HLL {s.approx_users} vs exact {x.users}"
        )
        spread = abs(x.p50) + 1e-9
        assert abs(s.p50_approx - x.p50) <= 0.01 * spread + 1e-6, (
            f"{et}: approx p50 {s.p50_approx} vs exact {x.p50}"
        )


def test_mixture_sample_budget_and_caps(spark, documents):
    """Mixture sampling: unlisted strata drop entirely; a weight large
    enough to exceed a stratum's mass keeps the WHOLE stratum (frac
    capped at 1); kept token mass for a rich stratum lands near
    budget * w_s / sum(w)."""
    from pyspark.sql import functions as F

    from parquet_merger_spark.operators.sampling import mixture_sample

    d = documents.withColumn(
        "n_tokens", F.size(F.split("text", " ")).cast("long")
    )
    totals = {r.lang: r.t for r in d.groupBy("lang").agg(F.sum("n_tokens").alias("t")).collect()}
    kept = mixture_sample(
        d, budget_tokens=8_000, weight_parts={"en": 50, "de": 50}
    )
    got = {r.lang: r.t for r in kept.groupBy("lang").agg(F.sum("n_tokens").alias("t")).collect()}
    assert set(got) <= {"en", "de"}, "unlisted strata must drop"
    # de target = 4000 tokens > de stratum mass? if so whole stratum kept
    de_target = 8_000 * 50 // 100
    if totals["de"] <= de_target:
        assert got["de"] == totals["de"], "under-budget stratum keeps everything"
    # en is rich: kept mass should be within 40% of target (hash-gate
    # variance on a few hundred docs)
    en_target = 8_000 * 50 / 100
    assert 0.6 * en_target <= got["en"] <= 1.4 * en_target
    # reproducible across partitioning
    again = mixture_sample(
        d.repartition(17), budget_tokens=8_000, weight_parts={"en": 50, "de": 50}
    )
    assert {r.doc_id for r in kept.collect()} == {r.doc_id for r in again.collect()}


def test_hll_rollup_error_bound(spark):
    """hll_rollup (rows-only in CORRECTNESS) bounded here: the sketch-
    union estimate per event_type must land within 5% of the exact
    distinct-user count — and the union-of-dailies must equal (to the
    sketch) what a direct one-shot sketch over the raw rows yields."""
    from parquet_merger_spark.queries import QUERIES, _events

    approx = {
        r.event_type: r.approx_users
        for r in QUERIES["hll_rollup"](spark, SF_DIR).collect()
    }
    e = _events(spark, SF_DIR)
    exact = {
        r.event_type: r.users
        for r in e.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("users"))
        .collect()
    }
    assert set(approx) == set(exact) and len(approx) > 0
    for et, est in approx.items():
        assert abs(est - exact[et]) <= 0.05 * exact[et], (et, est, exact[et])

    direct = {
        r.event_type: r.u
        for r in e.groupBy("event_type")
        .agg(
            F.round(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")))
            .cast("long")
            .alias("u")
        )
        .collect()
    }
    assert approx == direct, "daily-union must merge losslessly"


def test_pq_recall_bounds(spark):
    """PQ ADC (32 subspaces x 16 codes = 16-byte codes) must reach 0.55
    recall@10 alone and 0.90 after exact rerank of the 50-candidate
    shortlist (measured: 0.66 / 1.00 at sf0.01 — deterministic, so these
    are constants of the configuration, not flaky samples).  Training is
    partitioning-invariant (integer sufficient statistics)."""
    from parquet_merger_spark.operators.simsearch import (
        brute_force_topk,
        pq_encode,
        pq_topk,
        train_pq_codebooks,
    )

    e = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    qs = e.filter(F.col("vec_id") < 5).withColumnRenamed("vec_id", "query_id")
    truth = {(r.query_id, r.vec_id) for r in brute_force_topk(e, qs, k=10).collect()}

    books = train_pq_codebooks(e, m=32, n_codes=16, iters=1)
    assert books == train_pq_codebooks(e.repartition(7), m=32, n_codes=16, iters=1)

    enc = pq_encode(e, books)
    adc = {(r.query_id, r.vec_id) for r in pq_topk(enc, qs, books, k=10).collect()}
    assert len(adc & truth) / len(truth) >= 0.55

    rr = pq_topk(enc, qs, books, k=10, rerank=e, shortlist=50)
    rr_pairs = {(r.query_id, r.vec_id) for r in rr.collect()}
    assert len(rr_pairs & truth) / len(truth) >= 0.90

    # encoding is row-local: repartitioning cannot change any code
    enc2 = pq_encode(e.repartition(13), books)
    assert sorted(map(tuple, enc.collect())) == sorted(map(tuple, enc2.collect()))


def test_ivf_pq_composition(spark):
    """IVF-PQ: the coarse quantizer prunes the corpus to the query's
    probed buckets, PQ/ADC scans only those codes, exact rerank
    finishes.  Deterministic per-query constants at sf0.01 (nlist=16,
    nprobe=4, 2-assign, m=32/16 codes): scan fraction 0.42-0.47,
    recall@10 0.70-0.90 -> floors 0.6 scan / 0.6 recall."""
    from parquet_merger_spark.operators.simsearch import (
        assign_buckets,
        brute_force_topk,
        build_ivf_centroids,
        pq_encode,
        pq_topk,
        train_pq_codebooks,
    )

    e = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    cent = build_ivf_centroids(e, nlist=16)
    bucketed = assign_buckets(e, cent, n_assign=2)
    books = train_pq_codebooks(e, m=32, n_codes=16, iters=1)
    enc = pq_encode(e, books)
    n = e.count()

    for qid in (0, 1, 2):
        qs = e.filter(F.col("vec_id") == qid).withColumnRenamed(
            "vec_id", "query_id"
        )
        truth = {
            (r.query_id, r.vec_id)
            for r in brute_force_topk(e, qs, k=10).collect()
        }
        qpro = assign_buckets(qs, cent, id_col="query_id", n_assign=4)
        keep = (
            bucketed.join(qpro.select("bucket").distinct(), "bucket")
            .select("vec_id")
            .distinct()
        )
        assert keep.count() / n <= 0.6, "probe must prune the scan"
        got = pq_topk(
            enc.join(keep, "vec_id", "left_semi"),
            qs,
            books,
            k=10,
            rerank=e,
            shortlist=50,
        )
        pairs = {(r.query_id, r.vec_id) for r in got.collect()}
        assert len(pairs & truth) / len(truth) >= 0.6, qid


def test_persisted_pq_index_roundtrip(spark, embeddings, tmp_path):
    """write_pq_index -> load_pq_index -> pq_topk over the loaded codes
    returns exactly what the in-memory build returns (books survive the
    parquet round-trip bit-for-bit)."""
    from parquet_merger_spark.operators.simsearch import (
        load_pq_index,
        pq_encode,
        pq_topk,
        train_pq_codebooks,
        write_pq_index,
    )

    q = embeddings.filter(F.col("vec_id") < 5).withColumnRenamed(
        "vec_id", "query_id"
    )
    books = train_pq_codebooks(embeddings, m=32, n_codes=16, iters=1)
    direct = {
        (r.query_id, r.vec_id, r.rank)
        for r in pq_topk(
            pq_encode(embeddings, books), q, books, k=10, rerank=embeddings
        ).collect()
    }

    path = str(tmp_path / "pq_index")
    write_pq_index(embeddings, path, m=32, n_codes=16, iters=1)
    loaded_books, codes = load_pq_index(spark, path)
    assert loaded_books == books
    from_index = {
        (r.query_id, r.vec_id, r.rank)
        for r in pq_topk(
            codes, q, loaded_books, k=10, rerank=embeddings
        ).collect()
    }
    assert from_index == direct


def test_pq_training_rejects_empty_and_bad_dims(spark, embeddings):
    import pytest

    from parquet_merger_spark.operators.simsearch import train_pq_codebooks

    empty = embeddings.filter("vec_id < 0")
    with pytest.raises(ValueError, match="empty corpus"):
        train_pq_codebooks(empty, m=8, n_codes=4)
    # ValueError since r09 (semantic guards survive python -O)
    with pytest.raises(ValueError, match="divide"):
        train_pq_codebooks(embeddings, m=7, n_codes=4)  # 64 % 7 != 0


def test_semdedup_exact_contract_and_ann_tier(embeddings):
    """SemDeDup composition: one output row per input vector, survivor iff
    cluster_id == own id, cluster label = component minimum, and exactly
    one survivor per cluster (both tiers).  ANN tier (block-restricted
    kNN) is approximate in BOTH directions — block confinement drops
    cross-block edges (under-merge) and can promote lower-cosine
    same-block neighbors into the freed top-k slots (over-merge) — so the
    tier is bounded by duplicate-detection recall, not containment; every
    ANN edge still respects the cosine threshold, so false merges are
    near-dups by score, never arbitrary."""
    from parquet_merger_spark.operators.dedup import semdedup

    n = embeddings.count()

    def check_contract(rows):
        assert len(rows) == n
        assert all((r.cluster_id == r.vec_id) == r.is_survivor for r in rows)
        by_cluster: dict = {}
        for r in rows:
            by_cluster.setdefault(r.cluster_id, []).append(r)
        for cid, members in by_cluster.items():
            assert cid == min(m.vec_id for m in members), "label not min id"
            assert sum(m.is_survivor for m in members) == 1, "one survivor"

    exact = semdedup(embeddings, threshold=0.4, k=5).collect()
    check_contract(exact)
    exact_dups = {r.vec_id for r in exact if not r.is_survivor}
    assert exact_dups, "fixture must contain at least one semantic duplicate"

    blocked = embeddings.withColumn("blk", F.pmod(F.col("vec_id"), F.lit(2)))
    ann = semdedup(blocked, threshold=0.4, k=5, block_col="blk").collect()
    check_contract(ann)
    ann_dups = {r.vec_id for r in ann if not r.is_survivor}
    recall = len(ann_dups & exact_dups) / len(exact_dups)
    assert recall >= 0.30, f"semdedup ANN duplicate recall {recall:.3f}"


def test_exact_gemm_tiers_preserve_string_ids(spark):
    """The exact GEMM tiers must accept non-long id columns like the
    block tier does (the output schema is derived from the input id
    dtype, not hardcoded long), and canonicalize string pairs with the
    same lexicographic order Spark's `<` uses."""
    from parquet_merger_spark.operators.simsearch import (
        cosine_near_dup_pairs,
        knn_graph,
    )

    rows = [
        (f"doc{i:03d}", [float((i * 7 + j * 3) % 11) / 11 for j in range(8)])
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id string, embedding array<double>")
    pairs = cosine_near_dup_pairs(df, 0.8, id_col="doc_id").collect()
    assert pairs and all(isinstance(r.id_a, str) for r in pairs)
    assert all(r.id_a < r.id_b for r in pairs)
    g = knn_graph(df, k=3, id_col="doc_id").collect()
    assert g and all(isinstance(r.neighbor_id, str) for r in g)
    ids = {r.id for r in g}
    assert all(len([r for r in g if r.id == i]) == 3 for i in ids)


def test_quantized_cosine_zero_norm_is_null_not_crash(spark):
    """Spark 4 defaults ANSI mode ON, where double division by zero
    raises — a zero-norm embedding (all elements quantize to 0) must
    yield NULL cosine (dropped by threshold filters and ranked last),
    not a DIVIDE_BY_ZERO crash."""
    from pyspark.sql import functions as F

    from parquet_merger_spark.operators.simsearch import (
        brute_force_topk,
        ivf_topk,
    )

    assert spark.conf.get("spark.sql.ansi.enabled") == "true"
    df = spark.createDataFrame(
        [(1, [0.0] * 8), (2, [1.0] * 8), (3, [0.5] * 8), (4, [0.9] * 8)],
        "vec_id long, embedding array<double>",
    )
    q = df.filter(F.col("vec_id") == 2).withColumnRenamed("vec_id", "query_id")
    got = {(r.query_id, r.vec_id) for r in brute_force_topk(df, q, k=3).collect()}
    assert got == {(2, 3), (2, 4)}  # zero-norm vec 1 excluded, no crash
    got_ivf = {
        (r.query_id, r.vec_id)
        for r in ivf_topk(df, q, k=3, nlist=2, nprobe=2).collect()
    }
    assert got_ivf == {(2, 3), (2, 4)}


def test_mixture_sample_degenerate_stratum_totals(spark):
    """A stratum whose token column sums to zero (or is all NULL) must be
    DROPPED, matching the weight-0 semantics — not crash with ANSI
    DIVIDE_BY_ZERO and not silently pass the whole stratum through a
    NULL threshold."""
    from parquet_merger_spark.operators.sampling import mixture_sample

    df = spark.createDataFrame(
        [(1, "en", 100), (2, "en", 200), (3, "zz", 0), (4, "zz", 0), (5, "nn", None)],
        "doc_id long, lang string, n_tokens long",
    )
    kept = mixture_sample(
        df, budget_tokens=10_000, weight_parts={"en": 1, "zz": 1, "nn": 1}
    ).collect()
    langs = {r.lang for r in kept}
    assert "zz" not in langs and "nn" not in langs
    assert {r.doc_id for r in kept} <= {1, 2}


def test_pq_encode_kernel_matches_expression(spark):
    """r10: pq_encode moved from the interpreted m x n_codes expression
    tree to an Arrow-batched numpy kernel.  The two are independent
    spellings of the same exact-integer assignment (grid distances
    < 2^53 exact in float64; argmin-first == array_min's (dist, code)
    tie-break), so the encodings must be IDENTICAL row for row —
    including the NULL-vector contract."""
    from pyspark.sql import Row, functions as F
    from pyspark.sql.types import ArrayType, FloatType, LongType, StructField, StructType

    from parquet_merger_spark.operators.simsearch import (
        _pq_encode_expr,
        pq_encode,
        train_pq_codebooks,
    )

    e = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    books = train_pq_codebooks(e, m=32, n_codes=16, iters=1)
    kern = {r["vec_id"]: (r["codes"], r["recon2"]) for r in pq_encode(e, books).collect()}
    expr = {r["vec_id"]: (r["codes"], r["recon2"]) for r in _pq_encode_expr(e, books).collect()}
    assert kern == expr

    # NULL-vector contract: the kernel encodes NULL -> NULL codes/recon2
    # (a deliberate divergence from the expression path, which encoded a
    # NULL vector as all-code-0 with a positive recon2 — null dist sorts
    # first in array_min — letting a vector with no data be ADC-scored
    # as a real point; downstream pq_topk's recon2>0 guard now ranks it
    # last instead).  No fixture carries null embeddings, so no declared
    # query's output moves.
    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )
    nulls = spark.createDataFrame([Row(vec_id=1, embedding=None)], schema)
    krow = pq_encode(nulls, books).collect()[0]
    assert krow["codes"] is None and krow["recon2"] is None


def test_pq_encode_null_elements(spark):
    """r11 (advice fix): a vector with null ELEMENTS becomes NaN in the
    kernel's float64 view; NaN distances would make argmin return the
    first NaN position — arbitrary-but-plausible codes plus a finite
    recon2 for a vector with missing data.  The mask now folds
    ``isfinite`` in, so such rows encode as NULL per the documented
    contract (same as whole-NULL vectors).  No fixture carries them."""
    from pyspark.sql import Row
    from pyspark.sql.types import ArrayType, FloatType, LongType, StructField, StructType

    from parquet_merger_spark.operators.simsearch import (
        pq_encode,
        train_pq_codebooks,
    )

    e = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    books = train_pq_codebooks(e, m=32, n_codes=16, iters=1)
    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )
    holey = spark.createDataFrame(
        [
            Row(vec_id=1, embedding=[None] + [0.25] * 63),
            Row(vec_id=2, embedding=[0.25] * 64),
        ],
        schema,
    )
    rows = {r["vec_id"]: r for r in pq_encode(holey, books).collect()}
    assert rows[1]["codes"] is None and rows[1]["recon2"] is None
    assert rows[2]["codes"] is not None and rows[2]["recon2"] is not None


def test_pq_adc_kernel_matches_expression(spark):
    """r11: the pq_topk ADC scan moved from the interpreted per-(query,
    row) expression (m element_at lookups + aggregate add chain inside a
    broadcast cross join) to an Arrow kernel with driver-built LUTs.
    Same exact-integer arithmetic (LUT entries and m-term sums < 2^53,
    bound-guarded), same IEEE division order — every pq_cosine double
    must be BIT-IDENTICAL pair for pair."""
    from parquet_merger_spark.operators.simsearch import (
        _adc_scores,
        _adc_scores_expr,
        pq_encode,
        train_pq_codebooks,
    )

    e = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    queries = e.filter(F.col("vec_id") < 5).withColumnRenamed("vec_id", "query_id")
    books = train_pq_codebooks(e, m=32, n_codes=16, iters=1)
    enc = pq_encode(e, books).persist()
    kern = {
        (r["query_id"], r["vec_id"]): r["pq_cosine"]
        for r in _adc_scores(enc, queries, books).collect()
    }
    expr = {
        (r["query_id"], r["vec_id"]): r["pq_cosine"]
        for r in _adc_scores_expr(enc, queries, books).collect()
    }
    enc.unpersist()
    assert kern == expr
