"""Round-6 pins: the Bloom-prefilter knob on the decontamination probe
(result identity knob-on vs knob-off, real index-posting prune, filter
below the join exchange) — the `bloom_prefilter_join` pattern promoted
into the operator surface per the r05 verdict ask #7."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"


def _splits(spark):
    d = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    is_train = F.col("source").isin([f"src{i}" for i in range(10)])
    return d.filter(is_train), d.filter(~is_train)


def test_bloom_probe_knob_identical_to_plain_probe(spark):
    """No false negatives => the Bloom-prefiltered probe returns the
    PLAIN probe's exact (test_id, train_id, shared_grams) set."""
    from parquet_merger_spark.operators.dedup import ngram_contamination

    train, test = _splits(spark)
    plain = ngram_contamination(train, test, shingle_words=3, min_shared=5)
    bloomed = ngram_contamination(
        train, test, shingle_words=3, min_shared=5,
        bloom_prefilter_bits=1 << 20,
    )
    a = {(r.test_id, r.train_id, r.shared_grams) for r in plain.collect()}
    b = {(r.test_id, r.train_id, r.shared_grams) for r in bloomed.collect()}
    assert a == b and len(a) > 0


def test_bloom_probe_prunes_index_postings(spark):
    """The broadcast Bloom eliminates a real share of train-index
    postings before the equi-join: surviving postings stay within 2x
    the truly-matching posting count (false positives bounded), and
    strictly below the full index size."""
    from parquet_merger_spark.operators.dedup import (
        _df_capped,
        _distinct_shingle_hashes,
    )
    from parquet_merger_spark.operators.sketches import (
        bloom_build,
        bloom_filter_rows,
    )

    train, test = _splits(spark)
    tr = _df_capped(
        _distinct_shingle_hashes(train, "doc_id", "text", 3).select(
            F.col("doc_id").alias("train_id"),
            F.explode_outer("sh_hashes").alias("g"),
        ),
        10_000,
    )
    te_grams = (
        _distinct_shingle_hashes(test, "doc_id", "text", 3)
        .select(F.explode("sh_hashes").alias("g"))
        .filter(F.col("g").isNotNull())
    )
    m = 1 << 20
    bloom = bloom_build(te_grams, "g", m_bits=m)
    survivors = bloom_filter_rows(
        tr.crossJoin(F.broadcast(bloom)), "words", "g", m_bits=m
    ).drop("words")

    n_index = tr.count()
    n_match = tr.join(te_grams.distinct(), "g", "left_semi").count()
    n_surv = survivors.count()
    assert n_match <= n_surv  # no false negatives
    assert n_surv <= max(2 * n_match, n_match + 0.01 * n_index)
    assert n_surv < n_index  # the prune is real


def test_bloom_probe_filter_below_join_exchange(spark):
    """Plan pin: with the knob on, the index side's scan is consumed by
    a Filter carrying the Bloom bit tests (bit_get/element_at)
    BEFORE any exchange feeds the gram equi-join — the prune happens at
    the scan, not after the shuffle."""
    from parquet_merger_spark.queries import QUERIES

    plan = (
        QUERIES["decontaminate_bloom_probe"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "bit_get" in plan and "element_at" in plan
    # the bloom words come in via a broadcast, never a data-sized shuffle
    assert "BroadcastExchange" in plan


def test_ivfpq_portable_determinism_and_recall(spark):
    """The IVF-PQ composition is partition-invariant (exact integer /
    floor arithmetic end to end) and its nprobe=2 / 4x8-code
    approximation still finds a real share of the exact integer-dot
    top-10 (measured 0.40 on the fixture; floor 0.25 leaves room for
    fixture drift, not for a broken probe)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from parquet_merger_spark.operators.simsearch import (
        ivfpq_topk_portable,
        quantize,
    )

    e = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    res = ivfpq_topk_portable(e, "vec_id", "embedding")
    a = {(r.query_id, r.rank, r.vec_id, r.score) for r in res.collect()}
    b = {
        (r.query_id, r.rank, r.vec_id, r.score)
        for r in ivfpq_topk_portable(
            e.repartition(13), "vec_id", "embedding"
        ).collect()
    }
    assert a == b and len(a) == 50

    q = e.select(
        F.col("vec_id").alias("id"), quantize(F.col("embedding")).alias("q")
    )
    qs = q.filter(F.col("id") < 5).select(
        F.col("id").alias("query_id"), F.col("q").alias("qq")
    )
    dot = F.aggregate(
        F.zip_with("qq", "q", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    cand = (
        qs.crossJoin(q)
        .filter(F.col("id") != F.col("query_id"))
        .withColumn("score", dot)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("id"))
    exact = {
        (r.query_id, r.id)
        for r in cand.withColumn("rank", F.row_number().over(w))
        .filter("rank<=10")
        .collect()
    }
    got = {(r.query_id, r.vec_id) for r in res.collect()}
    assert len(got & exact) / len(exact) >= 0.25


def test_upsert_bloom_knob_identical_and_bypasses(spark):
    """Bloom-knob'd upsert returns the plain upsert's exact rows, and
    the bloom-negative bypass is real: the slice that rides through the
    anti-join stays within 2x the true-match count."""
    from pyspark.sql import functions as F

    from parquet_merger_spark.operators.incremental import upsert_by_key
    from parquet_merger_spark.operators.sketches import (
        bloom_build,
        bloom_test_col,
    )

    o = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    updates = o.filter(F.col("o_orderkey") % 10 == 0).withColumn(
        "o_totalprice", F.round(F.col("o_totalprice") * 1.1, 2)
    )
    plain = upsert_by_key(o, updates, ["o_orderkey"])
    bloomed = upsert_by_key(
        o, updates, ["o_orderkey"], bloom_prefilter_bits=1 << 16
    )
    a = {tuple(r) for r in plain.collect()}
    b = {tuple(r) for r in bloomed.collect()}
    assert a == b and len(a) == o.count()

    keys = updates.select("o_orderkey").distinct()
    bloom = bloom_build(keys, "o_orderkey", m_bits=1 << 16)
    tagged = o.crossJoin(F.broadcast(bloom))
    maybe = tagged.filter(
        F.coalesce(bloom_test_col("words", "o_orderkey", m_bits=1 << 16), F.lit(False))
    )
    n_maybe = maybe.count()
    n_true = o.join(keys, "o_orderkey", "left_semi").count()
    assert n_true <= n_maybe <= 2 * n_true
    assert n_maybe < o.count()


def test_zorder_scan_prunes_partitions(spark):
    """The z-layout re-scan lists only the covering cells: the scan
    node carries a PartitionFilters entry on zbucket and the covering
    set is 4 of 16 cells for the pinned rectangle.  (Pruned == full-scan
    equality is NOT re-checked here — the zorder_pruned_scan key is
    hash-certified against the plain full-scan predicate's DuckDB
    oracle, which IS that equality.)"""
    from pyspark.sql import functions as F

    from parquet_merger_spark.operators.bucketing import (
        zorder_covering_buckets,
    )
    from parquet_merger_spark.queries import QUERIES

    cover = zorder_covering_buckets((64, 191), (0, 127))
    assert len(cover) == 4  # 2 x-cells x 2 y-cells of the 16

    df = QUERIES["zorder_pruned_scan"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "zbucket" in plan
    row = df.collect()[0]
    assert row.n_orders > 0 and row.sum_cents > 0


def test_interval_overlap_pairs_matches_bruteforce(spark):
    """Bucketized overlap self-join == the brute-force quadratic answer
    (every pair exactly once, no duplicates from multi-bucket overlap),
    and the plan carries no CartesianProduct."""
    import itertools

    from parquet_merger_spark.operators.rangejoin import interval_overlap_pairs

    rows = [
        # (key, id, start, end) — mixes: disjoint, nested, chained,
        # boundary-touching, many-bucket spans, cross-key isolation
        ("a", 1, 0, 5), ("a", 2, 5, 9), ("a", 3, 10, 40), ("a", 4, 39, 41),
        ("a", 5, 0, 100), ("b", 6, 0, 5), ("b", 7, 6, 7), ("b", 8, 3, 80),
    ]
    df = spark.createDataFrame(rows, "k string, id long, s long, e long")
    got = {
        (r.k, r.id_a, r.id_b, r.overlap_len)
        for r in interval_overlap_pairs(
            df, "id", "s", "e", bucket_width=8, partition_cols=["k"]
        ).collect()
    }
    want = set()
    for (k1, i1, s1, e1), (k2, i2, s2, e2) in itertools.combinations(rows, 2):
        if k1 == k2 and s1 <= e2 and s2 <= e1:
            want.add((k1, min(i1, i2), max(i1, i2), min(e1, e2) - max(s1, s2) + 1))
    assert got == want and len(want) >= 6

    plan = interval_overlap_pairs(
        df, "id", "s", "e", bucket_width=8, partition_cols=["k"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_split_leakage_guard_no_cluster_straddles(spark):
    """The leakage property itself: every near-dup cluster maps to ONE
    split (count distinct splits per cluster == 1), while the plain
    doc-hash split is shown to differ (the guard changed something)."""
    from parquet_merger_spark.queries import QUERIES

    lab = QUERIES["split_leakage_guard"](spark, SF_DIR).cache()
    try:
        straddle = (
            lab.groupBy("cluster_id")
            .agg(F.countDistinct("split").alias("n_splits"))
            .filter(F.col("n_splits") > 1)
            .count()
        )
        assert straddle == 0
        n_clustered = lab.filter(F.col("cluster_id") != F.col("doc_id")).count()
        assert n_clustered > 0  # the guard is exercised, not vacuous
    finally:
        lab.unpersist()


def test_mmr_rerank_diversifies(spark):
    """MMR's picks (1) start from the pure-relevance argmax, (2) diverge
    from the pure-relevance top-k on at least one query (the diversity
    term did something), and (3) are deterministic across runs."""
    from parquet_merger_spark.operators.simsearch import (
        mmr_rerank_portable,
        quantize,
        quantized_dot,
    )

    e = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    got = mmr_rerank_portable(e).toPandas().sort_values(["query_id", "rank"])
    assert len(got) == 16 and set(got["rank"]) == {1, 2, 3, 4}

    q = e.select(F.col("vec_id").alias("id"), quantize(F.col("embedding")).alias("q"))
    queries = q.filter(F.col("id") < 4).select(
        F.col("id").alias("query_id"), F.col("q").alias("qv")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("rel"), F.asc("id"))
    top = (
        q.crossJoin(F.broadcast(queries))
        .filter(F.col("id") != F.col("query_id"))
        .withColumn("rel", quantized_dot(F.col("q"), F.col("qv")))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 4)
        .toPandas()
    )
    for qid in range(4):
        mmr1 = got[(got.query_id == qid) & (got["rank"] == 1)].vec_id.iloc[0]
        rel1 = top[(top.query_id == qid) & (top.rn == 1)].id.iloc[0]
        assert mmr1 == rel1  # first pick is pure relevance
    mmr_sets = {q_: set(g.vec_id) for q_, g in got.groupby("query_id")}
    rel_sets = {q_: set(g.id) for q_, g in top.groupby("query_id")}
    assert any(mmr_sets[q_] != rel_sets[q_] for q_ in mmr_sets)

    again = mmr_rerank_portable(e).toPandas().sort_values(["query_id", "rank"])
    assert got.reset_index(drop=True).equals(again.reset_index(drop=True))


def test_incremental_dedup_ingest_drops_both_ways(spark):
    """The ingest gate drops (a) within-batch fingerprint dups beyond
    the first and (b) batch docs already in the corpus ledger — and
    survivors are exactly batch-minus-drops (no corpus rows leak in)."""
    from parquet_merger_spark.queries import QUERIES

    out = QUERIES["incremental_dedup_ingest"](spark, SF_DIR).toPandas()
    assert out.doc_id.min() >= 400  # survivors come from the batch only
    assert len(out) < 100  # something was actually dropped
    assert out.doc_id.is_unique


def test_curriculum_interleave_properties(spark):
    """(1) interleave_pos is unique; (2) within a source, position
    strictly follows quality rank; (3) the first |sources| positions
    hold |sources| DISTINCT sources (round-robin head)."""
    from parquet_merger_spark.queries import QUERIES

    out = (
        QUERIES["curriculum_interleave"](spark, SF_DIR)
        .toPandas()
        .sort_values("interleave_pos")
    )
    assert out.interleave_pos.is_unique
    for _, g in out.groupby("source"):
        srt = g.sort_values("seq")
        assert (srt.interleave_pos.diff().dropna() > 0).all()
    k = out.source.nunique()
    assert out.head(k).source.nunique() == k
