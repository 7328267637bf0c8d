"""Driver-contract query registry: every SURVEY §2 operator (plus the
LLM-pipeline extensions) as a named PySpark query with, where
SQL-expressible, a DuckDB oracle that computes the identical result.

Cross-engine determinism rules used throughout (so value hashes match):
- aggregate doubles are round()-ed (2dp money, 6dp ratios);
- similarity scores are computed on integer-quantized vectors
  (:mod:`operators.simsearch`) so dot products are exact integers and the
  final double ops are bit-identical in both engines;
- every ranking has a total order (explicit id tie-break);
- timestamps that feed arithmetic are reduced to epoch seconds with
  explicit FLOOR on both sides (Spark cast truncates, DuckDB cast rounds);
- all computed columns are aliased identically in Spark and SQL.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from parquet_merger_spark.operators.asof import asof_join
from parquet_merger_spark.operators.dedup import (
    containment_pairs,
    dup_clusters,
    dup_passage_coverage,
    exact_dedup,
    minhash_lsh_pairs,
    near_dedup_survivors,
    ngram_contamination,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
)
from parquet_merger_spark.operators.sampling import (
    cap_per_group,
    deterministic_sample,
    portable_hash_gate,
)
from parquet_merger_spark.operators.merge import merge_dataframes, merged_df
from parquet_merger_spark.operators.ranking import assign_row_ids
from parquet_merger_spark.operators.multimodal import (
    attach_binary_payload,
    extract_payload_meta,
    extract_payload_meta_expr,
)
from parquet_merger_spark.operators.simsearch import (
    brute_force_topk,
    cosine_near_dup_pairs,
    ivf_topk,
    normalize_quantize,
)
from parquet_merger_spark.operators.textstats import (
    fingerprint,
    language_scores,
    quality_score,
    redact_pii,
    tfidf_top_terms,
    with_repetition_stats,
    with_text_stats,
)
from parquet_merger_spark.operators.export import drop_internal_columns
from parquet_merger_spark.functions.strings import sanitize_filename_col
from parquet_merger_spark.session import pin_oracle_confs
from parquet_merger_spark.barrier import materialize, materialize_lazy
from parquet_merger_spark.partitioning import scaled_partitions
from parquet_merger_spark.streaming.events import (
    session_window_agg,
    sessionize_batch,
    windowed_event_counts_batch,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

# Per-micro-batch progress of the last run of each stream_* key, captured
# by _drain_stream: the raw material for the committed streaming-latency
# artifact (tools/streaming_latency.py).  Keys overwrite on re-run.
STREAM_PROGRESS: dict[str, list[dict]] = {}


def _drain_stream(q, key: str) -> None:
    """``processAllAvailable`` + ``stop`` with progress capture.

    Every stream_* harness replays mtime-pinned micro-batches through a
    real StreamingQuery; this shared drain records each micro-batch's
    observed latency (batchId, input rows, the phase durations Spark
    reports — addBatch is the per-batch processing latency) so streaming
    keys have round-over-round diffable wall numbers, not just
    correctness proofs.  Capture happens BEFORE stop() — stopping drops
    the progress buffer on some versions."""
    import json as _json

    try:
        q.processAllAvailable()
        prog = []
        for p in q.recentProgress:
            d = p if isinstance(p, dict) else _json.loads(p.json)
            prog.append(
                {
                    "batch_id": d.get("batchId"),
                    "input_rows": d.get("numInputRows"),
                    "duration_ms": d.get("durationMs", {}),
                }
            )
        STREAM_PROGRESS[key] = prog
    finally:
        q.stop()


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    pin_oracle_confs(spark)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ``ts`` normalized to a session-zoned microsecond TIMESTAMP.

    The fixture generator has shipped ``ts`` as either TIMESTAMP(NANOS)
    (which Spark 4 only reads as an epoch-nanos long, see
    :func:`pin_oracle_confs`) or a plain TIMESTAMP(MICROS) (which arrives
    as TIMESTAMP_NTZ). Adapt by dtype so both vintages work: ``ts div
    1000`` is an exact integer floor from nanos to micros (a double
    division would lose precision — epoch-nanos exceed 2^53), and the
    NTZ→LTZ cast is wall-clock-preserving under the pinned UTC session
    timezone.
    """
    e = _t(spark, sf_dir, "events")
    ts_type = dict(e.dtypes)["ts"]
    if ts_type == "bigint":
        return e.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return e.withColumn("ts", F.col("ts").cast("timestamp"))


def _scratch_dir(spark: SparkSession, name: str) -> str:
    """Scratch path for sink-then-read queries, unique PER SPARK
    APPLICATION: two concurrent harness runs (distinct application ids)
    can never race on each other's files, while repeated calls within one
    session reuse-and-overwrite the same directory — disk stays bounded
    and the determinism re-run reads its own fresh write."""
    import tempfile

    return os.path.join(
        tempfile.gettempdir(),
        f"pm_spark_{spark.sparkContext.applicationId}",
        name,
    )


# --------------------------------------------------------------------------
# Core parity queries (SURVEY §2.1-2.8)
# --------------------------------------------------------------------------


def q_scan_parquet(spark, sf_dir):
    """S4: full vectorized scan."""
    return _t(spark, sf_dir, "nation")


def q_projection(spark, sf_dir):
    """P1/P2: column projection (pruned at the parquet reader)."""
    return _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity", "l_returnflag")


def q_filter_pushdown(spark, sf_dir):
    """Predicate + projection pushdown."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter((F.col("l_quantity") > 45) & (F.col("l_returnflag") == "R")).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount"
    )


def q_union_all(spark, sf_dir):
    """O1 fast path: duplicate-preserving UNION ALL (includes a raw
    timestamp column as a cross-engine type probe)."""
    o = _t(spark, sf_dir, "orders")
    hi = o.filter(F.col("o_totalprice") > 400000).select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    return hi.union(urgent)


def q_union_common_columns(spark, sf_dir):
    """O1+P3 mismatch path: schema-intersection union (NOT null-filling) —
    dfB lacks c_nationkey, so it is dropped from both sides; column order
    follows the first frame."""
    c = _t(spark, sf_dir, "customer")
    df_a = c.select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
    df_b = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )
    return merge_dataframes([df_a, df_b])


def q_row_count(spark, sf_dir):
    """A1: total row count."""
    return _t(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("cnt"))


def q_group_count_having(spark, sf_dir):
    """A2 analog of smart-batch: groupBy + count + HAVING count > 1."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") > 1)
    )


def q_distinct_rows(spark, sf_dir):
    """O2 analog on data rows."""
    return _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


def q_sort_limit(spark, sf_dir):
    """R1 + top-k: total order via explicit tie-break."""
    return (
        _t(spark, sf_dir, "part")
        .select("p_partkey", "p_name", "p_retailprice")
        .orderBy(F.desc("p_retailprice"), F.col("p_partkey"))
        .limit(20)
    )


def q_filter_contains(spark, sf_dir):
    """P7/F8: case-insensitive substring search filter."""
    d = _t(spark, sf_dir, "documents")
    return d.filter(F.contains(F.lower("text"), F.lit("spark"))).select(
        "doc_id", "lang", "n_chars"
    )


def q_internal_column_drop(spark, sf_dir):
    """P6: __internal__ column drop (CSV-sink semantics)."""
    d = _t(spark, sf_dir, "documents").withColumnRenamed("source", "__source__")
    return drop_internal_columns(d)


def q_cast_string_null_empty(spark, sf_dir):
    """F7: typed cast-to-string with null -> empty string, one column per
    type family the reference's CSV renderer enumerates
    (/root/reference/src/main.rs:739-826): integer, double, timestamp,
    date, boolean, string.  Nulls are induced per family (nullif/when) so
    the null -> "" rule is exercised everywhere, exactly the behavior a
    CSV export hits on every nullable column."""
    o = _t(spark, sf_dir, "orders")
    ts = F.when(F.col("o_orderkey") % 7 == 0, None).otherwise(F.col("o_orderdate"))
    intc = F.when(F.col("o_orderkey") % 5 == 0, None).otherwise(F.col("o_custkey"))
    dbl = F.when(F.col("o_orderkey") % 6 == 0, None).otherwise(F.col("o_totalprice"))
    boolc = F.when(F.col("o_orderkey") % 8 == 0, None).otherwise(
        F.col("o_totalprice") > 200000
    )
    return o.select(
        "o_orderkey",
        F.coalesce(intc.cast("string"), F.lit("")).alias("int_str"),
        F.coalesce(dbl.cast("string"), F.lit("")).alias("double_str"),
        F.coalesce(ts.cast("string"), F.lit("")).alias("ts_str"),
        F.coalesce(ts.cast("date").cast("string"), F.lit("")).alias("date_str"),
        F.coalesce(boolc.cast("string"), F.lit("")).alias("bool_str"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("")).alias(
            "str_or_empty"
        ),
    )


def q_sanitize_name(spark, sf_dir):
    """F5 as a column expression."""
    return _t(spark, sf_dir, "part").select(
        "p_partkey", sanitize_filename_col("p_name").alias("sanitized")
    )


def q_basename_stem(spark, sf_dir):
    """F9: basename / stem path functions over synthesized paths."""
    d = _t(spark, sf_dir, "documents")
    path = F.concat(
        F.lit("/data/"), F.col("source"), F.lit("/doc_"), F.col("doc_id").cast("string"), F.lit(".txt")
    )
    base = F.regexp_extract(path, r"([^/]+)$", 1)
    return d.select(
        "doc_id",
        path.alias("full_path"),
        base.alias("base_name"),
        F.regexp_replace(base, r"\.[^.]*$", "").alias("stem"),
    )


def q_lower_contains(spark, sf_dir):
    """F8/F10: lowercase + contains predicate."""
    p = _t(spark, sf_dir, "part")
    return p.filter(F.contains(F.lower("p_type"), F.lit("med"))).select(
        "p_partkey", F.lower("p_type").alias("type_lc")
    )


# --------------------------------------------------------------------------
# Analytical queries (joins / aggs / windows — SURVEY §2.3, §2.5-2.7 rebuild)
# --------------------------------------------------------------------------


def q_pricing_summary(spark, sf_dir):
    """TPC-H Q1-style groupBy aggregate (the flagship)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_top_revenue_orders(spark, sf_dir):
    """TPC-H Q3-style 3-way join + agg + deterministic top-k."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cutoff = F.to_timestamp(F.lit("2000-01-01"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .filter(
            (F.col("c_mktsegment") == "BUILDING")
            & (F.col("o_orderdate") < cutoff)
            & (F.col("l_shipdate") > cutoff)
        )
        .groupBy("l_orderkey", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.col("l_orderkey"))
        .limit(10)
    )


def q_nation_revenue(spark, sf_dir):
    """TPC-H Q5-style star join; nation/region are broadcast dims."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


def q_trailing_window_avg(spark, sf_dir):
    """RANGE-frame window: per-user trailing 1-hour average event value
    (frame = all events within 3600s before each event, event-time based
    — a rows-frame would be wrong under irregular event spacing)."""
    e = _events(spark, sf_dir)
    es = e.withColumn("epoch", F.col("ts").cast("long"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("epoch")
        .rangeBetween(-3600, Window.currentRow)
    )
    return es.select(
        "event_id",
        "user_id",
        "epoch",
        F.round(F.avg("value").over(w), 6).alias("trailing_avg"),
        F.count(F.lit(1)).over(w).alias("n_in_window"),
    )


def q_funnel_steps(spark, sf_dir):
    """Strict-sequence conversion funnel view -> click -> purchase: per
    user, earliest view, earliest click AFTER that view, earliest
    purchase AFTER that click (nulls where the user dropped off).  See
    :func:`operators.analytics.funnel_steps` for the join-chain shape."""
    from parquet_merger_spark.operators.analytics import funnel_steps

    e = _events(spark, sf_dir).withColumn("ts_epoch", F.col("ts").cast("long"))
    return funnel_steps(e, ["view", "click", "purchase"])


def q_retention_cohorts(spark, sf_dir):
    """Weekly retention triangle: cohort = epoch-anchored week of each
    user's first event; n_users = distinct cohort members active at each
    week offset.  Pure integer week arithmetic — no calendar functions,
    identical in every engine."""
    from parquet_merger_spark.operators.analytics import retention_cohorts

    e = _events(spark, sf_dir).withColumn("ts_epoch", F.col("ts").cast("long"))
    return retention_cohorts(e)


def q_gapfill_locf(spark, sf_dir):
    """Sparse -> dense per-user daily series: daily event-value sums
    gap-filled over each user's own [first, last] day span with
    last-observation-carried-forward.  Calendar rows are generated
    per-key with sequence()+explode (row-local — no global calendar
    cross join); the carry-forward is one bounded window."""
    from parquet_merger_spark.operators.analytics import gapfill_locf

    e = _events(spark, sf_dir).filter(F.col("user_id") < 20)
    daily = (
        e.withColumn("day", F.date_trunc("day", F.col("ts")))
        .groupBy("user_id", "day")
        .agg(F.round(F.sum("value"), 2).alias("v"))
    )
    filled = gapfill_locf(daily, "user_id", "day", "v")
    return filled.select(
        "user_id",
        F.col("day").cast("long").alias("day_epoch"),
        "v_filled",
        "observed",
    )


def q_fuzzy_match(spark, sf_dir):
    """Blocked fuzzy (edit-distance) matching: probe strings are part
    names with the 7th character deleted (a deterministic typo); each is
    matched back against the full part corpus inside 5-char-prefix
    blocks with levenshtein <= 2.  See
    :func:`operators.entity.blocked_fuzzy_join` for the blocking-vs-
    all-pairs scale argument."""
    from parquet_merger_spark.operators.entity import blocked_fuzzy_join

    p = _t(spark, sf_dir, "part")
    probes = p.filter(F.col("p_partkey") % 50 == 0).select(
        F.col("p_partkey").alias("probe_id"),
        F.concat(
            F.substring("p_name", 1, 6), F.expr("substring(p_name, 8)")
        ).alias("probe_text"),
    )
    corpus = p.select(
        F.col("p_partkey").alias("match_id"), F.col("p_name").alias("match_text")
    )
    out = blocked_fuzzy_join(
        probes,
        corpus,
        "probe_text",
        "match_text",
        lambda c: F.substring(c, 1, 5),
        max_distance=2,
    )
    return out.select("probe_id", "probe_text", "match_id", "match_text", "distance")


def q_cube_revenue(spark, sf_dir):
    """CUBE aggregation (year x priority): all four grouping sets in one
    pass — Catalyst plans grouping sets as a single Expand + aggregate,
    not four scans (the rollup twin is q_rollup_revenue)."""
    o = _t(spark, sf_dir, "orders").withColumn("yr", F.year("o_orderdate"))
    return (
        o.cube("yr", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .select("yr", "o_orderpriority", "n_orders", "revenue")
    )


def q_corr_matrix(spark, sf_dir):
    """Pairwise Pearson correlations of quantized lineitem measures via
    exact integer sufficient statistics (one scan, single-row reduce —
    no data shuffle; see :func:`operators.profile.corr_matrix_exact` for
    why F.corr can never hash-match across engines)."""
    from parquet_merger_spark.operators.profile import corr_matrix_exact

    li = _t(spark, sf_dir, "lineitem").select(
        F.floor("l_quantity").alias("qty"),
        F.round(F.col("l_discount") * 100, 0).cast("long").alias("disc"),
        F.round(F.col("l_tax") * 100, 0).cast("long").alias("tax"),
    )
    return corr_matrix_exact(li, ["qty", "disc", "tax"])


def _scd2_snapshot_frames(spark, sf_dir):
    """The three customer snapshots (snap 2 re-prices every 7th account
    +10.0, snap 3 additionally moves every 13th to segment 'MOVED') —
    ONE definition shared by q_scd2_customers and q_scd2_asof_lookup
    (the scd2_customers oracle mirrors the same literals in SQL, so a
    drifted copy would desynchronize the lookup key's dimension from
    the oracle-certified build)."""
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    repriced = F.when(
        F.col("c_custkey") % 7 == 0, F.col("c_acctbal") + 10.0
    ).otherwise(F.col("c_acctbal"))
    moved = F.when(
        F.col("c_custkey") % 13 == 0, F.lit("MOVED")
    ).otherwise(F.col("c_mktsegment"))
    s1 = c.withColumn("snap_id", F.lit(1))
    s2 = c.withColumn("c_acctbal", repriced).withColumn("snap_id", F.lit(2))
    s3 = (
        c.withColumn("c_acctbal", repriced)
        .withColumn("c_mktsegment", moved)
        .withColumn("snap_id", F.lit(3))
    )
    return s1.unionByName(s2).unionByName(s3)


def q_scd2_customers(spark, sf_dir):
    """SCD type-2 dimension build from three full snapshots of customer
    (snap 2 re-prices every 7th account, snap 3 additionally moves every
    13th to a new segment): versioned rows with [valid_from, valid_to)
    intervals, open versions null-terminated.  See
    :func:`operators.incremental.scd2_from_snapshots`."""
    from parquet_merger_spark.operators.incremental import scd2_from_snapshots

    return scd2_from_snapshots(
        _scd2_snapshot_frames(spark, sf_dir),
        ["c_custkey"],
        ["c_mktsegment", "c_acctbal"],
    )


def q_bigram_counts(spark, sf_dir):
    """Top-10 word bigrams per language — the n-gram LM count table.
    Guarded against the SURVEY §9 InferFiltersFromGenerate pathology:
    tokens materialize as a column FIRST, the size pre-filter runs on
    that column, and the generator is explode_outer — so the split never
    re-runs inside an inferred scan filter.  Count shuffle is on (lang,
    bigram); the final top-k window partitions by lang (5 partitions —
    small, but it ranks only the already-aggregated count table, not
    rows)."""
    d = _t(spark, sf_dir, "documents")
    d2 = d.select("lang", F.split("text", " ").alias("toks")).filter(
        F.size("toks") >= 2
    )
    big = d2.select(
        "lang",
        F.explode_outer(
            F.expr(
                "transform(sequence(0, size(toks) - 2),"
                " i -> concat(toks[i], ' ', toks[i + 1]))"
            )
        ).alias("bigram"),
    )
    counts = big.groupBy("lang", "bigram").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(F.desc("n"), "bigram")
    return counts.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 10)


def q_event_transitions(spark, sf_dir):
    """First-order Markov transition counts between consecutive event
    types per user (lead over a per-user total order) — the sequence
    statistic behind session modeling.  One shuffle for the window (on
    user_id), one for the pair count."""
    e = _events(spark, sf_dir).withColumn("es", F.col("ts").cast("long"))
    w = Window.partitionBy("user_id").orderBy("es", "event_id")
    t = e.withColumn("next_type", F.lead("event_type").over(w)).filter(
        F.col("next_type").isNotNull()
    )
    return t.groupBy(
        F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type")
    ).agg(F.count(F.lit(1)).alias("n"))


def q_value_band_stats(spark, sf_dir):
    """True range join (irregular bands, not floor-divisible) against a
    broadcast dimension: each event lands in the band with lo <= value <
    hi.  BroadcastNestedLoopJoin is the RIGHT plan here — the build side
    is 4 rows, so the 'nested loop' is a per-row scan of a tiny local
    array, and the probe side never shuffles.  (A large band table would
    instead bucketize: equi-join on floor(value/width) then refine.)"""
    bands = spark.createDataFrame(
        [
            ("tiny", 0.0, 5.0),
            ("small", 5.0, 20.0),
            ("mid", 20.0, 50.0),
            ("large", 50.0, 1e9),
        ],
        "band string, lo double, hi double",
    )
    e = _events(spark, sf_dir)
    j = e.join(
        F.broadcast(bands), (e.value >= bands.lo) & (e.value < bands.hi)
    )
    return j.groupBy("band").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total")
    )


def q_decile_binning(spark, sf_dir):
    """Equal-frequency (decile) binning of order prices WITHOUT a global
    window: exact global row ids come from the quantile-bucketed
    two-phase ranking (operators/ranking.assign_row_ids — the same
    no-single-task-sort design VERDICT asked for), then decile =
    floor((row_id-1)*10/n)+1.  Returns per-decile count and price
    bounds — the feature-engineering binning table."""
    from parquet_merger_spark.operators.ranking import assign_row_ids

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    # total as a LAZY broadcast 1-row frame (the basket_lift pattern) —
    # an eager .count() here ran a driver-blocking full scan at
    # query-BUILD time, then the execution scanned orders again
    nf = o.agg(F.count(F.lit(1)).alias("__n"))
    r = assign_row_ids(o, "o_totalprice", ["o_orderkey"], n_buckets=32)
    d = r.crossJoin(F.broadcast(nf)).withColumn(
        "decile",
        (F.floor((F.col("row_id") - 1) * 10 / F.col("__n")) + 1).cast("long"),
    )
    return d.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.min("o_totalprice"), 2).alias("lo"),
        F.round(F.max("o_totalprice"), 2).alias("hi"),
    )


def q_weighted_sample(spark, sf_dir):
    """Deterministic Bernoulli weighted sampling: documents kept with
    probability min(1, n_tokens/2000) — long documents oversampled, the
    importance-sampling primitive for token-budget corpus construction.
    Row-local gate, shuffle-free (see operators/sampling.weighted_sample);
    the portable polynomial gate makes the oracle cross-engine-exact."""
    from parquet_merger_spark.operators.sampling import (
        portable_hash_gate,
        weighted_sample,
    )
    from parquet_merger_spark.operators.textstats import token_count

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", token_count(F.col("text")).alias("n_tokens")
    )
    return weighted_sample(
        d, "n_tokens", scale=2000, gate=portable_hash_gate(F.col("doc_id"))
    )


def q_feature_hashing(spark, sf_dir):
    """Hashing-trick featurization: tokens bucketed into a fixed
    256-dim space via md5 (engine-portable), emitting sparse
    (doc_id, bucket, n) counts — the vocabulary-free vectorizer for
    linear probes over 100 TB text (no global dictionary build, no
    shuffle beyond the count agg; collisions are the accepted trade).
    Token build is pathology-guarded like bigram_counts."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    d2 = d.select("doc_id", F.split("text", " ").alias("toks")).filter(
        F.size("toks") >= 1
    )
    tok = d2.select("doc_id", F.explode_outer("toks").alias("tok"))
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long"),
        F.lit(256),
    )
    return (
        tok.withColumn("bucket", bucket)
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_orc_roundtrip(spark, sf_dir):
    """ORC sink + source round-trip (the third columnar format next to
    parquet and the text formats): write a typed orders projection as
    ORC with Spark's parallel directory writer, read it back, hash-match
    the untouched parquet source — certifying lossless type round-trip
    through the ORC reader/writer pair."""

    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 800).select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.col("o_orderdate").cast("timestamp").cast("long").alias("order_epoch"),
    )
    out = _scratch_dir(spark, "orc_roundtrip")
    o.write.mode("overwrite").orc(out)
    return spark.read.orc(out)


def q_value_outliers(spark, sf_dir):
    """Per-group z-score outlier detection (|z| > 3 within event type) on
    bit-stable statistics: values quantize to exact integer cents, the
    per-type (n, sum, sum-of-squares) reduce exactly, and the z formula
    runs in double from those exact inputs — identical IEEE ops in any
    engine (F.stddev's streaming moments never hash-match).  Plan: one
    aggregate + one broadcast join of the 5-row stats table; the scan
    streams, nothing else shuffles."""
    e = _events(spark, sf_dir)
    q = e.withColumn("cents", F.round(F.col("value") * 100, 0).cast("long"))
    stats = q.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).alias("ss"),
    )
    j = q.join(F.broadcast(stats), "event_type")
    nn = F.col("n").cast("double")
    s = F.col("s").cast("double")
    ss = F.col("ss").cast("double")
    z = F.round(
        (F.col("cents").cast("double") - s / nn) / (F.sqrt(nn * ss - s * s) / nn),
        6,
    )
    return (
        j.withColumn("z", z)
        .filter(F.abs(F.col("z")) > 3)
        .select("event_id", "event_type", "value", "z")
    )


def q_string_functions(spark, sf_dir):
    """Scalar string-function family sweep (SURVEY §2.8): pad, translate,
    reverse, repeat, regex extract, split_part, left/right — one
    projection, all JVM codegen expressions, certified against DuckDB's
    implementations of the same ANSI functions."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("key_padded"),
        F.rpad("p_brand", 12, ".").alias("brand_padded"),
        F.translate("p_type", " ", "_").alias("type_snake"),
        F.reverse("p_name").alias("name_rev"),
        F.expr("repeat('*', CAST(p_partkey % 5 AS INT))").alias("stars"),
        F.regexp_extract("p_brand", r"#([0-9]+)", 1).alias("brand_num"),
        F.expr("split_part(p_type, ' ', 2)").alias("type_word2"),
        F.expr("left(p_name, 8)").alias("name_l8"),
        F.expr("right(p_type, 4)").alias("type_r4"),
    )


def q_pagerank(spark, sf_dir):
    """Integer-exact PageRank (3 power iterations) over the bipartite
    part<->supplier interaction graph from lineitem — the iterative-
    algorithm class, driver-looped over fully distributed passes, made
    oracle-able by exact integer micro-rank arithmetic (see
    :mod:`operators.graph` for the determinism contract).  Supplier ids
    are offset by 10M into a disjoint vertex range."""
    from parquet_merger_spark.operators.graph import pagerank_int

    li = (
        _t(spark, sf_dir, "lineitem")
        .select(
            F.col("l_partkey").alias("p"),
            (F.col("l_suppkey") + 10_000_000).alias("s"),
        )
        .distinct()
    )
    # both directions from ONE explode pass — a self-union of li would
    # execute the distinct shuffle once per branch
    edges = (
        li.select(
            F.explode(
                F.array(
                    F.struct(F.col("p").alias("src"), F.col("s").alias("dst")),
                    F.struct(F.col("s").alias("src"), F.col("p").alias("dst")),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
    )
    # li is distinct and the two directions live in disjoint id ranges,
    # so the exploded pairs are already duplicate-free — skip the
    # operator's dedup; every vertex appears as a src (symmetric), so
    # the vertex set falls out of the degree table
    return pagerank_int(
        edges, iterations=3, assume_distinct=True, assume_symmetric=True
    )


def q_window_functions(spark, sf_dir):
    """Analytic window-function family sweep (SURVEY §2.6 beyond
    row_number/rank): percent_rank, cume_dist, first/last/nth over the
    full frame, and offset lag/lead with defaults — one window spec per
    frame shape, partitioned by customer (parallel; the total order is
    price + key so every rank function is deterministic)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        F.first("o_orderkey").over(wf).alias("first_key"),
        F.last("o_orderkey").over(wf).alias("last_key"),
        F.nth_value("o_orderkey", 2).over(wf).alias("second_key"),
        F.lag("o_orderkey", 1, -1).over(w).alias("prev_key"),
        F.lead("o_orderkey", 2, -1).over(w).alias("next2_key"),
    )


def q_datetime_functions(spark, sf_dir):
    """Datetime scalar-function sweep (SURVEY §2.8): quarter, ISO week,
    day-of-year, last-day-of-month, month truncation, day arithmetic and
    differences — all JVM expressions; date outputs rendered as ISO
    strings so the cross-engine compare is representation-stable."""
    o = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.quarter(d).alias("qtr"),
        F.weekofyear(d).alias("iso_week"),
        F.dayofyear(d).alias("doy"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("plus30"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).alias("days_since_95"),
    )


def q_array_functions(spark, sf_dir):
    """Array/higher-order function family sweep (SURVEY §2.8): distinct,
    sort, intersect, slice, negative indexing, containment — array
    results normalized to sorted joined strings so the cross-engine
    compare is order-stable.  All row-local JVM expressions."""
    from parquet_merger_spark.operators.textstats import STOPWORDS

    d = _t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    stop = F.array(*[F.lit(w) for w in STOPWORDS])
    return d.select(
        "doc_id",
        F.size(toks).alias("n_toks"),
        F.array_join(F.array_sort(F.array_distinct(toks)), " ").alias(
            "distinct_sorted"
        ),
        F.array_join(
            F.array_sort(F.array_intersect(toks, stop)), " "
        ).alias("stop_hits"),
        F.array_join(F.slice(toks, 1, 3), " ").alias("first3"),
        F.element_at(toks, -1).alias("last_tok"),
        F.array_contains(toks, "the").alias("has_the"),
    )


def q_udtf_tokens(spark, sf_dir):
    """Python UDTF + LATERAL join (SURVEY §2.10): the user-defined
    table-function surface, certified against the native unnest twin.
    Deliberately tiny input slice — UDTFs are the row-at-a-time Python
    path and exist for logic that genuinely needs Python (see
    :mod:`functions.udtfs` for the speed hierarchy)."""
    from parquet_merger_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return spark.sql(
        "SELECT d.doc_id, t.pos, t.tok "
        "FROM {d} d, LATERAL token_positions(d.text) t",
        d=d,
    )


def q_unpivot_measures(spark, sf_dir):
    """UNPIVOT (wide -> long melt) of the lineitem measures — the
    inverse of pivot, a pure narrow projection+expand (no shuffle): each
    input row emits one row per measure column."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax"
    )
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="val",
    )


def q_null_functions(spark, sf_dir):
    """Null-handling scalar family: coalesce chains, nullif,
    null-safe equality, and conditional defaults over the (fully
    populated) customer table plus synthesized nulls — certifying the
    engine's three-valued logic against DuckDB's."""
    c = _t(spark, sf_dir, "customer")
    # synthesize nulls deterministically: every 3rd account balance
    bal = F.when(F.col("c_custkey") % 3 == 0, F.lit(None)).otherwise(
        F.col("c_acctbal")
    )
    return c.select(
        "c_custkey",
        F.coalesce(bal, F.lit(0.0)).alias("bal_or_zero"),
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_nb"),
        bal.eqNullSafe(F.col("c_acctbal")).alias("bal_intact"),
        F.isnull(bal).alias("bal_missing"),
        F.when(bal.isNull(), F.lit("missing"))
        .when(bal < 0, F.lit("debt"))
        .otherwise(F.lit("credit"))
        .alias("bal_class"),
    )


def q_sql_star_join(spark, sf_dir):
    """The SQL text interface (not the DataFrame API): TPC-H Q5-shaped
    star join run via ``spark.sql`` over registered temp views — the
    same Catalyst plan as the DataFrame twin (broadcast dims, pushed
    filters), proving both front-ends hit one optimizer."""
    for t in ("customer", "orders", "lineitem", "supplier", "nation", "region"):
        _t(spark, sf_dir, t).createOrReplaceTempView(f"v_{t}")
    return spark.sql(
        """
        SELECT n_name,
               round(sum(l_extendedprice), 2) AS revenue,
               CAST(count(*) AS BIGINT) AS n_items
        FROM v_customer
        JOIN v_orders   ON c_custkey = o_custkey
        JOIN v_lineitem ON l_orderkey = o_orderkey
        JOIN v_supplier ON l_suppkey = s_suppkey
                       AND c_nationkey = s_nationkey
        JOIN v_nation   ON s_nationkey = n_nationkey
        JOIN v_region   ON n_regionkey = r_regionkey
        WHERE r_name = 'AMERICA'
        GROUP BY n_name
        """
    )


def q_sql_having_subquery(spark, sf_dir):
    """SQL-interface aggregation subquery (TPC-H Q18 shape): customers
    whose total order value clears a HAVING threshold, joined back for
    detail — IN-subquery over a grouped HAVING, via ``spark.sql``."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    return spark.sql(
        """
        SELECT c_custkey, c_name,
               CAST(count(*) AS BIGINT) AS n_orders,
               round(sum(o_totalprice), 2) AS total_value
        FROM v_customer JOIN v_orders ON c_custkey = o_custkey
        WHERE c_custkey IN (
          SELECT o_custkey FROM v_orders
          GROUP BY o_custkey
          HAVING sum(o_totalprice) > 3000000
        )
        GROUP BY c_custkey, c_name
        """
    )


def q_sql_recursive_cte(spark, sf_dir):
    """SQL recursion (Spark 4 ``WITH RECURSIVE``): a month spine built by
    the recursive CTE, left-joined to distributed monthly order rollups
    so gap months surface as zero rows.  The spine bounds are literal
    (1995-01 .. 2001-12, 84 rows — the fixtures' order-date domain plus
    an empty tail that proves the gap semantics): static recursion depth,
    deterministic plan.  The recursion is O(spine) tiny; the aggregation
    underneath stays a normal map-side-partial shuffle, so at 100 TB the
    spine join is a broadcast against an 84-row side."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        WITH RECURSIVE months(mnum) AS (
          SELECT 0
          UNION ALL
          SELECT mnum + 1 FROM months WHERE mnum < 83
        ),
        monthly AS (
          SELECT (year(o_orderdate) * 12 + month(o_orderdate))
                 - (1995 * 12 + 1) AS mnum,
                 CAST(count(*) AS BIGINT) AS n_orders,
                 round(sum(o_totalprice), 2) AS revenue
          FROM v_orders
          GROUP BY 1
        )
        SELECT concat(CAST(1995 + mnum DIV 12 AS STRING), '-',
                      lpad(CAST(mnum % 12 + 1 AS STRING), 2, '0')) AS month,
               coalesce(n_orders, CAST(0 AS BIGINT)) AS n_orders,
               coalesce(revenue, CAST(0.0 AS DOUBLE)) AS revenue
        FROM months LEFT JOIN monthly USING (mnum)
        """
    )


def q_sql_correlated_subquery(spark, sf_dir):
    """Correlated scalar subquery (TPC-H Q2/Q17 shape): each order is
    compared against an aggregate recomputed over ITS customer's orders.
    Catalyst decorrelates this into an aggregate + self-join (no
    per-row re-execution), so the 100 TB plan is two shuffles on
    o_custkey — plus an EXISTS clause that decorrelates to a left-semi
    join, covering both rewrite families in one query."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM v_orders o
        WHERE o_totalprice >= 0.999 * (
                SELECT max(o2.o_totalprice) FROM v_orders o2
                WHERE o2.o_custkey = o.o_custkey
              )
          AND EXISTS (
                SELECT 1 FROM v_customer c
                WHERE c.c_custkey = o.o_custkey AND c.c_acctbal > 0
              )
        """
    )


def q_variant_extract(spark, sf_dir):
    """Spark 4 VARIANT (semi-structured) path: rows round-trip through
    ``to_json`` -> ``parse_json`` (binary variant encoding) ->
    ``variant_get`` typed-path extraction, covering nested objects,
    array indexing, and the NULL-on-missing ``try_variant_get``.
    Everything is row-local JVM code; the oracle computes the same
    values straight from the base columns, so the whole JSON->variant->
    path-extraction chain is what's under test."""
    e = _events(spark, sf_dir)
    j = F.to_json(
        F.struct(
            F.col("event_type").alias("t"),
            F.struct(
                F.col("user_id").alias("u"), F.round("value", 2).alias("v")
            ).alias("m"),
            F.array(F.col("event_id"), F.col("user_id")).alias("ids"),
        )
    )
    v = F.parse_json(j)
    d = e.select("event_id", v.alias("__v"))
    return d.select(
        "event_id",
        F.expr("variant_get(__v, '$.t', 'string')").alias("vt"),
        F.expr("variant_get(__v, '$.m.u', 'long')").alias("vu"),
        F.expr("variant_get(__v, '$.m.v', 'double')").alias("vv"),
        F.expr("variant_get(__v, '$.ids[1]', 'long')").alias("vid1"),
        F.expr("try_variant_get(__v, '$.absent', 'long')").alias("vmiss"),
    )


def q_try_functions(spark, sf_dir):
    """ANSI-error-handling family: the ``try_`` variants return NULL
    where strict evaluation would raise — division by zero, numeric
    parse failures, out-of-range array access.  The oracle reproduces
    each with DuckDB's NULLIF/TRY_CAST idioms."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(F.col("l_extendedprice"), F.col("l_discount")).alias(
            "price_per_disc"
        ),
        F.try_divide(F.lit(1.0), F.col("l_tax")).alias("inv_tax"),
        F.try_to_number(
            F.when(F.col("l_linenumber") == 1, F.lit("12.50")).otherwise(
                F.lit("not a number")
            ),
            F.lit("99.99"),
        ).cast("double").alias("parsed"),
        F.try_element_at(
            F.array(F.col("l_quantity"), F.col("l_discount")),
            F.col("l_linenumber").cast("int"),
        ).alias("arr_at_line"),
    )


def q_rare_token_stats(spark, sf_dir):
    """Corpus-statistics quality signal without a language model: the
    fraction of each document's tokens that are globally rare (corpus
    count <= 2) — the integer-exact stand-in for LM-perplexity filtering
    (high rare-token mass = OOV garbage, mojibake, boilerplate IDs).
    Deliberately log-free: ln() differs in the last ulp across libm
    implementations (SURVEY §9 determinism rules); integer count ratios
    hash-match anywhere.  Two shuffles: global token counts (map-side
    partial), then a token-level join back — both keyed on the token,
    AQE-skew-safe for stopword-heavy keys."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    j = toks.join(vocab, "tok")
    return (
        j.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("cnt") <= 2, 1).otherwise(0))
            .cast("long")
            .alias("n_rare"),
        )
        .withColumn(
            "rare_frac",
            F.round(F.col("n_rare") / F.col("n_tokens"), 6),
        )
    )


def q_sql_parameterized(spark, sf_dir):
    """Parameterized SQL (Spark 4 named-parameter binding): the
    injection-safe template shape every SQL front-end should use —
    values bind as typed parameters (:floor, :status), never string
    interpolation."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(o_totalprice), 2) AS revenue
        FROM v_orders
        WHERE o_totalprice > :floor AND o_orderstatus = :status
        GROUP BY o_orderpriority
        """,
        args={"floor": 250000.0, "status": "O"},
    )


def q_corpus_pipeline(spark, sf_dir):
    """END-TO-END training-corpus preparation, one oracle-checked chain:
    curation gates (quality+language+repetition, PII-redacted survivors)
    -> context-window chunking of the redacted text (64 tokens, 8
    overlap) -> sequence packing of the chunks into 2048-token bins,
    sharded by doc_id%8 so the packing window never degenerates into a
    single global-sort task.  Each stage is the same operator its
    standalone query uses; the oracle is the composed SQL of the three
    stage oracles — so the whole pipeline, not just its pieces, is
    hash-verified."""
    from parquet_merger_spark.operators.chunking import (
        chunk_documents,
        pack_sequences,
    )
    from parquet_merger_spark.operators.curation import curate_corpus

    d = _t(spark, sf_dir, "documents")
    curated = curate_corpus(d).select(
        "doc_id", F.col("text_redacted").alias("text")
    )
    chunks = chunk_documents(curated, chunk_tokens=64, overlap=8)
    # packing needs one total-order key; 1e6 chunks/doc (~56M tokens at
    # step 56) bounds any real document, so the composite never collides
    ch = chunks.withColumn(
        "chunk_id", F.col("doc_id") * 1_000_000 + F.col("chunk_idx")
    ).withColumn("shard", (F.col("doc_id") % 8).cast("long"))
    packed = pack_sequences(
        ch,
        budget_tokens=2048,
        token_col="n_chunk_tokens",
        id_col="chunk_id",
        shard_col="shard",
    )
    return packed.select(
        "doc_id", "chunk_idx", "n_chunk_tokens", "shard", "bin_id"
    )


def q_decimal_aggregates(spark, sf_dir):
    """Exact-decimal money aggregation — the type discipline for
    financial rollups: doubles cast to DECIMAL(18,2) BEFORE summing, so
    the group totals are exact (no FP accumulation error at any row
    count or partitioning), then ONE cast back to double for transport.
    The same discipline at 100 TB: decimal partial sums merge exactly
    across any number of executors."""
    o = _t(spark, sf_dir, "orders")
    d = F.col("o_totalprice").cast("decimal(18,2)")
    g = o.groupBy("o_orderstatus").agg(
        F.sum(d).alias("total_dec"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min(d).alias("min_dec"),
        F.max(d).alias("max_dec"),
    )
    return g.select(
        "o_orderstatus",
        F.col("total_dec").cast("double").alias("total"),
        # the exact total survives transport as integer cents too —
        # proof the decimal sum lost nothing
        (F.col("total_dec") * 100).cast("long").alias("total_cents"),
        "n",
        F.col("min_dec").cast("double").alias("min_price"),
        F.col("max_dec").cast("double").alias("max_price"),
    )


def q_from_csv_extract(spark, sf_dir):
    """Scalar CSV parsing (``from_csv`` — the per-field escape hatch when
    a string column embeds delimited records): rows round-trip through
    ``concat_ws`` -> ``from_csv`` with an explicit schema, including a
    quoted field containing the delimiter.  Oracle computes the same
    fields from the base columns, so the parser itself is under test."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 500)
    line = F.concat_ws(
        ",",
        F.col("c_custkey"),
        F.concat(F.lit('"'), F.col("c_name"), F.lit(",jr"), F.lit('"')),
        F.round("c_acctbal", 2),
    )
    parsed = F.from_csv(
        line, "k long, name string, bal double"
    )
    d = c.select("c_custkey", parsed.alias("p"))
    return d.select(
        "c_custkey",
        F.col("p.k").alias("k"),
        F.col("p.name").alias("name"),
        F.col("p.bal").alias("bal"),
    )


def q_xml_extract(spark, sf_dir):
    """Spark XML path (xpath_* scalar functions over a constructed XML
    fragment — nested element + attribute + count).  DuckDB has no XML
    engine; the oracle computes identical values from the base columns,
    so the XML construction+extraction chain is what's verified."""
    n = _t(spark, sf_dir, "supplier")
    xml = F.concat(
        F.lit('<supplier key="'),
        F.col("s_suppkey"),
        F.lit('"><name>'),
        F.col("s_name"),
        F.lit("</name><nation>"),
        F.col("s_nationkey"),
        F.lit("</nation><tags><t>a</t><t>b</t></tags></supplier>"),
    )
    d = n.select("s_suppkey", xml.alias("__x"))
    return d.select(
        "s_suppkey",
        F.expr("xpath_string(__x, '/supplier/name')").alias("xname"),
        F.expr("xpath_long(__x, '/supplier/nation')").alias("xnation"),
        F.expr("xpath_string(__x, '/supplier/@key')").alias("xkey"),
        F.expr("CAST(size(xpath(__x, '/supplier/tags/t/text()')) AS BIGINT)").alias(
            "n_tags"
        ),
    )


def q_robust_outliers(spark, sf_dir):
    """Robust (median/MAD) outlier detection per event type — the
    breakdown-resistant twin of the z-score query: flag values whose
    modified z-score |0.6745*(x - median)| / MAD exceeds 3.5 (Iglewicz-
    Hoaglin).  Medians run on exact integer cents so the 50th-percentile
    interpolation (both engines average the two middle values) sees
    identical inputs.  Plan: two aggregates (median of cents, then MAD of
    integer absolute deviations) + one broadcast join of the tiny
    per-type stats."""
    e = _events(spark, sf_dir)
    q = e.withColumn("cents", F.round(F.col("value") * 100, 0).cast("long"))
    med = q.groupBy("event_type").agg(
        F.percentile("cents", F.lit(0.5)).alias("med_cents")
    )
    dev = q.join(F.broadcast(med), "event_type").withColumn(
        # deviations stay exact: |cents*2 - med*2| is an integer even when
        # the median interpolates to a half
        "absdev2",
        F.abs(F.col("cents") * 2 - (F.col("med_cents") * 2).cast("long")),
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("absdev2", F.lit(0.5)).alias("mad2"),
        F.first("med_cents").alias("med_cents"),
    )
    j = dev.drop("med_cents").join(F.broadcast(mad), "event_type")
    mz = F.round(
        F.lit(0.6745) * F.col("absdev2").cast("double") / F.col("mad2"), 6
    )
    return (
        # MAD=0 groups (>=50% of values identical) are excluded in BOTH
        # engines: Spark double division would yield Infinity while
        # DuckDB's zero-division behavior varies by version — the guard
        # keeps the differential contract on degenerate-but-plausible data
        j.filter(F.col("mad2") > 0)
        .withColumn("mz", mz)
        .filter(F.col("mz") > 3.5)
        .select("event_id", "event_type", "value", "mz")
    )


def q_grouping_sets_revenue(spark, sf_dir):
    """Explicit GROUPING SETS (the general form CUBE/ROLLUP specialize):
    revenue by (status), by (priority), and the grand total — with
    per-column ``grouping()`` flags disambiguating the NULL-as-aggregate
    rows from genuine NULLs.  One shuffle; Spark expands the sets via
    Expand, each set aggregated map-side-partially."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
               CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority,
               round(sum(o_totalprice), 2) AS revenue,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM v_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


def q_ohlc_hourly(spark, sf_dir):
    """Time-series resampling to hourly OHLC bars per event type —
    open/close via ``min_by``/``max_by`` over a TOTAL-ordered key
    (struct(ts, event_id): ties on ts alone would make first/last
    partition-dependent, the classic distributed-resample bug).  One
    shuffle, map-side partial."""
    e = _events(spark, sf_dir)
    h = F.date_trunc("hour", F.col("ts"))
    ordkey = F.struct(F.col("ts"), F.col("event_id"))
    return (
        e.select(
            "event_type",
            h.cast("long").alias("hour_epoch"),
            "ts",
            "event_id",
            "value",
        )
        .groupBy("event_type", "hour_epoch")
        .agg(
            F.min_by("value", ordkey).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", ordkey).alias("close"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
    )


def q_map_functions(spark, sf_dir):
    """Map scalar-function family: build maps row-locally
    (map_from_arrays / create_map), then element_at lookup, key/value
    projections (sorted and comma-joined to a scalar string so every
    output column is hashable for the driver canon), map_filter and
    map_concat.
    Outputs are scalars only; the oracle computes the same
    values straight from the base columns, so the map machinery itself
    is what's under test."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 3000)
    m = F.map_from_arrays(
        F.array(F.lit("status"), F.lit("priority")),
        F.array(F.col("o_orderstatus"), F.col("o_orderpriority")),
    )
    nm = F.create_map(
        F.lit("price"), F.col("o_totalprice"),
        F.lit("half"), F.col("o_totalprice") / 2,
    )
    merged = F.map_concat(
        m, F.create_map(F.lit("extra"), F.lit("x"))
    )
    return o.select(
        "o_orderkey",
        F.element_at(m, "status").alias("status_val"),
        F.element_at(m, "missing").alias("missing_val"),
        F.array_join(F.array_sort(F.map_keys(merged)), ",").alias(
            "keys_sorted"
        ),
        F.size(F.map_filter(nm, lambda k, v: v > 100000.0)).cast("long").alias(
            "n_big_vals"
        ),
        F.element_at(nm, "half").alias("half_price"),
    )


def q_string_agg_groups(spark, sf_dir):
    """Ordered string aggregation (LISTAGG/STRING_AGG): the top-5
    highest-balance customers per market segment, joined into one sorted
    comma-separated string per group.  Spark expresses the ordered agg
    as collect_list -> array_sort -> array_join (collect_list order is
    partition-dependent; the explicit sort restores determinism — the
    rule every distributed LISTAGG needs)."""
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.col("c_custkey")
    )
    top = c.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 5)
    return top.groupBy("c_mktsegment").agg(
        F.array_join(F.array_sort(F.collect_list("c_name")), ",").alias(
            "top_names"
        ),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


def q_sql_custdist(spark, sf_dir):
    """TPC-H Q13 shape: the distribution of customers by how many orders
    they placed, INCLUDING zero-order customers (left join before the
    double aggregation — the outer join is what distinguishes this from
    a plain group-by).  Two shuffles: orders on custkey, then the tiny
    count-of-counts; both map-side partial."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    return spark.sql(
        """
        SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        FROM (
          SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
          FROM v_customer LEFT OUTER JOIN v_orders ON c_custkey = o_custkey
          GROUP BY c_custkey
        )
        GROUP BY c_count
        """
    )


def _price_band_boundary(i):
    """Closed-form irregular band boundary: monotonic (consecutive gaps
    land in [0.25, 1.75]), all values exact multiples of 0.25 (exactly
    representable doubles — bit-identical across engines), no cumulative
    sum needed so both engines build the dim with pure per-row
    arithmetic."""
    return F.lit(900.0) + i + F.lit(0.25) * ((i * 3) % 4)


def q_range_lookup_bucketed(spark, sf_dir):
    """The large-dim range join (operators/rangejoin.py): 100 irregular
    contiguous price bands over part.p_retailprice, matched by exploding
    each band into covering fixed-width buckets and EQUI-joining on the
    bucket id — no nested-loop join anywhere in the plan (asserted in
    tests/test_asof.py), so the dim side could be 10^8 bands and the
    join would still shuffle/broadcast like any hash join.  Oracle is
    the naive BETWEEN join."""
    from parquet_merger_spark.operators.rangejoin import bucketed_range_join

    i = F.col("id")
    bands = spark.range(100).select(
        F.col("id").alias("band"),
        _price_band_boundary(i).alias("lo"),
        _price_band_boundary(i + 1).alias("hi"),
    )
    facts = _t(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    j = bucketed_range_join(
        facts, bands, "p_retailprice", "lo", "hi", bucket_width=2.0
    )
    return j.groupBy("band", "lo", "hi").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum(F.round(F.col("p_retailprice") * 100).cast("long")).alias(
            "sum_price_cents"
        ),
    )


def q_regex_functions(spark, sf_dir):
    """Regex scalar-function family over document text: extract /
    extract-all / count / replace / match-test.  Patterns stay in the
    ASCII character-class subset where Java regex (Spark) and RE2-style
    regex (DuckDB) agree exactly.  Pure per-row JVM expressions —
    shuffle-free, embarrassingly parallel."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"([A-Za-z]+)", 1).alias("first_word"),
        F.regexp_extract("text", r"([0-9]+)", 1).alias("first_number"),
        F.regexp_count("text", F.lit(r"[aeiou]")).cast("long").alias("n_vowels"),
        F.length(F.regexp_replace("text", r"[^A-Za-z]+", "")).cast("long").alias(
            "n_alpha"
        ),
        F.col("text").rlike(r"^[A-Z]").alias("starts_upper"),
        F.size(F.split("text", r"\s+")).cast("long").alias("n_ws_tokens"),
    )


def q_math_functions(spark, sf_dir):
    """Math scalar-function family over lineitem, restricted to the
    operations with bit-identical cross-engine results: abs/ceil/floor/
    sign on stored doubles, IEEE-exact sqrt, integer modulo and bitwise
    ops on keys, least/greatest.  (exp/ln/pow are deliberately absent:
    libm implementations differ in the last ulp across engines — the
    determinism rules in SURVEY §9.)"""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    q = F.col("l_quantity")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(q - 25.0).alias("abs_dev"),
        F.ceil(F.col("l_extendedprice")).cast("long").alias("price_ceil"),
        F.floor(F.col("l_extendedprice")).cast("long").alias("price_floor"),
        F.sqrt(q).alias("qty_sqrt"),
        F.signum(q - 25.0).cast("double").alias("qty_sign"),
        (F.col("l_orderkey") % 7).cast("long").alias("key_mod7"),
        (
            F.col("l_orderkey").bitwiseAND(F.lit(255))
        ).cast("long").alias("key_and255"),
        F.shiftleft(F.col("l_linenumber"), 3).cast("long").alias("line_shl3"),
        F.least(q, F.col("l_discount") * 100).alias("least_qd"),
        F.greatest(q, F.col("l_tax") * 100).alias("greatest_qt"),
    )


def q_hll_rollup(spark, sf_dir):
    """Mergeable-sketch rollup — THE 100 TB distinct-count pattern: build
    a Datasketches HLL sketch of user_id per (event_type, day) partial,
    then roll partials up to event_type by sketch UNION (not by re-
    scanning raw data).  At scale the daily sketches are a tiny persisted
    summary table; any ad-hoc rollup (weekly, all-time, per-cohort) is a
    union of kilobyte sketches.  No SQL oracle (DuckDB's approx engine is
    a different sketch); tests/test_recall.py bounds the estimate against
    the exact distinct count instead."""
    e = _events(spark, sf_dir)
    daily = (
        e.withColumn("day", F.to_date("ts"))
        .groupBy("event_type", "day")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
    )
    return daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.round(F.hll_sketch_estimate(F.hll_union_agg("sk"))).cast("long").alias(
            "approx_users"
        ),
    )


def q_trend_fit(spark, sf_dir):
    """Per-group least-squares trend: slope+intercept of daily event
    count over day index, per event type — the regression twin of
    corr_matrix, same bit-stable recipe (exact integer sufficient
    statistics reduced per group, closed-form doubles at the end).
    Two aggregates (daily rollup, then per-type stats); both shuffles
    are map-side partial."""
    e = _events(spark, sf_dir)
    day0 = F.lit(19723)  # 2024-01-01 as epoch-day; keeps x small+exact
    daily = (
        e.withColumn(
            "x", (F.floor(F.col("ts").cast("long") / 86400) - day0).cast("long")
        )
        .groupBy("event_type", "x")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    st = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return st.select(
        "event_type",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
    )


def q_scd2_asof_lookup(spark, sf_dir):
    """Point-in-time dimension lookup: facts stamped with a snapshot id
    join the SCD2 customer versions whose [valid_from, valid_to)
    interval contains the stamp — the consumption side of
    q_scd2_customers.  The interval join is an equi-join on the key plus
    a range predicate, so Spark plans a hash join with the range as a
    post-join filter (no all-pairs)."""
    from parquet_merger_spark.operators.incremental import scd2_from_snapshots

    dim = scd2_from_snapshots(
        _scd2_snapshot_frames(spark, sf_dir),
        ["c_custkey"],
        ["c_mktsegment", "c_acctbal"],
    )
    facts = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        (F.col("o_orderkey") % 3 + 1).cast("int").alias("as_of_snap"),
    )
    j = facts.join(
        dim,
        (facts.o_custkey == dim.c_custkey)
        & (dim.valid_from <= facts.as_of_snap)
        & (facts.as_of_snap < F.coalesce(dim.valid_to, F.lit(2_147_483_647))),
    )
    return j.select(
        "o_orderkey", "o_custkey", "as_of_snap", "c_mktsegment", "c_acctbal"
    )


def q_semi_join_customers(spark, sf_dir):
    """LEFT SEMI join: customers having at least one high-value order
    (existence test — no row multiplication, no order columns leak)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


def q_anti_join_customers(spark, sf_dir):
    """LEFT ANTI join: customers with no orders at all (the complement
    existence test)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_acctbal"
    )


def q_left_join_null_fill(spark, sf_dir):
    """LEFT OUTER join + COALESCE: per-customer order counts with 0 (not
    NULL) for customers who never ordered."""
    c = _t(spark, sf_dir, "customer")
    agg = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )
    return (
        c.join(agg, c.c_custkey == agg.o_custkey, "left")
        .select(
            "c_custkey",
            F.coalesce("cnt", F.lit(0)).alias("n_orders"),
            F.coalesce("total", F.lit(0.0)).alias("total_spent"),
        )
    )


def q_topk_per_group(spark, sf_dir):
    """Window ranking: top 3 events by value per type (total order)."""
    e = _events(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), F.col("event_id"))
    return (
        e.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("event_type", "event_id", "value", "rank")
    )


def q_json_extract(spark, sf_dir):
    """JSON scalar extraction from the events props column."""
    e = _events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.select(k.alias("k_val"))
        .groupBy("k_val")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_window_agg_events(spark, sf_dir):
    """Tumbling 1-hour event-time windows (batch twin of the streaming
    aggregate); window boundaries exported as epoch seconds."""
    e = _events(spark, sf_dir)
    agg = windowed_event_counts_batch(e, "1 hour")
    return agg.select(
        F.col("window_start").cast("long").alias("ws_epoch"),
        "event_type",
        "n_events",
        "sum_value",
    )


def q_sliding_window_events(spark, sf_dir):
    """Sliding 2h/1h windows — each event lands in two windows."""
    e = _events(spark, sf_dir)
    agg = windowed_event_counts_batch(e, "2 hours", "1 hour")
    return agg.select(
        F.col("window_start").cast("long").alias("ws_epoch"),
        "event_type",
        "n_events",
        "sum_value",
    )


def q_sessionize(spark, sf_dir):
    """Gap-based sessionization (30 min), second-granularity contract."""
    e = _events(spark, sf_dir).withColumn(
        "ts", F.col("ts").cast("long").cast("timestamp")
    )
    s = sessionize_batch(e, gap_minutes=30)
    return s.select(
        "user_id",
        F.col("session_id").cast("long").alias("session_id"),
        F.col("session_start").cast("long").alias("session_start_epoch"),
        F.col("session_end").cast("long").alias("session_end_epoch"),
        "n_events",
    )


# --------------------------------------------------------------------------
# Extension operators: dedup / similarity / text / multimodal
# --------------------------------------------------------------------------


def q_asof_join(spark, sf_dir):
    """Point-in-time join: each order gains the customer's latest event at
    or before the order date (epoch-second granularity for cross-engine
    exactness; right side deduped to one row per (user, second))."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        # NTZ -> TIMESTAMP (session tz is pinned UTC) -> epoch seconds
        F.col("o_orderdate").cast("timestamp").cast("long").alias("order_epoch"),
    )
    e = _events(spark, sf_dir).select(
        F.col("user_id").alias("o_custkey"),
        F.col("ts").cast("long").alias("event_epoch"),
        "event_id",
        "value",
    )
    w = Window.partitionBy("o_custkey", "event_epoch").orderBy(F.desc("event_id"))
    e_uniq = e.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") == 1
    ).drop("__rn")
    joined = asof_join(
        o,
        e_uniq,
        on="o_custkey",
        left_ts="order_epoch",
        right_ts="event_epoch",
        right_cols=["event_id", "event_epoch", "value"],
    )
    return joined.select(
        "o_orderkey",
        "o_custkey",
        "order_epoch",
        F.col("event_id").alias("last_event_id"),
        F.col("event_epoch").alias("last_event_epoch"),
        F.round("value", 2).alias("last_event_value"),
    )


def q_asof_join_forward(spark, sf_dir):
    """FORWARD point-in-time join: each order gains the customer's FIRST
    event at or after the order date — the "what happened next" mirror of
    `asof_join` (label-lookahead joins, next-tick attribution).  Same
    union + single-window idiom, frame reversed; one shuffle on the key,
    no range-join blowup."""
    from parquet_merger_spark.operators.asof import asof_join_forward

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.col("o_orderdate").cast("timestamp").cast("long").alias("order_epoch"),
    )
    e = _events(spark, sf_dir).select(
        F.col("user_id").alias("o_custkey"),
        F.col("ts").cast("long").alias("event_epoch"),
        "event_id",
        "value",
    )
    # unique per (user, second): the smallest event_id wins (forward scan
    # reads "the first thing that happened"), mirroring asof_join's dedup
    w = Window.partitionBy("o_custkey", "event_epoch").orderBy("event_id")
    e_uniq = e.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") == 1
    ).drop("__rn")
    joined = asof_join_forward(
        o,
        e_uniq,
        on="o_custkey",
        left_ts="order_epoch",
        right_ts="event_epoch",
        right_cols=["event_id", "event_epoch", "value"],
    )
    return joined.select(
        "o_orderkey",
        "o_custkey",
        "order_epoch",
        F.col("event_id").alias("next_event_id"),
        F.col("event_epoch").alias("next_event_epoch"),
        F.round("value", 2).alias("next_event_value"),
    )


def q_twap_user(spark, sf_dir):
    """TIME-WEIGHTED average value per user (TWAP): each event's value
    holds until the user's next event; the mean weighs values by their
    holding duration, not their count — the standard fix for
    irregularly-sampled series (a price quoted for 10 h must count 600x
    a 1-minute blip).  Exactness: integer cents x integer seconds sum
    exactly; the final division runs once on identical IEEE doubles.
    One shuffle on user_id (window + aggregate share it); ties at the
    same second are total-ordered by event_id so zero-duration rows are
    deterministic."""
    e = _events(spark, sf_dir).select(
        "user_id",
        F.col("ts").cast("long").alias("t"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    d = e.withColumn("dur", F.lead("t").over(w) - F.col("t")).filter(
        F.col("dur").isNotNull()
    )
    agg = d.groupBy("user_id").agg(
        F.count("*").alias("n_holds"),
        F.sum("dur").alias("held_seconds"),
        F.sum(F.col("cents") * F.col("dur")).alias("__swd"),
    )
    return agg.filter(F.col("held_seconds") > 0).select(
        "user_id",
        "n_holds",
        "held_seconds",
        F.round(
            F.col("__swd") / (F.col("held_seconds") * 100.0), 6
        ).alias("twap"),
    )


def q_sample_stratified(spark, sf_dir):
    """Reproducible stratified sampling: per-language keep fractions (the
    corpus-mixture knob), hash-gated so membership is partition- and
    run-independent.  Uses the portable gate so DuckDB verifies the exact
    member set, not just counts."""
    d = _t(spark, sf_dir, "documents")
    sampled = deterministic_sample(
        d,
        id_col="doc_id",
        strata_col="lang",
        fractions={"en": 0.1, "fr": 0.5, "de": 0.5, "es": 0.5, "zh": 0.25},
        gate=portable_hash_gate(F.col("doc_id"), salt=7),
    )
    return sampled.select("doc_id", "lang")


def q_mixture_sample(spark, sf_dir):
    """Budget-driven corpus mixing: 20k-token budget at en/fr/de/es =
    50/20/15/15 parts; per-language keep fractions derive from actual
    token mass (capped at 1 for low-resource strata).  Portable gate so
    DuckDB verifies the exact member set."""
    from parquet_merger_spark.operators.sampling import mixture_sample

    d = _t(spark, sf_dir, "documents").withColumn(
        "n_tokens", F.size(F.split("text", " ")).cast("long")
    )
    kept = mixture_sample(
        d,
        budget_tokens=20_000,
        weight_parts={"en": 50, "fr": 20, "de": 15, "es": 15},
        gate=portable_hash_gate(F.col("doc_id"), salt=11),
    )
    return kept.select("doc_id", "lang", "n_tokens")


def q_decontaminate(spark, sf_dir):
    """Train/eval decontamination report: cross-split pairs sharing >= 5
    distinct word 3-grams (sources src0-src9 act as the train split).
    One pass, one shuffle for the df cap (see ngram_contamination) — the
    r02 review's run-to-run variance traced to the cap's double
    consumption of the gram-build lineage, fixed in the operator."""
    d = _t(spark, sf_dir, "documents")
    is_train = F.col("source").isin([f"src{i}" for i in range(10)])
    return ngram_contamination(
        d.filter(is_train), d.filter(~is_train), shingle_words=3, min_shared=5
    )


def q_decontaminate_indexed(spark, sf_dir):
    """Same report through the PRODUCTION shape: the train-gram inverted
    index is persisted once per (application, sf_dir) by
    ``write_gram_index`` and probed thereafter — at 100 TB the index is
    built once over the train corpus and probed per eval-set release,
    never rebuilding the corpus-wide gram table.  Result is identical to
    ``decontaminate`` (same oracle), certifying the round-trip."""
    from parquet_merger_spark.operators.dedup import (
        contamination_probe,
        load_gram_index,
        write_gram_index,
    )

    d = _t(spark, sf_dir, "documents")
    is_train = F.col("source").isin([f"src{i}" for i in range(10)])
    idx = _scratch_dir(
        spark, f"gram_index_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    # gate on the LAST artifact the writer produces (meta/ follows
    # grams/): a crash between the two writes must trigger a rebuild,
    # not a permanently half-built index
    if not os.path.exists(os.path.join(idx, "meta", "_SUCCESS")):
        write_gram_index(d.filter(is_train), idx, shingle_words=3)
    grams, sw = load_gram_index(spark, idx)
    return contamination_probe(
        grams, d.filter(~is_train), shingle_words=sw, min_shared=5
    )


def q_chunk_documents(spark, sf_dir):
    """Context-window chunking: 64-token chunks with 8-token overlap."""
    from parquet_merger_spark.operators.chunking import chunk_documents

    d = _t(spark, sf_dir, "documents")
    return chunk_documents(d, chunk_tokens=64, overlap=8)


def q_pack_sequences(spark, sf_dir):
    """Per-language sequence packing into 2048-token bins (offset-based
    contract; shard = lang so packing parallelizes per mixture stratum)."""
    from parquet_merger_spark.operators.chunking import pack_sequences

    d = _t(spark, sf_dir, "documents")
    with_tokens = d.select(
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    packed = pack_sequences(
        with_tokens, budget_tokens=2048, shard_col="lang"
    )
    return packed.select("doc_id", "lang", "n_tokens", "bin_id")


def q_user_event_profile(spark, sf_dir):
    """Array-aggregation family: per-user sorted distinct event types,
    exported as CSV-joined string (cross-engine-stable representation of
    an array value) + distinct count."""
    e = _events(spark, sf_dir)
    return e.groupBy("user_id").agg(
        F.array_join(F.sort_array(F.collect_set("event_type")), ",").alias("types_csv"),
        F.count_distinct("event_type").alias("n_types"),
    )


def q_daily_order_stats(spark, sf_dir):
    """Datetime function family: date_trunc to day + ISO day-of-week,
    grouped counts and revenue."""
    o = _t(spark, sf_dir, "orders")
    day = F.date_trunc("day", F.col("o_orderdate").cast("timestamp"))
    return (
        o.withColumn("day_epoch", day.cast("long"))
        # weekday() is 0=Monday..6=Sunday; +1 gives true ISO-8601 dow
        # (dayofweek() would be 1=Sunday — not ISO despite the old label)
        .withColumn("iso_dow", F.weekday(day) + 1)
        .groupBy("day_epoch", "iso_dow")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


def q_event_percentiles(spark, sf_dir):
    """Exact percentiles (p50/p90/p99) of event value per type — linear
    interpolation, deterministic (both engines implement R type-7)."""
    e = _events(spark, sf_dir)
    pct = F.percentile("value", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    return (
        e.groupBy("event_type")
        .agg(pct.alias("p"))
        .select(
            "event_type",
            F.round(F.col("p")[0], 6).alias("p50"),
            F.round(F.col("p")[1], 6).alias("p90"),
            F.round(F.col("p")[2], 6).alias("p99"),
        )
    )


def q_sketch_stats(spark, sf_dir):
    """Sketch-based aggregates per event type: HyperLogLog++ distinct
    users (rsd=0.01) and T-Digest-style approximate percentiles —
    the single-pass, fixed-memory path for 100 TB cardinality/quantile
    questions (exact distinct shuffles every key; a sketch is O(kb) per
    group and merges associatively across partitions, so the combine is
    map-side).  Rows-only: sketch internals differ across engines by
    design; tests/test_recall.py bounds both against the exact answers
    (HLL within its 1% rsd envelope, approx percentile within rank
    tolerance)."""
    e = _events(spark, sf_dir)
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
        F.round(
            F.percentile_approx("value", F.lit(0.5), F.lit(10_000)), 6
        ).alias("p50_approx"),
        F.count(F.lit(1)).alias("n_events"),
    )


def q_rollup_revenue(spark, sf_dir):
    """ROLLUP aggregation (year, priority) -> subtotals + grand total —
    the grouping-sets family the reference lacks entirely."""
    o = _t(spark, sf_dir, "orders").withColumn("yr", F.year("o_orderdate"))
    return (
        o.rollup("yr", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .select("yr", "o_orderpriority", "n_orders", "revenue")
    )


def q_text_tfidf(spark, sf_dir):
    """Top-5 tf-idf terms per document (linear idf: exact integer ratio,
    bit-stable across engines; see tfidf_top_terms)."""
    d = _t(spark, sf_dir, "documents")
    return tfidf_top_terms(d, k=5)


def q_dedup_exact(spark, sf_dir):
    """Exact dedup: earliest order per customer survives."""
    o = _t(spark, sf_dir, "orders")
    return exact_dedup(o, ["o_custkey"], "o_orderkey").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


def q_dedup_ngram_jaccard(spark, sf_dir):
    """Exact word-2-gram Jaccard near-dup pairs (threshold 0.8).

    VERIFICATION TIER: the exact ground truth the approximate paths
    (minhash_lsh) are recall-bounded against; at 100 TB this runs on LSH
    candidates or audit samples, not the full corpus — the headline
    near-dup entry is dedup_minhash_lsh."""
    d = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, shingle_words=2, threshold=0.8)
    return pairs.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def q_dup_passages(spark, sf_dir):
    """Duplicate-PASSAGE coverage per document (Lee et al. 2021-style
    exact-substring dedup signal at word-5-gram granularity): the fraction
    of each document's token positions covered by a 5-gram that also
    occurs in some OTHER document.  The trim/drop signal for partially
    duplicated documents — near-dup pair operators can't see a boilerplate
    paragraph shared by thousands of otherwise-distinct pages.

    Scale: positional gram hashes (longs), one groupBy + one join on the
    gram key (min!=max instead of count-distinct), O(total grams)."""
    d = _t(spark, sf_dir, "documents")
    return dup_passage_coverage(d, k=5)


def q_dedup_containment(spark, sf_dir):
    """Directional containment near-dup pairs C(A->B) = |A&B|/|A| >= 0.6
    on word-3-gram sets — catches quote/excerpt subset relationships that
    Jaccard structurally misses (a doc fully contained in a 100x longer
    one has Jaccard ~0.01 but containment 1.0).

    VERIFICATION TIER like dedup_ngram_jaccard: probe-side rarity-prefix
    filter (asymmetric PPJoin) + size filter keep the candidate join
    subquadratic; at 100 TB run on LSH candidates or audit samples."""
    d = _t(spark, sf_dir, "documents")
    return containment_pairs(d, shingle_words=3, threshold=0.6)


def q_dedup_clusters(spark, sf_dir):
    """Near-dup PAIR -> CLUSTER resolution: connected components over the
    exact Jaccard pairs (t=0.8); cluster_id = smallest member id.  The
    step every dedup pipeline needs between pair generation and document
    dropping (pairs alone over-delete transitive groups)."""
    d = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, shingle_words=2, threshold=0.8)
    return dup_clusters(pairs)


def q_dedup_survivors(spark, sf_dir):
    """The dedup ACTION: documents surviving near-dedup = untouched docs +
    one canonical (smallest-id) doc per cluster."""
    d = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, shingle_words=2, threshold=0.8)
    return near_dedup_survivors(d, pairs).select("doc_id", "n_chars")


def q_dedup_survivors_longest(spark, sf_dir):
    """Survivor-POLICY dedup: per near-dup cluster keep the LONGEST
    member (most complete copy; ties by smallest id) instead of the
    smallest id — the policy production pipelines actually run.  Same
    cluster resolution as dedup_survivors; the policy is one window over
    cluster members only."""
    from parquet_merger_spark.operators.dedup import near_dedup_survivors_by

    d = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, shingle_words=2, threshold=0.8)
    return near_dedup_survivors_by(
        d, pairs, order_by=[F.desc("n_chars")]
    ).select("doc_id", "n_chars")


def q_dedup_minhash_lsh(spark, sf_dir):
    """MinHash-LSH near-dup pairs — rows-only (xxhash64 has no DuckDB
    equivalent); deterministic across runs.  THE headline near-dup path:
    cost O(docs x bands), recall bounded against the exact tier in
    tests/test_recall.py."""
    d = _t(spark, sf_dir, "documents")
    # 64 hashes / 16 bands -> r=4: S-curve inflection (1/16)^(1/4) = 0.5
    # sits exactly at the threshold; steep enough that j~0.2-0.3 pairs
    # don't flood the candidate verification (see minhash_lsh_pairs doc)
    pairs = minhash_lsh_pairs(d, num_hashes=64, bands=16, threshold=0.5)
    return pairs.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def q_dedup_simhash(spark, sf_dir):
    """SimHash near-dup pairs (hamming <= 3) — rows-only."""
    d = _t(spark, sf_dir, "documents")
    return simhash_near_dup_pairs(d, max_hamming=3)


def q_dedup_embedding_cosine(spark, sf_dir):
    """Embedding near-dup pairs: quantized cosine >= 0.4 over all pairs."""
    e = _t(spark, sf_dir, "embeddings")
    return cosine_near_dup_pairs(e, threshold=0.4)


def q_simsearch_topk(spark, sf_dir):
    """Brute-force cosine top-10 for query vectors vec_id < 5."""
    e = _t(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5).withColumnRenamed("vec_id", "query_id")
    return brute_force_topk(e, queries, k=10)


def q_knn_graph(spark, sf_dir):
    """Exact kNN graph (k=5) over the embeddings table via the blocked
    integer GEMM with per-tile top-k candidate pruning — the SemDeDup /
    diversity-sampling primitive.  Shuffle O(n*k*n_blocks), never O(n^2)."""
    from parquet_merger_spark.operators.simsearch import knn_graph

    e = _t(spark, sf_dir, "embeddings")
    return knn_graph(e, k=5)


def q_semdedup(spark, sf_dir):
    """SemDeDup semantic dedup: kNN graph (k=5) -> cosine >= 0.4 edges
    -> connected components -> smallest-id survivor per semantic
    cluster; one row per input vector with (cluster_id, is_survivor).
    AUTO-TIERED (r07): at or under the documented 100k-row cutoff —
    every oracle fixture — this is the exact blocked-GEMM tier the
    DuckDB oracle certifies; above it (sf >= ~2 for this table) the SAME
    key runs the IVF-semantic-block ANN arm, the 100 TB default, whose
    recall is pinned in tests/test_round7_fixes.py and whose wall is
    the SCALING artifact's ann row."""
    from parquet_merger_spark.operators.dedup import semdedup

    e = _t(spark, sf_dir, "embeddings")
    return semdedup(e, threshold=0.4, k=5)


def q_simsearch_ivf(spark, sf_dir):
    """IVF-bucketed approximate top-10 — rows-only (deterministic
    kmeans-refined centroids; approximate by design).  nprobe=4/nlist=16 with
    2-way corpus assignment scans ~50% of the brute-force pair space for ~0.74 recall (bounded in tests/test_recall.py)."""
    e = _t(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5).withColumnRenamed("vec_id", "query_id")
    return ivf_topk(e, queries, k=10, nlist=16, nprobe=4, corpus_assign=2)


def q_simsearch_pq(spark, sf_dir):
    """Product-quantization ANN (FAISS-style IVF-PQ building block), two
    stage: ADC scan over 16-byte codes (16x compression — at 100 TB the
    code table is the only thing scanned), then exact rerank of the
    50-candidate shortlist (touches original vectors for 50 rows/query
    via equi-join).  Rows-only: xxhash64-seeded codebooks have no DuckDB
    twin; recall bounds (ADC >= 0.55, reranked >= 0.90 at sf0.01) in
    tests/test_recall.py."""
    from parquet_merger_spark.operators.simsearch import (
        pq_encode,
        pq_topk,
        train_pq_codebooks,
    )

    e = _t(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5).withColumnRenamed("vec_id", "query_id")
    books = train_pq_codebooks(e, m=32, n_codes=16, iters=1)
    enc = pq_encode(e, books)
    return pq_topk(enc, queries, books, k=10, rerank=e, shortlist=50)


def q_simsearch_ivf_indexed(spark, sf_dir):
    """The SAME approximate top-10 as ``simsearch_ivf`` probed from the
    PERSISTED IVF index (``write_ivf_index``/``load_ivf_index``): built
    once per (application, sf_dir) — centroids table + corpus
    hive-partitioned by bucket, so each probe's ``bucket IN (...)``
    prunes to nprobe/nlist of the files — then probe-many.  The
    steady-state number the ANN family should be judged on at 100 TB;
    the in-query twin keeps showing the build-inclusive cost.
    Deterministic (same seeded centroids), so the driver's rows-only
    check holds; identity with the in-query path is pinned in
    tests/test_recall.py."""
    from parquet_merger_spark.operators.simsearch import (
        ivf_topk,
        load_ivf_index,
        write_ivf_index,
    )

    e = _t(spark, sf_dir, "embeddings")
    idx = _scratch_dir(
        spark, f"ivf_index_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    # vectors/ is written after centroids/ — gate on the LAST artifact so
    # a crash mid-build triggers a rebuild instead of a half-index
    if not os.path.exists(os.path.join(idx, "vectors", "_SUCCESS")):
        write_ivf_index(e, idx, nlist=16, corpus_assign=2)
    queries = e.filter(F.col("vec_id") < 5).withColumnRenamed("vec_id", "query_id")
    return ivf_topk(
        e, queries, k=10, nlist=16, nprobe=4,
        index=load_ivf_index(spark, idx),
    )


def q_simsearch_pq_indexed(spark, sf_dir):
    """The SAME PQ ANN as ``simsearch_pq`` probed from the PERSISTED
    index (``write_pq_index``/``load_pq_index``): codebooks + 16-byte
    codes built once per (application, sf_dir), then ADC scan + exact
    rerank against the original vectors.  At 100 TB only the code table
    (~16x smaller than the corpus) is scanned per probe and the training
    cost is amortized to zero — the steady-state ANN number."""
    from parquet_merger_spark.operators.simsearch import (
        load_pq_index,
        pq_topk,
        write_pq_index,
    )

    e = _t(spark, sf_dir, "embeddings")
    idx = _scratch_dir(
        spark, f"pq_index_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    if not os.path.exists(os.path.join(idx, "codes", "_SUCCESS")):
        write_pq_index(e, idx, m=32, n_codes=16, iters=1)
    books, codes = load_pq_index(spark, idx)
    queries = e.filter(F.col("vec_id") < 5).withColumnRenamed("vec_id", "query_id")
    return pq_topk(codes, queries, books, k=10, rerank=e, shortlist=50)


def q_text_token_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    stats = with_text_stats(d)
    return stats.select(
        "doc_id",
        F.col("n_chars").alias("chars_computed"),
        "n_tokens",
        "n_tokens_bpe",
        F.round("avg_token_len", 6).alias("avg_token_len"),
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        F.round("punct_ratio", 6).alias("punct_ratio"),
    )


def q_text_quality(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return quality_score(d).select("doc_id", "quality")


def q_text_langid(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    scored = language_scores(d)
    return scored.select(
        "doc_id", "hits_en", "hits_fr", "hits_de", "hits_es", "predicted_lang"
    )


def q_text_fingerprint(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return fingerprint(d).select("doc_id", "fingerprint")


def q_multimodal_meta(spark, sf_dir):
    """Binary-payload metadata via the Arrow/mapInPandas multimodal path."""
    d = _t(spark, sf_dir, "documents")
    with_payload = attach_binary_payload(d, "text")
    return extract_payload_meta(with_payload, "payload", "doc_id")


def q_multimodal_decode(spark, sf_dir):
    """REAL image decode through the driver contract: 48 genuine PNG
    payloads (synthesized deterministically with the engine's pure-Python
    encoder) flow through the Arrow-batched ``decode_image`` mapInPandas
    pipeline — actual IHDR dimensions and zlib-inflated pixels, not the
    fake-decoder fallback (heights/widths vary 3-7 x 2-8 and must match
    the encoded shapes exactly).  Rows-only: binary payloads have no SQL
    twin; determinism is pinned by the double-run check and the
    bit-fixed synthesis -> parse path."""
    import numpy as np

    from parquet_merger_spark.operators.multimodal import (
        decode_image,
        encode_png_rgb,
    )

    rows = []
    for i in range(48):
        h, w = 3 + (i % 5), 2 + (i % 7)
        base = np.arange(h * w * 3, dtype=np.int64)
        arr = ((base * (i + 7)) % 256).astype(np.uint8).reshape(h, w, 3)
        rows.append((i, bytearray(encode_png_rgb(arr))))
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    dec = decode_image(media, thumb_side=2)
    return dec.select(
        "doc_id",
        "height",
        "width",
        "channels",
        F.round(
            F.aggregate("thumb", F.lit(0.0), lambda a, x: a + x), 6
        ).alias("thumb_sum"),
    )


def q_multimodal_audio_decode(spark, sf_dir):
    """REAL audio decode through the driver contract: 32 genuine RIFF/WAVE
    PCM16 payloads (engine's own stdlib encoder, deterministic sine-ish
    integer waveforms) flow through the Arrow-batched ``decode_audio``
    pipeline — true fmt-chunk sample rates and inflated sample counts,
    not the fake fallback.  Rows-only like `multimodal_decode`."""
    import numpy as np

    from parquet_merger_spark.operators.multimodal import (
        decode_audio,
        encode_wav_pcm16,
    )

    rows = []
    for i in range(32):
        n = 40 + 8 * (i % 5)
        rate = 8_000 * (1 + i % 3)
        # k/64 grid: exact on the encoder's k/32768 round-to-nearest grid
        wave = (((np.arange(n, dtype=np.int64) * (i + 3)) % 129) - 64) / 64.0
        rows.append((i, bytearray(encode_wav_pcm16(wave, rate))))
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    dec = decode_audio(media, max_samples=8)
    return dec.select(
        "doc_id",
        "sample_rate",
        "n_samples",
        F.round(
            F.aggregate("waveform", F.lit(0.0), lambda a, x: a + x), 4
        ).alias("wave_sum"),
    )


def q_stream_dedup(spark, sf_dir):
    """STREAMING at-least-once dedup driven end-to-end: events replay in
    three time-ordered micro-batches, each followed by a RE-DELIVERY
    batch repeating a fifth of its rows; ``dropDuplicatesWithinWatermark``
    must emit every event exactly once (first sight emits immediately;
    re-deliveries are dropped by dedup state while within the watermark
    and by the late-data filter beyond it — either way, never twice).
    Oracle = the plain events projection: exactly-once delivery IS the
    equality with the batch relation."""
    import shutil
    import uuid

    from parquet_merger_spark.streaming.events import streaming_distinct_events

    base = _scratch_dir(spark, "stream_dedup")
    shutil.rmtree(base, ignore_errors=True)

    e = _events(spark, sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    slices, lo, hi = _event_time_slices(e)
    replay = []
    for s in slices:
        replay.append(s)
        replay.append(s.filter(F.col("event_id") % 5 == 0))  # re-delivery
    src = _write_replay_batches(base, replay)

    name = f"sdd_{uuid.uuid4().hex[:8]}"
    q = streaming_distinct_events(
        spark, src, os.path.join(base, "ckpt"), key_cols=["event_id"],
        watermark="2 hours", query_name=name,
    )
    _drain_stream(q, "stream_dedup")
    return spark.table(name).select(
        "event_id",
        F.col("ts").cast("long").alias("ts_epoch"),
        "user_id",
        "event_type",
        F.round("value", 2).alias("value_r"),
    )


def q_stream_enrich(spark, sf_dir):
    """STREAM-STATIC enrichment driven end-to-end: events replay in three
    mtime-pinned micro-batches and each batch broadcast-joins the static
    customer dimension as it arrives (STATELESS — no watermark, no join
    state; rows emit immediately in append mode, so no sentinel needed).
    Oracle = the one-shot batch join: stream-static equality IS the
    enrichment contract."""
    import shutil
    import uuid

    from parquet_merger_spark.streaming.events import enrich_stream

    base = _scratch_dir(spark, "stream_enrich")
    shutil.rmtree(base, ignore_errors=True)

    e = _events(spark, sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    src = _write_replay_batches(
        base, [e.filter(F.col("event_id") % 3 == i) for i in range(3)]
    )
    dim = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment", "c_nationkey"
    )

    name = f"sen_{uuid.uuid4().hex[:8]}"
    q = enrich_stream(
        spark, src, dim, os.path.join(base, "ckpt"),
        key="user_id", query_name=name,
    )
    _drain_stream(q, "stream_enrich")
    return spark.table(name).select(
        "event_id",
        "user_id",
        "event_type",
        "c_mktsegment",
        F.col("c_nationkey").cast("long").alias("c_nationkey"),
    )


def q_stream_upsert_history(spark, sf_dir):
    """TIME TRAVEL on the streaming MERGE table: replay the same three
    micro-batches as `stream_upsert`, then read the RETAINED MIDDLE
    version (v1 = after the re-pricing batch, before the inserts) —
    oracle recomputes that state from the raw table.  Certifies that
    batch-id-addressed versions are immutable history, not just a
    _CURRENT pointer."""
    import shutil

    from parquet_merger_spark.streaming.events import (
        read_upsert_table,
        stream_upsert_to_table,
    )

    base = _scratch_dir(spark, "stream_upsert_history")
    shutil.rmtree(base, ignore_errors=True)
    o, repriced, fresh = _upsert_fixture_frames(spark, sf_dir)
    src = _write_replay_batches(base, [o, repriced, fresh])

    table = os.path.join(base, "table")
    q = stream_upsert_to_table(
        spark, src, table, os.path.join(base, "ckpt"), ["o_orderkey"]
    )
    _drain_stream(q, "stream_upsert_history")
    return read_upsert_table(spark, table, version=1)


def q_multimodal_meta_expr(spark, sf_dir):
    """Same metadata via pure JVM expressions (whole-stage codegen, no
    Python round-trip) — the fast path when no decode is needed."""
    d = _t(spark, sf_dir, "documents")
    with_payload = attach_binary_payload(d, "text")
    return extract_payload_meta_expr(with_payload, "payload", "doc_id")


def q_session_window(spark, sf_dir):
    """Native session_window sessionization (the streaming-capable twin of
    sessionize), second-granularity contract; session_end = last + gap."""
    e = _events(spark, sf_dir).withColumn(
        "ts", F.col("ts").cast("long").cast("timestamp")
    )
    s = session_window_agg(e, gap_minutes=30)
    return s.select(
        "user_id",
        F.col("session_start").cast("long").alias("session_start_epoch"),
        F.col("session_end").cast("long").alias("session_end_epoch"),
        "n_events",
    )


def q_text_repetition(spark, sf_dir):
    """Gopher-style repetition quality signals (dup-token / top-token /
    top-bigram fractions) — row-local, shuffle-free."""
    d = _t(spark, sf_dir, "documents")
    return with_repetition_stats(d).select(
        "doc_id",
        "n_tokens",
        "n_distinct_tokens",
        "dup_token_frac",
        "top_token_frac",
        "top_bigram_frac",
    )


def q_skew_salted_join(spark, sf_dir):
    """Skew-safe SALTED equi-join as an oracle-checked contract key: the
    orders side is salted into 8 deterministic sub-keys and the customer
    dim replicated once per salt, so a hot customer's rows spread over 8
    tasks instead of one straggler.  The oracle is the PLAIN join — the
    whole point of salting is output-invariance, and the hash equality
    certifies it end-to-end (exact integer-cents rollup per segment).
    Use when skew is known up front and a statically-planned pipeline
    can't rely on AQE's runtime skew split."""
    from parquet_merger_spark.operators.ranking import salted_join

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    j = salted_join(
        o, c, ["o_custkey"], salt_from=F.xxhash64("o_orderkey"), n_salts=8
    )
    return (
        j.withColumn("cents", F.round(F.col("o_totalprice") * 100, 0).cast("long"))
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("cents").alias("revenue_cents"),
        )
    )


def q_keyness_terms(spark, sf_dir):
    """Per-source DISTINCTIVE terms (corpus keyness): for every source,
    the top-5 terms by integer lift_ppm ~ 1e6 * P(term|source) / P(term),
    with a tf >= 5 noise floor.  The domain-signature signal a
    mixture-building pipeline uses to characterize and weight sources —
    log-odds keyness with the log dropped so the statistic stays EXACT
    integer arithmetic (bit-stable across engines).

    Overflow discipline (ANSI mode makes BIGINT overflow a hard error):
    the single-expression form ``tf * total * 1e6 DIV (src * corp)``
    blows past 2^63 once tf * total > 9.2e12 — reached by any stopword
    in a ~1e10-token corpus.  So the ratio is computed in two bounded
    ppm steps: ``share_ppm = tf*1e6 DIV src_tokens`` (<= 1e6),
    ``corpus_ppm = max(1, tf_corpus*1e6 DIV total)`` (<= 1e6, floored at
    1 so sub-ppm-rare terms don't divide by zero), ``lift_ppm =
    share_ppm*1e6 DIV corpus_ppm`` (<= 1e12).  Every intermediate is
    <= max(tf, tf_corpus) * 1e6 — safe until a single term exceeds
    ~9.2e12 occurrences (ONE term's count, not the corpus size; switch
    the literals to DECIMAL beyond that).  The two-step floor differs
    from the one-shot ratio by at most rounding granularity; both
    engines compute the identical formula.

    Scale: tf/totals are two chained aggregates over exploded tokens (one
    shuffle each on (source,term) then term); the 1-row corpus total and
    the per-source totals broadcast back; ranking is a per-source top-5
    window over the small tf>=5 survivor set.  All integer sums —
    associative, partition-order-free."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select("source", F.explode(F.split("text", " ")).alias("term"))
    tf = tok.groupBy("source", "term").agg(F.count("*").alias("tf"))
    tot = tf.groupBy("source").agg(F.sum("tf").alias("src_tokens"))
    corp = tf.groupBy("term").agg(F.sum("tf").alias("tf_corpus"))
    total = tf.agg(F.sum("tf").alias("total_tokens"))
    ranked = (
        tf.filter(F.col("tf") >= 5)
        .join(F.broadcast(tot), "source")
        .join(corp, "term")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "lift_ppm",
            F.expr(
                "((tf * CAST(1000000 AS BIGINT)) DIV src_tokens"
                " * CAST(1000000 AS BIGINT))"
                " DIV greatest(CAST(1 AS BIGINT),"
                "              (tf_corpus * CAST(1000000 AS BIGINT))"
                "              DIV total_tokens)"
            ),
        )
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("source").orderBy(
                    F.col("lift_ppm").desc(), F.col("tf").desc(), "term"
                )
            ),
        )
        .filter(F.col("rank") <= 5)
    )
    return ranked.select(
        "source", "term", "tf", "lift_ppm", F.col("rank").cast("long").alias("rank")
    )


def q_url_functions(spark, sf_dir):
    """URL curation scalar family over deterministically synthesized URLs:
    parse host / path / query-parameter (Spark ``parse_url``), registered
    domain, and tracking-parameter stripping — the normalize-before-dedup
    step every web-crawl pipeline runs.  Row-local JVM expressions, zero
    shuffle; the DuckDB oracle rebuilds each part with RE2 regexes."""
    d = _t(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    url = F.concat(
        F.lit("https://www."), F.col("source"), F.lit(".example.com/docs/"),
        F.col("lang"), F.lit("/"), sid,
        F.lit("?utm_source=feed&id="), sid,
        F.lit("&ref=r"), (F.col("doc_id") % 7).cast("string"),
    )
    u = d.select("doc_id", url.alias("url"))
    host = F.parse_url("url", F.lit("HOST"))
    return u.select(
        "doc_id",
        "url",
        host.alias("host"),
        F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1).alias("domain"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("id")).alias("query_id"),
        F.regexp_replace("url", r"utm_[a-z]+=[^&]*&", "").alias("clean_url"),
    )


def q_sql_group_by_all(spark, sf_dir):
    """SQL front-end: GROUP BY ALL (Spark 3.4+/DuckDB shared dialect) —
    every non-aggregate select item becomes a grouping key.  Quantities
    summed as exact BIGINT (integral-valued in the fixture) so the rollup
    is partition-order-free."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(count(*) AS BIGINT) AS n,
               sum(CAST(l_quantity AS BIGINT)) AS sum_qty,
               CAST(max(l_discount) AS DOUBLE) AS max_disc
        FROM v_lineitem
        GROUP BY ALL
    """)


def q_embed_kmeans(spark, sf_dir):
    """Embedding k-means clustering surfaced as a first-class operator
    (the partitioner behind IVF and SemDeDup bucketing): 16 deterministic
    integer-Lloyd centroids, each vector assigned to its nearest, reduced
    to per-cluster (size, id-sum) fingerprints.  Rows-only key: kmeans has
    no SQL twin; determinism is pinned by the double-run contract check
    and the integer-sum Lloyd design (bit-stable across partitionings)."""
    from parquet_merger_spark.operators.simsearch import (
        assign_buckets,
        build_ivf_centroids,
    )

    emb = _t(spark, sf_dir, "embeddings")
    centroids = build_ivf_centroids(emb, nlist=16, iters=2)
    assigned = assign_buckets(emb, centroids, n_assign=1)
    return (
        assigned.groupBy("bucket")
        .agg(
            F.count("*").alias("n_vecs"),
            F.sum("vec_id").alias("id_sum"),
        )
        .select(
            F.col("bucket").cast("long").alias("cluster_id"), "n_vecs", "id_sum"
        )
    )


def q_pii_redact(spark, sf_dir):
    """PII scrub pass (emails / IPv4 / phone patterns): match counts on the
    original text plus the redacted text.  The synthetic corpus is
    PII-free, so the oracle certifies the no-op path end-to-end; crafted
    positive cases are unit-tested (tests/test_textstats_ext.py)."""
    d = _t(spark, sf_dir, "documents")
    return redact_pii(d).select(
        "doc_id", "n_emails", "n_ipv4", "n_phones", "text_redacted"
    )


def q_curate_corpus(spark, sf_dir):
    """Composed pre-training curation pass: quality + language +
    repetition gates, PII-redacted survivors — one scan, zero shuffles
    (the whole pass is a single narrow stage at any corpus size)."""
    from parquet_merger_spark.operators.curation import curate_corpus

    d = _t(spark, sf_dir, "documents")
    return curate_corpus(d)


def q_source_cap(spark, sf_dir):
    """Per-source document cap (at most 10 docs per source, hash-ordered
    deterministic selection) via the skew-safe two-phase top-k."""
    d = _t(spark, sf_dir, "documents")
    return cap_per_group(
        d,
        "source",
        cap=10,
        id_col="doc_id",
        gate=portable_hash_gate(F.col("doc_id")),
    ).select("source", "doc_id", "rank")


def q_embed_normalize(spark, sf_dir):
    """L2-normalize + int8-grid quantization of the embedding column,
    exploded to (vec_id, pos, q_unit, norm_q) scalar rows."""
    e = _t(spark, sf_dir, "embeddings")
    return normalize_quantize(e, "vec_id", "embedding")


def q_pivot_event_counts(spark, sf_dir):
    """Pivot: one row per user, one column per event type (fixed value
    list so the output schema is static), missing combinations = 0."""
    e = _events(spark, sf_dir)
    types = ["click", "error", "purchase", "signup", "view"]
    p = e.groupBy("user_id").pivot("event_type", types).count().na.fill(0)
    return p.select(
        "user_id", *[F.col(t).cast("long").alias(f"n_{t}") for t in types]
    )


def q_intersect_custkeys(spark, sf_dir):
    """INTERSECT (distinct set semantics): customers who ordered in BOTH
    1995 and 1996."""
    o = _t(spark, sf_dir, "orders")
    year = F.year(F.col("o_orderdate").cast("timestamp"))
    a = o.filter(year == 1995).select("o_custkey")
    b = o.filter(year == 1996).select("o_custkey")
    return a.intersect(b)


def q_except_custkeys(spark, sf_dir):
    """EXCEPT (distinct set semantics): customers who ordered in 1995 but
    not in 1996."""
    o = _t(spark, sf_dir, "orders")
    year = F.year(F.col("o_orderdate").cast("timestamp"))
    a = o.filter(year == 1995).select("o_custkey")
    b = o.filter(year == 1996).select("o_custkey")
    return a.subtract(b)


def q_csv_roundtrip(spark, sf_dir):
    """CSV sink+source round-trip through the engine's own exporter:
    write 200 typed orders rows (long/string/double/timestamp) via
    export_csv, read them back with an explicit schema and the same
    timestamp format, return the re-read frame.  Oracle = plain SELECT
    from the parquet table — hash equality certifies the text round-trip
    is LOSSLESS for every type family the reference renders (its CSV
    path stringifies all ~20 Arrow types, src/main.rs:739-826).

    Scale note: the write is Spark's parallel directory output (one file
    per task, no coalesce) and the read is a distributed CSV scan with a
    user schema — both sides scale with executors; schema inference is
    deliberately OFF (an inference pass re-reads the whole input)."""

    from parquet_merger_spark.operators.export import export_csv

    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 800).select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )
    out = _scratch_dir(spark, "csv_roundtrip")
    export_csv(o, out)
    back = spark.read.csv(
        out,
        header=True,
        schema="o_orderkey long, o_orderstatus string, o_totalprice double, o_orderdate timestamp",
        timestampFormat="yyyy-MM-dd'T'HH:mm:ss.SSS",
    )
    # epoch long for the driver compare (timestamp text formats differ
    # across engines); the parse above already exercised the type
    return back.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.col("o_orderdate").cast("long").alias("order_epoch"),
    )


def _upsert_fixture_frames(spark, sf_dir):
    """The shared upsert fixture: (base, repriced, fresh) order frames.
    THREE keys' oracles depend on these exact literals staying in sync
    (`upsert_orders`, `stream_upsert`, `stream_upsert_history`) — one
    definition, not three copies.  +1.5 not *1.1: double addition is the
    identical IEEE result in any engine, while round(x*1.1, 2) diverges
    on half-cent boundaries."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    repriced = o.filter(F.col("o_orderkey") % 10 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") + F.lit(1.5)
    )
    fresh = o.filter(F.col("o_orderkey") % 97 == 0).withColumn(
        "o_orderkey", F.col("o_orderkey") + 10_000_000
    )
    return o, repriced, fresh


def q_upsert_orders(spark, sf_dir):
    """Keyed upsert: a synthetic refresh batch (10% of orders re-priced
    +10%, plus new high-key rows) merged into the base — rows not in the
    batch pass through untouched.  One shuffle on the key; AQE broadcasts
    the (small) update key set."""
    from parquet_merger_spark.operators.incremental import upsert_by_key

    o, repriced, fresh = _upsert_fixture_frames(spark, sf_dir)
    updates = repriced.unionByName(fresh)
    return upsert_by_key(o, updates, ["o_orderkey"])


def _write_replay_batches(base: str, slices) -> str:
    """Serialize ``slices`` (a list of DataFrames) as mtime-pinned
    single-file micro-batches under ``base/src`` and return that dir.
    The file streaming source orders micro-batches by modification time,
    so pinning mtimes (one minute apart, fixed epoch) makes every replay
    sequence deterministic — the contract all four ``q_stream_*`` replay
    harnesses share."""
    import shutil

    src = os.path.join(base, "src")
    os.makedirs(src, exist_ok=True)
    for i, batch in enumerate(slices):
        stage = os.path.join(base, f"stage{i}")
        batch.coalesce(1).write.mode("overwrite").parquet(stage)
        part = next(
            f for f in sorted(os.listdir(stage)) if f.endswith(".parquet")
        )
        dst = os.path.join(src, f"{i:02d}.parquet")
        shutil.copy(os.path.join(stage, part), dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    return src


def q_stream_upsert(spark, sf_dir):
    """STREAMING keyed MERGE, driven end-to-end inside the contract: the
    same refresh semantics as ``upsert_orders`` (same oracle) but applied
    as a deterministic micro-batch SEQUENCE through
    :func:`streaming.events.stream_upsert_to_table` — base table arrives
    first, then the re-priced rows, then the new high-key rows, each as
    its own foreachBatch MERGE into the versioned parquet table; the
    result is the final ``_CURRENT`` table state.  Replay-deterministic:
    scratch dirs are wiped per call, file mtimes pin micro-batch order,
    and the update key sets are disjoint so sequential MERGE equals the
    one-shot batch upsert the oracle computes."""
    import shutil

    from parquet_merger_spark.streaming.events import (
        read_upsert_table,
        stream_upsert_to_table,
    )

    base = _scratch_dir(spark, "stream_upsert")
    shutil.rmtree(base, ignore_errors=True)
    o, repriced, fresh = _upsert_fixture_frames(spark, sf_dir)
    src = _write_replay_batches(base, [o, repriced, fresh])

    table = os.path.join(base, "table")
    q = stream_upsert_to_table(
        spark, src, table, os.path.join(base, "ckpt"), ["o_orderkey"]
    )
    _drain_stream(q, "stream_upsert")
    return read_upsert_table(spark, table)


def q_stream_near_dedup(spark, sf_dir):
    """STREAMING incremental near-dedup driven end-to-end: documents
    arrive in three mtime-pinned micro-batches (doc_id mod 3 splits) and
    :func:`streaming.events.stream_near_dedup_to_table` admits only text
    that near-duplicates nothing already accepted (MinHash-LSH band
    buckets as novelty keys).  Returns the accepted set (doc_id, lang,
    n_chars).  Rows-only: bucket novelty is arrival-order-dependent and
    xxhash64-seeded, so there is no SQL twin — the order is pinned, the
    hashes are deterministic, and the sequential-replay equivalence +
    replay idempotency are pinned in tests/test_streaming.py."""
    import shutil

    from parquet_merger_spark.streaming.events import (
        read_near_dedup_survivors,
        stream_near_dedup_to_table,
    )

    base = _scratch_dir(spark, "stream_near_dedup")
    shutil.rmtree(base, ignore_errors=True)

    d = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang", "n_chars")
    src = _write_replay_batches(
        base, [d.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    )

    table = os.path.join(base, "table")
    q = stream_near_dedup_to_table(
        spark, src, table, checkpoint_dir=os.path.join(base, "ckpt")
    )
    _drain_stream(q, "stream_near_dedup")
    return read_near_dedup_survivors(spark, table).select(
        "doc_id", "lang", "n_chars"
    )


def _event_time_slices(e):
    """Three contiguous event-time slices of ``e`` (time-ordered arrival:
    every event of slice k precedes slice k+1) — the replay contract the
    four event-time stream harnesses (window_agg, dedup, session_window,
    drift_cusum) share, and the property their watermark correctness
    rides on.  ONE definition of the boundary conditions (< / >=), so a
    boundary tweak cannot silently drop or duplicate edge events in just
    one key.  Returns (slices, lo, hi); the driver-side min/max action
    is harness file-staging, not query-build cost."""
    lo, hi = e.agg(F.min("ts"), F.max("ts")).first()
    span = (hi - lo) / 3
    bounds = [lo + span, lo + span + span]
    return [
        e.filter(F.col("ts") < bounds[0]),
        e.filter((F.col("ts") >= bounds[0]) & (F.col("ts") < bounds[1])),
        e.filter(F.col("ts") >= bounds[1]),
    ], lo, hi


def q_stream_window_agg(spark, sf_dir):
    """STREAMING tumbling-window aggregation driven end-to-end: events
    replay in three mtime-pinned micro-batches split by EVENT TIME (time-
    ordered arrival, so the 2 h watermark never drops a row), plus a
    far-future sentinel event whose watermark advance closes every real
    window; append mode then emits each window exactly once into the
    memory sink.  Result = the same rows as the batch twin
    (`window_agg_events`), certified by the SAME oracle — the equality
    "append-mode stream over ordered batches == one batch aggregate" is
    exactly the exactly-once window contract.

    Scale: state is bounded by windows-per-watermark-horizon x key
    cardinality; emitted windows evict.  The sentinel is the test-harness
    twin of a real feed's continuing event flow."""
    import shutil
    import uuid

    from parquet_merger_spark.streaming.events import (
        windowed_event_counts_stream,
    )

    base = _scratch_dir(spark, "stream_window_agg")
    shutil.rmtree(base, ignore_errors=True)

    e = _events(spark, sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    slices, lo, hi = _event_time_slices(e)
    slices = slices + [
        spark.createDataFrame(
            [(int(-1), hi + __import__("datetime").timedelta(days=30), int(-1),
              "__sentinel__", 0.0)],
            e.schema,
        ),
    ]
    src = _write_replay_batches(base, slices)

    name = f"swa_{uuid.uuid4().hex[:8]}"
    q = windowed_event_counts_stream(
        spark, src, os.path.join(base, "ckpt"),
        window="1 hour", watermark="2 hours",
        query_name=name, output_mode="append",
    )
    _drain_stream(q, "stream_window_agg")
    return (
        spark.table(name)
        .filter(F.col("event_type") != "__sentinel__")
        .select(
            F.col("window_start").cast("long").alias("ws_epoch"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def q_stream_session_window(spark, sf_dir):
    """STREAMING sessionization driven end-to-end: the native
    ``session_window`` aggregate over three time-ordered mtime-pinned
    micro-batches + a far-future sentinel that closes every real session
    (append mode emits each session exactly once, state evicts at the
    watermark).  Sessions spanning a micro-batch boundary MERGE in the
    state store — the semantics batch re-aggregation gets for free and
    streaming must actively implement; equality with the batch twin
    (`session_window`, SAME oracle) certifies exactly that."""
    import shutil
    import uuid

    from parquet_merger_spark.streaming.events import session_window_stream

    base = _scratch_dir(spark, "stream_session_window")
    shutil.rmtree(base, ignore_errors=True)

    # second-granularity ts BEFORE writing the replay files so the
    # streamed plan matches the batch `session_window` contract exactly
    e = (
        _events(spark, sf_dir)
        .withColumn("ts", F.col("ts").cast("long").cast("timestamp"))
        .select("event_id", "ts", "user_id", "event_type", "value")
    )
    slices, lo, hi = _event_time_slices(e)
    slices = slices + [
        spark.createDataFrame(
            [(int(-1), hi + __import__("datetime").timedelta(days=30), int(-1),
              "__sentinel__", 0.0)],
            e.schema,
        ),
    ]
    src = _write_replay_batches(base, slices)

    name = f"ssw_{uuid.uuid4().hex[:8]}"
    q = session_window_stream(
        spark, src, os.path.join(base, "ckpt"),
        gap_minutes=30, watermark="2 hours",
        query_name=name, output_mode="append",
    )
    _drain_stream(q, "stream_session_window")
    return (
        spark.table(name)
        .filter(F.col("user_id") != -1)
        .select(
            "user_id",
            F.col("session_start").cast("long").alias("session_start_epoch"),
            F.col("session_end").cast("long").alias("session_end_epoch"),
            "n_events",
        )
    )


def q_jsonl_roundtrip(spark, sf_dir):
    """JSON-lines sink + typed source round-trip: write 500 documents
    rows as JSONL (Spark's parallel directory write), read back with an
    explicit schema (inference OFF — an inference pass re-reads the whole
    input), hash-compare against the untouched parquet source."""

    d = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang", "n_chars")
    out = _scratch_dir(spark, "jsonl_roundtrip")
    d.write.mode("overwrite").json(out)
    return spark.read.json(
        out, schema="doc_id long, text string, lang string, n_chars long"
    )


def q_ingest_quarantine(spark, sf_dir):
    """Fault-tolerant JSONL ingestion (``sources/ingest.py``): serialize
    documents to JSON lines, truncate every 17th record in flight (the
    "partial upload" failure mode), ingest with
    :func:`read_jsonl_robust`, and return the VALID side.  Oracle = the
    source rows minus the corrupted keys — hash equality certifies that
    exactly the malformed records, and nothing else, were quarantined.

    Scale notes: serialization (``to_json`` over a struct) and the
    corruption predicate are row-local JVM expressions; the write is
    Spark's parallel text sink and the robust read is a distributed scan
    with a DECLARED schema (PERMISSIVE mode — no inference pass, no
    job-killing FAILFAST, no silent DROPMALFORMED)."""

    from parquet_merger_spark.sources.ingest import read_jsonl_robust

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    line = F.to_json(F.struct("doc_id", "lang", "n_chars"))
    out = _scratch_dir(spark, "ingest_quarantine")
    d.select(
        F.when(F.col("doc_id") % 17 == 0, F.substring(line, 1, 9))
        .otherwise(line)
        .alias("value")
    ).write.mode("overwrite").text(out)
    valid, _bad = read_jsonl_robust(
        spark, out, "doc_id long, lang string, n_chars long"
    )
    return valid


def q_merge_files_roundtrip(spark, sf_dir):
    """The core merge operator itself through the driver: write two
    overlapping projections of nation as parquet, merge with intersection
    semantics, return the merged frame.  Oracle-checked: the temp files
    are deterministic projections of nation, so DuckDB recomputes the
    expected intersection-union directly from the source table."""

    n = _t(spark, sf_dir, "nation")
    base = _scratch_dir(spark, "roundtrip")
    p_a, p_b = os.path.join(base, "a.parquet"), os.path.join(base, "b.parquet")
    n.select("n_nationkey", "n_name", "n_regionkey").write.mode("overwrite").parquet(p_a)
    n.filter(F.col("n_regionkey") == 0).select("n_nationkey", "n_name").write.mode(
        "overwrite"
    ).parquet(p_b)
    return merged_df(spark, [p_a, p_b])


def q_profile_table(spark, sf_dir):
    """One-pass data profile (`operators.profile.profile_table`): every
    column's rows/nulls/distinct/min/max from a single aggregate job
    (Catalyst plans the multi-distinct with one expand — no per-column
    scans).  Profiled columns restricted to int/string (float min/max
    string formatting is engine-specific)."""
    from parquet_merger_spark.operators.profile import profile_table

    c = _t(spark, sf_dir, "customer")
    return profile_table(c, ["c_custkey", "c_name", "c_nationkey", "c_mktsegment"])


def q_data_quality_report(spark, sf_dir):
    """Expectation checking (`operators.profile.check_expectations`):
    row rules evaluated in ONE conditional-count pass + a unique-key
    rule (one groupBy).  The report is the gate a 100 TB ingest runs
    before anything downstream trusts the batch."""
    from parquet_merger_spark.operators.profile import check_expectations

    o = _t(spark, sf_dir, "orders")
    return check_expectations(
        o,
        rules={
            "custkey_not_null": F.col("o_custkey").isNotNull(),
            "price_positive": F.col("o_totalprice") > 0,
            "price_below_cap": F.col("o_totalprice") <= 400_000,
            "status_known": F.col("o_orderstatus").isin("O", "F", "P"),
        },
        unique_keys={
            "orderkey_unique": ["o_orderkey"],
            "custkey_unique": ["o_custkey"],
        },
    )


def q_train_test_split(spark, sf_dir):
    """Deterministic train/val/test labeling
    (`operators.sampling.split_by_hash`): membership is a pure function
    of the id hash — reproducible across runs/engines/cluster sizes,
    stable under corpus growth, shuffle-free.  Uses the portable
    polynomial gate so DuckDB recomputes the identical assignment."""
    from parquet_merger_spark.operators.sampling import portable_hash_gate, split_by_hash

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return split_by_hash(
        d,
        {"train": 0.8, "val": 0.1, "test": 0.1},
        id_col="doc_id",
        gate=portable_hash_gate(F.col("doc_id")),
    )


def q_zorder_scan(spark, sf_dir):
    """Z-order layout + skipping (`operators.compaction.zorder_write`):
    orders written clustered on an interleaved-bit (Morton) key over
    (o_custkey, o_totalprice), then a range scan on the SECOND dimension
    prunes files via footer envelopes — the multi-dimension skipping a
    linear sort order can't give.  Oracle = the plain BETWEEN filter
    (skipping must never change semantics); per-dimension pruning
    effectiveness is asserted in tests/test_stats.py."""
    import glob as _glob

    from parquet_merger_spark.operators.compaction import zorder_write
    from parquet_merger_spark.sources.stats import skipping_scan

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    out = _scratch_dir(spark, "zorder")
    lo, hi, plo, phi = o.agg(
        F.min("o_custkey"), F.max("o_custkey"),
        F.min("o_totalprice"), F.max("o_totalprice"),
    ).collect()[0]
    zorder_write(
        o,
        out,
        {"o_custkey": (float(lo), float(hi)), "o_totalprice": (float(plo), float(phi))},
        n_files=8,
    )
    paths = sorted(_glob.glob(os.path.join(out, "*.parquet")))
    df, _kept = skipping_scan(spark, paths, "o_totalprice", 100_000.0, 150_000.0)
    return df


def q_price_histogram(spark, sf_dir):
    """Equal-width histogram (`operators.profile.numeric_histogram`):
    row-local bin assignment + one small groupBy.  Bin edges chosen so
    the width (600000/12 = 50000) is an exact double — identical IEEE
    arithmetic in both engines."""
    from parquet_merger_spark.operators.profile import numeric_histogram

    o = _t(spark, sf_dir, "orders")
    return numeric_histogram(o, "o_totalprice", n_bins=12, lo=0.0, hi=600_000.0)


def _snapshot_pair(spark, sf_dir):
    """The (old, new) orders snapshot pair (deletes %17, reprices %10
    +1.5, inserts %97 with keys shifted +10M) — ONE definition shared
    by q_snapshot_diff and q_cdc_apply: the round-trip law
    apply(old, diff(old, new)) == new only certifies anything if both
    keys operate on byte-identical snapshots."""
    old = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    new = (
        old.filter(F.col("o_orderkey") % 17 != 0)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 10 == 0, F.col("o_totalprice") + F.lit(1.5)
            ).otherwise(F.col("o_totalprice")),
        )
        .unionByName(
            old.filter(F.col("o_orderkey") % 97 == 0).withColumn(
                "o_orderkey", F.col("o_orderkey") + 10_000_000
            )
        )
    )
    return old, new


def q_snapshot_diff(spark, sf_dir):
    """CDC between snapshots (`operators.incremental.snapshot_diff`):
    synthesize a new snapshot (deletes %17, reprices %10, inserts %97
    with shifted keys) and emit one labeled row per changed key.  One
    full outer join on the key; null-safe value comparison so
    NULL transitions count.  Unchanged keys emit nothing."""
    from parquet_merger_spark.operators.incremental import snapshot_diff

    old, new = _snapshot_pair(spark, sf_dir)
    return snapshot_diff(old, new, ["o_orderkey"])


def q_cdc_apply(spark, sf_dir):
    """CDC CONSUMER round trip: synthesize the same old/new snapshots as
    `snapshot_diff`, diff them, then APPLY the changelog back onto the
    old snapshot — the oracle recomputes the new snapshot directly, so
    hash equality certifies the round-trip law
    apply(old, diff(old, new)) == new end-to-end."""
    from parquet_merger_spark.operators.incremental import (
        apply_changes,
        snapshot_diff,
    )

    old, new = _snapshot_pair(spark, sf_dir)
    diff = snapshot_diff(old, new, ["o_orderkey"])
    return apply_changes(old, diff, ["o_orderkey"])


def q_incremental_agg_refresh(spark, sf_dir):
    """INCREMENTAL AGGREGATE REFRESH: a materialized daily revenue rollup
    receives an update batch (repriced orders); only the AFFECTED days
    are recomputed from the updated base and stitched over the old rows
    (`refresh_groups` anti-join) — refresh cost scales with changed
    partitions, not table size.  Oracle = the FULL recompute over the
    updated table: equality is the incremental-maintenance contract."""
    from parquet_merger_spark.operators.incremental import refresh_groups

    o = _t(spark, sf_dir, "orders")
    day = F.date_trunc("day", F.col("o_orderdate").cast("timestamp")).cast("long")
    updated = o.withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 10 == 0, F.col("o_totalprice") + F.lit(1.5)
        ).otherwise(F.col("o_totalprice")),
    )

    def daily_agg(df):
        return (
            df.withColumn("day_epoch", day)
            .groupBy("day_epoch")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            )
        )

    old_agg = daily_agg(o)
    changed_days = (
        o.filter(F.col("o_orderkey") % 10 == 0)
        .select(day.alias("day_epoch"))
        .distinct()
    )
    recomputed = daily_agg(
        updated.join(F.broadcast(changed_days), day == F.col("day_epoch"), "left_semi")
    )
    return refresh_groups(old_agg, changed_days, recomputed, ["day_epoch"])


def q_vocab_encode(spark, sf_dir):
    """Tokenizer-style VOCABULARY build + corpus encode: dense term ids
    by (frequency desc, term asc) for terms with tf >= 2 — assigned with
    the window-free global numbering (quantile buckets + offsets; a bare
    row_number() over the whole vocab would funnel it through one task)
    — then every document re-expressed as its id sequence (space-joined
    for the hash compare), out-of-vocabulary tokens mapping to UNK id 0.
    The id-ification step every training-data pipeline runs before
    tensorization.

    The min-frequency cutoff is the real tokenizer contract AND the
    skew guard: assign_row_ids buckets on the numeric sort key (neg_tf),
    and equal keys share a bucket — on a Zipfian corpus the hapax mass
    (tf=1, often ~half the vocabulary) would all land in ONE bucket's
    window sort.  Culling it to UNK keeps every tf-equivalence class
    that reaches the ranking small; at extreme scale raise min_tf
    further or switch the tie-break to a hashed key (sacrificing the
    lexicographic contract, and with it the SQL oracle)."""
    from parquet_merger_spark.operators.ranking import assign_row_ids

    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "term")
    )
    counts = tok.groupBy("term").agg(F.count("*").alias("tf"))
    vocab = assign_row_ids(
        counts.filter(F.col("tf") >= 2).withColumn("neg_tf", -F.col("tf")),
        key_col="neg_tf",
        tiebreak_cols=["term"],
        row_id_col="term_id",
    ).select("term", "tf", "term_id")
    enc = (
        tok.join(vocab.select("term", "term_id"), "term", "left")
        .withColumn("tid", F.coalesce("term_id", F.lit(0)))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tid"))),
                    lambda s: s["tid"].cast("string"),
                ),
                " ",
            ).alias("ids"),
        )
    )
    return enc.select("doc_id", "n_tokens", "ids")


def q_event_attribution(spark, sf_dir):
    """Interval self-join (`streaming.events.correlate_events_batch`):
    click→view pairs per user within a 4-hour horizon — the batch twin
    of the stream-stream interval join (same plan minus watermarks;
    stream/batch equivalence is pinned in tests/test_streaming.py).
    Epoch-second outputs for cross-engine hash stability."""
    from parquet_merger_spark.streaming.events import correlate_events_batch

    pairs = correlate_events_batch(
        _events(spark, sf_dir), left_type="click", right_type="view", horizon_minutes=240
    )
    return pairs.select(
        "user_id",
        "left_id",
        "right_id",
        F.col("left_ts").cast("long").alias("left_epoch"),
        F.col("right_ts").cast("long").alias("right_epoch"),
    )


def q_schema_evolution_scan(spark, sf_dir):
    """Union-widening merge (`operators.merge.merged_df_widen`): two
    customer projections with different column sets, read through
    ``mergeSchema`` — every column survives, null-filled where a file
    predates it.  The deliberate inverse of the reference's
    intersection-only contract (kept as a separate opt-in path).
    Oracle: DuckDB ``UNION ALL BY NAME`` over the same projections."""

    from parquet_merger_spark.operators.merge import merged_df_widen

    c = _t(spark, sf_dir, "customer")
    base = _scratch_dir(spark, "schema_evo")
    p_a, p_b = os.path.join(base, "a.parquet"), os.path.join(base, "b.parquet")
    c.select("c_custkey", "c_name", "c_nationkey").write.mode("overwrite").parquet(p_a)
    c.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    ).write.mode("overwrite").parquet(p_b)
    return merged_df_widen(spark, [p_a, p_b])


def q_compact_small_files(spark, sf_dir):
    """Small-file compaction (`operators.compaction.compact_files`):
    shatter documents into 32 tiny files (the streaming-ingest pathology),
    compact them to a byte-size target derived from the manifest, return
    the re-read result.  Oracle = the untouched source table: hash
    equality proves compaction preserves the exact row multiset.  File
    counts/sizes are asserted in tests/test_stats.py."""
    import glob as _glob

    from parquet_merger_spark.operators.compaction import compact_files

    d = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang", "n_chars")
    base = _scratch_dir(spark, "compaction")
    shattered = os.path.join(base, "shattered")
    d.repartition(32).write.mode("overwrite").parquet(shattered)
    paths = sorted(_glob.glob(os.path.join(shattered, "*.parquet")))
    total = sum(os.stat(p).st_size for p in paths)
    res = compact_files(
        spark, paths, os.path.join(base, "compacted"), target_bytes=max(1, total // 4)
    )
    return spark.read.parquet(res.out_dir)


def q_file_stats(spark, sf_dir):
    """Footer-statistics catalog (`sources.stats.parquet_footer_stats`):
    write orders hash-partitioned into bucket dirs (with injected nulls
    so null-counting is exercised), then build the per-file stats table
    from FOOTERS ONLY — no data pages — distributed over executors.
    The oracle recomputes the same stats from the raw data: hash equality
    certifies footer metadata == data reality."""
    import glob as _glob

    from parquet_merger_spark.sources.stats import parquet_footer_stats

    o = (
        _t(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.when(F.col("o_orderkey") % 13 == 0, None)
            .otherwise(F.col("o_totalprice"))
            .alias("price"),
            (F.col("o_orderkey") % 8).alias("bucket"),
        )
    )
    out = _scratch_dir(spark, "file_stats")
    o.write.partitionBy("bucket").mode("overwrite").parquet(out)
    paths = sorted(_glob.glob(os.path.join(out, "bucket=*", "*.parquet")))
    stats = parquet_footer_stats(spark, paths, "price")
    return (
        stats.withColumn(
            "bucket", F.regexp_extract("file", r"bucket=(\d+)", 1).cast("long")
        )
        .groupBy("bucket")
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.sum("n_nulls").alias("n_nulls"),
            F.min("vmin").alias("vmin"),
            F.max("vmax").alias("vmax"),
        )
    )


def q_skipping_scan(spark, sf_dir):
    """File-level data skipping (`sources.stats.skipping_scan`): orders
    written range-partitioned on the key so footer envelopes are
    disjoint, then a BETWEEN scan that prunes non-overlapping files from
    the manifest before reading.  Result is provably identical to the
    unpruned filter (the oracle computes exactly that); the pruning
    itself (2 of 8 files read) is asserted in tests/test_stats.py."""

    from parquet_merger_spark.sources.stats import skipping_scan

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    out = _scratch_dir(spark, "skipping_scan")
    (
        o.repartitionByRange(8, "o_orderkey")
        .sortWithinPartitions("o_orderkey")
        .write.mode("overwrite")
        .parquet(out)
    )
    import glob as _glob

    paths = sorted(_glob.glob(os.path.join(out, "*.parquet")))
    df, _kept = skipping_scan(spark, paths, "o_orderkey", 2000, 4500)
    return df


def q_global_row_ids(spark, sf_dir):
    """Window-free global row numbering (`operators.ranking.assign_row_ids`):
    quantile-bucket the key, rank within buckets, add literal per-bucket
    offsets.  Exact twin of ``row_number() OVER (ORDER BY ...)`` with no
    single-task global sort anywhere in the plan."""
    orders = _t(spark, sf_dir, "orders")
    return assign_row_ids(orders, "o_totalprice", ["o_orderkey"], n_buckets=32).select(
        "o_orderkey", "o_totalprice", "row_id"
    )


# --------------------------------------------------------------------------
# Oracle SQL (DuckDB dialect) — one per SQL-expressible query above
# --------------------------------------------------------------------------

_QUANT = """
    list_transform(embedding,
                   x -> CAST(round(CAST(x AS DOUBLE) * 10000, 0) AS BIGINT))
"""

_QVIEW = f"""
    SELECT vec_id,
           {_QUANT} AS qe,
           CAST(list_sum(list_transform(list_zip({_QUANT}, {_QUANT}),
                                        p -> struct_extract(p, 1) * struct_extract(p, 2))) AS BIGINT) AS q2
    FROM embeddings
"""

_TOKS = "string_split(text, ' ')"

def _short_token_score(toks):
    """The short-token quality score floor(1000 * |tokens with len<=3| /
    |tokens|) — ONE definition for the four keys that stake a cross-key
    claim on scoring the same number (quality_score_auc,
    quality_calibration_bins, dedup_survivors_best_quality,
    nucleus_curation_threshold); the SQL twin is _SHORT_SCORE_SQL."""
    return F.floor(
        (F.lit(1000.0) * F.size(F.filter(toks, lambda t: F.length(t) <= 3)))
        / F.size(toks)
    ).cast("long")


# SQL twin of _short_token_score (DuckDB spelling), interpolated into
# the same four oracles.
_SHORT_SCORE_SQL = (
    "CAST(floor((1000.0 * len(list_filter(string_split(text, ' '),\n"
    "                                      t -> len(t) <= 3)))\n"
    "            / len(string_split(text, ' '))) AS BIGINT)"
)


# SCD2 customer dimension (the _scd2_snapshot_frames fixture in SQL) —
# ONE spelling shared by the scd2_customers oracle and the
# scd2_asof_lookup oracle so the build and the lookup certify the same
# dimension.
_SCD2_DIM_SQL = """
        base AS (
          SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
        ), s AS (
          SELECT c_custkey, c_mktsegment, c_acctbal, 1 AS snap_id FROM base
          UNION ALL
          SELECT c_custkey, c_mktsegment,
                 CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 10.0
                      ELSE c_acctbal END, 2
          FROM base
          UNION ALL
          SELECT c_custkey,
                 CASE WHEN c_custkey % 13 = 0 THEN 'MOVED'
                      ELSE c_mktsegment END,
                 CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 10.0
                      ELSE c_acctbal END, 3
          FROM base
        ), l AS (
          SELECT *, lag(c_mktsegment) OVER w AS pm, lag(c_acctbal) OVER w AS pa,
                 lag(snap_id) OVER w AS ps
          FROM s WINDOW w AS (PARTITION BY c_custkey ORDER BY snap_id)
        ), chg AS (
          SELECT c_custkey, c_mktsegment, c_acctbal, snap_id AS valid_from
          FROM l
          WHERE ps IS NULL
             OR c_mktsegment IS DISTINCT FROM pm
             OR c_acctbal IS DISTINCT FROM pa
        ), dim AS (
          SELECT c_custkey, c_mktsegment, c_acctbal, valid_from,
                 lead(valid_from) OVER (
                   PARTITION BY c_custkey ORDER BY valid_from
                 ) AS valid_to
          FROM chg
        )"""

_GRAMS = f"""
    SELECT DISTINCT doc_id,
           unnest(CASE WHEN len({_TOKS}) >= 2
                       THEN list_transform(range(1, len({_TOKS})),
                                           i -> {_TOKS}[i] || ' ' || {_TOKS}[i+1])
                       ELSE [] END) AS gram
    FROM documents
"""


def _langid_sql() -> str:
    from parquet_merger_spark.operators.textstats import LANG_MARKERS

    hit_cols = ", ".join(
        "CAST(len(list_filter({toks}, t -> list_contains({lst}, t))) AS BIGINT)"
        " AS hits_{lang}".format(
            toks=_TOKS,
            lst="[" + ", ".join(f"'{w}'" for w in ws) + "]",
            lang=lang,
        )
        for lang, ws in LANG_MARKERS.items()
    )
    langs = list(LANG_MARKERS)
    m = "GREATEST(" + ", ".join(f"hits_{lg}" for lg in langs) + ")"
    case = "CASE WHEN " + m + " = 0 THEN 'und' "
    for lg in langs:
        case += f"WHEN hits_{lg} = {m} THEN '{lg}' "
    case += "END"
    return f"""
        WITH h AS (SELECT doc_id, {hit_cols} FROM documents)
        SELECT doc_id, hits_en, hits_fr, hits_de, hits_es, {case} AS predicted_lang
        FROM h
    """


ORACLE_SQL: dict[str, str] = {
    "scan_parquet": "SELECT n_nationkey, n_name, n_regionkey FROM nation",
    "projection": "SELECT l_orderkey, l_quantity, l_returnflag FROM lineitem",
    "filter_pushdown": """
        SELECT l_orderkey, l_linenumber, l_quantity, l_discount
        FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'R'
    """,
    "union_all": """
        SELECT o_orderkey, o_orderdate, o_totalprice FROM orders WHERE o_totalprice > 400000
        UNION ALL
        SELECT o_orderkey, o_orderdate, o_totalprice FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    "union_common_columns": """
        SELECT c_custkey, c_name, c_acctbal FROM customer
        UNION ALL
        SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
    "row_count": "SELECT CAST(count(*) AS BIGINT) AS cnt FROM lineitem",
    "group_count_having": """
        SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY o_custkey HAVING count(*) > 1
    """,
    "distinct_rows": "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "sort_limit": """
        SELECT p_partkey, p_name, p_retailprice FROM part
        ORDER BY p_retailprice DESC, p_partkey LIMIT 20
    """,
    "filter_contains": """
        SELECT doc_id, lang, n_chars FROM documents WHERE contains(lower(text), 'spark')
    """,
    "internal_column_drop": "SELECT doc_id, text, lang, n_chars FROM documents",
    "cast_string_null_empty": """
        SELECT o_orderkey,
               coalesce(CAST(CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_custkey END AS VARCHAR), '') AS int_str,
               coalesce(CAST(CASE WHEN o_orderkey % 6 = 0 THEN NULL ELSE o_totalprice END AS VARCHAR), '') AS double_str,
               coalesce(CAST(CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderdate END AS VARCHAR), '') AS ts_str,
               coalesce(CAST(CAST(CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderdate END AS DATE) AS VARCHAR), '') AS date_str,
               coalesce(CAST(CASE WHEN o_orderkey % 8 = 0 THEN NULL ELSE o_totalprice > 200000 END AS VARCHAR), '') AS bool_str,
               coalesce(nullif(o_orderstatus, 'O'), '') AS str_or_empty
        FROM orders
    """,
    "sanitize_name": r"""
        SELECT p_partkey,
               regexp_replace(p_name, '[^\p{L}\p{N}_\-.]', '_', 'g') AS sanitized
        FROM part
    """,
    "basename_stem": r"""
        WITH p AS (
          SELECT doc_id,
                 '/data/' || source || '/doc_' || CAST(doc_id AS VARCHAR) || '.txt' AS full_path
          FROM documents
        )
        SELECT doc_id, full_path,
               regexp_extract(full_path, '([^/]+)$', 1) AS base_name,
               regexp_replace(regexp_extract(full_path, '([^/]+)$', 1), '\.[^.]*$', '') AS stem
        FROM p
    """,
    "lower_contains": """
        SELECT p_partkey, lower(p_type) AS type_lc FROM part
        WHERE contains(lower(p_type), 'med')
    """,
    "pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(avg(l_quantity), 2) AS avg_qty,
               round(avg(l_extendedprice), 2) AS avg_price,
               CAST(count(*) AS BIGINT) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "top_revenue_orders": """
        SELECT l_orderkey, o_orderpriority,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '2000-01-01'
          AND l_shipdate > TIMESTAMP '2000-01-01'
        GROUP BY l_orderkey, o_orderpriority
        ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
    "nation_revenue": """
        SELECT n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               CAST(count(*) AS BIGINT) AS n_lineitems
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name
    """,
    "trailing_window_avg": """
        WITH e AS (
          SELECT event_id, user_id, value,
                 CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS epoch
          FROM events
        )
        SELECT event_id, user_id, epoch,
               round(avg(value) OVER w, 6) AS trailing_avg,
               CAST(count(*) OVER w AS BIGINT) AS n_in_window
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch
                     RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
    "funnel_steps": """
        WITH e AS (
          SELECT user_id, event_type,
                 CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS es
          FROM events
        ), s1 AS (
          SELECT user_id, min(es) AS view_epoch
          FROM e WHERE event_type = 'view' GROUP BY user_id
        ), s2 AS (
          SELECT e.user_id, min(es) AS click_epoch
          FROM e JOIN s1 ON e.user_id = s1.user_id AND e.es > s1.view_epoch
          WHERE event_type = 'click' GROUP BY e.user_id
        ), s3 AS (
          SELECT e.user_id, min(es) AS purchase_epoch
          FROM e JOIN s2 ON e.user_id = s2.user_id AND e.es > s2.click_epoch
          WHERE event_type = 'purchase' GROUP BY e.user_id
        )
        SELECT s1.user_id, view_epoch, click_epoch, purchase_epoch
        FROM s1
        LEFT JOIN s2 ON s1.user_id = s2.user_id
        LEFT JOIN s3 ON s1.user_id = s3.user_id
    """,
    "retention_cohorts": """
        WITH e AS (
          SELECT user_id,
                 CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS es
          FROM events
        ), f AS (
          SELECT user_id, min(es) AS first_ts FROM e GROUP BY user_id
        )
        SELECT CAST(FLOOR(first_ts / 604800) AS BIGINT) * 604800
                 AS cohort_week_epoch,
               CAST(FLOOR((es - first_ts) / 604800) AS BIGINT) AS week_offset,
               CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
        FROM e JOIN f USING (user_id)
        GROUP BY 1, 2
    """,
    "gapfill_locf": """
        WITH d AS (
          SELECT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
                 round(sum(value), 2) AS v
          FROM events WHERE user_id < 20 GROUP BY 1, 2
        ), b AS (
          SELECT user_id, min(day) AS lo, max(day) AS hi FROM d GROUP BY user_id
        ), cal AS (
          SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
          FROM b
        ), j AS (
          SELECT cal.user_id, cal.day, d.v,
                 d.user_id IS NOT NULL AS present
          FROM cal LEFT JOIN d ON cal.user_id = d.user_id AND cal.day = d.day
        )
        SELECT user_id, CAST(FLOOR(epoch(day)) AS BIGINT) AS day_epoch,
               last_value(v IGNORE NULLS) OVER (
                 PARTITION BY user_id ORDER BY day ROWS UNBOUNDED PRECEDING
               ) AS v_filled,
               -- presence-based (mirror the Spark-side marker): a real row
               -- with NULL value is observed, a synthesized calendar row is not
               present AS observed
        FROM j
    """,
    "fuzzy_match": """
        WITH probes AS (
          SELECT p_partkey AS probe_id,
                 substring(p_name, 1, 6) || substring(p_name, 8) AS probe_text
          FROM part WHERE p_partkey % 50 = 0
        ), corpus AS (
          SELECT p_partkey AS match_id, p_name AS match_text FROM part
        )
        SELECT probe_id, probe_text, match_id, match_text,
               CAST(levenshtein(probe_text, match_text) AS INTEGER) AS distance
        FROM probes JOIN corpus
          ON substring(probe_text, 1, 5) = substring(match_text, 1, 5)
        WHERE levenshtein(probe_text, match_text) <= 2
    """,
    "cube_revenue": """
        SELECT year(o_orderdate) AS yr, o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               round(sum(o_totalprice), 2) AS revenue
        FROM orders
        GROUP BY CUBE(year(o_orderdate), o_orderpriority)
    """,
    "corr_matrix": """
        WITH q AS (
          SELECT CAST(FLOOR(l_quantity) AS BIGINT) AS qty,
                 CAST(round(l_discount * 100, 0) AS BIGINT) AS disc,
                 CAST(round(l_tax * 100, 0) AS BIGINT) AS tax
          FROM lineitem
        ), s AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(qty) AS DOUBLE) AS sq,
                 CAST(sum(disc) AS DOUBLE) AS sd,
                 CAST(sum(tax) AS DOUBLE) AS st,
                 CAST(sum(qty * qty) AS DOUBLE) AS sqq,
                 CAST(sum(disc * disc) AS DOUBLE) AS sdd,
                 CAST(sum(tax * tax) AS DOUBLE) AS stt,
                 CAST(sum(qty * disc) AS DOUBLE) AS sqd,
                 CAST(sum(qty * tax) AS DOUBLE) AS sqt,
                 CAST(sum(disc * tax) AS DOUBLE) AS sdt
          FROM q
        )
        SELECT 'qty' AS col_x, 'disc' AS col_y, n,
               round(CASE WHEN n*sqq - sq*sq > 0 AND n*sdd - sd*sd > 0
                     THEN (n*sqd - sq*sd) / (sqrt(n*sqq - sq*sq) * sqrt(n*sdd - sd*sd))
                     END, 6) AS corr
        FROM s
        UNION ALL
        SELECT 'qty', 'tax', n,
               round(CASE WHEN n*sqq - sq*sq > 0 AND n*stt - st*st > 0
                     THEN (n*sqt - sq*st) / (sqrt(n*sqq - sq*sq) * sqrt(n*stt - st*st))
                     END, 6)
        FROM s
        UNION ALL
        SELECT 'disc', 'tax', n,
               round(CASE WHEN n*sdd - sd*sd > 0 AND n*stt - st*st > 0
                     THEN (n*sdt - sd*st) / (sqrt(n*sdd - sd*sd) * sqrt(n*stt - st*st))
                     END, 6)
        FROM s
    """,
    "scd2_customers": f"""
        WITH {_SCD2_DIM_SQL}
        SELECT c_custkey, c_mktsegment, c_acctbal, valid_from, valid_to
        FROM dim
    """,
    "scd2_asof_lookup": f"""
        WITH {_SCD2_DIM_SQL}
        SELECT o.o_orderkey, o.o_custkey,
               CAST(o.o_orderkey % 3 + 1 AS INTEGER) AS as_of_snap,
               dim.c_mktsegment, dim.c_acctbal
        FROM orders o
        JOIN dim ON o.o_custkey = dim.c_custkey
               AND dim.valid_from <= o.o_orderkey % 3 + 1
               AND o.o_orderkey % 3 + 1 < coalesce(dim.valid_to, 2147483647)
    """,
    # 3 unrolled power iterations of the integer-exact PageRank update
    # r' = 150000 + (85 * sum(r div outdeg)) div 100 — pure integer ops,
    # bit-identical to the Spark driver loop under any aggregation order.
    "pagerank": """
        WITH pairs AS (
          SELECT DISTINCT l_partkey AS p, l_suppkey + 10000000 AS s
          FROM lineitem
        ), e AS (
          SELECT p AS src, s AS dst FROM pairs
          UNION SELECT s, p FROM pairs
        ), v AS (
          SELECT DISTINCT src AS vertex FROM e
          UNION SELECT DISTINCT dst FROM e
        ), deg AS (
          SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM e GROUP BY src
        ), r0 AS (
          SELECT vertex, CAST(1000000 AS BIGINT) AS rank_micro FROM v
        ), c1 AS (
          SELECT dst AS vertex, sum(rank_micro // outdeg) AS s
          FROM e JOIN r0 ON e.src = r0.vertex JOIN deg USING (src)
          GROUP BY dst
        ), r1 AS (
          SELECT v.vertex,
                 CAST(150000 + (85 * coalesce(s, 0)) // 100 AS BIGINT)
                   AS rank_micro
          FROM v LEFT JOIN c1 USING (vertex)
        ), c2 AS (
          SELECT dst AS vertex, sum(rank_micro // outdeg) AS s
          FROM e JOIN r1 ON e.src = r1.vertex JOIN deg USING (src)
          GROUP BY dst
        ), r2 AS (
          SELECT v.vertex,
                 CAST(150000 + (85 * coalesce(s, 0)) // 100 AS BIGINT)
                   AS rank_micro
          FROM v LEFT JOIN c2 USING (vertex)
        ), c3 AS (
          SELECT dst AS vertex, sum(rank_micro // outdeg) AS s
          FROM e JOIN r2 ON e.src = r2.vertex JOIN deg USING (src)
          GROUP BY dst
        ), r3 AS (
          SELECT v.vertex,
                 CAST(150000 + (85 * coalesce(s, 0)) // 100 AS BIGINT)
                   AS rank_micro
          FROM v LEFT JOIN c3 USING (vertex)
        )
        SELECT vertex, rank_micro FROM r3
    """,
    "sql_star_join": """
        SELECT n_name,
               round(sum(l_extendedprice), 2) AS revenue,
               CAST(count(*) AS BIGINT) AS n_items
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'AMERICA'
        GROUP BY n_name
    """,
    "sql_having_subquery": """
        SELECT c_custkey, c_name,
               CAST(count(*) AS BIGINT) AS n_orders,
               round(sum(o_totalprice), 2) AS total_value
        FROM customer JOIN orders ON c_custkey = o_custkey
        WHERE c_custkey IN (
          SELECT o_custkey FROM orders
          GROUP BY o_custkey
          HAVING sum(o_totalprice) > 3000000
        )
        GROUP BY c_custkey, c_name
    """,
    "sql_recursive_cte": """
        WITH RECURSIVE months(mnum) AS (
          SELECT 0
          UNION ALL
          SELECT mnum + 1 FROM months WHERE mnum < 83
        ),
        monthly AS (
          SELECT (year(o_orderdate) * 12 + month(o_orderdate))
                 - (1995 * 12 + 1) AS mnum,
                 CAST(count(*) AS BIGINT) AS n_orders,
                 round(sum(o_totalprice), 2) AS revenue
          FROM orders
          GROUP BY 1
        )
        SELECT concat(CAST(1995 + mnum // 12 AS VARCHAR), '-',
                      lpad(CAST(mnum % 12 + 1 AS VARCHAR), 2, '0')) AS month,
               coalesce(n_orders, CAST(0 AS BIGINT)) AS n_orders,
               coalesce(revenue, CAST(0.0 AS DOUBLE)) AS revenue
        FROM months LEFT JOIN monthly USING (mnum)
    """,
    "variant_extract": """
        SELECT event_id,
               event_type AS vt,
               user_id AS vu,
               round(value, 2) AS vv,
               user_id AS vid1,
               CAST(NULL AS BIGINT) AS vmiss
        FROM events
    """,
    "try_functions": """
        SELECT l_orderkey, l_linenumber,
               l_extendedprice / nullif(l_discount, 0.0) AS price_per_disc,
               1.0 / nullif(l_tax, 0.0) AS inv_tax,
               CASE WHEN l_linenumber = 1 THEN 12.5
                    ELSE TRY_CAST('not a number' AS DOUBLE) END AS parsed,
               list_extract([l_quantity, l_discount], l_linenumber)
                 AS arr_at_line
        FROM lineitem WHERE l_orderkey < 2000
    """,
    "rare_token_stats": """
        WITH toks AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok
          FROM documents
        ), vocab AS (
          SELECT tok, CAST(count(*) AS BIGINT) AS cnt
          FROM toks GROUP BY tok
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(CASE WHEN cnt <= 2 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_rare,
               round(sum(CASE WHEN cnt <= 2 THEN 1 ELSE 0 END)
                     / CAST(count(*) AS DOUBLE), 6) AS rare_frac
        FROM toks JOIN vocab USING (tok)
        GROUP BY doc_id
    """,
    "sql_parameterized": """
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(o_totalprice), 2) AS revenue
        FROM orders
        WHERE o_totalprice > 250000.0 AND o_orderstatus = 'O'
        GROUP BY o_orderpriority
    """,
    "decimal_aggregates": """
        WITH d AS (
          SELECT o_orderstatus,
                 CAST(o_totalprice AS DECIMAL(18,2)) AS p
          FROM orders
        )
        SELECT o_orderstatus,
               CAST(sum(p) AS DOUBLE) AS total,
               CAST(sum(p) * 100 AS BIGINT) AS total_cents,
               CAST(count(*) AS BIGINT) AS n,
               CAST(min(p) AS DOUBLE) AS min_price,
               CAST(max(p) AS DOUBLE) AS max_price
        FROM d GROUP BY o_orderstatus
    """,
    "from_csv_extract": """
        SELECT c_custkey,
               c_custkey AS k,
               c_name || ',jr' AS name,
               round(c_acctbal, 2) AS bal
        FROM customer WHERE c_custkey < 500
    """,
    "xml_extract": """
        SELECT s_suppkey,
               s_name AS xname,
               s_nationkey AS xnation,
               CAST(s_suppkey AS VARCHAR) AS xkey,
               CAST(2 AS BIGINT) AS n_tags
        FROM supplier
    """,
    "robust_outliers": """
        WITH q AS (
          SELECT event_id, event_type, value,
                 CAST(round(value * 100) AS BIGINT) AS cents
          FROM events
        ), med AS (
          SELECT event_type, quantile_cont(cents, 0.5) AS med_cents
          FROM q GROUP BY 1
        ), dev AS (
          SELECT q.*,
                 abs(q.cents * 2 - CAST(med.med_cents * 2 AS BIGINT))
                   AS absdev2
          FROM q JOIN med USING (event_type)
        ), mad AS (
          SELECT event_type, quantile_cont(absdev2, 0.5) AS mad2
          FROM dev GROUP BY 1
        )
        SELECT event_id, event_type, value,
               round(0.6745 * absdev2 / mad2, 6) AS mz
        FROM dev JOIN mad USING (event_type)
        WHERE mad2 > 0 AND round(0.6745 * absdev2 / mad2, 6) > 3.5
    """,
    "grouping_sets_revenue": """
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
               CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority,
               round(sum(o_totalprice), 2) AS revenue,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    "ohlc_hourly": """
        WITH e AS (
          SELECT event_type,
                 CAST(FLOOR(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP))))
                   AS BIGINT) AS hour_epoch,
                 CAST(ts AS TIMESTAMP) AS tsx, event_id, value
          FROM events
        ), r AS (
          SELECT *,
                 row_number() OVER (PARTITION BY event_type, hour_epoch
                                    ORDER BY tsx, event_id) AS ra,
                 row_number() OVER (PARTITION BY event_type, hour_epoch
                                    ORDER BY tsx DESC, event_id DESC) AS rd
          FROM e
        )
        SELECT event_type, hour_epoch,
               max(CASE WHEN ra = 1 THEN value END) AS open,
               max(value) AS high,
               min(value) AS low,
               max(CASE WHEN rd = 1 THEN value END) AS close,
               CAST(count(*) AS BIGINT) AS n_events
        FROM r GROUP BY 1, 2
    """,
    "map_functions": """
        SELECT o_orderkey,
               o_orderstatus AS status_val,
               CAST(NULL AS VARCHAR) AS missing_val,
               'extra,priority,status' AS keys_sorted,
               CAST(CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END +
                    CASE WHEN o_totalprice / 2 > 100000 THEN 1 ELSE 0 END
                 AS BIGINT) AS n_big_vals,
               o_totalprice / 2 AS half_price
        FROM orders WHERE o_orderkey < 3000
    """,
    "string_agg_groups": """
        WITH top AS (
          SELECT c_mktsegment, c_name,
                 row_number() OVER (PARTITION BY c_mktsegment
                                    ORDER BY c_acctbal DESC, c_custkey) AS rn
          FROM customer
        )
        SELECT c_mktsegment,
               string_agg(c_name, ',' ORDER BY c_name) AS top_names,
               CAST(count(*) AS BIGINT) AS n
        FROM top WHERE rn <= 5
        GROUP BY c_mktsegment
    """,
    "sql_custdist": """
        SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        FROM (
          SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
          FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey
        )
        GROUP BY c_count
    """,
    "sql_correlated_subquery": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders o
        WHERE o_totalprice >= 0.999 * (
                SELECT max(o2.o_totalprice) FROM orders o2
                WHERE o2.o_custkey = o.o_custkey
              )
          AND EXISTS (
                SELECT 1 FROM customer c
                WHERE c.c_custkey = o.o_custkey AND c.c_acctbal > 0
              )
    """,
    "range_lookup_bucketed": """
        WITH bands AS (
          SELECT i AS band,
                 900.0 + i + 0.25 * ((i * 3) % 4) AS lo,
                 900.0 + (i + 1) + 0.25 * (((i + 1) * 3) % 4) AS hi
          FROM range(100) t(i)
        )
        SELECT band, lo, hi,
               CAST(count(*) AS BIGINT) AS n_parts,
               CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT)) AS BIGINT)
                 AS sum_price_cents
        FROM bands JOIN part
          ON p_retailprice >= lo AND p_retailprice < hi
        GROUP BY band, lo, hi
    """,
    "regex_functions": """
        SELECT doc_id,
               regexp_extract(text, '([A-Za-z]+)', 1) AS first_word,
               regexp_extract(text, '([0-9]+)', 1) AS first_number,
               CAST(len(regexp_extract_all(text, '[aeiou]')) AS BIGINT)
                 AS n_vowels,
               CAST(length(regexp_replace(text, '[^A-Za-z]+', '', 'g'))
                 AS BIGINT) AS n_alpha,
               regexp_matches(text, '^[A-Z]') AS starts_upper,
               CAST(len(str_split_regex(text, '\\s+')) AS BIGINT)
                 AS n_ws_tokens
        FROM documents
    """,
    "math_functions": """
        SELECT l_orderkey, l_linenumber,
               abs(l_quantity - 25.0) AS abs_dev,
               CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
               CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
               sqrt(l_quantity) AS qty_sqrt,
               CAST(sign(l_quantity - 25.0) AS DOUBLE) AS qty_sign,
               l_orderkey % 7 AS key_mod7,
               l_orderkey & 255 AS key_and255,
               CAST(l_linenumber << 3 AS BIGINT) AS line_shl3,
               least(l_quantity, l_discount * 100) AS least_qd,
               greatest(l_quantity, l_tax * 100) AS greatest_qt
        FROM lineitem WHERE l_orderkey < 2000
    """,
    "unpivot_measures": """
        SELECT l_orderkey, l_linenumber, measure, val
        FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax
              FROM lineitem)
        UNPIVOT (val FOR measure IN (l_quantity, l_discount, l_tax))
    """,
    "null_functions": """
        WITH c AS (
          SELECT c_custkey, c_mktsegment, c_acctbal,
                 CASE WHEN c_custkey % 3 = 0 THEN NULL
                      ELSE c_acctbal END AS bal
          FROM customer
        )
        SELECT c_custkey,
               coalesce(bal, 0.0) AS bal_or_zero,
               nullif(c_mktsegment, 'BUILDING') AS seg_nb,
               (bal IS NOT DISTINCT FROM c_acctbal) AS bal_intact,
               (bal IS NULL) AS bal_missing,
               CASE WHEN bal IS NULL THEN 'missing'
                    WHEN bal < 0 THEN 'debt'
                    ELSE 'credit' END AS bal_class
        FROM c
    """,
    "udtf_tokens": f"""
        WITH t AS (
          SELECT doc_id, text,
                 unnest(range(1, len({_TOKS}) + 1)) AS i
          FROM documents
          -- length(text) > 0 mirrors the UDTF's `if text:` guard: the
          -- Python side yields NO rows for '' while string_split('', ' ')
          -- is [''] (one empty token) — without this clause an
          -- empty-text fixture row would hash-mismatch the engines
          WHERE doc_id < 100 AND length(text) > 0
        )
        SELECT doc_id, CAST(i AS INTEGER) AS pos,
               string_split(text, ' ')[i] AS tok
        FROM t
    """,
    "array_functions": f"""
        SELECT doc_id,
               CAST(len({_TOKS}) AS INTEGER) AS n_toks,
               array_to_string(list_sort(list_distinct({_TOKS})), ' ')
                 AS distinct_sorted,
               coalesce(array_to_string(list_sort(list_distinct(
                 list_intersect({_TOKS},
                   ['the', 'a', 'and', 'of', 'is', 'to', 'in']))), ' '), '')
                 AS stop_hits,
               array_to_string(({_TOKS})[1:3], ' ') AS first3,
               ({_TOKS})[-1] AS last_tok,
               list_contains({_TOKS}, 'the') AS has_the
        FROM documents
    """,
    "window_functions": """
        SELECT o_custkey, o_orderkey,
               round(percent_rank() OVER w, 6) AS pr,
               round(cume_dist() OVER w, 6) AS cd,
               first_value(o_orderkey) OVER wf AS first_key,
               last_value(o_orderkey) OVER wf AS last_key,
               nth_value(o_orderkey, 2) OVER wf AS second_key,
               lag(o_orderkey, 1, -1) OVER w AS prev_key,
               lead(o_orderkey, 2, -1) OVER w AS next2_key
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_totalprice, o_orderkey),
               wf AS (PARTITION BY o_custkey
                      ORDER BY o_totalprice, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING
                           AND UNBOUNDED FOLLOWING)
    """,
    "datetime_functions": """
        SELECT o_orderkey,
               CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
               CAST(weekofyear(o_orderdate) AS INTEGER) AS iso_week,
               CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
               strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d')
                 AS month_end,
               strftime(date_trunc('month', CAST(o_orderdate AS DATE)),
                        '%Y-%m-%d') AS month_start,
               strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY,
                        '%Y-%m-%d') AS plus30,
               CAST(date_diff('day', DATE '1995-01-01',
                              CAST(o_orderdate AS DATE)) AS INTEGER)
                 AS days_since_95
        FROM orders
    """,
    "value_outliers": """
        WITH q AS (
          SELECT event_id, event_type, value,
                 CAST(round(value * 100, 0) AS BIGINT) AS cents
          FROM events
        ), st AS (
          SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(cents) AS DOUBLE) AS s,
                 CAST(sum(cents * cents) AS DOUBLE) AS ss
          FROM q GROUP BY event_type
        ), z AS (
          SELECT event_id, q.event_type, value,
                 round((CAST(cents AS DOUBLE) - s / n)
                       / (sqrt(n * ss - s * s) / n), 6) AS z
          FROM q JOIN st ON q.event_type = st.event_type
        )
        SELECT event_id, event_type, value, z FROM z WHERE abs(z) > 3
    """,
    "string_functions": """
        SELECT p_partkey,
               lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS key_padded,
               rpad(p_brand, 12, '.') AS brand_padded,
               translate(p_type, ' ', '_') AS type_snake,
               reverse(p_name) AS name_rev,
               repeat('*', CAST(p_partkey % 5 AS INTEGER)) AS stars,
               regexp_extract(p_brand, '#([0-9]+)', 1) AS brand_num,
               split_part(p_type, ' ', 2) AS type_word2,
               left(p_name, 8) AS name_l8,
               right(p_type, 4) AS type_r4
        FROM part
    """,
    "weighted_sample": """
        WITH d AS (
          SELECT doc_id, lang,
                 CASE WHEN length(trim(text)) = 0 THEN 0
                      ELSE len(string_split_regex(trim(text), '\\s+')) END
                   AS n_tokens
          FROM documents
        )
        SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens FROM d
        WHERE ((doc_id % 999983) * 7919) % 1000000
              < LEAST(1000000, FLOOR(n_tokens * 1000000 / 2000))
    """,
    "feature_hashing": """
        WITH tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok
          FROM documents WHERE doc_id < 500 AND len(string_split(text, ' ')) >= 1
        )
        SELECT doc_id,
               (('0x' || substring(md5(tok), 1, 8))::BIGINT) % 256 AS bucket,
               CAST(count(*) AS BIGINT) AS n
        FROM tok GROUP BY 1, 2
    """,
    # Spark side wrote ORC and re-read it; hash equality against the
    # untouched parquet source certifies the columnar round-trip.
    "orc_roundtrip": """
        SELECT o_orderkey, o_orderstatus, o_totalprice,
               CAST(epoch(o_orderdate) AS BIGINT) AS order_epoch
        FROM orders WHERE o_orderkey < 800
    """,
    "bigram_counts": """
        WITH big AS (
          SELECT lang,
                 unnest(list_transform(range(1, len(string_split(text, ' '))),
                        i -> string_split(text, ' ')[i] || ' ' ||
                             string_split(text, ' ')[i + 1])) AS bigram
          FROM documents WHERE len(string_split(text, ' ')) >= 2
        ), c AS (
          SELECT lang, bigram, CAST(count(*) AS BIGINT) AS n
          FROM big GROUP BY 1, 2
        )
        SELECT lang, bigram, n, CAST(rk AS INTEGER) AS rk FROM (
          SELECT *, row_number() OVER (
            PARTITION BY lang ORDER BY n DESC, bigram
          ) AS rk FROM c
        ) WHERE rk <= 10
    """,
    "event_transitions": """
        WITH e AS (
          SELECT user_id, event_id, event_type,
                 CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS es
          FROM events
        ), t AS (
          SELECT event_type AS from_type,
                 lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY es, event_id
                 ) AS to_type
          FROM e
        )
        SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
        FROM t WHERE to_type IS NOT NULL GROUP BY 1, 2
    """,
    "value_band_stats": """
        WITH bands(band, lo, hi) AS (VALUES
          ('tiny', 0.0, 5.0), ('small', 5.0, 20.0),
          ('mid', 20.0, 50.0), ('large', 50.0, 1e9))
        SELECT band, CAST(count(*) AS BIGINT) AS n,
               round(sum(value), 2) AS total
        FROM events JOIN bands ON value >= lo AND value < hi
        GROUP BY band
    """,
    "decile_binning": """
        WITH r AS (
          SELECT o_totalprice,
                 row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rn,
                 count(*) OVER () AS n
          FROM orders
        )
        SELECT CAST(FLOOR((rn - 1) * 10 / n) AS BIGINT) + 1 AS decile,
               CAST(count(*) AS BIGINT) AS n_orders,
               round(min(o_totalprice), 2) AS lo,
               round(max(o_totalprice), 2) AS hi
        FROM r GROUP BY 1
    """,
    "semi_join_customers": """
        SELECT c_custkey, c_name, c_mktsegment FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    """,
    "anti_join_customers": """
        SELECT c_custkey, c_name, c_acctbal FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "left_join_null_fill": """
        SELECT c_custkey,
               CAST(coalesce(a.cnt, 0) AS BIGINT) AS n_orders,
               coalesce(a.total, 0.0) AS total_spent
        FROM customer LEFT JOIN (
          SELECT o_custkey, CAST(count(*) AS BIGINT) AS cnt,
                 round(sum(o_totalprice), 2) AS total
          FROM orders GROUP BY o_custkey
        ) a ON c_custkey = a.o_custkey
    """,
    "topk_per_group": """
        SELECT event_type, event_id, value, CAST(rank AS INT) AS rank FROM (
          SELECT event_type, event_id, value,
                 row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rank
          FROM events
        ) WHERE rank <= 3
    """,
    "json_extract": """
        SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    """,
    "window_agg_events": """
        SELECT CAST(FLOOR(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP)))) AS BIGINT) AS ws_epoch,
               event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               round(sum(value), 2) AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "sliding_window_events": """
        SELECT CAST(FLOOR(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP)))) AS BIGINT)
                 - off.o * 3600 AS ws_epoch,
               event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               round(sum(value), 2) AS sum_value
        FROM events CROSS JOIN (VALUES (0), (1)) AS off(o)
        GROUP BY 1, 2
    """,
    "sessionize": """
        WITH e AS (
          SELECT user_id, CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS es
          FROM events
        ), l AS (
          SELECT user_id, es,
                 CASE WHEN lag(es) OVER w IS NULL
                        OR es - lag(es) OVER w > 1800 THEN 1 ELSE 0 END AS brk
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY es)
        ), s AS (
          SELECT user_id, es,
                 SUM(brk) OVER (PARTITION BY user_id ORDER BY es
                                ROWS UNBOUNDED PRECEDING) AS session_id
          FROM l
        )
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               MIN(es) AS session_start_epoch, MAX(es) AS session_end_epoch,
               CAST(count(*) AS BIGINT) AS n_events
        FROM s GROUP BY user_id, session_id
    """,
    "chunk_documents": f"""
        WITH t AS (
          SELECT doc_id, {_TOKS} AS toks, len({_TOKS}) AS n FROM documents
        ),
        s AS (
          -- starts stop at the first chunk reaching the doc end
          -- (greatest(n - 64 + 56, 1) mirrors chunk_documents)
          SELECT doc_id, n, unnest(range(1, greatest(n - 8, 1) + 1, 56)) AS start
          FROM t
        )
        SELECT s.doc_id,
               CAST(row_number() OVER (PARTITION BY s.doc_id ORDER BY start) AS INT)
                 AS chunk_idx,
               array_to_string(list_slice(t.toks, start, least(start + 63, s.n)), ' ')
                 AS chunk_text,
               CAST(least(s.n - start + 1, 64) AS BIGINT) AS n_chunk_tokens
        FROM s JOIN t ON s.doc_id = t.doc_id
    """,
    "pack_sequences": f"""
        WITH t AS (
          SELECT doc_id, lang, CAST(len({_TOKS}) AS BIGINT) AS n_tokens
          FROM documents
        )
        SELECT doc_id, lang, n_tokens,
               CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                               ROWS UNBOUNDED PRECEDING) - n_tokens)
                          / 2048) AS BIGINT) AS bin_id
        FROM t
    """,
    "user_event_profile": """
        SELECT user_id,
               string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types_csv,
               CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
        FROM events GROUP BY user_id
    """,
    "daily_order_stats": """
        SELECT CAST(FLOOR(epoch(date_trunc('day', o_orderdate))) AS BIGINT) AS day_epoch,
               CAST(isodow(date_trunc('day', o_orderdate)) AS INT) AS iso_dow,
               CAST(count(*) AS BIGINT) AS n_orders,
               round(sum(o_totalprice), 2) AS revenue
        FROM orders GROUP BY 1, 2
    """,
    "event_percentiles": """
        SELECT event_type,
               round(quantile_cont(value, 0.5), 6) AS p50,
               round(quantile_cont(value, 0.9), 6) AS p90,
               round(quantile_cont(value, 0.99), 6) AS p99
        FROM events GROUP BY event_type
    """,
    "rollup_revenue": """
        SELECT year(o_orderdate) AS yr, o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               round(sum(o_totalprice), 2) AS revenue
        FROM orders
        GROUP BY ROLLUP(year(o_orderdate), o_orderpriority)
    """,
    "text_tfidf": f"""
        WITH toks AS (
          SELECT doc_id, unnest({_TOKS}) AS term FROM documents
        ),
        tf AS (
          SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
          FROM toks GROUP BY 1, 2
        ),
        docfreq AS (
          SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
          FROM toks GROUP BY 1
        ),
        n AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM documents),
        scored AS (
          SELECT doc_id, term, round(tf * n_docs / df, 6) AS tfidf
          FROM tf JOIN docfreq USING (term) CROSS JOIN n
        )
        SELECT doc_id, term, tfidf, CAST(rank AS INT) AS rank FROM (
          SELECT doc_id, term, tfidf,
                 row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
          FROM scored
        ) WHERE rank <= 5
    """,
    "asof_join": """
        WITH o AS (
          SELECT o_orderkey, o_custkey,
                 CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) AS order_epoch
          FROM orders
        ), e0 AS (
          SELECT user_id,
                 CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS event_epoch,
                 event_id, value
          FROM events
        ), ed AS (
          SELECT user_id, event_epoch, event_id, value FROM (
            SELECT *, row_number() OVER (
              PARTITION BY user_id, event_epoch ORDER BY event_id DESC) AS rn
            FROM e0
          ) WHERE rn = 1
        )
        SELECT o.o_orderkey, o.o_custkey, o.order_epoch,
               e.event_id AS last_event_id,
               e.event_epoch AS last_event_epoch,
               round(e.value, 2) AS last_event_value
        FROM o ASOF LEFT JOIN ed e
          ON o.o_custkey = e.user_id AND e.event_epoch <= o.order_epoch
    """,
    "sample_stratified": """
        SELECT doc_id, lang FROM documents
        WHERE ((doc_id % 999983) * 7919 + 7) % 1000000 <
              CASE lang WHEN 'en' THEN 100000
                        WHEN 'fr' THEN 500000
                        WHEN 'de' THEN 500000
                        WHEN 'es' THEN 500000
                        WHEN 'zh' THEN 250000
                        ELSE -1 END
    """,
    "decontaminate": """
        WITH tr AS (
          SELECT DISTINCT doc_id AS train_id,
                 unnest(CASE WHEN len(string_split(text, ' ')) >= 3
                             THEN list_transform(range(1, len(string_split(text, ' ')) - 1),
                                  i -> string_split(text, ' ')[i] || ' ' ||
                                       string_split(text, ' ')[i+1] || ' ' ||
                                       string_split(text, ' ')[i+2])
                             ELSE [] END) AS gram
          FROM documents
          WHERE source IN ('src0','src1','src2','src3','src4','src5','src6','src7','src8','src9')
        ), te AS (
          SELECT DISTINCT doc_id AS test_id,
                 unnest(CASE WHEN len(string_split(text, ' ')) >= 3
                             THEN list_transform(range(1, len(string_split(text, ' ')) - 1),
                                  i -> string_split(text, ' ')[i] || ' ' ||
                                       string_split(text, ' ')[i+1] || ' ' ||
                                       string_split(text, ' ')[i+2])
                             ELSE [] END) AS gram
          FROM documents
          WHERE source NOT IN ('src0','src1','src2','src3','src4','src5','src6','src7','src8','src9')
        )
        SELECT test_id, train_id, CAST(count(*) AS BIGINT) AS shared_grams
        FROM te JOIN tr USING (gram)
        GROUP BY 1, 2 HAVING count(*) >= 5
    """,
    "dedup_exact": """
        SELECT o_orderkey, o_custkey, o_totalprice FROM (
          SELECT o_orderkey, o_custkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn
          FROM orders
        ) WHERE rn = 1
    """,
    "dedup_ngram_jaccard": f"""
        WITH g AS ({_GRAMS}),
        sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM g GROUP BY doc_id),
        shared AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS sh
          FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT id_a, id_b,
               round(sh / (sa.n + sb.n - sh), 6) AS jaccard
        FROM shared
        JOIN sz sa ON id_a = sa.doc_id
        JOIN sz sb ON id_b = sb.doc_id
        WHERE sh / (sa.n + sb.n - sh) >= 0.8
    """,
    "cdc_apply": """
        SELECT o_orderkey, o_custkey,
               CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 1.5
                    ELSE o_totalprice END AS o_totalprice
        FROM orders WHERE o_orderkey % 17 <> 0
        UNION ALL
        SELECT o_orderkey + 10000000 AS o_orderkey, o_custkey, o_totalprice
        FROM orders WHERE o_orderkey % 97 = 0
    """,
    "incremental_agg_refresh": """
        SELECT CAST(FLOOR(epoch(date_trunc('day', o_orderdate))) AS BIGINT)
                 AS day_epoch,
               CAST(count(*) AS BIGINT) AS n_orders,
               round(sum(CASE WHEN o_orderkey % 10 = 0
                              THEN o_totalprice + 1.5
                              ELSE o_totalprice END), 2) AS revenue
        FROM orders GROUP BY 1
    """,
    "vocab_encode": """
        WITH tok AS (
          SELECT doc_id,
                 generate_subscripts(string_split(text, ' '), 1) AS pos,
                 unnest(string_split(text, ' ')) AS term
          FROM documents
        ), counts AS (
          SELECT term, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY term
        ), vocab AS (
          SELECT term, tf,
                 CAST(row_number() OVER (ORDER BY tf DESC, term) AS BIGINT)
                   AS term_id
          FROM counts WHERE tf >= 2
        )
        SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
               string_agg(CAST(coalesce(v.term_id, 0) AS VARCHAR),
                          ' ' ORDER BY t.pos) AS ids
        FROM tok t LEFT JOIN vocab v USING (term)
        GROUP BY t.doc_id
    """,
    "stream_dedup": """
        SELECT event_id,
               CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS ts_epoch,
               user_id, event_type, round(value, 2) AS value_r
        FROM events
    """,
    "stream_enrich": """
        SELECT event_id, user_id, event_type, c_mktsegment,
               CAST(c_nationkey AS BIGINT) AS c_nationkey
        FROM events LEFT JOIN customer ON user_id = c_custkey
    """,
    "stream_upsert_history": """
        SELECT o_orderkey, o_custkey, o_orderstatus,
               CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 1.5
                    ELSE o_totalprice END AS o_totalprice
        FROM orders
    """,
    "twap_user": """
        WITH e AS (
          SELECT user_id,
                 CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS t,
                 CAST(round(value * 100, 0) AS BIGINT) AS cents,
                 event_id
          FROM events
        ), d AS (
          SELECT user_id, cents,
                 lead(t) OVER (PARTITION BY user_id ORDER BY t, event_id) - t AS dur
          FROM e
        )
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_holds,
               CAST(sum(dur) AS BIGINT) AS held_seconds,
               round(CAST(sum(cents * dur) AS BIGINT)
                     / (CAST(sum(dur) AS BIGINT) * 100.0), 6) AS twap
        FROM d WHERE dur IS NOT NULL
        GROUP BY user_id HAVING sum(dur) > 0
    """,
    "asof_join_forward": """
        WITH o AS (
          SELECT o_orderkey, o_custkey,
                 CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) AS order_epoch
          FROM orders
        ), e0 AS (
          SELECT user_id,
                 CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS event_epoch,
                 event_id, value
          FROM events
        ), ed AS (
          SELECT user_id, event_epoch, event_id, value FROM (
            SELECT *, row_number() OVER (
              PARTITION BY user_id, event_epoch ORDER BY event_id) AS rn
            FROM e0
          ) WHERE rn = 1
        )
        SELECT o_orderkey, o_custkey, order_epoch,
               event_id AS next_event_id,
               event_epoch AS next_event_epoch,
               round(value, 2) AS next_event_value
        FROM (
          SELECT o.*, ed.event_id, ed.event_epoch, ed.value,
                 row_number() OVER (
                   PARTITION BY o.o_orderkey
                   ORDER BY ed.event_epoch) AS rn
          FROM o LEFT JOIN ed
            ON o.o_custkey = ed.user_id AND ed.event_epoch >= o.order_epoch
        ) WHERE rn = 1
    """,
    "skew_salted_join": """
        SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
                 AS revenue_cents
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1
    """,
    "keyness_terms": """
        WITH tok AS (
          SELECT source, unnest(string_split(text, ' ')) AS term FROM documents
        ), tf AS (
          SELECT source, term, CAST(count(*) AS BIGINT) AS tf
          FROM tok GROUP BY 1, 2
        ), tot AS (
          SELECT source, CAST(sum(tf) AS BIGINT) AS src_tokens
          FROM tf GROUP BY source
        ), corp AS (
          SELECT term, CAST(sum(tf) AS BIGINT) AS tf_corpus
          FROM tf GROUP BY term
        ), total AS (
          SELECT CAST(sum(tf) AS BIGINT) AS total_tokens FROM tf
        ), lifted AS (
          SELECT tf.source, tf.term, tf.tf,
                 CAST(((tf.tf * CAST(1000000 AS BIGINT)) // tot.src_tokens
                       * CAST(1000000 AS BIGINT))
                      // greatest(CAST(1 AS BIGINT),
                                  (corp.tf_corpus * CAST(1000000 AS BIGINT))
                                  // total.total_tokens) AS BIGINT) AS lift_ppm
          FROM tf
          JOIN tot USING (source)
          JOIN corp USING (term)
          CROSS JOIN total
          WHERE tf.tf >= 5
        ), ranked AS (
          SELECT *, row_number() OVER (
                   PARTITION BY source
                   ORDER BY lift_ppm DESC, tf DESC, term) AS rank
          FROM lifted
        )
        SELECT source, term, tf, lift_ppm, CAST(rank AS BIGINT) AS rank
        FROM ranked WHERE rank <= 5
    """,
    "url_functions": """
        WITH u AS (
          SELECT doc_id,
                 'https://www.' || source || '.example.com/docs/' || lang || '/'
                   || CAST(doc_id AS VARCHAR)
                   || '?utm_source=feed&id=' || CAST(doc_id AS VARCHAR)
                   || '&ref=r' || CAST(doc_id % 7 AS VARCHAR) AS url
          FROM documents
        )
        SELECT doc_id, url,
               regexp_extract(url, '^https?://([^/]+)', 1) AS host,
               regexp_extract(regexp_extract(url, '^https?://([^/]+)', 1),
                              '([^.]+\\.[^.]+)$', 1) AS domain,
               regexp_extract(url, '^https?://[^/]+([^?#]*)', 1) AS path,
               regexp_extract(url, '[?&]id=([^&]*)', 1) AS query_id,
               regexp_replace(url, 'utm_[a-z]+=[^&]*&', '') AS clean_url
        FROM u
    """,
    "sql_group_by_all": """
        SELECT l_returnflag, l_linestatus,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
               CAST(max(l_discount) AS DOUBLE) AS max_disc
        FROM lineitem
        GROUP BY ALL
    """,
    "dup_passages": """
        WITH nt AS (
          SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
                 string_split(text, ' ') AS ts
          FROM documents
        ), g AS (
          SELECT doc_id, pos, array_to_string(ts[pos : pos + 4], ' ') AS gram
          FROM (
            SELECT doc_id, ts,
                   unnest(CASE WHEN n_tokens >= 5
                               THEN range(1, n_tokens - 3) ELSE [] END) AS pos
            FROM nt
          )
        ), dup AS (
          SELECT gram FROM g GROUP BY gram HAVING min(doc_id) <> max(doc_id)
        ), cov AS (
          SELECT DISTINCT doc_id, tp FROM (
            SELECT g.doc_id, unnest(range(g.pos, g.pos + 5)) AS tp
            FROM g JOIN dup USING (gram)
          )
        ), agg AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS dup_tokens
          FROM cov GROUP BY doc_id
        )
        SELECT n.doc_id, CAST(n.n_tokens AS BIGINT) AS n_tokens,
               coalesce(a.dup_tokens, 0) AS dup_tokens,
               round(coalesce(a.dup_tokens, 0) / n.n_tokens, 6) AS dup_frac
        FROM nt n LEFT JOIN agg a USING (doc_id)
    """,
    "dedup_containment": """
        WITH g AS (
          SELECT DISTINCT doc_id, unnest(CASE WHEN len(string_split(text, ' ')) >= 3
              THEN list_transform(range(1, len(string_split(text, ' ')) - 1),
                   i -> string_split(text, ' ')[i] || ' ' ||
                        string_split(text, ' ')[i+1] || ' ' ||
                        string_split(text, ' ')[i+2])
              ELSE [] END) AS gram
          FROM documents
        ), sz AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM g GROUP BY doc_id
        ), shared AS (
          SELECT a.doc_id AS id, b.doc_id AS contained_in,
                 CAST(count(*) AS BIGINT) AS sh
          FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id <> b.doc_id
          GROUP BY 1, 2
        )
        SELECT id, contained_in, round(sh / sa.n, 6) AS containment
        FROM shared JOIN sz sa ON id = sa.doc_id
        WHERE sh / sa.n >= 0.6
    """,
    "dedup_clusters": f"""
        WITH RECURSIVE g AS ({_GRAMS}),
        sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM g GROUP BY doc_id),
        shared AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS sh
          FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ),
        pairs AS (
          SELECT id_a, id_b FROM shared
          JOIN sz sa ON id_a = sa.doc_id
          JOIN sz sb ON id_b = sb.doc_id
          WHERE sh / (sa.n + sb.n - sh) >= 0.8
        ),
        edges AS (
          SELECT id_a AS a, id_b AS b FROM pairs
          UNION SELECT id_b, id_a FROM pairs
        ),
        reach(a, b) AS (
          SELECT a, b FROM edges
          UNION
          SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
        )
        SELECT a AS doc_id, least(a, min(b)) AS cluster_id
        FROM reach GROUP BY a
    """,
    "dedup_survivors": f"""
        WITH RECURSIVE g AS ({_GRAMS}),
        sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM g GROUP BY doc_id),
        shared AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS sh
          FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ),
        pairs AS (
          SELECT id_a, id_b FROM shared
          JOIN sz sa ON id_a = sa.doc_id
          JOIN sz sb ON id_b = sb.doc_id
          WHERE sh / (sa.n + sb.n - sh) >= 0.8
        ),
        edges AS (
          SELECT id_a AS a, id_b AS b FROM pairs
          UNION SELECT id_b, id_a FROM pairs
        ),
        reach(a, b) AS (
          SELECT a, b FROM edges
          UNION
          SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
        ),
        losers AS (
          SELECT a AS doc_id FROM reach GROUP BY a
          HAVING least(a, min(b)) <> a
        )
        SELECT doc_id, n_chars FROM documents
        WHERE doc_id NOT IN (SELECT doc_id FROM losers)
    """,
    "dedup_survivors_longest": f"""
        WITH RECURSIVE g AS ({_GRAMS}),
        sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM g GROUP BY doc_id),
        shared AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS sh
          FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ),
        pairs AS (
          SELECT id_a, id_b FROM shared
          JOIN sz sa ON id_a = sa.doc_id
          JOIN sz sb ON id_b = sb.doc_id
          WHERE sh / (sa.n + sb.n - sh) >= 0.8
        ),
        edges AS (
          SELECT id_a AS a, id_b AS b FROM pairs
          UNION SELECT id_b, id_a FROM pairs
        ),
        reach(a, b) AS (
          SELECT a, b FROM edges
          UNION
          SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
        ),
        clusters AS (
          SELECT a AS doc_id, least(a, min(b)) AS cluster_id
          FROM reach GROUP BY a
        ),
        winners AS (
          SELECT doc_id FROM (
            SELECT c.doc_id, row_number() OVER (
              PARTITION BY c.cluster_id
              ORDER BY d.n_chars DESC, c.doc_id) AS rn
            FROM clusters c JOIN documents d USING (doc_id)
          ) WHERE rn = 1
        ),
        losers AS (
          SELECT doc_id FROM clusters
          WHERE doc_id NOT IN (SELECT doc_id FROM winners)
        )
        SELECT doc_id, n_chars FROM documents
        WHERE doc_id NOT IN (SELECT doc_id FROM losers)
    """,
    "dedup_embedding_cosine": f"""
        WITH q AS ({_QVIEW}),
        p AS (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                 CAST(list_sum(list_transform(list_zip(a.qe, b.qe),
                                              p -> struct_extract(p, 1) * struct_extract(p, 2))) AS BIGINT) AS dot,
                 a.q2 AS qa2, b.q2 AS qb2
          FROM q a JOIN q b ON a.vec_id < b.vec_id
        )
        SELECT id_a, id_b, round(dot / (sqrt(qa2) * sqrt(qb2)), 6) AS cosine
        FROM p WHERE dot / (sqrt(qa2) * sqrt(qb2)) >= 0.4
    """,
    "simsearch_topk": f"""
        WITH q AS ({_QVIEW}),
        queries AS (SELECT vec_id AS query_id, qe AS qqe, q2 AS qq2 FROM q WHERE vec_id < 5),
        scored AS (
          SELECT query_id, c.vec_id,
                 CAST(list_sum(list_transform(list_zip(qqe, c.qe),
                                              p -> struct_extract(p, 1) * struct_extract(p, 2))) AS BIGINT)
                   / (sqrt(qq2) * sqrt(c.q2)) AS cosine
          FROM queries CROSS JOIN q c WHERE c.vec_id <> query_id
        ), r AS (
          SELECT query_id, vec_id, cosine,
                 row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
          FROM scored
        )
        SELECT query_id, vec_id, round(cosine, 6) AS cosine, CAST(rank AS INT) AS rank
        FROM r WHERE rank <= 10
    """,
    "knn_graph": f"""
        WITH q AS ({_QVIEW}),
        scored AS (
          SELECT a.vec_id AS id, b.vec_id AS neighbor_id,
                 CAST(list_sum(list_transform(list_zip(a.qe, b.qe),
                                              p -> struct_extract(p, 1) * struct_extract(p, 2))) AS BIGINT)
                   / (sqrt(a.q2) * sqrt(b.q2)) AS cosine
          FROM q a CROSS JOIN q b WHERE a.vec_id <> b.vec_id
        ), r AS (
          SELECT id, neighbor_id, cosine,
                 row_number() OVER (PARTITION BY id ORDER BY cosine DESC, neighbor_id) AS rank
          FROM scored
        )
        SELECT id, neighbor_id, round(cosine, 6) AS cosine, CAST(rank AS INT) AS rank
        FROM r WHERE rank <= 5
    """,
    "semdedup": f"""
        WITH RECURSIVE q AS ({_QVIEW}),
        scored AS (
          SELECT a.vec_id AS id, b.vec_id AS neighbor_id,
                 CAST(list_sum(list_transform(list_zip(a.qe, b.qe),
                                              p -> struct_extract(p, 1) * struct_extract(p, 2))) AS BIGINT)
                   / (sqrt(a.q2) * sqrt(b.q2)) AS cosine
          FROM q a CROSS JOIN q b WHERE a.vec_id <> b.vec_id
        ), r AS (
          SELECT id, neighbor_id, cosine,
                 row_number() OVER (PARTITION BY id ORDER BY cosine DESC, neighbor_id) AS rank
          FROM scored
        ),
        pairs AS (
          SELECT id AS id_a, neighbor_id AS id_b FROM r
          WHERE rank <= 5 AND round(cosine, 6) >= 0.4
        ),
        edges AS (
          SELECT id_a AS a, id_b AS b FROM pairs
          UNION SELECT id_b, id_a FROM pairs
        ),
        reach(a, b) AS (
          SELECT a, b FROM edges
          UNION
          SELECT rr.a, e.b FROM reach rr JOIN edges e ON rr.b = e.a
        ),
        comp AS (
          SELECT a AS vid, least(a, min(b)) AS cluster_id FROM reach GROUP BY a
        )
        SELECT e.vec_id,
               coalesce(c.cluster_id, e.vec_id) AS cluster_id,
               coalesce(c.cluster_id, e.vec_id) = e.vec_id AS is_survivor
        FROM embeddings e LEFT JOIN comp c ON c.vid = e.vec_id
    """,
    "text_token_stats": rf"""
        WITH s AS (
          SELECT doc_id, text,
                 CAST(length(text) AS BIGINT) AS chars_computed,
                 CASE WHEN length(trim(text)) = 0 THEN 0
                      ELSE CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
                 END AS n_tokens,
                 CASE WHEN length(trim(text)) = 0 THEN 0
                      ELSE CAST(list_sum(list_transform(
                             string_split_regex(trim(text), '\s+'),
                             w -> CAST(ceil(length(w) / 4.0) AS BIGINT))) AS BIGINT)
                 END AS n_tokens_bpe,
                 CAST(len(list_filter({_TOKS},
                        t -> list_contains(['the','a','and','of','is','to','in'], t))) AS BIGINT)
                   AS stop_hits,
                 CAST(length(regexp_replace(text, '[^\p{{L}}\p{{N}}\s]', '', 'g')) AS BIGINT)
                   AS clean_len
          FROM documents
        )
        SELECT doc_id, chars_computed, n_tokens, n_tokens_bpe,
               round(CASE WHEN n_tokens > 0
                          THEN (length(regexp_replace(trim(text), '\s+', ' ', 'g'))
                                - n_tokens + 1) / n_tokens
                          ELSE 0.0 END, 6) AS avg_token_len,
               round(CASE WHEN n_tokens > 0 THEN stop_hits / n_tokens ELSE 0.0 END, 6)
                 AS stopword_ratio,
               round(CASE WHEN chars_computed > 0
                          THEN (chars_computed - clean_len) / chars_computed
                          ELSE 0.0 END, 6) AS punct_ratio
        FROM s
    """,
    "text_quality": rf"""
        WITH s AS (
          SELECT doc_id,
                 CAST(length(text) AS BIGINT) AS n_chars,
                 CASE WHEN length(trim(text)) = 0 THEN 0
                      ELSE CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
                 END AS n_tokens,
                 CAST(len(list_filter({_TOKS},
                        t -> list_contains(['the','a','and','of','is','to','in'], t))) AS BIGINT)
                   AS stop_hits,
                 CAST(length(regexp_replace(text, '[^\p{{L}}\p{{N}}\s]', '', 'g')) AS BIGINT)
                   AS clean_len
          FROM documents
        )
        SELECT doc_id,
               round(0.4 * least(n_tokens / 100.0, 1.0)
                   + 0.3 * least((CASE WHEN n_tokens > 0 THEN stop_hits / n_tokens ELSE 0.0 END) * 5.0, 1.0)
                   + 0.3 * greatest(0.0, 1.0 - (CASE WHEN n_chars > 0 THEN (n_chars - clean_len) / n_chars ELSE 0.0 END) * 10.0),
                 6) AS quality
        FROM s
    """,
    "session_window": """
        WITH e AS (
          SELECT user_id, CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS es
          FROM events
        ), l AS (
          SELECT user_id, es,
                 -- session_window bounds are half-open: an event exactly
                 -- gap seconds after the previous one starts a NEW session
                 CASE WHEN lag(es) OVER w IS NULL
                        OR es - lag(es) OVER w >= 1800 THEN 1 ELSE 0 END AS brk
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY es)
        ), s AS (
          SELECT user_id, es,
                 SUM(brk) OVER (PARTITION BY user_id ORDER BY es
                                ROWS UNBOUNDED PRECEDING) AS sid
          FROM l
        )
        SELECT user_id,
               MIN(es) AS session_start_epoch,
               MAX(es) + 1800 AS session_end_epoch,
               CAST(count(*) AS BIGINT) AS n_events
        FROM s GROUP BY user_id, sid
    """,
    "text_langid": _langid_sql(),
    "text_fingerprint": r"""
        SELECT doc_id,
               md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
        FROM documents
    """,
    "merge_files_roundtrip": """
        SELECT n_nationkey, n_name FROM nation
        UNION ALL
        SELECT n_nationkey, n_name FROM nation WHERE n_regionkey = 0
    """,
    "mixture_sample": """
        WITH d AS (
          SELECT doc_id, lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
          FROM documents
        ),
        totals AS (
          SELECT lang, SUM(n_tokens) AS stratum_tokens FROM d GROUP BY lang
        ),
        thresholds AS (
          SELECT lang, LEAST(1000000, FLOOR(
            (CAST(20000 AS BIGINT) * 1000000 * CASE lang WHEN 'en' THEN 50 WHEN 'fr' THEN 20
                                         WHEN 'de' THEN 15 WHEN 'es' THEN 15 END)
            / (100.0 * stratum_tokens))) AS threshold
          FROM totals
          -- mirror the Spark-side guard: zero/null-token strata drop
          WHERE lang IN ('en', 'fr', 'de', 'es') AND stratum_tokens > 0
        )
        SELECT d.doc_id, d.lang, d.n_tokens
        FROM d JOIN thresholds USING (lang)
        WHERE ((d.doc_id % 999983) * 7919 + 11) % 1000000 < threshold
    """,
    "upsert_orders": """
        WITH base AS (
          SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders
        ),
        updates AS (
          SELECT o_orderkey, o_custkey, o_orderstatus,
                 o_totalprice + 1.5 AS o_totalprice
          FROM base WHERE o_orderkey % 10 = 0
          UNION ALL
          SELECT o_orderkey + 10000000, o_custkey, o_orderstatus, o_totalprice
          FROM base WHERE o_orderkey % 97 = 0
        )
        SELECT * FROM base
        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM updates)
        UNION ALL
        SELECT * FROM updates
    """,
    # The Spark side went through a JSONL write + typed re-read; hash
    # equality against the untouched parquet source certifies the round-trip.
    "jsonl_roundtrip": """
        SELECT doc_id, text, lang, n_chars FROM documents
    """,
    # The Spark side wrote JSONL with every 17th record truncated, then
    # re-ingested in PERMISSIVE mode; hash equality certifies exactly the
    # malformed records were quarantined and the rest survived intact.
    "ingest_quarantine": """
        SELECT doc_id, lang, n_chars FROM documents WHERE doc_id % 17 <> 0
    """,
    # The Spark side went through a CSV write + typed re-read; hash
    # equality against the untouched parquet source certifies the text
    # round-trip is lossless per type family.
    "csv_roundtrip": """
        SELECT o_orderkey, o_orderstatus, o_totalprice,
               CAST(epoch(o_orderdate) AS BIGINT) AS order_epoch
        FROM orders WHERE o_orderkey < 800
    """,
    "multimodal_meta_expr": """
        WITH b AS (SELECT doc_id, text, encode(text) AS payload FROM documents),
        m AS (SELECT doc_id,
                     CAST(octet_length(payload) AS BIGINT) AS n_bytes,
                     lower(substring(hex(payload), 1, 8)) AS magic,
                     lower(substring(hex(payload), 9, 8)) AS brand,
                     sha256(text) AS sha256
              FROM b)
        SELECT doc_id, n_bytes, magic, sha256,
               CASE WHEN magic LIKE '89504e47%' THEN 'image'
                    WHEN magic LIKE 'ffd8ff%' THEN 'image'
                    WHEN magic LIKE '52494646%' THEN 'audio'
                    WHEN magic LIKE '664c6143%' THEN 'audio'
                    WHEN brand = '66747970' THEN 'video'
                    ELSE 'unknown' END AS modality
        FROM m
    """,
    "multimodal_meta": """
        WITH b AS (SELECT doc_id, text, encode(text) AS payload FROM documents),
        m AS (SELECT doc_id,
                     CAST(octet_length(payload) AS BIGINT) AS n_bytes,
                     lower(substring(hex(payload), 1, 8)) AS magic,
                     lower(substring(hex(payload), 9, 8)) AS brand,
                     -- duckdb's sha256 takes VARCHAR; payload bytes ARE the
                     -- utf-8 of text, so hashing the string is identical
                     sha256(text) AS sha256
              FROM b)
        SELECT doc_id, n_bytes, magic, sha256,
               CASE WHEN magic LIKE '89504e47%' THEN 'image'
                    WHEN magic LIKE 'ffd8ff%' THEN 'image'
                    WHEN magic LIKE '52494646%' THEN 'audio'
                    WHEN magic LIKE '664c6143%' THEN 'audio'
                    WHEN brand = '66747970' THEN 'video'
                    ELSE 'unknown' END AS modality
        FROM m
    """,
    "text_repetition": f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        b AS (SELECT doc_id, toks, len(toks) AS n, list_distinct(toks) AS dt,
                     CASE WHEN len(toks) >= 2
                          THEN list_transform(range(1, len(toks)),
                                              i -> toks[i] || ' ' || toks[i+1])
                          ELSE [] END AS bg
              FROM t)
        SELECT doc_id,
               CAST(n AS BIGINT) AS n_tokens,
               CAST(len(dt) AS BIGINT) AS n_distinct_tokens,
               CASE WHEN n > 0
                    THEN round(1.0 - CAST(len(dt) AS DOUBLE) / n, 6)
                    ELSE 0.0 END AS dup_token_frac,
               CASE WHEN n > 0
                    THEN round(CAST(list_max(list_transform(dt,
                           d -> len(list_filter(toks, x -> x = d)))) AS DOUBLE) / n, 6)
                    ELSE 0.0 END AS top_token_frac,
               CASE WHEN len(bg) > 0
                    THEN round(CAST(list_max(list_transform(list_distinct(bg),
                           d -> len(list_filter(bg, x -> x = d)))) AS DOUBLE) / len(bg), 6)
                    ELSE 0.0 END AS top_bigram_frac
        FROM b
    """,
    "pii_redact": r"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
               CAST(len(regexp_extract_all(text,
                 '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ipv4,
               CAST(len(regexp_extract_all(text,
                 '\b\d{3}-\d{3}-\d{4}\b')) AS BIGINT) AS n_phones,
               regexp_replace(regexp_replace(regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                 '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
                 '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g') AS text_redacted
        FROM documents
    """,
    # Composed curation: CTE-join of the per-signal oracle specs
    # (text_quality + text_langid + text_repetition + pii_redact) with
    # the same gates as operators/curation.py — a differential check of
    # the COMPOSITION, not just each part.
    "curate_corpus": r"""
        WITH q AS (
          SELECT doc_id,
                 round(0.4 * least(n_tokens_q / 100.0, 1.0)
                     + 0.3 * least((CASE WHEN n_tokens_q > 0 THEN stop_hits / n_tokens_q ELSE 0.0 END) * 5.0, 1.0)
                     + 0.3 * greatest(0.0, 1.0 - (CASE WHEN n_chars > 0 THEN (n_chars - clean_len) / n_chars ELSE 0.0 END) * 10.0),
                   6) AS quality
          FROM (
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS n_chars,
                   CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
                   END AS n_tokens_q,
                   CAST(len(list_filter(string_split(text, ' '),
                          t -> list_contains(['the','a','and','of','is','to','in'], t))) AS BIGINT)
                     AS stop_hits,
                   CAST(length(regexp_replace(text, '[^\p{L}\p{N}\s]', '', 'g')) AS BIGINT)
                     AS clean_len
            FROM documents
          )
        ),
        l AS (
          SELECT doc_id,
                 CASE WHEN GREATEST(hits_en, hits_fr, hits_de, hits_es) = 0 THEN 'und'
                      WHEN hits_en = GREATEST(hits_en, hits_fr, hits_de, hits_es) THEN 'en'
                      WHEN hits_fr = GREATEST(hits_en, hits_fr, hits_de, hits_es) THEN 'fr'
                      WHEN hits_de = GREATEST(hits_en, hits_fr, hits_de, hits_es) THEN 'de'
                      WHEN hits_es = GREATEST(hits_en, hits_fr, hits_de, hits_es) THEN 'es'
                 END AS predicted_lang
          FROM (
            SELECT doc_id,
                   len(list_filter(string_split(text, ' '), t -> list_contains(['the', 'a', 'and', 'of', 'is'], t))) AS hits_en,
                   len(list_filter(string_split(text, ' '), t -> list_contains(['le', 'la', 'et', 'un', 'est'], t))) AS hits_fr,
                   len(list_filter(string_split(text, ' '), t -> list_contains(['der', 'die', 'und', 'ein', 'ist'], t))) AS hits_de,
                   len(list_filter(string_split(text, ' '), t -> list_contains(['el', 'la', 'y', 'un', 'es'], t))) AS hits_es
            FROM documents
          )
        ),
        r AS (
          SELECT doc_id,
                 CAST(n AS BIGINT) AS n_tokens,
                 CASE WHEN n > 0
                      THEN round(1.0 - CAST(len(dt) AS DOUBLE) / n, 6)
                      ELSE 0.0 END AS dup_token_frac,
                 CASE WHEN len(bg) > 0
                      THEN round(CAST(list_max(list_transform(list_distinct(bg),
                             d -> len(list_filter(bg, x -> x = d)))) AS DOUBLE) / len(bg), 6)
                      ELSE 0.0 END AS top_bigram_frac
          FROM (
            SELECT doc_id, toks, len(toks) AS n, list_distinct(toks) AS dt,
                   CASE WHEN len(toks) >= 2
                        THEN list_transform(range(1, len(toks)),
                                            i -> toks[i] || ' ' || toks[i+1])
                        ELSE [] END AS bg
            FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
          )
        ),
        p AS (
          SELECT doc_id,
                 regexp_replace(regexp_replace(regexp_replace(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                   '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
                   '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g') AS text_redacted
          FROM documents
        )
        SELECT q.doc_id, l.predicted_lang, q.quality,
               r.dup_token_frac, r.top_bigram_frac, r.n_tokens,
               p.text_redacted
        FROM q JOIN l USING (doc_id) JOIN r USING (doc_id) JOIN p USING (doc_id)
        WHERE q.quality >= 0.55
          AND l.predicted_lang = 'en'
          AND r.dup_token_frac <= 0.6
          AND r.top_bigram_frac <= 0.1
          AND r.n_tokens >= 20
    """,
    "source_cap": """
        SELECT source, doc_id, CAST(rn AS INT) AS rank FROM (
          SELECT source, doc_id,
                 row_number() OVER (PARTITION BY source
                   ORDER BY ((doc_id % 999983) * 7919) % 1000000, doc_id) AS rn
          FROM documents
        ) WHERE rn <= 10
    """,
    "embed_normalize": f"""
        SELECT vec_id,
               CAST(unnest(range(0, len(qe))) AS INT) AS pos,
               unnest(list_transform(range(1, len(qe) + 1),
                 i -> CASE WHEN q2 > 0
                           THEN CAST(floor(CAST(qe[i] AS DOUBLE) * 127
                                           / sqrt(CAST(q2 AS DOUBLE))) AS BIGINT)
                           ELSE CAST(0 AS BIGINT) END)) AS q_unit,
               CASE WHEN q2 > 0
                    THEN CAST(floor(sqrt(CAST(q2 AS DOUBLE)) * 1000000) AS BIGINT)
                    ELSE CAST(0 AS BIGINT) END AS norm_q
        FROM ({_QVIEW})
    """,
    "pivot_event_counts": """
        SELECT user_id,
               CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS n_click,
               CAST(count(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS n_error,
               CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS n_purchase,
               CAST(count(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS n_signup,
               CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS n_view
        FROM events GROUP BY user_id
    """,
    "intersect_custkeys": """
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        INTERSECT
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    """,
    "except_custkeys": """
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        EXCEPT
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    """,
    "global_row_ids": """
        SELECT o_orderkey, o_totalprice,
               CAST(row_number() OVER (ORDER BY o_totalprice NULLS FIRST, o_orderkey) AS BIGINT)
                   AS row_id
        FROM orders
    """,
    "file_stats": """
        SELECT o_orderkey % 8 AS bucket,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN o_orderkey % 13 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
               min(CASE WHEN o_orderkey % 13 = 0 THEN NULL ELSE o_totalprice END) AS vmin,
               max(CASE WHEN o_orderkey % 13 = 0 THEN NULL ELSE o_totalprice END) AS vmax
        FROM orders GROUP BY 1
    """,
    "skipping_scan": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders WHERE o_orderkey BETWEEN 2000 AND 4500
    """,
    "compact_small_files": "SELECT doc_id, text, lang, n_chars FROM documents",
    "profile_table": """
        SELECT 'c_custkey' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
               CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_distinct,
               CAST(min(c_custkey) AS VARCHAR) AS min_str,
               CAST(max(c_custkey) AS VARCHAR) AS max_str
        FROM customer
        UNION ALL
        SELECT 'c_name', CAST(count(*) AS BIGINT),
               CAST(sum(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(count(DISTINCT c_name) AS BIGINT),
               CAST(min(c_name) AS VARCHAR), CAST(max(c_name) AS VARCHAR)
        FROM customer
        UNION ALL
        SELECT 'c_nationkey', CAST(count(*) AS BIGINT),
               CAST(sum(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(count(DISTINCT c_nationkey) AS BIGINT),
               CAST(min(c_nationkey) AS VARCHAR), CAST(max(c_nationkey) AS VARCHAR)
        FROM customer
        UNION ALL
        SELECT 'c_mktsegment', CAST(count(*) AS BIGINT),
               CAST(sum(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(count(DISTINCT c_mktsegment) AS BIGINT),
               CAST(min(c_mktsegment) AS VARCHAR), CAST(max(c_mktsegment) AS VARCHAR)
        FROM customer
    """,
    "data_quality_report": """
        SELECT 'custkey_not_null' AS rule,
               CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
        FROM orders
        UNION ALL
        SELECT 'price_positive',
               CAST(sum(CASE WHEN NOT coalesce(o_totalprice > 0, FALSE) THEN 1 ELSE 0 END) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'price_below_cap',
               CAST(sum(CASE WHEN NOT coalesce(o_totalprice <= 400000, FALSE) THEN 1 ELSE 0 END) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'status_known',
               CAST(sum(CASE WHEN NOT coalesce(o_orderstatus IN ('O','F','P'), FALSE) THEN 1 ELSE 0 END) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'orderkey_unique', CAST(coalesce(sum(extra), 0) AS BIGINT)
        FROM (SELECT count(*) - 1 AS extra FROM orders GROUP BY o_orderkey)
        UNION ALL
        SELECT 'custkey_unique', CAST(coalesce(sum(extra), 0) AS BIGINT)
        FROM (SELECT count(*) - 1 AS extra FROM orders GROUP BY o_custkey)
    """,
    "train_test_split": """
        SELECT doc_id, lang, n_chars,
               CASE WHEN g < 800000 THEN 'train'
                    WHEN g < 900000 THEN 'val'
                    ELSE 'test' END AS split
        FROM (SELECT doc_id, lang, n_chars,
                     ((doc_id % 999983) * 7919) % 1000000 AS g
              FROM documents)
    """,
    "zorder_scan": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders WHERE o_totalprice BETWEEN 100000.0 AND 150000.0
    """,
    "price_histogram": """
        SELECT bin,
               0.0 + bin * 50000.0 AS bin_lo,
               0.0 + (bin + 1) * 50000.0 AS bin_hi,
               CAST(count(*) AS BIGINT) AS n
        FROM (
            SELECT LEAST(CAST(FLOOR((o_totalprice - 0.0) / 50000.0) AS BIGINT), 11) AS bin
            FROM orders
            WHERE o_totalprice BETWEEN 0.0 AND 600000.0
        ) GROUP BY bin
    """,
    "snapshot_diff": """
        WITH old_t AS (
            SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        ),
        new_t AS (
            SELECT o_orderkey, o_custkey,
                   CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 1.5
                        ELSE o_totalprice END AS o_totalprice
            FROM orders WHERE o_orderkey % 17 <> 0
            UNION ALL
            SELECT o_orderkey + 10000000, o_custkey, o_totalprice
            FROM orders WHERE o_orderkey % 97 = 0
        )
        SELECT coalesce(n.o_orderkey, o.o_orderkey) AS o_orderkey,
               CASE WHEN n.o_orderkey IS NOT NULL THEN n.o_custkey
                    ELSE o.o_custkey END AS o_custkey,
               CASE WHEN n.o_orderkey IS NOT NULL THEN n.o_totalprice
                    ELSE o.o_totalprice END AS o_totalprice,
               CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                    WHEN n.o_orderkey IS NULL THEN 'delete'
                    ELSE 'update' END AS change
        FROM old_t o FULL JOIN new_t n ON o.o_orderkey = n.o_orderkey
        WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
           OR NOT (o.o_custkey IS NOT DISTINCT FROM n.o_custkey
                   AND o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice)
    """,
    "event_attribution": """
        SELECT e1.user_id AS user_id,
               e1.event_id AS left_id,
               e2.event_id AS right_id,
               CAST(FLOOR(epoch(CAST(e1.ts AS TIMESTAMP))) AS BIGINT) AS left_epoch,
               CAST(FLOOR(epoch(CAST(e2.ts AS TIMESTAMP))) AS BIGINT) AS right_epoch
        FROM events e1 JOIN events e2
          ON e1.user_id = e2.user_id
         AND e1.event_type = 'click' AND e2.event_type = 'view'
         AND e2.ts > e1.ts AND e2.ts <= e1.ts + INTERVAL 240 MINUTE
    """,
    "schema_evolution_scan": """
        SELECT c_custkey, c_name, c_nationkey FROM customer
        UNION ALL BY NAME
        SELECT c_custkey, c_acctbal, c_mktsegment FROM customer
        WHERE c_mktsegment = 'BUILDING'
    """,
}

# The end-to-end pipeline oracle COMPOSES the stage oracles (curation SQL
# reused verbatim as a CTE), so the differential check covers the chain,
# not just the pieces.  Chunking/packing constants mirror
# q_corpus_pipeline: 64-token chunks, 8 overlap (step 56), 2048 budget,
# shard = doc_id % 8.
ORACLE_SQL["corpus_pipeline"] = f"""
    WITH curated AS ({ORACLE_SQL["curate_corpus"]}),
    t AS (
      SELECT doc_id,
             string_split(text_redacted, ' ') AS toks,
             len(string_split(text_redacted, ' ')) AS n
      FROM curated
    ),
    s AS (
      SELECT doc_id, n,
             unnest(range(1, greatest(n - 8, 1) + 1, 56)) AS start
      FROM t
    ),
    chunks AS (
      SELECT s.doc_id,
             CAST(row_number() OVER (PARTITION BY s.doc_id ORDER BY start)
               AS INT) AS chunk_idx,
             CAST(least(s.n - start + 1, 64) AS BIGINT) AS n_chunk_tokens
      FROM s JOIN t ON s.doc_id = t.doc_id
    ),
    ch AS (
      SELECT *, doc_id * 1000000 + chunk_idx AS chunk_id,
             doc_id % 8 AS shard
      FROM chunks
    )
    SELECT doc_id, chunk_idx, n_chunk_tokens, shard,
           CAST(FLOOR((SUM(n_chunk_tokens) OVER (PARTITION BY shard
                         ORDER BY chunk_id ROWS UNBOUNDED PRECEDING)
                       - n_chunk_tokens) / 2048) AS BIGINT) AS bin_id
    FROM ch
"""

# The persisted-gram-index probe must return byte-identical results to the
# direct one-pass decontamination — same oracle certifies both paths.
ORACLE_SQL["decontaminate_indexed"] = ORACLE_SQL["decontaminate"]

# The streaming MERGE replays the upsert as a micro-batch sequence with
# disjoint update key sets, so the final table state must equal the
# one-shot batch upsert — same oracle certifies the streaming path.
ORACLE_SQL["stream_upsert"] = ORACLE_SQL["upsert_orders"]

# append-mode stream over time-ordered micro-batches == the one-shot
# batch window aggregate (the sentinel row is filtered on the Spark side
# and never exists in the oracle's events table)
ORACLE_SQL["stream_window_agg"] = ORACLE_SQL["window_agg_events"]

# streamed sessions over ordered batches (with cross-batch session merge)
# == the one-shot batch sessionization
ORACLE_SQL["stream_session_window"] = ORACLE_SQL["session_window"]


QUERIES: dict[str, QueryFn] = {
    "scan_parquet": q_scan_parquet,
    "projection": q_projection,
    "filter_pushdown": q_filter_pushdown,
    "union_all": q_union_all,
    "union_common_columns": q_union_common_columns,
    "row_count": q_row_count,
    "group_count_having": q_group_count_having,
    "distinct_rows": q_distinct_rows,
    "sort_limit": q_sort_limit,
    "filter_contains": q_filter_contains,
    "internal_column_drop": q_internal_column_drop,
    "cast_string_null_empty": q_cast_string_null_empty,
    "sanitize_name": q_sanitize_name,
    "basename_stem": q_basename_stem,
    "lower_contains": q_lower_contains,
    "pricing_summary": q_pricing_summary,
    "top_revenue_orders": q_top_revenue_orders,
    "nation_revenue": q_nation_revenue,
    "trailing_window_avg": q_trailing_window_avg,
    "global_row_ids": q_global_row_ids,
    "file_stats": q_file_stats,
    "skipping_scan": q_skipping_scan,
    "compact_small_files": q_compact_small_files,
    "schema_evolution_scan": q_schema_evolution_scan,
    "event_attribution": q_event_attribution,
    "profile_table": q_profile_table,
    "price_histogram": q_price_histogram,
    "zorder_scan": q_zorder_scan,
    "snapshot_diff": q_snapshot_diff,
    "data_quality_report": q_data_quality_report,
    "train_test_split": q_train_test_split,
    "funnel_steps": q_funnel_steps,
    "retention_cohorts": q_retention_cohorts,
    "gapfill_locf": q_gapfill_locf,
    "fuzzy_match": q_fuzzy_match,
    "cube_revenue": q_cube_revenue,
    "corr_matrix": q_corr_matrix,
    "scd2_customers": q_scd2_customers,
    "scd2_asof_lookup": q_scd2_asof_lookup,
    "bigram_counts": q_bigram_counts,
    "event_transitions": q_event_transitions,
    "value_band_stats": q_value_band_stats,
    "decile_binning": q_decile_binning,
    "weighted_sample": q_weighted_sample,
    "feature_hashing": q_feature_hashing,
    "orc_roundtrip": q_orc_roundtrip,
    "value_outliers": q_value_outliers,
    "string_functions": q_string_functions,
    "pagerank": q_pagerank,
    "window_functions": q_window_functions,
    "datetime_functions": q_datetime_functions,
    "array_functions": q_array_functions,
    "udtf_tokens": q_udtf_tokens,
    "unpivot_measures": q_unpivot_measures,
    "null_functions": q_null_functions,
    "sql_star_join": q_sql_star_join,
    "sql_having_subquery": q_sql_having_subquery,
    "sql_recursive_cte": q_sql_recursive_cte,
    "sql_correlated_subquery": q_sql_correlated_subquery,
    "sql_custdist": q_sql_custdist,
    "variant_extract": q_variant_extract,
    "string_agg_groups": q_string_agg_groups,
    "ohlc_hourly": q_ohlc_hourly,
    "grouping_sets_revenue": q_grouping_sets_revenue,
    "robust_outliers": q_robust_outliers,
    "from_csv_extract": q_from_csv_extract,
    "decimal_aggregates": q_decimal_aggregates,
    "corpus_pipeline": q_corpus_pipeline,
    "sql_parameterized": q_sql_parameterized,
    "rare_token_stats": q_rare_token_stats,
    "xml_extract": q_xml_extract,
    "map_functions": q_map_functions,
    "try_functions": q_try_functions,
    "range_lookup_bucketed": q_range_lookup_bucketed,
    "regex_functions": q_regex_functions,
    "math_functions": q_math_functions,
    "hll_rollup": q_hll_rollup,
    "semi_join_customers": q_semi_join_customers,
    "anti_join_customers": q_anti_join_customers,
    "left_join_null_fill": q_left_join_null_fill,
    "topk_per_group": q_topk_per_group,
    "json_extract": q_json_extract,
    "window_agg_events": q_window_agg_events,
    "sliding_window_events": q_sliding_window_events,
    "sessionize": q_sessionize,
    "session_window": q_session_window,
    "chunk_documents": q_chunk_documents,
    "pack_sequences": q_pack_sequences,
    "user_event_profile": q_user_event_profile,
    "daily_order_stats": q_daily_order_stats,
    "event_percentiles": q_event_percentiles,
    "rollup_revenue": q_rollup_revenue,
    "text_tfidf": q_text_tfidf,
    "asof_join": q_asof_join,
    "sample_stratified": q_sample_stratified,
    "mixture_sample": q_mixture_sample,
    "decontaminate": q_decontaminate,
    "decontaminate_indexed": q_decontaminate_indexed,
    "dedup_exact": q_dedup_exact,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dup_passages": q_dup_passages,
    "dedup_containment": q_dedup_containment,
    "keyness_terms": q_keyness_terms,
    "skew_salted_join": q_skew_salted_join,
    "asof_join_forward": q_asof_join_forward,
    "dedup_survivors_longest": q_dedup_survivors_longest,
    "twap_user": q_twap_user,
    "multimodal_decode": q_multimodal_decode,
    "multimodal_audio_decode": q_multimodal_audio_decode,
    "stream_dedup": q_stream_dedup,
    "stream_upsert_history": q_stream_upsert_history,
    "stream_enrich": q_stream_enrich,
    "cdc_apply": q_cdc_apply,
    "incremental_agg_refresh": q_incremental_agg_refresh,
    "vocab_encode": q_vocab_encode,
    "url_functions": q_url_functions,
    "sql_group_by_all": q_sql_group_by_all,
    "embed_kmeans": q_embed_kmeans,
    "dedup_clusters": q_dedup_clusters,
    "dedup_survivors": q_dedup_survivors,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_simhash": q_dedup_simhash,
    "dedup_embedding_cosine": q_dedup_embedding_cosine,
    "simsearch_topk": q_simsearch_topk,
    "knn_graph": q_knn_graph,
    "semdedup": q_semdedup,
    "sketch_stats": q_sketch_stats,
    "simsearch_ivf": q_simsearch_ivf,
    "simsearch_ivf_indexed": q_simsearch_ivf_indexed,
    "simsearch_pq": q_simsearch_pq,
    "simsearch_pq_indexed": q_simsearch_pq_indexed,
    "text_token_stats": q_text_token_stats,
    "text_quality": q_text_quality,
    "text_langid": q_text_langid,
    "text_fingerprint": q_text_fingerprint,
    "multimodal_meta": q_multimodal_meta,
    "multimodal_meta_expr": q_multimodal_meta_expr,
    "text_repetition": q_text_repetition,
    "pii_redact": q_pii_redact,
    "curate_corpus": q_curate_corpus,
    "source_cap": q_source_cap,
    "embed_normalize": q_embed_normalize,
    "pivot_event_counts": q_pivot_event_counts,
    "intersect_custkeys": q_intersect_custkeys,
    "except_custkeys": q_except_custkeys,
    "merge_files_roundtrip": q_merge_files_roundtrip,
    "csv_roundtrip": q_csv_roundtrip,
    "jsonl_roundtrip": q_jsonl_roundtrip,
    "ingest_quarantine": q_ingest_quarantine,
    "upsert_orders": q_upsert_orders,
    "stream_upsert": q_stream_upsert,
    "stream_window_agg": q_stream_window_agg,
    "stream_session_window": q_stream_session_window,
    "stream_near_dedup": q_stream_near_dedup,
}


# --------------------------------------------------------------------------
# Round-3 widening: TPC-H analytic shapes (Q14/Q19/Q21/Q22), graph
# triangles, BM25 retrieval ranking, stream-stream interval join
# --------------------------------------------------------------------------


def q_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape: per ship-month share of promotional revenue —
    conditional aggregation over a broadcast part join.  The pct is
    computed from the ROUNDED month sums, so the ratio is bit-stable
    across engines (the unrounded double sums are order-sensitive in the
    last ulp; the rounded inputs are identical by the sum contract the
    whole pricing family already relies on)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    m = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(
            F.round(
                F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))),
                2,
            ).alias("promo_revenue"),
            F.round(F.sum(rev), 2).alias("total_revenue"),
        )
    )
    return m.select(
        "ship_month",
        "promo_revenue",
        "total_revenue",
        F.round(
            F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue"), 6
        ).alias("promo_pct"),
    )


def q_disjunctive_pushdown(spark, sf_dir):
    """TPC-H Q19 shape: an OR of (brand, size-range, quantity-range)
    conjunctions across the lineitem-part join — the classic test that
    the optimizer pushes each disjunct's single-table predicates to the
    scans (part prunes on brand/size, lineitem on quantity) instead of
    evaluating the whole OR post-join."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    q, s, br = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    cond = (
        ((br == "Brand#15") & s.between(1, 20) & q.between(1, 15))
        | ((br == "Brand#23") & s.between(10, 35) & q.between(10, 30))
        | ((br == "Brand#21") & s.between(20, 50) & q.between(25, 50))
    )
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        j.filter(cond)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum(rev), 2).alias("revenue"),
        )
    )


def q_late_supplier_orders(spark, sf_dir):
    """TPC-H Q21 shape (suppliers who kept multi-supplier orders
    waiting), reformulated Spark-first: instead of the textbook
    double-correlated EXISTS / NOT EXISTS (two extra probes of the full
    lineitem), ONE pass computes per-(order, supplier) lateness, one
    per-order rollup counts suppliers and late suppliers, and the blame
    filter is a broadcast-friendly join — same semantics, one lineitem
    scan.  late = shipped more than 75 days after the order date."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    late = (
        F.datediff(
            F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
        )
        > 75
    ).cast("int")
    per_os = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("late"))
    )
    per_o = per_os.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"), F.sum("late").alias("n_late")
    )
    blamed = (
        per_os.join(per_o, "l_orderkey")
        .filter(
            (F.col("late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late") == 1)
        )
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    return (
        blamed.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(25)
    )


def q_idle_customers(spark, sf_dir):
    """TPC-H Q22 shape: well-funded customers gone idle (no order since
    2000) — a scalar aggregate subquery (global positive-balance
    average, broadcast as a 1-row frame) gating an ANTI join against the
    recent order keys, rolled up by nation.  The recency filter scopes
    the anti-join side (the fixtures give every customer SOME order, so
    the textbook never-ordered variant returns zero rows and would
    check nothing)."""
    c = _t(spark, sf_dir, "customer")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
        .distinct()
    )
    # the gate average is ROUNDED to cents before comparing: the raw
    # IEEE avg is aggregation-order-sensitive in its last ulp, and a
    # balance sitting between two engines' averages would flip
    # membership (same determinism contract as promo_revenue's rounded
    # sums; balances are 2-decimal, so post-round boundary ties compare
    # identically in both engines)
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.round(F.avg("c_acctbal"), 2).alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").cast("long").alias("c_nationkey"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


def q_graph_triangles(spark, sf_dir):
    """Exact triangle census of the part co-purchase graph (parts
    appearing in the same order are connected).  The degree-ordered
    orientation bounds the wedge join at O(E^1.5) — see
    :func:`operators.graph.triangle_count` for the 100 TB argument.
    All-integer output, hash-exact across engines."""
    from parquet_merger_spark.operators.graph import triangle_count

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pb"))
    # no .distinct() here: pairs are already canonical (pa < pb) and
    # triangle_count dedups internally — a query-level distinct would
    # shuffle the same key set twice
    pairs = (
        a.join(b, "k")
        .filter(F.col("pa") < F.col("pb"))
        .select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
    )
    return triangle_count(pairs)


def q_bm25_rank(spark, sf_dir):
    """BM25 retrieval ranking of the corpus against a fixed query term
    set — the lexical tier of a retrieval/RAG stack (the ANN family is
    the semantic tier).  Deterministic across engines: ratio idf, fixed
    per-term summation order, rounded once (see
    :func:`operators.textstats.bm25_scores`)."""
    from parquet_merger_spark.operators.textstats import bm25_scores

    d = _t(spark, sf_dir, "documents")
    return (
        bm25_scores(d, ["spark", "merge", "query"])
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(50)
    )


def q_stream_interval_join(spark, sf_dir):
    """STREAM-STREAM interval join driven end-to-end: events replay in
    three mtime-pinned micro-batches through
    :func:`streaming.events.correlate_streams` (each click joined to the
    same user's views in the next 30 minutes).  The replay watermark is
    set far past the fixture horizon so no row is ever evicted
    mid-replay and the stream provably equals the batch interval join
    (the oracle); production bounds state with a real watermark —
    state is O(rate x horizon), the pattern that makes stream-stream
    joins bounded at all."""
    import shutil
    import uuid

    from parquet_merger_spark.streaming.events import correlate_streams

    base = _scratch_dir(spark, "stream_ijoin")
    shutil.rmtree(base, ignore_errors=True)

    e = _events(spark, sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    src = _write_replay_batches(
        base, [e.filter(F.col("event_id") % 3 == i) for i in range(3)]
    )
    name = f"sij_{uuid.uuid4().hex[:8]}"
    q = correlate_streams(
        spark,
        src,
        os.path.join(base, "ckpt"),
        left_type="click",
        right_type="view",
        horizon_minutes=30,
        watermark="36500 days",
        query_name=name,
    )
    _drain_stream(q, "stream_interval_join")
    return spark.table(name).select(
        "user_id",
        "left_id",
        "right_id",
        F.unix_timestamp("left_ts").alias("left_epoch"),
        F.unix_timestamp("right_ts").alias("right_epoch"),
    )


ORACLE_SQL["promo_revenue"] = """
    WITH m AS (
      SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
             round(sum(CASE WHEN p_type = 'PROMO'
                            THEN l_extendedprice * (1.0 - l_discount)
                            ELSE 0.0 END), 2) AS promo_revenue,
             round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS total_revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY 1
    )
    SELECT ship_month, promo_revenue, total_revenue,
           round(100.0 * promo_revenue / total_revenue, 6) AS promo_pct
    FROM m
"""

ORACLE_SQL["disjunctive_pushdown"] = """
    SELECT p_brand,
           CAST(count(*) AS BIGINT) AS n_items,
           round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 1 AND 15)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 35 AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#21' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 25 AND 50)
    GROUP BY p_brand
"""

ORACLE_SQL["late_supplier_orders"] = """
    WITH per_os AS (
      SELECT l_orderkey, l_suppkey,
             max(CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
                                     CAST(l_shipdate AS DATE)) > 75
                      THEN 1 ELSE 0 END) AS late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2
    ), per_o AS (
      SELECT l_orderkey,
             count(*) AS n_supp,
             sum(late) AS n_late
      FROM per_os GROUP BY 1
    ), blamed AS (
      SELECT l_suppkey, CAST(count(*) AS BIGINT) AS numwait
      FROM per_os JOIN per_o USING (l_orderkey)
      WHERE late = 1 AND n_supp > 1 AND n_late = 1
      GROUP BY 1
    )
    SELECT s_name, numwait
    FROM blamed JOIN supplier ON l_suppkey = s_suppkey
    ORDER BY numwait DESC, s_name
    LIMIT 25
"""

ORACLE_SQL["idle_customers"] = """
    WITH avg_bal AS (
      SELECT round(avg(c_acctbal), 2) AS avg_bal FROM customer WHERE c_acctbal > 0
    )
    SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
           CAST(count(*) AS BIGINT) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM customer CROSS JOIN avg_bal
    WHERE c_acctbal > avg_bal
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY 1
"""

ORACLE_SQL["graph_triangles"] = """
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
      SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS deg
      FROM (SELECT a AS node FROM edges UNION ALL SELECT b FROM edges)
      GROUP BY 1
    ),
    o AS (
      SELECT CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND e.a < e.b)
                  THEN e.a ELSE e.b END AS s,
             CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND e.a < e.b)
                  THEN e.b ELSE e.a END AS t,
             CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND e.a < e.b)
                  THEN db.deg ELSE da.deg END AS degt
      FROM edges e
      JOIN deg da ON da.node = e.a
      JOIN deg db ON db.node = e.b
    ),
    wedges AS (
      SELECT o1.t AS t1, o2.t AS t2
      FROM o o1 JOIN o o2 ON o1.s = o2.s
      WHERE o1.degt < o2.degt OR (o1.degt = o2.degt AND o1.t < o2.t)
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_vertices,
           (SELECT CAST(count(*) AS BIGINT) FROM edges) AS n_edges,
           (SELECT CAST(count(*) AS BIGINT) FROM wedges) AS n_oriented_wedges,
           (SELECT CAST(count(*) AS BIGINT) FROM wedges w
             WHERE EXISTS (SELECT 1 FROM o WHERE o.s = w.t1 AND o.t = w.t2)
           ) AS n_triangles
"""

ORACLE_SQL["bm25_rank"] = """
    WITH tf AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
      WHERE term IN ('spark', 'merge', 'query')
      GROUP BY 1, 2
    ),
    df_t AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
    st AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
      FROM dl
    ),
    sc AS (
      SELECT tf.doc_id, tf.term,
             ((n_docs - df + 0.5) / (df + 0.5))
             * (tf * (1.2 + 1.0))
             / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)) AS s
      FROM tf JOIN df_t USING (term) JOIN dl USING (doc_id) CROSS JOIN st
    ),
    pv AS (
      SELECT doc_id,
             coalesce(max(CASE WHEN term = 'spark' THEN s END), 0.0)
           + coalesce(max(CASE WHEN term = 'merge' THEN s END), 0.0)
           + coalesce(max(CASE WHEN term = 'query' THEN s END), 0.0) AS tot
      FROM sc GROUP BY doc_id
    )
    SELECT d.doc_id, round(coalesce(pv.tot, 0.0), 6) AS bm25
    FROM documents d LEFT JOIN pv USING (doc_id)
    ORDER BY bm25 DESC, doc_id
    LIMIT 50
"""

ORACLE_SQL["stream_interval_join"] = """
    WITH e AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type
      FROM events
    ),
    l AS (SELECT user_id, event_id AS left_id, ts AS lts FROM e WHERE event_type = 'click'),
    r AS (SELECT user_id, event_id AS right_id, ts AS rts FROM e WHERE event_type = 'view')
    SELECT l.user_id, left_id, right_id,
           CAST(FLOOR(epoch(lts)) AS BIGINT) AS left_epoch,
           CAST(FLOOR(epoch(rts)) AS BIGINT) AS right_epoch
    FROM l JOIN r
      ON l.user_id = r.user_id
     AND rts > lts
     AND rts <= lts + INTERVAL 30 MINUTE
"""

QUERIES["promo_revenue"] = q_promo_revenue
QUERIES["disjunctive_pushdown"] = q_disjunctive_pushdown
QUERIES["late_supplier_orders"] = q_late_supplier_orders
QUERIES["idle_customers"] = q_idle_customers
QUERIES["graph_triangles"] = q_graph_triangles
QUERIES["bm25_rank"] = q_bm25_rank
QUERIES["stream_interval_join"] = q_stream_interval_join


def q_dedup_pipeline_lsh(spark, sf_dir):
    """The COMPOSED headline dedup pipeline, end to end: MinHash-LSH
    candidate pairs -> connected-component cluster resolution ->
    smallest-id survivor per cluster — i.e. exactly what a 100 TB corpus
    dedup runs (the per-stage keys ``dedup_minhash_lsh``,
    ``dedup_clusters``, ``dedup_survivors`` each verify one stage; this
    key verifies the composition).  Rows-only (xxhash64-seeded LSH has
    no DuckDB twin); deterministic, and pinned in
    tests/test_clusters.py against an independent union-find replay of
    the same pairs."""
    from parquet_merger_spark.operators.dedup import (
        minhash_lsh_pairs,
        near_dedup_survivors,
    )

    d = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(d, num_hashes=64, bands=16, threshold=0.5)
    return near_dedup_survivors(d, pairs).select("doc_id", "n_chars")


QUERIES["dedup_pipeline_lsh"] = q_dedup_pipeline_lsh


def q_bpe_merges(spark, sf_dir):
    """BPE tokenizer TRAINING (first 8 merge rules over the corpus) —
    the iterative-algorithm class applied to text: loop state is the
    word vocabulary, never the corpus (see
    :func:`operators.textstats.bpe_learn_merges`).  Rows-only: the
    merge loop is not SQL-expressible without unrolling; determinism is
    total (count desc, pair asc tie-break) and the exact rule sequence
    is pinned against a pure-Python BPE replay in
    tests/test_textstats_ext.py."""
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from parquet_merger_spark.operators.textstats import bpe_learn_merges

    d = _t(spark, sf_dir, "documents")
    rules = bpe_learn_merges(d, k=8)
    schema = StructType(
        [
            StructField("step", IntegerType()),
            StructField("left", StringType()),
            StructField("right", StringType()),
            StructField("merged", StringType()),
            StructField("pair_count", LongType()),
        ]
    )
    return spark.createDataFrame(rules, schema)


QUERIES["bpe_merges"] = q_bpe_merges


def q_bpe_encode(spark, sf_dir):
    """Corpus tokenization with the trained BPE model (the encode half
    of `bpe_merges`): broadcast word->subwords dictionary join + ordered
    row-local re-assembly; the merge fold never touches corpus rows.
    Rows-only (depends on the iterative training loop); pinned against
    the pure-Python replay in tests/test_textstats_ext.py."""
    from parquet_merger_spark.operators.textstats import bpe_encode_docs

    d = _t(spark, sf_dir, "documents")
    return bpe_encode_docs(d, k=8)


QUERIES["bpe_encode"] = q_bpe_encode

def q_market_share(spark, sf_dir):
    """TPC-H Q8 shape: one supplier nation's share of a regional market's
    order volume, per order year — 6-table star join with every
    dimension broadcast, conditional aggregation, and the share ratio
    computed from the ROUNDED yearly sums (the promo_revenue determinism
    rule).  Market = customers of region AMERICA; contender =
    suppliers of NATION_1."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey", "n_name"
    )
    r = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    market_cust = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name") == "AMERICA")
        .select("c_custkey")
    )
    supp_n = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", F.col("n_name").alias("supp_nation")
    )
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(market_cust, o.o_custkey == market_cust.c_custkey, "left_semi")
        .join(F.broadcast(supp_n), li.l_suppkey == supp_n.s_suppkey)
        .groupBy(F.year("o_orderdate").alias("yr"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_1", rev).otherwise(
                        F.lit(0.0)
                    )
                ),
                2,
            ).alias("nation_volume"),
            F.round(F.sum(rev), 2).alias("market_volume"),
        )
        .select(
            "yr",
            "nation_volume",
            "market_volume",
            F.round(
                F.col("nation_volume") / F.col("market_volume"), 6
            ).alias("mkt_share"),
        )
    )


def q_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape (top supplier): per-supplier revenue over a ship
    window, then the supplier(s) achieving the MAXIMUM — an
    aggregate-of-an-aggregate via a broadcast 1-row max, the
    decorrelated form of Q15's scalar view subquery."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    per_supp = li.groupBy("l_suppkey").agg(
        F.round(F.sum(rev), 2).alias("total_revenue")
    )
    mx = per_supp.agg(F.max("total_revenue").alias("mx"))
    return (
        per_supp.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey"), F.col("s_name"), F.col("total_revenue")
        )
    )


def q_parts_supplier_count(spark, sf_dir):
    """TPC-H Q16 shape: distinct-supplier counts per (brand, type,
    size-band), EXCLUDING a supplier set via NOT IN (decorrelates to a
    broadcast anti-join) — the exclusion set here is suppliers in
    arrears (negative balance), standing in for Q16's comment filter
    (the fixtures carry no s_comment)."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = _t(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_type", "p_size"
    )
    bad = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(
            "p_brand",
            "p_type",
            (F.floor(F.col("p_size") / 10) * 10).alias("size_band"),
        )
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


ORACLE_SQL["market_share"] = """
    WITH market_cust AS (
      SELECT c_custkey FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'AMERICA'
    ), supp_n AS (
      SELECT s_suppkey, n_name AS supp_nation FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
    ), yearly AS (
      SELECT year(o_orderdate) AS yr,
             round(sum(CASE WHEN supp_nation = 'NATION_1'
                            THEN l_extendedprice * (1.0 - l_discount)
                            ELSE 0.0 END), 2) AS nation_volume,
             round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS market_volume
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supp_n ON l_suppkey = s_suppkey
      WHERE o_custkey IN (SELECT c_custkey FROM market_cust)
      GROUP BY 1
    )
    SELECT yr, nation_volume, market_volume,
           round(nation_volume / market_volume, 6) AS mkt_share
    FROM yearly
"""

ORACLE_SQL["top_supplier"] = """
    WITH per_supp AS (
      SELECT l_suppkey, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-07-01'
      GROUP BY 1
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM per_supp JOIN supplier ON l_suppkey = s_suppkey
    WHERE total_revenue = (SELECT max(total_revenue) FROM per_supp)
"""

ORACLE_SQL["parts_supplier_count"] = """
    SELECT p_brand, p_type,
           CAST(floor(p_size / 10) * 10 AS BIGINT) AS size_band,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_suppkey NOT IN (
      SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
    )
    GROUP BY 1, 2, 3
"""

QUERIES["market_share"] = q_market_share
QUERIES["top_supplier"] = q_top_supplier
QUERIES["parts_supplier_count"] = q_parts_supplier_count


def q_rolling_wau(spark, sf_dir):
    """7-day rolling distinct active users per day (WAU) — the rolling
    DISTINCT idiom: window frames cannot express COUNT(DISTINCT), so
    each (day, user) activity row is EXPLODED to the 7 target days it
    contributes to (day .. day+6) and the rollup is a plain
    groupBy+count_distinct.  Scale shape: the explode is a bounded x7
    row-local fan-out of the already-deduplicated (day, user) pairs
    (NOT raw events), and the aggregate is one hash shuffle — no
    per-day self-joins, no window state.  Days with no active window
    are absent (no zero-fill; gapfill_locf covers that idiom)."""
    e = _events(spark, sf_dir)
    day_user = (
        e.select(
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
            "user_id",
        )
        .distinct()
    )
    contrib = day_user.select(
        F.explode(
            F.sequence(
                F.col("day"), F.date_add(F.col("day"), 6)
            )
        ).alias("target_day"),
        "user_id",
    )
    # clip to the observed day domain so trailing days past the last
    # event (pure artifacts of the fan-out) are excluded
    max_day = day_user.agg(F.max("day").alias("max_day"))
    return (
        contrib.crossJoin(F.broadcast(max_day))
        .filter(F.col("target_day") <= F.col("max_day"))
        .groupBy(F.col("target_day").cast("string").alias("day"))
        .agg(F.count_distinct("user_id").alias("wau"))
    )


ORACLE_SQL["rolling_wau"] = """
    WITH day_user AS (
      SELECT DISTINCT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
             user_id
      FROM events
    ), contrib AS (
      SELECT CAST(unnest(generate_series(day, day + INTERVAL 6 DAY, INTERVAL 1 DAY)) AS DATE) AS target_day,
             user_id
      FROM day_user
    )
    SELECT CAST(target_day AS VARCHAR) AS day,
           CAST(count(DISTINCT user_id) AS BIGINT) AS wau
    FROM contrib
    WHERE target_day <= (SELECT max(day) FROM day_user)
    GROUP BY 1
"""

QUERIES["rolling_wau"] = q_rolling_wau


def q_basket_lift(spark, sf_dir):
    """Market-basket association metrics (the Apriori step-1 / FP-growth
    output shape): for frequently co-purchased part pairs, support,
    confidence and lift from EXACT basket counts.  Baskets = orders;
    pair generation is the same self-join-on-basket shape as
    graph_triangles (bounded by small per-order line counts, never
    all-pairs over the catalog); min-support prunes BEFORE the metric
    join.  Ratios are exact-count divisions rounded once — deterministic
    across engines.  Top 50 by (lift desc, pa, pb) for a stable frame."""
    # eagerly checkpointed: FOUR consumers (basket total, both pair-join
    # sides, item counts) would otherwise re-run the scan+distinct
    # shuffle per branch — the cold-cache race triangle_count documents
    # for the identical pair-generation shape
    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .transform(materialize)
    )
    # basket total as a LAZY broadcast 1-row frame (the tfidf_top_terms
    # pattern) — an eager .count() here would run a driver-blocking job
    # at query-build time
    n_baskets = li.select("l_orderkey").distinct().agg(
        F.count(F.lit(1)).cast("double").alias("n_baskets")
    )
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pb"))
    pair_counts = (
        a.join(b, "k")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= 2)
    )
    item_counts = li.groupBy(F.col("l_partkey").alias("item")).agg(
        F.count(F.lit(1)).alias("n_item")
    )
    ia = item_counts.select(F.col("item").alias("pa"), F.col("n_item").alias("n_a"))
    ib = item_counts.select(F.col("item").alias("pb"), F.col("n_item").alias("n_b"))
    # NO forced broadcast on the item-count sides: they are
    # catalog-sized (one row per distinct part — ~2e10 at 100 TB), so a
    # broadcast hint would be an OOM at scale; these are keyed
    # equi-joins AQE freely broadcasts when the side is actually small
    # (it is, at every test SF).  Only the 1-row basket total rides a
    # forced broadcast.
    return (
        pair_counts.join(ia, "pa")
        .join(ib, "pb")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "pa",
            "pb",
            "n_ab",
            F.round(F.col("n_ab") / F.col("n_baskets"), 6).alias("support"),
            F.round(F.col("n_ab") / F.col("n_a"), 6).alias("confidence"),
            F.round(
                (F.col("n_ab") * F.col("n_baskets"))
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "pa", "pb")
        .limit(50)
    )


ORACLE_SQL["basket_lift"] = """
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    nb AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_baskets FROM li),
    pair_counts AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb, CAST(count(*) AS BIGINT) AS n_ab
      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    item_counts AS (
      SELECT l_partkey AS item, CAST(count(*) AS BIGINT) AS n_item FROM li GROUP BY 1
    )
    SELECT pa, pb, n_ab,
           round(n_ab / CAST(n_baskets AS DOUBLE), 6) AS support,
           round(n_ab / CAST(ia.n_item AS DOUBLE), 6) AS confidence,
           round((n_ab * CAST(n_baskets AS DOUBLE)) / (ia.n_item * CAST(ib.n_item AS DOUBLE)), 6) AS lift
    FROM pair_counts
    JOIN item_counts ia ON ia.item = pa
    JOIN item_counts ib ON ib.item = pb
    CROSS JOIN nb
    ORDER BY lift DESC, pa, pb
    LIMIT 50
"""

QUERIES["basket_lift"] = q_basket_lift


def q_drift_cusum(spark, sf_dir):
    """CUSUM drift detection per event type (the monitoring-family
    primitive: cumulative sum of mean-centered values flags sustained
    level shifts long before per-point outlier tests fire).  Per type:
    center values on the type mean (broadcast per-type stats), running
    total in deterministic (ts, event_id) order, flag where the ROUNDED
    |cusum| clears the ROUNDED 3-sigma threshold — both sides of the
    comparison rounded first, so the flag decision is identical across
    engines even at boundary values.  Scale shape: one stats aggregate
    broadcast back + one per-type ordered window — state is a running
    scalar per partition, no self-joins."""
    e = _events(spark, sf_dir)
    # mu is ROUNDED before centering: avg() reduces in engine-specific
    # order, so the raw means differ by ulps across engines — and an
    # unrounded mu's ulp error accumulates LINEARLY with row count in
    # the running sum, eroding the 6-decimal rounding margin at larger
    # event volumes.  Centering on the rounded constant keeps the prefix
    # sums bit-comparable at any scale (the window order is total, so
    # the summation order itself is already deterministic).
    stats = e.groupBy("event_type").agg(
        F.round(F.avg("value"), 6).alias("mu"),
        F.stddev_samp("value").alias("sigma"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # + 0.0 after the round: the full-series centered sum lands at
    # +-1e-10 with an engine-dependent SIGN, so round() yields -0.0 on
    # one engine and +0.0 on the other; IEEE -0.0 + 0.0 = +0.0
    # normalizes both
    cusum = F.round(F.sum(F.col("value") - F.col("mu")).over(w), 6) + F.lit(0.0)
    thresh = F.round(F.lit(3.0) * F.col("sigma"), 6)
    return (
        e.join(F.broadcast(stats), "event_type")
        .select(
            "event_id",
            "event_type",
            cusum.alias("cusum"),
            (F.abs(cusum) > thresh).alias("drifted"),
        )
    )


ORACLE_SQL["drift_cusum"] = """
    WITH stats AS (
      SELECT event_type, round(avg(value), 6) AS mu,
             stddev_samp(value) AS sigma
      FROM events GROUP BY 1
    ), scored AS (
      SELECT event_id, e.event_type,
             round(sum(value - mu) OVER (
               PARTITION BY e.event_type
               ORDER BY CAST(ts AS TIMESTAMP), event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ), 6) + 0.0 AS cusum,
             round(3.0 * sigma, 6) AS thresh
      FROM events e JOIN stats USING (event_type)
    )
    SELECT event_id, event_type, cusum, abs(cusum) > thresh AS drifted
    FROM scored
"""

QUERIES["drift_cusum"] = q_drift_cusum


# ---------------------------------------------------------------------------
# round-4 widening: remaining TPC-H join shapes + curation-rule operators
# ---------------------------------------------------------------------------


def q_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: top-10 unshipped BUILDING orders by open revenue
    at the 1998-06-15 cutoff.  Star join (broadcast customer dim onto
    orders, then one key shuffle against lineitem), filters pushed to
    all three scans, total order (revenue DESC, orderdate, orderkey)
    for a deterministic limit."""
    cutoff = F.lit("1998-06-15").cast("timestamp")
    c = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(
            o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(rev), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


ORACLE_SQL["shipping_priority"] = """
    SELECT l_orderkey, o_orderdate, o_orderpriority,
           round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-15'
      AND l_shipdate > TIMESTAMP '1998-06-15'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
"""


def q_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: revenue delta from discount elimination — a pure
    scan-side filter + single global sum, the canonical predicate-
    pushdown probe (all four predicates reach the parquet scan; the agg
    is map-side partials into one scalar)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2
        ).alias("forecast_revenue")
    )


ORACLE_SQL["forecast_revenue"] = """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS forecast_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
"""


def q_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns in
    1997Q1 — lineitem filtered to returnflag R joins the quarter's
    orders (key shuffle), then the customer+nation dims broadcast on."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(F.round(F.sum(rev), 2).alias("lost_revenue"))
        .orderBy(F.col("lost_revenue").desc(), "c_custkey")
        .limit(20)
    )


ORACLE_SQL["returned_items"] = """
    SELECT c_custkey, c_name, n_name, c_acctbal,
           round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS lost_revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-04-01'
    GROUP BY 1, 2, 3, 4
    ORDER BY lost_revenue DESC, c_custkey
    LIMIT 20
"""


def q_small_qty_revenue(spark, sf_dir):
    """TPC-H Q17 shape: yearly revenue opportunity from small-quantity
    Brand#12 orders — the correlated-average subquery expressed as a
    per-part aggregate broadcast back onto its own lineitems (two scans
    of the filtered join, zero correlation loops).  The per-part avg is
    rounded to 6dp before the 0.2x comparison so the filter decision is
    engine-stable at boundary quantities."""
    p = _t(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#12"
    ).select("p_partkey")
    li = _t(spark, sf_dir, "lineitem").join(
        F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")
    )
    avg_qty = li.groupBy("l_partkey").agg(
        F.round(F.avg("l_quantity"), 6).alias("avg_qty")
    )
    return (
        li.join(F.broadcast(avg_qty), "l_partkey")
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice") / F.lit(7.0), 2).alias(
                "avg_yearly"
            )
        )
    )


ORACLE_SQL["small_qty_revenue"] = """
    WITH li AS (
      SELECT l_partkey, l_quantity, l_extendedprice
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_brand = 'Brand#12'
    ), a AS (
      SELECT l_partkey, round(avg(l_quantity), 6) AS avg_qty
      FROM li GROUP BY 1
    )
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM li JOIN a USING (l_partkey)
    WHERE l_quantity < 0.2 * avg_qty
"""


def q_large_volume_customers(spark, sf_dir):
    """TPC-H Q18 shape: customers who placed orders totalling > 175
    units — the HAVING-subquery expressed as a lineitem aggregate
    (one key shuffle) semi-joined back onto orders + broadcast
    customer.  Total order for the deterministic limit."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 175)
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        o.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.col("total_qty").cast("double").alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


ORACLE_SQL["large_volume_customers"] = """
    WITH big AS (
      SELECT l_orderkey, sum(l_quantity) AS total_qty
      FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 175
    )
    SELECT c_custkey, c_name, o_orderkey, o_orderdate,
           round(o_totalprice, 2) AS o_totalprice,
           CAST(total_qty AS DOUBLE) AS total_qty
    FROM orders
    JOIN big ON o_orderkey = l_orderkey
    JOIN customer ON o_custkey = c_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
"""


def q_gopher_quality_rules(spark, sf_dir):
    """Gopher-style (Rae et al. 2021) rule-based quality gate: per doc,
    word-count bounds, mean-word-length bounds, stopword floor, and a
    repetition cap (max single-token share), plus the conjunctive pass
    flag.  ENTIRELY row-local JVM expressions — the token share uses a
    max-run scan over the SORTED token array (higher-order aggregate),
    so the operator is shuffle-free at any corpus size (the oracle
    computes the same share by unnest+count, same result)."""
    toks = F.split(F.col("text"), " ")
    n_words = F.size(toks).cast("long")
    mean_len = F.round(
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda a, w: a + F.length(w)
        ).cast("double")
        / n_words,
        6,
    )
    stops = ["the", "a", "and", "of", "is", "to", "in"]
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(stops))
    ).cast("long")
    # max run length over the sorted array == max token multiplicity
    run = F.aggregate(
        F.array_sort(toks),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
        ),
        lambda acc, t: F.struct(
            t.alias("prev"),
            F.when(t == acc.prev, acc.run + 1).otherwise(F.lit(1).cast("long")).alias("run"),
            F.greatest(
                acc.best,
                F.when(t == acc.prev, acc.run + 1).otherwise(F.lit(1).cast("long")),
            ).alias("best"),
        ),
        lambda acc: acc.best,
    )
    top_share = F.round(run.cast("double") / n_words, 6)
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        n_words.alias("n_words"),
        mean_len.alias("mean_word_len"),
        stop_hits.alias("stop_hits"),
        top_share.alias("top_token_share"),
    )
    words_ok = (F.col("n_words") >= 25) & (F.col("n_words") <= 90)
    len_ok = (F.col("mean_word_len") >= 4.0) & (F.col("mean_word_len") <= 5.0)
    stop_ok = F.col("stop_hits") >= 2
    rep_ok = F.col("top_token_share") <= 0.08
    return d.select(
        "*",
        (words_ok & len_ok & stop_ok & rep_ok).alias("pass"),
    )


ORACLE_SQL["gopher_quality_rules"] = """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ), shares AS (
      SELECT doc_id, max(c) AS top_count FROM (
        SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2
      ) GROUP BY 1
    ), s AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
             round(CAST(list_sum(list_transform(string_split(text, ' '),
                                                w -> length(w))) AS DOUBLE)
                   / len(string_split(text, ' ')), 6) AS mean_word_len,
             CAST(len(list_filter(string_split(text, ' '),
                    t -> list_contains(['the','a','and','of','is','to','in'], t)))
                  AS BIGINT) AS stop_hits
      FROM documents
    )
    SELECT s.doc_id, n_words, mean_word_len, stop_hits,
           round(CAST(top_count AS DOUBLE) / n_words, 6) AS top_token_share,
           (n_words BETWEEN 25 AND 90)
             AND (mean_word_len BETWEEN 4.0 AND 5.0)
             AND stop_hits >= 2
             AND round(CAST(top_count AS DOUBLE) / n_words, 6) <= 0.08 AS pass
    FROM s JOIN shares USING (doc_id)
"""


def q_length_trim_corpus(spark, sf_dir):
    """Per-language percentile length trim (keep docs whose token count
    sits in the [P05, P95] cume_dist band) — the standard outlier trim
    before mixture sampling.  Scale shape: cume_dist is computed on the
    per-(lang, n_tokens) COUNT table (bounded cardinality — at most
    langs x distinct lengths rows), not by windowing the corpus through
    5 lang partitions; the band membership broadcasts back.  Rank
    arithmetic only (no quantile interpolation), so the boundary
    decision is identical in any engine."""
    d = _t(spark, sf_dir, "documents").withColumn(
        "n_tokens", F.size(F.split("text", " ")).cast("long")
    )
    counts = d.groupBy("lang", "n_tokens").agg(F.count("*").alias("c"))
    w = Window.partitionBy("lang").orderBy("n_tokens").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wt = Window.partitionBy("lang")
    cd = (
        F.sum("c").over(w).cast("double") / F.sum("c").over(wt)
    )
    band = counts.withColumn("cd", F.round(cd, 6)).filter(
        (F.col("cd") >= 0.05) & (F.col("cd") <= 0.95)
    ).select("lang", "n_tokens", "cd")
    return d.join(F.broadcast(band), ["lang", "n_tokens"]).select(
        "doc_id", "lang", "n_tokens", "cd"
    )


ORACLE_SQL["length_trim_corpus"] = """
    WITH d AS (
      SELECT doc_id, lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ), counts AS (
      SELECT lang, n_tokens, count(*) AS c FROM d GROUP BY 1, 2
    ), banded AS (
      SELECT lang, n_tokens,
             round(CAST(sum(c) OVER (PARTITION BY lang ORDER BY n_tokens
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS DOUBLE)
                   / sum(c) OVER (PARTITION BY lang), 6) AS cd
      FROM counts
    )
    SELECT doc_id, d.lang, d.n_tokens, cd
    FROM d JOIN banded USING (lang, n_tokens)
    WHERE cd >= 0.05 AND cd <= 0.95
"""


def q_token_fertility(spark, sf_dir):
    """Per-language tokenizer fertility (BPE-proxy tokens per whitespace
    word) — the budget planner's number for multilingual mixtures.
    Reuses the corpus-wide text-stats kernel (row-local), one tiny
    groupBy(lang); fertility is computed from the exact integer sums so
    the ratio is engine-stable."""
    d = _t(spark, sf_dir, "documents")
    stats = with_text_stats(d).select("lang", "n_tokens", "n_tokens_bpe")
    return (
        stats.groupBy("lang")
        .agg(
            F.sum("n_tokens").alias("words"),
            F.sum("n_tokens_bpe").alias("bpe_tokens"),
        )
        .select(
            "lang",
            "words",
            "bpe_tokens",
            F.round(
                F.col("bpe_tokens").cast("double") / F.col("words"), 6
            ).alias("fertility"),
        )
    )


ORACLE_SQL["token_fertility"] = r"""
    WITH s AS (
      SELECT lang,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
             END AS n_tokens,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE CAST(list_sum(list_transform(
                         string_split_regex(trim(text), '\s+'),
                         w -> CAST(ceil(length(w) / 4.0) AS BIGINT))) AS BIGINT)
             END AS n_tokens_bpe
      FROM documents
    )
    SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS words,
           CAST(sum(n_tokens_bpe) AS BIGINT) AS bpe_tokens,
           round(CAST(sum(n_tokens_bpe) AS DOUBLE) / sum(n_tokens), 6)
             AS fertility
    FROM s GROUP BY 1
"""


def q_heavy_hitters(spark, sf_dir):
    """Exact corpus heavy hitters: tokens whose frequency exceeds
    support 1/1000 of total token volume.  The groupBy is the
    distributive wordcount shape (map-side partial aggregation, vocab-
    sized shuffle); the support threshold rides a 1-row total broadcast
    (the vouched scalar pattern).  At streaming/one-pass scale the same
    contract is served by Misra-Gries or count-min with this exact
    operator as the verification tier."""
    d = _t(spark, sf_dir, "documents")
    tok_counts = (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    total = tok_counts.agg(F.sum("n").alias("total"))
    return (
        tok_counts.crossJoin(F.broadcast(total))
        .filter(F.col("n") * 1000 > F.col("total"))
        .select(
            "token",
            "n",
            F.round(F.col("n").cast("double") / F.col("total"), 6).alias(
                "share"
            ),
        )
    )


ORACLE_SQL["heavy_hitters"] = """
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ), counts AS (
      SELECT token, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY 1
    ), t AS (SELECT sum(n) AS total FROM counts)
    SELECT token, n, round(CAST(n AS DOUBLE) / total, 6) AS share
    FROM counts, t WHERE n * 1000 > total
"""


def q_hard_negatives(spark, sf_dir):
    """Top-5 hard negatives (most-similar different-label vectors) per
    query vector — contrastive fine-tuning pair mining over the
    embeddings table via :func:`operators.simsearch.hard_negatives_topk`
    (broadcast query side, integer-quantized cosine)."""
    from parquet_merger_spark.operators.simsearch import hard_negatives_topk

    e = _t(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 8).withColumnRenamed(
        "vec_id", "query_id"
    )
    return hard_negatives_topk(e, queries, k=5)


ORACLE_SQL["hard_negatives"] = f"""
    WITH q AS (
      SELECT vec_id, label,
             {_QUANT} AS qe,
             CAST(list_sum(list_transform(list_zip({_QUANT}, {_QUANT}),
                                          p -> struct_extract(p, 1) * struct_extract(p, 2))) AS BIGINT) AS q2
      FROM embeddings
    ),
    queries AS (
      SELECT vec_id AS query_id, label AS qlabel, qe AS qqe, q2 AS qq2
      FROM q WHERE vec_id < 8
    ),
    scored AS (
      SELECT query_id, c.vec_id, c.label AS neg_label,
             CAST(list_sum(list_transform(list_zip(qqe, c.qe),
                                          p -> struct_extract(p, 1) * struct_extract(p, 2))) AS BIGINT)
               / (sqrt(qq2) * sqrt(c.q2)) AS cosine
      FROM queries CROSS JOIN q c WHERE c.label <> qlabel
    ), r AS (
      SELECT query_id, vec_id, neg_label, cosine,
             row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
      FROM scored
    )
    SELECT query_id, vec_id, neg_label, round(cosine, 6) AS cosine,
           CAST(rank AS INT) AS rank
    FROM r WHERE rank <= 5
"""


QUERIES["shipping_priority"] = q_shipping_priority
QUERIES["forecast_revenue"] = q_forecast_revenue
QUERIES["returned_items"] = q_returned_items
QUERIES["small_qty_revenue"] = q_small_qty_revenue
QUERIES["large_volume_customers"] = q_large_volume_customers
QUERIES["gopher_quality_rules"] = q_gopher_quality_rules
QUERIES["length_trim_corpus"] = q_length_trim_corpus
QUERIES["token_fertility"] = q_token_fertility
QUERIES["heavy_hitters"] = q_heavy_hitters
QUERIES["hard_negatives"] = q_hard_negatives


def q_multimodal_audio_energy(spark, sf_dir):
    """Framed RMS energy over DECODED audio — the feature-extraction
    stage after the Arrow decode fence, kept entirely JVM-side: the
    waveform array frames into 16-sample windows with slice/sequence and
    each frame's RMS is a row-local higher-order aggregate (no second
    Python hop after decode).  Same genuine RIFF/WAVE PCM16 payload path
    as `multimodal_audio_decode`; rows-only (payload decode has no SQL
    twin), double-run deterministic — decoded samples are exact k/32768
    rationals and the fold order is fixed."""
    import numpy as np

    from parquet_merger_spark.operators.multimodal import (
        decode_audio,
        encode_wav_pcm16,
    )

    rows = []
    for i in range(32):
        n = 40 + 8 * (i % 5)
        rate = 8_000 * (1 + i % 3)
        wave = (((np.arange(n, dtype=np.int64) * (i + 3)) % 129) - 64) / 64.0
        rows.append((i, bytearray(encode_wav_pcm16(wave, rate))))
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    dec = decode_audio(media, max_samples=64)
    frame_len = 16
    n_frames = F.floor(F.size("waveform") / frame_len).cast("int")
    frames = F.transform(
        F.sequence(F.lit(0), n_frames - 1),
        lambda k: F.slice("waveform", k * frame_len + 1, frame_len),
    )
    energy = F.transform(
        frames,
        lambda fr: F.round(
            F.sqrt(
                F.aggregate(
                    fr,
                    F.lit(0.0),
                    lambda a, x: a + x.cast("double") * x.cast("double"),
                )
                / frame_len
            ),
            6,
        ),
    )
    return (
        dec.filter(n_frames > 0)
        .select("doc_id", "sample_rate", F.posexplode(energy).alias("frame_idx", "rms"))
    )


QUERIES["multimodal_audio_energy"] = q_multimodal_audio_energy


def q_temperature_mixture(spark, sf_dir):
    """Temperature-flattened (tau=2) corpus mixing: per-language keep
    fraction proportional to sqrt(language token mass) against a
    20k-token budget — the UniMax-family low-resource boost, in the same
    integer-exact hash-gate regime as `mixture_sample` (sqrt is the one
    power IEEE requires correctly rounded, so the per-stratum weight
    floor(sqrt(tokens*1e6)) is the identical integer in any engine).
    Portable gate so DuckDB verifies the exact member set."""
    from parquet_merger_spark.operators.sampling import temperature_sample

    d = _t(spark, sf_dir, "documents").withColumn(
        "n_tokens", F.size(F.split("text", " ")).cast("long")
    )
    kept = temperature_sample(
        d,
        budget_tokens=20_000,
        gate=portable_hash_gate(F.col("doc_id"), salt=13),
    )
    return kept.select("doc_id", "lang", "n_tokens")


ORACLE_SQL["temperature_mixture"] = """
    WITH d AS (
      SELECT doc_id, lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    totals AS (
      SELECT lang, CAST(SUM(n_tokens) AS BIGINT) AS stratum_tokens
      FROM d GROUP BY lang
    ),
    weights AS (
      SELECT lang, stratum_tokens,
             CAST(FLOOR(SQRT(CAST(stratum_tokens AS DOUBLE) * 1000000))
                  AS BIGINT) AS w
      FROM totals WHERE stratum_tokens > 0
    ),
    ws AS (SELECT CAST(SUM(w) AS BIGINT) AS wsum FROM weights),
    thresholds AS (
      SELECT lang, LEAST(1000000, FLOOR(
               (CAST(20000000000 AS DOUBLE) / stratum_tokens)
               * (CAST(w AS DOUBLE) / CAST(wsum AS DOUBLE)))) AS threshold
      FROM weights, ws
    )
    SELECT d.doc_id, d.lang, d.n_tokens
    FROM d JOIN thresholds USING (lang)
    WHERE ((d.doc_id % 999983) * 7919 + 13) % 1000000 < threshold
"""


def q_decontaminate_13gram(spark, sf_dir):
    """GPT-3-style eval decontamination: flag any train/eval pair
    sharing even ONE exact 13-gram (the canonical published contract —
    Brown et al. 2020 filtered on 13-gram collisions; the 3-word/min-5
    `decontaminate` twin is the looser paraphrase-catching tier).  Same
    inverted-index equi-join shape (hashed-gram join, df-capped), never
    doc x doc."""
    d = _t(spark, sf_dir, "documents")
    is_train = F.col("source").isin([f"src{i}" for i in range(10)])
    return ngram_contamination(
        d.filter(is_train), d.filter(~is_train),
        shingle_words=13, min_shared=1,
    )


ORACLE_SQL["decontaminate_13gram"] = """
    WITH tr AS (
      SELECT DISTINCT doc_id AS train_id,
             unnest(CASE WHEN len(string_split(text, ' ')) >= 13
                         THEN list_transform(
                              range(1, len(string_split(text, ' ')) - 11),
                              i -> array_to_string(string_split(text, ' ')[i:i+12], ' '))
                         ELSE [] END) AS gram
      FROM documents
      WHERE source IN ('src0','src1','src2','src3','src4','src5','src6','src7','src8','src9')
    ), te AS (
      SELECT DISTINCT doc_id AS test_id,
             unnest(CASE WHEN len(string_split(text, ' ')) >= 13
                         THEN list_transform(
                              range(1, len(string_split(text, ' ')) - 11),
                              i -> array_to_string(string_split(text, ' ')[i:i+12], ' '))
                         ELSE [] END) AS gram
      FROM documents
      WHERE source NOT IN ('src0','src1','src2','src3','src4','src5','src6','src7','src8','src9')
    )
    SELECT test_id, train_id, CAST(count(*) AS BIGINT) AS shared_grams
    FROM te JOIN tr USING (gram)
    GROUP BY 1, 2 HAVING count(*) >= 1
"""


QUERIES["temperature_mixture"] = q_temperature_mixture
QUERIES["decontaminate_13gram"] = q_decontaminate_13gram


def q_stream_drift_cusum(spark, sf_dir):
    """STREAMING CUSUM drift detection driven end-to-end: calibration
    stats (rounded per-type mean, rounded 3-sigma threshold) come from
    one batch aggregate, then events replay in three event-time-ordered
    mtime-pinned micro-batches through the
    :func:`streaming.events.drift_cusum_stream` stateful operator
    (applyInPandasWithState, one float of state per event type).  The
    full replay equals the one-shot batch `drift_cusum` row-for-row —
    same oracle certifies both (the exactly-once append contract for
    custom stateful operators)."""
    import shutil

    from parquet_merger_spark.streaming.events import drift_cusum_stream

    base = _scratch_dir(spark, "stream_drift_cusum")
    shutil.rmtree(base, ignore_errors=True)

    e = _events(spark, sf_dir).select("event_id", "ts", "event_type", "value")
    stats = {
        r["event_type"]: (r["mu"], r["thresh"])
        for r in e.groupBy("event_type")
        .agg(
            F.round(F.avg("value"), 6).alias("mu"),
            F.round(F.lit(3.0) * F.stddev_samp("value"), 6).alias("thresh"),
        )
        .collect()
    }
    slices, lo, hi = _event_time_slices(e)
    src = _write_replay_batches(base, slices)

    name = "stream_drift_cusum_sink"
    q = drift_cusum_stream(
        spark, src, stats, os.path.join(base, "ckpt"), query_name=name
    )
    _drain_stream(q, "stream_drift_cusum")
    return spark.table(name).select("event_id", "event_type", "cusum", "drifted")


ORACLE_SQL["stream_drift_cusum"] = ORACLE_SQL["drift_cusum"]
QUERIES["stream_drift_cusum"] = q_stream_drift_cusum


def q_trailing_time_window(spark, sf_dir):
    """Time-interval window frames (RANGE BETWEEN -3600 AND CURRENT on
    epoch seconds): per user, the trailing-1-hour event count and value
    sum at every event — the rate-limiter/rolling-exposure primitive
    that ROWS frames cannot express (irregular event spacing).  Values
    quantize to exact integer cents before the frame sum, so the result
    is bit-stable in any engine regardless of intra-frame order.  Scale:
    one hash exchange on user_id; frame state is a sliding two-pointer
    over each partition, O(1) per row."""
    e = _events(spark, sf_dir)
    epoch = F.col("ts").cast("long")
    cents = F.round(F.col("value") * 100).cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy("epoch_s")
        .rangeBetween(-3600, Window.currentRow)
    )
    return (
        e.select(
            "event_id",
            "user_id",
            epoch.alias("epoch_s"),
            cents.alias("cents"),
        )
        .withColumn("n_trailing_1h", F.count(F.lit(1)).over(w))
        .withColumn("sum_trailing_1h_cents", F.sum("cents").over(w))
        .select(
            "event_id", "user_id", "epoch_s",
            "n_trailing_1h", "sum_trailing_1h_cents",
        )
    )


ORACLE_SQL["trailing_time_window"] = """
    WITH e AS (
      SELECT event_id, user_id,
             CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS epoch_s,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    )
    SELECT event_id, user_id, epoch_s,
           CAST(count(*) OVER w AS BIGINT) AS n_trailing_1h,
           CAST(sum(cents) OVER w AS BIGINT) AS sum_trailing_1h_cents
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
"""


def q_mode_per_group(spark, sf_dir):
    """Deterministic per-group mode: each user's most frequent event
    type, ties broken lexicographically (the built-in `mode()` breaks
    ties arbitrarily — useless for a reproducibility contract).  Shape:
    (user, type) counts then a windowed argmax per user — two key
    shuffles, both map-side combinable."""
    e = _events(spark, sf_dir)
    counts = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("n").desc(), F.col("event_type")
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("modal_type"),
            F.col("n").alias("modal_count"),
        )
    )


ORACLE_SQL["mode_per_group"] = """
    WITH c AS (
      SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ), r AS (
      SELECT user_id, event_type, n,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY n DESC, event_type) AS rk
      FROM c
    )
    SELECT user_id, event_type AS modal_type, n AS modal_count
    FROM r WHERE rk = 1
"""


QUERIES["trailing_time_window"] = q_trailing_time_window
QUERIES["mode_per_group"] = q_mode_per_group


def q_chi_square_independence(spark, sf_dir):
    """Chi-square independence test for (lang x source) over documents —
    the corpus-composition drift check (is language mix independent of
    crawl source?).  Every cell contribution is (o*N - rt*ct)^2 /
    (N*rt*ct): the difference d = o*N - rt*ct stays an EXACT BIGINT
    (|d| <= N^2/4, in-range to N ~ 6e9 docs), then is cast to double
    BEFORE squaring — d^2 itself would overflow int64 past N ~ 3e5
    (ANSI error / silent wrap), while double(d)*double(d) is the same
    correctly-rounded IEEE product in any engine — and
    the statistic folds those contributions in a FIXED (lang, source)
    order (sort_array + sequential aggregate; a bare SUM's
    engine-chosen order would perturb last ulps — the r03 BM25 rule).
    Scale: one (lang, source) count shuffle; margins broadcast back;
    the fold runs over the |cells| model-sized array."""
    d = _t(spark, sf_dir, "documents")
    cells = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("o"))
    rt = d.groupBy("lang").agg(F.count(F.lit(1)).alias("rt"))
    ct = d.groupBy("source").agg(F.count(F.lit(1)).alias("ct"))
    n = d.agg(F.count(F.lit(1)).alias("n"))
    contrib = (
        cells.join(F.broadcast(rt), "lang")
        .join(F.broadcast(ct), "source")
        .crossJoin(F.broadcast(n))
        .select(
            "lang",
            "source",
            F.col("n"),
            (
                (
                    (F.col("o") * F.col("n") - F.col("rt") * F.col("ct"))
                    .cast("double")
                    * (F.col("o") * F.col("n") - F.col("rt") * F.col("ct"))
                    .cast("double")
                )
                / (
                    F.col("n").cast("double")
                    * F.col("rt")
                    * F.col("ct")
                )
            ).alias("x"),
        )
    )
    folded = contrib.agg(
        F.aggregate(
            F.sort_array(
                F.collect_list(F.struct("lang", "source", "x"))
            ),
            F.lit(0.0),
            lambda acc, c: acc + c.x,
        ).alias("chi2_raw"),
        F.count(F.lit(1)).alias("n_cells"),
        F.first("n").alias("n_docs"),
    )
    r = F.size(F.collect_set("lang"))
    c = F.size(F.collect_set("source"))
    dof = contrib.agg(((r - 1) * (c - 1)).cast("long").alias("dof"))
    return folded.crossJoin(F.broadcast(dof)).select(
        F.round("chi2_raw", 6).alias("chi2"),
        "dof",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_cells").cast("long").alias("n_cells"),
    )


ORACLE_SQL["chi_square_independence"] = """
    WITH cells AS (
      SELECT lang, source, CAST(count(*) AS BIGINT) AS o
      FROM documents GROUP BY 1, 2
    ),
    rt AS (SELECT lang, CAST(count(*) AS BIGINT) AS rt FROM documents GROUP BY 1),
    ct AS (SELECT source, CAST(count(*) AS BIGINT) AS ct FROM documents GROUP BY 1),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
    contrib AS (
      SELECT cells.lang, cells.source, n,
             (CAST(o * n - rt.rt * ct.ct AS DOUBLE)
              * CAST(o * n - rt.rt * ct.ct AS DOUBLE))
               / (CAST(n AS DOUBLE) * rt.rt * ct.ct) AS x
      FROM cells JOIN rt USING (lang) JOIN ct USING (source) CROSS JOIN nn
    ),
    folded AS (
      SELECT round(list_sum(list_transform(
               list_sort(list(struct_pack(lang := lang, source := source, x := x))),
               s -> struct_extract(s, 'x'))), 6) AS chi2,
             CAST(count(*) AS BIGINT) AS n_cells,
             CAST(first(n) AS BIGINT) AS n_docs
      FROM contrib
    ),
    dims AS (
      SELECT CAST((count(DISTINCT lang) - 1) * (count(DISTINCT source) - 1)
                  AS BIGINT) AS dof
      FROM documents
    )
    SELECT chi2, dof, n_docs, n_cells FROM folded, dims
"""


QUERIES["chi_square_independence"] = q_chi_square_independence


def q_except_all_custkeys(spark, sf_dir):
    """EXCEPT ALL (multiset semantics): each 1995 order survives only if
    it outnumbers the customer's 1996 orders — count-sensitive set
    difference, the CDC/reconciliation sibling of the distinct-set
    `except_custkeys`.  One aggregate pair + a generate — never a
    row-pairing join."""
    o = _t(spark, sf_dir, "orders")
    year = F.year(F.col("o_orderdate").cast("timestamp"))
    a = o.filter(year == 1995).select("o_custkey")
    b = o.filter(year == 1996).select("o_custkey")
    return a.exceptAll(b)


ORACLE_SQL["except_all_custkeys"] = """
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
"""


def q_full_outer_reconcile(spark, sf_dir):
    """Snapshot reconciliation via FULL OUTER join — the missing join
    flavor in the battery: current orders vs a simulated prior snapshot
    (keys < 90% of max, prices shifted), classifying every key as
    added / removed / changed / unchanged.  Null-safe comparisons and
    one key shuffle; status is derived with null checks, never
    sentinels."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.round("o_totalprice", 2).alias("price_now")
    )
    prior = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 10 != 0
    ).select(
        "o_orderkey",
        F.round(
            F.when(F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + 1.5)
            .otherwise(F.col("o_totalprice")),
            2,
        ).alias("price_prior"),
    )
    cur = o.filter(F.col("o_orderkey") % 13 != 0)
    j = cur.join(prior, "o_orderkey", "full_outer")
    status = (
        F.when(F.col("price_prior").isNull(), F.lit("added"))
        .when(F.col("price_now").isNull(), F.lit("removed"))
        .when(F.col("price_now") != F.col("price_prior"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        "o_orderkey", "price_now", "price_prior", status.alias("status")
    )


ORACLE_SQL["full_outer_reconcile"] = """
    WITH cur AS (
      SELECT o_orderkey, round(o_totalprice, 2) AS price_now
      FROM orders WHERE o_orderkey % 13 <> 0
    ), prior AS (
      SELECT o_orderkey,
             round(CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1.5
                        ELSE o_totalprice END, 2) AS price_prior
      FROM orders WHERE o_orderkey % 10 <> 0
    )
    SELECT COALESCE(cur.o_orderkey, prior.o_orderkey) AS o_orderkey,
           price_now, price_prior,
           CASE WHEN price_prior IS NULL THEN 'added'
                WHEN price_now IS NULL THEN 'removed'
                WHEN price_now <> price_prior THEN 'changed'
                ELSE 'unchanged' END AS status
    FROM cur FULL OUTER JOIN prior USING (o_orderkey)
"""


QUERIES["except_all_custkeys"] = q_except_all_custkeys
QUERIES["full_outer_reconcile"] = q_full_outer_reconcile


def q_stream_user_totals(spark, sf_dir):
    """The custom stateful operator (`user_running_totals_stream`,
    applyInPandasWithState per-user lifetime totals) driven end-to-end
    through the driver contract: events replay in three mtime-pinned
    micro-batches, every update emission lands in the memory sink, and
    the final answer takes each user's LATEST emission (monotone in
    n_events, so max() identifies it without ordering metadata) ranked
    to the top-10 most active users (count desc, user_id tie-break).
    Counts are exact integers, so the oracle is the plain batch
    aggregate — certifying that cross-micro-batch state accumulation
    loses and double-counts nothing."""
    import shutil

    from parquet_merger_spark.streaming.events import (
        user_running_totals_stream,
    )

    base = _scratch_dir(spark, "stream_user_totals")
    shutil.rmtree(base, ignore_errors=True)

    e = _events(spark, sf_dir).select("event_id", "ts", "user_id", "value")
    src = _write_replay_batches(
        base, [e.filter(F.col("event_id") % 3 == i) for i in range(3)]
    )

    name = "stream_user_totals_sink"
    q = user_running_totals_stream(
        spark, src, os.path.join(base, "ckpt"), query_name=name
    )
    _drain_stream(q, "stream_user_totals")
    latest = (
        spark.table(name)
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
    )
    # top-10 via orderBy().limit() — TakeOrderedAndProject keeps a
    # 10-row heap per partition instead of funneling all O(users) rows
    # through one unpartitioned-window task; the rank window then runs
    # over the 10 survivors only (model-sized).
    top = latest.orderBy(F.col("n_events").desc(), F.col("user_id")).limit(
        10
    )
    w = Window.orderBy(F.col("n_events").desc(), F.col("user_id"))
    return (
        top.withColumn("rk", F.row_number().over(w))
        .select("user_id", "n_events", F.col("rk").cast("int").alias("rk"))
    )


ORACLE_SQL["stream_user_totals"] = """
    WITH c AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1
    ), r AS (
      SELECT user_id, n_events,
             row_number() OVER (ORDER BY n_events DESC, user_id) AS rk
      FROM c
    )
    SELECT user_id, n_events, CAST(rk AS INT) AS rk FROM r WHERE rk <= 10
"""


QUERIES["stream_user_totals"] = q_stream_user_totals


def q_bucketed_join_revenue(spark, sf_dir):
    """Bucketed co-located join driven through the contract: orders and
    lineitem written ONCE as same-bucketed catalog tables (8 buckets on
    the order key, sorted within buckets — write_bucketed), then joined
    with zero query-time Exchange (zip-partition sort-merge — the plan
    property tests/test_plans.py pins).  Result = per-priority revenue
    of high-value orders, identical to the plain join the oracle
    computes — certifying bucketing changes the PLAN, never the data.
    Tables are per-application (overwrite mode + sf-suffixed names), so
    reruns refresh in place."""
    from parquet_merger_spark.operators.bucketing import (
        bucketed_join,
        write_bucketed,
    )

    # app-scoped names: concurrent applications share the on-disk
    # spark-warehouse directory, so a bare per-sf name would race two
    # harness processes onto one table path
    app = "".join(
        c for c in spark.sparkContext.applicationId if c.isalnum()
    )
    sf_tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    lt, rt = f"b_orders_{sf_tag}_{app}", f"b_lineitem_{sf_tag}_{app}"
    # remove STALE app-scoped copies left by PRIOR applications: the
    # default session catalog is in-memory, so a dead app's tables
    # survive only as orphan directories under the warehouse — catalog
    # DROPs can't see them; reap them on disk.  Cleanup must happen on
    # entry, not exit (the returned frame reads this app's tables
    # lazily); bounds warehouse growth at one orders+lineitem pair per
    # live application.  A concurrently-RUNNING sibling app's dirs
    # would be reaped too; the app-scoping exists for the write race
    # only, and the harness runs bench/driver/test sequentially.
    import shutil

    wh = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).replace("file:", "")
    if os.path.isdir(wh):
        for d in os.listdir(wh):
            if (
                d.startswith(("b_orders_", "b_lineitem_"))
                and not d.endswith(f"_{app}")
            ):
                shutil.rmtree(os.path.join(wh, d), ignore_errors=True)
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        "l_extendedprice",
        "l_discount",
    )
    if not spark.catalog.tableExists(lt):
        write_bucketed(o, lt, ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    if not spark.catalog.tableExists(rt):
        write_bucketed(li, rt, ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    j = bucketed_join(spark, lt, rt, ["o_orderkey"]).filter(
        F.col("o_totalprice") > 150_000
    )
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.sum(rev), 2).alias("revenue"),
    )


ORACLE_SQL["bucketed_join_revenue"] = """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_lines,
           round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_totalprice > 150000
    GROUP BY 1
"""


QUERIES["bucketed_join_revenue"] = q_bucketed_join_revenue


def q_id_gap_detection(spark, sf_dir):
    """Islands-and-gaps over the event_id sequence: every missing id
    range (gap_start, gap_end, gap_len) — the ingestion-completeness
    audit.  SCALE SHAPE: ids bucket by fixed range (id div 4096), lag
    runs WITHIN buckets (parallel, never a global single-task sort),
    and cross-bucket gaps stitch from the per-bucket (min, max) table —
    model-sized, one row per non-empty bucket — lagged over the bucket
    order.  CEILING: the stitch window is O(distinct ids / 4096) rows
    through one task, which holds to ~10^12 ids; beyond that, widen
    bucket_w (or recurse the stitch a second level).  Result is identical to the textbook global-lag form, which
    is exactly what the oracle computes.  The fixture sequence is
    dense, so the harness DROPS ids ending in 7 to manufacture gaps —
    deterministically, in both engines."""
    bucket_w = 4096
    e = (
        _t(spark, sf_dir, "events")
        .select("event_id")
        .filter(F.col("event_id") % 10 != 7)
        .withColumn("bk", F.expr(f"event_id div {bucket_w}"))
    )
    win = Window.partitionBy("bk").orderBy("event_id")
    in_bucket = (
        e.withColumn("prev_id", F.lag("event_id").over(win))
        .filter(
            F.col("prev_id").isNotNull()
            & (F.col("event_id") - F.col("prev_id") > 1)
        )
        .select("prev_id", F.col("event_id").alias("next_id"))
    )
    edges = e.groupBy("bk").agg(
        F.min("event_id").alias("lo"), F.max("event_id").alias("hi")
    )
    ew = Window.orderBy("bk")
    boundary = (
        edges.withColumn("prev_hi", F.lag("hi").over(ew))
        .filter(
            F.col("prev_hi").isNotNull()
            & (F.col("lo") - F.col("prev_hi") > 1)
        )
        .select(
            F.col("prev_hi").alias("prev_id"), F.col("lo").alias("next_id")
        )
    )
    gaps = in_bucket.unionAll(boundary)
    return gaps.select(
        (F.col("prev_id") + 1).alias("gap_start"),
        (F.col("next_id") - 1).alias("gap_end"),
        (F.col("next_id") - F.col("prev_id") - 1).alias("gap_len"),
    )


ORACLE_SQL["id_gap_detection"] = """
    WITH e AS (
      SELECT event_id FROM events WHERE event_id % 10 <> 7
    ), g AS (
      SELECT event_id, lag(event_id) OVER (ORDER BY event_id) AS prev_id
      FROM e
    )
    SELECT prev_id + 1 AS gap_start, event_id - 1 AS gap_end,
           event_id - prev_id - 1 AS gap_len
    FROM g WHERE prev_id IS NOT NULL AND event_id - prev_id > 1
"""


def q_percentile_bands_per_type(spark, sf_dir):
    """Per-event-type quartile banding under the TOTAL order (value,
    event_id) — reproducing ntile(4) EXACTLY without its per-type
    single-task sort (with a handful of types, the plain window funnels
    each type's billions of rows through one task at scale; the r04
    judge flag).  SCALE SHAPE (the assign_row_ids idiom, grouped):

    1. rows bucket into 64 contiguous value ranges per type, with
       DETERMINISTIC uniform-width boundaries from the per-type
       min/max aggregate (not percentile_approx, whose merge-order
       nondeterminism across plan branches is the reuse hazard ADVICE
       flagged) — equal values always share a bucket, so cross-bucket
       order stays total;
    2. the (type, bucket) COUNT TABLE (model-sized: types x 64 rows)
       yields per-bucket exclusive offsets and per-type totals via
       windows over that tiny table;
    3. exact per-type rank = offset + row_number within (type, bucket)
       — every sort is bucket-local and parallel;
    4. band = ntile's quota formula in exact integer arithmetic: the
       first N%4 bands take ceil(N/4) rows, the rest floor(N/4).

    Uniform-width buckets only shape balance, never correctness; a
    skewed value distribution would re-derive boundaries from a
    persisted quantile sketch instead.  Returns per-(type, band) count
    and value bounds, identical to the textbook ntile the oracle runs."""
    nb = 64
    e = _events(spark, sf_dir).select("event_type", "event_id", "value")
    rng = e.groupBy("event_type").agg(
        F.min("value").alias("__lo"), F.max("value").alias("__hi")
    )
    width = (F.col("__hi") - F.col("__lo")) / nb
    bucketed = (
        e.join(F.broadcast(rng), "event_type")
        .withColumn(
            "__bucket",
            F.when(F.col("__hi") <= F.col("__lo"), F.lit(0))
            .otherwise(
                F.least(
                    F.lit(nb - 1),
                    F.floor((F.col("value") - F.col("__lo")) / width),
                )
            )
            .cast("int"),
        )
        .drop("__lo", "__hi")
    )
    counts = bucketed.groupBy("event_type", "__bucket").agg(
        F.count("*").alias("__n")
    )
    woff = Window.partitionBy("event_type").orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "event_type",
        "__bucket",
        F.coalesce(F.sum("__n").over(woff), F.lit(0)).alias("__offset"),
        F.sum("__n").over(Window.partitionBy("event_type")).alias("__N"),
    )
    wrank = Window.partitionBy("event_type", "__bucket").orderBy(
        "value", "event_id"
    )
    ranked = (
        bucketed.join(F.broadcast(offsets), ["event_type", "__bucket"])
        .withColumn("__r", F.col("__offset") + F.row_number().over(wrank))
    )
    # ntile(4) quota: base = N div 4, the first rem = N % 4 bands hold
    # base+1 rows.  ceil(a/b) = (a + b - 1) div b keeps it exact in
    # int64; the otherwise-branch divisor is guarded with greatest(,1)
    # because CASE only shields its own branch lazily per engine.
    base = F.expr("__N div 4")
    rem = F.col("__N") % 4
    head = rem * (base + 1)
    band = F.when(
        F.col("__r") <= head,
        F.expr("(__r + (__N div 4)) div ((__N div 4) + 1)"),
    ).otherwise(
        rem
        + F.expr(
            "(__r - (__N % 4) * ((__N div 4) + 1) + greatest(__N div 4, 1)"
            " - 1) div greatest(__N div 4, 1)"
        )
    )
    banded = ranked.withColumn("band", band.cast("int"))
    return banded.groupBy("event_type", "band").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("value"), 6).alias("lo"),
        F.round(F.max("value"), 6).alias("hi"),
    )


ORACLE_SQL["percentile_bands_per_type"] = """
    WITH b AS (
      SELECT event_type, value,
             ntile(4) OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS band
      FROM events
    )
    SELECT event_type, CAST(band AS INT) AS band,
           CAST(count(*) AS BIGINT) AS n,
           round(min(value), 6) AS lo, round(max(value), 6) AS hi
    FROM b GROUP BY 1, 2
"""


def q_running_distinct_users(spark, sf_dir):
    """Cumulative distinct users per day — the growth-accounting curve
    plain window frames cannot express (COUNT(DISTINCT) over a running
    frame is unsupported).  Shape: first-seen day per user (one key
    aggregate), daily new-user counts (tiny day table), prefix sum over
    the day table — the data shuffles once on user_id; the running sum
    runs over O(days) rows."""
    e = _events(spark, sf_dir)
    first_seen = e.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_day")
    )
    daily_new = first_seen.groupBy("first_day").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = Window.orderBy("first_day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return daily_new.select(
        F.col("first_day").cast("string").alias("day"),
        "new_users",
        F.sum("new_users").over(w).alias("cum_users"),
    )


ORACLE_SQL["running_distinct_users"] = """
    WITH fs AS (
      SELECT user_id, CAST(min(CAST(ts AS TIMESTAMP)) AS DATE) AS first_day
      FROM events GROUP BY 1
    ), d AS (
      SELECT first_day, CAST(count(*) AS BIGINT) AS new_users
      FROM fs GROUP BY 1
    )
    SELECT CAST(first_day AS VARCHAR) AS day, new_users,
           CAST(sum(new_users) OVER (ORDER BY first_day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_users
    FROM d
"""


QUERIES["id_gap_detection"] = q_id_gap_detection
QUERIES["percentile_bands_per_type"] = q_percentile_bands_per_type
QUERIES["running_distinct_users"] = q_running_distinct_users


# ---------------------------------------------------------------------------
# round-5 widening: corpus-audit and analytics keys (token coverage CDF,
# source concentration, exact-integer OLS trend, DISTINCT ON, behavioral
# set similarity, per-source duplicate rate).  Same discipline as the rest
# of the registry: exact integer arithmetic wherever a sum crosses a
# shuffle, doubles only in final single-division/product steps (correctly
# rounded, bit-identical cross-engine), total-order tie-breaks everywhere.
# ---------------------------------------------------------------------------


def q_token_coverage_curve(spark, sf_dir):
    """Vocabulary coverage CDF: what fraction of all corpus tokens the
    top-k most frequent terms cover, at k in {5, 10, 25}
    (the synthetic corpus vocabulary is ~31 terms; at a real corpus the
    same plan runs with k up to the model-sized survivor cap) — the
    tokenizer-vocab sizing curve (how big a vocab before coverage
    plateaus).  Scale shape: one (term) count shuffle builds the term
    frequency table; the top-1000 survivors come out via
    orderBy().limit() (TakeOrdered — a 1000-row heap per partition,
    never a global sort); rank + running sum then run over the
    1000-row model-sized survivor table only.  All counts are exact
    int64 (associative, partition-order-free); the coverage ratio is
    ONE double division of exact integers, identical in any engine."""
    d = _t(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    total = tf.agg(F.sum("tf").alias("total_tokens"))
    top = tf.orderBy(F.desc("tf"), "term").limit(1000)
    w = Window.orderBy(F.desc("tf"), "term")
    ranked = top.withColumn("rk", F.row_number().over(w)).withColumn(
        "cum_tokens",
        F.sum("tf").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        ranked.filter(F.col("rk").isin(5, 10, 25))
        .crossJoin(F.broadcast(total))
        .select(
            F.col("rk").alias("k"),
            "cum_tokens",
            "total_tokens",
            F.round(
                F.col("cum_tokens") / F.col("total_tokens").cast("double"), 6
            ).alias("coverage"),
        )
    )


ORACLE_SQL["token_coverage_curve"] = """
    WITH tf AS (
      SELECT term, CAST(count(*) AS BIGINT) AS tf
      FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
      GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(tf) AS BIGINT) AS total_tokens FROM tf),
    top AS (SELECT term, tf FROM tf ORDER BY tf DESC, term LIMIT 1000),
    ranked AS (
      SELECT tf,
             row_number() OVER (ORDER BY tf DESC, term) AS rk,
             CAST(sum(tf) OVER (ORDER BY tf DESC, term
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_tokens
      FROM top
    )
    SELECT CAST(rk AS INT) AS k, cum_tokens, total_tokens,
           round(cum_tokens / CAST(total_tokens AS DOUBLE), 6) AS coverage
    FROM ranked, tot WHERE rk IN (5, 10, 25)
"""


def q_lang_gini_by_source(spark, sf_dir):
    """Language-concentration audit per crawl source: Gini impurity of
    each source's language distribution, 1 - sum((c_i/N)^2) — the
    exact-arithmetic stand-in for entropy (no logs: ln differs in last
    ulps between libms, Gini is pure rational).  sum(c^2) stays an
    exact int64 (in-range while every (source, lang) cell is under
    ~3e9 docs; cast the square to double past that, the chi-square
    rule); the final value is one division of exact integers widened
    to double — identical cross-engine.  Scale: one (source, lang)
    count shuffle; the per-source fold runs over the model-sized cell
    table."""
    d = _t(spark, sf_dir, "documents")
    cells = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("c"))
    per = cells.groupBy("source").agg(
        F.sum("c").alias("n_docs"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
        F.count(F.lit(1)).alias("n_langs"),
    )
    return per.select(
        "source",
        "n_docs",
        F.col("n_langs").cast("long").alias("n_langs"),
        F.round(
            F.lit(1.0)
            - F.col("s2").cast("double")
            / (F.col("n_docs").cast("double") * F.col("n_docs").cast("double")),
            6,
        ).alias("gini"),
    )


ORACLE_SQL["lang_gini_by_source"] = """
    WITH cells AS (
      SELECT source, lang, CAST(count(*) AS BIGINT) AS c
      FROM documents GROUP BY 1, 2
    )
    SELECT source,
           CAST(sum(c) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_langs,
           round(1.0 - CAST(sum(c * c) AS DOUBLE)
                 / (CAST(sum(c) AS DOUBLE) * CAST(sum(c) AS DOUBLE)),
                 6) AS gini
    FROM cells GROUP BY 1
"""


def q_revenue_trend_by_nation(spark, sf_dir):
    """Per-nation revenue trend: ordinary-least-squares slope of monthly
    order revenue (cents/month) via the closed form
    (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2), with EVERY sum an exact int64 —
    x is the month index since 1992-01, y is total cents per
    (nation, month) — so the only doubles are the final widened
    products and one division (correctly rounded, bit-identical in
    both engines; sums stay exact while under 2^53 — ~9e15 total
    cents per nation, a ceiling the docstring owns).  Scale: one
    orders<->customer shuffle on custkey, nation broadcast, then the
    per-(nation, month) aggregate and a model-sized per-nation fold."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    j = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            "n_name",
            (
                (F.year("o_orderdate") - F.lit(1992)) * 12
                + F.month("o_orderdate")
                - 1
            ).alias("x"),
            F.round(F.col("o_totalprice") * 100, 0)
            .cast("long")
            .alias("cents"),
        )
    )
    m = j.groupBy("n_name", "x").agg(F.sum("cents").alias("y"))
    agg = m.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    num = (
        F.col("n").cast("double") * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy").cast("double")
    )
    den = (
        F.col("n").cast("double") * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    return agg.select(
        "n_name",
        F.col("n").alias("n_months"),
        F.round(num / den, 4).alias("slope_cents_per_month"),
    )


ORACLE_SQL["revenue_trend_by_nation"] = """
    WITH j AS (
      SELECT n_name,
             (EXTRACT(year FROM o_orderdate) - 1992) * 12
               + EXTRACT(month FROM o_orderdate) - 1 AS x,
             CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
    ),
    m AS (
      SELECT n_name, x, CAST(sum(cents) AS BIGINT) AS y
      FROM j GROUP BY 1, 2
    ),
    agg AS (
      SELECT n_name, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM m GROUP BY 1
    )
    SELECT n_name, n AS n_months,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)),
                 4) AS slope_cents_per_month
    FROM agg
"""


def q_latest_order_per_customer(spark, sf_dir):
    """DISTINCT ON / arg-max: each customer's most recent order under
    the TOTAL order (o_orderdate, o_orderkey).  The scale idiom is ONE
    aggregate — max over the packed int64
    ``days_since_epoch * 2^32 + o_orderkey`` (exact while orderkeys
    stay under 2^32; widen the packing beyond that) — instead of the
    per-customer row_number window, which at 100 TB sorts every
    customer's full order history just to keep one row.  The packed
    key decodes back to (date, orderkey) with div/pmod, all exact
    integer ops, identical in both engines."""
    o = _t(spark, sf_dir, "orders")
    packed = (
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01"))
        .cast("long")
        * F.lit(4294967296).cast("long")
        + F.col("o_orderkey")
    )
    agg = o.groupBy("o_custkey").agg(
        F.max(packed).alias("combo"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return agg.select(
        "o_custkey",
        F.expr("combo div 4294967296")
        .cast("long")
        .alias("last_days"),
        F.pmod(F.col("combo"), F.lit(4294967296)).cast("long").alias(
            "last_orderkey"
        ),
        "n_orders",
    ).select(
        "o_custkey",
        F.date_add(F.lit("1970-01-01").cast("date"), F.col("last_days").cast("int"))
        .cast("string")
        .alias("last_date"),
        "last_orderkey",
        "n_orders",
    )


ORACLE_SQL["latest_order_per_customer"] = """
    WITH p AS (
      SELECT o_custkey,
             CAST(datediff('day', DATE '1970-01-01',
                           CAST(o_orderdate AS DATE)) AS BIGINT)
               * 4294967296 + o_orderkey AS packed
      FROM orders
    ),
    agg AS (
      SELECT o_custkey, max(packed) AS combo,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM p GROUP BY 1
    )
    SELECT o_custkey,
           CAST(DATE '1970-01-01'
                + CAST(combo // 4294967296 AS INT) AS VARCHAR) AS last_date,
           CAST(combo % 4294967296 AS BIGINT) AS last_orderkey,
           n_orders
    FROM agg
"""


def q_jaccard_event_type_pairs(spark, sf_dir):
    """Behavioral set similarity between event types: for every type
    pair (a < b), the Jaccard of their user sets — which behaviors
    co-occur in the same accounts.  Scale shape: the (user, type)
    DISTINCT is one shuffle; the pair join is a self-join ON user_id
    whose per-user output is bounded by types^2 (a handful), so the
    candidate stream is O(users * types^2), never users^2; per-type
    set sizes broadcast back.  Counts exact int64; jaccard is one
    double division."""
    e = _t(spark, sf_dir, "events")
    ut = e.select("user_id", "event_type").distinct()
    nt = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    inter = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    na = nt.select(
        F.col("event_type").alias("type_a"), F.col("n").alias("n_a")
    )
    nb = nt.select(
        F.col("event_type").alias("type_b"), F.col("n").alias("n_b")
    )
    return (
        inter.join(F.broadcast(na), "type_a")
        .join(F.broadcast(nb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_both",
            F.round(
                F.col("n_both")
                / (F.col("n_a") + F.col("n_b") - F.col("n_both")).cast(
                    "double"
                ),
                6,
            ).alias("jaccard"),
        )
    )


ORACLE_SQL["jaccard_event_type_pairs"] = """
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    nt AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM ut GROUP BY 1
    ),
    inter AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(count(*) AS BIGINT) AS n_both
      FROM ut a JOIN ut b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT type_a, type_b, n_both,
           round(n_both / CAST(na.n + nb.n - n_both AS DOUBLE), 6) AS jaccard
    FROM inter
    JOIN nt na ON na.event_type = type_a
    JOIN nt nb ON nb.event_type = type_b
"""


def q_dup_rate_by_source(spark, sf_dir):
    """Per-source exact-duplicate rate: the share of each source's docs
    whose text also appears elsewhere in the corpus (corpus-wide
    multiplicity > 1) — the contamination-pressure number a mixture
    builder reads before weighting a source.  The shuffle key is
    md5(text), not the text itself (narrow fixed-width shuffle rows at
    100 TB; md5 is engine-portable so the oracle groups identically,
    and a 128-bit collision is negligible against corpus sizes).
    Two key shuffles (multiplicity count, then source rollup), counts
    exact int64, rate one double division."""
    d = _t(spark, sf_dir, "documents")
    h = d.select("source", F.md5("text").alias("h"))
    mult = h.groupBy("h").agg(F.count(F.lit(1)).alias("m"))
    j = h.join(mult, "h")
    per = j.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("m") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_dup"),
    )
    return per.select(
        "source",
        "n_docs",
        "n_dup",
        F.round(F.col("n_dup") / F.col("n_docs").cast("double"), 6).alias(
            "dup_rate"
        ),
    )


ORACLE_SQL["dup_rate_by_source"] = """
    WITH h AS (SELECT source, md5(text) AS h FROM documents),
    mult AS (SELECT h, CAST(count(*) AS BIGINT) AS m FROM h GROUP BY 1)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN m > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
           round(sum(CASE WHEN m > 1 THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS dup_rate
    FROM h JOIN mult USING (h)
    GROUP BY 1
"""


QUERIES["token_coverage_curve"] = q_token_coverage_curve
QUERIES["lang_gini_by_source"] = q_lang_gini_by_source
QUERIES["revenue_trend_by_nation"] = q_revenue_trend_by_nation
QUERIES["latest_order_per_customer"] = q_latest_order_per_customer
QUERIES["jaccard_event_type_pairs"] = q_jaccard_event_type_pairs
QUERIES["dup_rate_by_source"] = q_dup_rate_by_source


# ---------------------------------------------------------------------------
# round-5 continuation: portable near-dup twins (full DuckDB oracles for the
# MinHash-LSH / SimHash family, whose production keys are xxhash64-based and
# therefore rows-only)
# ---------------------------------------------------------------------------


def q_dedup_minhash_lsh_portable(spark, sf_dir):
    """Cross-engine MinHash-LSH candidate pairs (k=12, b=6, r=2) over
    word-2-grams of ``documents.text`` — the ORACLE-CERTIFIED twin of
    ``dedup_minhash_lsh``: same banded-bucket algebra, but rank-based
    term ids and (a*x+c) mod p hashes that DuckDB evaluates bit-for-bit
    identically (every intermediate < 2^61).  Verification tier at
    100 TB (run on samples/candidates); the headline stays xxhash64."""
    from parquet_merger_spark.operators.dedup import minhash_lsh_pairs_portable

    d = _t(spark, sf_dir, "documents")
    return minhash_lsh_pairs_portable(d, "doc_id", "text")


def q_dedup_simhash_portable(spark, sf_dir):
    """Cross-engine 16-bit tf-weighted SimHash per document — the
    oracle-certified twin of ``dedup_simhash``'s signature stage (same
    bit-vote algebra, portable arithmetic).  Row-local after the
    dictionary join: one groupBy(doc) shuffle, no window."""
    from parquet_merger_spark.operators.dedup import simhash_signatures_portable

    d = _t(spark, sf_dir, "documents")
    return simhash_signatures_portable(d, "doc_id", "text")


def _portable_sql_parts():
    from parquet_merger_spark.operators.dedup import (
        PORTABLE_HASH_AC,
        PORTABLE_MOD,
    )

    code = (
        "LEAST(CASE WHEN len(term) >= 1 THEN ord(substr(term, 1, 1)) ELSE 0 END, 127) * 128"
        " + LEAST(CASE WHEN len(term) >= 2 THEN ord(substr(term, 2, 1)) ELSE 0 END, 127)"
    )
    vocab = f"""
        tok AS (
          SELECT doc_id,
                 generate_subscripts(string_split(text, ' '), 1) AS pos,
                 unnest(string_split(text, ' ')) AS term
          FROM documents
        ), terms AS (SELECT DISTINCT term FROM tok),
        vocab AS (
          SELECT term,
                 CAST(row_number() OVER (ORDER BY {code}, term) AS BIGINT)
                   AS term_id
          FROM terms
        )"""
    return PORTABLE_HASH_AC, PORTABLE_MOD, vocab


def _portable_lsh_sql_parts() -> tuple[str, str]:
    """Shared candidate chain for the portable MinHash-LSH oracles: the
    (vocab, vsz, ids, grams, sig, bb) CTE block and the banded pair-join
    SELECT.  ``dedup_minhash_lsh_portable`` returns the pairs directly;
    ``_ngram_jaccard_bounded_sql`` wraps them as its candidate CTE — ONE
    spelling of the hash constants / gram identity / band layout, so the
    bounded key's oracle can never silently drift from the LSH oracle it
    takes its candidates from."""
    AC, P, vocab = _portable_sql_parts()
    mins = ",\n                 ".join(
        f"min(({a} * xm + {c}) % {P}) AS m{i}"
        for i, (a, c) in enumerate(AC[:12])
    )
    bands = "\n          UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, m{2 * b} AS h1, m{2 * b + 1} AS h2 FROM sig"
        for b in range(6)
    )
    ctes = f"""{vocab},
        vsz AS (SELECT max(term_id) AS v FROM vocab),
        ids AS (
          SELECT t.doc_id, t.pos, v.term_id
          FROM tok t JOIN vocab v USING (term)
        ),
        grams AS (
          SELECT DISTINCT a.doc_id,
                 ((a.term_id * (vsz.v + 1) + b.term_id) % {P}) AS xm
          FROM ids a
          JOIN ids b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
          CROSS JOIN vsz
        ),
        sig AS (
          SELECT doc_id,
                 {mins}
          FROM grams GROUP BY doc_id
        ),
        bb AS (
          {bands}
        )"""
    pair_select = """SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bb a
        JOIN bb b ON a.band = b.band AND a.h1 = b.h1 AND a.h2 = b.h2
               AND a.doc_id < b.doc_id"""
    return ctes, pair_select


def _minhash_portable_sql() -> str:
    ctes, pair_select = _portable_lsh_sql_parts()
    return f"""
        WITH {ctes}
        {pair_select}
    """


def _simhash_portable_sql() -> str:
    AC, P, vocab = _portable_sql_parts()
    a0, c0 = AC[0]
    votes = ",\n                 ".join(
        f"CAST(sum(((h >> {b}) & 1) * 2 - 1) AS BIGINT) AS v{b}"
        for b in range(16)
    )
    sig = " + ".join(
        f"(CASE WHEN v{b} >= 0 THEN {1 << b} ELSE 0 END)" for b in range(16)
    )
    return f"""
        WITH {vocab},
        h AS (
          SELECT t.doc_id, (({a0} * v.term_id + {c0}) % {P}) AS h
          FROM tok t JOIN vocab v USING (term)
        ),
        votes AS (
          SELECT doc_id,
                 {votes}
          FROM h GROUP BY doc_id
        )
        SELECT doc_id, CAST({sig} AS BIGINT) AS simhash FROM votes
    """


ORACLE_SQL["dedup_minhash_lsh_portable"] = _minhash_portable_sql()
ORACLE_SQL["dedup_simhash_portable"] = _simhash_portable_sql()
QUERIES["dedup_minhash_lsh_portable"] = q_dedup_minhash_lsh_portable
QUERIES["dedup_simhash_portable"] = q_dedup_simhash_portable


def q_partition_pruned_scan(spark, sf_dir):
    """Hive-partitioned sink + PRUNED re-scan — the core 100 TB layout
    pattern: write events partitioned by event_type (one directory per
    type), then aggregate ONE type; the re-scan's file listing must touch
    only that partition (``PartitionFilters`` in the scan node — pinned
    by ``tests/test_portable.py::test_partition_pruned_scan_plan``).  At
    scale this is the difference between scanning 100 TB and scanning
    one partition's share; the filter never reaches row level at all."""
    e = _events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    )
    out = _scratch_dir(spark, "partition_pruned")
    e.write.mode("overwrite").partitionBy("event_type").parquet(out)
    r = spark.read.parquet(out).filter(F.col("event_type") == "purchase")
    return r.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("user_id").alias("sum_users"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


ORACLE_SQL["partition_pruned_scan"] = """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(user_id) AS BIGINT) AS sum_users,
           round(sum(value), 2) AS sum_value
    FROM events
    WHERE event_type = 'purchase'
    GROUP BY 1
"""
QUERIES["partition_pruned_scan"] = q_partition_pruned_scan


def q_kmv_distinct_rollup(spark, sf_dir):
    """Portable mergeable distinct-count sketch (KMV bottom-k, k=64) —
    the oracle-certified sibling of ``sketch_stats``' engine-specific
    HLL: per-day sketches of distinct users, day estimates, and an ALL
    row whose estimate comes from MERGING the day sketches (k smallest
    of the union — lossless, equal to sketching the whole period
    directly; pinned in ``tests/test_sketches.py``).  Every step is
    exact integer arithmetic (portable hash, bottom-k, (k-1)*p div h_k),
    so DuckDB reproduces the estimates bit-for-bit.  n_exact rides along
    per scope: the artifact records estimate AND truth side by side.

    Scale: sketch build = one (day, hash) distinct + skew-safe two-phase
    bottom-k; the merge moves k longs per day, never data — the pattern
    that answers rollup cardinalities at 100 TB without rescanning."""
    from parquet_merger_spark.operators.sketches import (
        kmv_estimate,
        kmv_merge,
        kmv_sketch,
    )

    k = 64
    e = _events(spark, sf_dir).select(
        F.date_trunc("day", F.col("ts")).cast("long").alias("day_epoch"),
        "user_id",
    )
    sk = kmv_sketch(e, ["day_epoch"], "user_id", k=k)
    day_est = kmv_estimate(sk, ["day_epoch"], k=k)
    day_exact = e.distinct().groupBy("day_epoch").agg(
        F.count(F.lit(1)).alias("n_exact")
    )
    days = day_exact.join(day_est, "day_epoch").select(
        F.col("day_epoch").alias("scope"), "n_exact", "n_est"
    )
    merged = kmv_merge(
        sk.select(F.lit(-1).cast("long").alias("scope"), "rank", "h"),
        ["scope"],
        k=k,
    )
    all_est = kmv_estimate(merged, ["scope"], k=k)
    all_exact = e.select("user_id").distinct().agg(
        F.lit(-1).cast("long").alias("scope"),
        F.count(F.lit(1)).alias("n_exact"),
    )
    all_row = all_exact.join(all_est, "scope").select("scope", "n_exact", "n_est")
    return days.unionByName(all_row)


def _kmv_sql() -> str:
    from parquet_merger_spark.operators.dedup import PORTABLE_HASH_AC, PORTABLE_MOD

    a0, c0 = PORTABLE_HASH_AC[0]
    p, k = PORTABLE_MOD, 64
    return f"""
        WITH e AS (
          SELECT CAST(FLOOR(epoch(date_trunc('day', CAST(ts AS TIMESTAMP))))
                   AS BIGINT) AS day_epoch,
                 user_id
          FROM events
        ),
        h AS (
          SELECT DISTINCT day_epoch,
                 (({a0} * (user_id % {p}) + {c0}) % {p}) AS h
          FROM e
        ),
        rk AS (
          SELECT day_epoch, h,
                 row_number() OVER (PARTITION BY day_epoch ORDER BY h) AS rank
          FROM h
        ),
        sk AS (SELECT * FROM rk WHERE rank <= {k}),
        day_est AS (
          SELECT day_epoch,
                 CASE WHEN count(*) < {k} THEN CAST(count(*) AS BIGINT)
                      ELSE ({k - 1} * CAST({p} AS BIGINT))
                           // max(CASE WHEN rank = {k} THEN h END)
                 END AS n_est
          FROM sk GROUP BY 1
        ),
        day_exact AS (
          SELECT day_epoch, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
          FROM e GROUP BY 1
        ),
        allh AS (SELECT DISTINCT h FROM sk),
        allrk AS (
          SELECT h, row_number() OVER (ORDER BY h) AS rank FROM allh
        ),
        allsk AS (SELECT * FROM allrk WHERE rank <= {k}),
        all_est AS (
          SELECT CASE WHEN count(*) < {k} THEN CAST(count(*) AS BIGINT)
                      ELSE ({k - 1} * CAST({p} AS BIGINT))
                           // max(CASE WHEN rank = {k} THEN h END)
                 END AS n_est
          FROM allsk
        )
        SELECT day_epoch AS scope, n_exact, n_est
        FROM day_exact JOIN day_est USING (day_epoch)
        UNION ALL
        SELECT CAST(-1 AS BIGINT) AS scope,
               (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM e) AS n_exact,
               (SELECT n_est FROM all_est) AS n_est
    """


ORACLE_SQL["kmv_distinct_rollup"] = _kmv_sql()
QUERIES["kmv_distinct_rollup"] = q_kmv_distinct_rollup


def q_kmeans_portable_assign(spark, sf_dir):
    """Cross-engine k-means (k=8, two unrolled Lloyd iterations) over the
    quantized embeddings — the oracle-certified twin of the production
    integer-Lloyd trainer behind ``embed_kmeans``/IVF/PQ (rows-only keys:
    their driver-side sampling has no SQL twin).  Every step — grid
    quantization, integer squared-L2, struct-min argmin with cid
    tie-break, floor(sum/n) centroid update — is arithmetic DuckDB
    reproduces bit-for-bit, so the ASSIGNMENTS and DISTANCES themselves
    hash-match, not just row counts.  Verification tier at 100 TB."""
    from parquet_merger_spark.operators.simsearch import kmeans_lloyd_portable

    e = _t(spark, sf_dir, "embeddings")
    return kmeans_lloyd_portable(e, "vec_id", "embedding", k=8, iters=2)


def _kmeans_cte_parts(k: int = 8, iters: int = 2, dims: int = 64):
    """Shared unrolled-Lloyd CTE text for the kmeans and IVF oracles:
    returns (parts, dist_sql) — v/c0..c{iters} definitions and the
    integer squared-L2 expression over aliases v/c."""
    from parquet_merger_spark.operators.simsearch import QUANT_SCALE

    dist = (
        f"CAST(list_sum(list_transform(range(1, {dims + 1}), "
        "i -> (v.q[i] - c.cvec[i]) * (v.q[i] - c.cvec[i]))) AS BIGINT)"
    )
    parts = [
        f"""v AS (
          SELECT vec_id AS id,
                 list_transform(embedding,
                   x -> CAST(round(CAST(x AS DOUBLE) * {QUANT_SCALE}, 0) AS BIGINT)) AS q
          FROM embeddings
        ),
        c0 AS (SELECT id AS cid, q AS cvec FROM v WHERE id < {k})"""
    ]
    for t in range(1, iters + 1):
        parts.append(f"""d{t} AS (
          SELECT v.id, c.cid, {dist} AS dist
          FROM v CROSS JOIN c{t - 1} c
        ),
        a{t} AS (
          SELECT id, cid FROM (
            SELECT id, cid,
                   row_number() OVER (PARTITION BY id ORDER BY dist, cid) AS rn
            FROM d{t}
          ) WHERE rn = 1
        ),
        m{t} AS (
          SELECT a.cid, gs.i AS pos,
                 CAST(floor(sum(v.q[gs.i]) / count(*)) AS BIGINT) AS cval
          FROM a{t} a JOIN v USING (id) CROSS JOIN range(1, {dims + 1}) gs(i)
          GROUP BY 1, 2
        ),
        c{t} AS (
          SELECT cid, list(cval ORDER BY pos) AS cvec FROM m{t} GROUP BY cid
        )""")
    return parts, dist


def _kmeans_portable_sql(k: int = 8, iters: int = 2, dims: int = 64) -> str:
    parts, dist = _kmeans_cte_parts(k, iters, dims)
    return (
        "\n        WITH "
        + ",\n        ".join(parts)
        + f""",
        df AS (
          SELECT v.id, c.cid, {dist} AS dist
          FROM v CROSS JOIN c{iters} c
        )
        SELECT id AS vec_id, cid, dist FROM (
          SELECT id, cid, dist,
                 row_number() OVER (PARTITION BY id ORDER BY dist, cid) AS rn
          FROM df
        ) WHERE rn = 1
    """
    )


ORACLE_SQL["kmeans_portable_assign"] = _kmeans_portable_sql()
QUERIES["kmeans_portable_assign"] = q_kmeans_portable_assign


def q_ivf_topk_portable(spark, sf_dir):
    """Cross-engine IVF approximate top-k (8 portable-Lloyd centroids,
    nprobe=2, exact integer dot scores, k=10 per query) — the
    oracle-certified twin of the rows-only production ``simsearch_ivf``
    family: ranks, neighbor ids AND scores hash-match DuckDB.
    Verification tier; the production IVF stays the 100 TB probe path."""
    from parquet_merger_spark.operators.simsearch import ivf_topk_portable

    e = _t(spark, sf_dir, "embeddings")
    return ivf_topk_portable(e, "vec_id", "embedding")


def _ivf_portable_sql(
    k: int = 8,
    iters: int = 2,
    dims: int = 64,
    n_queries: int = 5,
    nprobe: int = 2,
    topk: int = 10,
) -> str:
    parts, dist = _kmeans_cte_parts(k, iters, dims)
    score = (
        f"CAST(list_sum(list_transform(range(1, {dims + 1}), "
        "i -> (qv.qq[i] * cp.q[i]))) AS BIGINT)"
    )
    return (
        "\n        WITH "
        + ",\n        ".join(parts)
        + f""",
        assign AS (
          SELECT id, cid FROM (
            SELECT v.id, c.cid,
                   row_number() OVER (PARTITION BY v.id ORDER BY {dist}, c.cid)
                     AS rn
            FROM v CROSS JOIN c{iters} c
          ) WHERE rn = 1
        ),
        qv AS (SELECT id AS query_id, q AS qq FROM v WHERE id < {n_queries}),
        probes AS (
          SELECT query_id, cid FROM (
            SELECT qv.query_id, c.cid,
                   row_number() OVER (
                     PARTITION BY qv.query_id
                     ORDER BY CAST(list_sum(list_transform(range(1, {dims + 1}),
                       i -> (qv.qq[i] - c.cvec[i]) * (qv.qq[i] - c.cvec[i])))
                       AS BIGINT), c.cid) AS prank
            FROM qv CROSS JOIN c{iters} c
          ) WHERE prank <= {nprobe}
        ),
        cp AS (SELECT a.id AS vec_id, v.q, a.cid FROM assign a JOIN v ON a.id = v.id),
        cand AS (
          SELECT qv.query_id, cp.vec_id, {score} AS score
          FROM probes p
          JOIN cp ON p.cid = cp.cid
          JOIN qv ON qv.query_id = p.query_id
          WHERE cp.vec_id <> qv.query_id
        )
        SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id, score FROM (
          SELECT query_id, vec_id, score,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY score DESC, vec_id) AS rank
          FROM cand
        ) WHERE rank <= {topk}
    """
    )


ORACLE_SQL["ivf_topk_portable"] = _ivf_portable_sql()
QUERIES["ivf_topk_portable"] = q_ivf_topk_portable


def q_pq_topk_portable(spark, sf_dir):
    """Cross-engine product-quantization top-k (4 subspaces x 8 codes,
    per-query ADC lookup tables, exact integer parts) — the
    oracle-certified twin of the rows-only production ``simsearch_pq``
    family: ranks, ids AND scores hash-match DuckDB.  With the kmeans
    and IVF twins this completes the ANN family's algebra certification.
    Verification tier at 100 TB."""
    from parquet_merger_spark.operators.simsearch import pq_topk_portable

    e = _t(spark, sf_dir, "embeddings")
    return pq_topk_portable(e, "vec_id", "embedding")


def _pq_portable_sql(
    m_subs: int = 4,
    k_codes: int = 8,
    iters: int = 2,
    dims: int = 64,
    n_queries: int = 5,
    topk: int = 10,
) -> str:
    from parquet_merger_spark.operators.simsearch import QUANT_SCALE

    dsub = dims // m_subs
    sq_dist = (
        f"CAST(list_sum(list_transform(range(1, {dsub + 1}), "
        "i -> (v.q[i] - c.cvec[i]) * (v.q[i] - c.cvec[i]))) AS BIGINT)"
    )
    dot = (
        f"CAST(list_sum(list_transform(range(1, {dsub + 1}), "
        "i -> (v.q[i] * c.cvec[i]))) AS BIGINT)"
    )
    parts = [
        f"""v AS (
          SELECT vec_id AS id,
                 list_transform(embedding,
                   x -> CAST(round(CAST(x AS DOUBLE) * {QUANT_SCALE}, 0) AS BIGINT)) AS q
          FROM embeddings
        )"""
    ]
    for s in range(m_subs):
        lo, hi = s * dsub + 1, (s + 1) * dsub
        parts.append(
            f"vs{s} AS (SELECT id, q[{lo}:{hi}] AS q FROM v),\n"
            f"        cs{s}_0 AS (SELECT id AS cid, q AS cvec FROM vs{s} WHERE id < {k_codes})"
        )
        for t in range(1, iters + 1):
            parts.append(f"""as{s}_{t} AS (
          SELECT id, cid FROM (
            SELECT v.id, c.cid,
                   row_number() OVER (PARTITION BY v.id ORDER BY {sq_dist}, c.cid) AS rn
            FROM vs{s} v CROSS JOIN cs{s}_{t - 1} c
          ) WHERE rn = 1
        ),
        ms{s}_{t} AS (
          SELECT a.cid, gs.i AS pos,
                 CAST(floor(sum(v.q[gs.i]) / count(*)) AS BIGINT) AS cval
          FROM as{s}_{t} a JOIN vs{s} v USING (id)
          CROSS JOIN range(1, {dsub + 1}) gs(i)
          GROUP BY 1, 2
        ),
        cs{s}_{t} AS (
          SELECT cid, list(cval ORDER BY pos) AS cvec FROM ms{s}_{t} GROUP BY cid
        )""")
        parts.append(f"""code{s} AS (
          SELECT id, {s} AS sub, cid AS code FROM (
            SELECT v.id, c.cid,
                   row_number() OVER (PARTITION BY v.id ORDER BY {sq_dist}, c.cid) AS rn
            FROM vs{s} v CROSS JOIN cs{s}_{iters} c
          ) WHERE rn = 1
        ),
        lut{s} AS (
          SELECT v.id AS query_id, {s} AS sub, c.cid AS code, {dot} AS part
          FROM (SELECT id, q FROM vs{s} WHERE id < {n_queries}) v
          CROSS JOIN cs{s}_{iters} c
        )""")
    codes_u = "\n          UNION ALL ".join(f"SELECT * FROM code{s}" for s in range(m_subs))
    lut_u = "\n          UNION ALL ".join(f"SELECT * FROM lut{s}" for s in range(m_subs))
    return (
        "\n        WITH "
        + ",\n        ".join(parts)
        + f""",
        codes AS (
          {codes_u}
        ),
        lut AS (
          {lut_u}
        ),
        scored AS (
          SELECT l.query_id, cd.id, CAST(sum(l.part) AS BIGINT) AS score
          FROM codes cd
          JOIN lut l ON l.sub = cd.sub AND l.code = cd.code
          WHERE cd.id <> l.query_id
          GROUP BY 1, 2
          HAVING count(*) = {m_subs}
        )
        SELECT query_id, CAST(rank AS BIGINT) AS rank, id AS vec_id, score FROM (
          SELECT query_id, id, score,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY score DESC, id) AS rank
          FROM scored
        ) WHERE rank <= {topk}
    """
    )


ORACLE_SQL["pq_topk_portable"] = _pq_portable_sql()
QUERIES["pq_topk_portable"] = q_pq_topk_portable


def q_quantile_sketch_rollup(spark, sf_dir):
    """Portable mergeable QUANTILE sketch with lossless rollup — the
    order-statistics sibling of ``kmv_distinct_rollup``: per-event-type
    sketches (value-count tables of a deterministic 1/8 hash sample of
    event ids), p50/p95 estimates per type, and an ``__all__`` row whose
    estimates come from MERGING the type sketches (counts add — lossless,
    equal to sketching the whole table directly; pinned in
    ``tests/test_sketches.py``).  Target ranks are exact integers
    ``(n-1)*num div den + 1`` and the emitted value is selected from the
    cumulative count table, so DuckDB reproduces every row bit-for-bit.
    ``v_exact`` (the ungated order statistic, same selection rule) rides
    along: the artifact records estimate AND truth side by side.

    Scale: the sketch is one map-side-combinable (type, value) groupBy
    over the sampled subset; quantile selection windows run over COUNT
    TABLES (distinct sampled values), never rows — no single-task data
    sort at any grain.  At 100 TB the exact tier is what you drop; the
    sketch tier answers percentile dashboards at any rollup grain from
    a few thousand (value, cnt) pairs per partition."""
    from parquet_merger_spark.operators.sketches import (
        vq_merge,
        vq_quantiles,
        vq_sketch,
    )

    qs = [("p50", 1, 2), ("p95", 19, 20)]
    e = _events(spark, sf_dir).select(
        F.col("event_type").alias("scope"), "event_id", "value"
    )
    sk = vq_sketch(e, ["scope"], "value", "event_id", rate_den=8)
    sk_all = vq_merge(sk.withColumn("scope", F.lit("__all__")), ["scope"])
    est = vq_quantiles(sk.unionByName(sk_all), ["scope"], qs)

    full = (
        e.filter(F.col("value").isNotNull())
        .groupBy("scope", F.col("value").alias("v"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    full_all = vq_merge(full.withColumn("scope", F.lit("__all__")), ["scope"])
    exact = vq_quantiles(full.unionByName(full_all), ["scope"], qs).select(
        "scope", "q_label", F.col("v").alias("v_exact")
    )
    return est.join(exact, ["scope", "q_label"]).select(
        "scope",
        "q_label",
        F.col("n").alias("n_sample"),
        F.col("v").alias("v_est"),
        "v_exact",
    )


def _vq_sql() -> str:
    from parquet_merger_spark.operators.dedup import PORTABLE_HASH_AC, PORTABLE_MOD

    a1, c1 = PORTABLE_HASH_AC[1]
    p = PORTABLE_MOD
    thr = p // 8
    sel = "cum - cnt < ((n - 1) * num) // den + 1 AND ((n - 1) * num) // den + 1 <= cum"
    return f"""
        WITH e AS (
          SELECT event_type AS scope, event_id, value AS v
          FROM events WHERE value IS NOT NULL
        ),
        samp AS (
          SELECT scope, v, count(*) AS cnt FROM e
          WHERE (({a1} * (event_id % {p}) + {c1}) % {p}) < {thr}
          GROUP BY 1, 2
        ),
        samp2 AS (
          SELECT * FROM samp
          UNION ALL
          SELECT '__all__' AS scope, v, CAST(sum(cnt) AS BIGINT) AS cnt
          FROM samp GROUP BY 2
        ),
        sc AS (
          SELECT scope, v, cnt,
                 sum(cnt) OVER (PARTITION BY scope ORDER BY v) AS cum,
                 sum(cnt) OVER (PARTITION BY scope) AS n
          FROM samp2
        ),
        ql(q_label, num, den) AS (VALUES ('p50', 1, 2), ('p95', 19, 20)),
        est AS (
          SELECT scope, q_label, CAST(n AS BIGINT) AS n_sample, v AS v_est
          FROM sc CROSS JOIN ql WHERE {sel}
        ),
        full_t AS (SELECT scope, v, count(*) AS cnt FROM e GROUP BY 1, 2),
        full2 AS (
          SELECT * FROM full_t
          UNION ALL
          SELECT '__all__' AS scope, v, CAST(sum(cnt) AS BIGINT) AS cnt
          FROM full_t GROUP BY 2
        ),
        fc AS (
          SELECT scope, v, cnt,
                 sum(cnt) OVER (PARTITION BY scope ORDER BY v) AS cum,
                 sum(cnt) OVER (PARTITION BY scope) AS n
          FROM full2
        ),
        ex AS (
          SELECT scope, q_label, v AS v_exact
          FROM fc CROSS JOIN ql WHERE {sel}
        )
        SELECT est.scope, est.q_label, est.n_sample, est.v_est, ex.v_exact
        FROM est JOIN ex ON est.scope = ex.scope AND est.q_label = ex.q_label
    """


ORACLE_SQL["quantile_sketch_rollup"] = _vq_sql()
QUERIES["quantile_sketch_rollup"] = q_quantile_sketch_rollup


def q_cms_freq_rollup(spark, sf_dir):
    """Portable count-min frequency sketch with lossless rollup — the
    one-pass tier ``heavy_hitters``'s docstring promises: per-day CMS
    matrices (3 x 256 counters) of user event activity, merged to the
    corpus grain by elementwise counter addition (CMS(A ∪ B) == CMS(A)
    + CMS(B) exactly — the merged matrix equals sketching the whole
    table directly, pinned in ``tests/test_sketches.py``), then min-of-
    counters estimates for every distinct user with the exact count
    riding along.  Overestimate-only by construction (est >= exact for
    every row — also test-pinned).  All integer arithmetic on the
    portable hash family, so DuckDB reproduces estimates bit-for-bit.

    Scale: sketch build = explode(3) + map-side-combinable groupBy into
    768 longs per day; the merge shuffles counters, never data; the
    estimate probe is a broadcast-sized candidate join.  At 100 TB the
    exact tier is what you drop — per-partition CMS answers frequency
    queries at any rollup grain from a few KB per partition."""
    from parquet_merger_spark.operators.sketches import (
        cms_estimate,
        cms_merge,
        cms_sketch,
    )

    e = _events(spark, sf_dir).select(
        F.date_trunc("day", F.col("ts")).cast("long").alias("day_epoch"),
        "user_id",
    )
    sk = cms_sketch(e, ["day_epoch"], "user_id")
    merged = cms_merge(
        sk.select(F.lit(0).alias("g"), "i", "slot", "c"), ["g"]
    )
    users = e.select("user_id").distinct()
    est = cms_estimate(merged, users, "user_id")
    exact = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_exact"))
    return exact.join(est, "user_id").select(
        "user_id",
        F.col("n_exact").cast("long").alias("n_exact"),
        F.col("n_est").cast("long").alias("n_est"),
    )


def _cms_sql(depth: int = 3, width: int = 256, which_base: int = 2) -> str:
    from parquet_merger_spark.operators.dedup import PORTABLE_HASH_AC, PORTABLE_MOD

    p = PORTABLE_MOD
    a_case = " ".join(
        f"WHEN {i} THEN {PORTABLE_HASH_AC[which_base + i][0]}"
        for i in range(depth)
    )
    c_case = " ".join(
        f"WHEN {i} THEN {PORTABLE_HASH_AC[which_base + i][1]}"
        for i in range(depth)
    )
    slot = (
        f"(((CASE gs.i {a_case} END * (user_id % {p}) + "
        f"CASE gs.i {c_case} END) % {p}) % {width})"
    )
    # the oracle sketches the corpus grain directly: lossless merge
    # (counters add) makes that identical to Spark's merged day sketches
    return f"""
        WITH e AS (SELECT user_id FROM events),
        probes AS (
          SELECT user_id, gs.i, {slot} AS slot
          FROM e CROSS JOIN range(0, {depth}) gs(i)
        ),
        counters AS (
          SELECT i, slot, CAST(count(*) AS BIGINT) AS c
          FROM probes GROUP BY 1, 2
        ),
        cand AS (SELECT DISTINCT user_id FROM e),
        cprobes AS (
          SELECT user_id, gs.i, {slot} AS slot
          FROM cand CROSS JOIN range(0, {depth}) gs(i)
        ),
        est AS (
          SELECT cp.user_id,
                 CAST(min(coalesce(ct.c, 0)) AS BIGINT) AS n_est
          FROM cprobes cp LEFT JOIN counters ct
            ON ct.i = cp.i AND ct.slot = cp.slot
          GROUP BY 1
        ),
        exact AS (
          SELECT user_id, CAST(count(*) AS BIGINT) AS n_exact
          FROM e GROUP BY 1
        )
        SELECT exact.user_id, n_exact, n_est
        FROM exact JOIN est ON exact.user_id = est.user_id
    """


ORACLE_SQL["cms_freq_rollup"] = _cms_sql()
QUERIES["cms_freq_rollup"] = q_cms_freq_rollup


def q_stream_cms_freq(spark, sf_dir):
    """STREAMING count-min maintenance driven end-to-end: events replay
    in three mtime-pinned micro-batches; the counter matrix is a
    complete-mode streaming aggregation whose state is bounded at 3*256
    rows BY CONSTRUCTION (the sketch bounds state, not a watermark);
    after the drain, min-of-counters estimates for every user are
    computed from the streamed matrix and certified by the BATCH twin's
    oracle (``cms_freq_rollup``) — counters add, so stream == batch
    bit-for-bit.  The 100 TB shape this certifies: per-micro-batch
    map-side-combined deltas folding into a few-KB state store,
    answering frequency queries continuously without ever holding
    per-key state."""
    import shutil
    import uuid

    from parquet_merger_spark.operators.sketches import cms_estimate
    from parquet_merger_spark.streaming.events import cms_freq_stream

    base = _scratch_dir(spark, "stream_cms_freq")
    shutil.rmtree(base, ignore_errors=True)

    e = _events(spark, sf_dir).select("event_id", "user_id")
    slices = [
        e.filter(F.col("event_id") % 3 == i) for i in range(3)
    ]
    src = _write_replay_batches(base, slices)

    name = f"scms_{uuid.uuid4().hex[:8]}"
    q = cms_freq_stream(
        spark, src, os.path.join(base, "ckpt"), query_name=name
    )
    _drain_stream(q, "stream_cms_freq")
    counters = spark.table(name)
    users = e.select("user_id").distinct()
    est = cms_estimate(counters, users, "user_id")
    exact = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_exact"))
    return exact.join(est, "user_id").select(
        "user_id",
        F.col("n_exact").cast("long").alias("n_exact"),
        F.col("n_est").cast("long").alias("n_est"),
    )


ORACLE_SQL["stream_cms_freq"] = ORACLE_SQL["cms_freq_rollup"]
QUERIES["stream_cms_freq"] = q_stream_cms_freq


def q_bloom_prefilter_join(spark, sf_dir):
    """Runtime Bloom-filter semi-join reduction — the shuffle killer for
    selective dim joins too big to broadcast whole: the dim's key set
    (153 high-balance customers) is packed into a portable 4096-bit /
    3-hash Bloom (8 KB, built fully in-plan), broadcast, and applied to
    the orders scan ROW-LOCALLY, so ~90% of fact rows die before the
    sort-merge join's exchange ever sees them (the join is merge-hinted
    precisely to model the cannot-broadcast regime this targets; the
    measured prune is pinned in ``tests/test_sketches.py``).  Blooms
    have NO FALSE NEGATIVES, so the pre-filtered exact join returns the
    PLAIN join's rows — the key is certified by the plain join's DuckDB
    oracle, no bloom replication needed.  False positives only cost
    shuffle bytes and are removed by the join itself."""
    from parquet_merger_spark.operators.sketches import (
        bloom_build,
        bloom_filter_rows,
    )

    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    dim = c.filter(F.col("c_acctbal") >= 9000).select(
        "c_custkey", "c_mktsegment"
    )
    bloom = bloom_build(dim, "c_custkey")
    survivors = bloom_filter_rows(
        o.crossJoin(F.broadcast(bloom)), "words", "o_custkey"
    ).drop("words")
    joined = survivors.join(
        dim.hint("merge"), survivors.o_custkey == dim.c_custkey
    )
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
    )


ORACLE_SQL["bloom_prefilter_join"] = """
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 2) AS sum_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE c_acctbal >= 9000
    GROUP BY 1
"""
QUERIES["bloom_prefilter_join"] = q_bloom_prefilter_join


def q_kmv_set_ops(spark, sf_dir):
    """Sketch SET ALGEBRA over mergeable KMV sketches: the distinct-user
    overlap of two behavioral segments (purchase vs click) computed from
    their 64-long sketches ALONE — |A ∪ B| from the lossless bottom-k
    merge, |A ∩ B| by inclusion-exclusion (est_a + est_b - est_union,
    exact integer arithmetic) — with the exact counts riding along.
    Four rows: (measure, n_est, n_exact) for a / b / union / intersect.
    Every estimate is deterministic portable-hash arithmetic, so DuckDB
    reproduces all four bit-for-bit.

    The 100 TB story this completes: per-segment sketches (a few hundred
    bytes) answer audience-overlap questions — union, intersection,
    Jaccard — at ANY segment-pair grain without rescanning or holding
    per-user state; the shuffle moves k longs per segment, never ids."""
    from parquet_merger_spark.operators.sketches import (
        kmv_estimate,
        kmv_merge,
        kmv_sketch,
    )

    k = 64
    seg = (
        _events(spark, sf_dir)
        .filter(F.col("event_type").isin("purchase", "click"))
        .filter(F.col("value") > 120)
        .select(F.col("event_type").alias("seg"), "user_id")
    )
    sk = kmv_sketch(seg, ["seg"], "user_id", k=k)
    est = kmv_estimate(sk, ["seg"], k=k)
    u_est = kmv_estimate(
        kmv_merge(sk.select(F.lit("u").alias("seg"), "rank", "h"), ["seg"], k=k),
        ["seg"],
        k=k,
    )
    wide_est = (
        est.groupBy()
        .agg(
            F.max(F.when(F.col("seg") == "purchase", F.col("n_est"))).alias("ea"),
            F.max(F.when(F.col("seg") == "click", F.col("n_est"))).alias("eb"),
        )
        .crossJoin(F.broadcast(u_est.select(F.col("n_est").alias("eu"))))
    )
    exact = seg.distinct().groupBy().agg(
        F.count_distinct(
            F.when(F.col("seg") == "purchase", F.col("user_id"))
        ).alias("xa"),
        F.count_distinct(
            F.when(F.col("seg") == "click", F.col("user_id"))
        ).alias("xb"),
        F.count_distinct("user_id").alias("xu"),
    )
    wide = wide_est.crossJoin(F.broadcast(exact))
    rows = F.array(
        F.struct(F.lit("a").alias("measure"), F.col("ea").alias("n_est"), F.col("xa").alias("n_exact")),
        F.struct(F.lit("b").alias("measure"), F.col("eb").alias("n_est"), F.col("xb").alias("n_exact")),
        F.struct(F.lit("union").alias("measure"), F.col("eu").alias("n_est"), F.col("xu").alias("n_exact")),
        F.struct(
            F.lit("intersect").alias("measure"),
            (F.col("ea") + F.col("eb") - F.col("eu")).alias("n_est"),
            (F.col("xa") + F.col("xb") - F.col("xu")).alias("n_exact"),
        ),
    )
    return wide.select(F.explode(rows).alias("r")).select(
        "r.measure",
        F.col("r.n_est").cast("long").alias("n_est"),
        F.col("r.n_exact").cast("long").alias("n_exact"),
    )


def _kmv_set_ops_sql(k: int = 64) -> str:
    from parquet_merger_spark.operators.dedup import PORTABLE_HASH_AC, PORTABLE_MOD

    a0, c0 = PORTABLE_HASH_AC[0]
    p = PORTABLE_MOD
    est = (
        f"CASE WHEN count(*) < {k} THEN CAST(count(*) AS BIGINT) "
        f"ELSE ({k - 1} * CAST({p} AS BIGINT)) "
        f"// max(CASE WHEN rank = {k} THEN h END) END"
    )
    return f"""
        WITH seg AS (
          SELECT event_type AS seg, user_id FROM events
          WHERE event_type IN ('purchase', 'click') AND value > 120
        ),
        h AS (
          SELECT DISTINCT seg, (({a0} * (user_id % {p}) + {c0}) % {p}) AS h
          FROM seg
        ),
        rk AS (
          SELECT seg, h,
                 row_number() OVER (PARTITION BY seg ORDER BY h) AS rank
          FROM h
        ),
        sk AS (SELECT * FROM rk WHERE rank <= {k}),
        est AS (SELECT seg, {est} AS n_est FROM sk GROUP BY seg),
        uh AS (SELECT DISTINCT h FROM sk),
        urk AS (SELECT h, row_number() OVER (ORDER BY h) AS rank FROM uh),
        usk AS (SELECT * FROM urk WHERE rank <= {k}),
        uest AS (SELECT {est} AS n_est FROM usk),
        w AS (
          SELECT (SELECT n_est FROM est WHERE seg = 'purchase') AS ea,
                 (SELECT n_est FROM est WHERE seg = 'click') AS eb,
                 (SELECT n_est FROM uest) AS eu,
                 (SELECT count(DISTINCT user_id) FROM seg WHERE seg = 'purchase') AS xa,
                 (SELECT count(DISTINCT user_id) FROM seg WHERE seg = 'click') AS xb,
                 (SELECT count(DISTINCT user_id) FROM seg) AS xu
        )
        SELECT 'a' AS measure, CAST(ea AS BIGINT) AS n_est,
               CAST(xa AS BIGINT) AS n_exact FROM w
        UNION ALL
        SELECT 'b', CAST(eb AS BIGINT), CAST(xb AS BIGINT) FROM w
        UNION ALL
        SELECT 'union', CAST(eu AS BIGINT), CAST(xu AS BIGINT) FROM w
        UNION ALL
        SELECT 'intersect', CAST(ea + eb - eu AS BIGINT),
               CAST(xa + xb - xu AS BIGINT) FROM w
    """


ORACLE_SQL["kmv_set_ops"] = _kmv_set_ops_sql()
QUERIES["kmv_set_ops"] = q_kmv_set_ops


def q_decontaminate_bloom_probe(spark, sf_dir):
    """The persisted-index decontamination probe with the runtime Bloom
    prefilter knob ON (`contamination_probe(bloom_prefilter_bits=...)`):
    the eval set's gram hashes ride along as a broadcast 128 KB Bloom
    and prune index postings row-locally BEFORE the equi-join's
    exchange.  No false negatives => identical to the plain probe, so
    the key is certified by `decontaminate`'s DuckDB oracle; the prune
    ratio and plan shape are pinned in ``tests/test_round6.py``.  At
    100 TB this is the difference between shuffling the whole persisted
    gram index per eval release and shuffling only the matching slice."""
    from parquet_merger_spark.operators.dedup import (
        contamination_probe,
        load_gram_index,
        write_gram_index,
    )

    d = _t(spark, sf_dir, "documents")
    is_train = F.col("source").isin([f"src{i}" for i in range(10)])
    idx = _scratch_dir(
        spark, f"gram_index_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    if not os.path.exists(os.path.join(idx, "meta", "_SUCCESS")):
        write_gram_index(d.filter(is_train), idx, shingle_words=3)
    grams, sw = load_gram_index(spark, idx)
    return contamination_probe(
        grams,
        d.filter(~is_train),
        shingle_words=sw,
        min_shared=5,
        bloom_prefilter_bits=1 << 20,
    )


ORACLE_SQL["decontaminate_bloom_probe"] = ORACLE_SQL["decontaminate"]
QUERIES["decontaminate_bloom_probe"] = q_decontaminate_bloom_probe


def q_ivfpq_topk_portable(spark, sf_dir):
    """Cross-engine IVF-PQ top-k — the production composition (coarse
    quantizer -> residual encoding -> per-subspace codebooks -> nprobe
    probe -> coarse-dot + residual-LUT asymmetric scoring) assembled
    from the certified portable pieces; ranks, ids AND scores
    hash-match the unrolled DuckDB oracle.  Completes the ANN algebra:
    kmeans (train), IVF (bucket+probe), PQ (ADC rank), and now their
    production composition are all cross-engine certified.
    Verification tier at 100 TB."""
    from parquet_merger_spark.operators.simsearch import ivfpq_topk_portable

    e = _t(spark, sf_dir, "embeddings")
    return ivfpq_topk_portable(e, "vec_id", "embedding")


def _ivfpq_portable_sql(
    k_clusters: int = 8,
    iters: int = 2,
    dims: int = 64,
    n_queries: int = 5,
    nprobe: int = 2,
    m_subs: int = 4,
    k_codes: int = 8,
    topk: int = 10,
) -> str:
    parts, dist = _kmeans_cte_parts(k_clusters, iters, dims)
    dsub = dims // m_subs
    sq_dist = (
        f"CAST(list_sum(list_transform(range(1, {dsub + 1}), "
        "i -> (v.q[i] - c.cvec[i]) * (v.q[i] - c.cvec[i]))) AS BIGINT)"
    )
    sub_dot = (
        f"CAST(list_sum(list_transform(range(1, {dsub + 1}), "
        "i -> (v.q[i] * c.cvec[i]))) AS BIGINT)"
    )
    parts.append(f"""assign AS (
          SELECT id, cid FROM (
            SELECT v.id, c.cid,
                   row_number() OVER (PARTITION BY v.id ORDER BY {dist}, c.cid)
                     AS rn
            FROM v CROSS JOIN c{iters} c
          ) WHERE rn = 1
        ),
        resid AS (
          SELECT v.id, a.cid,
                 list_transform(range(1, {dims + 1}), i -> v.q[i] - c.cvec[i]) AS q
          FROM assign a JOIN v USING (id) JOIN c{iters} c ON c.cid = a.cid
        ),
        qv AS (SELECT id AS query_id, q AS qq FROM v WHERE id < {n_queries}),
        probes AS (
          SELECT query_id, cid FROM (
            SELECT qv.query_id, c.cid,
                   row_number() OVER (
                     PARTITION BY qv.query_id
                     ORDER BY CAST(list_sum(list_transform(range(1, {dims + 1}),
                       i -> (qv.qq[i] - c.cvec[i]) * (qv.qq[i] - c.cvec[i])))
                       AS BIGINT), c.cid) AS prank
            FROM qv CROSS JOIN c{iters} c
          ) WHERE prank <= {nprobe}
        ),
        cpart AS (
          SELECT qv.query_id, c.cid,
                 CAST(list_sum(list_transform(range(1, {dims + 1}),
                   i -> (qv.qq[i] * c.cvec[i]))) AS BIGINT) AS cpart
          FROM qv CROSS JOIN c{iters} c
        )""")
    for s in range(m_subs):
        lo, hi = s * dsub + 1, (s + 1) * dsub
        parts.append(
            f"rs{s} AS (SELECT id, q[{lo}:{hi}] AS q FROM resid),\n"
            f"        cs{s}_0 AS (SELECT id AS cid, q AS cvec FROM rs{s} WHERE id < {k_codes})"
        )
        for t in range(1, iters + 1):
            parts.append(f"""as{s}_{t} AS (
          SELECT id, cid FROM (
            SELECT v.id, c.cid,
                   row_number() OVER (PARTITION BY v.id ORDER BY {sq_dist}, c.cid) AS rn
            FROM rs{s} v CROSS JOIN cs{s}_{t - 1} c
          ) WHERE rn = 1
        ),
        ms{s}_{t} AS (
          SELECT a.cid, gs.i AS pos,
                 CAST(floor(sum(v.q[gs.i]) / count(*)) AS BIGINT) AS cval
          FROM as{s}_{t} a JOIN rs{s} v USING (id)
          CROSS JOIN range(1, {dsub + 1}) gs(i)
          GROUP BY 1, 2
        ),
        cs{s}_{t} AS (
          SELECT cid, list(cval ORDER BY pos) AS cvec FROM ms{s}_{t} GROUP BY cid
        )""")
        parts.append(f"""code{s} AS (
          SELECT id, {s} AS sub, cid AS code FROM (
            SELECT v.id, c.cid,
                   row_number() OVER (PARTITION BY v.id ORDER BY {sq_dist}, c.cid) AS rn
            FROM rs{s} v CROSS JOIN cs{s}_{iters} c
          ) WHERE rn = 1
        ),
        lut{s} AS (
          SELECT v.id AS query_id, {s} AS sub, c.cid AS code, {sub_dot} AS part
          FROM (SELECT query_id AS id, qq[{lo}:{hi}] AS q FROM qv) v
          CROSS JOIN cs{s}_{iters} c
        )""")
    codes_u = "\n          UNION ALL ".join(
        f"SELECT * FROM code{s}" for s in range(m_subs)
    )
    lut_u = "\n          UNION ALL ".join(
        f"SELECT * FROM lut{s}" for s in range(m_subs)
    )
    return (
        "\n        WITH "
        + ",\n        ".join(parts)
        + f""",
        codes AS (
          {codes_u}
        ),
        lut AS (
          {lut_u}
        ),
        cand AS (
          SELECT p.query_id, r.cid, r.id
          FROM probes p JOIN resid r ON r.cid = p.cid
          WHERE r.id <> p.query_id
        ),
        adc AS (
          SELECT cn.query_id, cn.cid, cn.id, CAST(sum(l.part) AS BIGINT) AS rpart
          FROM cand cn
          JOIN codes cd ON cd.id = cn.id
          JOIN lut l ON l.query_id = cn.query_id
                    AND l.sub = cd.sub AND l.code = cd.code
          GROUP BY 1, 2, 3
          HAVING count(*) = {m_subs}
        ),
        scored AS (
          SELECT a.query_id, a.id, a.rpart + cp.cpart AS score
          FROM adc a JOIN cpart cp
            ON cp.query_id = a.query_id AND cp.cid = a.cid
        )
        SELECT query_id, CAST(rank AS BIGINT) AS rank, id AS vec_id, score FROM (
          SELECT query_id, id, score,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY score DESC, id) AS rank
          FROM scored
        ) WHERE rank <= {topk}
    """
    )


ORACLE_SQL["ivfpq_topk_portable"] = _ivfpq_portable_sql()
QUERIES["ivfpq_topk_portable"] = q_ivfpq_topk_portable


def q_mincount_distinct_rollup(spark, sf_dir):
    """Portable MinCount (FM + stochastic averaging, Giroire 2009)
    distinct-count sketch with lossless rollup — the STREAMING-capable
    member of the distinct family (KMV's bottom-k needs a per-group
    sort; MinCount state is an elementwise-min register matrix a plain
    streaming aggregation maintains).  Per-(event_type, day) register
    sketches merge to the event_type grain by elementwise min —
    LOSSLESS: merged == direct sketch, pinned in tests — then the pure
    int64 estimator (k * (p div sum-of-register-mins) - k) runs per
    type over event_id (distinct-event cardinality; ~2000 per type at
    sf0.01, enough load per register for the estimator's bias regime)
    with the exact COUNT(DISTINCT) riding along as the truth column.  One integer probe per row, no distinct shuffle: at 100 TB
    this is the cheap always-on distinct tier.  All portable-hash
    arithmetic, so DuckDB reproduces every estimate bit-for-bit."""
    from parquet_merger_spark.operators.sketches import (
        mincount_estimate,
        mincount_merge,
        mincount_sketch,
    )

    e = _events(spark, sf_dir).select(
        "event_type",
        F.date_trunc("day", F.col("ts")).cast("long").alias("day_epoch"),
        "event_id",
    )
    sk = mincount_sketch(e, ["event_type", "day_epoch"], "event_id")
    merged = mincount_merge(sk, ["event_type"])
    est = mincount_estimate(merged, ["event_type"])
    exact = e.groupBy("event_type").agg(
        F.countDistinct("event_id").cast("long").alias("n_exact")
    )
    return exact.join(est, "event_type").select(
        "event_type", "n_exact", F.col("n_est").cast("long").alias("n_est")
    )


def _mincount_sql(k: int = 64, which: int = 8) -> str:
    from parquet_merger_spark.operators.dedup import PORTABLE_HASH_AC, PORTABLE_MOD

    a, c = PORTABLE_HASH_AC[which]
    p = PORTABLE_MOD
    return f"""
        WITH h AS (
          SELECT event_type,
                 (({a} * (event_id % {p}) + {c}) % {p}) AS hv,
                 event_id
          FROM events
        ),
        r AS (
          SELECT event_type, hv % {k} AS reg, MIN(hv // {k}) AS m
          FROM h GROUP BY 1, 2
        ),
        agg AS (
          SELECT event_type, SUM(m) AS s, COUNT(*) AS kk FROM r GROUP BY 1
        ),
        est AS (
          SELECT event_type,
                 CAST(({k} * CAST({p} AS BIGINT))
                        // GREATEST(s + ({k} - kk) * ({p} // {k}), 1)
                      - {k} AS BIGINT) AS n_est
          FROM agg
        ),
        ex AS (
          SELECT event_type, CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_exact
          FROM events GROUP BY 1
        )
        SELECT event_type, n_exact, n_est FROM ex JOIN est USING (event_type)
    """


ORACLE_SQL["mincount_distinct_rollup"] = _mincount_sql()
QUERIES["mincount_distinct_rollup"] = q_mincount_distinct_rollup


def q_stream_mincount_distinct(spark, sf_dir):
    """STREAMING MinCount maintenance driven end-to-end: events replay
    in three mtime-pinned micro-batches; the register matrix is a
    complete-mode streaming aggregation whose state is bounded at
    |event_types| * 64 rows BY CONSTRUCTION (the sketch bounds the
    state store, not a watermark); after the drain, the estimator runs
    on the STREAMED registers and is certified by the batch twin's
    oracle (``mincount_distinct_rollup``) — min is associative, so
    stream == batch bit-for-bit.  With ``stream_cms_freq`` this gives
    the streaming tier both mergeable-sketch families: frequencies
    (counters add) and distinct counts (registers min)."""
    import shutil
    import uuid

    from parquet_merger_spark.operators.sketches import mincount_estimate
    from parquet_merger_spark.streaming.events import mincount_distinct_stream

    base = _scratch_dir(spark, "stream_mincount")
    shutil.rmtree(base, ignore_errors=True)

    e = _events(spark, sf_dir).select("event_id", "event_type")
    slices = [e.filter(F.col("event_id") % 3 == i) for i in range(3)]
    src = _write_replay_batches(base, slices)

    name = f"smc_{uuid.uuid4().hex[:8]}"
    q = mincount_distinct_stream(
        spark, src, os.path.join(base, "ckpt"), key_col="event_id", query_name=name
    )
    _drain_stream(q, "stream_mincount_distinct")
    registers = spark.table(name)
    est = mincount_estimate(registers, ["event_type"])
    exact = e.groupBy("event_type").agg(
        F.countDistinct("event_id").cast("long").alias("n_exact")
    )
    return exact.join(est, "event_type").select(
        "event_type", "n_exact", F.col("n_est").cast("long").alias("n_est")
    )


ORACLE_SQL["stream_mincount_distinct"] = ORACLE_SQL["mincount_distinct_rollup"]
QUERIES["stream_mincount_distinct"] = q_stream_mincount_distinct


def q_upsert_orders_bloom(spark, sf_dir):
    """The keyed upsert with the runtime Bloom key-set reduction ON
    (`upsert_by_key(bloom_prefilter_bits=...)`): update keys ride along
    as a broadcast 8 KB Bloom; bloom-negative base rows bypass the
    anti-join entirely and only the bloom-positive slice rides through
    its exchange.  No false negatives => identical to the plain upsert,
    so the key is certified by `upsert_orders`' DuckDB oracle; the
    bypass-fraction and result-identity are pinned in
    ``tests/test_round6.py``.  At 100 TB: shuffle the refresh-sized
    slice, not the base."""
    from parquet_merger_spark.operators.incremental import upsert_by_key

    o, repriced, fresh = _upsert_fixture_frames(spark, sf_dir)
    updates = repriced.unionByName(fresh)
    return upsert_by_key(o, updates, ["o_orderkey"], bloom_prefilter_bits=1 << 16)


ORACLE_SQL["upsert_orders_bloom"] = ORACLE_SQL["upsert_orders"]
QUERIES["upsert_orders_bloom"] = q_upsert_orders_bloom


def q_zorder_pruned_scan(spark, sf_dir):
    """Z-ORDER layout + 2-D pruned re-scan — the multi-dimension
    data-skipping primitive 1-D partitioning cannot express
    (`partition_pruned_scan` is its categorical little sibling): orders
    are bucketized on BOTH o_custkey and price-cents (256 uniform
    integer buckets each, boundaries from a 1-row min/max meta), the
    two bucket ids interleave into a Morton z-value, and the sink
    partitions by the z-value's top 4 bits (16 quad-tree cells).  A
    rectangle predicate (custkey buckets 64-191 x cents buckets 0-127)
    then touches only the 4 intersecting cells — `PartitionFilters`
    directory pruning, 75% of the layout never listed (plan-pinned in
    ``tests/test_round6.py``) — and the row-level re-filter makes the
    covering-set superset exact, so the key is certified by the plain
    full-scan predicate's DuckDB oracle.  At 100 TB: one clustering
    write serves range scans on EITHER dimension."""
    from parquet_merger_spark.operators.bucketing import (
        zorder_covering_buckets,
        zorder_value,
    )

    o = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    m = (
        o.agg(
            F.min("o_custkey").alias("kmin"),
            F.max("o_custkey").alias("kmax"),
            F.min(cents).alias("cmin"),
            F.max(cents).alias("cmax"),
        ).collect()[0]
    )  # 1-row layout meta — sanctioned model-sized collect
    kspan = m.kmax - m.kmin + 1
    cspan = m.cmax - m.cmin + 1
    bx = ((F.col("o_custkey") - F.lit(int(m.kmin))) * 256) / F.lit(int(kspan))
    by = ((cents - F.lit(int(m.cmin))) * 256) / F.lit(int(cspan))
    laid = o.select(
        "o_orderkey",
        "o_custkey",
        cents.alias("cents"),
        F.floor(bx).cast("long").alias("bx"),
        F.floor(by).cast("long").alias("by"),
    ).withColumn(
        "zbucket",
        F.shiftright(zorder_value(F.col("bx"), F.col("by")), 12),
    )
    out = _scratch_dir(spark, "zorder_layout")
    laid.write.mode("overwrite").partitionBy("zbucket").parquet(out)

    cover = zorder_covering_buckets((64, 191), (0, 127))
    r = (
        spark.read.parquet(out)
        .filter(F.col("zbucket").isin(cover))
        .filter(F.col("bx").between(64, 191) & F.col("by").between(0, 127))
    )
    return r.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("sum_cents"),
    )


ORACLE_SQL["zorder_pruned_scan"] = """
    WITH meta AS (
      SELECT min(o_custkey) AS kmin, max(o_custkey) AS kmax,
             min(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cmin,
             max(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cmax
      FROM orders
    ),
    b AS (
      SELECT CAST(floor(((o_custkey - kmin) * 256.0) / (kmax - kmin + 1)) AS BIGINT) AS bx,
             CAST(floor(((CAST(round(o_totalprice * 100, 0) AS BIGINT) - cmin) * 256.0)
                        / (cmax - cmin + 1)) AS BIGINT) AS by,
             CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
      FROM orders, meta
    )
    SELECT CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(cents) AS BIGINT) AS sum_cents
    FROM b
    WHERE bx BETWEEN 64 AND 191 AND by BETWEEN 0 AND 127
"""
QUERIES["zorder_pruned_scan"] = q_zorder_pruned_scan


def q_interval_overlap_join(spark, sf_dir):
    """Interval-overlap SELF-join (`operators.rangejoin.interval_overlap_pairs`)
    — the quadratic theta-join every engine special-cases (concurrent
    sessions, shipment-window collisions), here as a linear bucketized
    equi-join: each shipment's active window [ship, ship + 1 +
    qty % 14 days] explodes into 16-day buckets, candidates come from a
    plain hash join on (suppkey, bucket), the exact overlap predicate
    re-filters, and a count-once gate (bucket of greatest(start) — a
    bucket both intervals cover) keeps each true pair exactly once with
    NO distinct shuffle.  Output: per-supplier overlapping-pair count +
    total overlap days.  At 100 TB: candidate volume is O(rows x
    width/bucket_width), never O(rows^2); AQE splits skewed buckets."""
    from parquet_merger_spark.operators.rangejoin import interval_overlap_pairs

    li = _t(spark, sf_dir, "lineitem")
    iv = li.select(
        "l_suppkey",
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("line_id"),
        F.datediff(
            F.col("l_shipdate").cast("date"), F.to_date(F.lit("1995-01-01"))
        ).cast("long").alias("s"),
        (F.col("l_quantity").cast("long") % 14).alias("qmod"),
    ).select(
        "l_suppkey", "line_id", "s", (F.col("s") + 1 + F.col("qmod")).alias("e")
    )
    pairs = interval_overlap_pairs(
        iv, "line_id", "s", "e", bucket_width=16, partition_cols=["l_suppkey"]
    )
    return pairs.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("overlap_len").cast("long").alias("sum_overlap_days"),
    )


ORACLE_SQL["interval_overlap_join"] = """
    WITH iv AS (
      SELECT l_suppkey,
             l_orderkey * 10 + l_linenumber AS line_id,
             date_diff('day', DATE '1995-01-01', l_shipdate) AS s,
             date_diff('day', DATE '1995-01-01', l_shipdate)
               + 1 + (CAST(l_quantity AS BIGINT) % 14) AS e
      FROM lineitem
    ),
    p AS (
      SELECT a.l_suppkey,
             least(a.e, b.e) - greatest(a.s, b.s) + 1 AS ov
      FROM iv a JOIN iv b
        ON a.l_suppkey = b.l_suppkey AND a.line_id < b.line_id
       AND a.s <= b.e AND b.s <= a.e
    )
    SELECT l_suppkey,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(ov) AS BIGINT) AS sum_overlap_days
    FROM p GROUP BY 1
"""
QUERIES["interval_overlap_join"] = q_interval_overlap_join


def q_split_leakage_guard(spark, sf_dir):
    """Leakage-safe train/val/test split: `train_test_split` hashes the
    DOC id, so two near-duplicate documents can straddle train and test
    — the classic eval-contamination bug.  This key splits by the
    near-dup CLUSTER instead: exact-Jaccard pairs (t=0.8) resolve to
    connected components (`operators.dedup.dup_clusters`), unpaired
    docs form singleton clusters, and the split gate hashes the CLUSTER
    id — every member of a component lands in the same split BY
    CONSTRUCTION.  Same portable polynomial gate as train_test_split,
    so DuckDB recomputes the identical assignment end-to-end (recursive
    CTE components + the same gate).  At 100 TB: one components pass
    (already measured sub-linear via the LSH pipeline) + a shuffle-free
    row-local gate."""
    from parquet_merger_spark.operators.sampling import (
        portable_hash_gate,
        split_by_hash,
    )

    d = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, shingle_words=2, threshold=0.8)
    clusters = dup_clusters(pairs)
    labeled = (
        d.select("doc_id", "n_chars")
        .join(clusters, "doc_id", "left")
        .withColumn("cluster_id", F.coalesce("cluster_id", F.col("doc_id")))
    )
    return split_by_hash(
        labeled,
        {"train": 0.8, "val": 0.1, "test": 0.1},
        id_col="cluster_id",
        gate=portable_hash_gate(F.col("cluster_id")),
    )


ORACLE_SQL["split_leakage_guard"] = f"""
    WITH RECURSIVE g AS ({_GRAMS}),
    sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM g GROUP BY doc_id),
    shared AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS sh
      FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT id_a, id_b FROM shared
      JOIN sz sa ON id_a = sa.doc_id
      JOIN sz sb ON id_b = sb.doc_id
      WHERE sh / (sa.n + sb.n - sh) >= 0.8
    ),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach(a, b) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    comp AS (
      SELECT a AS doc_id, least(a, min(b)) AS cluster_id
      FROM reach GROUP BY a
    ),
    lab AS (
      SELECT d.doc_id, d.n_chars,
             coalesce(c.cluster_id, d.doc_id) AS cluster_id
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
    )
    SELECT doc_id, n_chars, cluster_id,
           CASE WHEN gate < 800000 THEN 'train'
                WHEN gate < 900000 THEN 'val'
                ELSE 'test' END AS split
    FROM (SELECT *, ((cluster_id % 999983) * 7919) % 1000000 AS gate FROM lab)
"""
QUERIES["split_leakage_guard"] = q_split_leakage_guard


def q_mmr_diverse_topk(spark, sf_dir):
    """MMR diversity re-rank (`operators.simsearch.mmr_rerank_portable`)
    — the retrieval->diversification step RAG and curation pipelines run
    after ANN search: exact integer-dot top-16 candidates per query,
    then 4 greedy Maximal-Marginal-Relevance picks (lambda=1/2: argmax
    of rel - max-sim-to-selected, empty set = 0, ties by smallest id).
    The greedy loop runs INSIDE an Arrow batch per query group —
    per-query-local, embarrassingly parallel across millions of queries,
    never on the driver.  Sixth member of the oracle-certified iterative
    family: ranks, ids AND scores hash-match the unrolled DuckDB
    oracle."""
    from parquet_merger_spark.operators.simsearch import mmr_rerank_portable

    e = _t(spark, sf_dir, "embeddings")
    return mmr_rerank_portable(e, "vec_id", "embedding")


def _mmr_portable_sql(
    n_queries: int = 4, n_cand: int = 16, k: int = 4, dims: int = 64
) -> str:
    from parquet_merger_spark.operators.simsearch import QUANT_SCALE

    def dot(a: str, b: str) -> str:
        return (
            f"CAST(list_sum(list_transform(range(1, {dims + 1}), "
            f"i -> ({a}[i] * {b}[i]))) AS BIGINT)"
        )

    parts = [
        f"""v AS (
          SELECT vec_id AS id,
                 list_transform(embedding,
                   x -> CAST(round(CAST(x AS DOUBLE) * {QUANT_SCALE}, 0) AS BIGINT)) AS q
          FROM embeddings
        ),
        qv AS (SELECT id AS query_id, q AS qvec FROM v WHERE id < {n_queries}),
        relall AS (
          SELECT qv.query_id, v.id AS cand_id, v.q,
                 {dot("qv.qvec", "v.q")} AS rel
          FROM qv CROSS JOIN v WHERE v.id <> qv.query_id
        ),
        cand AS (
          SELECT query_id, cand_id, q, rel FROM (
            SELECT *, row_number() OVER (
              PARTITION BY query_id ORDER BY rel DESC, cand_id) AS rn
            FROM relall) WHERE rn <= {n_cand}
        ),
        sim AS (
          SELECT a.query_id, a.cand_id AS ia, b.cand_id AS ib,
                 {dot("a.q", "b.q")} AS s
          FROM cand a JOIN cand b ON a.query_id = b.query_id
        ),
        pick1 AS (
          SELECT query_id, cand_id, rel AS score FROM (
            SELECT query_id, cand_id, rel,
                   row_number() OVER (
                     PARTITION BY query_id ORDER BY rel DESC, cand_id) AS rn
            FROM cand) WHERE rn = 1
        ),
        sel1 AS (SELECT query_id, cand_id FROM pick1)"""
    ]
    for t in range(2, k + 1):
        parts.append(f"""ms{t} AS (
          SELECT c.query_id, c.cand_id, c.rel, max(s.s) AS maxsim
          FROM cand c
          JOIN sim s ON s.query_id = c.query_id AND s.ia = c.cand_id
          JOIN sel{t - 1} t ON t.query_id = s.query_id AND t.cand_id = s.ib
          LEFT JOIN sel{t - 1} x
            ON x.query_id = c.query_id AND x.cand_id = c.cand_id
          WHERE x.cand_id IS NULL
          GROUP BY 1, 2, 3
        ),
        pick{t} AS (
          SELECT query_id, cand_id, score FROM (
            SELECT query_id, cand_id, rel - maxsim AS score,
                   row_number() OVER (
                     PARTITION BY query_id
                     ORDER BY rel - maxsim DESC, cand_id) AS rn
            FROM ms{t}) WHERE rn = 1
        ),
        sel{t} AS (
          SELECT query_id, cand_id FROM sel{t - 1}
          UNION ALL SELECT query_id, cand_id FROM pick{t}
        )""")
    finals = "\n        UNION ALL ".join(
        f"SELECT query_id, CAST({t} AS BIGINT) AS rank, "
        f"cand_id AS vec_id, score AS mmr_score FROM pick{t}"
        for t in range(1, k + 1)
    )
    return "\n        WITH " + ",\n        ".join(parts) + f"\n        {finals}"


ORACLE_SQL["mmr_diverse_topk"] = _mmr_portable_sql()
QUERIES["mmr_diverse_topk"] = q_mmr_diverse_topk


def q_incremental_dedup_ingest(spark, sf_dir):
    """Incremental-ingest exact dedup — the gate every continuously-fed
    corpus runs on each NEW batch: (1) within-batch dedup keeps the
    smallest id per content hash, (2) an anti-join against the existing
    corpus's hash set drops docs already ingested.  Content equality
    travels as sha2-256 of the text, so the shuffle key is a constant
    32 bytes regardless of document size — the production shape (the
    corpus side reduces to a distinct hash column; at 100 TB that hash
    column is the persisted ingest ledger, and the broadcast-Bloom
    knob from `upsert_orders_bloom` applies when the batch is small).
    Corpus = doc_id < 400, batch = doc_id >= 400; certified end-to-end
    by the DuckDB twin (hash equality == text equality within each
    engine, so representations never cross engines)."""
    d = _t(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") < 400)
    batch = d.filter(F.col("doc_id") >= 400)
    fp = F.sha2(
        F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 8)), 256
    )
    w = Window.partitionBy("h").orderBy("doc_id")
    batch_first = (
        batch.withColumn("h", fp)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    ledger = corpus.select(fp.alias("h")).distinct()
    return batch_first.join(ledger, "h", "left_anti").select("doc_id", "n_chars")


ORACLE_SQL["incremental_dedup_ingest"] = """
    WITH corpus AS (SELECT * FROM documents WHERE doc_id < 400),
    batch AS (SELECT * FROM documents WHERE doc_id >= 400),
    batch_first AS (
      SELECT doc_id, n_chars, h FROM (
        SELECT doc_id, n_chars,
               sha256(array_to_string(string_split(text, ' ')[1:8], ' ')) AS h,
               row_number() OVER (
                 PARTITION BY
                   sha256(array_to_string(string_split(text, ' ')[1:8], ' '))
                 ORDER BY doc_id) AS rn
        FROM batch) WHERE rn = 1
    )
    SELECT doc_id, n_chars FROM batch_first b
    WHERE NOT EXISTS (
      SELECT 1 FROM corpus c
      WHERE sha256(array_to_string(string_split(c.text, ' ')[1:8], ' ')) = b.h
    )
"""
QUERIES["incremental_dedup_ingest"] = q_incremental_dedup_ingest


def q_curriculum_interleave(spark, sf_dir):
    """Curriculum ordering for training data: docs ranked per SOURCE by
    quality (n_chars desc as the stand-in score, ties by id), then
    interleaved round-robin across sources — position
    ``seq * n_sources + source_idx`` — so a sequential reader sees
    quality-descending data with per-position source diversity.  The
    position is pure ARITHMETIC over (per-source rank, broadcast
    source index): no global row_number, no single-task sort at any
    corpus size; the only shuffle partitions by source (the classic
    unpartitioned-window trap this engine red-lines).  Gaps where a
    source exhausts are intentional — the position is a priority, not
    a dense index; the sink sorts within partitions on it."""
    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    seq = d.select("doc_id", "source", "n_chars").withColumn(
        "seq", F.row_number().over(w).cast("long") - 1
    )
    src = (
        d.select("source").distinct()
        .withColumn(
            "source_idx",
            F.row_number()
            .over(Window.orderBy("source"))  # tiny dim: |sources| rows
            .cast("long") - 1,
        )
    )
    # |sources| as a LAZY broadcast 1-row frame: src.count() at build
    # time scanned documents before the query even ran
    nsf = src.agg(F.count(F.lit(1)).alias("__ns"))
    return (
        seq.join(F.broadcast(src), "source")
        .crossJoin(F.broadcast(nsf))
        .select(
            "doc_id",
            "source",
            "seq",
            (F.col("seq") * F.col("__ns") + F.col("source_idx")).alias(
                "interleave_pos"
            ),
        )
    )


ORACLE_SQL["curriculum_interleave"] = """
    WITH seq AS (
      SELECT doc_id, source,
             CAST(row_number() OVER (PARTITION BY source
                    ORDER BY n_chars DESC, doc_id) - 1 AS BIGINT) AS seq
      FROM documents
    ),
    src AS (
      SELECT source,
             CAST(row_number() OVER (ORDER BY source) - 1 AS BIGINT)
               AS source_idx
      FROM (SELECT DISTINCT source FROM documents)
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS k FROM src)
    SELECT s.doc_id, s.source, s.seq,
           s.seq * n.k + x.source_idx AS interleave_pos
    FROM seq s JOIN src x USING (source) CROSS JOIN n
"""
QUERIES["curriculum_interleave"] = q_curriculum_interleave


def q_winnowing_fingerprints(spark, sf_dir):
    """MOSS winnowing fingerprint selection (`operators.dedup.
    winnow_fingerprints`): word-3-gram portable hashes, window of 4,
    min-per-window with rightmost tie-break — the position-level
    copy-detection primitive (any shared run of >= 6 tokens across two
    documents shares a fingerprint; expected density 2/(w+1) of grams).
    Output: the selected (doc_id, fp_pos, fp) set itself.  At 100 TB:
    row-local after the dictionary join (per-doc lead/min windows, no
    cross-doc shuffle); matching is a downstream equi-join on fp."""
    from parquet_merger_spark.operators.dedup import winnow_fingerprints

    d = _t(spark, sf_dir, "documents")
    return winnow_fingerprints(d, "doc_id", "text", k=3, window=4)


def _winnowing_sql() -> str:
    AC, P, vocab = _portable_sql_parts()
    a0, c0 = AC[0]
    poscap = 1 << 21
    return f"""
        WITH {vocab},
        vsz AS (SELECT max(term_id) AS v FROM vocab),
        ids AS (
          SELECT t.doc_id, t.pos - 1 AS pos, v.term_id
          FROM tok t JOIN vocab v USING (term)
        ),
        g AS (
          SELECT a.doc_id, a.pos,
                 ({a0} * (((a.term_id * (vsz.v + 1) + b.term_id) % {P})
                            * (vsz.v + 1) + c.term_id) % {P} + {c0}) % {P}
                   AS h
          FROM ids a
          JOIN ids b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
          JOIN ids c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
          CROSS JOIN vsz
        ),
        win AS (
          SELECT doc_id, pos,
                 min(h * {poscap} + ({poscap - 1} - pos)) OVER (
                   PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN CURRENT ROW AND {4 - 1} FOLLOWING) AS m,
                 count(*) OVER (
                   PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN CURRENT ROW AND {4 - 1} FOLLOWING) AS n
          FROM g
        )
        SELECT DISTINCT doc_id,
               CAST({poscap - 1} - (m % {poscap}) AS BIGINT) AS fp_pos,
               CAST(m // {poscap} AS BIGINT) AS fp
        FROM win WHERE n = 4 OR (pos = 0 AND n < 4)
    """


ORACLE_SQL["winnowing_fingerprints"] = _winnowing_sql()
QUERIES["winnowing_fingerprints"] = q_winnowing_fingerprints


def q_embedding_rhp_lsh(spark, sf_dir):
    """Sign-random-projection LSH near-dup pairs over the embeddings
    table (`operators.simsearch.rhp_lsh_pairs`, bits=12/bands=6,
    cosine >= 0.35 verify) — the bucketed embedding-space candidate
    generator: signatures are one row-local integer pass (hyperplanes
    regenerate from two literals, no stored model), the only wide op is
    the banded equi-join, and the exact quantized-cosine filter runs on
    candidates only.  Every step is portable integer arithmetic, so the
    DuckDB twin replays the identical buckets: exact oracle despite the
    operator being an approximate (recall-bounded) candidate generator."""
    from parquet_merger_spark.operators.simsearch import rhp_lsh_pairs

    e = _t(spark, sf_dir, "embeddings")
    return rhp_lsh_pairs(e, "vec_id", "embedding", bits=12, bands=6,
                         threshold=0.35)


def _rhp_lsh_sql() -> str:
    from parquet_merger_spark.operators.dedup import (
        PORTABLE_HASH_AC,
        PORTABLE_MOD,
    )

    a1, c1 = PORTABLE_HASH_AC[1]
    P = PORTABLE_MOD
    dim, bits, bands, r = 64, 12, 6, 2
    bit_exprs = ",\n                 ".join(
        f"CASE WHEN list_sum(list_transform(range(1, {dim + 1}), d -> "
        f"qe[d] * ((({a1} * ({j * dim} + d) + {c1}) % {P}) % 21 - 10)))"
        f" >= 0 THEN 1 ELSE 0 END AS b{j}"
        for j in range(bits)
    )
    band_rows = "\n          UNION ALL ".join(
        f"SELECT vec_id, qe, q2, {b} AS band, "
        + " + ".join(f"b{b * r + i} * {1 << i}" for i in range(r))
        + " AS sig FROM bits"
        for b in range(bands)
    )
    return f"""
        WITH q AS ({_QVIEW}),
        bits AS (
          SELECT vec_id, qe, q2,
                 {bit_exprs}
          FROM q
        ),
        bb AS (
          {band_rows}
        ),
        cand AS (
          SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
          FROM bb a
          JOIN bb b ON a.band = b.band AND a.sig = b.sig
                 AND a.vec_id < b.vec_id
        )
        SELECT c.id_a, c.id_b,
               round(CAST(list_sum(list_transform(list_zip(x.qe, y.qe),
                            p -> struct_extract(p, 1) * struct_extract(p, 2)))
                          AS BIGINT) / (sqrt(x.q2) * sqrt(y.q2)), 6) AS cosine
        FROM cand c
        JOIN q x ON x.vec_id = c.id_a
        JOIN q y ON y.vec_id = c.id_b
        WHERE CAST(list_sum(list_transform(list_zip(x.qe, y.qe),
                     p -> struct_extract(p, 1) * struct_extract(p, 2)))
                   AS BIGINT) / (sqrt(x.q2) * sqrt(y.q2)) >= 0.35
    """


ORACLE_SQL["embedding_rhp_lsh"] = _rhp_lsh_sql()
QUERIES["embedding_rhp_lsh"] = q_embedding_rhp_lsh


def q_quality_score_auc(spark, sf_dir):
    """Exact ROC-AUC (`operators.textstats.binary_auc`) of a short-token
    quality score (permille of tokens with <= 3 chars, integer) against
    the lang == 'en' label — the "does this filter actually separate the
    classes" gate run before thresholding a corpus on any score.  Ties
    get average ranks; the corpus collapses to a <= 1001-row distinct-
    score count table before any window, so no global row sort exists in
    the plan at any scale."""
    from parquet_merger_spark.operators.textstats import binary_auc

    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    scored = d.select(
        _short_token_score(toks).alias("score"),
        (F.col("lang") == "en").cast("int").alias("label"),
    )
    return binary_auc(scored, "score", "label")


ORACLE_SQL["quality_score_auc"] = f"""
    WITH scored AS (
      SELECT {_SHORT_SCORE_SQL} AS score,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS label
      FROM documents
    ),
    by_score AS (
      SELECT score, CAST(count(*) AS BIGINT) AS c,
             CAST(sum(label) AS BIGINT) AS cp
      FROM scored GROUP BY score
    ),
    ranked AS (
      SELECT c, cp,
             coalesce(sum(c) OVER (ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS o
      FROM by_score
    ),
    agg AS (
      SELECT CAST(sum(cp) AS BIGINT) AS n_pos,
             CAST(sum(c) - sum(cp) AS BIGINT) AS n_neg,
             CAST(sum(cp * (2 * o + c + 1)) AS BIGINT) AS s2
      FROM ranked
    )
    SELECT n_pos, n_neg,
           round((s2 - n_pos * (n_pos + 1)) / (2.0 * n_pos * n_neg), 6)
             AS auc
    FROM agg
"""
QUERIES["quality_score_auc"] = q_quality_score_auc


def q_source_overlap_matrix(spark, sf_dir):
    """Pairwise cross-SOURCE contamination matrix: for every source pair,
    how many distinct word-3-grams they share — the corpus-level overlap
    audit run before mixing sources into one training set (high shared-
    gram counts between a "clean" and a "web" source flag boilerplate or
    mirrored content).  Shape at 100 TB: the corpus collapses to DISTINCT
    (source, gram) — bounded by vocabulary x |sources|, not corpus size —
    and the per-gram self-join fans out at most C(|sources|, 2) pairs per
    gram (sources is a small dimension; production keys the join on
    xxhash64(gram) to shuffle 8-byte keys instead of strings — equality
    of text is what the oracle certifies here)."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    # zip_with over SLICED arrays, not transform(sequence)+element_at:
    # per-index element_at re-evaluates the split per access (measured
    # 13x slower at sf1); the slice/zip_with form is one linear pass
    n2 = F.size(toks) - 2
    tri = F.zip_with(
        F.zip_with(
            F.slice(toks, 1, n2),
            F.slice(toks, 2, n2),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
        F.slice(toks, 3, n2),
        lambda p, c: F.concat_ws(" ", p, c),
    )
    grams = d.select(
        "source",
        F.explode(
            F.when(F.size(toks) >= 3, tri)
            .otherwise(F.array().cast("array<string>"))
        ).alias("gram"),
    ).distinct()
    return (
        grams.alias("a")
        .join(
            grams.alias("b"),
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_grams"))
    )


ORACLE_SQL["source_overlap_matrix"] = """
    WITH toks AS (
      SELECT source, string_split(text, ' ') AS t FROM documents
    ),
    g AS (
      SELECT DISTINCT source,
             unnest(CASE WHEN len(t) >= 3
                         THEN list_transform(range(1, len(t) - 1),
                                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                         ELSE [] END) AS gram
      FROM toks
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(count(*) AS BIGINT) AS n_shared_grams
    FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
    GROUP BY 1, 2
"""
QUERIES["source_overlap_matrix"] = q_source_overlap_matrix


def q_length_bucketed_batches(spark, sf_dir):
    """Length-bucketed batch assignment for training: docs bucket by
    length band (n_chars div 200), shard by hash within the bucket, and
    take batch ids from a row_number over (bucket, shard) — the padding-
    waste killer for sequence training (a batch's members share a length
    band, so pad-to-longest wastes <= band width per row).  The shard
    dimension is the scale release valve: the per-partition sort behind
    row_number runs over (bucket, shard), never a whole bucket, so no
    single task sorts a popular length band at 100 TB; batches stay
    deterministic because the shard is a pure function of doc_id."""
    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("bucket", "shard").orderBy("doc_id")
    return (
        d.select(
            "doc_id",
            F.expr("CAST(n_chars DIV 200 AS BIGINT)").alias("bucket"),
            F.pmod(F.col("doc_id"), F.lit(8)).cast("long").alias("shard"),
        )
        .withColumn(
            "batch_id",
            F.floor((F.row_number().over(w) - 1) / 16).cast("long"),
        )
    )


ORACLE_SQL["length_bucketed_batches"] = """
    SELECT doc_id,
           CAST(n_chars // 200 AS BIGINT) AS bucket,
           CAST(((doc_id % 8) + 8) % 8 AS BIGINT) AS shard,
           CAST((row_number() OVER (
                   PARTITION BY n_chars // 200, ((doc_id % 8) + 8) % 8
                   ORDER BY doc_id) - 1) // 16 AS BIGINT) AS batch_id
    FROM documents
"""
QUERIES["length_bucketed_batches"] = q_length_bucketed_batches


def q_dedup_winnowing_pairs(spark, sf_dir):
    """Winnowing-fingerprint near-dup pairs: the inverted-index join over
    `winnow_fingerprints` output — docs sharing >= 3 distinct selected
    fingerprint hashes, with the shared count as passage-overlap
    evidence.  This is the MOSS matching step: unlike MinHash (whole-doc
    similarity) the shared count lower-bounds COPIED PASSAGE mass (each
    shared fingerprint witnesses a shared >= 3-token run), so the pair
    list ranks by how much text is actually duplicated.  At 100 TB:
    candidate volume is O(sum over fingerprints of df^2) on a stream
    already thinned to ~2/(w+1) of grams; production caps hot
    fingerprints' document frequency exactly like the decontamination
    index (the cap is off here so the oracle is parameter-free)."""
    from parquet_merger_spark.operators.dedup import winnow_fingerprints

    d = _t(spark, sf_dir, "documents")
    fps = (
        winnow_fingerprints(d, "doc_id", "text", k=3, window=4)
        .select("doc_id", "fp")
        .distinct()
    )
    return (
        fps.alias("a")
        .join(
            fps.alias("b"),
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("shared_fps"))
        .filter(F.col("shared_fps") >= 3)
    )


def _winnowing_pairs_sql() -> str:
    return f"""
        WITH sel AS ({_winnowing_sql()}),
        fps AS (SELECT DISTINCT doc_id, fp FROM sel)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(count(*) AS BIGINT) AS shared_fps
        FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY 1, 2
        HAVING count(*) >= 3
    """


ORACLE_SQL["dedup_winnowing_pairs"] = _winnowing_pairs_sql()
QUERIES["dedup_winnowing_pairs"] = q_dedup_winnowing_pairs


def q_bigram_familiarity(spark, sf_dir):
    """CCNet-style language-model quality proxy WITHOUT floating-point
    logs: each document scores the mean corpus frequency of its bigram
    OCCURRENCES (a doc full of common constructions scores high; rare or
    garbled text scores low) — the monotone integer-arithmetic stand-in
    for perplexity filtering (Wenzek et al. 2019) whose cross-engine hash
    can't drift on transcendental-function ulps.  Output: (doc_id,
    n_bigrams, familiarity) for every doc with >= 1 bigram.

    Scale: one distributive groupBy(gram) count (the "LM"), one join
    back on the gram key, one groupBy(doc) — all O(token stream); the
    count table is vocabulary-sized and the join key is production-
    hashable (xxhash64) without changing results."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    # slice/zip_with, not transform(sequence)+element_at — see
    # source_overlap_matrix for the 13x measurement
    n1 = F.size(toks) - 1
    bi = F.zip_with(
        F.slice(toks, 1, n1),
        F.slice(toks, 2, n1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    grams = d.select(
        "doc_id",
        F.explode(
            F.when(F.size(toks) >= 2, bi)
            .otherwise(F.array().cast("array<string>"))
        ).alias("gram"),
    )
    lm = grams.groupBy("gram").agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    )
    return (
        grams.join(lm, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(F.sum("__n") / F.count(F.lit(1)), 6).alias("familiarity"),
        )
    )


ORACLE_SQL["bigram_familiarity"] = """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    g AS (
      SELECT doc_id,
             unnest(CASE WHEN len(t) >= 2
                         THEN list_transform(range(1, len(t)),
                                i -> t[i] || ' ' || t[i+1])
                         ELSE [] END) AS gram
      FROM toks
    ),
    lm AS (SELECT gram, CAST(count(*) AS BIGINT) AS n FROM g GROUP BY gram)
    SELECT g.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(sum(lm.n) / count(*), 6) AS familiarity
    FROM g JOIN lm USING (gram)
    GROUP BY 1
"""
QUERIES["bigram_familiarity"] = q_bigram_familiarity


def q_pca_power_portable(spark, sf_dir):
    """1-D PCA projection by distributed power iteration
    (`operators.simsearch.pca_power_projection_portable`, 2 steps,
    integer grid) — the seventh oracle-certified iterative operator:
    DuckDB replays both unrolled power steps (per-row scalar, 64-cell
    per-dimension sums, the floor-rescale) and the final projections
    hash-match exactly.  The Gram matrix never materializes: each step
    is one corpus pass reduced to 64 cells, so the plan scales as
    O(iters x corpus) with model-sized driver state."""
    from parquet_merger_spark.operators.simsearch import (
        pca_power_projection_portable,
    )

    e = _t(spark, sf_dir, "embeddings")
    return pca_power_projection_portable(e, "vec_id", "embedding", iters=2)


def _pca_power_sql() -> str:
    quant = _QUANT
    return f"""
        WITH q AS (SELECT vec_id, {quant} AS qe FROM embeddings),
        d1 AS (
          SELECT vec_id, qe,
                 CAST(list_sum(qe) AS BIGINT) AS p
          FROM q
        ),
        v1 AS (
          SELECT t.i AS i, CAST(sum(d1.qe[t.i] * d1.p) AS BIGINT) AS v
          FROM d1 CROSS JOIN range(1, 65) t(i)
          GROUP BY 1
        ),
        m1 AS (SELECT greatest(max(abs(v)), 1) AS m FROM v1),
        v1s AS (
          SELECT i, CAST(floor((v * 1000.0) / m) AS BIGINT) AS v
          FROM v1, m1
        ),
        d2 AS (
          SELECT q.vec_id, CAST(sum(q.qe[s.i] * s.v) AS BIGINT) AS p
          FROM q CROSS JOIN v1s s
          GROUP BY 1
        ),
        v2 AS (
          SELECT t.i AS i, CAST(sum(q.qe[t.i] * d2.p) AS BIGINT) AS v
          FROM q JOIN d2 USING (vec_id) CROSS JOIN range(1, 65) t(i)
          GROUP BY 1
        ),
        m2 AS (SELECT greatest(max(abs(v)), 1) AS m FROM v2),
        v2s AS (
          SELECT i, CAST(floor((v * 1000.0) / m) AS BIGINT) AS v
          FROM v2, m2
        )
        SELECT q.vec_id, CAST(sum(q.qe[s.i] * s.v) AS BIGINT) AS proj
        FROM q CROSS JOIN v2s s
        GROUP BY 1
    """


ORACLE_SQL["pca_power_portable"] = _pca_power_sql()
QUERIES["pca_power_portable"] = q_pca_power_portable


def q_minhash_jaccard_estimate(spark, sf_dir):
    """Sketch CALIBRATION report for the portable MinHash: for every
    LSH candidate pair, the signature-agreement Jaccard estimate
    (fraction of the 12 portable minima that agree — the unbiased
    MinHash estimator) side by side with the EXACT 2-gram Jaccard and
    the absolute error.  This is the continuous-monitoring operator a
    dedup pipeline runs on a sample to verify its sketches still track
    ground truth after corpus drift; at 100 TB the exact column is
    computed only for the candidate sample, never all pairs.  Every
    step is portable integer arithmetic -> full cross-engine oracle."""
    from parquet_merger_spark.operators.dedup import (
        PORTABLE_HASH_AC,
        PORTABLE_MOD,
        _portable_doc_grams,
        minhash_lsh_pairs_portable,
    )

    d = _t(spark, sf_dir, "documents")
    nh = 12
    pairs = minhash_lsh_pairs_portable(d, "doc_id", "text", num_hashes=nh)
    grams = _portable_doc_grams(d, "doc_id", "text")
    mins = [
        F.min(
            F.pmod(F.lit(a) * F.col("xm") + F.lit(c), F.lit(PORTABLE_MOD))
        ).alias(f"m{i}")
        for i, (a, c) in enumerate(PORTABLE_HASH_AC[:nh])
    ]
    sig = grams.groupBy("doc_id").agg(
        *mins, F.count(F.lit(1)).cast("long").alias("ng")
    )
    ga = grams.select(F.col("doc_id").alias("id_a"), "xm")
    gb = grams.select(F.col("doc_id").alias("id_b"), "xm")
    inter = (
        pairs.join(ga, "id_a")
        .join(gb, ["id_b", "xm"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("inter"))
    )
    sa = sig.select(
        F.col("doc_id").alias("id_a"),
        F.col("ng").alias("na"),
        *[F.col(f"m{i}").alias(f"a{i}") for i in range(nh)],
    )
    sb = sig.select(
        F.col("doc_id").alias("id_b"),
        F.col("ng").alias("nb"),
        *[F.col(f"m{i}").alias(f"b{i}") for i in range(nh)],
    )
    agree = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(nh)
    )
    est = F.round(agree / F.lit(float(nh)), 6)
    iv = F.coalesce(F.col("inter"), F.lit(0).cast("long"))
    exact = F.round(iv / (F.col("na") + F.col("nb") - iv), 6)
    return (
        pairs.join(inter, ["id_a", "id_b"], "left")
        .join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            est.alias("est_jaccard"),
            exact.alias("exact_jaccard"),
            F.round(F.abs(est - exact), 6).alias("abs_err"),
        )
    )


def _minhash_est_sql() -> str:
    AC, P, vocab = _portable_sql_parts()
    nh, bands, r = 12, 6, 2
    mins = ",\n                 ".join(
        f"min(({a} * xm + {c}) % {P}) AS m{i}"
        for i, (a, c) in enumerate(AC[:nh])
    )
    band_rows = "\n          UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, m{2 * b} AS h1, m{2 * b + 1} AS h2 FROM sig"
        for b in range(bands)
    )
    agree = " + ".join(
        f"CASE WHEN sa.m{i} = sb.m{i} THEN 1 ELSE 0 END" for i in range(nh)
    )
    return f"""
        WITH {vocab},
        vsz AS (SELECT max(term_id) AS v FROM vocab),
        ids AS (
          SELECT t.doc_id, t.pos, v.term_id
          FROM tok t JOIN vocab v USING (term)
        ),
        grams AS (
          SELECT DISTINCT a.doc_id,
                 ((a.term_id * (vsz.v + 1) + b.term_id) % {P}) AS xm
          FROM ids a
          JOIN ids b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
          CROSS JOIN vsz
        ),
        sig AS (
          SELECT doc_id,
                 {mins},
                 CAST(count(*) AS BIGINT) AS ng
          FROM grams GROUP BY doc_id
        ),
        bb AS (
          {band_rows}
        ),
        pairs AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bb a
          JOIN bb b ON a.band = b.band AND a.h1 = b.h1 AND a.h2 = b.h2
                 AND a.doc_id < b.doc_id
        ),
        inter AS (
          SELECT p.id_a, p.id_b, CAST(count(*) AS BIGINT) AS i
          FROM pairs p
          JOIN grams ga ON ga.doc_id = p.id_a
          JOIN grams gb ON gb.doc_id = p.id_b AND gb.xm = ga.xm
          GROUP BY 1, 2
        )
        SELECT p.id_a, p.id_b,
               round(({agree}) / {float(nh)}, 6) AS est_jaccard,
               round(coalesce(i.i, 0) / (sa.ng + sb.ng - coalesce(i.i, 0)), 6)
                 AS exact_jaccard,
               round(abs(round(({agree}) / {float(nh)}, 6)
                         - round(coalesce(i.i, 0)
                                 / (sa.ng + sb.ng - coalesce(i.i, 0)), 6)), 6)
                 AS abs_err
        FROM pairs p
        JOIN sig sa ON sa.doc_id = p.id_a
        JOIN sig sb ON sb.doc_id = p.id_b
        LEFT JOIN inter i ON i.id_a = p.id_a AND i.id_b = p.id_b
    """


ORACLE_SQL["minhash_jaccard_estimate"] = _minhash_est_sql()
QUERIES["minhash_jaccard_estimate"] = q_minhash_jaccard_estimate


def q_dedup_ngram_jaccard_bounded(spark, sf_dir):
    """Exact word-2-gram Jaccard near-dup pairs (t=0.8) computed ONLY
    over MinHash-LSH candidate pairs — the candidates-bounded form of
    ``dedup_ngram_jaccard`` that IS the 100 TB arm (r06 SCALING measured
    the full-corpus prefix join at a 1.49 second-decade exponent; this
    form replaces the O(pairs-sharing-a-prefix-gram) self-join with two
    equi-joins on O(docs x bands) LSH candidates).  Candidates come from
    the PORTABLE LSH (cross-engine reproducible banding, recall > 0.99
    at J >= 0.8 for b=6, r=2 — pinned against the full key in
    tests/test_round7_fixes.py); verification is the production
    xxhash64 shingle-set intersect/union, which the oracle checks
    independently over STRING 2-gram sets — so a green hash-match also
    certifies the xxhash collision-free assumption on this fixture."""
    from parquet_merger_spark.operators.dedup import (
        minhash_lsh_pairs_portable,
        ngram_jaccard_pairs,
    )

    d = _t(spark, sf_dir, "documents")
    cands = minhash_lsh_pairs_portable(d, "doc_id", "text", num_hashes=12, bands=6)
    pairs = ngram_jaccard_pairs(
        d, shingle_words=2, threshold=0.8, candidate_pairs=cands
    )
    return pairs.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def _ngram_jaccard_bounded_sql() -> str:
    ctes, pair_select = _portable_lsh_sql_parts()
    return f"""
        WITH {ctes},
        pairs AS (
          {pair_select}
        ),
        -- exact verification over STRING 2-gram sets (independent of both
        -- the portable mod-p gram space and Spark's xxhash64 space)
        sgrams AS (
          SELECT DISTINCT a.doc_id, a.term || ' ' || b.term AS g
          FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        ),
        sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sgrams GROUP BY 1),
        inter AS (
          SELECT p.id_a, p.id_b, CAST(count(*) AS BIGINT) AS i
          FROM pairs p
          JOIN sgrams ga ON ga.doc_id = p.id_a
          JOIN sgrams gb ON gb.doc_id = p.id_b AND gb.g = ga.g
          GROUP BY 1, 2
        )
        SELECT p.id_a, p.id_b,
               round(i.i / (sa.n + sb.n - i.i), 6) AS jaccard
        FROM pairs p
        JOIN inter i ON i.id_a = p.id_a AND i.id_b = p.id_b
        JOIN sz sa ON sa.doc_id = p.id_a
        JOIN sz sb ON sb.doc_id = p.id_b
        WHERE i.i / (sa.n + sb.n - i.i) >= 0.8
    """


ORACLE_SQL["dedup_ngram_jaccard_bounded"] = _ngram_jaccard_bounded_sql()
QUERIES["dedup_ngram_jaccard_bounded"] = q_dedup_ngram_jaccard_bounded


def _copurchase_edges(spark, sf_dir):
    """Quarter-order part co-purchase edge list (pa < pb, distinct) —
    ONE definition of the graph that two_hop_neighbors,
    graph_assortativity, neighbor_jaccard and graph_kcore_portable all
    analyze (previously four in-sync copies: a mod-filter or direction
    tweak in one copy would have silently changed just that key's
    graph).  Callers apply their own materialization strategy (bare
    plan, eager checkpoint, repartition barrier) on top."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 4 == 0)
        .select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    return (
        a.join(b, (F.col("a.k") == F.col("b.k")) & (F.col("a.p") < F.col("b.p")))
        .select(F.col("a.p").alias("pa"), F.col("b.p").alias("pb"))
        .distinct()
    )


def q_two_hop_neighbors(spark, sf_dir):
    """2-hop reach census over the part co-purchase graph (quarter-order
    subgraph): per part, how many DISTINCT parts are reachable in <= 2
    hops — the neighborhood-size signal behind collaborative filtering
    fan-out sizing and graph-sampling budgets.  Shape: one symmetric
    edge list, one self-join on the middle vertex (cost O(sum deg^2) —
    the quantity production bounds by removing hub vertices above a
    degree cap, exactly like the decontamination index's df cap; uncapped
    here so the oracle is parameter-free), then one distinct + count per
    source.  All-integer output, hash-exact across engines."""
    e = _copurchase_edges(spark, sf_dir)
    sym = e.select(F.col("pa").alias("s"), F.col("pb").alias("d")).unionAll(
        e.select(F.col("pb").alias("s"), F.col("pa").alias("d"))
    )
    two = (
        sym.alias("x")
        .join(sym.alias("y"), F.col("x.d") == F.col("y.s"))
        .select(F.col("x.s").alias("s"), F.col("y.d").alias("d"))
        .filter(F.col("s") != F.col("d"))
    )
    reach = sym.unionAll(two).distinct()
    return reach.groupBy(F.col("s").alias("part")).agg(
        F.count(F.lit(1)).cast("long").alias("n_2hop")
    )


ORACLE_SQL["two_hop_neighbors"] = """
    WITH li AS (
      SELECT DISTINCT l_orderkey AS k, l_partkey AS p
      FROM lineitem WHERE l_orderkey % 4 = 0
    ),
    e AS (
      SELECT DISTINCT a.p AS pa, b.p AS pb
      FROM li a JOIN li b ON a.k = b.k AND a.p < b.p
    ),
    sym AS (
      SELECT pa AS s, pb AS d FROM e
      UNION ALL SELECT pb, pa FROM e
    ),
    two AS (
      SELECT x.s, y.d FROM sym x JOIN sym y ON x.d = y.s
      WHERE x.s <> y.d
    ),
    reach AS (
      SELECT DISTINCT s, d FROM (
        SELECT s, d FROM sym UNION ALL SELECT s, d FROM two
      )
    )
    SELECT s AS part, CAST(count(*) AS BIGINT) AS n_2hop
    FROM reach GROUP BY 1
"""
QUERIES["two_hop_neighbors"] = q_two_hop_neighbors


def q_ann_recall_report(spark, sf_dir):
    """ANN index-quality monitor: per query, recall@10 of the
    oracle-certified portable IVF (8 centroids, nprobe=2) against the
    EXACT integer-dot brute-force top-10 — the continuous check a
    production ANN deployment runs on a query sample to catch index
    staleness/drift before users do.  Both arms are deterministic
    portable arithmetic, so even this META-operator has a full
    cross-engine oracle.  At 100 TB the exact arm runs only on the
    sampled queries (5 here) — cost is one corpus scan per sample batch,
    while the IVF arm stays at probe cost."""
    from parquet_merger_spark.operators.simsearch import (
        ivf_topk_portable,
        quantize,
        quantized_dot,
    )

    e = _t(spark, sf_dir, "embeddings")
    topk = 10
    ivf = ivf_topk_portable(e, "vec_id", "embedding").select(
        "query_id", "vec_id"
    )
    q = e.select(F.col("vec_id").alias("id"), quantize(F.col("embedding")).alias("q"))
    queries = q.filter(F.col("id") < 5).select(
        F.col("id").alias("query_id"), F.col("q").alias("qq")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("vec_id")
    )
    exact = (
        queries.crossJoin(q)
        .filter(F.col("id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("id").alias("vec_id"),
            quantized_dot(F.col("qq"), F.col("q")).alias("score"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("query_id", "vec_id")
    )
    hits = exact.join(ivf, ["query_id", "vec_id"]).groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_hits")
    )
    return (
        queries.select("query_id")
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("n_hits"), F.lit(0).cast("long")).alias("n_hits"),
            F.round(
                F.coalesce(F.col("n_hits"), F.lit(0).cast("long"))
                / F.lit(float(topk)),
                6,
            ).alias("recall_at_10"),
        )
    )


def _ann_recall_sql(
    k: int = 8,
    iters: int = 2,
    dims: int = 64,
    n_queries: int = 5,
    nprobe: int = 2,
    topk: int = 10,
) -> str:
    parts, dist = _kmeans_cte_parts(k, iters, dims)
    score = (
        f"CAST(list_sum(list_transform(range(1, {dims + 1}), "
        "i -> (qv.qq[i] * cp.q[i]))) AS BIGINT)"
    )
    exact_score = (
        f"CAST(list_sum(list_transform(range(1, {dims + 1}), "
        "i -> (qv.qq[i] * v.q[i]))) AS BIGINT)"
    )
    return (
        "\n        WITH "
        + ",\n        ".join(parts)
        + f""",
        assign AS (
          SELECT id, cid FROM (
            SELECT v.id, c.cid,
                   row_number() OVER (PARTITION BY v.id ORDER BY {dist}, c.cid)
                     AS rn
            FROM v CROSS JOIN c{iters} c
          ) WHERE rn = 1
        ),
        qv AS (SELECT id AS query_id, q AS qq FROM v WHERE id < {n_queries}),
        probes AS (
          SELECT query_id, cid FROM (
            SELECT qv.query_id, c.cid,
                   row_number() OVER (
                     PARTITION BY qv.query_id
                     ORDER BY CAST(list_sum(list_transform(range(1, {dims + 1}),
                       i -> (qv.qq[i] - c.cvec[i]) * (qv.qq[i] - c.cvec[i])))
                       AS BIGINT), c.cid) AS prank
            FROM qv CROSS JOIN c{iters} c
          ) WHERE prank <= {nprobe}
        ),
        cp AS (SELECT a.id AS vec_id, v.q, a.cid FROM assign a JOIN v ON a.id = v.id),
        ivf AS (
          SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY score DESC, vec_id) AS rank
            FROM (
              SELECT qv.query_id, cp.vec_id, {score} AS score
              FROM probes p
              JOIN cp ON p.cid = cp.cid
              JOIN qv ON qv.query_id = p.query_id
              WHERE cp.vec_id <> qv.query_id
            )
          ) WHERE rank <= {topk}
        ),
        exact AS (
          SELECT query_id, vec_id FROM (
            SELECT qv.query_id, v.id AS vec_id,
                   row_number() OVER (PARTITION BY qv.query_id
                                      ORDER BY {exact_score} DESC, v.id)
                     AS rank
            FROM qv CROSS JOIN v
            WHERE v.id <> qv.query_id
          ) WHERE rank <= {topk}
        ),
        hits AS (
          SELECT e.query_id, CAST(count(*) AS BIGINT) AS n_hits
          FROM exact e JOIN ivf USING (query_id, vec_id)
          GROUP BY 1
        )
        SELECT qv.query_id,
               coalesce(h.n_hits, 0) AS n_hits,
               round(coalesce(h.n_hits, 0) / {float(topk)}, 6) AS recall_at_10
        FROM qv LEFT JOIN hits h USING (query_id)
    """
    )


ORACLE_SQL["ann_recall_report"] = _ann_recall_sql()
QUERIES["ann_recall_report"] = q_ann_recall_report


def q_embedding_quantile_normalize(spark, sf_dir):
    """Per-DIMENSION empirical-CDF (quantile) normalization of the
    embedding matrix — the feature-preprocessing step before histogram
    comparisons, drift monitors, or rank-based blocking: each of the 64
    dimensions maps its values to exact permille ranks in [0, 1000].
    SCALE SHAPE (the grouped assign_row_ids idiom, same as
    `percentile_bands_per_type`): NO per-dimension global window — rows
    bucket into 64 uniform value ranges per dim from the broadcast
    min/max aggregate, the (dim, bucket) COUNT TABLE (model-sized 64x64)
    yields exclusive offsets via a tiny window, and the exact rank is
    offset + row_number within (dim, bucket) — every sort bucket-local
    and parallel at any corpus size.  The oracle runs the textbook
    per-dim row_number instead; both produce identical permilles."""
    e = _t(spark, sf_dir, "embeddings")
    nb = 64
    vals = e.select(
        "vec_id",
        F.posexplode(
            F.transform(
                F.col("embedding"),
                lambda x: F.round(x.cast("double") * 10000, 0).cast("long"),
            )
        ).alias("dim", "qv"),
    )
    rng = vals.groupBy("dim").agg(
        F.min("qv").alias("__lo"), F.max("qv").alias("__hi"),
        F.count(F.lit(1)).alias("__n"),
    )
    width = (F.col("__hi") - F.col("__lo") + 1) / nb
    bucketed = vals.join(F.broadcast(rng), "dim").withColumn(
        "__bucket",
        F.when(F.col("__hi") <= F.col("__lo"), F.lit(0))
        .otherwise(
            F.least(
                F.lit(nb - 1),
                F.floor((F.col("qv") - F.col("__lo")) / width),
            )
        )
        .cast("int"),
    )
    counts = bucketed.groupBy("dim", "__bucket").agg(
        F.count(F.lit(1)).alias("__c")
    )
    woff = Window.partitionBy("dim").orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "dim", "__bucket",
        F.coalesce(F.sum("__c").over(woff), F.lit(0)).alias("__offset"),
    )
    wrank = Window.partitionBy("dim", "__bucket").orderBy("qv", "vec_id")
    return (
        bucketed.join(F.broadcast(offsets), ["dim", "__bucket"])
        .withColumn(
            "__rank",
            F.col("__offset") + F.row_number().over(wrank),
        )
        .select(
            "vec_id",
            F.col("dim").cast("long").alias("dim"),
            F.expr("CAST((__rank - 1) * 1000 DIV (__n - 1) AS BIGINT)")
            .alias("qnorm"),
        )
    )


ORACLE_SQL["embedding_quantile_normalize"] = """
    WITH vals AS (
      SELECT vec_id,
             t.i - 1 AS dim,
             CAST(round(CAST(embedding[t.i] AS DOUBLE) * 10000, 0) AS BIGINT)
               AS qv
      FROM embeddings CROSS JOIN range(1, 65) t(i)
    ),
    n AS (SELECT dim, CAST(count(*) AS BIGINT) AS nn FROM vals GROUP BY 1),
    r AS (
      SELECT vec_id, dim,
             row_number() OVER (PARTITION BY dim ORDER BY qv, vec_id) AS rk
      FROM vals
    )
    SELECT r.vec_id, r.dim,
           CAST((r.rk - 1) * 1000 // (n.nn - 1) AS BIGINT) AS qnorm
    FROM r JOIN n USING (dim)
"""
QUERIES["embedding_quantile_normalize"] = q_embedding_quantile_normalize


def q_cluster_separation_report(spark, sf_dir):
    """Clustering-quality monitor over the certified portable k-means
    (k=8, 2 Lloyd steps): per cluster, member count, mean squared-L2 to
    the OWN centroid, mean squared-L2 to the NEAREST OTHER centroid, and
    the separation ratio (>1 = clusters are tighter than their
    surroundings; ~1 = the clustering is not separating anything — the
    "should we even use these assignments for blocking" gate, completing
    the eval family: recall monitor, sketch calibration, AUC, and now
    cluster separation).  Row-local after the broadcast centroid model;
    means are exact integer sums over int64 squared distances divided
    once at the end.  Full cross-engine oracle via the shared unrolled-
    Lloyd CTEs."""
    from parquet_merger_spark.operators.simsearch import (
        _portable_centroids,
    )

    e = _t(spark, sf_dir, "embeddings")
    q, cent, dist_expr = _portable_centroids(e, "vec_id", "embedding", 8, 2)
    scored = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("dist", dist_expr)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("id").orderBy("dist", "cid")
            ),
        )
        .filter(F.col("rn") <= 2)
    )
    own = scored.filter(F.col("rn") == 1).select(
        "id", F.col("cid").alias("cid"), F.col("dist").alias("d_own")
    )
    other = scored.filter(F.col("rn") == 2).select(
        "id", F.col("dist").alias("d_other")
    )
    per = own.join(other, "id")
    return (
        per.groupBy("cid")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.sum("d_own").alias("__so"),
            F.sum("d_other").alias("__st"),
        )
        .select(
            "cid",
            "n_members",
            F.expr("CAST(__so DIV n_members AS BIGINT)").alias("mean_d_own"),
            F.expr("CAST(__st DIV n_members AS BIGINT)").alias("mean_d_other"),
            F.round(F.col("__st") / F.col("__so"), 6).alias("separation"),
        )
    )


def _cluster_separation_sql(k: int = 8, iters: int = 2, dims: int = 64) -> str:
    parts, dist = _kmeans_cte_parts(k, iters, dims)
    return (
        "\n        WITH "
        + ",\n        ".join(parts)
        + f""",
        scored AS (
          SELECT v.id, c.cid, {dist} AS dist,
                 row_number() OVER (PARTITION BY v.id
                                    ORDER BY {dist}, c.cid) AS rn
          FROM v CROSS JOIN c{iters} c
        ),
        own AS (SELECT id, cid, dist AS d_own FROM scored WHERE rn = 1),
        oth AS (SELECT id, dist AS d_other FROM scored WHERE rn = 2),
        per AS (SELECT own.cid, own.d_own, oth.d_other
                FROM own JOIN oth USING (id))
        SELECT cid,
               CAST(count(*) AS BIGINT) AS n_members,
               CAST(sum(d_own) // count(*) AS BIGINT) AS mean_d_own,
               CAST(sum(d_other) // count(*) AS BIGINT) AS mean_d_other,
               round(sum(d_other) / sum(d_own), 6) AS separation
        FROM per GROUP BY 1
    """
    )


ORACLE_SQL["cluster_separation_report"] = _cluster_separation_sql()
QUERIES["cluster_separation_report"] = q_cluster_separation_report


def q_graph_assortativity(spark, sf_dir):
    """Degree assortativity of the part co-purchase graph (quarter-order
    subgraph): the Pearson correlation between the degrees at the two
    ends of every edge — one scalar that says whether hubs connect to
    hubs (r > 0) or to leaves (r < 0); the graph-shape statistic that
    predicts whether degree-capping (the 2-hop/decontamination hub
    valve) will bite.  Newman 2002 formula over the DIRECTED edge list
    (each undirected edge contributes both orientations, the standard
    symmetrization).  All moments are exact integer sums — one groupBy
    for degrees, one broadcast-joined edge pass — and the single
    division happens at the end, so the scalar hash-matches DuckDB."""
    e = _copurchase_edges(spark, sf_dir)
    sym = e.select(F.col("pa").alias("s"), F.col("pb").alias("d")).unionAll(
        e.select(F.col("pb").alias("s"), F.col("pa").alias("d"))
    )
    deg = sym.groupBy(F.col("s").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("dg")
    )
    ed = (
        sym.join(deg.select(F.col("v").alias("s"), F.col("dg").alias("ds")), "s")
        .join(deg.select(F.col("v").alias("d"), F.col("dg").alias("dd")), "d")
    )
    m = ed.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum(F.col("ds") * F.col("dd")).alias("sxy"),
        F.sum("ds").alias("sx"),
        F.sum("dd").alias("sy"),
        F.sum(F.col("ds") * F.col("ds")).alias("sxx"),
        F.sum(F.col("dd") * F.col("dd")).alias("syy"),
    )
    num = F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    ) * F.sqrt(
        (F.col("m") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return m.select(
        F.col("m").alias("n_directed_edges"),
        F.round(num / den, 6).alias("assortativity"),
    )


ORACLE_SQL["graph_assortativity"] = """
    WITH li AS (
      SELECT DISTINCT l_orderkey AS k, l_partkey AS p
      FROM lineitem WHERE l_orderkey % 4 = 0
    ),
    e AS (
      SELECT DISTINCT a.p AS pa, b.p AS pb
      FROM li a JOIN li b ON a.k = b.k AND a.p < b.p
    ),
    sym AS (
      SELECT pa AS s, pb AS d FROM e UNION ALL SELECT pb, pa FROM e
    ),
    deg AS (SELECT s AS v, CAST(count(*) AS BIGINT) AS dg FROM sym GROUP BY 1),
    ed AS (
      SELECT x.dg AS ds, y.dg AS dd
      FROM sym JOIN deg x ON x.v = sym.s JOIN deg y ON y.v = sym.d
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS m,
             CAST(sum(ds * dd) AS BIGINT) AS sxy,
             CAST(sum(ds) AS BIGINT) AS sx,
             CAST(sum(dd) AS BIGINT) AS sy,
             CAST(sum(ds * ds) AS BIGINT) AS sxx,
             CAST(sum(dd * dd) AS BIGINT) AS syy
      FROM ed
    )
    SELECT m AS n_directed_edges,
           round((m * sxy - sx * sy)
                 / (sqrt(CAST(m * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(m * syy - sy * sy AS DOUBLE))), 6)
             AS assortativity
    FROM m
"""
QUERIES["graph_assortativity"] = q_graph_assortativity


def q_fk_orphan_audit(spark, sf_dir):
    """Referential-integrity audit across the star schema — the
    constraint check a lakehouse runs after every ingest: for each FK
    edge (orders.o_custkey -> customer, lineitem.l_orderkey -> orders,
    lineitem.l_partkey -> part, lineitem.l_suppkey -> supplier), the
    row count, orphan count (left-anti join against the parent key set),
    and distinct orphan keys.  Anti-joins on dimension key sets
    broadcast where the parent is small; at 100 TB the parent side
    reduces to its distinct key column first (the ingest-ledger shape),
    so the shuffle carries keys, never rows.  Clean fixtures report
    zero orphans — the audit's value is the loud nonzero row."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    c = _t(spark, sf_dir, "customer")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")

    def edge(name, child, fk, parent, pk):
        orphans = child.select(F.col(fk).alias("k")).join(
            parent.select(F.col(pk).alias("k")).distinct(), "k", "left_anti"
        )
        return (
            child.agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
            .crossJoin(
                orphans.agg(
                    F.count(F.lit(1)).cast("long").alias("n_orphans"),
                    F.countDistinct("k").cast("long").alias("n_orphan_keys"),
                )
            )
            .select(F.lit(name).alias("fk_edge"), "n_rows", "n_orphans",
                    "n_orphan_keys")
        )

    return (
        edge("orders.o_custkey->customer", o, "o_custkey", c, "c_custkey")
        .unionByName(edge("lineitem.l_orderkey->orders", li, "l_orderkey", o, "o_orderkey"))
        .unionByName(edge("lineitem.l_partkey->part", li, "l_partkey", p, "p_partkey"))
        .unionByName(edge("lineitem.l_suppkey->supplier", li, "l_suppkey", s, "s_suppkey"))
    )


ORACLE_SQL["fk_orphan_audit"] = """
    SELECT 'orders.o_custkey->customer' AS fk_edge,
           CAST((SELECT count(*) FROM orders) AS BIGINT) AS n_rows,
           CAST((SELECT count(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
             AS n_orphans,
           CAST((SELECT count(DISTINCT o_custkey) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
             AS n_orphan_keys
    UNION ALL
    SELECT 'lineitem.l_orderkey->orders',
           CAST((SELECT count(*) FROM lineitem) AS BIGINT),
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT),
           CAST((SELECT count(DISTINCT l_orderkey) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
    UNION ALL
    SELECT 'lineitem.l_partkey->part',
           CAST((SELECT count(*) FROM lineitem) AS BIGINT),
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM part p
                                   WHERE p.p_partkey = l.l_partkey)) AS BIGINT),
           CAST((SELECT count(DISTINCT l_partkey) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM part p
                                   WHERE p.p_partkey = l.l_partkey)) AS BIGINT)
    UNION ALL
    SELECT 'lineitem.l_suppkey->supplier',
           CAST((SELECT count(*) FROM lineitem) AS BIGINT),
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM supplier s
                                   WHERE s.s_suppkey = l.l_suppkey)) AS BIGINT),
           CAST((SELECT count(DISTINCT l_suppkey) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM supplier s
                                   WHERE s.s_suppkey = l.l_suppkey)) AS BIGINT)
"""
QUERIES["fk_orphan_audit"] = q_fk_orphan_audit


# --- round-6 widening wave 7: corpus divergence & distribution audits -----


def q_source_divergence_tv(spark, sf_dir):
    """Per-source corpus drift: total-variation distance between each
    crawl source's token unigram distribution and the whole-corpus
    distribution — the mixture-rebalancing signal a data pipeline
    watches when a new dump lands.  TV = 1/2 * sum_t |p_s(t) - p(t)|
    is the exact-rational sibling of KL (no logs, so no libm ulp
    drift): the numerator folds |c_st*N - C_t*n_s| over PRESENT
    tokens as exact int64 and adds the absent-token mass
    n_s*(N - sum_present C_t) in closed form, so the only double is
    ONE final division.  int64 ceiling: products are bounded by
    2*n_s*N — safe to ~3e9 total corpus tokens (cast to decimal past
    that).  Scale: one (source, token) wordcount shuffle, one
    token-keyed join against the vocab-sized count table; the source
    totals ride a broadcast, the grand total a 1-row crossJoin."""
    d = _t(spark, sf_dir, "documents")
    cells = (
        d.select("source", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tok = cells.groupBy("token").agg(F.sum("c").alias("ct"))
    src = cells.groupBy("source").agg(F.sum("c").alias("ns"))
    total = src.agg(F.sum("ns").alias("nn"))
    j = (
        cells.join(F.broadcast(src), "source")
        .join(tok, "token")
        .crossJoin(F.broadcast(total))
    )
    per = j.groupBy("source").agg(
        F.sum(F.abs(F.col("c") * F.col("nn") - F.col("ct") * F.col("ns"))).alias("a"),
        F.sum("ct").alias("p"),
        F.max("ns").alias("ns"),
        F.max("nn").alias("nn"),
    )
    return per.select(
        "source",
        F.col("ns").cast("long").alias("n_tokens"),
        F.round(
            (F.col("a") + F.col("ns") * (F.col("nn") - F.col("p"))).cast("double")
            / (F.lit(2.0) * F.col("ns").cast("double") * F.col("nn").cast("double")),
            6,
        ).alias("tv_divergence"),
    )


ORACLE_SQL["source_divergence_tv"] = """
    WITH cells AS (
      SELECT source, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    cc AS (
      SELECT source, token, CAST(count(*) AS BIGINT) AS c
      FROM cells GROUP BY 1, 2
    ),
    tok AS (SELECT token, CAST(sum(c) AS BIGINT) AS ct FROM cc GROUP BY 1),
    src AS (SELECT source, CAST(sum(c) AS BIGINT) AS ns FROM cc GROUP BY 1),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS nn FROM cc),
    per AS (
      SELECT cc.source,
             CAST(sum(abs(cc.c * tot.nn - tok.ct * src.ns)) AS BIGINT) AS a,
             CAST(sum(tok.ct) AS BIGINT) AS p,
             max(src.ns) AS ns,
             max(tot.nn) AS nn
      FROM cc
      JOIN tok USING (token)
      JOIN src USING (source)
      CROSS JOIN tot
      GROUP BY 1
    )
    SELECT source,
           ns AS n_tokens,
           round(CAST(a + ns * (nn - p) AS DOUBLE)
                 / (2.0 * CAST(ns AS DOUBLE) * CAST(nn AS DOUBLE)),
                 6) AS tv_divergence
    FROM per
"""
QUERIES["source_divergence_tv"] = q_source_divergence_tv


def _benford_expected(spark):
    """The 9-row Benford expected-share table, ONE definition for the
    batch key and its stream twin (they share one oracle, so the two
    sides must chi-square against byte-identical constants): hardcoded
    12-decimal literals so both engines parse the identical double."""
    return spark.createDataFrame(
        [
            (1, 0.301029995664),
            (2, 0.176091259056),
            (3, 0.124938736608),
            (4, 0.096910013008),
            (5, 0.079181246048),
            (6, 0.066946789631),
            (7, 0.057991946978),
            (8, 0.051152522447),
            (9, 0.045757490561),
        ],
        "digit int, expected_share double",
    )


def q_benford_digit_audit(spark, sf_dir):
    """Benford's-law audit of order totals — the fraud/synthetic-data
    smell test: observed first-significant-digit counts vs the Benford
    expectation log10(1+1/d), with a per-digit chi-square contribution.
    The digit is extracted EXACTLY (first character of the integer
    cents string — no log10/pow in the extraction path); the nine
    expected shares are hardcoded 12-decimal literals so both engines
    parse the identical double; the chi term is one fixed IEEE
    expression tree (diff*diff/expected), bit-identical cross-engine.
    A 9-row digit spine left-joins the counts so a digit with zero
    observations still reports (its chi term is then n*p — loud, as an
    audit should be).  Scale: a single 9-group aggregate over one
    column; everything else is model-sized."""
    o = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    obs = (
        o.select(F.substring(cents.cast("string"), 1, 1).cast("int").alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    ben = _benford_expected(spark)
    total = o.agg(F.count(F.lit(1)).alias("n"))
    j = (
        ben.join(obs, "digit", "left")
        .na.fill({"n_obs": 0})
        .crossJoin(F.broadcast(total))
    )
    expected = F.col("n").cast("double") * F.col("expected_share")
    diff = F.col("n_obs").cast("double") - expected
    return j.select(
        "digit",
        F.col("n_obs").cast("long").alias("n_obs"),
        "expected_share",
        F.round(diff * diff / expected, 6).alias("chi_term"),
    ).orderBy("digit")


ORACLE_SQL["benford_digit_audit"] = """
    WITH obs AS (
      SELECT CAST(substring(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT)
                                 AS VARCHAR), 1, 1) AS INTEGER) AS digit,
             CAST(count(*) AS BIGINT) AS n_obs
      FROM orders GROUP BY 1
    ),
    ben(digit, expected_share) AS (
      VALUES (1, CAST(0.301029995664 AS DOUBLE)),
             (2, CAST(0.176091259056 AS DOUBLE)),
             (3, CAST(0.124938736608 AS DOUBLE)),
             (4, CAST(0.096910013008 AS DOUBLE)),
             (5, CAST(0.079181246048 AS DOUBLE)),
             (6, CAST(0.066946789631 AS DOUBLE)),
             (7, CAST(0.057991946978 AS DOUBLE)),
             (8, CAST(0.051152522447 AS DOUBLE)),
             (9, CAST(0.045757490561 AS DOUBLE))
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM orders)
    SELECT ben.digit,
           COALESCE(obs.n_obs, 0) AS n_obs,
           ben.expected_share,
           round((CAST(COALESCE(obs.n_obs, 0) AS DOUBLE)
                  - CAST(tot.n AS DOUBLE) * ben.expected_share)
                 * (CAST(COALESCE(obs.n_obs, 0) AS DOUBLE)
                    - CAST(tot.n AS DOUBLE) * ben.expected_share)
                 / (CAST(tot.n AS DOUBLE) * ben.expected_share),
                 6) AS chi_term
    FROM ben LEFT JOIN obs ON obs.digit = ben.digit CROSS JOIN tot
    ORDER BY ben.digit
"""
QUERIES["benford_digit_audit"] = q_benford_digit_audit


def q_value_skewness_by_type(spark, sf_dir):
    """Per-event-type skewness (population g1) of the value column via
    EXACT integer moment sums: values are fixed to integer cents at the
    row level, then S1 folds as int64 and the square/cube sums S2/S3 as
    decimal(38,0) (int64 S2 wraps for high-magnitude values before the
    decimal bounds bind — pinned in tests/test_round7_review.py;
    decimal is exact to 1e38).  The closed form reduces to
    g1 = A / B^{3/2} with A = n^2*S3 - 3n*S1*S2 + 2*S1^3 and
    B = n*S2 - S1^2 both exact (A and B fold in decimal(38,0) /
    HUGEINT — B in int64 would wrap at ~6e24 well inside the supported
    range), so the doubles are one cast, one sqrt,
    one multiply, one division — a fixed IEEE tree, bit-identical
    cross-engine.  decimal(38,0) CEILING (DuckDB HUGEINT is 2^127 —
    wider — so past the ceiling Spark nulls/errors first): |A| <=
    6*n^3*cmax^3; at this fixture's cmax ~ 1e5 cents ($1000) the bound
    holds for n <= 2.5e7 rows PER TYPE (~sf125, 1.2e8 total events) —
    pinned in tests/test_round7_fixes.py.  Past that, pre-shift by an
    integer per-type pivot (g1 is translation-invariant) or fold S3 on
    a coarser grid.  Scale: a single per-type aggregate (map-side
    partial), model-sized result."""
    e = _events(spark, sf_dir)
    c = F.round(F.col("value") * 100, 0).cast("long")
    base = e.select("event_type", c.alias("c"))
    agg = base.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s1"),
        # decimal(38,0): sum(c^2) in int64 wraps before A/B's decimal
        # bounds bind for high-magnitude values (pinned in
        # tests/test_round7_review.py); DuckDB mirrors with HUGEINT
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c")).alias("s2"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c") * F.col("c")).alias("s3"),
    )
    a = (
        F.col("s3") * F.col("n") * F.col("n")
        - F.col("s1").cast("decimal(38,0)") * F.col("s2") * F.col("n") * 3
        + F.col("s1").cast("decimal(38,0)") * F.col("s1") * F.col("s1") * 2
    )
    # decimal(38,0), NOT int64: at the documented sf125 ceiling
    # n*s2 ~ 2.5e7 * 2.5e17 = 6e24 >> 2^63 — B would wrap long before
    # A's decimal bound binds (DuckDB mirrors with HUGEINT)
    b = (
        F.col("n").cast("decimal(38,0)") * F.col("s2")
        - F.col("s1").cast("decimal(38,0)") * F.col("s1")
    )
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round(
            F.col("s1").cast("double") / (F.lit(100.0) * F.col("n").cast("double")), 6
        ).alias("mean_value"),
        F.round(
            a.cast("double") / (F.sqrt(b.cast("double")) * b.cast("double")), 6
        ).alias("skewness"),
    )


ORACLE_SQL["value_skewness_by_type"] = """
    WITH base AS (
      SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS c FROM events
    ),
    agg AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(c) AS BIGINT) AS s1,
             sum(CAST(c AS HUGEINT) * c) AS s2,
             sum(CAST(c AS HUGEINT) * c * c) AS s3
      FROM base GROUP BY 1
    )
    SELECT event_type,
           n,
           round(CAST(s1 AS DOUBLE) / (100.0 * CAST(n AS DOUBLE)), 6) AS mean_value,
           round(CAST(s3 * n * n
                      - 3 * CAST(s1 AS HUGEINT) * s2 * n
                      + 2 * CAST(s1 AS HUGEINT) * s1 * s1 AS DOUBLE)
                 / (sqrt(CAST(CAST(n AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1 AS DOUBLE))
                    * CAST(CAST(n AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)),
                 6) AS skewness
    FROM agg
"""
QUERIES["value_skewness_by_type"] = q_value_skewness_by_type


def q_zipf_slope(spark, sf_dir):
    """Zipf's-law fit of the corpus: OLS slope of ln(frequency) on
    ln(rank) over the top-100 tokens (a healthy natural-language corpus
    sits near -1; a template-spam corpus goes flat).  Determinism
    recipe: the top-k selection is a TakeOrdered with the total order
    (n DESC, token ASC); each ln is rounded to 9 decimals and scaled to
    an exact int64 at the ROW level, so the OLS moment sums fold as
    exact integers (cross products in decimal(38,0) — xi*yi can exceed
    int64) and the slope/r2 are one division each.  Scale: the vocab
    wordcount shuffle dominates; the fit itself runs on a 100-row
    model-sized table (the sanctioned unpartitioned-window exemption)."""
    d = _t(spark, sf_dir, "documents")
    tok = (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(100)
    )
    w = Window.orderBy(F.desc("n"), F.asc("token"))
    ranked = tok.select(
        F.row_number().over(w).alias("rank"), F.col("n")
    )
    xi = F.round(F.log(F.col("rank").cast("double")) * 1e9, 0).cast("long")
    yi = F.round(F.log(F.col("n").cast("double")) * 1e9, 0).cast("long")
    pts = ranked.select(xi.alias("x"), yi.alias("y"))
    m = pts.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y")).alias("sxy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y")).alias("syy"),
    )
    num = F.col("sxy") * F.col("k") - F.col("sx").cast("decimal(38,0)") * F.col("sy")
    den = F.col("sxx") * F.col("k") - F.col("sx").cast("decimal(38,0)") * F.col("sx")
    deny = F.col("syy") * F.col("k") - F.col("sy").cast("decimal(38,0)") * F.col("sy")
    return m.select(
        F.col("k").cast("long").alias("n_tokens"),
        F.round(num.cast("double") / den.cast("double"), 6).alias("zipf_slope"),
        F.round(
            num.cast("double") * num.cast("double")
            / (den.cast("double") * deny.cast("double")),
            6,
        ).alias("r2"),
    )


ORACLE_SQL["zipf_slope"] = """
    WITH tok AS (
      SELECT token, CAST(count(*) AS BIGINT) AS n
      FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      GROUP BY 1 ORDER BY n DESC, token ASC LIMIT 100
    ),
    ranked AS (
      SELECT row_number() OVER (ORDER BY n DESC, token ASC) AS rank, n FROM tok
    ),
    pts AS (
      SELECT CAST(round(ln(CAST(rank AS DOUBLE)) * 1e9, 0) AS BIGINT) AS x,
             CAST(round(ln(CAST(n AS DOUBLE)) * 1e9, 0) AS BIGINT) AS y
      FROM ranked
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             sum(CAST(x AS HUGEINT) * y) AS sxy,
             sum(CAST(x AS HUGEINT) * x) AS sxx,
             sum(CAST(y AS HUGEINT) * y) AS syy
      FROM pts
    )
    SELECT k AS n_tokens,
           round(CAST(sxy * k - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                 / CAST(sxx * k - CAST(sx AS HUGEINT) * sx AS DOUBLE),
                 6) AS zipf_slope,
           round(CAST(sxy * k - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                 * CAST(sxy * k - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                 / (CAST(sxx * k - CAST(sx AS HUGEINT) * sx AS DOUBLE)
                    * CAST(syy * k - CAST(sy AS HUGEINT) * sy AS DOUBLE)),
                 6) AS r2
    FROM m
"""
QUERIES["zipf_slope"] = q_zipf_slope


def q_neighbor_jaccard(spark, sf_dir):
    """Link-prediction feature over the part co-occurrence graph (same
    graph as graph_assortativity: parts co-occurring in a sampled
    order): Jaccard similarity of adjacency sets for the top-20 vertex
    pairs that share at least one common neighbor.  Everything is
    exact-integer (common neighbors by wedge counting, degrees from the
    symmetric edge list, J = inter/(da+db-inter) as ONE division,
    rounded before the ordering so the top-k total order
    (jaccard DESC, part_a, part_b) is cross-engine identical).  Scale:
    the wedge join is the O(sum deg^2) step — at 100 TB it takes the
    standard mitigation (cap or split high-degree hubs before the
    self-join, as two_hop_neighbors documents); degrees join in
    model-sized broadcasts."""
    # Scale-adaptive wedge parallelism (r10 verdict #7): the r08-r10
    # shape pinned BOTH repartitions at defaultParallelism*8 — an
    # sf10-OOM patch (at 32 shuffle partitions the sf10 edge list (30M
    # rows) stored ~128 MB checkpoint blocks and the 900M-row wedge
    # shuffle ran 32 reduce tasks; finishAggregate's per-spill-file
    # reader buffers then OOMed the 6g heap, MEM_SCALING_r08 triage).
    # The constant was simultaneously 8x too many tasks at sf0.1 (two
    # 256-task barrier stages + a 256-block checkpoint for a ~300k-row
    # edge list made this the most host-phase-sensitive key) and a
    # ceiling at 100x that scale.  A bytes-per-partition target on the
    # SOURCE table reproduces the sf10 shape (~1.1 GB lineitem / 4 MB
    # -> ~275 tasks, vs the 256 that fixed the OOM) while collapsing to
    # defaultParallelism at sf0.1 and keeping growth linear beyond sf10.
    n_wedge = scaled_partitions(
        _t(spark, sf_dir, "lineitem"), bytes_per_partition=4 << 20
    )
    e = (
        _copurchase_edges(spark, sf_dir)
        # one barrier: the edge list feeds four subtrees (degree pass and
        # both wedge sides); without it each reference recomputes the
        # lineitem self-join.  Re-partition BEFORE the eager checkpoint:
        # bounds checkpoint block size (see above)
        .repartition(n_wedge, "pa", "pb")
        .transform(materialize)
    )
    sym = e.select(F.col("pa").alias("s"), F.col("pb").alias("d")).unionAll(
        e.select(F.col("pb").alias("s"), F.col("pa").alias("d"))
    )
    deg = sym.groupBy("s").agg(F.count(F.lit(1)).alias("dg")).withColumnRenamed("s", "v")
    # pre-partition the wedge join's BOTH sides on the join key at the
    # checkpoint parallelism: the join then runs at n_wedge tasks, not
    # spark.sql.shuffle.partitions, so each task's share of the
    # O(sum deg^2) wedge stream — and the partial-aggregation spill count
    # riding on it — stays bounded as the graph grows
    wedge_src = sym.repartition(n_wedge, "s").transform(materialize)
    w1 = wedge_src.select(F.col("s").alias("mid"), F.col("d").alias("pa"))
    w2 = wedge_src.select(F.col("s").alias("mid"), F.col("d").alias("pb"))
    wedges = (
        w1.join(w2, "mid")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    da = deg.withColumnRenamed("v", "pa").withColumnRenamed("dg", "da")
    db = deg.withColumnRenamed("v", "pb").withColumnRenamed("dg", "db")
    j = wedges.join(da, "pa").join(db, "pb")
    return (
        j.select(
            F.col("pa").alias("part_a"),
            F.col("pb").alias("part_b"),
            F.col("inter").cast("long").alias("common_neighbors"),
            F.col("da").cast("long").alias("degree_a"),
            F.col("db").cast("long").alias("degree_b"),
            F.round(
                F.col("inter").cast("double")
                / (F.col("da") + F.col("db") - F.col("inter")).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), "part_a", "part_b")
        .limit(20)
    )


ORACLE_SQL["neighbor_jaccard"] = """
    WITH li AS (
      SELECT DISTINCT l_orderkey AS k, l_partkey AS p
      FROM lineitem WHERE l_orderkey % 4 = 0
    ),
    e AS (
      SELECT DISTINCT a.p AS pa, b.p AS pb
      FROM li a JOIN li b ON a.k = b.k AND a.p < b.p
    ),
    sym AS (
      SELECT pa AS s, pb AS d FROM e UNION ALL SELECT pb, pa FROM e
    ),
    deg AS (SELECT s AS v, CAST(count(*) AS BIGINT) AS dg FROM sym GROUP BY 1),
    wedges AS (
      SELECT w1.d AS pa, w2.d AS pb, CAST(count(*) AS BIGINT) AS inter
      FROM sym w1 JOIN sym w2 ON w1.s = w2.s AND w1.d < w2.d
      GROUP BY 1, 2
    )
    SELECT wedges.pa AS part_a,
           wedges.pb AS part_b,
           inter AS common_neighbors,
           da.dg AS degree_a,
           db.dg AS degree_b,
           round(CAST(inter AS DOUBLE)
                 / CAST(da.dg + db.dg - inter AS DOUBLE), 6) AS jaccard
    FROM wedges
    JOIN deg da ON da.v = wedges.pa
    JOIN deg db ON db.v = wedges.pb
    ORDER BY jaccard DESC, part_a, part_b
    LIMIT 20
"""
QUERIES["neighbor_jaccard"] = q_neighbor_jaccard


# --- round-6 widening wave 8: ML/eval statistics -------------------------


def q_ols_multivariate(spark, sf_dir):
    """Two-regressor OLS (order total cents on #lineitems and total
    quantity) via the closed-form 2x2 normal equations — the
    feature-attribution fit that needs no iteration.  First-level
    moment sums fold as exact int64 (per-row products bounded by
    ~2e10, sums safe past sf10); the centered cross-moments, Cramer
    determinants and beta numerators are decimal(38,0)/HUGEINT exact,
    so each beta is ONE division and the intercept one fixed IEEE
    tree over those two quotients — bit-identical cross-engine.
    Scale: one lineitem groupBy(orderkey) shuffle + an orders join on
    the same key; the fit itself is a 1-row fold."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("y")
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("x1"),
            F.round(F.sum("l_quantity"), 0).cast("long").alias("x2"),
        )
    )
    pts = o.join(li, o.o_orderkey == li.l_orderkey).select("x1", "x2", "y")
    m = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x1").alias("sx1"),
        F.sum("x2").alias("sx2"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum(F.col("x1") * F.col("y")).alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).alias("s2y"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    a11 = dec("s11") * F.col("n") - dec("sx1") * F.col("sx1")
    a12 = dec("s12") * F.col("n") - dec("sx1") * F.col("sx2")
    a22 = dec("s22") * F.col("n") - dec("sx2") * F.col("sx2")
    b1 = dec("s1y") * F.col("n") - dec("sx1") * F.col("sy")
    b2 = dec("s2y") * F.col("n") - dec("sx2") * F.col("sy")
    det = a11 * a22 - a12 * a12
    beta1 = (a22 * b1 - a12 * b2).cast("double") / det.cast("double")
    beta2 = (a11 * b2 - a12 * b1).cast("double") / det.cast("double")
    intercept = (
        F.col("sy").cast("double")
        - beta1 * F.col("sx1").cast("double")
        - beta2 * F.col("sx2").cast("double")
    ) / F.col("n").cast("double")
    return m.select(
        F.col("n").cast("long").alias("n_orders"),
        F.round(beta1, 6).alias("beta_lines_cents"),
        F.round(beta2, 6).alias("beta_qty_cents"),
        F.round(intercept, 6).alias("intercept_cents"),
    )


ORACLE_SQL["ols_multivariate"] = """
    WITH pts AS (
      SELECT li.x1, li.x2, CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS y
      FROM orders o
      JOIN (SELECT l_orderkey,
                   CAST(count(*) AS BIGINT) AS x1,
                   CAST(round(sum(l_quantity), 0) AS BIGINT) AS x2
            FROM lineitem GROUP BY 1) li
        ON o.o_orderkey = li.l_orderkey
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x1) AS BIGINT) AS sx1,
             CAST(sum(x2) AS BIGINT) AS sx2,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x1 * x1) AS BIGINT) AS s11,
             CAST(sum(x1 * x2) AS BIGINT) AS s12,
             CAST(sum(x2 * x2) AS BIGINT) AS s22,
             CAST(sum(x1 * y) AS BIGINT) AS s1y,
             CAST(sum(x2 * y) AS BIGINT) AS s2y
      FROM pts
    ),
    c AS (
      SELECT n, sx1, sx2, sy,
             CAST(s11 AS HUGEINT) * n - CAST(sx1 AS HUGEINT) * sx1 AS a11,
             CAST(s12 AS HUGEINT) * n - CAST(sx1 AS HUGEINT) * sx2 AS a12,
             CAST(s22 AS HUGEINT) * n - CAST(sx2 AS HUGEINT) * sx2 AS a22,
             CAST(s1y AS HUGEINT) * n - CAST(sx1 AS HUGEINT) * sy AS b1,
             CAST(s2y AS HUGEINT) * n - CAST(sx2 AS HUGEINT) * sy AS b2
      FROM m
    )
    SELECT n AS n_orders,
           round(CAST(a22 * b1 - a12 * b2 AS DOUBLE)
                 / CAST(a11 * a22 - a12 * a12 AS DOUBLE), 6) AS beta_lines_cents,
           round(CAST(a11 * b2 - a12 * b1 AS DOUBLE)
                 / CAST(a11 * a22 - a12 * a12 AS DOUBLE), 6) AS beta_qty_cents,
           round((CAST(sy AS DOUBLE)
                  - (CAST(a22 * b1 - a12 * b2 AS DOUBLE)
                     / CAST(a11 * a22 - a12 * a12 AS DOUBLE))
                    * CAST(sx1 AS DOUBLE)
                  - (CAST(a11 * b2 - a12 * b1 AS DOUBLE)
                     / CAST(a11 * a22 - a12 * a12 AS DOUBLE))
                    * CAST(sx2 AS DOUBLE))
                 / CAST(n AS DOUBLE), 6) AS intercept_cents
    FROM c
"""
QUERIES["ols_multivariate"] = q_ols_multivariate


def q_rater_agreement_kappa(spark, sf_dir):
    """Cohen's kappa between two deterministic document raters (rater A:
    n_chars > 500; rater B: whitespace token count > 80) — the
    inter-annotator-agreement check run before trusting any pair of
    quality filters to vote.  The 2x2 contingency counts are exact
    int64 and kappa reduces to (n*(a+d) - E) / (n^2 - E) with
    E = (a+b)(a+c) + (c+d)(b+d) exact, so the statistic is ONE
    division of exact integers.  Scale: a single 4-cell aggregate,
    shuffle-free map-side fold."""
    d = _t(spark, sf_dir, "documents")
    ra = (F.col("n_chars") > 500).cast("int")
    rb = (F.size(F.split(F.col("text"), " ")) > 80).cast("int")
    cells = d.select(ra.alias("ra"), rb.alias("rb")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("ra") * F.col("rb")).alias("a"),
        F.sum(F.col("ra") * (1 - F.col("rb"))).alias("b"),
        F.sum((1 - F.col("ra")) * F.col("rb")).alias("c"),
        F.sum((1 - F.col("ra")) * (1 - F.col("rb"))).alias("d"),
    )
    e = (F.col("a") + F.col("b")) * (F.col("a") + F.col("c")) + (
        F.col("c") + F.col("d")
    ) * (F.col("b") + F.col("d"))
    return cells.select(
        F.col("n").cast("long").alias("n_docs"),
        F.col("a").cast("long").alias("both_pass"),
        F.col("b").cast("long").alias("only_a"),
        F.col("c").cast("long").alias("only_b"),
        F.col("d").cast("long").alias("neither"),
        F.round(
            (F.col("n") * (F.col("a") + F.col("d")) - e).cast("double")
            / (F.col("n") * F.col("n") - e).cast("double"),
            6,
        ).alias("kappa"),
    )


ORACLE_SQL["rater_agreement_kappa"] = """
    WITH cells AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(ra * rb) AS BIGINT) AS a,
             CAST(sum(ra * (1 - rb)) AS BIGINT) AS b,
             CAST(sum((1 - ra) * rb) AS BIGINT) AS c,
             CAST(sum((1 - ra) * (1 - rb)) AS BIGINT) AS d
      FROM (SELECT CASE WHEN n_chars > 500 THEN 1 ELSE 0 END AS ra,
                   CASE WHEN len(string_split(text, ' ')) > 80 THEN 1 ELSE 0 END AS rb
            FROM documents)
    )
    SELECT n AS n_docs, a AS both_pass, b AS only_a, c AS only_b, d AS neither,
           round(CAST(n * (a + d) - ((a + b) * (a + c) + (c + d) * (b + d))
                      AS DOUBLE)
                 / CAST(n * n - ((a + b) * (a + c) + (c + d) * (b + d))
                        AS DOUBLE), 6) AS kappa
    FROM cells
"""
QUERIES["rater_agreement_kappa"] = q_rater_agreement_kappa


def q_winsorized_mean_by_nation(spark, sf_dir):
    """Per-nation winsorized mean order price (clamp to [p05, p95], then
    average) — the robust revenue statistic that survives fat-tail
    outliers.  Percentiles are EXACT rank selections over the
    per-nation value-count table (rank k = ceil(q*n) via integer
    arithmetic, value = first cents whose cumulative count reaches k) —
    the same no-single-task-sort design as percentile_bands_per_type:
    the window runs over (nation, distinct-cents) count rows, never
    raw orders.  The clamped mean folds exact cents; one final
    division.  Scale: one orders->customer join (nation broadcast),
    one count-table shuffle."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents")
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    j = o.join(c, o.o_custkey == c.c_custkey).join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    )
    counts = j.groupBy("n_name", "cents").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("n_name").orderBy("cents")
    cum = counts.select(
        "n_name", "cents", "cnt", F.sum("cnt").over(w).alias("cum")
    )
    tot = counts.groupBy("n_name").agg(F.sum("cnt").alias("nn"))
    cj = cum.join(F.broadcast(tot), "n_name")
    p = cj.groupBy("n_name").agg(
        F.min(F.when(F.col("cum") * 100 >= F.lit(5) * F.col("nn"), F.col("cents"))).alias("p05"),
        F.min(F.when(F.col("cum") * 100 >= F.lit(95) * F.col("nn"), F.col("cents"))).alias("p95"),
        F.max("nn").alias("nn"),
    )
    clamped = counts.join(F.broadcast(p), "n_name").select(
        "n_name",
        "nn",
        (
            F.greatest(F.col("p05"), F.least(F.col("p95"), F.col("cents")))
            * F.col("cnt")
        ).alias("wsum"),
    )
    return (
        clamped.groupBy("n_name")
        .agg(F.sum("wsum").alias("ws"), F.max("nn").alias("nn"))
        .select(
            F.col("n_name").alias("nation"),
            F.col("nn").cast("long").alias("n_orders"),
            F.round(
                F.col("ws").cast("double") / (F.lit(100.0) * F.col("nn").cast("double")),
                6,
            ).alias("winsorized_mean"),
        )
    )


ORACLE_SQL["winsorized_mean_by_nation"] = """
    WITH o AS (
      SELECT n.n_name,
             CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
      FROM orders
      JOIN customer c ON o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
    ),
    counts AS (
      SELECT n_name, cents, CAST(count(*) AS BIGINT) AS cnt
      FROM o GROUP BY 1, 2
    ),
    cum AS (
      SELECT n_name, cents, cnt,
             CAST(sum(cnt) OVER (PARTITION BY n_name ORDER BY cents) AS BIGINT) AS cum,
             CAST(sum(cnt) OVER (PARTITION BY n_name) AS BIGINT) AS nn
      FROM counts
    ),
    p AS (
      SELECT n_name,
             min(CASE WHEN cum * 100 >= 5 * nn THEN cents END) AS p05,
             min(CASE WHEN cum * 100 >= 95 * nn THEN cents END) AS p95,
             max(nn) AS nn
      FROM cum GROUP BY 1
    )
    SELECT counts.n_name AS nation,
           max(p.nn) AS n_orders,
           round(CAST(sum(greatest(p.p05, least(p.p95, counts.cents)) * counts.cnt)
                      AS DOUBLE)
                 / (100.0 * CAST(max(p.nn) AS DOUBLE)), 6) AS winsorized_mean
    FROM counts JOIN p ON counts.n_name = p.n_name
    GROUP BY 1
"""
QUERIES["winsorized_mean_by_nation"] = q_winsorized_mean_by_nation


def q_seasonality_dow(spark, sf_dir):
    """Day-of-week seasonality index of order revenue: per-dow revenue
    share scaled by 7, so 1.0 = flat.  Revenue folds as exact cents;
    the index is ONE division (dow-cents*7 / total-cents).  Day keys
    use the Sunday=0 convention (Spark dayofweek-1 == DuckDB
    dayofweek) so the two engines group identically.  Scale: a 7-group
    aggregate with map-side partials; the total rides a 1-row
    broadcast."""
    o = _t(spark, sf_dir, "orders").select(
        (F.dayofweek("o_orderdate") - 1).alias("dow"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    per = o.groupBy("dow").agg(
        F.count(F.lit(1)).alias("n_orders"), F.sum("cents").alias("rev")
    )
    tot = per.agg(F.sum("rev").alias("total"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "dow",
            F.col("n_orders").cast("long").alias("n_orders"),
            F.col("rev").cast("long").alias("revenue_cents"),
            F.round(
                (F.col("rev") * 7).cast("double") / F.col("total").cast("double"), 6
            ).alias("seasonal_index"),
        )
        .orderBy("dow")
    )


ORACLE_SQL["seasonality_dow"] = """
    WITH per AS (
      SELECT dayofweek(o_orderdate) AS dow,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev
      FROM orders GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(rev) AS BIGINT) AS total FROM per)
    SELECT dow, n_orders, rev AS revenue_cents,
           round(CAST(rev * 7 AS DOUBLE) / CAST(total AS DOUBLE), 6)
             AS seasonal_index
    FROM per CROSS JOIN tot
    ORDER BY dow
"""
QUERIES["seasonality_dow"] = q_seasonality_dow


def q_quality_calibration_bins(spark, sf_dir):
    """Calibration table for the short-token quality score against the
    lang == 'en' label (the same score/label pair quality_score_auc
    certifies): decile score bins with observed positive rate — the
    reliability diagram as data, read before trusting the score as a
    probability.  Counts are exact; the rate is one division.  Scale:
    row-local scoring then a <= 11-group aggregate."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    scored = d.select(
        _short_token_score(toks).alias("score"),
        (F.col("lang") == "en").cast("long").alias("label"),
    )
    return (
        scored.select((F.col("score") - F.col("score") % 100).alias("bin_lo"), "label")
        .groupBy("bin_lo")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("label").alias("n_pos"),
        )
        .select(
            "bin_lo",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_pos").cast("long").alias("n_pos"),
            F.round(
                F.col("n_pos").cast("double") / F.col("n_docs").cast("double"), 6
            ).alias("pos_rate"),
        )
        .orderBy("bin_lo")
    )


ORACLE_SQL["quality_calibration_bins"] = f"""
    WITH scored AS (
      SELECT {_SHORT_SCORE_SQL} AS score,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS label
      FROM documents
    )
    SELECT score - score % 100 AS bin_lo,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(label) AS BIGINT) AS n_pos,
           round(CAST(sum(label) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
             AS pos_rate
    FROM scored
    GROUP BY 1 ORDER BY 1
"""
QUERIES["quality_calibration_bins"] = q_quality_calibration_bins


# --- round-6 widening wave 9: streaming sketch, k-core, drift, pareto -----


def q_stream_quantile_rollup(spark, sf_dir):
    """STREAMING quantile-sketch maintenance driven end-to-end — the
    order-statistics member of the streaming sketch family: events
    replay in three mtime-pinned micro-batches; the hash-sampled
    value-count table is a complete-mode streaming aggregation whose
    state is the SKETCH's own bounded size (sample distinct values, set
    by rate_den — no watermark needed); counts add, so after the drain
    the streamed table equals the batch ``vq_sketch`` bit-for-bit and
    the p50/p95 rollup computed FROM THE STREAMED STATE is certified by
    the batch twin's oracle (``quantile_sketch_rollup``).  The 100 TB
    shape: a few thousand (value, cnt) rows of state answer percentile
    dashboards continuously at any rollup grain."""
    import shutil
    import uuid

    from parquet_merger_spark.operators.sketches import vq_merge, vq_quantiles
    from parquet_merger_spark.streaming.events import vq_sketch_stream

    base = _scratch_dir(spark, "stream_quantile_rollup")
    shutil.rmtree(base, ignore_errors=True)

    e = _events(spark, sf_dir).select("event_id", "event_type", "value")
    slices = [e.filter(F.col("event_id") % 3 == i) for i in range(3)]
    src = _write_replay_batches(base, slices)

    name = f"svq_{uuid.uuid4().hex[:8]}"
    q = vq_sketch_stream(
        spark, src, os.path.join(base, "ckpt"), query_name=name
    )
    _drain_stream(q, "stream_quantile_rollup")
    # sever the MemorySink lineage before self-referencing plans (union of
    # the sketch with its own rollup trips Spark's conflicting-reference
    # resolution on MemoryPlan); the checkpoint is sketch-bounded state,
    # a few hundred rows by construction
    sk = spark.table(name).transform(materialize)

    qs = [("p50", 1, 2), ("p95", 19, 20)]
    sk_all = vq_merge(sk.withColumn("scope", F.lit("__all__")), ["scope"])
    est = vq_quantiles(sk.unionByName(sk_all), ["scope"], qs)

    scoped = _events(spark, sf_dir).select(
        F.col("event_type").alias("scope"), "value"
    )
    full = (
        scoped.filter(F.col("value").isNotNull())
        .groupBy("scope", F.col("value").alias("v"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    full_all = vq_merge(full.withColumn("scope", F.lit("__all__")), ["scope"])
    exact = vq_quantiles(full.unionByName(full_all), ["scope"], qs).select(
        "scope", "q_label", F.col("v").alias("v_exact")
    )
    return est.join(exact, ["scope", "q_label"]).select(
        "scope",
        "q_label",
        F.col("n").alias("n_sample"),
        F.col("v").alias("v_est"),
        "v_exact",
    )


ORACLE_SQL["stream_quantile_rollup"] = ORACLE_SQL["quantile_sketch_rollup"]
QUERIES["stream_quantile_rollup"] = q_stream_quantile_rollup


def q_graph_kcore_portable(spark, sf_dir):
    """k-core decomposition (k=3), unrolled for two peeling rounds — the
    seventh oracle-certified ITERATIVE operator (after the k-means/IVF/
    PQ/PCA/MMR/power-iteration twins): each round drops vertices of
    degree < k from the part co-occurrence graph and reports the
    surviving census, so the fixpoint loop's algebra (degree -> filter
    -> induced subgraph) is cross-engine certified on its first two
    applications.  All counts exact; no doubles anywhere.  Scale: each
    round is one degree aggregate + two key-wise semi-joins (the
    label-propagation shuffle shape); production k-core iterates this
    plan to fixpoint with the eager-checkpoint hygiene the components
    operator pins."""
    edges = (
        _copurchase_edges(spark, sf_dir)
        # eager checkpoint per round — the components-loop hygiene: each
        # peel round's edge set is consumed by THREE downstream subtrees
        # (its census, the next peel's degree pass, the next peel's
        # semi-joins); without the barrier the lineage doubles per round
        # (plan-digested at 366 exchanges for two rounds) and the wedge
        # join recomputes the base self-join every branch
        .transform(materialize)
    )

    def census(e, rnd):
        sym = e.select(F.col("pa").alias("v")).unionAll(
            e.select(F.col("pb").alias("v"))
        )
        return (
            sym.agg(F.countDistinct("v").alias("n_vertices"))
            .crossJoin(e.agg(F.count(F.lit(1)).alias("n_edges")))
            .select(
                F.lit(rnd).alias("round"),
                F.col("n_vertices").cast("long").alias("n_vertices"),
                F.col("n_edges").cast("long").alias("n_edges"),
            )
        )

    def peel(e, k=3):
        sym = e.select(F.col("pa").alias("s")).unionAll(
            e.select(F.col("pb").alias("s"))
        )
        keep = (
            sym.groupBy("s")
            .agg(F.count(F.lit(1)).alias("dg"))
            .filter(F.col("dg") >= k)
            .select(F.col("s").alias("v"))
        )
        return (
            e.join(keep.withColumnRenamed("v", "pa"), "pa", "left_semi")
            .join(keep.withColumnRenamed("v", "pb"), "pb", "left_semi")
            .select("pa", "pb")
        )

    e1 = peel(edges).transform(materialize)
    e2 = peel(e1).transform(materialize)
    return (
        census(edges, 0)
        .unionByName(census(e1, 1))
        .unionByName(census(e2, 2))
        .orderBy("round")
    )


ORACLE_SQL["graph_kcore_portable"] = """
    WITH li AS (
      SELECT DISTINCT l_orderkey AS k, l_partkey AS p
      FROM lineitem WHERE l_orderkey % 4 = 0
    ),
    e0 AS (
      SELECT DISTINCT a.p AS pa, b.p AS pb
      FROM li a JOIN li b ON a.k = b.k AND a.p < b.p
    ),
    keep1 AS (
      SELECT v FROM (
        SELECT v, count(*) AS dg
        FROM (SELECT pa AS v FROM e0 UNION ALL SELECT pb FROM e0)
        GROUP BY 1
      ) WHERE dg >= 3
    ),
    e1 AS (
      SELECT pa, pb FROM e0
      WHERE pa IN (SELECT v FROM keep1) AND pb IN (SELECT v FROM keep1)
    ),
    keep2 AS (
      SELECT v FROM (
        SELECT v, count(*) AS dg
        FROM (SELECT pa AS v FROM e1 UNION ALL SELECT pb FROM e1)
        GROUP BY 1
      ) WHERE dg >= 3
    ),
    e2 AS (
      SELECT pa, pb FROM e1
      WHERE pa IN (SELECT v FROM keep2) AND pb IN (SELECT v FROM keep2)
    )
    SELECT 0 AS round,
           CAST((SELECT count(DISTINCT v)
                 FROM (SELECT pa AS v FROM e0 UNION ALL SELECT pb FROM e0))
                AS BIGINT) AS n_vertices,
           CAST((SELECT count(*) FROM e0) AS BIGINT) AS n_edges
    UNION ALL
    SELECT 1,
           CAST((SELECT count(DISTINCT v)
                 FROM (SELECT pa AS v FROM e1 UNION ALL SELECT pb FROM e1))
                AS BIGINT),
           CAST((SELECT count(*) FROM e1) AS BIGINT)
    UNION ALL
    SELECT 2,
           CAST((SELECT count(DISTINCT v)
                 FROM (SELECT pa AS v FROM e2 UNION ALL SELECT pb FROM e2))
                AS BIGINT),
           CAST((SELECT count(*) FROM e2) AS BIGINT)
    ORDER BY round
"""
QUERIES["graph_kcore_portable"] = q_graph_kcore_portable


def q_embedding_centroid_drift(spark, sf_dir):
    """Per-label embedding centroid drift between two deterministic
    halves of the corpus (even vs odd vec_id — the batch-over-batch
    drift monitor for an embedding pipeline): L2 distance between the
    half-centroids.  Exactness recipe: dims quantize to integer
    1e-4 grid at the row level; the per-(label, dim) difference of
    means cross-multiplies to the exact integer d = s1*c2 - s2*c1; the
    squared sum folds in decimal(38,0) (d^2 can pass int64); drift =
    sqrt(S)/(c1*c2*1e4) is a fixed IEEE tree.  Scale: one
    (label, dim) aggregate over the exploded matrix — the blocked-GEMM
    layout's statistics pass, shuffle bounded by labels x dims."""
    e = _t(spark, sf_dir, "embeddings")
    vals = e.select(
        "label",
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode(
            F.transform(
                F.col("embedding"),
                lambda x: F.round(x.cast("double") * 10000, 0).cast("long"),
            )
        ).alias("dim", "qv"),
    )
    per = vals.groupBy("label", "dim").agg(
        F.sum(F.when(F.col("half") == 0, F.col("qv")).otherwise(0)).alias("s1"),
        F.sum(F.when(F.col("half") == 1, F.col("qv")).otherwise(0)).alias("s2"),
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("c2"),
    )
    d = (F.col("s1") * F.col("c2") - F.col("s2") * F.col("c1")).cast("decimal(38,0)")
    agg = per.groupBy("label").agg(
        F.sum(d * d).alias("ss"),
        F.max(F.col("c1")).alias("c1"),
        F.max(F.col("c2")).alias("c2"),
    )
    return agg.select(
        "label",
        F.col("c1").cast("long").alias("n_even"),
        F.col("c2").cast("long").alias("n_odd"),
        F.round(
            F.sqrt(F.col("ss").cast("double"))
            / (F.col("c1").cast("double") * F.col("c2").cast("double")
               * 10000.0),
            6,
        ).alias("centroid_l2_drift"),
    ).orderBy("label")


ORACLE_SQL["embedding_centroid_drift"] = """
    WITH vals AS (
      SELECT label,
             vec_id % 2 AS half,
             t.i - 1 AS dim,
             CAST(round(CAST(embedding[t.i] AS DOUBLE) * 10000, 0) AS BIGINT)
               AS qv
      FROM embeddings CROSS JOIN range(1, 65) t(i)
    ),
    per AS (
      SELECT label, dim,
             CAST(sum(CASE WHEN half = 0 THEN qv ELSE 0 END) AS BIGINT) AS s1,
             CAST(sum(CASE WHEN half = 1 THEN qv ELSE 0 END) AS BIGINT) AS s2,
             CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c2
      FROM vals GROUP BY 1, 2
    ),
    agg AS (
      SELECT label,
             sum(CAST(s1 * c2 - s2 * c1 AS HUGEINT)
                 * (s1 * c2 - s2 * c1)) AS ss,
             max(c1) AS c1, max(c2) AS c2
      FROM per GROUP BY 1
    )
    SELECT label,
           c1 AS n_even,
           c2 AS n_odd,
           round(sqrt(CAST(ss AS DOUBLE))
                 / (CAST(c1 AS DOUBLE) * CAST(c2 AS DOUBLE)
                    * 10000.0), 6) AS centroid_l2_drift
    FROM agg ORDER BY label
"""
QUERIES["embedding_centroid_drift"] = q_embedding_centroid_drift


def q_prefix_cluster_histogram(spark, sf_dir):
    """Duplicate-cluster SIZE HISTOGRAM over template-prefix clusters
    (documents sharing their first two tokens — the boilerplate-family
    grouping a crawl dedup reports before choosing survivor policy):
    for each cluster size, how many clusters and how many documents.
    The two-level aggregate (doc -> cluster size -> histogram) is the
    standard dedup-audit artifact; all counts exact.  Scale: one
    cluster-key shuffle, then a model-sized histogram fold."""
    d = _t(spark, sf_dir, "documents")
    pfx = F.array_join(F.slice(F.split(F.col("text"), " "), 1, 2), " ")
    clusters = d.select(pfx.alias("pfx")).groupBy("pfx").agg(
        F.count(F.lit(1)).alias("size")
    )
    return (
        clusters.groupBy("size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .select(
            F.col("size").cast("long").alias("cluster_size"),
            F.col("n_clusters").cast("long").alias("n_clusters"),
            (F.col("size") * F.col("n_clusters")).cast("long").alias("n_docs"),
        )
        .orderBy("cluster_size")
    )


ORACLE_SQL["prefix_cluster_histogram"] = """
    WITH clusters AS (
      SELECT array_to_string(string_split(text, ' ')[1:2], ' ') AS pfx,
             CAST(count(*) AS BIGINT) AS size
      FROM documents GROUP BY 1
    )
    SELECT size AS cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(size * count(*) AS BIGINT) AS n_docs
    FROM clusters GROUP BY 1 ORDER BY 1
"""
QUERIES["prefix_cluster_histogram"] = q_prefix_cluster_histogram


def q_revenue_pareto_share(spark, sf_dir):
    """Pareto concentration of revenue: the share of total order revenue
    held by the top decile of customers (by lifetime spend) — the
    80/20 audit.  The decile threshold is an EXACT rank selection over
    the spend COUNT TABLE (k = ceil(n/10) via integer arithmetic;
    t = the k-th largest distinct-spend boundary; ties at t are all
    included, so the set is deterministic under any ordering engine).
    All sums exact cents; the share is ONE division.  Scale: one
    custkey aggregate, a count-table window, and a 1-row fold — no
    global row sort."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents")
    )
    spend = o.groupBy("o_custkey").agg(F.sum("cents").alias("spend"))
    counts = spend.groupBy("spend").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("spend").alias("rev")
    )
    w = Window.orderBy(F.desc("spend"))
    cum = counts.select(
        "spend", "cnt", "rev", F.sum("cnt").over(w).alias("cum")
    )
    tot = counts.agg(
        F.sum("cnt").alias("n"), F.sum("rev").alias("total_rev")
    )
    cj = cum.crossJoin(F.broadcast(tot))
    thr = cj.filter(F.col("cum") * 10 >= F.col("n")).agg(
        F.max("spend").alias("t")
    )
    top = (
        counts.crossJoin(F.broadcast(thr))
        .filter(F.col("spend") >= F.col("t"))
        .agg(
            F.sum("cnt").alias("n_top"),
            F.sum("rev").alias("top_rev"),
            F.max("t").alias("t"),
        )
    )
    return top.crossJoin(F.broadcast(tot)).select(
        F.col("n").cast("long").alias("n_customers"),
        F.col("n_top").cast("long").alias("n_top_decile"),
        F.col("t").cast("long").alias("threshold_cents"),
        F.round(
            F.col("top_rev").cast("double") / F.col("total_rev").cast("double"), 6
        ).alias("top_decile_revenue_share"),
    )


ORACLE_SQL["revenue_pareto_share"] = """
    WITH spend AS (
      SELECT o_custkey,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
               AS spend
      FROM orders GROUP BY 1
    ),
    counts AS (
      SELECT spend, CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(spend) AS BIGINT) AS rev
      FROM spend GROUP BY 1
    ),
    cum AS (
      SELECT spend, cnt, rev,
             CAST(sum(cnt) OVER (ORDER BY spend DESC) AS BIGINT) AS cum
      FROM counts
    ),
    tot AS (
      SELECT CAST(sum(cnt) AS BIGINT) AS n,
             CAST(sum(rev) AS BIGINT) AS total_rev
      FROM counts
    ),
    thr AS (
      SELECT max(spend) AS t FROM cum CROSS JOIN tot WHERE cum * 10 >= n
    )
    SELECT tot.n AS n_customers,
           CAST((SELECT sum(cnt) FROM counts, thr WHERE spend >= t) AS BIGINT)
             AS n_top_decile,
           thr.t AS threshold_cents,
           round(CAST((SELECT sum(rev) FROM counts, thr WHERE spend >= t)
                      AS DOUBLE)
                 / CAST(tot.total_rev AS DOUBLE), 6)
             AS top_decile_revenue_share
    FROM tot CROSS JOIN thr
"""
QUERIES["revenue_pareto_share"] = q_revenue_pareto_share


# --- round-6 widening wave 10: folds, anomalies, boxplots, rolling, asof --


def q_stratified_kfold_assign(spark, sf_dir):
    """Deterministic stratified k-fold assignment (k=5) for evaluation
    splits: every document lands in fold portable_hash(doc_id) mod 5,
    so the split is reproducible on ANY engine that does exact int64
    arithmetic — no RNG, no collect, rerun-stable (the same recipe the
    train_test_split key certifies, at k-way grain).  Output is the per
    (lang, fold) census with each fold's within-language share — the
    stratification audit.  Scale: row-local hashing, one model-sized
    (lang, fold) aggregate."""
    from parquet_merger_spark.operators.sketches import portable_hash64

    d = _t(spark, sf_dir, "documents")
    folds = d.select(
        "lang", F.pmod(portable_hash64(F.col("doc_id"), 4), F.lit(5)).alias("fold")
    )
    per = folds.groupBy("lang", "fold").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = per.groupBy("lang").agg(F.sum("n_docs").alias("n_lang"))
    return (
        per.join(F.broadcast(tot), "lang")
        .select(
            "lang",
            F.col("fold").cast("long").alias("fold"),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.round(
                F.col("n_docs").cast("double") / F.col("n_lang").cast("double"), 6
            ).alias("lang_share"),
        )
        .orderBy("lang", "fold")
    )


ORACLE_SQL["stratified_kfold_assign"] = """
    WITH folds AS (
      SELECT lang,
             ((402653189 * (doc_id % 1000000007) + 33333331) % 1000000007) % 5
               AS fold
      FROM documents
    ),
    per AS (
      SELECT lang, fold, CAST(count(*) AS BIGINT) AS n_docs
      FROM folds GROUP BY 1, 2
    ),
    tot AS (SELECT lang, CAST(sum(n_docs) AS BIGINT) AS n_lang FROM per GROUP BY 1)
    SELECT per.lang, fold, n_docs,
           round(CAST(n_docs AS DOUBLE) / CAST(n_lang AS DOUBLE), 6) AS lang_share
    FROM per JOIN tot ON per.lang = tot.lang
    ORDER BY per.lang, fold
"""
QUERIES["stratified_kfold_assign"] = q_stratified_kfold_assign


def q_daily_count_anomalies(spark, sf_dir):
    """Cross-sectional anomaly detection: days whose per-type event count
    sits >= 2 population standard deviations from that type's daily
    mean (the volume-spike/outage monitor; the time-ordered sibling is
    drift_cusum).  The z statistic reduces to (c*n - S)/sqrt(n*S2 - S^2)
    with every sum exact int64, and the >= 2-sigma GATE is evaluated on
    exact integers ((c*n - S)^2 >= 4*(n*S2 - S^2)) so the survivor set
    is engine-independent even when z sits exactly on the fence; the
    reported z is then one fixed IEEE tree.  Days with zero events of a
    type are absent from the fixture by construction (documented
    semantics: z over OBSERVED days).  Scale: one (type, day) count
    shuffle + a model-sized per-type moment broadcast."""
    e = _events(spark, sf_dir).select(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    )
    daily = e.groupBy("event_type", "day").agg(F.count(F.lit(1)).alias("c"))
    mom = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c")).alias("s2"),
    )
    j = daily.join(F.broadcast(mom), "event_type")
    # decimal(38,0): at 1e12-event scale num^2 ~ (c*n)^2 can pass 2^63
    # (int64 would wrap inside the filter below); DuckDB mirrors HUGEINT
    num = F.col("c").cast("decimal(38,0)") * F.col("n") - F.col("s")
    var = (
        F.col("n").cast("decimal(38,0)") * F.col("s2")
        - F.col("s").cast("decimal(38,0)") * F.col("s")
    )
    return (
        j.filter(num * num >= 4 * var)
        .select(
            "event_type",
            "day",
            F.col("c").cast("long").alias("n_events"),
            F.round(num.cast("double") / F.sqrt(var.cast("double")), 6).alias("z"),
        )
        .orderBy("event_type", "day")
    )


ORACLE_SQL["daily_count_anomalies"] = """
    WITH daily AS (
      SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    mom AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(c) AS BIGINT) AS s,
             sum(CAST(c AS HUGEINT) * c) AS s2
      FROM daily GROUP BY 1
    )
    SELECT daily.event_type, day, c AS n_events,
           round(CAST(CAST(c AS HUGEINT) * n - s AS DOUBLE)
                 / sqrt(CAST(CAST(n AS HUGEINT) * s2 - CAST(s AS HUGEINT) * s AS DOUBLE)), 6) AS z
    FROM daily JOIN mom ON daily.event_type = mom.event_type
    WHERE (CAST(c AS HUGEINT) * n - s) * (CAST(c AS HUGEINT) * n - s)
          >= 4 * (CAST(n AS HUGEINT) * s2 - CAST(s AS HUGEINT) * s)
    ORDER BY daily.event_type, day
"""
QUERIES["daily_count_anomalies"] = q_daily_count_anomalies


def q_boxplot_by_segment(spark, sf_dir):
    """Per-market-segment boxplot as data: five-number summary (min, q1,
    median, q3, max) of order totals plus Tukey-fence outlier counts —
    the distribution dashboard artifact.  Quantiles are EXACT rank
    selections over the per-segment value COUNT TABLE (rank =
    (n-1)*num div den + 1; the percentile_bands idiom — no per-group
    row sort at any scale), and the 1.5*IQR fences are evaluated in
    DOUBLED integer cents (2c < 5*q1 - 3*q3) so outlier membership
    never touches a double.  Scale: one orders->customer broadcast-dim
    join, one count-table shuffle, model-sized windows."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("segment"), "cents"
    )
    counts = j.groupBy("segment", "cents").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("segment").orderBy("cents")
    cum = counts.select(
        "segment", "cents", "cnt", F.sum("cnt").over(w).alias("cum")
    )
    tot = counts.groupBy("segment").agg(
        F.sum("cnt").alias("n"),
        F.min("cents").alias("v_min"),
        F.max("cents").alias("v_max"),
    )
    cj = cum.join(F.broadcast(tot), "segment")

    def pick(num, den, name):
        rank = (F.col("n") - 1) * num - ((F.col("n") - 1) * num) % den
        rank = rank / den + 1  # exact: (n-1)*num div den + 1
        return (
            cj.filter(
                (F.col("cum") - F.col("cnt") < rank) & (rank <= F.col("cum"))
            )
            .groupBy("segment")
            .agg(F.min("cents").alias(name))
        )

    q1, med, q3 = pick(1, 4, "q1"), pick(1, 2, "median"), pick(3, 4, "q3")
    fences = (
        tot.join(F.broadcast(q1), "segment")
        .join(F.broadcast(med), "segment")
        .join(F.broadcast(q3), "segment")
    )
    out = (
        counts.join(F.broadcast(fences.select("segment", "q1", "q3")), "segment")
        .groupBy("segment")
        .agg(
            F.sum(
                F.when(2 * F.col("cents") < 5 * F.col("q1") - 3 * F.col("q3"),
                       F.col("cnt")).otherwise(0)
            ).alias("n_low_outliers"),
            F.sum(
                F.when(2 * F.col("cents") > 5 * F.col("q3") - 3 * F.col("q1"),
                       F.col("cnt")).otherwise(0)
            ).alias("n_high_outliers"),
        )
    )
    return fences.join(F.broadcast(out), "segment").select(
        "segment",
        F.col("n").cast("long").alias("n_orders"),
        F.col("v_min").cast("long").alias("min_cents"),
        F.col("q1").cast("long").alias("q1_cents"),
        F.col("median").cast("long").alias("median_cents"),
        F.col("q3").cast("long").alias("q3_cents"),
        F.col("v_max").cast("long").alias("max_cents"),
        F.col("n_low_outliers").cast("long").alias("n_low_outliers"),
        F.col("n_high_outliers").cast("long").alias("n_high_outliers"),
    ).orderBy("segment")


ORACLE_SQL["boxplot_by_segment"] = """
    WITH j AS (
      SELECT c_mktsegment AS segment,
             CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
      FROM orders JOIN customer ON o_custkey = c_custkey
    ),
    counts AS (
      SELECT segment, cents, CAST(count(*) AS BIGINT) AS cnt
      FROM j GROUP BY 1, 2
    ),
    cum AS (
      SELECT segment, cents, cnt,
             CAST(sum(cnt) OVER (PARTITION BY segment ORDER BY cents) AS BIGINT)
               AS cum
      FROM counts
    ),
    tot AS (
      SELECT segment, CAST(sum(cnt) AS BIGINT) AS n,
             min(cents) AS v_min, max(cents) AS v_max
      FROM counts GROUP BY 1
    ),
    cjt AS (SELECT cum.*, tot.n FROM cum JOIN tot USING (segment)),
    q1 AS (
      SELECT segment, min(cents) AS q1 FROM cjt
      WHERE cum - cnt < (n - 1) * 1 // 4 + 1 AND (n - 1) * 1 // 4 + 1 <= cum
      GROUP BY 1
    ),
    med AS (
      SELECT segment, min(cents) AS median FROM cjt
      WHERE cum - cnt < (n - 1) * 1 // 2 + 1 AND (n - 1) * 1 // 2 + 1 <= cum
      GROUP BY 1
    ),
    q3 AS (
      SELECT segment, min(cents) AS q3 FROM cjt
      WHERE cum - cnt < (n - 1) * 3 // 4 + 1 AND (n - 1) * 3 // 4 + 1 <= cum
      GROUP BY 1
    ),
    fences AS (
      SELECT tot.segment, n, v_min, v_max, q1.q1, med.median, q3.q3
      FROM tot JOIN q1 USING (segment) JOIN med USING (segment)
               JOIN q3 USING (segment)
    ),
    outl AS (
      SELECT counts.segment,
             CAST(sum(CASE WHEN 2 * cents < 5 * q1 - 3 * q3 THEN cnt
                           ELSE 0 END) AS BIGINT) AS n_low_outliers,
             CAST(sum(CASE WHEN 2 * cents > 5 * q3 - 3 * q1 THEN cnt
                           ELSE 0 END) AS BIGINT) AS n_high_outliers
      FROM counts JOIN fences USING (segment)
      GROUP BY 1
    )
    SELECT fences.segment, n AS n_orders, v_min AS min_cents, q1 AS q1_cents,
           median AS median_cents, q3 AS q3_cents, v_max AS max_cents,
           n_low_outliers, n_high_outliers
    FROM fences JOIN outl USING (segment)
    ORDER BY segment
"""
QUERIES["boxplot_by_segment"] = q_boxplot_by_segment


def q_rolling_median_user(spark, sf_dir):
    """Rolling lower-median of each sampled user's last five event values
    — the robust trailing statistic (the mean sibling is
    trailing_window_avg): a 5-row window frame per user ordered by
    (ts, event_id), values as exact integer cents, median = element
    (k+1) div 2 of the sorted frame (lower median — no averaging, no
    doubles anywhere).  Scale: one user-keyed shuffle; frames are O(5);
    the 1-in-50 user sample keys the contract row — the operator itself
    is full-corpus."""
    e = _events(spark, sf_dir).filter(F.col("user_id") % 50 == 0).select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, 0)
    )
    arr = F.sort_array(F.collect_list("cents").over(w))
    return e.select(
        "user_id",
        "event_id",
        "cents",
        F.element_at(arr, ((F.size(arr) + 1) / 2).cast("int")).alias(
            "rolling_median_cents"
        ),
    )


ORACLE_SQL["rolling_median_user"] = """
    WITH e AS (
      SELECT user_id, event_id, ts,
             CAST(round(value * 100, 0) AS BIGINT) AS cents
      FROM events WHERE user_id % 50 = 0
    ),
    framed AS (
      SELECT user_id, event_id, cents,
             list_sort(list(cents) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)) AS arr
      FROM e
    )
    SELECT user_id, event_id, cents,
           arr[(len(arr) + 1) // 2] AS rolling_median_cents
    FROM framed
"""
QUERIES["rolling_median_user"] = q_rolling_median_user


def q_asof_join_tolerance(spark, sf_dir):
    """As-of join WITH TOLERANCE (pandas merge_asof semantics): each
    order gains the customer's latest event at or before the order
    date, but a match older than 30 days is DISCARDED (nulled payload,
    row kept) — the staleness bound every point-in-time feature store
    enforces.  Built on the same union+window asof plan (one key
    shuffle, no range-join blowup); the tolerance is a row-local gate
    applied to the carried match, exact in epoch seconds."""
    tol = 30 * 24 * 3600
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.col("o_orderdate").cast("timestamp").cast("long").alias("order_epoch"),
    )
    e = _events(spark, sf_dir).select(
        F.col("user_id").alias("o_custkey"),
        F.col("ts").cast("long").alias("event_epoch"),
        "event_id",
        "value",
    )
    w = Window.partitionBy("o_custkey", "event_epoch").orderBy(F.desc("event_id"))
    e_uniq = (
        e.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    joined = asof_join(
        o,
        e_uniq,
        on="o_custkey",
        left_ts="order_epoch",
        right_ts="event_epoch",
        right_cols=["event_id", "event_epoch", "value"],
    )
    fresh = F.col("order_epoch") - F.col("event_epoch") <= tol
    return joined.select(
        "o_orderkey",
        "o_custkey",
        "order_epoch",
        F.when(fresh, F.col("event_id")).alias("last_event_id"),
        F.when(fresh, F.col("event_epoch")).alias("last_event_epoch"),
        F.when(fresh, F.round(F.col("value"), 2)).alias("last_event_value"),
    )


ORACLE_SQL["asof_join_tolerance"] = """
    WITH o AS (
      SELECT o_orderkey, o_custkey,
             CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) AS order_epoch
      FROM orders
    ), e0 AS (
      SELECT user_id,
             CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS event_epoch,
             event_id, value
      FROM events
    ), ed AS (
      SELECT user_id, event_epoch, event_id, value FROM (
        SELECT *, row_number() OVER (
          PARTITION BY user_id, event_epoch ORDER BY event_id DESC) AS rn
        FROM e0
      ) WHERE rn = 1
    )
    SELECT o.o_orderkey, o.o_custkey, o.order_epoch,
           CASE WHEN o.order_epoch - e.event_epoch <= 2592000
                THEN e.event_id END AS last_event_id,
           CASE WHEN o.order_epoch - e.event_epoch <= 2592000
                THEN e.event_epoch END AS last_event_epoch,
           CASE WHEN o.order_epoch - e.event_epoch <= 2592000
                THEN round(e.value, 2) END AS last_event_value
    FROM o ASOF LEFT JOIN ed e
      ON o.o_custkey = e.user_id AND e.event_epoch <= o.order_epoch
"""
QUERIES["asof_join_tolerance"] = q_asof_join_tolerance


# --- round-6 widening wave 11: hygiene audits & association diagnostics ---


def q_embedding_norm_audit(spark, sf_dir):
    """Embedding-norm hygiene audit: vectors whose squared L2 norm sits
    >= 2 population sigmas from the corpus mean — the collapsed/blown
    vector detector run before any cosine math trusts the matrix.
    Norms fold as exact int64 on the 1e-4 grid; the corpus moments use
    decimal(38,0)/HUGEINT for the fourth-power sum; the 2-sigma GATE
    compares exact integers (no double ever decides membership) and the
    reported z is one fixed IEEE tree.  Scale: one row-local norm pass,
    a 1-row moment broadcast, shuffle-free."""
    e = _t(spark, sf_dir, "embeddings")
    q = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * 10000, 0).cast("long"),
    )
    norms = e.select(
        "vec_id",
        "label",
        F.aggregate(q, F.lit(0).cast("long"), lambda acc, v: acc + v * v).alias(
            "norm2"
        ),
    )
    mom = norms.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("norm2").alias("s"),
        F.sum(F.col("norm2").cast("decimal(38,0)") * F.col("norm2")).alias("s2"),
    )
    j = norms.crossJoin(F.broadcast(mom))
    diff = (F.col("norm2") * F.col("n") - F.col("s")).cast("decimal(38,0)")
    var = F.col("s2") * F.col("n") - F.col("s").cast("decimal(38,0)") * F.col("s")
    return (
        j.filter(diff * diff >= var * 4)
        .select(
            "vec_id",
            "label",
            F.col("norm2").cast("long").alias("norm2_q"),
            F.round(diff.cast("double") / F.sqrt(var.cast("double")), 6).alias("z"),
        )
        .orderBy("vec_id")
    )


ORACLE_SQL["embedding_norm_audit"] = """
    WITH norms AS (
      SELECT vec_id, label,
             CAST(list_sum(list_transform(embedding,
                    x -> CAST(round(CAST(x AS DOUBLE) * 10000, 0) AS BIGINT)
                         * CAST(round(CAST(x AS DOUBLE) * 10000, 0) AS BIGINT)))
                  AS BIGINT) AS norm2
      FROM embeddings
    ),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(norm2) AS BIGINT) AS s,
             sum(CAST(norm2 AS HUGEINT) * norm2) AS s2
      FROM norms
    )
    SELECT vec_id, label, norm2 AS norm2_q,
           round(CAST(CAST(norm2 AS HUGEINT) * n - s AS DOUBLE)
                 / sqrt(CAST(s2 * n - CAST(s AS HUGEINT) * s AS DOUBLE)), 6)
             AS z
    FROM norms CROSS JOIN mom
    WHERE (CAST(norm2 AS HUGEINT) * n - s) * (CAST(norm2 AS HUGEINT) * n - s)
          >= (s2 * n - CAST(s AS HUGEINT) * s) * 4
    ORDER BY vec_id
"""
QUERIES["embedding_norm_audit"] = q_embedding_norm_audit


def q_interevent_burstiness(spark, sf_dir):
    """Per-user inter-event burstiness: the index of dispersion of gap
    lengths, D = n*S2/S^2 - 1 == (n*S2 - S^2)/S^2 (0 for a metronome,
    ~1 for Poisson, >1 bursty) — the behavioral-rhythm feature, all
    sums exact epoch-second integers and D ONE division.  Gaps come
    from a lag window per user over (ts, event_id); the first event
    contributes no gap; users keep the key's 1-in-25 sample.  Scale:
    one user-keyed shuffle, frames O(1)."""
    e = _events(spark, sf_dir).filter(F.col("user_id") % 25 == 0).select(
        "user_id", F.col("ts").cast("long").alias("epoch"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("epoch", "event_id")
    gaps = e.select(
        "user_id", (F.col("epoch") - F.lag("epoch").over(w)).alias("g")
    ).filter(F.col("g").isNotNull())
    agg = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("g").alias("s"),
        F.sum(F.col("g").cast("decimal(38,0)") * F.col("g")).alias("s2"),
    )
    return (
        agg.filter(F.col("s") > 0)
        .select(
            "user_id",
            F.col("n").cast("long").alias("n_gaps"),
            F.round(F.col("s").cast("double") / F.col("n").cast("double"), 6).alias(
                "mean_gap_s"
            ),
            F.round(
                (
                    F.col("n").cast("decimal(38,0)") * F.col("s2")
                    - F.col("s").cast("decimal(38,0)") * F.col("s")
                ).cast("double")
                / (F.col("s") * F.col("s")).cast("double"),
                6,
            ).alias("dispersion"),
        )
        .orderBy("user_id")
    )


ORACLE_SQL["interevent_burstiness"] = """
    WITH e AS (
      SELECT user_id,
             CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS epoch,
             event_id
      FROM events WHERE user_id % 25 = 0
    ),
    gaps AS (
      SELECT user_id,
             epoch - lag(epoch) OVER (PARTITION BY user_id
                                      ORDER BY epoch, event_id) AS g
      FROM e
    ),
    agg AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(g) AS BIGINT) AS s,
             sum(CAST(g AS HUGEINT) * g) AS s2
      FROM gaps WHERE g IS NOT NULL GROUP BY 1
    )
    SELECT user_id, n AS n_gaps,
           round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_gap_s,
           round(CAST(CAST(n AS HUGEINT) * s2 - CAST(s AS HUGEINT) * s AS DOUBLE)
                 / CAST(CAST(s AS HUGEINT) * s AS DOUBLE), 6)
             AS dispersion
    FROM agg WHERE s > 0
    ORDER BY user_id
"""
QUERIES["interevent_burstiness"] = q_interevent_burstiness


def q_segment_priority_association(spark, sf_dir):
    """Categorical association diagnostic: the chi-square contribution of
    every (market segment, order priority) contingency cell — the
    feature-independence test as a TABLE (per-cell values are each one
    exact-integer division through a fixed IEEE tree, so the artifact
    is deterministic without summing doubles cross-engine; the total
    chi-square and Cramer's V are one trivial fold away downstream).
    Expected counts ride along.  Scale: one broadcast-dim join, a
    model-sized contingency aggregate, two marginal broadcasts."""
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("segment"),
        F.col("o_orderpriority").alias("priority"),
    )
    cells = j.groupBy("segment", "priority").agg(F.count(F.lit(1)).alias("o"))
    rows = cells.groupBy("segment").agg(F.sum("o").alias("r"))
    colsm = cells.groupBy("priority").agg(F.sum("o").alias("c"))
    tot = cells.agg(F.sum("o").alias("n"))
    full = (
        cells.join(F.broadcast(rows), "segment")
        .join(F.broadcast(colsm), "priority")
        .crossJoin(F.broadcast(tot))
    )
    diff = F.col("n") * F.col("o") - F.col("r") * F.col("c")
    return full.select(
        "segment",
        "priority",
        F.col("o").cast("long").alias("n_obs"),
        F.round(
            (F.col("r") * F.col("c")).cast("double") / F.col("n").cast("double"), 6
        ).alias("n_expected"),
        F.round(
            (diff * diff).cast("double")
            / (F.col("n") * F.col("r") * F.col("c")).cast("double"),
            6,
        ).alias("chi_term"),
    ).orderBy("segment", "priority")


ORACLE_SQL["segment_priority_association"] = """
    WITH j AS (
      SELECT c_mktsegment AS segment, o_orderpriority AS priority
      FROM orders JOIN customer ON o_custkey = c_custkey
    ),
    cells AS (
      SELECT segment, priority, CAST(count(*) AS BIGINT) AS o
      FROM j GROUP BY 1, 2
    ),
    rows_m AS (SELECT segment, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY 1),
    cols_m AS (SELECT priority, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY 1),
    tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells)
    SELECT cells.segment, cells.priority, o AS n_obs,
           round(CAST(r * c AS DOUBLE) / CAST(n AS DOUBLE), 6) AS n_expected,
           round(CAST((n * o - r * c) * (n * o - r * c) AS DOUBLE)
                 / CAST(n * r * c AS DOUBLE), 6) AS chi_term
    FROM cells
    JOIN rows_m ON cells.segment = rows_m.segment
    JOIN cols_m ON cells.priority = cols_m.priority
    CROSS JOIN tot
    ORDER BY cells.segment, cells.priority
"""
QUERIES["segment_priority_association"] = q_segment_priority_association


def q_priority_transition_matrix(spark, sf_dir):
    """First-order Markov transition matrix over each customer's
    successive order priorities (the sequence-behavior model; the event
    sibling is event_transitions): lag window per customer ordered by
    (o_orderdate, o_orderkey), exact transition counts, row-stochastic
    probabilities as ONE division each.  Scale: one custkey shuffle,
    O(1) frames, model-sized matrix out."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority"
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    trans = o.select(
        F.lag("o_orderpriority").over(w).alias("from_priority"),
        F.col("o_orderpriority").alias("to_priority"),
    ).filter(F.col("from_priority").isNotNull())
    cells = trans.groupBy("from_priority", "to_priority").agg(
        F.count(F.lit(1)).alias("n")
    )
    rows = cells.groupBy("from_priority").agg(F.sum("n").alias("row_n"))
    return (
        cells.join(F.broadcast(rows), "from_priority")
        .select(
            "from_priority",
            "to_priority",
            F.col("n").cast("long").alias("n"),
            F.round(
                F.col("n").cast("double") / F.col("row_n").cast("double"), 6
            ).alias("prob"),
        )
        .orderBy("from_priority", "to_priority")
    )


ORACLE_SQL["priority_transition_matrix"] = """
    WITH trans AS (
      SELECT lag(o_orderpriority) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
               AS from_priority,
             o_orderpriority AS to_priority
      FROM orders
    ),
    cells AS (
      SELECT from_priority, to_priority, CAST(count(*) AS BIGINT) AS n
      FROM trans WHERE from_priority IS NOT NULL GROUP BY 1, 2
    ),
    rows_m AS (
      SELECT from_priority, CAST(sum(n) AS BIGINT) AS row_n
      FROM cells GROUP BY 1
    )
    SELECT cells.from_priority, to_priority, n,
           round(CAST(n AS DOUBLE) / CAST(row_n AS DOUBLE), 6) AS prob
    FROM cells JOIN rows_m ON cells.from_priority = rows_m.from_priority
    ORDER BY cells.from_priority, to_priority
"""
QUERIES["priority_transition_matrix"] = q_priority_transition_matrix


def q_monthly_revenue_mom(spark, sf_dir):
    """Month-over-month revenue growth: exact cents per month, lag window
    over the model-sized month table, growth = ONE division (null for
    the first month) — the KPI delta series every revenue dashboard
    leads with.  Scale: one month-grain aggregate (map-side partials);
    the window runs over O(months) rows."""
    o = _t(spark, sf_dir, "orders").select(
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    per = o.groupBy("month").agg(
        F.count(F.lit(1)).alias("n_orders"), F.sum("cents").alias("rev")
    )
    w = Window.orderBy("month")
    prev = F.lag("rev").over(w)
    return per.select(
        "month",
        F.col("n_orders").cast("long").alias("n_orders"),
        F.col("rev").cast("long").alias("revenue_cents"),
        F.round(
            (F.col("rev") - prev).cast("double") / prev.cast("double"), 6
        ).alias("mom_growth"),
    ).orderBy("month")


ORACLE_SQL["monthly_revenue_mom"] = """
    WITH per AS (
      SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
               AS rev
      FROM orders GROUP BY 1
    )
    SELECT month, n_orders, rev AS revenue_cents,
           round(CAST(rev - lag(rev) OVER (ORDER BY month) AS DOUBLE)
                 / CAST(lag(rev) OVER (ORDER BY month) AS DOUBLE), 6)
             AS mom_growth
    FROM per ORDER BY month
"""
QUERIES["monthly_revenue_mom"] = q_monthly_revenue_mom


def q_join_skew_diagnosis(spark, sf_dir):
    """Join-key skew diagnosis — the pre-flight check before any big
    equi-join (the runtime mitigation is skew_salted_join / AQE): the
    l_suppkey frequency profile reduced to key count, max rows per key,
    mean rows per key, the skew factor max/mean, and the hottest key
    (arg-max with a min-key tie-break, exact).  All counts exact;
    the two ratios are single divisions.  Scale: one key-count shuffle
    + a 1-row fold — the diagnostic costs one pass."""
    li = _t(spark, sf_dir, "lineitem").select("l_suppkey")
    counts = li.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("cnt"))
    mx = counts.agg(F.max("cnt").alias("mx"))
    agg = counts.crossJoin(F.broadcast(mx)).agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("total"),
        F.max("cnt").alias("max_rows"),
        F.min(
            F.when(F.col("cnt") == F.col("mx"), F.col("l_suppkey"))
        ).alias("hottest_key"),
    )
    return agg.select(
        F.col("n_keys").cast("long").alias("n_keys"),
        F.col("total").cast("long").alias("n_rows"),
        F.col("max_rows").cast("long").alias("max_rows_per_key"),
        F.round(
            F.col("total").cast("double") / F.col("n_keys").cast("double"), 6
        ).alias("mean_rows_per_key"),
        F.round(
            (F.col("max_rows") * F.col("n_keys")).cast("double")
            / F.col("total").cast("double"),
            6,
        ).alias("skew_factor"),
        F.col("hottest_key").cast("long").alias("hottest_key"),
    )


ORACLE_SQL["join_skew_diagnosis"] = """
    WITH counts AS (
      SELECT l_suppkey, CAST(count(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY 1
    ),
    m AS (SELECT max(cnt) AS mx FROM counts)
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(cnt) AS BIGINT) AS n_rows,
           CAST(max(cnt) AS BIGINT) AS max_rows_per_key,
           round(CAST(sum(cnt) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
             AS mean_rows_per_key,
           round(CAST(max(cnt) * count(*) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE), 6)
             AS skew_factor,
           CAST(min(CASE WHEN cnt = (SELECT mx FROM m) THEN l_suppkey END)
                AS BIGINT) AS hottest_key
    FROM counts
"""
QUERIES["join_skew_diagnosis"] = q_join_skew_diagnosis


# --- round-6 widening wave 12: langid eval, layout balance, cohort LTV ----


def q_langid_confusion_matrix(spark, sf_dir):
    """Confusion matrix of the certified marker-based language identifier
    against the fixture's true lang label — the classifier-eval artifact
    (per (actual, predicted) counts and the within-actual share, one
    exact division per cell).  Reuses the language_scores operator the
    text_langid key certifies per-document, so this key certifies its
    AGGREGATE behavior: precision/recall per language are one fold away.
    Scale: row-local scoring, model-sized matrix aggregate."""
    from parquet_merger_spark.operators.textstats import language_scores

    d = _t(spark, sf_dir, "documents")
    pred = language_scores(d).select(
        F.col("lang").alias("actual"), F.col("predicted_lang").alias("predicted")
    )
    cells = pred.groupBy("actual", "predicted").agg(
        F.count(F.lit(1)).alias("n")
    )
    rows = cells.groupBy("actual").agg(F.sum("n").alias("row_n"))
    return (
        cells.join(F.broadcast(rows), "actual")
        .select(
            "actual",
            "predicted",
            F.col("n").cast("long").alias("n_docs"),
            F.round(
                F.col("n").cast("double") / F.col("row_n").cast("double"), 6
            ).alias("actual_share"),
        )
        .orderBy("actual", "predicted")
    )


ORACLE_SQL["langid_confusion_matrix"] = f"""
    WITH pred AS ({_langid_sql()}),
    j AS (
      SELECT d.lang AS actual, p.predicted_lang AS predicted
      FROM documents d JOIN pred p ON d.doc_id = p.doc_id
    ),
    cells AS (
      SELECT actual, predicted, CAST(count(*) AS BIGINT) AS n
      FROM j GROUP BY 1, 2
    ),
    rows_m AS (SELECT actual, CAST(sum(n) AS BIGINT) AS row_n FROM cells GROUP BY 1)
    SELECT cells.actual, predicted, n AS n_docs,
           round(CAST(n AS DOUBLE) / CAST(row_n AS DOUBLE), 6) AS actual_share
    FROM cells JOIN rows_m ON cells.actual = rows_m.actual
    ORDER BY cells.actual, predicted
"""
QUERIES["langid_confusion_matrix"] = q_langid_confusion_matrix


def q_partition_balance_report(spark, sf_dir):
    """Layout pre-flight: how evenly a candidate hash partitioning spreads
    rows — lineitem keyed by portable_hash(l_orderkey) mod 32, reduced
    to bucket census, min/max/mean rows per bucket, and the imbalance
    factor max*buckets/total (1.0 = perfectly even; the number that
    predicts straggler tasks before a 100 TB shuffle is paid).  The
    hash is the repo's portable universal hash, so the report is
    engine-reproducible bit-for-bit.  Scale: one 32-group aggregate
    with map-side partials; the diagnostic costs one narrow pass."""
    from parquet_merger_spark.operators.sketches import portable_hash64

    li = _t(spark, sf_dir, "lineitem").select(
        F.pmod(portable_hash64(F.col("l_orderkey"), 6), F.lit(32)).alias("bucket")
    )
    per = li.groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt"))
    return per.agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum("cnt").cast("long").alias("n_rows"),
        F.min("cnt").cast("long").alias("min_rows"),
        F.max("cnt").cast("long").alias("max_rows"),
        F.round(
            F.sum("cnt").cast("double") / F.count(F.lit(1)).cast("double"), 6
        ).alias("mean_rows"),
        F.round(
            (F.max("cnt") * F.count(F.lit(1))).cast("double")
            / F.sum("cnt").cast("double"),
            6,
        ).alias("imbalance_factor"),
    )


ORACLE_SQL["partition_balance_report"] = """
    WITH per AS (
      SELECT ((934586471 * (l_orderkey % 1000000007) + 86420147)
              % 1000000007) % 32 AS bucket,
             CAST(count(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(sum(cnt) AS BIGINT) AS n_rows,
           CAST(min(cnt) AS BIGINT) AS min_rows,
           CAST(max(cnt) AS BIGINT) AS max_rows,
           round(CAST(sum(cnt) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
             AS mean_rows,
           round(CAST(max(cnt) * count(*) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE), 6)
             AS imbalance_factor
    FROM per
"""
QUERIES["partition_balance_report"] = q_partition_balance_report


def q_cohort_ltv(spark, sf_dir):
    """Cohort lifetime-value curve: users cohorted by first-event day
    (the fixture's events span weeks, so day grain is the informative
    one; at month-spanning scale swap the 86400 bucket for a month
    index unchanged);
    per (cohort, age-in-days) exact revenue cents, cumulative
    revenue, and LTV per cohort user — the growth-analytics artifact
    (the retention sibling counts users; this one follows the money).
    Day arithmetic is integer epoch-day bucketing, revenue folds as
    exact cents, the cumulative window runs over the model-sized
    (cohort, age) table, and LTV is ONE division.  Scale: one user
    shuffle for the cohort map (broadcast back), one (cohort, age)
    aggregate."""
    e = _events(spark, sf_dir).select(
        "user_id",
        (F.col("ts").cast("long") - F.pmod(F.col("ts").cast("long"), 86400))
        .alias("didx"),
        F.date_format("ts", "yyyy-MM-dd").alias("dstr"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    cohort = e.groupBy("user_id").agg(
        F.min("didx").alias("cidx"), F.min("dstr").alias("cohort_day")
    )
    sizes = cohort.groupBy("cohort_day").agg(
        F.countDistinct("user_id").alias("n_users")
    )
    j = e.join(F.broadcast(cohort), "user_id").select(
        "cohort_day",
        ((F.col("didx") - F.col("cidx")) / 86400).cast("long").alias("age_days"),
        "cents",
    )
    per = j.groupBy("cohort_day", "age_days").agg(
        F.sum("cents").alias("rev")
    )
    w = (
        Window.partitionBy("cohort_day")
        .orderBy("age_days")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = per.select(
        "cohort_day", "age_days", "rev", F.sum("rev").over(w).alias("cum_rev")
    )
    return (
        cum.join(F.broadcast(sizes), "cohort_day")
        .select(
            "cohort_day",
            F.col("age_days").cast("long").alias("age_days"),
            F.col("n_users").cast("long").alias("n_users"),
            F.col("rev").cast("long").alias("revenue_cents"),
            F.col("cum_rev").cast("long").alias("cum_revenue_cents"),
            F.round(
                F.col("cum_rev").cast("double")
                / (F.lit(100.0) * F.col("n_users").cast("double")),
                6,
            ).alias("ltv_per_user"),
        )
        .orderBy("cohort_day", "age_days")
    )


ORACLE_SQL["cohort_ltv"] = """
    WITH e AS (
      SELECT user_id,
             CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
               - CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) % 86400
               AS didx,
             strftime(CAST(ts AS DATE), '%Y-%m-%d') AS dstr,
             CAST(round(value * 100, 0) AS BIGINT) AS cents
      FROM events
    ),
    cohort AS (
      SELECT user_id, min(didx) AS cidx, min(dstr) AS cohort_day
      FROM e GROUP BY 1
    ),
    sizes AS (
      SELECT cohort_day, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      FROM cohort GROUP BY 1
    ),
    per AS (
      SELECT cohort_day, (e.didx - c.cidx) // 86400 AS age_days,
             CAST(sum(cents) AS BIGINT) AS rev
      FROM e JOIN cohort c ON e.user_id = c.user_id
      GROUP BY 1, 2
    ),
    cum AS (
      SELECT cohort_day, age_days, rev,
             CAST(sum(rev) OVER (PARTITION BY cohort_day ORDER BY age_days)
                  AS BIGINT) AS cum_rev
      FROM per
    )
    SELECT cum.cohort_day, age_days, n_users, rev AS revenue_cents,
           cum_rev AS cum_revenue_cents,
           round(CAST(cum_rev AS DOUBLE) / (100.0 * CAST(n_users AS DOUBLE)), 6)
             AS ltv_per_user
    FROM cum JOIN sizes ON cum.cohort_day = sizes.cohort_day
    ORDER BY cum.cohort_day, age_days
"""
QUERIES["cohort_ltv"] = q_cohort_ltv


# --- round-6 widening wave 13: Heaps' law, dup curve, weights, conversion --


def q_heaps_vocab_growth(spark, sf_dir):
    """Heaps'-law vocabulary growth curve in ONE corpus pass: each
    token's FIRST document (min doc_id) is folded once; the vocabulary
    size at every doc-count decile is then a count of tokens whose
    first document precedes the decile boundary — no prefix re-scans
    (the naive formulation scans the corpus once per checkpoint).
    Decile boundaries are exact rank selections over the doc_id count
    table (rank = (n-1)*k div 10 + 1).  All counts exact.  Scale: one
    token shuffle for the min fold, a model-sized boundary broadcast,
    one 10-group aggregate."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    first = toks.groupBy("token").agg(F.min("doc_id").alias("first_doc"))
    ids = d.select("doc_id")
    # bucketed two-phase ranking, NOT row_number() over an unpartitioned
    # window: the global-sort variant funnels every doc_id through one
    # task — the exact pathology the engine red-lines elsewhere (ranks
    # identical by construction; doc_id is the unique total order)
    from parquet_merger_spark.operators.ranking import assign_row_ids

    ranked = assign_row_ids(ids, "doc_id", [], n_buckets=32).select(
        "doc_id", F.col("row_id").alias("rk")
    )
    n = ids.agg(F.count(F.lit(1)).alias("n"))
    bounds = (
        ranked.crossJoin(F.broadcast(n))
        .join(
            spark.range(1, 11).select(F.col("id").cast("int").alias("decile")),
            F.expr("rk = ((n - 1) * decile) div 10 + 1"),
        )
        .select("decile", F.col("doc_id").alias("boundary_doc"), F.col("rk").alias("n_docs"))
    )
    return (
        first.crossJoin(F.broadcast(bounds))
        .filter(F.col("first_doc") <= F.col("boundary_doc"))
        .groupBy("decile", "boundary_doc", "n_docs")
        .agg(F.count(F.lit(1)).alias("vocab_size"))
        .select(
            F.col("decile").cast("long").alias("decile"),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("boundary_doc").cast("long").alias("boundary_doc"),
            F.col("vocab_size").cast("long").alias("vocab_size"),
        )
        .orderBy("decile")
    )


ORACLE_SQL["heaps_vocab_growth"] = """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    first AS (
      SELECT token, CAST(min(doc_id) AS BIGINT) AS first_doc
      FROM toks GROUP BY 1
    ),
    ranked AS (
      SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS rk FROM documents
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
    bounds AS (
      SELECT t.decile, ranked.doc_id AS boundary_doc,
             CAST(rk AS BIGINT) AS n_docs
      FROM ranked CROSS JOIN n
      JOIN (SELECT CAST(unnest(range(1, 11)) AS INTEGER) AS decile) t
        ON rk = ((n.n - 1) * t.decile) // 10 + 1
    )
    SELECT CAST(decile AS BIGINT) AS decile, n_docs, boundary_doc,
           CAST(count(*) AS BIGINT) AS vocab_size
    FROM first CROSS JOIN bounds
    WHERE first_doc <= boundary_doc
    GROUP BY 1, 2, 3
    ORDER BY 1
"""
QUERIES["heaps_vocab_growth"] = q_heaps_vocab_growth


def q_near_dup_threshold_curve(spark, sf_dir):
    """Near-duplicate PAIR COUNT as a function of the Jaccard threshold —
    the calibration curve read before choosing a dedup cutoff: word-
    2-gram Jaccard pairs banded by EXACT integer division
    ((10*inter) div union, so a pair sitting exactly on a band edge
    lands identically in every engine), counted per band >= 0.1.
    VERIFICATION TIER like dedup_ngram_jaccard: the inverted-index
    gram equi-join is the exact path; at 100 TB the curve is computed
    on LSH candidates instead (same banding downstream).  Scale: one
    gram-keyed shuffle; posting lists bound the pair fan-out."""
    d = _t(spark, sf_dir, "documents")
    # r10: the gram sets ride the HASHED-shingle kernel (xxhash64 token
    # chain — the same identity contract as dedup_ngram_jaccard: set
    # operations over distinct gram hashes equal string-gram set
    # operations up to ~2^-64 collisions, and only COUNTS leave this
    # query).  The old form built string bigrams inline and the aliased
    # self-join + sizes aggregate re-ran that build THREE times (aliased
    # projections defeat ReuseExchange); now the per-doc distinct happens
    # row-locally inside the array (no corpus-wide distinct shuffle),
    # sizes are F.size() lookups instead of a groupBy, the build is
    # fan_out-parallel, and the persisted table is narrow longs.
    from parquet_merger_spark.operators.dedup import (
        _distinct_shingle_hashes,
        tokens_col,
    )

    sh_t = (
        _distinct_shingle_hashes(
            d.filter(F.size(tokens_col("text")) >= 2), "doc_id", "text", 2
        )
        .select("doc_id", "sh_hashes", F.size("sh_hashes").alias("n"))
        .persist()
    )
    sh_t.count()  # barrier: both self-join sides + the size projections
    inv = sh_t.select("doc_id", F.explode("sh_hashes").alias("gram"))
    a = inv.alias("a")
    b = inv.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("sh"))
    )
    sa = sh_t.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na"))
    sb = sh_t.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb"))
    j = shared.join(F.broadcast(sa), "id_a").join(F.broadcast(sb), "id_b")
    banded = j.select(
        F.expr("(10 * sh) div (na + nb - sh)").alias("band")
    ).filter(F.col("band") >= 1)
    return (
        banded.groupBy("band")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .select(
            F.round(F.col("band").cast("double") / 10, 1).alias("threshold"),
            F.col("n_pairs").cast("long").alias("n_pairs"),
        )
        .orderBy("threshold")
    )


ORACLE_SQL["near_dup_threshold_curve"] = """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS tk FROM documents
    ),
    g AS (
      SELECT DISTINCT doc_id,
             unnest(CASE WHEN len(tk) >= 2
                         THEN list_transform(range(1, len(tk)),
                                             i -> tk[i] || ' ' || tk[i+1])
                         ELSE [] END) AS gram
      FROM toks
    ),
    sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM g GROUP BY 1),
    shared AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS sh
      FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    banded AS (
      SELECT (10 * sh) // (sa.n + sb.n - sh) AS band
      FROM shared
      JOIN sz sa ON sa.doc_id = id_a
      JOIN sz sb ON sb.doc_id = id_b
    )
    SELECT round(CAST(band AS DOUBLE) / 10, 1) AS threshold,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM banded WHERE band >= 1
    GROUP BY band ORDER BY threshold
"""
QUERIES["near_dup_threshold_curve"] = q_near_dup_threshold_curve


def q_class_balance_weights(spark, sf_dir):
    """Inverse-frequency class weights over the embedding labels — the
    loss-reweighting table handed to any classifier trained on an
    imbalanced corpus: w_c = n_total / (k * n_c), exact counts, ONE
    division per class.  Scale: a model-sized label aggregate."""
    e = _t(spark, sf_dir, "embeddings")
    per = e.groupBy("label").agg(F.count(F.lit(1)).alias("n_c"))
    tot = per.agg(
        F.sum("n_c").alias("n"), F.count(F.lit(1)).alias("k")
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "label",
            F.col("n_c").cast("long").alias("n_vectors"),
            F.round(
                F.col("n").cast("double")
                / (F.col("k") * F.col("n_c")).cast("double"),
                6,
            ).alias("weight"),
        )
        .orderBy("label")
    )


ORACLE_SQL["class_balance_weights"] = """
    WITH per AS (
      SELECT label, CAST(count(*) AS BIGINT) AS n_c FROM embeddings GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(n_c) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS k
      FROM per
    )
    SELECT label, n_c AS n_vectors,
           round(CAST(n AS DOUBLE) / CAST(k * n_c AS DOUBLE), 6) AS weight
    FROM per CROSS JOIN tot
    ORDER BY label
"""
QUERIES["class_balance_weights"] = q_class_balance_weights


def q_time_to_first_purchase(spark, sf_dir):
    """Conversion-lag summary: per user, seconds from first event to
    first purchase; reduced to conversion rate, median and p90 lag via
    EXACT rank selection over the lag count table (no row sort), plus
    the unconverted population — the activation-funnel headline
    numbers.  All time arithmetic integer epoch seconds; rate is ONE
    division.  Scale: one user aggregate, one count-table window."""
    e = _events(spark, sf_dir).select(
        "user_id",
        F.col("ts").cast("long").alias("epoch"),
        "event_type",
    )
    per = e.groupBy("user_id").agg(
        F.min("epoch").alias("t0"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("epoch"))).alias(
            "tp"
        ),
    )
    lags = per.select((F.col("tp") - F.col("t0")).alias("lag"))
    counts = (
        lags.filter(F.col("lag").isNotNull())
        .groupBy("lag")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.orderBy("lag")
    cum = counts.select("lag", "cnt", F.sum("cnt").over(w).alias("cum"))
    tot = counts.agg(F.sum("cnt").alias("nc"))
    cj = cum.crossJoin(F.broadcast(tot))
    med = cj.filter(
        (F.col("cum") - F.col("cnt") < F.expr("(nc - 1) div 2 + 1"))
        & (F.expr("(nc - 1) div 2 + 1") <= F.col("cum"))
    ).agg(F.min("lag").alias("median_lag_s"))
    p90 = cj.filter(
        (F.col("cum") - F.col("cnt") < F.expr("((nc - 1) * 9) div 10 + 1"))
        & (F.expr("((nc - 1) * 9) div 10 + 1") <= F.col("cum"))
    ).agg(F.min("lag").alias("p90_lag_s"))
    users = per.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.when(F.col("tp").isNotNull(), 1).otherwise(0)).alias("n_converted"),
    )
    return (
        users.crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(p90))
        .select(
            F.col("n_users").cast("long").alias("n_users"),
            F.col("n_converted").cast("long").alias("n_converted"),
            F.round(
                F.col("n_converted").cast("double") / F.col("n_users").cast("double"),
                6,
            ).alias("conversion_rate"),
            F.col("median_lag_s").cast("long").alias("median_lag_s"),
            F.col("p90_lag_s").cast("long").alias("p90_lag_s"),
        )
    )


ORACLE_SQL["time_to_first_purchase"] = """
    WITH per AS (
      SELECT user_id,
             min(CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)) AS t0,
             min(CASE WHEN event_type = 'purchase'
                      THEN CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
                 END) AS tp
      FROM events GROUP BY 1
    ),
    counts AS (
      SELECT tp - t0 AS lag, CAST(count(*) AS BIGINT) AS cnt
      FROM per WHERE tp IS NOT NULL GROUP BY 1
    ),
    cum AS (
      SELECT lag, cnt, CAST(sum(cnt) OVER (ORDER BY lag) AS BIGINT) AS cum
      FROM counts
    ),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS nc FROM counts),
    med AS (
      SELECT min(lag) AS median_lag_s FROM cum CROSS JOIN tot
      WHERE cum - cnt < (nc - 1) // 2 + 1 AND (nc - 1) // 2 + 1 <= cum
    ),
    p90 AS (
      SELECT min(lag) AS p90_lag_s FROM cum CROSS JOIN tot
      WHERE cum - cnt < ((nc - 1) * 9) // 10 + 1
        AND ((nc - 1) * 9) // 10 + 1 <= cum
    ),
    users AS (
      SELECT CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_converted
      FROM per
    )
    SELECT n_users, n_converted,
           round(CAST(n_converted AS DOUBLE) / CAST(n_users AS DOUBLE), 6)
             AS conversion_rate,
           median_lag_s, p90_lag_s
    FROM users CROSS JOIN med CROSS JOIN p90
"""
QUERIES["time_to_first_purchase"] = q_time_to_first_purchase


def q_stream_benford_audit(spark, sf_dir):
    """STREAMING Benford monitor driven end-to-end: orders replay in
    three mtime-pinned micro-batches; the first-digit counter table is
    a complete-mode streaming aggregation with state bounded at NINE
    rows BY CONSTRUCTION; after the drain, the chi-square audit table
    is derived from the STREAMED counts alone (total n = their sum) and
    certified bit-for-bit by the batch twin's oracle
    (``benford_digit_audit``) — counters add, so stream == batch.  The
    100 TB shape: a fraud/synthetic-data alarm maintained continuously
    in 9 rows of state, no rescan ever."""
    import shutil
    import uuid

    from parquet_merger_spark.streaming.events import digit_counts_stream

    base = _scratch_dir(spark, "stream_benford_audit")
    shutil.rmtree(base, ignore_errors=True)

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    slices = [o.filter(F.col("o_orderkey") % 3 == i) for i in range(3)]
    src = _write_replay_batches(base, slices)

    name = f"sben_{uuid.uuid4().hex[:8]}"
    q = digit_counts_stream(
        spark, src, os.path.join(base, "ckpt"), query_name=name
    )
    _drain_stream(q, "stream_benford_audit")
    obs = spark.table(name).transform(materialize)

    ben = _benford_expected(spark)
    total = obs.agg(F.sum("n_obs").alias("n"))
    j = (
        ben.join(obs, "digit", "left")
        .na.fill({"n_obs": 0})
        .crossJoin(F.broadcast(total))
    )
    expected = F.col("n").cast("double") * F.col("expected_share")
    diff = F.col("n_obs").cast("double") - expected
    return j.select(
        "digit",
        F.col("n_obs").cast("long").alias("n_obs"),
        "expected_share",
        F.round(diff * diff / expected, 6).alias("chi_term"),
    ).orderBy("digit")


ORACLE_SQL["stream_benford_audit"] = ORACLE_SQL["benford_digit_audit"]
QUERIES["stream_benford_audit"] = q_stream_benford_audit


# --- round-6 widening wave 13b: safety filter + dedup savings audits ------


def q_blocklist_filter_stats(spark, sf_dir):
    """Safety/blocklist filtering audit — the policy-filter pass of a
    pre-training pipeline: per crawl source, documents flagged by a
    term blocklist (token-level exact match, case-sensitive by
    contract), total hits, flag rate, and survivor count.  The
    blocklist rides as a broadcast literal array (at production scale,
    a broadcast dimension table); matching is row-local JVM array
    intersection — no shuffle beyond the per-source aggregate, no
    regex in the hot path.  Counts exact; the rate is ONE division."""
    blocklist = ["slow", "skew", "spill"]
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    hits = F.size(F.array_intersect(toks, F.array(*[F.lit(t) for t in blocklist])))
    # hits counts DISTINCT blocked terms present; total occurrences need
    # the filter-count form, which is what a hit-weighted policy wants
    occ = F.size(
        F.filter(
            toks,
            lambda t: t.isin(blocklist),
        )
    )
    per = d.select("source", hits.alias("h"), occ.alias("occ")).groupBy(
        "source"
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("h") > 0, 1).otherwise(0)).alias("n_flagged"),
        F.sum("occ").alias("total_hits"),
    )
    return per.select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_flagged").cast("long").alias("n_flagged"),
        F.col("total_hits").cast("long").alias("total_hits"),
        (F.col("n_docs") - F.col("n_flagged")).cast("long").alias("n_survivors"),
        F.round(
            F.col("n_flagged").cast("double") / F.col("n_docs").cast("double"), 6
        ).alias("flag_rate"),
    ).orderBy("source")


ORACLE_SQL["blocklist_filter_stats"] = """
    WITH scored AS (
      SELECT source,
             len(list_intersect(string_split(text, ' '),
                                ['slow', 'skew', 'spill'])) AS h,
             len(list_filter(string_split(text, ' '),
                             t -> list_contains(['slow', 'skew', 'spill'], t)))
               AS occ
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN h > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
           CAST(sum(occ) AS BIGINT) AS total_hits,
           CAST(count(*) - sum(CASE WHEN h > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_survivors,
           round(CAST(sum(CASE WHEN h > 0 THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE), 6) AS flag_rate
    FROM scored GROUP BY 1 ORDER BY 1
"""
QUERIES["blocklist_filter_stats"] = q_blocklist_filter_stats


def q_dedup_savings_report(spark, sf_dir):
    """Dedup SAVINGS accounting — the number a storage/training budget
    actually asks for: under keep-first-per-template-family survivor
    policy (the prefix_cluster_histogram families), per source: docs
    dropped, characters dropped, and the char savings rate.  Survivor =
    min doc_id per family (deterministic, the exact_dedup policy);
    everything folds as exact int64; the rate is ONE division.  Scale:
    one family-key shuffle, a survivor broadcast-join back, one
    per-source aggregate."""
    d = _t(spark, sf_dir, "documents")
    pfx = F.array_join(F.slice(F.split(F.col("text"), " "), 1, 2), " ")
    base = d.select("doc_id", "source", "n_chars", pfx.alias("pfx"))
    surv = base.groupBy("pfx").agg(F.min("doc_id").alias("keep_id"))
    j = base.join(surv, "pfx").select(
        "source",
        "n_chars",
        (F.col("doc_id") != F.col("keep_id")).cast("int").alias("dropped"),
    )
    per = j.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dropped").alias("n_dropped"),
        F.sum("n_chars").alias("chars_total"),
        F.sum(F.col("n_chars") * F.col("dropped")).alias("chars_dropped"),
    )
    return per.select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_dropped").cast("long").alias("n_dropped"),
        F.col("chars_total").cast("long").alias("chars_total"),
        F.col("chars_dropped").cast("long").alias("chars_dropped"),
        F.round(
            F.col("chars_dropped").cast("double") / F.col("chars_total").cast("double"),
            6,
        ).alias("savings_rate"),
    ).orderBy("source")


ORACLE_SQL["dedup_savings_report"] = """
    WITH base AS (
      SELECT doc_id, source, n_chars,
             array_to_string(string_split(text, ' ')[1:2], ' ') AS pfx
      FROM documents
    ),
    surv AS (SELECT pfx, min(doc_id) AS keep_id FROM base GROUP BY 1)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN doc_id != keep_id THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dropped,
           CAST(sum(n_chars) AS BIGINT) AS chars_total,
           CAST(sum(CASE WHEN doc_id != keep_id THEN n_chars ELSE 0 END)
                AS BIGINT) AS chars_dropped,
           round(CAST(sum(CASE WHEN doc_id != keep_id THEN n_chars ELSE 0 END)
                      AS DOUBLE)
                 / CAST(sum(n_chars) AS DOUBLE), 6) AS savings_rate
    FROM base JOIN surv USING (pfx)
    GROUP BY 1 ORDER BY 1
"""
QUERIES["dedup_savings_report"] = q_dedup_savings_report


# --- round-6 widening wave 14: backlog, lead time, RFM, label contrast ----


def q_open_order_backlog(spark, sf_dir):
    """Daily open-order backlog — the event-sourcing cumulative: orders
    placed per day minus orders fully shipped per day (an order
    completes when its LAST lineitem ships), cumulated over the unified
    day axis.  All counts exact; the windows run over the model-sized
    day table (O(days) at any corpus size).  Scale: one per-order max
    aggregate (orderkey shuffle), two day-grain aggregates, one
    full-outer day-axis merge."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("pday")
    )
    li = _t(spark, sf_dir, "lineitem").groupBy("l_orderkey").agg(
        F.date_format(F.max("l_shipdate"), "yyyy-MM-dd").alias("cday")
    )
    placed = o.groupBy(F.col("pday").alias("day")).agg(
        F.count(F.lit(1)).alias("n_placed")
    )
    completed = li.groupBy(F.col("cday").alias("day")).agg(
        F.count(F.lit(1)).alias("n_completed")
    )
    axis = placed.join(completed, "day", "full_outer").select(
        "day",
        F.coalesce("n_placed", F.lit(0)).alias("n_placed"),
        F.coalesce("n_completed", F.lit(0)).alias("n_completed"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return axis.select(
        "day",
        F.col("n_placed").cast("long").alias("n_placed"),
        F.col("n_completed").cast("long").alias("n_completed"),
        (F.sum("n_placed").over(w) - F.sum("n_completed").over(w))
        .cast("long")
        .alias("backlog"),
    ).orderBy("day")


ORACLE_SQL["open_order_backlog"] = """
    WITH placed AS (
      SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS day,
             CAST(count(*) AS BIGINT) AS n_placed
      FROM orders GROUP BY 1
    ),
    compl AS (
      SELECT strftime(CAST(max(l_shipdate) AS DATE), '%Y-%m-%d') AS day
      FROM lineitem GROUP BY l_orderkey
    ),
    completed AS (
      SELECT day, CAST(count(*) AS BIGINT) AS n_completed FROM compl GROUP BY 1
    ),
    axis AS (
      SELECT coalesce(placed.day, completed.day) AS day,
             coalesce(n_placed, 0) AS n_placed,
             coalesce(n_completed, 0) AS n_completed
      FROM placed FULL OUTER JOIN completed ON placed.day = completed.day
    )
    SELECT day, n_placed, n_completed,
           CAST(sum(n_placed) OVER (ORDER BY day)
                - sum(n_completed) OVER (ORDER BY day) AS BIGINT) AS backlog
    FROM axis ORDER BY day
"""
QUERIES["open_order_backlog"] = q_open_order_backlog


def q_supplier_lead_time(spark, sf_dir):
    """Per-supplier fulfilment lead time (order date -> line ship date,
    integer days): count, mean (one division) and EXACT median via the
    per-supplier count-table rank selection — the SLA scorecard.
    Sampled to 1-in-5 suppliers for the contract row; the operator is
    full-corpus.  Scale: one orderkey join, one (supplier, lag) count
    shuffle, count-table windows."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderdate").cast("timestamp").cast("long").alias("oe")
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") % 5 == 0).select(
        "l_orderkey",
        "l_suppkey",
        F.col("l_shipdate").cast("timestamp").cast("long").alias("se"),
    )
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_suppkey",
        ((F.col("se") - F.col("oe")) / 86400).cast("long").alias("lag_days"),
    )
    counts = j.groupBy("l_suppkey", "lag_days").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("l_suppkey").orderBy("lag_days")
    cum = counts.select(
        "l_suppkey", "lag_days", "cnt", F.sum("cnt").over(w).alias("cum")
    )
    tot = counts.groupBy("l_suppkey").agg(
        F.sum("cnt").alias("n"),
        F.sum(F.col("lag_days") * F.col("cnt")).alias("s"),
    )
    cj = cum.join(F.broadcast(tot), "l_suppkey")
    med = cj.filter(
        (F.col("cum") - F.col("cnt") < F.expr("(n - 1) div 2 + 1"))
        & (F.expr("(n - 1) div 2 + 1") <= F.col("cum"))
    ).groupBy("l_suppkey").agg(F.min("lag_days").alias("median_lag_days"))
    return (
        tot.join(F.broadcast(med), "l_suppkey")
        .select(
            F.col("l_suppkey").alias("suppkey"),
            F.col("n").cast("long").alias("n_lines"),
            F.round(F.col("s").cast("double") / F.col("n").cast("double"), 6).alias(
                "mean_lag_days"
            ),
            F.col("median_lag_days").cast("long").alias("median_lag_days"),
        )
        .orderBy("suppkey")
    )


ORACLE_SQL["supplier_lead_time"] = """
    WITH j AS (
      SELECT l_suppkey,
             (CAST(FLOOR(epoch(CAST(l_shipdate AS TIMESTAMP))) AS BIGINT)
              - CAST(FLOOR(epoch(o_orderdate)) AS BIGINT)) // 86400 AS lag_days
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_suppkey % 5 = 0
    ),
    counts AS (
      SELECT l_suppkey, lag_days, CAST(count(*) AS BIGINT) AS cnt
      FROM j GROUP BY 1, 2
    ),
    cum AS (
      SELECT l_suppkey, lag_days, cnt,
             CAST(sum(cnt) OVER (PARTITION BY l_suppkey ORDER BY lag_days)
                  AS BIGINT) AS cum
      FROM counts
    ),
    tot AS (
      SELECT l_suppkey, CAST(sum(cnt) AS BIGINT) AS n,
             CAST(sum(lag_days * cnt) AS BIGINT) AS s
      FROM counts GROUP BY 1
    ),
    med AS (
      SELECT cum.l_suppkey, min(lag_days) AS median_lag_days
      FROM cum JOIN tot ON cum.l_suppkey = tot.l_suppkey
      WHERE cum - cnt < (n - 1) // 2 + 1 AND (n - 1) // 2 + 1 <= cum
      GROUP BY 1
    )
    SELECT tot.l_suppkey AS suppkey, n AS n_lines,
           round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_lag_days,
           median_lag_days
    FROM tot JOIN med ON tot.l_suppkey = med.l_suppkey
    ORDER BY suppkey
"""
QUERIES["supplier_lead_time"] = q_supplier_lead_time


def q_rfm_segments(spark, sf_dir):
    """RFM segmentation census: per customer, Recency (days from last
    order to the corpus max date), Frequency (orders) and Monetary
    (exact cents) each band into terciles by count-table rank
    boundaries (band = 1 + (v > b1) + (v > b2), ties deterministic),
    and the 27-cell segment census reports customers and revenue —
    the classic growth segmentation, exact end to end.  Scale: one
    custkey aggregate, three model-sized boundary selections (each a
    count-table window), one census aggregate."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.col("o_orderdate").cast("timestamp").cast("long").alias("oe"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    mx = o.agg(F.max("oe").alias("mxe"))
    per = (
        o.crossJoin(F.broadcast(mx))
        .groupBy("o_custkey")
        .agg(
            ((F.max("oe") - F.max("mxe")) / -86400).cast("long").alias("r"),
            F.count(F.lit(1)).alias("f"),
            F.sum("cents").alias("m"),
        )
        # the RFM table feeds SEVEN subtrees (six boundary selections +
        # the banding pass) — checkpoint once or the customer aggregate
        # recomputes per consumer (plan-digested at 26 exchanges)
        .transform(materialize)
    )

    def tercile_bounds(col):
        counts = per.groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))
        w = Window.orderBy(col)
        cum = counts.select(
            F.col(col).alias("v"), "cnt", F.sum("cnt").over(w).alias("cum")
        )
        tot = counts.agg(F.sum("cnt").alias("n"))
        cj = cum.crossJoin(F.broadcast(tot))
        r1 = F.expr("(n - 1) div 3 + 1")
        r2 = F.expr("((n - 1) * 2) div 3 + 1")
        # both boundaries in ONE count-table pass
        return cj.agg(
            F.min(
                F.when(
                    (F.col("cum") - F.col("cnt") < r1) & (r1 <= F.col("cum")),
                    F.col("v"),
                )
            ).alias(f"{col}_b1"),
            F.min(
                F.when(
                    (F.col("cum") - F.col("cnt") < r2) & (r2 <= F.col("cum")),
                    F.col("v"),
                )
            ).alias(f"{col}_b2"),
        )

    bounds = (
        tercile_bounds("r").crossJoin(tercile_bounds("f")).crossJoin(tercile_bounds("m"))
    )
    banded = per.crossJoin(F.broadcast(bounds)).select(
        (
            F.lit(1)
            + (F.col("r") > F.col("r_b1")).cast("int")
            + (F.col("r") > F.col("r_b2")).cast("int")
        ).alias("r_band"),
        (
            F.lit(1)
            + (F.col("f") > F.col("f_b1")).cast("int")
            + (F.col("f") > F.col("f_b2")).cast("int")
        ).alias("f_band"),
        (
            F.lit(1)
            + (F.col("m") > F.col("m_b1")).cast("int")
            + (F.col("m") > F.col("m_b2")).cast("int")
        ).alias("m_band"),
        "m",
    )
    return (
        banded.groupBy("r_band", "f_band", "m_band")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("m").alias("revenue_cents"),
        )
        .select(
            F.col("r_band").cast("long").alias("r_band"),
            F.col("f_band").cast("long").alias("f_band"),
            F.col("m_band").cast("long").alias("m_band"),
            F.col("n_customers").cast("long").alias("n_customers"),
            F.col("revenue_cents").cast("long").alias("revenue_cents"),
        )
        .orderBy("r_band", "f_band", "m_band")
    )


ORACLE_SQL["rfm_segments"] = """
    WITH o AS (
      SELECT o_custkey,
             CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) AS oe,
             CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
      FROM orders
    ),
    mx AS (SELECT max(oe) AS mxe FROM o),
    per AS (
      SELECT o_custkey,
             (mxe - max(oe)) // 86400 AS r,
             CAST(count(*) AS BIGINT) AS f,
             CAST(sum(cents) AS BIGINT) AS m
      FROM o CROSS JOIN mx GROUP BY o_custkey, mxe
    ),
    bnd AS (
      SELECT
        (SELECT min(v) FROM (
           SELECT v, cnt, CAST(sum(cnt) OVER (ORDER BY v) AS BIGINT) AS cum,
                  CAST(sum(cnt) OVER () AS BIGINT) AS n
           FROM (SELECT r AS v, CAST(count(*) AS BIGINT) AS cnt FROM per GROUP BY 1))
         WHERE cum - cnt < (n - 1) // 3 + 1 AND (n - 1) // 3 + 1 <= cum) AS r_b1,
        (SELECT min(v) FROM (
           SELECT v, cnt, CAST(sum(cnt) OVER (ORDER BY v) AS BIGINT) AS cum,
                  CAST(sum(cnt) OVER () AS BIGINT) AS n
           FROM (SELECT r AS v, CAST(count(*) AS BIGINT) AS cnt FROM per GROUP BY 1))
         WHERE cum - cnt < ((n - 1) * 2) // 3 + 1
           AND ((n - 1) * 2) // 3 + 1 <= cum) AS r_b2,
        (SELECT min(v) FROM (
           SELECT v, cnt, CAST(sum(cnt) OVER (ORDER BY v) AS BIGINT) AS cum,
                  CAST(sum(cnt) OVER () AS BIGINT) AS n
           FROM (SELECT f AS v, CAST(count(*) AS BIGINT) AS cnt FROM per GROUP BY 1))
         WHERE cum - cnt < (n - 1) // 3 + 1 AND (n - 1) // 3 + 1 <= cum) AS f_b1,
        (SELECT min(v) FROM (
           SELECT v, cnt, CAST(sum(cnt) OVER (ORDER BY v) AS BIGINT) AS cum,
                  CAST(sum(cnt) OVER () AS BIGINT) AS n
           FROM (SELECT f AS v, CAST(count(*) AS BIGINT) AS cnt FROM per GROUP BY 1))
         WHERE cum - cnt < ((n - 1) * 2) // 3 + 1
           AND ((n - 1) * 2) // 3 + 1 <= cum) AS f_b2,
        (SELECT min(v) FROM (
           SELECT v, cnt, CAST(sum(cnt) OVER (ORDER BY v) AS BIGINT) AS cum,
                  CAST(sum(cnt) OVER () AS BIGINT) AS n
           FROM (SELECT m AS v, CAST(count(*) AS BIGINT) AS cnt FROM per GROUP BY 1))
         WHERE cum - cnt < (n - 1) // 3 + 1 AND (n - 1) // 3 + 1 <= cum) AS m_b1,
        (SELECT min(v) FROM (
           SELECT v, cnt, CAST(sum(cnt) OVER (ORDER BY v) AS BIGINT) AS cum,
                  CAST(sum(cnt) OVER () AS BIGINT) AS n
           FROM (SELECT m AS v, CAST(count(*) AS BIGINT) AS cnt FROM per GROUP BY 1))
         WHERE cum - cnt < ((n - 1) * 2) // 3 + 1
           AND ((n - 1) * 2) // 3 + 1 <= cum) AS m_b2
    )
    SELECT CAST(1 + (r > r_b1)::INT + (r > r_b2)::INT AS BIGINT) AS r_band,
           CAST(1 + (f > f_b1)::INT + (f > f_b2)::INT AS BIGINT) AS f_band,
           CAST(1 + (m > m_b1)::INT + (m > m_b2)::INT AS BIGINT) AS m_band,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(m) AS BIGINT) AS revenue_cents
    FROM per CROSS JOIN bnd
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
"""
QUERIES["rfm_segments"] = q_rfm_segments


def q_label_cosine_contrast(spark, sf_dir):
    """Within- vs across-label similarity contrast WITHOUT any pair
    join — the centroid-algebra identity sum_{i in A, j in B} x_i.x_j
    = S_A . S_B turns the O(n^2) pairwise mean dot into per-label
    integer sum vectors: mean within-label dot = (S_A.S_A - Q_A) /
    (n_A*(n_A-1)), mean across = S_A.S_other / (n_A*(n-n_A)), with
    S the per-(label, dim) exact integer sums and Q the per-label
    squared norms.  Every number is exact until ONE division (the
    1e-8 grid descale rides in the divisor).  The contrastive-quality
    gate for embedding pipelines at ANY corpus size: one (label, dim)
    aggregate, zero pair joins, zero cartesians.  Products fold in
    decimal(38,0)/HUGEINT (S_Ad * S_otherd passes int64 at scale)."""
    e = _t(spark, sf_dir, "embeddings")
    vals = e.select(
        "label",
        F.posexplode(
            F.transform(
                F.col("embedding"),
                lambda x: F.round(x.cast("double") * 10000, 0).cast("long"),
            )
        ).alias("dim", "qv"),
    )
    per = vals.groupBy("label", "dim").agg(
        F.sum("qv").alias("s"),
        F.sum(F.col("qv") * F.col("qv")).alias("q"),
        (F.count(F.lit(1))).alias("c"),
    )
    tot = per.groupBy("dim").agg(F.sum("s").alias("st"))
    j = per.join(tot, "dim")
    agg = j.groupBy("label").agg(
        F.sum(F.col("s").cast("decimal(38,0)") * F.col("s")).alias("saa"),
        F.sum(
            F.col("s").cast("decimal(38,0)") * (F.col("st") - F.col("s"))
        ).alias("sab"),
        F.sum("q").alias("qa"),
        F.max("c").alias("na"),
    )
    n = e.agg(F.count(F.lit(1)).alias("n"))
    out = agg.crossJoin(F.broadcast(n))
    within = (F.col("saa") - F.col("qa")).cast("double") / (
        (F.col("na") * (F.col("na") - 1)).cast("double") * F.lit(1e8)
    )
    across = F.col("sab").cast("double") / (
        (F.col("na") * (F.col("n") - F.col("na"))).cast("double") * F.lit(1e8)
    )
    return out.select(
        "label",
        F.col("na").cast("long").alias("n_vectors"),
        F.round(within, 6).alias("mean_dot_within"),
        F.round(across, 6).alias("mean_dot_across"),
    ).orderBy("label")


ORACLE_SQL["label_cosine_contrast"] = """
    WITH vals AS (
      SELECT label, t.i - 1 AS dim,
             CAST(round(CAST(embedding[t.i] AS DOUBLE) * 10000, 0) AS BIGINT)
               AS qv
      FROM embeddings CROSS JOIN range(1, 65) t(i)
    ),
    per AS (
      SELECT label, dim,
             CAST(sum(qv) AS BIGINT) AS s,
             CAST(sum(qv * qv) AS BIGINT) AS q,
             CAST(count(*) AS BIGINT) AS c
      FROM vals GROUP BY 1, 2
    ),
    tot AS (SELECT dim, CAST(sum(s) AS BIGINT) AS st FROM per GROUP BY 1),
    agg AS (
      SELECT label,
             sum(CAST(s AS HUGEINT) * s) AS saa,
             sum(CAST(s AS HUGEINT) * (st - s)) AS sab,
             CAST(sum(q) AS BIGINT) AS qa,
             max(c) AS na
      FROM per JOIN tot USING (dim) GROUP BY 1
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings)
    SELECT label, na AS n_vectors,
           round(CAST(saa - qa AS DOUBLE)
                 / (CAST(na * (na - 1) AS DOUBLE) * 1e8), 6)
             AS mean_dot_within,
           round(CAST(sab AS DOUBLE)
                 / (CAST(na * (n - na) AS DOUBLE) * 1e8), 6)
             AS mean_dot_across
    FROM agg CROSS JOIN n
    ORDER BY label
"""
QUERIES["label_cosine_contrast"] = q_label_cosine_contrast


def q_pca_energy_explained(spark, sf_dir):
    """Energy (uncentered variance) explained by the certified power-
    iteration direction — the "is one component enough?" report that
    completes the PCA family: fraction = sum proj^2 / (|v|^2 * sum |x|^2)
    via the quadratic-form identity sum_i (x_i . v)^2 = v^T C v, so the
    GRAM MATRIX IS NEVER MATERIALIZED here either.  proj^2 folds in
    decimal(38,0) (projections pass int64 when squared); |v|^2 is an
    exact driver-side fold of the 64 model ints; ONE division.  The
    ratio-vs-uniform (x64) reads as "how many uniform directions' worth
    of energy the top component carries".  Scale: the two corpus passes
    of the PCA twin + one projection aggregate."""
    from parquet_merger_spark.operators.simsearch import (
        pca_power_projection_portable,
        quantize,
    )

    e = _t(spark, sf_dir, "embeddings")
    proj, v = pca_power_projection_portable(
        e, "vec_id", "embedding", iters=2, return_vector=True
    )
    v_norm2 = sum(c * c for c in v)
    trace = e.select(
        F.aggregate(
            quantize(F.col("embedding")),
            F.lit(0).cast("long"),
            lambda a, x: a + x * x,
        ).alias("n2")
    ).agg(F.sum("n2").alias("trace"), F.count(F.lit(1)).alias("n"))
    num = proj.agg(
        F.sum(F.col("proj").cast("decimal(38,0)") * F.col("proj")).alias("sp2")
    )
    out = num.crossJoin(F.broadcast(trace))
    frac = F.col("sp2").cast("double") / (
        F.lit(float(v_norm2)) * F.col("trace").cast("double")
    )
    return out.select(
        F.col("n").cast("long").alias("n_vectors"),
        F.round(frac, 6).alias("energy_fraction"),
        F.round(frac * 64, 6).alias("ratio_vs_uniform"),
    )


def _pca_energy_sql() -> str:
    quant = _QUANT
    return f"""
        WITH q AS (SELECT vec_id, {quant} AS qe FROM embeddings),
        d1 AS (
          SELECT vec_id, qe, CAST(list_sum(qe) AS BIGINT) AS p FROM q
        ),
        v1 AS (
          SELECT t.i AS i, CAST(sum(d1.qe[t.i] * d1.p) AS BIGINT) AS v
          FROM d1 CROSS JOIN range(1, 65) t(i) GROUP BY 1
        ),
        m1 AS (SELECT greatest(max(abs(v)), 1) AS m FROM v1),
        v1s AS (
          SELECT i, CAST(floor((v * 1000.0) / m) AS BIGINT) AS v FROM v1, m1
        ),
        d2 AS (
          SELECT q.vec_id, CAST(sum(q.qe[s.i] * s.v) AS BIGINT) AS p
          FROM q CROSS JOIN v1s s GROUP BY 1
        ),
        v2 AS (
          SELECT t.i AS i, CAST(sum(q.qe[t.i] * d2.p) AS BIGINT) AS v
          FROM q JOIN d2 USING (vec_id) CROSS JOIN range(1, 65) t(i)
          GROUP BY 1
        ),
        m2 AS (SELECT greatest(max(abs(v)), 1) AS m FROM v2),
        v2s AS (
          SELECT i, CAST(floor((v * 1000.0) / m) AS BIGINT) AS v FROM v2, m2
        ),
        proj AS (
          SELECT q.vec_id, CAST(sum(q.qe[s.i] * s.v) AS BIGINT) AS proj
          FROM q CROSS JOIN v2s s GROUP BY 1
        ),
        vn AS (SELECT CAST(sum(v * v) AS BIGINT) AS v2 FROM v2s),
        tr AS (
          SELECT CAST(sum(list_sum(list_transform(qe, x -> x * x))) AS BIGINT)
                   AS trace,
                 CAST(count(*) AS BIGINT) AS n
          FROM q
        ),
        num AS (SELECT sum(CAST(proj AS HUGEINT) * proj) AS sp2 FROM proj)
        SELECT n AS n_vectors,
               round(CAST(sp2 AS DOUBLE)
                     / (CAST(v2 AS DOUBLE) * CAST(trace AS DOUBLE)), 6)
                 AS energy_fraction,
               round(CAST(sp2 AS DOUBLE)
                     / (CAST(v2 AS DOUBLE) * CAST(trace AS DOUBLE)) * 64, 6)
                 AS ratio_vs_uniform
        FROM num CROSS JOIN vn CROSS JOIN tr
    """


ORACLE_SQL["pca_energy_explained"] = _pca_energy_sql()
QUERIES["pca_energy_explained"] = q_pca_energy_explained


def q_video_frame_sample(spark, sf_dir):
    """Video frame-sampling plan driven through the contract: every
    24th frame index per clip (synthetic deterministic frame counts —
    1 + doc_id mod 240 frames per clip, the metadata a video manifest
    carries), via ``operators.multimodal.frame_sample_plan`` — pure JVM
    sequence/explode, no decode, no Python.  The decode tier would join
    these (id, frame_idx) rows against the payload column inside
    mapInPandas (the plumbing the multimodal_decode key certifies).
    Output: per-clip sampled-frame count + last sampled index, exact.
    Scale: row-local explode, one id aggregate."""
    from parquet_merger_spark.operators.multimodal import frame_sample_plan

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", (1 + F.pmod(F.col("doc_id"), F.lit(240))).alias("n_frames")
    )
    frames = frame_sample_plan(d, every_n=24)
    return (
        frames.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.max("frame_idx").alias("last_idx"),
        )
        .select(
            "doc_id",
            F.col("n_sampled").cast("long").alias("n_sampled"),
            F.col("last_idx").cast("long").alias("last_idx"),
        )
    )


ORACLE_SQL["video_frame_sample"] = """
    WITH d AS (
      SELECT doc_id, 1 + doc_id % 240 AS n_frames FROM documents
    ),
    frames AS (
      SELECT doc_id,
             unnest(range(0, greatest(n_frames - 1, 0) + 1, 24)) AS frame_idx
      FROM d
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_sampled,
           CAST(max(frame_idx) AS BIGINT) AS last_idx
    FROM frames GROUP BY 1
"""
QUERIES["video_frame_sample"] = q_video_frame_sample


# --- round-6 widening wave 17: constraints, rank delta, paths, w-median ---


def q_constraint_violations_audit(spark, sf_dir):
    """Row-level CHECK-constraint audit — the data-contract sibling of
    fk_orphan_audit: for each declared rule (discount in [0,1],
    quantity > 0, extendedprice > 0, shipdate >= orderdate, tax >= 0),
    the scanned-row count and violation count.  One pass over lineitem
    (the date rule joins orders on the key), every rule a row-local
    predicate folded map-side; a clean fixture certifies the zero path
    end-to-end and the audit's value is the loud nonzero row.  Exact
    counts only."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    j = li.join(o, li.l_orderkey == o.o_orderkey)

    rules = {
        "discount_in_0_1": (F.col("l_discount") < 0) | (F.col("l_discount") > 1),
        "quantity_positive": F.col("l_quantity") <= 0,
        "extendedprice_positive": F.col("l_extendedprice") <= 0,
        "ship_after_order": F.col("l_shipdate") < F.col("o_orderdate"),
        "tax_nonnegative": F.col("l_tax") < 0,
    }
    # ONE pass: every rule a conditional sum in the same aggregate, then
    # the 1-row result unpivots to the per-rule table (model-sized)
    agg = j.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        *[
            F.sum(F.when(v, 1).otherwise(0)).cast("long").alias(f"v_{i}")
            for i, v in enumerate(rules.values())
        ],
    )
    stacked = agg.select(
        "n_rows",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("rule"), F.col(f"v_{i}").alias("n_violations")
                    )
                    for i, name in enumerate(rules)
                ]
            )
        ).alias("r"),
    )
    return stacked.select("r.rule", "n_rows", "r.n_violations").orderBy("rule")


ORACLE_SQL["constraint_violations_audit"] = """
    WITH j AS (
      SELECT l_discount, l_quantity, l_extendedprice, l_tax,
             l_shipdate, o_orderdate
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    )
    SELECT 'discount_in_0_1' AS rule,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 1
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
    FROM j
    UNION ALL
    SELECT 'quantity_positive', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT)
    FROM j
    UNION ALL
    SELECT 'extendedprice_positive', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
    FROM j
    UNION ALL
    SELECT 'ship_after_order', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN l_shipdate < o_orderdate THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM j
    UNION ALL
    SELECT 'tax_nonnegative', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN l_tax < 0 THEN 1 ELSE 0 END) AS BIGINT)
    FROM j
    ORDER BY rule
"""
QUERIES["constraint_violations_audit"] = q_constraint_violations_audit


def q_nation_rank_delta(spark, sf_dir):
    """Top-movers table: each nation's revenue rank in the corpus's last
    full year vs the year before, with the rank delta — the
    period-over-period league table.  Ranks are dense_rank over exact
    cents (ties share a rank deterministically, tie-break inside the
    window by nation name); the two model-sized year slices join on
    nation.  Scale: one orders->customer join (nation broadcast), two
    25-row rank windows."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.year("o_orderdate").alias("yr"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    j = o.join(c, o.o_custkey == c.c_custkey).join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    )
    years = j.agg(F.max("yr").alias("y2"))
    per = (
        j.crossJoin(F.broadcast(years))
        .filter((F.col("yr") == F.col("y2")) | (F.col("yr") == F.col("y2") - 1))
        .groupBy("n_name", (F.col("yr") == F.col("y2")).alias("is_last"))
        .agg(F.sum("cents").alias("rev"))
    )
    w = Window.partitionBy("is_last").orderBy(F.desc("rev"), "n_name")
    ranked = per.select(
        "n_name", "is_last", "rev", F.row_number().over(w).alias("rk")
    )
    last = ranked.filter(F.col("is_last")).select(
        F.col("n_name").alias("nation"),
        F.col("rev").alias("rev_last"),
        F.col("rk").alias("rank_last"),
    )
    prev = ranked.filter(~F.col("is_last")).select(
        F.col("n_name").alias("nation"),
        F.col("rev").alias("rev_prev"),
        F.col("rk").alias("rank_prev"),
    )
    return (
        last.join(prev, "nation")
        .select(
            "nation",
            F.col("rev_prev").cast("long").alias("rev_prev_cents"),
            F.col("rev_last").cast("long").alias("rev_last_cents"),
            F.col("rank_prev").cast("long").alias("rank_prev"),
            F.col("rank_last").cast("long").alias("rank_last"),
            (F.col("rank_prev") - F.col("rank_last")).cast("long").alias("rank_delta"),
        )
        .orderBy("rank_last", "nation")
    )


ORACLE_SQL["nation_rank_delta"] = """
    WITH j AS (
      SELECT n.n_name,
             year(o_orderdate) AS yr,
             CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
      FROM orders
      JOIN customer c ON o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
    ),
    y AS (SELECT max(yr) AS y2 FROM j),
    per AS (
      SELECT n_name, (yr = y2) AS is_last, CAST(sum(cents) AS BIGINT) AS rev
      FROM j CROSS JOIN y
      WHERE yr = y2 OR yr = y2 - 1
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT n_name, is_last, rev,
             row_number() OVER (PARTITION BY is_last
                                ORDER BY rev DESC, n_name) AS rk
      FROM per
    )
    SELECT l.n_name AS nation,
           p.rev AS rev_prev_cents,
           l.rev AS rev_last_cents,
           CAST(p.rk AS BIGINT) AS rank_prev,
           CAST(l.rk AS BIGINT) AS rank_last,
           CAST(p.rk - l.rk AS BIGINT) AS rank_delta
    FROM (SELECT * FROM ranked WHERE is_last) l
    JOIN (SELECT * FROM ranked WHERE NOT is_last) p ON l.n_name = p.n_name
    ORDER BY rank_last, nation
"""
QUERIES["nation_rank_delta"] = q_nation_rank_delta


def q_top_event_paths(spark, sf_dir):
    """Top behavioral 3-step paths: consecutive event-type trigrams per
    user (ordered by ts with event_id tie-break), counted and ranked —
    the Sankey/path-analysis table.  Window lead() is O(1) per row;
    the trigram census shuffles on the path string; top-20 with full
    tie-break (n DESC, path ASC) is a TakeOrdered.  Exact counts and
    one share division."""
    e = _events(spark, sf_dir).select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tri = e.select(
        F.concat_ws(
            ">",
            F.col("event_type"),
            F.lead("event_type", 1).over(w),
            F.lead("event_type", 2).over(w),
        ).alias("path"),
        F.lead("event_type", 2).over(w).alias("third"),
    ).filter(F.col("third").isNotNull())
    counts = tri.groupBy("path").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(F.sum("n").alias("total"))
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "path",
            F.col("n").cast("long").alias("n"),
            F.round(F.col("n").cast("double") / F.col("total").cast("double"), 6).alias(
                "share"
            ),
        )
        .orderBy(F.desc("n"), "path")
        .limit(20)
    )


ORACLE_SQL["top_event_paths"] = """
    WITH tri AS (
      SELECT event_type || '>' ||
             lead(event_type, 1) OVER w || '>' ||
             lead(event_type, 2) OVER w AS path,
             lead(event_type, 2) OVER w AS third
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    counts AS (
      SELECT path, CAST(count(*) AS BIGINT) AS n
      FROM tri WHERE third IS NOT NULL GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM counts)
    SELECT path, n,
           round(CAST(n AS DOUBLE) / CAST(total AS DOUBLE), 6) AS share
    FROM counts CROSS JOIN tot
    ORDER BY n DESC, path LIMIT 20
"""
QUERIES["top_event_paths"] = q_top_event_paths


def q_weighted_median_price(spark, sf_dir):
    """Quantity-weighted median of lineitem price per return flag — the
    order statistic where each row counts its weight (the
    volume-weighted sibling of the plain median): EXACT rank selection
    over the (flag, price) count table with counts replaced by exact
    integer weights; target rank (W-1) div 2 + 1 on the cumulative
    weight.  Scale: one count-table shuffle, no row sort.

    r11: the count table is PERSISTED so the per-flag total branch reads
    the cache instead of re-scanning and re-aggregating lineitem — the
    r10 plan ran 2 scans + 5 aggregates because ReuseExchange missed
    across the window/aggregate branches.  (An unbounded second window
    over the same partitioning was tried first and measured WORSE,
    1.43s -> 1.70s min-of-5: the whole-partition pass runs at
    flag-cardinality parallelism, while the per-flag total is a
    parallel hash aggregate.)  Same integers, same rows."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("cents"),
        F.round(F.col("l_quantity"), 0).cast("long").alias("w"),
    )
    counts = li.groupBy("l_returnflag", "cents").agg(F.sum("w").alias("cw")).persist()
    win = Window.partitionBy("l_returnflag").orderBy("cents")
    cum = counts.select(
        "l_returnflag", "cents", "cw", F.sum("cw").over(win).alias("cum")
    )
    tot = counts.groupBy("l_returnflag").agg(F.sum("cw").alias("tw"))
    cj = cum.join(F.broadcast(tot), "l_returnflag")
    rank = F.expr("(tw - 1) div 2 + 1")
    return (
        cj.filter((F.col("cum") - F.col("cw") < rank) & (rank <= F.col("cum")))
        .groupBy("l_returnflag")
        .agg(
            F.max("tw").cast("long").alias("total_weight"),
            F.min("cents").cast("long").alias("weighted_median_cents"),
        )
        .orderBy("l_returnflag")
    )


ORACLE_SQL["weighted_median_price"] = """
    WITH li AS (
      SELECT l_returnflag,
             CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents,
             CAST(round(l_quantity, 0) AS BIGINT) AS w
      FROM lineitem
    ),
    counts AS (
      SELECT l_returnflag, cents, CAST(sum(w) AS BIGINT) AS cw
      FROM li GROUP BY 1, 2
    ),
    cum AS (
      SELECT l_returnflag, cents, cw,
             CAST(sum(cw) OVER (PARTITION BY l_returnflag ORDER BY cents)
                  AS BIGINT) AS cum
      FROM counts
    ),
    tot AS (
      SELECT l_returnflag, CAST(sum(cw) AS BIGINT) AS tw
      FROM counts GROUP BY 1
    )
    SELECT cum.l_returnflag,
           max(tw) AS total_weight,
           min(cents) AS weighted_median_cents
    FROM cum JOIN tot ON cum.l_returnflag = tot.l_returnflag
    WHERE cum - cw < (tw - 1) // 2 + 1 AND (tw - 1) // 2 + 1 <= cum
    GROUP BY 1 ORDER BY 1
"""
QUERIES["weighted_median_price"] = q_weighted_median_price


# --- round-6 widening wave 18: filter funnel + quality survivor policy ----


def q_filter_funnel_census(spark, sf_dir):
    """Curation survivorship funnel — the "why did we lose those docs"
    audit: three row-local gates (english, >= 200 chars, >= 50 tokens)
    evaluated ONCE per document, then (a) the 8-combination census and
    (b) the staged funnel (pass-1, pass-1-and-2, pass-all) read from
    the same pass.  All counts exact; shares one division each.
    Scale: one narrow scan, one 8-group aggregate."""
    d = _t(spark, sf_dir, "documents")
    g1 = (F.col("lang") == "en").cast("int")
    g2 = (F.col("n_chars") >= 200).cast("int")
    g3 = (F.size(F.split(F.col("text"), " ")) >= 50).cast("int")
    cells = d.select(g1.alias("g_lang"), g2.alias("g_len"), g3.alias("g_tok"))
    census = cells.groupBy("g_lang", "g_len", "g_tok").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    tot = census.agg(F.sum("n_docs").alias("n"))
    return (
        census.crossJoin(F.broadcast(tot))
        .select(
            F.col("g_lang").cast("long").alias("pass_lang"),
            F.col("g_len").cast("long").alias("pass_length"),
            F.col("g_tok").cast("long").alias("pass_tokens"),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.round(
                F.col("n_docs").cast("double") / F.col("n").cast("double"), 6
            ).alias("share"),
        )
        .orderBy("pass_lang", "pass_length", "pass_tokens")
    )


ORACLE_SQL["filter_funnel_census"] = """
    WITH cells AS (
      SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS g_lang,
             CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END AS g_len,
             CASE WHEN len(string_split(text, ' ')) >= 50 THEN 1 ELSE 0 END
               AS g_tok
      FROM documents
    ),
    census AS (
      SELECT g_lang, g_len, g_tok, CAST(count(*) AS BIGINT) AS n_docs
      FROM cells GROUP BY 1, 2, 3
    ),
    tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n FROM census)
    SELECT CAST(g_lang AS BIGINT) AS pass_lang,
           CAST(g_len AS BIGINT) AS pass_length,
           CAST(g_tok AS BIGINT) AS pass_tokens,
           n_docs,
           round(CAST(n_docs AS DOUBLE) / CAST(n AS DOUBLE), 6) AS share
    FROM census CROSS JOIN tot
    ORDER BY pass_lang, pass_length, pass_tokens
"""
QUERIES["filter_funnel_census"] = q_filter_funnel_census


def q_dedup_survivors_best_quality(spark, sf_dir):
    """QUALITY-AWARE survivor policy — the third member of the survivor
    family (first-id, longest): within each template-prefix family the
    survivor is the document with the FEWEST short tokens per mille
    (the certified quality score; lower = higher quality here), doc_id
    as the deterministic tie-break.  Exact arg-min via a (score, id)
    struct min — one family-key shuffle, no window sort."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    score = _short_token_score(toks)
    pfx = F.array_join(F.slice(toks, 1, 2), " ")
    base = d.select("doc_id", "source", pfx.alias("pfx"), score.alias("score"))
    best = base.groupBy("pfx").agg(
        F.min(F.struct(F.col("score"), F.col("doc_id"))).alias("b")
    )
    return (
        base.join(best, "pfx")
        .filter(
            (F.col("score") == F.col("b.score"))
            & (F.col("doc_id") == F.col("b.doc_id"))
        )
        .select("doc_id", "source", "score")
    )


ORACLE_SQL["dedup_survivors_best_quality"] = f"""
    WITH base AS (
      SELECT doc_id, source,
             array_to_string(string_split(text, ' ')[1:2], ' ') AS pfx,
             {_SHORT_SCORE_SQL} AS score
      FROM documents
    ),
    best AS (
      SELECT pfx, min(score) AS s FROM base GROUP BY 1
    ),
    tie AS (
      SELECT base.pfx, min(doc_id) AS keep_id
      FROM base JOIN best ON base.pfx = best.pfx AND base.score = best.s
      GROUP BY 1
    )
    SELECT doc_id, source, score
    FROM base JOIN tie ON base.pfx = tie.pfx AND base.doc_id = tie.keep_id
"""
QUERIES["dedup_survivors_best_quality"] = q_dedup_survivors_best_quality


# --- round-6 widening wave 19: nucleus curation, int8 error, ANOVA --------


def q_nucleus_curation_threshold(spark, sf_dir):
    """Nucleus (top-p) curation threshold per source: keep the
    best-quality documents until their cumulative characters reach half
    the source's character mass — the data-mixing policy that spends a
    char budget on quality.  The cut is an exact rank selection over
    the per-source (score -> chars) COUNT TABLE (score ascending =
    better first; the crossing score is included whole, so the kept set
    is deterministic — no per-document sort anywhere).  Output per
    source: the score cut, docs and chars kept, and the kept-char
    share (one division).  Scale: one (source, score) aggregate +
    model-sized cumulative windows."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    score = _short_token_score(toks)
    base = d.select("source", score.alias("score"), "n_chars")
    counts = base.groupBy("source", "score").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("chars")
    )
    w = Window.partitionBy("source").orderBy("score")
    cum = counts.select(
        "source", "score", "n_docs", "chars",
        F.sum("chars").over(w).alias("cum_chars"),
        F.sum("n_docs").over(w).alias("cum_docs"),
    )
    tot = counts.groupBy("source").agg(F.sum("chars").alias("total_chars"))
    cj = cum.join(F.broadcast(tot), "source")
    # first score whose cumulative chars reach half the mass (2*cum >= total)
    cut = cj.filter(F.col("cum_chars") * 2 >= F.col("total_chars")).groupBy(
        "source"
    ).agg(F.min("score").alias("score_cut"))
    kept = (
        cj.join(F.broadcast(cut), "source")
        .filter(F.col("score") == F.col("score_cut"))
        .select(
            "source",
            "score_cut",
            F.col("cum_docs").cast("long").alias("n_docs_kept"),
            F.col("cum_chars").cast("long").alias("chars_kept"),
            F.round(
                F.col("cum_chars").cast("double") / F.col("total_chars").cast("double"),
                6,
            ).alias("kept_share"),
        )
    )
    return kept.orderBy("source")


ORACLE_SQL["nucleus_curation_threshold"] = f"""
    WITH base AS (
      SELECT source,
             {_SHORT_SCORE_SQL} AS score,
             n_chars
      FROM documents
    ),
    counts AS (
      SELECT source, score, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS chars
      FROM base GROUP BY 1, 2
    ),
    cum AS (
      SELECT source, score, n_docs, chars,
             CAST(sum(chars) OVER (PARTITION BY source ORDER BY score)
                  AS BIGINT) AS cum_chars,
             CAST(sum(n_docs) OVER (PARTITION BY source ORDER BY score)
                  AS BIGINT) AS cum_docs
      FROM counts
    ),
    tot AS (
      SELECT source, CAST(sum(chars) AS BIGINT) AS total_chars
      FROM counts GROUP BY 1
    ),
    cut AS (
      SELECT cum.source, min(score) AS score_cut
      FROM cum JOIN tot ON cum.source = tot.source
      WHERE cum_chars * 2 >= total_chars
      GROUP BY 1
    )
    SELECT cum.source, score_cut,
           cum_docs AS n_docs_kept,
           cum_chars AS chars_kept,
           round(CAST(cum_chars AS DOUBLE) / CAST(total_chars AS DOUBLE), 6)
             AS kept_share
    FROM cum
    JOIN cut ON cum.source = cut.source AND cum.score = cut.score_cut
    JOIN tot ON cum.source = tot.source
    ORDER BY cum.source
"""
QUERIES["nucleus_curation_threshold"] = q_nucleus_curation_threshold


def q_int8_quantization_error(spark, sf_dir):
    """Scalar int8 quantization error report — the third member of the
    compression family (PQ codebooks, RHP bits): each dimension maps to
    int8 via the per-dim symmetric scale ceil(max|v|/127) on the 1e-4
    integer grid (scale exact by construction), and the report is the
    per-label reconstruction MSE — exact integer error sums, ONE
    division, on the 1e-8 descale.  The size/recall tradeoff number a
    vector store quotes.  Scale: two (dim/label) aggregates, a 64-cell
    scale broadcast, zero Python."""
    e = _t(spark, sf_dir, "embeddings")
    vals = e.select(
        "label",
        F.posexplode(
            F.transform(
                F.col("embedding"),
                lambda x: F.round(x.cast("double") * 10000, 0).cast("long"),
            )
        ).alias("dim", "qv"),
    )
    scales = vals.groupBy("dim").agg(
        # symmetric scale: ceil(max|qv| / 127), >= 1
        F.greatest(
            F.lit(1).cast("long"),
            ((F.max(F.abs(F.col("qv"))) + 126) - (F.max(F.abs(F.col("qv"))) + 126) % 127) / 127,
        ).cast("long").alias("s")
    )
    j = vals.join(F.broadcast(scales), "dim")
    # round-half-away reconstruction: q8 = round(qv/s) clamped to [-127,127]
    q8 = F.greatest(
        F.lit(-127).cast("long"),
        F.least(
            F.lit(127).cast("long"),
            F.round(F.col("qv").cast("double") / F.col("s").cast("double"), 0).cast("long"),
        ),
    )
    err = (F.col("qv") - q8 * F.col("s"))
    agg = j.select("label", err.alias("e")).groupBy("label").agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum(F.col("e") * F.col("e")).alias("se"),
    )
    return agg.select(
        "label",
        (F.col("n_cells") / 64).cast("long").alias("n_vectors"),
        F.round(
            F.col("se").cast("double")
            / (F.col("n_cells").cast("double") * F.lit(1e8)),
            6,
        ).alias("mse"),
    ).orderBy("label")


ORACLE_SQL["int8_quantization_error"] = """
    WITH vals AS (
      SELECT label, t.i - 1 AS dim,
             CAST(round(CAST(embedding[t.i] AS DOUBLE) * 10000, 0) AS BIGINT)
               AS qv
      FROM embeddings CROSS JOIN range(1, 65) t(i)
    ),
    scales AS (
      SELECT dim,
             greatest(1, (max(abs(qv)) + 126) // 127) AS s
      FROM vals GROUP BY 1
    ),
    j AS (
      SELECT label,
             qv,
             qv - greatest(-127, least(127,
                 CAST(round(CAST(qv AS DOUBLE) / CAST(s AS DOUBLE), 0)
                      AS BIGINT))) * s AS e
      FROM vals JOIN scales USING (dim)
    ),
    agg AS (
      SELECT label, CAST(count(*) AS BIGINT) AS n_cells,
             CAST(sum(e * e) AS BIGINT) AS se
      FROM j GROUP BY 1
    )
    SELECT label, n_cells // 64 AS n_vectors,
           round(CAST(se AS DOUBLE) / (CAST(n_cells AS DOUBLE) * 1e8), 6)
             AS mse
    FROM agg ORDER BY label
"""
QUERIES["int8_quantization_error"] = q_int8_quantization_error


def q_variance_decomposition_by_type(spark, sf_dir):
    """One-way variance decomposition of event value by type (the ANOVA
    ingredients as a TABLE): per type, n, mean, and the within-group
    sum of squares — ss_within = (n_g*S2_g - S1_g^2)/n_g with the
    numerator exact integer cents^2 and ONE division per row; the
    between/within F statistic is a trivial fold away for the reader.
    Emitting per-group rows keeps every value a fixed IEEE tree (no
    cross-engine summation of doubles).  Scale: one per-type
    aggregate."""
    e = _events(spark, sf_dir)
    c = F.round(F.col("value") * 100, 0).cast("long")
    agg = e.select("event_type", c.alias("c")).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s1"),
        # decimal(38,0): sum(c^2) in int64 wraps before A/B's decimal
        # bounds bind for high-magnitude values (pinned in
        # tests/test_round7_review.py); DuckDB mirrors with HUGEINT
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c")).alias("s2"),
    )
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round(
            F.col("s1").cast("double") / (F.lit(100.0) * F.col("n").cast("double")), 6
        ).alias("mean_value"),
        F.round(
            (
                F.col("n").cast("decimal(38,0)") * F.col("s2")
                - F.col("s1").cast("decimal(38,0)") * F.col("s1")
            ).cast("double")
            / (F.col("n").cast("double") * F.lit(1e4)),
            6,
        ).alias("ss_within"),
    ).orderBy("event_type")


ORACLE_SQL["variance_decomposition_by_type"] = """
    WITH agg AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS s1,
             sum(CAST(CAST(round(value * 100, 0) AS BIGINT) AS HUGEINT)
                      * CAST(round(value * 100, 0) AS BIGINT)) AS s2
      FROM events GROUP BY 1
    )
    SELECT event_type, n,
           round(CAST(s1 AS DOUBLE) / (100.0 * CAST(n AS DOUBLE)), 6)
             AS mean_value,
           round(CAST(CAST(n AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)
                 / (CAST(n AS DOUBLE) * 1e4), 6) AS ss_within
    FROM agg ORDER BY event_type
"""
QUERIES["variance_decomposition_by_type"] = q_variance_decomposition_by_type


# --- round-6 widening wave 20: payment dups, hierarchy shares, bot radar --


def q_duplicate_payment_candidates(spark, sf_dir):
    """Duplicate-payment candidate pairs — the transaction-dedup twin of
    the text near-dup family: same customer, order dates within seven
    days (equi-join on custkey so the fan-out is bounded by per-key
    multiplicity — never a cartesian; the day window is row-local on
    the joined pair), with the exact-amount flag and the integer cents
    delta as the scoring features (a clean fixture has zero exact
    matches; the audit's value is the loud one).  Deterministic pair
    order (orderkey_a < orderkey_b); all arithmetic integer cents /
    epoch days.  Scale: one key shuffle; at 100 TB the window narrows
    or the key extends (custkey, amount band), same plan."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        (F.col("o_orderdate").cast("timestamp").cast("long") / 86400)
        .cast("long")
        .alias("day"),
    )
    a = o.alias("a")
    b = o.alias("b")
    pairs = a.join(
        b,
        (F.col("a.o_custkey") == F.col("b.o_custkey"))
        & (F.col("a.o_orderkey") < F.col("b.o_orderkey")),
    ).filter(F.abs(F.col("a.day") - F.col("b.day")) <= 7)
    return pairs.select(
        F.col("a.o_orderkey").alias("orderkey_a"),
        F.col("b.o_orderkey").alias("orderkey_b"),
        F.col("a.o_custkey").alias("custkey"),
        F.abs(F.col("a.day") - F.col("b.day")).cast("long").alias("day_gap"),
        F.abs(F.col("a.cents") - F.col("b.cents")).cast("long").alias("cents_delta"),
        (F.col("a.cents") == F.col("b.cents")).cast("long").alias("amount_match"),
    )


ORACLE_SQL["duplicate_payment_candidates"] = """
    WITH o AS (
      SELECT o_orderkey, o_custkey,
             CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
             CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) // 86400 AS day
      FROM orders
    )
    SELECT a.o_orderkey AS orderkey_a,
           b.o_orderkey AS orderkey_b,
           a.o_custkey AS custkey,
           abs(a.day - b.day) AS day_gap,
           abs(a.cents - b.cents) AS cents_delta,
           CAST(a.cents = b.cents AS BIGINT) AS amount_match
    FROM o a JOIN o b
      ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
    WHERE abs(a.day - b.day) <= 7
"""
QUERIES["duplicate_payment_candidates"] = q_duplicate_payment_candidates


def q_revenue_share_hierarchy(spark, sf_dir):
    """Percent-of-total through the region > nation hierarchy: each
    nation's share within its region AND its region's share of the
    corpus — the drill-down dashboard table, exact cents with one
    division per share.  Scale: broadcast-dim joins, model-sized
    region/total broadcasts."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents")
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    j = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    nat = j.groupBy("r_name", "n_name").agg(F.sum("cents").alias("nat_rev"))
    reg = nat.groupBy("r_name").agg(F.sum("nat_rev").alias("reg_rev"))
    tot = reg.agg(F.sum("reg_rev").alias("total"))
    return (
        nat.join(F.broadcast(reg), "r_name")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("r_name").alias("region"),
            F.col("n_name").alias("nation"),
            F.col("nat_rev").cast("long").alias("revenue_cents"),
            F.round(
                F.col("nat_rev").cast("double") / F.col("reg_rev").cast("double"), 6
            ).alias("share_in_region"),
            F.round(
                F.col("reg_rev").cast("double") / F.col("total").cast("double"), 6
            ).alias("region_share_of_total"),
        )
        .orderBy("region", "nation")
    )


ORACLE_SQL["revenue_share_hierarchy"] = """
    WITH j AS (
      SELECT r.r_name, n.n_name,
             CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
      FROM orders
      JOIN customer c ON o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
    ),
    nat AS (
      SELECT r_name, n_name, CAST(sum(cents) AS BIGINT) AS nat_rev
      FROM j GROUP BY 1, 2
    ),
    reg AS (
      SELECT r_name, CAST(sum(nat_rev) AS BIGINT) AS reg_rev
      FROM nat GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(reg_rev) AS BIGINT) AS total FROM reg)
    SELECT nat.r_name AS region, n_name AS nation,
           nat_rev AS revenue_cents,
           round(CAST(nat_rev AS DOUBLE) / CAST(reg_rev AS DOUBLE), 6)
             AS share_in_region,
           round(CAST(reg_rev AS DOUBLE) / CAST(total AS DOUBLE), 6)
             AS region_share_of_total
    FROM nat JOIN reg ON nat.r_name = reg.r_name CROSS JOIN tot
    ORDER BY region, nation
"""
QUERIES["revenue_share_hierarchy"] = q_revenue_share_hierarchy


def q_bot_user_detector(spark, sf_dir):
    """Bot/automation radar: the ten most metronomic users — lowest
    inter-event dispersion index among users with >= 10 gaps (a human's
    gaps are over-dispersed; a cron job's collapse toward zero).
    Dispersion is the exact-integer rational from interevent_burstiness
    rounded BEFORE the ordering, so the top-k total order
    (dispersion, user_id) is cross-engine identical.  Scale: one
    user-keyed window + aggregate, TakeOrdered top-k."""
    e = _events(spark, sf_dir).select(
        "user_id", F.col("ts").cast("long").alias("epoch"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("epoch", "event_id")
    gaps = e.select(
        "user_id", (F.col("epoch") - F.lag("epoch").over(w)).alias("g")
    ).filter(F.col("g").isNotNull())
    agg = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("g").alias("s"),
        F.sum(F.col("g").cast("decimal(38,0)") * F.col("g")).alias("s2"),
    )
    return (
        agg.filter((F.col("n") >= 10) & (F.col("s") > 0))
        .select(
            "user_id",
            F.col("n").cast("long").alias("n_gaps"),
            F.round(F.col("s").cast("double") / F.col("n").cast("double"), 6).alias(
                "mean_gap_s"
            ),
            F.round(
                (
                    F.col("n").cast("decimal(38,0)") * F.col("s2")
                    - F.col("s").cast("decimal(38,0)") * F.col("s")
                ).cast("double")
                / (F.col("s") * F.col("s")).cast("double"),
                6,
            ).alias("dispersion"),
        )
        .orderBy("dispersion", "user_id")
        .limit(10)
    )


ORACLE_SQL["bot_user_detector"] = """
    WITH e AS (
      SELECT user_id,
             CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS epoch,
             event_id
      FROM events
    ),
    gaps AS (
      SELECT user_id,
             epoch - lag(epoch) OVER (PARTITION BY user_id
                                      ORDER BY epoch, event_id) AS g
      FROM e
    ),
    agg AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(g) AS BIGINT) AS s,
             sum(CAST(g AS HUGEINT) * g) AS s2
      FROM gaps WHERE g IS NOT NULL GROUP BY 1
    )
    SELECT user_id, n AS n_gaps,
           round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_gap_s,
           round(CAST(CAST(n AS HUGEINT) * s2 - CAST(s AS HUGEINT) * s AS DOUBLE)
                 / CAST(CAST(s AS HUGEINT) * s AS DOUBLE), 6)
             AS dispersion
    FROM agg WHERE n >= 10 AND s > 0
    ORDER BY dispersion, user_id LIMIT 10
"""
QUERIES["bot_user_detector"] = q_bot_user_detector


# --- round-6 widening wave 21: nearest as-of + YoY -------------------------


def q_asof_join_nearest(spark, sf_dir):
    """NEAREST point-in-time join (pandas merge_asof direction='nearest'):
    each order gains the customer event with the smallest absolute time
    gap — backward on ties.  ONE union + window pass (r11): orders and
    the per-(customer, epoch) event extrema ride a single shuffle on the
    customer key; RANGE frames make both directions inclusive of
    equal-epoch events regardless of peer order (last(<=) carries the
    latest event payload backward, first(>=) the earliest forward), and
    a row-local CASE picks the closer.  Replaces the r10 shape — two
    one-sided as-of plans (a window shuffle each) re-joined on orderkey
    — with identical results: the per-epoch extremum structs reproduce
    eb's max-event_id / ef's min-event_id dedup (struct order compares
    event_id first; epoch is constant within the group), events are
    unique per (customer, epoch) after the aggregate so both ignorenulls
    picks are deterministic, and the gap CASE is unchanged.  5 exchanges
    + 5 sorts -> 2 exchanges + 2 sorts, no orderkey join.  Scale: the
    same single-shuffle shape at 100 TB, skew bounded by events-per-
    customer like every as-of plan here."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.col("o_orderdate").cast("timestamp").cast("long").alias("order_epoch"),
    )
    e = _events(spark, sf_dir).select(
        F.col("user_id").alias("o_custkey"),
        F.col("ts").cast("long").alias("event_epoch"),
        "event_id",
        "value",
    )
    # per-(customer, epoch) extrema replace the two row_number dedups:
    # max(struct) == the DESC-event_id survivor, min(struct) == the ASC
    # one (event_id leads the struct; epoch rides along for the output)
    ev = e.groupBy("o_custkey", "event_epoch").agg(
        F.max(F.struct("event_id", "value", "event_epoch")).alias("__rb"),
        F.min(F.struct("event_id", "value", "event_epoch")).alias("__rf"),
    )
    combined = o.withColumn("__t", F.col("order_epoch")).unionByName(
        ev.select("o_custkey", F.col("event_epoch").alias("__t"), "__rb", "__rf"),
        allowMissingColumns=True,
    )
    # RANGE frames (orderBy is the bare epoch long): peers at the current
    # epoch are in-frame on BOTH sides, so an equal-epoch event is
    # carried inclusively in each direction — the row-frame trick of
    # asof.py needs a side tag and therefore one pass per direction;
    # range frames buy both directions from one sort.
    wb = (
        Window.partitionBy("o_custkey")
        .orderBy("__t")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("o_custkey")
        .orderBy("__t")
        .rangeBetween(0, Window.unboundedFollowing)
    )
    j = (
        combined.select(
            "o_orderkey",
            "o_custkey",
            "order_epoch",
            F.last("__rb", ignorenulls=True).over(wb).alias("__b"),
            F.first("__rf", ignorenulls=True).over(wf).alias("__f"),
        )
        # order rows only (event rows carry a null-filled orderkey)
        .filter(F.col("o_orderkey").isNotNull())
    )
    b_epoch = F.col("__b.event_epoch")
    f_epoch = F.col("__f.event_epoch")
    b_gap = F.col("order_epoch") - b_epoch
    f_gap = f_epoch - F.col("order_epoch")
    take_back = f_epoch.isNull() | (b_epoch.isNotNull() & (b_gap <= f_gap))
    return j.select(
        "o_orderkey",
        "o_custkey",
        "order_epoch",
        F.when(take_back, F.col("__b.event_id"))
        .otherwise(F.col("__f.event_id"))
        .alias("nearest_event_id"),
        F.when(take_back, b_epoch).otherwise(f_epoch).alias(
            "nearest_event_epoch"
        ),
        F.round(
            F.when(take_back, F.col("__b.value")).otherwise(F.col("__f.value")),
            2,
        ).alias("nearest_event_value"),
        F.when(b_epoch.isNull() & f_epoch.isNull(), F.lit(None))
        .when(take_back, F.lit("backward"))
        .otherwise(F.lit("forward"))
        .alias("direction"),
    )


ORACLE_SQL["asof_join_nearest"] = """
    WITH o AS (
      SELECT o_orderkey, o_custkey,
             CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) AS order_epoch
      FROM orders
    ), e0 AS (
      SELECT user_id,
             CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS event_epoch,
             event_id, value
      FROM events
    ), eb AS (
      SELECT user_id, event_epoch, event_id, value FROM (
        SELECT *, row_number() OVER (
          PARTITION BY user_id, event_epoch ORDER BY event_id DESC) AS rn
        FROM e0) WHERE rn = 1
    ), ef AS (
      SELECT user_id, event_epoch, event_id, value FROM (
        SELECT *, row_number() OVER (
          PARTITION BY user_id, event_epoch ORDER BY event_id) AS rn
        FROM e0) WHERE rn = 1
    ), back AS (
      SELECT o.o_orderkey, o.o_custkey, o.order_epoch,
             e.event_id AS b_id, e.event_epoch AS b_epoch, e.value AS b_value
      FROM o ASOF LEFT JOIN eb e
        ON o.o_custkey = e.user_id AND e.event_epoch <= o.order_epoch
    ), fwd AS (
      SELECT o.o_orderkey,
             e.event_id AS f_id, e.event_epoch AS f_epoch, e.value AS f_value
      FROM o ASOF LEFT JOIN ef e
        ON o.o_custkey = e.user_id AND e.event_epoch >= o.order_epoch
    )
    SELECT back.o_orderkey, o_custkey, order_epoch,
           CASE WHEN f_epoch IS NULL
                  OR (b_epoch IS NOT NULL
                      AND order_epoch - b_epoch <= f_epoch - order_epoch)
                THEN b_id ELSE f_id END AS nearest_event_id,
           CASE WHEN f_epoch IS NULL
                  OR (b_epoch IS NOT NULL
                      AND order_epoch - b_epoch <= f_epoch - order_epoch)
                THEN b_epoch ELSE f_epoch END AS nearest_event_epoch,
           round(CASE WHEN f_epoch IS NULL
                        OR (b_epoch IS NOT NULL
                            AND order_epoch - b_epoch <= f_epoch - order_epoch)
                      THEN b_value ELSE f_value END, 2) AS nearest_event_value,
           CASE WHEN b_epoch IS NULL AND f_epoch IS NULL THEN NULL
                WHEN f_epoch IS NULL
                  OR (b_epoch IS NOT NULL
                      AND order_epoch - b_epoch <= f_epoch - order_epoch)
                THEN 'backward' ELSE 'forward' END AS direction
    FROM back JOIN fwd ON back.o_orderkey = fwd.o_orderkey
"""
QUERIES["asof_join_nearest"] = q_asof_join_nearest


def q_monthly_revenue_yoy(spark, sf_dir):
    """Year-over-year revenue growth per month — the seasonal-adjusted
    KPI delta (MoM's 12-lag sibling): exact cents per month joined to
    the month twelve indices earlier (index join, robust to gaps),
    growth = ONE division, null for the first year.  Scale: month-grain
    aggregate; the self-join runs on the model-sized month table."""
    o = _t(spark, sf_dir, "orders").select(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("midx"),
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    per = o.groupBy("midx", "month").agg(F.sum("cents").alias("rev"))
    prev = per.select(
        (F.col("midx") + 12).alias("midx"), F.col("rev").alias("rev_prev")
    )
    return (
        per.join(prev, "midx", "left")
        .select(
            "month",
            F.col("rev").cast("long").alias("revenue_cents"),
            F.round(
                (F.col("rev") - F.col("rev_prev")).cast("double")
                / F.col("rev_prev").cast("double"),
                6,
            ).alias("yoy_growth"),
        )
        .orderBy("month")
    )


ORACLE_SQL["monthly_revenue_yoy"] = """
    WITH per AS (
      SELECT year(o_orderdate) * 12 + month(o_orderdate) AS midx,
             strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
               AS rev
      FROM orders GROUP BY 1, 2
    )
    SELECT cur.month, cur.rev AS revenue_cents,
           round(CAST(cur.rev - prev.rev AS DOUBLE) / CAST(prev.rev AS DOUBLE), 6)
             AS yoy_growth
    FROM per cur LEFT JOIN per prev ON prev.midx + 12 = cur.midx
    ORDER BY cur.month
"""
QUERIES["monthly_revenue_yoy"] = q_monthly_revenue_yoy


def q_stream_value_skewness(spark, sf_dir):
    """STREAMING sufficient-statistics maintenance driven end-to-end:
    events replay in three mtime-pinned micro-batches; the per-type
    moment vector (n, S1, S2, S3) is a complete-mode aggregation with
    ONE ROW of state per group BY CONSTRUCTION (sums add — stream ==
    batch bit-for-bit); after the drain, mean and skewness derive from
    the STREAMED state alone via the exact g1 = A/B^(3/2) reduction and
    hash-match the batch twin's oracle (``value_skewness_by_type``).
    The fourth bounded-state streaming family member: counters (CMS,
    Benford), registers (MinCount), value-count tables (quantile), and
    now moment vectors.  Shares the batch twin's decimal(38,0) ceiling:
    exact to ~2.5e7 rows per type at cmax ~ 1e5 cents (see
    ``q_value_skewness_by_type``)."""
    import shutil
    import uuid

    from parquet_merger_spark.streaming.events import moment_sums_stream

    base = _scratch_dir(spark, "stream_value_skewness")
    shutil.rmtree(base, ignore_errors=True)

    e = _events(spark, sf_dir).select("event_id", "event_type", "value")
    slices = [e.filter(F.col("event_id") % 3 == i) for i in range(3)]
    src = _write_replay_batches(base, slices)

    name = f"smom_{uuid.uuid4().hex[:8]}"
    q = moment_sums_stream(
        spark, src, os.path.join(base, "ckpt"), query_name=name
    )
    _drain_stream(q, "stream_value_skewness")
    agg = spark.table(name).transform(materialize)

    a = (
        F.col("s3") * F.col("n") * F.col("n")
        - F.col("s1").cast("decimal(38,0)") * F.col("s2") * F.col("n") * 3
        + F.col("s1").cast("decimal(38,0)") * F.col("s1") * F.col("s1") * 2
    )
    # decimal(38,0), NOT int64: at the documented sf125 ceiling
    # n*s2 ~ 2.5e7 * 2.5e17 = 6e24 >> 2^63 — B would wrap long before
    # A's decimal bound binds (DuckDB mirrors with HUGEINT)
    b = (
        F.col("n").cast("decimal(38,0)") * F.col("s2")
        - F.col("s1").cast("decimal(38,0)") * F.col("s1")
    )
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round(
            F.col("s1").cast("double") / (F.lit(100.0) * F.col("n").cast("double")), 6
        ).alias("mean_value"),
        F.round(
            a.cast("double") / (F.sqrt(b.cast("double")) * b.cast("double")), 6
        ).alias("skewness"),
    )


ORACLE_SQL["stream_value_skewness"] = ORACLE_SQL["value_skewness_by_type"]
QUERIES["stream_value_skewness"] = q_stream_value_skewness


def q_stream_constraint_audit(spark, sf_dir):
    """STREAMING data-contract gate driven end-to-end: lineitem replays
    in three mtime-pinned micro-batches, stream-static joins the orders
    dimension (the enrich shape), and all five CHECK rules fold as
    conditional counters in ONE complete-mode aggregation — a single
    state row BY CONSTRUCTION.  Counters add, so the streamed counts
    equal the batch audit bit-for-bit; the derived per-rule table
    hash-matches the batch twin's oracle
    (``constraint_violations_audit``).  The 100 TB shape: constraint
    compliance monitored continuously in O(rules) state, no rescan."""
    import shutil
    import uuid

    from parquet_merger_spark.streaming.events import constraint_counts_stream

    base = _scratch_dir(spark, "stream_constraint_audit")
    shutil.rmtree(base, ignore_errors=True)

    li = _t(spark, sf_dir, "lineitem")
    slices = [li.filter(F.col("l_orderkey") % 3 == i) for i in range(3)]
    src = _write_replay_batches(base, slices)

    o = _t(spark, sf_dir, "orders")
    name = f"scon_{uuid.uuid4().hex[:8]}"
    q = constraint_counts_stream(
        spark, src, o, os.path.join(base, "ckpt"), query_name=name
    )
    _drain_stream(q, "stream_constraint_audit")
    agg = spark.table(name).transform(materialize)

    rule_names = [
        "discount_in_0_1",
        "quantity_positive",
        "extendedprice_positive",
        "ship_after_order",
        "tax_nonnegative",
    ]
    stacked = agg.select(
        "n_rows",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(nm).alias("rule"), F.col(f"v_{i}").alias("n_violations")
                    )
                    for i, nm in enumerate(rule_names)
                ]
            )
        ).alias("r"),
    )
    return stacked.select(
        "r.rule",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("r.n_violations").cast("long").alias("n_violations"),
    ).orderBy("rule")


ORACLE_SQL["stream_constraint_audit"] = ORACLE_SQL["constraint_violations_audit"]
QUERIES["stream_constraint_audit"] = q_stream_constraint_audit
