"""Round-6 widening-wave pins: plan hygiene for the multi-consumer
edge-set keys (the 366-exchange lineage explosion must not return) and
semantic unit tests for the new statistics against hand-computed truth.
The oracle differential for every wave key lives in test_oracle.py via
parameterization; these tests pin what the oracle compare cannot see.
"""

from __future__ import annotations

import math
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from parquet_merger_spark.plans.audit import plan_digest  # noqa: E402
from parquet_merger_spark.queries import QUERIES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


# --- plan hygiene -----------------------------------------------------------


def test_kcore_lineage_bounded(spark):
    """Two peel rounds must NOT double lineage per round: without the
    eager checkpoint barrier this plan digested 366 hash exchanges."""
    d = plan_digest(QUERIES["graph_kcore_portable"](spark, SF_DIR))
    assert d["hash_exchanges"] <= 8, d
    assert d["cartesian_products"] == 0


def test_neighbor_jaccard_lineage_bounded(spark):
    """The edge list feeds four subtrees; the barrier keeps the lineitem
    self-join computed once (31 -> 7 exchanges)."""
    d = plan_digest(QUERIES["neighbor_jaccard"](spark, SF_DIR))
    assert d["hash_exchanges"] <= 12, d
    assert d["cartesian_products"] == 0


# --- semantic spot checks against hand-computed truth -----------------------


def test_benford_digit_extraction(spark):
    """First-significant-digit via integer-cents string must match the
    mathematical first digit for prices >= 0.01."""
    df = spark.createDataFrame(
        [(1013.70,), (499978.59,), (0.01,), (9.99,), (100000.0,)],
        "o_totalprice double",
    )
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    got = [
        r[0]
        for r in df.select(
            F.substring(cents.cast("string"), 1, 1).cast("int")
        ).collect()
    ]
    assert got == [1, 4, 1, 9, 1]


def test_kappa_perfect_agreement_is_one():
    """kappa = (n(a+d) - E)/(n^2 - E) must be 1 under perfect agreement
    and 0 when raters are independent (checked with exact integers)."""
    def kappa(a, b, c, d):
        n = a + b + c + d
        e = (a + b) * (a + c) + (c + d) * (b + d)
        return (n * (a + d) - e) / (n * n - e)

    assert kappa(40, 0, 0, 60) == 1.0
    # independence: joint = product of marginals -> kappa 0
    assert abs(kappa(24, 36, 16, 24)) < 1e-12


def test_skewness_formula_matches_numpy(spark):
    """g1 = A/B^(3/2) from exact moment sums equals the direct
    population-skewness computation."""
    import numpy as np

    vals = [1.0, 2.0, 2.0, 3.0, 7.0, 9.0, 11.0]
    cents = np.array([round(v * 100) for v in vals], dtype=np.int64)
    n = len(cents)
    s1, s2, s3 = cents.sum(), (cents**2).sum(), (cents.astype(object) ** 3).sum()
    a = n * n * s3 - 3 * n * s1 * s2 + 2 * s1**3
    b = n * s2 - s1 * s1
    got = float(a) / (math.sqrt(float(b)) * float(b))
    mu = cents.mean()
    expect = ((cents - mu) ** 3).mean() / ((cents - mu) ** 2).mean() ** 1.5
    assert abs(got - expect) < 1e-9


def test_rolling_median_crafted(spark):
    """Lower median of the last-5 frame, hand-checked."""
    from pyspark.sql import Window

    rows = [(1, i, float(v)) for i, v in enumerate([5, 1, 9, 3, 7, 2])]
    df = spark.createDataFrame(rows, "user_id long, event_id long, value double")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(-4, 0)
    )
    arr = F.sort_array(
        F.collect_list(F.round(F.col("value") * 100, 0).cast("long")).over(w)
    )
    out = [
        r[0]
        for r in df.select(
            F.element_at(arr, ((F.size(arr) + 1) / 2).cast("int"))
        ).orderBy("event_id").collect()
    ]
    # frames: [5] [5,1] [5,1,9] [5,1,9,3] [5,1,9,3,7] [1,9,3,7,2]
    assert out == [500, 100, 500, 300, 500, 300]


def test_winsorized_mean_clamps(spark, tmp_path):
    """The real query, driven over a crafted one-nation fixture where the
    p95 clamp provably changes the mean: 20 orders priced 1..19 and 1000.
    rank rule: p05 = min cents with cum*100 >= 5*20 -> 1; p95 = min cents
    with cum*100 >= 95*20 -> 19.  The 1000 outlier clamps to 19, so the
    winsorized mean is (1+..+19 + 19)/20 = 10.45 (raw mean would be 59.5)."""
    d = str(tmp_path)
    prices = [float(i) for i in range(1, 20)] + [1000.0]
    spark.createDataFrame(
        [(i, prices[i - 1]) for i in range(1, 21)],
        "o_custkey long, o_totalprice double",
    ).coalesce(1).write.parquet(f"{d}/orders.parquet")
    spark.createDataFrame(
        [(i, 0) for i in range(1, 21)], "c_custkey long, c_nationkey long"
    ).coalesce(1).write.parquet(f"{d}/customer.parquet")
    spark.createDataFrame(
        [(0, "CRAFTLAND")], "n_nationkey long, n_name string"
    ).coalesce(1).write.parquet(f"{d}/nation.parquet")
    rows = QUERIES["winsorized_mean_by_nation"](spark, d).collect()
    assert len(rows) == 1
    assert rows[0]["nation"] == "CRAFTLAND"
    assert rows[0]["n_orders"] == 20
    assert rows[0]["winsorized_mean"] == 10.45

    out = {
        r["nation"]: r["winsorized_mean"]
        for r in QUERIES["winsorized_mean_by_nation"](spark, SF_DIR).collect()
    }
    # fixture sanity: every winsorized mean is finite and positive, 25 nations
    assert len(out) == 25
    assert all(v > 0 for v in out.values())


def test_tv_divergence_bounds(spark):
    """Total variation lies in [0, 1] AND the mean is actually small for
    sources drawn from the corpus distribution (fixture measures ~0.057
    with max 0.073; a broken divergence collapsing to a constant 0 or
    pinned at 1 fails the band) — the old body only asserted [0, 1],
    which any correctly-typed wrong computation satisfies."""
    rows = QUERIES["source_divergence_tv"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["tv_divergence"] <= 1.0
    vals = [r["tv_divergence"] for r in rows]
    mean = sum(vals) / len(vals)
    assert 0.01 < mean < 0.3, mean  # small but NON-ZERO sampling noise
    assert max(vals) > 0.0


def test_kfold_folds_complete(spark):
    """Every (lang, fold) cell count is positive and folds cover 0..4."""
    rows = QUERIES["stratified_kfold_assign"](spark, SF_DIR).collect()
    folds = {r["fold"] for r in rows}
    assert folds == {0, 1, 2, 3, 4}
    assert all(r["n_docs"] > 0 for r in rows)


def test_stream_benford_state_is_digit_bounded(spark):
    """The streamed Benford counter table equals the batch digit counts
    (counters add) — certified at the key level by the shared oracle;
    here pin the 9-row state bound explicitly."""
    out = QUERIES["stream_benford_audit"](spark, SF_DIR).collect()
    assert len(out) == 9
    assert sorted(r["digit"] for r in out) == list(range(1, 10))


# --- later-wave semantic pins ------------------------------------------------


def test_label_contrast_centroid_identity():
    """sum_{i in A, j in B} x_i.x_j == S_A.S_B — the identity the
    pair-join-free contrast key rides on, checked against brute force."""
    import numpy as np

    rng = np.random.RandomState(7)
    a = rng.randint(-100, 100, size=(5, 8)).astype(np.int64)
    b = rng.randint(-100, 100, size=(3, 8)).astype(np.int64)
    brute = sum(int(x @ y) for x in a for y in b)
    identity = int(a.sum(axis=0) @ b.sum(axis=0))
    assert brute == identity


def test_ols_multivariate_recovers_planted_betas(spark):
    """The Cramer-rule normal equations recover exactly-planted
    coefficients from synthetic integer data."""
    import numpy as np

    rng = np.random.RandomState(3)
    x1 = rng.randint(1, 8, 200)
    x2 = rng.randint(1, 300, 200)
    y = 700 + 5 * x1 + 3 * x2  # exact integer plant, zero residual
    n = 200
    sx1, sx2, sy = int(x1.sum()), int(x2.sum()), int(y.sum())
    s11, s12, s22 = int((x1 * x1).sum()), int((x1 * x2).sum()), int((x2 * x2).sum())
    s1y, s2y = int((x1 * y).sum()), int((x2 * y).sum())
    a11 = s11 * n - sx1 * sx1
    a12 = s12 * n - sx1 * sx2
    a22 = s22 * n - sx2 * sx2
    b1 = s1y * n - sx1 * sy
    b2 = s2y * n - sx2 * sy
    det = a11 * a22 - a12 * a12
    beta1 = (a22 * b1 - a12 * b2) / det
    beta2 = (a11 * b2 - a12 * b1) / det
    intercept = (sy - beta1 * sx1 - beta2 * sx2) / n
    assert abs(beta1 - 5) < 1e-9
    assert abs(beta2 - 3) < 1e-9
    assert abs(intercept - 700) < 1e-6


def test_weighted_median_rank_rule():
    """(W-1) div 2 + 1 selects the weighted lower median on a crafted
    weight table (values 1,2,3 with weights 1,4,1 -> median 2)."""
    vals = [(1, 1), (2, 4), (3, 1)]
    total = sum(w for _, w in vals)
    rank = (total - 1) // 2 + 1
    cum = 0
    got = None
    for v, w in vals:
        if cum < rank <= cum + w:
            got = v
            break
        cum += w
    assert got == 2


def test_rfm_tercile_bands_cover(spark):
    """Every (r, f, m) band index is in 1..3 and all customers land in
    exactly one cell (cells sum to the customer count)."""
    rows = QUERIES["rfm_segments"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 1 <= r["r_band"] <= 3
        assert 1 <= r["f_band"] <= 3
        assert 1 <= r["m_band"] <= 3
    n_customers = sum(r["n_customers"] for r in rows)
    from parquet_merger_spark.queries import _t
    assert n_customers == _t(spark, SF_DIR, "orders").select("o_custkey").distinct().count()


def test_asof_nearest_prefers_smaller_gap(spark):
    """nearest = min(|gap|), backward on ties — recomputed from the raw
    events for every sampled custkey: the chosen gap must not exceed the
    best gap in the other direction, and backward must win exact ties."""
    from parquet_merger_spark.queries import _events

    df = QUERIES["asof_join_nearest"](spark, SF_DIR)
    rows = df.filter(F.col("nearest_event_epoch").isNotNull()).limit(200).collect()
    assert rows
    custkeys = {r["o_custkey"] for r in rows}
    ev = (
        _events(spark, SF_DIR)
        .filter(F.col("user_id").isin(list(custkeys)))
        .select("user_id", F.col("ts").cast("long").alias("epoch"))
        .collect()
    )
    epochs_by_user = {}
    for e in ev:
        epochs_by_user.setdefault(e["user_id"], []).append(e["epoch"])
    for r in rows:
        assert r["direction"] in ("backward", "forward")
        t = r["order_epoch"]
        ep = epochs_by_user[r["o_custkey"]]
        back = [x for x in ep if x <= t]
        fwd = [x for x in ep if x >= t]
        b_gap = t - max(back) if back else None
        f_gap = min(fwd) - t if fwd else None
        chosen_gap = abs(t - r["nearest_event_epoch"])
        best = min(g for g in (b_gap, f_gap) if g is not None)
        assert chosen_gap == best
        if b_gap is not None and b_gap == f_gap:
            assert r["direction"] == "backward"
        if r["direction"] == "backward":
            assert chosen_gap == b_gap
        else:
            assert chosen_gap == f_gap


def test_stream_moment_state_one_row_per_group(spark):
    """The streamed sufficient-statistics table derives the same
    skewness as the batch key — and has exactly one row per type."""
    out = QUERIES["stream_value_skewness"](spark, SF_DIR).collect()
    types = [r["event_type"] for r in out]
    assert len(types) == len(set(types))
    batch = {
        r["event_type"]: r["skewness"]
        for r in QUERIES["value_skewness_by_type"](spark, SF_DIR).collect()
    }
    for r in out:
        assert r["skewness"] == batch[r["event_type"]]
