"""Round-7 pin upgrades: drive the REAL contract keys against
independent raw-parquet recomputes.

The r07 test review found seven 'semantic pins' in test_round6_waves.py
that re-implement a formula inside the test and verify the copy — a
shared-formula bug in the key + its oracle (the r06
embedding_centroid_drift class) would sail past both the oracle
differential AND those pins.  Each test here pulls the key's actual
output and compares it against a third implementation computed with
pandas/numpy straight off the fixture parquet — no shared Spark
expressions, no shared SQL.
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from parquet_merger_spark.queries import QUERIES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


def test_rater_agreement_kappa_matches_pandas(spark):
    """The real key's 2x2 cells AND kappa vs a pandas recompute."""
    d = pd.read_parquet(os.path.join(SF_DIR, "documents.parquet"))
    ra = (d["n_chars"] > 500).astype(int)
    rb = (d["text"].str.split(" ").str.len() > 80).astype(int)
    n = len(d)
    a = int(((ra == 1) & (rb == 1)).sum())
    b = int(((ra == 1) & (rb == 0)).sum())
    c = int(((ra == 0) & (rb == 1)).sum())
    dd = int(((ra == 0) & (rb == 0)).sum())
    e = (a + b) * (a + c) + (c + dd) * (b + dd)
    expect = round((n * (a + dd) - e) / (n * n - e), 6)

    row = QUERIES["rater_agreement_kappa"](spark, SF_DIR).collect()[0]
    assert (row["both_pass"], row["only_a"], row["only_b"], row["neither"]) == (
        a, b, c, dd,
    )
    assert abs(row["kappa"] - expect) < 1e-9


def test_rolling_median_user_matches_pandas(spark):
    """Every output row's trailing-5 lower median vs a pandas replay."""
    e = pd.read_parquet(os.path.join(SF_DIR, "events.parquet"))
    e = e[e["user_id"] % 50 == 0].copy()
    e["cents"] = (e["value"] * 100).round().astype("int64")
    expect = {}
    for uid, g in e.sort_values(["ts", "event_id"]).groupby("user_id"):
        vals: list[int] = []
        for _, r in g.iterrows():
            vals.append(int(r["cents"]))
            frame = sorted(vals[-5:])
            expect[(uid, int(r["event_id"]))] = frame[(len(frame) + 1) // 2 - 1]
    got = {
        (r["user_id"], r["event_id"]): r["rolling_median_cents"]
        for r in QUERIES["rolling_median_user"](spark, SF_DIR).collect()
    }
    assert got == expect and len(got) > 50


def test_label_cosine_contrast_matches_numpy(spark):
    """Within/across mean dots vs a brute-force-identity numpy recompute
    (the centroid identity itself is exercised by the real data here,
    not a synthetic matrix)."""
    t = pd.read_parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    q = np.stack(
        [np.round(np.asarray(v, dtype=np.float64) * 10000) for v in t["embedding"]]
    ).astype(object)  # exact python ints after round
    labels = t["label"].to_numpy()
    n = len(t)
    expect = {}
    st = q.sum(axis=0)
    for lab in np.unique(labels):
        m = labels == lab
        s = q[m].sum(axis=0)
        na = int(m.sum())
        qa = int((q[m] * q[m]).sum())
        saa = int((s * s).sum())
        sab = int((s * (st - s)).sum())
        within = round(float(saa - qa) / (na * (na - 1) * 1e8), 6)
        across = round(float(sab) / (na * (n - na) * 1e8), 6)
        expect[lab] = (na, within, across)
    got = {
        r["label"]: (
            r["n_vectors"],
            r["mean_dot_within"],
            r["mean_dot_across"],
        )
        for r in QUERIES["label_cosine_contrast"](spark, SF_DIR).collect()
    }
    for lab, (na, w, a) in expect.items():
        gna, gw, ga = got[lab]
        assert gna == na
        assert abs(gw - w) < 1e-6 and abs(ga - a) < 1e-6, (lab, got[lab], expect[lab])


def test_ols_multivariate_matches_numpy(spark):
    """Betas/intercept vs an exact-integer numpy recompute over the raw
    orders/lineitem join."""
    o = pd.read_parquet(os.path.join(SF_DIR, "orders.parquet"))
    li = pd.read_parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    g = li.groupby("l_orderkey").agg(
        x1=("l_partkey", "size"), x2=("l_quantity", "sum")
    )
    g["x2"] = g["x2"].round().astype("int64")
    j = o.set_index("o_orderkey").join(g, how="inner")
    y = (j["o_totalprice"] * 100).round().astype("int64")
    x1, x2 = j["x1"].astype("int64"), j["x2"]
    n = len(j)
    sx1, sx2, sy = int(x1.sum()), int(x2.sum()), int(y.sum())
    s11 = int((x1 * x1).sum())
    s12 = int((x1 * x2).sum())
    s22 = int((x2 * x2).sum())
    s1y = int((x1 * y).sum())
    s2y = int((x2 * y).sum())
    a11, a12, a22 = s11 * n - sx1 * sx1, s12 * n - sx1 * sx2, s22 * n - sx2 * sx2
    b1, b2 = s1y * n - sx1 * sy, s2y * n - sx2 * sy
    det = a11 * a22 - a12 * a12
    beta1 = float(a22 * b1 - a12 * b2) / float(det)
    beta2 = float(a11 * b2 - a12 * b1) / float(det)
    intercept = (sy - beta1 * sx1 - beta2 * sx2) / n

    row = QUERIES["ols_multivariate"](spark, SF_DIR).collect()[0]
    assert row["n_orders"] == n
    assert abs(row["beta_lines_cents"] - round(beta1, 6)) < 1e-4
    assert abs(row["beta_qty_cents"] - round(beta2, 6)) < 1e-4
    assert abs(row["intercept_cents"] - round(intercept, 6)) < 1e-2


def test_weighted_median_price_matches_pandas(spark):
    """Per-flag weighted lower median vs a pandas cumulative replay."""
    li = pd.read_parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    li = li.assign(
        cents=(li["l_extendedprice"] * 100).round().astype("int64"),
        w=li["l_quantity"].round().astype("int64"),
    )
    expect = {}
    for flag, g in li.groupby("l_returnflag"):
        cw = g.groupby("cents")["w"].sum().sort_index()
        tw = int(cw.sum())
        rank = (tw - 1) // 2 + 1
        cum = cw.cumsum()
        med = int(cum.index[(cum >= rank).argmax()])
        expect[flag] = (tw, med)
    got = {
        r["l_returnflag"]: (r["total_weight"], r["weighted_median_cents"])
        for r in QUERIES["weighted_median_price"](spark, SF_DIR).collect()
    }
    assert got == expect


def test_udtf_tokens_skips_empty_and_null_text(spark):
    """Direct edge coverage for the `if text:` guard (no fixture row has
    empty/null text, so the oracle's length(text) > 0 alignment was
    otherwise protected by nothing): '' and NULL yield NO rows, real
    text yields 1-based positions."""
    from parquet_merger_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    d = spark.createDataFrame(
        [(1, "a b"), (2, ""), (3, None)], "doc_id long, text string"
    )
    got = sorted(
        (r["doc_id"], r["pos"], r["tok"])
        for r in spark.sql(
            "SELECT d.doc_id, t.pos, t.tok FROM {d} d, "
            "LATERAL token_positions(d.text) t",
            d=d,
        ).collect()
    )
    assert got == [(1, 1, "a"), (1, 2, "b")]


def test_driver_green_keys_drives_real_classifier(tmp_path):
    """The LIVE _driver_green_keys over a synthetic artifact dir: a
    rows_match-but-hash-mismatch row must NOT classify green (the
    pre-fix fallback's only reachable effect), rows-only rows classify
    via err='no_oracle', and latest-round-wins."""
    import json

    import __spark_entry__ as e

    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({
        "red_value": {"rows_match": True, "schema_match": True,
                      "hash_match": False, "err": None},
        "green": {"rows_match": True, "schema_match": True,
                  "hash_match": True, "err": None},
        "rows_only": {"rows_match": None, "schema_match": None,
                      "hash_match": None, "err": "no_oracle"},
        "was_green": {"hash_match": True, "err": None},
    }))
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({
        # latest wins: green in r01, red in r02 -> NOT green
        "was_green": {"rows_match": True, "hash_match": False, "err": None},
    }))
    assert e._driver_green_keys(str(tmp_path)) == {"green", "rows_only"}


def test_profile_approximate_is_one_aggregate_plan(spark):
    """profile_table(approximate=True) must stay ONE aggregate over ONE
    scan (the single-pass property the mode exists for), not a
    per-column job loop."""
    from parquet_merger_spark.operators.profile import profile_table
    from parquet_merger_spark.plans.audit import plan_digest

    df = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    prof = profile_table(df, ["o_orderkey", "o_totalprice"], approximate=True)
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan
    d = plan_digest(prof)
    assert d["cartesian_products"] == 0
    got = {r["col_name"]: r for r in prof.collect()}
    assert got["o_orderkey"]["n_nulls"] == 0
