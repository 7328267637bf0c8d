"""Unit tests for the round-2 extension operators: PII redaction (the
oracle corpus is PII-free, so positive matches are exercised here),
repetition quality signals, per-source caps, and embedding
normalize+quantize."""

from __future__ import annotations

import math
import os
import sys

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parquet_merger_spark.operators.sampling import cap_per_group, hash_gate  # noqa: E402
from parquet_merger_spark.operators.simsearch import normalize_quantize  # noqa: E402
from parquet_merger_spark.operators.textstats import (  # noqa: E402
    redact_pii,
    with_repetition_stats,
)


# ---------------------------------------------------------------- PII


def test_redact_pii_positive_cases(spark):
    rows = [
        (1, "contact me at alice.smith+spam@example.co.uk for details"),
        (2, "server at 192.168.1.100 and backup 10.0.0.1 are down"),
        (3, "call 555-123-4567 or 800-555-1212 now"),
        (4, "mixed: bob@test.org from 127.0.0.1 dialed 555-000-9999"),
        (5, "clean text with no pii at all"),
        (6, "not-a-phone 12-345-6789 and half.an@email"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}

    assert out[1]["n_emails"] == 1 and "<EMAIL>" in out[1]["text_redacted"]
    assert "alice" not in out[1]["text_redacted"]
    assert out[2]["n_ipv4"] == 2
    assert out[2]["text_redacted"] == "server at <IP> and backup <IP> are down"
    assert out[3]["n_phones"] == 2
    assert out[3]["text_redacted"] == "call <PHONE> or <PHONE> now"
    assert (out[4]["n_emails"], out[4]["n_ipv4"], out[4]["n_phones"]) == (1, 1, 1)
    assert out[4]["text_redacted"] == "mixed: <EMAIL> from <IP> dialed <PHONE>"
    assert out[5]["text_redacted"] == out[5]["text"]
    assert (out[5]["n_emails"], out[5]["n_ipv4"], out[5]["n_phones"]) == (0, 0, 0)
    # 12-345-6789 fails the 3-3-4 shape; half.an@email has no TLD dot
    assert (out[6]["n_emails"], out[6]["n_phones"]) == (0, 0)


def test_redact_pii_email_with_ip_host_counts_once(spark):
    df = spark.createDataFrame([(1, "user@1.2.3.4 logged in")], ["doc_id", "text"])
    r = redact_pii(df).collect()[0]
    # counted independently on the original text (email pattern needs an
    # alpha TLD so user@1.2.3.4 is NOT an email; the IP still matches)
    assert r["n_emails"] == 0 and r["n_ipv4"] == 1
    assert r["text_redacted"] == "user@<IP> logged in"


# ---------------------------------------------------------- repetition


def test_repetition_stats_hand_computed(spark):
    #              tokens: a b a b a  -> n=5, distinct=2
    # bigrams: "a b","b a","a b","b a" -> n=4, top("a b")=2
    df = spark.createDataFrame([(1, "a b a b a")], ["doc_id", "text"])
    r = with_repetition_stats(df).collect()[0]
    assert r["n_tokens"] == 5
    assert r["n_distinct_tokens"] == 2
    assert r["dup_token_frac"] == pytest.approx(1 - 2 / 5)
    assert r["top_token_frac"] == pytest.approx(3 / 5)
    assert r["top_bigram_frac"] == pytest.approx(2 / 4)


def test_repetition_stats_single_token_doc(spark):
    df = spark.createDataFrame([(1, "solo")], ["doc_id", "text"])
    r = with_repetition_stats(df).collect()[0]
    assert r["n_tokens"] == 1 and r["n_distinct_tokens"] == 1
    assert r["dup_token_frac"] == 0.0
    assert r["top_token_frac"] == 1.0
    assert r["top_bigram_frac"] == 0.0  # no bigrams


def test_repetition_all_same_token(spark):
    df = spark.createDataFrame([(1, "x x x x")], ["doc_id", "text"])
    r = with_repetition_stats(df).collect()[0]
    assert r["dup_token_frac"] == pytest.approx(0.75)
    assert r["top_token_frac"] == 1.0
    assert r["top_bigram_frac"] == 1.0


# ------------------------------------------------------------- capping


def test_cap_per_group_matches_plain_window(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    gate = hash_gate(F.col("doc_id"))
    capped = cap_per_group(docs, "source", cap=7, id_col="doc_id")

    w = Window.partitionBy("source").orderBy(gate.asc(), F.col("doc_id").asc())
    plain = (
        docs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 7)
    )
    got = sorted(capped.select("source", "doc_id", "rank").collect())
    want = sorted(plain.select("source", "doc_id", "rank").collect())
    assert got == want

    per_group = capped.groupBy("source").count().collect()
    assert all(r["count"] <= 7 for r in per_group)


def test_cap_per_group_partitioning_invariant(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    a = sorted(
        cap_per_group(docs, "source", 5).select("source", "doc_id").collect()
    )
    b = sorted(
        cap_per_group(docs.repartition(17), "source", 5)
        .select("source", "doc_id")
        .collect()
    )
    assert a == b


# --------------------------------------------------- normalize+quantize


def test_normalize_quantize_unit_norm_and_bounds(spark):
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").limit(50)
    rows = normalize_quantize(emb, "vec_id", "embedding").collect()
    by_vec: dict[int, list] = {}
    for r in rows:
        by_vec.setdefault(r["vec_id"], []).append(r)
    src = {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}
    assert set(by_vec) == set(src)
    for vid, parts in by_vec.items():
        assert len(parts) == 64  # one row per dimension
        assert all(-127 <= p["q_unit"] <= 127 for p in parts)
        # unit-norm up to int8-grid truncation: sum (q/127)^2 ~ 1
        # (floor rounds negatives toward -inf, so magnitudes can each be
        # up to 1/127 over — allow the quadratic overshoot)
        s = sum((p["q_unit"] / 127.0) ** 2 for p in parts)
        assert 0.8 <= s <= 1.05
        # norm_q reproduces the float32 L2 norm to quantization precision
        true_norm = math.sqrt(sum(x * x for x in src[vid]))
        assert by_vec[vid][0]["norm_q"] / 1e6 / 10_000 == pytest.approx(
            true_norm, rel=1e-3
        )


def test_normalize_quantize_zero_vector_guard(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [3.0, 4.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    rows = normalize_quantize(df, "vec_id", "embedding").collect()
    zero = [r for r in rows if r["vec_id"] == 1]
    assert all(r["q_unit"] == 0 and r["norm_q"] == 0 for r in zero)
    nz = {r["pos"]: r["q_unit"] for r in rows if r["vec_id"] == 2}
    # 3-4-5 triangle: unit = (0.6, 0.8, 0) -> floor(q*127/norm)
    assert nz[0] == math.floor(30000 * 127 / 50000)
    assert nz[1] == math.floor(40000 * 127 / 50000)
    assert nz[2] == 0


# ---------------------------------------------------------------------------
# bm25_scores
# ---------------------------------------------------------------------------


def test_bm25_hand_computed_single_term(spark):
    """One query term, two docs: score follows the BM25 formula with the
    ratio idf exactly (hand computation)."""
    from parquet_merger_spark.operators.textstats import bm25_scores

    docs = spark.createDataFrame(
        [
            (1, "spark spark other word"),      # tf=2, dl=4
            (2, "spark plain text here here"),  # tf=1, dl=5
            (3, "nothing relevant at all"),     # tf=0, dl=4
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["bm25"] for r in bm25_scores(docs, ["spark"]).collect()}
    n, df_t = 3, 2
    k1, b = 1.2, 0.75
    avgdl = (4 + 5 + 4) / 3
    idf = (n - df_t + 0.5) / (df_t + 0.5)

    def s(tf, dl):
        return idf * (tf * (k1 + 1.0)) / (tf + k1 * (1 - b + b * dl / avgdl))

    assert got[1] == round(s(2, 4), 6)
    assert got[2] == round(s(1, 5), 6)
    assert got[3] == 0.0


def test_bm25_sums_terms_in_listed_order_and_covers_all_docs(spark):
    """Multi-term score is the fixed-order sum of per-term scores, and
    every input doc appears (zero when no term matches)."""
    from parquet_merger_spark.operators.textstats import bm25_scores

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["alpha beta", "beta gamma beta", "delta", "alpha alpha gamma"]
        )],
        "doc_id long, text string",
    )
    both = bm25_scores(docs, ["alpha", "beta"])
    assert both.count() == 4
    a = {r["doc_id"]: r["bm25"] for r in bm25_scores(docs, ["alpha"]).collect()}
    bt = {r["doc_id"]: r["bm25"] for r in bm25_scores(docs, ["beta"]).collect()}
    ab = {r["doc_id"]: r["bm25"] for r in both.collect()}
    for d in ab:
        # rounding happens once at the end, so compare loosely here
        assert abs(ab[d] - (a[d] + bt[d])) < 2e-6
    assert ab[2] == 0.0  # "delta" matches neither term


# ---------------------------------------------------------------------------
# bpe_learn_merges
# ---------------------------------------------------------------------------


def _bpe_replay(word_counts: dict[str, int], k: int, min_pair: int = 2):
    """Pure-Python BPE reference: same rule (count desc, pair asc)."""
    vocab = {w: list(w) for w in word_counts}
    rules = []
    for step in range(k):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            n = word_counts[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_pair:
            break
        ab = a + b
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
        rules.append((step, a, b, ab, cnt))
    return rules


def test_bpe_learn_merges_tiny_known(spark):
    from parquet_merger_spark.operators.textstats import bpe_learn_merges

    docs = spark.createDataFrame(
        [(1, "low low low lower"), (2, "lowest low")], "doc_id long, text string"
    )
    got = bpe_learn_merges(docs, k=3)
    expect = _bpe_replay({"low": 4, "lower": 1, "lowest": 1}, 3)
    assert got == expect
    # first merge must be the most frequent adjacent pair: (l, o) count 6
    assert got[0][1:] == ("l", "o", "lo", 6)


def test_bpe_learn_merges_matches_python_replay_on_fixture(spark):
    from parquet_merger_spark.operators.textstats import bpe_learn_merges
    from parquet_merger_spark.queries import _t

    d = _t(spark, "/root/testdata/sf0.001", "documents")
    wc = {}
    for r in d.collect():
        for w in r["text"].split(" "):
            if w:
                wc[w] = wc.get(w, 0) + 1
    assert bpe_learn_merges(d, k=8) == _bpe_replay(wc, 8)


def test_bpe_overlapping_pairs_merge_left_to_right(spark):
    from parquet_merger_spark.operators.textstats import bpe_learn_merges

    # "aaaa" x3: pair (a,a) counts 3*3=9; after merge words become
    # [aa, aa]; next merge (aa, aa)
    docs = spark.createDataFrame([(1, "aaaa aaaa aaaa")], "doc_id long, text string")
    got = bpe_learn_merges(docs, k=2)
    assert got[0] == (0, "a", "a", "aa", 9)
    assert got[1] == (1, "aa", "aa", "aaaa", 3)


def test_bpe_encode_matches_python_replay(spark):
    from parquet_merger_spark.operators.textstats import bpe_encode_docs
    from parquet_merger_spark.queries import _t

    d = _t(spark, "/root/testdata/sf0.001", "documents")
    wc: dict[str, int] = {}
    texts = {}
    for r in d.collect():
        texts[r["doc_id"]] = r["text"]
        for w in r["text"].split(" "):
            if w:
                wc[w] = wc.get(w, 0) + 1
    rules = _bpe_replay(wc, 8)

    def segment(word: str) -> list[str]:
        syms = list(word)
        for _, a, b, ab, _c in rules:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    got = {
        r["doc_id"]: (r["n_words"], r["n_subwords"], r["subwords"])
        for r in bpe_encode_docs(d, k=8).collect()
    }
    for doc_id, text in texts.items():
        words = [w for w in text.split(" ") if w]
        subs = [s for w in words for s in segment(w)]
        assert got[doc_id] == (len(words), len(subs), " ".join(subs)), doc_id


def test_bpe_encode_keeps_blank_docs(spark):
    from parquet_merger_spark.operators.textstats import bpe_encode_docs

    docs = spark.createDataFrame(
        [(1, "low low"), (2, ""), (3, " ")], "doc_id long, text string"
    )
    got = {r["doc_id"]: (r["n_words"], r["n_subwords"], r["subwords"])
           for r in bpe_encode_docs(docs, k=2).collect()}
    assert set(got) == {1, 2, 3}
    assert got[2] == (0, 0, "")
    assert got[3] == (0, 0, "")
    assert got[1][0] == 2 and got[1][1] >= 2
