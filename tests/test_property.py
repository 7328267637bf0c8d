"""Property-based equivalence tests (hypothesis) for the round-3
operators whose semantics have a crisp reference implementation:
triangle census vs brute-force enumeration, connected components vs
union-find, BPE training vs a literal Python replay, BM25 vs the formula.

Few examples per property (Spark round-trips are slow) — the value is
adversarial STRUCTURE (random graphs/corpora hypothesis shrinks), not
volume; the fixture-scale oracle tests cover volume.
"""

from __future__ import annotations

import itertools
import os
import sys

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_SET = settings(
    max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)


def test_triangle_count_matches_bruteforce(spark):
    from parquet_merger_spark.operators.graph import triangle_count

    @_SET
    @given(
        edges=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=9),
                st.integers(min_value=0, max_value=9),
            ),
            min_size=1,
            max_size=25,
        )
    )
    def check(edges):
        undirected = {
            (min(a, b), max(a, b)) for a, b in edges if a != b
        }
        # empty after self-loop drop is a legal input: the census must
        # return exact zeros, never NULL sums
        nodes = sorted({v for e in undirected for v in e})
        brute = sum(
            1
            for x, y, z in itertools.combinations(nodes, 3)
            if (x, y) in undirected
            and (x, z) in undirected
            and (y, z) in undirected
        )
        df = spark.createDataFrame(list(edges), "src long, dst long")
        got = triangle_count(df).collect()[0]
        assert got["n_triangles"] == brute
        assert got["n_edges"] == len(undirected)
        assert got["n_vertices"] == len(nodes)

    check()


def test_dup_clusters_matches_union_find(spark):
    from parquet_merger_spark.operators.dedup import dup_clusters

    @_SET
    @given(
        pairs=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=14),
                st.integers(min_value=0, max_value=14),
            ),
            min_size=1,
            max_size=20,
        ),
        steps=st.sampled_from([1, 2, 3]),
    )
    def check(pairs, steps):
        parent: dict[int, int] = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        expect = {x: find(x) for x in parent}
        df = spark.createDataFrame(list(pairs), "id_a long, id_b long")
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in dup_clusters(df, steps_per_round=steps).collect()
        }
        # dup_clusters covers every node that appears in a pair,
        # including self-pairs (a, a)
        assert got == expect

    check()


def test_bpe_matches_python_replay(spark):
    from parquet_merger_spark.operators.textstats import bpe_learn_merges

    from tests.test_textstats_ext import _bpe_replay

    words = st.text(alphabet="abc", min_size=1, max_size=6)

    @_SET
    @given(corpus=st.lists(words, min_size=1, max_size=15))
    def check(corpus):
        text = " ".join(corpus)
        wc: dict[str, int] = {}
        for w in corpus:
            wc[w] = wc.get(w, 0) + 1
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        assert bpe_learn_merges(df, k=4) == _bpe_replay(wc, 4)

    check()


def test_bm25_matches_formula(spark):
    from parquet_merger_spark.operators.textstats import bm25_scores

    words = st.sampled_from(["red", "blue", "green", "dot", "x"])

    @_SET
    @given(
        docs=st.lists(
            st.lists(words, min_size=1, max_size=8), min_size=1, max_size=6
        )
    )
    def check(docs):
        terms = ["red", "blue"]
        k1, b = 1.2, 0.75
        n = len(docs)
        avgdl = sum(len(d) for d in docs) / n
        dfreq = {t: sum(1 for d in docs if t in d) for t in terms}

        def score(d):
            s = 0.0
            for t in terms:
                tf = d.count(t)
                if tf == 0 or dfreq[t] == 0:
                    continue
                idf = (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5)
                s += (
                    idf
                    * (tf * (k1 + 1.0))
                    / (tf + k1 * (1.0 - b + b * len(d) / avgdl))
                )
            return s

        df = spark.createDataFrame(
            [(i, " ".join(d)) for i, d in enumerate(docs)],
            "doc_id long, text string",
        )
        got = {r["doc_id"]: r["bm25"] for r in bm25_scores(df, terms).collect()}
        assert set(got) == set(range(n))
        for i, d in enumerate(docs):
            assert abs(got[i] - score(d)) <= 2e-6, (i, d, got[i], score(d))

    check()


def test_assign_row_ids_is_permutation_any_buckets(spark):
    """Property: for ANY key distribution (duplicates, negatives,
    constants) and ANY bucket count, row ids are exactly 1..n and agree
    with the global-window ranking."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from parquet_merger_spark.operators.ranking import assign_row_ids

    @_SET
    @given(
        keys=st.lists(
            st.integers(min_value=-50, max_value=50), min_size=1, max_size=40
        ),
        n_buckets=st.sampled_from([1, 2, 7, 64]),
    )
    def check(keys, n_buckets):
        df = spark.createDataFrame(
            [(i, float(k)) for i, k in enumerate(keys)], "id long, v double"
        )
        got = assign_row_ids(df, "v", ["id"], n_buckets=n_buckets)
        rows = got.collect()
        assert sorted(r["row_id"] for r in rows) == list(
            range(1, len(keys) + 1)
        )
        w = Window.orderBy("v", "id")
        want = {
            (r["id"]): r["rid"]
            for r in df.withColumn(
                "rid", F.row_number().over(w).cast("long")
            ).collect()
        }
        assert {r["id"]: r["row_id"] for r in rows} == want

    check()


def test_temperature_sample_subset_and_cap_properties(spark):
    """Property: the kept set is always a subset of the input, strata
    with zero token mass never survive, and an unbounded budget keeps
    EVERYTHING (every threshold caps at the gate modulus)."""
    from pyspark.sql import functions as F

    from parquet_merger_spark.operators.sampling import (
        portable_hash_gate,
        temperature_sample,
    )

    @_SET
    @given(
        rows=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=500),
                st.sampled_from(["a", "b", "c"]),
                st.integers(min_value=0, max_value=200),
            ),
            min_size=1,
            max_size=30,
            unique_by=lambda t: t[0],
        ),
        budget=st.sampled_from([10, 1_000, 10_000_000]),
    )
    def check(rows, budget):
        df = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")
        kept = temperature_sample(
            df, budget_tokens=budget,
            gate=portable_hash_gate(F.col("doc_id"), salt=5),
        ).collect()
        in_ids = {r[0] for r in rows}
        assert {r["doc_id"] for r in kept} <= in_ids
        mass = {}
        for _, lang, t in rows:
            mass[lang] = mass.get(lang, 0) + t
        assert all(mass[r["lang"]] > 0 for r in kept)
        if budget == 10_000_000:
            expect = {i for i, lang, t in rows if mass[lang] > 0}
            assert {r["doc_id"] for r in kept} == expect

    check()
