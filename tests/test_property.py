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
