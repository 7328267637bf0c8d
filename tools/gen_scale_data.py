#!/usr/bin/env python3
"""Generate a 10x scale-up of the sf0.1 fixtures for scaling measurements.

/root/testdata is read-only and the driver recipe is not published, so
the sf1-equivalent lives under the repo (gitignored):
``.localdata/sf1/{lineitem,documents,embeddings}.parquet`` — only the
tables the scaling elephants read (graph_triangles / pagerank: lineitem;
dedup_pipeline_lsh: documents; semdedup / knn elephants: embeddings).

Construction = K=10 key-offset replicas of sf0.1, which preserves the
sf0.1 per-key distributions exactly while scaling global volume 10x —
the same shape real TPC-H scaling has (order count AND part count grow
with sf, per-order/per-part fan-out stays constant):

- lineitem: l_orderkey / l_partkey / l_suppkey offset per replica, so
  the co-occurrence graph gains 10x vertices and edges at constant
  degree structure (10 isomorphic components).
- documents: doc_id offset; every whitespace token gets a per-replica
  suffix, so shingle vocabularies are DISJOINT across replicas —
  in-replica near-dup structure is preserved verbatim and no artificial
  cross-replica duplicate pairs appear (plain replication would hand
  LSH 10 exact twins of every doc and explode the pair count).
- embeddings: vec_id offset; per-replica deterministic sign flips per
  dimension — cosine is sign-flip invariant within a replica (in-replica
  kNN/semdedup structure identical) while cross-replica similarities
  scramble like fresh corpus growth.

Deterministic throughout (seeded from the replica index), pure
pandas/pyarrow, no Spark needed.

Run from the repo root:  python tools/gen_scale_data.py [K] [DST] [tables...]

The second decade (sf10) chains the same construction: SRC=.localdata/sf1,
K=10, DST=.localdata/sf10.  CHAINED RUNS MUST USE A LEVEL-DISTINCT TAG
AND SEED BASE (r07 review finding): with the same ``·`` suffix at both
levels, sf1-replica-0 text suffixed ``·j`` inside sf10 replica j is
byte-identical to sf1's replica-j text sitting verbatim in sf10 replica
0 — every chained replica smuggled a full exact-duplicate 5k-doc block
into the "no artificial duplicates" corpus; likewise reusing sign-flip
seeds 1000+i at both levels made s_i*s_i cancel to exact duplicate
vectors.  ``SPARK_GRAFT_SCALE_TAG`` (default ``·``) and
``SPARK_GRAFT_SCALE_SEED_BASE`` (default 1000) make each level's
transform injective against the previous level's outputs:

    SPARK_GRAFT_SCALE_SRC=.localdata/sf1 SPARK_GRAFT_SCALE_TAG=‡ \
    SPARK_GRAFT_SCALE_SEED_BASE=2000 \
      python tools/gen_scale_data.py 10 .localdata/sf10 lineitem documents
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.environ.get("SPARK_GRAFT_SCALE_SRC", "/root/testdata/sf0.1")
DST = os.path.join(ROOT, ".localdata", "sf1")
# level-distinct knobs for chained (second-decade) generation — see the
# module docstring for why reusing them across levels manufactures
# exact duplicates
TAG = os.environ.get("SPARK_GRAFT_SCALE_TAG", "·")
SEED_BASE = int(os.environ.get("SPARK_GRAFT_SCALE_SEED_BASE", "1000"))


def gen_lineitem(src: str, dst: str, k: int) -> None:
    li = pd.read_parquet(os.path.join(src, "lineitem.parquet"))
    okey_span = int(li["l_orderkey"].max()) + 1
    pkey_span = int(li["l_partkey"].max()) + 1
    skey_span = int(li["l_suppkey"].max()) + 1
    reps = []
    for i in range(k):
        r = li.copy()
        r["l_orderkey"] = r["l_orderkey"] + i * okey_span
        r["l_partkey"] = r["l_partkey"] + i * pkey_span
        r["l_suppkey"] = r["l_suppkey"] + i * skey_span
        reps.append(r)
    big = pd.concat(reps, ignore_index=True)
    big.to_parquet(os.path.join(dst, "lineitem.parquet"), index=False)
    print(f"lineitem: {len(li)} -> {len(big)} rows", flush=True)


def gen_documents(src: str, dst: str, k: int) -> None:
    d = pd.read_parquet(os.path.join(src, "documents.parquet"))
    did_span = int(d["doc_id"].max()) + 1
    reps = []
    for i in range(k):
        r = d.copy()
        r["doc_id"] = r["doc_id"] + i * did_span
        if i > 0:
            suf = f"{TAG}{i}"  # a char that never appears in fixture text
            r["text"] = [
                " ".join(t + suf for t in s.split(" ")) for s in r["text"]
            ]
            r["n_chars"] = [len(s) for s in r["text"]]
        reps.append(r)
    big = pd.concat(reps, ignore_index=True)
    big.to_parquet(os.path.join(dst, "documents.parquet"), index=False)
    print(f"documents: {len(d)} -> {len(big)} rows", flush=True)


def gen_embeddings(src: str, dst: str, k: int) -> None:
    e = pd.read_parquet(os.path.join(src, "embeddings.parquet"))
    vid_span = int(e["vec_id"].max()) + 1
    dim = len(e["embedding"].iloc[0])
    reps = []
    for i in range(k):
        r = e.copy()
        r["vec_id"] = r["vec_id"] + i * vid_span
        if i > 0:
            signs = np.where(
                np.random.default_rng(SEED_BASE + i).random(dim) < 0.5,
                -1.0,
                1.0,
            ).astype(np.float32)
            mat = np.stack(r["embedding"].to_numpy()) * signs
            r["embedding"] = list(mat)
        reps.append(r)
    big = pd.concat(reps, ignore_index=True)
    big.to_parquet(os.path.join(dst, "embeddings.parquet"), index=False)
    print(f"embeddings: {len(e)} -> {len(big)} rows (dim {dim})", flush=True)


def _custkey_span(src: str) -> int:
    """ONE custkey span shared by gen_orders and gen_customer — the two
    tables must offset by the same stride or replica-i orders would join
    replica-j customers."""
    c = pd.read_parquet(os.path.join(src, "customer.parquet"), columns=["c_custkey"])
    o = pd.read_parquet(os.path.join(src, "orders.parquet"), columns=["o_custkey"])
    return max(int(c["c_custkey"].max()), int(o["o_custkey"].max())) + 1


def gen_orders(src: str, dst: str, k: int) -> None:
    """Key-offset replicas; o_custkey offsets by the SHARED custkey span
    so orders->customer joins stay consistent when both replicate."""
    o = pd.read_parquet(os.path.join(src, "orders.parquet"))
    okey_span = int(o["o_orderkey"].max()) + 1
    ckey_span = _custkey_span(src)
    reps = []
    for i in range(k):
        r = o.copy()
        r["o_orderkey"] = r["o_orderkey"] + i * okey_span
        r["o_custkey"] = r["o_custkey"] + i * ckey_span
        reps.append(r)
    big = pd.concat(reps, ignore_index=True)
    big.to_parquet(os.path.join(dst, "orders.parquet"), index=False)
    print(f"orders: {len(o)} -> {len(big)} rows", flush=True)


def gen_customer(src: str, dst: str, k: int) -> None:
    """c_custkey offsets by the SHARED custkey span (_custkey_span)."""
    c = pd.read_parquet(os.path.join(src, "customer.parquet"))
    ckey_span = _custkey_span(src)
    reps = []
    for i in range(k):
        r = c.copy()
        r["c_custkey"] = r["c_custkey"] + i * ckey_span
        reps.append(r)
    big = pd.concat(reps, ignore_index=True)
    big.to_parquet(os.path.join(dst, "customer.parquet"), index=False)
    print(f"customer: {len(c)} -> {len(big)} rows", flush=True)


def gen_events(src: str, dst: str, k: int) -> None:
    """event_id/user_id key-offset replicas, timestamps preserved: event
    volume grows 10x at constant time span (constant per-user/per-type
    distributions) — the shape a growing service's event table has."""
    e = pd.read_parquet(os.path.join(src, "events.parquet"))
    eid_span = int(e["event_id"].max()) + 1
    uid_span = int(e["user_id"].max()) + 1
    reps = []
    for i in range(k):
        r = e.copy()
        r["event_id"] = r["event_id"] + i * eid_span
        r["user_id"] = r["user_id"] + i * uid_span
        reps.append(r)
    big = pd.concat(reps, ignore_index=True)
    big.to_parquet(os.path.join(dst, "events.parquet"), index=False)
    print(f"events: {len(e)} -> {len(big)} rows", flush=True)


GENERATORS = {
    "lineitem": gen_lineitem,
    "documents": gen_documents,
    "embeddings": gen_embeddings,
    "orders": gen_orders,
    "customer": gen_customer,
    "events": gen_events,
}


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    dst = sys.argv[2] if len(sys.argv) > 2 else DST
    tables = sys.argv[3:] or list(GENERATORS)
    os.makedirs(dst, exist_ok=True)
    for t in tables:
        GENERATORS[t](SRC, dst, k)
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
