"""Similarity search over embedding columns (``array<float>``).

Two tiers:
- :func:`brute_force_topk` — exact cosine top-k; the correctness baseline.
  Cross join with a BROADCAST query side (queries are small by definition),
  score with JVM higher-order functions (zip_with/aggregate — no Python in
  the loop), rank with a per-query window.
- :func:`ivf_topk` — the scale path: a deterministic IVF coarse quantizer
  (centroids = seeded sample of the corpus) partitions vectors into nlist
  buckets; queries probe only their nprobe nearest buckets.  At 100 TB the
  corpus side is hash-partitioned by bucket id so each probe touches a
  bounded slice, and the centroid table (nlist rows) broadcasts.

Quantized scoring (:func:`quantized_cosine`) maps floats to integer grids
so dot products are exact integers — bit-identical across engines, used by
the DuckDB-oracle differential queries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

QUANT_SCALE = 10_000


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array columns via zip_with + aggregate (JVM-side)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def quantize(vec: Column) -> Column:
    """array<float> -> array<long> on a 1/QUANT_SCALE grid.  Integer dot
    products on the grid are exact (no FP accumulation-order sensitivity),
    which makes cross-engine differential checks bit-stable.

    The float element is cast to double BEFORE scaling: float32 arithmetic
    near a rounding boundary would otherwise round differently than an
    engine that computes in double."""
    return F.transform(
        vec, lambda x: F.round(x.cast("double") * QUANT_SCALE, 0).cast("long")
    )


def quantized_dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def quantized_cosine(qa: Column, qb: Column, norm_a: Column, norm_b: Column) -> Column:
    """cosine = int_dot / (sqrt(int_self_dot_a) * sqrt(int_self_dot_b)) —
    every input is an exact integer, so the double result is deterministic.

    Zero-norm vectors (all elements quantize to 0) yield NULL, not a
    crash: Spark 4 runs ANSI mode by default, where even double division
    by zero raises DIVIDE_BY_ZERO — and a null cosine is what the
    downstream consumers expect (threshold filters drop it, ranking's
    ``coalesce(sim, -2.0)`` handles it)."""
    denom = F.sqrt(norm_a) * F.sqrt(norm_b)
    return F.when(denom > 0, quantized_dot(qa, qb) / denom)


def normalize_quantize(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale_bits: int = 127,
) -> DataFrame:
    """L2-normalize and int8-grid quantize an embedding column — the
    standard storage/ANN-prep transform (unit vectors make cosine a plain
    dot product; int8 cuts the index 4x vs float32).

    Returns the quantized vector EXPLODED to ``(id, pos, q_unit, norm_q)``
    rows: ``q_unit = floor(q_i * scale_bits / ||q||)`` in [-scale_bits,
    scale_bits], ``norm_q = floor(||q|| * 1e6)`` (the pre-normalization
    magnitude, kept so the original can be approximately reconstructed).

    Cross-engine determinism: elements land on the integer QUANT_SCALE
    grid first, so the self-dot is an exact integer; ``sqrt`` of the same
    integer is the identical IEEE double in any engine, and ``floor`` of
    identical doubles is exact — no round-half ambiguity anywhere.
    Row-local (transform/aggregate + posexplode): zero shuffle at any
    corpus size.  Zero vectors map to q_unit=0, norm_q=0 (guarded
    division).
    """
    q = quantize(F.col(vec_col))
    d = df.withColumn("__q", q).withColumn(
        "__q2", quantized_dot(F.col("__q"), F.col("__q"))
    )
    norm = F.sqrt(F.col("__q2").cast("double"))
    q_unit = F.transform(
        F.col("__q"),
        lambda x: F.when(
            F.col("__q2") > 0,
            F.floor(x.cast("double") * scale_bits / norm),
        )
        .otherwise(F.lit(0))
        .cast("long"),
    )
    norm_q = (
        F.when(F.col("__q2") > 0, F.floor(norm * 1_000_000))
        .otherwise(F.lit(0))
        .cast("long")
    )
    return d.select(
        F.col(id_col),
        F.posexplode(q_unit).alias("pos", "q_unit"),
        norm_q.alias("norm_q"),
    )


def _with_quantized(df: DataFrame, vec_col: str) -> DataFrame:
    q = quantize(F.col(vec_col))
    return df.withColumn("__q", q).withColumn(
        "__q2", quantized_dot(F.col("__q"), F.col("__q"))
    )


def _infer_dim(vecs) -> int:
    """Model dimension of a quantized vector column: the MODAL length of
    the non-NULL rows (ties broken toward the larger).  Never the first
    row's length — applyInPandas group row order is shuffle-arrival
    order, so first-row inference would let one corrupt mis-sized row
    poison every valid row of its tile, nondeterministically."""
    from collections import Counter

    vals = vecs.to_numpy() if hasattr(vecs, "to_numpy") else vecs
    counts = Counter(len(v) for v in vals if v is not None)
    return max(counts, key=lambda d: (counts[d], d)) if counts else 0


def _stack_quantized(vecs, q2, dim: int | None = None):
    """Dense ``(n, dim)`` float64 matrix + self-dot vector from Arrow
    quantized columns that may hold NULL or mis-sized vectors.

    The expression paths tolerate such rows (``quantized_cosine`` is NULL
    for them; consumers coalesce below any real score or filter), so the
    numpy GEMM paths must too: a bare ``np.stack`` raises on a None
    element and a ragged row, killing the whole task.  Invalid rows
    become zero rows with q2 forced to NaN, so every cosine involving
    them is NaN — the GEMM-side spelling of the expression path's NULL.

    ``dim`` defaults to :func:`_infer_dim` over the column (kernels that
    know the model dimension, or that must share one dim across two
    sides of a tile, pass it explicitly)."""
    import numpy as np
    import pandas as pd

    vals = vecs.to_numpy()
    q2a = pd.to_numeric(q2, errors="coerce").to_numpy(dtype=np.float64)
    if dim is None:
        dim = _infer_dim(vals)
    try:
        qm = np.stack(vals).astype(np.float64)
        if qm.ndim == 2 and qm.shape[1] == dim:
            return qm, q2a
    except (ValueError, TypeError):
        pass
    qm = np.zeros((len(vals), dim), dtype=np.float64)
    for i, v in enumerate(vals):
        if v is not None and len(v) == dim:
            qm[i] = v
        else:
            q2a[i] = np.nan
    return qm, q2a


def _tile_topk(ids_out, ids_in, cos, k: int):
    """Per-row top-k of a tile's score matrix under (cos desc, id asc) —
    the SAME total order as the global ranking window, so per-tile
    selection is monotone and the union of tile top-ks provably contains
    the global top-k.  Non-finite scores are never emitted: -inf marks
    masked self-pairs, NaN marks zero-norm/NULL vectors (both would
    otherwise leak when a tile holds fewer than k+1 rows)."""
    import numpy as np

    rows = []
    kk = min(k, cos.shape[1])
    if kk == 0:
        return rows
    # lexsort: last key is primary -> sort by (-cos, id) per row
    order = np.lexsort((np.broadcast_to(ids_in, cos.shape), -cos), axis=1)
    take = order[:, :kk]
    for r in range(cos.shape[0]):
        for c in take[r]:
            if np.isfinite(cos[r, c]):
                rows.append((ids_out[r], ids_in[c], cos[r, c]))
    return rows


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by quantized cosine: (query_id, vec_id, cosine, rank).

    Broadcast cross join (queries are the small side), deterministic
    tie-break on corpus id.  Self-matches (query_id == vec_id) excluded.
    """
    c = _with_quantized(corpus, vec_col).select(
        F.col(id_col), F.col("__q").alias("cq"), F.col("__q2").alias("cq2")
    )
    q = _with_quantized(queries, vec_col).select(
        F.col(query_id_col), F.col("__q").alias("qq"), F.col("__q2").alias("qq2")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col(query_id_col) != F.col(id_col))
        .withColumn(
            "cosine",
            quantized_cosine(F.col("qq"), F.col("cq"), F.col("qq2"), F.col("cq2")),
        )
        # zero-norm rows have NULL cosine (undefined similarity): exclude
        # them from rankings rather than letting NULLS LAST fill rank slots
        .filter(F.col("cosine").isNotNull())
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, F.round("cosine", 6).alias("cosine"), "rank")
    )


def hard_negatives_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Contrastive-training hard-negative mining: for each query vector,
    the top-k most-similar corpus vectors with a DIFFERENT label —
    maximally confusable negatives, the standard retrieval/embedding
    fine-tuning pair source (e.g. DPR / contrastive learning setups).

    Same scale shape as :func:`brute_force_topk` (broadcast query side,
    integer-quantized dots so the doubles are bit-stable cross-engine,
    deterministic id tie-break); the label-mismatch predicate rides the
    broadcast join.  At 100 TB corpus the exact scan is the verification
    tier — route candidate generation through the IVF/PQ index and apply
    the same label filter on the shortlist."""
    c = _with_quantized(corpus, vec_col).select(
        F.col(id_col),
        F.col(label_col).alias("__cl"),
        F.col("__q").alias("cq"),
        F.col("__q2").alias("cq2"),
    )
    q = _with_quantized(queries, vec_col).select(
        F.col(query_id_col),
        F.col(label_col).alias("__ql"),
        F.col("__q").alias("qq"),
        F.col("__q2").alias("qq2"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("__cl") != F.col("__ql"))
        .withColumn(
            "cosine",
            quantized_cosine(F.col("qq"), F.col("cq"), F.col("qq2"), F.col("cq2")),
        )
        .filter(F.col("cosine").isNotNull())
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id_col,
            id_col,
            F.col("__cl").alias("neg_label"),
            F.round("cosine", 6).alias("cosine"),
            "rank",
        )
    )


_CENTROID_SCHEMA = T.StructType(
    [
        T.StructField("centroid_id", T.IntegerType(), False),
        T.StructField("centroid", T.ArrayType(T.DoubleType())),
    ]
)


def _centroids_df(spark, vecs: list[list[float]]) -> DataFrame:
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)], _CENTROID_SCHEMA
    )


def build_ivf_centroids(
    corpus: DataFrame,
    nlist: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 2,
    max_train_rows: int = 100_000,
) -> DataFrame:
    """Deterministic IVF coarse quantizer: seed centroids are the nlist
    corpus vectors with the smallest xxhash64(id) (a seeded uniform
    sample), refined with ``iters`` Lloyd (kmeans) iterations.  Returns
    (centroid_id, centroid) — nlist rows, always broadcastable.

    Scale/determinism design (the FAISS shape: train the quantizer on a
    bounded sample AT THE DRIVER, apply it distributed):
    - ONE distributed job total: a TakeOrderedAndProject of the
      ``max_train_rows`` training vectors by ``xxhash64(id)`` (each
      partition keeps a local top-k, the driver merges — no global
      sort), quantized IN SPARK so the grid rounding (HALF_UP on
      doubles) is identical to the assignment path's.  Seeds are the
      first ``nlist`` rows of the same hash order.
    - The Lloyd refinement itself is numpy over that sample — a
      model-sized computation (<= max_train_rows x dim).  The earlier
      revision ran each iteration as a distributed assign + integer-sum
      aggregate: two cluster round-trips per iteration to refine a model
      that fits in driver memory by construction.  Per-iteration cost is
      now zero Spark jobs; at 100 TB the sample collect is the same
      bounded size.
    - All arithmetic stays EXACT: grid elements and their pairwise
      products are < 2^53, so float64 matmul dots are exact integers;
      bucket sums over <= max_train_rows rows stay < 2^53; ties break by
      smallest centroid id (argmax-first); zero-norm vectors score -2.0
      — bit-identical semantics to the distributed assignment
      expression, independent of partitioning and platform.
    - New centroids are HALF-UP re-rounded onto the grid (matching what
      Spark's ``quantize`` would do to them at assignment time), so the
      returned model round-trips losslessly through parquet persistence.
    - The nlist centroids live on the driver as the quantizer "model"
      (exactly like Spark ML KMeans) and re-parallelize as a small
      broadcastable table.
    """
    import numpy as np

    spark = corpus.sparkSession
    sample_rows = (
        corpus.select(F.col(id_col).alias("id"), quantize(F.col(vec_col)).alias("q"))
        .orderBy(F.xxhash64(F.col("id")), F.col("id"))
        .limit(max(nlist, max_train_rows))
        .collect()
    )
    if not sample_rows:
        return _centroids_df(spark, [])
    Q = np.array([[int(x) for x in r["q"]] for r in sample_rows], dtype=np.float64)
    C = Q[:nlist].copy()
    if iters > 0:
        q2 = (Q * Q).sum(axis=1)
        for _ in range(iters):
            c2 = (C * C).sum(axis=1)
            denom = np.sqrt(q2)[:, None] * np.sqrt(c2)[None, :]
            sim = np.divide(
                Q @ C.T,
                denom,
                out=np.full((len(Q), len(C)), -2.0),
                where=denom > 0,
            )
            bucket = np.argmax(sim, axis=1)
            for cid in range(len(C)):
                mask = bucket == cid
                if mask.any():  # empty bucket keeps its previous centroid
                    avg = Q[mask].sum(axis=0) / mask.sum()
                    C[cid] = np.sign(avg) * np.floor(np.abs(avg) + 0.5)
    out = _centroids_df(
        spark, [[float(x) / QUANT_SCALE for x in row] for row in C]
    )
    # The quantized model is already known EXACTLY (C is integer-valued;
    # Spark's quantize() of k/QUANT_SCALE round-trips to k for |k| far
    # from any half boundary, which grid ints always are).  Attach it so
    # the assignment/probe paths skip their re-quantize-and-collect job —
    # a tiny LocalTableScan job, but TWO of them sat on the hot path of
    # every in-session IVF build+probe (~1.5 s each on a loaded host).
    out._pm_quantized = [
        {
            "centroid_id": i,
            "__q": [int(x) for x in row],
            "__q2": int((row * row).sum()),
        }
        for i, row in enumerate(C)
    ]
    return out


# Above this many literal longs (nlist * dim) the codegen'd centroid
# array gets unwieldy; fall back to the broadcast-join assignment.
_LITERAL_CENTROID_BUDGET = 65_536
#: below this many literal elements (nlist x dim) the nearest-centroid
#: argmax stays a codegen'd literal expression; above it, the interpreted
#: per-element cost dominates and assignment runs as an Arrow GEMM batch
#: (see assign_buckets — measured 78s -> ~2s at nlist=49, dim=64, 200k rows)
_VECTORIZED_ASSIGN_MIN_ELEMS = 2_048


def _collect_quantized_centroids(centroids: DataFrame) -> list:
    """(centroid_id, qvec, q2) rows with quantization done IN SPARK so the
    driver-side literals are bit-identical to what the join path computes
    (Spark ``round`` is HALF_UP; Python ``round`` is HALF_EVEN — quantizing
    in Python here would silently flip boundary elements).

    Centroid frames built by :func:`build_ivf_centroids` carry the exact
    quantized model as ``_pm_quantized`` (grid ints known at build time);
    use it directly instead of launching a collect job.  Loaded/foreign
    centroid frames (e.g. :func:`load_ivf_index`) take the Spark path."""
    cached = getattr(centroids, "_pm_quantized", None)
    if cached is not None:
        return cached
    return (
        _with_quantized(centroids, "centroid")
        .select("centroid_id", "__q", "__q2")
        .collect()
    )


def _nearest_centroids_expr(cen_rows: list, qcol: Column, q2col: Column, n: int) -> Column:
    """Array of the ``n`` nearest centroid structs (sim, cid) for one row's
    quantized vector — pure expression, zero shuffle.  ``cen_rows`` come
    from :func:`_collect_quantized_centroids` and are folded into a literal
    array, so the whole argmax runs inside whole-stage codegen.

    Tie-break matches the join path: sim desc, centroid_id asc (encoded as
    -cid so one descending sort_array orders both).  Null sims (zero-norm
    vectors) coalesce to -2.0, below any real cosine.

    The literal array is built as ONE parsed SQL expression, not nested
    ``F.lit``/``F.struct`` calls: nlist x dim literals as individual
    Column objects cost a py4j round-trip EACH (~2 ms x 1000+ = seconds
    of pure plan-construction latency before any data moves — the
    client-side twin of the §9.7 plan-compile pathology; measured 5.9 s
    -> 0.1 s for nlist=16, dim=64 at sf0.1).  The resulting expression
    tree is identical either way."""
    parts = [
        "named_struct('cid',{cid},'cq',array({cq}),'cq2',{cq2}L)".format(
            cid=int(r["centroid_id"]),
            cq=",".join(f"{int(x)}L" for x in r["__q"]),
            cq2=int(r["__q2"]),
        )
        for r in cen_rows
    ]
    cen_lit = F.expr("array(" + ",".join(parts) + ")")
    sims = F.transform(
        cen_lit,
        lambda c: F.struct(
            F.coalesce(
                quantized_cosine(qcol, c["cq"], q2col, c["cq2"]), F.lit(-2.0)
            ).alias("sim"),
            (-c["cid"]).alias("negcid"),
        ),
    )
    return F.slice(F.sort_array(sims, asc=False), 1, n)


def assign_buckets(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_assign: int = 1,
) -> DataFrame:
    """Assign each vector to its ``n_assign`` nearest centroids (max
    quantized cosine; deterministic centroid-id tie-break).

    Scale design: the centroid table is nlist rows — a MODEL, not data —
    so assignment is always one narrow map stage: no shuffle, no window,
    no join, embarrassingly parallel at any corpus size.  Three physical
    strategies by model size (results identical — same quantized-grid
    cosine, same (sim desc, cid asc) tie-break, nulls below any real
    score):

    - tiny models (<= ``_VECTORIZED_ASSIGN_MIN_ELEMS`` literal elements,
      e.g. nlist 16 x dim 64): a literal-array expression inside
      whole-stage codegen — zero Python, the cheapest plan;
    - bigger-but-model-sized: an Arrow-batched numpy GEMM
      (batch x nlist scores in one matmul) — the r07 fix: at nlist=49,
      dim=64 the interpreted per-element expression cost 78s for 200k
      rows at sf10 where the GEMM costs ~2s;
    - above ``_LITERAL_CENTROID_BUDGET``: broadcast join + per-id window
      (the centroid table no longer belongs in a task closure).

    ``n_assign > 1`` is the multi-assignment trick for within-bucket pair
    joins: a near-dup pair straddling a bucket boundary still meets in the
    second-nearest bucket (recall up, cost x ~n_assign)."""
    cen_rows = _collect_quantized_centroids(centroids)
    dim = len(cen_rows[0]["__q"]) if cen_rows else 0
    n_elems = len(cen_rows) * dim
    if cen_rows and n_elems <= _VECTORIZED_ASSIGN_MIN_ELEMS:
        v = _with_quantized(corpus, vec_col)
        best = _nearest_centroids_expr(
            cen_rows, F.col("__q"), F.col("__q2"), n_assign
        )
        return (
            v.select(F.col(id_col), F.col(vec_col), F.explode(best).alias("__b"))
            .select(
                F.col(id_col),
                F.col(vec_col),
                (-F.col("__b.negcid")).cast("int").alias("bucket"),
            )
        )
    if cen_rows and n_elems <= _LITERAL_CENTROID_BUDGET:
        import numpy as np

        cids = np.array(
            [int(r["centroid_id"]) for r in cen_rows], dtype=np.int64
        )
        cmat = np.array(
            [[int(x) for x in r["__q"]] for r in cen_rows], dtype=np.float64
        ).T  # (dim, nlist)
        denom_c = np.sqrt(
            np.array([int(r["__q2"]) for r in cen_rows], dtype=np.float64)
        )[None, :]
        take_n = n_assign

        def score(batches):
            for pdf in batches:
                if pdf.empty:
                    continue
                qm, q2 = _stack_quantized(
                    pdf["__q"], pdf["__q2"], dim=cmat.shape[0]
                )
                with np.errstate(divide="ignore", invalid="ignore"):
                    sims = (qm @ cmat) / (np.sqrt(q2)[:, None] * denom_c)
                # zero-norm/NULL/mis-sized vectors: NULL sim coalesces to
                # -2.0 in the expression path — mirror it exactly
                sims = np.where(np.isfinite(sims), sims, -2.0)
                order = np.lexsort(
                    (np.broadcast_to(cids, sims.shape), -sims), axis=1
                )
                take = order[:, :take_n]
                out = pdf.loc[
                    pdf.index.repeat(take.shape[1]), [id_col, vec_col]
                ].copy()
                out["bucket"] = cids[take].reshape(-1).astype(np.int32)
                yield out

        id_type = corpus.schema[id_col].dataType.simpleString()
        vec_type = corpus.schema[vec_col].dataType.simpleString()
        v = _with_quantized(corpus, vec_col).select(
            id_col, vec_col, "__q", "__q2"
        )
        return v.mapInPandas(
            score, f"{id_col} {id_type}, {vec_col} {vec_type}, bucket int"
        )
    c = _with_quantized(centroids, "centroid").select(
        "centroid_id", F.col("__q").alias("cenq"), F.col("__q2").alias("cenq2")
    )
    v = _with_quantized(corpus, vec_col)
    scored = v.crossJoin(F.broadcast(c)).withColumn(
        "sim",
        quantized_cosine(F.col("__q"), F.col("cenq"), F.col("__q2"), F.col("cenq2")),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("sim"), F.col("centroid_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_assign)
        .select(F.col(id_col), F.col(vec_col), F.col("centroid_id").alias("bucket"))
    )


def write_ivf_index(
    corpus: DataFrame,
    path: str,
    nlist: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    corpus_assign: int = 1,
) -> None:
    """Persist an IVF index: ``<path>/centroids`` (nlist rows) and
    ``<path>/vectors`` hive-PARTITIONED BY bucket.  Build once, probe
    many: a probing query filters ``bucket IN (...)`` and the scan prunes
    to the matching partition directories — at 100 TB each probe touches
    nprobe/nlist of the files, no shuffle, no index rebuild."""
    centroids = build_ivf_centroids(corpus, nlist, id_col, vec_col)
    centroids.write.mode("overwrite").parquet(f"{path}/centroids")
    bucketed = assign_buckets(corpus, centroids, id_col, vec_col, n_assign=corpus_assign)
    bucketed.write.mode("overwrite").partitionBy("bucket").parquet(f"{path}/vectors")


def load_ivf_index(spark, path: str) -> tuple[DataFrame, DataFrame]:
    """(centroids, bucketed_vectors) from :func:`write_ivf_index` output."""
    return (
        spark.read.parquet(f"{path}/centroids"),
        spark.read.parquet(f"{path}/vectors"),
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    corpus_assign: int = 1,
    index: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Approximate top-k: probe only the nprobe buckets nearest each query.

    Join shape: queries x nprobe bucket-ids equi-joined to the bucketed
    corpus — the scan is ~(corpus_assign * nprobe / nlist) of the
    brute-force cross join.  Recall is tunable via nprobe (probe more
    buckets per query) and ``corpus_assign`` (index each corpus vector in
    its m nearest buckets — catches neighbors that sit just across a
    bucket boundary); exactness restored at nprobe = nlist.

    Pass ``index`` (from :func:`load_ivf_index`) to probe a prebuilt
    persisted index instead of re-deriving centroids and buckets from the
    corpus — the production shape (``corpus`` is then ignored).
    """
    if index is not None:
        centroids, bucketed = index
    else:
        centroids = build_ivf_centroids(corpus, nlist, id_col, vec_col)
        bucketed = assign_buckets(corpus, centroids, id_col, vec_col, n_assign=corpus_assign)

    # Probe selection is the same row-local nearest-centroid expression as
    # assign_buckets: no shuffle, no window — the only shuffle in the whole
    # probe is the bucket equi-join below.
    cen_rows = _collect_quantized_centroids(centroids)
    dim = len(cen_rows[0]["__q"]) if cen_rows else 0
    if cen_rows and len(cen_rows) * dim <= _LITERAL_CENTROID_BUDGET:
        qv = _with_quantized(queries, vec_col)
        nearest = _nearest_centroids_expr(
            cen_rows, F.col("__q"), F.col("__q2"), nprobe
        )
        probes = qv.select(
            F.col(query_id_col), F.col(vec_col), F.explode(nearest).alias("__b")
        ).select(
            F.col(query_id_col),
            F.col(vec_col),
            (-F.col("__b.negcid")).cast("int").alias("bucket"),
        )
    else:
        qprobes = (
            _with_quantized(queries, vec_col)
            .crossJoin(
                F.broadcast(
                    _with_quantized(centroids, "centroid").select(
                        "centroid_id",
                        F.col("__q").alias("cenq"),
                        F.col("__q2").alias("cenq2"),
                    )
                )
            )
            .withColumn(
                "sim",
                quantized_cosine(
                    F.col("__q"), F.col("cenq"), F.col("__q2"), F.col("cenq2")
                ),
            )
        )
        wq = Window.partitionBy(query_id_col).orderBy(
            F.desc("sim"), F.col("centroid_id")
        )
        probes = (
            qprobes.withColumn("__rn", F.row_number().over(wq))
            .filter(F.col("__rn") <= nprobe)
            .select(query_id_col, F.col(vec_col), F.col("centroid_id").alias("bucket"))
        )

    cq = _with_quantized(bucketed, vec_col).select(
        F.col(id_col), "bucket", F.col("__q").alias("cq"), F.col("__q2").alias("cq2")
    )
    pq = _with_quantized(probes, vec_col).select(
        query_id_col, "bucket", F.col("__q").alias("qq"), F.col("__q2").alias("qq2")
    )
    scored = (
        cq.join(pq, "bucket")
        .filter(F.col(query_id_col) != F.col(id_col))
        .withColumn(
            "cosine",
            quantized_cosine(F.col("qq"), F.col("cq"), F.col("qq2"), F.col("cq2")),
        )
        # multi-assignment / multi-probe can surface a (query, vec) pair in
        # several buckets; the score is deterministic, so dedup is exact
        .dropDuplicates([query_id_col, id_col])
        # NULL cosine = zero-norm vector: excluded from rankings
        .filter(F.col("cosine").isNotNull())
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, F.round("cosine", 6).alias("cosine"), "rank")
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
    n_blocks: int | None = None,
    rows_per_block: int = 4096,
    ann_threshold: int = 1_000_000,
    nlist: int | None = None,
) -> DataFrame:
    """Embedding near-duplicate pairs: cosine >= threshold, id_a < id_b.

    Three tiers, chosen by corpus size:

    - ``block_col`` given: equi-join within caller-provided blocks (an IVF
      bucket, a label, a shard) — the sub-quadratic scale path.
    - corpus count > ``ann_threshold``: IVF ANN PREFILTER — a deterministic
      coarse quantizer (:func:`build_ivf_centroids`, ``nlist`` defaults to
      ~sqrt(n)) buckets the corpus and the pair join runs within buckets.
      Sub-quadratic and bounded-memory; APPROXIMATE (cross-bucket pairs
      are not examined) — exactly the trade every ANN dedup makes at
      billions of vectors.
    - otherwise: exact all-pairs as a *blocked integer GEMM* via
      applyInPandas, with ``n_blocks`` DERIVED from the corpus count so a
      tile never exceeds ~2*rows_per_block rows regardless of n (a fixed
      block count would make per-tile memory O(n/const) — unbounded), and
      never fewer blocks than needed to feed the cluster's parallelism.
      The quantized values are small enough that float64 matmul is EXACT
      integer arithmetic (|dot| < 2^53), so results are bit-identical to
      the expression path and the DuckDB oracle, and invariant to the
      chosen n_blocks.

    Exact work is O(n^2 d) — GEMM just executes it at memory bandwidth
    instead of one Catalyst aggregate per pair, and the tiles parallelize
    across executors (each tile is two block slices, bounded memory)."""
    v = _with_quantized(df, vec_col).select(
        F.col(id_col),
        *([F.col(block_col)] if block_col else []),
        F.col("__q").alias("q"),
        F.col("__q2").alias("q2"),
    )
    if block_col:
        a, b = v.alias("a"), v.alias("b")
        joined = a.join(
            b,
            (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        return (
            joined.withColumn(
                "cosine",
                quantized_cosine(
                    F.col("a.q"), F.col("b.q"), F.col("a.q2"), F.col("b.q2")
                ),
            )
            .filter(F.col("cosine") >= threshold)
            .select(
                F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
                F.round("cosine", 6).alias("cosine"),
            )
            # multi-assigned vectors (n_assign > 1) meet in several blocks;
            # the score is deterministic, so dedup on the pair is exact
            .dropDuplicates(["id_a", "id_b"])
        )

    n = df.count()  # planning-time count; at cluster scale comes from table stats
    if n > ann_threshold:
        # ANN tier: bucket by the IVF coarse quantizer (kmeans-refined) and
        # recurse into the within-block equi-join path.  Each vector is
        # multi-assigned to its 2 nearest buckets so boundary pairs still
        # meet.  Approximate by design (pairs far from both buckets missed).
        eff_nlist = nlist or max(16, int(n**0.5))
        centroids = build_ivf_centroids(df, eff_nlist, id_col, vec_col)
        bucketed = assign_buckets(df, centroids, id_col, vec_col, n_assign=2)
        return cosine_near_dup_pairs(
            bucketed, threshold, id_col, vec_col, block_col="bucket"
        )

    import math

    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    if n_blocks is None:
        # Memory bound: blocks small enough that a tile (2 blocks) is
        # ~2*rows_per_block rows.  Parallelism bound: enough tiles
        # (nb*(nb+1)/2) to occupy the cluster's cores.
        par = spark.sparkContext.defaultParallelism
        nb_mem = math.ceil(n / rows_per_block) if n else 1
        nb_par = math.ceil((math.isqrt(8 * par + 1) - 1) / 2)
        n_blocks = max(1, nb_mem, nb_par)
    tagged = v.withColumn("bid", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)))
    block_pairs = spark.createDataFrame(
        [(a, b) for a in range(n_blocks) for b in range(a, n_blocks)],
        "ba int, bb int",
    )
    # Each row joins every block pair its block participates in (~n_blocks
    # copies) — total shuffle is n*n_blocks rows, each tile then runs as
    # one numpy matmul.
    rep = tagged.join(
        block_pairs, (F.col("bid") == F.col("ba")) | (F.col("bid") == F.col("bb"))
    )

    def tile(key, pdf):  # unannotated: Spark infers the variant by arity
        ba, bb = int(key[0]), int(key[1])
        a_rows = pdf[pdf["bid"] == ba]
        b_rows = pdf[pdf["bid"] == bb] if ba != bb else a_rows
        if a_rows.empty or b_rows.empty:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        # one dim for both sides: a side whose rows are ALL degenerate
        # must still stack to the other side's width (modal length — see
        # _infer_dim on why never the first row's)
        dim = _infer_dim(pdf["q"])
        qa, qa2 = _stack_quantized(a_rows["q"], a_rows["q2"], dim=dim)
        qb, qb2 = _stack_quantized(b_rows["q"], b_rows["q2"], dim=dim)
        dots = qa @ qb.T  # exact: |entries| < 2^53
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = dots / (np.sqrt(qa2)[:, None] * np.sqrt(qb2)[None, :])
        ia = a_rows[id_col].to_numpy()
        ib = b_rows[id_col].to_numpy()
        ii, jj = np.nonzero(cos >= threshold)
        id_a, id_b, cc = ia[ii], ib[jj], cos[ii, jj]
        if ba == bb:
            # every unordered pair appears twice in the square tile
            keep = id_a < id_b
            id_a, id_b, cc = id_a[keep], id_b[keep], cc[keep]
        else:
            # cross tile holds each pair once, in arbitrary id order
            id_a, id_b = np.minimum(id_a, id_b), np.maximum(id_a, id_b)
        # round half-away-from-zero to match Spark/DuckDB round()
        cc = np.sign(cc) * np.floor(np.abs(cc) * 1e6 + 0.5) / 1e6
        return pd.DataFrame({"id_a": id_a, "id_b": id_b, "cosine": cc})

    # preserve the caller's id dtype (string/int ids both valid): the
    # block_col tier passes ids through joins untouched, so a hardcoded
    # long here would make the two tiers diverge — Arrow conversion
    # failure that appears only once corpus size crosses ann_threshold.
    # np.minimum/maximum on object (string) arrays compare elementwise
    # with Python semantics, matching the block tier's Spark `<`.
    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = f"id_a {id_type}, id_b {id_type}, cosine double"
    return rep.groupBy("ba", "bb").applyInPandas(tile, out_schema)


def knn_graph(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
    rows_per_block: int = 4096,
    n_blocks: int | None = None,
    n: int | None = None,
) -> DataFrame:
    """k-nearest-neighbor GRAPH: for every vector, its top-k most similar
    other vectors by cosine — the primitive behind SemDeDup-style semantic
    dedup, embedding-cluster curation, and graph-based diversity sampling.
    Returns (id, neighbor_id, cosine, rank) with rank 1..k, deterministic
    full tie-break (cosine desc, neighbor_id asc).

    Tiers (mirrors :func:`cosine_near_dup_pairs`):

    - ``block_col`` given (an IVF bucket, a shard): approximate kNN
      restricted to within-block neighbors — the scale path; sub-quadratic,
      each block's pair space is bounded.  Multi-assigned rows (a vector in
      several blocks) are deduped on (id, neighbor) before ranking, so
      probing 2 buckets can only improve recall, never distort ranks.
    - otherwise: EXACT kNN as the same blocked integer GEMM used by
      :func:`cosine_near_dup_pairs` — each tile emits only its per-row
      top-k candidates, selected by the SAME total order as the final
      window (unrounded cosine desc, id asc — selection is monotone, so
      the union of per-tile top-k provably contains the global top-k).
      The global window then sees k*n_blocks candidates per row instead
      of n: shuffle volume O(n*k*n_blocks), never O(n^2).

    Cross-engine determinism: dots are exact integers on the QUANT_SCALE
    grid (< 2^53, so float64 matmul is exact); cosine = int / (sqrt(int)
    * sqrt(int)) is the identical IEEE double in numpy, the JVM, and
    DuckDB; ranking compares those identical doubles, ties broken by id.
    """
    v = _with_quantized(df, vec_col).select(
        F.col(id_col),
        *([F.col(block_col)] if block_col else []),
        F.col("__q").alias("q"),
        F.col("__q2").alias("q2"),
    )
    w = Window.partitionBy("id").orderBy(F.desc("cosine"), F.col("neighbor_id"))

    if block_col:
        # Within-block scoring runs the SAME integer-grid GEMM kernel as
        # the exact tier below, one Arrow group per block (r07: the
        # previous expression self-join evaluated one 64-dim aggregate
        # per PAIR — measured 100M interpreted evals for 16 buckets of
        # 2.5k vectors at sf1, >400s, vs ~2s for the GEMM).  Per-block
        # per-row top-k under the same total order (cos desc, id asc) is
        # selection-monotone, so after the multi-assignment dedup the
        # global window sees a candidate superset of the true within-
        # block top-k — identical results to the pair join, at
        # O(rows_per_chunk x block) transient memory.
        import numpy as np
        import pandas as pd

        def block_topk(pdf):
            m = len(pdf)
            if m < 2:
                return pd.DataFrame({"id": [], "neighbor_id": [], "cosine": []})
            ids = pdf[id_col].to_numpy()
            qm, q2 = _stack_quantized(pdf["q"], pdf["q2"])
            denom_b = np.sqrt(q2)[None, :]
            rows = []
            chunk = 1024
            with np.errstate(divide="ignore", invalid="ignore"):
                for r0 in range(0, m, chunk):
                    r1 = min(r0 + chunk, m)
                    cos = (qm[r0:r1] @ qm.T) / (
                        np.sqrt(q2[r0:r1])[:, None] * denom_b
                    )
                    # self-pairs: each id appears once per block (assign
                    # buckets are distinct), so self = matching id
                    self_mask = ids[r0:r1][:, None] == ids[None, :]
                    cos[self_mask] = -np.inf
                    # zero-norm/NULL rows/cols are NaN: lexsort places
                    # them after finite scores, _tile_topk skips them
                    rows += _tile_topk(ids[r0:r1], ids, cos, k)
            return pd.DataFrame(rows, columns=["id", "neighbor_id", "cosine"])

        id_type = df.schema[id_col].dataType.simpleString()
        scored = (
            v.groupBy(block_col)
            .applyInPandas(
                block_topk, f"id {id_type}, neighbor_id {id_type}, cosine double"
            )
            .dropDuplicates(["id", "neighbor_id"])
        )
        ranked = scored.withColumn("rank", F.row_number().over(w))
        return ranked.filter(F.col("rank") <= k).select(
            "id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank"
        )

    import math

    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    if n is None:
        # planning-time count; at cluster scale from table stats (callers
        # that already counted — semdedup's tier decision — pass n in)
        n = df.count()
    if n_blocks is None:
        par = spark.sparkContext.defaultParallelism
        nb_mem = math.ceil(n / rows_per_block) if n else 1
        nb_par = math.ceil((math.isqrt(8 * par + 1) - 1) / 2)
        n_blocks = max(1, nb_mem, nb_par)
    tagged = v.withColumn("bid", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)))
    block_pairs = spark.createDataFrame(
        [(a, b) for a in range(n_blocks) for b in range(a, n_blocks)],
        "ba int, bb int",
    )
    rep = tagged.join(
        block_pairs, (F.col("bid") == F.col("ba")) | (F.col("bid") == F.col("bb"))
    )

    def tile(key, pdf):  # unannotated: Spark infers the variant by arity
        ba, bb = int(key[0]), int(key[1])
        a_rows = pdf[pdf["bid"] == ba]
        b_rows = pdf[pdf["bid"] == bb] if ba != bb else a_rows
        if a_rows.empty or b_rows.empty:
            return pd.DataFrame({"id": [], "neighbor_id": [], "cosine": []})
        # one dim for both sides (see the near-dup tile note)
        dim = _infer_dim(pdf["q"])
        qa, qa2 = _stack_quantized(a_rows["q"], a_rows["q2"], dim=dim)
        qb, qb2 = _stack_quantized(b_rows["q"], b_rows["q2"], dim=dim)
        dots = qa @ qb.T  # exact: |entries| < 2^53
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = dots / (np.sqrt(qa2)[:, None] * np.sqrt(qb2)[None, :])
        ia = a_rows[id_col].to_numpy()
        ib = b_rows[id_col].to_numpy()
        if ba == bb:
            np.fill_diagonal(cos, -np.inf)  # no self-neighbors
        out = _tile_topk(ia, ib, cos, k)
        if ba != bb:
            out += _tile_topk(ib, ia, cos.T, k)
        return pd.DataFrame(out, columns=["id", "neighbor_id", "cosine"])

    # id dtype preserved for parity with the block_col tier (see the
    # matching note in cosine_near_dup_pairs)
    id_type = df.schema[id_col].dataType.simpleString()
    cands = rep.groupBy("ba", "bb").applyInPandas(
        tile, f"id {id_type}, neighbor_id {id_type}, cosine double"
    )
    ranked = cands.withColumn("rank", F.row_number().over(w))
    return ranked.filter(F.col("rank") <= k).select(
        "id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank"
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ): the compressed-index ANN tier
# ---------------------------------------------------------------------------
#
# At 100 TB the float32 vectors themselves are the bottleneck: a 768-dim
# corpus is ~3 KB/row and the ANN scan is memory-bandwidth-bound.  PQ
# (Jegou et al., "Product Quantization for Nearest Neighbor Search",
# TPAMI 2011 — the index behind FAISS's IVF-PQ) splits each vector into
# ``m`` subspaces and snaps each subvector to one of ``n_codes`` learned
# codewords, storing only the m code ids (m bytes at n_codes<=256 —
# 100-300x smaller).  Queries score against codes via ADC (asymmetric
# distance computation): one m*n_codes lookup table per query, then each
# corpus row costs m table lookups instead of d multiplies.
#
# Determinism: codebooks are trained on the integer QUANT_SCALE grid with
# integer sufficient statistics (like build_ivf_centroids), codewords ARE
# integers, so every distance/dot here is exact integer arithmetic and
# the ADC score is the identical IEEE double on any engine/partitioning.
#
# Composition: pq_topk scans every code row (compressed but exhaustive);
# the production 100 TB shape is IVF-PQ — assign_buckets() to prune to
# nprobe buckets, then ADC within them (pq_topk accepts pre-filtered
# encodings, so the composition is just a filter upstream).


def _pq_split(m: int, dim: int) -> list[tuple[int, int]]:
    """(1-based slice start, length) per subspace; dim must divide by m."""
    # ValueError, not assert: stripped under python -O, a non-dividing m
    # would silently drop the trailing dims from every PQ code
    if dim % m != 0:
        raise ValueError(f"dim {dim} must divide into m={m} subspaces")
    sub = dim // m
    return [(s * sub + 1, sub) for s in range(m)]


def train_pq_codebooks(
    corpus: DataFrame,
    m: int = 8,
    n_codes: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_train_rows: int = 100_000,
) -> list[list[list[int]]]:
    """Learn integer PQ codebooks: ``[m][n_codes][dim/m]`` on the
    QUANT_SCALE grid.

    Seeds are the n_codes corpus vectors with smallest xxhash64(id),
    split into subvectors; ``iters`` Lloyd steps refine each subspace
    independently.  Like :func:`build_ivf_centroids`, training is the
    FAISS shape: ONE distributed TakeOrdered collects the (quantized)
    ``max_train_rows`` hash-sample, and the per-subspace Lloyd runs in
    numpy at the driver — a model-sized computation that previously cost
    two cluster round-trips per iteration.  All arithmetic is exact:
    grid products and bounded sums stay < 2^53 in float64, assignment is
    min squared-L2 with smallest-code tie-break (argmin-first), empty
    codes keep their previous codeword, new codewords are
    ``floor(mean + 0.5)`` — bit-identical to the distributed
    expression semantics it replaces, independent of partitioning.
    """
    import numpy as np

    qv = corpus.select(F.col(id_col).alias("id"), quantize(F.col(vec_col)).alias("q"))
    sample_rows = (
        qv.orderBy(F.xxhash64(F.col("id")), F.col("id"))
        .limit(max(n_codes, max_train_rows))
        .collect()
    )
    if not sample_rows:
        raise ValueError("cannot train PQ codebooks on an empty corpus")
    seed_rows = sample_rows[:n_codes]
    dim = len(seed_rows[0]["q"])
    splits = _pq_split(m, dim)
    books: list[list[list[int]]] = [
        [[int(x) for x in r["q"][st - 1 : st - 1 + ln]] for r in seed_rows]
        for (st, ln) in splits
    ]
    if iters <= 0:
        return books

    Q = np.array([[int(x) for x in r["q"]] for r in sample_rows], dtype=np.float64)
    for s, (st, ln) in enumerate(splits):
        S = Q[:, st - 1 : st - 1 + ln]
        s2 = (S * S).sum(axis=1)
        B = np.array(books[s], dtype=np.float64)
        for _ in range(iters):
            b2 = (B * B).sum(axis=1)
            dist = s2[:, None] - 2.0 * (S @ B.T) + b2[None, :]
            code = np.argmin(dist, axis=1)
            for c in range(n_codes):
                mask = code == c
                if mask.any():  # empty code keeps its previous codeword
                    B[c] = np.floor(S[mask].sum(axis=0) / mask.sum() + 0.5)
        books[s] = [[int(x) for x in row] for row in B]
    return books


_PQ_BOOKS_SCHEMA = T.ArrayType(
    T.ArrayType(
        T.StructType(
            [
                T.StructField("code", T.IntegerType(), False),
                T.StructField("cvec", T.ArrayType(T.LongType()), False),
                T.StructField("cvec2", T.LongType(), False),
            ]
        )
    )
)


def _books_df(spark, books: list[list[list[int]]]) -> DataFrame:
    """The codebook model as a ONE-ROW broadcastable DataFrame
    (``__books``: array[m][n_codes] of (code, cvec, cvec2)).

    Deliberately data, not literals: unrolling m*n_codes*sub_dim literal
    nodes into the expression tree made the optimizer walk thousands of
    nodes per rule — ~12 s of pure plan-compile time for m=32 (the
    round-4 re-trip of SURVEY §9 pathology family).  As a broadcast
    one-row cross join the plan holds ONE column reference and the model
    rides the data path.
    """
    rows = [
        (
            [
                [
                    (c, [int(x) for x in cv], int(sum(x * x for x in cv)))
                    for c, cv in enumerate(sub_book)
                ]
                for sub_book in books
            ],
        )
    ]
    return spark.createDataFrame(
        rows, T.StructType([T.StructField("__books", _PQ_BOOKS_SCHEMA, False)])
    )


def _pq_subs(sub_dim: int) -> Column:
    """Per-subspace (sub, sub2) slices of the row's quantized vector,
    computed ONCE per row (the inner per-code loops below would otherwise
    re-slice per codeword — 16x the allocations).  Two-arg transform: the
    second lambda parameter is the ELEMENT INDEX (intentional here — it
    addresses the subspace; SURVEY §9 #4)."""
    return F.transform(
        F.col("__books"),
        lambda _sb, s: F.struct(
            F.slice(F.col("__q"), s * sub_dim + 1, sub_dim).alias("sub"),
            quantized_dot(
                F.slice(F.col("__q"), s * sub_dim + 1, sub_dim),
                F.slice(F.col("__q"), s * sub_dim + 1, sub_dim),
            ).alias("sub2"),
        ),
    )


def _pq_picked() -> Column:
    """array[m] of the argmin (dist, code, cvec2) struct per subspace,
    from the pre-sliced ``__subs``.  Tie-break (dist asc, code asc) via
    array_min over structs, matching the training assignment exactly."""
    return F.zip_with(
        F.col("__books"),
        F.col("__subs"),
        lambda sub_book, ss: F.array_min(
            F.transform(
                sub_book,
                lambda c: F.struct(
                    (
                        ss["sub2"]
                        - 2 * quantized_dot(ss["sub"], c["cvec"])
                        + c["cvec2"]
                    ).alias("dist"),
                    c["code"].alias("code"),
                    c["cvec2"].alias("cvec2"),
                ),
            )
        ),
    )


def pq_encode(
    corpus: DataFrame,
    books: list[list[list[int]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>, recon2 long): each vector compressed to its
    m nearest-codeword ids, plus the reconstruction's exact integer self-
    dot (used as the ADC denominator).

    Row-local at any scale: quantization happens JVM-side (the exact
    HALF_UP grid snap of :func:`quantize`, shared with every other
    consumer), then ONE Arrow-batched kernel assigns all m subspace
    codes per batch as numpy GEMMs over the integer grid — the same
    sanctioned-Python shape as the kNN tiles, replacing the per-row
    interpreted m x n_codes ``quantized_dot`` lambda tree that cost
    ~1.3s per 2k rows at sf0.1 (r10; the kernel is ~0.1s).  Exactness
    is unchanged: distances are sums/products of grid integers < 2^53
    (exact in float64), ``argmin`` takes the FIRST minimum = the
    smallest code, matching the expression path's (dist, code)
    ``array_min`` tie-break bit for bit — equivalence is pinned by
    ``tests/test_recall.py::test_pq_encode_kernel_matches_expression``
    against :func:`_pq_encode_expr`.  NULL or too-short vectors encode
    as NULL codes/recon2 (the expression path's NULL-propagation
    contract).  The input is :func:`fan_out`-spread first (guide §2.5 —
    a single-row-group corpus would otherwise encode on one task;
    structural no-op on real at-scale scans)."""
    import numpy as np

    from parquet_merger_spark.partitioning import fan_out

    m = len(books)
    sub_dim = len(books[0][0])
    dim = m * sub_dim
    B = [np.array(sub, dtype=np.float64) for sub in books]  # (n_codes, sub_dim)
    B2 = [(b * b).sum(axis=1) for b in B]
    # exact integer self-dots per codeword, for the recon2 sum
    CV2 = [
        np.array([sum(x * x for x in cv) for cv in sub], dtype=np.int64)
        for sub in books
    ]
    # Exactness bound (r10 advice): every squared term and GEMM partial
    # sum must stay < 2^53 for the float64 distances to be the exact
    # integers the expression path computes — beyond it a rounded dist
    # can flip an argmin tie against the int64 arithmetic.  Each dist
    # term is a sum of sub_dim products of two grid values, so grid
    # magnitudes up to sqrt(2^53 / sub_dim) are provably safe.  The
    # codebook side is checked once here; the per-batch query side is
    # checked in the kernel (raise, never silently diverge).
    _grid_bound = float(np.sqrt(2.0**53 / max(1, sub_dim)))
    _b_max = max((float(np.abs(b).max()) if b.size else 0.0) for b in B)
    if _b_max > _grid_bound:
        raise ValueError(
            f"pq_encode: codebook grid magnitude {_b_max:.3e} exceeds the "
            f"float64-exactness bound {_grid_bound:.3e} for sub_dim="
            f"{sub_dim}; distances would not be exact integers"
        )
    id_type = corpus.schema[id_col].dataType.simpleString()

    def encode_batches(batches):
        for pdf in batches:
            qs = pdf["__q"]
            n = len(pdf)
            valid = np.array(
                [q is not None and len(q) >= dim for q in qs], dtype=bool
            )
            codes_col: list = [None] * n
            recon_col: list = [None] * n
            idx = np.flatnonzero(valid)
            if idx.size:
                Q = np.stack([np.asarray(qs.iat[i][:dim], dtype=np.float64) for i in idx])
                # r10 advice: a vector with null ELEMENTS arrives as NaN
                # (None -> nan in the float64 view); NaN distances make
                # argmin pick the first NaN position and the row would
                # get arbitrary-but-plausible codes.  The expression
                # path's zip_with/aggregate propagates element nulls to a
                # NULL dist for EVERY codeword, so array_min picks the
                # (null, code 0) struct and the row encodes all-zero
                # codes with recon2 = sum of code-0 self-dots — but such
                # a row's ADC score is then built from codewords the
                # vector never matched.  Encode it as NULL per the
                # documented contract instead (no fixture contains one;
                # the contract is pinned by test_pq_encode_null_elements).
                finite = np.isfinite(Q).all(axis=1)
                if Q.size and float(np.abs(Q[finite]).max(initial=0.0)) > _grid_bound:
                    raise ValueError(
                        "pq_encode: query grid magnitude exceeds the "
                        f"float64-exactness bound {_grid_bound:.3e} for "
                        f"sub_dim={sub_dim}"
                    )
                if not finite.all():
                    keep = np.flatnonzero(finite)
                    idx = idx[keep]
                    Q = Q[keep]
                codes = np.empty((idx.size, m), dtype=np.int32)
                recon2 = np.zeros(idx.size, dtype=np.int64)
                for s in range(m):
                    S = Q[:, s * sub_dim : (s + 1) * sub_dim]
                    dist = (
                        (S * S).sum(axis=1)[:, None]
                        - 2.0 * (S @ B[s].T)
                        + B2[s][None, :]
                    )
                    c = np.argmin(dist, axis=1)  # first min = smallest code
                    codes[:, s] = c
                    recon2 += CV2[s][c]
                for j, i in enumerate(idx):
                    codes_col[i] = codes[j].tolist()
                    recon_col[i] = int(recon2[j])
            out = pdf[[id_col]].copy()
            out["codes"] = codes_col
            out["recon2"] = recon_col
            yield out

    return fan_out(
        corpus.select(F.col(id_col), quantize(F.col(vec_col)).alias("__q"))
    ).mapInPandas(
        encode_batches, f"{id_col} {id_type}, codes array<int>, recon2 bigint"
    )


def _pq_encode_expr(
    corpus: DataFrame,
    books: list[list[list[int]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The pure-expression encode (the pre-r10 :func:`pq_encode` body):
    codebook as a broadcast one-row cross join, per-subspace argmin via
    ``array_min`` over (dist, code) structs.  Kept as the EQUIVALENCE
    REFERENCE the kernel path is test-pinned against — two independent
    spellings of the same exact-integer assignment."""
    sub_dim = len(books[0][0])
    d = (
        corpus.withColumn("__q", quantize(F.col(vec_col)))
        .crossJoin(F.broadcast(_books_df(corpus.sparkSession, books)))
        .withColumn("__subs", _pq_subs(sub_dim))
    )
    return (
        d.withColumn("__picked", _pq_picked())
        .select(
            F.col(id_col),
            F.transform(F.col("__picked"), lambda p: p["code"].cast("int")).alias(
                "codes"
            ),
            F.aggregate(
                F.transform(F.col("__picked"), lambda p: p["cvec2"]),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("recon2"),
        )
    )


def _adc_scores(
    encoded: DataFrame,
    queries: DataFrame,
    books: list[list[list[int]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """(query_id, vec_id, pq_cosine) for EVERY (query, corpus-row) pair —
    the ADC scan as ONE Arrow kernel over the code table (guide §4.2,
    the same recipe as :func:`pq_encode`'s r10 kernel).

    The r10 shape evaluated an interpreted per-(query, row) expression —
    m ``element_at`` lookups + an ``aggregate`` add chain inside a
    broadcast cross join; HOF expressions never enter codegen, so a real
    query load paid interpreter cost per pair.  Now the per-query lookup
    tables are built ONCE driver-side (the queries frame is a probe set
    — model-sized by the same contract that already let the old plan
    BROADCAST it; quantization happens IN SPARK via the same
    TakeOrdered-free one-job collect, so grid values are bit-identical),
    and each batch scores all queries as numpy fancy-gather + row sums.

    Exactness: LUT entries and the m-term ADC sums are integers < 2^53
    (bound checked — raise, never silently diverge), exact in float64;
    the cosine divides the same integer by the same
    ``sqrt(qq2) * sqrt(recon2)`` product in the same IEEE order as the
    expression path, so every double is bit-identical
    (pinned by ``tests/test_recall.py::test_pq_adc_kernel_matches_expression``
    against :func:`_adc_scores_expr`).  NULL codes / non-positive norms
    score -2.0 in both paths.  The code table is :func:`fan_out`-spread
    (a single-row-group persisted index would otherwise scan on one
    task)."""
    import numpy as np

    from parquet_merger_spark.partitioning import fan_out

    m = len(books)
    sub_dim = len(books[0][0])
    B = [np.array(sub, dtype=np.float64) for sub in books]  # (n_codes, sub_dim)
    qrows = (
        queries.select(
            F.col(query_id_col).alias("qid"),
            quantize(F.col(vec_col)).alias("__q"),
        )
        .withColumn("__q2", quantized_dot(F.col("__q"), F.col("__q")))
        .collect()
    )
    _grid_bound = float(np.sqrt(2.0**53 / max(1, sub_dim)))
    _b_max = max((float(np.abs(b).max()) if b.size else 0.0) for b in B)
    qids: list = []
    luts: list = []  # (m, n_codes) float64 exact-integer LUT per query
    qq2s: list = []
    for r in qrows:
        qids.append(r["qid"])
        q = r["__q"]
        if q is None or len(q) < m * sub_dim:
            luts.append(None)  # NULL lut -> every pair scores -2.0
            qq2s.append(None)
            continue
        qv = np.asarray(q[: m * sub_dim], dtype=np.float64)
        if qv.size and max(float(np.abs(qv).max()), _b_max) > _grid_bound:
            raise ValueError(
                "pq_topk: grid magnitude exceeds the float64-exactness "
                f"bound {_grid_bound:.3e} for sub_dim={sub_dim}"
            )
        lut = np.stack(
            [B[s] @ qv[s * sub_dim : (s + 1) * sub_dim] for s in range(m)]
        )  # (m, n_codes), exact integers in float64
        if float(np.abs(lut).max(initial=0.0)) * m >= 2.0**53:
            raise ValueError(
                "pq_topk: ADC partial sums exceed the float64-exactness "
                "bound 2^53"
            )
        luts.append(lut)
        qq2s.append(int(r["__q2"]) if r["__q2"] is not None else None)
    qid_type = queries.schema[query_id_col].dataType.simpleString()
    id_type = encoded.schema[id_col].dataType.simpleString()
    rng_m = np.arange(m)

    def adc_batches(batches):
        import pandas as pd

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            codes = pdf["codes"]
            rec = pdf["recon2"]
            ok = np.array(
                [c is not None and len(c) == m for c in codes], dtype=bool
            )
            rec_np = rec.to_numpy(dtype=np.float64, na_value=np.nan)
            ok &= np.isfinite(rec_np) & (rec_np > 0)
            idx = np.flatnonzero(ok)
            C = (
                np.stack([np.asarray(codes.iat[i], dtype=np.int64) for i in idx])
                if idx.size
                else np.empty((0, m), dtype=np.int64)
            )
            rden = np.sqrt(rec_np[idx])  # sqrt of exact ints, IEEE-identical
            ids = pdf[id_col]
            for j, qid in enumerate(qids):
                cos = np.full(n, -2.0)
                if luts[j] is not None and qq2s[j] and qq2s[j] > 0 and idx.size:
                    adc = luts[j][rng_m[None, :], C].sum(axis=1)
                    cos[idx] = adc / (np.sqrt(float(qq2s[j])) * rden)
                out = pd.DataFrame(
                    {
                        query_id_col: [qid] * n,
                        id_col: ids.to_numpy(),
                        "pq_cosine": cos,
                    }
                )
                yield out

    return fan_out(encoded.select(id_col, "codes", "recon2")).mapInPandas(
        adc_batches,
        f"{query_id_col} {qid_type}, {id_col} {id_type}, pq_cosine double",
    )


def _adc_scores_expr(
    encoded: DataFrame,
    queries: DataFrame,
    books: list[list[list[int]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """The pure-expression ADC scan (the pre-r11 :func:`pq_topk` body):
    per-query LUT via a broadcast one-row codebook cross join, per-pair
    score as m ``element_at`` lookups + an ``aggregate`` add chain.  Kept
    as the EQUIVALENCE REFERENCE the kernel path is test-pinned against —
    two independent spellings of the same exact-integer scan."""
    m = len(books)
    sub_dim = len(books[0][0])
    qd = (
        queries.withColumn("__q", quantize(F.col(vec_col)))
        .withColumn("__q2", quantized_dot(F.col("__q"), F.col("__q")))
        .crossJoin(F.broadcast(_books_df(queries.sparkSession, books)))
        .withColumn("__subs", _pq_subs(sub_dim))
    )
    lut = F.zip_with(
        F.col("__books"),
        F.col("__subs"),
        lambda sub_book, ss: F.transform(
            sub_book, lambda c: quantized_dot(ss["sub"], c["cvec"])
        ),
    )
    probes = qd.select(
        F.col(query_id_col), F.col("__q2").alias("qq2"), lut.alias("lut")
    )
    adc = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.sequence(F.lit(1), F.lit(m)),
            lambda code, s: F.element_at(F.element_at(F.col("lut"), s), code + 1),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        encoded.crossJoin(F.broadcast(probes))
        .withColumn(
            "pq_cosine",
            F.when(
                (F.col("qq2") > 0) & (F.col("recon2") > 0),
                adc / (F.sqrt(F.col("qq2")) * F.sqrt(F.col("recon2"))),
            ).otherwise(F.lit(-2.0)),
        )
        .select(query_id_col, id_col, "pq_cosine")
    )


def pq_topk(
    encoded: DataFrame,
    queries: DataFrame,
    books: list[list[list[int]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    rerank: DataFrame | None = None,
    shortlist: int | None = None,
) -> DataFrame:
    """Approximate top-k over PQ codes via ADC: (query_id, vec_id,
    pq_cosine, rank).

    The ADC scan runs as ONE Arrow kernel over the code table
    (:func:`_adc_scores`, guide §4.2): per-query m x n_codes lookup
    tables are built once driver-side from the Spark-quantized probe
    vectors, and each batch scores all queries as numpy gathers + row
    sums — the scan is exhaustive but touches only the compressed codes,
    never the original vectors (the r10 interpreted per-pair expression
    is kept as :func:`_adc_scores_expr`, test-pinned bit-identical).
    Scores are approximate (quantization error); ranking is
    total-ordered (score desc, id asc) and bit-stable.  Compose with
    assign_buckets() upstream to scan only nprobe buckets (IVF-PQ).

    ``rerank`` (the original-vector table, keyed by ``id_col``) enables
    the production two-stage shape: ADC keeps a per-query ``shortlist``
    (default 5k) of candidates, an equi-join fetches ONLY those rows'
    true vectors, and exact quantized cosine re-ranks to k.  The
    expensive float data is touched for shortlist rows per query instead
    of the whole corpus, and recall jumps because ADC only has to get
    the true neighbors into the shortlist, not rank them perfectly.
    """
    scored = _adc_scores(
        encoded, queries, books, id_col, vec_col, query_id_col
    ).filter(F.col(query_id_col) != F.col(id_col))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("pq_cosine"), F.col(id_col))
    if rerank is None:
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(
                query_id_col,
                id_col,
                F.round("pq_cosine", 6).alias("pq_cosine"),
                "rank",
            )
        )

    shortlist = shortlist or 5 * k
    cands = (
        scored.withColumn("__sl", F.row_number().over(w))
        .filter(F.col("__sl") <= shortlist)
        .select(query_id_col, id_col)
    )
    cv = _with_quantized(rerank, vec_col).select(
        F.col(id_col), F.col("__q").alias("cq"), F.col("__q2").alias("cq2")
    )
    qv = _with_quantized(queries, vec_col).select(
        F.col(query_id_col), F.col("__q").alias("qq"), F.col("__q2").alias("qq2")
    )
    exact = (
        cands.join(cv, id_col)
        .join(F.broadcast(qv), query_id_col)
        .withColumn(
            "pq_cosine",
            quantized_cosine(F.col("qq"), F.col("cq"), F.col("qq2"), F.col("cq2")),
        )
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id_col, id_col, F.round("pq_cosine", 6).alias("pq_cosine"), "rank"
        )
    )


def write_pq_index(
    corpus: DataFrame,
    path: str,
    m: int = 32,
    n_codes: int = 16,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist a PQ index: ``<path>/books`` (the one-row codebook model)
    and ``<path>/codes`` (the m-byte encodings + recon2).  Build once,
    probe many — the original float vectors are NOT part of the index;
    keep them wherever they live for the optional exact-rerank join.

    At 100 TB the codes table is ~100-300x smaller than the corpus, so a
    full ADC scan reads gigabytes, not terabytes."""
    books = train_pq_codebooks(corpus, m, n_codes, iters, id_col, vec_col)
    _books_df(corpus.sparkSession, books).write.mode("overwrite").parquet(
        f"{path}/books"
    )
    pq_encode(corpus, books, id_col, vec_col).write.mode("overwrite").parquet(
        f"{path}/codes"
    )


def load_pq_index(spark, path: str) -> tuple[list[list[list[int]]], DataFrame]:
    """(books, codes) from :func:`write_pq_index` output — ``books`` back
    as the plain driver-side model (row -> nested lists), ``codes`` as the
    encoded DataFrame ready for :func:`pq_topk`."""
    row = spark.read.parquet(f"{path}/books").collect()[0]
    books = [
        [[int(x) for x in entry["cvec"]] for entry in sub_book]
        for sub_book in row["__books"]
    ]
    return books, spark.read.parquet(f"{path}/codes")


def kmeans_lloyd_portable(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 2,
) -> DataFrame:
    """(id, cid, dist): assignments after ``iters`` UNROLLED Lloyd
    iterations of a fully cross-engine k-means — the oracle-certified
    twin of the production integer-Lloyd trainer (whose driver-side
    sampling and numpy kernels are rows-only in the contract).

    Everything is exact integer / exactly-rounded arithmetic any engine
    reproduces: vectors on the 1/QUANT_SCALE grid (established portable
    quantizer), seeds = the quantized vectors with ``id < k`` (cid = seed
    id), distance = integer squared L2 (<= 64 * (2e4)^2 ~ 2^35, exact),
    argmin ties broken by smallest cid (struct-min), and centroid update
    ``floor(sum/n)`` per dimension — floor of a correctly-rounded double
    quotient, exact here because quotients with denominator <= corpus
    size cannot round across an integer boundary.  Fixed iteration count
    = fixed SQL: the DuckDB oracle unrolls the same ``iters`` stages.

    Scale: per iteration one broadcast of k centroids against the corpus
    (candidate frame O(n*k) rows), one (cid, dim) aggregation —
    verification-tier at 100 TB (run on samples), where the production
    trainer's sample-bounded driver loop remains the headline path."""
    q = df.select(F.col(id_col).alias("id"), quantize(F.col(vec_col)).alias("q"))
    cent = q.filter(F.col("id") < k).select(
        F.col("id").alias("cid"), F.col("q").alias("cvec")
    )
    dist_expr = F.aggregate(
        F.zip_with("q", "cvec", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    assign = None
    for _ in range(iters):
        cand = q.crossJoin(F.broadcast(cent)).withColumn("dist", dist_expr)
        assign = cand.groupBy("id").agg(
            F.min(F.struct("dist", "cid")).alias("best")
        ).select("id", F.col("best.cid").alias("cid"), F.col("best.dist").alias("dist"))
        dims = (
            assign.join(q, "id")
            .select("cid", F.posexplode("q").alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(F.floor(F.sum("val") / F.count(F.lit(1))).cast("long").alias("cval"))
        )
        cent = dims.groupBy("cid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cval"))),
                lambda s: s["cval"],
            ).alias("cvec")
        )
    # final assignment against the last centroids (iters updates, then score)
    cand = q.crossJoin(F.broadcast(cent)).withColumn("dist", dist_expr)
    return (
        cand.groupBy("id")
        .agg(F.min(F.struct("dist", "cid")).alias("best"))
        .select(
            F.col("id").alias(id_col),
            F.col("best.cid").alias("cid"),
            F.col("best.dist").alias("dist"),
        )
    )


def _lloyd_centroids(q, k, iters):
    """Portable Lloyd over an already-quantized (id, q) frame -> the
    (cid, cvec) centroid frame after ``iters`` updates plus the shared
    squared-L2 expression — the core reused by the kmeans, IVF, and PQ
    twins (PQ runs it once per subspace slice)."""
    cent = q.filter(F.col("id") < k).select(
        F.col("id").alias("cid"), F.col("q").alias("cvec")
    )
    dist_expr = F.aggregate(
        F.zip_with("q", "cvec", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    for _ in range(iters):
        cand = q.crossJoin(F.broadcast(cent)).withColumn("dist", dist_expr)
        assign = (
            cand.groupBy("id")
            .agg(F.min(F.struct("dist", "cid")).alias("best"))
            .select("id", F.col("best.cid").alias("cid"))
        )
        dims = (
            assign.join(q, "id")
            .select("cid", F.posexplode("q").alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(F.floor(F.sum("val") / F.count(F.lit(1))).cast("long").alias("cval"))
        )
        cent = dims.groupBy("cid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cval"))),
                lambda s: s["cval"],
            ).alias("cvec")
        )
    return cent, dist_expr


def _portable_centroids(df, id_col, vec_col, k, iters):
    """(q, cent, dist): quantized corpus + portable Lloyd centroids."""
    q = df.select(F.col(id_col).alias("id"), quantize(F.col(vec_col)).alias("q"))
    cent, dist_expr = _lloyd_centroids(q, k, iters)
    return q, cent, dist_expr


def ivf_topk_portable(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_queries: int = 5,
    k_clusters: int = 8,
    iters: int = 2,
    nprobe: int = 2,
    topk: int = 10,
) -> DataFrame:
    """(query_id, rank, vec_id, score): IVF approximate top-k with a full
    cross-engine oracle — the certification twin of the production
    :func:`ivf_topk` (rows-only: its trainer is driver-side sampled).

    The whole probe algebra is portable arithmetic: coarse quantizer =
    the portable Lloyd centroids, corpus inverted lists = argmin
    assignment (cid tie-break), each query probes its ``nprobe`` nearest
    centroids, candidates score by EXACT integer dot product on the
    quantized grid (<= 64 * 1e8 per dim-sum, int64-exact), and the
    per-query top-``topk`` orders by (score desc, vec_id) — fully
    deterministic, so DuckDB reproduces ranks, ids, AND scores.

    Scale shape is the production one: probe cost = corpus/k_clusters *
    nprobe candidates per query, never the full corpus."""
    q, cent, dist_expr = _portable_centroids(df, id_col, vec_col, k_clusters, iters)
    assign = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("dist", dist_expr)
        .groupBy("id")
        .agg(F.min(F.struct("dist", "cid")).alias("best"))
        .select("id", F.col("best.cid").alias("cid"))
    )
    queries = q.filter(F.col("id") < n_queries).select(
        F.col("id").alias("query_id"), F.col("q").alias("qq")
    )
    probes = (
        queries.withColumnRenamed("qq", "q")
        .crossJoin(F.broadcast(cent))
        .withColumn("dist", dist_expr)
        .withColumn(
            "prank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy("dist", "cid")
            ),
        )
        .filter(F.col("prank") <= nprobe)
        .select("query_id", "cid")
    )
    corpus = q.join(assign, "id").select(
        F.col("id").alias("vec_id"), "q", "cid"
    )
    score = F.aggregate(
        F.zip_with("qq", "q", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    cand = (
        probes.join(corpus, "cid")
        .join(queries, "query_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("score", score)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("query_id", "rank", "vec_id", "score")
    )


def pq_topk_portable(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_queries: int = 5,
    m_subs: int = 4,
    k_codes: int = 8,
    iters: int = 2,
    topk: int = 10,
) -> DataFrame:
    """(query_id, rank, vec_id, score): product-quantization top-k with a
    full cross-engine oracle — the certification twin of the rows-only
    production :func:`pq_topk` family.

    The real ADC structure, every step portable: the 64-dim quantized
    vector splits into ``m_subs`` subspaces; each subspace trains its own
    portable-Lloyd codebook (``k_codes`` codes, seeds = sub-vectors of
    ids < k) and encodes the corpus by argmin (cid tie-break); each query
    precomputes a (subspace, code) -> integer-dot LOOKUP TABLE (the
    classic asymmetric-distance trick: n_queries * m * k rows, model
    tiny); a candidate's score is the SUM of its codes' LUT entries.
    Ranks, ids and scores all hash-match the unrolled DuckDB oracle.

    Scale shape is the production one: the corpus is touched only to
    encode (m bytes per vector of code ids); scoring joins codes against
    the broadcast LUT — no full-vector math per candidate at query time."""
    dims = 64
    dsub = dims // m_subs
    qall = df.select(F.col(id_col).alias("id"), quantize(F.col(vec_col)).alias("q"))
    code_frames = []
    lut_frames = []
    queries = qall.filter(F.col("id") < n_queries)
    for s in range(m_subs):
        qs = qall.select("id", F.slice("q", s * dsub + 1, dsub).alias("q"))
        cent_s, dist_expr = _lloyd_centroids(qs, k_codes, iters)
        code_frames.append(
            qs.crossJoin(F.broadcast(cent_s))
            .withColumn("dist", dist_expr)
            .groupBy("id")
            .agg(F.min(F.struct("dist", "cid")).alias("b"))
            .select(
                "id", F.lit(s).alias("sub"), F.col("b.cid").alias("code")
            )
        )
        dot = F.aggregate(
            F.zip_with("q", "cvec", lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        lut_frames.append(
            queries.select(
                F.col("id").alias("query_id"),
                F.slice("q", s * dsub + 1, dsub).alias("q"),
            )
            .crossJoin(F.broadcast(cent_s))
            .select(
                "query_id",
                F.lit(s).alias("sub"),
                F.col("cid").alias("code"),
                dot.alias("part"),
            )
        )
    codes = code_frames[0]
    for f in code_frames[1:]:
        codes = codes.unionByName(f)
    lut = lut_frames[0]
    for f in lut_frames[1:]:
        lut = lut.unionByName(f)
    scored = (
        codes.join(F.broadcast(lut), ["sub", "code"])
        .filter(F.col("id") != F.col("query_id"))
        .groupBy("query_id", "id")
        .agg(F.sum("part").alias("score"), F.count(F.lit(1)).alias("__m"))
        # a (query, vec) pair scores only if ALL m subspace parts joined
        # (they always do — every vec has m codes, every (sub, code) has
        # a LUT row — but the guard makes partial-join bugs loud)
        .filter(F.col("__m") == m_subs)
        .drop("__m")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("query_id", "rank", F.col("id").alias("vec_id"), "score")
    )


def ivfpq_topk_portable(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_queries: int = 5,
    k_clusters: int = 8,
    iters: int = 2,
    nprobe: int = 2,
    m_subs: int = 4,
    k_codes: int = 8,
    topk: int = 10,
) -> DataFrame:
    """(query_id, rank, vec_id, score): IVF-PQ approximate top-k with a
    full cross-engine oracle — the production composition (Jegou et al.,
    the Faiss ``IVFPQ`` index) assembled from the already-certified
    pieces: coarse portable-Lloyd quantizer -> RESIDUAL encoding
    (vector minus its coarse centroid, exact integer differences) ->
    per-subspace portable codebooks trained on the residuals -> nprobe
    coarse-list probe -> asymmetric-distance scoring where a candidate's
    score decomposes as  dot(query, coarse_centroid) + sum of per-
    subspace LUT entries for its residual codes.  Every step is exact
    integer / floor arithmetic, so DuckDB reproduces ranks, ids AND
    scores.

    Scale shape is the production one: the corpus is touched once to
    assign + residual-encode (m code bytes per vector); query cost =
    nprobe/k_clusters of the corpus scored via a broadcast LUT of
    n_queries * m_subs * k_codes integers — never full-vector math per
    candidate, never the full corpus.  Verification tier at 100 TB (the
    rows-only xxhash64/driver-trainer IVF+PQ keys stay the headline
    path)."""
    dims = 64
    dsub = dims // m_subs
    q, cent, dist_expr = _portable_centroids(df, id_col, vec_col, k_clusters, iters)
    assign = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("dist", dist_expr)
        .groupBy("id")
        .agg(F.min(F.struct("dist", "cid")).alias("best"))
        .select("id", F.col("best.cid").alias("cid"))
    )
    resid = (
        assign.join(q, "id")
        .join(F.broadcast(cent), "cid")
        .select(
            "id",
            "cid",
            F.zip_with("q", "cvec", lambda a, b: a - b).alias("r"),
        )
    )
    queries = q.filter(F.col("id") < n_queries).select(
        F.col("id").alias("query_id"), F.col("q").alias("qq")
    )
    probes = (
        queries.withColumnRenamed("qq", "q")
        .crossJoin(F.broadcast(cent))
        .withColumn("dist", dist_expr)
        .withColumn(
            "prank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy("dist", "cid")
            ),
        )
        .filter(F.col("prank") <= nprobe)
        .select("query_id", "cid")
    )
    coarse_dot = F.aggregate(
        F.zip_with("qq", "cvec", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    coarse_part = queries.crossJoin(F.broadcast(cent)).select(
        "query_id", "cid", coarse_dot.alias("cpart")
    )
    code_frames = []
    lut_frames = []
    for s in range(m_subs):
        rs = resid.select("id", F.slice("r", s * dsub + 1, dsub).alias("q"))
        cent_s, dist_s = _lloyd_centroids(rs, k_codes, iters)
        code_frames.append(
            rs.crossJoin(F.broadcast(cent_s))
            .withColumn("dist", dist_s)
            .groupBy("id")
            .agg(F.min(F.struct("dist", "cid")).alias("b"))
            .select("id", F.lit(s).alias("sub"), F.col("b.cid").alias("code"))
        )
        sub_dot = F.aggregate(
            F.zip_with("q", "cvec", lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        lut_frames.append(
            queries.select(
                "query_id", F.slice("qq", s * dsub + 1, dsub).alias("q")
            )
            .crossJoin(F.broadcast(cent_s))
            .select(
                "query_id",
                F.lit(s).alias("sub"),
                F.col("cid").alias("code"),
                sub_dot.alias("part"),
            )
        )
    codes = code_frames[0]
    for f in code_frames[1:]:
        codes = codes.unionByName(f)
    lut = lut_frames[0]
    for f in lut_frames[1:]:
        lut = lut.unionByName(f)
    cand = (
        probes.join(resid.select("id", "cid"), "cid")
        .filter(F.col("id") != F.col("query_id"))
        .select("query_id", "cid", "id")
    )
    adc = (
        cand.join(codes, "id")
        .join(F.broadcast(lut), ["query_id", "sub", "code"])
        .groupBy("query_id", "cid", "id")
        .agg(F.sum("part").alias("rpart"), F.count(F.lit(1)).alias("__m"))
        .filter(F.col("__m") == m_subs)
        .drop("__m")
    )
    scored = adc.join(F.broadcast(coarse_part), ["query_id", "cid"]).select(
        "query_id", "id", (F.col("rpart") + F.col("cpart")).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("query_id", "rank", F.col("id").alias("vec_id"), "score")
    )


def mmr_rerank_portable(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_queries: int = 4,
    n_candidates: int = 16,
    k: int = 4,
) -> DataFrame:
    """(query_id, rank, vec_id, mmr_score): Maximal-Marginal-Relevance
    diversity re-rank (Carbonell & Goldstein 1998) over a retrieved
    candidate set, fully cross-engine — the selection extends the
    certified iterative family (kmeans/IVF/PQ/IVF-PQ) from *retrieval*
    to *result diversification*, the step RAG/curation pipelines run
    between ANN search and the consumer.

    Semantics (lambda = 1/2, so ordering == argmax of
    ``rel - max_sim_to_selected``; the first pick is pure relevance):
    candidates = exact integer-dot top-``n_candidates`` per query
    (self excluded), then ``k`` greedy picks, each maximizing
    ``rel(x) - max(sim(x, s) for s in selected)``, ties by smallest id.
    All scores are integer dots of grid-quantized vectors, so the
    unrolled DuckDB oracle reproduces ranks, ids AND scores exactly.

    Scale shape (the production one): rerank cost is per-QUERY-local —
    after candidate retrieval each query's group is a bounded
    ``n_candidates``-row problem (an O(n^2) integer GEMM on ~100 rows),
    embarrassingly parallel across millions of queries via one
    ``applyInPandas`` over query_id; no cross-query state, no shuffle
    beyond the candidate groupBy.  The greedy loop lives INSIDE the
    Arrow batch, never on the driver."""
    q = df.select(F.col(id_col).alias("id"), quantize(F.col(vec_col)).alias("q"))
    queries = q.filter(F.col("id") < n_queries).select(
        F.col("id").alias("query_id"), F.col("q").alias("qv")
    )
    rel = (
        q.crossJoin(F.broadcast(queries))
        .filter(F.col("id") != F.col("query_id"))
        .withColumn("rel", quantized_dot(F.col("q"), F.col("qv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rel"), F.asc("id"))
    cand = (
        rel.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n_candidates)
        .select("query_id", F.col("id").alias("cand_id"), "q", "rel")
    )

    kk = int(k)

    def _rerank(pdf):
        import numpy as np
        import pandas as pd

        V = np.asarray(pdf["q"].tolist(), dtype=np.int64)
        ids = pdf["cand_id"].to_numpy(np.int64)
        rel_ = pdf["rel"].to_numpy(np.int64)
        qid = int(pdf["query_id"].iloc[0])
        n = len(ids)
        sim = V @ V.T
        maxsim = None  # step 1 has no selected set: score = pure rel
        taken = np.zeros(n, dtype=bool)
        out = []
        for r in range(min(kk, n)):
            score = rel_ if maxsim is None else rel_ - maxsim
            for i in np.lexsort((ids, -score)):
                if not taken[i]:
                    pick = int(i)
                    break
            taken[pick] = True
            out.append((qid, r + 1, int(ids[pick]), int(score[pick])))
            maxsim = (
                sim[:, pick].copy()
                if maxsim is None
                else np.maximum(maxsim, sim[:, pick])
            )
        return pd.DataFrame(
            out, columns=["query_id", "rank", "vec_id", "mmr_score"]
        )

    return cand.groupBy("query_id").applyInPandas(
        _rerank, "query_id long, rank long, vec_id long, mmr_score long"
    )


def rhp_lsh_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 12,
    bands: int = 6,
    threshold: float = 0.35,
) -> DataFrame:
    """Embedding near-duplicate pairs via sign-random-projection LSH
    (Charikar 2002) — the EMBEDDING-space sibling of the text SimHash:
    each vector gets a ``bits``-bit signature (bit j = sign of the dot
    product with a deterministic integer hyperplane), signatures are
    banded ``bands`` ways, vectors sharing any (band, band-signature)
    bucket become candidates, and the exact quantized cosine >=
    ``threshold`` re-filter keeps true near-duplicates.  Complements
    :func:`knn_graph`'s blocked GEMM: the GEMM scans all block pairs for
    exact answers; RHP-LSH touches only hash-colliding candidates — the
    cheap first pass when the corpus is 10^10 vectors and the question is
    "which pairs are near-duplicates", not "what are everyone's top-k".

    Fully engine-portable, hence exactly DuckDB-checkable: embeddings on
    the 1/QUANT_SCALE integer grid, hyperplane component d of plane j is
    ``((a*(j*dim + d) + c) mod p) mod 21 - 10`` (ints in [-10, 10] from
    one multiply-add hash — no stored model, any engine regenerates the
    planes from two literals), so every dot product is exact int64 and
    the bucket set — and therefore the output — is deterministic.

    Collision calculus (bits=12, bands=6 -> r=2 bits/band): P(bit agrees)
    = 1 - theta/pi, so a cos 0.4 pair agrees per bit w.p. ~0.63 and hits
    >= 1 of 6 bands w.p. ~0.94 (a cos 0.8 pair: ~0.999); recall against
    the exact cosine join is bounded in tests, while CORRECTNESS is exact
    because the oracle replays the identical bucketing.

    Scale design (100 TB): signatures are row-local arithmetic (one pass,
    no shuffle); the only wide op is the banded equi-join, O(vectors x
    bands) with AQE handling hot buckets; the verify filter runs on
    candidates only.  Output: (id_a, id_b, cosine) with id_a < id_b."""
    # ValueError, not assert: band divisibility guards recall (python -O
    # would strip the check and silently truncate the last band)
    if bits % bands != 0:
        raise ValueError(f"bits ({bits}) must divide into bands ({bands})")
    from parquet_merger_spark.operators.dedup import (
        PORTABLE_HASH_AC,
        PORTABLE_MOD,
    )

    a1, c1 = PORTABLE_HASH_AC[1]
    r = bits // bands
    dim = 64  # testdata embedding width; planes regenerate for any dim

    base = df.select(
        F.col(id_col), quantize(F.col(vec_col)).alias("qe")
    ).withColumn("q2", quantized_dot(F.col("qe"), F.col("qe")))

    def _coef(j: int, d: Column) -> Column:
        # component d (0-based) of hyperplane j: deterministic int in
        # [-10, 10]; all intermediates positive so pmod == SQL's %.
        return (
            F.pmod(
                F.lit(a1) * (F.lit(j * dim) + d + F.lit(1)) + F.lit(c1),
                F.lit(PORTABLE_MOD),
            )
            % F.lit(21)
            - F.lit(10)
        )

    def _bit(j: int) -> Column:
        proj = F.aggregate(
            F.zip_with(
                F.col("qe"),
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda x, d: x * _coef(j, d.cast("long")),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        return F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0))

    sig = base.select(
        F.col(id_col),
        F.col("qe"),
        F.col("q2"),
        *[_bit(j).alias(f"b{j}") for j in range(bits)],
    )
    band_rows = sig.select(
        F.col(id_col),
        F.col("qe"),
        F.col("q2"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        sum(
                            (F.col(f"b{b * r + i}") * F.lit(1 << i))
                            for i in range(r)
                        ).alias("sig"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("c"),
    ).select(id_col, "qe", "q2", "c.band", "c.sig")
    cand = (
        band_rows.alias("a")
        .join(
            band_rows.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.qe").alias("qa"),
            F.col("a.q2").alias("n2a"),
            F.col("b.qe").alias("qb"),
            F.col("b.q2").alias("n2b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn(
            "cosine",
            quantized_cosine(
                F.col("qa"), F.col("qb"), F.col("n2a"), F.col("n2b")
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select(
            "id_a", "id_b", F.round("cosine", 6).alias("cosine")
        )
    )


def pca_power_projection_portable(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 2,
    scale: int = 1000,
    return_vector: bool = False,
):
    """1-D PCA by POWER ITERATION on the quantized-integer grid — project
    every embedding onto the corpus's dominant principal direction (the
    whitening / coarse-ordering primitive for embedding pipelines:
    curriculum by spectral position, 1-D blocking for ANN, drift
    monitoring of the top component).  The Gram matrix is NEVER
    materialized: one power step is one corpus pass computing the scalar
    p_row = <qe, v> per row and accumulating the 64-cell aggregate
    v'[i] = sum_rows qe[i] * p_row — the classic distributed power
    iteration (cf. the Arnoldi/Lanczos family), with v held as a
    model-sized driver list exactly like the k-means twin's centroids.

    Fully engine-portable, hence exactly DuckDB-checkable (the SEVENTH
    certified iterative operator, after k-means/IVF/PQ/IVF-PQ/MMR/LSH
    families): v0 = ones; each step rescales v to [-scale, scale] via
    ``floor((v * scale.0) / max(|v|, 1))`` — an IEEE-double op both
    engines evaluate identically — so every accumulation stays exact
    int64 (with scale=1000 and 1e4-grid embeddings, sums stay < 2^63
    up to ~1e6 rows; the production tier accumulates in double and is
    bounded against this twin instead).  Output: (id, proj) — the exact
    integer projection of each row onto the iterated direction.

    Scale design (100 TB): `iters` corpus passes, each a partial-agg
    sum to 64 cells (no shuffle wider than 64 rows), one broadcast of a
    64-int literal per pass; the per-pass collect is model-sized (64
    longs), the sanctioned idiom."""
    import math

    base = df.select(
        F.col(id_col), quantize(F.col(vec_col)).alias("qe")
    )
    dim = len(base.select("qe").first()["qe"])

    def _scale(vs: list[int]) -> list[int]:
        m = max(max(abs(x) for x in vs), 1)
        return [int(math.floor((x * float(scale)) / m)) for x in vs]

    v: list[int] | None = None  # None = ones vector
    for _ in range(iters):
        if v is None:
            p = F.aggregate(
                F.col("qe"), F.lit(0).cast("long"), lambda a, x: a + x
            )
        else:
            vlit = F.array(*[F.lit(c).cast("long") for c in v])
            p = quantized_dot(F.col("qe"), vlit)
        sums = (
            base.select(F.posexplode(F.transform(F.col("qe"), lambda x: x * p)))
            .groupBy("pos")
            .agg(F.sum("col").alias("s"))
            .collect()
        )
        by_pos = {r["pos"]: r["s"] for r in sums}
        v = _scale([by_pos[i] for i in range(dim)])

    vlit = F.array(*[F.lit(c).cast("long") for c in v])
    proj = base.select(
        F.col(id_col), quantized_dot(F.col("qe"), vlit).alias("proj")
    )
    if return_vector:
        # the iterated direction as exact model-sized ints (for energy /
        # variance-explained reports: |v|^2 folds driver-side, exactly)
        return proj, list(v)
    return proj
