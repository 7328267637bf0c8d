"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference surface (it has no data-value dedup; its only distinct
is on registered folders, src/main.rs:118): exact, MinHash-LSH, SimHash,
and n-gram-Jaccard near-dup — each expressed with JVM-side built-ins
(``pyspark.sql.functions``) so the hot path stays inside whole-stage
codegen; no Python UDFs anywhere.

Scale design (100 TB):
- exact dedup: hash-partitioned window/groupBy on the key — one shuffle,
  AQE handles skew.
- MinHash/SimHash: signatures are narrow (k longs per doc); the candidate
  join is an equi-join on (band_id, band_hash) buckets — shuffle size
  O(docs x bands), never O(docs^2).  Verification joins back only the
  candidate pairs.
- All hash functions are ``xxhash64`` with per-row-index salts —
  deterministic across runs/executors, no RNG state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def tokens_col(text: Column | str, sep: str = " ") -> Column:
    return F.split(text, sep)


def word_ngrams(tokens: Column, n: int) -> Column:
    """Word n-grams as strings, 1-based positions i..i+n-1; empty array when
    the doc has fewer than n tokens (guards Spark's descending-sequence
    behavior when start > stop)."""
    num = F.size(tokens) - (n - 1)
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(tokens, i + j) for j in range(n)]
    )
    return F.when(
        num >= 1, F.transform(F.sequence(F.lit(1), num), gram)
    ).otherwise(F.array().cast("array<string>"))


def exact_dedup(df: DataFrame, key_cols: list[str], order_col: str) -> DataFrame:
    """Keep exactly one row per key (the minimum ``order_col`` row) —
    deterministic, unlike ``dropDuplicates`` whose survivor depends on
    partition order.  One shuffle on the key."""
    w = Window.partitionBy(*key_cols).orderBy(order_col)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def _distinct_shingles(
    df: DataFrame, id_col: str, text_col: str, shingle_words: int
) -> DataFrame:
    return df.select(
        F.col(id_col),
        F.array_distinct(word_ngrams(tokens_col(text_col), shingle_words)).alias(
            "shingles"
        ),
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    shingle_words: int = 2,
) -> DataFrame:
    """(id, shingles, sig) where sig[i] = min over shingles of
    xxhash64(shingle, salt=i).  Deterministic; k independent hash functions
    via salt literals."""
    sh = _distinct_shingles(df, id_col, text_col, shingle_words)
    sig = F.array(
        *[
            F.array_min(F.transform("shingles", lambda s, i=i: F.xxhash64(s, F.lit(i))))
            for i in range(num_hashes)
        ]
    ).alias("sig")
    return sh.select(id_col, "shingles", sig)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 16,
    shingle_words: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + LSH banding, Jaccard-verified.

    Pipeline: shingle -> k minhashes -> b bands of r=k/b rows -> band-hash
    buckets -> candidate pairs = docs sharing any bucket (equi-join, no
    cross product) -> exact Jaccard on the distinct-shingle sets of the
    candidates only.  Returns (id_a, id_b, jaccard) with id_a < id_b and
    jaccard >= threshold.
    """
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_words)
    sigs = sigs.filter(F.size("shingles") > 0).cache()

    band_cols = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    *[F.col("sig")[b * rows_per_band + r] for r in range(rows_per_band)]
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    buckets = sigs.select(
        F.col(id_col), F.explode(band_cols).alias("bb")
    ).select(id_col, "bb.band", "bb.bucket")

    left = buckets.alias("l")
    right = buckets.alias("r")
    cands = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
        )
        .distinct()
    )

    sh = sigs.select(F.col(id_col), F.col("shingles"))
    verified = (
        cands.join(sh.withColumnsRenamed({id_col: "id_a", "shingles": "sh_a"}), "id_a")
        .join(sh.withColumnsRenamed({id_col: "id_b", "shingles": "sh_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return verified


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_words: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """EXACT n-gram Jaccard similarity join with prefix filtering
    (AllPairs/PPJoin): identical output to the naive inverted-index join,
    but candidates come only from each document's *prefix* — its
    floor((1-t)*n)+1 globally-rarest shingles.  Any pair with
    Jaccard >= t must share a prefix shingle, so no pair is lost; joining
    on rare shingles kills the common-gram pair explosion that makes the
    naive join quadratic in practice.

    A length filter (t*max(|A|,|B|) <= min(|A|,|B|)) prunes candidates
    before the verification join.  Verification computes exact Jaccard on
    the full distinct-shingle sets, so the result equals the naive join
    row-for-row (differentially tested against a naive SQL oracle).
    """
    # Cache: the shingle arrays feed candidate generation AND both sides of
    # the verification join — without it the text-parsing pipeline re-runs
    # 4x.  (At cluster scale: persist(DISK_ONLY) or a checkpoint table.)
    sh = (
        _distinct_shingles(df, id_col, text_col, shingle_words)
        .filter(F.size("shingles") > 0)
        .withColumn("n", F.size("shingles"))
        .cache()
    )
    inv = sh.select(F.col(id_col), "n", F.explode("shingles").alias("gram"))

    # Global document frequency per shingle -> rarity order (df, gram).
    gram_df = inv.groupBy("gram").agg(F.count("*").alias("df"))
    ranked = inv.join(gram_df, "gram").withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy(id_col).orderBy("df", "gram")
        ),
    )
    prefix_len = F.floor((1.0 - threshold) * F.col("n")).cast("int") + 1
    prefix = ranked.filter(F.col("rn") <= prefix_len).select(id_col, "n", "gram")

    cands = (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            # length filter: jaccard >= t requires t*|larger| <= |smaller|
            & (F.greatest("a.n", "b.n") * threshold <= F.least("a.n", "b.n")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )

    sets = sh.select(F.col(id_col), "shingles")
    return (
        cands.join(
            sets.withColumnsRenamed({id_col: "id_a", "shingles": "sh_a"}), "id_a"
        )
        .join(sets.withColumnsRenamed({id_col: "id_b", "shingles": "sh_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash_signatures(
    df: DataFrame, id_col: str, text_col: str, bits: int = 64
) -> DataFrame:
    """64-bit SimHash per document: each token votes +1/-1 on every bit of
    xxhash64(token); the sign of each bit-sum becomes the fingerprint bit.

    Implemented as 64 conditional-sum aggregates over the exploded tokens —
    all JVM-side, one shuffle on id."""
    toks = df.select(
        F.col(id_col), F.explode(tokens_col(text_col)).alias("tok")
    ).withColumn("h", F.xxhash64("tok"))
    votes = [
        F.sum(
            F.when(F.shiftright("h", j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(bits)
    ]
    agg = toks.groupBy(id_col).agg(*votes)
    fp = None
    for j in range(bits):
        bit = F.when(F.col(f"b{j}") > 0, F.shiftleft(F.lit(1).cast("long"), j)).otherwise(
            F.lit(0).cast("long")
        )
        fp = bit if fp is None else fp.bitwiseOR(bit)
    return agg.select(F.col(id_col), fp.alias("simhash"))


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Near-dup pairs with Hamming distance <= max_hamming on 64-bit SimHash.

    Candidate generation: split the fingerprint into ``bands`` chunks; by
    pigeonhole any pair within distance < bands shares >= 1 exact chunk, so
    candidates come from an equi-join on (chunk_id, chunk_value).  Verify
    with bit_count(xor)."""
    sigs = simhash_signatures(df, id_col, text_col).cache()
    chunk_bits = 64 // bands
    mask = (1 << chunk_bits) - 1
    chunks = sigs.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("chunk_id"),
                        F.shiftrightunsigned("simhash", b * chunk_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("chunk"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("c"),
    ).select(id_col, "simhash", "c.chunk_id", "c.chunk")
    cands = (
        chunks.alias("a")
        .join(
            chunks.alias("b"),
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    return (
        cands.withColumn(
            "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
