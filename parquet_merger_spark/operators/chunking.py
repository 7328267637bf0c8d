"""Document chunking and sequence packing — the two transforms between a
cleaned corpus and a training batch.

- :func:`chunk_documents` splits each document into overlapping
  fixed-token-budget chunks (context-window slicing).  Pure JVM array ops
  (sequence + slice + explode), shuffle-free, embarrassingly parallel.
- :func:`pack_sequences` assigns documents to fixed-token-budget bins
  (offset-based: a document's bin is its starting token offset divided by
  the budget, accumulated in a deterministic order).  Bin packing needs a
  RUNNING SUM, i.e. an ordered window — so packing is per ``shard_col``
  (language, source, bucket...): each shard packs independently in
  parallel, which is both the scalable plan AND what mixture-aware batch
  construction wants.  A global pack (shard_col=None) is supported for
  small corpora but runs as a single-partition window — documented, not
  default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, chunk_idx, chunk_text, n_chunk_tokens): whitespace-token
    chunks of ``chunk_tokens`` tokens, consecutive chunks sharing
    ``overlap`` tokens; the final chunk may be shorter.  1-based chunk
    indices; empty docs produce one empty chunk (token contract matches
    ``split(' ')``).

    Chunk starts stop at the FIRST start whose chunk reaches the document
    end — a start beyond that would emit a chunk fully contained in its
    predecessor (pure duplicate training text)."""
    if not 0 <= overlap < chunk_tokens:
        # ValueError, not assert: asserts strip under python -O and the
        # invalid step would surface as an opaque engine error instead
        raise ValueError(
            f"need 0 <= overlap < chunk_tokens; got {overlap}, {chunk_tokens}"
        )
    step = chunk_tokens - overlap
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    # last useful start s* = first series element >= n - chunk_tokens + 1;
    # bounding the sequence by n - chunk_tokens + step includes s* and
    # excludes s* + step (which would duplicate the tail)
    starts = F.sequence(
        F.lit(1), F.greatest(n - chunk_tokens + step, F.lit(1)), F.lit(step)
    )
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            F.array_join(F.slice(toks, s, chunk_tokens), " ").alias("chunk_text"),
            # guard NULL text ON n ITSELF: least() SKIPS null operands
            # (least(NULL, chunk_tokens) = chunk_tokens, not NULL), so
            # the unguarded expression reported a FULL chunk_tokens
            # count for nonexistent text, inflating every downstream
            # token budget (pack_sequences)
            F.when(
                n.isNotNull(), F.least(n - s + 1, F.lit(chunk_tokens))
            ).otherwise(F.lit(0)).alias("n_chunk_tokens"),
        ),
    )
    return df.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_idx0", "c")
    ).select(
        id_col,
        (F.col("chunk_idx0") + 1).alias("chunk_idx"),
        F.col("c.chunk_text").alias("chunk_text"),
        F.col("c.n_chunk_tokens").cast("long").alias("n_chunk_tokens"),
    )


def pack_sequences(
    df: DataFrame,
    budget_tokens: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    shard_col: str | None = None,
) -> DataFrame:
    """Assign each document a (shard, bin_id): documents are laid out
    end-to-end in ``id_col`` order within a shard, and a document's bin is
    ``floor(start_offset / budget)`` — deterministic, one window pass, and
    exactly replicable in SQL (the contract differential-tested against
    DuckDB).  Offset-based binning means a document can straddle a budget
    boundary (its bin is where it STARTS); real packers then truncate or
    spill — that policy layer is the caller's.

    ``id_col`` must be UNIQUE within a shard: the layout is defined by a
    total order.  The frame is pinned to ROWS (the default RANGE frame
    treats order-key ties as peers — duplicate ids would each see the
    peer-inclusive running sum, producing overlapping offsets silently);
    with ROWS, duplicate ids still pack without overlap, but their
    relative order — hence their bin split — is not reproducible."""
    part = [shard_col] if shard_col else []
    w = (
        Window.partitionBy(*part)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum(token_col).over(w) - F.col(token_col)
    out = df.withColumn("bin_id", F.floor(start / budget_tokens).cast("long"))
    return out
