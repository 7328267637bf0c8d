"""Corpus curation: the composed pre-training document filter.

EXTENSION surface (the reference, shanytc/parquet-merger, has no text
analytics at all — its data plane is schema-intersection parquet merging,
src/main.rs:300-450).  This module chains the individually-oracled signal
operators from :mod:`parquet_merger_spark.operators.textstats` into the
pass every large-scale training pipeline runs before tokenization:

    quality gate + language gate + repetition gate -> PII-redacted survivors

Scale design (100 TB):
- ONE scan, ZERO shuffles: every signal (quality score, marker language
  ID, sorted-run-length repetition stats, regex PII scrub) is a row-local
  projection, so the whole curation pass is a single narrow stage Spark
  parallelizes per input split.  Filter predicates on plain columns
  (e.g. a partition/source column) still push to the parquet scan below
  the computed projections.
- The retained fraction is decided per row with fixed documented
  constants — no global statistics pass, no driver collect, nothing that
  serializes at 1000 executors.
- Composes upstream of dedup: run curation first (cheap row-local
  signals cut the corpus), then MinHash-LSH near-dup on the survivors
  (the expensive candidate join sees fewer docs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from parquet_merger_spark.operators.textstats import (
    language_scores,
    quality_score,
    redact_pii,
    with_repetition_stats,
)


def curate_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.55,
    allowed_langs: tuple[str, ...] = ("en",),
    max_dup_token_frac: float = 0.6,
    max_top_bigram_frac: float = 0.1,
    min_tokens: int = 20,
) -> DataFrame:
    """Documents that survive the standard curation gates, with PII
    scrubbed from the surviving text.

    Returns (id, predicted_lang, quality, dup_token_frac,
    top_bigram_frac, n_tokens, text_redacted) for rows passing ALL of:

    - ``quality >= min_quality``            (composite quality score)
    - ``predicted_lang IN allowed_langs``   (marker-based language ID)
    - ``dup_token_frac <= max_dup_token_frac`` and
      ``top_bigram_frac <= max_top_bigram_frac`` (Gopher-style
      repetition signals — boilerplate/spam cut)
    - ``n_tokens >= min_tokens``            (fragment cut)

    Each signal keeps the exact semantics of its standalone operator
    (same constants, same rounding), so the composed DuckDB oracle is a
    CTE-join of the per-signal oracle specs — a genuine differential
    check of the composition, not just of each part.

    Column hygiene: :func:`quality_score` and
    :func:`with_repetition_stats` both derive token counts with
    different tokenizers (trimmed-regex vs plain split), so each stage's
    intermediate columns are projected away before the next stage runs —
    only the documented output columns survive.
    """
    base_cols = df.columns
    # fan_out (guide §2.5): the whole pass is row-local by design, which
    # also means a single-row-group corpus runs it on ONE task; spread
    # first so the signal projections and the repetition UDF parallelize
    # (structural no-op on real at-scale scans)
    from parquet_merger_spark.partitioning import fan_out

    df = fan_out(df)
    d = quality_score(df, text_col).select(*base_cols, "quality")
    d = language_scores(d, text_col).select(*base_cols, "quality", "predicted_lang")
    d = with_repetition_stats(d, text_col)
    kept = d.filter(
        (F.col("quality") >= min_quality)
        & F.col("predicted_lang").isin(list(allowed_langs))
        & (F.col("dup_token_frac") <= max_dup_token_frac)
        & (F.col("top_bigram_frac") <= max_top_bigram_frac)
        & (F.col("n_tokens") >= min_tokens)
    )
    redacted = redact_pii(kept, text_col)
    return redacted.select(
        F.col(id_col),
        "predicted_lang",
        "quality",
        "dup_token_frac",
        "top_bigram_frac",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "text_redacted",
    )
