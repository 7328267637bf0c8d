"""Text-analysis operators: token counting, quality scoring, language ID,
document fingerprinting.

Mostly pure JVM-side expressions (split/filter/transform/md5); the
repetition mode-counts are one Arrow-batched Pandas UDF (see
``with_repetition_stats`` for why that is load-bearing for plan safety).
Everything runs per document over arbitrarily many partitions with no
shuffle at all, which is exactly what a 100 TB text-cleaning pass needs:
embarrassingly parallel, columns pruned to (id, text) at the scan.

Tokenization is a deliberate, documented contract: split on single spaces
(the corpus is space-normalized) — keep the tokenizer trivial and identical
across engines so differential oracles compare exactly.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from parquet_merger_spark.barrier import materialize, materialize_lazy

# Tiny per-language marker lists for the n-gram/stopword heuristic.  Real
# pipelines plug fastText/cld3 here via a Pandas UDF; the heuristic keeps
# the engine dependency-free and the semantics SQL-expressible.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "is"],
    "fr": ["le", "la", "et", "un", "est"],
    "de": ["der", "die", "und", "ein", "ist"],
    "es": ["el", "la", "y", "un", "es"],
}

STOPWORDS = ["the", "a", "and", "of", "is", "to", "in"]


def tokens(text: Column | str) -> Column:
    return F.split(text, " ")


def token_count(text: Column | str) -> Column:
    """Whitespace token count; 0 for empty/blank text."""
    t = F.col(text) if isinstance(text, str) else text
    return (
        F.when(F.length(F.trim(t)) == 0, F.lit(0))
        .otherwise(F.size(F.split(F.trim(t), r"\s+")))
        .cast("long")
    )


def bpe_ish_token_count(text: Column | str) -> Column:
    """Sub-word-ish token estimate: word-boundary pieces of <=4 chars count
    as 1, longer words as ceil(len/4) — a deterministic stand-in for a BPE
    tokenizer's token count (regex segmentation, no vocab needed)."""
    t = F.col(text) if isinstance(text, str) else text
    per_word = F.transform(
        F.split(F.trim(t), r"\s+"), lambda w: F.ceil(F.length(w) / 4.0)
    )
    return (
        F.when(F.length(F.trim(t)) == 0, F.lit(0))
        .otherwise(F.aggregate(per_word, F.lit(0).cast("long"), lambda a, x: a + x))
        .cast("long")
    )


def stopword_hits(toks: Column, words: list[str]) -> Column:
    """Number of tokens (with multiplicity) that are in ``words``."""
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).cast("long")


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append n_chars / n_tokens / n_tokens_bpe / avg_token_len /
    stopword_ratio / punct_ratio columns."""
    t = F.col(text_col)
    toks = tokens(t)
    n_tok = token_count(t)
    no_punct = F.regexp_replace(t, r"[^\p{L}\p{N}\s]", "")
    return (
        df.withColumn("n_chars", F.length(t).cast("long"))
        .withColumn("n_tokens", n_tok)
        .withColumn("n_tokens_bpe", bpe_ish_token_count(t))
        .withColumn(
            "avg_token_len",
            # normalized length (trim + collapse \s+ runs), matching
            # token_count's tokenizer: the raw length over-counts for
            # exactly the whitespace shapes token_count defends against
            # (' ab cd ' -> 3.0 instead of the true 2.0)
            F.when(
                n_tok > 0,
                (
                    F.length(F.regexp_replace(F.trim(t), r"\s+", " "))
                    - n_tok
                    + 1
                )
                / n_tok,
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "stopword_ratio",
            F.when(n_tok > 0, stopword_hits(toks, STOPWORDS) / n_tok).otherwise(
                F.lit(0.0)
            ),
        )
        .withColumn(
            "punct_ratio",
            F.when(
                F.length(t) > 0,
                (F.length(t) - F.length(no_punct)) / F.length(t),
            ).otherwise(F.lit(0.0)),
        )
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite quality score in [0,1]: length band + stopword presence -
    punctuation noise.  Weights are fixed, documented constants so the
    score is reproducible (and SQL-expressible for the oracle)."""
    stats = with_text_stats(df, text_col)
    length_term = F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0))
    stop_term = F.least(F.col("stopword_ratio") * 5.0, F.lit(1.0))
    punct_term = F.greatest(
        F.lit(0.0), F.lit(1.0) - F.col("punct_ratio") * 10.0
    )
    return stats.withColumn(
        "quality",
        F.round(0.4 * length_term + 0.3 * stop_term + 0.3 * punct_term, 6),
    )


def language_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-hit counts per language + argmax prediction.

    Argmax ties break FIRST-WINS in LANG_MARKERS insertion order
    (en, fr, de, es — deterministic, but NOT alphabetical: a de/en tie
    predicts 'en'; any differential oracle must mirror this priority,
    not ORDER BY lang code).  'und' when no marker hits at all."""
    toks = tokens(F.col(text_col))
    out = df
    for lang, words in LANG_MARKERS.items():
        out = out.withColumn(f"hits_{lang}", stopword_hits(toks, words))
    best = None
    for lang in LANG_MARKERS:  # first-wins tie-break in insertion order
        cond = F.col(f"hits_{lang}")
        if best is None:
            best = F.struct(cond.alias("hits"), F.lit(lang).alias("lang"))
        else:
            best = F.when(F.col(f"hits_{lang}") > best["hits"], F.struct(
                cond.alias("hits"), F.lit(lang).alias("lang")
            )).otherwise(best)
    return out.withColumn(
        "predicted_lang",
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")),
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Top-k terms per document by tf-idf with LINEAR idf
    (``score = tf * N / df``) — chosen over log-idf deliberately: the
    score is one exact-integer ratio, so it is bit-identical across
    engines (log() last-ulp differences would poison hash comparison).

    Shape: explode -> (doc, term) counts -> term document frequency
    DERIVED FROM the tf aggregate (tf's key set IS the distinct
    (doc, term) pairs, so docfreq = tf.groupBy(term).count()) -> score ->
    windowed top-k with full tie-break (score desc, term asc).  N is a
    broadcast 1-row aggregate, not an eager ``.count()`` — the whole
    thing is one lazy plan, no driver-blocking job at build time.  The
    two tf consumers share an identical subtree; at cluster scale
    persist tf explicitly (narrow (id, term, n) rows) if the optimizer
    does not reuse the exchange.
    """
    from pyspark.sql import Window

    # explode_outer: plain explode triggers InferFiltersFromGenerate,
    # whose size()>0 predicate re-runs the tokenizer inside a pushed-down
    # filter (2x the parse).  A null term from outer can't survive the
    # tf-docfreq equi-join, so the output is identical.
    toks = df.select(
        F.col(id_col), F.explode_outer(tokens(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    docfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.count_distinct(F.col(id_col)).alias("__n"))
    scored = (
        tf.join(docfreq, "term")
        .join(F.broadcast(n_docs))
        .withColumn("tfidf", F.round(F.col("tf") * F.col("__n") / F.col("df"), 6))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tfidf", "rank")
    )


def with_repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition quality signals, computed ROW-LOCALLY
    (zero shuffle — the pass is embarrassingly parallel at any corpus
    size):

    - ``dup_token_frac``  — fraction of tokens that are repeats of an
      earlier token (1 - distinct/total); high values flag boilerplate.
    - ``top_token_frac``  — frequency of the most common token / total.
    - ``top_bigram_frac`` — frequency of the most common word bigram /
      total bigrams (0.0 when the doc has < 2 tokens).

    The integer counts (n, distinct, mode frequencies) come from ONE
    Arrow-batched Pandas UDF (Counter over ``str.split(' ')`` — the
    identical literal-space tokenizer contract).  This is the sanctioned
    Python path, and here it is load-bearing for PLAN SAFETY, not just
    speed: the previous higher-order-function formulation (sorted run
    lengths over filter/slice/zip_with lambdas) was a ~7KB expression
    tree that Catalyst would textually INLINE into any downstream filter
    on these columns — predicate pushdown substitutes alias definitions,
    and the multi-referenced intermediates expand combinatorially
    (measured: a 5-gate filter over the composed curation pass went to
    276s at sf0.1 vs ~3s for the projection alone).  A PythonUDF output
    is a hard pushdown boundary (ArrowEvalPython cannot be inlined into
    a predicate), so downstream filters stop above it by construction.

    The fractions are derived JVM-side from the exact integer counts
    with the same ``round(x, 6)`` as before, so values stay bit-identical
    to the naive-quadratic DuckDB oracle spec (a genuine two-algorithm
    cross-check of the same contract).
    """
    from collections import Counter

    from pyspark.sql.types import ArrayType, LongType

    @F.pandas_udf(ArrayType(LongType()))
    def _rep_counts(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = t.split(" ") if t is not None else []
            n = len(toks)
            tok_counts = Counter(toks)
            big_counts = Counter(zip(toks, toks[1:])) if n >= 2 else {}
            out.append(
                [
                    n,
                    len(tok_counts),
                    max(tok_counts.values()) if tok_counts else 0,
                    max(big_counts.values()) if big_counts else 0,
                ]
            )
        return pd.Series(out)

    # asNondeterministic (guide §4.4): without it the optimizer pushes a
    # downstream filter on these columns BELOW the Python eval and keeps
    # a second eval above for the projection — curate_corpus' plan showed
    # TWO ArrowEvalPython nodes for this one UDF (every row paid the
    # Counter pass twice).  Marking it non-det also makes the eval node a
    # hard pushdown fence for ALL predicates, which pins curate's
    # quality/language gates ABOVE the signal projections instead of
    # textually inlining their ~7KB HOF expression trees into a
    # scan-level filter (the module-docstring pathology, now closed on
    # the filter side too: quality + language expressions evaluate once
    # per row, not once in the pushed filter plus once for survivors).
    # Trade-off (documented in the guide): no caller may rely on filters
    # pushing below this operator — none does; the callers filter only
    # on the computed signals.
    d = df.withColumn("__rep", _rep_counts.asNondeterministic()(F.col(text_col)))
    n = F.col("__rep")[0]
    distinct = F.col("__rep")[1]
    nb = F.greatest(n - 1, F.lit(0))
    return (
        d.withColumn("n_tokens", n)
        .withColumn("n_distinct_tokens", distinct)
        .withColumn(
            "dup_token_frac",
            F.when(n > 0, F.round(F.lit(1.0) - distinct / n, 6)).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "top_token_frac",
            F.when(n > 0, F.round(F.col("__rep")[2] / n, 6)).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "top_bigram_frac",
            F.when(nb > 0, F.round(F.col("__rep")[3] / nb, 6)).otherwise(F.lit(0.0)),
        )
        .drop("__rep")
    )


# PII patterns: deliberately restricted to syntax that Java regex (Spark)
# and RE2 (DuckDB) interpret identically — no lookaround, no backrefs,
# only \b / \d / literal classes and bounded quantifiers.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\b\d{3}-\d{3}-\d{4}\b"


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Scrub emails / IPv4s / phone numbers from ``text_col`` — the
    standard pre-training privacy pass.  Row-local regex work (zero
    shuffle; regexp_replace is a JVM codegen expression).

    Counts are measured on the ORIGINAL text, each pattern independently
    — nested PII is therefore counted under EVERY matching pattern
    (``user@1.2.3.4`` is n_emails=1 AND n_ipv4=1), while the REDACTION
    applies in a fixed order (email -> ip -> phone) so the same text
    becomes a single ``<EMAIL>`` token.  Counts answer "how much of each
    pattern appeared", not "how many tokens were substituted"; this
    count-on-original contract is what the DuckDB oracle pins.  Appends
    ``n_emails / n_ipv4 / n_phones / text_redacted``.
    """
    t = F.col(text_col)
    redacted = F.regexp_replace(t, PII_EMAIL, "<EMAIL>")
    redacted = F.regexp_replace(redacted, PII_IPV4, "<IP>")
    redacted = F.regexp_replace(redacted, PII_PHONE, "<PHONE>")
    return (
        df.withColumn("n_emails", F.regexp_count(t, F.lit(PII_EMAIL)).cast("long"))
        .withColumn("n_ipv4", F.regexp_count(t, F.lit(PII_IPV4)).cast("long"))
        .withColumn("n_phones", F.regexp_count(t, F.lit(PII_PHONE)).cast("long"))
        .withColumn("text_redacted", redacted)
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprint: md5 of the whitespace-collapsed,
    lowercased text — the canonical exact-dup key after normalization."""
    normalized = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.withColumn("fingerprint", F.md5(normalized))


def bm25_scores(
    df: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 relevance of every document against a FIXED query term list
    (Robertson & Spärck Jones probabilistic retrieval; the scoring
    function behind Lucene/Elasticsearch defaults) — the ranking tier of
    a retrieval/RAG pipeline, next to the ANN tier in simsearch.

    score(d) = sum over query terms t of
        idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    Cross-engine determinism contract (differential-oracle safe):

    - idf is the RATIO variant, ``(N - df + 0.5) / (df + 0.5)`` WITHOUT
      the log — same deliberate trade as ``tfidf_top_terms``' linear idf
      (a transcendental would differ in last ulps across engines; the
      ratio is one IEEE divide of exact integers, bit-identical, and
      preserves the idf ORDERING that log would).
    - the per-term sum runs in FIXED, listed order via one pivoted
      column per term (`+` chains left-to-right in Spark and SQL alike),
      never an engine-ordered SUM() over doubles.
    - tf, dl, df, N are exact integers; avgdl is one IEEE divide.

    Scale shape: tokenize + explode + filter to the query terms (the
    filter drops ~everything BEFORE the shuffle — per-doc state is the
    tiny (doc, term, tf) set), one O(terms) docfreq aggregate broadcast
    back, doc length computed row-locally (no explode), corpus stats as
    a broadcast 1-row frame.  One shuffle of the filtered tf rows; at
    100 TB the flow is scan-local except for that filtered aggregate.
    """
    # ValueError, not assert (python -O strips asserts): an empty term
    # list would silently score every doc 0 instead of failing loudly
    if not terms:
        raise ValueError("bm25_scores needs at least one query term")
    toks = df.select(
        F.col(id_col), F.explode_outer(tokens(F.col(text_col))).alias("term")
    ).filter(F.col("term").isin(terms))
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    docfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    dl = df.select(
        F.col(id_col), F.size(tokens(F.col(text_col))).alias("dl")
    )
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl") / F.count(F.lit(1))).alias("avgdl"),
    )
    scored = (
        tf.join(F.broadcast(docfreq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            F.col("term"),
            (
                ((F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5)))
                * (F.col("tf") * (F.lit(k1) + F.lit(1.0)))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
                )
            ).alias("s"),
        )
    )
    # pivot to one column per term so the final sum is in LISTED order
    per_term = scored.groupBy(id_col).pivot("term", terms).agg(F.max("s"))
    total = None
    for t in terms:
        c = F.coalesce(F.col(f"`{t}`"), F.lit(0.0))
        total = c if total is None else total + c
    return (
        df.select(F.col(id_col))
        .join(per_term, id_col, "left")
        .select(
            F.col(id_col),
            F.round(F.coalesce(total, F.lit(0.0)), 6).alias("bm25"),
        )
    )


def bpe_learn_merges(
    df: DataFrame,
    k: int = 8,
    text_col: str = "text",
    min_pair_count: int = 2,
    return_vocab: bool = False,
):
    """Learn the first ``k`` BPE merge rules over the corpus (Sennrich et
    al. 2016, the tokenizer-training primitive): start from character
    symbols, repeatedly merge the globally most frequent adjacent symbol
    pair.  Returns ``[(step, left, right, merged, pair_count), ...]`` —
    fully deterministic (tie-break: count desc, then (left, right) asc).

    Spark shape (the 100 TB argument): the loop state is the WORD
    VOCABULARY — ``(word, n, syms)``, one row per distinct word with its
    corpus frequency — never the corpus.  The corpus is scanned ONCE to
    build it (token explode -> groupBy word); every merge iteration then
    runs on the vocab table: adjacent pairs via a row-local ``zip_with``
    explode, one O(pairs) aggregate, a distributed TakeOrdered(1) for
    the winning rule, and a row-local fold applying the merge.  Merge
    application is left-to-right non-overlapping by construction of the
    fold: the merged symbol ``left+right`` is strictly longer than
    ``left``, so it can never left-match the same rule again within the
    pass ("aaa" + (a,a) -> [aa, a]).  Stops early when no pair reaches
    ``min_pair_count``.

    The higher-order fold is interpreted Catalyst eval (the known
    pathology from minhash — SURVEY §9); it runs over VOCAB rows, not
    corpus rows, so at web scale (vocab ~1e7, |word| ~ 10) it stays
    billions of times smaller than the corpus scan.  Swap the fold for
    an Arrow kernel if vocab itself becomes huge.

    ``return_vocab=True`` additionally returns the post-merge vocabulary
    frame ``(w, n, syms)`` — each distinct word's final subword
    segmentation, the dictionary :func:`bpe_encode_docs` broadcasts to
    tokenize the corpus without ever running the merge fold over corpus
    rows.
    """
    from pyspark.sql.functions import col, lit

    vocab = (
        df.select(F.explode_outer(tokens(F.col(text_col))).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("syms", F.split("w", ""))
        .transform(materialize)
    )
    rules: list[tuple[int, str, str, str, int]] = []
    for step in range(k):
        pairs = vocab.select(
            "n",
            F.explode(
                F.zip_with(
                    F.slice(col("syms"), F.lit(1), F.size("syms") - 1),
                    F.slice(col("syms"), F.lit(2), F.size("syms") - 1),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p.l", "p.r")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < min_pair_count:
            break
        a, b, cnt = top[0]["l"], top[0]["r"], top[0]["cnt"]
        ab = a + b
        merged = F.aggregate(
            col("syms"),
            F.array().cast("array<string>"),
            lambda acc, s: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, lit(-1)) == lit(a))
                & (s == lit(b)),
                F.concat(
                    F.slice(acc, lit(1), F.size(acc) - 1), F.array(lit(ab))
                ),
            ).otherwise(F.concat(acc, F.array(s))),
        )
        vocab = vocab.withColumn("syms", merged).transform(materialize)
        rules.append((step, a, b, ab, cnt))
    if return_vocab:
        return rules, vocab
    return rules


def bpe_encode_docs(
    df: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize the corpus with a freshly trained BPE model: learn ``k``
    merges (:func:`bpe_learn_merges`), then re-express every document as
    its subword sequence.  Returns ``(id_col, n_words, n_subwords,
    subwords)`` with ``subwords`` space-joined for a stable compare.

    The Spark-first encode: the merge loop's final vocabulary already
    holds each distinct WORD's segmentation, so encoding the corpus is a
    BROADCAST DICTIONARY JOIN (token -> subword array) plus a row-local
    re-assembly — the fold never touches corpus rows.  This is how
    production tokenizers run at scale (dictionary-encode the hot
    vocabulary, compute per-word work once).  Re-assembly keeps token
    order with a ``sort_array`` over (position, subwords) structs —
    no window, no per-doc state.
    """
    rules, vocab = bpe_learn_merges(
        df, k=k, text_col=text_col, return_vocab=True
    )
    seg = vocab.select(F.col("w"), F.col("syms"))
    toks = df.select(
        F.col(id_col),
        F.posexplode_outer(tokens(F.col(text_col))).alias("pos", "w"),
    ).filter(F.length("w") > 0)
    joined = toks.join(F.broadcast(seg), "w")
    encoded = (
        joined.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.flatten(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct(F.col("pos"), F.col("syms")))
                    ),
                    lambda s: s["syms"],
                )
            ).alias("__sub"),
        )
        .select(
            F.col(id_col),
            "n_words",
            F.size("__sub").alias("n_subwords"),
            F.array_join("__sub", " ").alias("subwords"),
        )
    )
    # blank/whitespace-only docs produce no tokens and would vanish from
    # the inner-join aggregate; join them back as empty encodings so the
    # output covers every input row (same every-doc contract as
    # bm25_scores)
    return (
        df.select(F.col(id_col))
        .join(encoded, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_words", F.lit(0).cast("long")).alias("n_words"),
            F.coalesce("n_subwords", F.lit(0)).alias("n_subwords"),
            F.coalesce("subwords", F.lit("")).alias("subwords"),
        )
    )


def binary_auc(
    df: DataFrame, score_col: str, label_col: str
) -> DataFrame:
    """Exact ROC-AUC of a score against a binary {0,1} label via the
    Mann-Whitney rank-sum identity — the metric a corpus pipeline runs to
    answer "does this quality score actually separate good documents from
    bad ones" before using it as a filter threshold.  Ties receive the
    standard average-rank treatment (so a constant score yields exactly
    0.5, and AUC is invariant under any monotone transform of the score).

    Output: ONE row ``(n_pos, n_neg, auc)``.

    Scale design (100 TB): no global sort of rows.  The corpus collapses
    to a count table — ``groupBy(score) -> (n, n_pos)`` — and the rank
    arithmetic runs over DISTINCT score values (model-sized for any
    bounded-precision score: an integer-permille score has <= 1001 rows),
    using doubled ranks so everything before the final division is exact
    int64: a tie group of size c starting after o smaller-scored rows has
    average rank (2o + c + 1)/2, so

        AUC = (sum_groups n_pos_g * (2o_g + c_g + 1) - 2 * R0) / (2 * n_pos * n_neg)

    with R0 = n_pos*(n_pos+1)/2 (the doubled-rank sum minus twice the
    minimal rank mass, over the doubled denominator).  The unpartitioned cumulative window is
    over the distinct-score table only (the engine's red-lined
    unpartitioned-window audit vouches for model-sized frames)."""
    from pyspark.sql import Window

    by_score = df.groupBy(F.col(score_col).alias("__s")).agg(
        F.count(F.lit(1)).cast("long").alias("__c"),
        F.sum(F.col(label_col).cast("long")).alias("__cp"),
    )
    w = (
        Window.orderBy("__s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = by_score.withColumn(
        "__o", F.coalesce(F.sum("__c").over(w), F.lit(0).cast("long"))
    )
    return ranked.agg(
        F.sum("__cp").cast("long").alias("n_pos"),
        (F.sum("__c") - F.sum("__cp")).cast("long").alias("n_neg"),
        F.sum(
            F.col("__cp") * (F.lit(2) * F.col("__o") + F.col("__c") + F.lit(1))
        ).alias("__s2"),
    ).select(
        "n_pos",
        "n_neg",
        F.round(
            # NULL (not a DIVIDE_BY_ZERO crash under the ANSI default)
            # when only one class is present — AUC is undefined there
            F.when(
                (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
                (F.col("__s2") - F.col("n_pos") * (F.col("n_pos") + F.lit(1)))
                / (F.lit(2.0) * F.col("n_pos") * F.col("n_neg")),
            ),
            6,
        ).alias("auc"),
    )
