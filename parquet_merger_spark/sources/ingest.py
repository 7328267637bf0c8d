"""Fault-tolerant text ingestion: parse what parses, quarantine the rest.

At 100 TB there WILL be malformed lines — a truncated upload, a
mixed-schema producer, a stray log line in a JSONL shard.  The two wrong
answers are FAILFAST (one bad byte kills a million-file job) and
DROPMALFORMED (data silently vanishes).  The production pattern is
PERMISSIVE parsing with the raw text of every unparsable record captured
in a corrupt-record column, split into (valid, quarantine) outputs — the
text-source twin of :func:`operators.profile.quarantine`.

Spark detail: a query that touches ONLY the corrupt-record column of a
json/csv source is disallowed (the parser would have nothing to parse),
and filtering on it from the live scan can re-parse per consumer — so
both outputs here are derived from one cached parse (document: at real
scale, write the parsed frame out once and split from that, same shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_CORRUPT = "_corrupt_record"

# every robust read caches one parsed parent (both outputs derive from
# it); the readers return only the children, so the parents are tracked
# here and released by release_ingest_caches() — otherwise a pipeline
# quarantining many shards pins one stale InMemoryRelation per call for
# the session lifetime, evicting useful blocks
_CACHED_PARENTS: list[DataFrame] = []


def release_ingest_caches() -> int:
    """Unpersist every parsed frame cached by the robust readers; returns
    how many were released.  Call after materializing both outputs of a
    read (the split is correct either way — this only frees storage)."""
    n = len(_CACHED_PARENTS)
    while _CACHED_PARENTS:
        try:
            _CACHED_PARENTS.pop().unpersist(blocking=False)
        except Exception:
            pass  # session already stopped: nothing to free
    return n


def _split_corrupt(parsed: DataFrame) -> tuple[DataFrame, DataFrame]:
    parsed = parsed.cache()
    _CACHED_PARENTS.append(parsed)
    valid = parsed.filter(parsed[_CORRUPT].isNull()).drop(_CORRUPT)
    bad = parsed.filter(parsed[_CORRUPT].isNotNull()).select(
        parsed[_CORRUPT].alias("raw_record")
    )
    return valid, bad


def read_jsonl_robust(
    spark: SparkSession, path: str, schema: str
) -> tuple[DataFrame, DataFrame]:
    """JSON-lines read returning ``(valid, quarantine)``.  ``schema`` is
    the DDL of the EXPECTED columns (inference is a full extra pass and
    would widen types to fit the garbage — always pass the contract).
    Valid rows carry the declared columns; quarantine rows carry the raw
    line for repair/inspection."""
    full_schema = f"{schema}, {_CORRUPT} string"
    parsed = spark.read.schema(full_schema).option("mode", "PERMISSIVE").json(path)
    return _split_corrupt(parsed)


def read_csv_robust(
    spark: SparkSession, path: str, schema: str, header: bool = True
) -> tuple[DataFrame, DataFrame]:
    """CSV twin of :func:`read_jsonl_robust`: rows whose fields fail to
    parse under the declared schema land in quarantine with the raw
    line."""
    full_schema = f"{schema}, {_CORRUPT} string"
    parsed = (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("header", str(header).lower())
        .csv(path)
    )
    return _split_corrupt(parsed)
