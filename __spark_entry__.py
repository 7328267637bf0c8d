"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in :mod:`parquet_merger_spark.queries`; keys without
an oracle entry (minhash/simhash/IVF/sink round-trip) are deterministic
but not SQL-expressible and get the rows-only check.
"""

from __future__ import annotations

import json
import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)

from parquet_merger_spark.queries import ORACLE_SQL, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    return QUERIES["pricing_summary"](spark, "/root/testdata/sf0.001")


def _driver_green_keys(root: str | None = None) -> set[str]:
    """Keys with a GREEN driver CORRECTNESS row in ANY round artifact.

    Green = the hard signal the judge accepts: a value-hash match (or, for
    rows-only keys, a clean row-count match).  A key whose only driver rows
    are red or errored must NOT count as covered — otherwise a fixed query
    can never earn a fresh driver row (the r05 verdict's `map_functions` /
    `merge_files_roundtrip` trap).

    Folds the per-round ``CORRECTNESS_r{N}.json`` files directly (latest
    round wins per key) instead of trusting ``CORRECTNESS_cum.json``: the
    cum artifact went one round stale twice (r04, r05 verdicts) and a
    stale input here silently repeats the previous round's sample.  The
    cum file remains the committed audit artifact (``bench.py`` rebuilds
    it); the rotation no longer depends on anyone remembering to.
    """
    import glob
    import re

    rounds: list[tuple[int, str]] = []
    for path in glob.glob(os.path.join(root or _HERE, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if m:
            rounds.append((int(m.group(1)), path))
    latest: dict[str, dict] = {}
    for _, path in sorted(rounds):
        try:
            with open(path) as fh:
                latest.update(json.load(fh))
        except Exception:
            continue
    return {
        key
        for key, row in latest.items()
        if isinstance(row, dict)
        and (
            # oracle keys are green ONLY on a value-hash match: a row
            # with rows_match=True / hash_match=False is a VALUE
            # regression and must rotate back to the sample front (the
            # old rows_match fallback classified exactly those rows
            # green — a real rows-only driver row has rows_match=None
            # and err='no_oracle', so the fallback never matched one)
            row.get("hash_match")
            or row.get("err") == "no_oracle"
        )
    }


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions).

    Ordered so the driver's per-round CORRECTNESS sample (the first 50
    entries, in dict order) rotates through keys that do not yet have a
    driver-GREEN row: oracle keys whose cumulative driver row is missing,
    red, or errored come first, then — r07 verdict ask #2, so driver
    coverage becomes literal 297/297 — rows-only keys never sampled (their
    driver row is the weaker rows-only check, recorded as err=no_oracle),
    then the already-green tiers.  Within each tier the original
    registration order is kept, so the rotation is deterministic and
    self-advancing as the cumulative artifact grows.
    """
    green = _driver_green_keys()
    fresh = {k: v for k, v in QUERIES.items() if k in ORACLE_SQL and k not in green}
    fresh_rows_only = {
        k: v for k, v in QUERIES.items() if k not in ORACLE_SQL and k not in green
    }
    seen = {k: v for k, v in QUERIES.items() if k in ORACLE_SQL and k in green}
    seen_rows_only = {
        k: v for k, v in QUERIES.items() if k not in ORACLE_SQL and k in green
    }
    return {**fresh, **fresh_rows_only, **seen, **seen_rows_only}


def oracle_sql() -> dict[str, str]:
    """DuckDB-dialect oracle for each SQL-expressible query."""
    return dict(ORACLE_SQL)
