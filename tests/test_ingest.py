"""Fault-tolerant ingestion (sources/ingest.py): PERMISSIVE parse with
quarantine split — the text-source twin of operators.profile.quarantine.

Contract under test: (a) every well-formed record lands on the valid
side with its declared types, (b) every malformed record lands in
quarantine carrying its RAW line (repairable, nothing silently dropped),
(c) valid ∪ quarantine partitions the input exactly.
"""

from __future__ import annotations

import os

from parquet_merger_spark.sources.ingest import read_csv_robust, read_jsonl_robust


def test_jsonl_robust_split(spark, tmp_path):
    p = str(tmp_path / "in.jsonl")
    lines = [
        '{"id": 1, "name": "alpha", "score": 2.5}',
        '{"id": 2, "name": "beta", "score": -1.0}',
        '{"id": 3, "name": "ga',  # truncated upload
        "not json at all",  # stray log line
        '{"id": 4, "name": null, "score": 0.0}',
    ]
    with open(p, "w") as fh:
        fh.write("\n".join(lines) + "\n")

    valid, bad = read_jsonl_robust(spark, p, "id long, name string, score double")
    got = {r["id"]: (r["name"], r["score"]) for r in valid.collect()}
    assert got == {1: ("alpha", 2.5), 2: ("beta", -1.0), 4: (None, 0.0)}
    assert "_corrupt_record" not in valid.columns

    raw = sorted(r["raw_record"] for r in bad.collect())
    assert raw == sorted([lines[2], lines[3]])


def test_jsonl_robust_partitions_input(spark, tmp_path):
    """valid + quarantine = input, no overlap, nothing dropped."""
    p = str(tmp_path / "mixed.jsonl")
    good = [f'{{"id": {i}}}' for i in range(50)]
    junk = [f"garbage-{i}" for i in range(7)]
    with open(p, "w") as fh:
        fh.write("\n".join(good + junk) + "\n")
    valid, bad = read_jsonl_robust(spark, p, "id long")
    assert valid.count() == 50
    assert bad.count() == 7


def test_csv_robust_split(spark, tmp_path):
    p = str(tmp_path / "in.csv")
    rows = [
        "id,name,score",
        "1,alpha,2.5",
        "2,beta,not-a-number",  # type violation → quarantine
        "3,gamma,0.25",
    ]
    with open(p, "w") as fh:
        fh.write("\n".join(rows) + "\n")

    valid, bad = read_csv_robust(spark, p, "id long, name string, score double")
    got = {r["id"]: (r["name"], r["score"]) for r in valid.collect()}
    assert got == {1: ("alpha", 2.5), 3: ("gamma", 0.25)}

    raw = [r["raw_record"] for r in bad.collect()]
    assert raw == ["2,beta,not-a-number"]


def test_ingest_quarantine_query_matches_oracle_shape(spark):
    """The driver-contract query: corrupted keys are exactly doc_id%17==0."""
    from parquet_merger_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    valid = QUERIES["ingest_quarantine"](spark, sf)
    import duckdb

    doc = os.path.join(sf, "documents.parquet")
    exp = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{doc}') WHERE doc_id % 17 <> 0"
    ).fetchone()[0]
    assert valid.count() == exp
    assert set(valid.columns) == {"doc_id", "lang", "n_chars"}
    assert valid.filter(valid.doc_id % 17 == 0).count() == 0
