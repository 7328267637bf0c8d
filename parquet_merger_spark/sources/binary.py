"""Binary-file source: ingest raw media files (images/audio/any blob)
as DataFrame rows — the missing first hop before the multimodal
operators (:mod:`operators.multimodal`), which all assume a ``payload``
binary column already exists in a table.

Spark's built-in ``binaryFile`` format reads each file as one row
``(path, modificationTime, length, content: binary)`` with the scan
parallelized across files — no driver-side reading, no Python in the
read path.  Partition sizing caveat for 100 TB of media: one row per
file means row size = file size; keep
``spark.sql.files.maxPartitionBytes`` >= the largest expected file and
let Spark pack small files per task (it bin-packs by byte size).  For
billions of tiny files, the real-world move is packing media into
parquet/tar shards first — which is exactly what writing this frame
back out as parquet does (the test proves the round trip).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    id_from_stem: bool = True,
) -> DataFrame:
    """Read a directory of raw files as ``(doc_id, path, n_bytes,
    payload)`` rows.  ``glob`` filters by pathname pattern (e.g.
    ``*.png``); with ``id_from_stem`` the numeric file stem becomes
    ``doc_id`` (null if non-numeric) so payloads join back to metadata
    tables by id."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    out = df.select(
        F.col("path"),
        F.col("length").alias("n_bytes"),
        F.col("content").alias("payload"),
    )
    if id_from_stem:
        # anchored to the stem START (after the last '/'): 'img42.png'
        # must yield null per the contract above, not a spurious 42
        # that would join the payload to the wrong metadata row
        stem = F.regexp_extract(F.col("path"), r"(?:^|/)([0-9]+)\.[^./]+$", 1)
        out = out.withColumn(
            "doc_id",
            F.when(stem != "", stem.cast("long")).otherwise(F.lit(None)),
        ).select("doc_id", "path", "n_bytes", "payload")
    return out
