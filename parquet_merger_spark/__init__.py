"""parquet_merger_spark — a PySpark-native analytics engine with the
capabilities of the reference parquet-merger (shanytc/parquet-merger),
re-expressed Spark-first.

The reference (``/root/reference/src/main.rs``) is a single-binary Parquet
batch-merge tool: discover parquet files, group them into batches, merge each
batch into one output file with schema-intersection semantics, optionally
export CSV.  This package reproduces those semantics on Spark DataFrames
(declarative plans -> Catalyst/Tungsten execution) and extends them with the
LLM-data-pipeline operators a 100 TB training-data pipeline needs: dedup
(exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding-cosine),
similarity search, text analysis, multimodal binary columns, and structured
streaming over event tables.

Layout:
  sources/    file discovery + schema probing + readers (SURVEY §2.1)
  plans/      schema compatibility/intersection + batch planning (§1.4, §2.2, A2)
  operators/  merge/union/export + extension operators (§2.4, §7)
  functions/  scalar/naming functions (§2.8)
  streaming/  structured-streaming operators (§2.9 extension)
"""

__version__ = "0.1.0"
