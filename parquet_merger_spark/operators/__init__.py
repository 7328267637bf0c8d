from parquet_merger_spark.operators.asof import asof_join
from parquet_merger_spark.operators.bucketing import bucketed_join, write_bucketed
from parquet_merger_spark.operators.rangejoin import bucketed_range_join
from parquet_merger_spark.operators.simsearch import pq_encode, pq_topk, train_pq_codebooks
from parquet_merger_spark.operators.dedup import (
    dup_clusters,
    exact_dedup,
    minhash_lsh_pairs,
    near_dedup_survivors,
    ngram_contamination,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
)
from parquet_merger_spark.operators.curation import curate_corpus
from parquet_merger_spark.operators.incremental import upsert_by_key
from parquet_merger_spark.operators.export import drop_internal_columns, export_csv
from parquet_merger_spark.operators.merge import (
    BatchResult,
    MergeProgress,
    merge_batches,
    merge_dataframes,
    merged_df,
    merged_df_ordered,
    write_parquet,
)
from parquet_merger_spark.operators.chunking import chunk_documents, pack_sequences
from parquet_merger_spark.operators.multimodal import (
    attach_binary_payload,
    extract_payload_meta,
    extract_payload_meta_expr,
    payload_byte_histogram,
)
from parquet_merger_spark.operators.ranking import (
    salted_join,
    topk_per_group,
    topk_per_group_salted,
)
from parquet_merger_spark.operators.sampling import (
    deterministic_sample,
    hash_gate,
    portable_hash_gate,
)
from parquet_merger_spark.operators.simsearch import (
    brute_force_topk,
    build_ivf_centroids,
    cosine_near_dup_pairs,
    ivf_topk,
    knn_graph,
)
from parquet_merger_spark.operators.textstats import (
    fingerprint,
    language_scores,
    quality_score,
    with_text_stats,
)

__all__ = [
    "asof_join",
    "attach_binary_payload",
    "BatchResult",
    "brute_force_topk",
    "bucketed_join",
    "bucketed_range_join",
    "build_ivf_centroids",
    "chunk_documents",
    "pack_sequences",
    "payload_byte_histogram",
    "salted_join",
    "topk_per_group",
    "topk_per_group_salted",
    "cosine_near_dup_pairs",
    "deterministic_sample",
    "drop_internal_columns",
    "dup_clusters",
    "exact_dedup",
    "export_csv",
    "extract_payload_meta",
    "extract_payload_meta_expr",
    "fingerprint",
    "hash_gate",
    "ivf_topk",
    "language_scores",
    "merge_batches",
    "merge_dataframes",
    "merged_df",
    "merged_df_ordered",
    "minhash_lsh_pairs",
    "near_dedup_survivors",
    "ngram_contamination",
    "ngram_jaccard_pairs",
    "pq_encode",
    "pq_topk",
    "train_pq_codebooks",
    "portable_hash_gate",
    "quality_score",
    "simhash_near_dup_pairs",
    "with_text_stats",
    "write_bucketed",
    "write_parquet",
]
