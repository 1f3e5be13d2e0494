from pgvector_db_spark.operators.dedup import (
    connected_components,
    embedding_top_pairs,
    exact_dedup,
    minhash_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from pgvector_db_spark.operators.ivf import IVFIndex
from pgvector_db_spark.operators.joins import asof_join, range_join
from pgvector_db_spark.operators.knn import (
    knn,
    knn_batch,
    pairwise_avg_similarity,
    query_by_example,
    self_similarity_check,
)
from pgvector_db_spark.operators.lsh_ann import (
    build_lsh_layout,
    lsh_ann_knn,
    search_lsh_layout,
    similarity_join,
)
from pgvector_db_spark.operators.rollup import time_bucket, time_rollup

__all__ = [
    "IVFIndex",
    "asof_join",
    "build_lsh_layout",
    "connected_components",
    "embedding_top_pairs",
    "exact_dedup",
    "knn",
    "knn_batch",
    "lsh_ann_knn",
    "minhash_dedup",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "pairwise_avg_similarity",
    "query_by_example",
    "range_join",
    "search_lsh_layout",
    "self_similarity_check",
    "simhash_pairs",
    "similarity_join",
    "time_bucket",
    "time_rollup",
]
