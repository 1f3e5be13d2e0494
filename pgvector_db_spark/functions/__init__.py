from pgvector_db_spark.functions.vector import (
    cosine_distance,
    cosine_similarity,
    dot_product,
    inner_product_distance,
    l1_distance,
    l2_distance,
    l2_norm,
    l2_normalize,
    to_vector,
    vector_dims,
)

__all__ = [
    "cosine_distance",
    "cosine_similarity",
    "dot_product",
    "inner_product_distance",
    "l1_distance",
    "l2_distance",
    "l2_norm",
    "l2_normalize",
    "to_vector",
    "vector_dims",
]
