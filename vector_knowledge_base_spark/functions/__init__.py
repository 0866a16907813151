from vector_knowledge_base_spark.functions.vector import (
    cosine_similarity,
    dot_product,
    l2_norm,
    l2_normalize,
)
from vector_knowledge_base_spark.functions.filters import filter_dsl_to_column

__all__ = [
    "cosine_similarity",
    "dot_product",
    "l2_norm",
    "l2_normalize",
    "filter_dsl_to_column",
]
