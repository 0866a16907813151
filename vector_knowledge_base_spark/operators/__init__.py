from vector_knowledge_base_spark.operators.knn import batch_knn, cosine_topk

__all__ = ["batch_knn", "cosine_topk"]
