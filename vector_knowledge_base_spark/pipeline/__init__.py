from vector_knowledge_base_spark.pipeline.chunker import chunk_document, chunk_documents_df
from vector_knowledge_base_spark.pipeline.embed import embed_df, embed_texts

__all__ = ["chunk_document", "chunk_documents_df", "embed_df", "embed_texts"]
