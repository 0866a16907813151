"""spark-knowledge-engine: PySpark-native analytics engine with the query
and data-processing capabilities of i3T4AN/Vector-Knowledge-Base.

The reference system (/root/reference) is a FastAPI + Qdrant semantic
document-search stack; this package re-expresses its entire operator
surface (SURVEY.md §2) as idiomatic Spark DataFrame / SQL plans plus the
LLM-data-pipeline operators (dedup, similarity search, multimodal columns,
text analysis) required at 100 TB scale.
"""

__version__ = "0.1.0"

from vector_knowledge_base_spark.session import get_spark  # noqa: F401
