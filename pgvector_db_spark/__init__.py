"""pgvector_db_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference `deburky/pgvector_db` repo
(PostgreSQL 17 + pgvector client pipeline), re-expressed Spark-first.

Layout:
    session    — SparkSession factory tuned for local[N] and cluster use
    catalog    — TESTDATA table registry (parquet datasets as temp views)
    functions  — native Column expressions: vector math, text analysis
    operators  — kNN / IVF index / dedup / similarity-join / multimodal
    sources    — ingest (validated append, staged copy) and export paths
    streaming  — Structured Streaming ingest + windowed aggregation

Everything is DataFrame/Catalyst-first; Python UDFs only where built-ins
cannot express the semantics (model inference), always Arrow-batched.
"""

from pgvector_db_spark.session import get_spark
from pgvector_db_spark.catalog import TABLES, load_tables
from pgvector_db_spark.vector_table import VectorTable

__all__ = ["get_spark", "load_tables", "TABLES", "VectorTable"]
__version__ = "0.1.0"
