from pgvector_db_spark.sources.table import ParquetTable, SchemaValidationError

__all__ = ["ParquetTable", "SchemaValidationError"]
