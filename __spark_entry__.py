"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship exact-kNN query at sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 (registry in
``pgvector_db_spark/queries.py``).
``oracle_sql()`` — matching DuckDB SQL per query (same float64 fold order →
value-hash parity).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pgvector_db_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q.REGISTRY["vs_knn_topk"].spark_fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.all_queries()


def oracle_sql() -> dict[str, str]:
    return _q.all_oracles()
