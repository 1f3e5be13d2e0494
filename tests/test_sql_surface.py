"""SQL-surface tests: the pgvector-style query experience through
spark.sql with registered vector functions (functions/sql_registry)."""

from __future__ import annotations

import pytest


@pytest.fixture(autouse=True)
def _registered(tables):
    """load_tables registers views + SQL functions (session-cached)."""


def test_knn_in_plain_sql(spark):
    # Spark SQL UDFs can't appear directly under Sort (UNSUPPORTED_SQL_UDF_USAGE),
    # so project the distance first, then order by the column — same plan shape.
    rows = spark.sql(
        """
        WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        scored AS (
          SELECT vec_id, cosine_distance(embedding, qe) AS dist
          FROM embeddings, q
        )
        SELECT vec_id, 1 - dist AS similarity
        FROM scored ORDER BY dist ASC, vec_id ASC LIMIT 3
        """
    ).collect()
    assert len(rows) == 3
    assert rows[0]["vec_id"] == 0
    assert abs(rows[0]["similarity"] - 1.0) < 1e-12


def test_to_vector_and_dims_sql(spark):
    row = spark.sql(
        "SELECT vector_dims(to_vector('[1.0, 2.0, 3.0]')) AS d, "
        "vector_norm(to_vector('[3.0, 4.0]')) AS n"
    ).first()
    assert row["d"] == 3
    assert row["n"] == 5.0


def test_distance_functions_sql(spark):
    row = spark.sql(
        """
        SELECT l2_distance(to_vector('[0.0, 0.0]'), to_vector('[3.0, 4.0]')) AS l2,
               l1_distance(to_vector('[0.0, 0.0]'), to_vector('[3.0, 4.0]')) AS l1,
               inner_product_distance(to_vector('[1.0, 2.0]'), to_vector('[3.0, 4.0]')) AS ip,
               dot_product(to_vector('[1.0, 2.0]'), to_vector('[3.0, 4.0]')) AS dot
        """
    ).first()
    assert (row["l2"], row["l1"], row["ip"], row["dot"]) == (5.0, 7.0, -11.0, 11.0)


def test_l2_normalize_sql(spark):
    row = spark.sql(
        "SELECT vector_norm(CAST(l2_normalize(to_vector('[3.0, 4.0]')) AS ARRAY<FLOAT>)) AS n"
    ).first()
    assert abs(row["n"] - 1.0) < 1e-6


def test_sql_function_no_python_boundary(spark):
    df = spark.sql(
        "SELECT cosine_distance(embedding, embedding) AS d FROM embeddings"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_table_cache_returns_same_objects(spark):
    from pgvector_db_spark.catalog import load_tables

    a = load_tables(spark, "/root/testdata/sf0.001")
    b = load_tables(spark, "/root/testdata/sf0.001")
    assert a is b


def test_parameterized_sql(spark):
    """Tier B parameterized predicates (reference uses psycopg2 %s params;
    Spark >= 3.4 takes named args in spark.sql)."""
    rows = spark.sql(
        "SELECT doc_id FROM documents WHERE length(text) >= :minlen "
        "ORDER BY doc_id LIMIT :k",
        args={"minlen": 50, "k": 5},
    ).collect()
    assert len(rows) == 5


def test_sparse_functions_sql(spark):
    """sparsevec surface callable from plain SQL; eps=0 sparse dot equals
    the dense dot on the same vectors."""
    from pgvector_db_spark.functions.sql_registry import register_sql_functions

    register_sql_functions(spark)
    row = spark.sql(
        """
        WITH v AS (SELECT array(0.0F, 2.0F, 0.0F, 3.0F) AS a,
                          array(1.0F, 2.0F, 0.0F, 0.0F) AS b)
        SELECT sparse_indices(a, CAST(0.0 AS DOUBLE)) AS ai,
               sparse_dot(sparse_indices(a, CAST(0.0 AS DOUBLE)),
                          sparse_values(a, CAST(0.0 AS DOUBLE)),
                          sparse_indices(b, CAST(0.0 AS DOUBLE)),
                          sparse_values(b, CAST(0.0 AS DOUBLE))) AS sd,
               dot_product(a, b) AS dd,
               sparse_cosine_distance(
                          sparse_indices(a, CAST(0.0 AS DOUBLE)),
                          sparse_values(a, CAST(0.0 AS DOUBLE)),
                          sparse_indices(a, CAST(0.0 AS DOUBLE)),
                          sparse_values(a, CAST(0.0 AS DOUBLE))) AS self_d
        FROM v
        """
    ).first()
    assert list(row["ai"]) == [2, 4]
    assert row["sd"] == row["dd"] == 4.0
    assert abs(row["self_d"]) < 1e-12


def test_binary_quantize_strict_positive_and_jaccard_nan(spark):
    """pgvector parity: binary_quantize sets a bit only for x > 0 (an
    exact 0.0 component is a 0-bit), and jaccard_distance of two
    all-zero codes is NaN, not NULL (r5 ADVICE)."""
    import math

    from pgvector_db_spark.functions.sql_registry import (
        register_sql_functions,
    )

    register_sql_functions(spark)
    row = spark.sql(
        """
        SELECT binary_quantize(array(CAST(0.0 AS FLOAT), CAST(-1.0 AS FLOAT),
                                     CAST(2.0 AS FLOAT))) AS code,
               jaccard_distance(array(0, 0, 0), array(0, 0, 0)) AS jd_zero,
               jaccard_distance(array(1, 0, 1), array(1, 1, 0)) AS jd
        """
    ).first()
    assert row["code"] == [0, 0, 1]
    assert math.isnan(row["jd_zero"])
    assert abs(row["jd"] - (1.0 - 1.0 / 3.0)) < 1e-15
