"""Plan-shape tests: the scale contract (SURVEY §4) asserted at the
physical-plan level — pushdown, pruning, broadcast, top-k."""

from __future__ import annotations

from pyspark.sql import functions as F

from pgvector_db_spark.plans import (
    assert_broadcast_join,
    assert_pushed_filters,
    assert_take_ordered,
    physical_plan,
)
from pgvector_db_spark.queries import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


def test_filter_pushdown_to_parquet(tables):
    df = tables["lineitem"].filter(F.col("l_quantity") > 30).select("l_orderkey")
    assert_pushed_filters(df, "GreaterThan(l_quantity")


def test_column_pruning(tables):
    df = tables["lineitem"].select("l_orderkey", "l_quantity")
    plan = physical_plan(df)
    schema_seg = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert "l_orderkey" in schema_seg and "l_quantity" in schema_seg
    assert "l_extendedprice" not in schema_seg, "unused column not pruned"


def test_knn_is_take_ordered(spark):
    df = REGISTRY["vs_knn_topk"].spark_fn(spark, SF_DIR)
    assert_take_ordered(df)


def test_star_join_broadcasts_dimensions(spark):
    df = REGISTRY["rel_revenue_by_nation"].spark_fn(spark, SF_DIR)
    assert_broadcast_join(df, count=3)  # customer, nation, region


def test_query_by_example_broadcasts(spark):
    df = REGISTRY["vs_query_by_example"].spark_fn(spark, SF_DIR)
    assert_broadcast_join(df, count=1)


def test_agg_is_partial_then_final(spark):
    df = REGISTRY["rel_pricing_summary"].spark_fn(spark, SF_DIR)
    plan = physical_plan(df)
    assert plan.count("HashAggregate") >= 2, "no partial aggregation (map-side combine)"


def test_vector_fold_stays_in_codegen(tables):
    """The cosine fold must be a native expression inside WholeStageCodegen
    — no BatchEvalPython / ArrowEvalPython (Python boundary) in the plan."""
    from pgvector_db_spark.functions.vector import cosine_distance

    emb = tables["embeddings"]
    q = emb.limit(1).select(F.col("embedding").alias("qe"))
    df = emb.crossJoin(F.broadcast(q)).select(
        cosine_distance("embedding", "qe").alias("d")
    )
    plan = physical_plan(df)
    # no Python serde boundary: the fold is a JVM expression in the Project
    # (higher-order fns are CodegenFallback, so no WholeStageCodegen span —
    # still vectorized-read + JVM-eval, vs an Arrow/pickle roundtrip)
    assert "EvalPython" not in plan
    assert "aggregate(zip_with" in plan
