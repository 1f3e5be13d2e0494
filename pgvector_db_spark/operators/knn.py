"""Exact vector-search operators (the reference's read path).

Reference queries re-expressed Spark-first:
  - top-k: ``ORDER BY embedding <=> q LIMIT k``
    (demo/aws_rds_demo.py:71-77 k=3; demo/aws_rds_similarity_search_demo.py
    :170-180 k=3, :199-203 k=10; README.md:230-241 k=5)
  - query-by-example CTE + cross join
    (demo/similarity_search_demo.py:83-95, README.md:232-241)
  - pairwise average similarity over a self cross-join
    (demo/similarity_search_demo.py:125-130)
  - self-similarity identity (demo/similarity_search_demo.py:136-143)

Scale notes:
  - ``orderBy(dist).limit(k)`` compiles to ``TakeOrderedAndProject``:
    each partition computes a local top-k, the driver merges k*partitions
    rows — no global sort, no full shuffle. This is the right exact-kNN
    plan at any scale; the ANN path (operators/ivf.py) prunes partitions
    before this same kernel runs.
  - The 1-row query-by-example side is always broadcast: a
    BroadcastNestedLoopJoin with a single build row is a map-side operation.
  - The O(n^2) pairwise aggregate is kept for parity with the reference's
    demo; at scale use a sampled estimate (``pairwise_avg_similarity(...,
    sample=...)``) or an LSH similarity join (operators/dedup.py).

All distance math is float64 sequential-fold (functions/vector.py) so the
DuckDB oracle matches bitwise; ORDER BY always tie-breaks on the unique id
so top-k row sets are deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pgvector_db_spark.functions.vector import (
    cosine_distance,
    cosine_similarity,
    inner_product_distance,
    l2_distance,
    vector_literal,
)


def knn(
    df: DataFrame,
    query_vec: list[float] | Column,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    distance: str = "cosine",
    norm_col: str | None = None,
) -> DataFrame:
    """Exact top-k nearest neighbors of ``query_vec``.

    Returns the input columns plus ``distance`` and ``similarity``
    (cosine), ordered nearest-first with ``id_col`` as tie-break.

    ``norm_col`` names a column holding each row's precomputed
    :func:`l2_norm` (a norm-materialized layout, e.g. the IVF index):
    scoring then folds over each vector ONCE (the dot product) instead of
    three times, with bitwise-identical distances. Requires a list query
    (the query norm is the same sequential fold, driver-side).
    """
    if distance not in ("cosine", "l2", "ip"):
        raise ValueError(f"unsupported distance: {distance}")
    q = vector_literal(query_vec) if isinstance(query_vec, list) else query_vec
    if distance != "cosine":
        # pgvector's other ivfflat operator classes: vector_l2_ops (<->)
        # and vector_ip_ops (<#>, negative inner product). similarity is
        # the usual negation so the output schema stays stable.
        from pgvector_db_spark.functions.vector import (
            inner_product_distance,
            l2_distance,
        )

        fn = l2_distance if distance == "l2" else inner_product_distance
        dist = fn(F.col(vec_col), q)
    elif norm_col is not None and isinstance(query_vec, list):
        import math

        from pgvector_db_spark.functions.vector import (
            cosine_distance_precomputed,
        )

        acc = 0.0
        for x in query_vec:  # same sequential fold as l2_norm's aggregate
            acc += float(x) * float(x)
        dist = cosine_distance_precomputed(
            F.col(vec_col), q, F.col(norm_col), F.lit(math.sqrt(acc))
        )
    else:
        dist = cosine_distance(F.col(vec_col), q)
    if isinstance(query_vec, list):
        # dimension guard inside the expression (no extra driver job):
        # zip_with pads the shorter side with nulls, which would silently
        # poison distances — pgvector errors on dim mismatch, so do we
        dist = F.when(
            F.size(F.col(vec_col)) == len(query_vec), dist
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        f"knn: query vector dim {len(query_vec)} != "
                        f"{vec_col} dim "
                    ),
                    F.size(F.col(vec_col)).cast("string"),
                )
            )
        )
    sim = (
        F.lit(1.0) - F.col("distance")
        if distance == "cosine"
        else -F.col("distance")  # ip: back to the raw inner product
    )
    return (
        df.withColumn("distance", dist)
        .withColumn("similarity", sim)
        .orderBy(F.col("distance").asc(), F.col(id_col).asc())
        .limit(k)
    )


def query_by_example(
    df: DataFrame,
    example_id: int,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """The reference's CTE pattern: pick one row's embedding as the query,
    rank every *other* row by similarity to it
    (demo/similarity_search_demo.py:83-95).

    The 1-row example side is broadcast — the join is map-side only.
    """
    example = (
        df.filter(F.col(id_col) == example_id)
        .select(F.col(vec_col).alias("_query_vec"))
        .limit(1)
    )
    joined = df.crossJoin(F.broadcast(example)).filter(F.col(id_col) != example_id)
    dist = cosine_distance(F.col(vec_col), F.col("_query_vec"))
    return (
        joined.withColumn("similarity", F.lit(1.0) - dist)
        .drop("_query_vec")
        .orderBy(F.col("similarity").desc(), F.col(id_col).asc())
        .limit(k)
    )


def knn_batch(
    df: DataFrame,
    queries: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q_id_col: str = "query_id",
    q_vec_col: str = "query_vec",
    metric: str = "cosine",
) -> DataFrame:
    """Top-k neighbors for a BATCH of query vectors in one plan.

    The query side broadcasts (a query batch is small by construction);
    each input partition scores its rows against every query, and the
    ``rank <= k`` predicate compiles to WindowGroupLimit — Spark inserts a
    per-partition partial top-k *before* the shuffle on ``query_id``, so
    the exchanged data is ~``k × partitions × queries`` rows, not
    ``n × queries``. This is the grouped analogue of
    TakeOrderedAndProject, and the right batch-scoring plan at any scale.

    ``metric`` mirrors pgvector's operator classes — ``cosine`` (<=>),
    ``l2`` (<->), ``ip`` (<#>, negative inner product) — so the batch
    kernel serves whichever IVF layout calls it; all three are the same
    float64 sequential fold the single-query kernel uses, so the DuckDB
    oracle matches bitwise.

    Returns (query_id, vec_id, distance, rank), rank 1 = nearest,
    tie-broken by ``id_col``.
    """
    from pyspark.sql.window import Window

    dist_fn = {
        "cosine": cosine_distance,
        "l2": l2_distance,
        "ip": inner_product_distance,
    }.get(metric)
    if dist_fn is None:
        raise ValueError(f"unsupported metric: {metric!r}")
    q = queries.select(F.col(q_id_col), F.col(q_vec_col).alias("_qv"))
    scored = df.crossJoin(F.broadcast(q)).withColumn(
        "distance", dist_fn(F.col(vec_col), F.col("_qv"))
    )
    w = Window.partitionBy(q_id_col).orderBy(
        F.col("distance").asc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("knn_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("knn_rank") <= k)
        .select(q_id_col, id_col, "distance", "knn_rank")
    )


def pairwise_avg_similarity(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample: float | None = None,
    seed: int = 42,
) -> DataFrame:
    """Average pairwise cosine similarity over all distinct-id pairs
    (demo/similarity_search_demo.py:125-130). O(n^2) — pass ``sample`` to
    estimate on a fraction at scale (flagged, not oracle-checked)."""
    if sample is not None:
        df = df.sample(fraction=sample, seed=seed)
    a = df.select(F.col(id_col).alias("_ida"), F.col(vec_col).alias("_va"))
    b = df.select(F.col(id_col).alias("_idb"), F.col(vec_col).alias("_vb"))
    pairs = a.crossJoin(b).filter(F.col("_ida") != F.col("_idb"))
    return pairs.agg(
        F.avg(cosine_similarity(F.col("_va"), F.col("_vb"))).alias("avg_similarity")
    )


def self_similarity_check(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """``1 - (e <=> e)`` should be 1.0 for every row
    (demo/similarity_search_demo.py:136-143). Doubles as a unit test."""
    return df.select(
        F.col(id_col),
        cosine_similarity(F.col(vec_col), F.col(vec_col)).alias("self_similarity"),
    )
