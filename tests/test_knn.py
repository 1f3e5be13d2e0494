"""kNN operator tests (reference read path, SURVEY §3.1)."""

from __future__ import annotations

from pgvector_db_spark.operators.knn import (
    knn,
    pairwise_avg_similarity,
    query_by_example,
    self_similarity_check,
)


def test_knn_returns_k_ordered(tables):
    emb = tables["embeddings"]
    q = emb.filter("vec_id = 0").collect()[0]["embedding"]
    res = knn(emb, list(q), k=5).collect()
    assert len(res) == 5
    assert res[0]["vec_id"] == 0  # itself, distance 0
    assert abs(res[0]["distance"]) < 1e-12
    dists = [r["distance"] for r in res]
    assert dists == sorted(dists)


def test_knn_plan_uses_take_ordered(tables):
    """The exact-kNN physical plan must be TakeOrderedAndProject (per-
    partition top-k + driver merge), not a global sort."""
    emb = tables["embeddings"]
    q = emb.filter("vec_id = 0").collect()[0]["embedding"]
    plan = knn(emb, list(q), k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_query_by_example_excludes_self(tables):
    res = query_by_example(tables["embeddings"], example_id=42, k=5).collect()
    assert len(res) == 5
    assert all(r["vec_id"] != 42 for r in res)
    sims = [r["similarity"] for r in res]
    assert sims == sorted(sims, reverse=True)


def test_pairwise_avg_similarity_bounds(tables):
    val = pairwise_avg_similarity(tables["embeddings"].limit(50)).collect()[0][
        "avg_similarity"
    ]
    assert -1.0 <= val <= 1.0


def test_self_similarity_check(tables):
    rows = self_similarity_check(tables["embeddings"].limit(20)).collect()
    assert all(abs(r["self_similarity"] - 1.0) < 1e-9 for r in rows)
