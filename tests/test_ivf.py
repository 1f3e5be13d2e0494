"""IVF index tests: layout, partition pruning, recall semantics
(pgvector ivfflat parity — reference README.md:185, nprobe tradeoff)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pgvector_db_spark.operators.ivf import IVFIndex
from pgvector_db_spark.operators.knn import knn

LISTS = 8


@pytest.fixture(scope="module")
def index(spark, tables, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivf") / "emb_idx")
    return IVFIndex.build(tables["embeddings"], path, lists=LISTS)


def test_build_layout(index, spark, tables):
    data = spark.read.parquet(index.data_path)
    assert data.count() == tables["embeddings"].count()
    lists = data.select("list_id").distinct().count()
    assert 1 < lists <= LISTS
    cents = spark.read.parquet(index.centroids_path)
    assert cents.count() == LISTS
    assert len(cents.first()["centroid"]) == 64


def test_search_returns_k(index, tables):
    q = tables["embeddings"].filter("vec_id = 0").first()["embedding"]
    res = index.search(list(q), k=5, nprobe=2).collect()
    assert len(res) == 5
    dists = [r["distance"] for r in res]
    assert dists == sorted(dists)


def test_search_prunes_partitions(index, tables):
    """nprobe=1 must plan a partition-pruned scan (the whole point of the
    index: unprobed lists are never read)."""
    q = tables["embeddings"].filter("vec_id = 0").first()["embedding"]
    df = index.search(list(q), k=3, nprobe=1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    part_filters = plan.split("PartitionFilters")[1].split("]")[0]
    assert "list_id" in part_filters


def test_full_probe_equals_exact(index, tables):
    """nprobe = lists ⇒ identical row set to the exact kNN path."""
    emb = tables["embeddings"]
    q = list(emb.filter("vec_id = 123").first()["embedding"])
    exact = [r["vec_id"] for r in knn(emb, q, 10).collect()]
    full = [r["vec_id"] for r in index.search(q, 10, nprobe=LISTS).collect()]
    assert exact == full


def test_recall_monotone_in_nprobe(index, tables):
    q = list(tables["embeddings"].filter("vec_id = 7").first()["embedding"])
    r1 = index.recall_at_k(tables["embeddings"], q, k=10, nprobe=1)
    r4 = index.recall_at_k(tables["embeddings"], q, k=10, nprobe=4)
    r8 = index.recall_at_k(tables["embeddings"], q, k=10, nprobe=LISTS)
    assert r8 == 1.0
    assert r1 <= r4 <= r8
    assert r4 >= 0.5  # probing half the lists should recover most neighbors
