"""Inverted-index sparse-vector search — the SPLADE/sparsevec serving
layout (r10 VERDICT item #5).

The scan path (queries.py ``vs_sparse_*_topk``) scores EVERY row's
sparse dot against the query: O(corpus) work per query, the one
remaining full-corpus ANN scan in the registry. But a sparse dot is
nonzero only where the two index sets OVERLAP — so the candidate set of
any query is exactly the union of the posting lists of its nonzero
indices, the same observation behind every sparse-retrieval engine
(SPLADE serving, Lucene WAND, pgvector sparsevec users pairing the type
with GIN-style inverted structures). This module persists that layout:

    <path>/vectors/            (id, carry..., si array<int>,
                                sv array<double>) — the eps-pruned rows,
                               the rerank side (read via candidate
                               semi-join only)
    <path>/postings/bucket=N/  (term int, vec_id) — one row per nonzero
                               entry, partitioned by bucket =
                               term % num_buckets
    <path>/META.json           {num_buckets, eps, n_rows, dims_seen}
                               committed by atomic rename

Terms are the 1-based vector positions (integers), so bucketing is
``term % num_buckets`` — the driver computes a query's probe-bucket set
with modular arithmetic, no hash parity concerns, and the postings scan
prunes to |{i % B : i in qi}| partitions (PartitionFilters at the scan).

Search = candidate generation + exact rerank, NEVER scoring-by-postings:
the determinism contract (functions/sparse.py) pins every distance to a
SEQUENTIAL float64 fold over the row's entries in index order, and a
groupBy-SUM of per-term partial products would be partition-order float
addition. Candidates (distinct vec_ids sharing >= 1 retained index with
the query) semi-join into vectors/, and the candidate rows are scored
with the IDENTICAL fold expression the scan path uses — so index and
scan results are bitwise equal whenever the top-k is reachable (see
below), which the registry canary asserts in-query.

Losslessness contract (cosine): a row OUTSIDE the candidate set has
zero overlap, hence dot = 0 and distance exactly 1.0 — the index path
returns the true top-k iff at least k candidates score < 1.0. For ip
the analogue is k candidates with dot > 0. A pathological query whose
overlap support is thinner than k would surface as a canary failure
(loud), never a silently-wrong row.

At 100 TB: per-query cost is |postings of the query's nnz terms| for
candidates plus |candidates| fold evaluations — corpus size enters only
through posting-list lengths, exactly like the BM25 index
(operators/text_search.py) whose layout discipline this reuses. The
build is one corpus pass (explode + partitioned write). No Python UDF
anywhere; the query literal broadcasts into the scan.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgvector_db_spark.functions.sparse import (
    sparse_cosine_distance,
    sparse_dot,
    sparse_indices,
    sparse_values,
)


class SparseIndex:
    """Build-once inverted index over sparse-vector nonzero positions."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path.rstrip("/")

    # -- layout ---------------------------------------------------------------

    def _meta_path(self) -> str:
        return os.path.join(self.path, "META.json")

    def meta(self) -> dict:
        with open(self._meta_path()) as f:
            return json.load(f)

    # -- build ----------------------------------------------------------------

    @classmethod
    def build(
        cls,
        df: DataFrame,
        path: str,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        eps: float = 0.1,
        num_buckets: int = 16,
        carry_cols: tuple[str, ...] = (),
    ) -> "SparseIndex":
        """One corpus pass: eps-prune to sparse form, persist the rows
        (rerank side) and the exploded postings (candidate side,
        partitioned by ``term % num_buckets``). ``carry_cols`` ride
        along in vectors/ so search results need no join back to the
        source table."""
        spark = df.sparkSession
        os.makedirs(path, exist_ok=True)
        se = df.select(
            F.col(id_col),
            *[F.col(c) for c in carry_cols],
            sparse_indices(F.col(vec_col), eps).alias("si"),
            sparse_values(F.col(vec_col), eps).alias("sv"),
        )
        se.write.mode("overwrite").parquet(os.path.join(path, "vectors"))
        vectors = spark.read.parquet(os.path.join(path, "vectors"))
        postings = vectors.select(
            F.col(id_col), F.explode("si").alias("term")
        ).withColumn(
            "bucket", F.pmod(F.col("term"), F.lit(num_buckets))
        )
        postings.write.mode("overwrite").partitionBy("bucket").parquet(
            os.path.join(path, "postings")
        )
        meta = {
            "num_buckets": int(num_buckets),
            "eps": float(eps),
            "id_col": id_col,
            "carry_cols": list(carry_cols),
            "n_rows": vectors.count(),
        }
        tmp = os.path.join(path, "META.json.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(path, "META.json"))
        return cls(spark, path)

    # -- read sides -----------------------------------------------------------

    def vectors(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.path, "vectors"))

    def postings(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.path, "postings"))

    # -- search ---------------------------------------------------------------

    def candidates(self, q_indices: list[int]) -> DataFrame:
        """Distinct ids sharing >= 1 retained index with the query: the
        probe reads ONLY the buckets the query's terms land in
        (PartitionFilters) and within them only matching terms
        (PushedFilters)."""
        meta = self.meta()
        b = int(meta["num_buckets"])
        probe = sorted({int(i) % b for i in q_indices})
        terms = [int(i) for i in q_indices]
        return (
            self.postings()
            .filter(F.col("bucket").isin(probe))
            .filter(F.col("term").isin(terms))
            .select(meta["id_col"])
            .distinct()
        )

    def search(
        self,
        q_indices: list[int],
        q_values: list[float],
        k: int = 10,
        metric: str = "cosine",
    ) -> DataFrame:
        """Exact top-k of the candidate set under the pinned fold —
        bitwise equal to the full scan whenever k candidates have
        nonzero overlap (the losslessness contract above). Returns
        ``(id, carry..., nnz, distance)``, ties broken by id."""
        if metric not in ("cosine", "ip"):
            raise ValueError(f"unsupported sparse index metric: {metric}")
        if len(q_indices) != len(q_values):
            raise ValueError("q_indices and q_values length mismatch")
        meta = self.meta()
        id_col = meta["id_col"]
        cand = self.candidates(q_indices)
        rows = self.vectors().join(cand, id_col, "left_semi")
        qi = F.array(*[F.lit(int(i)) for i in q_indices])
        qv = F.array(*[F.lit(float(v)) for v in q_values])
        scored = rows.withColumn("_qi", qi).withColumn("_qv", qv)
        if metric == "cosine":
            dist = sparse_cosine_distance("si", "sv", "_qi", "_qv")
        else:
            dist = F.lit(0.0) - sparse_dot("si", "sv", "_qi", "_qv")
        return (
            scored.select(
                F.col(id_col),
                *[F.col(c) for c in meta["carry_cols"]],
                F.size("si").cast("int").alias("nnz"),
                dist.alias("distance"),
            )
            .orderBy(F.col("distance").asc(), F.col(id_col).asc())
            .limit(k)
        )
