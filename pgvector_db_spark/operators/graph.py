"""Iterative graph algorithms as DataFrame loops (Pregel-on-DataFrames).

The reference has no graph surface; this extends the engine the same way
``ds_cluster_dedup`` (label propagation) does — PageRank is the standard
"importance over a link graph" signal a corpus-curation pipeline uses to
weight web documents (the original use case of the algorithm).

Scale design (100 TB of edges):
- one shuffle per iteration (the ``groupBy(dst)`` contribution sum);
  the rank⋈edge join hashes on ``src``, so pre-partitioning the edge
  table by ``src`` (bucketed layout, `sources/bucketed.py`) removes the
  edge-side exchange and only rank rows (2 columns) ever move;
- contributions are quantized to an integer grid BEFORE the sum, so the
  aggregation is an exact, order-independent BIGINT sum — map-side
  partial aggregation applies and the result is bitwise reproducible
  regardless of partitioning (the property the DuckDB oracle relies on);
- ``localCheckpoint`` per iteration cuts the growing lineage exactly as
  the label-propagation loop does (queries.py ds_cluster_dedup).

Determinism: every per-row step is plain double arithmetic (rank/outdeg,
damping multiply, teleport add) — identical on any engine; the only
multi-row reduction is the BIGINT sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GRID = 1e12  # contribution quantum: floor(contrib * GRID + 0.5) as BIGINT


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list.

    ``edges`` must have ``src`` / ``dst`` string columns and cover every
    node as a source (callers with possibly-dangling nodes should add
    reverse edges or self-loops first — the bipartite both-ways
    construction in ``ds_pagerank_partsupp`` guarantees it).

    Returns ``(node, rank)`` with ``rank`` as DOUBLE. Ranks are the
    exact 3-iteration power-method values on the teleporting random
    walk, not a converged fixpoint — fixed iteration count keeps the
    result oracle-checkable and the cost bounded.
    """
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    # n is one scalar — the only driver-side value in the loop
    n = nodes.count()
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    teleport = (1.0 - damping) / n
    for _ in range(iterations):
        contribs = (
            edges.join(ranks, edges["src"] == ranks["node"])
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("node"),
                F.floor(F.col("rank") / F.col("outdeg") * F.lit(GRID) + F.lit(0.5))
                .cast("bigint")
                .alias("c"),
            )
        )
        ranks = (
            contribs.groupBy("node")
            .agg(F.sum("c").alias("s"))
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.lit(damping) * (F.col("s") / F.lit(GRID))
                ).alias("rank"),
            )
        )
        ranks = ranks.localCheckpoint(eager=False)
    return ranks
