"""Maximal Marginal Relevance (MMR) diversity reranking.

The reference stack stops at raw cosine top-k
(demo/similarity_search_demo.py:60-95); every RAG serving layer built on
it immediately needs the next step — rerank the top-N candidates so the
k passages handed to the model are RELEVANT but not REDUNDANT. MMR
(Carbonell & Goldstein, SIGIR'98) is the standard greedy:

    pick argmax_c  lam * rel(q, c)  -  (1 - lam) * max_{s in S} sim(c, s)

Spark-first shape:
  candidate generation   distributed — the existing kNN machinery
                         (per-qid rank window = WindowGroupLimit partial
                         top-k; O(corpus) scored, O(N) kept per query)
  greedy selection       ``applyInPandas`` per qid group — the group is
                         the BOUNDED top-N candidate set (N ~ 10-100),
                         so the k*N^2*d greedy is trivial per group and
                         the batch parallelizes across queries. Nothing
                         ever collects to the driver.

At 100 TB / 100k queries: candidate gen is one pass over the corpus (or
one probe of the IVF/PQ layouts); the rerank stage shuffles only
O(queries x N) candidate rows, grouped by qid — embarrassingly parallel.

Exactness contract (the repo-wide differential discipline): the greedy
is computed in PURE PYTHON floats with the exact operation order of the
SQL spelling — dot products as a sequential left fold from 0.0 (the
``dot_sql`` order, functions/vector.py:281), sim = dot / (sqrt(aa) *
sqrt(bb)), score = lam*rel - (1-lam)*pen, penalty = max of previous
sims. Every step is an IEEE-754 double op in identical order, so the
result is BITWISE identical to the unrolled k-step greedy CTE the
DuckDB oracle runs (``mmr_oracle_steps_sql``) — no grid needed.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from pgvector_db_spark.functions.vector import cosine_similarity_sql


def _dot(a: list[float], b: list[float]) -> float:
    """Sequential left fold from 0.0 — the exact ``dot_sql`` order."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def _cos_sim(a: list[float], b: list[float]) -> float:
    """dot/(sqrt(aa)*sqrt(bb)) — the exact ``cosine_similarity_sql``
    association order (norms multiplied together, then one divide)."""
    return _dot(a, b) / (math.sqrt(_dot(a, a)) * math.sqrt(_dot(b, b)))


def mmr_select_py(cands, k: int, lam: float):
    """Greedy MMR over one query's candidate list — pure Python, bit
    parity with the unrolled SQL. ``cands``: list of
    (id, rel, embedding_as_float_list). Returns
    [(id, rnk, mmr_score, rel)] in selection order.

    Tie-break at every argmax: score DESC, id ASC — float equality is
    deterministic here because both engines produce bitwise-identical
    doubles."""
    omlam = 1.0 - lam
    remaining = list(cands)
    selected = []  # (id, rel, emb)
    out = []
    while remaining and len(out) < k:
        best = None
        for cid, rel, emb in remaining:
            if selected:
                pen = max(_cos_sim(emb, semb) for _, _, semb in selected)
            else:
                pen = 0.0
            score = lam * rel - omlam * pen
            if best is None or score > best[0] or (
                score == best[0] and cid < best[1]
            ):
                best = (score, cid, rel, emb)
        score, cid, rel, emb = best
        selected.append((cid, rel, emb))
        out.append((cid, len(out) + 1, score, rel))
        remaining = [c for c in remaining if c[0] != cid]
    return out


MMR_SCHEMA = StructType(
    [
        StructField("qid", LongType(), True),
        StructField("vec_id", LongType(), True),
        StructField("rnk", LongType(), True),
        StructField("mmr_score", DoubleType(), True),
        StructField("rel", DoubleType(), True),
    ]
)


def mmr_rerank_batch(
    candidates: DataFrame,
    k: int = 5,
    lam: float = 0.7,
    qid_col: str = "qid",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rel_col: str = "rel",
) -> DataFrame:
    """Distributed batch MMR: ``candidates`` holds each query's bounded
    top-N rows (qid, id, embedding, rel-to-query); the greedy runs per
    qid group via ``applyInPandas``. Returns
    (qid, vec_id, rnk, mmr_score, rel) ordered by (qid, rnk).

    Precondition: every candidate embedding has nonzero norm (true of
    any real embedding model's output). ``_cos_sim`` divides by the
    norm product, so a zero-norm vector is rejected here with a NAMED
    error instead of surfacing as a ZeroDivisionError inside the Spark
    task (and instead of silently diverging from the SQL twin's 0/0
    arithmetic, whose NULL/NaN result is engine-specific)."""
    import pandas as pd

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf[qid_col].iloc[0])
        cands = [
            (
                int(r[id_col]),
                float(r[rel_col]),
                # float32 -> float64 widening is exact; .tolist() gives
                # Python floats in element order (the SQL fold order)
                [float(v) for v in r[vec_col]],
            )
            for _, r in pdf.iterrows()
        ]
        for cid, _, emb in cands:
            if _dot(emb, emb) == 0.0:
                raise ValueError(
                    f"mmr_rerank_batch: zero-norm embedding for "
                    f"candidate {cid} (qid {qid}) — cosine penalty "
                    f"undefined; filter degenerate vectors upstream"
                )
        # deterministic scan order for the argmax: id ASC (the SQL
        # window's tie-break); rel order does not matter because every
        # candidate is examined
        cands.sort(key=lambda c: c[0])
        rows = mmr_select_py(cands, k, lam)
        return pd.DataFrame(
            {
                "qid": [qid] * len(rows),
                "vec_id": [r[0] for r in rows],
                "rnk": [r[1] for r in rows],
                "mmr_score": [r[2] for r in rows],
                "rel": [r[3] for r in rows],
            }
        )

    return (
        candidates.groupBy(qid_col)
        .applyInPandas(greedy, MMR_SCHEMA)
        .orderBy("qid", "rnk")
    )


def mmr_oracle_steps_sql(
    cand_cte: str,
    k: int,
    lam: float,
    dialect: str = "duckdb",
) -> str:
    """Unrolled k-step greedy as chained CTEs — the independent oracle
    implementation (and, with dialect='spark', a pure-SQL twin usable
    for triangulation). ``cand_cte`` must define a relation ``cand``
    with columns (qid, vec_id, rel, embedding).

    Step 1 argmaxes the SAME score expression the Python greedy
    computes (lam*rel − (1−lam)*0.0), NOT raw rel: multiplication by
    lam is monotonic over the reals but NOT injective over doubles —
    two distinct rels can round to one lam*rel, and at such a collision
    the Python side falls to its id-ASC tie-break while a raw-rel
    window would still distinguish them (r7 review finding). Step i
    joins the i-1 selected rows per qid, takes the max pairwise sim as
    the redundancy penalty (``greatest`` of bitwise-identical doubles),
    and argmaxes the MMR score. Every float literal goes through the
    STRING->DOUBLE cast (functions/vector.py vector_literal_sql
    rationale)."""
    omlam = 1.0 - lam
    lam_sql = f"CAST('{lam!r}' AS DOUBLE)"
    omlam_sql = f"CAST('{omlam!r}' AS DOUBLE)"
    parts = [cand_cte.rstrip().rstrip(",")]
    parts.append(
        f""",
    sel1 AS (
      SELECT qid, vec_id, rel, embedding, CAST(1 AS BIGINT) AS rnk,
             {lam_sql} * rel - {omlam_sql} * CAST(0.0 AS DOUBLE)
               AS mmr_score
      FROM (
        SELECT c.*, ROW_NUMBER() OVER (
          PARTITION BY qid
          ORDER BY {lam_sql} * rel - {omlam_sql} * CAST(0.0 AS DOUBLE)
                     DESC,
                   vec_id ASC) AS rn
        FROM cand c
      ) WHERE rn = 1
    )"""
    )
    for i in range(2, k + 1):
        prev = range(1, i)
        joins = " ".join(
            f"JOIN sel{j} s{j} ON c.qid = s{j}.qid" for j in prev
        )
        not_selected = " AND ".join(
            f"c.vec_id != s{j}.vec_id" for j in prev
        )
        sims = [
            cosine_similarity_sql("c.embedding", f"s{j}.embedding", dialect)
            for j in prev
        ]
        pen = sims[0] if len(sims) == 1 else f"greatest({', '.join(sims)})"
        parts.append(
            f""",
    sel{i} AS (
      SELECT qid, vec_id, rel, embedding, CAST({i} AS BIGINT) AS rnk,
             mmr_score
      FROM (
        SELECT c.qid, c.vec_id, c.rel, c.embedding,
               {lam_sql} * c.rel - {omlam_sql} * ({pen}) AS mmr_score,
               ROW_NUMBER() OVER (
                 PARTITION BY c.qid
                 ORDER BY {lam_sql} * c.rel - {omlam_sql} * ({pen}) DESC,
                          c.vec_id ASC) AS rn
        FROM cand c {joins}
        WHERE {not_selected}
      ) WHERE rn = 1
    )"""
        )
    union = "\n      UNION ALL\n      ".join(
        f"SELECT qid, vec_id, rnk, mmr_score, rel FROM sel{i}"
        for i in range(1, k + 1)
    )
    parts.append(
        f"""
    SELECT CAST(qid AS BIGINT) AS qid, CAST(vec_id AS BIGINT) AS vec_id,
           rnk, mmr_score, rel
    FROM ({union})
    ORDER BY qid, rnk
    """
    )
    return "".join(parts)
