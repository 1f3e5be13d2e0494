"""MMR diversity rerank (operators/mmr.py): greedy semantics, bit
triangulation against the unrolled-SQL twin, and edge cases."""

from __future__ import annotations

import math

from pgvector_db_spark.operators.mmr import (
    _cos_sim,
    mmr_rerank_batch,
    mmr_select_py,
)


def test_mmr_lambda_one_is_pure_relevance_topk():
    """lam=1 removes the redundancy term: selection order must be rel
    DESC (id ASC ties) — plain top-k."""
    cands = [
        (1, 0.9, [1.0, 0.0]),
        (2, 0.8, [1.0, 0.01]),
        (3, 0.7, [0.0, 1.0]),
    ]
    out = mmr_select_py(cands, k=3, lam=1.0)
    assert [r[0] for r in out] == [1, 2, 3]
    assert [r[1] for r in out] == [1, 2, 3]


def test_mmr_demotes_near_duplicate():
    """With a strong redundancy weight, the near-duplicate of the first
    pick must lose rank 2 to the orthogonal candidate even though its
    raw relevance is higher."""
    cands = [
        (1, 0.90, [1.0, 0.0]),
        (2, 0.89, [1.0, 1e-6]),  # near-dup of 1, rel beats 3
        (3, 0.50, [0.0, 1.0]),   # orthogonal to 1
    ]
    out = mmr_select_py(cands, k=2, lam=0.5)
    assert [r[0] for r in out] == [1, 3]
    # and with lam=1 the duplicate would have won
    out_rel = mmr_select_py(cands, k=2, lam=1.0)
    assert [r[0] for r in out_rel] == [1, 2]


def test_mmr_k_exceeds_candidates_and_empty():
    cands = [(7, 0.5, [1.0, 0.0]), (9, 0.4, [0.0, 1.0])]
    out = mmr_select_py(cands, k=10, lam=0.7)
    assert [r[1] for r in out] == [1, 2]
    assert mmr_select_py([], k=3, lam=0.7) == []


def test_mmr_tie_breaks_on_lower_id():
    """Identical embeddings and rel → identical scores at every step;
    the argmax must take the lower id first (the SQL window's
    tie-break)."""
    v = [0.6, 0.8]
    cands = [(5, 0.5, v), (2, 0.5, v), (9, 0.5, v)]
    out = mmr_select_py(cands, k=3, lam=0.7)
    assert [r[0] for r in out] == [2, 5, 9]


def test_mmr_score_is_exact_fold_order():
    """The reported score must be lam*rel - (1-lam)*max_sim with the
    module's own fold-order cosine — guards against a vectorized
    rewrite silently changing summation order."""
    a, b = [1.0, 2.0, 3.0], [3.0, 1.0, 2.0]
    cands = [(1, 0.9, a), (2, 0.4, b)]
    out = mmr_select_py(cands, k=2, lam=0.7)
    assert out[0][2] == 0.7 * 0.9 - 0.3 * 0.0
    expected = 0.7 * 0.4 - (1.0 - 0.7) * _cos_sim(b, a)
    assert out[1][2] == expected
    # and the fold-order cosine itself matches the sequential spec
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    na = 0.0
    for x in a:
        na = na + x * x
    nb = 0.0
    for x in b:
        nb = nb + x * x
    assert _cos_sim(a, b) == acc / (math.sqrt(na) * math.sqrt(nb))


def test_mmr_applyinpandas_matches_unrolled_sql_twin(spark, tables):
    """Triangulation: the applyInPandas greedy and the spark-dialect
    unrolled k-step CTE (the SAME generator the DuckDB oracle uses)
    must agree bitwise — localizing any future gate divergence to the
    engine environment rather than the greedy."""
    from pgvector_db_spark.operators.mmr import mmr_oracle_steps_sql
    from pgvector_db_spark.queries import _MMR_K, _MMR_LAM, _mmr_cand_cte

    cands = spark.sql(_mmr_cand_cte("spark") + "\n    SELECT * FROM cand")
    fast = mmr_rerank_batch(cands, k=_MMR_K, lam=_MMR_LAM)
    twin = spark.sql(
        mmr_oracle_steps_sql(_mmr_cand_cte("spark"), _MMR_K, _MMR_LAM, "spark")
    )
    assert sorted(map(tuple, fast.collect())) == sorted(
        map(tuple, twin.collect())
    )


def test_rocchio_feedback_shifts_ranking(spark, tables):
    """Rocchio: the derived query must stay anchored near the seed's
    neighborhood (high overlap with the seed's own top-k is expected —
    beta only nudges) while being a genuinely different vector: the
    similarity VALUES must differ from the seed's, and repeated runs
    are bit-identical (grid-exact centroid)."""
    from pgvector_db_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    run1 = REGISTRY["vs_rocchio_feedback_knn"].spark_fn(spark, sf).collect()
    run2 = REGISTRY["vs_rocchio_feedback_knn"].spark_fn(spark, sf).collect()
    assert [tuple(r) for r in run1] == [tuple(r) for r in run2]
    assert len(run1) == 10
    seed_top = spark.sql(
        """
        WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
        SELECT e.vec_id FROM embeddings e CROSS JOIN q
        WHERE e.vec_id != 0
        ORDER BY aggregate(zip_with(e.embedding, q.qe,
                  (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
                  CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)
              / (sqrt(aggregate(zip_with(e.embedding, e.embedding,
                  (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
                  CAST(0.0 AS DOUBLE), (acc, x) -> acc + x))
               * sqrt(aggregate(zip_with(q.qe, q.qe,
                  (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
                  CAST(0.0 AS DOUBLE), (acc, x) -> acc + x))) DESC,
              e.vec_id ASC
        LIMIT 10
        """
    ).collect()
    seed_ids = {r["vec_id"] for r in seed_top}
    roc_ids = {r["vec_id"] for r in run1}
    # anchored: majority overlap with the seed's own neighborhood
    assert len(seed_ids & roc_ids) >= 5
