"""Unit/property tests for the round-4 additions: PageRank, count-min
sketch, CDC apply (batch + table-backed + out-of-order), weighted
reservoir sampling. Cross-engine exactness is covered by
test_queries_oracle; these pin the algorithmic invariants."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pgvector_db_spark.operators.cdc import (
    apply_changes,
    merge_changes_into,
    read_state,
)
from pgvector_db_spark.operators.graph import pagerank
from pgvector_db_spark.operators.sketches import (
    cms_build,
    cms_estimate,
    heavy_hitters,
)
from pgvector_db_spark.queries import REGISTRY, _cdc_changelog

SF_DIR = "/root/testdata/sf0.001"


# -- PageRank ---------------------------------------------------------------


def test_pagerank_matches_hand_rolled_power_method(spark):
    # directed triangle a->b->c->a plus a->c: small enough to verify by hand
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")], ["src", "dst"]
    )
    got = {
        r["node"]: r["rank"] for r in pagerank(edges, iterations=3).collect()
    }

    # independent python replica of the same grid-quantized iteration
    nodes = ["a", "b", "c"]
    out = {"a": ["b", "c"], "b": ["c"], "c": ["a"]}
    rank = {n: 1.0 / 3 for n in nodes}
    for _ in range(3):
        contrib = {n: 0 for n in nodes}
        for u, vs in out.items():
            c = math.floor(rank[u] / len(vs) * 1e12 + 0.5)
            for v in vs:
                contrib[v] += c
        rank = {
            n: (1.0 - 0.85) / 3 + 0.85 * (contrib[n] / 1e12) for n in nodes
        }
    assert got == rank  # bitwise: same double ops in the same order


def test_pagerank_mass_conserved_on_fixture_graph(spark, tables):
    pe = (
        tables["lineitem"]
        .select(
            F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias(
                "src"
            ),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias(
                "dst"
            ),
        )
        .distinct()
    )
    edges = pe.union(
        pe.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    ranks = pagerank(edges, iterations=3)
    total = ranks.agg(F.sum("rank")).first()[0]
    # both-ways bipartite graph has no dangling mass: sum stays ~1
    assert abs(total - 1.0) < 1e-6
    assert ranks.filter("rank <= 0").count() == 0


def test_bfs_hops_minimum_distance_and_early_exit(spark):
    from pgvector_db_spark.operators.graph import bfs_hops

    # a -> b -> c -> d chain plus shortcut a -> c: c is hop 1, not 2
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c")], ["src", "dst"]
    )
    got = {r["node"]: r["hop"] for r in bfs_hops(edges, ["a"], 3).collect()}
    assert got == {"a": 0, "b": 1, "c": 1, "d": 2}
    # max_hops beyond graph diameter: the loop exits when the frontier
    # drains, and the result is unchanged
    again = {
        r["node"]: r["hop"] for r in bfs_hops(edges, ["a"], 10).collect()
    }
    assert again == got


# -- Count-min sketch -------------------------------------------------------


def test_cms_estimate_is_an_upper_bound_everywhere(spark, tables):
    from pgvector_db_spark.functions.text import tokens

    tok = (
        tables["documents"]
        .select(F.explode(tokens("text")).alias("t"))
        .filter(F.length("t") > 0)
    )
    sketch = cms_build(tok, depth=4, width=64)
    # sketch never exceeds depth*width cells, at any corpus size
    assert sketch.count() <= 4 * 64
    est = cms_estimate(tok.distinct(), sketch, depth=4, width=64)
    truth = tok.groupBy("t").agg(F.count(F.lit(1)).alias("true_cnt"))
    bad = est.join(truth, "t").filter("est < true_cnt").count()
    assert bad == 0  # CMS overestimates, never underestimates


def test_cms_unseen_token_estimates_zero_or_collision_min(spark):
    corpus = spark.createDataFrame(
        [("aa bb aa",), ("bb cc",)], ["text"]
    ).selectExpr("explode(split(text, ' ')) AS t")
    sketch = cms_build(corpus, depth=4, width=64)
    probe = spark.createDataFrame([("zz_unseen",), ("aa",)], ["t"])
    est = {r["t"]: r["est"] for r in
           cms_estimate(probe, sketch, depth=4, width=64).collect()}
    # unseen token must still get a row; its estimate is bounded by the
    # emptiest of its 4 cells (0 unless all four collide)
    assert "zz_unseen" in est and est["zz_unseen"] <= 2
    assert est["aa"] >= 2  # true count is a lower bound


def test_cdc_same_seq_tombstone_wins(spark):
    from pgvector_db_spark.operators.cdc import latest_changes

    log = spark.createDataFrame(
        [(1, 5, "I", 100), (1, 5, "D", 0), (2, 1, "U", 7)],
        ["k", "seq", "op", "cents"],
    )
    got = {r["k"]: r["op"] for r in
           latest_changes(log, key="k", seq="seq").collect()}
    assert got == {1: "D", 2: "U"}  # documented: same-seq D beats its I


def test_pagerank_keeps_zero_indegree_nodes(spark):
    # 'a' has out-edges but no in-edges: it must keep its teleport rank
    # every iteration instead of vanishing after iteration 1
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("c", "b")], ["src", "dst"]
    )
    ranks = {r["node"]: r["rank"] for r in
             pagerank(edges, iterations=3).collect()}
    assert set(ranks) == {"a", "b", "c"}
    assert ranks["a"] == (1.0 - 0.85) / 3  # pure teleport, present


def test_cms_top1_is_the_true_heaviest_token(spark, tables):
    # the fixture vocabulary is small vs width=64 collisions, so the
    # true heaviest token must surface at rank 1
    from pgvector_db_spark.functions.text import tokens

    top = heavy_hitters(tables["documents"], k=1).first()
    tok = (
        tables["documents"]
        .select(F.explode(tokens("text")).alias("t"))
        .filter(F.length("t") > 0)
    )
    true_top = (
        tok.groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("t"))
        .first()
    )
    assert top["true_cnt"] == true_top["c"]


# -- CDC --------------------------------------------------------------------


def test_cdc_batch_apply_equals_table_backed_upsert_delete(spark, tables, tmp_path):
    from pgvector_db_spark.sources.table import ParquetTable

    log = _cdc_changelog(tables["orders"])
    expect = sorted(
        map(tuple, apply_changes(log, key="k", seq="seq").collect())
    )

    # replay the same log through the mutable-table API in seq order:
    # upserts for I/U, delete() for D — the Postgres-shaped path
    table = ParquetTable(spark, str(tmp_path / "state"))
    for s in [0, 1, 2, 3]:
        batch = log.filter(F.col("seq") == s)
        ups = batch.filter("op <> 'D'").select("k", "status", "cents")
        if s == 0:
            ups.write.parquet(table.path)
        elif ups.take(1):
            table.upsert(ups, key="k")
        dels = batch.filter("op = 'D'").select("k")
        if dels.take(1):
            table.delete(dels, key="k")
    got = sorted(map(tuple, table.read().collect()))
    assert got == expect


def test_cdc_streaming_fold_is_order_insensitive(spark, tables, tmp_path):
    log = _cdc_changelog(tables["orders"]).localCheckpoint()
    from pgvector_db_spark.sources.table import ParquetTable

    finals = []
    # fold the same log split two ways: by seq ascending, and reversed
    for tag, seqs in [("fwd", [0, 1, 2, 3]), ("rev", [3, 2, 1, 0])]:
        table = ParquetTable(spark, str(tmp_path / f"state_{tag}"))
        for s in seqs:
            merge_changes_into(
                table, log.filter(F.col("seq") == s), key="k", seq="seq"
            )
        finals.append(sorted(map(tuple, read_state(table).collect())))
    assert finals[0] == finals[1]


def test_parquet_table_delete_removes_only_named_keys(spark, tmp_path):
    from pgvector_db_spark.sources.table import ParquetTable

    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], ["k", "v"]
    )
    table = ParquetTable(spark, str(tmp_path / "t"))
    df.write.parquet(table.path)
    n = table.delete(spark.createDataFrame([(3,), (7,)], ["k"]), key="k")
    assert n == 8
    left = {r["k"] for r in table.read().collect()}
    assert left == set(range(10)) - {3, 7}
    # deleting absent keys is a no-op, not an error
    assert table.delete(spark.createDataFrame([(99,)], ["k"]), key="k") == 8


# -- Weighted reservoir -----------------------------------------------------


def test_weighted_reservoir_prefers_heavy_docs(spark, tables):
    rows = REGISTRY["ds_weighted_reservoir"].spark_fn(spark, SF_DIR).collect()
    assert len(rows) == 20
    sample_mean = sum(r["n_chars"] for r in rows) / len(rows)
    corpus_mean = tables["documents"].agg(F.avg("n_chars")).first()[0]
    # weight ∝ n_chars → the sample skews long (robust margin, seeded)
    assert sample_mean > corpus_mean
    # deterministic: same seed, same sample
    again = REGISTRY["ds_weighted_reservoir"].spark_fn(spark, SF_DIR).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_bfs_empty_seeds_preserves_node_type(spark):
    """Empty-seed BFS must return a frame whose node column has the
    edges' src type (r5 ADVICE: the early return hardcoded string)."""
    from pgvector_db_spark.operators.graph import bfs_hops

    edges = spark.createDataFrame([(1, 2), (2, 3)], "src bigint, dst bigint")
    out = bfs_hops(edges, [], max_hops=3)
    assert out.count() == 0
    assert out.schema["node"].dataType == edges.schema["src"].dataType


def test_sq8_build_rejects_degenerate_corpus(spark, tmp_path):
    """Constant or empty corpora make the affine divisor zero — the
    build must fail loudly, not persist NULL codes (r5 ADVICE)."""
    import pytest as _pytest

    from pgvector_db_spark.operators.sq import build_sq8_layout

    const = spark.createDataFrame(
        [(1, [0.5, 0.5]), (2, [0.5, 0.5])], "vec_id bigint, embedding array<double>"
    )
    with _pytest.raises(ValueError, match="degenerate"):
        build_sq8_layout(const, str(tmp_path / "sq_const"))
    empty = const.filter("vec_id < 0")
    with _pytest.raises(ValueError, match="empty corpus"):
        build_sq8_layout(empty, str(tmp_path / "sq_empty"))


def test_triangle_count_on_known_graphs(spark):
    """Known answers: K4 has 4 triangles; a path has 0; a star (hub)
    has 0 — and the hub case is exactly where degree orientation must
    not blow up (the hub emits no wedges). Duplicate/reversed/self-loop
    edges must not change counts."""
    from pyspark.sql import functions as F  # noqa: F401

    from pgvector_db_spark.operators.graph import triangle_count

    def run(edges):
        df = spark.createDataFrame(edges, "src bigint, dst bigint")
        return triangle_count(df).collect()[0]

    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    r = run(k4 + [(2, 1), (3, 3)])  # + reversed dup + self-loop
    assert (r["n_nodes"], r["n_edges"], r["n_triangles"]) == (4, 6, 4)

    path = [(1, 2), (2, 3), (3, 4), (4, 5)]
    r = run(path)
    assert (r["n_nodes"], r["n_edges"], r["n_triangles"]) == (5, 4, 0)

    star = [(0, i) for i in range(1, 8)]
    r = run(star)
    assert (r["n_nodes"], r["n_edges"], r["n_triangles"]) == (8, 7, 0)

    # two triangles sharing an edge -> 2 triangles, 5 edges
    bowtieish = [(1, 2), (2, 3), (1, 3), (1, 4), (2, 4)]
    r = run(bowtieish)
    assert (r["n_nodes"], r["n_edges"], r["n_triangles"]) == (4, 5, 2)


def test_kcore_peel_known_graph_and_cascade(spark):
    """K5 is a 4-core (everyone survives k=4, nobody survives k=5);
    a pendant chain hanging off K5 must cascade away entirely at k=2
    even though its inner nodes start at degree 2."""
    from pgvector_db_spark.operators.graph import kcore_peel

    k5 = [(a, b) for a in range(5) for b in range(5) if a < b]
    chain = [(4, 10), (10, 11), (11, 12)]  # pendant path off node 4

    def run(edges, k):
        df = spark.createDataFrame(edges, "src bigint, dst bigint")
        return {
            (r["node"], r["degree"])
            for r in kcore_peel(df, k=k, rounds=6).collect()
        }

    assert run(k5, 4) == {(i, 4) for i in range(5)}
    assert run(k5, 5) == set()
    # k=2: 12 is degree-1 -> drops; then 11, then 10 -> K5 remains.
    # A single round would only drop node 12 — the cascade needs the
    # fixed-round loop to actually iterate.
    assert run(k5 + chain, 2) == {(i, 4) for i in range(5)}
