"""Differential test: every registered query vs its DuckDB oracle at
sf0.001 — the local mirror of the driver's CORRECTNESS gate."""

from __future__ import annotations

import duckdb
import pytest

from pgvector_db_spark.catalog import TABLES, table_path
from pgvector_db_spark.queries import REGISTRY
from tools.difftest import rows_to_multiset

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{table_path(SF_DIR, t)}'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, duck):
    spec = REGISTRY[name]
    sdf = spec.spark_fn(spark, SF_DIR)
    # driver-gate compatibility: the gate canonicalizes with pandas
    # sort_values, which throws on array/map/struct cells — every registry
    # query must emit scalar columns only (r3 verdict item #1)
    from pyspark.sql.types import ArrayType, MapType, StructType

    nested = [
        (f.name, f.dataType.simpleString())
        for f in sdf.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert nested == [], f"{name} returns non-scalar columns: {nested}"
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    if spec.oracle is None:
        assert len(srows) >= 0
        return
    res = duck.execute(spec.oracle)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows)
    assert rows_to_multiset(scols, srows) == rows_to_multiset(dcols, drows)


def test_asof_join_operator_basic(spark):
    from pgvector_db_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, 10, 100.0), (1, 20, 200.0), (2, 15, 150.0)],
        ["k", "ts", "lv"],
    ).withColumnRenamed("k", "user")
    right = spark.createDataFrame(
        [(1, 10, "a"), (1, 18, "b"), (3, 5, "c")],
        ["user", "ts", "tag"],
    )
    rows = {
        (r["user"], r["ts"]): r["tag_asof"] if "tag_asof" in r.asDict() else r["tag"]
        for r in asof_join(left, right, "user", "ts", "ts").collect()
    }
    assert rows[(1, 10)] == "a"   # tie matches (inclusive)
    assert rows[(1, 20)] == "b"   # latest at-or-before
    assert rows[(2, 15)] is None  # no right rows for the key


def test_range_join_matches_naive(spark, tables):
    from pyspark.sql import functions as F

    from pgvector_db_spark.operators.joins import range_join

    ev = tables["events"].select("event_id", "value").limit(200)
    bands = spark.createDataFrame(
        [(0, 0.0, 50.0), (1, 40.0, 120.0), (2, 300.0, 400.0)], ["band", "lo", "hi"]
    )
    fast = range_join(ev, bands, "value", "lo", "hi", bin_width=25.0)
    naive = ev.crossJoin(bands).filter(
        (F.col("value") >= F.col("lo")) & (F.col("value") <= F.col("hi"))
    )
    key = lambda r: (r["event_id"], r["band"])
    assert sorted(map(key, fast.collect())) == sorted(map(key, naive.collect()))


def test_asof_join_tie_break_is_deterministic(spark):
    """Multiple right rows sharing (key, ts): with right_order set, the
    row with the GREATEST order value wins — in both directions — instead
    of an arbitrary partition-order pick."""
    from pgvector_db_spark.operators.joins import asof_join

    left = spark.createDataFrame([(1, 10)], "user int, ts int")
    right = spark.createDataFrame(
        [(1, 10, 7, "a"), (1, 10, 9, "b"), (1, 10, 8, "c")],
        "user int, ts int, rid int, tag string",
    )
    for direction in ("backward", "forward"):
        got = asof_join(
            left, right, "user", "ts", "ts",
            direction=direction, right_order="rid",
        ).collect()
        assert len(got) == 1
        assert got[0]["tag"] == "b", direction


def test_salted_join_equals_plain_join(spark):
    """Salting redistributes the shuffle, never the rows: inner and left
    salted joins must return exactly the plain joins' multisets,
    including unmatched left rows under how='left'."""
    from pgvector_db_spark.operators.joins import salted_join

    left = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (3, "d")], "k int, lv string"
    )
    right = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "z")], "k int, rv string"
    )
    for how in ("inner", "left"):
        plain = sorted(map(tuple, left.join(right, "k", how).collect()))
        salted = sorted(
            map(tuple, salted_join(left, right, "k", 4, how).collect())
        )
        assert salted == plain, how


def test_capped_pair_listing_accounts_for_every_pair(spark):
    """The no-silent-caps contract: kept pairs + logged dropped count
    must equal the LOSSLESS listing's pair count; kept pairs are the
    per-anchor (id_b asc) head of the lossless set; survivors' component
    labeling partitions every document exactly once."""
    from pgvector_db_spark.queries import REGISTRY, _PPJOIN_CAP

    sf = "/root/testdata/sf0.001"
    lossless = REGISTRY["ds_prefix_filter_jaccard_join"].spark_fn(
        spark, sf
    ).select("id_a", "id_b").collect()
    capped = REGISTRY["ds_prefix_filter_pairs_capped"].spark_fn(
        spark, sf
    ).collect()
    n_lossless = len(lossless)
    n_kept = len(capped)
    assert n_kept > 0
    dropped = {r["n_dropped_total"] for r in capped}
    assert len(dropped) == 1  # one scalar, logged on every row
    assert n_kept + dropped.pop() == n_lossless
    # kept set is the deterministic per-anchor head of the lossless set
    from collections import defaultdict

    by_a = defaultdict(list)
    for r in lossless:
        by_a[r["id_a"]].append(r["id_b"])
    expect = {
        (a, b) for a, bs in by_a.items() for b in sorted(bs)[:_PPJOIN_CAP]
    }
    assert {(r["id_a"], r["id_b"]) for r in capped} == expect


def test_prefix_filter_survivors_partition_documents(spark):
    """Every document appears exactly once; components are consistent
    with the lossless pair set (two paired docs share a component); the
    kept row is the component min."""
    from pgvector_db_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    pairs = REGISTRY["ds_prefix_filter_jaccard_join"].spark_fn(
        spark, sf
    ).collect()
    surv = REGISTRY["ds_prefix_filter_dedup_survivors"].spark_fn(
        spark, sf
    ).collect()
    comp = {r["doc_id"]: r["component"] for r in surv}
    assert len(surv) == len(comp) == 500
    for r in pairs:
        assert comp[r["id_a"]] == comp[r["id_b"]]
    from collections import Counter

    sizes = Counter(comp.values())
    for r in surv:
        assert r["cluster_size"] == sizes[r["component"]]
        assert r["is_kept"] == int(r["doc_id"] == r["component"])
        assert comp[r["component"]] == r["component"]  # label is a member
        assert r["component"] <= r["doc_id"]  # min-id labeling


def test_salted_skew_join_equals_plain_join(spark):
    """The TARGETED variant: only measured-hot keys get salted/dim-
    replicated; results must still equal the plain join exactly —
    duplicate-match keys, cold keys, and unmatched-left rows included."""
    from pyspark.sql import functions as F

    from pgvector_db_spark.operators.joins import (
        hot_keys_by_share,
        salted_skew_join,
    )

    # key 1 holds 60/66 fact rows (hot); keys 2..7 hold one each (cold);
    # key 99 has no dim match (exercises how='left')
    fact = spark.createDataFrame(
        [(1, i) for i in range(60)]
        + [(k, 100 + k) for k in range(2, 8)]
        + [(99, 999)],
        "k int, fv int",
    )
    dim = spark.createDataFrame(
        [(1, "hot_a"), (1, "hot_b")] + [(k, f"cold{k}") for k in range(2, 8)],
        "k int, dv string",
    )
    hot = hot_keys_by_share(fact, "k", min_share_ppm=100_000)
    assert [r["k"] for r in hot.collect()] == [1]
    for how in ("inner", "left"):
        plain = sorted(map(tuple, fact.join(dim, "k", how).collect()))
        salted = sorted(
            map(
                tuple,
                salted_skew_join(
                    fact, dim, "k", num_salts=4, min_share_ppm=100_000,
                    how=how,
                ).collect(),
            )
        )
        assert salted == plain, how
    # explicit hot_keys frame is honored (salt nothing -> still equal)
    none_hot = spark.createDataFrame([], "k int")
    out = sorted(
        map(
            tuple,
            salted_skew_join(
                fact, dim, "k", num_salts=4, hot_keys=none_hot
            ).collect(),
        )
    )
    assert out == sorted(map(tuple, fact.join(dim, "k").collect()))
    # the histogram threshold really splits the hot key's reducer load:
    # with the hot key salted, no (k, salt) group exceeds ~1/num_salts
    # of its rows (xxhash64 spread — allow generous slack)
    from pgvector_db_spark.operators.joins import salted_join  # noqa: F401

    f2 = fact.join(F.broadcast(hot.withColumn("_hot", F.lit(True))), "k", "left")
    salted_counts = (
        f2.withColumn(
            "_salt",
            F.when(
                F.col("_hot").isNotNull(),
                F.pmod(F.xxhash64("k", "fv"), F.lit(4)),
            ).otherwise(F.lit(0)),
        )
        .groupBy("k", "_salt")
        .count()
        .filter(F.col("k") == 1)
        .collect()
    )
    assert len(salted_counts) == 4  # hot key spread over all 4 salts
    assert max(r["count"] for r in salted_counts) < 60
