"""functions/detmath.py: the deterministic cross-engine ln/exp.

The contract is BITWISE equality between the Spark Column, the
Spark-SQL spelling, and the DuckDB-SQL spelling — not closeness. A
1-ulp cross-engine libm difference is what held stream_bm25_ingest red
in the r3-r5 driver gates, so these trees must contain no libm call.
Accuracy vs Python's math.log/exp is checked separately at a tolerance
(truncation of the fixed series is allowed; divergence between engines
is not).
"""

import math
import struct

import duckdb
import pytest
from pyspark.sql import functions as F

from pgvector_db_spark.functions.detmath import (
    exp_unit,
    exp_unit_sql,
    ln_bigint,
    ln_bigint_sql,
)


def _bits(x: float) -> bytes:
    return struct.pack("<d", x)


_INTS = (
    list(range(1, 500))
    + [10**k for k in range(3, 15)]
    + [2**k for k in range(9, 52)]
    + [2**k + 1 for k in range(9, 52)]
    + [2**k - 1 for k in range(9, 52)]
    + [987654321012345, 4294967297, 600001, 2 * 10**12 + 2]
)


def test_ln_bigint_three_spellings_bitwise_equal(spark):
    df = spark.createDataFrame([(v,) for v in _INTS], "m bigint")
    rows = df.select(
        "m",
        ln_bigint(F.col("m")).alias("col_ln"),
        F.expr(ln_bigint_sql("m", "spark")).alias("sql_ln"),
    ).collect()
    con = duckdb.connect()
    con.execute("CREATE TABLE t(m BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in _INTS])
    duck = dict(
        con.execute(
            f"SELECT m, {ln_bigint_sql('m', 'duckdb')} FROM t"
        ).fetchall()
    )
    for r in rows:
        assert _bits(r["col_ln"]) == _bits(r["sql_ln"]), r["m"]
        assert _bits(r["col_ln"]) == _bits(duck[r["m"]]), r["m"]


def test_ln_bigint_accuracy(spark):
    rows = (
        spark.createDataFrame([(v,) for v in _INTS], "m bigint")
        .select("m", ln_bigint(F.col("m")).alias("ln"))
        .collect()
    )
    for r in rows:
        want = math.log(r["m"])
        # 8-term atanh Horner truncation bound ~1e-9 absolute at t=1/3
        # (detmath module doc) — accuracy is a sanity bound; bitwise
        # cross-engine equality above is the contract
        assert abs(r["ln"] - want) <= max(abs(want), 1.0) * 2e-9, r["m"]


_YS = [i / 64.0 for i in range(-128, 129)] + [0.123456789, -1.9990234375]


def test_exp_unit_three_spellings_bitwise_equal_and_accurate(spark):
    df = spark.createDataFrame([(y,) for y in _YS], "y double")
    rows = df.select(
        "y",
        exp_unit(F.col("y")).alias("col_e"),
        F.expr(exp_unit_sql("y", "spark")).alias("sql_e"),
    ).collect()
    con = duckdb.connect()
    con.execute("CREATE TABLE t(y DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(y,) for y in _YS])
    duck = dict(
        con.execute(
            f"SELECT y, {exp_unit_sql('y', 'duckdb')} FROM t"
        ).fetchall()
    )
    for r in rows:
        assert _bits(r["col_e"]) == _bits(r["sql_e"]), r["y"]
        assert _bits(r["col_e"]) == _bits(duck[r["y"]]), r["y"]
        # alternating-series cancellation at negative y costs a few ulp
        # of absolute error — accuracy is a sanity bound here, bitwise
        # cross-engine equality above is the contract
        assert abs(r["col_e"] - math.exp(r["y"])) <= max(
            math.exp(r["y"]), 1.0
        ) * 1e-12


def test_engine_libm_still_covered_self_consistent(spark):
    """rel_math_funcs no longer drives engine exp/ln/pow through the
    exact gate (cross-engine libm is not hash-stable); keep Spark's own
    libm surface exercised here at a tolerance instead."""
    rows = spark.sql(
        """
        SELECT x, exp(ln(x)) AS back, pow(x, 0.5) AS p, sqrt(x) AS s
        FROM VALUES (2.5D), (97.0D), (123456.789D), (1e-3D) AS t(x)
        """
    ).collect()
    for r in rows:
        assert r["back"] == pytest.approx(r["x"], rel=1e-12)
        assert r["p"] == pytest.approx(r["s"], rel=1e-12)


def test_ln_bigint_rejects_nonpositive_semantics(spark):
    """Callers must feed positive integers; pin BOTH halves of the
    contract (the r7 review flagged that this test previously never
    exercised a nonpositive value): a positive input is accurate, and a
    NONPOSITIVE input is UNDEFINED — the engine tree returns finite
    garbage (measured: ln_bigint(0) ≈ -4.04, nowhere near any real
    log), while ln_bigint_py raises for 0 and returns DIFFERENT garbage
    for negatives — so the spellings do NOT agree there and every call
    site must guard m >= 1 before the tree (they all do: df/tf/counts
    are >= 1 by construction)."""
    rows = (
        spark.createDataFrame([(7,), (0,), (-3,)], "m bigint")
        .select("m", ln_bigint(F.col("m")).alias("ln"))
        .collect()
    )
    by_m = {int(r["m"]): r["ln"] for r in rows}
    assert by_m[7] == pytest.approx(math.log(7), rel=2e-9)
    # the garbage must stay garbage: if a future tree change makes a
    # nonpositive input return something close to a real log, a caller
    # could start silently relying on it
    for m, bogus in ((0, None), (-3, math.log(3))):
        v = by_m[m]
        assert v is not None and v == v, f"failure shape changed: {v}"
        if bogus is not None:
            assert v != pytest.approx(bogus, rel=1e-6), (
                f"ln_bigint({m}) ~ ln({abs(m)}) — nonpositive inputs "
                "must not look meaningful"
            )
    from pgvector_db_spark.functions.detmath import ln_bigint_py

    with pytest.raises(ValueError):
        ln_bigint_py(0)
    assert ln_bigint_py(-3) != by_m[-3]  # spellings diverge: must guard


def test_ln_bigint_py_matches_engines_bitwise(spark):
    """The pure-Python spelling must return the same bit pattern as the
    engine trees — it is used to fold driver-known logs (corpus stats)
    into plan literals."""
    from pgvector_db_spark.functions.detmath import ln_bigint_py

    rows = (
        spark.createDataFrame([(v,) for v in _INTS], "m bigint")
        .select("m", ln_bigint(F.col("m")).alias("ln"))
        .collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t(m BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in _INTS])
    duck = dict(
        con.execute(
            f"SELECT m, {ln_bigint_sql('m', 'duckdb')} FROM t"
        ).fetchall()
    )
    for r in rows:
        py = ln_bigint_py(r["m"])
        assert _bits(py) == _bits(r["ln"]), r["m"]
        assert _bits(py) == _bits(duck[r["m"]]), r["m"]


def test_ln_bigint_staged_matches_inline_bitwise(spark):
    """ln_bigint_staged (sequential projections, small analyzed tree)
    must produce the same doubles as the inline Column tree."""
    from pgvector_db_spark.functions.detmath import ln_bigint_staged

    df = spark.createDataFrame([(v,) for v in _INTS], "m bigint")
    inline = {r["m"]: r["ln"] for r in df.select("m", ln_bigint(F.col("m")).alias("ln")).collect()}
    staged = {
        r["m"]: r["ln"]
        for r in ln_bigint_staged(df, F.col("m"), "ln").collect()
    }
    for m, v in inline.items():
        assert _bits(staged[m]) == _bits(v), m


def test_bitlen_minus1_duckdb_spelling_exact():
    """The r7 DuckDB bit-length spelling (floor(log2) + exact integer
    CASE/shift correction — replacing the version-sensitive bin()
    string idiom) must equal Python int.bit_length()-1 for every probe
    integer including the 2^k boundaries up to 2^63-1."""
    from pgvector_db_spark.functions.detmath import bitlen_minus1_sql

    ints = sorted(
        set(
            _INTS
            + [2**62, 2**62 + 5, 2**63 - 1]
            + [2**k for k in range(52, 63)]
            + [2**k - 1 for k in range(52, 64)]
            + [2**k + 1 for k in range(52, 63)]
        )
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t(m BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in ints])
    rows = con.execute(
        f"SELECT m, {bitlen_minus1_sql('m', 'duckdb')} FROM t"
    ).fetchall()
    for m, e in rows:
        assert int(e) == m.bit_length() - 1, m


def test_bitlen_minus1_spark_spelling_exact(spark):
    from pgvector_db_spark.functions.detmath import bitlen_minus1_sql

    ints = sorted(set(_INTS + [2**62, 2**63 - 1]))
    df = spark.createDataFrame([(v,) for v in ints], "m bigint")
    rows = df.selectExpr(
        "m", f"{bitlen_minus1_sql('m', 'spark')} AS e"
    ).collect()
    for r in rows:
        assert int(r["e"]) == int(r["m"]).bit_length() - 1, r["m"]
