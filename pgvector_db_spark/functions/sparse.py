"""Sparse-vector surface — pgvector ``sparsevec`` parity (reference
pgvector extension type; the reference repo itself stores dense
``VECTOR(n)``, so this is part of the declared pgvector-type family like
the bit-vector surface in vector.py).

Representation: two parallel arrays per vector —
    ``indices array<int>``   1-based positions of the retained entries
    ``values  array<double>`` the retained entries, same order
kept sorted by index (construction order from :func:`to_sparse_*`). This
is exactly pgvector's ``{i1:v1,i2:v2,...}/dim`` wire format re-expressed
columnar; arrays beat a ``map<int,double>`` column because Parquet
encodes them better and all math stays in whole-stage codegen.

Determinism contract (same as vector.py): every reduction is a
SEQUENTIAL float64 fold in the first operand's index order, emitted
identically for Spark and DuckDB, so the driver's value-hash comparison
is exact. The sparse dot looks indices up in the second operand
(``array_position`` / ``list_position``) rather than merging two sorted
lists — O(nnz_a · nnz_b) per pair, but branch-free inside codegen and
bitwise-reproducible; at 100 TB the lookup cost is per-row compute that
scales embarrassingly, with no shuffle implications.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from pgvector_db_spark.functions.vector import ColumnOrName, _c, dot_sql

# ---------------------------------------------------------------------------
# Column API
# ---------------------------------------------------------------------------


def sparse_indices(vec: ColumnOrName, eps: float = 0.0) -> Column:
    """1-based positions where ``abs(value) > eps`` (pgvector sparsevec
    drops exact zeros; a positive eps gives lossy magnitude pruning)."""
    v = _c(vec)
    return F.filter(
        F.sequence(F.lit(1), F.size(v)),
        lambda i: F.abs(F.element_at(v, i).cast("double")) > F.lit(float(eps)),
    )


def sparse_values(vec: ColumnOrName, eps: float = 0.0) -> Column:
    """The retained entries as float64, in index order."""
    v = _c(vec)
    return F.transform(
        sparse_indices(vec, eps), lambda i: F.element_at(v, i).cast("double")
    )


def to_sparse(vec: ColumnOrName, eps: float = 0.0) -> Column:
    """Dense ``array<float>`` → ``struct<indices, values>`` sparse form."""
    return F.struct(
        sparse_indices(vec, eps).alias("indices"),
        sparse_values(vec, eps).alias("values"),
    )


def sparse_dot(
    a_idx: ColumnOrName,
    a_val: ColumnOrName,
    b_idx: ColumnOrName,
    b_val: ColumnOrName,
) -> Column:
    """Sequential fold over a's entries; each term is ``a_val[k] *
    b_val[pos]`` when a's index occurs in b, else literal 0.0 (kept in
    the fold so the float op sequence matches the SQL generator)."""
    ai, av, bi, bv = _c(a_idx), _c(a_val), _c(b_idx), _c(b_val)

    def term(k: Column) -> Column:
        pos = F.array_position(bi, F.element_at(ai, k))
        return F.when(
            pos > 0,
            F.element_at(av, k) * F.element_at(bv, pos.cast("int")),
        ).otherwise(F.lit(0.0))

    return F.aggregate(
        F.transform(F.sequence(F.lit(1), F.size(ai)), term),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def sparse_norm(values: ColumnOrName) -> Column:
    """l2 norm of the retained entries (== dense norm when eps=0)."""
    v = _c(values)
    return F.sqrt(
        F.aggregate(
            F.transform(v, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def sparse_cosine_distance(
    a_idx: ColumnOrName,
    a_val: ColumnOrName,
    b_idx: ColumnOrName,
    b_val: ColumnOrName,
) -> Column:
    return F.lit(1.0) - sparse_dot(a_idx, a_val, b_idx, b_val) / (
        sparse_norm(a_val) * sparse_norm(b_val)
    )


# ---------------------------------------------------------------------------
# SQL-text generators (dialect="spark" | "duckdb"), fold-identical
# ---------------------------------------------------------------------------


def sparse_indices_sql(vec: str, eps: float, dialect: str = "spark") -> str:
    e = f"CAST({float(eps)!r} AS DOUBLE)"
    if dialect == "spark":
        return (
            f"filter(sequence(1, size({vec})), i -> "
            f"abs(CAST(element_at({vec}, i) AS DOUBLE)) > {e})"
        )
    return (
        f"list_filter(range(1, len({vec}) + 1), i -> "
        f"abs(CAST({vec}[i] AS DOUBLE)) > {e})"
    )


def sparse_values_sql(vec: str, eps: float, dialect: str = "spark") -> str:
    idx = sparse_indices_sql(vec, eps, dialect)
    if dialect == "spark":
        return f"transform({idx}, i -> CAST(element_at({vec}, i) AS DOUBLE))"
    return f"list_transform({idx}, i -> CAST({vec}[i] AS DOUBLE))"


def sparse_dot_sql(
    a_idx: str, a_val: str, b_idx: str, b_val: str, dialect: str = "spark"
) -> str:
    if dialect == "spark":
        pos = f"array_position({b_idx}, element_at({a_idx}, k))"
        return (
            f"aggregate(transform(sequence(1, size({a_idx})), k -> "
            f"CASE WHEN {pos} > 0 THEN element_at({a_val}, k) * "
            f"element_at({b_val}, CAST({pos} AS INT)) "
            f"ELSE CAST(0.0 AS DOUBLE) END), "
            f"CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
        )
    # list_position yields 0 for absent (NULL on old versions); `> 0`
    # rejects both, mirroring Spark's array_position contract
    pos = f"list_position({b_idx}, {a_idx}[k])"
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(range(1, len({a_idx}) + 1), k -> "
        f"CASE WHEN {pos} > 0 THEN {a_val}[k] * {b_val}[{pos}] "
        f"ELSE CAST(0.0 AS DOUBLE) END)), "
        f"(acc, x) -> acc + x)"
    )


def sparse_norm_sql(values: str, dialect: str = "spark") -> str:
    return f"sqrt({dot_sql(values, values, dialect)})"


def sparse_cosine_distance_sql(
    a_idx: str, a_val: str, b_idx: str, b_val: str, dialect: str = "spark"
) -> str:
    return (
        f"(1.0 - {sparse_dot_sql(a_idx, a_val, b_idx, b_val, dialect)} / "
        f"({sparse_norm_sql(a_val, dialect)} * {sparse_norm_sql(b_val, dialect)}))"
    )
