"""PCA top principal component by fixed-depth power iteration —
entirely in SQL, bit-identical across engines.

No MLlib, no driver-side linear algebra: the whole pipeline — grid
quantization, covariance accumulation, three unrolled power-iteration
steps, sign canonicalization, per-vector projection — is ONE generated
SQL statement emitted in a Spark dialect and a DuckDB dialect that
differ only in array indexing (0- vs 1-based). Every cross-row
aggregate is exact (BIGINT / DECIMAL(38,0) sums of grid integers), and
every scalar step is a fixed left-associated chain of correctly-rounded
IEEE-754 ops (+,-,*,/,sqrt), so both engines compute the same doubles
by construction — the kmeans/centroid determinism pattern applied to an
iterative eigensolver.

Scale shape: the only corpus-sized work is ONE aggregate pass (map-side
partial sums of dim + dim(dim+1)/2 integers) and the final map-only
projection; everything between operates on a 1-row frame. ``dim`` is
the SUBVECTOR width (Matryoshka-style leading slice — the established
``subvector`` family), keeping the unrolled expression count at
O(iters·dim²); the full-width variant would generate the same shape
with a larger tree. Grid products g_a·g_b ≤ 4e12 fit BIGINT per row;
their DECIMAL(38,0) sums stay exact past 1e12 rows (100 TB territory).

Accuracy is a property of the SPECTRUM: with a dominant eigendirection,
3 iterations recover numpy's eigh top eigenvector (pinned > 0.99 cosine
on anisotropic data in tests/test_rerank_stats.py); on near-isotropic
data no iteration count could single one out, but the Rayleigh quotient
still grows monotonically (also pinned). DETERMINISM — both engines
computing the same doubles — is what the differential gate checks.
"""

from __future__ import annotations


def pca_moments(df, vec_col: str = "embedding", dim: int = 8):
    """One-row frame of the EXACT covariance moments of ``df``'s lead
    ``dim``-subvector on the 1e-6 grid: ``n`` (BIGINT), ``s{a}``
    (BIGINT component sums), ``p{a}_{b}`` for a<=b (DECIMAL(38,0)
    product sums). Integer partials are associative/commutative, so
    per-micro-batch moment rows FOLD by plain cell addition into
    exactly the whole-corpus aggregate — the streaming-PCA state."""
    from pyspark.sql import functions as F

    D = range(dim)
    g = df.select(
        *[
            F.floor(
                F.col(vec_col)[a].cast("double") * F.lit(1000000.0)
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias(f"g{a}")
            for a in D
        ]
    )
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n")]
    aggs += [F.sum(f"g{a}").cast("bigint").alias(f"s{a}") for a in D]
    aggs += [
        F.sum(
            (F.col(f"g{a}") * F.col(f"g{b}")).cast("decimal(38,0)")
        ).alias(f"p{a}_{b}")
        for a in D
        for b in D
        if a <= b
    ]
    return g.agg(*aggs)


def _chain(terms: list[str]) -> str:
    """Left-associated sum chain — the one evaluation order every
    spelling uses."""
    out = terms[0]
    for t in terms[1:]:
        out = f"({out} + {t})"
    return out


def pca_power_sql(
    dialect: str,
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 8,
    iters: int = 3,
    k: int = 20,
    agg_literals: dict | None = None,
) -> str:
    """Full SELECT: ``(vec_id, label, proj_micro)`` — the top-k |lead
    subvector| projections onto the power-iterated first principal
    component (sign fixed so component 0 is non-negative).

    ``agg_literals``: optional pre-computed moment row ``{"n": int,
    "s": [int]*dim, "p": {(a,b): int for a<=b}}`` — when given, the
    ``agg`` CTE is emitted as integer LITERALS instead of the corpus
    aggregate (the streaming-maintenance path: moments folded
    incrementally from micro-batches are the SAME exact integers the
    batch aggregate produces, and integer-literal→DOUBLE conversion is
    correctly rounded just like CAST(SUM(...) AS DOUBLE), so the
    eigenvector — and every projection — is bitwise the batch result).
    The projection pass still scans ``table``."""
    if dialect == "spark":
        def comp(a: int) -> str:
            return f"CAST({vec_col}[{a}] AS DOUBLE)"
    elif dialect == "duckdb":
        def comp(a: int) -> str:
            return f"CAST({vec_col}[{a + 1}] AS DOUBLE)"
    else:  # pragma: no cover - caller bug
        raise ValueError(f"unknown dialect: {dialect}")

    D = range(dim)
    g_cols = ", ".join(
        f"CAST(floor({comp(a)} * CAST(1000000.0 AS DOUBLE)"
        f" + CAST(0.5 AS DOUBLE)) AS BIGINT) AS g{a}"
        for a in D
    )
    sums = ", ".join(f"CAST(SUM(g{a}) AS BIGINT) AS s{a}" for a in D)
    prods = ", ".join(
        f"SUM(CAST(g{a} * g{b} AS DECIMAL(38,0))) AS p{a}_{b}"
        for a in D
        for b in D
        if a <= b
    )
    # cov_ab = (P_ab - S_a*S_b/n) / n on the (1e6-grid)^2 scale — the
    # uniform scale factor only stretches the eigenvector, which the
    # per-iteration normalization removes
    cov = ", ".join(
        f"((CAST(p{min(a, b)}_{max(a, b)} AS DOUBLE)"
        f" - CAST(s{a} AS DOUBLE) * CAST(s{b} AS DOUBLE)"
        f" / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)) AS c{a}_{b}"
        for a in D
        for b in D
    )
    if agg_literals is None:
        agg_cte = f"agg AS (SELECT COUNT(*) AS n, {sums}, {prods} FROM gr)"
    else:
        lits = [f"CAST({int(agg_literals['n'])} AS BIGINT) AS n"]
        lits += [
            f"CAST({int(agg_literals['s'][a])} AS BIGINT) AS s{a}"
            for a in D
        ]
        lits += [
            f"CAST({int(agg_literals['p'][(a, b)])} AS DECIMAL(38,0))"
            f" AS p{a}_{b}"
            for a in D
            for b in D
            if a <= b
        ]
        agg_cte = f"agg AS (SELECT {', '.join(lits)})"
    ctes = [
        f"gr AS (SELECT {id_col}, label, {g_cols} FROM {table})",
        agg_cte,
        f"cov AS (SELECT {cov} FROM agg)",
    ]
    prev = None  # None = v0 is the all-ones vector
    for it in range(1, iters + 1):
        vb = (lambda b: "CAST(1.0 AS DOUBLE)") if prev is None else (
            lambda b: f"{prev}.v{b}"
        )
        u = ", ".join(
            _chain([f"cov.c{a}_{b} * {vb(b)}" for b in D]) + f" AS u{a}"
            for a in D
        )
        src = "cov" if prev is None else f"cov CROSS JOIN {prev}"
        ctes.append(f"it{it} AS (SELECT {u} FROM {src})")
        nrm = _chain([f"u{a} * u{a}" for a in D])
        ctes.append(
            f"n{it} AS (SELECT it{it}.*, sqrt({nrm}) AS nv FROM it{it})"
        )
        vsel = ", ".join(f"u{a} / nv AS v{a}" for a in D)
        ctes.append(f"v{it} AS (SELECT {vsel} FROM n{it})")
        prev = f"v{it}"
    ctes.append(
        f"pc AS (SELECT CASE WHEN v0 < CAST(0.0 AS DOUBLE)"
        f" THEN CAST(-1.0 AS DOUBLE) ELSE CAST(1.0 AS DOUBLE) END AS sg,"
        f" {', '.join(f'v{a}' for a in D)} FROM {prev})"
    )
    proj = _chain([f"pc.v{a} * CAST(gr.g{a} AS DOUBLE)" for a in D])
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
    SELECT gr.{id_col}, gr.label,
           CAST(floor(pc.sg * {proj} + CAST(0.5 AS DOUBLE)) AS BIGINT)
               AS proj_micro
    FROM gr CROSS JOIN pc
    ORDER BY proj_micro DESC, gr.{id_col} ASC LIMIT {k}
    """
    )
