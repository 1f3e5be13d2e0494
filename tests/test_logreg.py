"""logistic_gd: the fixed-iteration distributed GD trainer
(operators/logreg.py) — contracts the registry oracle can't see."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pgvector_db_spark.operators.logreg import logistic_audit, logistic_gd


def _toy(spark):
    # perfectly separable on x1 with margin: y = 1 iff x1 > 0
    rows = [(-1.0, 0.0), (-0.8, 0.0), (-0.5, 0.0), (0.5, 1.0), (0.8, 1.0), (1.0, 1.0)]
    return spark.createDataFrame(rows, "x1 double, y double")


def test_learns_separable_toy(spark):
    df = _toy(spark)
    w, n = logistic_gd(df, ["x1"], "y", iters=3, lr=2.0)
    assert n == 6
    assert w[1] > 0  # positive slope on the separating feature
    audit = logistic_audit(df, ["x1"], "y", w, n).collect()[0]
    assert audit["train_acc_ppm"] == 1_000_000
    assert audit["n_pos"] == 3


def test_margin_bound_raises_loud(spark):
    # huge feature scale: first update throws margins out of
    # exp_unit's domain — the operator must refuse, not go quietly wrong
    rows = [(-50.0, 0.0), (50.0, 1.0)] * 3
    df = spark.createDataFrame(rows, "x1 double, y double")
    with pytest.raises(ValueError, match="margin"):
        logistic_gd(df, ["x1"], "y", iters=3, lr=4.0)


def test_validation(spark):
    df = _toy(spark)
    with pytest.raises(ValueError, match="iters"):
        logistic_gd(df, ["x1"], "y", iters=0)
    with pytest.raises(ValueError, match="empty"):
        logistic_gd(df.filter(F.col("x1") > 99), ["x1"], "y")


def test_zero_iterations_of_drift_are_deterministic(spark):
    # same input twice -> bitwise-identical weights (the whole point)
    df = _toy(spark)
    w1, _ = logistic_gd(df, ["x1"], "y", iters=3, lr=2.0)
    w2, _ = logistic_gd(df, ["x1"], "y", iters=3, lr=2.0)
    assert w1 == w2
