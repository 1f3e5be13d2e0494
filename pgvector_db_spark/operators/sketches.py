"""Count-min sketch: mergeable heavy-hitter estimation over token streams.

Complements the HLL rollup (queries.py ``rel_hll_mergeable_rollup``) on
the frequency side: a fixed ``depth x width`` counter grid whose cells
are plain additive counts, so per-partition partial sketches merge by
addition — the map-side-combine property that makes the operator one
narrow shuffle of at most ``depth*width`` rows at ANY corpus size. The
full token-frequency table never materializes on the estimation path.

All hashing is md5-derived (first 8 hex chars as a BIGINT, the engine's
standard ``hash32`` trick) so a SQL oracle can replay the exact sketch:
estimates are integers, comparisons are integer — bitwise reproducible.

Scale (100 TB): the sketch aggregate is ``groupBy(row, bucket)`` over
exploded tokens — partials collapse to ``depth*width`` rows per
partition before the exchange. The estimation join broadcasts the
sketch (``depth*width`` rows, independent of data size). The only
data-sized shuffle is the optional exact-count audit join, which a
production run at scale would skip (it exists here to demonstrate the
overestimate property: est >= true, always).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pgvector_db_spark.functions.text import hash32, tokens


def _bucket(col, j: int, width: int):
    """Row-j bucket for a token: hash32(t || '_cms<j>') % width."""
    return (hash32(F.concat(col, F.lit(f"_cms{j}"))) % width).alias(f"b{j}")


def cms_build(tok: DataFrame, depth: int = 4, width: int = 64) -> DataFrame:
    """Build the sketch from a one-column token DataFrame (``t``).

    Returns ``(j, bucket, cnt)`` — at most ``depth*width`` rows.
    """
    cells = tok.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _bucket(F.col("t"), j, width).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("cell")
    ).select("cell.j", "cell.bucket")
    return cells.groupBy("j", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(
    candidates: DataFrame, sketch: DataFrame, depth: int = 4, width: int = 64
) -> DataFrame:
    """Point-estimate counts for a one-column candidate-token DataFrame.

    est(t) = min over rows j of sketch[j][h_j(t)] — the classic CMS
    upper-bound estimate. The sketch side is broadcast (bounded size).
    Returns ``(t, est)``.
    """
    melted = candidates.select(
        "t",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _bucket(F.col("t"), j, width).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("cell"),
    ).select("t", "cell.j", "cell.bucket")
    # LEFT join + coalesce: a cell the sketch never counted is 0, so an
    # unseen token estimates 0 (and a partial collision takes the min
    # over ALL depth rows, not just the nonzero ones)
    return (
        melted.join(F.broadcast(sketch), ["j", "bucket"], "left")
        .groupBy("t")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def heavy_hitters(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 10,
    depth: int = 4,
    width: int = 64,
    with_truth: bool = True,
) -> DataFrame:
    """Top-k tokens by CMS-estimated count (ties broken by token).

    ``with_truth=True`` joins the exact per-token counts so the output
    exposes the overestimate (est >= true) — an audit column a
    full-scale run would drop.
    """
    tok = docs.select(F.explode(tokens(text_col)).alias("t")).filter(
        F.length("t") > 0
    )
    sketch = cms_build(tok, depth, width)
    est = cms_estimate(tok.distinct(), sketch, depth, width)
    if with_truth:
        truth = tok.groupBy("t").agg(F.count(F.lit(1)).alias("true_cnt"))
        est = est.join(truth, "t")
    return (
        est.orderBy(F.col("est").desc(), F.col("t").asc())
        .limit(k)
        .select(F.col("t").alias("token"), "est", *(
            ["true_cnt"] if with_truth else []
        ))
    )
