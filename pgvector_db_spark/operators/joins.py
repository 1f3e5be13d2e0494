"""Temporal/interval join operators Spark lacks as built-ins.

Both are compositions of existing DataFrame ops (no Python in the plan),
per the engine's custom-operator policy: express the semantics with
shuffles that scale, never with per-key loops.

- ``asof_join`` — for each left row, the latest right row with
  ``right_ts <= left_ts`` per key (backward as-of; the feature-join every
  event/training pipeline needs). Implementation is the union-sort trick:
  tag both sides, one shuffle on the key, a single ordered window pass
  carries the last-seen right payload forward into left rows. O(n log n)
  per key partition, no range explosion, no per-key collect — at 100 TB
  this is one sort-shuffle, same cost class as a sort-merge join.

- ``range_join`` — left.point ∈ [right.lo, right.hi]. The naive plan is a
  nested-loop cross join; the scale path buckets the domain: each interval
  explodes into the bins it covers, the join runs hash-equi on the bin,
  and an exact residual filter removes false positives. Fan-out =
  interval_width / bin_width, so pick bin_width ~ typical interval width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    suffix: str = "_asof",
    direction: str = "backward",
    right_order: str | None = None,
) -> DataFrame:
    """As-of left join per ``key``: for each left row, the single nearest
    right row at-or-before its timestamp (``direction="backward"``, the
    default) or at-or-after it (``direction="forward"``). Right payload
    columns come back under their own names (suffixed on collision);
    unmatched left rows get nulls (left-join semantics). Ties (equal ts)
    match, right-first. Either direction is ONE shuffle on the key — the
    union-sort carries the latest/next right payload with a running
    ``last(ignorenulls)`` over the appropriately-ordered window.

    ``right_order`` names a right-side column used as a stable secondary
    sort among right rows sharing (key, ts): the row with the GREATEST
    ``right_order`` value wins the tie (deterministically), instead of an
    arbitrary partition-order pick. Supply it whenever right timestamps
    can collide — e.g. an event id.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    payload = [c for c in right.columns if c not in (key, right_ts)]
    rp_struct = F.struct(*[F.col(c) for c in payload])

    tb_r = (
        F.col(right_order) if right_order is not None else F.lit(0)
    ).alias("_tb")
    r = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        tb_r,
        rp_struct.alias("_rp"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
    )
    rp_type = r.schema["_rp"].dataType
    tb_type = r.schema["_tb"].dataType
    l = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(tb_type).alias("_tb"),
        F.lit(None).cast(rp_type).alias("_rp"),
        *left.columns,
    )
    # order right (side 0) before left (side 1) at equal ts so ties match;
    # among tied right rows, ascending _tb + running last ⇒ max right_order
    # wins; nulls_first keeps left rows' null _tb from outranking anything.
    # forward direction just flips the time ordering (nearest-after
    # becomes the running last over descending time)
    t_order = F.col("_t").asc() if direction == "backward" else F.col("_t").desc()
    w = (
        Window.partitionBy("_k")
        .orderBy(t_order, F.col("_side").asc(), F.col("_tb").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        l.unionByName(r)
        .withColumn("_m", F.last("_rp", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    out_cols = list(left.columns)
    renamed = [
        F.col("_m")[c].alias(c + suffix if c in left.columns else c) for c in payload
    ]
    return carried.select(*out_cols, *renamed)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: a hot ``key`` value that would funnel
    its entire partition through one task is spread across ``num_salts``
    tasks.

    Mechanics: the LEFT (large, skewed) side gets a deterministic salt
    ``xxhash64(whole row) % num_salts``; the RIGHT side is replicated
    ``num_salts`` times (explode over 0..num_salts-1); the join runs on
    ``(key, salt)`` so each hot key's rows land in ``num_salts``
    different reducers. Results are identical to the plain join — every
    left row still meets every matching right row exactly once (its own
    salt's replica). Cost: right side shuffles ``num_salts`` copies —
    use for genuinely skewed keys with a small-ish right side, after
    AQE's automatic skew split (which handles sort-merge skew for free)
    proves insufficient.

    ``how`` supports inner/left (the shapes where skew hurts).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner|left, got {how!r}")
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(num_salts)
    ).cast("int")
    l2 = left.withColumn("_salt", salt)
    r2 = right.withColumn(
        "_salt",
        F.explode(F.array(*[F.lit(i) for i in range(num_salts)])),
    )
    out = l2.join(r2, [key, "_salt"], how)
    return out.drop("_salt")


def hot_keys_by_share(
    fact: DataFrame, key: str, min_share_ppm: int = 10_000
) -> DataFrame:
    """Keys holding more than ``min_share_ppm`` millionths of the fact
    table's rows — the salt-these set the join-skew report recommends.

    Output is BOUNDED by construction: at most ``1e6 / min_share_ppm``
    keys can each hold that share, so the frame is broadcast-safe at any
    fact size (100 keys at the 1% default). One groupBy over the fact
    table; the share compare is integer cross-multiplication against the
    in-plan total — no driver collect, no float epsilon.
    """
    counts = fact.groupBy(key).agg(F.count(F.lit(1)).alias("_n"))
    total = counts.agg(F.sum("_n").alias("_t"))
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("_n") * F.lit(1_000_000) > F.col("_t") * F.lit(min_share_ppm))
        .select(key)
    )


def salted_skew_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    num_salts: int = 8,
    hot_keys: DataFrame | None = None,
    min_share_ppm: int = 10_000,
    how: str = "inner",
) -> DataFrame:
    """TARGETED salted equi-join: only the measured-hot keys are salted.

    :func:`salted_join` replicates the whole dim side ``num_salts``×,
    which is wasteful when skew is concentrated (the usual case — a few
    head keys, a long uniform tail). This variant acts on evidence, the
    action the ``rel_join_skew_report`` histogram recommends: keys whose
    fact-side row share exceeds ``min_share_ppm`` (or an explicit
    ``hot_keys`` frame, which must be broadcast-small) get their fact
    rows spread across ``num_salts`` reducers and their dim rows
    replicated ``num_salts``×; every cold key joins exactly as before
    (salt 0, no replication). Results are identical to the plain join —
    each fact row meets each matching dim row exactly once, in its own
    salt's replica.

    Scale shape (100 TB): one map-side groupBy histogram pass (partial
    aggregation makes it ~|keys| shuffle rows), a broadcast of the
    ≤1e6/min_share_ppm hot keys, then ONE shuffle on (key, salt) with no
    reducer owning more than ~share/num_salts of the fact. Dim overhead
    is num_salts copies of the HOT rows only.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_skew_join supports inner|left, got {how!r}")
    if hot_keys is None:
        hot_keys = hot_keys_by_share(fact, key, min_share_ppm)
    # distinct() guards the caller-supplied path: duplicate hot keys
    # would multiply every matching fact AND dim row via the broadcast
    # left joins below (hot_keys_by_share output is already distinct,
    # so this costs one pass over a broadcast-small frame).
    hot = (
        hot_keys.select(F.col(key)).distinct().withColumn("_hot", F.lit(True))
    )

    f2 = fact.join(F.broadcast(hot), key, "left").withColumn(
        "_salt",
        F.when(
            F.col("_hot").isNotNull(),
            F.pmod(
                F.xxhash64(*[F.col(c) for c in fact.columns]),
                F.lit(num_salts),
            ).cast("int"),
        ).otherwise(F.lit(0)),
    ).drop("_hot")
    d2 = (
        dim.join(F.broadcast(hot), key, "left")
        .withColumn(
            "_salts",
            F.when(
                F.col("_hot").isNotNull(),
                F.sequence(F.lit(0), F.lit(num_salts - 1)),
            ).otherwise(F.array(F.lit(0))),
        )
        .withColumn("_salt_l", F.explode("_salts"))
        .withColumn("_salt", F.col("_salt_l").cast("int"))
        .drop("_hot", "_salts", "_salt_l")
    )
    return f2.join(d2, [key, "_salt"], how).drop("_salt")


def range_join(
    left: DataFrame,
    right: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
) -> DataFrame:
    """Interval containment join via domain bucketing + residual filter.

    Inner join: every (left, right) pair with
    ``right.lo <= left.point <= right.hi``. Both bounds inclusive.
    """
    lbin = F.floor(F.col(point_col) / bin_width).cast("long")
    rbins = F.sequence(
        F.floor(F.col(lo_col) / bin_width).cast("long"),
        F.floor(F.col(hi_col) / bin_width).cast("long"),
    )
    l2 = left.withColumn("_bin", lbin)
    r2 = right.withColumn("_bin", F.explode(rbins))
    return (
        l2.join(r2, "_bin")
        .filter(
            (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) <= F.col(hi_col))
        )
        .drop("_bin")
    )
