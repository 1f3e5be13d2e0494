"""Distributed exact statistics over unbounded samples.

``ks_two_sample``: the two-sample Kolmogorov-Smirnov statistic,
D = sup_x |F1(x) - F2(x)|, computed EXACTLY in integer arithmetic:
with i(x), j(x) the cumulative counts of each sample at pooled point x,

    D = max |i*n2 - j*n1| / (n1*n2)

so the numerator ``d_num = max |i*n2 - j*n1|`` is an exact BIGINT and
the only float is one final correctly-rounded division — cross-engine
hashable on the micro grid.

Scale shape (the packing.py two-pass prefix-sum pattern, NOT a global
window): the cumulative counts need a total order over distinct values,
which a single-partition window would serialize. Instead:

1. ``groupBy(value)`` → per-value counts per sample (one shuffle; the
   frame shrinks to |distinct values|);
2. ``repartitionByRange(value)`` + per-PARTITION cumulative window
   (parallel; each partition sorts locally);
3. per-partition totals collected to the driver (bounded: one row per
   partition), prefix-folded into offsets, broadcast back as a literal
   map — each partition's local cumsum + its offset is the global
   cumulative count.

At 100 TB the only data-sized shuffles are the groupBy and the range
exchange; the driver sees ``partitions`` rows, never values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pgvector_db_spark.utils import local_rows_df


def _global_cums(
    df: DataFrame,
    value_col: str,
    group_col: str,
    g1,
    g2,
    partitions: int,
    caller: str,
):
    """Shared distributed machinery for order statistics over two
    samples: per-distinct-value counts ``(v, c1, c2)`` with GLOBAL
    inclusive cumulative counts ``(i, j)`` attached via the two-pass
    prefix sum. Returns ``(frame, n1, n2)``; raises on an empty side."""
    s = df.filter(
        F.col(group_col).isin([g1, g2]) & F.col(value_col).isNotNull()
    ).select(
        F.col(value_col).alias("v"),
        F.when(F.col(group_col) == g1, F.lit(1))
        .otherwise(F.lit(2))
        .alias("t"),
    )
    g = s.groupBy("v").agg(
        F.sum(F.when(F.col("t") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("c1"),
        F.sum(F.when(F.col("t") == 2, 1).otherwise(0))
        .cast("bigint")
        .alias("c2"),
    )
    ranged = g.repartitionByRange(partitions, F.col("v"))
    w = (
        Window.partitionBy("_pid")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = (
        ranged.withColumn("_pid", F.spark_partition_id())
        .withColumn("_l1", F.sum("c1").over(w))
        .withColumn("_l2", F.sum("c2").over(w))
    )
    # materialize once so the totals collect and the final aggregate see
    # the SAME pid assignment (AQE may otherwise re-plan the exchange);
    # localCheckpoint over persist per the r7 dsir measurement
    local = local.localCheckpoint(eager=True)
    totals = {
        int(r["_pid"]): (int(r["t1"]), int(r["t2"]))
        for r in local.groupBy("_pid")
        .agg(F.sum("c1").alias("t1"), F.sum("c2").alias("t2"))
        .collect()
    }
    off, a1, a2 = {}, 0, 0
    for p in sorted(totals):
        off[p] = (a1, a2)
        a1 += totals[p][0]
        a2 += totals[p][1]
    n1, n2 = a1, a2
    if n1 == 0 or n2 == 0:
        raise ValueError(
            f"{caller}: empty sample (n1={n1}, n2={n2}) for groups "
            f"{g1!r}/{g2!r}"
        )
    omap1 = F.create_map(
        *[F.lit(x) for p, (o1, _) in off.items() for x in (p, o1)]
    )
    omap2 = F.create_map(
        *[F.lit(x) for p, (_, o2) in off.items() for x in (p, o2)]
    )
    cums = local.select(
        "v",
        "c1",
        "c2",
        (F.col("_l1") + omap1[F.col("_pid")]).alias("i"),
        (F.col("_l2") + omap2[F.col("_pid")]).alias("j"),
    )
    return cums, n1, n2


def ks_two_sample(
    df: DataFrame,
    value_col: str,
    group_col: str,
    g1,
    g2,
    partitions: int = 32,
) -> DataFrame:
    """One-row frame ``(n1, n2, d_num, d_micro)`` — all BIGINT — for
    the two-sample KS statistic between ``group_col == g1`` and
    ``group_col == g2`` over ``value_col``."""
    cums, n1, n2 = _global_cums(
        df, value_col, group_col, g1, g2, partitions, "ks_two_sample"
    )
    diff = F.abs(F.col("i") * F.lit(n2) - F.col("j") * F.lit(n1))
    out = cums.agg(F.max(diff).cast("bigint").alias("d_num"))
    return _ks_result(out, n1, n2)


def mann_whitney_u(
    df: DataFrame,
    value_col: str,
    group_col: str,
    g1,
    g2,
    partitions: int = 32,
) -> DataFrame:
    """Two-sample Mann-Whitney U (rank-sum) with exact tie handling:
    every sample-1 member of the tie block at value v has midrank
    ``before + (t+1)/2`` (before = count of strictly smaller values,
    t = block size), so ``2·R1 = Σ c1·(2·before + t + 1)`` is a pure
    BIGINT and ``2·U1 = 2·R1 − n1·(n1+1)`` is exact. One-row output
    ``(n1, n2, two_u1, auc_micro)`` — all BIGINT; ``auc_micro`` is the
    common-language effect size U1/(n1·n2) on the 1e-6 grid (one
    correctly-rounded division of exact integers, identical spelling
    in the oracle). Same distributed shape as :func:`ks_two_sample`."""
    cums, n1, n2 = _global_cums(
        df, value_col, group_col, g1, g2, partitions, "mann_whitney_u"
    )
    before = (F.col("i") - F.col("c1")) + (F.col("j") - F.col("c2"))
    contrib = F.col("c1") * (
        F.lit(2) * before + (F.col("c1") + F.col("c2")) + F.lit(1)
    )
    two_r1 = cums.agg(F.sum(contrib).cast("bigint").alias("two_r1"))
    return two_r1.select(
        F.lit(n1).cast("bigint").alias("n1"),
        F.lit(n2).cast("bigint").alias("n2"),
        (F.col("two_r1") - F.lit(n1 * (n1 + 1)))
        .cast("bigint")
        .alias("two_u1"),
        F.floor(
            (F.col("two_r1") - F.lit(n1 * (n1 + 1))).cast("double")
            / F.lit(2.0 * float(n1) * float(n2))
            * F.lit(1000000.0)
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("auc_micro"),
    )


def _ks_result(d_num_frame: DataFrame, n1: int, n2: int) -> DataFrame:
    """The ONE spelling of the (n1, n2, d_num, d_micro) result row,
    shared by raw-sample and binned KS so the micro-grid division
    cannot drift between them (matches the oracle's
    CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) product order)."""
    return d_num_frame.select(
        F.lit(n1).cast("bigint").alias("n1"),
        F.lit(n2).cast("bigint").alias("n2"),
        "d_num",
        F.floor(
            F.col("d_num").cast("double")
            / F.lit(float(n1) * float(n2))
            * F.lit(1000000.0)
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("d_micro"),
    )


def binned_ks(
    hist: DataFrame,
    bin_col: str = "bin",
    c1_col: str = "c1",
    c2_col: str = "c2",
) -> DataFrame:
    """KS statistic over a pre-binned pair of histograms: ``hist`` has
    one row per bin with both samples' counts. The cumulative window
    here IS a single global sort — over the BOUNDED bin frame (|bins|
    rows by construction), not the samples, so the single-partition
    shape is correct; raw samples must go through
    :func:`ks_two_sample`'s two-pass form instead."""
    tot = hist.agg(
        F.sum(c1_col).alias("t1"), F.sum(c2_col).alias("t2")
    ).first()
    n1 = int(tot["t1"] or 0)
    n2 = int(tot["t2"] or 0)
    if n1 == 0 or n2 == 0:
        raise ValueError(
            f"binned_ks: empty sample (n1={n1}, n2={n2})"
        )
    w = Window.orderBy(bin_col).rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        F.sum(c1_col).over(w).cast("bigint").alias("i"),
        F.sum(c2_col).over(w).cast("bigint").alias("j"),
    )
    diff = F.abs(F.col("i") * F.lit(n2) - F.col("j") * F.lit(n1))
    out = cum.agg(F.max(diff).cast("bigint").alias("d_num"))
    return _ks_result(out, n1, n2)


def mann_whitney_oracle_sql(
    value_expr: str, group_expr: str, g1_lit: str, g2_lit: str, frm: str
) -> str:
    """DuckDB oracle for :func:`mann_whitney_u` — same integer 2·R1
    fold over a plain cumulative window; the auc_micro division uses
    the identical left-associated (2·n1)·n2 double product."""
    return f"""
    WITH s AS (
      SELECT {value_expr} AS v,
             CASE WHEN {group_expr} = {g1_lit} THEN 1 ELSE 2 END AS t
      {frm} AND {group_expr} IN ({g1_lit}, {g2_lit})
    ),
    g AS (
      SELECT v,
             CAST(SUM(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN t = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2
      FROM s GROUP BY v
    ),
    c AS (
      SELECT c1, c2,
             CAST(SUM(c1) OVER (ORDER BY v) AS BIGINT) AS i,
             CAST(SUM(c2) OVER (ORDER BY v) AS BIGINT) AS j
      FROM g
    ),
    n AS (
      SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
      FROM g
    ),
    r AS (
      SELECT CAST(SUM(c1 * (2 * ((i - c1) + (j - c2)) + (c1 + c2) + 1))
                  AS BIGINT) AS two_r1
      FROM c
    )
    SELECT n.n1, n.n2,
           CAST(r.two_r1 - n.n1 * (n.n1 + 1) AS BIGINT) AS two_u1,
           CAST(floor(CAST(r.two_r1 - n.n1 * (n.n1 + 1) AS DOUBLE)
                / (CAST(2.0 AS DOUBLE) * CAST(n.n1 AS DOUBLE)
                   * CAST(n.n2 AS DOUBLE))
                * CAST(1000000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE))
             AS BIGINT) AS auc_micro
    FROM r CROSS JOIN n
    """


def ks_two_sample_oracle_sql(
    value_expr: str, group_expr: str, g1_lit: str, g2_lit: str, frm: str
) -> str:
    """DuckDB oracle: the same integer KS numerator via a plain
    cumulative window over distinct values (the oracle runs at audit
    scale; the Spark side owns the distributed shape). ``d_micro``
    divides the same two exact integers and lands on the same grid —
    note the double product n1*n2 (not integer-multiply-then-convert)
    to match the Spark spelling ``float(n1) * float(n2)``."""
    return f"""
    WITH s AS (
      SELECT {value_expr} AS v,
             CASE WHEN {group_expr} = {g1_lit} THEN 1 ELSE 2 END AS t
      {frm} AND {group_expr} IN ({g1_lit}, {g2_lit})
    ),
    g AS (
      SELECT v,
             CAST(SUM(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN t = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2
      FROM s GROUP BY v
    ),
    c AS (
      SELECT CAST(SUM(c1) OVER (ORDER BY v) AS BIGINT) AS i,
             CAST(SUM(c2) OVER (ORDER BY v) AS BIGINT) AS j
      FROM g
    ),
    n AS (
      SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
      FROM g
    )
    SELECT n.n1, n.n2,
           CAST(MAX(abs(c.i * n.n2 - c.j * n.n1)) AS BIGINT) AS d_num,
           CAST(floor(CAST(MAX(abs(c.i * n.n2 - c.j * n.n1)) AS DOUBLE)
                / (CAST(n.n1 AS DOUBLE) * CAST(n.n2 AS DOUBLE))
                * CAST(1000000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE))
             AS BIGINT) AS d_micro
    FROM c CROSS JOIN n GROUP BY n.n1, n.n2
    """


def roc_curve_points(
    df: DataFrame,
    value_col: str,
    group_col: str,
    neg,
    pos,
    deciles: int = 9,
    partitions: int = 32,
) -> DataFrame:
    """Exact classifier operating points — the ROC/PR curve sampled at
    the pooled score deciles. Treating ``group_col == pos`` as the
    positive class and ``value_col`` as the classifier score, each
    decile q picks the smallest score v whose pooled inclusive
    cumulative count reaches q/10 of the sample (an integer
    cross-multiplied rank compare — no ceil, no float rank), and the
    confusion matrix for "predict positive when score > v" falls
    straight out of the global cumulative counts:
    TP = n2 − j(v), FP = n1 − i(v), TN = i(v), FN = j(v).

    All counts are exact BIGINTs from the same two-pass distributed
    machinery as KS/Mann-Whitney (``_global_cums`` — never a global
    window over samples); the rate columns are one correctly-rounded
    division each onto the 1e-6 grid. Returns ``deciles`` rows:
    (q, thr, tp, fp, tn, fn, tpr_micro, fpr_micro, precision_micro).
    """
    cums, n1, n2 = _global_cums(
        df, value_col, group_col, neg, pos, partitions, "roc_curve_points"
    )
    spark = df.sparkSession
    qdf = spark.range(1, deciles + 1).select(
        F.col("id").cast("int").alias("q")
    )
    n = n1 + n2
    pick = (
        qdf.crossJoin(cums.select("v", "i", "j"))
        .filter(
            (F.col("i") + F.col("j")) * F.lit(deciles + 1)
            >= F.col("q") * F.lit(n)
        )
        .groupBy("q")
        .agg(F.min("v").alias("thr"))
    )
    pts = pick.join(
        cums.select(F.col("v").alias("thr"), "i", "j"), "thr"
    )
    tp = (F.lit(n2) - F.col("j")).cast("bigint")
    fp = (F.lit(n1) - F.col("i")).cast("bigint")
    half, mil = F.lit(0.5), F.lit(1000000.0)
    rate = lambda num, den: F.floor(
        num.cast("double") / den * mil + half
    ).cast("bigint")
    return pts.select(
        "q",
        "thr",
        tp.alias("tp"),
        fp.alias("fp"),
        F.col("i").cast("bigint").alias("tn"),
        F.col("j").cast("bigint").alias("fn"),
        rate(tp, F.lit(float(n2))).alias("tpr_micro"),
        rate(fp, F.lit(float(n1))).alias("fpr_micro"),
        F.when(tp + fp == 0, F.lit(0))
        .otherwise(rate(tp, (tp + fp).cast("double")))
        .cast("bigint")
        .alias("precision_micro"),
    ).orderBy("q")


def roc_points_oracle_sql(
    value_expr: str,
    group_expr: str,
    neg_lit: str,
    pos_lit: str,
    frm: str,
    deciles: int = 9,
) -> str:
    """DuckDB oracle for :func:`roc_curve_points` — plain cumulative
    windows at audit scale, the same integer rank compare and the same
    grid spellings."""
    qvals = ", ".join(f"({q})" for q in range(1, deciles + 1))
    return f"""
    WITH s AS (
      SELECT {value_expr} AS v,
             CASE WHEN {group_expr} = {neg_lit} THEN 1 ELSE 2 END AS t
      {frm} AND {group_expr} IN ({neg_lit}, {pos_lit})
    ),
    g AS (
      SELECT v,
             CAST(SUM(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN t = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2
      FROM s GROUP BY v
    ),
    c AS (
      SELECT v,
             CAST(SUM(c1) OVER (ORDER BY v) AS BIGINT) AS i,
             CAST(SUM(c2) OVER (ORDER BY v) AS BIGINT) AS j
      FROM g
    ),
    n AS (
      SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
      FROM g
    ),
    q(q) AS (VALUES {qvals}),
    pick AS (
      SELECT q.q, MIN(c.v) AS thr
      FROM q CROSS JOIN n
      JOIN c ON (c.i + c.j) * {deciles + 1} >= q.q * (n.n1 + n.n2)
      GROUP BY q.q
    ),
    pts AS (
      SELECT p.q, p.thr, n.n1, n.n2, c.i, c.j
      FROM pick p JOIN c ON c.v = p.thr CROSS JOIN n
    )
    SELECT CAST(q AS INT) AS q, thr,
           CAST(n2 - j AS BIGINT) AS tp,
           CAST(n1 - i AS BIGINT) AS fp,
           CAST(i AS BIGINT) AS tn,
           CAST(j AS BIGINT) AS fn,
           CAST(floor(CAST(n2 - j AS DOUBLE) / CAST(n2 AS DOUBLE)
                * CAST(1000000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE))
             AS BIGINT) AS tpr_micro,
           CAST(floor(CAST(n1 - i AS DOUBLE) / CAST(n1 AS DOUBLE)
                * CAST(1000000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE))
             AS BIGINT) AS fpr_micro,
           CASE WHEN (n2 - j) + (n1 - i) = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST(floor(CAST(n2 - j AS DOUBLE)
                     / CAST((n2 - j) + (n1 - i) AS DOUBLE)
                     * CAST(1000000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE))
                  AS BIGINT) END AS precision_micro
    FROM pts ORDER BY q
    """


def exact_rank_select(
    df: DataFrame,
    cents_col: str,
    rank_of_n,
    bucket_width: int = 1 << 16,
    raw_range=None,
) -> tuple[int, list[int]]:
    """EXACT order statistics without a global sort — the two-pass
    distributed selection a 100 TB exact-median needs.

    Pass 1: one map-side-combined groupBy over ``floor(value /
    bucket_width)`` (floor, not truncate-toward-zero, so negative
    values land in the bucket the pass-2 range scan expects)
    (the histogram is |domain|/bucket_width rows — bounded, collected).
    The driver walks the cumulative counts to locate, for each requested
    rank, its bucket and within-bucket residual rank. Pass 2 (per rank):
    scan ONLY that bucket and take the residual-rank-th smallest inside
    it (TakeOrderedAndProject over a bucket-sized frame). When the
    selection column is stored, the bucket range pushes into the scan;
    for a DERIVED grid (e.g. price cents) the caller should pre-filter
    the equivalent raw-column range so pruning reaches parquet (the
    registry query does). Total cost: one full scan + one pruned scan
    per rank; a global sort-based quantile would shuffle the table.

    ``rank_of_n``: callable(s) mapping the total row count n to the
    1-based rank(s) wanted (e.g. lower median = (n + 1) // 2). Returns
    ``(n, values)`` — the total count and the exact value at each rank,
    in ``rank_of_n`` order.
    ``raw_range``: optional callable (lo_cents, hi_cents) -> Column — a
    conservative predicate over the RAW stored column(s) implying the
    bucket range, applied first in pass 2 so pruning reaches the
    parquet scan even though the grid column is derived.
    Driver-side state is bounded by the histogram, never the data.
    """
    col = F.col(cents_col)
    hist = (
        df.select(F.floor(col / F.lit(bucket_width)).cast("bigint").alias("_b"))
        .groupBy("_b")
        .agg(F.count(F.lit(1)).alias("_n"))
        .orderBy("_b")
        .collect()
    )
    n = sum(int(r["_n"]) for r in hist)
    fns = rank_of_n if isinstance(rank_of_n, (list, tuple)) else [rank_of_n]
    out: list[int] = []
    for fn in fns:
        k = int(fn(n))
        if not 1 <= k <= n:
            raise ValueError(f"rank {k} outside 1..{n}")
        cum = 0
        bucket = resid = None
        for r in hist:
            if cum + int(r["_n"]) >= k:
                bucket, resid = int(r["_b"]), k - cum
                break
            cum += int(r["_n"])
        lo, hi = bucket * bucket_width, (bucket + 1) * bucket_width
        base = df.filter(raw_range(lo, hi)) if raw_range is not None else df
        inb = base.select(col.alias("_c")).filter(
            (F.col("_c") >= lo) & (F.col("_c") < hi)
        )
        # k-th smallest of the bucket: TakeOrderedAndProject(resid) then
        # the max of that bounded frame — no global sort anywhere
        row = (
            inb.orderBy("_c").limit(resid).agg(F.max("_c").alias("_v"))
        ).head()
        out.append(int(row["_v"]))
    return n, out


def grouped_exact_rank_select(
    df: DataFrame,
    group_col: str,
    cents_col: str,
    rank_of_n,
    bucket_width: int = 1 << 16,
    raw_range=None,
) -> DataFrame:
    """:func:`exact_rank_select` PER GROUP, still two passes TOTAL (not
    two per group): one (group, bucket) histogram pass — bounded by
    |groups| x |buckets| rows, collected — locates every group's target
    bucket and residual rank driver-side; ONE second pass restricted to
    the UNION of all (group, bucket) targets (a broadcast semi-join
    into the scan, plus the caller's raw-range predicate for parquet
    pruning) ranks within each group's bucket and picks the residual
    rank. A sort-based per-group quantile would shuffle the whole table
    on the group key; this shuffles only the target-bucket rows.

    Returns a DataFrame (group, n_rows, value) — one row per group.
    """
    spark = df.sparkSession
    g, col = F.col(group_col), F.col(cents_col)
    hist = (
        df.select(
            g.alias("_g"),
            F.floor(col / F.lit(bucket_width)).cast("bigint").alias("_b"),
        )
        .groupBy("_g", "_b")
        .agg(F.count(F.lit(1)).alias("_n"))
        .collect()
    )
    from collections import defaultdict

    per_group = defaultdict(list)
    for r in hist:
        per_group[r["_g"]].append((int(r["_b"]), int(r["_n"])))
    targets = []  # (group, bucket, resid, n)
    lo_all, hi_all = None, None
    for grp, buckets in per_group.items():
        buckets.sort()
        n = sum(c for _, c in buckets)
        k = int(rank_of_n(n))
        cum = 0
        for b, c in buckets:
            if cum + c >= k:
                targets.append((grp, b, k - cum, n))
                lo, hi = b * bucket_width, (b + 1) * bucket_width
                lo_all = lo if lo_all is None else min(lo_all, lo)
                hi_all = hi if hi_all is None else max(hi_all, hi)
                break
            cum += c
    from pyspark.sql.types import LongType, StructField, StructType

    tgt = local_rows_df(
        spark,
        [(t[0], t[1], t[2], t[3]) for t in targets],
        StructType(
            [
                StructField(group_col, df.schema[group_col].dataType),
                StructField("_b", LongType()),
                StructField("_resid", LongType()),
                StructField("_n", LongType()),
            ]
        ),
    )
    base = (
        df.filter(raw_range(lo_all, hi_all)) if raw_range is not None else df
    )
    from pyspark.sql.window import Window

    inb = (
        base.select(
            g.alias(group_col),
            col.alias("_c"),
            F.floor(col / F.lit(bucket_width)).cast("bigint").alias("_b"),
        )
        .join(F.broadcast(tgt), [group_col, "_b"])
        .withColumn(
            "_rk",
            F.row_number().over(
                Window.partitionBy(group_col).orderBy(F.asc("_c"))
            ),
        )
        .filter(F.col("_rk") == F.col("_resid"))
    )
    return inb.select(
        F.col(group_col),
        F.col("_n").cast("bigint").alias("n_rows"),
        F.col("_c").cast("bigint").alias("value"),
    )
