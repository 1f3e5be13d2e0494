"""Measured A/B: Spark's own AQE skew-join split vs the manual targeted
salt (operators/joins.salted_skew_join) on the same skewed sort-merge
join — the evidence behind the decision rule in docs/SCALE_AUDIT.md
(r9 VERDICT item #7: the 100 TB operator needs to know which tool to
reach for, from measurement, not folklore).

Fixture: the rel_salted_skew_join shape at the sf1 replica — lineitem
with every l_suppkey % 4 == 0 remapped to supplier 1 (~30% of the fact
on one key), joined to supplier. Broadcast is disabled
(autoBroadcastJoinThreshold=-1) so the join is a sort-merge join —
the regime where AQE's OptimizeSkewedJoin applies and where a 100 TB
fact x large-dim join actually lives (a broadcastable dim needs
neither tool). AQE skew thresholds are scaled to the local fixture
(256 MB defaults would never trigger on MBs of parquet; at cluster
scale the defaults play the same role).

Three arms, N reps each, median wall-time of the identical aggregate:
  plain       AQE on, skewJoin OFF  — the baseline a naive plan gets
  aqe_skew    AQE on, skewJoin ON (scaled thresholds) — Spark's fix
  manual_salt AQE on, skewJoin OFF + salted_skew_join — the engine's

Also verifies all three arms return the identical aggregate and
reports whether the AQE arm's final plan actually split (skew=true in
the executed SortMergeJoin).

Usage: python tools/skew_ab.py [sf_dir] [reps]
  defaults: /tmp/sf1_derived (falls back to /root/testdata/sf0.1), 3
"""

from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from pgvector_db_spark import get_spark, load_tables  # noqa: E402
from pgvector_db_spark.operators.joins import salted_skew_join  # noqa: E402


def _fixture(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    fact = t["lineitem"].select(
        F.when(F.col("l_suppkey") % 4 == 0, F.lit(1))
        .otherwise(F.col("l_suppkey"))
        .alias("skew_key"),
        "l_extendedprice",
        "l_discount",
    )
    dim = t["supplier"].select(
        F.col("s_suppkey").alias("skew_key"), "s_nationkey"
    )
    return fact, dim


def _agg(joined):
    revenue = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
    ).cast("decimal(18,6)")
    return joined.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(revenue).alias("rev"),
    )


def _run(df, reps):
    df.collect()  # warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        rows = df.collect()
        times.append(time.perf_counter() - t0)
    return statistics.median(times), sorted(map(tuple, rows))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else (
        "/tmp/sf1_derived"
        if os.path.exists("/tmp/sf1_derived/_DERIVED_OK")
        else "/root/testdata/sf0.1"
    )
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("skew_ab")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    fact, dim = _fixture(spark, sf_dir)

    def set_skew(on: bool):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(on).lower())
        # scale the 256MB/5x defaults down to the local fixture so the
        # optimization can actually fire (same role as defaults at PB)
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "1MB",
        )
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB"
        )

    results = {}

    set_skew(False)
    results["plain"], rows_plain = _run(_agg(fact.join(dim, "skew_key")), reps)

    set_skew(True)
    df_aqe = _agg(fact.join(dim, "skew_key"))
    results["aqe_skew"], rows_aqe = _run(df_aqe, reps)
    plan = df_aqe._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df_aqe._jdf.queryExecution(), "formatted"
    )
    aqe_split = "skew=true" in plan

    set_skew(False)
    results["manual_salt"], rows_salt = _run(
        _agg(salted_skew_join(fact, dim, "skew_key", num_salts=8)), reps
    )

    same = rows_plain == rows_aqe == rows_salt
    print(f"sf_dir={sf_dir} reps={reps}")
    for k, v in results.items():
        print(f"{k}: {round(v * 1000, 1)} ms")
    print(f"aqe_plan_split={aqe_split} identical_results={same}")


if __name__ == "__main__":
    main()
