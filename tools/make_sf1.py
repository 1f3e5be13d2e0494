"""Derive a 10x-scale fixture (sf1 ≈ 6M lineitem rows) from the
driver-provided sf0.1 parquet, for SCALING MEASUREMENT ONLY (r4 verdict
item #5: extend the scale curve one more decade for the heaviest
families). Never used for correctness gates — oracles always run against
the driver's own testdata.

Replication shifts every key so the data actually GROWS instead of
collapsing under dedup/distinct:
  documents: doc_id shifted per replica (text reused — per-row kernel
             cost is what the curve measures)
  lineitem:  l_orderkey / l_partkey / l_suppkey shifted per replica, so
             baskets, window partitions, and the part<->supplier graph
             all scale 10x in entity count, not in per-key multiplicity
  orders:    o_orderkey shifted with the SAME span as l_orderkey (the
             spans are unified over both tables), so orders⋈lineitem
             joins still hit across replicas — r12: orders-bound rows
             (snapshot lifecycle, medians, IVM) previously measured a
             verbatim copy at "sf1", a silently-flat cell
  events:    event_id and user_id shifted per replica — per-user
             windows and distribution tests scale in entity count
  embeddings: vec_id shifted per replica AND (replica > 0) every
             component perturbed by a deterministic hash-seeded delta
             (±1.5%-of-range, xxhash64(vec_id, position)) — r12 verdict
             item #6: a verbatim copy would make every replica a
             distance-0 duplicate of replica 0, collapsing kNN top-k
             and dedup structure instead of scaling it; the small
             perturbation keeps the label-cluster geometry (IVF/
             SemDeDup fixtures stay meaningful) while every vector is
             distinct. Replica 0 is byte-identical to sf0.1, so
             fixed-query entries (vec_id = 0) probe the same vector.
Other tables (dims) are copied as-is.

Usage: python tools/make_sf1.py [src_sf_dir] [out_dir]
  defaults: /root/testdata/sf0.1 -> /tmp/sf1_derived
"""

from __future__ import annotations

import os
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pgvector_db_spark import get_spark  # noqa: E402
from pgvector_db_spark.catalog import TABLES, read_table, table_path  # noqa: E402

REPLICAS = 10
# bump when the replication recipe changes: a fixture built by an older
# recipe must be rebuilt, not silently reused
RECIPE = "v3(orders,events scaled; shared orderkey span; embeddings perturbed)"


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_derived"
    marker = os.path.join(out, "_DERIVED_OK")
    expected = f"from {src} x{REPLICAS} {RECIPE}"
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read() == expected:
                print(f"{out} already built")
                return
        print(f"{out} built by an older recipe — rebuilding")
    spark = get_spark("make_sf1")
    # write micros, not INT96: pyarrow reads INT96 as timestamp[ns],
    # which would trip read_table's nanos-as-long branch on the
    # REWRITTEN files and break every sf1 read of orders/events
    spark.conf.set(
        "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
    )
    tmp = out + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)

    from pyspark.sql import functions as F

    def replicate(df, shifts: dict[str, int]):
        parts = []
        for i in range(REPLICAS):
            d = df
            for col, span in shifts.items():
                d = d.withColumn(col, F.col(col) + F.lit(i * span))
            parts.append(d)
        r = parts[0]
        for p in parts[1:]:
            r = r.unionByName(p)
        return r

    # one span per KEY FAMILY, unified over every table carrying it —
    # orders⋈lineitem joins must keep hitting across replicas
    # read_table, not raw parquet: orders/events carry TIMESTAMP(NANOS)
    # columns that must be normalized to micros before the rewrite
    li = read_table(spark, src, "lineitem")
    od = read_table(spark, src, "orders")
    okspan = (
        max(
            li.agg(F.max("l_orderkey")).head()[0],
            od.agg(F.max("o_orderkey")).head()[0],
        )
        + 1
    )

    for t in TABLES:
        src_path = table_path(src, t)
        dst_path = os.path.join(tmp, f"{t}.parquet")
        if t == "documents":
            df = read_table(spark, src, t)
            span = df.agg(F.max("doc_id")).head()[0] + 1
            replicate(df, {"doc_id": span}).write.parquet(dst_path)
        elif t == "lineitem":
            spans = {
                c: li.agg(F.max(c)).head()[0] + 1
                for c in ("l_partkey", "l_suppkey")
            }
            spans["l_orderkey"] = okspan
            replicate(li, spans).write.parquet(dst_path)
        elif t == "orders":
            replicate(od, {"o_orderkey": okspan}).write.parquet(dst_path)
        elif t == "events":
            df = read_table(spark, src, t)
            spans = {
                c: df.agg(F.max(c)).head()[0] + 1
                for c in ("event_id", "user_id")
            }
            replicate(df, spans).write.parquet(dst_path)
        elif t == "embeddings":
            df = read_table(spark, src, t)
            span = df.agg(F.max("vec_id")).head()[0] + 1
            parts = [df]  # replica 0: byte-identical vectors
            for i in range(1, REPLICAS):
                shifted = df.withColumn(
                    "vec_id", F.col("vec_id") + F.lit(i * span)
                )
                # deterministic per-(vec_id, position) delta in
                # [-0.015, 0.015): hash-seeded, so the fixture is
                # reproducible bit-for-bit and no replica collapses to
                # a distance-0 duplicate of another
                def _perturb(x, j):
                    h = F.pmod(
                        F.xxhash64(F.col("vec_id"), j), F.lit(30000)
                    )
                    return (
                        x.cast("double")
                        + (h.cast("double") / F.lit(1000.0) - F.lit(15.0))
                        / F.lit(1000.0)
                    ).cast("float")

                parts.append(
                    shifted.withColumn(
                        "embedding",
                        F.transform("embedding", _perturb),
                    )
                )
            r = parts[0]
            for p in parts[1:]:
                r = r.unionByName(p)
            r.write.parquet(dst_path)
        else:
            if os.path.isdir(src_path):
                shutil.copytree(src_path, dst_path)
            else:
                shutil.copy(src_path, dst_path)
    with open(os.path.join(tmp, "_DERIVED_OK"), "w") as f:
        f.write(f"from {src} x{REPLICAS} {RECIPE}")
    shutil.rmtree(out, ignore_errors=True)
    os.rename(tmp, out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
