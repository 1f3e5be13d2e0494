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
Other tables are copied as-is (the heavy families never touch them; they
only need to exist for load_tables).

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
from pgvector_db_spark.catalog import TABLES, table_path  # noqa: E402

REPLICAS = 10


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_derived"
    if os.path.exists(os.path.join(out, "_DERIVED_OK")):
        print(f"{out} already built")
        return
    spark = get_spark("make_sf1")
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

    for t in TABLES:
        src_path = table_path(src, t)
        dst_path = os.path.join(tmp, f"{t}.parquet")
        if t == "documents":
            df = spark.read.parquet(src_path)
            span = df.agg(F.max("doc_id")).head()[0] + 1
            replicate(df, {"doc_id": span}).write.parquet(dst_path)
        elif t == "lineitem":
            df = spark.read.parquet(src_path)
            spans = {
                c: df.agg(F.max(c)).head()[0] + 1
                for c in ("l_orderkey", "l_partkey", "l_suppkey")
            }
            replicate(df, spans).write.parquet(dst_path)
        else:
            if os.path.isdir(src_path):
                shutil.copytree(src_path, dst_path)
            else:
                shutil.copy(src_path, dst_path)
    with open(os.path.join(tmp, "_DERIVED_OK"), "w") as f:
        f.write(f"from {src} x{REPLICAS}")
    shutil.rmtree(out, ignore_errors=True)
    os.rename(tmp, out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
