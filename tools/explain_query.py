"""Dump the physical plan of any registered query.

Usage: python tools/explain_query.py <query_name> [sf_dir] [mode]

mode: formatted (default) | extended | cost | codegen
Useful for verifying the scale properties the docs claim: pushed
filters, partition pruning, broadcast joins, WindowGroupLimit,
TakeOrderedAndProject, WholeStageCodegen spans.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pgvector_db_spark import get_spark  # noqa: E402
from pgvector_db_spark.queries import REGISTRY  # noqa: E402


def main() -> int:
    if len(sys.argv) < 2 or sys.argv[1] not in REGISTRY:
        names = " ".join(sorted(REGISTRY))
        print(f"usage: explain_query.py <name> [sf_dir] [mode]\nnames: {names}")
        return 1
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    mode = sys.argv[3] if len(sys.argv) > 3 else "formatted"
    spark = get_spark("explain")
    REGISTRY[name].spark_fn(spark, sf_dir).explain(mode)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
