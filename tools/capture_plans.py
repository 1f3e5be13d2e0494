"""Capture .explain('formatted') for a list of registered queries into
plans/$SPARK_GRAFT_PLAN_DIR/<name>_<suffix>.txt (default plans/r13) —
the optimization-round evidence files.

Usage: python tools/capture_plans.py <suffix> [sf_dir] [name ...]
Defaults to the round-13 optimization target set.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pgvector_db_spark import get_spark  # noqa: E402
from pgvector_db_spark.queries import REGISTRY  # noqa: E402

DEFAULT = [
    "ds_bpe_train_merges",
    "ds_bpe_encode_corpus",
    "ds_prefix_filter_jaccard_join",
    "ds_prefix_filter_dedup_survivors",
    "ds_pagerank_partsupp",
    "vs_ivf_autoprobe",
    "ds_bm25_search",
    "ds_bm25_index_search",
    "vs_hybrid_rrf_search",
    "vs_mmr_diversity_rerank",
    "rel_salted_skew_join",
    "vs_knn_topk",
    "vs_query_by_example",
    "vs_knn_per_label",
    "rel_pricing_summary",
    "rel_revenue_by_nation",
    "rel_window_top2_lineitems",
    "rel_events_window_5min",
    "ds_exact_dedup",
    "ds_embed_fake",
    "rel_kcore_parts",
    "ds_dsir_importance",
]


def main() -> int:
    suffix = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:] or DEFAULT
    spark = get_spark("capture_plans")
    import os
    outdir = (
        Path(__file__).resolve().parent.parent
        / "plans"
        / os.environ.get("SPARK_GRAFT_PLAN_DIR", "r13")
    )
    outdir.mkdir(parents=True, exist_ok=True)
    for name in names:
        try:
            df = REGISTRY[name].spark_fn(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            txt = f"ERROR capturing {name}: {exc}\n"
        (outdir / f"{name}_{suffix}.txt").write_text(txt)
        print(f"captured {name} ({len(txt)} chars)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
