"""Dump formatted physical plans for the headline + scale-critical
queries into docs/PLANS.md — fresh, reproducible plan evidence behind
the curated analysis in docs/SCALE_AUDIT.md.

Two capture modes in one run:

- STATIC plans for every name in AUDITED (`isFinalPlan=false` — the
  pre-execution shape Catalyst chose);
- FINAL ADAPTIVE plans for the headline/bench suite in FINAL_AUDITED:
  the query is EXECUTED first, then re-explained, so the captured
  `AdaptiveSparkPlan isFinalPlan=true` shows the broadcast/skew/
  coalesce decisions AQE actually made at runtime — at 100 TB those
  runtime choices ARE the plan (r9 VERDICT item #3).

Usage: python tools/plan_audit.py [sf_dir]   (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pgvector_db_spark import get_spark  # noqa: E402
from pgvector_db_spark.queries import REGISTRY  # noqa: E402

AUDITED = [
    "vs_knn_topk",
    "rel_revenue_by_nation",
    "rel_cobucketed_join_revenue",
    "rel_window_top2_lineitems",
    "vs_ivf_knn",
    "vs_ivf_knn_batch_dist_fullprobe",
    "ds_bm25_index_search",
    "ds_lsh_near_dup_pairs",
    "ds_bloom_decontaminate",
    "rel_salted_join_events",
    "vs_maxsim_topk",
    "ds_substring_dup_rate",
    "ds_seeded_shard_shuffle",
    "ds_bpe_pair_counts",
    "ds_hard_negative_mining",
    "ds_quality_percentile_filter",
    "ds_pagerank_partsupp",
    "ds_cms_heavy_hitters",
    "ds_weighted_reservoir",
    "rel_cdc_apply",
    "ds_bfs_hops",
    "rel_copurchase_pairs",
    "ds_perplexity_bucket_mixture",
    "rel_event_transitions",
    "rel_value_outliers_zscore",
    "rel_bootstrap_means",
    "rel_ab_test_lift",
    "ds_corpus_report",
    "ds_langid_confusion",
    "rel_seasonal_naive_backtest",
    "vs_sq8_adc_rerank",
    "vs_binary_hamming_knn",
    # r7 additions: batch BM25 (scan + pruned-index twin) — the qid-
    # partitioned WindowGroupLimit top-k is the shape under audit
    "ds_bm25_batch_search",
    "ds_bm25_batch_index_search",
    # r7: the sweep must aggregate to the bounded per-score frame
    # BEFORE the 10-threshold cross join (never 10 corpus scans)
    "ds_quality_threshold_sweep",
    # r7: PMI — one explode + (a,b) agg; marginal joins are
    # vocabulary-sized; top-20 must be TakeOrderedAndProject
    "ds_collocation_pmi",
    # r8: cross-encoder rerank — the shape under audit is the bounded
    # candidate semi-join (50-row broadcast into the corpus scan) and
    # the single-window tail over those 50 rows
    "vs_cross_encoder_rerank",
    # r8: chi2 — one fact-sized grouped count, then bounded-cell windows
    "rel_chi2_independence",
    # r8: IR eval — the BM25 scan stages plus ONE extra map-side label
    # pass; everything after must be <= k-row / 1-row broadcast joins
    "ds_retrieval_eval_metrics",
    # NOT rel_roc_curve_points: built on stats._global_cums (the same
    # localCheckpoint barrier as KS/MW — shape in docs/SCALE_AUDIT.md).
    # NOT ds_prefix_filter_jaccard_join: returns via the shared
    # _materialize_and_release localCheckpoint (the ngram-pairs class).
    # NOT stream_confusion_monitor: collect/createDataFrame over the
    # drained 4-cell state (the stream_kmeans_update class).
    # NOT rel_ks_two_sample / rel_mann_whitney_u: their two-pass prefix
    # sum localCheckpoints the cum frame mid-build (the dsir class), so
    # the captured tail would be an agg over ExistingRDD — the range
    # exchange + pid-partitioned windows they exist to audit are before
    # the checkpoint (shape documented in docs/SCALE_AUDIT.md).
    # NOT stream_drift_binned_ks: returns via collect/createDataFrame
    # over the drained state (same class as stream_kmeans_update)
    # NOT stream_kmeans_update: the returned frame reads the drained
    # state table (ExistingRDD after the in-query collect barrier)
    # NOT vs_mmr_diversity_rerank (applyInPandas greedy is the plan's
    # whole tail — FlatMapGroupsInPandas over the bounded candidate
    # frame) / ds_bm25_prf_expansion (stage-3 plan == ds_bm25_search's;
    # stages 1-2 materialize via bounded collects)
    # NOT rel_user_erasure / vs_bm25_scan_index_parity /
    # vs_vector_table_delete_vacuum_knn / rel_approx_percentile_accuracy:
    # they materialize via collect/createDataFrame, so a captured "plan"
    # would be a bare ExistingRDD scan.
    # r8: Welch t-test — ONE map-side-combined two-key groupBy; the
    # statistic folds from the 2-row frame (no window, no join)
    "rel_welch_ttest",
    # r8: curriculum — per-source window + TakeOrderedAndProject head;
    # the 64-row position window must sit above the LIMIT, never global
    "ds_curriculum_interleave",
    # r8: Kneser-Ney — the captured tail is the scoring pass: ONE
    # tokenize/explode + the broadcast model join + grouped sum (the
    # model side is the checkpointed type frame)
    "ds_kneser_ney_bigram_score",
    # r8: token entropy — entirely map-side: one scan, Generate-free
    # HOF projection, no exchange, no ln tree anywhere in the plan
    "ds_token_entropy",
    # r8: z-order layout — must be ONE scan + map-side Morton arithmetic
    # + a 32-group aggregate; no sort, no range exchange anywhere
    "rel_zorder_layout_prune",
    # r8: Bradley-Terry — the 6 MM iterations over the checkpointed
    # pairs/stats frames; each iteration's state join must be broadcast
    "ds_bradley_terry_ranking",
    # r8: content-defined chunking — map-side flags + doc_id-partitioned
    # windows; the only corpus-wide exchange carries (sig, counts)
    "ds_content_chunk_dedup",
    # r9: targeted salted join — the shape under audit: ONE histogram
    # groupBy, the broadcast of the bounded hot-key frame into BOTH
    # sides, and the (key, salt) exchange with no single hot-key reducer
    "rel_salted_skew_join",
    # r9: autoprobe — one batch-kNN pass (WindowGroupLimit partial
    # top-k) + lists-bounded broadcast joins; chosen-nprobe selection is
    # aggregates over the ≤lists-row checkpointed curve
    "vs_ivf_autoprobe",
    # r9: runtime filter — the shape under audit: the bitmap literal
    # must appear as a Filter ABOVE the fact scan (map-side, before the
    # join exchange), and the dim side must broadcast
    "rel_bloom_semijoin_reduction",
    # r9: degree-oriented triangles — two shuffles (degree agg, wedge
    # join) + a semi-join; no cartesian anywhere
    "rel_triangle_cosupplier",
    # r9: mergeable quantiles — one fact groupBy; windows confined to
    # the |groups|x|bins| frame
    "rel_histogram_quantile_rollup",
    # r10: PSI — two map-side-combined grouped passes; the ln trees and
    # the pico-grid terms all live in the |buckets|-row tail
    "rel_psi_drift",
    # r10: ECE — one grouped pass over documents; <=10-row tails
    "ds_ece_calibration",
    # r10: fuzzy match — the block-then-verify shape: vocabulary-sized
    # name dedup, block-key equi-join, levenshtein only on candidates
    "ds_fuzzy_name_match",
    # r10: l2 autoprobe — the metric-generic twin of vs_ivf_autoprobe
    "vs_ivf_autoprobe_l2",
    # NOT ds_logreg_quality / rel_mad_outliers: both return aggregates
    # over a localCheckpointed feature frame (the dsir class) — their
    # captured tails would root at ExistingRDD; shapes documented in
    # docs/SCALE_AUDIT.md. NOT rel_snapshot_schema_evolution /
    # stream_psi_monitor / vs_ivf_rebuild_decision: materialize via
    # collect/createDataFrame (the rel_user_erasure class).
    # r9: survivors variant of the prefix-filter join — NOT capturable
    # end-to-end (prefix_filter_jaccard_pairs returns via the shared
    # _materialize_and_release localCheckpoint, the ngram-pairs class);
    # the CC loop + keep-rule tail over the checkpointed pair frame is
    # the ds_cluster_dedup shape (docs/SCALE_AUDIT.md).
    # NOT stream_preference_rank_update: returns via collect/
    # createDataFrame over the drained pair-count state (the
    # stream_kmeans_update class).
    # NOT ds_semdedup_prune / ds_naive_bayes_langid /
    # ds_bpe_encode_corpus (r8 rescan sweep): their Spark sides now
    # stage through localCheckpointed frames (assign2 / the (doc, lang,
    # term, tf) type frame / the per-round encoding), so the returned
    # plans root at ExistingRDD — the staged shapes are documented in
    # docs/SCALE_AUDIT.md "r8 rescan sweep".
    # NOT ds_substring_span_removal: the shingle/document-frequency
    # stage lives behind the dup-frame localCheckpoint (the dsir class);
    # the returned plan audits the base scan + bounded span/cover
    # branches (shape in docs/SCALE_AUDIT.md).
    # NOT vs_kcenter_coreset: the result frame is createDataFrame over
    # the K driver-collected centers; the per-iteration argmax passes
    # are separate jobs (shape in docs/SCALE_AUDIT.md).
    # NOT ds_dsir_importance (r7:
    # single-tokenize localCheckpoint): the returned plan's base is the
    # checkpointed RDD, so the capture would show the broadcast join/agg
    # tail over ExistingRDD — the corpus-scan stage it exists to audit is
    # not in it (shape documented in docs/SCALE_AUDIT.md instead)
    # r11: NOT vs_sparse_index_knn / vs_ivf_health_report /
    # rel_snapshot_log_checkpoint / ds_cc_budget_recovery: all return
    # via collect/createDataFrame (in-query parity canary / measured
    # audit rows — the rel_user_erasure class); the load-bearing shape
    # (PartitionFilters + PushedFilters at the sparse postings scan,
    # bounded lifecycle frames) is documented in SCALE_AUDIT r11 — and
    # since r12 the sparse SEARCH plan is captured standalone in the
    # "Component plans" section below (COMPONENT_AUDITED) and pinned by
    # tests/test_plans.py test_sparse_index_search_prunes_and_matches_scan.
    # r12: NOT vs_sparse_index_append / stream_sparse_index_ingest /
    # rel_snapshot_optimize / rel_snapshot_optimize_zorder /
    # stream_snapshot_changefeed: lifecycle entries, same class.
]
# defensive dedup: a name listed twice would duplicate its PLANS section
AUDITED = list(dict.fromkeys(AUDITED))

# Executed-then-explained (isFinalPlan=true) captures: the headline
# bench suite plus the scale-audit joins whose AQE runtime decisions
# (broadcast promotion, partition coalescing, skew splitting) the
# static capture cannot show. Only queries whose RETURNED DataFrame is
# the real pipeline qualify — collect/createDataFrame-materialized
# queries would re-execute a bare ExistingRDD scan.
FINAL_AUDITED = [
    "vs_knn_topk",
    "vs_query_by_example",
    "vs_knn_per_label",
    "rel_pricing_summary",
    "rel_revenue_by_nation",
    "rel_window_top2_lineitems",
    "rel_events_window_5min",
    "ds_exact_dedup",
    "ds_embed_fake",
    "rel_cobucketed_join_revenue",
    "rel_salted_skew_join",
    "rel_bloom_semijoin_reduction",
    "vs_ivf_knn",
    "vs_ivf_autoprobe",
    "rel_triangle_cosupplier",
    # r10 additions: pure-SQL monitors (executed plans show the final
    # coalesced exchanges AQE picked for the bounded tails)
    "rel_psi_drift",
    "ds_ece_calibration",
    "ds_fuzzy_name_match",
]
FINAL_AUDITED = list(dict.fromkeys(FINAL_AUDITED))


def _sparse_search_component(spark, sf_dir):
    """SparseIndex.search() standalone — the registry entry
    (vs_sparse_index_knn) is an in-query parity canary returning via
    createDataFrame, but the probe plan itself must show the bucket
    PartitionFilters and the term In PushedFilters (pinned in
    tests/test_plans.py; captured here for the record)."""
    from pgvector_db_spark.operators.sparse_index import SparseIndex
    from pgvector_db_spark.queries import _sparse_idx_cache, load_tables

    emb = load_tables(spark, sf_dir)["embeddings"]
    idx = SparseIndex(spark, _sparse_idx_cache(spark, sf_dir, emb))
    qe = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    qi = [i + 1 for i, x in enumerate(qe) if abs(x) > 0.1][:5]
    qv = [qe[i - 1] for i in qi]
    return idx.search(qi, qv, k=10)


# (name, builder) pairs: operator-level plans captured standalone when
# the registry entry that exercises them is ExistingRDD-rooted
COMPONENT_AUDITED = [
    ("SparseIndex.search (postings probe + rerank)",
     _sparse_search_component),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan_audit")
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs",
        "PLANS.md",
    )
    lines = [
        "# Captured physical plans (generated by tools/plan_audit.py)",
        "",
        f"Source scale: `{sf_dir}`. Regenerate with "
        "`python tools/plan_audit.py`. Narrative analysis of why these "
        "shapes hold at 100 TB lives in `SCALE_AUDIT.md`.",
        "",
    ]
    def explain(df) -> str:
        return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )

    for name in AUDITED:
        if name not in REGISTRY:
            continue
        df = REGISTRY[name].spark_fn(spark, sf_dir)
        lines += [f"## {name}", "", "```", explain(df).rstrip(), "```", ""]
        print(f"captured {name}")

    lines += [
        "# Final adaptive plans (executed, isFinalPlan=true)",
        "",
        "The same queryExecution re-explained AFTER the query ran: the",
        "AdaptiveSparkPlan below is the plan AQE actually executed —",
        "broadcast promotions, coalesced exchanges, and skew splits are",
        "the runtime decisions, not the static guess above.",
        "",
    ]
    for name in FINAL_AUDITED:
        if name not in REGISTRY:
            continue
        df = REGISTRY[name].spark_fn(spark, sf_dir)
        df.collect()  # execute: AdaptiveSparkPlanExec finalizes in place
        plan = explain(df)
        if "AdaptiveSparkPlan" not in plan:
            # map-only plan: no exchange, so AQE never wraps it — there
            # is no runtime decision to capture (e.g. ds_embed_fake)
            print(f"note {name}: no AdaptiveSparkPlan node (map-only)")
        elif "isFinalPlan=true" not in plan:
            print(f"WARNING {name}: no isFinalPlan=true after execution")
        lines += [
            f"## {name} (final)",
            "",
            "```",
            plan.rstrip(),
            "```",
            "",
        ]
        print(f"captured final {name}")

    lines += [
        "# Component plans (operators whose registry entries are not",
        "# capturable end-to-end)",
        "",
        "Registry entries that materialize via collect/createDataFrame",
        "(in-query parity canaries, lifecycle audits) return an",
        "ExistingRDD plan — but the OPERATOR under them has a real plan.",
        "This section captures those component plans standalone, executed",
        "(r11 VERDICT item #2).",
        "",
    ]
    for name, build in COMPONENT_AUDITED:
        df = build(spark, sf_dir)
        df.collect()
        lines += [
            f"## {name} (component, executed)",
            "",
            "```",
            explain(df).rstrip(),
            "```",
            "",
        ]
        print(f"captured component {name}")

    with open(out_path, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
