"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Contention-robust protocol (r10 VERDICT item #1): every timed query runs
REPS (=3) times and the FASTEST rep is recorded — on a quiet host the
three reps agree and min==median; on a contended host the min is the
closest observable to the true cost, and the recorded per-query
rep-spread (slowest/fastest ratio, "spread" in the printed line as the
max over headline queries, per-query in bench_full.json) tells a reader
exactly how noisy the run was. r10's driver artifact recorded a phantom
52% regression purely from host contention; with the spread recorded the
artifact is self-diagnosing. JIT/codegen warmup lands in rep 1 and is
excluded by the min exactly as before; session startup is excluded (the
metric is query execution, matching how BASELINE.md reports per-op
latencies).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pgvector_db_spark import get_spark  # noqa: E402
from pgvector_db_spark.queries import REGISTRY  # noqa: E402

REPS = max(2, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))

# per-query rep times from the current process, keyed by metric name —
# written to bench_full.json so any single number can be audited
REP_TIMES: dict[str, list[float]] = {}

# Headline set: the reference's core read path (exact kNN, query-by-example),
# its aggregate demo, plus representative relational / dataset-pipeline ops.
HEADLINE = [
    "vs_knn_topk",
    "vs_query_by_example",
    "vs_knn_per_label",
    "rel_pricing_summary",
    "rel_revenue_by_nation",
    "rel_window_top2_lineitems",
    "rel_events_window_5min",
    "ds_exact_dedup",
    "ds_embed_fake",
]


def run_query(spark, name: str, sf_dir: str, key: str | None = None) -> float:
    reps: list[float] = []
    for _ in range(REPS):
        t0 = time.time()
        df = REGISTRY[name].spark_fn(spark, sf_dir)
        n = df.count()
        reps.append(time.time() - t0)
        assert n >= 0
    REP_TIMES[key or name] = [round(r, 4) for r in reps]
    return min(reps)


def rep_ratio(reps: list[float]) -> float:
    """Slowest/fastest ratio over the POST-WARMUP reps (rep 1 carries
    codegen/JIT warmup by design and would read as phantom contention);
    with fewer than 3 reps, over all of them."""
    r = reps[1:] if len(reps) >= 3 else reps
    lo = min(r)
    return round(max(r) / lo, 3) if lo > 0 else 1.0


def time_reps(key: str, thunk) -> float:
    """min over REPS runs of ``thunk`` (seconds), rep times recorded
    under ``key`` — the one timing discipline every derived metric
    shares with run_query."""
    reps: list[float] = []
    for _ in range(REPS):
        t0 = time.time()
        thunk()
        reps.append(time.time() - t0)
    REP_TIMES[key] = [round(r, 4) for r in reps]
    return min(reps)


def derived_metrics(spark, sf_dir: str, timings: dict[str, float]) -> dict[str, float]:
    """BASELINE.md-comparable per-op numbers (demo/README.md:207-210 of the
    reference): embedding rows/s (vs ~3.3/s), ingest rows/s (vs ~100/s),
    and exact vs ANN top-k latency in ms."""
    import shutil
    import tempfile
    import time as _t

    from pgvector_db_spark.catalog import load_tables
    from pgvector_db_spark.sources.table import ParquetTable

    t = load_tables(spark, sf_dir)
    out: dict[str, float] = {}

    # every metric group is isolated: one failing group drops its numbers,
    # never the whole bench line
    def _try(fn) -> None:
        try:
            fn()
        except Exception as exc:
            print(f"bench: derived metric failed: {exc}", file=sys.stderr)

    n_docs = t["documents"].count()
    if "ds_embed_fake" in timings and timings["ds_embed_fake"] > 0:
        out["embed_rows_per_sec"] = round(n_docs / timings["ds_embed_fake"], 1)

    # the REAL inference path (mapInPandas + per-worker model singleton)
    # with the injected stub model: measures the Arrow/Python pipeline
    # cost per row — the harness ceiling any real model runs under
    def _embed_real_path() -> None:
        dt = run_query(
            spark,
            "ds_embed_injected_model",
            sf_dir,
            key="embed_mapinpandas_rows_per_sec",
        )
        out["embed_mapinpandas_rows_per_sec"] = round(n_docs / dt, 1)

    if "ds_embed_injected_model" in REGISTRY:
        _try(_embed_real_path)

    def _ingest() -> None:
        tmp = tempfile.mkdtemp(prefix="bench_ingest_")
        try:
            # fresh subdir per rep: each rep pays the identical
            # from-empty insert, so min-of-reps is apples-to-apples
            reps = iter(range(REPS * 2))

            def _one() -> None:
                table = ParquetTable(
                    spark,
                    os.path.join(tmp, f"docs{next(reps)}"),
                    required_cols=("text",),
                )
                table.insert(t["documents"])

            dt = time_reps("ingest_rows_per_sec", _one)
            out["ingest_rows_per_sec"] = round(n_docs / dt, 1)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    _try(_ingest)

    # The probed-ANN registry entries now return the self-auditing
    # scalar row (probe + in-plan exact scan + recall audit), so timing
    # them would charge the probe for the exact scan it is audited
    # against. Time the raw probe paths directly instead — these are the
    # latencies a serving tier pays.
    def _probe_timings() -> None:
        from pgvector_db_spark.operators.ivf import IVFIndex
        from pgvector_db_spark.operators.lsh_ann import lsh_ann_knn
        from pgvector_db_spark.operators.pq import search_ivfpq_layout
        from pgvector_db_spark.queries import (
            _ivf_cache,
            _ivfpq_path,
            _query_vec,
        )

        emb = t["embeddings"]
        qvec = _query_vec(emb, sf_dir)

        # same discipline as run_query: REPS reps, best kept + spread
        # recorded, so codegen warmup doesn't masquerade as probe
        # latency and host contention is visible in the artifact
        def _best2(key: str, thunk) -> None:
            out[key] = round(
                time_reps(key, lambda: thunk().collect()) * 1000, 1
            )

        ivf_path = _ivf_cache(spark, sf_dir, emb)
        idx = IVFIndex(spark, ivf_path, "embedding", "vec_id")
        _best2("knn_ivf_ms", lambda: idx.search(list(qvec), k=10, nprobe=2))
        _best2(
            "knn_lsh_ms",
            lambda: lsh_ann_knn(
                emb, list(qvec), k=10, num_bits=6, hamming_probe=2
            ),
        )
        # sparse inverted-index probe vs the full sparse scan (the
        # registry row knn_sparse_scan_ms below): the pruned serving
        # path for sparsevec/SPLADE retrieval
        from pgvector_db_spark.operators.sparse_index import SparseIndex
        from pgvector_db_spark.queries import _sparse_idx_cache

        sx = SparseIndex(spark, _sparse_idx_cache(spark, sf_dir, emb))
        qe = [float(x) for x in qvec]
        sqi = [i + 1 for i, x in enumerate(qe) if abs(x) > 0.1]
        sqv = [qe[i - 1] for i in sqi]
        _best2("knn_sparse_index_ms", lambda: sx.search(sqi, sqv, k=10))
        # query-side pruning (SPLADE serving practice: drop low-weight
        # query terms): the synthetic corpus is ~42% dense so the full
        # query probes most buckets; a 5-term query shows the
        # candidate pruning the layout exists for
        top5 = sorted(
            range(len(sqi)), key=lambda j: -abs(sqv[j])
        )[:5]
        p_qi = [sqi[j] for j in top5]
        p_qv = [sqv[j] for j in top5]
        _best2(
            "knn_sparse_index_top5q_ms",
            lambda: sx.search(p_qi, p_qv, k=10),
        )

        pq_path = _ivfpq_path(spark, sf_dir)
        _best2(
            "knn_ivfpq_ms",
            lambda: search_ivfpq_layout(
                spark, pq_path, qvec, k_top=10, nprobe=2, shortlist=100
            ),
        )
        # persisted SQ8 layout: codes-column candidate scan + float
        # rerank of the broadcast shortlist (operators/sq.py)
        from pgvector_db_spark.operators.sq import (
            build_sq8_layout,
            search_sq8_layout,
        )
        from pgvector_db_spark.queries import (
            _atomic_cached_build,
            _fixture_tag,
        )

        sq_path = _atomic_cached_build(
            os.path.join(
                tempfile.gettempdir(), f"sq8_cache_{_fixture_tag(sf_dir)}"
            ),
            "model.json",
            lambda p: build_sq8_layout(emb, p),
        )
        out["knn_sq8_layout_ms"] = round(
            time_reps(
                "knn_sq8_layout_ms",
                lambda: search_sq8_layout(
                    spark, sq_path, list(qvec), k_top=10, shortlist=50
                ).collect(),
            )
            * 1000,
            1,
        )

    _try(_probe_timings)

    for name, key in (
        ("vs_knn_topk", "knn_exact_ms"),
        ("vs_sparse_cosine_topk", "knn_sparse_scan_ms"),
        ("vs_matryoshka_rerank", "knn_matryoshka_ms"),
        ("vs_ivf_autoprobe", "ivf_autoprobe_ms"),
        ("ds_bm25_search", "bm25_ms"),
        ("ds_bm25_index_search", "bm25_indexed_ms"),
        ("ds_bm25_batch_search", "bm25_batch4_ms"),
        ("ds_bm25_batch_index_search", "bm25_batch4_indexed_ms"),
        ("ds_bm25_prf_expansion", "bm25_prf_ms"),
        ("ds_ql_dirichlet_search", "ql_dirichlet_ms"),
        ("vs_mmr_diversity_rerank", "mmr_rerank_ms"),
        ("vs_cross_encoder_rerank", "ce_rerank_ms"),
        ("vs_cross_encoder_injected", "ce_rerank_udf_ms"),
        ("rel_ks_two_sample", "ks_two_sample_ms"),
        ("vs_hybrid_rrf_search", "hybrid_rrf_ms"),
        ("stream_events_window_5min", "stream_window_ms"),
        ("stream_stream_interval_join", "stream_join_ms"),
        ("rel_cobucketed_join_revenue", "cobucketed_join_ms"),
        ("rel_salted_skew_join", "salted_skew_join_ms"),
        ("rel_bloom_semijoin_reduction", "bloom_semijoin_ms"),
        ("rel_ivm_delta_agg", "ivm_delta_agg_ms"),
        ("vs_jl_projection_topk", "jl_projection_ms"),
        ("rel_histogram_quantile_rollup", "hist_quantile_ms"),
        ("rel_gap_fill_locf", "gap_fill_locf_ms"),
        ("rel_exact_median_two_pass", "exact_median_ms"),
        ("rel_grouped_median_two_pass", "grouped_median_ms"),
        ("rel_kcore_parts", "kcore_peel_ms"),
        ("rel_psi_drift", "psi_drift_ms"),
        ("ds_ece_calibration", "ece_calibration_ms"),
        ("ds_logreg_quality", "logreg_train3_ms"),
        ("rel_mad_outliers", "mad_outliers_ms"),
        ("ds_fuzzy_name_match", "fuzzy_match_ms"),
        ("rel_snapshot_schema_evolution", "snapshot_evolution_ms"),
        ("ds_bpe_pair_counts", "bpe_pair_counts_ms"),
        ("ds_hard_negative_mining", "hard_negative_mining_ms"),
        ("ds_quality_percentile_filter", "quality_percentile_ms"),
        ("ds_pagerank_partsupp", "pagerank_3iter_ms"),
        ("ds_pagerank_partsupp_bucketed", "pagerank_bucketed_3iter_ms"),
        ("ds_cms_heavy_hitters", "cms_heavy_hitters_ms"),
        ("ds_dsir_importance", "dsir_importance_ms"),
        ("rel_cdc_apply", "cdc_apply_ms"),
        ("stream_ivf_append_ingest", "stream_ivf_append_ms"),
        ("stream_decontaminate_ingest", "stream_decontam_ms"),
        ("ds_minkprob_contamination", "minkprob_ms"),
        ("ds_bpe_train_merges", "bpe_train4_ms"),
        ("vs_pca_power_projection", "pca_projection_ms"),
        ("stream_pca_update", "stream_pca_ms"),
        ("stream_drift_binned_ks", "stream_drift_ms"),
        ("ds_retrieval_eval_metrics", "retrieval_eval_ms"),
        ("ds_naive_bayes_langid", "naive_bayes_ms"),
        ("ds_prefix_filter_jaccard_join", "prefix_filter_join_ms"),
        ("ds_prefix_filter_dedup_survivors", "prefix_filter_survivors_ms"),
        ("rel_roc_curve_points", "roc_points_ms"),
        ("ds_substring_span_removal", "substring_span_removal_ms"),
        ("vs_kcenter_coreset", "kcenter_coreset_ms"),
        ("rel_welch_ttest", "welch_ttest_ms"),
        ("ds_bpe_encode_corpus", "bpe_encode_ms"),
        ("ds_curriculum_interleave", "curriculum_ms"),
        ("ds_kneser_ney_bigram_score", "kneser_ney_ms"),
        ("ds_token_entropy", "token_entropy_ms"),
        ("ds_bradley_terry_ranking", "bradley_terry_ms"),
        ("rel_zorder_layout_prune", "zorder_layout_ms"),
        ("ds_content_chunk_dedup", "content_chunk_dedup_ms"),
        ("stream_preference_rank_update", "stream_pref_rank_ms"),
        ("stream_chunk_dedup_ingest", "stream_chunk_dedup_ms"),
    ):
        if name in REGISTRY:
            _try(lambda n=name, k=key: out.__setitem__(
                k, round(run_query(spark, n, sf_dir, key=k) * 1000, 1)
            ))

    # The on-the-fly LSH number above pays 6 hyperplane dot-products per
    # row with NO pruning — it exists as the no-precompute fallback. The
    # scale path is the persisted signature-partitioned layout, where the
    # probe set is partition pruning at the scan (docs/SCALE_AUDIT.md):
    def _lsh_layout() -> None:
        from pgvector_db_spark.operators.lsh_ann import (
            build_lsh_layout,
            search_lsh_layout,
        )

        from pgvector_db_spark.queries import _lsh_cache

        lsh_path = _lsh_cache(sf_dir, t["embeddings"])
        qv = list(t["embeddings"].filter("vec_id = 0").first()["embedding"])

        def _one() -> None:
            assert search_lsh_layout(spark, lsh_path, qv, 10).count() >= 0

        out["knn_lsh_layout_ms"] = round(
            time_reps("knn_lsh_layout_ms", _one) * 1000, 1
        )

    _try(_lsh_layout)

    # lakehouse serving claim made measurable (r12 VERDICT item #8): the
    # changefeed read must stay O(changed data) — one manifest open +
    # one add-file read per new version, never a table rescan. Fixed
    # fixture: a 16-commit snapshot table (built once, reused across
    # runs); the timed op is an incremental consumer catching up on the
    # last 8 commits. A regression to O(table) here is exactly the
    # listing-cost class knn_lsh_layout_ms caught for LSH.
    def _changefeed() -> None:
        import tempfile

        from pgvector_db_spark.queries import _fixture_tag
        from pgvector_db_spark.sources.snapshots import SnapshotTable

        root = os.path.join(
            tempfile.gettempdir(), f"snapcf_bench_{_fixture_tag(sf_dir)}"
        )
        st = SnapshotTable(spark, root, required_cols=("o_orderkey",))
        from pyspark.sql import functions as F

        for i in range(st.latest_version(), 16):
            st.insert(
                t["orders"].filter(F.col("o_orderkey") % 16 == i)
            )

        def _one() -> None:
            assert st.read_changes(8, 16).count() >= 0

        out["changefeed_read_ms"] = round(
            time_reps("changefeed_read_ms", _one) * 1000, 1
        )

    _try(_changefeed)

    # data-skipping serving claim made measurable (r13): a range query
    # over a 16-commit range-partitioned snapshot table must open ~1
    # file, not 16 — the manifest-stats prune runs on the driver before
    # any file opens. The in-rep canary raises if pruning ever stops
    # engaging (the metric must never silently degrade into timing a
    # full scan).
    def _skipping() -> None:
        import tempfile

        from pgvector_db_spark.queries import _fixture_tag
        from pgvector_db_spark.sources.snapshots import SnapshotTable

        root = os.path.join(
            tempfile.gettempdir(), f"snapskip_bench_{_fixture_tag(sf_dir)}"
        )
        st = SnapshotTable(spark, root, required_cols=("o_orderkey",))
        from pyspark.sql import functions as F

        mm = t["orders"].agg(
            F.min("o_orderkey"), F.max("o_orderkey")
        ).first()
        lo, hi = int(mm[0]), int(mm[1])
        width = (hi - lo) // 16 + 1
        for i in range(st.latest_version(), 16):
            st.insert(
                t["orders"]
                .filter(
                    (F.col("o_orderkey") >= lo + i * width)
                    & (F.col("o_orderkey") < lo + (i + 1) * width)
                )
                .coalesce(1)
            )
        qlo, qhi = lo + 5 * width, lo + 6 * width - 1

        def _one() -> None:
            assert (
                st.read_where(
                    [("o_orderkey", "between", (qlo, qhi))]
                ).count()
                >= 0
            )
            assert st.last_files_skipped >= 12, (
                f"stats prune disengaged: only {st.last_files_skipped} "
                "files skipped"
            )

        out["skipping_read_ms"] = round(
            time_reps("skipping_read_ms", _one) * 1000, 1
        )

    _try(_skipping)

    # training-pipeline headline: near-dup candidate generation throughput
    # (MinHash+LSH over the documents table, Spark side only)
    def _dedup() -> None:
        from pgvector_db_spark.operators.dedup import minhash_lsh_pairs

        dt = time_reps(
            "dedup_docs_per_sec",
            lambda: minhash_lsh_pairs(
                t["documents"], hash_fn="xxhash64"
            ).count(),
        )
        out["dedup_docs_per_sec"] = round(n_docs / dt, 1)

    _try(_dedup)

    # ANN quality next to ANN latency: recall@10 of the probed IVF search
    # vs the exact kernel (pgvector's nprobe/lists tradeoff, measured).
    def _ivf_recall() -> None:
        from pgvector_db_spark.operators.ivf import IVFIndex

        from pgvector_db_spark.queries import _ivf_cache

        path = _ivf_cache(spark, sf_dir, t["embeddings"])
        idx = IVFIndex(spark, path, "embedding", "vec_id")
        q = list(t["embeddings"].filter("vec_id = 0").first()["embedding"])
        # pgvector's lists/nprobe dial, measured: recall climbs toward 1.0
        # as nprobe -> lists while latency stays partition-pruned.
        for nprobe in (2, 4, 6):
            out[f"ivf_recall_at_10_nprobe{nprobe}"] = idx.recall_at_k(
                t["embeddings"], q, 10, nprobe
            )

    _try(_ivf_recall)

    # PQ quality dial: recall@10 of the probed IVF+PQ search vs its own
    # full-probe/covering-shortlist degeneration (= exact L2).
    def _ivfpq_recall() -> None:
        from pgvector_db_spark.operators.pq import (
            build_ivfpq_layout,
            search_ivfpq_layout,
        )

        from pgvector_db_spark.queries import _ivfpq_path

        path = _ivfpq_path(spark, sf_dir)
        q = list(t["embeddings"].filter("vec_id = 0").first()["embedding"])
        exact = {
            r["vec_id"]
            for r in search_ivfpq_layout(
                spark, path, q, k_top=10, nprobe=8, shortlist=100000
            ).collect()
        }
        probed = {
            r["vec_id"]
            for r in search_ivfpq_layout(
                spark, path, q, k_top=10, nprobe=2, shortlist=100
            ).collect()
        }
        out["ivfpq_recall_at_10_nprobe2"] = round(
            len(exact & probed) / max(1, len(exact)), 2
        )

    _try(_ivfpq_recall)

    # span-granular dedup throughput (substring_dup_stats, xxhash64 mode —
    # the single-pass window plan): docs/sec through shingle→hash→count
    def _substring_dedup() -> None:
        from pgvector_db_spark.operators.dedup import substring_dup_stats

        dt = time_reps(
            "substring_dedup_docs_per_sec",
            lambda: substring_dup_stats(
                t["documents"], n=5, hash_fn="xxhash64"
            ).count(),
        )
        out["substring_dedup_docs_per_sec"] = round(n_docs / dt, 1)

    _try(_substring_dedup)

    # segment-count cost curve: the one unbounded term in the BM25 index
    # design is a scan per segment — measure search latency on a
    # streaming-shaped 8-segment index vs the same index compacted to 1,
    # the number that justifies the compaction policy in
    # stream_bm25_ingest's fold
    def _bm25_segments() -> None:
        from pgvector_db_spark.operators.text_search import BM25Index

        terms = ["vector", "join", "filter"]
        tmp = tempfile.mkdtemp(prefix="bench_bm25_seg_")
        try:
            path = os.path.join(tmp, "idx")
            BM25Index.build(
                t["documents"].filter("doc_id % 8 = 0"), path, num_buckets=16
            )
            idx = BM25Index(spark, path)
            for m in range(1, 8):
                idx.append(t["documents"].filter(f"doc_id % 8 = {m}"))

            def _time_search(key: str) -> float:
                def _one() -> None:
                    assert idx.search(terms, k=20).count() >= 0

                return round(time_reps(key, _one) * 1000, 1)

            out["bm25_search_8seg_ms"] = _time_search("bm25_search_8seg_ms")
            idx.compact()
            assert idx.segment_count() == 1
            out["bm25_search_1seg_ms"] = _time_search("bm25_search_1seg_ms")
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    _try(_bm25_segments)

    # corpus-vs-corpus shape: distributed batch ANN with a ~100k-query
    # batch (queries never touch the driver — IVFIndex.batch_search
    # mode='distributed'). The number that matters at 100 TB: per-query
    # cost of one pruned pass over the layout for the WHOLE batch.
    def _batch_ann_100k() -> None:
        from pgvector_db_spark.operators.ivf import IVFIndex

        from pgvector_db_spark.queries import _ivf_cache

        path = _ivf_cache(spark, sf_dir, t["embeddings"])
        idx = IVFIndex(spark, path, "embedding", "vec_id")
        n_emb = t["embeddings"].count()
        reps = max(1, 100_000 // n_emb)
        queries = (
            t["embeddings"]
            .crossJoin(spark.range(reps).withColumnRenamed("id", "_rep"))
            .selectExpr(
                f"vec_id * {reps} + _rep AS query_id",
                "embedding AS query_vec",
            )
        )
        nq = n_emb * reps

        def _one() -> None:
            # count OUTSIDE the assert: under python -O the assert
            # statement (and the only action with it) would be stripped
            n_rows = idx.batch_search(
                queries, k=10, nprobe=1, mode="distributed"
            ).count()
            assert n_rows >= nq  # k results per query (>= nq rows)

        dt = time_reps("batch_ann_queries_per_sec", _one)
        out["batch_ann_queries_per_sec"] = round(nq / dt, 1)
        out["batch_ann_batch_size"] = nq

    _try(_batch_ann_100k)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")

    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name in REGISTRY:
            try:
                timings[name] = round(run_query(spark, name, sf_dir), 4)
            except Exception as exc:  # one broken query must not kill the run
                print(f"bench: {name} failed: {exc}", file=sys.stderr)

    try:
        derived = derived_metrics(spark, sf_dir, timings)
    except Exception as exc:
        print(f"bench: derived metrics failed: {exc}", file=sys.stderr)
        derived = {}

    # slowest/fastest post-warmup rep ratio per timed key; the headline
    # max goes in the printed line ("spread") so a contended run is
    # self-flagging — a spread near 1.0 means the min is trustworthy, a
    # spread of 1.5+ means the host was noisy and solo reruns are
    # warranted
    rep_spread = {k: rep_ratio(r) for k, r in REP_TIMES.items() if r}
    headline_spread = [rep_spread[n] for n in HEADLINE if n in rep_spread]
    out = {
        "metric": "headline_suite_sec",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "reps": REPS,
        "spread": max(headline_spread) if headline_spread else None,
        "derived": derived,
        "rep_spread": rep_spread,
        "rep_times": REP_TIMES,
    }

    # The external driver captures only the LAST ~2000 chars of stdout;
    # r8's full line outgrew that window and recorded parsed:null. Keep
    # the printed line comfortably inside the window: write the complete
    # object to bench_full.json next to this script, and print a compact
    # line carrying the headline suite + the BASELINE.md-comparable core
    # derived metrics (dropping extras until it fits).
    full_path = Path(__file__).resolve().parent / "bench_full.json"
    try:
        full_path.write_text(json.dumps(out, indent=1) + "\n")
    except OSError as exc:
        print(f"bench: could not write {full_path}: {exc}", file=sys.stderr)

    print(compact_line(out, derived))


CORE_KEYS = [
        "embed_rows_per_sec",
        "embed_mapinpandas_rows_per_sec",
        "ingest_rows_per_sec",
        "knn_exact_ms",
        "knn_ivf_ms",
        "knn_ivfpq_ms",
        "knn_sq8_layout_ms",
        "knn_lsh_layout_ms",
        "bm25_ms",
        "bm25_indexed_ms",
        "hybrid_rrf_ms",
        "mmr_rerank_ms",
        "dedup_docs_per_sec",
        "batch_ann_queries_per_sec",
        "ivf_recall_at_10_nprobe2",
        "ivf_recall_at_10_nprobe4",
        "ivf_recall_at_10_nprobe6",
        "pagerank_3iter_ms",
        "pagerank_bucketed_3iter_ms",
        "bpe_train4_ms",
        "dsir_importance_ms",
        "prefix_filter_join_ms",
        "prefix_filter_survivors_ms",
        "salted_skew_join_ms",
        "ivf_autoprobe_ms",
        "changefeed_read_ms",
        "skipping_read_ms",
]

# the external driver captures only the LAST ~2000 chars of stdout —
# the printed line must stay inside that window no matter how many
# derived metrics exist (r8 lost its whole BENCH record to this)
MAX_LINE = 1900


def compact_line(out: dict, derived: dict) -> str:
    """The (≤ MAX_LINE chars) single JSON line for the driver: headline
    suite + reps/spread + the BASELINE-comparable core derived metrics,
    dropping extras until it fits. Per-key rep times and spreads stay in
    bench_full.json only (they'd blow the window). Split out of main()
    so the size invariant is unit-testable
    (tests/test_bench_contract.py)."""
    compact = {
        k: v for k, v in out.items() if k not in ("rep_spread", "rep_times")
    }
    compact["derived"] = {k: derived[k] for k in CORE_KEYS if k in derived}
    compact["full"] = "bench_full.json"
    line = json.dumps(compact)
    while len(line) > MAX_LINE and compact["derived"]:
        compact["derived"].popitem()
        line = json.dumps(compact)
    return line


if __name__ == "__main__":
    main()
