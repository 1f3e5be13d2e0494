"""Unit tests for the preference-ranking and layout operators:
Bradley-Terry MM (operators/ranking.py), the Z-order layout report, and
Cohen's kappa. Cross-engine exactness is covered by test_queries_oracle;
these pin the algorithmic invariants against pure-Python replicas."""

from __future__ import annotations

import math

from pgvector_db_spark.operators.ranking import GRID, P0, bradley_terry
from pgvector_db_spark.queries import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


def _bt_python(match_list, iterations=6):
    """Pure-Python replica of the grid-quantized MM iteration — the same
    IEEE ops in the same order as the Column expressions."""
    pairs: dict[tuple[int, int], list[int]] = {}
    for w, l in match_list:
        i, j = min(w, l), max(w, l)
        n_w = pairs.setdefault((i, j), [0, 0])
        n_w[0] += 1
        if w < l:
            n_w[1] += 1
    items = sorted({x for p in pairs for x in p})
    wins = {it: 1 for it in items}
    games = {it: 2 for it in items}
    for (i, j), (n, wi) in pairs.items():
        wins[i] += wi
        wins[j] += n - wi
        games[i] += n
        games[j] += n
    p = {it: P0 for it in items}
    for _ in range(iterations):
        s = {it: 0 for it in items}
        for (i, j), (n, _wi) in pairs.items():
            t_ij = math.floor(n * GRID / float(p[i] + p[j]) + 0.5)
            s[i] += t_ij
            s[j] += t_ij
        p = {
            it: math.floor(
                wins[it]
                * GRID
                / float(
                    s[it] + math.floor(2.0 * GRID / float(p[it] + P0) + 0.5)
                )
                + 0.5
            )
            for it in items
        }
    return {it: (wins[it], games[it], p[it]) for it in items}


def test_bradley_terry_matches_pure_python(spark):
    # 1 beats 2 thrice, 2 beats 1 once, 2 beats 3 twice, 3 beats 1 once
    log = [(1, 2), (1, 2), (1, 2), (2, 1), (2, 3), (2, 3), (3, 1)]
    df = spark.createDataFrame(log, ["winner", "loser"])
    got = {
        r["item"]: (r["wins"], r["games"], r["strength_micro"])
        for r in bradley_terry(df, iterations=6).collect()
    }
    assert got == _bt_python(log, iterations=6)


def test_bradley_terry_is_match_order_invariant(spark):
    # per-pair counts + grid-snapped terms => the log's order and
    # partitioning cannot change a single bit of the output
    log = [(1, 2), (2, 3), (3, 1), (1, 2), (1, 3), (2, 1), (3, 2)]
    a = spark.createDataFrame(log, ["winner", "loser"])
    b = spark.createDataFrame(list(reversed(log)), ["winner", "loser"]).repartition(7)
    ra = sorted(tuple(r) for r in bradley_terry(a, iterations=6).collect())
    rb = sorted(tuple(r) for r in bradley_terry(b, iterations=6).collect())
    assert ra == rb


def test_bradley_terry_dominant_item_ranks_first(spark):
    # item 9 beats everyone twice; 1/2/3 split their games evenly
    log = []
    for other in (1, 2, 3):
        log += [(9, other)] * 2
    log += [(1, 2), (2, 3), (3, 1)]
    df = spark.createDataFrame(log, ["winner", "loser"])
    out = {
        r["item"]: r["strength_micro"]
        for r in bradley_terry(df, iterations=6).collect()
    }
    assert max(out, key=out.get) == 9
    assert all(out[9] > out[i] for i in (1, 2, 3))


def test_bradley_terry_zero_win_item_stays_positive(spark):
    df = spark.createDataFrame(
        [(1, 2), (1, 2), (3, 2)], ["winner", "loser"]
    )
    out = {
        r["item"]: r["strength_micro"]
        for r in bradley_terry(df, iterations=6).collect()
    }
    # item 2 never wins a real game; the ghost prior keeps it positive
    assert out[2] > 0
    assert out[1] > out[2]


def test_zorder_layout_beats_roworder_on_fixture(spark):
    rows = {
        r["layout"]: r
        for r in REGISTRY["rel_zorder_layout_prune"]
        .spark_fn(spark, SF_DIR)
        .collect()
    }
    z, ro = rows["zorder"], rows["roworder"]
    assert z["files_total"] == ro["files_total"] == 16
    # both layouts must scan at least every matching row
    for r in (z, ro):
        assert r["rows_scanned"] >= r["rows_matching"]
    assert z["rows_matching"] == ro["rows_matching"]
    # the point of the layout: the z-curve prunes, insertion order can't
    assert z["files_scanned"] < ro["files_scanned"]
    assert z["rows_scanned"] < ro["rows_scanned"]


def test_streaming_preference_rank_equals_batch(spark):
    batch = (
        REGISTRY["ds_bradley_terry_ranking"].spark_fn(spark, SF_DIR).collect()
    )
    streamed = (
        REGISTRY["stream_preference_rank_update"]
        .spark_fn(spark, SF_DIR)
        .collect()
    )
    # additive per-pair count folds + the shared MM loop => bitwise equal
    assert [tuple(r) for r in streamed] == [tuple(r) for r in batch]


def test_streaming_chunk_dedup_equals_batch(spark):
    batch = (
        REGISTRY["ds_content_chunk_dedup"].spark_fn(spark, SF_DIR).collect()
    )
    streamed = (
        REGISTRY["stream_chunk_dedup_ingest"].spark_fn(spark, SF_DIR).collect()
    )
    assert [tuple(r) for r in streamed] == [tuple(r) for r in batch]


def test_content_chunk_dedup_invariants(spark):
    row = (
        REGISTRY["ds_content_chunk_dedup"].spark_fn(spark, SF_DIR).collect()[0]
    )
    assert 0 < row["n_unique_chunks"] <= row["n_chunks"]
    assert 0 < row["chunk_bytes_unique"] <= row["chunk_bytes_total"]
    # ppm ratios recomputed exactly
    assert row["dup_chunk_ppm"] == math.floor(
        (row["n_chunks"] - row["n_unique_chunks"]) * 1e6 / row["n_chunks"]
        + 0.5
    )
    assert row["savings_ppm"] == math.floor(
        (row["chunk_bytes_total"] - row["chunk_bytes_unique"])
        * 1e6
        / row["chunk_bytes_total"]
        + 0.5
    )
    # the fixture corpus genuinely contains duplicated chunks
    assert row["dup_chunk_ppm"] > 0


def test_rbo_bounds_and_full_agreement_identity(spark):
    row = (
        REGISTRY["vs_rbo_rank_agreement"].spark_fn(spark, SF_DIR).collect()[0]
    )
    k = row["k"]
    assert 0 <= row["overlap_at_k"] <= k
    assert row["top1_same"] in (0, 1)
    # RBO_min is bounded by the weight mass actually summed: for p=1/2
    # and identical rankings X_d = d, so the max is sum(2^-d) < 1
    max_nano = sum(
        math.floor(d * 1e9 / (d * (1 << d)) + 0.5) for d in range(1, k + 1)
    )
    assert 0 <= row["rbo_min_nano"] <= max_nano
    if row["overlap_at_k"] == k and row["top1_same"] == 1:
        # near-identity: high agreement must put RBO near the ceiling
        assert row["rbo_min_nano"] >= max_nano - 10_000_000


def test_ewma_matches_pure_python(spark, tables):
    rows = (
        tables["events"]
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], r["value"])
        )
    expect = {}
    for u, evs in by_user.items():
        evs.sort()
        n = len(evs)
        total = 0
        for i, (_, _, v) in enumerate(evs, start=1):
            e = min(n - 1 if i == 1 else n - i + 1, 62)
            total += math.floor(v / float(1 << e) * 1e6 + 0.5)
        expect[u] = (n, total)
    got = (
        REGISTRY["rel_ewma_user_value"].spark_fn(spark, SF_DIR).collect()
    )
    top = sorted(
        ((v[1], -u) for u, v in expect.items()), reverse=True
    )[:20]
    assert [(r["user_id"], r["n_events"], r["ewma_micro"]) for r in got] == [
        (-nu, expect[-nu][0], s) for s, nu in top
    ]


def test_join_skew_report_partitions_the_keyspace(spark, tables):
    rows = (
        REGISTRY["rel_join_skew_report"].spark_fn(spark, SF_DIR).collect()
    )
    n_keys = sum(r["n_keys"] for r in rows)
    n_rows = sum(r["n_rows"] for r in rows)
    assert n_keys == tables["orders"].select("o_custkey").distinct().count()
    assert n_rows == tables["orders"].count()
    for r in rows:
        # bucket b holds keys with counts in [2^b, 2^(b+1))
        assert (1 << r["freq_log2_bucket"]) <= r["max_key_rows"]
        assert r["max_key_rows"] < (1 << (r["freq_log2_bucket"] + 1))
        assert r["row_share_ppm"] == math.floor(
            r["n_rows"] * 1e6 / n_rows + 0.5
        )


def test_margin_calibration_counts_cover_corpus(spark, tables):
    rows = (
        REGISTRY["ds_margin_calibration_report"]
        .spark_fn(spark, SF_DIR)
        .collect()
    )
    assert sum(r["n_docs"] for r in rows) == tables["documents"].count()
    for r in rows:
        assert 0 <= r["n_correct"] <= r["n_docs"]
        assert r["acc_ppm"] == math.floor(
            r["n_correct"] * 1e6 / r["n_docs"] + 0.5
        )


def test_kappa_bounds_and_identity(spark):
    row = (
        REGISTRY["ds_rater_agreement_kappa"]
        .spark_fn(spark, SF_DIR)
        .collect()[0]
    )
    n, agree, pe_num = row["n_docs"], row["n_agree"], row["pe_num"]
    assert 0 < agree <= n
    # exact integer identity reproduced in python
    expect = math.floor(
        float(n * agree - pe_num) * 1e6 / float(n * n - pe_num) + 0.5
    )
    assert row["kappa_micro"] == expect
    assert -1_000_000 <= row["kappa_micro"] <= 1_000_000


def test_sparse_index_parity_and_pruning(spark, tables, tmp_path):
    """operators/sparse_index.py: (a) the index path is bitwise equal to
    the full scan for queries whose top-k is overlap-reachable; (b) a
    genuinely sparse query prunes the candidate set; (c) a query with
    no overlapping index yields zero candidates (the losslessness
    contract's boundary)."""
    from pgvector_db_spark.functions.sparse import (
        sparse_cosine_distance,
        sparse_indices,
        sparse_values,
    )
    from pgvector_db_spark.operators.sparse_index import SparseIndex
    from pyspark.sql import functions as F

    emb = tables["embeddings"]
    idx = SparseIndex.build(
        emb,
        str(tmp_path / "sx"),
        eps=0.1,
        num_buckets=16,
        carry_cols=("label",),
    )
    n = emb.count()
    assert idx.meta()["n_rows"] == n

    se = emb.select(
        "vec_id",
        "label",
        sparse_indices("embedding", 0.1).alias("si"),
        sparse_values("embedding", 0.1).alias("sv"),
    )
    for qid in (0, 7, 33):
        q = se.filter(F.col("vec_id") == qid).first()
        qi, qv = list(q["si"]), list(q["sv"])
        scan = (
            se.withColumn("_qi", F.array(*[F.lit(i) for i in qi]))
            .withColumn("_qv", F.array(*[F.lit(v) for v in qv]))
            .select(
                "vec_id",
                "label",
                F.size("si").cast("int").alias("nnz"),
                sparse_cosine_distance("si", "sv", "_qi", "_qv").alias(
                    "distance"
                ),
            )
            .orderBy(F.col("distance").asc(), F.col("vec_id").asc())
            .limit(10)
            .collect()
        )
        got = idx.search(qi, qv, k=10).collect()
        assert [tuple(r) for r in got] == [tuple(r) for r in scan], qid

    # single-index query: candidates = only rows retaining that index
    single = idx.candidates([1]).count()
    with_1 = se.filter(F.array_contains("si", 1)).count()
    assert single == with_1 < n
    # out-of-range index: no postings, no candidates
    assert idx.candidates([10**6]).count() == 0


def test_sparse_index_ip_metric(spark, tables, tmp_path):
    from pgvector_db_spark.functions.sparse import (
        sparse_dot,
        sparse_indices,
        sparse_values,
    )
    from pgvector_db_spark.operators.sparse_index import SparseIndex
    from pyspark.sql import functions as F

    emb = tables["embeddings"]
    idx = SparseIndex.build(emb, str(tmp_path / "sxip"), eps=0.1)
    se = emb.select(
        "vec_id",
        sparse_indices("embedding", 0.1).alias("si"),
        sparse_values("embedding", 0.1).alias("sv"),
    )
    q = se.filter("vec_id = 0").first()
    qi, qv = list(q["si"]), list(q["sv"])
    scan = (
        se.withColumn("_qi", F.array(*[F.lit(i) for i in qi]))
        .withColumn("_qv", F.array(*[F.lit(v) for v in qv]))
        .select(
            "vec_id",
            F.size("si").cast("int").alias("nnz"),
            (F.lit(0.0) - sparse_dot("si", "sv", "_qi", "_qv")).alias(
                "distance"
            ),
        )
        .filter(F.col("distance") < 0.0)
        .orderBy(F.col("distance").asc(), F.col("vec_id").asc())
        .limit(5)
        .collect()
    )
    got = idx.search(qi, qv, k=5, metric="ip").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in scan]


def _sparse_scan_topk(se, qi, qv, k=10):
    from pgvector_db_spark.functions.sparse import sparse_cosine_distance
    from pyspark.sql import functions as F

    return (
        se.withColumn("_qi", F.array(*[F.lit(i) for i in qi]))
        .withColumn("_qv", F.array(*[F.lit(v) for v in qv]))
        .select(
            "vec_id",
            "label",
            F.size("si").cast("int").alias("nnz"),
            sparse_cosine_distance("si", "sv", "_qi", "_qv").alias(
                "distance"
            ),
        )
        .orderBy(F.col("distance").asc(), F.col("vec_id").asc())
        .limit(k)
        .collect()
    )


def _sparse_frame(emb):
    from pgvector_db_spark.functions.sparse import (
        sparse_indices,
        sparse_values,
    )

    return emb.select(
        "vec_id",
        "label",
        sparse_indices("embedding", 0.1).alias("si"),
        sparse_values("embedding", 0.1).alias("sv"),
    )


def test_sparse_index_append_idempotent_and_crash_safe(
    spark, tables, tmp_path
):
    """Segment+manifest contract on SparseIndex (r11 VERDICT item #1,
    the BM25Index.append discipline): (1) appended rows are served
    bitwise-identically to a scan over the grown corpus; (2) replaying
    an already-committed batch_tag is a no-op; (3) an orphan segment
    dir without a manifest commit — the crash-mid-append state — is
    never read."""
    import os
    import shutil

    from pgvector_db_spark.operators.sparse_index import SparseIndex

    emb = tables["embeddings"]
    idx = SparseIndex.build(
        emb.filter("vec_id % 4 != 0"),
        str(tmp_path / "sx"),
        eps=0.1,
        num_buckets=16,
        carry_cols=("label",),
    )
    idx.append(emb.filter("vec_id % 4 = 0"), batch_tag="b1")
    assert idx.segment_count() == 2
    assert idx.meta()["n_rows"] == emb.count()

    se = _sparse_frame(emb)
    q = se.filter("vec_id = 0").first()
    qi, qv = list(q["si"]), list(q["sv"])
    want = [tuple(r) for r in _sparse_scan_topk(se, qi, qv)]
    got1 = [tuple(r) for r in idx.search(qi, qv, k=10).collect()]
    assert got1 == want

    # replay the same batch: rows must NOT duplicate (a duplicated row
    # would shadow a distinct neighbor out of the top-k)
    idx.append(emb.filter("vec_id % 4 = 0"), batch_tag="b1")
    assert idx.segment_count() == 2
    assert idx.meta()["n_rows"] == emb.count()
    got2 = [tuple(r) for r in idx.search(qi, qv, k=10).collect()]
    assert got2 == want

    # crash simulation: a segment dir that never reached the manifest
    orphan = str(tmp_path / "sx" / "seg_orphan")
    shutil.copytree(os.path.join(str(tmp_path / "sx"), "seg_000"), orphan)
    got3 = [tuple(r) for r in idx.search(qi, qv, k=10).collect()]
    assert got3 == want


def test_sparse_index_compact_changes_no_score(spark, tables, tmp_path):
    """compact() is a pure re-layout: one segment afterwards, and the
    search (plus the raw candidate set) is bitwise what the
    multi-segment index served; batch_tags survive so replays stay
    no-ops after the merge."""
    from pgvector_db_spark.operators.sparse_index import SparseIndex

    emb = tables["embeddings"]
    idx = SparseIndex.build(
        emb.filter("vec_id % 3 = 0"),
        str(tmp_path / "sxc"),
        eps=0.1,
        num_buckets=16,
        carry_cols=("label",),
    )
    idx.append(emb.filter("vec_id % 3 = 1"), batch_tag="b1")
    idx.append(emb.filter("vec_id % 3 = 2"), batch_tag="b2")
    assert idx.segment_count() == 3

    se = _sparse_frame(emb)
    q = se.filter("vec_id = 7").first()
    qi, qv = list(q["si"]), list(q["sv"])
    before = [tuple(r) for r in idx.search(qi, qv, k=10).collect()]
    n_cand = idx.candidates(qi).count()

    idx.compact()
    assert idx.segment_count() == 1
    assert idx.meta()["n_rows"] == emb.count()
    after = [tuple(r) for r in idx.search(qi, qv, k=10).collect()]
    assert after == before
    assert idx.candidates(qi).count() == n_cand
    # the merged corpus still equals a fresh scan
    want = [tuple(r) for r in _sparse_scan_topk(se, qi, qv)]
    assert after == want
    # replaying a pre-compact batch is still a no-op
    idx.append(emb.filter("vec_id % 3 = 1"), batch_tag="b1")
    assert idx.segment_count() == 1
    assert idx.meta()["n_rows"] == emb.count()


def test_sparse_index_concurrent_appends_both_commit(
    spark, tables, tmp_path
):
    """Two appends racing the manifest commit: with the commit lock
    both segment entries land (the BM25 r3-ADVICE failure class —
    pre-lock, the last committer silently dropped the other's entry)."""
    import threading

    from pgvector_db_spark.operators.sparse_index import SparseIndex

    emb = tables["embeddings"]
    idx = SparseIndex.build(
        emb.filter("vec_id % 3 = 0"),
        str(tmp_path / "sxr"),
        eps=0.1,
        num_buckets=16,
        carry_cols=("label",),
    )
    parts = [emb.filter("vec_id % 3 = 1"), emb.filter("vec_id % 3 = 2")]
    errs = []

    def run(df, tag):
        try:
            idx.append(df, batch_tag=tag)
        except Exception as e:  # pragma: no cover - surfaced by assert
            errs.append(e)

    ts = [
        threading.Thread(target=run, args=(p, f"t{i}"))
        for i, p in enumerate(parts)
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    assert idx.segment_count() == 3
    assert idx.meta()["n_rows"] == emb.count()
    assert sorted(idx.meta()["batch_tags"]) == ["t0", "t1"]


def test_sparse_index_compact_keeps_concurrent_append(
    spark, tables, tmp_path
):
    """r12 VERDICT item #1: an append that commits inside compact's
    merge window (after compact's snapshot read, before its manifest
    swap) must survive — pre-fix, the swap unconditionally set
    segments=[merged] and the appended segment's rows vanished from
    every future search. Deterministic staging: compact's segment
    write triggers the append, so the append's manifest entry lands
    first."""
    from pgvector_db_spark.operators.sparse_index import SparseIndex

    emb = tables["embeddings"]
    path = str(tmp_path / "sxrace")
    idx = SparseIndex.build(
        emb.filter("vec_id % 3 = 0"),
        path,
        eps=0.1,
        num_buckets=16,
        carry_cols=("label",),
    )
    idx.append(emb.filter("vec_id % 3 = 1"), batch_tag="b1")
    late = emb.filter("vec_id % 3 = 2")
    orig = SparseIndex._write_segment
    state = {"raced": False}

    def delayed(se, seg_path, num_buckets, id_col):
        n = orig(se, seg_path, num_buckets, id_col)
        if not state["raced"]:
            state["raced"] = True
            SparseIndex(spark, path).append(late, batch_tag="late")
        return n

    idx._write_segment = delayed
    idx.compact()
    assert state["raced"]
    # merged segment + the concurrently appended one, rows all present
    assert idx.segment_count() == 2
    assert idx.meta()["n_rows"] == emb.count()
    assert "late" in idx.meta()["batch_tags"]
    se = _sparse_frame(emb)
    q = se.filter("vec_id = 2").first()
    qi, qv = list(q["si"]), list(q["sv"])
    want = [tuple(r) for r in _sparse_scan_topk(se, qi, qv)]
    got = [tuple(r) for r in idx.search(qi, qv, k=10).collect()]
    assert got == want


def test_sparse_index_compact_vs_compact_retries(spark, tables, tmp_path):
    """Two compactions racing: the loser must detect its snapshot was
    already retired (committing its merge would double every row) and
    retry from the fresh single-segment view — converging, not
    duplicating."""
    from pgvector_db_spark.operators.sparse_index import SparseIndex

    emb = tables["embeddings"]
    path = str(tmp_path / "sxcc")
    idx = SparseIndex.build(
        emb.filter("vec_id % 2 = 0"),
        path,
        eps=0.1,
        num_buckets=16,
        carry_cols=("label",),
    )
    idx.append(emb.filter("vec_id % 2 = 1"), batch_tag="b1")
    orig = SparseIndex._write_segment
    state = {"raced": False}

    def delayed(se, seg_path, num_buckets, id_col):
        n = orig(se, seg_path, num_buckets, id_col)
        if not state["raced"]:
            state["raced"] = True
            SparseIndex(spark, path).compact()
        return n

    idx._write_segment = delayed
    idx.compact()
    assert state["raced"]
    assert idx.segment_count() == 1
    assert idx.meta()["n_rows"] == emb.count()
    se = _sparse_frame(emb)
    q = se.filter("vec_id = 5").first()
    qi, qv = list(q["si"]), list(q["sv"])
    want = [tuple(r) for r in _sparse_scan_topk(se, qi, qv)]
    got = [tuple(r) for r in idx.search(qi, qv, k=10).collect()]
    assert got == want


def test_sparse_index_compact_retention_and_vacuum(
    spark, tables, tmp_path
):
    """r12 VERDICT item #2: compact must NOT delete replaced segments —
    a search plan built from the pre-compact manifest still reads their
    files. They become manifest `replaced` tombstones; vacuum() clears
    the list first (atomic), then reclaims the dirs."""
    import os

    from pgvector_db_spark.operators.sparse_index import SparseIndex

    emb = tables["embeddings"]
    path = str(tmp_path / "sxret")
    idx = SparseIndex.build(
        emb.filter("vec_id % 2 = 0"),
        path,
        eps=0.1,
        num_buckets=16,
        carry_cols=("label",),
    )
    idx.append(emb.filter("vec_id % 2 = 1"), batch_tag="b1")
    old_segs = list(idx.meta()["segments"])
    se = _sparse_frame(emb)
    q = se.filter("vec_id = 4").first()
    qi, qv = list(q["si"]), list(q["sv"])
    # lazy plan resolved against the PRE-compact manifest
    stale_plan = idx.search(qi, qv, k=10)
    idx.compact()
    # replaced segments retained on disk and tombstoned in the manifest
    assert sorted(idx.meta()["replaced"]) == sorted(old_segs)
    for s in old_segs:
        assert os.path.isdir(os.path.join(path, s))
    want = [tuple(r) for r in _sparse_scan_topk(se, qi, qv)]
    # the stale reader still serves, bitwise
    assert [tuple(r) for r in stale_plan.collect()] == want
    # vacuum reclaims exactly the tombstoned dirs; search unaffected
    assert idx.vacuum() == len(old_segs)
    assert idx.meta()["replaced"] == []
    for s in old_segs:
        assert not os.path.isdir(os.path.join(path, s))
    assert idx.vacuum() == 0
    got = [tuple(r) for r in idx.search(qi, qv, k=10).collect()]
    assert got == want
