"""Phase-profile the streaming foreachBatch queries (r14 measure-first,
guide §1): reproduce stream_decontaminate_ingest's body with per-phase
wall timings + per-micro-batch durations from query.recentProgress, and
check empirically whether AQE/shuffle-partition coalescing applies to
jobs launched inside a foreachBatch sink.

Usage: python tools/profile_stream.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pgvector_db_spark import get_spark  # noqa: E402


def t(label, t0):
    dt = time.time() - t0
    print(f"  {label}: {dt:.3f}s", flush=True)
    return time.time()


def progress_report(q):
    for p in q.recentProgress:
        d = p["durationMs"]
        print(
            f"    batch {p['batchId']}: rows={p['numInputRows']} "
            f"triggerExecution={d.get('triggerExecution')}ms "
            f"addBatch={d.get('addBatch')}ms getBatch={d.get('getBatch')}ms "
            f"latestOffset={d.get('latestOffset')}ms "
            f"walCommit={d.get('walCommit')}ms "
            f"commitOffsets={d.get('commitOffsets')}ms",
            flush=True,
        )


def profile_decontam(spark, sf_dir):
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from pgvector_db_spark.catalog import table_path
    from pgvector_db_spark.operators.dedup import (
        _gram_postings,
        _overlap_aggregate,
        build_gram_bloom,
    )
    from pgvector_db_spark.queries import _fixture_tag
    from pgvector_db_spark.streaming.replay import (
        file_stream,
        stage_replay_splits,
    )

    print("stream_decontaminate_ingest phases:", flush=True)
    t0 = time.time()
    tag = _fixture_tag(sf_dir)
    doc_path = table_path(sf_dir, "documents")
    replay_dir = os.path.join(tempfile.gettempdir(), f"docs_replay4_{tag}")
    stage_replay_splits(spark, doc_path, replay_dir, n_files=4)
    t0 = t("stage_replay_splits", t0)
    schema = spark.read.parquet(doc_path).schema
    eval_docs = spark.read.parquet(doc_path).filter("doc_id % 97 = 0")
    ev_post, might_contain = build_gram_bloom(eval_docs, n=3)
    t0 = t("build_gram_bloom", t0)
    ev_post = ev_post.localCheckpoint(eager=True)
    t0 = t("ev_post checkpoint", t0)

    src = file_stream(spark, replay_dir, schema, max_files_per_trigger=1).filter(
        "doc_id % 97 != 0"
    )
    work = tempfile.mkdtemp(prefix="prof_decontam_")
    out_dir = os.path.join(work, "flagged")
    batch_times = []

    def sink(batch_df, epoch_id):
        bt0 = time.time()
        if batch_df.isEmpty():
            batch_times.append(("empty", time.time() - bt0))
            return
        bt1 = time.time()
        post = _gram_postings(batch_df, "text", "doc_id", 3, "train_id")
        pairs = _overlap_aggregate(
            post.filter(might_contain(F.col("_g"))), ev_post, 3
        )
        pairs.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"e{int(epoch_id)}")
        )
        batch_times.append(
            (f"isEmpty={bt1 - bt0:.3f} work={time.time() - bt1:.3f}",
             time.time() - bt0)
        )

    try:
        q = (
            src.writeStream.foreachBatch(sink)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
        t0 = t("stream run", t0)
        for i, (lbl, dt) in enumerate(batch_times):
            print(f"    sink batch {i}: {dt:.3f}s ({lbl})", flush=True)
        progress_report(q)
        out = spark.read.option("recursiveFileLookup", "true").parquet(out_dir)
        rows = out.collect()
        spark.createDataFrame(rows, out.schema)
        t0 = t("readback+collect+createDataFrame", t0)
        print(f"  flagged pairs: {len(rows)}", flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def check_aqe_in_foreachbatch(spark, sf_dir):
    """Does a groupBy inside a foreachBatch sink get AQE coalescing, and
    how many shuffle tasks does it schedule?"""
    import tempfile

    from pgvector_db_spark.catalog import table_path
    from pgvector_db_spark.queries import _fixture_tag
    from pgvector_db_spark.streaming.replay import (
        file_stream,
        stage_replay_splits,
    )

    tag = _fixture_tag(sf_dir)
    doc_path = table_path(sf_dir, "documents")
    replay_dir = os.path.join(tempfile.gettempdir(), f"docs_replay4_{tag}")
    stage_replay_splits(spark, doc_path, replay_dir, n_files=4)
    schema = spark.read.parquet(doc_path).schema
    src = file_stream(spark, replay_dir, schema, max_files_per_trigger=1)
    work = tempfile.mkdtemp(prefix="prof_aqe_")

    def sink(batch_df, epoch_id):
        if epoch_id != 0:
            return
        agg = batch_df.groupBy("source").count()
        plan = agg._sc._jvm.PythonSQLUtils.explainString(
            agg._jdf.queryExecution(), "formatted"
        )
        print("  plan head inside foreachBatch:", flush=True)
        for line in plan.splitlines()[:12]:
            print(f"    {line}", flush=True)
        print(f"  isStreaming={batch_df.isStreaming}", flush=True)
        st = spark.sparkContext.statusTracker()
        before = set(st.getJobIdsForGroup(None) or [])
        agg.count()
        after = set(st.getJobIdsForGroup(None) or [])
        ntasks = 0
        for jid in after - before:
            ji = st.getJobInfo(jid)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = st.getStageInfo(sid)
                if si is not None:
                    ntasks += si.numTasks
        print(f"  groupBy tasks inside sink: {ntasks}", flush=True)

    q = (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("profile_stream")
    t_all = time.time()
    profile_decontam(spark, sf_dir)
    print(f"total decontam: {time.time() - t_all:.3f}s", flush=True)
    print("\nAQE-in-foreachBatch check:", flush=True)
    check_aqe_in_foreachbatch(spark, sf_dir)


if __name__ == "__main__":
    main()
