"""Structured Streaming tests: replayed events through windowed aggregates
(checked against the batch oracle) + foreachBatch / append ingest
(A20/A21) + watermark late-data drop."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pgvector_db_spark.catalog import read_table
from pgvector_db_spark.sources.table import ParquetTable
from pgvector_db_spark.streaming.ingest import (
    stream_append,
    stream_insert,
    stream_upsert,
)
from pgvector_db_spark.streaming.replay import file_stream
from pgvector_db_spark.streaming.windows import batch_window_agg, tumbling_window_agg

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_replay_dir(spark, tmp_path_factory):
    """Events table re-written as 4 files so the file stream runs 4
    micro-batches (ordered by event_id — the reference's replay order)."""
    path = str(tmp_path_factory.mktemp("replay") / "events")
    ev = read_table(spark, SF_DIR, "events")
    ev.repartitionByRange(4, "event_id").write.parquet(path)
    return path


@pytest.fixture(scope="module")
def events_schema(spark, events_replay_dir):
    return spark.read.parquet(events_replay_dir).schema


def run_stream_to_memory(stream_df, name, mode="update"):
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return name


def test_windowed_agg_matches_batch_oracle(spark, events_replay_dir, events_schema):
    """Replaying all events through the streaming windowed agg must equal
    the same aggregate computed in batch (FIXTURES §3)."""
    stream = file_stream(spark, events_replay_dir, events_schema, max_files_per_trigger=1)
    # watermark wider than the table's full time span: nothing is late, so
    # stream total == batch total (late-drop has its own test below)
    agg = tumbling_window_agg(stream, watermark="60 days")
    run_stream_to_memory(agg, "win_update", mode="update")
    # "update" emits refinements; keep the final row per (window, group)
    got = spark.sql(
        """
        SELECT window_start, window_end, event_type, n_events, sum_value
        FROM (
          SELECT *, row_number() OVER (PARTITION BY window_start, event_type
                                       ORDER BY n_events DESC) AS rn
          FROM win_update
        ) WHERE rn = 1
        """
    ).collect()
    expected = batch_window_agg(spark.read.parquet(events_replay_dir)).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, expected))


def test_watermark_drops_late_data(spark, tmp_path):
    """A row older than watermark behind the max seen event time must be
    dropped from the final (append-mode) windows."""
    path = str(tmp_path / "late_events")
    schema = "ts timestamp, event_type string, value double"
    rows1 = [("2024-01-01 10:00:30", "a", 1.0), ("2024-01-01 10:20:00", "a", 1.0)]
    rows2 = [("2024-01-01 10:00:40", "a", 1.0)]  # 19+ min late vs max(10:20)
    flush = [("2024-01-01 11:00:00", "a", 1.0)]  # advances watermark past all
    for i, rows in enumerate([rows1, rows2, flush]):
        spark.createDataFrame(
            [(r[0], r[1], r[2]) for r in rows], "ts string, event_type string, value double"
        ).withColumn("ts", F.col("ts").cast("timestamp")).coalesce(1).write.mode(
            "append"
        ).parquet(path)

    stream = file_stream(
        spark, path, spark.read.parquet(path).schema, max_files_per_trigger=1
    )
    agg = tumbling_window_agg(stream, window_duration="5 minutes", watermark="10 minutes")
    q = (
        agg.writeStream.outputMode("append").format("memory").queryName("late_win").start()
    )
    q.processAllAvailable()
    q.stop()
    emitted = {
        (str(r["window_start"]), r["n_events"])
        for r in spark.sql("SELECT * FROM late_win").collect()
    }
    # File order isn't guaranteed == write order; whichever way the late row
    # landed, the 10:00 window must have 1 or 2 events and must be CLOSED
    # (emitted) once the watermark passed — and never count a dropped row
    # as a refinement after close.
    ten_oclock = [e for e in emitted if e[0].startswith("2024-01-01 10:00")]
    assert len(ten_oclock) == 1
    assert ten_oclock[0][1] in (1, 2)


def test_stream_insert_foreachbatch(spark, events_replay_dir, events_schema, tmp_path):
    """A20: foreachBatch → validated table insert, micro-batch at a time."""
    table = ParquetTable(spark, str(tmp_path / "sink"), required_cols=("event_id",))
    stream = file_stream(spark, events_replay_dir, events_schema, max_files_per_trigger=2)
    q = stream_insert(stream, table, checkpoint=str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()
    assert table.read().count() == 1000


def test_stream_append_exactly_once(spark, events_replay_dir, events_schema, tmp_path):
    """A21: parquet-append sink; restarting from the same checkpoint must
    not duplicate rows (exactly-once via the commit log)."""
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt2")
    stream = file_stream(spark, events_replay_dir, events_schema, max_files_per_trigger=1)
    q = stream_append(stream, out, ckpt)
    q.processAllAvailable()
    q.stop()
    assert spark.read.parquet(out).count() == 1000
    # restart: no new input → no new rows
    q2 = stream_append(
        file_stream(spark, events_replay_dir, events_schema), out, ckpt
    )
    q2.processAllAvailable()
    q2.stop()
    assert spark.read.parquet(out).count() == 1000


def test_stream_resume_from_checkpoint_after_new_data(spark, tmp_path):
    """Checkpoint recovery, the failure-mode case the plain restart test
    skips: stop after the first slice, land NEW source files, restart
    from the same checkpoint — the resumed query must pick up only the
    unseen files (no reprocessing, no gaps)."""
    import os
    import shutil

    ev = read_table(spark, SF_DIR, "events")
    replay = str(tmp_path / "src")
    stage = str(tmp_path / "stage")
    ev.filter("event_id < 500").repartition(2).write.parquet(stage)
    os.makedirs(replay)
    first = [f for f in os.listdir(stage) if f.endswith(".parquet")]
    for f in first:
        shutil.copy(os.path.join(stage, f), os.path.join(replay, f))

    schema = spark.read.parquet(stage).schema
    table = ParquetTable(
        spark, str(tmp_path / "sink"), required_cols=("event_id",)
    )
    ckpt = str(tmp_path / "ckpt")
    q = stream_insert(
        file_stream(spark, replay, schema, max_files_per_trigger=1),
        table,
        checkpoint=ckpt,
    )
    q.processAllAvailable()
    q.stop()
    n_first = ev.filter("event_id < 500").count()
    assert table.read().count() == n_first

    # second slice arrives while the stream is DOWN
    stage2 = str(tmp_path / "stage2")
    ev.filter("event_id >= 500").repartition(2).write.parquet(stage2)
    for f in os.listdir(stage2):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(stage2, f), os.path.join(replay, f))

    q2 = stream_insert(
        file_stream(spark, replay, schema, max_files_per_trigger=1),
        table,
        checkpoint=ckpt,
    )
    q2.processAllAvailable()
    q2.stop()
    total = ev.count()
    assert table.read().count() == total
    assert table.read().select("event_id").distinct().count() == total


def test_stream_upsert_key_unique_and_idempotent(
    spark, events_replay_dir, events_schema, tmp_path
):
    """Keyed merge sink: the table ends key-unique (one row per user_id),
    and restarting from the same checkpoint changes nothing."""
    table = ParquetTable(spark, str(tmp_path / "usink"), required_cols=("user_id",))
    stream = file_stream(
        spark, events_replay_dir, events_schema, max_files_per_trigger=2
    )
    q = stream_upsert(stream, table, "user_id", checkpoint=str(tmp_path / "uck"))
    q.processAllAvailable()
    q.stop()
    got = table.read()
    n_users = spark.read.parquet(events_replay_dir).select("user_id").distinct().count()
    assert got.count() == n_users
    assert got.select("user_id").distinct().count() == n_users
    # restart with no new input: idempotent
    q2 = stream_upsert(
        file_stream(spark, events_replay_dir, events_schema),
        table,
        "user_id",
        checkpoint=str(tmp_path / "uck"),
    )
    q2.processAllAvailable()
    q2.stop()
    assert table.read().count() == n_users


def test_stateful_running_counts_match_batch(spark, events_replay_dir, events_schema):
    from pgvector_db_spark.streaming.stateful import running_counts

    stream = file_stream(spark, events_replay_dir, events_schema, max_files_per_trigger=1)
    run_stream_to_memory(running_counts(stream, "user_id"), "run_counts", mode="update")
    # last update per key == batch total
    got = {
        r["user_id"]: r["running_count"]
        for r in spark.sql(
            """SELECT user_id, max(running_count) AS running_count
               FROM run_counts GROUP BY user_id"""
        ).collect()
    }
    batch = read_table(spark, SF_DIR, "events")
    want = {
        r["user_id"]: r["cnt"]
        for r in batch.groupBy("user_id").agg(F.count("*").alias("cnt")).collect()
    }
    assert got == want


def test_stateful_first_seen_dedups_keys(spark, events_replay_dir, events_schema):
    from pgvector_db_spark.streaming.stateful import first_seen

    stream = file_stream(spark, events_replay_dir, events_schema, max_files_per_trigger=1)
    run_stream_to_memory(first_seen(stream, "user_id", "ts"), "first_seen_t", mode="update")
    rows = spark.sql("SELECT user_id FROM first_seen_t").collect()
    keys = [r["user_id"] for r in rows]
    # each key emitted exactly once across all micro-batches
    assert len(keys) == len(set(keys))
    n_distinct = read_table(spark, SF_DIR, "events").select("user_id").distinct().count()
    assert len(keys) == n_distinct


def test_streaming_embed_pipeline_matches_batch(spark, tmp_path):
    """A12 + A21 composed: replayed documents embedded in-stream with the
    deterministic embedder produce exactly the batch-path embeddings."""
    from pgvector_db_spark.functions.embedding import embed_text

    docs = read_table(spark, SF_DIR, "documents").select("doc_id", "text").limit(100)
    src = str(tmp_path / "docs_src")
    docs.repartitionByRange(2, "doc_id").write.parquet(src)
    schema = spark.read.parquet(src).schema

    stream = file_stream(spark, src, schema, max_files_per_trigger=1)
    embedded = embed_text(stream, model="fake", dim=8)
    run_stream_to_memory(embedded, "stream_embed", mode="append")

    got = {
        r["doc_id"]: tuple(r["embedding"])
        for r in spark.sql("SELECT doc_id, embedding FROM stream_embed").collect()
    }
    want = {
        r["doc_id"]: tuple(r["embedding"])
        for r in embed_text(docs, model="fake", dim=8).collect()
    }
    assert got == want


def test_stream_static_broadcast_enrichment(spark, events_replay_dir, events_schema):
    """Stream-static join: the streaming side enriches against a static
    dimension each micro-batch; the dim side broadcasts (map-side only)."""
    dim = spark.createDataFrame(
        [("click", 1.0), ("purchase", 5.0), ("view", 0.5), ("signup", 2.0),
         ("error", 0.0)],
        ["event_type", "weight"],
    )
    stream = file_stream(spark, events_replay_dir, events_schema, max_files_per_trigger=2)
    enriched = stream.join(F.broadcast(dim), "event_type").withColumn(
        "weighted", F.col("value") * F.col("weight")
    )
    run_stream_to_memory(enriched, "enriched_t", mode="append")
    got = spark.sql("SELECT count(*) AS n FROM enriched_t").first()["n"]
    want = read_table(spark, SF_DIR, "events").count()
    assert got == want


def test_streaming_dropduplicates_with_watermark(spark, tmp_path):
    """Built-in streaming dedup: duplicate event_ids within the watermark
    horizon are emitted once."""
    import datetime as dt

    rows = [
        (i % 50, dt.datetime(2024, 1, 1, 0, i % 50, 0)) for i in range(100)
    ]  # every id appears twice
    src = str(tmp_path / "dups")
    spark.createDataFrame(rows, "event_id bigint, ts timestamp").repartition(
        2
    ).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = file_stream(spark, src, schema, max_files_per_trigger=1)
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicates(["event_id"])
    run_stream_to_memory(deduped, "dedup_t", mode="append")
    got = spark.sql("SELECT event_id FROM dedup_t").collect()
    ids = [r["event_id"] for r in got]
    assert len(ids) == 50 and len(set(ids)) == 50


def test_streaming_dropduplicates_within_watermark(spark, tmp_path):
    """`dropDuplicatesWithinWatermark` (Spark 3.5+): like streaming
    dropDuplicates but state is TTL'd at the watermark — the right dedup
    for unbounded key spaces where plain dropDuplicates state grows
    forever. Dups inside the horizon collapse to one emitted row."""
    import datetime as dt

    rows = [
        (i % 50, dt.datetime(2024, 1, 1, 0, i % 50, 0)) for i in range(100)
    ]
    src = str(tmp_path / "dups_wwm")
    spark.createDataFrame(rows, "event_id bigint, ts timestamp").repartition(
        2
    ).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = file_stream(spark, src, schema, max_files_per_trigger=1)
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    run_stream_to_memory(deduped, "dedup_wwm_t", mode="append")
    ids = [r["event_id"] for r in spark.sql("SELECT event_id FROM dedup_wwm_t").collect()]
    assert len(ids) == 50 and len(set(ids)) == 50


def test_transform_with_state_running_totals(spark, events_replay_dir, events_schema):
    """Spark 4 transformWithState: per-key running count+sum matches the
    batch aggregate after the last micro-batch.

    The TWS state-server protocol needs `google.protobuf` in the Python
    workers; environments without it can only run the
    applyInPandasWithState operators (covered above), so skip there."""
    pytest.importorskip("google.protobuf")
    from pgvector_db_spark.streaming.stateful import running_totals_tws

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = file_stream(
            spark, events_replay_dir, events_schema, max_files_per_trigger=1
        )
        run_stream_to_memory(
            running_totals_tws(stream, "user_id", "value"), "tws_totals", mode="update"
        )
        got = {
            r["user_id"]: (r["running_count"], round(r["running_sum"], 6))
            for r in spark.sql(
                """SELECT user_id, max(running_count) AS running_count,
                          max(running_sum) AS running_sum
                   FROM tws_totals GROUP BY user_id"""
            ).collect()
        }
        batch = read_table(spark, SF_DIR, "events")
        want = {
            r["user_id"]: (r["cnt"], round(r["s"], 6))
            for r in batch.groupBy("user_id")
            .agg(F.count("*").alias("cnt"), F.sum("value").alias("s"))
            .collect()
        }
        assert got == want
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_continuous_rollup_equals_batch(spark, events_replay_dir, events_schema, tmp_path):
    """The incrementally-maintained rollup table must equal the batch
    rollup bitwise after the stream drains (decimal merge is exact)."""
    from pgvector_db_spark.sources.table import ParquetTable
    from pgvector_db_spark.streaming.continuous_agg import (
        batch_rollup_level,
        continuous_rollup,
    )

    table = ParquetTable(spark, str(tmp_path / "rollup"))
    stream = file_stream(spark, events_replay_dir, events_schema, max_files_per_trigger=1)
    q = continuous_rollup(
        stream, table, checkpoint=str(tmp_path / "ckpt"), width_sec=300
    )
    q.processAllAvailable()
    q.stop()

    got = {
        r["bucket_epoch"]: (r["n_events"], r["sum_dec"])
        for r in table.read().collect()
    }
    batch = read_table(spark, SF_DIR, "events")
    want = {
        r["bucket_epoch"]: (r["n_events"], r["sum_dec"])
        for r in batch_rollup_level(batch, width_sec=300).collect()
    }
    assert got == want


def test_session_window_stream_matches_batch(spark, events_replay_dir, events_schema):
    """Streaming session windows must converge to the batch
    session_window result. Spark 4 restricts streaming session-window
    aggregation to append/complete output; complete mode makes the memory
    sink hold exactly the final merged sessions (dynamic windows that
    merged across micro-batches collapse into one row)."""
    from pgvector_db_spark.streaming.windows import (
        batch_session_window_agg,
        session_window_agg,
    )

    stream = file_stream(spark, events_replay_dir, events_schema, max_files_per_trigger=1)
    agg = session_window_agg(stream, gap="30 minutes", watermark="60 days")
    run_stream_to_memory(agg, "sess_complete", mode="complete")
    got = spark.sql(
        "SELECT user_id, session_start, session_end, n_events FROM sess_complete"
    ).collect()
    expected = batch_session_window_agg(
        spark.read.parquet(events_replay_dir), gap="30 minutes"
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, expected))
    assert sum(r.n_events for r in expected) == spark.read.parquet(events_replay_dir).count()


def test_session_window_exact_gap_boundary_merges(spark, tmp_path):
    """An event landing EXACTLY `gap` after its predecessor MERGES into
    the session (pinned empirically — r3's verdict assumed the opposite,
    which this fixture disproved): session_window reports half-open
    [start, last+gap) spans, but its merge condition is inclusive of the
    span end. The islands oracle must therefore use `>` (strictly
    greater starts a new session), and batch and streaming engines must
    agree at the boundary."""
    from datetime import datetime, timedelta

    from pgvector_db_spark.streaming.windows import (
        batch_session_window_agg,
        session_window_agg,
    )

    t0 = datetime(2024, 1, 1, 12, 0, 0)
    gap = timedelta(minutes=30)
    rows = [
        # user 1: second event lands exactly at t0+gap -> MERGES
        (1, t0),
        (1, t0 + gap),
        (1, t0 + gap + timedelta(seconds=10)),
        # user 2: second event 1µs PAST the boundary -> new session
        (2, t0),
        (2, t0 + gap + timedelta(microseconds=1)),
    ]
    ev = spark.createDataFrame(rows, "user_id bigint, ts timestamp")
    got = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in batch_session_window_agg(ev, gap="30 minutes").collect()
    }
    expected = {
        (1, t0, 3),                                    # boundary merged
        (2, t0, 1),                                    # 1µs past: split
        (2, t0 + gap + timedelta(microseconds=1), 1),
    }
    assert got == expected
    # the islands oracle with `>` agrees at the exact boundary
    ev.createOrReplaceTempView("ev_boundary")
    islands = spark.sql(
        """
        WITH e AS (
          SELECT user_id, ts,
                 CASE WHEN lag(ts) OVER w IS NULL
                           OR unix_micros(ts) - unix_micros(lag(ts) OVER w)
                              > 1800000000
                      THEN 1 ELSE 0 END AS new_sess
          FROM ev_boundary
          WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC)
        ),
        s AS (
          SELECT user_id, ts,
                 SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts ASC
                                     ROWS UNBOUNDED PRECEDING) AS session_no
          FROM e
        )
        SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
        FROM s GROUP BY user_id, session_no
        """
    )
    assert {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in islands.collect()
    } == expected
    # and the STREAMING engine agrees with batch at the boundary
    src_dir = str(tmp_path / "boundary_events")
    ev.coalesce(1).write.parquet(src_dir)
    stream = file_stream(spark, src_dir, ev.schema)
    agg = session_window_agg(stream, gap="30 minutes", watermark="60 days")
    run_stream_to_memory(agg, "sess_boundary", mode="complete")
    got_stream = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in spark.sql(
            "SELECT user_id, session_start, n_events FROM sess_boundary"
        ).collect()
    }
    assert got_stream == expected


def test_batch_session_window_matches_sql_islands(spark, events_replay_dir):
    """F.session_window semantics cross-checked against the independent
    lag/running-sum islands formulation (rel_sessionize_events): same
    session starts and sizes; session_end differs by exactly the gap
    (session_window pads last event + gap)."""
    from pgvector_db_spark.streaming.windows import batch_session_window_agg

    ev = spark.read.parquet(events_replay_dir)
    sw = batch_session_window_agg(ev, gap="30 minutes").select(
        "user_id",
        F.unix_micros("session_start").alias("start_us"),
        (F.unix_micros("session_end") - 1800_000_000).alias("last_us"),
        "n_events",
    )
    ev.createOrReplaceTempView("ev_sessions_src")
    islands = spark.sql(
        """
        WITH e AS (
          SELECT user_id, event_id, ts,
                 CASE WHEN lag(ts) OVER w IS NULL
                           OR unix_micros(ts) - unix_micros(lag(ts) OVER w)
                              > 1800000000
                      THEN 1 ELSE 0 END AS new_sess
          FROM ev_sessions_src
          WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        ),
        s AS (
          SELECT user_id, ts,
                 SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts ASC,
                                     event_id ASC ROWS UNBOUNDED PRECEDING)
                     AS session_no
          FROM e
        )
        SELECT user_id, MIN(unix_micros(ts)) AS start_us,
               MAX(unix_micros(ts)) AS last_us, COUNT(*) AS n_events
        FROM s GROUP BY user_id, session_no
        """
    )
    assert sorted(map(tuple, sw.collect())) == sorted(map(tuple, islands.collect()))


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Stream-stream interval join (click -> purchase within 30 min, same
    user) replayed over micro-batches must equal the batch range join.
    Both sides carry watermarks, which is what lets Spark bound and evict
    join state on unbounded streams."""
    from pgvector_db_spark.streaming.joins import interval_join

    ev = read_table(spark, SF_DIR, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    cdir, pdir = str(tmp_path / "clicks"), str(tmp_path / "purchases")
    clicks.repartitionByRange(3, "click_id").write.parquet(cdir)
    purchases.repartitionByRange(3, "purchase_id").write.parquet(pdir)

    cs = file_stream(spark, cdir, clicks.schema, max_files_per_trigger=1)
    ps = file_stream(spark, pdir, purchases.schema, max_files_per_trigger=1)
    joined = interval_join(
        cs, ps, "user_id", max_delay="30 minutes", watermark="365 days"
    ).select("user_id", "l_click_id", "r_purchase_id")
    run_stream_to_memory(joined, "ssj", mode="append")
    got = spark.sql("SELECT * FROM ssj").collect()

    expected = (
        interval_join(
            spark.read.parquet(cdir),
            spark.read.parquet(pdir),
            "user_id",
            max_delay="30 minutes",
        )
        .select("user_id", "l_click_id", "r_purchase_id")
        .collect()
    )
    assert len(expected) > 0
    assert sorted(map(tuple, got)) == sorted(map(tuple, expected))


def test_stream_into_vector_table_keeps_index_fresh(spark, tmp_path):
    """The reference's notebook loop (embed one text -> insert -> query,
    ipynb:118-241) as real Structured Streaming into the VectorTable
    facade: each micro-batch runs the validated insert (SERIAL ids) and
    lands in the ivfflat index without a rebuild."""
    from pgvector_db_spark.vector_table import VectorTable

    src = str(tmp_path / "src")
    rows = [(f"t{i}", [float(i % 5), float((i * 3) % 7), 1.0]) for i in range(30)]
    df = spark.createDataFrame(rows, "text string, embedding array<float>")
    df.repartition(3).write.parquet(src)

    vt = VectorTable.create(spark, str(tmp_path / "vt"), dim=3)
    vt.insert(df.limit(10))
    vt.create_index(lists=2)

    stream = file_stream(
        spark, src, "text string, embedding array<float>", max_files_per_trigger=1
    )
    q = stream_insert(stream, vt, checkpoint=str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()
    assert vt.count() == 40
    # streamed rows are searchable through the probed (index) path
    got = vt.search([2.0, 6.0, 1.0], k=40, probes=2)
    assert got.count() == 40


def test_lsh_layout_append(spark, tmp_path):
    from pgvector_db_spark.operators.lsh_ann import (
        append_lsh_layout,
        build_lsh_layout,
        search_lsh_layout,
    )

    base = spark.createDataFrame(
        [(i, [float(i % 3) - 1.0, float((i * 7) % 5) - 2.0, 0.5]) for i in range(50)],
        "vec_id long, embedding array<float>",
    )
    path = str(tmp_path / "lsh")
    build_lsh_layout(base, path, num_bits=4)
    extra = spark.createDataFrame(
        [(100, [9.0, 9.0, 9.0])], "vec_id long, embedding array<float>"
    )
    append_lsh_layout(extra, path, num_bits=4)
    # the appended row is found through the probed path (its own bucket)
    got = search_lsh_layout(spark, path, [9.0, 9.0, 9.0], 1, num_bits=4, hamming_probe=0)
    assert [r["vec_id"] for r in got.collect()] == [100]
    # full-probe still returns everything
    allrows = search_lsh_layout(
        spark, path, [1.0, 0.0, 0.0], 51, num_bits=4, hamming_probe=4
    )
    assert allrows.count() == 51


def test_stream_ann_search_matches_batch(spark, tables, tmp_path):
    """Streaming ANN (foreachBatch over a replayed query stream) returns
    EXACTLY what one batch_search over the same queries returns at the
    same partial nprobe — micro-batching must not change the probe set
    or ranking."""
    from pgvector_db_spark.operators.ivf import IVFIndex
    from pgvector_db_spark.streaming.ann import stream_ann_search
    from pgvector_db_spark.streaming.replay import file_stream

    emb = tables["embeddings"]
    idx = IVFIndex.build(emb, str(tmp_path / "idx"), lists=8)

    queries = emb.filter("vec_id <= 4").selectExpr(
        "vec_id AS query_id", "embedding AS query_vec"
    )
    replay = str(tmp_path / "replay")
    # two files -> two micro-batches with maxFilesPerTrigger=1
    queries.filter("query_id <= 2").coalesce(1).write.parquet(replay)
    queries.filter("query_id > 2").coalesce(1).write.mode("append").parquet(replay)

    src = file_stream(spark, replay, queries.schema, max_files_per_trigger=1)
    q = stream_ann_search(
        src, idx, out_path=str(tmp_path / "res"),
        checkpoint=str(tmp_path / "ckpt"), k=5, nprobe=2, mode="distributed",
    )
    q.awaitTermination()
    got = sorted(
        map(
            tuple,
            spark.read.parquet(str(tmp_path / "res")).drop("batch_id").collect(),
        )
    )
    want = sorted(
        map(tuple, idx.batch_search(queries, k=5, nprobe=2).collect())
    )
    assert got == want


def test_entropy_monitor_matches_batch_histogram(spark):
    """The streaming monitor's map-side HOF entropy (array-literal ln
    grid, no join) must reproduce the batch join-pipeline histogram
    (ds_token_entropy binned) bitwise — two independent Spark spellings
    of the same integer arithmetic."""
    from pyspark.sql import functions as F

    from pgvector_db_spark.queries import REGISTRY
    from tests.conftest import SF_DIR

    got = {
        r["bin"]: r["n_docs"]
        for r in REGISTRY["stream_entropy_histogram_monitor"]
        .spark_fn(spark, SF_DIR)
        .collect()
    }
    want = {
        r["bin"]: r["n"]
        for r in REGISTRY["ds_token_entropy"]
        .spark_fn(spark, SF_DIR)
        .select(
            F.expr(
                "CAST(floor(entropy_micro / 500000.0) AS BIGINT)"
            ).alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .collect()
    }
    assert got == want
    assert sum(got.values()) > 0
