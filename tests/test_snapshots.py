"""SnapshotTable: time-travel invariants the oracle query can't cover —
version immutability across commits, vacuum GC, leaked-file cleanup,
history introspection, validation errors."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pgvector_db_spark.sources.snapshots import SnapshotTable
from pgvector_db_spark.sources.table import SchemaValidationError


@pytest.fixture()
def st(spark, tmp_path):
    return SnapshotTable(
        spark, str(tmp_path / "t"), required_cols=("k",)
    )


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, v string")


def test_insert_accumulates_and_versions_are_immutable(spark, st):
    assert st.insert(_df(spark, [(1, "a"), (2, "b")])) == 1
    assert st.insert(_df(spark, [(3, "c")])) == 2
    assert st.read(version=1).count() == 2
    assert st.read(version=2).count() == 3
    assert st.read().count() == 3  # latest
    v1_rows = sorted(map(tuple, st.read(version=1).collect()))
    st.overwrite(_df(spark, [(9, "z")]))
    # the old snapshot is byte-identical after a later commit
    assert sorted(map(tuple, st.read(version=1).collect())) == v1_rows
    assert st.read().count() == 1


def test_upsert_merges_and_keeps_parent(spark, st):
    st.insert(_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    st.upsert(_df(spark, [(2, "B"), (4, "d")]), "k")
    latest = {r["k"]: r["v"] for r in st.read().collect()}
    assert latest == {1: "a", 2: "B", 3: "c", 4: "d"}
    parent = {r["k"]: r["v"] for r in st.read(version=1).collect()}
    assert parent == {1: "a", 2: "b", 3: "c"}


def test_vacuum_drops_old_versions_and_leaked_files(spark, st):
    st.insert(_df(spark, [(1, "a")]))
    st.overwrite(_df(spark, [(2, "b")]))
    # simulate a crashed commit: a data file no manifest references
    leak = os.path.join(str(st._data_dir()), "part-leaked.parquet")
    with open(leak, "wb") as f:
        f.write(b"not really parquet")
    removed = st.vacuum(keep_last=1)
    assert removed >= 2  # v1's file(s) + the leaked file
    assert st.versions() == [2]
    assert st.read().count() == 1
    with pytest.raises(FileNotFoundError):
        st.manifest(1)


def test_history_matches_commits(spark, st):
    st.insert(_df(spark, [(1, "a")]))
    st.insert(_df(spark, [(2, "b")]))
    st.upsert(_df(spark, [(1, "A")]), "k")
    hist = [tuple(r) for r in st.history().collect()]
    assert [h[0] for h in hist] == [1, 2, 3]
    assert [h[2] for h in hist] == ["insert", "insert", "upsert"]
    assert hist[1][4] == 2  # n_rows accumulates across inserts
    assert hist[2][4] == 2  # upsert replaced one key, added none


def test_validation_rejects_missing_required_col(spark, st):
    bad = spark.createDataFrame([(1,)], "x int")
    with pytest.raises(SchemaValidationError):
        st.insert(bad)


def test_empty_table_read_raises(st):
    with pytest.raises(FileNotFoundError):
        st.read()


def test_concurrent_inserts_lose_no_commit(spark, st):
    """Six threads insert concurrently: the manifest lock must serialize
    commits so every one lands as its own version — no lost update, no
    version gap, and the final snapshot holds every row exactly once."""
    from concurrent.futures import ThreadPoolExecutor

    def ins(i: int) -> int:
        return st.insert(_df(spark, [(i * 10 + j, f"v{i}") for j in range(3)]))

    with ThreadPoolExecutor(max_workers=6) as ex:
        versions = sorted(ex.map(ins, range(6)))
    assert versions == [1, 2, 3, 4, 5, 6]
    assert st.latest_version() == 6
    rows = st.read().collect()
    assert len(rows) == 18
    assert len({r["k"] for r in rows}) == 18
    # every intermediate version remains readable with cumulative rows
    for v in versions:
        assert st.read(version=v).count() == st.manifest(v)["n_rows"]


def test_schema_evolution_add_column(spark, st):
    st.insert(_df(spark, [(1, "a"), (2, "b")]))
    df2 = spark.createDataFrame(
        [(3, "c", 30), (4, "d", 40)], "k int, v string, score int"
    )
    st.insert(df2)
    # latest read: evolved schema; pre-change files NULL-fill score
    latest = st.read()
    assert latest.columns == ["k", "v", "score"]
    got = {r["k"]: r["score"] for r in latest.collect()}
    assert got == {1: None, 2: None, 3: 30, 4: 40}
    # time travel: v1 still has exactly the narrower schema and rows
    v1 = st.read(version=1)
    assert v1.columns == ["k", "v"]
    assert sorted(map(tuple, v1.collect())) == [(1, "a"), (2, "b")]


def test_schema_evolution_omission_fills_and_retype_raises(spark, st):
    st.insert(_df(spark, [(1, "a")]))
    # a batch may omit known columns: its rows NULL-fill on read
    # (Delta semantics — the schema only grows, "drop" is omission)
    st.insert(spark.createDataFrame([(2,)], "k int"))
    got = {r["k"]: r["v"] for r in st.read().collect()}
    assert got == {1: "a", 2: None}
    assert st.read().columns == ["k", "v"]
    with pytest.raises(ValueError, match="retype"):
        st.insert(spark.createDataFrame([(3, 5)], "k int, v int"))
    # failed evolution commits nothing
    assert st.latest_version() == 2


def test_schema_evolution_upsert_null_fills_survivors(spark, st):
    st.insert(_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    patch = spark.createDataFrame(
        [(2, "B", 99)], "k int, v string, score int"
    )
    st.upsert(patch, key="k")
    got = {
        r["k"]: (r["v"], r["score"]) for r in st.read().collect()
    }
    assert got == {1: ("a", None), 2: ("B", 99), 3: ("c", None)}
    # parent version unaffected
    assert st.read(version=1).columns == ["k", "v"]


def test_checkpointed_log_bounds_metadata_reads(spark, tmp_path):
    """r10 VERDICT item #6: a many-commit table opens with O(1)
    metadata reads — nearest checkpoint + tail deltas, never the whole
    log — and time travel stays exact across checkpoint boundaries."""
    st = SnapshotTable(
        spark, str(tmp_path / "ck"), required_cols=("k",),
        checkpoint_interval=10,
    )
    for i in range(1, 26):
        st.insert(_df(spark, [(i, f"r{i}")]))
    # checkpoints materialized on schedule; _last_checkpoint tracks
    assert os.path.exists(st._checkpoint_path(10))
    assert os.path.exists(st._checkpoint_path(20))
    assert not os.path.exists(st._checkpoint_path(25))
    from pgvector_db_spark.sources.commitlog import read_json

    assert read_json(st._last_checkpoint_path())["version"] == 20
    # reading v25 opens cp20 + deltas 21..25 (+ the target manifest)
    assert st.read(version=25).count() == 25
    assert st.last_metadata_reads <= st.checkpoint_interval + 2
    # time travel exact at every boundary shape: pre-checkpoint,
    # at-checkpoint, just-after-checkpoint
    for v in (1, 9, 10, 11, 20, 25):
        assert st.read(version=v).count() == v
        assert st.last_metadata_reads <= st.checkpoint_interval + 2


def test_vacuum_recheckpoints_oldest_kept_version(spark, tmp_path):
    st = SnapshotTable(
        spark, str(tmp_path / "vk"), required_cols=("k",),
        checkpoint_interval=100,  # no scheduled checkpoints in range
    )
    for i in range(1, 13):
        st.insert(_df(spark, [(i, f"r{i}")]))
    st.vacuum(keep_last=3)
    # dropped manifests are gone; kept versions all resolve exactly
    assert st.versions() == [10, 11, 12]
    assert not os.path.exists(st._manifest_path(9))
    # the oldest kept version was checkpointed before the chain below
    # it was deleted — that's what keeps it resolvable
    assert os.path.exists(st._checkpoint_path(10))
    for v in (10, 11, 12):
        assert st.read(version=v).count() == v
    with pytest.raises(FileNotFoundError):
        st.read(version=9)


def test_vacuum_deletes_unreferenced_files_with_delta_log(spark, tmp_path):
    st = SnapshotTable(
        spark, str(tmp_path / "vd"), required_cols=("k",),
        checkpoint_interval=100,
    )
    st.insert(_df(spark, [(1, "a")]))
    st.insert(_df(spark, [(2, "b")]))
    st.overwrite(_df(spark, [(9, "z")]))
    st.insert(_df(spark, [(10, "y")]))
    # every file of the pre-overwrite chain is unreferenced by v3/v4
    n_pre_overwrite = len(st._resolve_files(2)[0])
    removed = st.vacuum(keep_last=2)
    assert removed == n_pre_overwrite > 0
    assert sorted(r["k"] for r in st.read().collect()) == [9, 10]
    assert sorted(r["k"] for r in st.read(version=3).collect()) == [9]


def test_legacy_full_manifest_log_still_reads(spark, tmp_path):
    """Pre-r11 logs stored the full file list in every manifest; a new
    delta commit on top of such a log must resolve against it."""
    import json

    st = SnapshotTable(
        spark, str(tmp_path / "lg"), required_cols=("k",)
    )
    st.insert(_df(spark, [(1, "a"), (2, "b")]))
    # rewrite v1 into the legacy self-contained form
    m = st.manifest(1)
    legacy = {
        "version": 1, "parent": 0, "op": "insert",
        "files": m["add"], "n_rows": m["n_rows"], "schema": m["schema"],
    }
    with open(st._manifest_path(1), "w") as f:
        json.dump(legacy, f)
    st.insert(_df(spark, [(3, "c")]))
    assert st.read(version=1).count() == 2
    assert st.read(version=2).count() == 3
    assert st.last_metadata_reads <= st.checkpoint_interval + 2


def test_concurrent_insert_with_add_column_keeps_schema(spark, tmp_path):
    """The r10 ADVICE race, closed in r11: _evolve_schema now runs
    INSIDE the commit lock, so a writer committing concurrently with an
    ADD COLUMN writer cannot produce a manifest that lists the wide
    files but omits the new column (which the manifest-schema read path
    would then silently drop). Two threads race narrow/wide inserts;
    whatever the commit order, the final schema must contain the added
    column and every row must survive."""
    import threading

    st = SnapshotTable(
        spark, str(tmp_path / "race"), required_cols=("k",)
    )
    st.insert(_df(spark, [(0, "seed")]))

    narrow = _df(spark, [(i, f"n{i}") for i in range(1, 6)])
    wide = spark.createDataFrame(
        [(i, f"w{i}", i * 10) for i in range(6, 11)],
        "k int, v string, extra int",
    )
    errs = []

    def _ins(df):
        try:
            st.insert(df)
        except Exception as e:  # pragma: no cover - diagnostic
            errs.append(e)

    ts = [threading.Thread(target=_ins, args=(d,)) for d in (narrow, wide)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    final = st.read()
    assert "extra" in final.columns
    rows = {r["k"]: r["extra"] for r in final.collect()}
    assert len(rows) == 11
    # wide rows keep their values; narrow/seed rows NULL-fill
    assert all(rows[k] == k * 10 for k in range(6, 11))
    assert all(rows[k] is None for k in range(0, 6))


def test_insert_txn_idempotence_replays_are_noops(spark, st):
    """Delta-style (txn_app, txn_version) idempotent writes (r11
    ADVICE): a replayed insert with the same app at the same or lower
    version commits nothing and returns the current version."""
    v1 = st.insert(_df(spark, [(1, "a")]), txn_app="w", txn_version=0)
    assert v1 == 1
    # exact replay: no new version, no duplicate rows
    assert st.insert(_df(spark, [(1, "a")]), txn_app="w", txn_version=0) == 1
    # stale replay (lower version) is also a no-op
    assert st.insert(_df(spark, [(9, "x")]), txn_app="w", txn_version=-1) == 1
    assert st.read().count() == 1
    # a HIGHER version commits; an independent app is unaffected
    assert st.insert(_df(spark, [(2, "b")]), txn_app="w", txn_version=1) == 2
    assert st.insert(_df(spark, [(3, "c")]), txn_app="z", txn_version=0) == 3
    assert st.read().count() == 3
    assert st.last_txn_version("w") == 1
    assert st.last_txn_version("z") == 0
    assert st.last_txn_version("never") == -1


def test_insert_txn_partial_batch_retry_window(spark, st):
    """The exact window the table-level last-bid guard left open: a
    micro-batch commits two slices under two apps; a retry after the
    FIRST slice landed must skip it and still land the second."""
    st.insert(_df(spark, [(2, "even")]), txn_app="narrow", txn_version=5)
    # retry of batch 5 replays both inserts
    st.insert(_df(spark, [(2, "even")]), txn_app="narrow", txn_version=5)
    st.insert(_df(spark, [(3, "odd")]), txn_app="wide", txn_version=5)
    rows = sorted((r["k"], r["v"]) for r in st.read().collect())
    assert rows == [(2, "even"), (3, "odd")]
    assert st.latest_version() == 2


def test_insert_txn_map_survives_overwrite_and_upsert(spark, st):
    """overwrite/upsert roll the txn map forward, so a replayed insert
    arriving after a compaction-style rewrite is still skipped."""
    st.insert(_df(spark, [(1, "a")]), txn_app="w", txn_version=7)
    st.overwrite(_df(spark, [(1, "A")]))
    st.upsert(_df(spark, [(2, "b")]), "k")
    assert st.last_txn_version("w") == 7
    v = st.latest_version()
    assert st.insert(_df(spark, [(1, "dup")]), txn_app="w", txn_version=7) == v
    assert st.read().count() == 2


def test_insert_txn_args_must_come_together(spark, st):
    with pytest.raises(ValueError):
        st.insert(_df(spark, [(1, "a")]), txn_app="w")
    with pytest.raises(ValueError):
        st.insert(_df(spark, [(1, "a")]), txn_version=3)


def test_vacuum_keep_last_zero_removes_stale_checkpoint_pointer(
    spark, tmp_path
):
    """r11 ADVICE: keep_last=0 deletes every checkpoint — the
    _last_checkpoint pointer must be removed too, not left pointing at
    a deleted file."""
    st = SnapshotTable(
        spark, str(tmp_path / "v0"), required_cols=("k",),
        checkpoint_interval=2,
    )
    for i in range(1, 5):
        st.insert(_df(spark, [(i, "x")]))
    assert os.path.exists(st._last_checkpoint_path())
    st.vacuum(keep_last=0)
    assert st.versions() == []
    assert not os.path.exists(st._last_checkpoint_path())


def test_compact_binpacks_copy_on_write(spark, st):
    """compact() commits a bin-packed rewrite as a NEW version: fewer
    files, identical rows, parent versions still time-travel over their
    original fragments until vacuum GCs them."""
    for i in range(1, 7):
        st.insert(_df(spark, [(i, f"r{i}"), (i + 100, f"s{i}")]))
    files_before = len(st._resolve_files(6)[0])
    assert files_before >= 6
    rows_before = sorted(map(tuple, st.read().collect()))

    v = st.compact()
    assert v == 7
    assert len(st._resolve_files(7)[0]) < files_before
    assert sorted(map(tuple, st.read().collect())) == rows_before
    # copy-on-write: pre-compact versions unharmed
    assert st.read(version=3).count() == 6
    # already-packed table: no-op, no new version
    assert st.compact() == 7
    assert st.latest_version() == 7
    # vacuum GCs the fragments; the survivor still reads exactly
    removed = st.vacuum(keep_last=1)
    assert removed >= files_before
    assert sorted(map(tuple, st.read().collect())) == rows_before


def test_compact_empty_table_raises(spark, st):
    with pytest.raises(FileNotFoundError):
        st.compact()


def test_read_changes_per_version_add_sets(spark, st):
    """read_changes returns exactly the rows each insert added, stamped
    with _commit_version; ranges are (since, end]."""
    st.insert(_df(spark, [(1, "a"), (2, "b")]))
    st.insert(_df(spark, [(3, "c")]))
    st.insert(_df(spark, [(4, "d"), (5, "e")]))
    ch = st.read_changes(0).collect()
    assert sorted((r["k"], r["_commit_version"]) for r in ch) == [
        (1, 1), (2, 1), (3, 2), (4, 3), (5, 3),
    ]
    tail = st.read_changes(1, 2).collect()
    assert [(r["k"], r["_commit_version"]) for r in tail] == [(3, 2)]
    with pytest.raises(ValueError):
        st.read_changes(3)  # empty range


def test_read_changes_rejects_non_append_commits(spark, st):
    st.insert(_df(spark, [(1, "a")]))
    st.overwrite(_df(spark, [(2, "b")]))
    st.insert(_df(spark, [(3, "c")]))
    with pytest.raises(ValueError, match="non-append"):
        st.read_changes(0)
    # a post-overwrite range is clean
    assert [r["k"] for r in st.read_changes(2).collect()] == [3]


def test_read_changes_null_fills_across_schema_evolution(spark, st):
    st.insert(_df(spark, [(1, "a")]))
    wide = spark.createDataFrame([(2, "b", 7)], "k int, v string, w int")
    st.insert(wide)
    ch = {r["k"]: r for r in st.read_changes(0).collect()}
    assert ch[1]["w"] is None and ch[2]["w"] == 7


def test_compact_zorder_clusters_and_preserves_rows(spark, tmp_path):
    """OPTIMIZE ZORDER BY: the rewrite is row-identical and each output
    file's (x, y) envelope is a small rectangle — checked on the real
    committed files, not a simulation."""
    import pyarrow.parquet as papq

    st = SnapshotTable(spark, str(tmp_path / "z"), required_cols=("k",))
    rows = [(i, (i * 37) % 100, (i * 61) % 100) for i in range(2000)]
    df = spark.createDataFrame(rows, "k int, x long, y long")
    for j in range(6):
        st.insert(df.filter(F.col("k") % 6 == j))
    before = sorted(map(tuple, st.read().collect()))
    v = st.compact(target_files=8, zorder_by=("x", "y"))
    assert v == 7
    assert sorted(map(tuple, st.read().collect())) == before
    # helper columns must not leak into the committed schema
    assert set(st.read().columns) == {"k", "x", "y"}
    names, _ = st._resolve_files(v)
    assert 1 < len(names) <= 8
    # clustering: the mean per-file x-envelope must be well under the
    # full range (insertion order would put ~the full range in every
    # file since x cycles mod 100 as k counts up)
    widths = []
    for nm in names:
        md = papq.ParquetFile(
            str(tmp_path / "z" / "data" / nm)
        ).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                c = g.column(ci)
                if c.path_in_schema == "x":
                    s = c.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        widths.append(hi - lo)
    assert sum(widths) / len(widths) < 70  # full range is 99


def test_compact_zorder_rejects_non_comparable_columns(spark, st):
    st.insert(_df(spark, [(1, "a")]))
    with pytest.raises(ValueError, match="numeric, date or timestamp"):
        st.compact(zorder_by=("v",))


def test_compact_zorder_huge_range_no_overflow(spark, tmp_path):
    """r12 ADVICE (medium): the old bigint normalization computed
    (x - lo) * top before dividing, overflowing long (ANSI
    ARITHMETIC_OVERFLOW under Spark 4) for ranges above
    ~2^63/(2^16 - 1) ≈ 1.4e14 — epoch-micros keys, the canonical
    zorder use case. The double-first normalization must cluster them."""
    st = SnapshotTable(spark, str(tmp_path / "zo"), required_cols=("k",))
    base = 1_700_000_000_000_000  # epoch micros, range ~2e15
    rows = [
        (i, base + ((i * 37) % 100) * 20_000_000_000_000, (i * 61) % 100)
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "k int, t_us long, x long")
    st.insert(df)
    before = sorted(map(tuple, st.read().collect()))
    v = st.compact(target_files=8, zorder_by=("t_us", "x"))
    assert sorted(map(tuple, st.read(version=v).collect())) == before
    # the huge-range dim still clusters: mean per-file envelope well
    # under the full span
    import pyarrow.parquet as papq

    names, _ = st._resolve_files(v)
    widths = []
    for nm in names:
        md = papq.ParquetFile(str(tmp_path / "zo" / "data" / nm)).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                c = g.column(ci)
                if c.path_in_schema == "t_us":
                    s = c.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        widths.append(hi - lo)
    full = 99 * 20_000_000_000_000
    assert sum(widths) / len(widths) < 0.7 * full


def test_compact_zorder_date_and_double(spark, tmp_path):
    """r12 VERDICT item #5: ZORDER over non-integral comparable types —
    a (date, double) pair clusters on the same grid via order-
    preserving double positions (epoch days / the double itself)."""
    import datetime

    import pyarrow.parquet as papq

    st = SnapshotTable(spark, str(tmp_path / "zd"), required_cols=("k",))
    d0 = datetime.date(2020, 1, 1)
    rows = [
        (
            i,
            d0 + datetime.timedelta(days=(i * 37) % 365),
            float((i * 61) % 100) + 0.25,
        )
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "k int, d date, p double")
    for j in range(4):
        st.insert(df.filter(F.col("k") % 4 == j))
    before = sorted(map(tuple, st.read().collect()))
    v = st.compact(target_files=8, zorder_by=("d", "p"))
    assert sorted(map(tuple, st.read(version=v).collect())) == before
    assert set(st.read().columns) == {"k", "d", "p"}
    names, _ = st._resolve_files(v)
    widths_d, widths_p = [], []
    for nm in names:
        md = papq.ParquetFile(str(tmp_path / "zd" / "data" / nm)).metadata
        env = {}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                c = g.column(ci)
                if c.path_in_schema in ("d", "p") and c.statistics:
                    s = c.statistics
                    e = env.setdefault(c.path_in_schema, [s.min, s.max])
                    e[0] = min(e[0], s.min)
                    e[1] = max(e[1], s.max)
        widths_d.append((env["d"][1] - env["d"][0]).days)
        widths_p.append(env["p"][1] - env["p"][0])
    assert sum(widths_d) / len(widths_d) < 0.7 * 364
    assert sum(widths_p) / len(widths_p) < 0.7 * 99


def _race_one_insert(spark, st, row):
    """Monkeypatch _stage_files so the FIRST call lets a second writer
    commit before this writer reaches its commit — the read-modify-write
    race window, made deterministic."""
    orig = st._stage_files
    state = {"raced": False}

    def delayed(df):
        names = orig(df)
        if not state["raced"]:
            state["raced"] = True
            other = SnapshotTable(spark, st.path, required_cols=("k",))
            other.insert(_df(spark, [row]))
        return names

    st._stage_files = delayed
    return state


def test_upsert_conflict_detected_not_lost(spark, st):
    """A commit landing inside upsert's read-modify-write window must
    raise SnapshotConflictError — committing anyway would drop the
    concurrent row from the merged version (lost update)."""
    from pgvector_db_spark.sources.snapshots import SnapshotConflictError

    st.insert(_df(spark, [(1, "a"), (2, "b")]))
    _race_one_insert(spark, st, (99, "concurrent"))
    with pytest.raises(SnapshotConflictError):
        st.upsert(_df(spark, [(2, "B")]), "k")
    # nothing was committed by the failed upsert; the raced row survives
    assert sorted(r["k"] for r in st.read().collect()) == [1, 2, 99]


def test_compact_conflict_retries_and_absorbs(spark, st):
    """compact is a pure re-layout, so on conflict it re-reads and
    retries — the concurrent row lands in the compacted version."""
    for i in range(1, 5):
        st.insert(_df(spark, [(i, f"r{i}")]))
    _race_one_insert(spark, st, (99, "concurrent"))
    v = st.compact(target_files=1)
    assert sorted(r["k"] for r in st.read(version=v).collect()) == [
        1, 2, 3, 4, 99,
    ]


def test_read_changes_after_vacuum_raises_clearly(spark, st):
    """A consumer whose watermark predates vacuum retention must get the
    resume-from-full-read error, not a raw missing-file failure."""
    for i in range(1, 5):
        st.insert(_df(spark, [(i, "x")]))
    st.vacuum(keep_last=1)
    with pytest.raises(ValueError, match="vacuumed away"):
        st.read_changes(1)


def test_compact_rolls_txn_map_forward(spark, st):
    """A replayed idempotent insert arriving AFTER a compaction is still
    skipped — compact commits through the same txn-carrying path as
    overwrite/upsert."""
    st.insert(_df(spark, [(1, "a")]), txn_app="w", txn_version=3)
    st.insert(_df(spark, [(2, "b")]))
    st.compact(target_files=1)
    assert st.last_txn_version("w") == 3
    v = st.latest_version()
    assert st.insert(_df(spark, [(1, "dup")]), txn_app="w", txn_version=3) == v
    assert st.read().count() == 2


def test_cdf_upsert_serves_pre_post_and_insert_rows(spark, st):
    """r12 VERDICT item #4: an upsert committed with cdf=True is served
    by read_changes(cdf=True) as Delta-CDF change rows — preimage /
    postimage for replaced keys, insert for new keys — instead of
    forcing a full downstream re-read."""
    st.insert(_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    v = st.upsert(_df(spark, [(2, "B"), (4, "d")]), "k", cdf=True)
    feed = st.read_changes(1, v, cdf=True).collect()
    got = sorted((r["k"], r["v"], r["_change_type"]) for r in feed)
    assert got == [
        (2, "B", "update_postimage"),
        (2, "b", "update_preimage"),
        (4, "d", "insert"),
    ]
    assert all(r["_commit_version"] == v for r in feed)
    # signed fold reconstructs the table delta: preimage subtracts
    delta = sum(
        -1 if r["_change_type"] == "update_preimage" else 1 for r in feed
    )
    assert st.read(version=v).count() - st.read(version=1).count() == delta


def test_cdf_insert_commits_carry_insert_type(spark, st):
    st.insert(_df(spark, [(1, "a")]))
    st.insert(_df(spark, [(2, "b")]))
    feed = st.read_changes(0, cdf=True).collect()
    assert sorted((r["k"], r["_change_type"]) for r in feed) == [
        (1, "insert"),
        (2, "insert"),
    ]


def test_cdf_skips_compact_commits(spark, st):
    """compact is dataChange=false: the CDF range spans it silently
    (zero logical row changes), while the non-CDF default still raises."""
    st.insert(_df(spark, [(1, "a")]))
    st.insert(_df(spark, [(2, "b")]))
    st.compact(target_files=1)
    st.insert(_df(spark, [(3, "c")]))
    feed = st.read_changes(1, cdf=True).collect()
    assert sorted((r["k"], r["_change_type"]) for r in feed) == [
        (2, "insert"),
        (3, "insert"),
    ]
    with pytest.raises(ValueError, match="non-append commit"):
        st.read_changes(1)
    # a range that is ONLY the compact commit: empty feed, stable schema
    only = st.read_changes(2, 3, cdf=True)
    assert only.count() == 0
    assert "_change_type" in only.columns


def test_cdf_unflagged_upsert_still_raises(spark, st):
    """Default posture unchanged: an upsert committed WITHOUT cdf has no
    materialized change rows — both read modes refuse it."""
    st.insert(_df(spark, [(1, "a")]))
    st.upsert(_df(spark, [(1, "A")]), "k")
    with pytest.raises(ValueError, match="non-append commit"):
        st.read_changes(1)
    with pytest.raises(ValueError, match="without cdf=True"):
        st.read_changes(1, cdf=True)


def test_read_changes_end_beyond_latest_is_distinct_error(spark, st):
    """r12 ADVICE (low): a never-committed end_version is a caller bug,
    not a retention problem — the error must NOT tell the consumer to
    resume from a full read."""
    st.insert(_df(spark, [(1, "a")]))
    with pytest.raises(ValueError, match="beyond the latest"):
        st.read_changes(0, 5)


def test_vacuum_retains_cdf_files_of_kept_versions(spark, st):
    st.insert(_df(spark, [(1, "a"), (2, "b")]))
    v = st.upsert(_df(spark, [(2, "B")]), "k", cdf=True)
    st.vacuum(keep_last=2)  # keeps v1 (insert) + v2 (upsert)
    feed = st.read_changes(1, v, cdf=True).collect()
    assert sorted((r["k"], r["v"], r["_change_type"]) for r in feed) == [
        (2, "B", "update_postimage"),
        (2, "b", "update_preimage"),
    ]


def test_cdf_with_schema_evolution_null_fills(spark, st):
    """An upsert batch ADDING a column: preimage rows (parent schema)
    NULL-fill the new column in the feed, postimage rows carry it."""
    st.insert(_df(spark, [(1, "a"), (2, "b")]))
    wide = spark.createDataFrame([(2, "B", 7)], "k int, v string, w int")
    v = st.upsert(wide, "k", cdf=True)
    feed = {
        (r["_change_type"]): (r["k"], r["v"], r["w"])
        for r in st.read_changes(1, v, cdf=True).collect()
    }
    assert feed["update_preimage"] == (2, "b", None)
    assert feed["update_postimage"] == (2, "B", 7)


def test_delete_where_copy_on_write_and_cdf(spark, st):
    """Delta DELETE semantics: survivors rewritten as a new version,
    parent time-travels intact, and with cdf=True the deleted rows are
    served by the feed as _change_type='delete' — the third CDF type."""
    st.insert(_df(spark, [(1, "a"), (2, "b"), (3, "c"), (4, "d")]))
    v = st.delete_where("k % 2 = 0", cdf=True)
    assert sorted(r["k"] for r in st.read().collect()) == [1, 3]
    assert sorted(r["k"] for r in st.read(version=1).collect()) == [
        1, 2, 3, 4,
    ]
    feed = st.read_changes(1, v, cdf=True).collect()
    assert sorted((r["k"], r["v"], r["_change_type"]) for r in feed) == [
        (2, "b", "delete"),
        (4, "d", "delete"),
    ]


def test_delete_where_null_predicate_keeps_row(spark, st):
    """SQL WHERE semantics: a NULL predicate row is NOT deleted."""
    st.insert(_df(spark, [(1, "x"), (2, None), (3, "y")]))
    st.delete_where("v = 'x'")
    assert sorted(r["k"] for r in st.read().collect()) == [2, 3]


def test_delete_without_cdf_refused_by_feed(spark, st):
    st.insert(_df(spark, [(1, "a"), (2, "b")]))
    st.delete_where("k = 1")
    with pytest.raises(ValueError, match="non-append commit"):
        st.read_changes(1)
    with pytest.raises(ValueError, match="without cdf=True"):
        st.read_changes(1, cdf=True)


def test_delete_conflict_detected_not_lost(spark, st):
    """A commit landing inside delete's read-modify-write window must
    raise — committing anyway would drop the concurrent row."""
    from pgvector_db_spark.sources.snapshots import SnapshotConflictError

    st.insert(_df(spark, [(1, "a"), (2, "b")]))
    _race_one_insert(spark, st, (99, "concurrent"))
    with pytest.raises(SnapshotConflictError):
        st.delete_where("k = 2")
    assert sorted(r["k"] for r in st.read().collect()) == [1, 2, 99]


# -- data skipping (manifest column stats + read_where) ----------------------


def _range_df(spark, lo, hi, tag="x"):
    rows = [(i, float(i), f"{tag}{i:05d}") for i in range(lo, hi)]
    return spark.createDataFrame(rows, "k int, p double, s string")


def test_insert_manifest_records_footer_stats(spark, tmp_path):
    st = SnapshotTable(spark, str(tmp_path / "ds"), required_cols=("k",))
    st.insert(_range_df(spark, 10, 20))
    stats = st.manifest(1)["stats"]
    assert len(stats) >= 1
    merged = {}
    for f in stats.values():
        for c, env in f.items():
            lo, hi = env
            cur = merged.setdefault(c, [lo, hi])
            cur[0] = min(cur[0], lo)
            cur[1] = max(cur[1], hi)
    assert merged["k"] == [10, 19]
    assert merged["p"] == [10.0, 19.0]
    assert merged["s"] == ["x00010", "x00019"]


def test_read_where_skips_disjoint_files_and_matches_full_filter(
    spark, tmp_path
):
    st = SnapshotTable(spark, str(tmp_path / "ds2"), required_cols=("k",))
    for b in range(8):
        st.insert(
            _range_df(spark, b * 100, b * 100 + 100).coalesce(1)
        )
    got = st.read_where([("k", "between", (250, 349))])
    rows = sorted(r["k"] for r in got.collect())
    assert rows == list(range(250, 350))
    assert st.last_files_skipped >= 6  # only the 2 overlapping commits open
    assert st.last_files_scanned <= 2
    # physical pin, not just the counter: the PLAN's input file set is
    # the pruned list — a skipped file is absent from the scan itself
    assert len(got.inputFiles()) == st.last_files_scanned
    # the filter is real: a predicate the stats can't prune still answers
    got2 = st.read_where([("s", ">=", "x00750")])
    assert got2.count() == 50
    full = st.read().filter(F.col("k").between(250, 349))
    assert sorted(r["k"] for r in full.collect()) == rows


def test_read_where_resolves_stats_through_checkpoints(spark, tmp_path):
    st = SnapshotTable(
        spark, str(tmp_path / "ds3"), required_cols=("k",),
        checkpoint_interval=5,
    )
    for b in range(12):
        st.insert(_range_df(spark, b * 10, b * 10 + 10).coalesce(1))
    got = st.read_where([("k", ">=", 100)])
    assert sorted(r["k"] for r in got.collect()) == list(range(100, 120))
    assert st.last_files_skipped >= 9
    assert st.last_metadata_reads <= st.checkpoint_interval + 2


def test_read_where_time_travel_and_full_list_commits(spark, tmp_path):
    st = SnapshotTable(spark, str(tmp_path / "ds4"), required_cols=("k",))
    st.insert(_range_df(spark, 0, 50).coalesce(1))
    st.insert(_range_df(spark, 50, 100).coalesce(1))
    st.compact(target_files=4)  # full-list commit; stats recollected
    got = st.read_where([("k", "<", 10)])
    assert got.count() == 10
    assert st.last_files_skipped >= 1
    # time travel prunes with the OLD version's stats
    old = st.read_where([("k", ">=", 90)], version=2)
    assert old.count() == 10
    assert st.last_files_skipped >= 1


def test_read_where_all_files_pruned_returns_empty_with_schema(
    spark, tmp_path
):
    st = SnapshotTable(spark, str(tmp_path / "ds5"), required_cols=("k",))
    st.insert(_range_df(spark, 0, 10))
    got = st.read_where([("k", ">", 1000)])
    assert got.count() == 0
    assert [f.name for f in got.schema.fields] == ["k", "p", "s"]
    assert st.last_files_scanned == 0


def test_read_where_unstatted_legacy_manifest_reads_everything(
    spark, tmp_path
):
    import json

    st = SnapshotTable(spark, str(tmp_path / "ds6"), required_cols=("k",))
    st.insert(_range_df(spark, 0, 10).coalesce(1))
    st.insert(_range_df(spark, 100, 110).coalesce(1))
    # strip stats from v1 — a pre-skipping manifest
    p = st._manifest_path(1)
    with open(p) as fh:
        m = json.load(fh)
    del m["stats"]
    with open(p, "w") as fh:
        json.dump(m, fh)
    got = st.read_where([("k", ">=", 100)])
    assert got.count() == 10  # correct despite the unprunable file
    assert st.last_files_skipped == 0  # v1's file had to be read


def test_read_where_null_semantics(spark, tmp_path):
    st = SnapshotTable(spark, str(tmp_path / "ds7"), required_cols=("k",))
    st.insert(
        spark.createDataFrame(
            [(1, None), (2, None)], "k int, p double"
        ).coalesce(1)
    )
    st.insert(
        spark.createDataFrame(
            [(3, 5.0), (4, None)], "k int, p double"
        ).coalesce(1)
    )
    got = st.read_where([("p", ">=", 0.0)])
    assert [r["k"] for r in got.collect()] == [3]
    # the all-null file was skipped without being opened
    assert st.last_files_skipped >= 1


def test_read_where_rejects_malformed_predicates(spark, tmp_path):
    st = SnapshotTable(spark, str(tmp_path / "ds8"), required_cols=("k",))
    st.insert(_range_df(spark, 0, 5))
    with pytest.raises(ValueError, match="bad predicate"):
        st.read_where([("k", "!=", 3)])


def test_read_where_date_and_timestamp_pruning(spark, tmp_path):
    import datetime as dt

    st = SnapshotTable(spark, str(tmp_path / "ds9"), required_cols=("k",))
    for month in (1, 6):
        rows = [
            (
                month * 100 + d,
                dt.date(1995, month, d),
                dt.datetime(1995, month, d, 12, 0, 0),
            )
            for d in range(1, 11)
        ]
        st.insert(
            spark.createDataFrame(rows, "k int, d date, ts timestamp")
            .coalesce(1)
        )
    got = st.read_where(
        [("d", "between", (dt.date(1995, 5, 1), dt.date(1995, 7, 1)))]
    )
    assert got.count() == 10
    assert st.last_files_skipped >= 1
    got2 = st.read_where([("ts", "<", dt.datetime(1995, 2, 1))])
    assert got2.count() == 10
    assert st.last_files_skipped >= 1


def test_vacuum_keeps_read_where_working(spark, tmp_path):
    st = SnapshotTable(spark, str(tmp_path / "ds10"), required_cols=("k",))
    for b in range(4):
        st.insert(_range_df(spark, b * 10, b * 10 + 10).coalesce(1))
    st.vacuum(keep_last=1)
    got = st.read_where([("k", ">=", 30)])
    assert got.count() == 10
    assert st.last_files_skipped >= 2


# -- MERGE (full Delta clause set) -------------------------------------------


def test_merge_update_delete_insert_clauses(spark, st):
    st.insert(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)],
            "k int, v string, amt int",
        )
    )
    src = spark.createDataFrame(
        [(2, "B", 99), (3, "C", 5), (4, "D", 40), (9, "z", 1)],
        "k int, v string, amt int",
    )
    st.merge(
        src,
        "k",
        matched_update_condition="s.amt > t.amt",
        matched_delete=True,
        matched_delete_condition="s.amt < t.amt",
    )
    got = {r["k"]: (r["v"], r["amt"]) for r in st.read().collect()}
    # 2: updated (99 > 20); 3: deleted (5 < 30); 4: kept (40 !> 40);
    # 9: inserted; 1: untouched target-only row
    assert got == {
        1: ("a", 10), 2: ("B", 99), 4: ("d", 40), 9: ("z", 1)
    }
    # parent survives the merge (copy-on-write)
    assert st.read(version=1).count() == 4
    assert st.manifest(2)["op"] == "merge"


def test_merge_insert_only_with_condition(spark, st):
    st.insert(_df(spark, [(1, "a")]))
    src = _df(spark, [(1, "A"), (2, "b"), (3, "c")])
    st.merge(
        src,
        "k",
        matched_update=False,
        not_matched_condition="s.k > 2",
    )
    got = {r["k"]: r["v"] for r in st.read().collect()}
    assert got == {1: "a", 3: "c"}  # 1 not updated, 2 filtered out


def test_merge_ambiguous_source_rows_raise(spark, st):
    st.insert(_df(spark, [(1, "a")]))
    src = _df(spark, [(1, "x"), (1, "y")])
    with pytest.raises(ValueError, match="multiple rows"):
        st.merge(src, "k")
    # dup keys that match NOTHING are fine for insert-only merges
    src2 = _df(spark, [(7, "x"), (7, "y")])
    st.merge(src2, "k", matched_update=False)
    assert st.read().filter("k = 7").count() == 2


def test_merge_cdf_change_rows(spark, st):
    st.insert(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20)], "k int, v string, amt int"
        )
    )
    src = spark.createDataFrame(
        [(1, "A", 11), (2, "b", 20), (5, "e", 50)],
        "k int, v string, amt int",
    )
    v = st.merge(
        src,
        "k",
        matched_update_condition="s.amt > t.amt",
        matched_delete=True,
        matched_delete_condition="s.amt = t.amt",
        cdf=True,
    )
    feed = st.read_changes(1, v, cdf=True)
    got = sorted(
        (r["k"], r["_change_type"]) for r in feed.collect()
    )
    assert got == [
        (1, "update_postimage"),
        (1, "update_preimage"),
        (2, "delete"),
        (5, "insert"),
    ]
    pre = {r["k"]: r["amt"] for r in feed.filter(
        "_change_type = 'update_preimage'").collect()}
    assert pre == {1: 10}


def test_merge_schema_evolution_adds_source_column(spark, st):
    st.insert(_df(spark, [(1, "a"), (2, "b")]))
    src = spark.createDataFrame(
        [(2, "B", 7.5), (3, "c", 1.0)], "k int, v string, w double"
    )
    st.merge(src, "k")
    got = {r["k"]: (r["v"], r["w"]) for r in st.read().collect()}
    assert got == {1: ("a", None), 2: ("B", 7.5), 3: ("c", 1.0)}


def test_merge_conflict_detected_not_lost(spark, st):
    from pgvector_db_spark.sources.snapshots import SnapshotConflictError

    st.insert(_df(spark, [(1, "a")]))
    _race_one_insert(spark, st, (42, "concurrent"))
    with pytest.raises(SnapshotConflictError):
        st.merge(_df(spark, [(1, "A")]), "k")
    assert sorted(r["k"] for r in st.read().collect()) == [1, 42]


def test_merge_no_active_clause_rejected(spark, st):
    st.insert(_df(spark, [(1, "a")]))
    with pytest.raises(ValueError, match="no active clause"):
        st.merge(
            _df(spark, [(1, "x")]),
            "k",
            matched_update=False,
            not_matched_insert=False,
        )


# -- RESTORE -----------------------------------------------------------------


def test_restore_rolls_forward_to_old_content(spark, st):
    st.insert(_df(spark, [(1, "a"), (2, "b")]))
    st.insert(_df(spark, [(3, "c")]))
    st.delete_where("k = 1")
    v = st.restore(2)
    assert v == 4
    assert st.manifest(4)["op"] == "restore"
    assert sorted(r["k"] for r in st.read().collect()) == [1, 2, 3]
    # intermediate history is preserved, not rewritten
    assert sorted(r["k"] for r in st.read(version=3).collect()) == [2, 3]
    assert st.history().filter("op = 'restore'").count() == 1


def test_restore_is_zero_copy(spark, st):
    st.insert(_df(spark, [(1, "a")]))
    st.insert(_df(spark, [(2, "b")]))
    n_files_before = len(os.listdir(st._data_dir()))
    st.restore(1)
    assert len(os.listdir(st._data_dir())) == n_files_before


def test_restore_then_vacuum_keeps_referenced_files(spark, st):
    st.insert(_df(spark, [(1, "a")]))
    st.overwrite(_df(spark, [(2, "b")]))
    st.restore(1)
    st.vacuum(keep_last=1)
    assert [r["k"] for r in st.read().collect()] == [1]
    assert st.versions() == [3]


def test_restore_rejects_latest_and_vacuumed(spark, st):
    st.insert(_df(spark, [(1, "a")]))
    with pytest.raises(ValueError, match="already at version"):
        st.restore(1)
    st.insert(_df(spark, [(2, "b")]))
    st.insert(_df(spark, [(3, "c")]))
    st.vacuum(keep_last=1)
    with pytest.raises(ValueError, match="vacuumed away"):
        st.restore(1)


def test_restore_restores_schema_and_evolves_after(spark, st):
    st.insert(_df(spark, [(1, "a")]))
    st.insert(
        spark.createDataFrame([(2, "b", 5.0)], "k int, v string, w double")
    )
    st.restore(1)
    assert [f.name for f in st.read().schema.fields] == ["k", "v"]
    # a later commit re-evolves from the restored (narrower) schema
    st.insert(
        spark.createDataFrame([(4, "d", 1.5)], "k int, v string, w double")
    )
    assert [f.name for f in st.read().schema.fields] == ["k", "v", "w"]


def test_restore_carries_skipping_stats(spark, st):
    st.insert(_range_df(spark, 0, 10).coalesce(1).selectExpr(
        "k", "s as v", "p"))
    st.insert(_range_df(spark, 100, 110).coalesce(1).selectExpr(
        "k", "s as v", "p"))
    st.delete_where("k >= 0")  # empty the table
    st.restore(2)
    got = st.read_where([("k", ">=", 100)])
    assert got.count() == 10
    assert st.last_files_skipped >= 1


def test_read_changes_across_restore_raises(spark, st):
    st.insert(_df(spark, [(1, "a")]))
    st.insert(_df(spark, [(2, "b")]))
    st.restore(1)
    with pytest.raises(ValueError, match="non-append"):
        st.read_changes(1)


# -- CLONE -------------------------------------------------------------------


def test_shallow_clone_zero_copy_and_divergence(spark, st, tmp_path):
    st.insert(_df(spark, [(1, "a"), (2, "b")]))
    dst = st.clone_to(str(tmp_path / "clone"))
    assert dst.latest_version() == 1
    assert dst.manifest(1)["op"] == "clone"
    # zero copy: the clone's data dir holds nothing
    assert not any(
        f.endswith(".parquet") for f in os.listdir(dst._data_dir())
    )
    assert sorted(r["k"] for r in dst.read().collect()) == [1, 2]
    # divergence is independent in both directions
    dst.insert(_df(spark, [(3, "c")]))
    st.insert(_df(spark, [(9, "z")]))
    assert sorted(r["k"] for r in dst.read().collect()) == [1, 2, 3]
    assert sorted(r["k"] for r in st.read().collect()) == [1, 2, 9]


def test_shallow_clone_vacuum_never_reaches_source(spark, st, tmp_path):
    st.insert(_df(spark, [(1, "a")]))
    dst = st.clone_to(str(tmp_path / "clone2"))
    dst.overwrite(_df(spark, [(5, "e")]))
    dst.vacuum(keep_last=1)
    # the source file referenced by the dropped clone v1 still exists
    assert sorted(r["k"] for r in st.read().collect()) == [1]


def test_deep_clone_survives_source_vacuum(spark, st, tmp_path):
    st.insert(_df(spark, [(1, "a"), (2, "b")]))
    deep = st.clone_to(str(tmp_path / "deep"), deep=True)
    shallow = st.clone_to(str(tmp_path / "shallow"))
    st.overwrite(_df(spark, [(7, "g")]))
    st.vacuum(keep_last=1)
    assert sorted(r["k"] for r in deep.read().collect()) == [1, 2]
    # the shallow clone's files were GC'd by the source — the
    # documented hazard: its read must now fail, not silently shrink
    with pytest.raises(Exception):
        shallow.read().collect()


def test_clone_carries_skipping_stats(spark, st, tmp_path):
    for b in range(3):
        st.insert(_range_df(spark, b * 10, b * 10 + 10).selectExpr(
            "k", "s as v", "p").coalesce(1))
    dst = st.clone_to(str(tmp_path / "clone3"))
    got = dst.read_where([("k", ">=", 20)])
    assert got.count() == 10
    assert dst.last_files_skipped >= 2


def test_clone_rejects_nonempty_destination(spark, st, tmp_path):
    st.insert(_df(spark, [(1, "a")]))
    dst = SnapshotTable(spark, str(tmp_path / "busy"), required_cols=("k",))
    dst.insert(_df(spark, [(9, "x")]))
    with pytest.raises(ValueError, match="not an empty table"):
        st.clone_to(str(tmp_path / "busy"))


def test_clone_of_old_version(spark, st, tmp_path):
    st.insert(_df(spark, [(1, "a")]))
    st.insert(_df(spark, [(2, "b")]))
    dst = st.clone_to(str(tmp_path / "clone4"), version=1)
    assert [r["k"] for r in dst.read().collect()] == [1]


# -- incremental OPTIMIZE ----------------------------------------------------


def test_incremental_compact_touches_only_small_files(spark, st):
    # one "big" packed commit + many small fragments
    st.insert(_range_df(spark, 0, 2000).coalesce(1).selectExpr(
        "k", "s as v", "p"))
    for b in range(6):
        st.insert(_df(spark, [(10000 + b, "frag")]).selectExpr(
            "k", "v", "cast(null as double) as p"))
    names_before, _ = st._resolve_files(st.latest_version())
    sizes = {
        f: os.path.getsize(os.path.join(st._data_dir(), f))
        for f in names_before
    }
    big = [f for f in names_before if sizes[f] >= 4096]
    assert big, "fixture needs at least one big file"
    mtimes = {
        f: os.path.getmtime(os.path.join(st._data_dir(), f)) for f in big
    }
    n_rows_before = st.read().count()
    v = st.compact(small_file_bytes=4096, target_files=1)
    names_after, _ = st._resolve_files(v)
    # the big file(s) carried over BY REFERENCE, bytes untouched
    for f in big:
        assert f in names_after
        assert os.path.getmtime(
            os.path.join(st._data_dir(), f)
        ) == mtimes[f]
    # fragments merged: fewer files, same rows
    assert len(names_after) == len(big) + 1
    assert st.read().count() == n_rows_before
    assert st.manifest(v)["op"] == "compact"
    assert st.manifest(v)["n_rows"] == n_rows_before


def test_incremental_compact_noop_when_nothing_small(spark, st):
    st.insert(_range_df(spark, 0, 2000).coalesce(1).selectExpr(
        "k", "s as v", "p"))
    v = st.latest_version()
    assert st.compact(small_file_bytes=10) == v


def test_incremental_compact_rejects_zorder_combo(spark, st):
    st.insert(_df(spark, [(1, "a")]))
    with pytest.raises(ValueError, match="small_file_bytes"):
        st.compact(small_file_bytes=1000, zorder_by=("k",))


def test_incremental_compact_carries_big_file_stats(spark, st):
    st.insert(_range_df(spark, 0, 2000).coalesce(1).selectExpr(
        "k", "s as v", "p"))
    for b in range(4):
        st.insert(_range_df(spark, 5000 + b, 5001 + b).selectExpr(
            "k", "s as v", "p").coalesce(1))
    st.compact(small_file_bytes=4096, target_files=1)
    # a query outside the big file's range skips it via CARRIED stats
    got = st.read_where([("k", ">=", 5000)])
    assert got.count() == 4
    assert st.last_files_skipped >= 1


def test_incremental_compact_old_versions_still_travel(spark, st):
    st.insert(_range_df(spark, 0, 100).coalesce(1).selectExpr(
        "k", "s as v", "p"))
    st.insert(_df(spark, [(900, "x")]).selectExpr(
        "k", "v", "cast(null as double) as p"))
    st.insert(_df(spark, [(901, "y")]).selectExpr(
        "k", "v", "cast(null as double) as p"))
    v = st.compact(small_file_bytes=4096, target_files=1)
    assert v == 4
    assert st.read(version=2).count() == 101
    assert st.read(version=4).count() == 102


def test_vacuum_dry_run_counts_without_deleting(spark, st):
    st.insert(_df(spark, [(1, "a")]))
    st.overwrite(_df(spark, [(2, "b")]))
    would = st.vacuum(keep_last=1, dry_run=True)
    assert would >= 1
    # nothing was touched: both versions still readable
    assert st.versions() == [1, 2]
    assert st.read(version=1).count() == 1
    did = st.vacuum(keep_last=1)
    assert did == would
    assert st.vacuum(keep_last=1, dry_run=True) == 0


def test_merge_into_empty_table_inserts(spark, st):
    v = st.merge(
        _df(spark, [(1, "a"), (2, "b"), (3, "c")]),
        "k",
        not_matched_condition="s.k < 3",
        cdf=True,
    )
    assert v == 1
    assert sorted(r["k"] for r in st.read().collect()) == [1, 2]
    feed = st.read_changes(0, 1, cdf=True)
    assert {r["_change_type"] for r in feed.collect()} == {"insert"}
    # without an insert clause an empty target is a loud error
    st2 = SnapshotTable(spark, st.path + "_e", required_cols=("k",))
    with pytest.raises(FileNotFoundError, match="no insert clause"):
        st2.merge(_df(spark, [(1, "x")]), "k", not_matched_insert=False)


# -- cross-feature interactions ----------------------------------------------


def test_merge_on_shallow_clone_isolated(spark, st, tmp_path):
    st.insert(_df(spark, [(1, "a"), (2, "b")]))
    dst = st.clone_to(str(tmp_path / "mclone"))
    dst.merge(
        _df(spark, [(2, "B"), (9, "z")]),
        "k",
        matched_delete=True,
        matched_delete_condition="s.k = 2",
    )
    assert {r["k"]: r["v"] for r in dst.read().collect()} == {
        1: "a", 9: "z"
    }
    # the source table never saw the branch's merge
    assert {r["k"]: r["v"] for r in st.read().collect()} == {
        1: "a", 2: "b"
    }


def test_restore_undoes_a_merge(spark, st):
    st.insert(_df(spark, [(1, "a"), (2, "b")]))
    st.merge(_df(spark, [(2, "B"), (5, "e")]), "k")
    st.restore(1)
    assert {r["k"]: r["v"] for r in st.read().collect()} == {
        1: "a", 2: "b"
    }


def test_read_where_after_merge_uses_fresh_stats(spark, st):
    st.insert(_range_df(spark, 0, 100).selectExpr(
        "k", "s as v", "p").coalesce(1))
    st.insert(_range_df(spark, 1000, 1100).selectExpr(
        "k", "s as v", "p").coalesce(1))
    # merge rewrites the table into new files — their stats must be
    # recollected, not inherited (a merge can move any row anywhere)
    st.merge(
        _range_df(spark, 1000, 1010).selectExpr(
            "k", "upper(s) as v", "p"),
        "k",
    )
    got = st.read_where([("k", ">=", 1000)])
    assert got.count() == 100
    assert got.filter("v = upper(v)").count() >= 10


# -- CHECK constraints -------------------------------------------------------


def test_add_constraint_enforced_on_every_write_path(spark, st):
    st.insert(_df(spark, [(1, "a"), (2, "b")]))
    v = st.add_constraint("k_positive", "k > 0")
    assert st.manifest(v)["op"] == "alter"
    assert st.constraints() == {"k_positive": "k > 0"}
    with pytest.raises(ValueError, match="k_positive"):
        st.insert(_df(spark, [(-1, "bad")]))
    with pytest.raises(ValueError, match="k_positive"):
        st.overwrite(_df(spark, [(0, "bad")]))
    with pytest.raises(ValueError, match="k_positive"):
        st.upsert(_df(spark, [(-5, "bad")]), "k")
    with pytest.raises(ValueError, match="k_positive"):
        st.merge(_df(spark, [(-7, "bad")]), "k")
    # nothing committed by the refused writes
    assert st.latest_version() == v
    assert st.insert(_df(spark, [(3, "c")])) == v + 1


def test_add_constraint_refused_when_existing_rows_violate(spark, st):
    st.insert(_df(spark, [(1, "a"), (-2, "b")]))
    with pytest.raises(ValueError, match="existing rows"):
        st.add_constraint("k_positive", "k > 0")
    assert st.constraints() == {}


def test_constraint_null_result_is_violation(spark, st):
    st.insert(_df(spark, [(1, "a")]))
    st.add_constraint("v_known", "v IS NOT NULL")
    with pytest.raises(ValueError, match="v_known"):
        st.insert(spark.createDataFrame([(2,)], "k int"))


def test_drop_constraint_lifts_enforcement(spark, st):
    st.insert(_df(spark, [(1, "a")]))
    st.add_constraint("k_small", "k < 100")
    with pytest.raises(KeyError):
        st.drop_constraint("nope")
    st.drop_constraint("k_small")
    st.insert(_df(spark, [(500, "big")]))
    assert st.read().count() == 2


def test_restore_checks_constraints_added_after_target(spark, st):
    st.insert(_df(spark, [(-1, "old")]))
    st.delete_where("k < 0")
    st.add_constraint("k_positive", "k > 0")
    with pytest.raises(ValueError, match="restore violates"):
        st.restore(1)
    # restoring a conforming version is fine
    st.insert(_df(spark, [(5, "e")]))
    st.restore(2)


def test_constraints_roll_forward_and_clone_inherits(spark, st, tmp_path):
    st.insert(_df(spark, [(1, "a")]))
    st.add_constraint("k_positive", "k > 0")
    st.insert(_df(spark, [(2, "b")]))
    st.compact(target_files=1)
    assert st.constraints() == {"k_positive": "k > 0"}
    dst = st.clone_to(str(tmp_path / "ccl"))
    with pytest.raises(ValueError, match="k_positive"):
        dst.insert(_df(spark, [(-3, "bad")]))


def test_constraint_add_race_with_insert_is_checked_in_lock(spark, st):
    """An ADD CONSTRAINT landing inside insert's stage-then-commit
    window must still gate the insert — the in-lock re-check."""
    st.insert(_df(spark, [(1, "a")]))
    orig = st._stage_files
    state = {"raced": False}

    def delayed(df):
        names = orig(df)
        if not state["raced"]:
            state["raced"] = True
            other = SnapshotTable(spark, st.path, required_cols=("k",))
            other.add_constraint("k_positive", "k > 0")
        return names

    st._stage_files = delayed
    with pytest.raises(ValueError, match="k_positive"):
        st.insert(_df(spark, [(-9, "bad")]))
    assert st.read().count() == 1


def test_stat_and_predicate_value_edge_cases():
    """The two value mappers must agree on one comparable domain and
    refuse anything whose bounds can't round-trip JSON exactly."""
    import datetime as dt
    from decimal import Decimal

    sv = SnapshotTable._stat_value
    pv = SnapshotTable._predicate_value
    # dates → epoch days; timestamps → epoch micros, tz-aware or naive
    assert sv(dt.date(1970, 1, 2)) == 1 == pv(dt.date(1970, 1, 2))
    naive = dt.datetime(1970, 1, 1, 0, 0, 1)
    aware = dt.datetime(
        1970, 1, 1, 0, 0, 1, tzinfo=dt.timezone.utc
    )
    assert sv(naive) == 1_000_000 == sv(aware)
    assert pv(naive) == 1_000_000 == pv(aware)
    # NaN bounds are meaningless — both sides refuse
    assert sv(float("nan")) is None
    assert pv(float("nan")) is None
    # decimals never participate (float bounds could round inward)
    assert pv(Decimal("1.5")) is None
    # bools normalize to ints so envelopes stay comparable
    assert sv(True) == 1 and pv(False) == 0
    # bytes (raw binary stats) are ineligible
    assert sv(b"\x00\xff") is None


def test_file_pruned_type_mismatch_never_prunes():
    """A predicate literal of a different type than the recorded
    envelope must leave the file readable, not throw or misprune."""
    fstats = {"k": [10, 20]}
    assert SnapshotTable._file_pruned(fstats, [("k", ">", "zzz")]) in (
        False,
    )
    assert not SnapshotTable._file_pruned(
        {"s": ["a", "m"]}, [("s", "between", (5, 9))]
    )
    # sound pruning still engages on the matching type
    assert SnapshotTable._file_pruned(fstats, [("k", ">", 25)])
    assert SnapshotTable._file_pruned({"k": "allnull"}, [("k", "=", 1)])
    assert SnapshotTable._file_pruned({"__rows__": 0}, [("k", "=", 1)])
