"""Custom stateful streaming operators via ``applyInPandasWithState``.

Beyond the built-in windowed aggregates (streaming/windows.py), a
training-data ingest pipeline needs per-key state that outlives a
window: running totals and streaming first-seen dedup. Both are
Arrow-batched pandas state functions — state lives in the streaming
state store (checkpointed, exactly-once), keyed and shuffled by the
group key, so a 1000-executor cluster partitions the key space and each
task touches only its shard's state.

Note: for plain key dedup with a bounded horizon, the built-in
``dropDuplicates`` + watermark is preferred; ``first_seen`` exists for
unbounded keys and as the template for richer per-key logic.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_counts(stream_df: DataFrame, key_col: str) -> DataFrame:
    """Per-key running event count, emitted each micro-batch the key
    appears in (output mode: update)."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        total = state.get[0] if state.exists else 0
        for pdf in pdfs:
            total += len(pdf)
        state.update((total,))
        yield pd.DataFrame({key_col: [key[0]], "running_count": [total]})

    return stream_df.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=f"{key_col} bigint, running_count bigint",
        stateStructType="total bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def first_seen(stream_df: DataFrame, key_col: str, ts_col: str) -> DataFrame:
    """Streaming exact dedup on an unbounded key space: emit each key the
    first micro-batch it appears in, drop every later occurrence.

    State per key is a single seen flag; emitted row carries the earliest
    timestamp within the first batch."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            for _ in pdfs:  # drain (required by the contract)
                pass
            return
        first_ts = None
        for pdf in pdfs:
            ts = pdf[ts_col].min()
            first_ts = ts if first_ts is None else min(first_ts, ts)
        state.update((True,))
        yield pd.DataFrame({key_col: [key[0]], "first_ts": [first_ts]})

    return stream_df.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=f"{key_col} bigint, first_ts timestamp",
        stateStructType="seen boolean",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def event_transitions(
    stream_df: DataFrame,
    key_col: str = "user_id",
    seq_col: str = "tsu",
    tie_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Streaming Markov transitions: per-key (prev_type, next_type) pairs
    across micro-batch boundaries. The per-key state is the LAST event
    seen, so the first event of batch i+1 pairs with the last event of
    batch i — the lag() a batch window gives for free, reconstructed
    exactly under streaming (requires per-key batch arrival in event
    order, the file-replay contract of the gate query).

    State is one (seq, tie, type) triple per key — constant per key,
    keyed+shuffled by ``key_col`` so each task owns its shard's state.
    """

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        rows = pd.concat(list(pdfs)).sort_values([seq_col, tie_col])
        prev_type = None
        if state.exists:
            last_seq, last_tie, prev_type = state.get
            head = rows.iloc[0]
            # the stored (seq, tie) exist to ENFORCE the in-order
            # contract: a batch older than the state would silently
            # produce wrong transitions — fail loudly instead
            if (int(head[seq_col]), int(head[tie_col])) < (last_seq, last_tie):
                raise ValueError(
                    f"out-of-order micro-batch for key {key}: "
                    f"batch head {(int(head[seq_col]), int(head[tie_col]))} "
                    f"< state {(last_seq, last_tie)}"
                )
        prevs: list[str] = []
        nexts: list[str] = []
        for et in rows[type_col]:
            if prev_type is not None:
                prevs.append(prev_type)
                nexts.append(et)
            prev_type = et
        tail = rows.iloc[-1]
        state.update(
            (int(tail[seq_col]), int(tail[tie_col]), str(tail[type_col]))
        )
        yield pd.DataFrame({"prev_type": prevs, "next_type": nexts})

    return stream_df.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType="prev_type string, next_type string",
        stateStructType=f"{seq_col} bigint, {tie_col} bigint, {type_col} string",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_totals_tws(
    stream_df: DataFrame, key_col: str, value_col: str
) -> DataFrame:
    """Per-key running (count, sum) via Spark 4's ``transformWithState``
    API — the successor to ``applyInPandasWithState`` with named state
    variables (value/list/map state, timers, TTL) instead of a single
    tuple. Functionally mirrors :func:`running_counts` but carries a sum,
    and exercises the new state-store codepath.

    Scale shape is identical: state is sharded by the grouping key across
    the cluster's state store; each micro-batch shuffles only that batch's
    rows to their key's shard.

    Requires the RocksDB state-store provider and `google.protobuf` in the
    Python workers (the TWS state-server wire protocol); the test suite
    skips it where protobuf is absent."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", "cnt bigint, total double"
            )

        def handleInputRows(self, key, rows, timerValues):
            cnt, total = (
                self._totals.get() if self._totals.exists() else (0, 0.0)
            )
            for pdf in rows:
                cnt += len(pdf)
                total += float(pdf[value_col].sum())
            self._totals.update((cnt, total))
            yield pd.DataFrame(
                {key_col: [key[0]], "running_count": [cnt], "running_sum": [total]}
            )

        def close(self) -> None:
            pass

    return stream_df.groupBy(key_col).transformWithStateInPandas(
        RunningTotals(),
        outputStructType=(
            f"{key_col} bigint, running_count bigint, running_sum double"
        ),
        outputMode="Update",
        timeMode="None",
    )
