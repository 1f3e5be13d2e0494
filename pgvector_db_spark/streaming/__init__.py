from pgvector_db_spark.streaming.continuous_agg import (
    batch_rollup_level,
    continuous_rollup,
)
from pgvector_db_spark.streaming.ingest import stream_append, stream_insert
from pgvector_db_spark.streaming.joins import interval_join
from pgvector_db_spark.streaming.replay import file_stream, rate_stream
from pgvector_db_spark.streaming.stateful import first_seen, running_counts
from pgvector_db_spark.streaming.windows import (
    batch_session_window_agg,
    batch_window_agg,
    session_window_agg,
    tumbling_window_agg,
)

__all__ = [
    "batch_rollup_level",
    "batch_session_window_agg",
    "batch_window_agg",
    "continuous_rollup",
    "file_stream",
    "first_seen",
    "interval_join",
    "rate_stream",
    "running_counts",
    "session_window_agg",
    "stream_append",
    "stream_insert",
    "tumbling_window_agg",
]
