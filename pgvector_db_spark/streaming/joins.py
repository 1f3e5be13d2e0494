"""Stream-stream event-time interval join.

The reference has no streaming surface at all (its "stream" is a
client-side loop, notebooks/pgvector_db.ipynb:118-241); this is the
Structured Streaming operator a realtime version of its pipeline needs:
correlate two live streams (e.g. click -> purchase attribution) within a
bounded event-time window.

Scale shape: both sides are hash-partitioned on the equality key, so each
executor joins disjoint key ranges. The interval condition PLUS watermarks
on BOTH sides is what makes unbounded streams joinable — Spark derives a
state-eviction bound from them (a left row can be dropped once the right
watermark passes left.ts + max_delay), keeping state O(in-flight window),
not O(stream). Without the time-bound predicate the state store would grow
forever; this module makes the bound mandatory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    max_delay: str = "30 minutes",
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join left/right rows with equal ``key`` where
    ``left_ts <= right_ts <= left_ts + max_delay``.

    Works identically on streaming DataFrames (with state + eviction) and
    batch DataFrames (plain range-predicate join) — the batch form is the
    oracle for the streaming form. Columns are disambiguated with
    ``l_`` / ``r_`` prefixes (except the shared key).
    """
    lw = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    rw = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    lp = lw.select(
        F.col(key),
        *[F.col(c).alias(f"l_{c}") for c in lw.columns if c != key],
    )
    rp = rw.select(
        F.col(key).alias(f"__rk_{key}"),
        *[F.col(c).alias(f"r_{c}") for c in rw.columns if c != key],
    )
    cond = (
        (lp[key] == rp[f"__rk_{key}"])
        & (rp[f"r_{right_ts}"] >= lp[f"l_{left_ts}"])
        & (
            rp[f"r_{right_ts}"]
            <= lp[f"l_{left_ts}"] + F.expr(f"INTERVAL {max_delay}")
        )
    )
    return lp.join(rp, cond, how).drop(f"__rk_{key}")
