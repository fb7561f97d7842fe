"""Stream-stream interval join (SURVEY §2.11 extension).

The funnel/attribution shape: two unbounded streams joined on a key AND a
time-range condition (e.g. purchases within one hour of the same user's
signup). Structured Streaming requires event-time watermarks on BOTH
sides plus a range constraint between the two event-time columns — that
pair of bounds is what lets the state store evict: a left row can be
dropped once the right watermark passes `left.ts + upper_bound`. State is
therefore O(events within the join window), independent of stream length.

Batch-first: the same composition on static frames is a plain
interval equi-join, which is how the parity test pins correctness.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    within: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join rows of ``right`` occurring in [left_ts, left_ts + within].

    ``left``/``right`` must already carry distinct column names (alias
    upstream) and, for streaming inputs, watermarks on their event-time
    columns. The range conjunct below is the state-eviction contract.

    ``how='left_outer'`` adds never-matched left rows with a NULL right
    side. Streaming semantics: an unmatched left row emits only once the
    watermark passes ``left_ts + within`` (before that, a match could
    still arrive) — so at end-of-input, unmatched rows younger than
    (max event time − watermark delay − within) are still held in state
    and are NOT emitted. Batch runs have no watermark and emit them all;
    the parity test pins exactly that split.
    """
    cond = (
        (F.col(f"l_{key}") == F.col(f"r_{key}"))
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {within}"))
    )
    return left.join(right, cond, how)
