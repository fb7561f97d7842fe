"""Custom stateful streaming operators (``applyInPandasWithState``).

The reference has no streaming surface (SURVEY §2.11); these are the
engine-extension operators a training-data ingest pipeline needs when the
corpus arrives as a stream:

  * ``streaming_dedup_first`` — keep the first-seen row per key ACROSS
    micro-batches. Same declared semantics as batch ``dedup_exact``
    (operators/dedup.py) restricted to arrival order; unlike
    ``dropDuplicates`` on a stream, the keyed state and its eviction are
    explicit (processing-time timeout), so state size is operator-controlled
    rather than unbounded.
  * ``running_stats`` — per-key cumulative count/sum emitted every
    micro-batch (update-mode running aggregates with explicit state).

Scale: state lives in the state store, hash-partitioned by key — the same
shuffle key as the groupBy, so one exchange per micro-batch; per-group
compute is Arrow-batched pandas.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_dedup_first(
    df: DataFrame,
    key_cols: list[str],
    state_timeout_ms: int | None = None,
) -> DataFrame:
    """First-seen row per ``key_cols`` across micro-batches.

    Emits a row the first time a key is seen; subsequent occurrences (same
    or later micro-batch) emit nothing. With ``state_timeout_ms`` set,
    a key's state is evicted after that much processing-time idleness —
    bounding the store for long streams at the cost of re-admitting a key
    seen again after the window (the standard TTL trade-off).

    Operational note (observed): combine the TTL ONLY with continuous
    triggers. Under ``trigger(availableNow=True)`` a ProcessingTimeTimeout
    keeps the query scheduling empty micro-batches to fire pending
    timeouts — it will not self-terminate after draining the source. For
    bounded/batch-style runs leave ``state_timeout_ms=None``; dedup state
    then persists for the query's lifetime and recovers from the
    checkpoint on restart.
    """
    out_schema = df.schema
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_timeout_ms
        else GroupStateTimeout.NoTimeout
    )

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        seen = state.exists
        if not seen:
            for pdf in pdfs:
                if len(pdf):
                    state.update((True,))
                    if state_timeout_ms:
                        state.setTimeoutDuration(state_timeout_ms)
                    yield pdf.head(1)
                    return
        else:
            for _ in pdfs:  # drain; key already emitted
                pass
            if state_timeout_ms:
                state.setTimeoutDuration(state_timeout_ms)

    return df.groupBy(*key_cols).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=timeout,
    )


def running_stats(
    df: DataFrame,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """Per-key cumulative (n, total) re-emitted each micro-batch the key
    appears in — an update-mode running aggregate with explicit state."""
    key_type = dict(df.dtypes)[key_col]
    out_schema = f"{key_col} {key_type}, n long, total double"

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame({key_col: [key[0]], "n": [n], "total": [total]})

    return df.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_dedup_within_watermark(
    df: DataFrame,
    key_cols: list[str],
    time_col: str,
    delay: str = "10 minutes",
) -> DataFrame:
    """Built-in event-time-bounded dedup: first row per key wins, and a
    key's state is dropped once the watermark passes its event time plus
    ``delay`` (``dropDuplicatesWithinWatermark``).

    The idiomatic counterpart to ``streaming_dedup_first``: state eviction
    rides the EVENT-TIME watermark instead of a processing-time timeout, so
    it composes with ``trigger(availableNow=True)`` (the query drains and
    terminates — no pending-timeout rescheduling, see the operational note
    on ``streaming_dedup_first``) and state size is bounded by the stream's
    key arrival rate within the watermark horizon rather than by query
    lifetime. Use this when duplicates cluster in time (retries, at-least-
    once sources); use the explicit-state variant when dedup must span
    arbitrary wall-clock gaps.
    """
    from iniz_exporters_spark.streaming.windows import ensure_event_time

    return (
        ensure_event_time(df, time_col)
        .withWatermark(time_col, delay)
        .dropDuplicatesWithinWatermark(key_cols)
    )


def streaming_sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    watermark: str = "1 hour",
) -> DataFrame:
    """Custom-state gap sessionization — the streaming counterpart of
    ``operators/cohorts.sessionize`` with identical session semantics.

    Keeps ONE open session per user in explicit state (start, end, count —
    constant-size, never the events themselves). Each micro-batch folds its
    (sorted) arrivals into the open session: a gap > ``gap_minutes`` closes
    it (emitted immediately) and opens a new one. The open session closes
    through an EVENT-TIME timeout at ``end + gap``: when the watermark
    passes that point no earlier-timestamped event can arrive (that's the
    watermark contract), so the session is provably complete. Sessions
    still open at end-of-input stay in state — exactly the batch/stream
    split the left-outer interval join has, and the parity test pins it.

    Within a micro-batch arrivals are sorted by event time, so in-batch
    disorder is handled exactly; ACROSS batches an event later than the
    watermark allows is dropped by the upstream ``withWatermark`` (standard
    lateness semantics).
    """
    gap_us = gap_minutes * 60_000_000
    out_schema = (
        f"{user_col} bigint, session_start timestamp, "
        "session_end timestamp, n_events long"
    )

    def emit(key, sessions):
        return pd.DataFrame(
            {
                user_col: [key] * len(sessions),
                "session_start": [
                    pd.to_datetime(s, unit="us") for s, _, _ in sessions
                ],
                "session_end": [
                    pd.to_datetime(e, unit="us") for _, e, _ in sessions
                ],
                "n_events": [n for _, _, n in sessions],
            }
        )

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            if state.exists:
                s, e, n = state.get
                state.remove()
                yield emit(key[0], [(s, e, n)])
            else:
                state.remove()
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        ts_us = (
            rows[ts_col].astype("datetime64[us]").astype("int64").sort_values()
        )
        cur = list(state.get) if state.exists else None
        closed = []
        for t in ts_us:
            if cur is None:
                cur = [t, t, 1]
            elif t - cur[1] > gap_us:
                closed.append(tuple(cur))
                cur = [t, t, 1]
            else:
                cur[1] = max(cur[1], t)
                cur[2] += 1
        state.update(tuple(cur))
        # close the open session once the watermark passes end + gap
        state.setTimeoutTimestamp(cur[1] // 1000 + gap_minutes * 60_000)
        if closed:
            yield emit(key[0], closed)

    from iniz_exporters_spark.streaming.windows import ensure_event_time

    return (
        ensure_event_time(df, ts_col)
        .withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType="start_us long, end_us long, n long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def streaming_ewma(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    alpha: float = 0.3,
) -> DataFrame:
    """Per-event EWMA over a stream with O(1) state per key: the exact
    recursion ewma = (1-alpha)*prev + alpha*x, seeded 0 — the streaming
    twin of ``operators/timeseries.ewma`` (whose window fold truncates at
    `depth`; with depth ≥ the series length the two are bit-identical,
    which the parity test pins).

    Rows inside a micro-batch are folded in (ts, id) order; state carries
    ONE double across batches — the watermark-free running aggregate
    shape, same as ``running_stats``. Emits one row per input event
    (append mode) with the post-update smoothed value.
    """
    key_type = dict(df.dtypes)[key_col]
    id_type = dict(df.dtypes)[id_col]
    out_schema = (
        f"{key_col} {key_type}, {id_col} {id_type}, ewma double"
    )

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        (acc,) = state.get if state.exists else (0.0,)
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values([ts_col, id_col])
            out = []
            for x in pdf[value_col].astype(float).values:
                acc = acc * (1.0 - alpha) + x * alpha
                out.append(acc)
            yield pd.DataFrame(
                {
                    key_col: pdf[key_col].values,
                    id_col: pdf[id_col].values,
                    "ewma": out,
                }
            )
        state.update((acc,))

    return df.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType="acc double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_misra_gries(
    df: DataFrame,
    key_col: str,
    item_col: str,
    k: int = 8,
) -> DataFrame:
    """Bounded-state streaming frequent items (Misra–Gries summary) per
    key: at most ``k`` (item, count) counters survive in state no matter
    how many distinct items stream through — the deterministic guarantee
    is that any item with true frequency > N/(k+1) is present, and each
    kept counter undercounts by at most N/(k+1).

    This is the state-bounded answer to "top items per key" on an
    unbounded stream, where a groupBy count would grow state with the
    vocabulary. Emits the surviving counters (update mode) each
    micro-batch with the per-key processed total so consumers can apply
    the error bound. State: two parallel arrays, <= k entries.
    """
    key_type = dict(df.dtypes)[key_col]
    out_schema = (
        f"{key_col} {key_type}, item string, min_count long, n_total long"
    )

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            items, counts, total = state.get
            summary = dict(zip(list(items), list(counts)))
            total = int(total)
        else:
            summary, total = {}, 0
        for pdf in pdfs:
            for it in pdf[item_col].astype(str).values:
                total += 1
                if it in summary:
                    summary[it] += 1
                elif len(summary) < k:
                    summary[it] = 1
                else:
                    # decrement-all step; drop zeroed counters
                    summary = {
                        i: c - 1 for i, c in summary.items() if c > 1
                    }
        state.update(
            (list(summary.keys()), [int(c) for c in summary.values()], total)
        )
        ks = sorted(summary.items(), key=lambda ic: (-ic[1], ic[0]))
        yield pd.DataFrame(
            {
                key_col: [key[0]] * len(ks),
                "item": [i for i, _ in ks],
                "min_count": [int(c) for _, c in ks],
                "n_total": [total] * len(ks),
            }
        )

    return df.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=(
            "items array<string>, counts array<long>, total long"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
