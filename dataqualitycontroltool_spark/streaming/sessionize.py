"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState``.

The reference groups DICOM rows into sequences/studies/patients with driver
dicts (`/root/reference/mipqctool/controller/dicomreport.py:322-386`); on an
unbounded stream the same "group rows into entities" shape needs managed
per-key state.  This operator assembles per-user sessions (events closer
than ``gap`` belong together) and emits each session exactly once:

* a session is emitted exactly once, as soon as the event-time WATERMARK
  STRICTLY passes ``session_end + gap`` (strict because Spark still accepts
  an on-time event at exactly ts == watermark, which merges under
  ``ts - end <= gap``) — from that point no in-lateness event can
  extend or bridge it, so emission is final even for out-of-order arrivals
  across micro-batches (any ``watermark`` delay is supported, not just the
  zero-lateness default);
* sessions not yet watermark-final stay in the state store as PARALLEL
  ARRAYS of fixed-width summaries (start, end, n, total per session — no
  event buffering), with an event-time timeout at the EARLIEST pending
  ``end + gap`` so closed sessions flush in the no-data micro-batch that
  follows a watermark advance.

New events MERGE-FOLD into the pending session list (sorted by start, join
anything within ``gap``), so an event earlier than an open session's start
correctly lowers the start, and an event more than ``gap`` before it forms
its own earlier session instead of being swallowed — the two cross-batch
out-of-order hazards of a single-open-session fold.

Scale: state per key is O(pending sessions), bounded by
``watermark_delay / gap + 1`` (older sessions are flushed by watermark) —
independent of event count, so skewed users cost a handful of 28-byte
summaries; the only shuffle is the groupBy(user) exchange Spark needs for
key-local state anyway.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events int, total_value double"
)
# epoch-microsecond bounds + running aggregates per PENDING session, as
# parallel arrays — fixed width per session, no event buffering
STATE_SCHEMA = (
    "starts array<bigint>, ends array<bigint>, ns array<int>, totals array<double>"
)

_US_PER_MS = 1000


def _micros(ts: pd.Timestamp) -> int:
    return int(ts.value // 1000)


def _make_session_fn(ts_col: str, value_col: str, gap_seconds: int):
    """The per-key state-transition function, exposed for direct unit tests
    of the out-of-order / watermark cases (a fake GroupState drives it the
    way the state store would across micro-batches)."""
    gap_us = gap_seconds * 1_000_000
    gap_ms = gap_seconds * 1000

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (user,) = key

        def row(s) -> tuple:
            return (
                user,
                pd.Timestamp(s[0], unit="us"),
                pd.Timestamp(s[1], unit="us"),
                int(s[2]),
                float(s[3]),
            )

        cols = ["user_id", "session_start", "session_end", "n_events", "total_value"]

        # pending sessions from state, as mutable [start, end, n, total] rows
        if state.exists:
            starts, ends, ns, totals = state.get
            sessions = [list(t) for t in zip(starts, ends, ns, totals)]
        else:
            sessions = []

        if not state.hasTimedOut:
            # merge-fold the batch's events into the pending list: sort
            # everything by start time, join any two items within `gap`.
            # Handles events before an open session's start (lowers it) and
            # events > gap before it (separate earlier session) — the two
            # out-of-order cases a single-open-session fold gets wrong.
            pdf = pd.concat(list(pdfs))
            items = sessions + [
                [_micros(pd.Timestamp(ts)), _micros(pd.Timestamp(ts)), 1,
                 0.0 if pd.isna(val) else float(val)]
                for ts, val in zip(pdf[ts_col], pdf[value_col])
            ]
            items.sort(key=lambda s: s[0])
            sessions = []
            for it in items:
                if sessions and it[0] - sessions[-1][1] <= gap_us:
                    cur = sessions[-1]
                    cur[1] = max(cur[1], it[1])
                    cur[2] += it[2]
                    cur[3] += it[3]
                else:
                    sessions.append(it)

        # a session is FINAL once the watermark passes end+gap: no
        # in-lateness event can extend or bridge it any more.  The compare
        # is in MICROSECONDS (watermark promoted, not the end floored):
        # flooring end to ms would declare a session final up to 999us
        # early, and a non-late sub-ms event could then re-open an
        # already-emitted session (duplicate emission).
        # STRICT compare: Spark still accepts an on-time event at exactly
        # ts == watermark, and the merge condition is ts - end <= gap, so a
        # session with end + gap == wm can still be extended by an event at
        # ts == wm — it must stay pending (the batch twin merges that event;
        # emitting here would split it and break stream==batch equivalence)
        wm_us = state.getCurrentWatermarkMs() * _US_PER_MS
        final = [s for s in sessions if s[1] + gap_us < wm_us]
        pending = [s for s in sessions if s[1] + gap_us >= wm_us]

        if pending:
            state.update(tuple(zip(*pending)))
            # flush the earliest pending session as soon as the watermark
            # allows; CEILING to ms so the timeout never fires before the
            # session is truly final, and at least wm+1ms since a boundary
            # session (end + gap == wm) is now kept pending but Spark
            # requires timeout timestamps strictly > the current watermark
            earliest_us = min(s[1] for s in pending) + gap_us
            wm_ms = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(-(-earliest_us // _US_PER_MS), wm_ms + 1))
        elif state.exists:
            state.remove()
        if final:
            yield pd.DataFrame([row(s) for s in final], columns=cols)

    return fn


def sessionize_stream(
    stream_df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_seconds: int = 1800,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Per-user session summaries (start, end, n_events, total_value),
    emitted once per session (append mode)."""
    from pyspark.sql import functions as F

    dtype = dict(stream_df.dtypes).get(user_col)
    if dtype not in ("tinyint", "smallint", "int", "bigint", "long"):
        raise TypeError(
            f"sessionize_stream needs an integral {user_col!r} (got {dtype}); "
            "hash string keys to int64 (xxhash64) or adapt SESSION_SCHEMA/"
            "STATE_SCHEMA to string keys"
        )

    fn = _make_session_fn(ts_col, value_col, gap_seconds)
    prepared = (
        stream_df.select(
            F.col(user_col).cast("bigint").alias(user_col),
            F.col(ts_col).cast("timestamp").alias(ts_col),
            F.col(value_col).cast("double").alias(value_col),
        )
        # an event without a time cannot be sessionized: drop it explicitly
        # (pd.Timestamp(NaT) would otherwise fold to INT64_MIN microseconds
        # and emit a garbage year-1677 session; the batch twin and its SQL
        # oracle apply the same filter)
        .where(F.col(ts_col).isNotNull())
        .withWatermark(ts_col, watermark)
    )
    return prepared.groupBy(user_col).applyInPandasWithState(
        fn, SESSION_SCHEMA, STATE_SCHEMA, "append", GroupStateTimeout.EventTimeTimeout
    )


def sessionize_batch(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Batch twin (lag + cumulative-sum session ids) — the classic windowed
    formulation, used as the oracle for the streaming operator and available
    for backfills.  Two window passes over (user, ts) ordering; no state."""
    from pyspark.sql import Window, functions as F

    w = Window.partitionBy(user_col).orderBy(ts_col)
    ts = F.col(ts_col).cast("timestamp")
    prev = F.lag(ts).over(w)
    new_session = (
        prev.isNull() | (ts.cast("long") - prev.cast("long") > gap_seconds)
    ).cast("int")
    with_sid = (
        df.select(
            F.col(user_col).cast("bigint").alias(user_col),
            ts.alias(ts_col),
            F.col(value_col).cast("double").alias(value_col),
        )
        # NULL event times are un-sessionizable and engines disagree on
        # where they sort (Spark windows: NULLS FIRST; DuckDB: NULLS LAST,
        # where the gap CASE silently folds them into the last session) —
        # drop them on both sides, same as the streaming operator
        .where(F.col(ts_col).isNotNull())
        .withColumn("_sid", F.sum(new_session).over(w))
    )
    return (
        with_sid.groupBy(user_col, "_sid")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).cast("int").alias("n_events"),
            F.sum(F.coalesce(value_col, F.lit(0.0))).alias("total_value"),
        )
        .drop("_sid")
    )
