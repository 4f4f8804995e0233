"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState``.

The reference groups DICOM rows into sequences/studies/patients with driver
dicts (`/root/reference/mipqctool/controller/dicomreport.py:322-386`); on an
unbounded stream the same "group rows into entities" shape needs managed
per-key state.  This operator assembles per-user sessions (events closer
than ``gap`` belong together) and emits each session exactly once:

* sessions CLOSED by a later event in the same micro-batch are emitted
  immediately;
* the open tail session lives in the state store (a fixed-width 4-tuple per
  user — bounded state) with an EVENT-TIME timeout at ``end + gap``: when
  the watermark passes it, the session is emitted and state removed.

Scale: state per key is O(1) (no event buffering); the only shuffle is the
groupBy(user) exchange Spark needs for key-local state anyway; skewed users
cost one state row regardless of event count because sessions fold
incrementally per batch.
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
# epoch-microsecond bounds + running aggregates — fixed width, no buffering
STATE_SCHEMA = "start bigint, end bigint, n int, total double"

_US_PER_MS = 1000


def _micros(ts: pd.Timestamp) -> int:
    return int(ts.value // 1000)


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

    gap_us = gap_seconds * 1_000_000

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

        if state.hasTimedOut:
            # watermark passed end+gap → the open session is final
            closed = state.get
            state.remove()
            yield pd.DataFrame([row(closed)], columns=cols)
            return

        pdf = pd.concat(list(pdfs)).sort_values(ts_col)
        cur = list(state.get) if state.exists else None
        out = []
        for ts, val in zip(pdf[ts_col], pdf[value_col]):
            t = _micros(pd.Timestamp(ts))
            v = 0.0 if pd.isna(val) else float(val)
            if cur is None:
                cur = [t, t, 1, v]
            elif t - cur[1] > gap_us:
                out.append(row(cur))
                cur = [t, t, 1, v]
            else:
                cur[1] = max(cur[1], t)
                cur[2] += 1
                cur[3] += v
        state.update(tuple(cur))
        state.setTimeoutTimestamp(cur[1] // _US_PER_MS + gap_seconds * 1000)
        if out:
            yield pd.DataFrame(out, columns=cols)

    prepared = stream_df.select(
        F.col(user_col).cast("bigint").alias(user_col),
        F.col(ts_col).cast("timestamp").alias(ts_col),
        F.col(value_col).cast("double").alias(value_col),
    ).withWatermark(ts_col, watermark)
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
    with_sid = df.select(
        F.col(user_col).cast("bigint").alias(user_col),
        ts.alias(ts_col),
        F.col(value_col).cast("double").alias(value_col),
    ).withColumn("_sid", F.sum(new_session).over(w))
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
