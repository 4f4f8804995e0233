"""Stateful-streaming sessionization: emitted sessions must equal the batch
(lag+cumsum) oracle for all sessions closed within the stream; each user's
open tail session stays in state (emitted only by event-time timeout)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dataqualitycontroltool_spark.streaming.sessionize import (
    sessionize_batch,
    sessionize_stream,
)

SF_DIR = "/root/testdata/sf0.001"
GAP = 6 * 3600  # 6h — events table has multi-event days with gaps


@pytest.fixture(scope="module")
def src(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sess") / "events")
    spark.read.parquet(f"{SF_DIR}/events.parquet").repartition(2).write.parquet(out)
    return out


def _key(r):
    return (r.user_id, r.session_start, r.session_end, r.n_events,
            round(r.total_value, 6))


def test_stream_sessions_match_batch(spark, src):
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        sessionize_stream(stream, gap_seconds=GAP)
        .writeStream.format("memory").queryName("sess")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = {_key(r) for r in spark.sql("SELECT * FROM sess").collect()}

    batch = sessionize_batch(spark.read.parquet(src), gap_seconds=GAP)
    all_sessions = {_key(r) for r in batch.collect()}
    # each user's final (open) session is withheld in state unless a later
    # micro-batch's watermark times it out; everything emitted must be a real
    # session and all non-tail sessions must be emitted
    tails = {
        _key(r)
        for r in batch.withColumn(
            "_rk",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window
                .partitionBy("user_id").orderBy(F.col("session_end").desc())
            ),
        ).where("_rk = 1").drop("_rk").collect()
    }
    assert got <= all_sessions
    assert all_sessions - tails <= got
    assert len(got) >= len(all_sessions) - len(tails)


def test_batch_sessionizer_shape(spark):
    rows = [
        (1, "2024-01-01 10:00:00", 1.0),
        (1, "2024-01-01 10:10:00", 2.0),   # same session
        (1, "2024-01-01 20:00:00", 3.0),   # new session (gap > 6h)
        (2, "2024-01-01 00:00:00", 5.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string, value double")
    out = {(r.user_id, r.n_events, r.total_value)
           for r in sessionize_batch(df, gap_seconds=GAP).collect()}
    assert out == {(1, 2, 3.0), (1, 1, 3.0), (2, 1, 5.0)}


class _FakeState:
    """Minimal GroupState double: value + watermark + timeout bookkeeping."""

    def __init__(self, wm_ms=0):
        self._v = None
        self.hasTimedOut = False
        self._wm = wm_ms
        self.timeout_ms = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def remove(self):
        self._v = None

    def getCurrentWatermarkMs(self):
        return self._wm

    def setTimeoutTimestamp(self, ms):
        self.timeout_ms = ms


def _run_batch(fn, state, events, wm_ms):
    import pandas as pd

    state._wm = wm_ms
    state.hasTimedOut = False
    pdf = pd.DataFrame(events, columns=["ts", "value"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    return list(fn((1,), iter([pdf]), state))


def test_stream_fold_out_of_order_across_batches():
    # ADVICE r1 (medium): with a nonzero watermark, a late in-lateness event
    # must (a) lower the open session's start when it lands just before it,
    # and (b) form its OWN earlier session when it lands > gap before it —
    # both folds must match sessionize_batch on the union of events.
    from dataqualitycontroltool_spark.streaming.sessionize import _make_session_fn

    fn = _make_session_fn("ts", "value", gap_seconds=600)  # 10 min
    st = _FakeState()

    # batch 1: one event at 10:00 -> open session, nothing emitted (wm=0)
    out = _run_batch(fn, st, [("2024-01-01 10:00:00", 1.0)], wm_ms=0)
    assert out == [] and st.exists

    # batch 2 (wm now 09:00-ish, far below): late event 09:58 -> merges and
    # LOWERS the start; late event 09:30 -> > gap before -> separate session
    out = _run_batch(
        fn, st,
        [("2024-01-01 09:58:00", 2.0), ("2024-01-01 09:30:00", 4.0)],
        wm_ms=0,
    )
    assert out == []
    starts, ends, ns, totals = st.get
    assert len(starts) == 2
    sess = sorted(zip(starts, ends, ns, totals))
    assert pd.Timestamp(sess[0][0], unit="us") == pd.Timestamp("2024-01-01 09:30:00")
    assert sess[0][2] == 1 and sess[0][3] == 4.0
    assert pd.Timestamp(sess[1][0], unit="us") == pd.Timestamp("2024-01-01 09:58:00")
    assert pd.Timestamp(sess[1][1], unit="us") == pd.Timestamp("2024-01-01 10:00:00")
    assert sess[1][2] == 2 and sess[1][3] == 3.0

    # timeout: watermark passes 09:30+gap but not 10:00+gap -> only the
    # earlier session is emitted; the later one stays pending
    st.hasTimedOut = True
    wm = int(pd.Timestamp("2024-01-01 09:50:00").value // 1_000_000)
    st._wm = wm
    out = list(fn((1,), iter([]), st))
    assert len(out) == 1
    r = out[0].iloc[0]
    assert r.session_start == pd.Timestamp("2024-01-01 09:30:00")
    assert r.n_events == 1 and r.total_value == 4.0
    assert st.exists and len(st.get[0]) == 1
    assert st.timeout_ms > wm


def test_stream_fold_bridging_late_event():
    # a late event can BRIDGE two pending sessions into one
    from dataqualitycontroltool_spark.streaming.sessionize import _make_session_fn

    fn = _make_session_fn("ts", "value", gap_seconds=600)
    st = _FakeState()
    _run_batch(fn, st, [("2024-01-01 09:00:00", 1.0), ("2024-01-01 09:18:00", 1.0)],
               wm_ms=0)
    assert len(st.get[0]) == 2  # 18 min apart -> two sessions
    _run_batch(fn, st, [("2024-01-01 09:09:00", 1.0)], wm_ms=0)
    starts, ends, ns, totals = st.get
    assert len(starts) == 1 and ns[0] == 3 and totals[0] == 3.0


def test_sessionize_rejects_string_user_ids(spark):
    df = spark.createDataFrame([("u1", "2024-01-01 00:00:00", 1.0)],
                               "user_id string, ts string, value double")
    stream_like = df  # dtype check happens before any streaming machinery
    with pytest.raises(TypeError, match="integral"):
        sessionize_stream(stream_like)


def test_batch_sessionizer_drops_null_ts(spark):
    # review r2: NULL event times are un-sessionizable and engines disagree
    # on NULL sort order — both twins drop them
    rows = [
        (1, "2024-01-01 10:00:00", 1.0),
        (1, None, 99.0),
        (2, None, 5.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string, value double")
    out = [tuple(r) for r in sessionize_batch(df, gap_seconds=600).collect()]
    assert len(out) == 1
    assert out[0][0] == 1 and out[0][3] == 1 and out[0][4] == 1.0


def test_stream_boundary_event_at_exact_watermark_merges():
    # advice r3 (low): an on-time event arriving at exactly
    # ts == wm == session_end + gap merges in the batch twin (diff <= gap),
    # so the stream must NOT have finalized that session — finality is
    # strict (end + gap < wm), and the re-armed timeout stays > wm.
    import pandas as pd

    from dataqualitycontroltool_spark.streaming.sessionize import _make_session_fn

    fn = _make_session_fn("ts", "value", gap_seconds=600)
    st = _FakeState()
    _run_batch(fn, st, [("2024-01-01 10:00:00", 1.0)], wm_ms=0)

    # watermark lands EXACTLY on end + gap (10:10): session must stay pending
    wm = int(pd.Timestamp("2024-01-01 10:10:00").value // 1_000_000)
    out = _run_batch(fn, st, [], wm_ms=wm)
    assert out == [] and st.exists
    assert st.timeout_ms > wm  # Spark requires timeout strictly > watermark

    # the boundary event merges instead of opening a split session
    out = _run_batch(fn, st, [("2024-01-01 10:10:00", 2.0)], wm_ms=wm)
    assert out == []
    starts, ends, ns, totals = st.get
    assert len(starts) == 1 and ns[0] == 2 and totals[0] == 3.0

    # one microsecond past the boundary -> final, emitted once
    st.hasTimedOut = True
    out = list(fn((1,), iter([]), st))
    st._wm = wm + 600_000_000 // 1000 + 1
    st.hasTimedOut = True
    out = list(fn((1,), iter([]), st))
    assert len(out) == 1 and out[0].iloc[0].n_events == 2
    assert not st.exists
