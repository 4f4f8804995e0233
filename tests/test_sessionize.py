"""Stateful-streaming sessionization: emitted sessions must equal the batch
(lag+cumsum) oracle for all sessions closed within the stream; each user's
open tail session stays in state (emitted only by event-time timeout)."""

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


def test_sessionize_rejects_string_user_ids(spark):
    df = spark.createDataFrame([("u1", "2024-01-01 00:00:00", 1.0)],
                               "user_id string, ts string, value double")
    stream_like = df  # dtype check happens before any streaming machinery
    with pytest.raises(TypeError, match="integral"):
        sessionize_stream(stream_like)
