"""Structured Streaming tests: STREAM == BATCH for validation, windowed
profiling, and the quality filter (availableNow triggers on file sources)."""

import pytest
from pyspark.sql import functions as F

from dataqualitycontroltool_spark import streaming as st
from dataqualitycontroltool_spark.graft.pipeline import run_pipeline
from dataqualitycontroltool_spark.graft.rules import KeepDropConfig
from dataqualitycontroltool_spark.graft.synth import generate_images
from dataqualitycontroltool_spark.specs import TableSpec

SF_DIR = "/root/testdata/sf0.001"

EVENTS_SPEC = TableSpec.from_descriptor(
    {
        "fields": [
            {"name": "event_type", "type": "string", "MIPType": "nominal",
             "constraints": {"enum": ["click", "view", "purchase"]}},
            {"name": "value", "type": "number", "MIPType": "numerical",
             "constraints": {"minimum": 0, "maximum": 50}},
        ],
        "missingValues": [""],
    }
)


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Events re-written as a 2-file directory (so the stream sees >1 batchable file)."""
    out = str(tmp_path_factory.mktemp("stream_src") / "events")
    spark.read.parquet(f"{SF_DIR}/events.parquet").repartition(2).write.parquet(out)
    return out


def _read_stream(spark, path):
    schema = spark.read.parquet(path).schema
    return spark.readStream.schema(schema).parquet(path)


def test_windowed_summary_equals_batch(spark, events_dir):
    stream = _read_stream(spark, events_dir)
    agg = st.windowed_field_summary(
        stream, EVENTS_SPEC, time_col="ts", window="1 day", watermark="1 day"
    )
    q = (
        agg.writeStream.format("memory").queryName("winsum")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r.window_start, r.field): (r.nulls, r.valid, r.dtype_violations,
                                    r.constraint_violations, r.total_rows)
        for r in spark.sql("SELECT * FROM winsum").collect()
    }
    assert got, "stream produced no windows"

    # batch twin: same validation plan + same windowed aggregation
    batch = st.validated_stream(
        spark.read.parquet(events_dir).withColumn("ts", F.col("ts").cast("timestamp")),
        EVENTS_SPEC,
    )
    rows = []
    for f in ("event_type", "value"):
        rows.append(
            batch.select(
                F.window("ts", "1 day").alias("w"), F.lit(f).alias("field"),
                F.col(f"{f}__status").alias("status"),
            )
        )
    union = rows[0].unionByName(rows[1])
    expected = {
        (r["w"]["start"], r["field"]): (r["nulls"], r["valid"], r["dtype"],
                                        r["constraint"], r["total"])
        for r in union.groupBy("w", "field").agg(
            F.sum((F.col("status") == "missing").cast("int")).alias("nulls"),
            F.sum((F.col("status") == "valid").cast("int")).alias("valid"),
            F.sum((F.col("status") == "dtype").cast("int")).alias("dtype"),
            F.sum((F.col("status") == "constraint").cast("int")).alias("constraint"),
            F.count(F.lit(1)).alias("total"),
        ).collect()
    }
    assert got == expected


def test_stream_quality_filter_equals_batch(spark, tmp_path):
    src = str(tmp_path / "imgs")
    generate_images(spark, 300, n_partitions=3).write.parquet(src)

    stream = _read_stream(spark, src)
    out_path, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = st.write_validated(st.stream_quality_filter(stream), out_path, ckpt)
    q.awaitTermination(180)

    streamed = spark.read.parquet(out_path)
    cfg = KeepDropConfig(dedupe_on="")
    batch = run_pipeline(spark.read.parquet(src), cfg)
    s = {r.image_id: (r.keep, r.drop_reason, r.caption_scrubbed)
         for r in streamed.collect()}
    b = {r.image_id: (r.keep, r.drop_reason, r.caption_scrubbed)
         for r in batch.collect()}
    assert s == b and len(s) == 300


def test_stream_resume_from_checkpoint(spark, tmp_path):
    """Exactly-once resume: a second availableNow run over the same source
    with the same checkpoint must add nothing; new files are picked up."""
    src = str(tmp_path / "imgs")
    generate_images(spark, 100, n_partitions=1, seed=1).write.mode("append").parquet(src)
    out_path, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    stream1 = _read_stream(spark, src)
    st.write_validated(st.stream_quality_filter(stream1), out_path, ckpt).awaitTermination(180)
    n1 = spark.read.parquet(out_path).count()
    assert n1 == 100

    # re-run with no new data → no duplicates
    stream2 = _read_stream(spark, src)
    st.write_validated(st.stream_quality_filter(stream2), out_path, ckpt).awaitTermination(180)
    assert spark.read.parquet(out_path).count() == 100

    # append new files → only they are processed
    generate_images(spark, 50, n_partitions=1, seed=2).write.mode("append").parquet(src)
    stream3 = _read_stream(spark, src)
    st.write_validated(st.stream_quality_filter(stream3), out_path, ckpt).awaitTermination(180)
    assert spark.read.parquet(out_path).count() == 150


def test_stream_dedupe_within_watermark(spark, tmp_path):
    """Bounded-state streaming dedup: a second arrival of the same phash is
    dropped (first wins); distinct phashes all survive."""
    src = str(tmp_path / "imgs")
    df = generate_images(spark, 120, n_partitions=1).withColumn(
        "ts", F.lit("2024-01-01 00:00:00").cast("timestamp")
    )
    df.write.parquet(src)
    n_distinct = df.select("phash").distinct().count()

    schema = spark.read.parquet(src).schema
    stream = _read_stream(spark, src)
    out_path, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = st.write_validated(
        st.stream_quality_filter(stream, dedupe_within="1 hour"), out_path, ckpt
    )
    q.awaitTermination(180)
    got = spark.read.parquet(out_path)
    assert got.count() == n_distinct
    assert got.select("image_id").distinct().count() == n_distinct


def test_stream_static_dedup_index_equals_batch(spark, tmp_path):
    """Continuous-ingest dedup: the stream joins a PRECOMPUTED batch dedup
    index (stream-static left join) and must flag exactly the duplicates the
    batch pipeline flags with the same index — including is_dup and the
    dup-rule drop decision, which the stateless streaming default can't see."""
    from dataqualitycontroltool_spark.graft.pipeline import dedup_index

    src = str(tmp_path / "imgs")
    generate_images(spark, 300, n_partitions=3).write.parquet(src)
    hist = spark.read.parquet(src)
    idx = dedup_index(hist)  # historical/global index, computed once in batch

    stream = _read_stream(spark, src)
    out_path, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = st.write_validated(
        st.stream_quality_filter(stream, static_dedup=idx), out_path, ckpt
    )
    q.awaitTermination(180)

    streamed = spark.read.parquet(out_path)
    batch = run_pipeline(hist, dedup=idx)
    s = {r.image_id: (r.is_dup, r.keep, r.drop_reason) for r in streamed.collect()}
    b = {r.image_id: (r.is_dup, r.keep, r.drop_reason) for r in batch.collect()}
    assert s == b and len(s) == 300
    assert any(v[0] for v in s.values())  # synth corpus has real dup groups


def test_conflicting_dedup_args_raise(spark):
    """A supplied dedup index / retention window must never be silently
    discarded: conflicting or inert argument combinations raise."""
    stream = spark.readStream.format("rate").load()
    idx = spark.createDataFrame([(1, "a")], "phash long, keeper_id string")
    with pytest.raises(ValueError, match="mutually exclusive"):
        st.stream_quality_filter(stream, static_dedup=idx, dedupe_within="1 hour")
    no_key = KeepDropConfig(dedupe_on="")
    with pytest.raises(ValueError, match="dedupe_on"):
        st.stream_quality_filter(stream, cfg=no_key, static_dedup=idx)
    with pytest.raises(ValueError, match="dedupe_on"):
        st.stream_quality_filter(stream, cfg=no_key, dedupe_within="1 hour")
