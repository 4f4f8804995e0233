"""Aspect-ratio bucketing (graft/buckets.py): assignment correctness vs an
independent numpy argmin, plan shape (pure projection, no UDF/shuffle), and
deterministic batch assembly."""

import math

import pytest
from pyspark.sql import functions as F

from dataqualitycontroltool_spark.graft import buckets


def test_standard_buckets_shape():
    bs = buckets.standard_buckets()
    assert all(w % 64 == 0 and h % 64 == 0 for w, h in bs)
    assert all(0.25 <= w / h <= 4.0 for w, h in bs)
    assert (1024, 1024) in bs
    assert len(bs) == len(set(bs))
    # ascending width, so the tie-break order is stable
    assert [w for w, _ in bs] == sorted(w for w, _ in bs)


def _expected_bucket(w, h, bs):
    # independent reimplementation: argmin of |log(ar) - log(bucket ar)|,
    # ties -> first by (distance, bw, bh) like the struct min
    target = math.log(w / h)
    return min(
        (round(abs(target - math.log(bw / bh)), 9), bw, bh) for bw, bh in bs
    )[1:]


def test_assignment_matches_numpy_argmin(spark):
    bs = buckets.standard_buckets()
    rows = [
        (1, 1024, 1024),
        (2, 1920, 1080),
        (3, 1080, 1920),
        (4, 640, 480),
        (5, 3000, 1000),   # clamps to widest allowed ratio
        (6, 333, 777),     # odd dims, nothing exact
        (7, None, 500),    # invalid -> NULL bucket
        (8, 0, 100),       # non-positive -> NULL bucket
    ]
    df = spark.createDataFrame(rows, "image_id long, w int, h int")
    out = {r.image_id: r for r in buckets.assign_aspect_buckets(df).collect()}
    for image_id, w, h in rows:
        r = out[image_id]
        if not w or not h:
            assert r.bucket_w is None and r.bucket_h is None
            assert r.resize_scale is None
        else:
            assert (r.bucket_w, r.bucket_h) == _expected_bucket(w, h, bs), image_id
            assert r.resize_scale == round(
                max(r.bucket_w / w, r.bucket_h / h), 6
            )


def test_assignment_plan_is_pure_projection(spark):
    df = spark.createDataFrame(
        [(i, 64 + i, 128) for i in range(50)], "image_id long, w int, h int"
    )
    out = buckets.assign_aspect_buckets(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan          # no UDF — stays JVM-side
    # toString() marks whole-stage-codegen stages with a "*(n)" prefix
    assert "*(" in plan


def test_bucket_stats(spark):
    bs = [(512, 512), (1024, 512)]
    df = spark.createDataFrame(
        [(1, 512, 512), (2, 500, 500), (3, 1000, 480), (4, 256, 256)],
        "image_id long, w int, h int",
    )
    out = buckets.assign_aspect_buckets(df, buckets=bs)
    stats = {(r.bucket_w, r.bucket_h): r for r in buckets.bucket_stats(out).collect()}
    assert stats[(512, 512)].n_images == 3
    assert stats[(1024, 512)].n_images == 1
    # 512/256 = 2.0 upscale on image 4; images 1 is exact (1.0, not upscaled)
    assert stats[(512, 512)].n_upscaled == 2  # ids 2 (1.024) and 4 (2.0)


def test_bucket_batches_deterministic(spark):
    bs = [(512, 512), (1024, 512)]
    rows = [(i, 512, 512) for i in range(10)] + [(100 + i, 1024, 512) for i in range(7)]
    df = buckets.assign_aspect_buckets(
        spark.createDataFrame(rows, "image_id long, w int, h int"), buckets=bs
    )
    out = buckets.bucket_batches(df, batch_size=4)
    a = sorted((r.image_id, r.batch_id, r.pos) for r in out.collect())
    b = sorted((r.image_id, r.batch_id, r.pos) for r in out.collect())
    assert a == b  # replayable, no RNG state
    rows_by_bucket = {}
    for r in out.collect():
        rows_by_bucket.setdefault((r.bucket_w, r.bucket_h), []).append(r)
    sq = rows_by_bucket[(512, 512)]
    assert sorted(r.pos for r in sq) == list(range(1, 11))
    # batches are full except the trailing one, which is flagged
    by_batch = {}
    for r in sq:
        by_batch.setdefault(r.batch_id, []).append(r)
    assert len(by_batch[0]) == 4 and len(by_batch[1]) == 4 and len(by_batch[2]) == 2
    assert all(not r.is_partial for b in (0, 1) for r in by_batch[b])
    assert all(r.is_partial for r in by_batch[2])
    # the 7-row bucket: one full batch of 4, partial of 3
    wd = rows_by_bucket[(1024, 512)]
    assert sum(1 for r in wd if r.is_partial) == 3
    # order is decorrelated from id order (md5 permutation, seed 42)
    assert [r.image_id for r in sorted(sq, key=lambda r: r.pos)] != sorted(
        r.image_id for r in sq
    )


def test_bucket_batches_validates_size(spark):
    df = spark.createDataFrame([(1, 512, 512)], "image_id long, w int, h int")
    with pytest.raises(ValueError):
        buckets.bucket_batches(buckets.assign_aspect_buckets(df), batch_size=0)
    with pytest.raises(ValueError):
        buckets.bucket_batches(
            buckets.assign_aspect_buckets(df), batch_size=4, n_shards=0
        )


def test_bucket_batches_sharded_and_null_buckets(spark):
    # n_shards splits each bucket into deterministic sub-streams: positions
    # are contiguous per (bucket, shard), batches never mix buckets, and the
    # whole assignment replays identically.  NULL-bucket rows (invalid dims)
    # must NOT be batched.
    bs = [(512, 512), (1024, 512)]
    rows = [(i, 512, 512) for i in range(40)] + [
        (100 + i, 1024, 512) for i in range(11)
    ] + [(200, None, 512), (201, 512, 0)]
    df = buckets.assign_aspect_buckets(
        spark.createDataFrame(rows, "image_id long, w int, h int"), buckets=bs
    )
    out = buckets.bucket_batches(df, batch_size=4, n_shards=3).collect()
    assert sorted(
        (r.image_id, r.shard, r.batch_id, r.pos) for r in out
    ) == sorted(
        (r.image_id, r.shard, r.batch_id, r.pos)
        for r in buckets.bucket_batches(df, batch_size=4, n_shards=3).collect()
    )
    for r in out:
        if r.image_id in (200, 201):
            assert r.pos is None and r.batch_id is None and r.is_partial is None
    streams = {}
    for r in out:
        if r.pos is not None:
            streams.setdefault((r.bucket_w, r.bucket_h, r.shard), []).append(r)
    assert len({s for _, _, s in streams}) > 1  # the split actually happened
    for key, members in streams.items():
        assert sorted(r.pos for r in members) == list(
            range(1, len(members) + 1)
        ), key
        by_batch = {}
        for r in members:
            by_batch.setdefault(r.batch_id, []).append(r)
        n_full, tail = divmod(len(members), 4)
        for b, brs in by_batch.items():
            if b < n_full:
                assert len(brs) == 4 and not any(r.is_partial for r in brs)
            else:
                assert len(brs) == tail and all(r.is_partial for r in brs)
