"""Aspect-ratio bucketing for image training batches.

Multi-resolution training (SDXL appendix I, NovelAI bucketing) groups images
into a finite set of (bucket_w, bucket_h) resolutions with ~constant pixel
area, assigning each image the bucket whose aspect ratio is closest in log
space; batches are then drawn within a bucket so every tensor in a batch has
one shape.  At 10^12 images the assignment must be a pure map — this
implementation is a single Catalyst projection (a literal bucket array, a
``transform`` computing per-bucket log-ratio distance, and ``array_min``
over the resulting structs), so it runs inside whole-stage codegen with no
shuffle, no UDF and no per-row Python.

Batch assembly reuses the deterministic shuffle-and-shard machinery
(operators/export.py): the sort key is the same md5 permutation, but the
partition key is (bucket, hash-shard) — two-level, because the bucket list
is tiny and bucket-only partitioning would sort each bucket's entire row
set in one task.  The in-stream position IS the batch index.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def standard_buckets(
    target_area: int = 1024 * 1024,
    step: int = 64,
    min_side: int = 512,
    max_side: int = 2048,
    max_ratio: float = 4.0,
) -> list[tuple[int, int]]:
    """The SDXL-style bucket list: widths in multiples of ``step`` whose
    height (area/width rounded to a multiple of ``step``) keeps ~constant
    area and an aspect ratio within [1/max_ratio, max_ratio].  Deterministic
    and engine-independent (pure integer arithmetic)."""
    out = []
    w = min_side
    while w <= max_side:
        h = max(min_side, min(max_side, round(target_area / w / step) * step))
        if 1.0 / max_ratio <= w / h <= max_ratio:
            out.append((w, h))
        w += step
    # dedupe while preserving ascending-width order (clamping can repeat)
    seen: set[tuple[int, int]] = set()
    uniq = [b for b in out if not (b in seen or seen.add(b))]
    return uniq


def bucket_expr(
    w: Column, h: Column, buckets: list[tuple[int, int]]
) -> Column:
    """struct(bucket_w, bucket_h) of the bucket with the nearest log aspect
    ratio (ties -> narrowest bucket, then shortest: struct min on
    (distance, bw, bh)).  NULL/non-positive dims yield NULL — the caller's
    validity rules own that drop decision."""
    from dataqualitycontroltool_spark.operators.dedup import let

    if not buckets:
        raise ValueError("buckets must be non-empty")
    lit = F.array(
        *[
            F.struct(F.lit(bw).alias("bw"), F.lit(bh).alias("bh"))
            for bw, bh in buckets
        ]
    )

    def pick(target: Column) -> Column:
        cand = F.transform(
            lit,
            lambda b: F.struct(
                # round the distance so float noise cannot flip a genuine tie
                F.round(
                    F.abs(target - F.log(b["bw"].cast("double") / b["bh"])), 9
                ).alias("d"),
                b["bw"].alias("bw"),
                b["bh"].alias("bh"),
            ),
        )
        # let-bind: CollapseProject would otherwise inline the whole
        # array_min(transform(...)) once per extracted field (2x the 25-log
        # scan per row — measured in the executed plan before the binding)
        return let(
            F.array_min(cand),
            lambda best: F.struct(
                best["bw"].alias("bucket_w"), best["bh"].alias("bucket_h")
            ),
        )

    valid = w.isNotNull() & h.isNotNull() & (w > 0) & (h > 0)
    return F.when(valid, let(F.log(w.cast("double") / h.cast("double")), pick))


def assign_aspect_buckets(
    df: DataFrame,
    w_col: str = "w",
    h_col: str = "h",
    buckets: list[tuple[int, int]] | None = None,
) -> DataFrame:
    """Adds ``bucket_w``, ``bucket_h`` and ``resize_scale`` (the minimal
    uniform scale that COVERS the bucket — the standard resize-then-
    center-crop recipe; >1 means upscaling).  Pure projection."""
    bs = buckets if buckets is not None else standard_buckets()
    b = bucket_expr(F.col(w_col), F.col(h_col), bs)
    return (
        df.withColumn("_b", b)
        .withColumns(
            {
                "bucket_w": F.col("_b.bucket_w"),
                "bucket_h": F.col("_b.bucket_h"),
                "resize_scale": F.round(
                    F.greatest(
                        F.col("_b.bucket_w") / F.col(w_col).cast("double"),
                        F.col("_b.bucket_h") / F.col(h_col).cast("double"),
                    ),
                    6,
                ),
            }
        )
        .drop("_b")
    )


def bucket_stats(df: DataFrame) -> DataFrame:
    """(bucket_w, bucket_h, n_images, mean_scale, n_upscaled) — ONE hash
    aggregate over the assignment projection; the planner's partial
    aggregation keeps the shuffle at |buckets| rows per task."""
    return (
        df.groupBy("bucket_w", "bucket_h")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.round(F.avg("resize_scale"), 6).alias("mean_scale"),
            F.sum((F.col("resize_scale") > 1.0).cast("bigint")).alias(
                "n_upscaled"
            ),
        )
    )


def bucket_batches(
    df: DataFrame,
    batch_size: int,
    id_col: str = "image_id",
    seed: str = "42",
    n_shards: int = 1,
) -> DataFrame:
    """Deterministic batch assembly within buckets: rows are ordered by the
    engine-replayable md5 permutation (same contract as
    operators/export.shard_table), positioned per (bucket, shard), and
    ``batch_id = (pos-1) // batch_size``.  The trailing partial batch of
    each stream is flagged ``is_partial`` so the loader can drop or pad it
    explicitly.

    Two-level partitioning defuses the bucket-skew bottleneck: the bucket
    list is tiny (~25), so partitioning the sort by bucket alone would
    funnel each bucket's ENTIRE row set — ~4·10^10 rows per bucket at the
    module's design scale — through one task.  ``n_shards`` splits every
    bucket into deterministic hash sub-streams (hash-prefix mod, the
    :func:`operators.export.shard_table` recipe); ``pos``/``batch_id`` are
    (bucket, shard)-local, every batch still has one tensor shape, and each
    data-loader rank consumes its own (bucket, shard) stream — the standard
    multi-rank loader contract.  Size ``n_shards`` so one stream's rows fit
    a task's sort-spill budget (the default 1 preserves a single global
    stream per bucket for small corpora).

    Rows with a NULL bucket (invalid dims) get NULL ``pos``/``batch_id``/
    ``is_partial``: the caller's validity rules own the drop decision, and
    batch assembly must not resurrect invalid rows into training batches.
    """
    from pyspark.sql import Window

    from dataqualitycontroltool_spark.operators.export import (
        _shuffle_key,
        reserve_columns,
    )

    if batch_size < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    reserve_columns(
        df,
        ["_h", "_pos", "_n", "shard", "pos", "batch_id", "is_partial"],
        "bucket_batches",
    )
    h = _shuffle_key(id_col, seed)
    shard = F.pmod(
        F.conv(F.substring(F.col("_h"), 1, 8), 16, 10).cast("bigint"),
        F.lit(n_shards),
    ).cast("int")
    keys = ["bucket_w", "bucket_h", "shard"]
    w = Window.partitionBy(*keys).orderBy("_h", id_col)
    n = Window.partitionBy(*keys)
    valid = F.col("bucket_w").isNotNull() & F.col("bucket_h").isNotNull()
    batch_of = lambda p: F.floor((p - 1) / F.lit(batch_size))  # noqa: E731
    return (
        df.withColumn("_h", h)
        .withColumn("shard", shard)
        .withColumn("_pos", F.row_number().over(w).cast("bigint"))
        .withColumn("_n", F.count(F.lit(1)).over(n))
        .withColumn("pos", F.when(valid, F.col("_pos")))
        .withColumn("batch_id", F.when(valid, batch_of(F.col("_pos"))))
        .withColumn(
            "is_partial",
            F.when(
                valid,
                (batch_of(F.col("_pos")) == batch_of(F.col("_n")))
                & (F.pmod(F.col("_n"), F.lit(batch_size)) != 0),
            ),
        )
        .drop("_h", "_n", "_pos")
    )
