"""Streaming validation & profiling — the engine's batch semantics lifted to
Structured Streaming.

The reference is batch-only (CSV files, `controller/tablereport.py`), so this
module is the "what the reference would need at 10^12 rows arriving
continuously" surface, built so that STREAM = BATCH semantically:

* the validation plan (plans/compiler.py) is a stateless projection — it
  applies to a streaming DataFrame unchanged (same Catalyst expressions,
  incrementalized for free);
* the per-column profiler accounting (A6: nulls / valid / dtype / constraint
  per field) becomes a watermarked event-time-windowed aggregation — Spark's
  incremental partial/final hash aggregate with late-data handling, instead
  of the reference's driver-side Counters;
* the graft keep/drop rule engine + scrub are also stateless projections, so
  the caption quality filter runs on a stream with zero changes to the rule
  code (`stream_quality_filter`).

Sinks go through ``foreachBatch``/``writeStream`` with a checkpoint location
— exactly-once per micro-batch, resumable; this is the streaming sibling of
the per-partition checkpoint manifest in graft/checkpoint.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dataqualitycontroltool_spark.plans.compiler import ValidationPlan
from dataqualitycontroltool_spark.specs import TableSpec


def validated_stream(stream_df: DataFrame, spec: TableSpec) -> DataFrame:
    """Apply the compiled validation plan to a streaming DataFrame.

    Stateless projection: Catalyst incrementalizes it with no state store —
    each micro-batch is validated exactly like a batch DataFrame would be
    (same expressions, same status buckets)."""
    return ValidationPlan(spec).apply(stream_df, derive=("status",))


def windowed_field_summary(
    stream_df: DataFrame,
    spec: TableSpec,
    time_col: str,
    window: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-event-time-window, per-field validation summary (streaming A6).

    Output: (window_start, window_end, field, nulls, valid, dtype_violations,
    constraint_violations, total_rows).  The aggregation is a standard
    watermarked windowed groupBy — partial aggregation per micro-batch,
    state bounded by the watermark, late rows folded in until the watermark
    passes.  This is the reference's per-column accounting
    (`controller/columnreport.py:439-464`) as an infinite incremental query."""
    # watermarks require TIMESTAMP (NTZ event-time columns are rejected);
    # set the watermark ONCE, after the per-field explode (redefining it is
    # disallowed since multiple stateful operators were enabled)
    stream_df = stream_df.withColumn(time_col, F.col(time_col).cast("timestamp"))
    out = validated_stream(stream_df, spec)
    win = F.window(F.col(time_col), window)
    per_field = []
    for f in spec.fields:
        st = F.col(f"{f.name}__status")
        per_field.append(
            F.struct(
                F.lit(f.name).alias("field"),
                (st == "missing").cast("int").alias("is_null"),
                (st == "valid").cast("int").alias("is_valid"),
                (st == "dtype").cast("int").alias("is_dtype"),
                (st == "constraint").cast("int").alias("is_constraint"),
            )
        )
    exploded = out.select(
        F.col(time_col), F.explode(F.array(*per_field)).alias("f")
    ).select(time_col, "f.*")
    return (
        exploded.withWatermark(time_col, watermark)
        .groupBy(win.alias("w"), F.col("field"))
        .agg(
            F.sum("is_null").alias("nulls"),
            F.sum("is_valid").alias("valid"),
            F.sum("is_dtype").alias("dtype_violations"),
            F.sum("is_constraint").alias("constraint_violations"),
            F.count(F.lit(1)).alias("total_rows"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "field", "nulls", "valid", "dtype_violations",
            "constraint_violations", "total_rows",
        )
    )


def stream_quality_filter(
    stream_df: DataFrame,
    cfg=None,
    dedupe_within: str | None = None,
    time_col: str = "ts",
    static_dedup: DataFrame | None = None,
) -> DataFrame:
    """The graft caption quality filter on a stream: identical rule/scrub/UDF
    code (pipeline.run_pipeline).  Exact-dup handling picks one of three
    streaming-legal semantics:

    * ``static_dedup`` — a PRECOMPUTED batch dedup index
      (``pipeline.dedup_index`` / ``hamming_dedup_index`` over the historical
      corpus).  The stream-static left join flags every arriving image whose
      key already belongs to a known duplicate group — the continuous-ingest
      design: new data is checked against the curated history.  The index is
      FIXED for the lifetime of the query: a parquet DataFrame's file listing
      is captured at creation, so refreshing the index means stopping the
      query and restarting it (same checkpoint — exactly-once resume makes
      the restart cheap) with a re-read index.  Batch-equivalent to
      ``run_pipeline(df, dedup=idx)``.
    * ``dedupe_within`` (e.g. "1 hour") — BOUNDED-STATE in-stream dedup:
      later arrivals with an already-seen ``cfg.dedupe_on`` key are DROPPED
      via ``dropDuplicatesWithinWatermark`` (state per key expires once the
      watermark passes the retention window — 'first arrival wins', since a
      stream can't retro-flag the keeper).  Requires a ``time_col``
      event-time column on the stream.
    * neither — no duplicates flagged; the checkpoint orchestrator reconciles
      dups per partition (graft/checkpoint.py's global-index semantics).
    """
    from dataqualitycontroltool_spark.graft.pipeline import run_pipeline
    from dataqualitycontroltool_spark.graft.rules import KeepDropConfig

    cfg = cfg or KeepDropConfig()
    if static_dedup is not None and dedupe_within:
        raise ValueError("static_dedup and dedupe_within are mutually exclusive")
    if (static_dedup is not None or dedupe_within) and not cfg.dedupe_on:
        # silently flagging zero duplicates after the caller handed us a
        # dedup index / retention window would discard their intent
        raise ValueError(
            "dedup requested but cfg.dedupe_on is empty — set the key column"
        )
    if static_dedup is not None:
        return run_pipeline(stream_df, cfg, dedup=static_dedup)
    if dedupe_within:
        stream_df = (
            stream_df.withColumn(time_col, F.col(time_col).cast("timestamp"))
            .withWatermark(time_col, dedupe_within)
            .dropDuplicatesWithinWatermark([cfg.dedupe_on])
        )
    cfg = type(cfg)(**{**cfg.__dict__, "dedupe_on": ""})
    return run_pipeline(stream_df, cfg)


def write_validated(
    validated: DataFrame,
    path: str,
    checkpoint: str,
    trigger_available_now: bool = True,
):
    """Parquet sink with checkpointing — exactly-once per micro-batch,
    resumable from ``checkpoint`` (streaming sibling of graft/checkpoint.py).
    Returns the StreamingQuery (caller awaits termination)."""
    w = validated.writeStream.format("parquet").option("path", path).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()
