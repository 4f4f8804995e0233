"""Training-data export: deterministic shuffle-and-shard materialization.

The last stage of a curation pipeline at 10^12-row scale: the kept corpus
must be written as N balanced shards in GLOBAL pseudo-random order (training
readers stream shards sequentially, so any correlation between storage
order and crawl time / source / language leaks curriculum into training).
The reference tool ends at reports; this operator is part of the
LLM-pipeline extension surface (SURVEY §2, D-series).

Design — Spark-first, engine-replayable, resumable:

* **No RNG state.**  The permutation key is ``md5(id | seed)`` — the same
  deterministic-hash contract as :func:`corpus.sample_keep_expr`: re-running
  a resumed export reproduces the identical order, and any engine with md5
  can replay the assignment (fixed-length lowercase hex compares
  lexicographically == numerically).
* **Shard = hash prefix mod N.**  Uniform in expectation (binomial row
  counts, ±3σ ≈ ±3·sqrt(rows/N)); no range-partition sampling pass, no
  skew — the key is a cryptographic hash.
* **No global sort.**  A total order would force a single range-partitioned
  sort of the whole corpus.  Training order only needs to be random WITHIN
  the reader's stream, so we shuffle once on ``shard`` (N partitions) and
  sort WITHIN each shard — Spark's ``repartition + sortWithinPartitions``
  / window ``row_number`` shape, embarrassingly parallel across shards.
  Size ``n_shards`` so one shard's rows fit an executor's spill budget
  (rows/N per task; the sort spills gracefully beyond memory).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _shuffle_key(id_col: str, seed: str) -> "F.Column":
    return F.md5(F.concat(F.col(id_col).cast("string"), F.lit("|" + seed)))


def reserve_columns(df: DataFrame, names: list[str], op: str) -> None:
    """Raise when the caller's frame already carries a column this operator
    creates (internal temp or output): ``withColumn`` would silently
    overwrite it and the temps would then be DROPPED on exit, destroying
    caller data (ADVICE r3).  Shared by every shuffle-key operator."""
    clash = [c for c in names if c in df.columns]
    if clash:
        raise ValueError(
            f"{op}: input already has column(s) {clash} — these names are "
            "reserved by the operator (rename or drop them first)"
        )


def shard_table(
    df: DataFrame, id_col: str, n_shards: int, seed: str = "42"
) -> DataFrame:
    """Assign every row a ``shard`` (0..n_shards-1) and a ``pos`` (1-based
    position in the shard's deterministic pseudo-random order).

    One shuffle (hash on ``shard``) + one per-shard sort; the id column must
    be unique for the order to be total (ties broken by id after the hash).
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    reserve_columns(df, ["_h", "shard", "pos"], "shard_table")
    h = _shuffle_key(id_col, seed)
    shard = F.pmod(
        F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint"), F.lit(n_shards)
    ).cast("int")
    w = Window.partitionBy("shard").orderBy("_h", id_col)
    return (
        df.withColumn("_h", h)
        .withColumn("shard", shard)
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .drop("_h")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    seq_tokens: int,
    n_shards: int,
    seed: str = "42",
) -> DataFrame:
    """Concat-and-chop sequence packing: lay documents head-to-tail in the
    deterministic shuffle order of :func:`shard_table` and chop the token
    stream into fixed windows of ``seq_tokens`` — the GPT-style packing that
    turns a curated corpus into training sequences with no padding waste.

    Adds per document:

    * ``shard``, ``pos`` — as :func:`shard_table`;
    * ``token_offset`` — tokens strictly before this document in its shard's
      stream (running sum);
    * ``seq_id`` — index of the training sequence where the document STARTS
      (``token_offset // seq_tokens``);
    * ``seq_offset`` — position within that sequence;
    * ``seq_span`` — how many sequences the document touches (a document
      longer than the window is chopped across several).

    ONE exchange + ONE per-shard sort: ``pos`` and the running token sum
    use the same partitioning and ordering, so the plan shuffles and sorts
    once and both window functions stream over that single sorted run —
    packing costs one in-memory pass beyond the shard assignment itself,
    no extra exchange.  Boundary documents are split at read time
    by the consumer (offsets are exact); re-running reproduces identical
    packing (no RNG state), which keeps a resumed export byte-stable.
    """
    if seq_tokens < 1:
        raise ValueError(f"seq_tokens must be >= 1, got {seq_tokens}")
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    reserve_columns(
        df,
        ["_h", "shard", "pos", "token_offset", "seq_id", "seq_offset",
         "seq_span"],
        "pack_sequences",
    )
    h = _shuffle_key(id_col, seed)
    shard = F.pmod(
        F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint"), F.lit(n_shards)
    ).cast("int")
    w = Window.partitionBy("shard").orderBy("_h", id_col)
    tokens = F.coalesce(F.col(token_col).cast("bigint"), F.lit(0))
    cum = F.sum(tokens).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("_h", h)
        .withColumn("shard", shard)
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .withColumn("token_offset", cum - tokens)
        .withColumn(
            "seq_id", F.floor(F.col("token_offset") / F.lit(seq_tokens))
        )
        .withColumn(
            "seq_offset", F.pmod(F.col("token_offset"), F.lit(seq_tokens))
        )
        .withColumn(
            "seq_span",
            F.when(tokens <= 0, F.lit(0)).otherwise(
                F.floor(
                    (F.col("token_offset") + tokens - 1) / F.lit(seq_tokens)
                )
                - F.col("seq_id")
                + 1
            ).cast("int"),
        )
        .drop("_h")
    )


def write_shards(
    df: DataFrame,
    out_path: str,
    id_col: str,
    n_shards: int,
    seed: str = "42",
    token_col: str | None = None,
) -> DataFrame:
    """Materialize ``df`` as ``out_path/shard=K/`` parquet directories in
    deterministic pseudo-random order, plus a ``_shards_manifest`` parquet
    (one row per shard: rows, optional token sum) for reader bookkeeping
    and lineage.  Returns the manifest DataFrame (already written).

    The data write is ONE job with ONE exchange: the window inside
    :func:`shard_table` already hash-shuffles on ``shard`` and sorts each
    task by ``(shard, _h, id)`` — which IS ``(shard, pos)`` — so every task
    holds whole shards in final order and the ``partitionBy`` write emits
    one sorted file per shard with no extra repartition.  No driver loop
    over shards, no global sort.  The manifest is a second tiny aggregate
    job over the written output (reading back what was committed, not what
    was planned).
    """
    sharded = shard_table(df, id_col, n_shards, seed)
    sharded.write.mode("overwrite").partitionBy("shard").parquet(out_path)
    written = df.sparkSession.read.parquet(out_path)
    aggs = [F.count(F.lit(1)).alias("rows")]
    if token_col is not None:
        aggs.append(F.sum(F.col(token_col).cast("bigint")).alias("tokens"))
    manifest = written.groupBy("shard").agg(*aggs).orderBy("shard")
    manifest.coalesce(1).write.mode("overwrite").parquet(
        out_path.rstrip("/") + "/_shards_manifest"
    )
    return df.sparkSession.read.parquet(out_path.rstrip("/") + "/_shards_manifest")
