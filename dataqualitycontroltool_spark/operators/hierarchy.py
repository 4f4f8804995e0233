"""Hierarchical consensus cascade — the reference's MRI object tree
(`MRIDicom` → `MRISequence` → `MRIStudy` → `MRIPatient`,
`/root/reference/mipqctool/model/mri/mrisequence.py:167-183` per-sequence
tag consensus, `mristudy.py:25-29` study date consensus,
`controller/dicomreport.py:322-386` dict-grouping) re-expressed as a chain
of hash aggregations: no object tree, no driver dicts — each level is ONE
DataFrame aggregating the level below it.

Plan shape per level: melt the value columns row-wise (explode of a
per-row struct array — cheap, no shuffle), count per (keys, column, value),
rank with a window partitioned by (keys, column), pivot back with a
conditional-max aggregate.  Two shuffles per level, both partial-aggregated
map-side; consensus ties are pinned to the smallest value (same rule as
profiler.group_mode / the oracle SQL).

Skew: a hot parent key (one patient with millions of rows) is reduced at
the (keys, column, value) aggregate first — the window then sees one row
per distinct value, not per input row."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def group_modes(df: DataFrame, keys: list[str], value_cols: list[str]) -> DataFrame:
    """Per-group modal value for SEVERAL columns in one pass:
    (keys..., <col> for each value col, n_rows).

    Values are carried as strings through the melt (struct arrays need a
    uniform type); callers cast back if needed."""
    melted = df.select(
        *keys,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("_col"), F.col(c).cast("string").alias("_val")
                    )
                    for c in value_cols
                ]
            )
        ).alias("_e"),
    ).select(*keys, F.col("_e._col").alias("_col"), F.col("_e._val").alias("_val"))

    counts = melted.groupBy(*keys, "_col", "_val").agg(F.count(F.lit(1)).alias("_n"))
    w = Window.partitionBy(*keys, "_col").orderBy(F.col("_n").desc(), F.col("_val").asc())
    ranked = counts.withColumn("_rk", F.row_number().over(w))

    # one final aggregate pivots the rank-1 rows back AND recovers the group
    # size from the counts themselves (every input row contributes exactly
    # one melted entry per value column, so Σ_n over one column = n_rows) —
    # no second scan of df, no join (measured: 5 exchanges → 3 per level)
    return ranked.groupBy(*keys).agg(
        *[
            F.max(
                F.when((F.col("_col") == c) & (F.col("_rk") == 1), F.col("_val"))
            ).alias(c)
            for c in value_cols
        ],
        F.sum(
            F.when(F.col("_col") == value_cols[0], F.col("_n")).otherwise(0)
        ).alias("n_rows"),
    )


def consensus_cascade(
    df: DataFrame, level_keys: list[str], value_cols: list[str]
) -> dict[int, DataFrame]:
    """Multi-level rollup: depth d groups by ``level_keys[:d]``.

    Returns {depth: DataFrame} for depth = len(level_keys) .. 1; each level
    is the consensus OF THE LEVEL BELOW (sequence tags → study consensus →
    patient consensus), exactly the reference's tree construction, with
    ``n_children`` counting the immediate children (the reference's
    sequences-per-patient style counts, `dicomreport.py:277-299`)."""
    out: dict[int, DataFrame] = {}
    cur = df
    for depth in range(len(level_keys), 0, -1):
        keys = level_keys[:depth]
        level = group_modes(cur, keys, value_cols).withColumnRenamed(
            "n_rows", "n_children"
        )
        out[depth] = level
        cur = level
    return out


def children_distribution(
    level_df: DataFrame, bucket_edges: list[int] | None = None
) -> DataFrame:
    """A12 (dicomreport.py:277-299): bucket parents by child count
    (default buckets s1 / s2 / s3-s5 / s6+)."""
    edges = bucket_edges or [1, 2, 5]
    c = F.col("n_children")
    bucket = (
        F.when(c == edges[0], f"s{edges[0]}")
        .when(c == edges[1], f"s{edges[1]}")
        .when(c <= edges[2], f"s{edges[1] + 1}-s{edges[2]}")
        .otherwise(f"s{edges[2] + 1}+")
    )
    return level_df.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_parents")
    )
