"""Duplicate / uniqueness operators (reference §2.6 J2/J3).

The reference detects primary-key and unique-field duplicates with a running
Python set cache (``controller/tableprofiler.py:173-182, 251-275``) and
longitudinal (subjectid, visitid) duplicates via ``pd.duplicated(keep=False)``
(``controller/tablereport.py:372-384``).  Both are hash aggregations /
windows in Spark — partial map-side combine, AQE-coalesced shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def duplicate_keys(df: DataFrame, keys: list[str]) -> DataFrame:
    """J2: key tuples that occur more than once → (keys..., n_dups).
    groupBy + filter beats a window when only the offending keys are needed
    (smaller shuffle output, no per-row flag materialization)."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_dups"))
        .where(F.col("n_dups") > 1)
    )


def flag_duplicates(df: DataFrame, keys: list[str], flag_col: str = "is_duplicate") -> DataFrame:
    """J3: per-row duplicate flag with keep=False semantics (every member of a
    duplicate group is flagged, tablereport.py:372-384)."""
    w = Window.partitionBy(*keys)
    return df.withColumn(flag_col, F.count(F.lit(1)).over(w) > 1)


def missing_required(df: DataFrame, required_cols: list[str], missing_values: list[str] | None = None) -> DataFrame:
    """Tableprofiler's missing-PK / missing-required row detection
    (tableprofiler.py:184-199): rows where any required column is null or a
    missing-value token."""
    mv = missing_values if missing_values is not None else [""]
    cond = F.lit(False)
    for c in required_cols:
        col_cond = F.col(c).isNull()
        if mv and dict(df.dtypes).get(c) == "string":
            col_cond = col_cond | F.col(c).isin(*mv)
        cond = cond | col_cond
    return df.where(cond)


def exact_dedupe(df: DataFrame, keys: list[str], order_by: list | None = None) -> DataFrame:
    """Exact deduplication keeping one deterministic representative per key
    (graft: `image_id` PK dedupe).  With ``order_by`` the smallest wins;
    without, an arbitrary-but-single row via dropDuplicates (cheaper: partial
    dedupe map-side before the shuffle)."""
    if not order_by:
        return df.dropDuplicates(keys)
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("_rk", F.row_number().over(w)).where(F.col("_rk") == 1).drop("_rk")
    )
