"""Parquet table sources for the driver-generated testdata star schema.

Reference scans are CSV-only (``qctable.py:20-23``); this engine's primary
source is columnar parquet/Iceberg — column pruning and predicate pushdown
reach the scan via Catalyst.  CSV remains supported through
``spark.read.option("header", True).csv`` for reference-fixture parity tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    for n, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(n)
