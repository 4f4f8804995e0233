"""Corpus IO seam: parquet path OR catalog (Iceberg) table, transparently.

north_rule runs the pipeline "over Iceberg tables of image + caption pairs".
This sandbox has no Iceberg runtime jars, so the repo's tables are parquet
directories partitioned by ``part`` (the documented stand-in).  This module
is the seam that makes the SAME orchestrator code run against a real Iceberg
catalog table on a cluster:

* ``read_corpus(spark, src)`` — ``spark.table(src)`` for a catalog ref
  (``cat.db.tbl`` — no path separators or URI scheme), ``spark.read.parquet``
  otherwise.  Partition-pruning filters (``part = N``) push down in both
  cases (Iceberg prunes from snapshot metadata; parquet from hive-style
  directory layout).
* ``corpus_partitions(spark, src)`` — the distinct ``part`` values.  For a
  catalog ref it first tries the Iceberg ``<tbl>.partitions`` metadata table
  (no data-file scan — at 10^12 rows a distinct over the data is a full
  scan; the metadata table is O(#partitions)), falling back to a distinct
  scan for non-Iceberg catalog tables (e.g. temp views in tests).

Output stays a parquet directory + ``_manifest.jsonl``: the manifest is the
resume protocol's source of truth and must be listable/appendable without a
catalog; on a cluster the filtered output can be re-registered or
``writeTo``-appended to a table downstream of the manifest commit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def is_table_ref(src: str) -> bool:
    """True when ``src`` names a catalog table (``cat.db.tbl``), not a path.
    Paths contain a separator or a URI scheme; table refs never do."""
    return "/" not in src and "\\" not in src and ":" not in src


def read_corpus(spark: SparkSession, src: str) -> DataFrame:
    """Load the corpus from a parquet path or a catalog table ref."""
    if is_table_ref(src):
        return spark.table(src)
    return spark.read.parquet(src)


def corpus_partitions(spark: SparkSession, src: str, col: str = "part") -> list[int]:
    """Distinct partition values, cheapest available way (see module doc)."""
    if is_table_ref(src):
        try:
            # Iceberg metadata table: partition spec values without a data scan
            rows = (
                spark.table(f"{src}.partitions")
                .select(f"partition.{col}")
                .collect()
            )
            return sorted(int(r[col]) for r in rows)
        except Exception:
            pass  # not an Iceberg table (temp view, hive table): fall back
    df = read_corpus(spark, src)
    return [
        int(r[col])
        for r in df.select(col).distinct().orderBy(col).collect()
    ]
