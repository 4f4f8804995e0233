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

import logging
import os

from pyspark.sql import DataFrame, SparkSession

logger = logging.getLogger(__name__)


def is_table_ref(src: str) -> bool:
    """True when ``src`` names a catalog table (``cat.db.tbl``), not a path.
    Paths contain a separator or a URI scheme; a bare single-segment name
    that exists on the local filesystem is a relative path (previously the
    only interpretation), not a table ref."""
    if "/" in src or "\\" in src or ":" in src:
        return False
    return not os.path.exists(src)


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
        except Exception as exc:
            # not an Iceberg table (temp view, hive table) — or a transient
            # catalog error: either way the fallback is a full distinct scan
            # over the data, which at design scale is exactly the cost this
            # path exists to avoid, so say so instead of degrading silently
            logger.warning(
                "corpus_partitions: %s.partitions metadata table unavailable "
                "(%s); falling back to a distinct scan over the data", src, exc
            )
    df = read_corpus(spark, src)
    return [
        int(r[col])
        for r in df.select(col).distinct().orderBy(col).collect()
    ]


# --------------------------------------------------------------------------
# Hadoop FileSystem access (driver-side, via the session's JVM).
#
# The checkpoint manifest must live NEXT TO the output — on a cluster that
# is HDFS or an object store, not the driver's local disk.  ``pathlib``
# would silently write `hdfs://nn/out/_manifest` under the driver's cwd;
# these helpers resolve the scheme through Hadoop's own FileSystem registry
# so the same orchestrator code runs against file:, hdfs://, s3a://, ...
# All calls are O(#partitions) driver-side metadata ops.
# --------------------------------------------------------------------------


def _hadoop_fs(spark: SparkSession, path: str):
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def fs_exists(spark: SparkSession, path: str) -> bool:
    fs, p = _hadoop_fs(spark, path)
    return bool(fs.exists(p))


def fs_write_text(spark: SparkSession, path: str, text: str) -> None:
    """Create-with-overwrite a small text file (parents auto-created).
    Object-store safe: one whole-file PUT, no append."""
    fs, p = _hadoop_fs(spark, path)
    out = fs.create(p, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def fs_read_text(spark: SparkSession, path: str) -> str:
    fs, p = _hadoop_fs(spark, path)
    stream = fs.open(p)
    try:
        jvm = spark._jvm
        reader = jvm.java.io.BufferedReader(
            jvm.java.io.InputStreamReader(stream, "UTF-8")
        )
        lines = []
        line = reader.readLine()
        while line is not None:
            lines.append(line)
            line = reader.readLine()
        return "\n".join(lines)
    finally:
        stream.close()


def fs_list_names(spark: SparkSession, dir_path: str) -> list[str]:
    """File names directly under ``dir_path`` ([] when it doesn't exist)."""
    fs, p = _hadoop_fs(spark, dir_path)
    if not fs.exists(p):
        return []
    return [st.getPath().getName() for st in fs.listStatus(p)]
