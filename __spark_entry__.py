"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship validation-summary query at sf0.001.
``queries()`` — one entry per implemented operator from SURVEY.md §2.
``oracle_sql()`` — DuckDB-equivalent ANSI SQL per query (correctness gate).

Column names and tie-breaks are pinned identically on both sides; float
aggregates are rounded to 6 decimals on both sides so engine-level ulp noise
cancels (SURVEY §7 risks 1-2).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, functions as F

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from dataqualitycontroltool_spark.operators import duplicates, profiler  # noqa: E402
from dataqualitycontroltool_spark.plans.compiler import ValidationPlan  # noqa: E402
from dataqualitycontroltool_spark.sources.tables import load_table  # noqa: E402
from dataqualitycontroltool_spark.specs import TableSpec  # noqa: E402

# ---------------------------------------------------------------------------
# shared rule spec for the `documents` table (string-path validation: the
# reference's CSV semantics — lang is a nominal with an enum that deliberately
# excludes 'zh', n_chars an integer range rule)
# ---------------------------------------------------------------------------

DOC_ENUM = ["en", "es", "de", "fr"]

DOCUMENTS_SPEC = TableSpec.from_descriptor(
    {
        "fields": [
            {"name": "lang", "type": "string", "MIPType": "nominal",
             "constraints": {"enum": DOC_ENUM}},
            {"name": "n_chars", "type": "integer", "MIPType": "integer",
             "constraints": {"minimum": 60, "maximum": 520}},
            {"name": "source", "type": "string", "MIPType": "text"},
        ],
        "missingValues": [""],
    }
)


def _documents_validated(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "documents")
    return ValidationPlan(DOCUMENTS_SPEC).apply(df, derive=("status",))


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def q_profile_numeric_quantity(spark, sf_dir):
    """A1 numerical profile (numerical.py:73-102) on lineitem.l_quantity."""
    return profiler.profile_numerical(load_table(spark, sf_dir, "lineitem"), "l_quantity")


def q_profile_numeric_extendedprice(spark, sf_dir):
    return profiler.profile_numerical(load_table(spark, sf_dir, "lineitem"), "l_extendedprice")


def q_profile_integer_psize(spark, sf_dir):
    """A2 integer profile (integer.py:106-125) on part.p_size."""
    return profiler.profile_integer(load_table(spark, sf_dir, "part"), "p_size")


def q_profile_nominal_returnflag(spark, sf_dir):
    """A4 nominal profile (nominal.py:15-31) on lineitem.l_returnflag."""
    return profiler.profile_nominal(load_table(spark, sf_dir, "lineitem"), "l_returnflag")


def q_profile_text_ptype(spark, sf_dir):
    """A5 text profile (text.py:62-78) on part.p_type."""
    return profiler.profile_text(load_table(spark, sf_dir, "part"), "p_type")


def q_validation_summary_documents(spark, sf_dir):
    """P1-P3 validation engine + A6 null/violation accounting on documents."""
    out = _documents_validated(spark, sf_dir)
    s = ValidationPlan(DOCUMENTS_SPEC).summary(out)
    return s.select(
        "field", "nulls", "valid", "dtype_violations", "constraint_violations",
        "total_rows", F.round("filled_pct", 6).alias("filled_pct"),
    )


def q_corrected_documents_lang(spark, sf_dir):
    """C4 Levenshtein nominal repair (nominal.py:34-59): corrected lang per doc."""
    df = load_table(spark, sf_dir, "documents")
    out = ValidationPlan(DOCUMENTS_SPEC).apply(df, derive=("corrected",), keep=["doc_id"])
    return out.select("doc_id", F.col("lang__corrected").alias("lang_corrected"))


def q_row_valid_histogram_documents(spark, sf_dir):
    """A7+A8 row-level valid-count histogram (tablereport.py:336-412)."""
    out = _documents_validated(spark, sf_dir)
    flags = ValidationPlan(DOCUMENTS_SPEC).row_flags(out)
    return profiler.rows_per_valid_count(flags).select("n_valid", "n_rows")


def q_duplicate_user_days(spark, sf_dir):
    """J2 duplicate-key detection on (user_id, day) of events."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("day")
    )
    return duplicates.duplicate_keys(ev, ["user_id", "day"])


def q_longitudinal_dup_orders(spark, sf_dir):
    """J3 longitudinal duplicates (tablereport.py:372-384) with keep=False:
    every order sharing (o_custkey, o_orderdate) with another order."""
    o = load_table(spark, sf_dir, "orders")
    return (
        duplicates.flag_duplicates(o, ["o_custkey", "o_orderdate"])
        .where("is_duplicate")
        .select("o_orderkey", "o_custkey")
    )


def q_group_mode_event_type(spark, sf_dir):
    """A10 per-group consensus (mrisequence.py:167-183): modal event_type per user."""
    ev = load_table(spark, sf_dir, "events")
    return profiler.group_mode(ev, ["user_id"], "event_type")


def q_outlier_rows_extendedprice(spark, sf_dir):
    """A1 outliersrows keyed by (orderkey, linenumber) instead of file position."""
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "line_id", F.concat_ws("-", "l_orderkey", "l_linenumber")
    )
    return profiler.outlier_rows(li, "l_extendedprice", "line_id")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full validation summary of the documents table at sf0.001."""
    return q_validation_summary_documents(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "profile_numeric_quantity": q_profile_numeric_quantity,
        "profile_numeric_extendedprice": q_profile_numeric_extendedprice,
        "profile_integer_psize": q_profile_integer_psize,
        "profile_nominal_returnflag": q_profile_nominal_returnflag,
        "profile_text_ptype": q_profile_text_ptype,
        "validation_summary_documents": q_validation_summary_documents,
        "corrected_documents_lang": q_corrected_documents_lang,
        "row_valid_histogram_documents": q_row_valid_histogram_documents,
        "duplicate_user_days": q_duplicate_user_days,
        "longitudinal_dup_orders": q_longitudinal_dup_orders,
        "group_mode_event_type": q_group_mode_event_type,
        "outlier_rows_extendedprice": q_outlier_rows_extendedprice,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

def _numeric_profile_sql(table: str, col: str, t: float = 3.0) -> str:
    return f"""
    WITH s AS (
      SELECT round(avg({col}), 6) AS mean,
             round(stddev_samp({col}), 6) AS std,
             min({col}) AS min, max({col}) AS max,
             round(quantile_cont({col}, 0.25), 6) AS q1,
             round(quantile_cont({col}, 0.5), 6) AS median,
             round(quantile_cont({col}, 0.75), 6) AS q3,
             round(avg({col}) + {t} * stddev_samp({col}), 6) AS upperbound,
             round(avg({col}) - {t} * stddev_samp({col}), 6) AS lowerbound
      FROM {table}
    )
    SELECT s.*, (SELECT count(*) FROM {table}, s
                 WHERE {col} >= s.upperbound OR {col} <= s.lowerbound) AS outliers
    FROM s
    """


_DOC_ENUM_SQL = "('en', 'es', 'de', 'fr')"
_LANG_STATUS = f"""
    CASE WHEN lang IS NULL OR lang = '' THEN 'missing'
         WHEN lang NOT IN {_DOC_ENUM_SQL} THEN 'constraint'
         ELSE 'valid' END
"""
_NCHARS_STATUS = """
    CASE WHEN n_chars IS NULL THEN 'missing'
         WHEN n_chars < 60 OR n_chars > 520 THEN 'constraint'
         ELSE 'valid' END
"""
_SOURCE_STATUS = """
    CASE WHEN source IS NULL OR source = '' THEN 'missing' ELSE 'valid' END
"""


def oracle_sql() -> dict[str, str]:
    return {
        "profile_numeric_quantity": _numeric_profile_sql("lineitem", "l_quantity"),
        "profile_numeric_extendedprice": _numeric_profile_sql("lineitem", "l_extendedprice"),
        "profile_integer_psize": """
            WITH m AS (
              SELECT p_size AS mode, count(*) AS freq FROM part
              GROUP BY p_size ORDER BY freq DESC, mode ASC LIMIT 1
            )
            SELECT m.mode, m.freq,
                   (SELECT min(p_size) FROM part) AS min,
                   (SELECT max(p_size) FROM part) AS max,
                   CAST(trunc((SELECT quantile_cont(p_size, 0.25) FROM part)) AS BIGINT) AS q1,
                   CAST(trunc((SELECT quantile_cont(p_size, 0.5) FROM part)) AS BIGINT) AS median,
                   CAST(trunc((SELECT quantile_cont(p_size, 0.75) FROM part)) AS BIGINT) AS q3
            FROM m
        """,
        "profile_nominal_returnflag": """
            WITH m AS (
              SELECT l_returnflag AS top, count(*) AS freq FROM lineitem
              WHERE l_returnflag IS NOT NULL
              GROUP BY l_returnflag ORDER BY freq DESC, top ASC LIMIT 1
            )
            SELECT m.top, m.freq,
                   (SELECT string_agg(DISTINCT l_returnflag, ',' ORDER BY l_returnflag)
                    FROM lineitem WHERE l_returnflag IS NOT NULL) AS categories,
                   (SELECT count(DISTINCT l_returnflag) FROM lineitem
                    WHERE l_returnflag IS NOT NULL) AS categories_num
            FROM m
        """,
        "profile_text_ptype": """
            WITH c AS (SELECT p_type AS v, count(*) AS cnt FROM part
                       WHERE p_type IS NOT NULL GROUP BY p_type),
            m AS (SELECT v AS top, cnt AS freq FROM c ORDER BY cnt DESC, v ASC LIMIT 1),
            t5 AS (SELECT string_agg(v, ',' ORDER BY rn) AS top5 FROM
                   (SELECT v, row_number() OVER (ORDER BY cnt DESC, v ASC) rn FROM c) x
                   WHERE rn <= 5),
            b5 AS (SELECT string_agg(v, ',' ORDER BY rn) AS bottom5 FROM
                   (SELECT v, row_number() OVER (ORDER BY cnt ASC, v ASC) rn FROM c) x
                   WHERE rn <= 5)
            SELECT (SELECT count(DISTINCT p_type) FROM part) AS unique,
                   m.top, m.freq, t5.top5, b5.bottom5
            FROM m, t5, b5
        """,
        "validation_summary_documents": f"""
            WITH st AS (
              SELECT {_LANG_STATUS} AS lang_st, {_NCHARS_STATUS} AS nchars_st,
                     {_SOURCE_STATUS} AS source_st
              FROM documents
            ), u AS (
              SELECT 'lang' AS field, lang_st AS st FROM st
              UNION ALL SELECT 'n_chars', nchars_st FROM st
              UNION ALL SELECT 'source', source_st FROM st
            )
            SELECT field,
                   sum(CASE WHEN st = 'missing' THEN 1 ELSE 0 END) AS nulls,
                   sum(CASE WHEN st = 'valid' THEN 1 ELSE 0 END) AS valid,
                   sum(CASE WHEN st = 'dtype' THEN 1 ELSE 0 END) AS dtype_violations,
                   sum(CASE WHEN st = 'constraint' THEN 1 ELSE 0 END) AS constraint_violations,
                   count(*) AS total_rows,
                   round((count(*) - sum(CASE WHEN st = 'missing' THEN 1 ELSE 0 END))
                         * 100.0 / count(*), 6) AS filled_pct
            FROM u GROUP BY field
        """,
        "corrected_documents_lang": f"""
            SELECT doc_id,
                   CASE
                     WHEN lang IS NULL OR lang = '' THEN NULL
                     WHEN lang IN {_DOC_ENUM_SQL} THEN lang
                     WHEN regexp_full_match(lang, '[0-9]+') THEN NULL
                     ELSE (
                       SELECT CASE WHEN levenshtein(upper(lang), upper(e.v)) <= 3
                                   THEN e.v END
                       FROM (SELECT unnest(['en', 'es', 'de', 'fr']) AS v) e
                       ORDER BY levenshtein(upper(lang), upper(e.v)), upper(e.v)
                       LIMIT 1
                     )
                   END AS lang_corrected
            FROM documents
        """,
        "row_valid_histogram_documents": f"""
            WITH st AS (
              SELECT {_LANG_STATUS} AS lang_st, {_NCHARS_STATUS} AS nchars_st,
                     {_SOURCE_STATUS} AS source_st
              FROM documents
            )
            SELECT (CASE WHEN lang_st = 'valid' THEN 1 ELSE 0 END
                    + CASE WHEN nchars_st = 'valid' THEN 1 ELSE 0 END
                    + CASE WHEN source_st = 'valid' THEN 1 ELSE 0 END) AS n_valid,
                   count(*) AS n_rows
            FROM st GROUP BY 1
        """,
        "duplicate_user_days": """
            SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n_dups
            FROM events GROUP BY 1, 2 HAVING count(*) > 1
        """,
        "longitudinal_dup_orders": """
            SELECT o_orderkey, o_custkey FROM (
              SELECT o_orderkey, o_custkey,
                     count(*) OVER (PARTITION BY o_custkey, o_orderdate) AS n
              FROM orders
            ) WHERE n > 1
        """,
        "group_mode_event_type": """
            SELECT user_id, event_type AS consensus, cnt AS freq FROM (
              SELECT user_id, event_type, count(*) AS cnt,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY count(*) DESC, event_type ASC) AS rk
              FROM events GROUP BY user_id, event_type
            ) WHERE rk = 1
        """,
        "outlier_rows_extendedprice": """
            WITH b AS (
              SELECT avg(l_extendedprice) + 3 * stddev_samp(l_extendedprice) AS hi,
                     avg(l_extendedprice) - 3 * stddev_samp(l_extendedprice) AS lo
              FROM lineitem
            )
            SELECT concat(l_orderkey, '-', l_linenumber) AS line_id, l_extendedprice
            FROM lineitem, b
            WHERE l_extendedprice >= b.hi OR l_extendedprice <= b.lo
        """,
    }
