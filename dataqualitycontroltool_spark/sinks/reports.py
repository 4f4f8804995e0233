"""Validation-report sinks — the reference's Excel/PDF report re-expressed
as metric-table DataFrames written to parquet, plus the corrected-CSV sink.

Reference sheets (`/root/reference/mipqctool/controller/tablereport.py:183-320`
``printexcel``: General, Row Statistics, Column Statistics, Cleaning
suggestions; `:151-159` ``save_corrected``): the *metrics* are the contract,
the spreadsheet rendering is presentation (out of scope per SURVEY §2.1 S7).
Every table is a small aggregate of the single-pass validated DataFrame —
compute once (`ValidationPlan.apply`), derive all four tables from it."""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import DataFrame, functions as F

from dataqualitycontroltool_spark.operators import profiler
from dataqualitycontroltool_spark.plans.compiler import ValidationPlan
from dataqualitycontroltool_spark.specs import TableSpec


def correction_suggestions(validated: DataFrame, spec: TableSpec) -> DataFrame:
    """'Cleaning suggestions' sheet: per field, each DISTINCT violated raw
    value with its suggested replacement and occurrence count
    (tablereport.py:290-320).  GroupBy on (field, value) — the distinct
    violated-value domain is small even when violations are many."""
    parts = []
    for f in spec.fields:
        name = f.name
        st, sug = F.col(f"{name}__status"), F.col(f"{name}__suggestion")
        parts.append(
            validated.where(st.isin("dtype", "constraint"))
            .groupBy(
                F.lit(name).alias("field"),
                # cast to string BEFORE the union: fields have heterogeneous
                # types and ANSI union resolution would otherwise coerce a
                # string field's values into a numeric sibling's type
                F.col(name).cast("string").alias("value"),
                sug.cast("string").alias("suggestion"),
                st.alias("violation"),
            )
            .agg(F.count(F.lit(1)).alias("n_occurrences"))
        )
    return reduce(DataFrame.unionByName, parts)


def report_tables(
    df: DataFrame, spec: TableSpec, cache: bool = True
) -> dict[str, DataFrame]:
    """The four report tables from ONE validation pass:

    * ``general``        — table-level totals (rows, columns, fields checked)
    * ``row_stats``      — rows-per-#valid-columns histogram + quantile
                           bucket bands (A7-A9)
    * ``column_stats``   — per-field nulls/valid/dtype/constraint/filled%
    * ``corrections``    — distinct violated values with suggestions

    With ``cache=True`` (default) the validated frame is persisted — all
    four tables aggregate it; the CALLER owns the cache lifecycle
    (unpersist / ``spark.catalog.clearCache()`` / session teardown — same
    contract as ``dedup.simhash_pairs``).  ``cache=False`` leaves no
    cached state and recomputes the validation scan per table.

    Spec fields absent from the table are NOT an error: like the
    reference (tablereport.py:207-208 'Missing columns'/'Extra columns'
    General rows over ``actual_headers``), validation runs on the header
    intersection and the set differences are reported in ``general``."""
    missing = [f.name for f in spec.fields if f.name not in df.columns]
    extra = [c for c in df.columns if c not in spec.field_names]
    if missing:
        spec = TableSpec(
            fields=tuple(f for f in spec.fields if f.name in df.columns),
            primary_key=spec.primary_key,
            missing_values=spec.missing_values,
        )
    if not spec.fields:
        # no spec field exists in the table: emit a valid (empty-bodied)
        # report rather than failing mid-aggregate
        spark = df.sparkSession
        return {
            "general": df.agg(
                F.count(F.lit(1)).alias("total_rows"),
                F.lit(len(df.columns)).alias("total_columns"),
                F.lit(0).alias("fields_checked"),
                F.lit(0).cast("long").alias("total_violations"),
                F.lit(",".join(missing)).alias("missing_columns"),
                F.lit(",".join(extra)).alias("extra_columns"),
            ),
            "row_stats": spark.createDataFrame(
                [], "key string, kind string, rows long"),
            "column_stats": spark.createDataFrame(
                [], "field string, nulls long, valid long, "
                    "dtype_violations long, constraint_violations long, "
                    "total_rows long, filled_pct double"),
            "corrections": spark.createDataFrame(
                [], "field string, value string, suggestion string, "
                    "violation string, n_occurrences long"),
        }

    plan = ValidationPlan(spec)
    validated = plan.apply(df, derive=("status", "suggestion"))
    if cache:
        validated = validated.cache()

    n_fields = len(spec.fields)
    general = validated.agg(
        F.count(F.lit(1)).alias("total_rows"),
        F.lit(len(df.columns)).alias("total_columns"),
        F.lit(n_fields).alias("fields_checked"),
        (
            reduce(
                add,
                [
                    F.sum((F.col(f"{f.name}__status") != "valid").cast("long"))
                    for f in spec.fields
                ],
            )
            if spec.fields
            else F.lit(0).cast("long")
        ).alias("total_violations"),
        F.lit(",".join(missing)).alias("missing_columns"),
        F.lit(",".join(extra)).alias("extra_columns"),
    )

    flags = plan.row_flags(validated)
    hist = profiler.rows_per_valid_count(flags).withColumnRenamed("n_rows", "rows")
    buckets = profiler.quantile_bucket_stats(flags, "n_valid", n_fields)
    row_stats = (
        hist.select(F.col("n_valid").cast("string").alias("key"),
                    F.lit("rows_per_valid_count").alias("kind"), "rows")
        .unionByName(
            buckets.select(F.col("bucket").alias("key"),
                           F.lit("valid_pct_band").alias("kind"),
                           F.col("n_rows").alias("rows"))
        )
    )

    column_stats = plan.summary(validated)
    corrections = correction_suggestions(validated, spec)
    return {
        "general": general,
        "row_stats": row_stats,
        "column_stats": column_stats,
        "corrections": corrections,
    }


def row_stats_sort_key(r: dict):
    """Deterministic display order for row_stats rows shared by the
    HTML/PDF/XLSX renderers: within a kind, numeric keys sort numerically
    (the rows-per-valid-count histogram must read 0,1,2,...,10 — not the
    lexicographic 0,1,10,11,2 once a schema has 10+ fields), text band
    labels after them lexically."""
    k = str(r["key"])
    return (r["kind"], (0, int(k)) if k.isdigit() else (1, k))


def write_report(
    df: DataFrame, spec: TableSpec, outdir: str, with_profiles: bool = True,
    threshold: float = 3.0, tables: dict[str, DataFrame] | None = None,
) -> None:
    """Write the four report tables (+ per-field MIPType profiles, the
    Excel report's Column Statistics detail) as parquet under
    ``outdir/<name>/``.  ``threshold`` is the outlier cut in standard
    deviations (reference ``--outlier``, cli.py:36-38); pass a
    precomputed ``tables`` dict to reuse one validation pass across
    several sinks."""
    for name, table in (tables or report_tables(df, spec)).items():
        table.write.mode("overwrite").parquet(f"{outdir}/{name}")
    if with_profiles:
        for fname, prof in profiler.profile_table(df, spec, threshold=threshold).items():
            prof.write.mode("overwrite").parquet(f"{outdir}/profile_{fname}")


def write_corrected_csv(df: DataFrame, spec: TableSpec, path: str) -> None:
    """S6 corrected-CSV sink (tablereport.py:151-159): violated values
    replaced by their suggestions (null when unsalvageable), written as
    quoted CSV with headers — the distributed sibling of ``save_corrected``."""
    plan = ValidationPlan(spec)
    corrected = plan.apply(df, derive=("corrected",))
    spec_names = {f.name for f in spec.fields}
    cols = [
        F.col(f"{c}__corrected").alias(c) if c in spec_names else F.col(c)
        for c in df.columns
    ]
    (
        corrected.select(*cols)
        .write.mode("overwrite")
        .option("header", "true")
        .option("quoteAll", "true")
        .csv(path)
    )


# ---------------------------------------------------------------------------
# S8 — HTML report sink
# ---------------------------------------------------------------------------

_HTML_TEMPLATE = """<!DOCTYPE html>
<html>
<head><meta charset="utf-8"><title>{{ dataset }} — QC report</title></head>
<body>
<h1>Quality Control Report</h1>
<p>Dataset: <b>{{ dataset }}</b>{% if source %} ({{ source }}){% endif %}</p>
{% if date_run %}<p>Run: <b>{{ date_run }}</b></p>{% endif %}
<p>Total rows: <b>{{ general.total_rows }}</b> —
   columns: <b>{{ general.total_columns }}</b> —
   fields checked: <b>{{ general.fields_checked }}</b> —
   total violations: <b>{{ general.total_violations }}</b></p>

<h2>Row statistics</h2>
<table border="1">
<tr><th>kind</th><th>key</th><th>rows</th><th>%</th></tr>
{% for r in row_stats %}
<tr><td>{{ r.kind }}</td><td>{{ r.key }}</td><td>{{ r.rows }}</td>
    <td>{{ r.pct }}</td></tr>
{% endfor %}
</table>

<h2>Column statistics</h2>
<table border="1">
<tr>{% for c in column_cols %}<th>{{ c }}</th>{% endfor %}</tr>
{% for r in column_stats %}
<tr>{% for c in column_cols %}<td>{{ r[c] }}</td>{% endfor %}</tr>
{% endfor %}
</table>

<h2>Cleaning suggestions</h2>
<table border="1">
<tr><th>field</th><th>value</th><th>suggestion</th><th>violation</th><th>n</th></tr>
{% for r in corrections %}
<tr><td>{{ r.field }}</td><td>{{ r.value }}</td><td>{{ r.suggestion }}</td>
    <td>{{ r.violation }}</td><td>{{ r.n_occurrences }}</td></tr>
{% endfor %}
</table>
</body>
</html>
"""


def render_html_report(
    tables: dict[str, DataFrame],
    dataset: str,
    source: str = "",
    date_run: str | None = None,
) -> str:
    """S8 (tablereport.py:161-181 printpdf → jinja2 render): the HTML
    report over the report tables — same section structure as the
    reference's dataset_report template (header/run info, row completeness
    and validation statistics with percentages, per-column statistics,
    cleaning suggestions), own markup.  PDF (weasyprint) stays out of
    scope per SURVEY §2.1 S8.

    Driver-side by design: the inputs are the already-aggregated metric
    tables (a handful of rows regardless of corpus size), so the collect
    here is O(fields), never O(rows).  ``date_run`` is injected by the
    caller (kept out of the default output so renders are deterministic
    and diffable)."""
    from jinja2 import Environment

    general = tables["general"].collect()[0].asDict()
    row_stats = sorted(
        (r.asDict() for r in tables["row_stats"].collect()),
        key=row_stats_sort_key,
    )
    # percentage precomputed with a zero-row fallback: an empty input table
    # must still render a report, not ZeroDivisionError inside Jinja
    total = general.get("total_rows") or 0
    for r in row_stats:
        r["pct"] = f"{100.0 * r['rows'] / total:.2f}" if total else "0.00"
    column_df = tables["column_stats"]
    column_stats = sorted(
        (r.asDict() for r in column_df.collect()),
        key=lambda r: str(r.get("field")),
    )
    corrections = sorted(
        (r.asDict() for r in tables["corrections"].collect()),
        key=lambda r: (r["field"], str(r["value"])),
    )
    env = Environment(autoescape=True)
    return env.from_string(_HTML_TEMPLATE).render(
        dataset=dataset,
        source=source,
        date_run=date_run,
        general=general,
        row_stats=row_stats,
        column_cols=column_df.columns,
        column_stats=column_stats,
        corrections=corrections,
    )


def write_html_report(
    df: DataFrame,
    spec: TableSpec,
    path: str,
    dataset: str,
    source: str = "",
    date_run: str | None = None,
    tables: dict[str, DataFrame] | None = None,
) -> None:
    """Validate + aggregate + render + write the HTML report to ``path``.
    Pass precomputed ``tables`` to reuse one validation pass."""
    html = render_html_report(tables or report_tables(df, spec),
                              dataset, source, date_run)
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(html)
