"""Report + corrected-data sinks."""

from dataqualitycontroltool_spark.sinks.reports import (  # noqa: F401
    correction_suggestions,
    report_tables,
    write_corrected_csv,
    write_report,
)
