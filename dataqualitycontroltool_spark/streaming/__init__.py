"""Structured Streaming surface of the engine."""

from dataqualitycontroltool_spark.streaming.sessionize import (  # noqa: F401
    sessionize_batch,
    sessionize_stream,
)
from dataqualitycontroltool_spark.streaming.validate import (  # noqa: F401
    stream_quality_filter,
    validated_stream,
    windowed_field_summary,
    write_validated,
)
