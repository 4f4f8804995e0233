"""Mapping expression language — §2.7 scalar function surface."""

from dataqualitycontroltool_spark.functions.mapping_expr import (  # noqa: F401
    ExpressionError,
    FUNCTIONS,
    compile_expression,
    recode,
)
