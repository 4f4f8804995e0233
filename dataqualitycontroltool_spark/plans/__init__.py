from dataqualitycontroltool_spark.plans.compiler import FieldPlan, ValidationPlan  # noqa: F401
