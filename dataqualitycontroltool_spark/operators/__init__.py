from dataqualitycontroltool_spark.operators import profiler, duplicates  # noqa: F401
