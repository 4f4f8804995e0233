from dataqualitycontroltool_spark.operators import (  # noqa: F401
    corpus,
    dedup,
    duplicates,
    export,
    hierarchy,
    multimodal,
    profiler,
    quantiles,
    similarity,
    textstats,
)
