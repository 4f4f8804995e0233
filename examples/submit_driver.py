#!/usr/bin/env python
"""spark-submit entry point for cluster runs.

    ZIP=$(python -m dataqualitycontroltool_spark pyfiles)
    spark-submit --master yarn --deploy-mode cluster \
        --conf spark.task.cpus=2 \
        --py-files "$ZIP" examples/submit_driver.py filter s3://bucket/in s3://bucket/out

The session factory detects the externally configured master (cpus=None) and
only applies engine-level confs (AQE, Arrow, shuffle sizing)."""

import sys

from dataqualitycontroltool_spark.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
