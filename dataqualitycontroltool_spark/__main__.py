"""``python -m dataqualitycontroltool_spark`` → the CLI (see cli.py)."""

import sys

from dataqualitycontroltool_spark.cli import main

sys.exit(main())
