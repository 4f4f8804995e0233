"""PySpark-native analytics engine with the query and data-processing
capabilities of the MIP Data Quality Control Tool (aueb-wim/DataQualityControlTool).

Brand-new Spark-first design: the reference's per-value Python validation loops
become compiled Catalyst ``Column`` expressions; its per-column profilers become
single-pass ``groupBy``/``agg`` plans; its ``multiprocessing.Pool`` becomes Spark
tasks.  See SURVEY.md for the full operator inventory and reference citations.
"""

__version__ = "0.1.0"

from dataqualitycontroltool_spark.specs import FieldSpec, TableSpec  # noqa: F401
from dataqualitycontroltool_spark.plans.compiler import ValidationPlan  # noqa: F401
