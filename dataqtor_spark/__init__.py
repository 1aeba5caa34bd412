"""dataqtor_spark — a PySpark-native data-quality & data-prep analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference workbench baligoyem/dataqtor (profiling, rule-based data-quality
measurement, repair, enrichment, similarity), extended with the operators a
large-scale training-data pipeline needs (dedup families, ANN similarity
search, text analysis, multimodal column plumbing, streaming profiling).

Everything is declarative DataFrame API so Catalyst/Tungsten pick the
physical plan; Python UDFs appear only where Spark genuinely cannot express
the semantics (and then always Arrow-batched, never row-at-a-time).
"""

from dataqtor_spark.session import get_spark, ingest, with_row_id
from dataqtor_spark.workbench import Workbench

__all__ = ["get_spark", "ingest", "with_row_id", "Workbench"]
__version__ = "0.1.0"
