"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (fused per-column null profile +
DQ-score shape over `customer`, SURVEY.md §7 step 1).  ``queries()`` exposes
one callable per implemented operator from SURVEY.md §2; ``oracle_sql()``
gives the DuckDB-equivalent SQL for each.  Column names and value rounding
are aligned on both sides so the driver's order-insensitive value hash
matches: double aggregates are either derived from exact DECIMAL sums or
rounded to a fixed scale in BOTH dialects.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dataqtor_spark.queries import QUERIES, ORACLES, flagship


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
