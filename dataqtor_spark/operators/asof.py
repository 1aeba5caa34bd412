"""As-of join: for each left row, the latest right row with
``right.ts <= left.ts`` within the same key (the time-series join Spark
has no built-in for; reference has no joins at all — this is a north-star
extension, with DuckDB's native ASOF JOIN as the oracle).

Implementation is the union + carry-forward trick, NOT a range cross-join:
tag both sides, union, then one window per key ordered by (ts, side) where
right rows sort before left rows at equal timestamps (<= semantics);
``last(value, ignorenulls=True)`` carries the most recent right values
forward onto each left row.

Scale shape: both inputs shuffle ONCE on the key, the window is a
per-key sort-merge — no inequality cross-join, no per-row search.  State
per key during the sort is bounded by that key's rows, and AQE skew
handling covers hot keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(left: DataFrame, right: DataFrame, key: str, ts: str,
              value_cols: list[str], suffix: str = "_right") -> DataFrame:
    """Left as-of join.  ``value_cols`` are carried from the right side
    (renamed with ``suffix``); unmatched left rows keep NULLs.

    Right side should be unique per (key, ts) — dedupe upstream if not
    (ties at equal ts would otherwise resolve by input order).
    """
    l = left.withColumn("__side", F.lit(1))
    for c in value_cols:
        l = l.withColumn(f"{c}{suffix}", F.lit(None).cast(right.schema[c].dataType))
    r = right.select(
        F.col(key), F.col(ts), F.lit(0).alias("__side"),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols])
    lcols = [c for c in l.columns if c not in ("__side",)]
    r_full = r
    for c in lcols:
        if c not in r.columns:
            r_full = r_full.withColumn(c, F.lit(None).cast(l.schema[c].dataType))
    u = l.select(*lcols, "__side").unionByName(r_full.select(*lcols, "__side"))

    w = (Window.partitionBy(key).orderBy(F.col(ts).asc(), F.col("__side").asc())
         .rowsBetween(Window.unboundedPreceding, 0))
    carried = u
    for c in value_cols:
        carried = carried.withColumn(
            f"{c}{suffix}", F.last(F.col(f"{c}{suffix}"), ignorenulls=True).over(w))
    return (carried.filter(F.col("__side") == 1)
            .drop("__side"))
