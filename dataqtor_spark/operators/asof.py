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
              value_cols: list[str], suffix: str = "_right",
              tolerance_seconds: float | None = None) -> DataFrame:
    """Left as-of join.  ``value_cols`` are carried from the right side
    (renamed with ``suffix``); unmatched left rows keep NULLs.

    ``tolerance_seconds`` bounds the match age (pandas ``merge_asof``
    tolerance): a carried value older than the bound reverts to NULL.
    The matched right timestamp rides along in the same carry-forward
    window, so the bound costs one comparison per row — no extra join.

    Right side should be unique per (key, ts) — dedupe upstream if not
    (ties at equal ts would otherwise resolve by input order).
    """
    carry = {c: f"{c}{suffix}" for c in value_cols}
    if tolerance_seconds is not None:
        # the matched right ts is just one more carried value
        carry[ts] = f"__asof{suffix}"
        right = right.withColumn(f"__asof{suffix}", F.col(ts))
    l = left.withColumn("__side", F.lit(1))
    for c, out in carry.items():
        src = c if c in right.columns else out
        l = l.withColumn(out, F.lit(None).cast(right.schema[src].dataType))
    r = right.select(
        F.col(key), F.col(ts), F.lit(0).alias("__side"),
        *[F.col(c if c != ts else out).alias(out) for c, out in carry.items()])
    lcols = [c for c in l.columns if c not in ("__side",)]
    r_full = r
    for c in lcols:
        if c not in r.columns:
            r_full = r_full.withColumn(c, F.lit(None).cast(l.schema[c].dataType))
    u = l.select(*lcols, "__side").unionByName(r_full.select(*lcols, "__side"))

    w = (Window.partitionBy(key).orderBy(F.col(ts).asc(), F.col("__side").asc())
         .rowsBetween(Window.unboundedPreceding, 0))
    carried = u
    for out in carry.values():
        carried = carried.withColumn(
            out, F.last(F.col(out), ignorenulls=True).over(w))
    out_df = carried.filter(F.col("__side") == 1).drop("__side")
    if tolerance_seconds is not None:
        age_ok = (F.col(ts).cast("double")
                  - F.col(f"__asof{suffix}").cast("double")
                  <= F.lit(float(tolerance_seconds)))
        for c in value_cols:
            out_df = out_df.withColumn(
                f"{c}{suffix}",
                F.when(age_ok, F.col(f"{c}{suffix}")))
        out_df = out_df.drop(f"__asof{suffix}")
    return out_df
