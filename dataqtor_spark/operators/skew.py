"""Skew-safe aggregation helpers.

Partial (map-side) aggregation already handles skewed keys for algebraic
aggregates (count/sum/min/max) — pre-aggregated partials are tiny whatever
the key distribution.  The aggregates that DON'T reduce map-side are the
collection-valued ones (``collect_list``/``collect_set``): every value of a
hot key lands in one reducer.  These helpers split such aggregations into
two phases through a salt derived from the *value* (deterministic, so
results are reproducible): phase 1 shuffles on (key, salt) — at most
``n_salt`` partials per key — and phase 2 merges the per-salt partials,
which is O(n_salt) rows per key however hot the key is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _salt(val_col: str, n_salt: int):
    return F.pmod(F.xxhash64(F.col(val_col)), F.lit(n_salt))


def salted_collect_set(df: DataFrame, key_col: str, val_col: str,
                       n_salt: int = 16, sort: bool = True) -> DataFrame:
    """(key, values array) with the gather split across ``n_salt`` reducers
    per key.  ``sort`` orders the merged array for deterministic output."""
    phase1 = (df.groupBy(key_col, _salt(val_col, n_salt).alias("__salt"))
              .agg(F.collect_set(F.col(val_col)).alias("__part")))
    merged = (phase1.groupBy(key_col)
              .agg(F.array_distinct(F.flatten(F.collect_list("__part")))
                   .alias("values")))
    if sort:
        merged = merged.withColumn("values", F.array_sort("values"))
    return merged


def salted_count_distinct(df: DataFrame, key_col: str, val_col: str,
                          n_salt: int = 16) -> DataFrame:
    """(key, n_distinct) — phase 1 counts distinct within (key, salt)
    buckets (map-side combinable after the pre-distinct), phase 2 sums the
    disjoint per-salt counts.  Values hash to exactly one salt, so the
    per-salt distinct sets are disjoint and the sum is exact."""
    phase1 = (df.select(key_col, val_col)
              .distinct()
              .groupBy(key_col, _salt(val_col, n_salt).alias("__salt"))
              .agg(F.count(F.lit(1)).alias("__n")))
    return (phase1.groupBy(key_col)
            .agg(F.sum("__n").alias("n_distinct")))
