"""Metrics repository: persist profile metrics per run and flag anomalies
against the run history (the deequ MetricsRepository / anomaly-detection
pattern).

The reference keeps only an in-session before/after pair (home.py:41-52);
a production DQ engine needs the longitudinal version: every scheduled run
appends its metrics, and today's run is judged against the distribution of
previous runs — "null rate on c_email is 4.2 σ above its 30-day history"
is the alert that matters, not any fixed threshold.

Scale shape: metric tables are tiny by construction (columns × metrics
rows per run), so the repository is an append-only parquet directory and
every comparison is an aggregate over (runs × columns × metrics) rows —
never over the data.  The heavy lifting happened in the fused profile
that produced the metrics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def metrics_from_profile(profile_df: DataFrame, run_id: str) -> DataFrame:
    """Convert a wide profile table (e.g. ``null_profile`` output with a
    ``column`` key) into the long (run_id, column, metric, value) form the
    repository stores — numeric fields only."""
    num_fields = [f.name for f in profile_df.schema.fields
                  if f.name != "column"
                  and f.dataType.typeName() in
                  ("byte", "short", "integer", "long", "float", "double",
                   "decimal")]
    structs = [F.struct(F.lit(m).alias("metric"),
                        F.col(m).cast("double").alias("value"))
               for m in num_fields]
    return (profile_df.select("column",
                              F.explode(F.array(*structs)).alias("s"))
            .select(F.lit(run_id).alias("run_id"), "column",
                    F.col("s.metric").alias("metric"),
                    F.col("s.value").alias("value")))


def save_metrics(metrics: DataFrame, path: str) -> None:
    """Append one run's long-form metrics to the repository directory."""
    metrics.write.mode("append").parquet(path)


def load_history(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)


def metric_anomalies(history: DataFrame, current_run: str,
                     z_threshold: float = 3.0,
                     min_history: int = 3) -> DataFrame:
    """Flag the current run's metrics that sit ``z_threshold`` sample
    standard deviations from their OWN history (all earlier runs for the
    same (column, metric)).

    Returns (column, metric, value, hist_mean, hist_std, z, is_anomaly);
    metrics with fewer than ``min_history`` prior runs or zero variance
    are reported with NULL z (not enough signal — never silently
    dropped, the absence of a baseline is itself a finding).  One
    aggregate + one broadcast join over metric tables.
    """
    cur = history.filter(F.col("run_id") == current_run)
    past = (history.filter(F.col("run_id") != current_run)
            .groupBy("column", "metric")
            .agg(F.count(F.lit(1)).alias("n_hist"),
                 F.avg("value").alias("hist_mean"),
                 F.stddev_samp("value").alias("hist_std")))
    z = F.when((F.col("n_hist") >= min_history)
               & (F.col("hist_std") > 0),
               F.round((F.col("value") - F.col("hist_mean"))
                       / F.col("hist_std"), 4))
    return (cur.join(F.broadcast(past), ["column", "metric"], "left")
            .withColumn("z", z)
            .withColumn("is_anomaly",
                        F.coalesce(F.abs(F.col("z")) > z_threshold,
                                   F.lit(False)))
            .select("column", "metric", "value",
                    F.round("hist_mean", 6).alias("hist_mean"),
                    F.round("hist_std", 6).alias("hist_std"), "z",
                    "is_anomaly"))
