"""Range (interval-containment) join: match each point row to the
interval rows that contain it, per key — another join Spark has no
built-in operator for (a naive formulation plans as
BroadcastNestedLoopJoin or a full cross product).

Implementation: bucketize time.  Each interval explodes into the
fixed-width buckets it covers; points compute their single bucket; an
EQUI-join on (key, bucket) produces candidates and an exact containment
filter finishes.  Cost is |intervals| × avg-buckets-per-interval +
one hash join — both sides shuffle once, no inequality join anywhere.

Bucket width tunes the trade: wider buckets → fewer exploded rows but
more false candidates to filter; set it near the typical interval length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(points: DataFrame, intervals: DataFrame, key: str,
               ts: str, start: str, end: str,
               bucket: str = "1 hour", how: str = "inner") -> DataFrame:
    """Join point rows to the interval rows containing them
    (``start <= ts < end``) within ``key``.  Interval columns are kept;
    overlapping intervals yield one output row per match.
    """
    sec = {"1 hour": 3600, "1 day": 86400, "1 minute": 60}.get(bucket)
    if sec is None:
        raise ValueError(f"unsupported bucket: {bucket}")
    p = points.withColumn(
        "__bucket", (F.unix_timestamp(F.col(ts)) / sec).cast("long"))
    i = intervals.withColumn(
        "__bucket",
        F.explode(F.sequence((F.unix_timestamp(F.col(start)) / sec).cast("long"),
                             # end is exclusive, but a point in the same
                             # bucket as `end` can still be < end
                             (F.unix_timestamp(F.col(end)) / sec).cast("long"))))
    out = (p.join(i, [key, "__bucket"], how)
           .filter((F.col(ts) >= F.col(start)) & (F.col(ts) < F.col(end))))
    return out.drop("__bucket")
