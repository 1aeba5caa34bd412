"""Adversarial skew probe for the ordered_prefix total-order primitive.

The generic scale probe grows data uniformly, but ordered_prefix's risk
profile is ORDER-KEY SKEW: ``repartitionByRange`` samples the ordering to
pick bounds, and a 90%-duplicate key gives the sampler only ~10% distinct
values to cut on.  The caller contract (include a unique tiebreak so the
order is total) is exactly what saves the plan — range bounds can split
WITHIN the hot key along the tiebreak, so the hot key spreads across
partitions instead of funneling one task.  This probe plants a 90%-hot
key (ties broken only by the tiebreak id), scales the row count
10×/100×, and records wall-clock growth plus the realized max-partition
share; growth ≲ linear and a bounded share mean the contract holds under
adversarial skew.

Usage: python tools/ordered_skew_probe.py
Rewrites the '## Ordered-prefix skew probe' section of SCALE_PROBE.md.
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

MARK = "## Ordered-prefix skew probe"
BASE = 100_000


def skewed(spark, n: int):
    """n rows, 90% sharing one hot order key, unique tiebreak id."""
    return spark.range(n).select(
        F.col("id"),
        F.when(F.col("id") % 10 < 9, F.lit(42))
        .otherwise(F.col("id")).cast("long").alias("k"),
        (F.col("id") % 97).cast("double").alias("v"))


def probe(spark, n: int) -> tuple[float, int, float]:
    from dataqtor_spark.operators.ordered import ordered_prefix

    df = skewed(spark, n)
    order = [F.col("k"), F.col("id")]
    t0 = time.perf_counter()
    out = ordered_prefix(df, order, sums={"c": F.col("v")}, out_rn="rn")
    rows = out.count()
    dt = time.perf_counter() - t0
    # realized partition balance of the range exchange under the hot key
    sizes = [r["n"] for r in
             df.repartitionByRange(
                 spark.sparkContext.defaultParallelism, *order)
             .groupBy(F.spark_partition_id().alias("p"))
             .agg(F.count(F.lit(1)).alias("n")).collect()]
    share = max(sizes) / sum(sizes)
    return dt, rows, share


def main() -> None:
    from dataqtor_spark.session import get_spark

    spark = get_spark("ordered-skew-probe")
    spark.sparkContext.setLogLevel("ERROR")

    lines = [MARK, "",
             "Planted 90%-duplicate order key (ties split only by the",
             "unique tiebreak id), scaled 10x/100x.  repartitionByRange",
             "bounds can cut WITHIN the hot key because the tiebreak is",
             "part of the ordering (the caller contract), so the hot key",
             "spreads across partitions; max-share is the realized largest",
             "partition's fraction of all rows (32 partitions, balanced",
             "would be ~0.03).", "",
             "| rows | t (s) | growth | max partition share |",
             "|---|---|---|---|"]
    probe(spark, 10_000)  # warm up codegen/JIT so 1x isn't startup-bound
    t_base = None
    for mult in (1, 10, 100):
        dt, rows, share = probe(spark, BASE * mult)
        t_base = t_base or dt
        lines.append(f"| {rows:,} | {dt:.2f} | {dt / t_base:.1f}x "
                     f"| {share:.3f} |")
    lines += ["", "Linear references: 10.0x / 100.0x.  Sub-linear growth =",
              "fixed overhead still amortizing; a max share near 1.0 would",
              "mean the hot key funneled one partition (it must not, given",
              "the tiebreak contract).", ""]
    block = "\n".join(lines)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALE_PROBE.md")
    text = open(path).read()
    if MARK in text:
        text = re.sub(re.escape(MARK) + r".*?(?=\n## |\Z)", block,
                      text, flags=re.S)
    else:
        text = text.rstrip() + "\n\n" + block
    open(path, "w").write(text)
    print(block)


if __name__ == "__main__":
    main()
