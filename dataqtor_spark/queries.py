"""Query registry: one named entry per implemented SURVEY.md §2 operator.

Each entry is ``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible)
a DuckDB oracle SQL string over the pre-registered testdata views.

Determinism rules used throughout so the driver's order-insensitive value
hash matches between Spark and DuckDB:
- double SUMs go through exact DECIMAL(18,2) accumulation, then cast to
  double (bit-exact regardless of partial-aggregation order);
- means/stddevs/quantiles are rounded to 4 decimals on both sides;
- top-k orderings always carry a deterministic tie-breaker.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataqtor_spark.operators import profile as P

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # nanos→micros: parquet TIMESTAMP(NANOS) arrives as long (see
        # session.get_spark); truncation matches DuckDB's µs comparisons
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


# ---------------------------------------------------------------------------
# Flagship: fused per-column null profile over customer (A3, home.py:146-152)
# ---------------------------------------------------------------------------

CUSTOMER_COLS = ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.null_profile(_t(spark, sf_dir, "customer"), CUSTOMER_COLS)


_NULL_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS "column",
       count(*)::BIGINT AS total_records,
       (count(*) - count({c}))::BIGINT AS null_records,
       count({c})::BIGINT AS filled_records,
       round((count(*) - count({c})) * 100.0 / count(*), 2) AS null_pct,
       round(count({c}) * 100.0 / count(*), 2) AS filled_pct
FROM customer"""
    for c in CUSTOMER_COLS
)

register("a03_null_profile_customer", _NULL_PROFILE_ORACLE)(flagship)


# ---------------------------------------------------------------------------
# A5 — describe over lineitem numerics (home.py:167-170)
# ---------------------------------------------------------------------------

_DESCRIBE_COLS = ["l_quantity", "l_extendedprice", "l_discount"]


@register(
    "a05_describe_lineitem",
    "\nUNION ALL\n".join(
        f"""SELECT '{c}' AS "column",
       count({c})::BIGINT AS count,
       round(CAST(sum(CAST({c} AS DECIMAL(18,2))) AS DOUBLE) / count({c}), 4) AS mean,
       round(stddev_samp({c}), 4) AS std,
       CAST(min({c}) AS DOUBLE) AS min,
       round(CAST(quantile_cont({c}, 0.25) AS DOUBLE), 4) AS q1,
       round(CAST(quantile_cont({c}, 0.5) AS DOUBLE), 4) AS median,
       round(CAST(quantile_cont({c}, 0.75) AS DOUBLE), 4) AS q3,
       CAST(max({c}) AS DOUBLE) AS max,
       CAST(sum(CAST({c} AS DECIMAL(18,2))) AS DOUBLE) AS sum
FROM lineitem"""
        for c in _DESCRIBE_COLS
    ),
)
def a05_describe_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    aggs = []
    for c in _DESCRIBE_COLS:
        col = F.col(c)
        dec_sum = F.sum(col.cast("decimal(18,2)")).cast("double")
        aggs += [
            F.count(col).alias(f"__count_{c}"),
            F.round(dec_sum / F.count(col), 4).alias(f"__mean_{c}"),
            F.round(F.stddev_samp(col), 4).alias(f"__std_{c}"),
            F.min(col).cast("double").alias(f"__min_{c}"),
            F.round(F.expr(f"percentile({c}, 0.25)").cast("double"), 4).alias(f"__q1_{c}"),
            F.round(F.expr(f"percentile({c}, 0.5)").cast("double"), 4).alias(f"__median_{c}"),
            F.round(F.expr(f"percentile({c}, 0.75)").cast("double"), 4).alias(f"__q3_{c}"),
            F.max(col).cast("double").alias(f"__max_{c}"),
            dec_sum.alias(f"__sum_{c}"),
        ]
    one = li.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"__count_{c}").alias("count"),
            F.col(f"__mean_{c}").alias("mean"),
            F.col(f"__std_{c}").alias("std"),
            F.col(f"__min_{c}").alias("min"),
            F.col(f"__q1_{c}").alias("q1"),
            F.col(f"__median_{c}").alias("median"),
            F.col(f"__q3_{c}").alias("q3"),
            F.col(f"__max_{c}").alias("max"),
            F.col(f"__sum_{c}").alias("sum"),
        )
        for c in _DESCRIBE_COLS
    ]
    return one.select(F.explode(F.array(*structs)).alias("s")).select("s.*")


# ---------------------------------------------------------------------------
# A7 — frequency table (home.py:172-175)
# ---------------------------------------------------------------------------

@register(
    "a07_frequency_mktsegment",
    """SELECT c_mktsegment AS value, count(*)::BIGINT AS count,
       round(count(*) * 100.0 / (SELECT count(*) FROM customer), 4) AS pct
FROM customer GROUP BY c_mktsegment""",
)
def a07_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.frequency(_t(spark, sf_dir, "customer"), "c_mktsegment")


# ---------------------------------------------------------------------------
# A8 — top-k / bottom-k frequent values (home.py:176-191)
# ---------------------------------------------------------------------------

@register(
    "a08_topk_orderpriority",
    """SELECT value, count FROM (
  SELECT o_orderpriority AS value, count(*)::BIGINT AS count
  FROM orders GROUP BY o_orderpriority
) ORDER BY count DESC, value ASC LIMIT 3""",
)
def a08_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.top_k(_t(spark, sf_dir, "orders"), "o_orderpriority", 3).select("value", "count")


@register(
    "a08_bottomk_eventtype",
    """SELECT value, count FROM (
  SELECT event_type AS value, count(*)::BIGINT AS count
  FROM events GROUP BY event_type
) ORDER BY count ASC, value ASC LIMIT 3""",
)
def a08_bottomk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.bottom_k(_t(spark, sf_dir, "events"), "event_type", 3).select("value", "count")


# ---------------------------------------------------------------------------
# A9 — rare values (home.py:193-209)
# ---------------------------------------------------------------------------

@register(
    "a09_rare_values_nationkey",
    """SELECT value, count, pct FROM (
  SELECT c_nationkey AS value, count(*)::BIGINT AS count,
         round(count(*) * 100.0 / (SELECT count(*) FROM customer), 4) AS pct
  FROM customer GROUP BY c_nationkey
) WHERE pct < 3.0""",
)
def a09_rare(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.rare_values(_t(spark, sf_dir, "customer"), "c_nationkey", threshold_pct=3.0)


# ---------------------------------------------------------------------------
# A10 — sign histogram (home.py:211-227)
# ---------------------------------------------------------------------------

@register(
    "a10_sign_histogram_acctbal",
    """SELECT
  count(*) FILTER (c_acctbal > 0)::BIGINT AS positive,
  count(*) FILTER (c_acctbal = 0)::BIGINT AS zero,
  count(*) FILTER (c_acctbal < 0)::BIGINT AS negative,
  round(count(*) FILTER (c_acctbal > 0) * 100.0 / count(*), 2) AS positive_pct,
  round(count(*) FILTER (c_acctbal = 0) * 100.0 / count(*), 2) AS zero_pct,
  round(count(*) FILTER (c_acctbal < 0) * 100.0 / count(*), 2) AS negative_pct
FROM customer""",
)
def a10_sign(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.sign_histogram(_t(spark, sf_dir, "customer"), "c_acctbal")


# ---------------------------------------------------------------------------
# A11 — pattern profile (home.py:229-251)
# ---------------------------------------------------------------------------

@register(
    "a11_pattern_profile_cname",
    """SELECT pattern, count, pct FROM (
  SELECT regexp_replace(regexp_replace(c_name, '[A-Za-zÖÇĞİŞÜöçğışü]', 'A', 'g'), '[0-9]', '9', 'g') AS pattern,
         count(*)::BIGINT AS count,
         round(count(*) * 100.0 / (SELECT count(*) FROM customer), 4) AS pct
  FROM customer GROUP BY 1
)""",
)
def a11_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.pattern_profile(_t(spark, sf_dir, "customer"), "c_name")


# ---------------------------------------------------------------------------
# A6 — string length stats + arg-min/max (home.py:133-144)
# ---------------------------------------------------------------------------

@register(
    "a06_string_stats_pname",
    """SELECT
  min(length(p_name))::INT AS min_length,
  max(length(p_name))::INT AS max_length,
  (SELECT min(p_name) FROM part WHERE length(p_name) = (SELECT min(length(p_name)) FROM part)) AS shortest_value,
  (SELECT max(p_name) FROM part WHERE length(p_name) = (SELECT max(length(p_name)) FROM part)) AS longest_value,
  min(p_name) AS alpha_min,
  max(p_name) AS alpha_max
FROM part""",
)
def a06_string_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _t(spark, sf_dir, "part")
    c, ln = F.col("p_name"), F.length("p_name")
    return df.agg(
        F.min(ln).alias("min_length"),
        F.max(ln).alias("max_length"),
        F.min(F.struct(ln.alias("l"), c.alias("v")))["v"].alias("shortest_value"),
        F.max(F.struct(ln.alias("l"), c.alias("v")))["v"].alias("longest_value"),
        F.min(c).alias("alpha_min"),
        F.max(c).alias("alpha_max"),
    )


# ---------------------------------------------------------------------------
# A12 — per-column duplicate values (home.py:253-263)
# ---------------------------------------------------------------------------

@register(
    "a12_duplicate_values_custkey",
    """SELECT o_custkey AS value, count(*)::BIGINT AS count
FROM orders GROUP BY o_custkey HAVING count(*) > 1""",
)
def a12_dup_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.duplicate_values(_t(spark, sf_dir, "orders"), "o_custkey")


# ---------------------------------------------------------------------------
# A2/R14 — duplicate rows (home.py:100-110)
# ---------------------------------------------------------------------------

@register(
    "a02_duplicate_rows_lineitem",
    """SELECT coalesce(sum(duplicate_count - 1), 0)::BIGINT AS duplicate_rows FROM (
  SELECT count(*) AS duplicate_count
  FROM lineitem
  GROUP BY l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
           l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
  HAVING count(*) > 1
)""",
)
def a02_dup_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.duplicate_row_count(_t(spark, sf_dir, "lineitem"))


# ---------------------------------------------------------------------------
# A1 — table summary (home.py:88-92)
# ---------------------------------------------------------------------------

@register(
    "a01_table_summary_lineitem",
    """SELECT count(*)::BIGINT AS n_rows, 11::INT AS n_columns,
       8::INT AS n_numeric_columns, 3::INT AS n_nominal_columns
FROM lineitem""",
)
def a01_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.table_summary(_t(spark, sf_dir, "lineitem"))
