"""Multi-dimensional data layout: Z-order (Morton) clustering for file and
row-group skipping.

A dataset sorted by one column prunes scans filtered on that column only.
Interleaving the bits of several columns' rank buckets (the Z-order curve)
gives every participating column *partial* locality, so parquet min/max
stats prune files for predicates on ANY of them — the layout trick behind
Delta/Iceberg ``OPTIMIZE ZORDER BY``, built here from plain DataFrame ops:

  bucketize each column (width_bucket over approx-quantile boundaries,
  collected once, k doubles per column) → interleave bucket bits into one
  long → repartitionByRange + sortWithinPartitions on that long → write.

Nothing shuffles except the final range partition, which the write needed
anyway; the quantile probe is a sampled single pass per column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(col: Column, boundaries: list[float], bits: int) -> Column:
    """0..2^bits-1 bucket index from precollected quantile boundaries —
    a pure expression (binary-search CASE via width_bucket semantics)."""
    arr = F.array(*[F.lit(float(b)) for b in boundaries])
    idx = F.aggregate(
        arr, F.lit(0),
        lambda acc, b: acc + F.when(col.cast("double") >= b, 1).otherwise(0))
    return F.least(idx, F.lit((1 << bits) - 1))


def zorder_value(df: DataFrame, cols: list[str], bits: int = 8) -> Column:
    """Morton-interleaved long over ``cols`` (each bucketized to ``bits``
    bits via its own approx quantiles).  Collects len(cols) × 2^bits
    boundary doubles on the driver — tiny, one sampled pass per column."""
    probs = [i / (1 << bits) for i in range(1, 1 << bits)]
    z = F.lit(0).cast("long")
    n = len(cols)
    for ci, c in enumerate(cols):
        bounds = df.approxQuantile(c, probs, 0.001)
        b = _bucket(F.col(c), bounds, bits).cast("long")
        for i in range(bits):
            # bit i of this column lands at interleaved position i*n + ci
            z = z + F.shiftleft(
                F.shiftright(b, i).bitwiseAND(F.lit(1)), i * n + ci)
    return z


def write_zordered(df: DataFrame, path: str, cols: list[str],
                   n_files: int = 16, bits: int = 8) -> None:
    """Write ``df`` as parquet clustered on the Z-order curve of ``cols``.

    ``repartitionByRange`` on the z-value gives each output file a compact
    curve segment (and so a tight min/max box in every dimension);
    ``sortWithinPartitions`` tightens per-row-group stats inside the file.
    """
    z = zorder_value(df, cols, bits)
    (df.withColumn("__z", z)
     .repartitionByRange(n_files, "__z")
     .sortWithinPartitions("__z")
     .drop("__z")
     .write.mode("overwrite").parquet(path))


def file_overlap_fraction(path: str, col: str, lo, hi) -> float:
    """Fraction of the dataset's parquet files whose [min, max] for
    ``col`` intersects [lo, hi] — the share of files a stats-based scan
    must open for that predicate.  Uses parquet footer metadata only."""
    import os

    import pyarrow.parquet as pq

    files = [os.path.join(r, f) for r, _d, fs in os.walk(path)
             for f in fs if f.endswith(".parquet")]
    hit = 0
    for fp in files:
        md = pq.ParquetFile(fp).metadata
        fmin = fmax = None
        for rg in range(md.num_row_groups):
            for i in range(md.num_columns):
                cc = md.row_group(rg).column(i)
                if cc.path_in_schema == col and cc.statistics is not None:
                    s = cc.statistics
                    fmin = s.min if fmin is None else min(fmin, s.min)
                    fmax = s.max if fmax is None else max(fmax, s.max)
        if fmin is None or (fmax >= lo and fmin <= hi):
            hit += 1
    return hit / max(1, len(files))


def read_pruned(spark, path: str, col: str, lo, hi) -> "DataFrame":
    """Scan only the parquet files whose [min, max] for ``col`` intersects
    [lo, hi] — manual file skipping for data that is CLUSTERED (e.g.
    Z-ordered) but not directory-partitioned on ``col``.

    The footer sweep is driver-side and O(files) — cheap next to reading
    the data, and exactly what a lakehouse manifest (Delta/Iceberg file
    stats) does natively; this is the plain-parquet rendition.  The
    returned frame still carries the row-level filter, so row-group
    pruning and predicate pushdown apply inside the selected files.
    """
    import os

    import pyarrow.parquet as pq

    keep = []
    for r, _d, fs in os.walk(path):
        for f in fs:
            if not f.endswith(".parquet"):
                continue
            fp = os.path.join(r, f)
            md = pq.ParquetFile(fp).metadata
            fmin = fmax = None
            for rg in range(md.num_row_groups):
                for i in range(md.num_columns):
                    cc = md.row_group(rg).column(i)
                    if cc.path_in_schema == col and cc.statistics is not None:
                        s = cc.statistics
                        fmin = s.min if fmin is None else min(fmin, s.min)
                        fmax = s.max if fmax is None else max(fmax, s.max)
            if fmin is None or (fmax >= lo and fmin <= hi):
                keep.append(fp)
    if not keep:
        return (spark.read.parquet(path)
                .filter(F.col(col).between(lo, hi)).limit(0))
    return (spark.read.parquet(*keep)
            .filter(F.col(col).between(lo, hi)))


# ---------------------------------------------------------------------------
# raw-integer Morton interleave (oracle-exact variant)
#
# zorder_value above bucketizes through approxQuantile — the right default
# for arbitrary numeric columns, but its sampled boundaries are not
# SQL-replayable.  When the dimensions are ALREADY small integers (ids mod
# 2^bits, day numbers, geohash cells), the interleave itself is pure bit
# arithmetic that replays bit-for-bit in ANSI SQL, so layout keys become
# differentially testable like any operator (zorder01; the geo02
# precedent).
# ---------------------------------------------------------------------------

def zvalue_expr(cols: list[Column], bits: int = 16) -> Column:
    """Morton interleave of the low ``bits`` bits of each column (2-4
    dimensions): output bit ``b*n + i`` = bit ``b`` of ``cols[i]``.

    Pure shift/mask arithmetic — ``bits × n`` constant-folded terms inside
    whole-stage codegen.  Callers MUST normalize each dimension into
    [0, 2^bits) first (clamp, bucket, or hash): values above the range
    alias in via the mask, and NEGATIVE inputs alias through two's
    complement (arithmetic shift keeps the sign bit) rather than
    erroring — same in :func:`zvalue_sql`, so the two sides agree, but
    the curve locality the caller wanted is destroyed either way.
    ``bits * len(cols)`` ≤ 63 so the value fits a long."""
    n = len(cols)
    if not 2 <= n <= 4:
        raise ValueError("zvalue_expr interleaves 2-4 dimensions")
    if bits * n > 63:
        raise ValueError(f"bits*dims = {bits * n} exceeds a signed long")
    out = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        v = c.cast("long")
        for b in range(bits):
            out = out + F.shiftleft(
                F.shiftright(v, b).bitwiseAND(F.lit(1)), b * n + i)
    return out.cast("long")


def zvalue_sql(col_sqls: list[str], bits: int = 16) -> str:
    """The identical Morton interleave as a dialect-neutral SQL
    expression string (``CAST``/``>>``/``<<``/``&``/``+`` parse on both
    DuckDB and Spark SQL) — the differential oracle's side of
    :func:`zvalue_expr`.  Same non-negative-input expectation: negative
    values alias via two's complement instead of erroring."""
    n = len(col_sqls)
    terms = []
    for i, c in enumerate(col_sqls):
        for b in range(bits):
            terms.append(
                f"((((CAST(({c}) AS BIGINT) >> {b}) & 1)) << {b * n + i})")
    return "(" + " + ".join(terms) + ")"


# ---------------------------------------------------------------------------
# Hilbert curve (oracle-exact, unrolled-rounds variant)
#
# Morton's weakness at scale: the Z curve takes long diagonal jumps at
# power-of-two boundaries, so curve segments (= parquet files after
# repartitionByRange) carry wide min/max boxes on those seams and pruning
# opens extra files.  The Hilbert curve is CONTINUOUS — consecutive curve
# steps are always grid-adjacent — so equal-length segments have provably
# tighter bounding boxes; it is what Databricks liquid clustering and
# Iceberg's hilbert-order use for exactly this reason.  The canonical
# xy2d algorithm is a per-bit fold with carried (x, y, d) state, which
# maps onto Spark as `bits` chained projections (each round's columns
# reference the previous round's BY NAME, so Catalyst keeps one Project
# node per round — linear plan size, no expression blow-up; CollapseProject
# declines to inline multiply-referenced columns) and onto the DuckDB
# oracle as the same rounds unrolled into a CTE chain (the g01/bpe02
# fixed-rounds device).  The (3*rx) XOR ry step is rewritten as
# 3*rx + ry*(1-2*rx) — identical on {0,1}² — to stay dialect-neutral.
# ---------------------------------------------------------------------------


def with_hilbert(df: DataFrame, x_col: str, y_col: str, bits: int = 8,
                 out_col: str = "hvalue") -> DataFrame:
    """Append the 2-D Hilbert index of ``(x_col, y_col)`` as ``out_col``.

    Both dimensions MUST already lie in [0, 2^bits) — clamp, bucket, or
    mask first (same caller contract as :func:`zvalue_expr`).  The index
    is a long in [0, 4^bits); ``bits`` ≤ 31 keeps it inside a signed
    long, though layout use wants small grids (8-12 bits/dim)."""
    if not 1 <= bits <= 31:
        raise ValueError("with_hilbert needs 1 <= bits <= 31")
    cur = df.withColumns({
        "__hx": F.col(x_col).cast("long"),
        "__hy": F.col(y_col).cast("long"),
        "__hd": F.lit(0).cast("long"),
    })
    for r in range(bits - 1, -1, -1):
        s = 1 << r
        hx, hy = F.col("__hx"), F.col("__hy")
        rx = F.when(hx.bitwiseAND(F.lit(s)) > 0,
                    F.lit(1)).otherwise(F.lit(0))
        ry = F.when(hy.bitwiseAND(F.lit(s)) > 0,
                    F.lit(1)).otherwise(F.lit(0))
        cur = cur.withColumns({
            "__hx": F.when(ry == 1, hx).otherwise(
                F.when(rx == 1, F.lit(s - 1) - hy).otherwise(hy)),
            "__hy": F.when(ry == 1, hy).otherwise(
                F.when(rx == 1, F.lit(s - 1) - hx).otherwise(hx)),
            "__hd": F.col("__hd") + (F.lit(s) * F.lit(s) * (
                F.lit(3) * rx + ry * (F.lit(1) - F.lit(2) * rx))
            ).cast("long"),
        })
    return (cur.withColumn(out_col, F.col("__hd"))
            .drop("__hx", "__hy", "__hd"))


def hilbert_cte_sql(base_sql: str, passthrough: list[str], x_sql: str,
                    y_sql: str, bits: int = 8,
                    out: str = "hvalue") -> str:
    """The identical Hilbert fold as a dialect-neutral SQL CTE chain —
    the differential oracle's side of :func:`with_hilbert`.  ``base_sql``
    provides the input rows; ``passthrough`` columns are carried along;
    the result exposes them plus ``out``.  One CTE per curve order keeps
    every round's (hx, hy, hd) named, mirroring the Spark projections
    bit for bit."""
    cols = ", ".join(passthrough)
    sql = (f"WITH hstep{bits} AS (\n"
           f"  SELECT {cols}, CAST({x_sql} AS BIGINT) AS hx,\n"
           f"         CAST({y_sql} AS BIGINT) AS hy,\n"
           f"         CAST(0 AS BIGINT) AS hd\n"
           f"  FROM ({base_sql})\n)")
    for r in range(bits - 1, -1, -1):
        s = 1 << r
        rx = f"(CASE WHEN (hx & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END)"
        sql += (f", hstep{r} AS (\n"
                f"  SELECT {cols},\n"
                f"    (CASE WHEN {ry} = 1 THEN hx"
                f" WHEN {rx} = 1 THEN {s - 1} - hy ELSE hy END) AS hx,\n"
                f"    (CASE WHEN {ry} = 1 THEN hy"
                f" WHEN {rx} = 1 THEN {s - 1} - hx ELSE hx END) AS hy,\n"
                f"    hd + CAST({s * s} AS BIGINT) *"
                f" (3 * {rx} + {ry} * (1 - 2 * {rx})) AS hd\n"
                f"  FROM hstep{r + 1 if r < bits - 1 else bits}\n)")
    return sql + f"\nSELECT {cols}, hd AS {out} FROM hstep0"


def write_hilbert_ordered(df: DataFrame, path: str, x_col: str,
                          y_col: str, n_files: int = 16,
                          bits: int = 8) -> None:
    """Write ``df`` as parquet clustered on the Hilbert curve of the two
    (pre-normalized) dimensions — same mechanics as
    :func:`write_zordered`, tighter per-file bounding boxes thanks to
    curve continuity."""
    (with_hilbert(df, x_col, y_col, bits, "__h")
     .repartitionByRange(n_files, "__h")
     .sortWithinPartitions("__h")
     .drop("__h")
     .write.mode("overwrite").parquet(path))
