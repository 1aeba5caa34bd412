"""Mergeable DataSketches operators (Apache DataSketches via the Spark 4
``theta_*`` / ``kll_*`` built-ins).

Why these exist: at 100 TB, "distinct users who did BOTH X and Y" and
"p95 latency per group, rolled up to any ancestor" are the queries that
break naive plans — COUNT(DISTINCT) over an intersection needs the raw
key sets co-shuffled, and exact percentiles need a full sort.  Sketches
make both ALGEBRAIC: per-partition/per-group states merge associatively,
so the heavy data is touched once, partials are bytes, and any rollup
(segment → day → global) is a merge over tiny states — the same contract
as the HLL operators in :mod:`dataqtor_spark.operators.profile`.

Exactness contract (what the differential oracle leans on): both sketch
families are EXACT below their retained-item capacity — theta keeps every
hashed key until ``lgK`` entries (4096 at the default), KLL keeps every
value while n ≤ k — and degrade to bounded-error estimates past it.  The
registered queries run exact at the oracle's scale factor and become
estimates at 100 TB with the published error bounds (theta: ~1/√k
relative; KLL: ~1.65/k rank error), which is precisely the trade these
operators are FOR.  No reference parity: this is north-star surface the
reference (single-node pandas) cannot express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def theta_overlap(df: DataFrame, segment_col: str, key_col: str,
                  seg_a: str, seg_b: str) -> DataFrame:
    """Audience overlap between two segments without co-shuffling raw keys:
    (segment_a, segment_b, distinct_a, distinct_b, n_overlap, n_union,
    jaccard).

    Plan shape: ONE scan builds a theta sketch per segment (map-side
    combinable aggregate — the raw keys never leave their partitions);
    intersection/union are driver-free set algebra over two sketch
    buffers.  The exact-SQL equivalent (two DISTINCT sets + INTERSECT)
    shuffles every key twice and cannot pre-aggregate.
    """
    sk = (df.filter(F.col(segment_col).isin([seg_a, seg_b]))
          .groupBy(F.col(segment_col).alias("seg"))
          .agg(F.theta_sketch_agg(F.col(key_col)).alias("sk")))
    # NOT theta_intersection_agg: over ONE sketch it returns that sketch
    # (fold identity — full overlap for a missing segment) and over ZERO
    # rows its result buffer is the "infinite set" and throws.  Pull the
    # two per-segment sketches into one row and apply the BINARY set ops
    # under null guards, forcing the degenerate cases to their
    # set-theoretic truth (missing segment ⇒ empty set ⇒ overlap 0,
    # union = the other side).
    both = sk.agg(
        F.first(F.when(F.col("seg") == seg_a, F.col("sk")),
                ignorenulls=True).alias("ska"),
        F.first(F.when(F.col("seg") == seg_b, F.col("sk")),
                ignorenulls=True).alias("skb"))
    missing = F.col("ska").isNull() | F.col("skb").isNull()
    a_est = (F.when(F.col("ska").isNull(), F.lit(0.0))
             .otherwise(F.theta_sketch_estimate(F.col("ska"))))
    b_est = (F.when(F.col("skb").isNull(), F.lit(0.0))
             .otherwise(F.theta_sketch_estimate(F.col("skb"))))
    overlap = (F.when(missing, F.lit(0.0))
               .otherwise(F.theta_sketch_estimate(
                   F.theta_intersection(F.col("ska"), F.col("skb")))))
    union = (F.when(missing, a_est + b_est)
             .otherwise(F.theta_sketch_estimate(
                 F.theta_union(F.col("ska"), F.col("skb")))))
    return both.select(
        F.lit(seg_a).alias("segment_a"), F.lit(seg_b).alias("segment_b"),
        a_est.cast("long").alias("distinct_a"),
        b_est.cast("long").alias("distinct_b"),
        overlap.cast("long").alias("n_overlap"),
        union.cast("long").alias("n_union"),
        F.when(union > 0, F.round(overlap / union, 6))
        .otherwise(F.lit(0.0)).alias("jaccard"))


def theta_segment_matrix(df: DataFrame, segment_col: str,
                         key_col: str) -> DataFrame:
    """Pairwise audience overlap across ALL segments: (segment_a,
    segment_b, n_overlap) for every unordered segment pair, from one scan.

    The per-segment sketches (|segments| rows of ~kB buffers) are the only
    shuffled state; the pair matrix is a broadcast self-join over that
    tiny table — quadratic only in |segments|, never in keys.
    """
    sk = (df.groupBy(F.col(segment_col).alias("seg"))
          .agg(F.theta_sketch_agg(F.col(key_col)).alias("sk")))
    a, b = sk.alias("a"), sk.alias("b")
    return (a.join(F.broadcast(b), F.col("a.seg") < F.col("b.seg"))
            .select(F.col("a.seg").alias("segment_a"),
                    F.col("b.seg").alias("segment_b"),
                    F.theta_sketch_estimate(
                        F.theta_intersection(F.col("a.sk"), F.col("b.sk")))
                    .cast("long").alias("n_overlap")))


def kll_quantile_rollup(df: DataFrame, value_col: str, group_col: str,
                        quantiles: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
                        k: int = 65535) -> DataFrame:
    """Per-group quantiles PLUS the global rollup from one scan, via
    mergeable KLL sketches: (group, q, value); the global row merges the
    per-group sketches (group = '__all__') instead of re-reading data.

    This is the scale pattern exact percentiles can't follow: sketch once
    at the finest grain, then ANY coarser rollup (group → all, day →
    month) is an algebraic merge of kB-sized states.  Values returned are
    actual data points (KLL quantiles are order statistics of retained
    items), so below capacity (n ≤ k per merged sketch) the result equals
    ``percentile_disc`` exactly.
    """
    v = F.col(value_col).cast("double")
    per_group = (df.filter(v.isNotNull())
                 .groupBy(F.col(group_col).cast("string").alias("group"))
                 .agg(F.kll_sketch_agg_double(v, F.lit(k)).alias("sk")))
    # kll_sketch_merge_double is a binary scalar: fold the per-group
    # sketch list (|groups| kB-sized buffers — tiny) pairwise
    merged = (per_group.agg(F.collect_list("sk").alias("sks"))
              .select(F.lit("__all__").alias("group"),
                      F.aggregate(
                          F.slice("sks", 2, F.greatest(
                              F.size("sks") - 1, F.lit(0))),
                          F.element_at("sks", 1),
                          lambda acc, x: F.kll_sketch_merge_double(acc, x))
                      .alias("sk")))
    both = per_group.unionByName(merged)
    rows = [F.struct(F.lit(q).alias("q"),
                     F.kll_sketch_get_quantile_double("sk", F.lit(q))
                     .alias("value")) for q in quantiles]
    return (both.select("group", F.explode(F.array(*rows)).alias("s"))
            .select("group", F.col("s.q").alias("q"),
                    F.col("s.value").alias("value")))


def _cms_tokens(df: DataFrame, text_col: str) -> DataFrame:
    from dataqtor_spark.operators.dedup import portable_string_hash
    from dataqtor_spark.operators.textstats import _clean_tokens

    # Tokenize + md5 INSIDE the scan stage, no exchange (the pre-r15
    # shape).  r15 moved the work above a parallelize() exchange (raw
    # text shuffled, tokenize+md5 after) to escape the single-task scan
    # stage; the r16 quiet-host interleaved A/B measured that variant
    # LOSING at 32 cores — med 1.19 s vs 0.97 s for this shape — the
    # same failure mode as t42's rejected pre-exchange: the exchange
    # carries raw text that the scan-stage partial aggregation of the
    # downstream groupBy otherwise reduces before any shuffle, and the
    # CMS consumers aggregate straight into width-bounded cells, so
    # parallelizing the md5 buys less than the extra corpus-sized
    # exchange costs.  Reverted per the r15 verdict (keep the winner);
    # numbers in OPTIMIZATION_r16.md.
    return (df.select(F.explode(_clean_tokens(text_col)).alias("__t"))
            .withColumn("__v", portable_string_hash(F.col("__t"))))


def _cms_bucket_exprs(depth: int, width: int):
    """array<long> of the depth bucket ids for the __v hash column."""
    from dataqtor_spark.operators.dedup import (
        PORTABLE_P, portable_hash_constants)

    consts = portable_hash_constants(depth, salt="cms")
    return F.array(*[(F.lit(a) * F.col("__v") + F.lit(b))
                     % PORTABLE_P % width for a, b in consts])


def cms_cells(df: DataFrame, text_col: str = "text", depth: int = 4,
              width: int = 256) -> DataFrame:
    """The raw depth×width counter grid ``(row, bucket, count)`` — the
    shippable/mergeable artifact: grids from different shards, days, or
    streams combine by cell-wise SUM (tested), and any consumer with the
    same salt re-derives probe cells from a token alone."""
    toks = _cms_tokens(df, text_col)
    return (toks.select(F.posexplode(_cms_bucket_exprs(depth, width))
                        .alias("__i", "__b"))
            .groupBy("__i", "__b")
            .agg(F.count(F.lit(1)).alias("__c")))


def cms_heavy_hitters(df: DataFrame, text_col: str = "text",
                      depth: int = 4, width: int = 256,
                      top_k: int = 10) -> DataFrame:
    """Count-Min sketch heavy hitters (Cormode & Muthukrishnan 2005)
    over the corpus token stream, validated against exact counts.

    The sketch is depth×width counters: token t increments cell
    ``(i, h_i(t))`` for each of ``depth`` independent hashes;
    ``est(t) = min_i cells[i][h_i(t)]`` always OVER-estimates, by at most
    ``e/width · T`` (T = total tokens) with probability ``1 − e^-depth``.
    Returns the exact top-``top_k`` tokens as ``(token, exact_cnt,
    cms_est, overcount)`` — overcount ≥ 0 by construction, so the sketch
    is differentially checkable, not just plausible.

    Scale shape: the CMS build is the 100 TB path — tokens map to
    (row, bucket) pairs in a projection and aggregate into AT MOST
    depth·width cells (map-side partial aggregation means each task
    emits ≤ depth·width rows no matter how many tokens it saw), and cell
    grids from different shards/days/streams MERGE by cell-wise sum —
    the same algebraic contract as the theta/KLL operators above.  The
    exact side (one token groupBy) exists only to validate; a production
    pipeline ships the 1 024-cell grid instead of the unbounded token
    table.  Determinism: the md5-derived ``cms``-salted hash family
    (dedup.portable_hash_constants) is bit-identical in Spark, DuckDB,
    and hashlib, so estimates — not just exact counts — replay in SQL.
    """
    toks = _cms_tokens(df, text_col)
    cells = cms_cells(df, text_col, depth=depth, width=width)
    bucket = _cms_bucket_exprs(depth, width)
    exact = (toks.groupBy("__t", "__v")
             .agg(F.count(F.lit(1)).alias("__cnt"))
             .orderBy(F.desc("__cnt"), F.asc("__t"))
             .limit(top_k))
    probes = exact.select(
        "__t", "__cnt", F.posexplode(bucket).alias("__i", "__b"))
    return (probes.join(cells, ["__i", "__b"])
            .groupBy("__t", "__cnt")
            .agg(F.min("__c").alias("__est"))
            .select(F.col("__t").alias("token"),
                    F.col("__cnt").cast("long").alias("exact_cnt"),
                    F.col("__est").cast("long").alias("cms_est"),
                    (F.col("__est") - F.col("__cnt")).cast("long")
                    .alias("overcount")))
