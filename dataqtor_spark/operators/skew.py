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


def salted_join(fact: DataFrame, dim: DataFrame, fact_key: str,
                dim_key: str, n_salt: int = 16,
                how: str = "inner") -> DataFrame:
    """Equi-join that spreads a hot fact key over ``n_salt`` reducers when
    the dim side is too big to broadcast: fact rows get a deterministic
    salt (xxhash64 of the whole row), the dim side is replicated
    ``n_salt``× via an exploded sequence, and the shuffle key becomes
    (key, salt).  Row-identical to the plain join for any salt values.
    When ``fact_key == dim_key`` the output carries ONE key column (the
    fact side's), matching the plain USING-join schema — so a guard that
    engages salting at runtime (:func:`join_with_skew_guard`) never
    changes the output schema, whichever path it takes.

    AQE's skew-join split (`spark.sql.adaptive.skewJoin`) handles most of
    these cases by splitting oversized partitions at runtime; explicit
    salting remains the tool when a single *key* (not partition) is hot
    enough that even a split partition serializes on one reducer, or when
    AQE is unavailable (non-adaptive engines, streaming joins).
    Cost: dim shuffle volume × ``n_salt`` — size n_salt to the observed
    skew ratio (see profile.key_skew_profile), not higher.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        # a right/full join would surface each unmatched dim row n_salt
        # times (one per replica) — the construction is one-directional
        raise ValueError(f"salted_join supports fact-side joins only, got {how!r}")
    salt_f = F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]),
                    F.lit(n_salt)).alias("__salt")
    f = fact.select("*", salt_f)
    d = dim.select("*", F.explode(F.sequence(
        F.lit(0), F.lit(n_salt - 1)).cast("array<bigint>")).alias("__salt"))
    out = f.join(d, (f[fact_key] == d[dim_key])
                 & (f["__salt"] == d["__salt"]), how)
    if how in ("left_semi", "left_anti"):
        return out.drop("__salt")
    if fact_key == dim_key:
        return out.select(*[f[c] for c in fact.columns],
                          *[d[c] for c in dim.columns if c != dim_key])
    return out.drop("__salt")


def hot_key_share(df: DataFrame, key_col: str,
                  support: float = 0.5) -> tuple:
    """Detect a hot join key cheaply: one ``freqItems`` pass (single
    scan, NO shuffle — approximate candidates with support ≥ ``support``)
    followed by one global aggregate that exactly counts just those
    candidates alongside the total.  NULL is always counted as a
    candidate of its own: ``freqItems`` never surfaces it and a plain
    ``==`` comparison against it is NULL, yet NULL fact keys in a
    left/outer join still all shuffle to one reducer — a hot NULL must
    engage the guard like any hot value.  Returns ``(key, share)`` for
    the hottest candidate (``key is None`` when NULL itself is hottest),
    or ``(None, 0.0)`` when nothing clears support.  Cost is two scans
    of the key column regardless of skew — never a count-by-key
    shuffle."""
    cands = (df.stat.freqItems([key_col], support=max(support, 1e-4))
             .collect()[0][0]) or []
    cands = [c for c in cands if c is not None] + [None]
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cands):
        hit = (F.col(key_col).isNull() if c is None
               else F.col(key_col).eqNullSafe(F.lit(c)))
        aggs.append(F.sum(hit.cast("long")).alias(f"__c{i}"))
    row = df.agg(*aggs).collect()[0]
    total = row["__n"] or 0
    if not total:
        return None, 0.0
    best_i = max(range(len(cands)), key=lambda i: row[f"__c{i}"] or 0)
    best_n = row[f"__c{best_i}"] or 0
    if not best_n:
        return None, 0.0
    return cands[best_i], best_n / total


def join_with_skew_guard(fact: DataFrame, dim: DataFrame, fact_key: str,
                         dim_key: str, how: str = "inner",
                         n_salt: int = 16,
                         salt_threshold: float | None = None) -> DataFrame:
    """Equi-join that AUTOMATICALLY engages :func:`salted_join` when the
    fact side's hottest key holds ≥ ``salt_threshold`` of the rows
    (measured by :func:`hot_key_share` — a freqItems pass plus one
    bounded aggregate, never a count-by-key shuffle).  ``None`` (the
    default) keeps the plain join: the guard is opt-in because the
    detection pass costs two fact scans, which only pays for itself on
    joins big enough that one serialized reducer dominates the stage.
    Results are row-identical either way (j07's oracle proves the salted
    construction); only the shuffle layout changes."""
    if salt_threshold is not None:
        import logging

        _key, share = hot_key_share(fact, fact_key,
                                    support=salt_threshold)
        if share >= salt_threshold:
            logging.getLogger(__name__).warning(
                "skew guard engaged: key %r holds %.1f%% of fact rows "
                "(threshold %.1f%%); salting join over %d reducers",
                _key, 100 * share, 100 * salt_threshold, n_salt)
            return salted_join(fact, dim, fact_key, dim_key,
                               n_salt=n_salt, how=how)
    if fact_key == dim_key:
        return fact.join(dim, fact_key, how)
    return fact.join(dim, fact[fact_key] == dim[dim_key], how)
