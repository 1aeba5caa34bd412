"""Slowly-changing-dimension (type 2) history building and incremental merge.

The reference app mutates one in-memory table in place (home.py:55-62 keeps
a single cached pandas frame per upload); an engine that owns a warehouse
needs the versioned equivalent: track every value an entity's attributes
took, with validity intervals.  Type-2 semantics here:

- one row per (key, run of equal attributes), ordered by the change time;
- ``valid_from`` = first change ts of the run, ``valid_to`` = next run's
  ``valid_from`` (NULL while open), ``is_current`` marks the open row.

Scale shape: everything is per-key windows (`partitionBy(key)`) — no global
sort, no driver state.  The incremental merge touches ONE open row per key
plus the new changes; closed history is passed through untouched, which is
what makes it viable on a 100 TB dimension where each batch changes a sliver
of keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SCD_COLS = ("valid_from", "valid_to", "is_current")


def scd2_from_history(changes: DataFrame, key: str, ts_col: str,
                      attr_cols: list[str],
                      tiebreak_col: str | None = None) -> DataFrame:
    """Collapse a change log into an SCD2 table.

    Consecutive rows (per key, ordered by ``ts_col`` then
    ``tiebreak_col``) with identical ``attr_cols`` merge into one validity
    run — the lag-compare is the run-boundary detector, the lead over run
    starts closes each interval.  Two analytic passes over the same
    (key × time) partitioning, so the shuffle is one hash partition by key.
    """
    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(key).orderBy(*order)
    same = F.lit(True)
    for a in attr_cols:
        same = same & (F.col(a).eqNullSafe(F.lag(a).over(w)))
    starts = (changes.withColumn("__new_run", ~F.coalesce(same, F.lit(False)))
              .filter(F.col("__new_run"))
              .drop("__new_run"))
    w2 = Window.partitionBy(key).orderBy(*order)
    return (starts.withColumn("valid_from", F.col(ts_col))
            .withColumn("valid_to", F.lead(ts_col).over(w2))
            .withColumn("is_current", F.col("valid_to").isNull())
            .select(key, *attr_cols, *SCD_COLS))


def scd2_merge(current: DataFrame, updates: DataFrame, key: str,
               ts_col: str, attr_cols: list[str],
               tiebreak_col: str | None = None) -> DataFrame:
    """Apply a batch of new change rows to an existing SCD2 table.

    The open row of each key is replayed as the seed "change" (at its
    original ``valid_from``) together with the new updates through
    :func:`scd2_from_history`; closed rows stream through untouched.  A
    batch whose first value equals the key's open value is recognized as a
    continuation (the run-collapse drops it), so re-delivered/duplicate
    feeds don't spawn phantom versions — the merge is idempotent for
    replayed batches.

    Updates older than a key's open ``valid_from`` are discarded — they
    describe history that is already closed (this is what makes replaying
    an already-applied batch a no-op; genuinely late data belongs in a
    history rebuild, not an incremental merge).
    """
    tb = [tiebreak_col] if tiebreak_col else []
    seeds = (current.filter(F.col("is_current"))
             .select(key, *attr_cols,
                     F.col("valid_from").alias(ts_col),
                     *[F.lit(None).cast(updates.schema[c].dataType).alias(c)
                       for c in tb]))
    closed = current.filter(~F.col("is_current"))
    fresh = (updates.select(key, *attr_cols, ts_col, *tb)
             .join(seeds.select(key, F.col(ts_col).alias("__seed_ts")),
                   key, "left")
             .filter(F.col("__seed_ts").isNull()
                     | (F.col(ts_col) >= F.col("__seed_ts")))
             .drop("__seed_ts"))
    replay = seeds.unionByName(fresh)
    recomputed = scd2_from_history(replay, key, ts_col, attr_cols,
                                   tiebreak_col)
    return closed.unionByName(recomputed)


def point_in_time_join(facts: DataFrame, scd2: DataFrame, key: str,
                       fact_ts: str, attr_cols: list[str],
                       suffix: str = "_at") -> DataFrame:
    """Feature-store point-in-time join: each fact row gets the dimension
    attributes that were valid AT its timestamp — never a later version
    (no feature leakage into training data), never an earlier one.

    SCD2 validity intervals partition each key's timeline, so the version
    valid at ``fact_ts`` is exactly the as-of match on ``valid_from`` —
    one union + carry-forward window (``operators.asof``), not an
    interval range-join.  Facts before a key's first version get NULLs.
    """
    from dataqtor_spark.operators.asof import asof_join

    dim = scd2.select(F.col(key), F.col("valid_from").alias(fact_ts),
                      *attr_cols)
    return asof_join(facts, dim, key, fact_ts, attr_cols, suffix=suffix)
