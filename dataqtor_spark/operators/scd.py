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


def scd2_with_deletes(changes: DataFrame, deletes: DataFrame, key: str,
                      ts_col: str, attr_cols: list[str],
                      tiebreak_col: str | None = None) -> DataFrame:
    """SCD2 build over a change log WITH hard deletes (the CDC matrix's
    missing quadrant): ``deletes`` rows are tombstones — a delete CLOSES
    the key's open validity interval at the delete timestamp without
    opening a new one, and a later change re-opens the key.

    Tombstones ride the same run-collapse as changes via an explicit
    ``__del`` flag folded into the run-boundary compare (never a
    NULL-attr sentinel, so genuinely-NULL attribute values can't be
    mistaken for deletion); tombstone runs are dropped AFTER interval
    construction, which is what closes the preceding run — the lead()
    that ends each interval sees the tombstone's start.  Same one-shuffle
    shape as :func:`scd2_from_history`."""
    tb = [tiebreak_col] if tiebreak_col else []
    ch = (changes.select(key, *attr_cols, ts_col, *tb)
          .withColumn("__del", F.lit(False)))
    de = deletes.select(
        F.col(key),
        *[F.lit(None).cast(changes.schema[a].dataType).alias(a)
          for a in attr_cols],
        F.col(ts_col), *[F.col(c) for c in tb]).withColumn(
            "__del", F.lit(True))
    runs = scd2_from_history(ch.unionByName(de), key, ts_col,
                             attr_cols + ["__del"], tiebreak_col)
    return runs.filter(~F.col("__del")).drop("__del")


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


# ---------------------------------------------------------------------------
# CDC primitives: snapshot diff and changelog compaction
# ---------------------------------------------------------------------------

def snapshot_diff(old: DataFrame, new: DataFrame, key_cols: list[str],
                  compare_cols: list[str] | None = None) -> DataFrame:
    """Keyed diff of two table versions: one row per key whose state
    changed, tagged ``added`` / ``removed`` / ``changed`` with both sides'
    compared values (old_*/new_*, NULL on the missing side).

    The reference has no versioning (one in-place-mutated frame,
    home.py:55-62); this is the engine-level replacement: a single
    full-outer join on the key — both sides shuffle once on the key (or
    zero times if both are bucketed on it) — with null-safe value
    comparison (``<=>``) so NULL→value and value→NULL count as changes.
    Unchanged keys are dropped before anything else touches the row, so
    the output is proportional to the delta, not the table.

    ``compare_cols=None`` handles schema evolution: the diff compares the
    columns COMMON to both versions (added/removed columns can't make a
    row "changed" — they'd flag every row; surface them via
    ``schema_changes`` instead).
    """
    if compare_cols is None:
        compare_cols = [c for c in old.columns
                        if c in set(new.columns) and c not in key_cols]
    o = old.select([F.col(k) for k in key_cols]
                   + [F.col(c).alias(f"old_{c}") for c in compare_cols]
                   + [F.lit(1).alias("__in_old")])
    n = new.select([F.col(k) for k in key_cols]
                   + [F.col(c).alias(f"new_{c}") for c in compare_cols]
                   + [F.lit(1).alias("__in_new")])
    j = o.join(n, key_cols, "full_outer")
    differs = None
    for c in compare_cols:
        d = ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
        differs = d if differs is None else (differs | d)
    change = (F.when(F.col("__in_old").isNull(), F.lit("added"))
              .when(F.col("__in_new").isNull(), F.lit("removed"))
              .when(differs, F.lit("changed")))
    return (j.withColumn("change_type", change)
            .filter(F.col("change_type").isNotNull())
            .select(*key_cols, "change_type",
                    *[f"old_{c}" for c in compare_cols],
                    *[f"new_{c}" for c in compare_cols]))


def latest_per_key(df: DataFrame, key_cols: list[str], ts_col: str,
                   tiebreak_cols: list[str] | None = None) -> DataFrame:
    """Changelog compaction: the latest row per key by (ts, tiebreaks) —
    the materialize-a-snapshot half of CDC ingestion (Debezium-style logs,
    upsert streams).

    One ``row_number`` window partitioned by the key: parallelism = keys,
    no global sort, and at 100 TB the shuffle carries only (key, ts,
    payload) once — strictly cheaper than groupBy(max)+self-join, and
    AQE's skew split handles hot keys.  Tiebreaks must make the order
    total (an id column) or "latest" is nondeterministic under replay.
    """
    order = [F.col(ts_col).desc()] + [
        F.col(c).desc() for c in (tiebreak_cols or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn"))


def schema_changes(old: DataFrame, new: DataFrame) -> list[dict]:
    """Column-level schema diff between two table versions:
    [{column, change, old_type, new_type}] for added / removed /
    retyped columns.  Metadata-only (no job runs)."""
    o = {f.name: f.dataType.simpleString() for f in old.schema.fields}
    n = {f.name: f.dataType.simpleString() for f in new.schema.fields}
    out = []
    for c in sorted(set(o) | set(n)):
        if c not in n:
            out.append({"column": c, "change": "removed",
                        "old_type": o[c], "new_type": None})
        elif c not in o:
            out.append({"column": c, "change": "added",
                        "old_type": None, "new_type": n[c]})
        elif o[c] != n[c]:
            out.append({"column": c, "change": "retyped",
                        "old_type": o[c], "new_type": n[c]})
    return out


def snapshot_at(scd2: DataFrame, at_ts, key: str = "user_id") -> DataFrame:
    """Reconstruct the dimension's state AS OF ``at_ts`` from its SCD2
    history: the one row per key whose validity interval covers the
    instant (``valid_from <= t < valid_to``, half-open like the builder).

    This is the time-travel read every warehouse audit needs ("what did
    the table say on the 15th?") and it is a pure FILTER on the history
    — no window, no join: at 100 TB, a history partitioned or Z-ordered
    on ``valid_from`` prunes to the covering row groups before a single
    row is read."""
    t = F.lit(at_ts).cast("timestamp")
    return scd2.filter((F.col("valid_from") <= t)
                       & ((F.col("valid_to").isNull())
                          | (F.col("valid_to") > t)))
