"""SCD2 merge, salted join, HLL sketch rollups, compaction, Z-order layout."""

import pytest
from pyspark.sql import functions as F


# --- SCD2 ------------------------------------------------------------------

def _scd2_all(spark, tables):
    from dataqtor_spark.operators import scd as SCD

    return SCD.scd2_from_history(tables["events"], "user_id", "ts",
                                 ["event_type"], tiebreak_col="event_id")


def test_scd2_one_current_row_per_key(spark, tables):
    out = _scd2_all(spark, tables)
    per = (out.filter("is_current").groupBy("user_id")
           .agg(F.count(F.lit(1)).alias("n")))
    assert per.filter("n != 1").count() == 0
    n_users = tables["events"].select("user_id").distinct().count()
    assert out.filter("is_current").count() == n_users


def test_scd2_intervals_chain(spark, tables):
    # each row's valid_to equals the next row's valid_from (per key)
    from pyspark.sql.window import Window

    out = _scd2_all(spark, tables)
    w = Window.partitionBy("user_id").orderBy("valid_from")
    chained = out.withColumn("__next_from", F.lead("valid_from").over(w))
    bad = chained.filter(
        (F.col("valid_to").isNotNull())
        & (F.col("valid_to") != F.col("__next_from")))
    assert bad.count() == 0


def test_scd2_merge_idempotent_for_replayed_batch(spark, tables):
    from dataqtor_spark.operators import scd as SCD

    ev = tables["events"]
    cut = F.lit("2024-01-15").cast("timestamp")
    current = SCD.scd2_from_history(ev.filter(F.col("ts") < cut),
                                    "user_id", "ts", ["event_type"],
                                    tiebreak_col="event_id")
    updates = ev.filter(F.col("ts") >= cut)
    once = SCD.scd2_merge(current, updates, "user_id", "ts",
                          ["event_type"], tiebreak_col="event_id")
    twice = SCD.scd2_merge(once, updates, "user_id", "ts",
                           ["event_type"], tiebreak_col="event_id")
    assert once.exceptAll(twice).count() == 0
    assert twice.exceptAll(once).count() == 0


# --- salted join -----------------------------------------------------------

def test_salted_join_matches_plain_join(spark, tables):
    from dataqtor_spark.operators import skew as SK

    ev = tables["events"].select("event_id", "user_id", "value")
    cust = tables["customer"].select("c_custkey", "c_mktsegment")
    plain = ev.join(cust, ev["user_id"] == cust["c_custkey"])
    salted = SK.salted_join(ev, cust, "user_id", "c_custkey", n_salt=4)
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0


# --- HLL sketches ----------------------------------------------------------

def test_hll_rollup_merge_is_exact_and_estimate_close(spark, tables):
    from dataqtor_spark.operators import profile as P

    ev = tables["events"].withColumn("day", F.to_date("ts"))
    daily = P.hll_sketches(ev, ["day"], "user_id", lgk=12)
    merged = P.hll_rollup_estimate(daily).collect()[0]["approx_distinct"]
    # register-wise max-merge: union of per-day sketches == sketch of union
    direct = (ev.agg(F.hll_sketch_estimate(
        F.hll_sketch_agg("user_id", F.lit(12))).alias("e"))
        .collect()[0]["e"])
    assert merged == direct
    exact = ev.select("user_id").distinct().count()
    assert abs(merged - exact) / exact < 0.05


# --- compaction ------------------------------------------------------------

def test_compaction_reduces_files_and_preserves_rows(spark, tables, tmp_path):
    from dataqtor_spark.session import compact_dataset

    p = str(tmp_path / "frag")
    tables["lineitem"].repartition(64).write.parquet(p)
    before = sum(1 for f in __import__("os").listdir(p)
                 if f.endswith(".parquet"))
    assert before == 64
    n_rows = tables["lineitem"].count()
    after = compact_dataset(spark, p, target_file_bytes=64 * 1024 * 1024)
    assert after < before
    assert spark.read.parquet(p).count() == n_rows


# --- Z-order ---------------------------------------------------------------

def test_zorder_prunes_files_on_both_dimensions(spark, tables, tmp_path):
    from dataqtor_spark.operators import layout as L

    ev = tables["events"].select("event_id", "user_id", "value")
    zp = str(tmp_path / "zorder")
    lp = str(tmp_path / "linear")
    L.write_zordered(ev, zp, ["user_id", "value"], n_files=16, bits=4)
    # baseline: clustered on value only
    (ev.repartitionByRange(16, "value").sortWithinPartitions("value")
     .write.mode("overwrite").parquet(lp))

    uids = [r[0] for r in ev.select("user_id").distinct().limit(50).collect()]
    mid_uid = sorted(uids)[len(uids) // 2]
    z_uid = L.file_overlap_fraction(zp, "user_id", mid_uid, mid_uid)
    lin_uid = L.file_overlap_fraction(lp, "user_id", mid_uid, mid_uid)
    # point lookup on user_id: z-order must beat the value-sorted layout,
    # which has no user_id locality at all
    assert z_uid < 1.0
    assert lin_uid == 1.0 or z_uid < lin_uid

    lo, hi = 10.0, 11.0
    z_val = L.file_overlap_fraction(zp, "value", lo, hi)
    assert z_val < 1.0  # still prunes on the second dimension too


def test_read_pruned_equals_full_filter(spark, tables, tmp_path):
    from dataqtor_spark.operators import layout as L

    ev = tables["events"].select("event_id", "user_id", "value")
    zp = str(tmp_path / "zorder2")
    L.write_zordered(ev, zp, ["user_id", "value"], n_files=16, bits=4)
    lo, hi = 200.0, 400.0
    want = spark.read.parquet(zp).filter(
        F.col("value").between(lo, hi))
    got = L.read_pruned(spark, zp, "value", lo, hi)
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    # and it actually skipped files
    assert len(got.inputFiles()) < len(want.inputFiles())


# --- DataSketches: theta set algebra, KLL quantile rollup ------------------

def test_theta_overlap_exact_below_capacity(spark):
    from dataqtor_spark.operators import sketches as SK

    rows = ([("a", i) for i in range(100)]          # keys 0..99
            + [("b", i) for i in range(50, 130)])   # keys 50..129
    df = spark.createDataFrame(rows, "seg string, k int")
    r = SK.theta_overlap(df, "seg", "k", "a", "b").collect()[0]
    assert (r["distinct_a"], r["distinct_b"]) == (100, 80)
    assert r["n_overlap"] == 50 and r["n_union"] == 130
    assert r["jaccard"] == pytest.approx(50 / 130, abs=1e-6)


def test_theta_segment_matrix_matches_exact(spark):
    from dataqtor_spark.operators import sketches as SK

    rows = [(f"s{i % 3}", i % 40) for i in range(600)]
    df = spark.createDataFrame(rows, "seg string, k int")
    got = {(r["segment_a"], r["segment_b"]): r["n_overlap"]
           for r in SK.theta_segment_matrix(df, "seg", "k").collect()}
    import itertools
    segs = {f"s{i}" for i in range(3)}
    exact = {}
    for a, b in itertools.combinations(sorted(segs), 2):
        ka = {k for s, k in rows if s == a}
        kb = {k for s, k in rows if s == b}
        exact[(a, b)] = len(ka & kb)
    assert got == exact


def test_kll_rollup_equals_percentile_disc(spark, tables):
    from dataqtor_spark.operators import sketches as SK

    li = tables["lineitem"]
    out = SK.kll_quantile_rollup(li, "l_quantity", "l_returnflag",
                                 quantiles=(0.5, 0.9)).collect()
    got = {(r["group"], r["q"]): r["value"] for r in out}
    exact = li.groupBy("l_returnflag").agg(
        F.expr("percentile_disc(0.5) within group "
               "(order by cast(l_quantity as double))").alias("q50"),
        F.expr("percentile_disc(0.9) within group "
               "(order by cast(l_quantity as double))").alias("q90")).collect()
    for r in exact:
        assert got[(r["l_returnflag"], 0.5)] == r["q50"]
        assert got[(r["l_returnflag"], 0.9)] == r["q90"]
    g = li.agg(F.expr("percentile_disc(0.9) within group "
                      "(order by cast(l_quantity as double))").alias("v"))
    assert got[("__all__", 0.9)] == g.collect()[0]["v"]


def test_theta_overlap_missing_segment_is_zero(spark):
    from dataqtor_spark.operators import sketches as SK

    df = spark.createDataFrame([("view", i) for i in range(20)],
                               "seg string, k int")
    r = SK.theta_overlap(df, "seg", "k", "view", "purchase").collect()[0]
    assert r["distinct_a"] == 20 and r["distinct_b"] == 0
    assert r["n_overlap"] == 0 and r["n_union"] == 20
    assert r["jaccard"] == 0.0
    # both segments absent
    r2 = SK.theta_overlap(df, "seg", "k", "x", "y").collect()[0]
    assert (r2["n_overlap"], r2["n_union"], r2["jaccard"]) == (0, 0, 0.0)


def test_skew_guard_engages_on_planted_hot_key(spark):
    """A planted 90%-hot key must flip join_with_skew_guard onto the
    salted plan (salt column visible in the physical plan, dim side
    replicated); values stay identical to the plain join."""
    from dataqtor_spark.operators import skew as SK

    # 90% of fact rows share key 7; dim has keys 0..49
    fact = spark.range(0, 2000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 10 < 9, F.lit(7))
        .otherwise(F.col("id") % 50).alias("k"),
        (F.col("id") * 3 % 101).alias("v"))
    dim = spark.range(0, 50).select(F.col("id").alias("dk"),
                                    F.concat(F.lit("d"), F.col("id"))
                                    .alias("label"))
    key, share = SK.hot_key_share(fact, "k", support=0.5)
    assert key == 7 and share > 0.85
    guarded = SK.join_with_skew_guard(fact, dim, "k", "dk",
                                      n_salt=4, salt_threshold=0.5)
    plan = guarded._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan, "salted plan did not engage"
    plain = fact.join(dim, fact["k"] == dim["dk"])
    assert guarded.count() == plain.count() == 2000
    assert guarded.exceptAll(plain).count() == 0
    # uniform keys: guard measures, stays on the plain join
    uni = spark.range(0, 2000).select((F.col("id") % 50).alias("k"),
                                      F.col("id").alias("row_id"))
    key_u, share_u = SK.hot_key_share(uni, "k", support=0.5)
    assert share_u < 0.5
    unguarded = SK.join_with_skew_guard(uni, dim, "k", "dk",
                                        n_salt=4, salt_threshold=0.5)
    uplan = unguarded._jdf.queryExecution().executedPlan().toString()
    assert "__salt" not in uplan
    assert unguarded.count() == 2000


def test_skew_guard_same_key_name_schema_stable(spark):
    """When fact and dim share the key NAME, engaging the guard must not
    change the output schema: the plain path is a USING join (one merged
    key column) and the salted path must match it — downstream code
    can't depend on runtime data distribution."""
    from dataqtor_spark.operators import skew as SK

    fact = spark.range(0, 1000).select(
        F.when(F.col("id") % 10 < 9, F.lit(3))
        .otherwise(F.col("id") % 20).alias("k"),
        F.col("id").alias("row_id"))
    dim = spark.range(0, 20).select(
        F.col("id").alias("k"),
        F.concat(F.lit("d"), F.col("id")).alias("label"))
    plain = SK.join_with_skew_guard(fact, dim, "k", "k", n_salt=4,
                                    salt_threshold=None)
    salted = SK.join_with_skew_guard(fact, dim, "k", "k", n_salt=4,
                                     salt_threshold=0.5)
    assert "__salt" in salted._jdf.queryExecution().executedPlan().toString()
    assert salted.columns == plain.columns == ["k", "row_id", "label"]
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_hot_key_share_detects_null_majority(spark):
    """A 90%-NULL key column must register as hot: freqItems can't see
    NULL and `==` comparisons return NULL, but null fact keys in a
    left join still all shuffle to one reducer."""
    from dataqtor_spark.operators import skew as SK

    fact = spark.range(0, 1000).select(
        F.when(F.col("id") % 10 < 9, F.lit(None).cast("long"))
        .otherwise(F.col("id") % 20).alias("k"),
        F.col("id").alias("row_id"))
    key, share = SK.hot_key_share(fact, "k", support=0.5)
    assert key is None and share > 0.85
    # and the guard engages on it
    dim = spark.range(0, 20).select(F.col("id").alias("dk"),
                                    F.lit("x").alias("label"))
    guarded = SK.join_with_skew_guard(fact, dim, "k", "dk", n_salt=4,
                                      salt_threshold=0.5, how="left")
    assert "__salt" in guarded._jdf.queryExecution().executedPlan().toString()
    plain = fact.join(dim, fact["k"] == dim["dk"], "left")
    assert guarded.count() == plain.count() == 1000
    assert guarded.exceptAll(plain).count() == 0


def test_hilbert_index_is_bijective_and_continuous(spark):
    """The two properties that make Hilbert clustering worth its extra
    arithmetic over Morton: every grid cell gets a unique curve position
    (bijection onto [0, 4^bits)) and consecutive positions are always
    grid-ADJACENT (continuity) — the claim behind tighter segment
    bounding boxes."""
    from dataqtor_spark.operators.layout import with_hilbert

    n = 16  # bits=4
    grid = spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)], "x long, y long")
    got = {r["hvalue"]: (r["x"], r["y"])
           for r in with_hilbert(grid, "x", "y", bits=4).collect()}
    assert sorted(got) == list(range(n * n))          # bijection
    for d in range(n * n - 1):                        # continuity
        (x1, y1), (x2, y2) = got[d], got[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1


def test_hilbert_matches_reference_xy2d(spark):
    from dataqtor_spark.operators.layout import with_hilbert

    def xy2d(order, x, y):  # canonical per-bit fold (Wikipedia form)
        d, s = 0, 1 << (order - 1)
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = s - 1 - x, s - 1 - y
                x, y = y, x
            s //= 2
        return d

    pts = [(x * 37 % 64, (x * 11 + 5) % 64) for x in range(200)]
    df = spark.createDataFrame(pts, "x long, y long")
    for r in with_hilbert(df, "x", "y", bits=6).collect():
        assert r["hvalue"] == xy2d(6, r["x"], r["y"])


def test_hilbert_segments_tighter_than_zorder(spark, tmp_path):
    """Equal-size curve segments: Hilbert's per-segment bounding boxes
    must not be looser than Morton's on average (continuity argument) —
    measured exactly the way hilbert01/zorder01 audit layouts."""
    from dataqtor_spark.operators.layout import with_hilbert, zvalue_expr

    rows = [((i * 73 + 11) % 256, (i * 149 + 7) % 256) for i in range(4096)]
    df = spark.createDataFrame(rows, "x long, y long")

    def avg_span(frame):
        agg = (frame.groupBy("seg")
               .agg((F.max("x") - F.min("x") + F.max("y") - F.min("y"))
                    .alias("span"))
               .agg(F.avg("span").alias("a")).collect())
        return agg[0]["a"]

    hil = avg_span(with_hilbert(df, "x", "y", bits=8)
                   .withColumn("seg", F.shiftright(F.col("hvalue"), 8)))
    zor = avg_span(df.withColumn(
        "seg", F.shiftright(zvalue_expr([F.col("x"), F.col("y")],
                                        bits=8), 8)))
    assert hil <= zor


def test_write_hilbert_ordered_prunes_both_dims(spark, tmp_path):
    from dataqtor_spark.operators.layout import (file_overlap_fraction,
                                                 write_hilbert_ordered)

    rows = [((i * 37) % 256, (i * 91 + 3) % 256, i) for i in range(20000)]
    df = spark.createDataFrame(rows, "x long, y long, v long")
    path = str(tmp_path / "hilbert_parquet")
    write_hilbert_ordered(df, path, "x", "y", n_files=16, bits=8)
    back = spark.read.parquet(path)
    assert back.count() == 20000
    assert back.agg(F.sum("v")).collect()[0][0] == sum(r[2] for r in rows)
    # a narrow predicate on EITHER clustered dimension opens few files
    assert file_overlap_fraction(path, "x", 0, 31) < 0.7
    assert file_overlap_fraction(path, "y", 0, 31) < 0.7


def test_scd2_with_deletes_hand_sequence(spark):
    """Tombstone semantics: a delete closes the open interval at the
    delete ts without opening a new one; a later change re-opens the
    key; repeated values across a delete form distinct runs; deletes of
    unknown keys are no-ops; genuinely-NULL attribute values are NOT
    mistaken for deletion."""
    import datetime as dt

    from dataqtor_spark.operators import scd as SCD

    t = lambda d: dt.datetime(2024, 1, d)
    ch = spark.createDataFrame(
        [(1, "A", t(1), 10), (1, "A", t(5), 50),   # same value re-set
         (1, "B", t(9), 90),                        # re-open after delete
         (2, "X", t(2), 20),
         (3, None, t(1), 11)],                      # NULL attr, real row
        "user_id long, v string, ts timestamp, event_id long")
    de = spark.createDataFrame(
        [(1, t(3), 30),      # closes user 1's A run at day 3
         (2, t(6), 60),      # closes user 2 for good
         (9, t(4), 40)],     # unknown key: no-op
        "user_id long, ts timestamp, event_id long")
    got = sorted(
        (r["user_id"], r["v"], r["valid_from"].day,
         r["valid_to"].day if r["valid_to"] else None, r["is_current"])
        for r in SCD.scd2_with_deletes(ch, de, "user_id", "ts", ["v"],
                                       tiebreak_col="event_id").collect())
    assert got == [
        (1, "A", 1, 3, False),    # closed BY the tombstone
        (1, "A", 5, 9, False),    # re-set after delete = new run
        (1, "B", 9, None, True),
        (2, "X", 2, 6, False),    # deleted, never re-opened
        (3, None, 1, None, True), # NULL attr is a value, not a delete
    ], got
