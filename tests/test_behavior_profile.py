"""Tests for behavioral analytics and the round-2 profiling additions."""

import pytest
from pyspark.sql import functions as F

from dataqtor_spark.operators import behavior as B
from dataqtor_spark.operators import profile as P


def test_funnel_monotone_and_bounded(tables):
    out = B.funnel(tables["events"], ["view", "click", "purchase"]).collect()
    rows = sorted(out, key=lambda r: r.step_idx)
    assert [r.step for r in rows] == ["view", "click", "purchase"]
    counts = [r.n_users for r in rows]
    assert counts == sorted(counts, reverse=True)  # stages only shrink
    assert rows[0].pct_of_first == 100.0
    assert all(0 <= r.pct_of_first <= 100 for r in rows)


def test_funnel_order_matters(spark):
    df = spark.createDataFrame(
        [(1, 1, "b"), (1, 2, "a"),     # b before a: no a->b conversion
         (2, 1, "a"), (2, 2, "b")],    # a then b: converts
        "user_id long, event_id long, event_type string",
    ).withColumn("ts", F.timestamp_micros(F.col("event_id") * 1_000_000))
    out = {r.step: r.n_users for r in B.funnel(df, ["a", "b"]).collect()}
    assert out == {"a": 2, "b": 1}


def test_cohort_retention_offsets(tables):
    out = B.cohort_retention(tables["events"])
    rows = out.collect()
    assert all(r.week_offset >= 0 for r in rows)
    # offset-0 users == all users whose first event is in that cohort week
    total_users = tables["events"].select("user_id").distinct().count()
    offset0 = sum(r.n_users for r in rows if r.week_offset == 0)
    assert offset0 == total_users


def test_event_transitions_shares(tables):
    out = B.event_transitions(tables["events"])
    shares = (out.groupBy("src").agg(F.round(F.sum("share"), 4).alias("s"))
              .collect())
    for r in shares:
        assert abs(r.s - 1.0) < 1e-3
    n_total = out.agg(F.sum("n")).collect()[0][0]
    n_events = tables["events"].count()
    n_users = tables["events"].select("user_id").distinct().count()
    assert n_total == n_events - n_users  # each user loses exactly one lead


def test_functional_dependency_exact_and_approx(tables):
    out = {(r.determinant, r.dependent): r for r in P.functional_dependency(
        tables["orders"],
        [("o_orderkey", "o_orderstatus"), ("o_orderstatus", "o_orderpriority")],
    ).collect()}
    key_fd = out[("o_orderkey", "o_orderstatus")]
    assert key_fd.violating_groups == 0          # key determines everything
    assert key_fd.fd_strength_pct == 100.0
    weak = out[("o_orderstatus", "o_orderpriority")]
    assert weak.violating_groups > 0
    assert weak.fd_strength_pct < 100.0


def test_uniqueness_profile_flags(tables):
    out = {r.column_set: r for r in P.uniqueness_profile(
        tables["orders"], ["o_orderkey", "o_orderstatus"],
        pairs=[("o_orderkey", "o_custkey")]).collect()}
    assert out["o_orderkey"].is_unique_key
    assert out["o_orderkey"].distinct_pct == 100.0
    assert not out["o_orderstatus"].is_unique_key
    assert out["o_orderkey+o_custkey"].is_unique_key  # superkey of a key


def test_benford_profile(tables):
    rows = P.benford_profile(tables["lineitem"], "l_extendedprice").collect()
    digits = sorted(r.digit for r in rows)
    assert digits == list(range(1, 10)) or set(digits) <= set(range(1, 10))
    assert abs(sum(r.observed for r in rows) - 1.0) < 1e-3
    for r in rows:
        assert abs(r.expected - __import__("math").log10(1 + 1 / r.digit)) < 1e-5


def test_key_skew_profile(tables):
    r = P.key_skew_profile(tables["events"], "user_id").collect()[0]
    assert r.n_rows == tables["events"].filter(F.col("user_id").isNotNull()).count()
    assert 0 <= r.gini < 1
    assert 0 < r.top1_share <= 1
    assert r.max_per_key * r.n_keys >= r.n_rows


def test_key_skew_uniform_vs_skewed(spark):
    uniform = spark.range(100).select((F.col("id") % 10).alias("k"))
    skewed = spark.createDataFrame(
        [(0,)] * 91 + [(i,) for i in range(1, 10)], "k long")
    gu = P.key_skew_profile(uniform, "k").collect()[0].gini
    gs = P.key_skew_profile(skewed, "k").collect()[0].gini
    assert gu < 0.01          # perfectly uniform
    assert gs > 0.7           # one dominant key
    assert P.key_skew_profile(skewed, "k").collect()[0].top1_share == 0.91


def test_mad_outliers_robust(spark):
    # 97 inliers + 3 wild points: MAD flags exactly the wild ones
    data = [(float(i % 10),) for i in range(97)] + [(1e6,), (-1e6,), (5e5,)]
    df = spark.createDataFrame(data, "x double")
    r = P.mad_outliers(df, "x").collect()[0]
    assert r.n == 100 and r.n_outliers == 3
    assert r.median == pytest.approx(4.0, abs=1.0)


def test_interarrival_stats(tables):
    rows = B.interarrival_stats(tables["events"]).collect()
    assert {r.etype for r in rows} <= {"view", "click", "purchase",
                                       "signup", "error"}
    for r in rows:
        assert r.avg_gap_s > 0 and r.p50_gap_s > 0
        assert r.max_gap_s >= r.p50_gap_s


def test_variant_extraction_matches_string_path(tables):
    from pyspark.sql import functions as FF
    ev = tables["events"]
    a = (ev.select(FF.get_json_object("props", "$.k").cast("int").alias("k"))
         .agg(FF.sum("k")).collect()[0][0])
    b = (ev.withColumn("v", FF.parse_json("props"))
         .select(FF.try_variant_get("v", "$.k", "int").alias("k"))
         .agg(FF.sum("k")).collect()[0][0])
    assert a == b


def test_entropy_mi_identities(spark):
    from pyspark.sql import functions as F

    from dataqtor_spark.operators import profile as P

    # X uniform over 4 values; Y == X  =>  H(X)=H(Y)=I(X;Y)=ln 4
    df = spark.range(4000).select(
        (F.col("id") % 4).cast("string").alias("x"))
    df = df.withColumn("y", F.col("x"))
    r = P.entropy_mi(df, "x", "y").collect()[0]
    import math
    assert abs(r["entropy_a"] - math.log(4)) < 1e-6
    assert abs(r["mutual_information"] - math.log(4)) < 1e-6

    # independent: id%4 and (id//4)%3 are exactly independent on 0..4799
    ind = spark.range(4800).select(
        (F.col("id") % 4).cast("string").alias("x"),
        ((F.col("id") / 4).cast("long") % 3).cast("string").alias("y"))
    r2 = P.entropy_mi(ind, "x", "y").collect()[0]
    assert abs(r2["mutual_information"]) < 1e-9


def test_pagerank_mass_and_uniform_cycle(spark):
    from pyspark.sql import functions as F

    from dataqtor_spark.operators import behavior as B

    # 4-cycle: symmetric, every node same rank 0.25; total mass 1
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0)], "src long, dst long")
    got = B.pagerank(edges, n_iter=15).collect()
    assert len(got) == 4
    for r in got:
        assert abs(r["rank"] - 0.25) < 1e-6
    assert abs(sum(r["rank"] for r in got) - 1.0) < 1e-5


def test_autocorrelation_detects_period(spark):
    import datetime as dt

    from dataqtor_spark.operators import behavior as B

    # hourly counts with an exact period-3 pattern: lag-3 autocorr = 1
    base = dt.datetime(2024, 1, 1)
    rows = []
    for h in range(90):
        n = [1, 5, 9][h % 3]
        rows += [(base + dt.timedelta(hours=h),)] * n
    df = spark.createDataFrame(rows, "ts timestamp")
    got = {r["lag"]: r for r in B.autocorrelation(
        df, "ts", lags=(1, 3)).collect()}
    assert got[3]["autocorr"] == 1.0
    assert got[3]["n_pairs"] == 87
    assert got[1]["autocorr"] < 0.0   # adjacent buckets anti-correlated


def test_cusum_finds_planted_level_shift(spark):
    import datetime as dt

    from dataqtor_spark.operators import behavior as B

    # 40 hours at rate 2, then 40 hours at rate 8: CUSUM peaks at the
    # last low bucket (hour 39)
    base = dt.datetime(2024, 1, 1)
    rows = []
    for h in range(80):
        rows += [(base + dt.timedelta(hours=h),)] * (2 if h < 40 else 8)
    df = spark.createDataFrame(rows, "ts timestamp")
    r = B.cusum_changepoint(df, "ts").collect()[0]
    assert r["changepoint_ts"] == base + dt.timedelta(hours=39)
    assert r["mean_before"] == 2.0
    assert r["mean_after"] == 8.0
    assert r["n_buckets"] == 80
    # |cusum| at the shift = 40 * (2 - 5) = 120
    assert r["max_abs_cusum"] == 120.0


def test_cross_correlation_detects_lead(spark):
    import datetime as dt

    from dataqtor_spark.operators import behavior as B

    # B is A shifted one hour later (A leads B by 1): xcorr peaks at lag 1
    base = dt.datetime(2024, 1, 1)
    rows = []
    for h in range(60):
        na = [1, 4, 9][h % 3]
        rows += [(base + dt.timedelta(hours=h), "a")] * na
        nb = [1, 4, 9][(h - 1) % 3]
        rows += [(base + dt.timedelta(hours=h), "b")] * nb
    df = spark.createDataFrame(rows, "ts timestamp, event_type string")
    got = {r["lag"]: r["xcorr"] for r in B.cross_correlation(
        df, "event_type", "a", "b", "ts", lags=(-1, 0, 1)).collect()}
    assert got[1] == 1.0          # A(t) == B(t+1)
    assert got[0] < 1.0 and got[-1] < 1.0


def test_bucketed_series_zero_fills_outage_gaps(spark):
    import datetime as dt

    from dataqtor_spark.operators import behavior as B

    # 10 busy hours, a 5-hour total outage, 10 busy hours: the outage
    # must appear as five 0-count buckets (not absent rows), so CUSUM
    # sees the dip and lag really means wall-clock hours
    base = dt.datetime(2024, 1, 1)
    rows = []
    for h in list(range(10)) + list(range(15, 25)):
        rows += [(base + dt.timedelta(hours=h),)] * 6
    df = spark.createDataFrame(rows, "ts timestamp")
    series = B._bucketed_series(
        df, "ts", "hour", {"__v": F.count(F.lit(1)).cast("double")})
    got = {r["__b"]: r["__v"] for r in series.collect()}
    assert len(got) == 25                       # dense grid, no holes
    for h in range(10, 15):
        assert got[base + dt.timedelta(hours=h)] == 0.0
    r = B.cusum_changepoint(df, "ts").collect()[0]
    assert r["n_buckets"] == 25                 # outage buckets counted


def test_bucketed_series_grid_survives_dst_session_timezone(spark):
    import datetime as dt

    from dataqtor_spark.operators import behavior as B

    # Under a DST timezone, date_trunc('day') buckets are 23/25 hours
    # wide around transitions and would fall off the regular-µs grid
    # (silently dropped by the grid left-join).  The integer-µs
    # truncation must keep every day on the grid regardless of session
    # zone.  2024-03-10 is the US spring-forward date.
    base = dt.datetime(2024, 3, 8, 12)
    rows = [(base + dt.timedelta(days=d),) for d in range(6) for _ in range(3)]
    df = spark.createDataFrame(rows, "ts timestamp")
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        series = B._bucketed_series(
            df, "ts", "day", {"__v": F.count(F.lit(1)).cast("double")})
        got = series.collect()
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert len(got) == 6                        # dense grid, no holes
    assert sum(r["__v"] for r in got) == 18.0   # no rows dropped


def test_bucketed_series_week_starts_monday(spark):
    import datetime as dt

    from dataqtor_spark.operators import behavior as B

    # integer-µs week truncation must match date_trunc('week') semantics:
    # buckets start on Monday (2024-01-01 is a Monday)
    rows = [(dt.datetime(2024, 1, 3),), (dt.datetime(2024, 1, 8),),
            (dt.datetime(2024, 1, 14),)]
    df = spark.createDataFrame(rows, "ts timestamp")
    series = B._bucketed_series(
        df, "ts", "week", {"__v": F.count(F.lit(1)).cast("double")})
    got = sorted(r["__b"] for r in series.collect())
    assert got[0] == dt.datetime(2024, 1, 1)
    assert got[-1] == dt.datetime(2024, 1, 8)
    assert len(got) == 2


def test_seasonal_decompose_recovers_planted_cycle(spark):
    import datetime as dt

    from dataqtor_spark.operators import behavior as B

    # 14 days of hourly events: rate = 5 + 4·[hour in 9..16] (a daytime
    # plateau) — the seasonal profile must peak in work hours and the
    # remainder must be near zero once trend+seasonal explain the series
    base = dt.datetime(2024, 1, 1)
    rows = []
    for h in range(14 * 24):
        t = base + dt.timedelta(hours=h)
        n = 9 if 9 <= t.hour <= 16 else 5
        rows += [(t,)] * n
    df = spark.createDataFrame(rows, "ts timestamp")
    out = B.seasonal_decompose(df, "ts", bucket="hour", period=24,
                               trend_window=24).collect()
    assert len(out) == 14 * 24
    by_phase = {}
    for r in out:
        by_phase.setdefault(r["bucket"].hour, []).append(r["seasonal"])
    day = sum(by_phase[h][0] for h in range(9, 17)) / 8
    night = sum(by_phase[h][0] for h in list(range(0, 9)) + [17, 23]) / 11
    assert day - night > 3.0            # plateau recovered (true gap = 4)
    # interior buckets (full MA frames): components explain the series
    interior = [r for r in out
                if dt.timedelta(days=1) <= r["bucket"] - base
                <= dt.timedelta(days=13)]
    assert all(abs(r["remainder"]) < 1.5 for r in interior)
    # no ordering window anywhere in the plan (explode + re-group trend)
    plan = B.seasonal_decompose(df, "ts")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "WindowExec" not in plan


def test_segmented_prefix_sum_matches_naive(spark):
    from dataqtor_spark.operators import behavior as B

    vals = [float((i * 37) % 11) for i in range(1, 101)]
    df = spark.createDataFrame(
        [(i, vals[i - 1]) for i in range(1, 101)], "__idx long, v double")
    got = {r["__idx"]: r["p"]
           for r in B._segmented_prefix_sum(df, "__idx", "v", "p",
                                            segment_rows=8).collect()}
    acc = 0.0
    for i in range(1, 101):
        acc += vals[i - 1]
        assert got[i] == acc            # exact: small integers in doubles


def test_ts_screens_match_global_window_reference(spark):
    # minute grain, irregular arrivals with holes: the shift-join and
    # segmented-prefix forms must reproduce the single-partition global-
    # window formulation they replaced
    import datetime as dt
    import random

    from pyspark.sql import Window

    from dataqtor_spark.operators import behavior as B

    random.seed(5)
    base = dt.datetime(2024, 3, 1)
    rows = []
    for m in range(500):
        if random.random() < 0.7:
            rows += [(base + dt.timedelta(minutes=m),)] * random.randint(1, 5)
    df = spark.createDataFrame(rows, "ts timestamp")
    series = B._bucketed_series(
        df, "ts", "minute", {"__v": F.count(F.lit(1)).cast("double")})

    lags = (1, 7, 60, 9999)             # 9999 > grid: null/0 row expected
    w = Window.orderBy("__b")
    lagged = series.select(
        "__v", *[F.lag("__v", k).over(w).alias(f"l{k}") for k in lags])
    ref = lagged.agg(*[f for k in lags for f in (
        F.round(F.corr("__v", f"l{k}"), 4).alias(f"c{k}"),
        F.count(f"l{k}").alias(f"n{k}"))]).collect()[0]
    got = {r["lag"]: r for r in B.autocorrelation(
        df, "ts", lags=lags, bucket="minute").collect()}
    for k in lags:
        assert got[k]["n_pairs"] == ref[f"n{k}"]
        if ref[f"c{k}"] is None:
            assert got[k]["autocorr"] is None
        else:
            assert got[k]["autocorr"] == pytest.approx(ref[f"c{k}"],
                                                       abs=2e-4)

    mean_row = series.agg(F.avg("__v").alias("__m"),
                          F.count(F.lit(1)).alias("__n"))
    wc = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, 0)
    wa = Window.orderBy("__b").rowsBetween(1, Window.unboundedFollowing)
    ref_cp = (series.crossJoin(F.broadcast(mean_row))
              .select("__b", "__n",
                      F.sum(F.col("__v") - F.col("__m")).over(wc)
                      .alias("cusum"),
                      F.avg("__v").over(wc).alias("mb"),
                      F.avg("__v").over(wa).alias("ma"))
              .orderBy(F.abs(F.col("cusum")).desc(), F.col("__b").asc())
              .limit(1).collect()[0])
    got_cp = B.cusum_changepoint(df, "ts", bucket="minute").collect()[0]
    assert got_cp["changepoint_ts"] == ref_cp["__b"]
    assert got_cp["max_abs_cusum"] == pytest.approx(
        abs(ref_cp["cusum"]), abs=2e-4)
    assert got_cp["mean_before"] == pytest.approx(ref_cp["mb"], abs=2e-4)
    assert got_cp["mean_after"] == pytest.approx(ref_cp["ma"], abs=2e-4)
    assert got_cp["n_buckets"] == ref_cp["__n"]


def test_ts_plans_free_of_single_partition_windows(spark):
    # the de-funnel contract: ts03/ts05 compile with NO window operator at
    # all; ts04's only windows are partitioned (the segmented prefix sum)
    import datetime as dt

    from dataqtor_spark.operators import behavior as B

    base = dt.datetime(2024, 1, 1)
    rows = [(base + dt.timedelta(minutes=m), ["a", "b"][m % 2])
            for m in range(200)]
    df = spark.createDataFrame(rows, "ts timestamp, event_type string")

    def plan(q):
        return q._jdf.queryExecution().executedPlan().toString()

    p_auto = plan(B.autocorrelation(df, "ts", lags=(1, 5), bucket="minute"))
    p_x = plan(B.cross_correlation(df, "event_type", "a", "b", "ts",
                                   lags=(-1, 0, 1), bucket="minute"))
    assert "Window" not in p_auto and "Window" not in p_x
    p_cusum = plan(B.cusum_changepoint(df, "ts", bucket="minute"))
    for line in p_cusum.splitlines():
        if "windowspecdefinition" in line:
            assert "__seg" in line      # partitioned by segment


def test_group_trend_recovers_planted_slope(spark):
    import datetime as dt

    rows = []
    for d in range(100):
        ts = dt.datetime(1995, 1, 1) + dt.timedelta(days=d)
        rows.append(("up", ts, 10.0 + 2.5 * d))     # slope 2.5/day, r2=1
        rows.append(("flat", ts, 7.0))              # slope 0
    df = spark.createDataFrame(rows, "g string, t timestamp, v double")
    got = {r["group"]: r for r in P.group_trend(
        df, "v", "t", "g").collect()}
    assert got["up"]["slope"] == 2.5 and got["up"]["r2"] == 1.0
    assert got["up"]["intercept"] == 10.0
    assert got["flat"]["slope"] == 0.0
    assert got["up"]["n"] == 100


def test_mahalanobis_flags_joint_outlier_only(spark):
    import random
    random.seed(3)
    # tight correlated cloud + one point whose coordinates are each
    # in-range but jointly off-model (x high with y low)
    rows = []
    for _ in range(500):
        x = random.gauss(0, 1)
        rows.append((x, 2 * x + random.gauss(0, 0.1)))
    rows.append((2.0, -4.0))   # per-column z-scores ~2: joint outlier
    df = spark.createDataFrame(rows, "x double, y double")
    r = P.mahalanobis_profile(df, "x", "y").collect()[0]
    assert r["n"] == 501
    assert r["n_outliers"] >= 1
    # the planted point dominates the max distance
    assert r["max_dist2"] > 100.0
    # degenerate: constant column -> det 0 -> zero outliers, not a crash
    c = spark.createDataFrame([(1.0, float(i)) for i in range(50)],
                              "x double, y double")
    rc = P.mahalanobis_profile(c, "x", "y").collect()[0]
    assert rc["n_outliers"] == 0 and rc["max_dist2"] == 0.0


def test_null_correlation_identities(spark):
    rows = []
    for i in range(400):
        a = None if i % 4 == 0 else 1.0
        b = None if i % 4 == 0 else 2.0        # b missing iff a missing
        c = None if i % 5 == 0 else "x"        # independent pattern
        rows.append((a, b, c))
    df = spark.createDataFrame(rows, "a double, b double, c string")
    got = {(r["col_a"], r["col_b"]): r["null_corr"]
           for r in P.null_correlation(df, ["a", "b", "c"]).collect()}
    assert got[("a", "b")] == 1.0              # identical missingness
    assert abs(got[("a", "c")]) < 0.01         # i%4 vs i%5: independent
    # never-null column: zero indicator variance -> NULL, not 0
    df2 = df.withColumn("d", F.lit(1.0))
    g2 = {(r["col_a"], r["col_b"]): r["null_corr"]
          for r in P.null_correlation(df2, ["a", "d"]).collect()}
    assert g2[("a", "d")] is None


def test_mahalanobis_collinear_pair_is_degenerate(spark):
    # exactly collinear: float det may land at a tiny positive value —
    # the relative guard must report zero outliers, not 1/eps garbage
    df = spark.createDataFrame([(float(i), 2.0 * float(i))
                                for i in range(200)], "x double, y double")
    r = P.mahalanobis_profile(df, "x", "y").collect()[0]
    assert r["n_outliers"] == 0 and r["max_dist2"] == 0.0


def test_null_correlation_edge_inputs(spark):
    df = spark.createDataFrame([(1.0, None, 2.0)],
                               "a double, a__b double, b double")
    # '__'-bearing column names must not collide in internal aliases
    out = P.null_correlation(df, ["a", "a__b", "b"]).collect()
    assert len(out) == 3
    # <2 columns: empty result with the contract schema, not a crash
    empty = P.null_correlation(df, ["a"])
    assert empty.columns == ["col_a", "col_b", "null_corr"]
    assert empty.count() == 0
