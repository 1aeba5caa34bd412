import pyspark.sql.functions as F
import pytest

from dataqtor_spark.operators import profile as P


def test_null_profile_shapes(tables):
    df = tables["customer"]
    res = P.null_profile(df).toPandas().set_index("column")
    n = df.count()
    assert set(res.index) == set(df.columns)
    assert (res["total_records"] == n).all()
    assert (res["null_records"] + res["filled_records"] == n).all()
    assert res["null_pct"].between(0, 100).all()


def test_null_profile_counts_nulls(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (None, None)], "x int, y string"
    )
    res = {r["column"]: r for r in P.null_profile(df).collect()}
    assert res["x"]["null_records"] == 1
    assert res["y"]["null_records"] == 2
    assert res["y"]["filled_records"] == 1


def test_describe_matches_pandas(tables):
    df = tables["lineitem"]
    res = P.describe_numeric(df, ["l_quantity"]).collect()[0]
    pdf = df.select("l_quantity").toPandas()["l_quantity"]
    assert res["count"] == pdf.count()
    assert res["mean"] == pytest.approx(pdf.mean())
    assert res["std"] == pytest.approx(pdf.std())
    assert res["min"] == pdf.min()
    assert res["max"] == pdf.max()
    assert res["median"] == pytest.approx(pdf.quantile(0.5))


def test_frequency_and_topk(tables):
    df = tables["customer"]
    freq = P.frequency(df, "c_mktsegment").toPandas()
    assert freq["count"].sum() == df.count()
    assert freq["pct"].sum() == pytest.approx(100.0, abs=0.01)
    top = P.top_k(df, "c_mktsegment", 2).toPandas()
    assert len(top) == 2
    assert top["count"].iloc[0] == freq["count"].max()


def test_sign_histogram(spark):
    df = spark.createDataFrame([(1.0,), (-2.0,), (0.0,), (3.0,), (None,)], "v double")
    r = P.sign_histogram(df, "v").collect()[0]
    assert (r["positive"], r["zero"], r["negative"]) == (2, 1, 1)


def test_pattern_profile(spark):
    df = spark.createDataFrame([("Ab1",), ("Şğü9",), ("x-2",)], "s string")
    pats = {r["pattern"] for r in P.pattern_profile(df, "s").collect()}
    assert pats == {"AA9", "AAA9", "A-9"}


def test_string_stats_deterministic_ties(spark):
    df = spark.createDataFrame([("bb",), ("aa",), ("cccc",)], "s string")
    r = P.string_stats(df, "s").collect()[0]
    assert r["min_length"] == 2 and r["max_length"] == 4
    assert r["shortest_value"] == "aa"  # tie broken lexicographically
    assert r["longest_value"] == "cccc"
    assert r["alpha_min"] == "aa" and r["alpha_max"] == "cccc"


def test_duplicate_rows(spark):
    df = spark.createDataFrame([(1, "a"), (1, "a"), (2, "b"), (1, "a")], "x int, y string")
    assert P.duplicate_row_count(df).collect()[0]["duplicate_rows"] == 2
    assert P.drop_duplicate_rows(df).count() == 2
    dups = P.duplicate_rows(df).collect()
    assert len(dups) == 1 and dups[0]["duplicate_count"] == 3


def test_null_majority_rows(spark):
    df = spark.createDataFrame(
        [(None, None, 1), (None, 2, 3), (1, 2, 3)], "a int, b int, c int"
    )
    assert P.null_majority_rows(df).count() == 1


def test_profile_columns(tables):
    df = tables["customer"]
    res = P.profile_columns(df, exact_distinct=True).toPandas().set_index("column")
    assert res.loc["c_custkey", "distinct_values"] == df.count()
    assert res.loc["c_mktsegment", "mean"] != res.loc["c_mktsegment", "mean"] or \
        res.loc["c_mktsegment", "mean"] is None  # NaN for nominal
    assert res.loc["c_acctbal", "negative_count"] >= 0


def test_histogram(tables):
    df = tables["customer"]
    h = P.histogram(df, "c_acctbal", bins=5).toPandas()
    assert h["count"].sum() == df.filter(F.col("c_acctbal").isNotNull()).count()
    assert len(h) <= 5


def test_correlations(tables):
    df = tables["lineitem"]
    c = P.correlations(df, ["l_quantity", "l_extendedprice", "l_discount"]).toPandas()
    assert len(c) == 3
    assert c["pearson"].abs().max() <= 1.0 + 1e-9


def test_approx_describe_close_to_exact(tables):
    li = tables["lineitem"]
    exact = P.describe_numeric(li, ["l_extendedprice"]).collect()[0]
    approx = P.describe_numeric_approx(li, ["l_extendedprice"]).collect()[0]
    assert approx["count"] == exact["count"]
    assert abs(approx["mean"] - exact["mean"]) / exact["mean"] < 0.01
    for q in ("q25", "median", "q75"):
        if q in exact.asDict() and exact[q] is not None:
            assert abs(approx[q] - exact[q]) / exact[q] < 0.05


def test_incremental_profile_merge_equals_direct(spark, tables):
    from dataqtor_spark.operators import profile as P

    ev = tables["events"]
    cols = ["user_id", "value", "props"]
    direct = {r["column"]: (r["total_records"], r["null_records"],
                            r["null_pct"])
              for r in P.null_profile(ev, cols).collect()}
    partials = P.null_profile_partials(
        ev.withColumn("day", F.to_date("ts")), "day", cols + ["day"])
    merged = {r["column"]: (r["total_records"], r["null_records"],
                            r["null_pct"])
              for r in P.merge_null_profiles(partials).collect()}
    assert merged == direct
    # incremental: merging yesterday's partials with today's only touches
    # the partials table — verify a two-batch split folds identically
    a = P.null_profile_partials(
        ev.filter(F.col("event_id") % 2 == 0).withColumn(
            "day", F.to_date("ts")), "day", cols + ["day"])
    b = P.null_profile_partials(
        ev.filter(F.col("event_id") % 2 == 1).withColumn(
            "day", F.to_date("ts")), "day", cols + ["day"])
    two = {r["column"]: (r["total_records"], r["null_records"], r["null_pct"])
           for r in P.merge_null_profiles(a.unionByName(b)).collect()}
    assert two == direct


def test_sentinel_profile_finds_fake_nulls(spark):
    from dataqtor_spark.operators import profile as P

    df = spark.createDataFrame(
        [("N/A",), ("x",), (" - ",), ("?",), (None,)], "v string")
    r = P.sentinel_profile(df, ["v"]).collect()[0]
    assert r["n_values"] == 4          # NULL excluded
    assert r["n_sentinels"] == 3       # N/A, -, ? (trimmed, case-folded)
    assert r["sentinel_pct"] == 75.0


def test_case_profile_buckets(spark):
    from dataqtor_spark.operators import profile as P

    df = spark.createDataFrame(
        [("HELLO",), ("hello",), ("Hello World",), ("hELLo",), ("123",)],
        "v string")
    r = P.case_profile(df, "v").collect()[0]
    assert r["n_values"] == 4          # digits-only excluded
    assert (r["n_upper"], r["n_lower"], r["n_title"], r["n_mixed"]) \
        == (1, 1, 1, 1)


def test_observed_null_metrics_no_extra_scan(spark, tables):
    from dataqtor_spark.operators import profile as P

    cust = tables["customer"]
    observed, obs = P.observed_null_metrics(cust, ["c_acctbal", "c_name"])
    n = observed.count()  # the caller's OWN action triggers the metrics
    got = obs.get
    assert got["total_records"] == n
    exact = {r["column"]: r["null_records"]
             for r in P.null_profile(cust, ["c_acctbal", "c_name"]).collect()}
    assert got["nulls_c_acctbal"] == exact["c_acctbal"]
    assert got["nulls_c_name"] == exact["c_name"]


def test_sampled_null_profile_within_bounds(spark, tables):
    from dataqtor_spark.operators import profile as P

    cust = tables["customer"]
    exact = {r["column"]: r["null_pct"]
             for r in P.null_profile(cust, ["c_acctbal"]).collect()}
    est = P.sampled_null_profile(cust, ["c_acctbal"], fraction=0.5).collect()[0]
    # the estimate must carry its uncertainty and bracket the truth
    # within ~3 half-widths (2 sigma stated, 3x slack for a small table)
    assert abs(est["est_null_pct"] - exact["c_acctbal"]) \
        <= max(3 * est["pct_half_width_2sigma"], 2.0)
    assert est["sampled_records"] < cust.count()


def test_partial_correlation_removes_shared_driver(spark):
    """x and y both driven by z plus independent noise: raw Pearson is
    strongly positive, but controlling for z the partial correlation
    collapses toward zero; against numpy's closed form it matches to
    the rounding the operator applies."""
    import numpy as np

    from dataqtor_spark.operators import profile as P

    rng = np.random.RandomState(7)
    z = rng.normal(0, 1, 4000)
    x = 2.0 * z + rng.normal(0, 1, 4000)
    y = -1.5 * z + rng.normal(0, 1, 4000)
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(x, y, z)],
        "x double, y double, z double")
    row = P.partial_correlations(df, [("x", "y")], "z").collect()[0]
    assert row["pearson"] < -0.5, "shared driver must dominate raw r"
    assert abs(row["partial_r"]) < 0.1, "control must remove it"
    rxy, rxz, ryz = (round(float(np.corrcoef(x, y)[0, 1]), 9),
                     round(float(np.corrcoef(x, z)[0, 1]), 9),
                     round(float(np.corrcoef(y, z)[0, 1]), 9))
    want = round((rxy - rxz * ryz)
                 / ((1 - rxz ** 2) * (1 - ryz ** 2)) ** 0.5, 6)
    assert abs(row["partial_r"] - want) < 2e-6, (row["partial_r"], want)
    # degenerate control: z vs z -> NULL, never a divide error
    row2 = P.partial_correlations(df, [("x", "z")], "z").collect()[0]
    assert row2["partial_r"] is None


def test_theils_u_asymmetry_and_bounds(spark):
    """A determines B exactly (B = A mod 2) while B only halves A's
    uncertainty: U(B|A) = 1, U(A|B) < 1; a constant column yields NULL
    (zero entropy), never a divide error."""
    from dataqtor_spark.operators import profile as P

    rows = [(str(i % 4), str(i % 2)) for i in range(400)]
    df = spark.createDataFrame(rows, "a string, b string")
    r = P.theils_u(df, "a", "b").collect()[0]
    assert r["u_b_given_a"] == 1.0          # A -> B deterministic
    assert 0.4 < r["u_a_given_b"] < 0.6     # B halves A's 2 bits
    const = spark.createDataFrame([("x", str(i % 2)) for i in range(10)],
                                  "a string, b string")
    r2 = P.theils_u(const, "a", "b").collect()[0]
    assert r2["u_a_given_b"] is None        # H(A) = 0


def test_json_key_type_profile_classification(spark):
    """Hand-built variant column: coverage and the regex type histogram
    classify int/float/bool/string exactly; absent keys count absent."""
    from dataqtor_spark.operators import profile as P

    rows = [('{"a": 1, "b": "x"}',),
            ('{"a": -2.5, "b": "true"}',),   # quoted "true" is a STRING
            ('{"a": true}',),
            ('{"b": "y"}',)]
    df = spark.createDataFrame(rows, "j string")
    got = {r["key"]: r for r in P.json_key_type_profile(
        df, "j", ["a", "b", "missing"]).collect()}
    a = got["a"]
    assert (a["n_present"], a["coverage"]) == (3, 0.75)
    assert (a["n_int"], a["n_float"], a["n_bool"], a["n_string"]) \
        == (1, 1, 1, 0)
    b = got["b"]
    # extraction strips quotes: "true" the string is indistinguishable
    # from true the bool in string form — classified bool (documented
    # regex-on-extracted-form semantics, identical on both engines)
    assert (b["n_present"], b["n_bool"], b["n_string"]) == (3, 1, 2)
    assert got["missing"]["n_present"] == 0
    assert got["missing"]["coverage"] == 0.0


def test_profile_drift_detects_planted_changes(spark):
    """Drift between two hand-built snapshots: a new null, a lost
    distinct value, and a mean shift all surface with exact values."""
    from dataqtor_spark.operators import profile as P

    a = spark.createDataFrame(
        [(1, "x", 10.0), (2, "y", 20.0), (3, "z", 30.0)],
        "id long, cat string, v double")
    b = spark.createDataFrame(
        [(4, "x", 40.0), (5, "x", None), (6, None, 50.0)],
        "id long, cat string, v double")
    out = {r["column"]: r for r in
           P.profile_drift(a, b, ["cat", "v"]).collect()}
    assert out["cat"]["distinct_a"] == 3 and out["cat"]["distinct_b"] == 1
    assert out["cat"]["distinct_delta"] == -2
    assert out["cat"]["null_rate_a"] == 0.0
    assert abs(out["cat"]["null_rate_b"] - 0.333333) < 1e-9
    assert out["v"]["mean_a"] == 20.0 and out["v"]["mean_b"] == 45.0
    assert out["v"]["total_delta"] == 0
