"""Sources/sinks (S1–S3), search engine (P3–P6), Spearman/histogram (§2.10)."""

import pyspark.sql.functions as F
import pytest

from dataqtor_spark import session as S
from dataqtor_spark.operators import profile as P
from dataqtor_spark.operators import repair as RP


# --- S1–S3: ingest with row identity, write, roundtrip ---------------------

def test_csv_roundtrip(spark, tables, tmp_path):
    src = tables["nation"]
    path = str(tmp_path / "nation_csv")
    S.write_dataset(src, path, fmt="csv", header=True)
    back = S.ingest(spark, path, fmt="csv", row_id_order=["n_nationkey"])
    assert back.count() == src.count()
    assert S.ROW_ID in back.columns
    ids = [r[0] for r in back.select(S.ROW_ID).orderBy(S.ROW_ID).collect()]
    assert ids == list(range(src.count()))


def test_parquet_roundtrip(spark, tables, tmp_path):
    src = tables["region"]
    path = str(tmp_path / "region_pq")
    S.write_dataset(src, path, fmt="parquet")
    back = S.ingest(spark, path)
    assert sorted(r["r_name"] for r in back.select("r_name").collect()) == \
           sorted(r["r_name"] for r in src.select("r_name").collect())


def test_orc_roundtrip(spark, tables, tmp_path):
    src = tables["region"]
    path = str(tmp_path / "region_orc")
    S.write_dataset(src, path, fmt="orc")
    back = S.ingest(spark, path, fmt="orc")
    assert sorted(r["r_name"] for r in back.select("r_name").collect()) == \
           sorted(r["r_name"] for r in src.select("r_name").collect())


def test_excel_roundtrip_or_gated(spark, tables, tmp_path):
    # xlsx is a driver-side pandas hop; openpyxl may be absent — gate, don't fail
    path = str(tmp_path / "t.xlsx")
    try:
        S.write_dataset(tables["region"].limit(3), path, fmt="excel")
        back = S.ingest(spark, path, fmt="excel")
    except ImportError:
        pytest.skip("no xlsx engine in this environment")
    assert back.count() == 3


# --- P3–P6: search engine --------------------------------------------------

def test_search_ops(spark):
    df = spark.createDataFrame(
        [(0, 5.0, "a"), (1, 15.0, "b"), (2, None, None)],
        "__row_id long, v double, s string")
    assert RP.search(df, "v", ">=", 10.0).count() == 1
    assert RP.search(df, "v", "<", 10.0).count() == 1
    assert RP.search(df, "v", "between", low=0, high=20).count() == 2
    assert RP.search(df, "s", "==", "a").count() == 1
    assert RP.search(df, "s", "isnull").count() == 1
    assert RP.search(df, "__row_id", "row_id", 2).count() == 1


def test_null_majority_rows(spark):
    df = spark.createDataFrame(
        [(1, None, None, None), (2, "x", None, "y"), (3, "x", "y", "z")],
        "id int, a string, b string, c string")
    # >2 of 4 cells null → only row 1 (3 nulls)
    rows = P.null_majority_rows(df).collect()
    assert [r["id"] for r in rows] == [1]


# --- §2.10: spearman + histogram -------------------------------------------

def test_spearman_matches_pandas(tables):
    cols = ["l_quantity", "l_discount"]
    got = P.spearman_correlations(tables["lineitem"], cols).collect()[0]
    pdf = tables["lineitem"].select(*cols).toPandas()
    want = pdf.corr(method="spearman").iloc[0, 1]
    assert got["spearman"] == pytest.approx(want, abs=1e-4)


def test_spearman_monotone_is_one(spark):
    df = spark.createDataFrame([(i, i * i) for i in range(50)], "x int, y long")
    got = P.spearman_correlations(df, ["x", "y"]).collect()[0]
    assert got["spearman"] == pytest.approx(1.0)


def test_kendall_tau_no_ties_known(spark):
    # x=[1,2,3,4], y=[1,3,2,4]: C=5, D=1, no ties -> tau = 4/6
    df = spark.createDataFrame(
        [(1, 1), (2, 3), (3, 2), (4, 4)], "x int, y int")
    r = P.kendall_tau(df, "x", "y").collect()[0]
    assert r["n"] == 4
    assert r["concordant"] == 5.0 and r["discordant"] == 1.0
    assert r["kendall_tau"] == pytest.approx(4 / 6, abs=1e-6)


def test_kendall_tau_b_tie_correction(spark):
    # x=[1,1,2,3], y=[1,2,2,3]: C=4, D=0, one x-tie pair, one y-tie pair
    # -> tau_b = 4 / sqrt((6-1)(6-1)) = 0.8
    df = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 2), (3, 3)], "x int, y int")
    r = P.kendall_tau(df, "x", "y").collect()[0]
    assert r["kendall_tau"] == pytest.approx(0.8, abs=1e-6)


def test_kendall_tau_monotone_is_one(spark):
    df = spark.createDataFrame([(i, i * i) for i in range(50)],
                               "x int, y long")
    r = P.kendall_tau(df, "x", "y").collect()[0]
    assert r["kendall_tau"] == pytest.approx(1.0)


def test_phik_functional_dependence_is_one(spark):
    df = spark.createDataFrame([(float(i % 23), float(i % 23))
                                for i in range(2000)], "x double, y double")
    r = P.phik_correlation(df, "x", "y").collect()[0]
    assert r["phik"] == pytest.approx(1.0)


def test_phik_independence_is_zero(spark):
    # full factorial 8x8 grid: exactly independent, chi2 = 0
    df = spark.createDataFrame([(float(i % 8), float((i // 8) % 8))
                                for i in range(6400)], "x double, y double")
    r = P.phik_correlation(df, "x", "y").collect()[0]
    assert r["phik"] == 0.0


def test_phik_recovers_gaussian_rho_and_symmetry(spark):
    # the paper's defining property: on binned bivariate-normal data,
    # phik estimates the generating rho
    import random
    random.seed(11)
    xs = [random.gauss(0, 1) for _ in range(4000)]
    rows = [(x, 0.6 * x + 0.8 * random.gauss(0, 1)) for x in xs]
    df = spark.createDataFrame(rows, "x double, y double")
    fwd = P.phik_correlation(df, "x", "y").collect()[0]
    rev = P.phik_correlation(df, "y", "x").collect()[0]
    assert fwd["phik"] == pytest.approx(0.6, abs=0.08)
    assert fwd["phik"] == rev["phik"]


def test_phik_statistics_known_contingency(spark):
    # 2 distinct values per axis, perfect dependence: chi2 = n exactly,
    # pedestal (r-1)(c-1) = 1, corrected = n - 1
    df = spark.createDataFrame([(float(i % 2), float(i % 2))
                                for i in range(400)], "x double, y double")
    r = P.phik_statistics(df, "x", "y").collect()[0]
    assert (r["n"], r["r_bins"], r["c_bins"]) == (400, 2, 2)
    assert r["chi2"] == pytest.approx(400.0)
    assert r["pedestal"] == 1.0
    assert r["chi2_corrected"] == pytest.approx(399.0)


def test_phik_statistics_independent_grid_chi2_zero(spark):
    df = spark.createDataFrame([(float(i % 8), float((i // 8) % 8))
                                for i in range(6400)], "x double, y double")
    r = P.phik_statistics(df, "x", "y").collect()[0]
    assert r["chi2"] == 0.0 and r["chi2_corrected"] == 0.0


def test_phik_statistics_zero_cells_counted(spark):
    # diagonal-only 3x3 table: 6 of 9 cells have obs=0 but expected>0;
    # chi2 = n*(min(r,c)-1) = 2n for a perfect 3x3 diagonal — only true
    # if the zero cells' (0-e)^2/e = e terms are included
    df = spark.createDataFrame([(float(i % 3), float(i % 3))
                                for i in range(900)], "x double, y double")
    r = P.phik_statistics(df, "x", "y").collect()[0]
    assert r["chi2"] == pytest.approx(1800.0)


def test_phik_date_column_and_bin_count_stability(spark):
    import datetime as dt
    # date axes convert via unix_date (a straight cast would throw)
    rows = [(dt.date(2020, 1, 1) + dt.timedelta(days=i % 50), float(i % 50))
            for i in range(1000)]
    df = spark.createDataFrame(rows, "d date, v double")
    assert P.phik_correlation(df, "d", "v").collect()[0]["phik"] == 1.0
    # n_bins > 10 must not scramble bin order (zero-padded labels)
    import random
    random.seed(5)
    g = [(x, 0.6 * x + 0.8 * random.gauss(0, 1))
         for x in (random.gauss(0, 1) for _ in range(3000))]
    gdf = spark.createDataFrame(g, "x double, y double")
    v10 = P.phik_correlation(gdf, "x", "y", n_bins=10).collect()[0]["phik"]
    v16 = P.phik_correlation(gdf, "x", "y", n_bins=16).collect()[0]["phik"]
    assert abs(v10 - v16) < 0.05   # was ~0.05+ drift with lexical order


def test_phik_high_cardinality_categorical_capped(spark):
    # a ~unique string column must stay within the n_bins^2 cell bound
    # (top-n_bins categories + __other__), not collect |distinct| cells
    rows = [(f"user{i}", float(i % 5)) for i in range(5000)]
    df = spark.createDataFrame(rows, "s string, v double")
    r = P.phik_correlation(df, "s", "v").collect()[0]
    assert r["n"] == 5000          # ran to completion, bounded driver work


def test_phik_categorical_and_degenerate(spark):
    dfc = spark.createDataFrame(
        [("a" if i % 2 else "b", float(i % 2)) for i in range(500)],
        "x string, y double")
    assert P.phik_correlation(dfc, "x", "y").collect()[0]["phik"] == 1.0
    one = spark.createDataFrame([(1.0, float(i)) for i in range(100)],
                                "x double, y double")
    # single x bin -> r_dim < 2 -> 0 by definition
    assert P.phik_correlation(one, "x", "y").collect()[0]["phik"] == 0.0


def test_histogram_total_and_edges(tables):
    df = tables["lineitem"]
    h = P.histogram(df, "l_extendedprice", bins=10).collect()
    assert sum(r["count"] for r in h) == df.filter(F.col("l_extendedprice").isNotNull()).count()
    assert len(h) <= 10
    lo = df.agg(F.min("l_extendedprice")).first()[0]
    hi = df.agg(F.max("l_extendedprice")).first()[0]
    assert h[0]["bin_start"] == pytest.approx(lo)
    assert h[-1]["bin_end"] == pytest.approx(hi)


def test_bucketed_join_has_no_shuffle(spark, tables):
    import uuid

    suffix = uuid.uuid4().hex[:8]
    lt, rt = f"cust_b_{suffix}", f"ord_b_{suffix}"
    try:
        S.write_bucketed(tables["customer"], lt, ["c_custkey"], n_buckets=8)
        S.write_bucketed(
            tables["orders"].withColumnRenamed("o_custkey", "c_custkey"),
            rt, ["c_custkey"], n_buckets=8)
        joined = S.co_located_join(spark, lt, rt, ["c_custkey"])
        # disable broadcast so the bucketed SMJ path is what gets planned
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = joined._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                           str(64 * 1024 * 1024))
        assert "Exchange" not in plan, plan
        n = joined.count()
        assert n == tables["orders"].count()  # every order has a customer
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {lt}")
        spark.sql(f"DROP TABLE IF EXISTS {rt}")


def test_partitioned_write_prunes(spark, tables, tmp_path):
    path = str(tmp_path / "orders_part")
    S.write_dataset(tables["orders"].withColumn("status", F.col("o_orderstatus")),
                    path, partition_by=["status"])
    back = spark.read.parquet(path)
    q = back.filter(F.col("status") == "F").select("o_orderkey")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "status" in plan.split("PartitionFilters")[1][:120]
    want = tables["orders"].filter(F.col("o_orderstatus") == "F").count()
    assert q.count() == want


def test_permissive_csv_ingestion(spark, tmp_path):
    # malformed rows land in _corrupt_record instead of failing the read
    p = tmp_path / "messy.csv"
    p.write_text("id,qty\n1,10\n2,notanumber\n3,30\n")
    df = S.ingest(spark, str(p), fmt="csv",
                  schema="id INT, qty INT, _corrupt_record STRING",
                  mode="PERMISSIVE", columnNameOfCorruptRecord="_corrupt_record")
    rows = df.orderBy("id").collect()
    good = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(good) == 2 and len(bad) == 1
    assert bad[0]["_corrupt_record"] == "2,notanumber"


def test_asof_join_semantics(spark):
    from dataqtor_spark.operators import asof as AJ

    left = spark.createDataFrame(
        [(1, 1, 10), (2, 1, 20), (3, 1, 5), (4, 2, 15)],
        "event_id long, k long, ts long")
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 15, 150.0), (2, 99, 999.0)],
        "k long, ts long, v double")
    got = {r["event_id"]: r["v_right"] for r in
           AJ.asof_join(left, right, "k", "ts", ["v"]).collect()}
    assert got[1] == 100.0   # equal ts matches (<= semantics)
    assert got[2] == 150.0   # latest prior
    assert got[3] is None    # nothing at or before ts=5
    assert got[4] is None    # right ts=99 is in the future


def test_range_join_boundaries(spark):
    from datetime import datetime as dt

    from dataqtor_spark.operators import rangejoin as RJ

    points = spark.createDataFrame(
        [(1, 1, dt(2024, 1, 1, 10, 0)), (2, 1, dt(2024, 1, 1, 11, 0)),
         (3, 1, dt(2024, 1, 1, 12, 0)), (4, 2, dt(2024, 1, 1, 10, 30))],
        "pid long, k long, ts timestamp")
    iv = spark.createDataFrame(
        [(1, dt(2024, 1, 1, 10, 0), dt(2024, 1, 1, 12, 0), "a"),
         (2, dt(2024, 1, 1, 0, 0), dt(2024, 1, 1, 10, 30), "b")],
        "k long, s timestamp, e timestamp, label string")
    got = {(r["pid"], r["label"]) for r in
           RJ.range_join(points, iv, "k", "ts", "s", "e").collect()}
    # start inclusive, end exclusive; key-scoped
    assert got == {(1, "a"), (2, "a")}


def test_jsonl_ingest_roundtrip(spark, tables, tmp_path):
    src = str(tmp_path / "nation_jsonl")
    tables["nation"].write.mode("overwrite").json(src)
    back = S.ingest(spark, src, fmt="json", row_id_order=["n_nationkey"])
    assert back.count() == tables["nation"].count()
    assert S.ROW_ID in back.columns


def test_asof_join_tolerance(spark):
    from dataqtor_spark.operators import asof as AJ

    left = spark.createDataFrame(
        [(1, 1, 10), (2, 1, 30), (3, 1, 100)],
        "event_id long, k long, ts long")
    right = spark.createDataFrame(
        [(1, 10, 100.0)], "k long, ts long, v double")
    got = {r["event_id"]: r["v_right"] for r in
           AJ.asof_join(left, right, "k", "ts", ["v"],
                        tolerance_seconds=25).collect()}
    assert got[1] == 100.0       # age 0
    assert got[2] == 100.0       # age 20 <= 25
    assert got[3] is None        # age 90 > 25: stale match nulled
    # no extra columns leak
    cols = AJ.asof_join(left, right, "k", "ts", ["v"],
                        tolerance_seconds=25).columns
    assert cols == ["event_id", "k", "ts", "v_right"]


def test_synthetic_datasource_partitioned_and_deterministic(spark):
    from pyspark.sql import functions as F

    from dataqtor_spark.sources import register_sources

    register_sources(spark)
    df = (spark.read.format("dataqtor_synth")
          .option("rows", 10000).option("partitions", 8)
          .option("users", 100).load())
    assert df.count() == 10000
    assert df.rdd.getNumPartitions() == 8
    # generation is a pure function of the row index: re-read == first read
    a = df.agg(F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)")).alias("h")).collect()[0]["h"]
    df2 = (spark.read.format("dataqtor_synth")
           .option("rows", 10000).option("partitions", 3)
           .option("users", 100).load())
    b = df2.agg(F.sum(F.xxhash64(*df2.columns).cast("decimal(38,0)")).alias("h")).collect()[0]["h"]
    assert a == b  # content independent of the partition split
    assert df.filter(F.col("user_id") >= 100).count() == 0
    assert df.select("event_id").distinct().count() == 10000


def test_register_tables_enables_pure_sql(spark):
    from dataqtor_spark.session import register_tables

    names = register_tables(spark, "/root/testdata/sf0.001")
    assert "lineitem" in names and "events" in names
    got = spark.sql("""
        SELECT l_returnflag, count(*) AS n FROM lineitem
        GROUP BY l_returnflag ORDER BY l_returnflag""").collect()
    assert len(got) == 3 and all(r["n"] > 0 for r in got)
    # events view carries the ns->us timestamp fixup
    assert dict(spark.table("events").dtypes)["ts"] == "timestamp"


def test_similar_strings_clean_regex_option(spark):
    from dataqtor_spark.operators import similarity as SIM

    # with the default regex, '-' is stripped: 'ab-cd' == 'abcd' as grams;
    # with a whitespace-only regex they differ
    df = spark.createDataFrame([("ab-cd",), ("abcd",), ("zzzz",)],
                               "v string")
    dflt = SIM.similar_strings(df, "v", min_similarity=0.9).collect()
    assert {(r["left_side"], r["right_side"]) for r in dflt} == \
        {("ab-cd", "abcd")}
    strict = SIM.similar_strings(df, "v", min_similarity=0.9,
                                 clean_regex=r"\s").collect()
    assert strict == []   # '-' kept -> gram sets diverge below 0.9
