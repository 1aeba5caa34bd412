"""CDC primitives (snapshot diff, changelog compaction), BM25 retrieval,
OOV profiling, unpivot and CUBE invariants."""

import pytest
from pyspark.sql import functions as F

from dataqtor_spark.operators import scd as S
from dataqtor_spark.operators import textstats as T


def test_snapshot_diff_classifies_and_is_null_safe(spark):
    old = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, "b"), (3, None, "c"), (4, 40.0, "d")],
        "k int, price double, status string")
    new = spark.createDataFrame(
        [(1, 10.0, "a"),          # unchanged -> absent from output
         (2, 21.0, "b"),          # changed (value)
         (3, 30.0, "c"),          # changed (NULL -> value, null-safe)
         (5, 50.0, "e")],         # added; 4 removed
        "k int, price double, status string")
    got = {r["k"]: r for r in S.snapshot_diff(
        old, new, ["k"], ["price", "status"]).collect()}
    assert set(got) == {2, 3, 4, 5}
    assert got[2]["change_type"] == "changed"
    assert got[3]["change_type"] == "changed"
    assert got[4]["change_type"] == "removed" and got[4]["new_price"] is None
    assert got[5]["change_type"] == "added" and got[5]["old_price"] is None


def test_snapshot_diff_empty_delta(spark):
    old = spark.createDataFrame([(1, 1.0)], "k int, v double")
    assert S.snapshot_diff(old, old, ["k"], ["v"]).count() == 0


def test_latest_per_key_tiebreak(spark):
    rows = [(1, 100, 1, "x"), (1, 100, 2, "y"),  # same ts: id 2 wins
            (1, 90, 3, "z"), (2, 50, 4, "w")]
    df = spark.createDataFrame(rows, "k int, ts int, id int, v string")
    got = {r["k"]: r for r in S.latest_per_key(
        df, ["k"], "ts", tiebreak_cols=["id"]).collect()}
    assert got[1]["v"] == "y" and got[2]["v"] == "w"
    assert "__rn" not in S.latest_per_key(df, ["k"], "ts", ["id"]).columns


def test_bm25_ranks_term_heavy_docs_first(spark):
    docs = spark.createDataFrame(
        [(1, "spark spark spark join"),
         (2, "spark join"),
         (3, "table row value"),
         (4, "join")],
        "doc_id int, text string")
    got = T.bm25_search(docs, ["spark"], top_k=10).collect()
    ids = [r["doc_id"] for r in got]
    assert ids[0] == 1            # highest tf on the query term
    assert 3 not in ids           # no query term -> no score row
    assert all(r["score"] > 0 for r in got)
    assert got[0]["score"] > got[-1]["score"]


def test_bm25_idf_downweights_common_terms(spark):
    # 'the' in every doc, 'rare' in one: the rare-term doc must outrank
    # a doc matching only the ubiquitous term
    docs = spark.createDataFrame(
        [(1, "the rare"), (2, "the"), (3, "the"), (4, "the")],
        "doc_id int, text string")
    got = {r["doc_id"]: r["score"]
           for r in T.bm25_search(docs, ["the", "rare"], top_k=10).collect()}
    assert got[1] > got[2]


def test_bm25_ignores_tokenless_docs_in_corpus_stats(spark):
    # empty/whitespace/null texts are not documents: N and avgdl must
    # come from tokenized docs only (the t23 oracle's semantics)
    import math
    docs = spark.createDataFrame(
        [(1, "spark join agg"), (2, "spark x y"), (3, "   "), (4, None)],
        "doc_id int, text string")
    got = {r["doc_id"]: r["score"]
           for r in T.bm25_search(docs, ["spark"], top_k=10).collect()}
    # N=2, df=2, avgdl=3, dl=3, tf=1:
    # idf = ln(1 + 0.5/2.5); contrib = idf*2.2/(1+1.2)
    exact = round(round(math.log(1 + 0.5 / 2.5) * 2.2 / 2.2, 8), 4)
    assert set(got) == {1, 2}
    assert got[1] == pytest.approx(exact, abs=1e-4)


def test_bm25_duplicate_and_empty_terms(spark):
    docs = spark.createDataFrame(
        [(1, "spark join"), (2, "join")], "doc_id int, text string")
    once = {r["doc_id"]: r["score"]
            for r in T.bm25_search(docs, ["spark"], top_k=10).collect()}
    twice = {r["doc_id"]: r["score"]
             for r in T.bm25_search(docs, ["spark", "spark"],
                                    top_k=10).collect()}
    assert once == twice          # repeated query term not double-counted
    assert T.bm25_search(docs, [], top_k=10).count() == 0


def test_oov_rate_bounds_and_known_value(spark):
    docs = spark.createDataFrame(
        [(1, "a a a b", "s1"), (2, "a zz", "s2")],
        "doc_id int, text string, source string")
    # vocab_size=2 -> vocab {a, b} (count desc, token asc); zz is OOV
    got = {r["source"]: r for r in T.oov_rate(
        docs, vocab_size=2, group_col="source").collect()}
    assert got["s1"]["n_oov"] == 0 and got["s1"]["oov_rate"] == 0.0
    assert got["s2"]["n_tokens"] == 2 and got["s2"]["n_oov"] == 1
    assert abs(got["s2"]["oov_rate"] - 0.5) < 1e-9


def test_cube_totals_consistent(tables):
    li = tables["lineitem"]
    cube = (li.cube("l_returnflag", "l_linestatus")
            .agg(F.grouping("l_returnflag").alias("g_rf"),
                 F.grouping("l_linestatus").alias("g_ls"),
                 F.count(F.lit(1)).alias("n")))
    rows = cube.collect()
    grand = [r for r in rows if r["g_rf"] == 1 and r["g_ls"] == 1]
    assert len(grand) == 1 and grand[0]["n"] == li.count()
    # each grouping set partitions the rows: per-set sums equal the total
    for g_rf, g_ls in [(0, 0), (0, 1), (1, 0)]:
        s = sum(r["n"] for r in rows
                if r["g_rf"] == g_rf and r["g_ls"] == g_ls)
        assert s == grand[0]["n"]


def test_unpivot_long_form_shape(tables):
    li = tables["lineitem"]
    long = li.unpivot([], ["l_quantity", "l_tax"], "measure", "value")
    assert long.columns == ["measure", "value"]
    assert long.count() == 2 * li.count()


def test_rule_conditional_null_semantics(spark):
    from dataqtor_spark.operators import rules as R

    df = spark.createDataFrame(
        [("F", 10.0), ("F", 100.0), ("O", 1.0), (None, 5.0), ("F", None)],
        "status string, price double")
    r = R.rule_conditional("c", F.col("status") == "F",
                           F.col("price") >= 50.0)
    got = r.violations(df).collect()
    # only the (F, 10.0) row: NULL condition or NULL consequent is not
    # a violation (nulls are tracked separately)
    assert len(got) == 1 and got[0]["price"] == 10.0


def test_unique_key_violations(spark):
    from dataqtor_spark.operators import rules as R

    df = spark.createDataFrame(
        [(1, 1), (1, 1), (1, 2), (2, 1), (None, 1)], "a int, b int")
    got = R.unique_key_violations(df, ["a", "b"]).collect()
    assert len(got) == 1
    assert got[0]["a"] == 1 and got[0]["b"] == 1 and got[0]["n_rows"] == 2


def test_freshness_check_flags_stale_groups(spark):
    import datetime as dt

    from dataqtor_spark.operators import rules as R

    df = spark.createDataFrame(
        [("a", dt.datetime(2024, 1, 31, 12)), ("a", dt.datetime(2024, 1, 1)),
         ("b", dt.datetime(2024, 1, 20))],
        "g string, ts timestamp")
    got = {r["g"]: r for r in R.freshness_check(
        df, "ts", "g", dt.datetime(2024, 2, 1), 24.0).collect()}
    assert not got["a"]["is_stale"] and got["a"]["lag_hours"] == 12.0
    assert got["b"]["is_stale"]


def test_group_completeness(spark):
    from dataqtor_spark.operators import rules as R

    df = spark.createDataFrame(
        [("x", 1.0), ("x", None), ("y", 2.0)], "g string, v double")
    got = {r["g"]: r for r in R.group_completeness(df, "v", "g").collect()}
    assert got["x"]["null_records"] == 1 and got["x"]["null_pct"] == 50.0
    assert got["y"]["null_records"] == 0


def test_suggest_constraints_proposals(spark):
    from dataqtor_spark.operators import profile as P

    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", 7.5), (3, "a", None), (4, "c", 2.0)],
        "id long, cat string, v double")
    got = {(r["column"], r["constraint"]): r
           for r in P.suggest_constraints(df).collect()}
    assert ("id", "not_null") in got and ("id", "unique") in got
    assert got[("id", "min_ge")]["param"] == 1.0
    assert got[("id", "max_le")]["param"] == 4.0
    assert ("cat", "isin") in got and got[("cat", "isin")]["param"] == 3.0
    assert ("v", "not_null") not in got          # has a NULL
    assert ("v", "complete_ge") not in got       # 75% < default floor
    assert got[("v", "min_ge")]["param"] == 2.0
    # support column is the fill rate
    assert got[("v", "max_le")]["support"] == 0.75


def test_bpe_merge_candidates_counts(spark):
    from dataqtor_spark.operators import textstats as T

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "x")], "doc_id int, text string")
    got = {(r["tok_a"], r["tok_b"]): r["n"]
           for r in T.bpe_merge_candidates(docs).collect()}
    # "a b" appears twice in doc1 (positions 0,2) + once in doc2
    assert got[("a", "b")] == 3
    assert got[("b", "a")] == 1
    assert ("x", "x") not in got  # single-token docs contribute nothing
