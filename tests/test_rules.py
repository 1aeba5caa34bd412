"""Rule fidelity tests.

The checksum/phone/email tests compare the Spark column expressions against
plain-Python implementations of the published algorithms (the same semantics
the reference implements — see dataqtor_spark.functions docstrings for
file:line cites), over corpora that hit every violation class.
"""

import pyspark.sql.functions as F
import pytest

from dataqtor_spark.functions.checksums import is_valid_taxnum, is_valid_tcid
from dataqtor_spark.functions.email import email_violation
from dataqtor_spark.functions.phone import phone_format_class, phone_violation
from dataqtor_spark.operators import rules as R


# --- plain-Python oracles ---------------------------------------------------

def py_tcid(v) -> bool:
    v = str(v)
    if len(v) != 11 or not v.isdigit() or v[0] == "0":
        return False
    d = [int(x) for x in v]
    if sum(d[:10]) % 10 != d[10]:
        return False
    return ((7 * (d[0] + d[2] + d[4] + d[6] + d[8]) - (d[1] + d[3] + d[5] + d[7])) % 10) == d[9]


def py_taxnum(v) -> bool:
    v = str(v)
    if len(v) == 11:
        return py_tcid(v)
    if len(v) != 10 or not v.isdigit():
        return False
    total = 0
    for x in range(9):
        t1 = (int(v[x]) + (9 - x)) % 10
        t2 = (t1 * (2 ** (9 - x))) % 9
        if t1 != 0 and t2 == 0:
            t2 = 9
        total += t2
    check = 0 if total % 10 == 0 else 10 - (total % 10)
    return int(v[9]) == check


def make_valid_tcid(seed: int) -> str:
    d = [(seed // (10 ** i)) % 10 for i in range(9)][::-1]
    if d[0] == 0:
        d[0] = 1
    d10 = (7 * (d[0] + d[2] + d[4] + d[6] + d[8]) - (d[1] + d[3] + d[5] + d[7])) % 10
    d11 = (sum(d) + d10) % 10
    return "".join(map(str, d + [d10, d11]))


TCID_CORPUS = (
    [make_valid_tcid(100000000 + i * 7919) for i in range(25)]
    + ["10000000146", "12345678901", "00000000000", "1234567890", "123456789012",
       "abcdefghijk", "1234567890a", "", "99999999999"]
    + [make_valid_tcid(100000000 + i * 7919)[:-1] + str((int(make_valid_tcid(100000000 + i * 7919)[-1]) + 5) % 10)
       for i in range(5)]  # corrupt last digit
)


def make_valid_taxnum(seed: int) -> str:
    d = [(seed // (10 ** i)) % 10 for i in range(9)][::-1]
    total = 0
    for x in range(9):
        t1 = (d[x] + (9 - x)) % 10
        t2 = (t1 * (2 ** (9 - x))) % 9
        if t1 != 0 and t2 == 0:
            t2 = 9
        total += t2
    check = 0 if total % 10 == 0 else 10 - (total % 10)
    return "".join(map(str, d + [check]))


TAX_CORPUS = (
    [make_valid_taxnum(100000000 + i * 104729) for i in range(25)]
    + [make_valid_tcid(100000000 + i * 7919) for i in range(5)]  # 11-digit fallthrough
    + ["0123456789", "123456789", "12345678901a", "", "9999999999"]
)


def test_tcid_matches_python_oracle(spark):
    df = spark.createDataFrame([(v,) for v in TCID_CORPUS], "v string")
    got = {r["v"]: r["ok"] for r in df.select("v", is_valid_tcid("v").alias("ok")).collect()}
    for v in TCID_CORPUS:
        assert got[v] == py_tcid(v), f"TCID mismatch for {v!r}"


def test_taxnum_matches_python_oracle(spark):
    df = spark.createDataFrame([(v,) for v in TAX_CORPUS], "v string")
    got = {r["v"]: r["ok"] for r in df.select("v", is_valid_taxnum("v").alias("ok")).collect()}
    for v in TAX_CORPUS:
        assert got[v] == py_taxnum(v), f"taxnum mismatch for {v!r}"


# --- e-mail -----------------------------------------------------------------

EMAIL_CASES = [
    ("user.name@example.com", False),  # '.' is not in the forbidden set (home.py:477-505)
    ("username@example.com", False),
    ("a@b.c", True),        # too short (<=6)? len 5 → f2; also endswith .c → v3
    ("user@example.com", False),
    ("USER@example.com", True),        # uppercase
    ("kullanıcı@example.com", True),   # Turkish char
    ("user@@example.com", True),       # two @
    ("user@.example.com", True),       # @.
    ("yok@example.com", True),         # dummy prefix
    ("user@hotmil.com", True),         # typo domain
    ("user@example.cm", True),         # bad ending
    ("user example@example.com", True),  # space (forbidden char)
    ("userexample.com", True),         # no @
    ("user@examplecom", True),         # no dot
    (None, False),
]


def test_email_violation_cases(spark):
    df = spark.createDataFrame([(v,) for v, _ in EMAIL_CASES], "v string")
    got = {r["v"]: r["bad"] for r in df.select("v", email_violation("v").alias("bad")).collect()}
    for v, expect_bad in EMAIL_CASES:
        assert got[v] == expect_bad, f"email {v!r}: expected violation={expect_bad}"


# --- phone ------------------------------------------------------------------

PHONE_CASES = [
    ("5329876012", "ok", False),            # clean 10-digit mobile (no dummy substring)
    ("05321234567", "d111", True),          # 11, leading 0, no space
    ("905321234567", "d112", True),         # 12, starts 90
    ("0532 123 45 67", "d1013", True),      # 13: starts 0, s[4]' ', s[8]' '
    ("(0532) 123 45 67", "d116", True),     # 16: (0...) ...
    ("+90 532 123 45 67", "d317", True),    # 17
    ("532 123 45 67", "d913", True),        # 13: s[3],7,10 spaces
    ("0321234567", "bad_ten_digit", True),  # 10 digits starting 0
    ("532-123-4567", "overlong", True),     # 12 w/ dashes: d? check masks → none → overlong... s[3]=='-' not startswith 0 → d311? len==12 not 11. d? none match → overlong
    ("123 45", "invalid", True),            # dummy + short → dummy first? reference order: y10, dum, invalid → len!=10 so not y10; contains '12345'? '123 45' has no '12345' substring; short → invalid
    ("5551234555 55 55", "dummy", True),    # contains '555 55 55'? '555 55 55' not in it... adjust below
    ("555 55 55", "invalid", True),         # len 9 <10 → but dummy check first: contains '555 55 55' → dummy
    ("ABC1234567", "invalid", True),        # letters
    ("53212345", "invalid", True),          # too short
    (None, "ok", False),
]


def test_phone_violation_and_class(spark):
    rows = [(v,) for v, _, _ in PHONE_CASES]
    df = spark.createDataFrame(rows, "v string")
    got = {
        r["v"]: (r["cls"], r["bad"])
        for r in df.select(
            "v",
            phone_format_class("v").alias("cls"),
            phone_violation("v").alias("bad"),
        ).collect()
    }
    for v, _, expect_bad in PHONE_CASES:
        assert got[v][1] == expect_bad, f"phone {v!r}: expected violation={expect_bad}, got {got[v]}"
    # classification spot checks (reference union order)
    assert got["05321234567"][0] == "d111"
    assert got["905321234567"][0] == "d112"
    assert got["+90 532 123 45 67"][0] == "d317"
    assert got["(0532) 123 45 67"][0] == "d116"
    assert got["5329876012"][0] == "ok"
    assert got["555 55 55"][0] == "dummy"
    assert got["0321234567"][0] == "bad_ten_digit"


# --- rule algebra -----------------------------------------------------------

def test_rule_compare_excludes_nulls(spark):
    df = spark.createDataFrame([(1,), (5,), (None,), (10,)], "x int")
    r = R.rule_compare("x", "between", low=2, high=9)
    viol = [row["x"] for row in r.violations(df).collect()]
    assert sorted(viol) == [1, 10]


def test_rule_no_special_chars_whitelist(spark):
    df = spark.createDataFrame([("a#b",), ("a#b!",), ("ab",), ("a!b",)], "s string")
    plain = R.rule_no_special_chars("s")
    assert plain.violations(df).count() == 3
    # whitelist '#': any value containing '#' is excused entirely (reference
    # exclusive semantics, home.py:439-445) — even "a#b!" with another special
    wl = R.rule_no_special_chars("s", allowed=["#"])
    viol = [row["s"] for row in wl.violations(df).collect()]
    assert viol == ["a!b"]


def test_evaluate_rules_fused_summary(spark):
    df = spark.createDataFrame(
        [(1, "ok"), (50, "bad!"), (None, None), (7, "meh")],
        "x int, s string",
    )
    rules = [
        R.rule_compare("x", "<", 10, name="x_small"),
        R.rule_no_special_chars("s", name="s_clean"),
    ]
    summary = {r["rule"]: r for r in R.evaluate_rules(df, rules).collect()}
    xs = summary["x_small"]
    assert (xs["total_records"], xs["null_records"], xs["out_of_format_records"]) == (4, 1, 1)
    assert xs["proper_format_records"] == 2
    assert xs["dq_score"] == 50.0
    sc = summary["s_clean"]
    assert (sc["null_records"], sc["out_of_format_records"], sc["proper_format_records"]) == (1, 1, 2)


def test_violations_union_and_clean_partition(spark):
    df = spark.createDataFrame(
        [(1, 1, "a!"), (2, 50, "b"), (3, 5, "c"), (4, None, "d"), (5, 7, None)],
        "id int, x int, s string",
    )
    rules = [R.rule_compare("x", "<", 10), R.rule_no_special_chars("s")]
    viol = R.violations_union(df, rules, "id")
    clean = R.clean_rows(df, rules)
    viol_ids = {r["id"] for r in viol.collect()}
    clean_ids = {r["id"] for r in clean.collect()}
    assert viol_ids == {1, 2}
    assert clean_ids == {3}          # 4,5 have nulls → neither violation nor clean
    assert not (viol_ids & clean_ids)


def test_rule_domain_city(spark):
    df = spark.createDataFrame(
        [("İstanbul",), ("Ankara",), ("istanbul",), ("Berlin",), (None,)], "city string"
    )
    r = R.rule_domain("city")
    viol = {row["city"] for row in r.violations(df).collect()}
    assert viol == {"istanbul", "Berlin"}


def test_overall_score(spark):
    df = spark.createDataFrame([(1,), (2,), (3,), (4,)], "x int")
    rules = [R.rule_compare("x", "<", 3, name="a"), R.rule_compare("x", "<", 5, name="b")]
    s = R.evaluate_rules(df, rules)
    overall = R.overall_score(s).collect()[0]["overall_dq_score"]
    assert overall == pytest.approx((50.0 + 100.0) / 2)


def test_many_rules_single_scan(spark, tables):
    # 50 rules must still plan as ONE scan + ONE aggregate — the rule-
    # fusion contract (SURVEY §4 rewrite 1)
    import io, contextlib

    from dataqtor_spark.operators import rules as R

    li = tables["lineitem"]
    rules = []
    for i in range(25):
        rules.append(R.rule_compare("l_quantity", "<", float(i + 1), name=f"q{i}"))
        rules.append(R.rule_compare("l_discount", ">=", i / 100.0, name=f"d{i}"))
    out = R.evaluate_rules(li, rules)
    assert out.count() == 50
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    # formatted explain lists each node twice (tree + detail); count the
    # detail headers
    import re
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1, plan
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) <= 1


def test_builtin_rule_wrappers(spark):
    from dataqtor_spark.operators import rules as R

    df = spark.createDataFrame(
        [(1, "ok@mail.com", "5329876012", "10000000146", "1234567895"),
         (2, "BAD@@", "abc", "10000000147", "1234567890"),
         (3, None, None, None, None)],
        "id long, email string, phone string, tcid string, taxid string")
    # each wrapper returns a Rule whose violations() excludes nulls
    assert R.rule_email("email").violations(df).count() == 1
    assert R.rule_phone_tr("phone").violations(df).count() == 1
    tc = R.rule_tcid("tcid").violations(df)
    assert {r["id"] for r in tc.select("id").collect()} <= {1, 2}
    tx = R.rule_taxnum("taxid").violations(df)
    assert {r["id"] for r in tx.select("id").collect()} <= {1, 2}

    # violation_flags: one boolean column per rule in one projection
    flags = R.violation_flags(df, [R.rule_email("email"),
                                   R.rule_phone_tr("phone")])
    row = {r["id"]: r for r in flags.collect()}
    viol_cols = [c for c in flags.columns if c.startswith("__viol")]
    assert len(viol_cols) == 2
    assert any(row[2][c] for c in viol_cols)
    assert not any(row[1][c] is True and "email" in c for c in viol_cols)


def test_fill_nulls(spark):
    from dataqtor_spark.operators import repair as RP

    df = spark.createDataFrame([(1, None), (2, "x")], "id long, s string")
    out = RP.fill_nulls(df, "s", "missing")
    assert {r["s"] for r in out.collect()} == {"missing", "x"}


def test_fk_orphans_counts_nulls_and_missing(spark):
    from dataqtor_spark.operators import rules as R

    child = spark.createDataFrame(
        [(1,), (2,), (3,), (None,), (99,)], "fk int")
    parent = spark.createDataFrame([(1,), (2,), (3,), (3,)], "pk int")
    r = R.fk_orphans(child, parent, "fk", "pk").collect()[0]
    # 99 (missing) + NULL both orphans; duplicate parent keys don't inflate
    assert r["n_child"] == 5
    assert r["n_orphans"] == 2
    assert r["orphan_pct"] == 40.0


def test_cross_table_violations_null_is_not_violation(spark):
    import pyspark.sql.functions as F

    from dataqtor_spark.operators import rules as R

    left = spark.createDataFrame([(1, 5), (2, None), (3, 1)],
                                 "k int, lv int")
    right = spark.createDataFrame([(1, 3), (2, 3), (3, 3)], "k int, rv int")
    out = R.cross_table_violations(left, right, "k",
                                   F.col("lv") > F.col("rv")).collect()
    assert [r["k"] for r in out] == [1]  # NULL comparison -> kept out


def test_equi_depth_histogram_balanced_and_tied(spark):
    from dataqtor_spark.operators import profile as P

    # 100 distinct values -> 10 buckets of exactly 10
    df = spark.createDataFrame([(float(i),) for i in range(100)], "x double")
    out = {r["bucket"]: r for r in
           P.equi_depth_histogram(df, "x", 10).collect()}
    assert sorted(out) == list(range(10))
    assert all(out[b]["n_rows"] == 10 for b in out)
    assert out[0]["lo"] == 0.0 and out[9]["hi"] == 99.0
    # massive tie: one value holding >1 bucket's worth stays in ONE bucket
    df2 = spark.createDataFrame([(1.0,)] * 50 + [(2.0,)] * 5 + [(3.0,)] * 5,
                                "x double")
    out2 = P.equi_depth_histogram(df2, "x", 10).collect()
    total = sum(r["n_rows"] for r in out2)
    assert total == 60
    tied = [r for r in out2 if r["lo"] == 1.0]
    assert len(tied) == 1 and tied[0]["n_rows"] == 50


def test_violation_samples_one_scan_per_rule_cap(spark):
    from dataqtor_spark.operators import rules as R

    df = spark.createDataFrame(
        [(i, float(-i), "a1") for i in range(1, 10)]
        + [(99, 5.0, "ok")],
        "k long, bal double, seg string")
    rules = [
        R.rule_compare("bal", ">=", 0.0, name="bal_nonneg"),
        R.rule_no_digits("seg", name="seg_no_digits"),
    ]
    got = R.violation_samples(df, rules, "k", k=3).collect()
    by_rule = {}
    for r in got:
        by_rule.setdefault(r["rule"], []).append(r["key"])
    assert by_rule["bal_nonneg"] == [1, 2, 3]     # capped at k, key-ordered
    assert by_rule["seg_no_digits"] == [1, 2, 3]
    assert all(r["rank"] <= 3 for r in got)


def test_luhn_known_vectors(spark):
    from dataqtor_spark.functions.checksums import luhn_valid

    df = spark.createDataFrame(
        [("4539578763621486",),   # valid (classic test number)
         ("4539578763621487",),   # corrupted check digit
         ("79927398713",),        # valid 11-digit Luhn example
         ("79927398710",),        # invalid
         ("abc",)],               # non-numeric / wrong length
        "s string")
    got16 = [r["v"] for r in df.select(
        luhn_valid(F.col("s"), 16).alias("v")).collect()]
    assert got16 == [True, False, False, False, False]
    got11 = [r["v"] for r in df.select(
        luhn_valid(F.col("s"), 11).alias("v")).collect()]
    assert got11[2] is True and got11[3] is False
