"""Dtype-sensitivity gates (round 13).

The four-round ``t17_source_mix`` driver-red was an uncast DuckDB
``sum()`` — HUGEINT — which ``fetchdf()`` materializes as float64 against
Spark's int64: every VALUE compares equal (``3.0 == 3``) so the local
gate stayed green while the driver's dtype-sensitive hash failed.  These
tests plant that exact class of repro and require BOTH local gates to
catch it.
"""

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_oracle import compare, dtype_problems  # noqa: E402
from tools.tie_audit import DTYPE_DECIMAL_ALLOW, dtype_gate  # noqa: E402

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# check_oracle.compare — post-materialization dtype diff
# ---------------------------------------------------------------------------

def test_planted_uncast_sum_fails_compare():
    """The t17 repro: DuckDB sum() -> HUGEINT -> fetchdf float64, values
    identical to Spark's int64.  Value equality hides it; the dtype check
    must not."""
    con = duckdb.connect()
    odf = con.execute(
        "SELECT g, sum(x) AS n FROM (VALUES (1, 1), (1, 2), (2, 3)) "
        "t(g, x) GROUP BY g ORDER BY g").fetchdf()
    assert str(odf["n"].dtype) == "float64"  # the HUGEINT materialization
    sdf = pd.DataFrame({"g": [1, 2], "n": [3, 3]})  # Spark-side int64
    assert str(sdf["n"].dtype) == "int64"
    problems = compare("planted", sdf, odf)
    assert any("dtype diff" in p for p in problems), problems


def test_cast_sum_passes_compare():
    con = duckdb.connect()
    odf = con.execute(
        "SELECT g, sum(x)::BIGINT AS n FROM (VALUES (1, 1), (1, 2), (2, 3)) "
        "t(g, x) GROUP BY g ORDER BY g").fetchdf()
    sdf = pd.DataFrame({"g": [1, 2], "n": [3, 3]})
    assert compare("planted", sdf, odf) == []


def test_float_vs_int_both_directions():
    a = pd.DataFrame({"v": [1.0, 2.0]})
    b = pd.DataFrame({"v": [1, 2]})
    assert dtype_problems(a, b) and dtype_problems(b, a)


def test_object_columns_not_flagged():
    # strings / Decimals / dates materialize as object on one side only —
    # legitimate, handled by the value compare.
    import decimal
    a = pd.DataFrame({"v": [decimal.Decimal("1.5")]})
    b = pd.DataFrame({"v": [1.5]})
    assert dtype_problems(a, b) == []


def test_int_width_not_flagged():
    a = pd.DataFrame({"v": pd.array([1, 2], dtype="int32")})
    b = pd.DataFrame({"v": [1, 2]})
    assert dtype_problems(a, b) == []


# ---------------------------------------------------------------------------
# tie_audit.dtype_gate — registry-wide HUGEINT/DECIMAL census
# ---------------------------------------------------------------------------

@pytest.mark.skipif(not os.path.isdir(SF), reason="testdata missing")
def test_registry_has_no_hugeint_and_only_allowlisted_decimals():
    assert dtype_gate(SF) == []


@pytest.mark.skipif(not os.path.isdir(SF), reason="testdata missing")
def test_planted_hugeint_oracle_fails_gate(monkeypatch):
    from dataqtor_spark import queries as Q
    planted = dict(Q.ORACLES)
    planted["__planted_uncast"] = \
        "SELECT source, sum(length(text)) AS n FROM documents GROUP BY source"
    monkeypatch.setattr(Q, "ORACLES", planted)
    viol = dtype_gate(SF)
    assert any("__planted_uncast.n: HUGEINT" in v for v in viol), viol


@pytest.mark.skipif(not os.path.isdir(SF), reason="testdata missing")
def test_planted_decimal_oracle_fails_gate(monkeypatch):
    from dataqtor_spark import queries as Q
    planted = dict(Q.ORACLES)
    planted["__planted_decimal"] = "SELECT 1.25 AS frac"
    monkeypatch.setattr(Q, "ORACLES", planted)
    viol = dtype_gate(SF)
    assert any("__planted_decimal.frac" in v for v in viol), viol


def test_decimal_allowlist_is_tight():
    # every allowlisted entry must still exist in the registry with an oracle
    from dataqtor_spark import queries as Q
    for name in DTYPE_DECIMAL_ALLOW:
        assert name in Q.ORACLES, name


# ---------------------------------------------------------------------------
# check_oracle pre-flight — a failing census must block the compare run
# ---------------------------------------------------------------------------

@pytest.mark.skipif(not os.path.isdir(SF), reason="testdata missing")
def test_failing_census_blocks_check_oracle(monkeypatch):
    """check_oracle.main() must refuse to run (named SystemExit, before any
    Spark work) when the dtype census has violations — a future uncast
    sum() can't even register a compare result."""
    import sys as _sys

    from tools import check_oracle as CO
    from tools import tie_audit as TA
    monkeypatch.setattr(
        TA, "dtype_gate",
        lambda sf_dir: ["__planted.n: HUGEINT output (planted)"])
    monkeypatch.setattr(_sys, "argv", ["check_oracle.py", SF])
    with pytest.raises(SystemExit, match="DTYPE-CENSUS-GATE"):
        CO.main()
