"""ab02: Welch two-sample t over the deterministic A/B arms, checked
against a numpy replay of the full statistic."""

import numpy as np
import pytest


def test_ab02_matches_numpy_welch(spark):
    from tests.conftest import SF_DIR

    from dataqtor_spark.queries import QUERIES

    row = QUERIES["ab02_welch_t_test"](spark, SF_DIR).collect()[0]

    import duckdb

    con = duckdb.connect()
    per_user = con.execute(
        f"""SELECT user_id, count(*) AS cnt
            FROM read_parquet('{SF_DIR}/events.parquet')
            GROUP BY user_id""").fetchall()
    mix = lambda u: (((u + 11) * 2654435761) % 2**32) % 2  # noqa: E731
    a = np.array([c for u, c in per_user if mix(u) == 0], dtype=np.float64)
    b = np.array([c for u, c in per_user if mix(u) == 1], dtype=np.float64)
    assert row["n_a"] == len(a) and row["n_b"] == len(b)
    assert row["mean_a"] == pytest.approx(a.mean(), abs=1e-6)
    assert row["mean_b"] == pytest.approx(b.mean(), abs=1e-6)
    va, vb = a.var(ddof=1), b.var(ddof=1)
    se2 = va / len(a) + vb / len(b)
    t = (a.mean() - b.mean()) / np.sqrt(se2)
    assert row["t_stat"] == pytest.approx(t, abs=1e-5)
    df = se2**2 / ((va / len(a))**2 / (len(a) - 1)
                   + (vb / len(b))**2 / (len(b) - 1))
    assert row["df"] == pytest.approx(df, rel=1e-4)
    assert row["significant"] == (abs(row["t_stat"]) > 1.96)


def test_ab02_degenerate_arm_null_in_both_engines(spark, tmp_path):
    """n=1 per arm: variance is undefined.  Spark's NULL-on-div-by-zero
    and DuckDB's integer-div raise would diverge without the
    greatest(den,1) + n>1 guard — both engines must return NULL stats."""
    import duckdb
    import pandas as pd

    from dataqtor_spark.queries import ORACLES, QUERIES

    mix = lambda u: (((u + 11) * 2654435761) % 2**32) % 2  # noqa: E731
    ua = next(u for u in range(100) if mix(u) == 0)
    ub = next(u for u in range(100) if mix(u) == 1)
    ev = pd.DataFrame({
        "user_id": [ua, ub],
        "event_type": ["view", "view"],
        "ts": pd.to_datetime(["2024-01-01", "2024-01-02"]),
        "value": [1.0, 2.0],
    })
    ev.to_parquet(tmp_path / "events.parquet")

    row = QUERIES["ab02_welch_t_test"](spark, str(tmp_path)).collect()[0]
    assert row["n_a"] == 1 and row["n_b"] == 1
    assert row["t_stat"] is None and row["df"] is None
    assert row["significant"] is None

    con = duckdb.connect()
    con.execute(f"""CREATE VIEW events AS
                    SELECT * FROM read_parquet('{tmp_path}/events.parquet')""")
    orow = con.execute(ORACLES["ab02_welch_t_test"]).fetchdf().iloc[0]
    assert orow["n_a"] == 1 and orow["n_b"] == 1
    assert pd.isna(orow["t_stat"]) and pd.isna(orow["df"])
    assert pd.isna(orow["significant"])
