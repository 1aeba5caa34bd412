"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same parquet tables, then compares row count, sorted column names,
POST-MATERIALIZATION DTYPES (``toPandas()`` vs ``fetchdf()`` numpy kinds —
the class a value-equality compare hides but a dtype-sensitive driver hash
does not; see the four-round t17 HUGEINT red), and the order-insensitive
multiset of row values (exact; floats reported with max-abs-diff
diagnostics when not bit-equal).

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df, float_exact=True):
    import pandas as pd

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype) == "object":
            df[c] = df[c].map(lambda v: float(v) if hasattr(v, "as_tuple") else v)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def dtype_problems(sdf_pd, odf_pd):
    """Post-materialization dtype drift between ``toPandas()`` and
    ``fetchdf()`` — the class of divergence a value-equality compare hides
    (``3.0 == 3`` is True) but a dtype-sensitive driver hash does not.

    The four-round t17_source_mix driver-red came down to exactly this: a
    DuckDB ``sum()`` is HUGEINT, which ``fetchdf()`` materializes as
    float64 against Spark's int64.  Flag any column whose numpy *kind*
    differs across the two frames (int/uint unified; pairs involving
    ``object`` are skipped — strings, Decimals, dates and lists all
    legitimately materialize as object on one side only).
    """
    problems = []
    for c in sorted(set(sdf_pd.columns) & set(odf_pd.columns)):
        ka = sdf_pd[c].dtype.kind
        kb = odf_pd[c].dtype.kind
        ka = "i" if ka == "u" else ka
        kb = "i" if kb == "u" else kb
        if ka != kb and "O" not in (ka, kb):
            problems.append(
                f"dtype diff col={c}: spark={sdf_pd[c].dtype} "
                f"oracle={odf_pd[c].dtype} (driver hash would mismatch)")
    return problems


def compare(name, sdf_pd, odf_pd):
    problems = []
    if len(sdf_pd) != len(odf_pd):
        problems.append(f"row count: spark={len(sdf_pd)} oracle={len(odf_pd)}")
    sc, oc = sorted(sdf_pd.columns), sorted(odf_pd.columns)
    if sc != oc:
        problems.append(f"columns: spark={sc} oracle={oc}")
        return problems
    problems.extend(dtype_problems(sdf_pd, odf_pd))
    if problems:
        return problems
    s, o = normalize(sdf_pd), normalize(odf_pd)
    max_float_diff = 0.0
    for c in s.columns:
        sv, ov = s[c].tolist(), o[c].tolist()
        for i, (a, b) in enumerate(zip(sv, ov)):
            a_nan = isinstance(a, float) and math.isnan(a)
            b_nan = isinstance(b, float) and math.isnan(b)
            an = a is None or a_nan or (a != a if not isinstance(a, (list, dict)) else False)
            bn = b is None or b_nan or (b != b if not isinstance(b, (list, dict)) else False)
            if an and bn:  # both null-ish (None / NaN / NaT)
                continue
            if a != b:
                if isinstance(a, float) and isinstance(b, float):
                    max_float_diff = max(max_float_diff, abs(a - b))
                    if abs(a - b) > 0:
                        problems.append(f"float diff col={c} row={i}: {a!r} vs {b!r}")
                        if len(problems) > 6:
                            return problems
                else:
                    problems.append(f"value diff col={c} row={i}: {a!r} vs {b!r}")
                    if len(problems) > 6:
                        return problems
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) else "/root/testdata/sf0.01"
    args = [a for a in sys.argv[1:] if not os.path.isdir(a)]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2:]
    only = set(args)

    import duckdb

    import __spark_entry__ as entrymod
    from dataqtor_spark.session import get_spark
    from tools.tie_audit import dtype_gate

    # pre-flight: the HUGEINT/DECIMAL census is a hard gate — an uncast
    # sum() in any oracle would hash-mismatch at the driver even when
    # every value compares equal, so it must not even be runnable here
    gate = dtype_gate(sf_dir)
    if gate:
        for v in gate:
            print(f"  {v}", file=sys.stderr)
        raise SystemExit(
            f"DTYPE-CENSUS-GATE: {len(gate)} violation(s) — fix the "
            f"oracle casts (tools/tie_audit.py) before running the "
            f"oracle compare")

    spark = get_spark("check_oracle")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    n_pass = n_fail = n_noracle = 0
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            results[name] = {"status": "fail", "err": f"spark: {e}"}
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle — rows-only check)")
            results[name] = {"status": "rows_only", "rows": len(sdf)}
            n_noracle += 1
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            results[name] = {"status": "fail", "err": f"oracle: {e}"}
            n_fail += 1
            continue
        problems = compare(name, sdf, odf)
        if problems:
            print(f"FAIL  {name}:")
            for p in problems[:7]:
                print(f"      {p}")
            results[name] = {"status": "fail", "problems": problems[:7]}
            n_fail += 1
        else:
            print(f"PASS  {name} ({len(sdf)} rows)")
            results[name] = {"status": "pass", "rows": len(sdf)}
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "n_pass": n_pass, "n_fail": n_fail,
                       "n_rows_only": n_noracle, "results": results},
                      f, indent=1, default=str)
        print(f"wrote {json_out}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
