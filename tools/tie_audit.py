"""Rounding-tie proximity audit over every oracle's round() inputs.

The r9 driver gate lost `t17_source_mix` to a cross-engine rounding flake:
a double fed to round(x, 6) sat 7.3e-10 ABOVE the .5 tie at the 6th
decimal, and two correct engines rounded it opposite ways.  Any hashed
output whose value passes through ``round(<double>, k)`` within ~1e-9 of a
half-tie is not portable, however correct each engine is.

This tool finds the next such knife-edge BEFORE the driver does.  It
rewrites every registered oracle's SQL so each ``round(x[, k])`` call is
served by an instrumented DuckDB Python UDF that (a) returns the normal
half-away-from-zero rounding, preserving query semantics, and (b) records
the PRE-round argument; after the run, every recorded (value, scale) pair
with ``|frac(|v| * 10^k) - 0.5| < 1e-9`` is reported with its query name.
Instrumenting the call site (rather than inspecting rounded outputs, which
are already snapped to the grid) sees the dangerous value in its exact row
context, including round() calls buried in CTEs that feed binning or
comparisons downstream.

Exit code 0 = no hashed round() input near a tie at either SF.

Usage: python tools/tie_audit.py [sf_dir ...]   (default: sf0.01 + sf0.001)
"""

from __future__ import annotations

import math
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

TIE_EPS = 1e-9

# Queries whose flagged round() executes in DECIMAL space in BOTH dialects
# (Spark F.round(<decimal sum>, k) and DuckDB round(sum(<DECIMAL>), k)) —
# exact half-away rounding of an exact decimal, no double ever exists in
# the real query.  The audit UDF's DOUBLE signature casts the decimal
# argument, manufacturing a near-tie artifact.  Hits here are accepted
# ONLY if _is_decimal_tie() verifies the double is the cast of a ≤12-digit
# decimal sitting exactly ON the tie; anything else still flags.
DECIMAL_SPACE_ROUNDS = {"dsir01_importance_select",
                        # same final round(sum(DECIMAL c·lr), 6) as dsir01
                        # — bucketing changes the feature keys, not the
                        # decimal-space accumulation
                        "dsir02_hashed_importance"}

_hits: list[tuple[float, int, float]] = []  # (value, scale, exact_tie_dist)
_true_ties = 0  # exact rational ties — provably portable, see below


def _is_decimal_tie(v: float, k: int) -> bool:
    """True iff ``v`` is (within 2 double-ulps) the cast of a decimal of
    ≤12 fractional digits that sits EXACTLY on the .5 tie at scale k —
    the signature of a decimal-space round seen through a double cast."""
    from fractions import Fraction

    f = Fraction(v)
    m = round(f * 10 ** 12)  # nearest 12-digit decimal
    if abs(f - Fraction(m, 10 ** 12)) > Fraction(abs(v) or 1) * Fraction(
            1, 2 ** 51):  # ~2 ulps
        return False
    grid = 10 ** (12 - k)
    return m % grid == 5 * grid // 10


def _tie_dist_exact(v: float, k: int):
    """EXACT distance of |v|·10^k's fractional part from the .5 tie.

    Uses the double's exact binary-rational expansion (Fraction), not a
    float multiply — the float multiply is itself the error source being
    audited.  Distinguishes two cases:

    * d == 0: the double's exact decimal expansion terminates in ...5 at
      scale k+1.  Then x·10^k's true value is a half-integer, which is
      binary-representable, so an IEEE multiply reproduces it exactly and
      BOTH engines see a true tie — and both Spark (BigDecimal HALF_UP)
      and DuckDB (half-away-from-zero) break positive/negative ties away
      from zero.  Portable; counted but not flagged.
    * 0 < d < TIE_EPS: the t17 class — one engine's exact-expansion
      rounding and the other's float-multiply rounding can land on
      opposite sides of the tie.  Flagged.
    """
    from fractions import Fraction

    f = abs(Fraction(v)) * Fraction(10) ** k
    frac = f - (f.numerator // f.denominator)
    return abs(float(frac - Fraction(1, 2)))


def _audit_round2(x: float | None, k: int | None) -> float | None:
    global _true_ties
    if x is None or k is None or math.isnan(x) or math.isinf(x):
        return x
    # cheap float screen first; exact Fraction math only near the tie
    if abs(abs(x * (10.0 ** k)) % 1.0 - 0.5) < 1e-6:
        d = _tie_dist_exact(x, k)
        if d == 0.0:
            _true_ties += 1
        elif d < TIE_EPS:
            _hits.append((x, k, d))
    s = 10.0 ** k
    return math.copysign(math.floor(abs(x) * s + 0.5) / s, x)


def _audit_round1(x: float | None) -> float | None:
    return _audit_round2(x, 0)


def instrument_sql(sql: str) -> str:
    """Rename each round(...) call to the matching-arity audit UDF."""
    out, pos = [], 0
    for m in re.finditer(r"\bround\s*\(", sql, re.I):
        if m.start() < pos:
            continue
        i, depth, args = m.end(), 1, 1
        while depth:
            c = sql[i]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif c == "," and depth == 1:
                args += 1
            elif c == "'":  # skip string literals
                i += 1
                while sql[i] != "'":
                    i += 1
            i += 1
        fn = "__audit_round1" if args == 1 else "__audit_round2"
        out.append(sql[pos:m.start()])
        out.append(fn + "(")
        pos = m.end()
    out.append(sql[pos:])
    return "".join(out)


def run(sf_dir: str) -> tuple[int, int, list[str]]:
    import duckdb

    from dataqtor_spark import queries as Q

    con = duckdb.connect()
    con.create_function("__audit_round1", _audit_round1,
                        ["DOUBLE"], "DOUBLE", null_handling="special")
    con.create_function("__audit_round2", _audit_round2,
                        ["DOUBLE", "INTEGER"], "DOUBLE",
                        null_handling="special")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    n_ok = n_skip = 0
    flagged: list[str] = []
    for name, sql in Q.ORACLES.items():
        inst = instrument_sql(sql)
        if "__audit_round" not in inst:
            continue  # no round() anywhere — nothing to audit
        _hits.clear()
        try:
            con.execute(inst).fetchall()
        except Exception as e:  # decimal-typed round the UDF can't take, etc.
            print(f"SKIP  {name}: {str(e).splitlines()[0][:120]}")
            n_skip += 1
            continue
        hits = list(_hits)
        if hits and name in DECIMAL_SPACE_ROUNDS:
            ok = [h for h in hits if _is_decimal_tie(h[0], h[1])]
            if ok:
                print(f"INFO  {name}: {len(ok)} decimal-space tie(s) "
                      f"(exact decimal rounding in both dialects — safe)")
            hits = [h for h in hits if not _is_decimal_tie(h[0], h[1])]
        if hits:
            worst = min(hits, key=lambda h: h[2])
            print(f"FLAG  {name}: {len(hits)} round() input(s) within "
                  f"{TIE_EPS} of a half-tie; worst {worst[0]!r} at scale "
                  f"{worst[1]} (dist {worst[2]:.2e})")
            flagged.append(name)
        else:
            n_ok += 1
    return n_ok, n_skip, flagged


def census(sf_dir: str) -> dict[str, list[str]]:
    """Float-OUTPUT census: every hashed oracle column typed
    DOUBLE/FLOAT/REAL, per query.  The round()-input audit above sees
    values flowing through round() calls; this census enumerates the
    complementary exposure — which queries put ANY float in the hashed
    surface at all (each one is a place a future edit could drop the
    rounding, or an engine could canonicalize a double differently).
    ``DESCRIBE`` infers the schema without executing, so the census is
    instant at any SF."""
    import duckdb

    from dataqtor_spark import queries as Q

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    out: dict[str, list[str]] = {}
    n_int_only = 0
    for name, sql in Q.ORACLES.items():
        try:
            rows = con.execute("DESCRIBE " + sql).fetchall()
        except Exception as e:
            print(f"SKIP  {name}: {str(e).splitlines()[0][:120]}")
            continue
        dbls = [r[0] for r in rows if r[1] in ("DOUBLE", "FLOAT", "REAL")]
        if dbls:
            out[name] = dbls
            print(f"FLOAT {name}: {', '.join(dbls)}")
        else:
            n_int_only += 1
    print(f"--- {n_int_only} queries expose no float column; "
          f"{len(out)} expose {sum(len(v) for v in out.values())} "
          f"float column(s) (each must round at a pinned scale in BOTH "
          f"dialects, or be migrated to a scaled-integer surface like "
          f"t17's ppm)")
    return out


# DECIMAL output columns whose Spark twin mirrors the exact type/scale so
# both clients materialize identically (verified driver-green).  Any OTHER
# DECIMAL — and any HUGEINT at all — is a gate failure: DuckDB's
# ``fetchdf()`` hands HUGEINT to the driver as float64 while Spark emits
# int64, so the hash mismatches even when every value compares equal
# (the four-round t17_source_mix red, root-caused in round 12).
DTYPE_DECIMAL_ALLOW = {
    "b08_touch_attribution": {"revenue"},      # DECIMAL(38,2), Spark twin decimal(38,2)
    "s14_windowed_quantile_sketch": {"q"},     # DECIMAL(3,2) literal quantile labels
    "kll01_quantile_rollup": {"q"},            # DECIMAL(3,2) literal quantile labels
}


def dtype_gate(sf_dir: str) -> list[str]:
    """Hard gate: no oracle output column may be HUGEINT, and DECIMAL
    outputs must be allowlisted (= proven to mirror Spark's DECIMAL).
    ``DESCRIBE`` infers the schema without executing, so this is instant.
    """
    import duckdb

    from dataqtor_spark import queries as Q

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    violations: list[str] = []
    for name, sql in Q.ORACLES.items():
        try:
            rows = con.execute("DESCRIBE " + sql).fetchall()
        except Exception as e:
            violations.append(f"{name}: DESCRIBE failed: "
                              f"{str(e).splitlines()[0][:120]}")
            continue
        for col, typ in ((r[0], r[1]) for r in rows):
            if typ == "HUGEINT":
                violations.append(
                    f"{name}.{col}: HUGEINT output (fetchdf() -> float64 "
                    f"vs Spark int64 — cast ::BIGINT in the oracle)")
            elif (typ.startswith("DECIMAL")
                  and col not in DTYPE_DECIMAL_ALLOW.get(name, ())):
                violations.append(
                    f"{name}.{col}: unallowlisted {typ} output (verify the "
                    f"Spark twin mirrors it, then allowlist)")
    return violations


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--census"]
    if "--census" in sys.argv[1:]:
        census(args[0] if args else "/root/testdata/sf0.001")
        return 0
    sf_dirs = args or ["/root/testdata/sf0.01", "/root/testdata/sf0.001"]
    bad = False
    viol = dtype_gate(sf_dirs[0])
    for v in viol:
        print(f"DTYPE {v}")
    print(f"dtype census: {len(viol)} violation(s)")
    bad |= bool(viol)
    for sf in sf_dirs:
        print(f"=== {sf} ===")
        n_ok, n_skip, flagged = run(sf)
        print(f"{n_ok} clean, {n_skip} skipped, {len(flagged)} flagged"
              + (f": {flagged}" if flagged else ""))
        bad |= bool(flagged)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
