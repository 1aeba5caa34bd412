"""Repair operators (SURVEY.md §2.8 F1–F9/F14, §2.2 P1/P2, §2.6 O1) and the
lineage-based repair session.

The reference mutates its single cached pandas table in place
(/root/reference/home.py:109,1386,1396,1422,1495,1596); here every repair is
a pure ``DataFrame -> DataFrame`` transform and :class:`RepairSession` holds
the current lineage head — "before vs after" scoring is just two lineage
points (SURVEY §3 engine mapping).  All transforms are Catalyst expressions:
a chain of N repairs is still ONE projection after optimization (collapsed
by Catalyst), not N passes.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dataqtor_spark.session import ROW_ID

# the 9 metacharacters the reference escapes when given as the whole input
# (home.py:1651-1690) — note it escapes ONLY exact single-char inputs;
# longer inputs are treated as regex verbatim.  We mirror that contract.
_ESCAPED_SINGLE = {"(", "?", "|", "[", "+", ")", "*", "^", "$"}


def _escape_find(pat: str) -> str:
    if pat in _ESCAPED_SINGLE:
        return "\\" + pat
    return pat


# --- F1/F2 — case transforms (home.py:1590-1617) ---------------------------

def title_case(df: DataFrame, col: str) -> DataFrame:
    """F1 — ``initcap`` (word = whitespace-delimited).

    Fidelity note (SURVEY §7): pandas ``str.title`` re-capitalizes after ANY
    non-letter (``o'neil`` → ``O'Neil``); ``initcap`` only after whitespace,
    and Turkish dotted-İ casing follows the JVM locale.  Documented
    deviation — the declarative form keeps the transform in codegen.
    """
    return df.withColumn(col, F.initcap(F.col(col)))


def lower_case(df: DataFrame, col: str) -> DataFrame:
    return df.withColumn(col, F.lower(F.col(col)))


def upper_case(df: DataFrame, col: str) -> DataFrame:
    return df.withColumn(col, F.upper(F.col(col)))


# --- F3 — collapse multi-spaces (home.py:1619-1628) ------------------------

def collapse_spaces(df: DataFrame, col: str) -> DataFrame:
    return df.withColumn(col, F.regexp_replace(F.col(col), " +", " "))


# --- F4 — strip characters (home.py:1630-1639) -----------------------------

def strip_chars(df: DataFrame, col: str, chars: str | None = None) -> DataFrame:
    """pandas ``str.strip(chars)`` — remove any of the char set from both
    ends; None strips whitespace.  Spark ``btrim`` has identical semantics."""
    c = F.col(col)
    out = F.trim(c) if chars is None else F.btrim(c, F.lit(chars))
    return df.withColumn(col, out)


# --- F5 — find/replace with match count (home.py:1641-1696) ----------------

def replace_count(df: DataFrame, col: str, find: str) -> DataFrame:
    """A17 — total regex match count before replacing (home.py:1693)."""
    pat = _escape_find(find)
    return df.agg(
        F.coalesce(F.sum(F.regexp_count(F.col(col), F.lit(pat))), F.lit(0))
        .alias("n_matches")
    )


def find_replace(df: DataFrame, col: str, find: str, replace: str) -> DataFrame:
    """Regex find/replace; ``replace='none'`` removes the match (reference
    UI contract, home.py:1671-1672)."""
    pat = _escape_find(find)
    rep = "" if replace == "none" else replace
    return df.withColumn(col, F.regexp_replace(F.col(col), pat, rep))


# --- F6 — leading-char strip (phone corrector, home.py:1698-1708) ----------

def strip_leading_char(df: DataFrame, col: str, ch: str) -> DataFrame:
    c = F.col(col).cast("string")
    return df.withColumn(
        col, F.when(c.startswith(ch), F.substring(c, 2, 2147483646)).otherwise(c)
    )


# --- F7 — cell update by row id (home.py:1401-1470) ------------------------

def update_cell(df: DataFrame, row_id: int, col: str, value: Any,
                id_col: str = ROW_ID) -> DataFrame:
    return df.withColumn(
        col,
        F.when(F.col(id_col) == row_id, F.lit(value)).otherwise(F.col(col)),
    )


# --- F8 — value remap / fill-null / delete-matching (home.py:1472-1582) ----

def remap_value(df: DataFrame, col: str, old: Any, new: Any) -> DataFrame:
    c = F.col(col)
    return df.withColumn(col, F.when(c == F.lit(old), F.lit(new)).otherwise(c))


def value_to_null(df: DataFrame, col: str, old: Any) -> DataFrame:
    return df.withColumn(col, F.nullif(F.col(col), F.lit(old)))


def fill_nulls(df: DataFrame, col: str, value: Any) -> DataFrame:
    return df.withColumn(col, F.coalesce(F.col(col), F.lit(value)))


def delete_matching_rows(df: DataFrame, col: str, value: Any) -> DataFrame:
    c = F.col(col)
    return df.filter((c != F.lit(value)) | c.isNull())


# --- F9 / P2 / P1 — row drop, column drop, projection ----------------------

def drop_rows(df: DataFrame, row_ids: list[int], id_col: str = ROW_ID) -> DataFrame:
    return df.filter(~F.col(id_col).isin(row_ids))


def drop_column(df: DataFrame, col: str) -> DataFrame:
    return df.drop(col)


def project(df: DataFrame, cols: list[str]) -> DataFrame:
    """P1 — keep + reorder columns (home.py:2030-2034)."""
    return df.select(*cols)


# --- F14 — cast ------------------------------------------------------------

def cast_column(df: DataFrame, col: str, dtype: str) -> DataFrame:
    """Spark keeps NULL as NULL through casts — the reference's
    ``astype(str).replace('nan', NaN)`` repair idiom is unnecessary here."""
    return df.withColumn(col, F.col(col).try_cast(dtype))


# --- O1 — multi-column sort (home.py:1966-1978) ----------------------------

def sort_rows(df: DataFrame, cols: list[str], ascending: list[bool] | None = None) -> DataFrame:
    ascending = ascending or [True] * len(cols)
    order = [F.col(c).asc() if a else F.col(c).desc() for c, a in zip(cols, ascending)]
    return df.orderBy(*order)


# --- search predicates (P3–P6, home.py:1198-1377) --------------------------

def search(df: DataFrame, col: str, op: str, value: Any = None,
           low: Any = None, high: Any = None) -> DataFrame:
    """The corrector's search engine: typed comparison / equality / null /
    between filters."""
    c = F.col(col)
    if op == "==":
        return df.filter(c == F.lit(value))
    if op == ">=":
        return df.filter(c >= F.lit(value))
    if op == "<":
        return df.filter(c < F.lit(value))
    if op == "between":
        return df.filter(c.between(F.lit(low), F.lit(high)))
    if op == "isnull":
        return df.filter(c.isNull())
    if op == "row_id":
        return df.filter(F.col(ROW_ID) == F.lit(value))
    raise ValueError(f"unsupported op: {op}")


# --- lineage session -------------------------------------------------------

def impute_by_group(df: DataFrame, col: str, keys: list[str],
                    strategy: str = "mean") -> DataFrame:
    """Group-aware null imputation: fill NULLs in ``col`` with the group's
    ``mean`` (DECIMAL-accumulated, order-independent) or ``median`` (exact
    interpolated percentile) over the non-null rows of the same ``keys``
    group — the statistical upgrade of the reference's constant
    ``fill_nulls``.

    One groupBy over the keys builds the (small) per-group statistic table;
    it joins back broadcast-or-shuffled by AQE.  Groups that are entirely
    NULL have no statistic and keep their NULLs (documented; chain a
    constant ``fill_nulls`` for a global fallback).
    """
    from pyspark.sql import functions as F

    if strategy == "mean":
        stat = (F.sum(F.col(col).cast("decimal(18,2)")) / F.count(F.col(col))
                ).cast("double")
    elif strategy == "median":
        stat = F.percentile(F.col(col), F.lit(0.5))
    else:
        raise ValueError(f"unknown strategy: {strategy}")
    per = df.groupBy(*keys).agg(stat.alias("__fill"))
    return (df.join(per, keys, "left")
            .withColumn(col, F.coalesce(F.col(col), F.col("__fill")))
            .drop("__fill"))


class RepairSession:
    """Replaces the reference's in-place mutation with lineage.

    ``apply`` chains a transform onto the head; ``snapshot`` tags the current
    head (e.g. "before"/"after" for A15 scoring); ``checkpoint`` persists the
    head to break long lineages after expensive repair chains (the Spark
    equivalent of ``@st.cache`` on the mutated table, home.py:55).
    """

    def __init__(self, df: DataFrame):
        self._head = df
        self._snapshots: dict[str, DataFrame] = {}
        self._audit: list[dict] = []

    @property
    def df(self) -> DataFrame:
        return self._head

    def apply(self, fn, *args, **kwargs) -> "RepairSession":
        self._head = fn(self._head, *args, **kwargs)
        self._audit.append({
            "step": len(self._audit),
            "op": getattr(fn, "__name__", str(fn)),
            "args": ", ".join([repr(a) for a in args]
                              + [f"{k}={v!r}" for k, v in kwargs.items()]),
        })
        return self

    def audit_log(self) -> list[dict]:
        """Ordered record of every repair applied to this lineage — the
        governance trail the reference's in-place mutation loses
        (home.py applies edits destructively; here each step is a pure
        transform, so the log + the source REPRODUCES the head
        exactly)."""
        return list(self._audit)

    def snapshot(self, name: str) -> DataFrame:
        self._snapshots[name] = self._head
        return self._head

    def get_snapshot(self, name: str) -> DataFrame:
        return self._snapshots[name]

    def checkpoint(self) -> "RepairSession":
        self._head = self._head.persist()
        return self


def winsorize(df: DataFrame, col: str, lower_q: float = 0.05,
              upper_q: float = 0.95) -> DataFrame:
    """Clip ``col`` to its [lower_q, upper_q] exact quantiles (outlier
    repair that keeps rows instead of deleting them — the complement of
    the IQR/z-score *detectors* in profile/rules).

    The two cut points are ONE exact-percentile aggregate broadcast back
    over the table (crossJoin of a 1-row frame — never a collect), so the
    repair is a single scan + a map-side projection.  At 100 TB swap
    ``percentile`` for ``approx_percentile`` and keep the same shape.
    Adds ``{col}__clipped`` (flag) next to the clipped value.
    """
    cuts = df.agg(
        F.percentile(F.col(col), F.lit(lower_q)).alias("__lo"),
        F.percentile(F.col(col), F.lit(upper_q)).alias("__hi"))
    out = df.crossJoin(F.broadcast(cuts))
    clipped = F.least(F.greatest(F.col(col), F.col("__lo")), F.col("__hi"))
    return (out.withColumn(f"{col}__clipped",
                           F.col(col).isNotNull()
                           & ((F.col(col) < F.col("__lo"))
                              | (F.col(col) > F.col("__hi"))))
            .withColumn(col, clipped)
            .drop("__lo", "__hi"))


def render_report_markdown(report_df) -> str:
    """Render the before/after DQ report (``Workbench.report()`` output)
    as self-contained markdown — the engine-level stand-in for the
    reference's Streamlit gauge + bar charts (gaugeChart.py:19-110,
    home.py:1152-1191): per-measurement overall score with a text gauge,
    and the per-rule table.

    Driver-side by design: the report table is measurements × rules rows
    (tiny); the heavy work already happened in the fused rule
    evaluation.  Deterministic output — same report, same string.
    """
    rows = report_df.collect()
    by_m: dict = {}
    for r in rows:
        by_m.setdefault(r["measurement"], []).append(r)
    lines = ["# Data-quality report", ""]
    for m in sorted(by_m):
        rs = by_m[m]
        overall = rs[0]["overall_dq_score"]
        filled = int(round(overall / 5))
        gauge = "█" * filled + "░" * (20 - filled)
        lines += [f"## Measurement {m} — overall {overall:.2f}/100",
                  "", f"`{gauge}` {overall:.2f}", "",
                  "| rule | total | nulls | violations | score |",
                  "|---|---|---|---|---|"]
        for r in sorted(rs, key=lambda r: r["rule"]):
            lines.append(
                f"| {r['rule']} | {r['total_records']} | "
                f"{r['null_records']} | {r['out_of_format_records']} | "
                f"{r['dq_score']:.2f} |")
        lines.append("")
    if len(by_m) >= 2:
        first, last = min(by_m), max(by_m)
        d = (by_m[last][0]["overall_dq_score"]
             - by_m[first][0]["overall_dq_score"])
        lines.append(f"**Overall change: {d:+.2f} points** "
                     f"(measurement {first} → {last})")
        lines.append("")
    return "\n".join(lines)


def parse_locale_number(df: DataFrame, col: str, out_col: str | None = None,
                        decimal_comma: bool = True) -> DataFrame:
    """Parse locale-formatted number strings ('1.234,56' under tr/de
    convention) into doubles — the numeric twin of the reference's
    Turkish-locale string repairs (its data is tr-TR, home.py:580-601).

    Pure expression chain: strip grouping separators, swap the decimal
    comma, ``try_cast`` (unparseable → NULL, never an ANSI error) —
    whole-stage-codegen friendly, no UDF.  With ``decimal_comma=False``
    parses en-US style ('1,234.56').
    """
    c = F.col(col).cast("string")
    if decimal_comma:
        norm = F.replace(F.replace(c, F.lit("."), F.lit("")),
                         F.lit(","), F.lit("."))
    else:
        norm = F.replace(c, F.lit(","), F.lit(""))
    return df.withColumn(out_col or f"{col}_parsed",
                         norm.try_cast("double"))


def mask_columns(df, cols: list[str], salt: str = "",
                 length: int | None = 16):
    """Irreversibly pseudonymize columns: salted SHA-256 hex (optionally
    truncated) replaces each value; NULLs stay NULL.  Deterministic, so
    masked keys still JOIN and GROUP correctly across tables masked with
    the same salt — the property that makes masked analytics work at
    all.  Pure expressions (jvm-side sha2), no UDF.
    """
    from pyspark.sql import functions as F

    out = df
    for c in cols:
        h = F.sha2(F.concat(F.lit(salt), F.col(c).cast("string")), 256)
        if length:
            h = F.substring(h, 1, length)
        out = out.withColumn(c, F.when(F.col(c).isNotNull(), h))
    return out
