"""Adversarial hot-key probe for the window-device families (round-15
verdict items 1 and 8).

The uniform 100x probe (tools/scale_probe_100x.py) deliberately keeps
token windows DISJOINT across replica copies, so the shared-span set
grows k-fold — which is exactly the shape that never stresses a hot key.
Real 100 TB web corpora are the opposite: ONE boilerplate span (a license
header, a site footer) appears in a large fraction of all documents, so
whatever marks "this window is shared" sees one key holding millions of
rows.  This probe plants that shape:

* documents: ONE fixed 11-token boilerplate sentence is prepended to 50 %
  of all docs (even doc_id), at 1x / 10x / 100x corpus scale — the
  11-token prefix yields 4 fully-internal 8-token windows and 1 fully-
  boilerplate 10-token chunk (chunk 0) shared by half the corpus.
  Probed: t16_repeated_spans,
  t40_exact_substring_scrub, t20_paragraph_dedup (the post-rewrite
  partial-agg marker), plus a CONTRAST arm reproducing the pre-round-15
  ``Window.partitionBy(hash)`` marker — a window function cannot
  partially aggregate and AQE cannot split a window partition, so the
  planted span lands every occurrence in one task.
* events: ONE hot user is assigned 25 % of all event rows (bot traffic),
  at 1x / 10x.  Probed: s03_sessionize_events (a per-entity SEQUENCE
  window — the partition is the operator's semantics; growth documents
  the inherent per-entity cost every engine pays, cf. Flink keyed state),
  s10_windowed_topk and s14_windowed_quantile_sketch (rank windows over
  the POST-AGGREGATE windows x groups table — the hot key is absorbed by
  map-side partial aggregation before any window runs, so these must
  stay flat).

All arms are timed through the noop sink (never ``count()`` — Catalyst
prunes computed columns out of a count, see bench.MATERIALIZE).

Usage: python tools/span_skew_probe.py [sf_dir] [replica_work_dir]
Rewrites the '## Adversarial hot-key probe' section of SCALE_PROBE.md.
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

MARK = "## Adversarial hot-key probe (window devices)"

# 11 whitespace tokens; prepended to even doc_ids.  With span_tokens=8
# (t16/t40) windows starting at 1..4 are fully inside the prefix — four
# hash keys each held by 50% of the corpus; with chunk_tokens=10 (t20)
# chunk 0 falls entirely inside the prefix — one md5 key held by 50% of
# the corpus (later chunks shift one token into doc text and stay
# per-doc unique).
BOILER = ("standard license header do not remove this notice "
          "all rights reserved")

HOT_USER = 777_777_777


def _plant_documents(df):
    return df.withColumn(
        "text",
        F.when(F.col("doc_id") % 2 == 0,
               F.concat(F.lit(BOILER + " "), F.col("text").cast("string")))
        .otherwise(F.col("text").cast("string")))


def _plant_events(df):
    return df.withColumn(
        "user_id",
        F.when(F.col("event_id") % 4 == 0, F.lit(HOT_USER))
        .otherwise(F.col("user_id")))


ALL_TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]


def build_planted(spark, base_dir: str, out_dir: str) -> None:
    """Planted copy of ``base_dir``: documents get the boilerplate prefix
    in 50% of rows, events get the hot user on 25% of rows, everything
    else is symlinked.  Reuse is keyed on the base path PLUS content
    fingerprints of the planted tables — a reused dir from a different
    or regenerated base would silently measure stale data."""
    from dataqtor_spark.queries import _corpus_fingerprint

    # key on the base dir's CONTENT fingerprint, not just its path —
    # testdata regenerates between rounds, and a path-only key would
    # silently reuse a stale planted corpus (the bpe03 cache lesson)
    want = (f"{base_dir}\n"
            f"{_corpus_fingerprint(f'{base_dir}/documents.parquet')}\n"
            f"{_corpus_fingerprint(f'{base_dir}/events.parquet')}")
    key = os.path.join(out_dir, "_base")
    if os.path.isdir(out_dir) and os.path.exists(key) \
            and open(key).read() == want:
        return
    os.makedirs(out_dir, exist_ok=True)
    for t in ALL_TABLES:
        dst = f"{out_dir}/{t}.parquet"
        if t == "documents":
            _plant_documents(spark.read.parquet(f"{base_dir}/{t}.parquet")) \
                .write.parquet(dst, mode="overwrite")
        elif t == "events":
            _plant_events(spark.read.parquet(f"{base_dir}/{t}.parquet")) \
                .write.parquet(dst, mode="overwrite")
        else:
            if os.path.islink(dst):
                os.unlink(dst)
            if not os.path.exists(dst):
                os.symlink(os.path.realpath(f"{base_dir}/{t}.parquet"), dst)
    with open(key, "w") as f:
        f.write(want)


def repeated_spans_window_marker(df, span_tokens: int = 8):
    """The PRE-round-15 shape of textstats.repeated_spans, kept ONLY as
    this probe's contrast arm: marks shared windows with
    ``Window.partitionBy(hash)`` min/max analytics, so every occurrence
    of a hot hash lands in one window partition no runtime can split."""
    from pyspark.sql.window import Window

    from dataqtor_spark.operators.textstats import _clean_tokens
    from dataqtor_spark.session import parallelize

    base = (parallelize(df.select(F.col("doc_id").alias("__id"),
                                  _clean_tokens("text").alias("__tk")))
            .withColumn("__n", F.size("__tk")))
    wins_expr = F.when(
        F.col("__n") >= span_tokens,
        F.transform(F.sequence(F.lit(1), F.col("__n") - (span_tokens - 1)),
                    lambda s: F.xxhash64(F.concat_ws(
                        " ", F.slice(F.col("__tk"), s, span_tokens)))))
    ex = base.select("__id", F.explode(wins_expr).alias("__h"))
    wh = Window.partitionBy("__h")
    multi = F.min("__id").over(wh) != F.max("__id").over(wh)
    per = (ex.withColumn("__multi", multi)
           .groupBy("__id")
           .agg(F.sum(F.col("__multi").cast("long")).alias("__shared")))
    tot = base.select("__id",
                      F.when(F.col("__n") >= span_tokens,
                             F.col("__n") - (span_tokens - 1))
                      .otherwise(F.lit(0)).alias("n_windows"))
    return (tot.join(per, "__id", "left")
            .select(F.col("__id").alias("doc_id"),
                    F.col("n_windows").cast("long").alias("n_windows"),
                    F.coalesce(F.col("__shared"), F.lit(0)).cast("long")
                    .alias("n_shared_windows")))


def timed_noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicas = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_probe_100x"
    work = "/tmp/span_skew_probe"

    from dataqtor_spark.queries import QUERIES
    from dataqtor_spark.session import get_spark
    from tools.scale_probe_100x import build_dir

    spark = get_spark("span-skew-probe")
    spark.sparkContext.setLogLevel("ERROR")

    dirs = {}
    for k in (1, 10, 100):
        base = sf_dir if k == 1 else f"{replicas}/k{k}"
        if k > 1:
            build_dir(spark, sf_dir, base, k)
        planted = f"{work}/p{k}"
        print(f"building planted dir {planted} (base {base})",
              file=sys.stderr)
        build_planted(spark, base, planted)
        dirs[k] = planted

    doc_arms = [
        ("t16_repeated_spans (partial-agg)", "docs",
         lambda d: QUERIES["t16_repeated_spans"](spark, d), (1, 10, 100)),
        ("t16 window-marker (pre-r15 contrast)", "docs",
         lambda d: repeated_spans_window_marker(
             spark.read.parquet(f"{d}/documents.parquet")), (1, 10, 100)),
        ("t40_exact_substring_scrub", "docs",
         lambda d: QUERIES["t40_exact_substring_scrub"](spark, d),
         (1, 10, 100)),
        ("t20_paragraph_dedup", "docs",
         lambda d: QUERIES["t20_paragraph_dedup"](spark, d), (1, 10, 100)),
        ("s03_sessionize_events (per-entity seq)", "hot user",
         lambda d: QUERIES["s03_sessionize_events"](spark, d), (1, 10)),
        ("s10_windowed_topk (post-agg rank)", "hot user",
         lambda d: QUERIES["s10_windowed_topk"](spark, d), (1, 10)),
        ("s14_windowed_quantile_sketch (post-agg)", "hot user",
         lambda d: QUERIES["s14_windowed_quantile_sketch"](spark, d),
         (1, 10)),
    ]

    results = {}
    for label, plant, fn, ks in doc_arms:
        timed_noop(fn(dirs[1]))            # codegen warm
        results[label] = {}
        for k in ks:
            dt = timed_noop(fn(dirs[k]))
            results[label][k] = dt
            print(f"{label} @{k}x: {dt:.2f}s", file=sys.stderr)

    lines = [
        MARK, "",
        "The uniform replicas keep shingles DISJOINT across copies, so no",
        "hot key ever forms — this probe plants the real-world hot-key",
        "shapes instead.  Documents: ONE 10-token boilerplate sentence",
        "prepended to 50% of ALL docs (3 shared 8-token window hashes +",
        "1 shared 10-token chunk hash, each held by half the corpus, at",
        "1x/10x/100x).  Events: ONE user assigned 25% of all rows (1x/10x).",
        "Timed through the noop sink; growth is vs the same arm at 1x.",
        "",
        "| arm | plant | t 1x (s) | t 10x (s) | g10 | t 100x (s) | g100 |",
        "|---|---|---|---|---|---|---|",
    ]
    for label, plant, fn, ks in doc_arms:
        r = results[label]
        g10 = r[10] / r[1] if r[1] > 0 else float("inf")
        if 100 in r:
            t100, g100 = f"{r[100]:.2f}", f"{r[100] / r[1]:.1f}x"
        else:
            t100, g100 = "—", "—"
        lines.append(f"| {label} | {plant} | {r[1]:.2f} | {r[10]:.2f} | "
                     f"{g10:.1f}x | {t100} | {g100} |")
    lines += [
        "",
        "Reading: the partial-agg ExactSubstr paths must track the uniform",
        "probe's growth (the hot hash collapses to one row per (hash, doc)",
        "per map task before the shuffle; AQE splits any residual hot",
        "reduce partition) while the pre-r15 window-marker contrast arm",
        "concentrates every planted occurrence in ONE window partition —",
        "its gap vs the partial-agg arm is the cost the rewrite removed,",
        "and it widens with scale because the hot partition grows k-fold",
        "in a single task.  s10/s14 stay flat under the hot user: their",
        "rank windows run over the post-aggregate (window x group) table,",
        "so the hot key is absorbed by map-side partials — the partition",
        "key is provably bounded (|windows| x |groups|).  s03's growth is",
        "the per-entity sequence semantics itself (one user's ordered",
        "history IS the partition); that cost is inherent to sessionization",
        "in any engine and is bounded by per-entity history, not corpus",
        "size.  Full window-device inventory and boundedness notes:",
        "",
        "* query_id rank windows (ann.py x16, sel02) — bounded by the",
        "  per-query shortlist/bucket caps by construction.",
        "* post-aggregate rank windows (s10/s14, b05, o05's 3-status key,",
        "  rules.py violation sampling) — run on tables already reduced",
        "  by a partial-agg groupBy; partition sizes are group counts,",
        "  not row counts.",
        "* per-entity sequence windows (s03/s08/b-series, cdc02, scd2,",
        "  asof, streaming profiler) — the partition IS the operator's",
        "  semantics (per-key ordered history); cost scales with the",
        "  hottest entity's history in every engine.  Probed above (s03).",
        "* connected-component representative picks (dedup.py:966) — the",
        "  component table is pair-derived and every pair generator is",
        "  capped (max_doc_freq / max_bucket_size), bounding components.",
        "* Window.partitionBy() totals (profile.py, textstats idf) — run",
        "  on bounded aggregate tables (bins / vocab tops), never raw rows.",
        "",
    ]

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_PROBE.md")
    text = open(path).read() if os.path.exists(path) else "# SCALE_PROBE\n\n"
    block = "\n".join(lines)
    if MARK in text:
        text = re.sub(re.escape(MARK) + r".*?(?=\n## |\Z)", block,
                      text, flags=re.S)
    else:
        text = text.rstrip("\n") + "\n\n" + block
    with open(path, "w") as f:
        f.write(text)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
