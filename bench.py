"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Headline set: the operator families that dominate real workloads —
fused profiling, fused rule evaluation (email/phone expression trees),
violation union, dedup (exact jaccard + minhash), ANN top-k, windowed
aggregation, and the TF-IDF similarity self-join.  Each query runs to
completion (count/collect of the final small result) after a warmup that
absorbs session + JIT startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "a03_null_profile_customer",
    "a05_describe_lineitem",
    "a11_pattern_profile_cname",
    "r03_dq_summary_customer",
    "r08_email_rule",
    "r12_phone_rule_classes",
    "u01_violations_union",
    "o01_sort_topk",
    "f11_date_parts",
    "j02_gender_enrich",
    "t02_quality_features",
    "t04_fingerprint_clusters",
    "d02_ngram_jaccard_pairs",
    "d02b_ngram_jaccard_cut",
    "d03_minhash_pairs",
    "ann01_brute_topk",
    "ann03_ivf_topk",
    "a13_similar_strings",
    "s01_window_agg_events",
    "s03_sessionize_events",
    "a00_full_profile_lineitem",
    "pr02_pearson_correlations",
    "p03_typed_search_orders",
    "t05_training_pipeline",
    "x01_json_extract_props",
    "j05_asof_join_events",
    "j06_range_join_sessions",
    "s05_event_rollup",
    "h01_pricing_summary",
    "h07_volume_shipping",
    "h21_waiting_suppliers",
    "t23_bm25_search",
    "cdc01_snapshot_diff",
    "sg01_suggest_constraints",
    "mb01_copurchase_pairs",
    "s11_session_bounce_rate",
    "th01_audience_overlap",
    "kll01_quantile_rollup",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    from dataqtor_spark.queries import QUERIES
    from dataqtor_spark.session import get_spark

    spark = get_spark("dataqtor-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # per-query warmup at the smallest SF immediately before timing: the
    # warm run compiles the query's codegen (Janino cache is keyed on
    # generated source, which is data-independent), and warming right
    # before the timed run keeps those entries from being evicted by other
    # queries' compilation (the cache holds 100 classes) — so each timing
    # is that query's steady state, not one-time JIT
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir

    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        fn(spark, warm_dir).count()
        samples: list[float] = []
        n = 0
        # best-of-2 damps machine-load noise (~±15%); sub-0.5s queries get
        # 5 samples so scheduler jitter is distinguishable from a real
        # regression (their round-over-round deltas are jitter-sized)
        while len(samples) < (2 if not samples or min(samples) >= 0.5 else 5):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            samples.append(time.perf_counter() - t0)
        best = min(samples)
        mean = sum(samples) / len(samples)
        sd = (sum((s - mean) ** 2 for s in samples) / len(samples)) ** 0.5
        timings[name] = round(best, 3)
        spreads[name] = round(sd, 3)
        print(f"# {name}: {timings[name]:.3f}s ±{sd:.3f} "
              f"(n={len(samples)}, {n} rows)", file=sys.stderr)
        # isolate queries: drop persisted intermediates (e.g. minhash
        # signatures) so later timings don't pay earlier queries' cache
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "stddev": spreads,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))


if __name__ == "__main__":
    main()
