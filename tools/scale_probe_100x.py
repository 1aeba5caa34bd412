"""100x scale probe for the headline bench queries (round-4 verdict item:
SCALE_PROBE's 10x in-memory runs stop where fixed overhead still masks
super-linear terms).

Replicates the sf0.1 tables 10x and 100x TO PARQUET (so the probe
exercises the real registered queries end-to-end, scan pushdown
included), then times each query at 1x / 10x / 100x.  Growth factors
well beyond the replication factor flag a super-linear plan.

Replication preserves realistic data shape instead of planting
pathologies the queries would rightly be slow on:
  * documents: every word gets a per-copy suffix — copy-internal shingle
    structure (and so true near-dup pairs) is preserved, but NO shingle
    matches across copies, so the true pair count scales k-fold, not k².
  * part: per-copy vowel permutation on p_name — same length/character
    statistics, mostly-disjoint char 3-grams across copies.
  * lineitem/orders: order keys shift per copy (more orders over the
    same catalog/suppliers — how a fact table actually grows); partkey/
    suppkey cardinality intentionally constant so per-key load rises
    k-fold, stressing the aggregation paths the way 100 TB would.
  * other tables are symlinked unmodified (dims grow slower than facts).

Usage: python tools/scale_probe_100x.py [sf_dir] [work_dir]
Appends its section to SCALE_PROBE.md.
"""

from __future__ import annotations

import itertools
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

QUERY_NAMES = ["d02b_ngram_jaccard_cut", "d03_minhash_pairs",
               "a13_similar_strings", "mb01_copurchase_pairs",
               "h21_waiting_suppliers",
               # second tier: fused profile, sessionize, sketches, text
               "a00_full_profile_lineitem", "h01_pricing_summary",
               "s03_sessionize_events", "th01_audience_overlap",
               "kll01_quantile_rollup", "t05_training_pipeline",
               # rank-flavoured screens on the ordered_prefix primitive
               # (the round-6 de-funnel: prove no single-partition stage
               # re-appears as a wall at 100x)
               "pr03_spearman_correlations", "pr10_equi_depth_histogram",
               "b06_rfm_segments", "pareto01_revenue_concentration",
               "gap01_orderkey_gaps",
               # round-7 additions: compressed-codes ANN, limit-first
               # trigram rank, layout audit, URL canon, quality model,
               # attribution, windowed KLL
               "pq01_product_quantization", "ann06_ivfpq_topk",
               "b05_top_trigrams", "zorder01_curve_segments",
               "t30_url_canonical", "t31_quality_logistic",
               "b08_touch_attribution", "s14_windowed_quantile_sketch",
               # round-8 additions: Hilbert layout fold, BPE trainer
               # (vocab grows k-fold via the per-copy word suffixes),
               # mixture quotas, exact-MIPS linear scan, cross-modality
               # dedup report (text branch scales; the planted image/
               # audio slices are fixed-size by construction)
               "hilbert01_curve_segments", "bpe02_bpe_train",
               "mix01_domain_mixture", "ann08_mips_topk",
               "d11_multimodal_dedup_report",
               # round-9 additions (VERDICT r8 task 3): the expensive
               # newcomers that lacked probe rows — blocking quality,
               # tokenizer-true recount, two-stage rerank, span scrub,
               # DSIR selection, the at-rest IVF-PQ serving path, and
               # m07 (whose doc_id<200 video corpus is fixed-size BY
               # CONSTRUCTION — its row documents that bound, the
               # operator's scaling is d11's video leg / the skew probe)
               "er03_blocking_quality", "bpe03_tokenizer_token_counts",
               "ann09_two_stage_rerank", "t35_span_scrub",
               "dsir01_importance_select", "ann11_ivfpq_at_rest",
               "m07_video_frame_dedup",
               # round-10 addition: filtered ANN over the at-rest IVF
               # layout — serving must stay flat like ann11 (the filter
               # pushes into the pruned scan, never a post-read pass)
               "ann14_filtered_at_rest",
               "lm01_ngram_logprob", "ann15_sq8_at_rest",
               "d12_threshold_sensitivity", "ann16_nprobe_recall_sweep",
               "pr29_profile_drift", "t38_contamination_report",
               # round-12 additions: bucketed DSIR (feature state bounded
               # at B buckets — the groupBy key space stops growing with
               # vocabulary) and hybrid RRF retrieval (fusion cost is
               # fixed at 2*k_each rows; the probe measures the two legs)
               "dsir02_hashed_importance", "rrf01_hybrid_search",
               # 1-bit Hamming shortlist + exact rerank: the 8-byte scan
               # should grow ~linearly, the rerank stays queries×R flat
               "ann17_binary_rerank", "ann18_binary_at_rest",
               # split-leakage repair: the banded-LSH pair screen is the
               # cost driver; the repair itself is scalar aggregates
               "d13_split_leakage",
               # selection family: k-center = k bounded corpus scans
               # (expect ~linear), MMR = brute shortlist scan + fixed
               # per-query candidate work; lm02 = lm01's LM replayed as
               # a gate (linear in corpus tokens)
               "sel01_kcenter_diversity", "sel02_mmr_rerank",
               "sel03_cluster_balanced_sample", "lm02_perplexity_gate",
               # CMS heavy hitters: the grid aggregate is bounded at
               # depth×width cells; the exact-validation side is the
               # linear term
               "s19_cms_heavy_hitters",
               # r13: packing = distributed prefix sum (linear term) over
               # per-doc token counts; chunking = stateless explode
               "pack01_sequence_packing", "chunk01_doc_chunks",
               "pack02_length_buckets",
               # r14: substring scrub = t16's window-hash analytic plus a
               # bounded shared-starts join (linear in corpus tokens);
               # within-doc collapse = zero-shuffle array expressions;
               # embedding drift = dim-bounded centroid shuffle + one
               # broadcast join over the exploded view
               "t40_exact_substring_scrub", "t41_within_doc_collapse",
               "e05_embedding_drift",
               # budget planner = the exact-dedup groupBy (map-side
               # combinable) + a |sources|-row re-aggregate
               "t42_token_budget",
               # novelty = one 8-byte shingle-hash explode + a
               # reference-sized hash join
               "t43_ngram_novelty",
               # r15: containment = the d02 inverted index with the
               # asymmetric formula (same posting-list cost envelope);
               # card scan + fertility = single-projection linear passes
               "d14_containment_pairs", "pii03_payment_card_scan",
               "t44_tokenizer_fertility",
               # code-switch scan = chunk explode + per-chunk regex votes
               "t45_code_switch_scan",
               # sketch containment = the d03 banding pass + in-row sizes
               "d15_minhash_containment"]

AT_REST = {"ann11_ivfpq_at_rest", "ann14_filtered_at_rest",
           "ann15_sq8_at_rest", "ann18_binary_at_rest"}

ALL_TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]
REPLICATED = {"documents", "part", "lineitem", "orders", "events",
              "embeddings"}

_VOWEL_PERMS = ["".join(p) for p in itertools.permutations("aeiou")]


def _replicant(spark, sf_dir: str, table: str, i: int):
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    if i == 0:
        return df
    if table == "documents":
        return df.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000)) \
                 .withColumn("text", F.regexp_replace(
                     F.col("text"), r"(\S+)", f"$1{i}x"))
    if table == "part":
        perm = _VOWEL_PERMS[i % len(_VOWEL_PERMS)]
        return df.withColumn("p_partkey", F.col("p_partkey") + F.lit(i * 10_000_000)) \
                 .withColumn("p_name", F.translate(
                     F.col("p_name"), "aeiou", perm))
    if table == "lineitem":
        return df.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * 10_000_000))
    if table == "orders":
        return df.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * 10_000_000))
    if table == "embeddings":
        # new vector ids, vectors unchanged: corpus (and so every IVF
        # cluster / PQ candidate set) grows k-fold — how an embedding
        # store actually accretes; trainers stay on the same seed draw
        # order because md5(vec_id) re-ranks the union
        return df.withColumn("vec_id", F.col("vec_id") + F.lit(i * 10_000_000))
    if table == "events":
        # new event ids, SAME users and a per-copy time shift: per-user
        # history grows k-fold (sessionize/rollup per-key load rises the
        # way a longer retention window actually behaves)
        return (df.withColumn("event_id",
                              F.col("event_id") + F.lit(i * 100_000_000))
                .withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {i} DAY")))
    raise ValueError(table)


def build_dir(spark, sf_dir: str, out_dir: str, k: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for t in ALL_TABLES:
        dst = f"{out_dir}/{t}.parquet"
        # a symlink for a REPLICATED table is stale state from a run when
        # that table wasn't replicated yet — rebuild it, don't reuse it
        if os.path.islink(dst) and t in REPLICATED:
            os.unlink(dst)
        if os.path.exists(dst):
            continue
        if t not in REPLICATED:
            os.symlink(f"{sf_dir}/{t}.parquet", dst)
            continue
        copies = [_replicant(spark, sf_dir, t, i) for i in range(k)]
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.write.parquet(dst, mode="overwrite")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_probe_100x"

    from dataqtor_spark.queries import QUERIES
    from dataqtor_spark.session import get_spark

    spark = get_spark("scale-probe-100x")
    spark.sparkContext.setLogLevel("ERROR")

    dirs = {1: sf_dir}
    for k in (10, 100):
        d = f"{work}/k{k}"
        print(f"building {d} ...", file=sys.stderr)
        build_dir(spark, sf_dir, d, k)
        dirs[k] = d

    from bench import row_count, run_query

    results: dict[str, dict[int, tuple[float, int]]] = {}
    for name in QUERY_NAMES:
        fn = QUERIES[name]
        run_query(name, fn(spark, sf_dir))   # warm codegen at 1x
        results[name] = {}
        for k in (1, 10, 100):
            if name in AT_REST:
                fn(spark, dirs[k]).count()   # offline index build, untimed
            t0 = time.perf_counter()
            n = run_query(name, fn(spark, dirs[k]))
            dt = time.perf_counter() - t0
            if n is None:                    # MATERIALIZE: count untimed
                n = row_count(name, fn(spark, dirs[k]))
            results[name][k] = (dt, n)
            print(f"{name} @{k}x: {dt:.2f}s rows={n:,}", file=sys.stderr)

    lines = ["## 100x probe — headline bench queries, replicated parquet at rest",
             "",
             "sf0.1 facts replicated to parquet (shifted keys; text/name",
             "perturbed per copy so true duplicate structure scales k-fold,",
             "not k² — see tools/scale_probe_100x.py).  Same 32-thread local",
             "session; growth is wall-clock vs the 1x run of the SAME query.",
             "",
             "| query | t 1x (s) | t 10x (s) | g10 | t 100x (s) | g100 | rows 100x |",
             "|---|---|---|---|---|---|---|"]
    for name in QUERY_NAMES:
        r = results[name]
        g10 = r[10][0] / r[1][0] if r[1][0] > 0 else float("inf")
        g100 = r[100][0] / r[1][0] if r[1][0] > 0 else float("inf")
        lines.append(
            f"| {name} | {r[1][0]:.2f} | {r[10][0]:.2f} | {g10:.1f}x | "
            f"{r[100][0]:.2f} | {g100:.1f}x | {r[100][1]:,} |")
    lines += ["",
              "Linear references: 10.0x / 100.0x.  Sub-linear growth means",
              "fixed per-query overhead (plan build, job scheduling) still",
              "amortizes; materially super-linear growth at 100x flags a",
              "quadratic term no 10x run can see.",
              ""]

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_PROBE.md")
    block = "\n".join(lines)
    old = open(path).read() if os.path.exists(path) else ""
    marker = "## 100x probe"
    if marker in old:
        # replace this tool's own section, keep everything else
        pat = re.compile(r"(?ms)^## 100x probe.*?(?=^## |\Z)")
        new = pat.sub(block.rstrip("\n") + "\n\n", old)
    else:
        new = old.rstrip("\n") + "\n\n" + block
    with open(path, "w") as f:
        f.write(new)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
