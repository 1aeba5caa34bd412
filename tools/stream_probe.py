"""Streaming-sink scale probe (round-14 verdict item 8): measure the two
stateful streaming sinks' ingest cost against their batch equivalents at
10x, closing the last untested scale claims.

Design: for each sink the BATCH EQUIVALENT is the same foreachBatch code
path fed every input file in ONE availableNow micro-batch; the STREAM
path feeds the same files in ~5 micro-batches (maxFilesPerTrigger).  The
trigger granularity is the only variable, so the comparison isolates
exactly what the scale claim asserts: per-batch overhead plus the
history-index re-join must not grow faster than the one-shot pass —
i.e. growth(stream, 1x -> 10x) <= growth(batch, 1x -> 10x) within noise.

Inputs: sf0.1 documents (payload-encoded, the m04 fake-decode device)
and embeddings; 10x variants are id-shifted unions (the scale_probe_100x
accretion model: corpus grows, per-batch size grows with it).

Usage: python tools/stream_probe.py [sf_dir] [work_dir]
Appends a section to SCALE_PROBE.md and prints the rows.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

N_BATCH_FILES = 10   # input files per corpus
FILES_PER_TRIGGER = 2  # -> ~5 micro-batches in stream mode


def _docs_payloads(spark, sf_dir: str, k: int):
    from dataqtor_spark.queries import _t

    base = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"))
    copies = [base.select((F.col("media_id") + F.lit(i * 10_000_000))
                          .alias("media_id"),
                          # per-copy payload prefix: distinct images per
                          # copy (corpus accretes NEW content)
                          F.concat(F.encode(F.lit(f"c{i}:"), "UTF-8"),
                                   F.col("payload")).alias("payload"))
              for i in range(k)]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def _embeddings(spark, sf_dir: str, k: int, id_offset: int):
    from dataqtor_spark.queries import _t

    base = _t(spark, sf_dir, "embeddings")
    copies = [base.select((F.col("vec_id") + F.lit(id_offset + i * 10_000_000))
                          .alias("vec_id"), "embedding")
              for i in range(k)]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def _run_image_sink(spark, src: str, schema, work: str, files_per_trigger):
    from dataqtor_spark.streaming import profiler as SP

    root = f"{work}/img_idx"
    ckpt = f"{work}/img_ckpt"
    for d in (root, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    reader = spark.readStream.schema(schema)
    if files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", files_per_trigger)
    stream = reader.parquet(src)
    t0 = time.perf_counter()
    q = SP.stream_image_dedup_sink(stream, "media_id", "payload",
                                   root, ckpt, max_hamming=3,
                                   use_codec=False)
    q.awaitTermination()
    dt = time.perf_counter() - t0
    n = spark.read.parquet(f"{root}/sigs").count()
    return dt, n


def _run_ivfpq_sink(spark, sf_dir: str, src: str, schema, work: str,
                    files_per_trigger):
    from dataqtor_spark.operators import ann as ANN
    from dataqtor_spark.queries import _t
    from dataqtor_spark.streaming import profiler as SP

    idx = f"{work}/pq_idx"
    ckpt = f"{work}/pq_ckpt"
    for d in (idx, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    # seed index on the sf corpus (offline step, untimed)
    ANN.write_ivfpq_index(_t(spark, sf_dir, "embeddings"), idx,
                          "vec_id", "embedding", n_clusters=8, m=4, ks=8,
                          n_iter=2, cache_key=f"{sf_dir}/embeddings.parquet")
    reader = spark.readStream.schema(schema)
    if files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", files_per_trigger)
    stream = reader.parquet(src)
    t0 = time.perf_counter()
    q = SP.stream_ivfpq_ingest_sink(stream, idx, ckpt)
    q.awaitTermination()
    dt = time.perf_counter() - t0
    n = spark.read.parquet(f"{idx}/corpus").count()
    return dt, n


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/stream_probe"

    from dataqtor_spark.session import get_spark

    spark = get_spark("stream-probe")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(work, exist_ok=True)

    rows = []
    for sink, build, runner in (
        ("stream_image_dedup_sink",
         lambda k: _docs_payloads(spark, sf_dir, k),
         lambda src, schema, fpt: _run_image_sink(
             spark, src, schema, work, fpt)),
        ("stream_ivfpq_ingest_sink",
         lambda k: _embeddings(spark, sf_dir, k, id_offset=50_000_000),
         lambda src, schema, fpt: _run_ivfpq_sink(
             spark, sf_dir, src, schema, work, fpt)),
    ):
        res = {}
        for k in (1, 10):
            # key the reusable input dir by sf_dir too — a rerun against
            # a different SF must not silently measure stale inputs
            tag = os.path.basename(sf_dir.rstrip("/"))
            src = f"{work}/{sink}_in_{tag}_k{k}"
            df = build(k)
            if not os.path.exists(src):
                df.repartition(N_BATCH_FILES).write.parquet(
                    src, mode="overwrite")
            schema = df.schema
            # batch equivalent: one availableNow micro-batch (warm first)
            tb, nb = runner(src, schema, None)
            tb2, _ = runner(src, schema, None)
            tb = min(tb, tb2)
            # stream: same files, ~5 micro-batches
            ts, ns = runner(src, schema, FILES_PER_TRIGGER)
            assert ns == nb, (sink, k, ns, nb)
            res[k] = (tb, ts, ns)
            print(f"# {sink} k{k}: batch {tb:.2f}s stream {ts:.2f}s "
                  f"({ns} indexed)", file=sys.stderr)
        g_b = res[10][0] / res[1][0]
        g_s = res[10][1] / res[1][1]
        rows.append((sink, res[1][0], res[1][1], res[10][0], res[10][1],
                     g_b, g_s, res[10][2]))

    lines = [
        "## Streaming-sink probe — per-batch cost vs batch path at 10x",
        "",
        "Same foreachBatch code path; the only variable is trigger",
        "granularity (1 availableNow batch vs ~5 maxFilesPerTrigger",
        "micro-batches).  The scale claim holds when the 5-batch growth",
        "1x -> 10x stays at-or-below the 1-batch growth — the history",
        "index re-join (partition-pruned bands / epoch-ledger append)",
        "must not make incremental ingest super-grow with corpus size.",
        "",
        "| sink | batch 1x (s) | stream 1x (s) | batch 10x (s) | "
        "stream 10x (s) | g10 batch | g10 stream | rows 10x |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for (sink, b1, s1, b10, s10, gb, gs, n10) in rows:
        lines.append(f"| {sink} | {b1:.2f} | {s1:.2f} | {b10:.2f} | "
                     f"{s10:.2f} | {gb:.1f}x | {gs:.1f}x | {n10:,} |")
    import re

    block = "\n".join(lines) + "\n"
    print(block)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, "SCALE_PROBE.md")
    text = open(path).read() if os.path.exists(path) else "# SCALE_PROBE\n"
    # replace this tool's own section (any round-titled legacy copy too)
    # rather than appending a duplicate on every rerun
    pat = re.compile(r"(?ms)^## (?:Round-14 )?[Ss]treaming-sink probe.*?"
                     r"(?=^## |\Z)")
    text = pat.sub("", text)
    with open(path, "w") as f:
        f.write(text.rstrip("\n") + "\n\n" + block)
    print("wrote SCALE_PROBE.md section", file=sys.stderr)


if __name__ == "__main__":
    main()
