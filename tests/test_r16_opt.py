"""Round-16 optimization internals.

These pin HOW the r16 rewrites compute, never WHAT (the oracle gate
proves output parity): the fused start+bigram LM leg must equal the
retired union formulation bit-for-bit, and connected_components'
durability-aware barriers (reliable checkpoint when a checkpoint dir is
configured; parquet edges when work_dir is given) must produce identical
components while actually landing on storage.
"""
import os

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_ngram_lm_fused_start_equals_union_formulation(spark):
    """r16 fused the start-token leg into the bigram gram stream (NULL
    ``__a`` marks position 1).  Replay the retired two-leg union
    formulation inline on real data and require bit-identical
    (n_tokens, avg_logprob) per doc — the DECIMAL terms are identical
    values routed through one join pipeline instead of two."""
    from dataqtor_spark.functions.exact import round_ratio
    from dataqtor_spark.operators import textstats as TX
    from dataqtor_spark.queries import _t

    docs = _t(spark, SF_DIR, "documents")
    new = TX.ngram_lm_score(docs, F.col("source") == "src0")

    # retired shape: separate firsts leg + bigram leg, unioned
    toks = docs.select(F.col("doc_id").alias("__id"),
                       (F.col("source") == "src0").alias("__t"),
                       TX._clean_tokens("text").alias("__tk")) \
        .withColumn("__n", F.size("__tk"))
    firsts = (toks.filter(F.col("__n") >= 1)
              .select("__id", "__t", F.element_at("__tk", 1).alias("__w")))
    bi = (toks.filter(F.col("__n") >= 2)
          .select("__id", "__t", F.explode(F.transform(
              F.sequence(F.lit(1), F.col("__n") - 1),
              lambda i: F.struct(
                  F.element_at("__tk", i).alias("a"),
                  F.element_at("__tk", i + 1).alias("b")))).alias("__g"))
          .select("__id", "__t", F.col("__g.a").alias("__a"),
                  F.col("__g.b").alias("__b")))
    uni = toks.select("__id", "__t", F.explode("__tk").alias("__w"))
    ref_uni = (uni.filter("__t").groupBy("__w")
               .agg(F.count(F.lit(1)).alias("__cu")))
    ref_tot = ref_uni.agg(F.sum("__cu").alias("__lmT"),
                          F.count(F.lit(1)).alias("__lmV"))
    lp9 = lambda num, den: F.round(F.log(num / den), 9) \
        .cast("decimal(18,9)")  # noqa: E731
    start = (firsts.join(ref_uni, "__w", "left")
             .crossJoin(F.broadcast(ref_tot))
             .select("__id", lp9(
                 F.coalesce(F.col("__cu"), F.lit(0)) + 1,
                 F.col("__lmT") + F.col("__lmV")).alias("__lp"),
                 F.lit(1).alias("__c")))
    docg_t = (bi.groupBy("__id", "__t", "__a", "__b")
              .agg(F.count(F.lit(1)).alias("__c")))
    ref_bi = (docg_t.filter("__t").groupBy("__a", "__b")
              .agg(F.sum("__c").cast("long").alias("__cb")))
    prev = ref_uni.select(F.col("__w").alias("__a"),
                          F.col("__cu").alias("__ca"))
    grams = (docg_t.drop("__t").join(ref_bi, ["__a", "__b"], "left")
             .join(prev, "__a", "left")
             .crossJoin(F.broadcast(ref_tot))
             .select("__id", lp9(
                 F.coalesce(F.col("__cb"), F.lit(0)) + 1,
                 F.coalesce(F.col("__ca"), F.lit(0)) + F.col("__lmV"))
                 .alias("__lp"), "__c"))
    terms = start.unionByName(grams)
    scored = (terms.groupBy("__id")
              .agg(F.sum(F.col("__c").cast("decimal(10,0)")
                         * F.col("__lp")).alias("__sum"),
                   F.sum("__c").cast("long").alias("__np")))
    old = scored.select(
        F.col("__id").alias("doc_id"),
        F.col("__np").alias("n_tokens"),
        round_ratio((F.col("__sum") * 1000000000).cast("decimal(38,0)"),
                    F.col("__np").cast("decimal(38,0)") * 1000000000,
                    6).alias("avg_logprob"))
    want = {r["doc_id"]: (r["n_tokens"], r["avg_logprob"])
            for r in old.collect()}
    got = {r["doc_id"]: (r["n_tokens"], r["avg_logprob"])
           for r in new.collect()}
    assert got == want


def _cc_pairs(spark):
    return spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5),
         (10, 11), (11, 12), (10, 12),
         (20, 21)],
        "id_a long, id_b long")


_CC_WANT = {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
            10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_connected_components_reliable_checkpoint_path(spark, tmp_path):
    """With sc.setCheckpointDir configured, every CC barrier must be a
    RELIABLE checkpoint (durable at cluster scale) — same components,
    and checkpoint files actually land under the configured dir."""
    from dataqtor_spark.operators import dedup as DD

    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None
    ckpt = tmp_path / "cc_ckpt"
    sc.setCheckpointDir(str(ckpt))
    try:
        got = {r["id"]: r["component"]
               for r in DD.connected_components(_cc_pairs(spark)).collect()}
    finally:
        sc.setCheckpointDir(None)
    assert sc.getCheckpointDir() is None
    assert got == _CC_WANT
    landed = [p for p in ckpt.rglob("*") if p.is_file()]
    assert landed, "reliable checkpoint wrote nothing under the dir"


def test_connected_components_work_dir_lands_edges_parquet(spark, tmp_path):
    """With work_dir given (and no checkpoint dir), the edges frame —
    consumed by every round — must land on parquet there, so an executor
    loss cannot invalidate remaining rounds (ADVICE r15)."""
    from dataqtor_spark.operators import dedup as DD

    d = str(tmp_path / "cc_work")
    got = {r["id"]: r["component"]
           for r in DD.connected_components(_cc_pairs(spark),
                                            work_dir=d).collect()}
    assert got == _CC_WANT
    assert os.path.isdir(os.path.join(d, "edges")), \
        "edges parquet missing from work_dir"
