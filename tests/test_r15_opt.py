"""Round-15 optimization internals.

The optimizations these pin changed HOW operators compute, never WHAT:
the oracle gate proves output parity, and these tests pin the internal
contracts the rewrites rely on — the occurrence-sum ≡ per-feature-count
DSIR equivalence, the joint-table entropy/MI refactor, the bpe_train
AQE-conf restore, and the tokenize-above-the-exchange plan shape.
"""
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_dsir_occurrence_sum_equals_docf_formulation(spark):
    """The r15 rewrite scores sum(lr) over gram OCCURRENCES instead of
    sum(c_f * lr_f) over per-doc feature counts.  Replay the retired
    docf formulation inline on real data and require bit-identical
    (n_feats, log_weight) per doc — the DECIMAL equivalence the rewrite
    rests on (decimal × integer count is repeated exact addition)."""
    from dataqtor_spark.operators import textstats as TX
    from dataqtor_spark.queries import _t

    docs = _t(spark, SF_DIR, "documents")
    new = TX.dsir_importance(docs, F.col("source") == "src0", top_k=50)

    # retired shape: per-(doc, feature) counts, then sum(c * lr)
    toks = docs.select(F.col("doc_id").alias("__id"),
                       (F.col("source") == "src0").alias("__t"),
                       TX._clean_tokens("text").alias("__tk")) \
        .withColumn("__n", F.size("__tk"))
    bigrams = F.when(
        F.col("__n") >= 2,
        F.transform(F.sequence(F.lit(1), F.col("__n") - 1),
                    lambda i: F.concat_ws(
                        " ", F.element_at("__tk", i),
                        F.element_at("__tk", i + 1)))
    ).otherwise(F.array().cast("array<string>"))
    grams = toks.select("__id", "__t",
                        F.explode(F.concat("__tk", bigrams)).alias("__f"))
    docf = grams.groupBy("__id", "__t", "__f").agg(
        F.count(F.lit(1)).alias("__c"))
    feat = docf.groupBy("__f").agg(
        F.sum("__c").alias("__cr"),
        F.sum(F.when(F.col("__t"), F.col("__c")).otherwise(F.lit(0)))
        .alias("__ct"))
    tot = feat.agg(F.sum("__cr").alias("__tr"), F.sum("__ct").alias("__tt"),
                   F.count(F.lit(1)).alias("__v"))
    ratio = (feat.crossJoin(F.broadcast(tot))
             .select("__f", F.round(
                 F.log((F.col("__ct") + 1) / (F.col("__tt") + F.col("__v")))
                 - F.log((F.col("__cr") + 1)
                         / (F.col("__tr") + F.col("__v"))),
                 9).cast("decimal(18,9)").alias("__lr")))
    old_scored = (docf.join(ratio, "__f").groupBy("__id")
                  .agg(F.sum("__c").cast("long").alias("n_feats"),
                       F.round(F.sum(F.col("__c").cast("decimal(10,0)")
                                     * F.col("__lr")), 6).cast("double")
                       .alias("log_weight")))
    old_top = {r["__id"]: (r["n_feats"], r["log_weight"])
               for r in old_scored.collect()}
    for r in new.collect():
        assert old_top[r["doc_id"]] == (r["n_feats"], r["log_weight"])


def test_entropy_mi_from_joint_matches_direct(spark):
    """pr26's cube path feeds `_entropy_mi_from_joint` with re-aggregated
    counts; the split-out math must equal `entropy_mi` run directly."""
    from dataqtor_spark.operators import profile as P
    from dataqtor_spark.queries import _t

    o = _t(spark, SF_DIR, "orders").select(
        F.col("o_orderstatus").alias("a"), F.col("o_orderpriority").alias("b"))
    direct = P.entropy_mi(o, "a", "b").collect()[0]
    j = (o.filter(F.col("a").isNotNull() & F.col("b").isNotNull())
         .groupBy("a", "b").agg(F.count(F.lit(1)).cast("double").alias("n")))
    via_joint = P._entropy_mi_from_joint(j).collect()[0]
    assert direct == via_joint


def test_bpe_train_restores_aqe_conf(spark):
    """r15 toggled spark.sql.adaptive.enabled off for the merge rounds
    and restored it; r16's ledger rework removed the toggle entirely
    (ADVICE r15 thread-safety note).  The invariant this pins is the
    surviving contract: the session conf reads unchanged after training,
    on success AND when the pair-count pass raises mid-training."""
    from dataqtor_spark.operators import textstats as TX
    from dataqtor_spark.queries import _t

    docs = _t(spark, SF_DIR, "documents")
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    TX.bpe_train(docs, rounds=2)
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"

    # failure path: poison the round loop for one call (the driver-side
    # trainer is the entry the small-vocab path always takes)
    orig = TX._bpe_train_driver
    TX._bpe_train_driver = lambda *_: (_ for _ in ()).throw(
        RuntimeError("boom"))
    try:
        with pytest.raises(RuntimeError):
            TX.bpe_train(docs, rounds=2)
    finally:
        TX._bpe_train_driver = orig
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"


@pytest.mark.parametrize("build", ["dsir", "cms", "lm"])
def test_tokenize_sits_above_the_exchange(spark, build):
    """The r15 sweep moved heavy text projections ABOVE the parallelize
    round-robin exchange.  Pin the plan shape: no tokenizer `split(`
    expression may appear below RoundRobinPartitioning in the analyzed
    physical plan (single-row-group inputs would serialize it)."""
    from dataqtor_spark.operators import sketches as SK
    from dataqtor_spark.operators import textstats as TX
    from dataqtor_spark.queries import _t

    docs = _t(spark, SF_DIR, "documents")
    if build == "dsir":
        df = TX.dsir_importance(docs, F.col("source") == "src0", top_k=5)
    elif build == "cms":
        df = SK.cms_heavy_hitters(docs, top_k=5)
    else:
        df = TX.ngram_lm_score(docs, F.col("source") == "src0")
    plan = df._jdf.queryExecution().sparkPlan()

    def walk(node):
        yield node
        ch = node.children()
        for i in range(ch.size()):
            yield from walk(ch.apply(i))

    bad = []
    for node in walk(plan):
        name = node.nodeName()
        if "Exchange" not in name:
            continue
        head = node.simpleStringWithNodeId() if hasattr(
            node, "simpleStringWithNodeId") else str(node)
        if "RoundRobinPartitioning" not in str(head) \
                and "RoundRobinPartitioning" not in node.toString().split(
                    "\n", 1)[0]:
            continue
        # the subtree BELOW a round-robin exchange must not evaluate the
        # tokenizer (split over lowered text)
        sub = node.children().apply(0).toString()
        if "split(trim(lower" in sub:
            bad.append(node.toString().split("\n", 1)[0])
    assert not bad, bad
