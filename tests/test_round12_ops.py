"""Round-12 operators: split-leakage repair (d13), shard manifest
(t39), and hybrid RRF retrieval (rrf01)."""

from fractions import Fraction

import pytest
from pyspark.sql import functions as F

from dataqtor_spark.operators.dedup import split_leakage_repair
from dataqtor_spark.operators.textstats import hybrid_rrf_search, \
    shard_manifest


def _is_val(doc_id: int, val_mod: int = 10) -> bool:
    return ((doc_id * 2654435761) % 2**32) % val_mod == 0


def test_split_leakage_quarantines_val_twin(spark):
    # planted corpus: pairs of identical docs (guaranteed near-dups),
    # some crossing the split boundary, some not, plus unique filler
    val_ids = [i for i in range(200) if _is_val(i)]
    train_ids = [i for i in range(200) if not _is_val(i)]
    assert len(val_ids) >= 3
    rows = []
    # 3 leaking twins: one val id paired with one train id, same text
    for n, (v, t) in enumerate(zip(val_ids[:3], train_ids[:3])):
        txt = f"leaky shared document body {n} " * 12
        rows += [(v, txt), (t, txt)]
    # 2 train-only twins: no leakage
    for n, (t1, t2) in enumerate(zip(train_ids[3:5], train_ids[5:7])):
        txt = f"train only duplicate body {n} " * 12
        rows += [(t1, txt), (t2, txt)]
    # unique filler (train + val)
    used = {r[0] for r in rows}
    for i in range(200):
        if i not in used:
            rows.append((i, f"unique filler document number {i} with "
                            f"entirely distinct words w{i}a w{i}b w{i}c"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    rep = {r["split"]: r for r in split_leakage_repair(df).collect()}
    assert set(rep) == {"train", "val"}
    # exactly the 3 planted CROSS-split pairs count as leakage — the two
    # train-only twin pairs are screened out by the split filter
    assert rep["val"]["leaked_pairs"] == rep["train"]["leaked_pairs"] == 3
    # the val-side twin of each leaking pair moves to train (n_moved is
    # the same global quarantine count on both report rows)
    assert rep["val"]["n_moved"] == rep["train"]["n_moved"] == 3
    assert rep["val"]["n_after"] == rep["val"]["n_before"] - 3
    assert rep["train"]["n_after"] == rep["train"]["n_before"] + 3


def test_shard_manifest_order_insensitive_and_sensitive_to_change(tables):
    docs = tables["documents"].limit(400)
    base = {r["shard"]: r for r in shard_manifest(docs).collect()}
    assert sum(r["n_docs"] for r in base.values()) == 400
    # order-independence: a reshuffled frame yields the identical manifest
    shuffled = docs.orderBy(F.md5(F.col("text")))
    again = {r["shard"]: r for r in shard_manifest(shuffled).collect()}
    assert {k: (v["n_docs"], v["n_tokens"], v["content_checksum"])
            for k, v in base.items()} == \
           {k: (v["n_docs"], v["n_tokens"], v["content_checksum"])
            for k, v in again.items()}
    # content-sensitivity: flipping one document's text changes exactly
    # the checksum of its shard (counts stay if token count preserved)
    one = docs.limit(1).collect()[0]
    mutated = docs.withColumn(
        "text", F.when(F.col("doc_id") == one["doc_id"],
                       F.concat(F.lit("X"), F.col("text")))
        .otherwise(F.col("text")))
    mut = {r["shard"]: r for r in shard_manifest(mutated).collect()}
    changed = [s for s in base
               if base[s]["content_checksum"] != mut[s]["content_checksum"]]
    assert len(changed) == 1


def test_hybrid_rrf_fusion_matches_rational_reference(tables):
    docs, emb = tables["documents"], tables["embeddings"]
    terms = ["data", "quality"]
    out = hybrid_rrf_search(docs, emb, terms, query_vec_id=0,
                            k_each=10, top_k=8).collect()
    assert 0 < len(out) <= 8
    ranks = [r["rank"] for r in out]
    assert ranks == list(range(1, len(out) + 1))
    for r in out:
        assert r["rank_lex"] is not None or r["rank_sem"] is not None
        # rrf_e12 is the exact floor of the rational RRF sum · 10^12
        s = Fraction(0)
        if r["rank_lex"] is not None:
            s += Fraction(1, 60 + r["rank_lex"])
        if r["rank_sem"] is not None:
            s += Fraction(1, 60 + r["rank_sem"])
        assert r["rrf_e12"] == (s.numerator * 10**12) // s.denominator
    # fused order is non-increasing in rrf_e12
    scores = [r["rrf_e12"] for r in out]
    assert all(a >= b for a, b in zip(scores, scores[1:]))
    # a doc present in BOTH legs outranks the same ranks seen singly
    both = [r for r in out
            if r["rank_lex"] is not None and r["rank_sem"] is not None]
    single = [r for r in out
              if (r["rank_lex"] is None) != (r["rank_sem"] is None)]
    if both and single:
        assert max(r["rrf_e12"] for r in both) > \
            min(r["rrf_e12"] for r in single)
