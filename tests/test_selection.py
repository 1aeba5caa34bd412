"""Training-data selection: greedy k-center (selection.py) and the
lm02 perplexity-gate funnel."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from dataqtor_spark.operators import selection as SEL


def _numpy_kcenter(ids, vecs, k):
    """Reference replay of the greedy loop with the same 6-dp rounding
    and min-id tie-breaks."""
    vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    order = np.argsort(ids)
    seed = order[0]
    chosen = [seed]
    out = [(0, int(ids[seed]), None)]
    for r in range(1, k):
        dists = None
        for c in chosen:
            d = 1.0 - np.round(vecs @ vecs[c], 6)
            dists = d if dists is None else np.minimum(dists, d)
        dists[chosen] = -np.inf
        best = np.max(dists)
        cand = np.where(dists == best)[0]
        nxt = cand[np.argmin(ids[cand])]
        chosen.append(nxt)
        out.append((r, int(ids[nxt]), float(best)))
    return out


def test_kcenter_matches_numpy_replay(tables):
    emb = tables["embeddings"].filter(F.col("vec_id") < 80)
    got = {r["rank"]: (r["vec_id"], r["maximin_dist"])
           for r in SEL.kcenter_select(emb, k=5).collect()}
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    vecs = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    for rank, vid, md in _numpy_kcenter(ids, vecs, 5):
        gv, gm = got[rank]
        assert gv == vid
        if md is None:
            assert gm is None
        else:
            assert gm == pytest.approx(md, abs=1e-9)


def test_kcenter_radius_sequence_non_increasing(tables):
    res = SEL.kcenter_select(tables["embeddings"], k=6).collect()
    assert len(res) == 6
    assert len({r["vec_id"] for r in res}) == 6
    mds = [r["maximin_dist"] for r in sorted(res, key=lambda r: r["rank"])]
    assert mds[0] is None
    tail = mds[1:]
    assert all(a >= b for a, b in zip(tail, tail[1:]))
    assert all(m > 0 for m in tail)


def test_kcenter_k_larger_than_n(tables):
    emb = tables["embeddings"].filter(F.col("vec_id") < 3)
    res = SEL.kcenter_select(emb, k=10).collect()
    assert len(res) == 3
    assert {r["vec_id"] for r in res} == {0, 1, 2}


def _numpy_mmr(ids, vecs, qids, k, shortlist, lam=0.5):
    """Reference replay: per query, top-shortlist by 6dp-rounded cosine
    (ties → min id), then greedy MMR with min-id tie-breaks."""
    vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    pos = {int(i): n for n, i in enumerate(ids)}
    out = {}
    for q in qids:
        sims = np.round(vecs @ vecs[pos[q]], 6)
        order = sorted((int(i) for i in ids if int(i) != q),
                       key=lambda i: (-sims[pos[i]], i))
        cand = order[:shortlist]
        sel, picks = [], []
        for r in range(1, k + 1):
            best = None
            for c in cand:
                if c in sel:
                    continue
                ms = max((np.round(vecs[pos[c]] @ vecs[pos[s]], 6)
                          for s in sel), default=0.0)
                score = lam * sims[pos[c]] - (1 - lam) * ms
                if best is None or score > best[0] or \
                        (score == best[0] and c < best[1]):
                    best = (score, c)
            sel.append(best[1])
            picks.append((r, best[1], float(best[0])))
        out[q] = picks
    return out


def test_mmr_matches_numpy_replay(tables):
    from dataqtor_spark.operators.selection import mmr_select

    emb = tables["embeddings"].filter(F.col("vec_id") < 60)
    queries = emb.filter(F.col("vec_id") < 3)
    res = mmr_select(emb, queries, k=4, shortlist=8).collect()
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    vecs = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    want = _numpy_mmr(ids, vecs, [0, 1, 2], k=4, shortlist=8)
    got = {}
    for r in res:
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["neighbor_id"], r["mmr_score"]))
    assert set(got) == {0, 1, 2}
    for q, picks in want.items():
        gq = sorted(got[q])
        assert [(r, n) for r, n, _ in gq] == [(r, n) for r, n, _ in picks]
        for (_, _, gs), (_, _, ws) in zip(gq, picks):
            assert gs == pytest.approx(ws, abs=1e-9)


def test_mmr_pick_scores_non_increasing(tables):
    from dataqtor_spark.operators.selection import mmr_select

    emb = tables["embeddings"]
    queries = emb.filter(F.col("vec_id") < 4)
    res = mmr_select(emb, queries, k=5, shortlist=12).collect()
    per_q = {}
    for r in res:
        per_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["mmr_score"], r["neighbor_id"]))
    assert len(per_q) == 4
    for q, picks in per_q.items():
        picks.sort()
        assert len(picks) == 5
        assert len({n for _, _, n in picks}) == 5
        # monotone non-increasing from rank 2 on (per-candidate max-sim
        # to the selected set only grows as the set grows).  rank 1 is
        # excluded: its score uses ms=0 by convention, which undershoots
        # when sims to the first pick are negative.
        scores = [s for _, s, _ in picks[1:]]
        assert all(a >= b for a, b in zip(scores, scores[1:]))


def test_cluster_balanced_sample_properties(tables):
    from dataqtor_spark.operators.selection import cluster_balanced_sample

    emb = tables["embeddings"]
    out = cluster_balanced_sample(emb, n_clusters=8, per_cluster=10,
                                  cache_key="t-sel03").collect()
    per = {}
    for r in out:
        per.setdefault(r["cluster"], []).append(
            (r["pick_rank"], r["vec_id"]))
    # every cluster contributes at most per_cluster, ranks are 1..m dense
    for c, picks in per.items():
        picks.sort()
        assert len(picks) <= 10
        assert [p[0] for p in picks] == list(range(1, len(picks) + 1))
    # ids unique across the sample
    assert len({r["vec_id"] for r in out}) == len(out)
    # deterministic under row-order perturbation
    shuffled = emb.orderBy(F.md5(F.col("vec_id").cast("string")))
    again = {(r["cluster"], r["pick_rank"], r["vec_id"])
             for r in cluster_balanced_sample(
                 shuffled, n_clusters=8, per_cluster=10,
                 cache_key="t-sel03b").collect()}
    assert again == {(r["cluster"], r["pick_rank"], r["vec_id"])
                     for r in out}


def test_lm02_gate_funnel_consistent(spark, tables):
    from dataqtor_spark.queries import QUERIES
    from tests.conftest import SF_DIR

    out = QUERIES["lm02_perplexity_gate"](spark, SF_DIR).collect()
    assert out
    for r in out:
        assert 0 <= r["n_kept"] <= r["n_docs"]
        assert 0 <= r["kept_tokens"] <= r["n_tokens"]
        assert 0 <= r["kept_ppm"] <= 1_000_000
        # ppm is the exact rounding of n_kept/n_docs
        expect = (2 * r["n_kept"] * 1_000_000 + r["n_docs"]) \
            // (2 * r["n_docs"])
        assert r["kept_ppm"] == expect
    # the gate is a real split at this SF: both sides non-empty overall
    total_kept = sum(r["n_kept"] for r in out)
    total_docs = sum(r["n_docs"] for r in out)
    assert 0 < total_kept < total_docs


def test_kcenter_duplicate_points_tie_break(spark):
    # two exact duplicates of the seed: dist 0 to the chosen set, never
    # picked while any distinct point remains; k > n_distinct stops at
    # the id-ordered duplicates deterministically
    vecs = {0: [1.0, 0.0], 1: [1.0, 0.0], 2: [0.0, 1.0], 3: [0.7, 0.7]}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        "vec_id long, embedding array<double>")
    res = sorted(SEL.kcenter_select(df, k=4).collect(),
                 key=lambda r: r["rank"])
    ids = [r["vec_id"] for r in res]
    assert ids[0] == 0          # min-id seed
    assert ids[1] == 2          # orthogonal point is farthest
    assert set(ids) == {0, 1, 2, 3}
    # the duplicate (vec_id 1, distance 0 to the seed) is picked LAST
    assert ids[3] == 1
    assert res[3]["maximin_dist"] == 0.0


def test_kcenter_empty_input(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    res = SEL.kcenter_select(df, k=3)
    assert res.count() == 0
    assert [f.name for f in res.schema.fields] == \
        ["rank", "vec_id", "maximin_dist"]


def test_kcenter_string_and_int_id_types(spark):
    # id schema follows the input column type instead of hardcoded long
    rows = [("a", [1.0, 0.0]), ("b", [0.0, 1.0]), ("c", [0.7, 0.7])]
    df = spark.createDataFrame(rows, "doc string, embedding array<double>")
    res = SEL.kcenter_select(df, id_col="doc", k=2)
    assert dict(res.dtypes)["doc"] == "string"
    got = sorted(res.collect(), key=lambda r: r["rank"])
    assert got[0]["doc"] == "a" and got[1]["doc"] == "b"

    df_i = spark.createDataFrame([(1, [1.0, 0.0]), (2, [0.0, 1.0])],
                                 "vec_id int, embedding array<double>")
    res_i = SEL.kcenter_select(df_i, k=2)
    assert dict(res_i.dtypes)["vec_id"] == "int"
    assert res_i.count() == 2
