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
