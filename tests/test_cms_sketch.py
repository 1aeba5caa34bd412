"""Count-min sketch: over-estimate guarantee, exactness below
collision, and the cell-wise mergeability contract."""

from pyspark.sql import functions as F

from dataqtor_spark.operators.sketches import cms_cells, cms_heavy_hitters


def test_cms_overestimates_and_ranks_exact_topk(tables):
    out = cms_heavy_hitters(tables["documents"], top_k=10).collect()
    assert len(out) == 10
    for r in out:
        assert r["overcount"] >= 0
        assert r["cms_est"] == r["exact_cnt"] + r["overcount"]
    # error bound sanity: overcount ≤ e/width · T with high probability;
    # allow the full union bound rather than the expectation
    total = (tables["documents"]
             .select(F.explode(F.split(F.trim(F.lower(F.col("text"))),
                                       r"[ \t\n\r\f]+")).alias("t"))
             .filter(F.col("t") != "").count())
    for r in out:
        assert r["overcount"] <= total  # trivially true; tightness below
    assert sum(r["overcount"] for r in out) < total  # not degenerate


def test_cms_exact_when_width_exceeds_vocab(spark):
    rows = [(i, f"tok{i % 7}") for i in range(140)]
    df = spark.createDataFrame(rows, "id long, text string")
    out = cms_heavy_hitters(df, depth=4, width=512, top_k=7).collect()
    # 7 distinct tokens in 512 buckets: collisions are possible but the
    # min over 4 independent rows makes a 4-way simultaneous collision
    # essentially impossible — estimates must be exact
    assert len(out) == 7
    for r in out:
        assert r["overcount"] == 0
        assert r["exact_cnt"] == 20


def test_cms_cells_merge_by_sum(tables):
    docs = tables["documents"]
    left = docs.filter(F.col("doc_id") % 2 == 0)
    right = docs.filter(F.col("doc_id") % 2 == 1)

    def grid(df):
        return {(r["__i"], r["__b"]): r["__c"]
                for r in cms_cells(df).collect()}

    whole, gl, gr = grid(docs), grid(left), grid(right)
    merged = dict(gl)
    for k, v in gr.items():
        merged[k] = merged.get(k, 0) + v
    assert merged == whole


def test_cms_tiny_width_still_overestimates(spark):
    # adversarial width=2: heavy collisions everywhere — the estimate
    # must still never undercount (the CMS guarantee is one-sided)
    rows = [(i, f"w{i % 11} filler common") for i in range(110)]
    df = spark.createDataFrame(rows, "id long, text string")
    out = cms_heavy_hitters(df, depth=4, width=2, top_k=10).collect()
    assert out
    for r in out:
        assert r["cms_est"] >= r["exact_cnt"]
