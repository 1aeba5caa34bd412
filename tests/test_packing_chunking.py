"""pack01/chunk01: concat-and-chunk sequence packing and overlapping
character chunking, checked against pure-Python replays."""

import hashlib

import pytest
from pyspark.sql import functions as F

from dataqtor_spark.operators import textstats as TX


@pytest.fixture()
def docs(spark):
    rows = [
        (1, "alpha beta gamma delta"),            # 4 tokens
        (2, ""),                                  # empty
        (3, "one two three"),                     # 3 tokens
        (4, "  padded   tokens  here "),          # 3 tokens, messy ws
        (5, "x " * 600),                          # 600 tokens, spans blocks
        (6, "tail piece"),                        # 2 tokens
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_packing_matches_replay(docs):
    L = 512
    out = {r["doc_id"]: r for r in
           TX.concat_chunk_packing(docs, seq_len=L).collect()}
    sizes = {1: 4, 2: 0, 3: 3, 4: 3, 5: 600, 6: 2}
    cum = 0
    for did in sorted(sizes):
        n = sizes[did]
        start = cum
        cum += n
        r = out[did]
        assert r["n_tokens"] == n
        assert r["tok_start"] == start
        if n == 0:
            assert r["first_block"] is None and r["last_block"] is None
            assert r["n_blocks"] == 0 and r["is_split"] is None
        else:
            first, last = start // L, (cum - 1) // L
            assert r["first_block"] == first and r["last_block"] == last
            assert r["n_blocks"] == last - first + 1
            assert r["is_split"] == (last != first)
    # doc 5 (tokens 7..606) must span the 512 boundary
    assert out[5]["is_split"] is True and out[5]["n_blocks"] == 2


def test_packing_blocks_partition_token_space(docs):
    # every non-empty doc's token interval fits its claimed block span
    L = 512
    for r in TX.concat_chunk_packing(docs, seq_len=L).collect():
        if r["n_tokens"] == 0:
            continue
        assert r["first_block"] * L <= r["tok_start"]
        assert r["tok_start"] + r["n_tokens"] <= (r["last_block"] + 1) * L


def test_chunking_matches_replay(spark):
    text_a = "abcdefghij" * 35          # 350 chars -> starts 0, 80, 160, 240, 320
    text_b = "short"
    df = spark.createDataFrame([(1, text_a), (2, text_b), (3, "")],
                               "doc_id long, text string")
    out = TX.doc_chunks(df, chunk_len=100, overlap=20)
    rows = sorted(out.collect(), key=lambda r: (r["doc_id"], r["chunk_idx"]))
    expect = []
    for did, t in [(1, text_a), (2, text_b)]:
        for k, s in enumerate(range(0, len(t), 80)):
            sub = t[s:s + 100]
            expect.append((did, k, s, len(sub),
                           hashlib.md5(sub.encode()).hexdigest()))
    got = [(r["doc_id"], r["chunk_idx"], r["char_start"], r["chunk_chars"],
            r["chunk_md5"]) for r in rows]
    assert got == expect
    assert not any(r["doc_id"] == 3 for r in rows)   # empty doc: no chunks


def test_chunking_covers_every_char(spark):
    df = spark.createDataFrame([(1, "z" * 1234)], "doc_id long, text string")
    rows = TX.doc_chunks(df, chunk_len=100, overlap=20).collect()
    covered = set()
    for r in rows:
        covered.update(range(r["char_start"],
                             r["char_start"] + r["chunk_chars"]))
    assert covered == set(range(1234))


def test_chunking_rejects_degenerate_stride(spark):
    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    with pytest.raises(ValueError):
        TX.doc_chunks(df, chunk_len=100, overlap=100)


def test_chunking_non_ascii_md5(spark):
    # md5 must hash the chunk's UTF-8 bytes, chunk bounds count CHARACTERS
    t = "héllo wörld ünïcode"
    df = spark.createDataFrame([(1, t)], "doc_id long, text string")
    r = TX.doc_chunks(df, chunk_len=10, overlap=2).collect()
    subs = [t[s:s + 10] for s in range(0, len(t), 8)]
    assert [x["chunk_md5"] for x in
            sorted(r, key=lambda x: x["chunk_idx"])] == \
        [hashlib.md5(s.encode("utf-8")).hexdigest() for s in subs]


def test_length_buckets_replay(spark):
    rows = [(1, "a"), (2, "a b c"), (3, ""), (4, "w " * 7), (5, "w " * 8),
            (6, "x y")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["bucket"]: r for r in
           TX.length_bucket_report(df).collect()}
    # tokens: 1,3,0,7,8,2 -> buckets 0,1,-1,2,3,1
    assert set(out) == {-1, 0, 1, 2, 3}
    assert out[-1]["n_docs"] == 1 and out[-1]["pad_waste"] == 0
    assert out[-1]["waste_ppm"] == 0
    b1 = out[1]
    assert (b1["n_docs"], b1["min_tokens"], b1["max_tokens"]) == (2, 2, 3)
    assert b1["sum_tokens"] == 5 and b1["pad_waste"] == 2 * 3 - 5
    assert b1["waste_ppm"] == round(1 / 6 * 1e6)
    for b, r in out.items():
        if b >= 0:
            assert 2 ** b <= r["min_tokens"] and r["max_tokens"] < 2 ** (b + 1)
