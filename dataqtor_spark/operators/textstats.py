"""Text-analysis operators for training-data pipelines (north-star
extensions, BASELINE.json §6): token counting, quality scoring, language
identification, document fingerprinting.

All pure column expressions — at 100 TB these run inside whole-stage
codegen with zero Python involvement, and every operator is a single
projection (no shuffle at all until an aggregate is asked for).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# token counting — whitespace + a BPE-ish regex variant
# ---------------------------------------------------------------------------

def token_count(col: Column | str) -> Column:
    """Whitespace token count (empty/blank string → 0)."""
    c = (F.col(col) if isinstance(col, str) else col).cast("string")
    t = F.trim(c)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def subword_token_count(col: Column | str) -> Column:
    """BPE-ish upper bound: word-piece runs (letter runs, digit runs, single
    punctuation) — ``regexp_count`` over one alternation, codegen-friendly."""
    c = (F.col(col) if isinstance(col, str) else col).cast("string")
    return F.regexp_count(c, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))


def add_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    return (df.withColumn("n_tokens", token_count(text_col))
            .withColumn("n_subword_tokens", subword_token_count(text_col)))


# ---------------------------------------------------------------------------
# quality scoring — length/punctuation/stopword ratios
# ---------------------------------------------------------------------------

EN_STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "that", "it", "for"]


def quality_features(col: Column | str) -> dict[str, Column]:
    """Deterministic per-document quality signals (all ratios in [0,1])."""
    c = (F.col(col) if isinstance(col, str) else col).cast("string")
    n_chars = F.length(c)
    n_tok = token_count(c)
    safe_chars = F.greatest(n_chars, F.lit(1)).cast("double")
    safe_tok = F.greatest(n_tok, F.lit(1)).cast("double")
    n_punct = F.regexp_count(c, F.lit(r"[.,!?;:]"))
    n_digit = F.regexp_count(c, F.lit(r"[0-9]"))
    n_upper = F.regexp_count(c, F.lit(r"[A-Z]"))
    stop_pat = r"(?i)\b(" + "|".join(EN_STOPWORDS) + r")\b"
    n_stop = F.regexp_count(c, F.lit(stop_pat))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tok,
        "avg_token_len": n_chars.cast("double") / safe_tok,
        "punct_ratio": n_punct.cast("double") / safe_chars,
        "digit_ratio": n_digit.cast("double") / safe_chars,
        "upper_ratio": n_upper.cast("double") / safe_chars,
        "stopword_ratio": n_stop.cast("double") / safe_tok,
    }


def quality_score(col: Column | str) -> Column:
    """Heuristic quality in [0,1]: rewards sane length and stopword
    presence, penalizes punctuation/digit noise.  Deterministic arithmetic
    (documented formula, SQL-twin-able)."""
    f = quality_features(col)
    length_ok = F.least(f["n_tokens"].cast("double") / 20.0, F.lit(1.0))
    stop_ok = F.least(f["stopword_ratio"] * 4.0, F.lit(1.0))
    noise = F.least(f["punct_ratio"] * 5.0 + f["digit_ratio"] * 2.0, F.lit(1.0))
    return F.round(0.5 * length_ok + 0.5 * stop_ok - 0.25 * noise, 4)


def add_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    out = df
    for name, expr in quality_features(text_col).items():
        out = out.withColumn(name, F.round(expr, 4) if name.endswith(("ratio", "len")) else expr)
    return out.withColumn("quality_score", quality_score(text_col))


# ---------------------------------------------------------------------------
# language identification — stopword-vote n-gram heuristic
# ---------------------------------------------------------------------------

# distinctive function words per language; counted as ' word ' literals so
# Java and RE2 regex engines agree exactly
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "with", "that"],
    "de": ["der", "die", "und", "das", "nicht", "ist"],
    "fr": ["le", "la", "les", "et", "est", "dans"],
    "es": ["el", "los", "las", "es", "en", "que"],
}
LANG_ORDER = ["en", "de", "fr", "es"]


def lang_votes(col: Column | str) -> dict[str, Column]:
    c = F.concat(F.lit(" "), F.lower((F.col(col) if isinstance(col, str) else col)), F.lit(" "))
    votes = {}
    for lang, words in LANG_MARKERS.items():
        v = F.lit(0)
        for w in words:
            v = v + F.regexp_count(c, F.lit(rf"\s{w}\s"))
        votes[lang] = v
    return votes


def lang_id(col: Column | str) -> Column:
    """argmax of stopword votes; ties resolved in LANG_ORDER; no votes at
    all → 'und' (undetermined)."""
    votes = lang_votes(col)
    best = F.greatest(*[votes[l] for l in LANG_ORDER])
    expr = F.when(best == 0, F.lit("und"))
    for l in LANG_ORDER:
        expr = expr.when(votes[l] == best, F.lit(l))
    return expr.otherwise(F.lit("und"))


def add_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("lang_pred", lang_id(text_col))


# ---------------------------------------------------------------------------
# document fingerprinting — key-collision fingerprint (sorted unique tokens)
# ---------------------------------------------------------------------------

def fingerprint(col: Column | str) -> Column:
    """OpenRefine-style fingerprint: lowercase → whitespace-split → distinct
    → sort → join → md5.  Word-order/duplication-insensitive near-dup key;
    fingerprint equality clusters in one groupBy (no pairwise join)."""
    c = (F.col(col) if isinstance(col, str) else col).cast("string")
    toks = F.array_sort(F.array_distinct(F.split(F.trim(F.lower(c)), r"\s+")))
    return F.md5(F.concat_ws(" ", toks))


def fingerprint_clusters(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Clusters of documents sharing a fingerprint (size > 1)."""
    return (df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
            .groupBy("fp")
            .agg(F.count(F.lit(1)).alias("cluster_size"),
                 F.sort_array(F.collect_list(id_col)).alias("members"))
            .filter(F.col("cluster_size") > 1))


# ---------------------------------------------------------------------------
# document chunking (training-data staple: token-bounded windows + overlap)
# ---------------------------------------------------------------------------

def chunk_documents(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", max_tokens: int = 64,
                    overlap: int = 8) -> DataFrame:
    """Split each document into whitespace-token windows of ``max_tokens``
    with ``overlap`` tokens of context between consecutive chunks.

    Pure expressions: tokenize once, generate window starts with
    ``sequence``, slice + rejoin, posexplode — one Generate, no shuffle,
    no Python.  Output: (id, chunk_index, chunk_text, n_chunk_tokens).
    """
    if overlap >= max_tokens:
        raise ValueError("overlap must be < max_tokens")
    step = max_tokens - overlap
    tokens = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(tokens)
    starts = F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(step))
    chunks = F.transform(starts, lambda s: F.slice(tokens, s, max_tokens))
    out = (df.select(F.col(id_col),
                     F.posexplode(chunks).alias("chunk_index", "__toks"))
           .select(id_col, "chunk_index",
                   F.concat_ws(" ", F.col("__toks")).alias("chunk_text"),
                   F.size("__toks").alias("n_chunk_tokens"))
           # empty/whitespace-only docs tokenize to [""] — drop those chunks
           .filter(F.length("chunk_text") > 0))
    return out


# ---------------------------------------------------------------------------
# PII scrubbing (mask structured identifiers before training)
# ---------------------------------------------------------------------------

PII_PATTERNS = {
    # pattern → replacement; RE2/Java-compatible (no lookaround)
    r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}": "<EMAIL>",
    r"\+?[0-9][0-9 ()\-]{7,}[0-9]": "<PHONE>",
    r"[0-9]+": "<NUM>",
}


def scrub_pii(df: DataFrame, text_col: str = "text",
              out_col: str | None = None) -> DataFrame:
    """Chained ``regexp_replace`` masking — order matters (emails/phones
    before bare numbers so their digits aren't pre-masked).  Stays in
    codegen; patterns avoid lookaround so Java and RE2 agree."""
    c = F.col(text_col)
    for pat, rep in PII_PATTERNS.items():
        c = F.regexp_replace(c, pat, rep)
    return df.withColumn(out_col or text_col, c)


def lang_votes_tokens(col: Column | str) -> dict[str, Column]:
    """Token-set voting: tokenize ONCE, count marker hits with array
    filters — 1 split + |langs| array scans per row instead of
    |langs|×|markers| regex scans.  Semantics differ from the regex form
    only on adjacent markers ("the the" counts 2 here, 1 there, because
    the regex consumes the shared space); both forms have exact SQL twins.
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.trim(F.lower(c)), r"\s+")
    votes = {}
    for lang, words in LANG_MARKERS.items():
        marker_arr = F.array(*[F.lit(w) for w in words])
        votes[lang] = F.size(F.filter(toks, lambda t: F.array_contains(marker_arr, t)))
    return votes


def lang_id_tokens(col: Column | str) -> Column:
    """Token-vote argmax — the scale form of :func:`lang_id`."""
    votes = lang_votes_tokens(col)
    best = F.greatest(*[votes[l] for l in LANG_ORDER])
    expr = F.when(best == 0, F.lit("und"))
    for l in LANG_ORDER:
        expr = expr.when(votes[l] == best, F.lit(l))
    return expr.otherwise(F.lit("und"))


def add_lang_id_tokens(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("lang_pred", lang_id_tokens(text_col))


# ---------------------------------------------------------------------------
# training-set assembly: deterministic shuffle, sharding, binned sampling
# ---------------------------------------------------------------------------

# Knuth multiplicative hash — same arithmetic is expressible in ANSI SQL,
# so shuffle/shard assignments are reproducible across engines and runs.
_MIX = 2654435761


def shuffle_key(id_col: Column | str, seed: int = 0) -> Column:
    """Deterministic pseudo-random sort key from a numeric id."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.pmod((c + F.lit(seed)) * F.lit(_MIX), F.lit(1 << 32))

def assign_shards(df: DataFrame, id_col: str, n_shards: int,
                  seed: int = 0) -> DataFrame:
    """Shard assignment for training-data writers: shard = mixed id mod n.
    Uniform, deterministic, reproducible — the write side then just
    ``partitionBy("shard")``; no global sort, no shuffle beyond the write."""
    return df.withColumn("shard",
                         F.pmod(shuffle_key(id_col, seed), F.lit(n_shards))
                         .cast("int"))


def sample_by_bin(df: DataFrame, bin_col: Column, rates: dict[str, int],
                  id_col: str = "doc_id", seed: int = 0) -> DataFrame:
    """Deterministic per-bin subsampling: keep a row iff
    ``mixed(id) mod 100 < rates[bin]`` (rates in percent).  The
    quality-weighted curriculum pattern — higher-quality bins keep more —
    with exact reproducibility and a pure-SQL twin."""
    r = F.lit(None).cast("int")
    expr = None
    for b, pct in rates.items():
        cond = bin_col == b
        expr = F.when(cond, F.lit(pct)) if expr is None else expr.when(cond, F.lit(pct))
    rate = expr.otherwise(F.lit(0))
    return df.withColumn("__rate", rate).filter(
        F.pmod(shuffle_key(id_col, seed), F.lit(100)) < F.col("__rate")
    ).drop("__rate")


def pack_sequences(chunks: DataFrame, token_budget: int = 512,
                   shard_col: str = "shard", order_col: str = "doc_id",
                   tokens_col: str = "n_chunk_tokens") -> DataFrame:
    """Greedy sequence packing: within each shard, chunks (in a
    deterministic order) are packed into consecutive bins of at most
    ``token_budget`` tokens — bin = floor(exclusive-prefix-sum / budget).

    The window partitions by shard, so packing parallelism = shard count
    and no shard's data leaves its partition.  Greedy-by-prefix-sum can
    split a chunk's bin boundary mid-budget (a chunk never splits, a bin
    may exceed budget by < one chunk) — the standard streaming-packing
    trade, documented rather than hidden.
    """
    from pyspark.sql.window import Window

    w = (Window.partitionBy(shard_col).orderBy(order_col, "chunk_index")
         .rowsBetween(Window.unboundedPreceding, -1))
    prefix = F.coalesce(F.sum(F.col(tokens_col)).over(w), F.lit(0))
    return chunks.withColumn("bin",
                             F.floor(prefix / token_budget).cast("int"))


# ---------------------------------------------------------------------------
# corpus statistics: vocabulary, unigram-LM scoring, decontamination
# ---------------------------------------------------------------------------

def _tokens_exploded(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, token): lowercase whitespace tokens, blanks dropped.  One
    explode; the string never travels further than the first aggregate."""
    from dataqtor_spark.session import parallelize

    c = F.col(text_col).cast("string")
    return (parallelize(df.select(F.col(id_col).alias("__id"), c.alias("__txt")))
            .select("__id",
                    F.explode(F.split(F.trim(F.lower(F.col("__txt"))), r"\s+"))
                    .alias("token"))
            .filter(F.col("token") != ""))


def vocab(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
          top_k: int | None = None) -> DataFrame:
    """Corpus vocabulary: (token, count[, rank]).  One explode + one
    hash-groupBy — partial aggregation absorbs token skew (every mapper
    pre-counts 'the' locally before the shuffle), so the shuffle carries
    at most |local vocab| rows per partition regardless of corpus size.

    With ``top_k``, ranks by (count desc, token asc) — a deterministic
    total order — and keeps the top slice; the rank window runs on the
    already-aggregated vocab table, not the corpus.
    """
    counts = (_tokens_exploded(df, id_col, text_col)
              .groupBy("token").agg(F.count(F.lit(1)).alias("count")))
    if top_k is None:
        return counts
    from pyspark.sql.window import Window

    # limit first: orderBy+limit compiles to TakeOrderedAndProject (a
    # distributed per-partition top-k + driver merge), so the full vocab is
    # never sorted on one partition; the rank window then runs over k rows.
    top = counts.orderBy(F.desc("count"), F.asc("token")).limit(top_k)
    w = Window.orderBy(F.desc("count"), F.asc("token"))
    return top.withColumn("rank", F.row_number().over(w))


def unigram_logprob(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Perplexity-proxy quality score: per-document mean negative log
    unigram probability under the corpus's own unigram LM,
    ``nll = avg(-ln(count(t) / total_tokens))`` over the doc's tokens.

    High nll = rare-token-heavy (gibberish, codes, OCR noise); low nll =
    stop-word soup.  Two shuffles total: the vocab aggregate, then the
    token→vocab equi-join re-grouped by doc.  The scalar total rides a
    broadcast crossJoin; the token join is hash-partitioned on token, so
    LM size is unbounded (no broadcast of the vocabulary).

    Returns (id, n_tokens, nll) with nll rounded to 6 dp; empty/blank
    documents are absent (no tokens).
    """
    toks = _tokens_exploded(df, id_col, text_col)
    # LM from the same exploded frame — one tokenization pass, not two
    lm = toks.groupBy("token").agg(F.count(F.lit(1)).alias("count"))
    total = lm.agg(F.sum("count").alias("__total"))
    return (toks.join(lm, "token")
            .crossJoin(F.broadcast(total))
            .groupBy("__id")
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.round(F.avg(-F.log(F.col("count") / F.col("__total"))), 6)
                 .alias("nll"))
            .withColumnRenamed("__id", id_col))


def decontaminate(corpus: DataFrame, benchmark: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", shingle_n: int = 5) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any word
    ``shingle_n``-gram with a held-out benchmark set (the standard
    train-set hygiene check before an eval release).

    Both sides shingle into the portable md5 hash space (8-byte join keys —
    shingle text never shuffles; family collision odds are irrelevant next
    to the n-gram heuristic itself).  The benchmark side is distinct-ed and
    broadcast — benchmarks are small by nature; the corpus never shuffles.
    Returns every corpus row's (id, shared_shingles, contaminated).
    """
    from dataqtor_spark.operators.dedup import portable_string_hash, word_shingles

    def grams(df: DataFrame) -> DataFrame:
        c = F.col(text_col).cast("string")
        return (df.select(F.col(id_col).alias("__id"), c.alias("__txt"))
                .select("__id",
                        F.explode(F.transform(word_shingles("__txt", shingle_n),
                                              portable_string_hash)).alias("__g")))

    bench = grams(benchmark).select("__g").distinct()
    hits = (grams(corpus).join(F.broadcast(bench), "__g")
            .groupBy("__id").agg(F.count(F.lit(1)).alias("shared_shingles")))
    return (corpus.select(F.col(id_col).alias("__id"))
            .join(hits, "__id", "left")
            .select(F.col("__id").alias(id_col),
                    F.coalesce(F.col("shared_shingles"), F.lit(0)).alias("shared_shingles"))
            .withColumn("contaminated", F.col("shared_shingles") > 0))
