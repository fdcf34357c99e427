"""Text-analysis operators for training-data pipelines.

All hot-path expressions are built-in ``pyspark.sql.functions`` (JVM,
whole-stage codegen) — no Python UDFs. Each operator is a Column
factory so it composes with filters/projections and stays pushdown- and
prune-friendly at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# ---------------------------------------------------------------------------
# tokenization / counting
# ---------------------------------------------------------------------------


def tokens(text: Column) -> Column:
    """Whitespace tokenization → array<string> (empty array for blank text)."""
    t = F.trim(text)
    return F.when(F.length(t) > 0, F.split(t, r"\s+")).otherwise(
        F.array().cast("array<string>")
    )


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


_BPE_ISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_ish_tokens(text: Column) -> Column:
    """BPE-style pre-tokenization: letter runs, digit runs, single
    punctuation — the standard GPT-2-ish regex split, JVM-side via
    regexp_extract_all."""
    return F.regexp_extract_all(text, F.lit(_BPE_ISH), 0)


def bpe_ish_token_count(text: Column) -> Column:
    return F.size(bpe_ish_tokens(text))


# ---------------------------------------------------------------------------
# normalization / fingerprinting
# ---------------------------------------------------------------------------


def normalize_text(text: Column) -> Column:
    """lowercase, collapse whitespace, strip non-alphanumerics (keeps
    spaces) — canonical form for exact-dup hashing."""
    t = F.lower(text)
    t = F.regexp_replace(t, r"[^a-z0-9\s]", "")
    t = F.regexp_replace(t, r"\s+", " ")
    return F.trim(t)


def fingerprint(text: Column) -> Column:
    """128-bit content fingerprint: md5 over the normalized text.
    Stable across engines (duckdb md5 matches), unlike murmur/xxhash."""
    return F.md5(normalize_text(text))


def fingerprint64(text: Column) -> Column:
    """64-bit rolling-hash-style fingerprint for compact dedup keys
    (xxhash64 — Spark-side only)."""
    return F.xxhash64(normalize_text(text))


# ---------------------------------------------------------------------------
# language identification (n-gram / stopword heuristic)
# ---------------------------------------------------------------------------

STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it"],
    "de": ["der", "die", "und", "das", "nicht", "ist", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "des", "est", "une", "que"],
    "es": ["el", "los", "que", "de", "una", "es", "las", "por"],
    "zh": ["的", "是", "了", "在", "和", "有", "我", "不"],
}


def _substr_count(hay: Column, needle: str) -> Column:
    """Occurrences of a literal substring — pure length arithmetic, so
    semantics are identical in any SQL dialect (oracle-friendly)."""
    return (F.length(hay) - F.length(F.replace(hay, F.lit(needle)))) / len(needle)


def language_scores(text: Column, stopwords: dict[str, list[str]] | None = None) -> dict[str, Column]:
    """Per-language stopword-hit score, normalized by token count."""
    sw = stopwords or STOPWORDS
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    out = {}
    for lang, words in sw.items():
        s = None
        for w in words:
            c = _substr_count(padded, f" {w} ")
            s = c if s is None else s + c
        out[lang] = s
    return out


def language_id(text: Column, stopwords: dict[str, list[str]] | None = None) -> Column:
    """Predicted language = argmax stopword score ('und' if all zero).
    Ties break by language-code order for determinism."""
    scores = language_scores(text, stopwords)
    pairs = [
        F.struct(s.alias("score"), F.lit(lang).alias("lang"))
        for lang, s in sorted(scores.items())
    ]
    # greatest(struct...) compares score first, then lang; ascending lang
    # order means ties pick the *last* alphabetically — invert lang for
    # deterministic smallest-code tie-break instead.
    best = F.greatest(*pairs) if len(pairs) > 1 else pairs[0]
    return F.when(best.getField("score") > 0, best.getField("lang")).otherwise(
        F.lit("und")
    )


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------


def quality_components(text: Column) -> dict[str, Column]:
    """Length / punctuation / stopword / casing ratios — the standard
    cheap quality filters (Gopher/C4-style rules), all length-arithmetic
    so an external SQL oracle reproduces them bit-for-bit."""
    n_chars = F.length(text)
    n_tok = token_count(text)
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    stop_hits = None
    for w in STOPWORDS["en"]:
        c = _substr_count(padded, f" {w} ")
        stop_hits = c if stop_hits is None else stop_hits + c
    n_punct = sum(
        (_substr_count(text, p) for p in [".", "!", "?", ","]), F.lit(0.0)
    )
    n_upper = F.length(text) - F.length(
        F.translate(text, "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "")
    )
    safe_chars = F.when(n_chars > 0, n_chars.cast("double")).otherwise(F.lit(1.0))
    safe_tok = F.when(n_tok > 0, n_tok.cast("double")).otherwise(F.lit(1.0))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tok,
        "avg_token_len": n_chars / safe_tok,
        "punct_ratio": n_punct / safe_chars,
        "upper_ratio": n_upper / safe_chars,
        "stopword_ratio": stop_hits / safe_tok,
    }


def quality_score(text: Column, rounded: bool = True) -> Column:
    """Composite [0,1]-ish quality score; higher = more natural text.

    ``rounded=False`` returns the raw double — per-row scalar math is
    bit-deterministic across engines, so differential oracles compare
    the unrounded value exactly."""
    c = quality_components(text)
    len_score = F.least(c["n_tokens"].cast("double") / F.lit(100.0), F.lit(1.0))
    stop_score = F.least(c["stopword_ratio"] * 4.0, F.lit(1.0))
    punct_pen = F.least(c["punct_ratio"] * 5.0, F.lit(1.0))
    upper_pen = F.least(c["upper_ratio"] * 5.0, F.lit(1.0))
    score = (
        0.4 * len_score + 0.4 * stop_score + 0.1 * (1.0 - punct_pen) + 0.1 * (1.0 - upper_pen)
    )
    return F.round(score, 6) if rounded else score


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Convenience: attach token counts, fingerprint, language, quality."""
    t = F.col(text_col)
    out = df
    for name, col in quality_components(t).items():
        out = out.withColumn(name, col)
    return (
        out.withColumn("bpe_ish_tokens", bpe_ish_token_count(t))
        .withColumn("fingerprint", fingerprint(t))
        .withColumn("pred_lang", language_id(t))
        .withColumn("quality", quality_score(t))
    )


# ---------------------------------------------------------------------------
# PII scrubbing (regex redaction — the standard pre-training wash)
# ---------------------------------------------------------------------------

# Patterns restricted to syntax Java regex and duckdb's RE2 share, so the
# duckdb oracle reproduces the scrub byte-for-byte.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+?[0-9]{1,3}[-. ]?\(?[0-9]{3}\)?[-. ]?[0-9]{3}[-. ]?[0-9]{4}", "<PHONE>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
]


def pii_scrub(text: Column) -> Column:
    """Redact emails / phone numbers / IPv4s with typed placeholder
    tokens. One chained regexp_replace projection — JVM-side, zero
    shuffle, embarrassingly parallel; ordering matters (emails first so
    their digit runs can't be half-eaten by the phone pattern)."""
    out = text
    for _name, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts(text: Column) -> dict:
    """Per-category match counts (for audit metrics), computed on the
    SAME progressively-scrubbed text the redaction sees, so overlapping
    patterns are attributed exactly like pii_scrub applies them."""
    counts = {}
    cur = text
    for name, pat, repl in PII_PATTERNS:
        counts[name] = F.size(F.regexp_extract_all(cur, F.lit(pat), 0))
        cur = F.regexp_replace(cur, pat, repl)
    return counts


# ---------------------------------------------------------------------------
# TF-IDF keyword extraction
# ---------------------------------------------------------------------------


def tfidf_topk(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Per-document top-k terms by TF-IDF: tf = in-doc count of the
    lowercased whitespace token, idf = ln((N+1)/(df+1)) with df = number
    of documents containing the term (smoothed so corpus-universal terms
    still score > 0). Emits (id, term, tf, df, score, rank), rank by
    (score desc, term asc) — the tie-break and the 6-dp rounding make
    the ordering reproducible bit-for-bit in an external SQL engine.

    Plan shape at 100 TB: one explode → groupBy(id, term) for tf (the
    shuffle carries (id, term, count) — map-side combine collapses
    repeats), one groupBy(term) for df (vocabulary-sized), a shuffle
    join tf⋈df on term, then a per-doc window. No driver collects; the
    df side is vocabulary-bounded, not corpus-bounded.
    """
    ids = F.col(id_col)
    toks = df.select(ids, F.explode(tokens(F.lower(F.col(text_col)))).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    # N as a broadcast 1-row frame, not a driver count: keeps the whole
    # operator one lazy plan (no extra job before the real one)
    n_docs = df.select(F.count_distinct(ids).alias("_n"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            ids, "term", "tf", "df",
            F.round(
                F.col("tf")
                * F.log((F.col("_n") + 1).cast("double") / (F.col("df") + 1)), 6
            ).alias("score"),
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "score", "rank")
    )


# ---------------------------------------------------------------------------
# sliding-window chunking (RAG / context-window layout)
# ---------------------------------------------------------------------------


def chunk_sliding(
    df, id_col: str = "doc_id", text_col: str = "text",
    window: int = 128, stride: int = 96,
):
    """Split each document into overlapping token windows: chunk k
    covers tokens [k*stride, k*stride + window). Emits (id, chunk_no,
    chunk_text, n_chunk_tokens). Pure sequence+transform+posexplode —
    per-doc compute, no shuffle; a 100 TB corpus chunks in one pass.
    Documents with no tokens emit nothing (same convention as shingling).
    """
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    # k ranges over 0 .. ceil(max(n - window, 0) / stride), but always
    # at least one chunk for non-empty docs
    last_start = F.greatest(n - window, F.lit(0))
    n_chunks = F.floor((last_start + stride - 1) / stride).cast("int") + 1
    ks = F.sequence(F.lit(0), n_chunks - 1)
    chunks = F.transform(
        ks, lambda k: F.concat_ws(" ", F.slice(toks, k * stride + 1, window))
    )
    out = (
        df.select(F.col(id_col), toks.alias("_t"), chunks.alias("_c"))
        .filter(F.size("_t") > 0)
        .select(
            id_col,
            F.posexplode("_c").alias("chunk_no", "chunk_text"),
        )
        .select(
            id_col, "chunk_no", "chunk_text",
            F.size(tokens(F.col("chunk_text"))).alias("n_chunk_tokens"),
        )
    )
    return out


# ---------------------------------------------------------------------------
# BM25 ranked retrieval
# ---------------------------------------------------------------------------


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 20,
) -> DataFrame:
    """Okapi-BM25 ranked retrieval of the top-k documents for a bag of
    query terms. Scale shape: the token explode filters to the query
    vocabulary immediately (surviving rows ≈ matches, not the corpus),
    document frequencies aggregate that same tiny frame, and corpus
    stats (N, avgdl) are a broadcast one-row aggregate — no shuffle ever
    carries non-matching tokens.

    Cross-engine exactness: idf and each per-term partial score are
    rounded to 9 dp and summed as DECIMAL so the per-doc score is
    order-independent; the final score is ROUND(..., 6)."""
    if not query_terms:
        # F.col._w.isin() with zero args raises an opaque py4j error;
        # fail fast with an actionable message instead
        raise ValueError("bm25_topk requires a non-empty query_terms list")
    toks = df.select(F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("_w"))
    doclen = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("_dl"))
    stats = doclen.agg(
        F.count(F.lit(1)).alias("_n"), F.avg("_dl").alias("_avgdl")
    )
    tf = (
        toks.filter(F.col("_w").isin(*query_terms))
        .groupBy(id_col, "_w")
        .agg(F.count(F.lit(1)).alias("_tf"))
    )
    dft = tf.groupBy("_w").agg(F.count(F.lit(1)).alias("_df"))
    idf = dft.crossJoin(F.broadcast(stats)).select(
        "_w", "_n", "_avgdl",
        F.round(
            F.log((F.col("_n") - F.col("_df") + 0.5) / (F.col("_df") + 0.5) + 1.0), 9
        ).alias("_idf"),
    )
    term_score = (
        tf.join(idf, "_w")
        .join(doclen, id_col)
        .select(
            id_col,
            F.round(
                F.col("_idf")
                * (F.col("_tf") * (k1 + 1))
                / (F.col("_tf") + k1 * (1 - b + b * F.col("_dl") / F.col("_avgdl"))),
                9,
            ).cast("decimal(18,9)").alias("_s"),
        )
    )
    return (
        term_score.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms_matched"),
            F.round(F.sum("_s").cast("double"), 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    k: int = 20,
    c: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al., SIGIR 2009) of N ranked
    lists — the standard hybrid-retrieval combiner (sparse BM25 +
    dense embedding ranks fused without score calibration). Each input
    must carry (id_col, rank); a document scores Σ 1/(c + rank) over
    the lists it appears in.

    Scale shape: each ranking is already top-pooled (bounded rows), so
    the fuse is a union + one tiny groupBy — cost is O(Σ pool sizes),
    independent of corpus size. Cross-engine exactness: each reciprocal
    is rounded to 9 dp and summed as DECIMAL, so the fused score is
    fold-order-independent and reproducible in ANSI SQL.
    """
    if not rankings:
        raise ValueError("rrf_fuse requires at least one ranking")
    from functools import reduce

    parts = [
        r.select(
            F.col(id_col),
            F.round(F.lit(1.0) / (F.lit(float(c)) + F.col("rank")), 9)
            .cast("decimal(18,9)").alias("_rrf"),
        )
        for r in rankings
    ]
    fused = reduce(DataFrame.unionByName, parts)
    return (
        fused.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lists"),
            F.round(F.sum("_rrf").cast("double"), 9).alias("rrf_score"),
        )
        .orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
        .limit(k)
    )


# ---------------------------------------------------------------------------
# persisted inverted index (BM25's build-once / probe-cheap shape)
# ---------------------------------------------------------------------------


def _postings_frame(df: DataFrame, id_col: str, text_col: str,
                    num_buckets: int) -> DataFrame:
    """(bucket, term, id, tf, dl) postings for a batch of documents —
    shared by the full build and the incremental append."""
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("term"))
    doc_word = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    # document length as a window sum over the per-doc partition: one
    # exchange of doc_word instead of a second aggregate + join back
    # (round 11; ~30% on the postings compute, identical rows)
    dl = F.sum("tf").over(Window.partitionBy(id_col))
    return doc_word.select(
        F.pmod(F.hash("term"), F.lit(num_buckets)).cast("int").alias("bucket"),
        "term", F.col(id_col), "tf", dl.alias("dl"))



def build_text_index(
    spark,
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 16,
):
    """Build a persisted inverted index as a star table: postings
    (bucket, term, doc_id, tf, dl) range-partitioned by the term's hash
    bucket — BM25's 100 TB shape. ``bm25_topk`` re-tokenizes the corpus
    per query; here the corpus is tokenized ONCE at build and a query
    probes only its terms' bucket partitions via manifest pruning (the
    same persisted-index pattern as similarity.build_ivf_index). Each
    posting carries the document length (Lucene's norm-in-posting), so
    probing needs no doclen side at all; corpus totals (n_docs, Σdl —
    exact longs, so probe-side avgdl is reproducible bit-for-bit) live
    in table properties. The stats pass aggregates the INDEX table, not
    the corpus — postings ≪ corpus at scale. Reference ships no text
    index (beyond reference)."""
    from starlake_spark.table import create_table

    postings = _postings_frame(df, id_col, text_col, num_buckets)
    t = create_table(spark, postings, path, range_partitions=["bucket"])
    stats = (t.to_df().select(id_col, "dl").distinct()
             .agg(F.count(F.lit(1)).alias("n"), F.sum("dl").alias("s"))
             .collect()[0])
    t.set_properties({
        "text.n_docs": str(stats["n"]),
        "text.sum_dl": str(stats["s"]),
        "text.num_buckets": str(num_buckets),
        "text.id_col": id_col,
    })
    return t


def bm25_topk_indexed(
    spark,
    index,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 20,
) -> DataFrame:
    """Okapi-BM25 over a ``build_text_index`` table. Probe planning is
    zero-job: the query terms' buckets come from the bit-exact Python
    murmur3 twin of F.hash (operators/reader.py — differentially
    pinned), corpus stats come from table properties, and the scan
    touches only the probed bucket partitions (manifest pruning). A
    non-ASCII term falls back to scanning every bucket — correct, just
    unpruned. Scoring is bm25_topk's exact discipline (9-dp idf and
    per-term partials, DECIMAL sums), so the result is identical to the
    scan-everything operator."""
    if not query_terms:
        raise ValueError("bm25_topk_indexed requires a non-empty query_terms list")
    from pyspark.sql import types as T

    from starlake_spark.operators.reader import _spark_hash_py

    cfg = index.info.configuration or {}
    n_docs = int(cfg["text.n_docs"])
    sum_dl = int(cfg["text.sum_dl"])
    nb = int(cfg["text.num_buckets"])
    id_col = cfg.get("text.id_col", "doc_id")

    buckets: set[int] | None = set()
    for term in query_terms:
        h = _spark_hash_py([term], [T.StringType()])
        if h is None:
            buckets = None
            break
        buckets.add(h % nb)
    where = (f"bucket IN ({', '.join(str(x) for x in sorted(buckets))})"
             if buckets is not None else None)
    p = index.to_df(where=where)
    tf = p.filter(F.col("term").isin(*query_terms))
    avgdl = F.lit(sum_dl).cast("double") / F.lit(n_docs)
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    idf = dft.select(
        "term",
        F.round(
            F.log((F.lit(n_docs) - F.col("_df") + 0.5) / (F.col("_df") + 0.5) + 1.0), 9
        ).alias("_idf"))
    term_score = (
        tf.join(F.broadcast(idf), "term")
        .select(
            F.col(id_col),
            F.round(
                F.col("_idf")
                * (F.col("tf") * (k1 + 1))
                / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / avgdl)),
                9,
            ).cast("decimal(18,9)").alias("_s"),
        ))
    return (
        term_score.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms_matched"),
            F.round(F.sum("_s").cast("double"), 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def text_index_append(spark, index, new_docs: DataFrame, text_col: str = "text"):
    """Incrementally maintain a persisted inverted index: tokenize ONLY
    the new documents, append their postings into the existing
    term-bucket partitions, and advance the exact corpus totals in
    table properties — O(new docs) work, the corpus already indexed is
    never re-read (the same add-vs-train policy as ivf_index_append;
    the incremental-ingestion discipline the DedupIngestSink band index
    set). Callers feed only NOT-yet-indexed ids (pair with the dedup
    sink or an anti-join upstream); re-appending an id would double its
    postings. Probe results over (build half + append half) are
    identical to a from-scratch full build — postings rows and stats
    are equal by construction (pinned by test)."""
    cfg = index.info.configuration or {}
    nb = int(cfg["text.num_buckets"])
    id_col = cfg.get("text.id_col", "doc_id")
    postings = _postings_frame(new_docs, id_col, text_col, nb)
    index.write(postings, mode="append")
    # stats delta from the appended slice only (aggregate the new
    # postings' per-doc lengths, not the corpus)
    s = (postings.select(id_col, "dl").distinct()
         .agg(F.count(F.lit(1)).alias("n"), F.sum("dl").alias("s"))
         .collect()[0])
    index.set_properties({
        "text.n_docs": str(int(cfg["text.n_docs"]) + (s["n"] or 0)),
        "text.sum_dl": str(int(cfg["text.sum_dl"]) + (s["s"] or 0)),
    })
    return index


def bpe_pair_counts(
    df: DataFrame,
    text_col: str = "text",
    k: int = 20,
) -> DataFrame:
    """The pair-count step of a BPE tokenizer-training iteration
    (Sennrich et al. 2016): corpus-weighted counts of adjacent
    character pairs within words — the statistic whose argmax becomes
    the next merge rule. Scale shape: the corpus collapses to the word
    FREQUENCY table first (vocabulary-bounded — pair extraction runs
    per distinct word, not per occurrence), pairs explode from a
    substring transform (no UDF), one vocabulary-bounded shuffle
    aggregates. Returns the top-k (pair, n_occurrences) by count desc,
    pair asc — deterministic merge order, reproducible cross-engine."""
    toks = df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("_w"))
    wc = (toks.groupBy("_w").agg(F.count(F.lit(1)).alias("_c"))
          .filter(F.length("_w") >= 2))
    pairs = wc.select(
        F.explode(
            F.expr("transform(sequence(1, length(_w) - 1), "
                   "i -> substring(_w, i, 2))")).alias("pair"),
        F.col("_c"))
    return (pairs.groupBy("pair")
            .agg(F.sum("_c").cast("long").alias("n_occurrences"))
            .orderBy(F.col("n_occurrences").desc(), F.col("pair").asc())
            .limit(k))


# ---------------------------------------------------------------------------
# BPE tokenizer: train (merge-rule learning) + apply (encoding)
# ---------------------------------------------------------------------------

def _bpe_word_rep(word: Column) -> Column:
    """A word as its double-space-separated, double-space-padded symbol
    string: ``low`` → ``"  l  o  w  "``. The doubled separator is what
    makes one literal ``replace`` per merge EXACT greedy BPE: matching
    ``" x  y "`` consumes one space from each side, leaving one for the
    neighboring pair, so runs merge left-to-right non-overlapping
    (``a a a a`` → ``aa aa``, never ``aa a a``)."""
    return F.concat(F.lit("  "), F.array_join(F.split(word, ""), "  "),
                    F.lit("  "))


def _bpe_symbols(rep: Column) -> Column:
    return F.filter(F.split(rep, " {2,}"), lambda x: x != "")


def _bpe_merge_once(rep: Column, left: str, right: str) -> Column:
    return F.replace(rep, F.lit(f" {left}  {right} "),
                     F.lit(f" {left}{right} "))


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 10,
    min_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merge rules (Sennrich et al. 2016,
    marker-free variant) from a corpus. Scale shape: the corpus
    collapses to the word-FREQUENCY table in one shuffle, and every
    round after that is vocabulary-bounded — adjacent-symbol pair
    counts weighted by word count, argmax to the driver (one row), one
    JVM-side literal replace. localCheckpoint keeps the per-round plan
    flat instead of stacking k replaces × k pair-expansions. Ties break
    by (count desc, left asc, right asc) — deterministic cross-engine.
    Driver state: the merge list only (num_merges rows)."""
    wc = (df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("_w"))
            .groupBy("_w").agg(F.count(F.lit(1)).alias("_c"))
            .filter(F.length("_w") >= 2)
            .select(_bpe_word_rep(F.col("_w")).alias("_s"), "_c")
            .localCheckpoint(eager=False))
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        syms = _bpe_symbols(F.col("_s"))
        pairs = (wc.select(F.explode(F.arrays_zip(
                    F.slice(syms, F.lit(1), F.size(syms) - 1).alias("l"),
                    F.slice(syms, F.lit(2), F.size(syms) - 1).alias("r"),
                 )).alias("_p"), F.col("_c"))
                 .select(F.col("_p.l").alias("l"), F.col("_p.r").alias("r"),
                         F.col("_c")))
        top = (pairs.groupBy("l", "r")
               .agg(F.sum("_c").cast("long").alias("cnt"))
               .orderBy(F.col("cnt").desc(), F.col("l").asc(),
                        F.col("r").asc())
               .limit(1).collect())
        if not top or top[0]["cnt"] < min_count:
            break
        left, right = top[0]["l"], top[0]["r"]
        merges.append((left, right))
        wc = (wc.select(_bpe_merge_once(F.col("_s"), left, right).alias("_s"),
                        "_c")
                .localCheckpoint(eager=False))
    return merges


def bpe_apply(
    df: DataFrame,
    text_col: str = "text",
    merges: list[tuple[str, str]] | None = None,
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Encode a corpus with an ordered BPE merge list: each document
    becomes one padded symbol string (word reps concatenated — the
    4-space inter-word gap can never match a 2-space intra-word pair,
    so one corpus-wide replace per merge respects word boundaries),
    the merge chain applies as literal JVM replaces inside whole-stage
    codegen, and the result splits back to an ``array<string>`` token
    column. No UDF, no shuffle — a per-row map at any corpus size."""
    reps = F.transform(tokens(F.lower(F.col(text_col))),
                       lambda w: _bpe_word_rep(w))
    rep = F.array_join(reps, "")
    for left, right in (merges or []):
        rep = _bpe_merge_once(rep, left, right)
    return df.withColumn(out_col, _bpe_symbols(rep))
