"""Dataset-curation operators for training-data pipelines: repetition
analysis, stratified quota sampling, and sequence packing.

All pure built-in-function/window plans (JVM, whole-stage codegen) —
no Python UDFs, no driver collects. Every operator is deterministic
arithmetic so a duckdb oracle reproduces it bit-for-bit.

The reference ships none of these (SURVEY §2.5: relational ops are
delegated to Spark); they are "beyond the reference" operators for the
100 TB training-data posture, like the dedup/similarity family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

from starlake_spark.local import local_df

from starlake_spark.functions.text import tokens


def word_bigrams(text: Column) -> Column:
    """Adjacent word pairs as array<string> (empty when <2 tokens)."""
    return _bigrams_of(tokens(text))


def _bigrams_of(w: Column) -> Column:
    return F.when(
        F.size(w) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(w) - 2),
            lambda i: F.concat_ws(
                " ", F.element_at(w, i + 1), F.element_at(w, i + 2)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _top_multiplicity(arr: Column) -> Column:
    """Largest multiplicity of any element in a string array: sort, then
    one linear run-scan fold (``aggregate``). Per-row compute — the
    distributed-count equivalent of ``MAX(c) FROM (GROUP BY element)``
    with zero shuffle."""
    s = F.array_sort(arr)
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        return F.struct(
            x.alias("prev"), run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.aggregate(s, init, step, lambda acc: acc["best"])


def repetition_metrics(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition signals per document.

    Columns: n_tokens, n_distinct, type_token_ratio (distinct/total,
    low = repetitive), top_token_share (most frequent unigram's mass),
    top_bigram_share.

    All five signals are per-document folds over the token array
    (array_sort + run-scan ``aggregate``), so the operator is a single
    embarrassingly-parallel projection: ZERO shuffle, no per-token rows
    ever leave their partition. The explode → groupBy(id, token)
    formulation this replaced shuffles every token in the corpus — at
    100 TB that's the whole dataset through the wire for a per-doc
    statistic. Memory per row is one sorted token array (the document
    itself), the same envelope the tokenizer already needs.
    """
    ids = F.col(id_col)
    base = (
        df.select(ids, tokens(F.col(text_col)).alias("_t"))
        .filter(F.size("_t") > 0)
        .select(ids, "_t", _bigrams_of(F.col("_t")).alias("_b"))
    )
    stats = base.select(
        ids,
        F.size("_t").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("_t")).cast("long").alias("n_distinct"),
        _top_multiplicity(F.col("_t")).alias("_top_uni"),
        F.size("_b").cast("long").alias("_n_bi"),
        _top_multiplicity(F.col("_b")).alias("_top_bi"),
    )
    return stats.select(
        ids,
        "n_tokens",
        "n_distinct",
        F.round(F.col("n_distinct") / F.col("n_tokens"), 6).alias("type_token_ratio"),
        F.round(F.col("_top_uni") / F.col("n_tokens"), 6).alias("top_token_share"),
        F.round(
            F.coalesce(F.col("_top_bi") / F.nullif(F.col("_n_bi"), F.lit(0)), F.lit(0.0)), 6
        ).alias("top_bigram_share"),
    )


GOPHER_STOPWORDS = ["the", "and", "of", "to", "is", "in", "that", "it"]


def gopher_filter_flags(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 15,
    max_tokens: int = 100_000,
    min_mean_len: float = 2.0,
    max_mean_len: float = 12.0,
    min_alpha_ratio: float = 0.6,
    max_top_share: float = 0.25,
) -> DataFrame:
    """Gopher-style document quality rules, each as its own boolean so a
    pipeline can audit WHY a doc was dropped (the published recipe's
    word-count / mean-word-length / alphabetic-word / stopword /
    repetition gates, thresholds as knobs). ``keep`` = all rules pass.

    One embarrassingly-parallel projection: every signal is a fold over
    the doc's own token array (zero shuffle, the repetition_metrics
    posture) — the filter runs scan-side at 100 TB and composes with
    pushdown. All arithmetic is exact-rational or plain double division
    so an external SQL oracle reproduces it bit-for-bit.
    """
    ids = F.col(id_col)
    base = df.select(ids, F.col(text_col).alias("_txt"),
                     tokens(F.col(text_col)).alias("_t"))
    n = F.size("_t")
    sum_len = F.aggregate(
        F.col("_t"), F.lit(0).cast("long"), lambda a, x: a + F.length(x))
    n_alpha = F.size(F.filter(F.col("_t"), lambda x: x.rlike("[A-Za-z]")))
    padded = F.concat(F.lit(" "), F.lower(F.col("_txt")), F.lit(" "))
    stop_hits = None
    for wd in GOPHER_STOPWORDS:
        c = (F.length(padded) - F.length(F.replace(padded, F.lit(f" {wd} ")))) / len(f" {wd} ")
        stop_hits = c if stop_hits is None else stop_hits + c
    top = _top_multiplicity(F.col("_t"))
    safe_n = F.when(n > 0, n.cast("double")).otherwise(F.lit(1.0))
    flags = base.select(
        ids,
        n.cast("long").alias("n_tokens"),
        F.round(sum_len / safe_n, 6).alias("mean_token_len"),
        F.round(n_alpha / safe_n, 6).alias("alpha_ratio"),
        stop_hits.cast("long").alias("stopword_hits"),
        F.round(top / safe_n, 6).alias("top_token_share"),
    )
    return flags.select(
        "*",
        (F.col("n_tokens") >= min_tokens).alias("ok_min_tokens"),
        (F.col("n_tokens") <= max_tokens).alias("ok_max_tokens"),
        F.col("mean_token_len").between(min_mean_len, max_mean_len).alias("ok_mean_len"),
        (F.col("alpha_ratio") >= min_alpha_ratio).alias("ok_alpha"),
        (F.col("stopword_hits") >= 1).alias("ok_stopwords"),
        (F.col("top_token_share") <= max_top_share).alias("ok_repetition"),
    ).select(
        "*",
        (F.col("ok_min_tokens") & F.col("ok_max_tokens") & F.col("ok_mean_len")
         & F.col("ok_alpha") & F.col("ok_stopwords") & F.col("ok_repetition")
         ).alias("keep"),
    )


def boilerplate_flags(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 4,
    min_df: int = 10,
    max_ratio: float = 0.5,
) -> DataFrame:
    """Corpus-frequent-span (boilerplate) detection: a document whose
    word ``shingle_n``-gram shingles mostly occur in ≥ ``min_df`` OTHER
    documents is template/boilerplate text (nav bars, license headers),
    the RefinedWeb-style corpus-level strip signal. Emits per doc:
    n_shingles, n_frequent, boilerplate_ratio, is_boilerplate.

    Plan: one explode → distinct (doc, shingle) → groupBy(shingle) for
    document frequency → join back → per-doc count. Two shuffles, both
    on shingle-sized keys with map-side combine; the shingle DF table is
    vocabulary-bounded. No UDFs, exactly reproducible in SQL.
    """
    from starlake_spark.functions.dedup import word_shingles

    ids = F.col(id_col)
    sh = (
        df.select(ids, F.explode(word_shingles(F.col(text_col), shingle_n)).alias("s"))
    ).localCheckpoint(eager=True)
    freq = sh.groupBy("s").agg(F.count_distinct(ids).alias("_df"))
    per_doc = (
        sh.join(freq, "s")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum((F.col("_df") >= min_df).cast("long")).alias("n_frequent"),
        )
    )
    ratio = F.col("n_frequent") / F.col("n_shingles")
    return per_doc.select(
        id_col, "n_shingles", "n_frequent",
        F.round(ratio, 6).alias("boilerplate_ratio"),
        (ratio > max_ratio).alias("is_boilerplate"),
    )


def quota_sample(
    df: DataFrame,
    group_cols: list[str],
    quota: int,
    id_col: str,
    salt_col: Column | None = None,
) -> DataFrame:
    """Deterministic stratified sampling: keep at most ``quota`` rows
    per group, chosen by a content-hash shuffle order (md5 of the id by
    default) so the sample is stable across runs/engines and unbiased
    w.r.t. the ingestion order.

    One hash-partitioned window per group — rank computation is a
    single shuffle on group_cols; groups process independently so skew
    is bounded by the largest group (salt the group key upstream if a
    group is pathological). Adds ``sample_rank``.
    """
    salt = salt_col if salt_col is not None else F.md5(F.col(id_col).cast("string"))
    w = W.partitionBy(*group_cols).orderBy(salt.asc(), F.col(id_col).asc())
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= quota)
    )


def pack_sequences(
    df: DataFrame,
    token_col: str,
    budget: int,
    partition_col: str,
    order_col: str,
) -> DataFrame:
    """Concat-then-chunk sequence-packing plan: documents are laid out
    end-to-end in ``order_col`` order within each ``partition_col``
    shard, and every ``budget`` tokens starts a new chunk. Emits, per
    document, the chunk it STARTS in and its token offset there —
    exactly the metadata a tokenizer-side packer needs to materialize
    fixed-length training sequences.

    A running-sum window per shard: one shuffle on the shard key, state
    O(1) per row. Shards (source/file/date) keep the window off a
    single global ordering, so it scales with shard count — the 100 TB
    layout is many shards, each windowed independently.
    """
    w = (
        W.partitionBy(partition_col)
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = F.sum(F.col(token_col)).over(w)
    start = cum - F.col(token_col)
    return df.select(
        "*",
        F.floor(start / budget).cast("long").alias("chunk_id"),
        (start % budget).cast("long").alias("chunk_offset"),
    )


HASH_SPACE = float(1 << 32)  # 16^8 — the md5-prefix uniform's range


def _hash_uniform_keep(id_col: Column, rate: Column) -> Column:
    """Deterministic cross-engine Bernoulli(rate): keep iff the first 8
    hex digits of md5(id) — a uniform over [0, 16^8) — fall below
    floor(rate·16^8), compared AS HEX STRINGS so Spark and duckdb agree
    byte-for-byte (both emit lowercase md5; the threshold is lowercased
    zero-padded hex)."""
    thresh = F.lower(
        F.lpad(F.hex(F.floor(rate * F.lit(HASH_SPACE)).cast("long")), 8, "0"))
    u8 = F.substring(F.md5(id_col.cast("string")), 1, 8)
    return (rate >= 1.0) | (u8 < thresh)


def mixture_sample(
    df: DataFrame,
    group_col: str,
    weights: dict[str, float],
    id_col: str,
) -> DataFrame:
    """Deterministic domain-mixture resampling: downsample each group so
    the kept corpus approaches the target mixture ``weights`` (shares
    over groups) WITHOUT upsampling — the standard pre-training recipe
    for re-balancing web/books/code/etc.

    K = min_g(n_g / w_g) is the largest total the targets allow without
    repeating data; each group keeps rate_g = w_g·K / n_g of its rows,
    selected by the content-hash Bernoulli (stable across runs, engines,
    and ingestion order). Groups absent from ``weights`` are dropped.

    Plan shape: one count aggregate over the group column (shuffles
    (group, count) pairs only), rates broadcast back, then a scan-side
    filter — the corpus itself never shuffles.
    """
    spark = df.sparkSession
    wdf = local_df(spark,
        [(k, float(v)) for k, v in sorted(weights.items())],
        f"{group_col} string, _w double")
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    j = counts.join(wdf, group_col)
    k = j.select(F.min(F.col("_n") / F.col("_w")).alias("_K"))
    rates = j.crossJoin(k).select(
        group_col,
        F.least(F.lit(1.0), F.col("_w") * F.col("_K") / F.col("_n")).alias("_rate"),
    )
    return (
        df.join(F.broadcast(rates), group_col)
        .filter(_hash_uniform_keep(F.col(id_col), F.col("_rate")))
        .drop("_rate")
    )


def split_assign(
    df: DataFrame,
    id_col: str,
    ratios: dict[str, float],
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: each row's md5-prefix
    uniform (salted, so different splits of the same corpus are
    independent) lands in one of the ``ratios`` bands, in sorted split
    name order. Pure projection — no shuffle, stable across runs,
    engines, and corpus growth (a doc keeps its split when new docs
    arrive — the property random splits lack)."""
    total = sum(ratios.values())
    u8 = F.substring(
        F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))), 1, 8)
    expr = None
    acc = 0.0
    names = sorted(ratios)
    for name in names[:-1]:
        acc += ratios[name] / total
        bound = F.lit(format(int(acc * HASH_SPACE), "08x"))
        cond = u8 < bound
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


# ---------------------------------------------------------------------------
# Corpus unigram-LM perplexity (CCNet-style quality signal, with the
# corpus itself as the language model instead of an external KenLM)
# ---------------------------------------------------------------------------


def unigram_perplexity(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document perplexity under the corpus unigram LM:
    ppl(d) = exp(-(1/n) * sum_i ln p(w_i)), p(w) = count(w)/total.

    Cross-engine exactness: each distinct word's ln p is rounded to 9 dp
    and summed as DECIMAL(28,9) weighted by the in-doc count, so the
    per-doc aggregate is exact and order-independent; only the final
    exp/round touches floats. Scale shape: one token explode, one
    vocabulary-bounded shuffle to count words, one shuffle back on the
    word to attach log-probs (vocabulary ≪ corpus, so AQE broadcasts
    the count side when it fits), one per-doc agg."""
    toks = (
        df.select(F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("_w"))
    )
    # (doc, word) -> in-doc count: shrinks the join-back to distinct
    # (doc, word) pairs instead of every token occurrence
    doc_word = toks.groupBy(id_col, "_w").agg(F.count(F.lit(1)).alias("_c"))
    vocab = doc_word.groupBy("_w").agg(F.sum("_c").alias("_cnt"))
    total = vocab.agg(F.sum("_cnt").alias("_tot"))
    # DECIMAL(18,9) * DECIMAL(10,0) keeps the product inside Spark's
    # 38-digit cap at scale 9 — a wider operand (e.g. 28,9 * bigint)
    # silently loses scale to 6 under allowPrecisionLoss and the
    # aggregate stops matching the oracle
    logp = vocab.crossJoin(F.broadcast(total)).select(
        "_w",
        F.round(F.log(F.col("_cnt").cast("double") / F.col("_tot")), 9)
        .cast("decimal(18,9)")
        .alias("_lp"),
    )
    return (
        doc_word.join(logp, "_w")
        .groupBy(id_col)
        .agg(
            F.sum("_c").cast("long").alias("n_tokens"),
            F.sum(F.col("_lp") * F.col("_c").cast("decimal(10,0)")).alias("_slp"),
        )
        .select(
            id_col,
            "n_tokens",
            F.round(
                F.exp(-(F.col("_slp").cast("double")) / F.col("n_tokens")), 6
            ).alias("ppl"),
        )
    )


def bigram_perplexity(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.75,
) -> DataFrame:
    """Per-document perplexity under a Jelinek-Mercer-interpolated
    corpus bigram LM: p(w2|w1) = λ·c(w1,w2)/c(w1·) + (1-λ)·c(w2)/total,
    scored over each doc's n-1 bigram positions — the KenLM-lite
    quality signal (CCNet filters on exactly this kind of LM score,
    one order up from unigram_perplexity).

    Cross-engine exactness (same discipline as unigram_perplexity):
    each distinct bigram's ln p is computed in one fixed expression
    shape, rounded to 9 dp, and DECIMAL-summed weighted by in-doc
    count; only the final exp/round is float. Scale shape: one array
    zip per doc builds bigrams with ZERO shuffle, then three
    vocabulary-bounded shuffles (bigram counts, w1 contexts derived
    from the bigram table, unigram counts) and one per-doc agg — no
    shuffle ever carries positions or raw text."""
    toks = (df.select(F.col(id_col), tokens(F.lower(F.col(text_col))).alias("_t"))
              .filter(F.size("_t") >= 2))
    n_tok = toks.select(id_col, F.size("_t").cast("long").alias("n_tokens"))
    bg = toks.select(
        F.col(id_col),
        F.explode(F.zip_with(
            F.slice(F.col("_t"), 1, F.size("_t") - 1),
            F.slice(F.col("_t"), 2, F.size("_t") - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )).alias("_bg"),
    )
    doc_bg = bg.groupBy(id_col, "_bg").agg(F.count(F.lit(1)).alias("_c"))
    bg_cnt = doc_bg.groupBy("_bg").agg(F.sum("_c").alias("_cb"))
    ctx = (bg_cnt.groupBy(F.split(F.col("_bg"), " ")[0].alias("_w1"))
                 .agg(F.sum("_cb").alias("_c1")))
    uni = (df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("_w"))
             .groupBy("_w").agg(F.count(F.lit(1)).alias("_cu")))
    tot = uni.agg(F.sum("_cu").alias("_tot"))
    logp = (
        bg_cnt
        .withColumn("_w1", F.split(F.col("_bg"), " ")[0])
        .withColumn("_w2", F.split(F.col("_bg"), " ")[1])
        .join(ctx, "_w1")
        .join(uni.withColumnRenamed("_w", "_w2"), "_w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "_bg",
            F.round(F.log(
                F.lit(lam) * (F.col("_cb").cast("double") / F.col("_c1"))
                + F.lit(1.0 - lam) * (F.col("_cu").cast("double") / F.col("_tot"))
            ), 9).cast("decimal(18,9)").alias("_lp"),
        )
    )
    return (
        doc_bg.join(logp, "_bg")
        .groupBy(id_col)
        .agg(
            F.sum("_c").cast("long").alias("n_bigrams"),
            F.sum(F.col("_lp") * F.col("_c").cast("decimal(10,0)")).alias("_slp"),
        )
        .join(n_tok, id_col)
        .select(
            id_col,
            "n_tokens",
            "n_bigrams",
            F.round(
                F.exp(-(F.col("_slp").cast("double")) / F.col("n_bigrams")), 6
            ).alias("ppl"),
        )
    )


def dsir_importance(
    df: DataFrame,
    target_cond: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR-style importance scores (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score each document
    by how much likelier its unigrams are under the TARGET slice's
    distribution than under the full corpus's,

        log w(d) = Σ_w c_d(w) · ln( p_t(w) / p_c(w) ),

    with Laplace smoothing over the corpus vocabulary (so words absent
    from the target slice contribute a finite negative signal instead of
    -inf). Downstream, resampling is a quota_sample / top-k over
    ``log_w`` — the score is the operator.

    Cross-engine exactness (the unigram_perplexity discipline): each
    word's log-ratio is computed in one fixed double expression shape,
    rounded to 9 dp, and DECIMAL-summed weighted by in-doc count, so
    the per-doc aggregate is order-independent. Scale shape: one token
    explode, vocabulary-bounded shuffles for the two count tables (the
    target side derives from the same (doc, word) partial — the corpus
    is tokenized ONCE), one join back on the word key (AQE broadcasts
    the vocabulary side when it fits), one per-doc agg. The vocabulary
    size / totals ride a 1-row broadcast — no driver collect."""
    toks = df.select(
        F.col(id_col), target_cond.alias("_tgt"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("_w"))
    doc_word = (toks.groupBy(id_col, "_w")
                .agg(F.count(F.lit(1)).alias("_c"),
                     F.max("_tgt").alias("_tgt")))
    vocab = (doc_word.groupBy("_w")
             .agg(F.sum("_c").alias("_ca"),
                  F.sum(F.when(F.col("_tgt"), F.col("_c"))
                        .otherwise(F.lit(0))).alias("_ct")))
    totals = vocab.agg(
        F.count(F.lit(1)).alias("_v"),
        F.sum("_ca").alias("_ta"),
        F.sum("_ct").alias("_tt"))
    logr = vocab.crossJoin(F.broadcast(totals)).select(
        "_w",
        F.round(F.log(
            ((F.col("_ct") + F.lit(1)).cast("double")
             / (F.col("_tt") + F.col("_v")))
            / ((F.col("_ca") + F.lit(1)).cast("double")
               / (F.col("_ta") + F.col("_v")))), 9)
        .cast("decimal(18,9)").alias("_lr"),
    )
    return (
        doc_word.join(logr, "_w")
        .groupBy(id_col)
        .agg(
            F.sum("_c").cast("long").alias("n_tokens"),
            F.sum(F.col("_lr") * F.col("_c").cast("decimal(10,0)")).alias("_s"),
        )
        .select(
            id_col, "n_tokens",
            F.round(F.col("_s").cast("double"), 6).alias("log_w"))
    )
