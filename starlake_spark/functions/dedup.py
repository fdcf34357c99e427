"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (the 100 TB rationale, per operator):

* **exact** — one hash-shuffle on the fingerprint; map-side partial
  aggregation makes the shuffle carry ~unique keys only.
* **MinHash+LSH** — signatures are computed scan-side with built-in
  hash functions over shingle arrays (no UDF, no driver state); the
  candidate join shuffles on (band_id, band_hash) so only colliding
  buckets meet. Classic shingle→minhash→band→bucket-join pipeline.
* **SimHash** — 64-bit signature via per-shingle xxhash64 bit-voting;
  near-dup = popcount(sig1 XOR sig2) <= k over band-bucketed candidates.
* **n-gram Jaccard** — exact pairwise similarity but only over pairs
  that share at least one shingle (explode + self-join on shingle),
  never a cross join.

Everything is a DataFrame-in / DataFrame-out transform built from
built-in functions, so Catalyst keeps pushdown/pruning and AQE handles
skewed buckets (e.g. a boilerplate shingle shared by millions of docs —
cap bucket width with `max_bucket` to bound the quadratic corner).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window, functions as F
from pyspark.sql.types import ArrayType, LongType

from starlake_spark.functions import text as tx

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def dedup_exact(
    df: DataFrame, cols: list[str], id_col: str, keep: str = "min"
) -> DataFrame:
    """Keep one row per distinct (cols) value — the row with min/max id.

    groupBy + min-id + semi-join keeps the shuffle payload to
    (key, id) pairs instead of whole rows."""
    agg = F.min(F.col(id_col)) if keep == "min" else F.max(F.col(id_col))
    keep_ids = df.groupBy(*cols).agg(agg.alias(id_col))
    return df.join(keep_ids.select(id_col), on=id_col, how="left_semi")


def dedup_exact_text(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact content dedup on the normalized-text fingerprint."""
    withfp = df.withColumn("_fp", tx.fingerprint(F.col(text_col)))
    out = dedup_exact(withfp, ["_fp"], id_col)
    return out.drop("_fp")


# ---------------------------------------------------------------------------
# shingling
# ---------------------------------------------------------------------------


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles as array<string> (JVM higher-order
    functions; no UDF). Grams are built by chaining n-1 zip_with steps
    against shifted views of the token array — ~2× faster than the
    transform(sequence)+slice formulation, which re-slices the array
    per output position. zip_with pads the shorter side with nulls
    (concat_ws skips them → trailing partial grams), so the result is
    sliced back to the len-n+1 true gram positions."""
    toks = tx.tokens(F.lower(text))
    grams = toks
    for j in range(1, n):
        # NOT Integer.MAX_VALUE: slice checks start+length overflow
        grams = F.zip_with(
            grams, F.slice(toks, j + 1, 1 << 30),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    full = F.array_distinct(F.slice(grams, 1, F.size(toks) - n + 1))
    return F.when(F.size(toks) >= n, full).otherwise(
        F.when(F.size(toks) > 0, F.array(F.concat_ws(" ", toks))).otherwise(
            F.array().cast("array<string>")
        )
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def shingle_hashes(text: Column, n: int = 3) -> Column:
    """One xxhash64 per shingle (array<long>). Hash ONCE here, then
    derive every MinHash permutation / SimHash bit from these longs —
    re-hashing the string per seed costs 128× the scan time."""
    return F.transform(word_shingles(text, n), lambda s: F.xxhash64(s))


def _affine_params(num_hashes: int) -> tuple[list[int], list[int]]:
    """Deterministic (a, b) per permutation. a < 2^30 and the shingle
    hash masked to 32 bits keep a*h+b inside int64 (ANSI mode: Spark 4
    raises on long overflow, so no wraparound tricks)."""

    rng = np.random.RandomState(42)
    a = rng.randint(1, 1 << 30, size=num_hashes, dtype=np.int64)
    b = rng.randint(0, 1 << 30, size=num_hashes, dtype=np.int64)
    return [int(x) for x in a], [int(x) for x in b]


# prime just above 2^32: universal-hash modulus for the permutations
_MINHASH_PRIME = 4294967311


def _in_bucket_pairs(ids: Column) -> Column:
    """All unordered pairs {id_a < id_b} of an id array, as
    array<struct<id_a, id_b>> — nested transform + flatten (codegen).
    Caller bounds the array size (max_bucket) so this never goes
    quadratic on a degenerate bucket."""
    s = F.array_sort(ids)

    def pair_with_rest(x, i):
        # pairs of element i with every later element
        rest = F.slice(s, i + 2, F.size(s))
        return F.transform(rest, lambda y: F.struct(x.alias("id_a"), y.alias("id_b")))

    return F.flatten(F.transform(s, pair_with_rest))


def minhash_signature(hashes: Column, num_hashes: int = 128) -> Column:
    """MinHash signature from pre-computed shingle hashes (see
    ``shingle_hashes``): sig[i] = min over shingles of
    (a_i*(h&0xffffffff)+b_i) mod p. The mod-p wraparound is what makes
    the permutations independent — a plain affine a*h+b is monotonic in
    h, so every sig[i] would collapse to a function of the same min
    hash.

    Arrow-batched numpy: one (shingles × num_hashes) broadcasted
    mult-add-mod + column-min per doc. The all-codegen alternative
    (num_hashes separate array_min(transform(...)) expressions) compiles
    a huge Janino method per query — measured slower and with high
    run-to-run variance from codegen churn; this is the "UDF where
    built-ins genuinely can't express it efficiently" case."""
    a, b = _affine_params(num_hashes)
    A = np.asarray(a, dtype=np.int64)
    B = np.asarray(b, dtype=np.int64)

    @F.pandas_udf(ArrayType(LongType()))
    def mh_np(hs: pd.Series) -> pd.Series:
        out = []
        empty = ((B % _MINHASH_PRIME)).astype(np.int64)
        for arr in hs:
            if arr is None or len(arr) == 0:
                out.append(empty)
                continue
            h = (np.asarray(arr, dtype=np.int64) & 0xFFFFFFFF).reshape(-1, 1)
            out.append(((h * A + B) % _MINHASH_PRIME).min(axis=0))
        return pd.Series(out)

    return mh_np(hashes)


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 128,
    bands: int = 32,
    shingle_n: int = 3,
    max_bucket: int = 1000,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) from banded MinHash.

    rows/band bucket are capped at `max_bucket` to bound the quadratic
    blowup of degenerate buckets (boilerplate text) — dropped buckets
    are the standard LSH trade-off, logged by callers if needed.
    """
    # two select boundaries: shingle hashes materialize once, then the
    # signature; inlining would re-evaluate the shingle pipeline per seed
    with_hs = df.select(F.col(id_col), shingle_hashes(F.col(text_col), shingle_n).alias("_hs"))
    return _candidates_from_hashes(with_hs, id_col, "_hs", num_hashes, bands, max_bucket)


def _candidates_from_hashes(
    with_hs: DataFrame,
    id_col: str,
    hash_col: str,
    num_hashes: int,
    bands: int,
    max_bucket: int,
) -> DataFrame:
    """Banded-LSH core over precomputed shingle hashes — split out so
    ``minhash_dedup`` can feed a shared shingle frame instead of
    re-deriving text→tokens→shingles a second time."""
    rows_per_band = num_hashes // bands
    with_sig = with_hs.select(
        id_col, minhash_signature(F.col(hash_col), num_hashes).alias("_sig")
    )

    banded = with_sig.select(
        id_col,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    # xxhash64 hashes the sliced array<long> directly
                    F.xxhash64(F.slice(F.col("_sig"), b * rows_per_band + 1, rows_per_band)).alias("bh"),
                )
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))

    # pair generation via groupBy-collect, NOT a self-join: one shuffle
    # on (band, bh), no second evaluation of the signature lineage, and
    # the bucket-size cap is a plain size() filter. In-bucket pair
    # explosion stays in codegen (nested transform + flatten).
    pairs = (
        banded.groupBy("band", "bh")
        .agg(F.collect_set(F.col(id_col)).alias("_ids"))
        .filter((F.size("_ids") >= 2) & (F.size("_ids") <= max_bucket))
        .select(F.explode(_in_bucket_pairs(F.col("_ids"))).alias("_p"))
        .select(F.col("_p.id_a").alias("id_a"), F.col("_p.id_b").alias("id_b"))
        .distinct()
    )
    return pairs


def minhash_lsh_candidates_shingled(
    shingled: DataFrame,
    id_col: str = "doc_id",
    shingle_col: str = "_sh",
    num_hashes: int = 128,
    bands: int = 32,
    max_bucket: int = 1000,
) -> DataFrame:
    """``minhash_lsh_candidates`` over a PRE-SHINGLED frame — pairs with
    ``ngram_jaccard_pairs_shingled`` when several pipelines share one
    materialized shingle frame. The trade is real only when the
    text→shingle scan dominates (wide corpora at scale): materializing
    shingle string arrays costs ~3× their text, so at small scale the
    straight-from-text variants measure faster — pick per workload."""
    with_hs = shingled.select(
        F.col(id_col),
        F.transform(F.col(shingle_col), lambda s: F.xxhash64(s)).alias("_hs"),
    )
    return _candidates_from_hashes(with_hs, id_col, "_hs", num_hashes, bands, max_bucket)


def minhash_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    num_hashes: int = 128,
    bands: int = 32,
    shingle_n: int = 3,
    shingled: DataFrame | None = None,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Near-dup dedup: LSH candidates → exact Jaccard verify → greedy
    keep-smallest-id (a doc is dropped if it duplicates any smaller id;
    single-pass approximation of connected components that needs no
    iteration — at 100 TB the iterative union-find is a separate job).

    The shingle arrays are computed ONCE into a materialized frame that
    feeds both the signature pipeline and the two verify sides — at
    100 TB the text→tokenize→shingle scan is the dominant cost and must
    not run three times. localCheckpoint persists MEMORY_AND_DISK (it
    spills), the same trade ``ngram_jaccard_pairs`` makes. Callers that
    already hold a materialized (id, shingle-array) frame pass it as
    ``shingled`` and skip the text scan entirely."""
    sh = shingled if shingled is not None else df.select(
        F.col(id_col), word_shingles(F.col(text_col), shingle_n).alias("_sh")
    ).localCheckpoint(eager=True)
    # callers that already materialized the banded-LSH candidate pairs
    # (pipelines running candidate inspection AND dedup over one corpus)
    # pass them in and skip the signature pipeline entirely
    cand = candidates if candidates is not None else minhash_lsh_candidates_shingled(
        sh, id_col, "_sh", num_hashes, bands
    )
    verified = verify_jaccard_shingled(sh, cand, id_col, "_sh").filter(
        F.col("jaccard") >= threshold
    )
    losers = verified.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, on=id_col, how="left_anti")


def verify_jaccard(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs: pairs ⋈ shingle
    sets twice, |∩| via array_intersect — set sizes stay bounded by doc
    length so the join rows are small."""
    sh = df.select(
        F.col(id_col), word_shingles(F.col(text_col), shingle_n).alias("_sh")
    )
    return verify_jaccard_shingled(sh, pairs, id_col, "_sh")


def verify_jaccard_shingled(
    sh: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    shingle_col: str = "_sh",
) -> DataFrame:
    """``verify_jaccard`` over a PRE-SHINGLED frame (id, array<string>),
    so a caller that already materialized shingles (minhash_dedup) never
    re-runs the text pipeline on either join side."""
    s = sh.select(F.col(id_col), F.col(shingle_col).alias("_sh"))
    j = (
        pairs.join(s.withColumnRenamed(id_col, "id_a").withColumnRenamed("_sh", "_sha"), "id_a")
        .join(s.withColumnRenamed(id_col, "id_b").withColumnRenamed("_sh", "_shb"), "id_b")
    )
    inter = F.size(F.array_intersect(F.col("_sha"), F.col("_shb"))).cast("double")
    union = (F.size("_sha") + F.size("_shb") - inter).cast("double")
    return j.select(
        "id_a",
        "id_b",
        F.when(union > 0, inter / union).otherwise(F.lit(1.0)).alias("jaccard"),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard over pairs sharing ≥1 shingle (no LSH, no
    cross join): explode shingles → self-join on shingle → count shared
    → join set sizes → Jaccard. The fully-SQL-expressible variant used
    as the duckdb oracle for the MinHash path.

    The exploded (id, shingle) frame feeds three plan branches (both
    self-join sides + the set-size agg); Spark's exchange reuse does not
    canonicalize them together, so without materialization the whole
    tokenize→shingle→explode pipeline runs 3-4×. localCheckpoint
    computes it once (MEMORY_AND_DISK, spills at scale) — the same
    trade the iterative CC loop already makes."""
    sh = df.select(
        F.col(id_col), word_shingles(F.col(text_col), shingle_n).alias("_sh")
    )
    return ngram_jaccard_pairs_shingled(sh, id_col, "_sh", threshold)


def ngram_jaccard_pairs_shingled(
    shingled: DataFrame,
    id_col: str = "doc_id",
    shingle_col: str = "_sh",
    threshold: float = 0.5,
) -> DataFrame:
    """``ngram_jaccard_pairs`` over a PRE-SHINGLED frame
    (id, array<string>) — callers that already materialized shingles
    (the minhash contract entries share ONE shingle pass between the
    LSH and exact pipelines) skip the text re-scan."""
    # join on xxhash64(shingle) instead of the shingle string: the
    # self-join shuffle then moves 8-byte longs, not n-gram strings
    # (~2× less shuffle volume measured at sf0.1; collision odds over
    # the whole corpus are ~2^-64 * |shingles|^2, i.e. never)
    sh = (
        shingled.select(F.col(id_col), F.explode(F.col(shingle_col)).alias("_s"))
        .select(F.col(id_col), F.xxhash64("_s").alias("s"))
        .localCheckpoint(eager=True)
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("nsh"))
    a = sh.alias("a")
    b = sh.alias("b")
    shared = (
        a.join(b, on="s")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        shared.join(sizes.select(F.col(id_col).alias("id_a"), F.col("nsh").alias("na")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("nsh").alias("nb")), "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("inter").cast("double") / (F.col("na") + F.col("nb") - F.col("inter"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out


def decontaminate(
    df: DataFrame,
    contamination: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 4,
    min_shared: int = 2,
    corpus_shingles: DataFrame | None = None,
    cont_shingles: DataFrame | None = None,
) -> DataFrame:
    """Benchmark decontamination: drop corpus documents sharing at least
    ``min_shared`` distinct word n-gram shingles with the contamination
    corpus (held-out eval/benchmark text).

    Scale posture: the contamination side collapses to its DISTINCT
    shingle set — benchmarks are tiny next to a training corpus, so
    Catalyst broadcasts that side and the overlap join never shuffles
    the corpus explode; the per-document distinct-shingle count is one
    groupBy on ids that already matched (a sliver of the corpus).
    """
    sh = corpus_shingles if corpus_shingles is not None else df.select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), shingle_n)).alias("s"))
    cont = (cont_shingles if cont_shingles is not None else contamination
            .select(F.explode(word_shingles(F.col(text_col), shingle_n)).alias("s"))
            ).select("s").distinct()
    hits = (sh.join(cont, "s")
              .groupBy(id_col)
              .agg(F.count_distinct("s").alias("_shared"))
              .filter(F.col("_shared") >= min_shared)
              .select(id_col))
    return df.join(hits, id_col, "left_anti")


# ---------------------------------------------------------------------------
# Bloom-filter decontamination (set-membership at 100 TB)
# ---------------------------------------------------------------------------

_BLOOM_SEED_MASK = np.uint64(0xFFFFFFFF)


def _bloom_positions(h: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """k bit positions per input hash by Kirsch-Mitzenmacher double
    hashing: pos_i = (h1 + i·h2) mod m, h1/h2 the hash's two 32-bit
    halves (h2 forced odd so the stride cycles the whole table).
    Deterministic — build and probe agree on every engine."""
    u = h.astype(np.uint64)
    h1 = u & _BLOOM_SEED_MASK
    h2 = ((u >> np.uint64(32)) | np.uint64(1))
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits))


def build_bloom(
    df: DataFrame, hash_col: str, m_bits: int = 1 << 22, k: int = 5
) -> np.ndarray:
    """Distributed Bloom-filter build over an int64 hash column: each
    partition folds its hashes into a local m-bit numpy bitmap
    (mapInPandas), the driver ORs the partials. Driver traffic is
    partitions × m/8 bytes — independent of cardinality, which is the
    whole point: a contamination set too big to broadcast as a distinct
    list still compresses to a fixed bitmap. False-positive rate for n
    keys ≈ (1 - e^(-kn/m))^k; NO false negatives (the containment
    theorem downstream contracts rely on)."""
    words = m_bits // 64

    def fold(batches):
        bits = np.zeros(words, dtype=np.uint64)
        seen = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            seen = True
            pos = _bloom_positions(pdf[hash_col].to_numpy(), m_bits, k).ravel()
            np.bitwise_or.at(bits, pos >> 6, np.uint64(1) << (pos & np.uint64(63)))
        if seen:
            yield pd.DataFrame({"bits": [bits.tobytes()]})

    parts = df.select(hash_col).mapInPandas(fold, "bits binary").collect()
    out = np.zeros(words, dtype=np.uint64)
    for r in parts:
        out |= np.frombuffer(r["bits"], dtype=np.uint64)
    return out


def bloom_contains(hash_col: Column, bits: np.ndarray, m_bits: int, k: int,
                   spark) -> Column:
    """Membership probe against a broadcast Bloom bitmap — one
    vectorized gather per Arrow batch."""
    bc = spark.sparkContext.broadcast(bits)

    @F.pandas_udf("boolean")
    def probe(hs: pd.Series) -> pd.Series:
        b = bc.value
        if len(hs) == 0:
            return pd.Series(np.zeros(0, dtype=bool))
        pos = _bloom_positions(hs.to_numpy(), m_bits, k)
        hit = (b[pos >> 6] >> (pos & np.uint64(63))) & np.uint64(1)
        return pd.Series(hit.all(axis=1))

    return probe(hash_col)


def bloom_decontaminate(
    df: DataFrame,
    contamination: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 4,
    min_shared: int = 2,
    m_bits: int = 1 << 22,
    k: int = 5,
    corpus_shingles: DataFrame | None = None,
    cont_shingles: DataFrame | None = None,
) -> DataFrame:
    """``decontaminate`` with the contamination side compressed to a
    Bloom bitmap instead of a broadcast distinct-shingle list — the
    100 TB shape when the held-out set itself is large (the bitmap is
    fixed-size regardless of shingle cardinality) or when a join-free
    scan-side filter is wanted. Because Bloom filters have no false
    negatives, every document the exact overlap-join would drop is also
    dropped here; false positives can only drop extra docs (rate set by
    m/k), never keep a contaminated one."""
    spark = df.sparkSession
    cont_h = (
        cont_shingles.select(F.xxhash64("s").alias("h"))
        if cont_shingles is not None
        else contamination.select(
            F.explode(shingle_hashes(F.col(text_col), shingle_n)).alias("h"))
    ).distinct()
    bits = build_bloom(cont_h, "h", m_bits, k)
    sh = (
        corpus_shingles.select(F.col(id_col), F.xxhash64("s").alias("h"))
        if corpus_shingles is not None
        else df.select(
            F.col(id_col), F.explode(shingle_hashes(F.col(text_col), shingle_n)).alias("h"))
    )
    hits = (
        sh.filter(bloom_contains(F.col("h"), bits, m_bits, k, spark))
        .groupBy(id_col)
        .agg(F.count_distinct("h").alias("_shared"))
        .filter(F.col("_shared") >= min_shared)
        .select(id_col)
    )
    return df.join(hits, id_col, "left_anti")


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 15,
) -> DataFrame:
    """Connected components over near-dup pairs by iterative min-label
    propagation: each node repeatedly takes the smallest label among
    itself and its neighbours until fixpoint, converging to the minimum
    reachable id — the true transitive-closure grouping that the
    greedy keep-smallest-id pass in `minhash_dedup` approximates.

    Scale notes: dup-cluster graphs have tiny diameters, so the loop
    runs O(diameter) rounds of one shuffle each; `localCheckpoint`
    truncates lineage every round (an iterative plan otherwise grows
    exponentially); convergence is a limit(1) probe, not a full count.
    Output: (node, component) where component = min id in the cluster.
    """
    edges = pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
    edges = edges.union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    edges = edges.localCheckpoint(eager=True)
    labels = edges.select("u").distinct().withColumn("label", F.col("u"))
    for _ in range(max_iter):
        neigh = (
            edges.join(
                labels.select(F.col("u").alias("v"), F.col("label").alias("vl")), "v")
            .groupBy("u").agg(F.min("vl").alias("nl"))
        )
        # carry the previous label through the checkpoint so convergence
        # detection is a filter on the materialized frame — no extra
        # old-vs-new join job per round
        new_labels = (
            labels.join(neigh, "u", "left")
            .select(
                "u",
                F.least(F.col("label"),
                        F.coalesce(F.col("nl"), F.col("label"))).alias("label"),
                F.col("label").alias("_prev"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter(F.col("label") != F.col("_prev")).limit(1).count()
        labels = new_labels.select("u", "label")
        if changed == 0:
            break
    return labels.select(F.col("u").alias("node"), F.col("label").alias("component"))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def _simhash_from_hashes_udf():
    """Arrow-batched numpy SimHash: 64 bit-votes in one vectorized pass
    per document. The expression-tree alternative (64 separate
    ``F.aggregate`` traversals of the hash array) measured ~50× slower —
    per-bit array re-traversal dominates; this is the "UDFs only where
    built-ins genuinely can't express it efficiently" case."""

    @F.pandas_udf(LongType())
    def simhash_np(hs: pd.Series) -> pd.Series:
        res = np.zeros(len(hs), dtype=np.int64)
        shifts = np.arange(64, dtype=np.uint64)
        for i, arr in enumerate(hs):
            if arr is None or len(arr) == 0:
                continue
            h = np.asarray(arr, dtype=np.int64).astype(np.uint64)
            bits = ((h[:, None] >> shifts) & np.uint64(1)).astype(np.int32)
            votes = (2 * bits - 1).sum(axis=0)
            sig = np.uint64(0)
            for b in np.nonzero(votes > 0)[0]:
                sig |= np.uint64(1) << np.uint64(b)
            res[i] = sig.astype(np.int64)
        return pd.Series(res)

    return simhash_np


def simhash64(text: Column, shingle_n: int = 2) -> Column:
    """64-bit SimHash of a text column: per-shingle xxhash64, then each
    signature bit is the majority vote of that bit across shingles."""
    return _simhash_from_hashes_udf()(shingle_hashes(text, shingle_n))


def simhash_near_dupes(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    shingle_n: int = 2,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, bucketed on 16-bit
    signature bands (a pair within hamming<=3 of 64 bits must agree on
    at least one of 4 bands) so the join never goes quadratic."""
    sig = df.select(F.col(id_col), simhash64(F.col(text_col), shingle_n).alias("_sim"))
    bands = sig.select(
        id_col,
        "_sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band"),
                        F.shiftrightunsigned(F.col("_sim"), k * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("bh"),
                    )
                    for k in range(4)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "_sim", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))

    # groupBy-collect pair generation (single pass, no self-join — the
    # signature UDF lineage is evaluated exactly once); pairs carry both
    # signatures so the hamming filter is a bit_count on the spot
    members = F.array_sort(F.collect_set(F.struct(F.col(id_col).alias("id"), F.col("_sim").alias("sim"))))
    s = F.col("_members")

    def pair_with_rest(x, i):
        rest = F.slice(s, i + 2, F.size(s))
        return F.transform(
            rest,
            lambda y: F.struct(
                x["id"].alias("id_a"), y["id"].alias("id_b"),
                F.bit_count(x["sim"].bitwiseXOR(y["sim"])).alias("hamming"),
            ),
        )

    return (
        bands.groupBy("band", "bh")
        .agg(members.alias("_members"))
        .filter(F.size("_members") >= 2)
        .select(F.explode(F.flatten(F.transform(s, pair_with_rest))).alias("_p"))
        .select("_p.id_a", "_p.id_b", "_p.hamming")
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ---------------------------------------------------------------------------
# Duplicated-substring spans (Lee et al. 2022, "Deduplicating Training
# Data Makes Language Models Better"). The reference engine has no text
# operators at all (SURVEY §2.5 — relational only); this is part of the
# training-data suite built on top of the same scan layer.
# ---------------------------------------------------------------------------


def duplicated_span_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """Per-document statistics of text spans duplicated ACROSS documents:
    every k-token window whose content appears in >= 2 distinct docs is
    a duplicated window; overlapping/adjacent duplicated windows merge
    into maximal spans (gaps-and-islands over window positions).

    Returns (id, n_tokens, n_dup_spans, dup_tokens, dup_frac) for every
    non-blank doc. Scale shape: the window explode is O(total tokens)
    rows of (id, pos, hash64) — windows travel as xxhash64 longs, never
    strings; document-frequency is one shuffle on the hash; the island
    merge is a per-doc window over the (small) duplicated subset. A
    full suffix-array dedup is O(corpus log corpus) on one machine —
    fixed-k windows are the standard distributed approximation.
    """
    toks = df.select(
        F.col(id_col),
        tx.tokens(F.lower(F.col(text_col))).alias("_t"),
    ).filter(F.size("_t") > 0)
    wins = (
        toks.filter(F.size("_t") >= k)
        .select(
            id_col,
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("_t") - k + 1),
                    lambda i: F.struct(
                        i.alias("pos"),
                        F.xxhash64(F.concat_ws(" ", F.slice(F.col("_t"), i, k))).alias("h"),
                    ),
                )
            ).alias("_w"),
        )
        .select(id_col, F.col("_w.pos").alias("pos"), F.col("_w.h").alias("h"))
    )
    dup_h = (
        wins.select(id_col, "h").distinct()
        .groupBy("h").agg(F.count(F.lit(1)).alias("_nd"))
        .filter(F.col("_nd") >= 2)
        .select("h")
    )
    dp = wins.join(dup_h, "h").select(id_col, "pos")
    w_ord = Window.partitionBy(id_col).orderBy("pos")
    isl = (
        dp.withColumn("_prev", F.lag("pos").over(w_ord))
        .withColumn(
            "_new",
            F.when(F.col("_prev").isNull() | (F.col("pos") > F.col("_prev") + k), 1).otherwise(0),
        )
        .withColumn("_island", F.sum("_new").over(w_ord))
    )
    spans = isl.groupBy(id_col, "_island").agg(
        F.min("pos").alias("_st"), (F.max("pos") + k - 1).alias("_en")
    )
    per_doc = spans.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_dup_spans"),
        F.sum(F.col("_en") - F.col("_st") + 1).alias("dup_tokens"),
    )
    return (
        toks.select(id_col, F.size("_t").cast("long").alias("n_tokens"))
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce(F.col("n_dup_spans"), F.lit(0)).cast("long").alias("n_dup_spans"),
            F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("long").alias("dup_tokens"),
            F.round(
                F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("double") / F.col("n_tokens"), 6
            ).alias("dup_frac"),
        )
    )


# ---------------------------------------------------------------------------
# Incremental (cross-corpus) dedup: new batch vs existing corpus
# ---------------------------------------------------------------------------


def minhash_dedup_against(
    new_df: DataFrame,
    old_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    new_shingled: DataFrame | None = None,
    old_shingled: DataFrame | None = None,
    max_bucket: int = 1000,
) -> DataFrame:
    """Incremental ingestion dedup: drop NEW docs that near-duplicate
    any EXISTING doc. Candidates come from a banded-MinHash equi-join
    between the two corpora's band buckets (never new↔new or old↔old —
    the existing corpus is already deduped), then exact-Jaccard verify.

    Scale shape: the old side's signatures are computed once per batch
    wave (callers pass ``old_shingled`` to amortize; in production the
    band table is a PERSISTED index appended per ingest), the join
    shuffles on (band, band_hash) so only colliding buckets meet, and
    per-bucket width is capped on the old side (``max_bucket``) to
    bound degenerate boilerplate buckets. Returns the kept NEW docs.
    """
    def _sh(df, pre):
        if pre is not None:
            return pre
        return df.select(
            F.col(id_col), word_shingles(F.col(text_col), shingle_n).alias("_sh")
        ).localCheckpoint(eager=True)

    sh_new = _sh(new_df, new_shingled)
    sh_old = _sh(old_df, old_shingled)

    def _bands(sh):
        with_hs = sh.select(
            F.col(id_col),
            F.transform(F.col("_sh"), lambda s: F.xxhash64(s)).alias("_hs"))
        sig = with_hs.select(
            id_col, minhash_signature(F.col("_hs"), num_hashes).alias("_sig"))
        rpb = num_hashes // bands
        return sig.select(
            id_col,
            F.explode(F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(F.slice(F.col("_sig"), b * rpb + 1, rpb)).alias("bh"),
                ) for b in range(bands)
            ])).alias("bb"),
        ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))

    b_new = _bands(sh_new)
    # cap degenerate buckets on the OLD side (the unbounded one)
    b_old = _bands(sh_old).withColumn(
        "_rk", F.row_number().over(
            Window.partitionBy("band", "bh").orderBy(F.col(id_col)))
    ).filter(F.col("_rk") <= max_bucket).drop("_rk")
    cand = (
        b_new.join(b_old.withColumnRenamed(id_col, "_old_id"), ["band", "bh"])
        .select(F.col(id_col).alias("id_a"), F.col("_old_id").alias("id_b"))
        .distinct()
    )
    # verify_jaccard_shingled joins both sides against ONE frame; here
    # the sides come from different corpora, so join each side manually
    j = (cand
         .join(sh_new.select(F.col(id_col).alias("id_a"), F.col("_sh").alias("_sha")), "id_a")
         .join(sh_old.select(F.col(id_col).alias("id_b"), F.col("_sh").alias("_shb")), "id_b"))
    inter = F.size(F.array_intersect(F.col("_sha"), F.col("_shb"))).cast("double")
    union = (F.size("_sha") + F.size("_shb") - inter).cast("double")
    dup_new = (
        j.select("id_a",
                 F.when(union > 0, inter / union).otherwise(F.lit(1.0)).alias("_j"))
        .filter(F.col("_j") >= threshold)
        .select(F.col("id_a").alias(id_col)).distinct()
    )
    return new_df.join(dup_new, id_col, "left_anti")


def minhash_band_sig(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """Persisted-band-index rows for a corpus slice: per doc, ``bands``
    rows (id, band, bh, sig=null) for the LSH equi-join plus ONE
    sentinel row (id, band=-1, bh=0, sig) carrying the full MinHash
    signature for candidate verification. Storing the signature (64
    longs) instead of the shingle set keeps the index tiny relative to
    the text it summarizes, and lets an ingest sink verify candidates
    by signature-agreement Jaccard WITHOUT ever re-reading the corpus
    text column — the property that makes dedup-on-ingest O(batch +
    wave) instead of O(corpus) per micro-batch at 100 TB."""
    sh = df.select(
        F.col(id_col), word_shingles(F.col(text_col), shingle_n).alias("_sh"))
    with_hs = sh.select(
        F.col(id_col),
        F.transform(F.col("_sh"), lambda s: F.xxhash64(s)).alias("_hs"))
    sig = with_hs.select(
        id_col, minhash_signature(F.col("_hs"), num_hashes).alias("_sig"))
    rpb = num_hashes // bands
    rows = sig.select(
        id_col,
        F.explode(F.array(
            F.struct(F.lit(-1).alias("band"), F.lit(0).cast("long").alias("bh"),
                     F.col("_sig").alias("sig")),
            *[F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(F.slice(F.col("_sig"), b * rpb + 1, rpb)).alias("bh"),
                F.lit(None).cast("array<long>").alias("sig"),
            ) for b in range(bands)],
        )).alias("_r"),
    )
    return rows.select(id_col, "_r.band", "_r.bh", "_r.sig")


def minhash_dedup_against_index(
    new_df: DataFrame,
    index_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    max_bucket: int = 1000,
    new_band_sig: DataFrame | None = None,
) -> DataFrame:
    """Incremental ingestion dedup against a PERSISTED band index
    (rows from :func:`minhash_band_sig`): drop NEW docs whose banded
    MinHash collides with an indexed doc AND whose signature-agreement
    Jaccard estimate (fraction of equal minhash positions — the
    standard unbiased MinHash estimator) clears ``threshold``.

    Unlike :func:`minhash_dedup_against`, the corpus side never touches
    text: candidates come from the index's band rows, verification from
    its signature sentinels. Per-batch cost is O(batch bands joined
    against the index) — the index is (id, band, bh, sig[64]) rows, a
    fixed few-hundred-bytes-per-doc summary regardless of doc size.
    Returns the kept NEW docs; pass ``new_band_sig`` to reuse the
    batch's own band/sig rows (e.g. for a follow-up index append)."""
    if new_band_sig is None:
        new_band_sig = minhash_band_sig(
            new_df, id_col, text_col, num_hashes, bands, shingle_n)
    b_new = new_band_sig.filter(F.col("band") >= 0).select(id_col, "band", "bh")
    s_new = (new_band_sig.filter(F.col("band") == -1)
             .select(F.col(id_col).alias("id_a"), F.col("sig").alias("_siga")))
    b_old = (index_df.filter(F.col("band") >= 0)
             .select(F.col(id_col).alias("_old_id"), "band", "bh")
             .withColumn("_rk", F.row_number().over(
                 Window.partitionBy("band", "bh").orderBy(F.col("_old_id"))))
             .filter(F.col("_rk") <= max_bucket).drop("_rk"))
    s_old = (index_df.filter(F.col("band") == -1)
             .select(F.col(id_col).alias("id_b"), F.col("sig").alias("_sigb")))
    cand = (b_new.join(b_old, ["band", "bh"])
            .select(F.col(id_col).alias("id_a"), F.col("_old_id").alias("id_b"))
            .distinct())
    j = cand.join(s_new, "id_a").join(s_old, "id_b")
    agree = F.size(F.filter(
        F.zip_with(F.col("_siga"), F.col("_sigb"),
                   lambda a, b: F.when(a == b, F.lit(1))),
        lambda x: x.isNotNull()))
    dup_new = (
        j.select("id_a", (agree.cast("double") / F.lit(num_hashes)).alias("_j"))
        .filter(F.col("_j") >= threshold)
        .select(F.col("id_a").alias(id_col)).distinct())
    return new_df.join(dup_new, id_col, "left_anti")


def remove_duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """Cut every cross-document duplicated k-token span from every doc
    (the REMOVAL pass behind duplicated_span_stats: content appearing in
    >= 2 docs is template/boilerplate and is dropped everywhere). Spans
    are the same maximal merged intervals the stats operator reports;
    remaining tokens re-join in order. Scale shape identical to the
    stats pass plus one groupBy collecting each doc's (small) span list
    back to its row — tokens never shuffle, only positions do."""
    toks = df.select(
        F.col(id_col), tx.tokens(F.lower(F.col(text_col))).alias("_t")
    ).filter(F.size("_t") > 0)
    wins = (
        toks.filter(F.size("_t") >= k)
        .select(
            id_col,
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("_t") - k + 1),
                    lambda i: F.struct(
                        i.alias("pos"),
                        F.xxhash64(F.concat_ws(" ", F.slice(F.col("_t"), i, k))).alias("h"),
                    ),
                )
            ).alias("_w"),
        )
        .select(id_col, F.col("_w.pos").alias("pos"), F.col("_w.h").alias("h"))
    )
    dup_h = (
        wins.select(id_col, "h").distinct()
        .groupBy("h").agg(F.count(F.lit(1)).alias("_nd"))
        .filter(F.col("_nd") >= 2).select("h")
    )
    dp = wins.join(dup_h, "h").select(id_col, "pos")
    w_ord = Window.partitionBy(id_col).orderBy("pos")
    spans = (
        dp.withColumn("_prev", F.lag("pos").over(w_ord))
        .withColumn("_new", F.when(
            F.col("_prev").isNull() | (F.col("pos") > F.col("_prev") + k), 1
        ).otherwise(0))
        .withColumn("_island", F.sum("_new").over(w_ord))
        .groupBy(id_col, "_island")
        .agg(F.min("pos").alias("st"), (F.max("pos") + k - 1).alias("en"))
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("st", "en"))).alias("_spans"))
    )
    covered = lambda i: F.exists(
        F.col("_spans"), lambda s: (i >= s["st"]) & (i <= s["en"]))
    kept = F.filter(
        F.zip_with(
            F.col("_t"),
            F.sequence(F.lit(1), F.size("_t")),
            lambda w, i: F.when(~covered(i), w),
        ),
        lambda w: w.isNotNull(),
    )
    return (
        toks.join(spans, id_col, "left")
        .withColumn("_spans", F.coalesce(
            F.col("_spans"),
            F.array().cast("array<struct<st:int,en:int>>")))
        .select(
            id_col,
            F.size("_t").cast("long").alias("n_tokens"),
            F.size(kept).cast("long").alias("n_kept_tokens"),
            F.md5(F.concat_ws(" ", kept)).alias("cleaned_fp"),
        )
    )


def ngram_overlap_frac(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    threshold: float = 0.05,
) -> DataFrame:
    """Per-document n-gram overlap against a held-out eval set — the
    GPT-3/Llama-style decontamination SCORE (the boolean
    ``decontaminate`` drops on a shared-shingle count; training-data
    audits want the graded overlap fraction): for each corpus doc,
    |distinct n-grams ∩ eval n-grams| / |distinct n-grams|, flagged at
    ``threshold``. Docs shorter than n tokens score over their single
    whole-text gram.

    Scale shape: n-grams travel as xxhash64 longs (never strings), the
    eval side collapses to DISTINCT hashes before the join (eval sets
    are ≪ corpus; AQE broadcasts it when it fits), and the join carries
    only distinct (doc, hash) pairs."""
    def _grams(df):
        toks = df.select(
            F.col(id_col), tx.tokens(F.lower(F.col(text_col))).alias("_t")
        ).filter(F.size("_t") > 0)
        return toks.select(
            id_col,
            F.explode(F.when(
                F.size("_t") >= n,
                F.array_distinct(F.transform(
                    F.sequence(F.lit(1), F.size("_t") - n + 1),
                    lambda i: F.xxhash64(F.concat_ws(" ", F.slice(F.col("_t"), i, n)))))
            ).otherwise(
                F.array(F.xxhash64(F.concat_ws(" ", F.col("_t"))))
            )).alias("_h"),
        )
    eval_h = _grams(eval_df).select("_h").distinct()
    doc_h = _grams(corpus)
    per_doc = (
        doc_h.join(eval_h.withColumn("_hit", F.lit(1)), "_h", "left")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_ngrams"),
             F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("long").alias("n_overlap"))
    )
    return per_doc.select(
        id_col, "n_ngrams", "n_overlap",
        F.round(F.col("n_overlap").cast("double") / F.col("n_ngrams"), 6)
        .alias("overlap_frac"),
        (F.col("n_overlap").cast("double") / F.col("n_ngrams")
         > F.lit(threshold)).alias("contaminated"),
    )


def remove_duplicated_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """C4-style line-level exact dedup (Raffel et al. 2020 §2.2's
    discard-all-but-one rule, at line granularity): any line occurring
    more than once ACROSS THE CORPUS keeps only its first occurrence —
    smallest (doc_id, position) — and every other copy is cut, with
    documents reassembled around the gaps. The boilerplate-killer pass
    web-scale corpora run before training.

    Output: (id_col, n_lines, n_kept, cleaned) — the reassembled text.

    Scale shape: line occurrences shuffle as (xxhash64, id, pos) longs,
    never strings — first-occurrence selection is a hash-keyed min-
    struct agg, and reassembly re-derives lines from the document text
    and keeps positions via an array filter, so no line string ever
    crosses a shuffle (same xxhash64-collision trade as the
    duplicated-substring op above). Two long-keyed shuffles total.
    """
    toks = F.split(F.col(text_col), sep)
    marks = df.select(
        F.col(id_col),
        F.posexplode(toks).alias("_pos", "_line"),
    ).select(id_col, "_pos", F.xxhash64("_line").alias("_h"))
    firsts = marks.groupBy("_h").agg(
        F.min(F.struct(F.col(id_col).alias("_i"), F.col("_pos").alias("_p"))
              ).alias("_f"))
    keep = (
        marks.join(firsts, "_h")
        .filter((F.col(id_col) == F.col("_f._i"))
                & (F.col("_pos") == F.col("_f._p")))
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("_pos")).alias("_keep"))
    )
    kept = F.coalesce(F.col("_keep"), F.array().cast("array<int>"))
    return (
        df.join(keep, id_col, "left")
        .select(
            F.col(id_col),
            F.size(toks).cast("long").alias("n_lines"),
            F.size(kept).cast("long").alias("n_kept"),
            F.array_join(
                F.filter(toks, lambda x, i: F.array_contains(kept, i)),
                sep).alias("cleaned"),
        )
    )
