"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k — the exact baseline: broadcast the query
  set, JVM-side dot products via zip_with/aggregate, per-query top-k by
  window. Scales linearly in corpus size with zero Python in the loop.
* LSH-bucketed ANN (random hyperplanes) — the scale path: sign-bit
  signatures put near vectors in the same buckets, so the join touches
  a small candidate set instead of the full corpus. Probing multiple
  band tables recovers recall.
* IVF-style variant — coarse k-means-ish centroids picked
  deterministically, each vector assigned to nearest centroid; queries
  probe the nearest `nprobe` cells only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i in codegen: zip_with + aggregate (no UDF)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v)
    )


def cosine(a: Column, b: Column) -> Column:
    d = norm(a) * norm(b)
    return F.when(d > 0, dot(a, b) / d).otherwise(F.lit(0.0))


def _as_double(c: Column) -> Column:
    return c.cast("array<double>")


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k: broadcast queries × corpus scan.

    Output: (query_id, neighbor_id, sim, rank). Rank ties break on
    neighbor id for determinism. The corpus side is never shuffled —
    one scan, one window over (query, sim) which AQE splits by query.
    """
    qid = query_id_col or id_col
    q = queries.select(
        F.col(qid).alias("query_id"), _as_double(F.col(vec_col)).alias("_qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("_cv")
    )
    joined = c.crossJoin(F.broadcast(q))
    if exclude_self:
        joined = joined.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = joined.select(
        "query_id", "neighbor_id", cosine(F.col("_qv"), F.col("_cv")).alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def hyperplane_signature(vec: Column, dim: int, num_planes: int = 16, seed: int = 42) -> Column:
    """Sign-bit signature against `num_planes` pseudo-random hyperplanes.

    Plane coefficients are derived deterministically from
    xxhash64(seed, plane, dim-index) — reproducible across runs and
    executors with no side data to ship."""
    def coef_for_plane(p: int):
        # coefficient in [-1, 1): hash → uniform (closure-bound p; a
        # default-arg lambda would become PySpark's (element, index) form)
        return lambda i: (
            F.pmod(F.xxhash64(F.lit(seed), F.lit(p), i), F.lit(2000003)).cast("double")
            / 1000001.5
            - 1.0
        )

    bits = []
    for p in range(num_planes):
        idx = F.sequence(F.lit(0), F.lit(dim - 1))
        coef = F.transform(idx, coef_for_plane(p))
        proj = F.aggregate(
            F.zip_with(vec, coef, lambda x, c: x * c), F.lit(0.0), lambda a, v: a + v
        )
        bits.append(F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig.bitwiseOR(b)
    return sig


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    num_planes: int = 16,
    num_tables: int = 4,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate cosine top-k: hyperplane-LSH bucket join.

    Each of ``num_tables`` signature tables hashes vectors to a bucket;
    query meets only its bucket's members (union over tables), then
    exact cosine + window top-k on the candidate set. Recall grows with
    num_tables; cost stays ~O(bucket size × queries)."""
    c = corpus.select(F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("_cv"))
    q = queries.select(F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("_qv"))

    cand = None
    for t in range(num_tables):
        cs = c.withColumn("_sig", hyperplane_signature(F.col("_cv"), dim, num_planes, seed=42 + t))
        qs = q.withColumn("_sig", hyperplane_signature(F.col("_qv"), dim, num_planes, seed=42 + t))
        j = cs.join(F.broadcast(qs), on="_sig").select("query_id", "_qv", "neighbor_id", "_cv")
        cand = j if cand is None else cand.unionByName(j)
    cand = cand.dropDuplicates(["query_id", "neighbor_id"])
    if exclude_self:
        cand = cand.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = cand.select(
        "query_id", "neighbor_id", cosine(F.col("_qv"), F.col("_cv")).alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def ivf_assign(df: DataFrame, centroids: DataFrame, id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """Assign each vector to its nearest centroid (IVF cell). Centroids
    are broadcast; assignment is an argmin over a small array — at
    100 TB this is the scan-side partitioner that makes ANN queries
    touch ~1/nlist of the data."""
    cents = F.broadcast(centroids.select(
        F.col("centroid_id"), _as_double(F.col(vec_col)).alias("_cent")
    ))
    joined = df.select(F.col(id_col), _as_double(F.col(vec_col)).alias("_v")).crossJoin(cents)
    d = cosine(F.col("_v"), F.col("_cent"))
    w = Window.partitionBy(id_col).orderBy(F.col("_sim").desc(), F.col("centroid_id"))
    return (
        joined.select(id_col, "centroid_id", d.alias("_sim"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, "centroid_id")
    )


def embedding_cosine_dedup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    dim: int = 64,
    num_planes: int = 12,
    num_tables: int = 6,
) -> DataFrame:
    """Embedding near-dup pairs (cosine >= threshold), LSH-bucketed so
    the pair join is bucket-local; returns (id_a, id_b, sim)."""
    v = df.select(F.col(id_col), _as_double(F.col(vec_col)).alias("_v"))
    cand = None
    for t in range(num_tables):
        s = v.withColumn("_sig", hyperplane_signature(F.col("_v"), dim, num_planes, seed=7 + t))
        a, b = s.alias("a"), s.alias("b")
        j = (
            a.join(b, on="_sig")
            .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .select(
                F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"a._v").alias("_va"),
                F.col(f"b.{id_col}").alias("id_b"),
                F.col(f"b._v").alias("_vb"),
            )
        )
        cand = j if cand is None else cand.unionByName(j)
    cand = cand.dropDuplicates(["id_a", "id_b"])
    return cand.select(
        "id_a", "id_b", cosine(F.col("_va"), F.col("_vb")).alias("sim")
    ).filter(F.col("sim") >= threshold)
