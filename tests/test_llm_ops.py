"""Quality/recall checks for the approximate dedup & ANN operators —
the oracle-parity harness only pins the exact twins, so these pin the
approximate paths' usefulness: candidate recall, hash invariants, and
the broadcast-matmul pair kernel's equivalence to the Column cosine.

Recall floors are set well under measured values on the synthetic
corpus (near-random embeddings: ANN LSH ~0.24, IVF ~0.64; minhash
candidate recall 1.0 at j>=0.5) so they fail on regressions, not
noise."""

import pytest
from pyspark.sql import functions as F

from starlake_spark.functions import dedup as dd, similarity as sim
from starlake_spark.functions import text as tx
from starlake_spark.queries import llm_suite as L


def _pairs(df):
    return {(r["id_a"], r["id_b"]) for r in df.collect()}


def test_ann_lsh_and_ivf_recall(spark, sf_dir):
    """Raw-operator recall vs brute force (the query entries themselves
    now emit contract booleans, so this drives the operators directly)."""
    e = L.ld(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    kw = dict(k=L.ANN_K, id_col="vec_id", vec_col="embedding")
    exact = {(r[0], r[1]) for r in
             sim.brute_force_topk(e, q, **kw).select("query_id", "neighbor_id").collect()}
    lsh = {(r[0], r[1]) for r in
           sim.lsh_topk(e, q, dim=64, num_planes=10, num_tables=6, **kw)
           .select("query_id", "neighbor_id").collect()}
    cents = sim.kmeans_centroids(e, nlist=max(4, e.count() // 50),
                                 id_col="vec_id", vec_col="embedding")
    ivf = {(r[0], r[1]) for r in
           sim.ivf_topk(e, q, cents, nprobe=4, **kw)
           .select("query_id", "neighbor_id").collect()}
    assert len(exact) == 10 * L.ANN_K
    assert len(exact & lsh) / len(exact) >= 0.15
    assert len(exact & ivf) / len(exact) >= 0.50

    # the contract entries themselves must come back all-TRUE
    for entry in (L.ann_lsh_topk, L.ann_ivf_topk):
        rows = entry(spark, sf_dir).collect()
        assert len(rows) == 10
        assert all(r["top1_is_planted"] and r["recall_ok"] for r in rows)


def test_minhash_candidates_cover_exact_pairs(spark, sf_dir):
    d = L.ld(spark, sf_dir, "documents")
    exact = _pairs(dd.ngram_jaccard_pairs(d, threshold=0.5, shingle_n=3)
                   .select("id_a", "id_b"))
    cand = _pairs(dd.minhash_lsh_candidates(d, num_hashes=64, bands=16, shingle_n=3))
    assert exact, "corpus should contain j>=0.5 near-dup pairs"
    assert len(exact & cand) / len(exact) >= 0.9


def test_minhash_dedup_drops_only_verified_dupes(spark, sf_dir):
    d = L.ld(spark, sf_dir, "documents")
    kept = dd.minhash_dedup(d, threshold=0.5, num_hashes=64, bands=16, shingle_n=3)
    n, k = d.count(), kept.count()
    assert 0 < k <= n
    # every dropped doc really does have a >=0.5-jaccard twin with a
    # smaller id among the originals
    dropped = d.join(kept.select("doc_id"), "doc_id", "left_anti")
    exact = dd.ngram_jaccard_pairs(d, threshold=0.5, shingle_n=3)
    unexplained = dropped.join(
        exact.select(F.col("id_b").alias("doc_id")), "doc_id", "left_semi"
    ).count()
    assert unexplained == dropped.count()


def test_simhash_planted_near_dupes(spark):
    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark forest tonight")
    rows = [
        (1, base),
        (2, base),                              # exact dup
        (3, base.replace("quick", "swift")),    # one-word change
        (4, "completely different text about database engines and "
            "distributed query processing at large scale"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = {r["doc_id"]: r["s"] for r in
            df.select("doc_id", dd.simhash64(F.col("text"), 2).alias("s")).collect()}
    assert sigs[1] == sigs[2]  # identical text -> identical simhash
    pairs = _pairs(dd.simhash_near_dupes(df, "doc_id", "text",
                                         max_hamming=16, shingle_n=2))
    assert (1, 2) in pairs
    assert (1, 3) in pairs
    assert (1, 4) not in pairs and (2, 4) not in pairs and (3, 4) not in pairs


def test_cosine_pairs_broadcast_matches_column_cosine(spark, sf_dir):
    e = L.ld(spark, sf_dir, "embeddings")
    a = e.filter(F.col("vec_id") % 7 == 0).select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").cast("array<double>").alias("_va"))
    b = e.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").cast("array<double>").alias("_vb"))
    th = 0.35
    fast = _pairs(sim.cosine_pairs_broadcast(a, b, th))
    slow = _pairs(
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(sim.cosine(F.col("_va"), F.col("_vb")) >= th)
        .select("id_a", "id_b"))
    assert fast == slow and fast


def test_cosine_pairs_broadcast_zero_norm_and_modes(spark):
    rows = [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 0.0]), (4, [-1.0, 0.0])]
    df = spark.createDataFrame(rows, "vid long, v array<double>")
    a = df.select(F.col("vid").alias("id_a"), F.col("v").alias("_va"))
    b = df.select(F.col("vid").alias("id_b"), F.col("v").alias("_vb"))
    # zero-norm vector scores 0.0 (never passes a positive threshold)
    assert _pairs(sim.cosine_pairs_broadcast(a, b, 0.99)) == {(1, 2)}
    # require_lt=False: both directions, self excluded
    both = _pairs(sim.cosine_pairs_broadcast(a, b, 0.99, require_lt=False))
    assert both == {(1, 2), (2, 1)}


def test_decontaminate_drops_overlapping_docs(spark):
    import pandas as pd
    from starlake_spark.functions import dedup as dd

    bench = spark.createDataFrame(pd.DataFrame({
        "doc_id": [100],
        "text": ["the quick brown fox jumps over the lazy dog tonight"],
    }))
    corpus = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [
            "the quick brown fox jumps over the lazy dog tonight",  # exact dup
            "a completely different sentence about spark engines here",
            "quick brown fox jumps over something else entirely now",  # partial
        ],
    }))
    kept = dd.decontaminate(corpus, bench, "doc_id", "text",
                            shingle_n=4, min_shared=2)
    ids = sorted(r.doc_id for r in kept.collect())
    assert 1 not in ids          # exact duplicate dropped
    assert 2 in ids              # disjoint kept
    # doc 3 shares 'quick brown fox jumps' + 'brown fox jumps over' -> dropped
    assert ids == [2]
    # contamination side must broadcast (tiny benchmark vs corpus)
    plan = dd.decontaminate(corpus, bench, "doc_id", "text")._jdf \
        .queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_ivf_index_build_and_query(spark, tmp_path):
    from starlake_spark.functions import similarity as sim
    from starlake_spark.table import StarTable

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    t = sim.build_ivf_index(spark, e, str(tmp_path / "ivf"), nlist=8)
    # centroid model state persisted with the table
    t2 = StarTable.for_path(spark, str(tmp_path / "ivf"))
    q = e.filter(F.col("vec_id") < 10)
    got = sim.ivf_index_topk(spark, t2, q, k=5, nprobe=3)
    rows = got.collect()
    assert {r.query_id for r in rows} == set(range(10))
    assert all(1 <= r.rank <= 5 for r in rows)

    # probing must partition-prune: nprobe=1 reads fewer files than all
    one = sim.ivf_index_topk(spark, t2, q.limit(1), k=5, nprobe=1)
    n_all = len(t2.store.snapshot().all_files())
    # reconstruct the pruned read the same way the query path does
    cand_files = t2.to_df(partition_filter="centroid_id IN (0)").inputFiles()
    assert len(cand_files) < n_all
    assert one.count() <= 5

    # recall floor vs brute force
    exact = sim.brute_force_topk(e, q, k=5)
    g = {(r.query_id, r.neighbor_id) for r in got.collect()}
    x = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    recall = len(g & x) / len(x)
    assert recall >= 0.5, recall

    with pytest.raises(ValueError, match="not an IVF index"):
        sim.ivf_index_topk(spark, t_not_index(spark, tmp_path), q)


def t_not_index(spark, tmp_path):
    from starlake_spark.table import create_table
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    return create_table(spark, o, str(tmp_path / "plain"))


def test_ivf_index_sync_follows_source(spark, tmp_path):
    """CDC-maintained index: after source DML (delete the known top
    neighbor, re-point a vector at the query, insert a fresh twin) ONE
    sync makes the probe reflect the source's current state — deleted
    vectors stop ranking, a MOVED vector is found in its NEW cell (and
    only once), and the sync is O(net keys) + idempotent."""
    import numpy as np

    from starlake_spark.functions import similarity as sim
    from starlake_spark.table import StarTable, create_table

    rng = np.random.RandomState(5)
    vecs = [(i, [float(x) for x in rng.standard_normal(32)])
            for i in range(300)]
    src = create_table(
        spark, spark.createDataFrame(vecs, "vec_id long, embedding "
                                           "array<double>"),
        str(tmp_path / "src"), hash_partitions=["vec_id"],
        hash_bucket_num=2)
    idx = sim.build_ivf_index(spark, src.to_df(), str(tmp_path / "ivf"),
                              nlist=6, source=src)
    assert (idx.info.configuration or {}).get("ivf.source") \
        == src.store.table_path

    q = src.to_df().filter("vec_id = 0")
    top1 = sim.ivf_index_topk(spark, idx, q, k=3, nprobe=6) \
              .filter("rank = 1").collect()[0]["neighbor_id"]

    # source DML: kill the current best, turn vec 250 into an exact
    # twin of the query (likely a cell MOVE), insert a fresh twin 999
    qvec = q.collect()[0]["embedding"]
    src.delete(f"vec_id = {top1}", use_delta=True)
    src.upsert(spark.createDataFrame([(250, qvec), (999, qvec)],
                                     "vec_id long, embedding array<double>"))

    _, st = sim.ivf_index_sync(spark, idx)
    assert st["mode"] == "incremental"
    assert st["removed"] >= 2 and st["upserted"] == 2  # 250 pre + top1

    hits = sim.ivf_index_topk(spark, idx, q, k=4, nprobe=6).collect()
    got = [r["neighbor_id"] for r in sorted(hits, key=lambda r: r["rank"])]
    assert top1 not in got, f"deleted vector still ranks: {got}"
    assert set(got[:2]) == {250, 999}, got  # the two exact twins lead
    assert len(got) == len(set(got)), f"moved vector duplicated: {got}"

    # idempotent: repeat sync is a noop; index equals a fresh rebuild's
    # row set
    _, st2 = sim.ivf_index_sync(spark, idx)
    assert st2["mode"] == "noop"
    assert sorted(r["vec_id"] for r in idx.to_df().collect()) == \
        sorted(r["vec_id"] for r in src.to_df().collect())

    # legacy (append-only) layouts refuse with a clear message
    with pytest.raises(ValueError, match="not an IVF index"):
        sim.ivf_index_sync(spark, t_not_index(spark, tmp_path))

    # replaying an overlapping window is idempotent (the too-early-
    # watermark contract the build relies on): rewind and re-sync
    idx.set_properties({"ivf.synced_version": "1"})
    before = sorted(r["vec_id"] for r in idx.to_df().collect())
    _, st3 = sim.ivf_index_sync(spark, idx)
    assert st3["mode"] == "incremental"
    assert sorted(r["vec_id"] for r in idx.to_df().collect()) == before


def test_ivf_index_sync_adoption_persists(spark, tmp_path):
    """Adopting a source (sync with source= on an unbound index) must
    PERSIST the binding: the next bare sync resolves it, and a wrong
    source refuses instead of silently applying a foreign change feed."""
    import numpy as np

    from starlake_spark.functions import similarity as sim
    from starlake_spark.table import create_table

    rng = np.random.RandomState(23)
    vecs = [(i, [float(x) for x in rng.standard_normal(16)])
            for i in range(60)]
    vdf = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    src = create_table(spark, vdf, str(tmp_path / "src"),
                       hash_partitions=["vec_id"], hash_bucket_num=2)
    other = create_table(spark, vdf, str(tmp_path / "other"),
                         hash_partitions=["vec_id"], hash_bucket_num=2)
    idx = sim.build_ivf_index(spark, vdf, str(tmp_path / "ivf"), nlist=4)
    with pytest.raises(ValueError, match="records no ivf.source"):
        sim.ivf_index_sync(spark, idx)
    _, st = sim.ivf_index_sync(spark, idx, source=src)  # adopt
    assert (idx.info.configuration or {}).get("ivf.source") \
        == src.store.table_path
    src.delete("vec_id % 7 = 0", use_delta=True)
    _, st2 = sim.ivf_index_sync(spark, idx)  # bare sync resolves binding
    assert st2["mode"] == "incremental" and st2["removed"] > 0
    with pytest.raises(ValueError, match="follows"):
        sim.ivf_index_sync(spark, idx, source=other)


def test_ivfpq_index_sync_follows_source(spark, tmp_path):
    """CDC-maintained IVF-PQ codes table: after a source delete + twin
    upserts, one sync makes the ADC probe rank the post-build twin #1
    and never return the deleted vector (the twin encodes to the
    query's own code word — ADC global minimum by construction)."""
    import numpy as np

    from starlake_spark.functions import similarity as sim
    from starlake_spark.table import create_table

    rng = np.random.RandomState(17)
    vecs = [(i, [float(x) for x in rng.standard_normal(32)])
            for i in range(300)]
    src = create_table(
        spark, spark.createDataFrame(vecs, "vec_id long, embedding "
                                           "array<double>"),
        str(tmp_path / "src"), hash_partitions=["vec_id"],
        hash_bucket_num=2)
    idx = sim.build_ivfpq_index(spark, src.to_df(),
                                str(tmp_path / "ivfpq"), nlist=4,
                                m=8, ksub=16, source=src)
    q = src.to_df().filter("vec_id = 7")
    top1 = sim.ivfpq_topk(spark, idx, q, k=2, nprobe=4) \
              .filter("rank = 1").collect()[0]["neighbor_id"]
    qvec = q.collect()[0]["embedding"]
    src.delete(f"vec_id = {top1}", use_delta=True)
    src.upsert(spark.createDataFrame([(888, qvec)],
                                     "vec_id long, embedding array<double>"))
    _, st = sim.ivfpq_index_sync(spark, idx)
    assert st["mode"] == "incremental" and st["removed"] >= 1 \
        and st["upserted"] == 1, st
    hits = sim.ivfpq_topk(spark, idx, q, k=3, nprobe=4).collect()
    got = [r["neighbor_id"] for r in sorted(hits, key=lambda r: r["rank"])]
    assert got[0] == 888 and top1 not in got, got
    _, st2 = sim.ivfpq_index_sync(spark, idx)
    assert st2["mode"] == "noop"


def test_chunk_sliding_covers_all_tokens(spark):
    from starlake_spark.functions import text as tx

    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))),  # 10 tokens, w=4 s=3
         (2, "a b"),                                  # shorter than window
         (3, "   "),                                  # blank: no chunks
         (4, None)],
        "doc_id long, text string")
    out = tx.chunk_sliding(df, "doc_id", "text", window=4, stride=3)
    rows = {(r["doc_id"], r["chunk_no"]): r["chunk_text"] for r in out.collect()}
    # doc 1: starts 0,3,6 — last chunk covers token 9
    assert rows[(1, 0)] == "t0 t1 t2 t3"
    assert rows[(1, 1)] == "t3 t4 t5 t6"
    assert rows[(1, 2)] == "t6 t7 t8 t9"
    assert rows[(2, 0)] == "a b"
    assert not any(d in (3, 4) for d, _ in rows)
    # every token of doc 1 appears in some chunk
    covered = set(" ".join(v for (d, _), v in rows.items() if d == 1).split())
    assert covered == {f"t{i}" for i in range(10)}


def test_pii_scrub_redacts_and_counts(spark):
    from starlake_spark.functions import text as tx

    df = spark.createDataFrame(
        [(1, "mail a.b+c@x-corp.io or call +1 555-123-4567; host 192.168.0.1 ok")],
        "id long, text string")
    counts = tx.pii_counts(F.col("text"))
    row = df.select(
        tx.pii_scrub(F.col("text")).alias("s"),
        counts["email"].alias("ne"), counts["phone"].alias("np"),
        counts["ipv4"].alias("ni")).collect()[0]
    assert "<EMAIL>" in row["s"] and "<PHONE>" in row["s"] and "<IP>" in row["s"]
    assert "@" not in row["s"] and "192.168" not in row["s"]
    assert (row["ne"], row["np"], row["ni"]) == (1, 1, 1)


def test_mixture_sample_hits_target_shares(spark, sf_dir):
    from starlake_spark.functions import curation as cu

    d = L.ld(spark, sf_dir, "documents")
    weights = {"src0": 0.4, "src1": 0.4, "src2": 0.2}
    out = cu.mixture_sample(d, "source", weights, "doc_id")
    got = dict(out.groupBy("source").count().collect())
    assert set(got) <= set(weights)
    n = sum(got.values())
    # binding groups (0.4 shares on equal-sized sources) stay complete;
    # the 0.2 group halves, within Bernoulli noise on a small fixture
    assert got["src2"] < got["src0"]
    share2 = got["src2"] / n
    assert 0.08 <= share2 <= 0.32
    # deterministic: second run identical
    again = dict(cu.mixture_sample(d, "source", weights, "doc_id")
                 .groupBy("source").count().collect())
    assert again == got


def test_quantize_int8_roundtrip_error_bounded(spark, sf_dir):
    from starlake_spark.functions import similarity as sim

    e = L.ld(spark, sf_dir, "embeddings").limit(100)
    qs = sim.quantize_int8(F.col("embedding"))
    deq = sim.dequantize(F.col("_q"))
    err = F.zip_with(F.col("embedding").cast("array<double>"), deq,
                     lambda x, y: F.abs(x - y))
    bad = (e.select(F.col("embedding"), qs.alias("_q"))
           .select((F.array_max(err) > F.col("_q")["scale"] * 0.51).alias("bad"),
                   F.array_max(F.transform(F.col("_q")["q"], F.abs)).alias("mx"))
           .filter(F.col("bad") | (F.col("mx") > 127)))
    assert bad.count() == 0


def test_semantic_dedup_keeps_one_per_identical_group(spark):
    import random

    random.seed(7)
    rows = []
    # 30 base vectors, ids 0..29; ids 0..9 get identical twins at +100
    for i in range(30):
        v = [random.gauss(0, 1) for _ in range(8)]
        rows.append((i, v))
        if i < 10:
            rows.append((i + 100, list(v)))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kept = sim.semantic_dedup(df, "vec_id", "embedding",
                              threshold=0.999, nlist=4, iters=1)
    kept_ids = {r["vec_id"] for r in kept.collect()}
    # every twin (larger id) dropped, every original kept
    assert all(i in kept_ids for i in range(30))
    assert all(i + 100 not in kept_ids for i in range(10))


def test_gopher_filter_rules_fire_individually(spark):
    docs = [
        (1, "the cat sat on the mat and it is in that spot now really " * 3),  # passes
        (2, "word " * 5),                        # too short + no stopwords
        (3, "the " + "spam " * 40),              # repetition gate
        (4, "the quick 12345 67890 " + " ".join("9" * 5 for _ in range(20))),  # alpha gate
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    from starlake_spark.functions import curation as cu

    out = {r["doc_id"]: r.asDict() for r in
           cu.gopher_filter_flags(df, "doc_id", "text").collect()}
    assert out[1]["keep"]
    assert not out[2]["ok_min_tokens"]
    assert not out[3]["ok_repetition"] and not out[3]["keep"]
    assert not out[4]["ok_alpha"]


def test_tfidf_rare_term_outranks_common(spark):
    docs = [(1, "alpha beta gamma"), (2, "alpha beta delta"),
            (3, "alpha epsilon zeta")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    from starlake_spark.functions import text as tx

    out = tx.tfidf_topk(df, "doc_id", "text", k=1).collect()
    top = {r["doc_id"]: r["term"] for r in out}
    # 'alpha' is in every doc → lowest idf; each doc's unique term wins
    assert top[1] == "gamma"
    assert top[2] == "delta"
    assert top[3] == "epsilon" or top[3] == "zeta"


def test_bloom_filter_no_false_negatives(spark):
    import numpy as np
    from pyspark.sql import functions as F

    members = spark.range(0, 5000).select(F.xxhash64("id").alias("h"))
    bits = dd.build_bloom(members, "h", m_bits=1 << 18, k=5)
    assert isinstance(bits, np.ndarray)
    # every member must probe true (no false negatives — the theorem)
    probe = members.filter(
        ~dd.bloom_contains(F.col("h"), bits, 1 << 18, 5, spark))
    assert probe.count() == 0
    # non-members mostly probe false (fp rate sane at this sizing)
    others = spark.range(100000, 110000).select(F.xxhash64("id").alias("h"))
    fp = others.filter(
        dd.bloom_contains(F.col("h"), bits, 1 << 18, 5, spark)).count()
    assert fp < 1000, fp  # ~0.9% expected at n=5000, m=2^18, k=5


def test_bloom_decontaminate_superset_of_exact(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cont = d.filter(F.col("doc_id") % 17 == 0)
    corpus = d.filter(F.col("doc_id") % 17 != 0)
    exact = {r["doc_id"] for r in
             dd.decontaminate(corpus, cont, "doc_id", "text", 4, 2)
             .select("doc_id").collect()}
    bloom = {r["doc_id"] for r in
             dd.bloom_decontaminate(corpus, cont, "doc_id", "text", 4, 2)
             .select("doc_id").collect()}
    # bloom keeps a SUBSET of the exact keeps (fp can only drop extra)
    assert bloom <= exact


def test_duplicated_span_stats_merges_overlaps(spark):
    """Two docs sharing one 10-token run → each doc reports exactly ONE
    merged span of 10 tokens (3 overlapping k=8 windows collapse), and a
    doc with no cross-doc k-run reports zeros."""
    shared = " ".join(f"s{i}" for i in range(10))
    rows = [
        (1, shared + " xa xb xc"),
        (2, "ya yb " + shared),
        (3, "unique words only here nothing shared at all beyond runs"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           dd.duplicated_span_stats(df, "doc_id", "text", k=8).collect()}
    for i in (1, 2):
        assert out[i]["n_dup_spans"] == 1
        assert out[i]["dup_tokens"] == 10
    assert out[3]["n_dup_spans"] == 0 and out[3]["dup_tokens"] == 0
    assert out[1]["dup_frac"] == round(10 / 13, 6)


def test_duplicated_span_stats_distinct_spans_stay_split(spark):
    """Two shared runs separated by a unique gap → two spans, not one."""
    run_a = " ".join(f"a{i}" for i in range(8))
    run_b = " ".join(f"b{i}" for i in range(8))
    rows = [
        (1, run_a + " gap1 gap2 gap3 gap4 gap5 gap6 gap7 gap8 gap9 " + run_b),
        (2, run_a + " z1 z2 " + run_b + " tail1 tail2"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           dd.duplicated_span_stats(df, "doc_id", "text", k=8).collect()}
    assert out[1]["n_dup_spans"] == 2 and out[1]["dup_tokens"] == 16


def test_unigram_perplexity_uniform_corpus(spark):
    """On a corpus where every word is equally frequent the unigram LM
    is uniform → every doc's perplexity equals the vocabulary size."""
    from starlake_spark.functions import curation as cu
    rows = [(1, "aa bb cc dd"), (2, "dd cc bb aa"), (3, "aa bb cc dd")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = cu.unigram_perplexity(df, "doc_id", "text").collect()
    assert len(out) == 3
    for r in out:
        assert r["n_tokens"] == 4
        assert abs(r["ppl"] - 4.0) < 1e-6


def test_minhash_dedup_against_drops_only_cross_dupes(spark):
    """Cross-corpus dedup: a new doc identical to an existing doc drops;
    new docs that only duplicate EACH OTHER both survive (the operator
    never pairs new↔new); unrelated docs survive."""
    old = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta"),
         (2, "one two three four five six seven eight")],
        ["doc_id", "text"])
    new = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta eta theta"),  # dup of 1
         (11, "totally different words nothing shared here at all"),
         (12, "twin content repeated inside the new batch only"),
         (13, "twin content repeated inside the new batch only")],
        ["doc_id", "text"])
    kept = {r["doc_id"] for r in
            dd.minhash_dedup_against(new, old, threshold=0.5,
                                     num_hashes=64, bands=16).collect()}
    assert kept == {11, 12, 13}


def test_ivf_index_append_finds_new_vectors(spark, sf_dir, tmp_path):
    """Incremental index maintenance: vectors appended after the build
    are probe-visible; a planted twin of an appended vector ranks 1."""
    from starlake_spark.functions import similarity as sim

    e = L.ld(spark, sf_dir, "embeddings")
    base = e.filter(F.col("vec_id") < 400)
    idx = sim.build_ivf_index(spark, base, str(tmp_path / "ivf"), nlist=8)
    n0 = idx.to_df().count()
    extra = e.filter((F.col("vec_id") >= 400) & (F.col("vec_id") < 450))
    sim.ivf_index_append(spark, idx, extra)
    assert idx.to_df().count() == n0 + extra.count()
    # planted twin of an appended vector must come back at rank 1
    twin = extra.orderBy("vec_id").limit(1).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding")
    target = twin.collect()[0]["vec_id"] - 1_000_000
    hits = sim.ivf_index_topk(spark, idx, twin, k=3, nprobe=4,
                              exclude_self=False)
    top = hits.filter("rank = 1").collect()[0]
    assert top["neighbor_id"] == target


def test_ivf_topk_nondeterministic_query_frame(spark, sf_dir, tmp_path):
    """Regression for the round-3 double-evaluation defect: a query
    frame whose evaluation order is NOT stable (unordered limit over a
    shuffled+sampled frame) must still rank its planted twin #1 —
    ivf_index_topk materializes the frame once, so the probed-cell set
    and the join input cannot diverge."""
    from starlake_spark.functions import similarity as sim

    e = L.ld(spark, sf_dir, "embeddings")
    idx = sim.build_ivf_index(spark, e, str(tmp_path / "ivf_nd"), nlist=8)
    # deliberately nondeterministic: repartition scrambles row order,
    # sample(withReplacement seed-free semantics vary per evaluation
    # under recompute) and an unordered limit picks "whichever row"
    wobble = (e.repartition(16)
              .sample(fraction=0.5, seed=None)
              .limit(3)
              .select((F.col("vec_id") + 1_000_000).alias("vec_id"),
                      "embedding"))
    hits = sim.ivf_index_topk(spark, idx, wobble, k=3, nprobe=4,
                              exclude_self=False).collect()
    got = {r["query_id"]: r["neighbor_id"] for r in hits if r["rank"] == 1}
    assert len(got) >= 1
    # every query's top hit must be its own source vector (cosine 1.0)
    for qid, nid in got.items():
        assert nid == qid - 1_000_000, (qid, nid)


def test_remove_duplicated_spans_cuts_shared_run(spark):
    """Two docs sharing a 10-token run → both lose exactly those 10
    tokens; a doc without cross-doc runs is untouched (fp = full text)."""
    import hashlib

    shared = " ".join(f"s{i}" for i in range(10))
    rows = [(1, shared + " xa xb xc"),
            (2, "ya yb " + shared),
            (3, "unique words only here nothing shared at all beyond runs")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           dd.remove_duplicated_spans(df, "doc_id", "text", k=8).collect()}
    assert out[1]["n_kept_tokens"] == 3 and out[2]["n_kept_tokens"] == 2
    assert out[1]["cleaned_fp"] == hashlib.md5(b"xa xb xc").hexdigest()
    assert out[2]["cleaned_fp"] == hashlib.md5(b"ya yb").hexdigest()
    assert out[3]["n_kept_tokens"] == out[3]["n_tokens"]
    assert out[3]["cleaned_fp"] == hashlib.md5(rows[2][1].encode()).hexdigest()


def test_bm25_empty_query_terms_raises_clearly(spark):
    from starlake_spark.functions import text as tx

    df = spark.createDataFrame([(1, "hello world")], "doc_id long, text string")
    with pytest.raises(ValueError, match="non-empty query_terms"):
        tx.bm25_topk(df, [])


def test_pq_adc_planted_twin_and_code_shape(spark):
    """PQ: twin of a query encodes to the query's own code word, whose
    ADC distance is the global minimum — rank 1 by construction; codes
    have m entries in [0, ksub)."""
    import numpy as np

    from starlake_spark.functions import similarity as sim

    rng = np.random.RandomState(7)
    vecs = [(i, [float(x) for x in rng.standard_normal(64)]) for i in range(200)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    q = df.filter("vec_id < 3")
    corpus = df.unionByName(q.selectExpr("vec_id + 1000 AS vec_id", "embedding"))
    books = sim.pq_train(corpus, "embedding", m=16, ksub=16, iters=5)
    assert books.shape == (16, 16, 4)
    codes = sim.pq_encode(corpus, books, "vec_id", "embedding")
    row = codes.filter("vec_id = 0").collect()[0]["codes"]
    assert len(row) == 16 and all(0 <= c < 16 for c in row)
    # twin and query share the code word exactly
    twin = codes.filter("vec_id = 1000").collect()[0]["codes"]
    assert row == twin
    top = sim.pq_topk(codes, q, books, k=3)
    top1 = {r["query_id"]: r["neighbor_id"]
            for r in top.filter("rank = 1").collect()}
    assert top1 == {0: 1000, 1: 1001, 2: 1002}, top1


def test_pq_and_ivfpq_preserve_string_ids(spark, tmp_path):
    """Non-integer id columns must survive the ADC paths untouched:
    pq_topk and ivfpq_topk used to coerce ids with int() + a hardcoded
    'query_id long' schema, crashing (or mis-joining) string/decimal
    ids. They now mirror ivf_index_topk's qid_type discipline."""
    import numpy as np

    from starlake_spark.functions import similarity as sim

    rng = np.random.RandomState(11)
    vecs = [(f"doc-{i}", [float(x) for x in rng.standard_normal(64)])
            for i in range(120)]
    df = spark.createDataFrame(vecs, "vec_id string, embedding array<double>")
    q = df.filter("vec_id = 'doc-0'")
    corpus = df.unionByName(
        q.select(F.concat(F.col("vec_id"), F.lit("-twin")).alias("vec_id"),
                 "embedding"))

    books = sim.pq_train(corpus, "embedding", m=16, ksub=16, iters=5)
    codes = sim.pq_encode(corpus, books, "vec_id", "embedding")
    top = sim.pq_topk(codes, q, books, k=3)
    assert dict(top.dtypes)["query_id"] == "string"
    r1 = top.filter("rank = 1").collect()[0]
    assert r1["query_id"] == "doc-0" and r1["neighbor_id"] == "doc-0-twin"

    idx = sim.build_ivfpq_index(spark, corpus, str(tmp_path / "ivfpq_str"),
                                nlist=4, m=16, ksub=16)
    hits = sim.ivfpq_topk(spark, idx, q, k=3, nprobe=4, exclude_self=True)
    assert dict(hits.dtypes)["query_id"] == "string"
    h1 = hits.filter("rank = 1").collect()[0]
    assert h1["query_id"] == "doc-0" and h1["neighbor_id"] == "doc-0-twin"


def test_rrf_fuse_combines_and_ranks(spark):
    """A doc ranked well in BOTH lists outscores a doc that tops only
    one (1/61+1/62 > 1/61): the calibration-free property RRF is for."""
    from starlake_spark.functions import text as tx

    a = spark.createDataFrame([(10, 1), (20, 2), (30, 3)], "doc_id int, rank int")
    b = spark.createDataFrame([(20, 1), (40, 2)], "doc_id int, rank int")
    out = tx.rrf_fuse([a, b], "doc_id", k=10).collect()
    assert out[0]["doc_id"] == 20 and out[0]["n_lists"] == 2
    assert {r["doc_id"] for r in out} == {10, 20, 30, 40}
    single = {r["doc_id"]: r["n_lists"] for r in out}
    assert single[10] == 1 and single[40] == 1
    with pytest.raises(ValueError, match="at least one"):
        tx.rrf_fuse([], "doc_id")


def test_remove_duplicated_lines_keeps_first_occurrence(spark):
    from starlake_spark.functions import dedup as dd

    docs = spark.createDataFrame(
        [(1, "alpha\nshared\nbeta"),
         (2, "shared\ngamma"),        # 'shared' already seen in doc 1
         (3, "delta\ndelta\nomega")], # within-doc repeat: first kept
        "doc_id int, text string")
    out = {r["doc_id"]: r for r in
           dd.remove_duplicated_lines(docs).collect()}
    assert out[1]["cleaned"] == "alpha\nshared\nbeta"
    assert out[2]["cleaned"] == "gamma" and out[2]["n_kept"] == 1
    assert out[3]["cleaned"] == "delta\nomega"
    assert out[3]["n_lines"] == 3 and out[3]["n_kept"] == 2


def test_bm25_indexed_matches_scan_everything(spark, sf_dir, tmp_path):
    """The persisted-index probe returns the SAME ranking and scores as
    the re-tokenize-per-query operator — the index is an access-path
    change, never a semantics change. Non-ASCII terms fall back to an
    unpruned (still correct) scan."""
    from starlake_spark.functions import text as tx

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t = tx.build_text_index(spark, d, str(tmp_path / "idx"), num_buckets=8)
    terms = ["stream", "query", "join"]
    a = tx.bm25_topk(d, terms).collect()
    b = tx.bm25_topk_indexed(spark, t, terms).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    # pruning: probed buckets < total buckets
    probe = tx.bm25_topk_indexed(spark, t, ["stream"])
    pf = probe.inputFiles()
    assert 0 < len(pf) < len(t.to_df().inputFiles())
    # non-ASCII falls back to all buckets, result still exact
    c = tx.bm25_topk_indexed(spark, t, ["stream", "café"]).collect()
    cc = tx.bm25_topk(d, ["stream", "café"]).collect()
    assert [tuple(r) for r in c] == [tuple(r) for r in cc]
    with pytest.raises(ValueError, match="non-empty"):
        tx.bm25_topk_indexed(spark, t, [])


def test_ivfpq_index_build_query_append(spark, sf_dir, tmp_path):
    """IVF-PQ composed index: planted twin ranks 1 through the pruned
    ADC probe; appended vectors are probe-visible without refit; probe
    reads fewer files than the full index."""
    from starlake_spark.functions import similarity as sim

    e = L.ld(spark, sf_dir, "embeddings")
    base = e.filter(F.col("vec_id") < 400)
    idx = sim.build_ivfpq_index(spark, base, str(tmp_path / "ivfpq"),
                                nlist=8, m=16, ksub=32)
    # planted twin of a base vector (twin encodes to the same code word
    # in the same cell → ADC global minimum)
    twin = (base.orderBy("vec_id").limit(1)
            .select((F.col("vec_id") + 1_000_000).alias("vec_id"),
                    "embedding"))
    target = twin.collect()[0]["vec_id"] - 1_000_000
    sim.ivfpq_index_append(spark, idx, twin)
    hits = sim.ivfpq_topk(spark, idx, twin, k=3, nprobe=4,
                          exclude_self=True)
    top = hits.filter("rank = 1").collect()[0]
    assert top["neighbor_id"] == target
    # probe prunes: reading 1 cell touches fewer files than the index
    n_all = len(idx.to_df().inputFiles())
    n_one = len(idx.to_df(
        partition_filter=lambda d: int(d["centroid_id"]) == 0).inputFiles())
    assert n_one < n_all


def test_ivfpq_topk_nondeterministic_query_frame(spark, sf_dir, tmp_path):
    """Single-materialization discipline: a nondeterministic query
    frame still ranks its own source vector #1 (cells, LUTs, and join
    input all derive from one snapshot)."""
    from starlake_spark.functions import similarity as sim

    e = L.ld(spark, sf_dir, "embeddings")
    idx = sim.build_ivfpq_index(spark, e, str(tmp_path / "ivfpq_nd"),
                                nlist=8, m=16, ksub=32)
    wobble = (e.repartition(16)
              .sample(fraction=0.5, seed=None)
              .limit(3)
              .select((F.col("vec_id") + 1_000_000).alias("vec_id"),
                      "embedding"))
    hits = sim.ivfpq_topk(spark, idx, wobble, k=3, nprobe=4,
                          exclude_self=False).collect()
    got = {r["query_id"]: r["neighbor_id"] for r in hits if r["rank"] == 1}
    assert len(got) >= 1
    for qid, nid in got.items():
        assert nid == qid - 1_000_000, (qid, nid)


def test_content_ref_pack_fetch_roundtrip(spark, tmp_path):
    """content_ref mode: payloads pack into external shards, pointer
    rows fetch back byte-identical; an EMPTY payload round-trips as b''
    (zero-length ref) while a NULL payload round-trips as NULL (null
    ref) — null and empty stay distinguishable; a corrupted shard byte
    surfaces as a checksum error."""
    import os

    from starlake_spark.functions import multimodal as mm

    rows = [(1, b"alpha-payload"), (2, b""), (3, None),
            (4, b"x" * 10_000), (5, b"another one")]
    df = spark.createDataFrame(rows, "item_id long, payload binary")
    shard_dir = str(tmp_path / "shards")
    refs = mm.pack_payload_shards(df.repartition(2), shard_dir,
                                  "payload", "item_id")
    refs = refs.localCheckpoint()  # pin pointer rows before fetching
    assert refs.count() == 5
    # NULL payload → NULL pointer; empty payload → real zero-length ref
    by_id = {r["item_id"]: r["content_ref"] for r in refs.collect()}
    assert by_id[3] is None
    assert by_id[2] is not None and by_id[2]["length"] == 0
    shards = os.listdir(shard_dir)
    assert shards and all(s.endswith(".bin") for s in shards)
    # total shard bytes == total payload bytes (pure concatenation)
    total = sum(os.path.getsize(os.path.join(shard_dir, s)) for s in shards)
    assert total == sum(len(p or b"") for _, p in rows)

    got = {r["item_id"]: (bytes(r["payload"]) if r["payload"] is not None
                          else None)
           for r in mm.fetch_content(refs, "content_ref", "item_id").collect()}
    assert got == dict(rows)

    # corrupt one nonempty payload's first byte → verify raises
    victim = refs.filter("item_id = 4").collect()[0]["content_ref"]
    with open(victim["uri"], "r+b") as fh:
        fh.seek(victim["offset"])
        orig = fh.read(1)
        fh.seek(victim["offset"])
        fh.write(bytes([orig[0] ^ 0xFF]))
    import pytest as _pt
    with _pt.raises(Exception, match="checksum mismatch"):
        mm.fetch_content(refs, "content_ref", "item_id").collect()
    # verify=False returns the corrupted bytes rather than raising
    n = mm.fetch_content(refs, "content_ref", "item_id",
                         verify=False).count()
    assert n == 5


def _py_greedy_bpe(text, merges):
    toks = []
    for w in text.lower().split():
        syms = list(w)
        for left, right in merges:
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == left
                        and syms[i + 1] == right):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        toks.extend(syms)
    return toks


def test_bpe_train_apply_exact_vs_python_reference(spark):
    """Learned rules and encodings must match a per-word greedy BPE
    implemented in plain Python — including the overlap case (a run of
    the same symbol merges left-to-right non-overlapping)."""
    docs = [(1, "low lower lowest low low newer new"),
            (2, "wider new newer newest low aaaa aaa"),
            (3, ""), (4, None)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    merges = tx.bpe_train(df, "text", num_merges=5, min_count=1)
    assert len(merges) == 5
    got = {r["doc_id"]: r["t"]
           for r in tx.bpe_apply(df, "text", merges, "t").collect()}
    for did, text in docs:
        exp = _py_greedy_bpe(text or "", merges)
        assert got[did] == exp, (did, got[did], exp)


def test_bpe_train_stops_below_min_count(spark):
    df = spark.createDataFrame([(1, "ab ab cd")], "doc_id long, text string")
    merges = tx.bpe_train(df, "text", num_merges=10, min_count=2)
    assert merges == [("a", "b")]


def test_bpe_apply_plan_is_pure_codegen(spark):
    """Encoding is a per-row map: no Exchange, no Python eval in the
    plan — the 100 TB posture is 'as cheap as a projection'."""
    df = spark.createDataFrame([(1, "low lower")], "doc_id long, text string")
    out = tx.bpe_apply(df, "text", [("l", "o"), ("lo", "w")], "t")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_bpe_randomized_vs_python_reference(spark):
    """Seeded random corpora (repeated chars, shared prefixes, blanks):
    learned rules and encodings must match the per-word greedy Python
    reference for every document."""
    import random

    rng = random.Random(17)
    alphabet = "abcd"
    for trial in range(3):
        docs = []
        for did in range(rng.randint(3, 8)):
            words = [
                "".join(rng.choice(alphabet)
                        for _ in range(rng.randint(1, 7)))
                for _ in range(rng.randint(0, 12))
            ]
            docs.append((did, " ".join(words)))
        df = spark.createDataFrame(docs, "doc_id long, text string")
        merges = tx.bpe_train(df, "text", num_merges=4, min_count=1)
        got = {r["doc_id"]: r["t"]
               for r in tx.bpe_apply(df, "text", merges, "t").collect()}
        for did, text in docs:
            exp = _py_greedy_bpe(text, merges)
            assert got[did] == exp, (trial, did, text, merges,
                                     got[did], exp)


def test_semantic_decontaminate_contract(spark):
    """semantic_decontaminate drops exactly the corpus rows within
    `threshold` cosine of an eval vector: exact copies under DIFFERENT
    ids, scaled copies (cosine is scale-invariant), and eval members
    sharing the SAME id as a corpus row (unrelated id spaces must not
    exempt them); orthogonal and zero-norm rows survive."""
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0]),    # == eval id 1's vector, same id
         (2, [0.0, 1.0, 0.0]),    # orthogonal -> kept
         (3, [2.5, 0.0, 0.0]),    # scaled copy of eval -> dropped
         (4, [0.0, 0.0, 0.0]),    # zero norm -> cosine 0 -> kept
         (5, [0.7, 0.7, 0.0])],   # cos 0.707 < 0.99 -> kept
        "vec_id long, embedding array<double>")
    ev = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0]),    # id COLLIDES with corpus row 1
         (9, [0.0, 0.0, 0.0])],   # zero-norm eval matches nothing
        "vec_id long, embedding array<double>")
    kept = sorted(r["vec_id"] for r in
                  sim.semantic_decontaminate(corpus, ev, threshold=0.99)
                  .collect())
    assert kept == [2, 4, 5]
