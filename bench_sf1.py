#!/usr/bin/env python
"""One-off sf1 scaling probe (round-4 verdict task 9): run the 22
TPC-H entries at ~sf1 and compare per-query times against sf0.1 —
any entry whose sf1/sf0.1 ratio far exceeds the 10× data ratio has a
plan that degrades nonlinearly (the 100×-scale question).

sf1 inputs are DERIVED from the driver's sf0.1 parquet (never
synthesized from scratch): each fact table unions 10 key-shifted
copies of itself (keys offset per replica so joins fan out linearly,
uniqueness-sensitive columns stay unique); dimension tables
(region/nation) keep their fixed size, exactly like real TPC-H SFs.
Built once under ``$SPARK_GRAFT_SF1_DIR`` (default /root/repo/_sf1).

Prints one JSON line: {"metric": "sf1_total", "value": N,
"unit": "sec", "queries": {...}, "ratios_vs_sf01": {...}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SRC = "/root/testdata/sf0.1"
OUT = os.environ.get("SPARK_GRAFT_SF1_DIR", "/root/repo/_sf1")
REPLICAS = 10

# key columns shifted per replica (offset = r * 10_000_000) so every
# replica's rows join only within itself — row counts scale linearly,
# exactly like a larger SF
SHIFT = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
}
FIXED = ["region", "nation"]


def build(spark):
    from pyspark.sql import functions as F

    os.makedirs(OUT, exist_ok=True)
    for tbl in FIXED:
        dst = os.path.join(OUT, f"{tbl}.parquet")
        if not os.path.exists(dst):
            spark.read.parquet(f"{SRC}/{tbl}.parquet") \
                .write.mode("overwrite").parquet(dst)
    for tbl, keys in SHIFT.items():
        dst = os.path.join(OUT, f"{tbl}.parquet")
        if os.path.exists(dst):
            continue
        base = spark.read.parquet(f"{SRC}/{tbl}.parquet")
        parts = []
        for r in range(REPLICAS):
            d = base
            for k in keys:
                d = d.withColumn(k, (F.col(k) + r * 10_000_000)
                                 .cast(dict(base.dtypes)[k]))
            parts.append(d)
        out = parts[0]
        for d in parts[1:]:
            out = out.unionByName(d)
        out.write.mode("overwrite").parquet(dst)
    # documents: 10 replicas with shifted doc_ids; text gets a filler
    # suffix ~half the original token count so cross-replica Jaccard
    # lands ~0.5 — well under the dedup thresholds — and replicas are
    # NOT near-duplicates of each other (pure text copies would
    # collapse the sf1 corpus back to sf0.1 after dedup and turn every
    # LSH band into a 10-way collision). The filler token is DOC-unique
    # (r{r}d{doc_id}tok): a replica-wide constant token gave every doc
    # in a replica shared shingles, which at 500k docs made short docs
    # cross the Jaccard threshold against half the corpus — the round-8
    # sf1 ORACLE sweep caught components/minhash answers diverging on
    # that degenerate graph (and the quadratic duckdb oracle at 847 s).
    # doc_id/vec_id replica offsets are 100_000 (not the fact tables'
    # 10_000_000): the dedup/ANN entries reserve the id space above
    # PLANT_ID = 1_000_000 for planted twins / recrawls (llm_suite.py
    # :696, engine_suite.py:1121), so 10M-range real ids masqueraded as
    # plants — silently filtered off the spark side while the oracle
    # kept them (round-8 sweep: components 477 vs 50000 rows)
    dst = os.path.join(OUT, "documents.parquet")
    if os.path.islink(dst):
        os.unlink(dst)  # upgrade older symlink-only builds
    if not os.path.exists(dst):
        base = spark.read.parquet(f"{SRC}/documents.parquet")
        parts = []
        for r in range(REPLICAS):
            filler = F.concat_ws(" ", F.array_repeat(
                F.concat(F.lit(f"r{r}d"), F.col("doc_id").cast("string"),
                         F.lit("tok")),
                F.greatest(F.lit(1),
                           (F.size(F.split(F.col("text"), r"\s+")) / 2)
                           .cast("int"))))
            parts.append(
                base.withColumn("doc_id",
                                (F.col("doc_id") + r * 100_000)
                                .cast(dict(base.dtypes)["doc_id"]))
                    .withColumn("text",
                                F.concat_ws(" ", F.col("text"), filler))
                    .withColumn("n_chars", F.length("text")))
        out = parts[0]
        for d in parts[1:]:
            out = out.unionByName(d)
        out.write.mode("overwrite").parquet(dst)
    # embeddings: shifted vec_ids; each replica's vector is the
    # original CIRCULARLY SHIFTED by r positions — norm-preserving and
    # decorrelating (random vectors' rotations are near-orthogonal), so
    # the sf1 corpus is a genuine 10× population rather than 10-way
    # near-identical groups (a per-dimension nudge left cosine ≈ 1
    # across replicas, which collapsed under semantic dedup and made
    # every ANN cell degenerate)
    dst = os.path.join(OUT, "embeddings.parquet")
    if os.path.islink(dst):
        os.unlink(dst)
    if not os.path.exists(dst):
        base = spark.read.parquet(f"{SRC}/embeddings.parquet")
        parts = []
        for r in range(REPLICAS):
            d = base.withColumn("vec_id",
                                (F.col("vec_id") + r * 100_000)
                                .cast(dict(base.dtypes)["vec_id"]))
            if r:
                sz = F.size("embedding")
                d = d.withColumn(
                    "embedding",
                    F.concat(F.slice(F.col("embedding"), r + 1,
                                     (sz - F.lit(r)).cast("int")),
                             F.slice(F.col("embedding"), 1, r)))
            parts.append(d)
        out = parts[0]
        for d in parts[1:]:
            out = out.unionByName(d)
        out.write.mode("overwrite").parquet(dst)


def main():
    from starlake_spark.session import get_spark

    spark = get_spark("bench_sf1")
    t0 = time.time()
    build(spark)
    build_s = time.time() - t0

    import __spark_entry__ as entry

    qs = entry.queries()
    tpch = sorted(n for n in qs if n.startswith("q"))
    # scale-sensitive LLM-pipeline + DML representatives (round-7):
    # banded dedup, brute vs IVF ANN (the IVF ratio should be well
    # UNDER the 10× data ratio — manifest-pruned probes), text battery
    # folds, index build, and the MoR upsert/ingest DML paths
    extra = [n for n in (
        "docs_dedup_exact", "docs_minhash_dedup", "docs_token_stats",
        "docs_quality", "docs_text_index_build", "docs_dedup_components",
        "ann_cosine_topk", "ann_ivf_build", "ann_ivf_topk",
        "embeddings_semantic_dedup", "star_upsert_mor",
        "star_ingest_dedup",
    ) if n in qs]
    tpch = tpch + extra
    # calibration probe: normalizes cross-epoch comparisons
    import numpy as np
    c0 = time.time()
    for _ in range(3):
        np.linalg.svd(np.random.RandomState(0).standard_normal((600, 600)))
    calib = time.time() - c0

    times = {}
    for name in tpch:
        best = None
        for _ in range(2):
            s = time.time()
            qs[name](spark, OUT).write.format("noop").mode("overwrite").save()
            el = time.time() - s
            best = el if best is None else min(best, el)
        times[name] = round(best, 3)

    base = {}
    bench_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "BENCH_FULL.json")
    if os.path.exists(bench_path):
        with open(bench_path) as f:
            base = json.load(f).get("queries", {})
    ratios = {n: round(times[n] / base[n], 2)
              for n in times if base.get(n)}
    print(json.dumps({
        "metric": "sf1_total", "value": round(sum(times.values()), 2),
        "unit": "sec", "sf": 1.0, "build_sec": round(build_s, 1),
        "calibration_svd_sec": round(calib, 3),
        "queries": times, "ratios_vs_sf01": ratios,
    }))


if __name__ == "__main__":
    main()
