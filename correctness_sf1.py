#!/usr/bin/env python
"""sf1 ORACLE parity (round-8 verdict task #1): every correctness claim
above sf0.1 previously rested on inline assertions — this script
hash-compares ANSWERS against DuckDB at ~sf1 (10× the driver's largest
test SF) and commits the result as CORRECTNESS_SF1.json.

Inputs are the same derived sf1 parquet as bench_sf1.py (key-shifted
replicas — see bench_sf1.build for why replicas are join-disjoint,
text-decorrelated, and rotation-decorrelated). Entries: the 22
TPC-H-ish queries, the sf1 scaling-probe representatives that declare a
DuckDB oracle, and the MoR engine anchors (star_upsert_mor /
star_compaction_invariance / star_cow_upsert / star_part_merge).

Per entry: row count, column (schema) match, exact value match (the
query suites are designed bit-identical vs DuckDB: decimal money sums,
rounded averages, deterministic scalar math), and — when exactness
fails on floats — the max abs diff so ulp drift is distinguishable
from real wrongness.

Prints one JSON line and writes CORRECTNESS_SF1.json.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench_sf1

OUT = bench_sf1.OUT
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

REPRESENTATIVES = [
    "docs_dedup_exact", "docs_minhash_dedup", "docs_token_stats",
    "docs_quality", "docs_dedup_components", "ann_cosine_topk",
    "ann_ivf_topk", "embeddings_semantic_dedup", "star_upsert_mor",
    "star_ingest_dedup", "star_compaction_invariance", "star_cow_upsert",
    "star_part_merge", "star_mv_incremental", "star_setop_pk",
    # round 9: delta-join MV maintenance + the skew-soak answer shape
    "star_mv_incremental_join", "star_skew_hotkey_collapse",
    # round 10: text-index family representative + the rewrite ∩
    # maintenance integration (both-changed window served through the
    # rewriter)
    "docs_bm25_search", "star_mv_join_rewrite", "star_rollup_realtime",
    "star_rollup_rewrite",
    # round 10 late: mutable-source min/max rescan + left-join MVs
    "star_mv_minmax_mutable", "star_mv_leftjoin_incremental",
    "star_mv_distinct_incremental", "star_rollup_minmax",
]


def _canon(pdf):
    import pandas as pd

    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pd.to_datetime(pdf[c]).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("float64")
        elif pd.api.types.is_integer_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("int64")
    return pdf.sort_values(by=list(pdf.columns), ignore_index=True)


def _compare(spark_pdf, duck_pdf) -> tuple[bool, float | None]:
    import pandas as pd

    try:
        pd.testing.assert_frame_equal(spark_pdf, duck_pdf,
                                      check_dtype=False, check_exact=True)
        return True, None
    except AssertionError:
        pass
    worst = 0.0
    for c in spark_pdf.columns:
        a, b = spark_pdf[c], duck_pdf[c]
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            d = (a.astype("float64").fillna(0.0)
                 - b.astype("float64").fillna(0.0)).abs().max()
            worst = max(worst, 0.0 if math.isnan(d) else float(d))
        else:
            if (a.astype(str) != b.astype(str)).any():
                return False, None  # non-float mismatch: hard fail
    return False, worst


def main():
    import duckdb

    from starlake_spark.session import get_spark

    spark = get_spark("correctness_sf1")
    t0 = time.time()
    bench_sf1.build(spark)
    build_s = time.time() - t0

    import __spark_entry__ as entry

    qs, oracles = entry.queries(), entry.oracle_sql()
    names = sorted(n for n in qs if n.startswith("q")) + [
        n for n in REPRESENTATIVES if n in qs]

    con = duckdb.connect()
    # uncapped, duckdb's default memory_limit (~80% of RAM) lets a
    # hash join balloon past what the host can give it alongside the
    # 24g Spark JVM — the kernel OOM-kills the sweep. Capped, duckdb
    # spills to disk instead.
    con.execute("SET memory_limit='40GB'")  # recursive-CTE oracles don't spill; 24G pinned out at sf1
    os.makedirs("/tmp/duck_tmp", exist_ok=True)
    con.execute("SET temp_directory='/tmp/duck_tmp'")
    for t in TABLES:
        p = f"{OUT}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written directory of part files
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{p}')")

    results, n_green = {}, 0
    for name in names:
        rec = {"rows": None, "oracle_rows": None, "schema_match": None,
               "hash_match": None, "max_abs_float_diff": None,
               "sec_spark": None, "sec_oracle": None, "err": None}
        try:
            s0 = time.time()
            spark_pdf = _canon(qs[name](spark, OUT).toPandas())
            rec["sec_spark"] = round(time.time() - s0, 2)
            sql = oracles.get(name)
            if sql is None:
                rec["rows"] = len(spark_pdf)
                rec["err"] = "no oracle (rows-only)"
                results[name] = rec
                continue
            s0 = time.time()
            duck_pdf = _canon(con.execute(sql).df())
            rec["sec_oracle"] = round(time.time() - s0, 2)
            rec["rows"] = len(spark_pdf)
            rec["oracle_rows"] = len(duck_pdf)
            rec["schema_match"] = (list(spark_pdf.columns)
                                   == list(duck_pdf.columns))
            if rec["schema_match"] and len(spark_pdf) == len(duck_pdf):
                ok, diff = _compare(spark_pdf, duck_pdf)
                rec["hash_match"] = ok
                rec["max_abs_float_diff"] = diff
            else:
                rec["hash_match"] = False
        except Exception as ex:  # noqa: BLE001 — per-entry isolation
            rec["err"] = f"{type(ex).__name__}: {ex}"[:400]
        if rec["hash_match"]:
            n_green += 1
        results[name] = rec
        status = ("OK" if rec["hash_match"] else
                  f"FAIL({rec['err'] or 'mismatch'})")
        print(f"  {name}: {status} rows={rec['rows']} "
              f"spark={rec['sec_spark']}s", file=sys.stderr)

    out = {
        "sf": 1.0, "sf_dir": OUT, "build_sec": round(build_s, 1),
        "entries_total": len(names), "entries_green": n_green,
        "total_sec": round(time.time() - t0, 1),
        "entries": results,
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "CORRECTNESS_SF1.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({k: v for k, v in out.items() if k != "entries"}))


if __name__ == "__main__":
    main()
