#!/usr/bin/env python
"""Full-inventory correctness sweep (round-8 verdict task #7): run
EVERY declared ``queries()`` entry against its DuckDB oracle at
``$STARLAKE_SWEEP_SF_DIR`` (default /root/testdata/sf0.01) and write
``CORRECTNESS_FULL_r{N}.json`` — the auditable superset of the
driver's fixed 50-entry CORRECTNESS sample (which never touches the
``star_*`` engine entries, ANN, or most ``docs_*``; see COVERAGE.md).

Per entry: row count, column-name match, exact value match (the
repo-wide bit-identical contract); entries without an oracle record a
rows-only check, exactly like the driver. One JSON line on stdout;
round number from $STARLAKE_ROUND (default 9).

Usage:  python correctness_full.py
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("STARLAKE_SWEEP_SF_DIR", "/root/testdata/sf0.01")
ROUND = os.environ.get("STARLAKE_ROUND", "9")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


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


def main():
    import duckdb
    import pandas as pd

    from starlake_spark.session import get_spark

    spark = get_spark("correctness_full")
    import __spark_entry__ as entry

    qs, oracles = entry.queries(), entry.oracle_sql()
    # Targeted re-verification during optimization rounds: run only the
    # named entries and write to a suffixed file (the full sweep's JSON
    # is only ever written by an unfiltered run).
    only = os.environ.get("STARLAKE_SWEEP_ONLY")
    if only:
        keep = {n.strip() for n in only.split(",") if n.strip()}
        missing = keep - set(qs)
        if missing:
            raise SystemExit(f"unknown entries: {sorted(missing)}")
        qs = {n: f for n, f in qs.items() if n in keep}
    con = duckdb.connect()
    con.execute("SET memory_limit='24GB'")
    os.makedirs("/tmp/duck_tmp", exist_ok=True)
    con.execute("SET temp_directory='/tmp/duck_tmp'")
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    t0 = time.time()
    results, n_green, n_rows_only, n_fail = {}, 0, 0, 0
    for name in sorted(qs):
        rec = {"rows": None, "oracle_rows": None, "schema_match": None,
               "hash_match": None, "sec": None, "err": None}
        s0 = time.time()
        try:
            spark_pdf = _canon(qs[name](spark, SF_DIR).toPandas())
            rec["rows"] = len(spark_pdf)
            sql = oracles.get(name)
            if sql is None:
                rec["err"] = "no oracle (rows-only)"
                n_rows_only += 1
            else:
                duck_pdf = _canon(con.execute(sql).df())
                rec["oracle_rows"] = len(duck_pdf)
                rec["schema_match"] = (list(spark_pdf.columns)
                                       == list(duck_pdf.columns))
                ok = False
                if rec["schema_match"] and len(spark_pdf) == len(duck_pdf):
                    try:
                        pd.testing.assert_frame_equal(
                            spark_pdf, duck_pdf,
                            check_dtype=False, check_exact=True)
                        ok = True
                    except AssertionError:
                        ok = False
                rec["hash_match"] = ok
                if ok:
                    n_green += 1
                else:
                    n_fail += 1
        except Exception as ex:  # noqa: BLE001 — per-entry isolation
            rec["err"] = f"{type(ex).__name__}: {ex}"[:300]
            n_fail += 1
        rec["sec"] = round(time.time() - s0, 2)
        results[name] = rec
        tag = ("OK" if rec["hash_match"] else
               "rows-only" if rec["err"] == "no oracle (rows-only)" else
               f"FAIL({rec['err'] or 'mismatch'})")
        print(f"  {name}: {tag} ({rec['sec']}s)", file=sys.stderr)

    out = {
        "sf_dir": SF_DIR, "round": ROUND,
        "entries_total": len(qs), "entries_green": n_green,
        "entries_rows_only": n_rows_only, "entries_failed": n_fail,
        "total_sec": round(time.time() - t0, 1),
        "entries": results,
    }
    suffix = "_subset" if only else ""
    dst = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       f"CORRECTNESS_FULL_r{ROUND}{suffix}.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({k: v for k, v in out.items() if k != "entries"}))


if __name__ == "__main__":
    main()
