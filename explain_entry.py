#!/usr/bin/env python
"""Capture .explain("formatted") for bench entries (optimization rounds).

Usage: python explain_entry.py <outdir-suffix> <entry> [...]
Runs each entry's build (scenario DML included), then writes the
returned DataFrame's formatted plan to plans/r10/<entry>_<suffix>.txt.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    os.environ.setdefault("SPARK_GRAFT_MASTER", f"local[{CPUS}]")
    from starlake_spark.session import get_spark
    from starlake_spark.queries import all_queries

    spark = get_spark(app_name="starlake_explain", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    here = os.path.dirname(os.path.abspath(__file__))
    outdir = os.path.join(here, "plans", os.environ.get("PLAN_ROUND", "r11"))
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        fn = qs[name][0]
        df = fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} chars)")


if __name__ == "__main__":
    main()
