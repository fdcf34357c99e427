#!/usr/bin/env python
"""Interleaved in-process repeat timer for bench entries (optimization
rounds). Usage: python ab_entry.py <entry> [<entry>...] [--n N]
Runs each entry N times round-robin in ONE session and prints per-run
times + median, so code-state A/B compares medians from the same host
window."""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    args = sys.argv[1:]
    n = 3
    if "--n" in args:
        i = args.index("--n")
        n = int(args[i + 1])
        del args[i:i + 2]
    from starlake_spark.session import get_spark
    from starlake_spark.queries import all_queries

    spark = get_spark(app_name="starlake_ab", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite").save()
    qs = all_queries()
    runs: dict[str, list[float]] = {a: [] for a in args}
    for _ in range(n):
        for name in args:
            fn = qs[name][0]
            t0 = time.monotonic()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            runs[name].append(round(time.monotonic() - t0, 3))
    for name, ts in runs.items():
        print(f"{name}: median={statistics.median(ts):.3f} runs={ts}")


if __name__ == "__main__":
    main()
