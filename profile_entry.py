#!/usr/bin/env python
"""Ad-hoc profiler for a single bench entry (optimization rounds).

Usage: python profile_entry.py <entry> [<entry>...]
Runs each entry once (after a warm-up of the session) under cProfile,
prints wall time and the top starlake_spark frames by cumulative time,
plus Spark job count via a SparkListener-ish statusTracker diff.
"""
from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    names = sys.argv[1:]
    from starlake_spark.session import get_spark
    from starlake_spark.queries import all_queries

    spark = get_spark(app_name="starlake_profile", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    qs = all_queries()
    sc = spark.sparkContext

    for name in names:
        fn = qs[name][0]
        tracker = sc.statusTracker()
        jobs_before = len(tracker.getJobIdsForGroup(None) or [])
        pr = cProfile.Profile()
        t0 = time.monotonic()
        pr.enable()
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        pr.disable()
        wall = time.monotonic() - t0
        jobs_after = len(tracker.getJobIdsForGroup(None) or [])
        print(f"\n===== {name}: {wall:.2f}s  (spark jobs ~{jobs_after - jobs_before})")
        s = io.StringIO()
        ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
        ps.print_stats(r"starlake_spark", 40)
        print(s.getvalue())
        s = io.StringIO()
        ps = pstats.Stats(pr, stream=s).sort_stats("tottime")
        ps.print_stats(25)
        print(s.getvalue())


if __name__ == "__main__":
    main()
