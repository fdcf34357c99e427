"""SparkSession construction tuned for this engine.

Defaults follow the scale posture in SURVEY.md §7: AQE on (runtime
re-planning, skew-join splitting, partition coalescing), Arrow on (fast
Pandas-UDF path), shuffle partitions sized to the local core count
rather than Spark's default 200. On a real cluster the same builder is
used with ``master`` unset (picked up from spark-submit).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "starlake_spark", master: str | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Scale notes (100 TB posture):
      - AQE handles runtime partition coalescing and skew-join splits so
        a fixed ``shuffle.partitions`` is only the *initial* value.
      - ``maxPartitionBytes`` is left at 128 MB: with snappy parquet this
        keeps scan tasks comfortably in executor memory.
      - ANSI mode stays at the Spark 4 default (on); engine code avoids
        out-of-bounds/overflow-throwing expressions in hot paths.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    if master is None:
        master = f"local[{cpus}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # TIMESTAMP(NANOS) parquet (events.ts) is unreadable by Spark 4
        # natively; read as long and floor-div to micros at the source
        # (starlake_spark.queries.analytics.ld) — duckdb truncates the
        # same way.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # bucketed tables written by StarTable.to_bucketed_table carry
        # one sorted file per bucket; this flag lets the scan report
        # that ordering so bucket-aligned SortMergeJoins skip the sort
        # as well as the exchange (the reference's bucket-scan protocol,
        # SetPartitionAndOrdering.scala:52-141)
        .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
        # Manifest-driven scans hand Spark explicit leaf-file lists, so
        # "discovery" is one stat per known path — but above this
        # threshold Spark launches a distributed LISTING JOB per scan
        # (an extra scheduling round-trip; measured 0.28s vs 0.12s per
        # 64-path scan construction on this host — interleaved A/B,
        # optimization round 10). MoR/CDC scans routinely pass >32
        # paths. Driver-side stats are microseconds on local disk;
        # object-store deployments where driver listing is slow can
        # lower this back via the env knob.
        .config("spark.sql.sources.parallelPartitionDiscovery.threshold",
                os.environ.get("SPARK_GRAFT_LIST_JOB_THRESHOLD", "4096"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
    )
    # Shuffle/spill scratch on tmpfs when available: this host's block
    # device throttles after sustained IO, which otherwise dominates
    # local-mode timings. Memory is 128 GiB and test-scale shuffles are
    # MBs; a real cluster sets spark.local.dir to fast local disks.
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR",
                               "/dev/shm" if os.path.isdir("/dev/shm") else None)
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def star_session(app_name: str = "starlake_spark"):
    """Convenience: a :class:`starlake_spark.sql.StarSession` over get_spark()."""
    from starlake_spark.sql import StarSession

    return StarSession(get_spark(app_name))
