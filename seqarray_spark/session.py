"""SparkSession construction with scale-appropriate defaults.

Mirrors the reference's seqOpen/seqClose session registry
(reference: R/Methods.R:12-98) — but in Spark the "open file" is just a
DataFrame handle, so this module only standardizes session config.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "seqarray-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str = "8g",
) -> SparkSession:
    """Build (or reuse) a local SparkSession tuned for this engine.

    Settings chosen for cluster-transferability:
    - AQE on (runtime coalescing + skew-join splitting),
    - shuffle partitions ~ cores locally (would be ~2-3x total cores on a
      real cluster),
    - UTC session timezone (parity with the DuckDB oracle, which is
      tz-naive),
    - Arrow enabled for the pandas-UDF surface.
    """
    cpus = cpus or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", driver_memory)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # testdata events.parquet carries TIMESTAMP(NANOS); read as long and
        # convert in the loader (Spark has no native nanos timestamp).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # pin ANSI so parse semantics (try_cast / try_element_at paths are
        # written against ANSI-on) don't flip with the Spark version
        .config("spark.sql.ansi.enabled", "true")
        # report the stored per-bucket sort of bucketed tables (only
        # applies when a bucket is a single file — our bucketed writers
        # repartition to guarantee that): elides the corpus-side Sort in
        # bucket-aligned sort-merge joins (incremental ingest dedup,
        # optimize_bucketed), which otherwise re-sorts every corpus
        # bucket on every batch join
        .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    )
    return builder.getOrCreate()
