"""SparkSession factory tuned for both local testing and cluster scale.

Local mode is a single JVM (``local[N]``); on a real cluster the same
settings hold except parallelism knobs, which callers size via env:

- ``SPARK_GRAFT_CPUS``  — local core count (default 32)
- ``SPARK_GRAFT_SHUFFLE_PARTITIONS`` — shuffle width (default = cpus)

Scale notes (100 TB design, SURVEY.md §4):
- AQE on: runtime shuffle-partition coalescing + skew-join splitting,
  so the static shuffle width only needs to be an upper bound.
- Arrow enabled: every pandas_udf/applyInPandas pays Arrow batch
  cost, not pickled rows.
- UTC session timezone: timestamp semantics identical to the DuckDB
  oracle and stable across clusters.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "sparkobs", extra_conf: dict | None = None) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(cpus))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # let AQE coalesce the output partitioning of persisted plans
        # too (default false): the dedup/LSH operators pin small
        # candidate/sketch frames with persist(), and without this
        # every cached frame materializes — and every later read
        # schedules — the full static shuffle width regardless of
        # size. Scale-adaptive, not a local tweak: coalescing follows
        # advisoryPartitionSizeInBytes, so corpus-sized caches keep
        # large partitions at any scale while kB-sized ones collapse
        # to a few tasks (guide §2.2). Measured at sf0.1:
        # near_dup_groups_lsh 7.9->4.5 s, minhash_lsh_pairs
        # 2.2->1.2 s, canonical_dedup 4.7->3.5 s (r14).
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # testdata's events.parquet stores TIMESTAMP(NANOS); Spark has no
        # nanos timestamp — read as long, io.load_table converts to micros
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
