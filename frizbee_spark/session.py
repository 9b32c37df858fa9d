"""SparkSession factory tuned for this engine.

Local-mode defaults match the sandbox (local[N] threads, single JVM); the
same settings minus master/driver-memory are what a spark-submit deploy
would use on a real cluster. Shuffle partitions default to ~cores (the
200 default over-parallelizes small local runs and under-parallelizes
100 TB ones — production jobs should set this per stage volume).
"""

from __future__ import annotations

import os


def get_spark(app_name: str = "frizbee-spark", cores: int | None = None, extra: dict | None = None):
    from pyspark.sql import SparkSession

    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))

    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cores, 4)))
        .config("spark.default.parallelism", str(max(cores, 4)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "128m")
    )
    for k, v in (extra or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
