"""Small shared plan utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen_if_narrow(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` when its scan is narrower than the
    cluster's parallelism — otherwise return it untouched.

    A small parquet input (one file under maxPartitionBytes) plans as ONE
    scan split, so every map-side operator downstream of it — explode,
    Arrow UDF, join build — runs on one core no matter how many the
    cluster has (measured: the sf0.1 shingle self-join ran 7.7s at one
    split vs 2.6s widened, on 32 cores). At data scale the scan already
    has >= parallelism splits and this is a no-op — the repartition
    shuffle is only ever paid on inputs small enough for it to be free.

    Only file-scan-rooted plans are probed: ``df.rdd`` on a plan with
    upstream shuffles would force AQE to materialize those query stages
    just to answer getNumPartitions (running them twice once the real
    action fires), so shuffle-fed DataFrames are returned untouched —
    their width was already chosen by AQE.
    """
    spark = df.sparkSession
    if not df.inputFiles():
        return df
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
