"""Small shared plan utilities."""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_PERSIST_LOCK = threading.Lock()
_PERSISTED: list[DataFrame] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """``persist()`` + register for :func:`release_tracked`.

    Operators cache plans consumed by several downstream branches
    (verify tag table, gated candidates, winnow fingerprints, capped LSH
    buckets); a bare ``.persist()`` with no owner leaks those blocks into
    the CacheManager for the life of the session — a long-running stream
    calling verify per micro-batch accumulates them unboundedly, and with
    ``spark.local.dir`` on /dev/shm the eviction spill competes with the
    heap for host RAM. Every unit-of-work owner (pipeline run, streaming
    micro-batch, bench query loop) calls :func:`release_tracked` once its
    consuming actions finish.
    """
    df.persist()
    with _PERSIST_LOCK:
        _PERSISTED.append(df)
    return df


def release_tracked() -> int:
    """Unpersist every DataFrame registered since the last release;
    returns how many were released.

    Safe even if some plan still references the data (Spark recomputes on
    next use); intended at unit-of-work boundaries after all submission
    threads are joined, so no in-flight job loses its cache mid-stage.
    """
    with _PERSIST_LOCK:
        dfs = _PERSISTED[:]
        _PERSISTED.clear()
    n = 0
    for df in dfs:
        try:
            df.unpersist()
            n += 1
        except Exception:  # session already stopped — nothing to release
            pass
    return n


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
