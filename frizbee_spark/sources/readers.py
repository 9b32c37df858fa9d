"""Source connectors (survey S1/S2: haystack scan + file source).

The engine is storage-agnostic behind `load_documents`: parquet in the
sandbox, Iceberg on a real deployment (same DataFrame downstream). All
readers return the canonical documents shape and keep Catalyst pushdown
intact — filters/column pruning reach the scan (check `.explain()`
for PushedFilters/ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def load_documents(
    spark: SparkSession,
    path_or_table: str,
    fmt: str | None = None,
) -> DataFrame:
    """Load a documents table from parquet path, text dir, or Iceberg table.

    fmt=None autodetects: existing path ending in .parquet or a dir with
    parquet files -> parquet; 'db.table' string -> iceberg (requires the
    Iceberg runtime on the cluster classpath — not present in the sandbox,
    where parquet is the stand-in with the same stage semantics).
    """
    if fmt is None:
        if os.path.exists(path_or_table):
            fmt = "text" if _looks_like_text_dir(path_or_table) else "parquet"
        else:
            fmt = "iceberg"
    if fmt == "parquet":
        return spark.read.parquet(path_or_table)
    if fmt == "text":
        return read_text_lines(spark, path_or_table)
    if fmt == "iceberg":
        return spark.read.format("iceberg").load(path_or_table)
    raise ValueError(f"unknown format {fmt!r}")


def _looks_like_text_dir(path: str) -> bool:
    if os.path.isfile(path):
        return not path.endswith(".parquet")
    if os.path.isdir(path):
        names = os.listdir(path)[:50]
        return bool(names) and not any(n.endswith(".parquet") for n in names)
    return False


def read_text_lines(spark: SparkSession, path: str) -> DataFrame:
    """Newline-delimited strings -> (doc_id, text) — the benchmark file
    source of the reference (/root/reference/benches/lib.rs:22-26 reads the
    Chromium path list the same way).

    doc_id = xxhash64(file, content, occurrence index of that exact line
    within the file), so duplicate lines get distinct ids (the pipeline's
    id-collision invariant). The occurrence index comes from a window
    partitioned by (file, line CONTENT) — not by file alone, which would
    funnel every row of a single-file input through one shuffle partition
    and one core; the (file, value) key is fine-grained, so the shuffle
    stays parallel and each window holds only a line's duplicates.
    Ordering within a duplicate group uses ``monotonically_increasing_id``:
    deterministic for a fixed file layout + session config; a re-read
    under a different split size may renumber WHICH duplicate gets which
    index (ids stay unique and the id SET is layout-invariant).
    """
    from pyspark.sql.window import Window

    lines = spark.read.text(path).select(
        F.col("value"),
        F.col("_metadata.file_path").alias("_file"),
        F.monotonically_increasing_id().alias("_mid"),
    )
    w = Window.partitionBy("_file", "value").orderBy("_mid")
    return lines.select(
        F.xxhash64("_file", "value", F.row_number().over(w).cast("string"))
        .alias("doc_id"),
        F.col("value").alias("text"),
    )


def write_table(df: DataFrame, target: str, fmt: str = "parquet", mode: str = "overwrite"):
    """Result sink (survey S4). Parquet in the sandbox; on Iceberg:
    `df.writeTo(target).append()` gives atomic snapshot commits, which is
    what the pipeline's resume semantics assume of the storage layer."""
    if fmt == "iceberg":
        return df.writeTo(target).append()
    return df.write.mode(mode).format(fmt).save(target)
