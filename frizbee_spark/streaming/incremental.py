"""Incremental / streaming ingest for the dedup pipeline.

The reference's incremental matcher pre-interleaves all haystacks once and
recomputes only what a new needle invalidates
(/root/reference/src/incremental/matcher.rs:13-118). Our distributed
analog: the signature table is the persisted "pre-interleaved" state; a
new crawl increment only computes signatures for NEW docs and matches
them against (a) themselves and (b) the existing signature index —
never recomputing old-vs-old.

Two surfaces:

- :func:`incremental_dedup_batch` — the core delta step, pure batch:
  (new_docs, existing_signatures) -> (new_signatures, new_edges). Drives
  both the resume path and the streaming path.
- :func:`dedup_stream` — Structured Streaming wrapper: readStream of new
  documents, `foreachBatch` applies the delta step and appends to the
  signature/edge tables. State (the signature index) lives in the table,
  not in Spark operator state, so a stream restart resumes from storage —
  same checkpoint discipline as the batch pipeline.

Scale note: new-vs-existing candidate generation reuses the same LSH
band keys, so the probe is an equi-join of the increment's exploded bands
(small) against the historical band table (large, bucketed by band_key in
Iceberg) — a broadcast or storage-partitioned join, not a rescan of the
corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.dedup import (
    DEFAULT_DEDUP,
    DedupConfig,
    compute_signatures,
    pairs_from_buckets,
    verify_pairs,
)


def explode_bands(signatures: DataFrame) -> DataFrame:
    return signatures.select(
        F.posexplode("band_keys").alias("band_id", "band_key"), "doc_id"
    )


def incremental_dedup_batch(
    new_docs: DataFrame,
    existing_signatures: DataFrame | None,
    cfg: DedupConfig = DEFAULT_DEDUP,
    id_col: str = "doc_id",
    text_col: str = "norm_text",
) -> tuple[DataFrame, DataFrame]:
    """Delta step: returns (new_signatures, candidate_pairs, all_signatures).

    Candidates cover new-vs-new AND new-vs-existing pairs; existing-vs-
    existing is never recomputed (the incremental-matcher property).
    Callers verify with :func:`verify_increment`.
    """
    new_sigs = compute_signatures(new_docs, cfg, id_col=id_col, text_col=text_col)

    new_bands = explode_bands(new_sigs)
    nn_pairs = pairs_from_buckets(new_bands, ["band_id", "band_key"], cfg)
    exact_nn = pairs_from_buckets(
        new_sigs.select("text_hash", "n_bytes", "doc_id"), ["text_hash", "n_bytes"], cfg
    )
    cand = nn_pairs.unionByName(exact_nn)

    if existing_signatures is not None:
        old_bands = explode_bands(existing_signatures)
        # probe join: every (band, key) hit links a new doc to an old doc
        ne = (
            new_bands.withColumnRenamed("doc_id", "new_id")
            .join(old_bands.withColumnRenamed("doc_id", "old_id"),
                  ["band_id", "band_key"])
            .filter(F.col("new_id") != F.col("old_id"))
            .select(F.least("new_id", "old_id").alias("a"),
                    F.greatest("new_id", "old_id").alias("b"))
        )
        exact_ne = (
            new_sigs.select("text_hash", "n_bytes", F.col("doc_id").alias("new_id"))
            .join(existing_signatures.select(
                "text_hash", "n_bytes", F.col("doc_id").alias("old_id")),
                ["text_hash", "n_bytes"])
            .filter(F.col("new_id") != F.col("old_id"))
            .select(F.least("new_id", "old_id").alias("a"),
                    F.greatest("new_id", "old_id").alias("b"))
        )
        cand = cand.unionByName(ne).unionByName(exact_ne)

    cand = cand.dropDuplicates(["a", "b"])

    all_sigs = (
        new_sigs if existing_signatures is None
        else existing_signatures.unionByName(new_sigs)
    )
    # docs table for text lookup: new docs plus whatever existing docs the
    # caller provides through `existing_docs_lookup` — here signatures
    # carry no text, so verify joins against the union the caller passes.
    return new_sigs, cand, all_sigs


def verify_increment(
    cand: DataFrame,
    docs_lookup: DataFrame,
    all_sigs: DataFrame,
    cfg: DedupConfig = DEFAULT_DEDUP,
    text_col: str = "norm_text",
) -> DataFrame:
    """Verify increment candidates against the full doc lookup table."""
    return verify_pairs(cand, docs_lookup, cfg, text_col=text_col,
                        signatures=all_sigs).filter("verified").select("a", "b")


def dedup_stream(
    spark,
    input_path: str,
    state_dir: str,
    cfg: DedupConfig = DEFAULT_DEDUP,
    checkpoint_dir: str | None = None,
):
    """Structured Streaming ingest: watch a directory of parquet document
    files; each micro-batch runs the delta step against the accumulated
    signature/doc state tables under ``state_dir``.

    Returns the StreamingQuery. State tables:
      state_dir/signatures   cumulative signature index
      state_dir/docs         cumulative (doc_id, norm_text) lookup
      state_dir/edges        cumulative verified duplicate edges
    """
    import os

    from ..operators.dedup import normalize_text, with_doc_id

    schema = "url string, warc_ts timestamp, html binary, text string, lang string"
    stream = spark.readStream.schema(schema).parquet(input_path)

    sig_path = os.path.join(state_dir, "signatures")
    docs_path = os.path.join(state_dir, "docs")
    edges_path = os.path.join(state_dir, "edges")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        s = spark
        new_docs = with_doc_id(normalize_text(batch_df, "text"), "url").select(
            "doc_id", "url", "norm_text"
        )
        have_state = os.path.exists(os.path.join(sig_path, "_SUCCESS"))
        existing = s.read.parquet(sig_path) if have_state else None
        new_sigs, cand, all_sigs = incremental_dedup_batch(new_docs, existing, cfg)

        old_docs = (
            s.read.parquet(docs_path)
            if os.path.exists(os.path.join(docs_path, "_SUCCESS"))
            else None
        )
        lookup = new_docs.select("doc_id", "norm_text")
        if old_docs is not None:
            lookup = lookup.unionByName(old_docs.select("doc_id", "norm_text"))
        edges = verify_increment(cand, lookup, all_sigs, cfg)

        # append-only state updates (atomic-visibility via _SUCCESS /
        # Iceberg snapshot on a real deployment)
        edges.write.mode("append").parquet(edges_path)
        new_sigs.write.mode("append").parquet(sig_path)
        new_docs.select("doc_id", "norm_text").write.mode("append").parquet(docs_path)

    q = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation",
                checkpoint_dir or os.path.join(state_dir, "_stream_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    return q
