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


def explode_bands(
    signatures: DataFrame, cfg: DedupConfig = DEFAULT_DEDUP
) -> DataFrame:
    """One row per (band, key, doc): the main tier plus (when present)
    the tier-2 short-doc bands with band_id offset by cfg.bands — the
    same disjoint id space the batch pair generators use.

    Incremental note: the probe join treats tier-2 hits at multiplicity
    >= 1 (vs the batch path's >= short_min_bands rule) — increments are
    small, so the extra chance candidates are few and the SW verifier
    rejects them; candidates are strictly a superset of the batch rule's.
    """
    main = signatures.select(
        F.posexplode("band_keys").alias("band_id", "band_key"), "doc_id"
    )
    if cfg.short_doc_max_bytes <= 0 or "short_band_keys" not in signatures.columns:
        return main
    tier2 = signatures.select(
        F.posexplode("short_band_keys").alias("_p", "band_key"), "doc_id"
    ).select(
        (F.col("_p") + cfg.bands).alias("band_id"), "band_key", "doc_id"
    )
    return main.unionByName(tier2)


def incremental_dedup_batch(
    new_docs: DataFrame,
    existing_signatures: DataFrame | None,
    cfg: DedupConfig = DEFAULT_DEDUP,
    id_col: str = "doc_id",
    text_col: str = "norm_text",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Delta step: returns (new_signatures, candidate_pairs, all_signatures).

    Candidates cover new-vs-new AND new-vs-existing pairs; existing-vs-
    existing is never recomputed (the incremental-matcher property).
    Callers verify with :func:`verify_increment`.
    """
    new_sigs = compute_signatures(new_docs, cfg, id_col=id_col, text_col=text_col)

    new_bands = explode_bands(new_sigs, cfg)
    nn_pairs = pairs_from_buckets(new_bands, ["band_id", "band_key"], cfg)
    exact_nn = pairs_from_buckets(
        new_sigs.select("text_hash", "n_bytes", "doc_id"), ["text_hash", "n_bytes"], cfg
    )
    cand = nn_pairs.unionByName(exact_nn)

    if existing_signatures is not None:
        old_bands = explode_bands(existing_signatures, cfg)
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


def _read_state(s, path: str, exclude_batch: int):
    """Union of committed (``_SUCCESS``-marked) per-batch state partitions
    STRICTLY BEFORE ``exclude_batch`` — batch N's state view is always
    "batches < N", so a replay reproduces the original computation exactly
    (never sees its own half-written first attempt, and never sees
    later-committed batches, which would re-discover cross-batch duplicate
    edges under a second batch_id and double-count them)."""
    import os

    if not os.path.isdir(path):
        return None
    subs = [
        d for d in os.listdir(path)
        if d.startswith("batch_id=")
        and os.path.exists(os.path.join(path, d, "_SUCCESS"))
        and int(d.split("=", 1)[1]) < exclude_batch
    ]
    if not subs:
        return None
    return s.read.parquet(*[os.path.join(path, d) for d in subs])


def make_batch_processor(spark, state_dir: str, cfg: DedupConfig = DEFAULT_DEDUP):
    """Build the ``foreachBatch`` callback for :func:`dedup_stream`.

    Module-level so the replay-idempotency contract is directly testable:
    calling the processor twice with the same ``batch_id`` (foreachBatch
    is at-least-once) must leave state identical to calling it once —
    every write is an overwrite of a per-batch subdirectory keyed by the
    stable batch_id, and prior-state reads exclude the current batch.
    """
    import json
    import os

    from ..operators.dedup import normalize_text, signature_meta, with_doc_id

    sig_path = os.path.join(state_dir, "signatures")
    docs_path = os.path.join(state_dir, "docs")
    edges_path = os.path.join(state_dir, "edges")
    meta_path = os.path.join(state_dir, "_sigmeta.json")

    def _check_or_stamp_family() -> None:
        """Persisted signature state carries its hash-family identity; a
        stream resumed under a different family/config would probe old
        band keys that never collide with new ones and silently lose all
        cross-batch near-dup recall — fail loudly instead (r2 advice)."""
        meta = signature_meta(cfg)
        if os.path.exists(meta_path):
            stored = json.load(open(meta_path))
            if stored != meta:
                raise RuntimeError(
                    f"streaming state at {state_dir} was written by an "
                    f"incompatible signature configuration:\n  stored:  "
                    f"{json.dumps(stored)}\n  current: {json.dumps(meta)}\n"
                    "Resuming would silently collapse cross-batch recall "
                    "to exact-hash only. Wipe the state dir or restore the "
                    "original config."
                )
            return
        if os.path.isdir(sig_path):
            import sys

            print(f"frizbee: unstamped streaming state at {state_dir} "
                  "(written before config stamping) — cannot verify the "
                  "signature family matches", file=sys.stderr)
        os.makedirs(state_dir, exist_ok=True)
        with open(meta_path, "w") as f:
            json.dump(meta, f)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        from ..util import release_tracked

        if batch_df.isEmpty():
            return
        _check_or_stamp_family()
        try:
            _process_batch_inner(batch_df, batch_id)
        finally:
            # verify_pairs persists its tag table per call; a stream runs
            # this every micro-batch, so without a per-batch release the
            # CacheManager grows unboundedly for the stream's lifetime
            release_tracked()

    def _process_batch_inner(batch_df: DataFrame, batch_id: int) -> None:
        s = spark
        new_docs = with_doc_id(normalize_text(batch_df, "text"), "url").select(
            "doc_id", "url", "norm_text"
        )
        existing = _read_state(s, sig_path, batch_id)
        new_sigs, cand, all_sigs = incremental_dedup_batch(new_docs, existing, cfg)

        old_docs = _read_state(s, docs_path, batch_id)
        lookup = new_docs.select("doc_id", "norm_text")
        if old_docs is not None:
            lookup = lookup.unionByName(old_docs.select("doc_id", "norm_text"))
        edges = verify_increment(cand, lookup, all_sigs, cfg)

        # idempotent per-batch overwrites (replay-safe, see docstring)
        sub = f"batch_id={batch_id}"
        edges.write.mode("overwrite").parquet(os.path.join(edges_path, sub))
        new_sigs.write.mode("overwrite").parquet(os.path.join(sig_path, sub))
        new_docs.select("doc_id", "norm_text").write.mode("overwrite").parquet(
            os.path.join(docs_path, sub)
        )

    return process_batch


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

    Returns the StreamingQuery. State tables (each a dir of per-batch
    partitions ``batch_id=N``):
      state_dir/signatures   cumulative signature index
      state_dir/docs         cumulative (doc_id, norm_text) lookup
      state_dir/edges        cumulative verified duplicate edges

    Idempotency: ``foreachBatch`` is at-least-once, so every state write
    goes to a per-batch subdirectory with mode=overwrite keyed by the
    stable ``batch_id`` — a crash mid-batch or a batch replay rewrites the
    same subdirectories instead of appending duplicate rows. Reads of
    prior state exclude the current batch_id, so a replay never sees its
    own half-written first attempt. (On Iceberg this maps to
    overwrite-by-filter commits keyed on a batch_id column.)
    """
    import os

    schema = "url string, warc_ts timestamp, html binary, text string, lang string"
    stream = spark.readStream.schema(schema).parquet(input_path)

    process_batch = make_batch_processor(spark, state_dir, cfg)

    q = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation",
                checkpoint_dir or os.path.join(state_dir, "_stream_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    return q
