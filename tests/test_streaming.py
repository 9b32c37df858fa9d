"""Incremental + streaming dedup tests: the delta step must find
new-vs-new and new-vs-existing duplicates without recomputing
existing-vs-existing (the reference's incremental-matcher property,
/root/reference/src/incremental/matcher.rs:89-118)."""

import os

import pytest
from pyspark.sql import functions as F

from frizbee_spark.operators.dedup import DEFAULT_DEDUP, compute_signatures
from frizbee_spark.streaming.incremental import (
    incremental_dedup_batch,
    verify_increment,
)

TEXT_A = "the quick brown fox jumps over the lazy dog and keeps running " * 20
TEXT_B = "a completely different document about spark shuffles and joins " * 20
TEXT_C = "unrelated third content with nothing shared across the corpus here " * 20


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, norm_text string")


@pytest.mark.spark
class TestIncrementalBatch:
    def test_new_vs_new_and_new_vs_old(self, spark):
        old = _docs(spark, [(1, TEXT_A), (2, TEXT_B)])
        old_sigs = compute_signatures(old, DEFAULT_DEDUP)
        # increment: near-dup of old doc 1, exact dup of new doc 3, fresh doc
        near_a = TEXT_A.replace("lazy", "sleepy", 2)
        new = _docs(spark, [(3, near_a), (4, near_a), (5, TEXT_C)])
        new_sigs, cand, all_sigs = incremental_dedup_batch(new, old_sigs)
        lookup = old.unionByName(new)
        edges = {(r["a"], r["b"]) for r in
                 verify_increment(cand, lookup, all_sigs).collect()}
        assert (3, 4) in edges          # new-vs-new exact
        assert (1, 3) in edges or (1, 4) in edges  # new-vs-old near-dup
        assert not any({a, b} <= {1, 2} for a, b in edges)  # no old-vs-old

    def test_no_existing_state(self, spark):
        new = _docs(spark, [(1, TEXT_A), (2, TEXT_A), (3, TEXT_B)])
        new_sigs, cand, all_sigs = incremental_dedup_batch(new, None)
        edges = {(r["a"], r["b"]) for r in
                 verify_increment(cand, new, all_sigs).collect()}
        assert (1, 2) in edges
        assert (1, 3) not in edges


@pytest.mark.spark
class TestStream:
    def test_two_microbatches_accumulate_state(self, spark, tmp_path):
        from frizbee_spark.streaming.incremental import dedup_stream

        inp = str(tmp_path / "in")
        state = str(tmp_path / "state")
        os.makedirs(inp)

        def write_batch(rows, name):
            df = spark.createDataFrame(
                rows, "url string, warc_ts timestamp, html binary, text string, lang string"
            )
            df.coalesce(1).write.mode("append").parquet(inp)

        import datetime

        ts = datetime.datetime(2025, 1, 1)
        write_batch([("u1", ts, None, TEXT_A, "en"), ("u2", ts, None, TEXT_B, "en")], "b1")
        q = dedup_stream(spark, inp, state)
        q.awaitTermination(120)

        # second increment: near-dup of u1 arrives later
        write_batch([("u3", ts, None, TEXT_A.replace("dog", "cat", 3), "en")], "b2")
        q2 = dedup_stream(spark, inp, state)
        q2.awaitTermination(120)

        edges = spark.read.parquet(os.path.join(state, "edges"))
        ids = spark.read.parquet(os.path.join(state, "docs"))
        assert ids.count() == 3
        # u1-u3 duplicate found across micro-batches (new-vs-existing)
        u = {r["url"]: r["doc_id"] for r in
             spark.read.parquet(os.path.join(state, "docs"))
             .join(ids.select("doc_id"), "doc_id").select("url", "doc_id")
             .collect()} if "url" in ids.columns else None
        assert edges.count() >= 1

    def test_batch_replay_is_idempotent(self, spark, tmp_path):
        # foreachBatch is at-least-once: replaying a batch_id (same or
        # different content order) must overwrite, never append
        from frizbee_spark.streaming.incremental import make_batch_processor

        import datetime

        ts = datetime.datetime(2025, 1, 1)
        state = str(tmp_path / "state")
        proc = make_batch_processor(spark, state)
        b0 = spark.createDataFrame(
            [("u1", ts, None, TEXT_A, "en"), ("u2", ts, None, TEXT_A, "en")],
            "url string, warc_ts timestamp, html binary, text string, lang string",
        )
        # u3 is a cross-batch dup of u1: an out-of-order replay of batch 0
        # that could see batch 1's state would re-discover the u1-u3 edge
        # under batch_id=0 and double-count it
        b1 = spark.createDataFrame(
            [("u3", ts, None, TEXT_A, "en"), ("u4", ts, None, TEXT_B, "en")],
            "url string, warc_ts timestamp, html binary, text string, lang string",
        )
        proc(b0, 0)
        proc(b1, 1)

        def counts():
            return tuple(
                spark.read.parquet(os.path.join(state, t)).count()
                for t in ("docs", "signatures", "edges")
            )

        once = counts()
        proc(b0, 0)  # crash-replay of batch 0 after batch 1 committed
        proc(b1, 1)  # and of batch 1
        assert counts() == once
        edge_rows = spark.read.parquet(os.path.join(state, "edges")).collect()
        edges = {(r["a"], r["b"]) for r in edge_rows}
        assert len(edge_rows) == len(edges)  # no pair appears twice
        assert len(edges) >= 2  # u1-u2 (in-batch) and u1/u2-u3 (cross-batch)

    def test_replay_ignores_own_half_written_state(self, spark, tmp_path):
        # a replay must not read its own first attempt's partial output
        from frizbee_spark.streaming.incremental import make_batch_processor

        import datetime

        ts = datetime.datetime(2025, 1, 1)
        state = str(tmp_path / "state")
        proc = make_batch_processor(spark, state)
        b0 = spark.createDataFrame(
            [("u1", ts, None, TEXT_A, "en")],
            "url string, warc_ts timestamp, html binary, text string, lang string",
        )
        proc(b0, 0)
        # simulate the crash: batch 0's signature dir exists but is
        # uncommitted (no _SUCCESS) when batch 0 re-runs
        os.remove(os.path.join(state, "signatures", "batch_id=0", "_SUCCESS"))
        proc(b0, 0)
        sigs = spark.read.parquet(os.path.join(state, "signatures"))
        assert sigs.count() == 1  # one doc, one signature row, no dupes
