"""End-to-end pipeline tests on the deterministic synthetic corpus:
recall vs brute-force ground truth, byte-identity invariant, resume
equivalence, salting equivalence. The corpus scale is small (pytest
budget) — bench.py exercises sf-scale runs.
"""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from frizbee_spark.operators.dedup import (
    DedupConfig,
    compute_signatures,
    extract_text,
    normalize_text,
    pairs_from_buckets,
    verify_pairs,
    with_doc_id,
)
from frizbee_spark.pipeline import NearDupPipeline, PipelineConfig
from frizbee_spark.sources.corpus import write_corpus

N_DOCS = 400


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("corpus"))
    write_corpus(d, N_DOCS)
    return d


@pytest.fixture(scope="module")
def result(spark, corpus_dir, tmp_path_factory):
    work = str(tmp_path_factory.mktemp("work"))
    pipe = NearDupPipeline(spark, PipelineConfig(workdir=work))
    out = pipe.run(input_path=corpus_dir)
    return pipe, out, work


@pytest.mark.spark
class TestPipelineEndToEnd:
    def test_dup_pair_recall(self, spark, corpus_dir, result):
        _, out, _ = result
        docs, clus = out["documents"], out["clusters"]
        truth = spark.read.parquet(os.path.join(corpus_dir, "truth_pairs.parquet"))
        url2c = docs.select("url", "doc_id").join(clus, "doc_id").select("url", "cluster_id")
        t = (
            truth.filter(F.col("kind").isin("exact", "near"))
            .join(url2c.withColumnsRenamed({"url": "a_url", "cluster_id": "ca"}), "a_url")
            .join(url2c.withColumnsRenamed({"url": "b_url", "cluster_id": "cb"}), "b_url")
        )
        tot = t.count()
        hit = t.filter("ca = cb").count()
        assert tot > 30
        assert hit / tot >= 0.99, f"dup-pair recall {hit}/{tot}"

    def test_no_false_merges_of_unique_docs(self, spark, corpus_dir, result):
        """Precision guard: two 'unique'-class docs never share a cluster
        (they may legitimately cluster with their own dups)."""
        _, out, _ = result
        from frizbee_spark.sources.corpus import CLASS_UNIQUE, class_of

        docs, clus = out["documents"], out["clusters"]
        truth_c = spark.read.parquet(os.path.join(corpus_dir, "truth_clusters.parquet"))
        joined = (
            docs.select("url", "doc_id").join(clus, "doc_id")
            .join(truth_c.withColumnRenamed("cluster_id", "truth_cluster"), "url")
        )
        rows = joined.collect()
        # within each predicted cluster, all members must share one truth cluster
        by_pred = {}
        for r in rows:
            by_pred.setdefault(r["cluster_id"], set()).add(r["truth_cluster"])
        # boilerplate/span docs may merge across truth clusters by design;
        # restrict the check to clusters made only of exact/near/unique docs.
        # class_of is keyed on *generation* row order — read it from the
        # source parquet (the pipeline output is repartitioned).
        src = spark.read.parquet(os.path.join(corpus_dir, "documents.parquet"))
        order = [r["url"] for r in src.collect()]
        row_of = {u: i for i, u in enumerate(order)}
        for pred, truths in by_pred.items():
            members = [r["url"] for r in rows if r["cluster_id"] == pred]
            kinds = {class_of(row_of[u]) for u in members}
            if kinds <= {"unique", "exact", "near"}:
                assert len(truths) == 1, f"false merge in cluster {pred}: {members}"

    def test_byte_identity_through_pipeline(self, spark, corpus_dir, result):
        _, out, _ = result
        src = spark.read.parquet(os.path.join(corpus_dir, "documents.parquet"))
        ext = extract_text(src).select("url", "extracted_text")
        bad = ext.join(src.select("url", "text"), "url").filter(
            F.col("extracted_text") != F.col("text")
        )
        assert bad.count() == 0
        # and the checkpointed documents table preserves original text
        chk = out["documents"].select("url", "text").join(
            src.select("url", F.col("text").alias("src_text")), "url"
        )
        assert chk.filter(F.col("text") != F.col("src_text")).count() == 0

    def test_exact_pairs_verified_via_hash_gate(self, result):
        _, out, _ = result
        exact = out["verified"].filter("exact").count()
        assert exact > 10  # exact dups resolve without SW (hash gate)

    def test_span_recall(self, spark, corpus_dir, result):
        _, out, _ = result
        docs = out["documents"]
        truth = spark.read.parquet(os.path.join(corpus_dir, "truth_pairs.parquet"))
        spans = truth.filter("kind = 'span'")
        sp = (
            spans.join(docs.select(F.col("url").alias("a_url"),
                                   F.col("doc_id").alias("da")), "a_url")
            .join(docs.select(F.col("url").alias("b_url"),
                              F.col("doc_id").alias("db")), "b_url")
            .withColumn("a", F.least("da", "db"))
            .withColumn("b", F.greatest("da", "db"))
            .select("a", "b")
        )
        tot = sp.count()
        hit = sp.join(out["span_pairs"], ["a", "b"]).count()
        assert tot > 5
        assert hit / tot >= 0.95, f"span recall {hit}/{tot}"

    def test_metrics_and_lineage_written(self, result):
        pipe, _, work = result
        m = pipe.metrics().toPandas()
        assert set(m["stage"]) >= {"documents", "signatures", "candidates",
                                   "verified", "clusters"}
        lin = pipe.lineage().toPandas()
        assert {"stage", "partition_id", "rows_out"} <= set(lin.columns)
        assert (lin["rows_out"] > 0).any()

    def test_resume_identical_clusters(self, spark, corpus_dir, result, tmp_path):
        pipe, out, work = result
        before = sorted(map(tuple, out["clusters"].collect()))
        # work on a copy so the shared fixture's checkpoints stay intact
        work2 = str(tmp_path / "resume_work")
        shutil.copytree(work, work2)
        pipe2 = NearDupPipeline(spark, PipelineConfig(workdir=work2))
        # wipe everything after signatures: simulate a mid-run kill
        for st in ["candidates", "span_pairs", "verified", "edges",
                   "clusters", "canonical"]:
            pipe2.store.invalidate(st)
        out2 = pipe2.run(input_path=corpus_dir)
        after = sorted(map(tuple, out2["clusters"].collect()))
        assert before == after

    def test_canonical_one_per_cluster(self, result):
        _, out, _ = result
        canon = out["canonical"]
        n_clusters = out["clusters"].select("cluster_id").distinct().count()
        assert canon.count() == n_clusters
        assert canon.select("cluster_id").distinct().count() == n_clusters


@pytest.mark.spark
class TestPairsFromBuckets:
    def test_dense_bucket_all_pairs(self, spark):
        rows = [(1, i) for i in range(5)]
        df = spark.createDataFrame(rows, "bkt long, doc_id long")
        got = sorted(map(tuple, pairs_from_buckets(df, ["bkt"]).collect()))
        import itertools

        want = sorted(itertools.combinations(range(5), 2))
        assert got == [tuple(p) for p in want]

    def test_large_bucket_linear_and_connected(self, spark):
        cfg = DedupConfig(dense_cap=8)
        rows = [(1, i) for i in range(50)]
        df = spark.createDataFrame(rows, "bkt long, doc_id long")
        got = pairs_from_buckets(df, ["bkt"], cfg).collect()
        assert len(got) <= 2 * 50  # linear, not quadratic
        # connectivity: union-find over emitted edges joins all 50
        parent = list(range(50))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in got:
            parent[find(int(r["b"]))] = find(int(r["a"]))
        assert len({find(i) for i in range(50)}) == 1

    def test_hot_bucket_segment_flush_stays_connected(self, spark):
        # a bucket larger than 4*salt_threshold spans many Arrow batches
        # and is emitted in linked segments (bounded carry); the union of
        # segment edges must still connect the whole bucket, linearly
        cfg = DedupConfig(dense_cap=8, salt_threshold=100, n_salt=4)
        n = 3000  # > 4 * 100 flush cap, > maxRecordsPerBatch
        rows = [(1, i) for i in range(n)]
        df = spark.createDataFrame(rows, "bkt long, doc_id long")
        got = pairs_from_buckets(df, ["bkt"], cfg).collect()
        assert len(got) <= 4 * n  # linear-ish, never quadratic
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in got:
            parent[find(int(r["b"]))] = find(int(r["a"]))
        assert len({find(i) for i in range(n)}) == 1

    def test_salted_bucket_stays_connected(self, spark):
        cfg = DedupConfig(dense_cap=8, salt_threshold=20, n_salt=4)
        rows = [(1, i) for i in range(200)] + [(2, 1000 + i) for i in range(3)]
        df = spark.createDataFrame(rows, "bkt long, doc_id long")
        got = pairs_from_buckets(df, ["bkt"], cfg).collect()
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent.setdefault(parent[x], parent[x])
                x = parent[x]
            return x

        for r in got:
            a, b = int(r["a"]), int(r["b"])
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            parent[find(b)] = find(a)
        comps = {find(x) for x in list(parent)}
        assert len({find(i) for i in range(200)}) == 1
        assert len({find(1000 + i) for i in range(3)}) == 1
        # the two buckets remain separate components
        assert find(0) != find(1000)

    def test_singleton_buckets_emit_nothing(self, spark):
        df = spark.createDataFrame([(i, i) for i in range(10)], "bkt long, doc_id long")
        assert pairs_from_buckets(df, ["bkt"]).count() == 0


@pytest.mark.spark
class TestVerify:
    def test_verify_scores_and_exact(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over the lazy dog " * 10),
                (2, "the quick brown fox jumps over the lazy dog " * 10),
                (3, "the quick brown fox jumps over the lazy cat " * 10),
                (4, "completely different content that shares nothing at all " * 8),
            ],
            "doc_id long, norm_text string",
        )
        pairs = spark.createDataFrame([(1, 2), (1, 3), (1, 4)], "a long, b long")
        got = {(r["a"], r["b"]): r for r in verify_pairs(pairs, docs).collect()}
        assert got[(1, 2)]["exact"] and got[(1, 2)]["similarity"] == 1.0
        assert not got[(1, 3)]["exact"]
        assert got[(1, 3)]["similarity"] > 0.9 and got[(1, 3)]["verified"]
        assert got[(1, 4)]["similarity"] < 0.5 and not got[(1, 4)]["verified"]


@pytest.mark.spark
class TestExplainPair:
    def test_explain_near_dup(self, spark):
        from frizbee_spark.operators.dedup import explain_pair

        docs = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over the lazy dog"),
                (2, "the quick brown fox jumps over the lazy cat"),
                (3, "unrelated content entirely different words here"),
            ],
            "doc_id long, norm_text string",
        )
        ex = explain_pair(docs, 1, 2)
        assert ex["verified"] and not ex["exact"]
        assert 0.8 < ex["similarity"] < 1.0
        assert len(ex["indices"]) >= 40  # most of doc_a aligns inside doc_b
        bad = explain_pair(docs, 1, 3)
        assert not bad["verified"] and bad["similarity"] < 0.5

    def test_explain_missing_id_raises(self, spark):
        from frizbee_spark.operators.dedup import explain_pair

        docs = spark.createDataFrame([(1, "abc")], "doc_id long, norm_text string")
        with pytest.raises(KeyError):
            explain_pair(docs, 1, 99)


@pytest.mark.spark
class TestSpanConfirmation:
    def test_true_spans_confirmed(self, spark, corpus_dir, result):
        _, out, _ = result
        sp = out["span_pairs"].toPandas()
        assert "span_confirmed" in sp.columns
        assert sp["span_confirmed"].all()  # winnow candidates are real spans


class TestBucketPairsKernel:
    """Pure-kernel checks for the vectorized pair generator."""

    def test_dense_all_pairs_multi_bucket(self):
        import itertools
        import numpy as np
        from frizbee_spark.operators.dedup import DedupConfig, _bucket_pairs_kernel

        cfg = DedupConfig()
        flat = np.array([1, 5, 9, 20, 21, 30, 31, 32, 33], dtype=np.int64)
        sizes = np.array([3, 2, 4], dtype=np.int64)
        a, b = _bucket_pairs_kernel(flat, sizes, cfg)
        got = sorted(zip(a.tolist(), b.tolist()))
        want = sorted(
            list(itertools.combinations([1, 5, 9], 2))
            + [(20, 21)]
            + list(itertools.combinations([30, 31, 32, 33], 2))
        )
        assert got == want

    def test_big_bucket_linear_connected(self):
        import numpy as np
        from frizbee_spark.operators.dedup import DedupConfig, _bucket_pairs_kernel

        cfg = DedupConfig(dense_cap=8, salt_threshold=50, n_salt=4)
        flat = np.arange(100, dtype=np.int64)
        a, b = _bucket_pairs_kernel(flat, np.array([100]), cfg)
        assert a.size <= 2 * 100  # linear
        parent = list(range(100))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for x, y in zip(a.tolist(), b.tolist()):
            parent[find(y)] = find(x)
        assert len({find(i) for i in range(100)}) == 1

    def test_singletons_emit_nothing(self):
        import numpy as np
        from frizbee_spark.operators.dedup import DEFAULT_DEDUP, _bucket_pairs_kernel

        a, b = _bucket_pairs_kernel(
            np.array([1, 2, 3], dtype=np.int64), np.array([1, 1, 1]), DEFAULT_DEDUP
        )
        assert a.size == 0


@pytest.mark.spark
class TestSimhashChunkKeys:
    def test_sign_bit_pair_shares_chunk0_bucket(self, spark):
        # regression: `% 65536` followed the dividend's sign, so a pair
        # sharing low 16 bits but differing in bit 63 (chunk 3) lost its
        # only pigeonhole-equal chunk-0 bucket and was silently dropped
        from frizbee_spark.operators.dedup import simhash_pairs

        a = 0x1234  # chunks 1..3 zero, low16 = 0x1234
        b_u = a ^ (1 << 63) ^ (1 << 20) ^ (1 << 40)  # Hamming 3, chunk 0 equal
        b = b_u - (1 << 64) if b_u >= (1 << 63) else b_u
        sigs = spark.createDataFrame(
            [(1, a), (2, b)], "doc_id long, simhash long"
        )
        got = {(r["a"], r["b"]) for r in simhash_pairs(sigs).collect()}
        assert (1, 2) in got


@pytest.mark.spark
class TestSpanExtents:
    """r3: the shared-boilerplate block report (witness gram extended to
    its maximal byte-identical extent, JVM binary search)."""

    def test_planted_block_offsets_exact(self, spark):
        from frizbee_spark.operators.dedup import (
            DedupConfig, normalize_text, span_extents,
        )

        block = ("quick brown foxes jump over lazy dogs tonight " * 8).strip()
        ta = "alpha beta gamma delta " * 4 + block + " omega psi chi phi"
        tb = "one two three four five " * 4 + block + " nine eight seven"
        docs = normalize_text(spark.createDataFrame(
            [(1, ta), (2, tb)], "doc_id long, text string"
        ))
        cfg = DedupConfig(span_min_len=100, span_shingle_k=24, winnow_window=8)
        [row] = span_extents(docs, cfg).collect()
        nt = {r["doc_id"]: r["norm_text"] for r in docs.collect()}
        exp = " " + block + " "  # both flanking spaces are shared too
        assert row["span_len"] == len(exp)
        a0, b0, ln = row["a_start"], row["b_start"], row["span_len"]
        assert nt[1][a0:a0 + ln] == exp
        assert nt[2][b0:b0 + ln] == exp
        # maximality: the bytes just outside the block differ
        assert nt[1][a0 - 1] != nt[2][b0 - 1]
        assert nt[1][a0 + ln] != nt[2][b0 + ln]

    def test_property_fuzz_vs_bruteforce(self, spark):
        """500 planted shared blocks — random position, length,
        multiplicity (3-doc groups, double-block pairs) and doc-boundary
        edge cases (block at offset 0, block at doc end, block == whole
        doc): span_extents' (a_start, b_start, span_len) must EQUAL a
        brute-force byte-scan maximal extension of the witness offsets
        winnow_span_pairs reports (VERDICT r3 item 7). Seeded rng —
        fully deterministic."""
        import numpy as np

        from frizbee_spark.operators.dedup import (
            DedupConfig, span_extents, winnow_span_pairs,
        )

        rng = np.random.default_rng(20260818)
        AB = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz", dtype=np.uint8)

        def rand_text(n):
            return bytes(AB[rng.integers(0, 26, int(n))]).decode()

        docs: dict[int, str] = {}
        planted: set[tuple[int, int]] = set()
        nid = 0

        def new_doc(text):
            nonlocal nid
            nid += 1
            docs[nid] = text
            return nid

        def embed(block, kind):
            # boundary-position edge cases are forced, not sampled
            pre = 0 if kind in ("start", "exact") else int(rng.integers(1, 200))
            post = 0 if kind in ("end", "exact") else int(rng.integers(1, 200))
            return rand_text(pre) + block + rand_text(post)

        KINDS = ["start", "end", "exact", "mid", "mid"]
        # 400 simple pairs, all kind combinations cycled through
        for i in range(400):
            blk = rand_text(rng.integers(100, 300))
            a = new_doc(embed(blk, KINDS[i % 5]))
            b = new_doc(embed(blk, KINDS[(i // 5) % 5]))
            planted.add((min(a, b), max(a, b)))
        # 50 multiplicity-3 groups -> complete pair set per group
        for _ in range(50):
            blk = rand_text(rng.integers(120, 300))
            ids = sorted(new_doc(embed(blk, "mid")) for _ in range(3))
            for x in range(3):
                for y in range(x + 1, 3):
                    planted.add((ids[x], ids[y]))
        # 50 double-block pairs: one witness is chosen; the extent must
        # be exact for whichever block that witness anchors
        for _ in range(50):
            b1, b2 = rand_text(rng.integers(100, 200)), rand_text(
                rng.integers(100, 200))
            a = new_doc(rand_text(rng.integers(1, 100)) + b1
                        + rand_text(rng.integers(30, 100)) + b2
                        + rand_text(rng.integers(1, 100)))
            b = new_doc(rand_text(rng.integers(1, 100)) + b1
                        + rand_text(rng.integers(30, 100)) + b2
                        + rand_text(rng.integers(1, 100)))
            planted.add((a, b))

        cfg = DedupConfig(span_min_len=100, span_shingle_k=24,
                          winnow_window=8)
        df = spark.createDataFrame(
            sorted(docs.items()), "doc_id long, text string")
        wp = winnow_span_pairs(df, cfg, text_col="text", keep_witness=True)
        witness = {}
        for r in wp.collect():
            assert r["span_confirmed"], (r["a"], r["b"])
            witness[(r["a"], r["b"])] = (r["a_off"], r["b_off"])
        # full recall of every planted pair, zero chance pairs
        assert set(witness) == planted

        k = cfg.span_shingle_k
        ext = span_extents(df, cfg, text_col="text", span_pairs=wp).collect()
        assert len(ext) == len(planted)
        for r in ext:
            a_b, b_b = docs[r["a"]].encode(), docs[r["b"]].encode()
            ao, bo = witness[(r["a"], r["b"])]
            left = 0
            while left < min(ao, bo) and a_b[ao - left - 1] == b_b[bo - left - 1]:
                left += 1
            right = 0
            while (ao + k + right < len(a_b) and bo + k + right < len(b_b)
                   and a_b[ao + k + right] == b_b[bo + k + right]):
                right += 1
            assert (r["a_start"], r["b_start"], r["span_len"]) == (
                ao - left, bo - left, left + k + right), (r["a"], r["b"])
            # and the reported block really is byte-identical
            s = r["span_len"]
            assert a_b[r["a_start"]:r["a_start"] + s] == \
                b_b[r["b_start"]:r["b_start"] + s]

    def test_pipeline_span_report_on_corpus(self, result):
        _, out, _ = result
        rep = out["span_report"].toPandas()
        assert len(rep) > 5
        # every reported block contains at least the witness gram
        assert (rep["span_len"] >= 48).all()
        # the corpus's span class copies >= ~2000-char spans: the report
        # must recover at least one long block
        assert rep["span_len"].max() >= 1500


@pytest.mark.spark
class TestMinhashJaccardEstimate:
    def test_exact_dup_estimates_one(self, spark):
        from frizbee_spark.operators.dedup import (
            DedupConfig, compute_signatures, minhash_jaccard_estimate,
            normalize_text,
        )

        base = "the quick brown fox jumps over the lazy dog " * 6
        near = base.replace("lazy", "hazy")
        docs = normalize_text(spark.createDataFrame(
            [(1, base), (2, base), (3, near)],
            "doc_id long, text string",
        ))
        cfg = DedupConfig()
        sigs = compute_signatures(docs, cfg, keep_minhash=True)
        got = {(r["a"], r["b"]): r["est_jaccard"]
               for r in minhash_jaccard_estimate(sigs, cfg).collect()}
        # byte-identical docs agree on every OPH slot
        assert got[(1, 2)] == pytest.approx(1.0)
        # one-word edit: high but sub-1 estimate, near the exact k-gram
        # Jaccard (binomial over 128 slots -> +-3 sigma ~ 0.13)
        if (1, 3) in got:
            assert 0.5 < got[(1, 3)] < 1.0

    def test_estimate_tracks_exact_jaccard(self, spark):
        from frizbee_spark.functions.hashing import char_shingle_hashes, concat_docs
        from frizbee_spark.operators.dedup import (
            DedupConfig, compute_signatures, minhash_jaccard_estimate,
            normalize_text,
        )
        import numpy as np

        a = " ".join(f"w{i:03d}" for i in range(120))
        b = " ".join(f"w{i:03d}" for i in range(20, 140))  # heavy overlap
        docs = normalize_text(spark.createDataFrame(
            [(1, a), (2, b)], "doc_id long, text string"))
        cfg = DedupConfig()
        sigs = compute_signatures(docs, cfg, keep_minhash=True)
        rows = minhash_jaccard_estimate(sigs, cfg).collect()
        assert len(rows) == 1
        est = rows[0]["est_jaccard"]
        # exact k-gram Jaccard via the same shingle kernel
        buf, starts = concat_docs(
            [t.encode() for t in (a.lower(), b.lower())], min_len=cfg.shingle_k)
        sh, sst = char_shingle_hashes(buf, starts, cfg.shingle_k)
        sa = set(np.asarray(sh[sst[0]:sst[1]]).tolist())
        sb = set(np.asarray(sh[sst[1]:sst[2]]).tolist())
        exact = len(sa & sb) / len(sa | sb)
        assert abs(est - exact) < 0.15  # 3.4 sigma at num_perm=128


@pytest.mark.spark
class TestFilterGate:
    """Opt-in corpus_filter gate before dedup (enable_filter)."""

    @pytest.fixture(scope="class")
    def gated(self, spark, corpus_dir, tmp_path_factory):
        import duckdb

        # pick min_chars at the corpus median so the gate provably splits
        med = duckdb.sql(
            f"SELECT median(length(text))::INT FROM "
            f"'{corpus_dir}/documents.parquet'"
        ).fetchone()[0]
        work = str(tmp_path_factory.mktemp("work_gated"))
        opts = {"min_chars": int(med), "require_lang_signal": False}
        pipe = NearDupPipeline(spark, PipelineConfig(
            workdir=work, enable_filter=True, filter_opts=opts))
        out = pipe.run(input_path=corpus_dir, until="clusters")
        return work, opts, out

    def test_gate_splits_and_downstream_sees_only_kept(self, gated):
        _, _, out = gated
        dec = out["filter"]
        total = dec.count()
        kept = {r["doc_id"] for r in
                dec.filter("keep").select("doc_id").collect()}
        assert total == N_DOCS
        assert 0 < len(kept) < total  # non-vacuous split
        clustered = {r["doc_id"] for r in
                     out["clusters"].select("doc_id").collect()}
        assert clustered == kept  # every kept doc clustered, no dropped doc

    def test_toggle_fails_resume_loudly(self, spark, corpus_dir, gated):
        work, _, _ = gated
        # same workdir, gate now OFF: the signatures checkpoint was
        # stamped with the gate identity -> resume must refuse, not
        # silently mix doc sets
        pipe = NearDupPipeline(spark, PipelineConfig(workdir=work))
        with pytest.raises(RuntimeError, match="incompatible configuration"):
            pipe.run(input_path=corpus_dir, until="signatures")

    def test_until_filter_requires_gate(self, spark, corpus_dir,
                                        tmp_path_factory):
        # until="filter" with the gate OFF used to return silently with
        # no 'filter' key (ADVICE r3) — must raise instead
        work = str(tmp_path_factory.mktemp("work_nofilter"))
        pipe = NearDupPipeline(spark, PipelineConfig(workdir=work))
        with pytest.raises(ValueError, match="enable_filter"):
            pipe.run(input_path=corpus_dir, until="filter")

    def test_gate_html_only_source_uses_norm_text(self, spark, corpus_dir,
                                                  tmp_path_factory):
        # an html-only source has no raw 'text' column after the
        # documents checkpoint — the gate must fall back to norm_text
        # (the text dedup actually consumes) instead of erroring on an
        # unresolved column (ADVICE r3)
        src = spark.read.parquet(
            os.path.join(corpus_dir, "documents.parquet")).drop("text")
        work = str(tmp_path_factory.mktemp("work_htmlonly"))
        pipe = NearDupPipeline(spark, PipelineConfig(
            workdir=work, enable_filter=True,
            filter_opts={"min_chars": 1, "require_lang_signal": False}))
        out = pipe.run(docs=src, until="filter")
        dec = out["filter"]
        assert "text" not in out["documents"].columns  # premise holds
        assert dec.count() == N_DOCS
        assert dec.filter("keep").count() > 0

    def test_gate_off_unstamped_compat(self, spark, corpus_dir,
                                       tmp_path_factory):
        # gate-off stamps stay byte-identical to pre-gate checkpoints:
        # a fresh off-run resumes its own workdir without error
        work = str(tmp_path_factory.mktemp("work_offoff"))
        cfg = PipelineConfig(workdir=work)
        NearDupPipeline(spark, cfg).run(input_path=corpus_dir,
                                        until="signatures")
        out = NearDupPipeline(spark, cfg).run(input_path=corpus_dir,
                                              until="signatures")
        assert out["signatures"].count() > 0


class TestUrlDedupGate:
    """Opt-in URL-variant collapse before any content stage
    (enable_url_dedup): one doc per canonical URL survives, earliest
    warc_ts wins."""

    @pytest.fixture(scope="class")
    def crawl(self, spark, corpus_dir):
        # recrawl 10 pages under tracking-param url variants, one hour
        # later: the canonicalizer must collapse each onto its original
        src = spark.read.parquet(os.path.join(corpus_dir, "documents.parquet"))
        variants = (
            src.orderBy("url").limit(10)
            .withColumn("url", F.concat(F.col("url"),
                                        F.lit("?utm_source=recrawl&fbclid=z")))
            .withColumn("warc_ts",
                        F.col("warc_ts") + F.expr("INTERVAL 1 HOUR"))
        )
        return src.unionByName(variants)

    @pytest.fixture(scope="class")
    def gated(self, spark, crawl, tmp_path_factory):
        work = str(tmp_path_factory.mktemp("work_urlgate"))
        pipe = NearDupPipeline(spark, PipelineConfig(
            workdir=work, enable_url_dedup=True))
        out = pipe.run(docs=crawl, until="clusters")
        return work, out

    def test_variants_collapse_first_capture_wins(self, spark, crawl, gated):
        _, out = gated
        ud = out["url_dedup"]
        assert ud.count() == N_DOCS + 10
        kept = ud.filter("keep")
        assert kept.count() == N_DOCS
        # the winners are the ORIGINAL (earlier-warc_ts) rows: no kept
        # url carries the recrawl decoration
        orig_ids = {
            r["doc_id"]
            for r in crawl.filter(~F.col("url").contains("utm_source"))
            .select(F.xxhash64("url").alias("doc_id")).collect()
        }
        assert {r["doc_id"] for r in kept.collect()} <= orig_ids
        # downstream content stages see only the collapsed set
        clustered = {r["doc_id"] for r in out["clusters"].select("doc_id").collect()}
        assert clustered == {r["doc_id"] for r in kept.collect()}

    def test_toggle_fails_resume_loudly(self, spark, crawl, gated):
        work, _ = gated
        pipe = NearDupPipeline(spark, PipelineConfig(workdir=work))
        with pytest.raises(RuntimeError, match="incompatible configuration"):
            pipe.run(docs=crawl, until="signatures")

    def test_until_requires_gate(self, spark, corpus_dir, tmp_path_factory):
        work = str(tmp_path_factory.mktemp("work_nourl"))
        pipe = NearDupPipeline(spark, PipelineConfig(workdir=work))
        with pytest.raises(ValueError, match="enable_url_dedup"):
            pipe.run(input_path=corpus_dir, until="url_dedup")

    def test_urlless_source_raises(self, spark, corpus_dir,
                                   tmp_path_factory):
        src = (
            spark.read.parquet(os.path.join(corpus_dir, "documents.parquet"))
            .withColumn("doc_id", F.xxhash64("url"))
            .drop("url")
        )
        work = str(tmp_path_factory.mktemp("work_urlless"))
        pipe = NearDupPipeline(spark, PipelineConfig(
            workdir=work, enable_url_dedup=True))
        with pytest.raises(ValueError, match="'url' column"):
            pipe.run(docs=src, until="url_dedup")


class TestDomainCapGate:
    """Opt-in per-domain cap after the URL collapse (domain_cap_n)."""

    def test_cap_binds_and_downstream_sees_capped_set(self, spark, corpus_dir,
                                                      tmp_path_factory):
        import duckdb

        # pick a cap below the hottest zipf site's doc count so it binds
        hot = duckdb.sql(
            f"SELECT count(*) FROM '{corpus_dir}/documents.parquet' "
            "GROUP BY regexp_extract(url, '://([^/]*)', 1) "
            "ORDER BY 1 DESC LIMIT 1"
        ).fetchone()[0]
        assert hot > 5  # fixture premise: zipf makes a hot site
        work = str(tmp_path_factory.mktemp("work_domcap"))
        pipe = NearDupPipeline(spark, PipelineConfig(
            workdir=work, domain_cap_n=5))
        out = pipe.run(input_path=corpus_dir, until="clusters")
        dc = out["domain_cap"]
        kept = {r["doc_id"] for r in dc.select("doc_id").collect()}
        assert len(kept) < N_DOCS  # the cap actually bound
        per_host = {r["host"]: r["n"] for r in
                    dc.groupBy("host").agg(F.count("*").alias("n")).collect()}
        assert max(per_host.values()) <= 5
        clustered = {r["doc_id"] for r in out["clusters"].select("doc_id").collect()}
        assert clustered == kept

    def test_recap_fails_resume_loudly(self, spark, corpus_dir,
                                       tmp_path_factory):
        work = str(tmp_path_factory.mktemp("work_recap"))
        NearDupPipeline(spark, PipelineConfig(
            workdir=work, domain_cap_n=5)).run(
                input_path=corpus_dir, until="signatures")
        # different cap on the same workdir: stamped meta must refuse
        with pytest.raises(RuntimeError, match="incompatible configuration"):
            NearDupPipeline(spark, PipelineConfig(
                workdir=work, domain_cap_n=7)).run(
                    input_path=corpus_dir, until="signatures")

    def test_until_requires_gate(self, spark, corpus_dir, tmp_path_factory):
        work = str(tmp_path_factory.mktemp("work_nocap"))
        pipe = NearDupPipeline(spark, PipelineConfig(workdir=work))
        with pytest.raises(ValueError, match="domain_cap_n"):
            pipe.run(input_path=corpus_dir, until="domain_cap")


class TestBlocklistGate:
    """Opt-in UT1-style domain blocklist between the URL collapse and
    the domain cap (blocklist_domains): listed hosts — and their
    subdomains — drop before any content stage; editing the list fails
    resume loudly."""

    def test_blocked_host_gone_downstream(self, spark, corpus_dir,
                                          tmp_path_factory):
        # site0000.example is the zipf-hot host in the fixture corpus;
        # block it (plus a never-matching entry) and assert the gate's
        # decision table and the clustered set agree
        work = str(tmp_path_factory.mktemp("work_blgate"))
        pipe = NearDupPipeline(spark, PipelineConfig(
            workdir=work,
            blocklist_domains=["site0000.example", "no-such.invalid"]))
        out = pipe.run(input_path=corpus_dir, until="clusters")
        bld = out["blocklist"]
        dropped = {r["doc_id"] for r in bld.select("doc_id").collect()}
        assert dropped  # the hot host exists, so the gate bound
        assert {r["matched_domain"] for r in bld.collect()} \
            == {"site0000.example"}
        docs = spark.read.parquet(os.path.join(corpus_dir,
                                               "documents.parquet"))
        want = {
            r["doc_id"]
            for r in docs.filter(F.col("url").startswith(
                "https://site0000.example/"))
            .select(F.xxhash64("url").alias("doc_id")).collect()
        }
        assert dropped == want
        clustered = {r["doc_id"]
                     for r in out["clusters"].select("doc_id").collect()}
        assert clustered.isdisjoint(dropped)

    def test_list_edit_fails_resume_loudly(self, spark, corpus_dir,
                                           tmp_path_factory):
        work = str(tmp_path_factory.mktemp("work_bledit"))
        NearDupPipeline(spark, PipelineConfig(
            workdir=work, blocklist_domains=["site0000.example"])).run(
                input_path=corpus_dir, until="signatures")
        with pytest.raises(RuntimeError, match="incompatible configuration"):
            NearDupPipeline(spark, PipelineConfig(
                workdir=work,
                blocklist_domains=["site0000.example",
                                   "site0001.example"])).run(
                    input_path=corpus_dir, until="signatures")

    def test_until_requires_gate_and_urlless_raises(self, spark, corpus_dir,
                                                    tmp_path_factory):
        work = str(tmp_path_factory.mktemp("work_nobl"))
        pipe = NearDupPipeline(spark, PipelineConfig(workdir=work))
        with pytest.raises(ValueError, match="blocklist_domains"):
            pipe.run(input_path=corpus_dir, until="blocklist")
        src = (
            spark.read.parquet(os.path.join(corpus_dir, "documents.parquet"))
            .withColumn("doc_id", F.xxhash64("url"))
            .drop("url")
        )
        work2 = str(tmp_path_factory.mktemp("work_blurlless"))
        pipe2 = NearDupPipeline(spark, PipelineConfig(
            workdir=work2, blocklist_domains=["x.example"]))
        with pytest.raises(ValueError, match="'url' column"):
            pipe2.run(docs=src, until="blocklist")


class TestDecontaminateGate:
    """Opt-in Bloom-filter benchmark decontamination between the quality
    gates and the mixing sample (enable_decontaminate): fully-overlapping
    docs drop, a one-gram brush against the benchmark survives the ratio
    bound, and any re-tuning of one workdir fails its resume loudly."""

    N = 30

    @pytest.fixture(scope="class")
    def planted(self, spark, tmp_path_factory):
        def toks(i):
            if i == 25:  # shares exactly ONE 8-gram with benchmark doc 0
                return [f"d0w{j}" for j in range(8)] + [
                    f"d25w{j}" for j in range(32)]
            return [f"d{i}w{j}" for j in range(40)]

        rows = [(f"https://x.example/{i}", " ".join(toks(i)))
                for i in range(self.N)]
        docs = spark.createDataFrame(rows, "url string, text string")
        bench_dir = str(tmp_path_factory.mktemp("benchset") / "bench.parquet")
        bench_urls = [f"https://x.example/{i}" for i in range(5)]
        docs.filter(F.col("url").isin(bench_urls)).select("text") \
            .write.parquet(bench_dir)
        ids = {r["url"]: r["id"] for r in docs.select(
            "url", F.xxhash64("url").alias("id")).collect()}
        return docs, bench_dir, ids

    @pytest.fixture(scope="class")
    def gated(self, spark, planted, tmp_path_factory):
        docs, bench_dir, _ = planted
        work = str(tmp_path_factory.mktemp("work_decon"))
        cfg = PipelineConfig(
            workdir=work, enable_decontaminate=True,
            decontaminate_opts={"benchmark_path": bench_dir,
                                "max_flagged_ratio": 0.1},
        )
        out = NearDupPipeline(spark, cfg).run(docs=docs, until="signatures")
        return work, cfg, out

    def test_flagged_table_and_gating(self, spark, planted, gated):
        docs, _, ids = planted
        _, _, out = gated
        flagged = {r["doc_id"]: r for r in out["decontaminate"].collect()}
        bench_ids = {ids[f"https://x.example/{i}"] for i in range(5)}
        brush_id = ids["https://x.example/25"]
        # the 5 verbatim docs: every gram flagged, dropped
        for d in bench_ids:
            assert flagged[d]["n_flagged_grams"] == flagged[d]["n_grams"]
            assert not flagged[d]["keep"]
        # the one-gram brush: flagged but under the 0.1 bound -> kept
        assert flagged[brush_id]["n_flagged_grams"] == 1
        assert flagged[brush_id]["keep"]
        assert set(flagged) == bench_ids | {brush_id}
        # signatures exist for exactly the surviving set
        sigs = {r["doc_id"] for r in
                out["signatures"].select("doc_id").collect()}
        assert sigs == set(ids.values()) - bench_ids
        assert brush_id in sigs

    def test_retune_or_toggle_fails_resume_loudly(self, spark, planted,
                                                  gated):
        docs, bench_dir, _ = planted
        work, _, _ = gated
        # tightening the bound on a populated workdir: stage meta mismatch
        cfg_bad = PipelineConfig(
            workdir=work, enable_decontaminate=True,
            decontaminate_opts={"benchmark_path": bench_dir,
                                "max_flagged_ratio": 0.0},
        )
        with pytest.raises(RuntimeError, match="incompatible configuration"):
            NearDupPipeline(spark, cfg_bad).run(docs=docs,
                                                until="decontaminate")
        # turning the gate off: signatures meta mismatch
        with pytest.raises(RuntimeError, match="incompatible configuration"):
            NearDupPipeline(spark, PipelineConfig(workdir=work)).run(
                docs=docs, until="signatures")

    def test_gated_resume_reads_checkpoint(self, spark, planted, gated):
        docs, _, _ = planted
        work, cfg, out = gated
        pipe2 = NearDupPipeline(spark, cfg)
        out2 = pipe2.run(docs=docs, until="signatures")
        assert sorted(map(tuple, out["decontaminate"].collect())) ==             sorted(map(tuple, out2["decontaminate"].collect()))
        rows = pipe2.metrics().collect()
        assert any(r["stage"] == "decontaminate" and r["resumed"]
                   for r in rows)
        assert any(r["stage"] == "signatures" and r["resumed"] for r in rows)

    def test_until_requires_gate(self, spark, planted, tmp_path_factory):
        docs, _, _ = planted
        work = str(tmp_path_factory.mktemp("work_nodecon"))
        with pytest.raises(ValueError, match="enable_decontaminate"):
            NearDupPipeline(spark, PipelineConfig(workdir=work)).run(
                docs=docs, until="decontaminate")

    def test_missing_benchmark_path_raises(self, spark, planted,
                                           tmp_path_factory):
        docs, _, _ = planted
        work = str(tmp_path_factory.mktemp("work_nopath"))
        cfg = PipelineConfig(workdir=work, enable_decontaminate=True)
        with pytest.raises(ValueError, match="benchmark_path"):
            NearDupPipeline(spark, cfg).run(docs=docs, until="decontaminate")


class TestDsirGate:
    """Opt-in DSIR importance-weight gate (enable_dsir): docs whose
    hashed-bigram distribution is off-target score below the floor and
    drop before any signature work; re-pointing/re-tuning one workdir
    fails its resume loudly."""

    N_ON, N_JUNK = 20, 10

    @pytest.fixture(scope="class")
    def planted(self, spark, tmp_path_factory):
        vocab = [f"v{k}" for k in range(10)]

        def on_target(i):
            return " ".join(vocab[(i + j) % 10] for j in range(40))

        rows = [(f"https://x.example/on{i}", on_target(i))
                for i in range(self.N_ON)]
        rows += [(f"https://x.example/junk{i}",
                  " ".join(f"junk{i}w{j}" for j in range(40)))
                 for i in range(self.N_JUNK)]
        rows.append(("https://x.example/short", "lonely"))  # no bigrams
        docs = spark.createDataFrame(rows, "url string, text string")
        tgt_dir = str(tmp_path_factory.mktemp("dsirtgt") / "tgt.parquet")
        spark.createDataFrame(
            [(on_target(i + 3),) for i in range(10)], "text string"
        ).write.parquet(tgt_dir)
        ids = {r["url"]: r["id"] for r in docs.select(
            "url", F.xxhash64("url").alias("id")).collect()}
        return docs, tgt_dir, ids

    @pytest.fixture(scope="class")
    def gated(self, spark, planted, tmp_path_factory):
        docs, tgt_dir, _ = planted
        work = str(tmp_path_factory.mktemp("work_dsir"))
        # n_buckets=64 keeps the Laplace mass (alpha * n_buckets) small
        # next to this tiny fixture's gram totals — at the 4096 default
        # the smoothing term would dominate both multinomials and skew
        # every ratio by the corpus-size difference (a small-data
        # artifact; real corpora dwarf alpha * n_buckets)
        cfg = PipelineConfig(
            workdir=work, enable_dsir=True,
            dsir_opts={"target_path": tgt_dir, "min_avg_logratio": 0.0,
                       "n_buckets": 64},
        )
        out = NearDupPipeline(spark, cfg).run(docs=docs, until="signatures")
        return work, cfg, out

    def test_scoring_and_gating(self, spark, planted, gated):
        docs, _, ids = planted
        _, _, out = gated
        scored = {r["doc_id"]: r for r in out["dsir"].collect()}
        on_ids = {ids[f"https://x.example/on{i}"] for i in range(self.N_ON)}
        junk_ids = {ids[f"https://x.example/junk{i}"]
                    for i in range(self.N_JUNK)}
        short_id = ids["https://x.example/short"]
        # the short doc has no bigrams -> no score row -> dropped
        assert short_id not in scored
        for d in on_ids:
            assert scored[d]["keep"], scored[d]
        for d in junk_ids:
            assert not scored[d]["keep"], scored[d]
            assert scored[d]["avg_logratio"] < 0
        sigs = {r["doc_id"] for r in
                out["signatures"].select("doc_id").collect()}
        assert sigs == on_ids

    def test_retune_or_toggle_fails_resume_loudly(self, spark, planted,
                                                  gated):
        docs, tgt_dir, _ = planted
        work, _, _ = gated
        cfg_bad = PipelineConfig(
            workdir=work, enable_dsir=True,
            dsir_opts={"target_path": tgt_dir, "min_avg_logratio": 1.0},
        )
        with pytest.raises(RuntimeError, match="incompatible configuration"):
            NearDupPipeline(spark, cfg_bad).run(docs=docs, until="dsir")
        with pytest.raises(RuntimeError, match="incompatible configuration"):
            NearDupPipeline(spark, PipelineConfig(workdir=work)).run(
                docs=docs, until="signatures")

    def test_gated_resume_reads_checkpoint(self, spark, planted, gated):
        docs, _, _ = planted
        work, cfg, out = gated
        pipe2 = NearDupPipeline(spark, cfg)
        out2 = pipe2.run(docs=docs, until="signatures")
        assert sorted(map(tuple, out["dsir"].collect())) == \
            sorted(map(tuple, out2["dsir"].collect()))
        rows = pipe2.metrics().collect()
        assert any(r["stage"] == "dsir" and r["resumed"] for r in rows)

    def test_until_requires_gate_and_opts(self, spark, planted,
                                          tmp_path_factory):
        docs, tgt_dir, _ = planted
        work = str(tmp_path_factory.mktemp("work_nodsir"))
        with pytest.raises(ValueError, match="enable_dsir"):
            NearDupPipeline(spark, PipelineConfig(workdir=work)).run(
                docs=docs, until="dsir")
        with pytest.raises(ValueError, match="target_path"):
            NearDupPipeline(spark, PipelineConfig(
                workdir=work, enable_dsir=True)).run(docs=docs, until="dsir")
        with pytest.raises(ValueError, match="min_avg_logratio"):
            NearDupPipeline(spark, PipelineConfig(
                workdir=work, enable_dsir=True,
                dsir_opts={"target_path": tgt_dir})).run(
                    docs=docs, until="dsir")


class TestUnicodeNfcGate:
    """Opt-in Unicode NFC normalization of the dedup-facing text
    (unicode_nfc): canonically-equal but byte-different spellings become
    exact-hash duplicates; the raw text column stays untouched."""

    WORDS_NFC = "le caf\u00e9 touch\u00e9 r\u00e9sum\u00e9 " * 12
    WORDS_NFD = "le cafe\u0301 touche\u0301 re\u0301sume\u0301 " * 12

    @pytest.fixture(scope="class")
    def planted(self, spark):
        rows = [
            ("https://a.example/nfc", self.WORDS_NFC),
            ("https://b.example/nfd", self.WORDS_NFD),
        ] + [(f"https://f.example/{i}",
              f"filler document number {i} " + " ".join(
                  f"tok{i}w{j}" for j in range(40)))
             for i in range(8)]
        return spark.createDataFrame(rows, "url string, text string")

    @pytest.fixture(scope="class")
    def gated(self, spark, planted, tmp_path_factory):
        work = str(tmp_path_factory.mktemp("work_nfcgate"))
        pipe = NearDupPipeline(spark, PipelineConfig(
            workdir=work, unicode_nfc=True))
        out = pipe.run(docs=planted, until="clusters")
        return work, out

    def test_canonical_spellings_become_exact_dups(self, spark, gated):
        _, out = gated
        docs = {r["url"]: r for r in out["documents"].collect()}
        a, b = docs["https://a.example/nfc"], docs["https://b.example/nfd"]
        # raw text preserved byte-for-byte; only norm_text is NFC'd
        assert a["text"] != b["text"]
        assert a["norm_text"] == b["norm_text"]
        sig = {r["doc_id"]: r["text_hash"]
               for r in out["signatures"].select("doc_id", "text_hash").collect()}
        assert sig[a["doc_id"]] == sig[b["doc_id"]]
        cl = {r["doc_id"]: r["cluster_id"] for r in out["clusters"].collect()}
        assert cl[a["doc_id"]] == cl[b["doc_id"]]

    def test_off_by_default_spellings_stay_distinct(self, spark, planted,
                                                    tmp_path_factory):
        work = str(tmp_path_factory.mktemp("work_nonfc"))
        out = NearDupPipeline(spark, PipelineConfig(workdir=work)).run(
            docs=planted, until="signatures")
        docs = {r["url"]: r for r in out["documents"].collect()}
        a, b = docs["https://a.example/nfc"], docs["https://b.example/nfd"]
        assert a["norm_text"] != b["norm_text"]
        sig = {r["doc_id"]: r["text_hash"]
               for r in out["signatures"].select("doc_id", "text_hash").collect()}
        assert sig[a["doc_id"]] != sig[b["doc_id"]]

    def test_toggle_fails_resume_loudly_both_ways(self, spark, planted,
                                                  gated, tmp_path_factory):
        work, _ = gated
        # on-written workdir, off rerun
        with pytest.raises(RuntimeError, match="incompatible configuration"):
            NearDupPipeline(spark, PipelineConfig(workdir=work)).run(
                docs=planted, until="signatures")
        # off-written workdir, on rerun
        work2 = str(tmp_path_factory.mktemp("work_nfc_off"))
        NearDupPipeline(spark, PipelineConfig(workdir=work2)).run(
            docs=planted, until="signatures")
        with pytest.raises(RuntimeError, match="incompatible configuration"):
            NearDupPipeline(spark, PipelineConfig(
                workdir=work2, unicode_nfc=True)).run(
                docs=planted, until="signatures")

    def test_gated_resume_identical(self, spark, planted, gated):
        work, out = gated
        out2 = NearDupPipeline(spark, PipelineConfig(
            workdir=work, unicode_nfc=True)).run(
            docs=planted, until="clusters")
        c1 = sorted(map(tuple, out["clusters"].collect()))
        c2 = sorted(map(tuple, out2["clusters"].collect()))
        assert c1 == c2


class TestShortDocTier:
    """Tier-2 short-doc banding (DedupConfig.short_doc_max_bytes): the
    32x4 envelope catches a J~0.4 pair only ~50% of the time, which is
    exactly where heavily-edited SHORT docs land (few shingles, every
    edit kills 12 of them). The narrow tier widens the envelope for docs
    under the byte threshold; tier-2-only pairs need >= short_min_bands
    independent collisions so narrow-band chance collisions stay out."""

    def test_low_jaccard_short_pair_clusters(self, spark, tmp_path):
        from frizbee_spark.operators.dedup import (
            DEFAULT_DEDUP, lsh_band_pairs, unified_candidate_pairs)

        # the pair bench.py missed in rounds 2-4: ~190B docs at J~0.39
        # (scattered word edits), below the main-tier envelope
        base = ("zkdaftigu guxh vqlkjlnr dbhzbpm gljmjh kkc hjiobhz ljkvw "
                "zejwqakl pgr cnotbnys eauy rqab pvcqvd banomzl tgyb "
                "bcfflp adwq hixme wob zzu pqnnr")
        edit = ("zkdaftigu guxh dbhzbpm gljmjh kkc hjiobhz ljkvw "
                "zejwqakl pgr cnotbnys eauy tptw rqab pvcqvd banomzl "
                "babzpfiiq bcfflp adwq hixtme wob zzu pqnnr")
        rows = [("u_base", base), ("u_edit", edit)] + [
            (f"u_f{i}",
             " ".join(f"xq{i}w{j}k" for j in range(28)))
            for i in range(40)
        ]
        df = with_doc_id(normalize_text(
            spark.createDataFrame(rows, "url string, text string"),
            "text"), "url")
        sigs = compute_signatures(df)
        # every planted doc is under the threshold -> tier2 keys present
        assert sigs.filter(F.size("short_band_keys")
                           == DEFAULT_DEDUP.short_bands).count() == 42
        ids = {r["url"]: r["doc_id"]
               for r in df.select("url", "doc_id").collect()}
        a, b = sorted([ids["u_base"], ids["u_edit"]])
        hit = unified_candidate_pairs(sigs).filter(
            (F.col("a") == a) & (F.col("b") == b)).count()
        assert hit == 1, "tier-2 must catch the J~0.39 short pair"
        from frizbee_spark.util import release_tracked

        release_tracked()

    def test_long_docs_get_no_tier2_keys(self, spark):
        rows = [("long1", "lorem ipsum " * 100), ("short1", "tiny doc x")]
        df = with_doc_id(normalize_text(
            spark.createDataFrame(rows, "url string, text string"),
            "text"), "url")
        got = {r["url"]: r for r in compute_signatures(df).join(
            df.select("url", "doc_id"), "doc_id").collect()}
        assert len(got["long1"]["short_band_keys"]) == 0
        assert len(got["short1"]["short_band_keys"]) == 64
        # and the tier can be disabled outright
        off = compute_signatures(df, DedupConfig(short_doc_max_bytes=0))
        assert off.filter(F.size("short_band_keys") > 0).count() == 0

    def test_multiplicity_rule_on_crafted_signatures(self, spark):
        """A tier-2-only pair with ONE shared band is rejected; two shared
        bands accept; any shared main band accepts regardless."""
        from frizbee_spark.operators.dedup import DEFAULT_DEDUP, lsh_band_pairs

        def mk(doc_id, main, short):
            return (doc_id, main, short)

        # unique filler keys: doc_id*1000+i ; shared keys are negative
        def mains(doc_id, shared=()):
            ks = [doc_id * 1000 + i for i in range(32)]
            for pos, key in shared:
                ks[pos] = key
            return ks

        def shorts(doc_id, shared=()):
            ks = [doc_id * 1000 + 500 + i for i in range(64)]
            for pos, key in shared:
                ks[pos] = key
            return ks

        rows = [
            # X,Y: one shared tier-2 band -> NOT a candidate
            mk(1, mains(1), shorts(1, [(3, -11)])),
            mk(2, mains(2), shorts(2, [(3, -11)])),
            # P,Q: two shared tier-2 bands -> candidate
            mk(3, mains(3), shorts(3, [(5, -22), (9, -33)])),
            mk(4, mains(4), shorts(4, [(5, -22), (9, -33)])),
            # M,N: one shared MAIN band -> candidate
            mk(5, mains(5, [(7, -44)]), shorts(5)),
            mk(6, mains(6, [(7, -44)]), shorts(6)),
        ]
        sigs = spark.createDataFrame(
            rows, "doc_id long, band_keys array<long>, "
                  "short_band_keys array<long>")
        got = {(r["a"], r["b"]) for r in lsh_band_pairs(sigs).collect()}
        assert got == {(3, 4), (5, 6)}


@pytest.mark.spark
class TestTierAttribution:
    """candidate_tier_attribution: pair set == union of the per-tier
    operators, and the label respects the documented priority."""

    @pytest.fixture(scope="class")
    def attributed(self, spark):
        import hashlib

        from frizbee_spark.operators.dedup import (
            DEFAULT_DEDUP, candidate_tier_attribution, compute_signatures,
            exact_hash_pairs, lsh_band_pairs, simhash_pairs,
        )

        base = "the quick brown fox jumps over the lazy dog " * 12  # ~540 B
        near = base.replace("lazy", "hazy", 1)
        short = " ".join(f"tok{i:02d}" for i in range(30))          # ~180 B
        short_near = short.replace("tok07", "tokxx", 1)
        rows = [(0, base), (1, base), (2, near),
                (3, short), (4, short_near)]
        rows += [
            (10 + i, " ".join(
                hashlib.md5(f"{i}#{t}".encode()).hexdigest()
                for t in range(6)))
            for i in range(120)                                     # unique
        ]
        docs = spark.createDataFrame(rows, "doc_id long, norm_text string")
        cfg = DEFAULT_DEDUP
        sigs = compute_signatures(docs, cfg).cache()
        att = {(r["a"], r["b"]): r["tier"]
               for r in candidate_tier_attribution(sigs, cfg).collect()}
        per_tier = {
            "exact": {(r["a"], r["b"])
                      for r in exact_hash_pairs(sigs, cfg).collect()},
            "lsh": {(r["a"], r["b"])
                    for r in lsh_band_pairs(sigs, cfg).collect()},
            "simhash": {(r["a"], r["b"])
                        for r in simhash_pairs(sigs, cfg).collect()},
        }
        sigs.unpersist()
        return att, per_tier

    def test_pair_set_is_union_of_tier_operators(self, attributed):
        att, per = attributed
        union = per["exact"] | per["lsh"] | per["simhash"]
        assert set(att) == union

    def test_engineered_pairs_present(self, attributed):
        att, _ = attributed
        assert att[(0, 1)] == "exact"            # identical docs
        assert (0, 2) in att and (1, 2) in att   # one-word near dups
        assert att[(0, 2)] != "exact"

    def test_labels_respect_priority(self, attributed):
        att, per = attributed
        for pair, tier in att.items():
            if tier == "exact":
                assert pair in per["exact"]
            elif tier == "minhash_lsh":
                assert pair in per["lsh"] and pair not in per["exact"]
            elif tier == "minhash_lsh_short":
                assert pair in per["lsh"] and pair not in per["exact"]
            else:
                assert tier == "simhash"
                assert pair in per["simhash"]
                assert pair not in per["exact"] and pair not in per["lsh"]

    def test_fuzz_union_equality_with_giant_family(self, spark):
        """Seeded fuzz over corpora with a >dense_cap exact family (the
        chain+star kernel path), near-dup families, and short docs: the
        attribution pair set must stay exactly the union of the per-tier
        operators, under the same kernel semantics on every side."""
        import hashlib

        from frizbee_spark.operators.dedup import (
            DEFAULT_DEDUP, candidate_tier_attribution, compute_signatures,
            exact_hash_pairs, lsh_band_pairs, simhash_pairs,
        )

        for seed in (1, 2):
            rows = []
            base = f"seed{seed} " + " ".join(
                f"w{seed}{i:03d}" for i in range(60))
            for i in range(40):            # exact family > dense_cap=32
                rows.append((i, base))
            for i in range(10):            # near dups: one token edited
                rows.append((100 + i, base.replace(
                    f"w{seed}00{i % 10}", f"q{seed}{i}", 1)))
            short = " ".join(f"s{seed}{i:02d}" for i in range(25))
            rows += [(200, short), (201, short.replace("s", "t", 1))]
            for i in range(60):            # unique background
                rows.append((300 + i, " ".join(
                    hashlib.md5(f"{seed}/{i}#{t}".encode()).hexdigest()
                    for t in range(5))))
            docs = spark.createDataFrame(
                rows, "doc_id long, norm_text string")
            cfg = DEFAULT_DEDUP
            sigs = compute_signatures(docs, cfg).cache()
            att = {(r["a"], r["b"]): r["tier"]
                   for r in candidate_tier_attribution(sigs, cfg).collect()}
            union = set()
            for op in (exact_hash_pairs, lsh_band_pairs, simhash_pairs):
                union |= {(r["a"], r["b"]) for r in op(sigs, cfg).collect()}
            sigs.unpersist()
            assert set(att) == union, f"seed {seed}"
            fam = {p for p in att if p[0] < 40 and p[1] < 40}
            assert fam and all(att[p] == "exact" for p in fam)


@pytest.mark.spark
class TestTierReportStage:
    def test_stage_matches_operator_and_resumes(
        self, spark, corpus_dir, tmp_path_factory
    ):
        from frizbee_spark.operators.dedup import (
            TIER_LABELS, candidate_tier_attribution)

        work = str(tmp_path_factory.mktemp("work_tier"))
        pipe = NearDupPipeline(
            spark, PipelineConfig(workdir=work, enable_tier_report=True))
        out = pipe.run(input_path=corpus_dir, until="tier_report")
        got = {(r["a"], r["b"], r["tier"])
               for r in out["tier_report"].collect()}
        assert got and {t for _, _, t in got} <= set(TIER_LABELS)
        direct = {(r["a"], r["b"], r["tier"])
                  for r in candidate_tier_attribution(
                      out["signatures"], pipe.cfg.dedup).collect()}
        assert got == direct
        # resume: a second pipeline on the same workdir must READ the
        # checkpoint (metrics row flags resumed) and return identical rows
        pipe2 = NearDupPipeline(
            spark, PipelineConfig(workdir=work, enable_tier_report=True))
        out2 = pipe2.run(input_path=corpus_dir, until="tier_report")
        assert {(r["a"], r["b"], r["tier"])
                for r in out2["tier_report"].collect()} == got
        # metrics files are uuid-named, so collect() order across the two
        # runs' appends is nondeterministic — a {stage: resumed} dict was
        # a coin flip between run 1's False and run 2's True row
        assert any(r["stage"] == "tier_report" and r["resumed"]
                   for r in pipe2.metrics().collect())

    def test_until_requires_optin(self, spark, corpus_dir, tmp_path_factory):
        work = str(tmp_path_factory.mktemp("work_tier_off"))
        pipe = NearDupPipeline(spark, PipelineConfig(workdir=work))
        with pytest.raises(ValueError, match="enable_tier_report"):
            pipe.run(input_path=corpus_dir, until="tier_report")


@pytest.mark.spark
class TestBudgetStage:
    BUDGET = 4_000  # tokens — cuts the corpus roughly in half

    def _cfg(self, work, budget=None):
        return PipelineConfig(
            workdir=work, enable_budget=True,
            budget_opts={"budget": budget or self.BUDGET})

    def test_stage_matches_operator_and_binds(
        self, spark, corpus_dir, tmp_path_factory
    ):
        from pyspark.sql import functions as F

        from frizbee_spark.operators.packing import select_to_budget
        from frizbee_spark.util import release_tracked

        work = str(tmp_path_factory.mktemp("work_budget"))
        pipe = NearDupPipeline(spark, self._cfg(work))
        out = pipe.run(input_path=corpus_dir, until="budget")
        sel = out["budget"].toPandas().sort_values("sel_rank")
        assert 0 < len(sel)
        assert sel["cum_cost"].iloc[-1] <= self.BUDGET
        # inclusive running sum is internally consistent
        assert (sel["cost"].cumsum() == sel["cum_cost"]).all()
        # matches the operator applied directly to the documents stage
        docs = out["documents"]
        base = docs.select(
            "doc_id",
            F.length("text").cast("long").alias("_w"),
            F.size(F.split(F.trim(F.col("text")), r"\s+"))
            .cast("long").alias("_c"),
        )
        try:
            direct = (
                select_to_budget(base, self.BUDGET, "_w", "_c")
                .toPandas().sort_values("sel_rank").reset_index(drop=True)
            )
        finally:
            release_tracked()
        assert direct["doc_id"].tolist() == sel["doc_id"].tolist()
        assert direct["cum_cost"].tolist() == sel["cum_cost"].tolist()

    def test_downstream_sees_only_selected_docs(
        self, spark, corpus_dir, tmp_path_factory
    ):
        work = str(tmp_path_factory.mktemp("work_budget_ds"))
        pipe = NearDupPipeline(spark, self._cfg(work))
        out = pipe.run(input_path=corpus_dir)
        kept = {r.doc_id for r in out["budget"].collect()}
        sigs = {r.doc_id for r in
                out["signatures"].select("doc_id").distinct().collect()}
        assert sigs <= kept and sigs

    def test_resume_reads_checkpoint_and_retune_fails(
        self, spark, corpus_dir, tmp_path_factory
    ):
        work = str(tmp_path_factory.mktemp("work_budget_res"))
        out = NearDupPipeline(spark, self._cfg(work)).run(
            input_path=corpus_dir, until="budget")
        want = sorted(r.doc_id for r in out["budget"].collect())
        pipe2 = NearDupPipeline(spark, self._cfg(work))
        out2 = pipe2.run(input_path=corpus_dir, until="budget")
        assert sorted(r.doc_id for r in out2["budget"].collect()) == want
        assert any(r["stage"] == "budget" and r["resumed"]
                   for r in pipe2.metrics().collect())
        # a different budget against the same workdir must fail loudly
        with pytest.raises(RuntimeError, match="budget"):
            NearDupPipeline(spark, self._cfg(work, budget=999)).run(
                input_path=corpus_dir, until="budget")

    def test_optin_and_validation(self, spark, corpus_dir,
                                  tmp_path_factory):
        work = str(tmp_path_factory.mktemp("work_budget_off"))
        with pytest.raises(ValueError, match="enable_budget"):
            NearDupPipeline(spark, PipelineConfig(workdir=work)).run(
                input_path=corpus_dir, until="budget")
        with pytest.raises(ValueError, match="budget_opts"):
            NearDupPipeline(
                spark,
                PipelineConfig(workdir=work, enable_budget=True),
            ).run(input_path=corpus_dir, until="budget")


@pytest.mark.spark
class TestBudgetDsirWeight:
    """budget_opts weight='dsir': the DSIR paper's use case — keep the
    best-N-tokens ranked by importance weight, not char length."""

    def _planted(self, spark):
        vocab = [f"v{k}" for k in range(10)]

        def on_target(i):
            return " ".join(vocab[(i + j) % 10] for j in range(40))

        rows = [(f"https://x.example/on{i}", on_target(i))
                for i in range(8)]
        rows += [(f"https://x.example/junk{i}",
                  " ".join(f"junk{i}w{j}" for j in range(40)))
                 for i in range(8)]
        docs = spark.createDataFrame(rows, "url string, text string")
        ids = {r["url"]: r["id"] for r in docs.select(
            "url", F.xxhash64("url").alias("id")).collect()}
        return docs, ids, on_target

    def test_dsir_ranked_selection(self, spark, tmp_path_factory):
        docs, ids, on_target = self._planted(spark)
        tgt_dir = str(tmp_path_factory.mktemp("budget_tgt") / "t.parquet")
        spark.createDataFrame(
            [(on_target(i + 3),) for i in range(10)], "text string"
        ).write.parquet(tgt_dir)
        work = str(tmp_path_factory.mktemp("work_budget_dsir"))
        cfg = PipelineConfig(
            workdir=work, enable_dsir=True,
            # floor below every score: the dsir GATE keeps everything,
            # so the budget cut alone decides membership
            dsir_opts={"target_path": tgt_dir, "min_avg_logratio": -1e9,
                       "n_buckets": 64},
            enable_budget=True,
            # every doc is 40 tokens; 200 tokens = the top five docs
            budget_opts={"budget": 200, "weight": "dsir"},
        )
        out = NearDupPipeline(spark, cfg).run(docs=docs, until="budget")
        sel = out["budget"].toPandas().sort_values("sel_rank")
        assert len(sel) == 5
        assert (sel["cost"] == 40).all()
        on_ids = {ids[f"https://x.example/on{i}"] for i in range(8)}
        # on-target docs outrank junk under the dsir weight
        assert set(sel["doc_id"]) <= on_ids
        # weights are the x1e6 longs of the dsir stage's avg_logratio
        scored = {r["doc_id"]: r["avg_logratio"]
                  for r in out["dsir"].collect()}
        for r in sel.itertuples():
            assert r.weight == round(scored[r.doc_id] * 1e6)

    def test_weight_requires_matching_gate(self, spark, tmp_path_factory):
        docs, _, _ = self._planted(spark)
        work = str(tmp_path_factory.mktemp("work_budget_noscore"))
        with pytest.raises(ValueError, match="enable_dsir"):
            NearDupPipeline(spark, PipelineConfig(
                workdir=work, enable_budget=True,
                budget_opts={"budget": 100, "weight": "dsir"},
            )).run(docs=docs, until="budget")
        with pytest.raises(ValueError, match="enable_perplexity"):
            NearDupPipeline(spark, PipelineConfig(
                workdir=work, enable_budget=True,
                budget_opts={"budget": 100, "weight": "neg_perplexity"},
            )).run(docs=docs, until="budget")
