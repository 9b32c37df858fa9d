"""End-to-end near-duplicate detection pipeline with resumable stages.

Stage graph (north-rule requirements in brackets):

    documents    source + extract + normalize + doc_id  [byte-identity]
    signatures   MinHash/band/SimHash per doc           [vectorized UDFs]
    candidates   exact ∪ LSH ∪ SimHash pairs            [salted groupBy]
    span_pairs   winnowing long-exact-span pairs        [substring pass]
    verified     banded SW similarity per pair          [SW verifier]
    edges        verified pairs only
    clusters     large-star/small-star CC               [explicit shuffle]
    canonical    earliest doc per cluster               [window]

Checkpointing is SELECTIVE: only the stages in
``PipelineConfig.checkpoint_stages`` write parquet under
``workdir/<stage>``; a completed stage (Spark `_SUCCESS` marker) is *read
back, not recomputed* on the next run — the resumable-stage-boundary
requirement. ``candidates`` and ``edges`` flow through by default: each is
consumed exactly once by the next stage, so persisting them would add a
write + read-back + an extra scheduler round-trip to the critical path for
zero resume value (wiping `verified` already recomputes them from the
`signatures` checkpoint). The storage layer is parquet in the sandbox; on
a real deployment each `write` maps to an Iceberg
`writeTo(...).createOrReplace()` and resume maps to reading the table's
last committed snapshot (same semantics: atomic visible-only-when-complete
commits). This mirrors the reference's incremental matcher, which persists
pre-interleaved buckets once and recomputes only what a new needle
invalidates (/root/reference/src/incremental/matcher.rs:13-118).

Metrics + lineage cost ZERO extra Spark jobs: per-partition row counts are
read driver-side from the parquet footers of each checkpoint's part files
(a part file is one write partition), and stage row totals are the footer
sums. Both are buffered and written once at the end of `run` to
``workdir/_metrics`` / ``workdir/_lineage`` — the per-partition
lineage+metrics rows the north rule names, without the per-stage
`collect()` jobs that serialized round 1's critical path (strong-scaling
efficiency was 0.232 with them, see BENCH.md history).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from .operators.components import assign_clusters
from .operators.dedup import (
    DEFAULT_DEDUP,
    DedupConfig,
    candidate_tier_attribution,
    compute_signatures,
    extract_text,
    normalize_text,
    signature_meta,
    span_extents,
    unified_candidate_pairs,
    verify_pairs,
    winnow_span_pairs,
    with_doc_id,
)

STAGES = (
    "documents", "url_dedup", "blocklist", "domain_cap", "filter",
    "perplexity",
    "dsir", "decontaminate", "sample",
    "signatures",
    "candidates", "tier_report", "span_pairs", "span_report", "verified",
    "edges", "clusters", "canonical",
)

# stages whose output is consumed exactly once by the next stage — flowing
# them through keeps candidate generation + verification one Spark query
# (AQE plans the joins end-to-end) instead of three serialized jobs.
# perplexity IS checkpointed: its decision table costs a corpus-level
# model build (two aggregates + a model join), and the gated documents
# frame feeds several downstream consumers that would each re-train the
# model if it flowed through. filter/sample are cheap per-row Catalyst.
DEFAULT_CHECKPOINTS = (
    "documents", "perplexity", "dsir", "decontaminate", "budget",
    "signatures",
    "tier_report",
    "span_pairs", "span_report", "verified", "clusters", "canonical",
)


@dataclass
class PipelineConfig:
    workdir: str
    dedup: DedupConfig = field(default_factory=lambda: DEFAULT_DEDUP)
    resume: bool = True
    enable_simhash: bool = True  # SimHash as a candidate SOURCE (on top of
    # its verify-gate role). ON by default since the r3 move to
    # block-combination tables (simhash_table_layout): ~32-bit keys keep
    # chance pairs ~C(n,2)*20/2^33 (~186 at n=400k, measured), so the
    # source adds Hamming-ball recall without the quadratic birthday noise
    # the old 4x16-bit chunks produced at n >> 65k.
    enable_span: bool = True
    enable_tier_report: bool = False  # per-pair dedup-tier attribution
    # (exact > main LSH bands > tier-2 short-doc bands > SimHash) as a
    # checkpointed 'tier_report' stage — the tiered-dedup tuning table
    # ("which tier earns each candidate; what would recall lose if tier
    # X were off"). Off by default: it costs a second pairing-shuffle
    # pass over the signature buckets, pure analysis — the dedup result
    # itself never consumes it.
    filter_opts: dict | None = None  # kwargs for operators.textstats.
    # corpus_filter when the gate is on (thresholds, require_lang_signal)
    unicode_nfc: bool = False  # Unicode NFC normalization of the
    # extracted text BEFORE norm_text/signatures, so canonically-equal
    # but byte-different spellings (combining sequences vs precomposed)
    # become exact-hash duplicates instead of slipping past every
    # exact/near gate. Applied AFTER the byte-identity extraction check
    # (the raw 'text' column stays byte-identical to the source); only
    # norm_text — what signatures, spans, and verify consume — sees the
    # NFC form. Stamped into both the documents checkpoint meta and the
    # signatures meta: toggling it on a populated workdir fails the
    # resume loudly (the persisted norm_text was produced by the other
    # normalization). Off by default: the driver fixture is ASCII and
    # NFC is a no-op there.
    enable_url_dedup: bool = False  # URL-variant collapse BEFORE any
    # content stage: canonicalize_url (case/ports/fragments/tracking
    # params/param order) over the documents table, keeping ONE doc per
    # canonical URL — earliest warc_ts, then lexicographic min url
    # (crawl convention: first capture wins). The per-doc attribution
    # table (doc_id, canonical_url, keep) is the 'url_dedup' stage
    # output. Cheapest gate in the pipeline (never reads text — the
    # shuffled rows are ids + urls); requires a 'url' column in the
    # source. Off by default: the driver tables have no url column, and
    # dedup-everything is this pipeline's contract.
    blocklist_domains: tuple | list | None = None  # UT1-style domain
    # blocklist between the URL collapse and the domain cap: a doc is
    # dropped when its host or ANY parent domain is listed (suffix
    # matching via the dot-suffix equi-join in webnorm.url_blocklist —
    # never a LIKE theta join). The (doc_id, host, matched_domain)
    # decision table is the 'blocklist' stage output. The SORTED list
    # is hashed into the stage + signature meta, so editing the list
    # fails resume loudly instead of silently reusing stale decisions.
    # None = gate off; requires a 'url' column.
    domain_cap_n: int | None = None  # per-domain anti-domination cap
    # (Gopher/C4 convention) after the URL collapse, before the content
    # gates: each host keeps at most N docs, ranked by md5(url) with id
    # tie-break (deterministic pseudo-random sample, append-stable);
    # url-less rows pass through uncapped. WindowGroupLimit pre-truncates
    # hot domains map-side, so a 10^9-doc host ships N rows per task.
    # The (doc_id, host, domain_rank) table is the 'domain_cap' stage.
    # None = gate off; requires a 'url' column.
    enable_filter: bool = False  # FineWeb/Gopher-style corpus_filter gate
    # BEFORE dedup: drop too-short/repetitive/language-less docs so no
    # signature or verify work is spent on rows curation discards anyway.
    # Off by default (dedup-everything is this pipeline's contract); the
    # gate's identity is stamped into the signatures checkpoint meta, so
    # toggling it between runs of one workdir fails the resume loudly
    # instead of silently mixing doc sets.
    enable_perplexity: bool = False  # bigram-LM perplexity gate (CCNet-
    # style) AFTER the corpus_filter gate: lm_perplexity scores every
    # surviving doc under a model trained on those same docs, and rows
    # outside [ppl_min, ppl_max] are dropped before any signature work.
    # The scored table is the checkpointed 'perplexity' stage (keep
    # column included); the band is stamped into the signatures meta, so
    # toggling or re-banding one workdir fails its resume loudly.
    perplexity_opts: dict | None = None  # {'ppl_min': float,
    # 'ppl_max': float, 'text_col': str}; defaults: no lower bound,
    # ppl_max required (the filter's whole point is the high-perplexity
    # tail). Docs with < 2 tokens have no bigrams, hence no score: the
    # gate DROPS them (no LM signal — same rows a CCNet band drops).
    enable_dsir: bool = False  # DSIR importance-weight gate (Xie et al.
    # 2023) AFTER the perplexity gate: dsir_weights scores every
    # surviving doc's hashed-bigram log-likelihood ratio under a curated
    # TARGET corpus vs the raw (surviving) corpus, and docs below
    # min_avg_logratio are dropped before any signature work — the
    # tilt-toward-quality selection CCNet does with a target LM,
    # expressed as the paper's bucket multinomials. The scored table
    # (doc_id, n_grams, log_weight, avg_logratio, keep) is the
    # checkpointed 'dsir' stage; docs with < 2 tokens have no bigrams,
    # hence no ratio: the gate DROPS them (no feature signal — same
    # contract as the perplexity gate). Config is stamped into stage +
    # signatures meta, so re-pointing the target or re-tuning the
    # threshold on one workdir fails its resume loudly.
    dsir_opts: dict | None = None  # {'target_path': str (required —
    # parquet with a 'text' column), 'min_avg_logratio': float
    # (required), 'n_buckets': 4096, 'alpha': 1.0, 'text_col': auto
    # ('text' if present else 'norm_text')}
    enable_decontaminate: bool = False  # Bloom-filter benchmark
    # decontamination AFTER the quality gates, BEFORE the mixing sample:
    # every (filter/perplexity-surviving) doc is probed against an m-bit
    # Bloom bitmap of the benchmark's k-token grams, and docs whose
    # flagged-gram ratio exceeds the configured bound are dropped before
    # any signature work. FPs only ever OVER-drop (a few extra docs at a
    # quantified rate), never leak an eval gram through — the right
    # asymmetry for a training corpus. The flagged table (doc_id,
    # n_grams, n_flagged_grams, flagged_ratio, keep) is the checkpointed
    # 'decontaminate' stage; config is stamped into both the stage meta
    # and the signatures meta, so re-pointing the benchmark or re-tuning
    # the bound on one workdir fails its resume loudly.
    decontaminate_opts: dict | None = None  # {'benchmark_path': str
    # (required — parquet with a 'text' column), 'k': 8,
    # 'm_bits': 1<<20, 'n_hashes': 5, 'max_flagged_ratio': 0.0,
    # 'text_col': auto ('text' if present else 'norm_text')}
    enable_sample: bool = False  # stratified corpus-mixing downsample
    # (textstats.stratified_sample) after the gates, before dedup:
    # deterministic md5-per-id rates per stratum. The kept-id + weight
    # table is the 'sample' stage output.
    sample_opts: dict | None = None  # kwargs for stratified_sample;
    # 'rates' is required, 'stratum_col' defaults to 'lang'
    enable_budget: bool = False  # token-budget cut (packing.
    # select_to_budget) AFTER every quality gate: rank the surviving
    # docs by a weight column (default: char length — "prefer long
    # docs"; point it at a scored column for quality-ranked cuts) and
    # keep the maximal prefix whose token sum fits the budget. The
    # selection table (doc_id, weight, cost, cum_cost, sel_rank) is the
    # 'budget' stage output.
    budget_opts: dict | None = None  # {'budget': int (required — token
    # budget), 'weight': 'chars' (doc char length, the default),
    # 'dsir' (avg_logratio from the dsir stage — requires enable_dsir;
    # THE DSIR use case: keep the best-N-tokens by importance weight),
    # 'neg_perplexity' (lower perplexity ranks first — requires
    # enable_perplexity), or any numeric documents column name; scored
    # weights are scaled x1e6 and cast to long (the scores are already
    # rounded to <= 6 decimals, so this is lossless and keeps the
    # selection integer-exact), 'text_col': auto ('text' if present
    # else 'norm_text')}
    extractor: str = "shell"  # html -> extracted_text strategy when the
    # source has an 'html' column. "shell": the sandbox corpus's fixed
    # <html><body> shell is a substring slice (byte-identity with 'text'
    # asserted — the default). "wet": the full WET-style visible-text
    # chain (webnorm.html_visible_text — script/style/comment removal,
    # tag strip, entity decode, whitespace collapse), for real crawl
    # pages; identical expression to the oracle-checked html_extract
    # operator. The choice is stamped into the documents checkpoint
    # meta, so switching extractors on a populated workdir fails its
    # resume loudly instead of silently mixing extraction semantics.
    check_extraction: bool = True   # assert extracted_text == text per url
    check_id_collisions: bool = True
    doc_partitions: int | None = None   # force a doc_id hash layout on the
                                        # documents checkpoint; default is
                                        # no shuffle (scan-split order) —
                                        # see the comment in s_documents
    pair_partitions: int | None = None  # repartition before verify
    checkpoint_stages: tuple = DEFAULT_CHECKPOINTS


class CheckpointStore:
    """Parquet-backed stage store (Iceberg-snapshot stand-in, see module doc).

    Plain paths use the local filesystem directly (os + pyarrow footer
    reads). Any URI workdir (``hdfs://``, ``s3a://``, also ``file://``)
    routes existence/delete through the Hadoop FileSystem API and skips
    the driver-side footer reads — r2 advice: ``os.listdir`` on a remote
    URI crashed metrics recording for exactly the deployments the module
    docstring contemplates. The ``file://`` scheme deliberately takes the
    Hadoop branch so the remote code path is exercised by local tests.
    """

    def __init__(self, root: str, spark: SparkSession | None = None):
        from urllib.parse import urlparse

        self.root = root
        self._spark = spark
        self.is_local = urlparse(root).scheme == ""
        if self.is_local:
            os.makedirs(root, exist_ok=True)

    def _fs(self, path: str):
        jvm = self._spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        return hpath.getFileSystem(self._spark._jsc.hadoopConfiguration()), hpath

    def path(self, stage: str) -> str:
        return os.path.join(self.root, stage)  # posix join; URI-safe here

    def is_complete(self, stage: str) -> bool:
        marker = os.path.join(self.path(stage), "_SUCCESS")
        if self.is_local:
            return os.path.exists(marker)
        fs, p = self._fs(marker)
        return bool(fs.exists(p))

    def write(self, stage: str, df: DataFrame) -> None:
        df.write.mode("overwrite").parquet(self.path(stage))

    def read(self, spark: SparkSession, stage: str) -> DataFrame:
        return spark.read.parquet(self.path(stage))

    def invalidate(self, stage: str) -> None:
        if self.is_local:
            import shutil

            shutil.rmtree(self.path(stage), ignore_errors=True)
            return
        fs, p = self._fs(self.path(stage))
        if fs.exists(p):
            fs.delete(p, True)

    def write_text(self, relpath: str, text: str) -> None:
        p = os.path.join(self.root, relpath)
        if self.is_local:
            with open(p, "w") as f:
                f.write(text)
            return
        fs, hp = self._fs(p)
        out = fs.create(hp, True)
        out.write(bytearray(text.encode("utf-8")))
        out.close()

    def read_text(self, relpath: str) -> str | None:
        p = os.path.join(self.root, relpath)
        if self.is_local:
            if not os.path.exists(p):
                return None
            with open(p) as f:
                return f.read()
        fs, hp = self._fs(p)
        if not fs.exists(hp):
            return None
        stream = fs.open(hp)
        try:
            return self._spark._jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        finally:
            stream.close()

    def footer_stats(self, stage: str) -> list[tuple[int, int, int]] | None:
        """(part_index, rows, bytes) per part file, from parquet footers —
        driver-side metadata reads, no Spark job. A part file corresponds
        to one write partition, so this doubles as per-partition lineage.
        Returns None for URI workdirs (the caller falls back to one
        Spark-side count; remote footer reads would need pyarrow.fs
        plumbing that buys nothing here)."""
        if not self.is_local:
            return None
        import pyarrow.parquet as pq

        out = []
        d = self.path(stage)
        parts = sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
        for i, f in enumerate(parts):
            fp = os.path.join(d, f)
            out.append((i, pq.read_metadata(fp).num_rows, os.path.getsize(fp)))
        return out


class NearDupPipeline:
    def __init__(self, spark: SparkSession, cfg: PipelineConfig):
        self.spark = spark
        self.cfg = cfg
        self.store = CheckpointStore(cfg.workdir, spark)
        self._metrics: list[tuple] = []
        self._lineage: list[tuple] = []

    # -- bookkeeping --------------------------------------------------------

    def _record_checkpointed(
        self, stage: str, wall_ms: float, resumed: bool, df: DataFrame | None = None
    ) -> int:
        """Metrics + per-partition lineage from parquet footers (no jobs).
        URI workdirs have no footer access (store.footer_stats -> None):
        fall back to ONE Spark count of the read-back for the row total
        and skip per-partition lineage — correct everywhere, costs one
        metadata-cheap job only on remote deployments (r2 advice)."""
        stats = self.store.footer_stats(stage)
        if stats is None:
            total = df.count() if df is not None else -1
            self._metrics.append((stage, int(total), float(wall_ms), bool(resumed)))
            return total
        self._lineage.extend((stage, pid, rows) for pid, rows, _ in stats)
        total = sum(rows for _, rows, _ in stats)
        self._metrics.append((stage, int(total), float(wall_ms), bool(resumed)))
        return total

    def _record_flowthrough(self, stage: str) -> None:
        # lazy stage: no materialization yet, so no row count (-1); its
        # cost lands in the wall of the consuming checkpointed stage
        self._metrics.append((stage, -1, 0.0, False))

    def flush_metrics(self) -> None:
        """Persist buffered metrics/lineage as parquet via pyarrow on the
        driver — the rows already live driver-side (footer sums), so
        spinning up Spark jobs to write a few hundred rows would put 2-4
        scheduler round-trips on the critical path for nothing. Spark
        reads the files fine (`metrics()` / `lineage()`). URI workdirs
        append through Spark instead (no local os access there)."""
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        def _append(rows, names, subdir):
            d = os.path.join(self.cfg.workdir, subdir)
            if not self.store.is_local:
                schema = ", ".join(
                    f"{n} {'string' if isinstance(rows[0][i], str) else ('boolean' if isinstance(rows[0][i], bool) else ('double' if isinstance(rows[0][i], float) else 'long'))}"
                    for i, n in enumerate(names)
                )
                self.spark.createDataFrame(rows, schema).coalesce(1) \
                    .write.mode("append").parquet(d)
                return
            os.makedirs(d, exist_ok=True)
            cols = list(zip(*rows))
            tbl = pa.table({n: list(c) for n, c in zip(names, cols)})
            pq.write_table(tbl, os.path.join(d, f"part-{uuid.uuid4().hex}.parquet"))

        if self._lineage:
            _append(self._lineage, ["stage", "partition_id", "rows_out"], "_lineage")
            self._lineage = []
        if self._metrics:
            _append(self._metrics, ["stage", "rows_out", "wall_ms", "resumed"], "_metrics")
            self._metrics = []

    def metrics(self) -> DataFrame:
        return self.store.read(self.spark, "_metrics")

    def lineage(self) -> DataFrame:
        return self.store.read(self.spark, "_lineage")

    def _stage(self, name: str, compute, meta: dict | None = None) -> DataFrame:
        """Run-or-resume one stage.

        Checkpointed stages return the read-back of the materialized
        table; flow-through stages return the lazy plan directly.

        ``meta`` stamps the stage with its producing configuration
        (``<stage>/_meta.json``, written right after the data — the
        overwrite wipes the stage dir, so the stamp cannot precede it)
        and FAILS the resume on mismatch: e.g. signatures from a
        different hash family/seed produce band keys that never collide
        with new ones, silently collapsing near-dup recall (r2 advice).
        A checkpoint with no stamp (pre-stamping workdir, or a crash in
        the instant between data and stamp) resumes with a warning.
        """
        import json

        if name not in self.cfg.checkpoint_stages:
            self._record_flowthrough(name)
            return compute()
        t0 = time.monotonic()
        resumed = self.cfg.resume and self.store.is_complete(name)
        if resumed and meta is not None:
            stored = self.store.read_text(f"{name}/_meta.json")
            if stored is not None and json.loads(stored) != meta:
                raise RuntimeError(
                    f"stage '{name}' checkpoint at {self.store.path(name)} was "
                    f"written by an incompatible configuration:\n  stored:  "
                    f"{stored}\n  current: {json.dumps(meta)}\nResuming would "
                    "silently lose recall (band keys from different hash "
                    "families never collide). Wipe the stage or restore the "
                    "original config."
                )
            if stored is None:
                import sys

                print(
                    f"frizbee: resuming unstamped '{name}' checkpoint "
                    "(written before config stamping) — cannot verify the "
                    "signature family matches", file=sys.stderr,
                )
        if not resumed:
            # job description is a thread-local Spark property, so the
            # concurrent span/check branches label their own jobs — event
            # logs then attribute every job to its pipeline stage
            sc = self.spark.sparkContext
            sc.setJobDescription(f"frizbee:{name}")
            try:
                self.store.write(name, compute())
            finally:
                sc.setJobDescription(None)
            if meta is not None:
                self.store.write_text(f"{name}/_meta.json", json.dumps(meta))
        out = self.store.read(self.spark, name)
        self._record_checkpointed(name, (time.monotonic() - t0) * 1e3, resumed,
                                  df=out)
        return out

    # -- stages -------------------------------------------------------------

    def run(
        self,
        docs: DataFrame | None = None,
        input_path: str | None = None,
        until: str = "canonical",
    ) -> dict[str, DataFrame]:
        """Execute stages up to `until` (inclusive); returns stage tables.

        Caches created by the operators (verify tag table, gated
        candidates, winnow fingerprints) are released in the ``finally``
        below — after every submission thread is joined — so back-to-back
        runs in one session never accumulate CacheManager blocks
        (round-2 advice). Flow-through stage frames in the returned dict
        recompute if re-used after the run; checkpointed stages are
        parquet read-backs and unaffected.
        """
        from .util import release_tracked

        try:
            return self._run(docs, input_path, until)
        finally:
            release_tracked()

    def _run(
        self,
        docs: DataFrame | None,
        input_path: str | None,
        until: str,
    ) -> dict[str, DataFrame]:
        cfg, d = self.cfg, self.cfg.dedup
        out: dict[str, DataFrame] = {}

        def s_documents():
            src = docs if docs is not None else self.spark.read.parquet(
                os.path.join(input_path, "documents.parquet")
            )
            has_html = "html" in src.columns
            if not has_html:
                work = src.withColumn("extracted_text", F.col("text"))
            elif cfg.extractor == "wet":
                from .operators.webnorm import html_visible_text

                work = src.withColumn(
                    "extracted_text",
                    html_visible_text(F.col("html").cast("string")),
                )
            elif cfg.extractor == "shell":
                work = extract_text(src)
            else:
                raise ValueError(
                    f"unknown extractor {cfg.extractor!r} "
                    "(expected 'shell' or 'wet')"
                )
            if cfg.check_extraction and "text" in src.columns and has_html:
                work = work.withColumn(
                    "_extract_ok", F.col("extracted_text") == F.col("text")
                )
            if cfg.unicode_nfc:
                # AFTER the byte-identity check binds (raw text stays
                # untouched), BEFORE norm_text derivation: only the
                # dedup-facing column sees the NFC form
                from .operators.webnorm import unicode_norm_udf

                work = work.withColumn(
                    "extracted_text",
                    unicode_norm_udf("NFC")(F.col("extracted_text")),
                )
            work = normalize_text(work, "extracted_text")
            id_src = "url" if "url" in src.columns else "doc_id"
            if id_src == "url":
                work = with_doc_id(work, "url")
            # norm_text IS persisted: signatures, the span pass, and both
            # sides of the verify text join consume it, and recomputing
            # the whitespace-collapse regex at read costs ~4 full
            # JVM-regex passes over the corpus per run (hundreds of
            # core-seconds at bench scale). Parquet column pruning keeps
            # each consumer's scan narrow, so the extra column costs only
            # its one write.
            keep = [c for c in ("url", "warc_ts", "text", "norm_text", "lang",
                                "_extract_ok") if c in work.columns]
            out_df = work.select("doc_id", *keep)
            # NO stage-boundary repartition by default: extract/normalize
            # is map-only, so writing in scan-split order avoids shuffling
            # the full corpus text (the single largest byte stream in the
            # pipeline — removing it cut ~0.5 GB of shuffle at 400k docs).
            # Task sizing comes from spark.sql.files.maxPartitionBytes on
            # both this scan and every downstream read-back (the reference
            # B5 per-thread volume heuristic, parallel/mod.rs:131-143,
            # expressed as split bytes); nothing downstream needs doc_id
            # hash distribution (candidates re-shuffle on bucket keys,
            # verify re-shuffles on pair keys). An explicit
            # cfg.doc_partitions still forces a layout when a deployment
            # wants checkpoint files bucketed by doc_id.
            if self.cfg.doc_partitions:
                out_df = out_df.repartition(self.cfg.doc_partitions, "doc_id")
            return out_df

        # the documents stamp always carries the extractor identity, so
        # an extractor switch on a populated workdir fails loudly in
        # EITHER direction (a None stamp would skip the compare and let
        # a wet->shell downgrade resume a wet-extracted checkpoint).
        # Pre-stamping workdirs (stored None) still resume with the
        # standard warning; an nfc toggle also fails here (text_norm key
        # present exactly when the gate is on) as well as at the
        # signatures meta check below.
        doc_meta = {"extractor": f"{cfg.extractor}-v1"}
        if cfg.unicode_nfc:
            doc_meta["text_norm"] = "unicode-nfc-v1"
        documents = self._stage("documents", s_documents, meta=doc_meta)
        # invariant checks run on the checkpointed (parallel) table — one
        # combined aggregation instead of serial scans of the raw input.
        # The agg is SUBMITTED on a side thread so it runs concurrently
        # with the signature chain (it only reads the checkpoint) and is
        # JOINED before any result is returned — a violation still aborts
        # the run before anything downstream becomes visible, it just no
        # longer serializes a full extra scan onto the critical path.
        check_future = None
        check_pool = None
        has_extract_col = "_extract_ok" in documents.columns
        if cfg.check_extraction or cfg.check_id_collisions:
            import concurrent.futures

            aggs = [F.count("*").alias("n"), F.countDistinct("doc_id").alias("d")]
            if has_extract_col:
                aggs.append(
                    F.sum(F.when(~F.col("_extract_ok"), 1).otherwise(0)).alias("bad")
                )
            agg_df = documents.agg(*aggs)
            check_pool = concurrent.futures.ThreadPoolExecutor(1)

            def _run_check():
                self.spark.sparkContext.setJobDescription("frizbee:invariant_check")
                return agg_df.collect()[0]

            check_future = check_pool.submit(_run_check)
        if has_extract_col:
            documents = documents.drop("_extract_ok")
        if "norm_text" not in documents.columns:
            # resumed from a checkpoint written before norm_text was
            # persisted — recompute it as an expression
            documents = normalize_text(documents, "text")
        out["documents"] = documents

        def _join_check():
            nonlocal check_future
            if check_future is None:
                return
            c = check_future.result()
            check_pool.shutdown()
            check_future = None
            msg = None
            if has_extract_col and cfg.check_extraction and c["bad"]:
                msg = f"extraction broke byte-identity for {c['bad']} urls"
            elif cfg.check_id_collisions and c["n"] != c["d"]:
                msg = f"doc_id collision: {c['n']} rows, {c['d']} distinct ids"
            if msg is not None:
                # every checkpoint derived from the bad documents table
                # must go too, or a re-run would resume from stale stages
                for st in STAGES:
                    self.store.invalidate(st)
                raise AssertionError(msg)

        if until == "documents":
            _join_check()
            self.flush_metrics()
            return out

        # URL-variant collapse: the cheapest gate runs first — no text is
        # read, the window shuffles only (doc_id, url, warc_ts, canonical)
        # rows, and every content stage downstream (filter included) sees
        # one doc per canonical URL.
        if cfg.enable_url_dedup:
            from .operators.webnorm import canonicalize_url

            if "url" not in documents.columns:
                raise ValueError(
                    "enable_url_dedup requires a 'url' column in the source "
                    "(the driver parquet tables have none — this gate is for "
                    "crawl-shaped corpora)"
                )
            has_ts = "warc_ts" in documents.columns
            docs_for_url = documents  # bind NOW, like the other gates

            def s_url_dedup():
                cols = ["doc_id", "url"] + (["warc_ts"] if has_ts else [])
                c = canonicalize_url(docs_for_url.select(*cols))
                order = ([F.col("warc_ts").asc()] if has_ts else []) + [
                    F.col("url").asc(), F.col("doc_id").asc()]
                w = Window.partitionBy("canonical_url").orderBy(*order)
                return c.select(
                    "doc_id", "canonical_url",
                    (F.row_number().over(w) == 1).alias("keep"),
                )

            ud = self._stage("url_dedup", s_url_dedup,
                             meta={"gate": "url-canonical-v1"})
            out["url_dedup"] = ud
            documents = documents.join(
                ud.filter("keep").select("doc_id"), "doc_id", "left_semi"
            )
        if until == "url_dedup":
            if not cfg.enable_url_dedup:
                raise ValueError(
                    "run(until='url_dedup') requires cfg.enable_url_dedup="
                    "True (the URL collapse is opt-in)"
                )
            _join_check()
            self.flush_metrics()
            return out

        # UT1-style domain blocklist: like url_dedup, only (doc_id,
        # host, suffix) rows ever move — text is untouched. The stage
        # output is the DROP decision table; documents anti-join it.
        blocklist_hash = None
        if cfg.blocklist_domains is not None:
            import hashlib as _hashlib

            from .operators.webnorm import url_blocklist

            if "url" not in documents.columns:
                raise ValueError(
                    "blocklist_domains requires a 'url' column in the "
                    "source (the gate is keyed on the url's host)"
                )
            bl_domains = sorted({str(d).lower().strip(".")
                                 for d in cfg.blocklist_domains})
            if not bl_domains:
                raise ValueError("blocklist_domains must be non-empty "
                                 "when set (use None to disable)")
            blocklist_hash = _hashlib.sha256(
                "\n".join(bl_domains).encode()).hexdigest()[:16]
            docs_for_bl = documents

            def s_blocklist():
                return url_blocklist(docs_for_bl.select("doc_id", "url"),
                                     bl_domains)

            bld = self._stage("blocklist", s_blocklist,
                              meta={"gate": "url-blocklist-suffix-v1",
                                    "n_domains": len(bl_domains),
                                    "list_sha": blocklist_hash})
            out["blocklist"] = bld
            documents = documents.join(
                bld.select("doc_id"), "doc_id", "left_anti"
            )
        if until == "blocklist":
            if cfg.blocklist_domains is None:
                raise ValueError(
                    "run(until='blocklist') requires cfg.blocklist_domains "
                    "(the blocklist gate is opt-in)"
                )
            _join_check()
            self.flush_metrics()
            return out

        # per-domain anti-domination cap: like url_dedup, shuffles only
        # (doc_id, url, host) rows — and WindowGroupLimit truncates each
        # host to N rows map-side before even that.
        if cfg.domain_cap_n is not None:
            from .operators.webnorm import domain_cap

            if "url" not in documents.columns:
                raise ValueError(
                    "domain_cap_n requires a 'url' column in the source "
                    "(the cap is keyed on the url's host)"
                )
            docs_for_cap = documents
            cap_n = int(cfg.domain_cap_n)

            def s_domain_cap():
                return domain_cap(docs_for_cap.select("doc_id", "url"),
                                  cap=cap_n)

            dc = self._stage("domain_cap", s_domain_cap,
                             meta={"gate": "domain-cap-md5-v1", "cap": cap_n})
            out["domain_cap"] = dc
            documents = documents.join(
                dc.select("doc_id"), "doc_id", "left_semi"
            )
        if until == "domain_cap":
            if cfg.domain_cap_n is None:
                raise ValueError(
                    "run(until='domain_cap') requires cfg.domain_cap_n "
                    "(the per-domain cap is opt-in)"
                )
            _join_check()
            self.flush_metrics()
            return out

        filter_opts_eff: dict = {}
        if cfg.enable_filter:
            # curation gate: the decision table is a first-class output;
            # every downstream stage (span branch included — `documents`
            # is rebound before the closures below capture it) sees only
            # kept docs. left-semi join: no column duplication, and AQE
            # broadcasts the id side when the kept set is small relative
            # to the corpus.
            from .operators.textstats import corpus_filter

            # the gate must judge the text dedup actually consumes: an
            # html-only source has no raw 'text' column after the
            # documents checkpoint (only norm_text), so default the gate
            # onto whichever exists. The RESOLVED column is stamped into
            # the signature meta below — two workdirs whose gates read
            # different columns are different families.
            filter_opts_eff = dict(cfg.filter_opts or {})
            filter_opts_eff.setdefault(
                "text_col",
                "text" if "text" in documents.columns else "norm_text",
            )
            decisions = self._stage(
                "filter",
                lambda: corpus_filter(documents, **filter_opts_eff),
            )
            out["filter"] = decisions
            documents = documents.join(
                decisions.filter("keep").select("doc_id"), "doc_id", "left_semi"
            )
        if until == "filter":
            if not cfg.enable_filter:
                # asking for the gate's decision table with the gate off
                # would silently return no 'filter' key — every other
                # stage name implies its stage ran, so this one must too
                raise ValueError(
                    "run(until='filter') requires cfg.enable_filter=True "
                    "(the corpus_filter gate is opt-in)"
                )
            _join_check()
            self.flush_metrics()
            return out

        # perplexity gate: score the (filter-surviving) docs under a
        # bigram LM trained on those same docs, keep the configured band.
        # Runs BEFORE the span/signature closures capture `documents`.
        ppl_opts_eff: dict = {}
        if cfg.enable_perplexity:
            from .operators.textstats import lm_perplexity

            ppl_opts_eff = dict(cfg.perplexity_opts or {})
            if "ppl_max" not in ppl_opts_eff:
                raise ValueError(
                    "enable_perplexity requires perplexity_opts['ppl_max'] "
                    "— the gate exists to cut the high-perplexity tail"
                )
            ppl_opts_eff.setdefault("ppl_min", 0.0)
            ppl_opts_eff.setdefault(
                "text_col",
                "text" if "text" in documents.columns else "norm_text",
            )
            ppl_min = float(ppl_opts_eff["ppl_min"])
            ppl_max = float(ppl_opts_eff["ppl_max"])
            docs_for_ppl = documents  # bind NOW: the closure must score
            # the gated set even after `documents` is rebound below

            def s_perplexity():
                scored = lm_perplexity(
                    docs_for_ppl, text_col=ppl_opts_eff["text_col"])
                return scored.withColumn(
                    "keep",
                    (F.col("perplexity") >= ppl_min)
                    & (F.col("perplexity") <= ppl_max),
                )

            ppl = self._stage(
                "perplexity", s_perplexity,
                meta={"gate": "lm-perplexity-bigram-laplace-v1",
                      **{k: ppl_opts_eff[k]
                         for k in ("ppl_min", "ppl_max", "text_col")}},
            )
            out["perplexity"] = ppl
            documents = documents.join(
                ppl.filter("keep").select("doc_id"), "doc_id", "left_semi"
            )
        if until == "perplexity":
            if not cfg.enable_perplexity:
                raise ValueError(
                    "run(until='perplexity') requires "
                    "cfg.enable_perplexity=True (the gate is opt-in)"
                )
            _join_check()
            self.flush_metrics()
            return out

        # DSIR gate: score the (perplexity-surviving) docs' hashed-bigram
        # likelihood ratio against a curated target corpus, keep docs at
        # or above the configured floor.
        dsir_opts_eff: dict = {}
        if cfg.enable_dsir:
            from .operators.textstats import dsir_weights

            dsir_opts_eff = dict(cfg.dsir_opts or {})
            if "target_path" not in dsir_opts_eff:
                raise ValueError(
                    "enable_dsir requires dsir_opts['target_path'] "
                    "(parquet with a 'text' column — the curated target "
                    "distribution to tilt toward)"
                )
            if "min_avg_logratio" not in dsir_opts_eff:
                raise ValueError(
                    "enable_dsir requires dsir_opts['min_avg_logratio'] "
                    "— the gate exists to cut the off-target tail"
                )
            dsir_opts_eff.setdefault("n_buckets", 4096)
            dsir_opts_eff.setdefault("alpha", 1.0)
            dsir_opts_eff.setdefault(
                "text_col",
                "text" if "text" in documents.columns else "norm_text",
            )
            dsir_floor = float(dsir_opts_eff["min_avg_logratio"])
            docs_for_dsir = documents  # bind NOW, like the other gates

            def s_dsir():
                tgt = self.spark.read.parquet(
                    dsir_opts_eff["target_path"]
                ).select(F.col("text").alias(dsir_opts_eff["text_col"]))
                scored = dsir_weights(
                    docs_for_dsir, tgt,
                    n_buckets=int(dsir_opts_eff["n_buckets"]),
                    alpha=float(dsir_opts_eff["alpha"]),
                    text_col=dsir_opts_eff["text_col"],
                )
                return scored.withColumn(
                    "keep", F.col("avg_logratio") >= F.lit(dsir_floor)
                )

            dsir = self._stage(
                "dsir", s_dsir,
                meta={"gate": "dsir-hashed-bigram-v1",
                      **{k: dsir_opts_eff[k]
                         for k in ("target_path", "min_avg_logratio",
                                   "n_buckets", "alpha", "text_col")}},
            )
            out["dsir"] = dsir
            documents = documents.join(
                dsir.filter("keep").select("doc_id"), "doc_id", "left_semi"
            )
        if until == "dsir":
            if not cfg.enable_dsir:
                raise ValueError(
                    "run(until='dsir') requires cfg.enable_dsir=True "
                    "(the gate is opt-in)"
                )
            _join_check()
            self.flush_metrics()
            return out

        # benchmark decontamination: probe every surviving doc's k-grams
        # against the Bloom bitmap of the benchmark set, drop docs whose
        # flagged ratio exceeds the bound. Zero joins, zero corpus text
        # shuffle — the bitmap rides the plan as one array literal.
        decon_opts_eff: dict = {}
        if cfg.enable_decontaminate:
            from .operators.textstats import bloom_decontaminate

            decon_opts_eff = dict(cfg.decontaminate_opts or {})
            if "benchmark_path" not in decon_opts_eff:
                raise ValueError(
                    "enable_decontaminate requires decontaminate_opts"
                    "['benchmark_path'] (parquet with a 'text' column — "
                    "the eval set to scrub against)"
                )
            decon_opts_eff.setdefault("k", 8)
            decon_opts_eff.setdefault("m_bits", 1 << 20)
            decon_opts_eff.setdefault("n_hashes", 5)
            decon_opts_eff.setdefault("max_flagged_ratio", 0.0)
            decon_opts_eff.setdefault(
                "text_col",
                "text" if "text" in documents.columns else "norm_text",
            )
            max_ratio = float(decon_opts_eff["max_flagged_ratio"])
            docs_for_decon = documents  # bind NOW, like the other gates

            def s_decontaminate():
                bench = self.spark.read.parquet(
                    decon_opts_eff["benchmark_path"]
                ).select(F.col("text").alias(decon_opts_eff["text_col"]))
                flagged = bloom_decontaminate(
                    docs_for_decon, bench,
                    k=int(decon_opts_eff["k"]),
                    m_bits=int(decon_opts_eff["m_bits"]),
                    n_hashes=int(decon_opts_eff["n_hashes"]),
                    text_col=decon_opts_eff["text_col"],
                )
                return flagged.withColumn(
                    "keep", F.col("flagged_ratio") <= F.lit(max_ratio)
                )

            dec = self._stage(
                "decontaminate", s_decontaminate,
                meta={"gate": "bloom-decontaminate-v1",
                      **{k: decon_opts_eff[k]
                         for k in ("benchmark_path", "k", "m_bits",
                                   "n_hashes", "max_flagged_ratio",
                                   "text_col")}},
            )
            out["decontaminate"] = dec
            # the stage table holds FLAGGED docs only — unflagged docs
            # are implicitly kept, so the drop is an anti-join on the
            # over-threshold ids (a small broadcast side by construction)
            documents = documents.join(
                dec.filter(~F.col("keep")).select("doc_id"),
                "doc_id", "left_anti",
            )
        if until == "decontaminate":
            if not cfg.enable_decontaminate:
                raise ValueError(
                    "run(until='decontaminate') requires "
                    "cfg.enable_decontaminate=True (the gate is opt-in)"
                )
            _join_check()
            self.flush_metrics()
            return out

        # corpus-mixing downsample: deterministic per-stratum md5 rates
        # (pure per-row Catalyst — flow-through, zero shuffle)
        sample_opts_eff: dict = {}
        if cfg.enable_sample:
            from .operators.textstats import stratified_sample

            sample_opts_eff = dict(cfg.sample_opts or {})
            if "rates" not in sample_opts_eff:
                raise ValueError(
                    "enable_sample requires sample_opts['rates'] "
                    "(per-stratum keep rates for stratified_sample)"
                )
            sample_opts_eff.setdefault("stratum_col", "lang")
            docs_for_sample = documents
            kept = self._stage(
                "sample",
                lambda: stratified_sample(
                    docs_for_sample.select(
                        "doc_id", sample_opts_eff["stratum_col"]),
                    **sample_opts_eff,
                ).select("doc_id", "sample_u", "sample_weight"),
            )
            out["sample"] = kept
            documents = documents.join(
                kept.select("doc_id"), "doc_id", "left_semi"
            )
        if until == "sample":
            if not cfg.enable_sample:
                raise ValueError(
                    "run(until='sample') requires cfg.enable_sample=True "
                    "(the downsample is opt-in)"
                )
            _join_check()
            self.flush_metrics()
            return out

        # token-budget cut: the LAST content gate — every upstream gate
        # has already shaped the pool; this one sizes it. Two-pass
        # distributed prefix sum (see packing.select_to_budget); the
        # weight defaults to char length so the gate is usable with no
        # scored column, and any numeric column (perplexity band score,
        # dsir log-weight joined upstream) slots in via budget_opts.
        budget_opts_eff: dict = {}
        if cfg.enable_budget:
            from .operators.packing import select_to_budget

            budget_opts_eff = dict(cfg.budget_opts or {})
            if "budget" not in budget_opts_eff:
                raise ValueError(
                    "enable_budget requires budget_opts['budget'] "
                    "(the token budget the prefix must fit)"
                )
            budget_opts_eff.setdefault("weight", "chars")
            budget_opts_eff.setdefault(
                "text_col",
                "text" if "text" in documents.columns else "norm_text",
            )
            tcol = budget_opts_eff["text_col"]
            wspec = budget_opts_eff["weight"]
            if wspec == "dsir" and not cfg.enable_dsir:
                raise ValueError(
                    "budget_opts weight='dsir' requires enable_dsir=True "
                    "(the weight is the dsir stage's avg_logratio)"
                )
            if wspec == "neg_perplexity" and not cfg.enable_perplexity:
                raise ValueError(
                    "budget_opts weight='neg_perplexity' requires "
                    "enable_perplexity=True (the weight is the perplexity "
                    "stage's score)"
                )
            docs_for_budget = documents  # bind NOW (rebound below)
            score_tables = {"dsir": out.get("dsir"),
                            "neg_perplexity": out.get("perplexity")}

            def s_budget():
                base = docs_for_budget.select(
                    "doc_id",
                    F.size(F.split(F.trim(F.col(tcol)), r"\s+"))
                    .cast("long").alias("_c"),
                    *([] if wspec in score_tables
                      else [(F.length(F.col(tcol)) if wspec == "chars"
                             else F.col(wspec)).cast("long").alias("_w")]),
                )
                if wspec in score_tables:
                    # stage scores are rounded to <= 6 decimals, so the
                    # x1e6 long is lossless — selection stays integer-
                    # exact. Inner join: docs the scorer could not score
                    # (no n-grams) carry no signal and are excluded.
                    expr = {
                        "dsir": F.col("avg_logratio") * 1e6,
                        "neg_perplexity": -F.col("perplexity") * 1e6,
                    }[wspec]
                    base = base.join(
                        score_tables[wspec].select(
                            "doc_id",
                            F.round(expr, 0).cast("long").alias("_w")),
                        "doc_id",
                    )
                return select_to_budget(
                    base, budget=int(budget_opts_eff["budget"]),
                    weight_col="_w", cost_col="_c",
                )

            sel = self._stage(
                "budget", s_budget,
                meta={"gate": "budget-prefix-sum-v1",
                      **{k: budget_opts_eff[k]
                         for k in ("budget", "weight", "text_col")}},
            )
            out["budget"] = sel
            documents = documents.join(
                sel.select("doc_id"), "doc_id", "left_semi"
            )
        if until == "budget":
            if not cfg.enable_budget:
                raise ValueError(
                    "run(until='budget') requires cfg.enable_budget=True "
                    "(the budget cut is opt-in)"
                )
            _join_check()
            self.flush_metrics()
            return out

        # span_pairs depends only on `documents` — launch it on a second
        # submission thread so Spark schedules it CONCURRENTLY with the
        # signatures -> candidates -> verify chain (independent DAG
        # branches; neither alone saturates the cluster at every moment).
        # Joined before clusters, and always before returning.
        span_future = None
        pool = None
        if cfg.enable_span and until not in ("documents", "signatures",
                                             "candidates", "tier_report",
                                             "span_pairs"):
            import concurrent.futures

            # span_report depends only on (documents, span_pairs), so it
            # chains on the SAME side thread and overlaps the SW verify —
            # running it after `verified` on the main thread measured +9s
            # of serial wall at bench scale. Skipped when `until` stops
            # at `verified` (its block below never runs there either).
            chain_report = until != "verified"

            def _span_chain():
                sp = self._stage(
                    "span_pairs",
                    lambda: winnow_span_pairs(documents, d, keep_witness=True),
                )
                rep = None
                if chain_report:
                    rep = self._stage(
                        "span_report",
                        lambda: span_extents(documents, d, span_pairs=sp),
                    )
                return sp, rep

            pool = concurrent.futures.ThreadPoolExecutor(1)
            span_future = pool.submit(_span_chain)

        def _join_span():
            if span_future is None:
                return
            import sys

            unwinding = sys.exc_info()[0] is not None
            try:
                sp, rep = span_future.result()
                out["span_pairs"] = sp
                if rep is not None:
                    out["span_report"] = rep
            except Exception:
                # when called from `finally` during another exception's
                # unwind, a span-branch failure (usually the same root
                # cause) must not REPLACE the primary traceback
                if not unwinding:
                    raise
            finally:
                pool.shutdown(wait=False)

        try:
            signatures = self._stage(
                "signatures", lambda: compute_signatures(documents, d),
                # the gate key is stamped only when the gate is ON: a
                # gate-off stamp stays byte-identical to pre-gate
                # checkpoints (their resumes keep working), while any
                # on<->off toggle of one workdir still mismatches
                meta={**signature_meta(d),
                      **({"unicode_gate": {"gate": "unicode-nfc-v1"}}
                         if cfg.unicode_nfc else {}),
                      **({"url_gate": {"gate": "url-canonical-v1"}}
                         if cfg.enable_url_dedup else {}),
                      **({"blocklist_gate": {"gate": "url-blocklist-suffix-v1",
                                             "list_sha": blocklist_hash}}
                         if cfg.blocklist_domains is not None else {}),
                      **({"domain_cap_gate": {"gate": "domain-cap-md5-v1",
                                              "cap": int(cfg.domain_cap_n)}}
                         if cfg.domain_cap_n is not None else {}),
                      **({"input_gate": {"gate": "corpus_filter-v1",
                                         **filter_opts_eff}}
                         if cfg.enable_filter else {}),
                      **({"perplexity_gate": {
                              "gate": "lm-perplexity-bigram-laplace-v1",
                              **{k: ppl_opts_eff[k] for k in
                                 ("ppl_min", "ppl_max", "text_col")}}}
                         if cfg.enable_perplexity else {}),
                      **({"dsir_gate": {
                              "gate": "dsir-hashed-bigram-v1",
                              **{k: dsir_opts_eff[k] for k in
                                 ("target_path", "min_avg_logratio",
                                  "n_buckets", "alpha", "text_col")}}}
                         if cfg.enable_dsir else {}),
                      **({"decontaminate_gate": {
                              "gate": "bloom-decontaminate-v1",
                              **{k: decon_opts_eff[k]
                                 for k in ("benchmark_path", "k", "m_bits",
                                           "n_hashes", "max_flagged_ratio",
                                           "text_col")}}}
                         if cfg.enable_decontaminate else {}),
                      **({"sample_gate": {"gate": "stratified-md5-v1",
                                          **sample_opts_eff}}
                         if cfg.enable_sample else {}),
                      **({"budget_gate": {"gate": "budget-prefix-sum-v1",
                                          **budget_opts_eff}}
                         if cfg.enable_budget else {})},
            )
            out["signatures"] = signatures
            if until == "signatures":
                _join_check()
                self.flush_metrics()
                return out

            candidates = self._stage(
                "candidates",
                lambda: unified_candidate_pairs(
                    signatures, d, include_simhash=cfg.enable_simhash
                ),
            )
            out["candidates"] = candidates
            if until == "candidates":
                _join_check()
                self.flush_metrics()
                return out

            # tier_report: per-pair tier attribution over the SAME
            # signature table (exact > LSH > tier-2 > SimHash) — pure
            # analysis deliverable, checkpointed, never consumed by the
            # dedup chain itself. Sequential on purpose: it is opt-in
            # and its one pairing shuffle would contend with the
            # candidates/verify chain if overlapped.
            if cfg.enable_tier_report:
                out["tier_report"] = self._stage(
                    "tier_report",
                    lambda: candidate_tier_attribution(signatures, d),
                )
            if until == "tier_report":
                if not cfg.enable_tier_report:
                    # same contract as until='filter': a stage name
                    # implies its stage ran
                    raise ValueError(
                        "run(until='tier_report') requires "
                        "cfg.enable_tier_report=True (the attribution "
                        "pass is opt-in)"
                    )
                _join_check()
                self.flush_metrics()
                return out

            if cfg.enable_span and span_future is None:
                out["span_pairs"] = self._stage(
                    "span_pairs",
                    lambda: winnow_span_pairs(documents, d, keep_witness=True),
                )
            if until == "span_pairs":
                _join_check()
                self.flush_metrics()
                return out

            verified = self._stage(
                "verified",
                lambda: verify_pairs(
                    candidates, documents, d,
                    num_partitions=cfg.pair_partitions, signatures=signatures,
                ),
            )
            out["verified"] = verified
        finally:
            # always join the concurrent span branch (success or failure)
            _join_span()
            # and never leak the invariant-check thread on an error path
            # (shutdown(wait=False) is idempotent and does not cancel the
            # in-flight future, so the success path's _join_check below
            # still reads its result)
            if check_future is not None and check_pool is not None:
                check_pool.shutdown(wait=False)
        _join_check()
        if until == "verified":
            self.flush_metrics()
            return out

        # span_report: the shared-boilerplate block deliverable — witness
        # grams of confirmed span pairs extended to maximal byte-identical
        # extents (offsets + length per pair). Stays OUT of clustering,
        # like span_pairs itself.
        if cfg.enable_span and "span_pairs" in out and "span_report" not in out:
            # sequential fallback (the concurrent branch normally chains
            # span_report; this path serves `until`-interrupted resumes)
            sp = out["span_pairs"]
            if "a_off" not in sp.columns:
                # resumed from a pre-witness span_pairs checkpoint
                sp = winnow_span_pairs(documents, d, keep_witness=True)
            out["span_report"] = self._stage(
                "span_report",
                lambda: span_extents(documents, d, span_pairs=sp),
            )
        if until == "span_report":
            self.flush_metrics()
            return out

        # virtual stage: a pure filter of the checkpointed `verified` table;
        # recomputing on resume is free, so no checkpoint of its own
        edges = verified.filter("verified").select("a", "b")
        out["edges"] = edges
        if until == "edges":
            self.flush_metrics()
            return out

        clusters = self._stage(
            "clusters", lambda: assign_clusters(documents, edges)
        )
        out["clusters"] = clusters
        if until == "clusters":
            self.flush_metrics()
            return out

        def s_canonical():
            joined = documents.join(clusters, "doc_id")
            order = [F.asc("warc_ts")] if "warc_ts" in documents.columns else []
            order += [F.asc("url")] if "url" in documents.columns else [F.asc("doc_id")]
            w = Window.partitionBy("cluster_id").orderBy(*order)
            return (
                joined.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn", "norm_text")
            )

        out["canonical"] = self._stage("canonical", s_canonical)
        self.flush_metrics()
        return out
