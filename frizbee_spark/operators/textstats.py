"""Text-analysis operators for training-data pipelines — all Catalyst.

Every operator here compiles to built-in Spark SQL expressions (JVM-side,
whole-stage codegen, no Python), so each has an exact ANSI-SQL oracle in
__spark_entry__.oracle_sql(). These are the language-ID / quality /
token-count / fingerprint components a 100 TB curation pipeline runs
before dedup; they share the scan with the signature stage (column
pruning keeps the parquet read narrow).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# fixed marker lists (deterministic; mirrored verbatim in the SQL oracles)
STOPWORDS = ("the", "a", "of", "and", "to", "in", "table", "row", "data", "value")
LANG_MARKERS = {
    "en": ("the", "and", "of", "with", "for"),
    "de": ("der", "die", "das", "und", "mit"),
    "fr": ("le", "la", "les", "et", "avec"),
}


def token_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace token counting + distinct counts + mean token length."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    return df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        F.round(
            (F.length(F.trim(F.col(text_col))) - F.size(toks) + 1)
            / F.size(toks), 4
        ).alias("avg_token_len"),
    )


# GPT-2-style pre-tokenizer, restricted to the regex subset Java
# (Spark) and RE2 (DuckDB) interpret identically: contractions, then
# space-prefixed letter runs, digit runs, punctuation runs, then
# residual whitespace. (The original adds a \s+(?!\S) lookahead, which
# RE2 lacks — without it trailing-whitespace tokens merge, a difference
# only for multi-space runs, and both engines agree on this variant.)
BPE_PRETOKEN_RE = "'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+| +"


def bpe_token_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """BPE-ish token counting: the whitespace count plus the GPT-2-style
    pre-tokenizer split (the unit a byte-pair encoder would merge
    within). tokens_per_word > 1 flags punctuation/digit-dense docs that
    tokenize expensively — a standard curation signal."""
    t = F.col(text_col)
    ws = F.split(F.trim(t), r"\s+")
    bpe_n = F.size(F.expr(
        f"regexp_extract_all({text_col}, \"{BPE_PRETOKEN_RE}\", 0)"
    ))
    return df.select(
        F.col(id_col),
        bpe_n.cast("long").alias("n_bpe_tokens"),
        F.size(ws).cast("long").alias("n_ws_tokens"),
        F.round(bpe_n / F.size(ws), 4).alias("tokens_per_word"),
    )


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Cheap quality heuristics: length, alpha/digit/space ratios,
    stopword ratio. Mirrors the reference's "cheap gate before the
    expensive kernel" philosophy (prefilter, src/prefilter/mod.rs:1-12)
    applied to corpus curation."""
    t = F.col(text_col)
    n = F.length(t).cast("double")
    toks = F.split(F.trim(t), r"\s+")
    stop_hits = F.size(F.array_intersect(F.array_distinct(toks),
                                         F.array(*[F.lit(w) for w in STOPWORDS])))
    digits = n - F.length(F.regexp_replace(t, r"[0-9]", ""))
    spaces = n - F.length(F.regexp_replace(t, r" ", ""))
    return df.select(
        F.col(id_col),
        F.length(t).cast("long").alias("n_chars"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.round(digits / n, 4).alias("digit_ratio"),
        F.round(spaces / n, 4).alias("space_ratio"),
        F.round(stop_hits / F.size(F.array_distinct(toks)), 4).alias("stopword_ratio"),
        (
            (F.length(t) >= 50)
            & (digits / n < 0.3)
            & (F.size(toks) >= 10)
        ).alias("passes_quality"),
    )


def language_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Marker-word language-ID heuristic: count per-language marker hits
    over distinct lowercase tokens; argmax with deterministic tie-break
    (en > de > fr), 'und' when nothing matches."""
    toks = F.array_distinct(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
    hits = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in LANG_MARKERS.items()
    }
    best = F.greatest(*hits.values())
    pred = (
        F.when(best == 0, "und")
        .when(hits["en"] == best, "en")
        .when(hits["de"] == best, "de")
        .otherwise("fr")
    )
    return df.select(F.col(id_col), pred.alias("lang_pred"),
                     *[hits[l].cast("long").alias(f"hits_{l}") for l in ("en", "de", "fr")])


def doc_fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit-ish content fingerprint: first 15 hex chars of md5 as bigint
    (portable across engines — the SQL oracle computes the identical
    value). Used for grouping byte-identical docs without carrying text."""
    fp = F.conv(F.substring(F.md5(F.col(text_col)), 1, 15), 16, 10).cast("long")
    return df.select(F.col(id_col), fp.alias("fingerprint"))


def source_overlap(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Cross-source redundancy matrix — the report a curation pipeline
    runs BEFORE mixing corpora: for every unordered source pair (a, b),
    how much of a is byte-identical content that also appears in b (a
    Common-Crawl snapshot re-crawling a news site, a books corpus that
    partially ships inside a web dump — double-counted mass that skews
    mixing weights and leaks across train/eval source splits).

    Content identity is :func:`doc_fingerprint`'s portable md5 long.
    Per pair: ``shared_fingerprints`` (distinct contents present in
    BOTH), ``docs_a_in_b`` / ``docs_b_in_a`` (doc counts on each side
    whose content the other source also has), and ``frac_a`` /
    ``frac_b`` (those counts over each source's total doc count,
    rounded to 6 — the "x% of a is already in b" number people quote).
    ``source_a < source_b`` lexicographically; pairs with no overlap
    don't appear.

    Plan shape (scale notes): one map-side-combined aggregate to
    (fingerprint, source, n) — text is hashed in the scan and never
    shuffles — then one fingerprint-keyed aggregate collecting each
    content's per-source counts (bounded by the SOURCE CARDINALITY, a
    few hundred at worst — never by doc count), pair expansion via
    higher-order array functions (no self-join re-shuffle: the classic
    SQL formulation self-joins the (fp, source) table on fp, which
    shuffles it twice; the DuckDB oracle does exactly that as an
    independent derivation), and a final tiny aggregate keyed by source
    pair. Per-source totals ride in as a broadcast join of a
    #sources-row table.
    """
    fp = F.conv(
        F.substring(F.md5(F.col(text_col)), 1, 15), 16, 10
    ).cast("long")
    per = (
        df.select(F.col(source_col).alias("src"), fp.alias("fp"))
        .groupBy("fp", "src").agg(F.count("*").alias("n"))
    )
    grouped = (
        per.groupBy("fp")
        .agg(F.sort_array(F.collect_list(F.struct("src", "n"))).alias("ss"))
        .filter(F.size("ss") > 1)
    )
    # all ordered pairs i < j of the per-source structs — sources per
    # fingerprint are bounded by source cardinality, so the expansion is
    # O(k^2) with tiny k, flat-mapped in one projection
    idx = F.sequence(F.lit(1), F.size("ss"))
    pairs = grouped.select(
        F.explode(
            F.flatten(
                F.transform(
                    idx,
                    lambda i: F.transform(
                        F.slice(F.col("ss"), i + 1, F.size("ss")),
                        lambda right: F.struct(
                            F.element_at(F.col("ss"), i)["src"]
                                .alias("source_a"),
                            right["src"].alias("source_b"),
                            F.element_at(F.col("ss"), i)["n"].alias("na"),
                            right["n"].alias("nb"),
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.*")
    agg = pairs.groupBy("source_a", "source_b").agg(
        F.count("*").alias("shared_fingerprints"),
        F.sum("na").alias("docs_a_in_b"),
        F.sum("nb").alias("docs_b_in_a"),
    )
    totals = df.groupBy(F.col(source_col).alias("src")).agg(
        F.count("*").alias("total")
    )
    return (
        agg.join(F.broadcast(totals.withColumnsRenamed(
            {"src": "source_a", "total": "_ta"})), "source_a")
        .join(F.broadcast(totals.withColumnsRenamed(
            {"src": "source_b", "total": "_tb"})), "source_b")
        .select(
            "source_a", "source_b", "shared_fingerprints",
            "docs_a_in_b", "docs_b_in_a",
            F.round(F.col("docs_a_in_b") / F.col("_ta"), 6).alias("frac_a"),
            F.round(F.col("docs_b_in_a") / F.col("_tb"), 6).alias("frac_b"),
        )
    )


def _kgram_col(text_col: str, k: int):
    """Array of the k-token grams of ``text_col`` (distinct, in-order
    positions 1..max(n_tokens-k+1, 1) — the clamp keeps short docs
    contributing their full text as one gram, mirrored in the oracles)."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - (k - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        )
    )


def ngram_contamination(
    df: DataFrame,
    benchmark: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing any k-token
    n-gram with a benchmark/eval set (the standard training-data
    decontamination pass, run before any eval-adjacent corpus ships).

    Plan shape: the benchmark side is DISTINCT'd and **broadcast** — an
    eval suite is thousands of docs against a 10^12-doc corpus, so the
    small side always fits and the corpus-side probe is a broadcast hash
    join inside the scan stage (zero shuffle of corpus grams); the only
    shuffle is the per-doc count aggregate, partially combined map-side.

    Output: one row per contaminated corpus doc —
    (doc_id, n_grams, n_contaminated_grams, contamination_ratio).
    """
    grams = _kgram_col(text_col, k)
    corpus = df.select(F.col(id_col).alias("doc_id"), F.explode(grams).alias("gr"))
    bench = (
        benchmark.select(F.explode(_kgram_col(text_col, k)).alias("gr"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    per_doc = (
        corpus.join(F.broadcast(bench), "gr", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_contaminated_grams"),
        )
    )
    return (
        per_doc.filter(F.col("n_contaminated_grams") > 0)
        .withColumn(
            "contamination_ratio",
            F.round(F.col("n_contaminated_grams") / F.col("n_grams"), 4),
        )
    )


def _bloom_pos(gram_col, i: int, m_bits: int, hash_fn: str = "md5"):
    """Bit position i of a gram.

    ``md5`` (default): engine-identical (same idiom as
    :func:`hash_split` — DuckDB re-derives it exactly, so even Bloom
    FALSE POSITIVES are oracle-reproducible). 15 hex chars < 2^60, so
    the conv result is a non-negative bigint under ANSI mode.

    ``xxhash64``: the production fast path — JVM-native, no hex
    round-trip. Measured 1.1-1.3x cheaper end-to-end at sf0.1 (the gram
    explode+aggregate dominates that wall, not the digest; the hash
    delta grows with n_hashes and gram density). Not portable to the
    SQL oracle (DuckDB has no xxhash64), so it trades cross-engine
    checkability for a modest speedup; the FP-free-config equivalence
    to the exact-join operator still pytest-pins it.
    """
    if hash_fn == "xxhash64":
        return F.pmod(
            F.xxhash64(F.concat(F.lit(f"bloom{i}:"), gram_col)), m_bits
        )
    return (
        F.conv(F.substring(
            F.md5(F.concat(F.lit(f"bloom{i}:"), gram_col)), 1, 15), 16, 10)
        .cast("long") % m_bits
    )


def bloom_decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    k: int = 8,
    m_bits: int = 1 << 20,
    n_hashes: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "md5",
) -> DataFrame:
    """Benchmark decontamination through a REAL Bloom filter — the
    at-scale replacement for :func:`ngram_contamination`'s broadcast
    gram join. The exact join must broadcast the benchmark's distinct
    gram STRINGS (an eval suite of 10M 8-token grams is ~0.5 GB on every
    executor); the Bloom filter is ``m_bits`` bits NO MATTER how many
    grams the eval set has, at a quantified false-positive cost of
    ``(1 - e^(-n_hashes * n_grams / m_bits))^n_hashes`` per probed gram
    (size m at 10-20 bits/gram: ~0.5-0.02% FP). FPs only ever
    OVER-flag — decontamination drops a few extra docs, never leaks an
    eval gram through.

    Build (benchmark side): explode grams -> n_hashes md5-derived bit
    positions each -> DISTINCT -> one driver collect bounded by m_bits
    positions (8 MB of longs at the 2^20 default — an O(m) driver path
    by construction, same discipline as IVF training), packed into
    m_bits/64 int64 words.

    Probe (corpus side): the word array rides the plan as ONE array
    literal; each gram computes its n_hashes positions and tests
    ``(words[pos >> 6] >> (pos & 63)) & 1`` — pure codegen'd longs,
    ZERO joins, zero corpus-side shuffle except the final map-side-
    combined per-doc aggregate. At 10^12 docs this runs at parquet-scan
    speed; keep ``m_bits`` at the default 2^20 unless the eval set
    demands more (the literal ships once per task closure, 128 KB
    there).

    Hashing is the repo's portable md5->integer idiom, so the DuckDB
    oracle recomputes the identical positions and set-bit membership:
    the contract hash-checks the true Bloom semantics, false positives
    included. Pass ``hash_fn="xxhash64"`` for the production hash
    (JVM-native; measured 1.1-1.3x cheaper end-to-end at sf0.1 — the
    gram explode+aggregate dominates the ~11s wall there, so the digest
    swap is a modest win that grows with n_hashes; identical plan shape
    and FP bound) when cross-engine checkability isn't needed at
    runtime. Build and probe always share the one hash choice — a
    bitmap built under one function is meaningless under the other.

    Output: one row per FLAGGED doc —
    (doc_id, n_grams, n_flagged_grams, flagged_ratio). With an FP-free
    configuration this equals :func:`ngram_contamination`'s output
    modulo column names (pytest-pinned); under load the extra rows are
    exactly the arithmetic FPs.
    """
    if m_bits <= 0 or m_bits % 64:
        raise ValueError(f"m_bits must be a positive multiple of 64, got {m_bits}")
    if n_hashes <= 0:
        raise ValueError(f"n_hashes must be positive, got {n_hashes}")
    if hash_fn not in ("md5", "xxhash64"):
        raise ValueError(f"hash_fn must be 'md5' or 'xxhash64', got {hash_fn!r}")

    import numpy as np

    bench_grams = (
        benchmark.select(F.explode(_kgram_col(text_col, k)).alias("gr")).distinct()
    )
    pos_rows = (
        bench_grams.select(
            F.explode(F.array(*[
                _bloom_pos(F.col("gr"), i, m_bits, hash_fn)
                for i in range(n_hashes)
            ])).alias("pos")
        )
        .distinct()
        .collect()
    )
    words = np.zeros(m_bits // 64, dtype=np.uint64)
    if pos_rows:
        pos = np.fromiter((r.pos for r in pos_rows), dtype=np.int64,
                          count=len(pos_rows))
        np.bitwise_or.at(words, pos >> 6,
                         np.uint64(1) << (pos.astype(np.uint64) & np.uint64(63)))
    bitmap = F.lit(words.view(np.int64).tolist())

    def bit_set(pos_expr):
        # arithmetic shift on a negative word still yields the right low
        # bit for every index — only bit `pos & 63` survives the mask.
        # call_function: the SQL shiftright takes a COLUMN shift amount
        # (the PySpark wrapper only accepts a literal int)
        word = F.element_at(
            bitmap, (F.call_function("shiftright", pos_expr, F.lit(6)) + 1)
            .cast("int"))
        # & 1, NOT % 2: Spark's % keeps the dividend's sign, so a
        # negative shifted word would test -1 == 1 and silently drop bits
        return (
            F.call_function("shiftright", word,
                            F.pmod(pos_expr, 64).cast("int"))
            .bitwiseAND(F.lit(1)) == 1
        )

    gram_hit = F.lit(True)
    for i in range(n_hashes):
        gram_hit = gram_hit & bit_set(
            _bloom_pos(F.col("gr"), i, m_bits, hash_fn))
    per_doc = (
        df.select(F.col(id_col).alias("doc_id"),
                  F.explode(_kgram_col(text_col, k)).alias("gr"))
        .select("doc_id", gram_hit.cast("int").alias("_hit"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_grams"),
             F.sum("_hit").alias("n_flagged_grams"))
    )
    return (
        per_doc.filter(F.col("n_flagged_grams") > 0)
        .withColumn("flagged_ratio",
                    F.round(F.col("n_flagged_grams") / F.col("n_grams"), 4))
    )


def _chunk_md5_array(toks, chunk_tokens: int):
    """(n_chunks expr, array<string> expr of per-chunk md5 hashes) for
    non-overlapping ``chunk_tokens``-token windows over a token array.

    Shared between :func:`dup_chunks` (detection) and
    :func:`dedup_rewrite` (keep-first rewrite) — the chunk boundaries and
    hash MUST stay bit-identical between them (both DuckDB oracles
    re-derive this exact windowing), so the expression lives once.
    Tail tokens past the last full window are never hashed.
    """
    n_chunks = F.floor(F.size(toks) / chunk_tokens).cast("int")
    chunks = F.when(
        n_chunks >= 1,
        F.transform(
            F.sequence(F.lit(1), n_chunks),
            lambda c: F.md5(F.concat_ws(
                " ", F.slice(toks, (c - 1) * chunk_tokens + 1, chunk_tokens))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return n_chunks, chunks


def dup_chunks(
    df: DataFrame,
    chunk_tokens: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Chunk-level exact dedup (the paragraph-dedup operator, CCNet-style,
    generalized to fixed token windows since web-extracted text here has
    no paragraph marks): split each doc into non-overlapping
    ``chunk_tokens``-token chunks, hash each, and report every chunk
    occurring in more than one distinct doc.

    Plan shape: explode chunk hashes (md5 strings only — text never
    shuffles) -> one hash-partitioned aggregate with map-side combine.
    At scale the >1-doc filter is applied post-combine, so singleton
    chunks (the overwhelming majority) die in the partial aggregation.

    Output: (chunk_md5, n_docs, n_occurrences, rep_doc_id).
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    _, chunks = _chunk_md5_array(toks, chunk_tokens)
    ch = df.select(F.col(id_col).alias("doc_id"), F.explode(chunks).alias("chunk_md5"))
    return (
        ch.groupBy("chunk_md5")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occurrences"),
            F.min("doc_id").alias("rep_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


def dedup_rewrite(
    df: DataFrame,
    chunk_tokens: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Keep-first duplicate-span REMOVAL — the rewrite step that turns
    :func:`dup_chunks`'s detections into a deduplicated corpus (Lee et
    al. 2022, "Deduplicating Training Data Makes Language Models
    Better"; C4's duplicate-span drop). Every non-overlapping
    ``chunk_tokens``-token window whose exact text occurred earlier in
    the corpus — ordered by (doc_id, chunk index), across AND within
    documents — is deleted from the document; the corpus-wide first
    occurrence and the unhashed tail tokens are always kept.

    Plan shape (one text shuffle total, the unavoidable reassembly):
      1. per-doc chunk-md5 arrays via the shared :func:`_chunk_md5_array`
         expression — text never leaves the row;
      2. explode (doc_id, idx, md5) — ints + 32-char hashes only;
      3. winner table: one md5-keyed aggregate with map-side combine,
         filtered to ``count > 1`` so the join's build side holds only
         genuinely duplicated chunks (singletons — the overwhelming
         majority at web scale — die in the partial aggregate);
      4. removal lists per doc (small int arrays), joined back to the
         full rows on ``doc_id`` (AQE-planned; the only exchange that
         carries text) and applied with a codegen'd ``filter`` lambda.

    Output, one row per input doc: (doc_id, n_chunks, n_removed,
    cleaned_tokens, cleaned_text). ``cleaned_text`` is the kept tokens
    re-joined with single spaces (whitespace-normalized, like every
    tokenizing operator in this module).

    Semantics echo frizbee's exact-match fast path (reference
    src/lib.rs match_list exact gate) promoted to span granularity.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n_chunks, chunk_md5s = _chunk_md5_array(toks, chunk_tokens)
    ch = (
        df.select(F.col(id_col).alias("doc_id"),
                  F.posexplode(chunk_md5s).alias("idx0", "chunk_md5"))
        .select("doc_id", (F.col("idx0") + 1).alias("idx"), "chunk_md5")
    )
    winners = (
        ch.groupBy("chunk_md5")
        .agg(F.count("*").alias("cnt"),
             F.min(F.struct("doc_id", "idx")).alias("w"))
        .filter(F.col("cnt") > 1)
        .select("chunk_md5", F.col("w.doc_id").alias("w_doc"),
                F.col("w.idx").alias("w_idx"))
    )
    removed = (
        ch.join(winners, "chunk_md5")
        .filter(~((F.col("doc_id") == F.col("w_doc"))
                  & (F.col("idx") == F.col("w_idx"))))
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("idx")).alias("rix"))
    )
    base = df.select(F.col(id_col).alias("doc_id"), toks.alias("_ts"),
                     n_chunks.alias("_nc"))
    rix = F.coalesce(F.col("rix"), F.array().cast("array<int>"))
    # token j (0-based) lives in 1-based chunk floor(j/chunk_tokens)+1;
    # chunks past _nc are the unhashed tail and always survive
    kept = F.filter(
        F.col("_ts"),
        lambda t, j: (F.floor(j / chunk_tokens) + 1 > F.col("_nc"))
        | ~F.array_contains(rix, (F.floor(j / chunk_tokens) + 1).cast("int")),
    )
    return (
        base.join(removed, "doc_id", "left")
        .select(
            "doc_id",
            F.col("_nc").cast("long").alias("n_chunks"),
            F.coalesce(F.size("rix"), F.lit(0)).cast("long").alias("n_removed"),
            F.size(kept).cast("long").alias("cleaned_tokens"),
            F.concat_ws(" ", kept).alias("cleaned_text"),
        )
    )


def line_dedup(
    df: DataFrame,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Line-level boilerplate removal (RefinedWeb / CCNet convention):
    any line whose exact text appears in >= ``min_docs`` DISTINCT
    documents is template boilerplate (nav bars, footers, cookie
    banners) and is dropped from EVERY document — unlike
    :func:`dedup_rewrite`'s keep-first rule, boilerplate has no
    "first occurrence worth keeping". Whitespace-only lines are never
    counted and never removed (they are formatting, not content, and
    they trivially co-occur everywhere).

    Plan shape (one text shuffle, mirroring :func:`dedup_rewrite`):
      1. per-doc line-md5 arrays — text stays in its row;
      2. explode distinct (doc_id, line_md5) — countDistinct(doc) per
         line becomes a plain count after the in-row array_distinct, so
         the aggregate is single-phase with map-side combine;
      3. boilerplate table = hashes with count >= min_docs (tiny at web
         scale relative to the corpus — AQE broadcasts it);
      4. per-doc removal sets joined back on doc_id (the only exchange
         carrying text) and applied with a codegen'd filter lambda;
         lines are re-joined with a single newline.

    Output, one row per input doc: (doc_id, n_lines, n_removed,
    cleaned_text).
    """
    if min_docs < 2:
        raise ValueError(f"line_dedup needs min_docs >= 2, got {min_docs}")
    lines = F.split(F.col(text_col), "\n")
    is_content = lambda ln: F.trim(ln) != ""  # noqa: E731
    content_md5s = F.array_distinct(
        F.transform(F.filter(lines, is_content), F.md5))
    ch = df.select(F.col(id_col).alias("doc_id"),
                   F.explode(content_md5s).alias("line_md5"))
    boiler = (
        ch.groupBy("line_md5")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )
    removed = (
        ch.join(boiler, "line_md5")
        .groupBy("doc_id")
        .agg(F.collect_set("line_md5").alias("rmv"))
    )
    base = df.select(F.col(id_col).alias("doc_id"), lines.alias("_ls"))
    rmv = F.coalesce(F.col("rmv"), F.array().cast("array<string>"))
    kept = F.filter(
        F.col("_ls"),
        lambda ln: (F.trim(ln) == "") | ~F.array_contains(rmv, F.md5(ln)),
    )
    n_content = F.size(F.filter(F.col("_ls"), is_content))
    n_kept_content = F.size(F.filter(kept, is_content))
    return (
        base.join(removed, "doc_id", "left")
        .select(
            "doc_id",
            F.size("_ls").cast("long").alias("n_lines"),
            (n_content - n_kept_content).cast("long").alias("n_removed"),
            F.concat_ws("\n", kept).alias("cleaned_text"),
        )
    )


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    gram_k: int = 3,
) -> DataFrame:
    """Gopher-style within-document repetition signals — the standard
    webtext quality gate that catches boilerplate/spam pages whose
    *cross-document* signals look fine (Rae et al. 2021, "Scaling
    Language Models", §A1.1 repetition filters; public heuristic).

    Per doc: token count, fraction of tokens that are the single most
    frequent token (``top_unigram_frac``), and the fraction of k-gram
    positions covered by k-grams occurring more than once in the doc
    (``dup_gram_frac``). High values of either flag keyword-stuffed or
    template pages for removal before dedup ever runs.

    Plan shape: two explode -> aggregate chains whose keys BOTH include
    ``doc_id`` — the shuffle is uniformly spread (no hot keys possible:
    a key's row count is bounded by one document's length), partial
    aggregation combines map-side, and text never shuffles (only grams).
    The final per-doc join is on ``doc_id``, AQE-planned. This is the
    100 TB-safe shape; a per-row higher-order-function variant would
    avoid the shuffle but costs O(len^2) compute per doc on long docs.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    # k-gram positions (NOT distinct — occurrence counts matter here);
    # short docs clamp to one gram of the whole text, as in _kgram_col
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (gram_k - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, gram_k)),
    )
    uni = (
        df.select(F.col(id_col).alias("doc_id"), F.explode(toks).alias("w"))
        .groupBy("doc_id", "w").agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").alias("n_tokens"), F.max("c").alias("_top"))
    )
    gr = (
        df.select(F.col(id_col).alias("doc_id"), F.explode(grams).alias("g"))
        .groupBy("doc_id", "g").agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("_n_grams"),
            F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(F.lit(0))).alias("_dup"),
        )
    )
    return (
        uni.join(gr, "doc_id")
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.round(F.col("_top") / F.col("n_tokens"), 4).alias("top_unigram_frac"),
            F.round(F.col("_dup") / F.col("_n_grams"), 4).alias("dup_gram_frac"),
        )
    )


def length_profile(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Corpus length histogram: power-of-two ``n_chars`` buckets with doc
    count and char mass per bucket — the profiling rollup a curation run
    uses to pick partition sizing and length cutoffs before heavy stages.

    Reads ONLY ``length(text)`` (or a pre-materialized length column):
    column pruning keeps the parquet scan to one column, and the single
    groupBy on ~30 possible bucket keys combines map-side to almost
    nothing — at 100 TB this is scan-bound, which is the point.
    """
    n = F.length(F.col(text_col))
    bucket = F.floor(F.log2(F.greatest(n, F.lit(1)))).cast("int")
    return (
        df.select(bucket.alias("len_bucket"), n.alias("_n"))
        .groupBy("len_bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_n").cast("long").alias("total_chars"),
            F.min("_n").cast("long").alias("min_chars"),
            F.max("_n").cast("long").alias("max_chars"),
        )
    )


def exact_dup_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct text with its
    duplicate count and representative (min id). Map-side partial
    aggregation makes this one shuffle of (hash, id) pairs at scale."""
    return (
        df.select(F.md5(F.col(text_col)).alias("text_md5"), F.col(id_col))
        .groupBy("text_md5")
        .agg(F.count("*").alias("dup_count"), F.min(id_col).alias("rep_doc_id"))
    )


def _shingle_intersection(
    df: DataFrame, id_col: str, text_col: str, k: int, max_shingle_freq: int
) -> DataFrame:
    """Shared subplan of the exact shingle-pair operators: explode
    distinct k-word shingles -> hot-shingle cap -> shingle-keyed
    self-join -> per-pair intersection count + both set sizes. Output:
    (a, b, i, na, nb) for a < b. ONE implementation on purpose — the
    Jaccard and containment operators (and their two SQL oracles) depend
    on bit-identical cap semantics, which is exactly what would drift if
    this subplan were pasted per operator.

    ``max_shingle_freq`` drops shingles appearing in more docs than the
    cap from the intersection join: a boilerplate shingle in m docs emits
    C(m, 2) join rows, a single hot key that kills the stage at scale.
    Dropped shingles still count toward set sizes, so ratios for pairs
    kept together only by boilerplate are (correctly) underestimated. The
    SQL oracles apply the identical cap.
    """
    from ..util import widen_if_narrow

    df = widen_if_narrow(df)
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - (k - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        )
    )
    sh = df.select(F.col(id_col).alias("doc_id"), F.explode(shingles).alias("sh"))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    rare = (
        sh.groupBy("sh").agg(F.count("*").alias("_df"))
        .filter(F.col("_df") <= max_shingle_freq)
        .select("sh")
    )
    capped = sh.join(rare, "sh")
    inter = (
        capped.alias("x")
        .join(capped.alias("y"), (F.col("x.sh") == F.col("y.sh"))
              & (F.col("x.doc_id") < F.col("y.doc_id")))
        .groupBy(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .agg(F.count("*").alias("i"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"doc_id": "a", "n_sh": "na"}), "a")
        .join(sizes.withColumnsRenamed({"doc_id": "b", "n_sh": "nb"}), "b")
    )


def shingle_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: int = 1000,
) -> DataFrame:
    """Exact k-word-shingle Jaccard over all pairs — the brute-force
    n-gram dedup operator (and the oracle MinHash-LSH approximates).

    Plan shape: explode distinct shingles -> self-equi-join on shingle
    (Catalyst sort-merge; the shingle key distributes the quadratic work)
    -> pair-count aggregate -> join per-doc set sizes (shared subplan:
    :func:`_shingle_intersection`, incl. the hot-shingle cap). At 100 TB
    this exact variant is only run on samples / bucket-candidates; the
    LSH path replaces the all-pairs join.
    """
    return (
        _shingle_intersection(df, id_col, text_col, k, max_shingle_freq)
        .withColumn("jaccard", F.round(F.col("i") / (F.col("na") + F.col("nb") - F.col("i")), 4))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def shingle_containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.8,
    max_shingle_freq: int = 1000,
) -> DataFrame:
    """Asymmetric near-dup detection: shingle-set CONTAINMENT
    |A∩B| / |A| per direction — the measure that catches a short doc
    quoted/embedded inside a long one, which symmetric Jaccard dilutes
    below any usable threshold (|A∩B| / |A∪B| ~ |A|/|B| for a full
    quote). The standard companion to Jaccard dedup in web pipelines
    (Broder's containment; supersets, quotes, syndicated excerpts).

    Output: (a, b, contain_a_in_b, contain_b_in_a) for a < b, kept when
    either ROUNDED direction reaches ``threshold`` (rounding first keeps
    the SQL oracle's cut identical). Plan shape, hot-shingle cap, and
    scale caveats are exactly :func:`shingle_jaccard_pairs` — the two
    share :func:`_shingle_intersection` and differ only in the final
    ratio.
    """
    return (
        _shingle_intersection(df, id_col, text_col, k, max_shingle_freq)
        .withColumn("contain_a_in_b", F.round(F.col("i") / F.col("na"), 4))
        .withColumn("contain_b_in_a", F.round(F.col("i") / F.col("nb"), 4))
        .filter(
            F.greatest("contain_a_in_b", "contain_b_in_a") >= threshold
        )
        .select("a", "b", "contain_a_in_b", "contain_b_in_a")
    )


def corpus_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_chars: int = 50,
    min_tokens: int = 10,
    max_top_unigram_frac: float = 0.125,
    max_dup_gram_frac: float = 0.05,
    require_lang_signal: bool = True,
) -> DataFrame:
    """FineWeb/Gopher-style keep/drop gate with reason codes — the
    curation decision a training-data pipeline materializes before dedup
    (Penedo et al. 2024 "FineWeb" §3.2, Rae et al. 2021 §A1.1; public
    heuristics). One row per doc: the measured signals, a ``keep``
    boolean, and the FIRST failing reason in a fixed precedence order
    (too_short > repetitive_grams > repetitive_unigram > no_lang_signal),
    so downstream removal stats are unambiguous.

    Plan shape: the repetition signals are the two explode->aggregate
    chains of :func:`repetition_stats` (doc_id in every key — no hot
    keys); length and language markers are pure per-row Catalyst on the
    same scan; everything re-joins on ``doc_id`` (AQE). Text never
    shuffles. Thresholds are compared on the ROUNDED (4-decimal)
    fractions that :func:`repetition_stats` outputs, and the SQL oracle
    rounds identically, so the decision reproduces exactly.
    """
    rep = repetition_stats(df, id_col, text_col).withColumnsRenamed(
        {"doc_id": "_rid"})
    lang = language_id(df, id_col, text_col).withColumnsRenamed(
        {"doc_id": "_lid"})
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
    )
    j = (
        base.join(rep, base.doc_id == rep._rid)
        .join(lang, base.doc_id == lang._lid)
    )
    top_frac = F.col("top_unigram_frac")
    dup_frac = F.col("dup_gram_frac")
    # require_lang_signal=False disables the marker-word gate — right for
    # corpora whose vocabulary the tiny marker lists don't cover (the
    # gate would otherwise drop everything, which is a config error, not
    # curation)
    no_lang = (F.col("lang_pred") == "und") if require_lang_signal else F.lit(False)
    reason = (
        F.when((F.col("n_chars") < min_chars)
               | (F.col("n_tokens") < min_tokens), "too_short")
        .when(dup_frac > max_dup_gram_frac, "repetitive_grams")
        .when(top_frac > max_top_unigram_frac, "repetitive_unigram")
        .when(no_lang, "no_lang_signal")
        .otherwise("ok")
    )
    return j.select(
        "doc_id", "n_chars", "n_tokens",
        "top_unigram_frac", "dup_gram_frac", "lang_pred",
        (reason == "ok").alias("keep"),
        reason.alias("reason"),
    )


def curation_rollup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    lang_col: str = "lang",
    **filter_kwargs,
) -> DataFrame:
    """Per-(source, lang) curation dashboard: the slice-level report a
    training-data pipeline publishes after the filter gate — how many
    docs each slice contributes, how many are byte-exact duplicates of
    ANOTHER doc anywhere in the corpus (cross-slice: the dedup planner
    needs global dup mass, not within-slice), how many the
    :func:`corpus_filter` gate keeps, the per-reason drop counts (the
    gate's precedence order makes these unambiguous), and the total
    char/token volume. Everything is a count or an integer sum —
    deterministic across engines by construction.

    Plan shape at 100 TB: one text scan computes md5 + the filter
    signals; after that only (doc_id, md5, 16-byte stats) shuffle —
    text never leaves the scan stage. The md5 groupBy is the exact-dedup
    shuffle the pipeline runs anyway; the final rollup groups a
    low-cardinality (source, lang) key with map-side partial
    aggregation, so the last exchange carries ~|sources x langs| rows.
    """
    filt = corpus_filter(df, id_col, text_col, **filter_kwargs)
    hashed = df.select(
        F.md5(F.col(text_col)).alias("_md5"), F.col(id_col).alias("doc_id")
    )
    dupc = hashed.groupBy("_md5").agg(F.count("*").alias("_dc"))
    isdup = hashed.join(dupc, "_md5").select(
        "doc_id", (F.col("_dc") > 1).cast("long").alias("_isdup")
    )
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(source_col).alias("source"),
        F.col(lang_col).alias("lang"),
    )
    j = (
        base.join(filt.select("doc_id", "n_chars", "n_tokens",
                              "keep", "reason"), "doc_id")
        .join(isdup, "doc_id")
    )

    def n_reason(r):
        return F.sum((F.col("reason") == r).cast("long")).alias(f"n_{r}")

    return j.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("_isdup").alias("n_exact_dup_docs"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
        n_reason("too_short"),
        n_reason("repetitive_grams"),
        n_reason("repetitive_unigram"),
        n_reason("no_lang_signal"),
        F.sum("n_chars").alias("sum_chars"),
        F.sum("n_tokens").alias("sum_tokens"),
    )


def hash_split(
    df: DataFrame,
    key_col: str,
    n_buckets: int = 10,
    train_buckets: int = 8,
    val_buckets: int = 1,
    salt: str = "split:",
) -> DataFrame:
    """Deterministic train/val/test assignment by hashing ``key_col`` —
    portable (md5-derived, identical in any engine), stable under
    re-runs and appends, and leakage-safe when ``key_col`` is a
    near-dup CLUSTER id: every member of a duplicate cluster lands in
    the same split, so eval rows can never have train-set near-copies
    (the standard contamination failure of row-hash splits; cf. the
    decontamination operator ``ngram_contamination``).

    Adds ``split_bucket`` (0..n_buckets-1) and ``split`` to the input.
    Pure per-row Catalyst — no shuffle; at 100 TB this is a free column
    on whatever scan/join produced ``key_col``.
    """
    # bucket-arithmetic validation: train+val >= n_buckets silently
    # yields an EMPTY test split, and n_buckets <= 0 produces nulls —
    # both are config errors, not splits (ADVICE r3)
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    if not (0 < train_buckets and val_buckets > 0
            and train_buckets + val_buckets < n_buckets):
        raise ValueError(
            "need 0 < train_buckets, 0 < val_buckets, and "
            f"train_buckets + val_buckets < n_buckets for a non-empty "
            f"test split; got train={train_buckets} val={val_buckets} "
            f"n_buckets={n_buckets}"
        )
    bucket = (
        F.conv(F.substring(
            F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))),
            1, 15), 16, 10)
        .cast("long") % n_buckets
    )
    split = (
        F.when(F.col("split_bucket") < train_buckets, "train")
        .when(F.col("split_bucket") < train_buckets + val_buckets, "val")
        .otherwise("test")
    )
    return df.withColumn("split_bucket", bucket).withColumn("split", split)


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "lang",
    default_rate: float = 0.0,
    id_col: str = "doc_id",
    salt: str = "sample:",
) -> DataFrame:
    """Deterministic per-stratum downsampling — the corpus-mixing
    primitive (rebalance languages/sources to target proportions before
    training). Row kept iff its md5-derived uniform falls below the
    stratum's rate; adds ``sample_u`` (the uniform, 6 decimals) and
    ``sample_weight`` (1/rate — the importance weight that makes
    downstream statistics unbiased after sampling).

    Like :func:`hash_split`: portable (md5 arithmetic is identical in
    any engine), stable under re-runs and appends (a row's fate depends
    only on its id and the salt — growing the corpus never flips
    previously kept rows), and monotone in the rate (raising a stratum's
    rate only ADDS rows, so staged experiments nest: the 10% sample is a
    subset of the 50% sample). Pure per-row Catalyst — no shuffle; at
    100 TB this is a free filter on the scan, and the parquet reader
    prunes to (id, stratum) + whatever the caller selects.

    The uniform compares as an INTEGER in [0, 1e6) against
    round(rate * 1e6) — no float-boundary ambiguity between engines.
    """
    for k, r in list(rates.items()) + [("<default>", default_rate)]:
        if not (0.0 <= r <= 1.0):
            raise ValueError(f"rate for {k!r} must be in [0, 1], got {r}")
    res = 1_000_000
    u = (
        F.conv(F.substring(
            F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))),
            1, 15), 16, 10)
        .cast("long") % res
    )
    thr = F.lit(int(round(default_rate * res)))
    for k, r in sorted(rates.items()):
        thr = F.when(F.col(stratum_col) == k, int(round(r * res))).otherwise(thr)
    return (
        df.withColumn("_u", u)
        .filter(F.col("_u") < thr)
        .withColumn("sample_u", F.round(F.col("_u") / res, 6))
        .withColumn(
            "sample_weight",
            F.round(F.lit(float(res)) / thr.cast("double"), 6),
        )
        .drop("_u")
    )


def lm_perplexity(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document bigram-LM cross-entropy / perplexity under a model
    trained on the corpus itself — the classic "perplexity filter"
    curation signal (docs that surprise a corpus-level n-gram model are
    boilerplate, gibberish, or off-distribution; CCNet/Gopher-style
    pipelines threshold on exactly this). Laplace-smoothed bigram model:
    P(w2|w1) = (c(w1 w2) + 1) / (c(w1) + V), V = unigram vocabulary size.

    Output: (doc_id, n_bigrams, cross_entropy, perplexity) for every doc
    with at least one bigram (>= 2 tokens); cross_entropy is the mean
    -log2 P over the doc's bigrams, perplexity = 2^cross_entropy.

    Plan shape (scale notes): model build is two map-side-combined
    aggregates (bigram counts keyed by the bigram string, unigram counts
    keyed by token) plus ONE model-sized join attaching c(w1) to each
    bigram row (AQE broadcasts the unigram side when the vocab fits);
    V arrives via a 1-row broadcast cross join, not a driver action.
    Scoring is one equi-join of the exploded (doc_id, bigram) stream
    against the model and one doc_id-keyed aggregate — the text itself
    never shuffles, only bigram keys and counts. Zipfian hot bigrams
    ("of the") skew the scoring join's probe side; the build side is one
    row per key, so AQE's skew-join split applies cleanly. Like
    tfidf_topterms, the bigram subtree is deliberately evaluated twice
    (model build + scoring) rather than persisting a TB-scale exploded
    intermediate.

    Determinism across engines (the DuckDB oracle hash-matches): the
    per-bigram log-prob is rounded to 6 decimals, then summed as
    DECIMAL(20,6) — exact, order-independent addition — so partition
    order can never flip the 4-decimal rounded outputs.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    docs = df.select(F.col(id_col).alias("doc_id"), toks.alias("tk"))
    n = F.size("tk")
    bigrams = docs.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice("tk", 1, F.greatest(n - 1, F.lit(0))),
                F.slice("tk", 2, F.greatest(n - 1, F.lit(0))),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("bg"),
    )
    uni = (
        docs.select(F.explode("tk").alias("w"))
        .groupBy("w").agg(F.count("*").alias("c1"))
    )
    vocab = uni.select(F.count("*").alias("_v"))
    model = (
        bigrams.groupBy("bg").agg(F.count("*").alias("c12"))
        .withColumn("w1", F.substring_index(F.col("bg"), " ", 1))
        .join(uni, F.col("w1") == F.col("w"))
        .crossJoin(F.broadcast(vocab))
        .select(
            "bg",
            F.round(
                F.log2(F.col("c12") + 1) - F.log2(F.col("c1") + F.col("_v")), 6
            ).cast("decimal(20,6)").alias("lp"),
        )
    )
    scored = (
        bigrams.join(model, "bg")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_bigrams"), F.sum("lp").alias("_slp"))
    )
    h = F.round(-F.col("_slp").cast("double") / F.col("n_bigrams"), 4)
    return scored.select(
        "doc_id",
        "n_bigrams",
        h.alias("cross_entropy"),
        F.round(F.pow(F.lit(2.0), h), 4).alias("perplexity"),
    )


def perplexity_buckets(
    df: DataFrame,
    n_buckets: int = 3,
    lang_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet's head/middle/tail split: per language, rank docs by
    :func:`lm_perplexity` and cut the ranking into ``n_buckets`` equal
    tiles — CCNet (Wenzek et al. 2020, arXiv:1911.00359) publishes its
    corpus in exactly these per-language perplexity terciles, and
    downstream pipelines sample "head-heavy" mixes from them.

    Output: (doc_id, lang, n_bigrams, perplexity, ppl_bucket 1..n,
    ppl_tier) — ``ppl_tier`` is head/middle/tail for the default 3
    buckets, ``b<k>`` otherwise. Lowest perplexity = head (the fluent
    end). Docs with < 2 tokens have no bigrams, hence no score: excluded
    (same contract as lm_perplexity). NTILE over the total order
    (perplexity, doc_id) — the id tie-break makes bucket assignment
    deterministic, and both engines share the standard "first buckets
    take the remainder" distribution rule, so the oracle hash-matches.

    Scale note: the tile window sorts each language inside one
    partition — exact terciles are a per-language total order by
    definition. CCNet itself computes cutoffs per SHARD and applies them
    shard-locally; at 10^12 docs do the same (pre-shard, pass each shard
    through this operator) or derive approximate cutoffs once and label
    by comparison. The model build underneath is the same two
    map-side-combined aggregates as lm_perplexity; text never enters the
    window — only (doc_id, lang, score) rows shuffle.
    """
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    from pyspark.sql import Window

    scored = lm_perplexity(df, id_col=id_col, text_col=text_col)
    withlang = scored.join(
        df.select(F.col(id_col).alias("doc_id"),
                  F.col(lang_col).alias("lang")),
        "doc_id",
    )
    w = Window.partitionBy("lang").orderBy("perplexity", "doc_id")
    b = F.ntile(n_buckets).over(w)
    if n_buckets == 3:
        tier = (F.when(b == 1, "head").when(b == 2, "middle")
                .otherwise("tail"))
    else:
        tier = F.concat(F.lit("b"), b.cast("string"))
    return withlang.select(
        "doc_id", "lang", "n_bigrams", "perplexity",
        b.cast("long").alias("ppl_bucket"), tier.alias("ppl_tier"),
    )


def dsir_weights(
    df: DataFrame,
    target: DataFrame,
    n_buckets: int = 4096,
    alpha: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "dsir:",
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling", arXiv:2302.03169):
    score every raw-corpus doc by how much more likely its hashed-bigram
    features are under a TARGET distribution (a small high-quality set)
    than under the RAW distribution — the weight importance resampling
    then samples by. Pipelines use it to tilt a web crawl toward a
    curated target (e.g. Wikipedia+books) without training a classifier.

    Features are the paper's hashed n-grams: each bigram maps to one of
    ``n_buckets`` buckets via the repo's portable md5->integer idiom, and
    both distributions are Laplace-smoothed bucket multinomials::

        p[b] = (count[b] + alpha) / (total + alpha * n_buckets)

    Per doc: ``log_weight = sum over bigram occurrences of
    log2 p_target[bucket] - log2 p_raw[bucket]`` (the doc's
    log-likelihood ratio), plus ``avg_logratio = log_weight / n_grams``
    (the length-free ranking signal). Docs with < 2 tokens have no
    bigrams and are excluded — same contract as :func:`lm_perplexity`.

    Plan shape (scale notes): TWO map-side-combined bucket aggregates
    (raw + target — buckets are ints, text never shuffles), totals via
    1-row broadcast cross joins, and ONE model join — the model is at
    most ``n_buckets`` rows (16k at the default), explicitly
    ``broadcast()``, so scoring is a map-side join on the exploded
    (doc_id, bucket) stream followed by one doc_id-keyed aggregate.
    Like lm_perplexity, the bigram subtree is deliberately evaluated
    twice (raw model + scoring) rather than persisting a TB-scale
    exploded intermediate. Zipfian hot buckets are bounded by
    construction: n_buckets keys total.

    Determinism across engines (the DuckDB oracle hash-matches): the
    per-bucket log-ratio rounds to 6 decimals and sums as
    DECIMAL(20,6) — exact order-independent addition.

    Sizing note: keep ``alpha * n_buckets`` well under both corpora's
    gram totals. When the smoothing mass rivals the totals (tiny
    corpora at the 4096 default), every ratio skews by the raw/target
    SIZE difference rather than distributional difference — a
    small-data artifact real corpora never hit; shrink ``n_buckets``
    for toy inputs.

    Output: (doc_id, n_grams, log_weight, avg_logratio).
    """
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    if alpha <= 0:
        raise ValueError(f"alpha must be positive, got {alpha}")

    def bucket_stream(frame: DataFrame, with_id: bool) -> DataFrame:
        toks = F.split(F.trim(F.col(text_col)), r"\s+")
        # the target frame only needs a text column — never touch id_col
        # there (a curated target set has no doc ids of its own)
        d = frame.select(
            *([F.col(id_col).alias("doc_id")] if with_id else []),
            toks.alias("tk"),
        )
        n = F.size("tk")
        bg = F.explode(
            F.zip_with(
                F.slice("tk", 1, F.greatest(n - 1, F.lit(0))),
                F.slice("tk", 2, F.greatest(n - 1, F.lit(0))),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("bg")
        cols = (["doc_id", bg] if with_id else [bg])
        s = d.select(*cols)
        b = (
            F.conv(
                F.substring(F.md5(F.concat(F.lit(salt), F.col("bg"))), 1, 15),
                16, 10,
            ).cast("long")
            % n_buckets
        )
        return s.withColumn("b", b).drop("bg")

    raw = bucket_stream(df, with_id=True)
    raw_m = raw.groupBy("b").agg(F.count("*").alias("c_raw"))
    tgt_m = (
        bucket_stream(target, with_id=False)
        .groupBy("b").agg(F.count("*").alias("c_tgt"))
    )
    raw_tot = raw_m.select(F.sum("c_raw").alias("_tr"))
    tgt_tot = tgt_m.select(F.sum("c_tgt").alias("_tt"))
    denom = float(alpha) * n_buckets
    model = (
        raw_m.join(tgt_m, "b", "left")
        .withColumn("c_tgt", F.coalesce(F.col("c_tgt"), F.lit(0)))
        .crossJoin(F.broadcast(raw_tot))
        .crossJoin(F.broadcast(tgt_tot))
        .select(
            "b",
            F.round(
                (F.log2(F.col("c_tgt") + F.lit(float(alpha)))
                 - F.log2(F.col("_tt") + F.lit(denom)))
                - (F.log2(F.col("c_raw") + F.lit(float(alpha)))
                   - F.log2(F.col("_tr") + F.lit(denom))),
                6,
            ).cast("decimal(20,6)").alias("lr"),
        )
    )
    scored = (
        raw.join(F.broadcast(model), "b")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_grams"), F.sum("lr").alias("_slr"))
    )
    # round log_weight while still DECIMAL: the 6-decimal sum lands on
    # exact .00005 half-way points that double rounding resolves by
    # representation luck (observed at sf0.001) — decimal HALF_UP is
    # engine-identical. avg_logratio divides first, so halves are
    # measure-zero there (same reasoning as lm_perplexity).
    return scored.select(
        "doc_id",
        "n_grams",
        F.round(F.col("_slr"), 4).cast("double").alias("log_weight"),
        F.round(F.col("_slr").cast("double") / F.col("n_grams"), 4)
            .alias("avg_logratio"),
    )


def tfidf_topterms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_m: int = 3,
) -> DataFrame:
    """Top-m terms per document by smoothed TF-IDF
    (idf = ln((N+1)/(df+1)) + 1, the scikit-learn smoothing; public) —
    the per-doc keyword signal curation pipelines use for topic/domain
    mixing decisions.

    Plan shape: explode -> (doc_id, term) count [keys include doc_id —
    uniform] -> term document-frequency aggregate [vocab-sized, heavy
    tail but count-only rows] -> idf joined BACK to the tf rows on
    ``term`` (AQE picks broadcast when the vocab fits, sort-merge
    otherwise) -> per-doc top-m window. N arrives via a 1-row broadcast
    cross join, not a driver action. Ties break on the ROUNDED score
    then term asc, so the SQL oracle's ordering is identical.

    Catalyst evaluates the tf subtree twice (once for the tf rows, once
    feeding the vocab rollup) — deliberate: re-scanning a columnar
    source is streamy and cheap, while persisting a TB-scale (doc_id,
    term, tf) intermediate to share one scan would pressure executor
    storage for no wall-clock win. The window applies WindowGroupLimit
    below the final exchange, so only ~top_m rows per doc shuffle.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    tf = (
        df.select(F.col(id_col).alias("doc_id"), F.explode(toks).alias("term"))
        .groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("_df"))
    n_docs = df.select(F.count("*").alias("_n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf") * (F.log((F.col("_n") + 1) / (F.col("_df") + 1)) + 1),
                4),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_m)
        .select("doc_id", "term", "tfidf", "rank")
    )


def vocab_topk(
    df: DataFrame,
    k: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """Corpus vocabulary profile: the top-``k`` whitespace tokens by
    occurrence count, with document frequency and a dense 1-based rank —
    the table a curation run reads before training a tokenizer (vocab
    coverage preview), building stopword lists, or sanity-checking a
    language mix (the head of a clean corpus is function words; a head
    full of markup or boilerplate tokens is a pipeline bug).

    Tokens are kept verbatim (no lowering/stripping): the profile must
    expose what a tokenizer would actually see. Ordering is total
    (count DESC, token ASC), so the top-``k`` boundary is deterministic.

    Scale shape: tokenize+explode fuses into the scan; the per-token
    count is ONE map-side-combined aggregate (Zipf heads collapse to
    counters before the shuffle — the hot-key pattern aggregation
    handles for free); the global top-k is Spark's distributed
    TakeOrdered (per-partition heads, driver merge of k-row slices),
    NOT a single-partition global window — the window that assigns the
    final rank runs over the already-cut k-row frame, where one
    partition of k rows is the point, not a bottleneck.

    Output: (token, n_occurrences, n_docs, rank).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    counts = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n_occurrences"),
             F.countDistinct(F.col(id_col)).alias("n_docs"))
        .filter(F.col("n_occurrences") >= min_count)
    )
    from pyspark.sql import Window

    head = counts.orderBy(F.desc("n_occurrences"), F.asc("token")).limit(k)
    w = Window.orderBy(F.desc("n_occurrences"), F.asc("token"))
    return head.withColumn("rank", F.row_number().over(w).cast("long"))


def ngram_novelty(
    df: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document marginal contribution: the fraction of a doc's
    distinct k-token grams whose FIRST corpus occurrence (by ascending
    id over the same k-gram spec as :func:`ngram_contamination`) is this
    doc — the data-selection signal behind "how much does this doc add
    that the corpus doesn't already have?" (near 0 = the doc restates
    earlier content even when no single span triggers span dedup; 1 =
    entirely novel). Ids order the corpus, so novelty is the
    deterministic sequential-reader semantics, append-stable for
    monotone ids: new docs never change old rows.

    Plan shape: distinct (gram, doc) pairs fuse into the scan; the
    per-gram first-occurrence is ONE map-side-combined min aggregate
    (repeated grams collapse before the shuffle — same hot-key story as
    vocab counts); the gram-keyed join back and the per-doc aggregate
    ride the same gram/doc hash keys as dup_chunks. Text never
    shuffles — only 64-bit gram hashes and ids move.

    Output: (doc_id, n_grams, n_novel, novelty_frac rounded to 4).
    """
    grams = (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("doc_id"),
            F.explode(_kgram_col(text_col, k)).alias("g"),
        )
        # md5-derived long: portable to the oracle, 8 bytes on the wire
        # instead of the gram text (collision odds ~n^2/2^63 — the same
        # budget every fingerprint operator here runs on)
        .select(
            "doc_id",
            F.conv(F.substring(F.md5(F.col("g")), 1, 15), 16, 10)
            .cast("long").alias("fp"),
        )
    )
    first = grams.groupBy("fp").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        grams.join(first, "fp")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum((F.col("first_doc") == F.col("doc_id")).cast("long"))
            .alias("n_novel"),
        )
    )
    return per_doc.withColumn(
        "novelty_frac", F.round(F.col("n_novel") / F.col("n_grams"), 4)
    )
