"""Distributed BPE tokenizer training (Sennrich et al. 2016,
arXiv:1508.07909 — public literature; no reference counterpart: frizbee
has no tokenizer, this is LLM-training-pipeline surface).

The classic trainer is a driver-side loop over a Counter; the
distributed re-expression keeps the CORPUS out of the loop entirely:

- Pre-tokenize + word-count once: ``regexp_extract_all`` in the scan,
  one map-side-combined aggregate. Text never shuffles; everything
  after this step runs over the VOCABULARY table (word types × counts),
  which is millions of rows at web scale — not trillions.
- Each of the K merge iterations is (a) an adjacent-pair count over the
  vocab (map-side combine), (b) a distributed TakeOrdered for the
  argmax pair (never a global sort), (c) one literal string replace
  applied vocab-wide. The driver holds exactly one row per iteration.
- Each iteration's vocab frame is persisted (tracked) and the previous
  released once the next materializes — execution reads the last cache,
  never recursing the merge chain, so plan depth stays a non-issue at
  this operator's merge counts.

Word symbol sequences are stored as a sentinel-framed string: each
symbol wrapped in US (``\\x1f``) so the merge of pair (a, b) is the
plain left-to-right non-overlapping ``replace`` of ``US a US US b US``
with ``US ab US`` — exactly greedy BPE merge semantics ('a a a' merges
to '(aa) a'), and expressible identically in any engine (the DuckDB
oracle replays the same K steps as chained materialized CTEs). The
``[a-z]+`` pre-tokenizer guarantees no symbol can contain the sentinel.

Pair statistics count overlapping adjacents (the standard get_stats:
'a a a' contributes (a,a) twice) while the merge step is
non-overlapping — both choices replicated bit-for-bit in the oracle.
Ties in pair frequency break by (left, right) lexicographic order, so
the training run is fully deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

US = "\x1f"
EOW = "</w>"  # end-of-word marker symbol (standard BPE)


def _pretokens(df: DataFrame, text_col: str):
    """Lowercased [a-z]+ word stream — the same expression the oracle
    uses, and one that can never emit the US sentinel."""
    return F.explode(
        F.expr(f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)")
    ).alias("word")


def _init_words(df: DataFrame, text_col: str) -> DataFrame:
    """(word, cnt, s): vocabulary with sentinel-framed char symbols +
    the EOW marker. One corpus pass, map-side-combined count."""
    words = (
        df.select(_pretokens(df, text_col))
        .groupBy("word").agg(F.count("*").alias("cnt"))
    )
    framed = F.concat(
        F.lit(US),
        F.array_join(
            F.concat(F.split("word", ""), F.array(F.lit(EOW))), US * 2),
        F.lit(US),
    )
    return words.select("word", "cnt", framed.alias("s"))


def _syms(col: str = "s"):
    return F.split(F.expr(f"substring({col}, 2, length({col})-2)"), US * 2)


def bpe_train(
    df: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
    return_words: bool = False,
):
    """Learn ``n_merges`` BPE merges from the corpus. Returns a
    DataFrame (rank, left_sym, right_sym, merged, freq) ordered by
    rank; with ``return_words=True`` also returns the final vocabulary
    segmentation (word, cnt, s) for downstream encoding.

    Cache lifecycle (the repo contract, same as graph.host_pagerank):
    each iteration's vocab frame is ``tracked_persist``-ed and the
    previous one unpersisted as soon as the top-1 collect materializes
    the current — execution always reads the last cached frame, so
    nothing recomputes and no ``localCheckpoint`` is needed (its blocks
    outlive Dataset.unpersist and would leak past ``release_tracked``;
    at tokenizer-production merge counts — tens of thousands — swap in
    reliable ``Dataset.checkpoint`` to an owned directory instead).
    Without ``return_words`` everything is released before returning
    (the merges live on the driver); with it, the final words frame
    stays persisted but TRACKED — the unit-of-work owner releases it
    via ``util.release_tracked`` after its consuming action."""
    from ..util import tracked_persist

    words = tracked_persist(_init_words(df, text_col))
    prev = None
    merges = []
    for k in range(1, n_merges + 1):
        pairs = (
            words.select("cnt", _syms().alias("syms"))
            .filter(F.size("syms") >= 2)
            .select("cnt", F.explode(F.arrays_zip(
                F.slice("syms", 1, F.size("syms") - 1).alias("a"),
                F.slice("syms", 2, F.size("syms") - 1).alias("b"),
            )).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").alias("freq"))
        )
        # argmax pair: TakeOrderedAndProject (top-1), never a global
        # sort. Materializes the current words frame, so the previous
        # iteration's cache can drop now.
        best = pairs.orderBy(F.desc("freq"), "a", "b").limit(1).collect()
        if prev is not None:
            prev.unpersist()
            prev = None
        if not best:
            break  # every word is a single symbol already
        a, b, freq = best[0]["a"], best[0]["b"], int(best[0]["freq"])
        merges.append((k, a, b, a + b, freq))
        nxt = words.withColumn(
            "s", F.replace("s", F.lit(US + a + US + US + b + US),
                           F.lit(US + a + b + US)))
        prev, words = words, tracked_persist(nxt)
    if prev is not None:
        prev.unpersist()
    out = df.sparkSession.createDataFrame(
        merges,
        "rank long, left_sym string, right_sym string, "
        "merged string, freq long",
    ).orderBy("rank")
    if return_words:
        return out, words
    words.unpersist()
    return out


def bpe_doc_tokens(
    df: DataFrame,
    n_merges: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc token counts under a corpus-trained BPE: (doc_id,
    n_words, n_subwords). The trained vocabulary already carries each
    word's final segmentation, so encoding is a BROADCAST join of the
    doc word stream against the (small) vocab — the corpus is scanned,
    never shuffled. Docs with no [a-z] word are dropped (no tokens),
    matching the oracle's inner join."""
    _, words = bpe_train(df, n_merges, text_col, return_words=True)
    wtok = words.select(
        "word", F.size(_syms()).cast("long").alias("n_sub"))
    docw = df.select(F.col(id_col).alias("doc_id"),
                     _pretokens(df, text_col))
    return (
        docw.join(F.broadcast(wtok), "word")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_words"),
             F.sum("n_sub").alias("n_subwords"))
    )
