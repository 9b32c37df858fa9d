"""Training-sequence packing: the manifest step between a curated
corpus and a training run.

    pack_sequences   concat-and-chunk packing manifest over sharded
                     token streams (GPT-style: concatenate docs in a
                     deterministic order, cut every seq_len tokens,
                     docs may straddle a cut)

The operator emits a per-document manifest (which training sequences a
doc's tokens land in, and at what offset) rather than materialized
token arrays — the manifest is what a data loader actually needs, it is
tiny next to the text, and it keeps the operator a pure metadata pass:
the text column never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "pack:",
) -> DataFrame:
    """Concat-and-chunk sequence packing manifest.

    The standard LLM pre-training layout (GPT-2/3 style): documents are
    concatenated in a deterministic order and the token stream is cut
    every ``seq_len`` tokens; a document may straddle a cut boundary.
    This operator computes, per document, WHERE its tokens land:

      - ``shard``       independent token stream the doc belongs to
                        (md5-derived from the id — portable, stable);
      - ``n_tokens``    whitespace token count (same spec as
                        :func:`~frizbee_spark.operators.textstats.token_stats`);
      - ``tok_offset``  exclusive running token sum within the shard —
                        the doc's first token's position in the stream;
      - ``seq_first`` / ``seq_last``  the shard-local sequence indices
                        the doc's tokens span (``seq_last > seq_first``
                        iff the doc straddles one or more cuts);
      - ``seq_offset``  position of the doc's first token inside
                        ``seq_first`` (``tok_offset % seq_len``).

    Sharding is the scale story: one global token stream would force a
    single total order (one partition doing all the work). Instead the
    corpus is split into ``n_shards`` independent streams by a portable
    md5 hash of the id, each packed separately — a 1000-executor cluster
    packs shards in parallel, sequences never cross shards, and the only
    cost is at most one ragged tail sequence per shard (< ``seq_len``
    tokens each — negligible against a 100 TB stream; size ``n_shards``
    so each shard is a few GB of tokens). Within a shard, order is by
    id: append-only corpora with monotone ids extend the stream without
    rewriting any existing manifest row (packing is order-dependent by
    construction; inserting a LOWER id into a shard shifts everything
    after it, which is the same contract a file-concatenation packer
    has).

    Plan: exactly ONE exchange (the shard-keyed window that computes the
    running sum); everything else is per-row projection. Rows with NULL
    text are dropped (a null would poison the running sum; a curation
    pipeline has already filtered them).

    All arithmetic is integer (``DIV``/``%`` on longs), so the DuckDB
    oracle reproduces the manifest bit-for-bit with no float-boundary
    ambiguity.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    n_tok = F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("long")
    shard = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))),
                1, 15,
            ),
            16, 10,
        ).cast("long")
        % n_shards
    )
    base = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        shard.alias("shard"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = base.withColumn(
        "tok_offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    return out.select(
        id_col,
        "shard",
        "n_tokens",
        "tok_offset",
        F.expr(f"tok_offset DIV {seq_len}").alias("seq_first"),
        F.expr(f"(tok_offset + n_tokens - 1) DIV {seq_len}").alias("seq_last"),
        (F.col("tok_offset") % seq_len).alias("seq_offset"),
    )
