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


def select_to_budget(
    df: DataFrame,
    budget: int,
    weight_col: str,
    cost_col: str,
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Greedy budget selection: rank documents by ``weight_col``
    (descending, ties broken by ``id_col``) and keep the maximal prefix
    whose running ``cost_col`` sum stays within ``budget`` — how a
    training mix is actually cut ("the best N billion tokens by quality
    score"). The rule is the strict prefix: selection stops at the first
    document that overflows the budget, even if a later, cheaper one
    would still fit (the deterministic knapsack relaxation every
    curation pipeline uses; re-ranking around the boundary is a policy
    choice left to the caller's weight).

    Output (selected rows only): id, ``weight``, ``cost`` (cast long),
    ``cum_cost`` (inclusive running sum), ``sel_rank`` (1-based position
    in the total order). All arithmetic is integer, so the oracle
    compare is exact.

    Scale story — a running sum over a total order is the textbook
    one-partition trap (a global ``Window.orderBy`` moves the corpus to
    ONE task). This operator is the classic two-pass distributed prefix
    sum instead:

      1. range-shuffle on (weight DESC, id) + sort within partitions —
         the only exchange, and the range partitioner keeps it balanced;
      2. a per-partition cost/count aggregate (tiny: one row per
         partition) is collected and prefix-summed on the driver into
         per-partition offsets;
      3. partitions whose offset already exceeds the budget are pruned
         BEFORE the final pass (a small budget over a huge corpus scans
         only the head partitions);
      4. an Arrow ``mapInPandas`` pass streams each surviving partition
         in order, carrying the running sum across batches from the
         partition's offset — no further shuffle, no driver data motion.

    The intermediate is ``tracked_persist``-ed (two passes read it);
    the unit-of-work owner releases it via ``release_tracked``.
    Rows with NULL weight or cost are dropped (a curation pipeline has
    already filtered them; a NULL would poison the running sum).
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    from pyspark import TaskContext

    from ..util import tracked_persist

    spark = df.sparkSession
    n_parts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    base = (
        df.filter(F.col(weight_col).isNotNull() & F.col(cost_col).isNotNull())
        .select(
            F.col(id_col),
            F.col(weight_col).alias("weight"),
            F.col(cost_col).cast("long").alias("cost"),
        )
    )
    ranged = tracked_persist(
        base.repartitionByRange(n_parts, F.desc("weight"), F.asc(id_col))
        .sortWithinPartitions(F.desc("weight"), F.asc(id_col))
        .withColumn("_pid", F.spark_partition_id())
    )
    stats = {
        r["_pid"]: (r["c"], r["n"])
        for r in ranged.groupBy("_pid")
        .agg(F.sum("cost").alias("c"), F.count("*").alias("n"))
        .collect()
    }
    cost_off: dict[int, int] = {}
    rank_off: dict[int, int] = {}
    cum_c = cum_n = 0
    keep_pids = []
    for pid in sorted(stats):
        cost_off[pid] = cum_c
        rank_off[pid] = cum_n
        if cum_c <= budget:  # partition may still contribute rows
            keep_pids.append(pid)
        c, n = stats[pid]
        cum_c += c
        cum_n += n
    id_type = dict(base.dtypes)[id_col]
    w_type = dict(ranged.dtypes)["weight"]
    schema = (
        f"`{id_col}` {id_type}, weight {w_type}, cost long, "
        "cum_cost long, sel_rank long"
    )

    def run(batches):
        import pandas as pd  # noqa: F401 (worker-side import)

        pid = TaskContext.get().partitionId()
        cum = cost_off.get(pid, 0)
        rank = rank_off.get(pid, 0)
        for pdf in batches:
            if pdf.empty:
                continue
            cums = cum + pdf["cost"].cumsum()
            ranks = rank + pd.RangeIndex(1, len(pdf) + 1)
            cum = int(cums.iloc[-1])
            rank += len(pdf)
            keep = cums <= budget
            if keep.any():
                out = pdf.loc[keep, [id_col, "weight", "cost"]].copy()
                out["cum_cost"] = cums[keep]
                out["sel_rank"] = pd.Series(ranks, index=pdf.index)[keep]
                yield out
            if cum > budget:  # strict prefix: nothing later can enter
                return

    pruned = ranged.filter(F.col("_pid").isin(keep_pids)) if keep_pids else (
        ranged.filter(F.lit(False))
    )
    return pruned.mapInPandas(run, schema=schema)
