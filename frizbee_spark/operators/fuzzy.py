"""Fuzzy string matching — the reference's public API, Spark-first.

Local (driver/UDF-side, NumPy) core re-expressing the reference surface:
  - match_list            (reference: src/one_shot/matcher.rs:14-38)
  - match_indices         (reference: src/one_shot/indices.rs:13-56)
  - IncrementalMatcher    (reference: src/incremental/matcher.rs:6-118)

Distributed operator:
  - fuzzy_match(df, needle) — one needle against a DataFrame of candidate
    strings via ``mapInPandas`` (Arrow batches are the SIMD lanes); the
    final sort/limit is ordinary Catalyst (``orderBy`` replaces the
    reference's rayon parallel sort, partitions replace its scoped
    threads: src/one_shot/parallel/mod.rs:19-46).

Pipeline stages inside a batch (mirrors matcher.rs:91-144): min-length
filter -> vectorized char-count prefilter -> greedy routing for oversized
strings -> length-bucket ladder -> batched wavefront DP -> typo filter.
The char-count prefilter is *tighter* than the reference's unordered SIMD
prefilter (no false negatives w.r.t. the typo budget: an absent needle
char always costs at least one typo), so post-DP results are identical.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..constants import DEFAULT_CONFIG, LENGTH_BUCKETS, SW_MAX_CELLS, MatchConfig
from ..functions.oracle import (
    indices_from_score_matrix,
    match_greedy,
    match_too_large,
    smith_waterman,
    typos_from_score_matrix,
)
from ..functions.wavefront import greedy_batch, sw_batch


@dataclass(frozen=True)
class Match:
    """Result row (reference: src/lib.rs:24-30)."""

    index: int
    score: int
    exact: bool


@dataclass(frozen=True)
class MatchIndices:
    """Per-pair alignment detail (reference: src/lib.rs:54-59)."""

    score: int
    indices: list[int]
    exact: bool


def _fold(arr: np.ndarray) -> np.ndarray:
    return np.where((arr >= 65) & (arr <= 90), arr + 32, arr)


def _char_count_prefilter(
    padded: np.ndarray, lens: np.ndarray, needle: bytes, max_typos: int
) -> np.ndarray:
    """keep[b] = haystack b may match within the typo budget.

    Case-insensitive multiset containment: every needle char the haystack
    lacks costs at least one typo. Plays the role of the reference's
    unordered prefilter (src/prefilter/simd/*/unordered*.rs) — a cheap
    may-match test with false positives, zero false negatives.
    """
    nb = _fold(np.frombuffer(needle, dtype=np.uint8))
    folded = _fold(padded)
    # mask padding with a value outside the byte alphabet
    folded = np.where(np.arange(padded.shape[1])[None, :] < lens[:, None], folded, 256)
    uniq, need = np.unique(nb, return_counts=True)
    missing = np.zeros(padded.shape[0], dtype=np.int64)
    for c, n_needed in zip(uniq, need):
        have = (folded == c).sum(axis=1)
        missing += np.maximum(n_needed - have, 0)
    return missing <= max_typos


def match_list_arrays(
    needle: str | bytes,
    texts: list[bytes],
    config: MatchConfig = DEFAULT_CONFIG,
    route: str = "auto",
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Core batch matcher: returns (kept_positions, scores, typos, exact).

    ``kept_positions`` indexes into ``texts``; rows failing the min-length
    filter, prefilter, or typo budget are dropped (unless max_typos is
    None, which scores everything). No sorting here — callers sort.

    ``route`` overrides the cost-based kernel choice (reference:
    src/one_shot/mod.rs:20-25): "auto" sizes per row, "greedy" forces the
    linear-scan matcher, "dp" forces the DP wavefront.
    """
    nb = needle.encode() if isinstance(needle, str) else bytes(needle)
    count = len(texts)
    if count == 0 or len(nb) == 0:
        pos = np.arange(count)
        z = np.zeros(count, dtype=np.int64)
        return pos, z, z.copy(), np.zeros(count, dtype=bool)

    lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=count)
    keep = np.ones(count, dtype=bool)

    if config.max_typos is not None:
        # impossible-candidate pruning (matcher.rs:84-95)
        keep &= lens >= max(0, len(nb) - config.max_typos)
        if config.prefilter and keep.any():
            w = int(lens[keep].max()) if keep.any() else 1
            padded = np.zeros((count, max(w, 1)), dtype=np.uint8)
            for k in np.flatnonzero(keep):
                t = texts[k]
                padded[k, : min(len(t), w)] = np.frombuffer(t[:w], dtype=np.uint8)
            keep_idx = np.flatnonzero(keep)
            ok = _char_count_prefilter(padded[keep_idx], lens[keep_idx], nb, config.max_typos)
            keep[keep_idx] = ok

    pos = np.flatnonzero(keep)
    scores = np.zeros(pos.size, dtype=np.int64)
    typos = np.zeros(pos.size, dtype=np.int64)
    exact = np.zeros(pos.size, dtype=bool)

    # cost-based routing: oversized matrices go to the greedy matcher
    # (one_shot/mod.rs:20-25), everything else into the bucket ladder
    if route == "greedy":
        greedy_mask = np.ones(pos.size, dtype=bool)
    elif route == "dp":
        greedy_mask = np.zeros(pos.size, dtype=bool)
    else:
        kept_lens = lens[pos]
        greedy_mask = (len(nb) * kept_lens > SW_MAX_CELLS) | (
            kept_lens > LENGTH_BUCKETS[-1]
        )
    g_rows = np.flatnonzero(greedy_mask)
    if g_rows.size:
        # batched NumPy greedy (differentially tested vs oracle.match_greedy)
        g_scores, g_exact = greedy_batch(
            nb, [texts[pos[k]] for k in g_rows], config.scoring
        )
        scores[g_rows], typos[g_rows], exact[g_rows] = g_scores, 0, g_exact

    dp_rows = np.flatnonzero(~greedy_mask)
    if dp_rows.size:
        dp_lens = lens[pos[dp_rows]]
        # length-bucket ladder (matcher.rs:115-132): batch same-width
        # strings together to minimize wasted wavefront work
        ladder = np.array(LENGTH_BUCKETS)
        bucket_of = np.searchsorted(ladder, dp_lens)
        for bkt in np.unique(bucket_of):
            rows = dp_rows[bucket_of == bkt]
            batch_texts = [texts[pos[r]] for r in rows]
            s, t, e = sw_batch(
                [nb] * len(batch_texts), batch_texts, config.scoring,
                compute_typos=config.max_typos is not None,
            )
            scores[rows], typos[rows], exact[rows] = s, t, e

    if config.max_typos is not None:
        ok = typos <= config.max_typos
        # greedy-routed rows bypass the typo filter, as in the reference
        # (matcher.rs:104-112 appends greedy matches unconditionally)
        ok |= greedy_mask
        pos, scores, typos, exact = pos[ok], scores[ok], typos[ok], exact[ok]

    return pos, scores, typos, exact


def match_list(
    needle: str | bytes,
    haystacks: list[str],
    config: MatchConfig = DEFAULT_CONFIG,
) -> list[Match]:
    """Reference-parity one-shot matcher (src/one_shot/matcher.rs:14-38)."""
    texts = [h.encode() if isinstance(h, str) else bytes(h) for h in haystacks]
    pos, scores, _, exact = match_list_arrays(needle, texts, config)
    if config.sort and pos.size:
        # total order: score desc, then index asc (src/lib.rs:37-44)
        order = np.lexsort((pos, -scores))
        pos, scores, exact = pos[order], scores[order], exact[order]
    return [Match(int(p), int(s), bool(e)) for p, s, e in zip(pos, scores, exact)]


def match_indices(
    needle: str | bytes,
    haystack: str | bytes,
    config: MatchConfig = DEFAULT_CONFIG,
) -> MatchIndices | None:
    """Single-pair alignment explain (src/one_shot/indices.rs:13-56).

    Deliberately unoptimized — call sparingly (the reference carries the
    same warning at indices.rs:10-12).
    """
    nb = needle.encode() if isinstance(needle, str) else bytes(needle)
    hb = haystack.encode() if isinstance(haystack, str) else bytes(haystack)
    if match_too_large(len(nb), len(hb), SW_MAX_CELLS):
        score, idx, exact = match_greedy(nb, hb, config.scoring)
        if score == 0 and not idx:
            return None
        return MatchIndices(score, idx, exact)
    score, matrix, exact = smith_waterman(nb, hb, config.scoring)
    if config.max_typos is not None:
        if typos_from_score_matrix(matrix) > config.max_typos:
            return None
    return MatchIndices(score, indices_from_score_matrix(matrix), exact)


class IncrementalMatcher:
    """Keystroke-to-keystroke matcher over a fixed haystack list
    (reference: src/incremental/matcher.rs:6-118).

    The reference pre-interleaves every bucket once and reuses DP columns
    of the shared needle prefix. Here the expensive prep (byte padding +
    bucket routing) is cached at construction and results are memoized by
    needle, so a backspace (prefix revisit) is free; scores are identical
    to :func:`match_list` with sorting enabled.
    """

    def __init__(self, haystacks: list[str], config: MatchConfig = DEFAULT_CONFIG):
        self.config = config
        self.haystacks = haystacks
        self._texts = [h.encode() for h in haystacks]
        self._memo: dict[bytes, list[Match]] = {}

    def match_needle(self, needle: str | bytes) -> list[Match]:
        nb = needle.encode() if isinstance(needle, str) else bytes(needle)
        hit = self._memo.get(nb)
        if hit is not None:
            return hit
        result = match_list(nb, self.haystacks, self.config)
        self._memo[nb] = result
        return result


# --------------------------------------------------------------------------
# Spark operator
# --------------------------------------------------------------------------

def fuzzy_match(
    df,
    needle: str,
    text_col: str = "text",
    id_cols: list[str] | None = None,
    config: MatchConfig = DEFAULT_CONFIG,
    limit: int | None = None,
):
    """Distributed one-needle-vs-table fuzzy match.

    Arrow batches inside ``mapInPandas`` play the reference's SIMD-lane
    role; Spark partitions play its scoped threads (parallel/mod.rs:50-129
    — global ids survive because they are columns, not positions). Result
    columns: ``id_cols + [score, typos, exact]``, best-first when sorted.

    The min-length filter is applied as a *Catalyst* predicate first so it
    pushes into the scan; the prefilter + DP run in the UDF.
    """
    from pyspark.sql import functions as F

    id_cols = id_cols or ["doc_id"]
    cfg = config
    nb = needle

    work = df.select(*id_cols, text_col)
    if cfg.max_typos is not None and len(needle) > 0:
        min_len = max(0, len(needle.encode()) - cfg.max_typos)
        if min_len > 0:
            work = work.filter(F.length(F.col(text_col)) >= min_len)

    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in work.schema.fields if f.name != text_col
    )
    schema = f"{out_fields}, score long, typos long, exact boolean"

    def run(batches):
        import pandas as pd

        for pdf in batches:
            texts = [
                t.encode("utf-8", "surrogatepass") if isinstance(t, str) else (t or b"")
                for t in pdf[text_col].tolist()
            ]
            pos, scores, typos, exact = match_list_arrays(nb, texts, cfg)
            out = pdf.iloc[pos].drop(columns=[text_col]).reset_index(drop=True)
            out["score"] = scores
            out["typos"] = typos
            out["exact"] = exact
            yield out

    result = work.mapInPandas(run, schema=schema)
    if cfg.sort:
        order = [F.desc("score")] + [F.asc(c) for c in id_cols]
        result = result.orderBy(*order)
        if limit is not None:
            result = result.limit(limit)  # TakeOrderedAndProject — top-k O3
    return result
