"""Scalar Smith-Waterman oracle — the single-pair reference implementation.

This is the engine's ground truth for the typo-resistant affine-gap local
alignment score. The batched wavefront kernel (``wavefront.py``) is tested
differentially against this module, mirroring the reference project's own
test strategy (its SIMD kernel asserts equality with a scalar reference:
/root/reference/src/smith_waterman/reference/algorithm.rs:124-135).

Semantics re-expressed from scratch from:
  - forward DP: /root/reference/src/smith_waterman/reference/algorithm.rs:3-115
  - typo traceback: /root/reference/src/smith_waterman/reference/typos.rs:1-62
  - alignment indices: /root/reference/src/smith_waterman/reference/indices.rs:3-79
  - greedy fallback: /root/reference/src/smith_waterman/greedy.rs:9-103

Deliberately unoptimized (plain Python loops over NumPy storage): it is the
pytest oracle and the per-pair ``explain`` path, never the hot path
(reference makes the same tradeoff: src/one_shot/indices.rs:10-12).
"""

from __future__ import annotations

import numpy as np

from ..constants import DEFAULT_SCORING, Scoring


def _to_bytes(s: str | bytes) -> bytes:
    return s.encode("utf-8") if isinstance(s, str) else bytes(s)


def _is_upper(c: int) -> bool:
    return 65 <= c <= 90


def _is_lower(c: int) -> bool:
    return 97 <= c <= 122


def _is_alpha(c: int) -> bool:
    return _is_upper(c) or _is_lower(c)


def _lower(c: int) -> int:
    return c + 32 if _is_upper(c) else c


def smith_waterman(
    needle: str | bytes,
    haystack: str | bytes,
    scoring: Scoring = DEFAULT_SCORING,
) -> tuple[int, np.ndarray, bool]:
    """Affine-gap local alignment with the reference's bonus structure.

    Returns ``(score, score_matrix, exact)``. ``score_matrix`` has shape
    ``(len(needle), len(haystack))`` (needle-major columns), dtype int32;
    ``score`` includes the exact-match bonus, the matrix does not.

    The recurrence is *saturating at zero* on every subtraction, which is
    what makes it local alignment. Bonuses: prefix / offset-prefix on the
    first (second) haystack char, post-delimiter, capitalization after a
    lowercase char, and matching case; per
    reference/algorithm.rs:31-105.
    """
    nb = _to_bytes(needle)
    hb = _to_bytes(haystack)
    n, w = len(nb), len(hb)
    delims = set(scoring.delimiters)

    matrix = np.zeros((n, w), dtype=np.int32)
    best = 0

    for i in range(n):
        prev_col = matrix[i - 1] if i > 0 else np.zeros(w, dtype=np.int32)
        cur_col = matrix[i]

        nc = nb[i]
        n_upper = _is_upper(nc)
        nc_low = _lower(nc)

        up_score_prev = 0          # score of the cell above (same column, j-1)
        up_gap_open = True         # next up-gap pays open (vs extend) penalty
        left_gap_open = True       # next left-gap pays open penalty
        delim_bonus_enabled = False  # set once a non-delimiter char is seen
        prev_h_is_delim = False
        prev_h_is_lower = False

        for j in range(w):
            is_prefix = j == 0
            is_offset_prefix = j == 1 and prev_col[0] == 0 and not _is_alpha(hb[0])

            hc = hb[j]
            h_upper = _is_upper(hc)
            h_lower = _is_lower(hc)
            hc_low = _lower(hc)
            h_is_delim = hc_low in delims

            if is_prefix:
                match_score = scoring.match_score + scoring.prefix_bonus
            elif is_offset_prefix:
                match_score = scoring.match_score + scoring.offset_prefix_bonus
            else:
                match_score = scoring.match_score

            diag = 0 if is_prefix else int(prev_col[j - 1])
            if nc_low == hc_low:
                diag_score = diag + match_score
                if prev_h_is_delim and delim_bonus_enabled and not h_is_delim:
                    diag_score += scoring.delimiter_bonus
                if not is_prefix and h_upper and prev_h_is_lower:
                    diag_score += scoring.capitalization_bonus
                if n_upper == h_upper:
                    diag_score += scoring.matching_case_bonus
            else:
                diag_score = max(0, diag - scoring.mismatch_penalty)

            up_pen = scoring.gap_open_penalty if up_gap_open else scoring.gap_extend_penalty
            up_score = max(0, up_score_prev - up_pen)

            left = int(prev_col[j])
            left_pen = scoring.gap_open_penalty if left_gap_open else scoring.gap_extend_penalty
            left_score = max(0, left - left_pen)

            max_score = max(diag_score, up_score, left_score)

            diag_taken = max_score == diag_score
            up_gap_open = (max_score != up_score) or diag_taken
            left_gap_open = (max_score != left_score) or diag_taken

            prev_h_is_lower = h_lower
            prev_h_is_delim = h_is_delim
            delim_bonus_enabled = delim_bonus_enabled or not h_is_delim

            up_score_prev = max_score
            cur_col[j] = max_score
            best = max(best, max_score)

    exact = nb == hb
    if exact:
        best += scoring.exact_match_bonus
    return best, matrix, exact


def typos_from_score_matrix(matrix: np.ndarray) -> int:
    """Count typos (needle chars not cleanly aligned) via traceback.

    Starts from the best-scoring cell of the *last* needle column (first
    max wins on ties) and walks back preferring diag >= left >= up,
    counting left-moves and non-improving diagonal moves as typos; a
    terminal zero-score at column 0 counts one more
    (reference/typos.rs:1-62, including the col-0 compensation at :56-59).
    """
    n = matrix.shape[0]
    if n == 0:
        return 0
    w = matrix.shape[1]

    score = 0
    row = 0
    if w > 0:
        # first index attaining the max of the last needle column
        # (strictly-greater scan keeps the lowest index on ties)
        last_col = matrix[n - 1]
        best = 0
        for idx in range(w):
            if last_col[idx] > best:
                best = int(last_col[idx])
                row = idx
        score = best

    typos = 0
    col = n - 1
    while col > 0:
        if row == 0:
            typos += 1
            col -= 1
            continue
        diag = int(matrix[col - 1, row - 1])
        left = int(matrix[col - 1, row])
        up = int(matrix[col, row - 1])
        if diag >= left and diag >= up:
            if diag >= score:
                typos += 1
            row -= 1
            col -= 1
            score = diag
        elif left >= up:
            typos += 1
            col -= 1
            score = left
        else:
            row -= 1
            score = up

    if col == 0 and score == 0:
        typos += 1
    return typos


def indices_from_score_matrix(matrix: np.ndarray) -> list[int]:
    """Haystack positions on the best alignment path (explain/debug only).

    Global-argmax start (first max in column-major scan), walk back while
    score > 0; diagonal moves that *increase* the score going forward mark
    a matched haystack index; crossing an up-gap retracts the previous
    mark (reference/indices.rs:3-79).
    """
    if matrix.size == 0:
        return []
    n, w = matrix.shape

    best = 0
    col, row = 0, 0
    for c in range(n):
        for r in range(w):
            if matrix[c, r] > best:
                best = int(matrix[c, r])
                col, row = c, r
    score = int(matrix[col, row])

    marked: set[int] = set()
    while score > 0:
        diag = int(matrix[col - 1, row - 1]) if col > 0 and row > 0 else 0
        left = int(matrix[col - 1, row]) if col > 0 else 0
        up = int(matrix[col, row - 1]) if row > 0 else 0

        if diag >= left and diag >= up:
            if diag < score:
                marked.add(row)
            row = max(0, row - 1)
            col = max(0, col - 1)
            score = diag
        elif up >= left:
            if up > score and up > 0:
                marked.discard(row)
                marked.add(max(0, row - 1))
            row = max(0, row - 1)
            score = up
        else:
            col = max(0, col - 1)
            score = left

    return sorted(marked)


def match_greedy(
    needle: str | bytes,
    haystack: str | bytes,
    scoring: Scoring = DEFAULT_SCORING,
) -> tuple[int, list[int], bool]:
    """Linear-time first-match-wins fallback for oversized inputs.

    Scans the haystack left-to-right consuming needle chars in order
    (case-insensitive), applying the same bonus set as the DP; an
    unmatched needle char means score 0. Used when the DP matrix would
    exceed ``SW_MAX_CELLS`` (reference: greedy.rs:9-103, routing at
    one_shot/mod.rs:20-25).
    """
    nb = _to_bytes(needle)
    hb = _to_bytes(haystack)
    delims = set(scoring.delimiters)

    if len(nb) == 0:
        return 0, [], False
    if len(hb) < len(nb):
        return 0, [], False

    score = 0
    indices: list[int] = []
    h_idx = 0
    delim_bonus_enabled = False
    prev_h_is_lower = False
    prev_h_is_delim = False

    for n_idx in range(len(nb)):
        nc = nb[n_idx]
        nc_low = _lower(nc)
        start_idx = h_idx
        found = False
        # leave room for the remaining needle chars
        while h_idx <= len(hb) - len(nb) + n_idx:
            hc = hb[h_idx]
            h_is_delim = hc in delims
            h_is_upper = _is_upper(hc)
            h_is_lower = _is_lower(hc)

            if not h_is_delim:
                delim_bonus_enabled = True

            if _lower(hc) != nc_low:
                prev_h_is_delim = delim_bonus_enabled and h_is_delim
                prev_h_is_lower = h_is_lower
                h_idx += 1
                continue

            score += scoring.match_score
            if h_idx != start_idx and n_idx != 0:
                gap = scoring.gap_open_penalty + scoring.gap_extend_penalty * max(
                    0, h_idx - start_idx - 1
                )
                score = max(0, score - gap)
            if nc == hc:
                score += scoring.matching_case_bonus
            if h_is_upper and prev_h_is_lower:
                score += scoring.capitalization_bonus
            if h_idx == 0:
                score += scoring.prefix_bonus
            if prev_h_is_delim and not h_is_delim:
                score += scoring.delimiter_bonus

            prev_h_is_delim = delim_bonus_enabled and h_is_delim
            prev_h_is_lower = h_is_lower
            indices.append(h_idx)
            h_idx += 1
            found = True
            break

        if not found:
            return 0, [], False

    exact = nb == hb
    if exact:
        score += scoring.exact_match_bonus
    return score, indices, exact


def match_too_large(needle_len: int, haystack_len: int, max_cells: int = 16 * 1024) -> bool:
    """Route to the greedy path when the DP matrix would blow the budget
    (reference: src/one_shot/mod.rs:20-25 — 32 KiB of u16 cells)."""
    return needle_len * haystack_len > max_cells


def prefilter_subsequence(needle: str | bytes, haystack: str | bytes) -> bool:
    """Ordered case-sensitive subsequence prefilter
    (reference: src/prefilter/scalar.rs:2-19)."""
    nb, hb = _to_bytes(needle), _to_bytes(haystack)
    h_idx = 0
    for c in nb:
        while h_idx < len(hb) and hb[h_idx] != c:
            h_idx += 1
        if h_idx == len(hb):
            return False
        h_idx += 1
    return True


def prefilter_subsequence_insensitive(needle: str | bytes, haystack: str | bytes) -> bool:
    """Ordered case-insensitive subsequence prefilter
    (reference: src/prefilter/scalar.rs:22-39)."""
    nb, hb = _to_bytes(needle), _to_bytes(haystack)
    h_idx = 0
    for c in nb:
        cl, cu = _lower(c), (c - 32 if _is_lower(c) else c)
        while h_idx < len(hb) and hb[h_idx] != cl and hb[h_idx] != cu:
            h_idx += 1
        if h_idx == len(hb):
            return False
        h_idx += 1
    return True


def prefilter_typos(needle: str | bytes, haystack: str | bytes, max_typos: int) -> bool:
    """Subsequence prefilter tolerating up to ``max_typos`` missing needle
    chars; on a miss the haystack scan restarts from position 0, admitting
    false positives by design (reference: src/prefilter/scalar.rs:42-66 —
    cheap may-match test verified by the full DP afterwards)."""
    nb, hb = _to_bytes(needle), _to_bytes(haystack)
    h_idx = 0
    typos = 0
    for c in nb:
        while True:
            if h_idx == len(hb):
                typos += 1
                if typos > max_typos:
                    return False
                h_idx = 0
                break
            if hb[h_idx] == c:
                h_idx += 1
                break
            h_idx += 1
    return True


def prefilter_typos_insensitive(needle: str | bytes, haystack: str | bytes, max_typos: int) -> bool:
    """Case-insensitive variant of :func:`prefilter_typos`
    (reference: src/prefilter/scalar.rs:69-97)."""
    nb, hb = _to_bytes(needle), _to_bytes(haystack)
    h_idx = 0
    typos = 0
    for c in nb:
        cl, cu = _lower(c), (c - 32 if _is_lower(c) else c)
        while True:
            if h_idx == len(hb):
                typos += 1
                if typos > max_typos:
                    return False
                h_idx = 0
                break
            if hb[h_idx] == cl or hb[h_idx] == cu:
                h_idx += 1
                break
            h_idx += 1
    return True


def self_score(text: str | bytes, scoring: Scoring = DEFAULT_SCORING) -> int:
    """Closed-form SW score of a string against itself (the all-diagonal
    path): per-char match+case plus positional bonuses plus prefix and
    exact bonuses. Used to normalize pair scores into [0, 1] similarity.
    Verified against :func:`smith_waterman` in tests."""
    b = _to_bytes(text)
    if not b:
        return 0
    delims = set(scoring.delimiters)
    total = len(b) * (scoring.match_score + scoring.matching_case_bonus)
    total += scoring.prefix_bonus + scoring.exact_match_bonus
    delim_enabled = not (b[0] in delims)
    prev_lower = _is_lower(b[0])
    prev_delim = b[0] in delims
    for j in range(1, len(b)):
        c = b[j]
        is_delim = c in delims
        if prev_delim and delim_enabled and not is_delim:
            total += scoring.delimiter_bonus
        if _is_upper(c) and prev_lower:
            total += scoring.capitalization_bonus
        prev_lower = _is_lower(c)
        prev_delim = is_delim
        delim_enabled = delim_enabled or not is_delim
    return total
