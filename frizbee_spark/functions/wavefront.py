"""Batched anti-diagonal wavefront Smith-Waterman — the vectorized kernel.

This is the engine's hot path: it scores a *batch* of (needle, haystack)
pairs at once with NumPy, iterating over anti-diagonals (cells i+j = d) so
that every cell on a diagonal — across the whole batch — updates in one
vectorized step. The Arrow batch handed to a pandas UDF plays the role the
interleaved SIMD lanes play in the reference design
(/root/reference/src/smith_waterman/simd/algorithm.rs:129-200,
 interleave/mod.rs:10-34): rows of the batch are lanes, NumPy is the SIMD.

Two kernels:

- :func:`sw_batch` — full (unbanded) matrices, plus a vectorized typo
  traceback. Used by the fuzzy matcher on short strings (<= 512 bytes,
  same routing cap as the reference: src/one_shot/mod.rs:20-25). Must be
  bit-identical to the scalar oracle (tests are differential).

- :func:`sw_score_banded` — O(len * band) rolling-buffer kernel for long
  documents: only cells with |j - i| <= band_radius are computed (the
  banding idea of src/smith_waterman/simd/algorithm.rs:144-160 scaled to
  document length). Returns raw scores; similarity normalization lives in
  :func:`normalized_similarity`.

Scores are computed in int32/int64 with explicit clamping at zero
(NumPy wraps; the reference relies on u16 saturating arithmetic).
"""

from __future__ import annotations

import numpy as np

from ..constants import DEFAULT_SCORING, Scoring


def _pad_bytes(items: list[bytes], width: int | None = None) -> tuple[np.ndarray, np.ndarray]:
    """Pad a list of byte strings into a (B, W) uint8 array + lengths."""
    lens = np.fromiter((len(b) for b in items), dtype=np.int64, count=len(items))
    w = int(lens.max()) if width is None else width
    out = np.zeros((len(items), max(w, 1)), dtype=np.uint8)
    for k, b in enumerate(items):
        if b:
            out[k, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    return out, lens


def _char_classes(arr: np.ndarray, delims: bytes):
    """Per-byte class masks + lowercase fold (reference precomputes the
    same masks per char: src/smith_waterman/simd/types.rs:10-87)."""
    is_upper = (arr >= 65) & (arr <= 90)
    is_lower = (arr >= 97) & (arr <= 122)
    low = np.where(is_upper, arr + 32, arr)
    is_delim = np.isin(low, np.frombuffer(delims, dtype=np.uint8))
    return low.astype(np.int16), is_upper, is_lower, is_delim


def _haystack_bonus_cols(h_upper, h_lower, h_delim, scoring: Scoring):
    """Static per-(pair, haystack-position) bonus columns.

    The delimiter and capitalization bonuses depend only on the previous
    haystack character (and on having seen a non-delimiter before), so
    they are path-independent and precomputable for the whole batch.
    """
    b, w = h_upper.shape
    prev_delim = np.zeros_like(h_delim)
    prev_delim[:, 1:] = h_delim[:, :-1]
    prev_lower = np.zeros_like(h_lower)
    prev_lower[:, 1:] = h_lower[:, :-1]
    seen_nondelim = np.zeros((b, w), dtype=bool)
    if w > 1:
        seen_nondelim[:, 1:] = np.cumsum(~h_delim, axis=1)[:, :-1] > 0
    delim_bonus = np.where(
        prev_delim & seen_nondelim & ~h_delim, scoring.delimiter_bonus, 0
    ).astype(np.int32)
    cap_bonus = np.where(h_upper & prev_lower, scoring.capitalization_bonus, 0).astype(np.int32)
    cap_bonus[:, 0] = 0  # capitalization bonus never applies on the prefix
    return delim_bonus, cap_bonus


def sw_batch(
    needles: list[bytes],
    haystacks: list[bytes],
    scoring: Scoring = DEFAULT_SCORING,
    compute_typos: bool = True,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Score a batch of pairs with full DP matrices.

    Returns ``(scores, typos, exact)`` — int64 scores (exact-match bonus
    included), int64 typo counts (-1 when ``compute_typos`` is False),
    bool exact flags. Semantics match the scalar oracle cell-for-cell.
    """
    assert len(needles) == len(haystacks)
    bsz = len(needles)
    if bsz == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z.copy(), np.zeros(0, dtype=bool)

    ns, nlens = _pad_bytes(needles)
    hs, wlens = _pad_bytes(haystacks)
    n_max, w_max = ns.shape[1], hs.shape[1]

    n_low, n_upper, _, _ = _char_classes(ns, scoring.delimiters)
    h_low, h_upper, h_lower, h_delim = _char_classes(hs, scoring.delimiters)
    delim_bonus, cap_bonus = _haystack_bonus_cols(h_upper, h_lower, h_delim, scoring)
    h0_nonalpha = ~((hs[:, 0] >= 65) & (hs[:, 0] <= 90)) & ~((hs[:, 0] >= 97) & (hs[:, 0] <= 122))
    h0_nonalpha &= wlens > 0

    # padded (+1 row/col of zeros) so i-1 / j-1 reads need no branching
    H = np.zeros((bsz, n_max + 1, w_max + 1), dtype=np.int32)
    U = np.zeros((bsz, n_max + 1, w_max + 1), dtype=bool)  # gap-open flag, up
    L = np.zeros((bsz, n_max + 1, w_max + 1), dtype=bool)  # gap-open flag, left
    U[:, :, 0] = True
    L[:, :, 0] = True

    best = np.zeros(bsz, dtype=np.int32)
    go, ge = scoring.gap_open_penalty, scoring.gap_extend_penalty

    for d in range(n_max + w_max - 1):
        i_lo = max(0, d - w_max + 1)
        i_hi = min(n_max - 1, d)
        iv = np.arange(i_lo, i_hi + 1)
        jv = d - iv

        valid = (iv[None, :] < nlens[:, None]) & (jv[None, :] < wlens[:, None])
        if not valid.any():
            continue

        is_match = n_low[:, iv] == h_low[:, jv]
        case_eq = n_upper[:, iv] == h_upper[:, jv]

        # match score with prefix / offset-prefix bonuses
        mscore = np.full((bsz, iv.size), scoring.match_score, dtype=np.int32)
        pref = jv == 0
        if pref.any():
            mscore[:, pref] += scoring.prefix_bonus
        offp = jv == 1
        if offp.any():
            # offset-prefix requires prev column's first cell == 0 and a
            # non-alphabetic first haystack char (algorithm.rs:33-34)
            col0_prev = H[:, iv[offp], 1]  # real cell (i-1, 0)
            mscore[:, offp] += np.where(
                (col0_prev == 0) & h0_nonalpha[:, None], scoring.offset_prefix_bonus, 0
            )

        diag_in = H[:, iv, jv]          # real (i-1, j-1)
        left_in = H[:, iv, jv + 1]      # real (i-1, j)
        up_in = H[:, iv + 1, jv]        # real (i,   j-1)
        u_open = U[:, iv + 1, jv]
        l_open = L[:, iv + 1, jv]

        diag_score = np.where(
            is_match,
            diag_in + mscore + delim_bonus[:, jv] + cap_bonus[:, jv]
            + np.where(case_eq, scoring.matching_case_bonus, 0),
            np.maximum(diag_in - scoring.mismatch_penalty, 0),
        )
        up_score = np.maximum(up_in - np.where(u_open, go, ge), 0)
        left_score = np.maximum(left_in - np.where(l_open, go, ge), 0)

        maxv = np.maximum(diag_score, np.maximum(up_score, left_score))
        maxv = np.where(valid, maxv, 0)

        diag_taken = maxv == diag_score
        H[:, iv + 1, jv + 1] = maxv
        U[:, iv + 1, jv + 1] = (maxv != up_score) | diag_taken
        L[:, iv + 1, jv + 1] = (maxv != left_score) | diag_taken

        best = np.maximum(best, maxv.max(axis=1))

    exact = (nlens == wlens) & np.array(
        [needles[k] == haystacks[k] for k in range(bsz)], dtype=bool
    )
    scores = best.astype(np.int64)
    scores[exact] += scoring.exact_match_bonus

    if compute_typos:
        typos = _typos_batch(H, nlens, wlens)
    else:
        typos = np.full(bsz, -1, dtype=np.int64)
    return scores, typos, exact


def _typos_batch(H: np.ndarray, nlens: np.ndarray, wlens: np.ndarray) -> np.ndarray:
    """Vectorized typo traceback over the whole batch at once.

    All pairs walk their matrices back simultaneously; each step is a set
    of batched gathers. Tie-break order (diag >= left >= up) and the
    terminal col-0 zero-score compensation replicate the scalar oracle
    (reference/typos.rs:22-59) exactly — recall parity depends on it.
    ``H`` is the padded (+1) matrix from :func:`sw_batch`.
    """
    bsz = H.shape[0]
    typos = np.zeros(bsz, dtype=np.int64)
    if bsz == 0:
        return typos

    bidx = np.arange(bsz)
    col = nlens - 1  # real needle-column index
    # start row: first argmax of the last real needle column, restricted
    # to real haystack cells (padded cells are 0 and never beat a positive
    # score; all-zero rows argmax to 0 like the scalar scan)
    last_col = H[bidx, col + 1, 1:]
    row = last_col.argmax(axis=1)
    score = last_col[bidx, row]
    row = row.astype(np.int64)

    empty_h = wlens == 0
    row[empty_h] = 0
    score[empty_h] = 0

    active = col > 0
    while active.any():
        at_row0 = active & (row == 0)
        typos[at_row0] += 1
        col[at_row0] -= 1

        rest = active & ~at_row0
        if rest.any():
            b = bidx[rest]
            c = col[rest]
            r = row[rest]
            diag = H[b, c, r]          # real (c-1, r-1)
            left = H[b, c, r + 1]      # real (c-1, r)
            up = H[b, c + 1, r]        # real (c,   r-1)

            take_diag = (diag >= left) & (diag >= up)
            take_left = ~take_diag & (left >= up)
            take_up = ~take_diag & ~take_left

            typos[b] += np.where(
                take_diag & (diag >= score[rest]), 1, np.where(take_left, 1, 0)
            )
            col[b] = c - np.where(take_diag | take_left, 1, 0)
            row[b] = r - np.where(take_diag | take_up, 1, 0)
            score[b] = np.where(take_diag, diag, np.where(take_left, left, up))

        active = col > 0

    typos[(col == 0) & (score == 0)] += 1
    return typos


def sw_score_banded(
    a_texts: list[bytes],
    b_texts: list[bytes],
    band_radius: int = 64,
    scoring: Scoring = DEFAULT_SCORING,
    assume_folded: bool = False,
) -> np.ndarray:
    """Banded wavefront scores for long-document pairs, O(len * band).

    Only cells with |j - i| <= band_radius are computed; everything
    outside the band is an implicit zero (local alignment makes that a
    safe truncation for near-duplicates, whose optimal path hugs the
    diagonal). Rolling buffers hold just the last two diagonals — memory
    is O(batch * max_len), not O(batch * len^2). No traceback.

    Convention: `a` plays the needle (columns), `b` the haystack (rows).
    The exact-match bonus is NOT added here (callers detect exactness by
    hash equality first — same fast path as A4 in the survey).

    ``assume_folded=True`` is the dedup-verify fast path: inputs are
    already case-folded, so the matching-case bonus applies on every
    match and constant-folds into the static bonus (two fewer passes per
    cell), and int16 buffers are used when the maximum possible score
    fits (halves memory traffic). The pipeline verifies normalized text,
    so this is its default.
    """
    assert len(a_texts) == len(b_texts)
    bsz = len(a_texts)
    if bsz == 0:
        return np.zeros(0, dtype=np.int64)

    ns, nlens = _pad_bytes(a_texts)
    hs, wlens = _pad_bytes(b_texts)
    n_max, w_max = ns.shape[1], hs.shape[1]
    R = int(band_radius)

    n_low, n_upper, _, _ = _char_classes(ns, scoring.delimiters)
    h_low, h_upper, h_lower, h_delim = _char_classes(hs, scoring.delimiters)
    delim_bonus, cap_bonus = _haystack_bonus_cols(h_upper, h_lower, h_delim, scoring)
    # int16 is safe while the best possible score fits comfortably
    max_possible = int(min(nlens.max(), wlens.max())) * (
        scoring.match_score + scoring.matching_case_bonus
        + scoring.delimiter_bonus + scoring.capitalization_bonus
    ) + scoring.prefix_bonus + scoring.exact_match_bonus
    dtype = np.int16 if (assume_folded and max_possible < 30000) else np.int32
    # static on-match bonus per haystack position (path-independent);
    # with folded input the matching-case bonus always fires -> fold it in
    static_bonus = (
        delim_bonus + cap_bonus + scoring.match_score
        + (scoring.matching_case_bonus if assume_folded else 0)
    ).astype(dtype)
    h0_nonalpha = ~((hs[:, 0] >= 65) & (hs[:, 0] <= 90)) & ~((hs[:, 0] >= 97) & (hs[:, 0] <= 122))
    h0_nonalpha &= wlens > 0

    # POSITION-MAJOR layout (the reference's interleave insight, K6:
    # interleave/mod.rs:10-34 — position i of all lanes contiguous): every
    # per-diagonal operand below is a (band_width, bsz) slice whose inner
    # axis is the whole batch, so each ufunc runs ~band_width long SIMD
    # loops instead of bsz tiny ones. Measured ~4x over the batch-major
    # layout at bsz=1024. Haystack-side rows are also pre-reversed so
    # diagonal slices are plain row ranges: rev[t] == orig[w_max - 1 - t].
    n_low_T = np.ascontiguousarray(n_low.T)
    h_low_rev_T = np.ascontiguousarray(h_low.T[::-1])
    static_bonus_rev_T = np.ascontiguousarray(static_bonus.T[::-1])
    n_upper_i8_T = np.ascontiguousarray(n_upper.astype(np.int8).T)
    h_upper_i8_rev_T = np.ascontiguousarray(h_upper.astype(np.int8).T[::-1])

    # rolling buffers indexed by slot = i + 1 (slot 0 is a permanent zero);
    # invariant: outside the diagonal's written window every H slot is zero
    # and every gap-open mask slot is True (fresh gaps pay the open
    # penalty, as at the start of every scalar column)
    shape = (n_max + 2, bsz)
    h_prev = np.zeros(shape, dtype=dtype)   # diag d-1
    h_prev2 = np.zeros(shape, dtype=dtype)  # diag d-2
    u_prev = np.ones(shape, dtype=bool)
    l_prev = np.ones(shape, dtype=bool)
    win_prev = (0, 0)   # written slot window [lo, hi) of diag d-1
    win_prev2 = (0, 0)

    best = np.zeros(bsz, dtype=dtype)
    # dtype-scalar penalties keep every intermediate in the small dtype
    go, ge = dtype(scoring.gap_open_penalty), dtype(scoring.gap_extend_penalty)
    go_minus_ge = dtype(scoring.gap_open_penalty - scoring.gap_extend_penalty)
    zero = dtype(0)
    mcb = scoring.matching_case_bonus
    mismatch = dtype(scoring.mismatch_penalty)
    nlens_row = nlens[None, :]
    wlens_row = wlens[None, :]
    min_n, min_w = int(nlens.min()), int(wlens.min())
    iv_all = np.arange(n_max, dtype=np.int64)

    # preallocated per-diagonal scratch, sliced to the band width each
    # round (avoids ~15 allocations per diagonal)
    bw = min(R + 2, n_max) + 1
    sc = {
        "im": np.empty((bw, bsz), dtype=bool),
        "dt": np.empty((bw, bsz), dtype=bool),
        "v2": np.empty((bw, bsz), dtype=bool),
        "un": np.empty((bw, bsz), dtype=bool),
        "ln": np.empty((bw, bsz), dtype=bool),
        "d1": np.empty((bw, bsz), dtype=dtype),
        "d2": np.empty((bw, bsz), dtype=dtype),
        "pen": np.empty((bw, bsz), dtype=dtype),
        "u": np.empty((bw, bsz), dtype=dtype),
        "l": np.empty((bw, bsz), dtype=dtype),
        "mx": np.empty((bw, bsz), dtype=dtype),
        "bo": np.empty((bw, bsz), dtype=dtype),
    }

    for d in range(n_max + w_max - 1):
        # band |j - i| <= R with j = d - i  =>  (d - R) / 2 <= i <= (d + R) / 2
        i_lo = max(0, d - w_max + 1, (d - R + 1) // 2)
        i_hi = min(n_max - 1, d, (d + R) // 2)
        if i_lo > i_hi:
            break  # band has left the matrix; later diagonals are empty too
        j_hi, j_lo = d - i_lo, d - i_hi  # j decreases as i increases
        wd = i_hi - i_lo + 1

        r_lo, r_hi = w_max - 1 - j_hi, w_max - j_lo
        nl = n_low_T[i_lo : i_hi + 1]
        hl = h_low_rev_T[r_lo:r_hi]
        is_match = np.equal(nl, hl, out=sc["im"][:wd])
        bonus = sc["bo"][:wd]
        np.copyto(bonus, static_bonus_rev_T[r_lo:r_hi])
        if not assume_folded:
            np.equal(
                n_upper_i8_T[i_lo : i_hi + 1], h_upper_i8_rev_T[r_lo:r_hi],
                out=sc["v2"][:wd],
            )
            bonus += mcb * sc["v2"][:wd]

        # prefix / offset-prefix patches hit at most the last two cells
        # (j == 0 at i == d, j == 1 at i == d - 1)
        if j_lo == 0:
            bonus[-1] += scoring.prefix_bonus
        if j_lo <= 1 <= j_hi:
            # offset-prefix requires prev column's first cell == 0 and a
            # non-alphabetic first haystack char (algorithm.rs:33-34)
            col0_prev = h_prev2[d - 1] if d >= 1 else np.zeros(bsz, dtype=dtype)
            bonus[(d - 1) - i_lo] += np.where(
                (col0_prev == 0) & h0_nonalpha, scoring.offset_prefix_bonus, 0
            ).astype(dtype)

        diag_in = h_prev2[i_lo : i_hi + 1]
        left_in = h_prev[i_lo : i_hi + 1]
        up_in = h_prev[i_lo + 1 : i_hi + 2]
        u_open = u_prev[i_lo + 1 : i_hi + 2]
        l_open = l_prev[i_lo + 1 : i_hi + 2]

        # diag_score -> d1: max(diag - mismatch, 0), overwritten with
        # diag + bonus where the chars match
        d1 = sc["d1"][:wd]
        np.subtract(diag_in, mismatch, out=d1)
        np.maximum(d1, zero, out=d1)
        d2 = sc["d2"][:wd]
        np.add(diag_in, bonus, out=d2)
        np.copyto(d1, d2, where=is_match)

        # out-of-band up/left neighbors carry score 0 by the buffer
        # invariant; a zero minus any penalty clamps to 0, so no masking.
        # penalty = ge + open_flag * (go - ge), computed in place
        pen = sc["pen"][:wd]
        np.multiply(u_open, go_minus_ge, out=pen, casting="unsafe")
        pen += ge
        up_score = sc["u"][:wd]
        np.subtract(up_in, pen, out=up_score)
        np.maximum(up_score, zero, out=up_score)

        np.multiply(l_open, go_minus_ge, out=pen, casting="unsafe")
        pen += ge
        left_score = sc["l"][:wd]
        np.subtract(left_in, pen, out=left_score)
        np.maximum(left_score, zero, out=left_score)

        maxv = sc["mx"][:wd]
        np.maximum(d1, up_score, out=maxv)
        np.maximum(maxv, left_score, out=maxv)

        # cells past either string's real length must be zeroed; skip the
        # two batch-wide mask passes when the whole window is interior to
        # every pair (true for most diagonals under the tight ladder)
        if not (i_hi < min_n and j_hi < min_w):
            iv = iv_all[i_lo : i_hi + 1]
            valid = sc["v2"][:wd]
            np.less(iv[:, None], nlens_row, out=valid)
            valid &= (d - iv)[:, None] < wlens_row
            maxv *= valid

        diag_taken = np.equal(maxv, d1, out=sc["dt"][:wd])
        u_new = np.not_equal(maxv, up_score, out=sc["un"][:wd])
        u_new |= diag_taken
        l_new = np.not_equal(maxv, left_score, out=sc["ln"][:wd])
        l_new |= diag_taken

        # rotate: the d-2 H buffer is recycled for the current diagonal;
        # clear whatever it held outside the new window
        h_cur = h_prev2
        lo_s, hi_s = i_lo + 1, i_hi + 2
        plo, phi = win_prev2
        if plo < lo_s:
            h_cur[plo : min(lo_s, phi)] = 0
        if phi > hi_s:
            h_cur[max(hi_s, plo) : phi] = 0
        h_cur[lo_s:hi_s] = maxv

        # masks: only diag d-1 is ever read, so overwrite in place (reads
        # above are already materialized), resetting stale cells to True
        mplo, mphi = win_prev
        if mplo < lo_s:
            u_prev[mplo : min(lo_s, mphi)] = True
            l_prev[mplo : min(lo_s, mphi)] = True
        if mphi > hi_s:
            u_prev[max(hi_s, mplo) : mphi] = True
            l_prev[max(hi_s, mplo) : mphi] = True
        u_prev[lo_s:hi_s] = u_new
        l_prev[lo_s:hi_s] = l_new

        np.maximum(best, maxv.max(axis=0), out=best)

        h_prev2 = h_prev
        h_prev = h_cur
        win_prev2 = win_prev
        win_prev = (lo_s, hi_s)

    return best.astype(np.int64)


def greedy_batch(
    needle: bytes,
    texts: list[bytes],
    scoring: Scoring = DEFAULT_SCORING,
    max_cells: int = 4 * 1024 * 1024,
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized greedy fallback matcher: one needle vs a batch of texts.

    Replicates the scalar first-match-wins scan (oracle.match_greedy,
    re-expressed from /root/reference/src/smith_waterman/greedy.rs:9-103)
    with one NumPy pass per needle char instead of a Python loop per text
    byte. Correct because the scalar scan visits every haystack char at
    most once in increasing order, so the path-dependent flags
    (delimiter-bonus armed, previous-char classes) collapse to pure
    functions of the match *position* — precomputable for the whole batch
    (same observation as :func:`_haystack_bonus_cols`). Only the match
    positions and the saturating score accumulation are sequential, and
    those iterate over the needle (short), vectorized across rows.

    Returns ``(scores, exact)``; failed rows (some needle char unmatched)
    score 0, as in the reference. Sub-batches rows so the padded matrix
    stays under ``max_cells`` CELLS; the kernel's temporaries cost ~25
    bytes per cell (two int32 bonus planes, int64 positions, int16/bool
    masks), so the default 4M cells bounds transient memory near ~100 MB
    per task — 32 concurrent Arrow tasks stay within a few GB instead of
    the ~25 GB the old 32M-cell default could transiently demand.
    """
    bsz = len(texts)
    scores = np.zeros(bsz, dtype=np.int64)
    exact = np.zeros(bsz, dtype=bool)
    n_len = len(needle)
    if bsz == 0 or n_len == 0:
        return scores, exact

    nb = np.frombuffer(needle, dtype=np.uint8)
    n_low = np.where((nb >= 65) & (nb <= 90), nb + 32, nb).astype(np.int16)

    # process in length-sorted sub-batches to bound padded-matrix size
    order = np.argsort([len(t) for t in texts], kind="stable")
    start = 0
    while start < bsz:
        w0 = max(len(texts[order[start]]), 1)
        stop = start + 1
        while stop < bsz:
            w = max(len(texts[order[stop]]), 1)
            if (stop - start + 1) * w > max_cells:
                break
            stop += 1
        sel = order[start:stop]
        s, e = _greedy_chunk([texts[i] for i in sel], nb, n_low, scoring)
        scores[sel] = s
        exact[sel] = e
        start = stop
    return scores, exact


def _greedy_chunk(
    texts: list[bytes], nb: np.ndarray, n_low: np.ndarray, scoring: Scoring
) -> tuple[np.ndarray, np.ndarray]:
    bsz, n_len = len(texts), nb.size
    hs, lens = _pad_bytes(texts)
    w = hs.shape[1]
    h_low, h_upper, h_lower, h_delim = _char_classes(hs, scoring.delimiters)
    # positional bonuses (delimiter + capitalization), identical derivation
    # to the DP kernels — the greedy scan arms/reads the same flags
    delim_bonus, cap_bonus = _haystack_bonus_cols(h_upper, h_lower, h_delim, scoring)
    pos_bonus = (delim_bonus + cap_bonus).astype(np.int64)
    pos_bonus[:, 0] = 0  # cap/delim bonuses need a previous char

    cols = np.arange(w, dtype=np.int64)[None, :]
    h = np.zeros(bsz, dtype=np.int64)          # scan position (start_idx)
    score = np.zeros(bsz, dtype=np.int64)
    alive = lens >= n_len
    bidx = np.arange(bsz)
    go, ge = scoring.gap_open_penalty, scoring.gap_extend_penalty

    for k in range(n_len):
        bound = lens - n_len + k
        m = (h_low == n_low[k]) & (cols >= h[:, None]) & (cols <= bound[:, None])
        found = m.any(axis=1)
        p = m.argmax(axis=1)  # first match position (0 when none — masked by found)
        alive &= found

        add = np.full(bsz, scoring.match_score, dtype=np.int64)
        gap_len = p - h  # chars skipped before the match
        gap = np.where(
            (gap_len > 0) & (k != 0), go + ge * np.maximum(gap_len - 1, 0), 0
        )
        score = np.maximum(score + add - gap, 0)
        bonus = np.where(hs[bidx, p] == nb[k], scoring.matching_case_bonus, 0)
        bonus = bonus + np.where(p == 0, scoring.prefix_bonus, 0)
        bonus = bonus + pos_bonus[bidx, p]
        score = np.where(alive, score + bonus, score)
        h = p + 1

    scores = np.where(alive, score, 0)
    exact = (lens == n_len) & np.array(
        [t == nb.tobytes() for t in texts], dtype=bool
    )
    scores[exact & alive] += scoring.exact_match_bonus
    return scores, exact & alive


def self_scores_batch(texts: list[bytes], scoring: Scoring = DEFAULT_SCORING) -> np.ndarray:
    """Vectorized closed-form self-alignment scores (see oracle.self_score)."""
    out = np.zeros(len(texts), dtype=np.int64)
    if not texts:
        return out
    arr, lens = _pad_bytes(texts)
    low, is_upper, is_lower, is_delim = _char_classes(arr, scoring.delimiters)
    w = arr.shape[1]
    pos_valid = np.arange(w)[None, :] < lens[:, None]

    prev_delim = np.zeros_like(is_delim)
    prev_delim[:, 1:] = is_delim[:, :-1]
    prev_lower = np.zeros_like(is_lower)
    prev_lower[:, 1:] = is_lower[:, :-1]
    seen_nondelim = np.zeros_like(is_delim)
    if w > 1:
        seen_nondelim[:, 1:] = np.cumsum(~is_delim, axis=1)[:, :-1] > 0

    per_char = (scoring.match_score + scoring.matching_case_bonus) * pos_valid
    delim_b = scoring.delimiter_bonus * (prev_delim & seen_nondelim & ~is_delim & pos_valid)
    cap_b = scoring.capitalization_bonus * (is_upper & prev_lower & pos_valid)
    cap_b[:, 0] = 0
    delim_b[:, 0] = 0

    out = (per_char + delim_b + cap_b).sum(axis=1).astype(np.int64)
    out[lens > 0] += scoring.prefix_bonus + scoring.exact_match_bonus
    return out


def normalized_similarity(
    scores: np.ndarray, self_a: np.ndarray, self_b: np.ndarray, exact_bonus_included: bool = False
) -> np.ndarray:
    """Map raw pair scores into [0, 1]: 2*score / (self(a) + self(b)).

    Identical texts reach ~1.0 (slightly under, because the pair score
    excludes the exact bonus counted in the self scores); unrelated texts
    sit near 0. This is the verify stage's decision statistic.
    """
    denom = (self_a + self_b).astype(np.float64)
    denom[denom == 0] = 1.0
    return np.clip(2.0 * scores.astype(np.float64) / denom, 0.0, 1.0)
