"""ANSI-SQL (DuckDB) re-expressions of the MinHash-LSH and SimHash
candidate pipelines, used as independent correctness oracles for the
non-relational Spark queries.

Every stage of the numpy signature kernel (hashing.py) is re-derived
here in pure SQL over the same ``documents`` table:

  normalize -> rolling-polynomial k-gram hash -> splitmix64 finalize
  -> OPH binning (bin = h >> 57, value = 40 mid bits) -> rotation
  densification (Shrivastava & Li ICML'14) -> band xor-fold -> band key
  -> bucket pair generation (dense all-pairs / chain+star for big
  buckets)  [MinHash-LSH path]

  shingle hashes -> per-bit majority -> 64-bit SimHash -> 16-bit chunk
  buckets -> pairs -> Hamming <= k filter        [SimHash path]

All constants (seeds, band derivation, caps) are computed at call time
from the SAME splitmix64 implementation the kernels use, so the SQL
cannot silently drift from the numpy path. splitmix64 itself is
re-expressed arithmetically: DuckDB has no wrapping u64 multiply, so
``(x * c) mod 2^64`` is decomposed into 32-bit halves over HUGEINT.

Validated byte-identical to the Spark queries at sf0.001 and sf0.01
(see tests/test_sql_oracles.py).

Precondition: every document is at least ``shingle_k`` bytes after
normalization. The numpy kernel NUL-pads shorter docs to k (concat_docs)
and still emits one signature; the SQL emits no shingles for them. The
driver fixture's minimum doc length (~50 chars) clears this by 4x.
"""

from __future__ import annotations

import numpy as np

from frizbee_spark.constants import DEFAULT_SCORING, Scoring
from frizbee_spark.functions.hashing import splitmix64
from frizbee_spark.operators.dedup import DEFAULT_DEDUP, DedupConfig

_M = 1 << 64
_GAMMA = 0x9E3779B97F4A7C15
_M1 = 0xBF58476D1CE4E5B9
_M2 = 0x94D049BB133111EB
_BASE = 0x100000001B3          # rolling-hash base (hashing.py `_BASE`)
_OPH_VBITS = 40                # hashing.py `_OPH_VBITS`
_SIG_SEED = 1                  # compute_signatures default seed
_BAND_SEED = 2                 # band-key derivation seed (hashing.py)
_SHORT_BAND_SEED = 3           # tier-2 short-doc band seed (dedup.py)


def _sm64(x: int) -> int:
    return int(splitmix64(np.uint64(x)))


def _mulmod(e: str, c: int) -> str:
    """SQL for ``({e} * c) mod 2^64`` via 32-bit half decomposition."""
    lo, hi = c & 0xFFFFFFFF, c >> 32
    return (f"(((CAST({e} AS HUGEINT) * {lo} + "
            f"((CAST({e} AS HUGEINT) * {hi}) % 4294967296) * 4294967296)"
            f" % {_M})::UBIGINT)")


def _sm64_cols(in_expr: str, out: str, p: str) -> str:
    """Column chain computing ``splitmix64(in_expr) AS out`` (DuckDB
    allows lateral column references within one SELECT list)."""
    return (
        f"((CAST({in_expr} AS HUGEINT) + {_GAMMA}) % {_M})::UBIGINT AS {p}0,\n"
        f" {_mulmod(f'xor({p}0, {p}0 >> 30)', _M1)} AS {p}1,\n"
        f" {_mulmod(f'xor({p}1, {p}1 >> 27)', _M2)} AS {p}2,\n"
        f" xor({p}2, {p}2 >> 31) AS {out}"
    )


def _materialize(sql: str) -> str:
    """Force every non-recursive CTE to ``AS MATERIALIZED``.

    DuckDB inlines plain CTEs at each reference site inside a
    ``WITH RECURSIVE`` block; chains like gated -> capped -> surv ->
    chars reference their parents 2-3x each, so inlining re-executes
    the whole upstream (shingle/OPH/SimHash) pipeline combinatorially —
    a 3-doc SW-verify oracle took 39s inlined vs 3s materialized.
    Recursive CTEs are declared ``name(cols) AS (`` and are untouched;
    named windows (``WINDOW w AS (``) are excluded.
    """
    import re

    return re.sub(r"(?<!WINDOW )\b(\w+) AS \(", r"\1 AS MATERIALIZED (", sql)


def _gram_terms(k: int, text_expr: str = "nt") -> str:
    """SQL polynomial ``sum(byte[j] * BASE^j)`` over the k-gram starting
    at 1-based position ``i`` of ``text_expr`` — equal to the kernel's
    prefix-sum-difference rolling hash rescaled to the window origin."""
    pows = [pow(_BASE, j, _M) for j in range(k)]
    return " + ".join(
        f"ascii(substr({text_expr}, i + {j}, 1))::HUGEINT * {pows[j]}"
        for j in range(k)
    )


def _shingle_cte(cfg: DedupConfig) -> str:
    """normalize + rolling k-gram polynomial hash + splitmix64 finalize."""
    k = cfg.shingle_k
    terms = _gram_terms(k)
    return f"""
nd AS (
    SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS nt
    FROM documents
),
shraw AS (
    SELECT doc_id, (({terms}) % {_M})::UBIGINT AS rawh
    FROM nd, unnest(generate_series(1, length(nt) - {k - 1})) AS t(i)
),
sh AS (
    SELECT doc_id, {_sm64_cols('rawh', 'sh', 'z')}
    FROM shraw
)"""


def _short_band_cte(cfg: DedupConfig) -> str:
    """Tier-2 short-doc band keys (``skey``): the same densified OPH
    ``slots`` re-banded at (short_bands x short_band_rows) with the
    tier-2 seed, emitted only for docs under ``short_doc_max_bytes``;
    band_id is offset by ``cfg.bands`` — the disjoint id space the Spark
    pair generators use. Requires the ``slots`` CTE upstream."""
    bands2, rows2 = cfg.short_bands, cfg.short_band_rows
    row_c = [_sm64(_SHORT_BAND_SEED + r) for r in range(rows2)]
    band_d = [_sm64(b + _SHORT_BAND_SEED) for b in range(bands2)]
    dvals = ", ".join(f"({b}, {band_d[b]}::UBIGINT)" for b in range(bands2))
    case_c = ("CASE bin % " + str(rows2) + " "
              + " ".join(f"WHEN {r} THEN {row_c[r]}::UBIGINT"
                         for r in range(rows2 - 1))
              + f" ELSE {row_c[rows2 - 1]}::UBIGINT END")
    return f"""
shortdocs AS (
    SELECT doc_id FROM nd WHERE strlen(nt) < {cfg.short_doc_max_bytes}
),
sbelem AS (
    SELECT doc_id, bin // {rows2} AS sband,
           {_sm64_cols(f'xor(slot, {case_c})', 'e', 'sv')}
    FROM slots WHERE doc_id IN (SELECT doc_id FROM shortdocs)
),
sbacc AS (SELECT doc_id, sband, bit_xor(e) AS acc FROM sbelem GROUP BY 1, 2),
sdconst(sband, dv) AS (VALUES {dvals}),
skey AS (
    SELECT doc_id, sband + {cfg.bands} AS band_id, bk AS band_key FROM (
        SELECT a.doc_id, a.sband,
               {_sm64_cols('xor(a.acc, c.dv)', 'bk', 'su')}
        FROM sbacc a JOIN sdconst c ON a.sband = c.sband
    )
)"""


def _oph_band_cte(cfg: DedupConfig) -> str:
    """OPH signature slots + rotation densification + band keys."""
    num_perm, bands, rows = cfg.num_perm, cfg.bands, cfg.band_rows
    bits = num_perm.bit_length() - 1
    vmask = (1 << _OPH_VBITS) - 1
    sseed = _sm64(_SIG_SEED ^ 0x0F1E2D3C4B5A6978)
    row_c = [_sm64(_BAND_SEED + r) for r in range(rows)]
    band_d = [_sm64(b + _BAND_SEED) for b in range(bands)]
    dvals = ", ".join(f"({b}, {band_d[b]}::UBIGINT)" for b in range(bands))
    case_c = ("CASE bin % " + str(rows) + " "
              + " ".join(f"WHEN {r} THEN {row_c[r]}::UBIGINT"
                         for r in range(rows - 1))
              + f" ELSE {row_c[rows - 1]}::UBIGINT END")
    return f"""
oph AS (
    SELECT doc_id, (h2 >> {64 - bits})::BIGINT AS bin,
           ((h2 >> {64 - bits - _OPH_VBITS}) & {vmask}::UBIGINT) AS val
    FROM (SELECT doc_id, {_sm64_cols(f'xor(sh, {sseed}::UBIGINT)', 'h2', 'y')} FROM sh)
),
filled AS (SELECT doc_id, bin, min(val) AS mv FROM oph GROUP BY 1, 2),
grid AS (
    SELECT d.doc_id, g.bin
    FROM (SELECT DISTINCT doc_id FROM nd) d,
         unnest(generate_series(0, {num_perm - 1})) AS g(bin)
),
borrow AS (
    SELECT g.doc_id, g.bin,
           min((f.bin - g.bin + {num_perm}) % {num_perm}) AS k
    FROM grid g
    JOIN filled f ON f.doc_id = g.doc_id AND f.bin <> g.bin
    LEFT JOIN filled e ON e.doc_id = g.doc_id AND e.bin = g.bin
    WHERE e.bin IS NULL
    GROUP BY 1, 2
),
densified AS (
    SELECT doc_id, bin, (dz & {vmask}::UBIGINT) AS slot
    FROM (
        SELECT b.doc_id, b.bin,
               {_sm64_cols(f'xor(f.mv, ((CAST(b.k AS HUGEINT) * {_GAMMA}) % {_M})::UBIGINT)', 'dz', 'w')}
        FROM borrow b
        JOIN filled f ON f.doc_id = b.doc_id
                     AND f.bin = (b.bin + b.k) % {num_perm}
    )
),
slots AS (
    SELECT doc_id, bin, mv AS slot FROM filled
    UNION ALL SELECT doc_id, bin, slot FROM densified
),
belem AS (
    SELECT doc_id, bin // {rows} AS band_id,
           {_sm64_cols(f'xor(slot, {case_c})', 'e', 'v')}
    FROM slots
),
bacc AS (SELECT doc_id, band_id, bit_xor(e) AS acc FROM belem GROUP BY 1, 2),
dconst(band_id, dv) AS (VALUES {dvals}),
bkey AS (
    SELECT doc_id, band_id, bk AS band_key FROM (
        SELECT a.doc_id, a.band_id,
               {_sm64_cols('xor(a.acc, c.dv)', 'bk', 'u')}
        FROM bacc a JOIN dconst c ON a.band_id = c.band_id
    )
)"""


def _pairs_cte(bucket_cte: str, key_cols: str, cfg: DedupConfig,
               payload: str | None = None) -> str:
    """Bucket -> candidate pairs, mirroring pairs_from_buckets: all pairs
    for buckets of size <= dense_cap, chain + star-from-first edges for
    bigger buckets (connectivity-preserving linear edge count). With
    ``payload`` (a column of ``bucket_cte``) each pair row also carries
    both members' payload values as pa/pb — the twin of the kernel's
    payload gather (same row identity, same a<b orientation: buckets are
    enumerated in ascending doc_id order on both sides)."""
    pay_sel = f", {payload}" if payload else ""
    pay_dense = f", x.{payload} AS pa, y.{payload} AS pb" if payload else ""
    pay_big = (f", {payload} AS pl, lead({payload}) OVER w AS nxtpl,"
               f" first_value({payload}) OVER w AS fstpl" if payload else "")
    pay_chain = ", pl AS pa, nxtpl AS pb" if payload else ""
    pay_star = ", fstpl AS pa, pl AS pb" if payload else ""
    return f"""
szd AS (
    SELECT {key_cols}, doc_id{pay_sel},
           count(*) OVER (PARTITION BY {key_cols}) AS n
    FROM {bucket_cte}
),
dense AS (
    SELECT x.doc_id AS a, y.doc_id AS b{pay_dense}
    FROM szd x JOIN szd y USING ({key_cols})
    WHERE x.n <= {cfg.dense_cap} AND x.doc_id < y.doc_id
),
big AS (
    SELECT doc_id,
           row_number() OVER w AS rn,
           lead(doc_id) OVER w AS nxt,
           first_value(doc_id) OVER w AS fst{pay_big}
    FROM szd WHERE n > {cfg.dense_cap}
    WINDOW w AS (PARTITION BY {key_cols} ORDER BY doc_id)
),
allp AS (
    SELECT * FROM dense
    UNION ALL SELECT doc_id AS a, nxt AS b{pay_chain} FROM big WHERE nxt IS NOT NULL
    UNION ALL SELECT fst AS a, doc_id AS b{pay_star} FROM big WHERE rn >= 3
)"""


def _lsh_two_tier(cfg: DedupConfig) -> str:
    """CTE chain ``lshb`` + pairs + ``lshp(a, b)``: both band tiers
    through one pair pass, tier-2-only pairs gated on >= short_min_bands
    distinct band collisions — the twin of lsh_band_pairs. The tier flag
    rides _pairs_cte's payload (pa/pb, constant within a bucket)."""
    return (f"""
lshb AS (
    SELECT doc_id, band_id, band_key, 0 AS fl FROM bkey
    UNION ALL
    SELECT doc_id, band_id, band_key, 1 AS fl FROM skey
),
{_pairs_cte('lshb', 'band_id, band_key', cfg, payload='fl').lstrip().lstrip(',')},
lshp AS (
    SELECT a, b FROM allp GROUP BY 1, 2
    HAVING min(pa) = 0 OR count(*) >= {cfg.short_min_bands}
)""")


def minhash_lsh_sql(cfg: DedupConfig = DEFAULT_DEDUP) -> str:
    """Full-pipeline SQL oracle for ``lsh_band_pairs(compute_signatures(
    normalize_text(documents)))`` — output columns (a, b)."""
    if cfg.short_doc_max_bytes <= 0:
        return _materialize(
            f"WITH {_shingle_cte(cfg)}, {_oph_band_cte(cfg)}, "
            + _pairs_cte("bkey", "band_id, band_key", cfg)
            + "\nSELECT DISTINCT a, b FROM allp ORDER BY a, b")
    return _materialize(
        f"WITH {_shingle_cte(cfg)}, {_oph_band_cte(cfg)}, "
        f"{_short_band_cte(cfg)}, {_lsh_two_tier(cfg)}"
        "\nSELECT a, b FROM lshp ORDER BY a, b")


def minhash_jaccard_estimate_sql(cfg: DedupConfig = DEFAULT_DEDUP) -> str:
    """SQL oracle for ``minhash_jaccard_estimate(compute_signatures(
    normalize_text(documents), keep_minhash=True))`` — output columns
    (a, b, est_jaccard). Reuses the OPH derivation's ``slots`` CTE (one
    row per (doc_id, bin)); agreement is a per-pair equality count over
    the 128 bins, divided by num_perm."""
    if cfg.short_doc_max_bytes > 0:
        return _materialize(
            f"WITH {_shingle_cte(cfg)}, {_oph_band_cte(cfg)}, "
            f"{_short_band_cte(cfg)}, {_lsh_two_tier(cfg)}"
            + f""",
p AS (SELECT a, b FROM lshp),
agree AS (
    SELECT p.a, p.b,
           sum(CASE WHEN sa.slot = sb.slot THEN 1 ELSE 0 END) AS eq
    FROM p
    JOIN slots sa ON sa.doc_id = p.a
    JOIN slots sb ON sb.doc_id = p.b AND sb.bin = sa.bin
    GROUP BY 1, 2
)
SELECT a, b, round(eq * 1.0 / {cfg.num_perm}, 4) AS est_jaccard
FROM agree ORDER BY a, b""")
    return _materialize(
        f"WITH {_shingle_cte(cfg)}, {_oph_band_cte(cfg)}, "
        + _pairs_cte("bkey", "band_id, band_key", cfg)
        + f""",
p AS (SELECT DISTINCT a, b FROM allp),
agree AS (
    SELECT p.a, p.b,
           sum(CASE WHEN sa.slot = sb.slot THEN 1 ELSE 0 END) AS eq
    FROM p
    JOIN slots sa ON sa.doc_id = p.a
    JOIN slots sb ON sb.doc_id = p.b AND sb.bin = sa.bin
    GROUP BY 1, 2
)
SELECT a, b, round(eq * 1.0 / {cfg.num_perm}, 4) AS est_jaccard
FROM agree ORDER BY a, b""")


def simhash_cte(cfg: DedupConfig) -> str:
    """64-bit SimHash per doc from per-bit shingle-hash majorities."""
    return f"""
cnt AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY 1),
bitsum AS (
    SELECT s.doc_id, j, sum(((s.sh >> j) & 1)::BIGINT) AS bs
    FROM sh s, unnest(generate_series(0, 63)) AS t(j)
    GROUP BY 1, 2
),
simh AS (
    SELECT b.doc_id,
           (sum(CASE WHEN 2 * b.bs > c.c THEN (1::HUGEINT << j) ELSE 0 END)
            % {_M})::UBIGINT AS sim
    FROM bitsum b JOIN cnt c ON b.doc_id = c.doc_id
    GROUP BY 1
)"""


def simhash_chunks_cte(cfg: DedupConfig) -> str:
    """``chunks(doc_id, chunk_id, chunk)`` — the block-combination table
    keys (dedup.simhash_table_layout twin, big-endian pack like
    dedup._simhash_key_col). One SELECT per table, unioned."""
    from frizbee_spark.operators.dedup import simhash_table_layout

    sels = []
    for t, blocks in enumerate(simhash_table_layout(cfg.hamming_max)):
        total = sum(w for _, w in blocks)
        consumed = 0
        parts = []
        for start, width in blocks:
            consumed += width
            parts.append(
                f"(((sim >> {start}) & {(1 << width) - 1}) << {total - consumed})"
            )
        sels.append(
            f"SELECT doc_id, {t} AS chunk_id, "
            f"({' | '.join(parts)})::BIGINT AS chunk FROM simh"
        )
    return "chunks AS (\n    " + "\n    UNION ALL ".join(sels) + "\n)"


def winnow_span_sql(cfg: DedupConfig = DEFAULT_DEDUP) -> str:
    """SQL oracle for ``winnow_span_pairs(normalize_text(documents), cfg)``
    with confirm=True — output columns (a, b, shared_fps, span_confirmed).

    Winnowing reduction used: the kernel's consecutive-repeat dedup plus
    the final per-(doc, value) unique mean a doc's fingerprint set is
    exactly the DISTINCT sliding-window-min values over its shingle-hash
    stream (every distinct window-min value starts some run, and run
    starts are always kept), so a window-frame ``min()`` + DISTINCT
    replicates the kernel bit-for-bit. Docs with fewer than ``window``
    shingles contribute their single global min — the unified frame
    (CURRENT ROW .. window-1 FOLLOWING, positions clamped to
    ``greatest(count - window + 1, 1)``) covers both cases.

    The confirm pass is expressed as its semantic truth — EXISTS a
    byte-identical shared k-gram — which equals the kernel's
    hash-intersect + byte-check modulo 64-bit hash collisions.
    """
    k, win = cfg.span_shingle_k, cfg.winnow_window
    return _materialize(f"""
WITH nd AS (
    SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS nt
    FROM documents
),
spanwork AS (
    SELECT doc_id, nt FROM nd WHERE octet_length(encode(nt)) >= {cfg.span_min_len}
),
shp AS (
    SELECT doc_id, i AS pos,
           count(*) OVER (PARTITION BY doc_id) AS c,
           {_sm64_cols(f'(({_gram_terms(k)}) % {_M})::UBIGINT', 'sh', 'z')}
    FROM spanwork, unnest(generate_series(1, length(nt) - {k - 1})) AS t(i)
),
wm AS (
    SELECT doc_id, pos, c,
           min(sh) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN CURRENT ROW AND {win - 1} FOLLOWING
           ) AS fpv
    FROM shp
),
fps AS (
    SELECT DISTINCT doc_id, fpv
    FROM wm WHERE pos <= greatest(c - {win} + 1, 1)
),
{_pairs_cte('fps', 'fpv', cfg).lstrip()},
shared AS (
    SELECT a, b, count(*) AS shared_fps
    FROM allp GROUP BY 1, 2
    HAVING count(*) >= {cfg.span_min_shared}
),
grams AS (
    SELECT DISTINCT doc_id, substr(nt, i, {k}) AS g
    FROM spanwork, unnest(generate_series(1, length(nt) - {k - 1})) AS t(i)
)
SELECT s.a, s.b, s.shared_fps,
       EXISTS (
           SELECT 1 FROM grams ga JOIN grams gb ON ga.g = gb.g
           WHERE ga.doc_id = s.a AND gb.doc_id = s.b
       ) AS span_confirmed
FROM shared s
ORDER BY s.a, s.b""")


def span_extents_sql(cfg: DedupConfig = DEFAULT_DEDUP) -> str:
    """SQL oracle for ``span_extents(normalize_text(documents), cfg)`` —
    output columns (a, b, a_start, b_start, span_len).

    Witness semantics replicated from the kernel chain: a (doc, value)
    fingerprint's position is the first shingle position at-or-after the
    earliest valid window whose min is that value (winnow_fingerprints
    keeps the first in-window occurrence per kept window, then the
    per-(doc,value) minimum); pair positions ride the bucket pairing as
    payloads (kernel ``payload=`` path, here the _pairs_cte payload
    twin); the pair's witness is the lexicographic minimum (pos_a, pos_b)
    over its shared-fingerprint rows (packed into one BIGINT for the
    min). Extents are the max prefix-equal d on each side — a monotone
    predicate, so ``max(d) WHERE substr equal`` is exact. Positions are
    1-based here, 0-based bytes in Spark; fixture text is ASCII so char
    arithmetic equals byte arithmetic (same scoping note as
    fuzzy_match_sql).
    """
    k, win = cfg.span_shingle_k, cfg.winnow_window
    pack = 1 << 32
    return _materialize(f"""
WITH nd AS (
    SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS nt
    FROM documents
),
spanwork AS (
    SELECT doc_id, nt FROM nd WHERE octet_length(encode(nt)) >= {cfg.span_min_len}
),
shp AS (
    SELECT doc_id, i AS pos,
           count(*) OVER (PARTITION BY doc_id) AS c,
           {_sm64_cols(f'(({_gram_terms(k)}) % {_M})::UBIGINT', 'sh', 'z')}
    FROM spanwork, unnest(generate_series(1, length(nt) - {k - 1})) AS t(i)
),
wm AS (
    SELECT doc_id, pos, c,
           min(sh) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN CURRENT ROW AND {win - 1} FOLLOWING
           ) AS fpv
    FROM shp
),
w0 AS (
    SELECT doc_id, fpv, min(pos) AS w0
    FROM wm WHERE pos <= greatest(c - {win} + 1, 1)
    GROUP BY 1, 2
),
fps AS (
    SELECT w.doc_id, w.fpv, min(s.pos) AS pos
    FROM w0 w JOIN shp s
      ON s.doc_id = w.doc_id AND s.sh = w.fpv AND s.pos >= w.w0
    GROUP BY 1, 2
),
{_pairs_cte('fps', 'fpv', cfg, payload='pos').lstrip()},
shared AS (
    SELECT a, b, min(pa * {pack} + pb) AS wkey
    FROM allp GROUP BY 1, 2
    HAVING count(*) >= {cfg.span_min_shared}
),
conf AS (
    SELECT s.a, s.b,
           (s.wkey // {pack}) AS pa, (s.wkey % {pack}) AS pb,
           ta.nt AS ta, tb.nt AS tb
    FROM shared s
    JOIN spanwork ta ON ta.doc_id = s.a
    JOIN spanwork tb ON tb.doc_id = s.b
    WHERE substr(ta.nt, (s.wkey // {pack})::INT, {k})
        = substr(tb.nt, (s.wkey % {pack})::INT, {k})
),
-- DuckDB's generate_series cannot take correlated bounds, so the
-- candidate extension lengths come from one uncorrelated series sized
-- by the longest span-eligible doc, range-filtered per pair
dser AS (
    SELECT i AS d
    FROM unnest(generate_series(
        1, (SELECT greatest(max(length(nt)), 1) FROM spanwork))) AS t(i)
),
ext AS (
    SELECT a, b, pa, pb,
           coalesce((SELECT max(d) FROM dser
                     WHERE d <= least(pa, pb) - 1
                       AND substr(ta, (pa - d)::INT, d::INT)
                         = substr(tb, (pb - d)::INT, d::INT)), 0) AS lft,
           coalesce((SELECT max(d) FROM dser
                     WHERE d <= least(length(ta) - pa, length(tb) - pb) - {k} + 1
                       AND substr(ta, (pa + {k})::INT, d::INT)
                         = substr(tb, (pb + {k})::INT, d::INT)), 0) AS rgt
    FROM conf
)
SELECT a, b,
       (pa - 1 - lft)::BIGINT AS a_start,
       (pb - 1 - lft)::BIGINT AS b_start,
       (lft + {k} + rgt)::BIGINT AS span_len
FROM ext ORDER BY a, b""")


def _delims_sql(scoring: Scoring) -> str:
    quoted = ", ".join("'" + chr(c).replace("'", "''") + "'"
                       for c in scoring.delimiters)
    return f"({quoted})"


def _sw_cell_expr(cfg: DedupConfig, scoring: Scoring) -> str:
    """Lambda body computing one banded-SW cell as a struct(h, u, l).

    Variables in scope: ``q`` (0-based needle index, the lambda arg) and
    row columns ``dn`` (diagonal being computed), ``ta``/``tb`` (needle/
    haystack text), ``sbl`` (static per-haystack-position bonus list),
    ``h0na`` (first haystack char non-alphabetic), ``lo1``/``c1`` (window
    start + cell structs of diagonal dn-1), ``lo2``/``h2`` (window start
    + H list of diagonal dn-2). Reads outside a stored window fall back
    to the kernel's buffer invariant: H = 0, gap-open masks = TRUE.
    """
    mm = scoring.mismatch_penalty
    go, ge = scoring.gap_open_penalty, scoring.gap_extend_penalty
    diag_in = "(CASE WHEN q > lo2 THEN coalesce(h2[q - lo2], 0) ELSE 0 END)"
    left_in = "(CASE WHEN q > lo1 THEN coalesce(c1[q - lo1].h, 0) ELSE 0 END)"
    # NB: the reference scan carries BOTH gap-open flags along the
    # haystack axis (oracle.smith_waterman: up_gap_open / left_gap_open
    # are per-column scalars updated every j step), so the left-gap flag
    # is read from the UP neighbor (i, j-1), not from (i-1, j).
    l_open = "coalesce(c1[q - lo1 + 1].l, TRUE)"
    up_in = "coalesce(c1[q - lo1 + 1].h, 0)"
    u_open = "coalesce(c1[q - lo1 + 1].u, TRUE)"
    is_match = "(substr(ta, q + 1, 1) = substr(tb, dn - q + 1, 1))"
    bonus = (
        f"(sbl[dn - q + 1]"
        f" + CASE WHEN dn - q = 0 THEN {scoring.prefix_bonus} ELSE 0 END"
        f" + CASE WHEN dn - q = 1 AND {diag_in} = 0 AND h0na"
        f"   THEN {scoring.offset_prefix_bonus} ELSE 0 END)"
    )
    d1 = (f"(CASE WHEN {is_match} THEN {diag_in} + {bonus}"
          f" ELSE greatest({diag_in} - {mm}, 0) END)")
    ups = f"greatest({up_in} - CASE WHEN {u_open} THEN {go} ELSE {ge} END, 0)"
    lfs = f"greatest({left_in} - CASE WHEN {l_open} THEN {go} ELSE {ge} END, 0)"
    h = f"greatest({d1}, {ups}, {lfs})"
    return (
        f"struct_pack(h := {h},"
        f" u := ({h} <> {ups}) OR ({h} = {d1}),"
        f" l := ({h} <> {lfs}) OR ({h} = {d1}))"
    )


def sw_verify_cte(cfg: DedupConfig = DEFAULT_DEDUP,
                  scoring: Scoring = DEFAULT_SCORING,
                  include_simhash: bool = True) -> str:
    """CTE chain (requires ``nd`` + ``sh`` + ``simh`` upstream, plus
    ``chunks`` when ``include_simhash``) computing
    ``verified(a, b, score, similarity, exact, verified)`` — the SQL twin
    of unified_candidate_pairs + verify_pairs with the exact/Hamming
    pre-join gates and the banded wavefront SW scorer. ``include_simhash``
    adds the block-combination SimHash buckets as a third candidate
    source, matching unified_candidate_pairs(include_simhash=True).

    The banded Smith-Waterman runs as a recursive CTE over anti-diagonals
    (the wavefront has no intra-diagonal dependency): state per (pair,
    diagonal) is the in-band window of H values + gap-open masks as LIST
    columns; the per-pair band is independent of batch composition, so
    the per-pair recursion reproduces sw_score_banded bit-for-bit. The
    normalized-similarity decision statistic (2*score / (self_a+self_b))
    and the closed-form self scores match self_scores_batch /
    normalized_similarity.
    """
    R = cfg.band_radius
    dels = _delims_sql(scoring)
    per_char = scoring.match_score + scoring.matching_case_bonus
    self_const = scoring.prefix_bonus + scoring.exact_match_bonus
    db = scoring.delimiter_bonus
    return f"""
txt AS (
    SELECT doc_id, nt, octet_length(encode(nt)) AS nb, length(nt) AS nc
    FROM nd
),
cand_buckets AS (
    SELECT doc_id, concat('exact:', md5(nt)) AS ck, 0 AS fl FROM txt
    UNION ALL
    SELECT doc_id, concat('lsh:', band_id, ':', band_key) AS ck, 0 AS fl FROM bkey{'''
    UNION ALL
    SELECT doc_id, concat('sim:', chunk_id, ':', chunk) AS ck, 0 AS fl FROM chunks''' if include_simhash else ''}{'''
    UNION ALL
    SELECT doc_id, concat('lsh2:', band_id, ':', band_key) AS ck, 1 AS fl FROM skey''' if cfg.short_doc_max_bytes > 0 else ''}
),
{_pairs_cte('cand_buckets', 'ck', cfg, payload='fl').lstrip()},
-- tier-2 (short-doc band) buckets are individually hot: a pair backed
-- ONLY by them needs >= short_min_bands distinct collisions
-- (unified_candidate_pairs' closing groupBy rule)
cand AS (
    SELECT a, b FROM allp GROUP BY 1, 2
    HAVING min(pa) = 0 OR count(*) >= {cfg.short_min_bands}
),
gated AS (
    SELECT c.a, c.b, xa.nt AS ta, xb.nt AS tb, xa.nc AS n, xb.nc AS m,
           (xa.nt = xb.nt) AS is_exact,
           bit_count(xor(sa.sim, sb.sim)) AS ham,
           (xa.nt <> xb.nt
            AND least(xa.nb, xb.nb) >= {cfg.hamming_gate_min_bytes}
            AND bit_count(xor(sa.sim, sb.sim)) > {cfg.verify_hamming_reject})
               AS is_rej
    FROM cand c
    JOIN txt xa ON xa.doc_id = c.a
    JOIN txt xb ON xb.doc_id = c.b
    JOIN simh sa ON sa.doc_id = c.a
    JOIN simh sb ON sb.doc_id = c.b
),
-- unified_candidate_pairs drops Hamming-rejected pairs outright, then
-- applies the per-doc degree cap: rank each doc's surviving partners by
-- (Hamming, partner id); an edge survives if EITHER endpoint ranks it
-- within degree_cap (dedup.py unified_candidate_pairs)
bidir AS (
    SELECT a AS u, b AS v, ham FROM gated WHERE NOT is_rej
    UNION ALL
    SELECT b AS u, a AS v, ham FROM gated WHERE NOT is_rej
),
capped AS (
    SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
    FROM (
        SELECT u, v,
               row_number() OVER (PARTITION BY u ORDER BY ham, v) AS rk
        FROM bidir
    ) WHERE rk <= {cfg.degree_cap}
),
surv AS (
    SELECT g.* FROM gated g JOIN capped c ON c.a = g.a AND c.b = g.b
    WHERE NOT g.is_exact
),
survdocs AS (
    SELECT DISTINCT doc_id FROM (
        SELECT a AS doc_id FROM surv UNION ALL SELECT b FROM surv
    )
),
chars AS (
    SELECT d.doc_id, u.p, substr(t.nt, u.p, 1) AS ch,
           substr(t.nt, u.p - 1, 1) AS pch
    FROM survdocs d JOIN txt t USING (doc_id),
         unnest(generate_series(1, t.nc)) AS u(p)
),
fnds AS (
    SELECT doc_id, min(p) AS fnd FROM chars
    WHERE ch NOT IN {dels} GROUP BY 1
),
-- closed-form self-alignment score (self_scores_batch): per-char
-- match+case, delimiter bonus on qualifying positions, prefix+exact
selfsc AS (
    SELECT c.doc_id,
           {per_char} * max(c.p) + {self_const}
           + {db} * count(*) FILTER (
                 WHERE c.p > 1 AND c.ch NOT IN {dels}
                   AND c.pch IN {dels} AND f.fnd < c.p
             ) AS sc
    FROM chars c JOIN fnds f USING (doc_id)
    GROUP BY c.doc_id
),
-- static per-haystack-position bonus (match + folded case + delimiter)
sbls AS (
    SELECT c.doc_id,
           list(
               {per_char}
               + CASE WHEN c.p > 1 AND c.ch NOT IN {dels}
                       AND c.pch IN {dels} AND f.fnd < c.p
                 THEN {db} ELSE 0 END
               ORDER BY c.p
           ) AS sbl
    FROM chars c JOIN fnds f USING (doc_id)
    GROUP BY c.doc_id
),
swp AS (
    SELECT s.a, s.b, s.ta, s.tb, s.n, s.m, bl.sbl,
           lower(substr(s.tb, 1, 1)) NOT BETWEEN 'a' AND 'z' AS h0na
    FROM surv s JOIN sbls bl ON bl.doc_id = s.b
),
sw(a, b, ta, tb, n, m, sbl, h0na, d, lo1, c1, lo2, h2, best) AS (
    SELECT a, b, ta, tb, n, m, sbl, h0na,
           -1, 0, CAST([] AS STRUCT(h BIGINT, u BOOLEAN, l BOOLEAN)[]),
           0, CAST([] AS BIGINT[]), 0::BIGINT
    FROM swp
    UNION ALL
    SELECT a, b, ta, tb, n, m, sbl, h0na,
           dn,
           lo_n,
           cells,
           lo1,
           list_transform(c1, x -> x.h),
           greatest(best,
                    coalesce(list_max(list_transform(cells, x -> x.h)), 0))
    FROM (
        SELECT z.*,
               list_transform(
                   generate_series(z.lo_n, z.hi_n),
                   q -> {_sw_cell_expr(cfg, scoring)}
               ) AS cells
        FROM (
            SELECT *,
                   d + 1 AS dn,
                   greatest(0, d + 1 - m + 1,
                            CASE WHEN d + 1 - {R} + 1 >= 0
                                 THEN (d + 1 - {R} + 1) // 2 ELSE 0 END) AS lo_n,
                   least(n - 1, d + 1, (d + 1 + {R}) // 2) AS hi_n
            FROM sw
            WHERE d + 1 <= n + m - 2
              AND greatest(0, d + 1 - m + 1,
                           CASE WHEN d + 1 - {R} + 1 >= 0
                                THEN (d + 1 - {R} + 1) // 2 ELSE 0 END)
                  <= least(n - 1, d + 1, (d + 1 + {R}) // 2)
        ) z
    )
),
swsc AS (SELECT a, b, max(best) AS score FROM sw GROUP BY 1, 2),
verified AS (
    SELECT g.a, g.b, 0::BIGINT AS score, CAST(1 AS DOUBLE) AS similarity,
           TRUE AS exact, TRUE AS verified
    FROM gated g JOIN capped c ON c.a = g.a AND c.b = g.b
    WHERE g.is_exact
    UNION ALL
    SELECT g.a, g.b, s.score::BIGINT,
           least(CAST(2 AS DOUBLE) * s.score / (sa.sc + sb.sc),
                 CAST(1 AS DOUBLE)) AS similarity,
           FALSE,
           least(CAST(2 AS DOUBLE) * s.score / (sa.sc + sb.sc),
                 CAST(1 AS DOUBLE)) >= {cfg.sim_threshold}
    FROM surv g
    JOIN swsc s ON s.a = g.a AND s.b = g.b
    JOIN selfsc sa ON sa.doc_id = g.a
    JOIN selfsc sb ON sb.doc_id = g.b
)"""


def sw_verified_pairs_sql(cfg: DedupConfig = DEFAULT_DEDUP) -> str:
    """Full SQL oracle for the gated SW-verified-pairs query — output
    columns (a, b, score, similarity, exact, verified)."""
    tier2 = f" {_short_band_cte(cfg)}," if cfg.short_doc_max_bytes > 0 else ""
    return _materialize(
        f"WITH RECURSIVE {_shingle_cte(cfg)}, {_oph_band_cte(cfg)},{tier2}"
        f"{simhash_cte(cfg)}, {simhash_chunks_cte(cfg)}, {sw_verify_cte(cfg)}\n"
        "SELECT a, b, score, similarity, exact, verified FROM verified "
        "ORDER BY a, b"
    )


def dedup_clusters_sql(cfg: DedupConfig = DEFAULT_DEDUP) -> str:
    """Full SQL oracle for the end-to-end dedup clusters: SW-verified
    edges -> connected components (min-id labeling via recursive reach,
    equal to the large/small-star fixpoint) — output (doc_id, cluster_id)
    for every document."""
    tier2 = f" {_short_band_cte(cfg)}," if cfg.short_doc_max_bytes > 0 else ""
    return _materialize(
        f"WITH RECURSIVE {_shingle_cte(cfg)}, {_oph_band_cte(cfg)},{tier2}"
        f"{simhash_cte(cfg)}, {simhash_chunks_cte(cfg)}, {sw_verify_cte(cfg)},\n"
        """
edges AS (SELECT a, b FROM verified WHERE verified),
ebidir AS (
    SELECT a AS u, b AS v FROM edges
    UNION SELECT b AS u, a AS v FROM edges
),
reach(u, v) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT r.u, d.v FROM reach r JOIN ebidir d ON r.v = d.u
),
clusters AS (SELECT u AS doc_id, min(v) AS cluster_id FROM reach GROUP BY u)
SELECT doc_id, cluster_id FROM clusters ORDER BY doc_id"""
    )


def simhash_pairs_sql(cfg: DedupConfig = DEFAULT_DEDUP) -> str:
    """Full-pipeline SQL oracle for ``simhash_pairs(compute_signatures(
    normalize_text(documents)))`` — output columns (a, b)."""
    return _materialize(f"""WITH {_shingle_cte(cfg)},
{simhash_cte(cfg)},
{simhash_chunks_cte(cfg)},
{_pairs_cte('chunks', 'chunk_id, chunk', cfg).lstrip()}
SELECT DISTINCT p.a, p.b FROM allp p
JOIN simh sa ON sa.doc_id = p.a
JOIN simh sb ON sb.doc_id = p.b
WHERE bit_count(xor(sa.sim, sb.sim)) <= {cfg.hamming_max}
ORDER BY p.a, p.b""")


def tier_attribution_sql(cfg: DedupConfig = DEFAULT_DEDUP) -> str:
    """Full-pipeline SQL oracle for ``candidate_tier_attribution(
    compute_signatures(normalize_text(documents)))`` — output columns
    (a, b, tier).

    All four bucket families (exact text, main LSH bands, tier-2
    short-doc bands, SimHash block-combination chunks) union into one
    bucket table with the family code riding :func:`_pairs_cte`'s
    payload — the same single-pass shape as the Spark operator — then
    one group-by applies the tier-2 multiplicity rule, the SimHash
    Hamming gate, and the priority-min tier label. The exact family
    buckets on ``hash(nt)`` where the Spark side buckets on
    ``xxhash64(norm_text)``+``n_bytes`` — different hash, same
    partition of the corpus (collisions aside, as everywhere here)."""
    fams = [
        "SELECT 0 AS fam, hash(nt)::HUGEINT AS kx, 0::HUGEINT AS ky,"
        " doc_id, 0 AS fl FROM nd",
        "SELECT 1, band_id::HUGEINT, band_key::HUGEINT, doc_id, 1 FROM bkey",
        "SELECT 3, chunk_id::HUGEINT, chunk::HUGEINT, doc_id, 3 FROM chunks",
    ]
    tier2 = ""
    if cfg.short_doc_max_bytes > 0:
        tier2 = f" {_short_band_cte(cfg)},"
        fams.insert(
            2,
            "SELECT 2, band_id::HUGEINT, band_key::HUGEINT, doc_id, 2"
            " FROM skey",
        )
    union = "\n    UNION ALL ".join(fams)
    return _materialize(
        f"WITH {_shingle_cte(cfg)}, {_oph_band_cte(cfg)},{tier2}\n"
        f"{simhash_cte(cfg)},\n{simhash_chunks_cte(cfg)},\n"
        f"tb AS (\n    {union}\n),"
        f"{_pairs_cte('tb', 'fam, kx, ky', cfg, payload='fl')},\n"
        f"""tagg AS (
    SELECT a, b, min(pa) AS best,
           count(*) FILTER (WHERE pa = 2) AS n2,
           max(CASE WHEN pa = 3 THEN 1 ELSE 0 END) AS has3
    FROM allp GROUP BY 1, 2
)
SELECT t.a, t.b,
       CASE WHEN t.best = 0 THEN 'exact'
            WHEN t.best = 1 THEN 'minhash_lsh'
            WHEN t.n2 >= {cfg.short_min_bands} THEN 'minhash_lsh_short'
            ELSE 'simhash' END AS tier
FROM tagg t
JOIN simh sa ON sa.doc_id = t.a
JOIN simh sb ON sb.doc_id = t.b
WHERE t.best <= 1 OR t.n2 >= {cfg.short_min_bands}
   OR (t.has3 = 1 AND bit_count(xor(sa.sim, sb.sim)) <= {cfg.hamming_max})
ORDER BY t.a, t.b"""
    )


def fuzzy_match_sql(
    needle: str,
    limit: int = 100,
    scoring: Scoring = DEFAULT_SCORING,
) -> str:
    """Full SQL oracle for ``fuzzy_match(documents, needle,
    config=MatchConfig(max_typos=None), limit=..., route="auto")`` —
    output columns (doc_id, score, typos, exact).

    Mirrors the auto route exactly: docs up to ``dp_max`` chars run the
    full (unbanded) wavefront DP — the same recursive-CTE wavefront as
    :func:`sw_verify_cte` but with needle-width (<= len(needle)) diagonal
    state and no band clipping — plus the typo traceback
    (oracle.typos_from_score_matrix: start at the first argmax of the
    last needle column, walk preferring diag >= left >= up, count
    left-moves / non-improving diagonal moves, col-0 zero-score
    compensation), run only for docs surviving the top-``limit`` cut.
    Longer docs run the greedy first-match-wins scan as a
    len(needle)-step recursion (greedy.rs semantics; the reference's
    typo count for the greedy path is 0).

    Fixture-scoped simplifications (assert before reuse elsewhere): the
    documents fixture is ASCII and lowercase and starts with a
    non-delimiter, so char length == byte length, the capitalization
    bonus never fires, every match earns the matching-case bonus, and
    "a non-delimiter was seen before position p" reduces to p > 0.
    """
    from ..constants import LENGTH_BUCKETS, SW_MAX_CELLS

    nd = needle.replace("'", "''")
    nlen = len(needle)
    dp_max = min(LENGTH_BUCKETS[-1], SW_MAX_CELLS // max(nlen, 1))
    dels = _delims_sql(scoring)
    per_char = scoring.match_score + scoring.matching_case_bonus
    db = scoring.delimiter_bonus
    cell = _sw_cell_expr(DEFAULT_DEDUP, scoring)
    return _materialize(f"""
WITH RECURSIVE
fdocs AS (SELECT doc_id, text AS tb, length(text) AS m FROM documents),
fdp AS (SELECT doc_id, tb, m FROM fdocs WHERE m <= {dp_max}),
fchars AS (
    SELECT doc_id, u.p, substr(tb, u.p, 1) AS ch, substr(tb, u.p - 1, 1) AS pch
    FROM fdp, unnest(generate_series(1, m)) AS u(p)
),
ffnds AS (
    SELECT doc_id, min(p) AS fnd FROM fchars
    WHERE ch NOT IN {dels} GROUP BY 1
),
fsbls AS (
    SELECT c.doc_id,
           list(
               {per_char}
               + CASE WHEN c.p > 1 AND c.ch NOT IN {dels}
                       AND c.pch IN {dels} AND coalesce(f.fnd, 2147483647) < c.p
                 THEN {db} ELSE 0 END
               ORDER BY c.p
           ) AS sbl
    FROM fchars c LEFT JOIN ffnds f USING (doc_id)
    GROUP BY c.doc_id
),
fswp AS (
    SELECT d.doc_id, '{nd}' AS ta, d.tb, {nlen} AS n, d.m, bl.sbl,
           lower(substr(d.tb, 1, 1)) NOT BETWEEN 'a' AND 'z' AS h0na
    FROM fdp d JOIN fsbls bl ON bl.doc_id = d.doc_id
),
fsw(doc_id, ta, tb, n, m, sbl, h0na, d, lo1, c1, lo2, h2, best) AS (
    SELECT doc_id, ta, tb, n, m, sbl, h0na,
           -1, 0, CAST([] AS STRUCT(h BIGINT, u BOOLEAN, l BOOLEAN)[]),
           0, CAST([] AS BIGINT[]), 0::BIGINT
    FROM fswp
    UNION ALL
    SELECT doc_id, ta, tb, n, m, sbl, h0na,
           dn, lo_n, cells, lo1,
           list_transform(c1, x -> x.h),
           greatest(best,
                    coalesce(list_max(list_transform(cells, x -> x.h)), 0))
    FROM (
        SELECT z.*,
               list_transform(
                   generate_series(z.lo_n, z.hi_n),
                   q -> {cell}
               ) AS cells
        FROM (
            SELECT *, d + 1 AS dn,
                   greatest(0, d + 1 - m + 1) AS lo_n,
                   least(n - 1, d + 1) AS hi_n
            FROM fsw WHERE d + 1 <= n + m - 2
        ) z
    )
),
fdpsc AS (SELECT doc_id, max(best) AS raw FROM fsw GROUP BY 1),
fdpout AS (
    SELECT s.doc_id,
           s.raw + CASE WHEN d.tb = '{nd}'
                   THEN {scoring.exact_match_bonus} ELSE 0 END AS score,
           (d.tb = '{nd}') AS exact
    FROM fdpsc s JOIN fdp d USING (doc_id)
),
fg(doc_id, l, txt, k, h, score, failed) AS (
    SELECT doc_id, m, tb, 0, 0, 0, m < {nlen}
    FROM fdocs WHERE m > {dp_max}
    UNION ALL
    SELECT doc_id, l, txt, k + 1,
           CASE WHEN ok THEN p + 1 ELSE h END,
           CASE WHEN ok THEN
               greatest(score + {scoring.match_score}
                        - CASE WHEN p > h AND k > 0
                               THEN {scoring.gap_open_penalty}
                                    + (p - h - 1) * {scoring.gap_extend_penalty}
                          ELSE 0 END, 0)
               + {scoring.matching_case_bonus}
               + CASE WHEN p = 0 THEN {scoring.prefix_bonus} ELSE 0 END
               + CASE WHEN p > 0 AND substr(txt, p, 1) IN {dels}
                           AND nc NOT IN {dels} THEN {db} ELSE 0 END
           ELSE score END,
           failed OR NOT ok
    FROM (
        SELECT *,
               CASE WHEN pos1 > 0 AND NOT failed THEN true ELSE false END AS ok,
               h + pos1 - 1 AS p
        FROM (
            SELECT *,
                   CASE WHEN win_len > 0 AND NOT failed
                        THEN strpos(substr(txt, h + 1, win_len), nc)
                        ELSE 0 END AS pos1
            FROM (
                SELECT *,
                       substr('{nd}', k + 1, 1) AS nc,
                       (l - {nlen} + k) - h + 1 AS win_len
                FROM fg WHERE k < {nlen}
            )
        )
    )
),
fgout AS (
    SELECT doc_id, CASE WHEN failed THEN 0 ELSE score END AS score,
           false AS exact
    FROM fg WHERE k = {nlen}
),
fall AS (
    SELECT doc_id, score, exact FROM fdpout
    UNION ALL SELECT doc_id, score, exact FROM fgout
),
ftop AS (
    SELECT doc_id, score, exact FROM fall
    ORDER BY score DESC, doc_id LIMIT {limit}
),
fcells AS MATERIALIZED (
    SELECT w.doc_id, w.lo1 + g.k AS i, w.d - (w.lo1 + g.k) AS j,
           w.c1[g.k + 1].h AS h
    FROM fsw w JOIN ftop t USING (doc_id),
         unnest(generate_series(0, len(w.c1) - 1)) AS g(k)
    WHERE w.d >= 0
),
flast AS (SELECT doc_id, j, h FROM fcells WHERE i = {nlen - 1}),
fbest AS (SELECT doc_id, max(h) AS b FROM flast GROUP BY 1),
fseed AS (
    SELECT b.doc_id, {nlen - 1} AS col,
           CASE WHEN b.b > 0 THEN min(l.j) ELSE 0 END AS row,
           b.b AS sc, 0 AS ty
    FROM fbest b LEFT JOIN flast l ON l.doc_id = b.doc_id AND l.h = b.b
    GROUP BY b.doc_id, b.b
),
ftb(doc_id, col, row, sc, ty) AS (
    SELECT doc_id, col, row, sc, ty FROM fseed
    UNION ALL
    SELECT doc_id,
           CASE WHEN row = 0 THEN col - 1
                WHEN dg >= lf AND dg >= up THEN col - 1
                WHEN lf >= up THEN col - 1
                ELSE col END,
           CASE WHEN row = 0 THEN row
                WHEN dg >= lf AND dg >= up THEN row - 1
                WHEN lf >= up THEN row
                ELSE row - 1 END,
           CASE WHEN row = 0 THEN sc
                WHEN dg >= lf AND dg >= up THEN dg
                WHEN lf >= up THEN lf
                ELSE up END,
           ty + CASE WHEN row = 0 THEN 1
                WHEN dg >= lf AND dg >= up THEN
                    CASE WHEN dg >= sc THEN 1 ELSE 0 END
                WHEN lf >= up THEN 1
                ELSE 0 END
    FROM (
        SELECT t.*,
               coalesce(cd.h, 0) AS dg, coalesce(cl.h, 0) AS lf,
               coalesce(cu.h, 0) AS up
        FROM ftb t
        LEFT JOIN fcells cd ON t.row > 0 AND cd.doc_id = t.doc_id
                           AND cd.i = t.col - 1 AND cd.j = t.row - 1
        LEFT JOIN fcells cl ON t.row > 0 AND cl.doc_id = t.doc_id
                           AND cl.i = t.col - 1 AND cl.j = t.row
        LEFT JOIN fcells cu ON t.row > 0 AND cu.doc_id = t.doc_id
                           AND cu.i = t.col AND cu.j = t.row - 1
        WHERE t.col > 0
    )
),
ftypos AS (
    SELECT doc_id, ty + CASE WHEN sc = 0 THEN 1 ELSE 0 END AS typos
    FROM ftb WHERE col = 0
)
SELECT t.doc_id, t.score, coalesce(ty.typos, 0)::BIGINT AS typos, t.exact
FROM ftop t LEFT JOIN ftypos ty USING (doc_id)
ORDER BY t.score DESC, t.doc_id""")
