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


def _shingle_cte(cfg: DedupConfig) -> str:
    """normalize + rolling k-gram polynomial hash + splitmix64 finalize.

    The numpy kernel computes the k-gram hash as a prefix-sum difference
    rescaled to the window origin, which equals the direct polynomial
    ``sum(byte[j] * BASE^j)`` mod 2^64 — expressed directly here.
    """
    k = cfg.shingle_k
    pows = [pow(_BASE, j, _M) for j in range(k)]
    terms = " + ".join(
        f"ascii(substr(nt, i + {j}, 1))::HUGEINT * {pows[j]}" for j in range(k)
    )
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


def _pairs_cte(bucket_cte: str, key_cols: str, cfg: DedupConfig) -> str:
    """Bucket -> candidate pairs, mirroring pairs_from_buckets: all pairs
    for buckets of size <= dense_cap, chain + star-from-first edges for
    bigger buckets (connectivity-preserving linear edge count)."""
    return f"""
szd AS (
    SELECT {key_cols}, doc_id,
           count(*) OVER (PARTITION BY {key_cols}) AS n
    FROM {bucket_cte}
),
dense AS (
    SELECT x.doc_id AS a, y.doc_id AS b
    FROM szd x JOIN szd y USING ({key_cols})
    WHERE x.n <= {cfg.dense_cap} AND x.doc_id < y.doc_id
),
big AS (
    SELECT doc_id,
           row_number() OVER w AS rn,
           lead(doc_id) OVER w AS nxt,
           first_value(doc_id) OVER w AS fst
    FROM szd WHERE n > {cfg.dense_cap}
    WINDOW w AS (PARTITION BY {key_cols} ORDER BY doc_id)
),
allp AS (
    SELECT a, b FROM dense
    UNION ALL SELECT doc_id AS a, nxt AS b FROM big WHERE nxt IS NOT NULL
    UNION ALL SELECT fst AS a, doc_id AS b FROM big WHERE rn >= 3
)"""


def minhash_lsh_sql(cfg: DedupConfig = DEFAULT_DEDUP) -> str:
    """Full-pipeline SQL oracle for ``lsh_band_pairs(compute_signatures(
    normalize_text(documents)))`` — output columns (a, b)."""
    return (f"WITH {_shingle_cte(cfg)}, {_oph_band_cte(cfg)}, "
            + _pairs_cte("bkey", "band_id, band_key", cfg)
            + "\nSELECT DISTINCT a, b FROM allp ORDER BY a, b")


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


def simhash_pairs_sql(cfg: DedupConfig = DEFAULT_DEDUP) -> str:
    """Full-pipeline SQL oracle for ``simhash_pairs(compute_signatures(
    normalize_text(documents)))`` — output columns (a, b)."""
    return f"""WITH {_shingle_cte(cfg)},
{simhash_cte(cfg)},
chunks AS (
    SELECT doc_id, i AS chunk_id, ((sim >> (16 * i)) & 65535) AS chunk
    FROM simh, unnest(generate_series(0, 3)) AS t(i)
),
{_pairs_cte('chunks', 'chunk_id, chunk', cfg).lstrip()}
SELECT DISTINCT p.a, p.b FROM allp p
JOIN simh sa ON sa.doc_id = p.a
JOIN simh sb ON sb.doc_id = p.b
WHERE bit_count(xor(sa.sim, sb.sim)) <= {cfg.hamming_max}
ORDER BY p.a, p.b"""
