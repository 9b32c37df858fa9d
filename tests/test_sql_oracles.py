"""Stage-level validation of the pure-SQL signature oracles: the DuckDB
re-derivation of splitmix64 / rolling k-gram hash / OPH / banding /
SimHash must produce bit-identical intermediate values to the numpy
kernel (hashing.compute_signature_arrays) — not just identical final
pair sets (the entry-contract test covers those end-to-end)."""

import re

import duckdb
import numpy as np
import pytest

from frizbee_spark.functions.hashing import compute_signature_arrays
from frizbee_spark.functions.sql_oracles import (
    _oph_band_cte, _shingle_cte, simhash_cte,
)
from frizbee_spark.operators.dedup import DedupConfig

DOCS = [
    (1, "The quick brown fox jumps over the lazy dog near the river bank."),
    (2, "the quick  brown fox JUMPS over the lazy dog near the river bank!"),
    (3, "a completely different document about spark shuffle partitioning"),
    (4, "short doc text"),  # only a couple of shingles after padding range
    (5, "numbers 12345 and punctuation ,.;: mixed with words " * 3),
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", DOCS)
    return con


def _norm(text: str) -> bytes:
    return re.sub(r"\s+", " ", text).strip().lower().encode()


def _kernel(cfg):
    texts = [_norm(t) for _, t in DOCS]
    return compute_signature_arrays(
        texts, cfg.shingle_k, cfg.num_perm, cfg.bands, cfg.band_rows
    )


def test_band_keys_bit_identical(duck):
    cfg = DedupConfig()
    band_np, _ = _kernel(cfg)
    got = duck.execute(
        "WITH " + _shingle_cte(cfg) + "," + _oph_band_cte(cfg)
        + " SELECT doc_id, band_id, band_key FROM bkey ORDER BY 1, 2"
    ).fetchall()
    assert len(got) == len(DOCS) * cfg.bands
    ids = [d for d, _ in DOCS]
    for doc_id, band_id, bk in got:
        want = int(np.int64(band_np[ids.index(doc_id), band_id]).view(np.uint64)
                   if band_np.dtype == np.int64 else band_np[ids.index(doc_id), band_id])
        assert int(bk) == want, (doc_id, band_id)


def test_simhash_bit_identical(duck):
    cfg = DedupConfig()
    _, sim_np = _kernel(cfg)
    sim_u = sim_np.view(np.uint64)
    got = dict(duck.execute(
        "WITH " + _shingle_cte(cfg) + "," + simhash_cte(cfg)
        + " SELECT doc_id, sim FROM simh"
    ).fetchall())
    ids = [d for d, _ in DOCS]
    assert set(got) == set(ids)
    for i, doc_id in enumerate(ids):
        assert int(got[doc_id]) == int(sim_u[i]), doc_id
