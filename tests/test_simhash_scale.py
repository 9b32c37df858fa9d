"""Scale-safety and completeness of the block-combination SimHash
candidate source (r3: replaces the 4x16-bit chunks that birthday-collided
at n >> 65k, VERDICT r2 item 1).

- pigeonhole guarantee: every pair within Hamming <= hamming_max shares
  at least one table key (randomized + adversarial placements);
- chance-pair rate at n = 400k random fingerprints stays ~C(n,2)*T/2^33
  (hundreds), far below 1% of the true candidate volume at that scale;
- the Spark operator equals brute-force Hamming pairs exactly on a real
  corpus (no false negatives AND the exact post-filter).
"""

import numpy as np
import pytest

from frizbee_spark.functions.hashing import splitmix64
from frizbee_spark.operators.dedup import (
    DedupConfig,
    simhash_table_keys_np,
    simhash_table_layout,
)


class TestLayout:
    def test_blocks_partition_64_bits(self):
        for k in (1, 2, 3, 4):
            layout = simhash_table_layout(k)
            m = k + 3
            from math import comb

            assert len(layout) == comb(m, 3)
            # blocks across all tables cover all 64 bits, disjoint per table
            all_blocks = {b for tbl in layout for b in tbl}
            covered = sorted(
                (s, s + w) for s, w in all_blocks
            )
            assert covered[0][0] == 0 and covered[-1][1] == 64
            for (s1, e1), (s2, e2) in zip(covered, covered[1:]):
                assert e1 == s2  # contiguous, non-overlapping block grid
            # key width fits a long
            assert all(sum(w for _, w in tbl) < 63 for tbl in layout)

    @pytest.mark.parametrize("k", [1, 2, 3])
    def test_pigeonhole_guarantee_randomized(self, k):
        rng = np.random.default_rng(7)
        n = 4000
        base = splitmix64(np.arange(n, dtype=np.uint64)).view(np.int64)
        # flip up to k random bits
        flipped = base.view(np.uint64).copy()
        for _ in range(k):
            bits = rng.integers(0, 64, size=n).astype(np.uint64)
            use = rng.random(n) < 0.8  # some pairs flip fewer than k bits
            flipped = np.where(use, flipped ^ (np.uint64(1) << bits), flipped)
        ka = simhash_table_keys_np(base, k)
        kb = simhash_table_keys_np(flipped.view(np.int64), k)
        assert ((ka == kb).any(axis=0)).all(), "a Hamming<=k pair shared no table"

    def test_pigeonhole_adversarial_block_spread(self):
        """Worst case: 3 flipped bits land in 3 distinct blocks — exactly
        3 blocks stay intact, exactly one table must match."""
        layout = simhash_table_layout(3)
        starts = sorted({s for tbl in layout for s, _ in tbl})
        base = np.array([0], dtype=np.int64)
        for trio in [(0, 1, 2), (1, 3, 5), (0, 2, 4), (3, 4, 5)]:
            v = np.uint64(0)
            for b in trio:
                v ^= np.uint64(1) << np.uint64(starts[b])
            other = np.array([v], dtype=np.uint64).view(np.int64)
            ka = simhash_table_keys_np(base, 3)
            kb = simhash_table_keys_np(other, 3)
            hits = int((ka == kb).all(axis=1).sum())
            assert hits == 1, f"trio {trio}: {hits} tables matched, expected 1"

    def test_chance_pair_rate_at_400k(self):
        """186 expected chance candidate pairs from 400k uniform
        fingerprints across all 20 tables — versus >= 160k true candidate
        pairs the synthetic corpus produces at that scale (40% of docs are
        dups), i.e. well under 1% (the r2 'done' criterion)."""
        n = 400_000
        sim = splitmix64(np.arange(n, dtype=np.uint64) ^ np.uint64(0xABCD)).view(np.int64)
        keys = simhash_table_keys_np(sim, 3)
        total = 0
        for t in range(keys.shape[0]):
            _, counts = np.unique(keys[t], return_counts=True)
            total += int((counts * (counts - 1) // 2).sum())
        expected = 20 * n * (n - 1) / 2 / 2**33
        assert total < 2000, f"{total} chance pairs (expected ~{expected:.0f})"
        assert total < 0.01 * 160_000


@pytest.mark.spark
def test_simhash_pairs_equal_bruteforce_hamming(spark):
    """Operator output == ALL pairs with Hamming(simhash) <= k on a real
    corpus slice: the layout guarantee means the bucket prefilter loses
    nothing, and the exact bit_count post-filter admits nothing extra."""
    from itertools import combinations

    from frizbee_spark.operators.dedup import (
        compute_signatures, normalize_text, simhash_pairs, with_doc_id,
    )
    from frizbee_spark.sources.corpus import generate_corpus

    docs_tbl, _, _ = generate_corpus(250)
    docs = with_doc_id(
        normalize_text(spark.createDataFrame(docs_tbl.to_pandas()), "text")
    )
    cfg = DedupConfig()
    sigs = compute_signatures(docs, cfg)
    rows = sigs.select("doc_id", "simhash").collect()
    ids = np.array([r["doc_id"] for r in rows], dtype=np.int64)
    sims = np.array([r["simhash"] for r in rows], dtype=np.int64).view(np.uint64)
    want = set()
    for i, j in combinations(range(len(ids)), 2):
        if ids[i] == ids[j]:
            continue
        if bin(int(sims[i] ^ sims[j])).count("1") <= cfg.hamming_max:
            a, b = sorted((int(ids[i]), int(ids[j])))
            want.add((a, b))
    got = {(r["a"], r["b"]) for r in simhash_pairs(sigs, cfg).collect()}
    assert got == want
    assert len(want) > 10  # the corpus has exact/near dups: non-vacuous
