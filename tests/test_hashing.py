"""Property tests for the vectorized hashing kernels.

Mirrors the reference's differential-testing pattern (scalar oracle vs
vectorized implementation, /root/reference/src/smith_waterman/reference/
algorithm.rs:124-135): the rolling k-gram hash is checked against a direct
per-window polynomial evaluation, MinHash against exact Jaccard, winnowing
against its published shared-substring guarantee.
"""

import numpy as np
import pytest

from frizbee_spark.functions import hashing as H


def _shingles_of(texts, k):
    buf, starts = H.concat_docs(texts, min_len=k)
    return H.char_shingle_hashes(buf, starts, k)


class TestRollingHash:
    def test_matches_direct_evaluation(self):
        rng = np.random.default_rng(7)
        texts = [bytes(rng.integers(32, 127, size=n, dtype=np.uint8).tolist())
                 for n in (12, 13, 40, 200)]
        k = 12
        sh, sst = _shingles_of(texts, k)
        pows = np.array([pow(0x100000001B3, t, 1 << 64) for t in range(k)], dtype=np.uint64)
        for d, t in enumerate(texts):
            arr = np.frombuffer(t, dtype=np.uint8)
            for i in range(len(t) - k + 1):
                w = arr[i : i + k].astype(np.uint64)
                with np.errstate(over="ignore"):
                    expect = H.splitmix64(np.uint64(int((w * pows).sum(dtype=np.uint64))))
                assert sh[sst[d] + i] == expect, (d, i)

    def test_same_substring_same_hash_across_docs(self):
        a = b"prefix AAA the-shared-substring-block ZZZ suffix"
        b = b"completely different lead-in the-shared-substring-block tail"
        sh, sst = _shingles_of([a, b], 12)
        sa = set(sh[sst[0] : sst[1]].tolist())
        sb = set(sh[sst[1] : sst[2]].tolist())
        # shared 28-byte run (block + flanking spaces) -> 28-12+1 = 17
        assert len(sa & sb) >= 17

    def test_short_doc_padding(self):
        sh, sst = _shingles_of([b"ab", b""], 12)
        assert np.diff(sst).tolist() == [1, 1]

    def test_empty_batch(self):
        sh, sst = _shingles_of([], 12)
        assert sh.size == 0 and sst.tolist() == [0]


class TestMinHash:
    def test_estimates_jaccard(self):
        rng = np.random.default_rng(11)
        base = bytes(rng.integers(97, 123, size=4000, dtype=np.uint8).tolist())
        # mutate 5% of bytes -> high but sub-1 jaccard
        arr = np.frombuffer(base, dtype=np.uint8).copy()
        idx = rng.choice(arr.size, size=arr.size // 20, replace=False)
        arr[idx] = rng.integers(97, 123, size=idx.size, dtype=np.uint8)
        texts = [base, arr.tobytes()]
        sh, sst = _shingles_of(texts, 12)
        true_j = H.jaccard_from_shingles(sh, sst, 0, 1)
        sig = H.minhash_signatures(sh, sst, 256)
        est = float((sig[0] == sig[1]).mean())
        assert abs(est - true_j) < 0.12  # 256 perms -> se ~ 0.03
        assert 0.2 < true_j < 0.9

    def test_identical_docs_identical_signatures(self):
        sh, sst = _shingles_of([b"hello world " * 50] * 2, 12)
        sig = H.minhash_signatures(sh, sst, 64)
        assert (sig[0] == sig[1]).all()

    def test_determinism_across_batching(self):
        texts = [b"alpha beta gamma " * 30, b"zeta eta theta " * 40]
        sh, sst = _shingles_of(texts, 12)
        both = H.minhash_signatures(sh, sst, 64)
        for d, t in enumerate(texts):
            sh1, sst1 = _shingles_of([t], 12)
            solo = H.minhash_signatures(sh1, sst1, 64)
            assert (both[d] == solo[0]).all()


class TestBandHashes:
    def test_equal_rows_equal_band(self):
        sig = np.arange(256, dtype=np.uint64).reshape(2, 128).copy()
        sig[1] = sig[0]
        bh = H.band_hashes(sig, 32, 4)
        assert (bh[0] == bh[1]).all()

    def test_band_isolation(self):
        # changing one signature column changes exactly one band key
        sig = np.arange(128, dtype=np.uint64).reshape(1, 128)
        sig2 = sig.copy()
        sig2[0, 5] ^= np.uint64(1)  # band 1 under rows=4
        b1, b2 = H.band_hashes(sig, 32, 4)[0], H.band_hashes(sig2, 32, 4)[0]
        assert (b1 != b2).sum() == 1 and b1[1] != b2[1]

    def test_rejects_oversized_layout(self):
        with pytest.raises(ValueError):
            H.band_hashes(np.zeros((1, 128), dtype=np.uint64), 33, 4)


class TestSimHash:
    def test_near_docs_low_hamming(self):
        rng = np.random.default_rng(3)
        base = bytes(rng.integers(97, 123, size=5000, dtype=np.uint8).tolist())
        arr = np.frombuffer(base, dtype=np.uint8).copy()
        idx = rng.choice(arr.size, size=25, replace=False)
        arr[idx] = rng.integers(97, 123, size=25, dtype=np.uint8)
        other = bytes(rng.integers(97, 123, size=5000, dtype=np.uint8).tolist())
        sh, sst = _shingles_of([base, arr.tobytes(), other], 12)
        sim = H.simhash64(sh, sst)
        ham = lambda a, b: bin((int(a) ^ int(b)) & (2**64 - 1)).count("1")
        assert ham(sim[0], sim[1]) <= 8
        assert ham(sim[0], sim[2]) >= 20


class TestWinnowing:
    def test_shared_span_guarantee(self):
        """Docs sharing a long span share >= 1 fingerprint (winnowing
        guarantee: any common run of >= window + k - 1 bytes)."""
        rng = np.random.default_rng(5)
        span = bytes(rng.integers(97, 123, size=2000, dtype=np.uint8).tolist())
        mk = lambda: bytes(rng.integers(97, 123, size=1500, dtype=np.uint8).tolist())
        a, b = mk() + span + mk(), mk() + span + mk()
        c = mk() + mk()
        k, w = 48, 64
        sh, sst = _shingles_of([a, b, c], k)
        fp, pos, fst = H.winnow_fingerprints(sh, sst, window=w)
        fa = set(fp[fst[0] : fst[1]].tolist())
        fb = set(fp[fst[1] : fst[2]].tolist())
        fc = set(fp[fst[2] : fst[3]].tolist())
        assert len(fa & fb) >= 2
        assert not (fa & fc)

    def test_fingerprint_density(self):
        # winnowing emits ~2/(w+1) of positions, not every position
        rng = np.random.default_rng(9)
        t = bytes(rng.integers(97, 123, size=20000, dtype=np.uint8).tolist())
        sh, sst = _shingles_of([t], 12)
        fp, pos, fst = H.winnow_fingerprints(sh, sst, window=64)
        assert fp.size < sh.size * 0.08


class TestDocHash:
    def test_hash64_bytes(self):
        assert H.hash64_bytes(b"abc") == H.hash64_bytes(b"abc")
        assert H.hash64_bytes(b"abc") != H.hash64_bytes(b"abd")
        assert H.hash64_bytes(b"") != H.hash64_bytes(b"\x00")


class TestBatchKernels:
    def test_hash64_batch_matches_scalar(self):
        import numpy as np
        from frizbee_spark.functions.hashing import hash64_batch, hash64_bytes

        rng = np.random.default_rng(5)
        blobs = [bytes(rng.integers(0, 256, size=int(n), dtype=np.uint8))
                 for n in [0, 1, 7, 100, 5000, 0, 3]]
        out = hash64_batch(blobs)
        for k, b in enumerate(blobs):
            assert int(out[k]) == hash64_bytes(b)

    def test_hash64_batch_chunking(self):
        import numpy as np
        from frizbee_spark.functions import hashing
        from frizbee_spark.functions.hashing import hash64_batch, hash64_bytes

        rng = np.random.default_rng(6)
        blobs = [bytes(rng.integers(0, 256, size=4000, dtype=np.uint8))
                 for _ in range(200)]  # > _SHINGLE_CHUNK total -> multi-chunk
        assert sum(map(len, blobs)) > hashing._SHINGLE_CHUNK
        out = hash64_batch(blobs)
        for k in (0, 99, 199):
            assert int(out[k]) == hash64_bytes(blobs[k])

    def test_byte_entropy_batch(self):
        import math
        import numpy as np
        from frizbee_spark.functions.hashing import byte_entropy_batch

        out = byte_entropy_batch([b"", b"aaaa", b"ab", b"abcd" * 4])
        assert out[0] == 0.0 and out[1] == 0.0
        assert abs(out[2] - 1.0) < 1e-12
        assert abs(out[3] - 2.0) < 1e-12
        rng = np.random.default_rng(7)
        b = bytes(rng.integers(0, 256, size=8192, dtype=np.uint8))
        counts = np.bincount(np.frombuffer(b, dtype=np.uint8), minlength=256)
        p = counts[counts > 0] / len(b)
        assert abs(byte_entropy_batch([b])[0] - float(-(p * np.log2(p)).sum())) < 1e-9


class TestFusedSignatures:
    def test_fused_equals_unfused(self):
        import numpy as np
        from frizbee_spark.functions.hashing import (
            band_hashes, char_shingle_hashes, compute_signature_arrays,
            concat_docs, minhash_signatures, simhash64,
        )

        rng = np.random.default_rng(9)
        texts = [bytes(rng.integers(97, 123, size=int(n), dtype=np.uint8))
                 for n in [5, 12, 200, 5000, 70000, 999, 12, 64]]
        k, P, B, R = 12, 128, 32, 4
        bnd_f, sim_f = compute_signature_arrays(texts, k, P, B, R)
        buf, starts = concat_docs(texts, min_len=k)
        sh, sst = char_shingle_hashes(buf, starts, k)
        bnd_u = band_hashes(minhash_signatures(sh, sst, P), B, R)
        sim_u = simhash64(sh, sst)
        assert (bnd_f == bnd_u).all()
        assert (sim_f == sim_u).all()

    def test_fused_empty(self):
        from frizbee_spark.functions.hashing import compute_signature_arrays

        bnd, sim = compute_signature_arrays([], 12, 128, 32, 4)
        assert bnd.shape == (0, 32) and sim.shape == (0,)

    def test_short_tier_equals_standalone_banding(self):
        """The tier-2 band keys from the fused kernel must equal
        band_hashes over the standalone signature — and differ from the
        main tier (independent seed => disjoint key space)."""
        import numpy as np
        from frizbee_spark.functions.hashing import (
            band_hashes, char_shingle_hashes, compute_signature_arrays,
            concat_docs, minhash_signatures,
        )
        from frizbee_spark.operators.dedup import SHORT_BAND_SEED

        rng = np.random.default_rng(11)
        texts = [bytes(rng.integers(97, 123, size=int(n), dtype=np.uint8))
                 for n in [30, 188, 320, 5000, 12]]
        k, P = 12, 128
        bnd, sim, bnd2 = compute_signature_arrays(
            texts, k, P, 32, 4, short_tier=(64, 2, SHORT_BAND_SEED))
        buf, starts = concat_docs(texts, min_len=k)
        sh, sst = char_shingle_hashes(buf, starts, k)
        sig = minhash_signatures(sh, sst, P)
        assert (bnd2 == band_hashes(sig, 64, 2, seed=SHORT_BAND_SEED)).all()
        assert bnd2.shape == (len(texts), 64)
        # no cross-tier key collisions for the same docs
        assert not np.isin(bnd2, bnd).any()

        # empty-input shape contract with the tier enabled
        e1, e2, e3 = compute_signature_arrays(
            [], k, P, 32, 4, short_tier=(64, 2, SHORT_BAND_SEED))
        assert e1.shape == (0, 32) and e3.shape == (0, 64)
