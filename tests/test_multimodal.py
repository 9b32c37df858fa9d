"""Multimodal plumbing tests: the decode is stubbed (no PIL/ffmpeg in the
container) but sniffing, batching, schema, and fan-out are real."""

import pytest
from pyspark.sql import functions as F

from frizbee_spark.operators.multimodal import (
    decode_media,
    media_stats,
    sample_frames,
    sniff_media_type,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, b"\x89PNG\r\n\x1a\n" + b"\x00" * 100),
        (2, b"\xff\xd8\xff\xe0" + b"\x11" * 5000),
        (3, b"RIFF\x24\x00\x00\x00WAVE" + b"\x22" * 9000),
        (4, b"plain text bytes, no magic"),
        (5, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, media binary")


@pytest.mark.spark
class TestMultimodal:
    def test_sniff(self, media):
        got = {r["doc_id"]: r["media_type"] for r in sniff_media_type(media).collect()}
        assert got[1] == "image/png"
        assert got[2] == "image/jpeg"
        assert got[3] == "audio/wav"
        assert got[4] == "application/octet-stream"

    def test_media_stats(self, media):
        got = {r["doc_id"]: r for r in media_stats(media).collect()}
        assert got[1]["n_bytes"] == 108
        assert got[5]["n_bytes"] == 0
        # constant-byte payload -> near-zero entropy; header adds a little
        assert got[2]["entropy"] < 0.1
        assert got[2]["content_hash"] != got[3]["content_hash"]

    def test_decode_requires_stub_optin(self, media):
        try:
            import PIL  # noqa: F401
            pytest.skip("PIL unexpectedly present")
        except ImportError:
            pass
        with pytest.raises(NotImplementedError):
            decode_media(media).collect()

    def test_decode_stub_deterministic(self, media):
        a = sorted(map(tuple, decode_media(media, allow_stub=True).collect()))
        b = sorted(map(tuple, decode_media(media, allow_stub=True).collect()))
        assert a == b
        for row in a:
            assert row[-1] == "stub"  # decoder column marks the fake

    def test_sample_frames_fanout(self, media):
        got = sample_frames(media, every_n_bytes=1000, max_frames=4).collect()
        by_doc = {}
        for r in got:
            by_doc.setdefault(r["doc_id"], []).append(r)
        assert len(by_doc[2]) == 4  # 5000 bytes / 1000 capped at 4
        assert len(by_doc[1]) == 1  # small payload -> 1 frame
        offsets = sorted(r["frame_offset"] for r in by_doc[3])
        assert offsets == [0, 1000, 2000, 3000]
        assert all(len(r["frame"]) <= 64 for r in got)
