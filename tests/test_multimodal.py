"""Multimodal plumbing: fake codec, mapInPandas batch shapes, audio
fingerprint dedup reusing the MinHash machinery."""

import numpy as np
import pytest

from deduplication_framework_spark.functions import multimodal as M


def _fake_image(seed, w=32, h=24):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, (h, w, 3), dtype=np.uint8)


def _fake_clip(seed, n=65536, noise=0.0):
    rng = np.random.RandomState(seed)
    t = np.arange(n)
    sig = (
        8000 * np.sin(2 * np.pi * t * (220 + 30 * (seed % 5)) / 16000)
        + 3000 * np.sin(2 * np.pi * t * 7 / 16000)
    )
    if noise:
        sig = sig + noise * 32768 * rng.randn(n)
    return np.clip(sig, -32000, 32000).astype(np.int16)


@pytest.fixture(scope="module")
def media(spark):
    rows = []
    for i in range(6):
        px = _fake_image(i)
        rows.append((i, "image", bytearray(M.encode_fake_image(px)), (px.shape[1], px.shape[0], None)))
    # audio: 10,11 same base signal (11 with tiny noise) → near-dups;
    # 12 identical copy of 10 → exact; 13-15 different frequencies
    rows.append((10, "audio", bytearray(M.encode_fake_audio(_fake_clip(0))), (None, None, 16000)))
    rows.append((11, "audio", bytearray(M.encode_fake_audio(_fake_clip(0, noise=0.0005))), (None, None, 16000)))
    rows.append((12, "audio", bytearray(M.encode_fake_audio(_fake_clip(0))), (None, None, 16000)))
    for i, s in enumerate((1, 2, 3)):
        rows.append((13 + i, "audio", bytearray(M.encode_fake_audio(_fake_clip(s))), (None, None, 16000)))
    return spark.createDataFrame(rows, M.MEDIA_SCHEMA)


class TestCodec:
    def test_image_roundtrip(self):
        px = _fake_image(42)
        assert np.array_equal(M.decode_image_bytes(M.encode_fake_image(px)), px)

    def test_audio_roundtrip(self):
        clip = _fake_clip(1, n=1000)
        samples, sr = M.decode_audio_bytes(M.encode_fake_audio(clip, 22050))
        assert sr == 22050
        assert np.allclose(samples * 32768.0, clip, atol=1.0)

    def test_unknown_format_raises(self):
        with pytest.raises(NotImplementedError):
            M.decode_image_bytes(b"\x89PNG\r\n\x1a\nxxxx")
        with pytest.raises(NotImplementedError):
            M.decode_audio_bytes(b"RIFF....WAVE")


class TestImageOps:
    def test_stats_shape_and_determinism(self, spark, media):
        rows = {r.media_id: r for r in M.image_stats(media).collect()}
        assert set(rows) == set(range(6))
        for r in rows.values():
            assert r.width == 32 and r.height == 24
            assert len(r.embedding) == 6
            assert all(0.0 <= v <= 1.0 for v in r.embedding)
        # deterministic across runs
        again = {r.media_id: r.embedding for r in M.image_stats(media).collect()}
        assert all(again[k] == rows[k].embedding for k in rows)

    def test_resize(self, spark, media):
        out = {r.media_id: bytes(r.data) for r in M.resize_images(media, 8, 8).collect()}
        for i in range(6):
            px = M.decode_image_bytes(out[i])
            assert px.shape == (8, 8, 3)
            expect = M._resize_nn(_fake_image(i), 8, 8)
            assert np.array_equal(px, expect)


class TestAudioDedup:
    def test_fingerprints_deterministic(self, spark, media):
        a = {r.media_id: tuple(r.fp_indices) for r in M.audio_fingerprints(media).collect()}
        b = {r.media_id: tuple(r.fp_indices) for r in M.audio_fingerprints(media).collect()}
        assert a == b
        assert set(a) == {10, 11, 12, 13, 14, 15}
        assert a[10] == a[12]  # identical clips → identical fingerprints

    def test_near_dup_edges(self, spark, media):
        fps = M.audio_fingerprints(media)
        edges = {
            (r.src, r.dst)
            for r in M.audio_near_dup_edges(fps, threshold=0.8).collect()
        }
        assert (10, 12) in edges  # exact copy
        assert (10, 11) in edges and (11, 12) in edges  # near-dup
        for e in edges:
            assert set(e) <= {10, 11, 12}, f"false edge {e}"

    def test_phash_exact(self, spark, media):
        keep, edges = M.phash_exact_dedup(media)
        got = {(r.src, r.dst) for r in edges.collect()}
        assert got == {(10, 12)}
        assert {r.doc_id for r in keep.collect()} == {10, 11, 13, 14, 15}
