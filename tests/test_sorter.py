"""Sorter classification (S2-S8) — fixture F4: expected labels hand-derived
from the reference decision rules (/root/reference/sorter.py:207-335), one
vector per branch. `strict` = the production demotion (sorter.py:314-317)."""

import pytest
from pyspark.sql import functions as F

from deduplication_framework_spark.functions import sorter as S

PNG = b"\x89PNG\r\n\x1a\n" + b"\x00" * 32
GIF = b"GIF89a" + b"\x00" * 16
WAV = b"RIFF\x24\x00\x00\x00WAVE" + b"\x00" * 16
MP3 = b"ID3\x03\x00" + b"\xff" * 16
FLAC = b"fLaC\x00" + b"\xff" * 8
BIN = bytes(range(256)) * 4  # mostly non-printable
TXT = b"hello world, this is ordinary printable prose." * 4

# (name, content, expected_strict, expected_nonstrict)
VECTORS = [
    # strict-extension short-circuit (even with misleading content)
    ("a.png", PNG, "image", "image"),
    ("lie.jpg", b'{"text": "x"}', "image", "image"),
    ("a.wav", WAV, "audio", "audio"),
    # magic within non-strict ext → demoted under strict
    ("a.gif", GIF, "unknown", "image"),
    ("a.mp3", MP3, "unknown", "audio"),
    ("a.flac", FLAC, "unknown", "audio"),
    # json payload classification
    ("a.json", b'{"text": "hi"}', "text", "text"),
    ("a.json", b'{"title": "hi"}', "text", "text"),
    ("a.json", b'{"image": "x.png"}', "unknown", "image"),
    ("a.json", b'{"audio_path": "x.wav"}', "unknown", "audio"),
    ("a.json", b'{"url": "http://x/y.jpg"}', "unknown", "image"),
    ("a.json", b'{"meta": 1}', "text", "text"),
    ("a.json", b'[{"audio": "x"}, {"audio": "y"}, "hi"]', "unknown", "audio"),
    ("a.json", b'[1, 2, 3]', "text", "text"),
    ("a.json", b'"just a string"', "text", "text"),
    ("a.json", b"not json at all", "text", "text"),
    ("a.json", BIN, "unknown", "unknown"),
    # image ext, json content → reclassified by payload
    ("a.bmp", b'{"text": "x"}', "text", "text"),
    ("a.bmp", b"plainbytes" * 40, "unknown", "image"),  # no magic → ext wins
    # audio ext branches
    ("a.wma", BIN, "unknown", "audio"),  # non-printable → audio
    ("a.mp3", b'{"audio": "u.wav"}', "unknown", "audio"),  # magic text → json
    ("a.ogg", TXT, "text", "text"),  # printable, json fails → text
    # text exts: printable wins without json sniff
    ("a.txt", TXT, "text", "text"),
    ("a.csv", b'{"image": "u.png"}', "text", "text"),
    ("a.txt", BIN, "text", "text"),  # json fails → text fallback
    # unknown extension
    ("a.xyz", TXT, "text", "text"),
    ("a.xyz", b'{"picture": "u"}', "unknown", "image"),  # magic text → json
    ("a.xyz", BIN, "unknown", "unknown"),
    ("a.xyz", b"", "unknown", "unknown"),
    ("a.xyz", PNG, "unknown", "image"),
    ("drawing.ext2", b"<svg xmlns='x'>", "unknown", "image"),
    ("a.xyz", None, "error", "error"),
]


class TestKernel:
    @pytest.mark.parametrize("name,content,strict_label,loose_label", VECTORS)
    def test_vector(self, name, content, strict_label, loose_label):
        assert S.classify(name, content, strict=True) == strict_label
        assert S.classify(name, content, strict=False) == loose_label

    def test_printable_threshold(self):
        assert S.is_mostly_printable(b"abcdef")
        assert not S.is_mostly_printable(bytes([0, 1, 2, 3] * 10))
        assert not S.is_mostly_printable(b"")


class TestSparkSurface:
    def test_udf_matches_kernel(self, spark):
        rows = [(i, n, c) for i, (n, c, *_) in enumerate(VECTORS)]
        df = spark.createDataFrame(rows, "i int, name string, content binary")
        udf = S.make_classify_udf(strict=True)
        got = {
            r.i: r.cat
            for r in df.withColumn("cat", udf("name", "content")).collect()
        }
        for i, (name, content, strict_label, _) in enumerate(VECTORS):
            assert got[i] == strict_label, name

    def test_sniff_magic_col(self, spark):
        rows = [
            ("png", PNG, "image"),
            ("gif", GIF, "image"),
            ("wav", WAV, "audio"),
            ("mp3", MP3, "audio"),
            ("flac", FLAC, "audio"),
            ("svg", b"  <SVG >", "image"),
            ("json", b'   {"a": 1}', "text"),
            ("arr", b"[1,2]", "text"),
            ("none", TXT, None),
        ]
        df = spark.createDataFrame(
            [(n, c) for n, c, _ in rows], "name string, content binary"
        )
        got = {
            r.name: r.magic
            for r in df.withColumn(
                "magic", S.sniff_magic_col(F.col("content"))
            ).collect()
        }
        for n, _, expect in rows:
            assert got[n] == expect, n

    def test_category_rollup(self, spark):
        df = spark.createDataFrame(
            [("a.png", PNG), ("b.png", PNG), ("c.wav", WAV), ("d.txt", TXT)],
            "name string, content binary",
        )
        udf = S.make_classify_udf()
        classified = df.select(
            "name",
            udf("name", "content").alias("category"),
            F.length("content").alias("size_bytes"),
        )
        got = {r.category: (r.n_files, r.total_bytes)
               for r in S.category_rollup(classified).collect()}
        assert got["image"][0] == 2
        assert got["audio"][0] == 1
        assert got["text"][0] == 1
