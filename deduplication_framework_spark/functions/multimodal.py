"""Multimodal columns: images/audio as opaque ``binary`` + typed metadata.

Reference analogs: CLIP embedding extraction (C3,
/root/reference/image/method/pipeline_api.py:357-455), average-RGB fallback
embedding (C4, :458-490), binary spectrogram fingerprint (C5,
/root/reference/audio/method/spectrum_fingerprint.py:11-41), audio pHash
exact dedup (J16, audio/method/pipeline_api.py:448-494), binary-vector
Jaccard dedup (J14, audio/method/pipeline_api.py:580-633).

This container ships no image/audio libs (PIL/librosa/torch), so the DECODE
step is pluggable: real decoders are attempted behind import-try and raise
``NotImplementedError`` when absent; a deterministic FAKE codec (``FAKEIMG``
/ ``FAKEPCM`` byte layouts) keeps the Spark-side plumbing — schemas,
mapInPandas batch shapes, partitioning, downstream dedup — fully real and
tested. A production deployment swaps ``decode_image_bytes`` /
``decode_audio_bytes`` only.
"""

from __future__ import annotations

import struct
from typing import Iterator, Optional, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio
        T.StructField("data", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

# ---------------------------------------------------------------------------
# fake codec (deterministic; the container has no PIL/librosa)
# ---------------------------------------------------------------------------

_FAKEIMG_MAGIC = b"FAKEIMG1"
_FAKEPCM_MAGIC = b"FAKEPCM1"


def encode_fake_image(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → bytes."""
    h, w, c = pixels.shape
    assert c == 3
    return _FAKEIMG_MAGIC + struct.pack("<II", w, h) + pixels.tobytes()


def encode_fake_audio(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 mono samples → bytes."""
    return _FAKEPCM_MAGIC + struct.pack("<I", sample_rate) + samples.astype(
        "<i2"
    ).tobytes()


def decode_image_bytes(data: bytes) -> np.ndarray:
    """→ (h, w, 3) uint8. Fake codec decoded natively; real formats need PIL
    (not in this image → NotImplementedError)."""
    if data[:8] == _FAKEIMG_MAGIC:
        w, h = struct.unpack("<II", data[8:16])
        return np.frombuffer(data[16 : 16 + w * h * 3], dtype=np.uint8).reshape(
            h, w, 3
        )
    try:  # pragma: no cover - PIL absent in CI image
        import io

        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    except ImportError as exc:
        raise NotImplementedError(
            "real image decoding requires PIL — not available in this image"
        ) from exc


def decode_audio_bytes(data: bytes) -> Tuple[np.ndarray, int]:
    """→ (float32 samples in [-1, 1], sample_rate)."""
    if data[:8] == _FAKEPCM_MAGIC:
        (sr,) = struct.unpack("<I", data[8:12])
        samples = np.frombuffer(data[12:], dtype="<i2").astype(np.float32) / 32768.0
        return samples, sr
    raise NotImplementedError(
        "real audio decoding requires librosa/soundfile — not in this image"
    )


# ---------------------------------------------------------------------------
# image ops (mapInPandas — Arrow batches of binary payloads)
# ---------------------------------------------------------------------------


def image_stats(media: DataFrame) -> DataFrame:
    """Decode + per-image stats: the C4 average-RGB fallback embedding
    (mean + std per channel = 6 dims, reference pipeline_api.py:458-490,
    computed at the reference's 64x64 resize scale)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                px = decode_image_bytes(bytes(data))
                small = _resize_nn(px, 64, 64).astype(np.float64) / 255.0
                emb = np.concatenate([small.mean(axis=(0, 1)), small.std(axis=(0, 1))])
                out.append(
                    {
                        "media_id": int(mid),
                        "width": px.shape[1],
                        "height": px.shape[0],
                        "embedding": [float(x) for x in emb],
                    }
                )
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "image").mapInPandas(
        op,
        schema="media_id long, width int, height int, embedding array<double>",
    )


def _resize_nn(px: np.ndarray, w: int, h: int) -> np.ndarray:
    """Nearest-neighbor resize — pure numpy (reference uses PIL/cv2; the
    arithmetic here is deterministic and library-free)."""
    ys = (np.arange(h) * px.shape[0] / h).astype(int)
    xs = (np.arange(w) * px.shape[1] / w).astype(int)
    return px[ys][:, xs]


def resize_images(media: DataFrame, w: int, h: int) -> DataFrame:
    """Decode → resize → re-encode (fake codec), keeping payloads binary."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                px = decode_image_bytes(bytes(data))
                rows.append(
                    {
                        "media_id": int(mid),
                        "data": encode_fake_image(_resize_nn(px, w, h)),
                    }
                )
            yield pd.DataFrame(rows)

    return media.filter(F.col("kind") == "image").mapInPandas(
        op, schema="media_id long, data binary"
    )


# ---------------------------------------------------------------------------
# audio ops
# ---------------------------------------------------------------------------

_FP_BINS = 4096


def audio_fingerprints(media: DataFrame) -> DataFrame:
    """C5 analog: per-clip binary fingerprint as array of ACTIVE BIN INDICES
    (the reference flattens a thresholded 32x128 spectrogram to a 4096-dim
    0/1 vector — spectrum_fingerprint.py:11-41; active-index form feeds the
    set-based LSH machinery directly). Librosa is stubbed: the energy
    matrix is a deterministic windowed-RMS grid over the PCM."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                samples, sr = decode_audio_bytes(bytes(data))
                grid = _rms_grid(samples, 32, 128)
                thresh = np.median(grid)  # Otsu stand-in, deterministic
                active = np.nonzero((grid > thresh).ravel())[0]
                rows.append(
                    {
                        "media_id": int(mid),
                        "fp_indices": [int(i) for i in active],
                    }
                )
            yield pd.DataFrame(rows)

    return media.filter(F.col("kind") == "audio").mapInPandas(
        op, schema="media_id long, fp_indices array<long>"
    )


def _rms_grid(samples: np.ndarray, rows: int, cols: int) -> np.ndarray:
    n = rows * cols
    if samples.size < n:
        samples = np.pad(samples, (0, n - samples.size))
    cut = samples[: samples.size // n * n]
    return np.sqrt(
        (cut.reshape(n, -1) ** 2).mean(axis=1)
    ).reshape(rows, cols)


def audio_near_dup_edges(
    fingerprints: DataFrame,
    threshold: float = 0.8,
    num_perm: int = 200,
    bucket_cap: int = 2000,
) -> DataFrame:
    """J7-J9/J14: binary-fingerprint near-dup via the SAME MinHash+banding
    machinery as text — active-index sets are just another feature universe.
    (b, r) from the reference's own parameter rule (b*r = num_perm,
    audio_dedup_main.py:35-62 → (20, 10) at 200/0.8)."""
    from deduplication_framework_spark.functions import kernels as K
    from deduplication_framework_spark.operators.lsh import (
        candidate_pairs,
        minhash_bands,
    )
    from deduplication_framework_spark.operators.verify import verify_jaccard
    from pyspark.sql.pandas.functions import pandas_udf

    b, r = K.lsh_param_search(num_perm, threshold)
    perms = K.minhash_permutations(num_perm)

    @pandas_udf(T.ArrayType(T.LongType()))
    def sig_udf(idx_lists: pd.Series) -> pd.Series:
        out = []
        for idxs in idx_lists:
            if idxs is None:
                idxs = []
            feats = [struct.pack("<q", int(i)) for i in idxs]
            out.append(K.minhash_signature(feats, perms).astype(np.int64).tolist())
        return pd.Series(out)

    sigs = fingerprints.select(
        F.col("media_id").alias("doc_id"), sig_udf("fp_indices").alias("sig")
    )
    bands = minhash_bands(sigs, b, r)
    pairs, _ = candidate_pairs(bands, bucket_cap=bucket_cap,
                               collision_threshold=2)
    feats = fingerprints.select(
        F.col("media_id").alias("doc_id"), F.col("fp_indices").alias("shingles")
    )
    return verify_jaccard(pairs, feats, threshold)


def phash_exact_dedup(media: DataFrame) -> Tuple[DataFrame, DataFrame]:
    """J16: exact perceptual-hash dedup = hash of the decoded fingerprint
    grid, groupBy + first-seen keeper (same shape as text P7)."""
    from deduplication_framework_spark.operators.exact import exact_dedup

    fps = audio_fingerprints(media).withColumn(
        "phash", F.xxhash64(F.col("fp_indices").cast("string"))
    )
    docs = fps.select(F.col("media_id").alias("doc_id"), F.col("phash").alias("text"))
    return exact_dedup(docs, text_col="text")
