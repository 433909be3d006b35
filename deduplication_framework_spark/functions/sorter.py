"""Stage-1 sorter: modality classification of a mixed file swamp
(SURVEY.md S2-S8; reference /root/reference/sorter.py:104-335).

The reference walks a filesystem; here the swamp is a DataFrame
``(name: string, content: binary)`` and classification is one Arrow UDF over
content bytes (JSON-payload classification needs a real parser + key-set
voting, which no fixed-schema ``from_json`` can express). The magic-sniff
subset is additionally exposed as a pure ``when()`` column chain
(``sniff_magic_col``) for pipelines that only need the cheap prefilter.

Decision semantics are a faithful re-derivation of ``determine_category``
(sorter.py:207-293) + the strict-extension demotion (sorter.py:314-317),
minus filesystem effects: `size` comes from the bytes, `error` only occurs
for null content.
"""

from __future__ import annotations

import json
from collections import Counter
from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf

IMAGE_EXTS = {".png", ".jpg", ".jpeg", ".gif", ".bmp", ".webp", ".tif", ".tiff"}
STRICT_IMAGE_EXTS = {".png", ".jpg", ".jpeg"}
STRICT_AUDIO_EXTS = {".wav"}
AUDIO_EXTS = {".wav", ".mp3", ".aac", ".flac", ".ogg", ".m4a", ".wma"}
TEXT_EXTS = {".txt", ".json", ".csv", ".md", ".xml", ".yaml", ".yml", ".ini",
             ".log", ".tsv"}

JSON_TEXT_KEYS = {"text", "content", "title", "sentence", "article"}
JSON_AUDIO_KEYS = {"audio", "audio_url", "audio_path", "wav", "mp3"}
JSON_IMAGE_KEYS = {"image", "image_url", "img", "picture", "thumbnail"}

HEADER_BYTES = 4096
PRINTABLE_THRESHOLD = 0.85


def _suffix(name: str) -> str:
    name = name.rsplit("/", 1)[-1]
    i = name.rfind(".")
    return name[i:].lower() if i > 0 else ""


def _is_image_url(u) -> bool:
    if not isinstance(u, str):
        return False
    u = u.lower()
    return any(ext in u for ext in [".jpg", ".jpeg", ".png", ".gif", ".bmp", ".webp"])


# 256-entry lookup for (chr(b).isprintable() or chr(b).isspace()) —
# precomputed once so the per-byte check is a vectorized table gather
_PRINTABLE_LUT = np.array(
    [(chr(b).isprintable() or chr(b).isspace()) for b in range(256)],
    dtype=bool,
)


def is_mostly_printable(data: bytes) -> bool:
    if not data:
        return False
    arr = np.frombuffer(data, dtype=np.uint8)
    return _PRINTABLE_LUT[arr].mean() >= PRINTABLE_THRESHOLD


def sniff_magic(header: bytes) -> Optional[str]:
    if header.startswith(b"\x89PNG\r\n\x1a\n"):
        return "image"
    if header.startswith(b"GIF87a") or header.startswith(b"GIF89a"):
        return "image"
    if header[:4] == b"RIFF" and header[8:12] == b"WAVE":
        return "audio"
    if header.startswith(b"ID3"):
        return "audio"
    if header.startswith(b"fLaC"):
        return "audio"
    lowered = header.lower()
    if b"metadata:image" in header or b"<svg" in lowered:
        return "image"
    stripped = header.lstrip()
    if stripped.startswith(b"{") or stripped.startswith(b"["):
        return "text"
    return None


def classify_json_payload(data) -> str:
    if isinstance(data, dict):
        keys = set(data.keys())
        if keys & JSON_IMAGE_KEYS:
            return "image"
        if keys & JSON_AUDIO_KEYS:
            return "audio"
        if keys & JSON_TEXT_KEYS:
            return "text"
        url = data.get("url") if isinstance(data.get("url"), str) else None
        if url and _is_image_url(url):
            return "image"
        return "text"
    if isinstance(data, list) and data:
        votes: Counter = Counter()
        for item in data[: min(10, len(data))]:
            if isinstance(item, dict):
                keys = set(item.keys())
                if keys & JSON_IMAGE_KEYS:
                    votes["image"] += 1
                if keys & JSON_AUDIO_KEYS:
                    votes["audio"] += 1
                if keys & JSON_TEXT_KEYS:
                    votes["text"] += 1
                if (
                    "url" in item
                    and isinstance(item["url"], str)
                    and _is_image_url(item["url"])
                ):
                    votes["image"] += 1
            elif isinstance(item, str) and item.strip():
                votes["text"] += 1
        if votes:
            label, count = votes.most_common(1)[0]
            if count > 0:
                return label
        return "text"
    return "text"


def _classify_json_bytes(data: bytes) -> Optional[str]:
    try:
        payload = json.loads(data.decode("utf-8", errors="ignore"))
    except Exception:
        return None
    return classify_json_payload(payload)


def determine_category(name: str, content: Optional[bytes]) -> str:
    """Reference determine_category (sorter.py:207-293) over bytes."""
    if content is None:
        return "error"
    suffix = _suffix(name)
    if suffix in STRICT_IMAGE_EXTS:
        return "image"
    if suffix in STRICT_AUDIO_EXTS:
        return "audio"
    if len(content) == 0:
        return "unknown"

    header = content[:HEADER_BYTES]
    magic = sniff_magic(header)

    if suffix == ".json":
        label = _classify_json_bytes(content)
        if label:
            return label
        if magic:
            return "text" if magic == "text" else magic
        if is_mostly_printable(header):
            return "text"
        return "unknown"

    if suffix in IMAGE_EXTS:
        if magic:
            if magic == "text":
                return _classify_json_bytes(content) or "text"
            return magic
        return "image"

    if suffix in AUDIO_EXTS:
        if magic == "audio":
            return "audio"
        if magic == "image":
            return "image"
        if magic == "text":
            label = _classify_json_bytes(content)
            if label:
                return label
            if is_mostly_printable(header):
                return "text"
            return "unknown"
        if not is_mostly_printable(header):
            return "audio"
        return _classify_json_bytes(content) or "text"

    if suffix in TEXT_EXTS:
        if magic and magic != "text":
            return magic
        if is_mostly_printable(header):
            return "text"
        return _classify_json_bytes(content) or "text"

    if magic:
        if magic == "text":
            return _classify_json_bytes(content) or "text"
        return magic

    if is_mostly_printable(header):
        return _classify_json_bytes(content) or "text"

    return "unknown"


def classify(name: str, content: Optional[bytes], strict: bool = True) -> str:
    """determine_category + strict-extension demotion (sorter.py:314-317)."""
    category = determine_category(name, content)
    if strict:
        suffix = _suffix(name)
        if category == "image" and suffix not in STRICT_IMAGE_EXTS:
            category = "unknown"
        if category == "audio" and suffix not in STRICT_AUDIO_EXTS:
            category = "unknown"
    return category


def make_classify_udf(strict: bool = True):
    """(name, content) → category. Arrow-batched; replaces the reference's
    16-thread x 1000-file chunking (sorter.py:383-396) with partition
    parallelism."""

    @pandas_udf(T.StringType())
    def classify_udf(names: pd.Series, contents: pd.Series) -> pd.Series:
        return pd.Series(
            [
                classify(n, bytes(c) if c is not None else None, strict)
                for n, c in zip(names, contents)
            ]
        )

    return classify_udf


def sniff_magic_col(content: Column) -> Column:
    """Pure when()-chain magic sniff (S2) — JVM-side, no Python. Decodes the
    header as latin-1 so byte positions map 1:1 to chars."""
    h = F.decode(F.substring(content, 1, HEADER_BYTES), "ISO-8859-1")
    starts = lambda s: h.startswith(s.decode("ISO-8859-1"))  # noqa: E731
    return (
        F.when(starts(b"\x89PNG\r\n\x1a\n"), "image")
        .when(starts(b"GIF87a") | starts(b"GIF89a"), "image")
        .when(
            (F.substring(h, 1, 4) == "RIFF") & (F.substring(h, 9, 4) == "WAVE"),
            "audio",
        )
        .when(starts(b"ID3") | starts(b"fLaC"), "audio")
        .when(
            h.contains("metadata:image") | F.lower(h).contains("<svg"), "image"
        )
        .when(F.ltrim(h).startswith("{") | F.ltrim(h).startswith("["), "text")
        .otherwise(F.lit(None).cast("string"))
    )


def category_rollup(classified, category_col: str = "category",
                    size_col: str = "size_bytes"):
    """A1: per-category count + byte-sum rollup (sorter.py:352-357)."""
    return classified.groupBy(category_col).agg(
        F.count("*").alias("n_files"), F.sum(size_col).alias("total_bytes")
    )
