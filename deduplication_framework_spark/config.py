"""Configuration dataclasses + YAML/JSON loader with deep-merge semantics.

Parity target: the reference's config surface —
``/root/reference/text/method/pipeline_api.py:22-68`` (dataclass defaults) and
``:95-147`` (``_merge_dict`` deep merge + YAML/JSON load). Field names and
default values match the reference so a user's existing YAML override files
work unchanged. Spark-only knobs live in :class:`SparkExecConfig`.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field
from pathlib import Path
from typing import Any, Dict, Optional


@dataclass
class TextEmbeddingConfig:
    """Mirrors reference ``TextEmbeddingConfig`` (pipeline_api.py:22-30)."""

    ngram_size: int = 3
    lowercase: bool = True
    strip_non_alnum: bool = True
    collapse_whitespace: bool = True
    encoding: str = "utf-8"
    errors: str = "ignore"
    # Reference has two normalization variants (SURVEY.md P1):
    #   pipeline_api.py:223 substitutes a space for stripped chars;
    #   jaccard_deduplication.py:13 deletes them. Default = pipeline_api.
    strip_mode: str = "space"  # "space" | "delete"


@dataclass
class TextDedupConfig:
    """Mirrors reference ``TextDedupConfig`` (pipeline_api.py:33-45)."""

    method: str = "jaccard"
    threshold: float = 0.8
    max_candidates: int = 5000
    num_perm: int = 128
    simhash_dist: int = 10
    simhash_window: int = 1000
    max_words: int = 200
    max_char_grams: int = 200
    window_size: int = 100
    # Feature-hash family (Spark-only knob; not in the reference config):
    #   "sha1" — datasketch-bit-parity path (one Python sha1 per distinct
    #            feature; required when cluster assignments must match the
    #            reference library bit-for-bit at identical configs);
    #   "kr32" — vectorized Karp-Rabin char-grams + crc32 word tokens over
    #            the SAME feature sets (identical exact Jaccard, identical
    #            S-curve statistics, no per-feature Python) — the 100-TB
    #            throughput path. Recall parity pinned in
    #            tests/test_e2e_recall.py::TestFastHashFamily.
    #   "jvm"  — md5-low32/affine-mod-2^31-1 signatures built ENTIRELY from
    #            per-row JVM expressions (functions/jvm_minhash.py: zero
    #            Python workers, zero Arrow transfer, zero featurization
    #            shuffle) — for clusters where Python worker slots are the
    #            bottleneck, and the only family DuckDB can re-derive
    #            signature-exact (driver gate: jvm_minhash_clusters).
    #            Recall parity pinned in the same TestFastHashFamily.
    #   "oph"  — kr32 feature hashes + One-Permutation Hashing with
    #            rotation densification (functions/oph.py): signature
    #            construction is O(F + K) per doc instead of O(F·K) —
    #            the cheapest Arrow family at high num_perm. Estimator
    #            statistics ≈ MinHash (gate: oph_signatures_sql; recall
    #            parity pinned in the same TestFastHashFamily).
    hash_family: str = "sha1"


@dataclass
class SuffixArrayConfig:
    """Exact-substring duplication pass (north_rule addition; no reference
    analog — semantics per Lee et al. 2022 "Deduplicating Training Data
    Makes Language Models Better", public)."""

    min_match_chars: int = 200  # substring length that counts as duplication
    # scale path: winnowing fingerprints (Schleimer et al. 2003). kgram_size +
    # winnow_window - 1 must equal min_match_chars for the detection guarantee.
    kgram_size: int = 50
    # prefix-doubling suffix-array pass verification toggle
    verify_pairs: bool = True

    @property
    def winnow_window(self) -> int:
        """The ONE derivation of the winnowing window (pipeline, driver
        query, and SQL oracle all read this): any common substring of
        length >= kgram_size + window - 1 == min_match_chars shares a
        selected fingerprint (Schleimer et al. 2003 guarantee)."""
        return self.min_match_chars - self.kgram_size + 1


@dataclass
class SparkExecConfig:
    """Spark-side execution knobs (no reference analog — the reference's
    chunk/thread heuristics at clean_the_dataset.py:413-419 are replaced by
    partition parallelism)."""

    shuffle_partitions: int = 32
    # LSH skew handling (north_rule): buckets larger than this are salted into
    # ceil(size/cap) sub-buckets; capped-bucket counts land in _metrics.
    # 256 bounds any bucket to ~32k verification pairs; boilerplate buckets
    # (not mutual dups — their pairs fail verification anyway) stop wasting
    # quadratic verify work, while true-dup hot buckets stay connected
    # through the salt groups + star/chain backbone and CC.
    bucket_cap: int = 256
    # SimHash pigeonhole buckets get their own (higher) cap: verification
    # is FUSED into the bucket self-join as one bit_count expression, so a
    # 2000-row bucket is ~2M filtered comparisons inside the join task —
    # cheap — and staying all-pairs below the cap keeps the path exact
    # without entering the recursive-pigeonhole machinery (which remains
    # the lossless handler for buckets above it). 256 here (the round-3
    # setting) sent ~70% of the 20k-doc bench corpus's band rows into the
    # hot path for no recall gain.
    simhash_bucket_cap: int = 2000
    # broadcast the CC frontier when it drops under this many rows
    cc_broadcast_threshold: int = 1_000_000
    checkpoint_dir: Optional[str] = None  # table-store root; None = no checkpoints
    catalog: str = "parquet"  # "parquet" (sandbox) | "iceberg" (cluster)


@dataclass
class PipelineConfig:
    embedding: TextEmbeddingConfig = field(default_factory=TextEmbeddingConfig)
    dedup: TextDedupConfig = field(default_factory=TextDedupConfig)
    suffix: SuffixArrayConfig = field(default_factory=SuffixArrayConfig)
    spark: SparkExecConfig = field(default_factory=SparkExecConfig)

    def config_hash(self) -> str:
        """sha256 of the sorted-JSON config — the resume key.

        Reference analog: ``pipelines/stage_utils.py:15-17`` hashes
        sorted-JSON config to decide stage skip on restart.
        """
        blob = json.dumps(asdict(self), sort_keys=True, default=str)
        return hashlib.sha256(blob.encode("utf-8")).hexdigest()


def _merge_dict(default: Dict[str, Any], override: Dict[str, Any]) -> Dict[str, Any]:
    """Deep merge, reference semantics (pipeline_api.py:95-102)."""
    merged = dict(default)
    for key, value in override.items():
        if key in merged and isinstance(merged[key], dict) and isinstance(value, dict):
            merged[key] = _merge_dict(merged[key], value)
        else:
            merged[key] = value
    return merged


def load_pipeline_config(config_path: Optional[str] = None) -> PipelineConfig:
    """Load YAML/JSON over defaults with deep merge (pipeline_api.py:105-147).

    Unknown top-level sections are ignored (so reference YAML files that also
    carry orchestrator keys still load)."""
    defaults: Dict[str, Dict[str, Any]] = {
        "embedding": asdict(TextEmbeddingConfig()),
        "dedup": asdict(TextDedupConfig()),
        "suffix": asdict(SuffixArrayConfig()),
        "spark": asdict(SparkExecConfig()),
    }
    if not config_path:
        config_dict = dict(defaults)
    else:
        path = Path(config_path)
        if not path.exists():
            raise FileNotFoundError(f"pipeline config not found: {path}")
        content = path.read_text(encoding="utf-8")
        if path.suffix.lower() in {".yaml", ".yml"}:
            try:
                import yaml  # baked into the pyspark image

                loaded = yaml.safe_load(content) or {}
            except ImportError:  # pragma: no cover - yaml is present in CI
                raise RuntimeError("pyyaml required for YAML configs; use JSON")
        else:
            loaded = json.loads(content)
        config_dict = _merge_dict(defaults, loaded)

    known = {k: v for k, v in config_dict.items() if k in defaults}
    return PipelineConfig(
        embedding=TextEmbeddingConfig(**known["embedding"]),
        dedup=TextDedupConfig(**known["dedup"]),
        suffix=SuffixArrayConfig(**known["suffix"]),
        spark=SparkExecConfig(**known["spark"]),
    )
