"""Config loader round-trips (FIXTURES.md config fixtures): deep-merge over
defaults, reference YAML compatibility, config-hash stability."""

import textwrap

from deduplication_framework_spark.config import (
    PipelineConfig,
    load_pipeline_config,
)


def test_defaults_match_reference(tmp_path):
    cfg = load_pipeline_config(None)
    # reference defaults (text/method/pipeline_api.py:22-45)
    assert cfg.embedding.ngram_size == 3
    assert cfg.embedding.lowercase and cfg.embedding.strip_non_alnum
    assert cfg.dedup.method == "jaccard"
    assert cfg.dedup.threshold == 0.8
    assert cfg.dedup.max_candidates == 5000
    assert cfg.dedup.num_perm == 128
    assert cfg.dedup.simhash_dist == 10
    assert cfg.dedup.simhash_window == 1000
    assert cfg.dedup.max_words == 200
    assert cfg.dedup.max_char_grams == 200
    assert cfg.dedup.window_size == 100


def test_partial_yaml_deep_merge(tmp_path):
    p = tmp_path / "override.yaml"
    p.write_text(
        textwrap.dedent(
            """
            dedup:
              method: ours_lsh
              threshold: 0.9
            embedding:
              ngram_size: 4
            """
        )
    )
    cfg = load_pipeline_config(str(p))
    assert cfg.dedup.method == "ours_lsh"
    assert cfg.dedup.threshold == 0.9
    assert cfg.dedup.num_perm == 128  # untouched default survives the merge
    assert cfg.embedding.ngram_size == 4
    assert cfg.embedding.lowercase is True


def test_reference_production_override(tmp_path):
    """The reference's production text_override.yaml keys load unchanged
    (configs/text_override.yaml: ours_lsh, 0.8, 128, 3, 200, 200, 10, 1000)."""
    p = tmp_path / "text_override.yaml"
    p.write_text(
        textwrap.dedent(
            """
            embedding:
              ngram_size: 3
            dedup:
              method: ours_lsh
              threshold: 0.8
              max_candidates: 200000
              num_perm: 128
              max_words: 200
              max_char_grams: 200
              simhash_dist: 10
              simhash_window: 1000
            """
        )
    )
    cfg = load_pipeline_config(str(p))
    assert cfg.dedup.method == "ours_lsh"
    assert cfg.dedup.max_candidates == 200000


def test_unknown_sections_ignored(tmp_path):
    p = tmp_path / "full.yaml"
    p.write_text("dedup:\n  threshold: 0.7\norchestrator:\n  retries: 3\n")
    cfg = load_pipeline_config(str(p))
    assert cfg.dedup.threshold == 0.7


def test_config_hash_sensitivity():
    a, b = PipelineConfig(), PipelineConfig()
    assert a.config_hash() == b.config_hash()
    b.dedup.threshold = 0.81
    assert a.config_hash() != b.config_hash()


def test_json_config(tmp_path):
    p = tmp_path / "c.json"
    p.write_text('{"dedup": {"num_perm": 64}}')
    assert load_pipeline_config(str(p)).dedup.num_perm == 64
