"""The fused featurization UDF must be BIT-IDENTICAL to the single-purpose
UDFs it replaced (minhash signature / LSH verification shingles / simhash
fingerprint / winnowing fingerprints) — the pipeline's correctness now rides
on the fused pass, and the single-purpose UDFs remain the spec (pinned to
datasketch / simhash-lib by tests/test_kernels.py)."""

from pyspark.sql import functions as F

from deduplication_framework_spark.config import PipelineConfig
from deduplication_framework_spark.functions.text import (
    make_fused_features_udf,
    make_lsh_features_udf,
    make_minhash_udf,
    make_simhash_udf,
    make_winnow_udf,
)


def test_fused_matches_single_purpose_udfs(spark, pages):
    cfg = PipelineConfig()
    docs = pages.limit(120).select(
        F.col("doc_order").alias("doc_id"), "text"
    )
    window = cfg.suffix.winnow_window
    fused = make_fused_features_udf(
        cfg.embedding,
        cfg.dedup,
        with_minhash=True,
        with_lsh_feats=True,
        with_simhash=True,
        with_winnow=True,
        kgram=cfg.suffix.kgram_size,
        window=window,
    )
    got = {
        r.doc_id: r
        for r in docs.select("doc_id", fused("text").alias("f"))
        .select("doc_id", "f.*")
        .collect()
    }

    mh = make_minhash_udf(cfg.embedding, cfg.dedup, include_words=True)
    lf = make_lsh_features_udf(cfg.embedding, cfg.dedup)
    sh = make_simhash_udf(cfg.embedding)
    wn = make_winnow_udf(cfg.suffix.kgram_size, window)
    expect = {
        r.doc_id: r
        for r in docs.select(
            "doc_id",
            mh("text").alias("sig"),
            lf("text").alias("shingles"),
            sh("text").alias("simhash"),
            wn("text").alias("winnow"),
        ).collect()
    }

    assert set(got) == set(expect) and len(got) == 120
    for doc_id, e in expect.items():
        g = got[doc_id]
        assert g.sig == e.sig, f"minhash sig diverged for doc {doc_id}"
        assert g.shingles == e.shingles, f"shingles diverged for doc {doc_id}"
        assert g.simhash == e.simhash, f"simhash diverged for doc {doc_id}"
        assert g.winnow == e.winnow, f"winnow diverged for doc {doc_id}"


def test_fused_partial_field_selection(spark, pages):
    """Field gating: only the requested feature families appear."""
    cfg = PipelineConfig()
    docs = pages.limit(5).select(F.col("doc_order").alias("doc_id"), "text")
    fused = make_fused_features_udf(
        cfg.embedding, cfg.dedup, with_simhash=True
    )
    out = docs.select(fused("text").alias("f")).select("f.*")
    assert out.columns == ["simhash"]
    assert out.count() == 5


def test_jvm_family_rejected_by_arrow_path_but_ok_simhash_only():
    """hash_family="jvm" has no Arrow featurization (the pipeline routes
    it to functions/jvm_minhash.jvm_minhash_features); asking this UDF
    for minhash/lsh features under it must fail loudly, while a
    simhash-only request (the mixed-detector case) must succeed."""
    import pytest

    cfg = PipelineConfig()
    cfg.dedup.hash_family = "jvm"
    with pytest.raises(ValueError, match="jvm"):
        make_fused_features_udf(
            cfg.embedding, cfg.dedup, with_minhash=True
        )
    make_fused_features_udf(
        cfg.embedding, cfg.dedup, with_minhash=False, with_simhash=True
    )
