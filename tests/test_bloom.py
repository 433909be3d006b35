"""Bloom-prefiltered incremental dedup (operators/bloom.py).

The product contract is EXACT anti-join semantics — the Bloom filter may
only route rows (definitely-new vs needs-verify), never decide them — so
every path (broadcast verify, shuffle verify, no candidates) is compared
against a plain left_anti join on the same corpus.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from deduplication_framework_spark.operators.bloom import (
    BloomFilter,
    bloom_build,
    bloom_might_contain,
    bloom_params,
    incremental_new_rows,
)


def _corpus(spark, lo, hi, dup_every=3):
    """doc_id in [lo, hi); every dup_every-th doc repeats the text of the
    previous multiple, so batches overlap content-wise across id ranges."""
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("text-"), ((F.col("id") / dup_every).cast("long") * dup_every)
        ).alias("text"),
    )


def _expected_new(new, old):
    return sorted(
        r.doc_id
        for r in new.join(
            old.select(F.md5("text").alias("k")).distinct(),
            F.md5(new["text"]) == F.col("k"),
            "left_anti",
        ).collect()
    )


def test_bloom_params_sizing():
    m, k = bloom_params(1000, 0.01)
    assert m % 64 == 0 and 9000 < m < 11000  # ~9.59 bits/item
    assert 5 <= k <= 9
    m1, k1 = bloom_params(0, 0.5)  # degenerate: still a valid tiny filter
    assert m1 == 64 and k1 >= 1
    with pytest.raises(ValueError):
        bloom_params(10, 1.5)


def test_bloom_no_false_negatives_and_fp_rate(spark):
    n = 2000
    df = spark.range(n).select(F.concat(F.lit("k"), F.col("id")).alias("key"))
    bloom = bloom_build(df, F.col("key"), fpp=0.01)
    hits = df.withColumn(
        "m", bloom_might_contain(spark, bloom, F.col("key"))
    ).filter("m")
    assert hits.count() == n  # a Bloom filter NEVER false-negatives
    probes = spark.range(n, 21 * n).select(
        F.concat(F.lit("k"), F.col("id")).alias("key")
    )
    fp = (
        probes.withColumn("m", bloom_might_contain(spark, bloom, F.col("key")))
        .filter("m")
        .count()
    )
    assert fp / (20 * n) < 0.05  # sized for 1%; generous slack for variance


def test_max_bits_guard(spark):
    df = spark.range(1).select(F.col("id").cast("string").alias("key"))
    with pytest.raises(ValueError, match="shard the key space"):
        bloom_build(
            df, F.col("key"), expected_items=10**12, fpp=1e-3, max_bits=1 << 31
        )


@pytest.mark.parametrize("threshold", [2_000_000, 0])
def test_incremental_matches_anti_join(spark, threshold):
    old = _corpus(spark, 0, 900)
    new = _corpus(spark, 600, 1500)
    res, stats = incremental_new_rows(
        new,
        old,
        key_col="text",
        candidate_broadcast_threshold=threshold,
        out_hash_col="h",
    )
    got = sorted(r.doc_id for r in res.collect())
    assert got == _expected_new(new, old)
    assert stats["verify_path"] == ("shuffle" if threshold == 0 else "broadcast")
    assert stats["n_definite_new"] + stats["n_candidates"] == stats["n_new_batch"]
    # every true dup must be routed through the candidate path
    n_true_dups = stats["n_new_batch"] - len(got)
    assert stats["n_candidates"] >= n_true_dups
    # the hash column matches Spark's md5 of the text
    bad = res.filter(F.col("h") != F.md5("text")).count()
    assert bad == 0


def test_incremental_empty_old_and_all_dup(spark):
    new = _corpus(spark, 0, 300)
    empty = new.filter("doc_id < 0")
    res, stats = incremental_new_rows(new, empty, key_col="text")
    assert res.count() == 300 and stats["verify_path"] == "none"
    res2, stats2 = incremental_new_rows(new, new, key_col="text")
    assert res2.count() == 0
    assert stats2["n_candidates"] == 300  # all routed to verify


def test_incremental_null_keys_are_new(spark):
    old = _corpus(spark, 0, 100)
    new = spark.createDataFrame(
        [(1, "text-0"), (2, None), (3, "fresh")], ["doc_id", "text"]
    )
    res, _ = incremental_new_rows(new, old, key_col="text")
    assert sorted(r.doc_id for r in res.collect()) == [2, 3]  # NULL ⇒ new


def test_incremental_within_batch_dups_preserved(spark):
    old = _corpus(spark, 0, 10)
    new = spark.createDataFrame(
        [(100, "same"), (101, "same")], ["doc_id", "text"]
    )
    res, _ = incremental_new_rows(new, old, key_col="text")
    assert res.count() == 2  # batch-internal dedup is a separate concern


def test_prebuilt_bloom_reuse(spark):
    """A persisted filter (e.g. rebuilt from a checkpoint) can be passed
    in, skipping the corpus scan — the daily-recrawl calling pattern."""
    old = _corpus(spark, 0, 500)
    bloom = bloom_build(old, F.md5("text"), fpp=1e-3)
    assert isinstance(bloom, BloomFilter) and bloom.n_bytes == bloom.m_bits // 8
    new = _corpus(spark, 400, 700)
    res, stats = incremental_new_rows(new, old, key_col="text", bloom=bloom)
    assert sorted(r.doc_id for r in res.collect()) == _expected_new(new, old)
    assert stats["m_bits"] == bloom.m_bits


def test_membership_udf_empty_partition(spark):
    df = spark.range(0).select(F.col("id").cast("string").alias("key"))
    bloom = BloomFilter(
        words=np.zeros(4, dtype=np.int64), m_bits=256, k=3, n_items=1
    )
    out = df.withColumn("m", bloom_might_contain(spark, bloom, F.col("key")))
    assert out.count() == 0


def test_prebuilt_bloom_key_mismatch_rejected(spark):
    old = _corpus(spark, 0, 50)
    raw_bloom = bloom_build(old, F.col("text"), fpp=1e-3)  # RAW text keys
    new = _corpus(spark, 0, 50)
    with pytest.raises(ValueError, match="key mismatch|built over key"):
        incremental_new_rows(new, old, key_col="text", bloom=raw_bloom)


def test_reserved_column_collision_rejected(spark):
    old = _corpus(spark, 0, 10)
    bad = spark.createDataFrame([(1, "x", "y")], ["doc_id", "text", "_k"])
    with pytest.raises(ValueError, match="collide"):
        incremental_new_rows(bad, old, key_col="text")
    new = _corpus(spark, 0, 10)
    with pytest.raises(ValueError, match="collide"):
        incremental_new_rows(new, old, key_col="text", out_hash_col="text")


def test_broadcast_cached_per_filter_and_released(spark):
    from deduplication_framework_spark.operators.bloom import (
        _BC_CACHE,
        release_bloom_broadcasts,
    )

    release_bloom_broadcasts()
    df = spark.range(100).select(F.col("id").cast("string").alias("key"))
    bloom = bloom_build(df, F.col("key"), fpp=0.01)
    for _ in range(3):  # repeated probes reuse ONE broadcast
        df.withColumn(
            "m", bloom_might_contain(spark, bloom, F.col("key"))
        ).filter("m").count()
    assert len(_BC_CACHE) == 1
    assert release_bloom_broadcasts() == 1
    assert len(_BC_CACHE) == 0


def test_bloom_tag_matches_column_api(spark):
    from deduplication_framework_spark.operators.bloom import bloom_tag

    old = _corpus(spark, 0, 200)
    bloom = bloom_build(old, F.md5("text"), fpp=1e-3)
    probe = _corpus(spark, 150, 350)
    via_col = probe.withColumn(
        "m", bloom_might_contain(spark, bloom, F.md5("text"))
    )
    via_df = bloom_tag(
        probe.withColumn("_k", F.md5("text")), bloom, F.col("_k"), "m"
    ).drop("_k")
    assert sorted((r.doc_id, r.m) for r in via_col.collect()) == sorted(
        (r.doc_id, r.m) for r in via_df.collect()
    )
    with pytest.raises(ValueError, match="already exists"):
        bloom_tag(probe, bloom, F.md5("text"), "text")
    with pytest.raises(ValueError, match="collide"):
        bloom_tag(
            probe.withColumn("_bloom_h1", F.lit(1)), bloom, F.md5("text"), "m"
        )


def test_bloom_hashing_once_per_row_structural(spark):
    """The 16M-doc build regression (BENCH/scale_bloom_runs.jsonl: 10x task
    CPU when codegen CSE degraded) stays fixed: in the OPTIMIZED plan the
    key expression appears once and xxhash64 exactly twice — k positions
    reference the h1/h2 attributes, they never re-inline the hashes."""
    from deduplication_framework_spark.operators.bloom import (
        _attach_positions,
        bloom_tag,
    )

    df = spark.range(10).select(F.col("id").cast("string").alias("text"))

    build_side = _attach_positions(
        df.select(F.md5("text").alias("_bloom_key")),
        F.col("_bloom_key"),
        10,
        1 << 20,
        "_bloom_pos",
    ).select(F.explode_outer("_bloom_pos").alias("pos"))
    # explode_outer as in bloom_build: plain explode's inferred
    # size(..)>0 filter pushes below the projections and re-inlines
    # the 2k-hash expression — the regression this test pins against
    plan = build_side._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("xxhash64") == 2, plan
    assert plan.count("md5") == 1, plan

    bloom = BloomFilter(
        words=np.zeros(1 << 10, dtype=np.int64),
        m_bits=(1 << 10) * 64,
        k=10,
        n_items=1000,
    )
    probe_side = bloom_tag(df, bloom, F.md5("text"), "maybe")
    plan = probe_side._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("xxhash64") == 2, plan
    assert plan.count("md5") == 1, plan
