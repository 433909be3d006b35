"""Skew machinery (north_rule): boilerplate/template pages create hot LSH
buckets; capping must bound pair volume WITHOUT losing dup-pair recall.

The 600-doc fixture plants a boilerplate class (~70% shared template
tokens). Forcing bucket_cap far below the hot-bucket size switches those
buckets to star+chain pairing; recall vs the sequential LSH oracle must
stay >= 0.99 because every bucket member remains connected to the bucket
minimum through verified-or-unverified edges, and connected components
restores the transitive cluster.
"""

import pytest
from pyspark.sql import functions as F

from deduplication_framework_spark.config import PipelineConfig
from deduplication_framework_spark.oracle import numpy_oracle as O
from deduplication_framework_spark.plans.pipeline import run_pipeline


def _pairs(res):
    labels = {r.doc_id: r.cluster_id for r in res.clusters.collect()}
    return O.clusters_to_pairs(labels)


def test_capped_buckets_preserve_recall(spark, pages, texts):
    txts, _ = texts
    cfg = PipelineConfig()
    cfg.spark.bucket_cap = 8  # far below the boilerplate bucket sizes

    res = run_pipeline(
        spark, pages, cfg, detectors=["exact", "minhash"], verify=False
    )
    assert res.metrics.get("minhash.capped_band_rows", 0) > 0, (
        "fixture must actually trigger capping"
    )
    our_pairs = _pairs(res)

    oracle = O.minhash_lsh_sequential(txts)
    ref_pairs = O.clusters_to_pairs(oracle)
    recall = O.dup_pair_recall(ref_pairs, our_pairs)
    assert recall >= 0.99, f"recall {recall:.4f} with bucket_cap=8"


def test_capping_bounds_pair_volume(spark, pages):
    """With the cap on, the boilerplate class produces linear (star+chain),
    not quadratic, edges from its hot buckets."""
    from deduplication_framework_spark.functions.text import make_minhash_udf
    from deduplication_framework_spark.functions import kernels as K
    from deduplication_framework_spark.operators.lsh import (
        candidate_pairs,
        minhash_bands,
    )

    cfg = PipelineConfig()
    docs = pages.selectExpr("doc_order as doc_id", "text")
    boiler = docs.join(
        pages.filter(F.col("dup_class") == "boilerplate").select(
            F.col("doc_order").alias("doc_id")
        ),
        "doc_id",
        "left_semi",
    )
    m = boiler.count()
    assert m >= 20
    mh = make_minhash_udf(cfg.embedding, cfg.dedup)
    sigs = boiler.select("doc_id", mh("text").alias("sig"))
    b, r = K.optimal_band_param(0.8, 128)
    bands = minhash_bands(sigs, b, r).persist()

    uncapped, _ = candidate_pairs(bands, bucket_cap=10**9)
    capped, stats = candidate_pairs(bands, bucket_cap=4)
    n_uncapped, n_capped = uncapped.count(), capped.count()
    assert stats.collect()[0].n_capped_band_rows > 0
    # star+chain (2/row) + salted all-pairs (~cap/2 per row, hash-skew
    # slack): linear in bucket size, quadratic blowup gone
    assert n_capped <= 6 * m * b
    assert n_capped < n_uncapped
    bands.unpersist()


def test_hot_free_plan_drops_salt_stages(spark):
    """Adaptive DAG pin: the build-time census prunes the salted/hot
    subplan (salt joins + star/chain window) when no bucket exceeds the
    cap, and keeps it when one does. Pair sets stay correct either way
    (covered above); this pins the plan shape itself."""
    from deduplication_framework_spark.operators.lsh import candidate_pairs

    rows = [(i, 0, "b%d" % (i % 5)) for i in range(20)]
    bands = spark.createDataFrame(rows, ["doc_id", "band_idx", "band_key"])

    cold, _ = candidate_pairs(bands, bucket_cap=100)
    cold_plan = cold._jdf.queryExecution().optimizedPlan().toString()
    assert "salt" not in cold_plan, "hot-free census must prune salt stages"

    hot, stats = candidate_pairs(bands, bucket_cap=2)
    hot_plan = hot._jdf.queryExecution().optimizedPlan().toString()
    assert "salt" in hot_plan
    # both regimes still produce the full pair set over the 4-member
    # buckets (5 buckets x C(4,2)=6 exact; capped path may add backbone
    # edges but must cover at least connectivity — here we only pin counts
    # for the exact regime)
    assert cold.count() == 5 * 6
    assert stats.collect()[0].n_capped_band_rows > 0
