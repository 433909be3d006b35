"""E2E pipeline scale anchor for ``hash_family="jvm"`` — the
Python-worker-free MinHash dedup path through ``run_pipeline`` itself
(featurize → band → census → verify → CC → keepers), not just the
signature operator (that is tools/scale_jvm_minhash.py).

Corpus is generated ENTIRELY JVM-side (pseudo-words from md5 of
(id, position) — zero Python in the lineage): n docs of 60 six-char
hex words. Every id with i % 50 == 1 is a NEAR-copy of i-1: the last
3 of 60 words are re-drawn from a salted domain. In the pipeline's own
capped feature space (60 word tokens ∪ first-200 char-3-grams of the
space-stripped text — the perturbed tail words sit past gram #200) the
planted pair's exact Jaccard is (57+200)/(63+200) ≈ 0.977 >> 0.8, so
banding collision ~1 and the verifier must keep every pair; unrelated
docs share ~10 of 4096 possible hex trigrams (J ≈ 0.02), far below
threshold.

Hard assertions per run (a regression fails the anchor, not just a
number drifting):
  * dup-pair recall over the planted near-copies >= 0.99 through the
    FULL pipeline (banding + verify + CC);
  * no degenerate collapse: >= 99% of the expected cluster count
    survives (a broken family that merges everything would ace recall).

The timed window is run_pipeline + keepers.count() over a persisted,
pre-counted corpus; recall verification runs OUTSIDE it
(scale_selection lesson: for short jobs the checker dominates).

Usage: python tools/scale_jvm_pipeline.py <cores> <n_docs> [runs_file]
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

# BLAS pinning before any Spark/numpy touch (round-4 lesson: unpinned
# OpenBLAS makes small-core configs secretly many-core). No GEMM here,
# but the convention is cheap and keeps the pair honest.
for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

import bench
from deduplication_framework_spark.config import PipelineConfig
from deduplication_framework_spark.plans.pipeline import run_pipeline
from deduplication_framework_spark.session import get_spark
from tools.scale_once import _task_metrics

N_WORDS = 60
N_PERTURBED = 3  # trailing words re-drawn in each near-copy


def synth_near_dup_docs(spark, n: int, partitions: int):
    """JVM-only corpus: id -> 60 pseudo-words; i%50==1 near-copies i-1
    with the last N_PERTURBED words salted. Columns match prepare_docs'
    explicit-order contract (doc_order, url, text, lang)."""
    from pyspark.sql import functions as F

    word = (
        "CASE WHEN is_copy AND i > {keep} "
        "THEN substring(md5(concat(cast(id AS string), ':x:', i)), 1, 6) "
        "ELSE substring(md5(concat(cast(src_id AS string), ':', i)), 1, 6) END"
    ).format(keep=N_WORDS - N_PERTURBED)
    text = F.expr(
        f"concat_ws(' ', transform(sequence(1, {N_WORDS}), i -> {word}))"
    )
    return (
        spark.range(n, numPartitions=partitions)
        .withColumn("is_copy", F.col("id") % 50 == 1)
        .withColumn(
            "src_id",
            F.when(F.col("is_copy"), F.col("id") - 1).otherwise(F.col("id")),
        )
        .select(
            F.col("id").alias("doc_order"),
            F.concat(F.lit("https://anchor.example/"), F.col("id")).alias("url"),
            text.alias("text"),
            F.lit("en").alias("lang"),
        )
    )


def main():
    cores = int(sys.argv[1])
    n = int(sys.argv[2])
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/scale_jvm_pipeline_runs.jsonl"

    from pyspark.sql import functions as F

    supply = bench._effective_cores()
    evdir = tempfile.mkdtemp(prefix="spark-events-")
    spark = get_spark(
        app_name=f"scale-jvm-pipeline-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=max(cores * 2, 16),
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{evdir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    pages = synth_near_dup_docs(spark, n, cores * 2).persist()
    pages.count()  # corpus materialized OUTSIDE the timed window

    cfg = PipelineConfig()
    cfg.dedup.hash_family = "jvm"

    t0 = time.time()
    res = run_pipeline(
        spark, pages, cfg, detectors=["exact", "minhash"], verify=True
    )
    n_keepers = res.keepers.count()
    t1 = time.time()
    sec = t1 - t0

    # ---- verification OUTSIDE the timed window ----
    labels = res.clusters.select("doc_id", "cluster_id").persist()
    n_planted = len([i for i in range(n) if i % 50 == 1])
    planted = (
        labels.alias("a")
        .join(
            labels.alias("b"),
            (F.col("b.doc_id") == F.col("a.doc_id") + 1)
            & (F.col("b.doc_id") % 50 == 1),
        )
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum(
                (F.col("a.cluster_id") == F.col("b.cluster_id")).cast("int")
            ).alias("n_same"),
        )
        .collect()[0]
    )
    n_clusters = labels.select("cluster_id").distinct().count()
    spark.stop()

    recall = (planted["n_same"] or 0) / planted["n_pairs"]
    cpu_sec, run_sec, n_tasks = _task_metrics(evdir, t0 * 1000, t1 * 1000)
    rec = {
        "cores": cores,
        "host_supply_cores": supply,
        "n_docs": n,
        "num_perm": cfg.dedup.num_perm,
        "sec": round(sec, 2),
        "docs_per_sec": round(n / sec, 1),
        "n_keepers": n_keepers,
        "planted_pairs": int(planted["n_pairs"]),
        "planted_same_cluster": int(planted["n_same"] or 0),
        "recall": round(recall, 5),
        "n_clusters": n_clusters,
        "busy_core_sec": round(cpu_sec, 1),
        "task_run_sec": round(run_sec, 1),
        "n_tasks": n_tasks,
    }
    assert rec["planted_pairs"] == n_planted, rec
    assert recall >= 0.99, f"pipeline dropped planted near-dups: {rec}"
    # expected clusters = n - n_planted (each copy merges into its source);
    # a hash family collapse would merge unrelated docs and ace recall
    assert n_clusters >= 0.99 * (n - n_planted), rec
    print(json.dumps(rec))
    with open(out, "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
