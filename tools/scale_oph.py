"""A/B e2e anchor for ``hash_family="oph"`` vs ``"kr32"`` — the measured
claim behind One-Permutation Hashing (functions/oph.py): signature
construction is O(F + K log K) per doc instead of O(F·K), so at high
num_perm the Arrow featurization stage shrinks while everything
downstream (banding, census, verify, CC) is identical work. Kernel-level
microbench: 10.2x at K=128, 16.8x at K=256 (260-feature docs); this tool
measures how much of that survives a FULL pipeline run.

Same JVM-generated corpus + hard assertions as tools/scale_jvm_pipeline.py
(planted near-copies at capped-J ≈ 0.977: recall >= 0.99 through
banding+verify+CC per leg, >= 99% of expected clusters survive — a family
that merges everything would ace recall). Legs are INTERLEAVED
(kr32, oph, kr32, oph) so host-supply drift hits both families equally;
per-leg busy-core seconds come from the event log.

Usage: python tools/scale_oph.py <cores> <n_docs> [num_perm] [runs_file]
           [families_csv]
families_csv defaults to "kr32,oph" (the A/B); pass "oph" for the
longer-corpus scaling pairs where timing kr32 too would double the run.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

import bench
from deduplication_framework_spark.config import PipelineConfig
from deduplication_framework_spark.plans.pipeline import run_pipeline
from deduplication_framework_spark.session import get_spark
from tools.scale_jvm_pipeline import synth_near_dup_docs
from tools.scale_once import _task_metrics

REPS = 2


def run_leg(spark, pages, family, num_perm, n, n_planted, evdir):
    from pyspark.sql import functions as F

    cfg = PipelineConfig()
    cfg.dedup.hash_family = family
    cfg.dedup.num_perm = num_perm

    # the pipeline's internal persists survive across legs and MATCH by
    # canonicalized plan (bench.py lesson: rep 2 becomes cache reads —
    # observed here as 2.5s "legs" with half the task count). Clear, then
    # re-materialize the corpus OUTSIDE the timed window.
    spark.catalog.clearCache()
    pages.persist()
    pages.count()

    t0 = time.time()
    res = run_pipeline(
        spark, pages, cfg, detectors=["exact", "minhash"], verify=True
    )
    n_keepers = res.keepers.count()
    t1 = time.time()

    # verification OUTSIDE the timed window (scale_selection lesson)
    labels = res.clusters.select("doc_id", "cluster_id").persist()
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
    labels.unpersist()
    recall = (planted["n_same"] or 0) / planted["n_pairs"]
    cpu_sec, run_sec, n_tasks = _task_metrics(evdir, t0 * 1000, t1 * 1000)
    leg = {
        "family": family,
        "sec": round(t1 - t0, 2),
        "docs_per_sec": round(n / (t1 - t0), 1),
        "n_keepers": n_keepers,
        "recall": round(recall, 5),
        "n_clusters": n_clusters,
        "busy_core_sec": round(cpu_sec, 1),
        "task_run_sec": round(run_sec, 1),
        "n_tasks": n_tasks,
    }
    assert int(planted["n_pairs"]) == n_planted, leg
    assert recall >= 0.99, f"{family} dropped planted near-dups: {leg}"
    assert n_clusters >= 0.99 * (n - n_planted), leg
    return leg


def main():
    cores = int(sys.argv[1])
    n = int(sys.argv[2])
    num_perm = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    out = sys.argv[4] if len(sys.argv) > 4 else "/tmp/scale_oph_runs.jsonl"
    families = tuple(
        sys.argv[5].split(",") if len(sys.argv) > 5 else ("kr32", "oph")
    )

    supply = bench._effective_cores()
    evdir = tempfile.mkdtemp(prefix="spark-events-")
    spark = get_spark(
        app_name=f"scale-oph-{cores}",
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
    pages.count()
    n_planted = len([i for i in range(n) if i % 50 == 1])

    # untimed warmup of BOTH families on a slice: JIT + Arrow first-use
    # is 2-4x (bench.py lesson) and would otherwise land on leg 1 only
    warm = synth_near_dup_docs(spark, 2000, cores).persist()
    warm.count()
    for family in families:
        wcfg = PipelineConfig()
        wcfg.dedup.hash_family = family
        wcfg.dedup.num_perm = num_perm
        run_pipeline(
            spark, warm, wcfg, detectors=["exact", "minhash"], verify=True
        ).keepers.count()
    warm.unpersist()

    legs = []
    for _ in range(REPS):
        for family in families:
            legs.append(
                run_leg(spark, pages, family, num_perm, n, n_planted, evdir)
            )
    spark.stop()

    best = {
        f: min((l for l in legs if l["family"] == f), key=lambda l: l["sec"])
        for f in families
    }
    rec = {
        "cores": cores,
        "host_supply_cores": supply,
        "n_docs": n,
        "num_perm": num_perm,
        "legs": legs,
    }
    for f in families:
        rec[f + "_min_sec"] = best[f]["sec"]
        rec[f + "_busy_core_sec"] = best[f]["busy_core_sec"]
        rec[f + "_docs_per_sec"] = best[f]["docs_per_sec"]
    if "kr32" in best and "oph" in best:
        rec["e2e_speedup_oph_over_kr32"] = round(
            best["kr32"]["sec"] / best["oph"]["sec"], 3
        )
        rec["cpu_ratio_kr32_over_oph"] = round(
            best["kr32"]["busy_core_sec"] / best["oph"]["busy_core_sec"], 3
        )
    print(json.dumps(rec))
    with open(out, "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
