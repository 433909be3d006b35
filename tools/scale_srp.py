"""Similarity-search scale anchor: SRP LSH over a synthetic 10^6-vector
corpus with planted near-duplicate pairs — the embedding-modality analog
of the text pipeline's 1M-doc headroom anchor (BENCH/BASELINE.md).

Corpus: n unit vectors (dim 64), generated DISTRIBUTED and deterministically
(per-id seeds, so the layout is partition-independent); every id with
i % 100 == 1 is a perturbed copy of id i-1 at cosine ~0.99 (n/100 planted
pairs). Run: ``srp_candidate_edges`` with b=16 bands x r=24 sign bits
(2^24-key bands keep noise buckets near size 1 at 10^6 rows; planted-pair
band-hit probability 1-(1-p^24)^16 ~ 0.999 at cos 0.99) + exact-dot
verification at 0.9.

Hard assertion (like bench's skew entry): planted-pair recall >= 0.99 —
a regression in banding, bucket join, or verification fails the run, so
the throughput number can never silently stop measuring the real job.

Usage: python tools/scale_srp.py <cores> <n_vecs> [runs_file]
"""

import json
import sys
import tempfile
import time
from typing import Iterator

import numpy as np
import pandas as pd

sys.path.insert(0, ".")

import bench
from deduplication_framework_spark.session import get_spark
from tools.scale_once import _task_metrics

DIM = 64
EPS = 0.12  # perturbation -> cosine ~0.992 +/- 0.003


def synth_vectors(spark, n: int, partitions: int):
    """id -> deterministic unit vector; i%100==1 duplicates i-1 (cos~0.99).
    Per-id RandomState makes generation independent of partitioning."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def base(i: int) -> np.ndarray:
            v = np.random.RandomState(i).randn(DIM)
            return v / np.linalg.norm(v)

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            out = np.empty((len(ids), DIM))
            for j, i in enumerate(ids):
                if i % 100 == 1:
                    v = base(i - 1) + EPS * base(10**9 + i)
                    out[j] = v / np.linalg.norm(v)
                else:
                    out[j] = base(i)
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": list(out.astype(np.float32))}
            )

    return (
        spark.range(n, numPartitions=partitions)
        .mapInPandas(gen, schema="vec_id long, embedding array<float>")
    )


def main():
    # pin BLAS to one thread per python worker BEFORE the JVM (and its
    # python-worker daemon) launches: un-pinned OpenBLAS lets a local[2]
    # worker's GEMM fan out over every host core, which silently turns
    # the "2-core" leg of a scaling pair into a many-core run and
    # poisons the N->4N efficiency number
    import os

    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    cores = int(sys.argv[1])
    n = int(sys.argv[2])
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/scale_srp_runs.jsonl"
    from deduplication_framework_spark.operators.srp import (
        srp_candidate_edges,
    )

    supply = bench._effective_cores()
    evdir = tempfile.mkdtemp(prefix="spark-events-")
    spark = get_spark(
        app_name=f"scale-srp-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=max(cores * 2, 16),
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{evdir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    vecs = synth_vectors(spark, n, cores * 2).persist()
    vecs.count()  # materialize OUTSIDE the timed window (input, not work)

    t0 = time.time()
    edges, stats = srp_candidate_edges(
        vecs, threshold=0.9, b=16, r=24, seed=42, dim=DIM
    )
    from pyspark.sql import functions as F

    found = (
        edges.withColumn(
            "planted",
            (
                ((edges.dst - edges.src) == 1) & (edges.dst % 100 == 1)
            ).cast("int"),
        )
        .agg(
            F.count("*").alias("n_edges"),
            F.sum("planted").alias("n_planted"),
        )
        .collect()[0]
    )
    n_edges, n_planted_found = found[0], int(found[1] or 0)
    t1 = time.time()
    sec = t1 - t0
    # diagnostics only — OUTSIDE the timed window (stats is a second
    # action that re-runs the banding DAG; timing it would overstate the
    # per-query cost by ~1.7x)
    stats_row = stats.collect()[0].asDict()
    spark.stop()

    n_planted = len([i for i in range(n) if i % 100 == 1])
    recall = n_planted_found / n_planted
    cpu_sec, run_sec, n_tasks = _task_metrics(evdir, t0 * 1000, t1 * 1000)
    rec = {
        "cores": cores,
        "n_vecs": n,
        "dim": DIM,
        "b": 16,
        "r": 24,
        "sec": round(sec, 2),
        "vecs_per_sec": round(n / sec, 1),
        "edges": n_edges,
        "planted_pairs": n_planted,
        "planted_found": n_planted_found,
        "recall": round(recall, 5),
        "bucket_stats": {k: v for k, v in stats_row.items()},
        "task_run_sec": round(run_sec, 1),
        "task_cpu_sec": round(cpu_sec, 1),
        "busy_cores": round(run_sec / sec, 2),
        "n_tasks": n_tasks,
        "host_effective_cores_before": supply,
        "ts": time.strftime("%H:%M:%S"),
    }
    assert recall >= 0.99, f"planted-pair recall {recall} < 0.99"
    with open(out, "a") as fh:
        fh.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
