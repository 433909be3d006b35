"""IVF-PQ scale anchor (operators/pq.py) — the memory half of the ANN
story gets its own N->4N/event-log read (SRP covers the edge-finding
half; the gate's ivfpq_topk covers hash-exactness at gate SFs).

Corpus: n unit vectors in 64 cluster blocks (label = (i // 100) % 64 —
generation is per-id deterministic and DISTRIBUTED, the scale_srp
pattern): vector i = normalize(center[label] + 0.5 * noise_i); every id
with i % 100 == 1 is a perturbed copy of id i-1 (cos ~0.995 vs ~0.8
for ordinary same-block members — a margin PQ quantization cannot
erase, unlike the gate fixture's adversarial near-ties). The full
pipeline runs end to end per rep: codebook training (driver sample),
pq_encode (mapInPandas GEMM), IVF probe, ADC LUT scoring over codes,
exact rerank.

Hard assertion per run: for >= 99% of planted queries the RERANKED
rank-1 neighbor is the source vector. A codebook, encode, probe, ADC,
or rerank regression fails the run.

Usage: python tools/scale_pq.py <cores> <n_vecs> [runs_file]
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
BLOCKS = 64
NOISE = 0.5  # member spread within a block
EPS = 0.1  # planted-copy perturbation -> cos ~0.995


def synth_vectors(spark, n: int, partitions: int):
    """id -> deterministic blocked unit vector; i%100==1 copies i-1."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        centers = np.stack(
            [np.random.RandomState(9000 + b).randn(DIM) for b in range(BLOCKS)]
        )
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)

        def base(i: int) -> np.ndarray:
            lbl = (i // 100) % BLOCKS
            nz = np.random.RandomState(i).randn(DIM)
            v = centers[lbl] + NOISE * nz / np.linalg.norm(nz)
            return v / np.linalg.norm(v)

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            out = np.empty((len(ids), DIM))
            for j, i in enumerate(ids):
                if i % 100 == 1:
                    nz = np.random.RandomState(10**9 + i).randn(DIM)
                    v = base(i - 1) + EPS * nz / np.linalg.norm(nz)
                    out[j] = v / np.linalg.norm(v)
                else:
                    out[j] = base(i)
            yield pd.DataFrame(
                {
                    "vec_id": ids,
                    "label": (ids // 100) % BLOCKS,
                    "embedding": list(out),
                }
            )

    return spark.range(n, numPartitions=partitions).mapInPandas(
        gen, schema="vec_id long, label long, embedding array<double>"
    )


def main():
    import os

    # pin BLAS before the JVM/python workers fork (CLAUDE.md: unpinned
    # OpenBLAS makes the local[2] leg of a scaling pair secretly many-core)
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    cores = int(sys.argv[1])
    n = int(sys.argv[2])
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/scale_pq_runs.jsonl"

    from pyspark.sql import functions as F

    from deduplication_framework_spark.operators.pq import ivfpq_topk, pq_train

    supply = bench._effective_cores()
    evdir = tempfile.mkdtemp(prefix="spark-events-")
    spark = get_spark(
        app_name=f"scale-pq-{cores}",
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

    # train timed SEPARATELY: codebook k-means is a serial once-per-corpus
    # driver cost (amortized over every later batch/query); folding it
    # into the query window would charge Amdahl's law to a phase that
    # does scale (first pair measured 0.51 blended vs query-only truth)
    tt0 = time.time()
    cb = pq_train(vecs.orderBy("vec_id"), m=16, k=256, sample_rows=20_000)
    train_sec = time.time() - tt0

    t0 = time.time()
    top = ivfpq_topk(
        vecs, cb, k=10, n_probe=4, block_col="label", rerank=50
    )
    found = (
        top.filter(F.col("rank") == 1)
        .withColumn(
            "hit",
            (
                (F.col("vec_id") % 100 == 1)
                & (F.col("neighbor_id") == F.col("vec_id") - 1)
            ).cast("int"),
        )
        .agg(
            F.count("*").alias("n_q"),
            F.sum("hit").alias("n_hit"),
        )
        .collect()[0]
    )
    t1 = time.time()
    sec = t1 - t0
    spark.stop()

    n_planted = len([i for i in range(n) if i % 100 == 1])
    recall1 = int(found["n_hit"] or 0) / n_planted
    cpu_sec, run_sec, n_tasks = _task_metrics(evdir, t0 * 1000, t1 * 1000)
    rec = {
        "cores": cores,
        "host_supply_cores": supply,
        "n_vecs": n,
        "dim": DIM,
        "m": 16,
        "blocks": BLOCKS,
        "train_sec": round(train_sec, 2),
        "sec": round(sec, 2),
        "queries_per_sec": round(n / sec, 1),
        "planted_queries": n_planted,
        "planted_rank1_hits": int(found["n_hit"] or 0),
        "rank1_recall": round(recall1, 5),
        "busy_core_sec": round(cpu_sec, 1),
        "task_run_sec": round(run_sec, 1),
        "n_tasks": n_tasks,
    }
    assert recall1 >= 0.99, f"planted rank-1 recall {recall1} < 0.99"
    print(json.dumps(rec))
    with open(out, "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
