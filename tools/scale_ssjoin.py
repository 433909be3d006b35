"""Exact set-similarity join scale anchor (operators/setjoin.py).

Corpus: n docs, each a 40-element set drawn deterministically (per-id
RandomState — generation is DISTRIBUTED and partition-independent, the
scale_srp pattern): 35 from a SPARSE domain that scales with n (50*n ids
— the word-bigram regime, avg df < 1) plus 5 from a 100-element HOT
domain (Zipf-head stand-ins, df ~ n/20, which rarest-first prefixes must
exclude); every id with i % 10 == 1 is a near-copy of id i-1 with 3
sparse words replaced (set Jaccard 37/43 ~ 0.86 >= t=0.8; n/10 planted
pairs). Random cross-doc pairs share < 1 expected element, so the
planted pairs are the only qualifying edges by a huge margin.

Hard assertions per run (the bench-evidence discipline):
* planted-pair recall == 1.0 — the prefix-filter theorem checked end to
  end at scale (a float-guard or ranking regression fails the run);
* zero non-planted edges (vocabulary sparsity makes any a bug).

Reports docs/s, candidate count (the prefilter's selectivity at scale)
and event-log busy-core seconds; run at two core counts for the N->4N
scaling pair.

Usage: python tools/scale_ssjoin.py <cores> <n_docs> [runs_file]
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

WORDS = 40
SWAP = 3
HOT_WORDS = 5  # per doc, drawn from a 100-word "stopword bigram" domain
HOT_DOMAIN = 100


def synth_docs(spark, n: int, partitions: int):
    """id -> deterministic 40-element set; i%10==1 near-copies i-1.

    The sparse-universe domain SCALES with n (50*n element ids) — the
    word-bigram regime the operator documents as its target: a real
    corpus's distinct-shingle count grows with corpus tokens, so average
    document frequency stays O(1) as n grows. (The tool's original fixed
    200k vocab put avg df at 40 by n=200k, and the prefix join degraded
    quadratically exactly as setjoin.py's dense-universe caveat predicts:
    measured 10.0M candidates for 20k true pairs. A fixed small universe
    is the WRONG input for this algorithm, not a bigger corpus.)
    Each doc also carries HOT_WORDS draws from a tiny hot domain — Zipf
    head stand-ins with df ~ n/20 — which the rarest-first ranking must
    keep OUT of every prefix (prefix length 9 << the 35 sparse slots);
    planted recall + the zero-noise-edge assert then certify both filters
    at scale."""
    vocab = 50 * n  # sparse domain: avg df = 35/50 < 1, independent of n

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def words(i: int) -> np.ndarray:
            # randint (not choice(replace=False), which permutes the whole
            # vocab per doc): rare within-doc dups are absorbed by
            # array_distinct — a 39-distinct base still gives its planted
            # copy J >= 36/42 ~ 0.857 >= t
            rng = np.random.RandomState(i)
            w = rng.randint(0, vocab, WORDS)
            # overwrite the tail with hot-domain draws (disjoint id space
            # ABOVE the swap namespace)
            w[WORDS - HOT_WORDS :] = (
                rng.randint(0, HOT_DOMAIN, HOT_WORDS) + 2 * vocab
            )
            return w

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            out = []
            for i in ids:
                if i % 10 == 1 and i > 0:
                    w = words(i - 1).copy()
                    # replace SWAP sparse words with fresh ones from a
                    # disjoint namespace so the copy stays ~37/43 >= 0.8
                    repl = np.random.RandomState(10**9 + i).randint(
                        0, vocab, SWAP
                    )
                    w[:SWAP] = repl + vocab  # disjoint namespace
                else:
                    w = words(i)
                out.append([f"w{int(x):09d}" for x in w])
            yield pd.DataFrame({"doc_id": ids, "grams": out})

    return spark.range(n, numPartitions=partitions).mapInPandas(
        gen, schema="doc_id long, grams array<string>"
    )


def main():
    import os

    # pin BLAS before the JVM/python workers fork: unpinned OpenBLAS makes
    # the local[2] leg of a scaling pair secretly many-core (CLAUDE.md)
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    cores = int(sys.argv[1])
    n = int(sys.argv[2])
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/scale_ssjoin_runs.jsonl"

    from pyspark.sql import functions as F

    from deduplication_framework_spark.operators.lsh import (
        release_census_caches,
    )
    from deduplication_framework_spark.operators.setjoin import ssjoin_jaccard

    supply = bench._effective_cores()
    evdir = tempfile.mkdtemp(prefix="spark-events-")
    spark = get_spark(
        app_name=f"scale-ssjoin-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=max(cores * 2, 16),
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{evdir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    docs = synth_docs(spark, n, cores * 2).persist()
    docs.count()  # materialize OUTSIDE the timed window (input, not work)

    t0 = time.time()
    edges, stats = ssjoin_jaccard(docs, threshold=0.8)
    found = (
        edges.withColumn(
            "planted",
            (((edges.dst - edges.src) == 1) & (edges.dst % 10 == 1)).cast(
                "int"
            ),
        )
        .agg(
            F.count("*").alias("n_edges"), F.sum("planted").alias("n_planted")
        )
        .collect()[0]
    )
    n_edges, n_planted_found = found[0], int(found[1] or 0)
    t1 = time.time()
    sec = t1 - t0
    release_census_caches()
    spark.stop()

    n_planted = len([i for i in range(n) if i % 10 == 1 and i > 0])
    recall = n_planted_found / n_planted
    assert recall == 1.0, f"planted recall {recall} != 1.0 (theorem broken)"
    assert n_edges == n_planted_found, (
        f"{n_edges - n_planted_found} non-planted edges on a sparse corpus"
    )
    cpu_sec, run_sec, n_tasks = _task_metrics(evdir, t0 * 1000, t1 * 1000)
    rec = {
        "cores": cores,
        "host_supply_cores": supply,
        "n_docs": n,
        "words_per_doc": WORDS,
        "sec": round(sec, 2),
        "docs_per_sec": round(n / sec, 1),
        "n_candidates": stats["n_candidates"],
        "planted_pairs": n_planted,
        "recall": recall,
        "edges": n_edges,
        "busy_core_sec": round(cpu_sec, 1),
        "task_run_sec": round(run_sec, 1),
        "n_tasks": n_tasks,
    }
    print(json.dumps(rec))
    with open(out, "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
