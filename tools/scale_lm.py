"""LM perplexity scoring scale anchor (operators/lm.py).

Corpus: n docs x 50 tokens, generated JVM-SIDE (no Python in the data
path): token j of doc i is ``w<xxhash64(i, j) mod vocab>``, where docs
with ``i % 10 == 0`` draw from a 100-word vocabulary (common tokens ->
high log-prob) and the rest from 50k words (rare tokens -> low). The
planted signal gives a hard per-run assertion: every common-vocab doc
must land in the head tertile of the approx (map-side, no-global-sort)
bucketing — the 100-TB path end to end.

Reports docs/s and event-log busy-core seconds; run at two core counts
for the N->4N scaling pair (local[2] vs local[8] on this host — both
legs must fit the ~24-core supply, CLAUDE.md).

Usage: python tools/scale_lm.py <cores> <n_docs> [runs_file]
"""

import json
import sys
import tempfile
import time

sys.path.insert(0, ".")

import bench
from deduplication_framework_spark.session import get_spark
from tools.scale_once import _task_metrics

TOKENS = 50
COMMON_VOCAB = 100
RARE_VOCAB = 50_000


def synth_docs(spark, n: int, partitions: int):
    from pyspark.sql import functions as F

    vocab = (
        f"CASE WHEN id % 10 = 0 THEN {COMMON_VOCAB} ELSE {RARE_VOCAB} END"
    )
    return spark.range(n, numPartitions=partitions).select(
        F.col("id").alias("doc_id"),
        F.expr(
            f"concat_ws(' ', transform(sequence(0, {TOKENS - 1}),"
            f" j -> concat('w', pmod(xxhash64(id, j), {vocab}))))"
        ).alias("text"),
    )


def main():
    import os

    # pin BLAS before the JVM/python workers fork (CLAUDE.md scaling rule)
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    cores = int(sys.argv[1])
    n = int(sys.argv[2])
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/scale_lm_runs.jsonl"

    from pyspark.sql import functions as F

    from deduplication_framework_spark.operators.lm import (
        bucket_lm_scores,
        lm_score_docs,
    )
    from deduplication_framework_spark.operators.lsh import (
        release_census_caches,
    )

    supply = bench._effective_cores()
    evdir = tempfile.mkdtemp(prefix="spark-events-")
    spark = get_spark(
        app_name=f"scale-lm-{cores}",
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
    scored = bucket_lm_scores(lm_score_docs(docs), approx=True)
    res = (
        scored.withColumn("common", (F.col("doc_id") % 10 == 0).cast("int"))
        .groupBy("common", "bucket")
        .agg(F.count("*").alias("k"), F.avg("avg_logp").alias("m"))
        .collect()
    )
    t1 = time.time()
    sec = t1 - t0
    release_census_caches()
    spark.stop()

    common = {r.bucket: r.k for r in res if r.common == 1}
    rare = {r.bucket: r.k for r in res if r.common == 0}
    n_common = sum(common.values())
    head_rate = common.get("head", 0) / n_common
    assert head_rate == 1.0, (
        f"common-vocab docs must all be head, got {head_rate}"
    )
    mean_common = sum(
        r.m * r.k for r in res if r.common == 1
    ) / n_common
    mean_rare = sum(r.m * r.k for r in res if r.common == 0) / sum(
        rare.values()
    )
    assert mean_common > mean_rare, "planted score ordering broken"
    cpu_sec, run_sec, n_tasks = _task_metrics(evdir, t0 * 1000, t1 * 1000)
    rec = {
        "cores": cores,
        "host_supply_cores": supply,
        "n_docs": n,
        "tokens_per_doc": TOKENS,
        "sec": round(sec, 2),
        "docs_per_sec": round(n / sec, 1),
        "common_head_rate": head_rate,
        "bucket_sizes": {b: common.get(b, 0) + rare.get(b, 0)
                         for b in ("head", "middle", "tail")},
        "busy_core_sec": round(cpu_sec, 1),
        "task_run_sec": round(run_sec, 1),
        "n_tasks": n_tasks,
    }
    print(json.dumps(rec))
    with open(out, "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
