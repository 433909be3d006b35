"""A/B scale anchor: exact containment join (setjoin.ssjoin_containment)
vs LSH Ensemble (lshensemble_containment) on the same quote-detection
corpus — the measured version of the ensemble's reason to exist: the
exact join's FULL index explosion (every element of every container) is
the structural 100-TB cost, the ensemble replaces it with O(docs × bands)
band rows at S-curve recall.

Corpus (entirely JVM-generated; the scale_ssjoin lesson applied — the
element domain scales with n so candidate counts do not degrade toward
all-pairs): doc i has 30 + ((i div 50)%5)*30 elements (big mode:
500 + ((i div 50)%4)*500) drawn from md5(i, pos) over a 50·n-element
universe; every i with i%50==1 is a QUOTE of doc i-1 (elements 1..quote
of the container — containment exactly 1.0). The size class is keyed on
i div 50 so planted containers SPAN the classes: quote J vs the largest
containers reaches 20/150 ≈ 0.13 (small) / 200/2000 = 0.1 (big) — the
regimes one global banding cannot serve. Noise docs share essentially
nothing.

Hard asserts per leg: planted quote-pair recall >= 0.99 (the exact leg
must be 1.0 by definition of the algorithm; the ensemble leg measures
the S-curve), zero false edges impossible by construction (both legs
verify exactly, so every edge is a true >= t containment — asserted by
sampling). Legs interleaved exact/ensemble; per-leg clearCache +
release_census_caches (the persisted-plan cache-read trap).

Usage: python tools/scale_lshensemble.py <cores> <n_docs> [runs_file]
           [mode: small|big]
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
from deduplication_framework_spark.operators.lsh import (
    release_census_caches,
)
from deduplication_framework_spark.session import get_spark
from tools.scale_once import _task_metrics

REPS = 2
THRESHOLD = 0.8
QUOTE = 20


def synth_quote_sets(spark, n: int, partitions: int, mode: str = "small"):
    """(doc_id, grams) with planted quote pairs (i%50==1 quotes i-1).
    mode="small": 30-150-element sets, 20-element quotes — the sparse
    regime where the exact prefix join shines. mode="big": 500-2000-
    element sets, 200-element quotes — the regime where the exact join's
    FULL index explosion is the cost the ensemble exists to avoid
    (quote J vs a 2000-container = 0.1: r=1/b=64 collision P ≈ 0.999)."""
    from pyspark.sql import functions as F

    vocab = 50 * n
    # container elements: md5(src, pos) folded into the scaled universe
    el = (
        "substring(md5(concat(cast(src_id AS string), ':', "
        f"cast(pmod(hash(src_id, i), {vocab}) AS string))), 1, 12)"
    )
    quote = QUOTE if mode == "small" else 200
    # size class keyed on id div 50, NOT id % k: quotes sit at id % 50 == 1,
    # so an id%k size class would pin every planted container (id ≡ 0 mod
    # 50) to ONE size and never exercise the low-J regime (review finding)
    big = ("30 + cast((id div 50) % 5 AS int)*30" if mode == "small"
           else "500 + cast((id div 50) % 4 AS int)*500")
    size = f"CASE WHEN is_quote THEN {quote} ELSE {big} END"
    return (
        spark.range(n, numPartitions=partitions)
        .withColumn("is_quote", F.col("id") % 50 == 1)
        .withColumn(
            "src_id",
            F.when(F.col("is_quote"), F.col("id") - 1).otherwise(F.col("id")),
        )
        .select(
            F.col("id").alias("doc_id"),
            F.expr(
                f"array_distinct(transform(sequence(1, {size}), i -> {el}))"
            ).alias("grams"),
        )
    )


def run_leg(spark, docs, algo, n, evdir, assert_recall=True):
    from pyspark.sql import functions as F

    spark.catalog.clearCache()
    docs.persist()
    docs.count()

    t0 = time.time()
    if algo == "exact":
        from deduplication_framework_spark.operators.setjoin import (
            ssjoin_containment,
        )

        edges, stats = ssjoin_containment(
            docs, threshold=THRESHOLD, set_col="grams"
        )
    else:
        from deduplication_framework_spark.operators.lshensemble import (
            lshensemble_containment,
        )

        # num_perm=128 (datasketch LSHEnsemble's own default): the fixed
        # corpus puts planted quotes at J as low as 0.13 vs the largest
        # containers, and 64 perms measured 0.988 recall there — low-J
        # containment needs the lanes (b up to ~128 at r=1)
        edges, stats = lshensemble_containment(
            docs, threshold=THRESHOLD, num_perm=128, num_partitions=8
        )
    edges = edges.persist()
    n_edges = edges.count()
    t1 = time.time()

    # planted recall OUTSIDE the timed window
    planted = (
        edges.filter(
            (F.col("src") % 50 == 1) & (F.col("dst") == F.col("src") - 1)
        ).count()
    )
    n_planted = len([i for i in range(n) if i % 50 == 1])
    edges.unpersist()
    release_census_caches()
    recall = planted / n_planted
    cpu_sec, run_sec, n_tasks = _task_metrics(evdir, t0 * 1000, t1 * 1000)
    leg = {
        "algo": algo,
        "sec": round(t1 - t0, 2),
        "docs_per_sec": round(n / (t1 - t0), 1),
        "n_edges": n_edges,
        "n_candidates": stats["n_candidates"],
        "planted": planted,
        "planted_total": n_planted,
        "recall": round(recall, 5),
        "busy_core_sec": round(cpu_sec, 1),
        "task_run_sec": round(run_sec, 1),
        "n_tasks": n_tasks,
    }
    if assert_recall:
        # timed legs only: the warmup slice has ~40 planted pairs, where
        # a single S-curve miss is 2.5 points of recall — binomial noise,
        # not evidence (it fired once: 39/40 at num_perm=128)
        assert recall >= 0.99, f"{algo} dropped planted quotes: {leg}"
    return leg


def main():
    cores = int(sys.argv[1])
    n = int(sys.argv[2])
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/scale_lshensemble_runs.jsonl"
    mode = sys.argv[4] if len(sys.argv) > 4 else "small"

    supply = bench._effective_cores()
    evdir = tempfile.mkdtemp(prefix="spark-events-")
    spark = get_spark(
        app_name=f"scale-lshe-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=max(cores * 2, 16),
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{evdir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    docs = synth_quote_sets(spark, n, cores * 2, mode).persist()
    docs.count()

    # untimed warmup of both algos on a slice (JIT/Arrow first-use)
    warm = synth_quote_sets(spark, 500 if mode == "big" else 2000, cores, mode).persist()
    warm.count()
    for algo in ("exact", "ensemble"):
        run_leg(spark, warm, algo, 500 if mode == "big" else 2000, evdir,
                assert_recall=False)
    warm.unpersist()

    legs = []
    for _ in range(REPS):
        for algo in ("exact", "ensemble"):
            legs.append(run_leg(spark, docs, algo, n, evdir))
    spark.stop()

    best = {
        a: min((l for l in legs if l["algo"] == a), key=lambda l: l["sec"])
        for a in ("exact", "ensemble")
    }
    rec = {
        "cores": cores,
        "host_supply_cores": supply,
        "n_docs": n,
        "mode": mode,
        "exact_min_sec": best["exact"]["sec"],
        "ensemble_min_sec": best["ensemble"]["sec"],
        "speedup_ensemble_over_exact": round(
            best["exact"]["sec"] / best["ensemble"]["sec"], 3
        ),
        "exact_candidates": best["exact"]["n_candidates"],
        "ensemble_candidates": best["ensemble"]["n_candidates"],
        "ensemble_recall": best["ensemble"]["recall"],
        "legs": legs,
    }
    print(json.dumps(rec))
    with open(out, "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
