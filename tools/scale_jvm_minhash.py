"""JVM-minhash scale anchor (functions/jvm_minhash.py) — quantifies the
Python-worker-free MinHash path: whole-stage-codegen md5 feature
hashing + affine permutations + map-side-combined min.

Corpus is generated ENTIRELY JVM-side (pseudo-words from md5 of
(id, position) — zero Python anywhere in the lineage, so the timed
window measures the operator, not a generator): n docs of 60 six-char
words; every id with i % 50 == 1 is a byte-identical copy of id i-1.

Hard assertions per run:
  * every planted exact-dup pair has IDENTICAL 32-perm signatures
    (distributed end-to-end determinism of the family);
  * >= 90% of non-planted docs have a UNIQUE signature tuple (no
    degenerate collapse — a broken hash family that maps everything to
    one value would pass the pair check).

Usage: python tools/scale_jvm_minhash.py <cores> <n_docs> [runs_file]
"""

import json
import sys
import tempfile
import time

sys.path.insert(0, ".")

import bench
from deduplication_framework_spark.session import get_spark
from tools.scale_once import _task_metrics

N_WORDS = 60
NUM_PERM = 32


def synth_docs(spark, n: int, partitions: int):
    """JVM-only corpus: id -> 60 pseudo-words; i%50==1 copies i-1."""
    from pyspark.sql import functions as F

    base = F.expr(
        "concat_ws(' ', transform(sequence(1, {w}),"
        " i -> substring(md5(concat(cast(src_id AS string), ':', i)), 1, 6)))"
        .format(w=N_WORDS)
    )
    return (
        spark.range(n, numPartitions=partitions)
        .withColumn(
            "src_id",
            F.when(F.col("id") % 50 == 1, F.col("id") - 1).otherwise(F.col("id")),
        )
        .select(F.col("id").alias("doc_id"), base.alias("text"))
    )


def main():
    cores = int(sys.argv[1])
    n = int(sys.argv[2])
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/scale_jvm_minhash_runs.jsonl"

    from pyspark.sql import functions as F

    from deduplication_framework_spark.functions.jvm_minhash import (
        jvm_minhash_signatures,
    )

    supply = bench._effective_cores()
    evdir = tempfile.mkdtemp(prefix="spark-events-")
    spark = get_spark(
        app_name=f"scale-jvm-minhash-{cores}",
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
    docs.count()  # corpus materialized OUTSIDE the timed window

    grams = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    "transform(sequence(1, greatest(length(text)-2, 1)),"
                    " i -> substring(text, i, 3))"
                )
            )
        ).alias("gram"),
    )
    sig_cols = [f"s{i:02d}" for i in range(NUM_PERM)]

    t0 = time.time()
    sigs = jvm_minhash_signatures(grams, num_perm=NUM_PERM).persist()
    n_sigs = sigs.count()
    t1 = time.time()
    sec = t1 - t0

    # verification OUTSIDE the timed window (the scale_selection lesson:
    # for map-shaped ops the checker dominates the op if timed together)
    key = F.concat_ws("-", *[F.col(c).cast("string") for c in sig_cols])
    keyed = sigs.select("doc_id", key.alias("k")).persist()
    planted = (
        keyed.alias("a")
        .join(
            keyed.alias("b"),
            (F.col("b.doc_id") == F.col("a.doc_id") + 1)
            & (F.col("b.doc_id") % 50 == 1),
        )
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum((F.col("a.k") == F.col("b.k")).cast("int")).alias("n_equal"),
        )
        .collect()[0]
    )
    n_unique_keys = keyed.select("k").distinct().count()
    spark.stop()

    n_planted = len([i for i in range(n) if i % 50 == 1])
    cpu_sec, run_sec, n_tasks = _task_metrics(evdir, t0 * 1000, t1 * 1000)
    rec = {
        "cores": cores,
        "host_supply_cores": supply,
        "n_docs": n,
        "num_perm": NUM_PERM,
        "sec": round(sec, 2),
        "docs_per_sec": round(n / sec, 1),
        "n_sigs": n_sigs,
        "planted_pairs": int(planted["n_pairs"]),
        "planted_sig_equal": int(planted["n_equal"] or 0),
        "n_unique_sig_keys": n_unique_keys,
        "busy_core_sec": round(cpu_sec, 1),
        "task_run_sec": round(run_sec, 1),
        "n_tasks": n_tasks,
    }
    assert n_sigs == n, rec
    assert rec["planted_pairs"] == n_planted, rec
    assert rec["planted_sig_equal"] == n_planted, f"dup signatures diverged: {rec}"
    # uniques: n - n_planted distinct texts; allow md5-family near-misses
    assert n_unique_keys >= 0.9 * (n - n_planted), rec
    print(json.dumps(rec))
    with open(out, "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
