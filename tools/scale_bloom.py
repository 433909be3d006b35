"""Incremental-dedup scale anchor: Bloom-prefiltered recrawl dedup of a
synthetic batch against a synthetic multi-million-doc historical corpus
(the daily-recrawl posture of operators/bloom.py at headroom scale).

Corpus: texts are generated JVM-SIDE (md5-derived word soup per id, no
Python in the generator), so the anchor measures the operator, not a
Python data generator. Every batch id with j % 3 == 0 re-crawls history
doc (j*7 % n_old) — a 1/3 dup fraction, Common-Crawl-recrawl shaped.

Hard assertions (like bench's skew/cc entries):
* the Bloom path's answer EQUALS the distributed anti-join's answer
  (symmetric difference 0) — the filter may route rows, never decide them;
* measured false positives stay under 1% of the definitely-new mass
  (sized fpp is 1e-3).

Reported: bloom build wall (history scan -> bit array), batch filter wall
(map-side membership + verify join), docs/s for both, candidate routing
counts, and event-log busy-core seconds — run at two core counts for the
N->4N scaling pair (e.g. 2 and 8: both legs must fit the host's ~25
effective cores, CLAUDE.md).

Usage: python tools/scale_bloom.py <cores> <n_old> <n_new> [runs_file]
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

for _var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_var, "1")

import bench
from deduplication_framework_spark.session import get_spark
from tools.scale_once import _task_metrics


def _text_expr(idcol):
    """Deterministic ~200-char text as a pure JVM expression of an id."""
    from pyspark.sql import functions as F

    c = idcol.cast("string")
    return F.concat_ws(
        " ",
        F.lit("doc"),
        F.md5(c),
        F.md5(F.concat(c, F.lit("-a"))),
        F.md5(F.concat(c, F.lit("-b"))),
        F.md5(F.concat(c, F.lit("-c"))),
        F.md5(F.concat(c, F.lit("-d"))),
    )


def main():
    from pyspark.sql import functions as F

    from deduplication_framework_spark.operators.bloom import (
        bloom_build,
        incremental_new_rows,
    )

    cores = int(sys.argv[1])
    n_old = int(sys.argv[2])
    n_new = int(sys.argv[3])
    out = sys.argv[4] if len(sys.argv) > 4 else "/tmp/scale_bloom_runs.jsonl"

    supply = bench._effective_cores()
    evdir = tempfile.mkdtemp(prefix="spark-events-")
    spark = get_spark(
        app_name=f"scale-bloom-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=max(cores * 2, 16),
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{evdir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )

    # corpus materialized to parquet OUTSIDE the timed window: the JVM
    # generator (5 md5 calls/doc) would otherwise dominate the history
    # scan and the anchor would measure corpus synthesis, not the operator
    corpus_dir = tempfile.mkdtemp(prefix="scale-bloom-corpus-")
    spark.range(n_old, numPartitions=cores * 2).select(
        F.col("id").alias("doc_id"), _text_expr(F.col("id")).alias("text")
    ).write.mode("overwrite").parquet(f"{corpus_dir}/old")
    j = F.col("id")
    spark.range(n_new, numPartitions=cores * 2).select(
        (j + 10_000_000_000).alias("doc_id"),
        F.when(j % 3 == 0, _text_expr((j * 7) % n_old))
        .otherwise(_text_expr(j + 20_000_000_000))
        .alias("text"),
    ).write.mode("overwrite").parquet(f"{corpus_dir}/new")
    old = spark.read.parquet(f"{corpus_dir}/old")
    new = spark.read.parquet(f"{corpus_dir}/new")

    t0 = time.time()
    bloom = bloom_build(
        old, F.md5("text"), expected_items=n_old, fpp=1e-3
    )
    t1 = time.time()
    # SCALE_BLOOM_SHUFFLE=1 forces the shuffle verify path (the posture
    # for batches whose candidate set is too big to broadcast)
    thresh = 0 if os.environ.get("SCALE_BLOOM_SHUFFLE") else 2_000_000
    res, stats = incremental_new_rows(
        new, old, key_col="text", bloom=bloom,
        candidate_broadcast_threshold=thresh,
    )
    res = res.persist()  # count + two exceptAll consumers
    n_res = res.count()
    t2 = time.time()

    # exactness OUTSIDE the timed window: distributed anti-join oracle
    plain = new.join(
        old.select(F.md5("text").alias("_k")).distinct(),
        F.md5(new["text"]) == F.col("_k"),
        "left_anti",
    ).select("doc_id").persist()
    symdiff = (
        res.select("doc_id").exceptAll(plain).count()
        + plain.exceptAll(res.select("doc_id")).count()
    )
    assert symdiff == 0, f"bloom path diverged from anti-join: {symdiff}"
    n_true_dups = stats["n_new_batch"] - n_res
    n_fp = stats["n_candidates"] - n_true_dups
    assert 0 <= n_fp <= max(20, 0.01 * stats["n_definite_new"]), (
        f"false positives out of budget: {n_fp}"
    )
    spark.stop()
    import shutil

    shutil.rmtree(corpus_dir, ignore_errors=True)

    build_sec = t1 - t0
    filter_sec = t2 - t1
    cpu_sec, run_sec, n_tasks = _task_metrics(evdir, t0 * 1000, t2 * 1000)
    rec = {
        "cores": cores,
        "n_old": n_old,
        "n_new": n_new,
        "m_bits": bloom.m_bits,
        "k": bloom.k,
        "bloom_mb": round(bloom.n_bytes / 2**20, 2),
        "build_sec": round(build_sec, 2),
        "build_docs_per_sec": round(n_old / build_sec, 1),
        "filter_sec": round(filter_sec, 2),
        "filter_docs_per_sec": round(n_new / filter_sec, 1),
        "n_new_result": n_res,
        "n_definite_new": stats["n_definite_new"],
        "n_candidates": stats["n_candidates"],
        "n_false_positive": n_fp,
        "verify_path": stats["verify_path"],
        "task_cpu_sec": round(cpu_sec, 1),
        "task_run_sec": round(run_sec, 1),
        "n_tasks": n_tasks,
        "host_effective_cores": round(supply, 1),
        "ts": round(time.time(), 1),
    }
    with open(out, "a") as fh:
        fh.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
