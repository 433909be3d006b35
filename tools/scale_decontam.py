"""Decontamination scale anchor: span-level eval-overlap removal of a
synthetic multi-million-word train corpus against a benchmark-sized eval
corpus (operators/decontaminate.py::remove_contaminated_spans at headroom
scale — the GPT-3/Llama n-gram hygiene pass).

Corpus: texts are generated JVM-SIDE (md5-derived N_WORDS-word docs —
SCALE_DECONTAM_WORDS, default 40 — no Python in the generator). Plants,
by train id j:
* j % 10 == 0 — an eval doc's full text wrapped in two unique words
  (partial contamination: exactly the N_WORDS embedded words are covered);
* j % 10 == 1 — an exact copy of an eval doc (fully covered -> emptied);
* otherwise   — N_WORDS unique words (clean).

Hard assertions (like bench's skew/cc entries): every planted wrap has
n_removed == N_WORDS of N_WORDS + 2, every exact copy is emptied, every
clean doc is untouched — exact expected counts, not tolerances.

Reported: wall + docs/s for the whole pass (eval gram census + covered-
index build + reassembly), eval-gram count, join paths, event-log
busy-core seconds. Run at two core counts for the N->4N scaling pair
(e.g. 2 and 8 — both legs must fit the host's ~25 effective cores,
CLAUDE.md).

Usage: python tools/scale_decontam.py <cores> <n_train> <n_eval> [runs_file]
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

# words per generated doc; 8-grams per doc = N_WORDS - 7. Default 40 —
# web-page-shaped work per doc (12-word docs make the anchor scan/
# broadcast-bound and under-use extra cores; see BENCH/BASELINE.md)
N_WORDS = int(os.environ.get("SCALE_DECONTAM_WORDS", "40"))

# "hash" (default: 128-bit xxhash64-pair gram keys) or "raw" (string
# join spec path) — the A/B lever for the broadcast-size analysis
GRAM_KEY = os.environ.get("SCALE_DECONTAM_GRAM_KEY", "hash")


def _words(idcol, tag: str, n: int):
    """n deterministic 32-char words as pure JVM expressions of an id."""
    from pyspark.sql import functions as F

    c = idcol.cast("string")
    return [F.md5(F.concat(c, F.lit(f"-{tag}{k}"))) for k in range(n)]


def _eval_text(idcol):
    from pyspark.sql import functions as F

    return F.concat_ws(" ", *_words(idcol, "e", N_WORDS))


def main():
    from pyspark.sql import functions as F

    from deduplication_framework_spark.operators.decontaminate import (
        remove_contaminated_spans,
    )
    from deduplication_framework_spark.operators.lsh import (
        release_census_caches,
    )

    cores = int(sys.argv[1])
    n_train = int(sys.argv[2])
    n_eval = int(sys.argv[3])
    out = sys.argv[4] if len(sys.argv) > 4 else "/tmp/scale_decontam_runs.jsonl"

    supply = bench._effective_cores()
    evdir = tempfile.mkdtemp(prefix="spark-events-")
    spark = get_spark(
        app_name=f"scale-decontam-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=max(cores * 2, 16),
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{evdir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )

    # corpus materialized to parquet OUTSIDE the timed window (the md5
    # generator would otherwise dominate the scan)
    corpus_dir = tempfile.mkdtemp(prefix="scale-decontam-corpus-")
    spark.range(n_eval, numPartitions=cores * 2).select(
        F.col("id").alias("doc_id"), _eval_text(F.col("id")).alias("text")
    ).write.mode("overwrite").parquet(f"{corpus_dir}/eval")
    j = F.col("id")
    planted = (j * 13) % n_eval
    spark.range(n_train, numPartitions=cores * 2).select(
        j.alias("doc_id"),
        F.when(
            j % 10 == 0,
            F.concat_ws(
                " ",
                F.md5(F.concat(j.cast("string"), F.lit("-pre"))),
                _eval_text(planted),
                F.md5(F.concat(j.cast("string"), F.lit("-suf"))),
            ),
        )
        .when(j % 10 == 1, _eval_text(planted))
        .otherwise(F.concat_ws(" ", *_words(j, "t", N_WORDS)))
        .alias("text"),
    ).write.mode("overwrite").parquet(f"{corpus_dir}/train")
    ev = spark.read.parquet(f"{corpus_dir}/eval")
    train = spark.read.parquet(f"{corpus_dir}/train")

    t0 = time.time()
    res, stats = remove_contaminated_spans(train, ev, n=8, gram_key=GRAM_KEY)
    res = res.persist()
    n_res = res.count()
    t1 = time.time()

    # exactness OUTSIDE the timed window: planted classes, exact counts
    checks = res.agg(
        F.sum(
            ((F.col("doc_id") % 10 == 0)
             & (F.col("n_words") == N_WORDS + 2)
             & (F.col("n_removed") == N_WORDS)).cast("long")
        ).alias("wraps_ok"),
        F.sum(
            ((F.col("doc_id") % 10 == 1)
             & (F.col("n_removed") == N_WORDS)
             & (F.col("text_clean") == "")).cast("long")
        ).alias("copies_ok"),
        F.sum(
            ((F.col("doc_id") % 10 >= 2)
             & (F.col("n_removed") == 0)).cast("long")
        ).alias("clean_ok"),
    ).first()
    n_wrap = len(range(0, n_train, 10))
    n_copy = len(range(1, n_train, 10))
    n_clean = n_train - n_wrap - n_copy
    assert checks["wraps_ok"] == n_wrap, (
        f"wrapped plants mis-covered: {checks['wraps_ok']} != {n_wrap}"
    )
    assert checks["copies_ok"] == n_copy, (
        f"exact copies not emptied: {checks['copies_ok']} != {n_copy}"
    )
    assert checks["clean_ok"] == n_clean, (
        f"clean docs touched: {checks['clean_ok']} != {n_clean}"
    )
    assert n_res == n_train
    release_census_caches()
    spark.stop()
    import shutil

    shutil.rmtree(corpus_dir, ignore_errors=True)

    wall = t1 - t0
    cpu_sec, run_sec, n_tasks = _task_metrics(evdir, t0 * 1000, t1 * 1000)
    rec = {
        "cores": cores,
        "n_train": n_train,
        "n_eval": n_eval,
        "n_words": N_WORDS,
        "gram_key": GRAM_KEY,
        "n_eval_grams": stats["n_eval_grams"],
        "n_docs_hit": stats["n_contaminated"],
        "eval_join_path": stats["eval_join_path"],
        "cov_join_path": stats["cov_join_path"],
        "wall_sec": round(wall, 2),
        "train_docs_per_sec": round(n_train / wall, 1),
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
