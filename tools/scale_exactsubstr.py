"""ExactSubstr removal scale anchor (operators/spans.py::
remove_repeated_substrings, key_mode='hash' — the production 16-byte
double-Karp-Rabin per-position census path).

Corpus is generated ENTIRELY JVM-side (md5 pseudo-words keyed on
(src_id, position) — zero Python in the lineage, so the timed window
measures the operator):

  * every doc: 60 six-char words (~420 chars);
  * id % 20 == 1: a fixed 12-word quote (83 chars) spliced in at word
    offset 5 + (id % 7) * 5 — UNALIGNED occurrences, the case the
    chunk-aligned span ops cannot catch;
  * id % 50 == 3: byte-identical copy of id-1 (never a quote doc —
    id-1 ≡ 2 mod 50 → mod 20 ∈ {2, 12});
  * everything else: unique soup — the false-positive control.

Hard assertions per run (remove-all policy, min_len=60):
  * every quote doc loses >= 83 chars in >= 1 span (the spliced quote's
    60-char windows are corpus-hot; windows straddling its boundaries
    are doc-unique, so the covered region is exactly the quote);
  * every copy doc AND its source come out FULLY removed;
  * ZERO unique docs are touched (no false positives);
  * output row count == corpus size.

Usage: python tools/scale_exactsubstr.py <cores> <n_docs> [runs_file]
(one measurement per process; interleave 2/8-core invocations for the
N -> 4N protocol — BENCH/BASELINE.md methodology)
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
MIN_LEN = 60
QUOTE_WORDS = [
    "15f5e5", "e9144c", "3ee938", "054dc1", "76f845", "1808bb",
    "06eae4", "d53cb6", "d02796", "e7dcea", "54223d", "9d928b",
]  # md5(f"quote:{j}")[:6] — fixed, inlined as a JVM literal array
QUOTE_CHARS = len(" ".join(QUOTE_WORDS))  # 83


def synth_docs(spark, n: int, partitions: int):
    from pyspark.sql import functions as F

    qlit = "array(%s)" % ", ".join(f"'{w}'" for w in QUOTE_WORDS)
    words = (
        "transform(sequence(1, {w}), i -> "
        "substring(md5(concat(cast(src_id AS string), ':', i)), 1, 6))"
        .format(w=N_WORDS)
    )
    arr = (
        "CASE WHEN src_id % 20 = 1 THEN "
        f"concat(slice(w, 1, off), {qlit}, slice(w, off + 1, {N_WORDS} - off)) "
        "ELSE w END"
    )
    return (
        spark.range(n, numPartitions=partitions)
        .withColumn(
            "src_id",
            F.when(F.col("id") % 50 == 3, F.col("id") - 1)
            .otherwise(F.col("id")),
        )
        .withColumn("off", (F.lit(5) + (F.col("src_id") % 7) * 5).cast("int"))
        .withColumn("w", F.expr(words))
        .select(
            F.col("id").alias("doc_id"),
            F.expr(f"concat_ws(' ', {arr})").alias("text"),
        )
    )


def main():
    # pin BLAS before any numpy/Spark work: an unpinned OpenBLAS pool in
    # the Arrow workers silently turns the local[2] leg many-core and
    # poisons the N->4N efficiency number (CLAUDE.md round-4 part 3)
    import os

    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    cores = int(sys.argv[1])
    n = int(sys.argv[2])
    if n < 1000 or n % 100 != 0:
        raise SystemExit(
            "n_docs must be a multiple of 100 and >= 1000: the planted-truth "
            "asserts assume every copy doc's source is in range and every "
            "class is populated (a tail id with n % 50 == 3 would label a "
            "source whose copy was never materialized)"
        )
    out_path = (
        sys.argv[3] if len(sys.argv) > 3 else "/tmp/scale_exactsubstr_runs.jsonl"
    )

    from pyspark.sql import functions as F

    from deduplication_framework_spark.operators.lsh import (
        release_census_caches,
    )
    from deduplication_framework_spark.operators.spans import (
        remove_repeated_substrings,
    )

    supply = bench._effective_cores()
    evdir = tempfile.mkdtemp(prefix="spark-events-")
    spark = get_spark(
        app_name=f"scale-exactsubstr-{cores}",
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
    n_positions = docs.agg(
        F.sum(F.greatest(F.length("text") - MIN_LEN + 1, F.lit(0)))
    ).collect()[0][0]

    t0 = time.time()
    res, stats = remove_repeated_substrings(
        docs, min_len=MIN_LEN, key_mode="hash"
    )
    res = res.persist()
    n_out = res.count()
    t1 = time.time()
    sec = t1 - t0

    # verification OUTSIDE the timed window (scale_selection lesson)
    cls = F.when(F.col("doc_id") % 20 == 1, F.lit("quote")).when(
        (F.col("doc_id") % 50 == 3) | ((F.col("doc_id") + 1) % 50 == 3),
        F.lit("copy"),
    ).otherwise(F.lit("unique"))
    per = {
        r["cls"]: r
        for r in res.withColumn("cls", cls)
        .groupBy("cls")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                (
                    (F.col("n_removed_chars") >= QUOTE_CHARS)
                    & (F.col("n_spans_removed") >= 1)
                ).cast("int")
            ).alias("quote_hit"),
            F.sum(
                (F.col("n_removed_chars") == F.col("n_chars")).cast("int")
            ).alias("full"),
            F.sum((F.col("n_removed_chars") > 0).cast("int")).alias("touched"),
        )
        .collect()
    }
    spark.stop()

    qd, cp, uq = per["quote"], per["copy"], per["unique"]
    cpu_sec, run_sec, n_tasks = _task_metrics(evdir, t0 * 1000, t1 * 1000)
    rec = {
        "cores": cores,
        "host_supply_cores": supply,
        "n_docs": n,
        "n_positions": int(n_positions),
        "min_len": MIN_LEN,
        "sec": round(sec, 2),
        "docs_per_sec": round(n / sec, 1),
        "positions_per_sec": round(n_positions / sec, 1),
        "n_hot_grams": stats["n_hot_grams"],
        "hot_join_path": stats["hot_join_path"],
        "quote_docs": int(qd["n"]),
        "quote_docs_hit": int(qd["quote_hit"] or 0),
        "copy_docs": int(cp["n"]),
        "copy_docs_fully_removed": int(cp["full"] or 0),
        "unique_docs": int(uq["n"]),
        "unique_false_positives": int(uq["touched"] or 0),
        "busy_core_sec": round(cpu_sec, 1),
        "task_run_sec": round(run_sec, 1),
        "n_tasks": n_tasks,
    }
    release_census_caches()
    assert n_out == n, rec
    assert rec["quote_docs_hit"] == rec["quote_docs"], rec
    assert rec["copy_docs_fully_removed"] == rec["copy_docs"], rec
    assert rec["unique_false_positives"] == 0, rec
    print(json.dumps(rec))
    with open(out_path, "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
