"""Fuzzy-recrawl scale anchor: Bloom-prefiltered NEAR-dup dedup of a
synthetic batch against a multi-hundred-k-doc historical corpus
(operators/incremental_fuzzy.py at headroom scale — the daily-recrawl
posture where history features are computed ONCE and amortized).

Corpus: texts are generated JVM-SIDE (md5-derived word soup per id), so
the anchor measures the operator + Arrow featurization, not a Python data
generator. The batch is recrawl-shaped: j % 3 == 0 re-crawls history doc
(j*7 % n_old) byte-identically, j % 3 == 1 re-crawls it with a one-token
edit (raw-feature J ~ 0.9, a true near-dup), the rest is fresh content
(hex word soup: cross-doc raw J ~ 0.02, far below the 0.8 threshold).

Three timed phases per leg:
* index build — featurize history (fused Arrow UDF, kr32 throughput
  family), explode its band table, build the Bloom over the band keys.
  Per-corpus, amortized across every subsequent batch
  (``index_build_sec``);
* first batch — incremental_near_new_rows with features + bands + Bloom
  all injected, JIT/Arrow first-use cold (``first_batch_sec``);
* warm batch — the same call again, the steady state
  (``warm_batch_sec``): per-batch cost is featurizing the BATCH,
  map-side Bloom routing, the hit-key semi-join over the STORED band
  table, and the per-pair verify join — history is never re-featurized
  or re-exploded (the ``old_bands`` stored-index path, exercised here
  at scale, parity-pinned in tests/test_incremental_fuzzy.py).

Hard assertions (the bench discipline: a regression fails the tool):
* every byte-identical recrawl id is removed — exact copies share every
  band, Bloom filters have no false negatives, and they verify at J=1,
  so this is a guarantee, not a probability;
* near-dup (one-token-edit) recall >= 0.99 — the north rule's bar; the
  LSH S-curve at J ~ 0.9 sits far above it at (b, r) for threshold 0.8;
* every fresh id is kept (verification rejects any Bloom/band collision).

Usage: python tools/scale_fuzzy.py <cores> <n_old> <n_new> [runs_file]
Run at two core counts (2 and 8: both legs fit the host's ~25 effective
cores) for the N -> 4N scaling pair; BLAS pinned single-thread below so
the 2-core leg is honestly 2 cores.
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
from tools.scale_bloom import _text_expr
from tools.scale_once import _task_metrics


def main():
    from pyspark.sql import functions as F

    from deduplication_framework_spark.config import PipelineConfig
    from deduplication_framework_spark.operators.incremental_fuzzy import (
        _featurize,
        incremental_near_new_rows,
    )
    from deduplication_framework_spark.operators.lsh import (
        release_census_caches,
    )

    cores = int(sys.argv[1])
    n_old = int(sys.argv[2])
    n_new = int(sys.argv[3])
    out = sys.argv[4] if len(sys.argv) > 4 else "/tmp/scale_fuzzy_runs.jsonl"

    cfg = PipelineConfig()
    cfg.dedup.hash_family = "kr32"  # the 100-TB throughput path

    supply = bench._effective_cores()
    evdir = tempfile.mkdtemp(prefix="spark-events-")
    spark = get_spark(
        app_name=f"scale-fuzzy-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=max(cores * 2, 16),
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{evdir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )

    # corpus materialized to parquet OUTSIDE the timed window
    corpus_dir = tempfile.mkdtemp(prefix="scale-fuzzy-corpus-")
    spark.range(n_old, numPartitions=cores * 2).select(
        F.col("id").alias("doc_id"), _text_expr(F.col("id")).alias("text")
    ).write.mode("overwrite").parquet(f"{corpus_dir}/old")
    j = F.col("id")
    hist = _text_expr((j * 7) % n_old)
    spark.range(n_new, numPartitions=cores * 2).select(
        (j + 10_000_000_000).alias("doc_id"),
        F.when(j % 3 == 0, hist)
        .when(j % 3 == 1, F.concat(hist, F.lit(" editedtail")))
        .otherwise(_text_expr(j + 20_000_000_000))
        .alias("text"),
    ).write.mode("overwrite").parquet(f"{corpus_dir}/new")
    old = spark.read.parquet(f"{corpus_dir}/old")
    new = spark.read.parquet(f"{corpus_dir}/new")

    # phase 1: index build (amortized per-corpus cost): features + band
    # table + Bloom. old_features'/old_bands' contract names the id
    # column id_col (= doc_id here); _featurize emits "_id"
    from deduplication_framework_spark.functions import kernels as K
    from deduplication_framework_spark.operators.bloom import bloom_build
    from deduplication_framework_spark.operators.lsh import minhash_bands

    b, r = K.optimal_band_param(cfg.dedup.threshold, cfg.dedup.num_perm)
    t0 = time.time()
    old_feats = (
        _featurize(old, cfg, "doc_id", "text")
        .withColumnRenamed("_id", "doc_id")
        .persist()
    )
    old_feats.count()
    band_table = (
        minhash_bands(
            old_feats.select(F.col("doc_id").alias("_id"), "sig"),
            b,
            r,
            id_col="_id",
        )
        .select(F.col("_id").alias("doc_id"), "band_key")
        .persist()
    )
    n_band_rows = band_table.count()
    bloom = bloom_build(
        band_table, F.col("band_key"), expected_items=n_band_rows, fpp=1e-3
    )
    t1 = time.time()

    # phase 2: first batch, stored index injected (JIT/Arrow cold)
    res1, stats1 = incremental_near_new_rows(
        new, old, cfg,
        old_features=old_feats, old_bands=band_table, bloom=bloom,
    )
    n_res_cold = res1.count()
    t2a = time.time()

    # phase 3: warm steady-state batch — the same stored-index call
    release_census_caches()
    t2 = time.time()
    res2, stats2 = incremental_near_new_rows(
        new, old, cfg,
        old_features=old_feats, old_bands=band_table, bloom=bloom,
    )
    res2 = res2.persist()  # count (timed) + correctness collect (untimed)
    n_res_warm = res2.count()
    t3 = time.time()
    kept = {r.doc_id for r in res2.select("doc_id").collect()}

    assert n_res_cold == n_res_warm, "index reuse changed the answer"
    exact_ids = {10_000_000_000 + i for i in range(0, n_new, 3)}
    near_ids = {10_000_000_000 + i for i in range(1, n_new, 3)}
    fresh_ids = {10_000_000_000 + i for i in range(2, n_new, 3)}
    # the exact-catch guarantee's precondition: no capped history bucket
    # (old_bucket_cap is documented-lossy with accounting)
    assert stats2["n_capped_band_keys"] == 0, stats2
    missed_exact = exact_ids & kept
    assert not missed_exact, (
        f"exact recrawl copies survived: {sorted(missed_exact)[:5]}"
    )
    near_recall = 1.0 - len(near_ids & kept) / max(len(near_ids), 1)
    assert near_recall >= 0.99, f"near-dup recall {near_recall} < 0.99"
    dropped_fresh = fresh_ids - kept
    assert not dropped_fresh, (
        f"fresh docs wrongly removed: {sorted(dropped_fresh)[:5]}"
    )

    spark.stop()
    import shutil

    shutil.rmtree(corpus_dir, ignore_errors=True)

    index_sec = t1 - t0
    first_sec = t2a - t1
    warm_sec = t3 - t2
    cpu_sec, run_sec, n_tasks = _task_metrics(evdir, t2 * 1000, t3 * 1000)
    shutil.rmtree(evdir, ignore_errors=True)
    rec = {
        "cores": cores,
        "n_old": n_old,
        "n_new": n_new,
        "b": stats2["b"],
        "r": stats2["r"],
        "m_bits": stats2["m_bits"],
        "index_build_sec": round(index_sec, 2),
        "index_docs_per_sec": round(n_old / index_sec, 1),
        "first_batch_sec": round(first_sec, 2),
        "warm_batch_sec": round(warm_sec, 2),
        "warm_batch_docs_per_sec": round(n_new / warm_sec, 1),
        "n_new_result": n_res_warm,
        "n_definite_new": stats2["n_definite_new"],
        "n_candidate_pairs": stats2.get("n_candidate_pairs", 0),
        "n_dup_docs": stats2.get("n_dup_docs", 0),
        "near_dup_recall": round(near_recall, 5),
        "max_old_bucket": stats2["max_old_bucket"],
        "n_capped_band_keys": stats2["n_capped_band_keys"],
        "verify_path": stats2["verify_path"],
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
