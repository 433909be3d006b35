"""One (cores, n_docs) scaling measurement, appended as a JSON line to a
runs file — lets the interleaved N/4N protocol (BENCH/BASELINE.md) run as
separate processes so a single host-supply dip can't kill the whole sweep.

Usage: python tools/scale_once.py <cores> <n_docs> [runs_file]
"""

import json
import sys
import time

sys.path.insert(0, ".")

import bench
from deduplication_framework_spark.config import PipelineConfig
from deduplication_framework_spark.plans.pipeline import run_pipeline
from deduplication_framework_spark.session import get_spark


def main():
    cores = int(sys.argv[1])
    n = int(sys.argv[2])
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/scale_runs.jsonl"
    supply = bench._effective_cores()
    spark = get_spark(
        app_name=f"scale-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores,
    )
    pages = bench.materialized_pages(spark, n, cores * 2)
    t0 = time.time()
    res = run_pipeline(
        spark, pages, PipelineConfig(), detectors=["exact", "minhash"],
        collect_stats=False,
    )
    nk = res.keepers.count()
    sec = time.time() - t0
    rec = {
        "cores": cores,
        "n_docs": n,
        "sec": round(sec, 2),
        "docs_per_sec": round(n / sec, 1),
        "keepers": nk,
        "host_effective_cores_before": supply,
        "ts": time.strftime("%H:%M:%S"),
    }
    with open(out, "a") as fh:
        fh.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))
    spark.stop()


if __name__ == "__main__":
    main()
