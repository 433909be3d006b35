"""One (cores, n_docs) scaling measurement, appended as a JSON line to a
runs file — lets the interleaved N/4N protocol (BENCH/BASELINE.md) run as
separate processes so a single host-supply dip can't kill the whole sweep.

Usage: python tools/scale_once.py <cores> <n_docs> [runs_file] [--kr32]
       [--detectors=exact,minhash]

``--kr32`` switches the feature-hash family to the vectorized Karp-Rabin/
crc32 kernel (the 100-TB throughput path) — used by the corpus-size
headroom anchors in BENCH/BASELINE.md.
"""

import glob
import json
import sys
import tempfile
import time

sys.path.insert(0, ".")

import bench
from deduplication_framework_spark.config import PipelineConfig
from deduplication_framework_spark.plans.pipeline import run_pipeline
from deduplication_framework_spark.session import get_spark


def _task_metrics(evdir: str, t0_ms: float, t1_ms: float):
    """Sum executor run/CPU time over tasks that FINISHED inside the
    measured window — wall-clock-noise-immune scaling evidence (total task
    seconds ≈ constant across parallelism levels; busy-cores = run/wall)."""
    cpu_ns = 0
    run_ms = 0
    n_tasks = 0
    # Spark 4 writes an eventlog_v2_<app> DIRECTORY of rolling files
    import os

    files = [
        p
        for p in glob.glob(evdir + "/**", recursive=True)
        if os.path.isfile(p) and "appstatus" not in os.path.basename(p)
    ]
    for f in files:
        with open(f) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except ValueError:
                    continue
                if ev.get("Event") != "SparkListenerTaskEnd":
                    continue
                info = ev.get("Task Info") or {}
                if not (t0_ms <= info.get("Finish Time", 0) <= t1_ms):
                    continue
                m = ev.get("Task Metrics") or {}
                cpu_ns += m.get("Executor CPU Time", 0)
                run_ms += m.get("Executor Run Time", 0)
                n_tasks += 1
    return cpu_ns / 1e9, run_ms / 1e3, n_tasks


def main():
    detectors = ["exact", "minhash"]
    args = []
    kr32 = False
    for a in sys.argv[1:]:
        if a == "--kr32":
            kr32 = True
        elif a.startswith("--detectors="):
            detectors = a.split("=", 1)[1].split(",")
        else:
            args.append(a)
    cores = int(args[0])
    n = int(args[1])
    out = args[2] if len(args) > 2 else "/tmp/scale_runs.jsonl"
    supply = bench._effective_cores()
    evdir = tempfile.mkdtemp(prefix="spark-events-")
    spark = get_spark(
        app_name=f"scale-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{evdir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    pages = bench.materialized_pages(spark, n, cores * 2)
    cfg = PipelineConfig()
    if kr32:
        cfg.dedup.hash_family = "kr32"
    t0 = time.time()
    res = run_pipeline(
        spark, pages, cfg, detectors=detectors,
        collect_stats=False,
    )
    nk = res.keepers.count()
    t1 = time.time()
    sec = t1 - t0
    spark.stop()  # flush the event log
    cpu_sec, run_sec, n_tasks = _task_metrics(evdir, t0 * 1000, t1 * 1000)
    rec = {
        "cores": cores,
        "n_docs": n,
        "hash_family": "kr32" if kr32 else "sha1",
        "detectors": detectors,
        "sec": round(sec, 2),
        "docs_per_sec": round(n / sec, 1),
        "keepers": nk,
        "task_run_sec": round(run_sec, 1),
        "task_cpu_sec": round(cpu_sec, 1),
        "busy_cores": round(run_sec / sec, 2),
        "n_tasks": n_tasks,
        "host_effective_cores_before": supply,
        "ts": time.strftime("%H:%M:%S"),
    }
    with open(out, "a") as fh:
        fh.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
