"""spark-submit --py-files scaling anchor — the north rule's ship shape
measured AT TWO CLUSTER SIZES: the packaged CLI pipeline (zip-only
package resolution enforced by tools/submit_smoke.py) run under real
``spark-submit --master local[2]`` and ``local[8]`` over the SAME
deterministic synthetic corpus, reporting throughput at both plus the
N→4N scaling efficiency. The in-process anchors (scale_jvm_pipeline,
bench --scaling) measure the same criterion without the submit wire;
this one removes the last gap between the evidence and the rule's
wording ("run via spark-submit --py-files ... at two cluster sizes").

Per-leg record: the CLI summary's ``elapsed_sec`` (run_pipeline +
keeper/cluster/edge sink writes; JVM startup, corpus synthesis action
and the recall oracle sit OUTSIDE that window) + whole-app event-log
task CPU/run seconds (scheduler-truth secondary signal; includes the
untimed setup jobs, identical work in every leg).

Hard assertions:
  * one recall leg (local[8], small corpus, ``--eval-recall``):
    pipeline dup-pair recall vs the capped-space J>=0.95 oracle >= 0.99
    (BASELINE.json's criterion, on the real submit wire);
  * keepers count IDENTICAL across every leg and rep — the answer must
    not depend on the parallelism level;
  * per interleaved pair: efficiency = wall2 / (4 * wall8).

Usage: python tools/scale_submit.py [n_docs] [pairs] [runs_file]
Defaults: 100000 docs, 2 interleaved (2,8) pairs, appends to
BENCH/scale_submit_runs.jsonl. Corpus is the CLI's own ``--synthetic``
generator (sources/pages.py generate_pages — mapInPandas from the row
index, identical bytes at any partitioning). hash_family=kr32 via a
temp --config yaml (the per-core-throughput family; the jvm family's
submit behavior is covered by the in-process anchor + test_cli).
"""

import glob
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from tools.scale_once import _task_metrics  # noqa: E402

SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def run_leg(cores: int, n_docs: int, cfg_yaml: str, zip_path: str,
            eval_recall: bool = False) -> dict:
    tmp = tempfile.mkdtemp(prefix=f"scale-submit-{cores}-")
    evdir = os.path.join(tmp, "events")
    os.makedirs(evdir)
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cores),
        SPARK_DRIVER_MEM="8g",
        OMP_NUM_THREADS="1",
        OPENBLAS_NUM_THREADS="1",
        MKL_NUM_THREADS="1",
    )
    cmd = [
        SUBMIT,
        "--master", f"local[{cores}]",
        "--driver-memory", "8g",
        "--conf", "spark.eventLog.enabled=true",
        "--conf", f"spark.eventLog.dir=file://{evdir}",
        "--conf", "spark.eventLog.compress=false",
        "--conf", "spark.eventLog.rolling.enabled=false",
        "--py-files", zip_path,
        os.path.join(ROOT, "tools", "submit_smoke.py"),
        "--synthetic", str(n_docs),
        "--output", os.path.join(tmp, "out"),
        "--detectors", "exact,minhash",
        "--config", cfg_yaml,
    ]
    if eval_recall:
        cmd.append("--eval-recall")
    t0 = time.time()
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=1800,
                       env=env, cwd=ROOT)
    wall_total = time.time() - t0
    if r.returncode != 0:
        raise RuntimeError(
            f"submit leg local[{cores}] failed:\n{r.stderr[-4000:]}"
        )
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    cpu_s, run_s, n_tasks = _task_metrics(evdir, 0, 1e15)
    leg = {
        "cores": cores,
        "n_docs": n_docs,
        "pipeline_sec": summary["elapsed_sec"],
        "docs_per_sec": round(n_docs / summary["elapsed_sec"], 1),
        "submit_wall_sec": round(wall_total, 1),
        "keepers": summary["keepers"],
        "cc_rounds": summary["cc_rounds"],
        "app_task_cpu_sec": round(cpu_s, 1),
        "app_task_run_sec": round(run_s, 1),
        "n_tasks": n_tasks,
        "metrics": {
            k: v for k, v in summary["metrics"].items() if "recall" in k
        },
    }
    shutil.rmtree(tmp, ignore_errors=True)
    return leg


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    out = (
        sys.argv[3]
        if len(sys.argv) > 3
        else os.path.join(ROOT, "BENCH", "scale_submit_runs.jsonl")
    )

    # fresh zip, always (test_package freshness lesson)
    subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "make_package.py")],
        check=True, cwd=ROOT,
    )
    zip_path = os.path.join(ROOT, "dist", "deduplication_framework_spark.zip")

    with tempfile.NamedTemporaryFile(
        "w", suffix=".yaml", prefix="scale-submit-cfg-", delete=False
    ) as fh:
        fh.write("dedup:\n  hash_family: kr32\n")
        cfg_yaml = fh.name

    # ---- recall leg: the >=0.99 criterion on the real submit wire ----
    # 3000 docs: the shared J>=0.95 oracle is all-pairs driver Python
    # (4.5M pair set-intersections, untimed but not free)
    recall_leg = run_leg(8, 3000, cfg_yaml, zip_path, eval_recall=True)
    rkey = [k for k in recall_leg["metrics"] if k.startswith("minhash.recall")]
    assert rkey, f"no recall metric in summary: {recall_leg}"
    recall = recall_leg["metrics"][rkey[0]]
    assert recall >= 0.99, f"submit-wire recall {recall} < 0.99: {recall_leg}"

    # ---- interleaved scaling legs ----
    legs = []
    for _ in range(pairs):
        for cores in (2, 8):
            leg = run_leg(cores, n_docs, cfg_yaml, zip_path)
            legs.append(leg)
            print(json.dumps(leg))
    keeper_counts = {leg["keepers"] for leg in legs}
    assert len(keeper_counts) == 1, (
        f"keepers differ across parallelism levels: {keeper_counts}"
    )

    best = {
        c: min(leg["pipeline_sec"] for leg in legs if leg["cores"] == c)
        for c in (2, 8)
    }
    eff_pairs = [
        round(legs[2 * i]["pipeline_sec"] / (4 * legs[2 * i + 1]["pipeline_sec"]), 3)
        for i in range(pairs)
    ]
    rec = {
        "anchor": "spark_submit_pipeline",
        "n_docs": n_docs,
        "hash_family": "kr32",
        "recall_leg": recall_leg,
        "legs": legs,
        "best_wall": best,
        "best_docs_per_sec": {c: round(n_docs / s, 1) for c, s in best.items()},
        "efficiency_2_to_8_per_pair": eff_pairs,
        "efficiency_2_to_8_best": round(best[2] / (4 * best[8]), 3),
    }
    print(json.dumps(rec))
    with open(out, "a") as f:
        f.write(json.dumps(rec) + "\n")
    os.unlink(cfg_yaml)


if __name__ == "__main__":
    main()
