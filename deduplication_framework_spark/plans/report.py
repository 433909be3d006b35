"""Human-readable run report (SURVEY.md O7/A3).

Reference analog: the orchestrator's end-of-run markdown report —
``/root/reference/pipelines/orchestrator.py:1478-1721`` renders per-stage
wall-times, per-modality dedup rates and output locations into a report
file. Here the same surface is derived from the PipelineResult (cluster /
keeper DataFrames + the detector metrics dict) and, when a checkpoint store
was used, the per-stage commit table (rows, partitions, lineage).
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional

from pyspark.sql import functions as F


def render_report(
    res,
    detectors: List[str],
    elapsed_sec: float,
    config_hash: str,
    store=None,
    n_docs: Optional[int] = None,
    n_keep: Optional[int] = None,
) -> str:
    """PipelineResult → markdown report string. Pass ``n_docs``/``n_keep``
    when the caller already counted them (the CLI does for summary.json) —
    recounting re-runs the keeper join."""
    n_docs = res.docs.count() if n_docs is None else n_docs
    n_keep = res.keepers.count() if n_keep is None else n_keep
    sizes = (
        res.clusters.groupBy("cluster_id")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        .agg(
            F.count("*").alias("n_clusters"),
            F.max("n").alias("max_size"),
            F.round(F.avg("n"), 2).alias("avg_size"),
            F.sum("n").alias("docs_in_clusters"),
        )
        .first()
    )
    n_dupes = n_docs - n_keep
    rate = (100.0 * n_dupes / n_docs) if n_docs else 0.0

    lines = [
        "# Dedup pipeline report",
        "",
        f"- generated: {time.strftime('%Y-%m-%d %H:%M:%S')}",
        f"- detectors: {', '.join(detectors)}",
        f"- config hash: `{config_hash[:16]}…`",
        f"- elapsed: {elapsed_sec:.1f} s",
        f"- connected-components rounds: {res.cc_rounds}",
        "",
        "## Corpus",
        "",
        "| metric | value |",
        "|---|---|",
        f"| documents in | {n_docs} |",
        f"| keepers out | {n_keep} |",
        f"| duplicates removed | {n_dupes} ({rate:.2f}%) |",
        f"| duplicate clusters (size > 1) | {sizes['n_clusters'] or 0} |",
        f"| largest cluster | {sizes['max_size'] or 0} |",
        f"| mean cluster size | {sizes['avg_size'] or 0} |",
        f"| docs inside clusters | {sizes['docs_in_clusters'] or 0} |",
    ]

    det_metrics: Dict[str, Dict[str, float]] = {}
    for k, v in sorted(res.metrics.items()):
        if "." in k:
            det, m = k.split(".", 1)
            det_metrics.setdefault(det, {})[m] = v
    if det_metrics:
        lines += ["", "## Detector metrics", "",
                  "| detector | metric | value |", "|---|---|---|"]
        for det, ms in det_metrics.items():
            for m, v in ms.items():
                val = int(v) if float(v).is_integer() else v
                lines.append(f"| {det} | {m} | {val} |")

    if store is not None:
        commits = [
            r.asDict()
            for r in store.metrics_df()
            .select("stage", "rows", "partitions", "lineage")
            .collect()
        ]
        if commits:
            lines += ["", "## Stages (checkpoint store)", "",
                      "| stage | rows | partitions | lineage |",
                      "|---|---|---|---|"]
            for c in commits:
                lines.append(
                    f"| {c['stage']} | {c['rows']} | {c['partitions']} | "
                    f"{', '.join(c['lineage'])} |"
                )

    lines.append("")
    return "\n".join(lines)
