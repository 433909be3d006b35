"""CLI smoke: in-process main() over a small synthetic corpus must write
keepers/clusters/edges, summary.json, and the O7 markdown report."""

import json
import os

from deduplication_framework_spark.__main__ import main


def test_cli_end_to_end_with_report(spark, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    rc = main(
        [
            "--synthetic", "200",
            "--output", out,
            "--detectors", "exact,minhash",
            "--checkpoint-dir", ckpt,
        ]
    )
    assert rc == 0
    with open(os.path.join(out, "summary.json")) as fh:
        summary = json.load(fh)
    assert summary["docs"] == 200
    assert 0 < summary["keepers"] <= 200

    with open(os.path.join(out, "report.md")) as fh:
        report = fh.read()
    assert "# Dedup pipeline report" in report
    assert "| documents in | 200 |" in report
    assert "## Detector metrics" in report
    assert "## Stages (checkpoint store)" in report
    assert "edges_minhash" in report
