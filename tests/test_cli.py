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


def test_cli_sweep(spark, tmp_path):
    out = str(tmp_path / "sweep_out")
    rc = main(
        [
            "--synthetic", "150",
            "--output", out,
            "--detectors", "exact,minhash",
            "--sweep", "0.5,0.9",
        ]
    )
    assert rc == 0
    with open(os.path.join(out, "sweep.json")) as fh:
        rows = json.load(fh)
    by_theta = {r["threshold"]: r for r in rows}
    assert set(by_theta) == {0.5, 0.9}
    for r in rows:
        assert r["n_docs"] == 150
        assert r["n_keepers"] + r["n_duplicates"] == 150
    assert by_theta[0.5]["n_keepers"] <= by_theta[0.9]["n_keepers"]
    # one persisted keeper set per theta
    assert os.path.isdir(os.path.join(out, "sweep_keepers", "theta=0.5"))
    assert os.path.isdir(os.path.join(out, "sweep_keepers", "theta=0.9"))
