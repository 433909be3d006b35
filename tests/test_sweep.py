"""Threshold sweep: lower θ must dedup at least as aggressively."""

from deduplication_framework_spark.plans.sweep import threshold_sweep


def test_sweep_monotone(spark, pages):
    small = pages.limit(300)
    out = threshold_sweep(
        spark, small, thresholds=(0.5, 0.9), detectors=("exact", "minhash")
    )
    rows = {r.threshold: r for r in out.collect()}
    assert rows[0.5].n_docs == rows[0.9].n_docs == 300
    # θ=0.5 accepts everything θ=0.9 accepts (superset of verified pairs)
    assert rows[0.5].n_keepers <= rows[0.9].n_keepers
    assert rows[0.5].n_duplicates >= 1
    for r in rows.values():
        assert abs(r.dedup_rate - r.n_duplicates / r.n_docs) < 1e-5
