"""Threshold sweep: lower θ must dedup at least as aggressively; the
downstream-eval proxy (reference classification_comparison.py:191-340
analog) must produce the θ→metric table."""

from pyspark.sql import functions as F

from deduplication_framework_spark.plans.sweep import threshold_sweep


def test_sweep_downstream_eval(spark, pages):
    small = pages.limit(400)
    out = threshold_sweep(
        spark,
        small,
        thresholds=(0.5, 0.9),
        detectors=("exact", "minhash"),
        evaluate=True,
    )
    rows = {r.threshold: r for r in out.collect()}
    assert set(out.columns) >= {
        "threshold", "dedup_rate", "probe_accuracy", "vocab_size",
        "label_tv_shift",
    }
    # probe must at least match the majority-class baseline on the held-out
    # slice (zh rows are trivially separable from the latin vocab, so a
    # functioning probe clears it)
    eval_docs = small.filter(F.col("doc_order") % 5 == 0)
    n_eval = eval_docs.count()
    majority = (
        eval_docs.groupBy("lang").count().agg(F.max("count")).first()[0]
    )
    for r in rows.values():
        assert r.probe_accuracy >= majority / n_eval - 1e-9
        assert r.vocab_size > 0
        assert 0.0 <= r.label_tv_shift <= 1.0
    # more aggressive dedup (lower θ) never enlarges the vocabulary
    assert rows[0.5].vocab_size <= rows[0.9].vocab_size


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
