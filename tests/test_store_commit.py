"""ParquetTableStore commit-protocol invariants (the Iceberg-contract
stand-in — VERDICT round 1, Next round #9): a crash at ANY point of the
write protocol must leave either the old committed stage or the new one,
never a torn state the resume logic would trust.

Protocol under test (plans/checkpoint.py): write to ``<name>.tmp-<nonce>``
→ atomic ``os.rename`` into place → write ``_commit.json`` via temp +
``os.replace``. ``is_valid`` requires BOTH the data dir and a matching
commit record, so each crash window degrades to "stage not committed"."""

import json
import os
import shutil

from pyspark.sql import functions as F

from deduplication_framework_spark.plans.checkpoint import ParquetTableStore


def _df(spark, n=20, tag=0):
    return spark.range(n).select(
        F.col("id"), (F.col("id") * 10 + tag).alias("v")
    )


def test_crash_before_rename_leaves_no_commit(spark, tmp_path):
    """Crash mid-data-write: a stray .tmp dir exists, no final dir, no
    commit record → is_valid False; a re-run commits cleanly."""
    root = str(tmp_path / "s1")
    store = ParquetTableStore(spark, root)
    # simulate the torn state the tmp-write crash leaves behind
    _df(spark, 5).write.parquet(os.path.join(root, "stage_a.tmp-deadbeef"))
    assert store.read_commit("stage_a") is None
    assert not store.is_valid("stage_a", "h1")

    out = store.write(_df(spark, 20), "stage_a", "h1", lineage=["src"])
    assert out.count() == 20
    assert store.is_valid("stage_a", "h1")


def test_crash_between_rename_and_commit_json(spark, tmp_path):
    """Data dir renamed into place but the commit record never landed →
    is_valid False (no torn read); recommit overwrites the orphan data."""
    root = str(tmp_path / "s2")
    store = ParquetTableStore(spark, root)
    store.write(_df(spark, 20, tag=1), "stage_b", "h1")
    os.remove(os.path.join(root, "stage_b._commit.json"))

    assert store.read_commit("stage_b") is None
    assert not store.is_valid("stage_b", "h1")

    out = store.write(_df(spark, 30, tag=2), "stage_b", "h1")
    assert out.count() == 30
    c = store.read_commit("stage_b")
    assert c is not None and c.rows == 30


def test_commit_json_without_data_is_invalid(spark, tmp_path):
    """Inverse torn state (data dir lost, record present — e.g. manual
    cleanup): is_valid must be False, not an unreadable-read trap."""
    root = str(tmp_path / "s3")
    store = ParquetTableStore(spark, root)
    store.write(_df(spark, 10), "stage_c", "h1")
    shutil.rmtree(os.path.join(root, "stage_c"))
    assert store.read_commit("stage_c") is None
    assert not store.is_valid("stage_c", "h1")


def test_recommit_same_stage_is_atomic_for_readers(spark, tmp_path):
    """Re-committing a stage under a NEW config hash replaces data and
    record together; a reader afterwards sees only the new version."""
    root = str(tmp_path / "s4")
    store = ParquetTableStore(spark, root)
    store.write(_df(spark, 10, tag=1), "stage_d", "h1")
    store.write(_df(spark, 40, tag=2), "stage_d", "h2")
    assert not store.is_valid("stage_d", "h1")
    assert store.is_valid("stage_d", "h2")
    assert store.read("stage_d").count() == 40
    # commit metadata agrees with the data on disk
    c = store.read_commit("stage_d")
    assert c.rows == 40 and sum(c.partition_rows) == 40


def test_cc_rounds_checkpoint_through_store(spark, pages, tmp_path):
    """Forcing the distributed CC loop (driver_threshold=0) with a store
    attached must route per-round state through store commits and still
    produce the same keepers as the driver union-find fast path."""
    from deduplication_framework_spark.config import PipelineConfig
    from deduplication_framework_spark.plans.pipeline import run_pipeline

    small = pages.limit(200)
    cfg = PipelineConfig()
    cfg.spark.cc_broadcast_threshold = 0  # force the distributed loop
    root = str(tmp_path / "ccstore")
    store = ParquetTableStore(spark, root)
    res = run_pipeline(
        spark, small, cfg, detectors=["exact", "minhash"], store=store
    )
    k_dist = sorted(r.doc_id for r in res.keepers.collect())
    assert res.cc_rounds >= 1
    cc_commits = [
        c for c in (store.read_commit(f"cc_state_{i}") for i in range(1, 20))
        if c is not None
    ]
    assert cc_commits, "no cc_state_* commits recorded"

    cfg2 = PipelineConfig()  # default threshold → driver union-find
    res2 = run_pipeline(spark, small, cfg2, detectors=["exact", "minhash"])
    assert sorted(r.doc_id for r in res2.keepers.collect()) == k_dist


def test_corrupt_commit_json_fails_closed(spark, tmp_path):
    """A truncated/garbage commit record must read as 'not committed'
    rather than raising into the pipeline."""
    root = str(tmp_path / "s5")
    store = ParquetTableStore(spark, root)
    store.write(_df(spark, 10), "stage_e", "h1")
    with open(os.path.join(root, "stage_e._commit.json"), "w") as fh:
        fh.write('{"stage": "stage_e", "config_hash"')  # torn write
    assert store.read_commit("stage_e") is None
    assert not store.is_valid("stage_e", "h1")
