"""Threshold-sweep harness (reference analog:
/root/reference/text/method/clean_batch_dataset.py:49-109 — dedup the corpus
at a grid of thresholds and persist each cleaned set; downstream model
training on each is the reference's quality metric, out of scope here).

Spark form: one pipeline run per θ (config-hash keeps re-runs cheap when a
store is attached; the signature stage is θ-independent and resumes), with a
summary DataFrame of dedup rates per threshold (the reference's
`README.md:26-30` dedup-rate table shape)."""

from __future__ import annotations

from dataclasses import replace
from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession

from deduplication_framework_spark.config import PipelineConfig
from deduplication_framework_spark.plans.pipeline import run_pipeline


def threshold_sweep(
    spark: SparkSession,
    pages: DataFrame,
    thresholds: Sequence[float] = (0.1, 0.3, 0.5, 0.7, 0.8, 0.9),
    detectors: List[str] = ("exact", "minhash"),
    base_cfg: Optional[PipelineConfig] = None,
    store_root: Optional[str] = None,
    keepers_out: Optional[str] = None,
) -> DataFrame:
    """→ DataFrame(threshold, n_docs, n_keepers, n_duplicates, dedup_rate).

    When ``keepers_out`` is set, each threshold's keeper set is persisted to
    ``<keepers_out>/theta=<t>`` (the reference writes one cleaned dataset
    per threshold for downstream training)."""
    base_cfg = base_cfg or PipelineConfig()
    rows = []
    n_docs = None
    for theta in thresholds:
        cfg = PipelineConfig(
            embedding=replace(base_cfg.embedding),
            dedup=replace(base_cfg.dedup, threshold=float(theta)),
            suffix=replace(base_cfg.suffix),
            spark=replace(base_cfg.spark),
        )
        store = None
        if store_root:
            from deduplication_framework_spark.plans.checkpoint import (
                ParquetTableStore,
            )

            store = ParquetTableStore(spark, f"{store_root}/theta_{theta}")
        res = run_pipeline(
            spark, pages, cfg, detectors=list(detectors), store=store,
            collect_stats=False,
        )
        if n_docs is None:
            n_docs = res.docs.count()
        n_keep = res.keepers.count()
        if keepers_out:
            res.keepers.write.mode("overwrite").parquet(
                f"{keepers_out}/theta={theta}"
            )
        rows.append(
            (
                float(theta),
                n_docs,
                n_keep,
                n_docs - n_keep,
                round((n_docs - n_keep) / n_docs, 6) if n_docs else 0.0,
            )
        )
    return spark.createDataFrame(
        rows,
        "threshold double, n_docs long, n_keepers long, n_duplicates long, "
        "dedup_rate double",
    )
