"""Leakage-safe train/validation split — cluster-coherent assignment.

A plain per-doc hash split leaks: near-duplicate pairs straddle the
train/val boundary, so validation loss measures memorization of the
training copy (the failure GPT-3's appendix C and every dedup paper
warn about). The safe unit of assignment is the DUPLICATE GROUP: hash
the group's representative, and every member follows it to the same
side — no (near-)duplicate pair can ever cross the boundary.

Mechanics (all deterministic, both engines agree byte-for-byte):

* grouping: pass any ``(doc_id, cluster_id)`` frame — exact-text
  groups, MinHash/Jaccard clusters, tiered results; docs missing from
  it form singleton groups (their own id);
* side: ``md5(f"{cluster_id}:{salt}")[:8] < hex(val_frac * 2^32)`` →
  ``val`` else ``train`` — the fixed-width-hex threshold compare from
  ``loaders.stratified_sample`` (string order == numeric order, no
  float skew between engines);
* a group's side depends only on its own label, so the split is stable
  under corpus growth and repartitioning; VAL FRACTION is measured in
  GROUPS, and holds in docs when duplicates are few (report both —
  ``split_stats``).

Scale posture (100 TB): one left join onto the cluster frame (the only
shuffle; broadcast when the cluster frame is small) + pure map-side
hash/compare. No window, no global ordering.

Reference scope: the reference engine stops at keeper selection; this
is part of the "operations a large-scale training-data pipeline needs"
surface (siblings: loaders.stratified_sample, operators/decontaminate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deduplication_framework_spark.sources.loaders import (
    _rate_hex_threshold,
    md5_bucket_col,
)

__all__ = ["leakage_safe_split", "split_stats"]

DEFAULT_SALT = "split-v1"


def leakage_safe_split(
    docs: DataFrame,
    clusters: DataFrame | None = None,
    *,
    id_col: str = "doc_id",
    val_frac: float = 0.1,
    salt: str = DEFAULT_SALT,
) -> DataFrame:
    """``(doc_id, group_id, split_bucket, split)`` — every doc assigned
    ``train``/``val`` by its GROUP (module docstring). ``clusters`` is
    any ``(doc_id, cluster_id)`` frame (e.g. ``clusters_from_edges``
    output); ``None`` means every doc is its own group — the plain hash
    split, exposed so callers can A/B the leakage. ``split_bucket`` is
    the 8-hex-char decision bucket (auditable by oracles)."""
    d = docs.select(F.col(id_col).alias("doc_id"))
    if clusters is None:
        g = d.withColumn("group_id", F.col("doc_id"))
    else:
        c = clusters.select(
            F.col(id_col).alias("doc_id"),
            F.col("cluster_id").alias("group_id"),
        )
        g = d.join(c, "doc_id", "left").withColumn(
            "group_id", F.coalesce("group_id", "doc_id")
        )
    bucket = md5_bucket_col("group_id", salt)
    thr = _rate_hex_threshold(val_frac)
    return g.select(
        "doc_id",
        "group_id",
        bucket.alias("split_bucket"),
        F.when(bucket < F.lit(thr), F.lit("val"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


def split_stats(assigned: DataFrame) -> DataFrame:
    """Per-side group/doc counts — the val fraction is exact in groups
    by construction; this makes the doc-level fraction observable."""
    return (
        assigned.groupBy("split")
        .agg(
            F.countDistinct("group_id").alias("n_groups"),
            F.count("*").alias("n_docs"),
        )
        .orderBy("split")
    )
