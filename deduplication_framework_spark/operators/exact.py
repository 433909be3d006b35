"""Exact duplicate removal (SURVEY.md P7/P8/S14).

Reference semantics:
* md5-of-normalized-text first-seen-wins — ``pipeline_api.py:340-370``;
* hash-of-raw-bytes first-seen keeper — ``pipelines/modalities/common.py:88-175``
  (sha1 of file bytes);
* hash prefilter before near-dup — ``clean_the_dataset.py:107-109``.

Spark form: hash → groupBy → keeper = min(doc_order). One shuffle, map-side
partial aggregation for the group counts. ``xxhash64`` is the fast 64-bit
prefilter option; at 10^10+ distinct docs its birthday-collision
expectation becomes real (a collision silently welds two unrelated texts),
so the pipeline's stage-1 dedup uses ``md5`` (128-bit, also byte-parity
with the reference's reported hashes).
"""

from __future__ import annotations

from typing import Tuple

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    order_col: str = None,
    hash_fn: str = "xxhash64",
) -> Tuple[DataFrame, DataFrame]:
    """→ (keepers_df, exact_edges).

    keepers_df: input rows minus exact duplicates (keeper = min order per
    hash group). exact_edges(src, dst, sim=1.0): keeper → each dropped copy,
    so exact groups merge into the same final clusters as near-dup edges.
    """
    order_col = order_col or id_col
    if hash_fn == "md5":
        h = F.md5(F.col(text_col))
    elif hash_fn == "sha1":
        h = F.sha1(F.col(text_col))
    else:
        h = F.xxhash64(F.col(text_col))

    hashed = docs.withColumn("_h", h)
    w = Window.partitionBy("_h").orderBy(F.col(order_col))
    ranked = hashed.withColumn("_keep_id", F.first(id_col).over(w)).withColumn(
        "_rn", F.row_number().over(w)
    )
    keepers = ranked.filter(F.col("_rn") == 1).drop("_h", "_rn", "_keep_id")
    edges = (
        ranked.filter(F.col("_rn") > 1)
        .select(
            F.col("_keep_id").alias("src"),
            F.col(id_col).alias("dst"),
            F.lit(1.0).alias("sim"),
        )
    )
    return keepers, edges
