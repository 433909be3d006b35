"""Capture .explain('formatted') for round-6-touched query paths.

Usage: python tools/capture_plans_r06.py <suffix> [target ...]
Writes plans/r06/<name>_<suffix>.txt  (suffix = before|after).
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from deduplication_framework_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r06")


def dump(df, name, suffix):
    os.makedirs(OUT, exist_ok=True)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    with open(os.path.join(OUT, f"{name}_{suffix}.txt"), "w") as fh:
        fh.write(buf.getvalue())
    print(f"wrote {name}_{suffix}.txt")


def plan_ssjoin_cands(spark, suffix):
    """Candidate subplan of the bench ssjoin workload (sparse universe)."""
    import bench
    from deduplication_framework_spark.functions.text import word_bigram_sets
    from deduplication_framework_spark.operators.lsh import release_census_caches
    from deduplication_framework_spark.operators.setjoin import ssjoin_jaccard

    pages = bench.parquet_pages(spark, bench.N_PAGES, CPUS * 2)
    docs = word_bigram_sets(pages, id_col="doc_order", lowercase=True)
    edges, _ = ssjoin_jaccard(docs, threshold=0.8)
    dump(edges, "ssjoin_exact_edges", suffix)
    release_census_caches()
    spark.catalog.clearCache()


def plan_containment(spark, suffix):
    import __spark_entry__ as entry
    from deduplication_framework_spark.functions.text import word_bigram_sets
    from deduplication_framework_spark.operators.lsh import release_census_caches
    from deduplication_framework_spark.operators.setjoin import ssjoin_containment

    docs = word_bigram_sets(entry._docs(spark, SF_DIR), lowercase=False)
    edges, _ = ssjoin_containment(docs, threshold=0.8, set_col="grams")
    dump(edges, "containment_edges", suffix)
    release_census_caches()
    spark.catalog.clearCache()


def plan_cc(spark, suffix):
    """One propagate+jump round of the distributed CC loop (the chain
    workload's repeated unit — the full loop is iterative, so the plan of
    round 1 is the thing to pin)."""
    from deduplication_framework_spark.operators.connected_components import (
        connected_components,
    )

    ids = spark.range(120_000)
    edges = ids.filter((F.col("id") + 1) % 600 != 0).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    captured = {}

    def capture_ckpt(df):
        # capture the first jumped-plan (round 1) before checkpointing
        if "n" not in captured:
            captured["n"] = 0
        captured["n"] += 1
        if captured["n"] == 3:  # 1=both, 2=init labels, 3=round-1 jumped
            dump(df, "cc_round", suffix)
        return df.localCheckpoint(eager=True)

    connected_components(edges, checkpoint=capture_ckpt)


def plan_jvm(spark, suffix):
    import bench
    from deduplication_framework_spark.config import PipelineConfig
    from deduplication_framework_spark.functions.jvm_minhash import (
        jvm_minhash_features,
    )

    cfg = PipelineConfig()
    pages = bench.parquet_pages(spark, bench.N_PAGES, CPUS * 2)
    docs = pages.selectExpr("doc_order AS doc_id", "text")
    feats = jvm_minhash_features(docs, num_perm=cfg.dedup.num_perm,
                                 include_words=True)
    dump(feats, "jvm_minhash_features", suffix)


TARGETS = {
    "ssjoin": plan_ssjoin_cands,
    "containment": plan_containment,
    "cc": plan_cc,
    "jvm": plan_jvm,
}


def main():
    suffix = sys.argv[1]
    names = sys.argv[2:] or list(TARGETS)
    spark = get_spark(app_name="plans_r06", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    for n in names:
        TARGETS[n](spark, suffix)


if __name__ == "__main__":
    main()
