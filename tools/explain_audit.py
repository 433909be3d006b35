"""Physical-plan audit: capture .explain("formatted") for the headline
queries and assert the scale properties that small-sf correctness tests
cannot see — filter pushdown into the parquet scan, column pruning,
broadcast dim joins, and the absence of BroadcastNestedLoopJoin /
CartesianProduct. Writes BENCH/PLANS.md.

Usage: python tools/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import contextlib
import io
import re
import sys

sys.path.insert(0, ".")

import __spark_entry__ as entrymod
from deduplication_framework_spark.session import get_spark


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# (query, [(check_name, predicate)]) — predicate over the plan string
def _has(pat):
    return lambda p: re.search(pat, p) is not None


def _not(pat):
    return lambda p: re.search(pat, p) is None


AUDITS = [
    (
        "lineitem_pricing_summary",
        [
            ("filter pushed to parquet scan", _has(r"PushedFilters: \[.*l_shipdate")),
            ("column-pruned ReadSchema (no full row)", _not(r"ReadSchema:.*l_comment")),
            ("partial aggregation (map-side combine)", _has(r"HashAggregate")),
            ("no nested-loop join", _not(r"BroadcastNestedLoopJoin|CartesianProduct")),
        ],
    ),
    (
        "orders_per_customer_nation",
        [
            ("dim join is broadcast", _has(r"BroadcastHashJoin")),
            ("no nested-loop join", _not(r"BroadcastNestedLoopJoin|CartesianProduct")),
        ],
    ),
    (
        "length_band_candidates",
        [
            ("log2-bucket equi-join (hash join, not O(N^2) BNLJ)",
             _not(r"BroadcastNestedLoopJoin|CartesianProduct")),
            ("only 2 columns scanned", _not(r"ReadSchema:.*text")),
        ],
    ),
    (
        "ngram_jaccard_edges",
        [
            ("log2-bucket equi-join (hash join, not O(N^2) BNLJ)",
             _not(r"BroadcastNestedLoopJoin|CartesianProduct")),
            # round-4 part 9c: pair verification moved to the sorted-merge
            # ARROW UDF on purpose (~30x vs array_intersect); the pin is
            # now "no row-at-a-time Python", not "no Python at all"
            ("no row-at-a-time Python UDF (Arrow verify allowed)",
             _not(r"BatchEvalPython")),
            ("pair stage AQE-coalesce-proof (REPARTITION_BY_NUM)",
             _has(r"REPARTITION_BY_NUM|Exchange RoundRobinPartitioning|Exchange hashpartitioning")),
        ],
    ),
    (
        "cosine_neighbor_counts",
        [
            ("GEMM mapInPandas (no pairwise join at all)",
             _not(r"BroadcastNestedLoopJoin|CartesianProduct|SortMergeJoin")),
            ("Arrow eval present", _has(r"MapInPandas|ArrowEval")),
        ],
    ),
    (
        "exact_dup_groups",
        [
            ("single hash-aggregate shuffle", _has(r"HashAggregate")),
            ("only doc_id+text scanned", _not(r"ReadSchema:.*lang")),
        ],
    ),
    (
        "top_events_per_user",
        [
            ("window partitioned by user (no SinglePartition)",
             _not(r"Exchange SinglePartition")),
        ],
    ),
    (
        "sequence_packing",
        [
            ("exactly one Exchange (hash on shard), no global sort",
             lambda p: p.split("\n\n")[0].count("Exchange") == 1),
            ("window is shard-partitioned (no SinglePartition)",
             _not(r"Exchange SinglePartition")),
            ("pure column expressions (no Python UDF)",
             _not(r"BatchEvalPython|ArrowEvalPython|MapInPandas")),
        ],
    ),
    (
        "dsir_importance_weights",
        [
            ("broadcast term join (1024-row model side)",
             _has(r"BroadcastHashJoin")),
            ("partial per-doc aggregation", _has(r"HashAggregate")),
            ("no nested-loop join", _not(r"BroadcastNestedLoopJoin|CartesianProduct")),
        ],
    ),
    (
        "url_block_flags",
        [
            ("rides the scan: no shuffle at all",
             lambda p: "Exchange" not in p.split("\n\n")[0]),
            ("pure JVM expressions (no Python UDF)",
             _not(r"BatchEvalPython|ArrowEvalPython|MapInPandas")),
        ],
    ),
]


def _dsir_lazy(spark, sf_dir):
    # q_dsir_importance_weights collects + rebuilds a local frame (cache
    # release discipline), so audit the OPERATOR's lazy plan instead
    from pyspark.sql import functions as F

    from deduplication_framework_spark.operators.dsir import dsir_log_weights

    d = entrymod._docs(spark, sf_dir).withColumn(
        "is_t", F.expr("lang = 'en'")
    )
    return dsir_log_weights(d, target_col="is_t")


# queries whose gate wrapper materializes rows: audit the lazy operator
PLAN_BUILDERS = {"dsir_importance_weights": _dsir_lazy}


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="plan-audit", master="local[4]",
                      shuffle_partitions=4)
    qs = entrymod.queries()
    sections = []
    failures = []
    for name, checks in AUDITS:
        builder = PLAN_BUILDERS.get(name, qs[name])
        plan = plan_of(builder(spark, sf_dir))
        rows = []
        for label, pred in checks:
            ok = pred(plan)
            rows.append(f"| {label} | {'PASS' if ok else 'FAIL'} |")
            if not ok:
                failures.append(f"{name}: {label}")
        # keep the plan excerpt compact: the operator tree (before the
        # per-node detail blocks)
        tree = plan.split("\n\n")[0]
        sections.append(
            f"## {name}\n\n| check | result |\n|---|---|\n"
            + "\n".join(rows)
            + f"\n\n```\n{tree}\n```\n"
        )
    header = (
        "# Physical-plan audit (generated by tools/explain_audit.py)\n\n"
        f"Source: `queries()` at `{sf_dir}`. The checks encode the scale\n"
        "properties the round-1 review flagged (no O(N^2) nested-loop\n"
        "joins, pushdown, pruning, broadcast dims, no single-partition\n"
        "windows); tests/test_plans.py trips the critical ones in CI.\n\n"
    )
    with open("BENCH/PLANS.md", "w") as fh:
        fh.write(header + "\n".join(sections))
    print(f"{len(failures)} failures: {failures}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
