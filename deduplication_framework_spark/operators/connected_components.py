"""Iterative connected components over an edge DataFrame (hash-partitioned
union-find analog — north_rule / SURVEY.md J10).

The reference merges duplicate pairs greedily and, in the audio path, even
randomly (``/root/reference/audio/method/caculate_dedup.py:37-44``). The
north rule replaces this with proper connected components: every doc's
cluster id = the minimum doc id reachable through verified duplicate edges.

Algorithm: alternating *min-label propagation* + *pointer jumping*
(path-halving), the DataFrame formulation of the map-reduce CC family
(Kiveris et al. 2014, "Connected Components in MapReduce and Beyond" —
public). Each round:

  1. label'(v) = min(label(v), min over neighbors u of label(u))   [propagate]
  2. label''(v) = label(label'(v))                                  [jump]

Pointer jumping halves chain depth per round, so convergence is
O(log(diameter)) rounds — near-dup clusters have tiny diameters (stars
through the keeper), so 2-4 rounds in practice. Every round materializes via
``localCheckpoint`` to truncate lineage (a driver-loop over joins would
otherwise build an exponentially deep plan); on a cluster each round can
instead checkpoint to the table store (see plans.checkpoint) for
resumability.
"""

from __future__ import annotations

from typing import Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 50,
    checkpoint=None,
    round_stats: Optional[list] = None,
) -> Tuple[DataFrame, int]:
    """edges(src, dst) → labels(doc_id, cluster_id) for every vertex that
    appears in an edge. cluster_id = min vertex id in the component.

    ``checkpoint``: optional callable DataFrame -> DataFrame used to
    materialize per-round state (defaults to localCheckpoint).

    ``round_stats``: optional caller-owned list; when provided, each round
    appends {"round", "n_changed"} with the FULL changed-label count (the
    default convergence test short-circuits at limit(1) — cheaper, but
    invisible to benchmarking; the bench's distributed-CC entry passes a
    list so per-round convergence is a recorded artifact).

    Vertices with no edges are absent — callers union them back with
    cluster_id = own id (cheaper than shipping singletons through the loop).
    """
    ckpt = checkpoint or _stats_bounded_local_ckpt
    spark = edges.sparkSession
    # Spark 4's Dataset.checkpoint copies the child plan's CONSTRAINT set
    # into the checkpointed LogicalRDD (LogicalRDD.rewriteStatsAndConstraints).
    # In an iterative self-referential loop the per-round joins derive new
    # constraints FROM the inherited ones, so the set compounds geometrically
    # — measured ~4x driver time per round from ~round 8 (jstack:
    # SizeInBytesOnlyStatsPlanVisitor under rewriteStatsAndConstraints),
    # turning a 16-round toy graph into minutes. Constraint propagation is
    # purely an optimizer inference (never changes results); disable it for
    # the loop's queries and restore afterwards (guide §7.3 — driver
    # planning hot spot).
    _CP = "spark.sql.constraintPropagation.enabled"
    try:
        cp_old = spark.conf.get(_CP)
    except Exception:
        cp_old = None
    spark.conf.set(_CP, "false")
    try:
        return _cc_loop(edges, src, dst, max_iterations, ckpt, round_stats)
    finally:
        if cp_old is None:
            spark.conf.unset(_CP)
        else:
            spark.conf.set(_CP, cp_old)


def _stats_bounded_local_ckpt(df: DataFrame) -> DataFrame:
    """localCheckpoint whose resulting LogicalRDD carries REAL (bounded)
    size statistics. Spark 4's Dataset.checkpoint copies the child plan's
    estimated stats into the checkpointed LogicalRDD; the size estimate of
    a join is the PRODUCT of its children's sizes, so in an iterative
    loop each round's checkpointed sizeInBytes is ~the 4th power of the
    previous round's — after ~8 rounds the BigInteger arithmetic inside
    SizeInBytesOnlyStatsPlanVisitor dominates the driver (measured ~4x
    wall per round on a 400-node toy graph; jstack: BigInteger.
    multiplyToomCook3 under LogicalRDD.rewriteStatsAndConstraints).
    Persisting first makes the checkpointed plan an InMemoryRelation,
    whose post-materialization stats are the ACTUAL cached bytes — one
    extra cache scan per round buys O(1) stats forever. The InMemory
    cache is dropped immediately: the checkpoint holds its own blocks."""
    c = df.persist()
    out = c.localCheckpoint(eager=True)
    c.unpersist()
    return out


def _cc_loop(edges, src, dst, max_iterations, ckpt, round_stats):

    both = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    both = ckpt(both)

    labels = both.groupBy("a").agg(F.min("b").alias("nbr_min"))
    labels = labels.select(
        F.col("a").alias("doc_id"),
        F.least(F.col("a"), F.col("nbr_min")).alias("cluster_id"),
    )
    labels = ckpt(labels)

    # NOTE (r6): pre-partitioning the checkpointed frames does NOT carry
    # co-partitioning into later rounds — under AQE the checkpoint's
    # LogicalRDD records unknown output partitioning, so the per-round
    # joins re-exchange regardless (A/B'd: identical interleaved minima
    # with and without explicit repartitions). The round's wins are the
    # SHUFFLE_HASH joins (no per-round sorts), the carried-old
    # convergence test, and three jumps per round.
    for it in range(max_iterations):
        # 1. propagate: candidate label for each vertex = min over
        #    neighbors' current labels; SHUFFLE_HASH skips the per-round
        #    sort of the edge side. The vertex's own label rides the left
        #    join below (not a union branch), which also carries the OLD
        #    label so convergence needs no diff join.
        lab_h = labels.hint("shuffle_hash")
        nbr_min = (
            both.join(lab_h, both.b == lab_h.doc_id, "inner")
            .select(F.col("a").alias("doc_id"), F.col("cluster_id").alias("cand"))
            .groupBy("doc_id")
            .agg(F.min("cand").alias("_nmin"))
        )
        prop = (
            labels.join(nbr_min.hint("shuffle_hash"), "doc_id", "left")
            .select(
                "doc_id",
                F.col("cluster_id").alias("_old"),
                F.least(
                    F.col("cluster_id"), F.coalesce("_nmin", "cluster_id")
                ).alias("cluster_id"),
            )
        )

        # 2. pointer jump three times — each jump is a self-join on the
        #    (small) label table that SQUARES the per-round shortcutting;
        #    3 jumps cut the 6000-diameter bench chain from 7 rounds to 5
        #    (r6 interleaved minima: 18.8s vs 20.8s) and extra jumps never
        #    increase the round count, so the log2-diameter bound holds
        jumped = prop
        for _ in range(3):
            parent = jumped.select(
                F.col("doc_id").alias("p_id"), F.col("cluster_id").alias("p_label")
            ).hint("shuffle_hash")
            jumped = (
                jumped.join(
                    parent,
                    jumped.cluster_id == parent.p_id,
                    "left",
                )
                .select(
                    "doc_id",
                    "_old",
                    F.coalesce(F.col("p_label"), F.col("cluster_id")).alias(
                        "cluster_id"
                    ),
                )
            )
        jumped = ckpt(jumped)

        # carried-old convergence test: a filter scan over the checkpoint,
        # not a join against the previous round (r6 — was 2 exchanges +
        # a full shuffle join per round)
        diff = jumped.filter(F.col("_old") != F.col("cluster_id"))
        if round_stats is not None:
            changed = diff.count()
            round_stats.append({"round": it + 1, "n_changed": changed})
        else:
            changed = diff.limit(1).count()
        labels = jumped.select("doc_id", "cluster_id")
        if changed == 0:
            return labels, it + 1

    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} iterations"
    )
