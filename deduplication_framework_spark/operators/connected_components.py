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
    ckpt = checkpoint or (lambda df: df.localCheckpoint(eager=True))

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

    for it in range(max_iterations):
        # 1. propagate: candidate label for each vertex = min over neighbors'
        #    current labels (plus its own)
        nbr_labels = (
            both.join(labels, both.b == labels.doc_id, "inner")
            .select(F.col("a").alias("doc_id"), F.col("cluster_id").alias("cand"))
        )
        prop = (
            labels.select("doc_id", F.col("cluster_id").alias("cand"))
            .unionByName(nbr_labels)
            .groupBy("doc_id")
            .agg(F.min("cand").alias("cluster_id"))
        )

        # 2. pointer jump twice: label(v) <- label(label(label(v))) — each
        #    extra jump is a cheap self-join on the (small) label table and
        #    multiplies the per-round shortcutting
        jumped = prop
        for _ in range(2):
            parent = jumped.select(
                F.col("doc_id").alias("p_id"), F.col("cluster_id").alias("p_label")
            )
            jumped = (
                jumped.join(parent, jumped.cluster_id == parent.p_id, "left")
                .select(
                    "doc_id",
                    F.coalesce(F.col("p_label"), F.col("cluster_id")).alias(
                        "cluster_id"
                    ),
                )
            )
        jumped = ckpt(jumped)

        diff = (
            jumped.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
        )
        if round_stats is not None:
            changed = diff.count()
            round_stats.append({"round": it + 1, "n_changed": changed})
        else:
            changed = diff.limit(1).count()
        labels = jumped
        if changed == 0:
            return labels, it + 1

    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} iterations"
    )
