"""Exact set-similarity join via prefix filtering (AllPairs / PPJoin).

MinHash-LSH (operators/lsh.py) finds near-dup pairs *probabilistically*;
this operator finds EVERY pair with exact Jaccard >= t — recall 1.0 by
theorem, not by tuning — at far below all-pairs cost. It is the scale
path for the exact-edge surfaces (``ngram_jaccard_edges`` /
``jaccard_cluster_keepers`` compute the same edge set with a banded
all-pairs ``array_intersect``, which is the transparent-oracle path but
quadratic within bands), and the right tool when exactness is
contractual (benchmark decontamination audits, license dedup).

Algorithm (Bayardo et al. "Scaling Up All Pairs Similarity Search",
WWW'07; Xiao et al. PPJoin, WWW'08 — public-literature rebuild):

1. Canonical order: every element ranked by (global document frequency
   ASC, element ASC) — rarest first.
2. Prefix: for threshold t, a set x keeps its first
   ``p = |x| - ceil(t*|x|) + 1`` ranked elements. *Lemma (prefix
   filter)*: J(x,y) >= t implies overlap >= ceil(t*max(|x|,|y|)); if w
   is the rank-smallest shared element, every element before w in x is
   non-shared, and x has at most |x| - ceil(t*|x|) < p non-shared
   elements, so w sits inside BOTH prefixes. Joining prefixes on the
   element therefore finds every qualifying pair.
3. Length filter (exact): J >= t implies t*|x| <= |y| <= |x|/t.
4. Positional filter (PPJoin, exact): all shared elements sit at or
   after w in both rankings, so overlap <= min(|x|-pos_x(w),
   |y|-pos_y(w)); require that bound >= alpha = ceil(t/(1+t)*(|x|+|y|))
   (the overlap J >= t forces).
5. Exact verify of the surviving candidates (sorted-merge Arrow
   Jaccard, operators/verify.py — measured ~30x cheaper than
   ``array_intersect``).

Float guard: every ``ceil(t * n)`` prefilter bound subtracts 1e-9 first,
so binary-float wobble can only make a prefix LONGER or a bound LOOSER —
prefilters stay conservative and the final verify is exact regardless.

Scale posture (100 TB):

* The document-frequency pass is one (element, count) aggregation —
  full map-side combine, same shuffle class as LSH banding.
* Ranked arrays are built with one per-doc ``collect_list`` +
  ``array_sort`` (per-doc state only, no cross-doc memory).
* Only prefixes are exploded into the join: ~(1-t)*|x|+1 elements per
  doc (20% + 1 at t=0.8).
* Join buckets are keyed by rarest-first elements, so bucket sizes are
  bounded by each element's document frequency and the hottest corpus
  elements (stopword grams) never enter a prefix unless a set is nearly
  all-hot; candidate count ~ true-pair count on real corpora. A
  pathological corpus (many docs of the same few rare elements) makes
  those pairs TRUE candidates — cost tracks answer size, the honest
  lower bound. ``stats['n_candidates']`` makes the blow-up observable.
* Featurize with a SPARSE element universe (word shingles / n-grams —
  what near-dup pipelines use anyway). A dense small universe (e.g.
  char-3-grams of kB-size docs: ~20k possible elements, corpus-wide
  document frequencies all high) leaves no rare elements for prefixes
  to key on and degrades toward banded all-pairs — measured on the
  bench pages corpus, which is why bench.py's ssjoin surfaces shingle
  on word bigrams.
* Candidate dedup + positional filter ride the same (src, dst)
  aggregation; verify joins are plain equi-joins on doc id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deduplication_framework_spark.operators.verify import verify_jaccard

__all__ = ["ssjoin_jaccard", "ssjoin_containment"]

# conservative-ceil guard for float threshold arithmetic — ONE definition
# shared with the verify-side prefilters (defined in verify.py because
# this module already imports from it)
from deduplication_framework_spark.operators.verify import _EPS  # noqa: E402


def ssjoin_jaccard(
    docs: DataFrame,
    *,
    threshold: float,
    id_col: str = "doc_id",
    set_col: str = "grams",
    positional: bool = True,
) -> tuple:
    """Exact Jaccard-similarity self-join: every pair (src < dst) with
    ``J(set(src), set(dst)) >= threshold``.

    ``docs`` — one row per doc with an array column ``set_col`` (treated
    as a set: deduplicated here; empty/NULL sets emit no edges).
    Returns ``(edges, stats)``: edges ``(src, dst, sim)`` lazy, and
    stats ``{"n_candidates": int}``. The deduplicated input projection
    and the candidate pairs are persisted (tracked caches — freed by
    ``lsh.release_census_caches()``); ``base`` is eagerly counted right
    after the persist (the dfreq map stage and the prefix-join exchange
    are independent shuffle-map stages of the census job and would race
    to fill the cache, recomputing the input lineage — the CLAUDE.md
    concurrent-stage pitfall), then the candidate census fills the
    ``cands`` cache before the verify fan-out, so the prefix join runs
    once and the blow-up metric is observable.
    """
    from deduplication_framework_spark.operators.lsh import _persist_tracked

    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    t = float(threshold)

    base = _persist_tracked(
        docs.select(
            F.col(id_col).alias("_id"),
            F.array_distinct(F.col(set_col)).alias("_set"),
        ).filter(F.size("_set") > 0)
    )
    base.count()  # eager: fill the cache before concurrent consumers

    exploded = base.select("_id", F.explode("_set").alias("_el"))
    dfreq = exploded.groupBy("_el").agg(F.count("*").alias("_df"))

    # rarest-first canonical ranking, one per-doc aggregation
    ranked = (
        exploded.join(dfreq, "_el")
        .groupBy("_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("_df"), F.col("_el")))
            ).alias("_ranked")
        )
        .withColumn("_sz", F.size("_ranked"))
    )

    # prefix length p = sz - ceil(t*sz) + 1 (conservative ceil)
    p = F.col("_sz") - F.ceil(t * F.col("_sz") - _EPS).cast("int") + 1
    prefix = ranked.select(
        "_id",
        "_sz",
        F.posexplode(F.slice("_ranked", 1, p)).alias("_pos", "_w"),
    )

    a = prefix.select(
        F.col("_id").alias("src"),
        F.col("_sz").alias("_sa"),
        F.col("_pos").alias("_pa"),
        "_w",
    )
    b = prefix.select(
        F.col("_id").alias("dst"),
        F.col("_sz").alias("_sb"),
        F.col("_pos").alias("_pb"),
        "_w",
    )
    joined = a.join(b, "_w").filter(
        (F.col("src") < F.col("dst"))
        # exact length filter: t*|x| <= |y| <= |x|/t, both directions
        & (F.col("_sb") >= t * F.col("_sa") - _EPS)
        & (F.col("_sa") >= t * F.col("_sb") - _EPS)
    )
    # one row per pair, carrying the rank-SMALLEST shared prefix element's
    # positions (min over the (df, el) struct order = min over rank)
    cands = joined.groupBy("src", "dst", "_sa", "_sb").agg(
        F.min(F.struct("_w", "_pa", "_pb")).alias("_m")
    )
    if positional:
        # overlap <= min(remaining-from-w) on both sides; require >= alpha
        alpha = F.ceil(
            t / (1.0 + t) * (F.col("_sa") + F.col("_sb")) - _EPS
        ).cast("int")
        ub = F.least(
            F.col("_sa") - F.col("_m._pa"), F.col("_sb") - F.col("_m._pb")
        )
        cands = cands.filter(ub >= alpha)
    cands = _persist_tracked(cands.select("src", "dst"))
    n_candidates = cands.count()  # eager: fills the cands cache

    feats = base.select("_id", F.array_sort("_set").alias("_lex"))
    edges = verify_jaccard(
        cands, feats, t, id_col="_id", feat_col="_lex", size_prefilter=False
    )
    return edges, {"n_candidates": n_candidates}


def ssjoin_containment(
    docs: DataFrame,
    *,
    threshold: float,
    id_col: str = "doc_id",
    set_col: str = "grams",
) -> tuple:
    """Exact containment self-join: every ORDERED pair (src != dst) with
    ``|set(src) ∩ set(dst)| / |set(src)| >= threshold`` — src is the
    CONTAINED side. The quote/partial-copy detector: a doc whose content
    is mostly inside another (Jaccard misses these when the container is
    much larger — J <= |A|/|B|, but containment is size-ratio-free).

    Prefix lemma (containment form): C(A,B) >= t implies
    ``overlap >= ceil(t*|A|)``, so A has at most |A| - ceil(t*|A|)
    elements outside B and at least one of A's first
    ``p = |A| - ceil(t*|A|) + 1`` rarest-ranked elements is shared. The
    probe side therefore explodes only A-prefixes; the INDEX side has no
    prefix (B's shared elements can rank anywhere in B), so it explodes
    fully — the structural cost of asymmetry, bounded by keying on A's
    rarest elements (hot elements still never enter probes). Exact
    filter: ``|B| >= t*|A|`` (length). NOTE: no positional filter —
    with prefix length exactly ``p``, every positional/count bound one
    can derive from prefix-only matches is vacuous (any candidate has
    >= 1 prefix match and ``min_pos <= p-1``, which already implies the
    ``|A| - min_pos >= ceil(t*|A|)`` bound), so pruning beyond the
    length filter is the verify step's job. Conservative-ceil 1e-9
    guards as in :func:`ssjoin_jaccard`; final verify is an exact
    sorted-merge count.

    Returns ``(edges, stats)``: edges ``(src, dst, containment)`` lazy,
    stats ``{"n_candidates": int}``. Same persist/eager-census contract
    as :func:`ssjoin_jaccard`."""
    from deduplication_framework_spark.operators.lsh import _persist_tracked
    from deduplication_framework_spark.operators.verify import (
        verify_containment,
    )

    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    t = float(threshold)

    base = _persist_tracked(
        docs.select(
            F.col(id_col).alias("_id"),
            F.array_distinct(F.col(set_col)).alias("_set"),
        ).filter(F.size("_set") > 0)
    )
    base.count()  # eager: fill the cache before concurrent consumers

    exploded = base.select("_id", F.explode("_set").alias("_el"))
    dfreq = exploded.groupBy("_el").agg(F.count("*").alias("_df"))
    ranked = (
        exploded.join(dfreq, "_el")
        .groupBy("_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("_df"), F.col("_el")))
            ).alias("_ranked")
        )
        .withColumn("_sz", F.size("_ranked"))
    )

    p = F.col("_sz") - F.ceil(t * F.col("_sz") - _EPS).cast("int") + 1
    probe = ranked.select(
        "_id",
        "_sz",
        F.explode(F.slice("_ranked", 1, p)).alias("_w"),
    ).select(
        F.col("_id").alias("src"),
        F.col("_sz").alias("_sa"),
        F.col("_w._el").alias("_el"),
    )
    # |B| rides the explode projection — no join over the element table
    index = base.select(
        F.col("_id").alias("dst"),
        F.size("_set").alias("_sb"),
        F.explode("_set").alias("_el"),
    )

    joined = probe.join(index, "_el").filter(
        (F.col("src") != F.col("dst"))
        & (F.col("_sb") >= t * F.col("_sa") - _EPS)
    )
    cands = _persist_tracked(joined.select("src", "dst").distinct())
    n_candidates = cands.count()  # eager: fills the cands cache

    feats = base.select("_id", F.array_sort("_set").alias("_lex"))
    edges = verify_containment(
        cands, feats, t, id_col="_id", feat_col="_lex"
    )
    return edges, {"n_candidates": n_candidates}
