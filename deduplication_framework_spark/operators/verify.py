"""Candidate-pair verification (SURVEY.md J1/J9/P9).

Joins candidate (src, dst) pairs back to per-doc features and keeps pairs
passing the exact predicate — all JVM-side expressions:

* Jaccard on hashed shingle sets: size(array_intersect)/size(array_union),
  both-empty → 1.0 (reference ``pipeline_api.py:478-485``).
* SimHash: bit_count(a XOR b) <= dist (reference ``pipeline_api.py:393``).
* MinHash estimate: fraction of agreeing signature positions (what
  datasketch's LSH *implies*; the reference's ours_lsh accepts any band
  collision unverified — pass ``verify=False`` upstream for strict parity).

The reference's hand-rolled prefilters (length-ratio / ngram-count-ratio
``clean_the_dataset.py:375-398``) appear here as cheap WHERE predicates
evaluated before the set intersection — for theta=0.8 a size ratio < 2/3
already implies J < 0.8, so the filter is provably recall-safe at the
configured threshold (|A|/|B| >= J whenever J ≥ θ requires |A∩B| ≥ θ|A∪B|).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf

from deduplication_framework_spark.functions.text import hamming_expr, jaccard_expr

# conservative guard for float threshold arithmetic in recall-safe
# prefilters: a threshold whose double literal rounds ABOVE its rational
# value (e.g. 0.8 -> 0.8000...0444) could otherwise make a size prune
# strictly tighter than the exact predicate and drop an
# exactly-at-threshold pair. Shared with operators/setjoin.py (defined
# here because setjoin already imports from this module).
_EPS = 1e-9


def _attach(pairs: DataFrame, feats: DataFrame, id_col: str, cols) -> DataFrame:
    fa = feats.select(
        F.col(id_col).alias("src"), *[F.col(c).alias(f"{c}_a") for c in cols]
    )
    fb = feats.select(
        F.col(id_col).alias("dst"), *[F.col(c).alias(f"{c}_b") for c in cols]
    )
    return pairs.join(fa, "src").join(fb, "dst")


def make_sorted_jaccard_udf():
    """Arrow UDF: exact Jaccard of two SORTED-DISTINCT arrays via
    np.intersect1d(assume_unique=True) — a linear merge. Spark's builtin
    array_intersect allocates a hash set per row, which measured at ~1ms of
    JVM CPU per 400-element pair (346 CPU-seconds for 313k candidate pairs
    at 100k docs); the merge path is ~30x cheaper. Both-empty → 1.0
    (reference pipeline_api.py:478-485)."""
    @pandas_udf(T.DoubleType())
    def sorted_jaccard(a: pd.Series, b: pd.Series) -> pd.Series:
        out = np.empty(len(a), dtype=np.float64)
        for i, (xs, ys) in enumerate(zip(a, b)):
            nx = 0 if xs is None else len(xs)
            ny = 0 if ys is None else len(ys)
            if nx == 0 or ny == 0:
                # both empty/null → 1.0 (reference rule); one-sided → 0.0
                # (and never hand None to np.intersect1d)
                out[i] = 1.0 if nx == ny else 0.0
                continue
            inter = np.intersect1d(xs, ys, assume_unique=True).size
            out[i] = inter / (nx + ny - inter)
        return pd.Series(out)

    return sorted_jaccard


def verify_jaccard(
    pairs: DataFrame,
    features: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    feat_col: str = "shingles",
    size_prefilter: bool = True,
    use_sorted_udf: bool = True,
) -> DataFrame:
    """→ edges(src, dst, sim) with sim = exact Jaccard >= threshold.

    ``use_sorted_udf`` (default): linear-merge Jaccard via Arrow UDF —
    requires the feature arrays to be sorted-distinct (all our feature UDFs
    emit np.unique output). Set False for arbitrary arrays (JVM
    array_intersect path) — that mode also disables the size prefilter,
    whose |A| >= θ|B| necessity argument only holds when array length =
    SET size (a duplicate-laden array can pass set-Jaccard yet fail the
    raw-length ratio)."""
    joined = _attach(pairs, features, id_col, [feat_col])
    a, b = F.col(f"{feat_col}_a"), F.col(f"{feat_col}_b")
    if size_prefilter and threshold > 0 and use_sorted_udf:
        # |A| >= θ|B| and |B| >= θ|A| are necessary for J >= θ; -_EPS
        # mirrors the setjoin candidate-side guard so the prune is
        # provably recall-safe for ANY threshold literal (ADVICE r4)
        sa, sb = F.size(a), F.size(b)
        joined = joined.filter(
            (sa >= threshold * sb - _EPS) & (sb >= threshold * sa - _EPS)
        )
    sim = make_sorted_jaccard_udf()(a, b) if use_sorted_udf else jaccard_expr(a, b)
    return (
        joined.withColumn("sim", sim)
        .filter(F.col("sim") >= threshold)
        .select("src", "dst", "sim")
    )


def verify_hamming(
    pairs: DataFrame,
    fingerprints: DataFrame,
    dist: int,
    id_col: str = "doc_id",
    fp_col: str = "simhash",
) -> DataFrame:
    """→ edges(src, dst, sim) with sim = 64 - hamming distance (so larger =
    more similar, uniform edge schema across detectors)."""
    joined = _attach(pairs, fingerprints, id_col, [fp_col])
    d = hamming_expr(F.col(f"{fp_col}_a"), F.col(f"{fp_col}_b"))
    return (
        joined.withColumn("hamming", d)
        .filter(F.col("hamming") <= dist)
        .select(
            "src", "dst", ((F.lit(64) - F.col("hamming")) / 64.0).alias("sim")
        )
    )


def make_sorted_containment_udf():
    """Arrow UDF: exact containment |A∩B| / |A| of two SORTED-DISTINCT
    arrays (linear merge, same rationale as make_sorted_jaccard_udf).
    Empty/NULL A → 0.0 (nothing to contain — callers drop empty sets)."""
    @pandas_udf(T.DoubleType())
    def sorted_containment(a: pd.Series, b: pd.Series) -> pd.Series:
        out = np.empty(len(a), dtype=np.float64)
        for i, (xs, ys) in enumerate(zip(a, b)):
            nx = 0 if xs is None else len(xs)
            ny = 0 if ys is None else len(ys)
            if nx == 0 or ny == 0:
                out[i] = 0.0
                continue
            inter = np.intersect1d(xs, ys, assume_unique=True).size
            out[i] = inter / nx
        return pd.Series(out)

    return sorted_containment


def verify_containment(
    pairs: DataFrame,
    features: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    feat_col: str = "shingles",
) -> DataFrame:
    """→ edges(src, dst, containment) with containment = exact
    |set(src) ∩ set(dst)| / |set(src)| >= threshold (src is the
    CONTAINED side — the relation is asymmetric). Feature arrays must be
    sorted-distinct (every feature UDF here emits np.unique output)."""
    joined = _attach(pairs, features, id_col, [feat_col])
    a, b = F.col(f"{feat_col}_a"), F.col(f"{feat_col}_b")
    if threshold > 0:
        # |B| >= overlap >= t*|A| is necessary; -_EPS keeps the prune
        # recall-safe for thresholds whose double literal rounds above
        # the rational value (ADVICE r4 — mirrors ssjoin_containment's
        # candidate-join guard)
        joined = joined.filter(
            F.size(b) >= threshold * F.size(a) - _EPS
        )
    cont = make_sorted_containment_udf()(a, b)
    return (
        joined.withColumn("containment", cont)
        .filter(F.col("containment") >= threshold)
        .select("src", "dst", "containment")
    )
