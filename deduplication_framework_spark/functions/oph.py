"""One-Permutation Hashing (OPH) MinHash with rotation densification.

Classic K-permutation MinHash (functions/kernels.py, jvm_minhash.py)
costs O(F * K) permutation-min work per doc: every one of F feature
hashes is pushed through K affine maps. At 10^12 documents that term
dominates featurization. One-Permutation Hashing (Li, Owen & Zhang,
NIPS 2012) hashes each feature ONCE, scatters it into K bins by its
low bits, and takes the per-bin minimum — O(F + K) per doc, a ~K×
reduction of the sig-construction CPU at identical signature width.
Empty bins (docs with few features relative to K) are filled by the
rotation densification of Shrivastava & Li (ICML 2014): bin j borrows
from the nearest non-empty bin to its right (circularly), offset by
t*C per step so borrowed values cannot collide with native ones.

The densified lane value has a closed form this module exploits on
every engine (numpy / Spark aggregates / DuckDB SQL):

    sig[j] = min over feature hashes h of
                 (h div K) + dist(h mod K, j) * C
    dist(b, j) = (b - j + K) mod K          # circular right-distance
    C = 2^32  >  max(h div K)               # step offset

because for any feature landing in bin b = h mod K at distance t from
lane j, its candidate value (h div K) + t*C is strictly increasing in
t (h div K < C), so the global min first picks the smallest t (the
rotation rule) and, within it, the smallest bin value (the MinHash
rule). That makes the whole construction ONE algebraic ``min``
aggregation — map-side combinable, whole-stage-codegen on Spark, and
value-exact in DuckDB — no argmin, no second pass.

Hash family for the cross-engine spec: md5-low32 (the same
DuckDB-computable feature hash as functions/jvm_minhash.py, full
32-bit value, no %P fold — OPH needs the uniform low bits for
binning). The production Arrow path (``hash_family="oph"`` in the
fused featurization UDF) feeds the SAME numpy kernel with the
vectorized kr32 feature hashes instead — like ``kr32``, a
self-contained family whose recall parity vs the sha1/datasketch
pipeline is pinned empirically in tests.

Estimator semantics: P[sig_a[j] == sig_b[j]] ≈ J(A, B); the rotation
scheme is unbiased in the dense regime (F >> K) and mildly biased for
very sparse docs (the 2014 paper's analysis) — the pipeline keeps
exact-Jaccard verification after banding, so bias only moves recall
at the band stage, never precision. Collision caveat shared with
every 32-bit family here: feature hashes collide at ~F^2/2^33 per
doc (negligible at F ≤ 10^4).

Reference analog: the datasketch MinHash construction in
/root/reference/text/method/pipeline_api.py (shingle → 32-bit hash →
K permuted mins), re-expressed as the one-pass OPH estimator.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deduplication_framework_spark.functions.jvm_minhash import md5_low32_col

# Step offset: strictly greater than any bin value (h div K <= h < 2^32,
# and for K >= 2, h div K < 2^31 < C). 2^32 keeps the worst lane value
# (C - 1) + (K - 1) * C = K * 2^32 inside int64 for any practical K.
OPH_C = 1 << 32


def oph_sentinel(num_bins: int) -> int:
    """Lane value for a doc with ZERO features: K * C, strictly above any
    reachable value ((h div K) + t*C < C + (K-1)*C = K*C), so empty docs
    collide only with each other — the same all-empty-docs-band-together
    semantics as the sha1/jvm families' max-sentinel lanes."""
    return num_bins * OPH_C


def oph_from_hashvalues(hv: np.ndarray, num_bins: int) -> np.ndarray:
    """int64[num_bins] densified OPH signature from 32-bit feature hashes
    (any dtype holding values in [0, 2^32); duplicates allowed — the min
    ignores them). Empty input → all ``oph_sentinel(num_bins)``.

    O(F + K log K), the property the family exists for: per-bin raw
    minima via ``np.minimum.at`` (O(F)), then — because any borrowed
    value carries +t·C ≥ C > every native value — a filled lane IS its
    raw minimum, and an empty lane takes the NEAREST filled bin to its
    right regardless of values (raw[src] < C makes t*·C + raw[src] <
    (t*+1)·C ≤ any farther candidate), found for all empty lanes at once
    with one searchsorted over the filled-bin indices. Equivalence to
    the K×K closed-form table is pinned against the literal rotation
    rule in tests/test_oph.py."""
    k = int(num_bins)
    sent = oph_sentinel(k)
    if hv.size == 0:
        return np.full(k, sent, dtype=np.int64)
    h = hv.astype(np.uint64)
    bins = (h % np.uint64(k)).astype(np.int64)
    vals = (h // np.uint64(k)).astype(np.int64)
    raw = np.full(k, sent, dtype=np.int64)
    np.minimum.at(raw, bins, vals)
    empty = raw == sent
    if not empty.any():
        return raw
    filled_idx = np.flatnonzero(~empty)
    ext = np.concatenate([filled_idx, filled_idx + k])
    j = np.flatnonzero(empty)
    src_pos = np.searchsorted(ext, j)  # first filled bin at or right of j
    src = ext[src_pos]
    out = raw.copy()
    out[j] = raw[src % k] + (src - j) * OPH_C
    return out


def oph_signature_py(grams, num_bins: int) -> list[int]:
    """Pure-Python md5-family spec replica (the cross-engine test oracle):
    distinct grams → md5-low32 → ``oph_from_hashvalues``."""
    hs = np.fromiter(
        (
            int(hashlib.md5(g.encode("utf-8")).hexdigest()[24:32], 16)
            for g in set(grams)
        ),
        dtype=np.uint64,
        count=len(set(grams)),
    )
    return oph_from_hashvalues(hs, num_bins).tolist()


def jvm_oph_signatures(
    grams: DataFrame,
    num_bins: int = 32,
    id_col: str = "doc_id",
    gram_col: str = "gram",
) -> DataFrame:
    """(id, gram) rows → one row per id with densified OPH lanes s00..s{K-1},
    entirely whole-stage codegen: ONE md5 per gram row, bin/val projected
    once, then K algebraic ``min`` aggregates of the closed form
    val + dist(bin, j)*C — map-side combine shrinks the shuffle to
    O(docs * K * 8 bytes) exactly like jvm_minhash_signatures, but with
    zero per-lane affine multiplies upstream of the aggregate. Docs with
    no gram rows are absent from the output (same as the GROUP BY on any
    engine); callers needing empty-doc lanes use ``oph_sentinel``."""
    k = int(num_bins)
    # md5 projected ONCE behind an alias with two consumers — CollapseProject
    # does not inline non-cheap aliases, so bin/val split one evaluation
    # (the same plan shape jvm_minhash_signatures pins in test_jvm_minhash)
    hashed = grams.select(
        F.col(id_col), md5_low32_col(F.col(gram_col)).alias("_h")
    ).select(
        id_col,
        (F.col("_h") % k).alias("_bin"),
        F.expr(f"_h div {k}").alias("_val"),
    )
    aggs = [
        F.min(
            F.col("_val") + ((F.col("_bin") - j + k) % k) * F.lit(OPH_C)
        ).alias(f"s{j:02d}")
        for j in range(k)
    ]
    return hashed.groupBy(id_col).agg(*aggs)


def oph_sql_aggs(num_bins: int = 32) -> str:
    """DuckDB aggregate list over columns ``bin``/``val`` (already split
    from the md5-low32 hash) — the generated twin of
    ``jvm_oph_signatures``' aggregates, same closed form."""
    k = int(num_bins)
    return ",\n                   ".join(
        f"MIN(val + ((bin - {j} + {k}) % {k}) * {OPH_C}) AS s{j:02d}"
        for j in range(k)
    )
