"""Pure-JVM MinHash signatures — the Python-worker-free scale path.

The pipeline's default featurization is the fused Arrow UDF
(functions/text.py::make_fused_features_udf): one Python pass per doc
emits signature + shingles + simhash + winnow together, which is the
right shape when several detectors share the scan. This module is the
complementary extreme for MinHash-ONLY workloads: the whole signature
is built from Spark built-ins — ``md5`` feature hashing, affine
permutations over the Mersenne prime 2^31-1, and ``min`` aggregation —
so it runs entirely inside whole-stage codegen with ZERO Python
workers and ZERO Arrow transfer.

Scale shape: ``explode(grams)`` never leaves the map side, and because
``min`` is algebraic the groupBy(doc) aggregation map-side-combines to
ONE row per doc per partition before the exchange — the shuffle volume
is O(n_docs * num_perm * 8 bytes), the same as the Arrow path, not
O(n_grams). On clusters where Python worker slots (not JVM cores) are
the bottleneck — a real constraint at 1000-executor scale where
``spark.python.worker.memory`` competes with executor heap — this path
trades the fused UDF's single-pass economy for zero Python cost.

Hash family spec (``md5-low32 / affine mod 2^31-1``), chosen so every
intermediate fits SIGNED INT64 in any engine (no 128-bit arithmetic,
unlike datasketch's 2^61-1 family whose a*h products need 93 bits):

    h(g)    = int(md5(utf8(g)).hexdigest()[24:32], 16)   # low 32 bits, BE
    sig_i   = min over grams g of (A_i * (h(g) % P) + B_i) % P
    P       = 2^31 - 1;  A_i in [1, P-1], B_i in [0, P-1]
              drawn from random.Random(seed) at module scope.

This is NOT bit-compatible with datasketch (functions/kernels.py keeps
that spec, pinned by tests); it is a self-contained family whose whole
point is that both Spark AND DuckDB can evaluate it exactly — the
driver gate's ``minhash_signatures_sql`` query proves signature-level
(not just cluster-level) cross-engine parity, which the sha1 families
cannot (DuckDB 1.0 has no sha1). Reference analog: the datasketch
MinHash construction in /root/reference/text/method/pipeline_api.py
(shingle -> 32-bit feature hash -> permuted min), re-expressed with a
DuckDB-computable hash.

Collision posture at 100 TB: 32-bit feature hashes collide at ~n^2/2^33
per doc-pair gram set (negligible for per-doc gram sets of 10^3-10^4);
the %P fold loses 1 bit vs the 32-bit input, uniformly.
"""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MERSENNE_31 = (1 << 31) - 1
_DEFAULT_SEED = 0x5EED5


def affine_params(num_perm: int, seed: int = _DEFAULT_SEED) -> list[tuple[int, int]]:
    """Deterministic (A_i, B_i) pairs shared by the Spark and DuckDB sides."""
    rng = random.Random(seed)
    return [
        (rng.randrange(1, MERSENNE_31), rng.randrange(0, MERSENNE_31))
        for _ in range(num_perm)
    ]


def md5_low32_col(col: Column) -> Column:
    """Low 32 bits (big-endian hex digits 25..32) of md5 — JVM-side."""
    return F.conv(F.substring(F.md5(col), 25, 8), 16, 10).cast("long")


def jvm_minhash_signatures(
    grams: DataFrame,
    num_perm: int = 16,
    seed: int = _DEFAULT_SEED,
    id_col: str = "doc_id",
    gram_col: str = "gram",
) -> DataFrame:
    """(id, gram) rows -> one row per id with columns s00..s{num_perm-1}.

    Entirely whole-stage-codegen: md5 + conv + integer affine + min
    aggregation. The md5 is evaluated ONCE per gram row (projected
    before the aggregate), not once per permutation.
    """
    params = affine_params(num_perm, seed)
    h = (md5_low32_col(F.col(gram_col)) % MERSENNE_31).alias("_h")
    hashed = grams.select(F.col(id_col), h)
    aggs = [
        F.min((F.lit(a) * F.col("_h") + F.lit(b)) % MERSENNE_31).alias(f"s{i:02d}")
        for i, (a, b) in enumerate(params)
    ]
    return hashed.groupBy(id_col).agg(*aggs)


def jvm_minhash_features(
    docs: DataFrame,
    *,
    num_perm: int,
    ngram_size: int = 3,
    max_words: int = 200,
    max_char_grams: int = 200,
    include_words: bool = True,
    seed: int = _DEFAULT_SEED,
    id_col: str = "doc_id",
    text_col: str = "text",
    emb=None,
) -> DataFrame:
    """(id, text) → (id, sig: array<long>, shingles: array<long>) with the
    ENTIRE featurization per-row JVM expressions — no Python workers, no
    Arrow transfer, and (unlike ``jvm_minhash_signatures``' explode+agg
    shape) NO shuffle at all: normalize → capped word tokens ∪ char
    n-grams → md5-low32 feature hashes → per-permutation affine min, one
    projection per doc. This is the ``hash_family="jvm"`` pipeline path;
    the output plugs straight into ``operators/lsh.minhash_bands`` (sig)
    and ``operators/verify.verify_jaccard`` (shingles).

    Normalization is ``functions/text.normalize_col`` with the passed
    ``emb`` (``TextEmbeddingConfig``) — the SAME pinned JVM twin of
    ``kernels.normalize_text`` every other JVM surface uses, honoring
    all four knobs (lowercase / strip_non_alnum / collapse_whitespace /
    strip_mode). Feature-set semantics mirror the fused Arrow path
    (reference pipeline_api.py:426-430: first ``max_words`` whitespace
    tokens ∪ space-stripped char ``ngram_size``-grams capped at
    ``max_char_grams``), with one documented delta that makes this a
    self-contained family rather than a bit-parity one (exactly like
    ``kr32``): shingle ids are the md5-low32 feature hashes themselves
    (the sig's own input domain) instead of sha1-slice ids. Recall
    parity against the sha1 pipeline is pinned empirically in
    tests/test_e2e_recall.py.

    Empty docs: zero features → every sig lane is the MERSENNE_31
    sentinel (unreachable by real values, which are % P < P), so all
    empty docs band-collide and the verifier's both-empty → 1.0 rule
    (reference pipeline_api.py:478-485) merges them — the same outcome
    as the Arrow path.
    """
    from deduplication_framework_spark.config import TextEmbeddingConfig
    from deduplication_framework_spark.functions.text import normalize_col

    emb = emb or TextEmbeddingConfig()
    if emb.strip_mode not in ("space", "delete"):
        raise ValueError(f"unknown strip_mode {emb.strip_mode!r}")
    n = max(1, int(ngram_size))
    params = affine_params(num_perm, seed)

    d0 = docs.select(
        F.col(id_col), normalize_col(F.col(text_col), emb).alias("_norm")
    )
    # the gram list is sliced to max_char_grams right below, so bound the
    # generating sequence instead of materializing EVERY position first:
    # slice(transform(sequence(1, K), f), 1, c) == transform(sequence(1,
    # least(K, c)), f) — value-identical, and ~7.5x cheaper on kB-size
    # docs (r6: the uncapped transform was the dominant jvm-family cost,
    # 5.3s -> 0.7s for the 20k-doc feature stage)
    cap = max(1, int(max_char_grams))
    gram_expr = (
        "CASE WHEN length(_cleaned) = 0 THEN CAST(array() AS array<string>) "
        f"WHEN length(_cleaned) < {n} THEN array(_cleaned) "
        f"ELSE transform(sequence(1, least(length(_cleaned) - {n} + 1, {cap})), "
        f"i -> substring(_cleaned, i, {n})) END"
    )
    # word tokens split on the Java twin of Python str.split() (any
    # whitespace — only visible when collapse_whitespace=False); char
    # grams strip ASCII spaces only (kernels.lsh_char_grams semantics)
    d1 = d0.select(
        id_col,
        F.slice(
            F.filter(
                F.split(F.col("_norm"), r"(?U)\s+"), lambda w: w != ""
            ),
            1,
            max_words,
        ).alias("_words"),
        F.expr("replace(_norm, ' ', '')").alias("_cleaned"),
    )
    d2 = d1.select(
        id_col,
        F.slice(F.expr(gram_expr), 1, max_char_grams).alias("_grams"),
        "_words",
    )
    feats = (
        F.array_distinct(F.concat("_words", "_grams"))
        if include_words
        else F.array_distinct(F.col("_grams"))
    )
    # one md5 per distinct feature; _hs is a materialized column consumed
    # twice below (sig + shingles) — CollapseProject does not inline
    # non-cheap aliases with >1 consumer, pinned by the one-md5 plan test
    d3 = d2.select(id_col, feats.alias("_feats"))
    d4 = d3.select(
        id_col,
        F.expr(
            "transform(_feats, f -> CAST(conv(substring(md5(f), 25, 8),"
            f" 16, 10) AS BIGINT) % {MERSENNE_31})"
        ).alias("_hs"),
    )
    # one array_min(transform(...)) expression PER PERMUTATION with the
    # affine constants as literals, instead of an outer transform over a
    # params-struct array: the interpreted HOF then skips two
    # GetStructField lookups per (perm, feature) evaluation and the
    # per-perm inner-array allocation of the nested shape (r6 A/B: ~20%
    # off the signature stage; the lambda itself stays CodegenFallback —
    # the residual interpreted-HOF cost is the documented family trade)
    sig_cols = [
        F.coalesce(
            F.array_min(
                F.transform(
                    F.col("_hs"),
                    (
                        lambda a_, b_: lambda h: (F.lit(a_) * h + F.lit(b_))
                        % F.lit(MERSENNE_31)
                    )(a, b),
                )
            ),
            F.lit(MERSENNE_31),
        )
        for a, b in params
    ]
    return d4.select(
        id_col,
        F.array(*sig_cols).alias("sig"),
        F.array_sort(F.array_distinct(F.col("_hs"))).alias("shingles"),
    )


def minhash_signature_py(
    grams: list[str], num_perm: int = 16, seed: int = _DEFAULT_SEED
) -> list[int]:
    """Pure-Python spec replica (the test oracle for the JVM path)."""
    params = affine_params(num_perm, seed)
    hs = [
        int(hashlib.md5(g.encode("utf-8")).hexdigest()[24:32], 16) % MERSENNE_31
        for g in set(grams)
    ]
    return [min((a * h + b) % MERSENNE_31 for h in hs) for (a, b) in params]


_HEXVAL = "strpos('0123456789abcdef', substring({hx}, {pos}, 1)) - 1"


def hex8_to_int_sql(hex8_expr: str) -> str:
    """DuckDB expression turning an 8-char lowercase hex column into its
    integer value (no from_hex->int cast exists in DuckDB 1.0; parse the
    digits positionally). Feed it a COLUMN holding ``substring(md5(g),
    25, 8)`` computed once in a prior CTE, not the md5 call itself —
    inlining the md5 here would evaluate it 8x per row."""
    terms = [
        f"({_HEXVAL.format(hx=hex8_expr, pos=k)}) * {16 ** (8 - k)}"
        for k in range(1, 9)
    ]
    return "(" + " + ".join(terms) + ")"


def minhash_signature_sql_aggs(num_perm: int = 16, seed: int = _DEFAULT_SEED) -> str:
    """DuckDB aggregate list over a column ``h`` (already %P-folded)."""
    params = affine_params(num_perm, seed)
    return ",\n                   ".join(
        f"MIN(({a} * h + {b}) % {MERSENNE_31}) AS s{i:02d}"
        for i, (a, b) in enumerate(params)
    )
