"""functions/jvm_minhash.py — the Python-worker-free MinHash family.

Parity target is the module's own pure-Python spec replica
(``minhash_signature_py``); cross-engine (DuckDB) parity is carried by
the ``minhash_signatures_sql`` driver-gate query.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from deduplication_framework_spark.functions.jvm_minhash import (
    MERSENNE_31,
    affine_params,
    jvm_minhash_signatures,
    minhash_signature_py,
)

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy cat",
    "completely different content here entirely",
    "aa",  # shorter than one full gram: single truncated gram "aa"
    "",  # empty text: single "" gram (matches the gate gram definition)
    "ababababab",  # tiny distinct-gram set (2 grams)
]

_GRAM_EXPR = (
    "transform(sequence(1, greatest(length(text)-2, 1)),"
    " i -> substring(text, i, 3))"
)


def _grams_py(text: str) -> list[str]:
    return [text[i : i + 3] for i in range(max(len(text) - 2, 1))]


def _gram_rows(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    return docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.expr(_GRAM_EXPR))).alias("gram"),
    )


def test_signatures_match_python_spec(spark):
    out = {
        r["doc_id"]: [r[f"s{i:02d}"] for i in range(16)]
        for r in jvm_minhash_signatures(_gram_rows(spark), num_perm=16).collect()
    }
    assert set(out) == set(range(len(TEXTS)))
    for i, t in enumerate(TEXTS):
        assert out[i] == minhash_signature_py(_grams_py(t), num_perm=16), t


def test_identical_gram_sets_identical_signatures(spark):
    # "abababab.." texts of different lengths share the gram set {aba, bab}
    docs = spark.createDataFrame(
        [(0, "ababab"), (1, "abababababab")], "doc_id long, text string"
    )
    rows = docs.select(
        "doc_id", F.explode(F.array_distinct(F.expr(_GRAM_EXPR))).alias("gram")
    )
    a, b = sorted(
        jvm_minhash_signatures(rows, num_perm=8).collect(),
        key=lambda r: r["doc_id"],
    )
    assert [a[f"s{i:02d}"] for i in range(8)] == [b[f"s{i:02d}"] for i in range(8)]


def test_affine_params_deterministic_and_in_range():
    p1, p2 = affine_params(32), affine_params(32)
    assert p1 == p2
    for a, b in p1:
        assert 1 <= a < MERSENNE_31 and 0 <= b < MERSENNE_31


def test_plan_is_jvm_only_with_partial_agg(spark):
    """The whole point of the family: no Python workers anywhere in the
    plan, and the min aggregation partial-aggregates before the exchange
    (shuffle is O(docs·perms), not O(grams))."""
    plan = (
        jvm_minhash_signatures(_gram_rows(spark), num_perm=16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for marker in ("BatchEvalPython", "ArrowEvalPython", "FlatMapsInPandas"):
        assert marker not in plan, marker
    first_agg = plan.index("HashAggregate")
    exchange = plan.index("Exchange")
    # physical plans print top-down: final agg, then exchange, then the
    # partial agg below it — a partial agg exists iff HashAggregate
    # appears again AFTER the Exchange line
    assert "HashAggregate" in plan[exchange:], "no map-side partial min"
    assert first_agg < exchange


# ---------------------------------------------------------------------------
# jvm_minhash_features — the hash_family="jvm" pipeline featurization
# ---------------------------------------------------------------------------

import re

from deduplication_framework_spark.functions.jvm_minhash import (
    jvm_minhash_features,
)

# ASCII corpus: Java's [^\p{L}\p{N}_\s] class coincides with Python's
# [^\w\s] here, so the replica below is exact (the documented family
# delta only opens up on non-ASCII letter categories).
FEAT_TEXTS = [
    "The quick, brown fox -- jumps over   the lazy dog!",
    "the quick brown fox jumps over the lazy dog",
    "word " * 300 + "tail",  # > max_words: cap must bite
    "ab",  # cleaned shorter than one gram: single truncated gram
    "",  # empty: sentinel signature, empty shingles
    "  \t  ",  # whitespace-only: ditto
    "under_score 123 mixed_4",
]


def _features_py(
    text, n=3, max_words=200, max_grams=200, lowercase=True,
    strip_mode="space", strip_non_alnum=True, collapse_whitespace=True,
):
    t = text.lower() if lowercase else text
    if strip_non_alnum:
        t = re.sub(
            r"[^\w\s]", " " if strip_mode == "space" else "", t, flags=re.ASCII
        )
    if collapse_whitespace:
        t = re.sub(r"\s+", " ", t)
    t = t.strip()
    words = t.split()[:max_words]
    cleaned = t.replace(" ", "")
    if not cleaned:
        grams = []
    elif len(cleaned) < n:
        grams = [cleaned]
    else:
        grams = [cleaned[i : i + n] for i in range(len(cleaned) - n + 1)][:max_grams]
    seen, feats = set(), []
    for f in words + grams:
        if f not in seen:
            seen.add(f)
            feats.append(f)
    return feats


def _md5low31(f: str) -> int:
    import hashlib

    return int(hashlib.md5(f.encode()).hexdigest()[24:32], 16) % MERSENNE_31


class TestJvmFeatures:
    def _run(self, spark, **kw):
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(FEAT_TEXTS)], "doc_id long, text string"
        )
        return {
            r["doc_id"]: r
            for r in jvm_minhash_features(docs, num_perm=16, **kw).collect()
        }

    def test_sig_and_shingles_match_python_spec(self, spark):
        out = self._run(spark)
        for i, t in enumerate(FEAT_TEXTS):
            feats = _features_py(t)
            want_sh = sorted({_md5low31(f) for f in feats})
            assert list(out[i]["shingles"]) == want_sh, t
            if feats:
                assert list(out[i]["sig"]) == minhash_signature_py(
                    feats, num_perm=16
                ), t
            else:
                assert list(out[i]["sig"]) == [MERSENNE_31] * 16, t

    def test_word_cap_bites(self, spark):
        # doc 2 has 301 words; the 200-word cap must drop word #301
        # ("tail") from the replica, and the Spark side must agree — its
        # shingle set may not contain tail's hash. (Gram cap covered by
        # the same doc: 200 grams of >1200 cleaned chars.)
        capped = _features_py(FEAT_TEXTS[2])
        uncapped = _features_py(FEAT_TEXTS[2], max_words=10**9, max_grams=10**9)
        assert len(uncapped) > len(capped)
        assert "tail" in uncapped and "tail" not in capped
        out = self._run(spark)
        assert _md5low31("tail") not in set(out[2]["shingles"])

    def test_delete_strip_mode(self, spark):
        from deduplication_framework_spark.config import TextEmbeddingConfig

        out = self._run(spark, emb=TextEmbeddingConfig(strip_mode="delete"))
        for i, t in enumerate(FEAT_TEXTS):
            feats = _features_py(t, strip_mode="delete")
            assert list(out[i]["shingles"]) == sorted(
                {_md5low31(f) for f in feats}
            ), t

    def test_normalization_knobs_honored(self, spark):
        """strip_non_alnum=False must KEEP punctuation as feature bytes
        (the review-pass finding: the first cut hardcoded strip+collapse
        and silently ignored the embedding knobs)."""
        from deduplication_framework_spark.config import TextEmbeddingConfig

        out = self._run(
            spark, emb=TextEmbeddingConfig(strip_non_alnum=False)
        )
        for i, t in enumerate(FEAT_TEXTS):
            feats = _features_py(t, strip_non_alnum=False)
            assert list(out[i]["shingles"]) == sorted(
                {_md5low31(f) for f in feats}
            ), t
        # sanity: the knob actually changes doc 0 (it has punctuation)
        assert _features_py(FEAT_TEXTS[0], strip_non_alnum=False) != \
            _features_py(FEAT_TEXTS[0])

    def test_bad_strip_mode_raises(self, spark):
        from deduplication_framework_spark.config import TextEmbeddingConfig

        docs = spark.createDataFrame([(0, "x")], "doc_id long, text string")
        import pytest as _pytest

        with _pytest.raises(ValueError, match="strip_mode"):
            jvm_minhash_features(
                docs, num_perm=8, emb=TextEmbeddingConfig(strip_mode="junk")
            )

    def test_plan_jvm_only_no_shuffle_one_md5(self, spark):
        """The three structural claims of the path: zero Python workers,
        zero Exchange (pure map-side — unlike the explode+agg shape of
        jvm_minhash_signatures), and md5 evaluated ONCE per feature
        (the _hs projection is materialized, not inlined into both the
        sig transform and the shingles column)."""
        docs = spark.createDataFrame(
            [(0, "some text here")], "doc_id long, text string"
        )
        plan = (
            jvm_minhash_features(docs, num_perm=16)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        for marker in (
            "BatchEvalPython",
            "ArrowEvalPython",
            "FlatMapsInPandas",
            "Exchange",
        ):
            assert marker not in plan, marker
        assert plan.count("md5") == 1, plan

    def test_collapse_whitespace_off_splits_like_python(self, spark):
        """collapse_whitespace=False leaves tabs/newlines in _norm; word
        tokens must still match Python str.split() (any whitespace) and
        char grams must strip ASCII spaces ONLY — the kernel semantics."""
        from deduplication_framework_spark.config import TextEmbeddingConfig

        texts = [
            "alpha\tbeta\n\ngamma  delta",
            "one\ntwo three\tfour",
        ]
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        out = {
            r["doc_id"]: r
            for r in jvm_minhash_features(
                docs,
                num_perm=8,
                emb=TextEmbeddingConfig(collapse_whitespace=False),
            ).collect()
        }
        for i, t in enumerate(texts):
            feats = _features_py(t, collapse_whitespace=False)
            assert list(out[i]["shingles"]) == sorted(
                {_md5low31(f) for f in feats}
            ), (t, feats)
