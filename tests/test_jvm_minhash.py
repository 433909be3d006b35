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
