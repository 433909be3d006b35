"""tfidf_top_terms: pure-Python oracle parity, determinism, plan shape."""

import math
import re
from collections import Counter

import pytest

from deduplication_framework_spark.operators.keywords import tfidf_top_terms

_WS = re.compile(r"[ \t\n\r\f\x0B]+")


def _oracle(texts, k=5, min_tf=1):
    """Reference ranking recomputed row-at-a-time in Python floats —
    IEEE doubles, so identical to both engines by construction."""
    tfs = {}
    for i, t in enumerate(texts):
        words = [w for w in _WS.split(t.strip().lower()) if w]
        tfs[i] = {w: c for w, c in Counter(words).items() if c >= min_tf}
    dfc = Counter()
    for d in tfs.values():
        dfc.update(d.keys())
    out = []
    for i, d in tfs.items():
        ranked = sorted(
            ((tf / dfc[w], tf, w) for w, tf in d.items()),
            key=lambda x: (-x[0], -x[1], x[2]),
        )[:k]
        for r, (score, tf, w) in enumerate(ranked, start=1):
            # half-up like Spark/DuckDB round(), not Python's half-even
            out.append((i, r, w, tf, dfc[w], math.floor(1e6 * score + 0.5)))
    return sorted(out)


TEXTS = [
    "apple banana apple cherry durian apple",
    "banana banana cherry elder fig grape",
    "cherry cherry cherry apple grape grape hazel",
    "  durian \t fig  ",
    "unique solitary words only here",
    "apple apple apple apple",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def test_matches_python_oracle(docs):
    got = sorted(
        tuple(r)
        for r in tfidf_top_terms(docs, k=3).collect()
    )
    assert got == _oracle(TEXTS, k=3)


def test_k_larger_than_vocab_and_min_tf(docs):
    got = sorted(tuple(r) for r in tfidf_top_terms(docs, k=50, min_tf=2).collect())
    assert got == _oracle(TEXTS, k=50, min_tf=2)
    # min_tf=2 drops every once-only term BEFORE df counting
    assert all(r[3] >= 2 for r in got)


def test_rank_dense_per_doc(docs):
    rows = tfidf_top_terms(docs, k=4).collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r.rank)
    for doc_id, ranks in per_doc.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), doc_id


def test_tie_break_is_term_asc(spark):
    # two terms with identical (tf, df) -> identical score; term ASC decides
    d = spark.createDataFrame([(0, "zz aa zz aa")], "doc_id long, text string")
    rows = tfidf_top_terms(d, k=2).orderBy("rank").collect()
    assert [r.term for r in rows] == ["aa", "zz"]


def test_empty_and_whitespace_docs(spark):
    d = spark.createDataFrame(
        [(0, ""), (1, "   \t  "), (2, "word")], "doc_id long, text string"
    )
    rows = tfidf_top_terms(d, k=3).collect()
    assert [(r.doc_id, r.term, r.tf, r.df) for r in rows] == [(2, "word", 1, 1)]


def test_param_validation(docs):
    with pytest.raises(ValueError):
        tfidf_top_terms(docs, k=0)
    with pytest.raises(ValueError):
        tfidf_top_terms(docs, min_tf=0)


def test_plan_shape(docs):
    """Skew posture: df join is shuffle-hash (never sort-merge on the hot
    term key), and the only Window is partitioned by document."""
    plan = tfidf_top_terms(docs)._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # row_number window is partitioned -> no single-partition global sort
    assert "Window" in plan
    assert "windowspecdefinition(doc_id" in plan


def test_small_alphabet_random_corpora(spark):
    """Adversarial tie pressure: a tiny vocabulary forces many identical
    tf/df ratios ACROSS different (tf, df) pairs (2/4 == 1/2), identical
    scores across docs, and rank collisions — the full (score DESC,
    tf DESC, term ASC) chain must match the Python IEEE oracle exactly."""
    import random

    rng = random.Random(1234)
    vocab = ["a", "b", "c", "aa", "ab", "ba"]
    for trial in range(3):
        texts = [
            " ".join(
                rng.choice(vocab) for _ in range(rng.randint(0, 30))
            )
            for _ in range(40)
        ]
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string",
        )
        got = sorted(tuple(r) for r in tfidf_top_terms(docs, k=4).collect())
        assert got == _oracle(texts, k=4), f"trial {trial}"
