"""Exact prefix-filtered containment join (operators/setjoin.py
::ssjoin_containment): recall 1.0 by theorem vs brute-force all-pairs,
asymmetry semantics (a quote is contained in its source, not the other
way), subset/boundary cases, hot-element behavior, and the verify
kernel's empty handling."""

import random

import pytest

from deduplication_framework_spark.operators.lsh import (
    release_census_caches,
)
from deduplication_framework_spark.operators.setjoin import (
    ssjoin_containment,
)


def _py_oracle(sets, t):
    """Brute-force ordered all-pairs: same float expr as the verify UDF."""
    out = set()
    for a, sa in sets.items():
        for b, sb in sets.items():
            if a == b or not sa or not sb:
                continue
            if len(set(sa) & set(sb)) / len(set(sa)) >= t:
                out.add((a, b))
    return out


def _run(spark, sets, t, **kw):
    df = spark.createDataFrame(
        [(i, list(s)) for i, s in sets.items()], ["doc_id", "grams"]
    )
    edges, stats = ssjoin_containment(df, threshold=t, **kw)
    got = {(r.src, r.dst) for r in edges.collect()}
    release_census_caches()
    return got, stats


@pytest.mark.parametrize("t", [0.6, 0.8])
def test_dense_path_equals_prefix_path(spark, t):
    """The tiny-universe bitmap path (r6) must emit the identical ordered
    edge set AND identical float containment values as prefix+verify."""
    sets = _random_corpus(5)
    df = spark.createDataFrame(
        [(i, list(s)) for i, s in sets.items()], ["doc_id", "grams"]
    )
    e_dense, s_dense = ssjoin_containment(df, threshold=t, dense=True)
    rows_dense = {(r.src, r.dst): r.containment for r in e_dense.collect()}
    release_census_caches()
    e_sparse, s_sparse = ssjoin_containment(df, threshold=t, dense=False)
    rows_sparse = {(r.src, r.dst): r.containment for r in e_sparse.collect()}
    release_census_caches()
    assert s_dense["path"] == "dense" and "path" not in s_sparse
    assert rows_dense == rows_sparse  # exact float equality, both paths
    assert set(rows_dense) == _py_oracle(sets, t)


def _random_corpus(seed, n_docs=50, universe=40):
    rng = random.Random(seed)
    els = [f"g{i}" for i in range(universe)]
    sets = {i: set(rng.sample(els, rng.randint(3, 16))) for i in range(n_docs)}
    # planted containments: a small "quote" from a bigger doc
    for i in range(0, n_docs, 6):
        big = sorted(sets[i])
        if len(big) >= 4:
            sets[n_docs + i] = set(big[: max(3, len(big) - 1)])
    return sets


@pytest.mark.parametrize("seed", [1, 2, 3])
@pytest.mark.parametrize("t", [0.6, 0.8, 1.0])
@pytest.mark.parametrize("dense", [False, "auto"])
def test_matches_bruteforce_oracle(spark, seed, t, dense):
    sets = _random_corpus(seed)
    got, _ = _run(spark, sets, t, dense=dense)
    assert got == _py_oracle(sets, t)


def test_asymmetry_quote_in_source(spark):
    # the quote {a,b,c} is fully contained in the source (C=1.0), the
    # source is NOT contained in the quote (C=3/6)
    sets = {1: {"a", "b", "c"}, 2: {"a", "b", "c", "d", "e", "f"}}
    got, _ = _run(spark, sets, 0.8)
    assert got == {(1, 2)}
    # at t=0.5 the reverse direction qualifies too
    got2, _ = _run(spark, sets, 0.5)
    assert got2 == {(1, 2), (2, 1)}


def test_exact_subset_and_boundary(spark):
    sets = {
        1: {"a", "b", "c", "d"},
        2: {"a", "b", "c", "d", "z1", "z2"},
        3: {"a", "b", "c", "x"},  # C(3->1) = 3/4 exactly
    }
    got, _ = _run(spark, sets, 0.75)
    assert (1, 2) in got  # subset: C = 1.0
    assert (3, 1) in got and (3, 2) in got  # boundary 0.75 kept
    assert (2, 1) not in got  # 4/6 < 0.75


def test_identical_sets_both_directions(spark):
    sets = {1: {"a", "b"}, 2: {"a", "b"}}
    got, _ = _run(spark, sets, 1.0)
    assert got == {(1, 2), (2, 1)}


def test_hot_element_never_probes(spark):
    # every doc shares one hot element; prefixes key on rare elements,
    # so candidates stay ~answer-sized rather than ~n^2
    sets = {i: {"hot", f"r{i}a", f"r{i}b", f"r{i}c"} for i in range(40)}
    sets[100] = {"hot", "r0a", "r0b", "r0c"}  # true container pair with 0
    got, stats = _run(spark, sets, 0.9, dense=False)
    assert got == {(0, 100), (100, 0)}
    assert stats["n_candidates"] <= 10, stats


def test_empty_sets_emit_nothing(spark):
    sets = {1: set(), 2: {"a"}}
    got, _ = _run(spark, sets, 0.5)
    assert got == set()


def test_bad_threshold_raises(spark):
    df = None
    with pytest.raises(ValueError, match="threshold"):
        ssjoin_containment(df, threshold=0.0)
