"""LSH Ensemble containment search (operators/lshensemble.py): recall vs
a brute-force containment oracle on planted subset/partial-quote classes,
exact precision by construction (verified edges), partition/parameter
observability, and the bipartite eval-vs-train form."""

import random

import pytest
from pyspark.sql import functions as F

from deduplication_framework_spark.operators.lsh import (
    release_census_caches,
)
from deduplication_framework_spark.operators.lshensemble import (
    _size_partitions,
    lshensemble_containment,
)

T = 0.8


class TestSizePartitions:
    def test_equi_depth_contiguous_cover(self):
        counts = [(s, 10) for s in range(1, 41)]
        parts = _size_partitions(counts, 4)
        assert len(parts) == 4
        assert parts[0][0] == 1 and parts[-1][1] == 40
        # contiguous, ordered, non-overlapping
        for (lo1, hi1), (lo2, _hi2) in zip(parts, parts[1:]):
            assert lo1 <= hi1 < lo2
        # roughly equal depth (10 sizes per range here)
        for lo, hi in parts:
            assert 8 <= hi - lo + 1 <= 12

    def test_fewer_sizes_than_partitions(self):
        parts = _size_partitions([(5, 100)], 8)
        assert parts == [(5, 5)]

    def test_skewed_counts(self):
        # one size holds 90% of docs: it gets its own range
        counts = [(10, 900), (20, 50), (30, 50)]
        parts = _size_partitions(counts, 3)
        assert parts[0] == (10, 10)
        assert parts[-1][1] == 30


def _corpus():
    """Containers (120-200 elements), full-subset quotes (C=1.0, sizes
    15-40 — J vs container as low as 0.075: the regime plain one-banding
    LSH structurally misses), partial quotes (C≈0.85), and noise."""
    rng = random.Random(13)
    vocab = [f"w{i:05d}" for i in range(30_000)]
    rows, truth = [], set()
    did = 0
    for _ in range(40):  # containers + their quotes
        big = rng.sample(vocab, rng.randrange(120, 201))
        big_id = did
        rows.append((did, big)); did += 1
        q = rng.sample(big, rng.randrange(15, 41))
        truth.add((did, big_id))
        rows.append((did, q)); did += 1
        # partial quote: 85% inside the container, 15% fresh
        n = rng.randrange(20, 41)
        inside = rng.sample(big, int(n * 0.9))
        outside = rng.sample(vocab[20_000:], n - len(inside))
        part = inside + outside
        if len(inside) / len(part) >= T:
            truth.add((did, big_id))
        rows.append((did, part)); did += 1
    for _ in range(200):  # noise
        rows.append((did, rng.sample(vocab, rng.randrange(15, 201)))); did += 1
    return rows, truth


def _exact_edges(rows):
    """Brute-force ordered containment >= T oracle (independent of the
    operator and of setjoin)."""
    sets = {i: set(s) for i, s in rows}
    out = set()
    for a, sa in sets.items():
        for b, sb in sets.items():
            if a != b and len(sa & sb) / len(sa) >= T:
                out.add((a, b))
    return out


@pytest.fixture(scope="module")
def corpus():
    return _corpus()


class TestSelfJoin:
    def test_recall_precision_vs_bruteforce(self, spark, corpus):
        rows, truth = corpus
        exact = _exact_edges(rows)
        assert truth <= exact  # planted classes are in the oracle
        assert len(exact) >= 60
        df = spark.createDataFrame(
            rows, "doc_id long, grams array<string>"
        ).repartition(8)
        edges, stats = lshensemble_containment(
            df, threshold=T, num_perm=64, num_partitions=8
        )
        got = {(r.src, r.dst) for r in edges.collect()}
        release_census_caches()
        # precision is EXACT: every emitted edge passed the sorted-merge
        # verify, so it must be in the brute-force set
        assert got <= exact, got - exact
        recall = len(got & exact) / len(exact)
        assert recall >= 0.95, (recall, len(exact))
        # the candidate generator actually pruned: far fewer candidates
        # than ordered all-pairs
        n_docs = len(rows)
        assert stats["n_candidates"] < 0.2 * n_docs * (n_docs - 1)
        assert stats["n_probe_band_rows"] > 0
        assert stats["n_index_band_rows"] > 0
        assert len(stats["partitions"]) >= 2

    def test_deterministic(self, spark, corpus):
        rows, _ = corpus
        df = spark.createDataFrame(
            rows[:120], "doc_id long, grams array<string>"
        )
        a, _ = lshensemble_containment(df, threshold=T, num_perm=32,
                                       num_partitions=4)
        b, _ = lshensemble_containment(df, threshold=T, num_perm=32,
                                       num_partitions=4)
        ra = sorted((r.src, r.dst, round(r.containment, 9)) for r in a.collect())
        rb = sorted((r.src, r.dst, round(r.containment, 9)) for r in b.collect())
        release_census_caches()
        assert ra == rb and len(ra) > 0

    def test_threshold_validation(self, spark):
        df = spark.createDataFrame([(0, ["a"])], "doc_id long, grams array<string>")
        with pytest.raises(ValueError, match="threshold"):
            lshensemble_containment(df, threshold=0.0)


class TestBipartite:
    def test_eval_queries_vs_train_index(self, spark):
        """Decontamination shape: small eval sets probed against a train
        corpus that quotes some of them wholesale. Every quoted eval set
        must be found; nothing links the fresh ones."""
        rng = random.Random(7)
        vocab = [f"t{i:05d}" for i in range(20_000)]
        train_rows, eval_rows, expected = [], [], set()
        for i in range(60):
            doc = rng.sample(vocab, rng.randrange(100, 180))
            train_rows.append((1000 + i, doc))
            if i < 20:  # eval item fully quoted inside this train doc
                q = rng.sample(doc, rng.randrange(12, 30))
                eval_rows.append((i, q))
                expected.add((i, 1000 + i))
        for i in range(20, 40):  # fresh eval items
            eval_rows.append((i, rng.sample(vocab[15_000:], 20)))
        probe = spark.createDataFrame(
            eval_rows, "doc_id long, grams array<string>"
        )
        index = spark.createDataFrame(
            train_rows, "doc_id long, grams array<string>"
        )
        edges, stats = lshensemble_containment(
            probe, index_docs=index, threshold=0.9, num_perm=64,
            num_partitions=4,
        )
        got = {(r.src, r.dst) for r in edges.collect()}
        release_census_caches()
        assert expected <= got, expected - got
        # fresh eval items share < 90% with anything in train
        assert all(src < 20 for src, _ in got)


class TestGateQuery:
    @pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
    def test_gate_query_nonempty(self, spark, sf):
        """A 0-row hash match is vacuous (the signbit lesson): the gate
        query must return edges at the driver-checked SFs. (sf0.1's
        doc_id<500 slice yields 2 rows — thin but non-empty; pinned here
        at the two cheap SFs only.)"""
        import __spark_entry__ as e

        out = e.q_lshensemble_containment(spark, f"/root/testdata/{sf}")
        assert out.count() >= 8, sf
