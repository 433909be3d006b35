"""S10 loaders, S17 fuzzy precomputed join, S18 sampler, O5 gate, J7
permutation-vs-affine MinHash agreement (FIXTURES.md F5), W2 priority."""

import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from deduplication_framework_spark.functions import kernels as K
from deduplication_framework_spark.oracle import numpy_oracle as O
from deduplication_framework_spark.sources import loaders as L


class TestLoaders:
    def test_json_lines(self, spark, tmp_path):
        p = tmp_path / "a.jsonl"
        p.write_text('{"x": 1, "t": "a"}\n{"x": 2, "t": "b"}\n')
        df = L.read_text_dataset(spark, str(p), "json")
        assert df.count() == 2 and set(df.columns) == {"x", "t"}

    def test_json_array(self, spark, tmp_path):
        p = tmp_path / "b.json"
        p.write_text(json.dumps([{"x": 1}, {"x": 2}, {"x": 3}]))
        df = L.read_text_dataset(spark, str(p), "json")
        assert df.count() == 3

    def test_json_data_wrapped(self, spark, tmp_path):
        p = tmp_path / "c.json"
        p.write_text(json.dumps({"data": [{"x": 1, "t": "a"}, {"x": 2, "t": "b"}]}))
        df = L.read_text_dataset(spark, str(p), "json")
        assert df.count() == 2 and set(df.columns) == {"x", "t"}

    def test_csv(self, spark, tmp_path):
        p = tmp_path / "d.csv"
        p.write_text("x,t\n1,a\n2,b\n")
        df = L.read_text_dataset(spark, str(p))
        assert df.count() == 2


class TestFuzzyJoin:
    def test_key_variants_meet(self, spark):
        items = spark.createDataFrame(
            [("/data/Track_01.wav",), ("/x/other-02.WAV",), ("/y/miss.wav",)],
            "path string",
        )
        pre = spark.createDataFrame(
            [("track01", 0.9), ("OTHER_02.flac", 0.5)], "name string, score double"
        )
        out = L.join_precomputed(items, pre, "path", "name")
        got = {r.path: r.score for r in out.collect()}
        assert got["/data/Track_01.wav"] == 0.9
        assert got["/x/other-02.WAV"] == 0.5
        assert got["/y/miss.wav"] is None


class TestSamplerAndGate:
    def test_sample_subset(self, spark):
        df = spark.range(1000)
        s1 = L.sample_subset(df, 100)
        s2 = L.sample_subset(df, 100)
        assert s1.count() == 100
        assert {r.id for r in s1.collect()} == {r.id for r in s2.collect()}
        assert L.sample_subset(spark.range(5), 100).count() == 5

    def test_gate_passes_and_fails(self, spark):
        good = spark.createDataFrame([("a",), ("b",), ("",)], "text string")
        with pytest.raises(L.InputGateError):
            L.precondition_gate(good, "text", max_missing_fraction=0.10)
        L.precondition_gate(good, "text", max_missing_fraction=0.50)
        with pytest.raises(L.InputGateError):
            L.precondition_gate(
                spark.createDataFrame([], "text string"), "text"
            )


class TestPermutationMinhashF5:
    def test_permutation_vs_affine_agreement(self):
        """FIXTURES.md F5: both MinHash constructions estimate the same
        Jaccard on a seeded 64x256 binary matrix (density 0.3)."""
        rng = np.random.RandomState(42)
        mat = (rng.rand(64, 256) < 0.3).astype(np.uint8)
        sig_perm = O.permutation_minhash(mat, n_sig=256, seed=1)

        perms = K.minhash_permutations(256)
        cols = [
            [f"f{i}".encode() for i in np.nonzero(mat[:, c])[0]]
            for c in range(mat.shape[1])
        ]
        sig_aff = np.stack(
            [K.minhash_signature(c, perms) for c in cols]
        )  # (docs, n_sig)

        checked = 0
        for a in range(0, 256, 37):
            for b in range(a + 1, 256, 41):
                ca, cb = mat[:, a].astype(bool), mat[:, b].astype(bool)
                union = np.count_nonzero(ca | cb)
                true_j = (np.count_nonzero(ca & cb) / union) if union else 1.0
                est_p = O.permutation_minhash_jaccard(sig_perm, a, b)
                est_a = K.minhash_jaccard_estimate(sig_aff[a], sig_aff[b])
                sigma = max((true_j * (1 - true_j) / 256) ** 0.5, 1e-6)
                assert abs(est_p - true_j) <= 5 * sigma + 0.02
                assert abs(est_a - true_j) <= 5 * sigma + 0.02
                checked += 1
        assert checked >= 20

    def test_reference_toy_vectors(self):
        """The reference's inline 4x3 toy (LSH_deal_with_photo.py:153-166):
        identical columns get identical signatures."""
        mat = np.array(
            [[1, 0, 1], [0, 1, 0], [1, 0, 1], [0, 1, 0]], dtype=np.uint8
        )
        sig = O.permutation_minhash(mat, n_sig=64, seed=3)
        assert np.array_equal(sig[:, 0], sig[:, 2])
        assert O.permutation_minhash_jaccard(sig, 0, 1) == 0.0


class TestKeepPriorityW2:
    def test_ordering(self, spark):
        from deduplication_framework_spark.operators.embeddings import (
            keep_priority_score,
        )

        df = spark.createDataFrame(
            [
                (0, 0, 0.1, 100),
                (1, 0, 0.9, 500),
                (2, 0, 0.5, 300),
                (3, 1, 0.2, 10),
            ],
            "vec_id long, block_id int, dist_to_centroid double, size long",
        )
        out = keep_priority_score(df, size_col="size")
        rows = {r.vec_id: (r.keep_priority, r.priority_rank) for r in out.collect()}
        # block 0: vec 0 has min distance (sim_norm=1) but min size (0) →
        # 0.7; vec 1 max dist (0) + max size (0.3); vec 2 middle
        assert abs(rows[0][0] - 0.7) < 1e-9
        assert abs(rows[1][0] - 0.3) < 1e-9
        assert rows[0][1] == 1 and rows[1][1] == 3
        # singleton block: sim_norm=1, size_norm=0
        assert abs(rows[3][0] - 0.7) < 1e-9 and rows[3][1] == 1


def test_sample_subset_with_map_column(spark):
    """ADVICE r2: MapType columns aren't xxhash64-able — the order key must
    hash only atomic columns, and stay deterministic across partitionings."""
    from pyspark.sql import functions as F

    from deduplication_framework_spark.sources import loaders as L

    df = spark.range(500).select(
        "id", F.create_map(F.lit("k"), F.col("id")).alias("props")
    )
    s1 = {r.id for r in L.sample_subset(df, 50).collect()}
    s2 = {r.id for r in L.sample_subset(df, 50).collect()}
    assert len(s1) == 50 and s1 == s2
    # (sample() itself is partition-dependent by design; the fixed order
    # key only removes the tie nondeterminism of the limit() cut)
    assert L.sample_subset(df.repartition(7), 50).count() == 50

    # arrays/structs ARE xxhash64-able and must stay in the order key
    # (rows distinguished only by a complex column would otherwise all tie)
    arr = spark.range(300).select(
        F.lit("x").alias("c"),
        F.array("id", F.lit(1)).alias("a"),
        F.struct(F.col("id").alias("i")).alias("s"),
    )
    a1 = {r.a[0] for r in L.sample_subset(arr, 40).collect()}
    a2 = {r.a[0] for r in L.sample_subset(arr, 40).collect()}
    assert len(a1) == 40 and a1 == a2
    # map nested inside an array is excluded too (would fail xxhash64)
    nested = spark.range(400).select(
        "id", F.array(F.create_map(F.lit("k"), F.col("id"))).alias("am")
    )
    # must not raise (map nested in array excluded from the hash key);
    # sample() is fraction-approximate so allow the documented ~n
    assert 0 < L.sample_subset(nested, 10).count() <= 10
