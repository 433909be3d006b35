"""Embedding-space dedup (J13 / C1 / W1 / W3) vs NumPy oracle."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from deduplication_framework_spark.operators.embeddings import (
    cosine_pairs_bruteforce,
    kmeans_block,
    kmeans_semdedup,
    l2_normalize,
    semdedup_within_blocks,
)


@pytest.fixture(scope="module")
def vec_df(spark):
    """80 vectors in 4 tight clumps + planted near-duplicates."""
    rng = np.random.RandomState(9)
    rows = []
    vid = 0
    for c in range(4):
        center = rng.randn(16)
        center /= np.linalg.norm(center)
        for i in range(20):
            v = center + 0.12 * rng.randn(16)
            rows.append((vid, [float(x) for x in v], c))
            vid += 1
    # planted near-dups: copy of vec 0 and vec 25 with tiny noise
    for src in (0, 25):
        base = np.array(rows[src][1])
        v = base + 0.001 * rng.randn(16)
        rows.append((vid, [float(x) for x in v], rows[src][2]))
        vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def _np_normalized(rows):
    ids = [r.vec_id for r in rows]
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    return ids, mat


class TestBruteforce:
    def test_pairs_match_numpy(self, spark, vec_df):
        rows = sorted(vec_df.collect(), key=lambda r: r.vec_id)
        ids, mat = _np_normalized(rows)
        sims = mat @ mat.T
        theta = 0.95
        expect = {
            (ids[i], ids[j])
            for i in range(len(ids))
            for j in range(i + 1, len(ids))
            if sims[i, j] >= theta - 1e-12
        }
        got = {
            (r.src, r.dst)
            for r in cosine_pairs_bruteforce(
                l2_normalize(vec_df), threshold=theta
            ).collect()
        }
        # float32 storage vs float64 oracle can flip pairs sitting exactly at
        # the threshold; none of the planted ones do
        assert got == expect
        assert (0, 80) in got and (25, 81) in got  # planted near-dups


class TestKMeans:
    def test_blocking_covers_all(self, spark, vec_df):
        blocked = kmeans_block(l2_normalize(vec_df), n_clusters=4)
        assert blocked.count() == vec_df.count()
        assert blocked.select("block_id").distinct().count() <= 4
        # tight clumps: labels should be mostly block-pure (k-means init can
        # occasionally split a clump — require >= 0.9 majority purity)
        rows = blocked.select("label", "block_id").collect()
        by_label = {}
        for r in rows:
            by_label.setdefault(r.label, []).append(r.block_id)
        for blocks in by_label.values():
            top = max(blocks.count(b) for b in set(blocks))
            assert top / len(blocks) >= 0.9


class TestSemDeDup:
    def test_matches_reference_triangular_max(self, spark, vec_df):
        """Per-block decisions equal the reference's numpy loop
        (simple_semdedup.py:85-108) run on the same block contents."""
        eps = 0.05
        normalized = l2_normalize(vec_df)
        blocked = kmeans_block(normalized, n_clusters=4)
        decisions = semdedup_within_blocks(blocked, eps=eps)
        got = {r.vec_id: (r.keep, round(r.max_prior_sim, 9)) for r in decisions.collect()}

        # oracle per block, identical ordering rule (dist desc, id asc)
        brows = blocked.collect()
        by_block = {}
        for r in brows:
            by_block.setdefault(r.block_id, []).append(r)
        for members in by_block.values():
            members.sort(key=lambda r: (-r.dist_to_centroid, r.vec_id))
            mat = np.array([m.embedding for m in members], dtype=np.float64)
            sims = mat @ mat.T
            for j in range(len(members)):
                # reference takes max over torch.triu(sims, 1) — the zero
                # padding floors the max at 0 when all prior sims are
                # negative (simple_semdedup.py:92-104); we reproduce that
                mp = max(0.0, float(np.max(sims[:j, j]))) if j > 0 else 0.0
                keep = mp <= 1.0 - eps
                g_keep, g_mp = got[members[j].vec_id]
                assert g_keep == keep
                assert abs(g_mp - mp) < 1e-9

    def test_planted_dups_removed(self, spark, vec_df):
        keepers, decisions = kmeans_semdedup(vec_df, eps=0.05, n_clusters=4)
        kept = {r.vec_id for r in keepers.collect()}
        # one of each planted pair must be gone
        assert not ({0, 80} <= kept)
        assert not ({25, 81} <= kept)
        assert len(kept) < 82
