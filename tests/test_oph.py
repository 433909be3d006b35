"""One-Permutation Hashing (functions/oph.py): the rotation-densified OPH
estimator pinned three ways — numpy kernel vs a literal brute-force replay
of the Shrivastava & Li rotation rule, the Spark closed-form aggregate vs
the Python spec, and the generated DuckDB aggregate twin vs the same spec.
Plus the statistical contract (lane agreement ≈ Jaccard) that makes OPH a
drop-in MinHash family."""

import random

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from deduplication_framework_spark.functions.oph import (
    OPH_C,
    jvm_oph_signatures,
    oph_from_hashvalues,
    oph_sentinel,
    oph_signature_py,
    oph_sql_aggs,
)


def _brute_force_oph(hv, k):
    """Literal rotation-densification replay (ICML 2014 rule): raw per-bin
    minima, then each empty lane borrows from the nearest non-empty bin to
    its RIGHT (circular), offset by t*C per step."""
    sent = oph_sentinel(k)
    raw = [None] * k
    for h in hv:
        b, v = int(h) % k, int(h) // k
        if raw[b] is None or v < raw[b]:
            raw[b] = v
    out = []
    for j in range(k):
        val = sent
        for t in range(k):
            src = (j + t) % k
            if raw[src] is not None:
                val = raw[src] + t * OPH_C
                break
        out.append(val)
    return out


class TestKernel:
    def test_matches_brute_force_rotation(self):
        """Dense, sparse (forces densification), and single-feature inputs
        all agree with the literal rotation rule."""
        rng = random.Random(7)
        for k in (8, 16, 32):
            for n_feats in (0, 1, 2, 5, k - 1, k, 4 * k, 50 * k):
                hv = np.array(
                    [rng.randrange(0, 1 << 32) for _ in range(n_feats)],
                    dtype=np.uint64,
                )
                got = oph_from_hashvalues(hv, k).tolist()
                assert got == _brute_force_oph(hv, k), (k, n_feats)

    def test_empty_input_is_sentinel(self):
        k = 16
        out = oph_from_hashvalues(np.array([], dtype=np.uint64), k)
        assert out.tolist() == [oph_sentinel(k)] * k
        # sentinel strictly above any reachable value
        assert oph_sentinel(k) == k * OPH_C

    def test_duplicates_ignored(self):
        hv = np.array([12345, 12345, 99999], dtype=np.uint64)
        dup = oph_from_hashvalues(hv, 8)
        uniq = oph_from_hashvalues(np.array([12345, 99999], np.uint64), 8)
        assert dup.tolist() == uniq.tolist()

    def test_borrowed_never_collides_with_native(self):
        """The t*C offset keeps borrowed lane values strictly above every
        native one: a lane filled at distance t can only equal another
        doc's lane filled at the SAME distance from the SAME bin value —
        so agreement stays an unbiased same-min event, never a
        cross-distance accident."""
        rng = random.Random(3)
        k = 32
        for _ in range(50):
            hv = np.array(
                [rng.randrange(0, 1 << 32) for _ in range(rng.randrange(1, 6))],
                dtype=np.uint64,
            )
            sig = oph_from_hashvalues(hv, k)
            real = sig[sig < oph_sentinel(k)]
            # distance encoded in the high bits: val // C == t
            native = real[real // OPH_C == 0]
            borrowed = real[real // OPH_C > 0]
            if len(borrowed):
                assert borrowed.min() > native.max()

    def test_agreement_estimates_jaccard(self):
        """Statistical contract on a dense pair (F >> K, the unbiased
        regime): lane-agreement rate ≈ true Jaccard. 256 lanes, J=0.6 →
        sd ≈ 0.03; assert within 5 sd."""
        rng = random.Random(11)
        k = 256
        shared = [rng.randrange(0, 1 << 32) for _ in range(6000)]
        only_a = [rng.randrange(0, 1 << 32) for _ in range(2000)]
        only_b = [rng.randrange(0, 1 << 32) for _ in range(2000)]
        a = oph_from_hashvalues(np.array(shared + only_a, np.uint64), k)
        b = oph_from_hashvalues(np.array(shared + only_b, np.uint64), k)
        jac = len(set(shared)) / len(set(shared + only_a + only_b))
        agree = float(np.mean(a == b))
        assert abs(agree - jac) < 0.16, (agree, jac)

    def test_python_spec_md5_family(self):
        """oph_signature_py = md5-low32 feature hash → kernel."""
        import hashlib

        grams = ["abc", "def", "abc", "xyzzy"]
        hs = np.array(
            sorted(
                int(hashlib.md5(g.encode()).hexdigest()[24:32], 16)
                for g in set(grams)
            ),
            dtype=np.uint64,
        )
        assert oph_signature_py(grams, 16) == oph_from_hashvalues(hs, 16).tolist()


@pytest.fixture(scope="module")
def gram_rows():
    """(doc_id, gram) rows over a corpus spanning the dense and the
    sparse-densified regimes (1-gram docs vs 16 bins)."""
    rng = random.Random(5)
    vocab = [f"g{i:04d}" for i in range(500)]
    rows = []
    for d in range(30):
        n = [1, 2, 3, 10, 40, 200][d % 6]
        for g in rng.sample(vocab, n):
            rows.append((d, g))
    return rows


class TestSparkParity:
    def test_jvm_oph_signatures_match_python_spec(self, spark, gram_rows):
        k = 16
        df = spark.createDataFrame(gram_rows, "doc_id long, gram string")
        out = {
            r["doc_id"]: [r[f"s{j:02d}"] for j in range(k)]
            for r in jvm_oph_signatures(df, num_bins=k).collect()
        }
        by_doc = {}
        for d, g in gram_rows:
            by_doc.setdefault(d, []).append(g)
        assert len(out) == len(by_doc)
        for d, grams in by_doc.items():
            assert out[d] == oph_signature_py(grams, k), d

    def test_plan_no_python_one_md5_partial_agg(self, spark, gram_rows):
        """Structural claims: zero Python workers, md5 evaluated ONCE per
        gram row (the _h alias has two consumers but CollapseProject
        leaves non-cheap projections materialized), and the min aggregate
        partial-aggregates BEFORE the exchange (shuffle is O(docs·K),
        not O(gram rows))."""
        df = spark.createDataFrame(gram_rows[:10], "doc_id long, gram string")
        plan = (
            jvm_oph_signatures(df, num_bins=8)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        for marker in ("BatchEvalPython", "ArrowEvalPython", "FlatMapsInPandas"):
            assert marker not in plan, marker
        assert plan.count("md5") == 1, plan
        # printed top-down: the partial_min HashAggregate sits BELOW the
        # Exchange in the string = executes before the shuffle
        assert "partial_min" in plan, plan
        assert plan.index("Exchange") < plan.index("partial_min"), plan


class TestDuckDBTwin:
    def test_sql_aggs_match_python_spec(self, gram_rows):
        """The generated DuckDB aggregate list over (bin, val) — split from
        the same md5-low32 hash — reproduces the spec signature value by
        value (the cross-engine seam the oph_signatures_sql gate query
        rides)."""
        import hashlib

        k = 16
        con = duckdb.connect()
        con.execute("CREATE TABLE bv (doc_id BIGINT, bin BIGINT, val BIGINT)")
        by_doc = {}
        for d, g in gram_rows:
            by_doc.setdefault(d, set()).add(g)
        for d, grams in by_doc.items():
            for g in grams:
                h = int(hashlib.md5(g.encode()).hexdigest()[24:32], 16)
                con.execute(
                    "INSERT INTO bv VALUES (?, ?, ?)", [d, h % k, h // k]
                )
        got = con.execute(
            f"SELECT doc_id, {oph_sql_aggs(k)} FROM bv"
            " GROUP BY doc_id ORDER BY doc_id"
        ).fetchall()
        for row in got:
            d, sig = row[0], list(row[1:])
            assert sig == oph_signature_py(sorted(by_doc[d]), k), d


class TestFusedUdfFamily:
    def test_fused_oph_sig_matches_kernel(self, spark, pages):
        """hash_family="oph" through the production fused Arrow UDF ==
        oph_from_hashvalues over the kr32 feature hashes of the same
        normalized text (the spec the family is defined by). Shingles
        must be IDENTICAL to the kr32 family's — oph only changes the
        signature estimator, never the verification feature space."""
        from deduplication_framework_spark.config import PipelineConfig
        from deduplication_framework_spark.functions import kernels as K
        from deduplication_framework_spark.functions.text import (
            make_fused_features_udf,
        )

        cfg = PipelineConfig()
        cfg.dedup.hash_family = "oph"
        cfg.dedup.num_perm = 64
        docs = pages.limit(80).select(
            F.col("doc_order").alias("doc_id"), "text"
        )
        fused = make_fused_features_udf(
            cfg.embedding, cfg.dedup, with_minhash=True, with_lsh_feats=True
        )
        got = {
            r.doc_id: r
            for r in docs.select("doc_id", fused("text").alias("f"))
            .select("doc_id", "f.*")
            .collect()
        }
        kcfg = PipelineConfig()
        kcfg.dedup.hash_family = "kr32"
        kcfg.dedup.num_perm = 64
        kr = make_fused_features_udf(
            kcfg.embedding, kcfg.dedup, with_minhash=True, with_lsh_feats=True
        )
        kr_sh = {
            r.doc_id: r.f.shingles
            for r in docs.select("doc_id", kr("text").alias("f")).collect()
        }
        e = cfg.embedding
        for r in docs.collect():
            norm = K.normalize_text(
                r.text or "", e.lowercase, e.strip_non_alnum,
                e.collapse_whitespace, e.strip_mode,
            )
            hv = K.fast_feature_hashes32(
                norm, e.ngram_size, cfg.dedup.max_words,
                cfg.dedup.max_char_grams, True,
            )
            assert got[r.doc_id].sig == oph_from_hashvalues(hv, 64).tolist()
            assert got[r.doc_id].shingles == kr_sh[r.doc_id]
        assert len(got) == 80
