"""Benchmark harness. The FINAL stdout line is one COMPACT JSON object:
  {"metric": "total_sec", "value": N, "unit": "sec",
   "queries": {...per-query minima...}, "sf": 0.1, "recall": {...}}
The full payload (every rep's timing + the hard-asserted evidence dicts)
goes to BENCH/evidence_last_run.json and an earlier stdout line — the
driver tail-captures stdout, and round 4's single giant line outgrew the
capture (BENCH_r04 parsed:null).

Headline workloads:
  * full near-dup pipelines (exact+minhash / simhash / substring) over a
    deterministic synthetic Common-Crawl-style pages corpus sized to the SF;
  * detector clustering over the driver's documents table;
  * representative SQL-parity operators over the sf tables.

Env:
  SPARK_GRAFT_SF_DIR   (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     (default 32)
  BENCH_PAGES          (override synthetic corpus size)

``python bench.py --scaling`` additionally runs the minhash pipeline at
local[8] and local[32] on the identical corpus (interleaved reps, min per
config, host-CPU-supply probes) and writes BENCH/scaling_last_run.md.
The curated analysis lives in BENCH/BASELINE.md (the sandbox proxy for
the north rule's N → 4N executor criterion).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from deduplication_framework_spark.config import PipelineConfig
from deduplication_framework_spark.plans.pipeline import run_pipeline
from deduplication_framework_spark.session import get_spark
from deduplication_framework_spark.sources.pages import generate_pages

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


SF = _sf_of(SF_DIR)
N_PAGES = int(os.environ.get("BENCH_PAGES", str(max(2000, int(200_000 * SF)))))


def _timed(fn):
    t0 = time.time()
    n = fn()
    return time.time() - t0, n


def bench_pages_pipeline(spark, pages, detectors, cfg=None):
    def run():
        res = run_pipeline(
            spark, pages, cfg or PipelineConfig(), detectors=detectors
        )
        return res.keepers.count()

    return run


def _kr32_cfg():
    cfg = PipelineConfig()
    cfg.dedup.hash_family = "kr32"
    return cfg


def _jvm_cfg():
    cfg = PipelineConfig()
    cfg.dedup.hash_family = "jvm"
    return cfg


def _oph_cfg():
    cfg = PipelineConfig()
    cfg.dedup.hash_family = "oph"
    return cfg


def materialized_pages(spark, n, parts):
    """Generate + cache the corpus so detector timings exclude generation."""
    df = generate_pages(spark, n, num_partitions=parts)
    df = df.persist()
    df.count()
    return df


def parquet_pages(spark, n, parts):
    """Write the corpus to parquet once and read it back: pipelines then
    scan a real columnar table (the Iceberg stand-in) instead of an
    in-memory cached plan, and the per-rep ``clearCache()`` (which
    unpersists EVERYTHING) doesn't force a corpus regeneration. The cache
    path is keyed on a hash of the GENERATOR SOURCE as well as (n, parts):
    the synthetic corpus changed once already (round 2), and silently
    benchmarking a stale corpus would compare timings across different
    data while claiming the same input."""
    import hashlib
    import inspect
    import tempfile

    import deduplication_framework_spark.sources.pages as pages_mod

    gen_tag = hashlib.sha1(
        inspect.getsource(pages_mod).encode("utf-8")
    ).hexdigest()[:10]
    path = os.path.join(
        tempfile.gettempdir(), f"bench_pages_{n}_{parts}_{gen_tag}"
    )
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        generate_pages(spark, n, num_partitions=parts).write.mode(
            "overwrite"
        ).parquet(path)
    return spark.read.parquet(path)


def bench_distributed_cc(spark, n_nodes: int = 1_200_000, chain_len: int = 6000):
    """Force the DISTRIBUTED label-propagation CC loop (VERDICT r3 #6):
    every pipeline corpus so far resolves CC on the driver union-find fast
    path, so the iterative operator had no bench evidence. A 1.2M-edge
    chain graph (200 chains of 6000 nodes — diameter 6000, the worst case
    for propagation) must converge in O(log diameter) rounds; rounds and
    per-round changed-label counts land in the bench JSON, and the
    convergence bound is asserted, not just recorded."""
    import math

    from pyspark.sql import functions as F

    from deduplication_framework_spark.operators.connected_components import (
        connected_components,
    )

    stats = {
        "n_nodes": n_nodes,
        "n_edges": n_nodes - n_nodes // chain_len,
        "chain_len": chain_len,
    }

    def run():
        ids = spark.range(n_nodes)
        edges = ids.filter((F.col("id") + 1) % chain_len != 0).select(
            F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
        )
        rlog = []
        labels, rounds = connected_components(edges, round_stats=rlog)
        ncomp = labels.select("cluster_id").distinct().count()
        assert ncomp == n_nodes // chain_len, f"wrong components: {ncomp}"
        bound = math.ceil(math.log2(chain_len)) + 1
        assert rounds <= bound, f"CC took {rounds} rounds > bound {bound}"
        stats["rounds"] = rounds
        stats["round_changed"] = [d["n_changed"] for d in rlog]
        return ncomp

    return run, stats


def minhash_recall_evidence(spark, n_docs: int = 1000):
    """dup-pair recall vs the sequential reference-semantics LSH oracle on a
    planted corpus (the BASELINE.json >=0.99 criterion), surfaced in the
    bench JSON so the per-round driver artifact carries the evidence — not
    just the pytest suite (VERDICT r2, Next round #5)."""
    from deduplication_framework_spark.oracle import numpy_oracle as O

    cfg = PipelineConfig()
    pg = generate_pages(spark, n_docs, seed=42, with_truth=True,
                        num_partitions=CPUS)
    res = run_pipeline(spark, pg, cfg, detectors=["exact", "minhash"],
                       verify=False, collect_stats=False)
    labels = {r.doc_id: r.cluster_id for r in res.clusters.collect()}
    our_pairs = O.clusters_to_pairs(labels)
    txts = [
        r.text
        for r in pg.select("doc_order", "text").orderBy("doc_order").collect()
    ]
    ev = O.minhash_recall_evidence(txts, our_pairs, cfg, verified=False)
    spark.catalog.clearCache()
    return {
        "n_docs": n_docs,
        "n_oracle_pairs": int(ev["minhash.oracle_pairs"]),
        "recall": ev["minhash.recall_vs_sequential_lsh_oracle"],
    }


def skew_salting_evidence(spark, n_docs: int = 2000, bucket_cap: int = 8):
    """Bench-level skew evidence (VERDICT r3 #8): the planted boilerplate
    class creates hot LSH buckets; forcing ``bucket_cap`` far below their
    size switches them to salted star+chain pairing. The bench JSON then
    carries, per round, (a) proof the cap actually engaged
    (capped_band_rows > 0), (b) the hot-bucket magnitude, and (c) dup-pair
    recall vs the sequential reference-semantics LSH oracle, asserted
    >= 0.99 — the north-rule claim that capping bounds pair volume WITHOUT
    recall loss, measurable round-over-round (test_skew.py pins the same
    invariant at fixture scale)."""
    from deduplication_framework_spark.oracle import numpy_oracle as O

    cfg = PipelineConfig()
    cfg.spark.bucket_cap = bucket_cap
    pg = generate_pages(spark, n_docs, seed=42, with_truth=True,
                        num_partitions=CPUS)
    res = run_pipeline(spark, pg, cfg, detectors=["exact", "minhash"],
                       verify=False)
    capped = res.metrics.get("minhash.capped_band_rows", 0)
    assert capped > 0, "boilerplate corpus must trigger capping"
    labels = {r.doc_id: r.cluster_id for r in res.clusters.collect()}
    our_pairs = O.clusters_to_pairs(labels)
    txts = [
        r.text
        for r in pg.select("doc_order", "text").orderBy("doc_order").collect()
    ]
    # the SHARED recall-evidence helper (cfg-derived oracle params) — a
    # hand-rolled minhash_lsh_sequential(defaults) call here would silently
    # diverge from the pipeline config the day a default changes
    ev = O.minhash_recall_evidence(txts, our_pairs, cfg, verified=False)
    recall = ev["minhash.recall_vs_sequential_lsh_oracle"]
    assert recall >= 0.99, f"salted recall {recall:.4f} < 0.99"
    spark.catalog.clearCache()
    return {
        "n_docs": n_docs,
        "bucket_cap": bucket_cap,
        "capped_band_rows": capped,
        "max_bucket_size": res.metrics.get("minhash.max_bucket_size"),
        "n_buckets": res.metrics.get("minhash.n_buckets"),
        "n_oracle_pairs": int(ev["minhash.oracle_pairs"]),
        "recall_vs_oracle": recall,
    }


def _bloom_recrawl_frames(pages):
    """(old, new) batch shapes shared by the timed workload AND the
    parity-asserted evidence — one construction, so they cannot
    desynchronize (same rule as the skew bench's shared helper)."""
    from pyspark.sql import functions as F

    old = pages.filter("doc_order % 4 != 0").select("doc_order", "text")
    fresh = pages.filter("doc_order % 4 = 0").select("doc_order", "text")
    recrawl = old.filter("doc_order % 8 = 1").select(
        (F.col("doc_order") + 10_000_000).alias("doc_order"), "text"
    )
    return old, fresh.unionByName(recrawl)


def incremental_bloom_evidence(spark, pages):
    """Recrawl dedup evidence: the Bloom-prefiltered incremental path
    (operators/bloom.py) must return EXACTLY the plain anti-join's answer
    while routing only candidates into a join. The batch is the corpus's
    'new quarter' plus a re-crawled slice of the historical corpus under
    fresh ids — ~1/3 of the batch is already in history, the recrawl
    shape. The JSON carries candidate routing counts, the measured
    false-positive count (asserted under 1% of the definitely-new mass),
    and single-shot walls for both paths (context only — host-supply
    noise; the tracked minimum lives in the workload list)."""
    from pyspark.sql import functions as F

    from deduplication_framework_spark.operators.bloom import (
        incremental_new_rows,
    )
    from deduplication_framework_spark.operators.lsh import (
        release_census_caches,
    )

    old, new = _bloom_recrawl_frames(pages)

    t0 = time.time()
    res, stats = incremental_new_rows(new, old, key_col="text")
    res = res.persist()  # consumed by count + two exceptAll sides
    n_bloom = res.count()
    t_bloom = time.time() - t0

    t0 = time.time()
    plain = new.join(
        old.select(F.md5("text").alias("_k")).distinct(),
        F.md5(new["text"]) == F.col("_k"),
        "left_anti",
    ).persist()
    n_plain = plain.count()
    t_plain = time.time() - t0

    diff = (
        res.select("doc_order").exceptAll(plain.select("doc_order")).count()
        + plain.select("doc_order").exceptAll(res.select("doc_order")).count()
    )
    assert diff == 0 and n_bloom == n_plain, (
        f"bloom path diverged from anti-join: {n_bloom} vs {n_plain}, "
        f"symdiff {diff}"
    )
    n_true_dups = stats["n_new_batch"] - n_plain
    n_fp = stats["n_candidates"] - n_true_dups
    assert 0 <= n_fp <= max(20, 0.01 * stats["n_definite_new"] + 10), (
        f"bloom false positives out of budget: {n_fp}"
    )
    res.unpersist()
    plain.unpersist()
    release_census_caches()
    spark.catalog.clearCache()
    return {
        "n_batch": stats["n_new_batch"],
        "n_history": old.count(),
        "n_new": n_plain,
        "n_definite_new": stats["n_definite_new"],
        "n_candidates": stats["n_candidates"],
        "n_false_positive": n_fp,
        "verify_path": stats["verify_path"],
        "m_bits": stats["m_bits"],
        "k": stats["k"],
        "wall_bloom_once": round(t_bloom, 3),
        "wall_antijoin_once": round(t_plain, 3),
    }


def incremental_fuzzy_evidence(spark, pages):
    """Fuzzy recrawl evidence (operators/incremental_fuzzy.py): the same
    recrawl batch deduplicated against history at NEAR-dup semantics
    (MinHash-LSH candidates + exact-Jaccard verify, bipartite). Exact
    re-crawled copies are a recall GUARANTEE, not a probability: an
    identical text has an identical signature (collides in every band,
    Bloom filters have no false negatives) and verifies at J=1 — so every
    +10M recrawl id must be flagged dup, asserted hard. The guarantee's
    precondition (no history bucket hit old_bucket_cap, which is
    documented-lossy) is asserted first. Full no-bloom
    parity is pinned in tests/test_incremental_fuzzy.py; this keeps the
    scale evidence measurable round-over-round."""
    from deduplication_framework_spark.operators.incremental_fuzzy import (
        incremental_near_new_rows,
    )
    from deduplication_framework_spark.operators.lsh import (
        release_census_caches,
    )

    old, new = _bloom_recrawl_frames(pages)
    res, stats = incremental_near_new_rows(
        new, old, id_col="doc_order", text_col="text"
    )
    kept = {r.doc_order for r in res.select("doc_order").collect()}
    recrawl_ids = {
        r.doc_order
        for r in new.filter("doc_order >= 10000000")
        .select("doc_order")
        .collect()
    }
    # the guarantee only holds when no history bucket was capped (capping
    # is documented-lossy with accounting); assert the precondition first
    assert stats["n_capped_band_keys"] == 0, (
        f"unexpected capped history buckets at bench scale: {stats}"
    )
    missed = recrawl_ids & kept
    assert not missed, (
        f"exact recrawl copies survived fuzzy incremental dedup: "
        f"{sorted(missed)[:5]}"
    )
    release_census_caches()
    spark.catalog.clearCache()
    return {
        "n_batch": stats["n_new_batch"],
        "n_history": stats["n_old"],
        "n_new": len(kept),
        "n_definite_new": stats["n_definite_new"],
        "n_candidate_pairs": stats.get("n_candidate_pairs", 0),
        "n_dup_docs": stats.get("n_dup_docs", 0),
        "n_recrawl_exact": len(recrawl_ids),
        "recrawl_exact_caught": len(recrawl_ids - kept),
        "verify_path": stats["verify_path"],
        "max_old_bucket": stats["max_old_bucket"],
        "n_capped_band_keys": stats["n_capped_band_keys"],
    }


def bench_incremental_fuzzy(spark, pages):
    from deduplication_framework_spark.operators.incremental_fuzzy import (
        incremental_near_new_rows,
    )
    from deduplication_framework_spark.operators.lsh import (
        release_census_caches,
    )

    old, new = _bloom_recrawl_frames(pages)

    def run():
        res, _ = incremental_near_new_rows(
            new, old, id_col="doc_order", text_col="text"
        )
        n = res.count()
        release_census_caches()
        return n

    return run


def bench_incremental_bloom(spark, pages):
    from deduplication_framework_spark.operators.bloom import (
        incremental_new_rows,
    )
    from deduplication_framework_spark.operators.lsh import (
        release_census_caches,
    )

    old, new = _bloom_recrawl_frames(pages)

    def run():
        res, _ = incremental_new_rows(new, old, key_col="text")
        n = res.count()
        release_census_caches()
        return n

    return run


def _decontam_frames(pages):
    """(train, eval) split shared by the timed workload and the evidence
    (same one-construction rule as _bloom_recrawl_frames)."""
    ev = pages.filter("doc_order % 8 = 0").select("doc_order", "text")
    train = pages.filter("doc_order % 8 != 0").select("doc_order", "text")
    return train, ev


def _ssjoin_docs(pages, n_docs=None):
    """Word-bigram shingle sets — the realistic near-dup featurization
    AND the one prefix filtering wants: a SPARSE element universe.
    (Char-3-grams of kB-size docs live in a ~20k-element dense universe
    whose buckets approach all-pairs; word-shingle universes grow with
    the corpus, so rarest-first prefixes stay selective — the same
    sparsity reasoning as LSH shingling. See setjoin.py docstring.)
    Shingle rule shared with the gate query via text.word_bigram_sets."""
    from pyspark.sql import functions as F

    from deduplication_framework_spark.functions.text import word_bigram_sets

    d = pages if n_docs is None else pages.filter(
        F.col("doc_order") < n_docs
    )
    return word_bigram_sets(d, id_col="doc_order", lowercase=True)


def bench_ssjoin(spark, pages):
    """Exact prefix-filtered set-similarity join (operators/setjoin.py)
    over the full bench corpus — the non-approximate near-dup path."""
    from deduplication_framework_spark.operators.lsh import (
        release_census_caches,
    )
    from deduplication_framework_spark.operators.setjoin import ssjoin_jaccard

    docs = _ssjoin_docs(pages)

    def run():
        edges, _stats = ssjoin_jaccard(docs, threshold=0.8)
        n = edges.count()
        release_census_caches()
        return n

    return run


def ssjoin_evidence(spark, n_docs=1000):
    """Exactness evidence for the prefix-filtered join: on a SELF-
    CONTAINED small corpus (a doc_order slice of the bench corpus would
    orphan the planted dup pairs — partners sit far apart in doc_order),
    its edge set must EQUAL the all-pairs exact answer (verify over
    every src<dst pair, recall-safe size prefilter only) — the
    recall-1.0-by-theorem claim asserted hard per bench run, on a
    corpus where the answer is NON-EMPTY, plus the candidate-vs-
    allpairs contrast that is the operator's point."""
    from pyspark.sql import functions as F

    from deduplication_framework_spark.operators.lsh import (
        release_census_caches,
    )
    from deduplication_framework_spark.operators.setjoin import ssjoin_jaccard
    from deduplication_framework_spark.operators.verify import verify_jaccard

    docs = _ssjoin_docs(generate_pages(spark, n_docs, num_partitions=CPUS))
    edges, stats = ssjoin_jaccard(docs, threshold=0.8)
    got = {(r.src, r.dst) for r in edges.select("src", "dst").collect()}
    release_census_caches()

    feats = docs.select("doc_id", F.array_sort("grams").alias("lex")).persist()
    feats.count()  # eager: the ref job scans feats from 4 concurrent stages
    ids = feats.select("doc_id")
    allpairs = (
        ids.select(F.col("doc_id").alias("src"))
        .crossJoin(ids.select(F.col("doc_id").alias("dst")))
        .filter(F.col("src") < F.col("dst"))
    )
    ref = verify_jaccard(
        allpairs, feats, 0.8, id_col="doc_id", feat_col="lex"
    )
    want = {(r.src, r.dst) for r in ref.select("src", "dst").collect()}
    feats.unpersist()
    assert got == want, (
        f"prefix join diverged from all-pairs: {len(got)} vs {len(want)}"
    )
    spark.catalog.clearCache()
    return {
        "n_docs": n_docs,
        "n_allpairs": n_docs * (n_docs - 1) // 2,
        "n_candidates": stats["n_candidates"],
        "n_edges": len(got),
    }


def sorter_eval_evidence(spark, pages):
    """Sorter eval-mode parity artifact (VERDICT r4 #7): the reference's
    ``--eval`` writes a prediction CSV over its mix_dataset and claims
    full accuracy; here a deterministic 7-class swamp with ground truth
    KNOWN BY CONSTRUCTION (magic-typed binaries, key-typed JSON payloads,
    prose text, extensionless noise) is classified by the S2-S8 Arrow UDF
    and the accuracy rollup is HARD-ASSERTED == 1.0 — a decision-tree or
    magic-sniff regression fails the bench run."""
    import json as _json

    from pyspark.sql import functions as F

    from deduplication_framework_spark.functions.sorter import (
        make_classify_udf,
    )

    i = F.col("doc_order")
    name = (
        F.when(i % 7 == 0, F.concat(F.lit("f"), i, F.lit(".png")))
        .when(i % 7 == 1, F.concat(F.lit("f"), i, F.lit(".wav")))
        .when(i % 7 == 5, F.concat(F.lit("f"), i, F.lit(".txt")))
        .when(i % 7 == 6, F.concat(F.lit("f"), i, F.lit(".bin")))
        .otherwise(F.concat(F.lit("f"), i, F.lit(".json")))
    )
    content = (
        F.when(i % 7 == 0, F.lit(b"\x89PNG\r\n\x1a\n" + b"\x00" * 24))
        .when(i % 7 == 1, F.lit(b"RIFF\x24\x00\x00\x00WAVE" + b"\x00" * 20))
        .when(
            i % 7 == 2,
            F.encode(
                F.concat(F.lit('{"image_url": "x'), i, F.lit('.png"}')),
                "UTF-8",
            ),
        )
        .when(
            i % 7 == 3,
            F.encode(
                F.concat(F.lit('{"audio_path": "x'), i, F.lit('.wav"}')),
                "UTF-8",
            ),
        )
        .when(
            i % 7 == 4,
            F.encode(
                F.concat(
                    F.lit('{"text": '),
                    F.to_json(F.struct(F.substring("text", 1, 40))),
                    F.lit("}"),
                ),
                "UTF-8",
            ),
        )
        .when(i % 7 == 6, F.lit(b"\x01\x02\x03\x04" * 12))
        .otherwise(F.encode(F.substring("text", 1, 200), "UTF-8"))
    )
    expected = (
        F.when(i % 7 == 0, F.lit("image"))
        .when(i % 7 == 1, F.lit("audio"))
        # key-typed JSON payloads classify image/audio but the STRICT
        # extension demotion (reference sorter.py:314-317) sends a .json
        # carrying them to unknown — the demotion branch, exercised at
        # corpus scale on purpose
        .when(i % 7 == 2, F.lit("unknown"))
        .when(i % 7 == 3, F.lit("unknown"))
        .when(i % 7 == 4, F.lit("text"))
        .when(i % 7 == 5, F.lit("text"))
        .otherwise(F.lit("unknown"))
    )
    udf = make_classify_udf(strict=True)
    preds = pages.select(
        name.alias("name"),
        content.alias("content"),
        expected.alias("expected"),
    ).select(
        "expected", udf("name", "content").alias("category")
    )
    agg = preds.groupBy("expected", "category").count().collect()
    n_total = sum(r["count"] for r in agg)
    n_right = sum(r["count"] for r in agg if r.expected == r.category)
    acc = n_right / n_total
    assert acc == 1.0, (
        f"sorter eval accuracy {acc} != 1.0: "
        f"{[(r.expected, r.category, r['count']) for r in agg if r.expected != r.category]}"
    )
    per_cat = {}
    for r in agg:
        per_cat[r.expected] = per_cat.get(r.expected, 0) + r["count"]
    return {"n_files": n_total, "accuracy": acc, "per_class": per_cat}


def bench_decontaminate(spark, pages):
    from deduplication_framework_spark.operators.decontaminate import (
        remove_contaminated_spans,
    )
    from deduplication_framework_spark.operators.lsh import (
        release_census_caches,
    )

    train, ev = _decontam_frames(pages)

    def run():
        res, _ = remove_contaminated_spans(
            train, ev, n=8, id_col="doc_order"
        )
        n = res.count()
        release_census_caches()
        return n

    return run


def bench_repeated_substrings(spark, pages):
    """ExactSubstr removal (operators/spans.py) over the full bench corpus,
    production key_mode='hash' — the suffix-array cost class (one row per
    character position) with a 16-byte-key census shuffle."""
    from deduplication_framework_spark.operators.lsh import (
        release_census_caches,
    )
    from deduplication_framework_spark.operators.spans import (
        remove_repeated_substrings,
    )

    docs = pages.selectExpr("doc_order AS doc_id", "text")

    def run():
        out, _ = remove_repeated_substrings(
            docs, min_len=40, key_mode="hash"
        )
        n = out.count()
        release_census_caches()
        return n

    return run


def repeated_substring_evidence(spark, n_docs=2000):
    """Planted-truth asserts for ExactSubstr removal on the generator
    corpus (with_truth): every exact-class doc is FULLY removed (its
    byte-identical text occurs >= 2 times), every substring-class doc is
    touched but NOT fully removed (the planted shared span goes, the
    unique remainder stays), and NO unique-class doc is touched (zero
    false positives at min_len=40). raw (spec) and hash (production
    16-byte-key) modes must agree row-for-row."""
    from pyspark.sql import functions as F

    from deduplication_framework_spark.operators.lsh import (
        release_census_caches,
    )
    from deduplication_framework_spark.operators.spans import (
        remove_repeated_substrings,
    )

    truth = generate_pages(
        spark, n_docs, num_partitions=CPUS, with_truth=True
    ).selectExpr("doc_order AS doc_id", "text", "dup_class")
    docs = truth.select("doc_id", "text")
    out_hash, _ = remove_repeated_substrings(
        docs, min_len=40, key_mode="hash"
    )
    j = out_hash.join(truth.select("doc_id", "dup_class"), "doc_id")
    per_class = {
        r["dup_class"]: r
        for r in j.groupBy("dup_class")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                (F.col("n_removed_chars") == F.col("n_chars")).cast("int")
            ).alias("full"),
            F.sum((F.col("n_removed_chars") > 0).cast("int")).alias(
                "touched"
            ),
        )
        .collect()
    }
    ex, sub, uq = (
        per_class["exact"],
        per_class["substring"],
        per_class["unique"],
    )
    assert ex["full"] == ex["n"], f"exact not fully removed: {ex}"
    assert sub["touched"] == sub["n"] and sub["full"] == 0, (
        f"substring class wrong: {sub}"
    )
    assert uq["touched"] == 0, f"false positives on unique docs: {uq}"
    out_raw, _ = remove_repeated_substrings(docs, min_len=40, key_mode="raw")
    n_diff = (
        out_hash.select("doc_id", "text_clean")
        .exceptAll(out_raw.select("doc_id", "text_clean"))
        .count()
    )
    assert n_diff == 0, f"hash vs raw key-mode divergence: {n_diff} rows"
    release_census_caches()
    return {
        "n_docs": int(n_docs),
        "exact_fully_removed": int(ex["full"]),
        "substring_touched": int(sub["touched"]),
        "unique_false_positives": int(uq["touched"]),
        "hash_raw_divergent_rows": int(n_diff),
    }


def containment_evidence(spark, n_docs=800):
    """Planted-quote recall for the exact containment join
    (operators/setjoin.py::ssjoin_containment): every 10th bench doc
    gets a QUOTE doc holding a contiguous token slice of it — the
    quote's word bigrams are a subset of the source's, so containment
    is exactly 1.0 and every planted (quote, source) edge MUST appear
    at any threshold; asserted hard per run (full answer-set equality
    vs brute force is tests/test_containment.py's job)."""
    from pyspark.sql import functions as F

    from deduplication_framework_spark.operators.lsh import (
        release_census_caches,
    )
    from deduplication_framework_spark.operators.setjoin import (
        ssjoin_containment,
    )

    pg = generate_pages(spark, n_docs, num_partitions=CPUS)
    quotes = pg.filter(F.col("doc_order") % 10 == 0).select(
        (F.col("doc_order") + 1_000_000).alias("doc_order"),
        F.expr(
            "concat_ws(' ', slice(split(trim(text), '\\\\s+'), 2,"
            " greatest(CAST(size(split(trim(text), '\\\\s+')) * 0.7 AS INT),"
            " 3)))"
        ).alias("text"),
    )
    docs = _ssjoin_docs(
        pg.select("doc_order", "text").unionByName(quotes)
    )
    t0 = time.time()
    edges, stats = ssjoin_containment(docs, threshold=0.8)
    got = {(r.src, r.dst) for r in edges.select("src", "dst").collect()}
    sec = round(time.time() - t0, 3)
    # quotes too short to yield a bigram set emit no row — scope the
    # planted assertion to quotes that actually entered the join
    have_sets = {r._id for r in docs.selectExpr("doc_id AS _id").collect()}
    release_census_caches()
    planted = {
        (i + 1_000_000, i)
        for i in range(0, n_docs, 10)
        if i + 1_000_000 in have_sets and i in have_sets
    }
    missing = planted - got
    assert not missing, f"planted quotes missed: {sorted(missing)[:5]}"
    assert planted, "no planted quotes survived featurization"
    # LSH Ensemble on the SAME planted corpus (operators/lshensemble.py):
    # quote bigrams ⊂ source at |q| ≈ 0.7|s| → J ≈ 0.7, collision ~1 in
    # every feasible cell, so the planted recall must be >= 0.99 despite
    # the S-curve; asserted hard per run
    from deduplication_framework_spark.operators.lshensemble import (
        lshensemble_containment,
    )

    t0 = time.time()
    ens_edges, ens_stats = lshensemble_containment(
        docs, threshold=0.8, num_perm=64, num_partitions=8
    )
    ens_got = {(r.src, r.dst) for r in ens_edges.select("src", "dst").collect()}
    ens_sec = round(time.time() - t0, 3)
    release_census_caches()
    ens_recall = len(planted & ens_got) / len(planted)
    assert ens_recall >= 0.99, (
        f"ensemble dropped planted quotes: {sorted(planted - ens_got)[:5]}"
    )
    # precision is exact on both sides (verified edges) — the ensemble
    # may legitimately find a different near-threshold edge set, but
    # everything it emits is a true >= 0.8 containment
    return {
        "n_docs": int(n_docs),
        "n_planted_quotes": len(planted),
        "planted_recall": 1.0,
        "n_edges": len(got),
        "n_candidates": int(stats["n_candidates"]),
        "sec": sec,
        "ensemble_planted_recall": round(ens_recall, 5),
        "ensemble_n_edges": len(ens_got),
        "ensemble_n_candidates": int(ens_stats["n_candidates"]),
        "ensemble_sec": ens_sec,
    }

def decontaminate_evidence(spark, pages):
    """Span-removal decontamination evidence (operators/decontaminate.py):
    an exact-twin GUARANTEE asserted hard — a train doc whose lowercased
    token stream equals some eval doc's (≥ 8 tokens) shares every 8-gram
    with it, so every word position is covered and the doc must come out
    fully removed. The planted exact-dup classes in the bench corpus
    straddle the %8 split, so the twin set is non-trivial at sf scale.
    SQL-level answer parity is the driver gate's job
    (decontaminate_span_removal); this keeps the guarantee measurable
    round-over-round."""
    from pyspark.sql import functions as F

    from deduplication_framework_spark.operators.decontaminate import (
        remove_contaminated_spans,
    )
    from deduplication_framework_spark.operators.lsh import (
        release_census_caches,
    )

    train, ev = _decontam_frames(pages)
    res, stats = remove_contaminated_spans(train, ev, n=8, id_col="doc_order")
    res = res.persist()
    agg = res.agg(
        F.sum("n_removed").alias("rm"),
        F.sum(
            ((F.col("n_words") >= 8)
             & (F.col("n_removed") == F.col("n_words"))).cast("long")
        ).alias("emptied"),
    ).first()

    def keyed(df):
        return df.select(
            "doc_order",
            F.md5(
                F.lower(F.regexp_replace(F.trim("text"), r"\s+", " "))
            ).alias("_k"),
        )

    twins = keyed(train).join(
        keyed(ev).select("_k").distinct(), "_k", "left_semi"
    )
    twin_rows = twins.join(res, "doc_order").filter("n_words >= 8").persist()
    n_twins = twin_rows.count()
    n_missed = twin_rows.filter("n_removed <> n_words").count()
    assert n_missed == 0, (
        f"{n_missed} exact-twin train docs survived span decontamination"
    )
    res.unpersist()
    twin_rows.unpersist()
    release_census_caches()
    spark.catalog.clearCache()
    return {
        "n_eval_grams": stats["n_eval_grams"],
        "n_docs_hit": stats["n_contaminated"],
        "n_words_removed": int(agg["rm"] or 0),
        "n_docs_emptied": int(agg["emptied"] or 0),
        "n_exact_twins": n_twins,
        "exact_twins_fully_removed": n_twins - n_missed,
        "eval_join_path": stats["eval_join_path"],
    }


def _stream_batches_path(spark, pages, n_batches: int) -> str:
    """Write the bench corpus once as ``n_batches`` sequential parquet
    slices (b0..bN dirs) — the micro-batch source for the streaming
    workload. Keyed like parquet_pages: generator-source tag included,
    so a corpus change can never silently serve stale micro-batches
    (the round-2 lesson)."""
    import hashlib
    import inspect
    import tempfile

    import deduplication_framework_spark.sources.pages as pages_mod

    gen_tag = hashlib.sha1(
        inspect.getsource(pages_mod).encode("utf-8")
    ).hexdigest()[:10]
    base = os.path.join(
        tempfile.gettempdir(),
        f"bench_stream_{N_PAGES}_{n_batches}_{gen_tag}",
    )
    if not os.path.exists(os.path.join(base, "_DONE")):
        from pyspark.sql import functions as F

        per = max(1, (N_PAGES + n_batches - 1) // n_batches)
        for i in range(n_batches):
            (
                pages.filter(
                    (F.col("doc_order") >= i * per)
                    & (F.col("doc_order") < (i + 1) * per)
                )
                .select("doc_order", "text")
                .coalesce(4)
                .write.mode("overwrite")
                .parquet(os.path.join(base, f"b{i}"))
            )
        open(os.path.join(base, "_DONE"), "w").close()
    return base


def bench_streaming_minhash(spark, pages, n_batches: int = 4):
    """Stateful streaming MinHash-LSH, raw text in (VERDICT r4 #6: the
    state-path perf had no bench presence): the bench corpus arrives as
    ``n_batches`` micro-batches through stream_text_candidates →
    applyInPandasWithState per-bucket matching. Returns (run, evidence):
    the run is a tracked minimum like every workload; the evidence dict
    asserts the accounting — edges found, NO evictions at the default
    state cap (buckets here are orders of magnitude under it), and
    docs/s across the whole multi-trigger query. Exact cross-micro-batch
    pair parity with the batch band-collision set is pinned in
    tests/test_streaming.py."""
    import shutil
    import tempfile

    from deduplication_framework_spark.streaming.stateful import (
        stream_text_candidates,
    )

    src = _stream_batches_path(spark, pages, n_batches)
    counter = {"i": 0}
    evidence: dict = {"n_batches": n_batches, "n_docs": N_PAGES}

    def run():
        counter["i"] += 1
        qname = f"bench_stream_{counter['i']}"
        ckpt = tempfile.mkdtemp(prefix="bench_stream_ckpt_")
        stream = (
            spark.readStream.schema("doc_order long, text string")
            .option("maxFilesPerTrigger", 4)
            .parquet(os.path.join(src, "b*"))
        )
        out = stream_text_candidates(stream, detector="minhash")
        q = (
            out.writeStream.format("memory")
            .queryName(qname)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        res = spark.sql(
            f"SELECT count(DISTINCT struct(src, dst)) AS edges,"
            f" max(n_state_evicted) AS ev FROM {qname}"
            f" WHERE src IS NOT NULL"
        ).first()
        spark.catalog.dropTempView(qname)
        shutil.rmtree(ckpt, ignore_errors=True)
        assert (res.ev or 0) == 0, (
            f"unexpected state eviction at bench scale: {res.ev}"
        )
        assert res.edges > 0, "streaming LSH found no candidate edges"
        evidence["n_candidate_edges"] = int(res.edges)
        evidence["max_evicted"] = int(res.ev or 0)
        return res.edges

    return run, evidence


def main():
    scaling = "--scaling" in sys.argv
    reps = int(os.environ.get("BENCH_REPS", "2"))
    spark = get_spark(app_name="bench", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)

    pages = parquet_pages(spark, N_PAGES, CPUS * 2)

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    workloads = [
        ("pages_minhash_e2e", bench_pages_pipeline(spark, pages, ["exact", "minhash"])),
        # the 100-TB throughput path: same pipeline, vectorized kr32
        # feature hashing instead of per-feature sha1 (datasketch parity)
        ("pages_minhash_kr32_e2e", bench_pages_pipeline(
            spark, pages, ["exact", "minhash"], cfg=_kr32_cfg())),
        # the Python-worker-free path: featurization entirely in JVM
        # expressions (functions/jvm_minhash.py) — tracks the cost of
        # trading the Arrow pass for zero Python workers
        ("pages_minhash_jvm_e2e", bench_pages_pipeline(
            spark, pages, ["exact", "minhash"], cfg=_jvm_cfg())),
        # One-Permutation Hashing: kr32 feature hashes + one-pass
        # densified signatures (functions/oph.py) — tracks the O(F+K)
        # sig-construction family round-over-round
        ("pages_minhash_oph_e2e", bench_pages_pipeline(
            spark, pages, ["exact", "minhash"], cfg=_oph_cfg())),
        ("pages_simhash_e2e", bench_pages_pipeline(spark, pages, ["simhash"])),
        ("pages_substring_e2e", bench_pages_pipeline(spark, pages, ["substring"])),
        ("pages_suffix_array_e2e", bench_pages_pipeline(spark, pages, ["suffix_array"])),
        # the production shape: all text detectors in ONE pipeline — the fused
        # featurization pass + concurrent detector DAGs amortize across them
        ("pages_all_detectors_e2e", bench_pages_pipeline(
            spark, pages, ["exact", "minhash", "simhash", "substring"])),
    ]
    cc_run, cc_stats = bench_distributed_cc(spark)
    workloads.append(("cc_distributed_chain_1m2_edges", cc_run))
    stream_run, stream_stats = bench_streaming_minhash(spark, pages)
    workloads.append(("streaming_minhash_lsh_e2e", stream_run))
    workloads.append(("incremental_bloom_e2e", bench_incremental_bloom(spark, pages)))
    workloads.append(("incremental_fuzzy_e2e", bench_incremental_fuzzy(spark, pages)))
    workloads.append(("decontaminate_e2e", bench_decontaminate(spark, pages)))
    workloads.append(
        ("repeated_substrings_e2e", bench_repeated_substrings(spark, pages))
    )
    workloads.append(("ssjoin_exact_edges", bench_ssjoin(spark, pages)))
    workloads += [
        (f"q_{name}", (lambda n: lambda: qs[n](spark, SF_DIR).count())(name))
        for name in [
            "minhash_clusters",
            "exact_dup_groups",
            "normalize_text",
            "token_counts",
            "ann_topk_bruteforce",
            "srp_dup_edges",
            "lineitem_pricing_summary",
            "orders_per_customer_nation",
            "doc_repetition_signals",
            "lm_perplexity_buckets",
            "dsir_importance_weights",
            "sequence_packing",
            "url_block_flags",
            "containment_edges",
            "tfidf_top_terms",
        ]
    ]

    # interleaved reps, per-query MINIMUM (the --scaling methodology applied
    # to the driver-facing path — VERDICT r2, Next round #2): the sandbox
    # host's CPU supply fluctuates several-fold minute to minute, and a
    # single sequential pass pins each query to whatever the host happened
    # to supply during its slot. Persisted frames are cleared between runs —
    # Spark's canonicalized-plan cache would otherwise turn later reps of
    # the same pipeline into cache reads.
    # one small untimed warmup that exercises every detector's code path
    # (JIT, whole-stage codegen, Arrow python-worker spin-up): first-use
    # costs run 2-4x over steady state and a production long-running job
    # never pays them per query, so they don't belong in the minima
    from pyspark.sql import functions as F

    warm = pages.filter(F.col("doc_order") < 2000)
    run_pipeline(
        spark, warm, PipelineConfig(),
        detectors=["exact", "minhash", "simhash", "substring", "suffix_array"],
        collect_stats=False,
    ).keepers.count()
    spark.catalog.clearCache()

    all_times = {name: [] for name, _ in workloads}
    for _rep in range(reps):
        for name, fn in workloads:
            spark.catalog.clearCache()
            sec, _ = _timed(fn)
            all_times[name].append(round(sec, 3))
    # adaptive outlier pass: a host-supply dip can poison BOTH reps of one
    # workload (the dips last minutes — exactly one suite pass); any
    # workload whose samples disagree >1.5x gets ONE extra rep so the
    # minimum reflects the plan, not the co-tenant
    for name, fn in workloads:
        ts = all_times[name]
        if min(ts) > 0.5 and max(ts) / min(ts) > 1.5:
            spark.catalog.clearCache()
            sec, _ = _timed(fn)
            all_times[name].append(round(sec, 3))
    results = {name: min(ts) for name, ts in all_times.items()}

    recall = minhash_recall_evidence(spark)
    skew = skew_salting_evidence(spark)
    inc_bloom = incremental_bloom_evidence(spark, pages)
    inc_fuzzy = incremental_fuzzy_evidence(spark, pages)
    decontam = decontaminate_evidence(spark, pages)
    ssjoin = ssjoin_evidence(spark)
    rep_sub = repeated_substring_evidence(spark)
    containment = containment_evidence(spark)
    sorter_eval = sorter_eval_evidence(spark, pages)

    scaling_report = None
    if scaling:
        spark.stop()
        scaling_report = run_scaling()

    total = round(sum(results.values()), 3)
    stream_stats["docs_per_sec"] = round(
        N_PAGES / results["streaming_minhash_lsh_e2e"], 1
    )
    evidence = {
        "all_reps": all_times,
        "minhash_recall_vs_oracle": recall,
        "distributed_cc": cc_stats,
        "skew_salting": skew,
        "incremental_bloom": inc_bloom,
        "incremental_fuzzy": inc_fuzzy,
        "decontaminate": decontam,
        "ssjoin": ssjoin,
        "repeated_substrings": rep_sub,
        "containment": containment,
        "streaming_minhash": stream_stats,
        "sorter_eval": sorter_eval,
    }
    if scaling_report:
        evidence["scaling"] = scaling_report
    # Full payload -> sidecar file + an EARLY stdout line. The driver
    # tail-captures stdout and parses the FINAL line; BENCH_r04 came back
    # parsed:null because one giant line (all_reps + seven evidence
    # dicts) outgrew the capture window (VERDICT r4, What's wrong #2).
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/evidence_last_run.json", "w") as fh:
        json.dump(evidence, fh, indent=2)
    print(json.dumps({"evidence": evidence}))
    line = {
        "metric": "total_sec",
        "value": total,
        "unit": "sec",
        "queries": results,
        "sf": SF,
        "n_pages": N_PAGES,
        "reps": reps,
        "evidence_file": "BENCH/evidence_last_run.json",
        "evidence_asserts": "green",  # every evidence dict hard-asserts
        "recall": {
            "minhash_vs_oracle": recall["recall"],
            "skew_salted": skew["recall_vs_oracle"],
            "containment_planted": containment["planted_recall"],
            "containment_ensemble": containment["ensemble_planted_recall"],
        },
    }
    print(json.dumps(line))  # compact FINAL line — the parse target


def _burn(seconds: float) -> int:
    t0 = time.time()
    c = 0
    while time.time() - t0 < seconds:
        c += 1
    return c


def _effective_cores(seconds: float = 1.0) -> float:
    """Measure the host's ACTUAL parallel CPU supply (the sandbox VM's
    backing fluctuates): 32 spinning processes, total/maximum work ratio."""
    import multiprocessing as mp

    with mp.Pool(32) as p:
        res = p.map(_burn, [seconds] * 32)
    return round(sum(res) / max(res), 1)


def run_scaling():
    """Same minhash job at N and 4N local cores on the identical corpus.

    Default pair is local[2] vs local[8] (override BENCH_SCALE_CORES=
    "8,32"): a local[k] UDF job runs k JVM task threads PLUS k Python
    workers concurrently, so local[32] demands 64 runnable threads from a
    host that supplies only ~25 effective cores — local[8]→local[32]
    measures host oversubscription, not the plan's scaling. 2→8 keeps BOTH
    configs (4 and 16 runnable threads) within the host's real silicon.

    Uses a >=200k-doc corpus: after the round-2 fusion the 100k job fell to
    ~23 s wall, mostly fixed stage-wave latency — scaling is unmeasurable
    there; at 200k the signature/banding compute dominates again."""
    from pyspark.sql import SparkSession

    n = int(os.environ.get("BENCH_SCALE_PAGES", str(max(200_000, N_PAGES))))
    reps = int(os.environ.get("BENCH_SCALE_REPS", "2"))
    lo, hi = (
        int(x)
        for x in os.environ.get("BENCH_SCALE_CORES", "2,8").split(",")
    )
    # interleave configs and keep the per-config MINIMUM: the sandbox host's
    # throughput fluctuates (shared machine), and min-of-interleaved is the
    # standard defense — a slow phase then penalizes both configs equally
    times = {lo: [], hi: []}
    supply = {lo: [], hi: []}
    for _rep in range(reps):
        for cores in (lo, hi):
            active = SparkSession.getActiveSession()
            if active:
                active.stop()
            supply[cores].append(_effective_cores())
            spark = get_spark(
                app_name=f"bench-scaling-{cores}",
                master=f"local[{cores}]",
                shuffle_partitions=cores,
            )
            pages = materialized_pages(spark, n, cores * 2)
            t0 = time.time()
            res = run_pipeline(
                spark, pages, PipelineConfig(), detectors=["exact", "minhash"],
                collect_stats=False,
            )
            res.keepers.count()
            times[cores].append(time.time() - t0)
            pages.unpersist()
            spark.stop()
    out = {}
    for cores in (lo, hi):
        best = min(times[cores])
        out[f"local[{cores}]"] = {
            "sec": round(best, 3),
            "docs_per_sec": round(n / best, 1),
            "all_runs_sec": [round(t, 1) for t in times[cores]],
            "host_effective_cores_before_runs": supply[cores],
        }
    tlo, thi = out[f"local[{lo}]"]["sec"], out[f"local[{hi}]"]["sec"]
    ratio = hi / lo
    out["cores"] = [lo, hi]
    out[f"speedup_{lo}_to_{hi}"] = round(tlo / thi, 3)
    out["scaling_efficiency"] = round((tlo / thi) / ratio, 3)
    _write_bench_md(out, n, lo, hi)
    return out


def _write_bench_md(out, n, lo, hi):
    ratio = hi // lo
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/scaling_last_run.md", "w") as fh:
        fh.write(
            f"""# BENCH — throughput & scaling (sandbox proxy)

North-rule criterion: >=0.8 throughput scaling efficiency from N to 4N
executors. No real cluster exists in this sandbox, so the evidence is the
same MinHash+exact dedup job on the identical {n}-doc synthetic pages corpus
at two local parallelism levels ({lo} vs {hi} cores, same machine, same
input — a local[k] UDF job runs k JVM threads + k Python workers, so the
upper config must stay within the host's ~25 effective cores).
Runs are interleaved and the per-config minimum is reported — the sandbox
host's throughput fluctuates several-fold between runs (co-tenancy), so
single measurements are unreliable:

| cores | best wall sec | docs/sec | all reps (sec) |
|---|---|---|---|
| local[{lo}]  | {out[f'local[{lo}]']['sec']} | {out[f'local[{lo}]']['docs_per_sec']} | {out[f'local[{lo}]']['all_runs_sec']} |
| local[{hi}] | {out[f'local[{hi}]']['sec']} | {out[f'local[{hi}]']['docs_per_sec']} | {out[f'local[{hi}]']['all_runs_sec']} |

speedup {lo}→{hi} ({ratio}x cores): **{out[f'speedup_{lo}_to_{hi}']}x**
scaling efficiency (speedup/{ratio}): **{out['scaling_efficiency']}**

Caveats: single-JVM local mode shares one driver, one disk-backed shuffle
and fixed per-stage scheduling costs, so this is a lower bound on the
efficiency a real {ratio}x executor scale-out would show for this
embarrassingly parallel signature+bucket workload. Reference single-node
numbers for context: BASELINE.md (4.25K files/s sorter; text dedup +14% vs
standard MinHash).
"""
        )


if __name__ == "__main__":
    main()
