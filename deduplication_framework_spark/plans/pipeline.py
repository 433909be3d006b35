"""The end-to-end dedup pipeline plan (SURVEY.md §7 design spine):

pages → docs (text extraction + doc ids) → exact-hash dedup →
shingles → [minhash | simhash | substring] detectors → verified edges →
connected components → clusters → keepers, with per-stage checkpoints.

Replaces the reference's PipelineOrchestrator
(``/root/reference/pipelines/orchestrator.py:26-1731``): stages are pure
DataFrame→DataFrame functions; process boundaries, chunk manifests, conda-env
subprocesses and env-var IPC all disappear — the only parallelism primitive
is the Spark task, and resumability is the table store's config-hash commit
(reference analog orchestrator.py:65-83).
"""

from __future__ import annotations

import hashlib
import json
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from deduplication_framework_spark.config import PipelineConfig
from deduplication_framework_spark.functions import kernels as K
from deduplication_framework_spark.functions.jvm_minhash import (
    jvm_minhash_features,
)
from deduplication_framework_spark.functions.text import (
    make_fused_features_udf,
    make_lsh_features_udf,
    make_minhash_udf,
    make_shingles_udf,
    make_simhash_udf,
    make_winnow_udf,
)
from deduplication_framework_spark.operators.cluster import (
    clusters_from_edges,
    keepers as keepers_op,
)
from deduplication_framework_spark.operators.exact import exact_dedup
from deduplication_framework_spark.operators.lsh import (
    candidate_pairs,
    minhash_bands,
    release_census_caches,
    simhash_bands,
    simhash_candidate_edges,
)
from deduplication_framework_spark.operators.verify import (
    verify_hamming,
    verify_jaccard,
)
from deduplication_framework_spark.plans.checkpoint import ParquetTableStore

ALL_DETECTORS = ("exact", "minhash", "simhash", "substring", "suffix_array")


def effective_config_hash(
    cfg: PipelineConfig, detectors: List[str], verify: bool,
    input_tag: str = "",
) -> str:
    """Stage-resume key. ``detectors`` and ``verify`` are run_pipeline
    arguments, not PipelineConfig fields — folding them in prevents a re-run
    against the same checkpoint dir with a different --detectors list or
    --no-verify flag from silently reusing stale edges/clusters/keepers.
    ``input_tag`` marks input-side preprocessing (e.g. the CLI's
    --span-dedup) the same way; the empty default leaves the hash identical
    to pre-tag checkpoints."""
    payload = (
        cfg.config_hash()
        + json.dumps(sorted(set(detectors)))
        + str(bool(verify))
        + input_tag
    )
    return hashlib.sha256(payload.encode("utf-8")).hexdigest()


@dataclass
class PipelineResult:
    docs: DataFrame
    edges: DataFrame
    clusters: DataFrame
    keepers: DataFrame
    cc_rounds: int
    metrics: Dict[str, float] = field(default_factory=dict)


def prepare_docs(
    pages: DataFrame,
    id_col: str = "doc_order",
) -> DataFrame:
    """pages → docs(doc_id, url, text, lang). doc_id = explicit order column
    when present (deterministic input order, the reference's insertion-order
    analog), else a rank over (warc_ts, url)."""
    if id_col in pages.columns:
        return pages.select(
            F.col(id_col).cast("long").alias("doc_id"), "url", "text", "lang"
        )
    # no explicit order column: derive a deterministic dense id over
    # (warc_ts, url) with the distributed range-sort + zipWithIndex ranker
    # (a global Window.orderBy would single-partition at corpus scale)
    from deduplication_framework_spark.operators.suffix_array import _dense_rank

    keyed = pages.select("url", "warc_ts", "text", "lang")
    ranks = _dense_rank(keyed, ["warc_ts", "url"]).withColumnRenamed(
        "rank", "doc_id"
    )
    return keyed.join(ranks, ["warc_ts", "url"]).select(
        "doc_id", "url", "text", "lang"
    )


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    cfg: Optional[PipelineConfig] = None,
    detectors: List[str] = ("exact", "minhash", "simhash"),
    verify: bool = True,
    store: Optional[ParquetTableStore] = None,
    collect_stats: bool = True,
    input_tag: str = "",
) -> PipelineResult:
    """Run the full dedup DAG. ``verify=False`` reproduces the reference's
    ours_lsh behavior (any band collision is accepted as a duplicate edge).

    With a ``store``, each stage is committed and skipped on re-run when the
    config hash matches (resumable restarts); callers that preprocessed
    ``pages`` pass a distinguishing ``input_tag`` so toggling the
    preprocessing cannot resume stale stages."""
    cfg = cfg or PipelineConfig()
    unknown = set(detectors) - set(ALL_DETECTORS)
    if unknown:
        raise ValueError(
            f"unknown detector(s) {sorted(unknown)}; valid: {ALL_DETECTORS}"
        )
    chash = effective_config_hash(cfg, detectors, verify, input_tag)
    metrics: Dict[str, float] = {}

    def stage(name: str, make: "callable", lineage: List[str], m: Dict = None,
              persist: bool = False):
        """config-hash resume wrapper: reuse a committed stage, else compute.

        ``persist=True`` marks stages consumed by >1 downstream action: with
        a store they are materialized to parquet anyway; without one they are
        cached so UDF stages don't recompute per action."""
        if store is not None and store.is_valid(name, chash):
            metrics[f"{name}.resumed"] = 1.0
            return store.read(name)
        df = make()
        if store is not None:
            df = store.write(df, name, chash, lineage=lineage, metrics=m or {})
        elif persist:
            df = df.persist()
        return df

    docs = stage("docs", lambda: prepare_docs(pages), ["pages"])

    # ---- stage 1: exact dedup (always first — cheap, huge win on CC corpora)
    # md5 (128-bit): at 10^12-doc corpus scale a 64-bit text hash has a
    # real birthday-collision expectation (~(10^10 distinct)^2/2^65 ≈ 3
    # false merges); 128 bits puts it at ~1e-19 — same risk budget as
    # the suffix-array 128-bit gram keys. One JVM hash per doc; cost is
    # noise next to featurization.
    uniq_docs, exact_edges = exact_dedup(docs, hash_fn="md5")
    if "exact" not in detectors:
        uniq_docs, exact_edges = docs, exact_edges.limit(0)
    uniq_docs = stage("docs_uniq", lambda: uniq_docs, ["docs"], persist=True)

    edge_parts: List[DataFrame] = [exact_edges]

    # ---- fused featurization: ONE Arrow pass over docs_uniq computes every
    # enabled detector's per-doc features (minhash sig + LSH verification
    # shingles + simhash fingerprint + winnowing fingerprints). Round 1 ran
    # 3 separate UDF stages over the same texts, re-normalizing per stage and
    # sha1-hashing the same features twice — fusing them shares the
    # normalization and the sha1 digests (VERDICT round 1, Next round #2).
    need_sig = "minhash" in detectors
    need_feats = verify and need_sig
    need_simhash = "simhash" in detectors
    need_winnow = "substring" in detectors
    # hash_family="jvm": minhash featurization is per-row JVM expressions
    # (functions/jvm_minhash.py — zero Python workers, zero shuffle); the
    # fused Arrow pass then only runs for the detectors that need it
    jvm_mh = need_sig and getattr(cfg.dedup, "hash_family", "sha1") == "jvm"
    arrow_sig = need_sig and not jvm_mh
    arrow_feats = need_feats and not jvm_mh
    feats = None
    if arrow_sig or need_simhash or need_winnow:
        fused_udf = make_fused_features_udf(
            cfg.embedding,
            cfg.dedup,
            with_minhash=arrow_sig,
            with_lsh_feats=arrow_feats,
            with_simhash=need_simhash,
            with_winnow=need_winnow,
            kgram=cfg.suffix.kgram_size,
            window=cfg.suffix.winnow_window,
        )
        feats = stage(
            "features",
            lambda: uniq_docs.select(
                "doc_id", fused_udf("text").alias("f")
            ).select("doc_id", "f.*"),
            ["docs_uniq"],
            persist=True,
        )
        if store is None and (arrow_sig or need_simhash):
            # materialize the fused UDF pass ONCE before the detector DAGs
            # fan out. persist() alone does NOT prevent duplicate work here:
            # a single downstream job contains several independent shuffle-
            # map stages over feats (banding, verify join, simhash bands,
            # winnow explode), the scheduler runs them CONCURRENTLY, and
            # they race to fill the cache — each recomputing the whole
            # Arrow pass (measured 4x wall-time blowup at 200k docs). One
            # cheap count() turns the race into one compute + N cache reads.
            # The race needs >1 independent traversal: minhash (bands +
            # verify) and simhash (small/salt/hot edge branches) both fan
            # out over feats inside one job, but a substring-only run is a
            # single stage chain — skip the extra materialization job there
            # (one fewer full wave on short runs).
            feats.count()
    mh_feats = feats
    if jvm_mh:
        mh_feats = stage(
            "features_minhash_jvm",
            lambda: jvm_minhash_features(
                uniq_docs,
                num_perm=cfg.dedup.num_perm,
                ngram_size=cfg.embedding.ngram_size,
                max_words=cfg.dedup.max_words,
                max_char_grams=cfg.dedup.max_char_grams,
                emb=cfg.embedding,
            ),
            ["docs_uniq"],
            persist=True,
        )
        if store is None:
            # same fan-out race as feats above: banding + the verify join
            # both traverse mh_feats inside one downstream job
            mh_feats.count()
    lsh_feats = mh_feats.select("doc_id", "shingles") if need_feats else None

    # ---- detector branches: each returns (edges, stats-with-detector-col).
    # Stats are NOT collected here — they are unioned into ONE deferred job
    # after all branches are declared, so detector DAGs run concurrently
    # (round 1 ran an eager 1-row collect() per detector, serializing them).
    def _resume_branch(name: str, det: str):
        """Resumed detector: reuse the committed edges AND its recorded
        bucket metrics (the deferred stats job wrote them into the commit)
        instead of re-running the banding jobs."""
        c = store.read_commit(name)
        if c is not None:
            for k, v in c.metrics.items():
                metrics[f"{det}.{k}"] = float(v)
        return stage(name, None, []), None

    def _minhash_branch():
        name = "edges_minhash"
        if store is not None and store.is_valid(name, chash):
            return _resume_branch(name, "minhash")
        b, r = K.optimal_band_param(cfg.dedup.threshold, cfg.dedup.num_perm)
        sigs = mh_feats.select("doc_id", "sig")
        # no bands.persist() here: candidate_pairs' build-time census
        # persists + materializes the sized band table, after which bands
        # itself has exactly one consumer (filling that cache)
        bands = minhash_bands(sigs, b, r)
        pairs, bstats = candidate_pairs(bands, bucket_cap=cfg.spark.bucket_cap)
        if verify:
            mh_edges = verify_jaccard(pairs, lsh_feats, cfg.dedup.threshold)
        else:
            mh_edges = pairs.withColumn("sim", F.lit(None).cast("double"))
        mh_edges = stage(
            name,
            lambda: mh_edges,
            ["features_minhash_jvm" if jvm_mh else "features"],
        )
        return mh_edges, bstats.withColumn("detector", F.lit("minhash"))

    def _simhash_branch():
        name = "edges_simhash"
        if store is not None and store.is_valid(name, chash):
            return _resume_branch(name, "simhash")
        fps = feats.select("doc_id", "simhash")
        sh_edges, sbstats = simhash_candidate_edges(
            fps,
            dist=cfg.dedup.simhash_dist,
            bucket_cap=cfg.spark.simhash_bucket_cap,
        )
        sh_edges = stage(name, lambda: sh_edges, ["features"])
        return sh_edges, sbstats.withColumn("detector", F.lit("simhash"))

    def _substring_branch():
        name = "edges_substring"
        if store is not None and store.is_valid(name, chash):
            return _resume_branch(name, "substring")
        # docs sharing any winnowing fingerprint share a k-gram (exact
        # substring); bucket_cap=1 because a fingerprint bucket is a TRUE
        # clique (every member provably shares the same k-gram) — star+chain
        # connectivity is exactly equivalent to all-pairs after connected
        # components, linear pair volume with zero recall loss
        sub_bands = feats.select(
            "doc_id",
            F.lit(0).alias("band_idx"),
            F.explode("winnow").alias("band_key"),
        )
        sub_pairs, substats = candidate_pairs(sub_bands, bucket_cap=1)
        sub_edges = sub_pairs.select("src", "dst", F.lit(1.0).alias("sim"))
        sub_edges = stage(name, lambda: sub_edges, ["features"])
        return sub_edges, substats.withColumn("detector", F.lit("substring"))

    def _suffix_array_branch():
        name = "edges_suffix_array"
        if store is not None and store.is_valid(name, chash):
            return _resume_branch(name, "suffix_array")
        from deduplication_framework_spark.operators.suffix_array import (
            substring_edges_suffix_array,
        )

        # bucket_cap=1: rank buckets are true cliques (identical L-char
        # prefix), star+chain is exactly equivalent after CC
        # no cache_bands: with bucket_cap=1 the band table has exactly one
        # consumer (the fused window census inside candidate_pairs, which
        # persists its own multi-member-bucket frame for the stats job)
        sa_edges, sa_stats = substring_edges_suffix_array(
            uniq_docs,
            cfg.suffix.min_match_chars,
            bucket_cap=1,
            # uniq_docs is already exact-deduped when the exact detector
            # ran — skip the operator's own collapse shuffle then
            collapse_exact="exact" not in detectors,
        )
        sa_edges = stage(name, lambda: sa_edges, ["docs_uniq"])
        return sa_edges, sa_stats.withColumn("detector", F.lit("suffix_array"))

    branch_fns = {
        "minhash": _minhash_branch,
        "simhash": _simhash_branch,
        "substring": _substring_branch,
        "suffix_array": _suffix_array_branch,
    }
    branches = [branch_fns[d] for d in detectors if d in branch_fns]
    if store is not None and len(branches) > 1:
        # O4 parallel detector dispatch (reference orchestrator.py:1412-1440
        # analog): with a store each branch ends in an independent parquet
        # write — submit them as concurrent Spark jobs. The shared features
        # stage is already committed above, so branches only read it.
        with ThreadPoolExecutor(max_workers=len(branches)) as ex:
            outs = [f.result() for f in [ex.submit(b) for b in branches]]
    else:
        # without a store, branch DECLARATION is mostly lazy — the single
        # stats job below (or the caller's first action) schedules the
        # detector stages in one Spark job, which runs independent stages
        # concurrently by itself. Exception: the simhash branch runs one
        # small census job at build time (its adaptive hot-bucket switch
        # needs the bucket-size census on the driver; see
        # simhash_candidate_edges) — so a simhash plan is not free to
        # construct, it costs featurization + one band-window pass.
        outs = [b() for b in branches]
    edge_parts.extend(o[0] for o in outs)
    stats_parts = [o[1] for o in outs if o[1] is not None]

    if collect_stats and stats_parts:
        allstats = stats_parts[0]
        for s in stats_parts[1:]:
            # allowMissingColumns: simhash stats carry an extra
            # n_hot_band_rows column (first-level hot rows, handled
            # exactly by recursive pigeonhole; n_capped_band_rows is the
            # lossy-fallback count for every detector)
            allstats = allstats.unionByName(s, allowMissingColumns=True)
        for row in allstats.collect():
            rowd = row.asDict()
            det = row["detector"]
            det_stats = {
                "n_buckets": float(row["n_buckets"] or 0),
                "capped_band_rows": float(row["n_capped_band_rows"] or 0),
                "max_bucket_size": float(row["max_bucket_size"] or 0),
            }
            if rowd.get("n_hot_band_rows") is not None:
                det_stats["hot_band_rows"] = float(rowd["n_hot_band_rows"])
            for k, v in det_stats.items():
                metrics[f"{det}.{k}"] = v
            if store is not None:
                # record onto the edges commit so resumed runs read the
                # metrics back instead of re-running the banding jobs
                store.update_metrics(f"edges_{det}", det_stats)

    edges = edge_parts[0]
    for e in edge_parts[1:]:
        edges = edges.unionByName(e)
    edges = stage(
        "edges", lambda: edges.select("src", "dst", "sim"), ["detectors"],
        persist=True,
    )

    # with a store, CC rounds checkpoint through it (atomic commits a real
    # cluster can resume/inspect — the Iceberg analog of localCheckpoint;
    # reference _SUCCESS-per-stage contract extended to loop state)
    cc_ckpt = None
    if store is not None:
        _round = [0]

        def cc_ckpt(df):
            _round[0] += 1
            return store.write(
                df, f"cc_state_{_round[0]}", chash, lineage=["edges"]
            )

    clusters, cc_rounds = clusters_from_edges(
        docs,
        edges.select("src", "dst"),
        driver_threshold=cfg.spark.cc_broadcast_threshold,
        checkpoint=cc_ckpt,
    )
    clusters = stage("clusters", lambda: clusters, ["edges"], {"cc_rounds": cc_rounds})
    metrics["cc_rounds"] = float(cc_rounds)

    keep = keepers_op(docs, clusters)
    keep = stage("keepers", lambda: keep, ["clusters", "docs"])

    # every consumer of the detectors' band/census caches has materialized
    # by now (stats collected above, edges cached + consumed by CC) — free
    # the corpus-scale cache entries so repeated runs in one session don't
    # stack them until LRU evicts something live
    release_census_caches()

    return PipelineResult(
        docs=docs,
        edges=edges,
        clusters=clusters,
        keepers=keep,
        cc_rounds=cc_rounds,
        metrics=metrics,
    )
