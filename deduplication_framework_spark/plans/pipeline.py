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

from dataclasses import dataclass, field
from typing import Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from deduplication_framework_spark.config import PipelineConfig
from deduplication_framework_spark.functions import kernels as K
from deduplication_framework_spark.functions.text import (
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
    simhash_bands,
    simhash_candidate_edges,
)
from deduplication_framework_spark.operators.verify import (
    verify_hamming,
    verify_jaccard,
)
from deduplication_framework_spark.plans.checkpoint import ParquetTableStore

ALL_DETECTORS = ("exact", "minhash", "simhash", "substring", "suffix_array")


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
) -> PipelineResult:
    """Run the full dedup DAG. ``verify=False`` reproduces the reference's
    ours_lsh behavior (any band collision is accepted as a duplicate edge).

    With a ``store``, each stage is committed and skipped on re-run when the
    config hash matches (resumable restarts).
    """
    cfg = cfg or PipelineConfig()
    unknown = set(detectors) - set(ALL_DETECTORS)
    if unknown:
        raise ValueError(
            f"unknown detector(s) {sorted(unknown)}; valid: {ALL_DETECTORS}"
        )
    chash = cfg.config_hash()
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
    uniq_docs, exact_edges = exact_dedup(docs, hash_fn="xxhash64")
    if "exact" not in detectors:
        uniq_docs, exact_edges = docs, exact_edges.limit(0)
    uniq_docs = stage("docs_uniq", lambda: uniq_docs, ["docs"], persist=True)

    edge_parts: List[DataFrame] = [exact_edges]

    # ---- verification feature table: the capped LSH feature universe
    # (words<=max_words + chargrams<=max_char_grams, hashed) — the exact set
    # ours_lsh MinHashes, ~4.5x smaller than the full multi-granularity
    # shingle set (verify join went 36.8s -> 2.3s at 20k docs)
    lsh_feats = None
    if verify and ("minhash" in detectors):
        fe_udf = make_lsh_features_udf(cfg.embedding, cfg.dedup)
        lsh_feats = stage(
            "features_lsh",
            lambda: uniq_docs.select("doc_id", fe_udf("text").alias("shingles")),
            ["docs_uniq"],
            persist=True,
        )

    # ---- detector: MinHash + LSH banding
    if "minhash" in detectors:
        b, r = K.optimal_band_param(cfg.dedup.threshold, cfg.dedup.num_perm)
        mh_udf = make_minhash_udf(cfg.embedding, cfg.dedup, include_words=True)
        sigs = stage(
            "signatures_minhash",
            lambda: uniq_docs.select("doc_id", mh_udf("text").alias("sig")),
            ["docs_uniq"],
        )
        # bands feed both the stats job and pair-gen — cache to avoid
        # recomputing the signature UDF per consumer
        bands = minhash_bands(sigs, b, r)
        if store is None:
            bands = bands.persist()
        pairs, bstats = candidate_pairs(bands, bucket_cap=cfg.spark.bucket_cap)
        stats_row = bstats.collect() if collect_stats else []
        if stats_row:
            s = stats_row[0]
            metrics["minhash.n_buckets"] = float(s["n_buckets"] or 0)
            metrics["minhash.capped_band_rows"] = float(s["n_capped_band_rows"] or 0)
            metrics["minhash.max_bucket_size"] = float(s["max_bucket_size"] or 0)
        if verify:
            mh_edges = verify_jaccard(pairs, lsh_feats, cfg.dedup.threshold)
        else:
            mh_edges = pairs.withColumn("sim", F.lit(None).cast("double"))
        mh_edges = stage(
            "edges_minhash", lambda: mh_edges, ["signatures_minhash", "features_lsh"]
        )
        edge_parts.append(mh_edges)

    # ---- detector: SimHash + Hamming-ball bucketing
    if "simhash" in detectors:
        sh64_udf = make_simhash_udf(cfg.embedding)
        fps = stage(
            "fingerprints_simhash",
            lambda: uniq_docs.select("doc_id", sh64_udf("text").alias("simhash")),
            ["docs_uniq"],
            persist=True,
        )
        sh_edges, sbstats = simhash_candidate_edges(
            fps, dist=cfg.dedup.simhash_dist, bucket_cap=cfg.spark.bucket_cap
        )
        srow = sbstats.collect() if collect_stats else []
        if srow:
            s = srow[0]
            metrics["simhash.n_buckets"] = float(s["n_buckets"] or 0)
            metrics["simhash.capped_band_rows"] = float(s["n_capped_band_rows"] or 0)
            metrics["simhash.max_bucket_size"] = float(s["max_bucket_size"] or 0)
        sh_edges = stage(
            "edges_simhash", lambda: sh_edges, ["fingerprints_simhash"]
        )
        edge_parts.append(sh_edges)

    # ---- detector: exact-substring (winnowing scale path; see also
    # operators.suffix_array for the prefix-doubling suffix-array pass)
    if "substring" in detectors:
        window = cfg.suffix.min_match_chars - cfg.suffix.kgram_size + 1
        wn_udf = make_winnow_udf(cfg.suffix.kgram_size, window)
        fprints = stage(
            "fingerprints_substring",
            lambda: uniq_docs.select(
                "doc_id", F.explode(wn_udf("text")).alias("fp")
            ),
            ["docs_uniq"],
        )
        # docs sharing any fingerprint share a k-gram (exact substring);
        # boilerplate spans make hot fingerprints → same star+chain capping
        # as the LSH buckets
        sub_bands = fprints.select(
            "doc_id", F.lit(0).alias("band_idx"), F.col("fp").alias("band_key")
        )
        # bucket_cap=1: a fingerprint bucket is a TRUE clique (every member
        # provably shares the same k-gram), so star+chain connectivity is
        # exactly equivalent to all-pairs after connected components —
        # linear pair volume with zero recall loss
        sub_pairs, substats = candidate_pairs(sub_bands, bucket_cap=1)
        subrow = substats.collect() if collect_stats else []
        if subrow:
            s = subrow[0]
            metrics["substring.n_buckets"] = float(s["n_buckets"] or 0)
            metrics["substring.capped_band_rows"] = float(
                s["n_capped_band_rows"] or 0
            )
            metrics["substring.max_bucket_size"] = float(s["max_bucket_size"] or 0)
        sub_edges = sub_pairs.select("src", "dst", F.lit(1.0).alias("sim"))
        sub_edges = stage(
            "edges_substring", lambda: sub_edges, ["fingerprints_substring"]
        )
        edge_parts.append(sub_edges)

    # ---- detector: exact-substring via distributed suffix array (exact path)
    if "suffix_array" in detectors:
        from deduplication_framework_spark.operators.suffix_array import (
            substring_edges_suffix_array,
        )

        # bucket_cap=1: rank buckets are true cliques (identical L-char
        # prefix), star+chain is exactly equivalent after CC
        sa_edges, sa_stats = substring_edges_suffix_array(
            uniq_docs,
            cfg.suffix.min_match_chars,
            bucket_cap=1,
        )
        sarow = sa_stats.collect() if collect_stats else []
        if sarow:
            s = sarow[0]
            metrics["suffix_array.n_buckets"] = float(s["n_buckets"] or 0)
            metrics["suffix_array.capped_band_rows"] = float(
                s["n_capped_band_rows"] or 0
            )
            metrics["suffix_array.max_bucket_size"] = float(s["max_bucket_size"] or 0)
        sa_edges = stage("edges_suffix_array", lambda: sa_edges, ["docs_uniq"])
        edge_parts.append(sa_edges)

    edges = edge_parts[0]
    for e in edge_parts[1:]:
        edges = edges.unionByName(e)
    edges = stage(
        "edges", lambda: edges.select("src", "dst", "sim"), ["detectors"],
        persist=True,
    )

    clusters, cc_rounds = clusters_from_edges(
        docs,
        edges.select("src", "dst"),
        driver_threshold=cfg.spark.cc_broadcast_threshold,
    )
    clusters = stage("clusters", lambda: clusters, ["edges"], {"cc_rounds": cc_rounds})
    metrics["cc_rounds"] = float(cc_rounds)

    keep = keepers_op(docs, clusters)
    keep = stage("keepers", lambda: keep, ["clusters", "docs"])

    return PipelineResult(
        docs=docs,
        edges=edges,
        clusters=clusters,
        keepers=keep,
        cc_rounds=cc_rounds,
        metrics=metrics,
    )
