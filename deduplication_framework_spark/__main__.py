"""CLI: the spark-submit entry point.

    spark-submit --py-files dist/deduplication_framework_spark.zip \\
        -m deduplication_framework_spark  # (or path to this file)

or locally:

    python -m deduplication_framework_spark \\
        --input /path/pages_parquet --output /path/out \\
        --detectors exact,minhash,simhash --config cfg.yaml \\
        --checkpoint-dir /path/ckpt

Replaces the reference's ``python -m pipelines --config cfg.yaml``
(/root/reference/pipelines/__main__.py:7-13) — one Spark app instead of an
orchestrator spawning conda-env subprocesses.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="deduplication_framework_spark")
    p.add_argument("--config", default=None, help="YAML/JSON config (deep-merged over defaults)")
    p.add_argument("--input", default=None,
                   help="pages parquet path (or iceberg table with --catalog iceberg)")
    p.add_argument("--synthetic", type=int, default=None,
                   help="generate an N-doc synthetic pages corpus instead of --input")
    p.add_argument("--output", required=True, help="output directory (keepers/clusters/edges)")
    p.add_argument("--detectors", default="exact,minhash,simhash",
                   help="comma list from: exact,minhash,simhash,substring,suffix_array")
    p.add_argument("--checkpoint-dir", default=None,
                   help="table-store root for resumable stage commits")
    p.add_argument("--no-verify", action="store_true",
                   help="reference ours_lsh parity mode (band collision = duplicate)")
    p.add_argument("--span-dedup", nargs="?", const="\n", default=None,
                   metavar="SEP_REGEX",
                   help="Dolma/CCNet-style preprocessing: drop every exact "
                        "span (split on SEP_REGEX, default newline) whose "
                        "text occurred earlier in the corpus, then dedup the "
                        "reassembled docs; docs left empty are removed")
    p.add_argument("--span-dedup-fuzzy", action="store_true",
                   help="with --span-dedup: ALSO collapse near-duplicate "
                        "spans (MinHash/LSH + exact-Jaccard >= the config "
                        "threshold at span granularity; keeper = earliest "
                        "occurrence of each cluster)")
    p.add_argument("--remove-repeated-substrings", type=int, default=None,
                   metavar="MIN_LEN",
                   help="ExactSubstr removal (Lee et al. 2022): delete "
                        "every character inside any UNALIGNED substring "
                        "of length >= MIN_LEN occurring twice anywhere in "
                        "the corpus (within-doc repeats included); docs "
                        "left empty are removed")
    p.add_argument("--remove-frequent-spans", type=int, default=None,
                   metavar="MAX_COUNT",
                   help="C4/RefinedWeb-style boilerplate removal: drop "
                        "EVERY occurrence of any newline-separated span "
                        "occurring more than MAX_COUNT times corpus-wide "
                        "(keep-none, vs --span-dedup's keep-first), then "
                        "dedup the reassembled docs; docs left empty are "
                        "removed")
    p.add_argument("--dedup-against", default=None, metavar="PATH",
                   help="incremental recrawl mode: parquet of the "
                        "historical corpus (any frame with a text column); "
                        "batch docs whose md5(text) already occurs there "
                        "are dropped BEFORE the pipeline via a Bloom "
                        "prefilter + exact verify join (operators/bloom.py)")
    p.add_argument("--dedup-against-fuzzy", action="store_true",
                   help="with --dedup-against: ALSO drop batch docs with a "
                        "NEAR-duplicate in the historical corpus "
                        "(MinHash-LSH candidates + exact-Jaccard >= the "
                        "config threshold, bipartite; "
                        "operators/incremental_fuzzy.py). The exact Bloom "
                        "prefilter runs first, so only survivors are "
                        "featurized")
    p.add_argument("--fuzzy-index", default=None, metavar="DIR",
                   help="with --dedup-against-fuzzy: persist the history "
                        "feature/band/bloom index in DIR (ParquetTableStore "
                        "atomic commits). First run builds + commits it; "
                        "every later run — including after a process "
                        "restart — loads it and featurizes ZERO history "
                        "docs. A config change invalidates the index "
                        "(config-hash check) and it is rebuilt")
    p.add_argument("--fuzzy-index-admit", action="store_true",
                   help="with --fuzzy-index: after the pipeline, ADMIT the "
                        "run's keepers into the stored index (only "
                        "not-yet-indexed docs are featurized; idempotent "
                        "under replay) so the NEXT recrawl batch dedups "
                        "against them — the write half of the daily loop")
    p.add_argument("--decontaminate-against", default=None, metavar="PATH",
                   help="parquet eval/benchmark corpus (text column): REMOVE "
                        "every word span covered by a shared n-gram from the "
                        "input docs before the pipeline (span-level "
                        "decontamination); fully-covered docs are dropped")
    p.add_argument("--decontaminate-ngram", type=int, default=8, metavar="N",
                   help="word n-gram size for --decontaminate-against "
                        "(default 8)")
    p.add_argument("--block-urls", action="store_true",
                   help="RefinedWeb-style URL filter (functions/urls.py "
                        "host blocklist + milli-weighted word scoring): "
                        "drop pages whose url is blocked BEFORE anything "
                        "else touches them (the cheapest reject), with "
                        "per-reason drop counts in summary metrics; "
                        "requires a url column")
    p.add_argument("--quality-filter", action="store_true",
                   help="Gopher-rule quality gate (functions/quality.py "
                        "RULES at the canonical Table-A1 thresholds): drop "
                        "docs failing any rule BEFORE the pipeline, with "
                        "per-rule first-fail drop counts in summary "
                        "metrics. NOTE: synthetic word-soup corpora drop "
                        "almost entirely (stopwords_low)")
    p.add_argument("--quality-repetition", action="store_true",
                   help="with --quality-filter: ALSO apply the Table-A1 "
                        "repetition thresholds (top/duplicate n-gram "
                        "character fractions, functions/repetition.py)")
    p.add_argument("--lm-filter", default=None, metavar="BUCKETS",
                   help="CCNet-style perplexity gate (operators/lm.py): "
                        "score every page with the corpus-trained bigram "
                        "LM, bucket into head/middle/tail tertiles "
                        "(approx map-side cutoffs — the 100-TB path) and "
                        "keep only the comma-listed buckets (e.g. "
                        "'head,middle'); per-bucket counts in summary "
                        "metrics")
    p.add_argument("--soft-weights", action="store_true",
                   help="SoftDedup reweighting (operators/cluster.py::"
                        "soft_dedup_weights): per-doc sampling weight "
                        "1e6 div |cluster| over the pipeline's duplicate "
                        "clusters — the keep-everything alternative to "
                        "keeper selection; writes <output>/weights "
                        "parquet and soft_weights.* summary metrics")
    p.add_argument("--assign-splits", type=float, default=None,
                   metavar="VAL_FRAC",
                   help="leakage-safe train/val assignment over the "
                        "pipeline's duplicate clusters (operators/"
                        "splits.py): every doc follows its CLUSTER to "
                        "one side, so no (near-)dup pair crosses the "
                        "boundary; writes <output>/splits parquet and "
                        "split.n_train/n_val summary metrics")
    p.add_argument("--sweep", default=None,
                   help="comma list of thresholds: run the threshold sweep "
                        "(reference clean_batch_dataset analog) instead of a "
                        "single pipeline; writes <output>/sweep.json + one "
                        "keeper set per theta")
    p.add_argument("--sweep-eval", action="store_true",
                   help="with --sweep: add the downstream-probe metrics "
                        "(probe accuracy / vocab size / label shift) per theta")
    p.add_argument("--eval-recall", action="store_true",
                   help="append dup-pair recall vs the sequential numpy "
                        "oracle to summary metrics (collects texts to the "
                        "driver — validation-scale runs only)")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    # pure-argument validation BEFORE any Spark session or preprocessing
    # layer runs: a bad flag must fail in milliseconds, not minutes into
    # the --block-urls/--quality-filter/--lm-filter collect jobs
    if not args.input and not args.synthetic:
        p.error("one of --input / --synthetic is required")
    sweep_incompatible = [
        ("--block-urls", args.block_urls),
        ("--dedup-against", args.dedup_against is not None),
        ("--quality-filter", args.quality_filter),
        ("--lm-filter", args.lm_filter is not None),
        ("--remove-repeated-substrings",
         args.remove_repeated_substrings is not None),
        ("--remove-frequent-spans", args.remove_frequent_spans is not None),
        ("--span-dedup", args.span_dedup is not None),
        ("--decontaminate-against", args.decontaminate_against is not None),
        ("--assign-splits", args.assign_splits is not None),
        ("--soft-weights", args.soft_weights),
    ]
    if args.sweep:
        for flag, on in sweep_incompatible:
            if on:
                p.error(f"{flag} is not supported with --sweep")
    if args.dedup_against_fuzzy and args.dedup_against is None:
        p.error("--dedup-against-fuzzy requires --dedup-against")
    if args.fuzzy_index is not None and not args.dedup_against_fuzzy:
        p.error("--fuzzy-index requires --dedup-against-fuzzy")
    if args.fuzzy_index_admit and args.fuzzy_index is None:
        p.error("--fuzzy-index-admit requires --fuzzy-index")
    if args.quality_repetition and not args.quality_filter:
        p.error("--quality-repetition requires --quality-filter")
    lm_keep = None
    if args.lm_filter is not None:
        # parsed ONCE here; the use site below consumes this set, so
        # validation and behavior can never desynchronize
        lm_keep = {b.strip() for b in args.lm_filter.split(",") if b.strip()}
        if not lm_keep or not lm_keep <= {"head", "middle", "tail"}:
            p.error("--lm-filter BUCKETS must be from head,middle,tail")
    if (args.remove_frequent_spans is not None
            and args.remove_frequent_spans < 1):
        p.error("--remove-frequent-spans MAX_COUNT must be >= 1")
    if (args.remove_repeated_substrings is not None
            and args.remove_repeated_substrings < 2):
        p.error("--remove-repeated-substrings MIN_LEN must be >= 2")
    if args.span_dedup_fuzzy and args.span_dedup is None:
        p.error("--span-dedup-fuzzy requires --span-dedup")
    if args.decontaminate_against is not None and args.decontaminate_ngram < 1:
        p.error("--decontaminate-ngram N must be >= 1")
    if (args.assign_splits is not None
            and not 0.0 <= args.assign_splits <= 1.0):
        p.error("--assign-splits VAL_FRAC must be in [0, 1]")

    from deduplication_framework_spark.config import load_pipeline_config
    from deduplication_framework_spark.plans.checkpoint import ParquetTableStore
    from deduplication_framework_spark.plans.pipeline import run_pipeline
    from deduplication_framework_spark.session import get_spark
    from deduplication_framework_spark.sources.pages import generate_pages

    cfg = load_pipeline_config(args.config)
    spark = get_spark(app_name="dedup-pipeline", master=args.master)

    if args.synthetic:
        pages = generate_pages(spark, args.synthetic)
    else:
        pages = spark.read.parquet(args.input)

    detectors = [d.strip() for d in args.detectors.split(",") if d.strip()]

    span_metrics: dict = {}
    input_tags = []
    if args.block_urls:
        # the cheapest reject comes first: a blocked url never reaches
        # the recrawl prefilter, quality gate, or featurization
        if "url" not in pages.columns:
            p.error("--block-urls requires a url column in the input")
        pages, ub_metrics = _block_url_pages(pages)
        span_metrics.update(ub_metrics)
        input_tags.append("block_urls:1")
    if args.dedup_against is not None:
        pages, inc_metrics = _incremental_pages(
            spark, pages, args.dedup_against
        )
        span_metrics.update(inc_metrics)
        # resume key carries the PATH, not the content — re-point the
        # flag (or clear the checkpoint) if the historical corpus at the
        # same path changes, the same contract --input itself has
        input_tags.append(f"dedup_against:{args.dedup_against}")
        if args.dedup_against_fuzzy:
            pages, fz_metrics, fuzzy_src_ident = _incremental_fuzzy_pages(
                spark, pages, args.dedup_against, cfg,
                index_dir=args.fuzzy_index,
            )
            span_metrics.update(fz_metrics)
            input_tags.append(
                f"dedup_against_fuzzy:{args.dedup_against}"
            )
    if args.quality_filter:
        # after the exact-recrawl prefilter (cheapest first), before any
        # span surgery: quality is judged on the document as crawled
        pages, q_metrics = _quality_filter_pages(
            pages, repetition=args.quality_repetition
        )
        span_metrics.update(q_metrics)
        input_tags.append(f"quality:{int(args.quality_repetition)}")
    if lm_keep is not None:
        # after the quality gate (cheap scalar rules first), before span
        # surgery: perplexity is judged on the document as crawled
        pages, lm_metrics = _lm_filter_pages(pages, keep=lm_keep)
        span_metrics.update(lm_metrics)
        input_tags.append(f"lm_filter:{','.join(sorted(lm_keep))}")
    if args.remove_repeated_substrings is not None:
        pages, rs_metrics = _repeated_substring_pages(
            pages, min_len=args.remove_repeated_substrings
        )
        span_metrics.update(rs_metrics)
        input_tags.append(
            f"repeated_substrings:{args.remove_repeated_substrings}"
        )
    if args.remove_frequent_spans is not None:
        pages, fs_metrics = _frequent_span_pages(
            pages, max_count=args.remove_frequent_spans
        )
        span_metrics.update(fs_metrics)
        input_tags.append(f"frequent_spans:{args.remove_frequent_spans}")
    if args.span_dedup is not None:
        pages, sd_metrics = _span_dedup_pages(
            pages, sep=args.span_dedup, fuzzy=args.span_dedup_fuzzy, cfg=cfg
        )
        span_metrics.update(sd_metrics)
        mode = "span_dedup_fuzzy" if args.span_dedup_fuzzy else "span_dedup"
        input_tags.append(f"{mode}:{args.span_dedup}")
    if args.decontaminate_against is not None:
        pages, dc_metrics = _decontaminate_pages(
            spark, pages, args.decontaminate_against, args.decontaminate_ngram
        )
        span_metrics.update(dc_metrics)
        input_tags.append(
            f"decontaminate:{args.decontaminate_against}"
            f":{args.decontaminate_ngram}"
        )
    input_tag = "|".join(input_tags)

    if args.sweep:
        import os

        from deduplication_framework_spark.plans.sweep import threshold_sweep

        thetas = [float(x) for x in args.sweep.split(",") if x.strip()]
        out = threshold_sweep(
            spark,
            pages,
            thresholds=thetas,
            detectors=detectors,
            base_cfg=cfg,
            store_root=args.checkpoint_dir,
            keepers_out=f"{args.output}/sweep_keepers",
            evaluate=args.sweep_eval,
            verify=not args.no_verify,
        )
        rows = [r.asDict() for r in out.collect()]
        os.makedirs(args.output, exist_ok=True)
        with open(f"{args.output}/sweep.json", "w") as fh:
            json.dump(rows, fh, indent=2)
        print(json.dumps({"sweep": rows}))
        return 0

    store = (
        ParquetTableStore(spark, args.checkpoint_dir)
        if args.checkpoint_dir
        else None
    )
    t0 = time.time()
    res = run_pipeline(
        spark,
        pages,
        cfg,
        detectors=detectors,
        verify=not args.no_verify,
        store=store,
        input_tag=input_tag,
    )
    res.metrics.update(span_metrics)
    res.keepers.write.mode("overwrite").parquet(f"{args.output}/keepers")
    res.clusters.write.mode("overwrite").parquet(f"{args.output}/clusters")
    res.edges.write.mode("overwrite").parquet(f"{args.output}/edges")

    if args.soft_weights:
        from deduplication_framework_spark.operators.cluster import (
            soft_dedup_weights,
        )

        weights = soft_dedup_weights(
            res.clusters.select("doc_id", "cluster_id")
        )
        weights.write.mode("overwrite").parquet(f"{args.output}/weights")
        wdf = spark.read.parquet(f"{args.output}/weights")
        row = wdf.selectExpr(
            "count(*) AS n",
            "sum(CAST(cluster_size > 1 AS INT)) AS n_downweighted",
            "sum(weight_ppm) AS mass_ppm",
        ).collect()[0]
        res.metrics["soft_weights.n_docs"] = float(row.n)
        res.metrics["soft_weights.n_downweighted"] = float(
            row.n_downweighted or 0
        )
        # total mass / 1e6 ~ number of distinct content classes
        res.metrics["soft_weights.mass"] = float(
            (row.mass_ppm or 0) / 1_000_000.0
        )

    if args.assign_splits is not None:
        from deduplication_framework_spark.operators.splits import (
            leakage_safe_split,
            split_stats,
        )

        assigned = leakage_safe_split(
            res.docs, res.clusters, val_frac=args.assign_splits
        )
        assigned.write.mode("overwrite").parquet(f"{args.output}/splits")
        # both sides always reported — an empty side is 0.0, not a
        # missing key (consumers index these unconditionally)
        for side in ("train", "val"):
            res.metrics[f"split.n_{side}"] = 0.0
            res.metrics[f"split.n_groups_{side}"] = 0.0
        for r in split_stats(
            spark.read.parquet(f"{args.output}/splits")
        ).collect():
            res.metrics[f"split.n_{r.split}"] = float(r.n_docs)
            res.metrics[f"split.n_groups_{r.split}"] = float(r.n_groups)

    if args.fuzzy_index_admit:
        # the write half of the daily recrawl loop: admit this run's
        # keepers (md5-text identity, matching the history id scheme) so
        # the NEXT batch's --fuzzy-index load dedups against them
        from pyspark.sql import functions as F

        from deduplication_framework_spark.operators.incremental_fuzzy import (
            append_fuzzy_index,
        )

        admitted = append_fuzzy_index(
            ParquetTableStore(spark, args.fuzzy_index),
            res.keepers.select(
                F.md5("text").alias("doc_id"), "text"
            ).dropDuplicates(["doc_id"]),
            cfg,
            id_col="doc_id",
            src_ident=fuzzy_src_ident,
        )
        res.metrics["fuzzy_index.n_admitted"] = float(admitted["n_added"])
        res.metrics["fuzzy_index.n_total"] = float(admitted["n_total"])

    elapsed = round(time.time() - t0, 2)
    n_docs = res.docs.count()
    n_keep = res.keepers.count()
    if args.eval_recall and "minhash" in detectors:
        res.metrics.update(
            _recall_vs_oracle(res, cfg, verified=not args.no_verify)
        )
    summary = {
        "elapsed_sec": elapsed,
        "docs": n_docs,
        "keepers": n_keep,
        "cc_rounds": res.cc_rounds,
        "metrics": res.metrics,
        "config_hash": cfg.config_hash(),
    }
    print(json.dumps(summary))
    with open(f"{args.output}/summary.json", "w") as fh:
        json.dump(summary, fh, indent=2)

    from deduplication_framework_spark.plans.report import render_report

    report = render_report(
        res,
        detectors=detectors,
        elapsed_sec=elapsed,
        config_hash=cfg.config_hash(),
        store=store,
        n_docs=n_docs,
        n_keep=n_keep,
    )
    with open(f"{args.output}/report.md", "w") as fh:
        fh.write(report)
    return 0


def _incremental_pages(spark, pages, against_path: str):
    """pages → (pages minus docs whose md5(text) occurs in the historical
    corpus at ``against_path``, metrics). Runs BEFORE --span-dedup and the
    pipeline: the cheapest prefilter first, and span/near-dup detection
    then only sees genuinely new documents — the daily-recrawl posture
    (the historical corpus is scanned once for the Bloom build and for
    the map-side verify semi-join, never shuffled)."""
    from deduplication_framework_spark.operators.bloom import (
        incremental_new_rows,
    )

    old = spark.read.parquet(against_path)
    if "text" not in old.columns:
        raise ValueError(
            f"--dedup-against parquet at {against_path} has no text column "
            f"(columns: {old.columns})"
        )
    out, stats = incremental_new_rows(pages, old, key_col="text")
    metrics = {
        "incremental.n_batch": float(stats["n_new_batch"]),
        "incremental.n_definite_new": float(stats["n_definite_new"]),
        "incremental.n_candidates": float(stats["n_candidates"]),
        # survivors of the verify join are counted by the pipeline itself
        # (summary "docs" = post-filter batch size)
    }
    return out, metrics


def _incremental_fuzzy_pages(spark, pages, against_path: str, cfg,
                             index_dir=None):
    """pages → (pages minus docs with a NEAR-duplicate in the historical
    corpus, metrics). Runs AFTER the exact Bloom prefilter (so only
    exact-new survivors pay featurization) and BEFORE --span-dedup / the
    pipeline. Doc identity comes from the pipeline's own ``prepare_docs``
    (explicit doc_order when present, else the (warc_ts, url) dense rank);
    history rows get md5(text) ids and identical history texts collapse to
    one representative — membership semantics are unchanged, featurization
    cost drops. Output is the span-path's (doc_order, url, text, lang)
    shape. The operator's tracked caches are released by the pipeline's
    own end-of-run ``release_census_caches()``."""
    from pyspark.sql import functions as F

    from deduplication_framework_spark.operators.incremental_fuzzy import (
        incremental_near_new_rows,
    )
    from deduplication_framework_spark.plans.pipeline import prepare_docs

    old = (
        spark.read.parquet(against_path)
        .select(F.md5("text").alias("doc_id"), "text")
        .dropDuplicates(["doc_id"])
    )
    docs = prepare_docs(pages)
    index_kw = {}
    idx_resumed = None
    src_ident = ""
    if index_dir is not None:
        # stored fuzzy index (VERDICT r4 #5 — the daily-recrawl
        # contract): first run featurizes history ONCE and commits the
        # feature/band/bloom tables; every later run — across process
        # restarts — loads them and featurizes zero history docs. A
        # config change OR a changed/replaced history corpus fails the
        # hash check and rebuilds — over history UNION every admitted
        # text, so docs admitted via --fuzzy-index-admit survive the
        # rebuild (their features alone are not re-derivable).
        from deduplication_framework_spark.operators.incremental_fuzzy import (
            load_admitted_texts,
            load_fuzzy_index,
            save_fuzzy_index,
        )
        from deduplication_framework_spark.plans.checkpoint import (
            ParquetTableStore,
        )

        istore = ParquetTableStore(spark, index_dir)
        # one aggregation over the (already md5-collapsed) history —
        # cheap next to the exact-Bloom layer's own history scan
        idr = old.agg(
            F.count("*").alias("n"),
            F.bit_xor(F.xxhash64("text")).alias("x"),
        ).first()
        src_ident = f"{idr['n']}:{idr['x']}"
        idx = load_fuzzy_index(istore, cfg, src_ident=src_ident)
        idx_resumed = idx is not None
        if idx is None:
            adm = load_admitted_texts(istore)
            base = (
                old
                if adm is None
                else old.unionByName(
                    adm.select("doc_id", "text")
                ).dropDuplicates(["doc_id"])
            )
            save_fuzzy_index(
                istore, base, cfg, id_col="doc_id", src_ident=src_ident
            )
            idx = load_fuzzy_index(istore, cfg, src_ident=src_ident)
        index_kw = {
            "old_features": idx["old_features"],
            "old_bands": idx["old_bands"],
            "bloom": idx["bloom"],
        }
    kept, stats = incremental_near_new_rows(
        docs.select("doc_id", "text"), old, cfg, id_col="doc_id",
        **index_kw,
    )
    out = (
        docs.drop("text")
        .join(kept, "doc_id")
        .select(
            F.col("doc_id").alias("doc_order"), "url", "text", "lang"
        )
    )
    metrics = {
        "incremental_fuzzy.n_batch": float(stats["n_new_batch"]),
        "incremental_fuzzy.n_definite_new": float(stats["n_definite_new"]),
        "incremental_fuzzy.n_candidate_pairs": float(
            stats.get("n_candidate_pairs", 0)
        ),
        "incremental_fuzzy.n_dup_docs": float(stats.get("n_dup_docs", 0)),
    }
    if idx_resumed is not None:
        metrics["fuzzy_index.resumed"] = 1.0 if idx_resumed else 0.0
    return out, metrics, src_ident


def _block_url_pages(pages):
    """pages → (pages whose url passes the block rules, metrics). Pure
    per-row expressions + one census aggregation over the tiny reason
    column (functions/urls.py)."""
    from pyspark.sql import functions as F

    from deduplication_framework_spark.functions.urls import (
        url_block_exprs,
    )

    from deduplication_framework_spark.operators.lsh import (
        _persist_tracked,
    )

    # census + the returned frame are two consumers: persist once (the
    # census collect fills it), freed by release_census_caches()
    flagged = _persist_tracked(
        pages.withColumn("_ub_reason", url_block_exprs("url")["reason"])
    )
    census = {
        r["_ub_reason"]: r["count"]
        for r in flagged.groupBy("_ub_reason").count().collect()
    }
    kept = flagged.filter(F.col("_ub_reason") == "pass").drop("_ub_reason")
    metrics = {
        "url_block.n_in": float(sum(census.values())),
        "url_block.n_kept": float(census.get("pass", 0)),
    }
    for reason, n in census.items():
        if reason != "pass":
            metrics[f"url_block.drop_{reason}"] = float(n)
    return kept, metrics


def _quality_filter_pages(pages, *, repetition: bool):
    """pages → (pages passing the Gopher quality gate, metrics). Runs
    BEFORE the other preprocessing layers' span surgery would change the
    signals — quality is judged on the document as crawled. Pure per-row
    expressions + one drop-census aggregation (functions/quality.py)."""
    from deduplication_framework_spark.functions.quality import (
        apply_quality_filter,
    )

    return apply_quality_filter(pages, repetition=repetition)


def _lm_filter_pages(pages, *, keep):
    """pages → (pages whose perplexity tertile is in ``keep``, metrics).
    Doc identity comes from the pipeline's own ``prepare_docs`` (explicit
    doc_order when present, else the (warc_ts, url) dense rank — the
    sibling layers' contract). Scores with the corpus-trained bigram LM
    and buckets via the approx map-side cutoffs (no global sort);
    empty/whitespace-only pages have no LM score and pass through
    unscored (the quality gate owns those; counted in
    ``lm_filter.n_unscored``). ``lm_filter.n_in`` counts ALL input
    pages, matching the other layers' accounting."""
    from pyspark.sql import functions as F

    from deduplication_framework_spark.operators.lm import (
        bucket_lm_scores,
        lm_score_docs,
    )
    from deduplication_framework_spark.plans.pipeline import prepare_docs

    docs = prepare_docs(pages)
    n_in = docs.count()
    scored = bucket_lm_scores(lm_score_docs(docs), approx=True)
    census = {
        r.bucket: r["count"]
        for r in scored.groupBy("bucket").count().collect()
    }
    out = (
        docs.join(scored.select("doc_id", "bucket"), "doc_id", "left")
        .filter(
            F.col("bucket").isNull() | F.col("bucket").isin(*sorted(keep))
        )
        .select(
            F.col("doc_id").alias("doc_order"), "url", "text", "lang"
        )
    )
    metrics = {
        "lm_filter.n_in": float(n_in),
        "lm_filter.n_unscored": float(n_in - sum(census.values())),
        "lm_filter.kept_buckets": float(len(keep)),
    }
    for b, n in census.items():
        metrics[f"lm_filter.n_{b}"] = float(n)
    return out, metrics


def _repeated_substring_pages(pages, min_len: int):
    """pages → (pages with repeated substrings cut out, metrics): the
    ExactSubstr remove-all policy (operators/spans.py::
    remove_repeated_substrings, key_mode='hash' — the 16-byte-key census
    path) at character granularity. Same doc-identity and empty-doc-drop
    contract as the other span layers; untouched docs keep their text
    byte-identical (text_clean IS the original when nothing was cut)."""
    from pyspark.sql import functions as F

    from deduplication_framework_spark.operators.spans import (
        remove_repeated_substrings,
    )
    from deduplication_framework_spark.plans.pipeline import prepare_docs

    docs = prepare_docs(pages)
    rs, stats = remove_repeated_substrings(
        docs, min_len=min_len, key_mode="hash",
        id_col="doc_id", text_col="text",
    )
    rs = rs.persist()
    agg = rs.agg(
        F.sum("n_removed_chars").alias("removed"),
        F.sum("n_spans_removed").alias("spans"),
        F.sum((F.col("n_spans_removed") > 0).cast("long")).alias("touched"),
        F.sum(
            ((F.col("n_chars") > 0) & (F.col("text_clean") == ""))
            .cast("long")
        ).alias("emptied"),
    ).first()
    # rs is fully materialized by the agg above: the operator's two
    # corpus-scale tracked caches (one row per CHARACTER) are dead weight
    # for the rest of the run — free them now instead of at pipeline end
    for f in stats.pop("_caches", []):
        f.unpersist()
    out = (
        docs.withColumnRenamed("text", "_text_in")
        .join(rs, "doc_id")
        .filter((F.col("text_clean") != "") | (F.col("n_chars") == 0))
        .select(
            F.col("doc_id").alias("doc_order"),
            "url",
            # untouched docs keep their ORIGINAL text (incl. NULL —
            # text_clean coalesces to '' — matching the sibling layers'
            # byte-identical pass-through contract)
            F.when(F.col("n_spans_removed") > 0, F.col("text_clean"))
            .otherwise(F.col("_text_in"))
            .alias("text"),
            "lang",
        )
    )
    metrics = {
        "repeated_substrings.n_removed_chars": float(agg["removed"] or 0),
        "repeated_substrings.n_spans_removed": float(agg["spans"] or 0),
        "repeated_substrings.n_docs_touched": float(agg["touched"] or 0),
        "repeated_substrings.n_docs_emptied": float(agg["emptied"] or 0),
        "repeated_substrings.n_hot_grams": float(stats["n_hot_grams"]),
    }
    return out, metrics


def _frequent_span_pages(pages, max_count: int):
    """pages → (pages with hot spans removed, metrics): the keep-NONE
    boilerplate policy (operators/spans.py::remove_frequent_spans) over
    newline-separated spans. Same doc-identity, empty-doc-drop and
    span-less pass-through contract as ``_span_dedup_pages``."""
    from pyspark.sql import functions as F

    from deduplication_framework_spark.operators.spans import (
        remove_frequent_spans,
    )
    from deduplication_framework_spark.plans.pipeline import prepare_docs

    docs = prepare_docs(pages)
    fs, stats = remove_frequent_spans(
        docs, max_count=max_count, id_col="doc_id", text_col="text",
        sep="\n", join_sep="\n",
    )
    fs = fs.persist()
    agg = fs.agg(
        F.sum("n_spans").alias("spans"),
        F.sum("n_kept").alias("kept"),
        F.sum(
            ((F.col("n_spans") > 0) & (F.col("n_kept") == 0)).cast("long")
        ).alias("emptied"),
    ).first()
    out = (
        docs.withColumnRenamed("text", "_text_in")
        .join(fs, "doc_id")
        .filter((F.col("n_kept") > 0) | (F.col("n_spans") == 0))
        .select(
            F.col("doc_id").alias("doc_order"),
            "url",
            F.when(F.col("n_spans") == 0, F.col("_text_in"))
            .otherwise(F.col("text_dedup"))
            .alias("text"),
            "lang",
        )
    )
    metrics = {
        "frequent_spans.n_spans": float(agg["spans"] or 0),
        "frequent_spans.n_spans_kept": float(agg["kept"] or 0),
        "frequent_spans.n_hot_spans": float(stats["n_hot_spans"]),
        "frequent_spans.n_docs_emptied": float(agg["emptied"] or 0),
    }
    return out, metrics


def _span_dedup_pages(pages, sep: str, fuzzy: bool = False, cfg=None):
    """pages → (pages with span-deduped text, metrics). Doc identity/order
    comes from the pipeline's own ``prepare_docs`` (explicit doc_order when
    present, else the (warc_ts, url) dense rank — so recrawled urls stay
    distinct docs). Docs whose every span was seen earlier are DROPPED and
    counted in ``n_docs_emptied``; docs with no non-empty spans at all
    (empty/whitespace text) pass through unchanged — they were not deduped,
    and the non-span pipeline path keeps a representative for them too.
    Survivor spans re-join with a plain newline (``sep`` may be a regex).
    ``fuzzy`` switches keep-first to near-duplicate cluster keep-first
    (``near_dedup_spans``; exact is its rep-collapse prefix)."""
    from pyspark.sql import functions as F

    from deduplication_framework_spark.operators.spans import (
        dedup_spans,
        near_dedup_spans,
    )
    from deduplication_framework_spark.plans.pipeline import prepare_docs

    docs = prepare_docs(pages)
    # persisted: the metrics agg below materializes it, and the joined
    # output feeds every downstream pipeline action (CLAUDE.md persist rule)
    if fuzzy:
        sd, _info = near_dedup_spans(
            docs, id_col="doc_id", text_col="text", sep=sep,
            join_sep="\n", cfg=cfg,
        )
        sd = sd.persist()
    else:
        sd = dedup_spans(
            docs, id_col="doc_id", text_col="text", sep=sep, join_sep="\n"
        ).persist()
    agg = sd.agg(
        F.sum("n_spans").alias("spans"),
        F.sum("n_kept").alias("kept"),
        F.sum(
            ((F.col("n_spans") > 0) & (F.col("n_kept") == 0)).cast("long")
        ).alias("emptied"),
    ).first()
    out = (
        docs.withColumnRenamed("text", "_text_in")
        .join(sd, "doc_id")
        .filter((F.col("n_kept") > 0) | (F.col("n_spans") == 0))
        .select(
            F.col("doc_id").alias("doc_order"),
            "url",
            F.when(F.col("n_spans") == 0, F.col("_text_in"))
            .otherwise(F.col("text_dedup"))
            .alias("text"),
            "lang",
        )
    )
    metrics = {
        "span_dedup.n_spans": float(agg["spans"] or 0),
        "span_dedup.n_spans_kept": float(agg["kept"] or 0),
        "span_dedup.n_docs_emptied": float(agg["emptied"] or 0),
    }
    return out, metrics


def _decontaminate_pages(spark, pages, eval_path: str, n: int):
    """pages → (pages with eval-overlapping word spans removed, metrics).
    Runs LAST in the preprocessing chain — after the recrawl prefilters
    (which key on raw-text identity and must see the original bytes) and
    after --span-dedup — so benchmark text never reaches the detectors.
    Docs whose every word is covered are DROPPED and counted in
    ``n_docs_emptied``. The operator's tracked caches are released by the
    pipeline's end-of-run ``release_census_caches()``."""
    from pyspark.sql import functions as F

    from deduplication_framework_spark.operators.decontaminate import (
        remove_contaminated_spans,
    )
    from deduplication_framework_spark.plans.pipeline import prepare_docs

    ev = spark.read.parquet(eval_path)
    if "text" not in ev.columns:
        raise ValueError(
            f"--decontaminate-against parquet at {eval_path} has no text "
            f"column (columns: {ev.columns})"
        )
    docs = prepare_docs(pages)
    res, stats = remove_contaminated_spans(
        docs.select("doc_id", "text"), ev, n=n
    )
    # persisted + materialized by the metrics agg below; the joined output
    # then feeds every downstream pipeline action (CLAUDE.md persist rule)
    res = res.persist()
    agg = res.agg(
        F.sum("n_removed").alias("removed"),
        F.sum(
            ((F.col("n_removed") > 0)
             & (F.col("n_removed") == F.col("n_words"))).cast("long")
        ).alias("emptied"),
    ).first()
    out = (
        docs.drop("text")
        .join(res, "doc_id")
        .filter(F.col("n_removed") < F.col("n_words"))
        .select(
            F.col("doc_id").alias("doc_order"),
            "url",
            F.col("text_clean").alias("text"),
            "lang",
        )
    )
    metrics = {
        "decontaminate.n_eval_grams": float(stats["n_eval_grams"]),
        "decontaminate.n_docs_hit": float(stats["n_contaminated"]),
        "decontaminate.n_words_removed": float(agg["removed"] or 0),
        "decontaminate.n_docs_emptied": float(agg["emptied"] or 0),
    }
    return out, metrics


def _recall_vs_oracle(res, cfg, verified: bool) -> dict:
    """Dup-pair recall of the pipeline's clusters vs the numpy oracle
    (BASELINE.json's >=0.99 criterion), surfaced into summary.json. Oracle
    choice and the honesty analysis live in
    ``oracle.numpy_oracle.minhash_recall_evidence`` (shared with bench.py
    so the two surfaced metrics cannot diverge)."""
    from deduplication_framework_spark.oracle import numpy_oracle as O

    rows = sorted(
        res.docs.select("doc_id", "text").collect(), key=lambda r: r.doc_id
    )
    txts = [r.text for r in rows]
    pos = {r.doc_id: i for i, r in enumerate(rows)}
    labels = {r.doc_id: r.cluster_id for r in res.clusters.collect()}
    our_pairs = {
        (min(pos[a], pos[b]), max(pos[a], pos[b]))
        for a, b in O.clusters_to_pairs(labels)
        if a in pos and b in pos
    }
    return O.minhash_recall_evidence(txts, our_pairs, cfg, verified)


if __name__ == "__main__":
    sys.exit(main())
