"""CLI smoke: in-process main() over a small synthetic corpus must write
keepers/clusters/edges, summary.json, and the O7 markdown report."""

import json
import os

from deduplication_framework_spark.__main__ import main


def test_cli_end_to_end_with_report(spark, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    rc = main(
        [
            "--synthetic", "200",
            "--output", out,
            "--detectors", "exact,minhash",
            "--checkpoint-dir", ckpt,
        ]
    )
    assert rc == 0
    with open(os.path.join(out, "summary.json")) as fh:
        summary = json.load(fh)
    assert summary["docs"] == 200
    assert 0 < summary["keepers"] <= 200

    with open(os.path.join(out, "report.md")) as fh:
        report = fh.read()
    assert "# Dedup pipeline report" in report
    assert "| documents in | 200 |" in report
    assert "## Detector metrics" in report
    assert "## Stages (checkpoint store)" in report
    assert "edges_minhash" in report


def test_cli_sweep(spark, tmp_path):
    out = str(tmp_path / "sweep_out")
    rc = main(
        [
            "--synthetic", "150",
            "--output", out,
            "--detectors", "exact,minhash",
            "--sweep", "0.5,0.9",
        ]
    )
    assert rc == 0
    with open(os.path.join(out, "sweep.json")) as fh:
        rows = json.load(fh)
    by_theta = {r["threshold"]: r for r in rows}
    assert set(by_theta) == {0.5, 0.9}
    for r in rows:
        assert r["n_docs"] == 150
        assert r["n_keepers"] + r["n_duplicates"] == 150
    assert by_theta[0.5]["n_keepers"] <= by_theta[0.9]["n_keepers"]
    # one persisted keeper set per theta
    assert os.path.isdir(os.path.join(out, "sweep_keepers", "theta=0.5"))
    assert os.path.isdir(os.path.join(out, "sweep_keepers", "theta=0.9"))


def test_cli_dedup_against(spark, tmp_path):
    """Incremental recrawl mode: docs whose text already exists in the
    historical parquet are dropped before the pipeline; the resume key is
    isolated from a non-incremental run on the same checkpoint dir."""
    from pyspark.sql import functions as F

    from deduplication_framework_spark.sources.pages import generate_pages

    hist = str(tmp_path / "hist")
    # history = half the batch's texts (same generator, same seed)
    corpus = generate_pages(spark, 200)
    corpus.filter(F.col("doc_order") < 100).select("text").write.parquet(hist)
    out = str(tmp_path / "out_inc")
    rc = main(
        [
            "--synthetic", "200",
            "--output", out,
            "--detectors", "exact,minhash",
            "--checkpoint-dir", str(tmp_path / "ckpt_inc"),
            "--dedup-against", hist,
        ]
    )
    assert rc == 0
    with open(os.path.join(out, "summary.json")) as fh:
        summary = json.load(fh)
    m = summary["metrics"]
    assert m["incremental.n_batch"] == 200
    # every historical text must be routed through the candidate path...
    assert m["incremental.n_candidates"] >= 100
    # ...and the pipeline only saw the genuinely new docs (docs 100..199,
    # except batch-internal exact dups of historical texts also drop)
    assert summary["docs"] <= 100
    assert summary["docs"] >= 50


def test_cli_dedup_against_fuzzy(spark, tmp_path):
    """Fuzzy recrawl mode: history holds exact copies of docs 0..99 AND
    near-copies (one appended token) of docs 100..149; the exact Bloom
    layer drops the former, the fuzzy layer drops (almost all of — the
    LSH S-curve, not a bug) the latter, and only genuinely new docs reach
    the pipeline."""
    from pyspark.sql import functions as F

    from deduplication_framework_spark.sources.pages import generate_pages

    hist = str(tmp_path / "hist_fz")
    corpus = generate_pages(spark, 200)
    exact_part = corpus.filter(F.col("doc_order") < 100).select("text")
    near_part = (
        corpus.filter(
            (F.col("doc_order") >= 100) & (F.col("doc_order") < 150)
        )
        .select(F.concat(F.col("text"), F.lit(" tailword")).alias("text"))
    )
    exact_part.unionByName(near_part).write.parquet(hist)
    out = str(tmp_path / "out_fz")
    rc = main(
        [
            "--synthetic", "200",
            "--output", out,
            "--detectors", "exact,minhash",
            "--checkpoint-dir", str(tmp_path / "ckpt_fz"),
            "--dedup-against", hist,
            "--dedup-against-fuzzy",
        ]
    )
    assert rc == 0
    with open(os.path.join(out, "summary.json")) as fh:
        summary = json.load(fh)
    m = summary["metrics"]
    assert m["incremental.n_batch"] == 200
    # the fuzzy layer only sees exact-new survivors
    assert m["incremental_fuzzy.n_batch"] <= 100
    # near-copied docs 100..149 are its true dups (high-J pairs; allow
    # a few S-curve misses)
    assert m["incremental_fuzzy.n_dup_docs"] >= 40
    assert summary["docs"] <= 60


def test_cli_dedup_against_fuzzy_chains_with_span_dedup(spark, tmp_path):
    """The preprocessing layers compose: exact Bloom recrawl filter →
    fuzzy recrawl filter (reshapes pages to (doc_order, url, text, lang))
    → span dedup (consumes that shape via prepare_docs) → pipeline; all
    three fold into the stage-resume input tag."""
    from pyspark.sql import functions as F

    from deduplication_framework_spark.sources.pages import generate_pages

    hist = str(tmp_path / "hist_combo")
    generate_pages(spark, 100).filter(F.col("doc_order") < 50).select(
        "text"
    ).write.parquet(hist)
    out = str(tmp_path / "out_combo")
    rc = main(
        [
            "--synthetic", "100",
            "--output", out,
            "--detectors", "exact,minhash",
            "--checkpoint-dir", str(tmp_path / "ckpt_combo"),
            "--dedup-against", hist,
            "--dedup-against-fuzzy",
            "--span-dedup", r"\s+",
        ]
    )
    assert rc == 0
    with open(os.path.join(out, "summary.json")) as fh:
        summary = json.load(fh)
    m = summary["metrics"]
    assert m["incremental.n_batch"] == 100
    assert "incremental_fuzzy.n_batch" in m
    assert m["span_dedup.n_spans"] > 0
    assert summary["docs"] <= 50


def test_cli_dedup_against_fuzzy_requires_base_flag(spark, tmp_path):
    import pytest

    with pytest.raises(SystemExit):
        main(
            [
                "--synthetic", "50",
                "--output", str(tmp_path / "o_fz"),
                "--dedup-against-fuzzy",
            ]
        )


def test_cli_dedup_against_rejects_sweep_and_bad_input(spark, tmp_path):
    import pytest

    with pytest.raises(SystemExit):
        main(
            [
                "--synthetic", "50",
                "--output", str(tmp_path / "o1"),
                "--sweep", "0.8",
                "--dedup-against", str(tmp_path / "nope"),
            ]
        )
    # parquet without a text column → named ValueError
    spark.range(5).write.parquet(str(tmp_path / "notext"))
    with pytest.raises(ValueError, match="no text column"):
        main(
            [
                "--synthetic", "50",
                "--output", str(tmp_path / "o2"),
                "--dedup-against", str(tmp_path / "notext"),
            ]
        )


def test_cli_decontaminate_against(spark, tmp_path):
    """Span-level decontamination layer: docs byte-identical to an eval
    doc are fully covered and dropped; near-copies lose only the shared
    spans; metrics land in summary.json."""
    import pytest
    from pyspark.sql import functions as F

    from deduplication_framework_spark.sources.pages import generate_pages

    ev = str(tmp_path / "evalset")
    corpus = generate_pages(spark, 200)
    corpus.filter(F.col("doc_order") < 10).select("text").write.parquet(ev)
    out = str(tmp_path / "out_dc")
    rc = main(
        [
            "--synthetic", "200",
            "--output", out,
            "--detectors", "exact",
            "--checkpoint-dir", str(tmp_path / "ckpt_dc"),
            "--decontaminate-against", ev,
        ]
    )
    assert rc == 0
    with open(os.path.join(out, "summary.json")) as fh:
        summary = json.load(fh)
    m = summary["metrics"]
    # the 10 evaled docs are their own exact overlaps (plus any planted
    # dups of them in the corpus)
    assert m["decontaminate.n_docs_hit"] >= 10
    assert m["decontaminate.n_docs_emptied"] >= 10
    assert m["decontaminate.n_words_removed"] > 0
    assert summary["docs"] <= 190

    # rejected under --sweep; eval parquet must carry a text column
    with pytest.raises(SystemExit):
        main(
            [
                "--synthetic", "50",
                "--output", str(tmp_path / "o3"),
                "--sweep", "0.8",
                "--decontaminate-against", ev,
            ]
        )
    spark.range(5).write.parquet(str(tmp_path / "notext_dc"))
    with pytest.raises(ValueError, match="no text"):
        main(
            [
                "--synthetic", "50",
                "--output", str(tmp_path / "o4"),
                "--decontaminate-against", str(tmp_path / "notext_dc"),
            ]
        )


def test_cli_decontaminate_bad_ngram_is_an_argparse_error(spark, tmp_path):
    """Review-finding regression: N < 1 must die as a clean usage error
    before Spark work starts, like the sibling --remove-frequent-spans."""
    import pytest

    with pytest.raises(SystemExit):
        main(
            [
                "--synthetic", "50",
                "--output", str(tmp_path / "o_ng"),
                "--decontaminate-against", str(tmp_path / "whatever"),
                "--decontaminate-ngram", "0",
            ]
        )


def test_cli_block_urls(spark, tmp_path):
    """URL-blocked pages are dropped before the pipeline with per-reason
    drop counts; synthetic urls pass untouched."""
    from pyspark.sql import functions as F

    from deduplication_framework_spark.sources.pages import generate_pages

    inp = str(tmp_path / "pages_badurls")
    corpus = generate_pages(spark, 120)
    # plant: docs 0-9 on a blocklisted host, 10-19 with corroborating
    # block words in the path, the rest untouched
    corpus.withColumn(
        "url",
        F.expr(
            "CASE WHEN doc_order < 10 THEN"
            " concat('https://badspam.example.net/p/', doc_order)"
            " WHEN doc_order < 20 THEN"
            " concat('https://ok.example.com/casino/gambling/', doc_order)"
            " ELSE url END"
        ),
    ).write.parquet(inp)
    out = str(tmp_path / "out_ub")
    rc = main(
        [
            "--input", inp,
            "--output", out,
            "--detectors", "exact",
            "--checkpoint-dir", str(tmp_path / "ckpt_ub"),
            "--block-urls",
        ]
    )
    assert rc == 0
    with open(os.path.join(out, "summary.json")) as fh:
        summary = json.load(fh)
    m = summary["metrics"]
    assert m["url_block.n_in"] == 120
    assert m["url_block.n_kept"] == 100
    assert m["url_block.drop_host"] == 10
    assert m["url_block.drop_words"] == 10
    assert summary["docs"] <= 100


def test_cli_block_urls_rejects_sweep_and_missing_url(spark, tmp_path):
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        main(
            [
                "--synthetic", "50",
                "--output", str(tmp_path / "o1"),
                "--checkpoint-dir", str(tmp_path / "c1"),
                "--block-urls",
                "--sweep", "0.7,0.8",
            ]
        )
    # input without a url column -> argparse error, not a Spark failure
    inp = str(tmp_path / "nourl")
    spark.createDataFrame(
        [(i, f"text {i}") for i in range(5)], ["doc_order", "text"]
    ).write.parquet(inp)
    with _pytest.raises(SystemExit):
        main(
            [
                "--input", inp,
                "--output", str(tmp_path / "o2"),
                "--checkpoint-dir", str(tmp_path / "c2"),
                "--block-urls",
            ]
        )


def test_cli_assign_splits(spark, tmp_path):
    """Cluster-coherent split assignment rides the pipeline's clusters:
    every doc lands train/val with its whole cluster, counts in metrics."""
    from pyspark.sql import functions as F

    out = str(tmp_path / "out_sp")
    rc = main(
        [
            "--synthetic", "300",
            "--output", out,
            "--detectors", "exact,minhash",
            "--checkpoint-dir", str(tmp_path / "ckpt_sp"),
            "--assign-splits", "0.3",
        ]
    )
    assert rc == 0
    assigned = spark.read.parquet(os.path.join(out, "splits"))
    n = assigned.count()
    assert n == 300
    # coherence: one side per group
    k = (
        assigned.groupBy("group_id")
        .agg(F.countDistinct("split").alias("k"))
        .agg(F.max("k"))
        .collect()[0][0]
    )
    assert k == 1
    with open(os.path.join(out, "summary.json")) as fh:
        m = json.load(fh)["metrics"]
    assert m["split.n_train"] + m["split.n_val"] == 300
    assert m["split.n_val"] > 0


def test_cli_assign_splits_probes(spark, tmp_path):
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        main(
            [
                "--synthetic", "50",
                "--output", str(tmp_path / "o3"),
                "--checkpoint-dir", str(tmp_path / "c3"),
                "--assign-splits", "1.5",
            ]
        )
    with _pytest.raises(SystemExit):
        main(
            [
                "--synthetic", "50",
                "--output", str(tmp_path / "o4"),
                "--checkpoint-dir", str(tmp_path / "c4"),
                "--assign-splits", "0.2",
                "--sweep", "0.7,0.8",
            ]
        )


def test_cli_lm_filter(spark, tmp_path):
    """CCNet-style perplexity gate: tail-tertile pages drop before the
    pipeline; per-bucket counts land in summary metrics."""
    out = str(tmp_path / "out_lm")
    rc = main(
        [
            "--synthetic", "300",
            "--output", out,
            "--detectors", "exact",
            "--checkpoint-dir", str(tmp_path / "ckpt_lm"),
            "--lm-filter", "head,middle",
        ]
    )
    assert rc == 0
    with open(os.path.join(out, "summary.json")) as fh:
        summary = json.load(fh)
    m = summary["metrics"]
    assert m["lm_filter.n_in"] == 300
    n_scored = sum(
        v for k, v in m.items()
        if k in ("lm_filter.n_head", "lm_filter.n_middle", "lm_filter.n_tail")
    )
    assert n_scored == 300
    kept = m["lm_filter.n_head"] + m["lm_filter.n_middle"]
    assert summary["docs"] <= kept  # pipeline saw only surviving pages
    assert m["lm_filter.n_tail"] > 0  # the gate actually dropped a tertile


def test_cli_lm_filter_probes(spark, tmp_path):
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        main(
            [
                "--synthetic", "50",
                "--output", str(tmp_path / "o5"),
                "--checkpoint-dir", str(tmp_path / "c5"),
                "--lm-filter", "head,bogus",
            ]
        )
    with _pytest.raises(SystemExit):
        main(
            [
                "--synthetic", "50",
                "--output", str(tmp_path / "o6"),
                "--checkpoint-dir", str(tmp_path / "c6"),
                "--lm-filter", "head",
                "--sweep", "0.7",
            ]
        )


def test_cli_config_yaml_jvm_hash_family(spark, tmp_path):
    """The jvm hash family is reachable from the shipped surface: a user
    config file (``--config``, deep-merged over defaults) flips
    dedup.hash_family and the pipeline runs the Python-worker-free
    featurization end to end, resume included."""
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    cfgf = tmp_path / "cfg.yaml"
    cfgf.write_text("dedup:\n  hash_family: jvm\n  num_perm: 32\n")
    args = [
        "--synthetic", "200",
        "--output", out,
        "--detectors", "exact,minhash",
        "--checkpoint-dir", ckpt,
        "--config", str(cfgf),
    ]
    assert main(args) == 0
    with open(os.path.join(out, "summary.json")) as fh:
        summary = json.load(fh)
    assert summary["docs"] == 200
    assert 0 < summary["keepers"] <= 200
    # resume: the jvm featurization stage participates in the
    # config-hash store (stage name features_minhash_jvm)
    assert main(args) == 0
    with open(os.path.join(out, "summary.json")) as fh:
        resumed = json.load(fh)
    assert resumed["metrics"].get("features_minhash_jvm.resumed") == 1.0
    assert resumed["keepers"] == summary["keepers"]


def test_cli_full_layer_stack(spark, tmp_path):
    """The switch-over story: EVERY preprocessing layer composed in one
    run — url blocking → exact recrawl filter → repeated-substring cut →
    span dedup → decontamination → pipeline → split assignment. Each
    layer's metrics land in the one summary, the composed input_tag
    resumes stage-for-stage on an identical rerun, and removing one
    layer breaks resume (fresh config hash)."""
    from pyspark.sql import functions as F

    from deduplication_framework_spark.sources.pages import generate_pages

    corpus = generate_pages(spark, 240, seed=7, with_truth=True)
    base_cols = ["url", "warc_ts", "html", "text", "lang", "doc_order"]
    inp = str(tmp_path / "stack_pages")
    corpus.withColumn(
        "url",
        F.expr(
            "CASE WHEN doc_order < 10 THEN"
            " concat('https://badspam.example.net/p/', doc_order)"
            " ELSE url END"
        ),
    ).select(*base_cols).write.parquet(inp)

    hist = str(tmp_path / "stack_hist")
    corpus.filter(
        (F.col("doc_order") >= 10) & (F.col("doc_order") < 50)
    ).select("text").write.parquet(hist)

    # eval set = 5 unique-class docs outside the history range: untouched
    # by the earlier layers (their text repeats nowhere), so their
    # 8-grams still match at the decontamination layer
    ev = str(tmp_path / "stack_eval")
    eval_ids = [
        r.doc_order
        for r in corpus.filter(
            (F.col("dup_class") == "unique") & (F.col("doc_order") >= 60)
        ).select("doc_order").orderBy("doc_order").limit(5).collect()
    ]
    corpus.filter(F.col("doc_order").isin(eval_ids)).select(
        "text"
    ).write.parquet(ev)

    out = str(tmp_path / "stack_out")
    ckpt = str(tmp_path / "stack_ckpt")
    argv = [
        "--input", inp,
        "--output", out,
        "--detectors", "exact,minhash",
        "--checkpoint-dir", ckpt,
        "--block-urls",
        "--dedup-against", hist,
        "--remove-repeated-substrings", "40",
        "--span-dedup",
        "--decontaminate-against", ev,
        "--decontaminate-ngram", "8",
        "--assign-splits", "0.25",
    ]
    rc = main(argv)
    assert rc == 0
    with open(os.path.join(out, "summary.json")) as fh:
        summary = json.load(fh)
    m = summary["metrics"]
    # layer 1: url blocking
    assert m["url_block.n_in"] == 240
    assert m["url_block.n_kept"] == 230
    # layer 2: exact recrawl filter saw only unblocked docs; all 40
    # historical texts route through the candidate path
    assert m["incremental.n_batch"] == 230
    assert m["incremental.n_candidates"] >= 40
    # layers 3-4 ran and reported (semantics pinned in their own tests)
    assert "repeated_substrings.n_hot_grams" in m
    assert "span_dedup.n_spans" in m and m["span_dedup.n_spans"] > 0
    # layer 5: the 5 planted eval docs are hit (unique-class, so no
    # earlier layer touched their text)
    assert m["decontaminate.n_docs_hit"] >= 5
    assert m["decontaminate.n_docs_emptied"] >= 5
    # pipeline input reflects the stacked drops
    assert 100 <= summary["docs"] <= 190
    # splits ride the pipeline's own clusters, over exactly its docs
    assigned = spark.read.parquet(os.path.join(out, "splits"))
    assert assigned.count() == summary["docs"]
    assert m["split.n_train"] + m["split.n_val"] == summary["docs"]

    # identical rerun: the composed input_tag reproduces -> full resume
    rc = main(argv)
    assert rc == 0
    with open(os.path.join(out, "summary.json")) as fh:
        m2 = json.load(fh)["metrics"]
    assert m2.get("keepers.resumed") == 1.0
    assert spark.read.parquet(os.path.join(out, "splits")).count() == (
        summary["docs"]
    )

    # drop one layer -> different input_tag -> must NOT resume
    out2 = str(tmp_path / "stack_out2")
    argv2 = [a for a in argv if a != "--span-dedup"]
    argv2[argv2.index(out)] = out2
    rc = main(argv2)
    assert rc == 0
    with open(os.path.join(out2, "summary.json")) as fh:
        m3 = json.load(fh)["metrics"]
    assert "keepers.resumed" not in m3


def test_cli_soft_weights(spark, tmp_path):
    """--soft-weights writes the SoftDedup reweighting parquet: every doc
    kept with weight_ppm = 1e6 div |cluster|, and total mass equals the
    number of distinct content classes (== keepers count) within the
    integer floor loss."""
    from pyspark.sql import functions as F

    out = str(tmp_path / "out_sw")
    rc = main(
        [
            "--synthetic", "300",
            "--output", out,
            "--detectors", "exact,minhash",
            "--checkpoint-dir", str(tmp_path / "ckpt_sw"),
            "--soft-weights",
        ]
    )
    assert rc == 0
    w = spark.read.parquet(os.path.join(out, "weights"))
    assert w.count() == 300  # nothing dropped — the point of the mode
    keepers = spark.read.parquet(os.path.join(out, "keepers")).count()
    bad = w.filter(
        F.col("weight_ppm") != F.expr("CAST(1000000 div cluster_size AS BIGINT)")
    ).count()
    assert bad == 0
    with open(os.path.join(out, "summary.json")) as fh:
        m = json.load(fh)["metrics"]
    assert m["soft_weights.n_docs"] == 300
    assert m["soft_weights.n_downweighted"] > 0
    # mass ~ one unit per cluster == keepers (floor loss < 1 ppm*docs)
    assert abs(m["soft_weights.mass"] - keepers) < 1.0
    # rejected under --sweep
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        main(
            [
                "--synthetic", "50",
                "--output", str(tmp_path / "x"),
                "--sweep", "0.8",
                "--soft-weights",
            ]
        )
