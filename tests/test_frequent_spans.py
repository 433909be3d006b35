"""Corpus-frequency boilerplate removal (operators/spans.py::
remove_frequent_spans): hot spans vanish everywhere, cold spans stay."""

import pytest

from deduplication_framework_spark.operators.lsh import release_census_caches
from deduplication_framework_spark.operators.spans import (
    remove_frequent_spans,
)

# newline-separated spans; "nav bar" appears in 3 docs (and twice in doc
# 3), "footer" in exactly 2 docs, "body N" lines are unique. Doc 4 is
# all boilerplate; doc 5 is empty.
DOCS = [
    (1, "nav bar\nbody one\nfooter"),
    (2, "nav bar\nbody two\nfooter"),
    (3, "nav bar\nbody three\nnav bar"),
    (4, "nav bar"),
    (5, ""),
]


def _py_remove(docs, max_count, by_docs):
    spans = []  # (doc, pos, span)
    for d, t in docs:
        for p, s in enumerate(t.split("\n")):
            if s.strip():
                spans.append((d, p, s))
    if by_docs:
        freq = {}
        for d, _p, s in spans:
            freq.setdefault(s, set()).add(d)
        hot = {s for s, ds in freq.items() if len(ds) > max_count}
    else:
        freq = {}
        for _d, _p, s in spans:
            freq[s] = freq.get(s, 0) + 1
        hot = {s for s, n in freq.items() if n > max_count}
    out = {}
    for d, t in docs:
        doc_spans = [(p, s) for dd, p, s in spans if dd == d]
        kept = [(p, s) for p, s in doc_spans if s not in hot]
        out[d] = (
            len(doc_spans),
            len(kept),
            "\n".join(s for _p, s in sorted(kept)),
        )
    return out


def _got(df):
    return {
        r.doc_id: (r.n_spans, r.n_kept, r.text_dedup) for r in df.collect()
    }


def test_occurrence_mode_matches_python_oracle(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    out, stats = remove_frequent_spans(df, max_count=2, count="occurrences")
    got = _got(out)
    assert got == _py_remove(DOCS, 2, by_docs=False)
    # "nav bar" occurs 4x > 2 -> gone everywhere incl. doc 4 (emptied);
    # "footer" occurs 2x == max_count -> kept in BOTH docs
    assert got[1] == (3, 2, "body one\nfooter")
    assert got[4] == (1, 0, "")
    assert got[5] == (0, 0, "")
    assert stats["n_hot_spans"] == 1
    assert stats["hot_join_path"] == "broadcast"
    release_census_caches()


def test_docs_mode_counts_within_doc_repeats_once(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    # doc-frequency of "nav bar" is 4 docs... no: docs {1,2,3,4} = 4 > 3;
    # at max_count=3 occurrences-mode also removes it (4 occurrences in
    # docs 1,2,4 + 2 in doc 3 = 5 > 3). Distinguish at max_count=4:
    # occurrences 5 > 4 -> removed; distinct docs 4 <= 4 -> kept.
    occ, _ = remove_frequent_spans(df, max_count=4, count="occurrences")
    byd, _ = remove_frequent_spans(df, max_count=4, count="docs")
    assert _got(occ) == _py_remove(DOCS, 4, by_docs=False)
    assert _got(byd) == _py_remove(DOCS, 4, by_docs=True)
    assert _got(occ)[4] == (1, 0, "")       # hot by occurrences
    assert _got(byd)[4] == (1, 1, "nav bar")  # cold by doc-frequency
    release_census_caches()


def test_shuffle_path_same_answer(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    base, _ = remove_frequent_spans(df, max_count=2)
    forced, stats = remove_frequent_spans(
        df, max_count=2, hot_broadcast_threshold=0
    )
    assert stats["hot_join_path"] == "shuffle"
    assert _got(base) == _got(forced)
    release_census_caches()


def test_bad_params_raise(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    with pytest.raises(ValueError, match="count must be"):
        remove_frequent_spans(df, count="lines")
    with pytest.raises(ValueError, match="max_count"):
        remove_frequent_spans(df, max_count=0)


def test_cli_remove_frequent_spans(spark, tmp_path):
    """--remove-frequent-spans end to end: the hot span vanishes from
    EVERY doc (keep-none, unlike --span-dedup's keep-first), all-hot
    docs are dropped and counted, span-less docs pass through, and the
    flag folds into the resume input tag."""
    import json

    from deduplication_framework_spark.__main__ import main

    inp = str(tmp_path / "pages")
    spark.createDataFrame(
        [
            (0, "u0", "intro zero\nhot span\nbody zero", "en"),
            (1, "u1", "intro one\nhot span\nbody one", "en"),
            (2, "u2", "hot span\ncold pair", "en"),
            (3, "u3", "cold pair", "en"),   # "cold pair" x2 <= 2: kept
            (4, "u4", "hot span", "en"),    # emptied -> dropped
            (5, "u5", "  ", "en"),          # span-less: passes through
        ],
        ["doc_order", "url", "text", "lang"],
    ).write.parquet(inp)
    out = str(tmp_path / "out_freq")
    assert main([
        "--input", inp, "--output", out,
        "--detectors", "exact", "--remove-frequent-spans", "2",
    ]) == 0

    summary = json.loads((tmp_path / "out_freq" / "summary.json").read_text())
    m = summary["metrics"]
    assert m["frequent_spans.n_spans"] == 10.0
    assert m["frequent_spans.n_spans_kept"] == 6.0   # 4 "hot span" gone
    assert m["frequent_spans.n_hot_spans"] == 1.0
    assert m["frequent_spans.n_docs_emptied"] == 1.0
    keepers = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{out}/keepers").collect()
    }
    assert keepers == {
        0: "intro zero\nbody zero",
        1: "intro one\nbody one",
        2: "cold pair",   # exact detector then drops doc 3 (dup of 2)
        5: "  ",
    }


def test_cli_remove_frequent_spans_probes(spark, tmp_path):
    import pytest

    from deduplication_framework_spark.__main__ import main

    with pytest.raises(SystemExit):
        main([
            "--synthetic", "10", "--output", str(tmp_path / "o1"),
            "--remove-frequent-spans", "0",
        ])
    with pytest.raises(SystemExit):
        main([
            "--synthetic", "10", "--output", str(tmp_path / "o2"),
            "--remove-frequent-spans", "2", "--sweep", "0.8",
        ])


def test_exploded_frame_cached_once(spark):
    """Review-finding regression: the corpus-wide explode feeds three
    consumers (hot census, kept anti-join, reassembly totals) — the
    output plan must read the persisted exploded frame, not re-explode
    the corpus per consumer."""
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    out, _ = remove_frequent_spans(df, max_count=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("InMemoryTableScan") >= 2, plan
    release_census_caches()
