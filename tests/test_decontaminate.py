"""Benchmark decontamination (operators/decontaminate.py): exact word
n-gram overlap of a train corpus against an eval corpus."""

import pytest
from pyspark.sql import functions as F

from deduplication_framework_spark.operators.decontaminate import (
    ngram_overlap_flags,
    remove_contaminated_spans,
    word_ngram_expr,
)
from deduplication_framework_spark.operators.lsh import release_census_caches


def _py_ngrams(text, n, lowercase=True):
    if lowercase:
        text = text.lower()
    w = [t for t in text.strip().split()]
    # mirror split('\s+') on a trimmed string: '' -> ['']
    if text.strip() == "":
        w = [""]
    if len(w) < n:
        return set()
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


TRAIN = [
    (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (1, "one two three four five"),  # < n tokens for n=8
    (2, "ALPHA beta gamma delta epsilon zeta eta theta different tail"),
    (3, ""),  # empty text
    (4, "unique words that never appear anywhere else at all here"),
    (5, "  padded   whitespace alpha beta gamma delta epsilon zeta eta theta  "),
]
EVAL = [
    (100, "prefix alpha beta gamma delta epsilon zeta eta theta suffix"),
    (101, "short eval doc"),
    (102, ""),
]


def _oracle(n=8):
    eval_grams = set()
    for _, t in EVAL:
        eval_grams |= _py_ngrams(t, n)
    out = {}
    for i, t in TRAIN:
        g = _py_ngrams(t, n)
        hit = len(g & eval_grams)
        out[i] = (len(g), hit, int(hit > 0))
    return out


def _frames(spark):
    train = spark.createDataFrame(TRAIN, ["doc_id", "text"])
    ev = spark.createDataFrame(EVAL, ["doc_id", "text"])
    return train, ev


def test_flags_match_python_oracle(spark):
    train, ev = _frames(spark)
    out, stats = ngram_overlap_flags(train, ev, n=8)
    got = {
        r.doc_id: (r.n_grams, r.n_hit_grams, r.is_contaminated)
        for r in out.collect()
    }
    assert got == _oracle(8)
    # docs 0 and 5 share the 8-gram "alpha beta ... theta" with eval 100;
    # doc 2 is case-folded into the same first gram
    assert got[0][2] == 1 and got[5][2] == 1 and got[2][2] == 1
    assert got[1] == (0, 0, 0) and got[3] == (0, 0, 0) and got[4][2] == 0
    assert stats["n_contaminated"] == 3
    assert stats["eval_join_path"] == "broadcast"
    assert stats["flags_join_path"] == "broadcast"
    release_census_caches()


def test_shuffle_paths_same_answer(spark):
    train, ev = _frames(spark)
    base, _ = ngram_overlap_flags(train, ev, n=8)
    forced, stats = ngram_overlap_flags(
        train, ev, n=8, eval_broadcast_threshold=0, hits_broadcast_threshold=0
    )
    assert stats["eval_join_path"] == "shuffle"
    assert stats["flags_join_path"] == "shuffle"
    key = lambda r: r.doc_id  # noqa: E731
    assert sorted(base.collect(), key=key) == sorted(forced.collect(), key=key)
    release_census_caches()


def test_within_doc_duplicate_grams_count_once(spark):
    train = spark.createDataFrame(
        [(0, "a b c d a b c d a b c d")], ["doc_id", "text"]
    )
    ev = spark.createDataFrame([(1, "x a b c d y")], ["doc_id", "text"])
    out, _ = ngram_overlap_flags(train, ev, n=4)
    r = out.collect()[0]
    # train grams: {a b c d, b c d a, c d a b, d a b c} — 4 distinct of 9
    # positions; exactly one ("a b c d") occurs in eval
    assert (r.n_grams, r.n_hit_grams, r.is_contaminated) == (4, 1, 1)
    release_census_caches()


def test_case_sensitivity_toggle(spark):
    train = spark.createDataFrame([(0, "A B C D")], ["doc_id", "text"])
    ev = spark.createDataFrame([(1, "a b c d")], ["doc_id", "text"])
    hit, _ = ngram_overlap_flags(train, ev, n=4, lowercase=True)
    miss, _ = ngram_overlap_flags(train, ev, n=4, lowercase=False)
    assert hit.collect()[0].is_contaminated == 1
    assert miss.collect()[0].is_contaminated == 0
    release_census_caches()


def test_reserved_column_clash_raises(spark):
    train = spark.createDataFrame([(0, "a", 1)], ["doc_id", "text", "n_hit"])
    ev = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="collide"):
        ngram_overlap_flags(train, ev, n=2)


def test_word_ngram_expr_short_and_exact_length(spark):
    df = spark.createDataFrame(
        [("a b c",), ("a b",), ("",)], ["text"]
    ).withColumn("_w", F.split(F.trim("text"), r"\s+"))
    got = [r.g for r in df.select(word_ngram_expr("_w", 3).alias("g")).collect()]
    assert got == [["a b c"], [], []]
    with pytest.raises(ValueError, match="n must be"):
        word_ngram_expr("_w", 0)


def _py_span_removal(train, ev, n, lowercase=True):
    """Independent reference: covered = union of [i, i+n) for every train
    n-gram (lowercased) present anywhere in eval."""
    eval_grams = set()
    for _, t in ev:
        eval_grams |= _py_ngrams(t, n, lowercase)
    out = {}
    for i, t in train:
        w = t.strip().split() if t.strip() else [""]
        lw = [x.lower() for x in w] if lowercase else w
        cov = set()
        for s in range(max(len(lw) - n + 1, 0)):
            if " ".join(lw[s : s + n]) in eval_grams:
                cov |= set(range(s, s + n))
        clean = " ".join(x for j, x in enumerate(w) if j not in cov)
        out[i] = (len(w), len(cov), clean)
    return out


SPAN_TRAIN = [
    (0, "keep1 alpha beta gamma delta epsilon zeta eta theta keep2 keep3"),
    (1, "too short doc"),
    (2, ""),
    # two hits overlapping: positions 0..8 covered (grams at 0 and 1)
    (3, "alpha beta gamma delta epsilon zeta eta theta iota tail1 tail2"),
    (4, "ALPHA beta gamma delta epsilon zeta eta THETA casefold tail"),
    (5, "nothing shared with the eval corpus at all in this doc"),
]
SPAN_EVAL = [
    (100, "alpha beta gamma delta epsilon zeta eta theta iota"),
    (101, ""),
]


def test_span_removal_matches_python_oracle(spark):
    train = spark.createDataFrame(SPAN_TRAIN, ["doc_id", "text"])
    ev = spark.createDataFrame(SPAN_EVAL, ["doc_id", "text"])
    out, stats = remove_contaminated_spans(train, ev, n=8)
    got = {
        r.doc_id: (r.n_words, r.n_removed, r.text_clean)
        for r in out.collect()
    }
    assert got == _py_span_removal(SPAN_TRAIN, SPAN_EVAL, 8)
    # doc 0: one hit at start index 1 -> words 1..8 removed
    assert got[0] == (11, 8, "keep1 keep2 keep3")
    # doc 3: hits at 0 and 1 merge -> 9 covered, survivors are the tail
    assert got[3] == (11, 9, "tail1 tail2")
    # doc 4: case-folded match, ORIGINAL case survives nowhere in the
    # removed span but the remaining words keep their case
    assert got[4] == (10, 8, "casefold tail")
    assert got[1] == (3, 0, "too short doc")
    assert got[5][1] == 0
    assert stats["n_contaminated"] == 3
    assert stats["cov_join_path"] == "broadcast"
    release_census_caches()


def test_span_removal_full_coverage_empties_doc(spark):
    train = spark.createDataFrame(
        [(0, "a b c d e f g h")], ["doc_id", "text"]
    )
    ev = spark.createDataFrame([(1, "a b c d e f g h")], ["doc_id", "text"])
    out, _ = remove_contaminated_spans(train, ev, n=8)
    r = out.collect()[0]
    assert (r.n_words, r.n_removed, r.text_clean) == (8, 8, "")
    release_census_caches()


def test_span_removal_shuffle_paths_same_answer(spark):
    train = spark.createDataFrame(SPAN_TRAIN, ["doc_id", "text"])
    ev = spark.createDataFrame(SPAN_EVAL, ["doc_id", "text"])
    base, _ = remove_contaminated_spans(train, ev, n=8)
    forced, stats = remove_contaminated_spans(
        train, ev, n=8, eval_broadcast_threshold=0, cov_broadcast_threshold=0
    )
    assert stats["eval_join_path"] == "shuffle"
    assert stats["cov_join_path"] == "shuffle"
    key = lambda r: r.doc_id  # noqa: E731
    assert sorted(base.collect(), key=key) == sorted(
        forced.collect(), key=key
    )
    release_census_caches()


def test_train_side_never_shuffles_on_broadcast_path(spark):
    """Plan pin for the scale posture: with the eval grams broadcast, the
    exploded train rows reach the join without an Exchange under them —
    the only exchanges hash-partition the (tiny) eval distinct and the
    per-doc hit counts."""
    train, ev = _frames(spark)
    out, stats = ngram_overlap_flags(train, ev, n=8)
    assert stats["eval_join_path"] == "broadcast"
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # no sort-merge join anywhere: both corpus-keyed joins are broadcast
    assert "SortMergeJoin" not in plan
    release_census_caches()


def test_hash_gram_key_matches_raw_flags(spark):
    """gram_key='hash' (128-bit xxhash64 pair join, the default) must
    answer exactly like the raw string-join spec path."""
    train, ev = _frames(spark)
    key = lambda r: r.doc_id  # noqa: E731
    raw, raw_stats = ngram_overlap_flags(train, ev, n=8, gram_key="raw")
    hsh, h_stats = ngram_overlap_flags(train, ev, n=8, gram_key="hash")
    assert sorted(raw.collect(), key=key) == sorted(hsh.collect(), key=key)
    # distinct keys == distinct grams on a collision-free corpus
    assert raw_stats["n_eval_grams"] == h_stats["n_eval_grams"]
    assert (raw_stats["gram_key"], h_stats["gram_key"]) == ("raw", "hash")
    release_census_caches()


def test_hash_gram_key_matches_raw_spans(spark):
    train = spark.createDataFrame(SPAN_TRAIN, ["doc_id", "text"])
    ev = spark.createDataFrame(SPAN_EVAL, ["doc_id", "text"])
    key = lambda r: r.doc_id  # noqa: E731
    raw, _ = remove_contaminated_spans(train, ev, n=8, gram_key="raw")
    hsh, _ = remove_contaminated_spans(train, ev, n=8, gram_key="hash")
    assert sorted(raw.collect(), key=key) == sorted(hsh.collect(), key=key)
    release_census_caches()


def test_bad_gram_key_raises(spark):
    train, ev = _frames(spark)
    with pytest.raises(ValueError, match="gram_key"):
        ngram_overlap_flags(train, ev, n=8, gram_key="sha1")
